package graft.tools

import org.apache.spark.sql.SparkSession

/** Time one query N times: `runMain graft.tools.BenchOne <name> [n] [sfDir]`.
  * Separates first-run (codegen/JIT) cost from steady-state. Optionally
  * prints the formatted plan with PLAN=1. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val n = if (args.length > 1) args(1).toInt else 3
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_AQE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // ad-hoc conf experiments: SPARK_SQL_CONF="k=v;k2=v2"
    sys.env.get("SPARK_SQL_CONF").foreach(_.split(';').filter(_.nonEmpty)
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k, v)
      })
    val names =
      if (name == "ALL") graft.SparkEntry.queries.keys.toSeq.sorted
      else name.split(",").toSeq
    names.foreach { nm =>
      val fn = graft.SparkEntry.queries(nm)
      if (sys.env.contains("PLAN")) fn(spark, sfDir).explain("formatted")
      (1 to n).foreach { i =>
        val t0 = System.nanoTime()
        val c = fn(spark, sfDir).count()
        println(f"$nm RUN$i: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$c")
      }
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Does a small-SF warmup run of a query eliminate its large-SF cold-run
  * penalty? `runMain graft.tools.WarmProbe <name> [warmSf] [benchSf]`.
  * Prints warm-run time at warmSf, then RUN1/RUN2 at benchSf — compare
  * RUN1 against BenchOne's cold number for the same fresh-JVM state. */
object WarmProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val warmSf = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val benchSf = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    def t(tag: String, dir: String): Unit = {
      val t0 = System.nanoTime()
      val c = fn(spark, dir).count()
      println(f"[warmprobe] $name $tag: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$c")
    }
    t("WARM(sf0.001)", warmSf)
    t("RUN1", benchSf)
    t("RUN2", benchSf)
    spark.stop()
  }
}

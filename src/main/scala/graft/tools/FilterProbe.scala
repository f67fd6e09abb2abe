package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.nested.NestedOps

/** Noop-sink timing (guide §1.4) of the element-filter pipeline pieces:
  * how much of a pack→filter→flat query is the interpreted per-element
  * predicate lambdas (exists + filter HOFs)?
  * `runMain graft.tools.FilterProbe [n] [sfDir]` */
object FilterProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 3
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def rd = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .withColumnRenamed("l_orderkey", "o_orderkey")
      .select("o_orderkey", "l_quantity", "l_extendedprice", "l_returnflag")
    def packed = NestedOps.packFlat(rd, Seq("o_orderkey"), "items")
    val pred: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      e => e.getField("l_quantity") > 10.0
    def fullFiltered = NestedOps.filterElementsDropEmpty(packed, "items", pred)
    def existsOnly = packed.where(exists(col("items"), pred))
    def filterOnly = packed.withColumn("items", filter(col("items"), pred))
    def time(label: String, mk: => DataFrame): Unit = (1 to n).foreach { i =>
      val t0 = System.nanoTime()
      mk.write.format("noop").mode("overwrite").save()
      println(f"$label RUN$i: ${(System.nanoTime() - t0) / 1e9}%.3fs")
    }
    time("pack_only        ", packed)
    time("pack_exists      ", existsOnly)
    time("pack_filter      ", filterOnly)
    time("pack_exists+filt ", fullFiltered)
    spark.stop()
  }
}

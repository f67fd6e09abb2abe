package graft.tools

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import graft.nested.{NestedOps, NestedExpr}
import graft.nested.syntax._

/** Time pipeline PREFIXES of the pack->eval->toFlat->agg shape with the
  * noop sink (guide §1.4), isolating which stage costs what:
  * `runMain graft.tools.StageProbe [n] [sfDir]`. */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 3
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
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
    def rd = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .withColumnRenamed("l_orderkey", "o_orderkey")
      .select("o_orderkey", "l_extendedprice", "l_discount", "l_tax",
        "l_linestatus")
    def packed = NestedOps.packFlat(rd, Seq("o_orderkey"), "items")
    def evald = NestedExpr.evalAssign(packed,
      "items.charge = items.l_extendedprice * (1 - items.l_discount) * (1 + items.l_tax)")
    def flat = evald.toFlat("items")
    def agged = flat.groupBy("l_linestatus")
      .agg(round(sum(col("charge")), 2).as("s"))
    def aggedDec = flat.groupBy("l_linestatus")
      .agg(round(sum(round(col("charge"), 6).cast("decimal(30,6)")), 2)
        .cast("double").as("s"))
    def packedRepart = rd.repartition(col("o_orderkey"))
      .groupBy(col("o_orderkey"))
      .agg(collect_list(struct(col("l_extendedprice"), col("l_discount"),
        col("l_tax"), col("l_linestatus"))).as("items"))
    def packedRR = rd.repartition(32).groupBy(col("o_orderkey"))
      .agg(collect_list(struct(col("l_extendedprice"), col("l_discount"),
        col("l_tax"), col("l_linestatus"))).as("items"))
    // 5-key sorted pack: lambda comparator vs natural struct ordering
    def rd5 = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .withColumnRenamed("l_orderkey", "o_orderkey")
      .select("o_orderkey", "l_shipdate", "l_linenumber", "l_extendedprice",
        "l_partkey", "l_suppkey")
    def packSortCmp = NestedOps.packFlat(rd5, Seq("o_orderkey"), "items",
      sortBy = Seq(("l_shipdate", true), ("l_linenumber", true),
        ("l_extendedprice", true), ("l_partkey", true), ("l_suppkey", true)))
    def packSortNat = {
      val vals = Seq("l_shipdate", "l_linenumber", "l_extendedprice",
        "l_partkey", "l_suppkey")
      rd5.repartition(col("o_orderkey")).groupBy(col("o_orderkey"))
        .agg(sort_array(collect_list(struct(vals.map(col): _*))).as("items"))
    }
    val stages: Seq[(String, () => DataFrame)] = Seq(
      "pack5_cmp" -> (() => packSortCmp),
      "pack5_nat" -> (() => packSortNat),
      "scan4col" -> (() => rd),
      "pack" -> (() => packed),
      "pack_repart" -> (() => packedRepart),
      "pack_rr" -> (() => packedRR),
      "pack_eval" -> (() => evald),
      "pack_eval_flat" -> (() => flat),
      "full_dblsum" -> (() => agged),
      "full_decsum" -> (() => aggedDec))
    stages.foreach { case (name, f) =>
      (1 to n).foreach { i =>
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        println(f"$name RUN$i: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
    }
    spark.stop()
  }
}

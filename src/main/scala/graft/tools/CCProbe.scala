package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for star-contraction connected components:
  * `runMain graft.tools.CCProbe [nChain] [nHubs]` builds a pathological
  * graph — one long chain (worst case for label propagation) plus hub
  * stars — and times `connectedComponentsStars` on it. */
object CCProbe {
  def main(args: Array[String]): Unit = {
    val nChain = if (args.length > 0) args(0).toLong else 200000L
    val nHubs = if (args.length > 1) args(1).toInt else 50
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // chain 0-1-2-…-nChain, plus nHubs stars of 1000 spokes each
    val chain = spark.range(nChain).toDF("a")
      .select(col("a"), (col("a") + 1).as("b"))
    val hubs = spark.range(nHubs.toLong * 1000).toDF("i")
      .select((lit(10000000L) + expr("i DIV 1000") * 100000).as("a"),
        (lit(10000000L) + expr("i DIV 1000") * 100000 + col("i") % 1000 + 1)
          .as("b"))
    val edges = chain.union(hubs)
    val t0 = System.nanoTime()
    val labels = graft.operators.Dedup.connectedComponentsStars(edges,
      verbose = true)
    val nComp = labels.select(countDistinct(col("component"))).head().getLong(0)
    val n = labels.count()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"CCPROBE nodes=$n components=$nComp time=$secs%.1fs " +
      f"(chain=$nChain hubs=$nHubs)")
    assert(nComp == 1 + nHubs, s"expected ${1 + nHubs} components, got $nComp")
    spark.stop()
  }
}

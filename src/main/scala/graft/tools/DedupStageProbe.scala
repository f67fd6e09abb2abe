package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Stage-level timing of the production near-dup pipeline on the real
  * documents table: sigs → LSH candidates → jaccard verify → CC →
  * anti-join, each stage timed by forcing it with a count (steady-state:
  * min of `reps`). `runMain graft.tools.DedupStageProbe [sfDir] [reps]` */
object DedupStageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang"), col("n_chars"))

    def time(label: String)(f: => Long): Unit = {
      val samples = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val best = samples.map(_._1).min
      println(f"[dedupstage] $label%-28s ${best}%7.3fs  n=${samples.head._2}")
    }

    val numHashes = 16; val rowsPerBand = 4; val shingleSize = 5
    val withSig = d.select(col("doc_id"),
      graft.expressions.native.minhash(col("text"), numHashes, shingleSize)
        .as("sig"))
    time("1 sigs only")(withSig.count())
    val cand = Dedup.lshCandidatePairs(withSig, "doc_id", "sig",
      numHashes, rowsPerBand)
    time("2 sigs+LSH candidates")(cand.count())
    val texts = d.select(col("doc_id"), col("text"))
    val verified = cand
      .join(texts.select(col("doc_id").as("a"), col("text").as("__ta")), "a")
      .join(texts.select(col("doc_id").as("b"), col("text").as("__tb")), "b")
      .where(graft.expressions.native.ngram_jaccard(
        col("__ta"), col("__tb"), shingleSize) >= 0.8)
      .select(col("a"), col("b"))
    time("3 +verify edges (no prefilter)")(verified.count())
    val agree = aggregate(
      zip_with(col("__sa"), col("__sb"),
        (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v)
    val pre = cand
      .join(withSig.select(col("doc_id").as("a"), col("sig").as("__sa")), "a")
      .join(withSig.select(col("doc_id").as("b"), col("sig").as("__sb")), "b")
      .where(agree >= 8)
      .select(col("a"), col("b"))
    time("3a prefiltered candidates")(pre.count())
    val verified2 = pre
      .join(texts.select(col("doc_id").as("a"), col("text").as("__ta")), "a")
      .join(texts.select(col("doc_id").as("b"), col("text").as("__tb")), "b")
      .where(graft.expressions.native.ngram_jaccard(
        col("__ta"), col("__tb"), shingleSize) >= 0.8)
      .select(col("a"), col("b"))
    time("3b +verify after prefilter")(verified2.count())
    val verified3 = cand.repartition(32)
      .join(broadcast(texts.select(col("doc_id").as("a"),
        col("text").as("__ta"))), "a")
      .join(broadcast(texts.select(col("doc_id").as("b"),
        col("text").as("__tb"))), "b")
      .where(graft.expressions.native.ngram_jaccard(
        col("__ta"), col("__tb"), shingleSize) >= 0.8)
      .select(col("a"), col("b"))
    time("3c verify repart+bcast")(verified3.count())
    println("[dedupstage] avg n_chars = " +
      d.agg(avg(length(col("text")))).head.getDouble(0))
    time("4 full dedupNear")(
      Dedup.dedupNear(d, "doc_id", "text", threshold = 0.8).count())
    time("5 d.count baseline")(d.count())
    spark.stop()
  }
}

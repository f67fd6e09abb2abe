package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale + recall probe for banded SimHash pairing:
  * `runMain graft.tools.SimhashProbe [nDocs]` synthesizes nDocs documents —
  * every 10th doc near-duplicates its predecessor (one appended word, so
  * the pair sits at a small Hamming distance) over a SMALL vocabulary, the
  * boilerplate-heavy regime where 16-bit blocks collide heavily and the
  * big-block window path (star + chain edges) carries the load. Reports
  * planted-pair recall and throughput; a hot block never materializes a
  * member array on one task (see Dedup.simhashCandidatePairs). */
object SimhashProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toLong else 200000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val words = (0 until 64).map(i => s"w${i}word").toArray
    val wordsCol = typedLit(words.toSeq)
    val base = spark.range(nDocs).toDF("doc_id")
      .withColumn("src_id",
        when(col("doc_id") % 10 === 9, col("doc_id") - 1)
          .otherwise(col("doc_id")))
      .withColumn("text", concat_ws(" ",
        (0 until 24).map(k => element_at(wordsCol,
          (pmod(xxhash64(col("src_id"), lit(k)), lit(64)) + 1)
            .cast("int"))): _*))
      .withColumn("text",
        when(col("doc_id") % 10 === 9,
          concat(col("text"), lit(" changedword")))
          .otherwise(col("text")))
      .select("doc_id", "text")
    base.write.mode("overwrite").parquet("/tmp/simhash_probe_corpus")
    val corpus = spark.read.parquet("/tmp/simhash_probe_corpus")
    val planted = nDocs / 10
    val t0 = System.nanoTime()
    val sigs = corpus.select(col("doc_id"),
      graft.operators.Dedup.simHash64Native(col("text")).as("sig"))
    val pairs = graft.operators.Dedup.simhashCandidatePairs(
      sigs, "doc_id", "sig", maxHamming = 3)
    // GROUND TRUTH: of the planted pairs, only those whose true Hamming
    // distance is ≤ maxHamming are the pairing layer's job to find (one
    // appended token can legitimately move a 24-token simhash further —
    // that's sketch sensitivity, not pairing recall). At Hamming ≤ 3 with
    // 4×16-bit banding, recall must be EXACTLY 100% by pigeonhole: 3 bit
    // flips touch at most 3 of the 4 blocks, so one block always matches.
    val eligible = sigs.as("x").join(sigs.as("y"),
        col("y.doc_id") === col("x.doc_id") + 1 &&
          pmod(col("x.doc_id"), lit(10)) === 8)
      .where(graft.operators.Dedup.hamming64(
        col("x.sig"), col("y.sig")) <= 3)
      .count()
    val hits = pairs
      .where(col("b") === col("a") + 1 && pmod(col("a"), lit(10)) === 8)
      .count()
    val total = pairs.count()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"SIMHASHPROBE docs=$nDocs planted=$planted " +
      f"eligible(hamming<=3)=$eligible recovered=$hits " +
      f"pairs_total=$total time=$secs%.1fs (${nDocs / secs}%.0f docs/s)")
    require(hits == eligible,
      s"pairing recall hole: $hits of $eligible eligible pairs recovered")
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the near-dup pipeline:
  * `runMain graft.tools.DedupProbe [nDocs]` synthesizes nDocs documents —
  * 10% planted near-duplicates (same base text, one word changed), the rest
  * unique — and times `Dedup.dedupNear` end to end (sigs → LSH → verify →
  * CC → keep). */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toLong else 200000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // deterministic synthetic corpus: base sentence from seeded word picks;
    // every 10th doc near-duplicates the previous doc (one word changed)
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
      // the near-dup variant changes the last word
      .withColumn("text",
        when(col("doc_id") % 10 === 9,
          concat(col("text"), lit(" changedword")))
          .otherwise(col("text")))
      .select("doc_id", "text")
    base.write.mode("overwrite").parquet("/tmp/dedup_probe_corpus")
    val corpus = spark.read.parquet("/tmp/dedup_probe_corpus")
    val t0 = System.nanoTime()
    val kept = graft.operators.Dedup.dedupNear(corpus, "doc_id", "text",
      threshold = 0.8)
    val n = kept.count()
    val secs = (System.nanoTime() - t0) / 1e9
    val dupsRemoved = nDocs - n
    println(f"DEDUPPROBE docs=$nDocs kept=$n removed=$dupsRemoved " +
      f"time=$secs%.1fs (${nDocs / secs}%.0f docs/s)")
    spark.stop()
  }
}

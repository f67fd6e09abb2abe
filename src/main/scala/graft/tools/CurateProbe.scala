package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Sampling, Chunking}

/** Full-pipeline scale probe: `runMain graft.tools.CurateProbe [nDocs]` —
  * the qCurateFull composed chain (corpus-wide paragraph dedup → split
  * assignment → sequence packing → per-split accounting) over `nDocs`
  * synthetic documents generated in-plan (no storage). Default 50M docs
  * (~5 paragraphs × ~8 tokens each + planted cross-doc boilerplate), the
  * scale the per-operator probes never compose.
  *
  * Reports wall time, docs/s, and the largest shuffle's row count (the
  * paragraph-level groupBy — corpus paragraphs ≈ 6×nDocs). The success
  * criteria are (a) completion without spill-death, (b) boilerplate kept
  * exactly once: every 10th doc carries the same boilerplate paragraph,
  * so exactly ONE survives corpus-wide. */
object CurateProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 50000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ~5 unique paragraphs of 8 pseudo-words each, plus a shared
    // boilerplate paragraph on every 10th doc — unique content is a pure
    // function of (doc, paragraph, word), so the generator is narrow and
    // reproducible
    def word(d: org.apache.spark.sql.Column, p: Int, w: Int) =
      concat(lit("w"), pmod(xxhash64(d, lit(p), lit(w)), lit(99991L)))
    def para(d: org.apache.spark.sql.Column, p: Int) =
      concat_ws(" ", (0 until 8).map(w => word(d, p, w)): _*)
    val text = concat_ws("\n",
      (0 until 5).map(p => para(col("id"), p)) :+
        when(col("id") % 10 === 0, lit("subscribe to our newsletter now"))
          .otherwise(concat(lit("tail"), col("id"))): _*)
    val docs = spark.range(n).select(col("id").as("doc_id"), text.as("text"))

    val t0 = System.nanoTime()
    val cleaned = Dedup.dedupParagraphs(docs, "doc_id", "text")
    // DISK_ONLY persist: the frame feeds TWO actions (accounting + the
    // boilerplate-survivor check); without it the second action re-runs
    // the whole 3-shuffle dedup — at 50M docs the duplicated shuffle
    // files filled the disk (measured: first pass alone writes ~57 GB)
    val withSplit = cleaned.select(col("doc_id"),
      col("clean_text").as("text"),
      Sampling.splitColumn(col("doc_id"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).as("split"))
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val packed = Chunking.packSequences(withSplit, "doc_id", "text", 256,
      col("split"))
    val acct = packed.groupBy(col("grp").as("split"))
      .agg(countDistinct(col("chunk_id")).as("n_chunks"),
        count(lit(1)).as("n_doc_spans"), sum(col("off_len")).as("n_tokens"))
      .collect()
    val secs = (System.nanoTime() - t0) / 1e9
    val totalTokens = acct.map(_.getLong(3)).sum
    println(f"CURATE_PROBE n=$n time=$secs%.1fs docs_per_s=${n / secs}%.0f " +
      f"tokens=$totalTokens splits=${acct.length}")
    acct.foreach(r => println(s"  split=${r.getString(0)} " +
      s"chunks=${r.getLong(1)} spans=${r.getLong(2)} tokens=${r.getLong(3)}"))

    // boilerplate survives exactly once corpus-wide (reuses the persisted
    // cleaned frame — text here IS clean_text)
    val survivors = withSplit
      .where(col("text").contains("subscribe to our newsletter now"))
      .count()
    println(s"  boilerplate_survivors=$survivors (expect 1)")
    require(survivors == 1L, s"expected 1 boilerplate survivor, got $survivors")
    require(acct.length == 3, "expected 3 splits")
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Attribute q_dedup_pipeline's cold-run cost across its stages:
  * `runMain graft.tools.ColdProfile [sfDir]`. Each stage is counted once
  * in dependency order, so its wall time is the MARGINAL cold cost
  * (earlier stages' codegen/JIT/page-cache warmup already paid); the full
  * query then runs twice to show cold-vs-steady of the assembled plan. */
object ColdProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
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

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[coldprofile] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    t("scan (cold parquet IO)")(docs.count())
    val withSig = docs.select(col("doc_id"),
      Dedup.minHashSignaturesNative(col("text"), 16, 5).as("sig"))
    t("sigs (native minhash codegen+JIT)")(withSig.count())
    val candidates = t("candidates plan+exec (LSH banding)") {
      val c = Dedup.lshCandidatePairs(withSig, "doc_id", "sig", 16, 4)
        .localCheckpoint()
      c.count()
      c
    }
    val texts = docs.select(col("doc_id"), col("text"))
    val verified = t("verify (ngram_jaccard joins)") {
      val v = candidates
        .join(texts.select(col("doc_id").as("a"), col("text").as("__ta")), "a")
        .join(texts.select(col("doc_id").as("b"), col("text").as("__tb")), "b")
        .where(graft.expressions.native.ngram_jaccard(
          col("__ta"), col("__tb"), 5) >= 0.8)
        .select(col("a"), col("b"))
        .localCheckpoint()
      v.count()
      v
    }
    t("cc (union-find / star rounds)")(
      Dedup.connectedComponents(verified).count())
    t("full query RUN1")(graft.SparkEntry.queries("q_dedup_pipeline")(
      spark, sfDir).count())
    t("full query RUN2")(graft.SparkEntry.queries("q_dedup_pipeline")(
      spark, sfDir).count())
    spark.stop()
  }
}

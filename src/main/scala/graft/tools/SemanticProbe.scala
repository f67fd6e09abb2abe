package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Semantic-dedup scale probe: `runMain graft.tools.SemanticProbe [n]
  * [dups]` — n synthetic 64-d vectors with `dups` planted exact copies
  * (copy of vector i at id n+i). Measures wall time and verifies every
  * planted copy is removed and nothing else is (recall AND precision at
  * threshold 0.99 — random 64-d vectors sit far below it; max natural
  * cosine measured 0.48 on the test corpus). */
object SemanticProbe {
  def main(args: Array[String]): Unit = {
    // arg0 numeric → synthetic corpus of that size; otherwise a ScaleGen
    // sfDir whose embeddings.parquet becomes the base corpus (r12: the
    // 100×-corpus planted-recall check — copies planted at +10^12, far
    // beyond any replica id span)
    val srcDir = args.headOption.filterNot(a =>
      scala.util.Try(a.toLong).isSuccess)
    val n = if (srcDir.isEmpty && args.length > 0) args(0).toLong
            else 500000L
    val dups = if (args.length > 1) args(1).toInt else 1000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def vec(id: org.apache.spark.sql.Column) = transform(
      sequence(lit(0), lit(63)),
      d => pmod(xxhash64(id, d), lit(2001L)).cast("double") / 1000.0 - 1.0)
    val CopyBase = 1000000000000L
    val (corpus, nBase) = srcDir match {
      case Some(dir) =>
        val e = spark.read.parquet(s"$dir/embeddings.parquet")
          .select(col("vec_id"), col("embedding"))
        // every `stride`-th vector gets an exact copy at +CopyBase
        val total = e.count()
        val stride = math.max(1L, total / dups)
        val copies = e.where(pmod(col("vec_id"), lit(stride)) === 0)
          .select((col("vec_id") + lit(CopyBase)).as("vec_id"),
            col("embedding"))
        (e.unionByName(copies), total)
      case None =>
        val base = spark.range(n).select(col("id").as("vec_id"),
          vec(col("id")).as("embedding"))
        val copies = spark.range(dups).select((col("id") + CopyBase)
          .as("vec_id"), vec(col("id")).as("embedding"))
        (base.unionByName(copies), n)
    }
    val t0 = System.nanoTime()
    val kept = Dedup.dedupSemantic(corpus, "vec_id", "embedding",
      threshold = 0.99, numPlanes = 8, dim = 64)
    val keptN = kept.count()
    val survivingCopies = kept.where(col("vec_id") >= CopyBase).count()
    println(f"SEMANTIC_PROBE base=$nBase dups~$dups kept=$keptN " +
      f"surviving_copies=$survivingCopies " +
      f"time=${(System.nanoTime() - t0) / 1e9}%.1fs")
    require(survivingCopies == 0, "planted copies survived")
    require(keptN == nBase, s"expected $nBase kept, got $keptN " +
      "(false positives)")
    spark.stop()
  }
}

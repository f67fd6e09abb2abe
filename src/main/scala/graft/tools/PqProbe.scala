package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** PQ encode/search scale probe:
  * `runMain graft.tools.PqProbe [nVecs]` synthesizes nVecs deterministic
  * 64-d float vectors, trains seed codebooks, times the narrow zero-shuffle
  * encode over the corpus, and times an ADC top-3 probe for 20 queries
  * against the full encoded corpus. */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val nVecs = if (args.length > 0) args(0).toLong else 1000000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // deterministic pseudo-random floats in [-0.5, 0.5) from xxhash64
    val corpus = spark.range(nVecs).toDF("vec_id")
      .withColumn("embedding", expr(
        """transform(sequence(0, 63), d ->
          |  CAST(pmod(xxhash64(vec_id, d), 1000) / 1000.0 - 0.5
          |       AS FLOAT))""".stripMargin))
    corpus.write.mode("overwrite").parquet("/tmp/pq_probe_corpus")
    val e = spark.read.parquet("/tmp/pq_probe_corpus")
    val books = Similarity.pqTrain(e, m = 8, k = 16, iters = 0)
    val t0 = System.nanoTime()
    val encoded = e.select(col("vec_id"),
      Similarity.pqEncode(col("embedding"), books).as("__codes"))
    encoded.write.mode("overwrite").parquet("/tmp/pq_probe_codes")
    val tEnc = (System.nanoTime() - t0) / 1e9
    val codes = spark.read.parquet("/tmp/pq_probe_codes")
    val t1 = System.nanoTime()
    val n = Similarity.pqTopK(e.where(col("vec_id") < 20), codes, books,
      k = 3).count()
    val tSearch = (System.nanoTime() - t1) / 1e9
    // IVF-PQ: coarse cells prune the ADC to nprobe/k of the corpus
    val (assigned, centroids) =
      Similarity.ivfIndex(e, k = 64, iters = 0, persist = false)
    val withCodes = assigned.select(col("vec_id"), col("__cid"),
      Similarity.pqEncode(col("embedding"), books).as("__codes"))
    withCodes.repartition(col("__cid"))
      .write.mode("overwrite").partitionBy("__cid")
      .parquet("/tmp/pq_probe_ivf")
    val ivfCorpus = spark.read.parquet("/tmp/pq_probe_ivf")
    val t2 = System.nanoTime()
    val n2 = Similarity.ivfPqTopK(e.where(col("vec_id") < 20), ivfCorpus,
      centroids, books, nprobe = 8, k = 3).count()
    val tIvfPq = (System.nanoTime() - t2) / 1e9
    println(f"PQPROBE vecs=$nVecs encode=$tEnc%.1fs " +
      f"(${nVecs / tEnc}%.0f vecs/s) adc_search(20q x $nVecs)=$tSearch%.1fs " +
      f"ivfpq_search(nprobe=8/64)=$tIvfPq%.1fs rows=$n/$n2")
    spark.stop()
  }
}

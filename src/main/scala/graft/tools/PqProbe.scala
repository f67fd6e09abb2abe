package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** PQ / IVF-PQ scale + RECALL probe:
  * `runMain graft.tools.PqProbe [nVecs] [nQueries]` synthesizes nVecs
  * deterministic 64-d float vectors, trains seed codebooks, times the
  * narrow zero-shuffle encode over the corpus, then measures the COMPOSED
  * cells→ADC→BoundedTopK path the curate chain uses:
  *   - ADC top-10 for nQueries against the full encoded corpus
  *   - IVF-PQ top-10 (nprobe=8 of 64 cells)
  *   - recall@10 of both vs exact brute-force cosine top-10
  * Emits one PQPROBE line (throughput + recall) for SCALING.md. */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val nVecs = if (args.length > 0) args(0).toLong else 1000000L
    val nQueries = if (args.length > 1) args(1).toInt else 20
    // "reuse": skip corpus/codes/ivf regeneration when the parquet from a
    // prior run of the SAME size exists (generation is deterministic) —
    // lets a search-path change re-measure in minutes, not a full rebuild
    val reuse = args.length > 2 && args(2) == "reuse"
    def fresh(path: String): Boolean =
      !(reuse && new java.io.File(path + "/_SUCCESS").exists())
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // deterministic corpus with PLANTED near-neighbors: nVecs uniform
    // background vectors plus, for each query, 10 "echo" vectors = the
    // query + 5% noise. Among uniform random vectors the true top-10 are
    // statistical near-ties (concentration of measure) and recall@10 is
    // a lottery for ANY quantizer; the production question — does the
    // index retrieve actual near-duplicates (semantic dedup, near-dup
    // retrieval) — has the planted echoes as its unambiguous ground
    // truth (echo·query ≈ ‖query‖² ≫ any background dot).
    def uniform(idCol: String, scale: String = "1.0") =
      s"""transform(sequence(0, 63), d ->
         |  CAST((pmod(xxhash64($idCol, d), 1000) / 1000.0 - 0.5) * $scale
         |       AS FLOAT))""".stripMargin
    val background = spark.range(nVecs).toDF("vec_id")
      .withColumn("embedding", expr(uniform("vec_id")))
    val echoes = spark.range(nQueries * 10L).toDF("eid")
      .withColumn("vec_id", col("eid") + nVecs)
      .withColumn("__src", expr("eid DIV 10"))
      .withColumn("embedding", expr(
        """transform(sequence(0, 63), d ->
          |  CAST((pmod(xxhash64(__src, d), 1000) / 1000.0 - 0.5)
          |    + (pmod(xxhash64(eid + 1000000000, d), 1000) / 1000.0 - 0.5)
          |      * 0.05 AS FLOAT))""".stripMargin))
      .select("vec_id", "embedding")
    val corpus = background.unionByName(echoes)
    if (fresh("/tmp/pq_probe_corpus"))
      corpus.write.mode("overwrite").parquet("/tmp/pq_probe_corpus")
    val e = spark.read.parquet("/tmp/pq_probe_corpus")
    val queries = e.where(col("vec_id") < nQueries)
    // train codebooks on a ~500k SAMPLE: codebook quality saturates with
    // training-set size long before the corpus does, and at 100 TB the
    // train cost must be independent of corpus size — k-means over the
    // full corpus would dominate the whole probe for zero recall gain
    val trainStride = math.max(1L, nVecs / 500000L)
    val trainSet = e.where(pmod(col("vec_id"), lit(trainStride)) === 0)
    val books = Similarity.pqTrain(trainSet, m = 8, k = 256, iters = 1)
    val t0 = System.nanoTime()
    if (fresh("/tmp/pq_probe_codes")) {
      val encoded = e.select(col("vec_id"),
        Similarity.pqEncode(col("embedding"), books).as("__codes"))
      encoded.write.mode("overwrite").parquet("/tmp/pq_probe_codes")
    }
    val tEnc = (System.nanoTime() - t0) / 1e9
    val codes = spark.read.parquet("/tmp/pq_probe_codes")
    val t1 = System.nanoTime()
    val adcTop = Similarity.pqTopK(queries, codes, books, k = 10)
      .select(col("query_id"), col("neighbor_id")).cache()
    val nAdc = adcTop.count()
    val tSearch = (System.nanoTime() - t1) / 1e9
    // IVF-PQ: coarse cells prune the ADC to nprobe/k of the corpus
    val (assigned, centroids) =
      Similarity.ivfIndex(e, k = 64, iters = 0, persist = false)
    if (fresh("/tmp/pq_probe_ivf")) {
      val withCodes = assigned.select(col("vec_id"), col("__cid"),
        Similarity.pqEncode(col("embedding"), books).as("__codes"))
      withCodes.repartition(col("__cid"))
        .write.mode("overwrite").partitionBy("__cid")
        .parquet("/tmp/pq_probe_ivf")
    }
    val ivfCorpus = spark.read.parquet("/tmp/pq_probe_ivf")
    val t2 = System.nanoTime()
    val ivfTop = Similarity.ivfPqTopK(queries, ivfCorpus,
      centroids, books, nprobe = 8, k = 10)
      .select(col("query_id"), col("neighbor_id")).cache()
    val nIvf = ivfTop.count()
    val tIvfPq = (System.nanoTime() - t2) / 1e9
    // exact brute-force top-10 = the recall oracle, ranked by the SAME
    // inner-product metric ADC approximates (cosine would skew recall on
    // unnormalized vectors); query side broadcast, corpus never shuffled,
    // BoundedTopK map-side
    val t3 = System.nanoTime()
    val qb = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("__qv"))
    val cb = e.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("__cv"))
    val scoredBrute = broadcast(qb).crossJoin(cb)
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("score",
        graft.expressions.native.dot_f(col("__qv"), col("__cv")))
    val bruteTop = Similarity.topKPerQuery(scoredBrute, 10, "score")
      .select(col("query_id"), col("neighbor_id")).cache()
    val nBrute = bruteTop.count()
    val tBrute = (System.nanoTime() - t3) / 1e9
    def recall(approx: org.apache.spark.sql.DataFrame): Double = {
      val hit = approx.join(bruteTop, Seq("query_id", "neighbor_id")).count()
      hit.toDouble / nBrute
    }
    val rAdc = recall(adcTop)
    val rIvf = recall(ivfTop)
    println(f"PQPROBE vecs=$nVecs queries=$nQueries encode=$tEnc%.1fs " +
      f"(${nVecs / tEnc}%.0f vecs/s) " +
      f"adc_top10=$tSearch%.1fs (${nQueries / tSearch}%.2f q/s) " +
      f"ivfpq_top10(nprobe=8/64)=$tIvfPq%.1fs (${nQueries / tIvfPq}%.2f q/s) " +
      f"brute_top10=$tBrute%.1fs recall@10_adc=$rAdc%.3f " +
      f"recall@10_ivfpq=$rIvf%.3f rows=$nAdc/$nIvf/$nBrute")
    spark.stop()
  }
}

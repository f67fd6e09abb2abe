package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Decontamination scale probe:
  * `runMain graft.tools.ContaminationProbe [nDocs] [nBench]` — synthesizes
  * `nDocs` corpus documents (~12 tokens each) and an `nBench`-document
  * benchmark suite, plants contamination in 1% of the corpus, then times
  * [[Dedup.contamination]] (broadcast raw gram strings) against
  * [[Dedup.contaminationBloom]] (bloom gate in the scan + exact confirm).
  * Reports both wall times, the size of each broadcast payload (sum of
  * distinct-gram string bytes vs bloom blob bytes), and asserts the two
  * result maps are IDENTICAL — the bloom path must lose nothing.
  *
  * The interesting regime is a LARGE benchmark suite (at 100 TB you
  * decontaminate against every eval set you own at once): the raw-gram
  * broadcast grows with total benchmark text, the bloom with distinct-gram
  * COUNT × ~9.6 bits (1% fpp). */
object ContaminationProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toLong else 2000000L
    val nBench = if (args.length > 1) args(1).toLong else 100000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // benchmark docs: 8 tokens each from a vocabulary scaled to the suite
    // size, so distinct grams grow with nBench
    val bench = spark.range(nBench).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 8).map(j =>
        concat(lit("b"), pmod(xxhash64(col("id"), lit(j)), lit(nBench / 2 + 1))
          .cast("string"))): _*).as("text"))

    // corpus docs: 12 tokens from a DISJOINT vocabulary; 1% get a planted
    // benchmark 3-gram (tokens of bench doc id%nBench, positions 2..4)
    val planted = concat_ws(" ",
      (2 until 5).map(j => concat(lit("b"),
        pmod(xxhash64(pmod(col("id"), lit(nBench)), lit(j)), lit(nBench / 2 + 1))
          .cast("string"))): _*)
    val corpus = spark.range(nDocs).select(col("id").as("doc_id"),
      concat(
        concat_ws(" ", (0 until 12).map(j =>
          concat(lit("c"), pmod(xxhash64(col("id"), lit(100 + j)),
            lit(nDocs)).cast("string"))): _*),
        when(pmod(col("id"), lit(100L)) === 0L,
          concat(lit(" "), planted)).otherwise(lit(""))).as("text"))
      .persist()
    corpus.count() // materialize so both paths read identical input

    val benchGramBytes = bench.select(
        explode(graft.functions.TextFunctions.tokenShingles(col("text"), 3))
          .as("g")).distinct()
      .agg(sum(length(col("g"))), count(lit(1))).collect()(0)
    println(s"CONTAM_PROBE bench distinct grams=${benchGramBytes.getLong(1)} " +
      s"string bytes=${benchGramBytes.getLong(0)}")

    def timeIt(label: String)(df: => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      val r = df.agg(count(lit(1)), sum(col("n_hits"))).collect()(0)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"CONTAM_PROBE $label time=$secs%.1fs contaminated=${r.getLong(0)} " +
        s"hits=${r.getLong(1)}")
      secs
    }

    val exact = timeIt("broadcast")(
      Dedup.contamination(corpus, "doc_id", "text", bench, "text"))
    val bloom = timeIt("bloom    ")(
      Dedup.contaminationBloom(corpus, "doc_id", "text", bench, "text"))
    println(f"CONTAM_PROBE ratio broadcast/bloom = ${exact / bloom}%.2f " +
      s"(nDocs=$nDocs nBench=$nBench)")

    // equivalence on the full result
    val a = Dedup.contamination(corpus, "doc_id", "text", bench, "text")
    val b = Dedup.contaminationBloom(corpus, "doc_id", "text", bench, "text")
    val diff = a.withColumnRenamed("n_hits", "h1")
      .join(b.withColumnRenamed("n_hits", "h2"), Seq("doc_id"), "full_outer")
      .where(col("h1").isNull || col("h2").isNull || col("h1") =!= col("h2"))
      .count()
    println(s"CONTAM_PROBE diff_rows=$diff (must be 0)")
    assert(diff == 0, s"bloom path diverged: $diff rows differ")
    spark.stop()
  }
}

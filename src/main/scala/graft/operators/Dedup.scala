package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Deduplication operators for training-data pipelines.
  *
  * Scale design (100 TB):
  *  - [[exact]]: one hash-shuffle on the dedup key — the minimal possible.
  *  - [[minHashSignatures]]: ZERO shuffle — per-row `array_min(transform(...))`
  *    HOFs compute the whole signature inside the scan stage.
  *  - [[lshCandidatePairs]]: one explode + one groupBy on (band, bandHash) —
  *    the canonical shingle→minhash→band→bucket-join plan; bucket sizes are
  *    capped to keep a degenerate bucket from exploding quadratically.
  *  - [[simHash]]: zero shuffle per-row signature; pairing joins on the
  *    4-bit-block bands of the signature.
  */
object Dedup {

  /** Exact dedup: keep the min id per normalized-content group.
    * Returns (keepId, nCopies) per distinct content. */
  def exact(df: DataFrame, idCol: String, keyCols: Seq[Column]): DataFrame =
    df.groupBy(keyCols: _*)
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** MinHash signature as an array column, NO shuffle: for each of
    * `numHashes` seeded xxhash64 functions, the min over the document's
    * distinct character shingles. */
  def minHashSignatures(text: Column, numHashes: Int,
                        shingleSize: Int = 5): Column = {
    val shingles = distinctShingles(text, shingleSize)
    array((0 until numHashes).map { i =>
      array_min(transform(shingles, s => xxhash64(s, lit(i))))
    }: _*)
  }

  /** Banded LSH candidate pairs from a signature column.
    * rowsPerBand consecutive signature entries form a band; documents
    * sharing any full band are candidates. One explode + one shuffle.
    * `maxBucket` caps pathological buckets (all-identical spam) so a single
    * bucket cannot go quadratic at scale. */
  def lshCandidatePairs(df: DataFrame, idCol: String, sigCol: String,
                        numHashes: Int, rowsPerBand: Int,
                        maxBucket: Int = 1000): DataFrame = {
    val numBands = numHashes / rowsPerBand
    val banded = df.select(col(idCol), posexplode(
      transform(sequence(lit(0), lit(numBands - 1)),
        b => struct(b.as("band"),
          xxhash64(concat_ws(",",
            slice(col(sigCol), b * rowsPerBand + 1, lit(rowsPerBand))), b)
            .as("bucket")))))
      .select(col(idCol), col("col.band"), col("col.bucket"))
    val grouped = banded.groupBy("band", "bucket")
      .agg(sort_array(collect_list(col(idCol))).as("ids"))
      .where(size(col("ids")).between(2, maxBucket))
    grouped.select(explode(pairsOf(col("ids"))).as("p"))
      .select(col("p.a"), col("p.b"))
      .distinct()
  }

  /** All ordered pairs (a<b) of a sorted id array, as array<struct<a,b>>. */
  private def pairsOf(ids: Column): Column =
    flatten(transform(ids, (x, i) =>
      transform(slice(ids, i + 2, size(ids)), y =>
        struct(x.as("a"), y.as("b")))))

  /** 64-bit SimHash of the document's distinct tokens, NO shuffle: per bit,
    * sign of the sum of ±1 votes from each token's xxhash64 bit. */
  def simHash64(text: Column): Column = {
    val toks = array_distinct(tokens(text))
    val hashes = transform(toks, t => xxhash64(t))
    (0 until 64).map { b =>
      val votes = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, b).bitwiseAND(lit(1L)) === 1L,
          lit(1L)).otherwise(lit(-1L)))
      when(votes > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce[Column](_ + _)
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** n-gram Jaccard similarity between two texts' distinct shingle sets. */
  def nGramJaccard(a: Column, b: Column, n: Int = 3): Column = {
    val (sa, sb) = (distinctShingles(a, n), distinctShingles(b, n))
    val inter = size(array_intersect(sa, sb))
    // |A ∪ B| = |A| + |B| − |A ∩ B| (array_union not needed)
    inter.cast("double") / (size(sa) + size(sb) - inter)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deterministic sampling / splitting for training-data pipelines —
  * net-new relative to the reference (which has no sampling surface).
  *
  * Everything here is a STATELESS narrow expression over a key column:
  * no RNG state, no driver coordination, no shuffle (except the per-key cap,
  * which is one window) — the properties that make a split reproducible
  * across reruns, engines, and cluster sizes at 100 TB.
  */
object Sampling {

  /** Deterministic bucket in [0, buckets) from a numeric id column.
    * Affine-mod keeps it reproducible in ANY engine (the DuckDB oracle
    * replays it verbatim); use [[hashBucket]] when ids are adversarial
    * (sequential ids land in contiguous buckets under affine-mod). */
  def bucket(id: Column, buckets: Int = 100): Column =
    pmod(id * 37 + 11, lit(buckets))

  /** xxhash64-based bucket — production default: uniform for ANY id
    * distribution (engine-specific hash, so driver checks are rows-only). */
  def hashBucket(id: Column, buckets: Int = 100): Column =
    pmod(xxhash64(id), lit(buckets))

  /** Assign a split label from cumulative weight boundaries, e.g.
    * `Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)`. Deterministic in
    * the id — the same row lands in the same split on every rerun. */
  def splitColumn(id: Column, weights: Seq[(String, Double)],
                  buckets: Int = 100): Column = {
    require(math.abs(weights.map(_._2).sum - 1.0) < 1e-9,
      s"split weights must sum to 1: $weights")
    val b = bucket(id, buckets)
    val bounds = weights.scanLeft(0.0)(_ + _._2).tail
      .map(w => math.round(w * buckets).toInt)
    weights.zip(bounds).init.foldRight(lit(weights.last._1): Column) {
      case (((name, _), hi), tail) => when(b < hi, name).otherwise(tail)
    }
  }

  /** Per-stratum sampling rates: keep a row iff its bucket falls under the
    * stratum's rate (deterministic analog of `sampleBy`). Unknown strata use
    * `defaultRate`. Pure filter — the scan prunes everything else. */
  def stratifiedFilter(id: Column, stratum: Column,
                       rates: Map[String, Double],
                       defaultRate: Double = 0.0,
                       buckets: Int = 100): Column = {
    val b = bucket(id, buckets)
    val rate = rates.foldRight(lit(defaultRate): Column) {
      case ((k, r), tail) => when(stratum === k, r).otherwise(tail)
    }
    b < rate * buckets
  }

  /** Temperature-balanced per-source keep rates — the multilingual-mixture
    * trick (sample source s with probability ∝ p_s^α, α<1 flattening the
    * distribution toward low-resource sources): returns the LARGEST
    * single-pass downsampling rates that realize the target mixture,
    * `rate_s = (p_s/p_min)^(α-1)` — exactly 1.0 for the rarest source,
    * <1 for bigger ones. Feed the result to [[stratifiedFilter]] for the
    * deterministic keep decision. The groupBy collect is one row per
    * SOURCE (a handful at any corpus size) — not data-proportional. */
  def temperatureRates(df: DataFrame, keyCol: String,
                       alpha: Double): Map[String, Double] = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1], got $alpha")
    val counts = df.groupBy(col(keyCol)).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    require(counts.nonEmpty, "temperatureRates: empty input")
    val total = counts.values.sum.toDouble
    val qOverP = counts.map { case (k, c) =>
      k -> math.pow(c / total, alpha - 1.0)
    }
    val top = qOverP.values.max
    qOverP.map { case (k, v) => k -> v / top }
  }

  /** Cap rows per key (e.g. max N documents per domain/source — the
    * standard pretraining-mix control): keep the top `k` per key by
    * `orderBy`. One hash shuffle on the key + WindowGroupLimit pushdown
    * (Spark prunes beyond-k rows map-side before the shuffle). */
  def capPerKey(df: DataFrame, keyCol: String, k: Int,
                orderBy: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(orderBy: _*)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k)
      .drop("__rn")
  }

  /** Deterministic GLOBAL SHUFFLE — training-order randomization. Orders
    * the frame by a seeded hash of `idCol`: a reproducible,
    * data-independent permutation of the corpus (the shuffle every
    * training run needs between curation and sharding). Plan:
    * repartitionByRange on the hash key + sortWithinPartitions — a TOTAL
    * order across output partitions (partition i's keys all precede
    * partition i+1's) with no driver-side or single-partition sort, so
    * shards stream out in shuffled order at any scale, and
    * `.limit(n)` / shard writes read the true global prefix/order.
    * Default key is xxhash64(id, seed) (codegen'd); `portableHash` uses
    * md5 over `"id:seed"` so other engines (DuckDB, pandas) can replay
    * the exact order. Rows with duplicate ids hash equal and keep an
    * arbitrary relative order — pass a unique id for a true permutation. */
  def globalShuffle(df: DataFrame, idCol: String, seed: Long = 42L,
                    numPartitions: Int = 32,
                    portableHash: Boolean = false): DataFrame = {
    val key =
      if (portableHash) md5(concat(col(idCol).cast("string"), lit(s":$seed")))
      else xxhash64(col(idCol), lit(seed))
    df.withColumn("__gs_key", key)
      .repartitionByRange(numPartitions, col("__gs_key"))
      .sortWithinPartitions("__gs_key")
      .drop("__gs_key")
  }

  /** Write the frame as `nShards` deterministic hash shards
    * (`__shard=N/part-*.parquet`) — the layout training jobs consume
    * (each data-loader rank reads its own shard directories). The
    * repartition on the shard key BEFORE partitionBy is load-bearing:
    * without it every task writes a file into every shard directory
    * (tasks × shards small files — the writeIvfBucketed lesson); with it
    * each shard is one file per owning task and a shard's rows are
    * co-located for downstream per-shard packing. */
  def writeShards(df: DataFrame, path: String, nShards: Int,
                  idCol: String): Unit =
    df.withColumn("__shard", hashBucket(col(idCol), nShards))
      .repartition(col("__shard"))
      .write.mode("overwrite").partitionBy("__shard").parquet(path)
}

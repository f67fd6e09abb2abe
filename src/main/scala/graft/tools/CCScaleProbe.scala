package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Billion-edge scale probe for star-contraction connected components:
  * `runMain graft.tools.CCScaleProbe [chainSize] [nTrees] [treeSize]
  * [nSmall] [smallSize]`.
  *
  * Builds a graph with PLANTED component sizes, entirely with range +
  * hash expressions (no driver-side edge list):
  *  - one chain component of `chainSize` vertices (long-diameter worst
  *    case: label propagation needs O(n) rounds here, star contraction
  *    O(log² n));
  *  - `nTrees` random-tree components of `treeSize` vertices each
  *    (parent = seeded hash of the vertex, uniform over earlier
  *    vertices of the same tree);
  *  - `nSmall` components of `smallSize` vertices (the near-dup-cluster
  *    shape: huge count of tiny components).
  *
  * Verifies component COUNT and the full per-size histogram against the
  * planted truth (one groupBy over the labels, distributed), and reports
  * rounds-to-convergence (verbose ccStars output) + peak JVM pool usage.
  * Run with SPARK_DRIVER_MEM=96g for the 1B-edge configuration. */
object CCScaleProbe {
  def main(args: Array[String]): Unit = {
    val chainSize = if (args.length > 0) args(0).toLong else 1000000L
    val nTrees = if (args.length > 1) args(1).toLong else 99L
    val treeSize = if (args.length > 2) args(2).toLong else 1000000L
    val nSmall = if (args.length > 3) args(3).toLong else 100000L
    val smallSize = if (args.length > 4) args(4).toLong else 10L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "96"))
      // with a big pre-touched ParallelGC heap, full GCs are rare, so
      // dereferenced shuffle files linger on disk; at 1B edges each
      // round writes ~100 GB of shuffle — force the ContextCleaner's
      // periodic GC often enough that only ~1 round's files are live
      .config("spark.cleaner.periodicGC.interval", "120s")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base1 = chainSize
    val base2 = base1 + nTrees * treeSize
    val nVerts = base2 + nSmall * smallSize
    val nEdges = (chainSize - 1) + nTrees * (treeSize - 1) +
      nSmall * (smallSize - 1)
    println(s"[ccscale] vertices=$nVerts edges=$nEdges " +
      s"components=${1 + nTrees + nSmall}")

    val chain = spark.range(1L, chainSize).toDF("v")
      .select(col("v").as("a"), (col("v") - 1).as("b"))
    def strata(n: Long, size: Long, base: Long, seed: Int) =
      spark.range(n * size).toDF("i")
        .where(col("i") % size =!= 0) // local position 0 is the root
        .select(
          (lit(base) + col("i")).as("a"),
          // parent: uniform over the earlier vertices of the same tree
          (lit(base) + (col("i") - col("i") % size) +
            pmod(xxhash64(col("i"), lit(seed)), col("i") % size)).as("b"))
    val trees = strata(nTrees, treeSize, base1, seed = 7)
    val small = strata(nSmall, smallSize, base2, seed = 13)
    val edges = chain.union(trees).union(small)

    val t0 = System.nanoTime()
    val labels = graft.operators.Dedup.connectedComponentsStars(edges,
      maxIter = 40, verbose = true)
    // verify: component histogram == planted truth
    val hist = labels.groupBy("component").count()
      .groupBy("count").agg(count(lit(1)).as("n_components"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val secs = (System.nanoTime() - t0) / 1e9
    // Seq of pairs, NOT a Map literal: with default args chainSize ==
    // treeSize, and a Map would collapse the duplicate key BEFORE the
    // merge-by-size groupBy runs (losing the chain's 1 component).
    val expected = Seq(
      chainSize -> 1L, treeSize -> nTrees, smallSize -> nSmall)
      .filter(_._2 > 0)
      // merge strata that share a size
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    println(s"[ccscale] histogram=$hist expected=$expected")
    assert(hist == expected,
      s"component size histogram mismatch: got $hist want $expected")
    val peakMb = java.lang.management.ManagementFactory
      .getMemoryPoolMXBeans.toArray.map {
        case p: java.lang.management.MemoryPoolMXBean =>
          Option(p.getPeakUsage).map(_.getUsed).getOrElse(0L)
      }.sum / (1024 * 1024)
    println(f"[ccscale] OK edges=$nEdges time=$secs%.1fs " +
      f"peak_jvm_pools=${peakMb}MB " +
      f"throughput=${nEdges / secs / 1e6}%.1fM edges/s")
    spark.stop()
  }
}

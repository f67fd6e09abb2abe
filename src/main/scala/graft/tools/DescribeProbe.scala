package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.nested.NestedOps

/** describe(approx=true) at scale: measures the exact-vs-sketch cost gap
  * and VERIFIES the Greenwald-Khanna rank-error contract on data too big
  * to eyeball — `runMain graft.tools.DescribeProbe [nRows]` (default 50M).
  *
  * Data is deterministic (xxhash64 of the row id → uniform → heavy-tailed
  * via an exp transform, plus a nested column of 1-4 elements per key) so
  * reruns are comparable. For each approx percentile value v_p the probe
  * computes the TRUE rank of v_p with one exact pass and asserts
  * |rank − p| ≤ 1/accuracy + ε. Results recorded in SCALING.md §describe. */
object DescribeProbe {
  def main(args: Array[String]): Unit = {
    val nRows = if (args.length > 0) args(0).toLong else 50000000L
    // heap comes from the forked JVM's -Xmx (build.sbt javaOptions,
    // SPARK_DRIVER_MEM env) — spark.driver.memory set here would be a
    // no-op in local mode, the JVM is already running. Recorded runs:
    // SPARK_DRIVER_MEM=24g (5M) / 40g (50M).
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")

    // heavy-tailed base column + a nested column (2 fields, 1-4 elements)
    val u = (xxhash64(col("id")).cast("double") / lit(Long.MaxValue.toDouble)
      + lit(1.0)) / lit(2.0) // uniform (0,1)
    val base = spark.range(nRows)
      .withColumn("v", -log(u) * exp(u * 3.0)) // skewed, long right tail
      .withColumn("n", transform(
        sequence(lit(1), (pmod(xxhash64(col("id"), lit(7)), lit(4)) + 1)
          .cast("int")),
        i => struct((xxhash64(col("id"), i).cast("double") /
          lit(Long.MaxValue.toDouble) * 100.0).as("x"))))
      .select(col("v"), col("n"))

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    base.cache().count() // exclude generation from both timings
    val pcts = Seq(0.01, 0.25, 0.5, 0.75, 0.99)
    val approxAcc = 10000
    val approxRows = time("describe approx (GK sketch, one pass)") {
      NestedOps.describeAll(base, percentiles = pcts, approx = true,
        approxAccuracy = approxAcc).collect()
    }
    // exact percentile buffers EVERY value of a layer in ONE aggregation
    // buffer (global group) — measured 373.7s at 5M rows where approx took
    // 8.3s; skip it past 10M (the rank check below is exact regardless)
    if (nRows <= 10000000L)
      time("describe exact (sort-based percentile)") {
        NestedOps.describeAll(base, percentiles = pcts,
          exactRowLimit = Long.MaxValue).collect() // probe MEASURES exact
      }

    // verify the rank contract for every approx percentile of both layers
    val pctStats = approxRows.collect {
      case r if r.getString(1).endsWith("%") =>
        (r.getString(0), r.getString(1).stripSuffix("%").toDouble / 100.0,
          r.getDouble(2))
    }
    val nFlat = base.select(explode(col("n"))).count().toDouble
    var worst = 0.0
    pctStats.foreach { case (colName, p, v) =>
      val (rank, total) = colName match {
        case "v" => (base.where(col("v") <= v).count().toDouble, nRows.toDouble)
        case "n.x" => (base.select(explode(col("n")).as("e"))
          .where(col("e.x") <= v).count().toDouble, nFlat)
      }
      val err = math.abs(rank / total - p)
      worst = math.max(worst, err)
      println(f"  $colName p=$p%.2f v=$v%.4f trueRank=${rank / total}%.6f rankErr=$err%.6f")
      require(err <= 1.0 / approxAcc + 1e-6,
        f"rank error $err%.6f exceeds 1/$approxAcc for $colName p=$p")
    }
    println(f"PROBE OK: worst rank error $worst%.6f (bound ${1.0 / approxAcc})")
    spark.stop()
  }
}

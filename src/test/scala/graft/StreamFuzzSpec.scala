package graft

import org.apache.spark.sql.functions._
import graft.streaming.StreamingOps

/** Streaming ≡ batch property fuzz (r9): seeded random event sets, split
  * into 1-3 arrival batches with bounded out-of-orderness, run through
  * packStream / dedupStream and compared against the BATCH formulation of
  * the same semantics. The reference has no streaming surface — the batch
  * operators (oracle-gated elsewhere) are the ground truth here; this
  * spec's job is the stream/batch equivalence across input shapes the
  * hand-pinned fixtures don't cover. */
class StreamFuzzSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

  private val t0 = 1700000000000L

  private case class Ev(user_id: Long, offMin: Long, value: Double)

  private def genEvents(r: scala.util.Random): Seq[Ev] = {
    val n = 6 + r.nextInt(14)
    Seq.fill(n)(Ev(1L + r.nextInt(4),
      r.nextInt(40).toLong, // inside ~4 windows of 10 min
      math.floor(r.nextDouble() * 100) / 10))
  }

  /** Arrival order: roughly by time with bounded jitter (stays inside the
    * watermark so the stream must not drop anything), split into batches. */
  private def arrivalBatches(evs: Seq[Ev], r: scala.util.Random)
      : Seq[Seq[Ev]] = {
    // precompute the jittered key: sortBy re-evaluates its key function
    // inside the comparator, so a random-valued key would be an
    // inconsistent (TimSort-breaking) ordering
    val jittered = evs.map(e => (e, e.offMin + r.nextInt(8) - 4))
      .sortBy(_._2).map(_._1)
    val nb = 1 + r.nextInt(3)
    val per = math.max(1, jittered.length / nb)
    jittered.grouped(per).toSeq
  }

  test("packStream ≡ batch windowed pack over 12 seeded random inputs") {
    for (seed <- 1 to 12) {
      val r = new scala.util.Random(900 + seed)
      val evs = genEvents(r)
      val ms = MemoryStream[(Long, java.sql.Timestamp, Double)](spark)
      val df = ms.toDF().toDF("user_id", "ts", "value")
      val packed = StreamingOps.packStream(df, "user_id", "ts",
        Seq("value"), "events", "10 minutes", "60 minutes")
      val qn = s"fuzzpack$seed"
      val q = packed.writeStream.outputMode("complete")
        .format("memory").queryName(qn).start()
      try {
        arrivalBatches(evs, r).foreach { b =>
          ms.addData(b.map(e => (e.user_id,
            new java.sql.Timestamp(t0 + e.offMin * 60000L), e.value)))
          q.processAllAvailable()
        }
        val got = spark.sql(
          s"SELECT user_id, window.start, size(events) FROM $qn")
          .as[(Long, java.sql.Timestamp, Int)].collect()
          .map { case (u, w, n) => (u, w.getTime, n) }.toSet
        val batch = evs.map(e => (e.user_id, e.offMin, e.value))
          .toDF("user_id", "offMin", "value")
          .withColumn("ts", expr(s"timestamp_millis($t0 + offMin * 60000)"))
          .groupBy($"user_id", window($"ts", "10 minutes"))
          .agg(count(lit(1)).cast("int").as("n"))
          .select($"user_id", $"window.start", $"n")
          .as[(Long, java.sql.Timestamp, Int)].collect()
          .map { case (u, w, n) => (u, w.getTime, n) }.toSet
        assert(got == batch, s"seed $seed: stream $got != batch $batch")
      } finally q.stop()
    }
  }

  test("dedupStream keeps exactly one row per key over 12 seeded inputs " +
      "(within-watermark arrivals)") {
    for (seed <- 1 to 12) {
      val r = new scala.util.Random(7700 + seed)
      val evs = genEvents(r)
      val ms = MemoryStream[(Long, java.sql.Timestamp, Double)](spark)
      val df = ms.toDF().toDF("user_id", "ts", "value")
      val deduped = StreamingOps.dedupStream(df, "ts", Seq("user_id"),
        watermark = "2 hours")
      val qn = s"fuzzdedup$seed"
      val q = deduped.writeStream.outputMode("append")
        .format("memory").queryName(qn).start()
      try {
        arrivalBatches(evs, r).foreach { b =>
          ms.addData(b.map(e => (e.user_id,
            new java.sql.Timestamp(t0 + e.offMin * 60000L), e.value)))
          q.processAllAvailable()
        }
        val got = spark.sql(s"SELECT user_id FROM $qn")
          .as[Long].collect().toSeq
        val expectKeys = evs.map(_.user_id).distinct.sorted
        assert(got.sorted == expectKeys,
          s"seed $seed: got ${got.sorted} expected $expectKeys")
      } finally q.stop()
    }
  }
}

package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-JOB breakdown of a declared query (guide §1.1 empirical loop):
  * `runMain graft.tools.JobProfile <queryCsv> [reps] [sfDir]`.
  *
  * Multi-action queries (eager checkpoints, fixture writes, iterative CC,
  * planted-truth scalars) hide their time budget from a single wall-clock
  * number; a listener logging each job's duration says whether the cost is
  * one heavy stage or many small job barriers (framework-bound). Last rep
  * only is reported (steady state; earlier reps absorb codegen/JIT).
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    // (jobId, start ns, end ns, desc): absolute intervals so the summary can
    // union them (overlapped jobs would otherwise produce a negative "gap")
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long, String)]()
    // @volatile + a jobId watermark (ADVICE r13): the flags are read from the
    // async listener-bus thread, and late JobEnd events from warm-up reps
    // must not be attributed to the timed rep
    @volatile var collecting = false
    @volatile var jobIdWatermark = -1
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        starts.put(js.jobId, (System.nanoTime(), desc))
        ()
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        if (collecting && je.jobId > jobIdWatermark) {
          Option(starts.get(je.jobId)).foreach { case (t0, desc) =>
            jobs.add((je.jobId, t0, System.nanoTime(), desc))
          }
        }
        ()
      }
    })

    names.foreach { nm =>
      val fn = graft.SparkEntry.queries(nm)
      (1 until reps).foreach { _ => fn(spark, sfDir).count() } // warm
      // watermark: only jobs STARTED after this point are attributed to the
      // timed rep (late warm-up JobEnds carry a smaller jobId and are dropped)
      jobIdWatermark = spark.sparkContext.statusTracker.getJobIdsForGroup(null)
        .foldLeft(-1)(math.max)
      jobs.clear(); starts.clear()
      collecting = true
      val t0 = System.nanoTime()
      val c = fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      // drain: listener events are async — give the bus a moment
      Thread.sleep(500)
      collecting = false
      println(f"[jobprofile] $nm wall=$wall%.3f rows=$c jobs=${jobs.size}")
      import scala.jdk.CollectionConverters._
      val sum = jobs.asScala.toSeq.sortBy(_._1)
      sum.foreach { case (id, s0, s1, desc) =>
        println(f"[jobprofile]   job $id%3d ${(s1 - s0) / 1e9}%7.3f s  $desc")
      }
      // busy = union of job intervals (overlapped jobs must not double-count;
      // a raw per-job sum can exceed wall and read as a negative gap)
      val iv = sum.map { case (_, s0, s1, _) => (s0, s1) }.sortBy(_._1)
      val busy = iv.foldLeft((0L, Long.MinValue)) { case ((acc, hi), (s0, s1)) =>
        if (s0 > hi) (acc + (s1 - s0), s1) else (acc + math.max(0L, s1 - hi), math.max(hi, s1))
      }._1 / 1e9
      println(f"[jobprofile]   sum-of-jobs ${sum.map(t => (t._3 - t._2) / 1e9).sum}%.3f s; " +
        f"busy(union) $busy%.3f s; idle gaps (driver planning/analysis): ${wall - busy}%.3f s")
    }
    spark.stop()
  }
}

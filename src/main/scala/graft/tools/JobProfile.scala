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
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, Int, String)]()
    var collecting = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        starts.put(js.jobId, (System.nanoTime(), desc))
        ()
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        if (collecting) {
          Option(starts.get(je.jobId)).foreach { case (t0, desc) =>
            jobs.add((je.jobId, (System.nanoTime() - t0) / 1e9, 0, desc))
          }
        }
        ()
      }
    })

    names.foreach { nm =>
      val fn = graft.SparkEntry.queries(nm)
      (1 until reps).foreach { _ => fn(spark, sfDir).count() } // warm
      jobs.clear()
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
      sum.foreach { case (id, sec, _, desc) =>
        println(f"[jobprofile]   job $id%3d $sec%7.3f s  $desc")
      }
      println(f"[jobprofile]   sum-of-jobs ${sum.map(_._2).sum}%.3f s " +
        f"(gaps = driver planning/analysis: ${wall - sum.map(_._2).sum}%.3f s)")
    }
    spark.stop()
  }
}

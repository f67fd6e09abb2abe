package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Measures the bounded top-k aggregate against the window-rank form on a
  * large synthetic scored set: `runMain graft.tools.TopKProbe [nQueries]
  * [candidatesPerQuery] [k]`. The point at scale is structural (bounded
  * shuffle, no sort) — this probe puts a number on it at one box's size. */
object TopKProbe {
  def main(args: Array[String]): Unit = {
    val nQ = if (args.length > 0) args(0).toInt else 50
    val perQ = if (args.length > 1) args(1).toLong else 2000000L
    val k = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // deterministic pseudo-random scores; both forms read the same frame
    val scored = spark.range(nQ * perQ).select(
      (col("id") % nQ).as("query_id"),
      col("id").as("neighbor_id"),
      (pmod(col("id") * 2654435761L, lit(1000003L)).cast("double") / 1000003.0)
        .as("sim"))
    def time(label: String)(f: => Long): Unit = {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"$label RUN$i: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
      }
    }
    time("agg")(Similarity.topKPerQuery(scored, k, "sim").count())
    time("window")(Similarity.topKPerQueryWindow(scored, k, "sim").count())
    val a = Similarity.topKPerQuery(scored, k, "sim")
      .orderBy("query_id", "rank").collect().toSeq
    val w = Similarity.topKPerQueryWindow(scored, k, "sim")
      .orderBy("query_id", "rank").collect().toSeq
    println(s"identical=${a == w}")
    spark.stop()
  }
}

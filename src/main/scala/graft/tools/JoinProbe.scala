package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Joins

/** As-of / range join scale probe: synthetic keyed time series.
  * `runMain graft.tools.JoinProbe [leftRows] [rightRows] [keys]` —
  * measures the union-sweep as-of and the banded range join at sizes
  * where the naive per-key cross formulations are already infeasible
  * (leftRows/keys × rightRows/keys pairs per key). */
object JoinProbe {
  def main(args: Array[String]): Unit = {
    val nL = if (args.length > 0) args(0).toLong else 10000000L
    val nR = if (args.length > 1) args(1).toLong else 10000000L
    val keys = if (args.length > 2) args(2).toInt else 1000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val left = spark.range(nL).select(col("id").as("eid"),
      (col("id") % keys).as("k"),
      pmod(col("id") * 2654435761L, lit(1000000007L)).as("ts"))
    val right = spark.range(nR).select(col("id").as("rid"),
      (col("id") % keys).as("k"),
      pmod(col("id") * 2246822519L, lit(1000000007L)).as("ts"),
      (col("id") % 97).cast("double").as("v"))
    def time(label: String)(f: => Long): Unit =
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"$label RUN$i: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
      }
    // aggregate the MATCHED payload — a bare count() lets Catalyst prune
    // the match column and eliminate the window, measuring nothing
    time("asof")(
      Joins.asofJoin(left, right, "k", "ts", rightTieBreak = Seq("rid"))
        .agg(count(col("v")).as("n"), avg(col("v")))
        .collect()(0).getLong(0))
    time("range")(
      Joins.rangeJoin(left, right, "k", "ts", windowLen = 50L).count())
    spark.stop()
  }
}

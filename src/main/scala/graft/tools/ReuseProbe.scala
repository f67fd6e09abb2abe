package graft.tools

import org.apache.spark.sql.SparkSession

/** Executes a registry query and prints its FINAL adaptive plan — used to
  * verify (not assert) runtime exchange/subquery reuse claims:
  * `runMain graft.tools.ReuseProbe <queryName>`. */
object ReuseProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(args(0))(spark, "/root/testdata/sf0.001")
    df.collect() // materialize so AQE finalizes the plan
    val plan = df.queryExecution.executedPlan.toString
    println(s"REUSED_EXCHANGE=${"ReusedExchange".r.findAllIn(plan).size}")
    println(s"REUSED_SUBQUERY=${"ReusedSubquery".r.findAllIn(plan).size}")
    // word-boundary so ReusedExchange/BroadcastExchange don't inflate the
    // shuffle count; broadcasts counted separately
    println(s"SHUFFLE_EXCHANGES=${"(?<![A-Za-z])Exchange".r.findAllIn(plan).size}")
    println(s"BROADCAST_EXCHANGES=${"BroadcastExchange".r.findAllIn(plan).size}")
    println(plan.take(6000))
    spark.stop()
  }
}

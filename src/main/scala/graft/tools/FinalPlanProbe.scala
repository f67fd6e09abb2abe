package graft.tools
import org.apache.spark.sql.SparkSession

/** Print a query's FINAL (post-AQE) physical plan after executing it —
  * PlanProbe shows the pre-execution plan, which hides runtime exchange
  * and subquery reuse. Usage: runMain graft.tools.FinalPlanProbe <query>. */
object FinalPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(args(0))(spark, "/root/testdata/sf0.001")
    df.collect()
    println(df.queryExecution.executedPlan.toString.take(12000))
    spark.stop()
  }
}

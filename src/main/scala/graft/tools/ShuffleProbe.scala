package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Sampling

/** globalShuffle at scale: `runMain graft.tools.ShuffleProbe [rows]
  * [partitions]`. The operator's structural claim is "total shuffled order
  * with no driver or single-partition sort"; this puts numbers on the two
  * passes it actually costs (RangePartitioner's sample job + the shuffle
  * write/read) and verifies the cross-partition order property at size.
  */
object ShuffleProbe {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toLong else 100000000L
    val parts = if (args.length > 1) args(1).toInt else 64
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val df = spark.range(rows).toDF("id")
      .withColumn("payload", xxhash64(col("id")))
    val t0 = System.nanoTime()
    val shuffled = Sampling.globalShuffle(df, "id", seed = 11L,
      numPartitions = parts)
    val n = shuffled.count()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"SHUFFLE rows=$n parts=$parts time=$secs%.1fs " +
      f"(${n / secs / 1e6}%.1fM rows/s)")

    // cross-partition total order at size: partition i's max key must
    // precede partition i+1's min key (computed distributed, collect is
    // one row per partition)
    val bounds = shuffled
      .withColumn("k", xxhash64(col("id"), lit(11L)))
      .withColumn("p", spark_partition_id())
      .groupBy("p").agg(min("k").as("lo"), max("k").as("hi"))
      .orderBy("p")
      .as[(Int, Long, Long)].collect()
    val ordered = bounds.sliding(2).forall {
      case Array((_, _, hi), (_, lo, _)) => hi <= lo
      case _ => true
    }
    println(s"ORDER partitions=${bounds.length} totalOrder=$ordered " +
      s"minPart=${bounds.map(b => b._3 - b._2).min} " +
      s"maxPart=${bounds.map(b => b._3 - b._2).max}")
    require(ordered, "cross-partition order violated")
    spark.stop()
  }
}

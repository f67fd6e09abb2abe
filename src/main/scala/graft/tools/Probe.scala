package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratch-pad main: `sbt "runMain graft.tools.Probe <sql...>"`.
  * Reads the sf0.001 tables as temp views and runs ad-hoc SQL / checks. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.register(spark)
    val dir = sys.env.getOrElse("PROBE_DIR", "/root/testdata/sf0.001")
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings").foreach { t =>
      spark.read.parquet(s"$dir/$t.parquet").createOrReplaceTempView(t)
    }
    val sql = if (args.nonEmpty) args.mkString(" ")
              else "SELECT * FROM events LIMIT 3"
    val df = spark.sql(sql)
    df.printSchema()
    df.show(20, false)
    spark.stop()
  }
}

/** Runs the driver's t1 smoke: SparkEntry.entry rows>0. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.entry(spark)
    df.show(5, false)
    println(s"ENTRY_ROWS=${df.count()}")
    spark.stop()
  }
}

/** Checks Catalyst nested-schema pruning: write nested parquet, read back a
  * single leaf through inline(), print the scan's ReadSchema. */
object PruneCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val path = "/tmp/graft_prune_check"
    graft.sources.NestedParquet.generateData(spark, 100, 10)
      .write.mode("overwrite").parquet(path)
    val df = spark.read.parquet(path)
    import org.apache.spark.sql.functions._
    def readSchema(d: org.apache.spark.sql.DataFrame): String = {
      val plan = d.queryExecution.executedPlan.toString
      plan.linesIterator.filter(_.contains("ReadSchema")).mkString("; ")
    }
    val v1 = df.select(col("id"), inline(col("nested"))).select("id", "flux")
    println("V1 inline-then-select: " + readSchema(v1))
    val v2 = graft.nested.NestedOps.selectSubFields(df, "nested", Seq("flux"))
      .select(col("id"), inline(col("nested")))
    println("V2 transform-prune-then-inline: " + readSchema(v2))
    val v3 = df.select(col("id"), explode(col("nested.flux")).as("flux"))
    println("V3 field-path-explode: " + readSchema(v3))
    val v4 = graft.sources.NestedParquet.selectColumns(df, Seq("id", "nested.flux"))
    println("V4 selectColumns: " + readSchema(v4))
    spark.stop()
  }
}

/** Probes the registered graft_* SQL functions incl. error paths. */
object ExtProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.register(spark)
    println("OK1=" + spark.sql("SELECT graft_dot(array(1.0, 2.0), array(3.0, 4.0))").head.getDouble(0))
    try { spark.sql("SELECT graft_dot('oops', array(1.0))").collect() }
    catch { case e: Exception => println("ERR1=" + e.getMessage.linesIterator.next()) }
    try { spark.sql("SELECT graft_minhash(123, 4, 3)").collect() }
    catch { case e: Exception => println("ERR2=" + e.getMessage.linesIterator.next()) }
    // codegen check: the dot should appear inside a WholeStageCodegen stage
    val df = spark.sql(
      "SELECT graft_dot(array(cast(id AS DOUBLE), 2.0), array(2.0, cast(id AS DOUBLE))) AS d FROM range(5)")
    val plan = df.queryExecution.executedPlan.toString
    // '*(n)' node prefix == inside WholeStageCodegen stage n
    println("CODEGEN=" + plan.linesIterator.next().trim.startsWith("*("))
    spark.stop()
  }
}

/** Probes NestedExpr dialect edge cases at runtime. */
object DialectProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val base = Seq((0L, 1), (1L, 2)).toDF("key", "a")
    val c1 = Seq((0L, 1), (1L, 2)).toDF("key", "x")
    val c2 = Seq((0L, 9), (1L, 8)).toDF("key", "y")
    val nf = graft.nested.NestedOps.joinNested(
      graft.nested.NestedOps.joinNested(base, c1, Seq("key"), "n1"),
      c2, Seq("key"), "n2")
    def tryIt(label: String)(f: => Any): Unit =
      try { f; println(s"$label=OK") }
      catch { case e: Exception =>
        println(s"$label=REJECTED: ${e.getMessage.linesIterator.next().take(90)}") }
    tryIt("CROSS_NEST_ASSIGN") {
      graft.nested.NestedExpr.evalAssign(nf, "n1.z = n2.y + 1").collect() }
    tryIt("CROSS_NEST_QUERY") {
      graft.nested.NestedExpr.query(nf, "n1.x > n2.y").collect() }
    tryIt("MALFORMED") {
      graft.nested.NestedExpr.evalAssign(nf, "== nonsense ==").collect() }
    tryIt("NEW_NEST") {
      val r = graft.nested.NestedExpr.evalAssign(nf, "n3.z = n1.x * 10")
      println("  n3[0].z per row: " + r.orderBy("key")
        .select(expr("n3[0].z")).as[Int].collect().toSeq) }
    spark.stop()
  }
}

/** Scale probe: generateData at ~20M child elements, run the flagship
  * pack → element-filter → count_nested → reduce chain, print timings. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val nBase = if (args.nonEmpty) args(0).toLong else 1000000L
    val nLayer = if (args.length > 1) args(1).toInt else 20
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    import graft.nested.NestedOps
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    val flatPath = "/tmp/graft_scale_flat"
    time("write flat child parquet") {
      val nested = graft.sources.NestedParquet.generateData(spark, nBase, nLayer)
      NestedOps.toFlat(nested, "nested", baseCols = Seq("id"))
        .write.mode("overwrite").parquet(flatPath)
    }
    val child = spark.read.parquet(flatPath)
    println(s"child rows: ${child.count()}")
    time("packFlat (groupBy collect_list)") {
      NestedOps.packFlat(child, Seq("id"), "nested").write.mode("overwrite")
        .parquet("/tmp/graft_scale_packed")
    }
    val packed = spark.read.parquet("/tmp/graft_scale_packed")
    time("element filter + count_nested + reduce (narrow chain)") {
      val r = NestedOps.countNested(
        NestedOps.filterElements(packed, "nested",
          s => s.getField("flux") > 50.0),
        "nested", Some("band"), Seq("r", "g"))
        .agg(sum("n_nested_r"), sum("n_nested_g"),
          round(avg(NestedOps.elementMean("nested", "t")), 4))
      r.show(false)
    }
    spark.stop()
  }
}

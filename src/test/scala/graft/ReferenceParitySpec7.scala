package graft

import graft.nested.{MapRows, NestedExpr, NestedOps, syntax}
import syntax._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-8 second sweep: test_nestedframe.py families not yet ported —
  * the issue-number regressions (193/294/348/350), mixed base+nested
  * eval, non-identifier column names in query, dropna with the nest as
  * a base column (reference-executed golden on the committed
  * (10,100,seed=1) fixture), multi-nest combination, the nesting-depth
  * limit, and from_flat column subsets. */
class ReferenceParitySpec7 extends SparkSpec {
  import spark.implicits._

  private def g(base: String, child: String, name: String = "nested",
                sortBy: Seq[(String, Boolean)] = Seq(("t", true)))
      : DataFrame = {
    val b = spark.read.parquet(
      s"/root/repo/src/test/resources/ref_seed1/${base}.parquet")
    val c = spark.read.parquet(
      s"/root/repo/src/test/resources/ref_seed1/${child}.parquet")
    b.joinNested(c, Seq("id"), name, "left", sortBy = sortBy)
  }

  test("issue 193: arithmetic across two nested fields in query " +
      "(test_nestedframe.py test_issue193)") {
    val nf = g("g33_base", "g33_child")
    val r = NestedExpr.query(nf, "nested.flux / nested.t > 0")
    // generate_data draws t and flux positive → every element survives
    assert(r.count() == 3)
    assert(r.select(sum(size($"nested"))).as[Long].head() == 9L)
  }

  test("issue 294: after concat, set a nested field from a base column " +
      "and a computed log field (test_nestedframe.py test_issue294)") {
    val nf1 = g("g32_base", "g32_child")
    val nf2 = g("g55_base", "g55_child")
      .withColumn("id", col("id") + 100)
    val nf = nf1.unionByName(nf2).withColumn("c",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy("id")).cast("long"))
    val withC = NestedOps.withNestedFieldFilled(nf, "nested", "c", col("c"))
    val withMag = NestedExpr.evalAssign(withC,
      "nested.mag = -2.5 * log10(nested.flux)")
    // drop the base c before flattening (the nested field shares its
    // name, exactly like the reference's nf["nested.c"] = nf["c"])
    val flat = NestedOps.toFlat(withMag.drop("c"), "nested", Seq("id"))
    assert(nf.count() == 8) // 3 + 5 rows
    // c broadcast: every element of a row carries the row's c
    val perRow = flat.groupBy("id")
      .agg(countDistinct("c").as("nc")).select(max("nc")).as[Long].head()
    assert(perRow == 1L)
    // mag is exactly -2.5*log10(flux) per element
    val bad = flat.where(
      abs(col("mag") - (lit(-2.5) * log10(col("flux")))) > 1e-12).count()
    assert(bad == 0)
  }

  test("issue 348: from_flat of an EMPTY flat frame is a valid nested " +
      "frame (test_nestedframe.py test_issue348)") {
    val flat = Seq.empty[(Long, Double)].toDF("id", "x")
    val nf = NestedOps.fromFlat(flat, Nil, Seq("x"), Seq("id"), "new")
    assert(nf.count() == 0)
    assert(NestedOps.nestedColumns(nf) == Seq("new"))
    assert(NestedOps.subColumns(nf, "new") == Seq("x"))
  }

  test("issue 350: map_rows with DUPLICATE keys still yields one output " +
      "row per input row (test_nestedframe.py test_issue350)") {
    val nf = g("g32_base", "g32_child")
      .withColumn("id", when(col("id") === 1, 0L).otherwise(col("id")))
    val out = MapRows.mapRows(nf, Seq("nested.flux"),
      StructType(Seq(StructField("flux", ArrayType(DoubleType)))))(
      args => Seq(args(0)))
    assert(out.count() == 3)
  }

  test("mixed eval: a + packed.c.median() reduction and a + packed.c " +
      "across the nest (test_nestedframe.py test_mixed_eval_funcs)") {
    val base = Seq((0L, 1L, 2L), (1L, 2L, 4L), (2L, 3L, 6L))
      .toDF("idx", "a", "b")
    val child = Seq(
      (0L, 1L, 0L, 5L), (0L, 2L, 2L, 4L), (0L, 3L, 4L, 7L),
      (1L, 1L, 10L, 5L), (1L, 2L, 4L, 3L), (1L, 4L, 3L, 1L),
      (2L, 2L, 1L, 9L), (2L, 1L, 4L, 3L), (2L, 4L, 1L, 4L))
      .toDF("idx", "time", "c", "d")
    val nf = base.joinNested(child, Seq("idx"), "packed", "left",
      sortBy = Seq(("time", true)))
    // reduction → the GLOBAL median (3) broadcast: reference-executed
    // golden [4, 5, 6] (this is the r8 parity fix — per-cell medians
    // would give [3, 6, 4])
    val red = NestedExpr.evalSelect(nf, "a + packed.c.median()", "r")
      .orderBy("idx").select("r").as[Double].collect().toSeq
    assert(red == Seq(4.0, 5.0, 6.0))
    // across the nest → element-aligned array a + c (our cells are
    // time-sorted; the value multiset matches the reference's flat
    // series [1,3,5,12,6,5,4,7,4])
    val cross = NestedExpr.evalSelect(nf, "a + packed.c", "r")
      .orderBy("idx").select("r").as[Seq[Long]].collect().toSeq
    assert(cross == Seq(Seq(1L, 3L, 5L), Seq(12L, 6L, 5L),
      Seq(7L, 4L, 4L)))
  }

  test("query on non-identifier column names: spaces and slashes via " +
      "backticks (test_nestedframe.py GH#174/GH#176)") {
    val base = Seq((0L, 1L, 2L), (1L, 2L, 4L), (2L, 3L, 6L))
      .toDF("idx", "dog", "good dog")
    val child = Seq(
      (0L, 0L, 5L), (0L, 2L, 4L), (0L, 4L, 7L),
      (1L, 1L, 5L), (1L, 4L, 3L), (1L, 3L, 1L),
      (2L, 1L, 9L), (2L, 4L, 3L), (2L, 1L, 4L))
      .toDF("idx", "a", "b")
    val nf = base.joinNested(child, Seq("idx"), "bad dog", "left",
      sortBy = Seq(("a", true)))
    assert(NestedExpr.query(nf, "`good dog` > 3").count() == 2)
    val nf3 = NestedExpr.query(nf, "`bad dog`.a > 2")
    assert(nf3.select(sum(size(col("`bad dog`")))).as[Long].head() == 4L)
    // GH#176: slashes INSIDE nested field names
    val child2 = child.withColumnRenamed("a", "n/a")
      .withColumnRenamed("b", "n/b")
    val nf4in = base.joinNested(child2, Seq("idx"), "bad dog", "left",
      sortBy = Seq(("n/a", true)))
    val nf4 = NestedExpr.query(nf4in, "`bad dog`.`n/a` > 2")
    assert(nf4.select(sum(size(col("`bad dog`")))).as[Long].head() == 4L)
  }

  test("dropna with the nest as a base column: reference-executed golden " +
      "on (10,100,seed=1) (test_nestedframe.py " +
      "test_dropna_layer_as_base_column)") {
    val nf = g("g10100_base", "g10100_child")
    // reference: nf.query('nested.t>19.75') keeps rows, empties → NULL
    val q = NestedExpr.query(nf, "nested.t > 19.75")
    assert(q.count() == 10)
    // then dropna(subset=['nested']) drops the NULL-cell rows → 6 rows,
    // ids [0,1,2,3,6,9] (executed on the reference this round)
    val d = q.where(col("nested").isNotNull)
    assert(d.count() == 6)
    assert(d.select("id").as[Long].collect().sorted.toSeq ==
      Seq(0L, 1L, 2L, 3L, 6L, 9L))
  }

  test("multi-nest combination: nf['nested'] = nf[['c','d']] " +
      "(test_nestedframe.py test_set_item_combine_nested)") {
    val df = Seq(
      ("cat", 1L, Seq(1L, 2L, 3L), Seq(10L, 20L, 30L)),
      ("dog", 2L, Seq(4L, 5L, 6L), Seq(40L, 50L, 60L)),
      ("bird", 3L, Seq(7L, 8L, 9L), Seq(70L, 80L, 90L)))
      .toDF("a", "b", "c", "d")
      .fromLists(Seq("c"), "c").fromLists(Seq("d"), "d")
    val combined = NestedOps.zipNests(df, Seq("c", "d"), "nested")
    assert(combined.columns.toSeq == Seq("a", "b", "nested"))
    assert(NestedOps.subColumns(combined, "nested") == Seq("c", "d"))
    val flat = NestedOps.toFlat(combined, "nested", Seq("a"))
    assert(flat.count() == 9)
    assert(flat.where(col("d") === col("c") * 10).count() == 9)
    // misaligned cell lengths fail loudly instead of NULL-padding
    val bad = df.withColumn("d", expr("transform(d, x -> x)"))
      .withColumn("d", when(col("b") === 2, slice(col("d"), 1, 2))
        .otherwise(col("d")))
    val ex = intercept[Exception] {
      NestedOps.zipNests(bad, Seq("c", "d"), "nested")
        .select(size(col("nested"))).collect()
    }
    assert(ex.getMessage != null)
  }

  test("nesting limit: assignment beyond one nesting level raises " +
      "(test_nestedframe.py test_nesting_limit)") {
    val nf = g("g32_base", "g32_child")
    val ex = intercept[IllegalArgumentException] {
      NestedExpr.evalAssign(nf, "nested.c.d.e = nested.t")
    }
    assert(ex.getMessage.toLowerCase.contains("nesting"))
    // one level is fine, including via an existing-field RHS
    val ok = NestedExpr.evalAssign(nf, "nested.c = nested.flux")
    assert(NestedOps.subColumns(ok, "nested").contains("c"))
  }

  test("from_flat column subsets: omit base or nested columns " +
      "(test_nestedframe.py test_from_flat_omitting_columns)") {
    val flat = Seq((0L, 1L, 2L, 1L, 2L), (0L, 1L, 2L, 2L, 4L),
        (0L, 1L, 2L, 3L, 6L), (1L, 2L, 4L, 4L, 8L), (1L, 2L, 4L, 5L, 10L))
      .toDF("id", "a", "b", "c", "d")
    val nf1 = NestedOps.fromFlat(flat, Seq("b"), Seq("c", "d"), Seq("id"))
    assert(nf1.columns.toSeq.sorted == Seq("b", "id", "nested"))
    assert(NestedOps.subColumns(nf1, "nested") == Seq("c", "d"))
    val nf2 = NestedOps.fromFlat(flat, Seq("a", "b"), Seq("c"), Seq("id"))
    assert(NestedOps.subColumns(nf2, "nested") == Seq("c"))
  }

  test("nest_lists on a 0-row frame keeps the full schema " +
      "(test_nestedframe.py test_nestlists_preserve_index_name shape)") {
    val df = Seq((0L, Seq(1.0), Seq("r"))).toDF("id", "t", "band")
    val full = df.fromLists(Seq("t", "band"), "nested2")
    val empty = df.where(lit(false)).fromLists(Seq("t", "band"), "nested2")
    assert(empty.count() == 0)
    assert(empty.schema == full.schema)
    assert(empty.columns.contains("id"))
  }
}

package graft

import graft.nested.{NestedExpr, NestedOps, syntax}
import syntax._
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Round-8 parity sweep: the remaining test_ext_array.py families
  * (take, concat, equals, dropna, iter_field_lists, fill/flat lengths)
  * and test_accessor.py breadth (to_lists columns subset, empty-row
  * query, to_flat dropna GH22, issue 266 empty flatten_inner, masking).
  * Each test cites the reference test it mirrors; goldens are the
  * literal values from those tests.
  *
  * n/a by design (no Spark analog, documented in PARITY.md): pyarrow
  * machinery (num_chunks, chunked arrays, _box_pa*, pickability,
  * nbytes, formatters, arrow round-trips), positional python slices on
  * series (callers pass explicit index seqs to takeRows), and the
  * mutating-mapping methods absent from our API (popitem/setdefault/
  * update raise in the reference; in Scala the methods do not exist).
  */
class ReferenceParitySpec6 extends SparkSpec {
  import spark.implicits._

  /** The canonical take/concat fixture (test_ext_array.py:1100-1134):
    * cells [{a:[1,2,3], b:[-4.0,NULL,-6.0]}, NULL, NULL,
    * {a:[4,5,6], b:[-7.0,-8.0,-9.0]}] with dense position pos. */
  private lazy val takeFixture: DataFrame = spark.sql(
    """select * from values
      |  (0L, array(named_struct('a', 1L, 'b', -4.0D),
      |             named_struct('a', 2L, 'b', cast(null as double)),
      |             named_struct('a', 3L, 'b', -6.0D))),
      |  (1L, cast(null as array<struct<a: bigint, b: double>>)),
      |  (2L, cast(null as array<struct<a: bigint, b: double>>)),
      |  (3L, array(named_struct('a', 4L, 'b', -7.0D),
      |             named_struct('a', 5L, 'b', -8.0D),
      |             named_struct('a', 6L, 'b', -9.0D)))
      |  as t(pos, nested)""".stripMargin)

  private def cellAs(r: Row): Seq[(Option[Long], Option[Double])] =
    if (r.isNullAt(1)) null
    else r.getSeq[Row](1).map(e =>
      (if (e.isNullAt(0)) None else Some(e.getLong(0)),
        if (e.isNullAt(1)) None else Some(e.getDouble(1))))

  private def cell(vs: (Any, Any)*): Seq[(Option[Long], Option[Double])] =
    vs.map { case (a, b) =>
      (Option(a).map(_.asInstanceOf[Number].longValue()),
        Option(b).map(_.asInstanceOf[Number].doubleValue()))
    }

  test("take allow_fill=false wraps negative indices python-style " +
      "(test_ext_array.py take, first param set)") {
    val got = NestedOps.takeRows(takeFixture, "pos",
      Seq(1L, 0L, 0L, 2L, 3L, -1L), allowFill = false).collect()
    assert(got.length == 6)
    assert(cellAs(got(0)) == null)
    assert(cellAs(got(1)) == cell((1, -4.0), (2, null), (3, -6.0)))
    assert(cellAs(got(2)) == cellAs(got(1)))
    assert(cellAs(got(3)) == null)
    val c456 = cell((4, -7.0), (5, -8.0), (6, -9.0))
    assert(cellAs(got(4)) == c456)
    assert(cellAs(got(5)) == c456) // -1 wraps to the last row
  }

  test("take allow_fill=true: -1 yields a NULL cell; fillRow substitutes " +
      "the reference's fill_value row (test_ext_array.py take)") {
    val gotNull = NestedOps.takeRows(takeFixture, "pos",
      Seq(1L, 0L, 0L, 2L, 3L, -1L), allowFill = true).collect()
    assert(cellAs(gotNull(5)) == null)
    assert(cellAs(gotNull(4)) == cell((4, -7.0), (5, -8.0), (6, -9.0)))
    // fill_value row {a: [-1, NA], b: [100.0, 100.0]}
    val fill = expr("array(named_struct('a', -1L, 'b', 100.0D), " +
      "named_struct('a', cast(null as bigint), 'b', 100.0D))")
    val gotFill = NestedOps.takeRows(takeFixture, "pos",
      Seq(1L, 0L, 0L, 2L, 3L, -1L), allowFill = true,
      fillRow = Map("nested" -> fill)).collect()
    assert(cellAs(gotFill(5)) == cell((-1, 100.0), (null, 100.0)))
    // non-filled positions are untouched by fillRow
    assert(cellAs(gotFill(1)) == cell((1, -4.0), (2, null), (3, -6.0)))
    assert(cellAs(gotFill(0)) == null)
  }

  test("take raises out of bounds, incl. empty array + non-empty index " +
      "(test_ext_array.py:1155-1178)") {
    // Non-negative out-of-bounds: raised at EXECUTION by the join-miss
    // guard (r9: plan-building is job-free on the all-non-negative path,
    // so the IndexError surfaces lazily, at the action).
    val lazyOob = intercept[Exception] {
      NestedOps.takeRows(takeFixture, "pos", Seq(100L)).collect()
    }
    assert(lazyOob.getMessage.contains("out of bounds"),
      s"unexpected message: ${lazyOob.getMessage}")
    // Negative indices need the frame length anyway → still eager.
    intercept[IndexOutOfBoundsException] {
      NestedOps.takeRows(takeFixture, "pos", Seq(-100L))
    }
    intercept[IndexOutOfBoundsException] {
      NestedOps.takeRows(takeFixture, "pos", Seq(-2L), allowFill = true)
    }
    val empty = takeFixture.where(lit(false))
    val emptyOob = intercept[Exception] {
      NestedOps.takeRows(empty, "pos", Seq(0L, 1L, 2L)).collect()
    }
    assert(emptyOob.getMessage.contains("out of bounds"),
      s"unexpected message: ${emptyOob.getMessage}")
  }

  test("take: all-non-negative indices build the plan with NO Spark job " +
      "(r9 — count() only runs for negative-index wrapping)") {
    val sc = takeFixture.sparkSession.sparkContext
    val before = sc.statusTracker.getJobIdsForGroup(null).length
    NestedOps.takeRows(takeFixture, "pos", Seq(0L, 2L), allowFill = true)
    NestedOps.takeRows(takeFixture, "pos", Seq(1L, 3L))
    val after = sc.statusTracker.getJobIdsForGroup(null).length
    assert(after == before,
      s"plan-building ran ${after - before} job(s); expected 0")
  }

  test("_concat_same_type: union of four frames incl. empty and " +
      "single-NULL (test_ext_array.py:1232-1257)") {
    val a1 = spark.sql(
      """select * from values
        |  (array(named_struct('a', 1L, 'b', -2.0D),
        |         named_struct('a', 2L, 'b', cast(null as double)),
        |         named_struct('a', cast(null as bigint), 'b', -4.0D))),
        |  (array(named_struct('a', cast(null as bigint), 'b', 3.14D)))
        |  as t(nested)""".stripMargin)
    val a2 = spark.sql(
      """select * from values
        |  (array(named_struct('a', 4L, 'b', -7.0D),
        |         named_struct('a', 5L, 'b', -8.0D),
        |         named_struct('a', 6L, 'b', -9.0D))),
        |  (cast(null as array<struct<a: bigint, b: double>>))
        |  as t(nested)""".stripMargin)
    val a3 = a1.where(lit(false))
    val a4 = spark.sql(
      "select cast(null as array<struct<a: bigint, b: double>>) as nested")
    val cat = a1.unionByName(a2).unionByName(a3).unionByName(a4)
    val rows = cat.collect()
    assert(rows.length == 5)
    assert(!rows(0).isNullAt(0) && !rows(1).isNullAt(0) &&
      !rows(2).isNullAt(0))
    assert(rows(3).isNullAt(0) && rows(4).isNullAt(0))
    assert(rows(0).getSeq[Row](0).length == 3)
    assert(rows(1).getSeq[Row](0).head.getDouble(1) == 3.14)
  }

  test("equals: same cells built two different ways, incl. NULL cell and " +
      "NULL elements (test_ext_array.py:1258-1281)") {
    val viaSql = spark.sql(
      """select * from values
        |  (0L, array(named_struct('a', 1L, 'b', -2.0D),
        |             named_struct('a', 2L, 'b', cast(null as double)))),
        |  (1L, cast(null as array<struct<a: bigint, b: double>>))
        |  as t(id, nested)""".stripMargin)
    val viaPack = NestedOps.packFlat(
        Seq((0L, 1L, Some(-2.0)), (0L, 2L, None))
          .toDF("id", "a", "b")
          .select(col("id"), col("a"), col("b").cast("double")),
        Seq("id"), "nested", sortBy = Seq(("a", true)))
      .unionByName(spark.sql(
        "select 1L as id, cast(null as array<struct<a: bigint, b: double>>) as nested"))
    assert(NestedOps.nestEquals(viaSql, viaPack, "nested", Seq("id")))
  }

  test("ext-array dropna: NULL CELLS dropped, element NULLs kept " +
      "(test_ext_array.py:1283-1308)") {
    val kept = takeFixture.where(col("nested").isNotNull).collect()
    assert(kept.length == 2)
    // element-level None (b of second element) survives
    assert(cellAs(kept(0)).exists(_._2.isEmpty))
  }

  test("isna over cells: all-NA, none-NA, some-NA " +
      "(test_ext_array.py:1059-1088)") {
    assert(takeFixture.select(col("nested").isNull).as[Boolean]
      .collect().toSeq == Seq(false, true, true, false))
    val allNa = takeFixture.where(col("nested").isNull)
    assert(allNa.select(col("nested").isNull).as[Boolean]
      .collect().forall(identity))
  }

  test("iter_field_lists: per-field list iteration via to_lists " +
      "(test_ext_array.py:1608-1623)") {
    val df = Seq(
      (0L, Seq(1L, 2L, 3L), Seq("a", "b", "c")),
      (1L, Seq(1L, 2L, 3L, 4L), Seq("x", "y", "z", "w")))
      .toDF("id", "a", "b").fromLists(Seq("a", "b"), "n")
    val lists = NestedOps.toLists(df, "n", Seq("id")).orderBy("id")
    assert(lists.select("a").as[Seq[Long]].collect().toSeq ==
      Seq(Seq(1L, 2L, 3L), Seq(1L, 2L, 3L, 4L)))
    assert(lists.select("b").as[Seq[String]].collect().toSeq ==
      Seq(Seq("a", "b", "c"), Seq("x", "y", "z", "w")))
  }

  test("field_names / list_lengths / flat_length: NULL cell counts 0 " +
      "in list_lengths, flat_length sums elements " +
      "(test_ext_array.py:1532-1592)") {
    assert(NestedOps.nestKeys(takeFixture, "nested") == Seq("a", "b"))
    // ext-array list_lengths: offsets-based, so a NULL cell reads as 0
    // (unlike nest.len's documented NULL divergence at the engine level)
    val lens = takeFixture.orderBy("pos")
      .select(coalesce(size(col("nested")), lit(0))).as[Int].collect()
    assert(lens.toSeq == Seq(3, 0, 0, 3))
    val flatLen = takeFixture
      .select(sum(coalesce(size(col("nested")), lit(0)))).as[Long].head()
    assert(flatLen == 6L)
  }

  test("fill_field_lists: new field broadcast per row; existing field " +
      "replaced by per-row scalar (test_ext_array.py:1930-1956)") {
    val df = Seq(
        (0L, Seq(1.0, 2.0, 3.0), Seq(-4.0, -5.0, -6.0), 1.0, "abc"),
        (1L, Seq(4.0, 5.0), Seq(7.0, 8.0), 2.0, "def"))
      .toDF("id", "a", "b", "fa", "fc").fromLists(Seq("a", "b"), "n")
    val step1 = NestedOps.withNestedFieldFilled(
      NestedOps.withNestedFieldFilled(df, "n", "a", col("fa")),
      "n", "c", col("fc")).drop("fa", "fc")
    val flat = NestedOps.toFlat(step1, "n", Seq("id")).orderBy("id", "b")
    val rows = flat.collect()
    assert(rows.length == 5)
    // row 0's elements: a == 1.0 everywhere, c == "abc" everywhere
    val r0 = flat.where(col("id") === 0).collect()
    assert(r0.forall(r => r.getDouble(r.fieldIndex("a")) == 1.0))
    assert(r0.forall(r => r.getString(r.fieldIndex("c")) == "abc"))
    val r1 = flat.where(col("id") === 1).collect()
    assert(r1.forall(r => r.getDouble(r.fieldIndex("a")) == 2.0))
    assert(r1.forall(r => r.getString(r.fieldIndex("c")) == "def"))
  }

  test("to_lists with a columns subset (test_accessor.py:112-136)") {
    val df = Seq((0L, Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
        (1L, Seq(-1.0, -2.0, -1.0), Seq(-3.0, -4.0, -5.0)))
      .toDF("id", "a", "b").fromLists(Seq("a", "b"), "n")
    val subset = NestedOps.selectSubFields(df, "n", Seq("a"))
    val lists = NestedOps.toLists(subset, "n", Seq("id")).orderBy("id")
    assert(lists.columns.toSeq == Seq("id", "a"))
    assert(lists.select("a").as[Seq[Double]].collect().toSeq ==
      Seq(Seq(1.0, 2.0, 3.0), Seq(-1.0, -2.0, -1.0)))
  }

  test("get_list_series: one field's lists with base key " +
      "(test_accessor.py:623-646)") {
    val df = Seq((5L, Seq(1L, 2L, 3L), Seq(6L, 4L, 2L)),
        (7L, Seq(4L, 5L, 6L), Seq(1L, 2L, 3L)))
      .toDF("id", "a", "b").fromLists(Seq("a", "b"), "n")
    val lists = NestedOps.toLists(
      NestedOps.selectSubFields(df, "n", Seq("a")), "n", Seq("id"))
      .orderBy("id")
    assert(lists.as[(Long, Seq[Long])].collect().toSeq ==
      Seq((5L, Seq(1L, 2L, 3L)), (7L, Seq(4L, 5L, 6L))))
  }

  test(".nest.query with zero survivors drops all rows " +
      "(test_accessor.py:575-591) and preserves schema on an empty " +
      "input frame (test_accessor.py:592-616)") {
    val df = Seq((5L, Seq(1.0, 2.0, 3.0), Seq(6.0, 4.0, 2.0)),
        (7L, Seq(4.0, 5.0, 6.0), Seq(1.0, 2.0, 3.0)))
      .toDF("id", "a", "b").fromLists(Seq("a", "b"), "n")
    val filtered = NestedOps.filterElementsDropEmpty(df, "n",
      c => c.getField("a") > 1000.0)
    assert(filtered.count() == 0)
    assert(filtered.schema == df.schema)
    // empty input: query still analyzes and returns the same schema
    val empty = df.where(lit(false))
    val q = NestedExpr.query(empty, "n.a > 2.0")
    assert(q.count() == 0)
    assert(q.schema == df.schema)
  }

  test("to_flat + dropna on a sub-column (GH22, " +
      "test_accessor.py:1006-1031)") {
    val flat = Seq(
      (0L, Some(0.0), 5L), (0L, Some(2.0), 4L), (0L, Some(4.0), 7L),
      (1L, Some(1.0), 5L), (1L, None, 3L), (1L, Some(3.0), 1L),
      (2L, Some(1.0), 9L), (2L, Some(4.0), 3L), (2L, Some(1.0), 4L))
      .toDF("id", "c", "d")
    val nested = NestedOps.packFlat(flat, Seq("id"), "nested",
      sortBy = Seq(("d", true)))
    val back = NestedOps.toFlat(nested, "nested", Seq("id"))
    val filteredRows = back.where(col("c").isNotNull).count()
    assert(back.count() == 9 && filteredRows == 8)
    // the surviving (id, c, d) multiset matches the reference golden
    val got = back.where(col("c").isNotNull)
      .select("id", "c", "d").as[(Long, Double, Long)]
      .collect().sorted.toSeq
    assert(got == Seq((0L, 0.0, 5L), (0L, 2.0, 4L), (0L, 4.0, 7L),
      (1L, 1.0, 5L), (1L, 3.0, 1L), (2L, 1.0, 4L), (2L, 1.0, 9L),
      (2L, 4.0, 3L)))
  }

  test("issue 266: to_flatten_inner on an EMPTY outer frame keeps the " +
      "inner schema (test_accessor.py:1202-1230)") {
    val child = Seq((0L, 1.0, "r"), (0L, 2.0, "g"), (1L, 3.0, "r"))
      .toDF("id", "t", "band")
    val base = Seq((0L, 10L), (1L, 11L)).toDF("id", "grp")
    val outer = NestedOps.packFlat(
      base.joinNested(child, Seq("id"), "inner", "left",
        sortBy = Seq(("t", true))),
      Seq("grp"), "outer", sortBy = Seq(("id", true)))
    val empty = outer.where(lit(false))
    val flattened = NestedOps.flattenInner(empty, "outer", "inner")
    assert(flattened.count() == 0)
    val nonEmpty = NestedOps.flattenInner(outer, "outer", "inner")
    assert(flattened.schema == nonEmpty.schema)
  }

  test("to_flat with a columns subset (test_accessor.py:258-289)") {
    val df = Seq((0L, Seq(1.0, 2.0, 3.0), Seq(-4.0, -5.0, -6.0)),
        (1L, Seq(1.0, 2.0, 1.0), Seq(-3.0, -4.0, -5.0)))
      .toDF("id", "a", "b").fromLists(Seq("a", "b"), "n")
    val flat = NestedOps.toFlat(
      NestedOps.selectSubFields(df, "n", Seq("a")), "n", Seq("id"))
      .orderBy("id", "a")
    assert(flat.columns.toSeq == Seq("id", "a"))
    assert(flat.select("a").as[Double].collect().sorted.toSeq ==
      Seq(1.0, 1.0, 1.0, 2.0, 2.0, 3.0))
  }

  test(".nest['a'] = const broadcasts the scalar into every element " +
      "(test_accessor.py:880-903)") {
    val df = Seq((0L, Seq(1.0, 2.0, 3.0), Seq(-4.0, -5.0, -6.0)))
      .toDF("id", "a", "b").fromLists(Seq("a", "b"), "n")
    val set = NestedOps.withNestedFieldFilled(df, "n", "a", lit(-1.0))
    val flat = NestedOps.toFlat(set, "n", Seq("id"))
    assert(flat.select("a").as[Double].collect().toSeq ==
      Seq(-1.0, -1.0, -1.0))
    // b untouched
    assert(flat.select("b").as[Double].collect().sorted.toSeq ==
      Seq(-6.0, -5.0, -4.0))
  }

  test("series masking through the accessor: two-column element mask ≡ " +
      "to_flat query (test_accessor.py:785-813)") {
    val df = Seq(
      (0L, Seq(1.0, 6.0, 3.0), Seq(true, true, false)),
      (1L, Seq(7.0, 2.0, 4.9), Seq(false, true, true)))
      .toDF("id", "t", "flag").fromLists(Seq("t", "flag"), "nested")
    val masked = NestedOps.filterElements(df, "nested",
      e => e.getField("t") < 5.0 && e.getField("flag"))
    val flat = NestedOps.toFlat(masked, "nested", Seq("id"))
    val got = flat.select("id", "t").as[(Long, Double)].collect().sorted
    assert(got.toSeq == Seq((0L, 1.0), (1L, 2.0), (1L, 4.9)))
  }
}

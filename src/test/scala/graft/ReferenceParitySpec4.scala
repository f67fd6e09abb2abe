package graft

import graft.nested.{NestedOps, NestedExpr, syntax}
import syntax._
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Storage/NULL-cell corners from the reference's extension-array and
  * accessor suites (tests/nested_pandas/series/test_ext_array.py — 2,225
  * LoC — and test_accessor.py, test_packer.py): the Spark-observable
  * semantics of each case, with the reference's literal inputs and
  * expected outputs. Pure pandas-storage mechanics (chunking, pyarrow
  * buffer identity, pickling) have no Spark observable and are skipped;
  * everything here is cell-level behavior a user of either library sees.
  */
class ReferenceParitySpec4 extends SparkSpec {
  import spark.implicits._

  /** Reference's recurring two-row fixture: a=[[1,2,3],[1,2,1]],
    * b=[[-4,-5,-6],[-3,-4,-5]] (test_ext_array.py:377-560 family). */
  private def twoRow: DataFrame = Seq(
    (0L, Seq(1L, 2L, 3L), Seq(-4.0, -5.0, -6.0)),
    (1L, Seq(1L, 2L, 1L), Seq(-3.0, -4.0, -5.0))).toDF("id", "a", "b")
    .fromLists(Seq("a", "b"), "nested")

  private def cellsA(df: DataFrame): Seq[Seq[Long]] =
    df.orderBy("id").select(expr("transform(nested, e -> e.a)"))
      .as[Seq[Long]].collect().toSeq
  private def cellsB(df: DataFrame): Seq[Seq[Double]] =
    df.orderBy("id").select(expr("transform(nested, e -> e.b)"))
      .as[Seq[Double]].collect().toSeq

  // ------------------------------------------------------------- ext_array

  test("isna: all-NA, none-NA, some-NA cells — cell NULL ≠ inner-element " +
      "NULL (test_ext_array.py:1059-1087)") {
    val allNa = Seq(0L, 1L, 2L).toDF("id")
      .withColumn("nested", lit(null).cast("array<struct<a: bigint>>"))
    assert(allNa.select($"nested".isNull).as[Boolean].collect().toSeq ==
      Seq(true, true, true))
    assert(twoRow.select($"nested".isNull).as[Boolean].collect().toSeq ==
      Seq(false, false))
    // some NA: [null, {…}, null, null] — like the reference, a cell whose
    // ELEMENTS contain nulls is NOT an NA cell
    val someNa = Seq(
      (0L, None), (1L, Some(Seq((Some(1L), Some(-4.0)), (None, Some(-5.0))))),
      (2L, None), (3L, None))
      .toDF("id", "cell")
      .select($"id", $"cell".as("nested"))
    assert(someNa.orderBy("id").select($"nested".isNull).as[Boolean]
      .collect().toSeq == Seq(true, false, true, true))
  }

  test("dropna: removes only NULL cells; cells with inner-element nulls " +
      "survive (test_ext_array.py:1283-1307)") {
    val df = Seq(
      (0L, Some(Seq((Some(1L), Some(-2.0)), (Some(2L), None),
        (None, Some(-4.0))))),
      (1L, Some(Seq((Option.empty[Long], Some(3.14))))),
      (2L, None),
      (3L, Some(Seq((Some(4L), Some(-7.0)), (Some(5L), Some(-8.0)),
        (Some(6L), Some(-9.0)))))).toDF("id", "nested")
    val kept = df.where($"nested".isNotNull)
    assert(kept.orderBy("id").select("id").as[Long].collect().toSeq ==
      Seq(0L, 1L, 3L))
    // inner nulls intact after the cell-level dropna
    val row0a = kept.orderBy("id")
      .select(expr("transform(nested, e -> e._1)")).as[Seq[Option[Long]]]
      .collect().head
    assert(row0a == Seq(Some(1L), Some(2L), None))
  }

  test("take with negative wrap vs allow_fill NULL vs allow_fill " +
      "fill-frame (test_ext_array.py:1138-1155)") {
    val src = Seq(
      (0, Some(Seq((Some(1L), Option(-4.0)), (Some(2L), Option.empty[Double]),
        (Some(3L), Option(-6.0))))),
      (1, None), (2, None),
      (3, Some(Seq((Some(4L), Option(-7.0)), (Some(5L), Option(-8.0)),
        (Some(6L), Option(-9.0)))))).toDF("idx", "nested")
    val indices = Seq(1, 0, 0, 2, 3, -1)
    // plain take: python negative index wraps (-1 → 3)
    val wrapped = indices.map(i => if (i < 0) i + 4 else i)
    val takeDf = wrapped.zipWithIndex.toDF("idx", "ord")
    val got = takeDf.join(src, Seq("idx"), "left").orderBy("ord")
      .select(expr("transform(nested, e -> e._1)")).as[Seq[Long]]
      .collect().toSeq
    assert(got == Seq(null, Seq(1L, 2L, 3L), Seq(1L, 2L, 3L), null,
      Seq(4L, 5L, 6L), Seq(4L, 5L, 6L)))
    // allow_fill: -1 means "fill", here with NULL
    val fillDf = indices.zipWithIndex.toDF("i", "ord")
      .withColumn("idx", when($"i" >= 0, $"i"))
    val gotFill = fillDf.join(src, Seq("idx"), "left").orderBy("ord")
      .select(expr("transform(nested, e -> e._1)")).as[Seq[Long]]
      .collect().toSeq
    assert(gotFill == Seq(null, Seq(1L, 2L, 3L), Seq(1L, 2L, 3L), null,
      Seq(4L, 5L, 6L), null))
    // allow_fill with a fill sub-frame: a=[-1,null], b=[100,100]
    val fillCell = array(
      struct(lit(-1L).as("_1"), lit(100.0).as("_2")),
      struct(lit(null).cast("long").as("_1"), lit(100.0).as("_2")))
    val gotFrame = fillDf.join(src, Seq("idx"), "left").orderBy("ord")
      .withColumn("nested", when($"idx".isNull, fillCell)
        .otherwise($"nested"))
      .select(expr("transform(nested, e -> e._1)")).as[Seq[Option[Long]]]
      .collect().toSeq
    assert(gotFrame.last == Seq(Some(-1L), None))
    assert(gotFrame(1) == Seq(Some(1L), Some(2L), Some(3L)))
  }

  test("concat preserves order, NULL cells, and empty inputs " +
      "(test_ext_array.py:1232-1257)") {
    val a1 = Seq(
      (0L, Option(Seq((Option(1L), Option(-2.0)),
        (Option(2L), Option.empty[Double]),
        (Option.empty[Long], Option(-4.0))))),
      (1L, Option(Seq((Option.empty[Long], Option(3.14))))))
      .toDF("id", "nested")
    val a2 = Seq(
      (2L, Option(Seq((Option(4L), Option(-7.0)), (Option(5L), Option(-8.0)),
        (Option(6L), Option(-9.0))))),
      (3L, Option.empty[Seq[(Option[Long], Option[Double])]]))
      .toDF("id", "nested")
    val a3 = a1.limit(0) // empty input, same dtype
    val a4 = Seq((4L, Option.empty[Seq[(Option[Long], Option[Double])]]))
      .toDF("id", "nested")
    val cat = a1.unionByName(a2).unionByName(a3).unionByName(a4)
    assert(cat.count() == 5)
    val rows = cat.orderBy("id")
      .select($"nested".isNull, expr("transform(nested, e -> e._1)"))
      .as[(Boolean, Seq[Option[Long]])].collect().toSeq
    assert(rows.map(_._1) == Seq(false, false, false, true, true))
    assert(rows(0)._2 == Seq(Some(1L), Some(2L), None))
    assert(rows(1)._2 == Seq(None))
    assert(rows(2)._2 == Seq(Some(4L), Some(5L), Some(6L)))
  }

  test("fill_field_lists: per-row scalar floods an existing field and " +
      "creates a new one (test_ext_array.py:1930-1956)") {
    val df = Seq((0L, Seq(1.0, 2.0, 3.0), Seq(-4.0, -5.0, -6.0)),
      (1L, Seq(4.0, 5.0), Seq(7.0, 8.0))).toDF("id", "a", "b")
      .fromLists(Seq("a", "b"), "nested")
    val fills = Seq((0L, 1.0, "abc"), (1L, 2.0, "def"))
      .toDF("id", "afill", "cfill")
    val out = NestedOps.withNestedFieldFilled(
      NestedOps.withNestedFieldFilled(df.join(fills, Seq("id")),
        "nested", "a", col("afill")), "nested", "c", col("cfill"))
      .drop("afill", "cfill")
    assert(out.orderBy("id").select(expr("transform(nested, e -> e.a)"))
      .as[Seq[Double]].collect().toSeq ==
      Seq(Seq(1.0, 1.0, 1.0), Seq(2.0, 2.0)))
    assert(out.orderBy("id").select(expr("transform(nested, e -> e.c)"))
      .as[Seq[String]].collect().toSeq ==
      Seq(Seq("abc", "abc", "abc"), Seq("def", "def")))
    // untouched field b intact
    assert(out.orderBy("id").select(expr("transform(nested, e -> e.b)"))
      .as[Seq[Double]].collect().toSeq ==
      Seq(Seq(-4.0, -5.0, -6.0), Seq(7.0, 8.0)))
  }

  test("setitem single cell with a DIFFERENT-SIZE sub-frame " +
      "(test_ext_array.py:443-467)") {
    val repl = array(struct(lit(5L).as("a"), lit(100.0).as("b")),
      struct(lit(6L).as("a"), lit(200.0).as("b")))
    val out = twoRow.withColumn("nested",
      when($"id" === 0L, repl).otherwise($"nested"))
    assert(cellsA(out) == Seq(Seq(5L, 6L), Seq(1L, 2L, 1L)))
    assert(cellsB(out) == Seq(Seq(100.0, 200.0), Seq(-3.0, -4.0, -5.0)))
  }

  test("setitem one sub-frame to ALL rows (test_ext_array.py:468-491)") {
    val repl = array(struct(lit(5L).as("a"), lit(100.0).as("b")),
      struct(lit(6L).as("a"), lit(200.0).as("b")))
    val out = twoRow.withColumn("nested", repl)
    assert(cellsA(out) == Seq(Seq(5L, 6L), Seq(5L, 6L)))
    assert(cellsB(out) == Seq(Seq(100.0, 200.0), Seq(100.0, 200.0)))
  }

  test("setitem with an EMPTY mask is a no-op (test_ext_array.py:427-441)") {
    val repl = array(struct(lit(5L).as("a"), lit(100.0).as("b")))
    val out = twoRow.withColumn("nested",
      when(lit(false), repl).otherwise($"nested"))
    assert(cellsA(out) == cellsA(twoRow))
    assert(cellsB(out) == cellsB(twoRow))
  }

  // -------------------------------------------------------------- accessor

  test("nest.query 'a + b >= 7': element filter keeps rows, filters " +
      "elements (test_accessor.py:549-573)") {
    val df = Seq((5L, Seq(1.0, 2.0, 3.0), Seq(6.0, 4.0, 2.0)),
      (7L, Seq(4.0, 5.0, 6.0), Seq(1.0, 2.0, 3.0))).toDF("id", "a", "b")
      .fromLists(Seq("a", "b"), "nested")
    val q = NestedOps.filterElements(df, "nested",
      e => e.getField("a") + e.getField("b") >= 7.0)
    assert(q.orderBy("id").select(expr("transform(nested, e -> e.a)"))
      .as[Seq[Double]].collect().toSeq == Seq(Seq(1.0), Seq(5.0, 6.0)))
    assert(q.orderBy("id").select(expr("transform(nested, e -> e.b)"))
      .as[Seq[Double]].collect().toSeq == Seq(Seq(6.0), Seq(2.0, 3.0)))
  }

  test("nest.query that empties every row drops all rows " +
      "(test_accessor.py:575-591)") {
    val df = Seq((5L, Seq(1.0, 2.0, 3.0)), (7L, Seq(4.0, 5.0, 6.0)))
      .toDF("id", "a").fromLists(Seq("a"), "nested")
    val q = NestedOps.filterElementsDropEmpty(df, "nested",
      e => e.getField("a") > 1000.0)
    assert(q.count() == 0)
    // schema survives the empty result
    assert(NestedOps.subColumns(q, "nested") == Seq("a"))
  }

  test("nest.query over an EMPTY input frame keeps schema and key type " +
      "(test_accessor.py:592-616)") {
    val base = Seq.empty[(Double, Double)].toDF("key", "a")
    val child = Seq.empty[(Double, Double)].toDF("key", "b")
    val nf = base.joinNested(child, Seq("key"), "nested")
    val q = NestedOps.filterElementsDropEmpty(nf, "nested",
      e => e.getField("b") > 2.0)
    assert(q.count() == 0)
    assert(q.schema("key").dataType == DoubleType)
    assert(NestedOps.subColumns(q, "nested") == Seq("b"))
  }

  test("to_flat then dropna on a sub-column with inner NaN (GH#22, " +
      "test_accessor.py:1006-1030)") {
    val flat = Seq(
      (0L, 0, Some(0.0), 5), (0L, 1, Some(2.0), 4), (0L, 2, Some(4.0), 7),
      (1L, 3, Some(1.0), 5), (1L, 4, None, 3), (1L, 5, Some(3.0), 1),
      (2L, 6, Some(1.0), 9), (2L, 7, Some(4.0), 3), (2L, 8, Some(1.0), 4))
      .toDF("id", "pos", "c", "d")
    val nf = NestedOps.packFlat(flat, Seq("id"), "nested",
      sortBy = Seq(("pos", true)))
    val back = NestedOps.toFlat(nf, "nested", baseCols = Seq("id"))
      .where($"c".isNotNull).orderBy("id", "pos")
    assert(back.select("c").as[Double].collect().toSeq ==
      Seq(0.0, 2.0, 4.0, 1.0, 3.0, 1.0, 4.0, 1.0))
    assert(back.select("d").as[Int].collect().toSeq ==
      Seq(5, 4, 7, 5, 1, 9, 3, 4))
    assert(back.select("id").as[Long].collect().toSeq ==
      Seq(0L, 0L, 0L, 1L, 1L, 2L, 2L, 2L))
  }

  test("issue266: to_flatten_inner on an EMPTY two-level frame keeps the " +
      "full flattened schema (test_accessor.py:1202-1225)") {
    val inner = spark.read.parquet(
      "/root/repo/src/test/resources/ref_seed1/g52_base.parquet")
      .joinNested(spark.read.parquet(
        "/root/repo/src/test/resources/ref_seed1/g52_child.parquet"),
        Seq("id"), "inner", sortBy = Seq(("pos", true)))
      .withColumn("oid", expr("id DIV 2"))
    val outer = NestedOps.packFlat(
      inner.select("oid", "a", "b", "inner"), Seq("oid"), "outer_nest",
      sortBy = Nil)
    val empty = outer.limit(0)
    val fl = NestedOps.flattenInner(empty, "outer_nest", "inner")
    assert(fl.count() == 0)
    assert(NestedOps.subColumns(fl, "outer_nest").toSet ==
      Set("a", "b", "pos", "t", "flux", "flux_error", "band"))
  }

  test("set_list_field RAISES on a length mismatch like the reference; " +
      "strict=false keeps the permissive NULL-fill " +
      "(test_ext_array.py:1877-1892)") {
    val df = Seq((0L, Seq(1.0, 2.0, 3.0), Seq("x", "y")))
      .toDF("id", "a", "wrong").fromLists(Seq("a"), "nested")
    val ex = intercept[Exception] {
      NestedOps.withNestedFieldFromList(df, "nested", "w", "wrong")
        .collect()
    }
    assert(ex.getMessage.contains("list length 2 != cell length 3") ||
      Option(ex.getCause).exists(
        _.getMessage.contains("list length 2 != cell length 3")),
      ex.toString)
    // permissive form: beyond-end elements get NULL field values
    val loose = NestedOps.withNestedFieldFromList(df, "nested", "w",
      "wrong", strict = false)
      .select(expr("transform(nested, e -> e.w)")).as[Seq[Option[String]]]
      .collect().head
    assert(loose == Seq(Some("x"), Some("y"), None))
    // matched lengths pass the strict check untouched
    val ok = Seq((0L, Seq(1.0, 2.0), Seq("x", "y")))
      .toDF("id", "a", "l").fromLists(Seq("a"), "nested")
    val got = NestedOps.withNestedFieldFromList(ok, "nested", "w", "l")
      .select(expr("transform(nested, e -> e.w)")).as[Seq[String]]
      .collect().head
    assert(got == Seq("x", "y"))
  }

  test("setitem a LIST of different sub-frames at masked positions " +
      "(test_ext_array.py:493-526)") {
    // replacement frame keyed by row: rows 0 and 2 get new cells; row 1
    // keeps its own — the reference's ext_array[[0, 2]] = [df1, df2]
    val base = Seq(
      (0L, Seq((1L, -4.0), (2L, -5.0))),
      (1L, Seq((3L, -6.0))),
      (2L, Seq((4L, -7.0), (5L, -8.0), (6L, -9.0))))
      .toDF("id", "nested")
    val repl = Seq(
      (0L, Seq((10L, 100.0))),
      (2L, Seq((20L, 200.0), (21L, 201.0))))
      .toDF("id", "repl")
    val out = base.join(repl, Seq("id"), "left")
      .withColumn("nested", coalesce($"repl", $"nested")).drop("repl")
    val got = out.orderBy("id")
      .select(expr("transform(nested, e -> e._1)")).as[Seq[Long]]
      .collect().toSeq
    assert(got == Seq(Seq(10L), Seq(3L), Seq(20L, 21L)))
  }

  test("read with columns= plus a FILTER on an unprojected column " +
      "(io issue492, test_io.py:574-587)") {
    // the reference: read_parquet(columns=["a"], filters=[("z","<",0.5)])
    // → one output column, filter applied. Spark-first: the filter column
    // is read for the scan predicate but pruned from the output, and the
    // predicate reaches PushedFilters.
    val dir = "/tmp/graft-test-io492"
    val src = spark.range(1000).toDF("id")
      .withColumn("a", col("id") * 2)
      .withColumn("z", expr("pmod(xxhash64(id), 1000) / 1000.0"))
    src.write.mode("overwrite").parquet(dir)
    val out = spark.read.parquet(dir).where($"z" < 0.5).select("a")
    assert(out.columns.toSeq == Seq("a"))
    val expected = src.where($"z" < 0.5).count()
    assert(out.count() == expected && expected > 0)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.matches("(?s).*PushedFilters: \\[.*z.*\\].*"), plan)
  }

  // ---------------------------------------------------------------- packer

  test("pack_flat groups by unsorted key, within-key input order kept via " +
      "explicit position (test_packer.py:168-192)") {
    // index [4,4,4,1,1,2,2,3,3]: key 4 packs [7,8,9] in INPUT order — the
    // reference keeps arrival order; Spark needs the explicit pos sort
    val df = Seq((4L, 0, 7, 0), (4L, 1, 8, 1), (4L, 2, 9, 0),
      (1L, 3, 1, 0), (1L, 4, 2, 1), (2L, 5, 3, 0), (2L, 6, 4, 1),
      (3L, 7, 5, 0), (3L, 8, 6, 1)).toDF("id", "pos", "a", "b")
    val packed = NestedOps.packFlat(df, Seq("id"), "nested",
      sortBy = Seq(("pos", true)))
    val a = packed.orderBy("id")
      .select(expr("transform(nested, e -> e.a)")).as[Seq[Int]]
      .collect().toSeq
    assert(a == Seq(Seq(1, 2), Seq(3, 4), Seq(5, 6), Seq(7, 8, 9)))
    val b = packed.orderBy("id")
      .select(expr("transform(nested, e -> e.b)")).as[Seq[Int]]
      .collect().toSeq
    assert(b == Seq(Seq(0, 1), Seq(0, 1), Seq(0, 1), Seq(0, 1, 0)))
  }

  test("pack_flat on=c: grouping column leaves the payload " +
      "(test_packer.py:193-226)") {
    val df = Seq((4L, 0, 7, 0, 1), (4L, 1, 8, 1, 0), (4L, 2, 9, 0, 1),
      (1L, 3, 1, 0, 0), (1L, 4, 2, 1, 1), (2L, 5, 3, 0, 0), (2L, 6, 4, 1, 1),
      (3L, 7, 5, 0, 0), (3L, 8, 6, 1, 1)).toDF("id", "pos", "a", "b", "c")
    val packed = NestedOps.packFlat(df.select("c", "pos", "a", "b"),
      Seq("c"), "nested", sortBy = Seq(("pos", true)))
    val byC = packed.orderBy("c")
      .select(expr("transform(nested, e -> e.a)")).as[Seq[Int]]
      .collect().toSeq
    assert(byC == Seq(Seq(8, 1, 3, 5), Seq(7, 9, 2, 4, 6)))
    assert(NestedOps.subColumns(packed, "nested") == Seq("pos", "a", "b"))
  }

  test("view_sorted_df_as_list_arrays: sorted-key pack lengths and values " +
      "(test_packer.py:458-491)") {
    val df = Seq((1L, 0, 1, 0), (1L, 1, 2, 1), (2L, 2, 3, 0), (2L, 3, 4, 1),
      (3L, 4, 5, 0), (3L, 5, 6, 1), (4L, 6, 7, 0), (4L, 7, 8, 1),
      (4L, 8, 9, 0)).toDF("id", "pos", "a", "b")
    val lists = NestedOps.toLists(
      NestedOps.packFlat(df.select("id", "pos", "a", "b"), Seq("id"),
        "nested", sortBy = Seq(("pos", true))), "nested",
      baseCols = Seq("id"))
    val a = lists.orderBy("id").select("a").as[Seq[Int]].collect().toSeq
    assert(a == Seq(Seq(1, 2), Seq(3, 4), Seq(5, 6), Seq(7, 8, 9)))
    val b = lists.orderBy("id").select("b").as[Seq[Int]].collect().toSeq
    assert(b == Seq(Seq(0, 1), Seq(0, 1), Seq(0, 1), Seq(0, 1, 0)))
  }

  test("pack of an empty child: zero groups; left join_nested gives NULL " +
      "cells (empty-field pack corner)") {
    val base = Seq((0L, 1.0), (1L, 2.0)).toDF("id", "a")
    val child = Seq.empty[(Long, Double)].toDF("id", "t")
    val packed = NestedOps.packFlat(child, Seq("id"), "nested")
    assert(packed.count() == 0)
    assert(NestedOps.subColumns(packed, "nested") == Seq("t"))
    val joined = base.joinNested(child, Seq("id"), "nested")
    assert(joined.count() == 2)
    assert(joined.select($"nested".isNull).as[Boolean].collect().toSeq ==
      Seq(true, true))
  }

  test("single-row packs: every cell length 1, values exact " +
      "(single-row pack corner, test_ext_array family)") {
    val child = Seq((0L, 1.5, "x"), (1L, 2.5, "y"), (2L, 3.5, "z"))
      .toDF("id", "v", "s")
    val packed = NestedOps.packFlat(child, Seq("id"), "nested")
    assert(packed.select(size($"nested")).as[Int].collect().toSeq
      .forall(_ == 1))
    val got = packed.orderBy("id").select(
      expr("nested[0].v"), expr("nested[0].s")).as[(Double, String)]
      .collect().toSeq
    assert(got == Seq((1.5, "x"), (2.5, "y"), (3.5, "z")))
  }

  test("pack_seq double nesting round-trips through to_flat " +
      "(test_packer.py:447-456)") {
    val (b, c) = (spark.read.parquet(
      "/root/repo/src/test/resources/ref_seed1/g33_base.parquet"),
      spark.read.parquet(
        "/root/repo/src/test/resources/ref_seed1/g33_child.parquet"))
    val inner = b.joinNested(c, Seq("id"), "inner",
      sortBy = Seq(("pos", true)))
      .withColumn("oid", expr("id DIV 2"))
    val outer = NestedOps.packFlat(
      inner.select("oid", "id", "inner"), Seq("oid"), "outer_nest",
      sortBy = Seq(("id", true)))
    // unpack the outer layer → the original per-id rows, inner cells intact
    val back = NestedOps.toFlat(outer, "outer_nest", baseCols = Seq("oid"))
    assert(back.count() == 3)
    val innerT = back.orderBy("id")
      .select(expr("transform(inner, e -> e.t)")).as[Seq[Double]]
      .collect().toSeq
    val origT = inner.orderBy("id")
      .select(expr("transform(inner, e -> e.t)")).as[Seq[Double]]
      .collect().toSeq
    assert(innerT == origT)
  }
}

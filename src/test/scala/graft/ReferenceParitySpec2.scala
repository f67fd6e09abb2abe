package graft

import graft.nested.{NestedOps, NestedExpr, syntax}
import graft.sources.NestedParquet
import syntax._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{AnalysisException, DataFrame}

/** Second sweep of reference test ports (tests/nested_pandas/nestedframe/
  * test_nestedframe.py + series/test_accessor.py): construction,
  * introspection, getitem/setitem, join variants, dropna/sort/drop/split
  * surfaces, eval corners, and the GitHub-issue regressions not already
  * covered by ReferenceParitySpec. Each test cites its source line. */
class ReferenceParitySpec2 extends SparkSpec {
  import spark.implicits._

  // the reference's standard fixture (base a/b ×3, nested c/d ×9)
  lazy val base = Seq((0L, 1, 2), (1L, 2, 4), (2L, 3, 6)).toDF("key", "a", "b")
  lazy val child = Seq(
    (0L, 0, 5), (0L, 2, 4), (0L, 4, 7),
    (1L, 1, 5), (1L, 4, 3), (1L, 3, 1),
    (2L, 1, 9), (2L, 4, 3), (2L, 1, 4)).toDF("key", "c", "d")
  lazy val nf = base.joinNested(child, Seq("key"), "nested",
    sortBy = Seq(("c", true), ("d", true)))

  private def flatC(df: DataFrame, nest: String = "nested"): Seq[Int] =
    df.orderBy("key").select(explode(col(s"$nest.c"))).as[Int].collect().toSeq

  // -------------------------------------------------------------------------
  // construction + introspection (ref :16, :110, :129, :144, :161)
  // -------------------------------------------------------------------------

  test("construction: list-of-struct column auto-casts to a nest (ref :16)") {
    // the Spark analog of the pa list<struct> auto-cast: an array<struct>
    // column IS a nested column by type
    val df = Seq((0L, Seq((1, 1.0))), (1L, Seq((2, 2.0))),
      (2L, Seq((3, 3.0), (4, 4.0)))).toDF("key", "list_struct")
    assert(df.nestedColumns == Seq("list_struct"))
    assert(df.subColumns("list_struct") == Seq("_1", "_2"))
  }

  test("all_columns groups by layer (ref :110)") {
    // base-only frame: single "base" group
    assert(base.nestedColumns.isEmpty)
    assert(base.allNestedColumns == Seq("key", "a", "b"))
    // after join: nested group lists the child's columns
    assert(nf.allNestedColumns ==
      Seq("key", "a", "b", "nested.c", "nested.d"))
  }

  test("nested_columns retrieves only nests (ref :129)") {
    assert(nf.nestedColumns == Seq("nested"))
    assert(nf.baseColumns == Seq("key", "a", "b"))
  }

  test("is_known_hierarchical_column analog: resolveDotted (ref :144)") {
    assert(NestedOps.resolveDotted(nf, "nested.c") == (Some("nested"), "c"))
    // "base.a" — no nest called base → flat name
    assert(NestedOps.resolveDotted(nf, "base.a") == (None, "base.a"))
    // a flat column whose NAME contains a dot is not hierarchical
    val tricky = nf.withColumn("nested.b-like", lit(1))
    assert(NestedOps.resolveDotted(tricky, "other.b") == (None, "other.b"))
  }

  test("is_known_column: backticks strip, dotted flat names resolve (ref :161)") {
    val df = Seq((1, 2)).toDF("R. A.", "plain")
    assert(NestedOps.resolveDotted(df, "`R. A.`") == (None, "R. A."))
    // nested.c with backticks still resolves into the nest
    assert(NestedOps.resolveDotted(nf, "`nested.c`") == (Some("nested"), "c"))
  }

  // -------------------------------------------------------------------------
  // getitem (ref :214, :233, :273, :295)
  // -------------------------------------------------------------------------

  test("getitem nested column returns the flat series values (ref :214)") {
    val vals = NestedOps.getSubColumn(nf, "nested.c", Seq("key"))
      .orderBy("key", "c").select("c").as[Int].collect().toSeq
    assert(vals == Seq(0, 2, 4, 1, 3, 4, 1, 1, 4))
    assert(NestedOps.getSubColumn(nf, "nested.c", Seq("key")).count() == 9)
  }

  test("getitem list with nested components repacks pruned nests (ref :233)") {
    val d1 = NestedParquet.selectColumns(nf, Seq("a", "b", "nested.c"))
    assert(d1.columns.toSeq == Seq("a", "b", "nested"))
    assert(d1.subColumns("nested") == Seq("c"))
    // both fields, requested order preserved
    val d2 = NestedParquet.selectColumns(nf, Seq("a", "nested.d", "nested.c"))
    assert(d2.subColumns("nested") == Seq("d", "c"))
    // nest-only selection
    val d3 = NestedParquet.selectColumns(nf, Seq("nested.c"))
    assert(d3.columns.toSeq == Seq("nested"))
    // whole-nest name keeps every field
    val d4 = NestedParquet.selectColumns(nf, Seq("a", "nested"))
    assert(d4.subColumns("nested") == Seq("c", "d"))
  }

  test("getitem with unknown names raises (ref :273, :2544)") {
    // unknown base name
    intercept[AnalysisException] {
      nf.select("not_a_column").collect()
    }
    // unknown nested field inside an otherwise-valid selection
    intercept[Exception] {
      NestedParquet.selectColumns(nf, Seq("a", "nested.g")).collect()
    }
  }

  test("empty boolean mask on an empty frame keeps schema (ref :295)") {
    val empty = nf.where(lit(false))
    assert(empty.count() == 0)
    assert(empty.schema == nf.schema)
    // further masking an empty frame still works and keeps dtypes
    val masked = empty.where(col("a") > 100)
    assert(masked.count() == 0 && masked.schema == nf.schema)
  }

  // -------------------------------------------------------------------------
  // setitem (ref :317, :358, :380, :401, :417, :428)
  // -------------------------------------------------------------------------

  test("set/replace nested field: direct, chained, new-from-old (ref :317)") {
    // direct replacement c ← c + 1, then chained += 1
    val r1 = nf.withNestedField("nested", "c", e => e.getField("c") + 1)
    val r2 = r1.withNestedField("nested", "c", e => e.getField("c") + 1)
    assert(flatC(r2) == flatC(nf).map(_ + 2))
    // new field e ← d * 2
    val r3 = nf.withNestedField("nested", "e", e => e.getField("d") * 2)
    assert(r3.subColumns("nested") == Seq("c", "d", "e"))
    val ds = r3.select(explode(col("nested"))).select("col.d", "col.e")
      .as[(Int, Int)].collect()
    assert(ds.forall { case (d, e) => e == d * 2 })
  }

  test("set nested field from a broadcast base column (ref :345)") {
    // base column repeated across each row's elements
    val r = NestedExpr.evalAssign(nf, "nested.a2 = a")
    val pairs = r.select(col("a"), explode(col("nested.a2"))).as[(Int, Int)]
      .collect()
    assert(pairs.nonEmpty && pairs.forall { case (a, a2) => a == a2 })
    // replacement with a base-combination: c ← a + b - 99
    val r2 = NestedExpr.evalAssign(nf, "nested.c = a + b - 99")
    val uniq = r2.select(explode(col("nested.c"))).distinct().as[Int]
      .collect().toSet
    assert(uniq == Set(1 + 2 - 99, 2 + 4 - 99, 3 + 6 - 99))
  }

  test("set new nested column from cross-nest arithmetic (ref :358)") {
    val r = NestedExpr.evalAssign(nf, "new_nested.cd = nested.c + nested.d")
    assert(r.nestedColumns.toSet == Set("nested", "new_nested"))
    assert(r.subColumns("new_nested") == Seq("cd"))
    val cds = r.select(explode(col("new_nested.cd"))).as[Int].collect().sorted
    val expect = child.select($"c" + $"d").as[Int].collect().sorted
    assert(cds.toSeq == expect.toSeq)
  }

  test("combine two single-field nests into one (ref :380)") {
    val lists = Seq(
      ("cat", 1, Seq(1, 2, 3), Seq(10, 20, 30)),
      ("dog", 2, Seq(4, 5, 6), Seq(40, 50, 60)),
      ("bird", 3, Seq(7, 8, 9), Seq(70, 80, 90))).toDF("a", "b", "c", "d")
    val packed = lists.fromLists(Seq("c", "d"), "nested")
    assert(packed.subColumns("nested") == Seq("c", "d"))
    assert(packed.toFlat("nested").count() == 9)
  }

  test("set a list-struct column as a second nest; explodes agree (ref :401)") {
    val g = NestedParquet.generateData(spark, 10, 3)
    val g2 = g.withColumn("nested2", col("nested"))
    assert(g2.nestedColumns.toSet == Set("nested", "nested2"))
    val e1 = g2.toFlat("nested", Seq("id")).orderBy("id", "t")
    val e2 = g2.toFlat("nested2", Seq("id")).orderBy("id", "t")
    assert(e1.collect().toSeq == e2.collect().toSeq)
  }

  test("dot names outside nesting still address flat columns (ref :417)") {
    val flat = Seq((1L, 1, Some(3.0)), (1L, 1, None), (2L, 3, Some(6.0)),
      (2L, 3, Some(5.0))).toDF("key", ".b.", "R.A.")
    val packed = NestedOps.fromFlat(flat, Seq(".b."), Seq("R.A."),
      Seq("key"), "nested")
    assert(packed.select(col("`.b.`")).count() == 2)
    // the dotted field inside the nest resolves through the nest prefix
    assert(packed.select(explode(col("nested.`R.A.`"))).count() == 4)
  }

  test("nesting beyond depth 1 via assignment raises (ref :428)") {
    // "nested.c.d.e" would create depth-2 nesting from eval — rejected
    intercept[Exception] {
      NestedExpr.evalAssign(nf, "nested.c.d.e = a").collect()
    }
    // but assigning INTO an existing nest one level deep is fine
    val ok = NestedExpr.evalAssign(nf, "nested.c2 = nested.c")
    assert(ok.subColumns("nested").contains("c2"))
  }

  // -------------------------------------------------------------------------
  // join_nested variants (ref :460, :652, :745)
  // -------------------------------------------------------------------------

  test("join_nested left keeps unmatched base rows with NULL cells (ref :460)") {
    val wide = base.union(Seq((9L, 8, 8)).toDF)
    val j = wide.joinNested(child, Seq("key"), "nested")
    assert(j.count() == 4)
    val cell = j.where($"key" === 9L).select("nested").collect()(0)
    assert(cell.isNullAt(0)) // NULL, not empty
    // the join key stays in base and is NOT a field of the nest
    assert(j.subColumns("nested") == Seq("c", "d"))
    assert(j.baseColumns.contains("key"))
  }

  test("join_nested multi-column on: left/inner/right/outer (ref :652)") {
    val b = Seq((1, 4, 1), (1, 5, 2), (2, 4, 3), (2, 5, 4), (3, 4, 5),
      (3, 5, 6)).toDF("a", "b", "d")
    val n = Seq((1, 4, 1), (1, 4, 2), (2, 4, 3), (2, 5, 4), (3, 5, 5),
      (3, 5, 6), (3, 6, 7)).toDF("a", "b", "c")
    val left = b.joinNested(n, Seq("a", "b"), "lc")
    assert(left.count() == 6)
    assert(!left.subColumns("lc").contains("a"))
    val cells = left.orderBy("d").select(col("lc.c")).collect()
      .map(r => if (r.isNullAt(0)) null else r.getSeq[Int](0))
    assert(cells(0) == Seq(1, 2) && cells(1) == null &&
      cells(2) == Seq(3) && cells(3) == Seq(4) && cells(4) == null &&
      cells(5) == Seq(5, 6))
    val inner = b.joinNested(n, Seq("a", "b"), "lc", "inner")
    assert(inner.count() == 4)
    val right = b.joinNested(n, Seq("a", "b"), "lc", "right")
    assert(right.count() == 5)
    val unmatched = right.where($"a" === 3 && $"b" === 6)
    assert(unmatched.count() == 1)
    assert(unmatched.select("d").collect()(0).isNullAt(0)) // NaN base col
    val outer = b.joinNested(n, Seq("a", "b"), "lc", "outer")
    assert(outer.count() == 7)
    assert(outer.where($"a" === 1 && $"b" === 5).select("lc")
      .collect()(0).isNullAt(0))
  }

  test("join_nested on an empty frame yields empty with full schema (ref :745)") {
    val eb = base.where(lit(false))
    val ec = child.where(lit(false))
    val j = eb.joinNested(ec, Seq("key"), "nested")
    assert(j.count() == 0)
    assert(j.nestedColumns == Seq("nested"))
    assert(j.subColumns("nested") == Seq("c", "d"))
  }

  // -------------------------------------------------------------------------
  // dropna surface (ref :969, :1002, :1053)
  // -------------------------------------------------------------------------

  lazy val nfNa = {
    val b = Seq((0L, 1, Some(2.0)), (1L, 2, None), (2L, 3, Some(6.0)))
      .toDF("key", "a", "b")
    val c = Seq((0L, Some(0), 5), (0L, Some(2), 4), (0L, Some(4), 7),
      (1L, Some(1), 5), (1L, None, 3), (1L, Some(3), 1),
      (2L, Some(1), 9), (2L, Some(4), 3), (2L, Some(1), 4))
      .toDF("key", "c", "d")
    b.joinNested(c, Seq("key"), "nested")
  }

  test("dropna on base subset drops rows, keeps nests intact (ref :969)") {
    val dn = nfNa.na.drop(Seq("b"))
    assert(dn.count() == 2)
    assert(dn.select(sum(size($"nested"))).as[Long].collect()(0) == 6)
  }

  test("dropna targeted at the nested layer drops elements (ref :986-997)") {
    // on_nested="nested" / subset="nested.c": 3 rows survive, 8 elements
    val dn = nfNa.dropNaElements("nested", Seq("c"))
    assert(dn.count() == 3)
    assert(dn.select(sum(size($"nested"))).as[Long].collect()(0) == 8)
  }

  test("dropna with the NEST as a base subset drops NULL cells (ref :1002)") {
    val wide = nfNa.unionByName(
      Seq((9L, 9, Some(9.0))).toDF("key", "a", "b")
        .withColumn("nested", lit(null).cast(nfNa.schema("nested").dataType)))
    assert(wide.count() == 4)
    val dn = wide.na.drop(Seq("nested"))
    assert(dn.count() == 3) // the NULL-cell row dropped
  }

  test("dropna errors: multi-layer subset and unknown targets (ref :1053)") {
    // multi-target (base + nested) in one call — the reference ValueError;
    // our layer-targeted APIs make mixing impossible by construction, but a
    // dotted subset pointing at an unknown NEST must still fail
    intercept[Exception] {
      nfNa.dropNaElements("not_nested", Seq("c")).collect()
    }
    // unknown field within the nest
    intercept[Exception] {
      nfNa.dropNaElements("nested", Seq("zz")).collect()
    }
  }

  // -------------------------------------------------------------------------
  // sort_values ascension (ref :1082, :1111)
  // -------------------------------------------------------------------------

  test("sort_values nested: first cell ordered (ref :1082)") {
    val sv = NestedOps.sortValues(nf, Seq(("nested.d", true)))
    val d0 = sv.where($"key" === 0L).select(col("nested.d")).collect()(0)
      .getSeq[Int](0)
    assert(d0 == Seq(4, 5, 7))
    // multi-layer mixing raises
    intercept[IllegalArgumentException] {
      NestedOps.sortValues(nf, Seq(("a", true), ("nested.c", true)))
    }
  }

  test("sort_values ascending=False and multi-by (ref :1111)") {
    val desc = NestedOps.sortValues(nf, Seq(("nested.d", false)))
    assert(desc.where($"key" === 0L).select(col("nested.d")).collect()(0)
      .getSeq[Int](0) == Seq(7, 5, 4))
    val multi = NestedOps.sortValues(nf,
      Seq(("nested.d", false), ("nested.c", true)))
    assert(multi.where($"key" === 0L).select(col("nested.d")).collect()(0)
      .getSeq[Int](0) == Seq(7, 5, 4))
  }

  // -------------------------------------------------------------------------
  // drop surface (ref :1682)
  // -------------------------------------------------------------------------

  test("drop base, nested, multi-nest, and error paths (ref :1682)") {
    val child2 = child.toDF("key", "e", "f")
    val two = nf.joinNested(child2, Seq("key"), "nested2")
    // base column
    val d1 = NestedOps.dropColumns(two, Seq("a"))
    assert(!d1.columns.contains("a"))
    // nested field: frame width unchanged, field gone
    val d2 = NestedOps.dropColumns(two, Seq("nested.c"))
    assert(d2.columns.length == two.columns.length)
    assert(d2.subColumns("nested") == Seq("d"))
    // multiple layers and nests in one call
    val d3 = NestedOps.dropColumns(two, Seq("a", "nested.c", "nested2.f"))
    assert(!d3.columns.contains("a"))
    assert(d3.subColumns("nested") == Seq("d"))
    assert(d3.subColumns("nested2") == Seq("e"))
    // unknown names raise — both flavors
    intercept[IllegalArgumentException] {
      NestedOps.dropColumns(two, Seq("not_a_column"))
    }
    intercept[IllegalArgumentException] {
      NestedOps.dropColumns(two, Seq("a", "nested.not_a_field"))
    }
  }

  // -------------------------------------------------------------------------
  // split surface (ref :1760, :1832)
  // -------------------------------------------------------------------------

  lazy val bandNf = {
    val g = NestedParquet.generateData(spark, 5, 5)
    g.select(col("id"), col("a"), col("nested"))
  }

  test("split by a categorical sub-column: full surface (ref :1760)") {
    val r = NestedOps.splitNestedAuto(bandNf, "nested", "band",
      dropSource = false)
    assert(r.columns.contains("nested"))
    assert(r.columns.contains("nested_r") && r.columns.contains("nested_g"))
    // filtering correctness: every element of nested_r has band = r
    val bands = r.select(explode(col("nested_r.band"))).as[String].collect()
    assert(bands.nonEmpty && bands.forall(_ == "r"))
    // values subset keeps only requested splits
    val sub = NestedOps.splitNested(bandNf, "nested", "band", Seq("g"),
      dropSource = false)
    assert(sub.columns.contains("nested_g") && !sub.columns.contains("nested_r"))
    // empty values list: no splits, source kept
    val none = NestedOps.splitNested(bandNf, "nested", "band", Nil,
      dropSource = false)
    assert(none.columns.toSet == bandNf.columns.toSet)
    // values not in the data appear as all-NULL splits (r9 op-fuzzer vs
    // executed reference: a key with no matching elements gets a MISSING
    // cell from the repack, not an empty array)
    val missing = NestedOps.splitNested(bandNf, "nested", "band", Seq("z"),
      dropSource = false)
    assert(missing.where(col("nested_z").isNotNull).count() == 0)
    // dropField removes the by-column inside splits, keeps the others
    val dropBy = NestedOps.splitNested(bandNf, "nested", "band",
      Seq("r", "g"), dropField = true, dropSource = false)
    assert(dropBy.subColumns("nested_r") == Seq("t", "flux", "flux_error"))
    // dropSource (default) removes the original nest
    val dropSrc = NestedOps.splitNested(bandNf, "nested", "band", Seq("r"))
    assert(!dropSrc.columns.contains("nested"))
    // original frame untouched
    assert(!bandNf.columns.contains("nested_r"))
  }

  test("split errors: unknown nest or sub-column (ref :1832)") {
    intercept[Exception] {
      NestedOps.splitNestedAuto(bandNf, "doesnotexist", "band")
    }
    intercept[Exception] {
      NestedOps.splitNestedAuto(bandNf, "nested", "doesnotexist")
    }
  }

  // -------------------------------------------------------------------------
  // eval corners (ref :2373, :2406, :2420, :2448)
  // -------------------------------------------------------------------------

  lazy val packedNf = {
    val b = Seq((0L, 1, 2), (1L, 2, 4), (2L, 3, 6)).toDF("key", "a", "b")
    val p = Seq(
      (0L, 1, 0, 5), (0L, 2, 2, 4), (0L, 3, 4, 7),
      (1L, 1, 10, 5), (1L, 2, 4, 3), (1L, 4, 3, 1),
      (2L, 2, 1, 9), (2L, 1, 4, 3), (2L, 4, 1, 4))
      .toDF("key", "time", "c", "d")
    b.joinNested(p, Seq("key"), "packed")
  }

  test("eval: element predicate matches accessor arithmetic (ref :2373)") {
    // packed.d > 5 as a row-level any(): rows 0 and 2 have an element > 5
    val any = NestedExpr.query(packedNf,
      "packed.d > 5")
    assert(any.select("key").as[Long].collect().toSet == Set(0L, 1L, 2L))
    // rows where SOME element d>5 survive with elements filtered; row keys
    // whose cells still hold elements: d values 7 (key 0) and 9 (key 2)
    val kept = any.where(size($"packed") > 0)
      .select("key").as[Long].collect().toSet
    assert(kept == Set(0L, 2L))
    // packed.c + packed.d inside eval equals field-wise sum outside
    val r1 = NestedExpr.evalAssign(packedNf, "packed.cd = packed.c + packed.d")
      .select(explode(col("packed.cd"))).as[Int].collect().sorted
    val r2 = packedNf.select(explode(col("packed")))
      .select(($"col.c" + $"col.d")).as[Int].collect().sorted
    assert(r1.toSeq == r2.toSeq)
  }

  test("eval funcs: isna query + min/max reductions (ref :2406)") {
    val flat = Seq((1L, 1, Some(3)), (1L, 2, None)).toDF("key", "a", "b")
    val n = NestedOps.fromFlat(flat, Nil, Seq("a", "b"), Seq("key"))
    assert(n.select(sum(size($"nested"))).as[Long].collect()(0) == 2)
    val q = NestedExpr.query(n, "nested.b.isna()")
    // isna() over elements: the cell keeps only the NULL-b element
    assert(q.select(sum(size($"nested"))).as[Long].collect()(0) == 1)
    // reductions in eval equal direct aggregation
    val mx = NestedExpr.evalAssign(n, "amax = nested.a.max()")
      .select("amax").as[Double].collect()(0)
    val mn = NestedExpr.evalAssign(n, "amin = nested.a.min()")
      .select("amin").as[Double].collect()(0)
    assert(mx == 2.0 && mn == 1.0)
  }

  test("mixed eval: base + nested reduction and broadcast (ref :2420)") {
    // packed.c.median() is the GLOBAL series median (3 on this fixture):
    // reference-EXECUTED golden a + 3 = [4, 5, 6] (r8 parity fix — the
    // per-cell medians [2, 4, 1] the dialect used to compute were a
    // silent divergence from pandas eval)
    val med = NestedExpr.evalAssign(packedNf, "m = a + packed.c.median()")
      .orderBy("key").select("m").as[Double].collect().toSeq
    assert(med == Seq(4.0, 5.0, 6.0))
    // across the nest: a + packed.c elementwise equals flat-side sum
    val r = NestedExpr.evalAssign(packedNf, "packed.ac = a + packed.c")
    val pairs = r.select(col("a"), explode(col("packed"))).select(
      col("a"), col("col.c"), col("col.ac")).as[(Int, Int, Int)].collect()
    assert(pairs.nonEmpty && pairs.forall { case (a, c, ac) => ac == a + c })
  }

  test("eval assignment to a new base column (ref :2448)") {
    val r = NestedExpr.evalAssign(packedNf, "c = a + 1")
    assert(r.columns.length == packedNf.columns.length + 1)
    val vals = r.orderBy("key").select("c").as[Int].collect().toSeq
    assert(vals == Seq(2, 3, 4))
  }

  // -------------------------------------------------------------------------
  // nest_lists surface (ref :2565, :2614, :2625)
  // -------------------------------------------------------------------------

  test("nest_lists on empty frames and empty lists (ref :2565)") {
    val empty = Seq.empty[(Int, Seq[Int], Seq[Int])].toDF("a", "b", "c")
    val packedEmpty = empty.fromLists(Seq("b", "c"), "nested")
    assert(packedEmpty.count() == 0)
    assert(packedEmpty.columns.toSet == Set("a", "nested"))
    assert(packedEmpty.subColumns("nested") == Seq("b", "c"))
    // rows whose lists are empty pack to an empty (not NULL) cell
    val emptyLists = Seq((1, Seq.empty[Int], Seq.empty[Int]))
      .toDF("a", "b", "c").fromLists(Seq("b", "c"), "nested")
    assert(emptyLists.select(size($"nested")).as[Int].collect()(0) == 0)
    assert(emptyLists.toFlat("nested").count() == 0)
    // packing a non-list column raises at analysis
    intercept[AnalysisException] {
      Seq((1, Seq(1), "x")).toDF("a", "b", "d")
        .fromLists(Seq("b", "d"), "nested").collect()
    }
  }

  test("nest_lists round-trips through to_lists (ref :2614)") {
    val g = NestedParquet.generateData(spark, 5, 10)
    val lists = g.toLists("nested", Seq("id", "a", "b"))
    val repacked = lists.fromLists(Seq("t", "flux", "flux_error", "band"),
      "nested")
    val back = repacked.toFlat("nested", Seq("id")).orderBy("id", "t")
    val orig = g.toFlat("nested", Seq("id")).orderBy("id", "t")
    assert(back.collect().toSeq == orig.collect().toSeq)
  }

  test("nest_lists keeps non-list columns and schema on head(0) (ref :2625)") {
    val g = NestedParquet.generateData(spark, 5, 10)
    val lists = g.toLists("nested", Seq("id", "a", "b")).limit(0)
    val res = lists.fromLists(Seq("t", "flux", "band"), "nested2")
    assert(res.count() == 0)
    assert(res.columns.contains("id")) // the index-name analog survives
    assert(res.subColumns("nested2") == Seq("t", "flux", "band"))
  }

  // -------------------------------------------------------------------------
  // delitem / auto-nest / issues (ref :2636, :2658, :2551, :2559, :2701)
  // -------------------------------------------------------------------------

  test("delitem drops base and nested columns; missing raises (ref :2636)") {
    val d1 = NestedOps.dropColumns(nf, Seq("nested.c"))
    assert(d1.subColumns("nested") == Seq("d"))
    val d2 = NestedOps.dropColumns(d1, Seq("a"))
    assert(!d2.columns.contains("a"))
    intercept[IllegalArgumentException] {
      NestedOps.dropColumns(nf, Seq("not_a_column"))
    }
    intercept[IllegalArgumentException] {
      NestedOps.dropColumns(nf, Seq("nested.not_a_field"))
    }
  }

  test("auto-nest on frame assignment: packFlat then explode matches (ref :2658)") {
    val packed = NestedOps.packFlat(child, Seq("key"), "nested",
      sortBy = Seq(("c", true), ("d", true)))
    val joined = base.join(packed, Seq("key"), "left")
    assert(joined.nestedColumns == Seq("nested"))
    val flat = joined.toFlat("nested", Seq("key")).orderBy("key", "c", "d")
    assert(flat.count() == 9)
    assert(flat.columns.toSeq == Seq("key", "c", "d"))
  }

  test("issue193: division of nested fields inside query (ref :2551)") {
    val g = NestedParquet.generateData(spark, 3, 3)
    // flux / t > 0 — must analyze and run (t can be 0.0 → null/inf guard
    // is the engine's division semantics, as in the reference)
    val q = NestedExpr.query(g, "nested.flux / nested.t > 0")
    assert(q.count() == 3)
  }

  test("issue235: assigning into a nest on an EMPTY frame works (ref :2559)") {
    val empty = nf.limit(0)
    val r = NestedExpr.evalAssign(empty, "nested.x = nested.c + 1")
    assert(r.count() == 0)
    assert(r.subColumns("nested").contains("x"))
  }

  // -------------------------------------------------------------------------
  // series accessor surface (tests/nested_pandas/series/test_accessor.py)
  // -------------------------------------------------------------------------

  lazy val seqNf = NestedOps.packSeq(spark, Seq(
    (0L, Some(Seq((1, Some(1.0)), (2, Some(5.0)), (3, Some(6.0))))),
    (1L, None),
    (2L, Some(Seq((1, None), (2, Some(0.0))))))) // a, b fields as _1/_2

  test("nest.len over NULL cells: API NULL-distinct; DIALECT matches the " +
      "reference's 0 (acc :334,:350; r9 executed probe)") {
    // the programmatic API keeps NULL (distinct from empty) by
    // documented choice
    val raw = seqNf.orderBy("key")
      .select(NestedOps.nestLen("nested")).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
    assert(raw.toSeq == Seq(Some(3), None, Some(2)))
    // the DIALECT's nest.len() matches pandas: a None cell reports 0
    // (r9: eval "r = n.len()" on the executed reference → 0)
    val dial = graft.nested.NestedExpr.eval(seqNf, "r = nested.len()")
      .orderBy("key").select("r").as[Int].collect().toSeq
    assert(dial == Seq(3, 0, 2))
  }

  test("flat_length is the total element count (acc :363)") {
    val n = seqNf.select(sum(coalesce(size($"nested"), lit(0)))).as[Long]
      .collect()(0)
    assert(n == 5)
    // the doctest's 2×3 fixture
    val two = NestedOps.packSeq(spark, Seq(
      (0L, Some(Seq((1, Some(4.0)), (2, Some(5.0)), (3, Some(6.0))))),
      (1L, Some(Seq((1, Some(3.0)), (2, Some(4.0)), (3, Some(5.0)))))))
    assert(two.select(sum(size($"nested"))).as[Long].collect()(0) == 6)
  }

  test("to_flat then dropna gives a valid frame (acc GH#22, :1006)") {
    val flat = Seq((0L, Some(0.0), 5), (0L, Some(2.0), 4), (0L, Some(4.0), 7),
      (1L, Some(1.0), 5), (1L, None, 3), (1L, Some(3.0), 1),
      (2L, Some(1.0), 9), (2L, Some(4.0), 3), (2L, Some(1.0), 4))
      .toDF("key", "c", "d")
    val packed = NestedOps.fromFlat(flat, Nil, Seq("c", "d"), Seq("key"))
    val newFlat = packed.toFlat("nested", Seq("key"))
    val filtered = newFlat.na.drop(Seq("c"))
    assert(filtered.count() == 8)
    // total order (key, c, d) — key 2 has duplicate c values
    assert(filtered.orderBy("key", "c", "d").select("d").as[Int].collect()
      .toSeq == Seq(5, 4, 7, 5, 1, 4, 9, 3))
  }

  test("contains: field membership in the nest (acc :1032)") {
    assert(nf.subColumns("nested").contains("c"))
    assert(!nf.subColumns("nested").contains("x"))
  }

  test("accessor equality matrix across schemas and lengths (acc :1042)") {
    def one(rows: Seq[(Long, Option[Seq[(Int, Int)]])]): DataFrame =
      NestedOps.packSeq(spark, rows)
    val s1 = one(Seq((0L, Some(Seq((1, 3), (2, 2), (3, 1))))))
    val s3 = one(Seq((0L, Some(Seq((1, 3), (2, 2), (3, 1), (4, 0))))))
    assert(NestedOps.nestEquals(s1, s1, "nested"))
    assert(!NestedOps.nestEquals(s1, s3, "nested")) // different lengths
    // different field NAMES → schema mismatch
    val renamed = NestedOps.selectSubFields(s1, "nested", Seq("_1"))
    assert(!NestedOps.nestEquals(s1, renamed, "nested"))
  }

  test("items/keys/values over nest fields agree with direct access (acc :1106)") {
    val keys = nf.nestFieldIterator("nested").toSeq
    assert(keys == Seq("c", "d"))
    // items(): per-field flat values equal the dedicated sub-column path
    for (k <- keys) {
      val viaLists = nf.orderBy("key")
        .select(explode(col(s"nested.$k"))).as[Int].collect().toSeq
      val viaSub = NestedOps.getSubColumn(nf, s"nested.$k", Seq("key"))
        .orderBy("key").select(k).as[Int].collect().toSeq
      // same multiset per key ordering (element order preserved by both)
      assert(viaLists == viaSub)
    }
  }

  test("get_list_index: per-element ordinal, empty frame ok (acc :1126)") {
    val two = NestedOps.packSeq(spark, Seq(
      (5L, Some(Seq((0, 7), (1, 6), (2, 4), (3, 2)))),
      (7L, Some(Seq((4, 0), (5, 1), (6, 2), (7, 3))))))
    val idx = NestedOps.withElementIndex(two, "nested")
      .orderBy("key").select(explode(col("nested.idx"))).as[Long]
      .collect().toSeq
    assert(idx == Seq(0L, 1L, 2L, 3L, 0L, 1L, 2L, 3L))
    // empty series → empty index, no failure
    val empty = NestedOps.withElementIndex(two.limit(0), "nested")
    assert(empty.select(explode(col("nested.idx"))).count() == 0)
  }

  test("nest mask that empties ALL rows nulls the cells; .nest.query " +
      "drops the rows (acc :575,:592 + r9 executed mask probe)") {
    val q = nf.filterElements("nested", s => s.getField("c") > 100)
    assert(q.count() == 3) // rows kept, cells MISSING
    assert(q.where($"nested".isNull).count() == 3)
    // the drop-empties variant removes them (reference .nest.query —
    // "Currently we remove empty rows from the output series")
    val dropped = NestedOps.filterElementsDropEmpty(nf, "nested",
      s => s.getField("c") > 100)
    assert(dropped.count() == 0)
  }

  test("to_lists with a column subset (acc :112)") {
    val sub = NestedOps.selectSubFields(nf, "nested", Seq("c"))
    val lists = sub.toLists("nested", Seq("key"))
    assert(lists.columns.toSeq == Seq("key", "c"))
    assert(lists.where($"key" === 0L).select("c").collect()(0)
      .getSeq[Int](0) == Seq(0, 2, 4))
  }

  test("with_field constant and per-row filled values (acc :224,:441)") {
    // doctest: with_field("avg_flux", 50.0) — constant on every element
    val const = NestedOps.withNestedFieldFilled(nf, "nested", "avg", lit(50.0))
    val avgs = const.select(explode(col("nested.avg"))).as[Double].collect()
    assert(avgs.length == 9 && avgs.forall(_ == 50.0))
    // with_filled_field: one value PER ROW broadcast into that row's cell
    val perRow = NestedOps.withNestedField(nf, "nested", "rowv",
      _ => col("a") * 10)
    val pairs = perRow.select(col("a"), explode(col("nested.rowv")))
      .as[(Int, Int)].collect()
    assert(pairs.forall { case (a, v) => v == a * 10 })
  }

  // -------------------------------------------------------------------------
  // packer semantics (tests/nested_pandas/series/test_packer.py)
  // -------------------------------------------------------------------------

  test("pack with a two-column (multi-)index groups on both keys (pk :25)") {
    val df = Seq((1, 1, 1, 0), (1, 2, 2, 1), (1, 1, 3, 0), (1, 2, 4, 1))
      .toDF("k1", "k2", "a", "b")
    val packed = NestedOps.fromFlat(df, Nil, Seq("a", "b"), Seq("k1", "k2"),
      "series")
    assert(packed.count() == 2)
    val g11 = packed.where($"k1" === 1 && $"k2" === 1)
      .select(col("series.a")).collect()(0).getSeq[Int](0).sorted
    assert(g11 == Seq(1, 3))
    val g12 = packed.where($"k1" === 1 && $"k2" === 2)
      .select(col("series.a")).collect()(0).getSeq[Int](0).sorted
    assert(g12 == Seq(2, 4))
  }

  test("pack on a column: key becomes the index, not a field (pk :73)") {
    val df = Seq((1, 0, 1), (2, 1, 0), (3, 0, 1), (4, 1, 0)).toDF("a", "b", "c")
    val packed = NestedOps.fromFlat(df, Nil, Seq("a", "b"), Seq("c"), "series")
    // unique sorted c values form the key column; c is NOT inside the nest
    assert(packed.orderBy("c").select("c").as[Int].collect().toSeq == Seq(0, 1))
    assert(packed.subColumns("series") == Seq("a", "b"))
    val c0 = packed.where($"c" === 0).select(col("series.a")).collect()(0)
      .getSeq[Int](0).sorted
    assert(c0 == Seq(2, 4)) // rows where c == 0
  }

  test("pack_flat: NULL group keys form their own group (pk :610 divergence)") {
    // the reference RAISES on NaN in the index; Spark's groupBy gives NULL
    // its own group — the engine-native semantics, documented here as the
    // deliberate divergence (callers wanting the reference behavior filter
    // or assert key.isNotNull first)
    val df = Seq((Some(1L), 1), (None, 2), (Some(1L), 3), (None, 4))
      .toDF("key", "v")
    val packed = NestedOps.packFlat(df, Seq("key"), "nested")
    assert(packed.count() == 2)
    val nullGroup = packed.where($"key".isNull)
      .select(size($"nested")).as[Int].collect()(0)
    assert(nullGroup == 2)
  }

  test("pack_seq with double-nested elements keeps depth 2 (pk :447)") {
    val rows = Seq(
      (0L, Some(Seq((1, Seq(10, 11)), (2, Seq(20))))),
      (1L, None))
    val df = rows.toDF("key", "nested")
    assert(df.nestedColumns == Seq("nested"))
    // the inner Seq is an array field INSIDE the outer nest
    val inner = df.schema("nested").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(inner("_2").dataType.isInstanceOf[
      org.apache.spark.sql.types.ArrayType])
    // flatten_inner-style access still reaches the leaves
    val leaves = df.select(explode(col("nested._2")).as("l"))
      .select(explode(col("l"))).as[Int].collect().sorted
    assert(leaves.toSeq == Seq(10, 11, 20))
  }

  test("element masking by an aligned boolean keeps flat_length 2 (ns :137)") {
    val series = NestedOps.packSeq(spark, Seq(
      (0L, Some(Seq((1, 0), (2, 1)))),
      (1L, Some(Seq((3, 0), (4, 1))))))
    // mask [true, false, false, true] in flat order = keep first element of
    // row 0 and second of row 1; express as an aligned per-row predicate
    val masked = series.withColumn("nested",
      filter(col("nested"), (s, i) =>
        (col("key") === 0L && i === 0) || (col("key") === 1L && i === 1)))
    assert(masked.select(sum(size($"nested"))).as[Long].collect()(0) == 2)
    val kept = masked.select(explode(col("nested._1"))).as[Int]
      .collect().sorted
    assert(kept.toSeq == Seq(1, 4))
  }

  test("getitem by row key returns that row's flat frame (ns :154)") {
    val series = NestedOps.packSeq(spark, Seq(
      (0L, Some(Seq((1, 0), (2, 1)))),
      (1L, Some(Seq((3, 0), (4, 1))))))
    val row0 = series.where($"key" === 0L).toFlat("nested")
    assert(row0.columns.toSeq == Seq("_1", "_2"))
    assert(row0.orderBy("_1").as[(Int, Int)].collect().toSeq ==
      Seq((1, 0), (2, 1)))
  }

  test("query: fully-emptied cells become NULL, so dropna(subset=nest) " +
      "drops them (core.py:1638-1648 + dropna docstring example)") {
    // the dropna docstring's own idiom: query empties some cells → those
    // rows show None → dropna(subset="nested") removes exactly them
    // c maxes at 4 in every row, so c>4 empties ALL cells → all NULL
    val q2 = NestedExpr.query(nf, "nested.c > 4")
    assert(q2.count() == 3) // rows all kept by the element filter itself
    assert(q2.where($"nested".isNull).count() == 3)
    // and the base-layer dropna on the nest column drops exactly those rows
    assert(q2.na.drop(Seq("nested")).count() == 0)
    val q3 = NestedExpr.query(nf, "nested.d > 5")
    // key 0 keeps d=7, key 2 keeps d=9 → non-null; key 1 (d 5,3,1) empties
    assert(q3.where($"nested".isNull).select("key").as[Long]
      .collect().toSeq == Seq(1L))
    assert(q3.na.drop(Seq("nested")).select("key").as[Long]
      .collect().sorted.toSeq == Seq(0L, 2L))
    // the accessor-level element MASK also nulls emptied cells (r9
    // executed probe: ser.nest[mask] → None for the emptied key; the
    // r5 keep-empty claim was wrong)
    val masked = nf.filterElements("nested", s => s.getField("c") > 100)
    assert(masked.where($"nested".isNull).count() == masked.count())
  }

  test("whole-frame scalar fillna fills base AND nested layers " +
      "(core.py fillna docstring example, literal data)") {
    // the doctest frame: base a/b/c with NaNs, nested d/e with NaNs
    val b = Seq[(Long, Option[Double], Option[Double], Option[Double])](
      (0L, None, None, Some(10.0)),
      (1L, Some(20.0), None, None),
      (2L, None, Some(30.0), None)).toDF("key", "a", "b", "c")
    val n = Seq[(Long, Option[Double], Option[Double])](
      (0L, None, None), (1L, None, Some(1.0)), (2L, None, None))
      .toDF("key", "d", "e")
    val joined = b.joinNested(n, Seq("key"), "nested")
    val filled = NestedOps.fillNaAll(joined, 0)
    val rows = filled.orderBy("key")
      .select($"a", $"b", $"c",
        element_at($"nested.d", 1), element_at($"nested.e", 1))
      .as[(Double, Double, Double, Double, Double)].collect().toSeq
    assert(rows == Seq( // golden from the docstring output
      (0.0, 0.0, 10.0, 0.0, 0.0),
      (20.0, 0.0, 0.0, 0.0, 1.0),
      (0.0, 30.0, 0.0, 0.0, 0.0)))
    // string value variant touches only string fields
    val s = Seq((0L, Option.empty[String], Some(1.0)),
      (1L, Some("x"), None)).toDF("key", "tag", "v")
    val sf = NestedOps.fillNaAll(b.limit(2).joinNested(s, Seq("key"), "nn"), "?")
    assert(sf.select(element_at($"nn.tag", 1)).as[String]
      .collect().toSet == Set("?", "x"))
    assert(sf.where($"a".isNull).count() == 1) // numeric base untouched
  }

  test("fillna Mapping form: base keys + dotted nested keys route per " +
      "layer (core.py:1415-1428); no-arg get_subcolumns (docstring)") {
    val b = Seq[(Long, Option[Double], Option[Double])](
      (0L, None, Some(1.0)), (1L, Some(2.0), None)).toDF("key", "a", "b")
    val n = Seq[(Long, Option[Double], Option[Double])](
      (0L, None, None), (1L, None, Some(5.0))).toDF("key", "d", "e")
    val nf2 = b.joinNested(n, Seq("key"), "nested")
    val filled = NestedOps.fillNaAll(nf2,
      Map("a" -> 7.0, "nested.e" -> 9.0, "ghost" -> 1.0, "nested.zz" -> 2.0))
    val rows = filled.orderBy("key")
      .select($"a", $"b", element_at($"nested.d", 1), element_at($"nested.e", 1))
      .as[(Option[Double], Option[Double], Option[Double], Option[Double])]
      .collect().toSeq
    assert(rows == Seq(
      (Some(7.0), Some(1.0), None, Some(9.0)),   // a filled, d untouched
      (Some(2.0), None, None, Some(5.0))))       // b NOT in map → kept NULL
    // no-arg get_subcolumns: dotted names across all nests, in order
    val two = NestedExpr.evalAssign(nf2, "nest2.x = nested.d + 1")
    assert(NestedOps.subColumnsAll(two) ==
      Seq("nested.d", "nested.e", "nest2.x"))
    assert(NestedOps.subColumnsAll(b) == Nil)
  }

  test("issue350: map_rows on a frame with duplicate keys (ref :2711)") {
    import org.apache.spark.sql.types._
    val dup = nf.withColumn("key", when($"key" === 1L, 0L).otherwise($"key"))
    // 3 rows in, 3 rows out regardless of duplicate key values
    val out = StructType(Seq(StructField("new_c",
      ArrayType(DoubleType))))
    val r = graft.nested.MapRows.mapRows(dup, Seq("nested.c"), out) { args =>
      Seq(args.head.asInstanceOf[Seq[Int]].map(_ * 2.0))
    }
    assert(r.count() == 3)
  }
}

package graft

import graft.nested.{NestedOps, NestedExpr, MapRows, syntax}
import syntax._
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Executed-docstring goldens: the reference runs every `src/` docstring
  * under pytest `--doctest-modules` (reference pyproject.toml:70), which
  * makes each Examples block a semantic contract. This suite replays
  * those examples against OUR operators and asserts the reference's
  * printed values (harvested by executing the reference library on the
  * same inputs, 9-decimal precision).
  *
  * Seeded inputs: the doctests build data with `generate_data(n, m,
  * seed=1)` (reference datasets/generation.py:6-57 — np.random
  * RandomState(1) stream). The exact flat stream is stored as parquet
  * fixtures under src/test/resources/ref_seed1 (`gNM_base`/`gNM_child`,
  * child carrying the original row position `pos` so packs reproduce the
  * reference's stable within-key order).
  */
class ReferenceParitySpec3 extends SparkSpec {
  import spark.implicits._

  private val fxDir = "/root/repo/src/test/resources/ref_seed1"
  private def fx(name: String): (DataFrame, DataFrame) =
    (spark.read.parquet(s"$fxDir/${name}_base.parquet"),
     spark.read.parquet(s"$fxDir/${name}_child.parquet"))
  /** generate_data(n, m, seed=1) reproduced: pack the fixture child in its
    * original row order (join_nested packs stably in input order). */
  private def gen(name: String): DataFrame = {
    val (b, c) = fx(name)
    b.joinNested(c, Seq("id"), "nested", "left", sortBy = Seq(("pos", true)))
  }
  private def approx(got: Seq[Double], want: Seq[Double],
                     tol: Double = 1e-7): Unit = {
    assert(got.size == want.size, s"len ${got.size}!=${want.size}: $got")
    got.zip(want).foreach { case (g, w) =>
      assert(math.abs(g - w) < tol, s"$g != $w (got $got, want $want)") }
  }
  /** Per-row field arrays in id order; null cell → null entry. */
  private def cells(df: DataFrame, field: String,
                    nest: String = "nested"): Seq[Seq[Double]] =
    df.orderBy("id").select(expr(s"transform($nest, e -> e.$field)"))
      .as[Seq[Double]].collect().toSeq
  private def cellsStr(df: DataFrame, field: String,
                       nest: String = "nested"): Seq[Seq[String]] =
    df.orderBy("id").select(expr(s"transform($nest, e -> e.$field)"))
      .as[Seq[String]].collect().toSeq

  // ---------------------------------------------------------------- core.py

  test("doctest get_subcolumns: all nests and one nest (core.py:346-370)") {
    val nf = gen("g510").withColumn("nested2", col("nested"))
    assert(NestedOps.subColumnsAll(nf) == Seq(
      "nested.pos", "nested.t", "nested.flux", "nested.flux_error",
      "nested.band",
      "nested2.pos", "nested2.t", "nested2.flux", "nested2.flux_error",
      "nested2.band"))
    assert(NestedOps.subColumns(nf, "nested") ==
      Seq("pos", "t", "flux", "flux_error", "band"))
  }

  test("doctest join_nested default index align (core.py:477-535)") {
    // base a=[1,2,3] b=[4,5,6] idx 0..2; child c=1..9 idx [0,0,0,1,1,1,2,2,2]
    val base = Seq((0L, 1, 4), (1L, 2, 5), (2L, 3, 6)).toDF("id", "a", "b")
    val child = Seq((0L, 1), (0L, 2), (0L, 3), (1L, 4), (1L, 5), (1L, 6),
      (2L, 7), (2L, 8), (2L, 9)).toDF("id", "c")
    val nf = base.joinNested(child, Seq("id"), "nested",
      sortBy = Seq(("c", true)))
    val got = nf.orderBy("id")
      .select(expr("transform(nested, e -> e.c)")).as[Seq[Int]]
      .collect().toSeq
    assert(got == Seq(Seq(1, 2, 3), Seq(4, 5, 6), Seq(7, 8, 9)))
  }

  test("doctest join_nested on=[a,b] multi-key, no-match row → NULL cell " +
      "(core.py:536-543)") {
    val base = Seq((1, 4), (2, 4), (2, 5), (3, 6)).toDF("a", "b")
    val child = Seq((1, 4, 1), (2, 4, 2), (2, 4, 3), (2, 5, 4))
      .toDF("a", "b", "c")
    val nf = base.joinNested(child, Seq("a", "b"), "nested",
      sortBy = Seq(("c", true)))
    val got = nf.orderBy("a", "b")
      .select(expr("transform(nested, e -> e.c)")).as[Seq[Int]]
      .collect().toSeq
    assert(got == Seq(Seq(1), Seq(2, 3), Seq(4), null))
  }

  test("doctest nest_lists / from_lists: list columns → nest " +
      "(core.py:559-586, 661-693)") {
    val df = Seq((1, 2, Seq(1, 2, 3)), (2, 4, Seq(4, 5, 6)),
      (3, 6, Seq(7, 8, 9))).toDF("c", "d", "e")
    val nf = df.fromLists(Seq("e"), "nested")
    assert(nf.columns.toSeq == Seq("c", "d", "nested"))
    val got = nf.orderBy("c")
      .select(expr("transform(nested, x -> x.e)")).as[Seq[Int]]
      .collect().toSeq
    assert(got == Seq(Seq(1, 2, 3), Seq(4, 5, 6), Seq(7, 8, 9)))
  }

  test("doctest from_flat: repeated base cols collapse per key " +
      "(core.py:596-635)") {
    // index [0,0,0,1,1]: a=[1,1,1,2,2] b=[2,2,2,4,4] c=1..5 d=[2,4,6,8,10]
    val flat = Seq((0L, 1, 2, 1, 2), (0L, 1, 2, 2, 4), (0L, 1, 2, 3, 6),
      (1L, 2, 4, 4, 8), (1L, 2, 4, 5, 10)).toDF("id", "a", "b", "c", "d")
    val nf = NestedOps.fromFlat(flat, Seq("a", "b"), Seq("c", "d"),
      Seq("id"), "nested")
    val rows = nf.orderBy("id").select(col("a"), col("b"),
      expr("transform(nested, e -> e.c)"),
      expr("transform(nested, e -> e.d)"))
      .as[(Int, Int, Seq[Int], Seq[Int])].collect().toSeq
    assert(rows == Seq((1, 2, Seq(1, 2, 3), Seq(2, 4, 6)),
      (2, 4, Seq(4, 5), Seq(8, 10))))
  }

  test("doctest drop nested.t: sub-column dropped, rest intact " +
      "(core.py:755-802)") {
    val d = NestedOps.dropColumns(gen("g55"), Seq("nested.t"))
    assert(NestedOps.subColumns(d, "nested") ==
      Seq("pos", "flux", "flux_error", "band"))
    assert(d.count() == 5)
    assert(d.select(sum(size($"nested"))).as[Long].collect()(0) == 25L)
  }

  test("doctest split by band (core.py:867-895): per-value nests with the " +
      "reference's seed=1 cell sizes") {
    val sp = NestedOps.splitNestedAuto(gen("g55"), "nested", "band",
      dropField = false, dropSource = false)
    assert(sp.nestedColumns.toSet == Set("nested", "nested_r", "nested_g"))
    val rLens = sp.orderBy("id").select(size($"nested_r")).as[Int]
      .collect().toSeq
    val gLens = sp.orderBy("id").select(size($"nested_g")).as[Int]
      .collect().toSeq
    assert(rLens == Seq(2, 2, 3, 1, 2))
    assert(gLens == Seq(3, 3, 2, 4, 3))
    approx(cells(sp, "t", "nested_r").head, Seq(8.383890288, 17.89213327))
    approx(cells(sp, "t", "nested_g").head,
      Seq(13.409350204, 16.014891374, 1.966936677))
  }

  test("doctest min/max: across base + nested incl. lexicographic band " +
      "(core.py:949-1061)") {
    val nf = gen("g55").drop("id")
      .withColumn("nested", expr(
        "transform(nested, e -> struct(e.t, e.flux, e.flux_error, e.band))"))
    val mn = NestedOps.aggAllColumns(nf, "min").collect()(0)
    val mx = NestedOps.aggAllColumns(nf, "max").collect()(0)
    def d(r: Row, n: String) = r.getAs[Double](n)
    assert(math.abs(d(mn, "a") - 0.000114375) < 1e-8)
    assert(math.abs(d(mn, "b") - 0.18467719) < 1e-7)
    assert(math.abs(d(mn, "nested.t") - 0.547751864) < 1e-8)
    assert(math.abs(d(mn, "nested.flux") - 1.828827734) < 1e-8)
    assert(d(mn, "nested.flux_error") == 1.0)
    assert(mn.getAs[String]("nested.band") == "g")
    assert(math.abs(d(mx, "a") - 0.720324493) < 1e-8)
    assert(math.abs(d(mx, "b") - 1.077633468) < 1e-8)
    assert(math.abs(d(mx, "nested.t") - 19.365231514) < 1e-8)
    assert(math.abs(d(mx, "nested.flux") - 98.886108891) < 1e-8)
    assert(mx.getAs[String]("nested.band") == "r")
  }

  test("doctest describe: count/mean/std/quartiles for base + nested " +
      "numerics (core.py:1099-1145)") {
    val nf = gen("g55").drop("id")
      .withColumn("nested", expr(
        "transform(nested, e -> struct(e.t, e.flux, e.flux_error, e.band))"))
    val d = NestedOps.describeAll(nf)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    val want = Map(
      ("a", "count") -> 5.0, ("a", "mean") -> 0.317309867,
      ("a", "std") -> 0.274904191, ("a", "min") -> 0.000114375,
      ("a", "25%") -> 0.146755891, ("a", "50%") -> 0.302332573,
      ("a", "75%") -> 0.417022005, ("a", "max") -> 0.720324493,
      ("b", "mean") -> 0.623897497, ("b", "std") -> 0.351879656,
      ("nested.t", "count") -> 25.0, ("nested.t", "mean") -> 10.095623138,
      ("nested.t", "std") -> 6.434857919, ("nested.t", "25%") -> 3.962029782,
      ("nested.t", "50%") -> 10.663305699,
      ("nested.t", "75%") -> 16.014891374,
      ("nested.flux", "mean") -> 45.252724118,
      ("nested.flux", "25%") -> 21.1628116,
      ("nested.flux", "75%") -> 69.975836002,
      ("nested.flux_error", "std") -> 0.0)
    want.foreach { case (k, w) =>
      assert(d.contains(k), s"missing $k in ${d.keys}")
      assert(math.abs(d(k) - w) < 1e-7, s"$k: ${d(k)} != $w") }
    // band is non-numeric → absent from the numeric describe block
    assert(!d.keys.exists(_._1 == "nested.band"))
  }

  test("doctest explode (core.py:1221-1261): one row per element, base " +
      "repeated, sub-columns promoted") {
    val e = NestedOps.explodeNested(gen("g33").drop("b"), "nested")
      .orderBy("id", "pos")
    approx(e.select("a").as[Double].collect().toSeq,
      Seq(0.417022005, 0.417022005, 0.417022005, 0.720324493, 0.720324493,
        0.720324493, 0.000114375, 0.000114375, 0.000114375))
    approx(e.select("t").as[Double].collect().toSeq,
      Seq(3.725204228, 10.77633468, 4.089044995, 6.911214541, 8.383890288,
        17.562348728, 7.935349485, 13.704390008, 0.547751864))
    assert(e.select("band").as[String].collect().toSeq ==
      Seq("g", "g", "g", "r", "r", "g", "r", "r", "g"))
  }

  test("doctest fillna(0): whole-frame scalar fills base NaN and nested " +
      "element NaN (core.py:1358-1403)") {
    val base = Seq((0L, Some(1.0), Some(4.0)), (1L, Some(2.0), None),
      (2L, None, Some(6.0))).toDF("id", "a", "b")
    val child = Seq(
      (0L, 0, Some(1.0), Some(10.0)), (0L, 1, Some(2.0), Some(11.0)),
      (0L, 2, None, Some(12.0)),
      (1L, 3, Some(4.0), None), (1L, 4, Some(5.0), Some(14.0)),
      (1L, 5, None, None),
      (2L, 6, Some(7.0), Some(16.0)), (2L, 7, Some(8.0), Some(17.0)),
      (2L, 8, Some(9.0), Some(18.0))).toDF("id", "pos", "c", "d")
    val nf = base.joinNested(child, Seq("id"), "nested",
      sortBy = Seq(("pos", true)))
    val f = NestedOps.fillNaAll(nf, 0.0)
    assert(f.orderBy("id").select("a").as[Double].collect().toSeq ==
      Seq(1.0, 2.0, 0.0))
    assert(f.orderBy("id").select("b").as[Double].collect().toSeq ==
      Seq(4.0, 0.0, 6.0))
    assert(cells(f, "c") == Seq(Seq(1.0, 2.0, 0.0), Seq(4.0, 5.0, 0.0),
      Seq(7.0, 8.0, 9.0)))
    assert(cells(f, "d") == Seq(Seq(10.0, 11.0, 12.0), Seq(0.0, 14.0, 0.0),
      Seq(16.0, 17.0, 18.0)))
  }

  test("doctest query 'nested.t > 10' then 'nested.len() > 2' " +
      "(core.py:1526-1585)") {
    val q = NestedExpr.query(gen("g55"), "nested.t > 10")
    assert(q.orderBy("id").select(size($"nested")).as[Int].collect().toSeq ==
      Seq(3, 2, 2, 3, 3))
    val q2 = NestedExpr.query(q, "nested.len() > 2")
    assert(q2.orderBy("id").select("id").as[Long].collect().toSeq ==
      Seq(0L, 3L, 4L))
    assert(q2.select(size($"nested")).as[Int].collect().toSeq.forall(_ == 3))
  }

  test("doctest dropna(subset=nested): query t>19 NULLs 3 cells, dropna " +
      "keeps rows 1,2 (core.py:1709-1772)") {
    val q = NestedExpr.query(gen("g55"), "nested.t > 19")
    // emptied cells become NULL (reference ext_array semantics), not []
    val got = cells(q, "t")
    assert(got(0) == null && got(3) == null && got(4) == null)
    approx(got(1), Seq(19.365231514))
    approx(got(2), Seq(19.157790603))
    approx(cells(q, "flux")(1), Seq(90.859550309))
    approx(cells(q, "flux")(2), Seq(14.672857491))
    val dropped = q.where($"nested".isNotNull)
    assert(dropped.orderBy("id").select("id").as[Long].collect().toSeq ==
      Seq(1L, 2L))
  }

  test("doctest dropna(on_nested)/dropna(subset=nested.t): no-op on " +
      "complete data (core.py:1709-1772)") {
    val nf = gen("g55")
    val d1 = NestedOps.dropNaElements(nf, "nested")
    val d2 = NestedOps.dropNaElements(nf, "nested", Seq("t"))
    assert(d1.select(sum(size($"nested"))).as[Long].collect()(0) == 25L)
    assert(d2.select(sum(size($"nested"))).as[Long].collect()(0) == 25L)
  }

  test("doctest sort_values by nested.band: stable within-row element sort " +
      "(core.py:1862-1878)") {
    val s = NestedOps.sortElements(gen("g55"), "nested",
      Seq(("band", true), ("pos", true)))
    val bands = cellsStr(s, "band")
    assert(bands(0) == Seq("g", "g", "g", "r", "r"))
    assert(bands(3) == Seq("g", "g", "g", "g", "r"))
    approx(cells(s, "t")(0),
      Seq(13.409350204, 16.014891374, 1.966936677, 8.383890288, 17.89213327))
    approx(cells(s, "t")(3),
      Seq(17.562348728, 13.846452313, 3.396608391, 10.663305699,
        2.807738772))
  }

  test("doctest reduce → flat outputs: mean and mean-minus-base " +
      "(core.py:1981-2010)") {
    // the reference's reduce(np.mean, 'nested.t') is PER-ROW — that is
    // elementReduction (the dialect's `nested.t.mean()` spelling is the
    // GLOBAL pandas-eval reduction since the r8 parity fix)
    val m = NestedExpr.elementReduction("nested", "t", "mean")
    val r = gen("g55").withColumn("mean", m)
      .withColumn("mean_minus_base", m - col("a"))
    approx(r.orderBy("id").select("mean").as[Double].collect().toSeq,
      Seq(11.533440362, 10.307750859, 8.294042279, 9.655290781,
        10.687591408))
    approx(r.orderBy("id").select("mean_minus_base").as[Double]
      .collect().toSeq,
      Seq(11.116418358, 9.587426366, 8.293927904, 9.352958208,
        10.540835517))
  }

  test("doctest reduce → new nest 'offsets': per-element t-a / t-b " +
      "(core.py:2011-2030)") {
    val r = NestedExpr.evalAssign(NestedExpr.evalAssign(gen("g55"),
      "offsets.t_a = nested.t - a"), "offsets.t_b = nested.t - b")
    assert(r.nestedColumns.toSet == Set("nested", "offsets"))
    approx(cells(r, "t_a", "offsets")(0),
      Seq(7.966868283, 12.992328199, 15.597869369, 17.475111265,
        1.549914672))
    approx(cells(r, "t_b", "offsets")(4),
      Seq(-0.529881604, 2.884396314, 16.450149578, 16.485216601,
        12.759908811))
  }

  test("doctest map_rows first-element-per-field (core.py:2218-2320)") {
    val nf = gen("g55")
    val out = MapRows.mapRows(nf,
      Seq("id", "nested.t", "nested.flux", "nested.band"),
      StructType(Seq(StructField("id", LongType),
        StructField("first_t", DoubleType),
        StructField("first_flux", DoubleType),
        StructField("first_band", StringType)))) { args =>
      Seq(args(0),
        args(1).asInstanceOf[Seq[Double]].head,
        args(2).asInstanceOf[Seq[Double]].head,
        args(3).asInstanceOf[Seq[String]].head)
    }
    approx(out.orderBy("id").select("first_t").as[Double].collect().toSeq,
      Seq(8.383890288, 13.704390008, 4.089044995, 17.562348728,
        0.547751864))
    approx(out.orderBy("id").select("first_flux").as[Double]
      .collect().toSeq,
      Seq(31.551563101, 68.650092768, 83.46256719, 1.828827734,
        75.014431494))
    assert(out.orderBy("id").select("first_band").as[String]
      .collect().toSeq == Seq("r", "g", "g", "g", "g"))
  }

  // ------------------------------------------------------------ accessor.py

  test("doctest nest.drop('flux') keeps remaining fields and values " +
      "(accessor.py:528-545)") {
    val d = gen("g52").dropNestedFields("nested", "flux", "pos")
    assert(NestedOps.subColumns(d, "nested") ==
      Seq("t", "flux_error", "band"))
    approx(cells(d, "t").head, Seq(8.383890288, 13.409350204))
  }

  test("doctest nest.get_flat_index / to_flat: flat order is row-major " +
      "(accessor.py:93-130, 644-660)") {
    val flat = gen("g52").toFlat("nested", baseCols = Seq("id"))
      .orderBy("id", "pos")
    assert(flat.select("id").as[Long].collect().toSeq ==
      Seq(0L, 0L, 1L, 1L, 2L, 2L, 3L, 3L, 4L, 4L))
    approx(flat.select("t").as[Double].collect().toSeq,
      Seq(8.383890288, 13.409350204, 13.704390008, 8.346096047,
        4.089044995, 11.173796569, 17.562348728, 2.807738772, 0.547751864,
        3.962029782))
    assert(flat.select("band").as[String].collect().toSeq ==
      Seq("r", "g", "g", "g", "g", "g", "r", "r", "g", "r"))
  }

  test("doctest nest.get_flat_series('flux') (accessor.py:669-700)") {
    val flat = gen("g52")
      .toFlat("nested", baseCols = Seq("id"), fields = Seq("pos", "flux"))
      .orderBy("id", "pos")
    approx(flat.select("flux").as[Double].collect().toSeq,
      Seq(80.074456868, 89.46066635, 96.826157572, 8.504421137,
        31.342417816, 3.905478323, 69.232261567, 16.983041956,
        87.63891523, 87.814250343))
  }

  test("doctest nest.get_list_series('flux'): one list per row " +
      "(accessor.py:726-750)") {
    val lists = gen("g52").toLists("nested", baseCols = Seq("id"))
    val flux = lists.orderBy("id").select("flux").as[Seq[Double]]
      .collect().toSeq
    approx(flux(0), Seq(80.074456868, 89.46066635))
    approx(flux(4), Seq(87.63891523, 87.814250343))
  }

  test("doctest nest.query('flux > 50') ≡ query_flat: emptied rows kept " +
      "until drop (accessor.py:568-640)") {
    val q = NestedOps.filterElements(gen("g55"), "nested",
      e => e.getField("flux") > 50.0)
    assert(q.orderBy("id").select(size($"nested")).as[Int].collect().toSeq ==
      Seq(1, 5, 1, 2, 2))
    approx(cells(q, "flux")(0), Seq(98.886108891))
    approx(cells(q, "flux")(1),
      Seq(68.650092768, 74.816565438, 90.859550309, 67.883553294,
        57.411760549))
  }

  test("doctest nest.set_column scalar broadcast (accessor.py:236-330)") {
    val s = NestedOps.withNestedFieldFilled(gen("g52"), "nested",
      "avg_flux", lit(50.0))
    assert(cells(s, "avg_flux") == Seq.fill(5)(Seq(50.0, 50.0)))
    approx(cells(s, "t").head, Seq(8.383890288, 13.409350204))
  }

  test("doctest nest.set_filled_column: one value PER ROW broadcast into " +
      "elements (accessor.py:454-470)") {
    val withA = NestedOps.withNestedFieldFilled(gen("g32"), "nested", "a2",
      col("id") + 1)
    assert(cells(withA, "a2") ==
      Seq(Seq(1.0, 1.0), Seq(2.0, 2.0), Seq(3.0, 3.0)))
    approx(cells(withA, "t")(0), Seq(3.725204228, 10.77633468))
    approx(cells(withA, "t")(2), Seq(7.935349485, 13.704390008))
  }

  test("doctest nest.set_list_column: per-row lists become a new field " +
      "(accessor.py:377-400)") {
    val lists = Seq((0L, Seq("g", "g")), (1L, Seq("r", "r")))
      .toDF("id", "new_band")
    val s = NestedOps.withNestedFieldFromList(
      gen("g22").join(lists, Seq("id")), "nested", "new_band",
      "new_band").drop("new_band")
    assert(cellsStr(s, "new_band") == Seq(Seq("g", "g"), Seq("r", "r")))
    approx(cells(s, "t")(0), Seq(2.935117816, 3.725204228))
    approx(cells(s, "t")(1), Seq(1.846771895, 6.911214541))
  }

  test("doctest to_flatten_inner: two-level nest flattens the inner layer " +
      "(accessor.py:859-910)") {
    // outer id = [0,0,0,1,1] over g52 rows, inner = the g52 nests
    val inner = gen("g52").withColumnRenamed("nested", "inner")
      .withColumn("oid", expr("CASE WHEN id < 3 THEN 0 ELSE 1 END"))
    val outer = NestedOps.packFlat(
      inner.select("oid", "id", "a", "inner"), Seq("oid"), "outer_nest",
      sortBy = Seq(("id", true)))
    val fl = NestedOps.flattenInner(outer, "outer_nest", "inner")
    assert(fl.orderBy("oid").select(size($"outer_nest")).as[Int]
      .collect().toSeq == Seq(6, 4)) // 3 rows × 2 inner, 2 rows × 2 inner
    val t0 = fl.orderBy("oid")
      .select(expr("transform(outer_nest, e -> e.t)")).as[Seq[Double]]
      .collect().head
    approx(t0, Seq(8.383890288, 13.409350204, 13.704390008, 8.346096047,
      4.089044995, 11.173796569))
  }
}

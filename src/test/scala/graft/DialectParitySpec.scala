package graft

import graft.nested.{NestedOps, NestedExpr, syntax}
import syntax._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Eval-dialect completeness vs the reference's pandas-eval surface
  * (reference expr.py:24-46 rides pandas' PandasExprVisitor, so query
  * strings accept the full pandas-eval grammar). Each case's expected
  * element count was harvested by running the reference library on
  * generate_data(5,5,seed=1) with the same query string.
  *
  * Known divergences (ours = extension or documented gap):
  *  - `%` (mod): the reference supports it on the BASE layer (python
  *    modulo — divisor's sign) and RAISES NotImplementedError on the
  *    nested layer; we render pmod (= python modulo) on both layers.
  *    The nested-layer support is an extension, asserted below.
  *  - `.str` methods: the reference reaches pandas' full Series.str
  *    surface; we map the common subset (upper/lower/len/strip/lstrip/
  *    rstrip/title/startswith/endswith/contains) and raise for the rest.
  *  - (until r10 ambiguous `a * b // c` / `a ** b ** c` raised; the r11
  *    AST parser implements true python precedence — left-assoc //,
  *    right-assoc ** — reference-executed below.)
  */
class DialectParitySpec extends SparkSpec {
  import spark.implicits._

  private lazy val g55: DataFrame = {
    val b = spark.read.parquet(
      "/root/repo/src/test/resources/ref_seed1/g55_base.parquet")
    val c = spark.read.parquet(
      "/root/repo/src/test/resources/ref_seed1/g55_child.parquet")
    b.joinNested(c, Seq("id"), "nested", "left", sortBy = Seq(("pos", true)))
  }

  /** Total surviving elements after query (reference-harvested goldens
    * count the same way: rows always 5, cells possibly NULL). */
  private def elems(q: String): Long =
    NestedExpr.query(g55, q)
      .select(coalesce(sum(size($"nested")), lit(0L))).as[Long]
      .collect().head

  test("in-list / not-in-list on a nested field (ref pandas-eval `in`)") {
    assert(elems("nested.band in ['r']") == 10)
    assert(elems("nested.band not in ['r']") == 15)
    assert(elems("nested.band in ['r', 'g']") == 25)
  }

  test("chained comparison 5 < nested.t < 10 (Python chaining)") {
    assert(elems("5 < nested.t < 10") == 4)
    // equivalent unchained form agrees
    assert(elems("(5 < nested.t) and (nested.t < 10)") == 4)
    // three-way chain
    assert(elems("0 < nested.t < 20") == 25)
  }

  test("~ negation and `not` keyword (pandas mask negation)") {
    assert(elems("~(nested.t > 10)") == 12)
    assert(elems("not (nested.t > 10)") == 12)
    assert(elems("nested.t > 10") == 13)
  }

  test("& and | mask operators map to and/or") {
    assert(elems("(nested.t > 5) & (nested.flux > 50)") == 7)
    assert(elems("(nested.t > 5) | (nested.flux > 50)") == 21)
  }

  test(".str methods: upper/startswith/contains/len on nested and base " +
      "(ref resolver-reachable Series.str)") {
    assert(elems("nested.band.str.upper() == 'R'") == 10)
    assert(elems("nested.band.str.startswith('r')") == 10)
    assert(elems("nested.band.str.contains('g')") == 15)
    assert(elems("nested.band.str.len() == 1") == 25)
    // casefold ≡ lower; replace is literal (pandas ≥2 regex=False);
    // capitalize touches only the first character
    assert(elems("nested.band.str.casefold() == 'r'") == 10)
    assert(elems("nested.band.str.replace('r', 'g') == 'g'") == 25)
    val df2 = Seq((0L, Seq("red fox", "BIG DOG"))).toDF("id", "s")
      .fromLists(Seq("s"), "n")
    val caps = NestedExpr.query(df2, "n.s.str.capitalize() == 'Red fox'")
    assert(caps.select(size($"n")).as[Int].collect().head == 1)
    // unsupported method raises with a clear message
    val ex = intercept[IllegalArgumentException] {
      elems("nested.band.str.translate() == 'R'")
    }
    assert(ex.getMessage.contains("not supported"))
  }

  test(".str character-class predicates and rjust/ljust (pandas is* " +
      "semantics: empty false, cased-char requirement for isupper)") {
    // pandas goldens computed on these literals:
    // ['ab', 'AB', 'Ab', 'a1', '12', '½', ' ', '', 'a b']
    val df = Seq((0L, Seq("ab", "AB", "Ab", "a1", "12", "½", " ", "",
        "a b"))).toDF("id", "s").fromLists(Seq("s"), "n")
    def n(q: String): Int =
      NestedExpr.query(df, q).select(coalesce(sum(size($"n")), lit(0L)))
        .as[Long].collect().head.toInt
    assert(n("n.s.str.isalpha()") == 3)   // ab, AB, Ab
    assert(n("n.s.str.isdigit()") == 1)   // 12 (½ is No, not Nd)
    assert(n("n.s.str.isnumeric()") == 2) // 12, ½
    assert(n("n.s.str.isalnum()") == 6)   // ab AB Ab a1 12 ½
    assert(n("n.s.str.isspace()") == 1)   // ' '
    assert(n("n.s.str.isupper()") == 1)   // AB ('12' has no cased char)
    assert(n("n.s.str.islower()") == 3)   // ab, a1, 'a b'
    // rjust/ljust pad to width with spaces, like pandas defaults
    assert(n("n.s.str.rjust(3) == ' ab'") == 1)
    assert(n("n.s.str.ljust(3, '_') == 'ab_'") == 1)
  }

  test("functions abs/sqrt pass through to Spark SQL") {
    assert(elems("abs(nested.t - 10) < 2") == 5)
    assert(elems("sqrt(nested.flux) > 9") == 3)
  }

  test("** power and // floor division (Python operators)") {
    assert(elems("nested.t ** 2 > 300") == 6)
    assert(elems("nested.t // 2 == 4") == 3)
    // Python floor semantics on negatives: -7 // 2 == -4 (SQL div would
    // truncate to -3)
    val df = Seq((0L, Seq(-7.0, 7.0))).toDF("id", "v")
      .fromLists(Seq("v"), "n")
    val r = NestedExpr.query(df, "n.v // 2 == -4")
    assert(r.select(size($"n")).as[Int].collect().head == 1)
    // r11: python precedence implemented (reference-executed probes
    // 2026-08-15): // is left-associative and looser than *, ** is
    // right-associative and tighter than unary minus
    val pr = Seq((0L, Seq(3.0, 8.0)), (1L, Seq(5.0, 2.0)),
        (2L, Seq(7.0, 1.0)))
      .toDF("id", "v").fromLists(Seq("v"), "n")
    def cnt(q: String): Long = NestedExpr.query(pr, q)
      .select(coalesce(sum(size($"n")), lit(0L))).as[Long].collect().head
    assert(cnt("n.v * 2 // 3 > 1") == 4)      // ref: [2,1,1] kept
    assert(cnt("n.v ** 2 ** 2 > 100") == 3)   // v^4 > 100: 8,5,7
    // 2 ** a ** 2 == 2^(a^2): right-associative (ref eval: [2,16,512])
    val pw = Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)).toDF("k", "a")
    val got = NestedExpr.evalAssign(pw, "d = 2 ** a ** 2")
      .orderBy("k").select("d").as[Double].collect().toSeq
    assert(got == Seq(2.0, 16.0, 512.0), s"** right-assoc diverged: $got")
  }

  test("r9: eval global reductions build the plan LAZILY and BATCHED — " +
      "zero Spark jobs at eval time, one agg scan per nest") {
    val sc = spark.sparkContext
    val before = sc.statusTracker.getJobIdsForGroup(null).length
    // three reductions over the same nest in one expression: until r9
    // each ran its own eager distributed agg at parse time
    val out = NestedExpr.eval(g55,
      "r = id + nested.t.mean() + nested.t.median() + nested.flux.sum()")
    val mid = sc.statusTracker.getJobIdsForGroup(null).length
    assert(mid == before,
      s"eval ran ${mid - before} job(s) while building the plan; expected 0")
    // the plan joins ONE single-row broadcast agg carrying ALL THREE
    // reductions (the other Aggregates in the plan are the fixture's own
    // packs), and the helper columns are dropped from the output
    val plan = out.queryExecution.optimizedPlan.toString()
    val redAggs = plan.linesIterator
      .filter(l => l.contains("Aggregate [") && l.contains("__graft_red"))
      .toVector
    assert(redAggs.length == 1,
      s"expected exactly 1 reduction Aggregate, got ${redAggs.length}:\n$plan")
    // all three reductions in the ONE agg (helper names are content
    // hashes since the cross-line batching change)
    assert("__graft_red_".r.findAllIn(redAggs.head).length == 3,
      s"reduction agg not batched: ${redAggs.head}")
    assert(plan.contains("Join Cross") && plan.contains("broadcast"),
      "reductions should attach via a broadcast cross join")
    assert(!out.columns.exists(_.startsWith("__graft_red")),
      s"helper columns leaked: ${out.columns.mkString(",")}")
    out.collect() // still computes
  }

  test("r9s4: multiline eval batches independent reductions ACROSS lines; " +
      "a reduction over a column an earlier line writes stays per-line " +
      "and sees the written values") {
    // reductions on two separate lines, neither over a written column
    // -> ONE reduction Aggregate in the plan (pre-hoisted, shared scan)
    val out = NestedExpr.eval(g55,
      """r1 = id + nested.t.mean()
        |r2 = id - nested.flux.sum()""".stripMargin)
    val plan = out.queryExecution.optimizedPlan.toString()
    val redAggs = plan.linesIterator
      .filter(l => l.contains("Aggregate [") && l.contains("__graft_red"))
      .toVector
    assert(redAggs.length == 1,
      s"expected 1 batched reduction Aggregate across lines, got " +
        s"${redAggs.length}:\n$plan")
    assert(!out.columns.exists(_.startsWith("__graft_red")),
      s"helper columns leaked: ${out.columns.mkString(",")}")
    // dependency case: line 2 reduces the column line 1 CREATED — must
    // NOT be hoisted (the original frame has no 's'); value checked
    val base = Seq((1L, 2.0), (2L, 4.0), (3L, 9.0)).toDF("k", "a")
    val dep = NestedExpr.eval(base, "s = a * 2\nd = s.mean()")
    val ds = dep.select("d").as[Double].collect().toSet
    assert(ds == Set(10.0), s"dependent reduction saw wrong values: $ds")
    // modification case: line 1 rewrites a nested field, line 2 reduces
    // it — the reduction must see the MODIFIED elements
    val mod = NestedExpr.eval(g55,
      "nested.t = nested.t * 0\nz = id + nested.t.mean()")
    val zs = mod.select(col("z") - col("id")).as[Double].collect().toSet
    assert(zs == Set(0.0), s"post-modification reduction diverged: $zs")
  }

  test("r9s4 review regressions: fractional-mantissa sci-notation, " +
      "comparison-only eval line raises, dt-named column doesn't shadow " +
      "chains, float literals are DOUBLE not DECIMAL") {
    val base = Seq((1L, 4L), (2L, 8L)).toDF("k", "y")
    // 1.5e2: mantissa and exponent split across tokens — must stay a
    // sci-notation literal, not become `1.5De2`
    val sci = NestedExpr.evalAssign(base, "r = y + 1.5e2")
      .select("r").as[Double].collect().toSet
    assert(sci == Set(154.0, 158.0), s"sci-notation broke: $sci")
    // a comparison-only line is NOT an assignment (pandas raises too);
    // before the lookbehind fix `a == b` executed as `a = b`
    intercept[IllegalArgumentException] {
      NestedExpr.evalAssign(base, "k == y")
    }
    // float literal arithmetic with all-integer operands must be DOUBLE:
    // bare 2.39 is DECIMAL(3,2) and sum() would round to scale+4
    val dec = NestedExpr.eval(base, "r = (2.39 + abs(y - 1)) * 1\ns = r.mean()")
      .select("s").as[Double].collect().head
    assert(math.abs(dec - (2.39 + 3 + 2.39 + 7) / 2) < 1e-12,
      s"decimal-literal arithmetic diverged: $dec")
    // a column literally named `dt` must not shadow a .dt chain after a
    // call's closing paren
    val withDt = Seq((1L, java.time.LocalDateTime.parse("2024-03-05T10:30:00")))
      .toDF("dt", "ts")
    val y0 = NestedExpr.evalAssign(withDt, "y0 = ts.dt.floor('D').dt.year")
      .select("y0").as[Int].collect().head
    assert(y0 == 2024, s"dt-named column shadowed the chain: $y0")
    // boolean dt-attr reduction: mean = fraction of true (cast path)
    val frac = NestedExpr.evalAssign(withDt, "f = ts.dt.is_leap_year.mean()")
      .select("f").as[Double].collect().head
    assert(frac == 1.0, s"is_leap_year.mean() diverged: $frac")
  }

  test("r9s5 review regressions: augmented assignment raises, trailing-dot " +
      "sci mantissa, bool dt-attr min/max stay boolean") {
    val base = Seq((1L, 4L), (2L, 8L)).toDF("k", "y")
    // the reference raises NotImplementedError('AugAssign'); before the
    // lookbehind widening `k += 1` silently executed as `k = 1`
    for (aug <- Seq("k += 1", "k -= 1", "k *= 2", "y //= 2", "k &= 1"))
      intercept[IllegalArgumentException] {
        NestedExpr.evalAssign(base, aug)
      }
    // `3.e2` is a valid python float (mantissa `3.` + exponent)
    val sci = NestedExpr.evalAssign(base, "r = y + 3.e2")
      .select("r").as[Double].collect().toSet
    assert(sci == Set(304.0, 308.0), s"trailing-dot sci broke: $sci")
    // pandas keeps boolean dtype under min/max (False, not 0)
    val withTs = Seq(
      (1L, java.time.LocalDateTime.parse("2024-03-05T10:30:00")),
      (2L, java.time.LocalDateTime.parse("2023-03-05T10:30:00")))
      .toDF("k", "ts")
    val mn = NestedExpr.evalAssign(withTs, "f = ts.dt.is_leap_year.min()")
      .select("f").as[Boolean].collect().toSet
    assert(mn == Set(false), s"is_leap_year.min() diverged: $mn")
    val mx = NestedExpr.evalAssign(withTs, "f = ts.dt.is_leap_year.max()")
      .select("f").as[Boolean].collect().toSet
    assert(mx == Set(true), s"is_leap_year.max() diverged: $mx")
    // COMPOSED use stays numeric (pandas bool is duck-numeric: True+1=2)
    val comp = NestedExpr.evalAssign(withTs,
      "f = ts.dt.is_leap_year.max() + 1")
      .select("f").as[Long].collect().toSet
    assert(comp == Set(2L), s"composed bool reduction diverged: $comp")
  }

  test("r10 advice: parenthesized bare bool reduction keeps bool dtype; " +
      "orphan .dt chain error names .dt and the receiver; per-line hoist " +
      "keeps a shared agg when only a LATER line writes the source") {
    val withTs = Seq(
      (1L, java.time.LocalDateTime.parse("2024-03-05T10:30:00")),
      (2L, java.time.LocalDateTime.parse("2023-03-05T10:30:00")))
      .toDF("k", "ts")
    // `(expr)` around a bare bool min/max is still a bare use — pandas
    // keeps bool dtype through redundant parens
    val mn = NestedExpr.evalAssign(withTs, "f = (ts.dt.is_leap_year.min())")
      .select("f").as[Boolean].collect().toSet
    assert(mn == Set(false), s"parenthesized bare min diverged: $mn")
    val mn2 = NestedExpr.evalAssign(withTs, "f = ((ts.dt.is_leap_year.max()))")
      .select("f").as[Boolean].collect().toSet
    assert(mn2 == Set(true), s"double-parenthesized bare max diverged: $mn2")
    // unbalanced/composed parens stay numeric
    val comp = NestedExpr.evalAssign(withTs,
      "f = (ts.dt.is_leap_year.max()) + 1")
      .select("f").as[Long].collect().toSet
    assert(comp == Set(2L), s"composed parens diverged: $comp")
    // a parenthesized RECEIVER `(ts).dt.year` is legal pandas and (r11,
    // AST pipeline) evaluates — reference-executed: [2024, 2023]
    val py = NestedExpr.evalAssign(withTs, "y = (ts).dt.year")
      .orderBy(desc("y")).select("y").as[Int].collect().toSeq
    assert(py == Seq(2024, 2023), s"paren receiver .dt diverged: $py")
    // hoist sharing: two EARLY lines share one reduction over a column a
    // LATER line writes — one batched agg, both early lines see pre-write
    // values, a post-write use re-aggregates and sees the new values
    val base = Seq((1L, 2.0), (2L, 4.0)).toDF("k", "a")
    val out = NestedExpr.eval(base,
      """r1 = a.mean()
        |r2 = a.mean() + 1
        |a = a * 10
        |r3 = a.mean()""".stripMargin)
    val row = out.orderBy("k").collect()
    assert(row.forall(_.getAs[Double]("r1") == 3.0))
    assert(row.forall(_.getAs[Double]("r2") == 4.0))
    assert(row.forall(_.getAs[Double]("r3") == 30.0),
      "post-write reduction must see the written values")
    assert(!out.columns.exists(_.startsWith("__graft_red")))
  }

  test("r10 dt-audit surface: day_name/month_name/ceil/round/as_unit/" +
      "nanosecond on both layers; round ties split numpy-half-even vs " +
      "arrow-half-up; NA comparisons split equality-2-valued vs " +
      "ordering-Kleene (all reference-executed probes 2026-08-15)") {
    val withTs = Seq(
      (1L, java.time.LocalDateTime.parse("2024-01-01T00:30:00")),
      (2L, java.time.LocalDateTime.parse("2024-01-01T01:30:00")),
      (3L, java.time.LocalDateTime.parse("2024-03-05T10:30:45.123900")))
      .toDF("k", "ts")
    def one[T](expr: String, k: Long)(implicit
        enc: org.apache.spark.sql.Encoder[T]): T =
      NestedExpr.evalAssign(withTs, expr).where($"k" === k)
        .select("r").as[T](enc).head()
    assert(one[String]("r = ts.dt.day_name()", 3L) == "Tuesday")
    assert(one[String]("r = ts.dt.month_name()", 3L) == "March")
    assert(one[Long]("r = ts.dt.nanosecond", 3L) == 0L)
    // numpy HALF-EVEN: 00:30 → 00:00 (even hour index), 01:30 → 02:00
    def ldt(s: String) = java.time.LocalDateTime.parse(s)
    assert(one[java.time.LocalDateTime]("r = ts.dt.round('h')", 1L) ==
      ldt("2024-01-01T00:00:00"))
    assert(one[java.time.LocalDateTime]("r = ts.dt.round('h')", 2L) ==
      ldt("2024-01-01T02:00:00"))
    assert(one[java.time.LocalDateTime]("r = ts.dt.ceil('15min')", 3L) ==
      ldt("2024-03-05T10:45:00"))
    assert(one[java.time.LocalDateTime]("r = ts.dt.as_unit('ms')", 3L) ==
      ldt("2024-03-05T10:30:45.123")) // truncated, not rounded
    // nested layer: arrow round is HALF-UP (both ties go to next hour)
    val base = Seq((1L, "b")).toDF("id", "tag")
    val child = Seq(
      (1L, ldt("2024-01-01T00:30:00"), "p"),
      (1L, ldt("2024-01-01T01:30:00"), "q"))
      .toDF("id", "t", "s")
    val nf = NestedOps.joinNested(base, child, Seq("id"), "n", "left")
    val rounded = NestedExpr.evalAssign(nf, "n.r = n.t.dt.round('h')")
      .select(explode($"n").as("e")).select("e.r")
      .as[java.time.LocalDateTime].collect().toSeq
    assert(rounded == Seq(ldt("2024-01-01T01:00:00"),
      ldt("2024-01-01T02:00:00")), s"arrow half-up diverged: $rounded")
    // NA regimes on the element layer: equality on a string/timestamp
    // result is 2-VALUED (NA kept under !=), ordering is KLEENE
    val childNa = Seq(
      (1L, Some(ldt("2024-02-29T06:00:00")), Some("aa")),
      (1L, None: Option[java.time.LocalDateTime], None: Option[String]),
      (1L, Some(ldt("2023-06-16T00:00:00")), Some("bb")))
      .toDF("id", "t", "s")
    val nfNa = NestedOps.joinNested(base, childNa, Seq("id"), "n", "left")
    def kept(q: String): Long =
      NestedExpr.query(nfNa, q)
        .select(coalesce(sum(size($"n")), lit(0L))).as[Long].head()
    assert(kept("n.t != '2023-06-16'") == 2L)          // NA kept (eq, 2V)
    assert(kept("n.t.dt.day_name() != 'Friday'") == 2L)
    assert(kept("~(n.s == 'bb')") == 2L)
    assert(kept("n.s <= 'ab'") == 1L)                  // NA dropped (ord)
    assert(kept("~(n.s <= 'ab')") == 1L)
    assert(kept("~(n.t.dt.round('h') <= '2023-12-31')") == 1L)
    assert(kept("n.s.str.upper() != 'BB'") == 2L)      // string result, eq
    assert(kept("n.s.str.len() != 2") == 0L)           // numeric result
    // slice_replace stop<start clamps to insert (pandas semantics)
    val st = Seq((1L, "Hello World")).toDF("k", "v")
    assert(NestedExpr.evalAssign(st, "r = v.str.slice_replace(2, 1, 'ZZ')")
      .select("r").as[String].head() == "HeZZllo World")
  }

  test("r10: python None/True/False literals — base 2-valued vs None, " +
      "element FORCED Kleene, isin matches NA against a None list value " +
      "on the element layer only (all reference-executed probes)") {
    val base = Seq((1L, Some(1.0)), (2L, None: Option[Double]),
      (3L, Some(3.0))).toDF("k", "b")
    def baseKeys(q: String): Seq[Long] =
      NestedExpr.query(base, q).select("k").as[Long].collect().toSeq.sorted
    assert(baseKeys("b == None").isEmpty)
    assert(baseKeys("b != None") == Seq(1L, 2L, 3L))
    assert(baseKeys("b in [1, None]") == Seq(1L))       // numpy: NaN∉
    assert(baseKeys("~(b in [1, None])") == Seq(2L, 3L))
    // element layer: comparison vs None drops EVERYTHING (Kleene even
    // for the string field); isin DOES match NA against None
    val child = Seq(
      (1L, Some(1.0), Some("a")), (1L, None: Option[Double],
        None: Option[String]), (1L, Some(3.0), Some("c")))
      .toDF("id", "x", "t")
    val nf = NestedOps.joinNested(Seq((1L, "r")).toDF("id", "tag"),
      child, Seq("id"), "n", "left")
    def kept(q: String): Long =
      NestedExpr.query(nf, q)
        .select(coalesce(sum(size($"n")), lit(0L))).as[Long].head()
    assert(kept("n.x == None") == 0L)
    assert(kept("n.x != None") == 0L)
    assert(kept("n.t != None") == 0L) // None forces Kleene past the
                                      // string 2-valued rule
    assert(kept("n.x in [1, None]") == 2L)   // 1.0 and the NA element
    assert(kept("~(n.x in [1, None])") == 1L) // 3.0
    assert(kept("n.x not in [1, None]") == 1L)
    // True/False literals parse (case-insensitive SQL booleans)
    val ev = NestedExpr.evalAssign(base, "r = True")
      .select("r").as[Boolean].collect().toSet
    assert(ev == Set(true))
  }

  test("r9s5 review second pass: walrus + non-identifier targets raise; " +
      "eval reductions skip literal NaN like pandas") {
    val base = Seq((1L, 4L), (2L, 8L)).toDF("k", "y")
    // python ast raises on all of these; before the guards each silently
    // executed as an assignment to the first identifier
    for (bad <- Seq("k := y", "k[0] = 5", "k, y = y, k", "k: int = 5"))
      intercept[IllegalArgumentException] {
        NestedExpr.evalAssign(base, bad)
      }
    // literal NaN: pandas mean/max are skipna=True; Spark orders NaN as
    // the largest double and poisons avg — the nanvl rewrite skips it
    val withNan = Seq(1.0, 3.0, Double.NaN).toDF("v")
    val m = NestedExpr.evalAssign(withNan, "r = v.mean()")
      .select("r").as[Double].collect().head
    assert(m == 2.0, s"mean should skip NaN: $m")
    val mx2 = NestedExpr.evalAssign(withNan, "r = v.max()")
      .select("r").as[Double].collect().head
    assert(mx2 == 3.0, s"max should skip NaN: $mx2")
  }

  test("element isna()/notna() treat a literal NaN as NA like pandas") {
    val df = Seq((1L, Seq(1.0, Double.NaN), Seq("p", "q")))
      .toDF("k", "xs", "ts")
      .select($"k", arrays_zip($"xs".as("x"), $"ts".as("t")).as("n"))
    // query drops elements; NaN must count as NA for x (floating) —
    // both elements survive for t (string, NULL-only semantics)
    val kept = NestedExpr.query(df, "n.x.notna()")
      .select(size($"n")).as[Int].collect().head
    assert(kept == 1, s"notna should drop the NaN element: $kept")
    val isnaKept = NestedExpr.query(df, "n.x.isna()")
      .select(transform($"n", s => s.getField("t")))
      .as[Seq[String]].collect().head
    assert(isnaKept == Seq("q"), s"isna should keep only the NaN row: $isnaKept")
  }

  test("% mod: python semantics (pmod) on both layers; nested layer is " +
      "OUR extension — the reference raises NotImplementedError there") {
    assert(elems("nested.t % 2 > 1") > 0)
    // base layer: the reference EVALUATES % with python modulo — the
    // divisor's sign wins (-7 % 3 = 2, 7 % -3 = -2, -7.5 % 3 = 1.5;
    // reference-executed 2026-08-15). SQL % would return -1/1/-1.5.
    val neg = Seq((1L, -7.0), (2L, 7.0), (3L, -7.5)).toDF("k", "x")
    val m3 = NestedExpr.evalAssign(neg, "m = x % 3")
      .orderBy("k").select("m").as[Double].collect().toSeq
    assert(m3 == Seq(2.0, 1.0, 1.5), s"python modulo diverged: $m3")
    val mneg = NestedExpr.evalAssign(neg, "m = x % -3")
      .orderBy("k").select("m").as[Double].collect().toSeq
    assert(mneg == Seq(-1.0, -2.0, -1.5), s"negative divisor diverged: $mneg")
  }

  test("evalAssign RHS accepts the extended forms (in-list, chained, ~)") {
    val a1 = NestedExpr.evalAssign(g55, "nested.is_r = nested.band in ['r']")
    val nR = a1.select(expr(
      "aggregate(transform(nested, e -> CASE WHEN e.is_r THEN 1 ELSE 0 END)," +
        " 0, (a, v) -> a + v)")).as[Int].collect().sum
    assert(nR == 10)
    val a2 = NestedExpr.evalAssign(g55, "nested.mid = 5 < nested.t < 10")
    val nMid = a2.select(expr(
      "aggregate(transform(nested, e -> CASE WHEN e.mid THEN 1 ELSE 0 END)," +
        " 0, (a, v) -> a + v)")).as[Int].collect().sum
    assert(nMid == 4)
  }

  test("chained-comparison rewrite ≡ composed conjunction on randomized " +
      "operator/operand draws") {
    val ops = Seq("<", "<=", ">", ">=", "==", "!=")
    val rnd = new scala.util.Random(7)
    (1 to 25).foreach { _ =>
      val o1 = ops(rnd.nextInt(ops.size)); val o2 = ops(rnd.nextInt(ops.size))
      val lo = rnd.nextInt(20); val hi = rnd.nextInt(20)
      val chained = s"$lo $o1 nested.t $o2 $hi"
      val composed = s"($lo $o1 nested.t) and (nested.t $o2 $hi)"
      assert(elems(chained) == elems(composed),
        s"chain mismatch for: $chained")
    }
    // chains inside parens compose with outer logic
    assert(elems("(2 < nested.t < 18) and nested.flux > 50") ==
      elems("(2 < nested.t) and (nested.t < 18) and nested.flux > 50"))
    // three-op chain
    assert(elems("0 < nested.t < 10 < nested.flux") ==
      elems("(0 < nested.t) and (nested.t < 10) and (10 < nested.flux)"))
  }

  test("rendered SQL: no literal damage, backticks preserved, base " +
      "comparisons get the pandas 2-valued wrap, element stay Kleene") {
    // r11 AST pipeline: the renderer must not damage literals or quoted
    // names, must wrap BASE-layer comparisons in coalesce(…, false|true)
    // (pandas float64-NaN semantics, the r9 differential-fuzzer finding),
    // and must leave ELEMENT-layer numeric comparisons unwrapped (Kleene).
    val bad = Seq((1L, 2.0, 3.0, "x")).toDF("a", "b", "t", "s")
      .withColumn("n/a", lit(1.0))
    assert(NestedExpr.renderedSql(bad, "b is not null") == "`b` is not null")
    assert(NestedExpr.renderedSql(bad, "abs(t - 10) + 2.5e2") ==
      "abs(`t` - 10) + 2.5e2")
    // non-identifier column names keep their backticks
    assert(NestedExpr.renderedSql(bad, "`n/a` + 1") == "`n/a` + 1")
    // string literals pass through verbatim, operators inside included
    assert(NestedExpr.renderedSql(bad, "s == 'a**b'") ==
      "coalesce((`s` == 'a**b'), false)")
    // base-layer comparisons: exact wrapped form, literals untouched
    assert(NestedExpr.renderedSql(bad, "a > 2") ==
      "coalesce((`a` > 2), false)")
    assert(NestedExpr.renderedSql(bad, "(a % 2) == 1").contains("pmod") &&
      NestedExpr.renderedSql(bad, "(a % 2) == 1").startsWith("coalesce(("))
    assert(NestedExpr.renderedSql(bad, "a != 3") ==
      "coalesce((`a` != 3), true)")
    assert(NestedExpr.renderedSql(bad, "a in (1, 2, 3)") ==
      "coalesce((`a` in (1, 2, 3)), false)")
    // element-layer numeric comparison: unwrapped (Kleene), lambda ref
    val nf = Seq((0L, Seq(1.0, 2.0))).toDF("id", "v").fromLists(Seq("v"), "n")
    assert(NestedExpr.renderedSql(nf, "n.v > 10") == "__x.`v` > 10")
  }

  test("preprocessing is string-literal-safe and keeps sci-notation") {
    // operator characters inside string literals survive untouched
    val df = Seq((0L, Seq("a**b", "x"))).toDF("id", "s")
      .fromLists(Seq("s"), "n")
    val r = NestedExpr.query(df, "n.s == 'a**b'")
    assert(r.select(size($"n")).as[Int].collect().head == 1)
    assert(elems("nested.t > 1e1") == 13) // 1e1 = 10
  }

  test("r11: eval(inplace=false) freezes the NESTED layer per-line — " +
      "modified fields read pre-eval values, created fields raise, base " +
      "columns stay sequential (reference-executed 2026-08-15)") {
    import graft.nested.NestedExpr.{eval => nev}
    def mk() = Seq((0L, 1.0, Seq(3.0, 8.0)), (1L, 2.0, Seq(5.0, 2.0)),
        (2L, 3.0, Seq(7.0, 1.0)))
      .toDF("id", "a", "v").fromLists(Seq("v"), "n")
      .withColumn("n", expr("transform(n, p -> named_struct('x', p.v))"))
    // modified nested field: later line reads the FROZEN x
    val r1 = nev(mk(), "n.x = n.x + 100\nn.y = n.x * 2", inplace = false)
      .orderBy("id")
    val row0 = r1.select(expr("transform(n, p -> p.y)")).as[Seq[Double]]
      .collect().head
    assert(row0 == Seq(6.0, 16.0), s"frozen read diverged: $row0")
    val x0 = r1.select(expr("transform(n, p -> p.x)")).as[Seq[Double]]
      .collect().head
    assert(x0 == Seq(103.0, 108.0), s"write lost: $x0")
    // inplace=true default stays sequential (GH#159 contract)
    val seq0 = nev(mk(), "n.x = n.x + 100\nn.y = n.x * 2")
      .orderBy("id").select(expr("transform(n, p -> p.y)"))
      .as[Seq[Double]].collect().head
    assert(seq0 == Seq(206.0, 216.0), s"sequential mode broke: $seq0")
    // double write: second RHS reads frozen, second write wins
    val dw = nev(mk(), "n.x = n.x + 100\nn.x = n.x * 2", inplace = false)
      .orderBy("id").select(expr("transform(n, p -> p.x)"))
      .as[Seq[Double]].collect().head
    assert(dw == Seq(6.0, 16.0), s"double write diverged: $dw")
    // created nested field raises on read (ref: AttributeError)
    intercept[Exception] {
      nev(mk(), "n.b = n.x + 1\nn.c = n.b * 2", inplace = false).collect()
    }
    // base columns sequential in BOTH modes
    val bs = nev(mk(), "a = a + 10\nb = a * 2", inplace = false)
      .orderBy("id").select("b").as[Double].collect().toSeq
    assert(bs == Seq(22.0, 24.0, 26.0), s"base seq diverged: $bs")
    // new-nest fields ACCUMULATE across lines ([4,9] / [6,16] on row 0)
    val nn = nev(mk(), "p.a = n.x + 1\np.b = n.x * 2", inplace = false)
      .orderBy("id")
    val pa = nn.select(expr("transform(p, q -> q.a)")).as[Seq[Double]]
      .collect().head
    val pb = nn.select(expr("transform(p, q -> q.b)")).as[Seq[Double]]
      .collect().head
    assert(pa == Seq(4.0, 9.0) && pb == Seq(6.0, 16.0),
      s"new-nest accumulation diverged: $pa / $pb")
    // reductions freeze too: post-write mean equals pre-write mean
    val rf = nev(mk(), "b = a + n.x.mean()\nn.x = n.x - 100\n" +
        "c = a + n.x.mean()", inplace = false).orderBy("id")
    val (b, c) = (rf.select("b").as[Double].collect().toSeq,
      rf.select("c").as[Double].collect().toSeq)
    assert(b == c, s"frozen reduction diverged: $b vs $c")
  }

  test("r11: .str.cat() is a GLOBAL reduction — flat series joined in " +
      "index order, NA dropped (or na_rep-substituted), scalar broadcast " +
      "(reference-executed 2026-08-15)") {
    import graft.nested.NestedExpr.evalAssign
    val df = Seq((0L, Option("ab"), Seq[Option[String]](Some("x"), Some("y"))),
        (1L, Option.empty[String], Seq[Option[String]](None)),
        (2L, Option("cd"), Seq[Option[String]](Some("z"))))
      .toDF("id", "s", "v").fromLists(Seq("v"), "m")
      .withColumn("m", expr("transform(m, p -> named_struct('t', p.v))"))
    val base = evalAssign(df, "c = s.str.cat()")
      .select("c").as[String].collect().toSet
    assert(base == Set("abcd"), s"base cat diverged: $base")
    val sep = evalAssign(df, "c = m.t.str.cat(sep='-')")
      .select("c").as[String].collect().toSet
    assert(sep == Set("x-y-z"), s"element cat diverged: $sep")
    val narep = evalAssign(df, "c = s.str.cat(sep='-', na_rep='NA')")
      .select("c").as[String].collect().toSet
    assert(narep == Set("ab-NA-cd"), s"na_rep cat diverged: $narep")
    // pandas `others` (positional) has no global analog — loud raise
    intercept[IllegalArgumentException] {
      evalAssign(df, "c = s.str.cat('zzz')")
    }
  }

  test("r11: string `+` is concat (element + base), every other arith op " +
      "on strings raises; division/modulo by zero follow pandas " +
      "inf/NaN semantics (reference-executed 2026-08-15)") {
    import graft.nested.NestedExpr.{evalAssign, query => nq}
    val base = Seq((1L, 1L, 2.0, Option("ab")), (2L, 2L, 4.0, Option("cd")),
        (3L, 0L, 0.0, Option.empty[String]))
      .toDF("k", "a", "b", "s")
    val nf = Seq(
        (0L, Seq(("u", "A", 1.0)), 0),
        (1L, Seq(("v", "B", 2.0)), 0),
        (2L, Seq((null.asInstanceOf[String], "D", 3.0)), 0))
      .toDF("k", "v", "z")
      .withColumn("n", expr(
        "transform(v, p -> named_struct('t', p._1, 'u', p._2, 'x', p._3))"))
      .drop("v", "z")
    // element concat: literal suffix, literal prefix, field+field
    def w(e: String) = evalAssign(nf, e).orderBy("k")
      .select(expr("transform(n, p -> p.w)[0]")).as[String].collect().toSeq
    assert(w("n.w = n.t + '!'") == Seq("u!", "v!", null))
    assert(w("n.w = 'pre' + n.t") == Seq("preu", "prev", null))
    assert(w("n.w = n.t + n.u") == Seq("uA", "vB", null)) // NULL-strict
    // base concat (the reference's own comparison path needs numexpr;
    // eval works and concat matches)
    val ss = evalAssign(base, "r = s + s").orderBy("k")
      .select("r").as[String].collect().toSeq
    assert(ss == Seq("abab", "cdcd", null))
    // the + RESULT's NA regime is KLEENE — unlike .str string results
    // (probe: ~(n.t + '!' == 'u!') drops the NA element)
    val kept = nq(nf, "~(n.t + '!' == 'u!')").orderBy("k")
      .select(coalesce(size(col("n")), lit(-1))).as[Int].collect().toSeq
    assert(kept == Seq(-1, 1, -1), s"concat regime diverged: $kept")
    // arith on strings raises (pandas TypeError; the old pipeline
    // silently rendered a null-casting SQL expression)
    for (bad <- Seq("r = s * 2", "r = n.t * 2", "r = b * s",
        "r = n.x - 'a'", "r = s + 1", "r = s + b"))
      intercept[IllegalArgumentException] { evalAssign(
        if (bad.contains("n.")) nf
          .withColumn("b", lit(1.0)).withColumn("s", lit("q")) else base,
        bad) }
    // division by a zero-valued COLUMN: pandas inf/NaN, not SQL NULL
    def d(e: String) = evalAssign(base, e).orderBy("k")
      .select("r").as[Double].collect().toSeq
    val dv = d("r = b / (a - a)")
    assert(dv(0).isPosInfinity && dv(1).isPosInfinity && dv(2).isNaN,
      s"div-by-zero diverged: $dv")
    val dz = d("r = b / 0")
    assert(dz(0).isPosInfinity && dz(1).isPosInfinity && dz(2).isNaN,
      s"div-by-literal-zero diverged: $dz")
    val fz = d("r = a // 0")
    assert(fz(0).isPosInfinity && fz(1).isPosInfinity && fz(2).isNaN,
      s"floordiv-by-zero diverged: $fz")
    val mz = d("r = a % 0")
    assert(mz.forall(_.isNaN), s"mod-by-zero diverged: $mz")
    // negative dividend: -b / 0 -> -inf (sign of the dividend)
    val nz = evalAssign(base, "r = (0 - b) / (a - a)").orderBy("k")
      .select("r").as[Double].collect().toSeq
    assert(nz(0).isNegInfinity && nz(1).isNegInfinity && nz(2).isNaN,
      s"negative div-by-zero diverged: $nz")
  }
}

package graft

import graft.expressions.TextWrap
import graft.nested.{NestedExpr, syntax}
import syntax._
import org.apache.spark.sql.DataFrame

/** Differential replay of tools/wrap_fuzz.py: 400 adversarial texts
  * (hyphen chains, em-dashes, unbreakable long words, column-aware tabs,
  * NBSP-glued words, unicode letters) × widths 1-13 with goldens from
  * CPython textwrap — the exact library pandas Series.str.wrap defers to.
  * Plus end-to-end dialect coverage (both layers, codegen path) and the
  * raise contracts.
  */
class WrapFuzzSpec extends SparkSpec {
  import spark.implicits._

  test("wrap kernel matches CPython textwrap on the committed corpus") {
    val cases = FuzzHarness.loadCases("/fuzz/wrap_fuzz.jsonl")
    assert(cases.size >= 400, s"corpus too small: ${cases.size}")
    val failures = cases.flatMap { c =>
      val text = c.get("text").asText()
      val width = c.get("width").asInt()
      val expect = c.get("expect").asText()
      val got = TextWrap.wrap(text, width)
      if (got != expect)
        Some(s"id=${c.get("id").asInt()} width=$width text=${text.take(60)}" +
          s" expected ${expect.replace("\n", "\\n")} got " +
          got.replace("\n", "\\n"))
      else None
    }
    assert(failures.isEmpty, failures.take(5).mkString("\n"))
  }

  private lazy val df: DataFrame =
    Seq((0L, Seq("hello world foo", null, "superlongunbreakableword",
      "a-very-long-hyphenated-word here", "", "  pad  ")))
      .toDF("id", "s").fromLists(Seq("s"), "n")

  test("element-layer .str.wrap through the dialect (codegen path)") {
    val r = NestedExpr.evalSelect(df, "n.s.str.wrap(6)", "r")
      .select($"r").collect().head.getSeq[String](0)
    // goldens: pandas Series.str.wrap(6) on the same inputs
    assert(r == Seq("hello\nworld\nfoo", null,
      "superl\nongunb\nreakab\nleword",
      "a-\nvery-\nlong-h\nyphena\nted-\nword\nhere", "", "  pad"))
  }

  test("base-layer .str.wrap + downstream chaining") {
    val d2 = Seq((1L, "don't break apostrophes-now"), (2L, null))
      .toDF("id", "t")
    val r = NestedExpr.evalSelect(d2, "t.str.wrap(9).str.len()", "r")
      .select($"r").collect().map(row =>
        if (row.isNullAt(0)) null else row.getInt(0))
    // 'don't\nbreak apo\nstrophes-\nnow' → 29 chars
    assert(r.toSeq == Seq(29, null))
  }

  test("wrap rejects non-default textwrap knobs and bad widths") {
    val e1 = intercept[IllegalArgumentException] {
      NestedExpr.evalSelect(df, "n.s.str.wrap(6, drop_whitespace=False)", "r")
    }
    assert(e1.getMessage.contains("drop_whitespace"))
    val e2 = intercept[IllegalArgumentException] {
      NestedExpr.evalSelect(df, "n.s.str.wrap(0)", "r")
    }
    assert(e2.getMessage.contains("positive"))
    intercept[IllegalArgumentException] {
      NestedExpr.evalSelect(df, "n.s.str.wrap()", "r")
    }
  }

  test("wrap(width=) keyword form and NA-regime: string-result equality") {
    val r = NestedExpr.evalSelect(df, "n.s.str.wrap(width=5)", "r")
      .select($"r").collect().head.getSeq[String](0)
    assert(r.head == "hello\nworld\nfoo")
    // string-result method ⇒ 2-valued equality (NA survives !=)
    val kept = NestedExpr.query(df, "n.s.str.wrap(5) != 'hello'")
      .select($"n").collect().head.getSeq[org.apache.spark.sql.Row](0)
    assert(kept.exists(_.isNullAt(0)), "NA element must survive != " +
      "(2-valued string-result regime)")
  }
}

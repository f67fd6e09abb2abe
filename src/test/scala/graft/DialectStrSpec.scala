package graft

import graft.nested.{NestedExpr, syntax}
import syntax._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** `.str` long-tail methods (slice / split+get / get / zfill / pad /
  * center / count / find / rjust / ljust) — value-level goldens computed
  * with pandas 2.2.2 `Series.str` on the literal inputs below (the
  * reference reaches the full pandas Series.str surface through its eval
  * resolvers, reference expr.py:24-46).
  *
  * Every expected list below is the verbatim pandas output; `null` where
  * pandas produced NaN/None.
  */
class DialectStrSpec extends SparkSpec {
  import spark.implicits._

  // pandas input: ['ab','ABCDE','a1','',' a b ','-1','+2','x,y,z',
  //                'a,,b','Hello World','½','a|b', None]
  private val inputs: Seq[String] = Seq(
    "ab", "ABCDE", "a1", "", " a b ", "-1", "+2", "x,y,z",
    "a,,b", "Hello World", "½", "a|b", null)

  private lazy val df: DataFrame =
    Seq((0L, inputs)).toDF("id", "s").fromLists(Seq("s"), "n")

  /** Element-level values of `exprStr` over the nest, in input order. */
  private def vals(exprStr: String): Seq[Any] = {
    val r = NestedExpr.evalSelect(df, exprStr, "r")
      .select($"r").collect().head.getSeq[Any](0)
    r
  }
  private def strs(exprStr: String): Seq[String] =
    vals(exprStr).map(v => if (v == null) null else v.toString)

  test("rjust/ljust never truncate strings >= width (pandas semantics)") {
    assert(strs("n.s.str.rjust(3, '_')") == Seq(
      "_ab", "ABCDE", "_a1", "___", " a b ", "_-1", "_+2", "x,y,z",
      "a,,b", "Hello World", "__½", "a|b", null))
    assert(strs("n.s.str.ljust(3, '_')") == Seq(
      "ab_", "ABCDE", "a1_", "___", " a b ", "-1_", "+2_", "x,y,z",
      "a,,b", "Hello World", "½__", "a|b", null))
    // default fill is a single space
    assert(strs("n.s.str.rjust(3)").head == " ab")
  }

  test("zfill pads after a leading sign, never truncates") {
    assert(strs("n.s.str.zfill(4)") == Seq(
      "00ab", "ABCDE", "00a1", "0000", " a b ", "-001", "+002", "x,y,z",
      "a,,b", "Hello World", "000½", "0a|b", null))
  }

  test("pad side=both and center (python center: extra char on the right)") {
    assert(strs("n.s.str.pad(5, 'both', '*')") == Seq(
      "**ab*", "ABCDE", "**a1*", "*****", " a b ", "**-1*", "**+2*",
      "x,y,z", "*a,,b", "Hello World", "**½**", "*a|b*", null))
    assert(strs("n.s.str.center(4, '-')") == Seq(
      "-ab-", "ABCDE", "-a1-", "----", " a b ", "--1-", "-+2-", "x,y,z",
      "a,,b", "Hello World", "-½--", "a|b-", null))
    // keyword form
    assert(strs("n.s.str.pad(5, side='both', fillchar='*')").head == "**ab*")
    assert(strs("n.s.str.pad(3)").head == " ab")
  }

  test("count is regex, non-overlapping (pandas str.count)") {
    assert(vals("n.s.str.count('a')") == Seq(
      1, 0, 1, 0, 1, 0, 0, 0, 1, 0, 0, 1, null))
    assert(vals("n.s.str.count('[ab]')") == Seq(
      2, 0, 1, 0, 2, 0, 0, 0, 2, 0, 0, 2, null))
  }

  test("find: lowest index of literal sub, -1 when absent, 0 for ''") {
    assert(vals("n.s.str.find('b')") == Seq(
      1, -1, -1, -1, 3, -1, -1, -1, 3, -1, -1, 2, null))
    assert(vals("n.s.str.find('')") == Seq(
      0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, null))
  }

  test("get: positive and negative char indexing, NULL out of bounds") {
    assert(strs("n.s.str.get(1)") == Seq(
      "b", "B", "1", null, "a", "1", "2", ",", ",", "e", null, "|", null))
    assert(strs("n.s.str.get(-1)") == Seq(
      "b", "E", "1", null, " ", "1", "2", "z", "b", "d", "½", "b",
      null))
    assert(strs("n.s.str.get(-6)") == Seq(
      null, null, null, null, null, null, null, null, null, " ", null,
      null, null))
  }

  test("slice: python [start:stop] normalization incl. negatives") {
    assert(strs("n.s.str.slice(1, 3)") == Seq(
      "b", "BC", "1", "", "a ", "1", "2", ",y", ",,", "el", "", "|b",
      null))
    assert(strs("n.s.str.slice(-3)") == Seq(
      "ab", "CDE", "a1", "", " b ", "-1", "+2", "y,z", ",,b", "rld",
      "½", "a|b", null))
    assert(strs("n.s.str.slice(stop=-1)") == Seq(
      "a", "ABCD", "a", "", " a b", "-", "+", "x,y,", "a,,",
      "Hello Worl", "", "a|", null))
    assert(strs("n.s.str.slice(1)") == Seq(
      "b", "BCDE", "1", "", "a b ", "1", "2", ",y,z", ",,b",
      "ello World", "", "|b", null))
    // positive step gathers every step-th char (pandas golden, r10);
    // negative steps stay a documented raise
    assert(strs("n.s.str.slice(1, 5, 2)") == Seq(
      "b", "BD", "1", "", "ab", "1", "2", ",,", ",b", "el", "", "|", null))
    intercept[IllegalArgumentException] { vals("n.s.str.slice(1, 5, -1)") }
  }

  test("split: literal 1-char pat (regex-special escaped) and chained get/len") {
    // split(',').get(0) / .get(-1) / .len() — pandas goldens
    assert(strs("n.s.str.split(',').str.get(0)") == Seq(
      "ab", "ABCDE", "a1", "", " a b ", "-1", "+2", "x", "a",
      "Hello World", "½", "a|b", null))
    assert(strs("n.s.str.split(',').str.get(-1)") == Seq(
      "ab", "ABCDE", "a1", "", " a b ", "-1", "+2", "z", "b",
      "Hello World", "½", "a|b", null))
    assert(vals("n.s.str.split(',').str.len()") == Seq(
      1, 1, 1, 1, 1, 1, 1, 3, 3, 1, 1, 1, null))
    // '|' is a regex special — must be treated literally (pandas 1-char
    // pat rule): 'a|b'.split('|') == ['a','b'], everything else 1 piece
    assert(vals("n.s.str.split('|').str.len()") == Seq(
      1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 2, null))
  }

  test("split(): python whitespace split — empties dropped") {
    assert(vals("n.s.str.split().str.len()") == Seq(
      1, 1, 1, 0, 2, 1, 1, 1, 1, 2, 1, 1, null))
    assert(strs("n.s.str.split().str.get(0)") == Seq(
      "ab", "ABCDE", "a1", null, "a", "-1", "+2", "x,y,z", "a,,b",
      "Hello", "½", "a|b", null))
  }

  test("isspace accepts unicode whitespace (NBSP), like python") {
    val d2 = Seq((0L, Seq(" ", "\u00A0", "a", ""))).toDF("id", "s")
      .fromLists(Seq("s"), "n")
    val r = NestedExpr.evalSelect(d2, "n.s.str.isspace()", "r")
      .select($"r").collect().head.getSeq[Any](0)
    assert(r == Seq(true, true, false, false))
  }

  test("unsupported chains and methods raise with clear messages") {
    val ex = intercept[IllegalArgumentException] {
      vals("n.s.str.split(',').str.upper()")
    }
    assert(ex.getMessage.contains("after .str.split"))
    val ex2 = intercept[IllegalArgumentException] {
      vals("n.s.str.translate()")
    }
    assert(ex2.getMessage.contains("not supported"))
  }

  test("removeprefix/removesuffix: at most one boundary occurrence " +
      "(python 3.9 semantics)") {
    assert(strs("n.s.str.removeprefix('a')") == Seq(
      "b", "ABCDE", "1", "", " a b ", "-1", "+2", "x,y,z", ",,b",
      "Hello World", "½", "|b", null))
    assert(strs("n.s.str.removesuffix('b')") == Seq(
      "a", "ABCDE", "a1", "", " a b ", "-1", "+2", "x,y,z", "a,,",
      "Hello World", "½", "a|", null))
  }

  test("repeat and swapcase (pandas goldens)") {
    assert(strs("n.s.str.repeat(2)") == Seq(
      "abab", "ABCDEABCDE", "a1a1", "", " a b  a b ", "-1-1", "+2+2",
      "x,y,zx,y,z", "a,,ba,,b", "Hello WorldHello World", "½½",
      "a|ba|b", null))
    assert(strs("n.s.str.swapcase()") == Seq(
      "AB", "abcde", "A1", "", " A B ", "-1", "+2", "X,Y,Z", "A,,B",
      "hELLO wORLD", "½", "A|B", null))
  }

  test("extract: first-match single group, NULL when no match " +
      "(pandas extract expand=False)") {
    assert(strs("n.s.str.extract('([A-Z]+)')") == Seq(
      null, "ABCDE", null, null, null, null, null, null, null, "H",
      null, null, null))
    assert(strs("n.s.str.extract('(\\\\d)')") == Seq(
      null, null, "1", null, null, "1", "2", null, null, null, null,
      null, null))
  }

  test("marker text inside a user STRING LITERAL is data, not a call") {
    // a literal containing the internal marker name must pass through
    // the rewriter untouched (quote-aware marker scan)
    val r = strs("n.s.str.replace('ab', '__GRAFTSTR_upper(x)')")
    assert(r.head == "__GRAFTSTR_upper(x)")
    assert(r(1) == "ABCDE") // untouched non-match
  }

  test("r9 long-tail: findall / match / fullmatch / rsplit / " +
      "slice_replace / title (pandas goldens)") {
    def lists(e: String): Seq[Seq[String]] = vals(e).map {
      case null => null
      case s: scala.collection.Seq[_] => s.map(_.asInstanceOf[String]).toSeq
    }
    assert(lists("n.s.str.findall('[ab]')") == Seq(
      Seq("a", "b"), Seq(), Seq("a"), Seq(), Seq("a", "b"), Seq(), Seq(),
      Seq(), Seq("a", "b"), Seq(), Seq(), Seq("a", "b"), null))
    assert(vals("n.s.str.match('[Aa]')") == Seq(
      true, true, true, false, false, false, false, false, true, false,
      false, true, null))
    assert(vals("n.s.str.fullmatch('[A-Za-z ]*')") == Seq(
      true, true, false, true, true, false, false, false, false, true,
      false, false, null))
    assert(lists("n.s.str.rsplit(',')") == Seq(
      Seq("ab"), Seq("ABCDE"), Seq("a1"), Seq(""), Seq(" a b "),
      Seq("-1"), Seq("+2"), Seq("x", "y", "z"), Seq("a", "", "b"),
      Seq("Hello World"), Seq("½"), Seq("a|b"), null))
    assert(strs("n.s.str.slice_replace(1, 3, 'ZZ')") == Seq(
      "aZZ", "AZZDE", "aZZ", "ZZ", " ZZb ", "-ZZ", "+ZZ", "xZZ,z",
      "aZZb", "HZZlo World", "½ZZ", "aZZ", null))
    // title breaks words on EVERY non-letter, unlike initcap
    assert(strs("n.s.str.title()") == Seq(
      "Ab", "Abcde", "A1", "", " A B ", "-1", "+2", "X,Y,Z", "A,,B",
      "Hello World", "½", "A|B", null))
    // rsplit with maxsplit raises loudly (right-counted maxsplit has no
    // Spark analog); partition/cat/translate/wrap stay documented raises
    intercept[IllegalArgumentException] {
      vals("n.s.str.rsplit(',', 1)")
    }
    intercept[IllegalArgumentException] { vals("n.s.str.partition(',')") }
  }

  test("existing methods still work through the marker path (filters)") {
    val g = df
    def n(q: String): Int =
      NestedExpr.query(g, q).select(coalesce(sum(size($"n")), lit(0L)))
        .as[Long].collect().head.toInt
    assert(n("n.s.str.startswith('a')") == 4) // ab, a1, a,,b, a|b
    assert(n("n.s.str.contains(',')") == 2)
    assert(n("n.s.str.len() == 2") == 4)      // ab, a1, -1, +2
    assert(n("n.s.str.upper() == 'AB'") == 1)
  }
}

package graft

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import graft.nested.NestedExpr

import scala.jdk.CollectionConverters._

/** Differential fuzz replay: every case in
  * src/test/resources/fuzz/dialect_fuzz.jsonl is a random dialect program
  * whose golden was COMPUTED by executing the reference itself in-sandbox
  * (tools/dialect_fuzz.py via tools/ref_harness.py module stubs) — the
  * round-8 technique that exposed a 5-round-old hand-ported wrong golden,
  * generalized. Regenerate with `python3 tools/dialect_fuzz.py`.
  *
  * Comparison semantics (mirrors the generator's encoding):
  *  - pandas NaN/NA and SQL NULL are both "missing" (encoded null);
  *  - numbers compare with 1e-9 abs+rel tolerance, int-vs-double freely;
  *  - nest cells align by field NAME against the recorded field list.
  */
class DialectFuzzSpec extends SparkSpec {
  import FuzzHarness._

  private def compareSeries(df: DataFrame, expect: JsonNode): Option[String] = {
    val got = df.orderBy(col("k")).collect()
    if (expect.has("series")) {
      val exp = expect.get("series").elements().asScala.toVector
      if (got.length != exp.length)
        return Some(s"series length: got ${got.length} expected ${exp.length}")
      for ((row, i) <- got.zipWithIndex) {
        val v = row.get(row.fieldIndex("__res"))
        if (!scalarMatches(v, exp(i)))
          return Some(s"series[$i]: got $v expected ${exp(i)}")
      }
      None
    } else {
      val exp = expect.get("cells").elements().asScala.toVector
      if (got.length != exp.length)
        return Some(s"cells length: got ${got.length} expected ${exp.length}")
      for ((row, i) <- got.zipWithIndex) {
        val gi = row.fieldIndex("__res")
        val gotCell = if (row.isNullAt(gi)) null else row.getSeq[Any](gi)
        val expCell = exp(i)
        if (gotCell == null || expCell.isNull) {
          if (!(gotCell == null && expCell.isNull))
            return Some(s"cells[$i] null-ness: got $gotCell expected $expCell")
        } else {
          val expEls = expCell.elements().asScala.toVector
          if (gotCell.length != expEls.length)
            return Some(s"cells[$i] length: got ${gotCell.length} expected ${expEls.length}")
          for ((v, j) <- gotCell.zipWithIndex)
            if (!scalarMatches(v, expEls(j)))
              return Some(s"cells[$i][$j]: got $v expected ${expEls(j)}")
        }
      }
      None
    }
  }

  test("differential fuzz corpus replays green against the executed reference") {
    replay("/fuzz/dialect_fuzz.jsonl", minCases = 1000)
  }

  test(".dt fuzz corpus replays green against the executed reference") {
    // datetime columns on both layers: attrs / strftime / normalize /
    // floor / boolean-attr predicates / direct ts-vs-string comparisons
    // (tools/dt_fuzz.py; NaT semantics probe-pinned there)
    replay("/fuzz/dt_fuzz.jsonl", minCases = 400)
  }

  private def replay(resource: String, minCases: Int): Unit = {
    val cases = loadCases(resource)
    assert(cases.length >= minCases,
      s"corpus has ${cases.length} cases; want >= $minCases")
    var failures = List.empty[String]
    var ran = 0
    for (c <- cases) {
      val id = c.get("id").asInt()
      val kind = c.get("kind").asText()
      val text = c.get("text").asText()
      val df = buildFrame(spark, c.get("frame"))
      val expectError = c.has("expect_error") && c.get("expect_error").asBoolean()
      val diff =
        if (kind == "eval_both") {
          // r12 cross-MODE differential: one program, two goldens — the
          // sequential (inplace=true) result AND the frozen default. A
          // frozen_error golden means the reference's resolver RAISES
          // (created-field read against the pre-eval frame): graft's
          // frozen mode must raise too, while sequential still matches.
          val seqDiff =
            try compareFrame(NestedExpr.eval(df, text), c.get("expect_seq"))
            catch { case e: Throwable =>
              Some(s"seq THREW ${e.getClass.getSimpleName}: " +
                s"${Option(e.getMessage).getOrElse("").take(160)}") }
          val frozenDiff =
            if (c.has("frozen_error")) {
              try {
                NestedExpr.eval(df, text, inplace = false).collect()
                Some(s"frozen mode must RAISE " +
                  s"(${c.get("frozen_error").asText()}); graft accepted")
              } catch {
                // r12 review: accept ONLY the deliberate created-field
                // resolution errors, not any engine crash — an unrelated
                // parse/analysis bug must FAIL this case, not pass as
                // "raised like the reference". Two legitimate shapes:
                // a created NEST read ("Unresolvable column path") and a
                // created FIELD on an existing nest (FIELD_NOT_FOUND
                // resolving against the frozen original struct).
                case e: IllegalArgumentException
                  if Option(e.getMessage).exists(
                    _.contains("Unresolvable column path")) => None
                case e: org.apache.spark.sql.AnalysisException
                  if e.getErrorClass == "FIELD_NOT_FOUND" => None
                case e: Exception =>
                  Some(s"frozen raise has the wrong shape: " +
                    s"${e.getClass.getSimpleName}: " +
                    s"${Option(e.getMessage).getOrElse("").take(140)}")
              }
            } else
              try compareFrame(NestedExpr.eval(df, text, inplace = false),
                c.get("expect_frozen"))
              catch { case e: Throwable =>
                Some(s"frozen THREW ${e.getClass.getSimpleName}: " +
                  s"${Option(e.getMessage).getOrElse("").take(160)}") }
          (seqDiff, frozenDiff) match {
            case (None, None) => None
            case (a, b) => Some(Seq(a.map("[seq] " + _),
              b.map("[frozen] " + _)).flatten.mkString("; "))
          }
        } else if (expectError) {
          // ERROR PARITY: the reference rejects this program for a
          // semantic reason (layer mixing / two nests) — graft must too
          try {
            NestedExpr.query(df, text).collect()
            Some("reference REJECTS this program; graft accepted it")
          } catch { case _: Exception => None }
        } else try {
          val out = kind match {
            case "query" => NestedExpr.query(df, text)
            case "eval" => NestedExpr.eval(df, text)
            // the reference's DEFAULT mode: nested layer frozen per-line
            case "eval_frozen" =>
              NestedExpr.eval(df, text, inplace = false)
            case "eval_select" => NestedExpr.evalSelect(df, text, "__res")
          }
          if (kind == "eval_select") compareSeries(out, c.get("expect"))
          else compareFrame(out, c.get("expect"))
        } catch {
          case e: Throwable =>
            Some(s"ENGINE THREW ${e.getClass.getSimpleName}: " +
              s"${Option(e.getMessage).getOrElse("").take(200)}")
        }
      ran += 1
      diff.foreach(d => failures ::= s"case $id [$kind] `$text`: $d")
    }
    if (failures.nonEmpty) {
      val msg = s"${failures.length}/$ran fuzz cases diverged:\n" +
        failures.reverse.take(25).mkString("\n")
      fail(msg)
    }
  }
}

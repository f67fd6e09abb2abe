package graft

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types._
import graft.operators.Joins

import scala.jdk.CollectionConverters._

/** As-of-join differential fuzz (r9): 400 random keyed time series
  * joined through the EXECUTED pandas.merge_asof (tools/asof_fuzz.py)
  * across direction × tolerance × by × duplicate-ts × empty-right
  * shapes, replayed through [[Joins.asofJoinBy]] with the documented
  * `rightTieBreak` ordinal for pandas' dup-ts pick-last/pick-first.
  * The battery's q_asof_* oracles replay through DuckDB's native ASOF;
  * this corpus pins the pandas clauses DuckDB can't express (per-arm
  * tolerance, nearest equal-distance tie, dup-ts winner).
  * Regenerate with `python3 tools/asof_fuzz.py`. */
class AsofFuzzSpec extends SparkSpec {
  import FuzzHarness._

  private def longsOf(n: JsonNode, f: String): Vector[Long] =
    n.get(f).elements().asScala.map(_.asLong()).toVector

  private def buildSide(frame: JsonNode, cols: Seq[(String, DataType)])
  : DataFrame = {
    val vecs = cols.map { case (c, _) =>
      frame.get(c).elements().asScala.toVector }
    val n = if (vecs.isEmpty) 0 else vecs.head.length
    val rows = (0 until n).map { i =>
      Row.fromSeq(cols.zipWithIndex.map { case ((_, t), j) =>
        val v = vecs(j)(i)
        if (v == null || v.isNull) null
        else t match {
          case LongType   => v.asLong()
          case DoubleType => v.asDouble()
        }
      })
    }
    spark.createDataFrame(rows.asJava, StructType(cols.map {
      case (c, t) => StructField(c, t, nullable = true) }.toArray))
  }

  test("asof fuzz corpus replays green against executed pandas merge_asof") {
    val cases = loadCases("/fuzz/asof_fuzz.jsonl")
    assert(cases.length >= 300, s"corpus has ${cases.length} cases")
    var failures = List.empty[String]
    for (c <- cases) {
      val id = c.get("id").asInt()
      val args = c.get("args")
      val by = args.get("by").asBoolean()
      val direction = args.get("direction").asText()
      val tolerance = Option(args.get("tolerance")).filterNot(_.isNull)
        .map(_.asLong())
      val left0 = buildSide(c.get("left"), Seq(
        "ts" -> LongType, "g" -> LongType, "uid" -> LongType))
      val right0 = buildSide(c.get("right"), Seq(
        "ts" -> LongType, "g" -> LongType, "pos" -> LongType,
        "rv" -> DoubleType))
        .withColumn("rts", col("ts"))
      // no-by: constant key on both sides (asofJoinBy requires >= 1 key)
      val (left, right) =
        if (by) (left0, right0)
        else (left0.withColumn("g", lit(0L)), right0.withColumn("g", lit(0L)))
      val diff =
        try {
          val res = Joins.asofJoinBy(left, right, Seq("g"), "ts",
            rightPrefix = "r_", rightTieBreak = Seq("pos"),
            direction = direction, tolerance = tolerance)
          val got = res.collect().map { r =>
            r.getAs[Long]("uid") -> (
              Option(r.getAs[Any]("r_rts")),
              Option(r.getAs[Any]("r_rv")),
              Option(r.getAs[Any]("r_pos")))
          }.toMap
          val expect = c.get("expect")
          val uids = longsOf(c.get("left"), "uid")
          if (got.size != uids.length)
            Some(s"row count: got ${got.size} expected ${uids.length}")
          else uids.flatMap { uid =>
            val exp = expect.get(uid.toString)
            got.get(uid) match {
              case None => Some(s"uid=$uid missing from output")
              case Some((rts, rv, pos)) =>
                val expRts = exp.get(0); val expRv = exp.get(1)
                val expPos = exp.get(2)
                if (!scalarMatches(rts.orNull, expRts))
                  Some(s"uid=$uid r_rts: got $rts expected $expRts")
                else if (!scalarMatches(rv.orNull, expRv))
                  Some(s"uid=$uid r_rv: got $rv expected $expRv")
                else if (!scalarMatches(pos.orNull, expPos))
                  Some(s"uid=$uid r_pos: got $pos expected $expPos")
                else None
            }
          }.headOption
        } catch {
          case e: Throwable =>
            Some(s"ENGINE THREW ${e.getClass.getSimpleName}: " +
              s"${Option(e.getMessage).getOrElse("").take(200)}")
        }
      diff.foreach(d => failures ::= s"case $id [$args]: $d")
    }
    if (failures.nonEmpty)
      fail(s"${failures.length}/${cases.length} asof-fuzz cases diverged:\n" +
        failures.reverse.take(25).mkString("\n"))
  }
}

package graft

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Shared plumbing for the differential-fuzz replay specs
  * ([[DialectFuzzSpec]], [[OpFuzzSpec]]): corpus loading, frame
  * construction from the generator's JSON encoding, and the
  * missing-conflating comparators. Encoding contract documented in
  * tools/dialect_fuzz.py. */
object FuzzHarness {

  val mapper = new ObjectMapper()

  def loadCases(resource: String): Seq[JsonNode] = {
    val in = getClass.getResourceAsStream(resource)
    assert(in != null, s"fuzz corpus missing: $resource (run the generator)")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().filter(_.nonEmpty).map(mapper.readTree).toVector
    finally src.close()
  }

  def sparkType(t: String): DataType = t match {
    case "i"  => LongType
    case "d"  => DoubleType
    case "s"  => StringType
    // naive datetime64 ≡ zone-free NTZ (ISO-8601-encoded in the corpus)
    case "dt" => TimestampNTZType
  }

  def scalarOf(node: JsonNode, t: String): Any =
    if (node == null || node.isNull) null
    else t match {
      case "i"  => node.asLong()
      case "d"  => node.asDouble()
      case "s"  => node.asText()
      // accept both the generator's "YYYY-MM-DD hh:mm:ss.ffffff" input
      // encoding and Timestamp.isoformat()'s 'T' separator
      case "dt" =>
        java.time.LocalDateTime.parse(node.asText().replace(' ', 'T'))
    }

  def buildFrame(spark: SparkSession, frame: JsonNode): DataFrame = {
    val ks = frame.get("k").elements().asScala.map(_.asLong()).toVector
    val baseNames = frame.get("base").fieldNames().asScala.toVector
    val baseTypes = baseNames.map(c => frame.get("base").get(c).get("t").asText())
    val nestNames = frame.get("nests").fieldNames().asScala.toVector
    val nestFields: Map[String, Vector[(String, String)]] = nestNames.map { n =>
      n -> frame.get("nests").get(n).get("fields").elements().asScala
        .map(f => (f.get(0).asText(), f.get(1).asText())).toVector
    }.toMap
    val schema = StructType(
      StructField("k", LongType, nullable = false) +:
        (baseNames.zip(baseTypes).map { case (c, t) =>
          StructField(c, sparkType(t), nullable = true) } ++
          nestNames.map { n =>
            StructField(n, ArrayType(StructType(nestFields(n).map {
              case (f, t) => StructField(f, sparkType(t), nullable = true)
            }.toArray), containsNull = false), nullable = true)
          }))
    val rows: Seq[Row] = ks.indices.map { i =>
      val base = baseNames.zip(baseTypes).map { case (c, t) =>
        scalarOf(frame.get("base").get(c).get("v").get(i), t) }
      val nests = nestNames.map { n =>
        val cell = frame.get("nests").get(n).get("cells").get(i)
        if (cell == null || cell.isNull) null
        else cell.elements().asScala.map { el =>
          Row.fromSeq(nestFields(n).zipWithIndex.map { case ((_, t), j) =>
            scalarOf(el.get(j), t) })
        }.toSeq
      }
      Row.fromSeq(ks(i) +: (base ++ nests))
    }
    spark.createDataFrame(rows.asJava, schema)
  }

  private def numEq(a: Double, b: Double): Boolean =
    (a.isNaN && b.isNaN) ||
      math.abs(a - b) <= 1e-9 + 1e-9 * math.max(math.abs(a), math.abs(b))

  /** missing-conflating scalar compare: SQL NULL == pandas-encoded null;
    * Spark NaN (e.g. stddev of 1 value) == encoded null too, because the
    * generator encodes pandas NaN as null. Arrays recurse. */
  def scalarMatches(got: Any, exp: JsonNode): Boolean = {
    val expMissing = exp == null || exp.isNull
    got match {
      case null => expMissing
      case seq: scala.collection.Seq[_] =>
        exp != null && exp.isArray && exp.size() == seq.length &&
          seq.zipWithIndex.forall { case (v, i) => scalarMatches(v, exp.get(i)) }
      case d: java.lang.Double if d.isNaN => expMissing
      case f: java.lang.Float if f.isNaN => expMissing
      // json can't carry IEEE infinities (allow_nan=False): the corpus
      // encodes them as the strings "inf"/"-inf" (r13 pct_change /0)
      case d: java.lang.Double if d.isInfinite =>
        exp.isTextual && exp.asText() == (if (d > 0) "inf" else "-inf")
      case _ if expMissing => false
      case d: java.lang.Double => exp.isNumber && numEq(d, exp.asDouble())
      case f: java.lang.Float => exp.isNumber && numEq(f.toDouble, exp.asDouble())
      case n: java.lang.Number => exp.isNumber && numEq(n.doubleValue(), exp.asDouble())
      case b: java.lang.Boolean =>
        (exp.isBoolean && exp.asBoolean() == b) ||
          (exp.isNumber && numEq(if (b) 1.0 else 0.0, exp.asDouble()))
      case s: String => exp.isTextual && exp.asText() == s
      // timestamps: corpus encodes pandas Timestamp.isoformat()
      case t: java.time.LocalDateTime =>
        exp.isTextual && java.time.LocalDateTime.parse(
          exp.asText().replace(' ', 'T')) == t
      case other => other.toString == exp.asText()
    }
  }

  /** Compare one result frame (rows matched by k). None on match. */
  def compareFrame(df: DataFrame, expect: JsonNode): Option[String] = {
    val expK = expect.get("k").elements().asScala.map(_.asLong()).toVector
    val baseNames = expect.get("base").fieldNames().asScala.toVector
    val nestNames = expect.get("nests").fieldNames().asScala.toVector
    val got = df.orderBy(col("k")).collect()
    val gotK = got.map(_.getAs[Long]("k")).toVector
    if (gotK != expK.sorted)
      return Some(s"row keys: got ${gotK.mkString(",")} expected ${expK.sorted.mkString(",")}")
    val bySortedK = expK.zipWithIndex.sortBy(_._1).map(_._2)
    for ((row, gi) <- got.zipWithIndex) {
      val ei = bySortedK(gi)
      for (c <- baseNames) {
        if (!row.schema.fieldNames.contains(c))
          return Some(s"missing output column '$c'")
        val exp = expect.get("base").get(c).get(ei)
        val gotV = row.get(row.fieldIndex(c))
        if (!scalarMatches(gotV, exp))
          return Some(s"k=${gotK(gi)} base '$c': got $gotV expected $exp")
      }
      for (n <- nestNames) {
        if (!row.schema.fieldNames.contains(n))
          return Some(s"missing output nest '$n'")
        val ninfo = expect.get("nests").get(n)
        val fields = ninfo.get("fields").elements().asScala.map(_.asText()).toVector
        val expCell = ninfo.get("cells").get(ei)
        val gi2 = row.fieldIndex(n)
        val gotCell = if (row.isNullAt(gi2)) null else row.getSeq[Row](gi2)
        if (gotCell == null || expCell == null || expCell.isNull) {
          if (!(gotCell == null && (expCell == null || expCell.isNull)))
            return Some(s"k=${gotK(gi)} nest '$n' cell null-ness: " +
              s"got $gotCell expected $expCell")
        } else {
          val expEls = expCell.elements().asScala.toVector
          if (gotCell.length != expEls.length)
            return Some(s"k=${gotK(gi)} nest '$n' cell length: got ${gotCell.length} expected ${expEls.length}")
          for ((el, j) <- gotCell.zipWithIndex; (f, fj) <- fields.zipWithIndex) {
            val gotV = el.get(el.fieldIndex(f))
            val exp = expEls(j).get(fj)
            if (!scalarMatches(gotV, exp))
              return Some(s"k=${gotK(gi)} nest '$n'[$j].$f: got $gotV expected $exp")
          }
        }
      }
    }
    None
  }
}

package graft

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions.{array, col, date_format,
  element_at, lit, timestamp_micros}
import graft.nested.NestedOps

import scala.jdk.CollectionConverters._

/** Operator-level differential fuzz (r9): dropna / fillna / count_nested /
  * split / to_flat over random frames, goldens computed by EXECUTING the
  * reference (tools/op_fuzz.py) — the dialect fuzzer's technique pointed
  * at the operator surface. Regenerate with `python3 tools/op_fuzz.py`. */
class OpFuzzSpec extends SparkSpec {
  import FuzzHarness._

  private def runOp(df: DataFrame, op: String, args: JsonNode): DataFrame =
    op match {
      case "dropna_nested" =>
        val subset =
          if (args.get("subset") == null || args.get("subset").isNull) Nil
          else args.get("subset").elements().asScala
            .map(_.asText().stripPrefix("n.")).toSeq
        val how = Option(args.get("how")).filterNot(_.isNull)
          .map(_.asText()).getOrElse("any")
        val thresh = Option(args.get("thresh")).filterNot(_.isNull)
          .map(_.asInt())
        NestedOps.dropNaElements(df, "n", subset, how, thresh)
      case "dropna_base" =>
        Option(args.get("thresh")).filterNot(_.isNull).map(_.asInt()) match {
          case Some(t) =>
            // pandas thresh counts non-NA across the DATA columns (nest
            // cells included); the Spark frame carries the index as
            // column k (always non-null) → t + 1
            df.na.drop(t + 1)
          case None =>
            df.na.drop(args.get("how").asText(),
              args.get("subset").elements().asScala.map(_.asText()).toSeq)
        }
      case "fillna" =>
        val values = args.get("values").fields().asScala.map { e =>
          e.getKey -> (e.getValue.asDouble(): Any)
        }.toMap
        NestedOps.fillNaAll(df, values)
      case "count_nested" =>
        val dropNa = args.has("dropna") && args.get("dropna").asBoolean()
        Option(args.get("by")).filterNot(_.isNull).map(_.asText()) match {
          case None => NestedOps.countNested(df, "n", None)
          case Some(by) => NestedOps.countNestedAuto(df, "n", by, dropNa)
        }
      case "split" =>
        NestedOps.splitNestedAuto(df, "n", args.get("by").asText(),
          dropField = false, dropSource = false)
      // r10: inherited-pandas surface (VERDICT item 2). merge = base-key
      // join with the nest carried through (unmatched rows get NULL
      // cells, pandas suffixes on the overlapping column); the golden is
      // order-independent — both engines sort by the materialized
      // original index (k0, NULLs last) then the unique other-key.
      case "merge_base" =>
        import org.apache.spark.sql.functions._
        import org.apache.spark.sql.expressions.Window
        import org.apache.spark.sql.types._
        val o = args.get("other")
        val keys = o.get("a").elements().asScala.map(_.asLong()).toVector
        val cs = o.get("c").elements().asScala.map(_.asText()).toVector
        val hasB = o.has("b")
        val bs =
          if (hasB) o.get("b").elements().asScala.map(_.asDouble()).toVector
          else Vector.empty
        val rows = keys.indices.map { i =>
          if (hasB) Row(keys(i), cs(i), bs(i)) else Row(keys(i), cs(i))
        }
        val schema = StructType(Array(
          StructField("a", LongType, nullable = false),
          StructField("c", StringType, nullable = true)) ++
          (if (hasB) Array(StructField("b", DoubleType, nullable = true))
           else Array.empty[StructField]))
        val other0 = spark.createDataFrame(rows.asJava, schema)
        val left0 = df.drop("m").withColumnRenamed("k", "k0")
        val (left, other) =
          if (hasB) (left0.withColumnRenamed("b", "b_l"),
            other0.withColumnRenamed("b", "b_r"))
          else (left0, other0)
        val joined = left.join(other, Seq("a"), args.get("how").asText())
        val w = Window.orderBy(col("k0").asc_nulls_last, col("a"))
        joined.withColumn("k", row_number().over(w).cast("long") - 1)
      // base groupby().agg(): keyed aggregation over base columns with
      // count over the NEST column (non-null cells). pandas sum is
      // min_count=0 (all-NaN group -> 0.0), mirrored with coalesce.
      case "groupby_agg" =>
        import org.apache.spark.sql.functions._
        import org.apache.spark.sql.expressions.Window
        val fns = args.get("fns")
        val aggs = fns.fieldNames().asScala.toVector.map { out =>
          val src = fns.get(out)
          val cn = src.get(0).asText()
          (src.get(1).asText() match {
            case "mean"  => avg(col(cn))
            case "sum"   => coalesce(sum(col(cn)), lit(0.0))
            case "min"   => min(col(cn))
            case "max"   => max(col(cn))
            case "count" => count(col(cn))
            case "std"   => stddev_samp(col(cn))
          }).as(out)
        }
        val g = df.groupBy("a").agg(aggs.head, aggs.tail: _*)
        g.withColumn("k",
          row_number().over(Window.orderBy(col("a"))).cast("long") - 1)
      // r11 tranche 2: column-wise concat on the shared index == join
      // on k (split mode re-joins the frame's own column halves; extra
      // mode OUTER-aligns a partial-index frame — missing rows null-fill
      // like the reference's NaN / missing nest cells)
      case "concat_axis1" =>
        import org.apache.spark.sql.types._
        if (args.get("mode").asText() == "split") {
          val left = df.select("k", "a", "n")
          val right = df.select("k", "b", "s", "m")
          left.join(right, Seq("k"))
        } else {
          val ex = args.get("extra")
          val ks = ex.get("k").elements().asScala.map(_.asLong()).toVector
          val cs = ex.get("c").elements().asScala.map(_.asDouble()).toVector
          val rows = ks.indices.map(i => Row(ks(i), cs(i)))
          val schema = StructType(Array(
            StructField("k", LongType, nullable = false),
            StructField("c", DoubleType, nullable = true)))
          val right = spark.createDataFrame(rows.asJava, schema)
          df.join(right, Seq("k"), "outer")
        }
      // rename: base columns via withColumnRenamed; dotted nested keys
      // are a NO-OP (the reference silently ignores them — probe)
      case "rename_cols" =>
        args.get("mapping").fields().asScala.foldLeft(df) { (d, e) =>
          if (e.getKey.contains(".")) d
          else d.withColumnRenamed(e.getKey, e.getValue.asText())
        }
      // base astype with the nest in flight. pandas astype(str)
      // literal-stringifies missing values ('None' for object-None —
      // corpus-caught wart, 3/1500 on first replay); SQL cast keeps
      // NULL, so the str path coalesces explicitly.
      case "astype_base" =>
        import org.apache.spark.sql.functions.{lit, when}
        val c = args.get("col").asText()
        args.get("dtype").asText() match {
          case "str" =>
            df.withColumn(c, when(col(c).isNull, lit("None"))
              .otherwise(col(c).cast("string")))
          case dt =>
            val t = dt match {
              case "float64" => "double"
              case "int32"   => "int"
              case "int64"   => "bigint"
              case other     => other
            }
            df.withColumn(c, col(c).cast(t))
        }
      // positional head/tail incl. pandas negative counts
      // (head(-2) = all but the last 2)
      case "head_tail" =>
        import org.apache.spark.sql.functions._
        val n = args.get("n").asInt()
        val total = df.count()
        val keep = (if (n >= 0) math.min(n.toLong, total)
                    else math.max(0L, total + n)).toInt
        if (args.get("which").asText() == "head")
          df.orderBy(col("k")).limit(keep)
        else df.orderBy(col("k").desc).limit(keep)
      case "sort_nested" =>
        NestedOps.sortValues(df,
          Seq((args.get("by").asText(), args.get("asc").asBoolean())),
          Some(args.get("na_position").asText()))
      // accessor-level query: element mask + DROP rows whose cell
      // emptied (reference .nest.query_flat drops absent keys too) —
      // query NULLs emptied cells, so the isNotNull where IS the drop
      case "nest_query" =>
        graft.nested.NestedExpr.query(df, args.get("text").asText())
          .where(col("n").isNotNull)
      // accessor set_filled_column: one scalar per row broadcast into the
      // row's cell elements; a None value broadcasts NULL (reference NaN —
      // conflated by the comparator). k is the 0-based row ordinal, so
      // element_at over a literal array is the aligned per-row source.
      case "set_filled" =>
        import org.apache.spark.sql.functions._
        val vals: Seq[Option[Double]] = args.get("values").elements().asScala
          .map(v => if (v.isNull) None else Some(v.asDouble())).toSeq
        NestedOps.withNestedFieldFilled(df, "n", "z",
          element_at(typedLit(vals), col("k").cast("int") + 1))
      // __setitem__ surface: each reference assignment path mapped to
      // its NestedOps setter (probe-pinned 2026-08-14; missing cells
      // excluded — the adjudicated flat-repack divergence)
      case "setitem" =>
        import org.apache.spark.sql.functions._
        args.get("var").asText() match {
          case "scalar" => NestedOps.withNestedFieldFilled(df, "n", "z",
            lit(args.get("value").asDouble()))
          case "base" => NestedOps.withNestedFieldFilled(df, "n", "z",
            col("a") * lit(args.get("mul").asLong()))
          case "modify" => NestedOps.withNestedField(df, "n", "x",
            s => s.getField("x") + lit(args.get("delta").asDouble()))
          case "field" => NestedOps.withNestedField(df, "n", "z",
            s => s.getField("y") * lit(args.get("mul").asLong()))
          case "crossnest" =>
            // element-aligned values from the OTHER nest (the reference's
            // set_flat_column length-matched path)
            val d = args.get("delta").asDouble()
            df.withColumn("n", transform(col("n"), (s, i) =>
              s.withField("z",
                element_at(col("m"), i + 1).getField("u") + lit(d))))
          case "newnest" =>
            df.withColumn("p", transform(col("n"), s =>
              struct((s.getField("x") +
                lit(args.get("delta").asDouble())).as("w"))))
          case "del_field" =>
            val out = NestedOps.dropNestedFields(df, "n", Seq("x"))
            require(!NestedOps.nestedStruct(out, "n").fieldNames
              .contains("x"), "del_field left 'x' in place")
            out
          case "del_base" =>
            val out = df.drop("b")
            require(!out.columns.contains("b"), "del_base left 'b' in place")
            out
        }
    }

  /** to_flat compare: expected is per-k ORDERED element lists over the
    * flat columns; our toFlat output is grouped by k in collect order
    * (narrow explode — array order preserved). */
  private def compareFlat(df: DataFrame, expect: JsonNode): Option[String] = {
    val expK = expect.get("k").elements().asScala.map(_.asLong()).toVector
    val flat = expect.get("flat")
    val fields = flat.get("fields").elements().asScala.map(_.asText()).toVector
    val got = df.collect()
    val byK = scala.collection.mutable.LinkedHashMap.empty[Long, Vector[Row]]
    got.foreach { r =>
      val k = r.getAs[Long]("k")
      byK(k) = byK.getOrElse(k, Vector.empty) :+ r
    }
    for ((k, ki) <- expK.zipWithIndex) {
      val expCell = flat.get("cells").get(ki)
      val rows = byK.getOrElse(k, Vector.empty)
      if (expCell == null || expCell.isNull) {
        if (rows.nonEmpty)
          return Some(s"k=$k: got ${rows.length} flat rows, expected none")
      } else {
        val expEls = expCell.elements().asScala.toVector
        if (rows.length != expEls.length)
          return Some(s"k=$k: got ${rows.length} flat rows, expected ${expEls.length}")
        for ((row, j) <- rows.zipWithIndex; (f, fj) <- fields.zipWithIndex) {
          val gotV = row.get(row.fieldIndex(f))
          if (!scalarMatches(gotV, expEls(j).get(fj)))
            return Some(s"k=$k flat[$j].$f: got $gotV expected ${expEls(j).get(fj)}")
        }
      }
    }
    val extras = byK.keySet -- expK.toSet
    if (extras.nonEmpty) return Some(s"unexpected flat keys: $extras")
    None
  }

  test("operator fuzz corpus replays green against the executed reference") {
    val cases = loadCases("/fuzz/op_fuzz.jsonl")
    assert(cases.length >= 300, s"corpus has ${cases.length} cases; want >= 300")
    var failures = List.empty[String]
    for (c <- cases) {
      val id = c.get("id").asInt()
      val op = c.get("op").asText()
      // flatten_inner carries its own doubly-nested frame shape
      lazy val df = buildFrame(spark, c.get("frame"))
      val args = c.get("args")
      val diff =
        try {
          op match {
            case "to_flat" =>
              compareFlat(NestedOps.toFlat(df, "n", Seq("k")), c.get("expect"))
            case "explode" =>
              // reference explode keeps missing-cell rows with all-NA
              // fields (probe-verified) → keepEmpty analog
              compareFlat(NestedOps.explodeNested(df.drop("m"), "n",
                keepEmpty = true), c.get("expect"))
            case "sort_base" =>
              val keys =
                if (args.get("by").isArray)
                  args.get("by").elements().asScala.map(_.asText())
                    .zip(args.get("asc").elements().asScala.map(_.asBoolean()))
                    .toSeq
                else Seq((args.get("by").asText(),
                  args.get("asc").asBoolean()))
              val got = NestedOps.sortValues(df, keys,
                Some(args.get("na_position").asText()))
                .collect().map(_.getAs[Long]("k")).toVector
              val exp = c.get("expect").get("k_order").elements().asScala
                .map(_.asLong()).toVector
              if (got == exp) None
              else Some(s"row order: got ${got.mkString(",")} expected ${exp.mkString(",")}")
            case "drop_dup" =>
              // pandas keep='first'/'last' by ORIGINAL row order: window
              // rank over the subset keys ordered by the carried index
              import org.apache.spark.sql.expressions.Window
              import org.apache.spark.sql.functions.row_number
              val subset = args.get("subset").elements().asScala
                .map(_.asText()).toVector
              val ord = if (args.get("keep").asText() == "first")
                col("k").asc else col("k").desc
              val w = Window.partitionBy(subset.map(col): _*).orderBy(ord)
              val got = df.withColumn("__rn", row_number().over(w))
                .where(col("__rn") === 1).drop("__rn")
                .orderBy(col("k"))
                .collect().map(_.getAs[Long]("k")).toVector
              val exp = c.get("expect").get("k_order").elements().asScala
                .map(_.asLong()).toVector
              if (got == exp) None
              else Some(s"kept rows: got ${got.mkString(",")} " +
                s"expected ${exp.mkString(",")}")
            // r11 tranche 3: nlargest/nsmallest. NaN rows rank BELOW every
            // value but still fill remaining slots (probe 2026-08-16) ≡
            // nulls_last ordering + limit. Tie policy: keep='first' breaks
            // by carried index asc, 'last' by index DESC (and the output
            // shows that order), 'all' extends the boundary tie group
            // (rank over the value keys alone).
            // r12 tranche 8: groupby transform — per-row broadcast stat
            case "group_transform" =>
              val out = graft.operators.InheritedOps.groupTransform(df,
                args.get("key").asText(), args.get("value").asText(),
                args.get("fn").asText())
              val got = out.orderBy(col("k")).select(col("transformed"))
                .collect().map(_.getAs[Any](0))
              val exp = c.get("expect").get("vals")
              val bad = got.zipWithIndex.filterNot { case (v, i) =>
                scalarMatches(v, exp.get(i)) }
              if (got.length == exp.size() && bad.isEmpty) None
              else Some(s"transform vals: got ${got.take(12).mkString(",")}" +
                s" expected $exp")
            // r12 tranche 9: rolling/expanding window aggregates —
            // goldens are per-row values in carried-index order
            case "roll_expand" =>
              val mp = if (args.get("min_periods").isNull) None
                       else Some(args.get("min_periods").asInt())
              val expanding = args.get("kind").asText() == "expanding"
              val out = graft.operators.InheritedOps.rollingAgg(df,
                args.get("col").asText(), args.get("fn").asText(),
                window = if (expanding) 1 else args.get("window").asInt(),
                minPeriods = mp, orderCol = "k", expanding = expanding,
                center = args.has("center") && args.get("center").asBoolean(),
                q = if (args.has("q")) args.get("q").asDouble() else 0.5)
              val got = out.orderBy(col("k")).select(col("rolled"))
                .collect().map(_.getAs[Any](0))
              val exp = c.get("expect").get("vals")
              val bad = got.zipWithIndex.filterNot { case (v, i) =>
                scalarMatches(v, exp.get(i)) }
              if (got.length == exp.size() && bad.isEmpty) None
              else Some(s"rolled vals: got ${got.take(12).mkString(",")} " +
                s"expected $exp")
            // r12 tranche 9: linear interpolate by position
            case "interp" =>
              val cn = args.get("col").asText()
              // r13 breadth: method='index' rides the drawn irregular
              // abscissa in as __ord and interpolates by its VALUES
              val out =
                if (args.has("method") &&
                    args.get("method").asText() == "index") {
                  val idx = args.get("idx").elements().asScala.toSeq
                  val arr = array(idx.map(n => lit(n.asDouble())): _*)
                  val withOrd = df.withColumn("__ord",
                    element_at(arr, (col("k") + 1).cast("int")))
                  graft.operators.InheritedOps.interpolateLinear(withOrd,
                    cn, "__ord", byValues = true).drop("__ord")
                } else graft.operators.InheritedOps.interpolateLinear(df,
                  cn, "k")
              val got = out.orderBy(col("k")).select(col(cn))
                .collect().map(_.getAs[Any](0))
              val exp = c.get("expect").get("vals")
              val bad = got.zipWithIndex.filterNot { case (v, i) =>
                scalarMatches(v, exp.get(i)) }
              if (got.length == exp.size() && bad.isEmpty) None
              else Some(s"interp vals: got ${got.take(12).mkString(",")} " +
                s"expected $exp")
            // r12 tranche 9: clip (bounds optional, int bounds keep int)
            // and pct_change (pad default, negative periods lead)
            case "clip_pct" =>
              val cn = args.get("col").asText()
              val out =
                if (args.get("kind").asText() == "clip") {
                  def bound(name: String): Option[Column] = {
                    val node = args.get(name)
                    if (node == null || node.isNull) None
                    else if (node.isIntegralNumber) Some(lit(node.asLong()))
                    else Some(lit(node.asDouble()))
                  }
                  df.withColumn("out", graft.operators.InheritedOps
                    .clipValues(col(cn), bound("lower"), bound("upper")))
                } else {
                  val fill = if (args.get("fill").isNull) None
                             else Some(args.get("fill").asText())
                  graft.operators.InheritedOps.pctChange(df, cn,
                    args.get("n").asInt(), "k", Nil, fill)
                    .withColumnRenamed("pct_change", "out")
                }
              val got = out.orderBy(col("k")).select(col("out"))
                .collect().map(_.getAs[Any](0))
              val exp = c.get("expect").get("vals")
              val bad = got.zipWithIndex.filterNot { case (v, i) =>
                scalarMatches(v, exp.get(i)) }
              if (got.length == exp.size() && bad.isEmpty) None
              else Some(s"clip/pct vals: got ${got.take(12).mkString(",")}" +
                s" expected $exp")
            // r12 tranche 10: cut/qcut bin indices (labels=False)
            case "cut_qcut" =>
              val cn = args.get("col").asText()
              val out = args.get("mode").asText() match {
                case "cut_edges" =>
                  val edges = args.get("edges").elements().asScala
                    .map(_.asDouble()).toVector
                  df.withColumn("bin", graft.operators.InheritedOps
                    .cutBins(col(cn), edges,
                      right = args.get("right").asBoolean(),
                      includeLowest =
                        args.get("include_lowest").asBoolean()))
                case "cut_int" =>
                  graft.operators.InheritedOps.cutUniform(df, cn,
                    args.get("bins").asInt(),
                    right = args.get("right").asBoolean())
                case "qcut" =>
                  graft.operators.InheritedOps.qcutBins(df, cn,
                    args.get("q").asInt(), duplicates = "drop")
              }
              val got = out.orderBy(col("k")).select(col("bin"))
                .collect().map(_.getAs[Any](0))
              val exp = c.get("expect").get("vals")
              val bad = got.zipWithIndex.filterNot { case (v, i) =>
                scalarMatches(v, exp.get(i)) }
              if (got.length == exp.size() && bad.isEmpty) None
              else Some(s"bin vals: got ${got.take(12).mkString(",")} " +
                s"expected $exp")
            // r12 tranche 11: crosstab — count matrix compared by row
            // label (margins turns the row key into a string union, so
            // label equality is the contract there; without margins the
            // sorted row ORDER is asserted too)
            case "crosstab" =>
              val margins = args.get("margins").asBoolean()
              val out = graft.operators.InheritedOps.crosstabCounts(df,
                args.get("row").asText(), args.get("col").asText(),
                margins)
              val expRows = c.get("expect").get("rows")
              val expCols = c.get("expect").get("cols")
              val expM = c.get("expect").get("matrix")
              val data = out.collect()
              val ncols = out.columns.length - 1
              if (data.length != expRows.size())
                Some(s"crosstab rows: got ${data.length} expected " +
                  s"${expRows.size()}")
              else if (ncols != expCols.size())
                Some(s"crosstab cols: got $ncols expected " +
                  s"${expCols.size()}")
              else {
                val nameBad = (0 until ncols).filterNot { j =>
                  out.columns(j + 1) == expCols.get(j).asText() }
                val byLabel = data.map(r0 =>
                  String.valueOf(r0.get(0)) -> r0).toMap
                val cellBad = (0 until expRows.size()).flatMap { i =>
                  val lbl = expRows.get(i).asText()
                  byLabel.get(lbl) match {
                    case None => Some(s"missing row '$lbl'")
                    case Some(r0) =>
                      (0 until ncols).collectFirst {
                        case j if r0.getLong(j + 1) !=
                            expM.get(i).get(j).asLong() =>
                          s"row '$lbl' col ${out.columns(j + 1)}: got " +
                            s"${r0.getLong(j + 1)} expected " +
                            s"${expM.get(i).get(j).asLong()}"
                      }
                  }
                }
                val orderOk = margins ||
                  data.map(r0 => String.valueOf(r0.get(0))).toVector ==
                    (0 until expRows.size()).map(expRows.get(_).asText())
                      .toVector
                if (nameBad.isEmpty && cellBad.isEmpty && orderOk) None
                else Some((nameBad.map(j =>
                  s"col name ${out.columns(j + 1)} != " +
                    s"${expCols.get(j).asText()}") ++ cellBad ++
                  (if (orderOk) Nil else Seq("row order diverged")))
                  .mkString("; "))
              }
            // r12 tranche 11: get_dummies — indicator matrix compared
            // positionally (both sides sort the domain ascending, the
            // NaN column is last)
            case "get_dummies" =>
              // unprefixed first; a domain value equal to an existing
              // column name raises (r13 collision guard) — replay with
              // a prefix, the compare is positional so names don't
              // participate in the golden
              val out = try {
                graft.operators.InheritedOps.getDummies(df,
                  args.get("col").asText(),
                  dummyNa = args.get("dummy_na").asBoolean())
              } catch {
                case e: IllegalArgumentException
                    if Option(e.getMessage).exists(_.contains("collide")) =>
                  graft.operators.InheritedOps.getDummies(df,
                    args.get("col").asText(),
                    dummyNa = args.get("dummy_na").asBoolean(),
                    prefix = "d")
              }
              val expCols = c.get("expect").get("cols")
              val expRows = c.get("expect").get("rows")
              val nInd = expCols.size()
              val base = out.columns.length - nInd
              val rows = out.orderBy(col("k")).collect()
              if (rows.length != expRows.size())
                Some(s"dummies rows: got ${rows.length} expected " +
                  s"${expRows.size()}")
              else {
                val bad = rows.zipWithIndex.flatMap { case (r0, i) =>
                  (0 until nInd).collectFirst {
                    case j if r0.getBoolean(base + j) !=
                        expRows.get(i).get(j).asBoolean() =>
                      s"row $i ind $j: got ${r0.getBoolean(base + j)}"
                  }
                }
                if (bad.isEmpty) None else Some(bad.mkString("; "))
              }
            // r12 tranche 11: factorize — first-appearance codes per
            // row + the uniques recovered as distinct (code, value)
            case "factorize" =>
              val cn = args.get("col").asText()
              val sentinel = args.get("sentinel").asBoolean()
              val out = graft.operators.InheritedOps.factorizeCodes(df,
                cn, "k", useNaSentinel = sentinel)
              val gotCodes = out.orderBy(col("k")).select(col("code"))
                .collect().map(_.getLong(0))
              val expCodes = c.get("expect").get("codes")
              val expUniq = c.get("expect").get("uniques")
              val uniq = out.where(if (sentinel) col("code") =!= -1L
                                   else lit(true))
                .select(col("code"), col(cn)).distinct()
                .orderBy(col("code")).collect()
              val codeBad = gotCodes.length != expCodes.size() ||
                gotCodes.zipWithIndex.exists { case (v, i) =>
                  v != expCodes.get(i).asLong() }
              val uniqBad = uniq.length != expUniq.size() ||
                uniq.zipWithIndex.exists { case (r0, i) =>
                  !scalarMatches(r0.get(1), expUniq.get(i)) }
              if (!codeBad && !uniqBad) None
              else Some(s"factorize: codes ${gotCodes.take(12)
                .mkString(",")} vs $expCodes; uniques ${uniq.map(_.get(1))
                .mkString(",")} vs $expUniq")
            // r12 tranche 13 (r13-widened): ewm — per-row goldens
            // replaying the pandas kernels through the mapPartitions
            // path; span/halflife/com convert through the
            // center-of-mass chain, var/std run the ewmcov kernel
            case "ewm" =>
              import graft.operators.InheritedOps
              val value = args.get("value").asDouble()
              val alpha = args.get("param").asText() match {
                case "alpha"    => value
                case "span"     => InheritedOps.ewmAlphaFromSpan(value)
                case "halflife" => InheritedOps.ewmAlphaFromHalflife(value)
                case "com"      => InheritedOps.ewmAlphaFromCom(value)
              }
              val adjust = args.get("adjust").asBoolean()
              val ignoreNa = args.get("ignore_na").asBoolean()
              val minp = args.get("min_periods").asInt()
              val out = args.get("stat").asText() match {
                case "mean" =>
                  InheritedOps.ewmMean(df, "b", alpha, "k", Nil,
                    adjust, ignoreNa, minp)
                case "sum" =>
                  InheritedOps.ewmSum(df, "b", alpha, "k", Nil,
                    ignoreNa, minp)
                case st =>
                  InheritedOps.ewmVar(df, "b", alpha, "k", Nil,
                    adjust, ignoreNa, minp,
                    bias = args.get("bias").asBoolean(),
                    std = st == "std")
              }
              val got = out.orderBy(col("k")).select(col("ewm"))
                .collect().map(_.getAs[Any](0))
              val exp = c.get("expect").get("vals")
              val bad = got.zipWithIndex.filterNot { case (v, i) =>
                scalarMatches(v, exp.get(i)) }
              if (got.length == exp.size() && bad.isEmpty) None
              else Some(s"ewm vals: got ${got.take(12).mkString(",")} " +
                s"expected $exp")
            // r13 breadth: ewm cov/corr — the second series rides in
            // args (yv) so both inputs carry independent missing draws;
            // the kernel alpha replays pandas' alpha→com→alpha chain
            case "ewm_cov" =>
              import graft.operators.InheritedOps
              val value = args.get("value").asDouble()
              val alpha = args.get("param").asText() match {
                case "alpha"    =>
                  InheritedOps.ewmAlphaFromCom((1.0 - value) / value)
                case "span"     => InheritedOps.ewmAlphaFromSpan(value)
                case "halflife" => InheritedOps.ewmAlphaFromHalflife(value)
                case "com"      => InheritedOps.ewmAlphaFromCom(value)
              }
              val yv = args.get("yv").elements().asScala.toSeq
              val yArr = array(yv.map(n =>
                if (n.isNull) lit(null).cast("double")
                else lit(n.asDouble())): _*)
              val withY = df.withColumn("__y",
                element_at(yArr, (col("k") + 1).cast("int")))
              val isCorr = args.get("fn").asText() == "corr"
              val out = InheritedOps.ewmCov(withY, "b", "__y", alpha,
                "k", Nil,
                adjust = args.get("adjust").asBoolean(),
                ignoreNa = args.get("ignore_na").asBoolean(),
                minPeriods = args.get("min_periods").asInt(),
                bias = !isCorr && args.get("bias").asBoolean(),
                corr = isCorr)
              val got = out.orderBy(col("k")).select(col("ewm"))
                .collect().map(_.getAs[Any](0))
              val exp = c.get("expect").get("vals")
              val bad = got.zipWithIndex.filterNot { case (v, i) =>
                scalarMatches(v, exp.get(i)) }
              if (got.length == exp.size() && bad.isEmpty) None
              else Some(s"ewm_cov vals: got ${got.take(12).mkString(",")} " +
                s"expected $exp")
            // r13 tranche 14: time-based rolling — the ts column is the
            // drawn offset list (seconds) indexed by k
            case "roll_time" =>
              val offs = args.get("ts").elements().asScala
                .map(_.asLong()).toSeq
              val tsArr = array(offs.map(o => lit(o * 1000000L)): _*)
              val withTs = df.withColumn("__ts",
                timestamp_micros(element_at(tsArr,
                  (col("k") + 1).cast("int"))))
              val out = graft.operators.InheritedOps.rollingTimeAgg(
                withTs, "b", args.get("fn").asText(),
                args.get("window_s").asLong() * 1000000L, "__ts", "k",
                minPeriods = args.get("minp").asInt(),
                closed = args.get("closed").asText(),
                q = args.get("q").asDouble())
              val got = out.orderBy(col("k")).select(col("rolled"))
                .collect().map(_.getAs[Any](0))
              val exp = c.get("expect").get("vals")
              val bad = got.zipWithIndex.filterNot { case (v, i) =>
                scalarMatches(v, exp.get(i)) }
              if (got.length == exp.size() && bad.isEmpty) None
              else Some(s"roll_time vals: got ${got.take(12).mkString(",")}" +
                s" expected $exp")
            // r13 tranche 14: stack (row-major melt, NaN cells drop) /
            // unstack (first-value pivot; null column keys drop)
            case "stack_unstack" if args.get("mode").asText() == "stack" =>
              val vv = args.get("value_vars").elements().asScala
                .map(_.asText()).toSeq
              val out = graft.operators.InheritedOps.stackFrame(
                df, Seq("k"), vv)
              // row-major: order by (k, position of variable in vv)
              val posOf = vv.zipWithIndex.toMap
              val got = out.select(col("k"), col("variable"), col("value"))
                .collect()
                .map(r0 => (r0.getLong(0), r0.getString(1), r0.getAs[Any](2)))
                .sortBy { case (k, v, _) => (k, posOf(v)) }
              val exp = c.get("expect").get("rows")
              val bad = got.length != exp.size() ||
                got.zipWithIndex.exists { case ((k, v, value), i) =>
                  val e = exp.get(i)
                  k != e.get(0).asLong() || v != e.get(1).asText() ||
                    !scalarMatches(value, e.get(2))
                }
              if (!bad) None
              else Some(s"stack rows: got ${got.take(10).mkString(",")} " +
                s"expected $exp")
            case "stack_unstack" =>
              val out = graft.operators.InheritedOps.unstackFrame(
                df, "k", "s", "b")
              val expCols = c.get("expect").get("cols")
              val expRows = c.get("expect").get("rows")
              val gotCols = out.columns.drop(1)
              val colsBad = gotCols.length != expCols.size() ||
                gotCols.zipWithIndex.exists { case (n, i) =>
                  n != expCols.get(i).asText() }
              if (colsBad)
                Some(s"unstack cols: got ${gotCols.mkString(",")} " +
                  s"expected $expCols")
              else {
                val rows = out.orderBy(col("k")).collect()
                val bad = rows.length != expRows.size() ||
                  rows.zipWithIndex.exists { case (r0, i) =>
                    val e = expRows.get(i)
                    r0.getLong(0) != e.get(0).asLong() ||
                      gotCols.indices.exists { j =>
                        !scalarMatches(r0.getAs[Any](j + 1), e.get(j + 1)) }
                  }
                if (!bad) None
                else Some(s"unstack rows vs $expRows")
              }
            // r13 tranche 14: resample — bins anchored at midnight of
            // the first day, empty bins emitted
            case "resample" =>
              val offs = args.get("ts").elements().asScala
                .map(_.asLong()).toSeq
              val baseTs = java.time.LocalDateTime.parse(
                args.get("base").asText().replace(' ', 'T'))
                .toInstant(java.time.ZoneOffset.UTC)
              val baseMicros = baseTs.getEpochSecond * 1000000L
              val tsArr = array(offs.map(o =>
                lit(baseMicros + o * 1000000L)): _*)
              val withTs = df.withColumn("__ts",
                timestamp_micros(element_at(tsArr,
                  (col("k") + 1).cast("int"))))
              val out = graft.operators.InheritedOps.resampleAgg(
                withTs, "__ts", args.get("freq_s").asLong() * 1000000L,
                args.get("fn").asText(), "b",
                label = args.get("label").asText())
              val got = out
                .select(date_format(col("bin"),
                  "yyyy-MM-dd'T'HH:mm:ss").as("l"), col("agg"))
                .collect().map(r0 => (r0.getString(0), r0.getAs[Any](1)))
              val expL = c.get("expect").get("labels")
              val expV = c.get("expect").get("vals")
              val bad = got.length != expL.size() ||
                got.zipWithIndex.exists { case ((l, v), i) =>
                  l != expL.get(i).asText() || !scalarMatches(v, expV.get(i))
                }
              if (!bad) None
              else Some(s"resample: got ${got.take(10).mkString(",")} " +
                s"expected labels=$expL vals=$expV")
            // r12 tranche 10: corr/cov — one scalar golden
            case "corr_cov" =>
              val got = graft.operators.InheritedOps.corrCov(df,
                args.get("c1").asText(), args.get("c2").asText(),
                args.get("fn").asText()).head().getAs[Any](0)
              if (scalarMatches(got, c.get("expect").get("val"))) None
              else Some(s"corr/cov: got $got expected " +
                s"${c.get("expect").get("val")}")
            // r12 tranche 7: column-stat verbs — scalar (or small-list)
            // goldens
            case "col_stats" =>
              val cn = args.get("col").asText()
              args.get("fn").asText() match {
                case f @ ("idxmax" | "idxmin") =>
                  val got = graft.operators.InheritedOps.idxExtreme(df, cn,
                    "k", smallest = f == "idxmin").head().getAs[Any](0)
                  if (scalarMatches(got, c.get("expect").get("val"))) None
                  else Some(s"$f: got $got expected " +
                    s"${c.get("expect").get("val")}")
                case "mode" =>
                  val got = graft.operators.InheritedOps.modeValues(df, cn)
                    .collect().map(_.getAs[Any](0)).toVector
                  val exp = c.get("expect").get("vals")
                  if (got.length == exp.size() && got.zipWithIndex.forall {
                      case (v, i) => scalarMatches(v, exp.get(i)) }) None
                  else Some(s"mode: got ${got.mkString(",")} expected $exp")
                case "quantile" =>
                  val got = graft.operators.InheritedOps.quantileLinear(df,
                    cn, args.get("q").asDouble()).head().getAs[Any](0)
                  if (scalarMatches(got, c.get("expect").get("val"))) None
                  else Some(s"quantile: got $got expected " +
                    s"${c.get("expect").get("val")}")
                // r12 tranche 12: bias-corrected sample moments
                case f @ ("skew" | "kurt" | "sem") =>
                  val got = graft.operators.InheritedOps.momentStat(df,
                    cn, f).head().getAs[Any](0)
                  if (scalarMatches(got, c.get("expect").get("val"))) None
                  else Some(s"$f: got $got expected " +
                    s"${c.get("expect").get("val")}")
                case "nunique" =>
                  val got = graft.operators.InheritedOps.nUnique(df, cn,
                    args.get("dropna").asBoolean()).head().getAs[Any](0)
                  if (scalarMatches(got, c.get("expect").get("val"))) None
                  else Some(s"nunique: got $got expected " +
                    s"${c.get("expect").get("val")}")
              }
            // r12 tranche 6: Series.rank / cumsum / cummax / cummin /
            // diff over one column — goldens are per-row values in
            // carried-index order
            case "rank_col" =>
              val out = graft.operators.InheritedOps.rankRows(df,
                args.get("col").asText(), args.get("method").asText(),
                args.get("ascending").asBoolean(),
                args.get("na_option").asText(),
                args.get("pct").asBoolean(), tieCol = "k")
              val got = out.orderBy(col("k")).select(col("rank"))
                .collect().map(_.getAs[Any](0))
              val exp = c.get("expect").get("vals")
              val bad = got.zipWithIndex.filterNot { case (v, i) =>
                scalarMatches(v, exp.get(i)) }
              if (got.length == exp.size() && bad.isEmpty) None
              else Some(s"rank vals: got ${got.take(12).mkString(",")} " +
                s"expected $exp")
            case "cum_diff" =>
              val cn = args.get("col").asText()
              val fn = args.get("fn").asText()
              val out =
                if (fn == "diff")
                  graft.operators.InheritedOps.diffRows(df, cn,
                    args.get("n").asInt(), "k")
                else graft.operators.InheritedOps.cumulative(df, cn, fn, "k")
              val got = out.orderBy(col("k")).select(col(cn))
                .collect().map(_.getAs[Any](0))
              val exp = c.get("expect").get("vals")
              val bad = got.zipWithIndex.filterNot { case (v, i) =>
                scalarMatches(v, exp.get(i)) }
              if (got.length == exp.size() && bad.isEmpty) None
              else Some(s"$fn vals: got ${got.take(12).mkString(",")} " +
                s"expected $exp")
            // r12 tranche 5: melt — variable-major order reconstructed by
            // (value_vars position, carried index); nest cells compare
            // whole (as id vars and as the value var)
            case "melt_frame" =>
              val idVars = args.get("id_vars").elements().asScala
                .map(_.asText()).toVector
              val valueVars = args.get("value_vars").elements().asScala
                .map(_.asText()).toVector
              val varPos = valueVars.zipWithIndex.toMap
              val out = graft.operators.InheritedOps.meltFrame(df,
                idVars, valueVars)
              def norm(v: Any): Any = v match {
                case s: scala.collection.Seq[_] => s.map(norm)
                case r0: Row => r0.toSeq.map(norm)
                case x => x
              }
              val rows = out.collect().sortBy(r0 =>
                (varPos(r0.getAs[String]("variable")), r0.getAs[Long]("k")))
              val exp = c.get("expect").get("melt_rows")
              if (rows.length != exp.size())
                Some(s"melt rows: got ${rows.length} expected ${exp.size()}")
              else {
                val bad = rows.zipWithIndex.flatMap { case (r0, i) =>
                  val e = exp.get(i)
                  val idsOk = idVars.zipWithIndex.forall { case (cn, j) =>
                    scalarMatches(norm(r0.getAs[Any](cn)),
                      e.get("ids").get(j)) }
                  val varOk = r0.getAs[String]("variable") ==
                    e.get("variable").asText()
                  val valOk = scalarMatches(norm(r0.getAs[Any]("value")),
                    e.get("value"))
                  if (idsOk && varOk && valOk) None
                  else Some(s"melt row $i (${e.get("variable").asText()}) " +
                    "mismatch")
                }
                if (bad.isEmpty) None else Some(bad.take(3).mkString("; "))
              }
            // pivot_table: sorted column keys compare by NAME (the keys'
            // string forms), rows by sorted index, cells by value
            case "pivot_table" =>
              val idx = args.get("index").asText()
              val out = graft.operators.InheritedOps.pivotTable(df, idx,
                args.get("columns").asText(), args.get("values").asText(),
                args.get("aggfunc").asText())
              val expCols = c.get("expect").get("pt_columns").elements()
                .asScala.map(_.asText()).toVector
              val gotCols = out.columns.filterNot(_ == idx).toVector
              if (gotCols != expCols)
                Some(s"pivot columns: got ${gotCols.mkString(",")} " +
                  s"expected ${expCols.mkString(",")}")
              else {
                val rows = out.orderBy(col(idx)).collect()
                val expIdx = c.get("expect").get("pt_index")
                val expRows = c.get("expect").get("pt_rows")
                if (rows.length != expIdx.size())
                  Some(s"pivot rows: got ${rows.length} " +
                    s"expected ${expIdx.size()}")
                else {
                  val bad = rows.zipWithIndex.flatMap { case (r0, i) =>
                    val idxOk = scalarMatches(r0.getAs[Any](idx),
                      expIdx.get(i))
                    val cellsOk = gotCols.zipWithIndex.forall {
                      case (cn, j) => scalarMatches(r0.getAs[Any](cn),
                        expRows.get(i).get(j)) }
                    if (idxOk && cellsOk) None
                    else Some(s"pivot row $i mismatch")
                  }
                  if (bad.isEmpty) None else Some(bad.take(3).mkString("; "))
                }
              }
            case "nlargest" =>
              import org.apache.spark.sql.expressions.Window
              import org.apache.spark.sql.functions.rank
              val desc = args.get("fn").asText() == "nlargest"
              val n = args.get("n").asInt()
              val cols = args.get("cols").elements().asScala
                .map(_.asText()).toVector
              val cn = cols.head // single-col, n < len family (see gen note)
              val m = c.get("frame").get("k").size()
              assert(n < m, s"corpus contract violated: n=$n >= len=$m " +
                "(tie order is a pandas quicksort artifact there)")
              val sel = graft.operators.InheritedOps.nLargest(df, n, cn,
                tieCol = "k", keep = args.get("keep").asText(),
                smallest = !desc)
              val got = sel.collect().map(_.getAs[Long]("k")).toVector
              val exp = c.get("expect").get("k_order").elements().asScala
                .map(_.asLong()).toVector
              if (got == exp) None
              else Some(s"${args.get("fn").asText()} rows: " +
                s"got ${got.mkString(",")} expected ${exp.mkString(",")}")
            // value_counts(subset=): group counts with the CANONICAL
            // (count desc, keys asc, NULL keys last) order pinned by the
            // generator on both engines; k is the output ordinal.
            case "value_counts" =>
              import org.apache.spark.sql.expressions.Window
              import org.apache.spark.sql.functions.row_number
              val subset = args.get("subset").elements().asScala
                .map(_.asText()).toVector
              val normalize = args.get("normalize").asBoolean()
              val valcol = if (normalize) "proportion" else "count"
              val g = graft.operators.InheritedOps.valueCounts(df, subset,
                normalize = normalize,
                dropna = args.get("dropna").asBoolean())
              val ord = col(valcol).desc +: subset.map(col(_).asc_nulls_last)
              val out = g.withColumn("k",
                row_number().over(Window.orderBy(ord: _*)).cast("long") - 1)
              compareFrame(out, c.get("expect"))
            // frame-level where/mask: non-kept rows null EVERY column
            // (nest cell included); the cond is 2-valued in pandas (NaN
            // compares False) ≡ when()'s null-cond fall-through.
            case "where_mask" =>
              import org.apache.spark.sql.functions.lit
              val cn = args.get("col").asText()
              val v: Any = if (cn == "a") args.get("val").asLong()
                else if (cn == "b") args.get("val").asDouble()
                else args.get("val").asText()
              val cond = args.get("op2").asText() match {
                case ">"  => col(cn) > lit(v)
                case ">=" => col(cn) >= lit(v)
                case "<=" => col(cn) <= lit(v)
                case "==" => col(cn) === lit(v)
              }
              val out =
                if (args.get("fn").asText() == "where")
                  graft.operators.InheritedOps.whereCond(df, cond, Set("k"))
                else graft.operators.InheritedOps.maskCond(df, cond, Set("k"))
              compareFrame(out, c.get("expect"))
            // replace({col: {old: new}}): simultaneous mapping over the
            // ORIGINAL values (no re-replacement), NULLs untouched.
            case "replace_vals" =>
              val cn = args.get("col").asText()
              val mapping = args.get("mapping").fields().asScala.toVector
                .map { e =>
                  if (cn == "a")
                    (e.getKey.toLong: Any, e.getValue.asLong(): Any)
                  else (e.getKey: Any, e.getValue.asText(): Any)
                }
              compareFrame(
                graft.operators.InheritedOps.replaceValues(df, cn, mapping),
                c.get("expect"))
            // round(): base FLOAT columns only (ints and nested fields
            // untouched — probe 2026-08-16). pandas delegates to
            // np.around = rint(x·10^d)/10^d — half-even on the SCALED
            // double, NOT on x's decimal expansion: np.round(1.275, 2)
            // = 1.27 because 1.275·100 = 127.4999…, while bround(1.275,
            // 2) reads the exact BigDecimal 1.27500…0133 → 1.28
            // (alt-seed catch). bround at scale 0 ≡ rint, so the scaled
            // form reproduces numpy bit-for-bit.
            case "round_base" =>
              val dNode = c.get("args").get("decimals")
              val d = if (dNode.isObject) dNode.get("b").asInt()
                else dNode.asInt()
              compareFrame(
                df.withColumn("b",
                  graft.operators.InheritedOps.roundLikeNumpy(col("b"), d)),
                c.get("expect"))
            // r11 tranche 4: positional shift — every column lags/leads
            // over the carried index, the NEST cell included (pandas
            // shifts cells whole; vacated rows are all-missing)
            // combine_first / update: two-frame align verbs over the
            // carried index; f2 carries a SUBSET of f1's columns
            case "combine_update" =>
              val df2 = buildFrame(spark, c.get("frame2"))
              val isCF = args.get("fn").asText() == "combine_first"
              if (c.has("expect_error")) {
                // pandas update RAISES on a non-unique other index —
                // graft's updateFrom must too (requireUniqueKey)
                try {
                  graft.operators.InheritedOps.updateFrom(df, df2, "k")
                    .collect()
                  Some("reference update RAISES on duplicate other keys; " +
                    "graft accepted")
                } catch { case _: Exception => None }
              } else if (c.get("expect").has("k_labels")) {
                // combine_first with DUPLICATE other keys: pandas accepts
                // and multiplies — pin the output's sorted index labels
                val got = graft.operators.InheritedOps
                  .combineFirst(df, df2, "k")
                  .collect().map(_.getAs[Long]("k")).sorted.toVector
                val exp = c.get("expect").get("k_labels").elements()
                  .asScala.map(_.asLong()).toVector
                if (got == exp) None
                else Some(s"combine_first dup-key labels: got " +
                  s"${got.mkString(",")} expected ${exp.mkString(",")}")
              } else {
                val out =
                  if (isCF)
                    graft.operators.InheritedOps.combineFirst(df, df2, "k")
                  else graft.operators.InheritedOps.updateFrom(df, df2, "k")
                compareFrame(out, c.get("expect"))
              }
            // df[df.duplicated(subset, keep)] — the rows MARKED duplicate
            case "dup_filter" =>
              val kNode = args.get("keep")
              val keep = if (kNode.isBoolean) "false" else kNode.asText()
              val subset = args.get("subset").elements().asScala
                .map(_.asText()).toVector
              val got = graft.operators.InheritedOps
                .duplicateRows(df, subset, keep, orderCol = "k")
                .orderBy(col("k"))
                .collect().map(_.getAs[Long]("k")).toVector
              val exp = c.get("expect").get("k_order").elements().asScala
                .map(_.asLong()).toVector
              if (got == exp) None
              else Some(s"duplicated rows: got ${got.mkString(",")} " +
                s"expected ${exp.mkString(",")}")
            // add_prefix/add_suffix: TOP-LEVEL columns renamed (nest
            // fields untouched; the index/k is not a column in pandas)
            case "prefix_suffix" =>
              val affix = args.get("affix").asText()
              val pre = args.get("fn").asText() == "add_prefix"
              val out = df.columns.filterNot(_ == "k").foldLeft(df) {
                (d, cn) => d.withColumnRenamed(cn,
                  if (pre) affix + cn else cn + affix)
              }
              compareFrame(out, c.get("expect"))
            case "shift_rows" =>
              compareFrame(graft.operators.InheritedOps.shiftRows(df,
                args.get("n").asInt(), orderCol = "k"), c.get("expect"))
            // ffill/bfill: missing values (and missing nest CELLS) fill
            // from the nearest non-missing neighbor in carried order
            case "fill_dir" =>
              compareFrame(graft.operators.InheritedOps.fillDirectional(df,
                forward = args.get("fn").asText() == "ffill",
                orderCol = "k"), c.get("expect"))
            case "minmax" =>
              val numOnly = !args.has("numeric_only") ||
                args.get("numeric_only").asBoolean()
              val skipNa = !args.has("skipna") ||
                args.get("skipna").asBoolean()
              val exclNest = args.has("exclude_nest") &&
                args.get("exclude_nest").asBoolean()
              val got = NestedOps.aggAllColumns(df.drop("k"),
                args.get("fn").asText(), excludeNest = exclNest,
                numericOnly = numOnly, skipNa = skipNa).collect()(0)
              val cols = c.get("expect").get("cols")
              cols.fieldNames().asScala.flatMap { name =>
                if (!got.schema.fieldNames.contains(name))
                  Some(s"missing agg column '$name'")
                else if (!scalarMatches(got.get(got.fieldIndex(name)),
                    cols.get(name)))
                  Some(s"agg '$name': got ${got.get(got.fieldIndex(name))} " +
                    s"expected ${cols.get(name)}")
                else None
              }.toSeq.headOption
            case "concat" =>
              // allowMissingColumns ≡ pd.concat's schema union: a base
              // column missing on one side null-fills (reference NaN), a
              // missing NEST column yields missing cells (dtype kept)
              val df2 = buildFrame(spark, c.get("frame2"))
              compareFrame(df.unionByName(df2, allowMissingColumns = true),
                c.get("expect"))
            case "flatten_inner" =>
              import org.apache.spark.sql.types._
              import org.apache.spark.sql.Row
              val frame = c.get("frame")
              val innerT = StructType(Array(
                StructField("t", DoubleType, nullable = true),
                StructField("u", LongType, nullable = true)))
              val outerT = StructType(Array(
                StructField("v", DoubleType, nullable = true),
                StructField("inner", ArrayType(innerT), nullable = true)))
              val schema = StructType(Array(
                StructField("k", LongType, nullable = false),
                StructField("outer", ArrayType(outerT), nullable = true)))
              val ks = frame.get("k").elements().asScala.map(_.asLong()).toVector
              val rows = ks.zipWithIndex.map { case (k, i) =>
                val els = frame.get("cells").get(i).elements().asScala.map { el =>
                  val inner = el.get("inner")
                  val innerRows =
                    if (inner == null || inner.isNull) null
                    else inner.elements().asScala.map(p =>
                      Row(p.get(0).asDouble(), p.get(1).asLong())).toSeq
                  Row(el.get("v").asDouble(), innerRows)
                }.toSeq
                Row(k, els)
              }
              val df2 = spark.createDataFrame(rows.asJava, schema)
              val out = NestedOps.flattenInner(df2, "outer", "inner")
                .orderBy(col("k")).collect()
              val flat = c.get("expect").get("flat")
              val fields = flat.get("fields").elements().asScala
                .map(_.asText()).toVector
              var d: Option[String] = None
              for ((row, gi) <- out.zipWithIndex if d.isEmpty) {
                val expCell = flat.get("cells").get(gi)
                val gotCell =
                  if (row.isNullAt(row.fieldIndex("outer"))) null
                  else row.getSeq[Row](row.fieldIndex("outer"))
                if (gotCell == null || expCell.isNull) {
                  if (!(gotCell == null && expCell.isNull))
                    d = Some(s"k=${ks(gi)} cell null-ness mismatch")
                } else {
                  val expEls = expCell.elements().asScala.toVector
                  if (gotCell.length != expEls.length)
                    d = Some(s"k=${ks(gi)}: got ${gotCell.length} rows " +
                      s"expected ${expEls.length}")
                  else for ((el, j) <- gotCell.zipWithIndex if d.isEmpty;
                            (f, fj) <- fields.zipWithIndex if d.isEmpty) {
                    val gotV = el.get(el.fieldIndex(f))
                    if (!scalarMatches(gotV, expEls(j).get(fj)))
                      d = Some(s"k=${ks(gi)}[$j].$f: got $gotV " +
                        s"expected ${expEls(j).get(fj)}")
                  }
                }
              }
              d
            case "from_flat" =>
              // rebuild the same flat rows, then fromFlat with
              // sortBy=pos (the reference preserves input order for free)
              import org.apache.spark.sql.types._
              import org.apache.spark.sql.Row
              val frame = c.get("frame")
              val ks = frame.get("k").elements().asScala
                .map(_.asLong()).toVector
              val ninfo = frame.get("nests").get("n")
              val fTypes = ninfo.get("fields").elements().asScala
                .map(f => (f.get(0).asText(), f.get(1).asText())).toVector
              val schema = StructType(Array(
                StructField("k", LongType, nullable = false),
                StructField("a", LongType, nullable = true),
                StructField("pos", LongType, nullable = false)) ++
                fTypes.map { case (f, t) =>
                  StructField(f, FuzzHarness.sparkType(t), nullable = true) })
              val rows = for {
                (k, i) <- ks.zipWithIndex
                cell = ninfo.get("cells").get(i)
                if !(cell == null || cell.isNull)
                (el, j) <- cell.elements().asScala.zipWithIndex.toSeq
              } yield Row.fromSeq(
                k +: frame.get("base").get("a").get("v").get(i).asLong() +:
                  j.toLong +: fTypes.zipWithIndex.map { case ((_, t), fi) =>
                    FuzzHarness.scalarOf(el.get(fi), t) })
              val flat = spark.createDataFrame(rows.asJava, schema)
              val nested = NestedOps.fromFlat(flat, Seq("a"),
                "pos" +: fTypes.map(_._1), Seq("k"), "nf",
                sortBy = Seq(("pos", true)))
              compareFrame(nested, c.get("expect"))
            case "pack" =>
              // construction parity: REBUILD both nests with
              // joinNested/packFlat from flat child rows (keyed,
              // pos-sorted) — must reproduce the reference's add_nested
              // frame exactly (cells in child order, absent keys NULL)
              import org.apache.spark.sql.types._
              import org.apache.spark.sql.Row
              val frame = c.get("frame")
              val ks = frame.get("k").elements().asScala
                .map(_.asLong()).toVector
              val baseNames = frame.get("base").fieldNames().asScala.toVector
              val baseDf = df.select(("k" +: baseNames).map(col): _*)
              def childDf(nest: String) = {
                val ninfo = frame.get("nests").get(nest)
                val fields = ninfo.get("fields").elements().asScala
                  .map(f => (f.get(0).asText(), f.get(1).asText())).toVector
                val schema = StructType(
                  StructField("k", LongType, nullable = false) +:
                    StructField("__pos", LongType, nullable = false) +:
                    fields.map { case (f, t) =>
                      StructField(f, FuzzHarness.sparkType(t), nullable = true)
                    }.toArray)
                val rows = for {
                  (k, i) <- ks.zipWithIndex
                  cell = ninfo.get("cells").get(i)
                  if !(cell == null || cell.isNull)
                  (el, j) <- cell.elements().asScala.zipWithIndex.toSeq
                } yield Row.fromSeq(k +: j.toLong +:
                  fields.zipWithIndex.map { case ((_, t), fi) =>
                    FuzzHarness.scalarOf(el.get(fi), t) })
                spark.createDataFrame(rows.asJava, schema)
              }
              val packed = NestedOps.joinNested(
                NestedOps.joinNested(baseDf, childDf("n"), Seq("k"), "n",
                  "left", sortBy = Seq(("__pos", true))),
                childDf("m"), Seq("k"), "m", "left",
                sortBy = Seq(("__pos", true)))
              compareFrame(packed, c.get("expect"))
            case "describe" =>
              // reference describe() ≡ describeAll long rows pivoted:
              // same stats, same pandas percentile interpolation; the
              // percentiles= variant pins the auto-median + sort contract
              val pcts =
                if (args.has("percentiles"))
                  args.get("percentiles").elements().asScala
                    .map(_.asDouble()).toSeq
                else Seq(0.25, 0.5, 0.75)
              val got = NestedOps.describeAll(df.drop("k"),
                percentiles = pcts).collect()
                .map(r => (r.getString(0), r.getString(1)) -> r.get(2)).toMap
              val cols = c.get("expect").get("cols")
              cols.fieldNames().asScala.flatMap { col0 =>
                cols.get(col0).fieldNames().asScala.flatMap { stat =>
                  got.get((col0, stat)) match {
                    case None => Some(s"missing stat ($col0, $stat)")
                    case Some(v) =>
                      if (scalarMatches(v, cols.get(col0).get(stat))) None
                      else Some(s"($col0, $stat): got $v expected " +
                        s"${cols.get(col0).get(stat)}")
                  }
                }
              }.toSeq.headOption
            case "to_lists" =>
              val got = NestedOps.toLists(df, "n", Seq("k"))
                .orderBy(col("k")).collect()
              val expect = c.get("expect")
              val expK = expect.get("k").elements().asScala
                .map(_.asLong()).toVector
              val lists = expect.get("lists")
              val bySortedK = expK.zipWithIndex.sortBy(_._1).map(_._2)
              var d: Option[String] = None
              for ((row, gi) <- got.zipWithIndex if d.isEmpty;
                   f <- lists.fieldNames().asScala if d.isEmpty) {
                val gotV = row.get(row.fieldIndex(f))
                val exp = lists.get(f).get(bySortedK(gi))
                if (!scalarMatches(gotV, exp))
                  d = Some(s"k=${row.getAs[Long]("k")} list '$f': got $gotV expected $exp")
              }
              if (got.length != expK.length)
                d = Some(s"rows: got ${got.length} expected ${expK.length}")
              d
            case "join_how" =>
              // join_nested(how=) alignment: base columns vs a child
              // whose per-cell keys were remapped (kept / shifted out of
              // range / merged / dropped); probe-pinned right/outer key
              // sets. Global __pos keeps merged cells in input row order.
              import org.apache.spark.sql.types._
              import org.apache.spark.sql.Row
              val frame = c.get("frame")
              val how = args.get("how").asText()
              val ks = frame.get("k").elements().asScala
                .map(_.asLong()).toVector
              val childKeys = args.get("child_keys").elements().asScala
                .toVector
              val baseNames = frame.get("base").fieldNames().asScala.toVector
              val baseDf = df.select(("k" +: baseNames).map(col): _*)
              val ninfo = frame.get("nests").get("n")
              val fTypes = ninfo.get("fields").elements().asScala
                .map(f => (f.get(0).asText(), f.get(1).asText())).toVector
              val childSchema = StructType(
                StructField("k", LongType, nullable = false) +:
                  StructField("__pos", LongType, nullable = false) +:
                  fTypes.map { case (f, t) =>
                    StructField(f, FuzzHarness.sparkType(t), nullable = true)
                  }.toArray)
              var pos = -1L
              val childRows = for {
                (ck, i) <- childKeys.zipWithIndex
                if !(ck == null || ck.isNull)
                cell = ninfo.get("cells").get(i)
                if !(cell == null || cell.isNull)
                el <- cell.elements().asScala.toSeq
              } yield {
                pos += 1
                Row.fromSeq(ck.asLong() +: pos +:
                  fTypes.zipWithIndex.map { case ((_, t), fi) =>
                    FuzzHarness.scalarOf(el.get(fi), t) })
              }
              val childDf = spark.createDataFrame(childRows.asJava,
                childSchema)
              compareFrame(NestedOps.joinNested(baseDf, childDf, Seq("k"),
                "n", how, sortBy = Seq(("__pos", true))), c.get("expect"))
            case "take" =>
              // ExtensionArray.take semantics (negative wrap / allow_fill /
              // raise contract): result is POSITIONAL — duplicate source
              // keys are legal, fill rows are all-NULL (pos_k null)
              val af = args.get("allow_fill").asBoolean()
              val indices = args.get("indices").elements().asScala
                .map(_.asLong()).toSeq
              val expect = c.get("expect")
              if (expect.has("raises")) {
                val thrown =
                  try {
                    NestedOps.takeRows(df, "k", indices, allowFill = af)
                      .collect(); false
                  } catch { case _: Throwable => true }
                if (thrown) None
                else Some(s"expected ${expect.get("raises").asText()}, " +
                  "engine returned rows")
              } else {
                val got = NestedOps.takeRows(df, "k", indices,
                  allowFill = af).collect()
                val posK = expect.get("pos_k")
                val baseCols = expect.get("base").fieldNames().asScala.toVector
                val nests = expect.get("nests")
                var d: Option[String] = None
                if (got.length != posK.size())
                  d = Some(s"rows: got ${got.length} expected ${posK.size()}")
                for ((row, i) <- got.zipWithIndex if d.isEmpty) {
                  val gotK = row.get(row.fieldIndex("k"))
                  if (!scalarMatches(gotK, posK.get(i)))
                    d = Some(s"pos $i k: got $gotK expected ${posK.get(i)}")
                  for (cn <- baseCols if d.isEmpty) {
                    val gotV = row.get(row.fieldIndex(cn))
                    val exp = expect.get("base").get(cn).get(i)
                    if (!scalarMatches(gotV, exp))
                      d = Some(s"pos $i base '$cn': got $gotV expected $exp")
                  }
                  for (n <- nests.fieldNames().asScala if d.isEmpty) {
                    val ninfo = nests.get(n)
                    val fields = ninfo.get("fields").elements().asScala
                      .map(_.asText()).toVector
                    val expCell = ninfo.get("cells").get(i)
                    val fi = row.fieldIndex(n)
                    val gotCell =
                      if (row.isNullAt(fi)) null else row.getSeq[Row](fi)
                    if (gotCell == null || expCell == null || expCell.isNull) {
                      if (!(gotCell == null &&
                          (expCell == null || expCell.isNull)))
                        d = Some(s"pos $i nest '$n' cell null-ness mismatch")
                    } else {
                      val expEls = expCell.elements().asScala.toVector
                      if (gotCell.length != expEls.length)
                        d = Some(s"pos $i nest '$n' length: got " +
                          s"${gotCell.length} expected ${expEls.length}")
                      else for ((el, j) <- gotCell.zipWithIndex if d.isEmpty;
                                (f, fj) <- fields.zipWithIndex if d.isEmpty) {
                        val gotV = el.get(el.fieldIndex(f))
                        if (!scalarMatches(gotV, expEls(j).get(fj)))
                          d = Some(s"pos $i nest '$n'[$j].$f: got $gotV " +
                            s"expected ${expEls(j).get(fj)}")
                      }
                    }
                  }
                }
                d
              }
            case "zip_nests" =>
              // nf['z'] = nf[['n', 'm']]: fields flattened in source order
              // (sources kept — the reference assignment doesn't consume)
              compareFrame(NestedOps.zipNests(df, Seq("n", "m"), "z",
                dropSource = false), c.get("expect"))
            case "explode_multi" =>
              // aligned multi-column explode: one generator over both
              // nests; missing-both rows keep one all-NULL row
              // (keepEmpty); mismatched counts raise via the size guard
              val expect = c.get("expect")
              if (expect.has("raises")) {
                val thrown =
                  try {
                    NestedOps.explodeAligned(df, Seq("n", "m"),
                      keepEmpty = true).collect(); false
                  } catch { case _: Throwable => true }
                if (thrown) None
                else Some(s"expected ${expect.get("raises").asText()} on " +
                  "mismatched element counts, engine returned rows")
              } else
                compareFlat(NestedOps.explodeAligned(df, Seq("n", "m"),
                  keepEmpty = true), expect)
            case "set_list" =>
              // accessor set_list_column: per-row lists, strict length
              // guard — a mismatched or NULL list raises like the
              // reference's ValueError (withNestedFieldFromList strict)
              import org.apache.spark.sql.functions._
              val lists: Seq[Option[Seq[Option[Double]]]] =
                args.get("lists").elements().asScala.map { l =>
                  if (l.isNull) None
                  else Some(l.elements().asScala.map(v =>
                    if (v.isNull) None else Some(v.asDouble())).toSeq)
                }.toSeq
              val field = args.get("field").asText()
              val withL = df.withColumn("__lst",
                element_at(typedLit(lists), col("k").cast("int") + 1))
              val expect = c.get("expect")
              if (expect.has("raises")) {
                val thrown =
                  try {
                    NestedOps.withNestedFieldFromList(withL, "n", field,
                      "__lst").collect(); false
                  } catch { case _: Throwable => true }
                if (thrown) None
                else Some(s"expected ${expect.get("raises").asText()} on " +
                  "mismatched list length, engine returned rows")
              } else
                compareFrame(NestedOps.withNestedFieldFromList(withL, "n",
                  field, "__lst").drop("__lst"), expect)
            case "drop_fields" =>
              // accessor drop: drop-all and unknown-name raise parity
              val fields = args.get("fields").elements().asScala
                .map(_.asText()).toSeq
              val expect = c.get("expect")
              if (expect.has("raises")) {
                val thrown =
                  try {
                    NestedOps.dropNestedFields(df, "n", fields)
                      .collect(); false
                  } catch { case _: Throwable => true }
                if (thrown) None
                else Some(s"expected ${expect.get("raises").asText()}, " +
                  "engine returned rows")
              } else
                compareFrame(NestedOps.dropNestedFields(df, "n", fields),
                  expect)
            case "nest_lists" =>
              import org.apache.spark.sql.types._
              import org.apache.spark.sql.Row
              val frame = c.get("frame")
              val ks = frame.get("k").elements().asScala.map(_.asLong()).toVector
              val schema = StructType(Array(
                StructField("k", LongType, nullable = false),
                StructField("a", LongType, nullable = true),
                StructField("c", ArrayType(DoubleType, containsNull = true),
                  nullable = true),
                StructField("d", ArrayType(LongType, containsNull = true),
                  nullable = true)))
              val rows = ks.indices.map { i =>
                val cArr = frame.get("c").get(i).elements().asScala
                  .map(v => if (v.isNull) null
                    else (v.asDouble(): java.lang.Double)).toSeq
                val dArr = frame.get("d").get(i).elements().asScala
                  .map(v => (v.asLong(): java.lang.Long)).toSeq
                Row(ks(i), frame.get("a").get(i).asLong(), cArr, dArr)
              }
              val df2 = spark.createDataFrame(rows.asJava, schema)
              val expect = c.get("expect")
              if (expect.has("raises")) {
                val thrown =
                  try {
                    NestedOps.fromLists(df2, Seq("c", "d"), "n")
                      .collect(); false
                  } catch { case _: Throwable => true }
                if (thrown) None
                else Some(s"expected ${expect.get("raises").asText()} on " +
                  "mismatched list lengths, engine returned rows")
              } else
                compareFrame(NestedOps.fromLists(df2, Seq("c", "d"), "n"),
                  expect)
            case "reduce" =>
              // NestedFrame.reduce -> MapRows (the typed map_rows
              // surface). Kernels mirror the generator's numpy calls:
              // arrow NA launders to NaN and PROPAGATES through
              // mean/sum/min/max/std (probe 2026-08-14); np.mean([]) is
              // NaN, np.sum([]) is 0.0, x.size counts NaN elements.
              import org.apache.spark.sql.types._
              import graft.nested.MapRows
              val kernel = args.get("kernel").asText()
              val cName = args.get("col").asText()
              def num(v: Any): Double = v match {
                case null                 => Double.NaN
                case d: java.lang.Double  => d
                case l: java.lang.Long    => l.toDouble
                case i: java.lang.Integer => i.toDouble
                case f: java.lang.Float   => f.toDouble
              }
              def seqOf(v: Any): Seq[Any] = v match {
                case null                       => Seq.empty
                case s: scala.collection.Seq[_] => s.toSeq
              }
              def red(vs: Seq[Any], empty: Double,
                      f: Seq[Double] => Double): Double = {
                val ds = vs.map(num)
                if (ds.isEmpty) empty
                else if (ds.exists(_.isNaN)) Double.NaN
                else f(ds)
              }
              def kSchema(fs: StructField*) = StructType(
                StructField("k", LongType, nullable = false) +: fs)
              val out = kernel match {
                case "size" =>
                  MapRows.mapRows(df, Seq("k", cName),
                    kSchema(StructField("r", LongType))) {
                    case Seq(k, xs) => Seq(k, seqOf(xs).length.toLong)
                  }
                case "mean_minus_base" =>
                  MapRows.mapRows(df, Seq("k", "a", cName),
                    kSchema(StructField("r", DoubleType))) {
                    case Seq(k, a, xs) =>
                      Seq(k, red(seqOf(xs), Double.NaN,
                        ds => ds.sum / ds.length) - num(a))
                  }
                case "offsets" =>
                  MapRows.mapRows(df, Seq("k", "a", cName),
                    kSchema(StructField("off.d", ArrayType(DoubleType))),
                    inferNesting = true) {
                    case Seq(k, a, xs) =>
                      val av = num(a)
                      Seq(k, seqOf(xs).map(v => num(v) - av))
                  }
                case "append_max" =>
                  MapRows.mapRowsAppend(df, "k", Seq(cName),
                    StructType(Seq(StructField("mx", DoubleType)))) {
                    case Seq(xs) =>
                      Seq(red(seqOf(xs), Double.NaN, _.max))
                  }
                case _ =>
                  val f: (Seq[Any] => Double) = kernel match {
                    case "mean" => red(_, Double.NaN, ds => ds.sum / ds.length)
                    case "sum"  => red(_, 0.0, _.sum)
                    case "min"  => red(_, Double.NaN, _.min)
                    case "max"  => red(_, Double.NaN, _.max)
                    case "std" => red(_, Double.NaN, { ds =>
                      val m = ds.sum / ds.length
                      math.sqrt(ds.map(v => (v - m) * (v - m)).sum / ds.length)
                    })
                  }
                  MapRows.mapRows(df, Seq("k", cName),
                    kSchema(StructField("r", DoubleType))) {
                    case Seq(k, xs) => Seq(k, f(seqOf(xs)))
                  }
              }
              compareFrame(out, c.get("expect"))
            case _ =>
              compareFrame(runOp(df, op, args), c.get("expect"))
          }
        } catch {
          case e: Throwable =>
            Some(s"ENGINE THREW ${e.getClass.getSimpleName}: " +
              s"${Option(e.getMessage).getOrElse("").take(200)}")
        }
      diff.foreach(d =>
        failures ::= s"case $id [$op ${c.get("args")}]: $d")
    }
    if (failures.nonEmpty)
      fail(s"${failures.length}/${cases.length} op-fuzz cases diverged:\n" +
        failures.reverse.take(25).mkString("\n"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DataType, DateType, DecimalType,
  LongType, NumericType, StructField, StructType, TimestampNTZType,
  TimestampType}

/** Time-series joins Spark lacks as built-ins, expressed in the shapes
  * that survive 100 TB.
  *
  * [[asofJoin]] deliberately avoids the naive range-join formulation
  * (`l JOIN r ON l.key = r.key AND r.ts <= l.ts` + max-per-pair), which
  * materializes every (left, earlier-right) pair — quadratic per key —
  * before aggregating it back down. Instead both sides are UNIONED and
  * swept once per key in time order: one shuffle on the key, one ordered
  * window, linear work, no pair blow-up. This is the standard distributed
  * as-of plan (what a MERGE_ASOF does on sorted partitions).
  */
object Joins {

  /** Zone-free wall-clock epoch micros of a TimestampNTZ column. NTZ is
    * wall-clock with no zone, so its micros come from CALENDAR-FIELD
    * arithmetic (days since epoch + time-of-day) — a TimestampType cast
    * would route through the session zone and shift values exactly across
    * a DST transition, which is not what pandas computes on naive
    * datetime64 (merge_asof distances, epoch arithmetic). */
  private[graft] def ntzWallClockMicros(c: Column): Column =
    datediff(c.cast(DateType), lit(java.sql.Date.valueOf("1970-01-01")))
      .cast(LongType) * lit(86400000000L) +
      hour(c).cast(LongType) * lit(3600000000L) +
      minute(c).cast(LongType) * lit(60000000L) +
      call_function("date_part", lit("SECOND"), c)
        .cast(DecimalType(20, 6)).*(lit(1000000L)).cast(LongType)

  private def isTsType(dt: DataType): Boolean =
    dt == TimestampType || dt == TimestampNTZType

  /** Bounded interval (range) join: all right rows with
    * `l.ts <= r.ts < l.ts + windowLen` per key — "events within Δ after
    * each anchor". The naive `ON key AND r.ts BETWEEN …` plan is a
    * BroadcastNestedLoop or a per-key cross; this BANDS time into
    * `windowLen`-sized buckets and duplicates each right row into its band
    * and the preceding one (an interval of length Δ overlaps at most 2
    * such bands), so the join is a plain equi-join on (key, band) plus an
    * exact residual filter — one keyed shuffle per side, 2× right
    * duplication, no pair blow-up. */
  def rangeJoin(left: DataFrame, right: DataFrame, keyCol: String,
                tsCol: String, windowLen: Long,
                rightPrefix: String = "r_"): DataFrame = {
    require(windowLen > 0, s"rangeJoin: windowLen must be > 0, got $windowLen")
    require(rightPrefix.nonEmpty,
      "rangeJoin: rightPrefix must be non-empty (right columns would " +
        "collide with left's)")
    val rightPayload = right.columns.filterNot(_ == keyCol).toSeq
    val l = left.withColumn("__band", expr(s"$tsCol DIV $windowLen"))
    val r = right
      .select((col(keyCol) +: rightPayload.map(c =>
        col(c).as(s"$rightPrefix$c"))): _*)
      .withColumn("__band", explode(array(
        expr(s"$rightPrefix$tsCol DIV $windowLen"),
        expr(s"$rightPrefix$tsCol DIV $windowLen - 1"))))
    l.join(r, Seq(keyCol, "__band"))
      .where(col(s"$rightPrefix$tsCol") >= col(tsCol) &&
        col(s"$rightPrefix$tsCol") < col(tsCol) + windowLen)
      .drop("__band")
  }

  /** As-of join, pandas-`merge_asof`-complete: per key, match each left
    * row to the right row whose timestamp is
    *  - `direction="backward"` (default): latest with `r.ts <= l.ts`;
    *  - `direction="forward"`: earliest with `r.ts >= l.ts`;
    *  - `direction="nearest"`: smaller absolute ts distance of the two
    *    (equal distance → the backward match, distance 0 included).
    * Emits every left row with the matched right payload columns (NULL
    * when nothing matches). Right columns keep their names with an
    * optional `rightPrefix`. Ties (equal ts): the right row at the same
    * timestamp DOES match in every direction — DuckDB/pandas `ASOF JOIN`
    * semantics. Among equal-ts right rows the `rightTieBreak` ordering
    * picks the winner deterministically (last for backward, first for
    * forward). `tolerance` nulls out matches farther than the bound, like
    * pandas' `tolerance=`: same units as the ts column when it is numeric,
    * MILLISECONDS when it is a timestamp (pandas `Timedelta` parity — the
    * common astronomy/log-data case; reference merge_asof docs).
    *
    * Every direction is the same one-shuffle union-sweep: nearest runs
    * TWO window sweeps over the one keyed partitioning (a second sort,
    * never a second shuffle). */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String, rightPrefix: String = "",
               rightTieBreak: Seq[String] = Nil,
               direction: String = "backward",
               tolerance: Option[Long] = None): DataFrame =
    asofJoinBy(left, right, Seq(keyCol), tsCol, rightPrefix, rightTieBreak,
      direction, tolerance)

  /** Multi-key form — pandas `merge_asof(by=[...])`: the sweep partitions
    * on the composite key; everything else is identical to [[asofJoin]]. */
  def asofJoinBy(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                 tsCol: String, rightPrefix: String = "",
                 rightTieBreak: Seq[String] = Nil,
                 direction: String = "backward",
                 tolerance: Option[Long] = None): DataFrame = {
    require(keyCols.nonEmpty, "asofJoinBy: at least one key column required")
    require(Set("backward", "forward", "nearest")(direction),
      s"asofJoin: direction must be backward|forward|nearest, got '$direction'")
    val tsDt = right.schema(tsCol).dataType
    tolerance.foreach { t =>
      require(t >= 0, s"asofJoin: tolerance must be >= 0, got $t")
      require(tsDt.isInstanceOf[NumericType] || isTsType(tsDt),
        "asofJoin: tolerance requires a numeric or timestamp ts column " +
          s"(got $tsDt); tolerance is in ms for timestamp columns")
    }
    // Distance arithmetic view of a ts value: raw for numeric columns,
    // epoch micros for timestamps (a timestamp tolerance is given in ms,
    // so scale it to micros). NTZ is wall-clock with no zone, so its
    // micros come from CALENDAR-FIELD arithmetic (days since epoch +
    // time-of-day) — a TimestampType cast would route through the session
    // zone and shift distances exactly across a DST transition, which is
    // not what pandas merge_asof on naive datetime64 computes.
    def tsNum(c: Column): Column = tsDt match {
      case TimestampNTZType => Joins.ntzWallClockMicros(c)
      case TimestampType    => unix_micros(c)
      case _                => c
    }
    val tolUnits = tolerance.map(t => if (isTsType(tsDt)) t * 1000L else t)
    val rightPayload = right.columns.filterNot(c =>
      keyCols.contains(c) || c == tsCol).toSeq
    val leftCols = left.columns.toSeq
    // Output columns are left's plus the (prefixed) right payload — a
    // collision would produce two same-named output columns, ambiguous to
    // every downstream reference. Fail here instead.
    val collisions = rightPayload.map(c => s"$rightPrefix$c")
      .toSet.intersect(leftCols.toSet)
    require(collisions.isEmpty,
      s"asofJoin: right payload column(s) ${collisions.mkString(", ")} " +
        "collide with left columns; pass a non-colliding rightPrefix")
    // one struct per right row, ordered-window-swept below; tie-break
    // fields order equal-ts right rows inside the last() (the struct's
    // leading ts field keeps later rows last under the window order)
    val rStruct = struct((Seq(col(tsCol).as("__rts")) ++
      rightTieBreak.map(c => col(c).as(s"__tb_$c")) ++
      rightPayload.map(c => col(c).as(c))): _*)
    val rType = StructType(
      StructField("__rts", right.schema(tsCol).dataType) +:
      (rightTieBreak.map(c =>
        StructField(s"__tb_$c", right.schema(c).dataType)) ++
       rightPayload.map(c => StructField(c, right.schema(c).dataType))))
    // Side ordering at EQUAL ts decides inclusivity: backward/nearest put
    // right rows BEFORE left rows (side 0 < 1) so an equal-ts right is
    // inside the preceding frame; forward puts them AFTER so it is inside
    // the following frame. Among equal-ts rights, order by ONLY
    // (__rts, tie-break fields) — not the whole __r struct — so wide
    // payloads aren't compared in the sort and unorderable payload types
    // (e.g. map) don't fail analysis. With duplicate-ts right rows and no
    // rightTieBreak the winner among them is unspecified (the documented
    // contract: pass rightTieBreak for determinism).
    val (lSide, rSide) = if (direction == "forward") (0, 1) else (1, 0)
    val l = left.select(
      (leftCols.map(col) :+ lit(lSide).as("__side") :+
        lit(null).cast(rType).as("__r")): _*)
    val r = right.select(
      (leftCols.map(c => if (keyCols.contains(c) || c == tsCol) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) :+
        lit(rSide).as("__side") :+ rStruct.as("__r")): _*)
    val ordCols = col("__r.__rts") +:
      rightTieBreak.map(c => col(s"__r.__tb_$c"))
    val ordered = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((col(tsCol) +: col("__side") +: ordCols): _*)
    val wB = ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the forward sweep is `last` over the REVERSE-ordered prefix, not
    // `first` over (currentRow, unboundedFollowing): Spark's unbounded-
    // following frame re-aggregates from scratch per row — O(n²) on a
    // hot key (r12; same fix as InheritedOps.interpolateLinear). The
    // reversed sort shares the keyed partitioning — no extra shuffle.
    val orderedRev = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((col(tsCol).desc +: col("__side").desc +:
        ordCols.map(_.desc)): _*)
    val wFrev = orderedRev.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    // tolerance nulls out matches farther than the bound (pandas semantics)
    def within(m: Column): Column = tolUnits match {
      case Some(t) =>
        when(abs(tsNum(col(tsCol)) - tsNum(m.getField("__rts"))) <= t, m)
      case None => m
    }
    val backMatch = within(last(col("__r"), ignoreNulls = true).over(wB))
    val fwdMatch = within(last(col("__r"), ignoreNulls = true).over(wFrev))
    val union = l.unionByName(r)
    val swept = direction match {
      case "backward" => union.withColumn("__match", backMatch)
      case "forward" => union.withColumn("__match", fwdMatch)
      case "nearest" =>
        // two sweeps over ONE keyed partitioning (second sort, no second
        // shuffle). Equal-ts rights are only in the backward frame, which
        // is exactly the distance-0 tie the backward arm is meant to win.
        union.withColumn("__b", backMatch).withColumn("__f", fwdMatch)
          .withColumn("__match",
            when(col("__b").isNull, col("__f"))
              .when(col("__f").isNull, col("__b"))
              .when(tsNum(col(tsCol)) - tsNum(col("__b.__rts")) <=
                tsNum(col("__f.__rts")) - tsNum(col(tsCol)), col("__b"))
              .otherwise(col("__f")))
          .drop("__b", "__f")
    }
    swept.where(col("__side") === lit(lSide))
      .select((leftCols.map(col) :+
        col("__match").as("__m")): _*)
      .select((leftCols.map(col) ++
        rightPayload.map(c =>
          col(s"__m.$c").as(s"$rightPrefix$c"))): _*)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The inherited-pandas frame verbs whose semantics are NOT the obvious
  * one-liner — tie policies, NaN padding, nest-cell behavior, numpy's
  * scaled rounding — shipped as library surface so a reference user gets
  * the pinned behavior instead of re-deriving it. Every function here is
  * replayed against the executed reference by the op-fuzz corpus
  * (families `nlargest`, `value_counts`, `where_mask`, `replace_vals`,
  * `round_base`, `shift_rows`, `fill_dir`; see COVERAGE.md §2.8).
  *
  * Row order: pandas breaks ties by ROW POSITION. Spark frames have no
  * implicit position, so these functions take the ordering column
  * explicitly (`tieCol`/`orderCol`) — the same carried-index contract as
  * the rest of graft (reference nestedframe/core.py keeps the pandas
  * index for this).
  *
  * Missing values: pandas has ONE missing marker (NaN doubles as NA in
  * float columns); Spark has TWO (SQL NULL, and the IEEE NaN value —
  * which sorts ABOVE every number and groups as its own key). These
  * verbs normalize NaN → NULL on the float/double columns they rank,
  * group, fill, or read for overwrite (via [[nanAsNull]]), so a literal
  * NaN behaves as missing exactly like pandas. Callers that genuinely
  * want IEEE NaN ordering must handle it before calling in.
  */
object InheritedOps {

  /** NaN → NULL on the named float/double columns (non-float columns
    * and names absent from the frame pass through untouched). One
    * `nanvl` projection — free under codegen. */
  private def nanAsNull(df: DataFrame, cols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types.{DoubleType, FloatType}
    val floaty = df.schema.fields.collect {
      case f if cols.contains(f.name) &&
        (f.dataType == DoubleType || f.dataType == FloatType) => f.name
    }.toSet
    if (floaty.isEmpty) df
    else df.select(df.columns.map { c =>
      if (floaty.contains(c)) nanvl(col(c), lit(null)).as(c) else col(c)
    }.toSeq: _*)
  }

  /** Fail loudly (like pandas update's ValueError on a non-unique other
    * index) if `key` is non-unique in `df`: a duplicate key on the
    * `other` side of update would silently MULTIPLY rows through the
    * join. Used by [[updateFrom]] ONLY — pandas combine_first ACCEPTS
    * duplicate other-keys and multiplies (probe 2026-08-16, r12 review).
    * One window over the join key — the exchange it introduces is the
    * same hash partitioning the join needs, so AQE reuses it. */
  private def requireUniqueKey(df: DataFrame, key: String,
                               verb: String): DataFrame = {
    // The window count is materialized in a projection (windows are not
    // legal in WHERE) and the raise_error lives in the FILTER that reads
    // it — a filter can't be pruned away, so the guard always executes.
    df.withColumn("__kc",
        count(lit(1)).over(Window.partitionBy(col(key))))
      .where(when(col("__kc") > 1, raise_error(concat(
          lit(s"$verb: duplicate key in other frame: $key="),
          col(key).cast("string")))).otherwise(lit(true)))
      .drop("__kc")
  }

  /** pandas `nlargest`/`nsmallest(n, column, keep=)` — SINGLE sort
    * column, n < row count (the contract the reference actually honors:
    * beyond it pandas falls to an unstable quicksort, and its
    * multi-column path can return MORE than n rows on a NaN border —
    * probed 2026-08-16, PARITY.md).
    *
    * Missing values rank below every present value but still fill
    * remaining slots in `tieCol` order (pandas pads from `nan_index`).
    * keep='first' breaks ties by `tieCol` asc, 'last' by desc, 'all'
    * extends the boundary tie group (computed scale-safely: top-n via
    * sort+limit — Spark's TakeOrderedAndProject — then a boundary-value
    * semi-filter, no global window). */
  def nLargest(df: DataFrame, n: Int, valueCol: String, tieCol: String,
               keep: String = "first", smallest: Boolean = false): DataFrame = {
    val valOrd = if (smallest) col(valueCol).asc_nulls_last
                 else col(valueCol).desc_nulls_last
    require(Seq("first", "last", "all").contains(keep),
      s"keep must be first|last|all, got '$keep'")
    if (n <= 0) return df.limit(0)
    val df0 = nanAsNull(df, Seq(valueCol))
    keep match {
      case "all" =>
        // boundary value of the strict top-n (ties broken arbitrarily —
        // only the VALUE is used), then keep everything not strictly
        // worse. NULLs join the result only when the top-n itself ran
        // into the NULL tail.
        val top = df0.orderBy(valOrd).limit(n)
        val b = top.agg(
          (if (smallest) max(col(valueCol)) else min(col(valueCol)))
            .as("__b"),
          count(lit(1)).as("__cnt"),
          count(col(valueCol)).as("__nonnull")).head()
        val hasNullBoundary = b.getLong(2) < b.getLong(1)
        val bound = b.get(0)
        val cmp =
          if (bound == null) lit(true) // top-n all-null: keep null rows
          else if (smallest) col(valueCol) <= lit(bound)
          else col(valueCol) >= lit(bound)
        val keepNulls = bound == null || hasNullBoundary
        df0.where(if (keepNulls) cmp || col(valueCol).isNull else cmp)
          .orderBy(valOrd, col(tieCol).asc)
      case k =>
        val tie = if (k == "first") col(tieCol).asc else col(tieCol).desc
        df0.orderBy(valOrd, tie).limit(n)
    }
  }

  /** pandas `value_counts(subset=, normalize=, dropna=)` with the
    * CANONICAL (count desc, keys asc, NULL keys last) output order —
    * pandas' own tie order under `sort_values` is not a contract (it
    * quicksorts), so both graft and the fuzz oracle pin this one. The
    * count/proportion column is named like pandas ('count' /
    * 'proportion'). One keyed shuffle + a broadcast of the scalar total
    * for normalize — no global window. */
  def valueCounts(df: DataFrame, subset: Seq[String],
                  normalize: Boolean = false,
                  dropna: Boolean = true): DataFrame = {
    val df0 = nanAsNull(df, subset)
    val src = if (dropna)
      subset.foldLeft(df0)((d, cn) => d.where(col(cn).isNotNull))
    else df0
    val counted = src.groupBy(subset.map(col): _*)
      .agg(count(lit(1)).as("count"))
    val valcol = if (normalize) "proportion" else "count"
    val out =
      if (normalize)
        counted.crossJoin(
            broadcast(counted.agg(sum(col("count")).as("__t"))))
          .withColumn("proportion", col("count") / col("__t"))
          .drop("count", "__t")
      else counted
    out.orderBy(col(valcol).desc +: subset.map(col(_).asc_nulls_last): _*)
  }

  /** pandas frame-level `where(cond)`: rows where `cond` is not TRUE
    * keep their shape but every column — nest cells included — becomes
    * missing. `cond` is 2-valued like pandas (a NULL comparison acts
    * False); `keepCols` (e.g. the key/index columns) pass through. */
  def whereCond(df: DataFrame, cond: Column,
                keepCols: Set[String] = Set.empty): DataFrame =
    df.select(df.columns.map { c =>
      if (keepCols.contains(c)) col(c)
      else when(cond, col(c)).as(c)
    }.toSeq: _*)

  /** pandas `mask(cond)` — the complement: rows where `cond` IS true
    * become missing (NULL cond keeps the value, matching pandas' 2-valued
    * condition). */
  def maskCond(df: DataFrame, cond: Column,
               keepCols: Set[String] = Set.empty): DataFrame =
    df.select(df.columns.map { c =>
      if (keepCols.contains(c)) col(c)
      else when(cond, lit(null)).otherwise(col(c)).as(c)
    }.toSeq: _*)

  /** pandas `replace({column: mapping})`: SIMULTANEOUS mapping over the
    * original values (no re-replacement chains), NULLs untouched. */
  def replaceValues(df: DataFrame, column: String,
                    mapping: Seq[(Any, Any)]): DataFrame = {
    val repl = mapping.foldLeft(col(column)) { case (acc, (from, to)) =>
      when(col(column) === lit(from), lit(to)).otherwise(acc)
    }
    df.withColumn(column, repl)
  }

  /** pandas/numpy `round(decimals)` for one DOUBLE column: np.around is
    * rint(x·10^d)/10^d — half-even on the SCALED double, which differs
    * from `bround(x, d)` exactly at representation boundaries
    * (np.round(1.275, 2) = 1.27; bround gives 1.28). `bround(y, 0)` ≡
    * rint, so the scaled form is numpy-bit-exact. */
  def roundLikeNumpy(c: Column, decimals: Int): Column = {
    val p = math.pow(10.0, decimals)
    bround(c * lit(p), 0) / lit(p)
  }

  /** `df[df.duplicated(subset, keep=)]` — the rows MARKED duplicate
    * (complement of drop_duplicates): keep='first' marks all but the
    * first occurrence per subset-key group (by `orderCol`), 'last' all
    * but the last, keep=False marks every member of any group of size
    * > 1. NULL subset keys group together, like pandas NaN==NaN here.
    * One keyed window. */
  def duplicateRows(df: DataFrame, subset: Seq[String], keep: String,
                    orderCol: String): DataFrame = {
    val part = Window.partitionBy(subset.map(col): _*)
    keep match {
      case "first" | "last" =>
        val w = part.orderBy(
          if (keep == "first") col(orderCol).asc else col(orderCol).desc)
        df.withColumn("__rn", row_number().over(w))
          .where(col("__rn") > 1).drop("__rn")
      case "false" =>
        df.withColumn("__cnt", count(lit(1)).over(part))
          .where(col("__cnt") > 1).drop("__cnt")
      case other => throw new IllegalArgumentException(
        s"keep must be first|last|false, got '$other'")
    }
  }

  /** pandas `combine_first(other)`: outer-align on `key`, take this
    * frame's value where present else `other`'s — per CELL for nest
    * columns (a missing cell fills from the other frame's cell whole).
    * Columns only in `other` are appended; rows only in `other`
    * contribute their values with this frame's extra columns missing.
    * The shard-merge verb: one outer keyed join, no window. */
  def combineFirst(df: DataFrame, other: DataFrame,
                   key: String): DataFrame = {
    val shared = other.columns.toSet.intersect(df.columns.toSet) - key
    val extra = other.columns.filterNot(c => c == key ||
      df.columns.contains(c))
    // NaN counts as missing on BOTH sides (a NaN cell in `df` fills from
    // `other`, like pandas). Duplicate keys in `other` are ACCEPTED and
    // multiply rows through the outer join — pandas combine_first does
    // exactly that (probe 2026-08-16, r12 review; only `update` raises).
    val df1 = nanAsNull(df, shared.toSeq)
    val o = nanAsNull(other, shared.toSeq).select(col(key) +:
      other.columns.filterNot(_ == key)
        .map(cn => col(cn).as("__o_" + cn)).toSeq: _*)
    df1.join(o, Seq(key), "outer")
      .select(col(key) +:
        (df.columns.filterNot(_ == key).map { cn =>
          if (shared.contains(cn))
            coalesce(col(cn), col("__o_" + cn)).as(cn)
          else col(cn)
        } ++ extra.map(cn => col("__o_" + cn).as(cn))).toSeq: _*)
  }

  /** pandas `update(other)`: overwrite this frame's values with
    * `other`'s NON-missing values on the key intersection (missing in
    * `other` never erases a present value; rows/columns only in `other`
    * are ignored). One left keyed join. */
  def updateFrom(df: DataFrame, other: DataFrame, key: String): DataFrame = {
    val shared = other.columns.toSet.intersect(df.columns.toSet) - key
    // a NaN in `other` is MISSING — it must not overwrite (pandas
    // update ignores other's NaNs); duplicate keys in `other` raise,
    // like pandas' ValueError on a non-unique other index.
    val o = requireUniqueKey(nanAsNull(other, shared.toSeq), key,
        "updateFrom").select(col(key) +:
      shared.toSeq.map(cn => col(cn).as("__o_" + cn)): _*)
    df.join(o, Seq(key), "left")
      .select(col(key) +: df.columns.filterNot(_ == key).map { cn =>
        if (shared.contains(cn))
          when(col("__o_" + cn).isNotNull, col("__o_" + cn))
            .otherwise(col(cn)).as(cn)
        else col(cn)
      }.toSeq: _*)
  }

  /** pandas `Series.idxmax`/`idxmin`: the carried index of the first
    * occurrence (smallest `idxCol`) of the extreme value, missing
    * skipped (probed 2026-08-16). One aggregate — the max-struct trick
    * (value, then −idx) resolves the tie without a second pass. */
  def idxExtreme(df: DataFrame, valueCol: String, idxCol: String,
                 smallest: Boolean = false): DataFrame = {
    val df0 = nanAsNull(df, Seq(valueCol))
    val v0 = col(valueCol)
    val v = if (smallest) v0 * lit(-1) else v0
    df0.where(v0.isNotNull)
      .agg(max(struct(v.as("v"), (col(idxCol) * -1).as("ni"))).as("m"))
      .select((col("m.ni") * -1).as("idx"))
  }

  /** pandas `Series.mode()`: every value with the maximal count, sorted
    * ascending; missing excluded. Two keyed aggregates, no window. */
  def modeValues(df: DataFrame, column: String): DataFrame = {
    val df0 = nanAsNull(df, Seq(column))
    val counted = df0.where(col(column).isNotNull)
      .groupBy(col(column)).agg(count(lit(1)).as("__c"))
    counted.join(broadcast(counted.agg(max(col("__c")).as("__m"))),
        col("__c") === col("__m"))
      .select(col(column)).orderBy(col(column).asc)
  }

  /** pandas `Series.quantile(q)` (linear interpolation, missing
    * skipped) — Spark's exact `percentile` uses the same continuous
    * definition (probed: q=0.3 over {1,2,3} with NaNs → 1.9 on both). */
  def quantileLinear(df: DataFrame, column: String, q: Double): DataFrame = {
    val df0 = nanAsNull(df, Seq(column))
    df0.agg(percentile(col(column), lit(q)).as("q"))
  }

  /** pandas `Series.nunique(dropna=)`. */
  def nUnique(df: DataFrame, column: String,
              dropna: Boolean = true): DataFrame = {
    val df0 = nanAsNull(df, Seq(column))
    if (dropna) df0.agg(countDistinct(col(column)).as("n"))
    // coalesce: max over an EMPTY frame is NULL, and 0 + NULL would
    // turn pandas' 0 into NULL (r12 review)
    else df0.agg((countDistinct(col(column)) +
      coalesce(max(when(col(column).isNull, 1).otherwise(0)),
        lit(0))).as("n"))
  }

  /** pandas `groupby(key)[value].transform(fn)`: the per-group statistic
    * broadcast back to every row, appended as `transformed`. Probed
    * 2026-08-16: a missing group KEY yields a missing result (groupby
    * dropna default) — even for `size`; `count` counts non-missing
    * values, `size` counts rows; `sum` is min_count=0 (an all-missing
    * group reads 0.0, not missing). One keyed window — the 100 TB
    * lag-features shape, no global ordering. */
  def groupTransform(df: DataFrame, keyCol: String, valueCol: String,
                     fn: String): DataFrame = {
    val df0 = nanAsNull(df, Seq(keyCol, valueCol))
    val w = Window.partitionBy(col(keyCol))
    val v = col(valueCol)
    val agg: Column = fn match {
      case "mean"  => avg(v).over(w)
      case "sum"   => coalesce(sum(v).over(w), lit(0.0))
      case "max"   => max(v).over(w)
      case "min"   => min(v).over(w)
      case "count" => count(v).over(w).cast("long")
      case "size"  => count(lit(1)).over(w).cast("long")
      case other => throw new IllegalArgumentException(
        s"fn must be mean|sum|max|min|count|size, got '$other'")
    }
    df0.withColumn("transformed", when(col(keyCol).isNotNull, agg))
  }

  /** pandas `Series.rank(method=, ascending=, na_option=, pct=)` over
    * one column, appended as `rank` (double, like pandas). Probed
    * 2026-08-16: ties — average = (min+max)/2 of the tie block's
    * positions, `first` breaks by row position (the carried index);
    * na_option `keep` leaves missing ranks missing, `top`/`bottom`
    * rank the missing group FIRST/LAST as one tie block; pct divides
    * by the count of RANKED rows (non-missing under keep, all rows
    * under top/bottom) except `dense`, which divides by the max dense
    * rank. NaN ≡ missing (normalized on entry). Global ranking is a
    * single-partition window — pass `partitionBy` for the per-key
    * scale path, same contract as [[shiftRows]]. */
  def rankRows(df: DataFrame, valueCol: String, method: String = "average",
               ascending: Boolean = true, naOption: String = "keep",
               pct: Boolean = false, tieCol: String = "k",
               partitionBy: Seq[String] = Nil): DataFrame = {
    require(Seq("average", "min", "max", "first", "dense").contains(method),
      s"method must be average|min|max|first|dense, got '$method'")
    require(Seq("keep", "top", "bottom").contains(naOption),
      s"na_option must be keep|top|bottom, got '$naOption'")
    val df0 = nanAsNull(df, Seq(valueCol))
    val v = col(valueCol)
    val ord =
      (ascending, naOption) match {
        case (true, "top")  => v.asc_nulls_first
        case (true, _)      => v.asc_nulls_last
        case (false, "top") => v.desc_nulls_first
        case (false, _)     => v.desc_nulls_last
      }
    val base = if (partitionBy.nonEmpty)
      Window.partitionBy(partitionBy.map(col): _*)
    else Window.partitionBy()
    val w = base.orderBy(ord)
    val wTie = base.orderBy(ord, col(tieCol).asc)
    val grp = Window.partitionBy((partitionBy.map(col) :+ v): _*)
    val raw: Column = method match {
      case "first"   => row_number().over(wTie).cast("double")
      case "min"     => rank().over(w).cast("double")
      case "max"     => (rank().over(w) + count(lit(1)).over(grp) - 1)
        .cast("double")
      case "average" => rank().over(w) + (count(lit(1)).over(grp) - 1) / 2.0
      case "dense"   => dense_rank().over(w).cast("double")
    }
    val masked =
      if (naOption == "keep") when(v.isNotNull, raw) else raw
    val withRank = df0.withColumn("rank", masked)
    if (!pct) withRank
    else {
      val denom: Column = method match {
        case "dense" => max(col("rank")).over(base)
        case _ if naOption == "keep" => count(v).over(base).cast("double")
        case _ => count(lit(1)).over(base).cast("double")
      }
      withRank.withColumn("rank", col("rank") / denom)
    }
  }

  /** pandas `cumsum`/`cummax`/`cummin` on one column along `orderCol`:
    * a missing position STAYS missing, the running aggregate skips it
    * (probed 2026-08-16). One prefix window. */
  def cumulative(df: DataFrame, column: String, fn: String,
                 orderCol: String,
                 partitionBy: Seq[String] = Nil): DataFrame = {
    val df0 = nanAsNull(df, Seq(column))
    val w = (if (partitionBy.nonEmpty)
               Window.partitionBy(partitionBy.map(col): _*)
             else Window.partitionBy())
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val agg = fn match {
      case "cumsum" => sum(col(column)).over(w)
      case "cummax" => max(col(column)).over(w)
      case "cummin" => min(col(column)).over(w)
      case other => throw new IllegalArgumentException(
        s"fn must be cumsum|cummax|cummin, got '$other'")
    }
    df0.withColumn(column,
      when(col(column).isNotNull, agg))
  }

  /** pandas `diff(n)` on one column: value minus the value |n| positions
    * before (after, for negative n) along `orderCol`; missing on either
    * side propagates. */
  def diffRows(df: DataFrame, column: String, n: Int, orderCol: String,
               partitionBy: Seq[String] = Nil): DataFrame = {
    val df0 = nanAsNull(df, Seq(column))
    val w = (if (partitionBy.nonEmpty)
               Window.partitionBy(partitionBy.map(col): _*)
             else Window.partitionBy())
      .orderBy(col(orderCol))
    val other = if (n >= 0) lag(col(column), n).over(w)
                else lead(col(column), -n).over(w)
    df0.withColumn(column, col(column) - other)
  }

  /** pandas `melt(id_vars=, value_vars=)`: unpivot the value columns
    * into (variable, value) rows. pandas emits VARIABLE-MAJOR order
    * (all rows of value_vars[0], then value_vars[1], …; original row
    * order within each block) — on a Spark frame that order is data,
    * not an engine guarantee: sort by (variable position, carried
    * index) to reproduce it. Nest columns pass through whole — as id
    * vars (the cell repeats per variable) or as the single value var
    * (the cell becomes the value), both reference-probed 2026-08-16.
    * Value type: pandas melts into one object column; graft unifies
    * mixed numeric value vars to double and anything else to string —
    * one per-row generator expansion, no shuffle. */
  def meltFrame(df: DataFrame, idVars: Seq[String],
                valueVars: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types.{DataType, DoubleType, NumericType, StringType}
    require(valueVars.nonEmpty, "melt needs at least one value column")
    val types = valueVars.map(v => df.schema(v).dataType)
    val castTo: Option[DataType] =
      if (types.distinct.size == 1) None
      else if (types.forall(_.isInstanceOf[NumericType])) Some(DoubleType)
      else Some(StringType)
    val pairs = valueVars.map { v =>
      val c = castTo.map(t => col(v).cast(t)).getOrElse(col(v))
      struct(lit(v).as("variable"), c.as("value"))
    }
    df.select((idVars.map(col) :+ explode(array(pairs: _*)).as("__m")): _*)
      .select(idVars.map(col) ++
        Seq(col("__m.variable"), col("__m.value")): _*)
  }

  /** pandas `pivot_table(index=, columns=, values=, aggfunc=)` with the
    * pandas defaults pinned: NULL index/column KEYS drop (groupby
    * dropna), all-NULL result COLUMNS drop, then all-NULL result ROWS
    * drop (`dropna=True`), column keys sorted ascending (Spark's pivot
    * sorts too; names are the keys' string forms, matching pandas
    * str(key) for int/string keys). One grouped pivot shuffle; the
    * column-drop inspection is a single 1-row aggregate over the
    * already-small wide frame (bounded by key cardinality, like
    * Spark's own pivot value collection). */
  def pivotTable(df: DataFrame, index: String, columns: String,
                 values: String, aggfunc: String = "mean"): DataFrame = {
    def aggOf(c: Column): Column = aggfunc match {
      case "mean"  => avg(c)
      // pandas sum is min_count=0: an all-NaN PRESENT group sums to 0.0
      // (absent index×column combos still read null — pivot never
      // computes them, so the coalesce can't touch them)
      case "sum"   => coalesce(sum(c), lit(0.0))
      case "min"   => min(c)
      case "max"   => max(c)
      case "count" => count(c)
      case other => throw new IllegalArgumentException(
        s"aggfunc must be mean|sum|min|max|count, got '$other'")
    }
    val base = nanAsNull(df, Seq(values))
      .where(col(index).isNotNull && col(columns).isNotNull)
    val wide = base.groupBy(col(index)).pivot(columns)
      .agg(aggOf(col(values)))
    val valCols = wide.columns.filterNot(_ == index)
    if (valCols.isEmpty) return wide
    // pivot names columns after DATA values (e.g. "-3") — backtick every
    // reference so they parse as names, not expressions
    def pc(n: String): Column = col(s"`$n`")
    // pandas count never yields NaN (absent combos become 0 only via
    // fill_value; absent stays NaN) — Spark pivot leaves absent combos
    // null on every aggfunc, which matches
    val counts = wide.agg(count(pc(valCols.head)).as(valCols.head),
      valCols.tail.map(c => count(pc(c)).as(c)): _*).head()
    val keep = valCols.filter(c => counts.getAs[Long](c) > 0L)
    val kept = wide.select((index +: keep).map(pc): _*)
    if (keep.isEmpty) kept.limit(0)
    else kept.where(keep.map(pc(_).isNotNull).reduce(_ || _))
  }

  /** pandas `shift(n)`: every column lags (n>0) or leads (n<0) by |n|
    * positions of `orderCol` — nest cells move whole, vacated rows are
    * all-missing. Pass `partitionBy` for the scale path (per-key lag
    * features); the unpartitioned form is a single-partition sort, fine
    * only for small frames. */
  def shiftRows(df: DataFrame, n: Int, orderCol: String,
                partitionBy: Seq[String] = Nil): DataFrame = {
    val w = (if (partitionBy.nonEmpty)
               Window.partitionBy(partitionBy.map(col): _*)
             else Window.partitionBy())
      .orderBy(col(orderCol))
    // pandas shift preserves column order — select in df.columns order,
    // mapping each column to its shifted or passthrough form in place
    df.select(df.columns.map { c =>
      if (c == orderCol || partitionBy.contains(c)) col(c)
      else (if (n >= 0) lag(col(c), n) else lead(col(c), -n)).over(w).as(c)
    }.toSeq: _*)
  }

  /** pandas `ffill`/`bfill`: missing values — missing nest CELLS
    * included — fill from the nearest non-missing neighbor along
    * `orderCol`. Same `partitionBy` contract as [[shiftRows]]. */
  def fillDirectional(df: DataFrame, forward: Boolean, orderCol: String,
                      partitionBy: Seq[String] = Nil): DataFrame = {
    val base = (if (partitionBy.nonEmpty)
                  Window.partitionBy(partitionBy.map(col): _*)
                else Window.partitionBy())
      .orderBy(col(orderCol))
    val w =
      if (forward) base.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)
      else base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    // NaN is missing (gets filled, never propagates as a fill value);
    // pandas ffill/bfill preserve column order — map in place
    val fillCols = df.columns.filterNot(c =>
      c == orderCol || partitionBy.contains(c))
    val df0 = nanAsNull(df, fillCols.toSeq)
    df0.select(df0.columns.map { c =>
      if (c == orderCol || partitionBy.contains(c)) col(c)
      else (if (forward) last(col(c), ignoreNulls = true)
            else first(col(c), ignoreNulls = true)).over(w).as(c)
    }.toSeq: _*)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.TextFunctions

/** Sequence assembly for LLM training pipelines: fixed-capacity sequence
  * packing (concatenate documents, split at exact token boundaries) and
  * per-document sliding token windows.
  *
  * Scale design (100 TB):
  *  - [[slidingWindows]] is a pure narrow transform — zero shuffle at any
  *    scale.
  *  - [[packSequences]] needs a running token total, i.e. an ordered
  *    window, which is why it packs PER GROUP: each group (a shard key the
  *    caller picks — split id, hash bucket, source) sorts and scans
  *    independently in parallel. One group = one global sort: don't do
  *    that at scale; thousands of bounded shards is the production shape
  *    (each training shard is packed independently anyway).
  */
object Chunking {

  /** Sequence packing with CONCAT-THEN-CHUNK semantics: within each group,
    * documents are laid end-to-end in `idCol` order and the token stream is
    * cut every `capacity` tokens. A document therefore lands in every chunk
    * its token span [start, start+n) overlaps — `off_start`/`off_len` give
    * the in-document token sub-range belonging to `chunk_id` (documents
    * longer than `capacity` straddle multiple chunks; no tokens are ever
    * dropped or padded, matching the standard pretraining packing rule).
    *
    * Tokens are whitespace tokens ([[TextFunctions.tokenCount]]); swap in a
    * real tokenizer count column via `tokenCountCol`. Empty docs (0-token)
    * occupy no span and emit no rows. All arithmetic is exact integer
    * (`DIV`), replayable in any SQL engine. */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
                    capacity: Int, groupBy: Column,
                    tokenCountCol: Option[Column] = None): DataFrame = {
    require(capacity > 0, s"packSequences: capacity must be > 0, got $capacity")
    val n = tokenCountCol.getOrElse(TextFunctions.tokenCount(col(textCol)))
    // secondary sort on the token count makes __start (hence chunk
    // assignment) deterministic even when a group contains duplicate ids —
    // two rows tying on BOTH (id, n) are interchangeable in every output
    // column, so the emitted multiset is stable across runs either way
    val w = Window.partitionBy(col("__grp")).orderBy(col(idCol), col("__n"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cap = lit(capacity.toLong)
    df.select(col(idCol), groupBy.as("__grp"), n.as("__n"))
      .withColumn("__start", coalesce(sum(col("__n")).over(w), lit(0L)))
      .where(col("__n") > 0)
      .select(col("__grp").as("grp"), col(idCol),
        col("__n").as("n_tokens"), col("__start"),
        explode(sequence(expr(s"__start DIV $capacity"),
          expr(s"(__start + __n - 1) DIV $capacity"))).as("chunk_id"))
      .select(col("grp"), col("chunk_id"), col(idCol), col("n_tokens"),
        (greatest(col("chunk_id") * cap, col("__start")) - col("__start"))
          .as("off_start"),
        (least((col("chunk_id") + 1) * cap, col("__start") + col("n_tokens"))
          - greatest(col("chunk_id") * cap, col("__start"))).as("off_len"))
  }

  /** Span-level duplicate detection — the fixed-window approximation of
    * exact-substring dedup (Lee et al. 2021 "Deduplicating Training Data
    * Makes Language Models Better", public technique; true suffix-array
    * matching replaced by aligned token windows): tile every document
    * into non-overlapping `window`-token spans and mark every span whose
    * text occurs ANYWHERE else in the corpus, keeping only its globally
    * first occurrence (min doc, position). Returns
    * (idCol, tok_start, tok_len, keep) — callers drop `keep = false`
    * spans or route docs with many duplicated spans to review.
    *
    * Scale shape: the tiling is narrow ([[slidingWindows]]); the global
    * keep-first is ONE partial-aggregated groupBy on the span text + a
    * keyed join back — same shape as corpus-wide paragraph dedup, with
    * the same hot-key properties (a mega-duplicated span is 1:N
    * probe-side; AQE skew split applies). */
  def duplicatedSpans(df: DataFrame, idCol: String, textCol: String,
                      window: Int): DataFrame = {
    val spans = slidingWindows(df, idCol, textCol, window, stride = window)
    val first = spans.groupBy(col("chunk"))
      .agg(min(struct(col(idCol), col("tok_start"))).as("__first"),
        count(lit(1)).as("__n"))
    spans.join(first, Seq("chunk"))
      .select(col(idCol), col("tok_start"), col("tok_len"),
        (col("__n") === 1 ||
          (col("__first").getField(idCol) === col(idCol) &&
           col("__first").getField("tok_start") === col("tok_start")))
          .as("keep"))
  }

  /** Per-document sliding token windows: starts 0, stride, 2·stride, …
    * while start < n; each window is `window` tokens (the final ones
    * truncate at the document end). Returns one row per (doc, window) with
    * the window's text re-joined on single spaces. Pure narrow expressions
    * — the 100 TB cost is the scan itself. */
  def slidingWindows(df: DataFrame, idCol: String, textCol: String,
                     window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0,
      s"slidingWindows: window/stride must be > 0, got $window/$stride")
    val toks = TextFunctions.tokens(col(textCol))
    df.select(col(idCol), toks.as("__t"))
      .withColumn("__n", size(col("__t")).cast("long"))
      .select(col(idCol), col("__t"), col("__n"),
        explode(sequence(lit(0L), col("__n") - 1, lit(stride.toLong)))
          .as("tok_start"))
      .select(col(idCol),
        expr(s"tok_start DIV $stride").as("win_id"),
        col("tok_start"),
        least(lit(window.toLong), col("__n") - col("tok_start"))
          .as("tok_len"),
        concat_ws(" ", slice(col("__t"), col("tok_start").cast("int") + 1,
          least(lit(window), (col("__n") - col("tok_start")).cast("int"))))
          .as("chunk"))
  }
}

package graft.expressions

import java.util.regex.Pattern

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `pandas Series.str.wrap(width)` with every textwrap knob at its default
  * (reference reach: nested_pandas eval resolvers expose the full `.str`
  * surface, expr.py:24-46; pandas maps wrap → `'\n'.join(textwrap.wrap(s))`).
  *
  * Re-implements CPython `textwrap.TextWrapper` defaults faithfully:
  *   1. `expandtabs(8)` — column-aware, columns reset at `\n`/`\r`;
  *   2. `replace_whitespace` — each of `\t\n\v\f\r` becomes one space;
  *   3. chunking via `wordsep_re` (whitespace runs | em-dashes between
  *      words | words split AFTER a hyphen only when preceded by two
  *      letters (or letter-hyphen-letter) and followed by letter[-]letter);
  *   4. greedy line fold with `_handle_long_word`: a chunk longer than the
  *      whole width fills the current line's remaining space, preferring a
  *      break one past the last hyphen inside that space (`rfind`), and the
  *      remainder re-enters the chunk stream; a line's trailing chunk is
  *      dropped when it is all-whitespace — by python `str.strip()`'s
  *      unicode notion, which the leading-whitespace keep on the very first
  *      line also uses.
  * Lines join with `'\n'` (what pandas does). Empty string → empty string;
  * NULL propagates. Non-positive widths raise at construction, mirroring
  * `_wrap_chunks`' ValueError.
  *
  * Defaults-only by contract: the dialect layer raises on any keyword
  * argument (expand_tabs=False etc.), never silently approximates.
  */
case class TextWrap(child: Expression, width: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType if width >= 1 => TypeCheckResult.TypeCheckSuccess
    case _: StringType => TypeCheckResult.TypeCheckFailure(
      s"invalid width $width (must be > 0)")
    case other => TypeCheckResult.TypeCheckFailure(
      s"str.wrap expects a string, got $other")
  }
  override def dataType: DataType = StringType

  def kernel(u: UTF8String): UTF8String =
    UTF8String.fromString(TextWrap.wrap(u.toString, width))

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("textWrap", this, classOf[TextWrap].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextWrap {
  // textwrap.wordsep_re with break_on_hyphens=True, transcribed to Java
  // regex syntax (\z = python \Z). Python's regex classes are spelled
  // out instead of Java's (?U)\w/\d, which differ at the edges: python
  // \w = str.isalnum ∪ '_' = [\p{L}\p{N}_] (includes No/Nl numerics
  // like '½', EXCLUDES combining marks), python \d = \p{Nd}, so
  // "letter" [^\d\W] = [\p{L}\p{Nl}\p{No}_]. Group 1 is the chunk — a
  // whitespace run, an em-dash run between word-punct and a word char,
  // or a word ending at an eligible hyphen / whitespace /
  // end-of-string / pre-em-dash position.
  private val WS = "[\\t\\n\\x0B\\f\\r ]"
  private val NWS = "[^\\t\\n\\x0B\\f\\r ]"
  private val PW = "[\\p{L}\\p{N}_]" // python \w
  private val WP = "[\\p{L}\\p{N}_!\"'&.,?]" // python word_punct
  private val LT = "[\\p{L}\\p{Nl}\\p{No}_]" // python [^\d\W]
  private[expressions] val wordsepRe: Pattern = Pattern.compile(
    "(" +
      s"$WS+" +
      s"|(?<=$WP)-{2,}(?=$PW)" +
      s"|$NWS+?(?:" +
        s"-(?:(?<=$LT$LT-)|(?<=$LT-$LT-))(?=$LT-?$LT)" +
        s"|(?=$WS|\\z)" +
        s"|(?<=$WP)(?=-{2,}$PW)" +
      "))")

  // ---- code-point helpers: python strings index by CODE POINT, so all
  // width accounting and long-word cuts must too (an emoji is len 1 in
  // python but 2 UTF-16 units; substring at a unit index would split
  // the surrogate pair and emit mojibake) ----
  private def cpLen(s: String): Int = s.codePointCount(0, s.length)

  /** (first `fromCp` code points, rest). */
  private def cpSplitAt(s: String, fromCp: Int): (String, String) = {
    val i = s.offsetByCodePoints(0, math.min(fromCp, cpLen(s)))
    (s.substring(0, i), s.substring(i))
  }

  /** python chunk.rfind('-', 0, limitCp) in code-point indices, plus
    * whether any code point BEFORE that hyphen is a non-hyphen
    * (textwrap's `any(c != '-' for c in chunk[:hyphen])`). */
  private def rfindHyphen(s: String, limitCp: Int): (Int, Boolean) = {
    var i = 0
    var cp = 0
    var found = -1
    var nonHyphenBefore = false
    var nonHyphenSeen = false
    while (i < s.length && cp < limitCp) {
      val c = s.codePointAt(i)
      if (c == '-') {
        found = cp
        nonHyphenBefore = nonHyphenSeen
      } else nonHyphenSeen = true
      i += Character.charCount(c)
      cp += 1
    }
    (found, nonHyphenBefore)
  }

  /** python str.expandtabs(8): pad to the next multiple of tabsize,
    * column count resets after `\n` and `\r`; columns count CODE
    * POINTS (a surrogate pair is one column in python). */
  private[expressions] def expandTabs(s: String): String = {
    if (s.indexOf('\t') < 0) return s
    val sb = new java.lang.StringBuilder(s.length + 16)
    var col = 0
    var i = 0
    while (i < s.length) {
      val c = s.codePointAt(i)
      if (c == '\t') {
        val pad = 8 - col % 8
        var k = 0
        while (k < pad) { sb.append(' '); k += 1 }
        col += pad
      } else {
        sb.appendCodePoint(c)
        col = if (c == '\n' || c == '\r') 0 else col + 1
      }
      i += Character.charCount(c)
    }
    sb.toString
  }

  /** python str.strip() == '' — unicode whitespace, which Java's
    * isWhitespace misses for NBSP-family Zs chars and NEL. */
  private def isPyStripEmpty(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (!(Character.isWhitespace(c) || Character.isSpaceChar(c) ||
            c == '\u0085')) return false
      i += 1
    }
    true
  }

  /** re.split(wordsep_re, text) keeping group captures, empties dropped —
    * interstitial unmatched text survives as its own chunk. */
  private[expressions] def chunksOf(text: String): ArrayBuffer[String] = {
    val out = new ArrayBuffer[String]()
    val m = wordsepRe.matcher(text)
    var last = 0
    while (m.find()) {
      if (m.start > last) out += text.substring(last, m.start)
      if (m.end > m.start) out += m.group(1)
      last = m.end
    }
    if (last < text.length) out += text.substring(last)
    out
  }

  /** textwrap.wrap(text, width) with all-default knobs, '\n'-joined. */
  def wrap(text0: String, width: Int): String = {
    // _munge_whitespace: expand_tabs then replace_whitespace
    val munged = {
      val t = expandTabs(text0)
      val sb = new java.lang.StringBuilder(t.length)
      var i = 0
      while (i < t.length) {
        val c = t.charAt(i)
        sb.append(if (c == '\n' || c == '\r' || c == '\u000B' ||
                      c == '\f') ' ' else c)
        i += 1
      }
      sb.toString
    }
    val chunks = chunksOf(munged)
    val lines = new ArrayBuffer[String]()
    var pos = 0 // head of the chunk queue
    while (pos < chunks.length) {
      val curLine = new ArrayBuffer[String]()
      var curLen = 0
      // drop leading whitespace, except at the very beginning of the text
      if (lines.nonEmpty && pos < chunks.length &&
          isPyStripEmpty(chunks(pos))) pos += 1
      var fits = true
      while (fits && pos < chunks.length) {
        val l = cpLen(chunks(pos))
        if (curLen + l <= width) {
          curLine += chunks(pos); curLen += l; pos += 1
        } else fits = false
      }
      // _handle_long_word: break_long_words=True, break_on_hyphens=True;
      // all lengths and the cut are CODE-POINT indices (python slicing)
      if (pos < chunks.length && cpLen(chunks(pos)) > width) {
        val spaceLeft = if (width < 1) 1 else width - curLen
        val chunk = chunks(pos)
        var end = spaceLeft
        if (cpLen(chunk) > spaceLeft) {
          // rfind('-', 0, spaceLeft): last '-' at cp index < spaceLeft
          val (hyphen, nonHyphenBefore) = rfindHyphen(chunk, spaceLeft)
          if (hyphen > 0 && nonHyphenBefore)
            end = hyphen + 1
        }
        val (piece, rest) = cpSplitAt(chunk, math.max(0, end))
        curLine += piece
        chunks(pos) = rest
        curLen = curLine.iterator.map(cpLen).sum
      }
      // drop an all-whitespace trailing chunk
      if (curLine.nonEmpty && isPyStripEmpty(curLine.last))
        curLine.remove(curLine.length - 1)
      if (curLine.nonEmpty) lines += curLine.mkString
    }
    lines.mkString("\n")
  }
}

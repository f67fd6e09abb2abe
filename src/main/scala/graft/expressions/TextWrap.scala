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
  // regex syntax ((?U) gives python-3 unicode \w/\d classes; \z = python
  // \Z). Group 1 is the chunk — a whitespace run, an em-dash run between
  // word-punct and a word char, or a word ending at an eligible hyphen /
  // whitespace / end-of-string / pre-em-dash position.
  private val WS = "[\\t\\n\\x0B\\f\\r ]"
  private val NWS = "[^\\t\\n\\x0B\\f\\r ]"
  private val WP = "[\\w!\"'&.,?]"
  private val LT = "[^\\d\\W]"
  private[expressions] val wordsepRe: Pattern = Pattern.compile(
    "(?U)(" +
      s"$WS+" +
      s"|(?<=$WP)-{2,}(?=\\w)" +
      s"|$NWS+?(?:" +
        s"-(?:(?<=$LT$LT-)|(?<=$LT-$LT-))(?=$LT-?$LT)" +
        s"|(?=$WS|\\z)" +
        s"|(?<=$WP)(?=-{2,}\\w)" +
      "))")

  /** python str.expandtabs(8): pad to the next multiple of tabsize,
    * column count resets after `\n` and `\r`. */
  private[expressions] def expandTabs(s: String): String = {
    if (s.indexOf('\t') < 0) return s
    val sb = new java.lang.StringBuilder(s.length + 16)
    var col = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\t') {
        val pad = 8 - col % 8
        var k = 0
        while (k < pad) { sb.append(' '); k += 1 }
        col += pad
      } else {
        sb.append(c)
        col = if (c == '\n' || c == '\r') 0 else col + 1
      }
      i += 1
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
        val l = chunks(pos).length
        if (curLen + l <= width) {
          curLine += chunks(pos); curLen += l; pos += 1
        } else fits = false
      }
      // _handle_long_word: break_long_words=True, break_on_hyphens=True
      if (pos < chunks.length && chunks(pos).length > width) {
        val spaceLeft = if (width < 1) 1 else width - curLen
        val chunk = chunks(pos)
        var end = spaceLeft
        if (chunk.length > spaceLeft) {
          // rfind('-', 0, spaceLeft): last '-' at index < spaceLeft
          val hyphen = chunk.lastIndexOf('-', spaceLeft - 1)
          if (hyphen > 0 && chunk.substring(0, hyphen).exists(_ != '-'))
            end = hyphen + 1
        }
        val cut = math.max(0, math.min(end, chunk.length))
        curLine += chunk.substring(0, cut)
        chunks(pos) = chunk.substring(cut)
        curLen = curLine.iterator.map(_.length).sum
      }
      // drop an all-whitespace trailing chunk
      if (curLine.nonEmpty && isPyStripEmpty(curLine.last))
        curLine.remove(curLine.length - 1)
      if (curLine.nonEmpty) lines += curLine.mkString
    }
    lines.mkString("\n")
  }
}

package graft.nested

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, expr, size}

/** String front-end for the reference's query/eval dialect.
  *
  * Reference semantics (src/nested_pandas/nestedframe/expr.py +
  * core.py:1526-1648):
  *  - an expression over base columns filters top-level rows;
  *  - an expression over the fields of exactly ONE nest filters the elements
  *    inside each nested cell (keeping all top-level rows);
  *  - mixing layers, or referencing two different nests, raises
  *    (core.py:1610-1614 via extract_nest_names / _subexprs_by_nest).
  *  - dotted paths `nest.field`, backtick-quoted names, and `nest.len()` are
  *    supported (core.py:195-203, 1580-1589; expr.py:212-228).
  *
  * Implementation: we do NOT re-implement an evaluator. The expression is
  * tokenized just enough to (a) classify each dotted reference by layer and
  * (b) rewrite nested refs to a lambda variable; the result is handed to
  * Spark's own SQL parser via `expr(...)` — either directly (base layer) or
  * wrapped in `filter(nest, __x -> ...)` (element layer). Everything stays a
  * Column expression: Catalyst optimizes, codegen applies, no shuffle.
  */
object NestedExpr {

  /** One lexical chunk of the expression. */
  private sealed trait Tok
  private case class Text(s: String) extends Tok
  /** A dotted or simple identifier path; parts keep no backticks. */
  private case class Ident(parts: Seq[String]) extends Tok
  private case class Str(s: String) extends Tok

  private def isIdentStart(c: Char) = c.isLetter || c == '_'
  private def isIdentChar(c: Char) = c.isLetterOrDigit || c == '_'

  /** Tokenize: split out quoted strings and (possibly backticked, possibly
    * dotted) identifier paths; everything else passes through verbatim. */
  private def tokenize(s: String): Seq[Tok] = {
    val out = collection.mutable.ArrayBuffer.empty[Tok]
    val text = new StringBuilder
    var i = 0
    def flushText(): Unit =
      if (text.nonEmpty) { out += Text(text.toString); text.clear() }

    def readSegment(): Option[String] = {
      if (i < s.length && s(i) == '`') {
        val end = s.indexOf('`', i + 1)
        require(end > 0, s"Unclosed backtick in expression: $s")
        val seg = s.substring(i + 1, end); i = end + 1; Some(seg)
      } else if (i < s.length && isIdentStart(s(i))) {
        val start = i
        while (i < s.length && isIdentChar(s(i))) i += 1
        Some(s.substring(start, i))
      } else None
    }

    while (i < s.length) {
      val c = s(i)
      if (c == '\'' || c == '"') {
        flushText()
        val quote = c; val start = i; i += 1
        while (i < s.length && s(i) != quote) i += 1
        require(i < s.length, s"Unclosed quote in expression: $s")
        i += 1
        out += Str(s.substring(start, i))
      } else if (c == '`' || isIdentStart(c)) {
        flushText()
        val parts = collection.mutable.ArrayBuffer(readSegment().get)
        while (i < s.length && s(i) == '.' && {
                 // lookahead: dot must be followed by a segment
                 val save = i; i += 1
                 readSegment() match {
                   case Some(seg) => parts += seg; true
                   case None      => i = save; false
                 }
               }) {}
        out += Ident(parts.toSeq)
      } else { text += c; i += 1 }
    }
    flushText()
    out.toSeq
  }

  private def bq(name: String): String = "`" + name.replace("`", "``") + "`"

  /** SQL keywords / function names we must not treat as column refs. */
  private val keywords = Set(
    "and", "or", "not", "in", "is", "null", "true", "false", "like", "rlike",
    "between", "case", "when", "then", "else", "end", "cast", "as", "distinct")

  /** Parse result: rewritten SQL + the set of nests referenced at element
    * level + whether base columns are referenced. */
  private case class Analysis(sql: String, nests: Set[String], usesBase: Boolean)

  private def analyze(df: DataFrame, exprStr: String,
                      lambdaVar: String): Analysis = {
    val nestSet = NestedOps.nestedColumns(df).toSet
    val baseSet = NestedOps.baseColumns(df).toSet
    var nests = Set.empty[String]
    var usesBase = false
    val toks = tokenize(exprStr)
    val sql = toks.zipWithIndex.map {
      case (Text(t), _) => t
      case (Str(t), _)  => t
      case (Ident(parts), idx) =>
        parts match {
          // nest.len() — row-level length (core.py:1580-1589)
          case Seq(nest, "len") if nestSet.contains(nest) &&
              toks.drop(idx + 1).headOption.exists {
                case Text(t) => t.trim.startsWith("()"); case _ => false } =>
            usesBase = true
            s"size(${bq(nest)}) __LEN_CALL"
          case Seq(nest, field) if nestSet.contains(nest) =>
            nests += nest
            s"$lambdaVar.${bq(field)}"
          case Seq(one) if baseSet.contains(one) =>
            usesBase = true; bq(one)
          case Seq(one) if keywords.contains(one.toLowerCase) => one
          case Seq(one) if nestSet.contains(one) => usesBase = true; bq(one)
          // unknown single token: assume SQL function name (abs, sqrt, ...)
          case Seq(one) => one
          case other =>
            throw new IllegalArgumentException(
              s"Unresolvable column path '${other.mkString(".")}' in: $exprStr")
        }
    }.mkString
      // drop the () of len() calls: "size(n) __LEN_CALL ()" -> "size(n)"
      .replaceAll("""__LEN_CALL\s*\(\s*\)""", "")
    Analysis(sql, nests, usesBase)
  }

  /** Two-level `query`. Base-layer expr → row filter; single-nest expr →
    * element filter keeping all rows. Mixing layers or nests → error, same as
    * the reference (core.py:1610-1614). */
  def query(df: DataFrame, exprStr: String): DataFrame = {
    val a = analyze(df, exprStr, "__x")
    if (a.nests.isEmpty) df.where(expr(a.sql))
    else {
      require(a.nests.size == 1,
        s"Query expression references multiple nests ${a.nests.mkString(", ")}; " +
          "only one nest per expression is supported")
      require(!a.usesBase,
        "Query expression mixes base columns and nested fields; " +
          "only one layer per expression is supported")
      val nest = a.nests.head
      df.withColumn(nest, expr(s"filter(${bq(nest)}, __x -> ${a.sql})"))
    }
  }

  /** `eval` assignment dialect: `"target = rhs"`.
    *  - `nest.f = <expr over same nest (+ base cols)>` → add/replace field f
    *    inside each element (core.py:284-340 __setitem__ dotted).
    *  - `name = <expr over base cols>` → plain withColumn.
    * Cross-nest assignment is rejected (same single-nest rule). */
  def evalAssign(df: DataFrame, stmt: String): DataFrame = {
    val m = """(?s)^\s*(.*?)\s*=(?!=)\s*(.*)$""".r
    stmt match {
      case m(lhs, rhs) =>
        val lhsToks = tokenize(lhs)
        val target = lhsToks.collectFirst { case Ident(p) => p }.getOrElse(
          throw new IllegalArgumentException(s"Bad assignment target: $lhs"))
        val a = analyze(df, rhs, "__x")
        target match {
          case Seq(nest, field) if NestedOps.nestedColumns(df).contains(nest) =>
            require(a.nests.subsetOf(Set(nest)),
              s"Assignment to $nest.$field references other nests: ${a.nests}")
            // No SQL syntax for withField → rebuild the struct with
            // named_struct, replacing or appending the target field.
            val existing = NestedOps.subColumns(df, nest)
            val fields = if (existing.contains(field)) existing
                         else existing :+ field
            val parts = fields.map { f =>
              val v = if (f == field) a.sql else s"__x.${bq(f)}"
              s"'${f.replace("'", "\\'")}', $v"
            }.mkString(", ")
            df.withColumn(nest, expr(
              s"transform(${bq(nest)}, __x -> named_struct($parts))"))
          // New-nest creation from a single-source-nest expression
          // (reference: eval assignment creating nests,
          // tests/nested_pandas/nestedframe/test_nestedframe.py:2448-2540):
          // `newnest.f = items.a * 2` builds newnest element-aligned to items.
          case Seq(newNest, field) if a.nests.size == 1 =>
            val src = a.nests.head
            df.withColumn(newNest, expr(
              s"transform(${bq(src)}, __x -> named_struct('${field.replace("'", "\\'")}', ${a.sql}))"))
          case Seq(name) =>
            require(a.nests.isEmpty,
              s"Assignment of nested-layer expression to base column '$name'")
            df.withColumn(name, expr(a.sql))
          case other => throw new IllegalArgumentException(
            s"Bad assignment target: ${other.mkString(".")}")
        }
      case _ => throw new IllegalArgumentException(s"Not an assignment: $stmt")
    }
  }
}

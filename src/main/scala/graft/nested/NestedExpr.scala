package graft.nested

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, expr, lit, size, when}
import org.apache.spark.sql.types.{ArrayType, StringType, StructType,
  TimestampNTZType, TimestampType}

/** String front-end for the reference's query/eval dialect.
  *
  * Reference semantics (src/nested_pandas/nestedframe/expr.py +
  * core.py:1526-1648):
  *  - an expression over base columns filters top-level rows;
  *  - an expression over the fields of exactly ONE nest filters the elements
  *    inside each nested cell (keeping all top-level rows; cells whose every
  *    element was dropped become NULL, core.py:1638-1648);
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
        // honor backslash escapes (\' \\ …) like the SQL parser will
        while (i < s.length && s(i) != quote) {
          if (s(i) == '\\' && i + 1 < s.length) i += 2 else i += 1
        }
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

  // -------------------------------------------------------------------------
  // pandas-eval surface preprocessing (reference expr.py:24-46 rides pandas'
  // PandasExprVisitor, so query strings may use Python-isms Spark SQL does
  // not parse). Rewrites, string-literal-safe:
  //   `x in [a, b]`      → `x in (a, b)`      (list literal → IN list)
  //   `~cond`            → `not cond`
  //   `a & b` / `a | b`  → `a and b` / `a or b`  (mask operators)
  //   `a ** b`           → `power(a, b)`
  //   `a // b`           → `floor((a) / (b))`  (Python floor semantics —
  //                        -7 // 2 = -4, unlike SQL div's truncation)
  //   `a < b < c`        → `(a < b) and (b < c)`  (chained comparisons)
  // Ambiguous precedence we will not guess at (e.g. `a * b // c`,
  // `a ** b ** c`) raises with a "parenthesize" message instead of
  // silently diverging from Python.
  // -------------------------------------------------------------------------

  private sealed trait Atom
  private case class AIdent(parts: Seq[String]) extends Atom
  private case class AStr(s: String) extends Atom
  private case class AOp(s: String) extends Atom
  private case class ARaw(s: String) extends Atom

  private val opChars = "<>~&|()[],+-*/%="
  private val twoCharOps = Seq("**", "//", "<=", ">=", "==", "!=", "&&", "||")
  private val cmpOps = Set("<", "<=", ">", ">=", "==", "!=")
  private val identRe = "[A-Za-z_][A-Za-z0-9_]*".r

  private def atomize(toks: Seq[Tok]): Vector[Atom] =
    toks.iterator.flatMap {
      case Ident(p) => Vector(AIdent(p))
      case Str(s)   => Vector(AStr(s))
      case Text(t) =>
        val out = Vector.newBuilder[Atom]
        var i = 0
        while (i < t.length) {
          val two = if (i + 1 < t.length) t.substring(i, i + 2) else ""
          if (twoCharOps.contains(two)) { out += AOp(two); i += 2 }
          else if (opChars.contains(t(i))) { out += AOp(t(i).toString); i += 1 }
          else {
            val start = i
            while (i < t.length && !opChars.contains(t(i)) &&
                   !(i + 1 < t.length &&
                     twoCharOps.contains(t.substring(i, i + 2)))) i += 1
            out += ARaw(t.substring(start, i))
          }
        }
        out.result()
    }.toVector

  private def renderAtom(a: Atom): String = a match {
    case AIdent(parts) => parts.map { p =>
      if (identRe.pattern.matcher(p).matches()) p else bq(p) }.mkString(".")
    case AStr(s) => s
    case AOp(s)  => s
    case ARaw(s) => s
  }
  private def isWs(a: Atom): Boolean = a match {
    case ARaw(s) => s.forall(_.isWhitespace); case _ => false
  }
  private def isKw(a: Atom, kw: String): Boolean = a match {
    case AIdent(Seq(one)) => one.equalsIgnoreCase(kw)
    // the &/|/~ rewrites splice keywords in as raw text — they are
    // chain/operand boundaries exactly like typed-out keywords
    case ARaw(s)          => s.trim.equalsIgnoreCase(kw)
    case _                => false
  }

  /** Index range [l, r] of the operand ENDING at (searching left from) `from`
    * inclusive: a paren group with optional leading call name, or a single
    * ident/number atom.
    *
    * `absorbUnary`: also swallow a UNARY +/- directly before the operand
    * (one preceded by nothing, another operator, `(`, or a keyword — not
    * by an operand). Needed wherever Python binds unary minus TIGHTER
    * than the operator being rewritten: chained comparisons
    * (`-2 < a <= 7` — the bound is (-2), found by the r9 differential
    * fuzzer) and `//` (`-3 // 4` is (-3)//4 = -1, not -(3//4) = 0).
    * Must stay FALSE for `**`, where Python binds unary minus LOOSER
    * (`-3 ** 2` is -(3**2) = -9). */
  private def operandLeft(as: Vector[Atom], from: Int,
                          absorbUnary: Boolean = false): (Int, Int) = {
    def withUnary(l: Int, r: Int): (Int, Int) = {
      if (!absorbUnary) return (l, r)
      var p = l - 1
      while (p >= 0 && isWs(as(p))) p -= 1
      val isSign = p >= 0 && (as(p) == AOp("-") || as(p) == AOp("+"))
      if (!isSign) return (l, r)
      var q = p - 1
      while (q >= 0 && isWs(as(q))) q -= 1
      val unary = q < 0 || (as(q) match {
        case AOp(")") | AOp("]") => false
        case _: AOp => true
        case a => Seq("and", "or", "not", "in").exists(isKw(a, _))
      })
      if (unary) (p, r) else (l, r)
    }
    var r = from
    while (r >= 0 && isWs(as(r))) r -= 1
    require(r >= 0, "operator with no left operand")
    as(r) match {
      case AOp(")") =>
        var depth = 1; var l = r - 1
        while (l >= 0 && depth > 0) {
          as(l) match { case AOp("(") => depth -= 1; case AOp(")") => depth += 1
            case _ => () }
          if (depth > 0) l -= 1
        }
        require(l >= 0, "unbalanced parens")
        // include a function-call name directly before the group
        var l2 = l - 1
        while (l2 >= 0 && isWs(as(l2))) l2 -= 1
        if (l2 >= 0 && as(l2).isInstanceOf[AIdent]) withUnary(l2, r)
        else withUnary(l, r)
      case _: AIdent | _: ARaw | _: AStr => withUnary(r, r)
      case other => throw new IllegalArgumentException(
        s"cannot read operand ending at '$other' — parenthesize the expression")
    }
  }

  /** Index range [l, r] of the operand STARTING at (searching right from)
    * `from` inclusive; consumes an optional unary +/-. */
  private def operandRight(as: Vector[Atom], from: Int): (Int, Int) = {
    var l = from
    while (l < as.length && isWs(as(l))) l += 1
    require(l < as.length, "operator with no right operand")
    val start = as(l) match {
      case AOp("+") | AOp("-") =>
        var n = l + 1
        while (n < as.length && isWs(as(n))) n += 1
        n
      case _ => l
    }
    as(start) match {
      case AOp("(") =>
        var depth = 1; var r = start + 1
        while (r < as.length && depth > 0) {
          as(r) match { case AOp("(") => depth += 1; case AOp(")") => depth -= 1
            case _ => () }
          if (depth > 0) r += 1
        }
        require(r < as.length, "unbalanced parens")
        (l, r)
      case _: AIdent =>
        // possible call: ident '(' args ')'
        var n = start + 1
        while (n < as.length && isWs(as(n))) n += 1
        if (n < as.length && as(n) == AOp("(")) {
          var depth = 1; var r = n + 1
          while (r < as.length && depth > 0) {
            as(r) match { case AOp("(") => depth += 1
              case AOp(")") => depth -= 1; case _ => () }
            if (depth > 0) r += 1
          }
          (l, r)
        } else (l, start)
      case _: ARaw | _: AStr => (l, start)
      case other => throw new IllegalArgumentException(
        s"cannot read operand starting at '$other' — parenthesize the expression")
    }
  }

  private def prevSolid(as: Vector[Atom], i: Int): Option[Atom] = {
    var j = i
    while (j >= 0 && isWs(as(j))) j -= 1
    if (j >= 0) Some(as(j)) else None
  }
  private def nextSolid(as: Vector[Atom], i: Int): Option[Atom] = {
    var j = i
    while (j < as.length && isWs(as(j))) j += 1
    if (j < as.length) Some(as(j)) else None
  }

  /** All preprocessing passes; returns a Spark-SQL-parseable string.
    * private[graft] for the identity-property spec. */
  /** `twoValuedElemRefs`: dotted `nest.field` names of STRING- or
    * TIMESTAMP-typed nested fields. The NA-comparison regime splits on the
    * compared expression's RESULT TYPE (r9 fuzzer + r10 dt-audit probes,
    * all reference-executed): string and timestamp element comparisons are
    * 2-VALUED (NA == x → False, NA != x → True — `n.t != '2023-06-16'`
    * and `n.s.str.upper() != 'BB'` both KEEP the NA element), while
    * NUMERIC/BOOL element comparisons are Kleene (`n.x != 3.0` and
    * `n.s.str.len() != 2` both DROP it). Method results count: a chain's
    * LAST member decides (`n.t.dt.floor('D').dt.year` is numeric →
    * Kleene; `n.t.dt.day_name()` is string → 2-valued). */
  /** `stringBaseCols`: plain STRING base columns — pandas object-dtype
    * None MATCHES a None value in `isin` (`s in ['a', None]` keeps the
    * missing row) while float NaN and NaT match nothing (r10 probes). */
  private[graft] def preprocess(exprStr: String,
                                nestSet: Set[String] = Set.empty,
                                twoValuedElemRefs: Set[String] = Set.empty,
                                stringBaseCols: Set[String] = Set.empty)
      : String = {
    var as = atomize(tokenize(exprStr))

    // `in [a, b]` → `in (a, b)` (and `not in [...]`)
    var i = 0
    while (i < as.length) {
      if (isKw(as(i), "in")) {
        var j = i + 1
        while (j < as.length && isWs(as(j))) j += 1
        if (j < as.length && as(j) == AOp("[")) {
          var depth = 1; var k = j + 1
          while (k < as.length && depth > 0) {
            as(k) match { case AOp("[") => depth += 1
              case AOp("]") => depth -= 1; case _ => () }
            if (depth > 0) k += 1
          }
          require(k < as.length, s"unbalanced [ in: $exprStr")
          as = as.updated(j, AOp("(")).updated(k, AOp(")"))
        }
      }
      i += 1
    }

    // mask operators → logical keywords; ~ → not
    as = as.map {
      case AOp("~") | AOp("!") => ARaw(" not ")
      case AOp("&") | AOp("&&") => ARaw(" and ")
      case AOp("|") | AOp("||") => ARaw(" or ")
      case a => a
    }

    // ** and // → power / floor-div, operand-grabbed; iterate to fixpoint
    var changed = true
    while (changed) {
      changed = false
      val idx = as.indexWhere(a => a == AOp("**") || a == AOp("//"))
      if (idx >= 0) {
        val op = as(idx).asInstanceOf[AOp].s
        // `//` binds looser than unary minus (−3 // 4 = (−3)//4); `**`
        // binds tighter (−3 ** 2 = −(3**2)) — see operandLeft
        val (ll, lr) = operandLeft(as, idx - 1, absorbUnary = op == "//")
        val (rl, rr) = operandRight(as, idx + 1)
        prevSolid(as, ll - 1).foreach {
          case AOp(p) if Set("*", "/", "%", "//", "**").contains(p) =>
            throw new IllegalArgumentException(
              s"ambiguous `$p` next to `$op` — parenthesize: $exprStr")
          case _ => ()
        }
        nextSolid(as, rr + 1).foreach {
          case AOp(p) if Set("**").contains(p) =>
            throw new IllegalArgumentException(
              s"chained `**` is right-associative in Python — " +
                s"parenthesize: $exprStr")
          case _ => ()
        }
        val left = as.slice(ll, lr + 1).map(renderAtom).mkString
        val right = as.slice(rl, rr + 1).map(renderAtom).mkString
        val repl =
          if (op == "**") ARaw(s" power($left, $right) ")
          else ARaw(s" floor(($left) / ($right)) ")
        as = as.patch(ll, Seq(repl), rr - ll + 1)
        changed = true
      }
    }

    // nest-rooted ref inside text already collapsed by an earlier rewrite
    // (power/floor-div splice idents into ARaw). Global reduction CALLS
    // (`nest.field.agg(`) are scalars, not element refs — strip them
    // before testing, matching the direct-ident path's exclusion.
    def rawNestRef(s: String): Boolean = nestSet.exists { n =>
      val q = java.util.regex.Pattern.quote(n)
      // strip global reduction CALLS, incl. the dt-derived form
      // `nest.field.dt.attr.agg(` — scalars, not element refs
      val cleaned = s.replaceAll(
        q + "\\.\\w+(?:\\.dt\\.\\w+)?\\.(?:" + reductionAggs.mkString("|") +
          ")\\s*\\(", "")
      ("(^|[^\\w.`])" + q + "\\s*\\.").r.findFirstIn(cleaned).isDefined
    }
    /** Does this comparison span keep KLEENE missing semantics? True when
      * it references a nested field at element level (vs only base
      * columns / global reduction scalars) — EXCEPT when every element
      * ref's RESULT type is string or timestamp: those comparisons are
      * 2-valued in pandas even on arrow NA (probes: `t != 'aa'`,
      * `ts != '2023-06-16'`, `s.str.upper() != 'BB'`,
      * `ts.dt.day_name() != 'Friday'`, `ts.dt.floor('D') != d` all KEEP
      * the NA element; numeric `~(x == 1.0)`, `ts.dt.year != 2023`, and
      * `s.str.len() != 2` drop it). The 2-valued escape applies to
      * EQUALITY only (`eqOp`): ordering comparisons on string/timestamp
      * elements are Kleene like numerics (probe: `n.s <= 'ab'` and
      * `~(n.t.dt.round('h') <= d)` both DROP the NA element, while
      * `n.s != 'ab'` keeps it). A chained member after an element ref
      * (`.dt.m` / `.str.m` following a method call) re-types the chain —
      * the LAST member decides. */
    def elementSpan(span: Vector[Atom], eqOp: Boolean): Boolean = {
      val rawElem = span.exists {
        case ARaw(s) => rawNestRef(s)
        case _ => false
      }
      // kinds per element chain: true = 2-valued (string/timestamp result)
      val chainKinds = collection.mutable.ArrayBuffer.empty[Boolean]
      def memberTwoValued(acc: String, m: String): Option[Boolean] =
        acc match {
          case "str" => Some(strStringResult.contains(m))
          // dt attrs are all numeric/bool (Kleene); only the string/
          // timestamp-producing methods flip to 2-valued
          case "dt" => Some(dtTwoValuedMembers.contains(m))
          case _ => None
        }
      span.foreach {
        case AIdent(parts) if parts.headOption.exists(nestSet.contains) &&
            !(parts.length == 3 && reductionAggs.contains(parts(2))) &&
            // dt-derived global reduction `nest.field.dt.attr.agg()` is a
            // scalar, not an element ref
            !(parts.length == 5 && parts(2) == "dt" &&
              reductionAggs.contains(parts(4))) =>
          val kind =
            if (parts.length == 2)
              twoValuedElemRefs.contains(parts.mkString("."))
            else if (parts.length == 4)
              memberTwoValued(parts(2), parts(3)).getOrElse(false)
            else false // .isna()/.notna() masks etc. — not comparisons
          chainKinds += kind
        // chain follower `.dt.m` / `.str.m` after a call: re-types the
        // most recent element chain (the tokenizer splits `).dt.year`
        // into its own 2-part ident)
        case AIdent(Seq(acc, m)) if (acc == "dt" || acc == "str") &&
            !nestSet.contains(acc) && chainKinds.nonEmpty =>
          memberTwoValued(acc, m).foreach { k =>
            chainKinds(chainKinds.length - 1) = k
          }
        case _ => ()
      }
      // a bare None literal in the span forces KLEENE even for
      // string/timestamp equality: `n.t != None` drops EVERY element in
      // pandas (arrow comparison vs None → NA throughout; r10 probe),
      // unlike `n.t != 'x'` which keeps the NA element
      val hasNoneLit = span.exists {
        case AIdent(Seq("None")) => true
        case _ => false
      }
      val isElement = chainKinds.nonEmpty || rawElem
      val allTwoValued = eqOp && !rawElem && !hasNoneLit &&
        chainKinds.nonEmpty && chainKinds.forall(identity)
      // NOT modeled (documented divergence, COVERAGE.md): pandas'
      // np.sqrt over an arrow element series LAUNDERS NA into float64
      // NaN and the comparison flips to 2-valued — but only until an
      // arrow operand rehydrates it (probe: `sqrt(x) > 9` launders,
      // `abs(x)` stays arrow, `y + sqrt(abs(x))` rehydrates). That is
      // numpy/arrow dtype juggling, not a semantic contract; graft
      // keeps uniform Kleene for numeric element comparisons.
      isElement && !allTwoValued
    }

    // chained comparisons: O1 c1 O2 c2 O3 → (O1 c1 O2) and (O2 c2 O3)
    changed = true
    while (changed) {
      changed = false
      // find two cmp ops at the same depth with only operand atoms between
      var depth = 0
      var firstCmp = -1; var firstDepth = -1
      var k = 0
      var done = false
      while (k < as.length && !done) {
        as(k) match {
          case AOp("(") | AOp("[") => depth += 1
          case AOp(")") | AOp("]") => depth -= 1
          case AOp(c) if cmpOps.contains(c) =>
            if (firstCmp >= 0 && depth == firstDepth) {
              // chain found: [firstCmp, k]; gather full run of cmps
              val cmps = collection.mutable.ArrayBuffer(firstCmp, k)
              var d2 = depth; var m = k + 1
              var stop = false
              while (m < as.length && !stop) {
                as(m) match {
                  case AOp("(") | AOp("[") => d2 += 1
                  case AOp(")") | AOp("]") =>
                    d2 -= 1; if (d2 < depth) stop = true
                  case AOp(c2) if cmpOps.contains(c2) && d2 == depth =>
                    cmps += m
                  case AOp(",") if d2 == depth => stop = true
                  case a if (isKw(a, "and") || isKw(a, "or") ||
                    isKw(a, "not") || isKw(a, "in")) && d2 == depth =>
                    stop = true
                  case _ => ()
                }
                if (!stop) m += 1
              }
              val (s0, _) = operandLeft(as, firstCmp - 1, absorbUnary = true)
              val lastCmp = cmps.last
              val (_, eN) = operandRight(as, lastCmp + 1)
              // operands between consecutive cmps
              val bounds = (s0 +: cmps.toSeq.map(_ + 1)).zip(
                cmps.toSeq.map(_ - 1) :+ eN)
              val operands = bounds.map { case (a0, a1) =>
                as.slice(a0, a1 + 1).map(renderAtom).mkString.trim }
              val ops = cmps.toSeq.map(ci => as(ci).asInstanceOf[AOp].s)
              // each BASE-layer conjunct gets the pandas 2-valued wrap
              // here (the rewrite collapses to raw text, so the coalesce
              // pass below can no longer see these comparisons); element
              // layer keeps Kleene/SQL semantics — see the wrap pass
              // per-conjunct operator decides the 2-valued-equality escape
              val chainElemEq = elementSpan(as.slice(s0, eN + 1), eqOp = true)
              val chainElemOrd = elementSpan(as.slice(s0, eN + 1), eqOp = false)
              val joined = ops.zipWithIndex.map { case (c, oi) =>
                val cmp = s"(${operands(oi)} $c ${operands(oi + 1)})"
                val chainElement =
                  if (c == "==" || c == "!=") chainElemEq else chainElemOrd
                if (chainElement) cmp
                else s"coalesce($cmp, ${if (c == "!=") "true" else "false"})" }
                .mkString(" and ")
              as = as.patch(s0, Seq(ARaw(s" ($joined) ")), eN - s0 + 1)
              changed = true; done = true
            } else if (firstCmp < 0 || depth != firstDepth) {
              firstCmp = k; firstDepth = depth
            }
          case AOp(",") => firstCmp = -1
          case a if isKw(a, "and") || isKw(a, "or") || isKw(a, "not") ||
            isKw(a, "in") => firstCmp = -1
          case _ => ()
        }
        k += 1
      }
    }

    // pandas 2-VALUED comparison semantics for the BASE layer (found by
    // the r9 differential fuzzer): a comparison with a missing float64
    // operand is False — NaN < x, NaN == x, NaN in [...] — EXCEPT `!=`,
    // which is True (NaN != x, even x != x). SQL's 3-valued NULL instead
    // propagates, which flips behavior under negation: pandas KEEPS the
    // rows of `~(b > 1)` where b is missing, SQL drops them. Wrapping
    // every base-layer comparison span in coalesce(span, false|true)
    // makes all downstream boolean algebra 2-valued, exactly like pandas.
    //
    // ELEMENT-layer spans (any ident rooted at a nest, excluding global
    // reduction calls, which yield scalars) are NOT wrapped: nested
    // fields in the reference are always arrow-backed, and arrow NA
    // follows KLEENE logic — NA propagates through comparisons and ~,
    // and masks drop NA — which is exactly SQL 3-valued semantics
    // (fuzzer-verified both ways; COVERAGE.md records the layer split).
    // Each iteration collapses one comparison span to raw text, so the
    // scan converges.
    def depthArr(v: Vector[Atom]): Array[Int] = {
      val d = new Array[Int](v.length)
      var cur = 0
      for (k <- v.indices) v(k) match {
        case AOp("(") | AOp("[") => d(k) = cur; cur += 1
        case AOp(")") | AOp("]") => cur -= 1; d(k) = cur
        case _ => d(k) = cur
      }
      d
    }
    def isBoolBoundary(a: Atom): Boolean =
      a == AOp(",") || Seq("and", "or", "not", "in").exists(isKw(a, _))
    changed = true
    while (changed) {
      changed = false
      val dep = depthArr(as)
      val found = as.indices.find { k =>
        as(k) match {
          case AOp(op) => cmpOps.contains(op)
          case a => isKw(a, "in")
        }
      }
      found.foreach { c =>
        val d0 = dep(c)
        val isIn = as(c) match {
          case AOp(op) => !cmpOps.contains(op); case _ => true
        }
        // `x not in (...)`: the INFIX not sits directly before `in` and
        // belongs to the span (python's prefix form `not x in (...)`
        // parses as not(x in ...) and is handled by the plain-in wrap)
        var scanFrom = c - 1
        var notInfix = false
        if (isIn) {
          var p = c - 1
          while (p >= 0 && isWs(as(p))) p -= 1
          if (p >= 0 && isKw(as(p), "not")) { notInfix = true; scanFrom = p - 1 }
        }
        var l = scanFrom
        while (l >= 0 && dep(l) >= d0 &&
               !(dep(l) == d0 && isBoolBoundary(as(l)))) l -= 1
        val start = l + 1
        var r = c + 1
        var listOpen = -1
        if (isIn) {
          while (r < as.length && as(r) != AOp("(")) r += 1
          require(r < as.length, s"`in` without a value list in: $exprStr")
          listOpen = r
          var depth2 = 1
          r += 1
          while (r < as.length && depth2 > 0) {
            as(r) match {
              case AOp("(") => depth2 += 1
              case AOp(")") => depth2 -= 1
              case _ => ()
            }
            if (depth2 > 0) r += 1
          }
        } else {
          while (r < as.length && dep(r) >= d0 &&
                 !(dep(r) == d0 && isBoolBoundary(as(r)))) r += 1
          r -= 1
        }
        val dflt =
          if (isIn) { if (notInfix) "true" else "false" }
          else if (as(c) == AOp("!=")) "true"
          else "false"
        val span = as.slice(start, r + 1)
        // `in` wraps on BOTH layers: pandas routes membership through
        // isin, which maps NA → False even for arrow-backed nested
        // fields (r9 fuzzer, large-frame case: `~(n.x in [...])` KEEPS
        // null-x elements). Comparisons keep the layer split (element
        // layer = Kleene).
        val elementLayer = !isIn && elementSpan(span,
          eqOp = as(c) == AOp("==") || as(c) == AOp("!="))
        // element-layer isin with a None VALUE in the list: pandas arrow
        // isin matches NA against None (`n.x in [1, None]` KEEPS the NA
        // element; r10 probe) while SQL `x in (1, null)` is NULL there —
        // rewrite to `x in (values-sans-None) or x is null`, which also
        // renders False (not NULL) for a non-matching x against the
        // null-bearing list, exactly pandas. BASE isin keeps the plain
        // wrap: numpy NaN matches nothing, None included (probe: base
        // `b in [1, None]` drops the NaN row).
        val noneInList = isIn && as.slice(listOpen + 1, r).exists {
          case AIdent(Seq("None")) => true
          case _ => false
        }
        val elemIn = isIn && noneInList &&
          elementSpan(span, eqOp = false) // == "references nest elements"
        // base OBJECT-dtype strings also match None in isin (float NaN
        // and NaT do not — r10 probes): rewrite when the operand is
        // exactly one plain string base column
        val baseStrIn = isIn && noneInList && !elemIn && {
          val opAtoms = as.slice(start, c)
            .filterNot(a => isWs(a) || isKw(a, "not"))
          opAtoms match {
            case Vector(AIdent(Seq(one))) => stringBaseCols.contains(one)
            case _ => false
          }
        }
        val txt =
          if (!elemIn && !baseStrIn) span.map(renderAtom).mkString
          else {
            val opTxt = as.slice(start, c)
              .filterNot(a => isKw(a, "not"))
              .map(renderAtom).mkString.trim
            // comma-split the list atoms, drop the None groups
            val groups = collection.mutable.ListBuffer.empty[Vector[Atom]]
            var cur = Vector.empty[Atom]
            var d2 = 0
            as.slice(listOpen + 1, r).foreach {
              case a @ AOp("(") => d2 += 1; cur :+= a
              case a @ AOp(")") => d2 -= 1; cur :+= a
              case AOp(",") if d2 == 0 => groups += cur; cur = Vector.empty
              case a => cur :+= a
            }
            groups += cur
            val vals = groups.toList.map(_.map(renderAtom).mkString.trim)
              .filter(v => v.nonEmpty && v != "None")
            val membership =
              if (vals.isEmpty) s"(($opTxt) is null)"
              else s"((($opTxt) in (${vals.mkString(", ")})) " +
                s"or (($opTxt) is null))"
            if (notInfix) s"(not $membership)" else membership
          }
        // element layer: collapse WITHOUT the wrap (Kleene semantics) so
        // the scan still advances past this comparison
        val repl = if (elementLayer) ARaw(txt)
                   else ARaw(s" coalesce(($txt), $dflt) ")
        as = as.patch(start, Seq(repl), r + 1 - start)
        changed = true
      }
    }

    as.map(renderAtom).mkString
  }

  /** Simple one-function `.str` methods: method → Spark SQL fn name. */
  private val strSimple: Map[String, String] = Map(
    "upper" -> "upper", "lower" -> "lower",
    "casefold" -> "lower",
    "strip" -> "trim", "lstrip" -> "ltrim",
    "rstrip" -> "rtrim",
    "startswith" -> "startswith", "endswith" -> "endswith",
    "contains" -> "contains",
    // pandas ≥2 str.replace defaults to regex=False → Spark's literal
    // replace(str, search, replacement) matches
    "replace" -> "replace")

  /** Zero-arg character-class predicates, rendered as composite SQL
    * (pandas Series.str.is*; Unicode classes via Java regex). The empty
    * string is false for all of them, matching pandas.
    * Documented divergences from Python's str predicates:
    *  - isdigit: Python also accepts Numeric_Type=Digit characters that
    *    are NOT Unicode Nd (e.g. '²' superscript two, category No);
    *    `\p{Nd}` rejects those (Java regex has no Numeric_Type property).
    *  - isspace: matched with (?U) so Unicode whitespace (U+00A0 NBSP,
    *    U+2007 …) is accepted like Python; Java's default \s is
    *    ASCII-only. */
  private val strPredicates: Map[String, String => String] = Map(
    "isdigit" -> (x => s"regexp_like($x, '^\\\\p{Nd}+$$')"),
    "isnumeric" -> (x => s"regexp_like($x, '^\\\\p{N}+$$')"),
    "isalpha" -> (x => s"regexp_like($x, '^\\\\p{L}+$$')"),
    "isalnum" -> (x => s"regexp_like($x, '^[\\\\p{L}\\\\p{N}]+$$')"),
    "isspace" -> (x => s"regexp_like($x, '(?U)^\\\\s+$$')"),
    // pandas isupper/islower: every cased char in that case AND at least
    // one cased char exists (x <> other-case proves the latter)
    "isupper" -> (x => s"($x = upper($x) and $x <> lower($x))"),
    "islower" -> (x => s"($x = lower($x) and $x <> upper($x))"))

  /** Every supported `.str` method name (for the raise message and the
    * analyze-time validation). */
  private val strSupported: Seq[String] =
    (strSimple.keys.toSeq ++ strPredicates.keys ++ Seq(
      "capitalize", "len", "rjust", "ljust", "zfill", "pad", "center",
      "count", "find", "get", "slice", "split",
      "removeprefix", "removesuffix", "repeat", "extract",
      "swapcase", "title",
      "rsplit", "findall", "match", "fullmatch", "slice_replace")).sorted

  private def strUnsupported(m: String, exprStr: String): Nothing =
    throw new IllegalArgumentException(
      s".str.$m is not supported (supported: " +
        strSupported.mkString(", ") + s") in: $exprStr")

  /** Open a `.str.method` marker call; the user's textual argument list is
    * spliced in via the `__ARG1` marker (zero-arg methods swallow the
    * trailing `()` via `__LEN_CALL`), and the completed
    * `__GRAFTSTR_method(x, args…)` call is rewritten into final SQL by
    * [[rewriteStrMarkers]] — which can reference each argument as many
    * times as the composite needs (pandas semantics like non-truncating
    * rjust or sign-aware zfill are not single Spark functions). */
  private def strCall(m: String, x: String, exprStr: String): String = {
    if (!strSupported.contains(m)) strUnsupported(m, exprStr)
    s"__GRAFTSTR_$m($x __ARGS0 __ARG1"
  }

  // -------------------------------------------------------------------------
  // `.dt` accessor (pandas Series.dt over datetime64 columns). Reference-
  // executed 2026-08-14: the reference's query/eval run `.dt` on BOTH
  // layers (`ts.dt.year >= 2019` / `n.t.dt.year < 2021`), so this is
  // resolver-reachable surface, not dead API. Missing-value semantics come
  // free from the existing span classification: `n.t.dt.year` keeps its
  // nest-rooted ident (element Kleene, probe: NaT elements drop under both
  // a mask and its negation) while a base `ts.dt.year` span gets the
  // 2-valued coalesce wrap (probe: `~(ts.dt.year >= 2019)` KEEPS NaT rows).
  // Attributes render inline; normalize/strftime/floor are calls and route
  // through the str-marker argument splicing under dt-prefixed names.
  // -------------------------------------------------------------------------
  private val dtDow: String => String =
    // pandas Monday=0..Sunday=6; Spark dayofweek Sunday=1..Saturday=7
    x => s"((dayofweek($x) + 5) % 7)"
  private val dtDim: String => String = x => s"day(last_day($x))"
  private val dtAttrs: Map[String, String => String] = Map(
    "year" -> (x => s"year($x)"),
    "month" -> (x => s"month($x)"),
    "day" -> (x => s"day($x)"),
    "hour" -> (x => s"hour($x)"),
    "minute" -> (x => s"minute($x)"),
    "second" -> (x => s"second($x)"),
    // fractional-second part in micros (second() truncates)
    "microsecond" -> (x =>
      s"(cast(date_part('SECOND', $x) * 1000000 as bigint) % 1000000)"),
    // ns within the µs — Spark timestamps are µs-precision so this is 0
    // for every non-NULL value (pandas ns-unit data can be nonzero; the
    // µs data graft stores never is). Reference-executed r10 audit.
    "nanosecond" -> (x =>
      s"(cast(date_part('SECOND', $x) * 1000000000 as bigint) % 1000)"),
    "dayofweek" -> dtDow, "day_of_week" -> dtDow, "weekday" -> dtDow,
    "dayofyear" -> (x => s"dayofyear($x)"),
    "day_of_year" -> (x => s"dayofyear($x)"),
    "quarter" -> (x => s"quarter($x)"),
    "days_in_month" -> dtDim, "daysinmonth" -> dtDim,
    "date" -> (x => s"cast($x as date)"),
    "is_leap_year" -> (x =>
      s"(day(last_day(make_date(year($x), 2, 1))) = 29)"),
    "is_month_start" -> (x => s"(day($x) = 1)"),
    "is_month_end" -> (x => s"(cast($x as date) = last_day($x))"),
    "is_year_start" -> (x => s"(dayofyear($x) = 1)"),
    "is_year_end" -> (x => s"(month($x) = 12 and day($x) = 31)"),
    "is_quarter_start" -> (x =>
      s"(day($x) = 1 and month($x) in (1, 4, 7, 10))"),
    "is_quarter_end" -> (x =>
      s"(cast($x as date) = last_day($x) and month($x) in (3, 6, 9, 12))"))
  private val dtMethods = Set("normalize", "strftime", "floor",
    "ceil", "round", "day_name", "month_name", "as_unit")

  /** `.dt` members whose RESULT is a string or timestamp — comparisons on
    * them are 2-VALUED in pandas (see [[preprocess]]'s elementSpan). */
  private val dtTwoValuedMembers = Set("normalize", "floor", "ceil",
    "round", "as_unit", "strftime", "day_name", "month_name")

  /** `.str` methods whose RESULT is a string (comparisons 2-valued);
    * numeric/bool-result methods (len, count, find, predicates, match…)
    * stay Kleene. */
  private val strStringResult = Set("upper", "lower", "casefold", "strip",
    "lstrip", "rstrip", "replace", "capitalize", "title", "swapcase", "get",
    "slice", "removeprefix", "removesuffix", "repeat", "pad", "center",
    "ljust", "rjust", "zfill", "slice_replace", "extract")

  /** pandas fixed-frequency string → micros (`'15min'`, `'2h'`, `'D'`,
    * `'s'`, `'ms'`, incl. the deprecated single-letter aliases pandas
    * still accepts); non-fixed freqs (W/M/Y…) raise, matching pandas
    * `dt.floor/ceil/round` which accept fixed frequencies only. */
  private def freqMicros(freq: String, m: String, exprStr: String): Long = {
    val re = """^(\d*)(D|d|h|H|min|T|s|S|ms|L|us|U)$""".r
    freq match {
      case re(mult, unit) =>
        val u = unit match {
          case "D" | "d"   => 86400000000L
          case "h" | "H"   => 3600000000L
          case "min" | "T" => 60000000L
          case "s" | "S"   => 1000000L
          case "ms" | "L"  => 1000L
          case _           => 1L // us | U
        }
        val k = if (mult.isEmpty) 1L else mult.toLong
        require(k > 0, s".dt.$m: zero-multiple freq '$freq' in: $exprStr")
        k * u
      case _ => throw new IllegalArgumentException(
        s".dt.$m: unsupported freq '$freq' (fixed frequencies only: " +
          s"[n]D, [n]h, [n]min, [n]s, [n]ms, [n]us) in: $exprStr")
    }
  }

  private def dtUnsupported(m: String, exprStr: String): Nothing =
    throw new IllegalArgumentException(
      s".dt.$m is not supported (attributes: " +
        dtAttrs.keys.toSeq.sorted.mkString(", ") +
        s"; methods: ${dtMethods.toSeq.sorted.mkString(", ")}) in: $exprStr")

  /** Render a `.dt` member: attribute (no parens) inline, method via the
    * str-marker machinery for argument splicing.
    *
    * Boolean attributes (`is_*`) are numpy BOOL arrays on the base layer —
    * NaT yields False, and `~ts.dt.is_leap_year` KEEPS NaT rows (probe
    * 2026-08-14) — so the base render coalesces NULL to false. Element-
    * layer arrow bools keep NA (Kleene), so the nested render does not. */
  private def dtCall(m: String, x: String, hasParen: Boolean,
                     nested: Boolean, exprStr: String): String =
    if (hasParen) {
      if (!dtMethods.contains(m)) dtUnsupported(m, exprStr)
      // layer encoded in the marker name: the arrow-backed element layer
      // renders strftime's %S with a 9-digit ns fraction and %f as a
      // LITERAL (Arrow strftime, reference-executed) — base numpy doesn't
      s"__GRAFTSTR_dt${if (nested) "e" else "b"}$m($x __ARGS0 __ARG1"
    } else dtAttrSql(m, x, nested, exprStr)

  /** SQL for one `.dt` attribute over expression `x`, layer-aware:
    *  - dtype split the dt fuzz corpus exposed (reference-executed):
    *    numpy base `.dt.microsecond` is the FULL fractional part in µs
    *    (.978069 -> 978069) but the arrow-backed ELEMENT layer follows
    *    Arrow's decomposition — µs within the millisecond (-> 69);
    *  - base `is_*` attrs are numpy bool arrays (NaT -> False). */
  private def dtAttrSql(m: String, x: String, nested: Boolean,
                        exprStr: String): String = {
    val sql =
      if (m == "microsecond" && nested)
        s"(cast(date_part('SECOND', $x) * 1000000 as bigint) % 1000)"
      else dtAttrs.getOrElse(m, dtUnsupported(m, exprStr))(x)
    if (!nested && m.startsWith("is_")) s"coalesce($sql, false)" else sql
  }

  /** Translate a python strftime format to a Spark/Java date_format
    * pattern; literal runs are single-quote-escaped (letters are pattern
    * chars in Java). Unknown %-directives raise (no silent divergence).
    *
    * `arrow = true` mirrors the arrow-backed ELEMENT layer (Arrow's
    * strftime kernel, reference-executed via the dt fuzz corpus): %S
    * renders seconds WITH a 9-digit nanosecond fraction, and %f is not a
    * directive at all — it passes through as the literal text "%f". */
  private def strftimeToJava(fmt: String, exprStr: String,
                             arrow: Boolean = false): String = {
    val dir = Map('Y' -> "yyyy", 'y' -> "yy", 'm' -> "MM", 'd' -> "dd",
      'H' -> "HH", 'I' -> "hh", 'M' -> "mm", 'S' -> "ss", 'f' -> "SSSSSS",
      'j' -> "DDD", 'a' -> "EEE", 'A' -> "EEEE", 'b' -> "MMM",
      'B' -> "MMMM", 'p' -> "a")
    val sb = new StringBuilder
    val lit = new StringBuilder
    def flush(): Unit = if (lit.nonEmpty) {
      sb.append("'").append(lit.toString.replace("'", "''")).append("'")
      lit.clear()
    }
    var i = 0
    while (i < fmt.length) {
      val c = fmt(i)
      if (c == '%' && i + 1 < fmt.length) {
        val d = fmt(i + 1)
        if (d == '%') { lit += '%'; i += 2 }
        else if (arrow && d == 'f') { lit ++= "%f"; i += 2 }
        else if (arrow && d == 'S') {
          flush(); sb.append("ss'.'SSSSSSSSS"); i += 2
        } else dir.get(d) match {
          case Some(j) => flush(); sb.append(j); i += 2
          case None => throw new IllegalArgumentException(
            s".dt.strftime: unsupported directive %$d in: $exprStr")
        }
      } else { lit += c; i += 1 }
    }
    flush()
    sb.toString
  }

  /** SQL keywords / function names we must not treat as column refs. */
  private val keywords = Set(
    "and", "or", "not", "in", "is", "null", "true", "false", "like", "rlike",
    "between", "case", "when", "then", "else", "end", "cast", "as", "distinct")

  /** Reductions usable as `nest.field.agg()` in eval expressions. Pandas
    * eval resolves `nest.field` to the FLAT series and calls the Series
    * reduction — a GLOBAL scalar broadcast to every row
    * (test_nestedframe.py test_mixed_eval_funcs: `a + packed.c.median()`
    * adds the whole-column median, reference-executed golden [4,5,6]).
    * Until round 8 the dialect computed PER-CELL reductions here — a
    * silent divergence; the per-cell form remains available
    * programmatically via [[elementReduction]]. */
  private val reductionAggs = Set(
    "mean", "median", "sum", "min", "max", "count", "std")

  /** One GLOBAL reduction requested by an expression — `nest.field.agg()`
    * over exploded elements (`nest` non-empty, `sqlE` references the
    * exploded alias `__e`), or a BASE-column / dt-derived reduction
    * (`nest` empty, `sqlE` over the frame's own columns: `a.mean()`,
    * `ts.dt.year.mean()` — reference-executed r9 session-3 probe).
    * Rendered in the rewritten SQL as a reference to helper column `name`;
    * the helper is attached LAZILY by [[withReductions]] at consume time.
    * `srcCol` is the top-level column the reduction reads (the nest, or
    * the base column) — [[eval]]'s cross-line hoist uses it to keep a
    * reduction per-line when an earlier line writes that column. */
  private case class Reduction(nest: String, sqlE: String, agg: String,
                               srcCol: String) {
    /** Helper-column name, deterministic by CONTENT (not extraction
      * order) so separate analyze passes over the same expression agree
      * on the name — [[eval]]'s hoist attaches helpers in a pre-pass and
      * each line's own analysis must resolve to the same columns. Two
      * independent 31-bit hashes make a cross-reduction collision (which
      * would silently alias two different values) vanishingly unlikely. */
    val name: String = {
      import scala.util.hashing.MurmurHash3.stringHash
      val key = s"$nest|$sqlE|$agg"
      f"__graft_red_${stringHash(key) & 0x7fffffff}%08x" +
        f"${stringHash(key, 0x9e3779b9) & 0x7fffffff}%08x"
    }
  }

  /** The aggregate Column for one reduction over the SQL expression
    * `sqlE` (shared scan — see [[withReductions]]). `floating = true`
    * rewrites NaN → NULL first: pandas reductions are skipna=True, so a
    * literal NaN value must not poison mean/sum/std or win min/max
    * (Spark orders NaN as the largest double) — same parity rule as
    * `aggAllColumns`' default path. */
  private def reductionAggCol(sqlE: String, agg: String,
                              floating: Boolean)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{avg, sum, min, max, count,
      stddev_samp}
    val e = if (floating) s"nanvl(($sqlE), cast(null as double))"
            else s"($sqlE)"
    val v = expr(e)
    agg match {
      case "mean"   => avg(v)
      case "median" => expr(s"percentile($e, 0.5)")
      case "sum"    => sum(v)
      case "min"    => min(v)
      case "max"    => max(v)
      case "count"  => count(v)
      case "std"    => stddev_samp(v)
    }
  }

  /** Attach the helper columns for an expression's GLOBAL reductions —
    * LAZILY: one explode+aggregate per referenced nest computes EVERY
    * reduction of that nest in a single pass (they share the exploded
    * scan), joined back as a broadcast single-row cross join. Building an
    * eval/query plan therefore never runs a Spark job (until round 9 each
    * occurrence ran one eager distributed agg at parse time and spliced
    * the value as a literal), and Catalyst can reuse/cache the scan.
    * Pandas edge (documented divergence, unchanged from the eager path):
    * over an empty/all-null column pandas yields NaN for mean/median/std
    * where SQL aggregation yields NULL. */
  private def withReductions(df: DataFrame, reds: Seq[Reduction]): DataFrame = {
    // helpers already attached (by eval's cross-line hoist) are skipped —
    // content-hashed names make the two analyze passes agree
    val pending = reds.distinct.filterNot(r => df.columns.contains(r.name))
    if (pending.isEmpty) df
    else {
      import org.apache.spark.sql.functions.{broadcast, explode}
      pending.groupBy(_.nest).toSeq.sortBy(_._1).foldLeft(df) {
        case (acc, (nest, rs)) =>
          // base/dt-derived reductions aggregate the frame directly
          // (no explode); nested ones share one exploded scan per nest
          val src =
            if (nest.isEmpty) df
            else df.select(explode(col(bq(nest))).as("__e"))
          val aggCols = rs.map { r =>
            // resolve the value type lazily (no job) to decide whether the
            // NaN→NULL skipna rewrite applies — only floating types have NaN
            val vType = src.select(expr(r.sqlE)).schema.head.dataType
            val floating = vType == org.apache.spark.sql.types.DoubleType ||
              vType == org.apache.spark.sql.types.FloatType
            reductionAggCol(r.sqlE, r.agg, floating).as(r.name)
          }
          acc.crossJoin(broadcast(src.agg(aggCols.head, aggCols.tail: _*)))
      }
    }
  }

  /** PER-CELL element reduction as a row-level Column — an ENGINE
    * EXTENSION (the reference's eval reductions are global; there is no
    * per-cell reduction in its dialect). Same narrow array-expression
    * core the dialect used before round 8: no shuffle, no explode.
    * NULLs are filtered; a literal NaN element PARTICIPATES (Spark HOF
    * semantics) — unlike the GLOBAL reductions, which are pandas-parity
    * skipna (no pandas analog exists here to diverge from). */
  def elementReduction(nest: String, field: String, agg: String)
      : org.apache.spark.sql.Column = {
    require(reductionAggs.contains(agg),
      s"unknown element reduction '$agg' (supported: " +
        s"${reductionAggs.toSeq.sorted.mkString(", ")})")
    expr(reductionSql(nest, field, agg))
  }

  private def reductionSql(nest: String, field: String, agg: String): String = {
    val arr = s"transform(${bq(nest)}, __r -> __r.${bq(field)})"
    val vals = s"filter($arr, __v -> __v is not null)"
    def n = s"size($vals)"
    def sumOf(a: String) = s"aggregate($a, cast(0.0 as double), (__a, __v) -> __a + __v)"
    // `transform(array(x), __b -> body)[1]` is the SQL let-binding: x is
    // evaluated ONCE even though body references it many times. Spark does
    // not CSE through HOF lambdas, so the naive formulation re-ran the
    // filter chain / fold / sort once per reference (2-3 folds per mean/std
    // — the repo's SCALING.md no-CSE rule).
    def let(bound: String, body: String => String): String =
      s"element_at(transform(array($bound), __b -> ${body("__b")}), 1)"
    agg match {
      case "count" => s"cast($n as bigint)"
      case "sum"   => sumOf(vals)
      case "min"   => s"array_min($vals)"
      case "max"   => s"array_max($vals)"
      case "mean"  => let(vals, v =>
        s"(case when size($v) = 0 then null else ${sumOf(v)} / size($v) end)")
      case "median" => let(s"array_sort($vals)", sv =>
        // divide by double(2), not the literal 2.0: Spark SQL parses 2.0 as
        // DECIMAL(2,1), which silently promotes integer-field medians to
        // DECIMAL instead of the double every other reduction returns
        s"""(case when size($sv) = 0 then null else
           | (element_at($sv, cast((size($sv) + 1) / 2 as int)) +
           |  element_at($sv, cast(size($sv) / 2 as int) + 1))
           |  / cast(2 as double) end)"""
          .stripMargin.replace("\n", " "))
      case "std" =>
        // ONE fold accumulating (n, Σv, Σv²) in a struct: per-element
        // accumulation order matches the separate folds exactly, so the
        // derived value is bit-identical to the 3-fold formulation.
        val acc = s"aggregate($vals, named_struct(" +
          "'n', cast(0 as bigint), 's', cast(0.0 as double), " +
          "'q', cast(0.0 as double)), " +
          "(__a, __v) -> named_struct('n', __a.n + 1, 's', __a.s + __v, " +
          "'q', __a.q + __v * __v))"
        let(acc, t =>
          s"""(case when $t.n <= 1 then null else
             | sqrt(greatest(0.0, ($t.q - $t.s * $t.s / $t.n)
             |   / ($t.n - 1))) end)""".stripMargin.replace("\n", " "))
    }
  }

  /** Parse result: rewritten SQL + the nests referenced at element level (in
    * first-reference order, distinct) + whether base columns are referenced
    * + the global reductions the SQL references as helper columns (attach
    * with [[withReductions]], drop the helper names after consuming). */
  private case class Analysis(sql: String, nests: Seq[String],
                              usesBase: Boolean,
                              reductions: Seq[Reduction] = Nil) {
    def helperNames: Seq[String] = reductions.map(_.name)
  }

  /** `ref(nest, field)` renders an element-level reference to a nested field;
    * the default targets a single-lambda-variable context. Cross-nest callers
    * pass a renderer that distinguishes the anchor nest (`__x`) from other
    * nests (positional `nest[__i]` access). */
  /** Python float literals must render as Spark DOUBLE literals: a bare
    * `2.39` parses as DECIMAL(3,2) in Spark SQL, so arithmetic whose
    * other operands are all integers STAYS decimal and an aggregate over
    * it rounds to scale+4 digits (a 1,500-case alternate-seed fuzz sweep
    * caught `(2.39 + abs(y-1)).mean()` diverging in the 7th decimal —
    * pandas computes in float64). Exponent forms (`1.5E3`) are already
    * DoubleLiterals and the sci-notation identity test pins them
    * untouched. Applied to Text tokens only — string literals (Str) and
    * identifiers (Ident) never pass through. */
  private val floatLitRe =
    """(?<![\w.])(?:(\d+\.\d+|\.\d+)|(\d+\.))(?![\dEeDd.\w])""".r
  /** `protectTrailing`: a fractional MANTISSA adjoining a sci exponent
    * tokenizes as Text("1.5") + Ident("e3") — the lookahead cannot see
    * across tokens, so the caller flags when the NEXT token is an
    * exponent ident and the literal flush at the end of this run must
    * stay untouched (`1.5De3` would not parse). */
  private def doubleizeFloats(t: String,
                              protectTrailing: Boolean = false): String =
    floatLitRe.replaceAllIn(t, m =>
      if (protectTrailing && m.end == t.length)
        scala.util.matching.Regex.quoteReplacement(m.matched)
      else if (m.group(1) != null) m.group(1) + "D"
      else m.group(2) + "0D")

  /** True when toks(idx) directly follows a call's closing paren — the
    * previous Text run ends `)` + optional whitespace + `.` (the dot
    * before a chained accessor is absorbed into the Text). Used to let
    * `.dt.` / `.str.` chains win over a column literally named dt/str:
    * a real `dt.year` column path can never directly follow a `)`. */
  private def followsCallClose(toks: Seq[Tok], idx: Int): Boolean =
    idx > 0 && (toks(idx - 1) match {
      case Text(t) => t.matches("""(?s).*\)\s*\.\s*""")
      case _       => false
    })

  /** True when the reduction Ident at `idx` IS the whole expression —
    * nothing but blank text before it and nothing but its own `()` after.
    * A bare `is_*.min()/max()` then converts the int helper back to
    * BOOLEAN (pandas keeps bool dtype); any composed use stays numeric
    * (bool is duck-numeric in pandas: True + 1 = 2). */
  private def bareReductionUse(toks: Seq[Tok], idx: Int): Boolean = {
    val (pre, post) = (toks.take(idx), toks.drop(idx + 1))
    val allText = (pre ++ post).forall {
      case Text(_) => true; case _ => false
    }
    if (!allText) false
    else {
      // surrounding text may be nothing but balanced parens/whitespace:
      // `(ts.dt.is_leap_year.min())` is still a bare use (pandas keeps
      // bool dtype through redundant parens) — ADVICE r10
      val before = pre.collect { case Text(t) => t }
        .mkString.filterNot(_.isWhitespace)
      val after = post.collect { case Text(t) => t }
        .mkString.filterNot(_.isWhitespace)
      before.forall(_ == '(') && after.startsWith("()") &&
        after.drop(2).forall(_ == ')') &&
        after.length - 2 == before.length
    }
  }

  /** sqlE adjustment for a dt-derived GLOBAL reduction: pandas treats
    * boolean `is_*` attrs as numeric under aggregation (mean = fraction
    * of true, sum = count of true) where Spark rejects avg(boolean) —
    * cast to int ALWAYS, so the helper composes with arithmetic
    * (`is_leap_year.max() + 1` is 2 in pandas — bool is duck-numeric);
    * a BARE `is_*.min()/max()` use converts back to BOOLEAN at the
    * splice (pandas keeps the bool dtype there: min() is False, not 0 —
    * executed 2026-08-15). `.dt.date` aggregates only where dates order
    * (min/max/count); the rest raise (r9 s4 review). */
  /** Splice-site reference to a reduction helper: a BARE boolean-attr
    * min/max converts the int helper back to boolean (see
    * [[bareReductionUse]]); a NULL helper stays NULL through `= 1`. */
  private def boolReductionRef(name: String, attr: String, agg: String,
                               bare: Boolean): String =
    if (bare && attr.startsWith("is_") && (agg == "min" || agg == "max"))
      s"(${bq(name)} = 1)"
    else bq(name)

  private def dtReduceCast(attr: String, sqlE: String, agg: String,
                           exprStr: String): String =
    if (attr.startsWith("is_")) s"cast($sqlE as int)"
    else if (attr == "date" && !Set("min", "max", "count").contains(agg))
      throw new IllegalArgumentException(
        s".dt.date.$agg() is not supported (date-valued attributes " +
          s"aggregate with min/max/count) in: $exprStr")
    else sqlE

  private def analyze(df: DataFrame, exprStr: String,
                      ref: (String, String) => String): Analysis = {
    val nestSet = NestedOps.nestedColumns(df).toSet
    val baseSet = NestedOps.baseColumns(df).toSet
    val nests = collection.mutable.LinkedHashSet.empty[String]
    val reds = collection.mutable.LinkedHashMap
      .empty[(String, String, String), Reduction]
    var usesBase = false
    // string- AND timestamp-typed fields: both compare 2-valued on NA
    // (reference-executed; see preprocess's elementSpan)
    val twoValuedElemRefs: Set[String] = df.schema.fields.toSeq.flatMap { f =>
      f.dataType match {
        case ArrayType(s: StructType, _) =>
          s.fields.toSeq.collect {
            case sf if sf.dataType == StringType ||
              sf.dataType == TimestampType ||
              sf.dataType == TimestampNTZType =>
              s"${f.name}.${sf.name}"
          }
        case _ => Nil
      }
    }.toSet
    val stringBaseCols: Set[String] = df.schema.fields.collect {
      case f if f.dataType == StringType => f.name
    }.toSet
    val toks = tokenize(preprocess(exprStr, nestSet, twoValuedElemRefs,
      stringBaseCols))
    val sql = toks.zipWithIndex.map {
      case (Text(t), idx) =>
        doubleizeFloats(t, protectTrailing =
          toks.drop(idx + 1).headOption.exists {
            case Ident(Seq(one)) => one.matches("[eE][0-9]*")
            case _               => false
          })
      case (Str(t), _)  => t
      case (Ident(parts), idx) =>
        parts match {
          // nest.len() — row-level length (core.py:1580-1589). A NULL
          // cell is 0, not NULL: the executed reference reports 0
          // (r9 probe: eval "r = n.len()" on a missing cell → 0, so
          // query "~(n.len() > 0)" KEEPS it). The programmatic API
          // (NestedOps.nestLen) stays NULL-distinct by documented choice.
          case Seq(nest, "len") if nestSet.contains(nest) &&
              toks.drop(idx + 1).headOption.exists {
                case Text(t) => t.trim.startsWith("()"); case _ => false } =>
            usesBase = true
            s"coalesce(size(${bq(nest)}), 0) __LEN_CALL"
          // nest.isna() / nest.notna() — row-level NULL-cell predicate
          // (the nest treated as a Series; reference
          // test_series_methods_on_nest_in_query_eval)
          case Seq(nest, fn) if nestSet.contains(nest) &&
              (fn == "isna" || fn == "notna") &&
              toks.drop(idx + 1).headOption.exists {
                case Text(t) => t.trim.startsWith("()"); case _ => false } =>
            usesBase = true
            val not = if (fn == "notna") " not" else ""
            s"(${bq(nest)} is$not null) __LEN_CALL"
          // nest.field.agg() — GLOBAL Series reduction (pandas eval
          // semantics; the r8 parity fix). Rendered as a helper-column
          // reference, attached lazily by withReductions — building the
          // expression runs no job. Per-cell via elementReduction.
          case Seq(nest, field, agg) if nestSet.contains(nest) &&
              reductionAggs.contains(agg) &&
              toks.drop(idx + 1).headOption.exists {
                case Text(t) => t.trim.startsWith("()"); case _ => false } =>
            usesBase = true
            val sqlE = s"__e.${bq(field)}"
            val r = reds.getOrElseUpdate((nest, sqlE, agg),
              Reduction(nest, sqlE, agg, srcCol = nest))
            bq(r.name) + " __LEN_CALL"
          // base-column global reduction `a.mean()` (pandas eval Series
          // reduction — reference-executed r9 session-3 probe)
          case Seq(base, agg) if baseSet.contains(base) &&
              reductionAggs.contains(agg) &&
              toks.drop(idx + 1).headOption.exists {
                case Text(t) => t.trim.startsWith("()"); case _ => false } =>
            usesBase = true
            val r = reds.getOrElseUpdate(("", bq(base), agg),
              Reduction("", bq(base), agg, srcCol = base))
            bq(r.name) + " __LEN_CALL"
          // dt-derived global reductions: `ts.dt.year.mean()` /
          // `n.t.dt.year.mean()` — attribute chain into a Series
          // reduction, still one global scalar broadcast
          case Seq(base, "dt", attr, agg) if baseSet.contains(base) &&
              reductionAggs.contains(agg) && dtAttrs.contains(attr) &&
              toks.drop(idx + 1).headOption.exists {
                case Text(t) => t.trim.startsWith("()"); case _ => false } =>
            usesBase = true
            val sqlE = dtReduceCast(attr,
              dtAttrSql(attr, bq(base), nested = false, exprStr), agg, exprStr)
            val r = reds.getOrElseUpdate(("", sqlE, agg),
              Reduction("", sqlE, agg, srcCol = base))
            boolReductionRef(r.name, attr, agg, bareReductionUse(toks, idx)) +
              " __LEN_CALL"
          case Seq(nest, field, "dt", attr, agg) if nestSet.contains(nest) &&
              reductionAggs.contains(agg) && dtAttrs.contains(attr) &&
              toks.drop(idx + 1).headOption.exists {
                case Text(t) => t.trim.startsWith("()"); case _ => false } =>
            usesBase = true
            val sqlE = dtReduceCast(attr,
              dtAttrSql(attr, s"__e.${bq(field)}", nested = true, exprStr),
              agg, exprStr)
            val r = reds.getOrElseUpdate((nest, sqlE, agg),
              Reduction(nest, sqlE, agg, srcCol = nest))
            boolReductionRef(r.name, attr, agg, bareReductionUse(toks, idx)) +
              " __LEN_CALL"
          // nest.field.isna()/.notna() — ELEMENT-level NULL predicate
          // (reference test_eval_funcs, test_nestedframe.py:2406-2418:
          // query("nested.b.isna()") filters elements, not rows)
          case Seq(nest, field, fn) if nestSet.contains(nest) &&
              (fn == "isna" || fn == "notna") &&
              toks.drop(idx + 1).headOption.exists {
                case Text(t) => t.trim.startsWith("()"); case _ => false } =>
            nests += nest
            // pandas isna(NaN) is True — floating fields test isnan too
            // (r9s5 NaN-parity rule; non-floating fields NULL-only)
            val floating = NestedOps.subColumns(df, nest).contains(field) &&
              (NestedOps.nestedStruct(df, nest)(field).dataType match {
                case org.apache.spark.sql.types.DoubleType |
                     org.apache.spark.sql.types.FloatType => true
                case _ => false
              })
            val e = ref(nest, field)
            val pred =
              if (floating) s"($e is null or isnan($e))"
              else s"($e is null)"
            val body = if (fn == "notna") s"(not $pred)" else pred
            s"$body __LEN_CALL"
          // nest.field.str.method(...) — pandas Series.str accessor
          // (resolver-reachable in the reference, expr.py:24-46)
          case Seq(nest, field, "str", m) if nestSet.contains(nest) &&
              toks.drop(idx + 1).headOption.exists {
                case Text(t) => t.trim.startsWith("("); case _ => false } =>
            nests += nest
            strCall(m, ref(nest, field), exprStr)
          case Seq(base, "str", m) if baseSet.contains(base) &&
              toks.drop(idx + 1).headOption.exists {
                case Text(t) => t.trim.startsWith("("); case _ => false } =>
            usesBase = true
            strCall(m, bq(base), exprStr)
          // nest.field.dt.m / base.dt.m — pandas Series.dt accessor
          // (reference-executed on both layers; see the dtAttrs block)
          case Seq(nest, field, "dt", m) if nestSet.contains(nest) =>
            nests += nest
            dtCall(m, ref(nest, field), toks.drop(idx + 1).headOption.exists {
              case Text(t) => t.trim.startsWith("("); case _ => false },
              nested = true, exprStr)
          case Seq(base, "dt", m) if baseSet.contains(base) =>
            usesBase = true
            dtCall(m, bq(base), toks.drop(idx + 1).headOption.exists {
              case Text(t) => t.trim.startsWith("("); case _ => false },
              nested = false, exprStr)
          // chained `.dt.m` AFTER a preceding .dt method call, e.g.
          // `ts.dt.floor('D').dt.year` (reference-executed: chains work
          // through pandas series results). Attr chains self-close their
          // parens (no user args); method chains splice like .str chains.
          // The layer comes from the BASE marker's name at rewrite time.
          // A column literally NAMED `dt` doesn't shadow the chain when
          // the previous token ends the preceding call's `)` — a real
          // `dt.year` column path can never directly follow one
          // (r9 session-4 review).
          case Seq("dt", m) if (!nestSet.contains("dt") &&
              !baseSet.contains("dt")) || followsCallClose(toks, idx) =>
            val paren = toks.drop(idx + 1).headOption.exists {
              case Text(t) => t.trim.startsWith("("); case _ => false }
            if (paren) {
              if (!dtMethods.contains(m)) dtUnsupported(m, exprStr)
              s"__GRAFTSTRCHAIN_dtchain$m(__ARGS1 __ARG1"
            } else {
              if (!dtAttrs.contains(m)) dtUnsupported(m, exprStr)
              s"__GRAFTSTRCHAIN_dtattr$m()"
            }
          // chained `.str.m` AFTER a preceding .str call, e.g.
          // `nested.s.str.split(',').str.get(0)` — the `).str.get`
          // tokenizes as Text(").") + Ident(str, get); emit a chain
          // marker that rewriteStrMarkers absorbs into the base call
          // (same `str`-named-column disambiguation as the dt chain)
          case Seq("str", m) if ((!nestSet.contains("str") &&
              !baseSet.contains("str")) || followsCallClose(toks, idx)) &&
              toks.drop(idx + 1).headOption.exists {
                case Text(t) => t.trim.startsWith("("); case _ => false } =>
            if (!strSupported.contains(m)) strUnsupported(m, exprStr)
            s"__GRAFTSTRCHAIN_$m(__ARGS1 __ARG1"
          case Seq(nest, field) if nestSet.contains(nest) =>
            nests += nest
            ref(nest, field)
          case Seq(one) if baseSet.contains(one) =>
            usesBase = true; bq(one)
          case Seq(one) if keywords.contains(one.toLowerCase) => one
          // python None literal → SQL null (True/False already parse via
          // the case-insensitive keyword pass above). Comparisons against
          // it: base 2-valued wrap (== None → no rows, != None → all,
          // matching numpy), element layer FORCED Kleene (probe: every
          // element drops under == and !=) — see elementSpan.
          case Seq("None") => "null"
          case Seq(one) if nestSet.contains(one) => usesBase = true; bq(one)
          // unknown single token: a SQL function CALL (followed by `(`) passes
          // through to Spark's parser; anything else is a typo'd column —
          // fail HERE with a clear message instead of deep in analysis
          case Seq(one) if toks.drop(idx + 1).headOption.exists {
              case Text(t) => t.trim.startsWith("("); case _ => false } => one
          // scientific-notation tail: "1e-9" tokenizes as Text("1"),
          // Ident("e"), Text("-9") — not a column reference. A trailing
          // '.' counts when a digit precedes it: `3.e2` is a valid
          // python float whose mantissa doubleizeFloats left protected
          case Seq(one) if one.matches("[eE][0-9]*") && idx > 0 &&
              (toks(idx - 1) match {
                case Text(t) => t.nonEmpty && (t.last.isDigit ||
                  (t.last == '.' && t.length > 1 &&
                    t.charAt(t.length - 2).isDigit))
                case _       => false }) => one
          // kwarg name inside a .str argument list (side=, stop=, …):
          // bare `=` (not `==`) after an unknown ident is not valid
          // pandas-eval syntax anywhere else — pass it through verbatim
          // for the marker-call arg parser
          case Seq(one) if toks.drop(idx + 1).headOption.exists {
              case Text(t) =>
                val s = t.trim
                s.startsWith("=") && !s.startsWith("==")
              case _ => false } => one
          case Seq(one) =>
            throw new IllegalArgumentException(
              s"Unknown column '$one' in: $exprStr " +
                s"(known: ${(baseSet ++ nestSet).toSeq.sorted.mkString(", ")})")
          case other =>
            throw new IllegalArgumentException(
              s"Unresolvable column path '${other.mkString(".")}' in: $exprStr")
        }
    }.mkString
    val spliced = sql
      // drop the () of len() calls: "size(n) __LEN_CALL ()" -> "size(n)"
      .replaceAll("""__LEN_CALL\s*\(\s*\)""", "")
      // splice str-method args: "…(x __ARGS0 __ARG1 ('r')" absorbs the
      // user's argument list into the marker call
      .replaceAll("""__ARG1\s*\(""", "")
      // __ARGS0 separates the receiver from user args: comma when args
      // follow, nothing before the closing paren (zero-arg call)
      .replaceAll("""__ARGS0\s*\)""", ")")
      .replaceAll("""__ARGS0\s*""", ", ")
      // __ARGS1 is the no-receiver variant used by chain markers
      .replaceAll("""__ARGS1\s*\)""", ")")
      .replaceAll("""__ARGS1\s*""", "")
    Analysis(rewriteStrMarkers(spliced, exprStr), nests.toSeq, usesBase,
      reds.values.toSeq)
  }

  // -------------------------------------------------------------------------
  // `.str` marker rewriting: once the user's textual argument lists are
  // spliced into `__GRAFTSTR_m(x, args…)` / chained `.__GRAFTSTRCHAIN_m(…)`
  // calls, parse them (balanced parens, quote-aware) and render final SQL.
  // Unlike the naive single-function mapping this lets a method reference
  // its arguments as many times as the pandas semantics need (e.g.
  // non-truncating rjust, sign-aware zfill, python slice normalization).
  // -------------------------------------------------------------------------

  /** Parse a parenthesized argument list starting at (or after whitespace
    * from) `from`; returns the top-level-comma-split args (trimmed) and the
    * index just past the closing paren. Quote- and nesting-aware. */
  private def parseArgList(s: String, from: Int,
                           exprStr: String): (Seq[String], Int) = {
    var i = from
    while (i < s.length && s(i).isWhitespace) i += 1
    require(i < s.length && s(i) == '(',
      s"malformed .str call in: $exprStr")
    i += 1
    val args = collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 1
    while (i < s.length && depth > 0) {
      val c = s(i)
      if (c == '\'' || c == '"') {
        val q = c; cur += c; i += 1
        while (i < s.length && s(i) != q) {
          if (s(i) == '\\' && i + 1 < s.length) {
            cur += s(i); cur += s(i + 1); i += 2
          } else { cur += s(i); i += 1 }
        }
        require(i < s.length, s"unclosed quote in: $exprStr")
        cur += q; i += 1
      } else if (c == '(' || c == '[') { depth += 1; cur += c; i += 1 }
      else if (c == ']') { depth -= 1; cur += c; i += 1 }
      else if (c == ')') {
        depth -= 1
        if (depth > 0) cur += c
        i += 1
      } else if (c == ',' && depth == 1) { args += cur.toString; cur.clear(); i += 1 }
      else { cur += c; i += 1 }
    }
    require(depth == 0, s"unbalanced parens in .str call in: $exprStr")
    args += cur.toString
    val trimmed = args.toSeq.map(_.trim)
    (if (trimmed == Seq("")) Nil else trimmed, i)
  }

  // leading \s* : pandas accepts whitespace between chained accessor
  // calls — `x.str.split(',') .str.get(0)` is legal — and the matched
  // length (whitespace included) keeps the caller's end-offset bookkeeping
  // exact.
  private val strChainRe = """^\s*\.__GRAFTSTRCHAIN_(\w+)""".r

  /** First occurrence of `needle` in `s` OUTSIDE any quoted string
    * literal (marker text typed by a user inside a literal is data, not
    * a marker call), or -1. */
  private def indexOfOutsideQuotes(s: String, needle: String): Int = {
    var i = 0
    while (i < s.length) {
      val c = s(i)
      if (c == '\'' || c == '"') {
        val q = c; i += 1
        while (i < s.length && s(i) != q) {
          if (s(i) == '\\' && i + 1 < s.length) i += 2 else i += 1
        }
        i += 1
      } else if (s.startsWith(needle, i)) return i
      else i += 1
    }
    -1
  }

  /** Rewrite every completed str-marker call (and its chain) in `sql0`. */
  private def rewriteStrMarkers(sql0: String, exprStr: String): String = {
    val MARK = "__GRAFTSTR_"
    var sql = sql0
    var guard = 0
    var i = indexOfOutsideQuotes(sql, MARK)
    while (i >= 0) {
      guard += 1
      require(guard < 1000, s"str-marker rewrite did not converge: $exprStr")
      var j = i + MARK.length
      val nameStart = j
      while (j < sql.length && (sql(j).isLetterOrDigit || sql(j) == '_')) j += 1
      val m0 = sql.substring(nameStart, j)
      val (args0, end0) = parseArgList(sql, j, exprStr)
      require(args0.nonEmpty, s"malformed .str.$m0 call in: $exprStr")
      // receiver + user args; args may themselves contain markers — recurse
      var cur = rewriteStrMarkers(args0.head, exprStr)
      var calls = List((m0, args0.tail.map(rewriteStrMarkers(_, exprStr))))
      var end = end0
      var chaining = true
      while (chaining) {
        strChainRe.findFirstMatchIn(sql.substring(end)) match {
          case Some(mm) =>
            val (cargs, cend) =
              parseArgList(sql, end + mm.matched.length, exprStr)
            calls = calls :+
              ((mm.group(1), cargs.map(rewriteStrMarkers(_, exprStr))))
            end = cend
          case None => chaining = false
        }
      }
      var isArr = false
      // `.dt` chains take their LAYER from the base marker's name: a
      // nested receiver opened `__GRAFTSTR_dte*`, base `__GRAFTSTR_dtb*`
      // (arrow vs numpy dtype splits — microsecond, strftime %S/%f,
      // base is_* NaT->False)
      val dtNestedLayer = m0.startsWith("dte")
      for ((m, args) <- calls) {
        val (r, arr) =
          if (m.startsWith("dtattr"))
            (dtAttrSql(m.stripPrefix("dtattr"), cur, dtNestedLayer,
              exprStr), false)
          else if (m.startsWith("dtchain"))
            renderStrMethod(
              "dt" + (if (dtNestedLayer) "e" else "b") +
                m.stripPrefix("dtchain"), cur, args, isArr, exprStr)
          else renderStrMethod(m, cur, args, isArr, exprStr)
        cur = r; isArr = arr
      }
      sql = sql.substring(0, i) + cur + sql.substring(end)
      i = indexOfOutsideQuotes(sql, MARK)
    }
    {
      val left = indexOfOutsideQuotes(sql, "__GRAFTSTRCHAIN_")
      if (left >= 0) {
        // name the accessor that was chained and what it was chained onto,
        // instead of a blanket '.str' message (ADVICE r10): a leftover
        // chain marker means the receiver was not a .str/.dt marker call —
        // e.g. a parenthesized receiver `(ts).dt.year`, which pandas
        // accepts but this rewriter resolves only on direct column paths.
        val rest = sql.substring(left + "__GRAFTSTRCHAIN_".length)
        val (acc, meth) =
          if (rest.startsWith("dtattr")) (".dt", rest.stripPrefix("dtattr"))
          else if (rest.startsWith("dtchain"))
            (".dt", rest.stripPrefix("dtchain"))
          else (".str", rest)
        val methName = meth.takeWhile(ch => ch.isLetterOrDigit || ch == '_')
        val recv = sql.substring(0, left).reverse
          .dropWhile(ch => ch == '.' || ch.isWhitespace)
          .takeWhile(!_.isWhitespace).reverse
        throw new IllegalArgumentException(
          s"chained $acc.$methName must directly follow a .str/.dt method " +
            s"call or a plain column path — receiver ending " +
            s"'${recv.takeRight(40)}' is neither (wrap the whole " +
            s"expression, not the receiver, in parentheses) in: $exprStr")
      }
    }
    sql
  }

  private def intLit(a: String): Option[Int] = {
    val t = a.trim
    if (t.matches("[+-]?\\d+")) Some(t.toInt) else None
  }

  private val kwargRe = """^([A-Za-z_]\w*)\s*=(?!=)\s*(.+)$""".r

  /** Literal single-quoted/double-quoted SQL string content, if `a` is one. */
  private def strLitContent(a: String): Option[String] = {
    val t = a.trim
    if (t.length >= 2 && (t.head == '\'' || t.head == '"') &&
        t.last == t.head) Some(t.substring(1, t.length - 1))
    else None
  }

  private val regexSpecials = "\\^$.|?*+()[]{}"

  /** Render one `.str.method(args)` over the SQL expression `x`.
    * `arrayInput` is true when x is the ARRAY result of a preceding
    * `.str.split` in the same chain (pandas Series.str works on lists of
    * strings too: len → list length, get → element).
    * Returns (sql, resultIsArray). Pandas parity notes inline; NULL inputs
    * propagate NULL through every composite (concat/repeat/substring are
    * all NULL-strict). */
  private def renderStrMethod(m: String, x: String, args: Seq[String],
      arrayInput: Boolean, exprStr: String): (String, Boolean) = {
    def req(n: Int): Unit = require(args.length == n,
      s".str.$m expects $n argument(s), got ${args.length} in: $exprStr")
    def fillArg(pos: Int, default: String = "' '"): String =
      if (args.length > pos) {
        strLitContent(args(pos)).foreach { c =>
          require(c.length == 1,
            s".str.$m fillchar must be exactly one character in: $exprStr")
        }
        args(pos)
      } else default
    // non-truncating pad amount (pandas rjust/ljust/zfill/pad never
    // truncate strings already >= width, unlike SQL lpad/rpad)
    def padN(w: String) = s"greatest(($w) - length($x), 0)"
    if (arrayInput && m != "get" && m != "len")
      throw new IllegalArgumentException(
        s".str.$m after .str.split is not supported (supported on list " +
          s"results: get, len) in: $exprStr")
    m match {
      // ---- `.dt` methods routed through the marker machinery ----
      // date_trunc returns a session-zoned timestamp even for NTZ input;
      // cast back to NTZ — pandas naive datetime64 is zone-free, and the
      // engine pins spark.sql.session.timeZone=UTC so the NTZ->LTZ->NTZ
      // round-trip is wall-clock-exact
      case "dtbnormalize" | "dtenormalize" =>
        require(args.isEmpty,
          s".dt.normalize expects no arguments in: $exprStr")
        (s"cast(date_trunc('DAY', $x) as timestamp_ntz)", false)
      case "dtbstrftime" | "dtestrftime" =>
        require(args.length == 1,
          s".dt.strftime expects 1 argument in: $exprStr")
        val fmt = strLitContent(args.head).getOrElse(
          throw new IllegalArgumentException(
            s".dt.strftime expects a string-literal format in: $exprStr"))
        val pat = strftimeToJava(fmt, exprStr, arrow = m == "dtestrftime")
        (s"date_format($x, '${pat.replace("'", "''")}')", false)
      // floor/ceil/round: epoch-anchored multiples of a FIXED freq, pandas
      // semantics (multiples like '15min' accepted). Round ties are
      // LAYER-SPLIT (r10 alt-seed fuzz + probe): numpy base rounds
      // HALF-TO-EVEN against the multiple index (00:30.round('h') → 00:00
      // but 01:30 → 02:00), the arrow element layer rounds HALF-UP
      // (both → next hour). Integer micros arithmetic — exact for all
      // units, pre-epoch (negative micros) included via pmod's
      // non-negative remainder; the tie test compares 2·rem vs the unit
      // so odd-µs multiples can't fake a tie. NULL propagates through
      // unix_micros.
      case "dtbfloor" | "dtefloor" | "dtbceil" | "dteceil" |
           "dtbround" | "dteround" =>
        val meth = m.drop(3)
        require(args.length == 1,
          s".dt.$meth expects 1 argument in: $exprStr")
        val freq = strLitContent(args.head).getOrElse(
          throw new IllegalArgumentException(
            s".dt.$meth expects a string-literal freq in: $exprStr"))
        val u = freqMicros(freq, meth, exprStr)
        val mi = s"unix_micros(cast($x as timestamp))"
        val fl = s"($mi - pmod($mi, ${u}L))"
        val micros = meth match {
          case "floor" => fl
          case "ceil"  => s"($mi + pmod(-$mi, ${u}L))"
          case _ if m.startsWith("dte") => // arrow round: half-UP
            s"(case when 2 * pmod($mi, ${u}L) >= ${u}L then $fl + ${u}L " +
              s"else $fl end)"
          case _ => // numpy round: half-to-even multiple
            s"(case when 2 * pmod($mi, ${u}L) < ${u}L then $fl " +
              s"when 2 * pmod($mi, ${u}L) > ${u}L then $fl + ${u}L " +
              s"else $fl + pmod($fl div ${u}L, 2L) * ${u}L end)"
        }
        (s"cast(timestamp_micros($micros) as timestamp_ntz)", false)
      // day_name/month_name: date_format's root locale is English, the
      // pandas locale=None default; an explicit locale argument raises
      // (JVM locale tables diverge from glibc's — no silent mismatch)
      case "dtbday_name" | "dteday_name" |
           "dtbmonth_name" | "dtemonth_name" =>
        val meth = m.drop(3)
        require(args.isEmpty,
          s".dt.$meth: the locale argument is not supported in: $exprStr")
        val pat = if (meth == "day_name") "EEEE" else "MMMM"
        (s"date_format($x, '$pat')", false)
      // as_unit: precision TRUNCATION (probe: .1239 as_unit('ms') → .123,
      // not rounded); Spark storage stays µs either way, so 'us'/'ns' are
      // identity and 'ms'/'s' zero the sub-unit digits
      case "dtbas_unit" | "dteas_unit" =>
        require(args.length == 1,
          s".dt.as_unit expects 1 argument in: $exprStr")
        val unit = strLitContent(args.head).getOrElse(
          throw new IllegalArgumentException(
            s".dt.as_unit expects a string-literal unit in: $exprStr"))
        unit match {
          case "ns" | "us" => (s"($x)", false)
          case "ms" | "s" =>
            val u = if (unit == "ms") 1000L else 1000000L
            val mi = s"unix_micros(cast($x as timestamp))"
            (s"cast(timestamp_micros($mi - pmod($mi, ${u}L)) " +
              s"as timestamp_ntz)", false)
          case other => throw new IllegalArgumentException(
            s".dt.as_unit: unsupported unit '$other' " +
              s"(supported: s, ms, us, ns) in: $exprStr")
        }
      case _ if strSimple.contains(m) =>
        val fn = strSimple(m)
        val nArgs = m match {
          case "startswith" | "endswith" | "contains" => 1
          case "replace" => 2
          case _ => 0
        }
        req(nArgs)
        (s"$fn(${(x +: args).mkString(", ")})", false)
      case _ if strPredicates.contains(m) =>
        req(0); (s"(${strPredicates(m)(x)})", false)
      // python str.title: a letter FOLLOWING A NON-LETTER is uppercased,
      // any other letter lowercased — words break on every non-letter
      // ('1a2b3' → '1A2B3', 'x,y' → 'X,Y'), unlike initcap, which only
      // breaks on whitespace and was the r9 differential fuzzer's first
      // .str divergence. The outer transform(array(...)) is the
      // let-binding idiom: the char split is computed once.
      case "title" =>
        req(0)
        val isL = (c: String) => s"regexp_like($c, '^\\\\p{L}$$')"
        (s"element_at(transform(array(split($x, '')), __tt -> " +
          s"array_join(transform(__tt, (__tc, __ti) -> " +
          s"case when ${isL("__tc")} then " +
          s"case when __ti = 0 or not ${isL("element_at(__tt, __ti)")} " +
          s"then upper(__tc) else lower(__tc) end " +
          s"else __tc end), '')), 1)", false)
      // pandas capitalize: first char upper, REST lower (initcap would
      // touch every word)
      case "capitalize" =>
        req(0)
        (s"concat(upper(substring($x, 1, 1)), lower(substring($x, 2)))",
          false)
      case "len" =>
        req(0); (if (arrayInput) s"size($x)" else s"length($x)", false)
      case "rjust" | "ljust" =>
        require(args.nonEmpty && args.length <= 2,
          s".str.$m expects width[, fillchar] in: $exprStr")
        val w = args(0); val f = fillArg(1)
        val pad = s"repeat($f, ${padN(w)})"
        (if (m == "rjust") s"concat($pad, $x)" else s"concat($x, $pad)",
          false)
      case "zfill" =>
        // python str.zfill: '0'-pad on the left, but a leading +/- sign
        // stays in front of the padding ('-1'.zfill(3) == '-01')
        req(1)
        val w = args(0)
        val z = s"repeat('0', ${padN(w)})"
        ((s"(case when substring($x, 1, 1) in ('+', '-') then " +
          s"concat(substring($x, 1, 1), $z, substring($x, 2)) " +
          s"else concat($z, $x) end)"), false)
      case "pad" | "center" =>
        // pandas pad(width, side='left', fillchar=' '); center ≡ side='both'
        require(args.nonEmpty,
          s".str.$m expects width[, side][, fillchar] in: $exprStr")
        var width: Option[String] = None
        var side: String = if (m == "center") "both" else "left"
        var fill: String = "' '"
        var pos = 0
        args.foreach { a =>
          kwargRe.findFirstMatchIn(a) match {
            case Some(mm) => mm.group(1) match {
              case "width" => width = Some(mm.group(2))
              case "side" if m == "pad" =>
                side = strLitContent(mm.group(2)).getOrElse(
                  throw new IllegalArgumentException(
                    s".str.pad side must be a string literal in: $exprStr"))
              case "fillchar" => fill = mm.group(2)
              case other => throw new IllegalArgumentException(
                s".str.$m got unexpected keyword '$other' in: $exprStr")
            }
            case None =>
              (pos, m) match {
                case (0, _) => width = Some(a)
                case (1, "pad") => side = strLitContent(a).getOrElse(
                  throw new IllegalArgumentException(
                    s".str.pad side must be a string literal in: $exprStr"))
                case (1, "center") => fill = a
                case (2, "pad") => fill = a
                case _ => throw new IllegalArgumentException(
                  s".str.$m: too many arguments in: $exprStr")
              }
              pos += 1
          }
        }
        strLitContent(fill).foreach { c =>
          require(c.length == 1,
            s".str.$m fillchar must be exactly one character in: $exprStr")
        }
        val w = width.getOrElse(throw new IllegalArgumentException(
          s".str.$m requires width in: $exprStr"))
        val d = padN(w)
        side match {
          case "left"  => (s"concat(repeat($fill, $d), $x)", false)
          case "right" => (s"concat($x, repeat($fill, $d))", false)
          case "both" =>
            // python str.center: left = marg//2 + (marg & width & 1) —
            // the extra fill char goes LEFT only when both the margin
            // and the requested width are odd (CPython's parity quirk)
            val l = s"((($d) div 2) + ((($d) % 2) * (($w) % 2)))"
            (s"concat(repeat($fill, $l), $x, " +
              s"repeat($fill, ($d) - $l))", false)
          case other => throw new IllegalArgumentException(
            s".str.pad side must be left/right/both, got '$other' in: " +
              exprStr)
        }
      case "count" =>
        // pandas str.count: pat is a REGEX, non-overlapping matches
        req(1)
        (s"size(regexp_extract_all($x, ${args(0)}, 0))", false)
      case "removeprefix" | "removesuffix" =>
        // python 3.9 semantics: strip AT MOST ONE occurrence, only at
        // the boundary; unchanged when absent
        req(1)
        val p = args(0)
        if (m == "removeprefix")
          ((s"(case when startswith($x, $p) then " +
            s"substring($x, length($p) + 1) else $x end)"), false)
        else
          ((s"(case when endswith($x, $p) then " +
            s"substring($x, 1, length($x) - length($p)) else $x end)"),
            false)
      case "repeat" =>
        req(1)
        (s"repeat($x, ${args(0)})", false)
      case "swapcase" =>
        // per-char case flip: non-cased chars satisfy c = lower(c) and
        // upper(c) = c, so they pass through unchanged
        req(0)
        ((s"array_join(transform(filter(split($x, ''), __c -> " +
          s"__c <> ''), __c -> case when __c = lower(__c) " +
          s"then upper(__c) else lower(__c) end), '')"), false)
      case "extract" =>
        // pandas extract(pat, expand=False) with ONE group: first-match
        // group value, NaN (NULL) when the pattern does not match
        // anywhere (rlike is an unanchored search, like re.search)
        req(1)
        ((s"(case when $x rlike ${args(0)} then " +
          s"regexp_extract($x, ${args(0)}, 1) else null end)"), false)
      case "find" =>
        // lowest index of LITERAL sub, -1 if absent (instr is 1-based,
        // 0 when absent); start/end args unsupported → raise via req
        req(1)
        (s"(instr($x, ${args(0)}) - 1)", false)
      case "get" =>
        req(1)
        val i = intLit(args(0)).getOrElse(
          throw new IllegalArgumentException(
            s".str.get expects a literal int index in: $exprStr"))
        if (arrayInput) {
          // spark get() is 0-based and NULL (like pandas NaN) out of
          // bounds or for a still-negative normalized index
          val idx = if (i >= 0) i.toString else s"size($x) + ($i)"
          (s"get($x, $idx)", false)
        } else if (i >= 0)
          // substring past the end yields '' → NULL, matching pandas NaN
          (s"nullif(substring($x, ${i + 1}, 1), '')", false)
        else
          ((s"(case when length($x) + ($i) < 0 then null " +
            s"else nullif(substring($x, length($x) + ($i) + 1, 1), '') " +
            s"end)"), false)
      case "slice" =>
        // python s[start:stop:step] with literal-int bounds; bounds
        // normalized python-style against len. Positive steps render as a
        // char-gather over sequence() (r10 — the reference accepts step;
        // negative steps stay a documented raise).
        require(args.length <= 3,
          s".str.slice expects start[, stop[, step]] in: $exprStr")
        var start: Option[Int] = None; var stop: Option[Int] = None
        var step = 1
        var pos = 0
        args.foreach { a =>
          def asInt(v: String, what: String): Int = intLit(v).getOrElse(
            throw new IllegalArgumentException(
              s".str.slice $what must be a literal int in: $exprStr"))
          def setStep(v: String): Unit = {
            step = asInt(v, "step")
            require(step >= 1,
              s".str.slice step must be a positive int (negative/zero " +
                s"steps are not supported) in: $exprStr")
          }
          kwargRe.findFirstMatchIn(a) match {
            case Some(mm) => mm.group(1) match {
              case "start" => start = Some(asInt(mm.group(2), "start"))
              case "stop"  => stop = Some(asInt(mm.group(2), "stop"))
              case "step"  => setStep(mm.group(2))
              case other => throw new IllegalArgumentException(
                s".str.slice got unexpected keyword '$other' in: $exprStr")
            }
            case None =>
              pos match {
                case 0 => start = Some(asInt(a, "start"))
                case 1 => stop = Some(asInt(a, "stop"))
                case 2 => setStep(a)
                case _ => ()
              }
              pos += 1
          }
        }
        def norm(i: Int): String =
          if (i >= 0) s"least($i, length($x))"
          else s"greatest(length($x) + ($i), 0)"
        val s0 = start.map(norm).getOrElse("0")
        val s1 = stop.map(norm).getOrElse(s"length($x)")
        if (step == 1)
          (s"substring($x, ($s0) + 1, greatest(($s1) - ($s0), 0))", false)
        else
          // every step-th char of s[s0:s1]; empty range → '' (matches
          // pandas); NULL input needs an explicit guard (array_join over
          // the NULL sequence renders '' rather than NULL)
          ((s"(case when $x is null then null " +
            s"when ($s1) - ($s0) <= 0 then '' " +
            s"else array_join(transform(" +
            s"sequence($s0, ($s1) - 1, $step), " +
            s"__si -> substring($x, __si + 1, 1)), '') end)"), false)
      case "split" =>
        // pandas str.split: no pat → python whitespace split (unicode ws,
        // empties dropped); 1-char pat → literal; longer pat → regex
        // (the pandas regex=None rule)
        require(args.length <= 1,
          s".str.split supports at most a pat argument in: $exprStr")
        if (args.isEmpty)
          (s"filter(split($x, '(?U)\\\\s+'), __sp -> __sp <> '')", true)
        else strLitContent(args(0)) match {
          case Some(c) if c.length == 1 =>
            val esc =
              if (regexSpecials.contains(c.head)) "\\\\" + c else c
            (s"split($x, '$esc')", true)
          case Some(_) => (s"split($x, ${args(0)})", true)
          case None => throw new IllegalArgumentException(
            s".str.split pat must be a string literal in: $exprStr")
        }
      // pandas rsplit with no maxsplit IS split (reference-executed r9
      // probe); a maxsplit argument would differ and raises loudly
      case "rsplit" =>
        require(args.length <= 1,
          s".str.rsplit with maxsplit is not supported (rsplit without " +
            s"maxsplit equals split; right-counted maxsplit has no Spark " +
            s"analog) in: $exprStr")
        renderStrMethod("split", x, args, arrayInput, exprStr)
      // re.findall: all non-overlapping FULL matches. Python returns
      // group CONTENTS when the pattern has capturing groups — that
      // form would silently diverge, so it raises (use (?:...)).
      case "findall" =>
        req(1)
        strLitContent(args(0)).foreach { pat =>
          // capture-group detection must count BACKSLASH-RUN PARITY: an
          // even run before '(' leaves it a metacharacter ('\\\\(' is an
          // escaped backslash THEN a group), an odd run escapes it
          val hasCapture =
            """(?<!\\)(?:\\\\)*\((?!\?)""".r.findFirstIn(pat).isDefined
          require(!hasCapture,
            s".str.findall with a CAPTURING group returns group contents " +
              s"in pandas but full matches here — use a non-capturing " +
              s"(?:...) group in: $exprStr")
        }
        (s"regexp_extract_all($x, ${args(0)}, 0)", true)
      // re.match / re.fullmatch: anchored at start / fully anchored.
      // concat of literals folds, so the pattern stays a constant.
      case "match" =>
        req(1)
        (s"regexp_like($x, concat('^(?:', ${args(0)}, ')'))", false)
      case "fullmatch" =>
        req(1)
        (s"regexp_like($x, concat('^(?:', ${args(0)}, ')$$'))", false)
      // pandas slice_replace(start, stop, repl) = x[:start] + repl + x[stop:]
      case "slice_replace" =>
        req(3)
        Seq(0, 1).foreach { p =>
          intLit(args(p)).foreach(v => require(v >= 0,
            s".str.slice_replace supports non-negative bounds in: $exprStr"))
        }
        // pandas clamps stop to at least start (slice_replace(2, 1, r)
        // INSERTS at 2, it does not duplicate s[1:2] — r10 alt-seed fuzz)
        (s"concat(substring($x, 1, ${args(0)}), ${args(2)}, " +
          s"substring($x, greatest(${args(0)}, ${args(1)}) + 1))", false)
      case other => strUnsupported(other, exprStr)
    }
  }

  private def analyze(df: DataFrame, exprStr: String,
                      lambdaVar: String): Analysis =
    analyze(df, exprStr, (_: String, f: String) => s"$lambdaVar.${bq(f)}")

  /** Two-level `query`. Base-layer expr → row filter; single-nest expr →
    * element filter keeping all rows. Mixing layers or nests → error, same as
    * the reference (core.py:1610-1614). */
  def query(df: DataFrame, exprStr: String): DataFrame = {
    val a = analyze(df, exprStr, "__x")
    val dfR = withReductions(df, a.reductions)
    if (a.nests.isEmpty) dfR.where(expr(a.sql)).drop(a.helperNames: _*)
    else {
      require(a.nests.size == 1,
        s"Query expression references multiple nests ${a.nests.mkString(", ")}; " +
          "only one nest per expression is supported")
      require(!a.usesBase,
        "Query expression mixes base columns and nested fields; " +
          "only one layer per expression is supported")
      val nest = a.nests.head
      // Emptied cells become NULL, not empty arrays: the reference repacks
      // the filtered flat rep and assigns by index, so rows whose every
      // element was dropped are MISSING from the packed series → pd.NA
      // (core.py:1638-1648 _set_filtered_flat_df). This is what makes the
      // `query(...)` → `dropna(subset=nest)` idiom drop them (the dropna
      // docstring's own example). The accessor-level element MASK nulls
      // emptied cells the same way (r9 executed probe — the r5 claim
      // that the accessor keeps empties was wrong;
      // [[NestedOps.filterElements]] now applies the same rule).
      // Gate on exists() rather than size(filter(...)) == 0: HOF lambdas
      // see no codegen CSE, so the when/otherwise pair would run the full
      // filter TWICE per row. exists short-circuits at the first hit, so
      // kept rows pay a partial scan + one filter, emptied rows one scan.
      val filtered = expr(s"filter(${bq(nest)}, __x -> ${a.sql})")
      val anyHit = expr(s"exists(${bq(nest)}, __x -> ${a.sql})")
      dfR.withColumn(nest, when(anyHit, filtered)).drop(a.helperNames: _*)
    }
  }

  /** Render the element-level RHS against an anchor nest: anchor fields come
    * from the lambda variable `__x`; fields of OTHER nests are read
    * positionally — `other[__i].f` — i.e. the reference's flat-index
    * alignment (element i of every RHS nest pairs with element i of the
    * anchor; core.py:284-340). Base columns stay outer row references
    * (broadcast per row). */
  private def analyzeAnchored(df: DataFrame, rhs: String,
                              anchor: String): Analysis =
    analyze(df, rhs, (n: String, f: String) =>
      if (n == anchor) s"__x.${bq(f)}" else s"${bq(n)}[__i].${bq(f)}")

  /** Element-aligned transform of `anchor` producing `named_struct($parts)`
    * per element, guarded so every OTHER referenced nest is element-aligned
    * with the anchor (same per-row length) — misalignment raises, as in the
    * reference. NULL anchor cells pass through as NULL. */
  private def alignedTransform(df: DataFrame, anchor: String,
                               others: Seq[String], parts: String)
      : org.apache.spark.sql.Column =
    alignedTransformRaw(df, anchor, others, s"named_struct($parts)")

  /** Like [[alignedTransform]] but with a raw per-element value body. */
  private def alignedTransformRaw(df: DataFrame, anchor: String,
                                  others: Seq[String], body: String)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{when, assert_true, lit, size => sz}
    val lambda = if (others.isEmpty) "__x ->" else "(__x, __i) ->"
    val transformed =
      expr(s"transform(${bq(anchor)}, $lambda $body)")
    if (others.isEmpty) transformed
    else {
      val aligned = others.map { o =>
        col(anchor).isNull || (sz(col(o)) === sz(col(anchor)))
      }.reduce(_ && _)
      // assert_true returns NULL when the condition holds and raises
      // otherwise — the `when` is always taken or the row errors out.
      when(assert_true(aligned,
        lit(s"eval: nests ${others.mkString(", ")} are not element-aligned " +
          s"with '$anchor'")).isNull, transformed)
    }
  }

  private def sq(s: String): String = s"'${s.replace("'", "\\'")}'"

  /** `eval` assignment dialect: `"target = rhs"`.
    *  - `nest.f = <expr>` → add/replace field f inside each element; the RHS
    *    may mix the target nest, OTHER nests (element-aligned on the flat
    *    index, like the reference), and base columns (broadcast per row)
    *    (core.py:284-340; test_nestedframe.py:2481-2530).
    *  - `newnest.f = <expr over ≥1 nests (+ base)>` → create a new nest
    *    element-aligned with the first referenced nest.
    *  - `name = <expr over base cols>` → plain withColumn; a nested-layer RHS
    *    is rejected (it would put element values "between" row labels).
    * One nesting level only: `nest.f.inner = ...` raises. */
  /** `lhs = rhs` splitter. The `=` must be a bare assignment operator:
    * the lookbehind keeps a comparison-only line like `a == b` from
    * matching on its SECOND `=` (lazy lhs swallows the first) and being
    * silently executed as `a = b` — it raises "Not an assignment"
    * instead, like pandas multiline eval does (r9 session-4 review).
    * Arithmetic/bitwise chars in the lookbehind reject AUGMENTED
    * assignment the same way (`a += 1` would otherwise silently run as
    * `a = 1`; the reference raises NotImplementedError 'AugAssign',
    * executed 2026-08-15); ':' rejects the walrus `a := b` (python ast
    * SyntaxError at statement level). */
  private val assignRe =
    """(?s)^\s*(.*?)\s*(?<![=!<>+\-*/%&|^~@:])=(?!=)\s*(.*)$""".r

  /** `keepHelpers`: reduction helper columns [[eval]] pre-attached whose
    * source column no line BEFORE this one writes — left in place so a
    * later line using the same reduction reuses the one agg instead of
    * re-attaching (eval's final sweep removes them); the moment a line
    * writes a helper's source column, eval's fold drops the helper,
    * which is what forces the post-write re-aggregation to see the new
    * values. */
  def evalAssign(df: DataFrame, stmt: String,
                 keepHelpers: Set[String] = Set.empty): DataFrame = {
    def dropHelpers(d: DataFrame, names: Seq[String]): DataFrame =
      d.drop(names.filterNot(keepHelpers): _*)
    stmt match {
      case assignRe(lhs, rhs) =>
        val lhsToks = tokenize(lhs)
        // the LHS must be EXACTLY one (possibly dotted/backticked)
        // identifier: subscript (`a[0] = 5`), tuple (`a, b = t`), starred
        // and annotated targets would otherwise silently collapse onto
        // the first identifier — pandas eval raises for all of them
        val idents = lhsToks.collect { case Ident(p) => p }
        val junk = lhsToks.exists {
          case Text(t) => t.trim.nonEmpty; case _ => false
        }
        if (idents.length != 1 || junk)
          throw new IllegalArgumentException(
            s"Bad assignment target: $lhs (must be a single column name)")
        val target = idents.head
        target match {
          case Seq(nest, field) if NestedOps.nestedColumns(df).contains(nest) =>
            // Existing nest: anchor the RHS on the TARGET nest.
            val a = analyzeAnchored(df, rhs, nest)
            val others = a.nests.filterNot(_ == nest)
            val existing = NestedOps.subColumns(df, nest)
            val fields = if (existing.contains(field)) existing
                         else existing :+ field
            val parts = fields.map { f =>
              val v = if (f == field) a.sql else s"__x.${bq(f)}"
              s"${sq(f)}, $v"
            }.mkString(", ")
            val dfR = withReductions(df, a.reductions)
            dropHelpers(
              dfR.withColumn(nest, alignedTransform(dfR, nest, others, parts)),
              a.helperNames)
          // New-nest creation (reference test_nestedframe.py:2448-2540):
          // `newnest.f = <expr>` builds newnest element-aligned with the
          // first nest the RHS references.
          case Seq(newNest, field) =>
            val a = analyzeAnchored(df, rhs,
              analyze(df, rhs, "__x").nests.headOption.getOrElse(""))
            require(a.nests.nonEmpty,
              s"Assignment to new nest '$newNest.$field' needs ≥1 nested " +
                s"reference on the RHS (got a base-only expression)")
            val anchor = a.nests.head
            val dfR = withReductions(df, a.reductions)
            dropHelpers(
              dfR.withColumn(newNest, alignedTransform(dfR, anchor,
                a.nests.tail, s"${sq(field)}, ${a.sql}")),
              a.helperNames)
          case Seq(name) =>
            val a = analyze(df, rhs, "__x")
            require(a.nests.isEmpty,
              s"Assignment of nested-layer expression to base column '$name'")
            dropHelpers(
              withReductions(df, a.reductions)
                .withColumn(name, expr(a.sql)),
              a.helperNames)
          case other => throw new IllegalArgumentException(
            s"Bad assignment target: ${other.mkString(".")} " +
              "(only one nesting level is supported)")
        }
      case _ => throw new IllegalArgumentException(s"Not an assignment: $stmt")
    }
  }

  /** Substitute pandas-style `@name` local-variable references with SQL
    * literals (strings quoted/escaped, numbers verbatim) — the reference's
    * `eval(..., local_dict)` environment resolution. */
  private def substituteLocals(exprStr: String,
                               locals: Map[String, Any]): String =
    if (locals.isEmpty) exprStr
    else """@([A-Za-z_][A-Za-z0-9_]*)""".r.replaceAllIn(exprStr, m => {
      val name = m.group(1)
      val v = locals.getOrElse(name, throw new IllegalArgumentException(
        s"Undefined local '@$name' in: $exprStr " +
          s"(locals: ${locals.keys.mkString(", ")})"))
      val sql = v match {
        case s: String => "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
        case b: Boolean => b.toString
        case n: Number => n.toString
        case other => throw new IllegalArgumentException(
          s"Unsupported local type for '@$name': ${other.getClass}")
      }
      scala.util.matching.Regex.quoteReplacement(sql)
    })

  /** Multi-statement eval: one assignment per non-empty line, executed in
    * order — line N sees every column line N−1 created OR modified, on
    * both layers (the reference's `inplace=True` multiline contract, the
    * one its GH#159 test pins, test_nestedframe.py:2512-2530; the
    * reference's `inplace=False` DEFAULT freezes the nested layer
    * per-line — created fields raise on later lines, modified fields
    * evaluate against pre-eval values — a pandas-env artifact we do not
    * mirror, PARITY.md r9 session 4). `locals` resolves pandas-style
    * `@name` references to literals.
    *
    * Global reductions are BATCHED ACROSS LINES: each line's own
    * withReductions would replay the frame's upstream plan in a separate
    * broadcast agg, so a pre-pass analyzes every RHS against the ORIGINAL
    * schema and attaches, in one agg per layer, every reduction whose
    * source column no earlier line writes. Safe because eval lines only
    * ADD columns (the row multiset never changes), so a reduction over an
    * unwritten column has the same value at line 1 as at line N. A
    * reduction over a column an earlier line creates or modifies is NOT
    * hoisted — that line's evalAssign attaches it as before (the
    * content-hashed helper names make both passes agree). */
  def eval(df: DataFrame, program: String,
           locals: Map[String, Any] = Map.empty): DataFrame = {
    val stmts = program.split('\n').map(_.trim)
      .filter(s => s.nonEmpty && !s.startsWith("#"))
      .map(substituteLocals(_, locals)).toSeq
    var written = Set.empty[String]
    val hoisted = Seq.newBuilder[Reduction]
    for (stmt <- stmts) stmt match {
      case assignRe(lhs, rhs) =>
        // a line referencing columns created by EARLIER lines may fail
        // analysis against the original schema — skip hoisting for it
        scala.util.Try(analyze(df, rhs, "__x")).toOption.foreach { a =>
          hoisted ++= a.reductions.filterNot(r => written.contains(r.srcCol))
        }
        tokenize(lhs).collectFirst { case Ident(p) => p.head }
          .foreach(written += _)
      case _ => ()
    }
    // keep is computed PER LINE against only the writes that PRECEDE it
    // (ADVICE r10): two early lines sharing a reduction over a column only
    // a later line writes reuse one agg. A helper becomes invalid the
    // moment its source column is written — the fold drops it right then
    // (whether or not the writing line consumed it), so any later use
    // re-aggregates and sees the written values
    val reds = hoisted.result().distinct
    def writesOf(stmt: String): Set[String] = stmt match {
      case assignRe(lhs, _) =>
        tokenize(lhs).collectFirst { case Ident(p) => p.head }.toSet
      case _ => Set.empty
    }
    var writtenSoFar = Set.empty[String]
    val out = stmts.foldLeft(withReductions(df, reds)) { (acc, stmt) =>
      val keepNow = reds.filterNot(r => writtenSoFar.contains(r.srcCol))
        .map(_.name).toSet
      val res = evalAssign(acc, stmt, keepHelpers = keepNow)
      val wr = writesOf(stmt)
      writtenSoFar ++= wr
      val invalid = reds.filter(r => wr.contains(r.srcCol)).map(_.name)
        .filter(res.columns.contains)
      if (invalid.isEmpty) res else res.drop(invalid.toIndexedSeq: _*)
    }
    // hoisted helpers a line's own analysis didn't resolve to (or that no
    // line consumed) are engine-internal — drop any leftovers
    val leftovers = out.columns.filter(_.startsWith("__graft_red_"))
    if (leftovers.isEmpty) out else out.drop(leftovers.toIndexedSeq: _*)
  }

  /** query with `@name` locals (see [[eval]]). */
  def query(df: DataFrame, exprStr: String,
            locals: Map[String, Any]): DataFrame =
    query(df, substituteLocals(exprStr, locals))

  /** Non-assignment eval (the reference's `nf.eval("a + packed.c.median()")`
    * Series-returning form, test_nestedframe.py:2440-2446):
    *  - base-layer expression (reductions like `nest.f.mean()` count as
    *    base-layer) → new row-level column `outName`;
    *  - element-layer expression → ARRAY column `outName` aligned with the
    *    first referenced nest (the flat-index Series of the reference);
    *    mixed nests must be element-aligned, misalignment raises. */
  def evalSelect(df: DataFrame, exprStr: String,
                 outName: String = "result"): DataFrame = {
    val probe = analyze(df, exprStr, "__x")
    if (probe.nests.isEmpty)
      withReductions(df, probe.reductions)
        .withColumn(outName, expr(probe.sql))
        .drop(probe.helperNames: _*)
    else {
      val anchor = probe.nests.head
      val a = analyzeAnchored(df, exprStr, anchor)
      val dfR = withReductions(df, a.reductions)
      dfR.withColumn(outName,
        alignedTransformRaw(dfR, anchor, a.nests.filterNot(_ == anchor), a.sql))
        .drop(a.helperNames: _*)
    }
  }
}

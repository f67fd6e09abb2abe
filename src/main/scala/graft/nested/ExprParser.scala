package graft.nested

/** Lexer + recursive-descent parser for the reference's pandas-eval
  * query/eval dialect (reference: src/nested_pandas/nestedframe/expr.py
  * rides pandas' PandasExprVisitor, i.e. a Python expression grammar with
  * a small SQL-ish passthrough surface).
  *
  * This replaces the r1-r10 string-rewriting pipeline (atom-buffer
  * surgery + `__GRAFT*` marker splicing): the expression is parsed ONCE
  * into a small AST, [[NestedExpr]] classifies and renders it directly to
  * Spark SQL — no marker strings ever exist in intermediate state.
  *
  * Grammar (Python operator precedence; SQL passthrough forms noted):
  * {{{
  *   expr     := orE
  *   orE      := andE (("or"|"|"|"||") andE)*
  *   andE     := notE (("and"|"&"|"&&") notE)*
  *   notE     := ("not"|"~"|"!") notE | cmpE
  *   cmpE     := addE ( (cmpop addE)+                     -- chains fold
  *                    | "not"? "in" inList
  *                    | "is" "not"? "null"                -- SQL passthrough
  *                    | "not"? ("like"|"rlike") addE      -- SQL passthrough
  *                    | "not"? "between" addE "and" addE )?
  *   addE     := mulE (("+"|"-") mulE)*
  *   mulE     := unary (("*"|"/"|"%"|"//") unary)*
  *   unary    := ("+"|"-") unary | powE     -- python: -3 ** 2 == -(3**2)
  *   powE     := postfix ("**" unary)?      -- right-associative
  *   postfix  := primary trailer*
  *   trailer  := "." namePath callArgs? | "[" expr "]"
  *   primary  := NUM | STR | caseE | "(" expr ")" | pathCall
  *   pathCall := namePath callArgs?         -- cast(x as t) special-cased
  *   namePath := NAME ("." NAME)*
  * }}}
  */
private[nested] object ExprAst {
  sealed trait Ast

  /** Numeric literal, raw text (doubleization happens at render). */
  final case class Num(text: String) extends Ast
  /** Quoted string literal, verbatim including quotes. */
  final case class StrLit(text: String) extends Ast
  /** Python `None`. */
  case object NoneLit extends Ast
  /** SQL keyword operand passthrough (true/false/null …), verbatim. */
  final case class Word(text: String) extends Ast

  /** One post-call chain step: `.names(args)` (args None = attribute) or
    * a subscript `[index]` (names empty, index set). */
  final case class Trailer(names: List[String], args: Option[List[Ast]],
                           index: Option[Ast] = None)

  /** Dotted path, optionally called, with post-call trailers:
    * `nested.t`, `abs(x)`, `n.s.str.split(',').str.get(0)`. */
  final case class PathCall(names: List[String], args: Option[List[Ast]],
                            trailers: List[Trailer]) extends Ast
  /** Parenthesized expression, with optional accessor trailers —
    * `(ts).dt.year` is legal pandas. */
  final case class Paren(inner: Ast, trailers: List[Trailer]) extends Ast

  final case class Un(op: String, e: Ast) extends Ast
  final case class Bin(op: String, l: Ast, r: Ast) extends Ast
  /** Comparison, possibly chained: `a < b <= c` keeps all operands. */
  final case class Cmp(first: Ast, rest: List[(String, Ast)]) extends Ast
  final case class InList(e: Ast, items: List[Ast],
                          negated: Boolean) extends Ast
  final case class IsNull(e: Ast, negated: Boolean) extends Ast
  final case class Between(e: Ast, lo: Ast, hi: Ast,
                           negated: Boolean) extends Ast
  final case class LikeOp(op: String, l: Ast, r: Ast,
                          negated: Boolean) extends Ast
  final case class CaseWhen(branches: List[(Ast, Ast)],
                            orElse: Option[Ast]) extends Ast
  final case class CastE(e: Ast, typ: String) extends Ast
  /** Keyword argument inside a method/function call: `side='left'`. */
  final case class KwArg(name: String, value: Ast) extends Ast
  /** `distinct` prefix on a call's first argument: count(distinct x). */
  final case class DistinctArg(e: Ast) extends Ast
}

private[nested] object ExprLexer {
  sealed trait Lx
  /** `backticked`: quoted names are never keywords. */
  final case class LName(name: String, backticked: Boolean) extends Lx
  final case class LNum(text: String) extends Lx
  final case class LStr(text: String) extends Lx
  final case class LOp(op: String) extends Lx
  case object LEof extends Lx

  private def isIdentStart(c: Char) = c.isLetter || c == '_'
  private def isIdentChar(c: Char) = c.isLetterOrDigit || c == '_'

  private val twoCharOps =
    Seq("**", "//", "<=", ">=", "==", "!=", "&&", "||")

  def lex(s: String): Vector[Lx] = {
    val out = Vector.newBuilder[Lx]
    var i = 0
    var prevOperand = false // last token can END an operand (name/num/str/)/])
    while (i < s.length) {
      val c = s(i)
      if (c.isWhitespace) i += 1
      else if (c == '\'' || c == '"') {
        val quote = c; val start = i; i += 1
        // honor backslash escapes (\' \\ …) like the SQL parser will
        while (i < s.length && s(i) != quote) {
          if (s(i) == '\\' && i + 1 < s.length) i += 2 else i += 1
        }
        require(i < s.length, s"Unclosed quote in expression: $s")
        i += 1
        out += LStr(s.substring(start, i)); prevOperand = true
      } else if (c == '`') {
        val end = s.indexOf('`', i + 1)
        require(end > 0, s"Unclosed backtick in expression: $s")
        out += LName(s.substring(i + 1, end), backticked = true)
        i = end + 1; prevOperand = true
      } else if (c.isDigit || (c == '.' && !prevOperand &&
                 i + 1 < s.length && s(i + 1).isDigit)) {
        // NUMBER: digits [. digits?] [eE [+-] digits] | . digits [exp]
        val start = i
        while (i < s.length && s(i).isDigit) i += 1
        if (i < s.length && s(i) == '.') {
          i += 1
          while (i < s.length && s(i).isDigit) i += 1
        }
        if (i < s.length && (s(i) == 'e' || s(i) == 'E')) {
          var j = i + 1
          if (j < s.length && (s(j) == '+' || s(j) == '-')) j += 1
          if (j < s.length && s(j).isDigit) {
            while (j < s.length && s(j).isDigit) j += 1
            i = j
          }
        }
        out += LNum(s.substring(start, i)); prevOperand = true
      } else if (isIdentStart(c)) {
        val start = i
        while (i < s.length && isIdentChar(s(i))) i += 1
        out += LName(s.substring(start, i), backticked = false)
        prevOperand = true
      } else {
        val two = if (i + 1 < s.length) s.substring(i, i + 2) else ""
        if (twoCharOps.contains(two)) {
          out += LOp(two); i += 2; prevOperand = false
        } else {
          out += LOp(c.toString); i += 1
          prevOperand = c == ')' || c == ']'
        }
      }
    }
    out += LEof
    out.result()
  }
}

private[nested] object ExprParser {
  import ExprLexer._

  /** Parse `s` as EXACTLY one dotted (possibly backticked) name path —
    * the only legal eval-assignment target. None for anything else
    * (subscript, tuple, starred, annotated, operators, trailing junk). */
  def lhsPath(s: String): Option[List[String]] = {
    val toks =
      try ExprLexer.lex(s)
      catch { case _: IllegalArgumentException => return None }
    val parts = List.newBuilder[String]
    var i = 0
    toks(i) match {
      case LName(n, _) => parts += n; i += 1
      case _           => return None
    }
    while (toks(i) == LOp(".")) {
      toks(i + 1) match {
        case LName(n, _) => parts += n; i += 2
        case _           => return None
      }
    }
    if (toks(i) == LEof) Some(parts.result()) else None
  }
}

private[nested] final class ExprParser(exprStr: String) {
  import ExprAst._
  import ExprLexer._

  private val toks: Vector[Lx] = ExprLexer.lex(exprStr)
  private var pos = 0

  private def peek: Lx = toks(pos)
  private def peek2: Lx = if (pos + 1 < toks.length) toks(pos + 1) else LEof
  private def next(): Lx = { val t = toks(pos); pos += 1; t }
  private def fail(what: String): Nothing =
    throw new IllegalArgumentException(s"$what in: $exprStr")
  private def expectOp(op: String): Unit = peek match {
    case LOp(`op`) => pos += 1
    case other => fail(s"expected '$op', found '$other'")
  }
  /** Bare (non-backticked) name equal to kw, case-insensitively. */
  private def isKw(t: Lx, kw: String): Boolean = t match {
    case LName(n, false) => n.equalsIgnoreCase(kw)
    case _               => false
  }
  private def eatKw(kw: String): Boolean =
    if (isKw(peek, kw)) { pos += 1; true } else false

  def parse(): Ast = {
    val e = orE()
    peek match {
      case LEof => e
      case other => fail(s"unexpected trailing '${render(other)}'")
    }
  }
  private def render(t: Lx): String = t match {
    case LName(n, _) => n
    case LNum(n)     => n
    case LStr(v)     => v
    case LOp(o)      => o
    case LEof        => "<end>"
  }

  private def orE(): Ast = {
    var l = andE()
    while (isKw(peek, "or") || peek == LOp("|") || peek == LOp("||")) {
      next(); l = Bin("or", l, andE())
    }
    l
  }
  private def andE(): Ast = {
    var l = notE()
    while (isKw(peek, "and") || peek == LOp("&") || peek == LOp("&&")) {
      next(); l = Bin("and", l, notE())
    }
    l
  }
  private def notE(): Ast =
    if (isKw(peek, "not") || peek == LOp("~") || peek == LOp("!")) {
      next(); Un("not", notE())
    } else cmpE()

  private val cmpOps = Set("<", "<=", ">", ">=", "==", "!=", "=")

  private def cmpE(): Ast = {
    val first = addE()
    peek match {
      case LOp(op) if cmpOps.contains(op) && op != "=" =>
        val rest = List.newBuilder[(String, Ast)]
        while (peek match {
                 case LOp(o) if cmpOps.contains(o) && o != "=" => true
                 case _ => false
               }) {
          val LOp(o) = next(): @unchecked
          rest += ((o, addE()))
        }
        Cmp(first, rest.result())
      case _ if isKw(peek, "in") =>
        next(); InList(first, inItems(), negated = false)
      case _ if isKw(peek, "is") =>
        next()
        val neg = eatKw("not")
        if (!eatKw("null")) fail("`is` supports only [not] null")
        IsNull(first, neg)
      case _ if isKw(peek, "like") || isKw(peek, "rlike") =>
        val LName(op, _) = next(): @unchecked
        LikeOp(op.toLowerCase, first, addE(), negated = false)
      case _ if isKw(peek, "between") =>
        next()
        val lo = addE()
        if (!eatKw("and")) fail("`between` requires: between lo and hi")
        Between(first, lo, addE(), negated = false)
      case _ if isKw(peek, "not") &&
          (isKw(peek2, "in") || isKw(peek2, "like") || isKw(peek2, "rlike") ||
            isKw(peek2, "between")) =>
        next() // not
        if (eatKw("in")) InList(first, inItems(), negated = true)
        else if (eatKw("between")) {
          val lo = addE()
          if (!eatKw("and")) fail("`between` requires: between lo and hi")
          Between(first, lo, addE(), negated = true)
        } else {
          val LName(op, _) = next(): @unchecked
          LikeOp(op.toLowerCase, first, addE(), negated = true)
        }
      case _ => first
    }
  }

  private def inItems(): List[Ast] = peek match {
    case LOp("(") | LOp("[") =>
      val LOp(open) = next(): @unchecked
      val close = if (open == "(") ")" else "]"
      val items = List.newBuilder[Ast]
      if (peek != LOp(close)) {
        items += orE()
        while (peek == LOp(",")) { next(); items += orE() }
      }
      expectOp(close)
      items.result()
    case _ => fail(s"`in` without a value list")
  }

  private def addE(): Ast = {
    var l = mulE()
    while (peek == LOp("+") || peek == LOp("-")) {
      val LOp(o) = next(): @unchecked
      l = Bin(o, l, mulE())
    }
    l
  }
  private def mulE(): Ast = {
    var l = unary()
    while (peek == LOp("*") || peek == LOp("/") || peek == LOp("%") ||
           peek == LOp("//")) {
      val LOp(o) = next(): @unchecked
      l = Bin(o, l, unary())
    }
    l
  }
  private def unary(): Ast = peek match {
    case LOp("+") | LOp("-") =>
      val LOp(o) = next(): @unchecked
      Un(o, unary())
    case _ => powE()
  }
  private def powE(): Ast = {
    val base = postfix()
    if (peek == LOp("**")) { next(); Bin("**", base, unary()) }
    else base
  }

  private def postfix(): Ast = {
    val base = primary()
    val trailers = parseTrailers()
    (base, trailers) match {
      case (_, Nil)            => base
      case (p: PathCall, ts)   => p.copy(trailers = p.trailers ++ ts)
      case (Paren(inner, old), ts) => Paren(inner, old ++ ts)
      case (other, ts) =>
        // trailers on a literal etc. — represent via Paren semantics
        Paren(other, ts)
    }
  }

  private def parseTrailers(): List[Trailer] = {
    val out = List.newBuilder[Trailer]
    var going = true
    while (going) peek match {
      case LOp(".") if peek2.isInstanceOf[LName] =>
        next()
        val names = namePath()
        val args =
          if (peek == LOp("(")) Some(callArgs()) else None
        out += Trailer(names, args)
      case LOp("[") =>
        next()
        val idx = orE()
        expectOp("]")
        out += Trailer(Nil, None, Some(idx))
      case _ => going = false
    }
    out.result()
  }

  private def namePath(): List[String] = {
    val parts = List.newBuilder[String]
    val LName(n0, _) = next(): @unchecked
    parts += n0
    while (peek == LOp(".") && peek2.isInstanceOf[LName]) {
      next()
      val LName(n, _) = next(): @unchecked
      parts += n
    }
    parts.result()
  }

  /** `( args )` after a name; kwargs and `distinct` recognized. */
  private def callArgs(): List[Ast] = {
    expectOp("(")
    val args = List.newBuilder[Ast]
    if (peek != LOp(")")) {
      def one(firstArg: Boolean): Ast = peek match {
        case LName(n, false) if peek2 == LOp("=") &&
            (pos + 2 >= toks.length || toks(pos + 2) != LOp("=")) =>
          next(); next()
          KwArg(n, orE())
        case t if firstArg && isKw(t, "distinct") =>
          next(); DistinctArg(orE())
        case _ => orE()
      }
      args += one(firstArg = true)
      while (peek == LOp(",")) { next(); args += one(firstArg = false) }
    }
    expectOp(")")
    args.result()
  }

  private def primary(): Ast = peek match {
    case LNum(t)  => next(); Num(t)
    case LStr(t)  => next(); StrLit(t)
    case LOp("(") =>
      next()
      val inner = orE()
      expectOp(")")
      Paren(inner, Nil)
    case t if isKw(t, "case") =>
      next()
      val branches = List.newBuilder[(Ast, Ast)]
      while (eatKw("when")) {
        val c = orE()
        if (!eatKw("then")) fail("`case` requires when … then …")
        branches += ((c, orE()))
      }
      val orElse = if (eatKw("else")) Some(orE()) else None
      if (!eatKw("end")) fail("`case` requires a closing `end`")
      CaseWhen(branches.result(), orElse)
    case t if isKw(t, "cast") && peek2 == LOp("(") =>
      next(); next()
      val e = orE()
      if (!eatKw("as")) fail("`cast` requires: cast(expr as type)")
      val typ = typeName()
      expectOp(")")
      CastE(e, typ)
    case _: LName =>
      val names = namePath()
      val args = if (peek == LOp("(")) Some(callArgs()) else None
      PathCall(names, args, Nil)
    case other => fail(s"cannot parse operand at '${render(other)}'")
  }

  /** SQL type name for cast: `double`, `decimal(10, 2)`, `array<int>`. */
  private def typeName(): String = {
    val sb = new StringBuilder
    val LName(n, _) = next(): @unchecked
    sb ++= n
    if (peek == LOp("(")) {
      next(); sb += '('
      var first = true
      while (peek != LOp(")")) {
        if (!first) { sb ++= ", " }
        first = false
        peek match {
          case LNum(t)     => next(); sb ++= t
          case LName(t, _) => next(); sb ++= t
          case LOp(",")    => next(); first = true
          case other       => fail(s"bad cast type at '${render(other)}'")
        }
      }
      next(); sb += ')'
    } else if (peek == LOp("<")) {
      // array<int> style: consume raw until matching '>'
      next(); sb += '<'
      var depth = 1
      while (depth > 0) {
        peek match {
          case LOp("<") => depth += 1; sb += '<'; next()
          case LOp(">") => depth -= 1; if (depth >= 0) sb += '>'; next()
          case LName(t, _) => sb ++= t; next()
          case LOp(",") => sb ++= ", "; next()
          case other => fail(s"bad cast type at '${render(other)}'")
        }
      }
    }
    sb.toString
  }
}

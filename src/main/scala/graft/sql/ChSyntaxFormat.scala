package graft.sql

import scala.collection.mutable.ArrayBuffer

/** EXPLAIN SYNTAX — the reference prints the (rewritten) AST back as
  * formatted SQL (src/Parsers/ASTExplainQuery.h:38-53,
  * src/Interpreters/InterpreterExplainQuery.cpp SYNTAX mode;
  * IAST::format multi-line layout). We print the ORIGINAL query in the
  * same clause-per-line layout: expression text is preserved verbatim
  * (whitespace collapsed), clauses land on their own lines, multi-item
  * lists indent 4, ORDER BY items get their implicit ASC, `SELECT *`
  * over a known table expands to the column list, and nested UNION
  * chains of one mode are flattened (normalizeSelectWithUnionQuery).
  * The reference's optimizer rewrites (avg(x+2)→avg(x)+2 …) are not
  * reproduced — those tests diff rather than parse-error.
  */
object ChSyntaxFormat {

  private sealed trait Kind
  private case object W extends Kind   // word / number
  private case object S extends Kind   // string literal
  private case object P extends Kind   // punctuation

  private final case class T(text: String, kind: Kind)

  private def lex(s: String): Vector[T] = {
    val out = Vector.newBuilder[T]
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '-' && i + 1 < n && s.charAt(i + 1) == '-') {
        while (i < n && s.charAt(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < n && s.charAt(i + 1) == '*') {
        i += 2
        while (i + 1 < n && !(s.charAt(i) == '*' && s.charAt(i + 1) == '/')) i += 1
        i = math.min(n, i + 2)
      } else if (c == '\'' || c == '`' || c == '"') {
        val q = c
        val sb = new StringBuilder().append(q)
        i += 1
        while (i < n && s.charAt(i) != q) {
          if (s.charAt(i) == '\\' && i + 1 < n) { sb.append(s.charAt(i)); i += 1 }
          sb.append(s.charAt(i)); i += 1
        }
        if (i < n) { sb.append(q); i += 1 }
        out += T(sb.toString, S)
      } else if (c.isLetterOrDigit || c == '_' || c == '$') {
        val st = i
        while (i < n && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_' ||
          s.charAt(i) == '$')) i += 1
        out += T(s.substring(st, i), W)
      } else {
        // multi-char operators kept whole so spacing stays natural
        val two = if (i + 1 < n) s.substring(i, i + 2) else ""
        if (Set("::", "->", "<=", ">=", "!=", "<>", "||", "==").contains(two)) {
          out += T(two, P); i += 2
        } else { out += T(c.toString, P); i += 1 }
      }
    }
    out.result()
  }

  /** `x::Type` prints as the reference's CAST form: a LITERAL operand
    * becomes its quoted text — CAST('-1', 'Int32'),
    * CAST('[1, 2]', 'Array(UInt32)') — and any other operand stays an
    * expression: CAST(1 + 2, 'UInt32'); nested `::` rewrites inner-
    * first (01852_cast_operator*). */
  private def rewriteCastOps(ts0: Seq[T]): Seq[T] = {
    val ts = ts0.toVector
    val i = ts.indexWhere(_.text == "::")
    if (i <= 0 || i + 1 >= ts.length) return ts
    // operand span: a primary ending at i-1
    var aStart = i - 1
    ts(aStart).text match {
      case ")" | "]" =>
        var d = 0
        var k = i - 1
        while (k >= 0 && aStart == i - 1) {
          ts(k).text match {
            case ")" | "]" => d += 1
            case "(" | "[" => d -= 1; if (d == 0) aStart = k
            case _ => ()
          }
          k -= 1
        }
        // function call: name immediately before '('
        if (aStart > 0 && ts(aStart).text == "(" &&
            ts(aStart - 1).kind == W && !keyword(ts(aStart - 1).text))
          aStart -= 1
      case _ => ()
    }
    // a decimal literal spans `digits . digits` in this lexer
    def isNum(t: T): Boolean =
      t.kind == W && t.text.nonEmpty && t.text.head.isDigit
    while (aStart >= 2 && isNum(ts(aStart)) && ts(aStart - 1).text == "." &&
        isNum(ts(aStart - 2)))
      aStart -= 2
    // a numeric literal absorbs its unary sign (CH: -1::Int32 is the
    // literal -1)
    val numWord = isNum(ts(aStart))
    if (numWord && aStart > 0 &&
        (ts(aStart - 1).text == "-" || ts(aStart - 1).text == "+") &&
        (aStart - 2 < 0 || (ts(aStart - 2).kind == P &&
          ts(aStart - 2).text != ")" && ts(aStart - 2).text != "]") ||
          (ts(aStart - 2).kind == W && keyword(ts(aStart - 2).text))))
      aStart -= 1
    // type span: Word [ ( … ) ]
    var tEnd = i + 1
    if (ts(tEnd).kind != W) return ts // not a type — leave untouched
    if (tEnd + 1 < ts.length && ts(tEnd + 1).text == "(") {
      var d = 0
      var k = tEnd + 1
      var close = -1
      while (k < ts.length && close < 0) {
        ts(k).text match {
          case "(" => d += 1
          case ")" => d -= 1; if (d == 0) close = k
          case _ => ()
        }
        k += 1
      }
      if (close >= 0) tEnd = close
    }
    val operand = rewriteCastOps(ts.slice(aStart, i))
    val typeTxt = renderType(ts.slice(i + 1, tEnd + 1))
    val isLit = operand.forall(t =>
      t.kind == S ||
        (t.kind == W && t.text.nonEmpty && t.text.head.isDigit) ||
        (t.kind == P && Set(".", ",", "[", "]", "(", ")", "-", "+")
          .contains(t.text)))
    val castToks: Seq[T] =
      if (isLit) {
        val text =
          if (operand.length == 1 && operand.head.kind == S)
            operand.head.text.stripPrefix("'").stripSuffix("'")
          else render(operand)
        Seq(T("CAST", W), T("(", P),
          T("'" + text.replace("\\", "\\\\").replace("'", "\\'") + "'", S),
          T(",", P), T("'" + typeTxt + "'", S), T(")", P))
      } else
        Seq(T("CAST", W), T("(", P)) ++ stripOuterParens(operand) ++
          Seq(T(",", P), T("'" + typeTxt + "'", S), T(")", P))
    rewriteCastOps(ts.take(aStart) ++ castToks ++ ts.drop(tEnd + 1))
  }

  /** Type-name spacing: none before '(', a space after ',' and between
    * adjacent words (`Nested(u UInt8, s String)`). */
  private def renderType(ts: Seq[T]): String = {
    val sb = new StringBuilder
    var prev: T = null
    ts.foreach { t =>
      if (prev != null &&
          ((prev.kind == W && t.kind == W) || prev.text == ","))
        sb.append(' ')
      sb.append(t.text)
      prev = t
    }
    sb.toString
  }

  /** Re-join a token slice with natural SQL spacing. */
  private def render(ts0: Seq[T]): String = {
    val ts = if (ts0.exists(_.text == "::")) rewriteCastOps(ts0) else ts0
    val sb = new StringBuilder
    var prev: T = null
    var prev2: T = null // the significant token before prev
    ts.foreach { t =>
      // a sign is UNARY when nothing value-like precedes it — no space
      // between it and its operand (`SELECT -1`, `f(-1)`)
      val prevIsUnarySign = prev != null &&
        (prev.text == "-" || prev.text == "+") &&
        (prev2 == null || prev2.text == "(" || prev2.text == "[" ||
          prev2.text == "," ||
          (prev2.kind == P && prev2.text != ")" && prev2.text != "]") ||
          (prev2.kind == W && keyword(prev2.text)))
      val sp =
        if (prev == null) ""
        else if (prevIsUnarySign) ""
        else if (t.text == "(" )
          // no space between a function name / ) / ] and its '('
          if (prev.kind == W && !keyword(prev.text)) ""
          else if (prev.text == ")" || prev.text == "]") ""
          else " "
        else if (t.text == ")" || t.text == "]" || t.text == "," ||
          t.text == "::" || t.text == ".") ""
        else if (prev.text == "(" || prev.text == "[" || prev.text == "::" ||
          prev.text == ".") ""
        else if (t.text == "[")
          if (prev.kind == W && !keyword(prev.text)) "" else " "
        else " "
      sb.append(sp).append(t.text)
      prev2 = prev
      prev = t
    }
    sb.toString
  }

  private val kw = Set("SELECT", "FROM", "WHERE", "PREWHERE", "GROUP", "BY",
    "HAVING", "ORDER", "LIMIT", "OFFSET", "SETTINGS", "WITH", "DISTINCT",
    "UNION", "ALL", "AND", "OR", "NOT", "IN", "AS", "ON", "USING", "JOIN",
    "INNER", "LEFT", "RIGHT", "FULL", "CROSS", "ANY", "ASOF", "SEMI", "ANTI",
    "ARRAY", "BETWEEN", "LIKE", "ILIKE", "IS", "NULL", "CASE", "WHEN", "THEN",
    "ELSE", "END", "INTERVAL", "EXISTS", "ASC", "DESC", "TOTALS", "FILL",
    "INTERPOLATE", "TIES", "INTERSECT", "EXCEPT")
  private def keyword(w: String): Boolean = kw.contains(w.toUpperCase)

  private def isW(t: T, s: String): Boolean =
    t.kind == W && t.text.equalsIgnoreCase(s)

  /** Split `ts` at depth-0 commas. */
  private def splitItems(ts: Seq[T]): Seq[Seq[T]] = {
    val out = ArrayBuffer[Seq[T]]()
    var d = 0
    var cur = ArrayBuffer[T]()
    ts.foreach { t =>
      t.text match {
        case "(" | "[" => d += 1; cur += t
        case ")" | "]" => d -= 1; cur += t
        case "," if d == 0 => out += cur.toSeq; cur = ArrayBuffer[T]()
        case _ => cur += t
      }
    }
    if (cur.nonEmpty || out.nonEmpty) out += cur.toSeq
    out.toSeq
  }

  /** Top-level SELECT-clause boundaries. Returns (clause → token slice). */
  private def clause(ts: Seq[T], i0: Int): Int = {
    // find next depth-0 clause keyword index from i0 (exclusive start)
    var d = 0
    var i = i0
    while (i < ts.length) {
      val t = ts(i)
      t.text match {
        case "(" | "[" => d += 1
        case ")" | "]" => d -= 1
        case _ if d == 0 && t.kind == W =>
          val u = t.text.toUpperCase
          if (u == "FROM" || u == "WHERE" || u == "PREWHERE" ||
            u == "HAVING" || u == "SETTINGS" || u == "LIMIT" ||
            ((u == "GROUP" || u == "ORDER") && i + 1 < ts.length &&
              isW(ts(i + 1), "BY")))
            return i
          // UNION handled by the caller
        case _ => ()
      }
      i += 1
    }
    ts.length
  }

  def format(query: String,
      columnsOf: String => Option[Seq[String]] = _ => None): Seq[String] = {
    val ts = lex(query)
    val out = formatUnion(ts, 0, columnsOf)
    // quirk preserved from the reference formatter: a mixed chain whose
    // first rendered element is a parenthesized group prints a leading
    // blank line (01732 golden)
    if (out.headOption.contains("(")) "" +: out else out
  }

  /** Union-mode token triples at depth 0: (index, isAll, isDistinct). */
  private def unionSplits(ts: Seq[T]): Seq[(Int, String)] = {
    var d = 0
    val out = ArrayBuffer[(Int, String)]()
    var i = 0
    while (i < ts.length) {
      ts(i).text match {
        case "(" | "[" => d += 1
        case ")" | "]" => d -= 1
        case _ =>
          if (d == 0 && isW(ts(i), "UNION")) {
            val mode =
              if (i + 1 < ts.length && isW(ts(i + 1), "ALL")) "ALL"
              else if (i + 1 < ts.length && isW(ts(i + 1), "DISTINCT")) "DISTINCT"
              else "DISTINCT"
            out += ((i, mode))
          }
      }
      i += 1
    }
    out.toSeq
  }

  private def stripOuterParens(ts: Seq[T]): Seq[T] = {
    var cur = ts
    var changed = true
    while (changed && cur.length >= 2 && cur.head.text == "(" &&
        cur.last.text == ")") {
      changed = false
      // the opening paren must match the closing one
      var d = 0
      var ok = true
      for (k <- cur.indices) {
        cur(k).text match {
          case "(" => d += 1
          case ")" => d -= 1; if (d == 0 && k != cur.length - 1) ok = false
          case _ => ()
        }
      }
      if (ok) { cur = cur.slice(1, cur.length - 1); changed = true }
    }
    cur
  }

  // ---- union-chain normalization (the reference's
  // normalizeSelectWithUnionQuery): group everything up to the LAST
  // UNION DISTINCT into one DISTINCT chain (nested chains of either
  // mode splice into it — distinct over all rows either way), then the
  // remaining UNION ALL tail splices flat ----
  private sealed trait UNode
  private final case class USel(ts: Seq[T]) extends UNode
  private final case class UChain(all: Boolean, cs: Vector[UNode]) extends UNode

  private def parseUnion(ts0: Seq[T]): UNode = {
    val ts = stripOuterParens(ts0)
    val splits = unionSplits(ts)
    if (splits.isEmpty) return USel(ts)
    val bounds = (0 +: splits.map { case (i, m) =>
      i + (if (i + 1 < ts.length && (isW(ts(i + 1), "ALL") ||
        isW(ts(i + 1), "DISTINCT"))) 2 else 1)
    }).zip(splits.map(_._1) :+ ts.length)
    val branches = bounds.map { case (s, e) => parseUnion(ts.slice(s, e)) }
    build(branches.toVector, splits.map(_._2).toVector)
  }

  private def spliceAll(c: UNode): Vector[UNode] = c match {
    case UChain(true, kids) => kids.flatMap(spliceAll)
    case other => Vector(other)
  }
  private def spliceAny(c: UNode): Vector[UNode] = c match {
    case UChain(_, kids) => kids.flatMap(spliceAny)
    case other => Vector(other)
  }

  private def build(branches: Vector[UNode], modes: Vector[String]): UNode = {
    if (modes.forall(_ == "ALL"))
      UChain(all = true, branches.flatMap(spliceAll))
    else if (modes.forall(_ == "DISTINCT"))
      UChain(all = false, branches.flatMap(spliceAny))
    else {
      val lastD = modes.lastIndexOf("DISTINCT")
      val group = UChain(all = false,
        branches.take(lastD + 2).flatMap(spliceAny))
      val rest = branches.drop(lastD + 2)
      if (rest.isEmpty) group
      else UChain(all = true, (group +: rest).flatMap(spliceAll))
    }
  }

  private def renderNode(n: UNode, indent: Int,
      columnsOf: String => Option[Seq[String]]): Seq[String] = {
    val pad = " " * indent
    n match {
      case USel(ts) => formatSelect(ts, indent, columnsOf)
      case UChain(all, cs) =>
        val kw = if (all) "UNION ALL" else "UNION DISTINCT"
        val lines = ArrayBuffer[String]()
        cs.zipWithIndex.foreach { case (c, i) =>
          if (i > 0) lines += pad + kw
          c match {
            case g: UChain =>
              lines += pad + "("
              lines ++= renderNode(g, indent + 4, columnsOf)
              lines += pad + ")"
            case s: USel => lines ++= renderNode(s, indent, columnsOf)
          }
        }
        lines.toSeq
    }
  }

  private def formatUnion(ts0: Seq[T], indent: Int,
      columnsOf: String => Option[Seq[String]]): Seq[String] =
    renderNode(parseUnion(ts0), indent, columnsOf)

  private def formatSelect(ts0: Seq[T], indent: Int,
      columnsOf: String => Option[Seq[String]]): Seq[String] = {
    val ts = stripOuterParens(ts0)
    val pad = " " * indent
    val lines = ArrayBuffer[String]()
    if (ts.isEmpty) return Nil
    var i = 0
    // WITH prologue
    if (isW(ts(i), "WITH")) {
      // ends at the depth-0 SELECT
      var d = 0
      var j = i + 1
      var sel = -1
      while (j < ts.length && sel < 0) {
        ts(j).text match {
          case "(" | "[" => d += 1
          case ")" | "]" => d -= 1
          case _ if d == 0 && isW(ts(j), "SELECT") => sel = j
          case _ => ()
        }
        j += 1
      }
      if (sel < 0) sel = ts.length
      val items = splitItems(ts.slice(i + 1, sel))
      if (items.length == 1) lines += pad + "WITH " + renderWithItem(items.head, indent, columnsOf)
      else {
        lines += pad + "WITH"
        items.zipWithIndex.foreach { case (it, k) =>
          lines += pad + "    " + renderWithItem(it, indent + 4, columnsOf) +
            (if (k < items.length - 1) "," else "")
        }
      }
      i = sel
    }
    if (i >= ts.length || !isW(ts(i), "SELECT"))
      return Seq(pad + render(ts.drop(i))) // not a SELECT: echo
    i += 1
    var distinct = false
    if (i < ts.length && isW(ts(i), "DISTINCT")) { distinct = true; i += 1 }
    val selEnd = clause(ts, i)
    var items = splitItems(ts.slice(i, selEnd))
    i = selEnd
    // locate FROM for star expansion + formatting
    var fromTable: Option[String] = None
    var fromSub: Option[Seq[T]] = None
    var fromTail: Seq[T] = Nil
    if (i < ts.length && isW(ts(i), "FROM")) {
      val fe = clause(ts, i + 1)
      val body = ts.slice(i + 1, fe)
      if (body.nonEmpty && body.head.text == "(") {
        // the subquery part and whatever trails its close (alias, joins)
        var d = 0
        var close = -1
        for (k <- body.indices if close < 0) {
          body(k).text match {
            case "(" => d += 1
            case ")" => d -= 1; if (d == 0) close = k
            case _ => ()
          }
        }
        if (close == body.length - 1) fromSub = Some(body)
        else { fromSub = Some(body.take(close + 1)); fromTail = body.drop(close + 1) }
      } else if (body.length == 1 && body.head.kind == W) {
        fromTable = Some(body.head.text)
      } else fromTail = body
      i = fe
    }
    // star expansion over a known plain table
    if (items.length == 1 && items.head.length == 1 &&
        items.head.head.text == "*") {
      fromTable.flatMap(t => columnsOf(t.replaceAll("`", ""))) match {
        case Some(cols) if cols.nonEmpty =>
          items = cols.map(c => Seq(T(c, W)))
        case _ => ()
      }
    }
    val selKw = pad + (if (distinct) "SELECT DISTINCT" else "SELECT")
    if (items.length == 1) lines += selKw + " " + render(items.head)
    else {
      lines += selKw
      items.zipWithIndex.foreach { case (it, k) =>
        lines += pad + "    " + render(it) +
          (if (k < items.length - 1) "," else "")
      }
    }
    if (fromTable.isDefined) lines += pad + "FROM " + fromTable.get
    else if (fromSub.isDefined) {
      lines += pad + "FROM"
      lines += pad + "("
      lines ++= formatUnion(fromSub.get, indent + 4, columnsOf)
      lines += pad + ")" + (if (fromTail.nonEmpty) " " + render(fromTail) else "")
    } else if (fromTail.nonEmpty) lines += pad + "FROM " + render(fromTail)
    // remaining clauses in order
    while (i < ts.length) {
      val u = ts(i).text.toUpperCase
      u match {
        case "WHERE" | "PREWHERE" | "HAVING" | "SETTINGS" =>
          val e = clause(ts, i + 1)
          lines += pad + u + " " + render(ts.slice(i + 1, e))
          i = e
        case "GROUP" =>
          val e = clause(ts, i + 2)
          val gs = splitItems(ts.slice(i + 2, e))
          if (gs.length == 1) lines += pad + "GROUP BY " + render(gs.head)
          else {
            lines += pad + "GROUP BY"
            gs.zipWithIndex.foreach { case (g, k) =>
              lines += pad + "    " + render(g) +
                (if (k < gs.length - 1) "," else "")
            }
          }
          i = e
        case "ORDER" =>
          val e = clause(ts, i + 2)
          val os = splitItems(ts.slice(i + 2, e)).map { o =>
            val hasDir = o.exists(t => isW(t, "ASC") || isW(t, "DESC") ||
              isW(t, "ASCENDING") || isW(t, "DESCENDING"))
            if (hasDir) render(o)
            else {
              // implicit ASC lands before any WITH FILL tail
              val fillAt = o.indices.find(k => isW(o(k), "WITH") &&
                k + 1 < o.length && isW(o(k + 1), "FILL"))
              fillAt match {
                case Some(f) => render(o.take(f)) + " ASC " + render(o.drop(f))
                case None => render(o) + " ASC"
              }
            }
          }
          if (os.length == 1) lines += pad + "ORDER BY " + os.head
          else {
            lines += pad + "ORDER BY"
            os.zipWithIndex.foreach { case (o, k) =>
              lines += pad + "    " + o + (if (k < os.length - 1) "," else "")
            }
          }
          i = e
        case "LIMIT" =>
          val e = clause(ts, i + 1)
          lines += pad + "LIMIT " + render(ts.slice(i + 1, e))
          i = e
        case _ =>
          // unknown tail (FORMAT …, INTO OUTFILE …): echo and stop
          lines += pad + render(ts.drop(i))
          i = ts.length
      }
    }
    lines.toSeq
  }

  /** A WITH item may be a CTE (`name AS (subquery)`) — format its body
    * multi-line like the reference does; scalar items echo verbatim. */
  private def renderWithItem(it: Seq[T], indent: Int,
      columnsOf: String => Option[Seq[String]]): String = {
    // CTE shape: word AS ( … )
    if (it.length >= 4 && it.head.kind == W && isW(it(1), "AS") &&
        it(2).text == "(" && it.last.text == ")") {
      val inner = formatUnion(it.slice(3, it.length - 1), indent + 4, columnsOf)
      (it.head.text + " AS\n" + " " * indent + "(\n" +
        inner.mkString("\n") + "\n" + " " * indent + ")")
    } else render(it)
  }
}

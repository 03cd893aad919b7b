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

  /** Re-join a token slice with natural SQL spacing. */
  private def render(ts: Seq[T]): String = {
    val sb = new StringBuilder
    var prev: T = null
    ts.foreach { t =>
      val sp =
        if (prev == null) ""
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
    formatUnion(ts, 0, columnsOf)
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

  private def formatUnion(ts0: Seq[T], indent: Int,
      columnsOf: String => Option[Seq[String]]): Seq[String] = {
    val ts = stripOuterParens(ts0)
    val splits = unionSplits(ts)
    if (splits.isEmpty) return formatSelect(ts, indent, columnsOf)
    val modes = splits.map(_._2).distinct
    val oneMode = modes.length == 1
    // branch ranges
    val bounds = (0 +: splits.map { case (i, m) =>
      i + (if (m == "ALL" || (m == "DISTINCT" && isW(ts(i + 1), "DISTINCT"))) 2 else 1)
    }).zip(splits.map(_._1) :+ ts.length)
    val pad = " " * indent
    val lines = ArrayBuffer[String]()
    bounds.zipWithIndex.foreach { case ((s, e), bi) =>
      if (bi > 0) lines += pad + "UNION " + splits(bi - 1)._2
      val branch = ts.slice(s, e)
      val inner = stripOuterParens(branch)
      val innerSplits = unionSplits(inner)
      val flatten = innerSplits.isEmpty ||
        (oneMode && innerSplits.forall(_._2 == modes.head))
      if (flatten) lines ++= formatUnion(inner, indent, columnsOf)
      else {
        lines += pad + "("
        lines ++= formatUnion(inner, indent + 4, columnsOf)
        lines += pad + ")"
      }
    }
    lines.toSeq
  }

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

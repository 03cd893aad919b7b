package graft.sql

import scala.collection.mutable.ArrayBuffer

/** Text-level transpiler for the ClickHouse-specific SYNTAX (not
  * function names — those resolve through the dialect registry injected
  * by GraftExtensions) that appears in the reference's own stateless
  * test corpus (/root/reference/tests/queries/4_cnch_stateless/): the
  * pieces Spark's parser cannot read.
  *
  *  - `[a, b]` array literals → `array(a, b)` (reference parser
  *    ParserArrayOfLiterals, /root/reference/src/Parsers/ExpressionListParsers.cpp);
  *    brackets after a value expression are 1-based element access
  *    instead → `element_at(expr, idx)` (same 1-based convention).
  *  - bare `dummy` (the implicit system.one column) → `0`.
  *  - statement splitting on top-level `;`, `--` and `/* */` comment
  *    stripping — the shape `clickhouse-test` feeds the server.
  *
  * Deliberately conservative: anything the tokenizer does not
  * understand is passed through untouched, so a transpile never turns
  * working SQL into silently different SQL — it can only leave
  * ClickHouse syntax in place for Spark's parser to reject loudly.
  */
object ChTranspiler {

  /** Split a test file's text into top-level statements, comments
    * stripped. Semicolons inside string literals do not split.
    */
  def statements(sqlText: String): Seq[String] = {
    val out = ArrayBuffer[String]()
    val cur = new StringBuilder
    var i = 0
    val n = sqlText.length
    while (i < n) {
      val c = sqlText.charAt(i)
      if (c == '\'' ) { // string literal: copy verbatim incl. escapes
        cur.append(c); i += 1
        var done = false
        while (i < n && !done) {
          val d = sqlText.charAt(i)
          cur.append(d)
          if (d == '\\' && i + 1 < n) { cur.append(sqlText.charAt(i + 1)); i += 2 }
          else { if (d == '\'') done = true; i += 1 }
        }
      } else if (c == '-' && i + 1 < n && sqlText.charAt(i + 1) == '-') {
        while (i < n && sqlText.charAt(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < n && sqlText.charAt(i + 1) == '*') {
        i += 2
        while (i + 1 < n && !(sqlText.charAt(i) == '*' && sqlText.charAt(i + 1) == '/')) i += 1
        i = math.min(i + 2, n)
      } else if (c == ';') {
        out += cur.toString; cur.clear(); i += 1
      } else { cur.append(c); i += 1 }
    }
    out += cur.toString
    out.map(_.trim).filter(_.nonEmpty).toSeq
  }

  private sealed trait Tok { def text: String }
  private case class Word(text: String) extends Tok
  private case class Str(text: String) extends Tok
  private case class Num(text: String) extends Tok
  private case class Punct(text: String) extends Tok
  private case class Ws(text: String) extends Tok

  private def tokenize(s: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c.isWhitespace) {
        val j = i; while (i < n && s.charAt(i).isWhitespace) i += 1
        out += Ws(s.substring(j, i))
      } else if (c == '\'') {
        val j = i; i += 1
        var done = false
        while (i < n && !done) {
          val d = s.charAt(i)
          if (d == '\\' && i + 1 < n) i += 2
          else { if (d == '\'') done = true; i += 1 }
        }
        out += Str(s.substring(j, i))
      } else if (c.isLetter || c == '_' || c == '`') {
        if (c == '`') {
          val j = i; i += 1
          while (i < n && s.charAt(i) != '`') i += 1
          i = math.min(i + 1, n)
          out += Word(s.substring(j, i))
        } else {
          val j = i
          while (i < n && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_')) i += 1
          out += Word(s.substring(j, i))
        }
      } else if (c.isDigit ||
          (c == '.' && i + 1 < n && s.charAt(i + 1).isDigit)) {
        val j = i
        while (i < n && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '.' ||
          ((s.charAt(i) == '+' || s.charAt(i) == '-') && i > j &&
            (s.charAt(i - 1) == 'e' || s.charAt(i - 1) == 'E')))) i += 1
        out += Num(s.substring(j, i))
      } else {
        out += Punct(c.toString); i += 1
      }
    }
    out.result()
  }

  /** True when a `[` following `prev` opens an array LITERAL (otherwise
    * it is element access on the preceding value).
    */
  private def opensLiteral(prev: Option[Tok]): Boolean = prev match {
    case None => true
    case Some(Word(w)) => // keywords continue an expression context
      val kw = w.toUpperCase
      Set("SELECT", "AS", "IN", "AND", "OR", "NOT", "WHERE", "BY", "ON",
        "WHEN", "THEN", "ELSE", "RETURN", "UNION", "ALL", "DISTINCT",
        "HAVING", "LIMIT", "OFFSET", "FROM", "JOIN", "ARRAY", "SETTINGS",
        "INTERVAL", "CASE", "BETWEEN", "LIKE", "IS", "NULL", "ORDER",
        "GROUP").contains(kw)
    case Some(Punct(p)) => p != ")" && p != "]"
    case Some(_: Str) | Some(_: Num) => false
    case Some(_: Ws) => true // handled by caller (skips ws)
  }

  /** ClickHouse type name → Spark SQL type, for CAST targets. */
  private def chType(w: String): Option[String] = w match {
    case "UInt8" | "UInt16" | "UInt32" | "Int8" | "Int16" | "Int32" => Some("INT")
    case "UInt64" | "Int64" => Some("BIGINT")
    case "Float32" => Some("FLOAT")
    case "Float64" => Some("DOUBLE")
    case "String" => Some("STRING")
    case "Date" | "Date32" => Some("DATE")
    case "DateTime" | "DateTime64" => Some("TIMESTAMP")
    case "UUID" => Some("STRING")
    case _ => None
  }

  /** Token pre-pass over type syntax: strip `Nullable(...)` /
    * `LowCardinality(...)` wrappers (keeping the inner type), map CH
    * scalar type names to Spark's, expand `Decimal32/64/128(s)` to
    * DECIMAL(p,s), and rewrite `Array(T)` type syntax to `ARRAY<T>`.
    */
  private def rewriteTypes(toks: Vector[Tok]): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var depth = 0
    var closeAs = Map[Int, String]() // depth → replacement text for its ")"
    def nextNonWs(j: Int): Int = {
      var k = j; while (k < toks.length && toks(k).isInstanceOf[Ws]) k += 1; k
    }
    var i = 0
    while (i < toks.length) {
      toks(i) match {
        case Word(w) if (w == "Nullable" || w == "LowCardinality") && {
            val k = nextNonWs(i + 1)
            k < toks.length && toks(k) == Punct("(") } =>
          depth += 1; closeAs += depth -> ""
          i = nextNonWs(i + 1) + 1
        case Word("Array") if {
            val k = nextNonWs(i + 1)
            k < toks.length && toks(k) == Punct("(") } =>
          out += Word("ARRAY"); out += Punct("<")
          depth += 1; closeAs += depth -> ">"
          i = nextNonWs(i + 1) + 1
        case Word(w) if (w == "Decimal32" || w == "Decimal64" || w == "Decimal128") && {
            val k = nextNonWs(i + 1)
            k < toks.length && toks(k) == Punct("(") } =>
          val p = w match {
            case "Decimal32" => "9"; case "Decimal64" => "18"; case _ => "38"
          }
          out += Word("DECIMAL"); out += Punct("("); out += Num(p); out += Punct(",")
          depth += 1 // its ")" closes normally
          i = nextNonWs(i + 1) + 1
        case Word(w) if chType(w).isDefined =>
          out += Word(chType(w).get); i += 1
        case p @ Punct("(") => depth += 1; out += p; i += 1
        case p @ Punct(")") =>
          closeAs.get(depth) match {
            case Some("") => ()
            case Some(s) => out += Punct(s)
            case None => out += p
          }
          closeAs -= depth; depth -= 1; i += 1
        case t => out += t; i += 1
      }
    }
    out.result()
  }

  /** Transpile one statement's ClickHouse syntax to Spark-parseable SQL. */
  def transpile(stmt: String): String = {
    val toks0 = tokenize(stmt)
    // Type-level pre-pass: strip Nullable(...) / LowCardinality(...)
    // wrappers (keep the inner type), map scalar type names, expand
    // DecimalNN(s), and rewrite Array(T) type syntax to ARRAY<T>.
    val toks = rewriteTypes(toks0)
    val out = new StringBuilder
    // Depth-indexed stack entry: true → this bracket became `array(`,
    // false → element access (we rewrote `x[` to `element_at(x, `).
    var stack = List[Boolean]()
    var lastSig: Option[Tok] = None
    var parens = 0
    var i = 0
    while (i < toks.length) {
      toks(i) match {
        case Word(w) if parens == 0 && stack.isEmpty &&
            w.equalsIgnoreCase("settings") =>
          // CH query-level SETTINGS clause: session knobs, no Spark
          // equivalent — drop the remainder of the statement.
          i = toks.length - 1
        case Punct("[") =>
          if (opensLiteral(lastSig)) {
            out.append("array("); stack = true :: stack
          } else {
            // element access: wrap the preceding primary in element_at.
            // Find the start of the preceding primary expression in the
            // OUTPUT: walk back over balanced parens/identifier chars.
            val prefix = out.toString
            val start = primaryStart(prefix)
            val primary = prefix.substring(start)
            out.setLength(start)
            out.append("element_at(").append(primary).append(", ")
            stack = false :: stack
          }
          lastSig = Some(Punct("["))
        case Punct("]") =>
          out.append(")")
          stack = stack.drop(1)
          lastSig = Some(Punct("]"))
        case Word(w) if w.equalsIgnoreCase("dummy") =>
          out.append("0"); lastSig = Some(Num("0"))
        case Word("inf") =>
          out.append("CAST('Infinity' AS DOUBLE)"); lastSig = Some(Num("0"))
        case Word("nan") =>
          out.append("CAST('NaN' AS DOUBLE)"); lastSig = Some(Num("0"))
        case p @ Punct("(") if lastSig.contains(Punct(")")) =>
          // CH parameterized-aggregate syntax f(params)(args): merge into
          // the registry's single-call convention f(params, args) —
          // ClickHouseAliases expects exactly this shape (e.g.
          // quantileExact(level, x), sequenceMatch(pattern, ts, conds...)).
          var j = out.length - 1
          while (j >= 0 && out.charAt(j).isWhitespace) j -= 1
          out.setLength(j) // drop the ")"
          out.append(", ")
          parens += 1 // the dropped ")" had decremented the counter
          lastSig = Some(p)
        case n @ Num(t) if t.startsWith(".") && t.drop(1).forall(_.isDigit) &&
            (lastSig.exists(_.isInstanceOf[Word]) ||
             lastSig.contains(Punct(")")) || lastSig.contains(Punct("]"))) =>
          // CH 1-based tuple element access `t.1` — our tuples are Spark
          // structs built by the `tuple()` registry function (CreateStruct
          // names its fields col1, col2, …), so `.N` maps to `.colN`.
          out.append(".col").append(t.drop(1))
          lastSig = Some(n)
        case Word(w) if w.equalsIgnoreCase("all") && {
            var k = i + 1
            while (k < toks.length && toks(k).isInstanceOf[Ws]) k += 1
            k < toks.length && (toks(k) match {
              case Word(j) => Seq("INNER", "LEFT", "RIGHT", "FULL", "JOIN")
                .contains(j.toUpperCase)
              case _ => false
            }) } =>
          // CH `ALL JOIN` qualifier = standard join semantics; drop the
          // word (ANY/ASOF qualifiers are NOT dropped — different
          // semantics, they must fail loudly instead).
          ()
        case n @ Num(t) if (t.contains('.') || t.toLowerCase.contains('e')) &&
            !t.toLowerCase.startsWith("0x") && t.count(_ == '.') <= 1 &&
            !t.toLowerCase.endsWith("d") =>
          // CH fractional/exponent literals are Float64; Spark's default
          // is DECIMAL — suffix D so arithmetic and formatting match the
          // reference (0.1 + 0.2 → 0.30000000000000004, 1.0 prints "1").
          val base0 = if (t.endsWith(".")) t + "0" else t
          val base = if (base0.startsWith(".")) "0" + base0 else base0
          out.append(base).append("D")
          lastSig = Some(n)
        case s @ Str(_) =>
          out.append(normalizeStringLiteral(s.text)); lastSig = Some(s)
        case t @ Ws(_) => out.append(t.text)
        case t =>
          if (t == Punct("(")) parens += 1
          else if (t == Punct(")")) parens -= 1
          out.append(t.text); lastSig = Some(t)
      }
      i += 1
    }
    postPass(out.toString)
  }

  private val twoArgCast =
    """(?i)CAST\(([^,()']+|'[^']*'),\s*'([A-Za-z0-9(), ]+)'\)""".r
  private val countEmpty = """(?i)\bcount\(\s*\)""".r

  /** String-level cleanups after the token pass. */
  private def postPass(sql: String): String = {
    // CAST(x, 'Type') two-arg form → CAST(x AS <mapped>); the type string
    // goes back through the token-level type rewriter.
    val c = twoArgCast.replaceAllIn(sql, m => {
      val mapped = transpileTypeString(m.group(2))
      java.util.regex.Matcher.quoteReplacement(
        s"CAST(${m.group(1)} AS $mapped)")
    })
    countEmpty.replaceAllIn(c, "count(*)")
  }

  /** Map a bare CH type string (e.g. "Nullable(UInt8)") via the token
    * rewriter used for inline type syntax.
    */
  private def transpileTypeString(t: String): String =
    rewriteTypes(tokenize(t)).map(_.text).mkString

  /** Decode a ClickHouse string literal's escapes (notably `\xHH`,
    * which Spark's lexer does not know) and re-encode as a
    * Spark-parseable literal. The decode follows the reference's
    * parseComplexEscapeSequence (src/IO/ReadHelpers.cpp): C escapes,
    * hex pairs, and backslash-anything-else = that char.
    */
  private def normalizeStringLiteral(lit: String): String = {
    if (lit.length < 2) return lit
    val body = lit.substring(1, lit.length - 1)
    val decoded = new StringBuilder
    var i = 0
    while (i < body.length) {
      val c = body.charAt(i)
      if (c == '\\' && i + 1 < body.length) {
        val e = body.charAt(i + 1)
        e match {
          case 'x' | 'X' if i + 4 <= body.length &&
              body.substring(i + 2, i + 4).forall(ch => Character.digit(ch, 16) >= 0) =>
            decoded.append(Integer.parseInt(body.substring(i + 2, i + 4), 16).toChar)
            i += 4
          case 'n' => decoded.append('\n'); i += 2
          case 't' => decoded.append('\t'); i += 2
          case 'r' => decoded.append('\r'); i += 2
          case '0' => decoded.append('\u0000'); i += 2
          case 'a' => decoded.append('\u0007'); i += 2
          case 'b' => decoded.append('\b'); i += 2
          case 'f' => decoded.append('\f'); i += 2
          case 'v' => decoded.append('\u000B'); i += 2
          case other => decoded.append(other); i += 2
        }
      } else { decoded.append(c); i += 1 }
    }
    // Re-encode for Spark's lexer: backslash + quote escaped, control
    // chars as recognized escapes, everything else raw.
    val enc = decoded.toString.flatMap {
      case '\\' => "\\\\"
      case '\'' => "\\'"
      case '\n' => "\\n"
      case '\t' => "\\t"
      case '\r' => "\\r"
      case c if c < ' ' => f"\\u${c.toInt}%04X"
      case c => c.toString
    }
    "'" + enc + "'"
  }

  /** Index in `s` where the trailing primary expression starts: an
    * identifier, a string/number literal, or a balanced (...) / array(...)
    * call chain (walks back over matched parens plus a preceding name).
    */
  private def primaryStart(s: String): Int = {
    var i = s.length - 1
    while (i >= 0 && s.charAt(i).isWhitespace) i -= 1
    if (i < 0) return 0
    s.charAt(i) match {
      case ')' =>
        var depth = 0
        var j = i
        while (j >= 0) {
          val c = s.charAt(j)
          if (c == ')') depth += 1
          else if (c == '(') { depth -= 1; if (depth == 0) { j -= 1
            // include function name if present
            var k = j
            while (k >= 0 && (s.charAt(k).isLetterOrDigit || s.charAt(k) == '_' || s.charAt(k) == '.')) k -= 1
            return k + 1 } }
          j -= 1
        }
        0
      case '\'' =>
        var j = i - 1
        while (j >= 0 && !(s.charAt(j) == '\'' && (j == 0 || s.charAt(j - 1) != '\\'))) j -= 1
        j
      case c if c.isLetterOrDigit || c == '_' =>
        var j = i
        while (j >= 0 && (s.charAt(j).isLetterOrDigit || s.charAt(j) == '_' || s.charAt(j) == '.')) j -= 1
        j + 1
      case _ => i + 1
    }
  }
}

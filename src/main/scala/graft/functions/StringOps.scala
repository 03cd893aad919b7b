package graft.functions

import java.util.regex.Pattern

import org.apache.spark.unsafe.types.UTF8String

/** Static string helpers invoked from Catalyst via `StaticInvoke` — the
  * call compiles into whole-stage codegen as a single static call, so the
  * replace family stays inside the generated loop without a bespoke
  * Expression per spelling.
  *
  * Semantics follow the reference's replace family
  * (/root/reference/src/Functions/replaceRegexpOne.cpp, replaceOne.cpp):
  * "-One" variants rewrite only the first occurrence, and regexp
  * replacement strings use ClickHouse's `\1`-style backreferences, which
  * [[chReplacement]] converts to Java's `$1` form (escaping literal `$`).
  */
object StringOps {

  /** Last-compiled-pattern cache: the pattern argument is a constant in
    * virtually every query, so each task thread compiles once.
    */
  private val lastPattern = new ThreadLocal[(String, Pattern)]

  private def compiled(regex: String): Pattern = {
    val cached = lastPattern.get()
    if (cached != null && cached._1 == regex) cached._2
    else {
      val p = Pattern.compile(regex)
      lastPattern.set((regex, p))
      p
    }
  }

  /** Convert a ClickHouse replacement string (`\1` backrefs) to Java's
    * (`$1`), escaping `$` and preserving other backslash escapes.
    */
  def chReplacement(r: UTF8String): UTF8String = {
    val s = r.toString
    val sb = new java.lang.StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '$') sb.append("\\$")
      else if (c == '\\' && i + 1 < s.length) {
        val n = s.charAt(i + 1)
        if (n >= '0' && n <= '9') sb.append('$').append(n)
        else sb.append('\\').append(n)
        i += 1
      } else sb.append(c)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** replaceRegexpOne: rewrite only the FIRST regexp match. */
  def replaceRegexpOne(s: UTF8String, regex: UTF8String, rep: UTF8String): UTF8String =
    UTF8String.fromString(
      compiled(regex.toString).matcher(s.toString)
        .replaceFirst(chReplacement(rep).toString))

  /** replaceOne: rewrite only the first occurrence of a literal needle
    * (empty needle returns the subject unchanged, like the reference).
    */
  def replaceOne(s: UTF8String, find: UTF8String, rep: UTF8String): UTF8String = {
    if (find.numBytes() == 0) return s
    val str = s.toString
    val idx = str.indexOf(find.toString)
    if (idx < 0) s
    else UTF8String.fromString(
      str.substring(0, idx) + rep.toString + str.substring(idx + find.toString.length))
  }
  /** extractTextFromHTML (reference src/Functions/extractTextFromHTML
    * .cpp — original Scala implementation of its documented rules):
    * comments (`<!-- -->`) removed; CDATA pasted verbatim; `script` /
    * `style` elements removed with content (CDATA inside shields their
    * closing tags); other tags dropped keeping inner text; whitespace
    * trimmed/collapsed, with a single space inserted where elements
    * separated text.
    */
  def extractTextFromHtml(in: UTF8String): UTF8String = {
    val s = in.toString
    val n = s.length
    val out = new java.lang.StringBuilder(n)
    var i = 0

    def isWs(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' ||
        c == 0x0b.toChar

    def startsWithAt(k: Int, p: String): Boolean =
      k + p.length < n && s.regionMatches(k, p, 0, p.length)

    // copy text up to the next '<', collapsing whitespace; returns new i
    def copyText(k0: Int): Int = {
      var k = k0
      while (k < n && isWs(s.charAt(k))) k += 1
      var lt = k
      while (lt < n && s.charAt(lt) != '<') lt += 1
      val needsSpace = out.length() > 0 && out.charAt(out.length() - 1) != ' '
      if (needsSpace && k < lt) out.append(' ')
      var continue = true
      while (continue) {
        var ws = k
        while (ws < lt && !isWs(s.charAt(ws))) ws += 1
        out.append(s, k, ws)
        k = ws
        while (k < lt && isWs(s.charAt(k))) k += 1
        if (k < lt) out.append(' ') else continue = false
      }
      lt
    }

    // `<!--` comment: skip to the first `-->`-terminated '>'
    def processComment(k0: Int): Int = {
      if (!startsWithAt(k0, "<!--")) return -1
      var k = k0 + 4
      while (k < n) {
        if (s.charAt(k) == '>') {
          if (k >= k0 + 4 + 2 && s.charAt(k - 1) == '-' && s.charAt(k - 2) == '-')
            return k + 1
        }
        k += 1
      }
      n
    }

    // `<![CDATA[`: paste verbatim to `]]>`; emit=false inside script/style
    def processCdata(k0: Int, emit: Boolean): Int = {
      if (!startsWithAt(k0, "<![CDATA[")) return -1
      var k = k0 + 9
      while (k < n) {
        if (s.charAt(k) == '>' && k >= 2 &&
            s.charAt(k - 1) == ']' && s.charAt(k - 2) == ']') {
          if (emit) out.append(s, k0 + 9, k - 2)
          return k + 1
        }
        k += 1
      }
      if (emit) out.append(s, k0 + 9, n)
      n
    }

    // <script …>…</script> / <style …>…</style> removed with content
    def processElement(k0: Int, tag: String): Int = {
      if (k0 >= n || s.charAt(k0) != '<') return -1
      var k = k0 + 1
      if (!startsWithAt(k, tag)) return -1
      k += tag.length
      if (k >= n) return -1
      if (!(isWs(s.charAt(k)) || s.charAt(k) == '>')) return -1
      while (k < n && s.charAt(k) != '>') k += 1
      if (k >= n) return n
      k += 1
      while (k < n) {
        while (k < n && s.charAt(k) != '<') k += 1
        if (k + 1 >= n) return n
        if (s.charAt(k + 1) == '!') {
          val c = processCdata(k, emit = false)
          if (c >= 0) { k = c } else k += 1
        } else if (s.charAt(k + 1) != '/') {
          k += 1
        } else {
          var m = k + 2
          if (startsWithAt(m, tag) || (m + tag.length == n &&
              s.regionMatches(m, tag, 0, tag.length))) {
            m += tag.length
            while (m < n && isWs(s.charAt(m))) m += 1
            if (m >= n) return n
            if (s.charAt(m) == '>') return m + 1
            k = m
          } else k += 2
        }
      }
      n
    }

    def skipTag(k0: Int): Int = {
      if (k0 < n && s.charAt(k0) == '<') {
        var k = k0
        while (k < n && s.charAt(k) != '>') k += 1
        if (k < n) k + 1 else n
      } else -1
    }

    while (i < n) {
      i = copyText(i)
      if (i < n) {
        var nx = processComment(i)
        if (nx < 0) nx = processCdata(i, emit = true)
        if (nx < 0) nx = processElement(i, "script")
        if (nx < 0) nx = processElement(i, "style")
        if (nx < 0) nx = skipTag(i)
        if (nx < 0) nx = i + 1
        i = nx
      }
    }
    UTF8String.fromString(out.toString)
  }

  /** repeat with the reference's upfront size guard (reference
    * src/Functions/repeat.cpp:36-39: result size above 1 GiB throws
    * TOO_LARGE_STRING_SIZE BEFORE allocating) — Spark's builtin
    * allocates first, which turns the reference's clean error into an
    * uncontrolled OOM on adversarial counts.
    */
  def chRepeat(s: UTF8String, n: Long): UTF8String = {
    if (s == null) return null
    val times = math.max(n, 0L)
    val total = s.numBytes().toLong * times
    if (total > (1L << 30)) throw new RuntimeException(
      s"Too large string size ($total) in function repeat, " +
        s"maximum is: ${1L << 30}")
    if (times == 0L) UTF8String.EMPTY_UTF8 else s.repeat(times.toInt)
  }

  /** CH char(n1, n2, …): one BYTE per argument (UTF-8 sequences can be
    * spelled byte-wise — reference src/Functions/char.cpp), unlike
    * Spark's codepoint chr.
    */
  def chChar(ns: org.apache.spark.sql.catalyst.util.ArrayData): UTF8String = {
    if (ns == null) return null
    val bytes = new Array[Byte](ns.numElements())
    var i = 0
    while (i < bytes.length) {
      bytes(i) = (ns.getInt(i) & 0xFF).toByte
      i += 1
    }
    UTF8String.fromBytes(bytes)
  }

  /** visitParamExtractRaw / simpleJSONExtractRaw: find `"name":` and
    * return the RAW bytes of the value — whitespace after the colon
    * included, string escapes untouched — scanning with a bracket/quote
    * stack until `,` or `}` at depth 0 (reference
    * src/Functions/visitParamExtractRaw.cpp:13-55; the needle is built
    * as `"name":` in FunctionsVisitParam.h:105). Missing key or
    * unterminated value extracts as ''.
    */
  def visitParamRaw(json: UTF8String, name: UTF8String): UTF8String = {
    if (json == null || name == null) return null
    val s = json.toString
    val needle = "\"" + name.toString + "\":"
    val at = s.indexOf(needle)
    if (at < 0) return UTF8String.EMPTY_UTF8
    val start = at + needle.length
    var i = start
    var stack = List.empty[Char]
    while (i < s.length) {
      val c = s.charAt(i)
      if (stack.nonEmpty && c == stack.head) stack = stack.tail
      else if (stack.headOption.contains('"')) {
        if (c == '\\' && i + 1 < s.length && s.charAt(i + 1) == '"') i += 1
      } else c match {
        case '[' => stack = ']' :: stack
        case '{' => stack = '}' :: stack
        case '"' => stack = '"' :: stack
        case ',' | '}' if stack.isEmpty =>
          return UTF8String.fromString(s.substring(start, i))
        case _ => ()
      }
      i += 1
    }
    // value runs to end-of-string (visitParam scans bare `"k":v` text
    // with no enclosing braces — 00962)
    if (stack.isEmpty) UTF8String.fromString(s.substring(start))
    else UTF8String.EMPTY_UTF8
  }


  /** visitParam numeric/string extraction — the reference's byte scan
    * (FunctionsVisitParam.h readIntTextUnsafe / readFloatText /
    * parseJSONString), NOT a JSON parser: leading digits parse, '-' on
    * the unsigned form reads 0, a value that is not a quoted string
    * extracts as ''. Works on bare `"k":v` text with no braces (00962).
    */
  private def leadingLong(s: String, allowNeg: Boolean): Long = {
    if (s == null) return 0L
    var i = 0; var neg = false
    if (i < s.length && s.charAt(i) == '-') {
      if (!allowNeg) return 0L
      neg = true; i += 1
    } else if (i < s.length && s.charAt(i) == '+') i += 1
    var v = 0L; var any = false
    while (i < s.length && s.charAt(i).isDigit) {
      v = v * 10 + (s.charAt(i) - '0'); i += 1; any = true
    }
    if (!any) 0L else if (neg) -v else v
  }

  def visitParamInt(json: UTF8String, name: UTF8String): Long = {
    val r = visitParamRaw(json, name)
    if (r == null) 0L else leadingLong(r.toString, allowNeg = true)
  }

  def visitParamUInt(json: UTF8String, name: UTF8String): Long = {
    val r = visitParamRaw(json, name)
    if (r == null) 0L else leadingLong(r.toString, allowNeg = false)
  }

  def visitParamFloat(json: UTF8String, name: UTF8String): Double = {
    val r = visitParamRaw(json, name)
    if (r == null) return 0.0
    val m = """^[+-]?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?"""
      .r.findFirstIn(r.toString)
    m.flatMap(_.toDoubleOption).getOrElse(0.0)
  }

  def visitParamStringScan(json: UTF8String, name: UTF8String): UTF8String = {
    val r = visitParamRaw(json, name)
    if (r == null) return UTF8String.EMPTY_UTF8
    val s = r.toString
    if (!s.startsWith("\"")) return UTF8String.EMPTY_UTF8
    val sb = new StringBuilder
    var i = 1
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '"') return UTF8String.fromString(sb.toString)
      else if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '"' => sb.append('"')
          case '\\' => sb.append('\\')
          case '/' => sb.append('/')
          case 'n' => sb.append('\n')
          case 'r' => sb.append('\r')
          case 't' => sb.append('\t')
          case 'b' => sb.append('\b')
          case 'f' => sb.append('\f')
          case 'u' if i + 5 < s.length =>
            try {
              sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
              i += 4
            } catch { case _: Exception => () }
          case other => sb.append(other)
        }
        i += 2
      } else { sb.append(c); i += 1 }
    }
    UTF8String.EMPTY_UTF8 // unterminated string parses as nothing
  }

  /** MySQL FORMAT(x, d): thousands grouping, HALF_UP at d decimals. */
  def mysqlFormat(x: Double, d: Int): org.apache.spark.unsafe.types.UTF8String = {
    val dd = math.max(0, math.min(30, d))
    org.apache.spark.unsafe.types.UTF8String.fromString(
      String.format(java.util.Locale.ROOT, s"%,.${dd}f",
        java.lang.Double.valueOf(x)))
  }

  /** Locale collation sort key (`ORDER BY s COLLATE 'ru'` — reference
    * Collator.cpp wraps ICU; the JDK's CLDR-backed Collator produces the
    * same order for the corpus locales). Collator is not thread-safe:
    * cached per locale, key extraction synchronized per collator.
    */
  private val collators =
    new java.util.concurrent.ConcurrentHashMap[String, java.text.Collator]()
  def collationKey(s: UTF8String, loc: UTF8String): Array[Byte] = {
    if (s == null) return null
    val c = collators.computeIfAbsent(loc.toString, l =>
      java.text.Collator.getInstance(java.util.Locale.forLanguageTag(l)))
    c.synchronized { c.getCollationKey(s.toString).toByteArray }
  }

  /** leftPad/rightPad count BYTES (reference src/Functions/padString.cpp
    * non-UTF8 registration) — truncate or cycle the pad string at the
    * byte level; the UTF8 spellings are Spark's native char-based pads.
    */
  def padBytes(str: org.apache.spark.unsafe.types.UTF8String, len: Int,
      pad: org.apache.spark.unsafe.types.UTF8String, left: Boolean)
      : org.apache.spark.unsafe.types.UTF8String = {
    val sb = str.getBytes
    val n = math.max(len, 0)
    if (sb.length >= n)
      return org.apache.spark.unsafe.types.UTF8String
        .fromBytes(java.util.Arrays.copyOfRange(sb, 0, n))
    val pb = pad.getBytes
    val out = new Array[Byte](n)
    val fill = n - sb.length
    if (left) {
      var i = 0
      while (i < fill) { out(i) = if (pb.length == 0) ' '.toByte else pb(i % pb.length); i += 1 }
      System.arraycopy(sb, 0, out, fill, sb.length)
    } else {
      System.arraycopy(sb, 0, out, 0, sb.length)
      var i = 0
      while (i < fill) { out(sb.length + i) = if (pb.length == 0) ' '.toByte else pb(i % pb.length); i += 1 }
    }
    org.apache.spark.unsafe.types.UTF8String.fromBytes(out)
  }
}

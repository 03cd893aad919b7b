package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** normalizeQuery / normalizeQueryKeepNames (reference
  * src/Parsers/queryNormalization.h): lex the query, replace literals
  * with `?`, coalesce comma-separated literal runs to `?..`, collapse
  * whitespace/comments to one space, and (unless keep_names) replace
  * "complex" identifiers — whitespace inside, more than two digits, or
  * 36+ bytes (UUIDs) — with `?`. The hash variants fold the same token
  * stream (equality classes match the text form, which is all the
  * reference's own tests assert), so they ride sipHash64 of the text.
  */
object QueryNormalize {

  def normalize(q: UTF8String, keepNames: Boolean): UTF8String =
    UTF8String.fromString(normalize(q.toString, keepNames))

  def normalizedHash(q: UTF8String, keepNames: Boolean): Long =
    HashOps.sipHash64(normalize(q.toString, keepNames).getBytes("UTF-8"))

  def normalize(q: String, keepNames: Boolean): String = {
    val out = new StringBuilder
    var numLiterals = 0
    var prevComma = false
    var prevWhitespace = false
    var prevInsignificant = false
    var i = 0
    val n = q.length

    def flushSeparators(): Unit = {
      if (numLiterals > 1) out.append("..")
      if (prevComma) out.append(',')
      if (prevWhitespace) out.append(' ')
      numLiterals = 0
      prevComma = false
      prevWhitespace = false
    }

    while (i < n) {
      val c = q.charAt(i)
      // --- insignificant: whitespace and comments -> one space
      if (c.isWhitespace ||
          (c == '-' && i + 1 < n && q.charAt(i + 1) == '-') ||
          (c == '/' && i + 1 < n && q.charAt(i + 1) == '*')) {
        val start = i
        if (c.isWhitespace) { while (i < n && q.charAt(i).isWhitespace) i += 1 }
        else if (c == '-') { while (i < n && q.charAt(i) != '\n') i += 1 }
        else {
          i += 2
          while (i + 1 < n && !(q.charAt(i) == '*' && q.charAt(i + 1) == '/')) i += 1
          i = math.min(i + 2, n)
        }
        if (!prevInsignificant) {
          if (numLiterals == 0) { if (start != 0) out.append(' ') }
          else prevWhitespace = true
        }
        prevInsignificant = true
      } else {
        prevInsignificant = false
        if (c.isDigit || (c == '.' && i + 1 < n && q.charAt(i + 1).isDigit)) {
          // number literal
          while (i < n && (q.charAt(i).isLetterOrDigit || q.charAt(i) == '.' ||
            ((q.charAt(i) == '+' || q.charAt(i) == '-') && i > 0 &&
              (q.charAt(i - 1) == 'e' || q.charAt(i - 1) == 'E')))) i += 1
          if (numLiterals == 0) out.append('?')
          numLiterals += 1
          prevComma = false
          prevWhitespace = false
        } else if (c == '\'') {
          i += 1
          while (i < n && q.charAt(i) != '\'') {
            if (q.charAt(i) == '\\') i += 1
            i += 1
          }
          i = math.min(i + 1, n)
          if (numLiterals == 0) out.append('?')
          numLiterals += 1
          prevComma = false
          prevWhitespace = false
        } else if (c == ',') {
          if (numLiterals > 0) prevComma = true
          else { flushSeparators(); out.append(',') }
          i += 1
        } else if (c == '`' || c == '"') {
          val quote = c
          val start = i
          i += 1
          while (i < n && q.charAt(i) != quote) i += 1
          i = math.min(i + 1, n)
          flushSeparators()
          val inner = q.substring(start + 1, math.max(start + 1, i - 1))
          if (keepNames || !isComplexIdent(inner))
            out.append(q.substring(start, i))
          else out.append("`?`") // complex idents always replace as `?`
        } else if (c.isLetter || c == '_') {
          val start = i
          while (i < n && (q.charAt(i).isLetterOrDigit || q.charAt(i) == '_')) i += 1
          val word = q.substring(start, i)
          val isFunction = i < n && q.charAt(i) == '('
          flushSeparators()
          if (keepNames || isFunction || !isComplexIdent(word)) out.append(word)
          else out.append("`?`")
        } else {
          flushSeparators()
          out.append(c)
          i += 1
        }
      }
    }
    if (numLiterals > 1) out.append("..")
    if (prevComma) out.append(',')
    if (prevWhitespace) out.append(' ')
    out.toString
  }

  /** "Complex" = contains whitespace, more than two digits, or is 36+
    * bytes long (a UUID, say).
    */
  private def isComplexIdent(s: String): Boolean = {
    if (s.length >= 36) return true
    var digits = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c.isWhitespace) return true
      if (c.isDigit) { digits += 1; if (digits > 2) return true }
      i += 1
    }
    false
  }
}

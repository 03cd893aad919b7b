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
}

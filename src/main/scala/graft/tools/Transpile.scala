package graft.tools

/** Dev helper: print the Spark SQL the ChTranspiler produces for one
  * statement (arg 1, or stdin when no args) — the fastest way to see
  * what a corpus shape lowers to without running a sweep.
  */
object Transpile {
  def main(args: Array[String]): Unit = {
    val sql =
      if (args.nonEmpty) args.mkString(" ")
      else scala.io.Source.stdin.mkString
    println(graft.sql.ChTranspiler.transpile(sql))
  }
}

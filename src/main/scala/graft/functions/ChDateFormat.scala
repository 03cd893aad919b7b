package graft.functions

import java.time.{LocalDateTime, ZoneOffset}
import java.time.temporal.{IsoFields, WeekFields}

/** ClickHouse formatDateTime / FROM_UNIXTIME specifier engine
  * (reference src/Functions/formatDateTime.cpp, the pre-MySQL-compat
  * table: %M is the MINUTE, %c the month number). Pure JVM, invoked
  * from codegen via StaticInvoke; the input is epoch MICROseconds of
  * the (already timezone-shifted) wall-clock value.
  */
object ChDateFormat {

  private val dowAbbrev = Array("Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun")
  private val dowFull = Array("Monday", "Tuesday", "Wednesday", "Thursday",
    "Friday", "Saturday", "Sunday")
  private val monAbbrev = Array("Jan", "Feb", "Mar", "Apr", "May", "Jun",
    "Jul", "Aug", "Sep", "Oct", "Nov", "Dec")

  /** StaticInvoke entry point (Catalyst strings are UTF8String). */
  def format(micros: Long, fmt: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.unsafe.types.UTF8String =
    org.apache.spark.unsafe.types.UTF8String.fromString(
      format(micros, fmt.toString))

  def format(micros: Long, fmt: String): String = {
    val t = LocalDateTime.ofEpochSecond(Math.floorDiv(micros, 1000000L),
      (Math.floorMod(micros, 1000000L) * 1000L).toInt, ZoneOffset.UTC)
    val sb = new StringBuilder
    def p2(v: Int): String = f"$v%02d"
    val hour12 = { val h = t.getHour % 12; if (h == 0) 12 else h }
    var i = 0
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '%' && i + 1 < fmt.length) {
        fmt.charAt(i + 1) match {
          case '%' => sb.append('%')
          case 'a' => sb.append(dowAbbrev(t.getDayOfWeek.getValue - 1))
          case 'b' => sb.append(monAbbrev(t.getMonthValue - 1))
          case 'c' => sb.append(p2(t.getMonthValue))
          case 'C' => sb.append(p2(t.getYear / 100))
          case 'd' => sb.append(p2(t.getDayOfMonth))
          case 'D' => sb.append(p2(t.getMonthValue)).append('/')
            .append(p2(t.getDayOfMonth)).append('/').append(p2(t.getYear % 100))
          case 'e' => sb.append(f"${t.getDayOfMonth}%2d")
          case 'f' => sb.append(f"${t.getNano / 1000}%06d")
          case 'F' => sb.append(f"${t.getYear}%04d-").append(p2(t.getMonthValue))
            .append('-').append(p2(t.getDayOfMonth))
          case 'g' => sb.append(p2(t.get(IsoFields.WEEK_BASED_YEAR) % 100))
          case 'G' => sb.append(f"${t.get(IsoFields.WEEK_BASED_YEAR)}%04d")
          case 'h' | 'I' | 'l' => sb.append(p2(hour12))
          case 'H' | 'k' => sb.append(p2(t.getHour))
          case 'i' | 'M' => sb.append(p2(t.getMinute))
          case 'j' => sb.append(f"${t.getDayOfYear}%03d")
          case 'm' => sb.append(p2(t.getMonthValue))
          case 'n' => sb.append('\n')
          case 'p' => sb.append(if (t.getHour < 12) "AM" else "PM")
          case 'Q' => sb.append((t.getMonthValue + 2) / 3)
          case 'r' => sb.append(p2(hour12)).append(':').append(p2(t.getMinute))
            .append(' ').append(if (t.getHour < 12) "AM" else "PM")
          case 'R' => sb.append(p2(t.getHour)).append(':').append(p2(t.getMinute))
          case 'S' => sb.append(p2(t.getSecond))
          case 't' => sb.append('\t')
          case 'T' => sb.append(p2(t.getHour)).append(':')
            .append(p2(t.getMinute)).append(':').append(p2(t.getSecond))
          case 'u' => sb.append(t.getDayOfWeek.getValue)
          case 'V' => sb.append(p2(t.get(WeekFields.ISO.weekOfWeekBasedYear())))
          case 'w' => sb.append(t.getDayOfWeek.getValue % 7)
          case 'W' => sb.append(dowFull(t.getDayOfWeek.getValue - 1))
          case 'y' => sb.append(p2(t.getYear % 100))
          case 'Y' => sb.append(f"${t.getYear}%04d")
          case other => throw new IllegalArgumentException(
            s"formatDateTime: unsupported specifier %$other")
        }
        i += 2
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}

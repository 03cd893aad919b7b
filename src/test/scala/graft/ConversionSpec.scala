package graft

/** Unit gates for the typed conversion matrix (to<T>/OrZero/OrNull/
  * OrDefault, reference FunctionsConversion.h) and the parseDateTime*
  * chain (reference parseDateTimeBestEffort).
  */
class ConversionSpec extends SparkSpec {

  private def one(expr: String): Any = spark.sql(s"SELECT $expr").head.get(0)

  test("typed casts: plain, OrZero, OrNull, OrDefault") {
    assert(one("toInt32('42')") === 42)
    assert(one("toInt64('9000000000')") === 9000000000L)
    assert(one("toUInt16(65000)") === 65000)
    assert(one("toFloat64('2.5')") === 2.5)
    assert(one("toInt32OrZero('abc')") === 0)
    assert(one("toInt32OrZero('7')") === 7)
    assert(one("toInt32OrNull('abc')") === null)
    assert(one("toInt32OrDefault('abc', 99)") === 99)
    assert(one("toFloat32OrNull('x')") === null)
    assert(one("toDateOrZero('nope')").toString === "1970-01-01")
    assert(one("toDate32('2024-02-29')").toString === "2024-02-29")
    assert(one("toDateTimeOrNull('bad')") === null)
    // 128/256-bit widths cap at Decimal(38,0)
    assert(one("toInt128('123456789012345678901234567')").toString ===
      "123456789012345678901234567")
    assert(one("toUInt256OrZero('zzz')").toString === "0")
  }

  test("parseDateTimeBestEffort: layout chain") {
    def ts(e: String): String = String.valueOf(one(e))
    assert(ts("parseDateTimeBestEffort('2023-04-05 06:07:08')")
      .startsWith("2023-04-05 06:07:08"))
    assert(ts("parseDateTimeBestEffort('2023-04-05T06:07:08Z')")
      .startsWith("2023-04-05 06:07:08"))
    // day-first vs the US month-first spelling
    assert(ts("parseDateTimeBestEffort('03/04/2023')").startsWith("2023-04-03"))
    assert(ts("parseDateTimeBestEffortUS('03/04/2023')").startsWith("2023-03-04"))
    // unix seconds, compact, dotted, RFC-1123
    assert(ts("parseDateTimeBestEffort('1680674828')").startsWith("2023-04-05"))
    assert(ts("parseDateTimeBestEffort('20230405')").startsWith("2023-04-05"))
    assert(ts("parseDateTimeBestEffort('05.04.2023')").startsWith("2023-04-05"))
    assert(ts("parseDateTimeBestEffort('Wed, 05 Apr 2023 06:07:08 GMT')")
      .startsWith("2023-04-05 06:07:08"))
    // failure modes
    assert(one("parseDateTimeBestEffortOrNull('not a date')") === null)
    assert(String.valueOf(one("parseDateTimeBestEffortOrZero('not a date')"))
      .startsWith("1970-01-01"))
  }

  test("parseDateTime with reference %-format and Joda syntax") {
    assert(String.valueOf(one("parseDateTime('2023*04*05', '%Y*%m*%d')"))
      .startsWith("2023-04-05"))
    assert(String.valueOf(one(
      "parseDateTimeInJodaSyntax('05/2023-April', 'dd/yyyy-MMMM')"))
      .startsWith("2023-04-05"))
    assert(one("parseDateTimeOrNull('xx', '%Y')") === null)
  }
}

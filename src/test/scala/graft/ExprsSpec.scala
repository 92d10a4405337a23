package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Exprs

class ExprsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column): T =
    spark.range(1).select(c.as("v")).collect()(0).getAs[T]("v")

  test("excelSerialToDate: 1900 leap-bug boundary (SURVEY.md §7.4-5)") {
    def f(n: Int): String = one[java.sql.Date](Exprs.excelSerialToDate(lit(n))).toString
    assert(f(1) == "1899-12-31")
    assert(f(59) == "1900-02-27")
    assert(f(60) == "1900-02-28")
    assert(f(61) == "1900-02-28") // >=61 adjusted down: skips the fake Feb 29
    assert(f(62) == "1900-03-01")
    assert(f(45000) == "2023-03-14")
  }

  test("excel fraction to minutes / HH:MM") {
    assert(one[Long](Exprs.excelFractionToMinutes(lit(0.5))) == 720L)
    assert(one[String](Exprs.minutesToHHMM(lit(390))) == "06:30")
    assert(one[String](Exprs.minutesToHHMM(lit(1439))) == "23:59")
  }

  test("round5MinUp: boundary minutes") {
    def f(s: String): String =
      one[java.sql.Timestamp](Exprs.round5MinUp(to_timestamp(lit(s)))).toString
    assert(f("2024-03-01 10:00:00") == "2024-03-01 10:00:00.0") // exact stays
    assert(f("2024-03-01 10:00:01") == "2024-03-01 10:05:00.0")
    assert(f("2024-03-01 10:04:59") == "2024-03-01 10:05:00.0")
    assert(f("2024-03-01 23:57:30") == "2024-03-02 00:00:00.0")
  }

  test("sameWeekdayCountInMonth across month shapes") {
    def f(d: String): Long =
      one[Long](Exprs.sameWeekdayCountInMonth(to_date(lit(d))))
    assert(f("2024-02-05") == 4) // Mondays in Feb 2024 (leap, 29d)
    assert(f("2024-02-29") == 5) // Thursdays in Feb 2024
    assert(f("2023-02-01") == 4) // Feb 2023: 28 days, every weekday 4x
    assert(f("2024-01-01") == 5) // Mondays in Jan 2024: 1,8,15,22,29
  }

  test("weekOfMonth") {
    def f(d: String): Int = one[Int](Exprs.weekOfMonth(to_date(lit(d))))
    assert(f("2024-05-01") == 1); assert(f("2024-05-07") == 1)
    assert(f("2024-05-08") == 2); assert(f("2024-05-31") == 5)
  }

  test("normalizeEs: accents, case, whitespace") {
    assert(one[String](Exprs.normalizeEs(lit("  JOSÉ   pérez ñandú "))) ==
      "JOSE PEREZ NANDU")
  }

  test("normalizePhone truth table (app_confirmaciones.py:213-224)") {
    def f(s: String): String = one[String](Exprs.normalizePhone(lit(s)))
    assert(f("3001234567.0") == "+573001234567") // 10-digit movil, float artifact
    assert(f("3001234567") == "+573001234567")
    assert(f("573001234567") == "+573001234567") // already prefixed
    assert(f("6011234") == "6011234") // fijo: kept as digits
    assert(f("nan") == null)
    assert(f("") == null)
  }

  test("duration hh:mm:ss to minutes") {
    assert(one[Double](Exprs.durationToMinutes(lit("01:30:30"))) == 90.5)
    assert(one[Double](Exprs.durationToMinutes(lit("00:04:00"))) == 4.0)
  }

  test("parseSpanishDate (app_confirmaciones.py:62-102)") {
    def f(s: String): String = {
      val d = one[java.sql.Date](Exprs.parseSpanishDate(lit(s)))
      if (d == null) null else d.toString
    }
    assert(f("5 de mayo de 2024") == "2024-05-05")
    assert(f("lunes, 3 de enero de 2022") == "2022-01-03")
    assert(f("MIÉRCOLES, 25 de diciembre de 2024") == "2024-12-25")
    assert(f("not a date") == null)
  }

  test("parseTimestampDefault format ladder") {
    def f(s: String): java.sql.Timestamp =
      one[java.sql.Timestamp](Exprs.parseTimestampDefault(lit(s)))
    assert(f("2024-03-01 10:30:00").toString == "2024-03-01 10:30:00.0")
    assert(f("31/12/2024 10:30").toString == "2024-12-31 10:30:00.0")
    assert(f("31/12/2024").toString == "2024-12-31 00:00:00.0")
    assert(f("garbage") == null)
  }

  test("spanish names + weekday ordering") {
    assert(one[String](Exprs.spanishDayName(to_date(lit("2024-01-01")))) == "lunes")
    assert(one[String](Exprs.spanishMonthName(to_date(lit("2024-05-01")))) == "mayo")
    assert(one[Int](Exprs.weekdayMondayFirst(to_date(lit("2024-01-01")))) == 1)
    assert(one[Int](Exprs.weekdayMondayFirst(to_date(lit("2024-01-07")))) == 7)
  }

  test("isBlank collapses pandas-style null spellings") {
    val df = Seq(("nan"), (""), ("  "), ("None"), ("x")).toDF("c")
    assert(df.filter(Exprs.isBlank(col("c"))).count() == 4)
  }

  test("minPositive") {
    val df = Seq((0.05, 0.02), (0.0, 0.03), (0.0, 0.0)).toDF("a", "b")
    val got = df.select(Exprs.minPositive(col("a"), col("b")).as("m"))
      .collect().map(r => Option(r.get(0)))
    assert(got.toSeq == Seq(Some(0.02), Some(0.03), None))
  }
}

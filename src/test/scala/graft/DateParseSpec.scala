package graft

import org.apache.spark.sql.functions._
import graft.validate.Rules

/** F4 — the multi-format date parser (reference ETL/validation.py:89-103):
  * four accepted formats, everything else null. Mirrors the injector's bad
  * formats (reference OLTP/scripts/generate_invalid.py:293-319).
  */
class DateParseSpec extends SparkSpec {
  import spark.implicits._

  private def parse(s: Seq[String]): Seq[Option[String]] =
    s.toDF("d")
      .select(date_format(Rules.parseMultiDate(col("d")), "yyyy-MM-dd").as("p"))
      .collect().toSeq.map(r => Option(r.getString(0)))

  test("accepts ISO yyyy-MM-dd, padded and not") {
    assert(parse(Seq("2024-03-07", "2024-3-7")) ===
      Seq(Some("2024-03-07"), Some("2024-03-07")))
  }

  test("accepts slash format yyyy/M/d") {
    assert(parse(Seq("2024/03/07", "2024/3/7")) ===
      Seq(Some("2024-03-07"), Some("2024-03-07")))
  }

  test("accepts ISO timestamp by truncating at T") {
    assert(parse(Seq("2024-03-07T15:42:11")) === Seq(Some("2024-03-07")))
  }

  test("accepts compact yyyyMMdd") {
    assert(parse(Seq("20240307")) === Seq(Some("2024-03-07")))
  }

  test("rejects the injector's bad formats and impossible dates") {
    val bad = Seq("07-03-2024", "03/07/2024x", "garbage", "2024-13-45",
      "20241345", "", null)
    assert(parse(bad).forall(_.isEmpty))
  }

  test("rejects month/day overflow in every accepted format") {
    assert(parse(Seq("2024-02-30", "2024/2/30", "20240230")).forall(_.isEmpty))
  }

  test("property: every date 1990..2030 round-trips through all four formats") {
    // exhaustive sweep beats sampling: all (year, month, day<=28) cells,
    // rendered in each accepted format, must parse back to the same date
    val days = spark.range(0, 41L * 372).select(
      (col("id") / 372 + 1990).cast("int").as("y"),
      ((col("id") % 372) / 31 + 1).cast("int").as("m"),
      (col("id") % 31 + 1).cast("int").as("d"))
      .filter(col("d") <= 28)
    val iso = format_string("%04d-%02d-%02d", col("y"), col("m"), col("d"))
    val variants = Seq(
      iso,                                                   // padded ISO
      format_string("%d-%d-%d", col("y"), col("m"), col("d")),   // unpadded
      format_string("%04d/%02d/%02d", col("y"), col("m"), col("d")),
      format_string("%04d-%02d-%02dT12:34:56", col("y"), col("m"), col("d")),
      format_string("%04d%02d%02d", col("y"), col("m"), col("d")))
    variants.zipWithIndex.foreach { case (v, i) =>
      val bad = days.select(iso.as("expect"),
          date_format(Rules.parseMultiDate(v), "yyyy-MM-dd").as("got"))
        .filter(!(col("expect") <=> col("got"))).count()
      assert(bad === 0, s"variant $i mis-parsed $bad dates")
    }
  }
}

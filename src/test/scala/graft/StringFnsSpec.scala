package graft

import org.apache.spark.sql.{functions => F}
import java.sql.Date

/** String + temporal surface incl. the chrono→JVM format translator. */
class StringFnsSpec extends SparkSpec {
  import spark.implicits._

  test("chronoToJvm translates directives and quotes literals") {
    assert(StringFns.chronoToJvm("%Y-%m-%d") == "yyyy-MM-dd")
    assert(StringFns.chronoToJvm("%H:%M:%S") == "HH:mm:ss")
    assert(StringFns.chronoToJvm("%d/%b/%Y") == "dd/MMM/yyyy")
    assert(StringFns.chronoToJvm("at %H") == "'at 'HH")
    assert(StringFns.chronoToJvm("100%% %Y") == "100% yyyy")
    intercept[IllegalArgumentException](StringFns.chronoToJvm("%Q"))
  }

  test("strftime/strptime round trip") {
    val d = Seq(Date.valueOf("2024-03-15")).toDF("d")
      .select(StringFns.strftime(F.col("d"), "%d/%m/%Y").as("s"))
    assert(col1[String](d, "s") == Seq("15/03/2024"))
    val p = d.select(F.to_date(
      StringFns.strptime(F.col("s"), "%d/%m/%Y")).as("back"))
    assert(col1[Date](p, "back") == Seq(Date.valueOf("2024-03-15")))
  }

  test("substring with negative offset (reference series.ex:6057)") {
    val d = Seq("hello world").toDF("s").select(
      StringFns.substring(F.col("s"), 0, Some(5)).as("a"),
      StringFns.substring(F.col("s"), -5, None).as("b"),
      StringFns.substring(F.col("s"), 6, Some(5)).as("c"))
    val r = d.collect()(0)
    assert(r.getString(0) == "hello")
    assert(r.getString(1) == "world")
    assert(r.getString(2) == "world")
  }

  test("splitInto builds struct fields") {
    val d = Seq("a-b-c").toDF("s")
      .select(StringFns.splitInto(F.col("s"), "-", Seq("x", "y")).as("st"))
      .select("st.x", "st.y")
    val r = d.collect()(0)
    assert(r.getString(0) == "a" && r.getString(1) == "b")
  }

  test("reNamedCaptures with mixed named/unnamed groups") {
    val d = Seq("key=42;rest").toDF("s").select(
      StringFns.reNamedCaptures(F.col("s"),
        "(?<k>[a-z]+)=(\\d+)").as("st")).select("st.k")
    assert(col1[String](d, "k") == Seq("key"))
    val d2 = Seq("a1b22").toDF("s").select(
      StringFns.reNamedCaptures(F.col("s"),
        "([a-z])(?<num>\\d+)").as("st")).select("st.num")
    assert(col1[String](d2, "num") == Seq("1"))
  }

  test("countMatches literal and regex") {
    val d = Seq("aXbXcX").toDF("s").select(
      StringFns.countMatches(F.col("s"), "X").as("n"),
      StringFns.reCountMatches(F.col("s"), "[a-z]X").as("m"))
    val r = d.collect()(0)
    assert(r.getLong(0) == 3L && r.getInt(1) == 3)
  }

  test("strip/lstrip/rstrip with char sets") {
    val d = Seq("xxhelloxx", "  pad  ").toDF("s").select(
      StringFns.strip(F.col("s"), Some("x")).as("a"),
      StringFns.lstrip(F.col("s"), Some("x")).as("l"),
      StringFns.rstrip(F.col("s"), Some("x")).as("r"),
      StringFns.strip(F.col("s")).as("w"))
    val rows = d.collect()
    assert(rows(0).getString(0) == "hello")
    assert(rows(0).getString(1) == "helloxx")
    assert(rows(0).getString(2) == "xxhello")
    assert(rows(1).getString(3) == "pad")
  }

  test("reScan lists all matches") {
    val d = Seq("a1 b2 c3").toDF("s")
      .select(StringFns.reScan(F.col("s"), "[a-z]\\d").as("m"))
    assert(d.collect()(0).getSeq[String](0) == Seq("a1", "b2", "c3"))
  }

  test("temporal extractors: ISO weekday Mon=1, leap year, days in month") {
    val d = Seq(
      Date.valueOf("2024-01-01"), // Monday, leap year
      Date.valueOf("2023-02-15")  // Wednesday, non-leap
    ).toDF("d").select(
      TemporalFns.dayOfWeek(F.col("d")).as("dow"),
      TemporalFns.isLeapYear(F.col("d")).as("leap"),
      TemporalFns.daysInMonth(F.col("d")).as("dim"),
      TemporalFns.quarterOfYear(F.col("d")).as("q"))
    val rows = d.collect()
    assert(rows(0).getInt(0) == 1 && rows(1).getInt(0) == 3)
    assert(rows(0).getBoolean(1) && !rows(1).getBoolean(1))
    assert(rows(0).getInt(2) == 31 && rows(1).getInt(2) == 28)
    assert(rows(0).getInt(3) == 1 && rows(1).getInt(3) == 1)
  }

  test("toTime ns-since-midnight encoding (§1.2 time dtype)") {
    val d = Seq(java.sql.Timestamp.valueOf("2024-01-01 01:02:03.5")).toDF("t")
      .select(TemporalFns.toTime(F.col("t")).as("ns"))
    assert(col1[Long](d, "ns") ==
      Seq(((1 * 3600 + 2 * 60 + 3) * 1000000L + 500000L) * 1000L))
  }

  test("replace literal vs re_replace regex (series.ex replace/re_replace)") {
    val d = Seq("a.b.c").toDF("s").select(
      StringFns.replace(F.col("s"), ".", "-").as("lit"),
      StringFns.reReplace(F.col("s"), "[abc]", "x").as("re"))
    val r = d.collect()(0)
    assert(r.getString(0) == "a-b-c") // literal dot, not regex any-char
    assert(r.getString(1) == "x.x.x")
  }

  test("reNamedCaptures group indices survive non-capturing constructs " +
      "(inline flags, (?:...), lookaheads, parens in classes/escapes)") {
    val d = Seq("Foo 42").toDF("s")
    // '(?i)' and '(?:...)' contain '(' but open NO capturing group — a
    // paren count would address the wrong regexp_extract index
    val r = d.select(StringFns.reNamedCaptures(F.col("s"),
      "(?i)(?:fo+)\\s\\(?(?<num>[0-9]+)").as("m")).collect()(0).getStruct(0)
    assert(r.getString(0) == "42")
    val r2 = d.select(StringFns.reNamedCaptures(F.col("s"),
      "([A-Za-z]+)\\s(?=[0-9])(?<num>[0-9]+)").as("m"))
      .collect()(0).getStruct(0)
    assert(r2.getString(0) == "42")
  }

  test("splitInto fills nil for missing fields (try_element_at — plain " +
      "element_at aborts under an ANSI session)") {
    val d = Seq("a-b").toDF("s")
      .select(StringFns.splitInto(F.col("s"), "-",
        Seq("x", "y", "z")).as("st"))
    val r = d.select("st.x", "st.y", "st.z").collect()(0)
    assert(r.getString(0) == "a" && r.getString(1) == "b" && r.isNullAt(2))
  }

  test("strftime week-based directives %V/%u/%G are computed natively " +
      "(Spark's formatter refuses ww/e/YYYY)") {
    // 2024-12-30 is a Monday in ISO week 1 of week-based year 2025
    val d = Seq(java.sql.Date.valueOf("2024-12-30")).toDF("d")
    val r = d.select(
      StringFns.strftime(F.col("d"), "%G-W%V-%u").as("iso"),
      StringFns.strftime(F.col("d"), "%Y-%m-%d").as("plain"))
      .collect()(0)
    assert(r.getString(0) == "2025-W01-1", r.getString(0))
    assert(r.getString(1) == "2024-12-30")
    // parse direction has no JVM equivalent: clear refusal, not a cryptic
    // SparkUpgradeException at runtime
    val ex = intercept[IllegalArgumentException] {
      StringFns.chronoToJvm("%G-%V")
    }
    assert(ex.getMessage.contains("week-based"))
  }
}

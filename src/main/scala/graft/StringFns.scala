package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._

/** String operation surface (reference series.ex:5711-6295) plus the
  * strptime/strftime chrono-dialect translator (SURVEY §7.3): the reference
  * takes Rust-chrono format strings (`%Y-%m-%d`), Spark takes JVM
  * datetime patterns (`yyyy-MM-dd`). */
object StringFns {

  /** chrono → JVM datetime pattern. Covers the directives chrono documents
    * for strftime that have JVM equivalents; passthrough text is quoted. */
  def chronoToJvm(fmt: String): String = {
    val map = Map(
      'Y' -> "yyyy", 'y' -> "yy", 'm' -> "MM", 'd' -> "dd", 'e' -> "d",
      'H' -> "HH", 'I' -> "hh", 'M' -> "mm", 'S' -> "ss",
      'f' -> "SSSSSSSSS", 'p' -> "a", 'Z' -> "zzz", 'z' -> "xx",
      'j' -> "DDD", 'a' -> "EEE", 'A' -> "EEEE", 'b' -> "MMM",
      'B' -> "MMMM",
      'T' -> "HH:mm:ss", 'D' -> "MM/dd/yy", 'F' -> "yyyy-MM-dd",
      'R' -> "HH:mm")
    val out = new StringBuilder
    val lit = new StringBuilder
    def flush(): Unit = if (lit.nonEmpty) {
      val s = lit.toString
      out ++= (if (s.exists(_.isLetter)) "'" + s.replace("'", "''") + "'" else s)
      lit.clear()
    }
    var i = 0
    while (i < fmt.length) {
      if (fmt(i) == '%' && i + 1 < fmt.length) {
        val d = fmt(i + 1)
        if (d == '%') { lit += '%'; i += 2 }
        else map.get(d) match {
          case Some(j) => flush(); out ++= j; i += 2
          case None if d == 'G' || d == 'V' || d == 'u' =>
            // week-based JVM letters (Y/w/e) are REJECTED by Spark's
            // formatter since 3.0 — strftime computes these natively
            // (weekofyear / ISO weekday / week-based year) before this
            // translator ever sees them; a parse direction has no
            // equivalent, so fail with the reason instead of a cryptic
            // SparkUpgradeException at runtime
            throw new IllegalArgumentException(
              s"%$d is week-based: Spark's datetime formatter refuses " +
                "week-based patterns; supported in strftime (computed " +
                "natively), not in strptime")
          case None =>
            throw new IllegalArgumentException(s"unsupported directive %$d")
        }
      } else { lit += fmt(i); i += 1 }
    }
    flush()
    out.toString
  }

  /** `strptime` (series.ex:1117) — string → naive datetime. */
  def strptime(c: Column, chronoFmt: String): Column =
    F.to_timestamp(c, chronoToJvm(chronoFmt))

  /** `strftime` (series.ex:1145) — datetime → string. The week-based
    * directives %V (ISO week), %u (ISO weekday) and %G (ISO week-based
    * year) are computed natively and spliced between date_format segments:
    * Spark's formatter refuses their JVM letters (ww/e/YYYY) outright. */
  def strftime(c: Column, chronoFmt: String): Column = {
    // ISO weekday 1=Monday..7=Sunday from Spark's 1=Sunday..7=Saturday
    def isoDow = (F.dayofweek(c) + 5) % 7 + 1
    def spliced(d: Char): Column = d match {
      case 'V' => F.lpad(F.weekofyear(c).cast(StringType), 2, "0")
      case 'u' => isoDow.cast(StringType)
      // week-based year = calendar year of that ISO week's Thursday
      case 'G' => F.year(F.date_add(c, F.lit(4) - isoDow)).cast(StringType)
    }
    val parts = Seq.newBuilder[Column]
    val buf = new StringBuilder
    def flushFmt(): Unit = if (buf.nonEmpty) {
      parts += F.date_format(c, chronoToJvm(buf.toString)); buf.clear()
    }
    var i = 0
    while (i < chronoFmt.length) {
      if (chronoFmt(i) == '%' && i + 1 < chronoFmt.length &&
          "GVu".contains(chronoFmt(i + 1))) {
        flushFmt(); parts += spliced(chronoFmt(i + 1)); i += 2
      } else if (chronoFmt(i) == '%' && i + 1 < chronoFmt.length) {
        buf += '%'; buf += chronoFmt(i + 1); i += 2
      } else { buf += chronoFmt(i); i += 1 }
    }
    flushFmt()
    val ps = parts.result()
    if (ps.isEmpty) F.lit("")
    else if (ps.size == 1) ps.head
    else F.concat(ps: _*)
  }

  /** `split_into(by, fields)` → struct (series.ex:6140). Missing fields
    * fill nil like the reference — try_element_at, because under an
    * ANSI-enabled session plain element_at ABORTS on a string with fewer
    * pieces than fields. */
  def splitInto(c: Column, by: String, fields: Seq[String]): Column = {
    val arr = F.split(c, java.util.regex.Pattern.quote(by))
    F.struct(fields.zipWithIndex.map { case (f, i) =>
      F.try_element_at(arr, F.lit(i + 1)).as(f) }: _*)
  }

  /** `re_named_captures` → struct of named groups (series.ex:6282). Group
    * names are parsed from the pattern at the facade, like the reference.
    *
    * Group INDICES come from a real scan, not a count of '(' characters:
    * non-capturing groups `(?:`, inline flags `(?i)`, lookarounds, escaped
    * parens and parens inside character classes all contain '(' without
    * opening a capturing group — a naive count shifts every index after
    * them and regexp_extract then returns the WRONG group's text (or
    * errors on an out-of-range index). Capturing = bare '(' or a named
    * group `(?<name>` (which Java numbers like any other group). */
  def reNamedCaptures(c: Column, pattern: String): Column = {
    var idx = 0
    val named = Seq.newBuilder[(String, Int)]
    var i = 0
    var inClass = false
    while (i < pattern.length) {
      pattern(i) match {
        case '\\' => i += 1 // escaped char: skip it
        case '[' if !inClass => inClass = true
        case ']' if inClass => inClass = false
        case '(' if !inClass =>
          if (i + 1 >= pattern.length || pattern(i + 1) != '?') idx += 1
          else if (i + 3 < pattern.length && pattern(i + 2) == '<' &&
              pattern(i + 3) != '=' && pattern(i + 3) != '!') {
            idx += 1 // named group — capturing, unlike (?<= / (?<!
            val end = pattern.indexOf('>', i + 3)
            if (end > 0) named += pattern.substring(i + 3, end) -> idx
          }
        case _ =>
      }
      i += 1
    }
    F.struct(named.result().map { case (n, g) =>
      F.regexp_extract(c, pattern, g).as(n) }: _*)
  }

  /** `format(list)` — string concat of columns/literals (query.ex:646-685). */
  def format(parts: Seq[Column]): Column = F.concat(parts: _*)

  /** `strip/lstrip/rstrip` with optional character set
    * (reference series.ex:5909-6032; default = whitespace). */
  def strip(c: Column, chars: Option[String] = None): Column =
    chars.map(ch => F.btrim(c, F.lit(ch))).getOrElse(F.trim(c))
  def lstrip(c: Column, chars: Option[String] = None): Column =
    chars.map(ch => F.ltrim(c, ch)).getOrElse(F.ltrim(c))
  def rstrip(c: Column, chars: Option[String] = None): Column =
    chars.map(ch => F.rtrim(c, ch)).getOrElse(F.rtrim(c))

  /** `substring` with Explorer's negative-offset semantics
    * (series.ex:6057-6095): negative counts from the end. */
  def substring(c: Column, offset: Int, len: Option[Int] = None): Column = {
    val start =
      if (offset >= 0) F.lit(offset + 1)
      else F.greatest(F.length(c) + offset + 1, F.lit(1))
    val length = len.map(F.lit).getOrElse(F.length(c))
    F.substring(c, start, length)
  }

  /** `count_matches` for a literal substring (series.ex:6164). */
  /** `replace/3` — literal substring replace (series.ex). */
  def replace(c: Column, pat: String, rep: String): Column =
    F.replace(c, F.lit(pat), F.lit(rep))

  /** `re_replace/3` — regex replace (series.ex). */
  def reReplace(c: Column, pattern: String, rep: String): Column =
    F.regexp_replace(c, pattern, rep)

  def countMatches(c: Column, sub: String): Column =
    ((F.length(c) - F.length(F.replace(c, F.lit(sub), F.lit("")))) /
      sub.length).cast(LongType)

  /** `re_count_matches` (series.ex:6195). */
  def reCountMatches(c: Column, pattern: String): Column =
    F.regexp_count(c, F.lit(pattern))

  /** `re_scan` — all matches as a list (series.ex:6233). */
  def reScan(c: Column, pattern: String): Column =
    F.regexp_extract_all(c, F.lit(pattern), F.lit(0))
}

/** Temporal extractor surface (reference series.ex:6447-6792) with
  * Explorer's conventions where they differ from Spark's. */
object TemporalFns {
  /** Explorer day_of_week is ISO: Monday = 1 (series.ex:6479); Spark's
    * `dayofweek` is Sunday = 1, `weekday` is Monday = 0. */
  def dayOfWeek(c: Column): Column = F.weekday(c) + 1
  def dayOfMonth(c: Column): Column = F.dayofmonth(c)
  def dayOfYear(c: Column): Column = F.dayofyear(c)
  def weekOfYear(c: Column): Column = F.weekofyear(c)
  def month(c: Column): Column = F.month(c)
  def year(c: Column): Column = F.year(c)
  def isoYear(c: Column): Column = F.year(c) + F.when(
    F.weekofyear(c) >= 52 && F.month(c) === 1, -1)
    .when(F.weekofyear(c) === 1 && F.month(c) === 12, 1).otherwise(0)
  def quarterOfYear(c: Column): Column = F.quarter(c)
  def hour(c: Column): Column = F.hour(c)
  def minute(c: Column): Column = F.minute(c)
  def second(c: Column): Column = F.second(c)
  /** Sub-second component in nanoseconds (series.ex:6776); Spark timestamps
    * are µs so the value is µs-resolution ns, matching the reference's
    * behavior on `{:datetime, :us}` data. */
  def nanosecond(c: Column): Column =
    F.pmod(F.unix_micros(c), F.lit(1000000L)) * 1000L
  def isLeapYear(c: Column): Column = {
    val y = F.year(c)
    (y % 4 === 0 && y % 100 =!= 0) || y % 400 === 0
  }
  def daysInMonth(c: Column): Column = F.dayofmonth(F.last_day(c))
  def toDate(c: Column): Column = F.to_date(c)
  /** Time-of-day under graft's `time` encoding: ns since midnight (§1.2). */
  def toTime(c: Column): Column =
    (F.unix_micros(c) - F.unix_micros(F.date_trunc("DAY", c))) * 1000L
}

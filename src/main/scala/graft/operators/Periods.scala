package graft.operators

import java.time.YearMonth
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, IntegerType}

/** Period (yyyyMM) engine + "magic date" integer encoding.
  *
  * The reference filters every transactional job to a trailing list of
  * yyyyMM periods (reference: artifacts/aws-glue/layer/
  * common_jobs_functions.py:358-378 `get_periods`), and converts the source
  * system's integer dates: an integer is days-since-2008-01-01 plus a fixed
  * 733042 offset (common_jobs_functions.py:405-424). All expressions here
  * are built-in date arithmetic — codegen'd, partition-prunable when the
  * lake partitions by period.
  */
object Periods {
  /** reference: common_jobs_functions.py:421 `(date - date(2008,1,1)).days + 733042` */
  val MagicOffset = 733042
  val MagicPivot  = "2008-01-01"

  /** yyyyMM string of a date/timestamp column (the reference's id_periodo). */
  def periodOf(d: Column): Column = date_format(d, "yyyyMM")

  /** Integer yyyyMM — the aggregation-key twin of [[periodOf]]. year/month
    * are integer arithmetic on the days-since-epoch value, so a fact-table
    * groupBy on this key never formats a string per row (date_format walks
    * a formatter per value — measured ~2× the whole scan-agg floor on a
    * 60M-row branch). Render with `.cast("string")` AFTER aggregating:
    * identical to periodOf for years 1000–9999 (yyyyMM has no padding
    * below the year, and month arrives zero-padded via *100+month). */
  def periodKey(d: Column): Column =
    (year(d) * 100 + month(d)).cast(IntegerType)

  /** First day of the month, as DateType. */
  def monthStart(d: Column): Column = trunc(d.cast(DateType), "month")

  /** Months since year 0 — integer month index for RANGE window frames. */
  def monthIndex(d: Column): Column =
    (year(d.cast(DateType)) * 12 + month(d.cast(DateType))).cast(IntegerType)

  /** date/timestamp -> BigMagic integer day. */
  def toMagic(d: Column): Column =
    (datediff(d.cast(DateType), to_date(lit(MagicPivot))) + lit(MagicOffset)).cast(IntegerType)

  /** BigMagic integer day -> DateType. */
  def fromMagic(m: Column): Column =
    date_add(to_date(lit(MagicPivot)), (m - lit(MagicOffset)).cast(IntegerType))

  /** timestamp -> BigMagic time-of-day: HHMMSS as an integer rendered to
    * string — `h·10000 + m·100 + s` (reference:
    * code/redshift/loadt_stage_to_redshift.py:98-104
    * `transform_convert_hora_bigmagic`). Leading zeros drop with the
    * integer form: 00:05:09 -> "509", midnight -> "0" — the value the
    * Redshift varchar target keys on. (The reference's PySpark expression
    * adds a *string* seconds substring to an int, which Spark coerces
    * through double — an accidental "123456.0" rendering; we pin the
    * integer intent, not the coercion artifact.) */
  def toMagicHora(ts: Column): Column =
    (hour(ts) * lit(10000) + minute(ts) * lit(100) + second(ts))
      .cast(IntegerType).cast("string")

  /** BigMagic HHMMSS string/int -> seconds-of-day (inverse of
    * [[toMagicHora]] up to the day boundary; pairs with [[fromMagic]] to
    * rebuild a full timestamp from the reference's (date, hora) pair). */
  def fromMagicHoraSeconds(hora: Column): Column = {
    val v = hora.cast(IntegerType)
    (floor(v / 10000) * 3600 + floor(pmod(v, lit(10000)) / 100) * 60
      + pmod(v, lit(100))).cast(IntegerType)
  }

  /** (magic day, magic hora) -> full timestamp — the round-trip the
    * stage->Redshift load implies but never writes down. */
  def fromMagicParts(day: Column, hora: Column): Column =
    timestamp_seconds(unix_date(fromMagic(day)).cast("long") * 86400L
      + fromMagicHoraSeconds(hora))

  /** Trailing period list ending at `end` inclusive, like get_periods(). */
  def periods(n: Int, end: YearMonth): Seq[String] =
    (0 until n).map(i => end.minusMonths(i.toLong)).map(ym => f"${ym.getYear}%04d${ym.getMonthValue}%02d")

  /** The reference's job clock: "now" in America/Lima, resolved once at
    * job start (reference: common_jobs_functions.py:67 `NOW_LIMA` =
    * utc-now → TZ_LIMA, :219 `get_now_lima_datetime`) — the entry point
    * every periodic job anchors its period window on. The Clock is
    * injectable so runs are deterministic and testable; around a Lima
    * month boundary the UTC date and the Lima date differ, which is
    * exactly why the reference pins the zone instead of the cluster
    * clock. */
  def nowLima(clock: java.time.Clock = java.time.Clock.systemUTC()): java.time.ZonedDateTime =
    java.time.ZonedDateTime.now(clock)
      .withZoneSameInstant(java.time.ZoneId.of("America/Lima"))

  /** Current yyyyMM period per the Lima clock — the default anchor of
    * the reference's get_periods (common_jobs_functions.py:368). */
  def currentPeriod(clock: java.time.Clock = java.time.Clock.systemUTC()): String = {
    val z = nowLima(clock)
    f"${z.getYear}%04d${z.getMonthValue}%02d"
  }

  /** Trailing `n` periods anchored at the Lima "now" — get_periods with
    * its NOW_LIMA default, the reference's actual runtime call shape. */
  def periodsNow(n: Int,
                 clock: java.time.Clock = java.time.Clock.systemUTC()): Seq[String] =
    periods(n, YearMonth.from(nowLima(clock).toLocalDate))

  /** The yyyyMM period immediately before `p` — the reference's
    * `get_previous_period` (common_jobs_functions.py:358-366), which every
    * periodic job uses to address last month's slice. */
  def previousPeriod(p: String): String = {
    val ym = YearMonth.of(p.take(4).toInt, p.drop(4).toInt).minusMonths(1)
    f"${ym.getYear}%04d${ym.getMonthValue}%02d"
  }

  /** Column form of [[previousPeriod]] for period-typed lake columns. */
  def previousPeriod(p: Column): Column =
    date_format(add_months(to_date(concat(p, lit("01")), "yyyyMMdd"), -1), "yyyyMM")

  /** All days of the trailing `n` periods, as (dates, magic ints, periods) —
    * the reference's pushdown-filter lists for date- and integer-dated
    * sources (reference: common_jobs_functions.py:380-424
    * `get_dates_filter`). */
  def datesFilter(n: Int, end: YearMonth): (Seq[java.time.LocalDate], Seq[Int], Seq[String]) = {
    val ps = periods(n, end)
    val dates = ps.flatMap { p =>
      val ym = YearMonth.of(p.take(4).toInt, p.drop(4).toInt)
      (1 to ym.lengthOfMonth).map(d => ym.atDay(d))
    }
    val pivot = java.time.LocalDate.parse(MagicPivot)
    val magic = dates.map(d => java.time.temporal.ChronoUnit.DAYS.between(pivot, d).toInt + MagicOffset)
    (dates, magic, ps)
  }
}

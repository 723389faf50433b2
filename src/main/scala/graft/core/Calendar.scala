package graft.core

import java.time.{LocalDateTime, ZoneOffset}
import java.time.temporal.ChronoUnit

/** Logical-date algebra for pipeline date windows.
  *
  * Mirrors the reference's Calendar semantics (pydin/utils.py:872-1192)
  * without the string-eval hacks: each date grain knows its `start`/`end`
  * bounds (SECOND resolution, end inclusive at :59 — utils.py:1090-1192),
  * navigation (`prev`/`next`), and relative movement (`daysBack`,
  * `hoursBack`, `monthsBack` — utils.py:1047-1088). `monthsBack` walks
  * first-of-month-minus-a-day per step, exactly like the reference
  * (utils.py:1066-1071), so Jan 31 monthsBack(1) lands in December.
  *
  * Timezone shift (utils.py:936-956): an optional UTC-offset that
  * re-anchors the wall-clock instant; applied to `now`/`start`/`end` on
  * read. Pipelines run in UTC by default.
  *
  * The window becomes a pushed-down predicate:
  * `col(dateField).between(lit(ts(start)), lit(ts(end)))`.
  */
sealed abstract class CalendarDate extends Serializable {
  /** The anchor instant, truncated to seconds (reference truncates
    * microseconds on set — utils.py:918-920). */
  def raw: LocalDateTime
  protected def grainStart: LocalDateTime
  protected def grainEnd: LocalDateTime
  def timezone: Option[ZoneOffset]
  protected def withTz(dt: LocalDateTime): LocalDateTime = timezone match {
    case Some(z) => dt.atOffset(ZoneOffset.UTC).withOffsetSameInstant(z).toLocalDateTime
    case None    => dt
  }

  def now: LocalDateTime = withTz(raw)
  def start: LocalDateTime = withTz(grainStart)
  def end: LocalDateTime = withTz(grainEnd)

  def prev: CalendarDate
  def next: CalendarDate

  def day: Calendar.Day = Calendar.Day(raw, timezone)
  def hour: Calendar.Hour = Calendar.Hour(raw, timezone)
  def month: Calendar.Month = Calendar.Month(raw, timezone)
  def year: Calendar.Year = Calendar.Year(raw, timezone)
  def yesterday: Calendar.Day = Calendar.Day(raw.minusDays(1), timezone)
  def tomorrow: Calendar.Day = Calendar.Day(raw.plusDays(1), timezone)

  // Shortcuts (utils.py:1007-1045)
  def yd: Calendar.Day = yesterday
  def tm: Calendar.Day = tomorrow
  def dd: Calendar.Day = day
  def mm: Calendar.Month = month
  def hh: Calendar.Hour = hour
  def y: Calendar.Year = year
  def pv: CalendarDate = prev
  def nt: CalendarDate = next

  def daysBack(n: Int): Calendar.Day = Calendar.Day(raw.minusDays(n), timezone)
  def hoursBack(n: Int): Calendar.Hour = Calendar.Hour(raw.minusHours(n), timezone)
  def minutesBack(n: Int): Calendar.Day = Calendar.Day(raw.minusMinutes(n), timezone)
  def secondsBack(n: Int): Calendar.Day = Calendar.Day(raw.minusSeconds(n), timezone)

  /** Step to the first of month, minus one day, `n` times (reference
    * loop at utils.py:1066-1071). */
  def monthsBack(n: Int): Calendar.Month = {
    var d = raw
    var k = n
    while (k > 0) { k -= 1; d = d.withDayOfMonth(1).minusDays(1) }
    Calendar.Month(d, timezone)
  }

  /** Floor minutes to a multiple of `level`, zeroing seconds. */
  def minutesRound(level: Int): Calendar.Day = {
    val floored = raw.minusSeconds(raw.getSecond)
      .minusMinutes(raw.getMinute % level)
    Calendar.Day(floored, timezone)
  }

  def withTimezone(offsetHours: Int): CalendarDate
  def utc: CalendarDate = withTimezone(0)

  override def toString: String = now.toString
}

object Calendar {
  private def trunc(dt: LocalDateTime): LocalDateTime =
    dt.truncatedTo(ChronoUnit.SECONDS)

  /** A calendar day: start 00:00:00, end 23:59:59 (inclusive). */
  final case class Day(anchor: LocalDateTime,
                       timezone: Option[ZoneOffset] = None) extends CalendarDate {
    val raw: LocalDateTime = trunc(anchor)
    protected def grainStart: LocalDateTime = raw.toLocalDate.atStartOfDay
    protected def grainEnd: LocalDateTime = raw.toLocalDate.atTime(23, 59, 59)
    def prev: Day = Day(raw.minusDays(1), timezone)
    def next: Day = Day(raw.plusDays(1), timezone)
    def withTimezone(offsetHours: Int): Day =
      copy(timezone = Some(ZoneOffset.ofHours(offsetHours)))
  }

  /** A calendar hour: start HH:00:00, end HH:59:59. */
  final case class Hour(anchor: LocalDateTime,
                        timezone: Option[ZoneOffset] = None) extends CalendarDate {
    val raw: LocalDateTime = trunc(anchor)
    protected def grainStart: LocalDateTime = raw.withMinute(0).withSecond(0)
    protected def grainEnd: LocalDateTime = raw.withMinute(59).withSecond(59)
    override def prev: Hour = Hour(raw.minusHours(1), timezone)
    override def next: Hour = Hour(raw.plusHours(1), timezone)
    def withTimezone(offsetHours: Int): Hour =
      copy(timezone = Some(ZoneOffset.ofHours(offsetHours)))
  }

  /** A calendar month: first 00:00:00 through last day 23:59:59. */
  final case class Month(anchor: LocalDateTime,
                         timezone: Option[ZoneOffset] = None) extends CalendarDate {
    val raw: LocalDateTime = trunc(anchor)
    protected def grainStart: LocalDateTime =
      raw.toLocalDate.withDayOfMonth(1).atStartOfDay
    protected def grainEnd: LocalDateTime =
      raw.toLocalDate.withDayOfMonth(raw.toLocalDate.lengthOfMonth).atTime(23, 59, 59)
    override def prev: Month = Month(raw.withDayOfMonth(1).minusDays(1), timezone)
    override def next: Month =
      Month(raw.withDayOfMonth(1).plusMonths(1), timezone)
    def withTimezone(offsetHours: Int): Month =
      copy(timezone = Some(ZoneOffset.ofHours(offsetHours)))
  }

  /** A calendar year: Jan 1 00:00:00 through Dec 31 23:59:59. */
  final case class Year(anchor: LocalDateTime,
                        timezone: Option[ZoneOffset] = None) extends CalendarDate {
    val raw: LocalDateTime = trunc(anchor)
    protected def grainStart: LocalDateTime =
      raw.toLocalDate.withDayOfYear(1).atStartOfDay
    protected def grainEnd: LocalDateTime =
      raw.toLocalDate.withMonth(12).withDayOfMonth(31).atTime(23, 59, 59)
    // reference: minus 365 days (utils.py:1188-1191), not minus 1 year
    override def prev: Year = Year(raw.minusDays(365), timezone)
    override def next: Year = Year(raw.plusDays(365), timezone)
    def withTimezone(offsetHours: Int): Year =
      copy(timezone = Some(ZoneOffset.ofHours(offsetHours)))
  }

  def today(): Day = Day(LocalDateTime.now())
  def day(iso: String): Day = Day(parse(iso))
  def hour(iso: String): Hour = Hour(parse(iso))

  private def parse(s: String): LocalDateTime =
    if (s.length == 10) LocalDateTime.parse(s + "T00:00:00")
    else LocalDateTime.parse(s.replace(' ', 'T'))
}

package graft.scheduler

import java.time.LocalDateTime

/** The reference's cron dialect (pydin/core.py:691-734) — NOT Quartz.
  *
  * A schedule has six independent period fields, each matched against the
  * corresponding unit of a timestamp:
  *
  * | field | unit |
  * |---|---|
  * | mday | day of month 1-31 |
  * | hour | 0-23 |
  * | min  | 0-59 |
  * | sec  | 0-59 |
  * | wday | weekday 1-7, Monday=1 (tm_wday+1 — core.py:700) |
  * | yday | day of year 1-366 |
  *
  * Token forms per field (core.py:705-734):
  *  - `*` or empty/null — always matches
  *  - `N` — unit == N
  *  - `/N` — unit % N == 0 (modulo, not Quartz step-from-start); `/0`
  *    never matches
  *  - `A-B` — A <= unit <= B (inclusive)
  *  - `N+` — unit >= N
  *  - `A,B,C` — unit in list
  *  - anything else — never matches
  */
object Cron {

  final case class Schedule(mday: Option[String] = None,
                            hour: Option[String] = None,
                            min: Option[String] = None,
                            sec: Option[String] = None,
                            wday: Option[String] = None,
                            yday: Option[String] = None) {
    def matches(t: LocalDateTime): Boolean =
      Cron.matches(mday, t.getDayOfMonth) &&
      Cron.matches(hour, t.getHour) &&
      Cron.matches(min, t.getMinute) &&
      Cron.matches(sec, t.getSecond) &&
      Cron.matches(wday, t.getDayOfWeek.getValue) && // Monday=1, like tm_wday+1
      Cron.matches(yday, t.getDayOfYear)
  }

  private val Lone = """^\d+$""".r
  private val Cycle = """^/(\d+)$""".r
  private val Range = """^(\d+)-(\d+)$""".r
  private val From = """^(\d+)\+$""".r
  private val Csv = """^\d+(?:\s*,\s*\d+)+$""".r

  /** Match one period token against one time unit. */
  def matches(period: Option[String], unit: Int): Boolean = period match {
    case None => true
    case Some(p) => matches(p, unit)
  }

  def matches(period: String, unit: Int): Boolean = period.trim match {
    case "" | "*" => true
    case p @ Lone() => unit == p.toInt
    case Cycle(n) => n.toInt != 0 && unit % n.toInt == 0
    case Range(a, b) => unit >= a.toInt && unit <= b.toInt
    case From(n) => unit >= n.toInt
    case p if Csv.matches(p) =>
      p.split(',').map(_.trim.toInt).contains(unit)
    case _ => false
  }
}

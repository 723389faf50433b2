package graft.core

import java.time.LocalDateTime

/** Parser for the reference's calendar expression strings — the strings
  * PyDin passes to `eval` against a calendar namespace
  * (`models.py:1640-1643`, `utils.py:886-896`), reimplemented as a tiny
  * parsed grammar (SURVEY.md §7.4.7: never eval user strings).
  *
  * Grammar (dot-separated steps over a [[CalendarDate]]):
  * {{{
  *   expr     := ["calendar."] step ("." step)* ["." terminal]
  *   step     := "yesterday"|"yd" | "tomorrow"|"tm" | "day"|"dd"
  *             | "month"|"mm" | "hour"|"hh" | "year"|"y"
  *             | "prev"|"pv" | "next"|"nt" | "utc"
  *             | "days_back(n)" | "hours_back(n)" | "months_back(n)"
  *             | "minutes_back(n)" | "seconds_back(n)" | "minutes_round(n)"
  *             | "timezone(n)"
  *   terminal := "start" | "end" | "now"   (default: start)
  * }}}
  *
  * Examples: `calendar.yesterday.start`, `days_back(3).end`,
  * `month.prev.start`, `hours_back(2).hh.end`.
  */
object CalendarExpr {

  private val Call = """^([a-z_]+)\(\s*(-?\d+)\s*\)$""".r

  /** Resolve `expr` against `cal`; throws IllegalArgumentException on
    * unknown tokens. */
  def resolve(expr: String, cal: CalendarDate): LocalDateTime = {
    val steps = expr.trim.split('.').map(_.trim).filter(_.nonEmpty).toList
    val body = steps match {
      case "calendar" :: rest => rest
      case other => other
    }
    apply(body, cal)
  }

  private def apply(steps: List[String], cal: CalendarDate): LocalDateTime =
    steps match {
      case Nil => cal.start
      case "start" :: Nil => cal.start
      case "end" :: Nil => cal.end
      case "now" :: Nil => cal.now
      case step :: rest => apply(rest, applyStep(step, cal))
    }

  private def applyStep(step: String, cal: CalendarDate): CalendarDate =
    step match {
      case "yesterday" | "yd" => cal.yesterday
      case "tomorrow" | "tm" => cal.tomorrow
      case "day" | "dd" => cal.day
      case "month" | "mm" => cal.month
      case "hour" | "hh" => cal.hour
      case "year" | "y" => cal.year
      case "prev" | "pv" => cal.prev
      case "next" | "nt" => cal.next
      case "utc" => cal.utc
      case Call(fn, n) =>
        val k = n.toInt
        fn match {
          case "days_back" => cal.daysBack(k)
          case "hours_back" => cal.hoursBack(k)
          case "months_back" => cal.monthsBack(k)
          case "minutes_back" => cal.minutesBack(k)
          case "seconds_back" => cal.secondsBack(k)
          case "minutes_round" => cal.minutesRound(k)
          case "timezone" => cal.withTimezone(k)
          case other =>
            throw new IllegalArgumentException(s"unknown calendar call: $other")
        }
      case other =>
        throw new IllegalArgumentException(s"unknown calendar step: $other")
    }

  /** Resolve to a [[CalendarDate]] (no terminal allowed) — for config
    * fields that need a date window rather than an instant. */
  def resolveDate(expr: String, cal: CalendarDate): CalendarDate = {
    val steps = expr.trim.split('.').map(_.trim).filter(_.nonEmpty).toList
    val body = steps match {
      case "calendar" :: rest => rest
      case other => other
    }
    body.foldLeft(cal)((c, s) => applyStep(s, c))
  }
}

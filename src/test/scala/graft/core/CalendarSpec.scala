package graft.core

import java.time.LocalDateTime

import org.scalatest.funsuite.AnyFunSuite

class CalendarSpec extends AnyFunSuite {

  private val d = Calendar.day("2023-03-15")

  test("day window bounds") {
    assert(d.start == LocalDateTime.parse("2023-03-15T00:00:00"))
    assert(d.end == LocalDateTime.parse("2023-03-15T23:59:59"))
  }

  test("hour window bounds") {
    val h = Calendar.hour("2023-03-15 13:45:10")
    assert(h.start == LocalDateTime.parse("2023-03-15T13:00:00"))
    assert(h.end == LocalDateTime.parse("2023-03-15T13:59:59"))
  }

  test("month window bounds incl leap year") {
    val m = Calendar.day("2024-02-10").month
    assert(m.start == LocalDateTime.parse("2024-02-01T00:00:00"))
    assert(m.end == LocalDateTime.parse("2024-02-29T23:59:59"))
  }

  test("year window bounds") {
    val y = d.year
    assert(y.start == LocalDateTime.parse("2023-01-01T00:00:00"))
    assert(y.end == LocalDateTime.parse("2023-12-31T23:59:59"))
  }

  test("daysBack / yesterday / tomorrow / prev / next") {
    assert(d.daysBack(3).start == LocalDateTime.parse("2023-03-12T00:00:00"))
    assert(d.yesterday.start == LocalDateTime.parse("2023-03-14T00:00:00"))
    assert(d.tomorrow.start == LocalDateTime.parse("2023-03-16T00:00:00"))
    assert(d.prev.start == LocalDateTime.parse("2023-03-14T00:00:00"))
    assert(d.next.start == LocalDateTime.parse("2023-03-16T00:00:00"))
    assert(d.yd.start == d.yesterday.start)
    assert(d.pv.start == d.prev.start)
  }

  test("monthsBack steps through month ends (reference loop semantics)") {
    // Mar 15 -> back 1 month: first-of-Mar minus a day = Feb 28 -> Feb window
    val m1 = d.monthsBack(1)
    assert(m1.start == LocalDateTime.parse("2023-02-01T00:00:00"))
    assert(m1.end == LocalDateTime.parse("2023-02-28T23:59:59"))
    // Jan 31 monthsBack(1) lands in December of the previous year
    val m2 = Calendar.day("2023-01-31").monthsBack(1)
    assert(m2.start == LocalDateTime.parse("2022-12-01T00:00:00"))
  }

  test("hoursBack returns an hour grain") {
    val h = Calendar.hour("2023-03-15 02:30:00").hoursBack(3)
    assert(h.start == LocalDateTime.parse("2023-03-14T23:00:00"))
    assert(h.end == LocalDateTime.parse("2023-03-14T23:59:59"))
  }

  test("minutesRound floors to the level") {
    val r = Calendar.hour("2023-03-15 13:47:33").minutesRound(15)
    assert(r.raw == LocalDateTime.parse("2023-03-15T13:45:00"))
  }

  test("timezone shift re-anchors the window") {
    val shifted = d.withTimezone(3)
    assert(shifted.start == LocalDateTime.parse("2023-03-15T03:00:00"))
    assert(shifted.end.toString.startsWith("2023-03-16T02:59:59"))
  }

  test("property: start <= now <= end and start <= end for all grains") {
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val epoch = math.abs(rnd.nextLong()) % 4102444800L // 1970..2100
      val t = LocalDateTime.ofEpochSecond(epoch, 0, java.time.ZoneOffset.UTC)
      Seq(Calendar.Day(t), Calendar.Hour(t), Calendar.Month(t), Calendar.Year(t))
        .foreach { g =>
          assert(!g.start.isAfter(g.raw))
          assert(!g.raw.isAfter(g.end))
          assert(!g.start.isAfter(g.end))
        }
    }
  }

  test("property: daysBack(n).end is before now's day start for n >= 1") {
    (1 to 400).foreach { n =>
      assert(d.daysBack(n).end.isBefore(d.start.plusSeconds(1)))
    }
  }

  test("calendar expression parser replaces the reference's eval") {
    def r(e: String) = CalendarExpr.resolve(e, d)
    assert(r("calendar.yesterday.start") == LocalDateTime.parse("2023-03-14T00:00:00"))
    assert(r("yd.end") == LocalDateTime.parse("2023-03-14T23:59:59"))
    assert(r("days_back(3)") == LocalDateTime.parse("2023-03-12T00:00:00"))
    assert(r("days_back(3).end") == LocalDateTime.parse("2023-03-12T23:59:59"))
    assert(r("month.prev.start") == LocalDateTime.parse("2023-02-01T00:00:00"))
    assert(r("calendar.mm.end") == LocalDateTime.parse("2023-03-31T23:59:59"))
    assert(r("months_back(1).start") == LocalDateTime.parse("2023-02-01T00:00:00"))
    assert(r("year.start") == LocalDateTime.parse("2023-01-01T00:00:00"))
    assert(r("timezone(3).start") == LocalDateTime.parse("2023-03-15T03:00:00"))
    intercept[IllegalArgumentException](r("rm_rf(1)"))
    intercept[IllegalArgumentException](r("calendar.__class__"))
  }
}

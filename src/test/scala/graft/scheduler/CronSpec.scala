package graft.scheduler

import java.time.LocalDateTime

import org.scalatest.funsuite.AnyFunSuite

class CronSpec extends AnyFunSuite {

  test("token forms") {
    assert(Cron.matches("*", 7))
    assert(Cron.matches("", 7))
    assert(Cron.matches("7", 7))
    assert(!Cron.matches("8", 7))
    assert(Cron.matches("/5", 10)) // modulo dialect, not step-from-start
    assert(!Cron.matches("/5", 11))
    assert(Cron.matches("/5", 0))
    assert(!Cron.matches("/0", 5)) // division guard (core.py:718-719)
    assert(Cron.matches("3-9", 7))
    assert(!Cron.matches("3-6", 7))
    assert(Cron.matches("5+", 7))
    assert(!Cron.matches("8+", 7))
    assert(Cron.matches("1, 7, 20", 7))
    assert(!Cron.matches("1, 2, 20", 7))
    assert(!Cron.matches("garbage", 7)) // unknown token never matches
  }

  test("schedule matches a full timestamp, weekday Monday=1") {
    // 2023-03-15 is a Wednesday (wday 3), yday 74
    val t = LocalDateTime.parse("2023-03-15T14:30:00")
    assert(Cron.Schedule(hour = Some("14"), min = Some("/30")).matches(t))
    assert(Cron.Schedule(wday = Some("3")).matches(t))
    assert(!Cron.Schedule(wday = Some("1")).matches(t))
    assert(Cron.Schedule(yday = Some("74")).matches(t))
    assert(Cron.Schedule(mday = Some("15"), sec = Some("0")).matches(t))
    assert(!Cron.Schedule(hour = Some("14"), min = Some("29")).matches(t))
  }

  /** Brute-force interpreter twin for the property test. */
  private def bruteMatch(period: String, unit: Int): Boolean = {
    val p = period.trim
    if (p.isEmpty || p == "*") true
    else if (p.matches("""\d+""")) p.toInt == unit
    else if (p.matches("""/\d+""")) {
      val n = p.drop(1).toInt; n != 0 && unit % n == 0
    } else if (p.matches("""\d+-\d+""")) {
      val Array(a, b) = p.split('-').map(_.toInt); unit >= a && unit <= b
    } else if (p.matches("""\d+\+""")) unit >= p.dropRight(1).toInt
    else if (p.matches("""\d+(\s*,\s*\d+)+""")) p.split(',').map(_.trim.toInt).contains(unit)
    else false
  }

  test("property: matcher agrees with brute-force interpreter") {
    val rnd = new scala.util.Random(42)
    def tok(): String = rnd.nextInt(6) match {
      case 0 => "*"
      case 1 => rnd.nextInt(61).toString
      case 2 => s"/${rnd.nextInt(13)}"
      case 3 => { val a = rnd.nextInt(31); s"$a-${a + rnd.nextInt(30)}" }
      case 4 => s"${rnd.nextInt(61)}+"
      case _ => Seq.fill(3)(rnd.nextInt(61)).mkString(",")
    }
    (1 to 2000).foreach { _ =>
      val t = tok(); val unit = rnd.nextInt(61)
      assert(Cron.matches(t, unit) == bruteMatch(t, unit),
        s"token '$t' unit $unit")
    }
  }
}

package graft

import java.time.{Instant, ZoneId, ZonedDateTime}
import org.scalatest.funsuite.AnyFunSuite
import graft.events.Cron

class CronSpec extends AnyFunSuite {

  private def zdt(s: String): ZonedDateTime =
    ZonedDateTime.of(java.time.LocalDateTime.parse(s), ZoneId.of("UTC"))

  test("basic daily schedule expands once per day") {
    val fires = Cron.expand("0 23 * * *",
      Instant.parse("2024-01-01T00:00:00Z"),
      Instant.parse("2024-01-04T00:00:00Z"))
    assert(fires.map(_.toString) == Seq(
      "2024-01-01T23:00:00Z", "2024-01-02T23:00:00Z",
      "2024-01-03T23:00:00Z"))
  }

  test("dow 7 is Sunday (alias of 0)") {
    val spec = Cron.parse("0 12 * * 7")
    // 2024-01-07 is a Sunday
    assert(spec.matches(zdt("2024-01-07T12:00:00")))
    assert(!spec.matches(zdt("2024-01-08T12:00:00"))) // Monday
    assert(Cron.parse("0 12 * * 0").dows == spec.dows)
  }

  test("restricted dom OR restricted dow (crontab(5) rule)") {
    val spec = Cron.parse("0 0 1 * 1") // 1st of month OR Mondays
    assert(spec.matches(zdt("2024-02-01T00:00:00"))) // 1st (a Thursday)
    assert(spec.matches(zdt("2024-02-05T00:00:00"))) // a Monday, not the 1st
    assert(!spec.matches(zdt("2024-02-06T00:00:00"))) // plain Tuesday
    // only dom restricted → AND semantics as usual
    val domOnly = Cron.parse("0 0 1 * *")
    assert(!domOnly.matches(zdt("2024-02-05T00:00:00")))
  }

  test("steps and ranges") {
    val spec = Cron.parse("*/15 9-17 * * 1-5")
    assert(spec.minutes == Set(0, 15, 30, 45))
    assert(spec.hours == (9 to 17).toSet)
    assert(spec.dows == (1 to 5).toSet)
  }

  test("out-of-range field values are rejected") {
    intercept[IllegalArgumentException](Cron.parse("0 25 * * *"))
    intercept[IllegalArgumentException](Cron.parse("0 0 0 * *"))
    intercept[IllegalArgumentException](Cron.parse("0 0 * * 9"))
  }
}

package graft

import java.time.{Instant, LocalDateTime, ZoneId}
import org.scalatest.funsuite.AnyFunSuite
import graft.events.Cron

class CronSpec extends AnyFunSuite {

  private def zdt(s: String): LocalDateTime = LocalDateTime.parse(s)

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

  test("non-UTC zone: wall-clock schedule maps to offset UTC instants") {
    val fires = Cron.expand("0 6 * * *",
      Instant.parse("2024-01-01T00:00:00Z"),
      Instant.parse("2024-01-03T00:00:00Z"), ZoneId.of("Asia/Kolkata"))
    // 06:00 IST = 00:30 UTC (+05:30 — a non-whole-hour offset)
    assert(fires.map(_.toString) == Seq(
      "2024-01-01T00:30:00Z", "2024-01-02T00:30:00Z"))
  }

  test("DST spring-forward shifts the UTC instant of a daily schedule") {
    // America/New_York: EST (UTC-5) → EDT (UTC-4) on 2024-03-10 02:00
    val fires = Cron.expand("0 6 * * *",
      Instant.parse("2024-03-09T00:00:00Z"),
      Instant.parse("2024-03-12T00:00:00Z"), ZoneId.of("America/New_York"))
    assert(fires.map(_.toString) == Seq(
      "2024-03-09T11:00:00Z", // 06:00 EST
      "2024-03-10T10:00:00Z", // 06:00 EDT
      "2024-03-11T10:00:00Z"))
  }

  test("wall times inside the spring-forward gap are skipped") {
    // 02:30 local does not exist on 2024-03-10 in America/New_York
    val fires = Cron.expand("30 2 * * *",
      Instant.parse("2024-03-09T00:00:00Z"),
      Instant.parse("2024-03-12T00:00:00Z"), ZoneId.of("America/New_York"))
    assert(fires.map(_.toString) == Seq(
      "2024-03-09T07:30:00Z", // 02:30 EST on the 9th
      "2024-03-11T06:30:00Z")) // gap on the 10th, 02:30 EDT on the 11th
  }

  test("fall-back ambiguous wall times fire once, at the first occurrence") {
    // 2024-11-03 in America/New_York repeats 01:00-01:59 (EDT then EST)
    val fires = Cron.expand("30 1 * * *",
      Instant.parse("2024-11-03T00:00:00Z"),
      Instant.parse("2024-11-04T00:00:00Z"), ZoneId.of("America/New_York"))
    assert(fires.map(_.toString) == Seq("2024-11-03T05:30:00Z")) // 01:30 EDT
  }

  test("UTC expansion is unchanged by the wall-clock iteration") {
    val fires = Cron.expand("0 */4 * * *",
      Instant.parse("2024-01-01T03:00:00Z"),
      Instant.parse("2024-01-01T13:00:00Z"))
    assert(fires.map(_.toString) == Seq(
      "2024-01-01T04:00:00Z", "2024-01-01T08:00:00Z",
      "2024-01-01T12:00:00Z"))
  }

  test("out-of-range field values are rejected") {
    intercept[IllegalArgumentException](Cron.parse("0 25 * * *"))
    intercept[IllegalArgumentException](Cron.parse("0 0 0 * *"))
    intercept[IllegalArgumentException](Cron.parse("0 0 * * 9"))
  }
}

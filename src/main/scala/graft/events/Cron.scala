package graft.events

import java.time.{Instant, ZoneId, ZonedDateTime}

/** Minimal 5-field cron evaluation — the reference declares schedules as
  * `{expectation: BATCH_PIPELINE_START_TIME, schedule: "0 23 * * *",
  * margin: 600, timezone}` (reference demo/demo/demo_helper.py:653-660;
  * cron builder :122-123). Expected-start expansion happens driver-side
  * (schedules are tiny dimension data) and joins against run starts as a
  * broadcast — no Catalyst extension needed (SURVEY.md §4).
  *
  * Supported field syntax: `*`, `n`, `a-b`, `a,b,c`, `*&#47;s`, `a-b/s`.
  */
object Cron {

  /** `domAny`/`dowAny` record whether the field was `*`: standard cron ORs
    * day-of-month with day-of-week when BOTH are restricted, and ANDs
    * otherwise (see crontab(5)).
    */
  case class Spec(minutes: Set[Int], hours: Set[Int], doms: Set[Int],
                  months: Set[Int], dows: Set[Int],
                  domAny: Boolean, dowAny: Boolean) {
    def matches(t: ZonedDateTime): Boolean = {
      val domOk = doms(t.getDayOfMonth)
      val dowOk = dows(t.getDayOfWeek.getValue % 7) // cron: 0=Sunday
      val dayOk =
        if (!domAny && !dowAny) domOk || dowOk else domOk && dowOk
      minutes(t.getMinute) && hours(t.getHour) &&
        months(t.getMonthValue) && dayOk
    }
  }

  def parse(expr: String): Spec = {
    val fs = expr.trim.split("\\s+")
    require(fs.length == 5, s"bad cron: $expr")
    def field(s: String, lo: Int, hi: Int, isDow: Boolean = false)
        : Set[Int] = {
      val vals = s.split(",").flatMap { part =>
        val (rangePart, step) = part.split("/") match {
          case Array(r)     => (r, 1)
          case Array(r, s2) => (r, s2.toInt)
        }
        val (a, b) = rangePart match {
          case "*" => (lo, hi)
          case r if r.contains("-") =>
            val Array(x, y) = r.split("-"); (x.toInt, y.toInt)
          case n => (n.toInt, n.toInt)
        }
        (a to b by step)
      }.toSet
      vals.foreach(v => require(v >= lo && v <= hi,
        s"cron field value $v out of [$lo,$hi] in: $expr"))
      // dow alias after validation: 7 == Sunday == 0 (crontab(5))
      if (isDow) vals.map(_ % 7) else vals
    }
    Spec(field(fs(0), 0, 59), field(fs(1), 0, 23), field(fs(2), 1, 31),
      field(fs(3), 1, 12), field(fs(4), 0, 7, isDow = true),
      domAny = fs(2) == "*", dowAny = fs(4) == "*")
  }

  /** All fire instants in [from, to), minute granularity. */
  def expand(expr: String, from: Instant, to: Instant,
             zone: ZoneId = ZoneId.of("UTC")): Seq[Instant] = {
    val spec = parse(expr)
    var t = ZonedDateTime.ofInstant(from, zone).withSecond(0).withNano(0)
    if (t.toInstant.isBefore(from)) t = t.plusMinutes(1)
    val out = Seq.newBuilder[Instant]
    while (t.toInstant.isBefore(to)) {
      if (spec.matches(t)) out += t.toInstant
      t = t.plusMinutes(1)
    }
    out.result()
  }
}

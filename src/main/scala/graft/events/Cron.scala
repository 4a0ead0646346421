package graft.events

import java.time.{Instant, LocalDateTime, ZoneId}
import java.time.temporal.ChronoUnit

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
    def matches(t: LocalDateTime): Boolean = {
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

  /** All fire instants in [from, to), minute granularity, evaluated
    * against the WALL CLOCK of `zone` (the reference schedule's
    * `timezone` field, demo_helper.py:653-660) and returned as UTC
    * instants for comparison against event time.
    *
    * Iterating local wall-clock minutes (not absolute time) makes the
    * DST semantics explicit and deterministic:
    *   - a wall time skipped by a spring-forward gap never fires that
    *     day (it does not exist on the local clock);
    *   - a wall time repeated by a fall-back overlap fires ONCE, at its
    *     first (earlier-offset) occurrence — matching how cron daemons
    *     fire a job at most once per scheduled wall time.
    * For fixed-offset zones (UTC) this is instant-per-matching-minute,
    * identical to absolute-time iteration.
    */
  def expand(expr: String, from: Instant, to: Instant,
             zone: ZoneId = ZoneId.of("UTC")): Seq[Instant] = {
    val spec = parse(expr)
    val rules = zone.getRules
    // ±2 h of local-clock slack covers offset shifts at the range edges;
    // the [from, to) filter on the emitted instant keeps bounds exact.
    var t = LocalDateTime.ofInstant(from, zone)
      .truncatedTo(ChronoUnit.MINUTES).minusHours(2)
    val end = LocalDateTime.ofInstant(to, zone).plusHours(2)
    val out = Seq.newBuilder[Instant]
    while (t.isBefore(end)) {
      if (spec.matches(t)) {
        val offsets = rules.getValidOffsets(t)
        if (!offsets.isEmpty) { // gap times are skipped
          val inst = t.toInstant(offsets.get(0)) // earliest occurrence
          if (!inst.isBefore(from) && inst.isBefore(to)) out += inst
        }
      }
      t = t.plusMinutes(1)
    }
    out.result()
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.events.{ControlPlane, Dag, EventOps}

/** Data-driven journey/rule control plane (r10): journey specs and
  * alert rules parse from JSON-lines config fixtures instead of
  * compiled-in constants — the reference registers both via API
  * payloads at runtime. Pins the three contract pieces: the Spark
  * config-table ingest equals the session-free Jackson parse (the
  * oracle-SQL generator), the fixtures subsume the previously
  * compiled-in specs, and a journey that exists ONLY in the fixture
  * shows up in the registered queries' output.
  */
class ControlPlaneSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("Spark config-table ingest and the session-free parse agree " +
      "row-for-row on all three fixtures") {
    assert(ControlPlane.journeys(spark) == ControlPlane.journeysLocal())
    assert(ControlPlane.instances(spark) == ControlPlane.instancesLocal())
    assert(ControlPlane.rules(spark, "engine") ==
      ControlPlane.rulesLocal("engine"))
    assert(ControlPlane.rules(spark, "templated") ==
      ControlPlane.rulesLocal("templated"))
  }

  test("fixtures subsume the formerly compiled-in specs (Dag" +
      ".MultiJourneys stays as the unit-test constant)") {
    val fromFixture = ControlPlane.journeysLocal().toMap
    Dag.MultiJourneys.foreach { case (jid, edges) =>
      assert(fromFixture.get(jid).contains(edges),
        s"journey $jid must parse from the fixture unchanged")
    }
    // rule groups carry the documented shapes: a value comparison, a
    // JSON-props comparison, a type match; templated rules carry
    // {field} payloads
    val engine = ControlPlane.rulesLocal("engine")
    assert(engine.map(_.id).toSet ==
      Set("high_purchase", "hot_props", "error_seen"))
    assert(engine.forall(_.template.isEmpty))
    val templated = ControlPlane.rulesLocal("templated")
    assert(templated.map(_.id).toSet == Set("hook_purchase", "mail_error"))
    assert(templated.forall(_.template.nonEmpty))
  }

  test("a journey added ONLY in the fixture appears in the registered " +
      "queries' output") {
    // post_purchase exists nowhere in code: only fixtures/journeys.jsonl
    assert(!Dag.MultiJourneys.exists(_._1 == "post_purchase"))
    val oos = graft.queries.EventQueries.queries("ev_oos_multi")(
      spark, SparkTestSession.sf)
    val oosJourneys = oos.select("journey_id").distinct()
      .collect().map(_.getString(0)).toSet
    assert(oosJourneys.contains("post_purchase"),
      s"fixture-only journey missing from ev_oos_multi: $oosJourneys")
    // browse exists only in fixtures/journey_instances.jsonl
    val inst = graft.queries.EventQueries.queries("ev_journeys_multi")(
      spark, SparkTestSession.sf)
    val instJourneys = inst.select("journey_id").distinct()
      .collect().map(_.getString(0)).toSet
    assert(instJourneys.contains("browse"),
      s"fixture-only journey missing from ev_journeys_multi: $instJourneys")
  }

  test("instance validation rejects config rows the compiled-in " +
      "constants could never express, with row-addressed messages") {
    import java.nio.file.Files
    def parse(line: String) = {
      val f = Files.createTempFile("cp-bad", ".jsonl")
      Files.writeString(f, line)
      try ControlPlane.instancesLocal(f.toString)
      finally Files.deleteIfExists(f)
    }
    // a START-cut journey (end_type null) drives the payload-count
    // branch of the generated oracle — ptype.get would otherwise NPE
    // out of EventQueries' object init
    val e1 = intercept[IllegalArgumentException](parse(
      """{"journey_id": "bad", "members": ["view"], "start_type": "view",
        | "end_type": null, "payload_required": false,
        | "payload_type": null}""".stripMargin.replace("\n", "")))
    assert(e1.getMessage.contains("bad"))
    val e2 = intercept[IllegalArgumentException](parse(
      """{"journey_id": "bad2", "members": ["view"], "start_type": "x",
        | "end_type": "view", "payload_required": false,
        | "payload_type": null}""".stripMargin.replace("\n", "")))
    assert(e2.getMessage.contains("not a member"))
    // an omitted payload_required parses as false, not an NPE
    val ok = parse(
      """{"journey_id": "ok", "members": ["view"], "start_type": "view",
        | "end_type": "view"}""".stripMargin.replace("\n", ""))
    assert(ok.head.payloadRequired == false)
  }

  test("compiled rule structs evaluate identically from either parse " +
      "path on a tiny stream") {
    import spark.implicits._
    val ev = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 7L,
        "purchase", 95.0, """{"k": 50}"""),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 10:01:00"), 7L,
        "click", 1.0, """{"k": 41}"""),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 10:02:00"), 8L,
        "error", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val a = EventOps.ruleAlerts(ev, ControlPlane.rules(spark, "engine"))
      .collect().toSeq
    val b = EventOps.ruleAlerts(ev, ControlPlane.rulesLocal("engine"))
      .collect().toSeq
    assert(a == b)
    assert(a.map(_.getAs[String]("rule_id")).sorted ==
      Seq("error_seen", "high_purchase", "hot_props"))
  }
}

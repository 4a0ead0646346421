package graft.events

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Data-driven journey/rule control plane (r9 verdict #6). The
  * reference builds journeys, their DAGs, and alert rules from API
  * payloads at runtime (`PUT /journeys/{id}/dag`,
  * demo/demo/demo_helper.py:230-287; rule registration :1851-1956) —
  * nothing about the journey set is compiled into the engine. This
  * loader gives the Spark engine the same property: journey specs and
  * rule definitions live in JSON-lines config fixtures
  * (`fixtures/journeys.jsonl`, one row per DAG edge;
  * `fixtures/rules.jsonl`, one row per rule) and are parsed at runtime
  * into the exact structures the fused operators
  * ([[EventOps.journeyInstancesMulti]], [[EventOps.outOfSequenceMulti]],
  * [[EventOps.ruleAlerts]]) compile to plan literals. Adding a journey
  * or rule is a fixture edit, not a code change — the r10 fixture
  * carries a `post_purchase` journey that exists NOWHERE in code and
  * shows up in `ev_journeys_multi`/`ev_oos_multi` output.
  *
  * Two parse paths, by design:
  *
  *  - [[journeysTable]]/[[rulesTable]] + [[compileJourneys]]/
  *    [[compileRules]]: the CONFIG-TABLE ingest — `spark.read.json`
  *    with an explicit schema (never inference in production), then a
  *    bounded collect (journeys/rules are control-plane data: tens of
  *    rows, like the reference's API payloads — never corpus-scale).
  *    This is what the registered queries run.
  *  - [[journeysLocal]]/[[rulesLocal]]: a session-free Jackson parse of
  *    the same file, because the DuckDB oracle SQL is GENERATED from
  *    the parsed spec at object-initialization time (EventQueries'
  *    `*Sql` vals), where no SparkSession exists. ControlPlaneSpec
  *    asserts the two parses agree row-for-row, so they cannot drift.
  *
  * Ordering: journeys sort by journey_id, edges by their explicit `ord`
  * column — a config TABLE has no row order, so the fixture carries the
  * order as data (the same reason the reference's DAG API takes an edge
  * LIST, not a set).
  */
object ControlPlane {

  val JourneysPath = "fixtures/journeys.jsonl"
  val RulesPath = "fixtures/rules.jsonl"

  val JourneySchema: StructType = StructType(Seq(
    StructField("journey_id", StringType, nullable = false),
    StructField("ord", IntegerType, nullable = false),
    StructField("left", StringType, nullable = true),
    StructField("right", StringType, nullable = true)))

  val InstancesPath = "fixtures/journey_instances.jsonl"

  val InstanceSchema: StructType = StructType(Seq(
    StructField("journey_id", StringType, nullable = false),
    StructField("members", ArrayType(StringType), nullable = false),
    StructField("start_type", StringType, nullable = false),
    StructField("end_type", StringType, nullable = true),
    StructField("payload_required", BooleanType, nullable = false),
    StructField("payload_type", StringType, nullable = true)))

  val RuleSchema: StructType = StructType(Seq(
    StructField("group", StringType, nullable = false),
    StructField("rule_id", StringType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("field", StringType, nullable = false),
    StructField("op", StringType, nullable = false),
    StructField("threshold", DoubleType, nullable = false),
    StructField("action", StringType, nullable = false),
    StructField("template", StringType, nullable = true)))

  private def resolve(path: String): java.nio.file.Path = {
    // cwd-relative first (sbt forks run from the project base), then an
    // explicit env override, then the canonical checkout location — a
    // harness launched from another working directory must not fail
    // EventQueries' object init
    val candidates =
      Seq(java.nio.file.Paths.get(path)) ++
        sys.env.get("GRAFT_REPO_ROOT")
          .map(r => java.nio.file.Paths.get(r).resolve(path)) ++
        Seq(java.nio.file.Paths.get("/root/repo").resolve(path))
    candidates.find(java.nio.file.Files.exists(_)).getOrElse(
      throw new IllegalArgumentException(
        s"control-plane fixture not found at any of " +
          s"${candidates.mkString(", ")} (cwd ${
            System.getProperty("user.dir")})"))
  }

  /** Config rows are user data: enforce the invariants the compiled-in
    * constants used to guarantee, with row-addressed messages instead
    * of a NoSuchElementException out of oracle-SQL generation. A
    * START-cut journey (no end_type) drives the payload-count branch,
    * so it must name a payload_type.
    */
  private def validateInstance(j: EventOps.JourneySpec)
      : EventOps.JourneySpec = {
    require(j.members.nonEmpty,
      s"journey ${j.journeyId}: members must be non-empty")
    require(j.members.contains(j.startType),
      s"journey ${j.journeyId}: start_type ${j.startType} not a member")
    require(j.endType.nonEmpty || j.payloadType.nonEmpty,
      s"journey ${j.journeyId}: a START-cut journey (end_type null) " +
        "must set payload_type")
    j
  }

  /** The journey config table: one row per DAG edge, explicit schema. */
  def journeysTable(spark: SparkSession,
                    path: String = JourneysPath): DataFrame =
    spark.read.schema(JourneySchema).json(resolve(path).toString)

  /** The rule config table: one row per rule, explicit schema. */
  def rulesTable(spark: SparkSession,
                 path: String = RulesPath): DataFrame =
    spark.read.schema(RuleSchema).json(resolve(path).toString)

  /** Compile the edge table to the fused operators' journey spec:
    * (journey_id, edge list) sorted by journey_id, edges by `ord`.
    */
  def compileJourneys(df: DataFrame): Seq[(String, Seq[Dag.Edge])] =
    df.collect()
      .map(r => (r.getString(0), r.getInt(1),
        Dag.Edge(Option(r.getString(2)), Option(r.getString(3)))))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (jid, rows) =>
        jid -> rows.sortBy(_._2).map(_._3).toSeq
      }

  /** Compile one rule group to [[EventOps.AlertRule]]s, rule_id order. */
  def compileRules(df: DataFrame, group: String): Seq[EventOps.AlertRule] =
    df.collect()
      .filter(_.getString(0) == group)
      .map(r => EventOps.AlertRule(r.getString(1), r.getString(2),
        r.getString(3), r.getString(4), r.getDouble(5), r.getString(6),
        Option(r.getString(7)).getOrElse("")))
      .sortBy(_.id).toSeq

  /** The instance-journey config table (R3's START/END/payload specs). */
  def instancesTable(spark: SparkSession,
                     path: String = InstancesPath): DataFrame =
    spark.read.schema(InstanceSchema).json(resolve(path).toString)

  /** Compile the instance table to [[EventOps.JourneySpec]]s. */
  def compileInstances(df: DataFrame): Seq[EventOps.JourneySpec] =
    df.collect()
      .map(r => validateInstance(EventOps.JourneySpec(r.getString(0),
        r.getSeq[String](1).toSeq, r.getString(2),
        Option(r.getString(3)),
        !r.isNullAt(4) && r.getBoolean(4),
        Option(r.getString(5)))))
      .sortBy(_.journeyId).toSeq

  /** The registered queries' journey set, via the config-table ingest. */
  def journeys(spark: SparkSession): Seq[(String, Seq[Dag.Edge])] =
    compileJourneys(journeysTable(spark))

  /** The registered queries' instance-journey set, via the table. */
  def instances(spark: SparkSession): Seq[EventOps.JourneySpec] =
    compileInstances(instancesTable(spark))

  /** The registered queries' rule set, via the config-table ingest. */
  def rules(spark: SparkSession, group: String): Seq[EventOps.AlertRule] =
    compileRules(rulesTable(spark), group)

  // ---- session-free parse (oracle-SQL generation time) -------------------

  private def mapper = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    m
  }

  private def jsonLines(path: String)
      : Seq[com.fasterxml.jackson.databind.JsonNode] = {
    val m = mapper
    val stream = java.nio.file.Files.lines(resolve(path))
    try scala.jdk.CollectionConverters
        .IteratorHasAsScala(stream.iterator()).asScala
      .map(_.trim).filter(_.nonEmpty)
      .map(m.readTree).toSeq
    finally stream.close()
  }

  private def optText(n: com.fasterxml.jackson.databind.JsonNode,
                      f: String): Option[String] =
    Option(n.get(f)).filterNot(_.isNull).map(_.asText)

  /** Jackson twin of [[journeys]] — identical output, no session. */
  def journeysLocal(path: String = JourneysPath)
      : Seq[(String, Seq[Dag.Edge])] =
    jsonLines(path)
      .map(n => (n.get("journey_id").asText, n.get("ord").asInt,
        Dag.Edge(optText(n, "left"), optText(n, "right"))))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (jid, rows) => jid -> rows.sortBy(_._2).map(_._3) }

  /** Jackson twin of [[instances]] — identical output, no session. */
  def instancesLocal(path: String = InstancesPath)
      : Seq[EventOps.JourneySpec] =
    jsonLines(path)
      .map { n =>
        val ms = scala.jdk.CollectionConverters
          .IteratorHasAsScala(n.get("members").elements()).asScala
          .map(_.asText).toSeq
        validateInstance(EventOps.JourneySpec(
          n.get("journey_id").asText, ms,
          n.get("start_type").asText, optText(n, "end_type"),
          Option(n.get("payload_required")).exists(_.asBoolean),
          optText(n, "payload_type")))
      }
      .sortBy(_.journeyId)

  /** Jackson twin of [[rules]] — identical output, no session. */
  def rulesLocal(group: String, path: String = RulesPath)
      : Seq[EventOps.AlertRule] =
    jsonLines(path)
      .filter(_.get("group").asText == group)
      .map(n => EventOps.AlertRule(n.get("rule_id").asText,
        n.get("event_type").asText, n.get("field").asText,
        n.get("op").asText, n.get("threshold").asDouble,
        n.get("action").asText, optText(n, "template").getOrElse("")))
      .sortBy(_.id)
}

package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.ConfigOps
import graft.operators.ConfigOps.{MigrationRule, ModeRule}

/** Driver-gated queries for the installer-dataflow operators (SURVEY §2.A
  * A15/A16/A21/A23 — the rows previously ledgered `n/a`), each with a full
  * DuckDB oracle. The harness tables stand in for the fleet being swept:
  * `nation` plays the per-node config inventory, `events` plays the marker
  * artifacts, `part` plays the installed-package listings.
  */
object ConfigQueries {

  // ---- A15: ${VAR:-default} template rendering over a vars inventory ------

  /** Fixed service template; REGION is bound only for even regions (default
    * path), TAG is never bound (always default), MISSING has no default and
    * no binding (token survives verbatim — the greppable-leftover rule).
    */
  private val Template = "host=${HOST:-localhost} port=${PORT:-8080} " +
    "region=${REGION:-unset} tag=${TAG:-v1} raw=${MISSING}"

  def configRender(s: SparkSession, dir: String): DataFrame = {
    val n = Tables.load(s, dir, "nation")
    val base = Seq(lit("HOST") -> lower(col("n_name")),
      lit("PORT") -> (col("n_nationkey") + 8000).cast("string"))
    val withRegion = base :+
      (lit("REGION") -> concat(lit("r"), col("n_regionkey").cast("string")))
    def mkMap(kv: Seq[(Column, Column)]) =
      map(kv.flatMap(p => Seq(p._1, p._2)): _*)
    val vars = when(col("n_regionkey") % 2 === 0, mkMap(withRegion))
      .otherwise(mkMap(base))
    n.select(col("n_nationkey"),
        ConfigOps.renderTemplate(lit(Template), vars).as("rendered"))
      .orderBy("n_nationkey")
  }

  val configRenderSql: String =
    """SELECT n_nationkey,
      |  'host=' || lower(n_name) ||
      |  ' port=' || CAST(8000 + n_nationkey AS VARCHAR) ||
      |  ' region=' || CASE WHEN n_regionkey % 2 = 0
      |    THEN 'r' || CAST(n_regionkey AS VARCHAR) ELSE 'unset' END ||
      |  ' tag=v1 raw=${MISSING}' AS rendered
      |FROM nation ORDER BY n_nationkey""".stripMargin

  // ---- A16: conditional regex migration of a config-lines inventory -------

  /** Synthesized per-nation compose-file lines (deterministic from the
    * nation row, mirrored line-for-line in the oracle CTE). One scan +
    * explode — the single-pass shape a fleet-sized entity table needs.
    */
  private def configLines(s: SparkSession, dir: String): DataFrame = {
    val n = Tables.load(s, dir, "nation")
    val port = (col("n_nationkey") * 37) % 1000 + 8000
    n.select(col("n_nationkey"), explode(array(
        struct(lit(1).as("line_no"),
          concat(lit("version: \"3."), (col("n_nationkey") % 10).cast("string"),
            lit("\"")).as("line")),
        struct(lit(2).as("line_no"),
          lit("image: dk/observability:v1").as("line")),
        struct(lit(3).as("line_no"),
          when(col("n_nationkey") % 2 === 0, "auth: none")
            .otherwise("auth: jwt").as("line")),
        struct(lit(4).as("line_no"),
          concat(lit("base_url: http://localhost:"),
            (col("n_nationkey") + 8000).cast("string"), lit("/api")).as("line")),
        struct(lit(5).as("line_no"),
          concat(lit("api_port: "), port.cast("string")).as("line")),
      )).as("l"))
      .select(col("n_nationkey"), col("l.line_no"), col("l.line"))
  }

  /** The five conditional rewrites (reference dk-installer.py:2093-2213):
    * guarded version bump, image retag, auth flip, base-url rewrite, and a
    * numeric-guarded port clamp (regex capture + cast in the guard — the
    * "conditional" the reference implements with Python around the regex).
    */
  private val MigrationRules = Seq(
    MigrationRule("version-bump",
      l => l.rlike("^version: ") && l =!= "version: \"3.9\"",
      _ => lit("version: \"3.9\"")),
    MigrationRule("image-retag",
      l => l.rlike(":v1$"),
      l => regexp_replace(l, ":v1$", ":v2")),
    MigrationRule("auth-jwt",
      l => l === "auth: none",
      _ => lit("auth: jwt")),
    MigrationRule("base-url",
      l => l.contains("http://localhost"),
      l => replace(l, lit("http://localhost"),
        lit("https://host.docker.internal"))),
    MigrationRule("port-clamp",
      // try_cast, not cast: a non-matching line extracts "" and under
      // ANSI a plain cast("")→int throws; correctness must not depend
      // on And short-circuit order
      l => regexp_extract(l, "^api_port: ([0-9]+)$", 1)
        .try_cast("int") > 8400,
      _ => lit("api_port: 8080")),
  )

  def configMigrate(s: SparkSession, dir: String): DataFrame =
    ConfigOps.migrate(configLines(s, dir), "line", MigrationRules)
      .filter(size(col("rules_applied")) > 0)
      .select(col("n_nationkey"), col("line_no"), col("line").as("old_line"),
        col("new_line"), array_join(col("rules_applied"), ",").as("rules"))
      .orderBy("n_nationkey", "line_no")

  val configMigrateSql: String =
    """WITH lines AS (
      |  SELECT n_nationkey, 1 AS line_no,
      |    'version: "3.' || CAST(n_nationkey % 10 AS VARCHAR) || '"' AS line
      |  FROM nation
      |  UNION ALL SELECT n_nationkey, 2, 'image: dk/observability:v1' FROM nation
      |  UNION ALL SELECT n_nationkey, 3, CASE WHEN n_nationkey % 2 = 0
      |    THEN 'auth: none' ELSE 'auth: jwt' END FROM nation
      |  UNION ALL SELECT n_nationkey, 4, 'base_url: http://localhost:' ||
      |    CAST(n_nationkey + 8000 AS VARCHAR) || '/api' FROM nation
      |  UNION ALL SELECT n_nationkey, 5, 'api_port: ' ||
      |    CAST((n_nationkey * 37) % 1000 + 8000 AS VARCHAR) FROM nation),
      |m1 AS (SELECT *, CASE WHEN regexp_matches(line, '^version: ')
      |    AND line <> 'version: "3.9"' THEN 'version: "3.9"'
      |    ELSE line END AS l1 FROM lines),
      |m2 AS (SELECT *, CASE WHEN regexp_matches(l1, ':v1$')
      |    THEN regexp_replace(l1, ':v1$', ':v2') ELSE l1 END AS l2 FROM m1),
      |m3 AS (SELECT *, CASE WHEN l2 = 'auth: none'
      |    THEN 'auth: jwt' ELSE l2 END AS l3 FROM m2),
      |m4 AS (SELECT *, CASE WHEN l3 LIKE '%http://localhost%'
      |    THEN replace(l3, 'http://localhost', 'https://host.docker.internal')
      |    ELSE l3 END AS l4 FROM m3),
      |m5 AS (SELECT *, CASE WHEN regexp_extract(l4, '^api_port: ([0-9]+)$', 1) <> ''
      |    AND CAST(regexp_extract(l4, '^api_port: ([0-9]+)$', 1) AS INT) > 8400
      |    THEN 'api_port: 8080' ELSE l4 END AS l5 FROM m4)
      |SELECT n_nationkey, line_no, line AS old_line, l5 AS new_line,
      |  concat_ws(',',
      |    CASE WHEN l1 <> line THEN 'version-bump' END,
      |    CASE WHEN l2 <> l1 THEN 'image-retag' END,
      |    CASE WHEN l3 <> l2 THEN 'auth-jwt' END,
      |    CASE WHEN l4 <> l3 THEN 'base-url' END,
      |    CASE WHEN l5 <> l4 THEN 'port-clamp' END) AS rules
      |FROM m5 WHERE l1 <> line OR l2 <> l1 OR l3 <> l2 OR l4 <> l3 OR l5 <> l4
      |ORDER BY n_nationkey, line_no""".stripMargin

  // ---- A21: marker-presence install-mode state machine ---------------------

  /** Precedence ladder over which event-type "markers" an entity produced
    * in a day — the install-mode shape: full marker set > legacy artifacts
    * without the marker > partial > broken > fresh.
    */
  private val ModeLadder = Seq(
    ModeRule("standard", Seq("signup", "purchase")),
    ModeRule("legacy", Seq("purchase"), Seq("signup")),
    ModeRule("trial", Seq("signup")),
    ModeRule("broken", Seq("error"), Seq("signup", "purchase")),
  )

  def markerModes(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day"), col("event_type"))
    ConfigOps.resolveModes(ev, Seq("user_id", "day"), "event_type",
        ModeLadder, "fresh")
      .select(col("user_id"), col("day"),
        array_join(col("markers"), ",").as("markers"), col("mode"))
      .orderBy("user_id", "day")
  }

  val markerModesSql: String =
    """WITH ev AS (SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
      |    event_type FROM events),
      |d AS (SELECT DISTINCT user_id, day, event_type FROM ev),
      |g AS (SELECT user_id, day,
      |    string_agg(event_type, ',' ORDER BY event_type) AS markers,
      |    max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS has_signup,
      |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS has_purchase,
      |    max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS has_error
      |  FROM d GROUP BY user_id, day)
      |SELECT user_id, day, markers,
      |  CASE WHEN has_signup = 1 AND has_purchase = 1 THEN 'standard'
      |       WHEN has_purchase = 1 AND has_signup = 0 THEN 'legacy'
      |       WHEN has_signup = 1 THEN 'trial'
      |       WHEN has_error = 1 AND has_signup = 0 AND has_purchase = 0
      |         THEN 'broken'
      |       ELSE 'fresh' END AS mode
      |FROM g ORDER BY user_id, day""".stripMargin

  // ---- A23: version extraction + pin join ----------------------------------

  private def pkgName = concat_ws("/", col("p_brand"), col("p_type"))
  private def pkgVersion = concat(lit("1."), col("p_size").cast("string"),
    lit("."), (col("p_partkey") % 10).cast("string"))

  /** Installed listing rendered to `pip list --format=json` shape, parsed
    * back with from_json (the extraction under test), first-seen version
    * per package joined against pins derived from the well-sized rows.
    */
  def versionPins(s: SparkSession, dir: String): DataFrame = {
    val part = Tables.load(s, dir, "part")
    val listings = part.select(col("p_partkey"), col("p_size"),
      to_json(array(struct(pkgName.as("name"), pkgVersion.as("version"))))
        .as("listing"))
    val parsed = ConfigOps.packagesFromJson(listings, "listing")
    val installed = parsed.groupBy("name")
      .agg(min_by(col("version"), col("p_partkey")).as("version"))
    val pins = parsed.filter(col("p_size") >= 15).groupBy("name")
      .agg(max_by(col("version"),
        col("p_size") * 10 + col("p_partkey") % 10).as("required"))
    ConfigOps.checkPins(installed, pins)
      .select("name", "version", "required", "status")
      .orderBy("name")
  }

  val versionPinsSql: String =
    """WITH pkg AS (SELECT p_partkey, p_size,
      |    p_brand || '/' || p_type AS name,
      |    '1.' || CAST(p_size AS VARCHAR) || '.' ||
      |      CAST(p_partkey % 10 AS VARCHAR) AS version
      |  FROM part),
      |inst AS (SELECT name, min_by(version, p_partkey) AS version
      |  FROM pkg GROUP BY name),
      |pins AS (SELECT name,
      |    max_by(version, p_size * 10 + p_partkey % 10) AS required
      |  FROM pkg WHERE p_size >= 15 GROUP BY name)
      |SELECT i.name, i.version, p.required,
      |  CASE WHEN p.required IS NULL THEN 'MISSING_PIN'
      |       WHEN (COALESCE(TRY_CAST(string_split(i.version, '.')[1] AS INT), 0),
      |             COALESCE(TRY_CAST(string_split(i.version, '.')[2] AS INT), 0),
      |             COALESCE(TRY_CAST(string_split(i.version, '.')[3] AS INT), 0)) <
      |            (COALESCE(TRY_CAST(string_split(p.required, '.')[1] AS INT), 0),
      |             COALESCE(TRY_CAST(string_split(p.required, '.')[2] AS INT), 0),
      |             COALESCE(TRY_CAST(string_split(p.required, '.')[3] AS INT), 0))
      |         THEN 'OUTDATED'
      |       ELSE 'OK' END AS status
      |FROM inst i LEFT JOIN pins p USING (name)
      |ORDER BY name""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "config_render_nation" -> (configRender _),
    "config_migrate_nation" -> (configMigrate _),
    "marker_modes_events" -> (markerModes _),
    "version_pins_part" -> (versionPins _),
  )

  val oracles: Map[String, String] = Map(
    "config_render_nation" -> configRenderSql,
    "config_migrate_nation" -> configMigrateSql,
    "marker_modes_events" -> markerModesSql,
    "version_pins_part" -> versionPinsSql,
  )
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.ConfigOps
import graft.operators.ConfigOps.{MigrationRule, ModeRule}

/** Installer-dataflow operators (SURVEY §2.A A15/A16/A21/A23): the generic
  * edges the registered nation/events/part queries don't reach.
  */
class ConfigSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- A15 renderTemplate --------------------------------------------------

  test("renderTemplate: bound > default > literal-token precedence") {
    val df = Seq(
      ("a=${A} b=${B:-bee} c=${C:-sea} d=${D}", Map("A" -> "1", "C" -> "3")),
    ).toDF("t", "vars")
    val out = df.select(
      ConfigOps.renderTemplate($"t", $"vars").as("r")).head.getString(0)
    // A bound, B falls to default, C bound beats default, D unset+no
    // default stays a visible literal token
    assert(out == "a=1 b=bee c=3 d=${D}")
  }

  test("renderTemplate: repeated token substituted everywhere; empty default") {
    val df = Seq(
      ("${X:-}/${X:-}/${Y:-y}", Map.empty[String, String]),
    ).toDF("t", "vars")
    val out = df.select(
      ConfigOps.renderTemplate($"t", $"vars").as("r")).head.getString(0)
    // shell semantics: ${X:-} with no binding and empty default renders
    // as the empty string, so the two X tokens collapse and only the
    // path separators remain: "" + "/" + "" + "/" + "y"
    assert(out == "//y")
  }

  test("renderTemplate: default containing special chars, var name charset") {
    val df = Seq(
      ("u=${BASE_URL:-http://x:8080/a-b} v=${_V2:-ok}",
        Map.empty[String, String]),
    ).toDF("t", "vars")
    val out = df.select(
      ConfigOps.renderTemplate($"t", $"vars").as("r")).head.getString(0)
    assert(out == "u=http://x:8080/a-b v=ok")
  }

  // ---- A16 migrate ---------------------------------------------------------

  test("migrate: later rules see earlier rules' output; report names both") {
    val lines = Seq((1, "image: a:v1")).toDF("id", "line")
    val rules = Seq(
      MigrationRule("retag", _.rlike(":v1$"),
        l => regexp_replace(l, ":v1$", ":v2")),
      // applies only to the ALREADY-retagged line — proves sequencing
      MigrationRule("registry", _.rlike(":v2$"),
        l => concat(lit("registry.local/"), l)),
    )
    val r = ConfigOps.migrate(lines, "line", rules)
      .select($"new_line", array_join($"rules_applied", ",")).head
    assert(r.getString(0) == "registry.local/image: a:v2")
    assert(r.getString(1) == "retag,registry")
  }

  test("migrate: non-matching lines pass through with empty rule list") {
    val lines = Seq((1, "untouched")).toDF("id", "line")
    val rules = Seq(MigrationRule("x", _ === "nope", _ => lit("never")))
    val r = ConfigOps.migrate(lines, "line", rules)
      .select($"new_line", size($"rules_applied")).head
    assert(r.getString(0) == "untouched" && r.getInt(1) == 0)
  }

  // ---- A21 resolveModes ----------------------------------------------------

  test("resolveModes: precedence ladder incl. forbidden markers + fallback") {
    val markers = Seq(
      ("n1", "marker"), ("n1", "compose"),   // full install
      ("n2", "compose"),                     // artifacts, no marker → legacy
      ("n3", "marker"),                      // marker only
      ("n4", "lockfile"),                    // unknown marker → fallback
    ).toDF("node", "m")
    val ladder = Seq(
      ModeRule("full", Seq("marker", "compose")),
      ModeRule("legacy", Seq("compose"), Seq("marker")),
      ModeRule("marker-only", Seq("marker")))
    val out = ConfigOps.resolveModes(markers, Seq("node"), "m", ladder,
        "fresh")
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(out == Map("n1" -> "full", "n2" -> "legacy",
      "n3" -> "marker-only", "n4" -> "fresh"))
  }

  // ---- A23 packagesFromJson / checkPins ------------------------------------

  test("packagesFromJson parses pip-list shape; checkPins flags 3 states") {
    val listing = Seq(
      (1, """[{"name":"a","version":"1.2.3"},{"name":"b","version":"2.0.0"}]"""),
      (2, """[{"name":"c","version":"0.9.10"}]"""),
    ).toDF("host", "listing")
    val pkgs = ConfigOps.packagesFromJson(listing, "listing")
    assert(pkgs.count() == 3)
    val pins = Seq(("a", "1.2.4"), ("b", "1.9.9")).toDF("name", "required")
    val st = ConfigOps.checkPins(
        pkgs.select($"name", $"version"), pins)
      .collect().map(r => r.getAs[String]("name") ->
        r.getAs[String]("status")).toMap
    // a: 1.2.3 < 1.2.4 component-wise; b: 2.0.0 > 1.9.9 (major wins over
    // bigger minor — the numeric, not lexicographic, compare); c unpinned
    assert(st == Map("a" -> "OUTDATED", "b" -> "OK", "c" -> "MISSING_PIN"))
  }

  test("versionParts: missing components compare as 0 (1.2 == 1.2.0)") {
    val pkgs = Seq(("a", "1.2")).toDF("name", "version")
    val pins = Seq(("a", "1.2.0")).toDF("name", "required")
    val st = ConfigOps.checkPins(pkgs, pins).head.getAs[String]("status")
    assert(st == "OK")
  }

  // ---- registered-query smoke over real testdata ---------------------------

  test("registered config queries run non-empty on sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val qs = graft.queries.ConfigQueries.queries
    qs.foreach { case (name, fn) =>
      assert(fn(spark, dir).count() > 0, s"$name returned no rows")
    }
  }
}

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

  // ---- ScalaCheck properties over hostile inputs ---------------------------
  // Both round-6 ConfigOps defects (ANSI element_at abort on short
  // versions; a wrong template expectation) were edge-of-the-input-space
  // bugs; these properties pin the whole class. Cases are drawn with
  // fixed seeds (same pattern as PropertySpec — no scalatest-scalacheck
  // bridge offline) and evaluated in ONE Spark job per family against a
  // pure-Scala model.

  import org.scalacheck.Gen
  import org.scalacheck.rng.Seed

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n * 4).iterator
      .flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))
      .take(n).toSeq

  test("property: checkPins matches pure tuple-compare on hostile versions") {
    // 1–4 components, each numeric, numeric-with-suffix ("3rc1" — pip
    // emits these), or fully non-numeric; semantics: first 3 components,
    // non-int → 0, missing → 0, tuple-wise compare
    val component = Gen.oneOf(
      Gen.choose(0, 40).map(_.toString),
      Gen.choose(0, 9).map(n => s"${n}rc1"),
      Gen.const("dev"))
    val version = Gen.choose(1, 4)
      .flatMap(k => Gen.listOfN(k, component)).map(_.mkString("."))
    def model(v: String): (Int, Int, Int) = {
      val p = v.split("\\.").padTo(3, "")
      def c(s: String) = s.toIntOption.getOrElse(0)
      (c(p(0)), c(p(1)), c(p(2)))
    }
    val cases = samples(Gen.zip(version, version), 300).zipWithIndex
      .map { case ((inst, req), i) => (s"p$i", inst, req) }
    val installed = cases.map { case (n, v, _) => (n, v) }
      .toDF("name", "version")
    val pins = cases.map { case (n, _, r) => (n, r) }.toDF("name", "required")
    val got = ConfigOps.checkPins(installed, pins)
      .select($"name", $"status").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (n, inst, req) =>
      import scala.math.Ordering.Implicits._
      val want = if (model(inst) < model(req)) "OUTDATED" else "OK"
      assert(got(n) == want, s"name=$n installed='$inst' required='$req'")
    }
  }

  test("property: renderTemplate matches pure fold-replace on hostile templates") {
    // segments: plain text, UNTERMINATED token openers, stray closers,
    // nested-looking "${A${B}" shapes, real tokens with/without defaults
    val name = Gen.oneOf("A", "B_2", "_c")
    val token = Gen.oneOf(
      name.map(n => s"$${$n}"),
      Gen.zip(name, Gen.oneOf("", "d", "x/y:z", "--")).map {
        case (n, d) => s"$${$n:-$d}"
      })
    val chunk = Gen.oneOf(token,
      Gen.oneOf("lit ", "${", "}", "${A", "$ {A}", "${:-x}", "${1A}",
        "$A", "a=b "))
    val template = Gen.choose(0, 6).flatMap(k => Gen.listOfN(k, chunk))
      .map(_.mkString)
    val bindings = Map("A" -> "1", "_c" -> "sea") // B_2 deliberately unbound
    val TokenRe = "\\$\\{[A-Za-z_][A-Za-z0-9_]*(?::-[^}]*)?\\}".r
    def model(t: String): String =
      TokenRe.findAllIn(t).toSeq.distinct.foldLeft(t) { (acc, tok) =>
        val inner = tok.stripPrefix("${").stripSuffix("}")
        val (n, dflt) = inner.split(":-", 2) match {
          case Array(x)    => (x, None)
          case Array(x, d) => (x, Some(d))
        }
        acc.replace(tok, bindings.get(n).orElse(dflt).getOrElse(tok))
      }
    val cases = samples(template, 300).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val df = cases.toDF("id", "t")
    val got = df.select($"id", ConfigOps.renderTemplate($"t",
        typedLit(bindings)).as("r"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    cases.foreach { case (i, t) =>
      assert(got(i) == model(t), s"template='$t'")
    }
  }

  test("property: resolveModes matches first-matching-rung model on overlapping ladders") {
    val universe = Seq("m1", "m2", "m3", "m4")
    val rung = for {
      req <- Gen.someOf(universe).suchThat(_.nonEmpty)
      forb <- Gen.someOf(universe.filterNot(req.contains))
    } yield ModeRule(s"", req.toSeq, forb.toSeq)
    val ladder0 = samples(Gen.choose(1, 5).flatMap(k =>
      Gen.listOfN(k, rung)), 1).head
    val ladder = ladder0.zipWithIndex.map { case (r, i) =>
      r.copy(mode = s"mode$i")
    }
    def model(s: Set[String]): String =
      ladder.find(r => r.required.forall(s) && !r.forbidden.exists(s))
        .map(_.mode).getOrElse("fb")
    // every subset of the universe as one entity — exhaustive, 16 rows
    val subsets = universe.toSet.subsets().toSeq.map(_.toSeq.sorted)
    val rows = subsets.zipWithIndex.flatMap { case (s, i) =>
      // empty subset: groupBy never sees the entity; plant a sentinel
      // marker outside the universe so the entity exists with no flags
      (if (s.isEmpty) Seq("none") else s).map(m => (s"e$i", m))
    }
    val got = ConfigOps.resolveModes(rows.toDF("node", "m"), Seq("node"),
        "m", ladder, "fb")
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    subsets.zipWithIndex.foreach { case (s, i) =>
      assert(got(s"e$i") == model(s.toSet),
        s"markers=$s ladder=${ladder.map(r =>
          (r.mode, r.required, r.forbidden))}")
    }
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

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Installer-dataflow operators (SURVEY §2.A rows A15, A16, A21, A23) —
  * the four rows previously ledgered `n/a (config layer)`, re-expressed as
  * distributed column programs so a fleet-wide config/inventory sweep (the
  * 100 TB analog: render + migrate + resolve state for millions of node
  * configs in one pass) runs as ordinary codegen'd Spark instead of a
  * driver-side loop.
  *
  * Reference behavior being modeled (not ported):
  *  - A15 `${VAR:-default}` template rewrite with computed defaults
  *    (reference dk-installer.py:137, 1921-1924).
  *  - A16 conditional in-place regex migration of compose YAML — version
  *    bump, image retag, auth flip, base-url rewrite, numeric-guarded port
  *    rewrite (dk-installer.py:2093-2213, five conditional rewrites).
  *  - A21 marker-file install-mode state machine with legacy detection
  *    (dk-installer.py:280-333): the install mode is a pure function of
  *    WHICH marker artifacts exist, resolved by a precedence ladder.
  *  - A23 version-extraction joins over `pip list --format=json`-shaped
  *    listings (dk-installer.py:1636-1654, 2428-2444): parse versions out
  *    of a JSON listing, join against required pins, flag mismatches.
  *
  * Everything here stays inside whole-stage codegen: regexp/replace/
  * aggregate lambdas for A15/A16, bool_or + CASE ladder for A21,
  * from_json + split/cast for A23. No UDFs, no driver loops.
  */
object ConfigOps {

  // ---- A15: template variable substitution ---------------------------------

  /** Matches `${NAME}` / `${NAME:-default}` tokens, full token in group 0. */
  private val TokenRe = "\\$\\{[A-Za-z_][A-Za-z0-9_]*(?::-[^}]*)?\\}"

  /** Render a `${VAR:-default}` template against a per-row map of variable
    * bindings, entirely with codegen'd collection lambdas: extract the
    * distinct tokens, then fold `replace` over them. Resolution order is
    * the reference's: bound value > `:-` default > the literal token left
    * in place (an unset var with no default stays visible rather than
    * silently vanishing — the debuggable choice, and the one a config
    * sweep can grep for afterwards).
    */
  def renderTemplate(template: Column, vars: Column): Column = {
    val tokens = array_distinct(
      regexp_extract_all(template, lit(TokenRe), lit(0)))
    aggregate(tokens, template, (acc: Column, tok: Column) => {
      val inner = regexp_replace(tok, "^\\$\\{|\\}$", "")
      val parts = split(inner, ":-", 2)
      val name = element_at(parts, 1)
      val dflt = when(size(parts) > 1, element_at(parts, 2))
      val resolved = coalesce(element_at(vars, name), dflt, tok)
      replace(acc, tok, resolved)
    })
  }

  // ---- A16: conditional regex config migration -----------------------------

  /** One conditional rewrite: `rewrite` applies only where `applies` holds;
    * other lines pass through unchanged. Mirrors the reference's "only
    * touch the line if the guard matches" in-place edits.
    */
  final case class MigrationRule(name: String,
                                 applies: Column => Column,
                                 rewrite: Column => Column)

  /** Run an ordered rule chain over a config-lines DataFrame. Appends
    * `new_line` (the line after every applicable rule ran, in order — later
    * rules see earlier rules' output, exactly like sequential in-place
    * file edits) and `rules_applied` (names of the rules that changed the
    * line, for the migration report).
    */
  def migrate(lines: DataFrame, lineCol: String,
              rules: Seq[MigrationRule]): DataFrame = {
    // output columns are reserved: silently overwriting a caller column
    // of the same name would corrupt the migration report
    for (reserved <- Seq("new_line", "rules_applied", "_nxt"))
      require(!lines.columns.contains(reserved),
        s"migrate: input already has a '$reserved' column — rename it; " +
          "'new_line' and 'rules_applied' are reserved output columns")
    val init = lines
      .withColumn("new_line", col(lineCol))
      .withColumn("rules_applied", array().cast(ArrayType(StringType)))
    // Each rule's rewritten value is aliased ONCE into a temp column and
    // every later use references the attribute. The straightforward
    // inline form (the full `when(next =!= cur, …)` expression repeated
    // in both output columns) let CollapseProject substitute each
    // level's expression into the next level's uses — the merged
    // projection grew past the JVM's 64 KB method limit, Janino failed
    // to compile the stage, and every run paid multi-second
    // compile-fail-fallback churn (4.5 s for a 125-row query at sf0.1).
    // With single-use aliasing the optimizer keeps one copy of every
    // rule expression and the stage compiles.
    val out = rules.foldLeft(init) { (df, r) =>
      val cur = col("new_line")
      df.withColumn("_nxt",
          when(r.applies(cur), r.rewrite(cur)).otherwise(cur))
        .withColumn("rules_applied",
          when(col("_nxt") =!= col("new_line"),
            array_append(col("rules_applied"), lit(r.name)))
            .otherwise(col("rules_applied")))
        .withColumn("new_line", col("_nxt"))
        .drop("_nxt")
    }
    // Optimizer fence over the chain outputs: a caller filtering the
    // result (every migration report does — "only changed lines") would
    // have the predicate pushed through the rule chain by alias
    // substitution, which multiplies at every level — one pushed
    // `size(rules_applied) > 0` inflated into ~190 copies of the rule
    // regexes and a generated method past the JVM's 64 KB limit (Janino
    // compile failure + multi-second fallback churn per run). The fence
    // (nondeterministic identity, zero runtime cost — see its scaladoc)
    // pins evaluation at this projection: downstream predicates see the
    // chain's OUTPUT attributes, one copy of every rule. Filter input
    // rows BEFORE migrate() — entity predicates do not push through.
    import graft.functions.OptimizerFence.fence
    val passthrough = out.columns
      .filterNot(c => c == "new_line" || c == "rules_applied")
    out.select(passthrough.map(col) :+
      fence(col("new_line")).as("new_line") :+
      fence(col("rules_applied")).as("rules_applied"): _*)
  }

  // ---- A21: marker-presence state machine ----------------------------------

  /** One rung of the precedence ladder: the first rung whose `required`
    * markers are all present and `forbidden` all absent wins.
    */
  final case class ModeRule(mode: String,
                            required: Seq[String],
                            forbidden: Seq[String] = Nil)

  /** Resolve a per-entity mode from which markers exist — the reference's
    * install-mode resolution (marker file > legacy artifacts > fresh) as
    * one shuffle: pivot marker presence to booleans with max-of-indicator
    * (bool_or), then fold the ladder into a CASE chain. `fallback` is the
    * no-rung-matched mode.
    *
    * Output: (entity cols, markers present as sorted array, mode).
    */
  def resolveModes(markers: DataFrame, entityCols: Seq[String],
                   markerCol: String, ladder: Seq[ModeRule],
                   fallback: String): DataFrame = {
    val universe = ladder.flatMap(r => r.required ++ r.forbidden).distinct
    val flags = universe.map(m =>
      max(when(col(markerCol) === m, 1).otherwise(0)).as(s"has_$m"))
    val byEntity = markers.groupBy(entityCols.map(col): _*)
      .agg(sort_array(collect_set(col(markerCol))).as("markers"),
        flags: _*)
    val mode = ladder.foldRight(lit(fallback)) { (r, rest) =>
      val ok = (r.required.map(m => col(s"has_$m") === 1) ++
        r.forbidden.map(m => col(s"has_$m") === 0)).reduce(_ && _)
      when(ok, lit(r.mode)).otherwise(rest)
    }
    byEntity.select(entityCols.map(col) :+ col("markers") :+
      mode.as("mode"): _*)
  }

  // ---- A23: version extraction + pin joins ---------------------------------

  /** Schema of one `pip list --format=json` element. */
  private val PkgSchema = ArrayType(StructType(Seq(
    StructField("name", StringType), StructField("version", StringType))))

  /** Parse a JSON package listing (`[{"name":…,"version":…},…]`) into one
    * row per package — the reference's `json.loads` + scan, as
    * from_json + explode.
    */
  def packagesFromJson(df: DataFrame, jsonCol: String): DataFrame =
    df.withColumn("pkg", explode(from_json(col(jsonCol), PkgSchema)))
      .select(df.columns.filter(_ != jsonCol).map(col) :+
        col("pkg.name").as("name") :+
        col("pkg.version").as("version"): _*)

  /** Numeric components of a dotted version, for tuple-wise comparison.
    * try_element_at, not element_at: under ANSI mode (the session
    * default) out-of-bounds element_at THROWS, so a 2-component version
    * like "1.2" would abort the job instead of zero-padding to 1.2.0.
    * try_cast for the same reason — a non-numeric component ("1.2rc1")
    * must compare as 0, not crash the stage.
    */
  def versionParts(v: Column): Seq[Column] =
    (1 to 3).map(i =>
      coalesce(try_element_at(split(v, "\\."), lit(i))
        .try_cast(IntegerType), lit(0)))

  /** `installed` (name, version) LEFT JOIN `pins` (name, required) and flag
    * each package OUTDATED / MISSING_PIN / OK by component-wise version
    * compare — the reference's installed-vs-required check as a broadcast
    * join (a pin set is always dimension-sized).
    */
  def checkPins(installed: DataFrame, pins: DataFrame): DataFrame = {
    val i = versionParts(col("version"))
    val r = versionParts(col("required"))
    val older = (i(0) < r(0)) ||
      (i(0) === r(0) && (i(1) < r(1) ||
        (i(1) === r(1) && i(2) < r(2))))
    installed.join(broadcast(pins), Seq("name"), "left")
      .withColumn("status",
        when(col("required").isNull, "MISSING_PIN")
          .when(older, "OUTDATED")
          .otherwise("OK"))
  }
}

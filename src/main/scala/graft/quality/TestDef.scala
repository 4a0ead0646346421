package graft.quality

/** A data-quality test definition.
  *
  * Mirrors the reference's test rows: `(kind, table, column, test_type,
  * description, result, message, "k=v, k=v" params)` —
  * reference demo/input_data/data_tests.csv (823 rows, 25 types) with the
  * param vocabulary Baseline_Value / Threshold_Value / Baseline_Ct /
  * Baseline_Value_Ct / Baseline_Unique_Ct / Baseline_Avg / Baseline_SD /
  * Baseline_Sum; param parsing at reference demo/demo/demo_helper.py:846-849.
  */
case class TestDef(table: String, column: String, testType: String,
                   params: Map[String, String], description: String = "") {
  def pD(k: String): Double = params(k).trim.toDouble
  def pDOr(k: String, dflt: Double): Double =
    params.get(k).map(_.trim.toDouble).getOrElse(dflt)
  def pS(k: String): String = params(k).trim
}

object TestDef {

  /** Parse the reference's `"Baseline_Value=7, Threshold_Value=0 "` param
    * string (reference demo/demo/demo_helper.py:846-849: split on ", " then
    * "="). List-of-values params contain commas inside parens —
    * `Baseline_Value=('No','Yes')` — so split only on ", " followed by a
    * key-looking token.
    */
  def parseParams(s: String): Map[String, String] = {
    if (s == null || s.trim.isEmpty || s.trim == "null") return Map.empty
    s.split(",\\s*(?=[A-Za-z_]+=)").iterator
      .map(_.trim).filter(_.nonEmpty)
      .map { kv =>
        val i = kv.indexOf('=')
        kv.substring(0, i).trim -> kv.substring(i + 1).trim
      }.toMap
  }

  /** Parse a list-of-values literal `('No','Yes')` into its members.
    * Commas inside quoted members — `('a,b','c')` — do not split, and a
    * doubled quote inside a member unescapes: `('it''s')` → `it's`.
    */
  def parseLov(s: String): Seq[String] = {
    val inner = s.trim.stripPrefix("(").stripSuffix(")")
    inner.split(",(?=(?:[^']*'[^']*')*[^']*$)").toSeq
      .map(_.trim.stripPrefix("'").stripSuffix("'").replace("''", "'"))
  }
}

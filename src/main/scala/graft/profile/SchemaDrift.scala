package graft.profile

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Schema-change anomaly detection — the "schema" member of the
  * reference's declared freshness / schema / volume / drift anomaly
  * family (reference README.md:207-209). A refresh is compared against
  * the baseline column inventory captured when the table was profiled:
  * added, removed, and type-changed columns surface as drift rows.
  *
  * This is metadata-only: at any data scale the check reads zero rows —
  * the live side comes from the DataFrame's schema (parquet footer /
  * catalog), the baseline side from the pinned profile.
  */
object SchemaDrift {

  /** Pure diff of (column → type label) inventories, ordered by column.
    * Statuses: ok | type_changed | added | removed.
    */
  def diff(baseline: Seq[(String, String)],
           live: Seq[(String, String)]): Seq[(String, String, String, String)] = {
    val b = baseline.toMap
    val l = live.toMap
    (baseline.map(_._1) ++ live.map(_._1)).distinct.sorted.map { c =>
      (b.get(c), l.get(c)) match {
        case (Some(bt), Some(lt)) if bt == lt => (c, bt, lt, "ok")
        case (Some(bt), Some(lt)) => (c, bt, lt, "type_changed")
        case (Some(bt), None)     => (c, bt, null, "removed")
        case (None, Some(lt))     => (c, null, lt, "added")
        case _                    => throw new IllegalStateException(c)
      }
    }
  }

  private def kindLabel(kind: String): String = kind match {
    case "json"         => "string"
    case "tsns"         => "timestamp"
    case "long"         => "bigint"
    case other          => other
  }

  /** Live DataFrame schema vs the pinned baseline inventory of `table`. */
  def againstPinned(df: DataFrame, table: String,
                    spark: SparkSession): DataFrame = {
    import spark.implicits._
    val live = df.schema.fields.toSeq
      .map(f => f.name -> Profiler.typeLabel(f.dataType))
    val base = graft.Tables.meta(table)
      .map { case (n, k) => n -> kindLabel(k) }
    diff(base, live)
      .toDF("column_name", "baseline_type", "current_type", "status")
      .orderBy("column_name")
  }

  /** DuckDB mirror: the baseline inventory is static, and an unchanged
    * table yields all-ok rows; the drift branches are gated by
    * ProfilerSpec (the oracle cannot mutate the live schema).
    */
  def oracleSql(table: String): String =
    graft.Tables.meta(table).sortBy(_._1).map { case (n, k) =>
      val t = kindLabel(k)
      s"SELECT '$n' AS column_name, '$t' AS baseline_type, " +
        s"'$t' AS current_type, 'ok' AS status"
    }.mkString("SELECT * FROM (\n", "\nUNION ALL\n",
      "\n) ORDER BY column_name")
}

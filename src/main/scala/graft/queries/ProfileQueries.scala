package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables
import graft.profile.{ProfileCompare, ProfileOracle, Profiler, SchemaDrift}
import graft.quality.PinnedBaselines

/** Profiling surface wired into the driver contract (SparkEntry). */
object ProfileQueries {

  private def prof(table: String)(s: SparkSession, dir: String): DataFrame =
    Profiler.profile(Tables.load(s, dir, table), table)

  /** Migration/baseline comparison: live lineitem profile vs the pinned
    * sf0.001 baseline (reference README.md:211 source-vs-target compare).
    */
  private def compareLineitem(s: SparkSession, dir: String): DataFrame =
    ProfileCompare.diffAgainstPinned(Tables.load(s, dir, "lineitem"),
      "lineitem", PinnedBaselines.lineitem, s)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "profile_customer" -> prof("customer") _,
    "profile_orders" -> prof("orders") _,
    "profile_lineitem" -> prof("lineitem") _,
    "profile_events" -> prof("events") _,
    "profile_documents" -> prof("documents") _,
    "profile_embeddings" -> prof("embeddings") _,
    "topk_c_mktsegment" -> ((s: SparkSession, dir: String) =>
      Profiler.topK(Tables.load(s, dir, "customer"), "customer",
        "c_mktsegment", 10)),
    "topk_event_type" -> ((s: SparkSession, dir: String) =>
      Profiler.topK(Tables.load(s, dir, "events"), "events",
        "event_type", 10)),
    "profile_compare_lineitem" -> (compareLineitem _),
    "schema_drift_events" -> ((s: SparkSession, dir: String) =>
      SchemaDrift.againstPinned(Tables.load(s, dir, "events"), "events", s)),
  )

  val oracles: Map[String, String] = Map(
    "profile_customer" -> ProfileOracle.sql("customer"),
    "profile_orders" -> ProfileOracle.sql("orders"),
    "profile_lineitem" -> ProfileOracle.sql("lineitem"),
    "profile_events" -> ProfileOracle.sql("events"),
    "profile_documents" -> ProfileOracle.sql("documents"),
    "profile_embeddings" -> ProfileOracle.sql("embeddings"),
    "topk_c_mktsegment" -> ProfileOracle.topKSql("customer", "c_mktsegment", 10),
    "topk_event_type" -> ProfileOracle.topKSql("events", "event_type", 10),
    "profile_compare_lineitem" ->
      ProfileCompare.pinnedOracleSql("lineitem", PinnedBaselines.lineitem),
    "schema_drift_events" -> SchemaDrift.oracleSql("events"),
  )
}

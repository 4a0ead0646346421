package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-harness table registry (driver parquet at /root/testdata/sf*, see
  * TESTDATA.md / FIXTURES.md §B). The static `meta` mirror is what the
  * DuckDB-oracle SQL generators use, so the oracle text can be produced
  * without a SparkSession.
  *
  * Column kinds: string | int | long | double | timestamp | tsns (ns-precision
  * parquet timestamp, needs CAST(.. AS TIMESTAMP) on the DuckDB side to match
  * Spark's micros truncation) | json (string holding JSON) | floatarr.
  */
object Tables {
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.types._

  /** Read a harness table, normalizing timestamps:
    *  - ns-precision parquet timestamps (events.ts) are readable only as
    *    LongType nanos (spark.sql.legacy.parquet.nanosAsLong=true, set by
    *    Verify/Bench); convert with integral `div 1000` → micros, matching
    *    DuckDB's own ns→µs truncation on read.
    *  - TIMESTAMP_NTZ (parquet isAdjustedToUTC=false) is cast to
    *    TimestampType; identical wall-clock under the UTC session TZ.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    raw.schema.fields.foldLeft(raw) { (df, f) =>
      f.dataType match {
        case LongType if meta.get(name).exists(_.contains(f.name -> "tsns")) =>
          df.withColumn(f.name,
            timestamp_micros(expr(s"${f.name} div 1000")))
        case TimestampNTZType =>
          df.withColumn(f.name, col(f.name).cast(TimestampType))
        case _ => df
      }
    }
  }

  val meta: Map[String, Seq[(String, String)]] = Map(
    "region" -> Seq("r_regionkey" -> "int", "r_name" -> "string"),
    "nation" -> Seq("n_nationkey" -> "int", "n_name" -> "string",
      "n_regionkey" -> "int"),
    "customer" -> Seq("c_custkey" -> "long", "c_name" -> "string",
      "c_nationkey" -> "int", "c_acctbal" -> "double",
      "c_mktsegment" -> "string"),
    "supplier" -> Seq("s_suppkey" -> "long", "s_name" -> "string",
      "s_nationkey" -> "int", "s_acctbal" -> "double"),
    "part" -> Seq("p_partkey" -> "long", "p_name" -> "string",
      "p_brand" -> "string", "p_type" -> "string", "p_size" -> "int",
      "p_retailprice" -> "double"),
    "orders" -> Seq("o_orderkey" -> "long", "o_custkey" -> "long",
      "o_orderstatus" -> "string", "o_totalprice" -> "double",
      "o_orderdate" -> "timestamp", "o_orderpriority" -> "string"),
    "lineitem" -> Seq("l_orderkey" -> "long", "l_partkey" -> "long",
      "l_suppkey" -> "long", "l_linenumber" -> "int",
      "l_quantity" -> "double", "l_extendedprice" -> "double",
      "l_discount" -> "double", "l_tax" -> "double",
      "l_returnflag" -> "string", "l_linestatus" -> "string",
      "l_shipdate" -> "timestamp"),
    "events" -> Seq("event_id" -> "long", "ts" -> "tsns",
      "user_id" -> "long", "event_type" -> "string", "value" -> "double",
      "props" -> "json"),
    "documents" -> Seq("doc_id" -> "long", "text" -> "string",
      "lang" -> "string", "source" -> "string", "n_chars" -> "long"),
    "embeddings" -> Seq("vec_id" -> "long", "embedding" -> "floatarr",
      "label" -> "int"),
  )
}

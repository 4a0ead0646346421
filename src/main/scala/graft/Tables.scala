package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-harness table registry (driver parquet at /root/testdata/sf*, see
  * TESTDATA.md / FIXTURES.md §B). The static `meta` mirror is what the
  * DuckDB-oracle SQL generators use, so the oracle text can be produced
  * without a SparkSession.
  *
  * Column kinds: string | int | long | double | timestamp | tsns (event-time
  * column whose physical layout has drifted across testdata generations —
  * TIMESTAMP(MICROS) today, INT64-nanos historically; normalize() keys on the
  * OBSERVED type, and the oracle side writes CAST(.. AS TIMESTAMP) so both
  * layouts land on micros) | json (string holding JSON) | floatarr.
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
    *
    * The observed file schema is validated against `meta` FIRST: a
    * regenerated testdata file whose physical types drifted must fail
    * loudly here, not be silently half-adapted downstream (round 6's
    * stream_sessions_bounded failure was exactly that — a reader
    * hardcoding the old INT64-nanos layout while the file had moved to
    * TIMESTAMP(MICROS)).
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    assertContract(raw.schema, name, s"$dir/$name.parquet")
    normalize(raw, name)
  }

  /** Fan a scan-shaped dataset out to the session's full task
    * parallelism before a compute-heavy per-row codec/synthesis
    * mapPartitions (r14, guide §1.2 "the distributed algorithm" +
    * §2.6 idle capacity). The harness documents table is ONE small
    * parquet file, so `spark.sql.files.openCostInBytes` (4 MB) makes
    * its scan a single input split — and every downstream media codec
    * ran single-task on a 32-core session: tools/QueryAnatomy measured
    * video_framesample_documents at wall 4.6 s / 4 tasks with
    * taskSec == wall (zero parallelism), same shape across the
    * audio/μ-law/JPEG/PNG/AVI/BPE codec queries. A round-robin
    * repartition of the id rows costs one control-plane-sized exchange
    * and buys cores-wide codec work.
    *
    * Scale posture: never SHRINKS a big input — the fan-out fires only
    * in the SMALL-source regime (optimizer size estimate below one
    * fanout-partition-per-core of 32 MiB splits), where the extra
    * exchange moves control-plane bytes; a corpus big enough to split
    * (the 100 TB layout) keeps its scan partitioning untouched. The
    * guard reads `optimizedPlan.stats` — logical planning only; the
    * first fanout implementation probed `.rdd.getNumPartitions`, which
    * compiles a SECOND physical plan + codegen for the un-repartitioned
    * subtree and measurably taxed every sub-second codec query (~0.3 to
    * 0.7 s: audio_meta 0.28 → 1.00 s in the r14 midpoint sweep; back to
    * ~0.3 s with the stats guard).
    */
  def fanout[T](ds: org.apache.spark.sql.Dataset[T])
      : org.apache.spark.sql.Dataset[T] = {
    if (sys.props.contains("graft.fanout.off")) return ds // A/B probes
    val par = ds.sparkSession.sparkContext.defaultParallelism
    val bytes = ds.queryExecution.optimizedPlan.stats.sizeInBytes
    // ABSOLUTE cap alongside the per-core threshold (r14 advice): the
    // par×32 MiB bound alone scales with parallelism, so on a 4000-core
    // session a ~100 GB input — which already scans with many splits —
    // would still be round-robin shuffled wholesale. Above 1 GiB an
    // input has ≥8 natural 128 MB splits and the single-split pathology
    // this fan-out exists for cannot occur.
    val cap = BigInt(par.toLong) * (32L << 20) min BigInt(1L << 30)
    if (bytes >= cap) ds
    else ds.repartition(par)
  }

  /** Timestamp normalization, shared by the batch reader and the
    * streaming file source (which derives its schema from the same
    * footer). Works on both batch and streaming frames — pure column
    * rewrites keyed on the OBSERVED type, never on an assumed layout.
    */
  def normalize(raw: DataFrame, name: String): DataFrame =
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

  /** Physical types each declared column kind may legally arrive as. */
  private def compatible(kind: String, dt: DataType): Boolean = kind match {
    case "string" | "json" => dt == StringType
    case "int"             => dt == IntegerType
    case "long"            => dt == LongType
    case "double"          => dt == DoubleType
    // plain event-time column; NTZ is normalized to TimestampType
    case "timestamp" => dt == TimestampType || dt == TimestampNTZType
    // historical ns-precision column: INT64 nanos (nanosAsLong), or the
    // regenerated TIMESTAMP(MICROS) layouts
    case "tsns" =>
      dt == LongType || dt == TimestampType || dt == TimestampNTZType
    case "floatarr" =>
      dt match {
        case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
        case _                                                  => false
      }
    case _ => false
  }

  /** Loud reader/file schema contract: every declared column must exist
    * with a compatible physical type (extra file columns are allowed —
    * additive schema evolution is fine; a missing or retyped declared
    * column is not).
    */
  def assertContract(observed: StructType, name: String,
                     path: String): Unit =
    meta.get(name).foreach { cols =>
      val byName = observed.fields.map(f => f.name -> f.dataType).toMap
      val bad = cols.flatMap { case (c, kind) =>
        byName.get(c) match {
          case None => Some(s"$c: declared '$kind' but MISSING from file")
          case Some(dt) if !compatible(kind, dt) =>
            Some(s"$c: declared '$kind' but file has ${dt.simpleString}")
          case _ => None
        }
      }
      if (bad.nonEmpty) throw new IllegalStateException(
        s"schema contract violation for table '$name' at $path: " +
          bad.mkString("; ") +
          s" (observed: ${observed.simpleString})")
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

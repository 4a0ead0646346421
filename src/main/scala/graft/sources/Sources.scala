package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source formats beyond parquet (SURVEY.md §2.D scans row):
  *
  *  - quoted CSV (reference A1, demo/demo/demo_helper.py:949-954 — the
  *    test-definition corpus ships as quoted CSV);
  *  - JSON-lines event capture (reference A14, dk-installer.py:856-891 —
  *    subprocess output captured as one JSON document per line);
  *  - embedded-JSON columns via from_json (event `props`, §1.2 metadata).
  *
  * All are thin, schema-explicit wrappers over Spark's native readers, so
  * pushdown/pruning behave exactly as for any DataSource scan. The JDBC
  * path ("in-database SQL execution", reference README.md:209) is covered
  * against embedded Derby: predicates reach the database as PushedFilters
  * (SourcesSpec asserts it), which is the reference's "no data copies"
  * philosophy — at 100 TB the filter runs where the data lives. ORC and
  * hive-partitioned parquet round out the columnar scan surface;
  * partition pruning turns a partition-key filter into a directory skip.
  */
object Sources {

  /** Quoted CSV with an explicit schema (never inferSchema at scale — it
    * double-scans the input).
    */
  def csv(spark: SparkSession, path: String, schema: StructType,
          header: Boolean = true): DataFrame =
    spark.read
      .option("header", header.toString)
      .option("quote", "\"")
      .option("escape", "\"")
      .schema(schema)
      .csv(path)

  /** The reference's 8-column test-definition CSV shape
    * (demo/input_data/data_tests.csv): kind, table, column, test_type,
    * description, result, message, params.
    */
  val TestDefCsvSchema: StructType = StructType(Seq(
    "kind", "table_name", "column_name", "test_type", "description",
    "result", "message", "params").map(StructField(_, StringType)))

  /** Read the reference-shaped test CSV into TestDefs (params parsed with
    * the quote-aware "k=v, k=v" parser).
    */
  def testDefsFromCsv(spark: SparkSession, path: String)
      : Seq[graft.quality.TestDef] = {
    csv(spark, path, TestDefCsvSchema, header = false).collect().toSeq
      .filter(_.getAs[String]("kind") == "dqe_test")
      .map { r =>
        graft.quality.TestDef(
          r.getAs[String]("table_name"), r.getAs[String]("column_name"),
          r.getAs[String]("test_type"),
          graft.quality.TestDef.parseParams(r.getAs[String]("params")),
          Option(r.getAs[String]("description")).getOrElse(""))
      }
  }

  /** JSON-lines file with explicit schema — one event document per line. */
  def jsonLines(spark: SparkSession, path: String,
                schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Parse an embedded JSON string column into a typed struct. */
  def parseJson(c: Column, schema: DataType): Column = from_json(c, schema)

  /** JDBC table scan. Catalyst pushes filters (and, with the DSv2 JDBC
    * path, aggregates) into the database — profile/test SQL executes
    * in-database with no data copies, per the reference's philosophy.
    */
  def jdbc(spark: SparkSession, url: String, table: String): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table).load()

  /** Register a DSv2 JDBC catalog (`spark.table(s"$name.SCHEMA.TABLE")`).
    * Unlike the v1 `format("jdbc")` reader, the v2 JDBCTableCatalog path
    * implements SupportsPushDownAggregates: MIN/MAX/COUNT/SUM group-bys
    * compile to database-side SQL and only the aggregated rows cross the
    * wire — the reference's "fast in-database SQL execution, no data
    * copies" (reference README.md:209). `PushedAggregates` in the scan
    * node proves it (asserted in SourcesSpec).
    */
  def registerJdbcCatalog(spark: SparkSession, name: String,
                          url: String): Unit = {
    spark.conf.set(s"spark.sql.catalog.$name",
      "org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.url", url)
    spark.conf.set(s"spark.sql.catalog.$name.pushDownAggregate", "true")
    spark.conf.set(s"spark.sql.catalog.$name.pushDownLimit", "true")
  }

  /** ORC scan with explicit schema (same pushdown/pruning as parquet). */
  def orc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** Hive-partitioned parquet write: one directory per distinct value of
    * `partitionCol`. A reader filtering on the partition column prunes
    * whole directories before any IO (PartitionFilters in the scan).
    */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(path)

  /** Chunked delivery to an external sink — the reference posts test
    * outcomes in batches of 100 per request (reference
    * demo/demo/demo_helper.py:803-816). Batches form per partition on the
    * executors; the driver never sees the rows. For streaming, call this
    * from inside foreachBatch.
    */
  def foreachBatched(df: DataFrame, batchSize: Int)
                    (send: Seq[org.apache.spark.sql.Row] => Unit): Unit =
    df.foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
      it.grouped(batchSize).foreach(g => send(g.toSeq))
    }

  /** Idempotency key of one delivered chunk: (micro-batch id, partition
    * id, chunk index within the partition) — deterministic for a given
    * batch content and partitioning, so a TASK retry or an epoch replay
    * re-sends a chunk under the SAME key and the receiving API can
    * deduplicate (the reference wraps every POST in retries-with-backoff,
    * dk-installer.py:1273-1281 — retries are only safe because re-sends
    * are recognizable).
    */
  final case class ChunkKey(batchId: Long, partitionId: Int,
                            chunkIndex: Int)

  /** [[foreachBatched]] with per-chunk idempotency keys: chunks form per
    * partition on the executors (the scale path — no coalesce, no
    * driver-side rows) and each is delivered as (key, rows). Use from
    * foreachBatch with the micro-batch id;
    * [[graft.streaming.StreamingOps.deliverBatchedIdempotent]] adds the
    * committed-batch ledger on top.
    */
  def foreachBatchedKeyed(df: DataFrame, batchSize: Int, batchId: Long)
      (send: (ChunkKey, Seq[org.apache.spark.sql.Row]) => Unit): Unit =
    df.foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      it.grouped(batchSize).zipWithIndex.foreach { case (g, ci) =>
        send(ChunkKey(batchId, pid, ci), g.toSeq)
      }
    }
}

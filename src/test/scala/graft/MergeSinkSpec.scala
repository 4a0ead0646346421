package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.ParquetMergeSink

/** Storage-backed keyed MERGE sink (r9): per-batch parquet deltas +
  * key-compacted latest-wins read — the production update-mode sink the
  * `stream_*_update` gates now run through. Asserts the three contract
  * pieces the driver oracle cannot see directly: replay idempotence
  * (a re-delivered batch overwrites, never appends), latest-wins merge
  * across batches, and the compaction bound on on-disk delta count.
  */
class MergeSinkSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def sinkIn(dir: java.nio.file.Path, every: Int = 8) =
    new ParquetMergeSink(spark, dir.toString, Seq("k"), every)

  private def batch(rows: (Long, String, Long)*) = {
    import spark.implicits._
    rows.toSeq.toDF("k", "v", "n")
  }

  private def readMap(s: ParquetMergeSink): Map[Long, (String, Long)] =
    s.read().collect()
      .map(r => r.getAs[Long]("k") ->
        (r.getAs[String]("v"), r.getAs[Long]("n"))).toMap

  test("latest-wins per key across batches; untouched keys survive") {
    val dir = java.nio.file.Files.createTempDirectory("mergesink")
    val s = sinkIn(dir)
    s.merge(batch((1L, "a", 1L), (2L, "b", 1L)), 0L)
    s.merge(batch((2L, "b2", 2L), (3L, "c", 2L)), 1L)
    assert(readMap(s) == Map(
      1L -> ("a", 1L), 2L -> ("b2", 2L), 3L -> ("c", 2L)))
  }

  test("replayed batch overwrites its own delivery — idempotent under " +
      "foreachBatch at-least-once") {
    val dir = java.nio.file.Files.createTempDirectory("mergesink")
    val s = sinkIn(dir)
    s.merge(batch((1L, "a", 1L)), 0L)
    s.merge(batch((2L, "b", 2L)), 1L)
    // restart replays batch 1 (deterministic content, redelivered)
    s.merge(batch((2L, "b", 2L)), 1L)
    val out = s.read().collect()
    assert(out.length == 2, "replay must not duplicate rows")
    assert(readMap(s) == Map(1L -> ("a", 1L), 2L -> ("b", 2L)))
  }

  test("compaction bounds the on-disk part count and preserves the " +
      "merged table, including replay-after-compact ties") {
    val dir = java.nio.file.Files.createTempDirectory("mergesink")
    val s = sinkIn(dir, every = 4)
    (0 to 9).foreach { i =>
      s.merge(batch((i.toLong % 3, s"v$i", i.toLong)), i.toLong)
    }
    // batches 0..9 with compactEvery=4 → folds at batch 4 and 8:
    // on disk = 1 base + deltas 9 (and any written after the last fold)
    assert(s.partCount <= 3,
      s"compaction must bound file count, saw ${s.partCount}")
    val expected = Map(
      0L -> ("v9", 9L), 1L -> ("v7", 7L), 2L -> ("v8", 8L))
    assert(readMap(s) == expected)
    // a batch replayed AFTER its rows were folded into the base: same
    // batch id as the base rows it duplicates — delta precedence breaks
    // the tie, content identical, table unchanged
    s.merge(batch((2L, "v8", 8L)), 8L)
    assert(readMap(s) == expected)
  }

  test("compaction publishes the new base BEFORE deleting folded " +
      "inputs: the crash-window state reads identically and a " +
      "re-compaction converges") {
    import java.nio.file.{Files, Path}
    import scala.jdk.CollectionConverters._
    def copyTree(from: Path, to: Path): Unit = {
      val walk = Files.walk(from)
      try walk.iterator().asScala.toSeq.foreach { p =>
        val t = to.resolve(from.relativize(p).toString)
        if (Files.isDirectory(p)) Files.createDirectories(t)
        else {
          Files.createDirectories(t.getParent)
          // the sink keeps standing files (_schema) at the root now —
          // a crash-window restore legitimately re-copies over them
          Files.copy(p, t,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        }
      } finally walk.close()
    }
    val dir = Files.createTempDirectory("mergesink")
    val s = sinkIn(dir, every = 0) // manual compaction only
    (0 to 5).foreach { i =>
      s.merge(batch((i.toLong % 2, s"v$i", i.toLong)), i.toLong)
    }
    val before = readMap(s)
    val save = Files.createTempDirectory("mergesink-save")
    copyTree(dir, save)
    s.compact(5L)
    assert(readMap(s) == before)
    // resurrect the folded inputs next to the published base — the
    // exact on-disk state of a crash between publish and delete
    copyTree(save, dir)
    assert(readMap(s) == before,
      "old+new base coexisting must read identically")
    // the restart's next compaction folds the leftovers away; base-5
    // already exists, so the publish takes the suffixed name
    s.compact(5L)
    assert(readMap(s) == before)
    assert(s.partCount == 1, s"expected one base, got ${s.partCount}")
  }

  test("compaction is bucket-targeted: a fold whose deltas touch one " +
      "bucket leaves the other bucket's base files unread and unmoved") {
    import java.nio.file.{Files, Path}
    import scala.jdk.CollectionConverters._
    // find two keys landing in different buckets of a 2-bucket layout
    // (the sink's own hash: pmod(xxhash64(k), 2))
    val hashed = spark.range(0, 16)
      .select(col("id"), pmod(xxhash64(col("id")), lit(2L)).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val kA = hashed.collectFirst { case (k, 0L) => k }.get
    val kB = hashed.collectFirst { case (k, 1L) => k }.get
    val dir = Files.createTempDirectory("mergesink")
    val s = new ParquetMergeSink(spark, dir.toString, Seq("k"),
      compactEvery = 0, nBuckets = 2)
    s.merge(batch((kA, "a0", 0L), (kB, "b0", 0L)), 0L)
    s.compact(0L) // base-0 now holds both buckets
    def leafState(p: Path): Map[String, Long] = {
      val walk = Files.walk(p)
      try walk.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .map(f => f.toString -> Files.getLastModifiedTime(f).toMillis)
        .toMap
      finally walk.close()
    }
    val base0 = dir.resolve("base-000000000")
    val bucketA = base0.resolve("__bucket=0")
    assert(Files.isDirectory(bucketA), "fixture expects bucket 0 in base-0")
    val before = leafState(bucketA)
    assert(before.nonEmpty)
    // deltas touching ONLY bucket B, then a fold
    s.merge(batch((kB, "b1", 1L)), 1L)
    s.compact(1L)
    // bucket A's files: same paths, same mtimes — never rewritten or
    // moved by the bucket-B fold; base-0 survives as its generation
    assert(leafState(bucketA) == before,
      "untouched bucket's base files must be unread/unmoved")
    assert(!Files.exists(base0.resolve("__bucket=1")),
      "touched bucket must migrate to the new generation")
    assert(readMap(s) == Map(kA -> ("a0", 0L), kB -> ("b1", 1L)))
    // and a later fold touching bucket A migrates it, emptying base-0
    s.merge(batch((kA, "a2", 2L)), 2L)
    s.compact(2L)
    assert(!Files.exists(base0),
      "a generation whose buckets are all folded must disappear")
    assert(readMap(s) == Map(kA -> ("a2", 2L), kB -> ("b1", 1L)))
  }

  test("append mode (no keys): readAll preserves every row, replay " +
      "overwrites, and concat-compaction keeps replay idempotence") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mergesink")
    val s = new ParquetMergeSink(spark, dir.toString, Nil,
      compactEvery = 0)
    def rows(ps: (Long, String)*) = ps.toSeq.toDF("k", "v")
    s.merge(rows(1L -> "a", 2L -> "b"), 0L)
    s.merge(rows(3L -> "c"), 1L)
    s.merge(rows(3L -> "c"), 1L) // replay: overwrite, never append
    def all(s: ParquetMergeSink): Set[(Long, String)] =
      s.readAll().collect()
        .map(r => (r.getAs[Long]("k"), r.getAs[String]("v"))).toSet
    assert(s.readAll().count() == 3)
    assert(all(s) == Set(1L -> "a", 2L -> "b", 3L -> "c"))
    // concat-compaction: same rows, bounded parts
    s.compact(1L)
    assert(s.partCount == 1)
    assert(s.readAll().count() == 3)
    assert(all(s) == Set(1L -> "a", 2L -> "b", 3L -> "c"))
    // a batch replayed AFTER being folded: its live delta supersedes
    // the base rows carrying the same batch id — no double count, in
    // readAll and through the NEXT compaction alike
    s.merge(rows(3L -> "c"), 1L)
    assert(s.readAll().count() == 3)
    s.compact(1L)
    assert(s.readAll().count() == 3)
    assert(all(s) == Set(1L -> "a", 2L -> "b", 3L -> "c"))
    // auto-compaction in append mode is valid (r9 ADVICE: the old
    // "__none" placeholder key made batch 8 an AnalysisException)
    val s2 = new ParquetMergeSink(spark, java.nio.file.Files
      .createTempDirectory("mergesink").toString, Nil, compactEvery = 4)
    (0 to 9).foreach(i => s2.merge(rows(i.toLong -> s"v$i"), i.toLong))
    assert(s2.partCount <= 3)
    assert(s2.readAll().count() == 10)
  }

  test("zero-row batches read back as an empty table, not an error — " +
      "through merges, compaction, and mixes with non-empty batches") {
    val dir = java.nio.file.Files.createTempDirectory("mergesink")
    val s = new ParquetMergeSink(spark, dir.toString, Seq("k"),
      compactEvery = 0)
    // an all-empty stream: every batch delivers zero rows
    s.merge(batch().limit(0), 0L)
    s.merge(batch().limit(0), 1L)
    assert(s.read().count() == 0, "all-empty stream must read empty")
    s.compact(1L)
    assert(s.read().count() == 0, "all-empty fold must stay readable")
    // an empty batch sandwiched between real ones changes nothing
    s.merge(batch((1L, "a", 1L)), 2L)
    s.merge(batch().limit(0), 3L)
    assert(readMap(s) == Map(1L -> ("a", 1L)))
    s.compact(3L)
    assert(readMap(s) == Map(1L -> ("a", 1L)))
  }

  test("point-lookup read prunes to the buckets the keys hash into: " +
      "only matching __bucket= leaf dirs are listed, result matches " +
      "the full merged view") {
    import java.nio.file.Files
    // two keys in different buckets of a 2-bucket layout
    val hashed = spark.range(0, 16)
      .select(col("id"), pmod(xxhash64(col("id")), lit(2L)).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val kA = hashed.collectFirst { case (k, 0L) => k }.get
    val kB = hashed.collectFirst { case (k, 1L) => k }.get
    val dir = Files.createTempDirectory("mergesink")
    val s = new ParquetMergeSink(spark, dir.toString, Seq("k"),
      compactEvery = 0, nBuckets = 2)
    s.merge(batch((kA, "a0", 0L), (kB, "b0", 0L)), 0L)
    s.compact(0L)
    s.merge(batch((kA, "a1", 1L), (kB, "b1", 1L)), 1L)
    // directory-level pruning: bucket 0's lookup set never names a
    // __bucket=1 leaf, across base generation AND live delta
    val paths0 = s.lookupPaths(Set(0L)).map(_.toString)
    assert(paths0.nonEmpty)
    assert(paths0.forall(_.endsWith("__bucket=0")),
      s"selective lookup listed non-matching dirs: $paths0")
    assert(paths0.size == 2, s"expected base+delta bucket dirs: $paths0")
    // and the merged point lookup agrees with the full read
    import spark.implicits._
    val out = s.read(Seq(kA).toDF("k")).collect()
      .map(r => r.getAs[Long]("k") ->
        (r.getAs[String]("v"), r.getAs[Long]("n"))).toMap
    assert(out == Map(kA -> ("a1", 1L)))
    // a key that was never written reads as zero rows, not an error
    val missing = hashed.keys.max + 100L
    assert(s.read(Seq(missing).toDF("k")).count() == 0)
  }

  test("delta-volume-scaled cadence: sparse folds are skipped below " +
      "compactMinBytes, maxDeltas backstops the file count, and a " +
      "byte-heavy cadence point still folds") {
    val dir = java.nio.file.Files.createTempDirectory("mergesink")
    // tiny batches never reach 1 GiB → cadence points skip the fold;
    // maxDeltas=6 forces one anyway before the dir list grows unbounded
    val s = new ParquetMergeSink(spark, dir.toString, Seq("k"),
      compactEvery = 2, nBuckets = 2,
      compactMinBytes = 1L << 30, maxDeltas = 6)
    (0 to 4).foreach(i => s.merge(batch((i.toLong, s"v$i", i.toLong)),
      i.toLong))
    assert(s.partCount == 5,
      s"sparse deltas must skip the cadence fold, saw ${s.partCount}")
    (5 to 6).foreach(i => s.merge(batch((i.toLong, s"v$i", i.toLong)),
      i.toLong))
    assert(s.partCount <= 3,
      s"maxDeltas must force a fold, saw ${s.partCount}")
    assert(s.read().count() == 7)
    // a low threshold folds at the cadence point as before
    val dir2 = java.nio.file.Files.createTempDirectory("mergesink")
    val s2 = new ParquetMergeSink(spark, dir2.toString, Seq("k"),
      compactEvery = 2, nBuckets = 2, compactMinBytes = 1L)
    (0 to 2).foreach(i => s2.merge(batch((i.toLong, s"v$i", i.toLong)),
      i.toLong))
    assert(s2.partCount <= 2,
      s"byte-heavy cadence point must fold, saw ${s2.partCount}")
  }

  test("flat-empty base generations are reclaimed: repeated all-empty " +
      "folds keep at most one empty generation on disk") {
    import java.nio.file.Files
    import scala.jdk.CollectionConverters._
    val dir = Files.createTempDirectory("mergesink")
    val s = new ParquetMergeSink(spark, dir.toString, Seq("k"),
      compactEvery = 0)
    def baseCount: Int = {
      val walk = Files.list(dir)
      try walk.iterator().asScala
        .count(_.getFileName.toString.startsWith("base-"))
      finally walk.close()
    }
    // three rounds of zero-row batches, each followed by a fold — the
    // r10-advice leak published a new empty base per round forever
    (0 to 2).foreach { round =>
      s.merge(batch().limit(0), round * 2L)
      s.merge(batch().limit(0), round * 2L + 1)
      s.compact(round * 2L + 1)
      assert(s.read().count() == 0)
    }
    assert(baseCount <= 1,
      s"empty generations must be reclaimed, saw $baseCount")
    // and a data-bearing generation is never swept by the reclaim
    s.merge(batch((1L, "a", 1L)), 10L)
    s.compact(10L)
    s.merge(batch().limit(0), 11L)
    s.compact(11L)
    assert(readMap(s) == Map(1L -> ("a", 1L)))
  }

  test("read is distributed: merged plan carries no driver-side " +
      "collection and resolves keys via one window") {
    val dir = java.nio.file.Files.createTempDirectory("mergesink")
    val s = sinkIn(dir)
    s.merge(batch((1L, "a", 1L)), 0L)
    s.merge(batch((1L, "a2", 2L)), 1L)
    val plan = s.read().queryExecution.executedPlan.toString
    assert(plan.contains("Window") || plan.contains("WindowGroupLimit"),
      s"expected windowed latest-wins, got:\n$plan")
  }

  test("schema-evolved deltas keep their new column over old roots — " +
      "merged on read and through a fold, nulls for history") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mergesink")
    val s = sinkIn(dir)
    s.merge(batch((1L, "a", 1L), (2L, "b", 1L)), 0L)
    // upgraded application restarts the stream with an ADDED column:
    // the sink must not let single-file schema inference (which reads
    // the OLDEST root) silently drop it from the merged view
    val evolved = Seq((2L, "b2", 2L, "x"), (3L, "c", 2L, "y"))
      .toDF("k", "v", "n", "extra")
    s.merge(evolved, 1L)
    def extras =
      s.read().collect()
        .map(r => r.getAs[Long]("k") ->
          Option(r.getAs[String]("extra"))).toMap
    val before = extras
    assert(before == Map(
      1L -> None, 2L -> Some("x"), 3L -> Some("y")))
    // the fold reads the same multi-root set: the merged schema (and
    // the evolved rows' values) must survive compaction
    s.compact(1L)
    assert(extras == before)
  }

  test("concurrent-writer fencing: a second writer fences the first — " +
      "stale merges and mid-fold publishes fail loudly, reads stay " +
      "consistent with exactly one winner") {
    val dir = java.nio.file.Files.createTempDirectory("mergesink")
    val w1 = sinkIn(dir, every = 0)
    w1.merge(batch((1L, "a", 1L), (2L, "b", 1L)), 0L)
    // a second writer (restarted application instance, or a mispointed
    // second stream) opens the same directory: higher epoch, w1 fenced
    val w2 = sinkIn(dir, every = 0)
    w2.merge(batch((2L, "b2", 2L)), 1L)
    // the stale writer can neither deliver a batch nor fold
    intercept[IllegalStateException](w1.merge(batch((3L, "x", 9L)), 2L))
    intercept[IllegalStateException](w1.compact(1L))
    // the winner's view is intact: w1's pre-fence delivery plus w2's
    assert(readMap(w2) == Map(
      1L -> ("a", 1L), 2L -> ("b2", 2L)))
    // the fold-race window specifically: a fence landing DURING w2's
    // fold (after its tmp was written, before publish) must abort the
    // publish — no new base generation appears, no folded input is
    // deleted, and the read is unchanged
    w2.beforePublishHook = () => java.nio.file.Files.createFile(
      dir.resolve(f"_writer-${Long.MaxValue}%019d"))
    val partsBefore = w2.partCount
    intercept[IllegalStateException](w2.compact(1L))
    assert(w2.partCount == partsBefore,
      "aborted fold must neither publish nor delete inputs")
    assert(readMap(w2) == Map(1L -> ("a", 1L), 2L -> ("b2", 2L)))
    // and no stray tmp dir survives the abort
    val walk = java.nio.file.Files.list(dir)
    try assert(!scala.jdk.CollectionConverters.IteratorHasAsScala(
        walk.iterator()).asScala
      .exists(_.getFileName.toString.startsWith("tmp-")))
    finally walk.close()
  }

  test("mid-DELIVERY fence window (r12 advice): a writer fenced after " +
      "its delta's tmp write but before the rename must not publish — " +
      "the delta stays invisible and the tmp dir is swept; superseded " +
      "_writer-* lease files are GC'd on claim") {
    val dir = java.nio.file.Files.createTempDirectory("mergesink")
    val w1 = sinkIn(dir, every = 0)
    w1.merge(batch((1L, "a", 1L)), 0L)
    val w2 = sinkIn(dir, every = 0)
    // lease GC: w2's claim removed w1's superseded lease file — exactly
    // one _writer-* remains (the max epoch), so the fence still holds
    def leases = {
      val walk = java.nio.file.Files.list(dir)
      try scala.jdk.CollectionConverters.IteratorHasAsScala(
          walk.iterator()).asScala
        .filter(_.getFileName.toString.startsWith("_writer-")).toSeq
      finally walk.close()
    }
    assert(leases.size == 1, s"superseded leases must be GC'd: $leases")
    // land a fence INSIDE w2's delivery window: tmp delta written, not
    // yet renamed — the merge must abort, publish nothing, sweep tmp
    w2.beforeDeltaPublishHook = () => java.nio.file.Files.createFile(
      dir.resolve(f"_writer-${Long.MaxValue}%019d"))
    val partsBefore = w2.partCount
    intercept[IllegalStateException](w2.merge(batch((2L, "b", 2L)), 1L))
    assert(w2.partCount == partsBefore,
      "aborted delivery must not add a delta root")
    assert(readMap(w2) == Map(1L -> ("a", 1L)),
      "the fenced writer's mid-flight delta must stay invisible")
    val walk2 = java.nio.file.Files.list(dir)
    try assert(!scala.jdk.CollectionConverters.IteratorHasAsScala(
        walk2.iterator()).asScala
      .exists(_.getFileName.toString.startsWith("tmp-")),
      "aborted delivery must sweep its tmp dir")
    finally walk2.close()
  }

  test("upgrade-path bootstrap: a sink dir created before the _schema " +
      "bookkeeping still detects an evolved restart (r11 advice)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mergesink")
    val s = sinkIn(dir)
    s.merge(batch((1L, "a", 1L), (2L, "b", 1L)), 0L)
    // simulate the pre-r11 on-disk state: roots exist, no bookkeeping
    java.nio.file.Files.deleteIfExists(dir.resolve("_schema"))
    java.nio.file.Files.deleteIfExists(dir.resolve("_evolved"))
    // a fresh sink instance (restarted application) delivers an EVOLVED
    // batch as its first write; seeding the fingerprint from that batch
    // would mark the sink never-evolved and silently drop the column
    val s2 = sinkIn(dir)
    s2.merge(Seq((3L, "c", 2L, "y")).toDF("k", "v", "n", "extra"), 1L)
    assert(java.nio.file.Files.exists(dir.resolve("_evolved")),
      "bootstrap against on-disk roots must detect the evolution")
    val out = s2.read().collect()
      .map(r => r.getAs[Long]("k") ->
        Option(r.getAs[String]("extra"))).toMap
    assert(out == Map(1L -> None, 2L -> None, 3L -> Some("y")))
    // and the non-evolved upgrade path stays unmarked: same-schema
    // first write over pre-bookkeeping roots must NOT pay merge reads
    val dir2 = java.nio.file.Files.createTempDirectory("mergesink")
    val t = sinkIn(dir2)
    t.merge(batch((1L, "a", 1L)), 0L)
    java.nio.file.Files.deleteIfExists(dir2.resolve("_schema"))
    val t2 = sinkIn(dir2)
    t2.merge(batch((2L, "b", 2L)), 1L)
    assert(!java.nio.file.Files.exists(dir2.resolve("_evolved")),
      "same-schema bootstrap must not set the sticky merge marker")
    // roots that already disagree AMONG THEMSELVES (an upgraded app
    // wrote an evolved delta before this instance opened): the marker
    // must be set even when the INCOMING batch matches the oldest root
    // (the single-root baseline would miss it — r12 self-review)
    val dir3 = java.nio.file.Files.createTempDirectory("mergesink")
    val u = sinkIn(dir3)
    u.merge(batch((1L, "a", 1L)), 0L)
    u.merge(Seq((2L, "b", 2L, "x")).toDF("k", "v", "n", "extra"), 1L)
    java.nio.file.Files.deleteIfExists(dir3.resolve("_schema"))
    java.nio.file.Files.deleteIfExists(dir3.resolve("_evolved"))
    val u2 = sinkIn(dir3)
    u2.merge(batch((3L, "c", 3L)), 2L) // matches the OLD schema
    assert(java.nio.file.Files.exists(dir3.resolve("_evolved")),
      "disagreeing pre-bookkeeping roots must set the merge marker")
    val out3 = u2.read().collect()
      .map(r => r.getAs[Long]("k") ->
        Option(r.getAs[String]("extra"))).toMap
    assert(out3 == Map(1L -> None, 2L -> Some("x"), 3L -> None))
  }

  test("point-lookup on an evolved sink: the no-matching-bucket empty " +
      "result carries the SAME merged schema as a hit (r11 advice)") {
    import spark.implicits._
    // two keys landing in DIFFERENT buckets of a 2-bucket layout, so a
    // lookup for the unwritten one deterministically finds no matching
    // __bucket= dir and takes the empty-result fallback path
    val hashed = spark.range(0, 16)
      .select(col("id"), pmod(xxhash64(col("id")), lit(2L)).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val kA = hashed.collectFirst { case (k, 0L) => k }.get
    val kB = hashed.collectFirst { case (k, 1L) => k }.get
    val dir = java.nio.file.Files.createTempDirectory("mergesink")
    val s = new ParquetMergeSink(spark, dir.toString, Seq("k"),
      compactEvery = 0, nBuckets = 2)
    // only bucket-A keys are ever written; batch 1 evolves the schema
    s.merge(batch((kA, "a", 1L)), 0L)
    s.merge(Seq((kA, "a2", 2L, "x")).toDF("k", "v", "n", "extra"), 1L)
    val hit = s.read(Seq(kA).toDF("k"))
    assert(hit.columns.contains("extra"),
      "evolved column must be present in point-lookup results")
    val miss = s.read(Seq(kB).toDF("k")) // bucket B: no dir on disk
    assert(miss.columns.sorted.sameElements(hit.columns.sorted),
      s"evolved lookup schemas differ: ${hit.columns.toSeq} vs " +
        s"${miss.columns.toSeq}")
    assert(miss.count() == 0)
  }
}

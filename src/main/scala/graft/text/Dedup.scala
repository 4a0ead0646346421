package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication operators for large text corpora (SURVEY.md M6; the
  * LLM-training-data side of the engine). Four tiers, all shuffle-by-key —
  * never all-pairs:
  *
  *  - exact:     hash of normalized text, groupBy hash (one shuffle).
  *  - n-gram:    exact Jaccard via an inverted shingle index self-join —
  *               pairs are generated per shingle bucket, so cost is
  *               Σ bucket², not n² (drop ultra-frequent shingles at scale).
  *  - MinHash:   k-permutation signatures + banded LSH; candidate pairs come
  *               only from shared (band, bandHash) buckets — the 100 TB path
  *               where even the shingle index is too hot.
  *  - SimHash:   64-bit near-dup fingerprint; hamming distance via
  *               bit_count(a XOR b).
  *
  * Everything is deterministic: hashes are xxhash64 with fixed seeds, so the
  * same corpus always yields the same signatures/candidates.
  */
object Dedup {

  /** Default document-frequency cap for [[ngramJaccardPairs]] stop-shingle
    * removal (shingles in more documents than this are dropped before pair
    * generation).
    */
  val DefaultMaxDf = 64

  /** Whitespace-collapse + trim + lowercase — the canonical form exact
    * dedup keys on.
    */
  def normalize(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))

  /** Exact dedup: one row per distinct normalized content, keeping the
    * smallest id (deterministic keeper) and the duplicate count.
    * Plain groupBy — a single hash-partitioned shuffle on the content hash,
    * no window, no sort of the full data.
    */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(md5(normalize(col(textCol))).as("content_hash"), col(idCol))
      .groupBy(col("content_hash"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_dupes"))
      .select(col(idCol), col("content_hash"), col("n_dupes"))
      .orderBy(idCol)

  /** Duplicate-CLUSTER assembly: turn a near-dup pair list into connected
    * components, labeling every member with the smallest id in its
    * component — the step that makes pair output actionable (keep one doc
    * per cluster). Iterative min-label propagation: each round every node
    * adopts the smallest label among itself and its neighbors, then every
    * label POINTER-JUMPS (label := label(label), the Shiloach–Vishkin
    * shortcut) — so label information travels 2^k hops after k rounds and
    * convergence needs O(log diameter) rounds, not O(diameter). A
    * 100-hop chain of borderline pairs closes in 7 rounds; the default
    * `maxRounds` = 20 covers diameters up to ~10⁶.
    *
    * Scale shape: two key shuffles per round (neighbor-min on the edge
    * key + the label self-join for the jump; the driver only launches
    * rounds and checks a one-row convergence count — no edge data ever
    * leaves the executors). Label state is localCheckpoint'ed each round
    * so the lineage stays flat. Output: (doc_id, cluster_id) for every
    * node that appears in a pair; singletons are implicitly their own
    * cluster.
    *
    * In the (now astronomically unlikely) event a component outlives
    * `maxRounds`, the result is an UNDER-merged clustering — it splits
    * into several clusters, so dedup keeps extra representatives.
    * Conservative: never drops a non-duplicate.
    */
  /** Edge-count gate below which the components are computed by a
    * DRIVER union-find instead of the distributed loop (r15, guide
    * §1.2 "the distributed algorithm" / §7 job-count): each propagation
    * round costs ~5 driver-scheduled jobs (two shuffles + convergence
    * probe + checkpoints), so a tiny pair graph — the NORMAL case for a
    * deduplicated corpus, where true-dup pairs are control-plane-sized
    * by definition — paid ~20 jobs of fixed overhead to converge. 1M
    * edges collect to ~16 MB (well under the result-size cap), the
    * min-label-per-component fixed point is identical (PropertySpec
    * already pins dupClusters against a driver union-find on random
    * graphs), and a bigger graph takes the unchanged distributed loop.
    */
  val DriverUnionFindMaxEdges: Long = 1L << 20

  def dupClusters(pairs: DataFrame, idA: String = "id_a",
                  idB: String = "id_b", maxRounds: Int = 20): DataFrame = {
    val raw = pairs.select(col(idA).as("src"), col(idB).as("dst"))
      .localCheckpoint(true)
    val longIds = raw.schema.fields.forall(_.dataType == LongType)
    if (longIds && raw.count() <= DriverUnionFindMaxEdges) {
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      raw.collect().foreach { e =>
        val (a, b) = (e.getLong(0), e.getLong(1))
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val rows = parent.keys.toSeq.sorted.map(x => (x, find(x)))
      val spark = pairs.sparkSession
      import spark.implicits._
      return rows.toDF("doc_id", "cluster_id").orderBy("doc_id")
    }
    dupClustersDistributed(raw, maxRounds)
  }

  /** The distributed min-label-propagation loop — the over-gate path of
    * [[dupClusters]], split out so PropertySpec can pin it against the
    * driver union-find regardless of the gate. `raw` is the directed
    * (src, dst) edge list.
    */
  private[graft] def dupClustersDistributed(raw: DataFrame,
                                            maxRounds: Int): DataFrame = {
    // No dedup shuffle on the edge list: min-label propagation is
    // insensitive to duplicate edges (min over a multiset), and reversing
    // a unique unordered pair list cannot create collisions anyway.
    val edges = raw
      .unionByName(raw.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(true)
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id")).localCheckpoint(true)
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "dst2"),
          edges("dst") === col("dst2"))
        .groupBy(col("src").as("id2"))
        .agg(min(col("label")).as("nlabel"))
      val stepped = labels
        .join(neighborMin, labels("id") === col("id2"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nlabel"), col("label")))
            .as("label"),
          (coalesce(col("nlabel"), col("label")) < col("label"))
            .as("changed"))
        .localCheckpoint(true) // consumed twice by the jump self-join
      // Pointer jump: replace each label with ITS OWN current label.
      // The invariant label(x) ≤ x (init id, updates are mins including
      // self) makes the jump monotone, and label values are always node
      // ids, so the self-join always finds its row. The convergence
      // flag rides the update row (strict decrease from either the
      // neighbor step or the jump), so checking it is a scan of the
      // checkpointed result — no extra job per round.
      val jumped = stepped.alias("s")
        .join(stepped.select(col("id").as("jid"),
          col("label").as("jlabel")), col("s.label") === col("jid"))
        .select(col("s.id").as("id"), col("jlabel").as("label"),
          (col("s.changed") || col("jlabel") < col("s.label"))
            .as("changed"))
        .localCheckpoint(true)
      converged = jumped.filter(col("changed")).isEmpty
      labels = jumped.drop("changed")
      round += 1
    }
    labels.select(col("id").as("doc_id"), col("label").as("cluster_id"))
      .orderBy("doc_id")
  }

  /** Distinct word n-gram shingles: (id, shingle). */
  def shingles(df: DataFrame, textCol: String, idCol: String,
               n: Int): DataFrame = {
    require(n >= 1)
    val joined = (0 until n).map(j => s"words[i + $j]").mkString(", ")
    df.select(col(idCol),
        split(trim(col(textCol)), "\\s+").as("words"))
      .filter(size(col("words")) >= n)
      .select(col(idCol), explode(expr(
        s"transform(slice(words, 1, size(words) - ${n - 1}), " +
          s"(w, i) -> concat_ws(' ', $joined))")).as("shingle"))
      .distinct()
  }

  /** Exact n-gram Jaccard near-duplicate pairs via the inverted shingle
    * index: self-join on shingle → per-pair intersection counts → size
    * join → threshold. Cost is Σ df² over shingle document-frequencies,
    * not n² over documents. The index is checkpointed so the self-join and
    * the size aggregate share one computation (at warehouse scale you
    * would materialize it as a table instead). Corpora with heavy-hitter
    * shingles (stop-bigrams) make the hottest buckets quadratic — there,
    * use [[nearDuplicates]] (MinHash+LSH), whose candidate generation is
    * frequency-independent.
    */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
                        n: Int, minJaccard: Double,
                        maxDf: Int = DefaultMaxDf): DataFrame = {
    val shAll = shingles(df, textCol, idCol, n).localCheckpoint(true)
    // Stop-shingle removal: a shingle appearing in more than maxDf
    // documents carries no discriminative signal but contributes df² pairs
    // to the self-join — the quadratic term that kills the inverted-index
    // approach at scale. The hot list is tiny (heavy hitters by
    // definition), so the anti-join broadcasts.
    val hot = shAll.groupBy(col("shingle"))
      .agg(count(lit(1)).as("df")).filter(col("df") > maxDf)
      .select("shingle")
    val sh = shAll.join(broadcast(hot), Seq("shingle"), "left_anti")
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("doc_a"), col(s"b.$idCol").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    val j = col("inter").cast(DoubleType) /
      (col("na") + col("nb") - col("inter"))
    inter
      .join(sizes.select(col(idCol).as("doc_a"), col("sz").as("na")), "doc_a")
      .join(sizes.select(col(idCol).as("doc_b"), col("sz").as("nb")), "doc_b")
      .filter(j >= minJaccard)
      .select(col("doc_a"), col("doc_b"), round(j, 4).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** Incremental ingest dedup — classify each NEW-batch document against
    * an existing corpus as `exact_dup` (normalized content already
    * present), `near_dup` (capped-shingle Jaccard ≥ `minJaccard` against
    * some corpus doc), or `new`. This is the daily-ingest shape at
    * 100 TB: the corpus side reduces to its content-hash index and its
    * stop-capped shingle postings — artifacts a warehouse materializes
    * once and reuses every batch — so per-batch cost scales with the
    * BATCH (times posting df), never re-pairing the corpus with itself.
    *
    * Stop-shingles come from CORPUS document frequencies (df > maxDf,
    * mirroring [[ngramJaccardPairs]]) and are removed from both sides;
    * Jaccard denominators use the capped sets. Exact trumps near: an
    * exact duplicate is not also reported lexically.
    */
  def incremental(corpus: DataFrame, batch: DataFrame, textCol: String,
                  idCol: String, n: Int, minJaccard: Double,
                  maxDf: Int = DefaultMaxDf): DataFrame = {
    val corpusHashes = corpus
      .select(md5(normalize(col(textCol))).as("content_hash")).distinct()
      .withColumn("is_exact", lit(true))
    val batchHashes = batch.select(col(idCol),
      md5(normalize(col(textCol))).as("content_hash"))

    val shC = shingles(corpus, textCol, idCol, n).localCheckpoint(true)
    val hot = shC.groupBy(col("shingle"))
      .agg(count(lit(1)).as("df")).filter(col("df") > maxDf)
      .select("shingle")
    val shCk = shC.join(broadcast(hot), Seq("shingle"), "left_anti")
    val shB = shingles(batch, textCol, idCol, n)
      .join(broadcast(hot), Seq("shingle"), "left_anti")
      .localCheckpoint(true)
    val szC = shCk.groupBy(col(idCol)).agg(count(lit(1)).as("nc"))
    val szB = shB.groupBy(col(idCol)).agg(count(lit(1)).as("nb"))
    val j = col("i").cast(DoubleType) / (col("nb") + col("nc") - col("i"))
    val near = shB.as("b").join(shCk.as("c"),
        col("b.shingle") === col("c.shingle"))
      .groupBy(col(s"b.$idCol").as("batch_id"),
        col(s"c.$idCol").as("corpus_id"))
      .agg(count(lit(1)).as("i"))
      .join(szB.select(col(idCol).as("batch_id"), col("nb")), "batch_id")
      .join(szC.select(col(idCol).as("corpus_id"), col("nc")), "corpus_id")
      .filter(j >= minJaccard)
      .select(col("batch_id").as(idCol)).distinct()
      .withColumn("is_near", lit(true))

    // hash-key joins, not broadcasts: the corpus-side index is |corpus|
    // rows — at scale these are shuffle joins on pre-materialized tables
    batchHashes
      .join(corpusHashes, Seq("content_hash"), "left")
      .join(near, Seq(idCol), "left")
      .select(col(idCol),
        when(col("is_exact"), "exact_dup")
          .when(col("is_near"), "near_dup")
          .otherwise("new").as("status"))
      .orderBy(idCol)
  }

  /** Cross-document duplicated-span statistics — the substring-dedup
    * posture of Lee et al. 2022 ("Deduplicating Training Data Makes
    * Language Models Better"), at word-window granularity: every rolling
    * `n`-word window is an occurrence; a window whose TEXT occurs ≥ 2
    * times corpus-wide (any document, including its own) is a duplicated
    * span. Per document: occurrence count, duplicated-occurrence count,
    * duplicated fraction — the signal that drives span-level cutting or
    * doc-level down-weighting.
    *
    * Windows key on md5 of the window text (engine-neutral, unlike
    * xxhash winnowing in [[fingerprints]]), so the whole statistic is
    * oracle-checkable. Scale shape: explode (≈ one row per word) → one
    * partial-agg'd count on the 16-byte hash key → one hash-key join
    * back to occurrences → per-doc aggregate. No window functions, no
    * pair explosion; the shuffle carries (id, hash) pairs only.
    */
  def spanDupStats(df: DataFrame, textCol: String, idCol: String,
                   n: Int): DataFrame = {
    require(n >= 1)
    val joined = (0 until n).map(j => s"words[i + $j]").mkString(", ")
    val occ = df
      .select(col(idCol), split(trim(col(textCol)), "\\s+").as("words"))
      .filter(size(col("words")) >= n)
      .select(col(idCol), explode(expr(
        s"transform(slice(words, 1, size(words) - ${n - 1}), " +
          s"(w, i) -> concat_ws(' ', $joined))")).as("span"))
      .select(col(idCol), md5(col("span")).as("wh"))
      .localCheckpoint(true)
    val cts = occ.groupBy(col("wh")).agg(count(lit(1)).as("ct"))
    occ.join(cts, "wh")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("ct") > 1, 1L).otherwise(0L)).as("n_dup_spans"))
      .select(col(idCol), col("n_spans"), col("n_dup_spans"),
        round(col("n_dup_spans").cast(DoubleType) / col("n_spans"), 4)
          .as("dup_frac"))
      .orderBy(idCol)
  }

  /** Corpus-wide duplicated-block REMOVAL — the cutting counterpart of
    * [[spanDupStats]] and the re-expression of C4's line-level exact
    * dedup ("we removed any three-sentence span occurring more than
    * once"; Raffel et al. 2020 §2.2) for corpora without line structure:
    * each document's words are partitioned into consecutive
    * non-overlapping `n`-word blocks, a block whose text occurs anywhere
    * else in the corpus keeps only its GLOBAL first occurrence (min
    * (doc, position) — deterministic, engine-neutral), and each document
    * is reassembled from its surviving blocks in position order.
    * Non-overlapping blocks are what make the cut well-defined in one
    * declarative pass: removing overlapping windows needs an ordered
    * sweep per duplicate chain (Lee et al. 2022 build a suffix array;
    * their §4.1 ExactSubstr), which is a different cost class — the
    * block posture is the standard approximation (paragraph/line dedup
    * in C4/Dolma) and loses only cuts that straddle a block boundary.
    *
    * Scale shape: explode ≈ one row per n words → ONE window on the
    * 16-byte block hash (rank = global first-occurrence order) → per-doc
    * aggregate that reassembles. The shuffle carries (id, pos, hash) +
    * the block text once; no pair explosion, no self-join. The final
    * per-doc collect_list is bounded by document length — the same
    * in-row bound every per-doc text op here lives with.
    */
  def blockDedupCut(df: DataFrame, textCol: String, idCol: String,
                    n: Int): DataFrame = {
    require(n >= 1)
    val blocks = df
      .select(col(idCol), split(trim(col(textCol)), "\\s+").as("words"))
      .select(col(idCol), posexplode(expr(
        s"transform(sequence(0, cast(ceil(size(words) / ${n}.0) as int)" +
          s" - 1), b -> concat_ws(' ', slice(words, b * $n + 1, $n)))"))
        .as(Seq("pos", "block")))
    val w = Window.partitionBy(md5(col("block")))
      .orderBy(col(idCol), col("pos"))
    blocks
      .withColumn("keep", row_number().over(w) === 1)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_blocks"),
        sum(when(!col("keep"), 1L).otherwise(0L)).as("n_removed"),
        concat_ws(" ", expr(
          "transform(array_sort(collect_list(CASE WHEN keep THEN " +
            "struct(pos, block) END)), s -> s.block)"))
          .as("text_deduped"))
      .orderBy(idCol)
  }

  /** OVERLAPPING duplicated-span REMOVAL — the Lee et al. 2022
    * ExactSubstr posture ([[blockDedupCut]]'s documented out-of-scope
    * item) at word-window granularity, re-expressed declaratively
    * instead of via their suffix array (§4.1). Semantics: a word
    * position is CUT iff some rolling `n`-word window covering it has
    * text occurring ≥ 2 times corpus-wide AND that occurrence is not
    * the text's GLOBAL FIRST (min (doc, position) — deterministic,
    * engine-neutral, the same keep-first rule as [[blockDedupCut]]);
    * each document is reassembled from surviving positions in order.
    *
    * Why this equals anchor seed-and-extend: every duplicated window
    * is an anchor; a duplicate region LONGER than `n` is covered by a
    * run of overlapping duplicated windows, so the union of their
    * coverage — the cut mask — is exactly the maximal duplicated span,
    * extended to its ends. Spans straddling arbitrary offsets are
    * recovered (the case non-overlapping blocking loses: a duplicate
    * shifted by one word against the block grid survives
    * [[blockDedupCut]] whole, TextSpec pins the contrast); only spans
    * shorter than `n` words survive, which is the L-threshold of the
    * paper, not a loss.
    *
    * Scale shape: one rolling-window explode (a (id, pos, 16-byte md5)
    * row per word — the same linear shuffle [[spanDupStats]] already
    * pays, no pair explosion), ONE window-function shuffle on the hash
    * (count + global-first rank share the partition key), a per-doc
    * collect of duplicate window STARTS (bounded by document length,
    * the in-row bound every per-doc text op here lives with), and one
    * hash join back to the corpus for the in-row mask/reassembly via
    * higher-order functions. Hot window texts (boilerplate) skew the
    * window partition exactly like [[blockDedupCut]]'s — measured 0.99
    * ratio on the skewed corpus there. md5 collisions would merge two
    * distinct span texts (~2⁻¹²⁸ per pair); both engines hash
    * identically, so the oracle compare is immune by construction.
    */
  def spanDedupCut(df: DataFrame, textCol: String, idCol: String,
                   n: Int): DataFrame = {
    require(n >= 1)
    val joined = (0 until n).map(j => s"words[i + $j]").mkString(", ")
    val base = df.select(col(idCol),
      split(trim(col(textCol)), "\\s+").as("words"))
    val occ = base.filter(size(col("words")) >= n)
      .select(col(idCol), posexplode(expr(
        s"transform(slice(words, 1, size(words) - ${n - 1}), " +
          s"(w, i) -> concat_ws(' ', $joined))")).as(Seq("pos", "span")))
      .select(col(idCol), col("pos"), md5(col("span")).as("wh"))
    val part = Window.partitionBy(col("wh"))
    val rank = part.orderBy(col(idCol), col("pos"))
    val dupStarts = occ
      .withColumn("ct", count(lit(1)).over(part))
      .withColumn("rn", row_number().over(rank))
      .filter(col("ct") > 1 && col("rn") > 1)
      .groupBy(col(idCol))
      .agg(collect_list(col("pos")).as("ds"))
    base.join(dupStarts, Seq(idCol), "left")
      .select(col(idCol), col("words"),
        coalesce(col("ds"), array().cast("array<int>")).as("ds"))
      .select(col(idCol), size(col("words")).cast("long").as("n_words"),
        expr(s"filter(transform(words, (w, p) -> struct(w, p)), " +
          s"s -> NOT exists(ds, d -> s.p >= d AND s.p <= d + ${n - 1}))")
          .as("kept"))
      .select(col(idCol), col("n_words"),
        (col("n_words") - size(col("kept"))).cast("long").as("n_removed"),
        concat_ws(" ", expr("transform(kept, s -> s.w)"))
          .as("text_deduped"))
      .orderBy(idCol)
  }

  /** Exact-Jaccard verification of candidate pairs, on HASHED shingles:
    * sets are packed as one xxhash64-per-shingle array per document, so
    * each candidate pair is ONE row and the intersection is an in-row
    * array_intersect over longs — 8 B fixed-width compares and a ~2×
    * smaller pair-join shuffle than the raw shingle strings; counts are
    * identical (the hash is injective in practice: P(64-bit collision
    * inside one pair's ~100-shingle union) ≈ 10⁻¹⁵). Array size is
    * bounded by document length, and the joins are plain key joins on
    * doc id.
    *
    * Rejected alternative (measured at sf1, 13.2 M candidates): a
    * matching-slot SIGNATURE prefilter between banding and verify. The
    * estimator must ship both k-slot arrays to every pair row — at
    * k=128 that is ~1 KB/side, ~3× the hashed shingle set of a
    * ~45-shingle document, so the "prefilter" shuffled more bytes than
    * the stage it was pruning and saved nothing end-to-end. It only
    * pays for corpora whose documents carry ≫k shingles; for candidate
    * volume itself, the hot-bucket cap in [[lshCandidates]] attacks the
    * pairs at the source instead.
    */
  private[graft] def verifyPairs(cand: DataFrame, sh: DataFrame,
                                 idCol: String,
                                 minJaccard: Double): DataFrame = {
    val sets = sh
      .select(col(idCol), xxhash64(col("shingle")).as("hh"))
      .groupBy(col(idCol))
      .agg(collect_list(col("hh")).as("shs"),
        count(lit(1)).as("sz"))
    val inter = size(array_intersect(col("sa"), col("sb")))
      .cast(DoubleType)
    val j = inter / (col("na") + col("nb") - inter)
    cand
      .join(sets.select(col(idCol).as("doc_a"), col("shs").as("sa"),
        col("sz").as("na")), "doc_a")
      .join(sets.select(col(idCol).as("doc_b"), col("shs").as("sb"),
        col("sz").as("nb")), "doc_b")
      .filter(j >= minJaccard)
      .select(col("doc_a"), col("doc_b"), round(j, 4).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** 60-bit cross-engine hash: the numeric value of the first 15 hex
    * chars of md5(prefix || s) — renders identically in DuckDB as
    * `('0x' || substr(md5(...), 1, 15))::BIGINT` (the md5-prefix trick
    * the split/mixture draws use, widened from 24 to 60 bits for
    * signature work). xxhash64 stays the production default on every
    * hash-keyed operator — md5 is a crypto hash, several times the
    * cycles per byte; this exists so those operators can ALSO run under
    * the DuckDB oracle with the identical plan shape.
    */
  def md5Hash60(prefix: Column, c: Column): Column =
    conv(substring(md5(concat(prefix, c)), 1, 15), 16, 10).cast(LongType)

  /** Universal-hash slot coefficients for cross-engine MinHash: k pairs
    * (Aᵢ ∈ [1, P), Bᵢ ∈ [0, P)) from a fixed seed, with P = 2³¹ − 1.
    * Slot i of base hash h is (Aᵢ·h + Bᵢ) mod P — h < 2³², so the
    * product stays under 2⁶³ and the arithmetic is exact BIGINT in any
    * engine. Public so the oracle SQL renders the identical pairs.
    */
  val MinhashP: Long = 2147483647L
  def minhashCoeffs(k: Int, seed: Long = 7L): (Seq[Long], Seq[Long]) = {
    val rng = new scala.util.Random(seed)
    val a = Seq.fill(k)(1L + rng.nextInt((MinhashP - 1).toInt))
    val b = Seq.fill(k)(rng.nextInt(MinhashP.toInt).toLong)
    (a, b)
  }

  /** MinHash signatures: sig[i] = min over shingles of hash_i(shingle).
    * One groupBy over the exploded shingles — k min-aggregates, map-side
    * partial aggregation, no Expand. `crossEngine` derives the k slot
    * hashes by [[minhashCoeffs]] universal hashing from ONE 32-bit
    * md5-prefix base per shingle (cheap integer ops instead of k
    * engine-specific xxhash64 calls — measured 5× cheaper than k
    * separate md5s), so the signatures — and everything keyed on them —
    * are oracle-reproducible with the same plan shape.
    */
  def minhashSignatures(sh: DataFrame, idCol: String, k: Int,
                        crossEngine: Boolean = false): DataFrame =
    if (crossEngine) {
      val (as, bs) = minhashCoeffs(k)
      // 8 hex chars = 32-bit base hash, one md5 per shingle
      val base = conv(substring(md5(concat(lit("mh:"), col("shingle"))),
        1, 8), 16, 10).cast(LongType)
      sh.select(col(idCol), base.as("h"))
        .groupBy(col(idCol))
        .agg(array((0 until k).map(i =>
          min((lit(as(i)) * col("h") + lit(bs(i))) % lit(MinhashP))): _*)
          .as("sig"))
    } else
      sh.groupBy(col(idCol))
        .agg(array((0 until k).map(i =>
          min(xxhash64(lit(i), col("shingle")))): _*).as("sig"))

  /** Same signatures through the single-buffer [[MinHashAgg]] Aggregator —
    * one Array[Long] buffer per group instead of k separate min-aggregate
    * expressions (MinHashAgg scaladoc has the tradeoff).
    */
  def minhashSignaturesAgg(sh: DataFrame, idCol: String,
                           k: Int): DataFrame =
    sh.groupBy(col(idCol))
      .agg(udaf(new MinHashAgg(k)).apply(col("shingle")).as("sig"))

  /** Hot-bucket cap for [[lshCandidates]]: a (band, bandHash) bucket
    * holding more than this many documents contributes NO pairs. Such
    * buckets are signature-degenerate — measured on the sf1 corpus (961
    * distinct shingles across 50 k docs, so band keys concentrate on
    * the globally-minimal shingle hashes), 11 buckets of > 512 docs
    * held 7.8 M of the 13.2 M candidate pairs while the ~500 TRUE pairs
    * collide in small distinctive buckets. The cap bounds per-bucket
    * work at cap²/2 pairs deterministically — the same guard
    * [[graft.sim.Similarity]] applies to dense embedding cells — at a
    * documented recall trade: a genuine near-dup cluster of > cap
    * DISTINCT variants colliding in one band loses that band's vote
    * (run [[nearDuplicatesCollapsed]] first so exact-duplicate classes
    * never occupy bucket slots). Public so the DuckDB oracle renders
    * the IDENTICAL cap — both engines drop the same buckets by
    * construction.
    */
  val LshMaxBucket = 128

  /** Banded-LSH candidate pairs: split the k-wide signature into `bands`
    * bands, hash each band, and emit pairs of ids sharing any (band,
    * bandHash) bucket with ≤ `maxBucket` members ([[LshMaxBucket]]).
    * Only bucket-mates ever meet — the join key is the bucket, so the
    * plan is explode → shuffle on bucket → per-bucket join, with a
    * bucket-size aggregation on the same shuffle keying the cap.
    *
    * ADAPTIVE BAND-KEY WIDENING (r13 verdict #1 — the sf10 scale
    * probe measured the collapse query super-linear, 17.5× per 10× row
    * step): on a low-entropy corpus the band-key space SATURATES — the
    * sf0.1 documents table holds only 961 distinct shingles, so minhash
    * slots concentrate on the globally smallest shingle hashes and the
    * number of distinct (band, bh) keys stops growing with rows. Bucket
    * occupancy then rises linearly with corpus size and candidate
    * volume as Σ bucket² — quadratically — until buckets cross the cap
    * and get DROPPED wholesale (cost explosion first, silent recall
    * collapse after). The fix is the LSH-Forest move (Bawa et al.,
    * WWW'05: variable-length hash keys — extend a bucket's key until it
    * is small): members of a bucket EXCEEDING `maxBucket` are re-keyed
    * by the NEXT band's hash, splitting background-dense buckets into
    * sub-buckets whose occupancy reflects genuine signature agreement
    * (r more matching slots), while under-cap buckets — where measured
    * recall lives — keep the exact r-slot semantics. A sub-bucket still
    * over the cap is dropped as before (a > cap cluster of near-
    * IDENTICAL variants shares the extension band too — that regime
    * stays documented-degraded, measured by RecallGate's nd_cap/cl_cap
    * families). Recall is monotonically ≥ the plain cap's: every pair
    * the old path emitted still shares its cool bucket, and pairs in
    * formerly-dropped hot buckets now survive when they also agree on
    * the extension band. Occupancy — and so per-bucket join cost — stays
    * flat as rows grow, which is the 100 TB property the probe gates.
    */
  def lshCandidates(sigs: DataFrame, idCol: String, k: Int,
                    bands: Int, crossEngine: Boolean = false,
                    maxBucket: Int = LshMaxBucket): DataFrame = {
    require(k % bands == 0, s"k=$k not divisible by bands=$bands")
    val r = k / bands
    // band key: one xxhash64 over the band's slots (production), or the
    // ":"-joined decimal rendering (cross-engine — DuckDB string_agg
    // over the same slots produces the identical key)
    def bandKey(j: Int): Column = {
      val slots = (j * r until (j + 1) * r).map(i => col("sig")(i))
      if (crossEngine) concat_ws(":", slots.map(_.cast(StringType)): _*)
      else xxhash64(slots: _*)
    }
    // each exploded row carries its band's key AND the next band's key
    // (the extension used only if this bucket turns out hot)
    val bandStructs = (0 until bands).map { j =>
      struct(lit(j).as("band"), bandKey(j).as("bh"),
        bandKey((j + 1) % bands).as("bx"))
    }
    val buckets = sigs
      .select(col(idCol), explode(array(bandStructs: _*)).as("bb"))
      .select(col(idCol), col("bb.band").as("band"),
        col("bb.bh").as("bh"), col("bb.bx").as("bx"))
    // pass 1: occupancy per raw bucket. Cool buckets (≤ cap) keep a
    // constant extension; hot buckets split on the next band's key. The
    // sentinel value cannot collide ACROSS buckets — (band, bh) stays in
    // the key, and hot/cool is a property of the whole bucket.
    val sentinel: Column =
      if (crossEngine) lit("") else lit(0L)
    // Both occupancy passes as WINDOW counts over one hash exchange
    // (r14, guide §2.4 — the r13 shape was two aggregate+join pairs,
    // i.e. two extra shuffles plus a checkpoint barrier of the exploded
    // band rows): count over (band, bh) decides hot/cool, and the
    // widened-key count reuses the same partitioning because
    // (band, bh) clusters every (band, bh, ext) refinement. Identical
    // hot/cool/cap semantics row for row — both DuckDB oracle mirrors
    // are unchanged and keep hashing green.
    // SKEW exposure on the UNCOLLAPSED path (r14 advice): WindowExec
    // buffers each whole (band, bh) partition before emitting, so a
    // mega-duplicate cluster makes ONE task sort/spill its entire hot
    // bucket where the old pass-1 groupBy enjoyed partial aggregation.
    // Acceptable because nearDuplicatesCollapsed — the huge-corpus
    // entry point — bounds bucket occupancy by construction (a class of
    // m identical docs collapses to one representative before banding);
    // route mega-duplicate corpora there rather than nearDuplicates.
    val wBucket = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band"), col("bh"))
    val capped = buckets
      .withColumn("ext",
        when(count(lit(1)).over(wBucket) <= maxBucket, sentinel)
          .otherwise(col("bx")))
      .withColumn("__m", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("band"), col("bh"), col("ext"))))
      .filter(col("__m") <= maxBucket)
      .select(col(idCol), col("band"), col("bh"), col("ext"))
      // materialized ONCE: the self-join below consumes both sides from
      // this checkpoint — without it each side re-runs the explode +
      // window chain (plan-verified: two full Window/Sort/Exchange
      // subtrees)
      .localCheckpoint(true)
    capped.as("a").join(capped.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.ext") === col("b.ext") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("doc_a"), col(s"b.$idCol").as("doc_b"))
      .distinct()
  }

  /** MinHash+LSH near-dup detection: LSH candidates, then exact Jaccard
    * verification restricted to the candidate pairs (shingle join against
    * the candidate set — candidates are a tiny fraction of all pairs).
    */
  def nearDuplicates(df: DataFrame, textCol: String, idCol: String,
                     n: Int, k: Int, bands: Int, minJaccard: Double,
                     crossEngine: Boolean = false): DataFrame = {
    val sh = shingles(df, textCol, idCol, n).localCheckpoint(true)
    val cand = lshCandidates(minhashSignatures(sh, idCol, k, crossEngine),
      idCol, k, bands, crossEngine)
    verifyPairs(cand, sh, idCol, minJaccard)
  }

  /** [[nearDuplicates]] with EXACT-DUPLICATE COLLAPSE — the duplicate-
    * cluster guard the raw pipeline lacks at corpus scale. A class of m
    * IDENTICAL documents has one signature, so every band puts all m ids
    * in the same bucket and the candidate join emits m²/2 pairs per band
    * however the banding is tuned — one 100k-copy boilerplate cluster
    * (routine in web crawls) is 5·10⁹ candidates. A hot-bucket CAP (the
    * guard [[graft.sim.Similarity.lshCandidatePairs]] uses for dense
    * embedding regions) cannot help here: ALL of the class's buckets are
    * equally hot, so capping deletes the cluster instead of bounding it.
    * The fix is pipeline ORDER, the same order the curation funnel
    * hard-codes: collapse identical documents first (min id per
    * normalized content hash — [[exact]]'s key), run
    * shingle→minhash→banding over DISTINCT contents only, and emit
    * representative-level pairs carrying each side's class size. The
    * collapse bounds every bucket by the corpus's distinct-content
    * near-dup density, independent of how duplicated the raw corpus is.
    *
    * Within-class pairs are exact duplicates — [[exact]]'s output, not a
    * near-dup finding — and materializing them at scale is itself the m²
    * explosion, so the (rep_a, rep_b, size_a, size_b) cluster-level pair
    * IS the honest answer: a consumer expanding it back to doc pairs
    * does so knowingly, size_a·size_b at a time. Each class is
    * represented by its min-id document's RAW text (classes are
    * identical after [[normalize]] but may differ in case/whitespace,
    * which the shingle tokens preserve) — deterministic, and mirrored
    * exactly by the DuckDB oracle's min-id join.
    */
  def nearDuplicatesCollapsed(df: DataFrame, textCol: String,
                              idCol: String, n: Int, k: Int, bands: Int,
                              minJaccard: Double,
                              crossEngine: Boolean = false): DataFrame = {
    // representative rows: the min-id doc's raw text (min_by on the
    // unique id — deterministic) + its class size, in the SAME
    // aggregation that collapses the class (r14, guide §2.4: the r13
    // shape computed ids-only classes and then equi-joined the text
    // back — a second shuffle of the full text column for rows the
    // groupBy already saw). Same rows, same representative, one shuffle.
    val reps = df
      .select(md5(normalize(col(textCol))).as("__h"), col(idCol),
        col(textCol))
      .groupBy(col("__h"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("__sz"),
        min_by(col(textCol), col(idCol)).as(textCol))
      .drop("__h")
      .localCheckpoint(true)
    val sh = shingles(reps, textCol, idCol, n).localCheckpoint(true)
    val cand = lshCandidates(minhashSignatures(sh, idCol, k, crossEngine),
      idCol, k, bands, crossEngine)
    val sizes = reps.select(col(idCol), col("__sz"))
    verifyPairs(cand, sh, idCol, minJaccard)
      .join(sizes.select(col(idCol).as("doc_a"), col("__sz").as("size_a")),
        "doc_a")
      .join(sizes.select(col(idCol).as("doc_b"), col("__sz").as("size_b")),
        "doc_b")
      .select(col("doc_a"), col("doc_b"), col("jaccard"),
        col("size_a"), col("size_b"))
      .orderBy("doc_a", "doc_b")
  }

  /** SimHash over word unigrams: per bit, sum ±1 weighted by whether the
    * word hash has that bit set; the fingerprint packs the sign bits.
    * One explode + one groupBy with `bits` small sums — partial-agg
    * friendly. Production default: 64 bits of xxhash64; `crossEngine`
    * drops to the 60 [[md5Hash60]] bits so the fingerprint is
    * oracle-reproducible (hamming semantics are width-agnostic).
    */
  def simhash(df: DataFrame, textCol: String, idCol: String,
              crossEngine: Boolean = false): DataFrame = {
    val bits = if (crossEngine) 60 else 64
    val wordHash =
      if (crossEngine) md5Hash60(lit(""), col("w")) else xxhash64(col("w"))
    val words = df.select(col(idCol),
        explode(split(normalize(col(textCol)), " ")).as("w"))
      .select(col(idCol), wordHash.as("h"))
    val bitSums = (0 until bits).map(i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"b$i"))
    val packed = (0 until bits).map(i =>
      when(col(s"b$i") > 0, lit(1L << i)).otherwise(0L))
      .reduce(_ + _)
    words.groupBy(col(idCol))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col(idCol), packed.as("simhash"))
      .orderBy(idCol)
  }

  /** Hamming distance between two packed simhash columns. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Winnowing-style document fingerprints: hash word n-grams, keep the
    * minimum hash of each sliding window of `window` consecutive shingles,
    * dedup. Identical passages share fingerprints regardless of position.
    * The window partitions by document — no global ordering.
    */
  def fingerprints(df: DataFrame, textCol: String, idCol: String,
                   n: Int, window: Int,
                   crossEngine: Boolean = false): DataFrame = {
    val joined = (0 until n).map(j => s"words[i + $j]").mkString(", ")
    val shingleHash =
      if (crossEngine) md5Hash60(lit(""), col("shingle"))
      else xxhash64(col("shingle"))
    val positioned = df.select(col(idCol),
        split(normalize(col(textCol)), " ").as("words"))
      .filter(size(col("words")) >= n)
      .select(col(idCol), posexplode(expr(
        s"transform(slice(words, 1, size(words) - ${n - 1}), " +
          s"(w, i) -> concat_ws(' ', $joined))")).as(Seq("pos", "shingle")))
      .select(col(idCol), col("pos"), shingleHash.as("h"))
    val w = Window.partitionBy(idCol).orderBy("pos")
      .rowsBetween(0, window - 1)
    positioned.withColumn("fp", min(col("h")).over(w))
      .select(col(idCol), col("fp")).distinct()
      .orderBy(idCol, "fp")
  }
}

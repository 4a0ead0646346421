package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** End-to-end training-corpus curation: the composed pipeline a
  * pre-training data team actually runs — language filter, quality filter,
  * exact dedup, near-dup cluster dedup, benchmark decontamination — plus
  * the deterministic train/val/test split that follows it. Re-expresses
  * the reference's multi-step curation posture (dk-installer's staged
  * MultiStepAction, SURVEY §3.3) as one declarative Spark program.
  *
  * Scale shape: every stage is a filter or a shuffle-by-key over the
  * SURVIVORS of the previous stage, so work shrinks monotonically down the
  * funnel; the only quadratic-risk step (near-dup pair generation) runs on
  * the post-quality corpus with the stop-shingle df cap. Stage frontiers
  * that feed both a count and the next stage are localCheckpoint'ed — at
  * warehouse scale each frontier would be a materialized table between
  * jobs, which is the same shape.
  */
object Curation {

  /** Default stage thresholds (chosen to discriminate on the harness
    * corpus; every value is surfaced in the funnel output's stage names
    * only implicitly — callers parameterize).
    */
  val DefaultMinScore = 0.45
  val DefaultContamN = 4
  val DefaultMaxContam = 0.5

  /** Whitespace-normalized content hash — the exact-dedup key. Built on
    * [[Dedup.normalize]] (the single canonical normalization, also behind
    * Dedup.exact and the NormSql oracle string) so the funnel's stage-3
    * keys can never drift from the standalone exact-dedup surface.
    */
  private def contentHash(textCol: String) =
    md5(Dedup.normalize(col(textCol)))

  /** The six stage frontiers of the curation pipeline, in order — each
    * DataFrame holds `(idCol, textCol, n_toks)` for the documents
    * surviving up to and including that stage. Documents with id <
    * `benchSplit` play the held-out benchmark (never part of the corpus;
    * source of decontamination shingles). The last frontier IS the
    * curated corpus.
    */
  def curationStages(docs: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text", benchSplit: Long = 50,
                     minScore: Double = DefaultMinScore,
                     shingleN: Int = 2, minJaccard: Double = 0.4,
                     contamN: Int = DefaultContamN,
                     maxContam: Double = DefaultMaxContam)
      : Seq[(String, DataFrame)] = {
    val base = docs.select(col(idCol), col(textCol),
        size(TextOps.words(col(textCol))).cast(LongType).as("n_toks"))
      .localCheckpoint(true)
    val corpus = base.filter(col(idCol) >= benchSplit)
    val bench = base.filter(col(idCol) < benchSplit)

    // 1. Language filter: keep documents whose stopword evidence
    //    identifies a language at all.
    val s1 = corpus.filter(
      TextOps.predictedLang(TextOps.words(col(textCol))) =!= "und")
    // 2. Quality filter on the shared composite score.
    val s2 = s1.filter(TextOps.qualityScore(col(textCol)) >= minScore)
    // 3. Exact dedup: keep the smallest id per normalized content hash.
    //    One partitioned window on the hash — a single key shuffle.
    val s3 = s2.withColumn("__h", contentHash(textCol))
      .withColumn("__keep",
        min(col(idCol)).over(Window.partitionBy("__h")))
      .filter(col(idCol) === col("__keep")).drop("__h", "__keep")
      .localCheckpoint(true)
    // 4. Near-dup dedup: pair graph over survivors, closed into clusters;
    //    keep each cluster's smallest id (docs in no pair keep themselves).
    val clusters = Dedup.dupClusters(
        Dedup.ngramJaccardPairs(s3, textCol, idCol, shingleN, minJaccard),
        idA = "doc_a", idB = "doc_b")
      .select(col("doc_id").as("__cdoc"), col("cluster_id"))
    val s4 = s3.join(clusters, s3(idCol) === col("__cdoc"), "left")
      .filter(col("cluster_id").isNull || col("cluster_id") === col(idCol))
      .drop("__cdoc", "cluster_id")
      .localCheckpoint(true)
    // 5. Decontamination: drop survivors sharing too many contamN-gram
    //    shingles with the benchmark set. Documents too short to shingle
    //    have no contamination row and are kept.
    val contam = TextOps.contamination(s4, bench, textCol, idCol, contamN)
      .select(col(idCol).as("__kdoc"), col("contamination"))
    val s5 = s4.join(contam, s4(idCol) === col("__kdoc"), "left")
      .filter(col("contamination").isNull ||
        col("contamination") < maxContam)
      .drop("__kdoc", "contamination")

    Seq("corpus" -> corpus, "lang_id" -> s1, "quality" -> s2,
      "exact_dedup" -> s3, "neardup_dedup" -> s4,
      "decontaminated" -> s5)
  }

  /** Six-stage curation funnel report: rows
    * `(stage, stage_name, n_docs, n_tokens)`, one per stage, counting the
    * documents and whitespace tokens that survive up to and including
    * that stage.
    */
  def curationFunnel(docs: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text", benchSplit: Long = 50,
                     minScore: Double = DefaultMinScore,
                     shingleN: Int = 2, minJaccard: Double = 0.4,
                     contamN: Int = DefaultContamN,
                     maxContam: Double = DefaultMaxContam): DataFrame =
    curationStages(docs, idCol, textCol, benchSplit, minScore, shingleN,
        minJaccard, contamN, maxContam)
      .zipWithIndex
      .map { case ((name, d), i) =>
        d.agg(count(lit(1)).as("n_docs"),
            coalesce(sum(col("n_toks")), lit(0L)).as("n_tokens"))
          .select(lit(i).cast(LongType).as("stage"),
            lit(name).as("stage_name"), col("n_docs"), col("n_tokens"))
      }
      .reduce(_ unionByName _)
      .orderBy("stage")

  /** The curated corpus itself — the last stage frontier as
    * `(idCol, n_toks)`, the document set a training run would consume.
    * Takes the same thresholds as [[curationFunnel]] so a caller tuning
    * one surface cannot silently leave the other behind.
    */
  def curatedCorpus(docs: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text", benchSplit: Long = 50,
                    minScore: Double = DefaultMinScore,
                    shingleN: Int = 2, minJaccard: Double = 0.4,
                    contamN: Int = DefaultContamN,
                    maxContam: Double = DefaultMaxContam): DataFrame =
    curationStages(docs, idCol, textCol, benchSplit, minScore, shingleN,
        minJaccard, contamN, maxContam).last._2
      .select(col(idCol), col("n_toks"))
      .orderBy(idCol)

  /** Sequence packing: assign each document a bin (context window) of at
    * most `budget` tokens by stream order — the step that turns a curated
    * corpus into fixed-size training sequences. Documents are laid out in
    * (group, id) order; a document starting at stream offset `off` goes to
    * bin `off div budget`, so documents never split and a bin overflows by
    * at most one document (first-fit-by-stream-order packing). One
    * partitioned window per group column (e.g. source) — packing
    * parallelizes across groups and never needs a global order.
    */
  def packSequences(docs: DataFrame, groupCol: String = "source",
                    idCol: String = "doc_id", textCol: String = "text",
                    budget: Long = 512L): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.select(col(groupCol), col(idCol),
        size(TextOps.words(col(textCol))).cast(LongType).as("n_toks"))
      .withColumn("off", coalesce(sum(col("n_toks")).over(w), lit(0L)))
      .withColumn("bin", expr(s"off div $budget"))
      .orderBy(groupCol, idCol)
  }

  /** Semantic near-dup pairs with lexical confirmation (the SemDeDup
    * posture): candidate pairs come from embedding cosine similarity
    * (meaning-level), each verified with the exact word-shingle Jaccard
    * of the two texts (surface-level). `agree` marks pairs where both
    * signals clear their thresholds — the safe-to-drop set; cosine-only
    * pairs are paraphrase candidates.
    *
    * Scale shape: candidate generation is the block-tiled cosine pass
    * (or swap in the LSH tier); verification packs each document's
    * distinct shingles into ONE array row, so a candidate pair is a
    * single row and the intersection is an in-row `array_intersect` —
    * two key joins, no pair×shingle explosion.
    */
  def semanticDedupPairs(docs: DataFrame, vecs: DataFrame,
                         docIdCol: String = "doc_id",
                         vecIdCol: String = "vec_id",
                         textCol: String = "text",
                         vecCol: String = "embedding",
                         minCos: Double = 0.4, shingleN: Int = 2,
                         minJaccard: Double = 0.4): DataFrame =
    confirmPairsLexically(
      graft.sim.Similarity.cosineNearDupPairs(vecs, vecIdCol, vecCol,
        minCos),
      docs, docIdCol, textCol, shingleN, minJaccard)

  /** [[semanticDedupPairs]] with the SCALE candidate tier: cosine
    * candidates come from the banded-LSH pair generator
    * (Similarity.cosineNearDupPairsLsh — a (band, bucket) equi-join,
    * never all-pairs) instead of the exact block-tiled scan, then get
    * the same exact-cosine verification and lexical confirmation. Same
    * output schema as the exact tier; recall < 1 by design, measured
    * in SimSpec/TextSpec against the exact row.
    */
  def semanticDedupPairsAnn(docs: DataFrame, vecs: DataFrame,
                            docIdCol: String = "doc_id",
                            vecIdCol: String = "vec_id",
                            textCol: String = "text",
                            vecCol: String = "embedding",
                            minCos: Double = 0.4, shingleN: Int = 2,
                            minJaccard: Double = 0.4, dim: Int = 64,
                            bands: Int = 12,
                            planesPerBand: Int = 3,
                            seed: Long = 7L,
                            maxBucket: Int = 0): DataFrame =
    confirmPairsLexically(
      graft.sim.Similarity.cosineNearDupPairsLsh(vecs, vecIdCol, vecCol,
        minCos, dim, bands, planesPerBand, seed, maxBucket),
      docs, docIdCol, textCol, shingleN, minJaccard)

  /** [[semanticDedupPairs]] with the CLUSTER-PRUNED candidate tier —
    * the full SemDeDup recipe (Abbas et al. 2023): deterministic
    * k-means partitions the embedding space, candidates are
    * within-cluster pairs only (Similarity.cosineNearDupPairsKmeans),
    * then the same exact-cosine + lexical-Jaccard confirmation. Same
    * output schema as the exact tier; every emitted pair is by
    * construction a pair the exact tier also emits (same cosine, same
    * Jaccard) — the registered subset gate holds that invariant.
    */
  def semanticDedupPairsKmeans(docs: DataFrame, vecs: DataFrame,
                               docIdCol: String = "doc_id",
                               vecIdCol: String = "vec_id",
                               textCol: String = "text",
                               vecCol: String = "embedding",
                               minCos: Double = 0.4, shingleN: Int = 2,
                               minJaccard: Double = 0.4, k: Int = 16,
                               iters: Int = 10, seed: Long = 7L,
                               maxCluster: Int = 0): DataFrame =
    confirmPairsLexically(
      graft.sim.Similarity.cosineNearDupPairsKmeans(vecs, vecIdCol,
        vecCol, minCos, k, iters, seed, maxCluster = maxCluster),
      docs, docIdCol, textCol, shingleN, minJaccard)

  /** The lexical verification tier shared by both semantic-dedup
    * variants: each candidate `(id_a, id_b, cos_sim)` row gains the
    * exact word-shingle Jaccard of the two texts and the `agree` flag.
    * Each document's distinct shingles are packed into ONE array row,
    * so a pair is a single row and the intersection is an in-row
    * `array_intersect` — two key joins, no pair×shingle explosion.
    */
  private def confirmPairsLexically(cand: DataFrame, docs: DataFrame,
                                    docIdCol: String, textCol: String,
                                    shingleN: Int,
                                    minJaccard: Double): DataFrame = {
    val sets = Dedup.shingles(docs, textCol, docIdCol, shingleN)
      .groupBy(col(docIdCol))
      .agg(collect_list(col("shingle")).as("shs"))
    val j = size(array_intersect(col("sa"), col("sb"))).cast(DoubleType) /
      (size(col("sa")) + size(col("sb")) -
        size(array_intersect(col("sa"), col("sb"))))
    cand
      .join(sets.select(col(docIdCol).as("id_a"), col("shs").as("sa")),
        "id_a")
      .join(sets.select(col(docIdCol).as("id_b"), col("shs").as("sb")),
        "id_b")
      .select(col("id_a"), col("id_b"), col("cos_sim"),
        round(j, 4).as("jaccard"),
        (j >= minJaccard).as("agree"))
      .orderBy("id_a", "id_b")
  }

  /** DSIR-style importance weights (Xie et al., "Data Selection for
    * Language Models via Importance Resampling"): score every document
    * by how much its hashed-n-gram profile resembles a TARGET slice of
    * the corpus versus the corpus overall —
    * log w(x) = Σ_features ( ln p_target[bucket] − ln q_source[bucket] ),
    * with add-one-smoothed bucket distributions. Documents resembling
    * the target get positive log-weights and survive importance
    * resampling; this is the standard cheap alternative to training a
    * quality classifier.
    *
    * Determinism/parity: features hash to buckets via the md5-prefix
    * trick (cross-engine identical, the deterministicSplit pattern);
    * per-bucket log-ratios round to 6 dp and accumulate as
    * DECIMAL(18,6), so the per-doc sum is addition-order independent.
    * Scale shape: one explode → one groupBy(bucket) over the corpus
    * (the model is `buckets` rows — control-plane), then a broadcast
    * join of the exploded features to the 64-row score table and a
    * per-doc aggregate. No driver action, no all-pairs anything.
    */
  def importanceWeights(docs: DataFrame, targetPred: Column,
                        idCol: String = "doc_id", textCol: String = "text",
                        buckets: Int = 64, n: Int = 2): DataFrame = {
    require(buckets >= 2 && n >= 1)
    val joined = (0 until n).map(j => s"words[i + $j]").mkString(", ")
    // n-gram features WITH multiplicity (unlike Dedup.shingles, which
    // distincts for set semantics — a bag model needs the counts)
    val feats = docs
      .select(col(idCol), targetPred.as("is_target"),
        split(trim(col(textCol)), "\\s+").as("words"))
      .filter(size(col("words")) >= n)
      .select(col(idCol), col("is_target"), explode(expr(
        s"transform(slice(words, 1, size(words) - ${n - 1}), " +
          s"(w, i) -> concat_ws(' ', $joined))")).as("feat"))
      .withColumn("bucket",
        conv(substring(md5(col("feat")), 1, 6), 16, 10)
          .cast(LongType) % buckets)
    val bucketCts = feats.groupBy("bucket")
      .agg(count(lit(1)).as("q_ct"),
        count(when(col("is_target"), 1)).as("p_ct"))
    val totals = bucketCts.agg(sum(col("q_ct")).as("q_tot"),
      sum(col("p_ct")).as("p_tot"))
    val scores = bucketCts.crossJoin(broadcast(totals))
      .select(col("bucket"),
        round(
          log((col("p_ct") + lit(1)).cast(DoubleType) /
            (col("p_tot") + lit(buckets)).cast(DoubleType)) -
            log((col("q_ct") + lit(1)).cast(DoubleType) /
              (col("q_tot") + lit(buckets)).cast(DoubleType)), 6)
          .cast(DecimalType(18, 6)).as("score"))
    feats.join(broadcast(scores), "bucket")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"),
        round(sum(col("score")).cast(DoubleType), 4).as("log_weight"))
      .orderBy(idCol)
  }

  /** Hashed-vocabulary linear classifier INFERENCE — the model-based
    * quality-filter stage (FineWeb-Edu / DCLM posture: train a fastText
    * -shaped classifier offline, then score and gate the whole corpus
    * with it). [[importanceWeights]] is the train-from-corpus
    * alternative; this is the complementary deployment half — the model
    * arrives as a FIXED weight function over hashed token buckets, so
    * scoring is a pure per-row expression: hash each token to one of
    * `ClassifierBuckets` buckets (vocabulary hashing — the trick that
    * makes the model size independent of vocabulary size), sum the
    * bucket weights, normalize by token count. ZERO shuffles, zero
    * joins, one scan — the ideal 100 TB shape; the only cost above a
    * plain filter is one md5 per token, and the HOF lambda's
    * interpreted evaluation is noise next to that hash.
    *
    * Weights here are a deterministic function of the bucket id
    * (multiplicative-hash spread over [-98, 98]) standing in for a
    * trained model's coefficients — the PLUMBING (hashing, bucket map,
    * score normalization, threshold gate) is the operator; swapping in
    * trained weights is a broadcast literal away. Integer weights keep
    * the per-doc sum exact, so cross-engine parity needs no decimal
    * tricks: one double division at the end, round(,4), done.
    */
  val ClassifierBuckets = 4096
  val ClassifierMult = 2654435761L // Knuth multiplicative constant
  val ClassifierMod = 197
  val ClassifierThreshold = 0.0

  def classifierScore(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame = {
    val b = ClassifierBuckets
    // the words array is built with the Column API (one regex spelling,
    // shared with every other tokenizing operator); only the fold runs
    // through expr() — and that string is deliberately backslash-free
    val weightSum =
      s"""aggregate(
         |  words,
         |  0L,
         |  (acc, w) -> acc +
         |    ((CAST(conv(substring(md5(w), 1, 6), 16, 10) AS BIGINT)
         |      % $b) * ${ClassifierMult}L) % $ClassifierMod
         |    - ${(ClassifierMod - 1) / 2}L)""".stripMargin
    docs
      .select(col(idCol), split(trim(col(textCol)), "\\s+").as("words"))
      .select(col(idCol),
        size(col("words")).cast(LongType).as("n_toks"),
        expr(weightSum).as("raw"))
      .select(col(idCol), col("n_toks"), col("raw"),
        round(col("raw").cast(DoubleType) /
          (lit(((ClassifierMod - 1) / 2).toDouble) * col("n_toks")), 4)
          .as("margin"))
      .withColumn("kept",
        (col("margin") >= ClassifierThreshold).cast(IntegerType))
      .orderBy(idCol)
  }

  /** Domain-mixture rebalancing plan: given per-domain token inventories
    * and a UNIFORM target mixture, compute the largest total budget the
    * smallest domain can support and the per-domain keep-rate that
    * achieves it (budget_d = min over domains of available tokens;
    * keep_rate_d = budget / available_d). This is the control-plane
    * artifact a mixture-balancing step (the DoReMi/data-mixing posture)
    * feeds into sampling — the actual sampling composes with
    * [[deterministicSplit]]-style hash bucketing. One groupBy over the
    * corpus; the plan itself is |domains| rows.
    */
  def mixturePlan(docs: DataFrame, domainCol: String = "source",
                  textCol: String = "text"): DataFrame = {
    val agg = docs.groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(TextOps.words(col(textCol))).cast(LongType))
          .as("n_tokens"))
    val tot = agg.agg(sum(col("n_tokens")).as("tot"),
      min(col("n_tokens")).as("min_toks"),
      count(lit(1)).as("k"))
    agg.crossJoin(broadcast(tot))
      .select(col(domainCol), col("n_docs"), col("n_tokens"),
        round(col("n_tokens").cast(DoubleType) / col("tot"), 4)
          .as("cur_share"),
        round(lit(1.0) / col("k"), 4).as("target_share"),
        col("min_toks").as("budget_tokens"),
        round(col("min_toks").cast(DoubleType) / col("n_tokens"), 4)
          .as("keep_rate"))
      .orderBy(domainCol)
  }

  /** Execute a [[mixturePlan]]: deterministic per-domain downsampling to
    * the plan's keep-rates. Each document draws a stable 0–9999 bucket
    * from md5("mix:" + id) and survives iff bucket < keep_rate·10⁴ — the
    * same hash-not-random posture as [[deterministicSplit]] (salted so
    * the draw is independent of the split assignment), so a re-run, a
    * different engine, or a repartitioned cluster selects the SAME
    * documents. The plan joins back as a broadcast of |domains| rows;
    * the survivor filter is a pure per-row expression, so the whole
    * sampling pass is one corpus scan with no shuffle.
    */
  def mixtureSample(docs: DataFrame, domainCol: String = "source",
                    idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    val rates = mixturePlan(docs, domainCol, textCol)
      .select(col(domainCol),
        round(col("keep_rate") * 10000).cast(LongType).as("keep_bps"))
    val bucket = (conv(substring(md5(concat(lit("mix:"),
      col(idCol).cast(StringType))), 1, 6), 16, 10).cast(LongType)
      % 10000).as("bucket")
    docs.join(broadcast(rates), domainCol)
      .select(col(idCol), col(domainCol),
        size(TextOps.words(col(textCol))).cast(LongType).as("n_toks"),
        bucket, col("keep_bps"))
      .filter(col("bucket") < col("keep_bps"))
      .orderBy(idCol)
  }

  /** Adaptive length-band filter: keep documents whose token count lies
    * within the corpus's [pLo, pHi] percentile band — thresholds taken
    * from the DATA, not constants (the C4/Gopher practice of cutting the
    * length tails, made re-runnable as the corpus drifts). Exact
    * interpolated percentiles (Spark `percentile` ≡ DuckDB
    * `quantile_cont`, the Profiler parity pair) under oracle parity;
    * at 100 TB swap `approx_percentile` in, same plan shape. The bounds
    * are a ONE-ROW aggregate broadcast back over the scan — two passes
    * over one long column, no shuffle of the corpus itself.
    */
  def lengthBandFilter(docs: DataFrame, idCol: String = "doc_id",
                       textCol: String = "text", pLo: Double = 0.05,
                       pHi: Double = 0.95): DataFrame = {
    val toks = docs.select(col(idCol),
      size(TextOps.words(col(textCol))).cast(LongType).as("n_toks"))
    val bounds = toks.agg(
      percentile(col("n_toks"), lit(pLo)).as("lo"),
      percentile(col("n_toks"), lit(pHi)).as("hi"))
    toks.crossJoin(broadcast(bounds))
      .filter(col("n_toks") >= col("lo") && col("n_toks") <= col("hi"))
      .select(col(idCol), col("n_toks"),
        round(col("lo"), 4).as("lo"), round(col("hi"), 4).as("hi"))
      .orderBy(idCol)
  }

  /** Filter-policy matrix — the curation POLICY layer: every quality
    * signal (heuristic score, Gopher-style repetition, unigram
    * surprisal, adaptive length band) evaluated per document as an
    * explicit boolean, plus the conjunctive keep verdict. Unlike
    * [[curationFunnel]] (which reports survivors per stage), this emits
    * the full decision matrix — the artifact a data team audits
    * threshold-by-threshold before committing a corpus cut, and what a
    * reviewer needs to answer "WHY was this document dropped?".
    *
    * Scale shape: the signal tables are per-doc aggregates joining back
    * on the id key; the length bounds are a one-row broadcast. Documents
    * too short for a trigram carry no repetition row — absent evidence
    * is not a drop reason (coalesce true).
    */
  def filterPolicy(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text", minScore: Double,
                   maxTopBigram: Double, minSurprisal: Double,
                   pLo: Double = 0.05, pHi: Double = 0.95): DataFrame = {
    val base = docs.select(col(idCol),
      size(TextOps.words(col(textCol))).cast(LongType).as("n_toks"),
      TextOps.qualityScore(col(textCol)).as("score"))
    val bounds = base.agg(
      percentile(col("n_toks"), lit(pLo)).as("lo"),
      percentile(col("n_toks"), lit(pHi)).as("hi"))
    val rep = TextOps.repetitionSignals(docs, textCol, idCol)
      .select(col(idCol), col("top_bigram_frac"))
    val sur = TextOps.unigramSurprisal(docs, textCol, idCol)
      .select(col(idCol), col("avg_surprisal"))
    base.join(rep, Seq(idCol), "left").join(sur, Seq(idCol), "left")
      .crossJoin(broadcast(bounds))
      .select(col(idCol),
        (col("score") >= minScore).as("quality_ok"),
        coalesce(col("top_bigram_frac") <= maxTopBigram, lit(true))
          .as("repetition_ok"),
        coalesce(col("avg_surprisal") >= minSurprisal, lit(true))
          .as("surprisal_ok"),
        (col("n_toks") >= col("lo") && col("n_toks") <= col("hi"))
          .as("length_ok"))
      .withColumn("keep", col("quality_ok") && col("repetition_ok") &&
        col("surprisal_ok") && col("length_ok"))
      .orderBy(idCol)
  }

  /** Overlapping fixed-size chunking — the retrieval/embedding prep step:
    * each document becomes windows of `chunkSize` words starting every
    * `chunkSize - overlap` words (the last chunk may be short). One
    * generator expression per row (sequence → posexplode → slice), no
    * shuffle, no driver involvement; output rows are (id, chunk_id,
    * start, n_words, chunk-text).
    */
  def chunkDocuments(docs: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text", chunkSize: Int = 64,
                     overlap: Int = 16): DataFrame = {
    require(chunkSize > overlap && overlap >= 0)
    val step = chunkSize - overlap
    docs.select(col(idCol), TextOps.words(col(textCol)).as("w"))
      .select(col(idCol), col("w"),
        posexplode(sequence(lit(0), size(col("w")) - 1, lit(step)))
          .as(Seq("chunk_id", "start")))
      .select(col(idCol), col("chunk_id").cast(LongType).as("chunk_id"),
        col("start").cast(LongType).as("start"),
        least(lit(chunkSize), size(col("w")) - col("start"))
          .cast(LongType).as("n_words"),
        concat_ws(" ", slice(col("w"), col("start") + 1, lit(chunkSize)))
          .as("chunk"))
      .orderBy(col(idCol), col("chunk_id"))
  }

  /** Train→eval split leakage: for every val/test document, the fraction
    * of its distinct `n`-word spans that also occur in the TRAIN split —
    * the pre-training hygiene check that [[deterministicSplit]] alone
    * cannot give (hash-disjoint doc IDs do not make the CONTENT
    * disjoint; near-identical docs land in different splits and leak
    * evaluation signal). Same posture as benchmark decontamination, but
    * the benchmark is your own held-out split.
    *
    * Scale shape: the train span set is a distinct-projected index a
    * warehouse materializes per split snapshot; eval spans hash-join
    * against it and aggregate per doc — no pairs, no windows. Documents
    * shorter than one span carry no row (both engines drop identically).
    */
  def splitLeakage(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text", n: Int = 8): DataFrame = {
    val split = deterministicSplit(docs, idCol)
      .select(col(idCol), col("split"))
    val sh = Dedup.shingles(docs, textCol, idCol, n)
      .join(split, idCol)
    // the left-join-and-count-hits idiom shared with TextOps
    // .contamination: count(__hit) counts only matched (non-null) rows,
    // mirroring the oracle's count(tr.shingle)
    val trainSpans = sh.filter(col("split") === "train")
      .select(col("shingle")).distinct()
      .withColumn("__hit", lit(1))
    sh.filter(col("split") =!= "train")
      .join(trainSpans, Seq("shingle"), "left")
      .groupBy(col(idCol), col("split"))
      .agg(count(lit(1)).as("n_spans"),
        count(col("__hit")).as("n_leaked"))
      .select(col(idCol), col("split"), col("n_spans"), col("n_leaked"),
        round(col("n_leaked").cast(DoubleType) / col("n_spans"), 4)
          .as("leak_frac"))
      .orderBy(idCol)
  }

  /** Deterministic train/val/test assignment: bucket 0-99 from the first
    * six hex digits of md5(id), split 80/10/10. Hash-based (not random)
    * so the assignment is stable across runs, engines, and re-partitions —
    * the property a reproducible pipeline needs. Pure per-row expression:
    * no shuffle, no state, embarrassingly parallel.
    */
  /** Deterministic training-export shard plan — the last stage of a
    * corpus pipeline before the trainer reads it: a seeded GLOBAL
    * shuffle (md5 of seed:id — a new seed reshuffles the corpus; the
    * same seed reproduces the exact order across runs, engines, and
    * partition counts) assigns every document a shard and a position,
    * plus a running token total inside the shard. Physical shape is
    * one hash exchange on `shard` and one in-partition sort — exactly
    * what `write.partitionBy(shard)` needs at 1000 executors: no
    * global sort, no driver involvement, shards sort independently.
    * `cum_toks` is what lets a trainer cut each shard at a token
    * budget without re-scanning the text.
    */
  def shardPlan(docs: DataFrame, idCol: String = "doc_id",
                textCol: String = "text", nShards: Int = 8,
                seed: Long = 42L): DataFrame = {
    require(nShards >= 1)
    val w = Window.partitionBy("shard").orderBy("skey", idCol)
    docs.select(col(idCol),
        size(TextOps.words(col(textCol))).cast(LongType).as("n_toks"))
      .withColumn("skey",
        md5(concat_ws(":", lit(seed), col(idCol).cast(StringType))))
      .withColumn("shard",
        conv(substring(col("skey"), 1, 6), 16, 10).cast(LongType)
          % nShards)
      .withColumn("pos", row_number().over(w).cast(LongType))
      .withColumn("cum_toks", sum(col("n_toks")).over(w))
      .select(col(idCol), col("shard"), col("pos"), col("n_toks"),
        col("cum_toks"))
      .orderBy("shard", "pos")
  }

  def deterministicSplit(df: DataFrame, idCol: String = "doc_id",
                         trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val bucket = (conv(substring(md5(col(idCol).cast(StringType)), 1, 6),
      16, 10).cast(LongType) % 100).as("bucket")
    df.select(col(idCol), bucket)
      .withColumn("split",
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + valPct, "val")
          .otherwise("test"))
      .orderBy(idCol)
  }
}

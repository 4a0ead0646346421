package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over embedding columns (SURVEY.md M6). Two paths:
  *
  *  - brute-force top-k cosine: broadcast the (small) query set against the
  *    corpus — one corpus scan, per-partition scoring, per-query top-k via a
  *    query-partitioned window. The right baseline, and exactly what a
  *    shuffle-free 100 TB scoring pass looks like when queries fit in
  *    memory.
  *  - random-hyperplane LSH ANN: 4–16 sign bits bucket the corpus; queries
  *    probe their own bucket plus all hamming-1 neighbors (multiprobe), so
  *    candidate generation is a bucket-key join, never a cross product.
  *    Recall < 1 by design; the spec measures it against brute force.
  *
  * All math is double (`array<float>` cast up exactly), products and the
  * left-to-right `aggregate` fold are IEEE-identical cross-engine.
  */
object Similarity {

  /** Left-to-right dot product of two array<double> columns — the native
    * codegen'd expression (graft.functions.DotProduct); bit-identical to
    * [[dotHof]] but runs inside WholeStageCodegen.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.DotProduct.dot(a, b)

  /** The same fold through built-in higher-order functions (interpreted
    * lambda per element) — kept as the parity reference for SimSpec.
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** cosine = dot / (|a|·|b|) — composed exactly as the oracle writes it. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Symmetric int8 quantization with a per-vector max-abs scale — the
    * standard storage-compression step for an embedding store (4× smaller
    * than float32; at 100 TB that is the difference between one copy and
    * four). Emits one row per (id, dim) with the quantized level and the
    * rounded scale so the result is hash-stable scalars, not arrays. Pure
    * per-row expressions — no shuffle, embarrassingly parallel.
    */
  def quantizeInt8(df: DataFrame, idCol: String,
                   vecCol: String): DataFrame = {
    val v = asDouble(col(vecCol))
    val scale = array_max(transform(v, x => abs(x)))
    df.select(col(idCol), scale.as("__s"),
        posexplode(v).as(Seq("dim", "x")))
      .select(col(idCol), col("dim").cast(LongType).as("dim"),
        when(col("__s") > 0,
          round(col("x") * lit(127.0) / col("__s"), 0))
          .otherwise(0.0).cast(LongType).as("q"),
        round(col("__s"), 4).as("scale"))
      .orderBy(idCol, "dim")
  }

  /** Seeded dense random-projection matrix (Johnson–Lindenstrauss map):
    * `outDim` rows of `inDim` integer coefficients in [-1000, 1000],
    * applied as c/1000.0 — integers so the SAME matrix can be rendered
    * into oracle SQL exactly (the double each c/1000.0 produces is the
    * one correctly-rounded IEEE quotient in every engine).
    */
  def rpMatrix(outDim: Int, inDim: Int, seed: Long): Seq[Seq[Int]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(outDim)(Seq.fill(inDim)(rng.nextInt(2001) - 1000))
  }

  /** Dense random projection of an embedding column to `outDim`
    * dimensions — the classic JL dimensionality reduction that precedes
    * clustering / ANN indexing when the native dimension is too wide to
    * score economically (at 100 TB, a 64→16 projection is a 4× cut in
    * every downstream dot product and shuffle byte).
    *
    * Execution shape: the matrix is control-plane data embedded as plan
    * literals; each output component is one [[dot]] against a literal
    * row — the native codegen'd loop (an inlined 64-term add chain
    * overflows Janino's method limit and falls back to interpreted; the
    * loop does not). No shuffle, no UDF. Parity shape: float components
    * widen exactly to double and [[dot]]'s left-to-right fold is
    * IEEE-identical to DuckDB's list_inner_product (the knn precedent),
    * so the 6-dp rounding hash-matches the SQL mirror.
    */
  def randomProjection(df: DataFrame, idCol: String, vecCol: String,
                       matrix: Seq[Seq[Int]]): DataFrame = {
    val v = asDouble(col(vecCol))
    val outCols = matrix.zipWithIndex.map { case (row, j) =>
      round(dot(v, lit(row.map(_ / 1000.0).toArray)), 6).as(f"r$j%02d")
    }
    df.select(col(idCol) +: outCols: _*).orderBy(idCol)
  }

  /** Cell-balanced diversity sampling: bucket vectors into deterministic
    * sign-LSH cells (one bit per integer hyperplane from [[rpMatrix]]) and
    * keep the top `perCell` rows of each cell — the cluster-balanced
    * selection step (the DeepMind/SemDeDup "diversify the keep-set"
    * posture) that prevents a curated corpus from collapsing onto its
    * densest embedding region. The ranking criterion is the rounded L2
    * norm (a magnitude/energy proxy) with id tie-breaks, so the selection
    * is engine-independent and hash-checkable — unlike KMeans cells, a
    * sign-bit cell assignment has no float-iteration drift.
    *
    * Scale shape: cell bits are `nPlanes` codegen'd [[dot]]s against plan
    * literals (no shuffle); the only shuffle is the per-cell top-k window
    * on the cell key — 2^nPlanes cells, each a rank-limit window Spark
    * executes as partial+final WindowGroupLimit, so the full corpus never
    * sorts globally. Skew bound: cells are sign-bit halfspace
    * intersections of a centered corpus — at 100× pick nPlanes so
    * 2^nPlanes ≫ executor count and let AQE split any hot cell.
    */
  def diversitySample(df: DataFrame, idCol: String, vecCol: String,
                      planes: Seq[Seq[Int]], perCell: Int): DataFrame = {
    require(planes.nonEmpty && perCell >= 1)
    val v = asDouble(col(vecCol))
    val cell = planes.zipWithIndex.map { case (p, j) =>
      when(dot(v, lit(p.map(_ / 1000.0).toArray)) >= 0, lit(1L << j))
        .otherwise(lit(0L))
    }.reduce(_ + _)
    val w = Window.partitionBy(col("cell"))
      .orderBy(col("norm").desc, col(idCol))
    df.select(col(idCol), cell.as("cell"),
        round(norm(v), 6).as("norm"))
      .withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= perCell)
      .orderBy(col("cell"), col("rnk"))
  }

  /** Margin-ordered multiprobe ANN top-k over DETERMINISTIC sign-LSH
    * cells — the oracle-checkable member of the ANN ladder:
    * [[knnLsh]]/[[knnIvf]] bucket by xxhash/KMeans (engine-specific,
    * rows-only + recall specs), but integer-literal hyperplanes make
    * this cell assignment, and therefore the whole result, reproducible
    * in any engine. Each query probes `probes` cells chosen ADAPTIVELY
    * (Lv et al., multi-probe LSH): every flip mask is penalized by the
    * summed |margin| of the planes it crosses — a neighbor most likely
    * sits across the hyperplanes the query is closest to — and the
    * `probes` cheapest masks win (ties broken by mask, so the order is
    * total). At the same probe budget this beats fixed hamming-1
    * probing because a 2-bit flip across two near-zero margins is more
    * promising than a 1-bit flip across a confident plane. Candidates
    * are scored with the exact codegen'd cosine; the probe set rides an
    * EXPLODE + rank on the (small) query side, so candidate generation
    * stays a cell equi-join — never a theta join or cross product.
    * Recall < 1 by design; cells under k return fewer rows. Penalties
    * are fixed-order sums of |dot| against plan literals, so the probe
    * choice itself is IEEE-reproducible in the SQL oracle.
    */
  def knnRp(corpus: DataFrame, queries: DataFrame, idCol: String,
            vecCol: String, k: Int, planes: Seq[Seq[Int]],
            probes: Int = 0): DataFrame = {
    val nP = planes.size
    // the adaptive probe ranking enumerates ALL 2^nP flip masks as one
    // plan-literal array per query row — 12 planes = 4096 structs is the
    // ceiling before the explode and codegen cost dwarf what probing
    // saves; beyond that, bucket on bands (lshCandidatePairs) instead
    require(nP >= 1 && nP <= 12,
      s"knnRp enumerates 2^nP probe masks; nP=$nP exceeds the 12-plane cap")
    val nCells = 1 << nP
    val budget = if (probes > 0) probes else nP + 1
    def cellOf(vec: Column): Column = planes.zipWithIndex.map {
      case (p, j) =>
        when(dot(vec, lit(p.map(_ / 1000.0).toArray)) >= 0, lit(1L << j))
          .otherwise(lit(0L))
    }.reduce(_ + _)
    val c = corpus.select(col(idCol).as("neighbor_id"),
      asDouble(col(vecCol)).as("cv"))
      .withColumn("cell", cellOf(col("cv")))
    // per-plane |margin| columns, then one struct{pen, f} per flip mask;
    // the penalty sums set-bit margins in ascending plane order — the
    // exact addition order the oracle SQL renders
    val qm = queries.select(col(idCol).as("query_id"),
        asDouble(col(vecCol)).as("qv"))
      .withColumn("home", cellOf(col("qv")))
      .select(Seq(col("query_id"), col("qv"), col("home")) ++
        planes.zipWithIndex.map { case (p, j) =>
          abs(dot(col("qv"), lit(p.map(_ / 1000.0).toArray))).as(s"__m$j")
        }: _*)
    val masks = array((0 until nCells).map { f =>
      val pen = (0 until nP).filter(j => (f & (1 << j)) != 0)
        .map(j => col(s"__m$j"))
        .reduceOption[Column](_ + _).getOrElse(lit(0.0))
      struct(pen.as("pen"), lit(f.toLong).as("f"))
    }: _*)
    val pw = Window.partitionBy(col("query_id"))
      .orderBy(col("pf.pen"), col("pf.f"))
    val q = qm.withColumn("pf", explode(masks))
      .withColumn("pr", row_number().over(pw))
      .filter(col("pr") <= budget)
      .select(col("query_id"), col("qv"),
        col("home").bitwiseXOR(col("pf.f")).as("cell"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    q.join(c, "cell")
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("qv"), col("cv")), 4).as("cos_sim"))
      .withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
      .orderBy("query_id", "rank")
  }

  /** Per-label centroid of a vector column, one row per (label, dim).
    * posexplode fans each vector into its components; the per-dimension
    * sums are exact DECIMAL(28,6) (addition-order-independent — the
    * Profiler parity pattern), so the derived double centroid hash-matches
    * any engine computing the same decimal sums. Scale shape: rows × dim
    * explode feeds a map-side partial aggregate; the shuffle carries only
    * (labels × dim) groups.
    */
  def centroids(df: DataFrame, labelCol: String,
                vecCol: String): DataFrame =
    df.select(col(labelCol).cast(LongType).as("label"),
        posexplode(col(vecCol)).as(Seq("dim", "v")))
      .groupBy("label", "dim")
      .agg(count(lit(1)).as("n_vecs"),
        sum(col("v").cast(graft.profile.Profiler.SumDec)).as("s1"))
      .select(col("label"), col("dim").cast(LongType).as("dim"),
        col("n_vecs"),
        round(col("s1").cast(DoubleType) / col("n_vecs"), 4).as("centroid"))
      .orderBy("label", "dim")

  /** Per-dimension embedding drift between two corpus snapshots — the
    * vector-store twin of the tabular PSI/schema-drift detectors: when a
    * new embedding model version, a pipeline change, or a shifted data
    * mix lands in the store, the per-dimension means move long before
    * downstream retrieval quality visibly degrades. For each dimension,
    * exact DECIMAL first/second-moment sums per side feed a two-sample
    * z statistic (the engine's B2/B8 heritage): shift = mean_b − mean_a,
    * z = shift / sqrt(var_a/n_a + var_b/n_b). Output is one hash-stable
    * row per dimension.
    *
    * Scale shape: posexplode → ONE groupBy(dim) partial-aggregated
    * shuffle per side (dims × 3 decimal buffers — tiny), then a
    * dims-sized join; no per-vector state ever crosses the shuffle.
    * Parity: decimal sums are addition-order independent; the variance
    * and z formulas are the same double trees the profiler/test
    * evaluator use, so the oracle hash-matches.
    */
  def embeddingDrift(a: DataFrame, b: DataFrame,
                     vecCol: String): DataFrame = {
    def moments(df: DataFrame): DataFrame =
      df.select(posexplode(asDouble(col(vecCol))).as(Seq("dim", "v")))
        .groupBy("dim")
        .agg(count(lit(1)).as("n"),
          sum(col("v").cast(graft.profile.Profiler.SumDec)).as("s1"),
          sum((col("v") * col("v"))
            .cast(graft.profile.Profiler.SumDec)).as("s2"))
    def mean(s1: Column, n: Column) = s1.cast(DoubleType) / n
    // clamped like Profiler.derivedStd: a constant dimension's numerator
    // is a tiny NEGATIVE in float math, and while Spark's sqrt(neg) is
    // NaN, DuckDB's hard-errors — the clamp keeps both engines on z=NULL
    // via the se>0 guard
    def variance(s1: Column, s2: Column, n: Column) =
      greatest(s2.cast(DoubleType) -
        s1.cast(DoubleType) * s1.cast(DoubleType) / n, lit(0.0)) /
        (n - lit(1))
    val ma = moments(a).select(col("dim"), col("n").as("n_a"),
      col("s1").as("s1a"), col("s2").as("s2a"))
    val mb = moments(b).select(col("dim"), col("n").as("n_b"),
      col("s1").as("s1b"), col("s2").as("s2b"))
    val meanA = mean(col("s1a"), col("n_a"))
    val meanB = mean(col("s1b"), col("n_b"))
    val se = sqrt(variance(col("s1a"), col("s2a"), col("n_a")) / col("n_a") +
      variance(col("s1b"), col("s2b"), col("n_b")) / col("n_b"))
    ma.join(mb, "dim")
      .select(col("dim").cast(LongType).as("dim"), col("n_a"), col("n_b"),
        round(meanA, 6).as("mean_a"), round(meanB, 6).as("mean_b"),
        round(meanB - meanA, 6).as("shift"),
        when(se > 0, round((meanB - meanA) / se, 4)).as("z"))
      .orderBy("dim")
  }

  /** Embedding-cosine near-duplicate pairs — the exact tier of the vector
    * dedup ladder (SURVEY.md M6): every unordered pair with cosine ≥ tau.
    * The verification baseline the oracle can replicate, same role as
    * [[knnBruteForce]]. At corpus scale, generate candidates with the
    * [[knnLsh]] sign-bucket join instead (recall < 1 by design) and verify
    * only candidates exactly.
    *
    * Execution shape: the corpus is scanned once per block against a
    * BROADCAST TILE of itself — `nBlocks` broadcast nested-loop joins,
    * each broadcasting only |corpus|/nBlocks vectors through Spark's
    * broadcast exchange (no driver-side collect of the full corpus; size
    * nBlocks so one tile fits comfortably in executor memory at the
    * target SF). Per-pair scoring runs the codegen'd [[dot]] expression
    * with norms precomputed once per row, accumulating left-to-right —
    * bit-identical to the `aggregate` fold and to DuckDB's
    * list_inner_product, so oracle parity is preserved.
    */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                         tau: Double, nBlocks: Int = 4): DataFrame = {
    require(nBlocks >= 1)
    val vecs = df.select(col(idCol).cast(LongType).as("id"),
        asDouble(col(vecCol)).as("v"))
      .withColumn("nrm", norm(col("v")))
    val left = vecs.select(col("id").as("id_a"), col("v").as("va"),
      col("nrm").as("na"))
    // Each block's (small) pair output is materialized with
    // localCheckpoint BEFORE the next block starts: a lazy union of all
    // blocks would keep every tile's broadcast live for the whole job,
    // putting the full corpus back on the driver and every executor —
    // the exact failure the tiling exists to avoid. Eager per-block jobs
    // bound peak broadcast memory to one tile.
    val raw = (0 until nBlocks).map { b =>
      val tile = vecs.filter(pmod(col("id"), lit(nBlocks)) === b)
        .select(col("id").as("id_b"), col("v").as("vb"),
          col("nrm").as("nb"))
      left.join(broadcast(tile), col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          (dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("raw"))
        // pre-filter with a half-ulp-of-rounding margin: HALF_UP rounding
        // to 4 decimals can lift a value by < 5e-5, never more
        .filter(col("raw") >= tau - 5e-5)
        .localCheckpoint(true)
    }.reduce(_ unionAll _)
    raw.select(col("id_a"), col("id_b"),
        round(col("raw"), 4).as("cos_sim"))
      .filter(col("cos_sim") >= tau)
      .orderBy("id_a", "id_b")
  }

  /** Cross-corpus exact cosine pairs ≥ `tau` — the semantic-LEAKAGE
    * shape: every (corpus, probe) pair whose embeddings are closer than
    * the threshold, with the PROBE side tiled and broadcast. At
    * production scale the probe side is the held-out eval set —
    * thousands of items against a 100 TB train corpus — so broadcasting
    * probe tiles keeps the corpus distributed and scanned exactly once
    * per tile; same eager per-block materialization as
    * [[cosineNearDupPairs]] to bound peak broadcast memory to one tile.
    */
  def crossCosinePairs(corpus: DataFrame, probes: DataFrame,
                       idCol: String, vecCol: String, tau: Double,
                       nBlocks: Int = 4): DataFrame = {
    require(nBlocks >= 1)
    val cv = corpus.select(col(idCol).cast(LongType).as("id_a"),
        asDouble(col(vecCol)).as("va"))
      .withColumn("na", norm(col("va")))
    val pv = probes.select(col(idCol).cast(LongType).as("id_b"),
        asDouble(col(vecCol)).as("vb"))
      .withColumn("nb", norm(col("vb")))
    val raw = (0 until nBlocks).map { b =>
      val tile = pv.filter(pmod(col("id_b"), lit(nBlocks)) === b)
      cv.crossJoin(broadcast(tile))
        .select(col("id_a"), col("id_b"),
          (dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("raw"))
        .filter(col("raw") >= tau - 5e-5)
        .localCheckpoint(true)
    }.reduce(_ unionAll _)
    raw.select(col("id_a"), col("id_b"),
        round(col("raw"), 4).as("cos_sim"))
      .filter(col("cos_sim") >= tau)
      .orderBy("id_a", "id_b")
  }

  /** ANN tier of the near-dup pair ladder — banded sign-bit LSH
    * (OR-of-ANDs amplification): `bands` independent signatures of
    * `planesPerBand` hyperplane sign bits each; two vectors are
    * CANDIDATES iff some band's full signature matches, and candidates
    * are then verified with the exact codegen'd cosine. Candidate
    * generation is a self equi-join on (band, bucket) — Σ bucket², never
    * n² — and verification joins vectors back by id, so no vector rides
    * the candidate shuffle twice.
    *
    * Band/width trade-off (standard S-curve): match probability for a
    * pair at angle θ is 1 − (1 − p^r)^b with p = 1 − θ/π, r =
    * planesPerBand, b = bands. Pruning power depends on the THRESHOLD,
    * not the corpus size: in the cos ≥ 0.9 regime semantic dedup
    * normally targets (θ ≤ 26°, p ≥ 0.86), 8 bands × 8 planes passes
    * ≈ 3% of background pairs at recall ≈ 0.99 — that is the 100 TB
    * configuration. The harness corpus' near-dups sit at cos 0.4–0.5
    * (θ ≈ 60–66°, p ≈ 0.63 vs 0.5 for background — an intrinsically
    * shallow S-curve), so the defaults trade the other way: 12 bands ×
    * 3 planes holds measured recall ≥ 0.95 while pruning ~21% of pairs.
    * Both regimes are measured in SimSpec (recall vs
    * [[cosineNearDupPairs]]; pruning via [[lshCandidatePairs]]).
    */
  def cosineNearDupPairsLsh(df: DataFrame, idCol: String, vecCol: String,
                            tau: Double, dim: Int, bands: Int = 12,
                            planesPerBand: Int = 3,
                            seed: Long = 7L,
                            maxBucket: Int = 0): DataFrame = {
    val vecs = df.select(col(idCol).cast(LongType).as("id"),
        asDouble(col(vecCol)).as("v"))
      .withColumn("nrm", norm(col("v")))
    lshCandidatePairs(df, idCol, vecCol, dim, bands, planesPerBand, seed,
        maxBucket)
      .join(vecs.select(col("id").as("id_a"), col("v").as("va"),
        col("nrm").as("na")), "id_a")
      .join(vecs.select(col("id").as("id_b"), col("v").as("vb"),
        col("nrm").as("nb")), "id_b")
      .select(col("id_a"), col("id_b"),
        (dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("raw"))
      // same half-ulp-of-rounding margin as the exact tier
      .filter(col("raw") >= tau - 5e-5)
      .select(col("id_a"), col("id_b"), round(col("raw"), 4).as("cos_sim"))
      .filter(col("cos_sim") >= tau)
      .orderBy("id_a", "id_b")
  }

  /** The integer-literal hyperplane family behind [[lshCandidatePairs]] —
    * exposed so the SQL oracle can render the IDENTICAL matrix (the
    * rpMatrix determinism pattern: each coefficient c applies as
    * c/1000.0, the one correctly-rounded IEEE quotient in every engine).
    */
  def lshPlanes(bands: Int, planesPerBand: Int, dim: Int,
                seed: Long): Seq[Seq[Int]] =
    rpMatrix(bands * planesPerBand, dim, seed)

  /** Sign-bit bucket id against INTEGER-literal planes (sign convention
    * `>= 0`, matching every other rpMatrix user) — engine-reproducible,
    * unlike a seeded-gaussian plane family whose doubles have no exact
    * SQL rendering.
    */
  def intBucketExpr(vec: Column, planes: Seq[Seq[Int]]): Column =
    planes.zipWithIndex.map { case (p, j) =>
      when(dot(vec, lit(p.map(_ / 1000.0).toArray)) >= 0, lit(1L << j))
        .otherwise(lit(0L))
    }.reduce(_ + _)

  /** The candidate tier of [[cosineNearDupPairsLsh]], exposed on its own:
    * distinct unordered id pairs whose banded sign-bit signatures collide
    * in at least one band. SimSpec measures its pruning factor directly
    * (candidates / all pairs) next to the end-to-end recall. Banding uses
    * the [[lshPlanes]] integer-literal family so the whole candidate set
    * (and therefore the registered semantic-dedup query built on it) is
    * reproducible in the DuckDB oracle — the same determinism upgrade
    * [[knnRp]] made over [[knnLsh]].
    *
    * `maxBucket`: the hot-bucket guard rail for the self-join. Candidate
    * volume is Σ bucket² per band — a bucket holding b ids emits b²/2
    * pairs, so ONE hot bucket (a dense embedding region, or simply a
    * too-coarse `planesPerBand` at a large corpus) can dominate the
    * whole stage; the sf1 scale gate measured exactly this shape
    * (candidates ∝ n²/2^planes in the shallow 12×3 config). Buckets
    * over the cap are skipped entirely — the standard production
    * posture: a bucket that collides thousands of vectors carries no
    * discriminating signal for its members (they still meet in their
    * OTHER bands with probability 1 − (1 − p^r)^(b−1)), and the recall
    * cost is measured in SimSpec on a planted-skew corpus. 0 = off
    * (the oracle-checked registered query runs uncapped).
    */
  def lshCandidatePairs(df: DataFrame, idCol: String, vecCol: String,
                        dim: Int, bands: Int, planesPerBand: Int,
                        seed: Long = 7L, maxBucket: Int = 0): DataFrame = {
    // each band's bucket packs planesPerBand sign bits into one Long;
    // the number of bands is unconstrained
    require(bands >= 1 && planesPerBand >= 1 && planesPerBand <= 62)
    val planes = lshPlanes(bands, planesPerBand, dim, seed)
    val keyed0 = df
      .select(col(idCol).cast(LongType).as("id"),
        asDouble(col(vecCol)).as("v"))
      .select(col("id"), explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          intBucketExpr(col("v"),
            planes.slice(b * planesPerBand, (b + 1) * planesPerBand))
            .as("bucket"))
      }: _*)).as("bb"))
      .select(col("id"), col("bb.band").as("band"),
        col("bb.bucket").as("bucket"))
    val keyed =
      if (maxBucket <= 0) keyed0
      else {
        // materialize the banding once: the guard consumes keyed0 twice
        // (count + anti-join) on top of the pair self-join below, and the
        // subtree is bands × planesPerBand dot products over the corpus —
        // without this it re-executes per consumer
        val keyedM = keyed0.localCheckpoint(true)
        // one partial-agg'd count on the join key, broadcast back as an
        // anti-filter — cheap next to the b² join it prevents
        val hot = keyedM.groupBy(col("band"), col("bucket"))
          .agg(count(lit(1)).as("__bs"))
          .filter(col("__bs") > maxBucket)
          .select(col("band"), col("bucket"))
        keyedM.join(broadcast(hot), Seq("band", "bucket"), "left_anti")
      }
    // a pair colliding in several bands appears once per collision —
    // distinct happens here, while rows are only ids
    keyed.select(col("band"), col("bucket"), col("id").as("id_a"))
      .join(keyed.select(col("band"), col("bucket"), col("id").as("id_b")),
        Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
  }

  /** Brute-force top-k cosine neighbors for each query vector (self
    * excluded). `queries` must be small — it is broadcast; the corpus is
    * scanned once with no shuffle before the per-query top-k.
    */
  def knnBruteForce(corpus: DataFrame, queries: DataFrame, idCol: String,
                    vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      asDouble(col(vecCol)).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("qv"), col("cv")), 4).as("cos_sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
      .orderBy("query_id", "rank")
  }

  /** IVF (inverted-file) approximate nearest neighbors — the second scale
    * path next to [[knnLsh]]: a KMeans coarse quantizer (seeded, trained
    * once) partitions the corpus into `nlist` Voronoi cells; every vector
    * is bucketed by nearest centroid, and each query exact-scores ONLY the
    * `nprobe` cells whose centroids are nearest to it. Candidate
    * generation is an equi-join on the cell id — never a cross product —
    * so the scoring cost is ≈ nprobe/nlist of brute force.
    *
    * Scale shape: centroids are control-plane data (nlist × dim doubles)
    * embedded as plan literals — cell assignment is a narrow codegen'd
    * projection (argmin over nlist dot products via the native [[dot]]
    * expression, no UDF, no shuffle); the corpus is bucketed in the same
    * pass that joins. Training reads a bounded sample. Recall < 1 by
    * design and measured against [[knnBruteForce]] in SimSpec.
    */
  def knnIvf(corpus: DataFrame, queries: DataFrame, idCol: String,
             vecCol: String, k: Int, nlist: Int, nprobe: Int,
             seed: Long = 7L, trainLimit: Int = 100000): DataFrame = {
    require(nprobe >= 1 && nprobe <= nlist)
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    // Train on a seeded Bernoulli SAMPLE, not limit(): limit takes an
    // arbitrary scan prefix — on a corpus stored sorted/clustered the
    // centroids would cover one region of the space and recall would
    // collapse. The one count() is a cheap control-plane job.
    val total = corpus.count()
    val fraction = math.min(1.0, trainLimit.toDouble / math.max(1L, total))
    val train = corpus
      .select(array_to_vector(asDouble(col(vecCol))).as("features"))
      .sample(withReplacement = false, fraction, seed)
    // a coarse quantizer only buckets — random init + few iterations is
    // enough (kmeans|| init costs more than the clustering here)
    val model = new KMeans().setK(nlist).setSeed(seed).setMaxIter(5)
      .setInitMode("random").fit(train)
    val centroids: Seq[Seq[Double]] =
      model.clusterCenters.toSeq.map(_.toArray.toSeq)
    // squared distance to centroid c, up to the per-row constant |v|²:
    // |c|² − 2·v·c — enough for argmin/ranking
    def cellDist(vec: Column, c: Seq[Double]): Column =
      lit(c.map(x => x * x).sum) - lit(2.0) * dot(vec, array(c.map(lit): _*))
    def cellsRanked(vec: Column): Column = array_sort(array(
      centroids.zipWithIndex.map { case (c, i) =>
        struct(cellDist(vec, c).as("d"), lit(i).as("cell"))
      }: _*))
    val cOut = corpus.select(col(idCol).as("neighbor_id"),
        asDouble(col(vecCol)).as("cv"))
      .withColumn("cell", element_at(cellsRanked(col("cv")), 1)("cell"))
    val q = queries.select(col(idCol).as("query_id"),
        asDouble(col(vecCol)).as("qv"))
      .select(col("query_id"), col("qv"),
        explode(slice(cellsRanked(col("qv")), 1, nprobe)("cell"))
          .as("cell"))
    val scored = cOut.join(broadcast(q), "cell")
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("qv"), col("cv")), 4).as("cos_sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
      .orderBy("query_id", "rank")
  }

  /** Per-vector hygiene for an embedding store — the data-quality pass a
    * 100 TB vector corpus needs before anything downstream trusts it:
    * dimension drift, NaN contamination, zero components, and
    * zero-norm/degenerate vectors (which poison cosine math with
    * divisions by zero). Pure per-row expressions over the array — no
    * shuffle, embarrassingly parallel; the norm runs on the codegen'd
    * [[dot]] expression.
    */
  def vectorHygiene(df: DataFrame, idCol: String, vecCol: String,
                    expectedDim: Int): DataFrame = {
    val v = asDouble(col(vecCol))
    df.select(col(idCol),
        size(v).cast(LongType).as("dim_ct"),
        size(filter(v, x => isnan(x))).cast(LongType).as("n_nan"),
        size(filter(v, x => x === 0.0)).cast(LongType).as("n_zero"),
        round(norm(v), 4).as("norm"))
      .withColumn("degenerate",
        col("n_nan") > 0 || col("norm") === 0.0 ||
          col("dim_ct") =!= expectedDim)
      .orderBy(idCol)
  }

  // ---- corpus clustering (k-means) ---------------------------------------

  /** Deterministic k-means centroids for corpus clustering — the
    * train-on-a-bounded-sample posture every sketch here uses ([[pqTrain]],
    * [[knnIvf]]): a seeded Bernoulli sample is collected (control-plane,
    * ≤ `trainLimit` rows regardless of corpus size) and [[lloydPp]]
    * (k-means++ init) runs on the driver, so the result is a pure
    * function of (corpus, k, iters,
    * seed) with none of MLlib's parallel-reduction nondeterminism. At
    * 100 TB the sample bound IS the design: clustering quality saturates
    * in the thousands of training points while the ASSIGNMENT — the part
    * that must scale — stays a narrow distributed projection.
    */
  def kmeansTrain(corpus: DataFrame, vecCol: String, k: Int, iters: Int,
                  seed: Long,
                  trainLimit: Int = 8192): Array[Array[Double]] = {
    val total = corpus.count()
    val fraction =
      math.min(1.0, trainLimit.toDouble / math.max(1L, total))
    val sample = corpus.select(asDouble(col(vecCol)).as("v"))
      .sample(withReplacement = false, fraction, seed)
      .collect().map(_.getSeq[Double](0).toArray)
    // Cap k against the REALIZED sample: callers scale k with corpus
    // size (kmDedupK ~ n/1024) but the Bernoulli sample is bounded by
    // trainLimit (and stochastically below it), so an uncapped k aborts
    // lloydPp (needs pts.length >= k) once n outgrows trainLimit*1024.
    // A centroid per ≤4 training points is already degenerate
    // clustering, so the cap costs nothing at sane ratios and keeps the
    // 100 TB path alive (r9 ADVICE).
    val kEff = math.max(1, math.min(k, sample.length / 4))
    // the cap engaging is a SIGNAL, not a silent default (r10 advice):
    // callers/oracles deriving expectations from the requested k would
    // otherwise see a different clustering with nothing saying why. The
    // returned array's length IS the effective k (authoritative for
    // programmatic callers); the log line makes sweep adjudication see
    // the bound without reverse-engineering it.
    if (kEff < k)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"kmeansTrain: requested k=$k capped to kEff=$kEff by realized " +
          s"sample size ${sample.length} (trainLimit=$trainLimit); the " +
          "returned centroid count is the effective cluster count")
    lloydPp(sample, kEff, iters, seed)
  }

  /** Assign every vector to its nearest centroid (squared euclidean;
    * ties break to the lower cluster id) — the SemDeDup/domain-discovery
    * partitioning pass (Abbas et al. 2023 cluster first, then prune
    * within clusters). Centroids embed as plan literals, so assignment
    * is one codegen'd argmin projection over the [[dot]] expression — no
    * shuffle, no join, embarrassingly parallel; the output's
    * (cluster_id) grouping key is what downstream within-cluster ops
    * shuffle on. `dist2` is exact squared distance
    * |v|² + |c|² − 2·v·c, rounded for engine-neutral output.
    */
  def kmeansAssignWith(df: DataFrame, idCol: String, vecCol: String,
                       cents: Array[Array[Double]]): DataFrame = {
    val v = asDouble(col(vecCol))
    df.select(col(idCol),
        nearestCentroid(v, cents).as("best"), dot(v, v).as("vv"))
      .select(col(idCol),
        col("best")("cluster").cast(LongType).as("cluster_id"),
        round(col("vv") + col("best")("d"), 4).as("dist2"))
      .orderBy(idCol)
  }

  /** struct(d, cluster) of the nearest centroid to `v` — d is squared
    * distance up to the per-row |v|² constant (|c|² − 2·v·c), which is
    * enough for the argmin; ties break to the lower cluster id via the
    * struct sort. Shared by [[kmeansAssignWith]] and
    * [[cosineNearDupPairsKmeans]] so their partitionings cannot drift.
    */
  private def nearestCentroid(v: Column,
                              cents: Array[Array[Double]]): Column = {
    def cellDist(c: Array[Double]): Column =
      lit(c.map(x => x * x).sum) - lit(2.0) * dot(v, array(c.map(lit).toSeq: _*))
    element_at(array_sort(array(cents.zipWithIndex.map { case (c, i) =>
      struct(cellDist(c).as("d"), lit(i).as("cluster"))
    }.toSeq: _*)), 1)
  }

  /** SemDeDup-shaped candidate tier for the near-dup pair ladder
    * (exact [[cosineNearDupPairs]] / LSH [[cosineNearDupPairsLsh]] /
    * this): vectors are partitioned by deterministic k-means
    * ([[kmeansTrain]]) and only WITHIN-cluster pairs are scored with the
    * exact codegen'd cosine — precisely Abbas et al. 2023's "cluster
    * with k-means, dedup inside each cluster". Candidate volume is
    * Σ cluster², controlled by k (their production setting is k in the
    * tens of thousands, putting ~10³ vectors per cluster at 10⁸ corpus
    * size); `maxCluster` is the same guard rail as the LSH tier's
    * hot-bucket cap for degenerate dense regions. One shuffle on
    * cluster_id; assignment itself is the shuffle-free argmin
    * projection. Recall < 1 by design (a pair straddling a cluster
    * boundary is lost — the documented SemDeDup trade); measured in
    * SimSpec against the exact tier, and the registered query is fenced
    * by a subset-consistency gate.
    */
  def cosineNearDupPairsKmeans(df: DataFrame, idCol: String,
                               vecCol: String, tau: Double, k: Int,
                               iters: Int = 10, seed: Long = 7L,
                               trainLimit: Int = 8192,
                               maxCluster: Int = 0): DataFrame = {
    val cents = kmeansTrain(df, vecCol, k, iters, seed, trainLimit)
    val keyed0 = df
      .select(col(idCol).cast(LongType).as("id"),
        asDouble(col(vecCol)).as("v"))
      .withColumn("nrm", norm(col("v")))
      .withColumn("cluster",
        nearestCentroid(col("v"), cents)("cluster").cast(LongType))
    val keyed =
      if (maxCluster <= 0) keyed0
      else {
        val keyedM = keyed0.localCheckpoint(true)
        val hot = keyedM.groupBy(col("cluster"))
          .agg(count(lit(1)).as("__cs"))
          .filter(col("__cs") > maxCluster)
          .select(col("cluster"))
        keyedM.join(broadcast(hot), Seq("cluster"), "left_anti")
      }
    keyed.select(col("cluster"), col("id").as("id_a"),
        col("v").as("va"), col("nrm").as("na"))
      .join(keyed.select(col("cluster"), col("id").as("id_b"),
        col("v").as("vb"), col("nrm").as("nb")), "cluster")
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("raw"))
      // same half-ulp-of-rounding margin as the exact tier
      .filter(col("raw") >= tau - 5e-5)
      .select(col("id_a"), col("id_b"), round(col("raw"), 4).as("cos_sim"))
      .filter(col("cos_sim") >= tau)
      .orderBy("id_a", "id_b")
  }

  /** [[kmeansTrain]] + [[kmeansAssignWith]] in one call. */
  def kmeansAssign(df: DataFrame, idCol: String, vecCol: String, k: Int,
                   iters: Int, seed: Long,
                   trainLimit: Int = 8192): DataFrame =
    kmeansAssignWith(df, idCol, vecCol,
      kmeansTrain(df, vecCol, k, iters, seed, trainLimit))

  /** ANN via fixed hamming-1 multiprobe LSH: corpus bucketed once; each
    * query probes its own bucket and every bucket at hamming distance 1
    * (planes+1 probes), then exact cosine ranks the candidates. Join key
    * = bucket id. The planes are the INTEGER-literal [[rpMatrix]] family
    * (c/1000.0, ≥0 sign convention — the same determinism [[knnRp]] and
    * [[lshCandidatePairs]] use), so the bucket assignment and therefore
    * the whole result renders into the DuckDB oracle; [[knnRp]] remains
    * the adaptive margin-ordered sibling at the same surface.
    */
  def knnLsh(corpus: DataFrame, queries: DataFrame, idCol: String,
             vecCol: String, k: Int, planes: Seq[Seq[Int]]): DataFrame = {
    val nPlanes = planes.size
    require(nPlanes >= 1 && nPlanes <= 20)
    val c = corpus.select(col(idCol).as("neighbor_id"),
        asDouble(col(vecCol)).as("cv"))
      .withColumn("bucket", intBucketExpr(col("cv"), planes))
    val q0 = queries.select(col(idCol).as("query_id"),
        asDouble(col(vecCol)).as("qv"))
      .withColumn("bucket0", intBucketExpr(col("qv"), planes))
    val probes = array((lit(0L) +:
      (0 until nPlanes).map(i => lit(1L << i))): _*)
    val q = q0.select(col("query_id"), col("qv"), col("bucket0"),
        explode(probes).as("flip"))
      .select(col("query_id"), col("qv"),
        col("bucket0").bitwiseXOR(col("flip")).as("bucket"))
    val scored = c.join(broadcast(q), "bucket")
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("qv"), col("cv")), 4).as("cos_sim"))
      .distinct()
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
      .orderBy("query_id", "rank")
  }

  // ---- product quantization (PQ) -----------------------------------------

  /** Deterministic Lloyd's k-means on a driver-side sample — the PQ
    * codebook trainer. Init picks k distinct points by a seeded shuffle
    * of the sample; iterations are plain assignment/mean steps, so the
    * result is a pure function of (sample, k, iters, seed). An emptied
    * cluster keeps its previous centroid.
    */
  private[graft] def lloyd(pts: Array[Array[Double]], k: Int, iters: Int,
                           seed: Long): Array[Array[Double]] = {
    require(pts.length >= k, s"need >= $k training points, got ${pts.length}")
    val rng = new scala.util.Random(seed)
    val cents = rng.shuffle(pts.indices.toVector).take(k)
      .map(i => pts(i).clone()).toArray
    lloydIterate(pts, cents, iters)
  }

  /** Deterministic k-means++ (D²-weighted) init + Lloyd — the CORPUS
    * clustering trainer ([[kmeansTrain]]). Shuffle init is fine for PQ
    * subspace codebooks (256 codes over dense 8-dim projections — any
    * spread works) but collapses on clustered full-space data: two
    * random seeds landing in one tight mass leave Lloyd stuck splitting
    * it while distinct clusters merge (the classic local minimum, seen
    * directly in SimSpec's blob fixture). D² sampling (Arthur &
    * Vassilvitskii 2007) picks each next seed with probability
    * proportional to squared distance from the chosen set — seeded rng,
    * cumulative-scan draw, so still a pure function of
    * (sample, k, iters, seed).
    */
  private[graft] def lloydPp(pts: Array[Array[Double]], k: Int,
                             iters: Int, seed: Long): Array[Array[Double]] = {
    require(pts.length >= k, s"need >= $k training points, got ${pts.length}")
    val rng = new scala.util.Random(seed)
    val dim = pts(0).length
    def sq(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var j = 0
      while (j < dim) { val t = a(j) - b(j); s += t * t; j += 1 }
      s
    }
    val chosen = new Array[Array[Double]](k)
    chosen(0) = pts(rng.nextInt(pts.length)).clone()
    val d2 = Array.fill(pts.length)(Double.MaxValue)
    var c = 1
    while (c < k) {
      var i = 0
      while (i < pts.length) {
        val d = sq(pts(i), chosen(c - 1))
        if (d < d2(i)) d2(i) = d
        i += 1
      }
      val total = d2.sum
      if (total == 0.0) {
        // all remaining points coincide with chosen seeds — any pick do
        chosen(c) = pts(rng.nextInt(pts.length)).clone()
      } else {
        var r = rng.nextDouble() * total
        var p = 0
        while (p < pts.length - 1 && r >= d2(p)) { r -= d2(p); p += 1 }
        chosen(c) = pts(p).clone()
      }
      c += 1
    }
    lloydIterate(pts, chosen, iters)
  }

  /** The shared Lloyd iteration body: assignment/mean steps from the
    * given initial centroids; an emptied cluster keeps its previous
    * centroid. Mutates nothing it is handed.
    */
  private def lloydIterate(pts: Array[Array[Double]],
                           init: Array[Array[Double]],
                           iters: Int): Array[Array[Double]] = {
    val k = init.length
    var cents = init
    val d = pts(0).length
    for (_ <- 1 to iters) {
      val sums = Array.fill(k)(new Array[Double](d))
      val cnts = new Array[Long](k)
      pts.foreach { p =>
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var dist = 0.0; var j = 0
          while (j < d) { val t = p(j) - cents(c)(j); dist += t * t; j += 1 }
          if (dist < bestD) { bestD = dist; best = c }
          c += 1
        }
        var j = 0
        while (j < d) { sums(best)(j) += p(j); j += 1 }
        cnts(best) += 1
      }
      cents = Array.tabulate(k)(c =>
        if (cnts(c) == 0) cents(c)
        else sums(c).map(_ / cnts(c)))
    }
    cents
  }

  /** Train PQ codebooks on a seeded sample of the corpus: the vector
    * space split into `m` contiguous subspaces, one `codes`-centroid
    * k-means per subspace. Returns codebooks(sub)(code)(subDim).
    * Training is bounded (`trainLimit` collected rows) and deterministic
    * — the 100 TB posture trains on a sample regardless of corpus size,
    * and m·codes·subDim doubles (8·256·8 here) are control-plane data.
    */
  def pqTrain(corpus: DataFrame, vecCol: String, m: Int, codes: Int,
              iters: Int, seed: Long,
              trainLimit: Int = 8192): Array[Array[Array[Double]]] = {
    val total = corpus.count()
    val fraction =
      math.min(1.0, trainLimit.toDouble / math.max(1L, total))
    val sample = corpus.select(asDouble(col(vecCol)).as("v"))
      .sample(withReplacement = false, fraction, seed)
      .collect().map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "empty PQ training sample")
    val dim = sample(0).length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val sub = dim / m
    Array.tabulate(m) { s =>
      val pts = sample.map(_.slice(s * sub, (s + 1) * sub))
      // a tiny corpus may have fewer than `codes` points — shrink the
      // codebook rather than fail (encode/ADC only index what exists)
      lloyd(pts, math.min(codes, pts.length), iters, seed + s)
    }
  }

  /** Product-quantized top-k cosine ANN with asymmetric-distance
    * shortlisting and EXACT re-rank — the memory-bounded third scale
    * path next to [[knnRp]]/[[knnLsh]]/[[knnIvf]] (Jégou et al., "Product
    * Quantization for Nearest Neighbor Search", TPAMI 2011 — public
    * method):
    *
    *  1. TRAIN: [[pqTrain]] on a bounded seeded sample (control-plane).
    *  2. ENCODE: one corpus pass stores, per vector, `m` byte codes
    *     (nearest sub-centroid per subspace) + its true norm — 8 bytes
    *     + 1 double per vector here vs 64 floats: a ~24× compression
    *     that keeps a 100 TB corpus' index in cluster memory. The
    *     argmin over m·codes sub-centroids is a tight loop over a
    *     broadcast codebook (mapPartitions — the honest tool for a
    *     2048-way argmin; an expression tree that size de-codegens).
    *  3. ADC SHORTLIST: each partition scans its codes once, scoring
    *     every vector against each query with m table lookups from the
    *     query's precomputed sub-dot LUT (approx dot = Σ_s
    *     lut(s)(code_s); approx cos divides by the stored true norm).
    *     Per-partition bounded heaps keep `shortlist` candidates per
    *     query — partition count × nQueries × shortlist rows total,
    *     never the corpus.
    *  4. EXACT RE-RANK: the global shortlist (one window) joins back to
    *     the raw vectors (equi-join on id) and exact cosine ranks the
    *     final top-k — output shape and tie-breaks identical to
    *     [[knnBruteForce]], so recall@k is measurable against the
    *     brute-force oracle tier.
    */
  def knnPq(corpus: DataFrame, queries: DataFrame, idCol: String,
            vecCol: String, k: Int, m: Int = 8, codes: Int = 256,
            iters: Int = 5, seed: Long = 7L, shortlist: Int = 100,
            trainLimit: Int = 8192): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val books = pqTrain(corpus, vecCol, m, codes, iters, seed, trainLimit)
    val sub = books(0)(0).length
    val bBooks = spark.sparkContext.broadcast(books)
    // queries are the small broadcast side, as in every knn* sibling
    val qRows = queries.select(col(idCol).cast(LongType).as("query_id"),
        asDouble(col(vecCol)).as("qv"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    require(qRows.nonEmpty, "no query vectors")
    // per-query LUT: lut(s)(c) = dot(q_sub(s), centroid(s)(c))
    val luts = qRows.map { case (qid, qv) =>
      val qn = math.sqrt(qv.map(x => x * x).sum)
      val lut = Array.tabulate(m) { s =>
        books(s).map { cent =>
          var acc = 0.0; var j = 0
          while (j < sub) { acc += qv(s * sub + j) * cent(j); j += 1 }
          acc
        }
      }
      (qid, qn, lut)
    }
    val bLuts = spark.sparkContext.broadcast(luts)
    val encoded = corpus
      .select(col(idCol).cast(LongType).as("id"),
        asDouble(col(vecCol)).as("v"))
      .as[(Long, Seq[Double])]
      .mapPartitions { it =>
        val bk = bBooks.value
        it.map { case (id, vSeq) =>
          val v = vSeq.toArray
          val cs = new Array[Byte](m)
          var s = 0
          while (s < m) {
            val cents = bk(s)
            var best = 0; var bestD = Double.MaxValue
            var c = 0
            while (c < cents.length) {
              var dist = 0.0; var j = 0
              while (j < sub) {
                val t = v(s * sub + j) - cents(c)(j); dist += t * t; j += 1
              }
              if (dist < bestD) { bestD = dist; best = c }
              c += 1
            }
            cs(s) = best.toByte
            s += 1
          }
          (id, cs, math.sqrt(v.map(x => x * x).sum))
        }
      }
    val candidates = encoded.mapPartitions { it =>
      val ls = bLuts.value
      // bounded per-query heaps: (approxCos, id) min-heaps of size
      // `shortlist` — partition output is queries × shortlist rows
      val heaps = ls.map { case (qid, _, _) =>
        qid -> scala.collection.mutable.PriorityQueue
          .empty[(Double, Long)](Ordering.by(t => (-t._1, t._2)))
      }.toMap
      it.foreach { case (id, cs, nrm) =>
        ls.foreach { case (qid, qn, lut) =>
          if (id != qid && nrm > 0 && qn > 0) {
            var acc = 0.0; var s = 0
            while (s < m) { acc += lut(s)(cs(s) & 0xff); s += 1 }
            val approx = acc / (qn * nrm)
            val h = heaps(qid)
            // head = worst retained under (approx desc, id asc); replace
            // on a strict win OR an approx TIE with a lower id, so the
            // shortlist is the exact top-`shortlist` of the partition
            // under that total order — partition-layout independent even
            // with duplicate vectors (r9 ADVICE: strict > dropped ties
            // by arrival order).
            if (h.size < shortlist) h.enqueue((approx, id))
            else if (approx > h.head._1 ||
                     (approx == h.head._1 && id < h.head._2)) {
              h.dequeue(); h.enqueue((approx, id))
            }
          }
        }
      }
      heaps.iterator.flatMap { case (qid, h) =>
        h.iterator.map { case (a, id) => (qid, id, a) }
      }
    }.toDF("query_id", "neighbor_id", "approx_cos")
    val wS = Window.partitionBy("query_id")
      .orderBy(col("approx_cos").desc, col("neighbor_id"))
    val short = candidates
      .withColumn("__r", row_number().over(wS))
      .filter(col("__r") <= shortlist)
      .select("query_id", "neighbor_id")
    val qDf = queries.select(col(idCol).cast(LongType).as("query_id"),
      asDouble(col(vecCol)).as("qv"))
    val cDf = corpus.select(col(idCol).cast(LongType).as("neighbor_id"),
      asDouble(col(vecCol)).as("cv"))
    val exact = short.join(cDf, "neighbor_id").join(broadcast(qDf), "query_id")
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("qv"), col("cv")), 4).as("cos_sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    exact.withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
      .orderBy("query_id", "rank")
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sim.Similarity
import graft.queries.SimQueries

class SimSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("cosine matches hand-computed values") {
    val df = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)),
      (3L, Array(1.0f, 1.0f)), (4L, Array(2.0f, 0.0f)),
    ).toDF("vec_id", "embedding")
    val knn = Similarity.knnBruteForce(df, df.filter(col("vec_id") === 1),
        "vec_id", "embedding", 3).collect()
    val byN = knn.map(r => r.getAs[Long]("neighbor_id") ->
      r.getAs[Double]("cos_sim")).toMap
    assert(byN(4L) == 1.0)     // same direction
    assert(byN(2L) == 0.0)     // orthogonal
    assert(byN(3L) == 0.7071)  // 45°
    // ranking: 4 (1.0), 3 (0.707), 2 (0.0)
    assert(knn.sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("neighbor_id"))
      .toSeq == Seq(4L, 3L, 2L))
  }

  test("native dot product matches the HOF fold bit-for-bit") {
    val e = Tables.load(spark, SparkTestSession.sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val pairs = e.as("a").join(e.as("b"),
      col("a.vec_id") + 1 === col("b.vec_id"))
    val rows = pairs.select(
      Similarity.dot(col("a.v"), col("b.v")).as("native"),
      Similarity.dotHof(col("a.v"), col("b.v")).as("hof")).collect()
    assert(rows.nonEmpty)
    // IEEE-identical, not approximately equal: same accumulation order
    assert(rows.forall(r => r.getDouble(0) == r.getDouble(1)))
  }

  test("int8 quantization is bounded, exact at extremes, zero-safe") {
    val df = Seq(
      (1L, Array(2.0f, -1.0f, 0.5f)),
      (2L, Array(0.0f, 0.0f, 0.0f)), // zero vector → scale 0, q 0
    ).toDF("vec_id", "embedding")
    val out = Similarity.quantizeInt8(df, "vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("dim")) ->
        (r.getAs[Long]("q"), r.getAs[Double]("scale"))).toMap
    assert(out((1L, 0L)) == (127L, 2.0))  // max-abs element hits ±127
    assert(out((1L, 1L))._1 == -64L)      // round(-1*127/2) = -64
    assert(out((1L, 2L))._1 == 32L)       // round(0.5*127/2) = 32
    assert((0L to 2L).forall(d => out((2L, d)) == (0L, 0.0)))
    // dequantization error ≤ scale/254 (half a quantization step)
    val x = Seq(2.0, -1.0, 0.5)
    (0 to 2).foreach { d =>
      val (q, s) = out((1L, d.toLong))
      assert(math.abs(q * s / 127.0 - x(d)) <= s / 254.0 + 1e-12)
    }
  }

  test("per-label centroids average each dimension exactly") {
    val df = Seq(
      (1L, Array(1.0f, 2.0f), 0),
      (2L, Array(3.0f, 6.0f), 0),
      (3L, Array(10.0f, 0.0f), 1),
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.centroids(df, "label", "embedding").collect()
      .map(r => (r.getAs[Long]("label"), r.getAs[Long]("dim")) ->
        (r.getAs[Long]("n_vecs"), r.getAs[Double]("centroid"))).toMap
    assert(out((0L, 0L)) == (2L, 2.0) && out((0L, 1L)) == (2L, 4.0))
    assert(out((1L, 0L)) == (1L, 10.0) && out((1L, 1L)) == (1L, 0.0))
  }

  test("cosine near-dup pairs surface planted duplicates only") {
    val df = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)),
      (3L, Array(0.99f, 0.05f)), (4L, Array(-1.0f, 0.0f)),
    ).toDF("vec_id", "embedding")
    val pairs = Similarity.cosineNearDupPairs(df, "vec_id", "embedding",
        0.95).collect()
    assert(pairs.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
      .toSeq == Seq((1L, 3L)))
    assert(pairs.head.getAs[Double]("cos_sim") > 0.99)
  }

  test("LSH ANN achieves useful recall against brute force") {
    val e = Tables.load(spark, SparkTestSession.sf, "embeddings")
    val q = e.filter(col("vec_id") < 20)
    val exact = Similarity.knnBruteForce(e, q, "vec_id", "embedding", 10)
      .collect().map(r => (r.getAs[Long]("query_id"),
        r.getAs[Long]("neighbor_id"))).toSet
    val ann = Similarity.knnLsh(e, q, "vec_id", "embedding", 10,
      SimQueries.LshMat)
      .collect().map(r => (r.getAs[Long]("query_id"),
        r.getAs[Long]("neighbor_id"))).toSet
    val recall = (exact & ann).size.toDouble / exact.size
    // multiprobe over 4 planes covers 5/16 of the corpus per query on
    // average; cosine-close vectors concentrate in nearby buckets, so
    // recall must beat that coverage baseline decisively
    assert(recall >= 0.5, s"recall@10 = $recall")
    // candidates are a strict subset of the corpus — the ANN result can
    // never contain more than k rows per query
    assert(ann.groupBy(_._1).forall(_._2.size <= 10))
  }

  test("IVF ANN achieves useful recall against brute force") {
    val e = Tables.load(spark, SparkTestSession.sf, "embeddings")
    val q = e.filter(col("vec_id") < 20)
    val exact = Similarity.knnBruteForce(e, q, "vec_id", "embedding", 10)
      .collect().map(r => (r.getAs[Long]("query_id"),
        r.getAs[Long]("neighbor_id"))).toSet
    val ivf = Similarity.knnIvf(e, q, "vec_id", "embedding", 10,
        nlist = 8, nprobe = 3)
      .collect().map(r => (r.getAs[Long]("query_id"),
        r.getAs[Long]("neighbor_id"))).toSet
    // probing 3 of 8 Voronoi cells scans ~3/8 of the corpus per query;
    // cosine-close vectors share cells, so recall must beat coverage
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall@10 = $recall")
    assert(ivf.groupBy(_._1).forall(_._2.size <= 10))
  }

  test("deterministic sign-cell ANN achieves useful recall against " +
    "brute force") {
    val e = Tables.load(spark, SparkTestSession.sf, "embeddings")
    val q = e.filter(col("vec_id") < 20)
    val exact = Similarity.knnBruteForce(e, q, "vec_id", "embedding", 10)
      .collect().map(r => (r.getAs[Long]("query_id"),
        r.getAs[Long]("neighbor_id"))).toSet
    // the REGISTERED configuration (queries.SimQueries), not a copy of
    // its literals — a config change there must change this measurement
    val planes = Similarity.rpMatrix(queries.SimQueries.RpAnnPlanes,
      queries.SimQueries.Dim, queries.SimQueries.RpAnnSeed)
    val ann = Similarity.knnRp(e, q, "vec_id", "embedding", 10, planes,
        queries.SimQueries.RpAnnProbes)
      .collect().map(r => (r.getAs[Long]("query_id"),
        r.getAs[Long]("neighbor_id"))).toSet
    // 32 margin-ordered probes over 64 cells scan the SAME ~1/2 of the
    // corpus as the original 3-plane hamming-1 config (recall 0.64);
    // finer adaptive cells lift measured recall@10 to 0.70. That is the
    // REGIME ceiling, not a probing defect: this corpus' top-10
    // neighbors sit at cos ≈ 0.30 (θ ≈ 72°, per-plane sign agreement
    // p₁ ≈ 0.60 vs 0.50 background, LSH exponent ρ ≈ 0.74) — sweeps of
    // 3–8 planes at fixed 1/2 coverage all plateau at 0.70–0.75. The
    // high-cos regime the operator targets at scale clears 0.9 at 8×
    // LESS coverage — measured in the planted-corpus test below.
    val recall = (exact & ann).size.toDouble / exact.size
    info(s"sign-cell ANN recall@10 = $recall")
    assert(recall >= 0.65, s"recall@10 = $recall")
    assert(ann.groupBy(_._1).forall(_._2.size <= 10))
  }

  test("margin-ordered multiprobe recalls planted high-cos neighbors at " +
    "1/8 coverage") {
    // the regime ANN runs at 100 TB: 30 planted duplicates (cos > 0.99)
    // over near-orthogonal background. knnRp must find each query's
    // duplicate as its top-1 while probing only 8 of 64 cells — the
    // margin ordering walks across exactly the hyperplanes the
    // duplicate pair straddles.
    val rnd = new java.util.Random(11L)
    def vec() = Array.fill(64)(rnd.nextGaussian().toFloat)
    val base = Seq.fill(300)(vec())
    val rows = base.zipWithIndex.map { case (v, i) => (i.toLong, v) } ++
      base.take(30).zipWithIndex.map { case (v, i) =>
        ((1000 + i).toLong,
          v.map(x => x + 0.01f * rnd.nextGaussian().toFloat))
      }
    val df = rows.toDF("vec_id", "embedding")
    val q = df.filter(col("vec_id") >= 1000)
    val exact = Similarity.knnBruteForce(df, q, "vec_id", "embedding", 1)
      .collect().map(r => (r.getAs[Long]("query_id"),
        r.getAs[Long]("neighbor_id"))).toSet
    val planes = Similarity.rpMatrix(6, 64, queries.SimQueries.RpAnnSeed)
    val ann = Similarity.knnRp(df, q, "vec_id", "embedding", 1, planes,
        probes = 8)
      .collect().map(r => (r.getAs[Long]("query_id"),
        r.getAs[Long]("neighbor_id"))).toSet
    val recall = (exact & ann).size.toDouble / exact.size
    info(s"planted recall@1 = $recall at coverage ${8.0 / 64}")
    assert(recall >= 0.9, s"recall@1 = $recall")
  }

  test("vector hygiene flags NaN, zero-norm, and dimension drift") {
    val df = Seq(
      (1L, Array(3.0f, 4.0f)),                 // clean, norm 5
      (2L, Array(0.0f, 0.0f)),                 // zero-norm → degenerate
      (3L, Array(Float.NaN, 1.0f)),            // NaN → degenerate
      (4L, Array(1.0f, 2.0f, 3.0f)),           // wrong dim → degenerate
      (5L, Array(0.0f, 2.0f)),                 // a zero COMPONENT is fine
    ).toDF("vec_id", "embedding")
    val out = Similarity.vectorHygiene(df, "vec_id", "embedding", 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(!out(1L).getAs[Boolean]("degenerate"))
    assert(out(1L).getAs[Double]("norm") == 5.0)
    assert(out(2L).getAs[Boolean]("degenerate"))
    assert(out(3L).getAs[Boolean]("degenerate") &&
      out(3L).getAs[Long]("n_nan") == 1)
    assert(out(4L).getAs[Boolean]("degenerate") &&
      out(4L).getAs[Long]("dim_ct") == 3)
    assert(!out(5L).getAs[Boolean]("degenerate") &&
      out(5L).getAs[Long]("n_zero") == 1)
  }

  test("plane families are deterministic across invocations") {
    assert(Similarity.rpMatrix(4, 8, 7L) == Similarity.rpMatrix(4, 8, 7L))
    assert(Similarity.lshPlanes(2, 3, 8, 7L) ==
      Similarity.lshPlanes(2, 3, 8, 7L))
  }

  test("banded-LSH near-dup pairs recall >= 0.9 against the exact tier") {
    val e = Tables.load(spark, SparkTestSession.sf, "embeddings")
    val exact = Similarity
      .cosineNearDupPairs(e, "vec_id", "embedding", 0.4)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity
      .cosineNearDupPairsLsh(e, "vec_id", "embedding", 0.4, dim = 64)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & ann).size.toDouble / exact.size
    assert(recall >= 0.9, s"pair recall = $recall")
    // no false positives: verification is exact, so every emitted pair
    // must also be in the exact tier
    assert((ann -- exact).isEmpty)
    // and the candidate tier must actually prune (the harness corpus'
    // cos 0.4–0.5 near-dup regime is the shallow end of the S-curve —
    // see the cosineNearDupPairsLsh scaladoc — so the bar is honest,
    // not dramatic)
    val n = e.count()
    val cand = Similarity
      .lshCandidatePairs(e, "vec_id", "embedding", 64, 12, 3).count()
    assert(cand < (n * (n - 1) / 2) * 0.9,
      s"candidates $cand vs all pairs ${n * (n - 1) / 2}")
  }

  test("banded LSH prunes hard in the high-cosine regime it targets") {
    // planted near-dup corpus: 150 seeded random 32-dim base vectors,
    // 30 of which get a tiny-noise duplicate (cos > 0.99); background
    // pairs are near-orthogonal. In this regime (the one semantic dedup
    // actually runs at 100 TB) 8 bands × 8 planes must recall ~all
    // planted pairs while passing only a few % of background pairs.
    val rnd = new java.util.Random(11L)
    def vec() = Array.fill(32)(rnd.nextGaussian().toFloat)
    val base = Seq.fill(150)(vec())
    val rows = base.zipWithIndex.map { case (v, i) => (i.toLong, v) } ++
      base.take(30).zipWithIndex.map { case (v, i) =>
        ((1000 + i).toLong, v.map(x => x + 0.01f * rnd.nextGaussian()
          .toFloat))
      }
    val df = rows.toDF("vec_id", "embedding")
    val exact = Similarity
      .cosineNearDupPairs(df, "vec_id", "embedding", 0.9)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.size >= 30) // every planted pair clears 0.9
    val ann = Similarity
      .cosineNearDupPairsLsh(df, "vec_id", "embedding", 0.9, dim = 32,
        bands = 8, planesPerBand = 8)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & ann).size.toDouble / exact.size
    assert(recall >= 0.9, s"high-cos recall = $recall")
    val n = rows.size.toLong
    val cand = Similarity
      .lshCandidatePairs(df, "vec_id", "embedding", 32, 8, 8).count()
    val frac = cand.toDouble / (n * (n - 1) / 2)
    assert(frac <= 0.15, s"candidate fraction = $frac")
  }

  test("hot-bucket guard caps candidate volume without losing planted " +
    "pairs") {
    // skewed corpus: 200 background vectors concentrated in one
    // halfspace (they pile into few sign buckets → hot buckets) plus 20
    // well-separated duplicate pairs. With the cap on, the hot
    // background buckets are skipped — candidate count drops hard —
    // while each planted pair still collides in some small bucket of
    // one of its OTHER bands.
    val rnd = new java.util.Random(5L)
    def base() = Array.fill(32)(rnd.nextGaussian().toFloat)
    // background: shared dominant direction + small noise → bucket pileup
    val dom = base()
    val bg = Seq.tabulate(200) { i =>
      (i.toLong, dom.zip(base()).map { case (d, n) => d + 0.15f * n })
    }
    val planted = Seq.tabulate(20) { i =>
      val v = base()
      Seq(((500 + i).toLong, v),
        ((900 + i).toLong, v.map(x => x + 0.005f * rnd.nextGaussian()
          .toFloat)))
    }.flatten
    val df = (bg ++ planted).toDF("vec_id", "embedding")
    def cand(cap: Int) = Similarity.lshCandidatePairs(df, "vec_id",
      "embedding", 32, 8, 8, maxBucket = cap)
    val uncapped = cand(0).count()
    val capped = cand(30)
    val cappedN = capped.count()
    info(s"candidates: uncapped $uncapped, capped $cappedN")
    assert(cappedN < uncapped / 2,
      s"cap did not bite: $cappedN vs $uncapped")
    // every planted pair survives the guard
    val pairs = capped.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    (0 until 20).foreach { i =>
      assert(pairs.contains(((500 + i).toLong, (900 + i).toLong)),
        s"planted pair $i lost")
    }
  }

  test("embedding drift surfaces a planted per-dimension mean shift") {
    val rnd = new java.util.Random(3L)
    def vec() = Array.fill(8)(rnd.nextGaussian().toFloat * 0.1f)
    val a = Seq.tabulate(300)(i => (i.toLong, vec()))
      .toDF("vec_id", "embedding")
    // snapshot b: dimension 2 shifted by +0.5, everything else unchanged
    val b = Seq.tabulate(300) { i =>
      val v = vec(); v(2) = v(2) + 0.5f; (i.toLong, v)
    }.toDF("vec_id", "embedding")
    val out = Similarity.embeddingDrift(a, b, "embedding").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.size == 8)
    val shifted = out(2L)
    assert(shifted.getAs[Double]("shift") > 0.4 &&
      shifted.getAs[Double]("z") > 10.0)
    out.filterNot(_._1 == 2L).values.foreach { r =>
      assert(math.abs(r.getAs[Double]("z")) < 5.0,
        s"dim ${r.getLong(0)} z=${r.getAs[Double]("z")}")
    }
    // drift of a snapshot against itself is identically zero
    val self = Similarity.embeddingDrift(a, a, "embedding").collect()
    assert(self.forall(r => r.getAs[Double]("shift") == 0.0))
    // constant dimensions: variance clamps to 0 (float math can drive
    // the numerator slightly negative — DuckDB's sqrt would hard-error)
    // and z is NULL via the se > 0 guard, not NaN
    val const = Seq.tabulate(50)(i =>
      (i.toLong, Array.fill(4)(0.0005f))).toDF("vec_id", "embedding")
    val cz = Similarity.embeddingDrift(const, const, "embedding").collect()
    assert(cz.length == 4 && cz.forall(r => r.isNullAt(r.fieldIndex("z"))))
  }

  test("random projection applies the literal matrix row by row") {
    // basis vector e_i picks out column i of each matrix row
    val m = Similarity.rpMatrix(outDim = 2, inDim = 3, seed = 5L)
    val df = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.0f, 0.0f, 1.0f)),
      (2L, Array(1.0f, 1.0f, 1.0f)),
    ).toDF("vec_id", "embedding")
    val out = Similarity.randomProjection(df, "vec_id", "embedding", m)
    assert(out.columns.toSeq == Seq("vec_id", "r00", "r01"))
    val rows = out.collect().map(r => r.getLong(0) ->
      (r.getDouble(1), r.getDouble(2))).toMap
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(rows(0L) == ((m(0)(0) / 1000.0, m(1)(0) / 1000.0)))
    assert(rows(1L) == ((m(0)(2) / 1000.0, m(1)(2) / 1000.0)))
    assert(rows(2L) ==
      ((r6(m(0).map(_ / 1000.0).sum), r6(m(1).map(_ / 1000.0).sum))))
    // seeded determinism: the same seed is the same matrix
    assert(m == Similarity.rpMatrix(2, 3, 5L))
  }

  test("diversity sample keeps at most perCell per sign-LSH cell and " +
    "ranks by norm") {
    // one hyperplane = two cells: sign of the first component
    val planes = Seq(Seq(1000, 0))
    val df = Seq(
      (0L, Array(3.0f, 0.0f)),   // cell 1, norm 3
      (1L, Array(1.0f, 0.0f)),   // cell 1, norm 1
      (2L, Array(2.0f, 0.0f)),   // cell 1, norm 2
      (3L, Array(-1.0f, 2.0f)),  // cell 0
      (4L, Array(-2.0f, 0.0f)),  // cell 0
    ).toDF("vec_id", "embedding")
    val out = Similarity
      .diversitySample(df, "vec_id", "embedding", planes, perCell = 2)
      .collect()
    assert(out.length == 4) // 2 kept from each of the 2 cells
    val kept = out.map(r => (r.getLong(1), r.getLong(0), r.getLong(3)))
    // cell 1 keeps the two largest norms (ids 0, 2); id 1 is cut;
    // cell 0 ranks |(-1,2)| = 2.236 above |(-2,0)| = 2
    assert(kept.toSet ==
      Set((1L, 0L, 1L), (1L, 2L, 2L), (0L, 3L, 1L), (0L, 4L, 2L)))
  }
  test("planted-recall driver gate: empty on the registered configs, " +
      "and the measurement genuinely fires under a broken cap") {
    import org.apache.spark.sql.functions.col
    // the registered gate, exactly as the driver runs it: no violation
    // rows on the shipped cap/banding constants
    val out = graft.queries.RecallQueries.recallCheckPlanted(spark,
      SparkTestSession.sf)
    assert(out.collect().isEmpty,
      "planted under-cap recall must meet its floors: " +
        out.collect().mkString("; "))
    // non-vacuity: the same planted cluster measured through a BROKEN
    // cap (maxBucket = 1 deletes every bucket) recovers nothing — a
    // regression of this shape flips the driver gate, not a hand tool
    val docs = graft.Tables.load(spark, SparkTestSession.sf, "documents")
    val emb = graft.Tables.load(spark, SparkTestSession.sf, "embeddings")
    import graft.queries.{SimQueries, TextQueries}
    import graft.tools.GenPlant
    import spark.implicits._
    val planted = GenPlant.EmbClusters.filter(_._1 == 3).flatMap {
      case (f, size, noise) => (0 until size).map { j =>
        (GenPlant.idOf(f, j), GenPlant.memberVec(f, j, noise).toSeq, f) }
    }.toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .withColumn("label", col("label").cast("int"))
    val plantedTexts = GenPlant.TextFamilies.filter(_._2 == 3).flatMap {
      case (_, f, size, nW, vocab, edits) => (0 until size).map { j =>
        val t = GenPlant.memberWords(f, j, nW, vocab, edits).mkString(" ")
        (GenPlant.idOf(f, j), t, "en", "planted", t.length.toLong) }
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val broken = graft.text.Curation.semanticDedupPairsAnn(
        docs.unionByName(plantedTexts), emb.unionByName(planted),
        minCos = TextQueries.AnnProdTau, shingleN = TextQueries.ShingleN,
        minJaccard = TextQueries.MinJaccard, dim = SimQueries.Dim,
        bands = TextQueries.AnnProdBands,
        planesPerBand = TextQueries.AnnProdPlanesPerBand,
        seed = TextQueries.AnnSeed, maxBucket = 1)
      .filter(col("id_a") >= GenPlant.PlantBase).count()
    assert(broken < 120 * 0.95,
      s"a cap of 1 must gut recall on the 120 planted pairs, got $broken")
  }

  test("PQ ANN: codebook training is deterministic, codes are 8 bytes " +
      "per vector, and ADC-shortlist + exact re-rank holds >= 0.9 " +
      "aggregate recall vs brute force") {
    import org.apache.spark.sql.functions.col
    val e = graft.Tables.load(spark, SparkTestSession.sf, "embeddings")
    val q = e.filter(col("vec_id") < 5)
    // deterministic trainer: same inputs -> bit-identical codebooks
    val b1 = Similarity.pqTrain(e, "embedding", 8, 256, 5, 7L)
    val b2 = Similarity.pqTrain(e, "embedding", 8, 256, 5, 7L)
    assert(b1.map(_.map(_.toSeq).toSeq).toSeq ==
      b2.map(_.map(_.toSeq).toSeq).toSeq)
    assert(b1.length == 8 && b1(0)(0).length == 8,
      "8 subspaces of dim 8 over the 64-dim embeddings")
    def tops(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .groupBy(_.getLong(0)).view
        .mapValues(_.map(_.getLong(1)).toSet).toMap
    val brute = tops(Similarity.knnBruteForce(e, q, "vec_id",
      "embedding", 10))
    val pq = tops(Similarity.knnPq(e, q, "vec_id", "embedding", 10))
    val recalls = brute.map { case (qid, truth) =>
      pq.getOrElse(qid, Set.empty).count(truth).toDouble / truth.size }
    val agg = recalls.sum / recalls.size
    assert(agg >= 0.9, s"aggregate PQ recall@10 $agg below 0.9 " +
      s"(per-query: ${recalls.mkString(", ")})")
    // the registered driver gate is empty on this corpus too
    assert(graft.queries.SimQueries.annPqRecallCheck(spark,
      SparkTestSession.sf).collect().isEmpty)
  }

  test("k-means: deterministic training, blob recovery, and tie-exact " +
      "argmin assignment") {
    // three well-separated blobs on coordinate axes in 8 dims
    def blob(axis: Int, n: Int): Seq[(Long, Array[Float])] =
      (0 until n).map { j =>
        val v = Array.fill(8)(0.001f * ((axis * 31 + j * 7) % 5))
        v(axis) = 1.0f + 0.01f * (j % 3)
        ((axis * 100 + j).toLong, v)
      }
    val pts = (blob(0, 40) ++ blob(3, 40) ++ blob(6, 40))
      .toDF("vec_id", "embedding")
    val out = Similarity.kmeansAssign(pts, "vec_id", "embedding",
      k = 3, iters = 10, seed = 11L, trainLimit = 1000)
    val rows = out.collect()
    assert(rows.length == 120)
    val byBlob = rows.groupBy(_.getAs[Long]("vec_id") / 100)
      .view.mapValues(_.map(_.getAs[Long]("cluster_id")).toSet).toMap
    // each blob lands in exactly one cluster; the three clusters differ
    byBlob.values.foreach(cls => assert(cls.size == 1, s"split: $byBlob"))
    assert(byBlob.values.flatten.toSet.size == 3, s"merged: $byBlob")
    // deterministic end to end
    val again = Similarity.kmeansAssign(pts, "vec_id", "embedding",
      k = 3, iters = 10, seed = 11L, trainLimit = 1000).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
    // assignment matches a driver-side argmin over the same centroids
    val cents = Similarity.kmeansTrain(pts, "embedding", 3, 10, 11L, 1000)
    val c2 = cents.map(c => c.map(x => x * x).sum)
    val vecsById = pts.collect().map(r => r.getLong(0) ->
      r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    rows.foreach { r =>
      val v = vecsById(r.getLong(0))
      val dists = cents.indices.map { i =>
        var d = 0.0; var j = 0
        while (j < v.length) { d += v(j) * cents(i)(j); j += 1 }
        c2(i) - 2.0 * d
      }
      assert(dists(r.getAs[Long]("cluster_id").toInt) == dists.min)
    }
  }

  test("kmeans-pruned near-dup tier: exact subset of the exact tier, " +
      "planted high-cos recall 1.0, and an empty registered gate") {
    import graft.queries.TextQueries
    import graft.tools.GenPlant
    val e = graft.Tables.load(spark, SparkTestSession.sf, "embeddings")
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b", "cos_sim").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // subset property holds at ANY tau: within-cluster scoring is the
    // exact tier's math over a pruned candidate set
    val exact = pairSet(Similarity.cosineNearDupPairs(e, "vec_id",
      "embedding", 0.4))
    val km04 = pairSet(Similarity.cosineNearDupPairsKmeans(e, "vec_id",
      "embedding", 0.4, k = 16, iters = 10, seed = 7L))
    assert(exact.nonEmpty)
    assert(km04.subsetOf(exact),
      s"cluster tier invented pairs: ${km04.diff(exact)}")
    // the tier's TARGET regime: planted cos ~ 0.9975 cluster merged
    // into the corpus is recovered completely at the prod threshold
    val planted = GenPlant.plantedEmbeddings(spark)
      .filter(col("label") === 3)
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .select("vec_id", "embedding")
    val merged = e.select("vec_id", "embedding").unionByName(planted)
    val kmHi = pairSet(Similarity.cosineNearDupPairsKmeans(merged,
      "vec_id", "embedding", 0.9, k = 16, iters = 10, seed = 7L))
      .filter(_._1 >= GenPlant.PlantBase)
    val size3 = GenPlant.EmbClusters.find(_._1 == 3).get._2
    assert(kmHi.size == size3 * (size3 - 1) / 2,
      s"planted recall ${kmHi.size}/${size3 * (size3 - 1) / 2}")
    // hot-cluster cap of 1 guts the planted recall — the gate's floor
    // leg is measuring something real
    val capped = pairSet(Similarity.cosineNearDupPairsKmeans(merged,
      "vec_id", "embedding", 0.9, k = 16, iters = 10, seed = 7L,
      maxCluster = 1)).count(_._1 >= GenPlant.PlantBase)
    assert(capped == 0, s"maxCluster=1 should gut recall, got $capped")
    val gate = TextQueries.semanticDedupKmeansCheck(spark,
      SparkTestSession.sf).collect()
    assert(gate.isEmpty, gate.mkString("; "))
  }

  test("k-means purity gate: empty on the sweep corpus, non-vacuous " +
      "under a broken trainer") {
    val gate = graft.queries.SimQueries.kmeansPurityCheck(spark,
      SparkTestSession.sf).collect()
    assert(gate.isEmpty, gate.mkString("; "))
    // non-vacuity: one centroid cannot separate the two planted
    // families — the merge/split invariants must fire
    import graft.tools.GenPlant
    val e = graft.Tables.load(spark, SparkTestSession.sf, "embeddings")
      .unionByName(GenPlant.plantedEmbeddings(spark)
        .withColumn("embedding", col("embedding").cast("array<float>")))
    val oneCent = Similarity.kmeansTrain(e, "embedding", 1, 2, 11L)
    val collapsed = Similarity.kmeansAssignWith(e, "vec_id", "embedding",
        oneCent)
      .filter(col("vec_id") >= GenPlant.PlantBase)
      .select("cluster_id").distinct().count()
    assert(collapsed == 1L,
      "k=1 must collapse the planted families into one cluster")
  }

  test("cross-split semantic leakage: every pair crosses the boundary " +
    "and the pair set equals the brute-force cross filter") {
    import graft.queries.SimQueries
    val out = SimQueries.semanticLeakage(spark, SparkTestSession.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.nonEmpty)
    def bucket(id: Long): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(h.substring(0, 6), 16) % 100
    }
    out.foreach { case (a, b, _) =>
      assert(bucket(a) < 80 && bucket(b) >= 80)
    }
    // brute-force mirror over the audit scope
    val e = graft.Tables.load(spark, SparkTestSession.sf, "embeddings")
      .filter(col("vec_id") % graft.queries.TextQueries.AuditMod === 0)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def cos(x: Array[Double], y: Array[Double]): Double = {
      var d = 0.0; var nx = 0.0; var ny = 0.0
      var i = 0
      while (i < x.length) {
        d += x(i) * y(i); nx += x(i) * x(i); ny += y(i) * y(i); i += 1
      }
      d / (math.sqrt(nx) * math.sqrt(ny))
    }
    val expect = (for {
      (ia, va) <- e if bucket(ia) < 80
      (ib, vb) <- e if bucket(ib) >= 80
      c = BigDecimal(cos(va, vb))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      if c >= SimQueries.NearDupTau
    } yield (ia, ib, c)).sortBy(p => (p._1, p._2))
    assert(out.toSeq == expect.toSeq)
  }
}

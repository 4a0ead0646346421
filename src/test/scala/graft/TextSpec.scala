package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.text.{Dedup, TextOps}

class TextSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val planted = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
    (3L, "completely different content about spark engines"),
    (4L, "THE  quick brown fox jumps over the lazy dog "), // exact dup of 1
    (5L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 1
  ).toDF("doc_id", "text")

  test("exact dedup keys on normalized content and keeps the smallest id") {
    val out = Dedup.exact(planted, "text", "doc_id").collect()
    assert(out.length == 3)
    val byId = out.map(r => r.getLong(0) -> r.getAs[Long]("n_dupes")).toMap
    assert(byId(1L) == 3) // docs 1, 4 (case/space-normalized), 5
    assert(byId(2L) == 1 && byId(3L) == 1)
  }

  test("exact n-gram jaccard finds the planted near-dup pair") {
    val pairs = Dedup.ngramJaccardPairs(planted, "text", "doc_id",
        n = 2, minJaccard = 0.4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L))) // 7 of 9 bigrams shared
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("minhash LSH recovers the exact high-jaccard pairs on the corpus") {
    val docs = Tables.load(spark, SparkTestSession.sf, "documents")
    val exact = Dedup.ngramJaccardPairs(docs, "text", "doc_id", 2, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.nearDuplicates(docs, "text", "doc_id", 2, 128, 32, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "corpus should contain planted near-dups")
    // at threshold 0.5 with the s-curve at ~0.42, recall should be total
    assert(lsh == exact, s"missed: ${exact -- lsh}, extra: ${lsh -- exact}")
    // the registered crossEngine mode (md5-base universal-hash slots)
    // changes the hash family, not the s-curve: same total recall
    val ce = Dedup.nearDuplicates(docs, "text", "doc_id", 2, 128, 32, 0.5,
      crossEngine = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ce == exact, s"missed: ${exact -- ce}, extra: ${ce -- exact}")
  }

  test("exact-dup collapse bounds the LSH candidate blowup of a planted " +
      "duplicate cluster and keeps the near-dup answer") {
    // 30 identical copies of one text (a boilerplate cluster), one
    // near-dup variant (x3), one unrelated doc: the raw candidate tier
    // must pay >= m(m-1)/2 pairs for the cluster (every band is the
    // same hot bucket — a cap would erase the cluster, not bound it),
    // while the collapsed tier sees 3 distinct contents
    val boiler = "the quick brown fox jumps over the lazy dog near the " +
      "river bank while the sun sets slowly behind the tall green hills"
    val near = boiler.replace("sun sets", "moon rises")
    val rows =
      (1L to 30L).map(i => (i, boiler)) :+ (31L, near) :+
        (32L, near.toUpperCase) :+ (33L, "completely different content " +
        "about spark aggregation plans and shuffle partitioning")
    val docs = rows.toDF("doc_id", "text")
    val rawCand = Dedup.lshCandidates(
      Dedup.minhashSignatures(Dedup.shingles(docs, "text", "doc_id", 2),
        "doc_id", 128), "doc_id", 128, 32).count()
    assert(rawCand >= 30L * 29 / 2, s"expected the m^2/2 cluster " +
      s"blowup in the raw candidate tier, got $rawCand")
    val collapsed = Dedup.nearDuplicatesCollapsed(docs, "text", "doc_id",
      2, 128, 32, 0.5)
    val out = collapsed.collect()
    val pairs = out.map(r => (r.getAs[Long]("doc_a"),
      r.getAs[Long]("doc_b"), r.getAs[Long]("size_a"),
      r.getAs[Long]("size_b"))).toSet
    // classes: boiler -> rep 1 (size 30); near -> rep 31 (size 2: the
    // uppercase copy normalizes to the same content); doc 33 alone.
    // the single cluster-level pair stands for 30 x 2 doc pairs
    assert(pairs == Set((1L, 31L, 30L, 2L)),
      s"got $pairs")
    // and the collapsed candidate tier is cluster-count sized
    val reps = Seq((1L, boiler), (31L, near), (33L, rows.last._2))
      .toDF("doc_id", "text")
    val collCand = Dedup.lshCandidates(
      Dedup.minhashSignatures(Dedup.shingles(reps, "text", "doc_id", 2),
        "doc_id", 128), "doc_id", 128, 32).count()
    assert(collCand <= 3)
    // crossEngine mode (the registered/oracle path): same answer
    val ce = Dedup.nearDuplicatesCollapsed(docs, "text", "doc_id",
      2, 128, 32, 0.5, crossEngine = true)
      .collect().map(r => (r.getAs[Long]("doc_a"),
        r.getAs[Long]("doc_b"), r.getAs[Long]("size_a"),
        r.getAs[Long]("size_b"))).toSet
    assert(ce == pairs)
  }

  test("adaptive band-key widening: hot buckets split on the next band's " +
      "key, chains of hot buckets stay dropped, cool buckets keep exact " +
      "semantics (r13 verdict #1)") {
    import spark.implicits._
    // crafted SIGNATURES (k=8, bands=4, r=2, cap=4) with an equality
    // pattern where the planted pair (1,2) collides ONLY inside hot
    // buckets: band0 bucket of 10 (hot), band1 bucket of 7 (hot), band2
    // bucket of 7 (hot) — the pre-widening code dropped all three and
    // returned NOTHING for it. Under widening, the band0 bucket splits
    // on the band1 key and the band1 bucket on the band2 key, both
    // isolating {1,2}; group B (31..40) shares band0 AND band1, so its
    // widened sub-bucket is still 10 > cap and stays dropped; (51,52)
    // share one cool bucket and come through the plain path.
    def sig(b0: Long, b1: Long, b2: Long, b3: Long): Array[Long] =
      Array(b0, b0, b1, b1, b2, b2, b3, b3)
    val rows: Seq[(Long, Array[Long])] =
      (1L to 10L).map { d =>
        val b1 = if (d <= 2) 201L else 210L + d
        val b2 = if (d <= 2) 301L else 310L + d
        (d, sig(100L, b1, b2, 400L + d))
      } ++
      (11L to 15L).map(d => (d, sig(110L + d, 201L, 310L + d, 400L + d))) ++
      (16L to 20L).map(d => (d, sig(120L + d, 220L + d, 301L, 400L + d))) ++
      (31L to 40L).map(d => (d, sig(500L, 600L, 320L + d, 400L + d))) ++
      Seq((51L, sig(700L, 230L, 330L, 451L)),
        (52L, sig(700L, 231L, 331L, 452L)))
    val sigs = rows.toDF("doc_id", "sig")
    val got = Dedup.lshCandidates(sigs, "doc_id", k = 8, bands = 4,
        maxBucket = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (51L, 52L)), s"got $got")
    // crossEngine keying (string band keys, the oracle-mirrored path)
    // must produce the identical set
    val ce = Dedup.lshCandidates(sigs, "doc_id", k = 8, bands = 4,
        crossEngine = true, maxBucket = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ce == got)
  }

  test("universal-hash minhash coefficients stay inside the overflow-safe " +
    "envelope") {
    // slot arithmetic is (a*h + b) with h < 2^32: a < P and b < P keep
    // the product under 2^63, so the BIGINT math is exact in any engine
    val (as, bs) = Dedup.minhashCoeffs(128)
    assert(as.size == 128 && bs.size == 128)
    assert(as.forall(a => a >= 1L && a < Dedup.MinhashP))
    assert(bs.forall(b => b >= 0L && b < Dedup.MinhashP))
    // deterministic across invocations (they are plan/oracle literals)
    assert(Dedup.minhashCoeffs(128) == ((as, bs)))
    // the 8-hex-char md5 base is < 2^32
    val h = Seq("a", "xyzzy", "", "the quick brown fox").toDF("s")
      .select(org.apache.spark.sql.functions.conv(
        org.apache.spark.sql.functions.substring(
          org.apache.spark.sql.functions.md5(col("s")), 1, 8), 16, 10)
        .cast("long").as("h"))
      .collect().map(_.getLong(0))
    assert(h.forall(x => x >= 0L && x < (1L << 32)))
  }

  test("aggregator-based minhash equals the expression-based signatures") {
    val sh = Dedup.shingles(planted, "text", "doc_id", 2)
    val exprSigs = Dedup.minhashSignatures(sh, "doc_id", 32).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val aggSigs = Dedup.minhashSignaturesAgg(sh, "doc_id", 32).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(aggSigs == exprSigs)
  }

  test("simhash: near-dups land within small hamming distance") {
    val sh = Dedup.simhash(planted, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(4L) && sh(1L) == sh(5L)) // same words → same hash
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(1L), sh(2L)) < ham(sh(1L), sh(3L)))
    assert(ham(sh(1L), sh(2L)) <= 16)
    // the column-level hamming helper agrees with the JVM computation
    val hamDf = Seq((sh(1L), sh(2L))).toDF("a", "b")
      .select(Dedup.hamming(col("a"), col("b")).as("h"))
      .collect().head.getInt(0)
    assert(hamDf == ham(sh(1L), sh(2L)))
  }

  test("fingerprints: shared passages share fingerprints") {
    val fp = Dedup.fingerprints(planted, "text", "doc_id", n = 3, window = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(fp(1L) == fp(4L)) // identical normalized-ish text
    assert((fp(1L) & fp(2L)).nonEmpty)   // shared prefix passage
    assert((fp(1L) & fp(3L)).isEmpty)    // nothing shared
  }

  test("language id votes on distinct stopword evidence") {
    val df = Seq(
      (1L, "the cat sat on the mat with a hat", "en"),
      (2L, "el gato en la casa de los perros", "es"),
      (3L, "der hund ist von den katzen und eine maus", "de"),
      (4L, "zzz qqq www", "xx"),
    ).toDF("doc_id", "text", "lang")
    val conf = TextOps.langIdConfusion(df, "text", "lang").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(conf == Set(("en", "en"), ("es", "es"), ("de", "de"),
      ("xx", "und")))
  }

  test("quality score favors long, varied, stopword-bearing text") {
    val df = Seq(
      (1L, "the cat and the dog walked to a house in the field of green " +
        "grass with many other animals on a sunny day for fun"),
      (2L, "spam spam spam spam spam spam spam spam"),
    ).toDF("doc_id", "text")
    val out = TextOps.qualityScores(df, "text", "doc_id", 10).collect()
    assert(out.head.getLong(0) == 1L)
    val scores = out.map(r => r.getLong(0) -> r.getAs[Double]("score")).toMap
    assert(scores(1L) > scores(2L))
    val dup = out.find(_.getLong(0) == 2L).get.getAs[Double]("dup_ratio")
    assert(dup == 0.875) // 1 distinct of 8 words
  }

  test("token counting: regex tokens split punctuation and digits") {
    val df = Seq((1L, "hello world42 x!", "s1")).toDF("doc_id", "text",
      "source")
    val out = TextOps.tokenCounts(df, "text", "source").collect().head
    assert(out.getAs[Long]("ws_tokens") == 3)
    // hello | world | 42 | x | !
    assert(out.getAs[Long]("regex_tokens") == 5)
  }

  test("dup clusters: chained pairs collapse into one component") {
    // 1-2, 2-3, 3-4 chain (diameter 3) + disjoint 10-11
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("id_a", "id_b")
    val out = graft.text.Dedup.dupClusters(pairs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id"))
      .toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("curation funnel drops docs at the intended stages") {
    // ids < 10 are the "benchmark"; corpus docs exercise each filter:
    // 20 = healthy; 21 = no stopwords (lang drop); 22 = pure repetition
    // (quality drop); 23 = exact dup of 20 modulo whitespace; 24 =
    // near-dup of 20; 25 = copy of bench doc 1 (contamination drop).
    val bench = "the quick brown fox jumps over the lazy dog and then " +
      "the fox runs away to the forest in the morning light again"
    val healthy = "the cat sat on a mat and the dog lay on the rug " +
      "while a bird flew over the quiet house in the warm morning sun " +
      "and the children played in the garden with a red ball for hours"
    val docs = Seq(
      (1L, bench),
      (20L, healthy),
      (21L, "zzz qqq www rrr ttt yyy uuu iii ooo ppp aaa sss ddd fff"),
      (22L, "the the the the the the the the"),
      (23L, "  " + healthy.replace(" cat ", "  cat ")),
      (24L, healthy.replace("red ball", "blue ball")),
      (25L, bench + " the end"),
    ).toDF("doc_id", "text")
    val out = graft.text.Curation
      .curationFunnel(docs, benchSplit = 10L, contamN = 4)
      .collect().map(r => r.getAs[String]("stage_name") ->
        r.getAs[Long]("n_docs")).toMap
    assert(out("corpus") == 6)
    assert(out("lang_id") == 5)        // 21 dropped (no stopwords)
    assert(out("quality") == 4)        // 22 dropped (too short)
    assert(out("exact_dedup") == 3)    // 23 dropped (dup of 20)
    assert(out("neardup_dedup") == 2)  // 24 dropped (near-dup of 20)
    assert(out("decontaminated") == 1) // 25 dropped (bench overlap)
  }

  test("deterministic split is stable and respects bucket boundaries") {
    val ids = (0L until 200L).toDF("doc_id")
    val a = graft.text.Curation.deterministicSplit(ids).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("bucket"),
        r.getAs[String]("split")))
    val b = graft.text.Curation
      .deterministicSplit(ids.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("bucket"),
        r.getAs[String]("split")))
    assert(a.sameElements(b)) // partitioning-independent
    assert(a.forall { case (_, bk, sp) =>
      bk >= 0 && bk < 100 &&
        sp == (if (bk < 80) "train" else if (bk < 90) "val" else "test")
    })
    assert(a.map(_._3).distinct.sorted.sameElements(
      Array("test", "train", "val")))
  }

  test("semantic dedup confirms cosine candidates with lexical jaccard") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"), // lexical twin
      (3L, "completely different words entirely here now"), // paraphrase-ish
    ).toDF("doc_id", "text")
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f)),  // cosine-close to 1
      (3L, Array(0.8f, 0.05f)), // cosine-close to 1 but different text
    ).toDF("vec_id", "embedding")
    val out = graft.text.Curation.semanticDedupPairs(docs, vecs)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getAs[Double]("jaccard"), r.getAs[Boolean]("agree"))).toMap
    assert(out((1L, 2L))._2)          // both signals agree → safe drop
    assert(!out((1L, 3L))._2)         // cosine-only → paraphrase candidate
    assert(out((1L, 2L))._1 > 0.5 && out((1L, 3L))._1 == 0.0)
  }

  test("ANN semantic dedup recalls >= 0.9 of the exact tier's pairs") {
    val docs = Tables.load(spark, SparkTestSession.sf, "documents")
    val vecs = Tables.load(spark, SparkTestSession.sf, "embeddings")
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("id_a", "id_b", "agree").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Boolean]("agree"))
      .toMap
    val exact = pairs(graft.text.Curation.semanticDedupPairs(docs, vecs))
    val ann = pairs(graft.text.Curation.semanticDedupPairsAnn(docs, vecs))
    val recall =
      (exact.keySet & ann.keySet).size.toDouble / exact.keySet.size
    assert(recall >= 0.9, s"semantic pair recall = $recall")
    // verification is shared, so every surviving pair carries the SAME
    // jaccard/agree verdict as the exact tier — no false positives
    assert(ann.forall { case (k, v) => exact.get(k).contains(v) })
  }

  test("production-regime ANN semantic dedup (cos >= 0.9, capped) fires " +
    "on planted duplicates and stays empty on uniform background") {
    // the registered semantic_dedup_ann_prod query is expected-empty on
    // the harness corpus (uniform embeddings have no cos >= 0.8 pairs);
    // this test is the proof that the empty answer is the detector
    // working: the SAME config (tau=0.9, 8x8 banding, hot-bucket cap)
    // recalls every planted high-cos duplicate whose text is also a
    // near-copy, and flags the cosine-only pair as agree=false
    val rnd = new java.util.Random(23L)
    def vec() = Array.fill(32)(rnd.nextGaussian().toFloat)
    val bases = Seq.fill(10)(vec())
    val dupVecs = bases.zipWithIndex.flatMap { case (v, i) =>
      Seq((i.toLong, v),
        ((100 + i).toLong,
          v.map(x => x + 0.01f * rnd.nextGaussian().toFloat)))
    }
    val bgVecs = Seq.tabulate(200)(i => ((300 + i).toLong, vec()))
    val words = Array("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    def text(seedIdx: Int, twist: String) =
      Seq.tabulate(8)(j => words((seedIdx * 7 + j * 3) % 10))
        .mkString(" ") + " " + twist
    val docRows =
      (0 until 10).flatMap { i =>
        Seq((i.toLong, text(i, "one")), ((100 + i).toLong, text(i, "two")))
      } ++ (0 until 200).map(i => ((300 + i).toLong, text(i % 50, s"bg$i")))
    val docs = docRows.toDF("doc_id", "text")
    val vecs = (dupVecs ++ bgVecs).toDF("vec_id", "embedding")
    def run(v: org.apache.spark.sql.DataFrame) =
      graft.text.Curation.semanticDedupPairsAnn(docs, v,
        minCos = 0.9, shingleN = 2, minJaccard = 0.4, dim = 32,
        bands = 8, planesPerBand = 8, maxBucket = 64)
    val out = run(vecs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Boolean]("agree"))
      .toMap
    (0 until 10).foreach { i =>
      assert(out.get((i.toLong, (100 + i).toLong)).contains(true),
        s"planted dup pair $i missing or not agreed")
    }
    // uniform background alone: no cos >= 0.9 pair exists, and the
    // pipeline must say so (the registered query's expected-empty shape)
    assert(run(bgVecs.toDF("vec_id", "embedding")).isEmpty)
  }

  test("importance weights upweight documents resembling the target slice") {
    import org.apache.spark.sql.functions.col
    // target docs speak one vocabulary, the rest another; a fresh doc in
    // the target vocabulary must get a HIGHER log-weight than one in the
    // source-only vocabulary
    val docs = Seq(
      (1L, "alpha beta alpha beta alpha beta", true),
      (2L, "alpha beta alpha beta gamma", true),
      (3L, "delta epsilon delta epsilon delta", false),
      (4L, "delta epsilon zeta delta epsilon", false),
      (5L, "alpha beta alpha", false),    // target-like, not in target
      (6L, "delta epsilon delta", false), // source-like
    ).toDF("doc_id", "text", "is_t")
    val out = graft.text.Curation
      .importanceWeights(docs, col("is_t"), buckets = 256)
      .collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("log_weight")).toMap
    // log-weights are RELATIVE (add-one smoothing over the bucket space
    // shifts the baseline when the target slice is small) — the DSIR
    // property is the ordering: target-vocabulary docs above
    // source-only-vocabulary docs, by a wide margin per feature
    assert(out(5L) > out(6L) + 1.0,
      s"target-like ${out(5L)} vs source-only ${out(6L)}")
    assert(Seq(1L, 2L, 5L).map(out).min >
      Seq(3L, 4L, 6L).map(out).max)
  }

  test("mixture plan budgets every domain to the smallest one") {
    val docs = Seq(
      (1L, "a b c d", "web"),   // 4 tokens
      (2L, "a b c d", "web"),   // web: 8 total
      (3L, "a b", "books"),     // books: 2 total
      (4L, "a b c d e f", "code"), // code: 6 total
    ).toDF("doc_id", "text", "source")
    val out = graft.text.Curation.mixturePlan(docs).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(out("books").getAs[Long]("budget_tokens") == 2)
    assert(out("books").getAs[Double]("keep_rate") == 1.0)
    assert(out("web").getAs[Double]("keep_rate") == 0.25)   // 2/8
    assert(out("code").getAs[Double]("keep_rate") == 0.3333)
    assert(out("web").getAs[Double]("cur_share") == 0.5)    // 8/16
    assert(out("web").getAs[Double]("target_share") == 0.3333)
  }

  test("mixture sample hits each domain's keep-rate and is " +
    "deterministic") {
    // web has 4x the books tokens -> keep_bps 2500; books keeps all
    val docs = (1L to 400L).map(i => (i, "a b c d", "web")) ++
      (401L to 500L).map(i => (i, "a b c d", "books"))
    val df = docs.toDF("doc_id", "text", "source")
    val out = graft.text.Curation.mixtureSample(df)
    val byDomain = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byDomain("books") == 100) // keep_rate 1.0 keeps everything
    // web: stable md5 draw at 2500 bps => ~25%, binomial 3-sigma bounds
    assert(byDomain("web") > 60 && byDomain("web") < 140,
      s"web kept ${byDomain("web")}")
    // determinism: same input, same survivors (hash draw, not random)
    val again = graft.text.Curation.mixtureSample(df)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == out.select("doc_id").collect().map(_.getLong(0)).toSet)
    // survivors respect the per-row threshold join
    assert(out.filter(col("bucket") >= col("keep_bps")).count() == 0)
  }

  /** Plain-Scala reference BPE over a word multiset: pair counts weighted
    * by word frequency, argmax with (count desc, a asc, b asc) ties,
    * greedy left-to-right non-overlapping fuse.
    */
  private def refBpe(ws: Seq[String],
                     nMerges: Int): Seq[(String, String, String, Long)] = {
    var vocab: Map[Vector[String], Long] =
      ws.groupBy(identity).map { case (w, g) =>
        w.map(_.toString).toVector -> g.size.toLong
      }
    val out = Seq.newBuilder[(String, String, String, Long)]
    for (_ <- 1 to nMerges) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
        .withDefaultValue(0L)
      for ((syms, c) <- vocab; i <- 0 until syms.size - 1)
        counts((syms(i), syms(i + 1))) += c
      if (counts.nonEmpty) {
        val ((a, b), n) = counts.toSeq
          .minBy { case ((x, y), m) => (-m, x, y) }
        out += ((a, b, a + b, n))
        vocab = vocab.map { case (syms, c) =>
          val buf = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              buf += a + b; i += 2
            } else { buf += syms(i); i += 1 }
          }
          buf.result() -> c
        }
      }
    }
    out.result()
  }

  test("BPE merge learning matches the plain-Scala reference") {
    val docs = Seq(
      (1L, "low lower lowest low low"),
      (2L, "newer newest new low widest"),
      (3L, "wide wider widest new newer"),
    ).toDF("doc_id", "text")
    val got = TextOps.bpeMerges(docs, "text", nMerges = 8).collect()
      .map(r => (r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4)))
    val want = refBpe(
      docs.collect().flatMap(_.getString(1).split("\\s+")).toSeq, 8)
    assert(got.toSeq == want)
    // the first learned merge is exactly the corpus-wide argmax pair
    val top = TextOps.bpePairStats(docs, "text", 1).collect()(0)
    assert(want.head._3 == top.getString(0) && want.head._4 == top.getLong(1))
  }

  test("scalable BPE learner matches the sequential Spark loop and the " +
    "plain-Scala reference") {
    val docs = Seq(
      (1L, "low lower lowest low low"),
      (2L, "newer newest new low widest"),
      (3L, "wide wider widest new newer"),
    ).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    val slow = rows(TextOps.bpeMerges(docs, "text", nMerges = 8))
    val fast = rows(TextOps.bpeMergesScalable(docs, "text", nMerges = 8))
    assert(fast == slow)
    val want = refBpe(
      docs.collect().flatMap(_.getString(1).split("\\s+")).toSeq, 8)
    assert(fast.map(m => (m._2, m._3, m._4, m._5)) == want)
    // and on the real harness table, deep into the merge sequence (the
    // regime the sequential Spark loop cannot reach economically)
    val real = Tables.load(spark, SparkTestSession.sf, "documents")
    val deep = rows(TextOps.bpeMergesScalable(real, "text", nMerges = 64))
    val wantDeep = refBpe(real.select("text").collect()
      .flatMap(_.getString(0).trim.split("\\s+")).filter(_.nonEmpty)
      .toSeq, 64)
    assert(deep.map(m => (m._2, m._3, m._4, m._5)) == wantDeep)
  }

  test("scalable BPE learner sustains 256+ merges on a rich vocabulary") {
    // the harness documents table holds only 31 distinct words, which
    // BPE exhausts after 89 merges — so the deep-merge regime is proven
    // on a synthetic corpus with enough lexical material. 400 distinct
    // seeded words, 256 merges, pinned to the plain-Scala reference.
    val rnd = new scala.util.Random(7L)
    val wordsPool = Seq.fill(400)(
      (3 + rnd.nextInt(8)).to(1, -1).map(_ =>
        ('a' + rnd.nextInt(26)).toChar).mkString)
    val docs = wordsPool.grouped(20).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
      .toSeq.toDF("doc_id", "text")
    val got = TextOps.bpeMergesScalable(docs, "text", nMerges = 256)
      .collect().map(r => (r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4))).toSeq
    assert(got.size == 256)
    val want = refBpe(wordsPool, 256)
    assert(got == want)
  }

  test("scalable BPE learner caps the vocabulary deterministically") {
    // maxVocab = 1 keeps only the most frequent word ("aa bb" ties break
    // by word asc → "aa"), so the learned merge comes from "aa" alone
    val docs = Seq((1L, "aa bb"), (2L, "aa bb"), (3L, "aa"))
      .toDF("doc_id", "text")
    val got = TextOps.bpeMergesScalable(docs, "text", nMerges = 1,
        maxVocab = 1)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(4)))
    assert(got.toSeq == Seq(("a", "a", 3L)))
  }

  test("codec-style BPE encoder matches the composed-fold encoder") {
    val docs = Seq(
      (1L, "low lower lowest low low"),
      (2L, "newer newest new low widest"),
      (3L, "   "), // no words → no row, same as the fold encoder
    ).toDF("doc_id", "text")
    val merges = TextOps.bpeMerges(docs, "text", nMerges = 6).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(rows(TextOps.bpeEncodeScalable(docs, "text", "doc_id", merges))
      == rows(TextOps.bpeEncode(docs, "text", "doc_id", merges)))
    // and on the harness table with a deep merge table
    val real = Tables.load(spark, SparkTestSession.sf, "documents")
      .limit(50)
    val deepM = TextOps.bpeMergesScalable(real, "text", nMerges = 64)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(rows(TextOps.bpeEncodeScalable(real, "text", "doc_id", deepM))
      == rows(TextOps.bpeEncode(real, "text", "doc_id", deepM)))
  }

  test("BPE encoding matches reference application of the learned merges") {
    val docs = Seq(
      (1L, "low lower lowest low low"),
      (2L, "newer newest new low widest"),
    ).toDF("doc_id", "text")
    val corpus = docs.collect().map(r => r.getLong(0) -> r.getString(1))
    val merges = refBpe(corpus.flatMap(_._2.split("\\s+")).toSeq, 6)
      .map(m => (m._1, m._2))
    // reference encoder: chars, then each merge greedily in rank order
    def encode(w: String): Int =
      merges.foldLeft(w.map(_.toString).toVector) { case (syms, (a, b)) =>
        val buf = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            buf += a + b; i += 2
          } else { buf += syms(i); i += 1 }
        }
        buf.result()
      }.size
    val want = corpus.map { case (id, t) =>
      val ws = t.split("\\s+")
      id -> ((ws.map(_.length.toLong).sum, ws.map(encode(_).toLong).sum))
    }.toMap
    val got = TextOps.bpeEncode(docs, "text", "doc_id", merges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == want)
  }

  test("length-band filter cuts exactly the percentile tails") {
    // 1..20 tokens; p[0.05, 0.95] of 1..20 interpolates to [1.95, 19.05]
    val docs = (1L to 20L)
      .map(i => (i, Seq.fill(i.toInt)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val out = graft.text.Curation.lengthBandFilter(docs).collect()
    assert(out.map(_.getLong(0)).toSet == (2L to 19L).toSet)
    assert(out.head.getDouble(2) == 1.95 && out.head.getDouble(3) == 19.05)
  }

  test("filter policy attributes each drop to the failing signal") {
    val good = "the data table holds a value for the column and a row " +
      "with the key and the index for the scan"
    val looping = ("buy now " * 12).trim // one bigram dominates
    val docs = Seq(
      (1L, good),
      (2L, looping),
      (3L, "the of and"), // too short: below the p05 length bound
    ).toDF("doc_id", "text")
    val out = graft.text.Curation.filterPolicy(docs,
        minScore = 0.0, maxTopBigram = 0.5, minSurprisal = 0.0)
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.getBoolean(2), r.getBoolean(3),
          r.getBoolean(4), r.getBoolean(5)))).toMap
    // doc 2 fails ONLY repetition ("buy now" dominates its bigrams);
    // doc 3 fails ONLY length (3 toks < the p05 bound of 3-21-24)
    assert(out(1L) == ((true, true, true, true, true)))
    assert(out(2L)._2 == false && out(2L)._1 && out(2L)._3)
    assert(out(3L)._4 == false && out(3L)._5 == false)
  }

  test("whitespace-only documents contribute no BPE symbols or pairs") {
    // split("", '\s+') yields [""], and sequence(1, 0) DESCENDS — without
    // the length guard "" would decompose into two phantom "" symbols
    val docs = Seq((1L, "ab ab"), (2L, "   ")).toDF("doc_id", "text")
    val merges = TextOps.bpeMerges(docs, "text", nMerges = 2).collect()
    assert(merges.map(r => (r.getString(1), r.getString(2))).toSeq ==
      refBpe(Seq("ab", "ab"), 2).map(m => (m._1, m._2)))
    val enc = TextOps.bpeEncode(docs, "text", "doc_id",
      merges.map(r => (r.getString(1), r.getString(2))).toSeq)
    // the empty doc has no encodable words and produces no row
    assert(enc.collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("fusePair is greedy left-to-right and non-overlapping") {
    val df = Seq(Tuple1(Seq("a", "a", "a"))).toDF("syms")
    val fused = df.select(TextOps.fusePair(col("syms"), "a", "a"))
      .collect()(0).getSeq[String](0)
    assert(fused == Seq("aa", "a"))
  }

  test("incremental dedup classifies exact, near, and new batch docs") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six seven"),
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "  Alpha beta GAMMA   delta epsilon zeta "), // exact after norm
      (11L, "one two three four five six nine"),         // near (J = 5/7)
      (12L, "totally fresh content nothing shared here"),// new
    ).toDF("doc_id", "text")
    val out = Dedup.incremental(corpus, batch, "text", "doc_id",
        n = 2, minJaccard = 0.4).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(10L -> "exact_dup", 11L -> "near_dup", 12L -> "new"))
  }

  test("split leakage measures eval spans that occur in the train split") {
    import graft.text.Curation
    // pick ids on each side of the hash split so the fixture is stable
    val ids = (1L to 50L)
    val splits = Curation
      .deterministicSplit(ids.toDF("doc_id")).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val trainId = ids.find(splits(_) == "train").get
    val evalIds = ids.filter(splits(_) != "train").take(2)
    val docs = Seq(
      (trainId, "one two three four five"),
      (evalIds(0), "one two three four nine"), // shares 2 of its 3 spans
      (evalIds(1), "p q r s t"),               // shares nothing
    ).toDF("doc_id", "text")
    val out = Curation.splitLeakage(docs, n = 3).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out(evalIds(0)) == ((3L, 2L, 0.6667)))
    assert(out(evalIds(1)) == ((3L, 0L, 0.0)))
    assert(!out.contains(trainId)) // train docs are the index, not rows
  }

  test("span-dup counts occurrences of repeated windows, " +
    "including same-doc repeats") {
    val docs = Seq(
      (1L, "a b c d e"),     // windows: "a b c", "b c d", "c d e"
      (2L, "a b c x y"),     // shares "a b c" with doc 1
      (3L, "p q p q p q p"), // self-repeating: "p q p" x3, "q p q" x2
    ).toDF("doc_id", "text")
    val out = Dedup.spanDupStats(docs, "text", "doc_id", n = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((3L, 1L, 0.3333))) // only "a b c" is shared
    assert(out(2L) == ((3L, 1L, 0.3333)))
    assert(out(3L) == ((5L, 5L, 1.0)))    // every window repeats in-doc
  }

  test("unigram surprisal scores rare-word documents above boilerplate") {
    val docs = Seq(
      (1L, "the the the the"),             // most common token only
      (2L, "the the zyx qwv"),             // half rare singletons
      (3L, "zyx2 qwv2 kjh2 wsd2"),         // all rare singletons
    ).toDF("doc_id", "text")
    val out = TextOps.unigramSurprisal(docs, "text", "doc_id").collect()
      .map(r => r.getLong(0) ->
        (r.getAs[Long]("n_toks"), r.getAs[Double]("avg_surprisal"))).toMap
    assert(out(1L)._1 == 4)
    // p(the) = 6/12 → −ln(0.5); singletons p = 1/12 → −ln(1/12)
    assert(math.abs(out(1L)._2 - 0.6931) < 1e-9)
    assert(out(1L)._2 < out(2L)._2 && out(2L)._2 < out(3L)._2)
    assert(math.abs(out(3L)._2 - 2.4849) < 1e-9)
  }

  test("tf-idf ranks distinctive terms above common ones") {
    val docs = Seq(
      (1L, "apple apple banana"),
      (2L, "banana cherry"),
      (3L, "cherry cherry cherry"),
    ).toDF("doc_id", "text")
    val out = TextOps.tfidfTopTerms(docs, "text", "doc_id", 1).collect()
      .map(r => r.getLong(0) -> (r.getAs[String]("word"),
        r.getAs[Double]("tfidf"))).toMap
    assert(out(1L)._1 == "apple") // rare + repeated beats common banana
    assert(out(3L)._1 == "cherry")
    // doc 1: tf=2, df=1, N=3 → 2*(ln(4/2)+1) rounded to 4dp
    assert(math.abs(out(1L)._2 - 3.3863) < 1e-9)
  }

  test("chunking emits overlapping windows covering every word") {
    val text = (1 to 10).map(i => s"w$i").mkString(" ")
    val out = graft.text.Curation
      .chunkDocuments(Seq((1L, text)).toDF("doc_id", "text"),
        chunkSize = 4, overlap = 1) // step 3 → starts 0,3,6,9
      .collect()
      .map(r => (r.getAs[Long]("chunk_id"), r.getAs[Long]("start"),
        r.getAs[Long]("n_words"), r.getAs[String]("chunk")))
    assert(out.length == 4)
    assert(out(0) == (0L, 0L, 4L, "w1 w2 w3 w4"))
    assert(out(1) == (1L, 3L, 4L, "w4 w5 w6 w7")) // 1-word overlap
    assert(out(3) == (3L, 9L, 1L, "w10"))         // short tail chunk
  }

  test("sequence packing fills bins in stream order without splitting docs") {
    // source A: 300+300+100 tokens with budget 512 → offs 0/300/600 →
    // bins 0/0/1 (doc 2 overflows bin 0; doc 3 starts past the budget).
    val docs = Seq(
      ("A", 1L, Seq.fill(300)("w").mkString(" ")),
      ("A", 2L, Seq.fill(300)("x").mkString(" ")),
      ("A", 3L, Seq.fill(100)("y").mkString(" ")),
      ("B", 4L, Seq.fill(600)("z").mkString(" ")),
      ("B", 5L, Seq.fill(10)("q").mkString(" ")),
    ).toDF("source", "doc_id", "text")
    val out = graft.text.Curation.packSequences(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("off"), r.getAs[Long]("bin"))).toMap
    assert(out(1L) == (0L, 0L) && out(2L) == (300L, 0L) &&
      out(3L) == (600L, 1L))
    assert(out(4L) == (0L, 0L) && out(5L) == (600L, 1L))
  }

  test("stratified sample is hash-deterministic and respects strata") {
    val dir = "/root/testdata/sf0.001"
    val a = graft.queries.TextQueries.sampleStratified(spark, dir).collect()
    val b = graft.queries.TextQueries.sampleStratified(spark, dir).collect()
    assert(a.sameElements(b)) // same md5 draw → same sample
    val full = graft.Tables.load(spark, dir, "documents")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = a.groupBy(_.getAs[String]("lang")).view.mapValues(_.length)
    // en sampled at 0.2, rest at 0.5 — loose binomial bounds
    got.toMap.foreach { case (lang, n) =>
      val f = if (lang == "en") 0.2 else 0.5
      assert(n <= full(lang), s"$lang oversampled")
      assert(n >= 0 && n <= math.ceil(full(lang) * f * 3).toLong + 2,
        s"$lang count $n vs ${full(lang)} at $f")
    }
  }

  test("PII redaction scrubs emails, SSNs, phones, and IPs") {
    val df = Seq(
      (1L, "mail bob.smith+x@corp.example.org asap"),
      (2L, "ssn 123-45-6789 on file"),
      (3L, "call 555-867-5309 or 25-989-741-2988"),
      (4L, "host 192.168.10.254 is down"),
      (5L, "nothing sensitive here 12345"),
      // 3-digit middle octets: the phone rule would clip this to
      // "<PHONE>.110" if it ran before the IP rule
      (6L, "node 172.217.164.110 unreachable")).toDF("id", "text")
    val out = df.select(col("id"),
        graft.text.TextOps.redactPii(col("text")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "mail <EMAIL> asap")
    assert(out(2L) == "ssn <SSN> on file")
    assert(out(3L) == "call <PHONE> or <PHONE>")
    assert(out(4L) == "host <IP> is down")
    assert(out(5L) == "nothing sensitive here 12345")
    assert(out(6L) == "node <IP> unreachable")
  }

  test("contamination measures benchmark shingle overlap per document") {
    val bench = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val corpus = Seq(
      (10L, "alpha beta gamma epsilon"), // 2 of 3 bigrams in benchmark
      (11L, "zeta eta theta iota"))      // disjoint
      .toDF("doc_id", "text")
    val out = graft.text.TextOps
      .contamination(corpus, bench, "text", "doc_id", 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_shingles"), r.getAs[Long]("n_contaminated"),
          r.getAs[Double]("contamination"))).toMap
    assert(out(10L) == ((3L, 2L, 0.6667)))
    assert(out(11L) == ((3L, 0L, 0.0)))
  }

  test("block dedup cuts later occurrences and reassembles in order") {
    // 4-word blocks; doc 1 owns block X=«a b c d» first; doc 2 repeats X
    // at block position 1 and AGAIN at position 2 — only doc 1's copy
    // survives; doc 3 is untouched; doc 4's tail block is shorter than n
    // and distinct, so it survives.
    val df = Seq(
      (1L, "a b c d p q r s"),
      (2L, "m n o p a b c d a b c d"),
      (3L, "w x y z"),
      (4L, "e f g h ii jj")).toDF("doc_id", "text")
    val out = Dedup.blockDedupCut(df, "text", "doc_id", 4)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_blocks"), r.getAs[Long]("n_removed"),
          r.getAs[String]("text_deduped"))).toMap
    assert(out(1L) == ((2L, 0L, "a b c d p q r s")))
    assert(out(2L) == ((3L, 2L, "m n o p")))
    assert(out(3L) == ((1L, 0L, "w x y z")))
    assert(out(4L) == ((2L, 0L, "e f g h ii jj")))
  }

  test("block dedup: first occurrence is global (doc_id, pos) order") {
    // the duplicated block appears at pos 1 of doc 10 and pos 0 of doc
    // 11 — doc 10 wins because doc order dominates position order
    val df = Seq(
      (10L, "h1 h2 h3 h4 dup1 dup2 dup3 dup4"),
      (11L, "dup1 dup2 dup3 dup4 t1 t2 t3 t4")).toDF("doc_id", "text")
    val out = Dedup.blockDedupCut(df, "text", "doc_id", 4)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text_deduped")).toMap
    assert(out(10L) == "h1 h2 h3 h4 dup1 dup2 dup3 dup4")
    assert(out(11L) == "t1 t2 t3 t4")
  }

  test("span dedup cuts OVERLAPPING duplicates that straddle the block " +
      "grid, extends to the maximal span, and keeps the first copy") {
    // n = 4. Doc 2 embeds doc 1's 6-word run «d1..d6» at word offset 3 —
    // misaligned with every 4-word block boundary, so blockDedupCut
    // removes NOTHING (the documented gap); the span cut must remove
    // exactly the 6-word straddling copy: windows [3..5] of doc 2 are
    // duplicated (non-first), covering positions 3..8 — the MAXIMAL
    // span, though no single window spans all 6 words.
    val df = Seq(
      (1L, "d1 d2 d3 d4 d5 d6 x1 x2"),
      (2L, "m1 m2 m3 d1 d2 d3 d4 d5 d6 t1 t2 t3"),
      (3L, "u1 u2 u3 u4 u5 u6 u7 u8")).toDF("doc_id", "text")
    val block = Dedup.blockDedupCut(df, "text", "doc_id", 4)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("n_removed")).toMap
    assert(block(2L) == 0L, "fixture must straddle the block grid")
    val out = Dedup.spanDedupCut(df, "text", "doc_id", 4)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_words"), r.getAs[Long]("n_removed"),
          r.getAs[String]("text_deduped"))).toMap
    assert(out(1L) == ((8L, 0L, "d1 d2 d3 d4 d5 d6 x1 x2")),
      "global-first copy survives whole")
    assert(out(2L) == ((12L, 6L, "m1 m2 m3 t1 t2 t3")),
      "the straddling copy is cut to its maximal extent, nothing more")
    assert(out(3L) == ((8L, 0L, "u1 u2 u3 u4 u5 u6 u7 u8")))
    // within-doc repetition: the second copy of a repeated span goes too
    val rep = Dedup.spanDedupCut(
      Seq((9L, "r1 r2 r3 r4 z1 r1 r2 r3 r4")).toDF("doc_id", "text"),
      "text", "doc_id", 4)
      .collect()(0)
    assert(rep.getAs[Long]("n_removed") == 4L)
    assert(rep.getAs[String]("text_deduped") == "r1 r2 r3 r4 z1")
    // shorter-than-n documents pass through untouched
    val short = Dedup.spanDedupCut(
      Seq((5L, "s1 s2"), (6L, "s1 s2")).toDF("doc_id", "text"),
      "text", "doc_id", 4).collect()
    assert(short.forall(_.getAs[Long]("n_removed") == 0L))
  }

  test("repetition signals saturate on looping boilerplate") {
    val df = Seq(
      (1L, "buy now buy now buy now"),
      (2L, "one two three four five six"),
      (3L, "too short"), // < 3 words: excluded
    ).toDF("doc_id", "text")
    val out = TextOps.repetitionSignals(df, "text", "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("top_bigram_frac"),
          r.getAs[Double]("dup_bigram_frac"),
          r.getAs[Double]("dup_trigram_frac"))).toMap
    // doc 1: bigrams = {buy now ×3, now buy ×2} → top 3/5, dup (5-2)/5;
    // trigrams = {buy now buy ×2, now buy now ×2} → dup (4-2)/4
    assert(out(1L) == ((5L, 0.6, 0.6, 0.5)))
    // doc 2: all n-grams distinct → zero repetition
    assert(out(2L) == ((5L, 0.2, 0.0, 0.0)))
    assert(!out.contains(3L))
  }

  test("BM25 matches the closed form and ranks rare terms higher") {
    val df = Seq(
      (1L, "spark join spark"),
      (2L, "spark alone here"),
      (3L, "unrelated words entirely"),
    ).toDF("doc_id", "text")
    val out = TextOps.bm25(df, "text", "doc_id",
        Seq("spark", "join"), k1 = 1.2, b = 0.75, topK = 10)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_terms"), r.getAs[Double]("bm25")))
    // closed form: N=3, dl=3 for all (avgdl=3 → length factor = 1)
    def idf(dfreq: Int) = math.log((3.0 - dfreq + 0.5) / (dfreq + 0.5) + 1.0)
    def tfp(tf: Int) = tf * 2.2 / (tf + 1.2)
    def r6(x: Double) = BigDecimal(x).setScale(6,
      BigDecimal.RoundingMode.HALF_UP)
    val d1 = (r6(idf(2) * tfp(2)) + r6(idf(1) * tfp(1))).toDouble
    val d2 = idf(2) * tfp(1)
    assert(out.map(_._1).toSeq == Seq(1L, 2L)) // doc 3 matches nothing
    assert(out(0)._2 == 2L && out(1)._2 == 1L)
    assert(math.abs(out(0)._3 - d1) < 5e-5)
    assert(math.abs(out(1)._3 - d2) < 5e-5)
    assert(out(0)._3 > out(1)._3) // extra rare term outranks
  }

  test("adaptive prod ANN cap: 16x background density, floored at the " +
      "sf0.01 calibration") {
    import graft.queries.TextQueries
    // at the sf0.01 corpus size the formula reproduces the historical
    // fixed cap exactly — the driver oracle hash cannot move
    assert(TextQueries.annProdCap(1000) == 64)
    assert(TextQueries.annProdCap(1) == 64) // floor
    // at the sf1 gate size the cap sits ABOVE background density
    // (~n/256) — the round-8 recall gate measured that the fixed 64
    // sat BELOW it (E[bucket] ~ 86 of 22k vectors) and dropped every
    // bucket, prod recall 0.03 even for an under-cap planted cluster
    val n = 22016L
    assert(TextQueries.annProdCap(n) > n / 256)
    assert(TextQueries.annProdCap(n) == 16 * math.ceil(n / 256.0).toInt)
    // monotone in corpus size
    assert(TextQueries.annProdCap(100000) > TextQueries.annProdCap(n))
  }

  test("shard plan: a permutation with dense per-shard positions, exact " +
    "running token sums, repartition-stable, and seed-sensitive") {
    import graft.text.Curation
    val d = graft.Tables.load(spark, SparkTestSession.sf, "documents")
    val plan = Curation.shardPlan(d, nShards = 4, seed = 7L).collect()
    assert(plan.map(_.getLong(0)).distinct.length == d.count()) // 1:1
    plan.groupBy(_.getLong(1)).foreach { case (_, rows) =>
      val byPos = rows.sortBy(_.getLong(2))
      assert(byPos.map(_.getLong(2)).toSeq == (1L to rows.length).toSeq)
      // cum_toks is the running sum of n_toks in position order
      val cums = byPos.scanLeft(0L)(_ + _.getLong(3)).drop(1)
      assert(byPos.map(_.getLong(4)).toSeq == cums.toSeq)
    }
    // deterministic under physical layout changes
    val re = Curation.shardPlan(d.repartition(13), nShards = 4, seed = 7L)
      .collect()
    assert(re.map(_.toSeq).toSeq == plan.map(_.toSeq).toSeq)
    // a different seed is a different global order
    val other = Curation.shardPlan(d, nShards = 4, seed = 8L).collect()
    assert(other.map(_.toSeq).toSeq != plan.map(_.toSeq).toSeq)
  }
}

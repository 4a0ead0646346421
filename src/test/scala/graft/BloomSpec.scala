package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.Bloom

class BloomSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("params: fpp tightening grows the bitset; m is word-aligned") {
    val (m1, k1) = Bloom.params(10000, 0.01)
    val (m3, _) = Bloom.params(10000, 0.001)
    assert(m1 % 64 == 0 && m3 % 64 == 0)
    assert(m3 > m1)
    assert(k1 >= 1)
    // ~9.585 bits/key at 1% — sanity-check the classic formula
    assert(m1 > 9 * 10000L && m1 < 11 * 10000L)
  }

  test("no false negatives; measured fpp near the configured rate") {
    val n = 5000
    val inserted = (0 until n).map(i => s"key_in_$i").toDF("k")
    val bloom = Bloom.build(inserted, "k", n, fpp = 0.01)
    // every inserted key passes — the property the exact-verify design
    // leans on (a false negative would silently drop a true hit)
    val misses = inserted.filter(!bloom.mightContain(col("k"))).count()
    assert(misses == 0L)
    // disjoint probes pass at ~fpp; allow generous slack (binomial noise)
    val probes = (0 until 20000).map(i => s"key_out_$i").toDF("k")
    val fp = probes.filter(bloom.mightContain(col("k"))).count()
    assert(fp < 20000 * 0.04, s"observed fpp ${fp / 20000.0} >> 1%")
    assert(bloom.cardinalityBits > 0)
  }

  test("duplicate inserts are idempotent: same bitset as distinct build") {
    val keys = (0 until 500).map(i => s"dup_${i % 100}").toDF("k")
    val b1 = Bloom.build(keys, "k", 100)
    val b2 = Bloom.build(keys.distinct(), "k", 100)
    assert(b1.words.toSeq == b2.words.toSeq)
    assert(b1.k == b2.k && b1.mBits == b2.mBits)
  }

  test("empty key set: nothing might be contained") {
    val empty = Seq.empty[String].toDF("k")
    val bloom = Bloom.build(empty, "k", 0)
    val probes = (0 until 100).map(i => s"p$i").toDF("k")
    assert(probes.filter(bloom.mightContain(col("k"))).count() == 0L)
  }

  test("streaming decontamination equals the batch operator row for row") {
    val stream = graft.queries.TextQueries
      .contaminationStreamBounded(spark, SparkTestSession.sf)
      .collect().map(_.toSeq).toSeq
    val d = graft.Tables.load(spark, SparkTestSession.sf, "documents")
    val batch = graft.text.TextOps.contamination(
        d.filter(col("doc_id") >= graft.queries.TextQueries.BenchSplit),
        d.filter(col("doc_id") < graft.queries.TextQueries.BenchSplit),
        "text", "doc_id", graft.queries.TextQueries.ShingleN)
      .collect().map(_.toSeq).toSeq
    assert(batch.nonEmpty)
    assert(stream == batch)
  }

  test("bloom contamination is bit-identical to the exact path") {
    // overlap-heavy corpus: benchmark docs share phrases with some
    // corpus docs, others are disjoint; several fpp-bait docs share
    // vocabulary but not 3-gram shingles
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "iota", "kappa", "lambda", "mu")
    def sent(vocab: IndexedSeq[String], seed: Int, len: Int): String =
      (0 until len).map(j => vocab((seed * 7 + j * 5 + j * j) % vocab.size))
        .mkString(" ")
    // corpus docs with i % 3 != 0 draw from a vocabulary disjoint from
    // the benchmark's, so their 3-gram shingles cannot collide with it
    val other = Vector.tabulate(12)(i => s"w$i")
    val docs = ((0L until 20L).map(i => (i, sent(words, i.toInt, 30))) ++
      (50L until 120L).map { i =>
        (i, if (i % 3 == 0) sent(words, (i % 23).toInt, 28)
            else sent(other, i.toInt * 31, 26))
      }).toDF("doc_id", "text")
    val bench = docs.filter(col("doc_id") < 20)
    val corpus = docs.filter(col("doc_id") >= 50)
    val exact = graft.text.TextOps
      .contamination(corpus, bench, "text", "doc_id", 3)
      .collect().toSeq
    val bloomed = graft.text.TextOps
      .contaminationBloom(corpus, bench, "text", "doc_id", 3)
      .collect().toSeq
    assert(exact.nonEmpty)
    assert(exact == bloomed)
    // the fixture must actually exercise both branches
    val contam = exact.map(_.getAs[Long]("n_contaminated"))
    assert(contam.exists(_ > 0) && contam.exists(_ == 0))
  }
}

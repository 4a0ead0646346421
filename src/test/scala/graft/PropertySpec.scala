package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.quality.{TestDef, TestGenerator}
import graft.events.Cron

/** ScalaCheck properties over the engine's pure kernels (SURVEY.md §5's
  * property-test plan) plus two small Spark invariants. Cases are drawn
  * with fixed seeds (no scalatest-scalacheck bridge in the offline
  * dependency set), so failures reproduce exactly. Pure properties run
  * hundreds of generated cases; the Spark ones are capped low because
  * each case is a job.
  */
class PropertySpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n * 4).iterator
      .flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))
      .take(n).toSeq

  // ---- skeleton inference --------------------------------------------------

  test("every string matches its own inferred pattern skeleton") {
    // includes regex metacharacters — the property catches escaping bugs
    val anyStr = Gen.nonEmptyListOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf("#.-_()[]{}^$|?*+\\ :/".toSeq)))
      .map(_.mkString)
    for (s <- samples(anyStr, 300))
      assert(s.matches(TestGenerator.skeleton(s)), s"input: '$s'")
  }

  test("strings sharing a shape share a skeleton; shape changes break it") {
    assert(TestGenerator.skeleton("Customer#000000001") ==
      TestGenerator.skeleton("Supplier#42"))
    assert(TestGenerator.skeleton("AB-12") != TestGenerator.skeleton("AB12"))
  }

  // ---- param / LOV parsing -------------------------------------------------

  test("parseParams round-trips rendered k=v maps") {
    val key = Gen.nonEmptyListOf(Gen.alphaChar).map(_.mkString)
    val value = Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.const('.')))
      .map(_.mkString)
    for (m <- samples(Gen.mapOf(Gen.zip(key, value)), 200)) {
      val rendered = m.map { case (k, v) => s"$k=$v" }.mkString(", ")
      assert(TestDef.parseParams(rendered) == m, s"input: '$rendered'")
    }
  }

  test("parseLov round-trips members containing commas and quotes") {
    val member = Gen.nonEmptyListOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf(',', '\'', ' ', '-'))).map(_.mkString)
      .map(_.trim).suchThat(_.nonEmpty)
    for (vs <- samples(Gen.nonEmptyListOf(member), 200)) {
      val rendered = vs.map(v => "'" + v.replace("'", "''") + "'")
        .mkString("(", ",", ")")
      assert(TestDef.parseLov(rendered) == vs, s"input: '$rendered'")
    }
  }

  // ---- cron ----------------------------------------------------------------

  test("every expanded cron instant re-matches its own spec") {
    val from = java.time.Instant.parse("2024-03-01T00:00:00Z")
    val to = java.time.Instant.parse("2024-03-08T00:00:00Z")
    for (e <- Seq("0 23 * * *", "30 6 * * 1-5", "*/15 * * * *",
        "0 0 1 * *", "0 12 * * 7", "15 */6 * * 0")) {
      val spec = Cron.parse(e)
      val fires = Cron.expand(e, from, to)
      assert(fires == fires.sorted && fires.toSet.size == fires.size)
      fires.foreach { i =>
        assert(spec.matches(java.time.LocalDateTime.ofInstant(
          i, java.time.ZoneId.of("UTC"))), s"$e -> $i")
      }
      assert(fires.forall(i => !i.isBefore(from) && i.isBefore(to)))
    }
  }

  // ---- Spark invariants (few cases — each is a job) ------------------------

  lazy val spark = SparkTestSession.spark

  test("profile counts are permutation-invariant and self-consistent") {
    import spark.implicits._
    val rows = Gen.listOfN(30,
      Gen.zip(Gen.choose(0L, 9L), Gen.option(Gen.choose(-5.0, 5.0))))
    for (data <- samples(rows, 5) if data.nonEmpty) {
      val df = data.toDF("k", "x")
      val shuffled = data.reverse.toDF("k", "x")
      def stats(d: org.apache.spark.sql.DataFrame) =
        graft.profile.Profiler.profile(d, "t").collect().map { r =>
          (r.getAs[String]("column_name"), r.getAs[Long]("record_ct"),
            r.getAs[Long]("value_ct"), r.getAs[Long]("null_ct"),
            r.getAs[Long]("distinct_ct"))
        }.toSeq
      val s = stats(df)
      assert(s == stats(shuffled)) // order independence
      s.foreach { case (_, rec, value, nulls, distinct) =>
        assert(value + nulls == rec)
        assert(distinct <= value)
      }
    }
  }

  test("dupClusters matches a driver-side union-find on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 3) {
      val n = 40
      val pairs = Seq.fill(30) {
        val a = rnd.nextInt(n).toLong
        val b = rnd.nextInt(n).toLong
        if (a < b) (a, b) else (b, a + 1)
      }.filter(p => p._1 != p._2).distinct
      // reference: plain union-find over the same edges
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = parent.keys.map(x => x -> find(x)).toMap
      val got = graft.text.Dedup
        .dupClusters(pairs.toDF("id_a", "id_b")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // union-find roots are already the component minima here because
      // unions always point the larger root at the smaller one
      assert(got == want, s"edges: $pairs")
      // the DISTRIBUTED loop (the over-gate path since the r15 driver
      // union-find short-circuit) must agree on the same edges
      import org.apache.spark.sql.functions.col
      val gotDist = graft.text.Dedup.dupClustersDistributed(
          pairs.toDF("id_a", "id_b")
            .select(col("id_a").as("src"), col("id_b").as("dst")),
          maxRounds = 20).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gotDist == want, s"distributed, edges: $pairs")
    }
  }

  test("fusePair matches an imperative greedy scan on random symbol " +
    "arrays") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // tiny alphabet + repeated symbols maximize overlap/chaining cases
    // ("a a a" under (a,a), merged tokens re-matching as pair members)
    val sym = Gen.oneOf("a", "b", "aa", "ab")
    val arr = Gen.listOf(sym).map(_.toVector)
    val pair = Gen.zip(sym, sym)
    val cases = samples(Gen.zip(arr, pair), 120)
    def ref(s: Vector[String], a: String, b: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < s.length)
        if (i + 1 < s.length && s(i) == a && s(i + 1) == b) {
          out += a + b; i += 2
        } else { out += s(i); i += 1 }
      out.result()
    }
    val df = cases.zipWithIndex
      .map { case ((s, _), i) => (i.toLong, s) }.toDF("i", "syms")
    // one job for all cases: fuse each row with ITS pair via a union of
    // per-pair plans would be a plan per case — instead group cases by
    // pair (4x4 = few distinct pairs) and fuse each group in one select
    cases.map(_._2).distinct.foreach { case (a, b) =>
      val idx = cases.zipWithIndex.collect {
        case (((_, p), i)) if p == (a, b) => i.toLong
      }.toSet
      val got = df.filter(col("i").isin(idx.toSeq: _*))
        .select(col("i"), graft.text.TextOps.fusePair(col("syms"), a, b))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      idx.foreach { i =>
        val s = cases(i.toInt)._1
        assert(got(i) == ref(s, a, b),
          s"syms=$s pair=($a,$b) got=${got(i)}")
      }
    }
  }

  test("dupClusters closes a 100-hop chain within the default rounds") {
    import spark.implicits._
    // the diameter stress case: pointer jumping must converge in
    // O(log d) rounds, so the default maxRounds = 20 closes this chain
    // (plain min-label propagation would need 100 rounds and under-merge)
    val chain = (0L until 100L).map(i => (i, i + 1))
    val got = graft.text.Dedup
      .dupClusters(chain.toDF("id_a", "id_b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 101 && got.values.forall(_ == 0L))
  }

  test("exact dedup is idempotent and keeps the smallest id per content") {
    import spark.implicits._
    val docs = Gen.listOfN(20, Gen.zip(Gen.choose(1L, 1000L),
      Gen.oneOf("a", "b", "a  b", "A b", "c")))
    for (data <- samples(docs, 5)
         if data.map(_._1).distinct.size == data.size) {
      val df = data.toDF("doc_id", "text")
      val once = graft.text.Dedup.exact(df, "text", "doc_id")
      val twice = graft.text.Dedup.exact(
        once.withColumnRenamed("content_hash", "text"), "text", "doc_id")
      assert(once.count() == twice.count())
      val kept = once.collect().map(_.getAs[Long]("doc_id")).toSet
      // every keeper is the minimum id of its normalized-content group
      val groups = data.groupBy(d =>
        d._2.trim.replaceAll("\\s+", " ").toLowerCase)
      assert(kept == groups.values.map(_.map(_._1).min).toSet)
    }
  }
}

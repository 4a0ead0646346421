package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.profile.{ColProfile, Profiler}

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = Sessions.local("4", "4")
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}

class ProfilerSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("profile computes exact counts on a tiny frame") {
    val df = Seq(
      (1L, Some("a"), Some(1.5)), (2L, Some("bb"), Some(2.5)),
      (3L, None, Some(-1.0)), (4L, Some("a"), None),
    ).toDF("id", "s", "x")
    val p = Profiler.profile(df, "t").collect()
      .map(r => r.getAs[String]("column_name") -> r).toMap
    assert(p("id").getAs[Long]("record_ct") == 4)
    assert(p("id").getAs[Long]("distinct_ct") == 4)
    assert(p("s").getAs[Long]("null_ct") == 1)
    assert(p("s").getAs[Long]("distinct_ct") == 2)
    assert(p("s").getAs[Long]("max_len") == 2)
    assert(p("x").getAs[Double]("min_num") == -1.0)
    assert(p("x").getAs[Long]("neg_ct") == 1)
    assert(p("x").getAs[Double]("sum_num") == 3.0)
    // frac parts: 0.5 + 0.5 + 0.0 (=-1 - floor(-1)) = 1.0
    assert(p("x").getAs[Double]("frac_sum") == 1.0)
  }

  test("sampled profile scales extensive stats back to table scale") {
    val full = spark.read.parquet(s"${SparkTestSession.sf}/lineitem.parquet")
    val whole = Profiler.profile(full, "lineitem").collect()
      .map(r => r.getAs[String]("column_name") -> r).toMap
    val sampled = Profiler
      .profileSampled(full, "lineitem", fraction = 0.5, seed = 42L)
      .collect().map(r => r.getAs[String]("column_name") -> r).toMap
    assert(sampled.keySet == whole.keySet)
    for (c <- Seq("l_orderkey", "l_quantity", "l_returnflag")) {
      val (s, w) = (sampled(c), whole(c))
      // extensive counts scaled by 1/fraction land within ±10% of truth
      assert(math.abs(s.getAs[Long]("record_ct").toDouble -
        w.getAs[Long]("record_ct")) < 0.1 * w.getAs[Long]("record_ct"), c)
      assert(math.abs(s.getAs[Long]("value_ct").toDouble -
        w.getAs[Long]("value_ct")) < 0.1 * w.getAs[Long]("value_ct"), c)
    }
    // extensive sum scaled; intensive stats unscaled and close
    val (sq, wq) = (sampled("l_quantity"), whole("l_quantity"))
    assert(math.abs(sq.getAs[Double]("sum_num") - wq.getAs[Double]("sum_num"))
      < 0.1 * wq.getAs[Double]("sum_num"))
    assert(math.abs(sq.getAs[Double]("avg_num") - wq.getAs[Double]("avg_num"))
      < 0.05 * wq.getAs[Double]("avg_num"))
    // sample extrema are bounded by the true range
    assert(sq.getAs[Double]("min_num") >= wq.getAs[Double]("min_num"))
    assert(sq.getAs[Double]("max_num") <= wq.getAs[Double]("max_num"))
    // deterministic under the seed
    val again = Profiler
      .profileSampled(full, "lineitem", fraction = 0.5, seed = 42L)
      .collect().map(r => r.getAs[String]("column_name") -> r).toMap
    assert(again("l_quantity").getAs[Double]("sum_num") ==
      sq.getAs[Double]("sum_num"))
  }

  test("shape characteristics: percentiles, moments, string classes") {
    val df = Seq(
      (1.0, Some(" padded"), Some("2024-01-02 00:00:00")),
      (2.0, Some("user@example.com"), Some("2024-01-02 10:30:00")),
      (3.0, Some("N/A"), Some("2024-01-06 12:00:00")),
      (10.0, Some("hello world two"), None),
    ).toDF("x", "s", "tstr")
      .withColumn("ts", org.apache.spark.sql.functions.to_timestamp(
        org.apache.spark.sql.functions.col("tstr")))
      .drop("tstr")
    val p = Profiler.profile(df, "t").collect()
      .map(r => r.getAs[String]("column_name") -> r).toMap
    // percentiles: sorted [1,2,3,10]; p50 = 2.5, p25 = 1.75
    assert(p("x").getAs[Double]("median_num") == 2.5)
    assert(p("x").getAs[Double]("p25_num") == 1.75)
    assert(p("x").getAs[Double]("range_num") == 9.0)
    assert(p("x").getAs[Long]("round_num_ct") == 1) // 10.0
    // right-skewed data → positive skewness
    assert(p("x").getAs[Double]("skew_num") > 0)
    assert(p("s").getAs[Long]("lead_space_ct") == 1)
    assert(p("s").getAs[Long]("email_ct") == 1)
    assert(p("s").getAs[Long]("dummy_ct") == 1)
    assert(p("s").getAs[Double]("avg_words") == 1.5) // 1+1+1+3 over 4
    assert(p("ts").getAs[Long]("midnight_ct") == 1)
    assert(p("ts").getAs[Long]("work_hours_ct") == 2) // 10:30 and 12:00
    assert(p("ts").getAs[Long]("span_days") == 4)
  }

  test("profile of harness tables yields one row per profilable column") {
    for ((t, cols) <- Tables.meta) {
      val df = Tables.load(spark, SparkTestSession.sf, t)
      val n = Profiler.profile(df, t).count()
      assert(n == cols.size, s"table $t")
    }
  }

  test("array columns profile cardinality and element-count stats") {
    val df = Tables.load(spark, SparkTestSession.sf, "embeddings")
    val p = Profiler.profile(df, "embeddings").collect()
      .map(r => r.getAs[String]("column_name") -> r).toMap
    val emb = p("embedding")
    assert(emb.getAs[String]("data_type") == "floatarr")
    assert(emb.getAs[Long]("min_len") == 64 &&
      emb.getAs[Long]("max_len") == 64)
    assert(emb.getAs[Long]("distinct_ct") == 500)
  }

  test("profile compare: identical sides all match, drift surfaces") {
    import graft.profile.{ProfileCompare, Profiler}
    val df = Tables.load(spark, SparkTestSession.sf, "customer")
    val p = Profiler.profile(df, "customer")
    val same = ProfileCompare.diff(p, p).collect()
    assert(same.nonEmpty && same.forall(_.getAs[Boolean]("matches")))
    // drop rows → record_ct must surface as drift
    val p2 = Profiler.profile(df.limit(100), "customer")
    val drift = ProfileCompare.diff(p, p2).collect()
      .filter(r => r.getAs[String]("stat") == "record_ct")
    assert(drift.forall(!_.getAs[Boolean]("matches")))
    assert(drift.head.getAs[Double]("delta") == -50.0)
  }

  test("approx mode profiles with near-exact distincts and no Expand " +
      "in any scan pass") {
    val df = Tables.load(spark, SparkTestSession.sf, "customer")
    val approx = Profiler.profile(df, "customer", exactDistinct = false)
    // the multi-countDistinct hazard plans as Expand → partial
    // HashAggregate → Exchange (row replication crossing a shuffle). The
    // shipped profiler runs per-column passes with at most ONE distinct
    // aggregate each, so the strict assertion holds: no ExpandExec in
    // ANY pass, in any mode. (Since the concurrent-collect rework the
    // passes execute before the result frame exists, so the fence
    // targets the pass plans directly via Profiler.passesFor.)
    def hasExpand(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
      p.isInstanceOf[org.apache.spark.sql.execution.ExpandExec] ||
        p.children.exists(hasExpand)
    for (mode <- Seq("exact", "hll", "dates", "none", "sketch");
         pass <- Profiler.passesFor(df, mode, exactPercentiles = true))
      assert(!hasExpand(pass.queryExecution.executedPlan),
        s"$mode: ${pass.queryExecution.executedPlan}")
    val exact = Profiler.profile(df, "customer").collect()
      .map(r => r.getAs[String]("column_name") ->
        r.getAs[Long]("distinct_ct")).toMap
    approx.collect().foreach { r =>
      val c = r.getAs[String]("column_name")
      val a = r.getAs[Long]("distinct_ct").toDouble
      val e = exact(c).toDouble
      assert(math.abs(a - e) <= math.max(2.0, 0.1 * e), s"$c: $a vs $e")
    }
  }

  test("schema drift: added, removed, and type-changed columns surface") {
    import graft.profile.SchemaDrift
    val df = Tables.load(spark, SparkTestSession.sf, "events")
      .drop("props")                                     // removed
      .withColumn("value",
        org.apache.spark.sql.functions.col("value").cast("string")) // changed
      .withColumn("extra", org.apache.spark.sql.functions.lit(1L))  // added
    val rows = SchemaDrift.againstPinned(df, "events", spark).collect()
      .map(r => r.getAs[String]("column_name") ->
        r.getAs[String]("status")).toMap
    assert(rows("props") == "removed")
    assert(rows("value") == "type_changed")
    assert(rows("extra") == "added")
    assert(rows("event_id") == "ok")
  }

  test("PSI stays near zero in-distribution and alarms on planted drift") {
    import graft.profile.DriftPsi
    import org.apache.spark.sql.functions.{col, rand}
    val base = Seq.fill(4)(Seq.tabulate(1000)(i => i.toDouble)).flatten
      .toDF("x") // uniform over [0, 1000)
    val counts = Seq.fill(10)(100L)
    def total(df: org.apache.spark.sql.DataFrame) =
      DriftPsi.psi(df, "t", "x", 0.0, 999.0, counts, 1000L, spark)
        .collect().map(_.getAs[Double]("psi_term")).sum
    assert(math.abs(total(base)) < 0.01) // same distribution → PSI ≈ 0
    // planted drift: squash everything into the bottom half
    val drifted = base.select((col("x") / 2).as("x"))
    assert(total(drifted) > 0.2) // conventional re-baseline alarm
  }

  test("partial profiles merge to the whole-table profile") {
    import graft.profile.ColProfile
    val df = Tables.load(spark, SparkTestSession.sf, "orders")
    val half1 = df.filter(org.apache.spark.sql.functions
      .col("o_orderkey") % 2 === 0)
    val half2 = df.filter(org.apache.spark.sql.functions
      .col("o_orderkey") % 2 === 1)
    def prof(d: org.apache.spark.sql.DataFrame) =
      ColProfile.fromRows(Profiler.profile(d, "orders"))
        .map(p => p.column -> p).toMap
    val whole = prof(df)
    val merged = prof(half1).map { case (c, p) =>
      c -> ColProfile.merge(p, prof(half2)(c))
    }
    merged.foreach { case (c, m) =>
      val w = whole(c)
      assert(m.recordCt == w.recordCt && m.valueCt == w.valueCt &&
        m.nullCt == w.nullCt, c)
      assert(m.distinctCt.isEmpty, c) // not mergeable — None, not a sentinel
      assert(m.minNum == w.minNum && m.maxNum == w.maxNum, c)
      assert(m.minStr == w.minStr && m.maxStr == w.maxStr, c)
      assert(m.minTs == w.minTs && m.maxTs == w.maxTs, c)
      for (ms <- m.sumNum; ws <- w.sumNum)
        assert(math.abs(ms - ws) < 1e-6, c)
      for (ma <- m.avgNum; wa <- w.avgNum)
        assert(math.abs(ma - wa) < 1e-4, c)
    }
  }

  test("frame-level profile merge is EXACT and composes across splits") {
    // mergeProfiles is the engine-side twin of ColProfile.merge: on the
    // mergeable fields the merged frame must equal the full-table
    // profile bit-for-bit (decimal-recovered sums, re-derived avg/range/
    // span) — not approximately
    val df = Tables.load(spark, SparkTestSession.sf, "events")
    val k = org.apache.spark.sql.functions.col("event_id")
    def p(d: org.apache.spark.sql.DataFrame) = Profiler.profile(d, "events")
    val full = p(df)
      .select(Profiler.MergeableFields.map(
        org.apache.spark.sql.functions.col): _*)
      .orderBy("column_name")
    def rows(d: org.apache.spark.sql.DataFrame) = d.collect().toSeq
    val twoWay = Profiler.mergeProfiles(p(df.filter(k % 2 === 0)),
      p(df.filter(k % 2 === 1)))
    assert(rows(twoWay) == rows(full))
    // three disjoint deltas folded pairwise — the standing-baseline +
    // nightly-delta usage pattern
    val threeWay = Profiler.mergeProfiles(
      Profiler.mergeProfiles(p(df.filter(k % 3 === 0)),
        p(df.filter(k % 3 === 1))),
      p(df.filter(k % 3 === 2)))
    assert(rows(threeWay) == rows(full))
  }

  test("merging an empty delta is the identity (sums are not " +
    "null-poisoned)") {
    // an incremental delta can legitimately be empty (no new partitions)
    // or all-null in a column: the merge law must still hold — sum over
    // zero values is NULL on that side and the other side passes through
    val df = Tables.load(spark, SparkTestSession.sf, "events")
    val k = org.apache.spark.sql.functions.col("event_id")
    def p(d: org.apache.spark.sql.DataFrame) = Profiler.profile(d, "events")
    val full = p(df)
      .select(Profiler.MergeableFields.map(
        org.apache.spark.sql.functions.col): _*)
      .orderBy("column_name")
    val withEmpty = Profiler.mergeProfiles(p(df), p(df.filter(k < 0)))
    assert(withEmpty.collect().toSeq == full.collect().toSeq)
    // the driver-side record twin obeys the same law
    def rec(n: Long, sum: Option[Double], mn: Option[Double],
            mx: Option[Double]) = ColProfile("t", "c", 0, "double",
      recordCt = n, valueCt = n, nullCt = 0, distinctCt = None,
      minLen = None, maxLen = None, avgLen = None, blankCt = None,
      minStr = None, maxStr = None, minNum = mn, maxNum = mx,
      avgNum = None, stdevNum = None, sumNum = sum, fracSum = None,
      zeroCt = None, negCt = None, minTs = None, maxTs = None,
      distinctDateCt = None)
    val cp = ColProfile.merge(
      rec(3, Some(6.5), Some(1.0), Some(3.5)),
      rec(0, None, None, None))
    assert(cp.sumNum.contains(6.5) && cp.minNum.contains(1.0) &&
      cp.maxNum.contains(3.5))
  }

  test("all five pass modes agree on the base statistics, and the " +
      "distinct/percentile slots degrade exactly as documented") {
    // the r7 streaming work found an assembly bug ("sketch" mode
    // referencing the exact-mode __d columns) that only the streaming
    // path exercised — this fences the mode matrix directly, on inputs
    // with nulls, an all-null column, empties, and every melt type
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, Some(2.5), Some("a b"), Some("2024-01-06 10:00:00")),
      (2L, None, Some(""), Some("2024-01-07 00:00:00")),
      (2L, Some(-7.0), None, None),
      (3L, Some(0.0), Some("N/A"), Some("2024-03-01 16:59:59"))
    ).toDF("k", "x", "s", "ts_raw")
      .withColumn("ts", col("ts_raw").cast("timestamp"))
      .withColumn("all_null", org.apache.spark.sql.functions
        .lit(null).cast("double"))
      .drop("ts_raw")
    val slices = Seq(df, df.limit(0))
    for (slice <- slices) {
      val modes = Seq("exact", "hll", "dates", "none", "sketch")
      val rows = modes.map { m =>
        m -> Profiler.profileWith(slice, "t", m,
            exactPercentiles = m == "exact")
          .drop("distinct_sketch").collect()
          .map(r => r.getAs[String]("column_name") -> r).toMap
      }.toMap
      val base = rows("exact")
      val pctSlots = Set("p25_num", "median_num", "p75_num")
      val distinctSlots = Set("distinct_ct", "distinct_date_ct")
      for (m <- modes.tail; (c, r) <- rows(m)) {
        val e = base(c)
        e.schema.fieldNames.foreach { f =>
          if (!pctSlots(f) && !distinctSlots(f))
            assert(r.getAs[Any](f) == e.getAs[Any](f),
              s"mode=$m col=$c field=$f: ${r.getAs[Any](f)} vs " +
                s"${e.getAs[Any](f)} (rows=${slice.count()})")
        }
        // distinct_ct: exact/hll carry a number (hll within the spec'd
        // bound, checked elsewhere); dates/none/sketch must be NULL
        if (m == "dates" || m == "none" || m == "sketch")
          assert(r.isNullAt(r.fieldIndex("distinct_ct")), s"$m/$c")
        if (m == "none" || m == "sketch") {
          assert(r.isNullAt(r.fieldIndex("distinct_date_ct")), s"$m/$c")
          pctSlots.foreach(f =>
            assert(r.isNullAt(r.fieldIndex(f)), s"$m/$c/$f"))
        }
      }
    }
    // the sketch survives the drop only in sketch mode, and estimates
    // the exact count on this tiny frame dead-on
    import org.apache.spark.sql.functions.hll_sketch_estimate
    val sk = Profiler.profileWith(df, "t", "sketch",
        exactPercentiles = false)
      .select(col("column_name"),
        hll_sketch_estimate(col("distinct_sketch")).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Profiler.profile(df, "t").collect()
      .map(r => r.getAs[String]("column_name") ->
        r.getAs[Long]("distinct_ct")).toMap
    assert(sk == exact, s"$sk vs $exact")
  }

  test("topK returns most frequent first") {
    val df = Seq("a", "a", "a", "b", "b", "c").toDF("v")
    val rows = Profiler.topK(df, "t", "v", 2).collect()
    assert(rows.map(_.getAs[String]("value")).toSeq == Seq("a", "b"))
    assert(rows.head.getAs[Long]("value_ct") == 3)
  }

  test("exact percentiles are partitioning-invariant (the r15 pct-pass " +
      "fan-out must not move a single quantile bit)") {
    // near-unique doubles — the l_extendedprice shape whose exact
    // Percentile pass the fan-out parallelizes — plus ties and negatives
    val vals = (1 to 4001).map(i => (i * 37 % 4003) / 7.0 - 11.0) ++
      Seq(3.5, 3.5, 3.5)
    val df = vals.toDF("x")
    import org.apache.spark.sql.functions.{array, col, lit, percentile}
    val ps = array(lit(0.25), lit(0.5), lit(0.75))
    def q(d: org.apache.spark.sql.DataFrame): Seq[Double] =
      d.agg(percentile(col("x"), ps)).collect()(0)
        .getSeq[Double](0)
    val one = q(df.coalesce(1))
    Seq(2, 7, 32).foreach { n =>
      val r = q(df.repartition(n))
      assert(r == one, s"repartition($n): $r != $one")
    }
    // and through the profiler itself: fanned (default) vs fan-out
    // disabled via the probe flag must produce identical profile rows
    val li = spark.read.parquet(s"${SparkTestSession.sf}/lineitem.parquet")
    val fanned = Profiler.profile(li, "lineitem").collect().toSeq
    System.setProperty("graft.fanout.off", "1")
    try {
      val plain = Profiler.profile(li, "lineitem").collect().toSeq
      assert(fanned == plain)
    } finally System.clearProperty("graft.fanout.off")
  }
}

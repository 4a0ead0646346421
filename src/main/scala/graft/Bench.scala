package graft
import org.apache.spark.sql.SparkSession

/** Headline benchmark: every registered query timed SPARK_GRAFT_REPS
  * times (default 5) in a per-rep randomized order (seeded by the rep
  * index — deterministic across runs), reporting the per-query MEDIAN.
  * Randomized order + median de-noises the 32-way-parallel local JVM:
  * a query's number no longer depends on which heavy neighbor ran just
  * before it, and one GC pause cannot shift a timing. `spread` (max −
  * min across reps) is emitted per query so run-to-run variance is
  * visible in the artifact instead of needing a re-run to detect.
  *
  * Each query drains into the `noop` sink, NOT `.count()`: counting
  * lets Catalyst prune computed payloads above the final aggregates
  * (the profile queries benched 2 s by count but cost 20 s+ fully
  * evaluated — the pruning hid a JIT pathology for four rounds), while
  * the noop write evaluates every output column with zero sink cost.
  * Totals are therefore honest but NOT comparable with the r1–r4
  * artifacts' count-mode numbers.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt
    require(reps >= 1, s"SPARK_GRAFT_REPS must be >= 1, got $reps")
    val spark = Sessions.local(cpus, cpus)
    spark.sparkContext.setLogLevel("WARN")
    // absorb JVM/codegen/parquet-footer warmup outside the timings (the r1
    // numbers charged ~6 s of session startup to whichever query ran first)
    try SparkEntry.entry(spark).count() catch { case _: Throwable => }
    val only = args.toSet // optional: bench just these queries
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
    val times = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    // a query that throws must not book its elapsed time as a normal
    // median — the artifact marks it so a crashed/empty query can never
    // masquerade as a fast one (review: the sf1 stream queries ran on
    // zero rows for four rounds and nothing in the JSON said so)
    val errors = scala.collection.mutable.Map.empty[String, String]
    for (rep <- 1 to reps) {
      val order = new scala.util.Random(rep).shuffle(names)
      order.foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          // only successful reps book time: a fast-crashing rep would
          // otherwise contribute a misleadingly small median while the
          // failure hides in the errors map
          times(name) = times(name) :+ (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          errors(name) = s"${e.getClass.getSimpleName}: " +
            String.valueOf(e.getMessage).linesIterator.take(1)
              .mkString.filter(_ >= ' ').take(120)
        }
      }
    }
    def median(v: Vector[Double]): Double = {
      val s = v.sorted; s(s.size / 2)
    }
    // SOLO-PROBE protocol (r9 verdict #3, widened r10 verdict #5): a
    // rep that lands right after a heavy neighbor inherits its GC/page
    // -cache debris and the in-sweep spread can reach many SECONDS —
    // r9's "stream_volume_update regressed 1.49×" had spread 5.7 s at
    // sf0.1 and 66 s at sf1, unadjudicable; r10's dq_autogen_lineitem
    // "1.29× creep" showed in-sweep spread 2.9 s with no code change.
    // ANY query whose in-sweep spread exceeds SoloSpreadCap (not just
    // the stream family — the r10 name filter left non-stream outliers
    // unadjudicable) is re-measured with SoloReps back-to-back solo
    // reps after a GC pause, and the solo medians REPLACE the
    // contaminated samples; the detail JSON keeps both (`solo` map) so
    // a regression call can always see which number is load-bearing.
    // the cap scales with the query's own median: an ABSOLUTE 1.5 s cap
    // applied at sf1 (median runtimes 3–60 s) trips on ~5% jitter of a
    // 30 s query, tripling its sweep cost and silently switching its
    // published number from sweep-context to post-GC solo — a protocol
    // change masquerading as a perf delta in round-over-round compares.
    // 20% of median keeps the trigger meaning "contaminated", not "big".
    val SoloSpreadCap = 1.5
    val SoloReps = 3
    val soloNote = scala.collection.mutable.Map.empty[String, String]
    if (reps >= 2) names.foreach { case (name, fn) =>
      val v = times(name)
      if (v.nonEmpty &&
          v.max - v.min > math.max(SoloSpreadCap, 0.2 * median(v))) {
        System.gc()
        // accumulate EVERY solo failure (overwriting kept only the last
        // one, and the replace path reduced it to a bare boolean — an
        // OOM vs a checkpoint collision was unadjudicable without a
        // re-run, contradicting the protocol's purpose)
        val soloErrs = scala.collection.mutable.ListBuffer.empty[String]
        val solo = (1 to SoloReps).flatMap { _ =>
          val t0 = System.nanoTime()
          try {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            Some((System.nanoTime() - t0) / 1e9)
          } catch { case e: Throwable =>
            soloErrs += s"${e.getClass.getSimpleName}: " +
              String.valueOf(e.getMessage).linesIterator.take(1)
                .mkString.filter(_ >= ' ').take(110)
            None
          }
        }.toVector
        // replace only with a defensible sample: ≥2 clean solo reps AND
        // a solo spread no worse than the sweep spread (r11 verdict: on
        // a hot machine the solo probe itself can be the contaminated
        // measurement — r11's raw artifact published pipeline_quickstart
        // at 70.4 s solo [spread 68.1!] over its own 9.3 s sweep median,
        // inflating the headline 37%; the published number must always
        // be the LOWER-variance sample). Fewer clean reps, or a noisier
        // solo → keep the sweep numbers and say so in the detail JSON.
        // A solo failure lands in the shared errors map ONLY on the
        // keep-sweep path: when ≥2 clean solo reps replaced the samples
        // the published median is real, and an errors entry alongside it
        // would read downstream (mk_skew, adjudication) as a crashed
        // query contradicting its own number — the flake is recorded in
        // the solo note instead (r10 advice).
        def jstr(s: String): String =
          "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
        if (solo.size >= 2) {
          val flaked = if (soloErrs.isEmpty) ""
            else s""","solo_flake":${jstr(soloErrs.mkString(" | "))}"""
          val replaced = solo.max - solo.min < v.max - v.min
          soloNote(name) = s"""{"sweep_median":${f"${median(v)}%.3f"},""" +
            s""""sweep_spread":${f"${v.max - v.min}%.3f"},""" +
            s""""solo_median":${f"${median(solo)}%.3f"},""" +
            s""""solo_spread":${f"${solo.max - solo.min}%.3f"},""" +
            s""""published":"${if (replaced) "solo" else "sweep"}"$flaked}"""
          if (replaced) times(name) = solo
        } else {
          if (soloErrs.nonEmpty)
            errors(name) = "solo: " + soloErrs.mkString(" | ").take(230)
          soloNote(name) = s"""{"sweep_median":${f"${median(v)}%.3f"},""" +
            s""""sweep_spread":${f"${v.max - v.min}%.3f"},""" +
            s""""solo_failed":true}"""
        }
      }
    }
    // a query with zero successful reps has no median and no spread —
    // it appears ONLY in errors, and the total sums real work only
    val timed = names.filter { case (n, _) => times(n).nonEmpty }
    val med = timed.map { case (n, _) => n -> median(times(n)) }
    val total = med.map(_._2).sum
    val errs = errors.toSeq.sortBy(_._1).map { case (k, v) =>
      s"\"" + k + "\":\"" + v.replace("\\", "\\\\").replace("\"", "\\\"") +
        "\""
    }.mkString("{", ",", "}")
    def r3(v: Double): String = f"$v%.3f"
    // FULL per-query detail (median + spread for all ~120 queries) goes
    // to a FILE: the driver's stdout capture keeps only the last ~2000
    // bytes, and the full map blew past that in r5/r6 — the official
    // bench artifact recorded `parsed: null` both rounds. The printed
    // line stays the machine-parsed contract; the file is the archive.
    val detailPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_DETAIL",
      "BENCH_FULL.json")
    val fullQs = med.map { case (k, v) => s"\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val fullSpread = timed.map { case (n, _) =>
      s"\"" + n + "\":" + r3(times(n).max - times(n).min)
    }.mkString("{", ",", "}")
    val soloJson = soloNote.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(detailPath),
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$fullQs,"spread":$fullSpread,"solo":$soloJson,"errors":$errs,"reps":$reps,"sf":"$sfDir"}""")
    // compact stdout line: fixed family-representative headliners first,
    // then the slowest remaining queries, size-capped so the line plus
    // its surroundings always fits the driver's tail window
    val headliners = Vector(
      "q1_pricing", "q3_top_orders", "q5_region_revenue",
      "w1_running_revenue", "rollup_pricing", "topk_event_type",
      "profile_compare_lineitem", "dq_autogen_lineitem", "ev_sessions",
      "ev_journeys", "ev_late_starts", "dedup_exact_documents",
      "neardup_minhash_collapsed_documents", "knn_embeddings",
      "ann_lsh_embeddings", "semantic_dedup_ann_prod", "bm25_documents",
      "bpe_pairs_documents", "curation_funnel_documents",
      "stream_sessions_bounded", "stream_curate_bounded")
    val medMap = med.toMap
    val bySlowest = med.sortBy(-_._2).map(_._1)
    val ordered = (headliners.filter(medMap.contains) ++
      bySlowest.filterNot(headliners.contains)).distinct
    // bytes for the queries map: the driver keeps only the LAST ~2000
    // bytes of stdout, and sbt's "[success] ..." trailer plus any late
    // log line eats into that window — leave real headroom
    val budget = 1200
    val picked = scala.collection.mutable.ListBuffer.empty[String]
    var used = 2
    var truncated = 0
    ordered.foreach { n =>
      val frag = "\"" + n + "\":" + r3(medMap(n))
      if (used + frag.length + 1 <= budget) {
        picked += frag; used += frag.length + 1
      } else truncated += 1
    }
    val qs = picked.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,"n_queries":${med.size},"omitted":$truncated,"detail":"$detailPath","errors":$errs,"reps":$reps,"sf":"$sfDir"}""")
    spark.stop()
  }
}

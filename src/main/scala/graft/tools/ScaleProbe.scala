package graft.tools

/** Scale-curve probe (re-runnable; r13's artifact was produced by a
  * one-off harness): times the scale-critical registered queries at
  * 1×/10×/100× rows — sf0.1 (driver corpus), sf1 and sf10 (GenScale
  * replicas, see TESTDATA.md) — and writes BENCH_scale_probe.json with
  * per-10×-step time ratios. Linear scaling = 10.0 per step; a ratio
  * that STEEPENS with scale is the 100 TB red flag this probe exists to
  * catch (it named the banded-minhash collapse super-linear in r13,
  * which forced the adaptive band-key widening in
  * [[graft.text.Dedup.lshCandidates]]).
  *
  * Protocol: per (query, leg), `reps` timed drains into the noop sink
  * (same evaluation contract as [[graft.Bench]] — every output column
  * evaluated, zero sink cost), reporting the MIN across reps (the
  * steady-state estimate least contaminated by JIT/GC/neighbor noise;
  * with the default reps=2 a median would be the same arithmetic
  * anyway) plus the max−min spread at the largest leg.
  *
  *   sbt "runMain graft.tools.ScaleProbe [reps]"
  */
object ScaleProbe {

  val Queries: Seq[String] = Seq(
    "curation_funnel_documents",
    "ev_rule_engine",
    "ev_sessions",
    "neardup_minhash_collapsed_documents",
    "profile_lineitem",
    // r13 verdict #8: the newest shuffle-heavy operator — its pair
    // volume is the quantity that explodes at scale
    "ev_skew_join")

  val Legs: Seq[(String, String)] = Seq(
    "sf0.1" -> "/root/testdata/sf0.1",
    "sf1" -> "/root/repo/testdata_sf1",
    "sf10" -> "/root/repo/testdata_sf10")

  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(2)
    val spark = graft.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
    spark.sparkContext.setLogLevel("ERROR")

    def drain(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    val missing = Legs.filterNot { case (_, d) =>
      java.nio.file.Files.isDirectory(java.nio.file.Paths.get(d))
    }
    require(missing.isEmpty,
      s"missing corpora ${missing.map(_._2).mkString(", ")} — regenerate " +
        "with graft.tools.GenScale (TESTDATA.md)")

    // warm the session once per leg so leg 1's first query doesn't
    // absorb JVM/codegen warm-up
    Legs.foreach { case (_, d) => drain(Queries.head, d) }

    val results: Seq[(String, Map[String, Vector[Double]])] =
      Queries.map { q =>
        q -> Legs.map { case (leg, d) =>
          leg -> Vector.fill(reps)(drain(q, d))
        }.toMap
      }

    def r3(v: Double) = f"$v%.3f".toDouble
    val items = results.map { case (q, byLeg) =>
      val mins = Legs.map { case (leg, _) => leg -> byLeg(leg).min }.toMap
      val big = byLeg(Legs.last._1)
      val fields = Seq(
        s""""sf0.1": ${r3(mins("sf0.1"))}""",
        s""""sf1": ${r3(mins("sf1"))}""",
        s""""sf10": ${r3(mins("sf10"))}""",
        s""""spread_sf10": ${r3(big.max - big.min)}""",
        s""""ratio_sf1_over_sf0.1": ${r3(mins("sf1") / mins("sf0.1"))}""",
        s""""ratio_sf10_over_sf1": ${r3(mins("sf10") / mins("sf1"))}""")
      s""" "$q": {\n  ${fields.mkString(",\n  ")}\n }"""
    }
    val legsJson = Legs.map { case (l, d) => s"""  "$l": "$d"""" }
      .mkString(",\n")
    val json =
      s"""{
         | "metric": "scale_probe",
         | "unit": "sec",
         | "reps": $reps,
         | "legs": {
         |$legsJson
         | },
         | "note": "${Queries.size} scale-critical operators at 1x/10x/100x rows (sf10 = GenScale 100 replicas of sf0.1). Per-leg value is the min of reps; ratio_* are per-10x-row-step time ratios; linear scaling = 10.0.",
         | "queries": {
         |${items.mkString(",\n")}
         | }
         |}""".stripMargin
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_scale_probe.json"), json + "\n")
    println(json)
    spark.stop()
  }
}

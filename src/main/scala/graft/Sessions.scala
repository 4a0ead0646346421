package graft

import org.apache.spark.sql.SparkSession

/** The one local-session recipe every entry point (Verify, Bench, the
  * plan tools, the test suite) shares: UTC, legacy ns-as-long parquet
  * compat (lets an INT64-nanos events file still load; current testdata
  * is TIMESTAMP(MICROS) and Tables.normalize keys on the OBSERVED type
  * either way), no timestamp-NTZ inference, UI off, and the graft
  * optimizer extensions. Centralized so a config or extension change
  * cannot drift between the benchmark, the correctness gate, and the
  * diagnostics that explain them.
  */
object Sessions {
  def local(cores: String, shufflePartitions: String): SparkSession =
    SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      // several stages sit near or above the default 100-field codegen
      // cap, which silently drops a stage out of whole-stage codegen:
      // the quality evaluator's ~100-aggregate approx pass, the
      // profiler's recombination projection (~50 stats × all columns),
      // and any future wide declarative aggregate. The cap is only an
      // eligibility gate — Janino splits oversized methods and a stage
      // whose generated code still fails to compile falls back
      // per-stage — so a high cap is safe. (The profiler's SCAN passes
      // are deliberately narrow regardless: see Profiler's scaladoc on
      // the ~8 KB JIT method threshold, which no conf can raise.)
      .config("spark.sql.codegen.maxFields", "4000")
      // the generated-class cache defaults to 100 entries, but ONE
      // profiler invocation alone creates ~100 compilation units (one
      // per-column pass × {partial, final} + exchange projections), so
      // any two coexisting profile plans thrash the cache and every
      // invocation re-pays ~10 s of Janino compilation (measured by
      // CodegenMetrics: 495 compiles / 74 s across five sf0.1 profile
      // runs, with exec1 swinging 7 s ↔ 37 s run-to-run as entries were
      // evicted). The cache holds compiled classes — small — so a large
      // bound trades a few MB of driver heap for compile-once behavior
      // across the 129-query bench sweep.
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      // by default the per-query codegen STAGE ID is baked into the
      // generated class name, so two textually identical units at
      // different plan positions (e.g. the profiler's canonicalized
      // per-column passes, or the same stage re-planned by AQE in a
      // different order) miss the cache and recompile. With the id off,
      // equal bodies share one compiled class; the stage id still
      // appears in comments/metrics for debugging.
      .config("spark.sql.codegen.useIdInClassName", "false")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
}

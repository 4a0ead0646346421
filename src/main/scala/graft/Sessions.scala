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
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
}

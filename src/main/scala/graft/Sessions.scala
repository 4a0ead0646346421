package graft

import org.apache.spark.sql.SparkSession

/** The one local-session recipe every entry point (Verify, Bench, the
  * plan tools, the test suite) shares: UTC, ns-as-long parquet reads
  * (events.ts), no timestamp-NTZ inference, UI off, and the graft
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
      // the profiler's base pass is one declarative aggregate of ~50
      // stats × all columns; the default 100-field cap silently drops it
      // out of whole-stage codegen (interpreted eval measured ~20× slower
      // at sf0.1). Janino splits oversized methods, and any stage that
      // still fails to compile falls back per stage — so a high cap is
      // safe.
      .config("spark.sql.codegen.maxFields", "4000")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
}

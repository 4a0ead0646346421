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
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
}

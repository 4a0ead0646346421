package graft.tools

/** Round-15 measurement (guide §1): per-PASS decomposition of one
  * profile invocation. The profiler runs ~50 one-row aggregate passes
  * concurrently (ConcurrentPasses); the wall clock of the whole profile
  * is ≈ the slowest pass WAVE, so the optimization target is the
  * slowest individual passes — this probe times each pass solo (second
  * run reported; codegen warm) and the full concurrent collect for
  * context.
  *
  * Usage: runMain graft.tools.ProfPassProbe <table> [reps]
  */
object ProfPassProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val table = args.headOption.getOrElse("lineitem")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(2)
    val df = graft.Tables.load(spark, dir, table)
    val passes = graft.profile.Profiler.passesFor(df,
      distincts = "exact", exactPercentiles = true)
    // identify each pass by its first output column (the per-column
    // rename carries the ordinal) and its shape
    def label(p: org.apache.spark.sql.DataFrame): String =
      p.columns.take(2).mkString(",") +
        (if (p.columns.length > 2) s"(+${p.columns.length - 2})" else "")
    passes.foreach(_.collect()) // warm: codegen + page cache
    val timed = passes.map { p =>
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); p.collect()
        (System.nanoTime() - t0) / 1e9
      }
      (ts.min, label(p))
    }
    timed.sortBy(-_._1).foreach { case (t, l) =>
      println(f"$t%6.3f s  $l")
    }
    println(f"sum of solo minima: ${timed.map(_._1).sum}%.2f s")
    val t0 = System.nanoTime()
    graft.profile.Profiler.profile(df, table).collect()
    println(f"full concurrent profile: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}

package graft.tools
object PlanPhases {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    args.foreach { name =>
      def t[A](f: => A): (A, Double) = {
        val t0 = System.nanoTime(); val a = f
        (a, (System.nanoTime() - t0) / 1e9)
      }
      val (df, tBuild) = t(graft.SparkEntry.queries(name)(spark, dir))
      val (_, tAna) = t(df.queryExecution.analyzed)
      val (_, tOpt) = t(df.queryExecution.optimizedPlan)
      val (_, tPhys) = t(df.queryExecution.executedPlan)
      println(f"$name: build $tBuild%.2f analyze $tAna%.2f optimize $tOpt%.2f physical $tPhys%.2f")
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf1 scale-gate data generator: replicates the driver's sf0.1 tables
  * ×10 with per-replica key offsets, preserving the star schema's
  * referential integrity (every key column in a replica shifts by the
  * same stride, so joins land inside the replica) and per-table value
  * distributions. Two columns get per-replica DECORRELATION so
  * similarity densities scale linearly instead of quadratically by
  * construction:
  *
  *  - `documents.text`: deterministic hash-sort word permutation per
  *    (doc, replica) — word counts, vocabulary, and lengths survive;
  *    shingle sets across replicas decorrelate, so near-dup pair counts
  *    grow with rows, not rows² (10 verbatim copies of every document
  *    would make every cross-replica pair a planted near-dup).
  *  - `embeddings.embedding`: rotate the vector by a per-replica number
  *    of dimensions — norms and component distributions survive
  *    exactly; cross-replica cosines fall to background level.
  *
  * This is BENCH data (no oracle runs at sf1): the gate measures how
  * each operator's runtime scales with a 10× row count.
  */
object GenScale {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "/root/repo/testdata_sf1"
    // replica count as args(2): 10 = the sf1 gate corpus; 100 = the
    // sf10 scale-curve probe corpus (r12 verdict #6)
    val replicas = if (args.length > 2) args(2).toInt else 10
    val stride = 100000000L
    val spark = graft.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"),
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("WARN")

    def raw(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")

    /** Union of `replicas` copies with each listed key column offset by
      * replica * stride and optional per-replica column rewrites.
      */
    def scale(t: String, keyCols: Seq[String],
              rewrite: (DataFrame, Int) => DataFrame = (d, _) => d)
             : DataFrame = {
      val base = raw(t)
      (0 until replicas).map { i =>
        val shifted = keyCols.foldLeft(base) { (d, k) =>
          d.withColumn(k, col(k) + lit(i * stride))
        }
        rewrite(shifted, i)
      }.reduce(_ unionByName _)
    }

    def write(t: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"[genscale] $t: ${spark.read.parquet(s"$out/$t.parquet").count()} rows")
    }

    // dimension tables stay as-is (25 nations / 5 regions at any sf)
    write("region", raw("region"))
    write("nation", raw("nation"))
    write("customer", scale("customer", Seq("c_custkey")))
    write("supplier", scale("supplier", Seq("s_suppkey")))
    write("part", scale("part", Seq("p_partkey")))
    write("orders", scale("orders", Seq("o_orderkey", "o_custkey")))
    write("lineitem",
      scale("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey")))
    // ts stays raw int64 nanos; Tables.load's tsns handling applies to
    // the scaled dir exactly as to the source
    write("events", scale("events", Seq("event_id", "user_id")))
    write("documents", scale("documents", Seq("doc_id"),
      (d, i) => if (i == 0) d else d.withColumn("text",
        expr(s"""array_join(transform(array_sort(transform(
                |  split(text, '\\\\s+'),
                |  w -> struct(xxhash64(w, doc_id, $i) AS h, w AS w))),
                |  s -> s.w), ' ')""".stripMargin))))
    write("embeddings", scale("embeddings", Seq("vec_id"),
      (d, i) => {
        val k = (i * 7) % 64
        if (k == 0) d
        else d.withColumn("embedding",
          expr(s"concat(slice(embedding, ${k + 1}, ${64 - k}), " +
            s"slice(embedding, 1, $k))"))
      }))
    spark.stop()
  }
}

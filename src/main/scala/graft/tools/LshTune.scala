package graft.tools

import graft.sim.Similarity

/** Parameter sweep for the banded-LSH near-dup tier: prints recall vs
  * the exact tier and the candidate-pruning factor for a grid of
  * (bands, planesPerBand) on the real embeddings table — run this when
  * retuning for a different similarity threshold or corpus.
  *   sbt "runMain graft.tools.LshTune <sfDir> [tau]"
  */
object LshTune {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val tau = args.lift(1).map(_.toDouble).getOrElse(0.4)
    val spark = graft.Sessions.local("8", "8")
    spark.sparkContext.setLogLevel("ERROR")
    val e = graft.Tables.load(spark, sfDir, "embeddings")
    val n = e.count()
    val allPairs = n * (n - 1) / 2
    val exact = Similarity.cosineNearDupPairs(e, "vec_id", "embedding", tau)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"n=$n allPairs=$allPairs tau=$tau exactPairs=${exact.size}")
    for (r <- Seq(2, 3, 4); b <- Seq(6, 8, 12, 15)) {
      val got = Similarity
        .cosineNearDupPairsLsh(e, "vec_id", "embedding", tau, 64, b, r)
        .select("id_a", "id_b").collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
      val recall =
        if (exact.isEmpty) "n/a (no exact pairs at this tau)"
        else f"${(exact & got).size.toDouble / exact.size}%.3f"
      val cand = Similarity
        .lshCandidatePairs(e, "vec_id", "embedding", 64, b, r).count()
      println(f"r=$r b=$b recall=$recall cand=$cand " +
        f"prune=${cand.toDouble / allPairs}%.3f")
    }
    spark.stop()
  }
}

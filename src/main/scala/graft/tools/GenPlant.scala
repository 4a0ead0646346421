package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Plants KNOWN recall targets into the sf1 scale corpus (VERDICT r7
  * "Next round #3"): GenScale decorrelates replicas by design, so at sf1
  * the capped dedup/ANN tiers only ever ran against empty-or-tiny true-
  * pair sets — their recall was measured only at sf0.01/spec scale,
  * never where `LshMaxBucket` / `AnnProdMaxBucket` actually bind. This
  * tool appends deterministic planted families to a scaled dir's
  * documents/embeddings tables; `RecallGate` then measures each capped
  * operator's recall against the planted ground truth at sf1.
  *
  * Planted structure (ids from [[PlantBase]], disjoint from every scaled
  * id — GenScale's max id is replica 9 × stride 1e8 + source ids):
  *
  *  - near-dup TEXT families for the minhash tier, sizes spanning the
  *    [[graft.text.Dedup.LshMaxBucket]] = 128 cap: 8 and 64 (buckets
  *    under the cap — recall floor applies) and 600 high-similarity
  *    variants whose dominant per-band buckets exceed the cap (the
  *    documented degraded regime — measured, not asserted).
  *  - embedding CLUSTERS for the semantic-dedup prod tier (8×8 bands,
  *    cap [[graft.queries.TextQueries.AnnProdMaxBucket]] = 64): sizes
  *    16 (under cap) and 2000 (tight cluster whose band buckets exceed
  *    even the ADAPTIVE cap — 16 x background density, the round-8
  *    recalibration this gate itself forced). Cluster members also get
  *    near-dup TEXTS at the same
  *    ids so the lexical confirm tier passes — and those texts double
  *    as two more minhash families.
  *
  * Every variant/edit is a deterministic function of (family, member) —
  * no RNG state escapes a single member — so the ground truth needs no
  * side file: membership IS the id range, re-derivable by RecallGate
  * from the constants below.
  */
object GenPlant {

  val PlantBase = 5000000000L
  val FamilyStride = 100000L

  /** (name, family index, size, words per doc, vocab size, edits per
    * variant). Families 0-2 are text-only (minhash recall); families
    * 3-4 are the embedding clusters (semantic prod + ann recall) whose
    * texts are generated the same way.
    */
  val TextFamilies: Seq[(String, Int, Int, Int, Int, Int)] = Seq(
    ("nd_small", 0, 8, 60, 80, 4),
    ("nd_med", 1, 64, 60, 80, 4),
    ("nd_cap", 2, 600, 60, 80, 1),
    ("cl_norm", 3, 16, 60, 80, 4),
    ("cl_cap", 4, 2000, 60, 80, 4))

  /** Embedding clusters: (family index, size, noise scale). */
  val EmbClusters: Seq[(Int, Int, Double)] =
    Seq((3, 16, 0.05), (4, 2000, 0.05))

  val Dim = 64

  def idOf(family: Int, member: Int): Long =
    PlantBase + family * FamilyStride + member

  /** Member `j`'s word sequence: the family base (words pf<f>w<i> from a
    * family-private vocabulary — planted shingles never collide with
    * corpus shingles) with `edits` deterministic substitutions at
    * positions/(replacement indices) unique per member, so no two
    * members are identical and pairwise bigram Jaccard stays high
    * (1 edit ⇒ J ≈ 0.87, 4 edits ⇒ J ≈ 0.57 — both above the 0.4
    * verify threshold).
    */
  def memberWords(family: Int, member: Int, nWords: Int, vocab: Int,
                  edits: Int): Seq[String] = {
    val base = (0 until nWords).map(i => s"pf${family}w${i % vocab}")
    if (member == 0) base
    else (0 until edits).foldLeft(base) { (w, e) =>
      val pos = (member * edits + e) % nWords
      // replacement index derived from (member / nWords) so the
      // (position, replacement) pair is unique per member; +vocab/2
      // offset makes it differ from the base word at that position
      val repl = (member / nWords + member + e * 13 + vocab / 2) % vocab
      w.updated(pos, s"pf${family}r$repl")
    }
  }

  /** Member `j`'s embedding: the family base direction plus a
    * perturbation of NORM ≈ `noise` (a per-member deterministic
    * gaussian scaled by noise/√Dim — without the √Dim normalization a
    * per-component 0.05 gaussian has norm 0.4 in 64 dims and pairwise
    * cosines land at ≈ 0.86, BELOW the 0.9 prod threshold; the first
    * RecallGate run caught exactly that). With the normalization,
    * pairwise cosines sit at ≈ 1 − noise² ≈ 0.9975.
    */
  def memberVec(family: Int, member: Int, noise: Double): Array[Float] = {
    def gauss(rng: scala.util.Random, n: Int): Array[Double] =
      Array.fill(n)(rng.nextGaussian())
    val base = gauss(new scala.util.Random(9000L + family), Dim)
    val nrm = math.sqrt(base.map(x => x * x).sum)
    val unit = base.map(_ / nrm)
    val jitter = gauss(new scala.util.Random(
      9100L + family * 1000L + member), Dim)
    val s = noise / math.sqrt(Dim.toDouble)
    val v = unit.zip(jitter).map { case (u, g) => u + s * g }
    val vn = math.sqrt(v.map(x => x * x).sum)
    v.map(x => (x / vn).toFloat)
  }

  def plantedDocs(spark: SparkSession): DataFrame = {
    import spark.implicits._
    TextFamilies.flatMap { case (_, f, size, nW, vocab, edits) =>
      (0 until size).map { j =>
        val text = memberWords(f, j, nW, vocab, edits).mkString(" ")
        (idOf(f, j), text, "en", "planted", text.length.toLong)
      }
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  def plantedEmbeddings(spark: SparkSession): DataFrame = {
    import spark.implicits._
    EmbClusters.flatMap { case (f, size, noise) =>
      (0 until size).map { j =>
        (idOf(f, j), memberVec(f, j, noise).toSeq, f)
      }
    }.toDF("vec_id", "embedding", "label")
  }

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/repo/testdata_sf1"
    val out = if (args.length > 1) args(1)
              else "/root/repo/testdata_sf1_planted"
    val spark = graft.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"),
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$src/documents.parquet")
      .unionByName(plantedDocs(spark).withColumn("n_chars",
        col("n_chars").cast("long")))
    docs.write.mode("overwrite").parquet(s"$out/documents.parquet")
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
      .unionByName(plantedEmbeddings(spark)
        .withColumn("embedding", col("embedding").cast("array<float>"))
        .withColumn("label", col("label").cast("int")))
    emb.write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    println(s"[genplant] documents: " +
      spark.read.parquet(s"$out/documents.parquet").count() +
      " rows, embeddings: " +
      spark.read.parquet(s"$out/embeddings.parquet").count() + " rows")
    spark.stop()
  }
}

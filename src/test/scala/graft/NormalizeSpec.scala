package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.{NfcNormalize, NfcText}
import graft.text.{Curation, TextOps}
import graft.queries.TextQueries

/** The text-fixing hygiene pass ([[TextOps.fixText]] over the native
  * [[NfcNormalize]] expression) and the hashed linear quality
  * classifier ([[Curation.classifierScore]]).
  */
class NormalizeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def nfcDf(s: String): String =
    Seq(Tuple1(s)).toDF("t")
      .select(NfcNormalize.nfc(col("t"))).collect()(0).getString(0)

  test("NFC expression matches java.text.Normalizer on decomposed, " +
      "singleton, and reordering cases (codegen DataFrame path)") {
    val cases = Seq(
      "Cafe\u0301 du cre\u0300me bru\u0302le\u0301e", // NFD accents
      "ohm sign \u2126 and angstrom \u212b",          // singleton maps
      "combining e\u0301\u0327 order test",           // ccc reordering
      "plain ascii stays put",
      "")
    cases.foreach { c =>
      assert(nfcDf(c) ==
        java.text.Normalizer.normalize(c, java.text.Normalizer.Form.NFC))
    }
    // the reordering case must compose e+cedilla (U+0229) then acute
    assert(nfcDf("e\u0301\u0327") == "\u0229\u0301")
  }

  test("NFC interpreted path and fast path: already-normalized input " +
      "returns the SAME UTF8String instance (no realloc)") {
    val s = UTF8String.fromString("already normalized")
    assert(NfcText.nfc(s) eq s)
    val d = UTF8String.fromString("Cafe\u0301")
    assert(NfcText.nfc(d).toString == "Caf\u00e9")
  }

  test("NFC expression propagates null") {
    val out = Seq(Tuple1(Option.empty[String])).toDF("t")
      .select(NfcNormalize.nfc(col("t"))).collect()(0)
    assert(out.isNullAt(0))
  }

  test("fixText strips control chars, collapses space runs, and is " +
      "idempotent on every planted row") {
    val df = spark.createDataFrame(TextQueries.NormPlanted)
      .toDF("doc_id", "text")
    val once = df.select(col("doc_id"), TextOps.fixText(col("text")).as("f"))
    val twice = once.select(col("doc_id"), TextOps.fixText(col("f")).as("f2"),
      col("f"))
    twice.collect().foreach { r =>
      assert(r.getString(1) == r.getString(2), s"not idempotent: $r")
    }
    val byId = once.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // \u0001 sat between "and" and "ctl" with no space: stripping it
    // JOINS the words \u2014 content repair is out of scope for a strip pass
    assert(byId(1000000003L) == "bell andctl and DEL chars")
    assert(byId(1000000004L) == "double spaces collapse here")
    assert(byId(1000000005L) == "ohm sign \u03a9 and angstrom \u00c5")
  }

  test("normalize_text gate is non-vacuous: every planted row except " +
      "the clean one reports changed=1") {
    val out = TextQueries.normalizeText(spark, SparkTestSession.sf)
      .filter(col("doc_id") >= 1000000000L).collect()
      .map(r => r.getLong(0) -> r.getInt(3)).toMap
    assert(out == Map(1000000001L -> 1, 1000000002L -> 0,
      1000000003L -> 1, 1000000004L -> 1, 1000000005L -> 1,
      1000000006L -> 1))
  }

  // mirror of the classifier's weight definition, hand-evaluated
  private def weight(word: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(word.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(6)
    val bucket = java.lang.Long.parseLong(hex, 16) % Curation.ClassifierBuckets
    (bucket * Curation.ClassifierMult) % Curation.ClassifierMod -
      (Curation.ClassifierMod - 1) / 2
  }

  test("classifier raw score is the exact integer sum of hashed bucket " +
      "weights; margin normalized to [-1, 1]; kept = margin >= threshold") {
    val docs = Seq((1L, "a bb"), (2L, "the quick brown fox"),
      (3L, "zzz")).toDF("doc_id", "text")
    val out = Curation.classifierScore(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getInt(4))).toMap
    val expRaw1 = weight("a") + weight("bb")
    assert(out(1L)._1 == 2L && out(1L)._2 == expRaw1)
    val exp2 = Seq("the", "quick", "brown", "fox").map(weight).sum
    assert(out(2L)._2 == exp2)
    out.values.foreach { case (n, raw, margin, kept) =>
      assert(margin >= -1.0 && margin <= 1.0)
      assert(math.abs(margin - raw.toDouble / (98.0 * n)) < 1e-4 + 1e-9)
      assert(kept == (if (margin >= Curation.ClassifierThreshold) 1 else 0))
    }
  }

  test("classifier splits the corpus non-vacuously at the threshold") {
    val out = TextQueries.classifierQuality(spark, SparkTestSession.sf)
    val kept = out.groupBy("kept").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(kept.getOrElse(1, 0L) > 0 && kept.getOrElse(0, 0L) > 0,
      s"degenerate split: $kept")
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.MediaQueries

/** The streaming media ingest front door: arriving PNG payloads are
  * decoded (malformed → quarantine), dHashed, and banded-joined against
  * the standing corpus's band index stream-static. The driver oracle
  * pins the full output hash; this spec pins the semantic contract
  * pieces — the plant classes land where the design says they must.
  */
class MediaIngestSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val Sf = "/root/testdata/sf0.001"

  /** Scala twin of the 0-99 md5 split bucket (TextQueries
    * .SplitBucketSql / Curation.deterministicSplit): first 6 hex chars
    * of md5(doc_id as string), base 16, mod 100.
    */
  private def bucketOf(d: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(d.toString.getBytes("US-ASCII"))
    (((md(0) & 0xffL) << 16) | ((md(1) & 0xffL) << 8) |
      (md(2) & 0xffL)) % 100
  }

  test("front door routes every arriving doc: quarantine ⇔ corruption " +
      "plant, corpus-sourced near-dup plants land as dup, rest new") {
    val rows = MediaQueries.queries("stream_media_ingest_bounded")(
        spark, Sf)
      .collect()
    assert(rows.nonEmpty)
    // exactly the streamed slice arrives
    assert(rows.map(_.getLong(0)).forall(bucketOf(_) >= 90))
    rows.foreach { r =>
      val d = r.getLong(0)
      val status = r.getString(1)
      assert(Set("quarantined", "dup", "new")(status), s"doc $d: $status")
      if (d % 10 == 4)
        assert(status == "quarantined" && r.getString(2) == "bad_magic")
      else if (d % 10 == 7)
        assert(status == "quarantined" && r.getString(2) == "corrupt")
      else {
        assert(r.isNullAt(2), s"doc $d: reason on non-corrupt row")
        if (d % 10 == 3 && d >= 10 && bucketOf(d - 3) < 90)
          // planted near-dup whose source landed in the corpus slice
          assert(status == "dup" && r.getLong(4) <= MediaQueries.NdMaxHamming,
            s"doc $d: planted corpus dup not caught ($status)")
        if (status == "dup")
          assert(!r.isNullAt(3) && r.getLong(4) <= MediaQueries.NdMaxHamming
            && bucketOf(r.getLong(3)) < 90,
            s"doc $d: dup_of must be a corpus doc within the threshold")
        if (status == "new")
          assert(r.isNullAt(3) && r.isNullAt(4))
      }
    }
    // the gate is non-vacuous at this SF: all three classes occur
    val statuses = rows.map(_.getString(1)).toSet
    assert(statuses == Set("quarantined", "dup", "new"))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Webhook, WebhookReceiver}

class WebhookSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("webhook delivery: injected failure is retried, a full replay " +
      "dedups on idempotency keys, content parity holds") {
    import spark.implicits._
    val rows = (1 to 250).map(i => s"""{"id":$i,"v":"x$i"}""")
    val lines = rows.toDS().repartition(3).localCheckpoint(true)
    val rx = new WebhookReceiver(injectFailures = 1)
    try {
      Webhook.deliverLines(lines, rx.url, 100, replayTag = 7)
      assert(rx.injected == 1, "injection must have fired")
      val firstPosts = rx.posts
      val chunks = rx.storedChunks
      // despite the 503, every line landed exactly once
      assert(rx.lines.toSet == rows.toSet)
      assert(rx.duplicates == 0)
      // EPOCH REPLAY: same materialized partitions + same tag → same
      // keys → the receiver ACKs every chunk without storing twice
      Webhook.deliverLines(lines, rx.url, 100, replayTag = 7)
      assert(rx.storedChunks == chunks, "replay must not add chunks")
      assert(rx.duplicates == chunks,
        s"every replayed chunk must be seen as a duplicate " +
          s"(${rx.duplicates} of $chunks)")
      assert(rx.lines.toSet == rows.toSet)
      assert(rx.posts == firstPosts + chunks)
      // a DIFFERENT tag means different keys — stored as new chunks
      // (the caller's contract: a replay must reuse the tag)
      Webhook.deliverLines(lines, rx.url, 100, replayTag = 8)
      assert(rx.storedChunks == 2 * chunks)
    } finally rx.stop()
  }

  test("webhook delivery: a permanently failing endpoint exhausts " +
      "retries and fails LOUDLY, never drops actions silently") {
    import spark.implicits._
    val rx = new WebhookReceiver(injectFailures = Int.MaxValue)
    try {
      val lines = Seq("""{"id":1}""").toDS().localCheckpoint(true)
      val e = intercept[org.apache.spark.SparkException] {
        Webhook.deliverLines(lines, rx.url, 100, replayTag = 0)
      }
      val root = Option(e.getCause).getOrElse(e)
      assert(root.getMessage.contains("failed after") ||
        e.getMessage.contains("failed after"), e.getMessage)
      assert(rx.posts == Webhook.MaxAttempts,
        s"expected ${Webhook.MaxAttempts} attempts, saw ${rx.posts}")
      assert(rx.storedChunks == 0)
    } finally rx.stop()
  }
}

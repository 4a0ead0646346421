package graft.sources

import java.net.InetSocketAddress
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.Dataset

/** WEBHOOK delivery of rule actions over HTTP — the transport half the
  * chunked sink ([[Sources.foreachBatchedKeyed]]) stopped short of
  * (r13 verdict #7). The reference CALLs webhooks: rule actions POST
  * to an HTTP endpoint wrapped in retries-with-backoff
  * (dk-installer.py:1273-1281) and the demo pacing posts outcomes in
  * batches of 100 per request (demo_helper.py:803-816, :1894,:1908).
  *
  * At-least-once contract, two layers (the same split as
  * [[graft.streaming.StreamingOps.deliverBatchedIdempotent]]):
  *
  *  1. every POST carries a deterministic `Idempotency-Key` header —
  *     (replay tag, partition id, chunk index) — so ANY re-send (task
  *     retry, epoch replay, a timeout whose response was lost after
  *     the server committed) is recognizable at the receiver, which
  *     ACKs duplicates without storing them twice;
  *  2. the sender retries each chunk on connect failure / 5xx with
  *     exponential backoff and re-throws after `MaxAttempts` — a dead
  *     endpoint fails the job loudly instead of dropping actions.
  *
  * Scale shape: the sender runs per PARTITION on the executors (one
  * HttpClient per partition, rows never pass through the driver);
  * parallelism = partition count, which the caller sizes to what the
  * receiving API can absorb — the same knob as [[JdbcSink.upsert]].
  * Chunks are JSON-lines bodies (Spark's `toJSON` emits one-line
  * documents — embedded newlines are escaped inside the JSON string),
  * so the receiver can split, store, and re-parse without a streaming
  * JSON parser.
  */
object Webhook {

  val MaxAttempts = 5

  /** POST one body with retry-with-backoff. Retries on connect/IO
    * failure and on any 5xx; a 4xx is a contract bug and fails fast.
    */
  private[sources] def postWithRetry(client: HttpClient, url: String,
                                     key: String, body: String): Unit = {
    var attempt = 0
    var done = false
    while (!done) {
      attempt += 1
      val outcome =
        try {
          val req = HttpRequest.newBuilder(java.net.URI.create(url))
            .header("Content-Type", "application/x-ndjson")
            .header("Idempotency-Key", key)
            .POST(HttpRequest.BodyPublishers.ofString(body, UTF_8))
            .build()
          val rsp = client.send(req, HttpResponse.BodyHandlers.ofString())
          if (rsp.statusCode() < 300) Right(())
          else if (rsp.statusCode() >= 500)
            Left(s"status ${rsp.statusCode()}")
          else throw new IllegalStateException(
            s"webhook rejected chunk $key: ${rsp.statusCode()} ${rsp.body()}")
        } catch {
          case e: java.io.IOException => Left(e.getMessage)
        }
      outcome match {
        case Right(()) => done = true
        case Left(why) if attempt < MaxAttempts =>
          Thread.sleep(25L << attempt)
        case Left(why) =>
          throw new java.io.IOException(
            s"webhook delivery of chunk $key failed after $attempt " +
              s"attempts: $why")
      }
    }
  }

  /** Probe-only alias of [[postWithRetry]] (tools/WebhookProbe times
    * the exact production post path without widening its visibility).
    */
  private[graft] def probePost(client: HttpClient, url: String,
                               key: String, body: String): Unit =
    postWithRetry(client, url, key, body)

  /** Deliver a Dataset of one-line JSON documents to `url` in chunks of
    * `batchSize` lines per POST (the reference's 100/post pacing), each
    * POST keyed `replayTag-partition-chunk`. Call twice with the SAME
    * `replayTag` over the SAME materialized partitions to model an
    * epoch replay: every chunk re-sends under its original key and the
    * receiver's dedup absorbs it.
    */
  def deliverLines(lines: Dataset[String], url: String, batchSize: Int,
                   replayTag: Long): Unit =
    lines.foreachPartition { it: Iterator[String] =>
      if (it.hasNext) {
        val client = HttpClient.newHttpClient()
        val pid = org.apache.spark.TaskContext.getPartitionId()
        it.grouped(batchSize).zipWithIndex.foreach { case (g, ci) =>
          postWithRetry(client, url, s"$replayTag-$pid-$ci",
            g.mkString("\n"))
        }
      }
    }
}

/** In-JVM HTTP receiver for the webhook gate: stores each POST body
  * under its `Idempotency-Key` (putIfAbsent — a duplicate key is ACKed
  * 200 but not stored twice), counts duplicates, and can INJECT
  * `injectFailures` one-shot 503s (the first attempts to arrive) so a
  * gate proves the sender's retry actually redelivers. Local-mode
  * executors reach it at 127.0.0.1:ephemeral; in production the
  * receiver is the user's endpoint and this class is the test double.
  */
final class WebhookReceiver(injectFailures: Int = 0) {
  // r14 perf: the HttpServer response is two socket writes (headers,
  // then the tiny body); with Nagle on, the body write stalls behind
  // the client's DELAYED ACK on every KEEP-ALIVE request — measured
  // ~45-50 ms per POST on loopback whatever the client does
  // (tools/WebhookProbe: shared JDK client 50 ms, raw NODELAY
  // keep-alive socket 45 ms, fresh connection per post 9-12 ms). The
  // JDK's documented escape hatch is the `sun.net.httpserver.nodelay`
  // property, read at ServerConfig class-init — set it before the
  // first HttpServer in this JVM is created. Post-fix: ~0.2 ms/post.
  WebhookReceiver.ensureNoDelay()
  private val store = new ConcurrentHashMap[String, String]()
  private val failBudget = new AtomicInteger(injectFailures)
  private val injectedCount = new AtomicInteger(0)
  private val duplicateCount = new AtomicInteger(0)
  private val postCount = new AtomicLong(0L)

  private val server: HttpServer =
    HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
  // daemon pool, and shut down in stop(): server.stop() leaves a
  // user-supplied executor running, and non-daemon pool threads would
  // pin the whole JVM open after the gate finishes
  private val pool = java.util.concurrent.Executors.newFixedThreadPool(4,
    (r: Runnable) => { val t = new Thread(r); t.setDaemon(true); t })
  server.setExecutor(pool)
  server.createContext("/hook", (x: HttpExchange) => {
    try {
      val body = new String(x.getRequestBody.readAllBytes(), UTF_8)
      val key = Option(x.getRequestHeaders.getFirst("Idempotency-Key"))
        .getOrElse("")
      postCount.incrementAndGet()
      if (x.getRequestMethod != "POST" || key.isEmpty) {
        respond(x, 400, "POST with Idempotency-Key required")
      } else if (failBudget.getAndDecrement() > 0) {
        // one-shot injected failure: NOT stored — the sender must
        // retry this chunk under the same key for it to ever land
        injectedCount.incrementAndGet()
        respond(x, 503, "injected failure")
      } else {
        if (store.putIfAbsent(key, body) != null)
          duplicateCount.incrementAndGet()
        respond(x, 200, "ok")
      }
    } finally x.close()
  })
  server.start()

  private def respond(x: HttpExchange, code: Int, msg: String): Unit = {
    val b = msg.getBytes(UTF_8)
    x.sendResponseHeaders(code, b.length.toLong)
    x.getResponseBody.write(b)
  }

  /** Endpoint url for senders. */
  def url: String =
    s"http://127.0.0.1:${server.getAddress.getPort}/hook"

  /** Every stored line across all deduped chunk bodies. */
  def lines: Seq[String] = {
    import scala.jdk.CollectionConverters._
    store.values().asScala.toSeq.flatMap(_.split("\n")).filter(_.nonEmpty)
  }

  def injected: Int = injectedCount.get()
  def duplicates: Int = duplicateCount.get()
  def posts: Long = postCount.get()
  def storedChunks: Int = store.size()

  def stop(): Unit = { server.stop(0); pool.shutdown() }
}

object WebhookReceiver {
  // the JDK reads the property ONCE, at ServerConfig class-init — if
  // any com.sun HttpServer was created earlier in this JVM, setting it
  // now is silently ignored and the ~45 ms/post keep-alive stall
  // returns with no signal (r14 advice). Detect that: when ServerConfig
  // is ALREADY initialized at our first call, log the attribution line
  // so a perf regression in the webhook gate is explainable from the
  // log instead of needing a re-bisect.
  private def ensureNoDelay(): Unit = {
    val alreadyInit =
      try {
        // loads without initializing; returns null iff not yet loaded
        val cl = classOf[HttpServer].getClassLoader
        val m = classOf[ClassLoader].getDeclaredMethod(
          "findLoadedClass", classOf[String])
        m.setAccessible(true)
        m.invoke(cl, "sun.net.httpserver.ServerConfig") != null
      } catch { case _: Throwable => false }
    if (System.getProperty("sun.net.httpserver.nodelay") == null) {
      System.setProperty("sun.net.httpserver.nodelay", "true")
      if (alreadyInit)
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          "sun.net.httpserver.nodelay was set AFTER an HttpServer " +
            "already initialized in this JVM — the property is read " +
            "once at class-init, so keep-alive POSTs to this receiver " +
            "may stall ~45 ms each behind delayed ACKs")
    }
  }
}

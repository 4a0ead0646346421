package graft.jobs

/** Bounded retry with exponential backoff — the ingest-shell pattern of the
  * reference (reference dk-installer.py:832-854 bounded retries,
  * :1273-1281 2^n-second backoff). The sleeper is injectable so tests run
  * without wall-clock waits.
  */
object Retry {

  def withRetries[T](attempts: Int, baseBackoffMs: Long = 1000,
                     sleeper: Long => Unit = Thread.sleep)(body: => T): T = {
    require(attempts >= 1)
    var n = 0
    while (true) {
      try return body
      catch {
        case e: Throwable =>
          n += 1
          if (n >= attempts) throw e
          sleeper(baseBackoffMs * (1L << (n - 1)))
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

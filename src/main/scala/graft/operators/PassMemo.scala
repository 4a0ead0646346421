package graft.operators

import org.apache.spark.sql.DataFrame

/** Bounded memo of BUILT one-row pass frames (r15, guide §1.2 driver
  * work): a profile/suite evaluation spends seconds of pure driver time
  * building, analyzing and planning its ~30 fresh pass DataFrames per
  * invocation, while the pass set is a pure function of (input plan,
  * parameters). Re-invocations with a structurally identical input
  * reuse the built frames.
  *
  * Key = (owning session BY REFERENCE, the input's CANONICALIZED
  * analyzed plan — exprId-normalized structural equality; parquet
  * relations compare by root path, the immutable-inputs-within-a-
  * session posture of every Spark plan cache) + a caller-supplied
  * params component (value equality — e.g. the compiled TestDef list).
  *
  * This caches PLANS, never results: every invocation re-executes
  * every scan/aggregate job against the inputs — the same reuse class
  * as Spark's generated-class cache one layer down. True-LRU, bounded
  * (64 entries); per-micro-batch streaming callers have distinct batch
  * plans and churn one slot.
  */
object PassMemo {
  private val memo = new java.util.LinkedHashMap[
    (AnyRef, AnyRef, Any), Seq[DataFrame]](16, 0.75f, true)

  def passes(df: DataFrame, params: Any)
            (build: => Seq[DataFrame]): Seq[DataFrame] = {
    val key = (df.sparkSession: AnyRef,
      df.queryExecution.analyzed.canonicalized: AnyRef, params)
    val hit = memo.synchronized(Option(memo.get(key)))
    hit.getOrElse {
      val built = build
      memo.synchronized {
        Option(memo.get(key)).getOrElse {
          while (memo.size >= 64) {
            val it = memo.entrySet().iterator()
            if (it.hasNext) { it.next(); it.remove() }
          }
          memo.put(key, built)
          built
        }
      }
    }
  }
}

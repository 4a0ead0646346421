package graft.events

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Journey-DAG operations. The reference models journeys as directed edges
  * between components (`PUT /journeys/{id}/dag` with `{left, right}` —
  * reference demo/demo/demo_helper.py:252-276) and flags OUT_OF_SEQUENCE
  * instance alerts (:1939-1956).
  *
  * Scale note: journey DAGs are tiny control-plane data (≤ dozens of nodes —
  * demo_helper.py:69-112), so transitive closure via iterative self-join on
  * a broadcastable edge list is the right tool; the result is broadcast into
  * the event-stream join. For million-node graphs you would switch to an
  * iterative Pregel-style loop with checkpointing — not this workload.
  */
object Dag {

  /** Transitive closure (strict — no reflexive pairs) of an edge list
    * DataFrame with columns (src, dst). Iterates to fixpoint.
    */
  def closure(edges: DataFrame): DataFrame = {
    var acc = edges.select("src", "dst").distinct().localCheckpoint(true)
    var grew = true
    while (grew) {
      val next = acc.as("a")
        .join(acc.as("b"), col("a.dst") === col("b.src"))
        .select(col("a.src").as("src"), col("b.dst").as("dst"))
        .unionByName(acc).distinct().localCheckpoint(true)
      grew = next.count() > acc.count()
      acc = next
    }
    acc
  }

  def edgeDf(spark: SparkSession, edges: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    edges.toDF("src", "dst")
  }

  /** Driver-side transitive closure for control-plane-sized DAGs (the
    * reference's journeys have ≤ 5 nodes): same result as [[closure]]
    * with zero Spark jobs — the closure then enters the event join as a
    * broadcast literal. Use [[closure]] when the edge list doesn't fit on
    * the driver.
    */
  def closureLocal(edges: Seq[(String, String)]): Seq[(String, String)] = {
    var acc = edges.toSet
    var grew = true
    while (grew) {
      val next = acc ++ (for {
        (a, b) <- acc; (c, d) <- acc if b == c
      } yield (a, d))
      grew = next.size > acc.size
      acc = next
    }
    acc.toSeq.sorted
  }

  /** The demo journey over event types used by the event-analytics queries:
    * signup → view → click → purchase.
    */
  val FunnelEdges: Seq[(String, String)] =
    Seq(("signup", "view"), ("view", "click"), ("click", "purchase"))

  /** A journey-DAG edge exactly as the reference accepts it
    * (`PUT /journeys/{id}/dag`, demo_helper.py:252-276): both sides
    * present → an ordering constraint left ≺ right; a SINGLE side
    * present (`{left}`-only or `{right}`-only, demo_helper.py:264-271)
    * → the component is a journey MEMBER with no ordering constraint.
    */
  final case class Edge(left: Option[String], right: Option[String])

  /** Every component the journey contains — both sides of ordered edges
    * plus half-open members. Distinct, sorted (deterministic broadcast).
    */
  def members(edges: Seq[Edge]): Seq[String] =
    edges.flatMap(e => e.left ++ e.right).distinct.sorted

  /** Only the fully-specified edges order anything; half-open edges
    * contribute membership, never precedence.
    */
  def orderedPairs(edges: Seq[Edge]): Seq[(String, String)] =
    edges.collect { case Edge(Some(a), Some(b)) => (a, b) }

  /** Demo journey WITH a half-open member: view → click → purchase
    * ordered; `error` registered via a `{left}`-only edge — inside the
    * journey but unordered; `signup` not a member at all.
    */
  val HalfOpenJourney: Seq[Edge] = Seq(
    Edge(Some("view"), Some("click")),
    Edge(Some("click"), Some("purchase")),
    Edge(Some("error"), None))

  /** Three journeys evaluated CONCURRENTLY over one event stream — the
    * reference registers several journeys at once and each instance
    * alert carries its journey (observability_demo.py:4-40 runs three;
    * demo_helper.py:1939-1956 scopes OUT_OF_SEQUENCE per journey).
    * Memberships deliberately differ so per-journey scoping is
    * exercised: the same event stream sessionizes differently under
    * each journey's member filter.
    */
  val MultiJourneys: Seq[(String, Seq[Edge])] = Seq(
    "funnel" -> Seq(
      Edge(Some("signup"), Some("view")),
      Edge(Some("view"), Some("click")),
      Edge(Some("click"), Some("purchase"))),
    "checkout" -> HalfOpenJourney,
    "signup_flow" -> Seq(
      Edge(Some("signup"), Some("view")),
      Edge(Some("purchase"), None)))
}

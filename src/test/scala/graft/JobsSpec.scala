package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.jobs.MultiStepJob
import graft.jobs.MultiStepJob._

class JobsSpec extends AnyFunSuite {

  private class Rec {
    val log = scala.collection.mutable.ArrayBuffer[String]()
  }

  private def step(nm: String, rec: Rec, required0: Boolean = true,
                   body: Ctx => Unit = _ => ()): Step = new Step {
    def name = nm
    override def required = required0
    def execute(ctx: Ctx): Unit = { rec.log += s"run:$nm"; body(ctx) }
    override def onJobSuccess(ctx: Ctx): Unit = rec.log += s"ok:$nm"
    override def onJobFail(ctx: Ctx): Unit = rec.log += s"fail:$nm"
  }

  test("happy path: all run, finalizers in reverse order") {
    val rec = new Rec
    val r = MultiStepJob.execute(Seq(step("a", rec), step("b", rec),
      step("c", rec)))
    assert(r.succeeded)
    assert(r.steps.map(_.status) == Seq(Ok, Ok, Ok))
    assert(rec.log.toSeq ==
      Seq("run:a", "run:b", "run:c", "ok:c", "ok:b", "ok:a"))
  }

  test("required failure skips the rest and compensates in reverse") {
    val rec = new Rec
    val r = MultiStepJob.execute(Seq(
      step("a", rec),
      step("boom", rec, body = _ => throw new RuntimeException("kaput")),
      step("c", rec)))
    assert(!r.succeeded)
    assert(r.steps.map(_.status) == Seq(Ok, Failed, Skipped))
    assert(r.steps(1).message.contains("kaput"))
    // c never ran → no finalizer for it; compensation runs boom, then a
    assert(rec.log.toSeq == Seq("run:a", "run:boom", "fail:boom", "fail:a"))
  }

  test("non-required failure does not stop the job") {
    val rec = new Rec
    val r = MultiStepJob.execute(Seq(
      step("a", rec),
      step("optional", rec, required0 = false,
        body = _ => throw new RuntimeException("meh")),
      step("c", rec)))
    assert(r.succeeded)
    assert(r.steps.map(_.status) == Seq(Ok, Failed, Ok))
    assert(rec.log.contains("run:c"))
  }

  test("SkipStep skips without failing; skipped steps get no finalizer") {
    val rec = new Rec
    val r = MultiStepJob.execute(Seq(
      step("a", rec, body = _ => throw new SkipStep("already done")),
      step("b", rec)))
    assert(r.succeeded)
    assert(r.steps.map(_.status) == Seq(Skipped, Ok))
    assert(rec.log.toSeq == Seq("run:a", "run:b", "ok:b"))
  }

  test("validation abort means nothing executes") {
    val rec = new Rec
    val bad = new Step {
      def name = "bad"
      override def preExecute(ctx: Ctx): Unit =
        throw new AbortJob("missing prereq")
      def execute(ctx: Ctx): Unit = rec.log += "run:bad"
    }
    val r = MultiStepJob.execute(Seq(step("a", rec), bad))
    assert(!r.succeeded)
    assert(r.steps.forall(_.status == Skipped))
    assert(rec.log.isEmpty)
  }

  test("retry: succeeds after transient failures, backs off exponentially") {
    val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
    var calls = 0
    val out = graft.jobs.Retry.withRetries(4, baseBackoffMs = 10,
      sleeper = ms => sleeps += ms) {
      calls += 1
      if (calls < 3) throw new RuntimeException("flaky")
      "ok"
    }
    assert(out == "ok" && calls == 3)
    assert(sleeps.toSeq == Seq(10L, 20L))
    intercept[RuntimeException] {
      graft.jobs.Retry.withRetries(2, 1, _ => ())(
        throw new RuntimeException("always"))
    }
  }

  test("salted aggregation matches direct groupBy on skewed keys") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    // 10k rows of one hot key + a long tail
    val df = (Seq.fill(10000)("hot") ++ (1 to 500).map(i => s"k$i"))
      .zipWithIndex.map { case (k, i) => (k, i.toDouble) }
      .toDF("k", "v")
    val direct = df.groupBy("k")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = graft.operators.Skew.saltedCount(df, "k", 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == direct)
    val directSum = df.groupBy("k").sum("v")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val saltedSum = graft.operators.Skew.saltedSum(df, "k", "v", 16)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(saltedSum.keySet == directSum.keySet)
    assert(saltedSum.forall { case (k, v) =>
      math.abs(v - directSum(k)) < 1e-6 })
    // salted join returns exactly the plain join's rows on skewed keys
    val dim = Seq(("hot", "H"), ("cold", "C")).toDF("k", "label")
    val plainJoin = df.join(dim, Seq("k")).groupBy("k", "label").count()
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2))).toSet
    val saltedJoin = graft.operators.Skew.saltedJoin(df, dim, "k", 16)
      .groupBy("k", "label").count()
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2))).toSet
    assert(saltedJoin == plainJoin)
  }

  test("steps share context; a profile→generate→evaluate pipeline runs") {
    val spark = SparkTestSession.spark
    val r = MultiStepJob.execute(Seq(
      new Step {
        def name = "profile"
        def execute(ctx: Ctx): Unit =
          ctx("profile") = graft.profile.ColProfile.fromRows(
            graft.profile.Profiler.profile(
              Tables.load(spark, SparkTestSession.sf, "customer"),
              "customer"))
      },
      new Step {
        def name = "generate"
        def execute(ctx: Ctx): Unit =
          ctx("defs") = graft.quality.TestGenerator.generate(
            ctx("profile").asInstanceOf[Seq[graft.profile.ColProfile]],
            Map.empty)
      },
      new Step {
        def name = "evaluate"
        def execute(ctx: Ctx): Unit =
          ctx("n_results") = graft.quality.TestEvaluator.run(
            Tables.load(spark, SparkTestSession.sf, "customer"),
            ctx("defs").asInstanceOf[Seq[graft.quality.TestDef]]).count()
      }))
    assert(r.succeeded)
    assert(r.ctx("n_results").asInstanceOf[Long] > 10)
  }
}

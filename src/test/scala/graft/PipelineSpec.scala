package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import graft.jobs.MultiStepJob
import graft.jobs.MultiStepJob.{Ctx, Step}
import graft.profile.{ColProfile, Profiler}
import graft.quality.{TestEvaluator, TestGenerator}

/** End-to-end saga pipeline: profile → generate → evaluate → export, the
  * reference's flagship quick-start + export-observability flow
  * (SURVEY.md §3.1) driven by the M7 job runner over real Spark stages.
  */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def exportDir() =
    java.nio.file.Files.createTempDirectory("export").toString

  test("saga pipeline runs profile→generate→evaluate→export") {
    val out = exportDir()
    val steps = Seq(
      new Step {
        val name = "profile"
        override def preExecute(ctx: Ctx): Unit =
          if (!new java.io.File(s"${SparkTestSession.sf}/customer.parquet")
            .exists()) throw new MultiStepJob.AbortJob("no input table")
        def execute(ctx: Ctx): Unit = {
          val df = Tables.load(spark, SparkTestSession.sf, "customer")
          ctx.update("df", df)
          ctx.update("profile",
            ColProfile.fromRows(Profiler.profile(df, "customer")))
        }
      },
      new Step {
        val name = "generate"
        def execute(ctx: Ctx): Unit = {
          val prof = ctx("profile").asInstanceOf[Seq[ColProfile]]
          val defs = TestGenerator.generate(prof, Map.empty)
          assert(defs.nonEmpty)
          ctx.update("defs", defs)
        }
      },
      new Step {
        val name = "evaluate"
        def execute(ctx: Ctx): Unit = {
          val df = ctx("df").asInstanceOf[DataFrame]
          val defs = ctx("defs")
            .asInstanceOf[Seq[graft.quality.TestDef]]
          ctx.update("results", TestEvaluator.run(df, defs))
        }
      },
      new Step {
        val name = "export"
        def execute(ctx: Ctx): Unit =
          ctx("results").asInstanceOf[DataFrame]
            .write.mode("overwrite").parquet(s"$out/outcomes")
        override def onJobFail(ctx: Ctx): Unit = {
          // compensation: a failed job must not leave a partial export
          val dir = new java.io.File(s"$out/outcomes")
          if (dir.exists()) dir.listFiles().foreach(_.delete())
        }
      },
    )
    val r = MultiStepJob.execute(steps)
    assert(r.succeeded, r.steps)
    assert(r.steps.map(_.status).forall(_ == MultiStepJob.Ok))
    // the exported outcomes are readable and every generated test ran;
    // a fresh-table evaluation against its own profile must not FAIL
    val exported = spark.read.parquet(s"$out/outcomes")
    assert(exported.count() ==
      r.ctx("defs").asInstanceOf[Seq[_]].size.toLong)
    assert(exported.filter(org.apache.spark.sql.functions
      .col("status") === "FAILED").count() == 0)
  }

  test("a required step failure skips the rest and compensates in reverse") {
    val order = scala.collection.mutable.ArrayBuffer[String]()
    def step(n: String, fail: Boolean = false) = new Step {
      val name = n
      def execute(ctx: Ctx): Unit = {
        if (fail) throw new RuntimeException(s"$n broke")
        order += s"run:$n"
      }
      override def onJobFail(ctx: Ctx): Unit = order += s"undo:$n"
    }
    val r = MultiStepJob.execute(Seq(
      step("profile"), step("generate"), step("evaluate", fail = true),
      step("export")))
    assert(!r.succeeded)
    assert(r.steps.map(_.status) == Seq(MultiStepJob.Ok, MultiStepJob.Ok,
      MultiStepJob.Failed, MultiStepJob.Skipped))
    // compensation ran in reverse order over the executed steps only
    assert(order.toSeq == Seq("run:profile", "run:generate",
      "undo:evaluate", "undo:generate", "undo:profile"))
  }
}

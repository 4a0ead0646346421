package graft.jobs

import scala.collection.mutable

/** Saga-style multi-step job runner — the orchestration shell of the engine
  * (SURVEY.md M7), re-expressing the reference's MultiStepAction semantics
  * (reference dk-installer.py:995-1058):
  *
  *  1. validate phase: every step's `preExecute` runs before ANY step
  *     executes; an abort there means nothing ran.
  *  2. execute phase: steps run sequentially sharing a mutable context; a
  *     step may skip itself (SkipStep); the first REQUIRED failure marks
  *     the job failed and all remaining steps are SKIPPED; non-required
  *     failures don't stop the job.
  *  3. finalize phase: compensation hooks run in REVERSE order —
  *     `onJobSuccess`/`onJobFail` depending on the job outcome (reference
  *     `on_action_success`/`on_action_fail`, :1044-1053).
  *
  * Drives profile → generate → evaluate → export pipelines, where each step
  * launches Spark jobs via the shared ctx.
  */
object MultiStepJob {

  /** Raised in preExecute to abort the whole job before anything runs,
    * or in execute to fail the step with a reason.
    */
  final class AbortJob(msg: String) extends RuntimeException(msg)

  /** Raised in execute to skip this step without failing the job
    * (reference SkipStep, dk-installer.py:521-530).
    */
  final class SkipStep(msg: String) extends RuntimeException(msg)

  type Ctx = mutable.Map[String, Any]

  trait Step {
    def name: String
    def required: Boolean = true
    /** Validation — must not mutate state. */
    def preExecute(ctx: Ctx): Unit = {}
    def execute(ctx: Ctx): Unit
    /** Reverse-order finalizer when the job (overall) succeeded. */
    def onJobSuccess(ctx: Ctx): Unit = {}
    /** Reverse-order finalizer (compensation) when the job failed. */
    def onJobFail(ctx: Ctx): Unit = {}
  }

  sealed trait Status
  case object Ok extends Status
  case object Skipped extends Status
  case object Failed extends Status

  case class StepResult(name: String, status: Status,
                        message: Option[String])
  case class JobResult(succeeded: Boolean, steps: Seq[StepResult],
                       ctx: Map[String, Any])

  def execute(steps: Seq[Step],
              initial: Map[String, Any] = Map.empty): JobResult = {
    val ctx: Ctx = mutable.Map(initial.toSeq: _*)

    // phase 1 — validate everything up front
    steps.foreach { s =>
      try s.preExecute(ctx)
      catch {
        case e: AbortJob => return JobResult(succeeded = false,
          steps.map(x => StepResult(x.name, Skipped,
            Some(s"aborted in validation of ${s.name}: ${e.getMessage}"))),
          ctx.toMap)
      }
    }

    // phase 2 — run sequentially, skip after first required failure
    var failed = false
    val results = steps.map { s =>
      if (failed) StepResult(s.name, Skipped, Some("prior required failure"))
      else {
        try { s.execute(ctx); StepResult(s.name, Ok, None) }
        catch {
          case e: SkipStep =>
            StepResult(s.name, Skipped, Some(e.getMessage))
          case e: Throwable =>
            if (s.required) failed = true
            StepResult(s.name, Failed, Some(e.getMessage))
        }
      }
    }

    // phase 3 — reverse-order finalize; finalizer errors are recorded but
    // never mask the job outcome
    val executed = steps.zip(results).filter(_._2.status != Skipped)
    val finalizeErrors = executed.reverse.flatMap { case (s, _) =>
      try {
        if (failed) s.onJobFail(ctx) else s.onJobSuccess(ctx)
        None
      } catch {
        case e: Throwable => Some(s"${s.name}: ${e.getMessage}")
      }
    }
    if (finalizeErrors.nonEmpty)
      ctx.update("finalize_errors", finalizeErrors)

    JobResult(!failed, results, ctx.toMap)
  }
}

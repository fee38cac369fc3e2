package graft.workflow

import graft.connector.LogStore
import graft.registry.Registry
import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.collection.mutable

/** Per-invocation context handed to processors — the engine's analog of
  * the reference's ExecutionContext carrying dataset/model metadata
  * (processor.py:42,70,127,148,164,234).
  */
final case class ExecutionContext(
    spark: SparkSession,
    registry: Registry,
    bus: EventBus,
    store: LogStore,
    config: Map[String, String])

/** The reference's processor surface: an optional open() lifecycle hook
  * plus process(ctx, inputs) → outputs (processor.py:41,233).
  */
trait Processor {
  def open(ctx: ExecutionContext): Unit = ()
  def process(ctx: ExecutionContext, inputs: Seq[DataFrame]): Seq[DataFrame]
}

/** Workflow runner: named jobs (the reference's af.job_config blocks,
  * workflow.py:40,74,84,99) connected by control edges — job-status
  * edges (action_on_job_status, workflow.py:114) and model-version-event
  * edges (action_on_model_version_event, workflow.py:115-120). The
  * reference's client→server→Airflow→Flink topology collapses into this
  * single driver object (SURVEY.md §3.1); Spark executors are the only
  * cluster.
  */
final class Workflow(val spark: SparkSession, workdir: String) {

  val bus = new EventBus
  val registry = new Registry(workdir, bus)
  val store: LogStore = LogStore(s"$workdir/streams")

  private val jobs = mutable.LinkedHashMap.empty[String, ExecutionContext => Unit]
  private val jobRuns = mutable.ArrayBuffer.empty[String]

  def job(name: String, config: Map[String, String] = Map.empty)(
      body: ExecutionContext => Unit): Unit =
    jobs(name) = ctx => body(ctx.copy(config = ctx.config ++ config))

  private def ctx0 = ExecutionContext(spark, registry, bus, store, Map.empty)

  private def runJob(name: String): Unit = {
    jobRuns += name
    jobs(name)(ctx0)
    bus.publish(Events.JobFinished, name)
  }

  /** Start `job` when `upstream` reaches FINISHED (workflow.py:114). */
  def actionOnJobStatus(job: String, upstream: String): Unit =
    bus.subscribe(Events.JobFinished) { p => if (p == upstream) runJob(job) }

  /** Start `job` on a model-version event for `model`
    * (workflow.py:115-120). */
  def actionOnModelVersionEvent(job: String, eventType: String,
      model: String): Unit =
    bus.subscribe(eventType) { p => if (p == model) runJob(job) }

  /** Run an execution: fire the entry jobs; control edges cascade the
    * rest synchronously through the bus.
    */
  def run(entryJobs: Seq[String]): Seq[String] = {
    entryJobs.foreach(runJob)
    jobRuns.toSeq
  }

  def ranJobs: Seq[String] = jobRuns.toSeq
}

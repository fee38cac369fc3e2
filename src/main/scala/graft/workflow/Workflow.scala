package graft.workflow

import graft.connector.LogStore
import graft.registry.Registry
import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.collection.mutable

/** Deferred multi-sink execution — the reference's StatementSet
  * (processor.py:73,89,278): sink processors queue inserts during graph
  * evaluation; the job runner executes them together at job end. A
  * DataFrame queued by more than one insert is persisted across the
  * fan-out (the shared-source-scan semantics of a Flink statement set,
  * SURVEY.md §4 "Multi-sink execution") and unpersisted after.
  */
final class StatementSet {
  private val inserts =
    mutable.ArrayBuffer.empty[(DataFrame, DataFrame => Unit)]

  def addInsert(df: DataFrame)(write: DataFrame => Unit): Unit =
    inserts += ((df, write))

  def size: Int = inserts.size

  /** Run all queued inserts; share scans of frames inserted twice.
    * Sharing is detected by reference identity (IdentityHashMap), not
    * identityHashCode — hash codes can collide between distinct frames,
    * which would persist the wrong one. */
  def execute(): Unit = {
    val counts = new java.util.IdentityHashMap[DataFrame, Integer]
    inserts.foreach { case (df, _) =>
      counts.put(df, Integer.valueOf(Option(counts.get(df)).fold(1)(_ + 1)))
    }
    val shared = {
      import scala.jdk.CollectionConverters._
      counts.entrySet().asScala.collect {
        case e if e.getValue > 1 => e.getKey
      }.toSeq
    }
    shared.foreach(_.persist())
    try inserts.foreach { case (df, write) => write(df) }
    finally {
      shared.foreach(_.unpersist())
      inserts.clear()
    }
  }
}

/** Per-invocation context handed to processors — the engine's analog of
  * the reference's ExecutionContext carrying dataset/model metadata and
  * the job-scoped statement set (processor.py:42,70,127,148,164,234;
  * statement_set processor.py:73).
  */
final case class ExecutionContext(
    spark: SparkSession,
    registry: Registry,
    bus: EventBus,
    store: LogStore,
    config: Map[String, String],
    statements: StatementSet = new StatementSet) {

  /** The dataset metadata bound to this node (the reference's
    * execution_context.config['dataset'], processor.py:42,70,148):
    * resolved by name from the registry — processors do their own I/O
    * against its uri, exactly the register-then-resolve pattern of
    * workflow.py:42-44.
    */
  def dataset: graft.registry.DatasetMeta = {
    val name = config.getOrElse("dataset",
      sys.error("node has no 'dataset' in config"))
    registry.getDataset(name).getOrElse(
      sys.error(s"dataset '$name' not registered"))
  }
}

/** The reference's processor surface: an optional open() lifecycle hook
  * plus process(ctx, inputs) → outputs (processor.py:41,233).
  */
trait Processor {
  def open(ctx: ExecutionContext): Unit = ()
  def process(ctx: ExecutionContext, inputs: Seq[DataFrame]): Seq[DataFrame]
}

/** A dataflow edge inside a job — the reference's AI Flow channel
  * (workflow.py:45-55): an opaque handle to one node's output. */
final case class Channel private[workflow] (private[workflow] val idx: Int)

/** One job's processor DAG: nodes added via the typed constructors
  * (read_dataset / user_define_operation / write_dataset / train /
  * model_validate / predict — workflow.py:45-105), executed in
  * insertion order with channels threading DataFrames between them,
  * then the job-scoped StatementSet runs the queued sinks.
  */
final class ProcessorGraph {
  private[workflow] val nodes =
    mutable.ArrayBuffer.empty[(Processor, Map[String, String], Seq[Channel])]

  private def add(p: Processor, cfg: Map[String, String],
      ins: Seq[Channel]): Channel = {
    nodes += ((p, cfg, ins))
    Channel(nodes.size - 1)
  }

  def readDataset(dataset: String, p: Processor): Channel =
    add(p, Map("dataset" -> dataset), Nil)

  def userDefineOperation(inputs: Seq[Channel], p: Processor,
      config: Map[String, String] = Map.empty): Channel =
    add(p, config, inputs)

  def writeDataset(input: Channel, dataset: String, p: Processor): Channel =
    add(p, Map("dataset" -> dataset), Seq(input))

  def train(inputs: Seq[Channel], model: String, p: Processor): Channel =
    add(p, Map("model" -> model), inputs)

  def modelValidate(inputs: Seq[Channel], model: String, p: Processor): Channel =
    add(p, Map("model" -> model), inputs)

  def predict(inputs: Seq[Channel], model: String, p: Processor): Channel =
    add(p, Map("model" -> model), inputs)

  private[workflow] def run(ctx: ExecutionContext): Unit = {
    val outs = Array.ofDim[Seq[DataFrame]](nodes.size)
    nodes.zipWithIndex.foreach { case ((p, cfg, ins), i) =>
      val nodeCtx = ctx.copy(config = ctx.config ++ cfg)
      p.open(nodeCtx)
      outs(i) = p.process(nodeCtx, ins.flatMap(ch => outs(ch.idx)))
    }
    ctx.statements.execute()
  }
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
  @volatile private var stopped = false

  def job(name: String, config: Map[String, String] = Map.empty)(
      body: ExecutionContext => Unit): Unit =
    jobs(name) = ctx => body(ctx.copy(config = ctx.config ++ config))

  /** A job defined as a processor DAG (the reference's job_config block
    * containing node-constructor calls, workflow.py:40-71): `build` adds
    * nodes, the runner evaluates them with a fresh job-scoped
    * StatementSet. */
  def processorJob(name: String, config: Map[String, String] = Map.empty)(
      build: ProcessorGraph => Unit): Unit = {
    val g = new ProcessorGraph
    build(g)
    job(name, config)(ctx => g.run(ctx.copy(statements = new StatementSet)))
  }

  private def ctx0 = ExecutionContext(spark, registry, bus, store, Map.empty)

  private def runJob(name: String): Unit = if (!stopped) {
    jobRuns += name
    jobs(name)(ctx0)
    bus.publish(Events.JobFinished, name)
  }

  /** Stop this workflow's executions — the reference's
    * stop_all_workflow_executions (workflow.py:122): pending control
    * edges no longer fire (events drain without starting jobs). A
    * subsequent [[run]] re-arms the workflow (submit → start_new,
    * workflow.py:124-126). Scope is THIS workflow only — streaming
    * queries on the (possibly shared) session belong to whoever
    * started them; this workflow's own jobs are synchronous, so
    * suppressing the control edges is a complete stop.
    */
  def stopAll(): Unit =
    stopped = true

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
    stopped = false
    entryJobs.foreach(runJob)
    jobRuns.toSeq
  }

  def ranJobs: Seq[String] = jobRuns.toSeq
}

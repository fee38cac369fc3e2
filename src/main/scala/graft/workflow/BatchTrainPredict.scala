package graft.workflow

import graft.{QueryDef, Tables, Work}
import graft.ml.Knn
import graft.registry.Stage
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference workflow end-to-end — batch_train_batch_predict
  * (workflow.py + processor.py) re-expressed on the Spark engine:
  *
  *   datagen: CSV → identity op → two JSON log streams (one job, two
  *            sinks — the reference's multi-sink StatementSet,
  *            processor.py:73,89,278)
  *   train:   bounded stream scan → KNN train → model version GENERATED
  *   validate (on MODEL_GENERATED): champion-challenger — exact
  *            semantics of processor.py:154-199
  *   predict  (on MODEL_VALIDATED): bounded stream scan → broadcast-UDF
  *            projection → CSV sink (prediction FLOAT, processor.py:270)
  *
  * The queued EventBus makes the reference's async race deterministic:
  * VALIDATED is published before DEPLOYED inside validate, but predict
  * (subscribed to VALIDATED) only runs when the queue drains — after
  * the DEPLOYED stage is set.
  */
object BatchTrainPredict {

  /** The reference's declared 5×FLOAT schema (processor.py:45-51,
    * EXAMPLE_COLUMNS processor.py:35). */
  val irisSchema: StructType = StructType(
    Seq("sl", "sw", "pl", "pw", "type").map(StructField(_, FloatType)))

  final case class Config(
      trainCsv: String,
      testCsv: String,
      workdir: String,
      modelName: String = "iris_knn",
      artifactName: String = "validate_result",
      k: Int = 5) {
    val predictOut: String = s"$workdir/predict_result"
  }

  /** Declared-schema CSV scan with malformed rows dropped
    * (csv.ignore-parse-errors=true → DROPMALFORMED, processor.py:55). */
  def csvScan(spark: SparkSession, uri: String): DataFrame =
    spark.read.schema(irisSchema).option("mode", "DROPMALFORMED").csv(uri)

  /** (qid, qvec, true_label) from an iris-schema frame; label FLOAT in
    * the reference's schema, int for voting. */
  private def asQueries(df: DataFrame): DataFrame =
    df.select(
      monotonically_increasing_id().as("qid"),
      array(col("sl"), col("sw"), col("pl"), col("pw"))
        .cast(ArrayType(DoubleType)).as("qvec"),
      col("type").cast(IntegerType).as("true_label"))

  private def asRefs(df: DataFrame): DataFrame =
    df.select(
      monotonically_increasing_id().as("rid"),
      array(col("sl"), col("sw"), col("pl"), col("pw"))
        .cast(ArrayType(DoubleType)).as("rvec"),
      col("type").cast(IntegerType).as("label"))

  private def accuracy(queries: DataFrame, refs: DataFrame, k: Int): Double = {
    val row = Knn.predictDistributed(queries, refs, k)
      .join(queries.select("qid", "true_label"), "qid")
      .agg(
        sum((col("pred_label") === col("true_label")).cast(LongType)).as("c"),
        count(lit(1)).as("n"))
      .collect().head
    row.getLong(0).toDouble / row.getLong(1)
  }

  /** Wire the four jobs and control edges onto `wf` (workflow.py:40-120). */
  def build(wf: Workflow, cfg: Config): Unit = {
    val scope = "scope"
    wf.registry.registerModel(cfg.modelName)
    wf.registry.registerArtifact(cfg.artifactName,
      s"${cfg.workdir}/${cfg.artifactName}.txt")

    wf.job("datagen") { ctx =>
      // each execution regenerates its streams (the reference demo
      // creates them at deploy time, README.md:89-91) — truncate so a
      // re-execution trains on one copy of the data, then append
      Work.clean(ctx.store.path(scope, "train-stream"))
      Work.clean(ctx.store.path(scope, "predict-stream"))
      // two insert pipelines in one job (multi_sink_statement_set)
      ctx.store.append(csvScan(ctx.spark, cfg.trainCsv), scope, "train-stream")
      ctx.store.append(csvScan(ctx.spark, cfg.testCsv), scope, "predict-stream")
    }

    wf.job("train") { ctx =>
      val raw = ctx.store.readBounded(ctx.spark, scope, "train-stream", irisSchema)
      val refs = asRefs(raw)
      val version = ctx.registry.modelVersions(cfg.modelName).size + 1
      val path = s"${cfg.workdir}/models/v$version"
      Knn.save(refs, path, cfg.k)
      ctx.registry.registerModelVersion(cfg.modelName, path): Unit
    }

    // Champion-challenger, exact reference semantics (processor.py:154-199)
    wf.job("validate") { ctx =>
      val reg = ctx.registry
      val deployed = reg.getDeployedModelVersion(cfg.modelName)
      val latest = reg.getLatestGeneratedModelVersion(cfg.modelName).get
      deployed match {
        case None =>
          reg.updateModelVersionStage(cfg.modelName, latest.version, Stage.Validated)
          reg.updateModelVersionStage(cfg.modelName, latest.version, Stage.Deployed)
          ()
        case Some(dep) =>
          val validation = asQueries(csvScan(ctx.spark, cfg.testCsv))
          val (newRefs, k1) = Knn.load(ctx.spark, latest.path)
          val newScore = accuracy(validation, newRefs, k1)
          val (depRefs, k2) = Knn.load(ctx.spark, dep.path)
          val depScore = accuracy(validation, depRefs, k2)
          reg.appendToArtifact(cfg.artifactName,
            s"deployed model version: ${dep.version} scores: $depScore")
          reg.appendToArtifact(cfg.artifactName,
            s"generated model version: ${latest.version} scores: $newScore")
          if (newScore >= depScore) {
            reg.updateModelVersionStage(cfg.modelName, dep.version, Stage.Deprecated)
            reg.updateModelVersionStage(cfg.modelName, latest.version, Stage.Validated)
            reg.updateModelVersionStage(cfg.modelName, latest.version, Stage.Deployed)
            ()
          }
      }
    }

    wf.job("predict") { ctx =>
      val dep = ctx.registry.getDeployedModelVersion(cfg.modelName).get
      val (refsDf, k) = Knn.load(ctx.spark, dep.path)
      val refs = refsDf.collect().map(r =>
        Knn.Ref(r.getLong(0), r.getSeq[Double](1).toArray, r.getInt(2)))
      val input = ctx.store.readBounded(ctx.spark, scope, "predict-stream", irisSchema)
      val preds = Knn.predictBroadcastUdf(ctx.spark,
        asQueries(input).select("qid", "qvec"), refs, k)
      preds.select(col("pred_label").cast(FloatType).as("prediction"))
        .write.mode("overwrite").csv(cfg.predictOut)
    }

    // Control edges (workflow.py:114-120)
    wf.actionOnJobStatus(job = "train", upstream = "datagen")
    wf.actionOnModelVersionEvent("validate", Events.ModelGenerated, cfg.modelName)
    wf.actionOnModelVersionEvent("predict", Events.ModelValidated, cfg.modelName)
  }

  /** One workflow execution (start_new_workflow_execution,
    * workflow.py:126): fire datagen; edges cascade the rest. */
  def runOnce(spark: SparkSession, cfg: Config): Workflow = {
    val wf = new Workflow(spark, cfg.workdir)
    build(wf, cfg)
    wf.run(Seq("datagen"))
    wf
  }

  /** workflow_e2e query: derive iris-shaped CSVs from the embeddings
    * table (4 leading dims, 3 labels), run the full pipeline, return the
    * predictions the CSV sink wrote. Not SQL-expressible (registry +
    * event edges) → rows-only check; semantics covered by WorkflowSpec.
    */
  val e2e = QueryDef(
    "workflow_e2e",
    (s, dir) => {
      val base = s"${Work.dir}/workflow_e2e"
      Work.clean(base)
      val emb = Tables(s, dir, "embeddings").select(
        element_at(col("embedding"), 1).cast(FloatType).as("sl"),
        element_at(col("embedding"), 2).cast(FloatType).as("sw"),
        element_at(col("embedding"), 3).cast(FloatType).as("pl"),
        element_at(col("embedding"), 4).cast(FloatType).as("pw"),
        (col("label") % 3).cast(FloatType).as("type"),
        col("vec_id"))
      emb.filter(col("vec_id") % 5 =!= 0).drop("vec_id")
        .write.mode("overwrite").csv(s"$base/train_csv")
      emb.filter(col("vec_id") % 5 === 0).drop("vec_id")
        .write.mode("overwrite").csv(s"$base/test_csv")
      val cfg = Config(s"$base/train_csv", s"$base/test_csv", s"$base/wf")
      runOnce(s, cfg)
      s.read.schema(StructType(Seq(StructField("prediction", FloatType))))
        .csv(cfg.predictOut)
    },
    None)

  val all: Seq[QueryDef] = Seq(e2e)
}

package graft.ml

import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.ml.param.{IntParam, Param, ParamMap, ParamValidators}
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The `org.apache.spark.ml` face of the KNN classifier — an
  * Estimator/Model pair so the engine's classifier composes with ML
  * Pipelines (the idiomatic Spark analog of the reference's
  * sklearn-KNeighborsClassifier train step, processor.py:128-129).
  *
  * fit() is lazy-learner training: it materializes the reference set
  * (model = the data, SURVEY.md §7.3). transform() is the distributed
  * predict — broadcast crossJoin + bounded-heap top-k + majority vote,
  * identical semantics (and tie-breaks) to [[Knn.predictDistributed]],
  * so the Pipeline face and the library face agree bit-for-bit.
  */
final class KnnClassifier(override val uid: String)
    extends Estimator[KnnClassifierModel] {

  def this() = this(Identifiable.randomUID("graft_knn"))

  val k: IntParam = new IntParam(this, "k",
    "number of neighbors (> 0)", ParamValidators.gt(0))
  val featuresCol: Param[String] = new Param(this, "featuresCol",
    "array<double> feature column")
  val labelCol: Param[String] = new Param(this, "labelCol",
    "integer label column")
  val idCol: Param[String] = new Param(this, "idCol",
    "long row-id column (tie-break order)")
  setDefault(k -> 5, featuresCol -> "features", labelCol -> "label",
    idCol -> "id")

  def setK(value: Int): this.type = set(k, value)
  def setFeaturesCol(value: String): this.type = set(featuresCol, value)
  def setLabelCol(value: String): this.type = set(labelCol, value)
  def setIdCol(value: String): this.type = set(idCol, value)

  override def fit(dataset: Dataset[_]): KnnClassifierModel = {
    // materialize the reference set AT FIT TIME: a lazy plan would
    // re-execute the training lineage on every transform() and read
    // whatever the source contains THEN, not the fitted snapshot
    val refs = dataset.select(
      col($(idCol)).cast(LongType).as("rid"),
      col($(featuresCol)).cast(ArrayType(DoubleType)).as("rvec"),
      col($(labelCol)).cast(IntegerType).as("label"))
      .persist()
    refs.count(): Unit
    val m = new KnnClassifierModel(uid, refs)
    copyValues(m)
  }

  override def copy(extra: ParamMap): KnnClassifier = defaultCopy(extra)

  override def transformSchema(schema: StructType): StructType =
    StructType(schema.fields :+ StructField("prediction", IntegerType))
}

final class KnnClassifierModel private[ml] (
    override val uid: String, refs: DataFrame)
    extends Model[KnnClassifierModel] {

  // mirrors of the estimator's params (copied by copyValues)
  val k: IntParam = new IntParam(this, "k", "number of neighbors",
    ParamValidators.gt(0))
  val featuresCol: Param[String] = new Param(this, "featuresCol",
    "array<double> feature column")
  val labelCol: Param[String] = new Param(this, "labelCol",
    "integer label column")
  val idCol: Param[String] = new Param(this, "idCol",
    "long row-id column")
  setDefault(k -> 5, featuresCol -> "features", labelCol -> "label",
    idCol -> "id")

  override def transform(dataset: Dataset[_]): DataFrame = {
    val queries = dataset.select(
      col($(idCol)).cast(LongType).as("qid"),
      col($(featuresCol)).cast(ArrayType(DoubleType)).as("qvec"))
    val preds = Knn.predictDistributed(queries, refs, $(k))
      .withColumnRenamed("pred_label", "prediction")
    // left join: a transform must preserve its input rows — a row that
    // gets no prediction keeps a null, it does not silently vanish
    dataset.toDF().join(preds,
      dataset($(idCol)).cast(LongType) === preds("qid"), "left")
      .drop("qid")
  }

  /** Free the cached reference set. fit() persists it (the model IS the
    * data — every transform scans it), so a model that is done serving
    * must release its blocks or repeated fit() calls accumulate cache
    * for the lifetime of the session. Idempotent; transform() after
    * release still works (recomputes from lineage, just uncached).
    */
  def release(): Unit = refs.unpersist(): Unit

  override def copy(extra: ParamMap): KnnClassifierModel =
    copyValues(new KnnClassifierModel(uid, refs), extra)

  override def transformSchema(schema: StructType): StructType =
    StructType(schema.fields :+ StructField("prediction", IntegerType))
}

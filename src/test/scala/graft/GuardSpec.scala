package graft

import org.apache.spark.sql.functions._

/** Error-path tests: the guard rails that keep misuse loud — caps,
  * malformed inputs, unknown registry entries, invalid parameters.
  * Each failure must be an immediate, pointed error, not silent wrong
  * results (the failure mode that actually costs at 100 TB).
  */
class GuardSpec extends SparkSpec {

  test("collect_to_driver refuses over-cap results without a second scan") {
    val big = Tables(spark, sf, "documents")
    val e = intercept[IllegalArgumentException](
      graft.ops.Parity.collectToDriver(big, maxRows = 10))
    assert(e.getMessage.contains("refused"))
  }

  test("V2 offset deserialization rejects malformed JSON") {
    intercept[Exception](
      graft.connector.LogOffsetV2.fromJson("not json at all ["))
    ()
  }

  test("registry rejects stage updates for unknown versions") {
    val wd = s"${Work.dir}/test_guard_reg"
    Work.clean(wd)
    val reg = new graft.registry.Registry(wd, new graft.workflow.EventBus)
    reg.registerModel("m")
    val e = intercept[IllegalArgumentException](
      reg.updateModelVersionStage("m", version = 7, graft.registry.Stage.Deployed))
    assert(e.getMessage.contains("unknown version"))
  }

  test("KNN prediction with an empty reference set fails loudly") {
    val e = intercept[IllegalArgumentException](
      graft.ml.Knn.predictFn(spark, Array.empty, k = 5))
    assert(e.getMessage.contains("empty reference set"))
  }

  test("catalog initialization without a workdir names the missing conf") {
    val cat = new graft.connector.GraftCatalog
    val e = intercept[RuntimeException](cat.initialize("badcat",
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Collections.emptyMap())))
    assert(e.getMessage.contains("workdir"))
  }

  test("parameter validation: range-join cell width, simhash band cover") {
    val df = Tables(spark, sf, "events").limit(1)
      .select(col("event_id"), expr("ts div 1000").as("tsu"))
    intercept[IllegalArgumentException](
      graft.ops.RangeJoin.rangeJoin(df, df, "tsu", "tsu", "tsu", cellWidth = 0))
    intercept[IllegalArgumentException](
      graft.ext.Dedup.simhashPairs(
        df.select(col("event_id").as("doc_id"), lit(0L).as("simhash")),
        maxHamming = 4))
    ()
  }
}

import org.apache.spark.sql.SparkSession
object ExplainSem {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get(8)
    val df = graft.ext.Dedup.semantic.fn(spark, "/root/testdata/sf0.1")
    df.explain("formatted")
    spark.stop()
  }
}

package graft.ops

import graft.{QueryDef, Tables, Work}
import graft.connector.LogStore
import graft.streaming.StreamOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Parity-named witnesses: one query key per SURVEY.md §2.1 operator
  * row, so the inventory maps 1:1 onto `SparkEntry.queries`. Several
  * reuse the machinery already exercised by richer queries — the point
  * of these keys is line-by-line coverage of the reference's surface.
  * Full mapping in OPERATORS.md.
  */
object Parity {

  /** #1 csv_scan — declared-schema CSV source, malformed rows dropped
    * (processor.py:44-58). Scan of a CSV copy of `nation` written once
    * into the workdir. */
  val csvScan = QueryDef(
    "csv_scan",
    (s, dir) => {
      val path = Work.scratch("csv_scan_src")
      Work.clean(path)
      Tables(s, dir, "nation").write.mode("overwrite").csv(path)
      s.read
        .schema(StructType(Seq(
          StructField("n_nationkey", IntegerType),
          StructField("n_name", StringType),
          StructField("n_regionkey", IntegerType))))
        .option("mode", "DROPMALFORMED")
        .csv(path)
    },
    Some("SELECT n_nationkey, n_name, n_regionkey FROM nation"))

  /** #14 csv_sink — bounded CSV filesystem sink (processor.py:261-278):
    * write a projection, read it back through the declared schema. */
  val csvSink = QueryDef(
    "csv_sink",
    (s, dir) => {
      val path = Work.scratch("csv_sink_out")
      Work.clean(path)
      Tables(s, dir, "supplier")
        .select("s_suppkey", "s_name", "s_nationkey")
        .write.mode("overwrite").csv(path)
      s.read.schema(StructType(Seq(
          StructField("s_suppkey", LongType),
          StructField("s_name", StringType),
          StructField("s_nationkey", IntegerType))))
        .csv(path)
    },
    Some("SELECT s_suppkey, s_name, s_nationkey FROM supplier"))

  /** #3 stream_sink_json — append rows to a named stream serialized as
    * JSON (processor.py:67-90); witnessed by counting what landed. */
  val streamSinkJson = QueryDef(
    "stream_sink_json",
    (s, dir) => {
      val base = Work.scratch("parity_sink")
      Work.clean(base)
      val store = LogStore(base)
      store.append(Tables(s, dir, "events"), "scope", "events-stream")
      store.readBounded(s, "scope", "events-stream", StreamOps.eventSchema)
        .agg(count(lit(1)).as("n"))
    },
    Some("SELECT count(*) AS n FROM events"))

  /** #4 stream_scan_bounded — bounded scan of everything currently in a
    * stream (scan.execution.type=batch, processor.py:93-114). */
  val streamScanBounded = QueryDef(
    "stream_scan_bounded",
    (s, dir) => {
      val base = Work.scratch("parity_scan")
      Work.clean(base)
      val store = LogStore(base)
      store.append(Tables(s, dir, "events"), "scope", "events-stream")
      store.readBounded(s, "scope", "events-stream", StreamOps.eventSchema)
        .select(col("event_id"), expr("ts div 1000").as("ts_us"),
          col("user_id"), col("event_type"), col("value"))
    },
    Some("""
      SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value
      FROM events"""))

  /** #5 collect_to_driver — the reference's to_pandas()
    * (processor.py:124), isolated behind one guarded function so the
    * 100 TB path can swap in a distributed variant (SURVEY.md §1.1.7).
    */
  def collectToDriver(df: DataFrame, maxRows: Int = 1000000): Array[org.apache.spark.sql.Row] = {
    // one scan, not count()+collect(): probe with a limit of maxRows+1 —
    // if the probe overflows the cap we refuse without a second pass
    val rows = df.limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"collect_to_driver refused: > $maxRows rows — use a distributed operator")
    rows
  }

  val collectQuery = QueryDef(
    "collect_to_driver",
    (s, dir) => {
      val rows = collectToDriver(Tables(s, dir, "region"))
      s.createDataFrame(
        new java.util.ArrayList(java.util.Arrays.asList(rows: _*)),
        Tables(s, dir, "region").schema)
    },
    Some("SELECT r_regionkey, r_name FROM region"))

  /** #6 label_split — project-away + project-only of the label column
    * (train_data.pop('type'), processor.py:125-126). */
  val labelSplit = QueryDef(
    "label_split",
    (s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val features = emb.drop("label") // project-away
      val labels = emb.select("vec_id", "label") // project-only
      features.select("vec_id").join(labels, "vec_id")
        .select("vec_id", "label")
    },
    Some("SELECT vec_id, label FROM embeddings"))

  /** ORC round-trip — a second columnar format behind the same
    * source/sink surface (spark.read/write.orc, built-in). */
  val orcRoundtrip = QueryDef(
    "orc_roundtrip",
    (s, dir) => {
      val path = Work.scratch("orc_roundtrip")
      Work.clean(path)
      Tables(s, dir, "supplier")
        .select("s_suppkey", "s_name", "s_nationkey")
        .write.mode("overwrite").orc(path)
      s.read.orc(path)
    },
    Some("SELECT s_suppkey, s_name, s_nationkey FROM supplier"))

  /** JSON-lines file round-trip — the filesystem JSON source/sink (the
    * stream-store JSON codec is witnessed separately by the log store). */
  val jsonRoundtrip = QueryDef(
    "json_roundtrip",
    (s, dir) => {
      val path = Work.scratch("json_roundtrip")
      Work.clean(path)
      Tables(s, dir, "customer")
        .select("c_custkey", "c_name", "c_nationkey")
        .write.mode("overwrite").json(path)
      s.read
        .schema(StructType(Seq(
          StructField("c_custkey", LongType),
          StructField("c_name", StringType),
          StructField("c_nationkey", IntegerType))))
        .json(path)
    },
    Some("SELECT c_custkey, c_name, c_nationkey FROM customer"))

  /** XML file round-trip — Spark 4's NATIVE xml source/sink
    * (spark.read/write.format("xml"), the spark-xml module merged into
    * core): the remaining built-in file format the parity surface
    * didn't witness. Row tag declared explicitly; the read-back schema
    * is pinned (XML infers strings otherwise), so the oracle compares
    * typed values. Scale shape: like every file-format roundtrip here,
    * both sides are parallel scans/writes — per-partition files, no
    * driver involvement. */
  val xmlRoundtrip = QueryDef(
    "xml_roundtrip",
    (s, dir) => {
      val path = Work.scratch("xml_roundtrip")
      Work.clean(path)
      Tables(s, dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
        .write.mode("overwrite").option("rowTag", "nation")
        .format("xml").save(path)
      s.read
        .schema(StructType(Seq(
          StructField("n_nationkey", LongType),
          StructField("n_name", StringType),
          StructField("n_regionkey", LongType))))
        .option("rowTag", "nation")
        .format("xml").load(path)
    },
    Some("SELECT n_nationkey, n_name, n_regionkey FROM nation"))

  /** Avro container round-trip — the one mainstream format this Spark
    * build has no DataSource for (no spark-avro jar; r12 verdict
    * residual-gap #1). [[graft.sources.AvroIO]] carries the engine's
    * own distributed writer/reader on the raw Avro library: one
    * container file per partition out, one task per file back, schema
    * declared (long/string/int/double incl. a nullable-union column).
    * The oracle replays the projection from the parquet source — the
    * roundtrip must be value-exact. */
  val avroRoundtrip = QueryDef(
    "avro_roundtrip",
    (s, dir) => {
      val path = Work.scratch("avro_roundtrip")
      Work.clean(path)
      val src = Tables(s, dir, "customer")
        .select("c_custkey", "c_name", "c_nationkey", "c_acctbal")
      graft.sources.AvroIO.write(src, path)
      // declared read schema = the source projection's (the roundtrip
      // must reproduce it type-exactly; never inferred from the files)
      graft.sources.AvroIO.read(s, path, src.schema)
    },
    Some("SELECT c_custkey, c_name, c_nationkey, c_acctbal FROM customer"))

  /** Avro ARRAY round-trip on the LLM-pipeline table (r13 verdict #4):
    * the embeddings table's `array<float>` vectors through the
    * engine's own Avro container path — `Schema.createArray` with a
    * nullable-union element. Output follows the repo's float
    * discipline: the vector re-emerges as exact fixed-point micro
    * units (round(v·1e6) on the float→double widening, which is exact
    * and engine-portable), so the compare hashes integers, never raw
    * floats. dim pins the array LENGTH survived too. */
  val avroArrayRoundtrip = QueryDef(
    "avro_array_roundtrip",
    (s, dir) => {
      val path = Work.scratch("avro_array_roundtrip")
      Work.clean(path)
      val src = Tables(s, dir, "embeddings")
      graft.sources.AvroIO.write(src, path)
      graft.sources.AvroIO.read(s, path, src.schema)
        .select(col("vec_id"), col("label"),
          size(col("embedding")).as("dim"),
          array_join(transform(col("embedding"),
            x => round(x.cast(DoubleType) * 1e6).cast(LongType)), ",")
            .as("e6"))
    },
    Some("""
      SELECT vec_id, label, len(embedding) AS dim,
             array_to_string(list_transform(CAST(embedding AS DOUBLE[]),
               v -> CAST(round(v * 1000000) AS BIGINT)), ',') AS e6
      FROM embeddings"""))

  val all: Seq[QueryDef] = Seq(
    csvScan, csvSink, streamSinkJson, streamScanBounded, collectQuery,
    labelSplit, orcRoundtrip, jsonRoundtrip, xmlRoundtrip, avroRoundtrip,
    avroArrayRoundtrip)
}

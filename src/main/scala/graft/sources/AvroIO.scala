package graft.sources

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader,
  GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.avro.util.Utf8
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Avro object-container read/write on the raw Avro Java library —
  * the one mainstream format (Kafka ecosystems, crawl pipelines) this
  * environment's Spark build ships WITHOUT a DataSource for (no
  * spark-avro module jar; the avro/avro-mapred libraries themselves
  * are on the classpath). Rather than document a boundary, the engine
  * carries the minimal distributed implementation itself:
  *
  *  - WRITE: one container file per input partition, created through
  *    the Hadoop FileSystem API from the executors (`mapPartitions` —
  *    genuine per-partition imperative IO, the documented last-resort
  *    tier). No driver involvement beyond the job.
  *  - READ: the file listing parallelizes one task per container file;
  *    each task streams its file through `DataFileReader` over
  *    [[FsInput]]. Scale shape: parallelism = file count = writer's
  *    partition count, the same contract as every file-format
  *    roundtrip in [[graft.ops.Parity]].
  *
  * Type surface (declared, not inferred — same policy as the CSV/XML
  * witnesses): long, int, double, float, boolean, string, binary, and
  * one-level ARRAYS of those (`Schema.createArray` — the embeddings
  * table's `array<float>` vectors, the LLM-pipeline column, round-trip
  * through this path; r13 verdict #4). Nullable columns and nullable
  * array ELEMENTS map to `union(null, T)`. Nested arrays-of-arrays
  * stay out of scope (parquet/orc already witness deep nesting);
  * unsupported types fail loudly at schema build.
  */
object AvroIO {

  private def scalarSchema(dt: DataType, col: String): Schema = dt match {
    case LongType => Schema.create(Schema.Type.LONG)
    case IntegerType => Schema.create(Schema.Type.INT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case StringType => Schema.create(Schema.Type.STRING)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case other => throw new IllegalArgumentException(
      s"AvroIO: unsupported type $other for column $col")
  }

  /** Spark → Avro record schema (JSON-serializable, parsed per task). */
  def avroSchema(schema: StructType, record: String = "row"): Schema = {
    val fields = schema.fields.map { f =>
      val base = f.dataType match {
        case ArrayType(et, containsNull) =>
          val e = scalarSchema(et, s"${f.name}[]")
          Schema.createArray(
            if (containsNull)
              Schema.createUnion(Schema.create(Schema.Type.NULL), e)
            else e)
        case dt => scalarSchema(dt, f.name)
      }
      val t = if (f.nullable)
        Schema.createUnion(Schema.create(Schema.Type.NULL), base)
      else base
      new Schema.Field(f.name, t, null, null)
    }
    Schema.createRecord(record, null, "graft", false, fields.toList.asJava)
  }

  /** Spark row value → Avro generic value (recursive one level for
    * arrays; bytes wrap, everything else passes boxed). */
  private def toAvro(v: Any): Any = v match {
    case null => null
    case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
    case seq: scala.collection.Seq[_] => seq.map(toAvro).asJava
    case other => other
  }

  /** Avro generic value → Spark row value (Utf8 → String, ByteBuffer
    * → Array[Byte], GenericData.Array/List → Seq). */
  private def fromAvro(v: Any): Any = v match {
    case u: Utf8 => u.toString
    case bb: java.nio.ByteBuffer =>
      val a = new Array[Byte](bb.remaining()); bb.get(a); a
    case l: java.util.List[_] => l.asScala.map(fromAvro).toSeq
    case other => other
  }

  /** Write `df` as `part-<idx>.avro` container files under `dir`
    * (one per non-empty partition), replacing any prior content. */
  def write(df: DataFrame, dir: String): Unit = {
    val sparkSchema = df.schema
    val schemaJson = avroSchema(sparkSchema).toString
    val dirPath = new Path(dir)
    val fsDriver = dirPath.getFileSystem(new Configuration())
    if (fsDriver.exists(dirPath)) fsDriver.delete(dirPath, true): Unit
    fsDriver.mkdirs(dirPath): Unit
    df.rdd.mapPartitionsWithIndex { (idx, it) =>
      if (it.isEmpty) Iterator.empty
      else {
        val schema = new Schema.Parser().parse(schemaJson)
        val p = new Path(s"$dir/part-$idx.avro")
        val fs = p.getFileSystem(new Configuration())
        val out = fs.create(p, true)
        val w = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](schema))
        w.create(schema, out): Unit // w.close() closes `out` too
        try it.foreach { row =>
          val rec = new GenericData.Record(schema)
          var i = 0
          while (i < sparkSchema.length) {
            rec.put(i, toAvro(row.get(i)))
            i += 1
          }
          w.append(rec)
        } finally w.close()
        Iterator.single(idx)
      }
    }.count(): Unit
  }

  /** Read the container files under `dir` into a DataFrame with the
    * DECLARED schema — one task per file, each streaming its records
    * (no whole-file buffering). */
  def read(spark: SparkSession, dir: String,
      schema: StructType): DataFrame = {
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(new Configuration())
    val files = fs.listStatus(dirPath)
      .map(_.getPath.toString).filter(_.endsWith(".avro")).toSeq.sorted
    require(files.nonEmpty, s"AvroIO.read: no .avro files under $dir")
    val n = schema.length
    val rdd = spark.sparkContext
      .parallelize(files, files.length)
      .flatMap { f =>
        val in = new FsInput(new Path(f), new Configuration())
        val r = new DataFileReader[GenericRecord](in,
          new GenericDatumReader[GenericRecord]())
        // close on TASK COMPLETION, not only on iterator exhaustion: a
        // consumer that stops early (limit, show) abandons the iterator
        // and would otherwise leak one open file per task (r13 review —
        // the same listener Spark's own file readers register)
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ =>
            try r.close() catch { case _: java.io.IOException => () }))
        new Iterator[Row] {
          def hasNext: Boolean = {
            val h = r.hasNext
            if (!h) r.close() // FsInput closes with the reader
            h
          }
          def next(): Row = {
            val rec = r.next()
            Row.fromSeq((0 until n).map(i => fromAvro(rec.get(i))))
          }
        }
      }
    spark.createDataFrame(rdd, schema)
  }
}

package graft.sources

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat, AvroKeyOutputFormat}
import org.apache.hadoop.io.NullWritable
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Avro container-file source/sink over the Hadoop `AvroKeyInputFormat` /
  * `AvroKeyOutputFormat` pair — the splittable, distributed Avro path
  * (reference import_cards.py:351-366 streams the bulk dump; Avro is the
  * canonical streamed row format for that landing zone, and container
  * files carry sync markers so a 100 TB directory splits at block
  * boundaries exactly like the other splittable sources here).
  *
  * The environment ships avro + avro-mapred but NOT the spark-avro
  * DataSource, so this maps Spark rows to Avro generic records directly:
  * a recursive StructType→Schema converter (every field a [null, T]
  * union — Avro's nullable convention), row→record on the write side and
  * record→row on the read side, both pure per-row work inside the
  * scan/write tasks (no driver hop, no shuffle; the Hadoop commit
  * protocol handles task retries on the write). Schemas travel to
  * executors as JSON strings — the one Avro-API subtlety worth a note:
  * `Schema` is not reliably serializable across versions, a
  * `Schema.Parser` parse per partition is.
  */
object AvroTable {

  /** Spark schema → Avro record schema. Field and record names derive
    * from the column path, so nested records get unique valid names. */
  def avroSchema(struct: StructType, name: String): Schema = {
    val fields = struct.fields.map { f =>
      new Schema.Field(f.name, nullable(fieldSchema(f.dataType, s"${name}_${f.name}")),
        null, Schema.Field.NULL_DEFAULT_VALUE)
    }
    Schema.createRecord(name, null, "graft", false, fields.toList.asJava)
  }

  private def nullable(s: Schema): Schema =
    Schema.createUnion(Schema.create(Schema.Type.NULL), s)

  private def fieldSchema(dt: DataType, path: String): Schema = dt match {
    case StringType  => Schema.create(Schema.Type.STRING)
    case IntegerType => Schema.create(Schema.Type.INT)
    case LongType    => Schema.create(Schema.Type.LONG)
    case FloatType   => Schema.create(Schema.Type.FLOAT)
    case DoubleType  => Schema.create(Schema.Type.DOUBLE)
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case BinaryType  => Schema.create(Schema.Type.BYTES)
    case ArrayType(et, _) => Schema.createArray(nullable(fieldSchema(et, s"${path}_item")))
    case MapType(StringType, vt, _) =>
      Schema.createMap(nullable(fieldSchema(vt, s"${path}_value")))
    case st: StructType => avroSchema(st, path)
    case other => throw new IllegalArgumentException(
      s"no Avro mapping for Spark type $other at $path")
  }

  /** The non-null branch of a [null, T] union (or the schema itself). */
  private def nonNull(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
    else s

  private def toAvro(v: Any, dt: DataType, schema: Schema): AnyRef = v match {
    case null => null
    case row: Row =>
      val st = dt.asInstanceOf[StructType]
      val s = nonNull(schema)
      val rec = new GenericData.Record(s)
      st.fields.zipWithIndex.foreach { case (f, i) =>
        rec.put(f.name, toAvro(row.get(i), f.dataType, s.getField(f.name).schema()))
      }
      rec
    case seq: scala.collection.Seq[_] =>
      // a schema-carrying GenericData.Array, not a plain java List: the
      // 1.12 writer resolves array element classes from the container
      val arrSchema = nonNull(schema)
      val et = dt.asInstanceOf[ArrayType].elementType
      val es = arrSchema.getElementType
      val out = new GenericData.Array[AnyRef](seq.length, arrSchema)
      seq.foreach(e => out.add(toAvro(e, et, es)))
      out
    case m: scala.collection.Map[_, _] =>
      val vt = dt.asInstanceOf[MapType].valueType
      val vs = nonNull(schema).getValueType
      val out = new java.util.HashMap[String, AnyRef](m.size)
      m.foreach { case (k, x) => out.put(k.toString, toAvro(x, vt, vs)) }
      out
    case bytes: Array[Byte] => java.nio.ByteBuffer.wrap(bytes)
    case other => other.asInstanceOf[AnyRef] // boxed Int/Long/Float/Double/Boolean/String
  }

  private def fromAvro(v: AnyRef, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (s: CharSequence, StringType) => s.toString // Utf8 included
    case (c: java.util.Collection[_], ArrayType(et, _)) =>
      c.asScala.iterator.map(e => fromAvro(e.asInstanceOf[AnyRef], et)).toSeq
    case (m: java.util.Map[_, _], MapType(_, vt, _)) =>
      m.asScala.iterator
        .map { case (k, x) => k.toString -> fromAvro(x.asInstanceOf[AnyRef], vt) }
        .toMap
    case (r: GenericRecord, st: StructType) =>
      Row(st.fields.map(f => fromAvro(r.get(f.name), f.dataType)).toSeq: _*)
    case (b: java.nio.ByteBuffer, BinaryType) =>
      val out = new Array[Byte](b.remaining()); b.duplicate().get(out); out
    case (other, _) => other
  }

  /** Distributed write: one Avro container file per partition through the
    * Hadoop commit protocol. Overwrites `path`. */
  def write(df: DataFrame, path: String, recordName: String): Unit = {
    val struct = df.schema
    val schemaJson = avroSchema(struct, recordName).toString
    val sc = df.sparkSession.sparkContext
    val fsPath = new org.apache.hadoop.fs.Path(path)
    val fs = fsPath.getFileSystem(sc.hadoopConfiguration)
    if (fs.exists(fsPath)) fs.delete(fsPath, true)
    val job = org.apache.hadoop.mapreduce.Job.getInstance(sc.hadoopConfiguration)
    AvroJob.setOutputKeySchema(job, new Schema.Parser().parse(schemaJson))
    // the output format's default data model is ReflectData, whose array
    // writer reflects on Java component types and rejects generic
    // records — these are GenericData records, say so
    org.apache.avro.hadoop.io.AvroSerialization.setDataModelClass(
      job.getConfiguration, classOf[GenericData])
    df.rdd.mapPartitions { it =>
      val schema = new Schema.Parser().parse(schemaJson)
      it.map(row => (new AvroKey[GenericRecord](
        toAvro(row, struct, schema).asInstanceOf[GenericRecord]), NullWritable.get()))
    }.saveAsNewAPIHadoopFile(path,
      classOf[AvroKey[GenericRecord]], classOf[NullWritable],
      classOf[AvroKeyOutputFormat[GenericRecord]], job.getConfiguration)
  }

  /** Distributed, splittable read: the input format splits container
    * files on their sync markers, each task decodes records to rows
    * in place. `struct` is the reader schema (Avro resolves it against
    * each file's writer schema — the standard evolution seam). */
  def read(spark: SparkSession, path: String, struct: StructType,
      recordName: String): DataFrame = {
    val schemaJson = avroSchema(struct, recordName).toString
    val job = org.apache.hadoop.mapreduce.Job.getInstance(spark.sparkContext.hadoopConfiguration)
    AvroJob.setInputKeySchema(job, new Schema.Parser().parse(schemaJson))
    org.apache.avro.hadoop.io.AvroSerialization.setDataModelClass(
      job.getConfiguration, classOf[GenericData])
    val rows = spark.sparkContext.newAPIHadoopFile(
      path,
      classOf[AvroKeyInputFormat[GenericRecord]],
      classOf[AvroKey[GenericRecord]],
      classOf[NullWritable],
      job.getConfiguration)
      // convert inside the scan stage: the input format reuses its key
      // object, so the record must become an immutable Row before it
      // leaves the iterator
      .mapPartitions(_.map { case (k, _) =>
        fromAvro(k.datum(), struct).asInstanceOf[Row]
      })
    spark.createDataFrame(rows, struct)
  }
}

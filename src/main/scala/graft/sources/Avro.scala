package graft.sources

import java.nio.ByteBuffer
import java.time.{Instant, LocalDate}

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema => ASchema}
import org.apache.avro.generic.{GenericData, GenericFixed, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat, AvroKeyOutputFormat}
import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container-file interop WITHOUT the spark-avro datasource jar
  * (absent from this distribution — see [[FileFormats]]): built directly
  * on the public Apache Avro APIs that ARE on the classpath (avro-core +
  * avro-mapred 1.12, the same libraries spark-avro wraps).
  *
  * Scale: the read path goes through Hadoop's `AvroKeyInputFormat`,
  * which splits on the container's sync markers — a 100 TB Avro dataset
  * parallelizes per HDFS block exactly as it would under spark-avro, NOT
  * one-task-per-file (the `binaryFiles` trap). Records are converted to
  * rows inside `mapPartitions` immediately on read because the Hadoop
  * record reader REUSES the key object across `next()` calls — holding
  * references to raw `GenericRecord`s would silently corrupt batches.
  * The write path emits through `AvroKeyOutputFormat` + the Hadoop
  * committer (atomic rename, `_SUCCESS` marker), deflate-compressed by
  * default (pure-JDK codec; snappy also resolves on this classpath).
  *
  * Limits, stated not hidden: no predicate/projection pushdown (Avro is
  * a row format; the datasource would prune columns after decode anyway
  * — select early and convert to parquet for at-rest analytics, the
  * same posture as CSV/JSON ingest), single writer schema per directory
  * (first file wins), and the type subset below. Unions beyond
  * `[null, T]`, Avro decimal, and recursive schemas are rejected with a
  * clear error instead of mis-decoding.
  *
  * Type mapping (both directions): boolean/int/long/float/double ↔
  * themselves; string+enum → string; bytes/fixed → binary; record ↔
  * struct; array ↔ array; map ↔ map(string, _); logical date ↔ DateType;
  * logical timestamp-micros/millis ↔ TimestampType (written as micros);
  * logical local-timestamp-micros/millis ↔ TimestampNTZType (what Spark
  * gives parquet timestamps not adjusted to UTC — e.g. this repo's
  * `orders.o_orderdate`).
  */
object Avro {

  // ---- schema: Avro -> Spark ----

  /** Spark type for an Avro schema; `(type, nullable)`. */
  def toSparkType(s: ASchema): (DataType, Boolean) = s.getType match {
    case ASchema.Type.UNION =>
      val branches = s.getTypes.asScala.toList
      val nonNull = branches.filterNot(_.getType == ASchema.Type.NULL)
      nonNull match {
        case one :: Nil =>
          val (dt, _) = toSparkType(one)
          (dt, branches.size > nonNull.size)
        case _ =>
          throw new IllegalArgumentException(
            s"unsupported Avro union (only [null, T] unions map to a Spark type): $s")
      }
    case ASchema.Type.BOOLEAN => (BooleanType, false)
    case ASchema.Type.INT =>
      if (s.getLogicalType.isInstanceOf[LogicalTypes.Date]) (DateType, false)
      else (IntegerType, false)
    case ASchema.Type.LONG => s.getLogicalType match {
      case _: LogicalTypes.TimestampMicros | _: LogicalTypes.TimestampMillis =>
        (TimestampType, false)
      case _: LogicalTypes.LocalTimestampMicros | _: LogicalTypes.LocalTimestampMillis =>
        (TimestampNTZType, false)
      case _ => (LongType, false)
    }
    case ASchema.Type.FLOAT => (FloatType, false)
    case ASchema.Type.DOUBLE => (DoubleType, false)
    case ASchema.Type.STRING | ASchema.Type.ENUM => (StringType, false)
    case ASchema.Type.BYTES | ASchema.Type.FIXED => (BinaryType, false)
    case ASchema.Type.RECORD => (toSparkStruct(s), false)
    case ASchema.Type.ARRAY =>
      val (et, en) = toSparkType(s.getElementType)
      (ArrayType(et, containsNull = en), false)
    case ASchema.Type.MAP =>
      val (vt, vn) = toSparkType(s.getValueType)
      (MapType(StringType, vt, valueContainsNull = vn), false)
    case other =>
      throw new IllegalArgumentException(s"unsupported Avro type $other in $s")
  }

  def toSparkStruct(record: ASchema): StructType = {
    require(record.getType == ASchema.Type.RECORD, s"not a record: $record")
    StructType(record.getFields.asScala.toSeq.map { f =>
      val (dt, nullable) = toSparkType(f.schema())
      StructField(f.name(), dt, nullable)
    })
  }

  // ---- schema: Spark -> Avro ----

  private def nullable(s: ASchema): ASchema =
    ASchema.createUnion(java.util.List.of(ASchema.create(ASchema.Type.NULL), s))

  def toAvroSchema(st: StructType, name: String = "graft_record",
                   namespace: String = "graft"): ASchema =
    structToRecord(st, name, namespace)

  private def fieldSchema(dt: DataType, isNullable: Boolean, name: String,
                          namespace: String): ASchema = {
    val base = dt match {
      case BooleanType => ASchema.create(ASchema.Type.BOOLEAN)
      case IntegerType | ShortType | ByteType => ASchema.create(ASchema.Type.INT)
      case LongType => ASchema.create(ASchema.Type.LONG)
      case FloatType => ASchema.create(ASchema.Type.FLOAT)
      case DoubleType => ASchema.create(ASchema.Type.DOUBLE)
      case StringType => ASchema.create(ASchema.Type.STRING)
      case BinaryType => ASchema.create(ASchema.Type.BYTES)
      case DateType =>
        LogicalTypes.date().addToSchema(ASchema.create(ASchema.Type.INT))
      case TimestampType =>
        LogicalTypes.timestampMicros().addToSchema(ASchema.create(ASchema.Type.LONG))
      case TimestampNTZType =>
        LogicalTypes.localTimestampMicros().addToSchema(ASchema.create(ASchema.Type.LONG))
      case s: StructType => structToRecord(s, name + "_rec", namespace)
      case ArrayType(et, en) =>
        ASchema.createArray(fieldSchema(et, en, name + "_item", namespace))
      case MapType(StringType, vt, vn) =>
        ASchema.createMap(fieldSchema(vt, vn, name + "_value", namespace))
      case other =>
        throw new IllegalArgumentException(
          s"unsupported Spark type for Avro write: $other (field $name)")
    }
    if (isNullable) nullable(base) else base
  }

  private def structToRecord(st: StructType, name: String, namespace: String): ASchema = {
    val rec = ASchema.createRecord(name, null, namespace, false)
    rec.setFields(st.fields.map { f =>
      new ASchema.Field(f.name, fieldSchema(f.dataType, f.nullable, f.name, namespace),
        null, if (f.nullable) ASchema.Field.NULL_DEFAULT_VALUE else null)
    }.toList.asJava)
    rec
  }

  // ---- values: Avro -> external Row ----

  private def nonNullBranch(s: ASchema): ASchema =
    if (s.getType == ASchema.Type.UNION)
      s.getTypes.asScala.find(_.getType != ASchema.Type.NULL).getOrElse(s)
    else s

  private def fromAvro(v: Any, s0: ASchema): Any = {
    if (v == null) return null
    val s = nonNullBranch(s0)
    s.getType match {
      case ASchema.Type.STRING | ASchema.Type.ENUM => v.toString
      case ASchema.Type.BYTES =>
        val bb = v.asInstanceOf[ByteBuffer].duplicate()
        val out = new Array[Byte](bb.remaining()); bb.get(out); out
      case ASchema.Type.FIXED => v.asInstanceOf[GenericFixed].bytes().clone()
      case ASchema.Type.INT if s.getLogicalType.isInstanceOf[LogicalTypes.Date] =>
        LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong)
      case ASchema.Type.LONG => s.getLogicalType match {
        case _: LogicalTypes.TimestampMicros =>
          val us = v.asInstanceOf[Long]
          Instant.ofEpochSecond(Math.floorDiv(us, 1000000L),
            Math.floorMod(us, 1000000L) * 1000L)
        case _: LogicalTypes.TimestampMillis =>
          Instant.ofEpochMilli(v.asInstanceOf[Long])
        case _: LogicalTypes.LocalTimestampMicros =>
          val us = v.asInstanceOf[Long]
          java.time.LocalDateTime.ofEpochSecond(Math.floorDiv(us, 1000000L),
            (Math.floorMod(us, 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC)
        case _: LogicalTypes.LocalTimestampMillis =>
          val ms = v.asInstanceOf[Long]
          java.time.LocalDateTime.ofEpochSecond(Math.floorDiv(ms, 1000L),
            (Math.floorMod(ms, 1000L) * 1000000L).toInt, java.time.ZoneOffset.UTC)
        case _ => v
      }
      case ASchema.Type.RECORD => toRow(v.asInstanceOf[GenericRecord], s)
      case ASchema.Type.ARRAY =>
        val es = s.getElementType
        v.asInstanceOf[java.util.Collection[AnyRef]].asScala
          .map(fromAvro(_, es)).toSeq
      case ASchema.Type.MAP =>
        val vs = s.getValueType
        v.asInstanceOf[java.util.Map[AnyRef, AnyRef]].asScala
          .map { case (k, mv) => k.toString -> fromAvro(mv, vs) }.toMap
      case _ => v // boolean/int/long/float/double arrive as their JVM boxes
    }
  }

  private def toRow(rec: GenericRecord, s: ASchema): Row =
    Row.fromSeq(s.getFields.asScala.toSeq.map(f => fromAvro(rec.get(f.pos()), f.schema())))

  // ---- values: external Row -> Avro ----

  private def toAvroValue(v: Any, s0: ASchema): AnyRef = {
    if (v == null) return null
    val s = nonNullBranch(s0)
    (v, s.getType) match {
      case (d: java.sql.Date, _) => Int.box(d.toLocalDate.toEpochDay.toInt)
      case (d: LocalDate, _) => Int.box(d.toEpochDay.toInt)
      case (t: java.sql.Timestamp, _) =>
        // floorDiv: getTime's millis and getNanos overlap in the
        // sub-second part; floor (not truncate) keeps pre-1970 instants right
        Long.box(Math.addExact(
          Math.multiplyExact(Math.floorDiv(t.getTime, 1000L), 1000000L),
          t.getNanos / 1000L))
      case (t: Instant, _) =>
        Long.box(Math.addExact(Math.multiplyExact(t.getEpochSecond, 1000000L),
          t.getNano / 1000L))
      case (t: java.time.LocalDateTime, _) =>
        Long.box(Math.addExact(
          Math.multiplyExact(t.toEpochSecond(java.time.ZoneOffset.UTC), 1000000L),
          t.getNano / 1000L))
      case (b: Array[Byte], _) => ByteBuffer.wrap(b)
      case (r: Row, ASchema.Type.RECORD) =>
        val rec = new GenericData.Record(s)
        var i = 0
        val fields = s.getFields
        while (i < fields.size()) {
          rec.put(i, toAvroValue(r.get(i), fields.get(i).schema())); i += 1
        }
        rec
      case (xs: scala.collection.Seq[_], ASchema.Type.ARRAY) =>
        val es = s.getElementType
        xs.map(x => toAvroValue(x, es)).asJava
      case (m: scala.collection.Map[_, _], ASchema.Type.MAP) =>
        val vs = s.getValueType
        m.map { case (k, mv) => k.toString -> toAvroValue(mv, vs) }.asJava
      case (sh: Short, _) => Int.box(sh.toInt)
      case (by: Byte, _) => Int.box(by.toInt)
      case _ => v.asInstanceOf[AnyRef]
    }
  }

  // ---- read / write ----

  /** Writer schema of the directory: first `*.avro` file's header (a
    * metadata-only open — reads the header block, not the data). */
  def writerSchema(spark: SparkSession, path: String): ASchema = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val file =
      if (fs.getFileStatus(p).isFile) p
      else fs.listStatus(p).map(_.getPath)
        .filter(_.getName.endsWith(".avro")).sortBy(_.getName).headOption
        .getOrElse(throw new IllegalArgumentException(s"no .avro files under $path"))
    val in = fs.open(file)
    try {
      val stream = new org.apache.avro.file.DataFileStream[GenericRecord](
        in, new org.apache.avro.generic.GenericDatumReader[GenericRecord]())
      try stream.getSchema finally stream.close()
    } finally in.close()
  }

  def read(spark: SparkSession, path: String): DataFrame = {
    val avroSchema = writerSchema(spark, path)
    val sparkSchema = toSparkStruct(avroSchema)
    val schemaJson = avroSchema.toString
    val rdd = spark.sparkContext.newAPIHadoopFile(
        path,
        classOf[AvroKeyInputFormat[GenericRecord]],
        classOf[AvroKey[GenericRecord]],
        classOf[NullWritable])
      .mapPartitions { it =>
        val sch = new ASchema.Parser().parse(schemaJson)
        // convert NOW: the Hadoop reader reuses the AvroKey's datum
        it.map { case (k, _) => toRow(k.datum(), sch) }
      }
    spark.createDataFrame(rdd, sparkSchema)
  }

  /** Overwrite `path` with the frame as deflate-compressed Avro container
    * files (one per partition) through the Hadoop committer. */
  def write(df: DataFrame, path: String, codec: String = "deflate"): Unit = {
    require(df.schema.fields.nonEmpty, "cannot write a zero-column frame to Avro")
    val spark = df.sparkSession
    val avroSchema = toAvroSchema(df.schema)
    val schemaJson = avroSchema.toString
    val job = Job.getInstance(spark.sparkContext.hadoopConfiguration)
    AvroJob.setOutputKeySchema(job, avroSchema)
    job.getConfiguration.setBoolean("mapreduce.output.fileoutputformat.compress", true)
    job.getConfiguration.set("avro.output.codec", codec)
    val out = new Path(path)
    val fs = out.getFileSystem(job.getConfiguration)
    if (fs.exists(out)) fs.delete(out, true)
    df.rdd.mapPartitions { it =>
      val sch = new ASchema.Parser().parse(schemaJson)
      it.map { r =>
        (new AvroKey[GenericRecord](
          toAvroValue(r, sch).asInstanceOf[GenericRecord]), NullWritable.get())
      }
    }.saveAsNewAPIHadoopFile(path, classOf[AvroKey[GenericRecord]],
      classOf[NullWritable], classOf[AvroKeyOutputFormat[GenericRecord]],
      job.getConfiguration)
  }
}

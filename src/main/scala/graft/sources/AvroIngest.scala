package graft.sources

import java.math.{BigInteger, MathContext}
import java.nio.ByteBuffer
import java.sql.{Date => SqlDate, Timestamp => SqlTimestamp}
import java.time.{Instant, LocalDate, LocalDateTime, ZoneOffset}

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema => AvroSchema}
import org.apache.avro.file.{CodecFactory, DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.{AvroKey, FsInput}
import org.apache.avro.mapreduce.AvroKeyInputFormat
import org.apache.avro.util.Utf8
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.NullWritable
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro object-container-file source and sink.
  *
  * Avro is the REFERENCE's internal IR: its converter maps every CSV
  * row into an Avro `GenericRecord` (`CsvToParquetConverter.java:154`)
  * against a schema mirrored from the declared table schema with
  * all-nullable unions (`CsvToParquetConverter.java:52-74`), then hands
  * the records to `AvroParquetWriter`. This module makes the same
  * record model first-class as a FILE format: a directory of `.avro`
  * container files is a table you can scan, and any DataFrame can be
  * exported as one.
  *
  * Spark-first design notes:
  *   - READ is splittable. Avro container files carry a 16-byte sync
  *     marker between blocks, so `AvroKeyInputFormat` (avro-mapred)
  *     can start a task at any byte offset and resync — one 10 GB file
  *     fans out across executors exactly like parquet row groups. We
  *     go through `newAPIHadoopFile` and convert each `GenericRecord`
  *     to a `Row` INSIDE the same task (the input format reuses the
  *     record object; nothing leaves the partition un-copied), then
  *     `createDataFrame` so Catalyst sees an ordinary relation.
  *   - WRITE is one container file per partition via the Hadoop
  *     FileSystem API (temp + rename per file, so a killed task never
  *     leaves a half-written visible file) — the same per-partition
  *     imperative IO shape Spark's own sinks use. Snappy-compressed
  *     blocks, mirroring the reference's parquet codec choice.
  *   - The schema mapping follows parquet-avro's conventions so the
  *     reference's records round-trip: all-nullable unions
  *     `[null, T]`, date → int/`date`, timestamp → long/
  *     `timestamp-micros` (NTZ → `local-timestamp-micros`), decimal →
  *     bytes/`decimal(p,s)` two's-complement unscaled.
  */
object AvroIngest {

  /** Hadoop `Configuration` is not `java.io.Serializable`; ship it to
    * tasks via its own Writable serialization (the standard wrapper
    * pattern — Spark keeps its equivalent private to `spark`). */
  private class HConf(@transient var value: Configuration)
      extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject()
      value.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      value = new Configuration(false)
      value.readFields(in)
    }
  }

  // ---------------------------------------------------------------
  // schema mapping: StructType <-> Avro record schema
  // ---------------------------------------------------------------

  /** Spark field → nullable-union Avro field schema (reference's
    * all-nullable-union convention, `CsvToParquetConverter.java:60`). */
  private def toAvroType(dt: DataType): AvroSchema = {
    def prim(t: AvroSchema.Type) = AvroSchema.create(t)
    val base = dt match {
      case LongType    => prim(AvroSchema.Type.LONG)
      case IntegerType => prim(AvroSchema.Type.INT)
      case DoubleType  => prim(AvroSchema.Type.DOUBLE)
      case FloatType   => prim(AvroSchema.Type.FLOAT)
      case BooleanType => prim(AvroSchema.Type.BOOLEAN)
      case StringType  => prim(AvroSchema.Type.STRING)
      case BinaryType  => prim(AvroSchema.Type.BYTES)
      case DateType =>
        LogicalTypes.date().addToSchema(prim(AvroSchema.Type.INT))
      case TimestampType =>
        LogicalTypes.timestampMicros().addToSchema(prim(AvroSchema.Type.LONG))
      case TimestampNTZType =>
        LogicalTypes.localTimestampMicros().addToSchema(prim(AvroSchema.Type.LONG))
      case d: DecimalType =>
        LogicalTypes.decimal(d.precision, d.scale)
          .addToSchema(prim(AvroSchema.Type.BYTES))
      case other =>
        throw new IllegalArgumentException(s"unsupported Avro export type: $other")
    }
    AvroSchema.createUnion(java.util.List.of(
      AvroSchema.create(AvroSchema.Type.NULL), base))
  }

  def toAvroSchema(st: StructType, name: String = "graft_record"): AvroSchema = {
    val fields = st.fields.map { f =>
      new AvroSchema.Field(f.name, toAvroType(f.dataType), null,
        org.apache.avro.JsonProperties.NULL_VALUE)
    }
    AvroSchema.createRecord(name, null, "graft", false, fields.toSeq.asJava)
  }

  /** Avro (possibly union-wrapped) field schema → Spark type. */
  private def fromAvroType(s: AvroSchema): DataType = {
    val nonNull =
      if (s.getType == AvroSchema.Type.UNION)
        s.getTypes.asScala.filter(_.getType != AvroSchema.Type.NULL).toList match {
          case one :: Nil => one
          case other => throw new IllegalArgumentException(
            s"only [null, T] unions supported, got $other")
        }
      else s
    (nonNull.getType, Option(nonNull.getLogicalType).map(_.getName).orNull) match {
      case (AvroSchema.Type.LONG, "timestamp-micros")       => TimestampType
      case (AvroSchema.Type.LONG, "local-timestamp-micros") => TimestampNTZType
      case (AvroSchema.Type.LONG, _)                        => LongType
      case (AvroSchema.Type.INT, "date")                    => DateType
      case (AvroSchema.Type.INT, _)                         => IntegerType
      case (AvroSchema.Type.DOUBLE, _)                      => DoubleType
      case (AvroSchema.Type.FLOAT, _)                       => FloatType
      case (AvroSchema.Type.BOOLEAN, _)                     => BooleanType
      case (AvroSchema.Type.STRING, _)                      => StringType
      case (AvroSchema.Type.BYTES, "decimal") =>
        val lt = nonNull.getLogicalType.asInstanceOf[LogicalTypes.Decimal]
        DecimalType(lt.getPrecision, lt.getScale)
      case (AvroSchema.Type.BYTES, _)                       => BinaryType
      case (t, lt) =>
        throw new IllegalArgumentException(s"unsupported Avro read type: $t/$lt")
    }
  }

  def toStructType(avro: AvroSchema): StructType =
    StructType(avro.getFields.asScala.map { f =>
      StructField(f.name(), fromAvroType(f.schema()), nullable = true)
    }.toSeq)

  // ---------------------------------------------------------------
  // value conversion
  // ---------------------------------------------------------------

  private def toAvroValue(v: Any, dt: DataType): AnyRef = v match {
    case null => null
    case d: SqlDate => Int.box(d.toLocalDate.toEpochDay.toInt)
    case d: LocalDate => Int.box(d.toEpochDay.toInt)
    case t: SqlTimestamp =>
      val i = t.toInstant
      Long.box(i.getEpochSecond * 1000000L + i.getNano / 1000L)
    case t: Instant =>
      Long.box(t.getEpochSecond * 1000000L + t.getNano / 1000L)
    case t: LocalDateTime =>
      val i = t.toInstant(ZoneOffset.UTC)
      Long.box(i.getEpochSecond * 1000000L + i.getNano / 1000L)
    case d: java.math.BigDecimal =>
      val s = dt.asInstanceOf[DecimalType].scale
      ByteBuffer.wrap(d.setScale(s).unscaledValue().toByteArray)
    case d: BigDecimal =>
      toAvroValue(d.bigDecimal, dt)
    case b: Array[Byte] => ByteBuffer.wrap(b)
    case other => other.asInstanceOf[AnyRef]
  }

  private def fromAvroValue(v: Any, dt: DataType): Any = v match {
    case null => null
    case u: Utf8 => u.toString
    case other => dt match {
      case DateType =>
        SqlDate.valueOf(LocalDate.ofEpochDay(other.asInstanceOf[Int].toLong))
      case TimestampType =>
        val m = other.asInstanceOf[Long]
        SqlTimestamp.from(Instant.ofEpochSecond(
          Math.floorDiv(m, 1000000L), Math.floorMod(m, 1000000L) * 1000L))
      case TimestampNTZType =>
        val m = other.asInstanceOf[Long]
        LocalDateTime.ofEpochSecond(
          Math.floorDiv(m, 1000000L),
          (Math.floorMod(m, 1000000L) * 1000L).toInt, ZoneOffset.UTC)
      case d: DecimalType =>
        val bb = other.asInstanceOf[ByteBuffer]
        val bytes = new Array[Byte](bb.remaining()); bb.duplicate().get(bytes)
        new java.math.BigDecimal(new BigInteger(bytes), d.scale,
          new MathContext(d.precision))
      case BinaryType =>
        val bb = other.asInstanceOf[ByteBuffer]
        val bytes = new Array[Byte](bb.remaining()); bb.duplicate().get(bytes)
        bytes
      case _ => other
    }
  }

  // ---------------------------------------------------------------
  // sink
  // ---------------------------------------------------------------

  /** Write `df` as a directory of snappy-compressed `.avro` container
    * files, one per partition, temp+rename visibility (K2 contract). */
  def write(df: DataFrame, outDir: String): Unit = {
    val st = df.schema
    val avroJson = toAvroSchema(st).toString
    val hconf = new HConf(df.sparkSession.sparkContext.hadoopConfiguration)
    val out = new Path(outDir)
    val fs0 = out.getFileSystem(hconf.value)
    if (fs0.exists(out)) fs0.delete(out, true)
    fs0.mkdirs(out)
    df.rdd.mapPartitionsWithIndex { (idx, rows) =>
      val schema = new AvroSchema.Parser().parse(avroJson)
      val fs = new Path(outDir).getFileSystem(hconf.value)
      val tmp = new Path(outDir, f".part-$idx%05d.avro.inprogress")
      val fin = new Path(outDir, f"part-$idx%05d.avro")
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](schema))
      w.setCodec(CodecFactory.snappyCodec())
      val os = fs.create(tmp, true)
      w.create(schema, os)
      var n = 0L
      rows.foreach { row =>
        val rec = new GenericData.Record(schema)
        var i = 0
        while (i < st.length) {
          rec.put(i, toAvroValue(row.get(i), st(i).dataType))
          i += 1
        }
        w.append(rec); n += 1
      }
      w.close()
      fs.rename(tmp, fin)
      Iterator.single(n)
    }.count(): Unit
  }

  // ---------------------------------------------------------------
  // source
  // ---------------------------------------------------------------

  /** Read the writer schema from the first container file's header —
    * metadata-sized driver IO, same role as parquet footer reads. */
  def writerSchema(spark: SparkSession, dir: String): AvroSchema = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    val file = fs.listStatus(p).map(_.getPath)
      .filter(_.getName.endsWith(".avro")).sortBy(_.getName)
      .headOption.getOrElse(throw new IllegalArgumentException(
        s"no .avro files under $dir"))
    val in = new FsInput(file, conf)
    try {
      val r = DataFileReader.openReader(
        in, new GenericDatumReader[GenericRecord]())
      try r.getSchema finally r.close()
    } finally in.close()
  }

  /** Scan a directory of Avro container files as a DataFrame.
    * Sync-marker splittable: `maxSplitBytes` (test knob) forces
    * multiple input splits per file to prove mid-file resync. */
  def read(spark: SparkSession, dir: String,
           maxSplitBytes: Option[Long] = None): DataFrame = {
    val avro = writerSchema(spark, dir)
    val st = toStructType(avro)
    val conf = new Configuration(spark.sparkContext.hadoopConfiguration)
    conf.set("avro.schema.input.key", avro.toString)
    maxSplitBytes.foreach { b =>
      conf.setLong("mapreduce.input.fileinputformat.split.maxsize", b)
    }
    val dts = st.fields.map(_.dataType)
    val rows = spark.sparkContext.newAPIHadoopFile(
      s"$dir/*.avro",
      classOf[AvroKeyInputFormat[GenericRecord]],
      classOf[AvroKey[GenericRecord]],
      classOf[NullWritable],
      conf
    ).mapPartitions { it =>
      // Row conversion happens here, in the SAME task as the record
      // read: AvroKeyInputFormat reuses its datum, so values must be
      // materialized before leaving the partition iterator.
      it.map { case (k, _) =>
        val rec = k.datum()
        val vals = new Array[Any](dts.length)
        var i = 0
        while (i < dts.length) {
          vals(i) = fromAvroValue(rec.get(i), dts(i))
          i += 1
        }
        Row.fromSeq(vals.toIndexedSeq)
      }
    }
    spark.createDataFrame(rows, st)
  }
}

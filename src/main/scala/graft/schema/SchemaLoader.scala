package graft.schema

import org.apache.spark.internal.Logging
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** JSON schema document → Spark `StructType`.
  *
  * Reproduces the semantics of the reference's schema compiler
  * (`SchemaLoader.java:30-92` in LanceZhuang/csv-parquet-s3), which
  * turns a JSON field list into a Parquet `MessageType`:
  *
  *   - per field: `name`, physical `type` (INT32 | INT64 | BINARY),
  *     optional `repetition` (default OPTIONAL — `SchemaLoader.java:41`),
  *     optional `logicalType` (DATE | TIMESTAMP_MICROS | STRING |
  *     DECIMAL), `precision`/`scale` for decimals
  *     (`SchemaLoader.java:43-44`);
  *   - invalid repetition strings degrade to OPTIONAL with a warning
  *     (`SchemaLoader.java:49-52`);
  *   - unknown logical types warn and fall through to the bare
  *     physical type (`SchemaLoader.java:83-85`);
  *   - unknown physical types are a hard error
  *     (`SchemaLoader.java:65-66`);
  *   - nested/group types are rejected
  *     (`CsvToParquetConverter.java:77-79`).
  *
  * The Spark mapping (SURVEY.md §1): INT32→IntegerType (+DATE→DateType),
  * INT64→LongType (+TIMESTAMP_MICROS→TimestampNTZType, matching the
  * reference's isAdjustedToUTC=false), BINARY+STRING→StringType,
  * BINARY+DECIMAL(p,s)→DecimalType(p,s). `nullable` is REQUIRED-driven
  * rather than mirrored all-nullable (the reference's Avro mirror makes
  * everything nullable; we keep the declared repetition, which is
  * strictly more faithful to the Parquet schema it writes).
  */
object SchemaLoader extends Logging {

  /** Expected JSON shape: `{"fields": [{"name": ..., "type": ...,
    * "repetition": ..., "logicalType": ..., "precision": ..,
    * "scale": ..}, ...]}` — same as the reference's schema.json. */
  def fromJson(json: String): StructType = {
    val root = JsonMethods.parse(json)
    val fields = root \ "fields" match {
      case JArray(fs) => fs
      case _ => throw new IllegalArgumentException(
        "schema JSON must have a top-level \"fields\" array")
    }
    StructType(fields.map(parseField))
  }

  def fromJsonFile(path: String): StructType =
    fromJson(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))

  private def str(v: JValue): Option[String] = v match {
    case JString(s) => Some(s)
    case _ => None
  }

  private def int(v: JValue): Option[Int] = v match {
    case JInt(i) => Some(i.toInt)
    case JLong(i) => Some(i.toInt)
    case _ => None
  }

  private def parseField(f: JValue): StructField = {
    val name = str(f \ "name").getOrElse(
      throw new IllegalArgumentException(s"field missing name: $f"))
    val physical = str(f \ "type").getOrElse(
      throw new IllegalArgumentException(s"field $name missing type"))
    val logical = str(f \ "logicalType")
    // Invalid repetition degrades to OPTIONAL with a warning
    // (reference SchemaLoader.java:49-52).
    val nullable = str(f \ "repetition").map(_.toUpperCase) match {
      case Some("REQUIRED") => false
      case Some("OPTIONAL") | None => true
      case Some(other) =>
        logWarning(s"field $name: invalid repetition '$other', " +
          "defaulting to OPTIONAL")
        true
    }
    val dt = dataTypeFor(name, physical, logical,
      int(f \ "precision"), int(f \ "scale"))
    StructField(name, dt, nullable)
  }

  private def dataTypeFor(name: String, physical: String,
      logical: Option[String], precision: Option[Int],
      scale: Option[Int]): DataType = {
    val logUp = logical.map(_.toUpperCase)
    physical.toUpperCase match {
      case "INT32" => logUp match {
        case Some("DATE") => DateType
        case None => IntegerType
        case Some(other) =>
          logWarning(s"field $name: unknown logical type '$other' on " +
            "INT32, using plain INT32")
          IntegerType
      }
      case "INT64" => logUp match {
        case Some("TIMESTAMP_MICROS") => TimestampNTZType
        case None => LongType
        case Some(other) =>
          logWarning(s"field $name: unknown logical type '$other' on " +
            "INT64, using plain INT64")
          LongType
      }
      case "BINARY" => logUp match {
        case Some("STRING") => StringType
        case Some("DECIMAL") =>
          DecimalType(precision.getOrElse(10), scale.getOrElse(2))
        case None => BinaryType
        case Some(other) =>
          logWarning(s"field $name: unknown logical type '$other' on " +
            "BINARY, using plain BINARY")
          BinaryType
      }
      // Nested / group types are rejected like the reference
      // (CsvToParquetConverter.java:77-79); unknown physical types are
      // a hard error (SchemaLoader.java:65-66).
      case other => throw new IllegalArgumentException(
        s"field $name: unsupported physical type '$other'")
    }
  }
}

package graft.pinot

import org.apache.spark.sql.types._

/** Pinot column data types (reference: pinot-segment/src/metadata.rs:7-29).
  *
  * The reference's readable subset is INT/LONG/FLOAT/DOUBLE/STRING; it
  * declares BYTES/BOOLEAN but rejects them (dictionary.rs:125-134). We
  * implement all three storage-extension types the way Apache Pinot itself
  * models them: BOOLEAN stored as INT 0/1, TIMESTAMP stored as LONG epoch
  * millis, BYTES as var-length byte arrays (length-prefixed dictionary
  * entries, or RAW VarByteChunk V4 like strings).
  */
sealed abstract class PinotType(val name: String) {
  /** Spark SQL equivalent (reference maps to Arrow in schema.rs:8-18). */
  def sparkType: DataType
}

object PinotType {
  case object PInt extends PinotType("INT") { val sparkType: DataType = IntegerType }
  case object PLong extends PinotType("LONG") { val sparkType: DataType = LongType }
  case object PFloat extends PinotType("FLOAT") { val sparkType: DataType = FloatType }
  case object PDouble extends PinotType("DOUBLE") { val sparkType: DataType = DoubleType }
  case object PString extends PinotType("STRING") { val sparkType: DataType = StringType }
  case object PBytes extends PinotType("BYTES") { val sparkType: DataType = BinaryType }
  case object PBoolean extends PinotType("BOOLEAN") { val sparkType: DataType = BooleanType }
  case object PTimestamp extends PinotType("TIMESTAMP") { val sparkType: DataType = TimestampType }
  /** JSON documents, stored exactly like STRING (Apache Pinot's JSON
    * storage type); surfaces as StringType for Spark's json functions.
    */
  case object PJson extends PinotType("JSON") { val sparkType: DataType = StringType }
  /** Arbitrary-precision decimals, stored as var-length bytes: 2-byte
    * big-endian scale + big-endian unscaled value (Apache Pinot's
    * BigDecimal serialization). Surfaces as DecimalType(38, 18); stored
    * scales must be <= 18 so the widening is exact.
    */
  case object PBigDecimal extends PinotType("BIG_DECIMAL") {
    val sparkType: DataType = DecimalType(38, 18)
  }

  val all: Seq[PinotType] =
    Seq(PInt, PLong, PFloat, PDouble, PString, PBytes, PBoolean, PTimestamp,
      PJson, PBigDecimal)

  def fromString(s: String): PinotType =
    all.find(_.name == s).getOrElse(
      throw new PinotFormatException(s"Unknown data type: $s"))
}

/** Single exception type for segment-format errors (≙ reference error.rs). */
class PinotFormatException(msg: String) extends RuntimeException(msg)

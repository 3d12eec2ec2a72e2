package graft.pinot

import org.apache.spark.sql.types._

/** Pinot column data types (reference: pinot-segment/src/metadata.rs:7-29).
  *
  * The reference's readable subset is INT/LONG/FLOAT/DOUBLE/STRING; BYTES and
  * BOOLEAN are declared but unreadable there. We keep the full enum so the
  * schema layer can reject them with a clear message, matching capability.
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

  val all: Seq[PinotType] = Seq(PInt, PLong, PFloat, PDouble, PString, PBytes, PBoolean)

  def fromString(s: String): PinotType =
    all.find(_.name == s).getOrElse(
      throw new PinotFormatException(s"Unknown data type: $s"))
}

/** Single exception type for segment-format errors (≙ reference error.rs). */
class PinotFormatException(msg: String) extends RuntimeException(msg)

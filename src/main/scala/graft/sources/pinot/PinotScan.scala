package graft.sources.pinot

import graft.pinot.{PinotDictionary, PinotType, SegmentReader}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, In}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}
import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
import org.apache.spark.unsafe.types.UTF8String

/** Scan pipeline: one [[InputPartition]] per segment (the segment is the
  * unit of parallelism, reference: exec.rs:41,52), column pruning pushed
  * down (reference accepts projection indices, table.rs:161), and an
  * empty-projection row-count path for `COUNT(*)`
  * (reference: exec.rs:92-95,157-162).
  *
  * Scale note: at 100 TB a table is many thousands of segments; since each
  * partition maps to one segment and Spark schedules partitions across
  * executors, the design parallelizes linearly — no driver-side
  * materialization anywhere.
  */
class PinotScanBuilder(segmentPaths: Seq[String], fullSchema: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownLimit {

  private var projected: StructType = fullSchema
  private var skipFilters: Array[Filter] = Array.empty
  private var limit: Option[Int] = None

  // Catalyst's ColumnPruning hands us the required columns; we keep their
  // names and decode only those (≙ SupportsPushDownRequiredColumns).
  override def pruneColumns(requiredSchema: StructType): Unit =
    projected = requiredSchema

  /** Equality/IN filters are accepted as ADVISORY: each partition consults
    * the segment's per-column dictionary and skips the whole segment when
    * the value cannot occur (Pinot-style segment pruning; an extension
    * beyond the reference, which ignores filters — table.rs:162). Every
    * filter is also returned as residual, so Spark still evaluates it —
    * pruning can only skip, never change results.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    skipFilters = filters.filter {
      case _: EqualTo | _: In => true
      case _ => false
    }
    filters // all residual: engine-side FilterExec remains authoritative
  }

  override def pushedFilters(): Array[Filter] = skipFilters

  /** Per-partition row cap; Spark keeps the global limit above the scan
    * (isPartiallyPushed defaults to true). Bounds decode work per segment.
    */
  override def pushLimit(l: Int): Boolean = {
    limit = Some(l)
    true
  }

  override def build(): Scan =
    new PinotScan(segmentPaths, projected, skipFilters, limit)
}

class PinotScan(segmentPaths: Seq[String], projected: StructType,
    skipFilters: Array[Filter], limit: Option[Int])
    extends Scan with Batch with SupportsReportStatistics {

  override def readSchema(): StructType = projected

  /** Row counts come free from segment metadata (`segment.total.docs`) —
    * feeds Catalyst's CBO (e.g. auto-broadcast decisions) without
    * touching column data.
    */
  override def estimateStatistics(): Statistics = new Statistics {
    private lazy val rows: Long = segmentPaths.map { p =>
      try SegmentReader.open(p).totalDocs.toLong catch { case _: Throwable => 0L }
    }.sum
    private lazy val width: Long = projected.fields.map(_.dataType match {
      case org.apache.spark.sql.types.StringType => 24L
      case dt => math.max(dt.defaultSize.toLong, 4L)
    }).sum.max(8L)
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(rows * width)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.of(rows)
  }
  override def toBatch: Batch = this
  override def description(): String =
    s"PinotScan(segments=${segmentPaths.length}, " +
      s"columns=${projected.fieldNames.mkString(",")}, " +
      s"skipFilters=[${skipFilters.mkString(",")}], " +
      s"limit=${limit.getOrElse(-1)})"

  override def planInputPartitions(): Array[InputPartition] =
    segmentPaths.map(p => PinotInputPartition(p): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new PinotReaderFactory(projected.fieldNames, skipFilters, limit)
}

case class PinotInputPartition(segmentPath: String) extends InputPartition

class PinotReaderFactory(columns: Array[String], skipFilters: Array[Filter],
    limit: Option[Int]) extends PartitionReaderFactory {

  override def supportColumnarReads(partition: InputPartition): Boolean = true

  override def createReader(partition: InputPartition): PartitionReader[org.apache.spark.sql.catalyst.InternalRow] =
    throw new UnsupportedOperationException("columnar-only reader")

  override def createColumnarReader(partition: InputPartition): PartitionReader[ColumnarBatch] = {
    val path = partition.asInstanceOf[PinotInputPartition].segmentPath
    new PinotColumnarReader(path, columns, skipFilters, limit)
  }
}

/** Reads one segment: decodes each projected column **once** into primitive
  * arrays (≙ read_columns_once, exec.rs:66-148), then emits 8,192-row
  * `ColumnarBatch`es (BATCH_SIZE, exec.rs:24). An empty projection decodes
  * nothing and emits row-count-only batches.
  */
class PinotColumnarReader(segmentPath: String, columns: Array[String],
    skipFilters: Array[Filter] = Array.empty, limit: Option[Int] = None)
    extends PartitionReader[ColumnarBatch] {

  private val BatchSize = 8192

  private lazy val reader = SegmentReader.open(segmentPath)

  /** Dictionary-based segment pruning: a pushed equality/IN filter on a
    * dictionary-encoded column whose dictionary lacks every candidate
    * value proves the segment contributes no rows — skip it without
    * decoding any forward index (dictionaries are tiny vs columns).
    */
  private lazy val segmentCanMatch: Boolean = skipFilters.forall {
    case EqualTo(attr, value) => dictMayContain(attr, Seq(value))
    case In(attr, values) => dictMayContain(attr, values.toSeq)
    case _ => true
  }

  private def dictMayContain(attr: String, values: Seq[Any]): Boolean = {
    val cm = try reader.metadata.column(attr)
      catch { case _: Throwable => return true }
    if (!cm.hasDictionary) return true // RAW column: cannot prune
    val dict = reader.dictionary(attr)
    values.exists(v => dictContains(dict, v))
  }

  private def dictContains(dict: PinotDictionary, v: Any): Boolean =
    (dict, v) match {
      case (PinotDictionary.Ints(a), x: Int) => a.contains(x)
      case (PinotDictionary.Longs(a), x: Long) => a.contains(x)
      case (PinotDictionary.Floats(a), x: Float) => a.contains(x)
      case (PinotDictionary.Doubles(a), x: Double) => a.contains(x)
      case (PinotDictionary.Strings(a), x: String) => a.contains(x)
      case (PinotDictionary.Strings(a), x: UTF8String) => a.contains(x.toString)
      case _ => true // unexpected type pairing: never prune on a guess
    }

  private lazy val totalDocs: Int = {
    val n = if (segmentCanMatch) reader.totalDocs else 0
    limit.fold(n)(math.min(n, _)) // per-partition limit cap
  }

  // Whole-column decode, once per segment (segments are bounded; the scan
  // above is what distributes — this mirrors the reference's eager model).
  // A pushed limit caps the decode itself, not just emission.
  private lazy val decoded: Array[(PinotType, AnyRef)] = columns.map { name =>
    val cm = reader.metadata.column(name)
    val cap = totalDocs
    cm.dataType match {
      case PinotType.PInt => (PinotType.PInt, reader.readIntColumn(name, cap))
      case PinotType.PLong => (PinotType.PLong, reader.readLongColumn(name, cap))
      case PinotType.PFloat => (PinotType.PFloat, reader.readFloatColumn(name, cap))
      case PinotType.PDouble => (PinotType.PDouble, reader.readDoubleColumn(name, cap))
      case PinotType.PString => (PinotType.PString, reader.readStringColumn(name, cap))
      case other => throw new graft.pinot.PinotFormatException(
        s"Unsupported column type for scan: ${other.name}")
    }
  }

  private var pos = 0
  private var current: ColumnarBatch = _

  override def next(): Boolean = {
    if (pos >= totalDocs) return false
    val n = math.min(BatchSize, totalDocs - pos)
    current = if (columns.isEmpty) {
      new ColumnarBatch(Array.empty[ColumnVector], n) // COUNT(*) rows-only
    } else {
      val vectors = decoded.map { case (tpe, data) =>
        val vec = new OnHeapColumnVector(n, tpe.sparkType)
        tpe match {
          case PinotType.PInt =>
            val a = data.asInstanceOf[Array[Int]]
            var i = 0; while (i < n) { vec.putInt(i, a(pos + i)); i += 1 }
          case PinotType.PLong =>
            val a = data.asInstanceOf[Array[Long]]
            var i = 0; while (i < n) { vec.putLong(i, a(pos + i)); i += 1 }
          case PinotType.PFloat =>
            val a = data.asInstanceOf[Array[Float]]
            var i = 0; while (i < n) { vec.putFloat(i, a(pos + i)); i += 1 }
          case PinotType.PDouble =>
            val a = data.asInstanceOf[Array[Double]]
            var i = 0; while (i < n) { vec.putDouble(i, a(pos + i)); i += 1 }
          case PinotType.PString =>
            val a = data.asInstanceOf[Array[String]]
            var i = 0
            while (i < n) {
              val bytes = a(pos + i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
              vec.putByteArray(i, bytes, 0, bytes.length)
              i += 1
            }
          case _ => ()
        }
        vec: ColumnVector
      }
      new ColumnarBatch(vectors, n)
    }
    pos += n
    true
  }

  override def get(): ColumnarBatch = current

  override def close(): Unit = {
    if (current != null) current.close()
  }
}

package graft.sources.pinot

import graft.pinot.{PinotDictionary, PinotType, SegmentReader}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.unsafe.types.UTF8String

/** Pushed GROUP BY over a dictionary-encoded column, answered from
  * dictionary-id HISTOGRAMS (EXTENSION — the reference delegates all
  * aggregation to DataFusion, exec.rs:150-214; Pinot itself aggregates
  * over dict ids the same way in its v1 group-by executor).
  *
  * Per segment task: one pass over the group column's packed id stream
  * (and each metric's ids/raw values) in 8192-row windows, accumulating
  * `cardinality`-sized primitive arrays — `counts[gid]++`,
  * `sums[gid] += dictVal[mid]`. One (key, partials) row per OCCUPIED
  * dictionary entry comes back; Spark's final aggregate merges across
  * segments. The win over decoding into ColumnarBatches: group keys are
  * never materialized per row (no per-row UTF8String, no hash probe —
  * the dictionary id IS the hash table slot), and only the final
  * `cardinality` rows cross the scan boundary instead of `totalDocs`.
  *
  * At 100 TB: per-task memory is O(cardinality × aggregates), bounded by
  * the builder's cardinality cap, independent of segment row count.
  */
sealed trait HistAggSpec
object HistAggSpec {
  /** COUNT(*) or COUNT(non-nullable col) — the histogram itself. */
  case object HCount extends HistAggSpec
  final case class HSum(column: String) extends HistAggSpec
  final case class HMin(column: String) extends HistAggSpec
  final case class HMax(column: String) extends HistAggSpec
  /** Only under COMPLETE (single-segment) pushdown — partial pushdown
    * sees AVG rewritten to SUM+COUNT by Spark.
    */
  final case class HAvg(column: String) extends HistAggSpec
}

/** `groupCol = None` is the GLOBAL-aggregate case: one synthetic group
  * (card 1, all-zero ids), one partial row per segment — the path that
  * pushes global SUM/AVG, which metadata alone can never answer.
  */
class PinotHistAggReaderFactory(groupCol: Option[String],
    specs: Array[HistAggSpec]) extends PartitionReaderFactory {

  import HistAggSpec._

  private val Window = 8192

  /** Windowed numeric value source for a metric column: integral columns
    * surface as longs, fractional as doubles — matching Spark's SUM
    * buffer types, exact for MIN/MAX emission.
    */
  private sealed trait NumWindow
  private final class LongWindow(val read: (Int, Int) => Array[Long]) extends NumWindow
  private final class DoubleWindow(val read: (Int, Int) => Array[Double]) extends NumWindow

  private def numWindow(reader: SegmentReader, col: String): NumWindow = {
    val cm = reader.metadata.column(col)
    if (cm.hasDictionary) {
      lazy val fbr = reader.dictIdReader(col)
      (reader.dictionary(col), cm.dataType) match {
        case (PinotDictionary.Ints(v), _) => new LongWindow((p, n) => {
          val ids = fbr.readRange(p, n); val out = new Array[Long](n)
          var i = 0; while (i < n) { out(i) = v(ids(i)); i += 1 }; out
        })
        case (PinotDictionary.Longs(v), _) => new LongWindow((p, n) => {
          val ids = fbr.readRange(p, n); val out = new Array[Long](n)
          var i = 0; while (i < n) { out(i) = v(ids(i)); i += 1 }; out
        })
        case (PinotDictionary.Floats(v), _) => new DoubleWindow((p, n) => {
          val ids = fbr.readRange(p, n); val out = new Array[Double](n)
          var i = 0; while (i < n) { out(i) = v(ids(i)); i += 1 }; out
        })
        case (PinotDictionary.Doubles(v), _) => new DoubleWindow((p, n) => {
          val ids = fbr.readRange(p, n); val out = new Array[Double](n)
          var i = 0; while (i < n) { out(i) = v(ids(i)); i += 1 }; out
        })
        case (other, t) => throw new graft.pinot.PinotFormatException(
          s"histogram agg: unsupported metric dictionary $other for $col:${t.name}")
      }
    } else {
      lazy val fb = reader.fixedByteReader(col)
      cm.dataType match {
        case PinotType.PInt => new LongWindow((p, n) => {
          val v = fb.readRangeInts(p, n); val out = new Array[Long](n)
          var i = 0; while (i < n) { out(i) = v(i); i += 1 }; out
        })
        case PinotType.PLong => new LongWindow((p, n) => fb.readRangeLongs(p, n))
        case PinotType.PFloat => new DoubleWindow((p, n) => {
          val v = fb.readRangeFloats(p, n); val out = new Array[Double](n)
          var i = 0; while (i < n) { out(i) = v(i); i += 1 }; out
        })
        case PinotType.PDouble => new DoubleWindow((p, n) => fb.readRangeDoubles(p, n))
        case other => throw new graft.pinot.PinotFormatException(
          s"histogram agg: unsupported RAW metric type ${other.name} for $col")
      }
    }
  }

  /** Per-spec accumulator over group ids; `result` emits the Catalyst
    * value in the readSchema's field type.
    */
  private sealed trait Acc {
    def add(gIds: Array[Int], pos: Int, n: Int): Unit
    def result(g: Int): Any
  }

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val path = partition.asInstanceOf[PinotAggPartition].segmentPath
    val reader = SegmentReader.open(path)
    val rows: Iterator[InternalRow] = try {
      val docs = reader.metadata.totalDocs
      if (docs == 0) Iterator.empty
      else {
        val gcm = groupCol.map(reader.metadata.column).orNull
        // Group-id window source: dictionary ids directly, or — for a
        // RAW string group column (single-segment complete pushdown
        // only) — slots assigned on first sight from the decoded
        // strings, pre-sized by the writer-recorded exact cardinality.
        // No group column at all = the global aggregate: one synthetic
        // group, all ids zero.
        var rawNames: Array[String] = null
        lazy val zeroWindow = new Array[Int](Window)
        val (card, gWindow): (Int, (Int, Int) => Array[Int]) =
          if (gcm == null) {
            (1, (_: Int, n: Int) =>
              if (n == Window) zeroWindow else new Array[Int](n))
          } else if (gcm.hasDictionary) {
            val gFbr = reader.dictIdReader(groupCol.get)
            (reader.dictionary(groupCol.get).size,
              (p: Int, n: Int) => gFbr.readRange(p, n))
          } else {
            val chunk = reader.rawChunkReader(groupCol.get)
            val c = gcm.cardinality
            if (c <= 0) throw new graft.pinot.PinotFormatException(
              s"histogram agg: no recorded cardinality for RAW $groupCol")
            val slotOf = new java.util.HashMap[String, Integer](c * 2)
            rawNames = new Array[String](c)
            var next = 0
            (c, (p: Int, n: Int) => {
              val raw = chunk.readRangeBytes(p, n)
              val ids = new Array[Int](n)
              var i = 0
              while (i < n) {
                val s = new String(raw(i), java.nio.charset.StandardCharsets.UTF_8)
                var slot = slotOf.get(s)
                if (slot == null) {
                  if (next >= c) throw new graft.pinot.PinotFormatException(
                    s"histogram agg: $groupCol exceeds recorded cardinality $c")
                  slot = Integer.valueOf(next)
                  slotOf.put(s, slot)
                  rawNames(next) = s
                  next += 1
                }
                ids(i) = slot.intValue()
                i += 1
              }
              ids
            })
          }
        val counts = new Array[Long](card)

        val metricType: Map[String, org.apache.spark.sql.types.DataType] =
          specs.collect {
            case HMin(c) => c -> reader.metadata.column(c).dataType.sparkType
            case HMax(c) => c -> reader.metadata.column(c).dataType.sparkType
          }.toMap

        val accs: Array[Acc] = specs.map {
          case HCount => new Acc {
            def add(g: Array[Int], p: Int, n: Int): Unit = ()
            def result(g: Int): Any = counts(g) // filled by the shared loop
          }
          case HAvg(c) => numWindow(reader, c) match {
            case lw: LongWindow => new Acc {
              private val s = new Array[Long](card)
              def add(g: Array[Int], p: Int, n: Int): Unit = {
                val v = lw.read(p, n)
                var i = 0; while (i < n) { s(g(i)) += v(i); i += 1 }
              }
              def result(g: Int): Any = s(g).toDouble / counts(g)
            }
            case dw: DoubleWindow => new Acc {
              private val s = new Array[Double](card)
              def add(g: Array[Int], p: Int, n: Int): Unit = {
                val v = dw.read(p, n)
                var i = 0; while (i < n) { s(g(i)) += v(i); i += 1 }
              }
              def result(g: Int): Any = s(g) / counts(g)
            }
          }
          case HSum(c) => numWindow(reader, c) match {
            case lw: LongWindow => new Acc {
              private val s = new Array[Long](card)
              def add(g: Array[Int], p: Int, n: Int): Unit = {
                val v = lw.read(p, n)
                var i = 0; while (i < n) { s(g(i)) += v(i); i += 1 }
              }
              def result(g: Int): Any = s(g)
            }
            case dw: DoubleWindow => new Acc {
              private val s = new Array[Double](card)
              def add(g: Array[Int], p: Int, n: Int): Unit = {
                val v = dw.read(p, n)
                var i = 0; while (i < n) { s(g(i)) += v(i); i += 1 }
              }
              def result(g: Int): Any = s(g)
            }
          }
          case HMin(c) => numWindow(reader, c) match {
            case lw: LongWindow => new Acc {
              private val s = Array.fill(card)(Long.MaxValue)
              def add(g: Array[Int], p: Int, n: Int): Unit = {
                val v = lw.read(p, n)
                var i = 0; while (i < n) {
                  if (v(i) < s(g(i))) s(g(i)) = v(i); i += 1 }
              }
              def result(g: Int): Any = emitLong(metricType(c), s(g))
            }
            case dw: DoubleWindow => new Acc {
              private val s = Array.fill(card)(Double.PositiveInfinity)
              def add(g: Array[Int], p: Int, n: Int): Unit = {
                val v = dw.read(p, n)
                var i = 0; while (i < n) {
                  if (v(i) < s(g(i))) s(g(i)) = v(i); i += 1 }
              }
              def result(g: Int): Any = emitDouble(metricType(c), s(g))
            }
          }
          case HMax(c) => numWindow(reader, c) match {
            case lw: LongWindow => new Acc {
              private val s = Array.fill(card)(Long.MinValue)
              def add(g: Array[Int], p: Int, n: Int): Unit = {
                val v = lw.read(p, n)
                var i = 0; while (i < n) {
                  if (v(i) > s(g(i))) s(g(i)) = v(i); i += 1 }
              }
              def result(g: Int): Any = emitLong(metricType(c), s(g))
            }
            case dw: DoubleWindow => new Acc {
              private val s = Array.fill(card)(Double.NegativeInfinity)
              def add(g: Array[Int], p: Int, n: Int): Unit = {
                val v = dw.read(p, n)
                var i = 0; while (i < n) {
                  if (v(i) > s(g(i))) s(g(i)) = v(i); i += 1 }
              }
              def result(g: Int): Any = emitDouble(metricType(c), s(g))
            }
          }
        }

        var pos = 0
        while (pos < docs) {
          val n = math.min(Window, docs - pos)
          val gIds = gWindow(pos, n)
          var i = 0
          while (i < n) { counts(gIds(i)) += 1; i += 1 }
          var a = 0
          while (a < accs.length) { accs(a).add(gIds, pos, n); a += 1 }
          pos += n
        }

        // dictionary id / slot → Catalyst group key (same translations
        // as the DISTINCT pushdown path); absent entirely for the
        // global-aggregate case
        val key: Int => Any = if (gcm == null) {
          _ => null // never emitted — row arity below excludes the key
        } else if (!gcm.hasDictionary) {
          id => UTF8String.fromString(rawNames(id))
        } else (reader.dictionary(groupCol.get), gcm.dataType) match {
          case (PinotDictionary.Ints(v), PinotType.PBoolean) => id => v(id) != 0
          case (PinotDictionary.Ints(v), _) => id => v(id)
          case (PinotDictionary.Longs(v), PinotType.PTimestamp) =>
            id => Math.multiplyExact(v(id), 1000L)
          case (PinotDictionary.Longs(v), _) => id => v(id)
          case (PinotDictionary.Floats(v), _) => id => v(id)
          case (PinotDictionary.Doubles(v), _) => id => v(id)
          case (PinotDictionary.Strings(v), _) =>
            id => UTF8String.fromString(v(id))
          case (other, t) => throw new graft.pinot.PinotFormatException(
            s"histogram agg: unsupported group dictionary $other for $groupCol:${t.name}")
        }
        val keyArity = if (gcm == null) 0 else 1
        Iterator.range(0, card).filter(counts(_) > 0).map { g =>
          val out = new Array[Any](keyArity + accs.length)
          if (keyArity == 1) out(0) = key(g)
          var a = 0
          while (a < accs.length) { out(keyArity + a) = accs(a).result(g); a += 1 }
          new GenericInternalRow(out): InternalRow
        }
      }
    } finally reader.close() // all sections are materialized above

    new PartitionReader[InternalRow] {
      private var cur: InternalRow = null
      override def next(): Boolean =
        if (rows.hasNext) { cur = rows.next(); true } else false
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
  }

  /** MIN/MAX surface in the metric column's own Spark type. */
  private def emitLong(t: org.apache.spark.sql.types.DataType, v: Long): Any =
    t match {
      case org.apache.spark.sql.types.IntegerType => v.toInt
      case _ => v
    }
  private def emitDouble(t: org.apache.spark.sql.types.DataType, v: Double): Any =
    t match {
      case org.apache.spark.sql.types.FloatType => v.toFloat
      case _ => v
    }
}

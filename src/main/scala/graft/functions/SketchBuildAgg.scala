package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, LongType, StringType}
import org.roaringbitmap.longlong.Roaring64Bitmap

import graft.pinot.SketchSection

/** Builds a [[graft.pinot.SketchSection]] payload QUERY-TIME from raw
  * rows — the delta half of the LAMBDA pattern: a year of cold segments
  * answers DISTINCT / percentiles from their few-KB STORED sketch
  * sections, today's un-sketched delta builds the SAME payload format on
  * the fly, and one merge aggregate ([[BitmapMergeAgg]] /
  * [[KmvMergeAgg]] / [[KllMergeAgg]] / [[HllMergeAgg]]) folds both —
  * exact composition guaranteed by the repo-wide hash contract (Spark
  * `xxhash64` seed 42 everywhere a sketch hashes).
  *
  * Input column type per spec: `bitmap` takes the raw bigint values
  * (strings: feed `xxhash64(col)` — the same trade the stored section
  * makes); `kmv<k>` and `hll<p>` take pre-hashed bigints (feed
  * `xxhash64(col)`); `kll<k>` takes doubles; `freq<c>` takes the raw
  * strings (heavy hitters report the values themselves).
  *
  * At 100 TB: the delta side is one bounded summary per partition
  * (map-side combine), and the output is ONE payload row that unions
  * with thousands of per-segment stored rows.
  */
case class SketchBuildAgg(
    child: Expression,
    specStr: String,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[SketchBuildAgg.Buffer] {

  @transient private lazy val spec: SketchSection.Spec =
    SketchSection.parseSpec(specStr)

  override def children: Seq[Expression] = Seq(child)

  override def nullable: Boolean = false

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    (SketchSection.parseSpec(specStr), child.dataType) match {
      case (SketchSection.KllSpec(_), DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (SketchSection.KllSpec(_), other) => TypeCheckResult.TypeCheckFailure(
        s"sketch_build(kll) requires a double input, got ${other.simpleString}")
      case (SketchSection.FreqSpec(_), StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case (SketchSection.FreqSpec(_), other) => TypeCheckResult.TypeCheckFailure(
        s"sketch_build(freq) requires a string input, got ${other.simpleString}")
      case (_, LongType) => TypeCheckResult.TypeCheckSuccess
      case (_, other) => TypeCheckResult.TypeCheckFailure(
        s"sketch_build($specStr) requires a bigint input, got ${other.simpleString}")
    }

  override def createAggregationBuffer(): SketchBuildAgg.Buffer =
    spec match {
      case SketchSection.KmvSpec(k) =>
        SketchBuildAgg.KmvBuf(new java.util.TreeSet[java.lang.Long](), k)
      case SketchSection.BitmapSpec =>
        SketchBuildAgg.BitmapBuf(new Roaring64Bitmap())
      case SketchSection.KllSpec(k) =>
        SketchBuildAgg.KllBuf(new KllSketchAgg.Buf(k))
      case SketchSection.HllSpec(p) =>
        SketchBuildAgg.HllBuf(new HllSketch(p))
      case SketchSection.FreqSpec(c) =>
        SketchBuildAgg.FreqBuf(
          scala.collection.mutable.HashMap.empty[String, Long], c)
    }

  override def update(
      buf: SketchBuildAgg.Buffer, input: InternalRow): SketchBuildAgg.Buffer = {
    val v = child.eval(input)
    if (v != null) buf match {
      case SketchBuildAgg.KmvBuf(set, k) =>
        val h = v.asInstanceOf[Long]
        if (set.size < k) { set.add(h); () }
        else if (h < set.last()) { if (set.add(h)) set.pollLast(); () }
      case SketchBuildAgg.BitmapBuf(bm) => bm.addLong(v.asInstanceOf[Long])
      case SketchBuildAgg.KllBuf(b) => b.insert(v.asInstanceOf[Double])
      case SketchBuildAgg.HllBuf(h) => h.addHash(v.asInstanceOf[Long])
      case SketchBuildAgg.FreqBuf(m, c) => FreqItemsAgg.mgAdd(m,
        v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString, c)
    }
    buf
  }

  override def merge(
      a: SketchBuildAgg.Buffer, b: SketchBuildAgg.Buffer): SketchBuildAgg.Buffer =
    (a, b) match {
      case (SketchBuildAgg.KmvBuf(sa, k), SketchBuildAgg.KmvBuf(sb, _)) =>
        val it = sb.iterator()
        while (it.hasNext) {
          val h = it.next()
          if (sa.size < k) { sa.add(h); () }
          else if (h < sa.last()) { if (sa.add(h)) sa.pollLast(); () }
        }
        a
      case (SketchBuildAgg.BitmapBuf(ba), SketchBuildAgg.BitmapBuf(bb)) =>
        ba.or(bb); a
      case (SketchBuildAgg.KllBuf(ka), SketchBuildAgg.KllBuf(kb)) =>
        ka.mergeIn(kb); a
      case (SketchBuildAgg.HllBuf(ha), SketchBuildAgg.HllBuf(hb)) =>
        ha.mergeIn(hb); a
      case (SketchBuildAgg.FreqBuf(ma, c), SketchBuildAgg.FreqBuf(mb, _)) =>
        FreqItemsAgg.mgMergeInto(ma, mb, c); a
      case _ => throw new IllegalStateException("sketch_build: mixed buffers")
    }

  override def eval(buf: SketchBuildAgg.Buffer): Any = serialize(buf)

  // the agg buffer's wire format IS the framed SketchSection payload —
  // the same bytes eval emits, so buffer serde is exercised by every
  // payload round-trip
  override def serialize(buf: SketchBuildAgg.Buffer): Array[Byte] = buf match {
    case SketchBuildAgg.KmvBuf(set, k) => SketchSection.serializeKmv(set, k)
    case SketchBuildAgg.BitmapBuf(bm) => SketchSection.serializeBitmap(bm)
    case SketchBuildAgg.KllBuf(b) => SketchSection.serializeKll(b)
    case SketchBuildAgg.HllBuf(h) => SketchSection.serializeHll(h)
    case SketchBuildAgg.FreqBuf(m, c) => SketchSection.serializeFreq(m, c)
  }

  override def deserialize(bytes: Array[Byte]): SketchBuildAgg.Buffer = {
    val sk = SketchSection.deserialize(bytes)
    sk.spec match {
      case SketchSection.KmvSpec(k) =>
        val set = new java.util.TreeSet[java.lang.Long]()
        sk.kmvHashes.foreach(h => set.add(h))
        SketchBuildAgg.KmvBuf(set, k)
      case SketchSection.BitmapSpec => SketchBuildAgg.BitmapBuf(sk.bitmap)
      case SketchSection.KllSpec(_) => SketchBuildAgg.KllBuf(sk.kll)
      case SketchSection.HllSpec(_) => SketchBuildAgg.HllBuf(sk.hll)
      case SketchSection.FreqSpec(c) => SketchBuildAgg.FreqBuf(
        scala.collection.mutable.HashMap.from(sk.freq), c)
    }
  }

  override def withNewMutableAggBufferOffset(offset: Int): SketchBuildAgg =
    copy(mutableAggBufferOffset = offset)

  override def withNewInputAggBufferOffset(offset: Int): SketchBuildAgg =
    copy(inputAggBufferOffset = offset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def prettyName: String = "sketch_build"
}

object SketchBuildAgg {

  sealed trait Buffer
  final case class KmvBuf(set: java.util.TreeSet[java.lang.Long], k: Int)
      extends Buffer
  final case class BitmapBuf(bm: Roaring64Bitmap) extends Buffer
  final case class KllBuf(buf: KllSketchAgg.Buf) extends Buffer
  final case class HllBuf(h: HllSketch) extends Buffer
  final case class FreqBuf(m: scala.collection.mutable.HashMap[String, Long],
      capacity: Int) extends Buffer

  /** One [[graft.pinot.SketchSection]] payload per group, built from raw
    * rows — unions with stored segment sections through the matching
    * merge aggregate. Spec: `bitmap` / `kmv<k>` / `kll<k>` / `hll<p>` /
    * `freq<c>`.
    */
  def sketchBuild(c: Column, spec: String): Column =
    GraftSqlBridge.toColumn(
      SketchBuildAgg(GraftSqlBridge.toExpression(c), spec)
        .toAggregateExpression())
}

package graft.pinot

/** Test utility: delegating [[SegmentIO]] that counts round-trip-shaped
  * calls per operation — the instrument behind cold-open budget gates
  * and the remote-path differential sweep.
  */
final class CountingSegmentIO(inner: SegmentIO) extends SegmentIO {
  val calls = new java.util.concurrent.ConcurrentHashMap[String,
    java.util.concurrent.atomic.AtomicLong]()
  private def tick(op: String): Unit =
    calls.computeIfAbsent(op,
      _ => new java.util.concurrent.atomic.AtomicLong()).incrementAndGet()
  def count(op: String): Long =
    Option(calls.get(op)).map(_.get()).getOrElse(0L)
  override def exists(p: String): Boolean = { tick("exists"); inner.exists(p) }
  override def isDirectory(p: String): Boolean =
    { tick("isDirectory"); inner.isDirectory(p) }
  override def size(p: String): Long = { tick("size"); inner.size(p) }
  override def mtimeMillis(p: String): Long =
    { tick("mtime"); inner.mtimeMillis(p) }
  override def readFully(p: String): Array[Byte] =
    { tick("readFully"); inner.readFully(p) }
  override def listFiles(dir: String): Seq[String] =
    { tick("listFiles"); inner.listFiles(dir) }
  override def listAll(dir: String): Seq[String] =
    { tick("listAll"); inner.listAll(dir) }
  override def openRange(p: String): SegmentIO.RangeReader =
    { tick("openRange"); inner.openRange(p) }
  override def resolve(dir: String, child: String): String =
    inner.resolve(dir, child)
  override def fileName(p: String): String = inner.fileName(p)
  override def parent(p: String): String = inner.parent(p)
  override def listTree(dir: String): Seq[SegmentIO.FileEntry] =
    { tick("listTree"); inner.listTree(dir) }
}

package graft.pinot

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, StandardCopyOption}

/** Table-level metadata manifest (EXTENSION; no reference counterpart —
  * the reference only ever opens local tables, table.rs:115-118).
  *
  * A single `_graft_manifest.v1` file at the table root embeds every
  * segment's `metadata.properties` (bytes + the file's size/mtime
  * stamp). A cold REMOTE open then costs ONE recursive listing plus ONE
  * GET: the listing both discovers segments and validates the manifest
  * (every non-tmp metadata.properties must appear with an identical
  * stamp, and vice versa), and a valid manifest feeds the plan-time
  * metadata cache without any per-segment round trips. Any mismatch —
  * foreign writer, partial upload, concurrent compaction — falls back
  * to the parallel per-segment prefetch, so the manifest is PURELY an
  * optimization: correctness never depends on it.
  *
  * Format (line-oriented; base64 fields dodge every escaping question):
  * {{{
  *   graft-manifest-v1
  *   <base64url(relative meta-dir path)>\t<size>\t<mtime>\t<base64(metadata.properties bytes)>
  * }}}
  * Paths are '/'-separated and relative to the table root, so a table
  * can move wholesale. Validation is (size, mtime)-exact — mtime is
  * load-bearing (a same-size in-place rewrite must invalidate), which
  * means an upload tool that RESETS modification times (`aws s3 cp`,
  * plain `hdfs dfs -put`) also invalidates the manifest and the open
  * falls back to the parallel prefetch; preserve timestamps
  * (`distcp -p`, rsync -t) to keep the one-GET path after a move.
  */
object TableManifest {

  val FileName = "_graft_manifest.v1"
  private val Header = "graft-manifest-v1"

  /** Logged best-effort refresh — the one entry point the write and
    * compaction paths share. Failure never propagates: a missing/stale
    * manifest self-invalidates at read time.
    */
  def refresh(tableDir: Path): Unit =
    try writeLocal(tableDir)
    catch { case e: Throwable =>
      System.err.println(s"[pinot] manifest refresh failed for $tableDir: $e")
    }

  /** Rebuild the manifest from a LOCAL table dir (the write path is
    * java.nio). Atomic replace; best-effort by contract — callers treat
    * failure as "no manifest" and a stale file self-invalidates.
    */
  def writeLocal(tableDir: Path): Unit = {
    val sb = new StringBuilder
    sb ++= Header += '\n'
    val walk = Files.walk(tableDir)
    val metas =
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala
          .filter(p => p.getFileName.toString == "metadata.properties")
          .filter { p =>
            // first path component under the table root must not be
            // in-flight writer output (same rule as discovery/fingerprint)
            val rel = tableDir.relativize(p)
            !rel.getName(0).toString.startsWith("tmp")
          }
          .toSeq.sortBy(_.toString)
      } finally walk.close()
    metas.foreach { p =>
      val rel = tableDir.relativize(p.getParent).toString.replace('\\', '/')
      // stamp BEFORE the read and re-check after: a concurrent in-place
      // rewrite mid-read would otherwise pair the NEW stamp with OLD
      // bytes and the next open would validate stale metadata as
      // current. An unstable file aborts the whole (best-effort) write.
      val size = Files.size(p)
      val mtime = Files.getLastModifiedTime(p).toMillis
      val bytes = Files.readAllBytes(p)
      if (bytes.length != size || Files.size(p) != size ||
          Files.getLastModifiedTime(p).toMillis != mtime)
        throw new IllegalStateException(
          s"$p changed while the manifest was being built")
      // the stamp recheck is millisecond-granular: a same-size in-place
      // rewrite completing within the stamp's millisecond would embed
      // stale bytes under a current stamp — re-read and compare content
      // (metadata.properties is small; one extra local read per segment)
      if (!java.util.Arrays.equals(bytes, Files.readAllBytes(p)))
        throw new IllegalStateException(
          s"$p changed while the manifest was being built")
      sb ++= java.util.Base64.getUrlEncoder.withoutPadding
        .encodeToString(rel.getBytes(UTF_8))
      sb += '\t'; sb ++= size.toString
      sb += '\t'; sb ++= mtime.toString
      sb += '\t'
      sb ++= java.util.Base64.getEncoder.encodeToString(bytes)
      sb += '\n'
    }
    val target = tableDir.resolve(FileName)
    val tmp = tableDir.resolve(FileName + ".inprogress")
    Files.write(tmp, sb.toString.getBytes(UTF_8))
    try Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    catch { case _: java.nio.file.AtomicMoveNotSupportedException =>
      Files.move(tmp, target, StandardCopyOption.REPLACE_EXISTING)
    }
  }

  /** Parse + VALIDATE against the recursive listing the caller already
    * holds. Returns absolute-meta-dir → parsed metadata when the
    * manifest exactly covers the listing's live (non-tmp)
    * metadata.properties set, stamps included; empty map otherwise.
    * Never throws — any malformed content is just "no manifest".
    */
  def load(tableDir: String, io: SegmentIO,
      listing: Seq[SegmentIO.FileEntry]): Map[String, SegmentMetadata] =
    listing.find(e => io.fileName(e.path) == FileName) match {
      case None => Map.empty
      case Some(entry) => loadEntry(tableDir, io, listing, entry)
    }

  private def loadEntry(tableDir: String, io: SegmentIO,
      listing: Seq[SegmentIO.FileEntry],
      entry: SegmentIO.FileEntry): Map[String, SegmentMetadata] =
    try {
      val prefix = io.parent(io.resolve(tableDir, "x")) + "/"
      def relOf(p: String): Option[String] =
        if (p.startsWith(prefix)) Some(p.substring(prefix.length)) else None
      val listed: Map[String, (Long, Long)] = listing.flatMap { e =>
        if (io.fileName(e.path) != "metadata.properties") None
        else relOf(io.parent(e.path)) match {
          case Some(rel) if !rel.takeWhile(_ != '/').startsWith("tmp") =>
            Some(rel -> (e.size, e.mtimeMillis))
          case _ => None
        }
      }.toMap
      val lines = new String(io.readFully(entry.path), UTF_8).split('\n')
      if (lines.isEmpty || lines(0) != Header) return Map.empty
      val parsed = lines.iterator.drop(1).filter(_.nonEmpty).map { line =>
        val f = line.split('\t')
        val rel = new String(java.util.Base64.getUrlDecoder.decode(f(0)), UTF_8)
        val bytes = java.util.Base64.getDecoder.decode(f(3))
        (rel, f(1).toLong, f(2).toLong, bytes)
      }.toSeq
      val stamps = parsed.map { case (rel, sz, mt, _) => rel -> (sz, mt) }.toMap
      // exact two-way cover: a segment added, removed, or rewritten
      // since the manifest was built invalidates it wholesale
      if (stamps != listed) return Map.empty
      parsed.map { case (rel, _, _, bytes) =>
        (prefix + rel) -> SegmentMetadata.parse(new String(bytes, UTF_8))
      }.toMap
    } catch { case scala.util.control.NonFatal(_) => Map.empty }
}

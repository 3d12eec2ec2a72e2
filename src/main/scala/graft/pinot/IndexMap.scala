package graft.pinot

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

/** One index section inside `columns.psf`
  * (reference: pinot-segment/src/index_map.rs:6-10).
  */
final case class IndexLocation(startOffset: Long, size: Long)

/** Parser for the `index_map` sidecar mapping
  * `(column, indexType) → {startOffset, size}`
  * (reference: pinot-segment/src/index_map.rs:12-79).
  *
  * Keys have the form `{column}.{indexType}.{property}` and column names may
  * themselves contain dots, so keys are split right-to-left.
  */
final case class IndexMap(indexes: Map[(String, String), IndexLocation]) {
  def get(column: String, indexType: String): Option[IndexLocation] =
    indexes.get((column, indexType))
  def dictionary(column: String): Option[IndexLocation] = get(column, "dictionary")
  def forwardIndex(column: String): Option[IndexLocation] = get(column, "forward_index")
  def invertedIndex(column: String): Option[IndexLocation] = get(column, "inverted_index")
  def nullValueVector(column: String): Option[IndexLocation] = get(column, "nullvalue_vector")
  def bloomFilter(column: String): Option[IndexLocation] = get(column, "bloom_filter")
}

object IndexMap {

  def fromFile(path: Path): IndexMap =
    parse(new String(Files.readAllBytes(path), StandardCharsets.UTF_8))

  def parse(content: String): IndexMap = {
    val acc = scala.collection.mutable.LinkedHashMap
      .empty[(String, String), (Long, Long)] // (startOffset, size)
    content.linesIterator.foreach { raw =>
      val line = raw.trim
      if (line.nonEmpty && !line.startsWith("#")) {
        val eq = line.indexOf('=')
        if (eq >= 0) {
          val keyPart = line.substring(0, eq).trim
          val value = line.substring(eq + 1).trim
          val parts = keyPart.split('.')
          if (parts.length >= 3) {
            val property = parts(parts.length - 1)
            val indexType = parts(parts.length - 2)
            val column = parts.dropRight(2).mkString(".")
            val num = value.toLongOption.getOrElse(
              throw new PinotFormatException(s"Invalid number '$value' in index_map"))
            val key = (column, indexType)
            val (s0, z0) = acc.getOrElse(key, (0L, 0L))
            property match {
              case "startOffset" => acc(key) = (num, z0)
              case "size" => acc(key) = (s0, num)
              case _ => // ignore unknown properties
            }
          }
        }
      }
    }
    IndexMap(acc.view.mapValues { case (s, z) => IndexLocation(s, z) }.toMap)
  }
}

package graft

import java.nio.file.{Files, Paths}

/** Persisted IVF index lifecycle: build-once per corpus fingerprint,
  * reuse across invocations, cluster-partitioned on-disk layout.
  */
class IvfIndexSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("index builds once and is reused for the same corpus") {
    val q = () => SparkEntry.queries("q48_knn_ivf")(spark, sf)
    val r1 = q().collect()
    // the index dir now exists; capture its identity
    val dirs = {
      // resolve the per-user cache dir from the implementation itself —
      // a copied literal here went stale once already (r5 moved the cache)
      val root = queries.IvfIndex.cacheRoot
      val l = Files.list(root)
      try {
        import scala.jdk.CollectionConverters._
        l.iterator().asScala.filter(p =>
          Files.exists(p.resolve("_SUCCESS"))).toSeq
      } finally l.close()
    }
    assert(dirs.nonEmpty, "no persisted index directory")
    val dir = dirs.maxBy(p => Files.getLastModifiedTime(p).toMillis)
    val stamp = Files.getLastModifiedTime(dir.resolve("_SUCCESS")).toMillis
    // assignments are PARTITIONED BY cluster — the inverted-file layout
    val parts = {
      val l = Files.list(dir.resolve("assignments"))
      try {
        import scala.jdk.CollectionConverters._
        l.iterator().asScala.map(_.getFileName.toString)
          .filter(_.startsWith("cluster=")).toSeq
      } finally l.close()
    }
    assert(parts.size > 1, s"expected cluster partitions, got $parts")
    // a second invocation reuses the build (same _SUCCESS stamp) and
    // returns identical rows
    val r2 = q().collect()
    assert(Files.getLastModifiedTime(dir.resolve("_SUCCESS")).toMillis === stamp,
      "index was rebuilt for an unchanged corpus")
    assert(r2.toSeq === r1.toSeq)
  }
}

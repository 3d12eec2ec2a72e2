package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Connected-component labeling over a near-dup pair set, shared by the
  * Jaccard (q73) and cosine (q128) keeper pipelines.
  *
  * Near-dup pair sets are tiny BY CONSTRUCTION (only above-threshold
  * survivors), so the normal case is the driver fast path: one job
  * collects the edges, union-find labels them. The distributed
  * min-label propagation fallback stays for adversarial inputs where
  * the pair set itself is huge — iterations bound by component
  * diameter (tiny for near-dup clusters). Output covers exactly the
  * pair ENDPOINTS: (id, component_root = min id of the component,
  * is_canonical = id == root), ordered by id.
  */
object Components {

  /** Driver fast-path edge cap — sys-prop override so tests can force
    * the distributed fallback on small fixtures.
    */
  private def driverCap: Int =
    Integer.getInteger("graft.cc.driverCap", 100000)

  def roots(pairs: DataFrame, outIdCol: String)(s: SparkSession): DataFrame = {
    val cap = driverCap
    val capped = pairs.limit(cap + 1).collect()
    if (capped.length <= cap) {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) {
          val n = parent.getOrElse(c, c); parent(c) = r; c = n
        }
        r
      }
      capped.foreach { row =>
        val (a, b) = (row.getLong(0), row.getLong(1))
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { // union by MIN root → labels = min id
          if (ra < rb) parent(rb) = ra else parent(ra) = rb
        }
      }
      val out = parent.keys.toSeq.sorted.map(id =>
        (id, find(id), id == find(id)))
      import s.implicits._
      out.toDF(outIdCol, "component_root", "is_canonical")
        .orderBy(outIdCol)
    } else {
      val cols = pairs.columns
      val edges = pairs.select(col(cols(0)).as("u"), col(cols(1)).as("v"))
        .union(pairs.select(col(cols(1)).as("u"), col(cols(0)).as("v")))
        .localCheckpoint()
      var labels = edges.select(col("u").as("id")).distinct()
        .select(col("id"), col("id").as("label")).localCheckpoint()
      var converged = false
      var iter = 0
      while (!converged && iter < 20) {
        val neighborMin = edges
          .join(labels.select(col("id").as("v"), col("label").as("vlabel")), "v")
          .groupBy("u").agg(min("vlabel").as("nmin"))
          .select(col("u").as("id"), col("nmin"))
        val newLabels = labels.join(neighborMin, Seq("id"), "left")
          .select(col("id"),
            least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
          .localCheckpoint()
        val changed = newLabels
          .join(labels.select(col("id"), col("label").as("old")), "id")
          .filter(col("label") =!= col("old")).count()
        labels = newLabels
        converged = changed == 0
        iter += 1
      }
      labels.select(col("id").as(outIdCol), col("label").as("component_root"))
        .withColumn("is_canonical", col(outIdCol) === col("component_root"))
        .orderBy(outIdCol)
    }
  }
}

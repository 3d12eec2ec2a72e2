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
      // Pointer doubling (label := min(label, label-of-label)) on top of
      // the neighbor-min step makes a diameter-D chain converge in
      // O(log D) rounds, so 64 covers any graph with Long ids; hitting
      // the cap means a logic bug, and partial labels are a silent wrong
      // answer — fail loudly instead of returning them.
      val maxIters = 64
      while (!converged) {
        if (iter >= maxIters)
          throw new IllegalStateException(
            s"Components: min-label propagation did not converge after " +
              s"$maxIters rounds — refusing to return partial labels")
        val neighborMin = edges
          .join(labels.select(col("id").as("v"), col("label").as("vlabel")), "v")
          .groupBy("u").agg(min("vlabel").as("nmin"))
          .select(col("u").as("id"), col("nmin"))
        val propagated = labels.join(neighborMin, Seq("id"), "left")
          .select(col("id"),
            least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
        // one level of label indirection: labels always name nodes of the
        // same component, so chasing label-of-label only shortcuts paths
        val hop = propagated
          .select(col("id").as("hid"), col("label").as("hlabel"))
        val newLabels = propagated.as("p")
          .join(hop, col("p.label") === col("hid"), "left")
          .select(col("p.id").as("id"),
            least(col("p.label"), coalesce(col("hlabel"), col("p.label")))
              .as("label"))
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

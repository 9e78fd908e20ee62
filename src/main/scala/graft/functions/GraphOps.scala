package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph ranking over edge DataFrames — the companion to the
  * connected-components engines in [[DedupOps]]: CC answers "which
  * docs are the same", PageRank answers "which node is central"
  * (canonical-survivor choice inside a dup cluster, seed selection in
  * a crawl frontier, influence in the co-purchase graph).
  *
  * Implemented as the standard distributed power iteration (Page et
  * al. 1999; the Pregel/GraphX formulation): per round ONE equi-join
  * of ranks onto edges plus one keyed sum — no adjacency collection,
  * no driver-side state beyond the dangling-mass scalar (an O(1)
  * aggregate each round, same bounded-collect discipline as the Lloyd
  * trainer). Lineage is truncated per round with localCheckpoint, so
  * the plan stays flat at any iteration count. At 100 TB the rank
  * exchange shards by node id; a hub's IN-edges concentrate on one
  * reducer only at the final sum, which is a partial-aggregated
  * (map-side combined) LongType-keyed sum — the same shape the CC
  * engines already survive.
  */
object GraphOps {

  /** Ranks for a DIRECTED edge list (undirected graphs pass both
    * orientations). Dangling mass (nodes with no out-edges) is
    * redistributed uniformly each round — the textbook stochastic
    * completion, keeping Σrank = 1 exactly (up to FP) so convergence
    * is measurable. Fixed iteration count: deterministic plan depth,
    * the production choice when rounds are budgeted ahead of time.
    *
    * @return (node, rank) — one row per node appearing in any edge.
    *         Self-contained (one localCheckpoint, working tables
    *         released); `CheckpointOps.release` it once consumed in a
    *         long-lived session.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      damping: Double = 0.85, iters: Int = 10): DataFrame = {
    require(iters >= 1 && damping > 0 && damping < 1)
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct()
      .localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(true)
    val n = nodes.count()
    require(n > 0, "pageRank: empty graph")
    val outDeg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg"))
    // degree rides the edge list, precomputed once: each round is then
    // ONE rank⋈edge join + one keyed sum, not a second degree join
    val eDeg = e.join(outDeg.withColumnRenamed("node", "src"), Seq("src"))
      .localCheckpoint(true)

    // Dangling handling costs one aggregate job PER ROUND — pay it
    // only when dangling nodes exist at all (an undirected graph never
    // has any; checked once, O(1) driver scalar).
    val hasDangling = nodes.join(outDeg, Seq("node"), "left_anti")
      .limit(1).count() > 0

    var ranks = nodes.withColumn("rank", lit(1.0 / n)).localCheckpoint(true)
    var lastMat = ranks
    var returned = false
    try {
    var i = 0
    while (i < iters) {
      // O(1) driver scalar: total rank sitting on dangling nodes
      val danglingMass =
        if (!hasDangling) 0.0
        else ranks.join(outDeg, Seq("node"), "left_anti")
          .agg(coalesce(sum(col("rank")), lit(0.0))).head().getDouble(0)
      val contribs = ranks.withColumnRenamed("node", "src")
        .join(eDeg, Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("rank") / col("deg")).as("in_mass"))
      val base = (1.0 - damping) / n + damping * danglingMass / n
      val updated = nodes
        .join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + lit(damping) * coalesce(col("in_mass"), lit(0.0)))
            .as("rank"))
      // materialize every 3rd round (and the last): lineage stays
      // shallow while 2 of 3 rounds skip the checkpoint job — the
      // driver round-trips, not the tiny per-round compute, dominate
      // iteration cost
      val mat = (i % 3 == 2) || i == iters - 1
      if (mat) {
        val next = updated.localCheckpoint(true)
        // RDD-level release: Dataset.unpersist() would be a no-op on
        // a checkpointed frame (see CheckpointOps) — the superseded
        // round's blocks must go now, not when the cleaner notices
        CheckpointOps.release(lastMat)
        lastMat = next
        ranks = next
      } else ranks = updated
      i += 1
    }
    returned = true
    ranks
    } finally {
      // the result is the final checkpoint — self-contained, so every
      // working table this call pinned is released with it live; on an
      // exception the in-flight rank checkpoint goes too
      CheckpointOps.release(e)
      CheckpointOps.release(nodes)
      CheckpointOps.release(eDeg)
      if (!returned) CheckpointOps.release(lastMat)
    }
  }

  /** Integer PageRank in parts-per-billion — the ORACLE-able variant:
    * every operation is BIGINT floor arithmetic (contribution =
    * `rank div deg`, damping = `(85·in) div 100`), so no
    * float-accumulation order can perturb a single unit and the same
    * recurrence replays bit-exactly in any SQL engine (the g1 oracle
    * unrolls it as chained CTEs in DuckDB). Ranks drift from the float
    * engine only by the floor losses — ≲ iters·deg ppb, spec-bounded
    * against [[pageRank]].
    *
    * Contract: UNDIRECTED input (both orientations present), so there
    * are no dangling nodes and no second rank aggregate per round —
    * checked once with an O(1) anti-join probe. Same per-round plan
    * and checkpoint lifecycle as [[pageRank]].
    *
    * @return (node, rank_ppb) for every node in the edge list.
    */
  def pageRankPpb(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 5): DataFrame = {
    require(iters >= 1)
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct()
      .localCheckpoint(true)
    val nodes = e.select(col("src").as("node")).distinct()
      .localCheckpoint(true)
    var returned = false
    var lastMat: DataFrame = null
    try {
    val n = nodes.count()
    require(n > 0, "pageRankPpb: empty graph")
    val outDeg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg"))
    require(e.select(col("dst").as("node"))
      .join(nodes, Seq("node"), "left_anti").limit(1).count() == 0,
      "pageRankPpb requires an undirected edge list (every dst also a src)")
    val eDeg = e.join(outDeg.withColumnRenamed("node", "src"), Seq("src"))
      .localCheckpoint(true)
    try {
      val scale = 1000000000L
      val base = (scale * 15L / 100L) / n
      var ranks = nodes.withColumn("rank_ppb", lit(scale / n))
        .localCheckpoint(true)
      lastMat = ranks
      var i = 0
      while (i < iters) {
        val contribs = ranks.withColumnRenamed("node", "src")
          .join(eDeg, Seq("src"))
          .groupBy(col("dst").as("node"))
          .agg(sum(expr("rank_ppb div deg")).as("in_ppb"))
        val updated = nodes.join(contribs, Seq("node"), "left")
          .select(col("node"),
            (lit(base) +
              expr("(85 * coalesce(in_ppb, CAST(0 AS BIGINT))) div 100"))
              .as("rank_ppb"))
        if ((i % 3 == 2) || i == iters - 1) {
          val next = updated.localCheckpoint(true)
          CheckpointOps.release(lastMat)
          lastMat = next
          ranks = next
        } else ranks = updated
        i += 1
      }
      returned = true
      ranks
    } finally {
      CheckpointOps.release(eDeg)
    }
    } finally {
      CheckpointOps.release(e)
      CheckpointOps.release(nodes)
      if (!returned && lastMat != null) CheckpointOps.release(lastMat)
    }
  }
}

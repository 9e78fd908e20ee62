package graft

import graft.functions.GraphOps
import org.apache.spark.sql.functions._

/** PageRank invariants the rows-only gate can't express: mass
  * conservation, cycle symmetry (exact closed form), star dominance,
  * dangling-mass redistribution, and determinism across runs.
  */
class GraphOpsSpec extends SparkTestBase {
  quiet()

  private def ranks(edges: Seq[(Long, Long)], iters: Int = 30): Map[Long, Double] = {
    import spark.implicits._
    GraphOps.pageRank(edges.toDF("s", "d"), "s", "d", 0.85, iters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
  }

  test("cycle: all nodes get exactly 1/N; mass sums to 1") {
    val n = 6
    val cyc = (0 until n).map(i => (i.toLong, ((i + 1) % n).toLong))
    val r = ranks(cyc)
    assert(r.size === n)
    r.values.foreach(v => assert(math.abs(v - 1.0 / n) < 1e-12))
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
  }

  test("undirected star: center dominates, leaves tie, closed form holds") {
    val leaves = (1L to 10L)
    val edges = leaves.flatMap(l => Seq((0L, l), (l, 0L)))
    val r = ranks(edges, iters = 100) // fixpoint error ~0.85^iters
    val c = r(0L)
    val leafRanks = leaves.map(r)
    // leaves are symmetric
    leafRanks.foreach(v => assert(math.abs(v - leafRanks.head) < 1e-12))
    // fixpoint equations: leaf = (1-d)/N + d*c/10 ; c = (1-d)/N + d*(10*leaf)
    val d = 0.85; val n = 11
    assert(math.abs(leafRanks.head - ((1 - d) / n + d * c / 10)) < 1e-6)
    assert(math.abs(c - ((1 - d) / n + d * leafRanks.sum)) < 1e-6)
    assert(c > leafRanks.head * 5)
  }

  test("dangling node: mass is redistributed, sum stays 1, sink outranks source") {
    // a -> b, b dangles: b receives a's mass, both receive dangling spread
    val r = ranks(Seq((1L, 2L)), iters = 80)
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
    assert(r(2L) > r(1L))
    // fixpoint: r1 = (1-d)/2 + d*r2/2 ; r2 = (1-d)/2 + d*(r1 + r2/2)
    val d = 0.85
    assert(math.abs(r(1L) - ((1 - d) / 2 + d * r(2L) / 2)) < 1e-9)
    assert(math.abs(r(2L) - ((1 - d) / 2 + d * (r(1L) + r(2L) / 2))) < 1e-9)
  }

  test("g1_pagerank query: one row per graph node, mass conserved, deterministic") {
    val out = SparkEntry.queries("g1_pagerank")(spark, sf).cache()
    val pairs = graft.queries.Dedup.d2JaccardPairs(spark, sf)
    val nodes = pairs.select(col("id_a").as("n"))
      .unionByName(pairs.select(col("id_b").as("n"))).distinct().count()
    assert(out.count() === nodes)
    assert(math.abs(out.agg(sum("rank")).head().getDouble(0) - 1.0) < 1e-6)
    val again = SparkEntry.queries("g1_pagerank")(spark, sf)
    assert(out.exceptAll(again).count() === 0)
  }

  test("pageRankPpb tracks the float engine within floor-loss tolerance") {
    import spark.implicits._
    // undirected, degree-diverse graph: star + a path tail
    val und = ((1L to 8L).flatMap(l => Seq((0L, l), (l, 0L))) ++
      Seq((8L, 9L), (9L, 8L), (9L, 10L), (10L, 9L))).toDF("s", "d")
    val ppb = GraphOps.pageRankPpb(und, "s", "d", iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val flt = GraphOps.pageRank(und, "s", "d", 0.85, 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ppb.keySet === flt.keySet)
    // each round floors one division per in-edge plus the damping
    // product: cumulative drift stays far under 1e-5 of total mass
    ppb.foreach { case (n, v) =>
      assert(math.abs(v / 1e9 - flt(n)) < 1e-5, s"node $n: $v vs ${flt(n)}")
    }
    // deterministic across runs (bit-exact, not just close)
    val again = GraphOps.pageRankPpb(und, "s", "d", iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again === ppb)
  }

  test("pageRankPpb rejects a directed edge list") {
    import spark.implicits._
    val directed = Seq((1L, 2L), (2L, 3L)).toDF("s", "d")
    intercept[IllegalArgumentException] {
      GraphOps.pageRankPpb(directed, "s", "d")
    }
  }

  test("iterative graph ops release superseded checkpoints (no storage pile-up)") {
    // Regression gate for the RDD-level CheckpointOps release: each
    // call may leave its RESULT checkpoint pinned (the returned frame
    // IS that checkpoint — ~1 block for pageRank, ~1 for CC, ~2 for
    // CC-star's nodes+edges), but working tables and per-round
    // intermediates must go. Pre-fix, 3 rounds of the trio pinned
    // ~35+ tables (every iteration's rank/label/edge copy plus edge/
    // degree inputs); post-fix the ceiling is the results alone.
    // Loose bound: other suites share this SparkContext.
    import spark.implicits._
    import graft.functions.DedupOps
    val sc = spark.sparkContext
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (6L, 7L))
      .toDF("src", "dst")
    val before = sc.getPersistentRDDs.size
    (1 to 3).foreach { _ =>
      GraphOps.pageRank(edges, "src", "dst", iters = 7).collect()
      DedupOps.connectedComponents(edges, "src", "dst").collect()
      DedupOps.connectedComponentsStar(edges, "src", "dst").collect()
    }
    val after = sc.getPersistentRDDs.size
    assert(after - before <= 15,
      s"iterative ops leaked checkpoints: $before -> $after")
  }
}

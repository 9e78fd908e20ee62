package graft.operators

import graft.lake.ManifestTable
import graft.queries.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Serialized index metadata: link degree, entry-point ids, and the
  * source version cursor (mirrors [[PqIndexMeta]]).
  */
private[operators] case class NswIndexMeta(
    m: Int, entryIds: Seq[Long], sourceVersion: Int)

/** Persisted navigable-small-world graph index (the single-layer core
  * of HNSW — Malkov & Yashunin, TPAMI 2020; NSW per Malkov et al.,
  * IS 2014) over a unit-normalized embedding corpus, as a lakehouse
  * table: `(vec_id, v, neighbors)` rows in a [[ManifestTable]] with a
  * meta sidecar holding the entry points.
  *
  * BUILD (a batch job, the expensive half): the k-nearest-neighbor
  * graph — exactly s11's operator, via the same corpus-size switch
  * between the exact broadcast form and IVF-list candidates — made
  * UNDIRECTED (each directed top-m edge also inserted in reverse, then
  * the per-node list re-capped at 2m by similarity), which is what
  * makes greedy search navigable: a node that nothing points to can
  * still be reached through its own out-links' back-edges. Entry
  * points are `entries` hash-spread corpus nodes (the ivfSeedsOf
  * pattern) — the multi-entry stand-in for HNSW's upper layers.
  *
  * QUERY (the cheap half): greedy best-first beam search, the
  * standard NSW kernel — pop the best unexpanded candidate, score its
  * neighbors, keep the best `ef` results, stop when the best candidate
  * is worse than the worst kept result. Each probe touches O(ef·m)
  * vectors instead of the corpus. The graph shard is memory-resident
  * at query time (collected once per batch, broadcast to probe
  * partitions) — the serving-node model every production graph-ANN
  * store uses (a 100 TB corpus shards by IVF list / tenant and fans
  * the probe to shards; within a shard the structure is RAM-resident
  * by design, so the bounded collect HERE is the architecture, not a
  * shortcut).
  */
class NswIndex private (spark: SparkSession, val root: String,
    meta: NswIndexMeta) {

  val table: ManifestTable = NswIndex.indexTable(spark, root)

  def m: Int = meta.m
  def entryIds: Seq[Long] = meta.entryIds

  /** Serve a probe batch `(q_id, q_v)` (unit-normalized, the PqIndex
    * probe shape): returns `(q_id, rn, neighbor, sim)` — the s1/s9
    * output contract. `ef` is the beam width (recall knob).
    */
  def query(probes0: DataFrame, topK: Int = 3, ef: Int = 64): DataFrame = {
    import spark.implicits._
    // the shard, RAM-resident for the batch (serving-node model above)
    val rows = table.read().select("vec_id", "v", "neighbors").collect()
    val n = rows.length
    val ids = new Array[Long](n)
    val vecs = new Array[Array[Double]](n)
    val index = new java.util.HashMap[Long, Integer](n * 2)
    var i = 0
    while (i < n) {
      ids(i) = rows(i).getLong(0)
      vecs(i) = rows(i).getSeq[Double](1).toArray
      index.put(ids(i), i)
      i += 1
    }
    val adj: Array[Array[Int]] = Array.tabulate(n) { j =>
      rows(j).getSeq[Long](2)
        .flatMap(id => Option(index.get(id)).map(_.intValue)).toArray
    }
    val entries = meta.entryIds
      .flatMap(id => Option(index.get(id)).map(_.intValue)).toArray
    val bc = spark.sparkContext.broadcast((ids, vecs, adj, entries))
    try {
      val out = probes0
        .select(col("q_id").cast("long"), col("q_v"))
        .as[(Long, Seq[Double])]
        .mapPartitions { it =>
          val (bIds, bVecs, bAdj, bEntries) = bc.value
          it.flatMap { case (qId, qv) =>
            NswIndex.beamSearch(qv.toArray, bIds, bVecs, bAdj, bEntries,
                ef, topK, excludeId = qId)
              .zipWithIndex.map { case ((nid, sim), r) =>
                (qId, r + 1, nid, math.rint(sim * 1e6) / 1e6)
              }
          }
        }
        .toDF("q_id", "rn", "neighbor", "sim")
        .select(col("q_id"), col("rn").cast("int").as("rn"),
          col("neighbor"), col("sim"))
        .orderBy(col("q_id").asc, col("rn").asc)
        .localCheckpoint(true) // materialize before the broadcast dies
      out
    } finally bc.destroy()
  }
}

object NswIndex {

  private def metaPath(root: String) = s"$root/_graft_nsw_meta"

  private val metaCache =
    new java.util.concurrent.ConcurrentHashMap[String, NswIndexMeta]()

  private[operators] def indexTable(spark: SparkSession, root: String): ManifestTable =
    new ManifestTable(spark, s"$root/index", bloomCol = Some("vec_id"))

  /** The greedy NSW kernel — pure, deterministic (ties break on lower
    * node index), bounded by O(ef·m) scored nodes per probe.
    */
  private[operators] def beamSearch(q: Array[Double], ids: Array[Long],
      vecs: Array[Array[Double]], adj: Array[Array[Int]],
      entries: Array[Int], ef: Int, topK: Int,
      excludeId: Long): Seq[(Long, Double)] = {
    val nNodes = vecs.length
    if (nNodes == 0 || entries.isEmpty) return Seq.empty
    def sim(j: Int): Double = {
      val v = vecs(j)
      var d = 0.0; var na = 0.0; var nb = 0.0; var x = 0
      while (x < v.length && x < q.length) {
        d += q(x) * v(x); na += q(x) * q(x); nb += v(x) * v(x); x += 1
      }
      if (na == 0.0 || nb == 0.0) 0.0 else d / (math.sqrt(na) * math.sqrt(nb))
    }
    val visited = new java.util.BitSet(nNodes)
    // candidates: best-first (max sim); results: keep best ef (evict min)
    val candOrd = Ordering.by[(Double, Int), (Double, Int)](c => (c._1, -c._2))
    val cands = scala.collection.mutable.PriorityQueue.empty[(Double, Int)](candOrd)
    val results = scala.collection.mutable.PriorityQueue
      .empty[(Double, Int)](candOrd.reverse) // min-heap by sim
    entries.foreach { e =>
      if (!visited.get(e)) {
        visited.set(e)
        val s = sim(e)
        cands.enqueue((s, e))
        results.enqueue((s, e))
        if (results.size > ef) results.dequeue(): Unit
      }
    }
    var done = false
    while (!done && cands.nonEmpty) {
      val (cs, c) = cands.dequeue()
      if (results.size >= ef && cs < results.head._1) done = true
      else adj(c).foreach { nb =>
        if (!visited.get(nb)) {
          visited.set(nb)
          val s = sim(nb)
          if (results.size < ef || s > results.head._1) {
            cands.enqueue((s, nb))
            results.enqueue((s, nb))
            if (results.size > ef) results.dequeue(): Unit
          }
        }
      }
    }
    results.toSeq
      .map { case (s, j) => (ids(j), s) }
      .filter(_._1 != excludeId)
      .sortBy { case (id, s) => (-s, id) }
      .take(topK)
  }

  /** Build from a unit-normalized corpus `emb(vec_id, v)`: kNN graph
    * (corpus-size-switched candidates), undirected 2m-capped adjacency,
    * hash-spread entry points; persist rows, then the meta sidecar
    * LAST (crash ⇒ no loadable index, same as PqIndex).
    */
  def build(spark: SparkSession, emb: DataFrame, root: String,
      m: Int = 8, entries: Int = 8, exactMaxRows: Long = 10000L,
      sourceVersion: Int = -1): NswIndex = {
    import org.apache.spark.sql.expressions.Window
    val nRows = emb.count()
    val knn =
      if (nRows <= exactMaxRows) Similarity.knnGraphExact(spark, emb, m)
      else Similarity.knnGraphBucketed(spark, emb, m,
        lists = math.max(16, math.sqrt(nRows.toDouble).toInt), nprobe = 2)
    // undirect: every edge in both directions, then re-cap at 2m per
    // node (keep the strongest links; dedup first — a mutual kNN pair
    // appears in both directions already)
    val undirected = knn.select(col("vec_id"), col("neighbor"), col("sim"))
      .unionByName(knn.select(col("neighbor").as("vec_id"),
        col("vec_id").as("neighbor"), col("sim")))
      .groupBy(col("vec_id"), col("neighbor")).agg(max(col("sim")).as("sim"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("sim").desc, col("neighbor").asc)
    val cappedPairs = undirected.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2 * m)
      .select(col("vec_id"), col("neighbor"))
    // long-range links: a kNN graph over clustered data is a set of
    // disconnected islands (the problem HNSW's upper layers solve).
    // The lite fix: a hash-ordered PATH through all nodes — each node
    // links its successor in a deterministic pseudo-random order —
    // which makes the graph provably connected with ≤2 extra links
    // per node and, because the order is hash-spread, the links are
    // long-range. Exempt from the 2m cap (eviction could disconnect).
    // The global sort runs on 16-byte (id, hash) rows only.
    val wRing = Window.orderBy(
      pmod(col("vec_id") * 40503L + 17L, lit(999983L)).asc,
      col("vec_id").asc)
    val ring = emb.select(col("vec_id"))
      .withColumn("nxt", lead(col("vec_id"), 1).over(wRing))
      .filter(col("nxt").isNotNull)
    val ringBoth = ring.select(col("vec_id"), col("nxt").as("neighbor"))
      .unionByName(ring.select(col("nxt").as("vec_id"),
        col("vec_id").as("neighbor")))
    val adjacency = cappedPairs.unionByName(ringBoth).distinct()
      .groupBy(col("vec_id"))
      .agg(collect_list(col("neighbor")).as("neighbors"))
    val nodes = emb.join(adjacency, Seq("vec_id"), "left")
      .select(col("vec_id"), col("v"),
        coalesce(col("neighbors"), array().cast("array<bigint>"))
          .as("neighbors"))
    val mt = indexTable(spark, root)
    mt.write(nodes, "overwrite")
    val entryRows = Similarity.ivfSeedsOf(emb, entries)
      .collect() // bounded: `entries` rows
    val meta = NswIndexMeta(m, entryRows.map(_.getLong(0)).toSeq, sourceVersion)
    writeMeta(spark, root, meta)
    new NswIndex(spark, root, meta)
  }

  private[operators] def writeMeta(spark: SparkSession, root: String,
      meta: NswIndexMeta): Unit = {
    import spark.implicits._
    Seq(meta).toDS().coalesce(1).write.mode("overwrite").parquet(metaPath(root))
    metaCache.put(root, meta): Unit
  }

  def load(spark: SparkSession, root: String): Option[NswIndex] = {
    import spark.implicits._
    val p = new org.apache.hadoop.fs.Path(metaPath(root))
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) { metaCache.remove(root); return None }
    Option(metaCache.get(root))
      .map(mm => new NswIndex(spark, root, mm))
      .orElse {
        val mm = spark.read.parquet(metaPath(root)).as[NswIndexMeta].head()
        metaCache.put(root, mm)
        Some(new NswIndex(spark, root, mm))
      }
  }
}

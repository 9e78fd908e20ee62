package graft.operators

import graft.lake.ManifestTable
import graft.queries.Similarity
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Serialized index metadata: link degree, shard layout (the frozen
  * IVF routing seeds), and the source version cursor (mirrors
  * [[PqIndexMeta]]). The seeds are bounded (≈√n lists), so they ride
  * the sidecar + task closures like the PQ codebook does.
  */
private[operators] case class NswIndexMeta(
    m: Int, lists: Int, replicas: Int, entriesPerShard: Int,
    sourceVersion: Int, seedIds: Seq[Long], seedVs: Seq[Seq[Double]],
    subCounts: Seq[Int], maxShardRows: Long)

/** Persisted navigable-small-world graph index (the single-layer core
  * of HNSW — Malkov & Yashunin, TPAMI 2020; NSW per Malkov et al.,
  * IS 2014) over a unit-normalized embedding corpus, SHARDED by IVF
  * list (the SPANN memory–disk layout, Chen et al., NeurIPS 2021):
  * `(shard_id, vec_id, v, neighbors)` rows in a [[ManifestTable]]
  * zone-mapped on `shard_id` (= list_id·1024 + sub — hot lists split
  * into hash sub-shards at build, see [[NswIndex.build]]), with the
  * routing seeds + frozen sub-counts in a meta sidecar.
  *
  * SHARDING: every vector is assigned to its `replicas` nearest IVF
  * lists (SPANN's closure assignment — boundary vectors appear in each
  * neighboring shard, which is what keeps recall up when a probe's
  * true neighbors straddle a shard edge), and each shard holds a
  * SELF-CONTAINED navigable subgraph over its members: per-shard kNN
  * links made undirected (2m cap), plus a hash-ordered ring path that
  * makes each shard provably connected (the lite stand-in for HNSW's
  * upper layers). Shard size is ~replicas·n/lists — with the √n
  * default, a bounded task-local working set at any corpus scale.
  *
  * QUERY: probes rank the frozen seeds (a narrow map over bounded
  * driver-side state — the [[Similarity.ivfNearestLists]] kernel),
  * fan to their `nprobe` nearest shards, and the probed shards' rows
  * are CO-GROUPED with their probes: each task materializes only its
  * own shard (never the corpus), runs the greedy beam search per
  * probe in-memory, and the per-shard top-k lists merge into the
  * global top-k with one bounded window. The index scan prunes to
  * probed lists through the `list_id` zone maps. Nothing whole-index
  * ever reaches the driver — the previous design's full-table
  * `collect()` (a driver OOM at 100×) is gone.
  *
  * MAINTENANCE ([[refreshFrom]]): rides the L8 change feed like
  * [[PqIndex.refreshFrom]] — deletes DV out by id; inserts route to
  * their frozen shards and splice in with the standard graph-ANN
  * insertion (exact top-m links against the RAM-resident shard,
  * reverse edges, 2m prune), rewriting only the AFFECTED shards —
  * O(delta shards), never a corpus rebuild.
  */
class NswIndex private (spark: SparkSession, val root: String,
    meta: NswIndexMeta, pinnedServe: Option[Int]) {

  val table: ManifestTable = NswIndex.indexTable(spark, root)

  /** Snapshot pin for SERVING: query() reads the table version the
    * CALLER validated this handle's meta against (threaded in, never
    * re-read — a re-read could postdate a concurrent re-splitting
    * commit and pair new data with this handle's old sub-counts,
    * silently dropping the rehashed members). A handle therefore
    * always serves a layout-consistent snapshot; re-open via load(),
    * or use the handle refreshFrom returns, to serve newer data.
    */
  private val serveVersion: Option[Int] = pinnedServe

  def m: Int = meta.m
  def lists: Int = meta.lists
  def replicas: Int = meta.replicas
  def sourceVersion: Int = meta.sourceVersion

  private def seedArr: Array[(Long, Array[Double])] =
    meta.seedIds.zip(meta.seedVs.map(_.toArray)).toArray

  /** Physical sub-shards per IVF list (1 = unsplit; >1 = the hot-list
    * cap kicked in at build — see [[NswIndex.build]]). Frozen with the
    * seeds.
    */
  private lazy val subCountByList: Map[Long, Int] =
    meta.seedIds.zip(meta.subCounts).toMap
  private def subsOf(listId: Long): Int = subCountByList.getOrElse(listId, 1)

  /** The `shard_id = list_id*1024 + sub` column for an assigned
    * `(list_id, vec_id, ...)` frame — sub-shard choice is a frozen
    * hash of vec_id, so build, refresh, and replay all agree. The
    * when-chain covers only SPLIT lists (pathological few by
    * construction); everything else is sub 0.
    */
  private[operators] def shardIdCol: org.apache.spark.sql.Column =
    NswIndex.shardIdColFor(subCountByList)

  /** Zone-map-pruned shard scan (the [[PqIndex]] scanLists shape): one
    * scan of the files intersecting any probed list's CONTIGUOUS
    * shard-id range [l·1024, l·1024+subs−1], full scan past
    * [[PqIndex.MaxPrunedLists]] ranges — over-reading only costs IO,
    * the downstream cogroup keys keep correctness.
    */
  private def scanLists(probed: Seq[Long],
      version: Option[Int] = None): DataFrame =
    if (probed.isEmpty) table.read(version).filter(lit(false))
    else if (probed.size <= PqIndex.MaxPrunedLists)
      table.readRangesBy("shard_id", probed.map { l =>
        val base = l * NswIndex.MaxSubShards
        (base.toString, (base + subsOf(l) - 1).toString)
      }, version)
    else table.read(version)

  /** Serve a probe batch `(q_id, q_v)` (unit-normalized, the PqIndex
    * probe shape): returns `(q_id, rn, neighbor, sim)` — the s1/s9
    * output contract. `ef` is the beam width, `nprobe` the shard
    * fan-out (the two recall knobs).
    */
  def query(probes0: DataFrame, topK: Int = 3, ef: Int = 64,
      nprobe: Int = 4): DataFrame = {
    import spark.implicits._
    // probe routing runs ON THE DRIVER (the ivfPqQuery precedent): both
    // inputs are bounded — the seed codebook and a serving batch — and
    // ranking them here skips two Spark jobs per query (the routing map
    // and the probed-list distinct/collect). Tie-breaks match
    // ivfNearestLists exactly: (dot desc, list_id asc).
    val probeRows = probes0
      .select(col("q_id").cast("long"), col("q_v")).collect() // bounded: the serving batch
    // the serving-batch bound is part of the API contract, not an
    // accident of the routing shape: past it, chunk the batch (each
    // chunk is an independent query) — an unbounded probe side (e.g. a
    // corpus-sized self-join) must not become a driver OOM
    require(probeRows.length <= NswIndex.MaxProbeBatch,
      s"NSW serving batch ${probeRows.length} exceeds ${NswIndex.MaxProbeBatch}; " +
        "chunk the probes and query per chunk")
    val seeds = seedArr
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { s += a(i) * b(i); i += 1 }
      s
    }
    val routedRows = probeRows.flatMap { r =>
      val qId = r.getLong(0)
      val qv = r.getSeq[Double](1).toArray
      seeds.map { case (lid, sv) => (lid, dot(qv, sv)) }
        .sortWith { case ((lidA, sA), (lidB, sB)) =>
          // Double.compare, not negation: NaN (zero-norm probe) ranks
          // greatest-first, matching Spark's desc semantics
          val c = java.lang.Double.compare(sB, sA)
          if (c != 0) c < 0 else lidA < lidB
        }
        .take(nprobe)
        // fan to EVERY sub-shard of a probed list: a split list is a
        // hot list, and all its data must be searched — the fan-out
        // grows exactly where the data does
        .flatMap { case (lid, _) =>
          val base = lid * NswIndex.MaxSubShards
          (0 until subsOf(lid)).map(s => (base + s, qId, qv.toSeq))
        }
    }
    val routed = spark.createDataset(routedRows.toSeq)
      .toDF("shard_id", "q_id", "q_v").as[(Long, Long, Seq[Double])]
    // bounded: ≤ min(lists, probes×nprobe) values — prunes the shard
    // scan. floorDiv, not /: list ids are corpus vec_ids and may be
    // negative, where truncating division recovers the wrong list
    val probedLists = routedRows
      .map(t => Math.floorDiv(t._1, NswIndex.MaxSubShards))
      .distinct.sorted.toSeq
    val shards = scanLists(probedLists, serveVersion)
      .select(col("shard_id"), col("vec_id"), col("v"), col("neighbors"))
      .as[(Long, Long, Seq[Double], Seq[Long])]
    val mEf = ef
    val mTopK = topK
    val mEntries = meta.entriesPerShard
    val hits = shards.groupByKey(_._1)
      .cogroup(routed.groupByKey(_._1)) { (_, nodeIt, probeIt) =>
        val ps = probeIt.toArray
        if (ps.isEmpty) Iterator.empty
        else {
          // the task-local shard: ~replicas·n/lists rows by design
          val rows = nodeIt.toArray.sortBy(_._2) // id order ⇒ deterministic ties
          val n = rows.length
          val ids = new Array[Long](n)
          val vecs = new Array[Array[Double]](n)
          val index = new java.util.HashMap[Long, Integer](n * 2)
          var i = 0
          while (i < n) {
            ids(i) = rows(i)._2
            vecs(i) = rows(i)._3.toArray
            index.put(ids(i), i)
            i += 1
          }
          val adj: Array[Array[Int]] = Array.tabulate(n) { j =>
            rows(j)._4
              .flatMap(id => Option(index.get(id)).map(_.intValue)).toArray
          }
          // per-shard entry points: the ivfSeedsOf hash spread over the
          // shard's own members — derived, never stored
          val entries = (0 until n)
            .sortBy(j => ((ids(j) * 40503L % 999983L + 999983L) % 999983L, ids(j)))
            .take(mEntries).toArray
          ps.sortBy(_._2).iterator.flatMap { case (_, qId, qv) =>
            NswIndex.beamSearch(qv.toArray, ids, vecs, adj, entries,
                mEf, mTopK, excludeId = qId)
              .iterator.map { case (nid, sim) =>
                (qId, nid, math.rint(sim * 1e6) / 1e6)
              }
          }
        }
      }
      .toDF("q_id", "neighbor", "sim")
    // replica dedup (a boundary vector answers from ≤ replicas shards
    // with the identical exact cosine) + global top-k merge
    val wq = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("neighbor").asc)
    hits.groupBy(col("q_id"), col("neighbor")).agg(max(col("sim")).as("sim"))
      .withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= topK)
      .select(col("q_id"), col("rn").cast("int").as("rn"),
        col("neighbor"), col("sim"))
      .orderBy(col("q_id").asc, col("rn").asc)
  }

  /** Catch the index up to `source`'s latest version through the
    * change feed: deletes/update-preimages DV out by id;
    * inserts/update-postimages are unit-normalized, routed to their
    * `replicas` nearest FROZEN seeds, and spliced into each affected
    * shard by the standard graph-ANN insertion — exact top-m links
    * against the RAM-resident shard, reverse edges, prune to the 2m
    * cap (ring links exempt — see [[NswIndex.spliceShard]]). Only
    * affected shards rewrite — O(delta shards). Returns the refreshed
    * index; a no-op when current.
    *
    * ATOMIC: every DV mark (dead ids AND rewritten shards) and the
    * rebuilt-shard append land as ONE strict
    * [[ManifestTable.deleteKeysAndAppend]] commit — a crash leaves
    * the full old index or the full new one, and a racing refresh
    * observes the winner as a ConcurrentModificationException before
    * its cursor could move. Idempotent like [[PqIndex.refreshFrom]]:
    * the existing-member scan EXCLUDES touched ids, so a stale-cursor
    * replay re-upserts the same rows instead of duplicating. Dangling
    * neighbor ids left by deletions resolve to nothing at query time
    * (the shard-local id→slot lookup drops them), so correctness
    * never depends on back-edge cleanup.
    *
    * RE-SPLIT UNDER GROWTH: the build-time hot-list cap carries into
    * refresh — a list whose projected membership outgrows its
    * sub-shard budget re-splits into ceil(total/cap) hash sub-shards
    * (grow-only, capped at 1024); its members rehash and rebuild as
    * fresh self-contained subgraphs. The new layout is written to the
    * meta sidecar BEFORE the data commit (an inflated sub-count only
    * over-fans probes into empty shards — harmless — while a data
    * commit the meta doesn't describe would hide sub-shards from
    * every query), and the cursor advances only AFTER it.
    */
  def refreshFrom(source: ManifestTable, idCol: String, vecCol: String): NswIndex = {
    import spark.implicits._
    val vTo = source.latestVersion.getOrElse(
      throw new IllegalStateException("source table has no versions"))
    if (vTo == meta.sourceVersion) return this
    // the optimistic base: every scan below reads THIS snapshot and
    // the commit pins it — a commit landing in between (a racing
    // refresh) is a detected conflict, never a silent interleave
    val baseV = table.latestVersion
    val changes = (
      if (meta.sourceVersion < 0)
        source.read(Some(vTo))
          .withColumn("_change_type", lit("insert"))
      else source.changesBetween(meta.sourceVersion, vTo, Seq(idCol))
    ).localCheckpoint(true)
    var layoutByList: Map[Long, Int] = Map.empty
    try {
      val deadIds = changes
        .filter(col("_change_type").isin("delete", "update_preimage"))
        .select(col(idCol).cast("string")).distinct()
        .collect().map(_.getString(0)).toSeq // bounded by the delta
      val fresh = changes
        .filter(col("_change_type").isin("insert", "update_postimage"))
        .select(col(idCol).as("vec_id"), col(vecCol).as("raw_v"))
      val freshIds = fresh.select(col("vec_id").cast("string")).distinct()
        .collect().map(_.getString(0)).toSeq // bounded by the delta
      val touched = (deadIds ++ freshIds).distinct
      if (freshIds.isEmpty) {
        if (touched.nonEmpty) {
          NswIndex.testBeforeCommit()
          table.deleteKeysAndAppend(Seq("vec_id" -> touched), Seq.empty,
            strict = true, version = baseV): Unit
        }
      } else {
        val unit = Similarity.unitize(fresh)
        val assigned0 = Similarity
          .ivfNearestLists(unit, seedArr, meta.replicas, keepV = true)
          .select(col("list_id"), col("vec_id"), col("v"))
          .localCheckpoint(true) // feeds the counts AND the routing below
        try {
          // bounded: ≤ `lists` rows
          val freshPerList = assigned0.groupBy(col("list_id")).count()
            .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
          val affectedLists = freshPerList.keySet.toSeq.sorted
          val listOf = shiftright(col("shard_id"), NswIndex.SubShardBits)
          // every LIVE member of every affected list (all sub-shards —
          // the re-split decision needs list totals). Touched ids are
          // excluded HERE: their DV marks land only in the atomic
          // commit below, so the scan still sees them.
          val affectedListsDf = broadcast(
            spark.createDataset(affectedLists).toDF("_aff_list"))
          val touchedDf = broadcast(
            spark.createDataset(touched).toDF("_dead_id"))
          val existing = scanLists(affectedLists, baseV)
            .join(affectedListsDf, listOf === col("_aff_list"), "left_semi")
            .join(touchedDf,
              col("vec_id").cast("string") === col("_dead_id"), "left_anti")
            .select(col("shard_id"), col("vec_id"), col("v"), col("neighbors"))
            .localCheckpoint(true) // counts + two splice legs consume it
          try {
            // bounded: ≤ physical shards of the affected lists
            val existPerShard = existing.groupBy(col("shard_id")).count()
              .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
            val existPerList = existPerShard.groupBy { case (sid, _) =>
              Math.floorDiv(sid, NswIndex.MaxSubShards)
            }.map { case (l, m0) => l -> m0.values.sum }
            val cap =
              if (meta.maxShardRows > 0) meta.maxShardRows else Long.MaxValue
            val newSubCounts: Map[Long, Int] = affectedLists.map { l =>
              val total = existPerList.getOrElse(l, 0L) + freshPerList(l)
              val want = math.min(NswIndex.MaxSubShards,
                math.max(subsOf(l).toLong, (total + cap - 1) / cap)).toInt
              l -> want
            }.toMap
            // crash-replay repair: a write-ahead that landed without
            // its data commit leaves subsOf inflated while the members
            // still sit in the old shards — any physical shard past
            // the cap forces a rehash even when the sub-count itself
            // needs no further growth
            val oversized = existPerShard.collect {
              case (sid, cnt) if cnt > cap =>
                Math.floorDiv(sid, NswIndex.MaxSubShards)
            }.toSet
            val resplit = (newSubCounts
              .filter { case (l, s) => s > subsOf(l) }.keySet
              ++ oversized).toSeq.sorted
            val mergedSubs = subCountByList ++ newSubCounts
            val assigned = assigned0
              .withColumn("shard_id", NswIndex.shardIdColFor(mergedSubs))
              .select(col("shard_id"), col("vec_id"), col("v"))
            // members of re-split lists REHASH across the new layout
            // and rebuild from scratch as fresh nodes (their stored
            // links cross sub-shard borders); everyone else splices
            val (reMembers, keepMembers) =
              if (resplit.isEmpty) (None, existing)
              else (Some(existing.filter(listOf.isin(resplit: _*))),
                existing.filter(!listOf.isin(resplit: _*)))
            val rehashed = reMembers.map(_
              .withColumn("list_id", listOf)
              .withColumn("shard_id", NswIndex.shardIdColFor(mergedSubs))
              .select(col("shard_id"), col("vec_id"), col("v")))
            val freshAll = rehashed.fold(assigned)(_.unionByName(assigned))
              .as[(Long, Long, Seq[Double])]
            // shards to rewrite: those receiving fresh members, plus —
            // for re-split lists — every OLD physical shard (their
            // members moved). Bounded: ≤ delta×replicas + resplit subs.
            val freshShards = freshAll.select(col("shard_id")).distinct()
              .as[Long].collect().toSeq
            val resplitSet = resplit.toSet
            val oldResplitShards = existPerShard.keys.filter(sid =>
              resplitSet.contains(Math.floorDiv(sid, NswIndex.MaxSubShards)))
            val deleteShards =
              (freshShards ++ oldResplitShards).distinct.sorted
            val deleteShardsDf = broadcast(
              spark.createDataset(deleteShards).toDF("_rw_shard"))
            val spliceExisting = keepMembers
              .join(deleteShardsDf, col("shard_id") === col("_rw_shard"),
                "left_semi")
              .select(col("shard_id"), col("vec_id"), col("v"), col("neighbors"))
              .as[(Long, Long, Seq[Double], Seq[Long])]
            val mM = meta.m
            val rebuilt = spliceExisting.groupByKey(_._1)
              .cogroup(freshAll.groupByKey(_._1)) { (sid, nodeIt, freshIt) =>
                NswIndex.spliceShard(sid, nodeIt, freshIt, mM)
              }
              .toDF("shard_id", "vec_id", "v", "neighbors")
              // materialize BEFORE the commit invalidates the scan
              .localCheckpoint(true)
            layoutByList = mergedSubs
            if (resplit.nonEmpty) {
              // WRITE-AHEAD layout, cursor unchanged — MERGED into the
              // on-disk meta (per-list max), so a racing loser can
              // never clobber the winner's layout (see scaladoc)
              NswIndex.writeMetaMergedLayout(spark, root, meta,
                mergedSubs, cursor = None): Unit
            }
            try {
              NswIndex.testBeforeCommit()
              table.deleteKeysAndAppend(
                Seq("vec_id" -> touched,
                  "shard_id" -> deleteShards.map(_.toString)),
                Seq(rebuilt.repartitionByRange(
                  math.max(1, math.min(meta.lists, NswIndex.IndexFiles)),
                  col("shard_id"))),
                strict = true, version = baseV): Unit
            } finally graft.functions.CheckpointOps.release(rebuilt)
          } finally graft.functions.CheckpointOps.release(existing)
        } finally graft.functions.CheckpointOps.release(assigned0)
      }
    } finally graft.functions.CheckpointOps.release(changes)
    // cursor advances only after the commit it describes; sub-counts
    // merge against disk so a racer's inflation is never shrunk back.
    // The pinned serve version is captured BEFORE the meta merge —
    // load()'s invariant is meta-postdates-version, under which any
    // skew can only over-fan probes into empty ranges. Reading the
    // version after the merge would invert that: a racing re-split
    // completing in between yields a handle whose pinned version
    // includes data its layout doesn't describe (under-fanned probes).
    val vAfter = table.latestVersion
    val next = NswIndex.writeMetaMergedLayout(spark, root, meta,
      layoutByList, cursor = Some(vTo))
    new NswIndex(spark, root, next, vAfter)
  }
}

object NswIndex {

  /** Target file count for the index table: range-partitioned by
    * `list_id` so the zone maps prune the probe scan tightly.
    */
  private[operators] val IndexFiles = 16

  /** Minimum rows a default-layout shard should hold — below this,
    * extra shards only shred true-neighbor sets (recall) without
    * buying parallelism worth having.
    */
  private[operators] val TargetShardRows = 256L

  private def metaPath(root: String) = s"$root/_graft_nsw_meta"

  private val metaCache =
    new java.util.concurrent.ConcurrentHashMap[String, (NswIndexMeta, Option[Int])]()

  /** shard_id = list_id · MaxSubShards + sub — one flat long key that
    * keeps a list's sub-shards CONTIGUOUS (zone ranges stay one
    * (lo, hi) pair per probed list).
    */
  private[operators] val MaxSubShards = 1024L

  /** log2(MaxSubShards): `shard_id >> SubShardBits` is the exact
    * list id for NEGATIVE ids too (arithmetic shift ≡ floorDiv by a
    * power of two, where truncating division rounds the wrong way).
    */
  private[operators] val SubShardBits = 10
  require((1L << SubShardBits) == MaxSubShards)

  /** Hard bound on one serving batch's driver-side probe rows — the
    * routing state is deliberately driver-resident (bounded, skips two
    * Spark jobs per query), so the probe side must be bounded too.
    * Callers with more probes chunk the batch.
    */
  private[operators] val MaxProbeBatch = 131072

  /** Test seam: runs immediately before refreshFrom's atomic commit —
    * the crash/race injection point for the durability specs. No-op in
    * production.
    */
  private[graft] var testBeforeCommit: () => Unit = () => ()

  /** The sub-shard routing column for an arbitrary layout map — shared
    * by build, the instance's frozen layout, and refresh's re-split
    * layout, so every path hashes members identically.
    */
  private[operators] def shardIdColFor(
      subs: Map[Long, Int]): org.apache.spark.sql.Column = {
    val subCol = subs.filter(_._2 > 1).foldLeft(lit(0L)) {
      case (acc, (l, s)) =>
        when(col("list_id") === l,
          pmod(xxhash64(col("vec_id")), lit(s.toLong))).otherwise(acc)
    }
    col("list_id") * MaxSubShards + subCol
  }

  private[operators] def indexTable(spark: SparkSession, root: String): ManifestTable =
    new ManifestTable(spark, s"$root/index",
      statsCol = Some("shard_id"), bloomCol = Some("vec_id"))

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

  /** Graph-ANN insertion for one RAM-resident shard: newcomers splice
    * in id order (batch-internal links form too) — exact top-m links
    * by (sim desc, id asc) against current members, reverse edges,
    * prune any list past 2m back to the 2m best. Emits EVERY row of
    * the shard (the caller rewrites the shard wholesale — shard-
    * granular, bounded, no row-level adjacency merge). Deterministic:
    * sorted iteration, total-order tie-breaks, sorted output lists.
    *
    * RING INVARIANT: build exempts each shard's hash-ordered ring
    * path from the 2m cap (eviction could disconnect the subgraph).
    * A rewrite must uphold it, so the ring is RE-DERIVED here over
    * the FINAL member set: its edges are never evicted by the prune
    * and are unioned into the output adjacency — repeated refreshes
    * can therefore never disconnect a shard, and an all-fresh shard
    * (a re-split rebuild) comes out connected by construction.
    */
  private[operators] def spliceShard(lid: Long,
      nodeIt: Iterator[(Long, Long, Seq[Double], Seq[Long])],
      freshIt: Iterator[(Long, Long, Seq[Double])], m: Int)
      : Iterator[(Long, Long, Seq[Double], Seq[Long])] = {
    import scala.collection.mutable
    val vecs = mutable.LinkedHashMap.empty[Long, Array[Double]]
    val adj = mutable.LinkedHashMap.empty[Long, mutable.ArrayBuffer[Long]]
    nodeIt.toArray.sortBy(_._2).foreach { case (_, id, v, nbs) =>
      vecs(id) = v.toArray
      adj(id) = mutable.ArrayBuffer(nbs: _*)
    }
    val freshArr = freshIt.toArray.sortBy(_._2)
    // the final member set's hash-ordered ring (same spread hash as
    // build's wRing; pmod semantics, so negative ids order fine)
    def ringHash(id: Long): Long =
      (((id * 40503L + 17L) % 999983L) + 999983L) % 999983L
    val finalIds = (vecs.keysIterator ++ freshArr.iterator.map(_._2)).toArray
    val ringOrder = finalIds.sortBy(id => (ringHash(id), id))
    val ringPairs = mutable.HashSet.empty[(Long, Long)]
    var ri = 0
    while (ri < ringOrder.length - 1) {
      ringPairs += ((ringOrder(ri), ringOrder(ri + 1)))
      ringPairs += ((ringOrder(ri + 1), ringOrder(ri)))
      ri += 1
    }
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { s += a(i) * b(i); i += 1 }
      s
    }
    freshArr.foreach { case (_, id, vSeq) =>
      val v = vSeq.toArray
      val links = vecs.iterator
        .filter(_._1 != id)
        .map { case (oid, ov) => (oid, dot(v, ov)) }
        .toArray
        .sortBy { case (oid, s) => (-s, oid) }
        .take(m).map(_._1)
      vecs(id) = v
      adj(id) = mutable.ArrayBuffer.from(links)
      links.foreach { t =>
        val lst = adj(t)
        if (!lst.contains(id)) {
          lst += id
          if (lst.size > 2 * m) {
            // prune NON-RING links only: ring edges are load-bearing
            val tv = vecs(t)
            val (ring, others) = lst.partition(nb => ringPairs((t, nb)))
            val kept = others.iterator
              .map(nb => (nb, vecs.get(nb).map(dot(tv, _)).getOrElse(Double.MinValue)))
              .toArray
              .sortBy { case (nb, s) => (-s, nb) }
              .take(2 * m).map(_._1)
            lst.clear()
            lst ++= ring
            lst ++= kept
          }
        }
      }
    }
    // union the fresh ring in: connectivity holds whatever the splice
    // order or prune history (stale ring edges of the PREVIOUS member
    // set remain as ordinary prunable links)
    ri = 0
    while (ri < ringOrder.length - 1) {
      val a = ringOrder(ri); val b = ringOrder(ri + 1)
      if (!adj(a).contains(b)) adj(a) += b
      if (!adj(b).contains(a)) adj(b) += a
      ri += 1
    }
    vecs.iterator.map { case (id, v) =>
      (lid, id, v.toSeq, adj(id).sorted.distinct.toSeq)
    }
  }

  /** Build from a unit-normalized corpus `emb(vec_id, v)`: assign every
    * vector to its `replicas` nearest hash-seeded IVF lists (SPANN
    * closure assignment), build a self-contained navigable subgraph
    * PER SHARD — within-shard kNN links, undirected with a 2m cap,
    * plus a hash-ordered ring path so each shard is provably connected
    * — and persist rows range-partitioned by `shard_id` (tight zone
    * maps), meta sidecar LAST (crash ⇒ no loadable index, same as
    * PqIndex). `lists` ≤ 0 picks ≈√n, the shard-size sweet spot (each
    * shard ~replicas·√n rows — a task-local working set at any scale;
    * every per-shard step keys its shuffle by `shard_id`, so the build
    * is shard-parallel end to end, never corpus-quadratic).
    *
    * HOT-LIST CAP: hash-sampled seeds balance shards in expectation,
    * but a duplicate-heavy or pathologically dense region can still
    * pile one list far past the average — and the per-shard |shard|²
    * kNN is exactly what must not see that. Any list exceeding
    * `maxShardRows` (default: 4× the balanced size) splits into
    * hash-of-vec_id sub-shards of bounded size, each its own
    * self-contained subgraph under `shard_id = list_id·1024 + sub`;
    * probes fan to every sub-shard of a probed list (the fan-out
    * grows exactly where the data does), and the frozen sub-counts
    * ride the meta so refresh routes identically.
    */
  def build(spark: SparkSession, emb: DataFrame, root: String,
      m: Int = 8, lists: Int = -1, replicas: Int = 2,
      entriesPerShard: Int = 8, sourceVersion: Int = -1,
      maxShardRows: Long = 0L): NswIndex = {
    val nRows = emb.count()
    // default layout: shards of ≥ TargetShardRows (few, large shards
    // at small n — recall comes from probing most of them; tiny shards
    // would shred a near-uniform corpus's true-neighbor sets), capped
    // at √n once the corpus is big enough that √n shards already hold
    // ≥ TargetShardRows each — the SPANN posting-list sweet spot
    val listsN =
      if (lists > 0) lists
      else math.max(4L, math.min(nRows / TargetShardRows,
        math.sqrt(nRows.toDouble).toLong)).toInt
    val replicasN = math.max(1, replicas)
    val seedRows = Similarity.ivfSeedsOf(emb, listsN).collect() // bounded: `lists` rows
    val seedArr = seedRows.map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    require(seedArr.forall(s => math.abs(s._1) < Long.MaxValue / (2 * MaxSubShards)),
      "vec_id-derived list ids must leave room for the sub-shard encoding")
    val assigned0 = Similarity
      .ivfNearestLists(emb, seedArr, replicasN, keepV = true)
      .select(col("list_id"), col("vec_id"), col("v"))
    // the hot-list cap: per-list counts are bounded driver state
    // (`lists` rows); lists past the cap split into hash sub-shards
    val cap =
      if (maxShardRows > 0) maxShardRows
      else math.max(TargetShardRows * 4,
        4L * ((nRows * replicasN + listsN - 1) / listsN))
    val counts = assigned0.groupBy(col("list_id")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val subCounts = seedRows.map { r =>
      val c = counts.getOrElse(r.getLong(0), 0L)
      math.min(MaxSubShards, math.max(1L, (c + cap - 1) / cap)).toInt
    }
    val subByList = seedRows.map(_.getLong(0)).zip(subCounts).toMap
    val assigned = assigned0
      .withColumn("shard_id", shardIdColFor(subByList))
      .select(col("shard_id"), col("vec_id"), col("v"))
    // within-shard kNN: cosine over each unordered member pair ONCE,
    // mirrored; |shard|² work keyed by shard_id — bounded per task
    val nbrs = assigned.select(col("shard_id"),
      col("vec_id").as("neighbor"), col("v").as("n_v"))
    val half = assigned.join(nbrs, Seq("shard_id"))
      .filter(col("vec_id") < col("neighbor"))
      .withColumn("sim", round(
        graft.functions.CosineSimilarity.cosine(spark, col("v"), col("n_v")), 6))
      .select(col("shard_id"), col("vec_id"), col("neighbor"), col("sim"))
    val scored = half.unionByName(half.select(col("shard_id"),
      col("neighbor").as("vec_id"), col("vec_id").as("neighbor"), col("sim")))
    val w = Window.partitionBy(col("shard_id"), col("vec_id"))
      .orderBy(col("sim").desc, col("neighbor").asc)
    val knn = scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= m)
      .select(col("shard_id"), col("vec_id"), col("neighbor"), col("sim"))
    // undirect: every kNN edge in both directions, re-cap at 2m per
    // node (keep the strongest links) — what makes greedy search
    // navigable: a node nothing points to is reached via back-edges
    val undirected = knn
      .unionByName(knn.select(col("shard_id"), col("neighbor").as("vec_id"),
        col("vec_id").as("neighbor"), col("sim")))
      .groupBy(col("shard_id"), col("vec_id"), col("neighbor"))
      .agg(max(col("sim")).as("sim"))
    val cappedPairs = undirected.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2 * m)
      .select(col("shard_id"), col("vec_id"), col("neighbor"))
    // long-range links: a kNN graph over clustered data is a set of
    // disconnected islands (the problem HNSW's upper layers solve).
    // The lite fix, per shard: a hash-ordered PATH through the shard's
    // members — provably connected with ≤2 extra links per node, and
    // hash-spread ⇒ long-range. Exempt from the 2m cap (eviction
    // could disconnect). The sort is per-shard over narrow rows.
    val wRing = Window.partitionBy(col("shard_id")).orderBy(
      pmod(col("vec_id") * 40503L + 17L, lit(999983L)).asc,
      col("vec_id").asc)
    val ring = assigned.select(col("shard_id"), col("vec_id"))
      .withColumn("nxt", lead(col("vec_id"), 1).over(wRing))
      .filter(col("nxt").isNotNull)
    val ringBoth = ring.select(col("shard_id"), col("vec_id"), col("nxt").as("neighbor"))
      .unionByName(ring.select(col("shard_id"), col("nxt").as("vec_id"),
        col("vec_id").as("neighbor")))
    val adjacency = cappedPairs.unionByName(ringBoth).distinct()
      .groupBy(col("shard_id"), col("vec_id"))
      .agg(sort_array(collect_list(col("neighbor"))).as("neighbors"))
    val nodes = assigned.join(adjacency, Seq("shard_id", "vec_id"), "left")
      .select(col("shard_id"), col("vec_id"), col("v"),
        coalesce(col("neighbors"), array().cast("array<bigint>"))
          .as("neighbors"))
    val mt = indexTable(spark, root)
    mt.write(nodes.repartitionByRange(
      math.max(1, math.min(listsN, IndexFiles)), col("shard_id")), "overwrite")
    // version captured BEFORE the meta write: load()'s invariant is
    // meta-postdates-version (skew can only over-fan, never under-fan)
    val vBuilt = mt.latestVersion
    val meta = NswIndexMeta(m, listsN, replicasN, entriesPerShard,
      sourceVersion, seedRows.map(_.getLong(0)).toSeq,
      seedRows.map(_.getSeq[Double](1).toIndexedSeq).toSeq,
      subCounts.toSeq, cap) // the cap FREEZES with the layout: refresh
    // enforces the same bound it was built under (re-split trigger)
    resetMeta(spark, root) // a rebuild must not merge prior deltas
    writeMeta(spark, root, meta)
    new NswIndex(spark, root, meta, vBuilt)
  }

  /** APPEND a meta delta — never overwrite. The meta state is a CRDT:
    * sub-counts only grow (element-wise max) and the cursor only
    * advances (max), so readers MERGE every delta file and
    * concurrent writers cannot lose each other's updates — the
    * read-merge-write form this replaces had a classic lost-update
    * window in which a racing loser's stale overwrite could hide the
    * winner's re-split layout (silent row loss at serve time).
    */
  private[operators] def writeMeta(spark: SparkSession, root: String,
      meta: NswIndexMeta): Unit = {
    import spark.implicits._
    val dir = s"${metaPath(root)}/delta_${java.util.UUID.randomUUID().toString.take(12)}"
    Seq(meta).toDS().coalesce(1).write.mode("overwrite").parquet(dir)
    // invalidate, don't re-pair: a put here would need a table-version
    // read that races the very commits the cache key exists to track
    metaCache.remove(root): Unit
  }

  /** Remove every meta delta — a fresh build at a reused root must not
    * merge against a previous index's layout.
    */
  private[operators] def resetMeta(spark: SparkSession, root: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(metaPath(root))
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(p, true)
    metaCache.remove(root): Unit
  }

  /** Fresh on-disk meta read: unions every delta file (recursive — the
    * legacy single-overwrite layout reads identically), evolves older
    * schemas in place (`subCounts`/`maxShardRows` default when the
    * columns predate them), and MERGES: element-wise max sub-counts,
    * max cursor. Merge order is irrelevant (grow-only lattice), so any
    * interleaving of writers yields the same state.
    */
  private[graft] def readDiskMeta(spark: SparkSession,
      root: String): Option[NswIndexMeta] = {
    import spark.implicits._
    val p = new org.apache.hadoop.fs.Path(metaPath(root))
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) return None
    // "meta dir exists but holds no parquet" is the same as absent —
    // a crash between mkdir and the first delta write. But parquet
    // PRESENT and unreadable is corruption, and serving as if no index
    // existed (or worse, merging a partial view) silently degrades
    // every probe — fail loudly and let the operator resetMeta+build.
    val hasParquet = {
      val it = fs.listFiles(p, true)
      var found = false
      while (!found && it.hasNext)
        found = it.next().getPath.getName.endsWith(".parquet")
      found
    }
    if (!hasParquet) return None
    val rows =
      try {
        var raw = spark.read.option("recursiveFileLookup", "true")
          .parquet(metaPath(root))
        if (!raw.columns.contains("subCounts"))
          raw = raw.withColumn("subCounts",
            org.apache.spark.sql.functions.array().cast("array<int>"))
        if (!raw.columns.contains("maxShardRows"))
          raw = raw.withColumn("maxShardRows",
            org.apache.spark.sql.functions.lit(0L))
        raw.as[NswIndexMeta].collect().toSeq
      } catch {
        case scala.util.control.NonFatal(e) =>
          throw new IllegalStateException(
            s"NSW meta at ${metaPath(root)} is present but unreadable " +
              "(corrupt delta parquet?) — refusing to serve a partial " +
              "layout; resetMeta + rebuild to recover", e)
      }
    if (rows.isEmpty) return None
    val norm = rows.map(r => r.copy(subCounts =
      if (r.subCounts.nonEmpty) r.subCounts
      else Seq.fill(r.seedIds.size)(1)))
    val base = norm.maxBy(_.sourceVersion)
    Some(base.copy(
      subCounts = norm.map(_.subCounts).transpose.map(_.max),
      sourceVersion = norm.map(_.sourceVersion).max))
  }

  /** Publish this refresh's layout knowledge as one merged delta:
    * the handle's sub-counts maxed with `subsByList`, cursor advanced
    * only when `cursor` is set (a write-ahead keeps the old one, so a
    * crashed or losing refresh never moves it). Returns the merged
    * on-disk view for the caller's next handle.
    */
  private[operators] def writeMetaMergedLayout(spark: SparkSession,
      root: String, fallback: NswIndexMeta,
      subsByList: Map[Long, Int], cursor: Option[Int]): NswIndexMeta = {
    val baseSubs =
      if (fallback.subCounts.nonEmpty) fallback.subCounts
      else Seq.fill(fallback.seedIds.size)(1)
    val merged = fallback.seedIds.zip(baseSubs).map { case (l, s) =>
      math.max(s, subsByList.getOrElse(l, 1))
    }
    val delta = fallback.copy(subCounts = merged,
      sourceVersion = cursor.getOrElse(fallback.sourceVersion))
    writeMeta(spark, root, delta)
    readDiskMeta(spark, root).getOrElse(delta)
  }

  def load(spark: SparkSession, root: String): Option[NswIndex] = {
    val p = new org.apache.hadoop.fs.Path(metaPath(root))
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) { metaCache.remove(root); return None }
    // ORDER MATTERS: the table version is read BEFORE the meta. Every
    // data commit's layout is already on disk when the commit lands
    // (the write-ahead delta), and sub-counts only grow, so a meta
    // read that postdates the version read can only OVER-fan probes
    // into empty ranges — never under-fan and miss rehashed members.
    val curV = indexTable(spark, root).latestVersion
    Option(metaCache.get(root))
      .collect { case (mm, v) if v == curV =>
        new NswIndex(spark, root, mm, curV)
      }
      .orElse {
        readDiskMeta(spark, root).map { mm =>
          metaCache.put(root, mm -> curV)
          new NswIndex(spark, root, mm, curV)
        }
      }
  }
}

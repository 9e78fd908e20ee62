package graft.operators

import graft.functions.Bpe
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding tokenizer TRAINING (Sennrich et al.
  * 2016) — the canonical algorithm, re-shaped for Spark's execution
  * model in two tiers:
  *
  *  1. ONE pass over the corpus builds the distinct-word frequency
  *     table (explode + hash aggregate with map-side combine). Zipf's
  *     law makes this table orders of magnitude smaller than the
  *     corpus — it is the ONLY corpus-size-dependent step: at 100 TB
  *     of text the scan is the cost, and everything after runs on the
  *     ~10⁷–10⁹-row word table.
  *  2. The merge loop is inherently sequential (each argmax depends on
  *     the previous merge), so the iteration engine is picked by word-
  *     table size:
  *     - **Local incremental** (table fits the driver — the common
  *       case even for TB corpora): collect (word, cnt) once and run
  *       the classic incremental trainer — a pair→count map, a
  *       pair→words occurrence index, and a lazy-invalidation max-heap;
  *       each merge touches only the words CONTAINING the winning pair
  *       and applies signed count deltas. 32k–64k merges are microsec-
  *       onds per merge, zero Spark jobs — merge count no longer
  *       multiplies cluster work.
  *     - **Distributed incremental** (vocabulary too large to
  *       collect): the same signed-delta idea as incrementally
  *       maintained DataFrames (the IVM pattern of
  *       [[graft.lake.IncrementalView]]): a persistent hash-partitioned
  *       (l, r) → count pair table; per merge, ONLY words containing
  *       the winning pair (a narrow `contains` filter) emit
  *       −before/+after pair deltas, and the only per-merge SHUFFLE is
  *       delta-sized — the fold into the pair table is a
  *       same-partitioner zipPartitions, narrow (zero network) on the
  *       table side, though it does rewrite the cached table blocks in
  *       executor memory each merge (RDD immutability; see
  *       [[trainDistributed]] for the full cost model).
  *     Both engines share the argmax total order (count desc, then
  *     pair lexicographic asc) → training is bit-reproducible at any
  *     parallelism and merge-for-merge identical across the two paths
  *     and the independent reference (all gated in BpeSpec).
  *
  * Symbols use the bracketed-string representation from
  * [[graft.functions.Bpe]] on the distributed path (merges apply as
  * codegen'd literal replaces with canonical left-to-right greedy
  * semantics) and plain code-point lists locally — the same symbol
  * alphabet (one symbol per code point + end-of-word marker).
  */
object BpeTrainer {

  /** One learned merge: rank order, the two joined symbols (marker
    * rendered `</w>` by the query layer, raw here), and the pair's
    * corpus frequency when it won.
    */
  final case class Merge(rank: Int, left: String, right: String,
      freq: Long)

  /** Word-count cap for the local engine — overridable per call (tests
    * force each path with 0). The real driver-heap driver is symbol
    * count, so this is a coarse outer bound refined by
    * [[DefaultMaxLocalSymbols]].
    */
  val DefaultMaxLocalWords = 4_000_000L

  /** Total-symbol cap for the local engine. The local trainer's
    * footprint is per SYMBOL, not per word: each symbol costs one
    * small String (~48 B) + a buffer slot, and each adjacent pair one
    * pairCount entry + one pairWords membership (~200 B amortized,
    * pairs ≈ symbols) — call it ~250 B/symbol worst case. 32M symbols
    * ≈ 8 GB of driver heap, safe on a typical 16 GB driver; 4M
    * average-8-char words ≈ exactly this budget, so the two caps
    * agree on natural-language tables and the symbol cap catches
    * long-word outliers (URLs, DNA strings) the row count misses.
    */
  val DefaultMaxLocalSymbols = 32_000_000L

  /** Train `numMerges` merges over `docs(textCol)`. Stops early when no
    * adjacent pair occurs twice (nothing left to compress).
    *
    * `byteLevel = true` trains over the 256-byte alphabet (TX-BPE3,
    * the GPT-2 byte-fallback model): each word's base symbols are its
    * UTF-8 bytes as uppercase hex pairs ([[Bpe.wrapWordBytes]]), so
    * the learned vocabulary can never leave an input un-encodable —
    * no OOV by construction. Everything else — the two-tier engine,
    * the argmax total order, the signed-delta maintenance — is
    * alphabet-agnostic and shared verbatim.
    */
  def train(docs: DataFrame, numMerges: Int, textCol: String = "text",
      maxLocalWords: Long = DefaultMaxLocalWords,
      maxLocalSymbols: Long = DefaultMaxLocalSymbols,
      byteLevel: Boolean = false): Seq[Merge] = {
    require(numMerges >= 1, "bpeTrain: numMerges must be >= 1")
    val spark = docs.sparkSession
    import spark.implicits._

    val wordFreq = docs
      .select(explode(split(Bpe.sanitize(col(textCol)), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)

    try {
      // tier by BOTH row count and total symbols. Spark's length()
      // counts CODE POINTS (UTF8String.numChars) and octet_length
      // counts UTF-8 BYTES, so each mode's `+ 1` form is the trainers'
      // exact per-word symbol count, marker included
      val symLen =
        if (byteLevel) octet_length(col("w")) else length(col("w"))
      val (nWords, nSyms) = wordFreq
        .agg(count(lit(1)), sum(symLen + lit(1)))
        .as[(Long, Option[Long])].collect().head

      if (nWords <= maxLocalWords && nSyms.getOrElse(0L) <= maxLocalSymbols)
        trainLocal(wordFreq.as[(String, Long)].collect(), numMerges,
          byteLevel)
      else {
        val wrap =
          if (byteLevel) Bpe.wrapWordBytes(col("w"))
          else Bpe.wrapWord(col("w"))
        val words0 = wordFreq
          .select(wrap.as("syms"), col("cnt"))
          .localCheckpoint(true)
        try trainDistributed(words0, numMerges)
        finally graft.functions.CheckpointOps.release(words0)
      }
    } finally
      // training is a bounded operation, not a handle: every block it
      // pinned (word table included) is released before returning
      graft.functions.CheckpointOps.release(wordFreq)
  }

  // ------------------------------------------------------------------
  // Local incremental engine
  // ------------------------------------------------------------------

  /** Classic incremental BPE trainer over a collected word-frequency
    * table. Per merge: O(occurrence-set size), found via a pair→words
    * index; the argmax comes from a max-heap with lazy invalidation
    * (every count change pushes a fresh entry; a popped entry is valid
    * iff it equals the pair's current count). Exactly the reference
    * semantics: greedy left-to-right non-overlapping merge, count-desc
    * then pair-asc tie-break, stop when the best pair's count < 2.
    */
  private[graft] def trainLocal(wordCnt: Array[(String, Long)],
      numMerges: Int, byteLevel: Boolean = false): Seq[Merge] = {
    import scala.collection.mutable
    // one symbol per CODE POINT (surrogate pair = one symbol) — the
    // same alphabet as Bpe.wrapWord's ([\s\S]) and the encode kernel;
    // byte level: one symbol per UTF-8 byte as its uppercase hex pair
    // (Bpe.wrapWordBytes' alphabet)
    val words = new Array[mutable.ArrayBuffer[String]](wordCnt.length)
    val cnts = new Array[Long](wordCnt.length)
    val HexDigits = "0123456789ABCDEF"
    var wi = 0
    while (wi < wordCnt.length) {
      val (w, c) = wordCnt(wi)
      val syms = new mutable.ArrayBuffer[String](w.length + 1)
      if (byteLevel) {
        val bytes = w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        var i = 0
        while (i < bytes.length) {
          val b = bytes(i) & 0xFF
          syms += new String(
            Array(HexDigits.charAt(b >> 4), HexDigits.charAt(b & 0xF)))
          i += 1
        }
      } else {
        var i = 0
        while (i < w.length) {
          if (Character.isHighSurrogate(w.charAt(i)) && i + 1 < w.length &&
              Character.isLowSurrogate(w.charAt(i + 1))) {
            syms += w.substring(i, i + 2); i += 2
          } else { syms += String.valueOf(w.charAt(i)); i += 1 }
        }
      }
      syms += Bpe.W
      words(wi) = syms
      cnts(wi) = c
      wi += 1
    }

    val pairCount = mutable.HashMap.empty[(String, String), Long]
    val pairWords = mutable.HashMap.empty[(String, String),
      mutable.HashSet[Int]]
    def bump(p: (String, String), d: Long): Unit = {
      val nv = pairCount.getOrElse(p, 0L) + d
      if (nv == 0L) pairCount.remove(p) else pairCount(p) = nv
    }
    wi = 0
    while (wi < words.length) {
      val syms = words(wi)
      var i = 0
      while (i < syms.length - 1) {
        val p = (syms(i), syms(i + 1))
        bump(p, cnts(wi))
        pairWords.getOrElseUpdate(p, mutable.HashSet.empty) += wi
        i += 1
      }
      wi += 1
    }

    // max-heap: count desc, then (l, r) asc — dequeue yields the
    // Sennrich argmax under the deterministic total tie-break
    val heapOrd: Ordering[(Long, String, String)] =
      new Ordering[(Long, String, String)] {
        def compare(a: (Long, String, String),
            b: (Long, String, String)): Int = {
          val c = java.lang.Long.compare(a._1, b._1)
          if (c != 0) c
          else {
            val cl = b._2.compareTo(a._2)
            if (cl != 0) cl else b._3.compareTo(a._3)
          }
        }
      }
    val heap = mutable.PriorityQueue.empty[(Long, String, String)](heapOrd)
    for ((p, c) <- pairCount) heap.enqueue((c, p._1, p._2))

    val merges = mutable.ArrayBuffer.empty[Merge]
    val touched = mutable.HashSet.empty[(String, String)]
    while (merges.size < numMerges && heap.nonEmpty) {
      val (c, l, r) = heap.dequeue()
      val p = (l, r)
      if (c >= 2 && pairCount.getOrElse(p, 0L) == c) { // fresh entry
        merges += Merge(merges.size, l, r, c)
        // snapshot: the loop mutates the index sets it reads
        val occ = pairWords.get(p).map(_.toArray).getOrElse(Array.empty)
        touched.clear()
        val oldPairs = mutable.HashSet.empty[(String, String)]
        val newPairs = mutable.HashSet.empty[(String, String)]
        for (idx <- occ) {
          val syms = words(idx)
          val wc = cnts(idx)
          // signed deltas: −old adjacencies, apply merge, +new ones
          oldPairs.clear(); newPairs.clear()
          var i = 0
          while (i < syms.length - 1) {
            val q = (syms(i), syms(i + 1))
            bump(q, -wc); touched += q; oldPairs += q
            i += 1
          }
          // greedy left-to-right non-overlapping merge, in place
          var read = 0
          var write = 0
          while (read < syms.length) {
            if (read < syms.length - 1 && syms(read) == l &&
                syms(read + 1) == r) {
              syms(write) = l + r; read += 2
            } else {
              if (write != read) syms(write) = syms(read)
              read += 1
            }
            write += 1
          }
          syms.dropRightInPlace(syms.length - write)
          i = 0
          while (i < syms.length - 1) {
            val q = (syms(i), syms(i + 1))
            bump(q, wc); touched += q; newPairs += q
            pairWords.getOrElseUpdate(q, mutable.HashSet.empty) += idx
            i += 1
          }
          // keep the occurrence index EXACT: drop memberships the
          // merge dissolved (additions were handled in the + loop)
          for (q <- oldPairs if !newPairs.contains(q))
            pairWords.get(q).foreach(_ -= idx)
        }
        pairWords.remove(p)
        // push fresh entries for every pair whose count changed
        for (q <- touched) {
          val nc = pairCount.getOrElse(q, 0L)
          if (nc >= 2) heap.enqueue((nc, q._1, q._2))
        }
      } else if (c < 2) {
        // heap is count-descending: nothing >= 2 remains — exhausted
        heap.clear()
      } // else: stale entry, skip
    }
    merges.toSeq
  }

  // ------------------------------------------------------------------
  // Distributed incremental engine
  // ------------------------------------------------------------------

  /** Adjacent-pair (l, r, c) counts of a wrapped-symbol table — the
    * zip_with-on-shifted-slices explode, all codegen'd built-ins.
    * `sign` scales counts (−1 emits retraction deltas).
    */
  private def pairsOf(syms: Column, cnt: Column, sign: Int): Column = {
    val t = split(trim(syms, Bpe.B), Bpe.B + Bpe.B)
    explode(zip_with(
      slice(t, lit(1), size(t) - 1),
      slice(t, lit(2), size(t) - 1),
      (l, r) => struct(l.as("l"), r.as("r"), (cnt * sign).as("c"))))
  }

  /** IVM-style trainer for word tables too large to collect. The pair
    * table lives as a hash-partitioned, persisted `RDD[((l, r), c)]`
    * whose partitioner NEVER changes, so the per-merge fold is a
    * same-partitioner `zipPartitions` — narrow on the table side. Per
    * merge the costs are, in order:
    *   1. argmax: one in-memory scan of the cached pair table (no
    *      shuffle, no sort — `takeOrdered(1)`);
    *   2. delta: ONLY the words containing the winning pair (narrow
    *      `contains` filter on the bracketed form — the pattern
    *      ␁l␁␁r␁ matches exactly the words with the adjacency) emit
    *      −before/+after pair deltas; the ONLY per-merge shuffle is
    *      `reduceByKey` over this delta, proportional to the winning
    *      pair's occurrence set, which shrinks as training proceeds;
    *   3. fold: the co-partitioned zipPartitions rewrites the cached
    *      pair table in executor memory — no network on the table
    *      side, but it IS a full pass over the cached blocks (RDDs
    *      are immutable; a true in-place O(delta) update would need a
    *      mutable distributed map Spark doesn't have). At 10⁸ pairs ×
    *      ~30 B this is memory-bandwidth-bound, far below shuffle
    *      cost.
    * Lineage is truncated every merge via `localCheckpoint` (backed by
    * the already-persisted blocks — no extra write), and each
    * superseded table/word checkpoint is explicitly unpersisted once
    * its successor materializes, so storage memory stays O(1) in merge
    * count instead of accumulating until the ContextCleaner notices.
    */
  private[graft] def trainDistributed(words0: DataFrame,
      numMerges: Int): Seq[Merge] = {
    val spark = words0.sparkSession
    import spark.implicits._
    val part = new org.apache.spark.HashPartitioner(
      spark.conf.get("spark.sql.shuffle.partitions", "32").toInt)

    // argmax total order: count desc, then (l, r) lexicographic asc —
    // expressed so the WINNER is this ordering's MINIMUM (takeOrdered)
    val argmaxOrd: Ordering[((String, String), Long)] =
      new Ordering[((String, String), Long)] {
        def compare(a: ((String, String), Long),
            b: ((String, String), Long)): Int = {
          val c = java.lang.Long.compare(b._2, a._2) // count desc
          if (c != 0) c
          else {
            val cl = a._1._1.compareTo(b._1._1)
            if (cl != 0) cl else a._1._2.compareTo(b._1._2)
          }
        }
      }

    def materialize(
        rdd: org.apache.spark.rdd.RDD[((String, String), Long)])
        : org.apache.spark.rdd.RDD[((String, String), Long)] = {
      rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      rdd.localCheckpoint() // truncate lineage using the cached blocks
      rdd.count()
      rdd
    }

    var cur = words0
    // words0's own checkpoint blocks belong to train(); only the
    // checkpoints THIS loop creates are eligible for unpersist
    var curCkptRdds = Seq.empty[org.apache.spark.rdd.RDD[_]]
    var pairs = materialize(cur
      .select(pairsOf(col("syms"), col("cnt"), 1).as("p"))
      .select(col("p.l"), col("p.r"), col("p.c"))
      .as[(String, String, Long)]
      .rdd.map { case (l, r, c) => ((l, r), c) }
      .reduceByKey(part, _ + _))

    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var sinceCkpt = 0
    var exhausted = false
    try {
    while (merges.size < numMerges && !exhausted) {
      val top = pairs.filter(_._2 >= 2).takeOrdered(1)(argmaxOrd)
      top.headOption match {
        case None => exhausted = true
        case Some(((l, r), c)) =>
          merges += Merge(merges.size, l, r, c)
          val pat = Bpe.B + l + Bpe.B + Bpe.B + r + Bpe.B
          val hits = cur.filter(col("syms").contains(pat))
          val mergedSyms =
            Bpe.applyMerges(col("syms"), Seq((l, r))).as("syms")
          val delta = hits
            .select(pairsOf(col("syms"), col("cnt"), -1).as("p"))
            .unionAll(hits.select(mergedSyms, col("cnt"))
              .select(pairsOf(col("syms"), col("cnt"), 1).as("p")))
            .select(col("p.l"), col("p.r"), col("p.c"))
            .as[(String, String, Long)]
            .rdd.map { case (dl, dr, dc) => ((dl, dr), dc) }
            .reduceByKey(part, _ + _) // the only shuffle: delta-sized
          val folded = pairs.zipPartitions(delta,
              preservesPartitioning = true) { (ti, di) =>
            val m = new java.util.HashMap[(String, String), Long]()
            ti.foreach { case (k, v) => m.put(k, v) }
            di.foreach { case (k, v) =>
              val nv = m.getOrDefault(k, 0L) + v
              if (nv == 0L) m.remove(k) else m.put(k, nv)
            }
            import scala.jdk.CollectionConverters._
            m.entrySet().iterator().asScala
              .map(e => (e.getKey, e.getValue))
          }
          materialize(folded)
          pairs.unpersist(blocking = false)
          pairs = folded
          cur = cur.withColumn("syms", mergedSyms)
          sinceCkpt += 1
          if (sinceCkpt >= 8) { // truncate the replace-chain lineage
            cur = cur.localCheckpoint(true) // eager: materialized here
            val prev = curCkptRdds
            curCkptRdds = graft.functions.CheckpointOps.rdds(cur)
            prev.foreach(_.unpersist(blocking = false))
            sinceCkpt = 0
          }
      }
    }
    merges.toSeq
    } finally {
      // normal AND exception exits release every block this loop
      // pinned (`pairs`/`curCkptRdds` always reference the newest
      // generation; older ones were released as they were superseded)
      curCkptRdds.foreach(_.unpersist(blocking = false))
      pairs.unpersist(blocking = false)
    }
  }

  /** Train and return the merge table as a DataFrame (marker rendered
    * `</w>`), ordered by rank — the `tx_bpe_train` query surface.
    * `byteLevel` trains the 256-byte alphabet (symbols are hex pairs).
    */
  def trainDf(spark: SparkSession, docs: DataFrame,
      numMerges: Int, byteLevel: Boolean = false): DataFrame = {
    import spark.implicits._
    train(docs, numMerges, byteLevel = byteLevel)
      .map(m => (m.rank,
        m.left.replace(Bpe.W, "</w>"),
        m.right.replace(Bpe.W, "</w>"),
        (m.left + m.right).replace(Bpe.W, "</w>"),
        m.freq))
      .toDF("rank", "left", "right", "merged", "freq")
      .orderBy(col("rank").asc)
  }
}

package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Near-duplicate detection primitives (north-star dedup family):
  * MinHash+LSH banding, SimHash, n-gram Jaccard. All signature math is
  * built-in higher-order functions over token arrays (codegen'd, no
  * UDFs); candidate generation is an equi-join on (band, signature) —
  * the only shuffle, keyed well for 100 TB (no cross join anywhere).
  */
object DedupOps {

  /** Distinct word-bigram shingles of a text column. */
  def shingles(text: Column): Column =
    array_distinct(TextFunctions.bigrams(text))

  /** MinHash signature as a per-row Column: k independent 64-bit hash
    * slots, each the min over all shingles of xxhash64(seed_i,
    * shingle). Fine for bounded shingle counts; the aggregation form
    * below is the scale path (partial-aggregatable, codegen'd).
    */
  def minhashSignature(sh: Column, k: Int): Column =
    array((0 until k).map { i =>
      array_min(transform(sh, s => xxhash64(lit(i), s)))
    }: _*)

  /** MinHash signatures via explode + hash-aggregate: each shingle is
    * hashed once per seed inside a partial+final min aggregate — one
    * shuffle of k longs per doc, no repeated array passes. Returns
    * (id, sig ARRAY<BIGINT>[k]).
    */
  def minhashSignaturesAgg(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val exploded = docs.select(col(idCol).as("id"),
      explode(shingles(col(textCol))).as("s"))
    val mins = (0 until k).map(i => min(xxhash64(lit(i), col("s"))).as(s"m$i"))
    exploded.groupBy(col("id"))
      .agg(mins.head, mins.tail: _*)
      .select(col("id"), array((0 until k).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** LSH band keys: split the k-slot signature into bands of
    * `rowsPerBand`, hash each band to one 64-bit bucket key. Docs
    * sharing any band key become candidate pairs.
    */
  def bandKeys(sig: Column, k: Int, rowsPerBand: Int): Column = {
    val bands = k / rowsPerBand
    array((0 until bands).map { b =>
      struct(
        lit(b).as("band"),
        xxhash64(slice(sig, b * rowsPerBand + 1, rowsPerBand)).as("key"))
    }: _*)
  }

  /** Candidate pairs (idA < idB) from LSH banding over a
    * (id, text) DataFrame. One explode + one self-equi-join on the
    * band key; duplicates across bands collapsed by distinct.
    */
  def lshCandidates(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    val sig = minhashSignaturesAgg(docs, idCol, textCol, k)
    val banded = sig.select(col("id"),
      explode(bandKeys(col("sig"), k, rowsPerBand)).as("bk"))
    val a = banded.select(col("id").as("id_a"), col("bk"))
    val b = banded.select(col("id").as("id_b"), col("bk"))
    a.join(b, Seq("bk"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Exact bigram-Jaccard similarity of two shingle arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** SimHash-64: sign-aggregated bit counts of token hashes. For each
    * of 64 bit positions, sum ±1 over tokens by that bit of
    * xxhash64(token); the sign forms the fingerprint bit. Built as a
    * sequential fold — one pass over tokens per row.
    */
  /** SimHash-64 via explode + hash-aggregate (the scale path): each
    * token hashed once, bits extracted with literal shifts (codegen'd
    * long math, no strings), 64 ±1 counters as a partial+final
    * aggregate, fingerprint assembled from counter signs. Returns
    * (id, simhash BIGINT).
    */
  def simhashAgg(docs: DataFrame, idCol: String, tokensCol: Column): DataFrame = {
    val exploded = docs
      .select(col(idCol).as("id"), explode(tokensCol).as("t"))
      .select(col("id"), xxhash64(col("t")).as("h"))
    val counters = (0 until 64).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(lit(1L)) === 1L, 1L)
        .otherwise(-1L)).as(s"c$i")
    }
    val fingerprint = (0 until 64).map { i =>
      when(col(s"c$i") > 0,
        lit(if (i == 63) Long.MinValue else 1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    exploded.groupBy(col("id"))
      .agg(counters.head, counters.tail: _*)
      .select(col("id"), fingerprint.cast(LongType).as("simhash"))
  }

  def simhash64(tokensCol: Column): Column = {
    // counters[k] accumulates ±1 for bit k of each token's hash; bit k
    // of a long is character (64-k) of its 64-char two's-complement
    // bin() string (shift amounts can't be Columns, strings can).
    val counters = aggregate(
      tokensCol,
      array_repeat(lit(0L), 64),
      (acc, t) => {
        val bits = lpad(bin(xxhash64(t)), 64, "0")
        zip_with(acc, sequence(lit(64), lit(1), lit(-1)),
          (c, pos) => c + when(bits.substr(pos, lit(1)) === "1", 1L).otherwise(-1L))
      })
    // set bit k where counters[k] > 0; each power appears once so plain
    // addition assembles the fingerprint (incl. the sign bit).
    val powers = array((0 until 64).map(i =>
      lit(if (i == 63) Long.MinValue else 1L << i)): _*)
    aggregate(
      zip_with(counters, powers, (c, p) => when(c > 0, p).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Exact content dedup: first row per fingerprint (L6 content-hash
    * form). Keyed row_number — one shuffle on the fingerprint.
    */
  def dedupByFingerprint(df: DataFrame, fpCol: Column, orderCol: String): DataFrame = {
    val w = Window.partitionBy(fpCol).orderBy(col(orderCol).asc)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }

  /** The `hashes` bloom bit positions of a fingerprint column —
    * xxhash64 re-seeded per slot, pmod'd into the bit space. Shared by
    * the build side (set bits) and the probe side (test bits) so the
    * two can never disagree.
    */
  private def bloomPositions(fp: Column, bits: Int, hashes: Int): Seq[Column] =
    (0 until hashes).map(i => pmod(xxhash64(lit(i), fp), lit(bits.toLong)))

  /** Build a bloom filter over a fingerprint column as packed longs.
    * One pass: explode the k positions, OR-fold per-partition bitsets
    * in a partial+final typed Aggregator (O(bits/64) longs of state
    * per partition; the only shuffle is the single 1-group final
    * merge). The words array is the broadcastable corpus summary an
    * incremental-ingest pipeline persists once per corpus version and
    * reuses for every arriving batch — at 100 TB the filter is built
    * beside the corpus (or sharded by fingerprint prefix) instead of
    * re-shuffling corpus fingerprints per ingest.
    */
  def bloomWords(df: DataFrame, fp: Column, bits: Int, hashes: Int): Array[Long] = {
    require(bits % 64 == 0, s"bits must pack into longs, got $bits")
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    val agg = new org.apache.spark.sql.expressions.Aggregator[
        java.lang.Long, Array[Long], Array[Long]] {
      override def zero: Array[Long] = new Array[Long](bits / 64)
      override def reduce(b: Array[Long], p: java.lang.Long): Array[Long] = {
        if (p != null) { val i = p.intValue; b(i >> 6) |= (1L << (i & 63)) }
        b
      }
      override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
        var i = 0
        while (i < x.length) { x(i) |= y(i); i += 1 }
        x
      }
      override def finish(b: Array[Long]): Array[Long] = b
      override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
        ExpressionEncoder[Array[Long]]()
      override def outputEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
        ExpressionEncoder[Array[Long]]()
    }
    df.select(explode(array(bloomPositions(fp, bits, hashes): _*)).as("p"))
      .agg(udaf(agg, ExpressionEncoder[java.lang.Long]())(col("p")).as("w"))
      .head().getSeq[Long](0).toArray // bounded: bits/64 longs
  }

  /** Membership-test column against a built bloom: true iff every one
    * of the fingerprint's k bits is set. No false negatives — a row
    * testing false is DEFINITELY absent from the build set — so a
    * bloom-pruned exact dedup stays exact: rows testing true go
    * through the confirming anti-join, rows testing false skip it.
    * Pure built-ins (element_at + variable shiftright), codegen'd; the
    * words literal is the plan-embedded stand-in for a broadcast.
    */
  def maybeInBloom(words: Array[Long], bits: Int, hashes: Int, fp: Column): Column = {
    val wordsLit = typedLit(words.toSeq)
    bloomPositions(fp, bits, hashes).map { p =>
      val word = element_at(wordsLit, shiftright(p, 6).cast("int") + 1)
      val bit = p.bitwiseAND(lit(63L)).cast("int")
      call_function("shiftright", word, bit).bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }

  /** Connected components over a near-dup pair graph — the step that
    * turns pairwise candidates (LSH / jaccard / cosine) into dedup
    * CLUSTERS with one canonical survivor each (min id). Iterative
    * min-label propagation: each round every node takes the min of its
    * own label and its neighbors' labels; converges in O(diameter)
    * rounds — near-dup graphs are shallow (dup groups are small
    * cliques), so this is 2–4 hash-join rounds in practice. Each round
    * is shuffle-on-node-id; each iteration's labels are
    * `localCheckpoint`ed, which BOTH materializes them AND truncates
    * the logical plan — without lineage truncation an iterative
    * DataFrame loop nests every prior round's plan inside the next
    * (the plan tree grows exponentially and the driver, not the
    * executors, becomes the bottleneck). Fixpoint exit by changed
    * count (the standard distributed-CC pattern, e.g. GraphFrames).
    * `pairs` carries (aCol, bCol) edges.
    *
    * The returned frame is SELF-CONTAINED: one localCheckpoint, all
    * working tables already released. It stays pinned until the caller
    * runs `CheckpointOps.release` on it — do so once consumed in a
    * long-lived session (same contract as [[connectedComponentsStar]]
    * and [[GraphOps.pageRank]]).
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 20): DataFrame = {
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .localCheckpoint(true) // materialize once, shallow plan
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint(true)
    var converged = false
    var returned = false
    // the round's freshly materialized checkpoint, tracked from the
    // instant it exists so a failure between checkpoint and adoption
    // (e.g. the convergence count throwing) can't orphan its blocks
    var inFlight: DataFrame = null
    try {
    var i = 0
    while (!converged && i < maxIter) {
      val nbrMin = edges
        .join(labels.withColumnRenamed("node", "dst")
          .withColumnRenamed("label", "nbr_label"), Seq("dst"))
        .groupBy(col("src").as("node"))
        .agg(min(col("nbr_label")).as("nbr_min"))
      // carry the old label through the update so the convergence
      // probe is a narrow filter over the SAME materialized result —
      // one join per round, not a second labels⋈next join
      val updated = labels.join(nbrMin, Seq("node"), "left")
        .select(col("node"), col("label").as("old"),
          least(col("label"), coalesce(col("nbr_min"), col("label"))).as("label"))
        .localCheckpoint(true) // O(diameter) materializations, flat lineage
      inFlight = updated
      val changed = updated.filter(col("label") =!= col("old")).count()
      // RDD-level release — Dataset.unpersist() is a no-op on a
      // checkpointed frame (CheckpointOps); superseded rounds must
      // free their blocks now, not at context-cleaner whim
      CheckpointOps.release(labels)
      labels = updated.drop("old")
      inFlight = null
      converged = changed == 0
      i += 1
    }
    // A cap exit means labels are only partially propagated — silently
    // returning them would hand back WRONG clusters for any chain longer
    // than maxIter hops. Fail loudly; callers with deep graphs raise
    // maxIter (rounds needed = graph diameter).
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge within $maxIter iterations; " +
          "graph diameter exceeds maxIter — raise maxIter")
    returned = true
    labels.withColumnRenamed("label", "cluster_id")
    } finally {
      // exception paths (incl. the documented non-convergence throw,
      // whose advice is "raise maxIter and retry") must not pin the
      // edge table across retries; the final labels checkpoint is
      // self-contained, so edges goes on success too
      CheckpointOps.release(edges)
      if (!returned) {
        CheckpointOps.release(labels)
        if (inFlight ne null) CheckpointOps.release(inFlight)
      }
    }
  }

  /** Connected components via alternating large-star / small-star
    * contraction (Kiveris et al., "Connected Components in MapReduce
    * and Beyond", SoCC 2014) — same API and output as
    * [[connectedComponents]], different convergence profile: the edge
    * set CONTRACTS toward stars each round, so rounds needed grow
    * logarithmically with diameter instead of linearly, and a hub node's
    * fan-out is re-pointed at the component minimum instead of
    * re-joined every round. This is the skew-hardened scale path for a
    * boilerplate-heavy corpus where one giant dup component (diameter
    * in the hundreds, one hub with millions of edges) makes plain
    * label propagation iterate — and shuffle the hub's whole
    * neighborhood — hundreds of times.
    *
    * Each round is two keyed aggregations over the CURRENT edge set
    * (which only shrinks toward n−1 star edges):
    *
    *  - large-star: every node u attaches its LARGER neighbors to
    *    m = min(Γ(u) ∪ u) — hub fan-out drops to the minimum in one
    *    step, and edges (v, m) never grow the set beyond Γ;
    *  - small-star: every node re-points its smaller neighbors (and
    *    itself) at its minimum — canonical (big, small) orientation is
    *    preserved, so the next round's aggregations stay keyed.
    *
    * Fixpoint when a full round leaves the edge set unchanged — at
    * that point every edge is (node, component-min), i.e. the label
    * assignment itself. Same localCheckpoint lineage truncation and
    * same throw-at-cap contract as the label-propagation form, and the
    * same result contract: the returned frame is one self-contained
    * checkpoint (nodes/edges released on success) that the caller
    * should `CheckpointOps.release` once consumed.
    */
  def connectedComponentsStar(pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 30): DataFrame = {
    val nodes = pairs.select(col(aCol).as("n"))
      .unionByName(pairs.select(col(bCol).as("n")))
      .distinct()
      .localCheckpoint(true)
    // canonical orientation: u = larger endpoint, v = smaller; drop
    // self-loops (isolated nodes re-join as singletons at the end)
    var edges = pairs
      .select(greatest(col(aCol), col(bCol)).as("u"),
        least(col(aCol), col(bCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true)
    var converged = edges.isEmpty
    var returned = false
    // in-flight round checkpoint, tracked so a failure in the fixpoint
    // probe can't orphan the freshly materialized edge set
    var inFlight: DataFrame = null
    try {
    var i = 0
    while (!converged && i < maxIter) {
      // large-star: m(u) = min over Γ(u) ∪ {u}; attach larger nbrs to m
      val nbrs = edges.select(col("u"), col("v"))
        .unionByName(edges.select(col("v").as("u"), col("u").as("v")))
      val mins = nbrs.groupBy(col("u"))
        .agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      val afterLarge = nbrs.join(mins, Seq("u"))
        .filter(col("v") > col("u")) // larger nbrs only; (v, m) stays canonical
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
      // small-star: re-point each node's smaller nbrs (and itself) at
      // its minimum; edges are canonical so Γ⁻(u) is exactly group u
      val smallMin = afterLarge.groupBy(col("u")).agg(min(col("v")).as("m"))
      val next = afterLarge.join(smallMin, Seq("u"))
        .filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .unionByName(smallMin.select(col("u"), col("m").as("v")))
        .distinct()
        .localCheckpoint(true)
      inFlight = next
      // fixpoint: both sets are distinct + canonical, so equality is
      // count match + empty difference (two cheap keyed jobs)
      converged = next.count() == edges.count() &&
        next.except(edges).isEmpty
      CheckpointOps.release(edges) // RDD-level; Dataset.unpersist no-ops
      edges = next
      inFlight = null
      i += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponentsStar did not converge within $maxIter rounds; " +
          "raise maxIter (rounds grow ~logarithmically with diameter)")
    // stars: every edge is (node, component-min); minima label themselves,
    // and input singletons (self-pair-only nodes) label themselves too.
    // Materialize the result so it is SELF-CONTAINED (one checkpoint,
    // like connectedComponents' labels) and nodes+edges release here on
    // success instead of staying pinned for the caller's lifetime.
    val labels = edges.select(col("u").as("node"), col("v").as("cluster_id"))
    val out = nodes.join(labels, col("n") === col("node"), "left")
      .select(col("n").as("node"),
        coalesce(col("cluster_id"), col("n")).as("cluster_id"))
      .localCheckpoint(true)
    returned = true
    out
    } finally {
      // error paths additionally release the working tables so the
      // documented raise-maxIter retry does not accumulate storage
      CheckpointOps.release(nodes)
      CheckpointOps.release(edges)
      if (!returned && (inFlight ne null)) CheckpointOps.release(inFlight)
    }
  }
}

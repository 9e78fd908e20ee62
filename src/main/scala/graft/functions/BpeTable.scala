package graft.functions

/** Pre-resolved merge table for the fused BPE kernels: the flat
  * [l0, r0, l1, r1, …] rank-ordered merge list plus (for large tables)
  * a pair-to-rank hash index driving the priority-queue encode path.
  *
  * Two encode strategies, proven byte-identical in BpeSpec:
  *
  *  - CHAIN (small tables): apply each merge in rank order as one
  *    greedy left-to-right non-overlapping pass — the exact shape the
  *    DuckDB oracle replays as a `replace` chain. O(merges × word len)
  *    per word: optimal for the 12–16-merge demo tables, quadratic-ish
  *    for a production 32k–64k-merge vocabulary.
  *  - PQ (large tables): repeatedly merge the lowest-rank pair present
  *    (ties broken leftmost), O(len · log len) per word INDEPENDENT of
  *    merge-table size — the standard fast BPE encode. Equivalent to
  *    the chain for any WELL-FORMED rank range (products pairwise
  *    distinct, each side a base symbol or the product of a strictly
  *    earlier merge): a rank-k merge can only create pairs involving
  *    its new symbol, whose merges all rank > k, so after ranks < k
  *    are exhausted none ever reappear; within one rank the position
  *    tie-break IS the left-to-right scan.
  *
  * [[BpeTable.apply]] splits the table at the longest well-formed
  * PREFIX (computed at build time, never assumed): the prefix runs the
  * PQ, the (almost always empty) suffix past the first violation runs
  * the chain on the PQ's output. Equivalence is compositional —
  * `chain(all) = chain(prefix) ∘ chain(suffix)` because the chain is
  * sequential, and `PQ(prefix) ≡ chain(prefix)` by the well-formedness
  * theorem — so one duplicate product in a 64k-merge trained table
  * costs one extra chain pass, not the whole O(merges·len) cliff.
  * The threshold keeps tiny tables (or tables whose well-formed prefix
  * is tiny) on the zero-allocation chain scan; tests force either
  * strategy via the two-argument constructor (full-table PQ).
  */
final class BpeTable(val flat: Array[String], val usePq: Boolean,
    val pqMerges: Int) extends Serializable {
  require(flat.length % 2 == 0, "bpe merge table: odd flat length")
  require(pqMerges >= 0 && pqMerges <= flat.length / 2,
    "bpe merge table: pq prefix out of range")

  /** Test/forcing constructor: the chosen strategy covers the WHOLE
    * table (no suffix split).
    */
  def this(flat: Array[String], usePq: Boolean) =
    this(flat, usePq, flat.length / 2)

  def numMerges: Int = flat.length / 2

  /** pair → rank over the PQ-eligible prefix ONLY, keyed `l + " " + r`
    * (words are space-split, so no symbol ever contains a space).
    * Rebuilt lazily per JVM.
    */
  @transient lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](pqMerges * 2)
    var i = 0
    while (i < pqMerges * 2) {
      // first occurrence wins: ranks are priorities, duplicates inert
      m.putIfAbsent(flat(i) + " " + flat(i + 1), Integer.valueOf(i >> 1))
      i += 2
    }
    m
  }

  /** Merges past the well-formed prefix — chain-applied after the PQ.
    * Empty for well-formed (i.e. every trained-in-practice) table.
    */
  @transient lazy val suffixFlat: Array[String] = flat.drop(pqMerges * 2)
}

object BpeTable {
  /** Below this many merges the chain scan beats heap setup per word. */
  val PqThreshold = 32

  /** Splits at the longest well-formed prefix (see [[wellFormedPrefix]]):
    * PQ for the prefix when it clears the threshold, chain for the
    * rest. An arbitrary user merge list via `graft_bpe_encode` whose
    * prefix is short simply runs the whole chain — the documented
    * canonical semantics either way.
    */
  def apply(flat: Array[String]): BpeTable = {
    val nm = flat.length / 2
    val prefix = wellFormedPrefix(flat)
    val usePq = prefix >= PqThreshold
    if (nm - prefix >= PqThreshold)
      // what hurts is a large chain-scanned SUFFIX, wherever the first
      // violation falls: an early violation in a 64k-merge table still
      // chain-scans ~64k merges per word even though the prefix ran
      // the PQ — worth a visible warning either way
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"BPE merge table ($nm merges) is well-formed only through " +
          s"merge $prefix; the remaining ${nm - prefix} merges " +
          "chain-scan per word (correct but O(suffix merges)) — " +
          "retrain or repair the table to restore the O(log len) path")
    new BpeTable(flat, usePq, if (usePq) prefix else nm)
  }

  /** Whole-table well-formedness (every product distinct, every side a
    * base symbol or earlier product) — the condition under which the
    * PQ alone reproduces the chain.
    */
  private[graft] def wellFormed(flat: Array[String]): Boolean =
    flat.length % 2 == 0 && wellFormedPrefix(flat) == flat.length / 2

  /** Number of leading merges forming a well-formed prefix: every
    * product `l + r` pairwise distinct so far, and each side a base
    * symbol (exactly one code point — covers the end-of-word marker)
    * or the product of a STRICTLY EARLIER merge. Within such a prefix
    * a rank-k merge can only create pairs whose merges rank > k (its
    * product is new and no later in-prefix product collides), so once
    * the chain's rank-<k passes have run, no pair of rank < k ever
    * reappears — the gap case (two merges sharing a product string,
    * the later one recreating a lower-rank pair the chain leaves
    * unmerged) is pushed past the split point. Trained tables always
    * satisfy the earlier-product-sides half (a winning pair's sides
    * exist at selection time) but CAN duplicate a product (e.g.
    * (a,bc)→abc and later (ab,c)→abc when different words segment abc
    * differently) — hence a build-time computation, not an assumption.
    */
  private[graft] def wellFormedPrefix(flat: Array[String]): Int = {
    val products = new java.util.HashSet[String](flat.length)
    def ok(s: String): Boolean =
      (s.nonEmpty && s.codePointCount(0, s.length) == 1) ||
        products.contains(s)
    var i = 0
    while (i + 1 < flat.length) {
      if (!ok(flat(i)) || !ok(flat(i + 1))) return i >> 1
      if (!products.add(flat(i) + flat(i + 1))) return i >> 1
      i += 2
    }
    i >> 1
  }
}

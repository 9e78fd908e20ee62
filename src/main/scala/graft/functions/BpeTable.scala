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
  *    the chain for any WELL-FORMED table (products pairwise distinct,
  *    each side a base symbol or the product of a strictly earlier
  *    merge — checked at runtime by [[BpeTable.wellFormed]] before the
  *    PQ path is ever picked; never assumed):
  *    a rank-k merge can only create pairs involving its new symbol,
  *    whose merges all rank > k, so after ranks < k are exhausted none
  *    ever reappear; within one rank the position tie-break IS the
  *    left-to-right scan.
  *
  * The threshold keeps tiny tables on the zero-allocation chain scan;
  * [[BpeTable.apply]] picks, tests force either via the constructor.
  */
final class BpeTable(val flat: Array[String], val usePq: Boolean)
    extends Serializable {
  require(flat.length % 2 == 0, "bpe merge table: odd flat length")

  def numMerges: Int = flat.length / 2

  /** pair → rank, keyed `l + " " + r` (words are space-split, so no
    * symbol ever contains a space). Rebuilt lazily per JVM.
    */
  @transient lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](flat.length)
    var i = 0
    while (i < flat.length) {
      // first occurrence wins: ranks are priorities, duplicates inert
      m.putIfAbsent(flat(i) + " " + flat(i + 1), Integer.valueOf(i >> 1))
      i += 2
    }
    m
  }
}

object BpeTable {
  /** Below this many merges the chain scan beats heap setup per word. */
  val PqThreshold = 32

  /** The PQ path is only provably chain-equivalent for WELL-FORMED
    * tables (see [[wellFormed]]); anything else — e.g. an arbitrary
    * user merge list passed to `graft_bpe_encode` — stays on the chain
    * scan, which IS the documented canonical semantics.
    */
  def apply(flat: Array[String]): BpeTable = {
    val big = flat.length >= PqThreshold * 2
    val wf = big && wellFormed(flat)
    if (big && !wf)
      // a large table losing the O(len·log len) path is a real perf
      // cliff (the chain is O(merges·len) per word) — say so once
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"BPE merge table (${flat.length / 2} merges) is not " +
          "well-formed (duplicate product or orphan side); encoding " +
          "falls back to the rank-order chain scan — correct but " +
          "O(merges) per word instead of O(log len)")
    new BpeTable(flat, wf)
  }

  /** Sufficient condition for PQ ≡ chain: every product `l + r` is
    * pairwise distinct, and each side is a base symbol (exactly one
    * code point — covers the end-of-word marker) or the product of a
    * STRICTLY EARLIER merge. Under it, a rank-k merge can only create
    * pairs whose merges rank > k (its product is new and no later
    * product collides), so once the chain's rank-<k passes have run,
    * no pair of rank < k ever reappears — the gap case (two merges
    * sharing a product string, the later one recreating a lower-rank
    * pair the chain leaves unmerged) is excluded. Trained tables
    * always satisfy the earlier-product-sides half (a winning pair's
    * sides exist at selection time) but CAN duplicate a product (e.g.
    * (a,bc)→abc and later (ab,c)→abc when different words segment abc
    * differently) — hence a runtime check, not an assumption; the
    * rare duplicate-product table just runs the chain.
    */
  private[graft] def wellFormed(flat: Array[String]): Boolean = {
    if (flat.length % 2 != 0) return false // constructor require reports it
    val products = new java.util.HashSet[String](flat.length)
    def ok(s: String): Boolean =
      (s.nonEmpty && s.codePointCount(0, s.length) == 1) ||
        products.contains(s)
    var i = 0
    while (i < flat.length) {
      if (!ok(flat(i)) || !ok(flat(i + 1))) return false
      if (!products.add(flat(i) + flat(i + 1))) return false
      i += 2
    }
    true
  }
}

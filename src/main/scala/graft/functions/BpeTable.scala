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
  *    the chain for any WELL-FORMED table (each merge's sides are base
  *    symbols or products of strictly earlier merges — true of every
  *    trained table by construction): a rank-k merge can only create
  *    pairs involving its new symbol, whose merges all rank > k, so
  *    after ranks < k are exhausted none ever reappear; within one
  *    rank the position tie-break IS the left-to-right scan.
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

  def apply(flat: Array[String]): BpeTable =
    new BpeTable(flat, flat.length >= PqThreshold * 2)
}

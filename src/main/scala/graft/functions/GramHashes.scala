package graft.functions

import java.security.MessageDigest

/** md5-derived 60-bit hashes for k-token grams — the cross-engine
  * fingerprint primitive shared by winnowing (`tx_winnow`) and span
  * dedup (`d10_span_dedup`): hash p equals
  * `conv(substring(md5(concat_ws(' ', tokens p..p+k-1)), 1, 15), 16, 10)`
  * in Spark SQL and
  * `CAST(('0x' || substr(md5(array_to_string(...)), 1, 15)) AS BIGINT)`
  * in DuckDB, bit for bit (MessageDigest MD5 over the same UTF-8
  * bytes).
  *
  * Single-space tokenization makes gram p..p+k-1 a CONTIGUOUS byte
  * slice of the original string (0x20 never occurs inside a UTF-8
  * multibyte sequence — the WordBigrams trick), so hashing is one
  * digest over a range: no token array, no per-gram string building.
  *
  * 60 bits is collision-safe at validation scales (~2e-5 expected
  * collisions at 10M grams); a 100 TB corpus (~1e12 grams) would
  * widen the fingerprint to the full 128-bit digest (two longs) —
  * the aggregation shapes are unchanged.
  */
object GramHashes {

  def newDigest(): MessageDigest = MessageDigest.getInstance("MD5")

  /** All k-gram hashes of `text`, in position order; empty when the
    * text has fewer than k tokens. `md` is reused across calls
    * (digest() resets it).
    */
  /** First 15 hex chars (60 bits) of an md5 digest as a long. */
  private def fold60(d: Array[Byte]): Long = {
    var v = 0L
    var j = 0
    while (j < 7) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
    (v << 4) | ((d(7) & 0xf0L) >> 4)
  }

  def hashes(md: MessageDigest, text: String, k: Int): Array[Long] = {
    val b = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var nSp = 0
    var i = 0
    while (i < b.length) { if (b(i) == 0x20) nSp += 1; i += 1 }
    val nTok = nSp + 1
    val nGrams = nTok - k + 1
    if (nGrams <= 0) return Array.emptyLongArray
    val sp = new Array[Int](nSp)
    var c = 0; i = 0
    while (i < b.length) { if (b(i) == 0x20) { sp(c) = i; c += 1 }; i += 1 }
    def tokStart(t: Int): Int = if (t == 0) 0 else sp(t - 1) + 1
    def tokEnd(t: Int): Int = if (t == nSp) b.length else sp(t)
    val h = new Array[Long](nGrams)
    var p = 0
    while (p < nGrams) {
      val off = tokStart(p)
      md.update(b, off, tokEnd(p + k - 1) - off)
      h(p) = fold60(md.digest()) // first 15 hex chars = 60 bits
      p += 1
    }
    h
  }

  /** The FIRST k-gram's hash only — one digest over the prefix byte
    * slice, no per-gram array: the anchor-side kernel of d17's
    * containment join (the full-document `hashes` pass there would
    * double the corpus MD5 work just to keep element 0). None when
    * the text has fewer than k tokens. Bit-identical to
    * `hashes(md, text, k)(0)` (same byte range, same fold).
    */
  def firstGramHash(md: MessageDigest, text: String, k: Int): Option[Long] = {
    val b = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    var seen = 0
    var end = -1
    while (i < b.length && end < 0) {
      if (b(i) == 0x20) { seen += 1; if (seen == k) end = i }
      i += 1
    }
    // end = the k-th space (gram spans tokens 0..k-1, ending before
    // it); a text of EXACTLY k tokens has k-1 spaces and ends at EOS
    val stop = if (end >= 0) end else if (seen == k - 1) b.length else -1
    if (stop < 0) None
    else {
      md.update(b, 0, stop)
      Some(fold60(md.digest()))
    }
  }

  /** Per-document DISTINCT k-gram hashes as (id, hash) rows — the
    * inverted-index build kernel shared by the contamination scan
    * (d7) and the containment join (d17): sort + skip-equal beats
    * hashing gram STRINGS into a set. The hashing happens eagerly at
    * call time, so one reusable `md` per partition is safe under
    * `Iterator.flatMap`'s interleaving.
    */
  def distinctHashes(md: MessageDigest, id: Long, text: String,
      k: Int): Iterator[(Long, Long)] = {
    val h = hashes(md, text, k)
    java.util.Arrays.sort(h)
    new Iterator[(Long, Long)] {
      private var i = 0
      def hasNext: Boolean = i < h.length
      def next(): (Long, Long) = {
        val v = h(i)
        i += 1
        while (i < h.length && h(i) == v) i += 1 // per-doc distinct
        (id, v)
      }
    }
  }
}

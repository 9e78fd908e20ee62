package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused single-pass BPE encode — the codegen kernel behind
  * `tx_bpe_encode`/`tx_bpe_pipeline`. Byte-identical to the
  * composed-built-ins form ([[Bpe.wrapText]] → [[Bpe.applyMerges]] →
  * [[Bpe.render]], the shape the DuckDB oracle replays), but ONE walk
  * over the text instead of a regex wrap (a per-code-point regex
  * engine pass) plus a full-string copy per merge: sanitize, word
  * split, greedy merge application and rendering happen in a single
  * static JVM call inside whole-stage codegen. BpeSpec gates byte
  * equality against the composed form on real corpus text.
  *
  * Symbols are CODE POINTS (a surrogate pair is one symbol), matching
  * `([\s\S])` in both Java regex and RE2. The greedy left-to-right
  * non-overlapping merge scan is the list-form twin of the literal
  * bracket-string replace (parity proven in BpeSpec).
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_encode expects STRING, got ${child.dataType.simpleString}")
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  @transient private lazy val table: BpeTable =
    BpeTable(BpeEncode.flatten(merges))

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      BpeEncode.encode(input.asInstanceOf[UTF8String].toString, table))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table, "graft.functions.BpeTable")
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.BpeEncode.encode($c.toString(), $ref))")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

object BpeEncode {

  private[functions] def flatten(merges: Seq[(String, String)]): Array[String] =
    merges.flatMap(m => Seq(m._1, m._2)).toArray

  /** Merge-list wire form for the function-registry path: symbols
    * joined by NUL — a control char, so sanitize guarantees no symbol
    * (or merge of symbols) ever contains one.
    */
  private[functions] def serializeWire(merges: Seq[(String, String)]): String =
    flatten(merges).mkString("\u0000")

  private[functions] def parseWire(s: String): Seq[(String, String)] = {
    if (s.isEmpty) return Seq.empty
    val flat = s.split("\u0000", -1)
    require(flat.length % 2 == 0, "bpe merges: odd wire-form length")
    flat.grouped(2).map(p => (p(0), p(1))).toSeq
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bpe_encode",
      exprs => {
        require(exprs.length == 2,
          s"graft_bpe_encode expects 2 arguments, got ${exprs.length}")
        require(exprs(1).foldable,
          "graft_bpe_encode: merge list must be a literal")
        val wire = exprs(1).eval(null)
        require(wire != null, "graft_bpe_encode: merge list is null")
        BpeEncode(exprs.head, parseWire(wire.toString))
      },
      "scala_udf")

  /** Column API: fused sanitize→split→merge→render in one kernel call. */
  def encodeCol(spark: SparkSession, text: Column,
      merges: Seq[(String, String)]): Column = {
    register(spark)
    call_function("graft_bpe_encode", text, lit(serializeWire(merges)))
  }

  /** Flat-list convenience overload (tests, default strategy). */
  def encode(s: String, flat: Array[String]): String =
    encode(s, BpeTable(flat))

  /** The scalar kernel — public static so generated code can call it.
    * The table carries the rank-ordered merges and picks the merge
    * strategy (chain vs priority queue — see [[BpeTable]]).
    */
  def encode(s: String, table: BpeTable): String = {
    val out = new java.lang.StringBuilder(s.length + (s.length >> 2))
    val syms = new java.util.ArrayList[String](64)
    val n = s.length
    var i = 0
    while (i <= n) {
      val atEnd = i == n
      val c = if (atEnd) ' ' else s.charAt(i)
      if (c == ' ') {
        if (!syms.isEmpty) {
          syms.add(Bpe.W)
          mergeAll(syms, table)
          render(out, syms)
          syms.clear()
        }
        i += 1
      } else if (c <= 0x1F || c == 0x7F) {
        i += 1 // sanitize: control chars vanish pre-split
      } else if (Character.isHighSurrogate(c) && i + 1 < n &&
          Character.isLowSurrogate(s.charAt(i + 1))) {
        syms.add(s.substring(i, i + 2)) // one symbol per CODE POINT
        i += 2
      } else {
        syms.add(String.valueOf(c))
        i += 1
      }
    }
    out.toString
  }

  /** Pre-merge symbol count of a doc: code points per word (controls
    * and spaces excluded) + one end-of-word marker per word — equals
    * the bracket-count/2 of the wrapped form.
    */
  def symCount(s: String): Int = {
    var count = 0
    var inWord = false
    val n = s.length
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == ' ') {
        if (inWord) count += 1 // the word's marker
        inWord = false
        i += 1
      } else if (c <= 0x1F || c == 0x7F) {
        i += 1
      } else {
        count += 1
        inWord = true
        i += (if (Character.isHighSurrogate(c) && i + 1 < n &&
          Character.isLowSurrogate(s.charAt(i + 1))) 2 else 1)
      }
    }
    if (inWord) count += 1
    count
  }

  /** Flat-list convenience overload (tests, default strategy). */
  def tokenCount(s: String, flat: Array[String]): Int =
    tokenCount(s, BpeTable(flat))

  /** Post-merge token count — [[encode]] without assembling the output
    * string (the pipeline query aggregates counts only).
    */
  def tokenCount(s: String, table: BpeTable): Int = {
    val syms = new java.util.ArrayList[String](64)
    var count = 0
    val n = s.length
    var i = 0
    while (i <= n) {
      val c = if (i == n) ' ' else s.charAt(i)
      if (c == ' ') {
        if (!syms.isEmpty) {
          syms.add(Bpe.W)
          mergeAll(syms, table)
          count += syms.size
          syms.clear()
        }
        i += 1
      } else if (c <= 0x1F || c == 0x7F) {
        i += 1
      } else if (Character.isHighSurrogate(c) && i + 1 < n &&
          Character.isLowSurrogate(s.charAt(i + 1))) {
        syms.add(s.substring(i, i + 2))
        i += 2
      } else {
        syms.add(String.valueOf(c))
        i += 1
      }
    }
    count
  }

  /** Apply the table's merges to one word in place — the chain scan for
    * small tables, the rank-priority-queue for large ones (strategy
    * equivalence proven in BpeSpec; see [[BpeTable]]).
    */
  private def mergeAll(syms: java.util.ArrayList[String],
      table: BpeTable): Unit =
    if (table.usePq) {
      mergeAllPq(syms, table.ranks) // the well-formed prefix
      if (table.suffixFlat.length > 0) // rare: past the first violation
        mergeAllChain(syms, table.suffixFlat)
    } else mergeAllChain(syms, table.flat)

  /** Greedy left-to-right non-overlapping application of every merge in
    * rank order — in place, reusing one scratch list per call.
    * O(merges × len): right for demo-sized tables.
    */
  private def mergeAllChain(syms: java.util.ArrayList[String],
      flat: Array[String]): Unit = {
    var m = 0
    while (m < flat.length) {
      val l = flat(m); val r = flat(m + 1)
      var read = 0; var write = 0
      val sz = syms.size
      while (read < sz) {
        if (read < sz - 1 && syms.get(read) == l && syms.get(read + 1) == r) {
          syms.set(write, l + r); read += 2
        } else {
          if (write != read) syms.set(write, syms.get(read))
          read += 1
        }
        write += 1
      }
      var k = sz
      while (k > write) { k -= 1; syms.remove(k) }
      m += 2
    }
  }

  /** Rank-priority-queue merge: always apply the lowest-rank pair
    * present, leftmost occurrence first — O(len · log len) per word
    * regardless of merge-table size (the production-vocabulary path;
    * a 64k-merge table costs the same per word as a 12-merge one).
    *
    * Linked list over the word's symbol slots + a min-heap of
    * (rank << 32 | leftPos) longs with LAZY invalidation: every pair
    * creation pushes an entry at its current rank; a popped entry is
    * applied only when the slot is alive and its CURRENT pair still
    * has the popped rank (pair ranks are immutable while both symbols
    * are unchanged, so an equal rank is always safe to apply — it is
    * the heap minimum). Merged slots keep the LEFT index, so slot
    * order stays textual order and the long encoding's natural order
    * (rank asc, then position asc) IS the chain's left-to-right
    * tie-break.
    */
  private def mergeAllPq(syms: java.util.ArrayList[String],
      ranks: java.util.HashMap[String, Integer]): Unit = {
    val n = syms.size
    if (n < 2) return
    def rankOf(l: String, r: String): Int = {
      val v = ranks.get(l + " " + r) // symbols never contain a space
      if (v == null) -1 else v.intValue()
    }
    val nxt = new Array[Int](n)
    val prv = new Array[Int](n)
    val dead = new Array[Boolean](n)
    val heap = new java.util.PriorityQueue[java.lang.Long](math.max(16, n))
    var i = 0
    while (i < n) {
      nxt(i) = if (i + 1 < n) i + 1 else -1
      prv(i) = i - 1
      if (i + 1 < n) {
        val rk = rankOf(syms.get(i), syms.get(i + 1))
        if (rk >= 0) heap.add(java.lang.Long.valueOf((rk.toLong << 32) | i))
      }
      i += 1
    }
    while (!heap.isEmpty) {
      val e = heap.poll().longValue()
      val rk = (e >>> 32).toInt
      val li = (e & 0xFFFFFFFFL).toInt
      if (!dead(li)) {
        val ri = nxt(li)
        if (ri >= 0 && rankOf(syms.get(li), syms.get(ri)) == rk) {
          syms.set(li, syms.get(li) + syms.get(ri))
          dead(ri) = true
          val rr = nxt(ri)
          nxt(li) = rr
          if (rr >= 0) prv(rr) = li
          val p = prv(li)
          if (p >= 0) {
            val pr = rankOf(syms.get(p), syms.get(li))
            if (pr >= 0) heap.add(java.lang.Long.valueOf((pr.toLong << 32) | p))
          }
          if (rr >= 0) {
            val nr = rankOf(syms.get(li), syms.get(rr))
            if (nr >= 0) heap.add(java.lang.Long.valueOf((nr.toLong << 32) | li))
          }
        }
      }
    }
    // compact surviving symbols in slot (= textual) order
    var w = 0
    i = 0
    while (i < n) {
      if (!dead(i)) { if (w != i) syms.set(w, syms.get(i)); w += 1 }
      i += 1
    }
    var k = n
    while (k > w) { k -= 1; syms.remove(k) }
  }

  /** Append the word's tokens: space-joined, marker rendered `</w>`. */
  private def render(out: java.lang.StringBuilder,
      syms: java.util.ArrayList[String]): Unit = {
    var i = 0
    val sz = syms.size
    while (i < sz) {
      if (out.length > 0) out.append(' ')
      val t = syms.get(i)
      var j = 0
      while (j < t.length) {
        val c = t.charAt(j)
        if (c == '\u0002') out.append("</w>") else out.append(c)
        j += 1
      }
      i += 1
    }
  }
}

/** Companion count kernel: pre-merge symbol count (see
  * [[BpeEncode.symCount]]) as a codegen'd IntegerType expression.
  */
case class BpeSymCount(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_sym_count expects STRING, got ${child.dataType.simpleString}")
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(input: Any): Any =
    BpeEncode.symCount(input.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BpeEncode.symCount($c.toString())")
  override protected def withNewChildInternal(newChild: Expression): BpeSymCount =
    copy(child = newChild)
}

/** Post-merge token count kernel (see [[BpeEncode.tokenCount]]). */
case class BpeTokenCount(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_token_count expects STRING, got ${child.dataType.simpleString}")
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable
  @transient private lazy val table: BpeTable =
    BpeTable(BpeEncode.flatten(merges))
  override def nullSafeEval(input: Any): Any =
    BpeEncode.tokenCount(input.asInstanceOf[UTF8String].toString, table)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table, "graft.functions.BpeTable")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BpeEncode.tokenCount($c.toString(), $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

object BpeTokenCount {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bpe_token_count",
      exprs => {
        require(exprs.length == 2,
          s"graft_bpe_token_count expects 2 arguments, got ${exprs.length}")
        require(exprs(1).foldable,
          "graft_bpe_token_count: merge list must be a literal")
        val wire = exprs(1).eval(null)
        require(wire != null, "graft_bpe_token_count: merge list is null")
        BpeTokenCount(exprs.head, BpeEncode.parseWire(wire.toString))
      },
      "scala_udf")

  /** Column API: post-merge token count without output assembly. */
  def countCol(spark: SparkSession, text: Column,
      merges: Seq[(String, String)]): Column = {
    register(spark)
    call_function("graft_bpe_token_count", text,
      lit(BpeEncode.serializeWire(merges)))
  }
}

object BpeSymCount {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bpe_sym_count",
      exprs => {
        require(exprs.length == 1,
          s"graft_bpe_sym_count expects 1 argument, got ${exprs.length}")
        BpeSymCount(exprs.head)
      },
      "scala_udf")

  /** Column API: pre-merge symbol count. */
  def countCol(spark: SparkSession, text: Column): Column = {
    register(spark)
    call_function("graft_bpe_sym_count", text)
  }
}

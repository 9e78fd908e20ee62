package graft.functions

import graft.operators.UnigramTrainer
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SQL-callable unigram-LM encode (TX-UNI serving surface): the piece
  * count of a text under a trained vocabulary, as a native codegen
  * expression — `graft_unigram_encode(text)` once a vocabulary is
  * bound (`CALL graft.unigram_bind(root)` captures a PERSISTED
  * vocabulary table in the function's closure), completing the
  * T5d-style story where the tokenizer artifact is a governed,
  * time-travelable table and serving is plain SQL.
  *
  * Exactly [[UnigramTrainer.encodeCounts]]'s semantics — sanitize,
  * split on spaces, Viterbi-segment each word with the longer-piece
  * tie rule — fused into one static JVM call per row inside
  * whole-stage codegen (the [[BpeEncode]] pattern). The vocabulary
  * rides the expression as (piece, count) pairs; log-probs are
  * recomputed from the integer counts with the training M-step's own
  * math ([[UnigramTrainer.fixedVocab]]), so the expression and the
  * Dataset API cannot drift. UnigramSpec/SqlDmlSpec gate entry-for-
  * entry equality against encodeCounts on a persisted vocabulary.
  */
case class UnigramEncodeCount(child: Expression,
    vocabCounts: Seq[(String, Long)], maxPieceLen: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"unigram_encode expects STRING, got ${child.dataType.simpleString}")
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  @transient private lazy val kernel: UnigramKernel =
    UnigramKernel(vocabCounts, maxPieceLen)

  override def nullSafeEval(input: Any): Any =
    kernel.count(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramKernel", kernel,
      "graft.functions.UnigramKernel")
    defineCodeGen(ctx, ev, c => s"$ref.count($c.toString())")
  }
  override protected def withNewChildInternal(
      newChild: Expression): UnigramEncodeCount = copy(child = newChild)
}

/** The per-row kernel: vocabulary hash table + floor log-prob, built
  * once per plan from the integer counts and shared by interpreted
  * eval and generated code.
  */
case class UnigramKernel(vocabCounts: Seq[(String, Long)],
    maxPieceLen: Int) {
  @transient private lazy val state: (java.util.HashMap[String, java.lang.Double], Double) =
    UnigramTrainer.encodeTable(UnigramTrainer.fixedVocab(vocabCounts))

  /** Sanitize (strip control chars, the regex class [\x00-\x1F\x7F])
    * and split on spaces in one fused walk, Viterbi-count each word.
    * Equivalent to removing control chars THEN splitting: a control
    * char never acts as a separator in either form.
    */
  def count(s: String): Long = {
    val (table, floorLogp) = state
    var total = 0L
    val sb = new java.lang.StringBuilder(32)
    val n = s.length
    var i = 0
    while (i <= n) {
      val c = if (i == n) ' ' else s.charAt(i)
      if (c == ' ') {
        if (sb.length > 0) {
          total += UnigramTrainer.segment(sb.toString, table,
            maxPieceLen, floorLogp).length
          sb.setLength(0)
        }
      } else if (c >= 0x20 && c != 0x7F) sb.append(c)
      i += 1
    }
    total
  }
}

object UnigramEncodeCount {

  /** Wire form for the function-registry path: (piece, count) pairs
    * NUL-joined (sanitize guarantees no piece contains a control
    * char); integer counts round-trip exactly as decimal strings.
    */
  private[functions] def serializeWire(counts: Seq[(String, Long)]): String =
    counts.flatMap(p => Seq(p._1, p._2.toString)).mkString("\u0000")

  private[functions] def parseWire(s: String): Seq[(String, Long)] = {
    if (s.isEmpty) return Seq.empty
    val flat = s.split("\u0000", -1)
    require(flat.length % 2 == 0, "unigram vocab: odd wire-form length")
    flat.grouped(2).map(p => (p(0), p(1).toLong)).toSeq
  }

  /** Per-session bound vocabulary for the 1-argument form — looked up
    * AT RESOLUTION TIME by the single unified registration, so
    * [[register]] and [[bind]] can never clobber each other's arity
    * (they used to race for one function name; whichever registered
    * last broke the other surface). Weak keys: an entry dies with its
    * session.
    */
  private val boundVocab = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, (Seq[(String, Long)], Int)]())

  /** Register `graft_unigram_encode`: `(text, vocabWire [, maxPieceLen])`
    * always works; plain `(text)` works once [[bind]] stored a
    * vocabulary for this session.
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_unigram_encode",
      exprs => exprs.length match {
        case 1 =>
          val b = boundVocab.get(spark)
          require(b != null,
            "graft_unigram_encode(text) requires a bound vocabulary — " +
              "CALL graft.unigram_bind(root) first, or pass " +
              "(text, vocabWire [, maxPieceLen])")
          UnigramEncodeCount(exprs.head, b._1, b._2)
        case 2 | 3 =>
          require(exprs(1).foldable,
            "graft_unigram_encode: vocabulary must be a literal")
          val wire = exprs(1).eval(null)
          require(wire != null, "graft_unigram_encode: vocabulary is null")
          val mpl =
            if (exprs.length < 3) UnigramTrainer.DefaultMaxPieceLen
            else {
              require(exprs(2).foldable,
                "graft_unigram_encode: maxPieceLen must be a literal")
              exprs(2).eval(null).asInstanceOf[Number].intValue()
            }
          UnigramEncodeCount(exprs.head, parseWire(wire.toString), mpl)
        case n => throw new IllegalArgumentException(
          s"graft_unigram_encode expects 1-3 arguments, got $n")
      },
      "scala_udf")
  }

  /** Bind a vocabulary so plain `graft_unigram_encode(text)` works in
    * SQL for this session (rebinding replaces it). Returns the
    * vocabulary size.
    */
  def bind(spark: SparkSession, counts: Seq[(String, Long)],
      maxPieceLen: Int = UnigramTrainer.DefaultMaxPieceLen): Int = {
    boundVocab.put(spark, (counts, maxPieceLen))
    register(spark)
    counts.size
  }

  /** Column API: piece count of `text` under `counts`. */
  def countCol(spark: SparkSession, text: Column,
      counts: Seq[(String, Long)],
      maxPieceLen: Int = UnigramTrainer.DefaultMaxPieceLen): Column = {
    register(spark)
    call_function("graft_unigram_encode", text,
      lit(serializeWire(counts)), lit(maxPieceLen))
  }
}

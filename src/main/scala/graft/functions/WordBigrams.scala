package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native adjacent-word-bigram generator, replacing the
  * zip_with(slice, slice) higher-order-function form that fell out of
  * whole-stage codegen (HOFs don't codegen — the LshBuckets /
  * TextNormalize lesson). Semantics are exactly
  * `zip_with(t, t[1:], (a,b) -> concat(a,' ',b))` over
  * `t = split(text, ' ')`.
  *
  * The kernel exploits that split-by-single-space bigrams are byte
  * SLICES of the original string: token i and token i+1 are separated
  * by exactly one 0x20 byte (0x20 never occurs inside a UTF-8
  * multibyte sequence), so bigram i is the byte range
  * [start(token i), end(token i+1)) — one scan for space positions,
  * then n−1 zero-parse slices. No per-token string building, no
  * lambda interpretation.
  */
case class WordBigrams(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bigrams expects STRING, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    WordBigrams.bigramArray(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordBigrams.bigramArray($c)")

  override protected def withNewChildInternal(newChild: Expression): WordBigrams =
    copy(child = newChild)
}

object WordBigrams {

  /** The kernel — public static (forwarder) so generated code can call
    * it. Returns one UTF8String slice per adjacent token pair.
    */
  def bigramArray(s: UTF8String): ArrayData = {
    val b = s.getBytes
    var n = 0
    var i = 0
    while (i < b.length) { if (b(i) == 0x20) n += 1; i += 1 }
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val sp = new Array[Int](n)
    var k = 0
    i = 0
    while (i < b.length) { if (b(i) == 0x20) { sp(k) = i; k += 1 }; i += 1 }
    val out = new Array[Any](n)
    var j = 0
    while (j < n) {
      val start = if (j == 0) 0 else sp(j - 1) + 1
      val end = if (j + 1 < n) sp(j + 1) else b.length
      out(j) = UTF8String.fromBytes(b, start, end - start)
      j += 1
    }
    new GenericArrayData(out)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bigrams",
      exprs => {
        if (exprs.length != 1)
          throw new IllegalArgumentException(
            s"graft_bigrams expects 1 argument, got ${exprs.length}")
        WordBigrams(exprs.head)
      },
      "scala_udf")

  /** Column API: native bigrams against the active session. */
  def bigrams(c: Column): Column = {
    register(SparkSession.active)
    call_function("graft_bigrams", c)
  }
}

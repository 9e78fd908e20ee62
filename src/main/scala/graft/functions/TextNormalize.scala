package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native text canonicalization for corpus cleaning — the
  * pre-tokenization pass every web-scale text pipeline runs before
  * hashing or deduplicating: Unicode NFC normalization (so composed
  * and decomposed accents fingerprint identically), control-character
  * stripping, whitespace-run collapse, trim. One string pass per row
  * inside whole-stage codegen (a static JVM call, no UDF ser/deser
  * boundary), exactly mirrored by a DuckDB
  * nfc_normalize + regexp_replace chain in the oracle.
  *
  * The transform, precisely (the oracle depends on this order):
  *  1. NFC normalize (java.text.Normalizer ≡ utf8proc NFC);
  *  2. drop control chars \x00-\x08, \x0B, \x0C, \x0E-\x1F, \x7F
  *     (KEEPING \t \n \r, which step 3 folds);
  *  3. collapse runs of [ \t\n\r] to a single space;
  *  4. trim a leading/trailing space.
  */
case class TextNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_normalize_text expects STRING, got ${child.dataType.simpleString}")

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      TextNormalize.normalizeString(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.TextNormalize.normalizeString($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): TextNormalize =
    copy(child = newChild)
}

object TextNormalize {

  /** The scalar kernel — public static so generated code can call it. */
  def normalizeString(s: String): String = {
    val nfc = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
    val sb = new java.lang.StringBuilder(nfc.length)
    var inWs = false
    var i = 0
    while (i < nfc.length) {
      val c = nfc.charAt(i)
      val isControl = c <= 0x08 || c == 0x0B || c == 0x0C ||
        (c >= 0x0E && c <= 0x1F) || c == 0x7F
      if (!isControl) {
        val isWs = c == ' ' || c == '\t' || c == '\n' || c == '\r'
        if (isWs) inWs = true
        else {
          if (inWs && sb.length > 0) sb.append(' ')
          inWs = false
          sb.append(c)
        }
      }
      i += 1
    }
    sb.toString
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_normalize_text",
      exprs => {
        if (exprs.length != 1)
          throw new IllegalArgumentException(
            s"graft_normalize_text expects 1 argument, got ${exprs.length}")
        TextNormalize(exprs.head)
      },
      "scala_udf")

  /** Column API: native canonicalization. */
  def normalize(spark: SparkSession, c: Column): Column = {
    register(spark)
    call_function("graft_normalize_text", c)
  }
}

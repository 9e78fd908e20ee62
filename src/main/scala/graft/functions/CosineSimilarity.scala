package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Native cosine similarity over ARRAY<FLOAT>/ARRAY<DOUBLE> columns —
  * the X1 scale path (SURVEY.md §4.1): one fused loop in generated
  * code, no intermediate arrays. The higher-order-function composition
  * (VectorOps.cosine) allocates three arrays per row (`transform` +
  * `zip_with` + fold); at 100 TB × 10 probes that's the hot path, so
  * this is the one place a custom Expression is justified.
  *
  * Bit-compatible with VectorOps.cosine: elements promote to double,
  * dot and norms accumulate sequentially in element order, result is
  * dot / (sqrt(na) * sqrt(nb)) — asserted equal in LlmOpsSpec. That
  * parity includes malformed input: mismatched vector lengths yield
  * NULL (as zip_with's null padding does), never a truncated-prefix
  * similarity that would look plausible and be wrong.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullable: Boolean = true

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(t, _) => t
    case _ => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(e => elemType(e) == FloatType ||
      elemType(e) == DoubleType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine expects ARRAY<FLOAT|DOUBLE>, got ${left.dataType.simpleString}, " +
        s"${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    val xf = elemType(left) == FloatType
    val yf = elemType(right) == FloatType
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      // a NULL element must yield NULL (VectorOps.cosine's zip_with
      // semantics) — ArrayData.getDouble on a null slot returns 0.0,
      // which would be a plausible-but-wrong similarity
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      def get(arr: String, idx: String, isFloat: Boolean): String =
        if (isFloat) s"(double) $arr.getFloat($idx)" else s"$arr.getDouble($idx)"
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $xi = ${get(a, i, elemType(left) == FloatType)};
         |    double $yi = ${get(b, i, elemType(right) == FloatType)};
         |    $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cosine",
      exprs => {
        // arity-check here: a wrong-arity SQL call would otherwise die
        // with an opaque IndexOutOfBoundsException during resolution
        if (exprs.length != 2)
          throw new IllegalArgumentException(
            s"graft_cosine expects 2 arguments, got ${exprs.length}")
        CosineSimilarity(exprs.head, exprs(1))
      },
      "scala_udf")

  /** Column API: native fused cosine. */
  def cosine(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("graft_cosine", a, b)
  }
}

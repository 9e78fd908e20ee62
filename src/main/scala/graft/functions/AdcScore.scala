package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Native ADC (asymmetric distance computation) table lookup: given a
  * PQ code vector `codes` (ARRAY<INT>, one centroid id per subspace)
  * and per-subspace lookup tables `tables`
  * (ARRAY<ARRAY<FLOAT|DOUBLE>>), returns Σ_mi tables[mi][codes[mi]] in
  * one fused loop. This is THE inner loop of every IVF-PQ probe —
  * evaluated once per (corpus row × probe sharing its list) — and the
  * HOF form (`zip_with` + `element_at` + `aggregate`) pays interpreted
  * lambda dispatch per subspace per row. Bit-identical accumulation
  * order (sequential by subspace), identical NULL semantics (NULL
  * codes/tables or a NULL slot → NULL).
  */
case class AdcScore(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullable: Boolean = true

  private def elemOf(e: Expression): DataType = e.dataType match {
    case ArrayType(t, _) => t
    case _ => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val codesOk = elemOf(left) == IntegerType || elemOf(left) == LongType
    val tablesOk = elemOf(right) match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (codesOk && tablesOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_adc_score expects (ARRAY<INT|BIGINT> codes, " +
        s"ARRAY<ARRAY<FLOAT|DOUBLE>> tables), got ${left.dataType.simpleString}, " +
        right.dataType.simpleString)
  }

  override def dataType: DataType = DoubleType

  @transient private lazy val codesAreLong = elemOf(left) == LongType
  @transient private lazy val cellsAreFloat = elemOf(right) match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** Fused kernel; boxed Double or null (codegen calls it through a
    * reference object, keeping the whole-stage span intact).
    */
  def compute(codesAny: Any, tablesAny: Any): Any = {
    val codes = codesAny.asInstanceOf[ArrayData]
    val tables = tablesAny.asInstanceOf[ArrayData]
    val m = codes.numElements()
    if (tables.numElements() < m) return null // malformed lut: no prefix guess
    var acc = 0.0
    var mi = 0
    while (mi < m) {
      if (codes.isNullAt(mi) || tables.isNullAt(mi)) return null
      val code =
        if (codesAreLong) codes.getLong(mi).toInt else codes.getInt(mi)
      val cells = tables.getArray(mi)
      if (code < 0 || code >= cells.numElements() || cells.isNullAt(code))
        return null
      acc += (if (cellsAreFloat) cells.getFloat(code).toDouble
              else cells.getDouble(code))
      mi += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override def nullSafeEval(a: Any, b: Any): Any = compute(a, b)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val ref = ctx.addReferenceObj("adcScore", this, classOf[AdcScore].getName)
      val r = ctx.freshName("r")
      s"""
         |Object $r = $ref.compute($a, $b);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ((java.lang.Double) $r).doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcScore =
    copy(left = newLeft, right = newRight)
}

object AdcScore {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_adc_score",
      exprs => {
        if (exprs.length != 2)
          throw new IllegalArgumentException(
            s"graft_adc_score expects 2 arguments, got ${exprs.length}")
        AdcScore(exprs.head, exprs(1))
      },
      "scala_udf")

  /** Column API: Σ over subspaces of tables[mi][codes[mi]]. */
  def score(spark: SparkSession, codes: Column, tables: Column): Column = {
    register(spark)
    call_function("graft_adc_score", codes, tables)
  }
}

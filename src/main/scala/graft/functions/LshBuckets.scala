package graft.functions

import graft.queries.LshPlanes
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Native multi-table sign-LSH bucket assignment (X1 scale path): all
  * `nTables × planesPerTable` hyperplane dot products fuse into ONE
  * primitive loop per row, emitting the final
  * `ARRAY<STRUCT<table:INT, bucket:INT>>`. The higher-order-function
  * form (`zip_with` + `aggregate` per plane) evaluates 32 interpreted
  * folds with per-element lambda dispatch over the whole corpus — the
  * single hottest expression in the LSH signature pass. One
  * expression, one evaluation: nothing here depends on
  * common-subexpression elimination (the r6 guard regression came
  * from exactly that dependency).
  *
  * Semantics are downstream-identical to the HOF form (parity
  * asserted in LlmOpsSpec):
  *  - dot products accumulate sequentially in element order →
  *    bit-identical signs and bucket values;
  *  - wrong dimensionality throws loudly (the silent alternative
  *    dumped every mismatched vector into one shared bucket);
  *  - a NULL vector, a NULL element, or a NaN-poisoned dot yields
  *    NULL (the HOF form yielded NULL buckets; either way `explode` +
  *    the bucket equi-join produce NO candidates, never wrong ones).
  */
case class LshBuckets(child: Expression) extends UnaryExpression {

  override def nullable: Boolean = true

  private def elemType: DataType = child.dataType match {
    case ArrayType(t, _) => t
    case _ => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType == FloatType || elemType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_lsh_buckets expects ARRAY<FLOAT|DOUBLE>, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("table", IntegerType, nullable = false),
      StructField("bucket", IntegerType, nullable = false))),
    containsNull = false)

  @transient private lazy val isFloat = elemType == FloatType

  /** The fused kernel — also the codegen body (generated code calls it
    * through a reference object; the loop itself is compiled Scala, so
    * the whole-stage-codegen span stays intact around it).
    */
  def compute(arr: ArrayData): Any = {
    val dims = LshPlanes.dims
    val n = arr.numElements()
    if (n != dims) throw new IllegalArgumentException(
      s"LshPlanes requires $dims-dim vectors, got length $n")
    val v = new Array[Double](dims)
    var j = 0
    while (j < dims) {
      if (arr.isNullAt(j)) return null
      v(j) = if (isFloat) arr.getFloat(j).toDouble else arr.getDouble(j)
      j += 1
    }
    val planes = LshBuckets.planeWeights
    val ppt = LshPlanes.planesPerTable
    val out = new Array[Any](LshPlanes.nTables)
    var t = 0
    while (t < LshPlanes.nTables) {
      var bucket = 0
      var p = 0
      while (p < ppt) {
        val w = planes(t * ppt + p)
        var dot = 0.0
        var k = 0
        while (k < dims) { dot += v(k) * w(k); k += 1 }
        if (dot.isNaN) return null
        if (dot > 0) bucket |= 1 << p
        p += 1
      }
      out(t) = InternalRow(t, bucket)
      t += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("lshBuckets", this, classOf[LshBuckets].getName)
      val r = ctx.freshName("r")
      s"""
         |Object $r = $ref.compute($a);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $r;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LshBuckets =
    copy(child = newChild)
}

object LshBuckets {

  /** Plane weights, identical values to [[LshPlanes]]'s plan literals
    * (same driver-side formula — bit-for-bit the same doubles).
    */
  @transient lazy val planeWeights: Array[Array[Double]] =
    Array.tabulate(LshPlanes.nTables * LshPlanes.planesPerTable,
      LshPlanes.dims)((i, j) => LshPlanes.planeComponentValue(i, j))

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_lsh_buckets",
      exprs => {
        if (exprs.length != 1)
          throw new IllegalArgumentException(
            s"graft_lsh_buckets expects 1 argument, got ${exprs.length}")
        LshBuckets(exprs.head)
      },
      "scala_udf")

  /** Column API: fused (table, bucket) signature array. */
  def buckets(spark: SparkSession, v: Column): Column = {
    register(spark)
    call_function("graft_lsh_buckets", v)
  }
}

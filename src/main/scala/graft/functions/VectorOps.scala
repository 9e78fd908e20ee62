package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Vector math over ARRAY<FLOAT>/<DOUBLE> embedding columns (X1/A8,
  * SURVEY.md §2.11), built from codegen-friendly higher-order functions
  * — no Scala UDFs in the hot path. All math is promoted to Double
  * up-front (float→double is exact) and accumulates sequentially in
  * list order, which both Spark's `aggregate` and DuckDB's
  * `list_reduce` implement identically — bit-reproducible across
  * engines.
  */
object VectorOps {

  /** Exact promotion to ARRAY<DOUBLE>. */
  def toDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Sequential left-fold sum of an ARRAY<DOUBLE>. */
  def arraySum(v: Column): Column =
    aggregate(v, lit(0.0), (acc, x) => acc + x)

  /** Dot product, sequential in element order. */
  def dot(a: Column, b: Column): Column =
    arraySum(zip_with(a, b, (x, y) => x * y))

  def l2Norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine similarity of two ARRAY<DOUBLE> columns. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Euclidean distance. */
  def l2Dist(a: Column, b: Column): Column =
    sqrt(arraySum(zip_with(a, b, (x, y) => (x - y) * (x - y))))

  /** Symmetric max-abs int8 quantization: (scale, ARRAY<TINYINT>) —
    * 4× (vs float) / 8× (vs double) smaller embedding storage, the
    * difference between a 100 TB and a 25 TB vector store. Codegen
    * higher-order fns, no UDF. Zero vectors quantize to scale 0 /
    * all-zero codes (dequantize returns the zero vector back).
    */
  def quantScale(v: Column): Column =
    aggregate(toDouble(v), lit(0.0), (m, x) => greatest(m, abs(x))) / lit(127.0)

  def quantize(v: Column, scale: Column): Column =
    transform(toDouble(v), x =>
      when(scale === 0.0, lit(0))
        .otherwise(round(x / scale).cast("int")).cast("tinyint"))

  def dequantize(codes: Column, scale: Column): Column =
    transform(codes, c => c.cast("double") * scale)

  /** A8/X2: typed Aggregator computing the element-wise mean vector
    * (centroid) of grouped embeddings. Buffer = (sum vector, count);
    * merge is element-wise — classic partial-aggregation shape, scales
    * as a two-phase agg with tiny fixed-size state.
    */
  class CentroidAggregator(dim: Int)
      extends Aggregator[Seq[Float], (Array[Double], Long), Seq[Double]] {
    override def zero: (Array[Double], Long) = (Array.fill(dim)(0.0), 0L)
    override def reduce(b: (Array[Double], Long), v: Seq[Float]): (Array[Double], Long) = {
      var i = 0
      while (i < dim && i < v.length) { b._1(i) += v(i); i += 1 }
      (b._1, b._2 + 1)
    }
    override def merge(x: (Array[Double], Long), y: (Array[Double], Long)): (Array[Double], Long) = {
      var i = 0
      while (i < dim) { x._1(i) += y._1(i); i += 1 }
      (x._1, x._2 + y._2)
    }
    override def finish(b: (Array[Double], Long)): Seq[Double] =
      if (b._2 == 0) Seq.empty else b._1.map(_ / b._2).toSeq
    // ExpressionEncoder packs the buffer as an UnsafeArrayData row —
    // Java serialization here cost ~18× on every partial/merge exchange
    override def bufferEncoder: Encoder[(Array[Double], Long)] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Long)]()
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** Column-API centroid aggregate over an ARRAY<FLOAT> column. */
  def centroid(dim: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new CentroidAggregator(dim), ExpressionEncoderHelper.seqFloat)
}

private[functions] object ExpressionEncoderHelper {
  val seqFloat: Encoder[Seq[Float]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Float]]()
}

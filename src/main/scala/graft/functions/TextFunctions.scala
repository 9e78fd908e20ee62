package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Text-analysis building blocks (F8 + north-star text ops): token
  * counting, n-grams, quality signals, language-ID marker sets, and a
  * native rolling-hash fingerprint Expression. Everything except
  * RollingHash composes built-in higher-order functions (codegen'd);
  * RollingHash itself implements doGenCode, so nothing here breaks a
  * whole-stage-codegen span.
  */
object TextFunctions {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish subword tokens: runs of letters, digits, or single other
    * non-space symbols (a practical approximation of byte-pair-style
    * pre-tokenization for counting purposes).
    */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), lit(0))

  /** Adjacent word bigrams: semantically zip(tokens, tokens[1:]),
    * implemented by the native [[WordBigrams]] expression (codegen'd
    * byte-slice kernel; the zip_with/slice HOF form broke whole-stage
    * codegen and cost 3× on tx_bigrams).
    */
  def bigrams(text: Column): Column = WordBigrams.bigrams(text)

  /** Small per-language marker-word sets for the n-gram/stopword
    * language-ID heuristic. Deliberately tiny and deterministic.
    */
  val langMarkers: Map[String, Seq[String]] = Map(
    "de" -> Seq("der", "die", "das", "und", "nicht", "ist"),
    "en" -> Seq("the", "a", "of", "and", "to", "is"),
    "es" -> Seq("el", "la", "de", "y", "que", "es"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est"),
    "zh" -> Seq("的", "是", "不", "了", "在", "我"))

  /** Hits of a marker set among the distinct tokens of a document. */
  def markerHits(text: Column, lang: String): Column =
    size(array_intersect(array_distinct(tokens(text)),
      array(langMarkers(lang).map(lit): _*)))

  /** English stopword ratio (quality signal). */
  val stopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "or", "to", "in", "is", "it")

  def stopwordRatio(text: Column): Column = {
    val t = tokens(text)
    size(filter(t, w => w.isin(stopwords.map(x => x: Any): _*))).cast("double") /
      size(t).cast("double")
  }

  /** Punctuation character ratio (quality signal). */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[^a-zA-Z0-9 ]", ""))).cast("double") /
      length(text).cast("double")

  /** Mean token length — integer sums, one double division. */
  def meanTokenLen(text: Column): Column = {
    val t = tokens(text)
    aggregate(t, lit(0), (acc, w) => acc + length(w)).cast("double") /
      size(t).cast("double")
  }

  /** Native rolling-hash document fingerprint (java.lang.String-style
    * polynomial hash over UTF-8 bytes, 64-bit wrapping) as a Catalyst
    * Expression with codegen — the preferred shape for a scalar the
    * built-ins can't express (SURVEY.md §4: Expression beats UDF).
    */
  case class RollingHash(child: Expression, base: Int)
      extends UnaryExpression {
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == StringType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_hash expects STRING, got ${child.dataType.simpleString}")
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any = {
      val bytes = input.asInstanceOf[UTF8String].getBytes
      var h = 0L
      var i = 0
      while (i < bytes.length) { h = h * base + bytes(i); i += 1 }
      h
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val b = ctx.freshName("bytes")
        val i = ctx.freshName("i")
        val h = ctx.freshName("h")
        s"""
           |byte[] $b = $c.getBytes();
           |long $h = 0L;
           |for (int $i = 0; $i < $b.length; $i++) { $h = $h * $base + $b[$i]; }
           |${ev.value} = $h;
         """.stripMargin
      })
    override protected def withNewChildInternal(newChild: Expression): RollingHash =
      copy(child = newChild)
  }

  /** Register rolling_hash(text[, base]) for SQL + Column use. */
  def registerRollingHash(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_rolling_hash",
      exprs => {
        if (exprs.length != 1)
          throw new IllegalArgumentException(
            s"graft_rolling_hash expects 1 argument, got ${exprs.length}")
        RollingHash(exprs.head, 31)
      },
      "scala_udf")

  def rollingHash(spark: org.apache.spark.sql.SparkSession, c: Column): Column = {
    registerRollingHash(spark)
    call_function("graft_rolling_hash", c)
  }
}

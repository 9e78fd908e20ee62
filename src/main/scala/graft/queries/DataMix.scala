package graft.queries

import graft.{Q, QueryModule}
import graft.functions.TextFunctions
import graft.operators.PrefixSum
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data mixing operators over `documents` — the planning layer
  * of a pretraining pipeline: deterministic weighted subsampling,
  * context-window sequence packing, and per-language quality filtering.
  * All three are content/key-hash deterministic (NOT Bernoulli RNG), so
  * they are exactly reproducible across engines, re-runs, and cluster
  * sizes — the property a 100 TB data recipe actually needs (a rerun
  * must select the SAME documents), and what makes them oracle-able.
  *
  * Scale notes: mix1/mix3 are narrow projections + window ranks
  * (one shuffle on lang); the packing family (mix2/mix7/mix8) runs its
  * running token sum through [[graft.operators.PrefixSum]]'s two-pass
  * bucketed cumsum — never a per-language window over raw rows — plus
  * one partial-agg shuffle. No driver-side state beyond PrefixSum's
  * 2-long range probe, no RNG seeds to coordinate.
  */
object DataMix extends QueryModule {

  /** Uniform-in-[0,1) from the first 8 md5 hex digits of a key — the
    * engine-portable deterministic sampler (md5 is bit-identical
    * everywhere; xxhash64 would be Spark-only).
    */
  private def hashUniform(key: Column): Column =
    conv(substring(md5(key.cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long").cast("double") / lit(4294967296.0)

  private def hashUniformSql(key: String): String =
    s"CAST(('0x' || substr(md5(CAST($key AS VARCHAR)), 1, 8)) AS UBIGINT) / 4294967296.0"

  /** Per-language target keep rates: downweight the over-represented
    * language, keep the tail. (Values are a demo recipe; the operator
    * is the deterministic thresholding, not the numbers.)
    */
  private val langWeights: Seq[(String, Double)] =
    Seq("en" -> 0.5, "zh" -> 0.9, "de" -> 0.8, "es" -> 0.8, "fr" -> 0.8)

  /** MIX1: deterministic weighted sampling — keep doc iff
    * hashUniform(doc_id) < weight(lang). Rerunning (anywhere) selects
    * the same documents; changing a weight only adds/removes docs of
    * that language (no reshuffling of survivors).
    */
  def mix1HashSample(spark: SparkSession, dir: String): DataFrame = {
    val w = langWeights.foldRight(lit(0.1): Column) { case ((l, p), e) =>
      when(col("lang") === l, lit(p)).otherwise(e)
    }
    Q.t(spark, dir, "documents")
      .withColumn("u", hashUniform(col("doc_id")))
      .filter(col("u") < w)
      .select(col("doc_id"), col("lang"), col("source"), col("u"))
      .orderBy(col("doc_id").asc)
  }

  val mix1Oracle: String = {
    val cases = langWeights.map { case (l, p) => s"WHEN '$l' THEN $p" }
      .mkString(" ")
    s"""SELECT doc_id, lang, source, ${hashUniformSql("doc_id")} AS u
       |FROM documents
       |WHERE ${hashUniformSql("doc_id")} < CASE lang $cases ELSE 0.1 END
       |ORDER BY doc_id ASC NULLS FIRST""".stripMargin
  }

  /** MIX2: sequence packing plan — concatenate docs per language in
    * doc_id order, split at a 2048-token context budget: a doc's pack
    * is floor(tokens-before-it / budget) (streaming concat-then-chunk,
    * the standard pretraining packing). Output is the per-pack manifest
    * a downstream tokenizer job would consume.
    *
    * The running token sum is [[graft.operators.PrefixSum]]'s two-pass
    * distributed cumsum, NOT a per-language window over raw rows —
    * `lang` is low-cardinality and Zipf-skewed, so the one-window form
    * would sort most of a 100 TB corpus in a single task.
    */
  def mix2SeqPacking(spark: SparkSession, dir: String): DataFrame = {
    val budget = 2048
    val counted = Q.t(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        size(TextFunctions.tokens(col("text"))).cast("long").as("n_tokens"))
    PrefixSum.exclusive(counted, Seq("lang"), "doc_id",
        Seq("n_tokens" -> "tokens_before"))
      .withColumn("pack_id", floor(col("tokens_before") / budget))
      .groupBy(col("lang"), col("pack_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("pack_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy(col("lang").asc, col("pack_id").asc)
  }

  val mix2Oracle: String =
    """WITH toks AS (
      |  SELECT doc_id, lang,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |packed AS (
      |  SELECT doc_id, lang, n_tokens,
      |    CAST(floor(COALESCE(SUM(n_tokens) OVER (PARTITION BY lang
      |      ORDER BY doc_id ASC NULLS FIRST
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 2048)
      |      AS BIGINT) AS pack_id
      |  FROM toks)
      |SELECT lang, pack_id, COUNT(*) AS n_docs,
    |  CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
      |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
      |FROM packed
      |GROUP BY lang, pack_id
      |ORDER BY lang ASC NULLS FIRST, pack_id ASC NULLS FIRST""".stripMargin

  /** MIX3: per-language quality filtering — keep the top half of each
    * language by the tx quality score (percent_rank over a total
    * order). The per-lang rank (not a global threshold) is what keeps
    * low-resource languages from being filtered out wholesale.
    */
  def mix3QualityFilter(spark: SparkSession, dir: String): DataFrame = {
    val sw = TextFunctions.stopwordRatio(col("text"))
    val punct = TextFunctions.punctRatio(col("text"))
    val lenScore = least(length(col("text")).cast("double") / lit(400.0), lit(1.0))
    val quality = lit(0.5) * lenScore + lit(0.3) * sw + lit(0.2) * (lit(1.0) - punct)
    // percent_rank = (rn-1)/(n-1) with rn, n computed WITHOUT a
    // per-language window over raw doc rows (lang is low-cardinality):
    // the distributed two-pass row number ordered (quality desc,
    // doc_id), range-imaged by floor((1-quality)·2^20) — monotone along
    // the descending-quality order, statically bounded so no probe job
    // — plus a tiny per-lang count broadcast back. Both divisions are
    // the same exact-integer-to-double ops the window form performs,
    // so the filter is bit-identical.
    // null-handling parity with the window form: `desc` defaults to
    // NULLS LAST, so a null quality (null text) must ALSO bucket last
    // (nullImageLast) — and a NaN quality (empty text: 0/0 ratio)
    // sorts FIRST under desc while its image casts to 0, the first
    // bucket: consistent. The count join is null-safe so a null lang
    // stays its own group, as the window's partitionBy treats it.
    val base = Q.t(spark, dir, "documents").withColumn("quality", quality)
    val ranked = graft.operators.PrefixSum.rowNumber(base, Seq("lang"),
      Seq(col("quality").desc, col("doc_id").asc),
      floor((lit(1.0) - col("quality")) * lit(1048576.0)).cast("long"),
      "rn", knownRange = Some((0L, 1048576L)), nullImageLast = true)
    val n = base.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .withColumnRenamed("lang", "_n_lang")
    ranked.join(broadcast(n), col("lang") <=> col("_n_lang"))
      .withColumn("pr",
        when(col("n") === 1, lit(0.0)).otherwise(
          (col("rn") - 1).cast("double") / (col("n") - 1).cast("double")))
      .filter(col("pr") <= 0.5)
      .select(col("doc_id"), col("lang"), col("quality"))
      .orderBy(col("doc_id").asc)
  }

  val mix3Oracle: String =
    """WITH sig AS (
      |  SELECT doc_id, lang,
      |    0.5 * least(CAST(len(text) AS DOUBLE) / 400.0, 1.0)
      |    + 0.3 * (CAST(len(list_filter(string_split(text, ' '),
      |        w -> w IN ('the','a','an','of','and','or','to','in','is','it'))) AS DOUBLE)
      |        / len(string_split(text, ' ')))
      |    + 0.2 * (1.0 - CAST(len(text) - len(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
      |        / len(text)) AS quality
      |  FROM documents),
      |ranked AS (
      |  SELECT doc_id, lang, quality,
      |    percent_rank() OVER (PARTITION BY lang
      |      ORDER BY quality DESC NULLS LAST, doc_id ASC NULLS FIRST) AS pr
      |  FROM sig)
      |SELECT doc_id, lang, quality FROM ranked
      |WHERE pr <= 0.5
      |ORDER BY doc_id ASC NULLS FIRST""".stripMargin

  /** MIX4: quota (stratified) sampling — EXACTLY n docs per language,
    * chosen by hash rank: the deterministic reservoir. Unlike mix1's
    * rate sampling, quotas hold exactly even when language sizes drift
    * — the contract data-mixture specs are written against. One
    * window shuffle on lang; no RNG, no driver state.
    */
  def mix4QuotaSample(spark: SparkSession, dir: String): DataFrame = {
    val n = 40
    // constant-quota rank filters are natively distributed: Spark's
    // InferWindowGroupLimit runs a PARTIAL per-input-partition top-40
    // before the exchange, so the per-lang sort never sees the raw
    // corpus (plan-asserted in PlanShapeSpec). Contrast mix6, whose
    // per-source quota is JOINED in (non-constant) — that one needs
    // the PrefixSum two-pass rank.
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("u").asc, col("doc_id").asc)
    Q.t(spark, dir, "documents")
      .withColumn("u", hashUniform(col("doc_id")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= n)
      .select(col("doc_id"), col("lang"), col("rk"))
      .orderBy(col("doc_id").asc)
  }

  val mix4Oracle: String =
    s"""SELECT doc_id, lang, rk FROM (
       |  SELECT doc_id, lang,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY lang
       |      ORDER BY ${hashUniformSql("doc_id")} ASC NULLS FIRST,
       |               doc_id ASC NULLS FIRST) AS INT) AS rk
       |  FROM documents)
       |WHERE rk <= 40
       |ORDER BY doc_id ASC NULLS FIRST""".stripMargin

  /** MIX5: stratified train/val/test split — every doc is assigned a
    * split by key hash (80/10/10), deterministically: reruns, engine
    * swaps, and cluster resizes all produce the SAME assignment, and
    * new docs never move existing ones between splits (the property
    * that keeps eval sets stable as a 100 TB corpus grows). Output is
    * the per-(lang, split) manifest with doc-id bounds — what a split
    * audit job publishes.
    */
  def mix5StratifiedSplit(spark: SparkSession, dir: String): DataFrame =
    Q.t(spark, dir, "documents")
      .withColumn("u", hashUniform(col("doc_id")))
      .withColumn("split",
        when(col("u") < 0.8, lit("train"))
          .when(col("u") < 0.9, lit("val"))
          .otherwise(lit("test")))
      .groupBy(col("lang"), col("split"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("n_chars"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy(col("lang").asc, col("split").asc)

  val mix5Oracle: String =
    s"""SELECT lang,
       |  CASE WHEN u < 0.8 THEN 'train' WHEN u < 0.9 THEN 'val'
       |       ELSE 'test' END AS split,
       |  COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS n_chars,
       |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
       |FROM (SELECT *, ${hashUniformSql("doc_id")} AS u FROM documents)
       |GROUP BY 1, 2
       |ORDER BY lang ASC NULLS FIRST, split ASC NULLS FIRST""".stripMargin

  /** MIX6: temperature-weighted source sampling — the multilingual/
    * multi-source rebalancing recipe (sample source s with probability
    * ∝ n_s^α, α = 1/2): big sources are downweighted sublinearly, the
    * tail is upweighted, per XLM-R-style corpus mixing. Quotas are
    * INTEGER-exact — weight w_s = floor(sqrt(n_s)) (correctly-rounded
    * IEEE sqrt of a bigint, floored: identical in every engine),
    * integer sum W, quota_s = (T·w_s) div W — so no float-accumulation
    * order can flip a doc across the quota boundary; the only float is
    * the hash-uniform pick ORDER, which is the mix1/mix4 shared
    * primitive. Selection = per-source top-quota_s by (u, doc_id).
    *
    * Scale: one count agg, a ≤|sources| quota frame broadcast back,
    * one per-source ranking window (keyed by source; the per-source
    * sort is the cost, same shape as mix4).
    */
  def mix6Temperature(spark: SparkSession, dir: String): DataFrame = {
    val target = 200
    val docs = Q.t(spark, dir, "documents")
      .withColumn("u", hashUniform(col("doc_id")))
    val cnt = docs.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val wts = cnt.withColumn("w",
      floor(sqrt(col("n").cast("double"))).cast("long"))
    val tot = wts.agg(sum(col("w")).as("wsum"))
    val quo = wts.crossJoin(tot)
      .withColumn("q", expr(s"($target * w) div wsum"))
      .select(col("source"), col("q"))
    // rank by (u, doc_id) per source WITHOUT a per-source window sort
    // (source is low-cardinality): u is hash/2^32 with the hash an
    // exact 32-bit integer, so floor(u·2^32) recovers it losslessly —
    // a known-range LONG image for the distributed two-pass row number
    val ranked = graft.operators.PrefixSum.rowNumber(docs, Seq("source"),
      Seq(col("u").asc, col("doc_id").asc),
      floor(col("u") * lit(4294967296.0)).cast("long"), "rk",
      knownRange = Some((0L, 4294967295L)))
    ranked
      .join(broadcast(quo), Seq("source"))
      .filter(col("rk") <= col("q"))
      .select(col("doc_id"), col("source"), col("rk"), col("q"))
      .orderBy(col("doc_id").asc)
  }

  val mix6Oracle: String =
    s"""WITH cnt AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
       |wts AS (SELECT source, CAST(FLOOR(SQRT(CAST(n AS DOUBLE))) AS BIGINT) AS w FROM cnt),
       |tot AS (SELECT SUM(w) AS wsum FROM wts),
       |quo AS (SELECT source, CAST((200 * w) // wsum AS BIGINT) AS q FROM wts CROSS JOIN tot),
       |ranked AS (
       |  SELECT doc_id, source,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY source
       |      ORDER BY ${hashUniformSql("doc_id")} ASC NULLS FIRST,
       |               doc_id ASC NULLS FIRST) AS INT) AS rk
       |  FROM documents)
       |SELECT doc_id, ranked.source, rk, q FROM ranked
       |JOIN quo ON ranked.source = quo.source
       |WHERE rk <= q
       |ORDER BY doc_id ASC NULLS FIRST""".stripMargin

  /** MIX7: tokenizer-aware sequence packing — mix2's streaming
    * concat-then-chunk plan driven by REAL BPE token counts (the fused
    * single-pass encode-count kernel over the fixed demo merge table)
    * instead of the synthetic whitespace `tokens` proxy: the packing a
    * pretraining job actually runs downstream of tokenizer training.
    * The count leg is hash-exact cross-engine (the oracle replays the
    * identical replace chain), so the whole train→encode→pack
    * composition stays oracle-gated. Same shuffle shape as mix2 (the
    * two-pass [[graft.operators.PrefixSum]] cumsum + one partial agg);
    * the BPE count is a narrow codegen'd map — zero added shuffles
    * (the stats pass prunes to a doc_id-only scan).
    */
  def mix7BpePacking(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.{Bpe, BpeTokenCount}
    val budget = 2048
    val text = coalesce(col("text"), lit(""))
    val counted = Q.t(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        BpeTokenCount.countCol(spark, text, Bpe.FixedMerges)
          .cast("long").as("n_tokens"))
    PrefixSum.exclusive(counted, Seq("lang"), "doc_id",
        Seq("n_tokens" -> "tokens_before"))
      .withColumn("pack_id", floor(col("tokens_before") / budget))
      .groupBy(col("lang"), col("pack_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("pack_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy(col("lang").asc, col("pack_id").asc)
  }

  val mix7Oracle: String = {
    import graft.functions.Bpe
    s"""WITH s AS (
       |  SELECT doc_id, lang,
       |    regexp_replace(text, '[\\x00-\\x1F\\x7F]', '', 'g') AS t
       |  FROM documents),
       |w AS (
       |  SELECT doc_id, lang, coalesce(array_to_string(list_transform(
       |    list_filter(string_split(t, ' '), x -> x <> ''),
       |    x -> regexp_replace(x, '([\\s\\S])', chr(1)||'\\1'||chr(1), 'g')
       |         || chr(1)||chr(2)||chr(1)), ''), '') AS wr
       |  FROM s),
       |toks AS (
       |  SELECT doc_id, lang,
       |    CAST((length(e) - length(replace(e, chr(1), ''))) / 2
       |      AS BIGINT) AS n_tokens
       |  FROM (SELECT doc_id, lang,
       |    ${Bpe.fixedMergesDuckSql("wr")} AS e FROM w)),
       |packed AS (
       |  SELECT doc_id, lang, n_tokens,
       |    CAST(floor(COALESCE(SUM(n_tokens) OVER (PARTITION BY lang
       |      ORDER BY doc_id ASC NULLS FIRST
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 2048)
       |      AS BIGINT) AS pack_id
       |  FROM toks)
       |SELECT lang, pack_id, COUNT(*) AS n_docs,
       |  CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
       |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
       |FROM packed
       |GROUP BY lang, pack_id
       |ORDER BY lang ASC NULLS FIRST, pack_id ASC NULLS FIRST""".stripMargin
  }

  /** MIX8: the end-to-end curation recipe in ONE query — exact dedup
    * (first doc per content hash), quality-gate (the tx_quality_score
    * signal ≥ 0.5), then BPE-token sequence packing per language: the
    * dedup → filter → tokenize → pack chain a pretraining data job
    * actually runs, each leg individually hash-exact cross-engine so
    * the whole composition stays oracle-gated. Shuffle profile at
    * 100 TB: one hash shuffle on the content fingerprint (dedup, a
    * HIGH-cardinality window key — fine), then the two-pass
    * [[graft.operators.PrefixSum]] cumsum for the pack (bucketed from
    * the RAW table's doc_id range, so the stats pass never re-runs the
    * dedup) — the quality gate and token count are narrow codegen'd
    * maps between them.
    */
  def mix8CurationPipeline(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.{Bpe, BpeTokenCount}
    val budget = 2048
    val wDedup = Window.partitionBy(md5(col("text").cast("binary")))
      .orderBy(col("doc_id").asc)
    val surv = Q.t(spark, dir, "documents")
      .withColumn("_rn", row_number().over(wDedup))
      .filter(col("_rn") === 1).drop("_rn")
    val quality =
      lit(0.5) * least(length(col("text")).cast("double") / lit(400.0), lit(1.0)) +
        lit(0.3) * TextFunctions.stopwordRatio(col("text")) +
        lit(0.2) * (lit(1.0) - TextFunctions.punctRatio(col("text")))
    val keep = surv.filter(quality >= 0.5)
    val text = coalesce(col("text"), lit(""))
    val counted = keep.select(col("doc_id"), col("lang"),
      BpeTokenCount.countCol(spark, text, Bpe.FixedMerges)
        .cast("long").as("n_tokens"))
    PrefixSum.exclusive(counted, Seq("lang"), "doc_id",
        Seq("n_tokens" -> "tokens_before"),
        statsOf = Some(Q.t(spark, dir, "documents")))
      .withColumn("pack_id", floor(col("tokens_before") / budget))
      .groupBy(col("lang"), col("pack_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("pack_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy(col("lang").asc, col("pack_id").asc)
  }

  val mix8Oracle: String = {
    import graft.functions.Bpe
    s"""WITH surv AS (
       |  SELECT doc_id, lang, text FROM (
       |    SELECT doc_id, lang, text,
       |      ROW_NUMBER() OVER (PARTITION BY md5(text)
       |        ORDER BY doc_id ASC NULLS FIRST) AS rn
       |    FROM documents)
       |  WHERE rn = 1),
       |keep AS (
       |  SELECT doc_id, lang, text FROM surv
       |  WHERE 0.5 * least(CAST(len(text) AS DOUBLE) / 400.0, 1.0)
       |    + 0.3 * (CAST(len(list_filter(string_split(text, ' '),
       |        w -> w IN ('the','a','an','of','and','or','to','in','is','it'))) AS DOUBLE)
       |        / len(string_split(text, ' ')))
       |    + 0.2 * (1.0 - CAST(len(text) - len(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
       |        / len(text)) >= 0.5),
       |w AS (
       |  SELECT doc_id, lang, coalesce(array_to_string(list_transform(
       |    list_filter(string_split(regexp_replace(text, '[\\x00-\\x1F\\x7F]', '', 'g'), ' '), x -> x <> ''),
       |    x -> regexp_replace(x, '([\\s\\S])', chr(1)||'\\1'||chr(1), 'g')
       |         || chr(1)||chr(2)||chr(1)), ''), '') AS wr
       |  FROM keep),
       |toks AS (
       |  SELECT doc_id, lang,
       |    CAST((length(e) - length(replace(e, chr(1), ''))) / 2
       |      AS BIGINT) AS n_tokens
       |  FROM (SELECT doc_id, lang,
       |    ${Bpe.fixedMergesDuckSql("wr")} AS e FROM w)),
       |packed AS (
       |  SELECT doc_id, lang, n_tokens,
       |    CAST(floor(COALESCE(SUM(n_tokens) OVER (PARTITION BY lang
       |      ORDER BY doc_id ASC NULLS FIRST
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 2048)
       |      AS BIGINT) AS pack_id
       |  FROM toks)
       |SELECT lang, pack_id, COUNT(*) AS n_docs,
       |  CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
       |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
       |FROM packed
       |GROUP BY lang, pack_id
       |ORDER BY lang ASC NULLS FIRST, pack_id ASC NULLS FIRST""".stripMargin
  }

  /** MIX9: data-constrained epoch schedule — the repeat-factor plan a
    * token-budgeted pretraining run computes when sources are smaller
    * than their budget share (the Muennighoff et al. 2023
    * data-constrained regime, integer form): each source gets an equal
    * integer share of the budget; its epoch count is the least e with
    * e·n_tokens ≥ share, capped at 4 (the diminishing-returns cap);
    * served = min(share, epochs·n_tokens), so a source too small even
    * at 4 epochs under-delivers VISIBLY. All integer floor/ceil math —
    * bit-reproducible and hash-exact cross-engine; both regimes
    * (cap-bound and share-bound) occur at the chosen budget.
    *
    * Scale: one map-side-combined agg to (source) grain + a broadcast
    * of the 1-row source count — nothing else touches the corpus.
    */
  def mix9EpochSchedule(spark: SparkSession, dir: String): DataFrame = {
    val budget = 120000L
    val toks = Q.t(spark, dir, "documents")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(TextFunctions.tokens(col("text"))).cast("long"))
          .as("n_tokens"))
    val ns = toks.agg(count(lit(1)).as("n_sources"))
    val planned = toks.crossJoin(broadcast(ns))
      .withColumn("share", expr(s"$budget div n_sources"))
      .withColumn("epochs",
        least(lit(4L), expr("(share + n_tokens - 1) div n_tokens")))
      .withColumn("served_tokens",
        least(col("share"), col("epochs") * col("n_tokens")))
    planned.select(col("source"), col("n_docs"), col("n_tokens"),
        col("epochs"), col("served_tokens"))
      .orderBy(col("source").asc)
  }

  val mix9Oracle: String =
    """WITH toks AS (
      |  SELECT source, COUNT(*) AS n_docs,
      |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY 1),
      |ns AS (SELECT COUNT(*) AS n_sources FROM toks),
      |plan AS (
      |  SELECT source, n_docs, n_tokens,
      |    CAST(120000 // n_sources AS BIGINT) AS share
      |  FROM toks CROSS JOIN ns)
      |SELECT source, n_docs, n_tokens,
      |  CAST(LEAST(4, (share + n_tokens - 1) // n_tokens) AS BIGINT)
      |    AS epochs,
      |  CAST(LEAST(share,
      |    LEAST(4, (share + n_tokens - 1) // n_tokens) * n_tokens)
      |    AS BIGINT) AS served_tokens
      |FROM plan
      |ORDER BY source ASC NULLS FIRST""".stripMargin

  /** MIX10: length-bucketed batch planning — group docs into
    * power-of-two token-length buckets and pack each bucket into
    * fixed-size batches in doc_id order: the padded-batch schedule a
    * fine-tuning/eval job runs so each batch pads only to its own
    * max length (batching similar lengths is the standard answer to
    * padding waste). Reports each batch's pad length (its max token
    * count) and the padding the schedule pays.
    *
    * Scale: the length bucket is LOW-cardinality (~log2(max tokens)
    * values, Zipf-heavy), so the per-bucket row number is the
    * two-pass [[graft.operators.PrefixSum]] distributed cumsum —
    * never a per-bucket window over raw doc rows. The bucket id is
    * pure integer math (`length(bin(n)) - 1`, i.e. floor(log2 n)
    * without the float log whose rounding could drift cross-engine),
    * so the whole plan is bit-exact against the oracle.
    */
  def mix10LengthBatching(spark: SparkSession, dir: String): DataFrame = {
    val batch = 32L
    val counted = Q.t(spark, dir, "documents")
      .select(col("doc_id"),
        size(TextFunctions.tokens(coalesce(col("text"), lit(""))))
          .cast("long").as("n_tokens"))
      .withColumn("len_bucket",
        (length(bin(col("n_tokens"))) - 1).cast("long"))
      .withColumn("one", lit(1L))
    PrefixSum.exclusive(counted, Seq("len_bucket"), "doc_id",
        Seq("one" -> "rows_before"))
      .withColumn("batch_id", floor(col("rows_before") / batch))
      .groupBy(col("len_bucket"), col("batch_id"))
      .agg(count(lit(1)).as("n_docs"),
        max(col("n_tokens")).as("pad_len"),
        sum(col("n_tokens")).as("batch_tokens"))
      .withColumn("padding_waste",
        col("n_docs") * col("pad_len") - col("batch_tokens"))
      .orderBy(col("len_bucket").asc, col("batch_id").asc)
  }

  val mix10Oracle: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    CAST(len(string_split(coalesce(text, ''), ' ')) AS BIGINT)
      |      AS n_tokens
      |  FROM documents),
      |b AS (
      |  SELECT doc_id, n_tokens,
      |    CAST(length(bin(n_tokens)) - 1 AS BIGINT) AS len_bucket
      |  FROM toks),
      |rn AS (
      |  SELECT doc_id, n_tokens, len_bucket,
      |    ROW_NUMBER() OVER (PARTITION BY len_bucket
      |      ORDER BY doc_id ASC NULLS FIRST) - 1 AS rb
      |  FROM b)
      |SELECT len_bucket, CAST(rb // 32 AS BIGINT) AS batch_id,
      |  COUNT(*) AS n_docs, MAX(n_tokens) AS pad_len,
      |  CAST(SUM(n_tokens) AS BIGINT) AS batch_tokens,
      |  CAST(COUNT(*) * MAX(n_tokens) - SUM(n_tokens) AS BIGINT)
      |    AS padding_waste
      |FROM rn
      |GROUP BY len_bucket, batch_id
      |ORDER BY len_bucket ASC NULLS FIRST, batch_id ASC NULLS FIRST"""
      .stripMargin

  /** MIX11: soft dedup — instead of hard-dropping every non-survivor
    * of a near-dup cluster (d15), keep each member with probability
    * 1/|cluster|, so the EXPECTED surviving mass of every distinct
    * content is exactly one copy while which copy survives stays
    * unbiased (the rehydration-friendly policy large-corpus curation
    * uses when near-dups differ in usable ways — formatting, source
    * mix). Deterministic: the coin is mix1's md5-uniform on doc_id,
    * so reruns keep the same docs and the whole query — LSH pairs
    * (d3b's md5-exact form, J ≥ 0.5), connected components, cluster
    * sizes, weights, coins — reproduces bit-for-bit in the oracle.
    *
    * Scale: pairs from the banded LSH equi-join (never all-pairs),
    * clusters from the bounded-round CC engine, sizes one keyed agg
    * on cluster_id (high-cardinality), the coin a narrow projection.
    * Nothing here windows or sorts a low-cardinality key.
    */
  def mix11SoftDedup(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.d3bMinhashExact(spark, dir)
      .filter(col("jaccard") >= 0.5)
    val cl = graft.functions.DedupOps
      .connectedComponents(pairs, "id_a", "id_b")
      .select(col("node").as("doc_id"), col("cluster_id"))
    val member = Q.t(spark, dir, "documents")
      .select(col("doc_id"))
      .join(cl, Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
    val sizes = member.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("csize"))
    member.join(sizes, Seq("cluster_id"))
      .withColumn("weight", lit(1.0) / col("csize"))
      .withColumn("keep", hashUniform(col("doc_id")) < col("weight"))
      .select(col("doc_id"), col("cluster_id"), col("csize"),
        col("weight"), col("keep"))
      .orderBy(col("doc_id").asc)
  }

  val mix11Oracle: String =
    s"""WITH RECURSIVE ${Dedup.d3bCtes},
       |dup_pairs AS (
       |  SELECT c.id_a, c.id_b
       |  FROM cands c
       |  LEFT JOIN inter t ON c.id_a = t.ia AND c.id_b = t.ib
       |  JOIN sizes sa ON sa.doc_id = c.id_a
       |  JOIN sizes sb ON sb.doc_id = c.id_b
       |  WHERE CAST(COALESCE(t.cnt, 0) AS DOUBLE)
       |      / CAST(sa.n + sb.n - COALESCE(t.cnt, 0) AS DOUBLE) >= 0.5),
       |edges AS (
       |  SELECT id_a AS a, id_b AS b FROM dup_pairs
       |  UNION SELECT id_b, id_a FROM dup_pairs),
       |reach(node, r) AS (
       |  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
       |  UNION
       |  SELECT e.a, r.r FROM edges e JOIN reach r ON r.node = e.b),
       |cl AS (
       |  SELECT node AS doc_id, MIN(r) AS cluster_id FROM reach
       |  GROUP BY node),
       |member AS (
       |  SELECT d.doc_id, COALESCE(cl.cluster_id, d.doc_id) AS cluster_id
       |  FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id),
       |csz AS (
       |  SELECT cluster_id, COUNT(*) AS csize FROM member
       |  GROUP BY cluster_id)
       |SELECT m.doc_id, m.cluster_id, c.csize,
       |  1.0 / c.csize AS weight,
       |  ${hashUniformSql("m.doc_id")} < 1.0 / c.csize AS keep
       |FROM member m JOIN csz c USING (cluster_id)
       |ORDER BY doc_id ASC NULLS FIRST""".stripMargin

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mix11_softdedup" -> mix11SoftDedup,
    "mix10_length_batching" -> mix10LengthBatching,
    "mix9_epoch_schedule" -> mix9EpochSchedule,
    "mix6_temperature" -> mix6Temperature,
    "mix7_bpe_packing" -> mix7BpePacking,
    "mix8_curation_pipeline" -> mix8CurationPipeline,
    "mix1_hash_sample" -> mix1HashSample,
    "mix2_seq_packing" -> mix2SeqPacking,
    "mix3_quality_filter" -> mix3QualityFilter,
    "mix4_quota_sample" -> mix4QuotaSample,
    "mix5_stratified_split" -> mix5StratifiedSplit)

  override def oracles: Map[String, String] = Map(
    "mix11_softdedup" -> mix11Oracle,
    "mix10_length_batching" -> mix10Oracle,
    "mix6_temperature" -> mix6Oracle,
    "mix7_bpe_packing" -> mix7Oracle,
    "mix8_curation_pipeline" -> mix8Oracle,
    "mix1_hash_sample" -> mix1Oracle,
    "mix2_seq_packing" -> mix2Oracle,
    "mix9_epoch_schedule" -> mix9Oracle,
    "mix3_quality_filter" -> mix3Oracle,
    "mix4_quota_sample" -> mix4Oracle,
    "mix5_stratified_split" -> mix5Oracle)
}

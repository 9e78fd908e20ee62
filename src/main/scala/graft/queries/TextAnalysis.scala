package graft.queries

import graft.{Q, QueryModule}
import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators over `documents` (F8 + north-star
  * BASELINE.json: language-ID, quality scoring, token counting,
  * fingerprinting). All built from codegen-friendly built-ins; ratios
  * are integer-count / integer-count double divisions (deterministic
  * IEEE in both engines).
  *
  * Scale notes: every query is a narrow projection + per-row map +
  * bounded-cardinality aggregate — embarrassingly parallel at 100 TB;
  * the explode in the bigram query fans out ~n_tokens× but aggregates
  * with partial combine before the shuffle.
  */
object TextAnalysis extends QueryModule {

  /** F8a: token counting — whitespace and BPE-ish regex tokenizers. */
  def txTokenStats(spark: SparkSession, dir: String): DataFrame =
    Q.fanOut(Q.t(spark, dir, "documents"))
      .select(
        col("doc_id"),
        size(tokens(col("text"))).as("n_tokens"),
        size(bpeTokens(col("text"))).as("n_bpe_tokens"),
        size(array_distinct(tokens(col("text")))).as("n_unique_tokens"),
        meanTokenLen(col("text")).as("mean_token_len"))
      .orderBy(col("doc_id").asc)

  val txTokenStatsOracle: String =
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
      |  CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS INT) AS n_bpe_tokens,
      |  CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_unique_tokens,
      |  CAST(list_reduce(list_prepend(0, list_transform(string_split(text, ' '), w -> len(w))), (a, b) -> a + b) AS DOUBLE)
      |    / len(string_split(text, ' ')) AS mean_token_len
      |FROM documents
      |ORDER BY doc_id ASC NULLS FIRST""".stripMargin

  /** F8b: quality scoring — length/punctuation/stopword signals
    * combined into one deterministic score.
    */
  def txQualityScore(spark: SparkSession, dir: String): DataFrame = {
    val sw = stopwordRatio(col("text"))
    val punct = punctRatio(col("text"))
    val lenScore = least(length(col("text")).cast("double") / lit(400.0), lit(1.0))
    Q.t(spark, dir, "documents")
      .select(
        col("doc_id"), col("lang"),
        sw.as("stopword_ratio"),
        punct.as("punct_ratio"),
        lenScore.as("len_score"),
        (lit(0.5) * lenScore + lit(0.3) * sw + lit(0.2) * (lit(1.0) - punct))
          .as("quality"))
      .orderBy(col("doc_id").asc)
  }

  val txQualityScoreOracle: String =
    """WITH sig AS (
      |  SELECT doc_id, lang,
      |    CAST(len(list_filter(string_split(text, ' '),
      |      w -> w IN ('the','a','an','of','and','or','to','in','is','it'))) AS DOUBLE)
      |      / len(string_split(text, ' ')) AS stopword_ratio,
      |    CAST(len(text) - len(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
      |      / len(text) AS punct_ratio,
      |    least(CAST(len(text) AS DOUBLE) / 400.0, 1.0) AS len_score
      |  FROM documents)
      |SELECT doc_id, lang, stopword_ratio, punct_ratio, len_score,
      |  0.5 * len_score + 0.3 * stopword_ratio + 0.2 * (1.0 - punct_ratio) AS quality
      |FROM sig
      |ORDER BY doc_id ASC NULLS FIRST""".stripMargin

  /** F8c: language-ID heuristic — marker-set hits per language,
    * argmax with fixed priority tie-break (CASE order).
    */
  def txLangId(spark: SparkSession, dir: String): DataFrame = {
    val langs = Seq("de", "en", "es", "fr", "zh")
    val hits = langs.map(l => l -> markerHits(col("text"), l)).toMap
    val predicted = langs.foldRight(lit("und"): org.apache.spark.sql.Column) {
      case (l, elseCol) =>
        val isMax = langs.filterNot(_ == l)
          .map(o => hits(l) >= hits(o)).reduce(_ && _)
        when(hits(l) > 0 && isMax, lit(l)).otherwise(elseCol)
    }
    Q.t(spark, dir, "documents")
      .select(
        col("doc_id"), col("lang").as("labeled_lang"),
        predicted.as("predicted_lang"),
        hits("en").as("en_hits"), hits("de").as("de_hits"))
      .withColumn("agrees", col("predicted_lang") === col("labeled_lang"))
      .orderBy(col("doc_id").asc)
  }

  private def hitsSql(lang: String): String = {
    val set = langMarkers(lang).map(w => s"'$w'").mkString(", ")
    s"len(list_intersect(list_distinct(string_split(text, ' ')), [$set]))"
  }

  val txLangIdOracle: String = {
    val langs = Seq("de", "en", "es", "fr", "zh")
    val pred = langs.foldRight("'und'") { case (l, els) =>
      val isMax = langs.filterNot(_ == l)
        .map(o => s"${hitsSql(l)} >= ${hitsSql(o)}").mkString(" AND ")
      s"CASE WHEN ${hitsSql(l)} > 0 AND $isMax THEN '$l' ELSE $els END"
    }
    s"""SELECT doc_id, lang AS labeled_lang, $pred AS predicted_lang,
       |  CAST(${hitsSql("en")} AS INT) AS en_hits,
       |  CAST(${hitsSql("de")} AS INT) AS de_hits,
       |  $pred = lang AS agrees
       |FROM documents
       |ORDER BY doc_id ASC NULLS FIRST""".stripMargin
  }

  /** F8d: top word bigrams corpus-wide (n-gram generator + TF). */
  def txBigrams(spark: SparkSession, dir: String): DataFrame =
    Q.t(spark, dir, "documents")
      .select(explode(bigrams(col("text"))).as("bigram"))
      .groupBy(col("bigram"))
      .agg(count(lit(1)).as("tf"))
      .orderBy(col("tf").desc, col("bigram").asc)
      .limit(25)

  val txBigramsOracle: String =
    """SELECT t[i] || ' ' || t[i+1] AS bigram, COUNT(*) AS tf
      |FROM (SELECT string_split(text, ' ') AS t FROM documents),
      |     UNNEST(generate_series(1, len(t)-1)) AS g(i)
      |GROUP BY 1
      |ORDER BY tf DESC NULLS LAST, bigram ASC NULLS FIRST
      |LIMIT 25""".stripMargin

  /** F8j: Heaps-law vocabulary growth — distinct bigram TYPES vs
    * cumulative gram occurrences over the corpus in doc_id order,
    * checkpointed per 100-doc bucket (the tokenizer-sizing /
    * dedup-saturation diagnostic a corpus build tracks). The naive
    * form ("distinct over every prefix") is quadratic; attributing
    * each type to its FIRST occurrence (min doc_id) turns it into two
    * keyed aggregates plus a cumsum over BUCKETS — rows = corpus/100,
    * not corpus — computed with [[graft.operators.PrefixSum]]'s
    * two-pass bucketed form rather than a single-task global window,
    * so even the reduced frame never funnels through one task.
    */
  def txVocabGrowth(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.PrefixSum
    val toks = Q.t(spark, dir, "documents")
      .select(col("doc_id"), explode(bigrams(col("text"))).as("t"))
    val firsts = toks.groupBy(col("t")).agg(min(col("doc_id")).as("fd"))
    val newv = firsts.groupBy(floor(col("fd") / 100).as("bucket"))
      .agg(count(lit(1)).as("new_vocab"))
    val joined = pertokJoin(toks, newv)
    // statsOf: the bucket range from a doc_id-only scan of the raw
    // table — without it the stats probe would re-execute the full
    // bigram explode + aggregations a second time
    val statsOf = Q.t(spark, dir, "documents")
      .select(floor(col("doc_id") / 100).as("bucket"))
    PrefixSum.exclusive(joined, Seq.empty, "bucket",
        Seq("n_grams" -> "_gb", "nv" -> "_vb"), statsOf = Some(statsOf))
      .select(col("bucket"),
        (col("_gb") + col("n_grams")).as("cum_grams"),
        (col("_vb") + col("nv")).as("cum_vocab"))
      .orderBy(col("bucket").asc)
  }

  private def pertokJoin(toks: DataFrame, newv: DataFrame): DataFrame =
    toks.groupBy(floor(col("doc_id") / 100).as("bucket"))
      .agg(count(lit(1)).as("n_grams"))
      .join(newv, Seq("bucket"), "left")
      .withColumn("nv", coalesce(col("new_vocab"), lit(0L)))

  val txVocabGrowthOracle: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(list_transform(
      |    list_zip(string_split(text,' ')[1:len(string_split(text,' '))-1],
      |             string_split(text,' ')[2:len(string_split(text,' '))]),
      |    p -> p[1] || ' ' || p[2])) AS t
      |  FROM documents),
      |firsts AS (
      |  SELECT t, MIN(doc_id) AS fd FROM toks GROUP BY t),
      |newv AS (
      |  SELECT CAST(floor(fd / 100) AS BIGINT) AS bucket,
      |    COUNT(*) AS new_vocab
      |  FROM firsts GROUP BY 1),
      |pertok AS (
      |  SELECT CAST(floor(doc_id / 100) AS BIGINT) AS bucket,
      |    COUNT(*) AS n_grams
      |  FROM toks GROUP BY 1)
      |SELECT p.bucket,
      |  CAST(SUM(p.n_grams) OVER (ORDER BY p.bucket ASC NULLS FIRST
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_grams,
      |  CAST(SUM(COALESCE(n.new_vocab, 0)) OVER (ORDER BY p.bucket ASC NULLS FIRST
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_vocab
      |FROM pertok p LEFT JOIN newv n ON p.bucket = n.bucket
      |ORDER BY p.bucket ASC NULLS FIRST""".stripMargin

  /** F8e: content fingerprints — md5 is oracle-checked; the native
    * rolling-hash Expression is engine-specific and covered by
    * TextFunctionsSpec instead.
    */
  def txFingerprint(spark: SparkSession, dir: String): DataFrame =
    Q.t(spark, dir, "documents")
      .select(
        col("doc_id"),
        md5(col("text").cast("binary")).as("md5_fp"))
      .orderBy(col("doc_id").asc)

  val txFingerprintOracle: String =
    """SELECT doc_id, md5(text) AS md5_fp
      |FROM documents
      |ORDER BY doc_id ASC NULLS FIRST""".stripMargin

  /** F8h: winnowing fingerprint selection (Schleimer, Wilkerson &
    * Aiken, SIGMOD'03 — the MOSS algorithm): hash every 5-token gram,
    * slide a w=4 window over the hash sequence, keep the MINIMUM hash
    * per window (rightmost on ties), dedupe selected positions. The
    * guarantee: any shared substring of ≥ 8 tokens yields at least one
    * SHARED selected fingerprint — document-level containment
    * detection at ~1/4 the fingerprint density of d10's every-span
    * pass. Output: per-doc fingerprint count + order-independent XOR
    * checksum of the selected hashes.
    *
    * Cross-engine exactness: gram hashes are md5-derived 60-bit ints
    * (the l20 technique — no engine-specific hash), window selection
    * is an integer argmin with a deterministic tie-break, the
    * checksum is bit_xor. Scale shape: grams explode once, the w-fan
    * is a bounded ≤4× row multiply inside one doc-keyed shuffle, and
    * the argmin is a row_number over (doc, window) — never a
    * corpus-wide pass.
    */
  def txWinnow(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val k = 5 // gram size (tokens)
    val w = 4 // winnow window (grams)
    // Winnowing is DOCUMENT-LOCAL, so the whole selection runs as one
    // narrow mapPartitions pass: per doc, hash each k-gram (md5 over
    // the gram's BYTE SLICE — single-space tokens make gram p..p+k-1
    // a contiguous range of the original string, the WordBigrams
    // trick), slide the w-window keeping the min (rightmost on ties),
    // dedup selected positions, emit (count, xor). The previous
    // declarative form exploded every gram into its ≤w windows and
    // ranked a (doc, window)-keyed row_number — a 4× row fan plus a
    // corpus-wide window sort for what one in-partition loop computes;
    // at sf1 that was the heaviest non-build query (16.2s → this).
    // Hashes stay md5-derived 60-bit ints, bit-identical to the
    // DuckDB oracle (MessageDigest MD5 ≡ Spark md5 ≡ DuckDB md5).
    Q.t(spark, dir, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val md = graft.functions.GramHashes.newDigest()
        it.flatMap { case (id, text) =>
          val h = graft.functions.GramHashes.hashes(md, text, k)
          val nGrams = h.length
          if (nGrams < w) Iterator.empty
          else {
            // slide: min of h[s..s+w-1], rightmost on ties; the winner
            // index is non-decreasing (robust winnowing), but a bitset
            // dedup keeps correctness independent of that property
            val picked = new java.util.BitSet(nGrams)
            var nFp = 0L
            var xor = 0L
            var s = 0
            while (s <= nGrams - w) {
              var best = s
              var q = s + 1
              while (q < s + w) {
                if (h(q) < h(best) || (h(q) == h(best) && q > best)) best = q
                q += 1
              }
              if (!picked.get(best)) {
                picked.set(best)
                nFp += 1
                xor ^= h(best)
              }
              s += 1
            }
            Iterator.single((id, nFp, xor))
          }
        }
      }
      .toDF("doc_id", "n_fp", "fp_checksum")
      .orderBy(col("doc_id").asc)
  }

  val txWinnowOracle: String =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |grams AS (
      |  SELECT doc_id, i - 1 AS p,
      |    CAST(('0x' || substr(md5(array_to_string(t[i:i+4], ' ')), 1, 15)) AS BIGINT) AS h
      |  FROM toks, UNNEST(generate_series(1, len(t) - 4)) AS g(i)),
      |mx AS (SELECT doc_id, MAX(p) AS max_p FROM grams GROUP BY 1),
      |fan AS (
      |  SELECT doc_id, p, h, s
      |  FROM grams, UNNEST(generate_series(GREATEST(p - 3, 0), p)) AS w(s)),
      |ranked AS (
      |  SELECT f.doc_id, f.p, f.h,
      |    ROW_NUMBER() OVER (PARTITION BY f.doc_id, f.s
      |      ORDER BY f.h ASC, f.p DESC) AS rn
      |  FROM fan f JOIN mx ON f.doc_id = mx.doc_id
      |  WHERE f.s <= mx.max_p - 3),
      |sel AS (SELECT DISTINCT doc_id, p, h FROM ranked WHERE rn = 1)
      |SELECT doc_id, COUNT(*) AS n_fp, bit_xor(h) AS fp_checksum
      |FROM sel GROUP BY doc_id
      |ORDER BY doc_id ASC NULLS FIRST""".stripMargin

  /** F8f: tf-idf term scoring — the inverted-index relevance score
    * (search/retrieval over the corpus). Classic shape: explode to
    * (doc, term, tf), document frequency per term, join, score, top-3
    * per doc. Rational idf damping `(N+1)/(df+1)` instead of
    * `ln(N/df)`: identical ranking direction, but exact IEEE division
    * in both engines (ln can differ in the last ulp and flip a
    * rounded tie cross-engine).
    *
    * Scale notes: tf and df are both partial-combine hash aggregates.
    * The tf⋈df join is left to AQE: at test scale df (vocab) is tiny
    * and auto-broadcasts; at web scale vocab is GBs and the right plan
    * is a shuffle join on term — a hard-coded broadcast hint would be
    * the 100 TB mistake.
    */
  def txTfIdf(spark: SparkSession, dir: String): DataFrame = {
    val docs = Q.t(spark, dir, "documents")
    val n = docs.agg(countDistinct(col("doc_id")).as("n"))
    val terms = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    val tf = terms.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df_ = terms.select(col("doc_id"), col("term")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term").asc)
    tf.join(df_, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("score",
        col("tf").cast("double") * (col("n") + 1).cast("double")
          / (col("df") + 1).cast("double"))
      .filter(col("doc_id") < 30)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("doc_id"), col("rk"), col("term"), col("score"))
      .orderBy(col("doc_id").asc, col("rk").asc)
  }

  val txTfIdfOracle: String =
    """WITH terms AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY 1, 2),
      |df AS (SELECT term, COUNT(*) AS df
      |       FROM (SELECT DISTINCT doc_id, term FROM terms) GROUP BY 1),
      |n AS (SELECT COUNT(DISTINCT doc_id) AS n FROM documents),
      |scored AS (
      |  SELECT tf.doc_id, tf.term,
      |    CAST(tf.tf AS DOUBLE) * CAST(n.n + 1 AS DOUBLE)
      |      / CAST(df.df + 1 AS DOUBLE) AS score
      |  FROM tf JOIN df USING (term) CROSS JOIN n
      |  WHERE tf.doc_id < 30)
      |SELECT doc_id, rk, term, score FROM (
      |  SELECT doc_id, term, score,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
      |      ORDER BY score DESC NULLS LAST, term ASC NULLS FIRST) AS INT) AS rk
      |  FROM scored)
      |WHERE rk <= 3
      |ORDER BY doc_id ASC NULLS FIRST, rk ASC NULLS FIRST""".stripMargin

  /** F8g: PII scrubbing — regex redaction of emails, US-SSN-shaped
    * digit groups, and a configurable term blocklist, with a per-doc
    * redaction count. The pattern set sticks to RE2-compatible syntax
    * (classes, alternation, word boundaries — no lookaround) so the
    * same pattern runs on Spark (Java regex), RE2 engines, and the
    * DuckDB oracle. Narrow projection + per-row regex → embarrassingly
    * parallel, no shuffle until the final order.
    */
  private val piiPattern =
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" + // email
      "|\\d{3}-\\d{2}-\\d{4}" +                         // SSN-shaped
      "|\\b(customer|merge)\\b"                         // term blocklist

  def txPiiRedact(spark: SparkSession, dir: String): DataFrame =
    Q.fanOut(Q.t(spark, dir, "documents"))
      .select(col("doc_id"), col("lang"),
        regexp_replace(col("text"), piiPattern, "[REDACTED]").as("clean_text"),
        (size(split(col("text"), piiPattern, -1)) - 1).as("n_redactions"))
      .withColumn("clean_md5", md5(col("clean_text").cast("binary")))
      .drop("clean_text")
      .orderBy(col("doc_id").asc)

  val txPiiRedactOracle: String = {
    // single-quoted SQL literal: backslashes stay, quotes double
    val pat = piiPattern.replace("'", "''")
    s"""SELECT doc_id, lang,
       |  CAST(len(string_split_regex(text, '$pat')) - 1 AS INT) AS n_redactions,
       |  md5(regexp_replace(text, '$pat', '[REDACTED]', 'g')) AS clean_md5
       |FROM documents
       |ORDER BY doc_id ASC NULLS FIRST""".stripMargin
  }

  /** F8h: repetition signals (Gopher/RefinedWeb-style quality
    * filtering) — fraction of tokens that are the single most frequent
    * token, and fraction of duplicate bigrams. High values flag
    * boilerplate/spam for removal before pretraining. top-token needs
    * one explode + two hash-aggs (partial-combined); the bigram ratio
    * is per-row array math — no shuffle.
    */
  def txRepetition(spark: SparkSession, dir: String): DataFrame = {
    // docs under 2 tokens have no bigrams: Spark would emit NULL
    // dup_bigram_frac while the oracle's inner join would drop the doc
    // — restrict BOTH sides to docs where the signals are defined
    val docs = Q.t(spark, dir, "documents")
      .filter(size(tokens(col("text"))) >= 2)
    val topTok = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(max(col("c")).as("top_c"), sum(col("c")).as("n_tok"))
      .select(col("doc_id"),
        (col("top_c").cast("double") / col("n_tok")).as("top_token_frac"))
    val dupBigram = docs.select(col("doc_id"), col("lang"),
      (lit(1.0) - size(array_distinct(bigrams(col("text")))).cast("double") /
        size(bigrams(col("text")))).as("dup_bigram_frac"))
    dupBigram.join(topTok, Seq("doc_id"))
      .withColumn("flagged",
        col("top_token_frac") > 0.2 || col("dup_bigram_frac") > 0.5)
      .select("doc_id", "lang", "top_token_frac", "dup_bigram_frac", "flagged")
      .orderBy(col("doc_id").asc)
  }

  val txRepetitionOracle: String =
    """WITH d2 AS (
      |  SELECT * FROM documents WHERE len(string_split(text, ' ')) >= 2),
      |tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM d2),
      |top AS (
      |  SELECT doc_id, CAST(MAX(c) AS DOUBLE) / SUM(c) AS top_token_frac
      |  FROM (SELECT doc_id, w, COUNT(*) AS c FROM tok GROUP BY 1, 2)
      |  GROUP BY doc_id),
      |bg AS (
      |  SELECT doc_id, t[i] || ' ' || t[i+1] AS bigram
      |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM d2),
      |       UNNEST(generate_series(1, len(t)-1)) AS g(i)),
      |dup AS (
      |  SELECT doc_id,
      |    1.0 - CAST(COUNT(DISTINCT bigram) AS DOUBLE) / COUNT(*) AS dup_bigram_frac
      |  FROM bg GROUP BY doc_id)
      |SELECT d.doc_id, d.lang, top.top_token_frac, dup.dup_bigram_frac,
      |  top.top_token_frac > 0.2 OR dup.dup_bigram_frac > 0.5 AS flagged
      |FROM d2 d JOIN top ON d.doc_id = top.doc_id
      |JOIN dup ON d.doc_id = dup.doc_id
      |ORDER BY d.doc_id ASC NULLS FIRST""".stripMargin

  /** F8g: corpus-LM familiarity score — the CCNet/KenLM quality-
    * filtering pattern (score each doc by how well a corpus n-gram
    * model predicts it) in an oracle-exact form: per bigram,
    * add-one-smoothed conditional probability p = (c(w1,w2)+1) /
    * (c(w1)+V), carried as INTEGER parts-per-billion via BIGINT floor
    * division — no transcendentals, no float summation order — and
    * averaged per doc with ONE final double division. Low scores mark
    * out-of-distribution/garbled docs, the signal LM-based quality
    * filters threshold on.
    *
    * Scale shape: two count aggregations (bigram, unigram — both
    * map-side combined), one scalar vocab count, two equi-joins keyed
    * by token text (the natural shard key; a stopword's count row is
    * one row, not a skew source), one per-doc aggregation.
    */
  def txLmScore(spark: SparkSession, dir: String): DataFrame = {
    val docs = Q.t(spark, dir, "documents")
    val toks = docs.select(col("doc_id"), explode(tokens(col("text"))).as("w1"))
    // bigram occurrences as the native byte-slice strings ("w1 w2")
    // rather than (w1,w2) structs: the WordBigrams kernel stays in
    // whole-stage codegen (the transform(sequence)/element_at struct
    // form it replaces interprets a lambda per token), the group key
    // is one string instead of two, and w1 is recoverable from the
    // DISTINCT-bigram table alone via substring_index — never from
    // the corpus-scale occurrence stream
    val bgOcc = docs.select(col("doc_id"),
      explode(bigrams(col("text"))).as("bg"))
    val c1 = toks.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val c2 = bgOcc.groupBy(col("bg")).agg(count(lit(1)).as("c2"))
    val vocab = toks.select(countDistinct(col("w1")).as("v"))
    // enrich the DISTINCT-bigram table once (vocab-sized joins), then
    // hit the big occurrence stream with a single equi-join — joining
    // occurrences twice would shuffle the corpus-scale stream two
    // extra times for the same answer
    val probs = c2
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .join(c1, Seq("w1")).crossJoin(vocab) // vocab is 1 row
      .select(col("bg"),
        expr("((c2 + 1) * 1000000000L) div (c1 + v)").as("ppb"))
    bgOcc
      .join(probs, Seq("bg"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        (sum(col("ppb")).cast("double") / count(lit(1))).as("familiarity_ppb"))
      .orderBy(col("doc_id").asc)
  }

  val txLmScoreOracle: String =
    """WITH toks AS (
      |  SELECT doc_id, UNNEST(string_split(text, ' ')) AS w1 FROM documents),
      |bigrams AS (
      |  SELECT doc_id, t[i] AS w1, t[i+1] AS w2
      |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |       UNNEST(generate_series(1, len(t)-1)) AS g(i)),
      |c1 AS (SELECT w1, COUNT(*) AS c1 FROM toks GROUP BY w1),
      |c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM bigrams GROUP BY w1, w2),
      |vocab AS (SELECT COUNT(DISTINCT w1) AS v FROM toks)
      |SELECT doc_id, COUNT(*) AS n_bigrams,
      |  CAST(SUM((c2 + 1) * 1000000000 // (c1 + v)) AS DOUBLE) / COUNT(*)
      |    AS familiarity_ppb
      |FROM bigrams JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN vocab
      |GROUP BY doc_id
      |ORDER BY doc_id ASC NULLS FIRST""".stripMargin

  /** TX-NORM: corpus canonicalization through the native
    * [[graft.functions.TextNormalize]] expression (NFC + control-char
    * strip + whitespace collapse + trim) — the pre-tokenization pass
    * that makes composed/decomposed Unicode fingerprint identically.
    * One codegen'd string pass per row; the oracle mirrors the exact
    * transform with DuckDB's nfc_normalize + regexp_replace chain.
    */
  def txNormalize(spark: SparkSession, dir: String): DataFrame =
    Q.t(spark, dir, "documents")
      .select(col("doc_id"),
        graft.functions.TextNormalize.normalize(spark, col("text"))
          .as("clean"))
      .withColumn("n_chars_clean", length(col("clean")))
      .orderBy(col("doc_id").asc)

  val txNormalizeOracle: String =
    """SELECT doc_id,
      |  trim(regexp_replace(
      |    regexp_replace(nfc_normalize(text),
      |      '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g'),
      |    '[ \t\n\r]+', ' ', 'g')) AS clean,
      |  CAST(length(trim(regexp_replace(
      |    regexp_replace(nfc_normalize(text),
      |      '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g'),
      |    '[ \t\n\r]+', ' ', 'g'))) AS INT) AS n_chars_clean
      |FROM documents
      |ORDER BY doc_id ASC NULLS FIRST""".stripMargin

  /** TX-BPE2: byte-pair encoding with a FIXED merge list
    * ([[graft.functions.Bpe.FixedMerges]]) — per-doc symbol counts
    * before/after merging plus the full encoded token stream. The
    * bracketed-string representation makes each merge one codegen'd
    * literal replace whose left-to-right scan is canonical BPE greedy
    * order; the oracle replays the IDENTICAL replace chain in DuckDB,
    * so the encoded text is hash-exact cross-engine. Narrow per-row
    * map — embarrassingly parallel at any scale.
    */
  def txBpeEncode(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.{Bpe, BpeEncode, BpeSymCount}
    // fused codegen kernels (BpeExpr.scala): ONE text walk instead of
    // a per-code-point regex wrap + a full-string copy per merge —
    // byte-identical to the composed form (BpeSpec parity gate), so
    // the DuckDB oracle still replays the replace chain unchanged.
    // Token count derives from the encoded stream: tokens are
    // space-joined and never contain spaces.
    // coalesce: the oracle's wr-CTE maps NULL text to '' (DuckDB list
    // ops on NULL), so the Spark side must too — 0 counts, '' stream
    val text = coalesce(col("text"), lit(""))
    val enc = BpeEncode.encodeCol(spark, text, Bpe.FixedMerges)
    Q.t(spark, dir, "documents")
      .select(
        col("doc_id"),
        BpeSymCount.countCol(spark, text).as("n_chars_syms"),
        enc.as("bpe_text"))
      .withColumn("n_bpe_tokens",
        when(length(col("bpe_text")) === 0, lit(0)).otherwise(
          length(col("bpe_text"))
            - length(replace(col("bpe_text"), lit(" "), lit(""))) + 1)
          .cast("int"))
      .select(col("doc_id"), col("n_chars_syms"), col("n_bpe_tokens"),
        col("bpe_text"))
      .orderBy(col("doc_id").asc)
  }

  val txBpeEncodeOracle: String = {
    import graft.functions.Bpe
    s"""WITH s AS (
       |  SELECT doc_id,
       |    regexp_replace(text, '[\\x00-\\x1F\\x7F]', '', 'g') AS t
       |  FROM documents),
       |w AS (
       |  -- coalesce: DuckDB array_to_string([]) is NULL, Spark
       |  -- concat_ws is '' — align the empty-doc edge
       |  SELECT doc_id, coalesce(array_to_string(list_transform(
       |    list_filter(string_split(t, ' '), x -> x <> ''),
       |    x -> regexp_replace(x, '([\\s\\S])', chr(1)||'\\1'||chr(1), 'g')
       |         || chr(1)||chr(2)||chr(1)), ''), '') AS wr
       |  FROM s),
       |m AS (
       |  SELECT doc_id, wr, ${Bpe.fixedMergesDuckSql("wr")} AS enc
       |  FROM w)
       |SELECT doc_id,
       |  CAST((length(wr) - length(replace(wr, chr(1), ''))) / 2 AS INT)
       |    AS n_chars_syms,
       |  CAST((length(enc) - length(replace(enc, chr(1), ''))) / 2 AS INT)
       |    AS n_bpe_tokens,
       |  replace(array_to_string(
       |    string_split(trim(enc, chr(1)), chr(1)||chr(1)), ' '),
       |    chr(2), '</w>') AS bpe_text
       |FROM m
       |ORDER BY doc_id ASC NULLS FIRST""".stripMargin
  }

  /** TX-BPE3: BYTE-LEVEL byte-pair encoding ([[graft.functions.Bpe
    * .wrapTextBytes]], the GPT-2 byte-fallback model) with a fixed
    * merge list: base symbols are each word's UTF-8 bytes as uppercase
    * hex pairs — a 256-symbol alphabet that covers EVERY input, so the
    * tokenizer can never hit OOV (multi-byte code points start as
    * several byte symbols that merges may rejoin). Same bracketed
    * replace-chain encode as tx_bpe_encode, so the oracle replays the
    * identical chain over DuckDB's `hex(encode(w))` — both engines
    * emit uppercase hex — and the token stream is hash-exact. Narrow
    * per-row map, embarrassingly parallel; the byte-level TRAINER
    * (both tiers) is gated in BpeSpec against a serial reference.
    */
  def txBpeBytes(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Bpe
    val text = coalesce(col("text"), lit(""))
    // fan-out before the merge-chain encode: per-row regexp chains are
    // CPU-heavy and the corpus scan plans one task per row group
    // (guide §2.5) — measured 3.2 s on one core vs ~0.4 s across 32
    Q.fanOut(Q.t(spark, dir, "documents"))
      .select(col("doc_id"), Bpe.wrapTextBytes(text).as("wr"))
      .withColumn("enc", Bpe.applyMerges(col("wr"), Bpe.FixedByteMerges))
      .select(col("doc_id"),
        Bpe.nTokens(col("wr")).as("n_byte_syms"),
        Bpe.nTokens(col("enc")).as("n_tokens"),
        Bpe.render(col("enc")).as("bpe_bytes"))
      .orderBy(col("doc_id").asc)
  }

  val txBpeBytesOracle: String = {
    import graft.functions.Bpe
    s"""WITH s AS (
       |  SELECT doc_id,
       |    regexp_replace(text, '[\\x00-\\x1F\\x7F]', '', 'g') AS t
       |  FROM documents),
       |w AS (
       |  SELECT doc_id, coalesce(array_to_string(list_transform(
       |    list_filter(string_split(t, ' '), x -> x <> ''),
       |    x -> regexp_replace(hex(encode(x)), '([0-9A-F]{2})',
       |           chr(1)||'\\1'||chr(1), 'g')
       |         || chr(1)||chr(2)||chr(1)), ''), '') AS wr
       |  FROM s),
       |m AS (
       |  SELECT doc_id, wr,
       |    ${Bpe.mergesDuckSql(Bpe.FixedByteMerges, "wr")} AS enc
       |  FROM w)
       |SELECT doc_id,
       |  CAST((length(wr) - length(replace(wr, chr(1), ''))) / 2 AS INT)
       |    AS n_byte_syms,
       |  CAST((length(enc) - length(replace(enc, chr(1), ''))) / 2 AS INT)
       |    AS n_tokens,
       |  replace(array_to_string(
       |    string_split(trim(enc, chr(1)), chr(1)||chr(1)), ' '),
       |    chr(2), '</w>') AS bpe_bytes
       |FROM m
       |ORDER BY doc_id ASC NULLS FIRST""".stripMargin
  }

  /** TX-BPE1: distributed BPE tokenizer TRAINING
    * ([[graft.operators.BpeTrainer]]) — 16 merges learned from the
    * corpus: per-iteration ONE pair-count map-reduce over the
    * distinct-word frequency table (Zipf: ≪ corpus) + a narrow replace;
    * the only driver traffic is the 1-row argmax. Deterministic total
    * tie-break → bit-reproducible at any parallelism, but iterative →
    * spec-gated (BpeSpec: reference-implementation parity, parallelism
    * invariance, Sennrich-fixture anchor), rows-only here.
    */
  def txBpeTrain(spark: SparkSession, dir: String): DataFrame =
    graft.operators.BpeTrainer.trainDf(
      spark, Q.t(spark, dir, "documents"), numMerges = 16)

  /** TX-UNI1: unigram-LM tokenizer TRAINING
    * ([[graft.operators.UnigramTrainer]], the SentencePiece unigram
    * model) — seed substring vocabulary pruned through deterministic
    * hard-EM Viterbi rounds; integer expected counts make the result
    * bit-reproducible at any parallelism. Iterative → spec-gated
    * (UnigramSpec: serial-reference EQUALITY, determinism, coverage,
    * planted-motif learning, round-trip), rows-only here. Top 60
    * pieces by (count desc, piece asc).
    */
  def txUnigramTrain(spark: SparkSession, dir: String): DataFrame =
    graft.operators.UnigramTrainer.trainDf(
      spark, Q.t(spark, dir, "documents"), targetVocab = 400, topN = 60,
      emRounds = 2, seedSize = 4000)

  /** TX-UNI2: unigram tokenizer pipeline — train a vocabulary, encode
    * the corpus with it, report per-language compression (chars vs
    * unigram pieces); the unigram counterpart of tx_bpe_pipeline.
    * Spec-gated (train-dependent), rows-only.
    */
  def txUnigramPipeline(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.UnigramTrainer
    val docs = Q.t(spark, dir, "documents")
    val vocab = UnigramTrainer.train(docs, targetVocab = 400,
      emRounds = 2, seedSize = 4000)
    val counts = UnigramTrainer.encodeCounts(docs, vocab)
    docs.select(col("doc_id"), col("lang"),
        length(regexp_replace(col("text"), " ", "")).cast("long").as("n_chars"))
      .join(counts, Seq("doc_id"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        sum(col("n_pieces")).as("total_pieces"))
      .withColumn("compression",
        col("total_chars").cast("double") / col("total_pieces"))
      .orderBy(col("lang").asc)
  }

  /** Fixed demo vocabulary for the oracle-exact unigram ENCODE: the
    * serving path takes the vocabulary as an artifact, so a literal
    * (piece, count) table makes the whole Viterbi segmentation
    * replayable cross-engine. Letters cover English; other scripts
    * fall to the unknown-single-char floor (still deterministic).
    */
  private val uniDemoVocab: Seq[(String, Long)] =
    "abcdefghijklmnopqrstuvwxyz".map(c => c.toString -> 100L) ++ Seq(
      "the" -> 900L, "and" -> 800L, "ing" -> 700L, "tion" -> 600L,
      "of" -> 520L, "to" -> 510L, "in" -> 500L, "an" -> 450L,
      "er" -> 420L, "th" -> 400L, "re" -> 380L, "ed" -> 360L,
      "es" -> 350L, "en" -> 340L, "on" -> 330L, "or" -> 310L,
      "at" -> 300L, "is" -> 290L, "it" -> 280L, "ent" -> 260L,
      "ation" -> 240L, "ly" -> 230L, "ness" -> 220L, "ers" -> 210L)

  /** TX-UNI3: unigram ENCODE with a fixed vocabulary — ORACLE-EXACT:
    * the Viterbi DP is bounded (words ≤ 24 chars, pieces ≤ 8), so the
    * oracle unrolls it position by position — each dp stage an argmax
    * over ≤ 8 predecessor stages with the same (score desc, piece-len
    * desc) tie rule — and every score is the same left-to-right chain
    * of double adds the Scala DP computes: segmentations, piece
    * counts, everything reproduces bit-for-bit. Words over 24 chars
    * or containing non-BMP code points are excluded on BOTH sides
    * (Java indexes UTF-16 units, DuckDB code points — they agree only
    * on BMP). Per-doc integer totals only (cross-word float sums
    * would be accumulation-order-dependent).
    */
  def txUnigramEncode(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.UnigramTrainer
    import spark.implicits._
    val entries = UnigramTrainer.fixedVocab(uniDemoVocab)
    val floor = UnigramTrainer.floorLogProbFor(uniDemoVocab)
    // closure-captured, not broadcast: a lazy frame can never destroy
    // a broadcast it makes (the s7PqAnn leak lesson); 50 entries ride
    // the task closure for free
    val table = new java.util.HashMap[String, java.lang.Double](entries.size * 2)
    entries.foreach(e => table.put(e.piece, e.logProb))
    Q.t(spark, dir, "documents")
      .select(col("doc_id"),
        explode(split(graft.functions.Bpe.sanitize(col("text")), " ")).as("w"))
      .filter(length(col("w")) >= 1 && length(col("w")) <= 24 &&
        !col("w").rlike("[\\x{10000}-\\x{10FFFF}]"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, w) =>
          (id, UnigramTrainer.segment(w, table, 8, floor).length.toLong)
        }
      }
      .toDF("doc_id", "np")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("np")).as("n_pieces"))
      .orderBy(col("doc_id").asc)
  }

  val txUnigramEncodeOracle: String = {
    import graft.operators.UnigramTrainer
    val entries = UnigramTrainer.fixedVocab(uniDemoVocab)
    val floor = "CAST('" +
      java.lang.Double.toString(UnigramTrainer.floorLogProbFor(uniDemoVocab)) +
      "' AS DOUBLE)"
    val vocabVals = entries.map(e =>
      s"('${e.piece}', CAST('${java.lang.Double.toString(e.logProb)}' AS DOUBLE))")
      .mkString(",\n    ")
    val maxW = 24
    val maxL = 8
    val stages = (1 to maxW).map { i =>
      val branches = (1 to math.min(maxL, i)).map { l =>
        val sub = s"substr(w.w, ${i - l + 1}, $l)"
        if (l == 1)
          s"SELECT d.doc_id, d.wi, d.score + COALESCE(v.lp, $floor) AS score, " +
            s"d.n + 1 AS n, 1 AS plen\n" +
            s"  FROM dp${i - 1} d JOIN words w ON w.doc_id = d.doc_id " +
            s"AND w.wi = d.wi AND len(w.w) >= $i\n" +
            s"  LEFT JOIN vocab v ON v.piece = $sub"
        else
          s"SELECT d.doc_id, d.wi, d.score + v.lp AS score, " +
            s"d.n + 1 AS n, $l AS plen\n" +
            s"  FROM dp${i - l} d JOIN words w ON w.doc_id = d.doc_id " +
            s"AND w.wi = d.wi AND len(w.w) >= $i\n" +
            s"  JOIN vocab v ON v.piece = $sub"
      }.mkString("\n  UNION ALL\n  ")
      s"cand$i AS (\n  $branches),\n" +
        s"dp$i AS MATERIALIZED (\n" +
        s"  SELECT doc_id, wi, score, n FROM (\n" +
        s"    SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id, wi\n" +
        s"      ORDER BY score DESC, plen DESC) AS rn FROM cand$i)\n" +
        s"  WHERE rn = 1)"
    }.mkString(",\n")
    val done = (1 to maxW).map(i =>
      s"SELECT d.doc_id, d.wi, d.n FROM dp$i d JOIN words w " +
        s"ON w.doc_id = d.doc_id AND w.wi = d.wi AND len(w.w) = $i")
      .mkString("\n  UNION ALL\n  ")
    s"""WITH words AS MATERIALIZED (
       |  SELECT doc_id, g.i AS wi, t[g.i] AS w
       |  FROM (SELECT doc_id,
       |          string_split(regexp_replace(text, '[\\x00-\\x1F\\x7F]', '', 'g'), ' ') AS t
       |        FROM documents),
       |       UNNEST(generate_series(1, len(t))) AS g(i)
       |  WHERE len(t[g.i]) >= 1 AND len(t[g.i]) <= 24
       |    AND NOT regexp_matches(t[g.i], '[\\x{10000}-\\x{10FFFF}]')),
       |vocab(piece, lp) AS (VALUES
       |    $vocabVals),
       |dp0 AS MATERIALIZED (SELECT doc_id, wi, CAST(0.0 AS DOUBLE) AS score, 0 AS n
       |        FROM words),
       |$stages,
       |done AS (
       |  $done)
       |SELECT doc_id, COUNT(*) AS n_words, CAST(SUM(n) AS BIGINT) AS n_pieces
       |FROM done GROUP BY doc_id
       |ORDER BY doc_id ASC NULLS FIRST""".stripMargin
  }

  /** TX-BPE3: end-to-end tokenizer pipeline — train 12 merges, encode
    * the corpus with them, report per-language compression (chars vs
    * BPE tokens). Spec-gated like TX-BPE1 (train-dependent).
    */
  def txBpePipeline(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.{BpeSymCount, BpeTokenCount}
    val docs = Q.t(spark, dir, "documents")
    val merges = graft.operators.BpeTrainer.train(docs, numMerges = 12)
      .map(m => (m.left, m.right))
    docs
      .select(col("lang"),
        BpeSymCount.countCol(spark, col("text")).as("n_syms"),
        BpeTokenCount.countCol(spark, col("text"), merges).as("n_tok"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_syms")).as("total_syms"),
        sum(col("n_tok")).as("total_bpe_tokens"))
      .withColumn("compression",
        col("total_syms").cast("double") / col("total_bpe_tokens"))
      .orderBy(col("lang").asc)
  }

  /** TX-CHUNK: overlapping token-window chunking — the RAG/context-
    * window preprocessing step: each doc explodes into 64-token chunks
    * with 16-token overlap (stride 48); the last start is the smallest
    * stride multiple whose chunk reaches the end, so every token is
    * covered exactly and short docs yield one chunk. All integer
    * window math + array slicing — hash-exact cross-engine, and a
    * narrow explode (fan-out ~n_tokens/stride) with no shuffle before
    * the final order: embarrassingly parallel at 100 TB.
    */
  def txChunk(spark: SparkSession, dir: String): DataFrame = {
    val chunk = 64
    val stride = 48 // chunk - overlap(16)
    val t = split(col("text"), " ")
    val n = size(t)
    // smallest k with k*stride + chunk >= n, as exact int arithmetic
    val maxStart = floor(
      (greatest(n - chunk, lit(0)) + stride - 1) / stride).cast("int") * stride
    Q.t(spark, dir, "documents")
      .select(col("doc_id"), t.as("t"), n.as("n"), maxStart.as("ms"))
      .select(col("doc_id"), col("t"), col("n"),
        explode(sequence(lit(0), col("ms"), lit(stride))).as("start"))
      .select(
        col("doc_id"),
        (col("start") / stride).cast("int").as("chunk_id"),
        least(lit(chunk), col("n") - col("start")).as("chunk_tokens"),
        concat_ws(" ", slice(col("t"), col("start") + 1, lit(chunk)))
          .as("chunk_text"))
      .orderBy(col("doc_id").asc, col("chunk_id").asc)
  }

  val txChunkOracle: String =
    """WITH d AS (
      |  SELECT doc_id, string_split(text, ' ') AS t,
      |    len(string_split(text, ' ')) AS n
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, t, n,
      |    unnest(generate_series(0,
      |      CAST((greatest(n - 64, 0) + 47) // 48 AS INT) * 48, 48)) AS start
      |  FROM d)
      |SELECT doc_id,
      |  CAST(start // 48 AS INT) AS chunk_id,
      |  CAST(least(64, n - start) AS INT) AS chunk_tokens,
      |  array_to_string(t[start + 1 : start + 64], ' ') AS chunk_text
      |FROM s
      |ORDER BY doc_id ASC NULLS FIRST, chunk_id ASC NULLS FIRST""".stripMargin

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "tx_chunk" -> txChunk,
    "tx_bpe_train" -> txBpeTrain,
    "tx_unigram_train" -> txUnigramTrain,
    "tx_unigram_encode" -> txUnigramEncode,
    "tx_unigram_pipeline" -> txUnigramPipeline,
    "tx_bpe_encode" -> txBpeEncode,
    "tx_bpe_bytes" -> txBpeBytes,
    "tx_bpe_pipeline" -> txBpePipeline,
    "tx_normalize" -> txNormalize,
    "tx_winnow" -> txWinnow,
    "tx_lm_score" -> txLmScore,
    "tx_pii_redact" -> txPiiRedact,
    "tx_repetition" -> txRepetition,
    "tx_token_stats" -> txTokenStats,
    "tx_quality_score" -> txQualityScore,
    "tx_lang_id" -> txLangId,
    "tx_bigrams" -> txBigrams,
    "tx_vocab_growth" -> txVocabGrowth,
    "tx_fingerprint" -> txFingerprint,
    "tx_tfidf" -> txTfIdf)

  override def oracles: Map[String, String] = Map(
    "tx_chunk" -> txChunkOracle,
    "tx_bpe_encode" -> txBpeEncodeOracle,
    "tx_bpe_bytes" -> txBpeBytesOracle,
    "tx_unigram_encode" -> txUnigramEncodeOracle,
    "tx_normalize" -> txNormalizeOracle,
    "tx_winnow" -> txWinnowOracle,
    "tx_lm_score" -> txLmScoreOracle,
    "tx_pii_redact" -> txPiiRedactOracle,
    "tx_repetition" -> txRepetitionOracle,
    "tx_token_stats" -> txTokenStatsOracle,
    "tx_quality_score" -> txQualityScoreOracle,
    "tx_lang_id" -> txLangIdOracle,
    "tx_bigrams" -> txBigramsOracle,
    "tx_vocab_growth" -> txVocabGrowthOracle,
    "tx_fingerprint" -> txFingerprintOracle,
    "tx_tfidf" -> txTfIdfOracle)
}

package graft.queries

import graft.{Q, QueryModule}
import graft.functions.DedupOps
import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents` (north-star dedup family,
  * SURVEY.md §2.9 L6 + BASELINE.json). Exact and n-gram-Jaccard forms
  * are oracle-checked; MinHash/SimHash signatures use Spark's xxhash64
  * (no DuckDB equivalent) so their queries get the rows-only check and
  * their quality (recall vs brute force) is asserted in DedupSpec.
  */
object Dedup extends QueryModule {

  /** D1: exact content dedup — duplicate the corpus then dedup by
    * content hash; survivors = one doc per distinct text, keyed by
    * min doc_id. The replica gets offset ids so survivors are stable.
    */
  def d1ExactContent(spark: SparkSession, dir: String): DataFrame = {
    val docs = Q.t(spark, dir, "documents").select("doc_id", "text")
    val replica = docs.withColumn("doc_id", col("doc_id") + 1000000L)
    val doubled = docs.unionByName(replica)
    DedupOps.dedupByFingerprint(
      doubled.withColumn("fp", md5(col("text").cast("binary"))),
      col("fp"), "doc_id")
      .select("doc_id", "fp")
      .orderBy(col("doc_id").asc)
  }

  val d1Oracle: String =
    """WITH doubled AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, text FROM documents)
      |SELECT doc_id, fp FROM (
      |  SELECT doc_id, md5(text) AS fp,
      |    ROW_NUMBER() OVER (PARTITION BY md5(text)
      |      ORDER BY doc_id ASC NULLS FIRST) AS rn
      |  FROM doubled)
      |WHERE rn = 1
      |ORDER BY doc_id ASC NULLS FIRST""".stripMargin

  /** D2: n-gram Jaccard similarity join, candidate-generated through an
    * inverted shingle index: docs pair only if they SHARE a bigram,
    * which is lossless here (jaccard ≥ 0.05 > 0 ⟹ ≥ 1 common
    * shingle) yet scale-shaped — the equi-join key is (lang, shingle),
    * cardinality O(vocab), not the ~3-value lang key that would skew a
    * broadcast-less shuffle catastrophically at 100 TB. The remaining
    * scale knob (not needed at oracle scale) is a doc-frequency cap on
    * ultra-common shingles, trading exactness at jaccard→0 for a
    * bounded hottest key.
    */
  def d2JaccardPairs(spark: SparkSession, dir: String): DataFrame = {
    val docs = Q.t(spark, dir, "documents")
      .filter(col("doc_id") < 60)
      .select(col("doc_id"), col("lang"),
        DedupOps.shingles(col("text")).as("sh"))
    val inv = docs.select(col("doc_id"), col("lang"),
      explode(col("sh")).as("shingle"))
    val cands = inv.select(col("doc_id").as("id_a"),
        col("lang"), col("shingle"))
      .join(inv.select(col("doc_id").as("id_b"), col("lang"), col("shingle")),
        Seq("lang", "shingle"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "lang")
      .distinct()
    val a = docs.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val b = docs.select(col("doc_id").as("id_b"), col("sh").as("sh_b"))
    cands.join(a, Seq("id_a")).join(b, Seq("id_b"))
      .withColumn("jaccard", DedupOps.jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= 0.05)
      .select("id_a", "id_b", "lang", "jaccard")
      .orderBy(col("id_a").asc, col("id_b").asc)
  }

  val d2Oracle: String =
    """WITH sh AS (
      |  SELECT doc_id, lang,
      |    list_distinct(list_transform(
      |      list_zip(string_split(text,' ')[1:len(string_split(text,' '))-1],
      |               string_split(text,' ')[2:len(string_split(text,' '))]),
      |      p -> p[1] || ' ' || p[2])) AS s
      |  FROM documents WHERE doc_id < 60)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.lang AS lang,
      |  CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
      |    / len(list_distinct(list_concat(a.s, b.s))) AS jaccard
      |FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
      |WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
      |    / len(list_distinct(list_concat(a.s, b.s))) >= 0.05
      |ORDER BY id_a ASC NULLS FIRST, id_b ASC NULLS FIRST""".stripMargin

  /** D13: prefix-filtered set-similarity join (the PPJoin/AllPairs
    * family, Xiao et al. WWW'08 / Bayardo et al. WWW'07): exact
    * Jaccard ≥ 0.5 pairs, but candidates are generated from each doc's
    * PREFIX — its (|s| − ⌈t·|s|⌉ + 1) rarest shingles under a global
    * (document-frequency asc, shingle asc) order — instead of the full
    * inverted index. The prefix lemma guarantees completeness: any
    * pair with J ≥ t shares a prefix token, so the result is
    * byte-equal to the naive join (the oracle) while the index
    * shrinks to ~(1−t) of the corpus postings and the candidate set
    * collapses — THE scalable exact set-similarity algorithm. Corpus:
    * docs < 60 plus planted near-copies (one appended word) so the
    * 0.5 threshold has real matches.
    */
  def d13PrefixJaccard(spark: SparkSession, dir: String,
      t: Double = 0.5): DataFrame = {
    val base = Q.t(spark, dir, "documents")
      .filter(col("doc_id") < 60).select(col("doc_id"), col("text"))
    val corpus = base.unionByName(
      base.select((col("doc_id") + 100000L).as("doc_id"),
        concat(col("text"), lit(" extraword")).as("text")))
      .select(col("doc_id"), DedupOps.shingles(col("text")).as("sh"))
    val inv = corpus.select(col("doc_id"), size(col("sh")).as("n"),
      explode(col("sh")).as("shingle"))
    val df = inv.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    val wRank = Window.partitionBy(col("doc_id"))
      .orderBy(col("df").asc, col("shingle").asc)
    val prefix = inv.join(df, Seq("shingle"))
      .withColumn("rk", row_number().over(wRank))
      .filter(col("rk") <= col("n") - ceil(lit(t) * col("n")) + 1)
      .select(col("doc_id"), col("shingle"))
    val cands = prefix.select(col("doc_id").as("id_a"), col("shingle"))
      .join(prefix.select(col("doc_id").as("id_b"), col("shingle")),
        Seq("shingle"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val a = corpus.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val b = corpus.select(col("doc_id").as("id_b"), col("sh").as("sh_b"))
    cands.join(a, Seq("id_a")).join(b, Seq("id_b"))
      .withColumn("jaccard", DedupOps.jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= t)
      .select("id_a", "id_b", "jaccard")
      .orderBy(col("id_a").asc, col("id_b").asc)
  }

  val d13Oracle: String =
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents WHERE doc_id < 60
      |  UNION ALL
      |  SELECT doc_id + 100000, text || ' extraword'
      |  FROM documents WHERE doc_id < 60),
      |sh AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(
      |      list_zip(string_split(text,' ')[1:len(string_split(text,' '))-1],
      |               string_split(text,' ')[2:len(string_split(text,' '))]),
      |      p -> p[1] || ' ' || p[2])) AS s
      |  FROM corpus)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
      |    / len(list_distinct(list_concat(a.s, b.s))) AS jaccard
      |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
      |    / len(list_distinct(list_concat(a.s, b.s))) >= 0.5
      |ORDER BY id_a ASC NULLS FIRST, id_b ASC NULLS FIRST""".stripMargin

  /** D3: MinHash+LSH near-dup candidates (k=16, 4 bands × 4 rows),
    * verified by exact Jaccard. Signature hashes are engine-specific →
    * rows-only check here; recall is asserted in DedupSpec.
    *
    * Verification co-counts through the inverted shingle index (the d2
    * pattern) instead of re-joining wide shingle arrays onto both pair
    * sides: |A∩B| = count of shingles the candidate pair co-occurs on,
    * |A|,|B| from a narrow per-doc size frame, J = ∩/(|A|+|B|−∩).
    * Every shuffled row is (long, long[, string]) — nothing wide moves.
    */
  def d3MinhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val docs = Q.t(spark, dir, "documents")
    val cands = DedupOps.lshCandidates(docs, "doc_id", "text")
    val inv = docs.select(col("doc_id"),
      explode(DedupOps.shingles(col("text"))).as("s"))
    val sizes = inv.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = cands
      .join(inv.select(col("doc_id").as("id_a"), col("s")), Seq("id_a"))
      .join(inv.select(col("doc_id").as("id_b"), col("s")), Seq("id_b", "s"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("i"))
    // left join: band collisions between shingle-disjoint docs must
    // surface as jaccard 0.0, exactly as the array form did
    cands.join(inter, Seq("id_a", "id_b"), "left")
      .join(sizes.select(col("doc_id").as("id_a"), col("n").as("n_a")), Seq("id_a"))
      .join(sizes.select(col("doc_id").as("id_b"), col("n").as("n_b")), Seq("id_b"))
      .withColumn("jaccard",
        coalesce(col("i"), lit(0L)).cast("double") /
          (col("n_a") + col("n_b") - coalesce(col("i"), lit(0L))).cast("double"))
      .select("id_a", "id_b", "jaccard")
      .orderBy(col("id_a").asc, col("id_b").asc)
  }

  /** Exploded distinct word-bigram shingles: (doc_id, s). The fan-out
    * spreads the md5-heavy shingle/minhash map work (16 hashes per
    * shingle downstream) across the session's cores when the corpus
    * scan planned fewer splits than that (guide §2.5 input skew — a
    * one-row-group file is one task; measured 4.2 s single-task for
    * d3b's signature stage, ~0.3 s fanned out).
    */
  private def shingleInv(docs: DataFrame): DataFrame =
    Q.fanOut(docs).select(col("doc_id"),
      explode(DedupOps.shingles(col("text"))).as("s"))

  /** md5-exact MinHash band keys from a shingle inverted list —
    * k = 16 slots, 4 bands of 4 (production d3's parameters; 4-row
    * bands collide at ~j^4, which is what keeps the candidate set
    * small under heavy duplication). Every hash is an md5-derived
    * 60-bit integer so DuckDB reproduces the keys bit-for-bit.
    * Returns (doc_id, bk = struct(band, key)).
    */
  private def md5BandKeys(inv: DataFrame): DataFrame = {
    val k = 16
    val rpb = 4
    val bands = k / rpb
    def mh(i: Int) = expr(
      s"cast(conv(substring(md5(cast(concat('$i:', s) AS binary)), " +
        "1, 15), 16, 10) AS bigint)")
    val mins = (0 until k).map(i => min(mh(i)).as(s"m$i"))
    val sig = inv.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
    val bandCols = (0 until bands).map { b =>
      val slots = (b * rpb until (b + 1) * rpb).map(i => s"m$i")
        .mkString(", ")
      struct(lit(b).as("band"), expr(
        s"cast(conv(substring(md5(cast(concat_ws(',', $slots) " +
          "AS binary)), 1, 15), 16, 10) AS bigint)").as("key"))
    }
    sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
  }

  /** D3b: ORACLE-EXACT MinHash LSH — the d3 plan with every hash an
    * md5-derived 60-bit integer (the d4/tx_winnow technique) instead
    * of xxhash64, so the signatures, band keys, candidate set and
    * Jaccard scores all reproduce bit-for-bit in DuckDB: the one
    * approximate-dedup family member whose END-TO-END candidate
    * generation is oracle-gated, not just spec/rows-gated. Same
    * parameters as production d3 (k = 16 slots, 4 bands of 4): the
    * md5 signature pass costs ~2× the k=8 variant, but 4-row bands
    * collide at ~j^4 instead of j^2, which keeps the candidate set —
    * and the exact-verify join behind it — small under heavy
    * duplication (the k=8 form measured 7× linear on the 10×-clone
    * sf1 corpus purely from band-collision fan-out; this form's
    * candidates match d3's). Scale shape is d3's: explode + min
    * aggregate for signatures (map-side combined), an equi-join on
    * (band, key) — never all-pairs — and the d2-style inverted-index
    * exact verify.
    */
  def d3bMinhashExact(spark: SparkSession, dir: String): DataFrame = {
    val docs = Q.t(spark, dir, "documents")
    val inv = shingleInv(docs)
    val banded = md5BandKeys(inv)
    // the candidate pair list is referenced twice below (co-count join
    // + final assembly), but BOTH references prune to the same
    // projection, so Catalyst's exchange reuse already materializes
    // the signature pipeline once — a localCheckpoint here adds a
    // materialization for a dedup the engine already performs
    // (measured: no win, within co-run variance)
    val cands = banded.select(col("doc_id").as("id_a"), col("bk"))
      .join(banded.select(col("doc_id").as("id_b"), col("bk")), Seq("bk"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val sizes = inv.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = cands
      .join(inv.select(col("doc_id").as("id_a"), col("s")), Seq("id_a"))
      .join(inv.select(col("doc_id").as("id_b"), col("s")), Seq("id_b", "s"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("i"))
    cands.join(inter, Seq("id_a", "id_b"), "left")
      .join(sizes.select(col("doc_id").as("id_a"), col("n").as("n_a")),
        Seq("id_a"))
      .join(sizes.select(col("doc_id").as("id_b"), col("n").as("n_b")),
        Seq("id_b"))
      .withColumn("jaccard",
        coalesce(col("i"), lit(0L)).cast("double") /
          (col("n_a") + col("n_b") - coalesce(col("i"), lit(0L)))
            .cast("double"))
      .select("id_a", "id_b", "jaccard")
      .orderBy(col("id_a").asc, col("id_b").asc)
  }

  /** The d3b pipeline as a reusable CTE body (no WITH keyword): sh,
    * inv, slots, sig, banded, cands, sizes, inter. mix11's oracle
    * embeds it so the soft-dedup closure runs over exactly the
    * oracle-checked LSH candidate set.
    */
  private[queries] val d3bCtes: String =
    s"""${md5LshCtesSql("documents", "")},
       |cands AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM banded a JOIN banded b
       |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
       |sizes AS (SELECT doc_id, COUNT(*) AS n FROM inv GROUP BY doc_id),
       |inter AS (
       |  SELECT c.id_a AS ia, c.id_b AS ib, COUNT(*) AS cnt
       |  FROM cands c
       |  JOIN inv x ON x.doc_id = c.id_a
       |  JOIN inv y ON y.doc_id = c.id_b AND y.s = x.s
       |  GROUP BY c.id_a, c.id_b)""".stripMargin

  val d3bOracle: String =
    s"""WITH $d3bCtes
       |SELECT c.id_a, c.id_b,
       |  CAST(COALESCE(t.cnt, 0) AS DOUBLE)
       |    / CAST(sa.n + sb.n - COALESCE(t.cnt, 0) AS DOUBLE) AS jaccard
       |FROM cands c
       |LEFT JOIN inter t ON c.id_a = t.ia AND c.id_b = t.ib
       |JOIN sizes sa ON sa.doc_id = c.id_a
       |JOIN sizes sb ON sb.doc_id = c.id_b
       |ORDER BY id_a ASC NULLS FIRST, id_b ASC NULLS FIRST""".stripMargin

  /** D16: incremental near-dup dedup — the arriving-batch-vs-corpus
    * LSH pass: for every batch document, does it NEAR-duplicate (J ≥
    * 0.5) anything already in the corpus, and if so what is its best
    * match? d12 answers this for EXACT duplicates via a fingerprint
    * anti-join; a re-crawl that appended a banner or fixed a typo
    * slips through d12 and is caught here. Corpus = doc_id % 10 ≠ 0;
    * batch = the rest plus one-word-perturbed re-crawls of every
    * corpus doc with doc_id % 7 = 1 (the realistic near-dup source).
    *
    * Scale shape — why this is not "run d3b over corpus ∪ batch":
    * the corpus side of the band-key equi-join is exactly the
    * persisted LSH INDEX a production pipeline maintains — built once,
    * appended per ingest (band keys are per-doc, so index maintenance
    * is O(batch)) — and is NEVER re-shuffled against itself: corpus×
    * corpus pairs are not recomputed, only batch×corpus collisions
    * surface. The batch side is ingest-sized and broadcasts. The
    * exact-verify co-count join then touches only candidate corpus
    * docs, not the corpus. All hashes are the md5-exact kernel, so
    * candidates, Jaccard scores, and best-match picks reproduce
    * bit-for-bit in the oracle.
    */
  def d16IncrLsh(spark: SparkSession, dir: String): DataFrame = {
    val docs = Q.t(spark, dir, "documents").select("doc_id", "text")
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val batch = docs.filter(col("doc_id") % 10 === 0)
      .unionByName(corpus.filter(col("doc_id") % 7 === 1)
        .select((col("doc_id") + 200000L).as("doc_id"),
          concat(col("text"), lit(" extraword")).as("text")))
    val corpusInv = shingleInv(corpus)
    // the batch side is ingest-sized and referenced three times (band
    // keys, co-count, sizes) — materialize once; the corpus side
    // stays streamed (at 100 TB it cannot be pinned, and each of its
    // references is one scan of the persisted index/corpus)
    val batchInv = shingleInv(batch).localCheckpoint(true)
    // the persisted-index leg: per-corpus-doc band keys
    val corpusBanded = md5BandKeys(corpusInv)
    val batchBanded = md5BandKeys(batchInv)
    // referenced twice below (co-count + scoring): checkpoint so the
    // band-key join runs once — bounded (batch×corpus collisions)
    val cands = batchBanded.select(col("doc_id").as("batch_id"), col("bk"))
      .join(corpusBanded.select(col("doc_id").as("corpus_id"), col("bk")),
        Seq("bk"))
      .select("batch_id", "corpus_id").distinct()
      .localCheckpoint(true)
    val inter = cands
      .join(batchInv.select(col("doc_id").as("batch_id"), col("s")),
        Seq("batch_id"))
      .join(corpusInv.select(col("doc_id").as("corpus_id"), col("s")),
        Seq("corpus_id", "s"))
      .groupBy(col("batch_id"), col("corpus_id")).agg(count(lit(1)).as("i"))
    val bSizes = batchInv.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_b"))
      .withColumnRenamed("doc_id", "batch_id")
    val cSizes = corpusInv.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_c"))
      .withColumnRenamed("doc_id", "corpus_id")
    val scored = cands.join(inter, Seq("batch_id", "corpus_id"), "left")
      .join(bSizes, Seq("batch_id")).join(cSizes, Seq("corpus_id"))
      .withColumn("j",
        coalesce(col("i"), lit(0L)).cast("double") /
          (col("n_b") + col("n_c") - coalesce(col("i"), lit(0L)))
            .cast("double"))
      .filter(col("j") >= 0.5)
    val w = Window.partitionBy(col("batch_id"))
      .orderBy(col("j").desc, col("corpus_id").asc)
    val best = scored
      .withColumn("nm", count(lit(1)).over(Window.partitionBy(col("batch_id"))))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
    batch.select(col("doc_id"))
      .join(best.select(col("batch_id").as("doc_id"), col("nm"),
        col("corpus_id").as("best_match"), col("j").as("best_jaccard")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("nm"), lit(0L)).as("n_matches"),
        col("best_match"), col("best_jaccard"),
        col("nm").isNull.as("is_new"))
      .orderBy(col("doc_id").asc)
  }

  /** Per-side md5-LSH CTE chain for the d16 oracle: shingles,
    * inverted list, minhash slots, signature, band keys — identical
    * math to [[md5BandKeys]], prefixed so two sides coexist.
    */
  private def md5LshCtesSql(src: String, p: String): String = {
    val sigCols = (0 until 16)
      .map(i => s"MAX(CASE WHEN i = $i THEN m END) AS m$i").mkString(", ")
    val bands = (0 until 4).map { b =>
      val slots = (4 * b until 4 * b + 4)
        .map(i => s"CAST(m$i AS VARCHAR)").mkString(" || ',' || ")
      s"SELECT doc_id, $b AS band, CAST(('0x' || substr(md5(" +
        s"$slots), 1, 15)) AS BIGINT) AS key FROM ${p}sig"
    }.mkString("\nUNION ALL\n")
    s"""${p}sh AS (
       |  SELECT doc_id,
       |    list_distinct(list_transform(
       |      list_zip(string_split(text,' ')[1:len(string_split(text,' '))-1],
       |               string_split(text,' ')[2:len(string_split(text,' '))]),
       |      p -> p[1] || ' ' || p[2])) AS s
       |  FROM $src),
       |${p}inv AS (SELECT doc_id, unnest(s) AS s FROM ${p}sh),
       |${p}slots AS (
       |  SELECT doc_id, g.i AS i,
       |    MIN(CAST(('0x' || substr(md5(CAST(g.i AS VARCHAR) || ':' || s),
       |      1, 15)) AS BIGINT)) AS m
       |  FROM ${p}inv CROSS JOIN UNNEST(generate_series(0, 15)) AS g(i)
       |  GROUP BY doc_id, g.i),
       |${p}sig AS (SELECT doc_id, $sigCols FROM ${p}slots GROUP BY doc_id),
       |${p}banded AS ($bands)""".stripMargin
  }

  val d16Oracle: String =
    s"""WITH corpus AS (
       |  SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0),
       |batch AS (
       |  SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0
       |  UNION ALL
       |  SELECT doc_id + 200000, text || ' extraword' FROM documents
       |  WHERE doc_id % 10 <> 0 AND doc_id % 7 = 1),
       |${md5LshCtesSql("corpus", "c_")},
       |${md5LshCtesSql("batch", "b_")},
       |cands AS (
       |  SELECT DISTINCT b.doc_id AS batch_id, c.doc_id AS corpus_id
       |  FROM b_banded b JOIN c_banded c
       |    ON b.band = c.band AND b.key = c.key),
       |bsz AS (SELECT doc_id, COUNT(*) AS n FROM b_inv GROUP BY doc_id),
       |csz AS (SELECT doc_id, COUNT(*) AS n FROM c_inv GROUP BY doc_id),
       |inter AS (
       |  SELECT cd.batch_id, cd.corpus_id, COUNT(*) AS cnt
       |  FROM cands cd
       |  JOIN b_inv x ON x.doc_id = cd.batch_id
       |  JOIN c_inv y ON y.doc_id = cd.corpus_id AND y.s = x.s
       |  GROUP BY cd.batch_id, cd.corpus_id),
       |scored AS (
       |  SELECT cd.batch_id, cd.corpus_id,
       |    CAST(COALESCE(t.cnt, 0) AS DOUBLE)
       |      / CAST(sb.n + sc.n - COALESCE(t.cnt, 0) AS DOUBLE) AS j
       |  FROM cands cd
       |  LEFT JOIN inter t
       |    ON cd.batch_id = t.batch_id AND cd.corpus_id = t.corpus_id
       |  JOIN bsz sb ON sb.doc_id = cd.batch_id
       |  JOIN csz sc ON sc.doc_id = cd.corpus_id
       |  WHERE CAST(COALESCE(t.cnt, 0) AS DOUBLE)
       |      / CAST(sb.n + sc.n - COALESCE(t.cnt, 0) AS DOUBLE) >= 0.5),
       |best AS (
       |  SELECT batch_id, corpus_id, j,
       |    COUNT(*) OVER (PARTITION BY batch_id) AS nm,
       |    ROW_NUMBER() OVER (PARTITION BY batch_id
       |      ORDER BY j DESC, corpus_id ASC) AS rk
       |  FROM scored)
       |SELECT b.doc_id,
       |  CAST(COALESCE(bb.nm, 0) AS BIGINT) AS n_matches,
       |  bb.corpus_id AS best_match, bb.j AS best_jaccard,
       |  bb.batch_id IS NULL AS is_new
       |FROM batch b
       |LEFT JOIN (SELECT * FROM best WHERE rk = 1) bb
       |  ON b.doc_id = bb.batch_id
       |ORDER BY doc_id ASC NULLS FIRST""".stripMargin

  /** D4: SimHash fingerprints (Charikar, STOC'02): per-token hash
    * bits vote ±1 per position, the sign vector IS the fingerprint;
    * near-dups land within small Hamming distance. ORACLE-EXACT: token
    * hashes are md5-derived 60-bit ints (the l20/tx_winnow technique —
    * no engine-specific hash), the sign aggregation is pure integer
    * SQL, so DuckDB reproduces the fingerprints bit for bit. The
    * xxhash64 production form (same aggregation, cheaper hash) lives
    * in [[DedupOps.simhashAgg]], property-gated in LlmOpsSpec. Scale:
    * one explode + one keyed sum aggregate — map-side combine does the
    * voting, nothing wide shuffles.
    */
  def d4Simhash(spark: SparkSession, dir: String): DataFrame = {
    val exploded = Q.t(spark, dir, "documents")
      .select(col("doc_id"),
        explode(TextFunctions.tokens(col("text"))).as("t"))
      .select(col("doc_id"),
        expr("cast(conv(substring(md5(cast(t AS binary)), 1, 15), 16, 10) AS bigint)")
          .as("h"))
    val counters = (0 until 60).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(lit(1L)) === 1L, 1L)
        .otherwise(-1L)).as(s"c$i")
    }
    val fingerprint = (0 until 60).map { i =>
      when(col(s"c$i") > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    exploded.groupBy(col("doc_id"))
      .agg(counters.head, counters.tail: _*)
      .select(col("doc_id"), fingerprint.cast("long").as("simhash"))
      .orderBy(col("doc_id").asc)
  }

  val d4Oracle: String = {
    val cs = (0 until 60).map(i =>
      s"SUM(CASE WHEN (h >> $i) & 1 = 1 THEN 1 ELSE -1 END) AS c$i")
      .mkString(", ")
    val fp = (0 until 60).map(i =>
      s"CASE WHEN c$i > 0 THEN CAST(${1L << i} AS BIGINT) ELSE 0 END")
      .mkString(" + ")
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
       |h AS (
       |  SELECT doc_id, CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT) AS h
       |  FROM toks),
       |c AS (SELECT doc_id, $cs FROM h GROUP BY doc_id)
       |SELECT doc_id, CAST($fp AS BIGINT) AS simhash
       |FROM c
       |ORDER BY doc_id ASC NULLS FIRST""".stripMargin
  }

  /** D5: embedding-cosine near-dup pairs — vectors whose cosine
    * exceeds a threshold are duplicate candidates. Brute force over a
    * bounded id slice (oracle-able); the LSH/IVF bucketing in the
    * similarity module is the same computation's scale path.
    */
  def d5EmbeddingNearDup(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.{CosineSimilarity, VectorOps}
    val emb = Q.t(spark, dir, "embeddings")
      .filter(col("vec_id") < 100)
      .select(col("vec_id"), VectorOps.toDouble(col("embedding")).as("v"),
        col("label"))
    val a = emb.select(col("vec_id").as("id_a"), col("v").as("v_a"),
      col("label").as("label_a"))
    val b = emb.select(col("vec_id").as("id_b"), col("v").as("v_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", round(CosineSimilarity.cosine(spark, col("v_a"), col("v_b")), 6))
      .filter(col("cos") >= 0.35)
      .select("id_a", "id_b", "label_a", "cos")
      .orderBy(col("id_a").asc, col("id_b").asc)
  }

  private def dotSql(x: String, y: String): String =
    s"list_reduce(list_prepend(0.0, list_transform(list_zip($x, $y), p -> p[1] * p[2])), (a, b) -> a + b)"

  val d5Oracle: String = {
    val cos = s"round(${dotSql("a.v", "b.v")} / (sqrt(${dotSql("a.v", "a.v")}) * sqrt(${dotSql("b.v", "b.v")})), 6)"
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label
       |           FROM embeddings WHERE vec_id < 100)
       |SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.label AS label_a,
       |       $cos AS cos
       |FROM e a JOIN e b ON a.vec_id < b.vec_id
       |WHERE $cos >= 0.35
       |ORDER BY id_a ASC NULLS FIRST, id_b ASC NULLS FIRST""".stripMargin
  }

  /** D6: near-dup clusters — connected components over the d2 pair
    * graph, one canonical survivor (min doc_id) per cluster. This is
    * the step that makes pairwise similarity actionable: a dedup
    * pipeline drops every non-canonical member. Oracle = transitive
    * closure by recursive CTE over the identical pair set.
    */
  def d6DupClusters(spark: SparkSession, dir: String): DataFrame = {
    val pairs = d2JaccardPairs(spark, dir)
    DedupOps.connectedComponents(pairs, "id_a", "id_b")
      .select(col("node").as("doc_id"), col("cluster_id"),
        (col("cluster_id") === col("node")).as("is_canonical"))
      .orderBy(col("doc_id").asc)
  }

  /** D15: survivor selection — inside each near-dup cluster keep the
    * HIGHEST-QUALITY document (tie-break lowest doc_id), the curation
    * policy real pipelines want (d6's min-id canonical keeps whichever
    * copy happened to be crawled first; this keeps the best copy).
    * Composes two already-oracle-exact legs — the d6 cluster closure
    * and the tx_quality_score signal — so the float ranking is
    * bit-stable cross-engine. Scale: clusters from the bounded-round
    * CC engine, quality a narrow scan, survivor pick ONE window
    * shuffle keyed on cluster_id.
    */
  def d15SurvivorPick(spark: SparkSession, dir: String): DataFrame = {
    val clusters = d6DupClusters(spark, dir)
      .select(col("doc_id"), col("cluster_id"))
    val docs = Q.t(spark, dir, "documents")
    val quality = docs.select(
      col("doc_id"),
      (lit(0.5) * least(length(col("text")).cast("double") / lit(400.0), lit(1.0))
        + lit(0.3) * TextFunctions.stopwordRatio(col("text"))
        + lit(0.2) * (lit(1.0) - TextFunctions.punctRatio(col("text"))))
        .as("quality"))
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col("quality").desc, col("doc_id").asc)
    clusters.join(quality, Seq("doc_id"))
      .withColumn("rk", row_number().over(w))
      .select(col("doc_id"), col("cluster_id"), col("quality"),
        (col("rk") === 1).as("is_survivor"))
      .orderBy(col("doc_id").asc)
  }

  val d15Oracle: String =
    """WITH RECURSIVE
      |sh AS (
      |  SELECT doc_id, lang,
      |    list_distinct(list_transform(
      |      list_zip(string_split(text,' ')[1:len(string_split(text,' '))-1],
      |               string_split(text,' ')[2:len(string_split(text,' '))]),
      |      p -> p[1] || ' ' || p[2])) AS s
      |  FROM documents WHERE doc_id < 60),
      |pairs AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
      |  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
      |      / len(list_distinct(list_concat(a.s, b.s))) >= 0.05),
      |edges AS (
      |  SELECT id_a AS a, id_b AS b FROM pairs
      |  UNION SELECT id_b, id_a FROM pairs),
      |reach(node, r) AS (
      |  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
      |  UNION
      |  SELECT e.a, r.r FROM edges e JOIN reach r ON r.node = e.b),
      |cl AS (
      |  SELECT node AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY node),
      |sig AS (
      |  SELECT doc_id,
      |    0.5 * least(CAST(len(text) AS DOUBLE) / 400.0, 1.0)
      |    + 0.3 * (CAST(len(list_filter(string_split(text, ' '),
      |        w -> w IN ('the','a','an','of','and','or','to','in','is','it'))) AS DOUBLE)
      |        / len(string_split(text, ' ')))
      |    + 0.2 * (1.0 - CAST(len(text) - len(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
      |        / len(text)) AS quality
      |  FROM documents),
      |ranked AS (
      |  SELECT cl.doc_id, cl.cluster_id, sig.quality,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY cl.cluster_id
      |      ORDER BY sig.quality DESC, cl.doc_id ASC) AS INT) AS rk
      |  FROM cl JOIN sig USING (doc_id))
      |SELECT doc_id, cluster_id, quality, rk = 1 AS is_survivor
      |FROM ranked ORDER BY doc_id ASC NULLS FIRST""".stripMargin

  /** Keep the d2 pair definition inline (sh CTE identical to d2Oracle)
    * so the closure runs over exactly the oracle-checked pair set.
    */
  val d6Oracle: String =
    """WITH RECURSIVE
      |sh AS (
      |  SELECT doc_id, lang,
      |    list_distinct(list_transform(
      |      list_zip(string_split(text,' ')[1:len(string_split(text,' '))-1],
      |               string_split(text,' ')[2:len(string_split(text,' '))]),
      |      p -> p[1] || ' ' || p[2])) AS s
      |  FROM documents WHERE doc_id < 60),
      |pairs AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
      |  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
      |      / len(list_distinct(list_concat(a.s, b.s))) >= 0.05),
      |edges AS (
      |  SELECT id_a AS a, id_b AS b FROM pairs
      |  UNION SELECT id_b, id_a FROM pairs),
      |reach(node, r) AS (
      |  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
      |  UNION
      |  SELECT e.a, r.r FROM edges e JOIN reach r ON r.node = e.b)
      |SELECT node AS doc_id, MIN(r) AS cluster_id,
      |  MIN(r) = node AS is_canonical
      |FROM reach
      |GROUP BY node
      |ORDER BY doc_id ASC NULLS FIRST""".stripMargin

  /** D7: benchmark-contamination check — which training documents share
    * word 4-grams with the held-out eval set (doc_id < 20 here stands
    * in for an external benchmark). The canonical pre-training hygiene
    * scan, shaped for scale: distinct n-grams per doc, inverted-index
    * equi-join on the n-gram (cardinality ~vocab^4 — never skewed),
    * partial-combined count aggregates. At 100 TB the eval side is tiny
    * and broadcasts; the train side is never shuffled whole.
    */
  def d7Contamination(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val n = 4
    // n-grams fingerprinted by the shared md5-60-bit byte-slice kernel
    // (the d10/tx_winnow primitive, oracle-mirrored in DuckDB): the
    // train↔eval equi-join keys on 8-byte longs, not gram STRINGS, and
    // the per-doc distinct runs in the same pass (sort+dedup of a
    // primitive array) instead of array_distinct over built strings.
    val grams = Q.t(spark, dir, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val md = graft.functions.GramHashes.newDigest()
        it.flatMap { case (id, text) =>
          graft.functions.GramHashes.distinctHashes(md, id, text, n) }
      }.toDF("doc_id", "ngram")
    val evalG = grams.filter(col("doc_id") < 20)
      .select(col("doc_id").as("eval_id"), col("ngram"))
    val trainG = grams.filter(col("doc_id") >= 20)
      .select(col("doc_id").as("train_id"), col("ngram"))
    // the eval suite is BOUNDED by construction (benchmark sets are
    // small; the corpus is not) — broadcast its n-gram index so the
    // train side never shuffles: the production contamination-check
    // shape at any corpus scale
    trainG.join(broadcast(evalG), Seq("ngram"))
      .groupBy(col("train_id"))
      .agg(
        countDistinct(col("eval_id")).as("n_eval_docs"),
        countDistinct(col("ngram")).as("n_shared_ngrams"))
      .filter(col("n_shared_ngrams") >= 2)
      .orderBy(col("train_id").asc)
  }

  val d7Oracle: String =
    """WITH grams AS (
      |  SELECT DISTINCT doc_id,
      |    CAST(('0x' || substr(md5(array_to_string(t[i:i+3], ' ')), 1, 15)) AS BIGINT) AS ngram
      |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |       UNNEST(generate_series(1, len(t)-3)) AS g(i)),
      |hits AS (
      |  SELECT tr.doc_id AS train_id, ev.doc_id AS eval_id, tr.ngram
      |  FROM grams tr JOIN grams ev USING (ngram)
      |  WHERE tr.doc_id >= 20 AND ev.doc_id < 20)
      |SELECT train_id,
      |  COUNT(DISTINCT eval_id) AS n_eval_docs,
      |  COUNT(DISTINCT ngram) AS n_shared_ngrams
      |FROM hits
      |GROUP BY train_id
      |HAVING COUNT(DISTINCT ngram) >= 2
      |ORDER BY train_id ASC NULLS FIRST""".stripMargin

  /** D8: fuzzy entity-resolution join — name pairs within Levenshtein
    * distance 3, candidate-generated by a blocking key (the last
    * token) so the comparison is per-block, never all-pairs: the
    * standard record-linkage shape. At 100 TB the blocking key is the
    * entire scalability story (per-block cost is quadratic); distance
    * is computed only inside blocks.
    */
  def d8FuzzyJoin(spark: SparkSession, dir: String): DataFrame = {
    val names = Q.t(spark, dir, "part").select(col("p_name")).distinct()
      .withColumn("block", element_at(split(col("p_name"), " "), -1))
    val a = names.select(col("p_name").as("name_a"), col("block"))
    val b = names.select(col("p_name").as("name_b"), col("block"))
    a.join(b, Seq("block"))
      .filter(col("name_a") < col("name_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= 3)
      .select(col("name_a"), col("name_b"), col("dist"))
      .orderBy(col("name_a").asc, col("name_b").asc)
  }

  val d8Oracle: String =
    """WITH names AS (
      |  SELECT DISTINCT p_name, string_split(p_name, ' ')[-1] AS block
      |  FROM part)
      |SELECT a.p_name AS name_a, b.p_name AS name_b,
      |  CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
      |FROM names a JOIN names b
      |  ON a.block = b.block AND a.p_name < b.p_name
      |WHERE levenshtein(a.p_name, b.p_name) <= 3
      |ORDER BY name_a ASC NULLS FIRST, name_b ASC NULLS FIRST""".stripMargin

  /** D14: entity-resolution CLUSTERS — the composed ER pipeline d8's
    * pairwise stage feeds: blocking-key Levenshtein pairs → connected
    * components → one canonical surviving name (lexicographic min) per
    * entity cluster. The full dedup-merge step of a master-data /
    * catalog-conformance job, end to end. Same candidate-bounded
    * shapes as d8 + H8; the closure oracle is the d6 recursive-CTE
    * pattern over string nodes.
    */
  def d14ErClusters(spark: SparkSession, dir: String): DataFrame = {
    val names = Q.t(spark, dir, "part").select(col("p_name")).distinct()
      .withColumn("block", element_at(split(col("p_name"), " "), -1))
    val a = names.select(col("p_name").as("name_a"), col("block"))
    val b = names.select(col("p_name").as("name_b"), col("block"))
    val pairs = a.join(b, Seq("block"))
      .filter(col("name_a") < col("name_b"))
      .filter(levenshtein(col("name_a"), col("name_b")) <= 3)
      .select("name_a", "name_b")
    DedupOps.connectedComponents(pairs, "name_a", "name_b")
      .select(col("node").as("p_name"), col("cluster_id").as("canonical"),
        (col("cluster_id") === col("node")).as("is_canonical"))
      .orderBy(col("p_name").asc)
  }

  val d14Oracle: String =
    """WITH RECURSIVE
      |names AS (
      |  SELECT DISTINCT p_name, string_split(p_name, ' ')[-1] AS block
      |  FROM part),
      |pairs AS (
      |  SELECT a.p_name AS name_a, b.p_name AS name_b
      |  FROM names a JOIN names b
      |    ON a.block = b.block AND a.p_name < b.p_name
      |  WHERE levenshtein(a.p_name, b.p_name) <= 3),
      |edges AS (
      |  SELECT name_a AS a, name_b AS b FROM pairs
      |  UNION SELECT name_b, name_a FROM pairs),
      |reach(node, r) AS (
      |  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
      |  UNION
      |  SELECT e.a, r.r FROM edges e JOIN reach r ON r.node = e.b)
      |SELECT node AS p_name, MIN(r) AS canonical,
      |  MIN(r) = node AS is_canonical
      |FROM reach
      |GROUP BY node
      |ORDER BY p_name ASC NULLS FIRST""".stripMargin

  /** D9: triangle listing over the embedding near-dup graph — the
    * classic distributed graph-analytics kernel (clustering
    * coefficient, community density). Edges are oriented id_a < id_b
    * so each triangle is enumerated exactly once as a < b < c; the
    * two joins are equi-joins on node ids (shuffle-partitioned by id,
    * no cartesian). At scale the standard refinement is
    * degree-ordering the orientation so high-degree hubs don't fan
    * out — same plan shape.
    */
  def d9Triangles(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.{CosineSimilarity, VectorOps}
    val emb = Q.t(spark, dir, "embeddings")
      .filter(col("vec_id") < 100)
      .select(col("vec_id"), VectorOps.toDouble(col("embedding")).as("v"))
    val a = emb.select(col("vec_id").as("id_a"), col("v").as("v_a"))
    val b = emb.select(col("vec_id").as("id_b"), col("v").as("v_b"))
    // materialize the O(n²) similarity join ONCE: referenced three ways
    // below, an uncached plan would re-run the cosine pass per leg
    val e = a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos",
        round(CosineSimilarity.cosine(spark, col("v_a"), col("v_b")), 6))
      .filter(col("cos") >= 0.25)
      .select("id_a", "id_b")
      .localCheckpoint(true)
    e.as("e1")
      .join(e.as("e2"), col("e1.id_b") === col("e2.id_a"))
      .join(e.as("e3"),
        col("e3.id_a") === col("e1.id_a") && col("e3.id_b") === col("e2.id_b"))
      .select(col("e1.id_a").as("a"), col("e1.id_b").as("b"),
        col("e2.id_b").as("c"))
      .orderBy(col("a").asc, col("b").asc, col("c").asc)
  }

  val d9Oracle: String = {
    val cos = s"round(${dotSql("a.v", "b.v")} / (sqrt(${dotSql("a.v", "a.v")}) * sqrt(${dotSql("b.v", "b.v")})), 6)"
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
       |           FROM embeddings WHERE vec_id < 100),
       |ed AS (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
       |  FROM e a JOIN e b ON a.vec_id < b.vec_id
       |  WHERE $cos >= 0.25)
       |SELECT e1.id_a AS a, e1.id_b AS b, e2.id_b AS c
       |FROM ed e1 JOIN ed e2 ON e1.id_b = e2.id_a
       |JOIN ed e3 ON e3.id_a = e1.id_a AND e3.id_b = e2.id_b
       |ORDER BY a ASC NULLS FIRST, b ASC NULLS FIRST, c ASC NULLS FIRST""".stripMargin
  }

  /** D11: SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient
    * learning at web-scale through semantic deduplication") — drop
    * documents whose EMBEDDINGS nearly coincide, comparing only
    * WITHIN k-means clusters: cluster the corpus, compute pairwise
    * cosine inside each cluster, connect pairs ≥ τ, keep one
    * canonical survivor (min id) per component. The semantic layer
    * above d1 (exact text) and d2/d3 (lexical n-grams): catches
    * paraphrases and template rewrites that share no shingles.
    *
    * Scale shape: the all-pairs comparison is confined to clusters
    * (quadratic in CLUSTER size, k clusters in parallel — the paper's
    * exact trick); assignment is the IVF map-side `max_by` argmax, so
    * the corpus pass never sort-shuffles vectors. Iterative float
    * clustering → rows-only gate; DedupSpec plants paraphrase pairs
    * and asserts survivors, and bounds the comparison count.
    */
  def d11SemDedup(spark: SparkSession, dir: String,
      k: Int = 16, tau: Double = 0.95): DataFrame = {
    val emb = graft.queries.Similarity.unitVectors(spark, dir)
    val seeds = emb.filter(col("vec_id") % 31 === 0)
      .orderBy(col("vec_id").asc).limit(k)
      .select(col("vec_id").as("cluster_id"), col("v").as("seed_v"))
    semDedup(spark, emb, seeds, tau)
  }

  /** Core SemDeDup over an explicit `(vec_id, v)` unit-vector frame and
    * `(cluster_id, seed_v)` seed frame — split out so specs can plant
    * paraphrase embeddings and drive the cluster geometry directly.
    */
  private[graft] def semDedup(spark: SparkSession, emb: DataFrame,
      seeds: DataFrame, tau: Double): DataFrame = {
    import graft.functions.{CosineSimilarity, DedupOps}
    // map-side argmax assignment through the native ivfNearestLists
    // kernel (same (sim desc, cluster_id asc) tie-break): the previous
    // crossJoin+max_by form blew each vector up ×k and aggregated
    // vector-carrying structs — the exact shape the kernel's doc
    // measures at ~20× slower on a corpus-wide pass. Seeds are
    // unit-normalized so dot ranking ≡ cosine ranking per fixed row.
    val seedArr = graft.queries.Similarity
      .collectSeeds(seeds.select(col("cluster_id").as("list_id"),
        col("seed_v")))
      .map { case (cid, raw) =>
        val nrm = math.sqrt(raw.map(x => x * x).sum)
        (cid, if (nrm == 0.0) raw else raw.map(_ / nrm))
      }
    // materialized ONCE: three consumers (both pair sides + the final
    // keep-list) read it, and the old aggregate form's shuffle gave
    // them a reuse point the narrow kernel no longer does
    val assigned = graft.queries.Similarity
      .ivfNearestLists(emb, seedArr, nprobe = 1, keepV = true)
      .select(col("vec_id"), col("list_id").as("cluster_id"), col("v"))
      .localCheckpoint(true)
    // within-cluster pairs only (the bounded quadratic)
    val a = assigned.select(col("cluster_id"), col("vec_id").as("id_a"),
      col("v").as("v_a"))
    val b = assigned.select(col("cluster_id"), col("vec_id").as("id_b"),
      col("v").as("v_b"))
    val pairs = a.join(b, Seq("cluster_id"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", CosineSimilarity.cosine(spark, col("v_a"), col("v_b")))
      .filter(col("cos") >= tau)
      .select("id_a", "id_b")
    val clusters = DedupOps.connectedComponents(pairs, "id_a", "id_b")
    assigned.select(col("vec_id"))
      .join(clusters.withColumnRenamed("node", "vec_id"), Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("cluster_id"), col("vec_id")).as("group_id"),
        (coalesce(col("cluster_id"), col("vec_id")) === col("vec_id"))
          .as("is_kept"))
      .orderBy(col("vec_id").asc)
  }

  /** D12: incremental-ingest dedup — the arriving-batch-vs-historical-
    * corpus pass every continuously-crawled training corpus runs: keep
    * only batch docs whose content fingerprint is NEW (not in the
    * corpus, not earlier in the batch). Corpus = docs with
    * doc_id % 10 ≠ 0; batch = the rest plus re-crawled copies of every
    * corpus doc with doc_id % 7 = 1 (the realistic duplicate source).
    *
    * Scale shape — the reason this is not just an anti-join: the
    * corpus fingerprint set is corpus-sized, and shuffling it against
    * every small arriving batch is the thing a production pipeline
    * cannot afford. Instead a bloom over corpus fingerprints (built
    * once per corpus version, a few MB broadcast) prunes the batch
    * map-side: rows testing NEGATIVE are definitely new and skip the
    * join entirely; only the positive residue (true dups + the bloom's
    * false-positive sliver) pays the exact confirming anti-join — so
    * the result is still EXACT, byte-equal to the plain anti-join
    * oracle, while the join's probe side shrinks from |batch| to
    * |dups| + ε. LlmOpsSpec asserts both the equivalence and the
    * actual pruning ratio.
    */
  def d12IncrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.DedupOps
    val docs = Q.t(spark, dir, "documents").select("doc_id", "text")
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
      .withColumn("fp", md5(col("text").cast("binary")))
    val recrawled = corpus.filter(col("doc_id") % 7 === 1)
      .select((col("doc_id") + 2000000L).as("doc_id"), col("fp"))
    val batch = docs.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), md5(col("text").cast("binary")).as("fp"))
      .unionByName(recrawled)
    val bits = 1 << 16
    val hashes = 6
    val words = DedupOps.bloomWords(corpus, col("fp"), bits, hashes)
    val flagged = batch.withColumn("maybe_seen",
      DedupOps.maybeInBloom(words, bits, hashes, col("fp")))
    val definitelyNew = flagged.filter(!col("maybe_seen")).drop("maybe_seen")
    val confirmed = flagged.filter(col("maybe_seen")).drop("maybe_seen")
      .join(corpus.select("fp"), Seq("fp"), "left_anti")
    DedupOps.dedupByFingerprint(
      definitelyNew.unionByName(confirmed), col("fp"), "doc_id")
      .select("doc_id", "fp")
      .orderBy(col("doc_id").asc)
  }

  val d12Oracle: String =
    """WITH corpus AS (
      |  SELECT doc_id, md5(text) AS fp FROM documents WHERE doc_id % 10 <> 0),
      |batch AS (
      |  SELECT doc_id, md5(text) AS fp FROM documents WHERE doc_id % 10 = 0
      |  UNION ALL
      |  SELECT doc_id + 2000000, fp FROM corpus WHERE doc_id % 7 = 1),
      |fresh AS (
      |  SELECT b.doc_id, b.fp FROM batch b
      |  WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.fp = b.fp))
      |SELECT doc_id, fp FROM (
      |  SELECT doc_id, fp, ROW_NUMBER() OVER (PARTITION BY fp
      |    ORDER BY doc_id ASC NULLS FIRST) AS rn
      |  FROM fresh)
      |WHERE rn = 1
      |ORDER BY doc_id ASC NULLS FIRST""".stripMargin

  /** G1: PageRank centrality over the near-dup graph — which doc is
    * the HUB of its duplication neighborhood (the principled canonical-
    * survivor choice where d6's min-id rule is arbitrary). Undirected:
    * both orientations feed the directed engine. Deterministic
    * structure but iterative float sums → rows-only gate; closed-form
    * and conservation properties are GraphOpsSpec's job.
    */
  def g1PageRank(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.GraphOps
    val pairs = d2JaccardPairs(spark, dir).select("id_a", "id_b")
    val both = pairs.unionByName(
      pairs.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
    GraphOps.pageRank(both, "id_a", "id_b", damping = 0.85, iters = 10)
      .select(col("node").as("doc_id"), round(col("rank"), 9).as("rank"))
      .orderBy(col("rank").desc, col("doc_id").asc)
  }

  /** D10: exact substring-span dedup (the Lee et al. 2022 "Deduplicating
    * Training Data" exact-substring pass, at word granularity): every
    * 5-token span occurrence whose TEXT occurs ≥2 times anywhere in the
    * corpus (another doc or another position of the same doc) is a
    * duplicated span; report per-doc span counts and duplicated
    * fraction. The production decontamination signal between exact-doc
    * dedup (d1) and fuzzy near-dup (d2/d3): catches boilerplate and
    * quotation reuse that whole-doc hashing misses.
    *
    * Scale shape: explode to (span-text, doc, pos) occurrences, ONE
    * hash aggregation keyed by span text for corpus-wide frequency
    * (map-side combined), broadcast-size join back per occurrence —
    * never an all-pairs doc comparison. At 100 TB the span-frequency
    * table is the big intermediate; it shards by span hash with no skew
    * beyond natural boilerplate (cap-able by doc-frequency like d2).
    */
  def d10SpanDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val n = 5
    // span = 5-token gram, fingerprinted by the shared md5-60-bit
    // byte-slice kernel ([[graft.functions.GramHashes]], the tx_winnow
    // primitive): the corpus-wide frequency shuffle moves 8-byte
    // longs, not span STRINGS (~4× the bytes), and the HOF
    // transform/array_join/explode that built those strings
    // interpreted per row is gone. Cross-engine: the oracle hashes
    // identically in DuckDB, so occurrence counts agree bit for bit
    // (60-bit fingerprints — see the kernel's collision note).
    val spans = Q.t(spark, dir, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val md = graft.functions.GramHashes.newDigest()
        it.flatMap { case (id, text) =>
          graft.functions.GramHashes.hashes(md, text, n).iterator
            .map(h => (id, h))
        }
      }.toDF("doc_id", "span")
    // corpus-wide frequency via a whole-partition window: ONE shuffle
    // keyed by span hash (vs the groupBy+self-join form's two passes
    // over the exploded spans)
    val withOcc = spans.withColumn("occ",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("span"))))
    withOcc
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_spans"),
        sum(when(col("occ") >= 2, 1L).otherwise(0L)).as("n_dup_spans"))
      .filter(col("n_dup_spans") > 0)
      .select(col("doc_id"), col("n_spans"), col("n_dup_spans"),
        (col("n_dup_spans").cast("double") / col("n_spans").cast("double"))
          .as("dup_fraction"))
      .orderBy(col("doc_id").asc)
  }

  val d10Oracle: String =
    """WITH spans AS (
      |  SELECT doc_id,
      |    CAST(('0x' || substr(md5(array_to_string(t[i:i+4], ' ')), 1, 15)) AS BIGINT) AS span
      |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |       UNNEST(generate_series(1, len(t)-4)) AS g(i)),
      |freq AS (SELECT span, COUNT(*) AS occ FROM spans GROUP BY span)
      |SELECT doc_id, n_spans, n_dup_spans,
      |  CAST(n_dup_spans AS DOUBLE) / CAST(n_spans AS DOUBLE) AS dup_fraction
      |FROM (
      |  SELECT s.doc_id, COUNT(*) AS n_spans,
      |    CAST(SUM(CASE WHEN f.occ >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans
      |  FROM spans s JOIN freq f USING (span)
      |  GROUP BY s.doc_id)
      |WHERE n_dup_spans > 0
      |ORDER BY doc_id ASC NULLS FIRST""".stripMargin

  /** D17: exact substring-CONTAINMENT dedup — which documents' full
    * token sequence appears verbatim as a contiguous run inside
    * another document (truncated re-crawls, quoted-in-full posts,
    * page-within-aggregate shells: the pairs exact-hash dedup misses
    * because the container has extra text). Candidate generation is
    * exact, not probabilistic: if a ⊂ b then a's FIRST word-8-gram is
    * one of b's word-8-grams, so one inverted-index equi-join on the
    * shared md5-60-bit gram kernel (d7's) yields a complete candidate
    * set — at most one candidate row per (contained, container) pair,
    * since per-container grams are distinct. Verification is a single
    * space-guarded `contains` on the candidate pairs only.
    *
    * Scale: the gram index is linear in corpus tokens (d7's cost
    * class) and the anchor side is one row per document; nothing is
    * ever all-pairs. A boilerplate anchor gram (a hot first sentence)
    * fans out exactly to its true candidates — that set is the
    * answer's lower bound, not avoidable work — and AQE's skew split
    * handles the join imbalance. Documents under 8 tokens have no
    * anchor and are skipped (both engines agree).
    */
  def d17Containment(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val k = 8
    val docs = Q.t(spark, dir, "documents").select(col("doc_id"), col("text"))
    val byId = docs.as[(Long, String)]
    // inverted index: every DISTINCT word-8-gram hash per document
    // (the shared d7 kernel)
    val grams = byId.mapPartitions { it =>
      val md = graft.functions.GramHashes.newDigest()
      it.flatMap { case (id, text) =>
        graft.functions.GramHashes.distinctHashes(md, id, text, k) }
    }.toDF("container_id", "gram")
    // anchor: each document's FIRST 8-gram (absent for short docs) —
    // one digest over the prefix slice, not a full hashes() pass
    val anchors = byId.mapPartitions { it =>
      val md = graft.functions.GramHashes.newDigest()
      it.flatMap { case (id, text) =>
        graft.functions.GramHashes.firstGramHash(md, text, k).map(id -> _) }
    }.toDF("contained_id", "gram")
    val cand = anchors.join(grams, Seq("gram"))
      .filter(col("contained_id") =!= col("container_id"))
      .select("contained_id", "container_id")
    // verify candidates only: guarded contains = "a's tokens are a
    // contiguous run of b's tokens" (guards pin word boundaries)
    cand
      .join(docs.select(col("doc_id").as("contained_id"),
        col("text").as("text_a")), Seq("contained_id"))
      .join(docs.select(col("doc_id").as("container_id"),
        col("text").as("text_b")), Seq("container_id"))
      .filter(contains(concat(lit(" "), col("text_b"), lit(" ")),
        concat(lit(" "), col("text_a"), lit(" "))))
      .select("contained_id", "container_id")
      .orderBy(col("contained_id").asc, col("container_id").asc)
  }

  val d17Oracle: String =
    """WITH toks AS (
      |  SELECT doc_id, text, string_split(text, ' ') AS t FROM documents),
      |grams AS (
      |  SELECT DISTINCT doc_id AS container_id,
      |    CAST(('0x' || substr(md5(array_to_string(t[i:i+7], ' ')), 1, 15)) AS BIGINT) AS gram
      |  FROM toks, UNNEST(generate_series(1, len(t)-7)) AS g(i)),
      |anchors AS (
      |  SELECT doc_id AS contained_id,
      |    CAST(('0x' || substr(md5(array_to_string(t[1:8], ' ')), 1, 15)) AS BIGINT) AS gram
      |  FROM toks WHERE len(t) >= 8),
      |cand AS (
      |  SELECT a.contained_id, g.container_id
      |  FROM anchors a JOIN grams g USING (gram)
      |  WHERE a.contained_id <> g.container_id)
      |SELECT c.contained_id, c.container_id
      |FROM cand c
      |JOIN documents da ON da.doc_id = c.contained_id
      |JOIN documents db ON db.doc_id = c.container_id
      |WHERE contains(' ' || db.text || ' ', ' ' || da.text || ' ')
      |ORDER BY contained_id ASC NULLS FIRST, container_id ASC NULLS FIRST""".stripMargin

  /** D18: NEAR-containment dedup — the containment coefficient
    * C(a, b) = |Sa ∩ Sb| / |Sa| over distinct bigram shingles, the
    * ASYMMETRIC cousin of d2's Jaccard: a truncated re-crawl with a
    * few edits scores C ≈ 1 against its source while its Jaccard can
    * sit far below any dedup threshold (the denominators differ), and
    * its edits defeat d17's exact form. Corpus: docs < 60 plus planted
    * 60%-prefix truncations with one appended edit word, so the 0.8
    * threshold has real asymmetric matches. Candidates come from the
    * d2 inverted shingle index (lossless: C ≥ 0.8 > 0 ⟹ a shared
    * shingle) but DIRECTIONAL (id_a ≠ id_b, not <): containment is not
    * symmetric. Scale: identical to d2 — equi-join keyed by shingle
    * (cardinality O(vocab)), per-pair verify on the candidate set
    * only; the 100 TB knob is the same document-frequency cap on
    * ultra-common shingles.
    */
  def d18FuzzyContainment(spark: SparkSession, dir: String): DataFrame = {
    val base = Q.t(spark, dir, "documents")
      .filter(col("doc_id") < 60).select(col("doc_id"), col("text"))
    val nTok = size(split(col("text"), " "))
    val corpus = base.unionByName(
      base.select((col("doc_id") + 200000L).as("doc_id"),
        concat(array_join(slice(split(col("text"), " "), lit(1),
          greatest(ceil(nTok * 0.6), lit(8)).cast("int")), " "),
          lit(" editword")).as("text")))
      .select(col("doc_id"), DedupOps.shingles(col("text")).as("sh"))
      // a doc with < 2 tokens has NO bigram shingles: its containment
      // is 0/0 — undefined. Drop such docs from the corpus explicitly
      // (both engines) rather than leave the definition to NaN
      // semantics: DuckDB orders NaN above 0.8 and would emit spurious
      // oracle rows the inverted index (correctly) never produces.
      .filter(size(col("sh")) > 0)
    val inv = corpus.select(col("doc_id"), explode(col("sh")).as("shingle"))
    val cands = inv.select(col("doc_id").as("id_a"), col("shingle"))
      .join(inv.select(col("doc_id").as("id_b"), col("shingle")),
        Seq("shingle"))
      .filter(col("id_a") =!= col("id_b"))
      .select("id_a", "id_b").distinct()
    val a = corpus.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val b = corpus.select(col("doc_id").as("id_b"), col("sh").as("sh_b"))
    cands.join(a, Seq("id_a")).join(b, Seq("id_b"))
      .withColumn("containment",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
          / size(col("sh_a")))
      .filter(col("containment") >= 0.8)
      .select("id_a", "id_b", "containment")
      .orderBy(col("id_a").asc, col("id_b").asc)
  }

  val d18Oracle: String =
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents WHERE doc_id < 60
      |  UNION ALL
      |  SELECT doc_id + 200000,
      |    array_to_string(t[1:GREATEST(CAST(ceil(len(t) * 0.6) AS INT), 8)], ' ')
      |      || ' editword'
      |  FROM (SELECT doc_id, string_split(text, ' ') AS t
      |        FROM documents WHERE doc_id < 60)),
      |sh AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(
      |      list_zip(string_split(text,' ')[1:len(string_split(text,' '))-1],
      |               string_split(text,' ')[2:len(string_split(text,' '))]),
      |      p -> p[1] || ' ' || p[2])) AS s
      |  FROM corpus)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(a.s)
      |    AS containment
      |FROM sh a JOIN sh b ON a.doc_id <> b.doc_id
      |WHERE len(a.s) > 0 AND len(b.s) > 0
      |  AND CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(a.s) >= 0.8
      |ORDER BY id_a ASC NULLS FIRST, id_b ASC NULLS FIRST""".stripMargin

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d17_containment" -> d17Containment,
    "d18_fuzzy_containment" -> d18FuzzyContainment,
    "d8_fuzzy_join" -> d8FuzzyJoin,
    "d10_span_dedup" -> d10SpanDedup,
    "g1_pagerank" -> g1PageRank,
    "d11_semdedup" -> ((s, d) => d11SemDedup(s, d)),
    "d12_incr_dedup" -> d12IncrementalDedup,
    "d13_prefix_jaccard" -> ((s, d) => d13PrefixJaccard(s, d)),
    "d14_er_clusters" -> d14ErClusters,
    "d15_survivor_pick" -> d15SurvivorPick,
    "d9_triangles" -> d9Triangles,
    "d1_exact_dedup" -> d1ExactContent,
    "d2_jaccard_pairs" -> d2JaccardPairs,
    "d3_minhash_lsh" -> d3MinhashLsh,
    "d3b_minhash_exact" -> d3bMinhashExact,
    "d16_incr_lsh" -> d16IncrLsh,
    "d4_simhash" -> d4Simhash,
    "d5_embedding_neardup" -> d5EmbeddingNearDup,
    "d6_dup_clusters" -> d6DupClusters,
    "d7_contamination" -> d7Contamination)

  override def oracles: Map[String, String] = Map(
    "d17_containment" -> d17Oracle,
    "d18_fuzzy_containment" -> d18Oracle,
    "d10_span_dedup" -> d10Oracle,
    "d12_incr_dedup" -> d12Oracle,
    "d13_prefix_jaccard" -> d13Oracle,
    "d14_er_clusters" -> d14Oracle,
    "d15_survivor_pick" -> d15Oracle,
    "d1_exact_dedup" -> d1Oracle,
    "d2_jaccard_pairs" -> d2Oracle,
    "d3b_minhash_exact" -> d3bOracle,
    "d16_incr_lsh" -> d16Oracle,
    "d4_simhash" -> d4Oracle,
    "d5_embedding_neardup" -> d5Oracle,
    "d6_dup_clusters" -> d6Oracle,
    "d7_contamination" -> d7Oracle,
    "d8_fuzzy_join" -> d8Oracle,
    "d9_triangles" -> d9Oracle)
}

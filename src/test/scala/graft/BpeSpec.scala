package graft

import graft.functions.Bpe
import graft.operators.BpeTrainer
import org.apache.spark.sql.functions._

/** BPE trainer/encoder gates: reference-implementation parity (an
  * independent single-node list-based BPE here, vs the distributed
  * bracket-string form), a hand-derived Sennrich-style fixture anchor,
  * parallelism invariance, encode/decode roundtrip, and the fixed-merge
  * query surface.
  */
class BpeSpec extends SparkTestBase {
  quiet()
  import spark.implicits._

  // ---- independent single-node reference (list-of-symbols form) ----

  private def refWords(docs: Seq[String]): Map[List[String], Long] =
    docs
      .flatMap(_.replaceAll("[\\x00-\\x1F\\x7F]", "").split(" "))
      .filter(_.nonEmpty)
      .groupBy(identity).view
      .map { case (w, occ) =>
        (w.map(_.toString).toList :+ Bpe.W) -> occ.size.toLong
      }.toMap

  private def refPairCounts(
      wc: Map[List[String], Long]): Map[(String, String), Long] = {
    val m = scala.collection.mutable.Map.empty[(String, String), Long]
    for ((syms, c) <- wc; i <- 0 until syms.length - 1)
      m((syms(i), syms(i + 1))) = m.getOrElse((syms(i), syms(i + 1)), 0L) + c
    m.toMap
  }

  /** Greedy left-to-right merge of one pair — the list-form twin of the
    * non-overlapping literal replace.
    */
  private def refApply(syms: List[String], l: String,
      r: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toList
  }

  private def refTrain(docs: Seq[String],
      n: Int): Seq[(String, String, Long)] = {
    var wc = refWords(docs)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var stop = false
    while (merges.size < n && !stop) {
      val pc = refPairCounts(wc).filter(_._2 >= 2)
      if (pc.isEmpty) stop = true
      else {
        val ((l, r), c) = pc.minBy { case ((l, r), c) => (-c, l, r) }
        merges += ((l, r, c))
        wc = wc.toSeq
          .map { case (syms, cnt) => refApply(syms, l, r) -> cnt }
          .groupBy(_._1).view.map { case (k, v) => k -> v.map(_._2).sum }
          .toMap
      }
    }
    merges.toSeq
  }

  private def refEncode(text: String,
      merges: Seq[(String, String)]): List[String] =
    text.replaceAll("[\\x00-\\x1F\\x7F]", "").split(" ").filter(_.nonEmpty)
      .toList.flatMap { w =>
        merges.foldLeft(w.map(_.toString).toList :+ Bpe.W) {
          case (syms, (l, r)) => refApply(syms, l, r)
        }
      }

  private val fixture = Seq(
    "low low low low low",
    "lower lower newest",
    "newest newest newest newest newest",
    "widest widest widest")

  test("fixture: first merges match the hand-derived Sennrich sequence") {
    // counts: low×5, lower×2, newest×6, widest×3
    // (e,s) occurs in newest(6)+widest(3)=9, (s,t) the same 9,
    // (t,</w>) 9; tie-break is lexicographic asc on (l, r):
    // ("e","s") < ("s","t") < ("t",W) -> first merge (e, s)
    // then (es,t) 9 wins over (t,</w>) 9 lexicographically;
    // then (est,</w>) 9; then (l,o) low 5 + lower 2 = 7; then (lo,w) 7.
    val got = refTrain(fixture, 5).map(m => (m._1, m._2, m._3))
    assert(got == Seq(
      ("e", "s", 9L), ("es", "t", 9L), ("est", Bpe.W, 9L),
      ("l", "o", 7L), ("lo", "w", 7L)))
  }

  test("distributed trainer matches the reference merge-for-merge") {
    val docs = fixture.toDF("text")
    val dist = BpeTrainer.train(docs, numMerges = 10)
      .map(m => (m.left, m.right, m.freq))
    assert(dist == refTrain(fixture, 10))
  }

  test("training is invariant to input partitioning") {
    val docs = fixture.toDF("text")
    val a = BpeTrainer.train(docs.repartition(7), numMerges = 8)
    val b = BpeTrainer.train(docs.coalesce(1), numMerges = 8)
    assert(a == b)
  }

  test("distributed trainer matches reference on real corpus text") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .orderBy("doc_id").limit(40).cache()
    val texts = docs.select("text").as[String].collect().toSeq
    val dist = BpeTrainer.train(docs, numMerges = 12)
      .map(m => (m.left, m.right, m.freq))
    assert(dist == refTrain(texts, 12))
    docs.unpersist()
  }

  test("fixed-merge encode matches the reference token stream") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .orderBy("doc_id").limit(60)
    val got = docs
      .select(col("doc_id"), Bpe.render(
        Bpe.applyMerges(Bpe.wrapText(col("text")), Bpe.FixedMerges))
        .as("enc"))
      .orderBy("doc_id")
      .as[(Long, String)].collect()
    val want = docs.select("doc_id", "text").orderBy("doc_id")
      .as[(Long, String)].collect()
      .map { case (id, t) =>
        id -> refEncode(t, Bpe.FixedMerges)
          .mkString(" ").replace(Bpe.W, "</w>")
      }
    assert(got.toSeq == want.toSeq)
  }

  test("learned-merge encode roundtrips to the sanitized words") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(50)
    val merges = BpeTrainer.train(docs, numMerges = 15)
      .map(m => (m.left, m.right))
    val enc = Bpe.render(Bpe.applyMerges(Bpe.wrapText(col("text")), merges))
    // drop inter-token spaces, turn each end-of-word into one space:
    // the original words (multi-space collapsed) must come back exactly
    val rebuilt = trim(replace(replace(enc, lit(" "), lit("")),
      lit("</w>"), lit(" ")))
    val words = concat_ws(" ",
      filter(split(Bpe.sanitize(col("text")), " "), w => w =!= ""))
    val bad = docs.select(rebuilt.as("a"), words.as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(bad == 0)
  }

  test("merge count monotonicity: more merges never increase tokens") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(80)
    val merges = BpeTrainer.train(docs, numMerges = 10)
      .map(m => (m.left, m.right))
    val w = Bpe.wrapText(col("text"))
    val rows = docs.select(
      Bpe.nTokens(w).as("n0"),
      Bpe.nTokens(Bpe.applyMerges(w, merges.take(5))).as("n5"),
      Bpe.nTokens(Bpe.applyMerges(w, merges)).as("n10"))
      .filter(col("n5") > col("n0") || col("n10") > col("n5")).count()
    assert(rows == 0)
  }

  test("tx_bpe queries execute with sane shapes") {
    val train = SparkEntry.queries("tx_bpe_train")(spark, sf)
    val t = train.collect()
    assert(t.length == 16)
    assert(t.map(_.getInt(0)).toSeq == (0 until 16))
    val pipe = SparkEntry.queries("tx_bpe_pipeline")(spark, sf).collect()
    assert(pipe.nonEmpty)
    // every language compresses (>= 1.0 by construction: merges only
    // ever shrink the stream)
    assert(pipe.forall(_.getAs[Double]("compression") >= 1.0))
    // encode stays whole-stage-codegen: a narrow map, no UDF
    // (execute first — under AQE the final plan exists only after)
    val encDf = SparkEntry.queries("tx_bpe_encode")(spark, sf)
    encDf.collect()
    val plan = encDf.queryExecution.executedPlan.toString
    // "*(n)" is the whole-stage-codegen span marker in the plan tree
    assert(plan.contains("*("))
    assert(!plan.toLowerCase.contains("batchevalpython"))
  }
}

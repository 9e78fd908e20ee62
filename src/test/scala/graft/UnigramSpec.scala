package graft

import graft.operators.UnigramTrainer
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer gates: distributed-vs-serial equality (the
  * integer-count hard-EM makes it an exact match, not a tolerance),
  * run-to-run determinism, single-char coverage, toy-corpus learning
  * (the planted motif must win the multi-char ranking), Viterbi
  * round-trip, and the encode surface.
  */
class UnigramSpec extends SparkTestBase {
  quiet()
  import spark.implicits._

  private def toyDocs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("distributed training equals the serial reference exactly") {
    val docs = toyDocs(
      1L -> "banana bandana cabana banana",
      2L -> "an ban can bananas bandanas",
      3L -> "a cabana banana and a bandana")
    val dist = UnigramTrainer.train(docs, targetVocab = 12,
      emRounds = 3, seedSize = 100)
    // serial reference over the SAME word-frequency table
    val words = docs
      .select(explode(split(graft.functions.Bpe.sanitize(col("text")), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .as[(String, Long)].collect().toSeq
    val serial = UnigramTrainer.trainSerial(words, targetVocab = 12,
      emRounds = 3, seedSize = 100)
    assert(dist === serial)
  }

  test("training is deterministic across runs and parallelism") {
    val docs = toyDocs(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "the quicker brown foxes jump over lazy dogs",
      3L -> "quick quick brown brown the the the fox")
    val a = UnigramTrainer.train(docs, targetVocab = 20, seedSize = 200)
    val b = UnigramTrainer.train(docs.repartition(7), targetVocab = 20,
      seedSize = 200)
    assert(a === b)
  }

  test("every corpus character survives as a single-char piece") {
    val docs = toyDocs(1L -> "xyzzy plugh", 2L -> "abc abc qq")
    val vocab = UnigramTrainer.train(docs, targetVocab = 5,
      emRounds = 2, seedSize = 50)
    val pieces = vocab.map(_.piece).toSet
    val chars = "xyzzyplughabcqq".map(_.toString).toSet
    assert(chars.subsetOf(pieces),
      s"missing singles: ${chars -- pieces}")
    // coverage floor: zero-count singles carry a finite log-prob
    assert(vocab.forall(e => !e.logProb.isNaN && !e.logProb.isInfinite))
  }

  test("a planted repeated motif wins the multi-char ranking") {
    val motif = "banana "
    val docs = toyDocs(
      1L -> (motif * 30).trim,
      2L -> "ba na bandana cab",
      3L -> (motif * 10).trim)
    val vocab = UnigramTrainer.train(docs, targetVocab = 15,
      emRounds = 3, seedSize = 100)
    val topMulti = vocab.filter(_.piece.length > 1).head
    assert(topMulti.piece === "banana",
      s"expected 'banana' to dominate, got ${vocab.take(8)}")
  }

  test("Viterbi segmentation round-trips every corpus word") {
    val docs = toyDocs(
      1L -> "interoperability reproducibility tokenization",
      2L -> "token piece pieces tokenizer")
    val vocab = UnigramTrainer.train(docs, targetVocab = 30,
      emRounds = 2, seedSize = 200)
    val table = new java.util.HashMap[String, java.lang.Double]()
    vocab.foreach(e => table.put(e.piece, e.logProb))
    val words = Seq("interoperability", "reproducibility", "tokenization",
      "token", "piece", "pieces", "tokenizer")
    words.foreach { w =>
      val segs = UnigramTrainer.segment(w, table, 8, -100.0)
      assert(segs.mkString === w, s"round-trip failed for $w: $segs")
    }
  }

  test("encodeCounts segments the corpus with the trained vocabulary") {
    val docs = toyDocs(
      1L -> "banana banana",
      2L -> "ban an a")
    val vocab = UnigramTrainer.train(docs, targetVocab = 10,
      emRounds = 2, seedSize = 100)
    val got = UnigramTrainer.encodeCounts(docs, vocab)
      .orderBy(col("doc_id")).as[(Long, Long)].collect().toSeq
    assert(got.map(_._1) === Seq(1L, 2L))
    // every document needs at least one piece per word, at most one
    // per character
    assert(got(0)._2 >= 2L && got(0)._2 <= 12L)
    assert(got(1)._2 >= 3L && got(1)._2 <= 6L)
    // a vocabulary that contains 'banana' whole should encode doc 1
    // in exactly 2 pieces
    if (vocab.exists(_.piece == "banana")) assert(got(0)._2 === 2L)
  }

  test("prune loop terminates on a tiny alphabet with targetVocab=1") {
    // ceil(size*shrink) == size for any size < 1/(1-shrink): a 2-char
    // alphabet seeds a 2-3 entry vocabulary that the default
    // shrink=0.75 cannot reduce by ceil-rounding alone, so without a
    // strict-progress clamp this loops forever (ADVICE r14). The
    // single-char floor (2) is the true stop size.
    val docs = toyDocs(1L -> "ab ab ab", 2L -> "ba ab")
    val got = UnigramTrainer.train(docs, targetVocab = 1, emRounds = 2,
      seedSize = 100)
    assert(got.map(_.piece).filter(_.length == 1).sorted === Seq("a", "b"))
    assert(got.length === 2)
    // same guarantee for the serial reference (identical loop)
    val serial = UnigramTrainer.trainSerial(
      Seq("ab" -> 4L, "ba" -> 1L), targetVocab = 1, emRounds = 2,
      seedSize = 100)
    assert(got === serial)
    // a shrink close to 1 (which require() allows) must also make
    // strict progress each round instead of spinning
    val slow = UnigramTrainer.trainSerial(
      Seq("abc" -> 3L, "bc" -> 2L), targetVocab = 4, emRounds = 1,
      seedSize = 100, shrink = 0.999)
    assert(slow.length === 4)
  }
}

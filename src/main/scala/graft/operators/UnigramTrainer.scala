package graft.operators

import graft.functions.Bpe
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer training (the SentencePiece unigram model,
  * Kudo ACL'18) — the other half of the tokenizer family next to
  * [[BpeTrainer]]: instead of greedily growing merges bottom-up, start
  * from a LARGE seed vocabulary of candidate substrings and shrink it
  * toward the target size while (hard-)EM re-estimates each piece's
  * probability from the corpus' best segmentations.
  *
  * This implementation is the deterministic hard-EM (Viterbi) variant:
  *
  *  - Seed: every substring of length ≤ `maxPieceLen` of the corpus'
  *    distinct words, occurrence-counted (weighted by word frequency);
  *    all single characters are kept unconditionally (coverage — every
  *    word stays segmentable), multi-character candidates keep the top
  *    `seedSize` by (count desc, piece asc).
  *  - E-step: per word, the max-likelihood segmentation under the
  *    current piece log-probs via Viterbi DP (O(len · maxPieceLen)
  *    per word; ties prefer the LONGER piece — a total, engine-free
  *    rule). Piece occurrences weighted by word frequency are counted
  *    as LONG integers — cross-partition aggregation is exact integer
  *    addition, so the result is bit-identical at any parallelism
  *    (float forward-backward expectations would not be).
  *  - M-step: probability(piece) = eff(count) / Σ eff(count) with a
  *    0.5 pseudo-count for zero-count survivors (kept single chars);
  *    both terms derive from integers, so probabilities are exact
  *    function values, not accumulation-order artifacts.
  *  - Prune: after each round the vocabulary shrinks by `shrink`
  *    toward `targetVocab` — single chars always survive; multi-char
  *    pieces rank by (count desc, piece asc).
  *
  * Scale shape: the corpus is touched once (distinct-word frequency
  * table, Zipf ≪ corpus); each EM round is one mapPartitions over the
  * word table with the ≤O(seedSize) vocabulary broadcast, partial
  * piece-count maps combined per partition, then one reduceByKey whose
  * key space is the vocabulary — never the corpus. Driver state is one
  * vocabulary array per round (bounded by seedSize), released
  * broadcasts and checkpoints per round. Gated by UnigramSpec
  * (serial-reference parity, determinism, coverage, toy-corpus
  * learning, round-trip).
  */
object UnigramTrainer {

  case class VocabEntry(piece: String, count: Long, logProb: Double)

  val DefaultMaxPieceLen = 8
  val DefaultSeedSize = 20000
  val DefaultEmRounds = 3
  val DefaultShrink = 0.75

  /** Effective count: zero-count survivors get a 0.5 pseudo-count so
    * their log-prob stays finite (the coverage floor).
    */
  private def eff(c: Long): Double = if (c > 0) c.toDouble else 0.5

  /** Total mass from integer aggregates (exact — not an iteration-
    * order float sum): Σ count + 0.5 · #zero.
    */
  private def totalMass(counts: Iterable[Long]): Double = {
    var sum = 0L
    var zeros = 0L
    counts.foreach(c => if (c > 0) sum += c else zeros += 1)
    sum.toDouble + 0.5 * zeros
  }

  /** Viterbi best segmentation of `word` under `logp` (piece →
    * log-prob). Ties prefer the longer piece. Characters absent from
    * the vocabulary fall back to a single-char piece at `floorLogp`
    * (cannot occur during training — the seed keeps every corpus
    * char — but keeps encode total).
    */
  private[graft] def segment(word: String, logp: java.util.HashMap[String, java.lang.Double],
      maxPieceLen: Int, floorLogp: Double): Seq[String] = {
    val n = word.length
    if (n == 0) return Nil
    val score = new Array[Double](n + 1)
    val back = new Array[Int](n + 1)
    var i = 1
    while (i <= n) {
      var bestScore = Double.NegativeInfinity
      var bestLen = 0
      var L = math.min(maxPieceLen, i)
      // descending L: on equal score the LONGER piece wins (strict >
      // below keeps the first, i.e. longest, maximum)
      while (L >= 1) {
        val p = word.substring(i - L, i)
        val lp = logp.get(p)
        val pieceLp =
          if (lp != null) lp.doubleValue()
          else if (L == 1) floorLogp
          else Double.NaN
        if (!pieceLp.isNaN) {
          val cand = score(i - L) + pieceLp
          if (cand > bestScore) { bestScore = cand; bestLen = L }
        }
        L -= 1
      }
      score(i) = bestScore
      back(i) = bestLen
      i += 1
    }
    // backtrack
    var pieces = List.empty[String]
    var pos = n
    while (pos > 0) {
      val L = back(pos)
      pieces = word.substring(pos - L, pos) :: pieces
      pos -= L
    }
    pieces
  }

  /** Distinct-word frequency table of `docs(textCol)` — the same
    * sanitize/split as the BPE trainer, so the two tokenizers train
    * from identical word streams.
    */
  private def wordFreq(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(Bpe.sanitize(col(textCol)), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("cnt"))

  /** Train on `docs(textCol)`; returns the final vocabulary sorted by
    * (count desc, piece asc).
    */
  def train(docs: DataFrame, targetVocab: Int, textCol: String = "text",
      maxPieceLen: Int = DefaultMaxPieceLen,
      emRounds: Int = DefaultEmRounds,
      seedSize: Int = DefaultSeedSize,
      shrink: Double = DefaultShrink): Seq[VocabEntry] = {
    require(targetVocab >= 1, "unigramTrain: targetVocab must be >= 1")
    require(shrink > 0.0 && shrink < 1.0,
      "unigramTrain: shrink must be in (0, 1) — the prune loop runs " +
        "until the vocabulary reaches targetVocab")
    val spark = docs.sparkSession
    import spark.implicits._
    val wf = wordFreq(docs, textCol).localCheckpoint(true)
    try {
      val words = wf.as[(String, Long)].rdd
      trainFromWords(spark, words, targetVocab, maxPieceLen, emRounds,
        seedSize, shrink)
    } finally graft.functions.CheckpointOps.release(wf)
  }

  /** Next vocabulary size for one prune round. `ceil(size * shrink)`
    * alone does not guarantee progress: for any `size < 1/(1-shrink)`
    * (e.g. sizes 2-3 at the default 0.75) the ceil rounds back up to
    * `size` and the prune loop would spin forever when still above
    * `stopSize`. Clamp to `size - 1` so every round above the stop
    * size strictly shrinks, and to `stopSize` from below so the loop's
    * exit test is reachable without overshooting the target.
    */
  private[graft] def shrunkSize(size: Int, stopSize: Int,
      shrink: Double): Int =
    if (size <= stopSize) stopSize
    else math.max(stopSize, math.min(size - 1,
      math.ceil(size * shrink).toLong.toInt))

  /** The trainer proper, over a distributed (word, freq) pair RDD. */
  private def trainFromWords(spark: SparkSession,
      words: org.apache.spark.rdd.RDD[(String, Long)], targetVocab: Int,
      maxPieceLen: Int, emRounds: Int, seedSize: Int,
      shrink: Double): Seq[VocabEntry] = {
    val sc = spark.sparkContext

    // ---- seed: occurrence-counted substrings --------------------------
    val subCounts = words.flatMap { case (w, f) =>
      val out = new scala.collection.mutable.HashMap[String, Long]()
      var i = 0
      while (i < w.length) {
        var j = i + 1
        val maxJ = math.min(w.length, i + maxPieceLen)
        while (j <= maxJ) {
          val s = w.substring(i, j)
          out.update(s, out.getOrElse(s, 0L) + f)
          j += 1
        }
        i += 1
      }
      out.iterator
    }.reduceByKey(_ + _)

    val singles = subCounts.filter(_._1.length == 1).collect()
    // top-k multi-char candidates under the SAME total order pruning
    // uses; takeOrdered ships k entries to the driver, never the tail
    val multiTop = subCounts.filter(_._1.length > 1)
      .takeOrdered(seedSize)(Ordering.by { case (p, c) => (-c, p) })
    var vocab: Array[(String, Long)] = singles ++ multiTop

    // ---- hard-EM rounds: at least emRounds, then keep pruning until
    // the vocabulary actually REACHES the target (each round shrinks
    // strictly while above it, and the single-char floor bounds the
    // minimum, so this terminates; `emRounds` alone would stop at
    // ~seedSize·shrink^emRounds and silently ignore targetVocab) ----
    val floorSize = vocab.count(_._1.length == 1)
    val stopSize = math.max(targetVocab, floorSize)
    var round = 0
    while (round < emRounds || vocab.length > stopSize) {
      val total = totalMass(vocab.map(_._2))
      val logTotal = math.log(total)
      val floorLogp = math.log(0.5) - logTotal
      val table = new java.util.HashMap[String, java.lang.Double](vocab.length * 2)
      vocab.foreach { case (p, c) =>
        table.put(p, math.log(eff(c)) - logTotal)
      }
      val bcast = sc.broadcast(table)
      val mpl = maxPieceLen
      val fl = floorLogp
      val counted = words.mapPartitions { it =>
        val t = bcast.value
        val acc = new scala.collection.mutable.HashMap[String, Long]()
        it.foreach { case (w, f) =>
          segment(w, t, mpl, fl).foreach { p =>
            acc.update(p, acc.getOrElse(p, 0L) + f)
          }
        }
        acc.iterator
      }.reduceByKey(_ + _).collect().toMap
      bcast.destroy()

      val counts = vocab.map { case (p, _) => (p, counted.getOrElse(p, 0L)) }
      val sgl = counts.filter(_._1.length == 1)
      val multi = counts.filter(_._1.length > 1)
        .sortBy { case (p, c) => (-c, p) }
      val size = counts.length
      val newSize = shrunkSize(size, stopSize, shrink)
      val keepMulti = math.max(0, newSize - sgl.length)
      vocab = sgl ++ multi.take(keepMulti)
      round += 1
    }

    val total = totalMass(vocab.map(_._2))
    val logTotal = math.log(total)
    vocab.map { case (p, c) =>
      VocabEntry(p, c, math.log(eff(c)) - logTotal)
    }.sortBy(e => (-e.count, e.piece)).toSeq
  }

  /** Serial reference implementation — the identical algorithm over a
    * collected word table, no Spark. UnigramSpec asserts the
    * distributed trainer matches it entry for entry (the integer-count
    * E-step makes that an equality, not a tolerance).
    */
  private[graft] def trainSerial(wordCnt: Seq[(String, Long)],
      targetVocab: Int, maxPieceLen: Int = DefaultMaxPieceLen,
      emRounds: Int = DefaultEmRounds, seedSize: Int = DefaultSeedSize,
      shrink: Double = DefaultShrink): Seq[VocabEntry] = {
    val subCounts = new scala.collection.mutable.HashMap[String, Long]()
    wordCnt.foreach { case (w, f) =>
      var i = 0
      while (i < w.length) {
        var j = i + 1
        val maxJ = math.min(w.length, i + maxPieceLen)
        while (j <= maxJ) {
          val s = w.substring(i, j)
          subCounts.update(s, subCounts.getOrElse(s, 0L) + f)
          j += 1
        }
        i += 1
      }
    }
    val singles = subCounts.iterator.filter(_._1.length == 1).toArray
    val multiTop = subCounts.iterator.filter(_._1.length > 1).toArray
      .sortBy { case (p, c) => (-c, p) }.take(seedSize)
    var vocab: Array[(String, Long)] = singles ++ multiTop

    val floorSize = vocab.count(_._1.length == 1)
    val stopSize = math.max(targetVocab, floorSize)
    var round = 0
    while (round < emRounds || vocab.length > stopSize) {
      val total = totalMass(vocab.map(_._2))
      val logTotal = math.log(total)
      val floorLogp = math.log(0.5) - logTotal
      val table = new java.util.HashMap[String, java.lang.Double](vocab.length * 2)
      vocab.foreach { case (p, c) =>
        table.put(p, math.log(eff(c)) - logTotal)
      }
      val acc = new scala.collection.mutable.HashMap[String, Long]()
      wordCnt.foreach { case (w, f) =>
        segment(w, table, maxPieceLen, floorLogp).foreach { p =>
          acc.update(p, acc.getOrElse(p, 0L) + f)
        }
      }
      val counts = vocab.map { case (p, _) => (p, acc.getOrElse(p, 0L)) }
      val sgl = counts.filter(_._1.length == 1)
      val multi = counts.filter(_._1.length > 1)
        .sortBy { case (p, c) => (-c, p) }
      val newSize = shrunkSize(counts.length, stopSize, shrink)
      val keepMulti = math.max(0, newSize - sgl.length)
      vocab = sgl ++ multi.take(keepMulti)
      round += 1
    }
    val total = totalMass(vocab.map(_._2))
    val logTotal = math.log(total)
    vocab.map { case (p, c) =>
      VocabEntry(p, c, math.log(eff(c)) - logTotal)
    }.sortBy(e => (-e.count, e.piece)).toSeq
  }

  /** A vocabulary from fixed (piece, count) pairs — the serving-side
    * entry point when the vocabulary is an artifact rather than
    * trained in-query. Same probability math as training's M-step.
    */
  /** Serving-side lookup state: the piece → log-prob hash table plus
    * the out-of-vocabulary single-char floor (log 0.5 − log total
    * mass). Shared by [[encodeCounts]] and the SQL expression
    * ([[graft.functions.UnigramEncodeCount]]) so the two surfaces use
    * one source of truth.
    */
  def encodeTable(vocab: Seq[VocabEntry]): (java.util.HashMap[String, java.lang.Double], Double) = {
    val floorLogp = math.log(0.5) - math.log(totalMass(vocab.map(_.count)))
    val table = new java.util.HashMap[String, java.lang.Double](vocab.length * 2)
    vocab.foreach(e => table.put(e.piece, e.logProb))
    (table, floorLogp)
  }

  def fixedVocab(counts: Seq[(String, Long)]): Seq[VocabEntry] = {
    val logTotal = math.log(totalMass(counts.map(_._2)))
    counts.map { case (p, c) =>
      VocabEntry(p, c, math.log(eff(c)) - logTotal)
    }
  }

  /** The unknown-single-char floor log-prob for a fixed vocabulary. */
  def floorLogProbFor(counts: Seq[(String, Long)]): Double =
    math.log(0.5) - math.log(totalMass(counts.map(_._2)))

  /** Display rounding for log-probs (6 places, half-even) — shared by
    * every surface that renders a vocabulary (trainDf, the SQL CALLs)
    * so they cannot drift apart.
    */
  def roundLogProb(lp: Double): Double = math.rint(lp * 1e6) / 1e6

  /** Query-shaped train: top `topN` vocabulary entries as a DataFrame
    * (piece, count, log_prob rounded to 6).
    */
  def trainDf(spark: SparkSession, docs: DataFrame, targetVocab: Int,
      topN: Int, emRounds: Int = DefaultEmRounds,
      seedSize: Int = DefaultSeedSize): DataFrame = {
    import spark.implicits._
    train(docs, targetVocab, emRounds = emRounds, seedSize = seedSize)
      .take(topN)
      .map(e => (e.piece, e.count, roundLogProb(e.logProb)))
      .toDF("piece", "count", "log_prob")
  }

  /** Encode `docs(textCol)` with a trained vocabulary: per-document
    * piece count (words segmented independently; whitespace is the
    * word boundary, as in training). One narrow mapPartitions with the
    * vocabulary broadcast — the encode-side scale shape is identical
    * to training's E-step.
    */
  def encodeCounts(docs: DataFrame, vocab: Seq[VocabEntry],
      textCol: String = "text", idCol: String = "doc_id",
      maxPieceLen: Int = DefaultMaxPieceLen): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // the vocabulary rides the task closure, NOT a managed broadcast:
    // the returned frame is lazy, so a broadcast made here could never
    // be destroyed and would accrete per invocation (the s7PqAnn
    // lesson — measured ≥5× bench regressions from leaked broadcasts);
    // closure state is GC'd with the job
    val (table, floorLogp) = encodeTable(vocab)
    val mpl = maxPieceLen
    docs.select(col(idCol).cast("long"),
        split(Bpe.sanitize(col(textCol)), " ").as("ws"))
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        it.map { case (id, ws) =>
          var n = 0L
          ws.foreach { w =>
            if (w.nonEmpty) n += segment(w, table, mpl, floorLogp).length
          }
          (id, n)
        }
      }
      .toDF(idCol, "n_pieces")
  }
}

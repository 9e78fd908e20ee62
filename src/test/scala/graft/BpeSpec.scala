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

  /** One symbol per CODE POINT (surrogate pair = one symbol) — the
    * same alphabet as the trainers and the encode kernel, so parity
    * gates stay meaningful on supplementary (non-BMP) characters.
    */
  private def codePointSyms(w: String): List[String] = {
    val out = List.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val n = Character.charCount(w.codePointAt(i))
      out += w.substring(i, i + n)
      i += n
    }
    out.result()
  }

  private def refWords(docs: Seq[String]): Map[List[String], Long] =
    docs
      .flatMap(_.replaceAll("[\\x00-\\x1F\\x7F]", "").split(" "))
      .filter(_.nonEmpty)
      .groupBy(identity).view
      .map { case (w, occ) =>
        (codePointSyms(w) :+ Bpe.W) -> occ.size.toLong
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
        merges.foldLeft(codePointSyms(w) :+ Bpe.W) {
          case (syms, (l, r)) => refApply(syms, l, r)
        }
      }

  private val fixture = Seq(
    "low low low low low",
    "lower lower newest",
    "newest newest newest newest newest",
    "widest widest widest")

  // ---- byte-level (TX-BPE3) serial reference: same trainer loop over
  // the 256-byte alphabet (symbols = uppercase hex pairs) ----

  private def byteSyms(w: String): List[String] =
    w.getBytes(java.nio.charset.StandardCharsets.UTF_8).toList
      .map(b => f"${b & 0xFF}%02X")

  private def refTrainBytes(docs: Seq[String],
      n: Int): Seq[(String, String, Long)] = {
    var wc: Map[List[String], Long] = docs
      .flatMap(_.replaceAll("[\\x00-\\x1F\\x7F]", "").split(" "))
      .filter(_.nonEmpty)
      .groupBy(identity).view
      .map { case (w, occ) => (byteSyms(w) :+ Bpe.W) -> occ.size.toLong }
      .toMap
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

  // multi-byte code points exercise the byte alphabet where it differs
  // from code points: é = C3A9, 🎉 = F09F8E89, ß = C39F
  private val byteFixture = fixture ++ Seq(
    "café café café naïve", "größe größe 🎉🎉 🎉🎉")

  test("byte-level local trainer matches the serial byte reference merge-for-merge") {
    val docs = byteFixture.toDF("text")
    val got = BpeTrainer.train(docs, numMerges = 12, byteLevel = true)
      .map(m => (m.left, m.right, m.freq))
    assert(got == refTrainBytes(byteFixture, 12))
  }

  test("byte-level distributed trainer matches the serial byte reference too") {
    val docs = byteFixture.toDF("text")
    val got = BpeTrainer.train(docs, numMerges = 12, maxLocalWords = 0,
      byteLevel = true)
      .map(m => (m.left, m.right, m.freq))
    assert(got == refTrainBytes(byteFixture, 12))
  }

  test("byte-level encode: replace chain equals the serial reference; no OOV possible") {
    val merges = refTrainBytes(byteFixture, 12).map(m => (m._1, m._2))
    val enc = byteFixture.toDF("text")
      .select(Bpe.render(
        Bpe.applyMerges(Bpe.wrapTextBytes(col("text")), merges)).as("t"))
      .as[String].collect().toSeq
    val ref = byteFixture.map { text =>
      text.replaceAll("[\\x00-\\x1F\\x7F]", "").split(" ")
        .filter(_.nonEmpty).toList
        .flatMap { w =>
          merges.foldLeft(byteSyms(w) :+ Bpe.W) {
            case (syms, (l, r)) => refApply(syms, l, r)
          }
        }.map(_.replace(Bpe.W, "</w>")).mkString(" ")
    }
    assert(enc == ref)
    // byte fallback: an input wholly outside the training alphabet
    // still encodes (to its base byte symbols) — never an OOV failure
    val odd = Seq("Ω≈ç√∫ 你好").toDF("text")
      .select(Bpe.render(
        Bpe.applyMerges(Bpe.wrapTextBytes(col("text")), merges)).as("t"))
      .as[String].head()
    assert(odd.split(" ").forall(t =>
      t == "</w>" || t.matches("([0-9A-F]{2})+(</w>)?")))
  }

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

  test("local incremental trainer matches the reference merge-for-merge") {
    val docs = fixture.toDF("text")
    val dist = BpeTrainer.train(docs, numMerges = 10)
      .map(m => (m.left, m.right, m.freq))
    assert(dist == refTrain(fixture, 10))
  }

  test("distributed IVM trainer matches the reference merge-for-merge") {
    val docs = fixture.toDF("text")
    val dist = BpeTrainer.train(docs, numMerges = 10, maxLocalWords = 0)
      .map(m => (m.left, m.right, m.freq))
    assert(dist == refTrain(fixture, 10))
  }

  test("training is invariant to input partitioning (both engines)") {
    val docs = fixture.toDF("text")
    val a = BpeTrainer.train(docs.repartition(7), numMerges = 8)
    val b = BpeTrainer.train(docs.coalesce(1), numMerges = 8)
    assert(a == b)
    val c = BpeTrainer.train(docs.repartition(7), numMerges = 8,
      maxLocalWords = 0)
    assert(c == b) // and the two engines agree merge-for-merge
  }

  test("local trainer matches reference to vocabulary exhaustion on corpus text") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .orderBy("doc_id").limit(200).cache()
    val texts = docs.select("text").as[String].collect().toSeq
    val dist = BpeTrainer.train(docs, numMerges = 256)
      .map(m => (m.left, m.right, m.freq))
    val want = refTrain(texts, 256)
    assert(dist.length == want.length)
    dist.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      assert(g == w, s"merge #$i diverges: got $g want $w")
    }
    docs.unpersist()
  }

  /** Deterministic rich-vocabulary corpus: the synthetic documents
    * table fully merges after ~106 merges (small Zipf vocab), so the
    * production-vocab-scale gates build syllable words with varied
    * frequencies — thousands of distinct words, hundreds of learnable
    * merges.
    */
  private def richCorpus: Seq[String] = {
    val syl = Array("ka", "ti", "mo", "ru", "sel", "pon", "dra", "vex",
      "qua", "lin", "zor", "fi", "hem", "bus")
    (0 until 2500).map { i =>
      val len = 3 + i % 5
      val word = (0 until len).map(j =>
        syl((i / math.max(1, j * 3 + 1) + j * 7 + i % (j + 2)) % syl.length))
        .mkString
      // frequency 2..8, word repeated within one doc line
      Seq.fill(2 + i % 7)(word).mkString(" ")
    }
  }

  test("local trainer matches reference at >=256 merges (rich vocabulary)") {
    val texts = richCorpus
    val dist = BpeTrainer.train(texts.toDF("text"), numMerges = 300)
      .map(m => (m.left, m.right, m.freq))
    val want = refTrain(texts, 300)
    assert(dist.length >= 256,
      s"rich corpus must sustain >=256 merges, learned ${dist.length}")
    assert(dist.length == want.length)
    dist.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      assert(g == w, s"merge #$i diverges: got $g want $w")
    }
  }

  test("trainer parity holds on supplementary (non-BMP) characters") {
    // surrogate pairs must count as ONE symbol in every engine AND the
    // reference: emoji runs, astral letters, mixed BMP/astral words
    val docs = Seq(
      "😀😀x 😀😀x 😀😀x",
      "a😀b a😀b",
      "𝕊𝕊 𝕊𝕊 𝕊𝕊",
      "café café café")
    val want = refTrain(docs, 8)
    val local = BpeTrainer.train(docs.toDF("text"), numMerges = 8)
      .map(m => (m.left, m.right, m.freq))
    assert(local == want)
    val dist = BpeTrainer.train(docs.toDF("text"), numMerges = 8,
      maxLocalWords = 0)
      .map(m => (m.left, m.right, m.freq))
    assert(dist == want)
    // at least one merge must involve an ASTRAL symbol (a surrogate
    // PAIR counted as one code point) — i.e. the gate actually
    // exercises the non-BMP path, and no side is a lone half
    assert(want.exists(m =>
      m._1.codePointCount(0, m._1.length) < m._1.length ||
        m._2.codePointCount(0, m._2.length) < m._2.length))
    want.foreach { m =>
      Seq(m._1, m._2).foreach(s => assert(
        !Character.isHighSurrogate(s.last) &&
          !Character.isLowSurrogate(s.head),
        s"merge side is a torn surrogate: $m"))
    }
  }

  test("malformed tables split at the well-formed prefix; suffix chains") {
    import graft.functions.{BpeEncode, BpeTable}
    def flatOf(ms: Seq[(String, String)]): Array[String] =
      ms.flatMap(m => Seq(m._1, m._2)).toArray
    // well-formed base: 40 distinct merges chained off one letter run
    val good = (0 until 40).map { i =>
      if (i == 0) ("a", "b") else ("ab" + "c" * (i - 1), "c")
    }
    assert(BpeTable.wellFormed(flatOf(good)))
    val tGood = BpeTable(flatOf(good))
    assert(tGood.usePq && tGood.suffixFlat.isEmpty) // whole-table PQ
    // duplicate product — the ADVICE gap case: (a,bc)->abc at a low
    // rank, (ab,c)->abc later; "bc" made producible first so ONLY the
    // duplicate product ends the prefix
    val dupTable = Seq(("b", "c"), ("a", "b")) ++
      (0 until 40).map(i => ("ab" + "d" * i, "d")) ++ Seq(("a", "bc"), ("ab", "c"))
    val fd = flatOf(dupTable)
    assert(!BpeTable.wellFormed(fd))
    val tDup = BpeTable(fd)
    // the PQ keeps the 43 merges BEFORE the duplicate; only the
    // offending suffix chain-applies — no O(merges·len) cliff
    assert(tDup.usePq)
    assert(tDup.pqMerges == dupTable.size - 1)
    assert(tDup.suffixFlat.toSeq == Seq("ab", "c"))
    // byte parity vs the pure rank-order chain (the oracle semantics)
    val chainT = new BpeTable(fd, false)
    val probes = Seq("abc", "aabc zabc", "ab c abc abcd", "abdd abddd",
      "bc abc ab", "abcabc a b c", "")
    probes.foreach { t =>
      assert(BpeEncode.encode(t, tDup) == BpeEncode.encode(t, chainT),
        s"prefix-split/chain diverge on: $t")
      assert(BpeEncode.tokenCount(t, tDup) == BpeEncode.tokenCount(t, chainT))
    }
    // side that is neither base nor an earlier product: prefix stops
    // there but everything before it still rides the PQ
    val orphan = good ++ Seq(("zz", "q"), ("ab", "x"))
    val tOrphan = BpeTable(flatOf(orphan))
    assert(!BpeTable.wellFormed(flatOf(orphan)))
    assert(tOrphan.usePq && tOrphan.pqMerges == good.size)
    assert(tOrphan.suffixFlat.toSeq == Seq("zz", "q", "ab", "x"))
    // a violation BEFORE the threshold keeps the whole table on the
    // chain (no PQ worth setting up for a 1-merge prefix)
    val early = Seq(("x", "y"), ("x", "y")) ++ good
    val tEarly = BpeTable(flatOf(early))
    assert(!tEarly.usePq && tEarly.suffixFlat.isEmpty)
    // an astral (surrogate-pair) side IS a base symbol
    val astral = Seq(("😀", "😀")) ++
      (0 until 40).map(i => ("😀😀" + "e" * i, "e"))
    assert(BpeTable.wellFormed(flatOf(astral)))
  }

  test("distributed IVM trainer matches the reference at depth (48 merges, rich vocabulary)") {
    // the co-partitioned zipPartitions fold accumulates signed deltas
    // over many merges — a sign error or lost delta would compound and
    // surface as a divergence at depth that the 8-10-merge fixture
    // gates cannot see
    val texts = richCorpus.take(400)
    val dist = BpeTrainer.train(texts.toDF("text"), numMerges = 48,
      maxLocalWords = 0)
      .map(m => (m.left, m.right, m.freq))
    assert(dist == refTrain(texts, 48))
  }

  test("distributed IVM trainer matches local on real corpus text") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .orderBy("doc_id").limit(40).cache()
    val dist = BpeTrainer.train(docs, numMerges = 24, maxLocalWords = 0)
    val local = BpeTrainer.train(docs, numMerges = 24)
    assert(dist == local)
    docs.unpersist()
  }

  test("training releases every RDD block it pinned (no storage leak)") {
    // train() checkpoints the word table and the distributed engine
    // checkpoints pair/word tables per merge; all of it must be
    // unpersisted on return — a long-lived session running many
    // trainings must not accumulate storage memory. Loose bound
    // (other suites share this SparkContext and may cache
    // concurrently): 5 distributed + 5 local trainings pre-fix leak
    // >= 10 blocks; post-fix 0.
    val sc = spark.sparkContext
    val docs = fixture.toDF("text")
    val before = sc.getPersistentRDDs.size
    (1 to 5).foreach { _ =>
      BpeTrainer.train(docs, numMerges = 6, maxLocalWords = 0)
      BpeTrainer.train(docs, numMerges = 6)
    }
    val after = sc.getPersistentRDDs.size
    assert(after - before <= 4,
      s"training leaked persisted RDDs: $before -> $after")
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

  test("fused kernel is byte-identical to the composed-builtin form") {
    import graft.functions.{BpeEncode, BpeSymCount, BpeTokenCount}
    val fused = BpeEncode.encodeCol(spark, col("text"), Bpe.FixedMerges)
    val composed = Bpe.render(
      Bpe.applyMerges(Bpe.wrapText(col("text")), Bpe.FixedMerges))
    val symsK = BpeSymCount.countCol(spark, col("text"))
    val symsC = Bpe.nTokens(Bpe.wrapText(col("text")))
    val tokK = BpeTokenCount.countCol(spark, col("text"), Bpe.FixedMerges)
    val tokC = Bpe.nTokens(
      Bpe.applyMerges(Bpe.wrapText(col("text")), Bpe.FixedMerges))
    val mismatch = fused =!= composed || symsK =!= symsC || tokK =!= tokC
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(200)
    assert(docs.filter(mismatch).count() == 0)
    // adversarial edges: empties, runs of spaces, control chars
    // (incl. the bracket/marker chars themselves), combining accents,
    // supplementary code points (surrogate pairs), trailing space
    val weird = Seq("", " ", "   ", "  a  b ", "a\u0001b \u0002x\u0000",
      "héllo wörld", "emoji 😀😀 pair",
      "tab\tand\nnewline\r", "ends with space ", "the then and sand")
      .toDF("text")
    assert(weird.filter(mismatch).count() == 0)
  }

  test("priority-queue encode is identical to the chain on a 256-merge learned table") {
    import graft.functions.{BpeEncode, BpeTable}
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .orderBy("doc_id").limit(200).cache()
    val merges = BpeTrainer.train(docs, numMerges = 256)
      .map(m => (m.left, m.right))
    val flat = merges.flatMap(m => Seq(m._1, m._2)).toArray
    val chain = new BpeTable(flat, false)
    val pq = new BpeTable(flat, true)
    assert(pq.numMerges == 256 || pq.numMerges == merges.size)
    val texts = docs.select("text").as[String].collect() ++ Seq(
      "", " ", "  a  b ", "a\u0001b \u0002x\u0000", "héllo wörld",
      "emoji 😀😀 pair", "aaaa abab the then and sand")
    texts.foreach { t =>
      assert(BpeEncode.encode(t, pq) == BpeEncode.encode(t, chain),
        s"PQ/chain diverge on: ${t.take(80)}")
      assert(BpeEncode.tokenCount(t, pq) == BpeEncode.tokenCount(t, chain))
    }
    // default strategy selection: 256 merges routes to the PQ path,
    // the 12-merge demo table stays on the chain (oracle shape)
    assert(BpeTable(flat).usePq)
    assert(!BpeTable(Bpe.FixedMerges.flatMap(m => Seq(m._1, m._2)).toArray).usePq)
    // and the PQ result equals the composed-builtin replace chain too
    val viaCol = docs.select(BpeEncode.encodeCol(spark, col("text"), merges)
      .as("e")).as[String].collect()
    val viaBuiltins = docs.select(Bpe.render(
      Bpe.applyMerges(Bpe.wrapText(col("text")), merges)).as("e"))
      .as[String].collect()
    assert(viaCol.toSeq == viaBuiltins.toSeq)
    docs.unpersist()
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

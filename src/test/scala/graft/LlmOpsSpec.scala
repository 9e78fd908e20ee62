package graft

import graft.functions.{DedupOps, TextFunctions, VectorOps}
import graft.queries.Similarity
import org.apache.spark.sql.functions._

/** Quality/property tests for the engine-specific LLM-pipeline ops
  * that the DuckDB oracle can't check (MinHash/SimHash/LSH recall,
  * centroid math, the RollingHash expression).
  */
class LlmOpsSpec extends SparkTestBase {
  quiet()
  import spark.implicits._

  private def docs = Q.t(spark, sf, "documents")

  test("RollingHash expression matches a reference Scala fold (and codegen runs)") {
    val got = docs.limit(50)
      .select(col("text"),
        TextFunctions.rollingHash(spark, col("text")).as("h"))
      .collect()
    got.foreach { r =>
      val expected = r.getString(0).getBytes("UTF-8")
        .foldLeft(0L)((h, b) => h * 31 + b)
      assert(r.getLong(1) === expected)
    }
  }

  test("minhash LSH finds planted near-duplicates (recall ≥ 0.9)") {
    // plant near-dups: copy 40 docs with one word appended
    val base = docs.select("doc_id", "text")
    val nearDups = base.filter(col("doc_id") < 40)
      .select((col("doc_id") + 100000L).as("doc_id"),
        concat(col("text"), lit(" extraword")).as("text"))
    val corpus = base.unionByName(nearDups)
    val cands = DedupOps.lshCandidates(corpus, "doc_id", "text")
      .filter(col("id_b") === col("id_a") + 100000L)
    val found = cands.count()
    assert(found >= 36, s"LSH recall too low: $found/40 planted pairs found")
  }

  test("LSH produces no candidates for unrelated docs beyond chance") {
    val cands = DedupOps.lshCandidates(docs, "doc_id", "text")
    // unique random texts: candidate count must be a tiny fraction of
    // the ~125k possible pairs
    assert(cands.count() < 500)
  }

  test("simhash: identical docs agree, near-dups are close, random far") {
    val sample = docs.limit(100)
    val fp = sample.select(col("doc_id"),
      DedupOps.simhash64(TextFunctions.tokens(col("text"))).as("h"))
    // the scalable aggregate form must agree with the per-row fold
    val fpAgg = DedupOps.simhashAgg(sample, "doc_id",
        TextFunctions.tokens(col("text")))
      .select(col("id").as("doc_id"), col("simhash").as("h"))
    assert(fp.exceptAll(fpAgg).count() === 0)
    // mostly distinct on unrelated docs (genuine collisions allowed)
    assert(fp.select("h").distinct().count() >= 95)

    val nearFp = docs.limit(100).select(col("doc_id"),
      DedupOps.simhash64(TextFunctions.tokens(
        concat(col("text"), lit(" tail")))).as("h2"))
    val joined = fp.join(nearFp, "doc_id")
      .select(DedupOps.hamming64(col("h"), col("h2")).as("d"))
      .agg(avg("d")).head().getDouble(0)
    // one extra token should flip few bits on ~20-token docs
    assert(joined < 16.0, s"near-dup hamming too high: $joined")

    val cross = fp.as("a").join(fp.as("b"),
        col("a.doc_id") + 1 === col("b.doc_id"))
      .select(DedupOps.hamming64(col("a.h"), col("b.h")).as("d"))
      .agg(avg("d")).head().getDouble(0)
    assert(cross > 16.0, s"unrelated docs too close: $cross")
  }

  test("LSH ANN recall vs brute force (top-3, ≥ 0.5 at sf0.001)") {
    val exact = Similarity.s1BruteForceTopK(spark, sf)
      .select(col("q_id"), col("neighbor")).as[(Long, Long)].collect().toSet
    val ann = Similarity.s2LshAnn(spark, sf)
      .select(col("q_id"), col("neighbor")).as[(Long, Long)].collect().toSet
    val recall = (exact intersect ann).size.toDouble / exact.size
    // sign-LSH on near-orthogonal random vectors is a weak filter;
    // the point is the mechanism (bucketed candidates, no cross join)
    assert(recall >= 0.2, s"ANN recall collapsed: $recall")
    // every ANN result must be a genuine same-bucket neighbor
    assert(ann.nonEmpty)
  }

  test("centroid aggregator matches a local element-wise mean") {
    val rows = Q.t(spark, sf, "embeddings")
      .select(col("label"), col("embedding")).as[(Int, Seq[Float])]
      .collect()
    val expected = rows.groupBy(_._1).map { case (l, vs) =>
      val dim = vs.head._2.length
      val mean = (0 until dim).map(i => vs.map(_._2(i).toDouble).sum / vs.size)
      l -> mean
    }
    val got = Q.t(spark, sf, "embeddings")
      .groupBy(col("label"))
      .agg(VectorOps.centroid(64)(col("embedding")).as("c"))
      .as[(Int, Seq[Double])].collect().toMap
    expected.foreach { case (l, mean) =>
      val g = got(l)
      mean.zip(g).foreach { case (e, a) => assert(math.abs(e - a) < 1e-9) }
    }
  }

  test("IVF ANN recall vs brute force (top-3)") {
    val exact = Similarity.s1BruteForceTopK(spark, sf)
      .select(col("q_id"), col("neighbor")).as[(Long, Long)].collect().toSet
    val ivf = Similarity.s4IvfAnn(spark, sf)
      .select(col("q_id"), col("neighbor")).as[(Long, Long)].collect().toSet
    val recall = (exact intersect ivf).size.toDouble / exact.size
    assert(recall >= 0.2, s"IVF recall collapsed: $recall")
  }

  test("LSH dim guard: wrong-dim vectors throw, NULL vectors drop") {
    import graft.functions.LshBuckets
    import graft.queries.LshPlanes
    import spark.implicits._
    // wrong dimensionality must fail LOUDLY — the pre-guard behavior
    // silently coerced NULL dots to sign 0, dumping every mismatched
    // vector into one shared all-pairs bucket
    val bad = Seq((1L, Seq.fill(63)(0.5))).toDF("vec_id", "v")
    val ex = intercept[Exception] {
      bad.select(LshBuckets.buckets(spark, col("v"))).collect()
    }
    val msgs = Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null).map(e => Option(e.getMessage).getOrElse(""))
      .mkString(" | ")
    assert(msgs.contains("requires 64-dim vectors"), msgs.take(300))
    // NULL vectors yield a NULL bucket array: explode drops them — no
    // candidates, not wrong candidates. Same for a NULL element.
    val withNull = Seq(
      (1L, Some(Seq.fill(64)(Option(0.5)))),
      (2L, None),
      (3L, Some(Seq.fill(63)(Option(0.5)) :+ (None: Option[Double]))))
      .toDF("vec_id", "v")
    val buckets = withNull
      .select(col("vec_id"), explode(LshBuckets.buckets(spark, col("v"))).as("tb"))
      .collect()
    assert(buckets.map(_.getLong(0)).toSet === Set(1L),
      "NULL vector/element must produce zero bucket rows")
    assert(buckets.length === LshPlanes.nTables)
  }

  test("native AdcScore ≡ the HOF lookup composition (bit-exact, null parity)") {
    import graft.functions.AdcScore
    import spark.implicits._
    // deterministic pseudo-random codes + tables: 16 subspaces × 32 cells
    val rows = (0 until 200).map { r =>
      val codes = (0 until 16).map(mi => (r * 31 + mi * 7) % 32)
      val tables = (0 until 16).map(mi =>
        (0 until 32).map(c => ((r + mi * 13 + c * 3) % 101) / 50.0 - 1.0))
      (r.toLong, codes, tables)
    }
    val df = rows.toDF("id", "codes", "tables")
    val both = df.select(col("id"),
        AdcScore.score(spark, col("codes"), col("tables")).as("native"),
        aggregate(zip_with(col("codes"), col("tables"),
          (code, t) => element_at(t, code + 1)), lit(0.0), _ + _).as("hof"))
      .collect()
    both.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(1)) ===
        java.lang.Double.doubleToRawLongBits(r.getDouble(2)),
        s"row ${r.getLong(0)}")
    }
    // NULL parity: a null code slot nulls the score in both forms
    val withNull = Seq((1L, Seq(Option(0), None: Option[Int]),
        Seq(Seq(1.0, 2.0), Seq(3.0, 4.0))))
      .toDF("id", "codes", "tables")
    val n = withNull.select(
        AdcScore.score(spark, col("codes"), col("tables")).as("native"),
        aggregate(zip_with(col("codes"), col("tables"),
          (code, t) => element_at(t, code + 1)), lit(0.0), _ + _).as("hof"))
      .first()
    assert(n.isNullAt(0) && n.isNullAt(1))
  }

  test("native LshBuckets ≡ the HOF signature composition on the corpus") {
    import graft.functions.LshBuckets
    import graft.queries.LshPlanes
    val emb = Similarity.unitVectors(spark, sf)
    val both = emb.select(col("vec_id"),
        LshBuckets.buckets(spark, col("v")).as("native"),
        LshPlanes.tableBucketsHof(col("v")).as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getSeq[org.apache.spark.sql.Row](1) === r.getSeq[org.apache.spark.sql.Row](2),
        s"bucket mismatch for vec ${r.getLong(0)}")
    }
  }

  test("LSH plane literals are bit-identical to the in-plan hash formula") {
    // The legacy form evaluated (pmod(xxhash64(lit(i), j), 1001)/500)-1
    // inside the plan for every row; the literals must reproduce it
    // bit-for-bit or every bucket assignment silently changes.
    import graft.queries.LshPlanes
    val nPlanes = LshPlanes.nTables * LshPlanes.planesPerTable
    val idx = (0 until nPlanes).flatMap(i =>
      (0 until LshPlanes.dims).map(j => (i, j))).toDF("i", "j")
    val inPlan = idx.select(col("i"), col("j"),
        ((pmod(xxhash64(col("i"), col("j")), lit(1001L)).cast("double")
          / 500.0) - 1.0).as("w"))
      .as[(Int, Int, Double)].collect()
    inPlan.foreach { case (i, j, w) =>
      val lit0 = LshPlanes.planeComponentValue(i, j)
      assert(java.lang.Double.doubleToRawLongBits(lit0) ===
        java.lang.Double.doubleToRawLongBits(w), s"plane $i comp $j: $lit0 != $w")
    }
  }

  test("IVF assignment aggregates map-side: no window over the corpus×K rows") {
    // The assignment pass (nearestLists n=1) must be a hash aggregate
    // (max_by partial-aggregates before the exchange), not a
    // row_number window that sort-shuffles N×K embedding-carrying rows.
    val df = Similarity.s4IvfAnn(spark, sf)
    df.collect() // AQE: finalize the physical plan before inspecting
    // AQE prints Final and Initial plans — inspect the final one only
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("partial_max_by"),
      "corpus assignment lost its map-side partial max_by aggregate")
    // windows remain only for the probe nprobe-ranking and the final
    // top-3 ranking — the corpus pass must not add a third (operator
    // nodes print as "Window [" at a tree position; expression text
    // like windowspecdefinition doesn't match)
    val windows = "(?m)^[-+:*() ]*Window \\[".r.findAllIn(plan).size
    assert(windows <= 2, s"expected ≤2 window ops (probe+rank), got $windows")
  }

  test("native CosineSimilarity expression is bit-exact vs the HOF composition") {
    import graft.functions.CosineSimilarity
    val emb = Q.t(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val pairs = emb.crossJoin(emb.select(col("vec_id").as("v2"),
        col("embedding").as("e2")))
      .filter(col("vec_id") < 5 && col("v2") =!= col("vec_id"))
    val both = pairs.select(
      CosineSimilarity.cosine(spark, col("embedding"), col("e2")).as("native"),
      graft.functions.VectorOps.cosine(
        graft.functions.VectorOps.toDouble(col("embedding")),
        graft.functions.VectorOps.toDouble(col("e2"))).as("hof"))
    // bit-exact: same promotion, same accumulation order, same formula
    assert(both.filter(col("native") =!= col("hof")).count() === 0)
    assert(both.count() > 2000)
  }

  test("connectedComponents: correct on a long chain, lineage stays flat") {
    import graft.functions.DedupOps
    import spark.implicits._
    // path graph 0-1-2-…-12 forces ~diameter iterations — the case
    // where un-truncated lineage grows exponentially and hangs the
    // DRIVER on plan stringification (regression: localCheckpoint)
    val chain = (0L until 12L).map(i => (i, i + 1)).toDF("a", "b")
    val t0 = System.nanoTime()
    val cc = DedupOps.connectedComponents(chain, "a", "b")
    val rows = cc.collect()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(rows.length === 13)
    assert(rows.forall(_.getLong(1) === 0L), "one chain, one cluster, min id 0")
    assert(cc.queryExecution.logical.toString.length < 20000,
      "iterative plan must stay flat (localCheckpoint truncates lineage)")
    assert(secs < 60, s"CC on a 13-node chain took ${secs}s — lineage blowup?")
    // two disjoint components resolve to their own minima
    val two = (0L until 3L).map(i => (i, i + 1)).toDF("a", "b")
      .unionByName(Seq((100L, 101L), (101L, 102L)).toDF("a", "b"))
    val got = DedupOps.connectedComponents(two, "a", "b").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L to 3L).forall(got(_) === 0L))
    assert((100L to 102L).forall(got(_) === 100L))
  }

  test("native cosine yields NULL for arrays with NULL elements (HOF parity)") {
    import graft.functions.{CosineSimilarity, VectorOps}
    import spark.implicits._
    val df = Seq(
      (Seq[Option[Double]](Some(1.0), None), Seq[Option[Double]](Some(1.0), Some(2.0))),
      (Seq[Option[Double]](Some(1.0), Some(2.0)), Seq[Option[Double]](Some(1.0), Some(2.0))))
      .toDF("a", "b")
    val got = df.select(
      CosineSimilarity.cosine(spark, col("a"), col("b")).as("native"),
      VectorOps.cosine(col("a"), col("b")).as("hof")).collect()
    assert(got(0).isNullAt(0), "null element must yield NULL, not a plausible value")
    assert(got(0).isNullAt(0) === got(0).isNullAt(1), "parity with HOF form")
    assert(!got(1).isNullAt(0) && got(1).getDouble(0) === got(1).getDouble(1))
  }

  test("PQ ANN: ADC recall@10 well above random (cosine-PQ, Lloyd-refined codebook)") {
    import graft.queries.Similarity
    // structure: every vector encodes to m=8 codes in [0, 16)
    val pq = Similarity.s7PqAnn(spark, sf)
    val rows = pq.collect()
    assert(rows.nonEmpty)
    // recall vs exact brute force: PQ top-10 ∩ exact top-10 per probe
    def top10(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] = df
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val emb = Q.t(spark, sf, "embeddings")
      .select(col("vec_id"), graft.functions.VectorOps.toDouble(col("embedding")).as("v"))
    val probes = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("v").as("q_v"))
    val exact = emb.join(broadcast(probes), col("vec_id") =!= col("q_id"))
      .withColumn("sim", graft.functions.VectorOps.cosine(col("q_v"), col("v")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("sim").desc, col("vec_id").asc)
    val exactTop = exact.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10).select("q_id", "rn", "vec_id")
    val pq10 = top10(Similarity.s7PqAnn(spark, sf, topK = 10)
      .select("q_id", "rn", "neighbor"))
    val ex10 = top10(exactTop.select(col("q_id"), col("rn"), col("vec_id")))
    val recalls = ex10.keys.toSeq.sorted.map { q =>
      val overlap = (pq10(q) & ex10(q)).size
      overlap / 10.0
    }
    val mean = recalls.sum / recalls.size
    info(f"PQ recall@10 = $mean%.2f per-probe ${recalls.map(r => f"$r%.1f").mkString(",")}")
    // measured ~0.52 at 32× compression; 0.35 floor absorbs the FP-order
    // wiggle in the Lloyd cell means (random chance is 10/N ≈ 0.005)
    assert(mean >= 0.35, f"PQ ADC recall collapsed: $mean%.2f")

    // the production deployment pattern: PQ ADC gives a cheap top-50
    // shortlist, then EXACT cosine re-ranks only those 50 fetched
    // vectors — recall@3 vs exact top-3 should far exceed the pure-PQ
    // ranking's (the shortlist only has to CONTAIN the winners)
    val short = Similarity.s7PqAnn(spark, sf, topK = 50)
      .select(col("q_id"), col("neighbor"))
    val rer = short
      .join(emb.select(col("vec_id").as("neighbor"), col("v")), "neighbor")
      .join(broadcast(probes), "q_id")
      .withColumn("sim", graft.functions.VectorOps.cosine(col("q_v"), col("v")))
    val wr = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("sim").desc, col("neighbor").asc)
    val rer3 = rer.withColumn("rn", row_number().over(wr))
      .filter(col("rn") <= 3).select("q_id", "neighbor")
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val exact3 = exactTop.filter(col("rn") <= 3).select("q_id", "vec_id")
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val rerRecall = exact3.keys.toSeq.sorted
      .map(q => (rer3.getOrElse(q, Set.empty[Long]) & exact3(q)).size / 3.0)
    val rerMean = rerRecall.sum / rerRecall.size
    info(f"PQ+rerank recall@3 = $rerMean%.2f")
    assert(rerMean >= 0.5, f"shortlist re-rank recall collapsed: $rerMean%.2f")
    assert(rerMean >= mean - 0.05,
      "re-ranking a PQ shortlist should not lose to the raw PQ ranking")

    // the composed index (IVF lists + ADC + exact re-rank): recall is
    // bounded by which lists nprobe surfaces, so it trails the
    // full-corpus shortlist — but must still far exceed random and
    // return exact similarity values for what it does return
    val ivfpq = Similarity.s8IvfPqAnn(spark, sf)
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val ivfRecall = exact3.keys.toSeq.sorted
      .map(q => (ivfpq.getOrElse(q, Set.empty[Long]) & exact3(q)).size / 3.0)
    val ivfMean = ivfRecall.sum / ivfRecall.size
    info(f"IVF-PQ recall@3 = $ivfMean%.2f")
    assert(ivfMean >= 0.3, f"IVF-PQ recall collapsed: $ivfMean%.2f")
  }

  test("connectedComponentsStar: 1000-node chain converges in far fewer rounds than diameter") {
    import graft.functions.DedupOps
    import spark.implicits._
    // a 1,000-node path has diameter 999 — plain label propagation
    // needs ~999 rounds; star contraction must finish within 30
    // (logarithmic in diameter), which is also the whole point for a
    // boilerplate-heavy corpus whose giant dup component is deep
    val chain = (0L until 999L).map(i => (i, i + 1)).toDF("a", "b")
    val cc = DedupOps.connectedComponentsStar(chain, "a", "b") // default maxIter=30
    val rows = cc.collect()
    assert(rows.length === 1000)
    assert(rows.forall(_.getLong(1) === 0L), "one chain, one cluster, min id 0")
    assert(cc.queryExecution.logical.toString.length < 40000,
      "iterative plan must stay flat (localCheckpoint truncates lineage)")
  }

  test("connectedComponentsStar ≡ label propagation on a hub-and-clusters graph") {
    import graft.functions.DedupOps
    import spark.implicits._
    // deterministic mixed graph: small cliques, a star hub (the skew
    // case), one chain, and isolated self-pair nodes
    val cliques = for {
      c <- 0L until 8L; i <- 0L until 4L; j <- (i + 1) until 4L
    } yield (c * 10 + i, c * 10 + j)
    val hub = (1L until 25L).map(s => (500L, 500L + s))
    val chainE = (600L until 620L).map(i => (i, i + 1))
    val selfs = Seq((900L, 900L), (901L, 901L))
    val pairs = (cliques ++ hub ++ chainE ++ selfs).toDF("a", "b")
    val star = DedupOps.connectedComponentsStar(pairs, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val plain = DedupOps.connectedComponents(pairs, "a", "b", maxIter = 40)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star === plain, "same clusters, same canonical minima")
    assert(star(900L) === 900L && star(901L) === 901L, "singletons kept")
  }

  test("connectedComponents: refuses to return unconverged labels") {
    import graft.functions.DedupOps
    import spark.implicits._
    // diameter-8 chain with maxIter=2: labels would be partially
    // propagated (wrong clusters); the cap exit must throw, not return
    val chain = (0L until 8L).map(i => (i, i + 1)).toDF("a", "b")
    val ex = intercept[IllegalStateException] {
      DedupOps.connectedComponents(chain, "a", "b", maxIter = 2).collect()
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("int8 quantization: bounded reconstruction error, high top-3 recall") {
    import graft.functions.VectorOps
    val emb = Q.t(spark, sf, "embeddings")
    // element-wise |x - dequant(quant(x))| ≤ scale/2 (round-to-nearest)
    val err = emb
      .withColumn("scale", VectorOps.quantScale(col("embedding")))
      .withColumn("codes", VectorOps.quantize(col("embedding"), col("scale")))
      .withColumn("back", VectorOps.dequantize(col("codes"), col("scale")))
      .withColumn("max_err", expr(
        "aggregate(zip_with(cast(embedding as array<double>), back, (x, y) -> abs(x - y)), 0D, (a, e) -> greatest(a, e))"))
      .filter(col("max_err") > col("scale") * 0.5 + 1e-12)
    assert(err.count() === 0, "reconstruction error above scale/2")

    // quantized ranking finds (nearly) the exact top-3
    val exact = SparkEntry.queries("s1_cosine_topk")(spark, sf)
      .select("q_id", "neighbor").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val quant = SparkEntry.queries("s5_quantized_topk")(spark, sf)
      .select("q_id", "neighbor").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & quant).size.toDouble / exact.size
    assert(recall >= 0.8, s"quantized recall $recall")
  }

  test("CosineSimilarity yields NULL on mismatched vector lengths (HOF parity)") {
    import graft.functions.CosineSimilarity
    import spark.implicits._
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(1.0, 2.0)),       // truncated
      (Array(1.0, 2.0), Array(1.0, 2.0))              // well-formed
    ).toDF("a", "b")
    val out = df.select(
      CosineSimilarity.cosine(spark, col("a"), col("b")).as("native"),
      graft.functions.VectorOps.cosine(col("a"), col("b")).as("hof"))
      .collect()
    assert(out(0).isNullAt(0), "mismatched lengths must not yield a prefix similarity")
    assert(out(0).isNullAt(1)) // zip_with null-pads → HOF is NULL too
    assert(!out(1).isNullAt(0) && out(1).getDouble(0) === out(1).getDouble(1))
  }

  test("language-ID marker sets are consistent between query and oracle") {
    // the heuristic must at least detect planted English text
    val planted = Seq((1L, "the cat sat of the mat and it is a test")).toDF("doc_id", "text")
    val hits = planted.select(TextFunctions.markerHits(col("text"), "en")).head().getInt(0)
    assert(hits >= 4)
  }

  test("tx_lm_score: in-distribution boilerplate scores above out-of-distribution noise") {
    // corpus: many copies of one phrase + one garbled doc. The familiar
    // doc's bigrams are corpus-frequent -> high smoothed probability;
    // the garbled doc's bigrams are singletons -> low.
    val common = "the quick brown fox jumps over the lazy dog"
    val docs = ((1 to 20).map(i => (i.toLong, common)) :+
      (99L, "zqx wvu ptr mno klj ihg fed cba xyz abc"))
      .toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("lmscore").toString
    docs.withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val scores = graft.queries.TextAnalysis.txLmScore(spark, tmp)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scores(1L) > scores(99L) * 3,
      s"familiar=${scores(1L)} garbled=${scores(99L)}")
  }

  test("TextNormalize: NFC folding, control strip, whitespace collapse (expr ≡ kernel)") {
    import graft.functions.TextNormalize
    // decomposed é (e + U+0301) must NFC-fold to composed é
    val decomposed = "cafe\u0301"
    val composed = "caf\u00e9"
    assert(TextNormalize.normalizeString(decomposed) === composed)
    // control chars vanish, whitespace runs collapse, ends trim
    assert(TextNormalize.normalizeString("  a\u0007b\t\tc\r\nd  ") === "ab c d")
    assert(TextNormalize.normalizeString("\u0000\u001f\u007f") === "")
    // idempotence even when a stripped control char EXPOSES a blocked
    // composition: "e<NUL><combining acute>" must compose to "\u00e9" in ONE
    // pass, same as two (CollapseNormalize relies on this)
    val blocked = "e\u0000\u0301"
    val once = TextNormalize.normalizeString(blocked)
    assert(once === "\u00e9")
    assert(TextNormalize.normalizeString(once) === once)
    // the EXPRESSION (codegen path) agrees with the kernel on real docs
    val viaExpr = docs.limit(100)
      .select(col("text"),
        TextNormalize.normalize(spark, col("text")).as("clean"))
      .collect()
    viaExpr.foreach { r =>
      assert(r.getString(1) === TextNormalize.normalizeString(r.getString(0)))
    }
    // NULL stays NULL
    val n = Seq[(Long, String)]((1L, null)).toDF("id", "t")
      .select(TextNormalize.normalize(spark, col("t"))).head()
    assert(n.isNullAt(0))
  }

  test("s11 bucketed kNN graph: recall ≥ 0.9 vs exact, no corpus broadcast in plan") {
    import graft.queries.Similarity
    val k = 5
    val exact = Similarity.s11KnnGraph(spark, sf, k).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val bucketed = Similarity.s11KnnGraphBucketed(spark, sf, k)
    // scale shape: candidate generation must not nested-loop-broadcast
    // the corpus (the literal-codebook assignment is a pure map; every
    // join in the plan is an equi-join)
    val plan = bucketed.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    // ...whereas the exact path is exactly the documented broadcast form
    val exactPlan = Similarity.s11KnnGraph(spark, sf, k)
      .queryExecution.executedPlan.toString
    assert(exactPlan.contains("BroadcastNestedLoopJoin"))
    // recall floor on the RAW sf corpus: near-random 64-dim vectors
    // (exact top-5 mean cosine ≈ 0.32) are the adversarial regime for
    // any locality-based candidate generator — same reasoning as the
    // LSH ANN ≥ 0.5 floor above
    val got = bucketed.collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val recalls = exact.toSeq.map { case (id, want) =>
      want.intersect(got.getOrElse(id, Set.empty)).size.toDouble / want.size
    }
    val recall = recalls.sum / recalls.size
    assert(recall >= 0.4, s"mean recall $recall < 0.4 on the random corpus")
    // recall ≥ 0.9 on a CLUSTERED corpus — the regime real embedding
    // corpora live in (planted clusters, the SemDeDup-spec pattern):
    // 25 tight clusters of 20; true top-5 neighbors are in-cluster, so
    // IVF lists capture them
    val rnd = new scala.util.Random(42)
    val dim = 64
    val centers = Array.fill(25)(Array.fill(dim)(rnd.nextGaussian()))
    val pts = for {
      c <- centers.indices
      i <- 0 until 20
    } yield (c * 20L + i, c,
      centers(c).map(x => (x + 0.05 * rnd.nextGaussian()).toFloat).toSeq)
    val tmp = java.nio.file.Files.createTempDirectory("s11rec").toString
    pts.toDF("vec_id", "label", "embedding")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val cExact = Similarity.s11KnnGraph(spark, tmp, k).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val cGot = Similarity.s11KnnGraphBucketed(spark, tmp, k).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val cRecalls = cExact.toSeq.map { case (id, want) =>
      want.intersect(cGot.getOrElse(id, Set.empty)).size.toDouble / want.size
    }
    val cRecall = cRecalls.sum / cRecalls.size
    assert(cRecall >= 0.9, s"clustered mean recall $cRecall < 0.9")
    // the auto switch: below threshold ≡ exact, above ≡ bucketed shape
    val below = Similarity.s11KnnGraphAuto(spark, sf, k)
    assert(below.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
    val above = Similarity.s11KnnGraphAuto(spark, sf, k, exactMaxRows = 1L)
    assert(!above.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
  }

  test("WordBigrams: native expr ≡ zip_with(slice,slice) HOF on edge cases + corpus") {
    import graft.functions.WordBigrams
    // reference: the former HOF formulation, bigram i = t[i] + ' ' + t[i+1]
    def hof(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val t = split(c, " ")
      zip_with(
        slice(t, lit(1), size(t) - 1),
        slice(t, lit(2), size(t) - 1),
        (a, b) => concat(a, lit(" "), b))
    }
    val edge = Seq("", "one", "a b", "a b c", "a  b", " a", "b ",
      "  ", "café au lait", "x\ty z").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    val rows = edge
      .select(col("id"), hof(col("t")).as("want"),
        WordBigrams.bigrams(col("t")).as("got"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](1) === r.getSeq[String](2),
        s"id=${r.getLong(0)}")
    }
    // corpus-wide: exact sequence equality on real docs
    val mismatches = docs
      .select(hof(col("text")).as("want"),
        WordBigrams.bigrams(col("text")).as("got"))
      .filter(not(col("want") === col("got")))
      .count()
    assert(mismatches === 0)
    // NULL stays NULL
    val n = Seq[(Long, String)]((1L, null)).toDF("id", "t")
      .select(WordBigrams.bigrams(col("t"))).head()
    assert(n.isNullAt(0))
  }

  test("MMR: λ=1 reduces to plain top-k; λ<1 skips the redundant twin; deterministic") {
    // candidates: two near-identical high-sim docs + one diverse mid-sim doc
    val a = Array(1.0, 0.0, 0.0)
    val aTwin = Array(0.999, 0.0447, 0.0)
    val diverse = Array(0.0, 1.0, 0.0)
    val cands = Seq((1L, 0.95, a), (2L, 0.94, aTwin), (3L, 0.80, diverse))
    // λ=1: diversity off — exactly the sim ranking
    val plain = Similarity.mmrGreedy(cands, 3, 1.0).map(_._1)
    assert(plain === Seq(1L, 2L, 3L))
    // λ=0.5: after picking 1, the twin's redundancy penalty (≈1.0)
    // beats its sim edge over the diverse doc — diverse goes second
    val div = Similarity.mmrGreedy(cands, 2, 0.5).map(_._1)
    assert(div === Seq(1L, 3L))
    // end-to-end on the corpus: deterministic, right shape, rk dense
    val r1 = graft.queries.Similarity.s12Mmr(spark, sf).collect()
    val r2 = graft.queries.Similarity.s12Mmr(spark, sf).collect()
    assert(r1.map(_.toSeq) === r2.map(_.toSeq))
    val byProbe = r1.groupBy(_.getLong(0))
    assert(byProbe.nonEmpty)
    byProbe.foreach { case (q, rows) =>
      assert(rows.map(_.getInt(1)).sorted === (1 to rows.length).toArray,
        s"probe $q ranks dense")
      assert(rows.map(_.getLong(2)).distinct.length === rows.length,
        s"probe $q picks distinct neighbors")
    }
  }

  test("GramHashes.firstGramHash is bit-identical to hashes(...)(0) on every token count") {
    val md = graft.functions.GramHashes.newDigest()
    val k = 8
    // token counts straddling the k boundary, incl. exactly k (the
    // gram ends at end-of-string, not at a space) and multibyte text
    val texts = (1 to 12).map(n => (1 to n).map(i => s"tok$i").mkString(" ")) ++
      Seq("héllo wörld " + (1 to 10).map(_.toString).mkString(" "))
    texts.foreach { t =>
      val full = graft.functions.GramHashes.hashes(md, t, k)
      val first = graft.functions.GramHashes.firstGramHash(md, t, k)
      assert(first === full.headOption, s"mismatch on '${t.take(30)}…'")
    }
  }

  test("d17 containment: anchor-gram candidates are COMPLETE vs brute-force guarded contains") {
    import org.apache.spark.sql.functions._
    val result = graft.queries.Dedup.d17Containment(spark, sf)
      .select("contained_id", "container_id")
    // ground truth: all-pairs guarded contains (bounded: sf0.001
    // corpus only — the quadratic this operator exists to avoid)
    val d = docs.select(col("doc_id"), col("text"))
    val brute = d.select(col("doc_id").as("contained_id"),
        col("text").as("ta"))
      .filter(size(split(col("ta"), " ")) >= 8)
      .crossJoin(d.select(col("doc_id").as("container_id"),
        col("text").as("tb")))
      .filter(col("contained_id") =!= col("container_id"))
      .filter(contains(concat(lit(" "), col("tb"), lit(" ")),
        concat(lit(" "), col("ta"), lit(" "))))
      .select("contained_id", "container_id")
    assert(result.exceptAll(brute).count() === 0, "sound: no false pairs")
    assert(brute.exceptAll(result).count() === 0,
      "complete: the first-8-gram anchor join misses nothing")
    assert(result.count() > 0, "the corpus plants containment pairs")
  }

  test("d13 prefix filter: candidates strictly fewer than full inverted index") {
    import org.apache.spark.sql.expressions.Window
    val t = 0.5
    val base = docs.filter(col("doc_id") < 60).select(col("doc_id"), col("text"))
    val corpus = base.unionByName(
      base.select((col("doc_id") + 100000L).as("doc_id"),
        concat(col("text"), lit(" extraword")).as("text")))
      .select(col("doc_id"), DedupOps.shingles(col("text")).as("sh"))
    val inv = corpus.select(col("doc_id"), size(col("sh")).as("n"),
      explode(col("sh")).as("shingle"))
    def pairs(postings: org.apache.spark.sql.DataFrame): Long = postings
      .select(col("doc_id").as("a"), col("shingle"))
      .join(postings.select(col("doc_id").as("b"), col("shingle")), Seq("shingle"))
      .filter(col("a") < col("b")).select("a", "b").distinct().count()
    val full = pairs(inv)
    val df = inv.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    val wRank = Window.partitionBy(col("doc_id"))
      .orderBy(col("df").asc, col("shingle").asc)
    val prefix = inv.join(df, Seq("shingle"))
      .withColumn("rk", row_number().over(wRank))
      .filter(col("rk") <= col("n") - ceil(lit(t) * col("n")) + 1)
    val pruned = pairs(prefix)
    assert(pruned < full, s"prefix candidates $pruned !< full $full")
    // completeness: every planted twin pair (J ≈ 0.95 ≥ t) is found
    val found = graft.queries.Dedup.d13PrefixJaccard(spark, sf)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val twins = (0L until 60L).map(i => (i, i + 100000L))
    assert(twins.forall(found.contains), "a planted twin pair was missed")
  }

  test("bloom: no false negatives, low false-positive rate, real pruning") {
    val bits = 1 << 16
    val hashes = 6
    val corpus = (1L to 500L).map(i => s"member-$i").toDF("fp")
    val words = DedupOps.bloomWords(corpus, col("fp"), bits, hashes)
    // every member tests positive (no false negatives — exactness hinges here)
    val misses = corpus
      .filter(!DedupOps.maybeInBloom(words, bits, hashes, col("fp"))).count()
    assert(misses === 0)
    // non-members mostly test negative: 500 keys in 65536 bits / 6
    // hashes → theoretical fp ≈ 2e-4; allow a generous margin
    val probes = (1L to 2000L).map(i => s"absent-$i").toDF("fp")
    val falsePos = probes
      .filter(DedupOps.maybeInBloom(words, bits, hashes, col("fp"))).count()
    assert(falsePos <= 20, s"false positives $falsePos / 2000")
  }

  test("d12 incremental dedup ≡ plain anti-join; bloom prunes the confirm side") {
    import graft.functions.DedupOps
    val docs = Q.t(spark, sf, "documents").select("doc_id", "text")
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
      .withColumn("fp", md5(col("text").cast("binary")))
    val recrawled = corpus.filter(col("doc_id") % 7 === 1)
      .select((col("doc_id") + 2000000L).as("doc_id"), col("fp"))
    val batch = docs.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), md5(col("text").cast("binary")).as("fp"))
      .unionByName(recrawled)
    // the naive exact path (what the oracle computes)
    val naive = DedupOps.dedupByFingerprint(
      batch.join(corpus.select("fp"), Seq("fp"), "left_anti"),
      col("fp"), "doc_id")
      .select("doc_id", "fp").orderBy(col("doc_id").asc).collect()
    val got = graft.queries.Dedup.d12IncrementalDedup(spark, sf).collect()
    assert(got.map(r => (r.getLong(0), r.getString(1))).toSeq ===
      naive.map(r => (r.getLong(0), r.getString(1))).toSeq)
    // pruning: rows surviving the bloom ≈ true dups (+ tiny fp sliver),
    // far fewer than the whole batch
    val bits = 1 << 16
    val words = DedupOps.bloomWords(corpus, col("fp"), bits, 6)
    val residue = batch
      .filter(DedupOps.maybeInBloom(words, bits, 6, col("fp"))).count()
    val trueDups = batch.join(corpus.select("fp"), Seq("fp"), "left_semi").count()
    assert(residue >= trueDups) // no false negatives
    assert(residue <= trueDups + batch.count() / 10,
      s"bloom residue $residue vs true dups $trueDups — not pruning")
  }

  test("SemDeDup: planted paraphrase embeddings collapse, distinct survive") {
    import graft.queries.Dedup
    // two tight direction clusters + one outlier, all unit vectors
    val emb = Seq(
      (1L, Seq(1.0, 0.0, 0.0, 0.0)),
      (2L, Seq(0.999, 0.0447, 0.0, 0.0)),   // cos(1,2) ≈ 0.999 ≥ τ
      (3L, Seq(0.0, 1.0, 0.0, 0.0)),
      (4L, Seq(0.0447, 0.999, 0.0, 0.0)),   // cos(3,4) ≈ 0.999 ≥ τ
      (5L, Seq(0.0, 0.0, 1.0, 0.0))         // unique direction
    ).toDF("vec_id", "v")
    val seeds = Seq(
      (10L, Seq(1.0, 0.0, 0.0, 0.0)),
      (20L, Seq(0.0, 1.0, 0.0, 0.0)),
      (30L, Seq(0.0, 0.0, 1.0, 0.0))
    ).toDF("cluster_id", "seed_v")
    val got = Dedup.semDedup(spark, emb, seeds, tau = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got.toSeq === Seq(
      (1L, 1L, true), (2L, 1L, false),
      (3L, 3L, true), (4L, 3L, false),
      (5L, 5L, true)))
  }

  test("SemDeDup on sf corpus: one survivor per group, min-id canonical, no cartesian") {
    val res = graft.queries.Dedup.d11SemDedup(spark, sf)
    // the only non-equi join is the broadcast seed assignment — the
    // within-cluster pair pass must stay an equi-join, never a
    // corpus-wide cartesian
    assert(!res.queryExecution.executedPlan.toString.contains("CartesianProduct"))
    val rows = res.collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val emb = Q.t(spark, sf, "embeddings")
    assert(rows.length === emb.count())
    assert(rows.map(_._1).distinct.length === rows.length)
    rows.groupBy(_._2).foreach { case (gid, members) =>
      assert(members.count(_._3) === 1, s"group $gid keeps exactly one")
      assert(members.filter(_._3).head._1 === members.map(_._1).min,
        s"group $gid canonical survivor is min id")
      assert(gid === members.map(_._1).min, s"group id $gid is the min member")
    }
  }
}

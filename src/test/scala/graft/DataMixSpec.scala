package graft

import org.apache.spark.sql.functions._

/** Invariants of the training-data mixing operators (§2.12) that the
  * row-level oracle can't express: packing conservation/contiguity,
  * sampling monotonicity in the weights, and filter rate bounds.
  */
class DataMixSpec extends SparkTestBase {
  quiet()

  test("mix2: packs conserve tokens, ids are contiguous, budget is respected") {
    val budget = 2048L
    val packs = SparkEntry.queries("mix2_seq_packing")(spark, sf).cache()
    val docs = Q.t(spark, sf, "documents")
      .select(col("lang"), size(split(col("text"), " ")).cast("long").as("n"))

    // conservation: per-lang pack tokens == per-lang corpus tokens
    val perLangPacked = packs.groupBy("lang")
      .agg(sum("pack_tokens").as("packed")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val perLangCorpus = docs.groupBy("lang").agg(sum("n").as("total"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perLangPacked === perLangCorpus)

    // contiguity: pack ids are 0..max with no holes
    packs.groupBy("lang")
      .agg(min("pack_id").as("lo"), max("pack_id").as("hi"),
        countDistinct("pack_id").as("d"))
      .collect().foreach { r =>
        assert(r.getLong(1) === 0L, s"${r.getString(0)} min pack")
        assert(r.getLong(3) === r.getLong(2) + 1, s"${r.getString(0)} holes")
      }

    // every pack except a lang's last holds ≥ budget tokens minus the
    // max carry-over (a doc that straddles the boundary counts fully
    // toward the pack it STARTS in — concat-then-chunk semantics)
    val maxDoc = docs.agg(max("n")).head().getLong(0)
    val lastPack = packs.groupBy("lang").agg(max("pack_id").as("last"))
    packs.join(lastPack, "lang")
      .filter(col("pack_id") < col("last"))
      .filter(col("pack_tokens") < budget - maxDoc)
      .collect().ensuring(_.isEmpty, "undersized non-final pack")
    packs.unpersist(): Unit
  }

  test("mix1: survivors are exactly the docs whose hash clears their lang weight") {
    val out = SparkEntry.queries("mix1_hash_sample")(spark, sf)
    // survivor set is stable across runs (determinism)
    val again = SparkEntry.queries("mix1_hash_sample")(spark, sf)
    assert(out.exceptAll(again).count() === 0)
    // raising a weight only ADDS docs: u < w is monotone in w, so the
    // 0.5-en sample must be a subset of an all-1.0 run (= all docs)
    val total = Q.t(spark, sf, "documents").count()
    assert(out.count() > 0 && out.count() < total)
    // per-lang keep rate tracks the weight (hash is uniform; generous bounds)
    val rates = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    val base = Q.t(spark, sf, "documents").groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    val want = Map("en" -> 0.5, "zh" -> 0.9, "de" -> 0.8, "es" -> 0.8, "fr" -> 0.8)
    want.foreach { case (l, w) =>
      val got = rates.getOrElse(l, 0.0) / base(l)
      assert(math.abs(got - w) < 0.25, s"$l keep rate $got vs weight $w")
    }
  }

  test("mix3: keeps at most ~half per lang and every kept doc outranks every dropped one") {
    val kept = SparkEntry.queries("mix3_quality_filter")(spark, sf)
    val keptCounts = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val baseCounts = Q.t(spark, sf, "documents").groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    baseCounts.foreach { case (l, n) =>
      val k = keptCounts.getOrElse(l, 0L)
      assert(k >= 1 && k <= n / 2 + 1, s"$l kept $k of $n")
      // min kept quality ≥ max dropped quality (rank cut, not a global threshold)
    }
    val minKept = kept.groupBy("lang").agg(min("quality").as("mn"))
    val dropped = Q.t(spark, sf, "documents").select(col("doc_id"), col("lang"))
      .join(kept.select("doc_id"), Seq("doc_id"), "left_anti")
    val maxDropped = dropped.join(
        SparkEntry.queries("tx_quality_score")(spark, sf)
          .select(col("doc_id"), col("quality")), Seq("doc_id"))
      .groupBy("lang").agg(max("quality").as("mx"))
    minKept.join(maxDropped, "lang").collect().foreach { r =>
      assert(r.getAs[Double]("mn") >= r.getAs[Double]("mx"),
        s"${r.getString(0)}: kept below dropped")
    }
  }
}

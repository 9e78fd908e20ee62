package graft.operators

import graft.functions.Bpe
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding tokenizer TRAINING (Sennrich et al.
  * 2016) — the canonical algorithm, re-shaped for Spark's execution
  * model:
  *
  *  1. ONE pass over the corpus builds the distinct-word frequency
  *     table (explode + hash aggregate with map-side combine). Zipf's
  *     law makes this table orders of magnitude smaller than the corpus
  *     — at 100 TB of text it is the ~10⁸-row working set every merge
  *     iteration runs on, and it stays DISTRIBUTED (never collected).
  *  2. Per merge: adjacent-pair counts over the word table (narrow
  *     flatMap via zip_with on the symbol split, then one partial-agg
  *     shuffle keyed by pair), argmax with a deterministic tie-break
  *     (count desc, then pair lexicographic asc — a total order, so
  *     training is bit-reproducible at any parallelism), and a NARROW
  *     literal-replace applying the merge to every word. The only
  *     driver traffic per iteration is the 1-row argmax.
  *  3. Lineage is truncated with localCheckpoint every few merges
  *     (the [[graft.functions.GraphOps.pageRank]] pattern) so the
  *     replace chain neither bloats codegen nor re-executes from the
  *     corpus scan.
  *
  * Symbols use the bracketed-string representation from
  * [[graft.functions.Bpe]]; merges therefore apply as codegen'd
  * string replaces with canonical left-to-right greedy semantics.
  */
object BpeTrainer {

  /** One learned merge: rank order, the two joined symbols (marker
    * rendered `</w>` by the query layer, raw here), and the pair's
    * corpus frequency when it won.
    */
  final case class Merge(rank: Int, left: String, right: String,
      freq: Long)

  /** Train `numMerges` merges over `docs(textCol)`. Stops early when no
    * adjacent pair occurs twice (nothing left to compress).
    */
  def train(docs: DataFrame, numMerges: Int,
      textCol: String = "text"): Seq[Merge] = {
    require(numMerges >= 1, "bpeTrain: numMerges must be >= 1")
    val spark = docs.sparkSession
    import spark.implicits._

    val words = docs
      .select(explode(split(Bpe.sanitize(col(textCol)), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(Bpe.wrapWord(col("w")).as("syms"), col("cnt"))
      .localCheckpoint(true)

    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var cur = words
    var sinceCkpt = 0
    var i = 0
    var exhausted = false
    while (i < numMerges && !exhausted) {
      // symbol array of each word, adjacent pairs via zip_with on the
      // shifted slices — all codegen'd built-ins, no UDF
      val toks = split(trim(col("syms"), Bpe.B), Bpe.B + Bpe.B)
      val top = cur
        .select(col("cnt"), toks.as("t"))
        .select(col("cnt"), explode(zip_with(
          slice(col("t"), lit(1), size(col("t")) - 1),
          slice(col("t"), lit(2), size(col("t")) - 1),
          (l, r) => struct(l.as("l"), r.as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("c"))
        .filter(col("c") >= 2)
        .orderBy(col("c").desc, col("l").asc, col("r").asc)
        .limit(1)
        .as[(String, String, Long)]
        .collect() // bounded: exactly the 1-row argmax
      top.headOption match {
        case None => exhausted = true
        case Some((l, r, c)) =>
          merges += Merge(i, l, r, c)
          cur = cur.withColumn("syms",
            graft.functions.Bpe.applyMerges(col("syms"), Seq((l, r))))
          sinceCkpt += 1
          if (sinceCkpt >= 8) { // truncate the replace-chain lineage
            cur = cur.localCheckpoint(true)
            sinceCkpt = 0
          }
          i += 1
      }
    }
    merges.toSeq
  }

  /** Train and return the merge table as a DataFrame (marker rendered
    * `</w>`), ordered by rank — the `tx_bpe_train` query surface.
    */
  def trainDf(spark: SparkSession, docs: DataFrame,
      numMerges: Int): DataFrame = {
    import spark.implicits._
    train(docs, numMerges)
      .map(m => (m.rank,
        m.left.replace(Bpe.W, "</w>"),
        m.right.replace(Bpe.W, "</w>"),
        (m.left + m.right).replace(Bpe.W, "</w>"),
        m.freq))
      .toDF("rank", "left", "right", "merged", "freq")
      .orderBy(col("rank").asc)
  }
}

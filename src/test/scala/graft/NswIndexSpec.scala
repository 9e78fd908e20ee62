package graft

import graft.operators.NswIndex
import graft.queries.Similarity
import org.apache.spark.sql.functions._

/** The persisted NSW graph-ANN index: recall against the exact
  * brute-force ranking, persistence roundtrip, determinism, and the
  * kernel's bounded-work property.
  */
class NswIndexSpec extends SparkTestBase {
  quiet()
  import spark.implicits._

  private def scratch(name: String): String = {
    val dir = s"${sys.props("java.io.tmpdir")}/graft_nsw_$name"
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    dir
  }

  private lazy val emb = Similarity.unitVectors(spark, sf)
  private lazy val probes = emb.filter(col("vec_id") < 10)
    .select(col("vec_id").as("q_id"), col("v").as("q_v"))

  test("NSW recall ≥ 0.9 vs exact top-3 on the sf corpus; deterministic") {
    val root = scratch("recall")
    val idx = NswIndex.build(spark, emb, root)
    val exact = Similarity.s1BruteForceTopK(spark, sf)
      .select(col("q_id"), col("neighbor")).as[(Long, Long)].collect().toSet
    val got = idx.query(probes, topK = 3, ef = 64)
      .select(col("q_id"), col("neighbor")).as[(Long, Long)].collect().toSet
    val recall = (exact intersect got).size.toDouble / exact.size
    assert(recall >= 0.9, s"NSW recall $recall < 0.9")
    // similarities on overlapping pairs are the EXACT cosine (graph
    // search prunes candidates, never approximates the score)
    val exactSims = Similarity.s1BruteForceTopK(spark, sf)
      .select(col("q_id"), col("neighbor"), col("sim"))
      .as[(Long, Long, Double)].collect()
      .map { case (q, nb, s) => (q, nb) -> s }.toMap
    idx.query(probes, topK = 3, ef = 64)
      .select(col("q_id"), col("neighbor"), col("sim"))
      .as[(Long, Long, Double)].collect()
      .foreach { case (q, nb, s) =>
        exactSims.get((q, nb)).foreach(e => assert(math.abs(e - s) < 1e-9))
      }
    // determinism: two queries, identical rows
    val a = idx.query(probes, topK = 3, ef = 64).collect().toSeq
    val b = idx.query(probes, topK = 3, ef = 64).collect().toSeq
    assert(a === b)
  }

  test("persistence: load serves identically to the just-built index") {
    val root = scratch("persist")
    val built = NswIndex.build(spark, emb, root)
    val wantRows = built.query(probes, topK = 3, ef = 64).collect().toSeq
    val loaded = NswIndex.load(spark, root).get
    assert(loaded.entryIds === built.entryIds)
    assert(loaded.query(probes, topK = 3, ef = 64).collect().toSeq === wantRows)
    assert(NswIndex.load(spark, scratch("nothere")).isEmpty)
  }

  test("clustered corpus: graph is CONNECTED (long links) and a wide beam escapes islands") {
    // tight clusters make a pure kNN graph a set of disconnected
    // islands — the failure mode HNSW's upper layers (here: the
    // hash-ordered path links) exist to fix
    val rnd = new scala.util.Random(7)
    val dim = 16
    val centers = Array.fill(20)(Array.fill(dim)(rnd.nextGaussian()))
    val pts = for { c <- centers.indices; i <- 0 until 25 } yield
      (c * 25L + i, centers(c).map(x => x + 0.05 * rnd.nextGaussian()).toSeq)
    val corpus = Similarity.unitize(pts.toDF("vec_id", "raw_v"))
    val root = scratch("clustered")
    val idx = NswIndex.build(spark, corpus, root, m = 6)
    // connectivity: BFS over the persisted adjacency reaches EVERY node
    val adjRows = idx.table.read().select("vec_id", "neighbors").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val seen = scala.collection.mutable.Set(adjRows.keys.head)
    val queue = scala.collection.mutable.Queue(adjRows.keys.head)
    while (queue.nonEmpty)
      adjRows(queue.dequeue()).foreach { nb =>
        if (!seen.contains(nb)) { seen += nb; queue.enqueue(nb) }
      }
    assert(seen.size === 500, s"graph disconnected: ${seen.size}/500 reachable")
    // a narrow beam returns topK valid, rank-ordered rows cheaply
    val qs2 = corpus.filter(col("vec_id") % 25 === 0).limit(5)
      .select(col("vec_id").as("q_id"), col("v").as("q_v"))
    val narrow = idx.query(qs2, topK = 3, ef = 8).collect()
    assert(narrow.length === 15)
    narrow.groupBy(_.getLong(0)).values.foreach { rs =>
      val sims = rs.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(sims.sorted.reverse.toSeq === sims.toSeq, "ranks not by sim")
    }
    // a wide beam walks the long links out of whatever island the
    // entries land in: ≥ 0.9 of results are true in-cluster neighbors
    val wide = idx.query(qs2, topK = 3, ef = 300).collect()
    val inCluster = wide.count(r => r.getLong(2) / 25 === r.getLong(0) / 25)
    assert(inCluster >= 14, s"only $inCluster/15 in-cluster at ef=300")
  }
}

package graft

import graft.lake.Merge
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based merge algebra (SURVEY.md §5.4): idempotency,
  * last-writer-wins, commutativity for disjoint keys — over generated
  * keyed tables (raw scalacheck generators, deterministic seeds).
  */
class MergePropertiesSpec extends SparkTestBase {
  quiet()
  import spark.implicits._

  private val rowGen = for {
    k <- Gen.choose(0L, 30L)
    v <- Gen.choose(0, 1000)
    s <- Gen.oneOf("a", "b", "c")
  } yield (k, v, s)

  /** distinct keys within a feed (a CDC batch has one row per key) */
  private val tableGen: Gen[List[(Long, Int, String)]] =
    Gen.listOfN(20, rowGen).map(_.groupBy(_._1).map(_._2.head).toList)

  private def sample(seed: Long): List[(Long, Int, String)] =
    tableGen.pureApply(Gen.Parameters.default, Seed(seed))

  private def df(rows: List[(Long, Int, String)]) = rows.toDF("k", "v", "s")

  test("merge is idempotent: apply(apply(b,u),u) == apply(b,u)") {
    (1 to 5).foreach { i =>
      val (b, u) = (sample(i), sample(i + 100))
      val once = Merge.upsert(df(b), df(u), Seq("k"))
      val twice = Merge.upsert(once, df(u), Seq("k"))
      assert(twice.exceptAll(once).count() === 0, s"seed $i")
      assert(once.exceptAll(twice).count() === 0, s"seed $i")
    }
  }

  test("last writer wins: merged values for update keys come from the feed") {
    (1 to 5).foreach { i =>
      val (b, u) = (sample(i + 200), sample(i + 300))
      val merged = Merge.upsert(df(b), df(u), Seq("k")).as[(Long, Int, String)]
        .collect().map(r => r._1 -> ((r._2, r._3))).toMap
      u.foreach { case (k, v, s) => assert(merged(k) === ((v, s))) }
      val uKeys = u.map(_._1).toSet
      b.filterNot(r => uKeys.contains(r._1)).foreach { case (k, v, s) =>
        assert(merged(k) === ((v, s)))
      }
      assert(merged.size === (b.map(_._1).toSet ++ uKeys).size)
    }
  }

  test("disjoint-key feeds commute") {
    (1 to 3).foreach { i =>
      val b = sample(i + 400)
      val u1 = sample(i + 500).map { case (k, v, s) => (k * 2, v, s) }     // even
      val u2 = sample(i + 600).map { case (k, v, s) => (k * 2 + 1, v, s) } // odd
      val ab = Merge.upsert(Merge.upsert(df(b), df(u1), Seq("k")), df(u2), Seq("k"))
      val ba = Merge.upsert(Merge.upsert(df(b), df(u2), Seq("k")), df(u1), Seq("k"))
      assert(ab.exceptAll(ba).count() === 0, s"seed $i")
      assert(ba.exceptAll(ab).count() === 0, s"seed $i")
    }
  }

  test("effectiveChanges is empty iff the feed is already applied") {
    (1 to 5).foreach { i =>
      val b = sample(i + 700)
      assert(Merge.effectiveChanges(df(b), df(b)).count() === 0)
      val bumped = b.map { case (k, v, s) => (k, v + 1, s) }
      if (b.nonEmpty)
        assert(Merge.effectiveChanges(df(b), df(bumped)).count() === b.size)
    }
  }
}

package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Window-vs-brute-force properties (SURVEY.md §5.4): windowed
  * row_number / running sum over generated data must equal a plain
  * Scala computation over the same rows.
  */
class WindowPropertiesSpec extends SparkTestBase {
  quiet()
  import spark.implicits._

  private val rowGen = for {
    k <- Gen.choose(0, 5)
    ord <- Gen.choose(0L, 1000L)
    v <- Gen.choose(1, 100)
  } yield (k, ord, v)

  private def sample(seed: Long): List[(Int, Long, Int)] =
    Gen.listOfN(200, rowGen).pureApply(Gen.Parameters.default, Seed(seed))
      // unique (k, ord) so the window ordering is total
      .groupBy(r => (r._1, r._2)).map(_._2.head).toList

  test("row_number equals brute-force rank over generated data") {
    (1 to 3).foreach { i =>
      val rows = sample(i)
      val w = Window.partitionBy($"k").orderBy($"ord")
      val got = rows.toDF("k", "ord", "v")
        .withColumn("rn", row_number().over(w))
        .as[(Int, Long, Int, Int)].collect().toSet
      val expected = rows.groupBy(_._1).flatMap { case (_, grp) =>
        grp.sortBy(_._2).zipWithIndex.map { case ((k, o, v), idx) =>
          (k, o, v, idx + 1)
        }
      }.toSet
      assert(got === expected, s"seed $i")
    }
  }

  test("running sum equals brute-force prefix sum over generated data") {
    (1 to 3).foreach { i =>
      val rows = sample(i + 50)
      val w = Window.partitionBy($"k").orderBy($"ord")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val got = rows.toDF("k", "ord", "v")
        .withColumn("run", sum($"v").over(w))
        .as[(Int, Long, Int, Long)].collect().toSet
      val expected = rows.groupBy(_._1).flatMap { case (_, grp) =>
        val sorted = grp.sortBy(_._2)
        sorted.scanLeft(0L)((acc, r) => acc + r._3).tail
          .zip(sorted).map { case (run, (k, o, v)) => (k, o, v, run) }
      }.toSet
      assert(got === expected, s"seed $i")
    }
  }
}

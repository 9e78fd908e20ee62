package graft

import graft.lake.ManifestTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** L17 CHECK constraints + DESCRIBE DETAIL: persisted gates that every
  * writer instance enforces before committing; violations fail loudly
  * and leave the table untouched.
  */
class ConstraintSpec extends SparkTestBase {
  quiet()
  import spark.implicits._

  private def scratch(name: String): String = {
    val dir = s"${sys.props("java.io.tmpdir")}/graft_cstr_$name"
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    dir
  }

  private def base: DataFrame =
    Seq((1L, 10.0, "a"), (2L, 20.0, "b"), (3L, 30.0, "a"))
      .toDF("id", "amt", "tag")

  /** Violations now throw INSIDE the write job (assert_true), so the
    * driver sees a SparkException chain — search the causes.
    */
  private def deepMsg(t: Throwable): String =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")

  test("violating append throws with the constraint name; table untouched") {
    val mt = new ManifestTable(spark, scratch("violate"))
    mt.write(base, "overwrite")
    mt.addConstraint("amt_positive", "amt > 0")
    mt.write(Seq((4L, 5.0, "c")).toDF("id", "amt", "tag"), "append") // ok
    val v = mt.latestVersion.get
    val ex = intercept[Exception] {
      mt.write(Seq((5L, -1.0, "c")).toDF("id", "amt", "tag"), "append")
    }
    assert(deepMsg(ex).contains("amt_positive"))
    assert(mt.latestVersion.get === v, "violating write must not commit")
    assert(mt.read().count() === 4)
    // the failed write's staging dir is cleaned up, not leaked
    val leftovers = new java.io.File(mt.describeDetail()
      .first().getAs[String]("location")).listFiles()
      .filter(_.getName.startsWith(".stage-"))
    assert(leftovers.isEmpty, leftovers.mkString(","))
  }

  test("adding a constraint the EXISTING data violates is rejected") {
    val mt = new ManifestTable(spark, scratch("preexisting"))
    mt.write(base, "overwrite")
    val ex = intercept[IllegalArgumentException] {
      mt.addConstraint("id_small", "id < 3")
    }
    assert(ex.getMessage.contains("id_small"))
    assert(mt.constraints.isEmpty, "rejected constraint must not register")
  }

  test("constraints persist: a fresh instance on the same root enforces them") {
    val dir = scratch("persist")
    val mt = new ManifestTable(spark, dir)
    mt.write(base, "overwrite")
    mt.addConstraint("amt_positive", "amt > 0")
    val other = new ManifestTable(spark, dir) // new writer, same table
    assert(other.constraints === Map("amt_positive" -> "amt > 0"))
    assert(deepMsg(intercept[Exception] {
      other.write(Seq((9L, -9.0, "z")).toDF("id", "amt", "tag"), "append")
    }).contains("amt_positive"))
    other.dropConstraint("amt_positive")
    // drop is visible to the first instance too
    mt.write(Seq((9L, -9.0, "z")).toDF("id", "amt", "tag"), "append")
    assert(mt.read().count() === 4)
  }

  test("merge and updateWhere validate; SQL CHECK lets NULL pass") {
    val mt = new ManifestTable(spark, scratch("merge"))
    mt.write(base, "overwrite")
    mt.addConstraint("amt_positive", "amt > 0")
    assert(deepMsg(intercept[Exception] {
      mt.merge(Seq((2L, -5.0, "b")).toDF("id", "amt", "tag"), Seq("id"))
    }).contains("amt_positive"))
    assert(deepMsg(intercept[Exception] {
      mt.updateWhere(col("id") === 2L, Map("amt" -> lit(-1.0)))
    }).contains("amt_positive"))
    // NULL evaluation passes CHECK (SQL standard); merge commits
    mt.merge(Seq((Some(7L), Option.empty[Double], Some("n")))
      .toDF("id", "amt", "tag"), Seq("id"))
    assert(mt.read().filter(col("id") === 7L).count() === 1)
  }

  test("history lists every version with file deltas and DV row counts") {
    val mt = new ManifestTable(spark, scratch("history"))
    mt.write(base, "overwrite") // v0
    mt.write(Seq((4L, 40.0, "c")).toDF("id", "amt", "tag"), "append") // v1
    mt.delete(col("id") === 1L) // v2: DV only
    mt.compact(1) // v3: rewrite
    val h = mt.history().collect()
    assert(h.map(_.getAs[Int]("version")).toSeq === Seq(0, 1, 2, 3))
    val byV = h.map(r => r.getAs[Int]("version") -> r).toMap
    assert(byV(1).getAs[Long]("files_added") >= 1L)
    assert(byV(1).getAs[Long]("files_removed") === 0L, "append removes nothing")
    assert(byV(2).getAs[Long]("dv_deleted_rows") === 1L)
    assert(byV(2).getAs[Long]("files_added") === 0L,
      "a DV re-point adds no files")
    assert(byV(3).getAs[Long]("files_removed") ===
      byV(2).getAs[Long]("num_files"), "compaction replaces the file set")
    assert(byV(3).getAs[Long]("dv_deleted_rows") === 0L,
      "compaction materializes deletes")
  }

  test("describeDetail summarizes version, files, bytes, DVs, constraints") {
    val mt = new ManifestTable(spark, scratch("detail"),
      partitionCol = Some("tag"), statsCol = Some("id"))
    mt.write(base, "overwrite")
    mt.addConstraint("amt_positive", "amt > 0")
    mt.delete(col("id") === 1L)
    val d = mt.describeDetail().first()
    assert(d.getAs[String]("format") === "graft-manifest")
    assert(d.getAs[Int]("version") === 1)
    assert(d.getAs[Long]("num_files") >= 1L)
    assert(d.getAs[Long]("size_bytes") > 0L)
    assert(d.getAs[Seq[String]]("partition_columns") === Seq("tag"))
    assert(d.getAs[Seq[String]]("stats_columns") === Seq("id"))
    assert(d.getAs[Long]("num_dv_files") >= 1L)
    assert(d.getAs[Long]("num_constraints") === 1L)
  }
}

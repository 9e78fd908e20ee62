package graft

import graft.lake.ManifestTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Commit-log deltas + checkpoints: every non-checkpoint commit writes
  * O(changed-files) bytes, readers fold checkpoint + tail, and the
  * whole versioned surface (time travel, RESTORE, CDF, vacuum) is
  * unchanged on top of the new log shape.
  */
class ManifestLogSpec extends SparkTestBase {
  quiet()

  private def scratch(name: String): String = {
    val dir = s"${sys.props("java.io.tmpdir")}/graft_log_$name"
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    dir
  }

  private def fsOf(dir: String) = new org.apache.hadoop.fs.Path(dir)
    .getFileSystem(spark.sessionState.newHadoopConf())

  private def logFiles(dir: String): Map[String, Long] = {
    val log = new org.apache.hadoop.fs.Path(dir, "_graft_log")
    fsOf(dir).listStatus(log).map(st => st.getPath.getName -> st.getLen)
      .filter(kv => kv._1.endsWith(".manifest") || kv._1.endsWith(".delta"))
      .toMap
  }

  private def row(i: Int): DataFrame = {
    import spark.implicits._
    Seq((i.toLong, s"payload_$i")).toDF("id", "s")
  }

  test("100 small appends write O(delta) commit entries, checkpoints on cadence") {
    val dir = scratch("replay")
    val mt = new ManifestTable(spark, dir)
    mt.write(row(0), "overwrite") // v0: checkpoint by definition
    (1 to 100).foreach(i => mt.write(row(i), "append"))
    assert(mt.latestVersion.get === 100)
    assert(mt.read().count() === 101)

    val files = logFiles(dir)
    // checkpoints exactly at v0 and every 10th version; deltas elsewhere
    (0 to 100).foreach { v =>
      val isCkpt = v == 0 || v % 10 == 0
      assert(files.contains(f"v$v%05d.${if (isCkpt) "manifest" else "delta"}"),
        s"v$v should be a ${if (isCkpt) "checkpoint" else "delta"}: ${files.keys.toSeq.sorted.take(5)}")
    }
    // each delta is one added file — tens of bytes + one entry line,
    // NOT proportional to the table's ~100 accumulated files
    val deltaSizes = files.collect { case (n, len) if n.endsWith(".delta") => len }
    assert(deltaSizes.nonEmpty)
    assert(deltaSizes.max < 400,
      s"append delta should be O(1 file entry), got max ${deltaSizes.max} bytes")
    // checkpoints grow with the table — sanity that they ARE snapshots
    val v90 = files(f"v${90}%05d.manifest")
    assert(v90 > deltaSizes.max * 10,
      s"checkpoint v90 ($v90 B) should dwarf a delta (${deltaSizes.max} B)")
  }

  test("time travel resolves any version through the delta chain") {
    val dir = scratch("travel")
    val mt = new ManifestTable(spark, dir)
    mt.write(row(0), "overwrite")
    (1 to 25).foreach(i => mt.write(row(i), "append"))
    // spot-check versions resolved from a checkpoint (v20), mid-chain
    // deltas (v7, v13, v25), and the anchor (v0)
    Seq(0, 7, 13, 20, 25).foreach { v =>
      assert(mt.read(Some(v)).count() === v + 1, s"version $v")
    }
  }

  test("merge/delete/compact deltas replay correctly (remove + re-point lines)") {
    val dir = scratch("mixed")
    val mt = new ManifestTable(spark, dir)
    val base = Q.t(spark, sf, "orders")
      .select(col("o_orderkey").as("id"), col("o_totalprice").as("amt"))
      .limit(200)
    mt.write(base.repartition(4), "overwrite") // v0 ckpt
    mt.write(base.limit(3).withColumn("id", col("id") + 500000L), "append") // v1 delta
    mt.delete(col("id") % 7 === 0) // v2 delta: DV re-point lines
    val expect2 = base.unionByName(
        base.limit(3).withColumn("id", col("id") + 500000L))
      .filter(col("id") % 7 =!= 0)
    assert(mt.read().count() === expect2.count())
    assert(mt.read().exceptAll(expect2).count() === 0)
    mt.merge(expect2.limit(5).withColumn("amt", col("amt") + 1), Seq("id")) // v3 delta
    mt.compact(2) // v4 delta: full rewrite as remove-all + add
    assert(mt.read().count() === expect2.count())
    // every intermediate version still resolves
    assert(mt.read(Some(0)).count() === 200)
    assert(mt.read(Some(1)).count() === 203)
    assert(mt.read(Some(2)).count() === expect2.count())
  }

  test("RESTORE from a delta version writes a standalone snapshot") {
    val dir = scratch("restore")
    val mt = new ManifestTable(spark, dir)
    mt.write(row(0), "overwrite")
    (1 to 5).foreach(i => mt.write(row(i), "append"))
    mt.restore(3) // v6 = v3's file set
    assert(mt.read().count() === 4)
    // restore is a full-manifest commit: readable even if v0..v5 vanish
    val files = logFiles(dir)
    assert(files.contains("v00006.manifest"))
  }

  test("CDF across delta versions") {
    val dir = scratch("cdf")
    val mt = new ManifestTable(spark, dir)
    mt.write(row(0), "overwrite")
    (1 to 4).foreach(i => mt.write(row(i), "append"))
    val ch = mt.changesBetween(1, 4, Seq("id"))
    assert(ch.filter(col("_change_type") === "insert").count() === 3)
    assert(ch.filter(col("_change_type") =!= "insert").count() === 0)
  }

  test("vacuum materializes a checkpoint for the oldest kept delta version") {
    val dir = scratch("vac")
    val mt = new ManifestTable(spark, dir)
    mt.write(row(0), "overwrite")
    (1 to 7).foreach(i => mt.write(row(i), "append")) // v7 latest, a delta
    mt.vacuum(retain = 2, minAgeMs = 0) // keeps v6, v7 — both deltas
    assert(mt.versions === Seq(6, 7))
    // chain upstream is gone; the kept versions must still resolve
    assert(mt.read(Some(6)).count() === 7)
    assert(mt.read().count() === 8)
    val files = logFiles(dir)
    assert(files.contains("v00006.manifest"),
      s"oldest kept version must be checkpointed: ${files.keys.toSeq.sorted}")
    assert(files.contains("v00007.delta"))
  }

  test("concurrent appends race onto distinct delta versions") {
    val dir = scratch("race")
    val mt = new ManifestTable(spark, dir)
    mt.write(row(0), "overwrite")
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fs = (1 to 6).map(i => Future {
      new ManifestTable(spark, dir).write(row(i), "append")
    })
    val versions = Await.result(Future.sequence(fs), 120.seconds)
    assert(versions.toSet.size === 6, s"each append its own version: $versions")
    assert(mt.read().count() === 7, "no append lost")
  }
}

package graft

import graft.ingest.RawIngest
import graft.lake.{ManifestTable, Merge}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** L1–L5 semantics on the reference CSVs: the Updated.csv CDC feed must
  * change exactly 8 rows, idempotently; versions are immutable;
  * compaction and vacuum preserve the latest state.
  */
class LakeSpec extends SparkTestBase {
  quiet()

  val fixtures: String = getClass.getResource("/datasets").getPath

  private def scratch(name: String): String = {
    val dir = s"${sys.props("java.io.tmpdir")}/graft_test_$name"
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    dir
  }

  private def orders: DataFrame =
    RawIngest.readCsvInferred(spark, s"$fixtures/orders_2024-06-06.csv")
  private def updated: DataFrame =
    RawIngest.readCsvInferred(spark, s"$fixtures/orders_2024-06-06-Updated.csv")

  test("L1: CDC feed has exactly 8 effective changes of 47 rows") {
    assert(updated.count() === 47)
    assert(Merge.effectiveChanges(orders, updated).count() === 8)
  }

  test("L1: merge applies 8 updates, inserts 0, preserves the rest") {
    val merged = Merge.upsert(orders, updated, Seq("order_id"))
    assert(merged.count() === orders.count()) // no inserts
    // exactly the 8 corrected rows differ from the base
    assert(merged.exceptAll(orders).count() === 8)
    // and only total_amount changed
    val changedCols = merged.as("m")
      .join(orders.as("o"), col("m.order_id") === col("o.order_id"))
      .filter(col("m.total_amount") =!= col("o.total_amount"))
    assert(changedCols.count() === 8)
  }

  test("L1: merge is idempotent (re-apply is a no-op)") {
    val once = Merge.upsert(orders, updated, Seq("order_id"))
    val twice = Merge.upsert(once, updated, Seq("order_id"))
    assert(twice.exceptAll(once).count() === 0)
    assert(Merge.effectiveChanges(once, updated).count() === 0)
  }

  test("L1/L3: manifest merge commits a version; re-apply commits nothing") {
    val mt = new ManifestTable(spark, scratch("merge"))
    mt.write(orders, "overwrite")
    assert(mt.latestVersion.contains(0))
    val v1 = mt.merge(updated, Seq("order_id"))
    assert(v1 === 1)
    // idempotent: no new version for an already-applied feed
    assert(mt.merge(updated, Seq("order_id")) === 1)
    assert(mt.versions === Seq(0, 1))
    // time travel: v0 is the pre-merge state
    assert(mt.read(Some(0)).exceptAll(orders).count() === 0)
    assert(mt.read(Some(1)).exceptAll(mt.read(Some(0))).count() === 8)
  }

  test("L1: partitioned merge rewrites only touched partitions") {
    val root = scratch("pmerge")
    val mt = new ManifestTable(spark, root, partitionCol = Some("date"))
    val twoDays = RawIngest.readCsvInferred(spark, s"$fixtures/orders_2024-06-0[67].csv")
    mt.write(twoDays, "overwrite")
    val v0Files = mt.filesOf(0)
    mt.merge(updated, Seq("order_id")) // updates touch only 2024-06-06
    val v1Files = mt.filesOf(1)
    val untouched06_07 = v0Files.filter(_.contains("date=2024-06-07"))
    // 06-07 files carried forward by reference, 06-06 files replaced
    assert(untouched06_07.forall(v1Files.contains))
    assert(v0Files.filter(_.contains("date=2024-06-06"))
      .forall(f => !v1Files.contains(f)))
    assert(mt.read().count() === twoDays.count())
  }

  test("L2: partition overwrite replaces one day atomically") {
    val root = scratch("povr")
    val mt = new ManifestTable(spark, root, partitionCol = Some("date"))
    val twoDays = RawIngest.readCsvInferred(spark, s"$fixtures/orders_2024-06-0[67].csv")
    mt.write(twoDays, "overwrite")
    val day6 = twoDays.filter(col("date") === "2024-06-06").limit(100)
    mt.overwritePartition(day6, "2024-06-06")
    val after = mt.read()
    assert(after.filter(col("date") === "2024-06-06").count() === 100)
    assert(after.filter(col("date") === "2024-06-07").count() === 2222)
  }

  test("L5: compaction preserves state and reduces file count") {
    val root = scratch("compact")
    val mt = new ManifestTable(spark, root)
    // many small appends → many files
    (1 to 4).foreach(_ => mt.write(orders.limit(50), "append"))
    val before = mt.read()
    val nFilesBefore = mt.filesOf(mt.latestVersion.get).size
    mt.compact(1)
    assert(mt.filesOf(mt.latestVersion.get).size < nFilesBefore)
    assert(mt.read().exceptAll(before).count() === 0)
    assert(before.exceptAll(mt.read()).count() === 0)
  }

  test("L4: vacuum deletes unreferenced files, latest stays readable") {
    val root = scratch("vacuum")
    val mt = new ManifestTable(spark, root)
    mt.write(orders, "overwrite")
    mt.write(orders.limit(10), "overwrite") // v1 orphans v0's files
    val deleted = mt.vacuum(retain = 1)
    assert(deleted.nonEmpty)
    assert(mt.versions === Seq(1))
    assert(mt.read().count() === 10)
  }
}

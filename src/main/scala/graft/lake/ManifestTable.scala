package graft.lake

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.util.UUID

/** Versioned parquet table with a plain-text manifest log — a minimal
  * Delta/Iceberg-style transaction layer (no such jars in the offline
  * build; semantics per SURVEY.md §2.9 L1–L5).
  *
  * Layout:
  * {{{
  *   <root>/data/[<part>=<value>/]<uuid>.parquet   immutable data files
  *   <root>/_graft_log/v<NNNNN>.manifest           one line per data file
  * }}}
  *
  * A commit writes the manifest to a temp name then atomically renames it
  * into the log — readers always see a complete version. Single-writer
  * assumption (documented; multi-writer needs a lock service, out of
  * scope). Scale: the manifest lists FILES, not rows — commit cost is
  * O(files), never O(data). Partition-aware merge rewrites only touched
  * partitions and carries every other file forward by reference.
  */
class ManifestTable(spark: SparkSession, root: String,
    partitionCol: Option[String] = None) {

  private val logDir = new Path(root, "_graft_log")
  private val dataDir = new Path(root, "data")
  private def fs: FileSystem =
    logDir.getFileSystem(spark.sessionState.newHadoopConf())

  private def manifestPath(v: Int) = new Path(logDir, f"v$v%05d.manifest")

  def versions: Seq[Int] = {
    if (!fs.exists(logDir)) return Seq.empty
    fs.listStatus(logDir).toSeq
      .map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".manifest"))
      .map(n => n.stripPrefix("v").stripSuffix(".manifest").toInt)
      .sorted
  }

  def latestVersion: Option[Int] = versions.lastOption

  /** Data files (absolute) referenced by a version. */
  def filesOf(version: Int): Seq[String] = {
    val in = fs.open(manifestPath(version))
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.nonEmpty).map(rel => new Path(root, rel).toString).toList
    finally in.close()
  }

  /** Time-travel read: latest when version is None. */
  def read(version: Option[Int] = None): DataFrame = {
    val v = version.orElse(latestVersion)
      .getOrElse(throw new IllegalStateException(s"no versions at $root"))
    val files = filesOf(v)
    if (files.isEmpty) {
      spark.emptyDataFrame
    } else {
      // basePath restores partition columns from directory structure
      spark.read.option("basePath", new Path(root, "data").toString)
        .parquet(files: _*)
    }
  }

  private def commit(relFiles: Seq[String]): Int = {
    fs.mkdirs(logDir)
    val v = latestVersion.getOrElse(-1) + 1
    val tmp = new Path(logDir, s".tmp-${UUID.randomUUID()}")
    val out = fs.create(tmp, false)
    try out.write((relFiles.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    if (!fs.rename(tmp, manifestPath(v)))
      throw new IllegalStateException(s"commit of v$v failed (concurrent writer?)")
    v
  }

  /** Write a DataFrame's rows as new data files; returns their paths
    * relative to the table root. Files land under data/ preserving
    * hive-style partition dirs when the table is partitioned.
    */
  private def writeDataFiles(df: DataFrame): Seq[String] = {
    val stage = new Path(root, s".stage-${UUID.randomUUID()}")
    val writer = df.write.mode("overwrite")
    partitionCol.fold(writer)(c => writer.partitionBy(c)).parquet(stage.toString)
    val moved = scala.collection.mutable.ArrayBuffer[String]()
    def walk(dir: Path, relPrefix: String): Unit =
      fs.listStatus(dir).foreach { st =>
        val name = st.getPath.getName
        if (st.isDirectory) walk(st.getPath, s"$relPrefix$name/")
        else if (name.endsWith(".parquet")) {
          val rel = s"data/$relPrefix${UUID.randomUUID()}.parquet"
          val dest = new Path(root, rel)
          fs.mkdirs(dest.getParent)
          if (!fs.rename(st.getPath, dest))
            throw new IllegalStateException(s"move to $dest failed")
          moved += rel
        }
      }
    walk(stage, "")
    fs.delete(stage, true)
    moved.toSeq
  }

  /** L2/S5: overwrite = new version referencing only the new files;
    * append = new version referencing old + new files.
    */
  def write(df: DataFrame, mode: String = "overwrite"): Int = {
    val newFiles = writeDataFiles(df)
    val carried = mode match {
      case "append" => latestVersion.map(relFilesOf).getOrElse(Seq.empty)
      case "overwrite" => Seq.empty
      case m => throw new IllegalArgumentException(s"mode $m")
    }
    commit(carried ++ newFiles)
  }

  private def relFilesOf(v: Int): Seq[String] =
    filesOf(v).map(f => f.stripPrefix(new Path(root).toString).stripPrefix("/"))

  /** L2: replace exactly one partition (dynamic partition overwrite). */
  def overwritePartition(df: DataFrame, value: String): Int = {
    val c = partitionCol.getOrElse(
      throw new IllegalStateException("table is not partitioned"))
    val newFiles = writeDataFiles(df.filter(col(c) === value))
    val kept = latestVersion.map(relFilesOf).getOrElse(Seq.empty)
      .filterNot(_.contains(s"$c=$value/"))
    commit(kept ++ newFiles)
  }

  /** L1: MERGE INTO — keyed upsert, source-wins, idempotent. When the
    * table is partitioned only touched partitions are rewritten; all
    * other files carry forward by reference (no data movement).
    * Returns the new version, or the current one when the merge is a
    * no-op (re-applying an already-applied feed commits nothing).
    */
  def merge(updates: DataFrame, keys: Seq[String]): Int = {
    val base = read()
    val delta = Merge.effectiveChanges(base, updates)
    if (delta.isEmpty) return latestVersion.get
    partitionCol match {
      case Some(c) =>
        val touched = delta.select(col(c).cast("string")).distinct()
          .collect().map(_.getString(0)).toSet // bounded: distinct partitions
        val touchedBase = base.filter(col(c).cast("string").isin(touched.toSeq: _*))
        val merged = Merge.upsert(touchedBase, updates
          .filter(col(c).cast("string").isin(touched.toSeq: _*)), keys)
        val newFiles = writeDataFiles(merged)
        val kept = relFilesOf(latestVersion.get)
          .filterNot(f => touched.exists(v => f.contains(s"$c=$v/")))
        commit(kept ++ newFiles)
      case None =>
        val merged = Merge.upsert(base, updates, keys)
        write(merged, "overwrite")
    }
  }

  /** L5: OPTIMIZE — small-file compaction after many appends: rewrite
    * the latest version through `targetFiles` shuffle partitions
    * (hash-by-partition-column when partitioned, so each partition
    * value lands in few files).
    */
  def compact(targetFiles: Int = 1): Int = {
    val df = read()
    val compacted = partitionCol match {
      case Some(c) => df.repartition(targetFiles, col(c))
      case None => df.repartition(targetFiles)
    }
    write(compacted, "overwrite")
  }

  /** L4: VACUUM — delete data files unreferenced by the `retain` most
    * recent versions, and drop manifests older than those. Returns
    * deleted file paths. Walk cost is O(files).
    */
  def vacuum(retain: Int = 1): Seq[String] = {
    val vs = versions
    val keepVs = vs.takeRight(retain)
    // qualify both sides: manifest paths are scheme-less, listStatus
    // returns fully-qualified (file:/…) paths
    val referenced = keepVs.flatMap(filesOf)
      .map(f => fs.makeQualified(new Path(f)).toString).toSet
    val deleted = scala.collection.mutable.ArrayBuffer[String]()
    def walk(dir: Path): Unit =
      if (fs.exists(dir)) fs.listStatus(dir).foreach { st =>
        if (st.isDirectory) walk(st.getPath)
        else if (st.getPath.getName.endsWith(".parquet") &&
                 !referenced.contains(fs.makeQualified(st.getPath).toString)) {
          fs.delete(st.getPath, false)
          deleted += st.getPath.toString
        }
      }
    walk(dataDir)
    vs.dropRight(retain).foreach(v => fs.delete(manifestPath(v), false))
    deleted.toSeq
  }
}

package graft.lake

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, BinaryType, MapType, StructType}
import java.util.UUID

/** Versioned parquet table with a plain-text manifest log — a minimal
  * Delta/Iceberg-style transaction layer (no such jars in the offline
  * build; semantics per SURVEY.md §2.9 L1–L5).
  *
  * Layout:
  * {{{
  *   <root>/data/[<part>=<value>/]<uuid>.parquet   immutable data files
  *   <root>/_graft_log/v<NNNNN>.manifest           one line per data file:
  *     <relPath>[\t<urlenc min>\t<urlenc max>]     (stats when statsCol set)
  * }}}
  *
  * A commit writes the manifest to a temp name then atomically renames it
  * into the log — readers always see a complete version. Writers use
  * OPTIMISTIC CONCURRENCY (the Delta/Iceberg model): each mutation is a
  * file-level delta against the snapshot it read; on losing a version
  * race it rebases onto the winner when the two commits are disjoint
  * (append+append, merges of different partitions, compaction vs an
  * untouched-partition writer) and throws
  * ConcurrentModificationException when they overlap — never a silent
  * lost update. See [[commitDelta]]. Scale: the manifest lists FILES,
  * not rows — commit cost is O(files), never O(data). Partition-aware
  * merge rewrites only touched partitions and carries every other file
  * forward by reference.
  *
  * Data skipping (L7): with `statsCol` set, each commit records that
  * column's per-file min/max (one distributed job over the NEW files
  * only; carried-forward files keep their recorded stats), and
  * [[readRange]] prunes files whose [min,max] misses the queried range
  * before Spark ever lists them — the Delta/Iceberg zone-map pattern
  * that turns a narrow range query on a sorted/clustered 100 TB table
  * into a few file reads.
  */
object ManifestTable {
  /** Per-log-dir commit locks: serialize the exists-check + rename of
    * same-JVM writers (local POSIX rename overwrites, so the pair must
    * be atomic within the process; see [[ManifestTable.tryCommit]]).
    */
  private val locks = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def lockFor(key: String): Object =
    locks.computeIfAbsent(key, _ => new Object)

  /** Ref-lock keys (qualified logDir + "#refs") the current THREAD
    * already holds — makes [[ManifestTable.withRefLock]] reentrant:
    * the JVM monitor reenters on its own, but the refs.lock FILE
    * would self-deadlock (our heartbeat keeps it fresh, so a nested
    * create waits the full acquire budget and throws).
    */
  private val refLocksHeldByThread =
    ThreadLocal.withInitial[java.util.HashSet[String]](() =>
      new java.util.HashSet[String]())

  /** Salt for the bloom's second hash — part of the on-disk format. */
  private[lake] val BloomSalt = "graft_bloom"

  /** Manifest stats key carrying a file's deletion-vector reference
    * (mn = sidecar path relative to the table root, mx = deleted-row
    * count, kind = "D"). Part of the on-disk format. Not a column
    * name, so it can never collide with zone-map/bloom stats.
    */
  private[lake] val DvKey = "#dv"

  /** Stats key for a file's exact row count (min = max = count, kind
    * = "C"), recorded at write time from the parquet footer. Part of
    * the on-disk format; like [[DvKey]], the '#' prefix keeps it out
    * of the column-name space. Together with the DV mark counts it
    * makes COUNT(*) a metadata-only query ([[ManifestTable
    * .metadataRowCount]]).
    */
  private[lake] val CountKey = "#n"

  /** Stats key for a file's ROW-ID BASE (min = max = base, kind =
    * "R"): the Delta row-tracking design. A row's stable id is
    * `base + its parquet row index`; bases are allotted at commit
    * time — `max(version << 40, 1 + the live high watermark)` plus the
    * cumulative row count of the files committed before it — so ids
    * never collide across commits, restores, or clone-then-append.
    * Files REWRITTEN by ops that must preserve identity (update
    * copies, compaction, purge) instead carry ids physically in
    * [[RidPhysCol]]; reads resolve `coalesce(physical, base + index)`.
    * Part of the on-disk format; '#'-prefixed like [[DvKey]].
    */
  private[lake] val RidKey = "#rid"

  /** Physical column name for materialized row ids in rewritten files.
    * Hidden from every read surface ([[readFiles]] drops it unless the
    * caller asks); surfaces logically as [[RowIdCol]].
    */
  private[lake] val RidPhysCol = "_graft_rid"

  /** Logical row-id column [[readWithRowId]] exposes. */
  val RowIdCol = "_row_id"

  /** Declared-schema metadata key holding a column's DEFAULT, stored
    * as an evaluated literal's SQL (Delta's materialize-at-ALTER
    * semantics). Part of the on-disk `declared_columns` format.
    */
  private[lake] val DefaultKey = "default"

  /** Spark's existence-default field-metadata key: the parquet readers
    * fill a column missing FROM A FILE with this literal (public Spark
    * behavior since 3.4; files holding the column keep their values,
    * explicit NULLs included).
    */
  private[lake] val ExistsDefaultKey = "EXISTS_DEFAULT"

  private[lake] def defaultOf(
      f: org.apache.spark.sql.types.StructField): Option[String] =
    if (f.metadata.contains(DefaultKey))
      Some(f.metadata.getString(DefaultKey))
    else None

  /** In-commit-timestamp header line prefix. Every manifest/delta file
    * published since this format revision opens with `#ict\t<epochMs>`
    * — the commit's wall-clock stamped INSIDE the log entry (Delta's
    * in-commit-timestamp design), so `TIMESTAMP AS OF`, CDF timestamp
    * anchors and `history()` survive a directory copy/rsync/migration
    * that perturbs file mtimes. Stamps are made strictly monotonic at
    * commit time (`max(now, prev + 1)`); legacy files without the
    * header fall back to publication mtime, exactly the old behavior.
    * Lines starting with '#' can never be entries: data files are
    * engine-named (uuid/part-*), so no rel path starts with '#'.
    */
  private[lake] val IctPrefix = "#ict\t"

  /** Cross-process ref-lock staleness horizon: a `refs.lock` whose
    * mtime is older than this is presumed abandoned (crashed holder)
    * and may be broken by a waiter. Live holders heartbeat the file
    * every [[RefLockStaleMs]]/3, so only a genuinely dead process ever
    * ages past it.
    */
  val RefLockStaleMs: Long = 15L * 60 * 1000

  /** How long a ref mutation waits for the cross-process lock before
    * failing loudly (a vacuum can legitimately hold it for minutes).
    */
  val RefLockAcquireMs: Long = 20L * 60 * 1000

  /** Default vacuum retention horizon: unreferenced files younger than
    * this may belong to an in-flight commit (staged before the manifest
    * rename) and are left alone. One hour covers any realistic commit
    * staging window; tests pass `minAgeMs = 0`.
    */
  val DefaultVacuumMinAgeMs: Long = 60L * 60 * 1000

  /** Above this many keys, [[ManifestTable.deleteKeys]] switches from a
    * literal IN predicate to a broadcast semi-join.
    */
  private[lake] val InLiteralMaxKeys = 1000

  /** Full-snapshot checkpoint cadence for the commit log: versions at
    * this spacing (and v0) write the complete file list; everything
    * between writes O(changed-files) delta entries. Bounds the delta
    * chain a reader folds to resolve any version.
    */
  private[lake] val CheckpointEvery = 10

  /** Hadoop output-committer options for ENGINE-INTERNAL parquet
    * writes (the staged data-file write, DV/CDC sidecars): algorithm
    * v2 moves task output straight to its destination (the default
    * v1 re-renames everything again at job commit — pure churn for
    * directories only this engine reads), and the _SUCCESS marker is
    * skipped (visibility comes from the MANIFEST commit, never from
    * directory state; sidecar dirs are uuid-fresh and referenced only
    * after their commit, and a crash's debris is exactly the orphan
    * class vacuum already sweeps).
    */
  private[lake] val InternalWriteOptions: Map[String, String] = Map(
    "mapreduce.fileoutputcommitter.algorithm.version" -> "2",
    "mapreduce.fileoutputcommitter.marksuccessfuljobs" -> "false")

  /** Read-back schema per IMMUTABLE data file (files are uuid-named
    * and never modified in place, so path → schema is a pure
    * function): seeded at write time from one driver-side footer read
    * of the freshly staged files, consulted by [[readFiles]] so that
    * reads of engine-written unpartitioned file sets skip the
    * mergeSchema inference pass — a whole Spark job per read at bench
    * scale, a footer sweep of every referenced file at any scale.
    * Bounded; eviction just means paying the inference again.
    */
  private val fileSchemaMemo = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.sql.types.StructType]()

  private[lake] def rememberFileSchema(path: String,
      schema: org.apache.spark.sql.types.StructType): Unit = {
    if (fileSchemaMemo.size > 4096) fileSchemaMemo.clear()
    fileSchemaMemo.put(path, schema): Unit
  }

  private[lake] def recalledFileSchema(
      path: String): Option[org.apache.spark.sql.types.StructType] =
    Option(fileSchemaMemo.get(path))

  /** Reconstruct a fully-configured instance from a root path alone,
    * using the table_config sidecar the first commit persisted — how
    * the SQL procedure surface addresses tables by path. Falls back to
    * an unconfigured instance for pre-sidecar tables (reads still
    * work; partition-scoped merge degrades to a guarded full rewrite).
    */
  def forRoot(spark: SparkSession, root: String): ManifestTable = {
    val logDir = new Path(root, "_graft_log")
    val cfgPath = new Path(logDir, "table_config")
    val fs = logDir.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(cfgPath)) return new ManifestTable(spark, root)
    val in = fs.open(cfgPath)
    val cfg =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(_.contains('=')).map { l =>
          val i = l.indexOf('=')
          l.substring(0, i) -> l.substring(i + 1)
        }.toMap
      finally in.close()
    def list(k: String): Seq[String] = cfg.getOrElse(k, "").split(',')
      .filter(_.nonEmpty).map(java.net.URLDecoder.decode(_, "UTF-8")).toSeq
    new ManifestTable(spark, root,
      statsCols = list("stats_cols"),
      bloomCol = cfg.get("bloom_col").filter(_.nonEmpty)
        .map(java.net.URLDecoder.decode(_, "UTF-8")),
      bloomBits = cfg.get("bloom_bits").map(_.toInt).getOrElse(1 << 16),
      bloomHashes = cfg.get("bloom_hashes").map(_.toInt).getOrElse(6),
      partitionCols = list("partition_cols"),
      partitionSpec = list("partition_spec"))
  }

  /** [[forRoot]] with a caller-supplied identity partition tuple.
    * `None` = no opinion (the sink without `partitionBy`) — the config
    * sidecar rules. `Some(cols)` = an EXPLICIT tuple (possibly empty):
    * it configures a FRESH table's layout, and against an existing
    * table it must match the declared tuple — a conflict refuses
    * rather than silently writing a second hive layout into the same
    * data dir (which leaves the table unreadable under partition
    * discovery). One create-or-validate contract shared by the
    * `CALL graft.write` procedure and the streaming sink; validation
    * is a pure config-sidecar read — no Spark job.
    */
  def forRootWithPartitions(spark: SparkSession, root: String,
      asked: Option[Seq[String]]): ManifestTable = {
    val existing = forRoot(spark, root)
    asked match {
      case None => existing
      case Some(cols) if existing.latestVersion.isEmpty =>
        if (cols.isEmpty) existing
        else new ManifestTable(spark, root, partitionCols = cols)
      case Some(cols) =>
        val (idCols, specs) = existing.declaredPartitioning
        val current = idCols ++ specs.map(PartitionTransform.parse(_).name)
        require(current == cols,
          s"table $root partitions on (${current.mkString(", ")}); " +
            s"cannot write with (${cols.mkString(", ")})")
        existing
    }
  }

  /** Deletion-vector sidecar schema / scan-side row-id column names. */
  private[lake] val DvFileCol = "_graft_dv_file"
  private[lake] val DvPosCol = "_graft_dv_pos"

  /** Static schema of every DV sidecar (engine-written, fixed): reads
    * pass it explicitly so they skip the per-read parquet footer
    * schema-inference pass — one driver-side footer open per sidecar
    * reference at bench scale, a listing+footer sweep at any scale.
    */
  private[lake] val DvSidecarSchema: StructType = {
    import org.apache.spark.sql.types.{LongType, StringType, StructField}
    StructType(Seq(StructField(DvFileCol, StringType),
      StructField(DvPosCol, LongType)))
  }

  /** Change-data-feed metadata column / sidecar constants (T15). */
  private[graft] val ChangeTypeCol = "_change_type"
  private[lake] val CdcTagKey = "cdc"
  /** Tag value for a commit that changed NO rows (compaction,
    * clustering, purge, layout rewrite): the change feed emits nothing
    * for it, keylessly.
    */
  private[lake] val CdcNoChanges = "none"

  /** Tag value for a whole-file replacement commit (overwrite,
    * restore, legacy partition-rewrite merge): the change feed derives
    * the commit's changes keylessly FROM THE FILE DELTA — removed
    * files' live rows as deletes, added files' rows as inserts (the
    * Delta INSERT-OVERWRITE CDF representation). Exact in effect
    * (applying it reproduces the post state) though not row-minimal
    * for rewrites that carry rows verbatim; costs O(changed files),
    * no sidecar written.
    */
  private[lake] val CdcFileDiff = "filediff"

  /** A file's LAYOUT SIGNATURE: the ordered hive partition-column
    * names its relative path carries (outermost first). After a lazy
    * [[ManifestTable.setPartitionSpec]] the signature identifies which
    * partition spec a file was written under — hive dir values escape
    * '=' ([[org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    * .escapePathName]]), so the first '=' always ends the column name,
    * and uuid-minted data filenames never contain one.
    */
  private[lake] def layoutColsOf(rel: String): Seq[String] =
    rel.split("/").dropRight(1).toSeq
      .filter(_.contains('=')).map(_.takeWhile(_ != '='))

  /** The salt's own xxhash64 — the seed of every value's second bloom
    * hash. Constant per process; computed once.
    */
  private[lake] lazy val bloomSaltSeed: Long = {
    import org.apache.spark.sql.catalyst.expressions.XxHash64Function
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    XxHash64Function.hash(UTF8String.fromString(BloomSalt), StringType, 42L)
  }

  /** Rebuild a Hadoop Configuration from its serialized entries —
    * executor-side FS access for distributed vacuum (Configuration is
    * a Writable, not Serializable, so tasks get a plain Map).
    */
  private[lake] def confFromMap(entries: Map[String, String])
      : org.apache.hadoop.conf.Configuration = {
    val c = new org.apache.hadoop.conf.Configuration(false)
    entries.foreach { case (k, v) => c.set(k, v) }
    c
  }

  /** Mergeable bitset aggregate for write-time bloom collection: OR
    * bit positions into the packed little-endian m/8-byte array
    * engine-side and emit base64 (the ':'-free alphabet keeps the
    * manifest framing intact; ~8 KB at the default m=65536). NULL
    * positions (files with no bloom-column values) leave an all-zero
    * bitset — identical to the previous empty-set encoding.
    */
  private[lake] class BloomBitsAgg(bits: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        java.lang.Integer, Array[Byte], String] {
    override def zero: Array[Byte] = new Array[Byte]((bits + 7) / 8)
    override def reduce(b: Array[Byte], p: java.lang.Integer): Array[Byte] = {
      if (p != null) {
        val i = p.intValue
        b(i >> 3) = (b(i >> 3) | (1 << (i & 7))).toByte
      }
      b
    }
    override def merge(x: Array[Byte], y: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < x.length) { x(i) = (x(i) | y(i)).toByte; i += 1 }
      x
    }
    override def finish(b: Array[Byte]): String =
      java.util.Base64.getEncoder.encodeToString(b)
    override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Byte]] =
      org.apache.spark.sql.Encoders.BINARY
    override def outputEncoder: org.apache.spark.sql.Encoder[String] =
      org.apache.spark.sql.Encoders.STRING
  }
}

class ManifestTable(spark: SparkSession, root: String,
    partitionCol: Option[String] = None,
    statsCol: Option[String] = None,
    statsCols: Seq[String] = Nil,
    bloomCol: Option[String] = None,
    bloomBits: Int = 1 << 16,
    bloomHashes: Int = 6,
    partitionCols: Seq[String] = Nil,
    partitionSpec: Seq[String] = Nil) {

  /** Hidden-partitioning transforms (`days(ts)`, `bucket(16, id)`,
    * `truncate(4, c)` — [[PartitionTransform]]): each contributes a
    * DERIVED hive column computed from its source column at write
    * time, dropped from every scan, and recomputed for pruning — the
    * Iceberg hidden-partitioning contract.
    */
  private val transforms: Seq[PartitionTransform] =
    partitionSpec.map(PartitionTransform.parse)

  /** All hive partition columns, outermost first: the legacy single
    * `partitionCol` plus any additional `partitionCols` (identity),
    * then the transform-derived hidden columns — real tables
    * partition by (date, region)/(date, tenant), and merge scoping,
    * partition overwrite, and compaction must treat the partition as
    * the full tuple.
    */
  private val identityPartCols: Seq[String] =
    (partitionCol.toSeq ++ partitionCols).distinct
  private val partCols: Seq[String] =
    identityPartCols ++ transforms.map(_.name)

  /** Declared layout, for catalog surfaces that report partitioning:
    * (identity partition columns, transform specs like `bucket(8,c)`).
    */
  def declaredPartitioning: (Seq[String], Seq[String]) =
    (identityPartCols, transforms.map(_.spec))

  /** Add any missing derived partition columns (no-op for identity
    * tables and for frames already carrying them — derivation is
    * deterministic, so recomputing can never disagree with dirs).
    */
  private def withDerived(df: DataFrame): DataFrame =
    transforms.foldLeft(df) { (d, t) =>
      if (d.columns.contains(t.name)) d
      else d.withColumn(t.name, t.derive(col(t.src), d.schema(t.src).dataType))
    }

  /** Partition-tuple value expression over a frame that carries SOURCE
    * columns (derived columns may be absent — merge feeds raw user
    * frames here).
    */
  private def partValueExpr(df: DataFrame, c: String): Column =
    transforms.find(_.name == c) match {
      case Some(t) if !df.columns.contains(c) =>
        t.derive(col(t.src), df.schema(t.src).dataType)
      case _ => col(c)
    }

  /** [[partValueExpr]] generalized to ANY layout signature column —
    * including hidden columns of a PREVIOUS partition spec (parsed
    * back from their names) and identity columns renamed after they
    * left the spec (mapped physical → logical). What per-signature
    * merge scoping evaluates after a lazy [[setPartitionSpec]].
    */
  private def partValueExprFor(df: DataFrame, c: String): Column =
    transforms.find(_.name == c).orElse(PartitionTransform.fromName(c)) match {
      case Some(t) if !df.columns.contains(c) =>
        val src = columnMapping.getOrElse(t.src, t.src)
        t.derive(col(src), df.schema(src).dataType)
      case _ =>
        val name = if (df.columns.contains(c)) c
          else columnMapping.getOrElse(c, c)
        col(name)
    }

  /** All zone-map columns: the legacy single `statsCol` plus any
    * additional `statsCols` (multi-column zone maps are what make
    * z-order clustering worth anything — skipping must work on every
    * clustered dimension, not just one).
    */
  private val allStatsCols: Seq[String] =
    (statsCol.toSeq ++ statsCols).distinct

  private val logDir = new Path(root, "_graft_log")
  private val dataDir = new Path(root, "data")
  private val dvDir = new Path(root, "_graft_dv")
  private val cdcDir = new Path(root, "_graft_cdc")
  private val DvKey = ManifestTable.DvKey
  private val DvFileCol = ManifestTable.DvFileCol
  private val DvPosCol = ManifestTable.DvPosCol
  private def fs: FileSystem =
    logDir.getFileSystem(spark.sessionState.newHadoopConf())

  // Every read here hands Spark an EXPLICIT leaf-file list resolved
  // from the manifest — there are no directories to discover — yet at
  // the default parallelPartitionDiscovery threshold (32) any read of
  // >32 files launches a whole Spark job just to re-stat those known
  // paths (measured: one such job per read across every DML
  // lifecycle). Up to this bound the driver's listing pool handles it
  // in microseconds per path; genuinely huge file sets (>8192) keep
  // the distributed listing, which is what the threshold is for.
  locally {
    val k = "spark.sql.sources.parallelPartitionDiscovery.threshold"
    if (spark.conf.get(k, "32") == "32") spark.conf.set(k, "8192")
  }

  private def manifestPath(v: Int) = new Path(logDir, f"v$v%05d.manifest")

  /** Delta commit file: O(changed files) lines (`-<TAB>rel` removals,
    * `+<TAB>entry` adds/re-points) against the previous version. Full
    * `v<N>.manifest` snapshots are checkpoints — written for v0, every
    * [[ManifestTable.CheckpointEvery]]-th version, and by ops whose
    * intent is a whole new file set (overwrite/restore/clone). Without
    * deltas, a million-file table would rewrite an O(files) manifest
    * for every tiny append or DV commit.
    */
  private def deltaPath(v: Int) = new Path(logDir, f"v$v%05d.delta")

  def versions: Seq[Int] = {
    if (!fs.exists(logDir)) return Seq.empty
    fs.listStatus(logDir).toSeq
      .map(_.getPath.getName)
      .filter(n => n.startsWith("v") &&
        (n.endsWith(".manifest") || n.endsWith(".delta")))
      .map(n => n.stripPrefix("v").stripSuffix(".manifest")
        .stripSuffix(".delta").toInt)
      .distinct
      .sorted
  }

  def latestVersion: Option[Int] = versions.lastOption

  /** Per-file min/max of one stats column. `kind` records the ordering
    * the stats were computed under ("N" numeric, "S" lexicographic) so
    * pruning compares in the SAME domain: Spark's min/max on a STRING
    * column is lexicographic, and a file holding {"9","10"} records
    * min="10"/max="9" — parsing those as numbers at prune time would
    * wrongly skip the file for range ["1","2"] even though "10"
    * satisfies the lexicographic residual filter (silent row loss).
    */
  private case class ColStats(mn: String, mx: String, kind: String)

  /** One manifest line: relative path + per-column zone-map stats.
    * Format: `rel[\tcol=min:max:kind]*` with col/min/max URL-encoded
    * (so '=', ':' and '\t' inside values cannot break the framing).
    * Legacy single-column lines (`rel\tmin\tmax[\tkind]`) parse onto
    * the table's configured primary statsCol.
    */
  private case class Entry(rel: String, stats: Map[String, ColStats]) {
    def line: String =
      if (stats.isEmpty) rel
      else rel + "\t" + stats.toSeq.sortBy(_._1).map { case (c, s) =>
        s"${Entry.enc(c)}=${Entry.enc(s.mn)}:${Entry.enc(s.mx)}:${s.kind}"
      }.mkString("\t")
  }
  private object Entry {
    def enc(s: String): String =
      java.net.URLEncoder.encode(s, "UTF-8")
    def dec(s: String): String =
      java.net.URLDecoder.decode(s, "UTF-8")
    def parse(line: String, primaryCol: Option[String]): Entry =
      line.split('\t') match {
        case Array(rel) => Entry(rel, Map.empty)
        case fields if fields(1).contains('=') =>
          Entry(fields(0), fields.tail.map { f =>
            val Array(c, rest) = f.split('=')
            rest.split(':') match {
              case Array(mn, mx, k) => dec(c) -> ColStats(dec(mn), dec(mx), k)
              case _ => throw new IllegalStateException(s"bad stats field $f")
            }
          }.toMap)
        case Array(rel, mn, mx, k) =>
          Entry(rel, primaryCol.map(_ -> ColStats(dec(mn), dec(mx), k)).toMap)
        case Array(rel, mn, mx) =>
          Entry(rel, primaryCol.map(_ -> ColStats(dec(mn), dec(mx), "N")).toMap)
        case _ => Entry(line, Map.empty)
      }
  }

  /** Ordering marker for statsCol's type: numeric types compare as
    * numbers; strings compare lexicographically (dates/timestamps render
    * as ISO strings, whose lexicographic order IS chronological).
    */
  private def statKindOf(dt: org.apache.spark.sql.types.DataType): String =
    dt match {
      case _: org.apache.spark.sql.types.NumericType => "N"
      case _ => "S"
    }

  private def readLogLines(p: Path): Seq[String] = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.nonEmpty).toList
    finally in.close()
  }

  /** Resolve a version's full entry list: a checkpoint manifest when
    * one exists, otherwise the nearest checkpoint at-or-below folded
    * forward through the delta chain. Chain length is bounded by the
    * checkpoint cadence, so resolution is O(checkpoint + cadence·delta)
    * — never O(versions).
    */
  private def entriesOf(version: Int): Seq[Entry] = {
    // '#'-prefixed lines are commit-level metadata (the `#ict` header),
    // never entries — data files are engine-named, no rel starts '#'
    def entryLines(p: Path): Seq[String] =
      readLogLines(p).filterNot(_.startsWith("#"))
    if (fs.exists(manifestPath(version)))
      return entryLines(manifestPath(version)).map(Entry.parse(_, statsCol))
    var s = version - 1
    while (s >= 0 && !fs.exists(manifestPath(s))) s -= 1
    if (s < 0) throw new IllegalStateException(
      s"no checkpoint manifest at or below v$version under $logDir")
    // fold preserving order: removals drop, adds append (a DV re-point
    // is remove+add of the same rel, matching the filterNot ++ added
    // shape full commits use)
    val acc = scala.collection.mutable.LinkedHashMap.from(
      entryLines(manifestPath(s)).map(Entry.parse(_, statsCol))
        .map(e => e.rel -> e))
    for (v <- s + 1 to version) {
      entryLines(deltaPath(v)).foreach { line =>
        if (line.startsWith("-\t")) acc.remove(line.substring(2)): Unit
        else if (line.startsWith("+\t")) {
          val e = Entry.parse(line.substring(2), statsCol)
          acc.remove(e.rel) // re-point: replace, appended at the end
          acc.put(e.rel, e): Unit
        } else throw new IllegalStateException(
          s"bad delta line in ${deltaPath(v)}: $line")
      }
    }
    acc.values.toList
  }

  /** Data files (absolute) referenced by a version. */
  def filesOf(version: Int): Seq[String] =
    entriesOf(version).map(e => new Path(root, e.rel).toString)

  /** Time-travel read: latest when version is None. Deletion vectors
    * of the version's entries are applied (merge-on-read).
    */
  def read(version: Option[Int] = None): DataFrame = {
    val v = version.orElse(latestVersion)
      .getOrElse(throw new IllegalStateException(s"no versions at $root"))
    val ids = identityColumns
    if (ids.isEmpty) withDeclared(readEntries(entriesOf(v)))
    else
      // identity columns derive from the stable row id — ride the
      // rid-resolving read (the identity-free path pays nothing)
      withIdentityCols(withDeclared(readEntriesRid(entriesOf(v))), ids)
        .drop(ManifestTable.RowIdCol)
  }

  /** T16 row tracking: [[read]] plus the stable [[ManifestTable
    * .RowIdCol]] — the Delta row-id surface. Ids are allotted at
    * commit (entry `#rid` base + parquet row index) and materialized
    * physically when a rewrite moves rows, so they survive DV
    * re-points, update copies, compaction, purge, restore and clone.
    * NULL for rows whose file predates row tracking (rewrite via
    * OPTIMIZE/REORG to adopt ids).
    */
  def readWithRowId(version: Option[Int] = None): DataFrame = {
    val v = version.orElse(latestVersion)
      .getOrElse(throw new IllegalStateException(s"no versions at $root"))
    withIdentityCols(withDeclared(readEntriesRid(entriesOf(v))),
      identityColumns)
  }

  /** Rewrite-side read: the snapshot with row ids under their PHYSICAL
    * column name, ready to be written back by an identity-preserving
    * rewrite (compact/optimize/purge).
    */
  private def readRidPhys(version: Option[Int]): DataFrame = {
    val v = version.orElse(latestVersion)
      .getOrElse(throw new IllegalStateException(s"no versions at $root"))
    withDeclared(readEntriesRid(entriesOf(v)))
      .withColumnRenamed(ManifestTable.RowIdCol, ManifestTable.RidPhysCol)
  }

  /** Exact row count from manifest metadata alone — `Some(n)` when
    * every live file of the version carries the write-time `#n` count
    * stat; `None` (caller falls back to scanning) when any file
    * predates the stat. DV-deleted rows subtract via the per-file
    * mark counts the DV commit records (exact distinct positions), so
    * the result equals `read(version).count()` exactly. O(manifest)
    * driver work, zero data IO — at 100 TB this answers COUNT(*) in
    * manifest-resolution time instead of a full scan, the same
    * metadata shortcut Delta/Iceberg serve counts from.
    */
  def metadataRowCount(version: Option[Int] = None): Option[Long] = {
    val v = version.orElse(latestVersion)
    if (v.isEmpty) return None
    val entries = entriesOf(v.get)
    val counts = entries.map(_.stats.get(ManifestTable.CountKey))
    if (counts.exists(_.isEmpty)) None
    else try {
      val total = counts.map(_.get.mn.toLong).sum
      val dv = entries.flatMap(_.stats.get(DvKey)).map(_.mx.toLong).sum
      Some(total - dv)
    } catch { case _: NumberFormatException => None }
  }

  /** Exact metadata-only MIN/MAX of a zone-mapped column: the global
    * extremum is the extremum of the per-file zone-map bounds, read
    * from the manifest alone — zero data IO, the stats-read shortcut
    * Delta/Iceberg serve MIN/MAX from. Some((min, max, kind)) ONLY
    * when exactly answerable; None (caller scans normally) whenever
    * any of these holds:
    *  - the column has no zone map, or any live file lacks its stat
    *    (an unstatted file is indistinguishable from an all-null one);
    *  - any live file carries deletion vectors (a DV'd row could BE
    *    the extremum);
    *  - numeric stats that do not parse as finite decimals (NaN/
    *    Infinity floats — their ordering is not the stats ordering);
    *  - the snapshot has no files (SQL MIN of an empty table is NULL,
    *    which a plain empty scan already answers).
    * Values are the recorded stat strings in the column's stat domain
    * (`kind` as in the zone maps: "N" numeric, "S" lexicographic);
    * min/max over files folds with the same comparator pruning uses.
    */
  def metadataMinMax(c: String, version: Option[Int] = None,
      boundOk: String => Boolean = _ => true): Option[(String, String, String)] = {
    val pc = toPhysical(c) // stats keys are recorded physical
    if (!allStatsCols.contains(pc)) return None
    val v = version.orElse(latestVersion)
    if (v.isEmpty) return None
    val entries = entriesOf(v.get)
    if (entries.isEmpty) return None
    if (entries.exists(_.stats.contains(DvKey))) return None
    val stats = entries.map(_.stats.get(pc))
    if (stats.exists(_.isEmpty)) return None
    val ss = stats.map(_.get)
    val kinds = ss.map(_.kind).distinct
    if (kinds.sizeIs != 1 || (kinds.head != "N" && kinds.head != "S"))
      return None
    val kind = kinds.head
    def numeric(s: String): Boolean =
      try { new java.math.BigDecimal(s); true }
      catch { case _: NumberFormatException => false }
    if (kind == "N" && ss.exists(s => !numeric(s.mn) || !numeric(s.mx)))
      return None
    // the cross-file fold below compares with String.compareTo (UTF-16
    // code units) while the per-file stats were ordered by Spark in
    // UTF-8 bytes; the two orders agree only on ASCII — refuse the
    // moment any bound leaves that common domain (dates' ISO strings
    // always pass)
    def ascii(s: String): Boolean = s.forall(_ < 0x80)
    if (kind == "S" && ss.exists(s => !ascii(s.mn) || !ascii(s.mx)))
      return None
    // caller-supplied PER-FILE bound validation (e.g. the catalog's
    // date guard): validating only the folded extremum is too late —
    // a bound that breaks the stat ordering (a 5-digit-year date
    // whose ISO string sorts below '9999-…') corrupts the fold itself
    if (ss.exists(s => !boundOk(s.mn) || !boundOk(s.mx)))
      return None
    val mn = ss.map(_.mn).reduce((a, b) => if (statCmp(a, b, kind) <= 0) a else b)
    val mx = ss.map(_.mx).reduce((a, b) => if (statCmp(a, b, kind) >= 0) a else b)
    Some((mn, mx, kind))
  }

  /** The newest version committed at or before `tsMillis` — the
    * snapshot a `timestampAsOf` pin resolves to ([[readAsOf]] raises
    * when this is None).
    */
  def versionAtOrBefore(tsMillis: Long): Option[Int] =
    versions.filter(commitTimeOf(_) <= tsMillis).lastOption

  /** [[metadataRowCount]] at the [[versionAtOrBefore]] snapshot; None
    * when no such version exists — the caller's scan then raises the
    * real error.
    */
  def metadataRowCountAsOf(tsMillis: Long): Option[Long] =
    versionAtOrBefore(tsMillis).flatMap(v => metadataRowCount(Some(v)))

  /** L22b: bucket-partitioned read that REPORTS its partitioning —
    * the storage-partitioned-join surface. A table declared with a
    * `bucket(n, c)` transform already lays files out by
    * `pmod(hash(c), n)`, which IS Spark's `HashPartitioning(c, n)`
    * partition id; this read exposes one RDD partition per bucket
    * through [[graft.plans.BucketedTableScan]], so joining two tables
    * bucketed the same way on the bucket key plans with NO Exchange on
    * either side (local sort + merge join per bucket) — the
    * Delta/Iceberg bucketed-layout answer to the recurring fact⋈fact
    * shuffle. Row set and schema are identical to [[read]] (hidden
    * columns dropped, renames applied, declared columns null-filled);
    * parallelism is one task per bucket, so pick `n` for the target
    * concurrency at write time.
    *
    * Refuses when the snapshot carries deletion vectors: the DV
    * anti-join would break the per-bucket partition contract — run
    * REORG PURGE first.
    */
  def readBucketed(srcCol: String): DataFrame = {
    val t = transforms.collectFirst {
      case b: PartitionTransform.BucketOf if b.src == srcCol => b
    }.getOrElse(throw new IllegalArgumentException(
      s"readBucketed($srcCol): no bucket(n, $srcCol) transform declared " +
        s"(partitionSpec: ${transforms.map(_.spec).mkString(", ")})"))
    val entries = entriesOf(latestVersion.getOrElse(
      throw new IllegalStateException(s"no versions at $root")))
    require(entries.forall(e => !e.stats.contains(DvKey)),
      s"readBucketed($srcCol): snapshot has deletion vectors; " +
        "REORG PURGE before bucketed-join reads")
    if (entries.isEmpty) return read()

    val marker = s"${t.name}="
    val groups = Array.fill(t.n)(Seq.newBuilder[String])
    entries.foreach { e =>
      val b = e.rel.split('/').collectFirst {
        case seg if seg.startsWith(marker) =>
          Entry.dec(seg.stripPrefix(marker)).toInt
      }.getOrElse(throw new IllegalStateException(
        s"readBucketed: ${e.rel} is not under a ${t.name}= directory — " +
          "it predates the bucket spec (lazy setPartitionSpec); " +
          "compact() to migrate the layout first"))
      groups(b) += new Path(root, e.rel).toString
    }

    // ONE schema-inference pass over the full file set; per-bucket
    // reads pin this schema (no per-bucket footer re-scan), and the
    // visible schema derives from the same frame without a second pass
    val rawDf = readFiles(entries.map(e => new Path(root, e.rel).toString))
    val rawSchema = rawDf.schema
    val derivedAll =
      rawSchema.fieldNames.filter(_.startsWith(PartitionTransform.Prefix))
    val schema = withDeclared(toLogicalRename(
      if (derivedAll.isEmpty) rawDf
      else rawDf.drop(derivedAll.toIndexedSeq: _*))).schema
    val keyType = schema(srcCol).dataType
    val nb = t.n
    val build: (Seq[String], Int) => DataFrame = { (files, b) =>
      val raw = readFiles(files, pinnedSchema = Some(rawSchema))
      // per-row placement integrity: every row must hash into its
      // group's bucket under the SURFACED key type — catches bucket-key
      // type drift across appends (hash(5: int) != hash(5L: long)),
      // where a silently mis-co-partitioned join would drop rows
      val guarded = raw.filter(
        when(pmod(hash(col(srcCol).cast(keyType)), lit(nb)) === lit(b),
          lit(true))
          .otherwise(raise_error(lit(
            s"readBucketed($srcCol): row hashes outside bucket $b — " +
              "bucket-key type drift across appends or corrupt layout; " +
              "rewrite the table with a consistent key type"))))
      val visible = withDeclared(toLogicalRename(
        if (derivedAll.isEmpty) guarded
        else guarded.drop(derivedAll.toIndexedSeq: _*)))
      // the pinned rawSchema read null-fills columns a bucket's older
      // files lack and widens narrower file types, and withDeclared
      // adds declared-only columns — so every schema field is present
      // at its final type; this select only fixes the OUTPUT ORDER to
      // match the scan's declared attributes
      visible.select(
        schema.fieldNames.map(graft.functions.Cols.quoted).toIndexedSeq: _*)
    }

    // rename refuses on transform sources, so the physical source name
    // IS the surfaced column name
    val attrs = schema.fields.map(f =>
      org.apache.spark.sql.catalyst.expressions.AttributeReference(
        f.name, f.dataType, nullable = true)()).toIndexedSeq
    // honest size stats for join selection: one listStatus per bucket
    // DIRECTORY (O(buckets) driver RPCs — the same cost class as the
    // manifest listing), never one getFileStatus per file, which on an
    // object store would be thousands of serial HEAD requests before
    // the query even plans. A file missing from its directory listing
    // (corrupt layout) falls back to a direct stat so the read fails
    // with the real error rather than a silent size of zero.
    val bytes = entries.groupBy(e => new Path(root, e.rel).getParent)
      .iterator.map { case (dir, es) =>
        val lens = fs.listStatus(dir).iterator
          .map(st => st.getPath.getName -> st.getLen).toMap
        es.iterator.map { e =>
          val name = new Path(e.rel).getName
          BigInt(lens.getOrElse(name,
            fs.getFileStatus(new Path(root, e.rel)).getLen))
        }.sum
      }.sum
    graft.plans.BucketedScanStrategy.ensureRegistered(spark)
    org.apache.spark.sql.graft.GraftSqlBridge.ofRows(spark,
      graft.plans.BucketedTableScan(attrs, srcCol, t.n,
        groups.map(_.result()).toIndexedSeq, bytes, build))
  }

  /** Entry-level read: scan the entries' files and anti-join out any
    * deletion-vector positions they reference. The (file-basename,
    * row_index) pair is a permanent row id — data files are immutable
    * and uuid-named, so a position recorded by any committed DV can
    * never misapply to a different row; positions only ever GROW per
    * file (deletes add, rewrites mint new basenames), so unioning every
    * referenced sidecar is always exact. DV-free tables take this path
    * with zero overhead (no metadata columns, no join).
    */
  private def readEntries(entries: Seq[Entry]): DataFrame =
    readEntriesOpt(entries, withRowId = false)

  /** [[readEntries]] carrying the stable row id as
    * [[ManifestTable.RowIdCol]]: `coalesce(the file's materialized
    * [[ManifestTable.RidPhysCol]], entry base + parquet row index)`.
    * NULL for rows whose file predates row tracking (no `#rid` stamp,
    * no physical column) — callers that need total identity must
    * check. The base lookup is one broadcast of (basename, base),
    * O(files) rows like the manifest resolution that produced it.
    */
  private def readEntriesRid(entries: Seq[Entry]): DataFrame =
    readEntriesOpt(entries, withRowId = true)

  private def readEntriesOpt(entries: Seq[Entry],
      withRowId: Boolean): DataFrame = {
    if (entries.isEmpty) return spark.emptyDataFrame
    val files = entries.map(e => new Path(root, e.rel).toString)
    val raw = if (!withRowId) {
      dvOf(entries) match {
        case None => readFiles(files)
        case Some(dv) =>
          readFiles(files, withPos = true)
            .join(dv, Seq(DvFileCol, DvPosCol), "left_anti")
            .drop(DvFileCol, DvPosCol)
      }
    } else {
      import spark.implicits._
      val withPos = readFiles(files, withPos = true, keepRid = true)
      val bases = entries.map(e => (new Path(e.rel).getName,
        e.stats.get(ManifestTable.RidKey).map(_.mn.toLong)))
        .toDF(DvFileCol, "_graft_rid_base")
      val phys =
        if (withPos.columns.contains(ManifestTable.RidPhysCol))
          col(ManifestTable.RidPhysCol)
        else lit(null).cast("long")
      val withId = withPos
        .join(broadcast(bases), Seq(DvFileCol), "left")
        .withColumn(ManifestTable.RowIdCol,
          coalesce(phys, col("_graft_rid_base") + col(DvPosCol)))
        .drop("_graft_rid_base", ManifestTable.RidPhysCol)
      dvOf(entries)
        .fold(withId)(dv =>
          withId.join(dv, Seq(DvFileCol, DvPosCol), "left_anti"))
        .drop(DvFileCol, DvPosCol)
    }
    // hidden partitioning: derived layout columns never surface in a
    // scan (writers re-derive them from their sources); renamed
    // columns surface under their LOGICAL name. Drop by the derived
    // NAME PREFIX, not the current partitionSpec's transform list —
    // after evolvePartitionSpec, time-travel reads of pre-evolution
    // versions still carry the OLD spec's hidden hive columns, which
    // must stay hidden too
    val noDerived = {
      val derived = raw.columns.filter(_.startsWith(PartitionTransform.Prefix))
      if (derived.isEmpty) raw else raw.drop(derived.toIndexedSeq: _*)
    }
    toLogicalRename(noDerived)
  }

  /** Union of the deletion-vector sidecars referenced by `entries` —
    * None when no entry carries a DV (the common, zero-cost case).
    */
  private def dvOf(entries: Seq[Entry]): Option[DataFrame] = {
    val rels = entries.flatMap(_.stats.get(DvKey).map(_.mn)).distinct
    if (rels.isEmpty) None
    else Some(spark.read.schema(ManifestTable.DvSidecarSchema)
      .parquet(rels.map(r => new Path(root, r).toString): _*)
      .select(col(DvFileCol), col(DvPosCol)))
  }

  /** Read a manifest file set. basePath restores partition columns from
    * directory structure; mergeSchema unions file schemas so a column
    * added by a later append surfaces (null-filled for pre-evolution
    * files) instead of silently depending on which file seeds the
    * schema. Files are grouped by their `<root>/data/` prefix because a
    * SHALLOW CLONE references the source's files by absolute path — a
    * clone that later appends its own files spans two roots, and Spark
    * requires every path to live under its basePath; each group reads
    * under its own basePath and the groups union by name.
    */
  private def readFiles(files: Seq[String], withPos: Boolean = false,
      pinnedSchema: Option[org.apache.spark.sql.types.StructType] = None,
      keepRid: Boolean = false): DataFrame = {
    // group by (basePath, LAYOUT SIGNATURE): after a lazy
    // setPartitionSpec a snapshot mixes files laid out under different
    // partition specs, and Spark's partition discovery refuses a file
    // set whose hive directory schemas conflict — so each layout reads
    // under its own discovery pass and the groups union by name (a
    // partition column one group recovers from dirs lives in the other
    // group's files as ordinary data, so no column is ever null-filled
    // wrongly)
    val groups = files.groupBy { f =>
      val i = f.lastIndexOf("/data/")
      val bp = if (i >= 0) f.substring(0, i + "/data".length) else dataDir.toString
      val rel =
        if (f.startsWith(bp)) f.substring(math.min(bp.length + 1, f.length))
        else new Path(f).getName
      (bp, ManifestTable.layoutColsOf(rel).mkString("/"))
    }
    // ONE declared/ mapping sidecar read per readFiles call, hoisted
    // out of the per-group (and the bucketed path's per-bucket) loop
    val defaults = declaredDefaults
    groups.toSeq.sortBy(_._1).map { case ((bp, sig), paths) =>
      // a pinned schema (from one inference pass over the full file
      // set) skips the per-call mergeSchema footer scan — the
      // bucketed read path calls this once PER BUCKET. The same skip
      // applies when every file of an UNPARTITIONED group carries the
      // SAME remembered write-time schema (the overwhelmingly common
      // engine-written set): no hive dirs means the file schema IS
      // the read schema, so inference could only re-derive it.
      // Partitioned groups and sets mixing schemas (append evolution)
      // keep the real mergeSchema pass — dir-type inference and
      // cross-file type widening stay Spark's.
      val memos = paths.map(ManifestTable.recalledFileSchema)
      val allSameMemo = !memos.contains(None) && memos.distinct.size == 1
      val remembered: Option[org.apache.spark.sql.types.StructType] =
        if (sig.nonEmpty) None
        else if (allSameMemo) memos.head
        else None
      val df = pinnedSchema.orElse(remembered) match {
        case Some(s) => spark.read.option("basePath", bp)
          .schema(withExistenceDefaults(s, defaults).getOrElse(s))
          .parquet(paths: _*)
        case None =>
          // partitioned groups can't take `.schema` (the hive dir
          // columns' types are Spark's to infer), but when every
          // file's remembered write-time schema agrees the mergeSchema
          // footer sweep — one distributed job over EVERY referenced
          // file per read — is provably a no-op: one footer suffices.
          val inferred = spark.read.option("basePath", bp)
            .option("mergeSchema", (!allSameMemo).toString)
            .parquet(paths: _*)
          withExistenceDefaults(inferred.schema, defaults) match {
            case None => inferred
            // L40: re-read under the default-carrying schema so files
            // PREDATING a defaulted column fill it with the default
            // (only when a default is declared AND surfaced — the
            // common no-default read never pays the second open)
            case Some(amended) => spark.read.option("basePath", bp)
              .schema(amended).parquet(paths: _*)
          }
      }
      // (basename, row_index) is the engine's permanent row id for
      // deletion vectors: basenames are uuid-minted so they never
      // collide across partitions, clones, or rewrites
      // materialized row ids ([[ManifestTable.RidPhysCol]], written by
      // update copies / compaction) are engine-internal: hidden from
      // every read unless the caller resolves row identity itself
      val noRid =
        if (keepRid || !df.columns.contains(ManifestTable.RidPhysCol)) df
        else df.drop(ManifestTable.RidPhysCol)
      if (withPos) noRid
        .withColumn(DvFileCol,
          element_at(split(col("_metadata.file_path"), "/"), -1))
        .withColumn(DvPosCol, col("_metadata.row_index"))
      else noRid
    }.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Commit wall-clock time of a version (epoch millis) — the `#ict`
    * in-commit stamp written into the manifest/delta header at publish
    * time (strictly monotonic over versions; survives directory
    * copies/migrations that perturb mtimes). Legacy pre-ICT log files
    * fall back to the publication mtime, the old behavior.
    */
  def commitTimeOf(version: Int): Long = {
    val cands = Seq(deltaPath(version), manifestPath(version)).filter(fs.exists)
    if (cands.isEmpty) throw new IllegalStateException(
      s"version $version has no manifest or delta under $logDir")
    // in-commit stamp preferred (survives copies/rsync that perturb
    // mtimes); min across both file forms so a vacuum-time checkpoint
    // materialized BESIDE a delta never shifts the original commit
    // time. Legacy pre-ICT files fall back to publication mtime.
    val stamped = cands.flatMap(headerIct)
    if (stamped.nonEmpty) stamped.min
    else cands.map(fs.getFileStatus(_).getModificationTime).min
  }

  /** The `#ict` header stamp of one log file, if present (one bounded
    * first-line read — never the whole manifest).
    */
  private def headerIct(p: Path): Option[Long] = {
    val in = fs.open(p)
    try {
      val r = new java.io.BufferedReader(
        new java.io.InputStreamReader(in, "UTF-8"))
      Option(r.readLine())
        .filter(_.startsWith(ManifestTable.IctPrefix))
        .flatMap(_.substring(ManifestTable.IctPrefix.length).toLongOption)
    } finally in.close()
  }

  /** Time-travel read by timestamp (the common Delta/Iceberg
    * `timestampAsOf` interface): the newest version committed at or
    * before `tsMillis`. Throws if the table's first commit is later.
    */
  def readAsOf(tsMillis: Long): DataFrame = {
    val v = versionAtOrBefore(tsMillis)
      .getOrElse(throw new IllegalArgumentException(
        s"no version at or before $tsMillis (first commit: " +
          s"${versions.headOption.map(commitTimeOf).getOrElse("none")})"))
    read(Some(v))
  }

  /** Attempt to publish `entries` as version `v`. Returns false when a
    * concurrent writer already published that version (the caller
    * rebases and retries). Publication stays write-tmp + atomic-rename
    * so readers never see a partial manifest; the exists-check +
    * rename pair is serialized through a JVM-wide per-root lock
    * because a POSIX rename OVERWRITES an existing destination —
    * without the lock two same-process writers could both "win" and
    * one commit would silently vanish. Cross-process local-FS writers
    * retain a tiny exists→rename window (the same caveat Delta's
    * local LogStore documents; HDFS/object-store renames are atomic
    * no-overwrite and close it).
    */
  private def tryCommit(v: Int, entries: Seq[Entry]): Boolean =
    tryPublish(v, entries.map(_.line).mkString("\n") + "\n", asDelta = false)

  /** Table configuration sidecar: the first successful commit persists
    * this instance's partition/stats/bloom declaration in the log dir
    * so [[ManifestTable.forRoot]] (and the SQL procedure surface) can
    * reconstruct a fully-configured instance from the root path alone
    * — the Delta pattern of metadata living IN the log. First writer
    * wins; an explicitly-configured constructor always overrides.
    */
  private val configPath = new Path(logDir, "table_config")
  @volatile private var configChecked = false

  private def persistConfigIfNeeded(): Unit = {
    if (configChecked) return
    configChecked = true
    if (fs.exists(configPath)) return
    writeConfigFile(replaceExisting = false)
  }

  private def writeConfigFile(replaceExisting: Boolean): Unit = {
    val lines = Seq(
      "partition_cols=" + identityPartCols.map(Entry.enc).mkString(","),
      "partition_spec=" + transforms.map(t => Entry.enc(t.spec)).mkString(","),
      "stats_cols=" + allStatsCols.map(Entry.enc).mkString(","),
      "bloom_col=" + bloomCol.map(Entry.enc).getOrElse(""),
      "bloom_bits=" + bloomBits,
      "bloom_hashes=" + bloomHashes)
    val tmp = new Path(logDir, s".tmp-cfg-${UUID.randomUUID()}")
    val out = fs.create(tmp, false)
    try out.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    if (replaceExisting && fs.exists(configPath)) fs.delete(configPath, false)
    if (!fs.rename(tmp, configPath)) fs.delete(tmp, false): Unit
  }

  /** ALTER TABLE … PARTITIONED BY — change the partition layout
    * (identity columns and/or transforms). This REWRITES the current
    * snapshot under the new layout in one conflict-checked commit
    * (concurrent writers of any kind conflict rather than losing
    * rows), then persists the new layout to the config sidecar — so
    * the table is never in a mixed-layout state and every partition-
    * scoped op (tuple merge, partition overwrite, DV scoping) stays
    * exact. O(table) — the honest cost of a layout change here;
    * Iceberg's lazy multi-spec variant trades it for per-file spec
    * tracking. History is preserved: earlier versions time-travel
    * with their old layout (readers key on paths, not config).
    * Returns a NEW instance configured with the evolved layout; the
    * receiving instance keeps its old view and should be discarded.
    */
  def evolvePartitionSpec(newIdentityCols: Seq[String],
      newTransformSpecs: Seq[String] = Nil): ManifestTable = {
    val (v0, current) = validateNewSpec("evolvePartitionSpec",
      newIdentityCols, newTransformSpecs)
    val evolved = new ManifestTable(spark, root, None, statsCol, statsCols,
      bloomCol, bloomBits, bloomHashes, newIdentityCols, newTransformSpecs)
    evolved.stampCdcNone(evolved.rewriteSnapshot(Some(v0), current))
    evolved.writeConfigFile(replaceExisting = true)
    evolved
  }

  /** LAZY partition-spec evolution — the Iceberg headline: change the
    * layout of a LIVE table without touching a byte of data. The new
    * spec is persisted to the config sidecar only; existing files keep
    * their old layout, every commit from here lays out by the new one,
    * and the mixed snapshot stays fully functional because each file's
    * own path IS its spec ([[PartitionTransform.fromName]]):
    *
    *  - scans union the layouts ([[readFiles]] groups by signature);
    *  - [[readPartitionEq]]/[[readPartitionRange]] prune each file by
    *    its OWN spec's transform (old daily files by `days`, new
    *    hourly files by `hours`);
    *  - [[merge]] scopes touched partitions per signature, and its
    *    rewrites land under the new spec — as do [[compact]]/
    *    [[compactSmall]]/[[reorgPurge]] — so the table migrates
    *    progressively, paying O(touched) per op, never O(table);
    *  - path-exact ops that cannot scope a foreign layout
    *    ([[overwritePartitionValues]], [[readBucketed]]) refuse the
    *    mixed state with migration guidance instead of guessing.
    *
    * [[evolvePartitionSpec]] is the eager alternative (one O(table)
    * rewrite, never a mixed state); this is the form that survives a
    * 100 TB table, at the cost of mixed-layout snapshots until
    * compaction or churn migrates the tail. Returns a NEW instance
    * configured with the new layout; the receiver keeps its old view
    * and should be discarded. Time travel is unaffected (readers key
    * on paths, not config).
    */
  def setPartitionSpec(newIdentityCols: Seq[String],
      newTransformSpecs: Seq[String] = Nil): ManifestTable = {
    validateNewSpec("setPartitionSpec", newIdentityCols, newTransformSpecs)
    val evolved = new ManifestTable(spark, root, None, statsCol, statsCols,
      bloomCol, bloomBits, bloomHashes, newIdentityCols, newTransformSpecs)
    evolved.writeConfigFile(replaceExisting = true)
    evolved
  }

  /** Shared validation for a new partition spec: the table must have a
    * version (the spec change is observable), every referenced column
    * must exist, and none may sit behind a rename (hive paths bake
    * physical names). Returns the pinned version and its frame.
    */
  private def validateNewSpec(op: String, newIdentityCols: Seq[String],
      newTransformSpecs: Seq[String]): (Int, DataFrame) = {
    val v0 = latestVersion.getOrElse(
      throw new IllegalStateException(s"$op: no versions at $root"))
    val parsed = newTransformSpecs.map(PartitionTransform.parse)
    val current = read(Some(v0))
    val needed = newIdentityCols ++ parsed.map(_.src)
    val missing = needed.filterNot(current.columns.contains)
    require(missing.isEmpty,
      s"$op: column(s) not in table: ${missing.mkString(", ")}")
    val renamed = needed.filter(c => toPhysical(c) != c)
    require(renamed.isEmpty,
      s"$op: renamed column(s) cannot partition: ${renamed.mkString(", ")}")
    (v0, current)
  }

  /** A version is taken if EITHER file form exists — a checkpoint
    * writer and a delta writer racing for the same number must not
    * both win.
    */
  private def tryPublish(v: Int, content: String, asDelta: Boolean): Boolean = {
    fs.mkdirs(logDir)
    // in-commit timestamp header: strictly monotonic over the version
    // line (max with predecessor + 1) so versionAtOrBefore's filter is
    // a prefix even across wall-clock skew between writers. Reading the
    // predecessor's stamp is O(1) — one small-file header (or a stat).
    val ict = math.max(System.currentTimeMillis(),
      if (v <= 0) 0L
      else (try commitTimeOf(v - 1) catch { case _: Exception => 0L }) + 1)
    val tmp = new Path(logDir, s".tmp-${UUID.randomUUID()}")
    val out = fs.create(tmp, false)
    try out.write(
      (ManifestTable.IctPrefix + ict + "\n" + content).getBytes("UTF-8"))
    finally out.close()
    val dest = if (asDelta) deltaPath(v) else manifestPath(v)
    val won = ManifestTable.lockFor(fs.makeQualified(logDir).toString)
      .synchronized {
        !fs.exists(manifestPath(v)) && !fs.exists(deltaPath(v)) &&
          fs.rename(tmp, dest)
      }
    if (!won) fs.delete(tmp, false)
    else persistConfigIfNeeded()
    won
  }

  /** T16: allot row-id bases to freshly committed entries (those
    * without a `#rid` stamp): base space starts at
    * `max(v << 40, the live high watermark)`, each entry takes its
    * `#n` rows. The version term keeps bases unique against every
    * past commit of this table (a dropped file's ids stay dead: its
    * version was smaller); the watermark term keeps clone-then-append
    * unique against bases CARRIED IN from the source's higher-
    * versioned history. Entries whose row count is unknown (no `#n`
    * footer stat) stay unstamped — their rows read NULL ids rather
    * than guessed ones.
    */
  private def stampRowIdBases(v: Int, added: Seq[Entry],
      carried: Seq[Entry]): Seq[Entry] = {
    val hwm = (carried ++ added).flatMap { e =>
      for {
        b <- e.stats.get(ManifestTable.RidKey).flatMap(_.mn.toLongOption)
        n <- e.stats.get(ManifestTable.CountKey).flatMap(_.mn.toLongOption)
      } yield b + n
    }.maxOption.getOrElse(0L)
    // the live snapshot alone cannot remember an allotment whose files
    // were dropped and whose range ran ABOVE its version band (a
    // clone-then-overwrite-then-restore rewind): such spills persist
    // to a tiny monotonic watermark file, read back here — so a
    // dropped-but-time-travelable file's id range is never re-allotted
    var off = math.max(math.max(v.toLong << 40, hwm), persistedRidHwm)
    val out = added.map { e =>
      if (e.stats.contains(ManifestTable.RidKey)) e
      else e.stats.get(ManifestTable.CountKey)
        .flatMap(_.mn.toLongOption) match {
        case Some(n) =>
          val base = off
          off += n
          e.copy(stats = e.stats + (ManifestTable.RidKey ->
            ColStats(base.toString, base.toString, "R")))
        case None => e
      }
    }
    // only spills above the NEXT version band need remembering: a
    // normal commit's range sits inside [v<<40, (v+1)<<40) and every
    // future version starts at or above (v+1)<<40 anyway — so the
    // watermark file is written only on clone-carried (or >2^40-row)
    // allotments, not per commit
    if (off > ((v.toLong + 1) << 40)) persistRidHwm(off)
    out
  }

  /** T16: `_graft_rid` / `_row_id` are engine-reserved — a user frame
    * carrying them would be silently hidden from every read and
    * MISREAD as physical row ids (colliding with allotted bases and
    * cross-matching unrelated rows in the keyless change feed), so the
    * public write surfaces refuse them up front.
    */
  private def requireNoReservedCols(df: DataFrame, what: String): Unit = {
    val hit = df.columns.find(c =>
      c == ManifestTable.RidPhysCol || c == ManifestTable.RowIdCol)
    require(hit.isEmpty, s"$what: column ${hit.getOrElse("")} is " +
      "reserved by row tracking — rename it before writing")
    // GENERATED ALWAYS AS IDENTITY: the engine assigns values (from
    // the row-id allocator) — an explicit value can neither be honored
    // nor silently dropped
    val ids = identityColumns
    val idHit = df.columns.find(ids.contains)
    require(idHit.isEmpty, s"$what: column ${idHit.getOrElse("")} is " +
      "GENERATED ALWAYS AS IDENTITY — drop it from the frame; the " +
      "engine assigns its values")
  }

  /** Monotonic row-id watermark sidecar (see [[stampRowIdBases]]).
    * Stored as uniquely-named `rid_hwm-<uuid>` files folded by
    * MAX-ON-READ: concurrent writers (same JVM or a foreign process)
    * never clobber each other and a reader mid-update can never
    * observe an absent watermark — the delete-then-rename regression
    * window of a single mutable file is structurally impossible.
    * Strictly-smaller predecessors are garbage-collected after a
    * successful write (any subset retaining the max is equivalent);
    * the legacy single `rid_hwm` file folds in for old tables.
    */
  private def ridHwmValues: Seq[(Path, Long)] =
    (if (!fs.exists(logDir)) Seq.empty[Path]
     else fs.listStatus(logDir).toSeq.map(_.getPath)
       .filter(_.getName.startsWith("rid_hwm")))
      .flatMap { p =>
        // a concurrent GC may delete between list and read — skip
        (try readLogLines(p).headOption.flatMap(_.trim.toLongOption)
         catch { case _: java.io.IOException => None }).map(p -> _)
      }

  private def persistedRidHwm: Long =
    ridHwmValues.map(_._2).maxOption.getOrElse(0L)

  private def persistRidHwm(v: Long): Unit =
    // same-JVM writers serialize on the per-root monitor; cross-process
    // writers are safe by construction (unique names, max-on-read)
    ManifestTable.lockFor(
      fs.makeQualified(logDir).toString + "#ridhwm").synchronized {
      if (v > persistedRidHwm) {
        val p = new Path(logDir, s"rid_hwm-${UUID.randomUUID()}")
        fs.mkdirs(logDir)
        val out = fs.create(p, false)
        try out.write(v.toString.getBytes("UTF-8")) finally out.close()
        ridHwmValues.foreach { case (old, ov) =>
          if (old.getName != p.getName && ov < v) fs.delete(old, false): Unit
        }
      }
    }

  /** Single-shot full-snapshot commit (overwrite/restore/clone — ops
    * whose intent is "the table now IS this file set", so there is
    * nothing to rebase). Loses a version-number race only in a tight
    * window; retries the next number a few times before giving up.
    */
  private def commit(entries: Seq[Entry], stampNew: Boolean = true): Int = {
    var attempt = 0
    while (attempt < 5) {
      val prev = latestVersion
      val v = prev.getOrElse(-1) + 1
      // row-id stamping per attempt: the final version number is part
      // of the base, and a lost race re-stamps on the next number.
      // stampNew = false for CARRIED snapshots (restore, clone): their
      // entries keep exactly the identity they had — stamping a
      // pre-row-tracking entry there would make the committed entry
      // differ from the source version's, invalidating restore's
      // file-diff stamp decision (and a clone should mirror its
      // source, stamps and gaps alike).
      val stamped =
        if (stampNew) stampRowIdBases(v, entries,
          prev.map(entriesOf).getOrElse(Seq.empty))
        else entries
      if (tryCommit(v, stamped)) return v
      attempt += 1
    }
    throw new java.util.ConcurrentModificationException(
      s"commit at $root kept losing version races after 5 attempts")
  }

  /** Optimistic concurrent commit of a FILE-LEVEL DELTA against the
    * snapshot the writer read (the Delta/Iceberg optimistic-concurrency
    * core): the commit is "remove `removed`, add `added`" relative to
    * `baseEntries`. If another writer committed first, REBASE instead
    * of failing: re-read the latest manifest and re-apply the delta on
    * top, provided the two commits are disjoint —
    *
    *  - every file this commit removes must still be referenced WITH
    *    an unchanged entry (a concurrent writer rewriting the same
    *    files means both derived output from rows the other replaced;
    *    a concurrent DELETION-VECTOR re-point keeps the rel but
    *    changes the entry — rebasing over it would resurrect the
    *    concurrently-deleted rows → both are real conflicts);
    *  - no concurrently-added entry may satisfy `conflictsWith` (the
    *    caller's semantic overlap test, e.g. "lands in a partition my
    *    merge rewrote" — rows added there concurrently would be
    *    dropped or double-merged by a blind rebase).
    *
    * Disjoint writers (append+append, merges of different partitions,
    * stream sink + compaction of untouched partitions) all commit;
    * overlapping writers get a ConcurrentModificationException and
    * re-run on the new snapshot. Retry budget bounds livelock under a
    * commit storm.
    */
  private def commitDelta(baseEntries: Seq[Entry], removed: Set[String],
      added: Seq[Entry], conflictsWith: Entry => Boolean = _ => false,
      maxRetries: Int = 10): Int = {
    val baseRels = baseEntries.map(_.rel).toSet
    val baseByRel = baseEntries.map(e => e.rel -> e).toMap
    var attempt = 0
    while (attempt <= maxRetries) {
      val cur = latestVersion
      val curEntries = cur.map(entriesOf).getOrElse(Seq.empty)
      val curByRel = curEntries.map(e => e.rel -> e).toMap
      // removed entries must be present AND byte-identical to the base
      // snapshot's: a same-rel entry with different stats means a
      // concurrent DV commit marked rows in a file this commit rewrites
      // from pre-DV content
      val missing = removed.filter(r => !curByRel.get(r).contains(baseByRel(r)))
      if (missing.nonEmpty)
        throw new java.util.ConcurrentModificationException(
          s"concurrent writer rewrote or re-pointed ${missing.size} file(s) " +
            s"this commit also rewrites (e.g. ${missing.head}); re-run on " +
            "the new snapshot")
      val overlapping = curEntries.filter(e =>
        !baseRels.contains(e.rel) && conflictsWith(e))
      if (overlapping.nonEmpty)
        throw new java.util.ConcurrentModificationException(
          s"concurrent writer added ${overlapping.size} file(s) overlapping " +
            s"this commit (e.g. ${overlapping.head.rel}); re-run on the new snapshot")
      val vNext = cur.getOrElse(-1) + 1
      // row-id stamping per attempt (see [[stampRowIdBases]]): the
      // final version is part of the base; re-pointed entries keep
      // their carried stamp (identity survives the DV commit)
      val stampedAdded = stampRowIdBases(vNext, added, curEntries)
      // O(delta) commit entry; full snapshot on the checkpoint cadence
      // (and for v0, which anchors every chain)
      val won =
        if (vNext == 0 || vNext % ManifestTable.CheckpointEvery == 0) {
          val target = curEntries.filterNot(e => removed.contains(e.rel)) ++
            stampedAdded
          tryCommit(vNext, target)
        } else {
          val lines = removed.toSeq.sorted.map("-\t" + _) ++
            stampedAdded.map("+\t" + _.line)
          // a pure no-op delta still needs a line-less file? No — the
          // caller guarantees a non-empty delta (no-ops return early),
          // but guard the degenerate case with an empty payload anyway
          tryPublish(vNext,
            if (lines.isEmpty) "" else lines.mkString("\n") + "\n",
            asDelta = true)
        }
      if (won) return vNext
      attempt += 1
    }
    throw new java.util.ConcurrentModificationException(
      s"commit at $root kept losing version races after $maxRetries retries")
  }

  /** Entries for freshly written files: per-file min/max of EVERY stats
    * column via ONE distributed job over just the new files
    * (input_file_name grouping) — write-time stats collection, O(new
    * data) once, never re-scanned. Files are uuid-named so basename
    * lookup is exact.
    */
  private def newEntries(relFiles: Seq[String]): Seq[Entry] = {
    if ((allStatsCols.isEmpty && bloomCol.isEmpty) || relFiles.isEmpty)
      return withFooterCounts(relFiles.map(Entry(_, Map.empty)))
    val abs = relFiles.map(r => new Path(root, r).toString)
    val sdf = spark.read.option("basePath", dataDir.toString).parquet(abs: _*)
    val present = allStatsCols.filter(sdf.columns.contains)
    val bloom = bloomCol.filter(sdf.columns.contains)
    if (present.isEmpty && bloom.isEmpty)
      return withFooterCounts(relFiles.map(Entry(_, Map.empty)))
    val kinds = present.map(c => c -> statKindOf(sdf.schema(c).dataType)).toMap
    // Bloom positions ride the SAME per-file stats job: each row
    // explodes into its k bit positions (min/max are duplication-proof,
    // collect_set is bounded by bloomBits) — one distributed pass over
    // the new files collects zone maps AND blooms.
    val withFile = sdf.withColumn("_f", input_file_name())
    // posexplode (not explode) so the row COUNT can ride the same
    // pass: position 0 marks each original row exactly once despite
    // the k-fold bloom fan-out (null position = the explode_outer
    // degenerate row, also one per original row)
    val rows = bloom match {
      case Some(b) =>
        withFile
          .select(col("*"),
            posexplode_outer(bloomPositions(col(b))).as(Seq("_bi", "_bp")))
      case None => withFile
        .withColumn("_bi", lit(0))
        .withColumn("_bp", lit(null).cast("int"))
    }
    // the bitset packs ENGINE-SIDE (mergeable OR-aggregator): the
    // driver receives one ~8 KB base64 string per file — a collect_set
    // of positions would ship up to bloomBits boxed ints per file and
    // OOM the driver on a wide compaction
    val packBits = udaf(new ManifestTable.BloomBitsAgg(bloomBits),
      org.apache.spark.sql.Encoders.INT)
    val aggs = present.flatMap(c => Seq(
      min(col(c)).cast("string").as(s"mn_$c"),
      max(col(c)).cast("string").as(s"mx_$c"))) ++
      Seq(count(when(col("_bi").isNull || col("_bi") === 0, 1))
        .as("_cnt")) ++
      bloom.map(_ => packBits(col("_bp")).as("_bloom"))
    val byName = rows
      .groupBy(col("_f"))
      .agg(aggs.head, aggs.tail: _*)
      .collect() // bounded: one row per new file
      .map { r =>
        val stats = present.flatMap { c =>
          (Option(r.getAs[String](s"mn_$c")), Option(r.getAs[String](s"mx_$c"))) match {
            case (Some(mn), Some(mx)) => Some(c -> ColStats(mn, mx, kinds(c)))
            case _ => None // all-null column in this file: never pruned on it
          }
        }.toMap
        val n = r.getAs[Long]("_cnt")
        val cntStats = Map(ManifestTable.CountKey ->
          ColStats(n.toString, n.toString, "C"))
        val bloomStats = bloom.map { b =>
          bloomKey(b) -> ColStats(
            r.getAs[String]("_bloom"),
            s"$bloomBits,$bloomHashes", "B")
        }
        new Path(r.getString(0)).getName -> (stats ++ cntStats ++ bloomStats)
      }
      .toMap
    // zero-row files never appear in the scan's groups; only THOSE
    // stragglers (normally none) still pay a driver footer read
    val missing = relFiles.filterNot(rel =>
      byName.contains(new Path(rel).getName))
    val footered = withFooterCounts(missing.map(Entry(_, Map.empty)))
      .map(e => e.rel -> e).toMap
    relFiles.map(rel => footered.getOrElse(rel,
      Entry(rel, byName(new Path(rel).getName))))
  }

  /** Attach each NEW file's exact row count (the parquet footer's
    * record count — authoritative metadata, no data pages read) as the
    * `#n` stats entry, paid once at write time so COUNT(*) never has
    * to touch data again ([[metadataRowCount]]). This is the FALLBACK
    * path: tables with stats columns or blooms get `#n` from the
    * distributed write-time stats job in [[newEntries]] (one
    * `count(pos==0)` leg on the same single pass — executor-side, so a
    * wide initial load never serializes footer IO through the driver);
    * the footer pool serves only stats-less tables and zero-row
    * stragglers. One ranged footer read per file, fanned out over a
    * bounded driver pool, and BEST-EFFORT: a read failure or a pool
    * that outlives the deadline (a stalled remote filesystem must not
    * hang the commit forever) logs a warning and omits `#n` for the
    * affected files — [[metadataRowCount]] already degrades to a scan
    * when any entry lacks the stat.
    */
  private def withFooterCounts(entries: Seq[Entry]): Seq[Entry] = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    if (entries.isEmpty) return entries
    val conf = spark.sessionState.newHadoopConf()
    // a BOUNDED dedicated pool, not ExecutionContext.global: the
    // global fork-join pool either caps blocking IO at #cores (and
    // starves its other users) or — under blocking{} — spawns up to
    // 256 compensating threads, enough to exhaust an object-store
    // client's connection pool on a wide commit. 32 concurrent footer
    // reads is a safe ceiling below default S3A connection limits.
    val par = math.min(32, math.max(8,
      Runtime.getRuntime.availableProcessors()))
    // DAEMON threads + shutdownNow: a read wedged on a stalled remote
    // filesystem must neither survive as a non-daemon thread blocking
    // JVM exit nor keep running after the commit gave up on it
    val pool = java.util.concurrent.Executors.newFixedThreadPool(par,
      (r: Runnable) => {
        val t = new Thread(r, "graft-footer-count")
        t.setDaemon(true)
        t
      })
    implicit val ec: ExecutionContext =
      ExecutionContext.fromExecutorService(pool)
    // generous but finite: 30 s of budget per batch-of-`par` plus a
    // 5 min floor — far above healthy footer latency, small enough
    // that one wedged read surfaces as a log line, not a hung commit
    val deadline = math.max(300L, 30L * ((entries.size + par - 1) / par)).seconds
    val futures = entries.map { e =>
      Future {
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(new Path(root, e.rel), conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        val n = try r.getRecordCount finally r.close()
        e.copy(stats = e.stats + (ManifestTable.CountKey ->
          ColStats(n.toString, n.toString, "C")))
      }.recover { case ex: Exception =>
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"footer row-count read failed for ${e.rel} " +
            s"(#n omitted; COUNT(*) will scan): $ex")
        e
      }
    }
    // harvest per future against ONE shared deadline: counts that
    // completed are kept even when a straggler times out — only the
    // wedged file loses its #n (an all-or-nothing Await would discard
    // every completed read on one timeout)
    val deadlineAt = System.nanoTime() + deadline.toNanos
    try futures.zip(entries).map { case (f, e) =>
      val left = math.max(0L, deadlineAt - System.nanoTime()).nanos
      try Await.result(f, left)
      catch {
        case _: java.util.concurrent.TimeoutException =>
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            s"footer row-count read for ${e.rel} exceeded the $deadline " +
              "commit budget; committing it without #n (COUNT(*) will scan)")
          e
      }
    } finally pool.shutdownNow()
  }

  /** Bloom bit positions of a value (engine side): double hashing
    * pos_i = (h1 + i·h2) mod m over the value's STRING rendering, both
    * hashes xxhash64 so the driver-side probe can replay them exactly.
    */
  private def bloomPositions(c: Column): Column = {
    val s = c.cast("string")
    val m = lit(bloomBits.toLong)
    // reduce each hash mod m BEFORE combining: (h1 + i·h2) mod m ==
    // ((h1 mod m) + i·(h2 mod m)) mod m, and the reduced form can't
    // overflow a long (ANSI mode would reject the wrapping multiply)
    val h1 = pmod(xxhash64(s), m)
    val h2 = pmod(xxhash64(lit(ManifestTable.BloomSalt), s), m)
    transform(sequence(lit(0), lit(bloomHashes - 1)),
      i => pmod(h1 + i.cast("long") * h2, m).cast("int"))
  }

  private def bloomKey(c: String): String = s"$c#bloom"

  /** Driver-side replica of [[bloomPositions]]'s double hash for a
    * probe value — the RAW (pre-mod) hash pair, computed ONCE per
    * value: Spark's xxhash64 chains XXH64 over the UTF8 bytes from
    * seed 42, and xxhash64(salt, v) uses the salt's hash as v's seed.
    */
  private def bloomRawHashes(value: String): (Long, Long) = {
    import org.apache.spark.sql.catalyst.expressions.XxHash64Function
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    val v = UTF8String.fromString(value)
    (XxHash64Function.hash(v, StringType, 42L),
      XxHash64Function.hash(v, StringType, ManifestTable.bloomSaltSeed))
  }

  /** Probe a decoded bitset with a precomputed raw-hash pair. */
  private def bloomTest(bits: Array[Byte], m: Long, k: Int,
      raw: (Long, Long)): Boolean = {
    val h1 = java.lang.Math.floorMod(raw._1, m)
    val h2 = java.lang.Math.floorMod(raw._2, m)
    (0 until k).forall { i =>
      val pos = ((h1 + i.toLong * h2) % m).toInt
      (bits(pos >> 3) & (1 << (pos & 7))) != 0
    }
  }

  private def bloomMightContain(s: ColStats, value: String): Boolean =
    bloomTestEntry(s, Seq(bloomRawHashes(value)))

  /** Decode the entry's bitset ONCE and probe it with every raw-hash
    * pair — the batch path: pruning F files for V values costs
    * F decodes + V hashings, never F·V of each.
    */
  private def bloomTestEntry(s: ColStats, raws: Seq[(Long, Long)]): Boolean = {
    val bits = java.util.Base64.getDecoder.decode(s.mn)
    val mk = s.mx.split(',')
    val (m, k) = (mk(0).toLong, mk(1).toInt)
    raws.exists(bloomTest(bits, m, k, _))
  }

  /** Point-lookup file skipping: files of the (latest) version whose
    * bloom filter might contain `value` (string rendering) in
    * `bloomCol`. The companion to zone maps for the query they can't
    * serve — an equality probe on a high-cardinality UNSORTED column
    * ("find one doc_id among 100k files"), where every file's [min,max]
    * spans the domain but each file's bloom rejects absent keys with
    * ~(1-e^(-kn/m))^k false-positive rate. Files without a recorded
    * bloom (pre-bloom commits, carried-forward legacy entries) are
    * kept — never wrongly pruned.
    */
  def prunedFilesEq(c: String, value: String,
      version: Option[Int] = None): Seq[String] =
    prunedEntriesEq(c, value, version).map(e => new Path(root, e.rel).toString)

  private def prunedEntriesEq(c: String, value: String,
      version: Option[Int]): Seq[Entry] = {
    val pc = toPhysical(c) // stats/bloom keys are recorded physical
    require(bloomCol.contains(pc), s"no bloom filter for column $c")
    val v = version.orElse(latestVersion)
      .getOrElse(throw new IllegalStateException(s"no versions at $root"))
    entriesOf(v)
      .filter(e => e.stats.get(bloomKey(pc)).forall(bloomMightContain(_, value)))
  }

  /** Equality probe with bloom file skipping + exact residual filter
    * (compares in the same string domain the bloom hashed). Entry-level
    * read so surviving files' deletion vectors still apply.
    */
  def readEq(c: String, value: String, version: Option[Int] = None): DataFrame = {
    val entries = prunedEntriesEq(c, value, version)
    if (entries.isEmpty) read(version).filter(lit(false))
    else readEntries(entries).filter(col(c).cast("string") === lit(value))
  }

  /** Min/max compare in the ordering the stats were recorded under
    * (entry kind): numeric for numeric columns, lexicographic for
    * everything else. Legacy numeric entries that fail to parse fall
    * back to lexicographic rather than crashing the prune.
    */
  private def statCmp(a: String, b: String, kind: String): Int =
    if (kind == "N")
      try BigDecimal(a).compare(BigDecimal(b))
      catch { case _: NumberFormatException => a.compareTo(b) }
    else a.compareTo(b)

  /** True when an entry's zone map for `c` intersects [lo, hi] — or when
    * it has no stats for `c` (unknown files are never wrongly pruned).
    */
  private def zoneIntersects(e: Entry, c: String, lo: String, hi: String): Boolean =
    e.stats.get(c).forall { s =>
      statCmp(s.mx, lo, s.kind) >= 0 && statCmp(s.mn, hi, s.kind) <= 0
    }

  /** L7: data-skipping file set for a range on ANY zone-mapped column —
    * files of the (latest) version whose recorded [min, max] for `c`
    * intersects [lo, hi]; files without stats for `c` are kept (never
    * wrongly pruned). Exposed for pruning assertions.
    */
  def prunedFilesBy(c: String, lo: String, hi: String,
      version: Option[Int] = None): Seq[String] =
    prunedEntriesBy(c, lo, hi, version).map(e => new Path(root, e.rel).toString)

  private def prunedEntriesBy(c: String, lo: String, hi: String,
      version: Option[Int]): Seq[Entry] = {
    val pc = toPhysical(c) // stats keys are recorded physical
    require(allStatsCols.contains(pc), s"no zone map for column $c")
    val v = version.orElse(latestVersion)
      .getOrElse(throw new IllegalStateException(s"no versions at $root"))
    entriesOf(v).filter(zoneIntersects(_, pc, lo, hi))
  }

  /** Single-column convenience over the primary statsCol. */
  def prunedFiles(lo: String, hi: String,
      version: Option[Int] = None): Seq[String] =
    prunedFilesBy(statsCol.getOrElse(
      throw new IllegalArgumentException("table has no statsCol")), lo, hi, version)

  /** L7: range query with file skipping on any zone-mapped column —
    * scans only intersecting files and applies the residual predicate
    * (exact result regardless of stats coverage).
    */
  def readRangeBy(c: String, lo: String, hi: String,
      version: Option[Int] = None): DataFrame = {
    val entries = prunedEntriesBy(c, lo, hi, version)
    if (entries.isEmpty) read(version).filter(lit(false))
    else {
      val out = readEntries(entries) // evolved-schema + clone- and DV-aware
      // bounds cast to the COLUMN's type: a bigint-vs-string comparison
      // would coerce both sides to double, whose exact-integer range
      // (2^53) is narrower than the ids zone maps allow — boundary rows
      // near extreme magnitudes would be misclassified by the residual
      // (zone-map statCmp itself is exact via BigDecimal)
      val dt = out.schema(c).dataType
      out.filter(col(c) >= lit(lo).cast(dt) && col(c) <= lit(hi).cast(dt))
    }
  }

  def readRange(lo: String, hi: String, version: Option[Int] = None): DataFrame =
    readRangeBy(statsCol.getOrElse(
      throw new IllegalArgumentException("table has no statsCol")), lo, hi, version)

  /** Multi-range file skipping in ONE scan: files intersecting ANY of
    * the ranges are read once (deduped), with the OR of the range
    * predicates as the residual. The point-lookup-set shape (an
    * IVF-PQ query's probed lists, an IN-list over a clustered key)
    * would otherwise need one scan branch per range.
    */
  def readRangesBy(c: String, ranges: Seq[(String, String)],
      version: Option[Int] = None): DataFrame = {
    val pc = toPhysical(c)
    require(allStatsCols.contains(pc), s"no zone map for column $c")
    require(ranges.nonEmpty, "readRangesBy needs at least one range")
    val v = version.orElse(latestVersion)
      .getOrElse(throw new IllegalStateException(s"no versions at $root"))
    val entries = entriesOf(v).filter(e =>
      ranges.exists { case (lo, hi) => zoneIntersects(e, pc, lo, hi) })
    if (entries.isEmpty) read(version).filter(lit(false))
    else {
      val out = readEntries(entries)
      val dt = out.schema(c).dataType // see readRangeBy: exact residual bounds
      out.filter(ranges
        .map { case (lo, hi) =>
          col(c) >= lit(lo).cast(dt) && col(c) <= lit(hi).cast(dt)
        }
        .reduce(_ || _))
    }
  }

  // -------------------------------------------------------------- //
  // Hidden-partition pruning: queries filter on the SOURCE column;  //
  // the engine recomputes the transform and prunes hive dirs.       //
  // -------------------------------------------------------------- //

  private def transformFor(srcCol: String): PartitionTransform =
    transforms.find(_.src == srcCol).getOrElse(
      throw new IllegalArgumentException(
        s"no partition transform on column $srcCol " +
          s"(declared: ${transforms.map(_.spec).mkString(", ")})"))

  /** Derived partition value of a literal, computed through the SAME
    * expression writers use (a one-row local projection — never a
    * distributed job). `dt` = the source column's type.
    */
  private def derivedValueOf(t: PartitionTransform, value: String,
      dt: org.apache.spark.sql.types.DataType): String = {
    val r = spark.range(1)
      .select(t.derive(lit(value).cast(dt), dt).cast("string").as("v"))
      .head()
    if (r.isNullAt(0)) null else r.getString(0)
  }

  /** Hive dir value of partition column `c` in a file path, unescaped;
    * None when the path carries no such segment. */
  private def partValueOf(rel: String, c: String): Option[String] =
    rel.split("/").find(_.startsWith(s"$c=")).map { seg =>
      val v = seg.substring(c.length + 1)
      if (v == org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .DEFAULT_PARTITION_NAME) null
      else org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .unescapePathName(v)
    }

  private def srcType(srcCol: String) = read().schema(srcCol).dataType

  /** Multi-spec pruning kernel: each file is tested against every
    * transform ON `srcCol` that ITS OWN path carries
    * ([[PartitionTransform.fromName]] parses the hidden hive column
    * back to its transform) — after a lazy [[setPartitionSpec]],
    * old-spec files prune by THEIR transform and current files by the
    * current one, in the same pass. A file carrying no segment on
    * `srcCol` is kept (never wrongly skipped), so pruning degrades to
    * a scan, never to row loss. `test(t, pathValue)` decides keep for
    * one carried segment value (`pathValue` is null for the hive
    * default partition).
    */
  private def pruneBySpecs(entries: Seq[Entry], srcCol: String)(
      test: (PartitionTransform, String) => Boolean): Seq[Entry] = {
    val logicalOf = columnMapping // physical -> logical, loaded once
    val parsed =
      scala.collection.mutable.Map.empty[String, Option[PartitionTransform]]
    def transformOf(c: String): Option[PartitionTransform] =
      parsed.getOrElseUpdate(c, PartitionTransform.fromName(c)
        .filter(t => logicalOf.getOrElse(t.src, t.src) == srcCol))
    entries.filter { e =>
      ManifestTable.layoutColsOf(e.rel).forall { c =>
        transformOf(c) match {
          case Some(t) => partValueOf(e.rel, c).forall(pv => test(t, pv))
          case None => true
        }
      }
    }
  }

  private def pruneEq(entries: Seq[Entry], srcCol: String,
      value: String): Seq[Entry] = {
    val dt = srcType(srcCol)
    // one tiny local projection per DISTINCT transform, not per file
    val derived = scala.collection.mutable.Map.empty[String, String]
    def tv(t: PartitionTransform): String =
      derived.getOrElseUpdate(t.name, derivedValueOf(t, value, dt))
    pruneBySpecs(entries, srcCol)((t, pv) => pv == tv(t))
  }

  /** Point lookup through a partition transform: scan only the files
    * whose derived partition matches `transform(value)` — each file
    * under its OWN spec's transform — then apply the exact residual
    * predicate on the source column. A `bucket(1024, user_id)` table
    * answers a user lookup from 1/1024th of its files with zero index
    * structures.
    */
  def readPartitionEq(srcCol: String, value: String): DataFrame = {
    transformFor(srcCol) // contract: the current spec partitions on srcCol
    val dt = srcType(srcCol)
    val v = latestVersion.getOrElse(
      throw new IllegalStateException(s"no versions at $root"))
    val entries = pruneEq(entriesOf(v), srcCol, value)
    if (entries.isEmpty) read(Some(v)).filter(lit(false))
    else readEntries(entries).filter(col(srcCol) === lit(value).cast(dt))
  }

  /** Range scan through a MONOTONIC partition transform (`days`,
    * `months`, `hours`, `truncate`): scan only files whose derived
    * partition intersects `[transform(lo), transform(hi)]` under the
    * file's OWN spec, with the exact residual on the source column.
    * Bucket transforms refuse as the current spec (hashing destroys
    * ordering); an old-spec bucket segment simply cannot prune and its
    * files are kept.
    */
  def readPartitionRange(srcCol: String, lo: String, hi: String): DataFrame = {
    val cur = transformFor(srcCol)
    require(cur.monotonic,
      s"${cur.spec} is not ordering-preserving; range pruning would be wrong")
    val dt = srcType(srcCol)
    case class Bounds(lo: String, hi: String, numeric: Boolean)
    val cache = scala.collection.mutable.Map.empty[String, Bounds]
    def boundsOf(t: PartitionTransform): Bounds =
      cache.getOrElseUpdate(t.name, Bounds(
        derivedValueOf(t, lo, dt), derivedValueOf(t, hi, dt),
        t match {
          case PartitionTransform.TruncateOf(_, _) => dt match {
            case org.apache.spark.sql.types.StringType => false
            case _ => true
          }
          case _ => false // date-shaped strings compare lexicographically
        }))
    def le(numeric: Boolean)(a: String, b: String): Boolean =
      if (numeric) a.toDouble <= b.toDouble else a <= b
    val v = latestVersion.getOrElse(
      throw new IllegalStateException(s"no versions at $root"))
    val entries = pruneBySpecs(entriesOf(v), srcCol) { (t, pv) =>
      if (!t.monotonic) true
      else {
        val b = boundsOf(t)
        pv != null && le(b.numeric)(b.lo, pv) && le(b.numeric)(pv, b.hi)
      }
    }
    if (entries.isEmpty) read(Some(v)).filter(lit(false))
    else readEntries(entries)
      .filter(col(srcCol) >= lit(lo).cast(dt) && col(srcCol) <= lit(hi).cast(dt))
  }

  /** Files a [[readPartitionEq]] would scan — the pruning audit hook
    * (what a spec asserts shrank). */
  def prunedFilesPartitionEq(srcCol: String, value: String): Seq[String] = {
    transformFor(srcCol)
    val v = latestVersion.getOrElse(
      throw new IllegalStateException(s"no versions at $root"))
    pruneEq(entriesOf(v), srcCol, value)
      .map(e => new Path(root, e.rel).toString)
  }

  /** Write a DataFrame's rows as new data files; returns their paths
    * relative to the table root. Files land under data/ preserving
    * hive-style partition dirs when the table is partitioned.
    */
  private def writeDataFiles(df: DataFrame,
      fileTag: Option[String] = None): Seq[String] = {
    fileTag.foreach(t => require(t.matches("[A-Za-z0-9_\\-.]+"),
      s"bad file tag: $t"))
    val stage = new Path(root, s".stage-${UUID.randomUUID()}")
    try {
      // optimized write (the Delta optimizeWrite pattern): without the
      // pre-shuffle, a partitioned write fans out (tasks × tuples)
      // files — a 32-task merge over 9 tuples mints up to 288 small
      // files per commit, the small-file problem compaction exists to
      // undo. One hash shuffle by the partition tuple lands each tuple
      // in one task → one file per tuple per commit.
      // ALWAYS recompute derived partition values (drop any carried
      // in): an updateWhere copy scanned from hive dirs carries the
      // OLD derived value — if the assignment changed the transform
      // source, trusting it would file the row in the wrong partition.
      // Generated columns compute/validate FIRST, on logical names.
      // Identity columns are DERIVED (start + step * row id): internal
      // rewrite frames built from read() carry them — shed here, the
      // preserved row ids recompute the same values on every read
      // (public surfaces refuse user-supplied values up front).
      val idCols = identityColumns.keys.toSeq.filter(df.columns.contains)
      val derived = withDerived(
        toPhysicalRename(withGenerated(df.drop(idCols: _*)))
          .drop(transforms.map(_.name): _*))
      // a column landing on DROPPED physical storage would resurrect
      // the old values for every pre-drop file — refuse with the
      // re-add path named (ADD COLUMNS mints a fresh physical id)
      locally {
        val dropped = droppedColumns
        val hit = derived.columns.filter(dropped.contains)
        require(hit.isEmpty, s"column(s) ${hit.mkString(", ")} collide " +
          "with dropped columns' physical storage — re-add via ALTER " +
          "TABLE ADD COLUMNS (fresh physical id) before writing values")
      }
      val toWrite =
        if (partCols.isEmpty) derived
        else {
          // EXPLICIT partition count (guide §2.5 input-skew case): a
          // bare repartition(cols) is AQE-coalescible, and a DML
          // commit's rewrite set is tiny BY BYTES while wide BY TUPLE
          // COUNT — AQE folds the shuffle to one task, which then
          // opens/closes every tuple's parquet writer serially (a
          // 92-tuple daily append measured 1.7 s in one task vs ~0.2 s
          // fanned out). The count tracks the session's configured
          // parallelism, so a cluster-sized session fans out
          // cluster-wide; each tuple still hashes to exactly one task
          // → one file per tuple per commit either way.
          val n = math.max(spark.sparkContext.defaultParallelism,
            spark.sessionState.conf.numShufflePartitions)
          derived.repartition(n, partCols.map(col): _*)
        }
      // the stage dir is PRIVATE (uuid-named, walked and deleted by
      // this method alone), so Spark's two-phase output commit buys
      // nothing here: v2 task commits move files straight to their
      // final stage location (halving the rename churn of the default
      // v1's job-commit pass) and the _SUCCESS marker is noise the
      // walk would skip anyway — atomicity comes from the manifest
      // commit, never from the stage layout (measured: the committer
      // dance was the single largest driver-side cost of every DML
      // commit at bench scale)
      val writer = toWrite.write.mode("overwrite")
        .options(ManifestTable.InternalWriteOptions)
      (if (partCols.isEmpty) writer else writer.partitionBy(partCols: _*))
        .parquet(stage.toString)
      val moved = scala.collection.mutable.ArrayBuffer[String]()
      def walk(dir: Path, relPrefix: String): Unit =
        fs.listStatus(dir).foreach { st =>
          val name = st.getPath.getName
          if (st.isDirectory) walk(st.getPath, s"$relPrefix$name/")
          else if (name.endsWith(".parquet")) {
            val rel =
              s"data/$relPrefix${fileTag.getOrElse("")}${UUID.randomUUID()}.parquet"
            val dest = new Path(root, rel)
            fs.mkdirs(dest.getParent)
            if (!fs.rename(st.getPath, dest))
              throw new IllegalStateException(s"move to $dest failed")
            moved += rel
          }
        }
      walk(stage, "")
      fs.delete(stage, true)
      // seed the file-schema memo from the WRITTEN frame: an engine
      // write's FILE schema is the frame schema minus the hive
      // partition columns (parquet round-trips every type the engine
      // writes, and file sources normalize read-schema nullability
      // anyway), so the old read-back footer open per commit was pure
      // overhead. Unpartitioned reads consume the memo as their full
      // read schema; partitioned reads use memo AGREEMENT to skip the
      // per-read mergeSchema footer sweep (dir discovery stays
      // Spark's).
      if (moved.nonEmpty) {
        val st = org.apache.spark.sql.types.StructType(
          toWrite.schema.filterNot(f => partCols.contains(f.name)))
        moved.foreach(r => ManifestTable.rememberFileSchema(
          new Path(root, r).toString, st))
      }
      moved.toSeq
    } catch {
      // a failed write (e.g. a CHECK constraint thrown mid-job) must
      // not leak its staging dir into the table root
      case e: Throwable => fs.delete(stage, true); throw e
    }
  }

  /** L2/S5: overwrite = new version referencing only the new files;
    * append = new version referencing old + new files. Appends are
    * blind adds — they rebase onto ANY concurrent commit and never
    * conflict (the stream-sink + nightly-job coexistence case).
    */
  def write(df: DataFrame, mode: String = "overwrite"): Int =
    write(df, mode, None)

  /** As [[write]], with every data file's name prefixed by `fileTag` —
    * a commit-atomic marker the streaming sink uses for replay
    * detection ([[hasCommittedFileTag]]): the tag exists in the current
    * snapshot if and only if the tagged commit happened.
    */
  private[graft] def write(df: DataFrame, mode: String,
      fileTag: Option[String]): Int = {
    requireNoReservedCols(df, "write")
    val newFiles = newEntries(writeDataFiles(enforced(df), fileTag))
    mode match {
      case "append" =>
        val base = latestVersion.map(entriesOf).getOrElse(Seq.empty)
        commitDelta(base, Set.empty, newFiles)
      case "overwrite" =>
        // T15: an overwrite's change rows ARE its file delta (fresh
        // uuid files, nothing shared) — the keyless feed derives
        // deletes/inserts from it, no sidecar needed
        stampCdcFileDiff(commit(newFiles))
      case m => throw new IllegalArgumentException(s"mode $m")
    }
  }

  /** True when any file of the CURRENT snapshot carries `tag` as a
    * file-name prefix. Driver-side O(files) — one manifest resolution,
    * the cost every read pays.
    */
  private[graft] def hasCommittedFileTag(tag: String): Boolean =
    latestVersion.exists(v => entriesOf(v).exists { e =>
      e.rel.substring(e.rel.lastIndexOf('/') + 1).startsWith(tag)
    })

  /** Last batch id the streaming sink committed for `queryId`, from the
    * txn sidecar (written AFTER each commit — see GraftTableSink for
    * the two-layer exactly-once argument).
    */
  private[graft] def streamTxnBatch(queryId: String): Option[Long] = {
    val p = streamTxnPath(queryId)
    if (!fs.exists(p)) None
    else readLogLines(p).headOption.flatMap(_.trim.toLongOption)
  }

  /** Record `batchId` as committed for `queryId`. Rename-FIRST (a
    * local-FS rename overwrites atomically); only when the filesystem
    * refuses a rename onto an existing destination (HDFS semantics)
    * does the delete-then-rename fallback run — so the no-sidecar
    * window is not a normal-path step but a crash inside the fallback,
    * and even then the commit-atomic file-tag layer still answers
    * replays. Failed attempts never leak their temp file.
    */
  private[graft] def recordStreamTxn(queryId: String, batchId: Long): Unit = {
    val tmp = new Path(logDir, s".tmp-txn-${UUID.randomUUID()}")
    val out = fs.create(tmp, false)
    try out.write(s"$batchId\n".getBytes("UTF-8")) finally out.close()
    val dest = streamTxnPath(queryId)
    try {
      if (!fs.rename(tmp, dest)) {
        fs.delete(dest, false)
        if (!fs.rename(tmp, dest))
          throw new IllegalStateException(s"stream txn write failed at $dest")
      }
    } finally fs.delete(tmp, false): Unit
  }

  private def streamTxnPath(queryId: String): Path = {
    require(queryId.matches("[A-Za-z0-9_\\-]+"), s"bad query id: $queryId")
    new Path(logDir, s"stream-txn-$queryId")
  }

  // ---- Write-audit-publish: staged branches (the Iceberg WAP flow) ----

  private def branchFile(name: String): Path = {
    require(name.matches("[A-Za-z0-9_\\-]+"), s"bad branch name: $name")
    new Path(logDir, s"branch-$name")
  }

  /** Stage `df` as an APPEND on branch `name`: data files land under
    * the table dir, a branch file in the log records the staged
    * entries — but no version is committed, so main readers never see
    * the rows. The write-audit-publish pattern: land the batch, audit
    * [[readBranch]], then [[publishBranch]] or [[dropBranch]]. CHECK
    * constraints are enforced at stage time — a later audit failure
    * should be about data QUALITY, not validity. Staged files are
    * vacuum-protected until their branch is dropped or published.
    */
  def stageBranch(name: String, df: DataFrame): Unit = {
    requireNoReservedCols(df, "stageBranch")
    val bp = branchFile(name)
    require(!fs.exists(bp), s"branch $name already staged at $root")
    val entries = newEntries(writeDataFiles(enforced(df)))
    val body = entries.map(_.line).mkString("\n") + "\n"
    val tmp = new Path(logDir, s".tmp-branch-${UUID.randomUUID()}")
    val out = fs.create(tmp, false)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    // the exists-check + rename must be one atomic step under the
    // per-root JVM lock (the tryCommit/colmap pattern): a local-FS
    // rename OVERWRITES, so two same-process stagers of one branch
    // name could otherwise both pass the pre-check and both "win",
    // silently orphaning the loser's staged files
    // the shared ref lock (not a per-name one): a branch staged
    // mid-vacuum must wait out the delete phase — its files become
    // vacuum-protected references the instant the marker lands, and
    // [[withRefLock]] extends that across processes
    withRefLock {
      if (fs.exists(bp) || !fs.rename(tmp, bp)) {
        fs.delete(tmp, false)
        throw new IllegalStateException(
          s"branch $name was staged concurrently at $root")
      }
    }
  }

  private def branchEntries(name: String): Seq[Entry] =
    readLogLines(branchFile(name)).filter(_.nonEmpty)
      .map(Entry.parse(_, statsCol))

  /** Names of currently staged branches. */
  def branches: Seq[String] =
    if (!fs.exists(logDir)) Seq.empty
    else fs.listStatus(logDir).map(_.getPath.getName)
      .filter(_.startsWith("branch-")).map(_.stripPrefix("branch-"))
      .toSeq.sorted

  /** The audit view: current main snapshot plus the branch's staged
    * rows — what the table WILL look like after publish (modulo
    * concurrent main commits, which an append rebases over cleanly).
    */
  def readBranch(name: String): DataFrame = {
    val staged = withDerived(readEntries(branchEntries(name)))
    latestVersion match {
      case Some(_) =>
        val base = read()
        base.unionByName(staged.select(base.columns.map(col).toSeq: _*))
      case None => staged
    }
  }

  /** Publish the branch: ONE append commit of the staged entries onto
    * the CURRENT main head (an append conflicts with nothing, so any
    * main commits since staging are rebased over), then the branch
    * marker is removed. Exactly-once: the commit wins or throws; the
    * marker removal after a successful commit makes re-publish refuse.
    */
  def publishBranch(name: String): Int = {
    val staged = branchEntries(name)
    val base = latestVersion.map(entriesOf).getOrElse(Seq.empty)
    val v = commitDelta(base, Set.empty, staged)
    fs.delete(branchFile(name), false)
    v
  }

  /** Abandon the branch: the marker is removed; the staged data files
    * become unreferenced and age out via [[vacuum]].
    */
  def dropBranch(name: String): Unit = withRefLock {
    require(fs.exists(branchFile(name)), s"no branch $name at $root")
    fs.delete(branchFile(name), false): Unit
  }

  /** Guarded full rewrite for read-modify-replace ops (compact,
    * optimize, unpartitioned merge): the commit removes exactly the
    * files of the snapshot that was read, so a concurrent commit of
    * ANY kind is detected (rewritten files gone, or a new file
    * appears → conflictsWith) instead of silently dropping its rows —
    * the lost-update a blind overwrite would cause.
    */
  private def rewriteSnapshot(baseVersion: Option[Int], df: DataFrame): Int = {
    val base = baseVersion.map(entriesOf).getOrElse(Seq.empty)
    val newFiles = newEntries(writeDataFiles(df))
    commitDelta(base, base.map(_.rel).toSet, newFiles,
      conflictsWith = _ => true)
  }

  /** L2: replace exactly one partition (dynamic partition overwrite).
    * `value = null` replaces the hive default (null) partition — the
    * filter must be null-aware or zero new files would be written
    * while the old null-partition files are dropped (silent data loss).
    */
  def overwritePartition(df: DataFrame, value: String): Int = {
    if (partCols.isEmpty)
      throw new IllegalStateException("table is not partitioned")
    require(partCols.size == 1,
      s"table partitions on (${partCols.mkString(", ")}); " +
        "use overwritePartitionValues with the full tuple")
    overwritePartitionValues(df, Seq(value))
  }

  /** Multi-column form of [[overwritePartition]]: replace exactly one
    * (c1=v1, c2=v2, …) sub-partition. `values` align with the table's
    * partition columns outermost-first; nulls address the hive default
    * partition on that level.
    */
  def overwritePartitionValues(df: DataFrame, values: Seq[String]): Int = {
    if (partCols.isEmpty)
      throw new IllegalStateException("table is not partitioned")
    require(values.size == partCols.size,
      s"expected ${partCols.size} partition values (${partCols.mkString(", ")}), " +
        s"got ${values.size}")
    // transformed tables address sub-partitions by the DERIVED value
    // (e.g. '2024-01-02' for days(ts)); the slice filter derives it
    // from the source column, so user frames need no hidden columns
    val slice = df.filter(partCols.zip(values).map { case (c, v) =>
      val pv = partValueExpr(df, c)
      if (v == null) pv.isNull else pv.cast("string") === lit(v)
    }.reduce(_ && _))
    val base = latestVersion.map(entriesOf).getOrElse(Seq.empty)
    // path-exact contract (checked BEFORE any data write): every live
    // file must carry the CURRENT layout's segments, or the target
    // tuple cannot be matched against it. After a lazy
    // setPartitionSpec, files of the old spec refuse loudly (a silent
    // carry-forward would leave their rows of the replaced tuple
    // alive — duplication on the very next read)
    val foreign = base.filter(e =>
      ManifestTable.layoutColsOf(e.rel) != partCols)
    require(foreign.isEmpty,
      s"overwritePartitionValues: ${foreign.size} file(s) predate the " +
        s"current partition spec (e.g. ${foreign.headOption.map(_.rel).getOrElse("")}); " +
        "compact() or evolvePartitionSpec to migrate the layout first, " +
        "or use merge/delete which scope per-spec")
    val newFiles = newEntries(writeDataFiles(enforced(slice)))
    def inPart(e: Entry): Boolean =
      partCols.zip(values).forall { case (c, v) => inPartition(e.rel, c, v) }
    // partition-scoped delta: concurrent commits to OTHER partitions
    // rebase cleanly; a concurrent touch of THIS partition conflicts
    stampCdcFileDiff(commitDelta(base,
      base.filter(inPart).map(_.rel).toSet,
      newFiles, conflictsWith = inPart))
  }

  /** Hive-style partition directory segment for a value — Spark escapes
    * special chars (space, ':', '%', …) via `escapePathName` when
    * writing `col=value/` dirs, so file matching must escape the same
    * way or non-URL-safe values silently miss their files. A NULL
    * partition value lands in the hive default-partition directory.
    */
  private def partSegment(c: String, value: String): String = {
    val esc =
      if (value == null)
        org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .DEFAULT_PARTITION_NAME
      else
        org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .escapePathName(value)
    s"$c=$esc"
  }

  /** True when relative file path `f` lives in partition `c=value`. Path
    * segment equality, not substring — `date=2024-06-1` must not match
    * `date=2024-06-10/`.
    */
  private def inPartition(f: String, c: String, value: String): Boolean =
    f.split("/").contains(partSegment(c, value))

  /** L1: MERGE INTO — keyed upsert, source-wins, idempotent, with
    * optional delete tombstones (`deleteCol`: boolean column present in
    * `updates` but not the table; matched keys with it true are
    * removed). When the table is partitioned only touched partitions
    * are rewritten; all other files carry forward by reference (no data
    * movement). A partition is touched if the feed changes rows in it
    * OR holds the current row of any fed key — so an update that moves
    * a key to a new partition value rewrites BOTH partitions and leaves
    * no stale copy behind. Returns the new version, or the current one
    * when the merge is a no-op (re-applying an already-applied feed
    * commits nothing).
    */
  def merge(updates0: DataFrame, keys: Seq[String],
      deleteCol: Option[String] = None): Int = {
    requireNoReservedCols(updates0, "merge")
    // pin the snapshot: every read below (base rows, touched scan,
    // carried entries) must see ONE version, and the commit is a delta
    // against exactly that version so concurrent disjoint writers rebase
    val v0 = latestVersion.getOrElse(
      throw new IllegalStateException(s"no versions at $root"))
    // a merge source may omit generated columns — compute them on both
    // sides so the schema contract and the change detection line up.
    // The tombstone flag (not a table column) rides along untouched:
    // generated expressions only reference table columns.
    val updates = withGenerated(updates0)
    // identity columns are DERIVED (start + step * row id) and the feed
    // can never carry them — merge over the identity-free frame; values
    // re-derive from the preserved row ids (attachRowIds) on read
    val base = withGenerated(read(Some(v0)))
      .drop(identityColumns.keys.toSeq: _*)
    def resolve(b: DataFrame, u: DataFrame): DataFrame = deleteCol match {
      case Some(d) => Merge.applyCdc(b, u, keys, d)
      case None => Merge.upsert(b, u, keys)
    }
    val upserts = deleteCol.fold(updates)(d =>
      updates.filter(!coalesce(col(d), lit(false))).drop(d))
    val deletes = deleteCol.map(d => updates.filter(coalesce(col(d), lit(false))))
    // cache: the exceptAll against the full base is the merge's most
    // expensive shuffle, and it feeds the no-op check, changedKeys, AND
    // the touched-partition scan — uncached it would run three times
    val upsertDelta = Merge.effectiveChanges(base, upserts).cache()
    try {
    val deleteHits = deletes.map(_.select(keys.map(col): _*).distinct()
      .join(base, keys, "left_semi"))
    val noop = upsertDelta.isEmpty && deleteHits.forall(_.isEmpty)
    if (noop) return latestVersion.get
    if (partCols.nonEmpty) {
        // touched = partition TUPLES the changed rows land in ∪ tuples
        // currently holding any CHANGED key (covers deletes + partition
        // moves). Keys come from upsertDelta + tombstones, NOT the raw
        // feed: a largely no-op incremental feed must not rewrite every
        // partition that merely contains a fed-but-unchanged key.
        val changedKeys = {
          val uk = upsertDelta.select(keys.map(col): _*)
          deletes.fold(uk)(d => uk.union(d.select(keys.map(col): _*))).distinct()
        }
        // cached: tuplesFor runs one tuple-projection job PER layout
        // signature (two right after a lazy spec evolution), and each
        // would otherwise recompute this base-wide semi-join
        val currentOfFed = base.join(changedKeys, keys, "left_semi").cache()
        try {
        val baseEntries = entriesOf(v0)
        // PER LAYOUT SIGNATURE: after a lazy setPartitionSpec the
        // snapshot mixes files from different specs, and each file must
        // be scoped by the tuple ITS OWN path carries — touched tuples
        // are computed under every signature present (usually one, two
        // right after an evolution), and a file is removed iff its own
        // signature's tuple is touched. All rows of a hive-partitioned
        // file share its dir tuple, so rewriting EXACTLY the removed
        // files' rows (readEntries below) both carries every untouched
        // row and migrates rewritten rows to the current layout.
        val signatures = (baseEntries.map(e =>
          ManifestTable.layoutColsOf(e.rel)).toSet + partCols).toSeq
        def tuplesFor(sig: Seq[String]): Set[Seq[String]] =
          if (sig.isEmpty) Set(Seq.empty) // legacy unpartitioned files
          else {
            def tupleOf(df: DataFrame) =
              df.select(sig.map(c =>
                partValueExprFor(df, c).cast("string")): _*)
            tupleOf(upsertDelta)
              .union(tupleOf(currentOfFed))
              .distinct()
              .collect() // bounded: distinct touched partition tuples
              .map(r => sig.indices.map(i =>
                if (r.isNullAt(i)) null else r.getString(i)): Seq[String])
              .toSet
          }
        val touchedBySig = scala.collection.mutable.Map(
          signatures.map(s => s -> tuplesFor(s)): _*)
        def inTouchedPartition(e: Entry): Boolean = {
          val sig = ManifestTable.layoutColsOf(e.rel)
          // getOrElseUpdate: a concurrent writer's new files can carry
          // a signature the base snapshot didn't (it evolved the spec
          // mid-flight); computed once, before upsertDelta unpersists
          touchedBySig.getOrElseUpdate(sig, tuplesFor(sig)).exists(t =>
            sig.zip(t).forall { case (c, v) => inPartition(e.rel, c, v) })
        }
        val removed = baseEntries.filter(inTouchedPartition)
        // NULL is a legal partition value on any level (hive default
        // partition): each tuple predicate tests it explicitly — an
        // equality/isin would never match and rows landing in / moving
        // out of the null partition would be silently dropped
        // derived-value comparisons resolve source types against the
        // base schema (updates must be merge-compatible with it anyway)
        def tuplePred(df: DataFrame, sig: Seq[String], t: Seq[String]): Column =
          sig.zip(t).map { case (c, v) =>
            val pv = partValueExprFor(df, c)
            if (v == null) pv.isNull else pv.cast("string") === lit(v)
          }.reduce(_ && _)
        def inTouchedAny(df: DataFrame): Column =
          touchedBySig.toSeq.flatMap { case (sig, ts) =>
            if (sig.isEmpty) Nil else ts.toSeq.map(tuplePred(df, sig, _))
          }.reduceOption(_ || _).getOrElse(lit(false))
        // the rewrite set = exactly the removed files' rows (their
        // untouched-under-the-current-spec rows must be carried too —
        // an old coarser partition rewrites whole); resolve() keeps
        // base rows whose keys the feed doesn't change. An insert-only
        // merge into fresh partitions removes nothing — filter(false)
        // keeps the schema where readEntries(Nil) could not
        val touchedBase =
          if (removed.isEmpty) base.filter(lit(false))
          else withGenerated(withDeclared(readEntries(removed)))
        // tombstones bypass the partition filter: they match by KEY and
        // their own partition-column values may not reflect the base row's
        val touchedUpdates = deleteCol match {
          case Some(d) =>
            updates.filter(coalesce(col(d), lit(false)) || inTouchedAny(updates))
          case None => updates.filter(inTouchedAny(updates))
        }
        val merged = attachRowIds(
          resolve(touchedBase, touchedUpdates), removed, keys)
        val newFiles = newEntries(writeDataFiles(enforced(merged)))
        // delta = rewrite of the touched partitions only: a concurrent
        // merge/append to OTHER partitions rebases and both commits
        // land; concurrent changes inside a touched partition conflict
        stampCdcFileDiff(commitDelta(baseEntries, removed.map(_.rel).toSet,
          newFiles, conflictsWith = inTouchedPartition))
        } finally currentOfFed.unpersist()
    } else {
        stampCdcFileDiff(rewriteSnapshot(Some(v0), enforced(
          attachRowIds(resolve(base, updates), entriesOf(v0), keys))))
    }
    } finally upsertDelta.unpersist()
  }

  /** T16: re-attach stable row ids to a merge's rewritten rows — each
    * result row inherits the id of the base row holding its key (the
    * Delta row-tracking MERGE contract: an upsert changes values, not
    * identity); fresh keys read NULL here and draw new ids from the
    * written file's base allotment. One keyed null-safe left join
    * against a (keys, id) projection of just the rewritten files —
    * parquet prunes the projection to the key columns.
    */
  private def attachRowIds(merged: DataFrame, idEntries: Seq[Entry],
      keys: Seq[String]): DataFrame = {
    if (idEntries.isEmpty) return merged
    // ONE id per key, and only for keys the target held EXACTLY once:
    // nothing guarantees target-key uniqueness (keptTargets tolerates
    // duplicates), and an un-deduplicated projection would MULTIPLY
    // result rows through the join — silent row duplication — while a
    // duplicate key's identity is genuinely ambiguous, so those rows
    // draw fresh ids instead (honest degradation, cardinality intact)
    val proj = withDeclared(readEntriesRid(idEntries))
      .groupBy(keys.map(c => col(c).as(s"__graft_idk_$c")): _*)
      .agg(min(col(ManifestTable.RowIdCol)).as("__graft_idv"),
        count(lit(1)).as("__graft_idn"))
      .select(keys.map(c => col(s"__graft_idk_$c")) :+
        when(col("__graft_idn") === 1, col("__graft_idv"))
          .as(ManifestTable.RidPhysCol): _*)
    val cond = keys.map(k => col(k) <=> col(s"__graft_idk_$k")).reduce(_ && _)
    merged.join(proj, cond, "left")
      .drop(keys.map("__graft_idk_" + _): _*)
  }

  // ---------------------------------------------------------------- //
  // L17: CHECK constraints — persisted table-level data-quality gates //
  // ---------------------------------------------------------------- //

  private val constraintsPath = new Path(logDir, "constraints")

  /** Registry mutations and reads serialize through a per-root lock
    * (separate from the commit lock — registry ops may run Spark jobs
    * and must not stall manifest commits): the write is
    * delete-then-rename, and an unserialized reader in that gap would
    * see an EMPTY registry and let a violating commit through, while
    * two unserialized read-modify-writes would silently drop one
    * writer's constraint. Cross-process writers on a local FS retain
    * the same tiny window tryCommit documents.
    */
  // ---------------------------------------------------------------- //
  // Column mapping — RENAME COLUMN without rewriting a byte (the      //
  // Delta column-mapping model): data files keep their original       //
  // PHYSICAL names forever; a log-dir sidecar maps physical→logical.  //
  // Scans rename physical→logical on the way out, writers rename      //
  // logical→physical on the way in, and stats/bloom keys (recorded    //
  // physical) translate at the API boundary.                          //
  // ---------------------------------------------------------------- //

  private val columnMappingPath = new Path(logDir, "column_mapping")
  private def mappingLock: Object =
    ManifestTable.lockFor(fs.makeQualified(logDir).toString + "#colmap")

  /** Current physical→logical mapping (empty = no renames ever). Read
    * fresh per use, like the constraint registry, so every instance on
    * this root sees renames immediately. */
  def columnMapping: Map[String, String] = mappingLock.synchronized {
    if (!fs.exists(columnMappingPath)) return Map.empty
    val in = fs.open(columnMappingPath)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.nonEmpty).map { l =>
        val i = l.indexOf('\t')
        Entry.dec(l.substring(0, i)) -> Entry.dec(l.substring(i + 1))
      }.toMap
    finally in.close()
  }

  private def toPhysical(logical: String): String = {
    val m = columnMapping
    // a stale (pre-rename) name must refuse loudly, not silently hit
    // its still-matching physical stats key while the scan resolves
    // nothing
    m.get(logical).filter(_ != logical).foreach { cur =>
      throw new IllegalArgumentException(
        s"column $logical was renamed to $cur")
    }
    m.collectFirst { case (p, l) if l == logical => p }.getOrElse(logical)
  }

  private def toLogicalRename(df: DataFrame): DataFrame = {
    // dropped physical storage never surfaces — hidden BEFORE the
    // rename fold so a dropped column can never shadow a re-added
    // logical name riding a fresh physical id
    val dropped = droppedColumns
    val hit = df.columns.filter(dropped.contains)
    val d0 = if (hit.isEmpty) df else df.drop(hit.toIndexedSeq: _*)
    val m = columnMapping
    if (m.isEmpty) d0
    else m.foldLeft(d0) { case (d, (p, l)) =>
      if (p != l && d.columns.contains(p)) d.withColumnRenamed(p, l) else d
    }
  }

  private def toPhysicalRename(df: DataFrame): DataFrame = {
    val m = columnMapping
    if (m.isEmpty) df
    else m.foldLeft(df) { case (d, (p, l)) =>
      if (p != l && d.columns.contains(l)) d.withColumnRenamed(l, p) else d
    }
  }

  /** ALTER TABLE RENAME COLUMN — metadata-only: no data file is
    * touched; the next scan surfaces the new name. Partition columns
    * (identity or transform source) refuse — their names are baked
    * into hive paths and derived layouts — as does a column referenced
    * by a CHECK constraint (every later write would fail to resolve
    * the constraint, the Delta restriction). The new name must not
    * collide with any current logical OR physical column. Active
    * streams tailing this table pin the pre-rename schema; restart
    * them to pick up the new name.
    */
  def renameColumn(oldName: String, newName: String): Unit = {
    require(oldName != newName, "rename to the same name")
    require(!identityColumns.contains(oldName),
      s"cannot rename identity column $oldName — it is derived, not " +
        "stored; drop and re-add under the new name")
    val referencing = constraints.filter { case (_, s) =>
      try spark.sessionState.sqlParser.parseExpression(s)
        .collect { case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute => a.name }
        .contains(oldName)
      catch { case _: Exception => s.contains(oldName) } // conservative
    }
    require(referencing.isEmpty,
      s"cannot rename $oldName: referenced by CHECK constraint(s) " +
        s"${referencing.keys.mkString(", ")} — drop them first")
    // generated columns pin names on BOTH sides: renaming a column a
    // generated expression reads breaks every later write's resolution
    // of the stored SQL, and renaming the generated column itself
    // would make withGenerated re-add the old name (duplicate physical
    // column). Delta blocks both; so do we.
    val gen = generatedColumns
    require(!gen.contains(oldName),
      s"cannot rename generated column $oldName — drop the generated " +
        "column first")
    val genReferencing = gen.filter { case (_, s) =>
      try spark.sessionState.sqlParser.parseExpression(s)
        .collect { case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute => a.name }
        .contains(oldName)
      catch { case _: Exception => s.contains(oldName) } // conservative
    }
    require(genReferencing.isEmpty,
      s"cannot rename $oldName: referenced by generated column(s) " +
        s"${genReferencing.keys.mkString(", ")} — drop them first")
    // declared (catalog-added) columns live in the sidecar by name —
    // the column-mapping rename path only translates FILE columns, so
    // a renamed declared column would silently split identities
    require(!declaredColumns.fieldNames.contains(oldName),
      s"cannot rename declared column $oldName — deprecate and re-add " +
        "under the new name instead")
    require(!identityPartCols.contains(toPhysical(oldName))
      && !transforms.exists(_.src == toPhysical(oldName)),
      s"cannot rename partition column $oldName (hive paths and derived " +
        "layouts carry its name)")
    val logicalCols = read().columns.toSet
    require(logicalCols.contains(oldName), s"no column $oldName " +
      s"(have: ${logicalCols.toSeq.sorted.mkString(", ")})")
    val m = columnMapping
    require(!logicalCols.contains(newName) && !m.keys.exists(_ == newName)
      && toPhysical(newName) == newName,
      s"column $newName already exists (logically or physically)")
    val physical = toPhysical(oldName)
    mappingLock.synchronized {
      writeMapping(columnMapping + (physical -> newName))
    }
  }

  private def writeMapping(updated: Map[String, String]): Unit = {
    fs.mkdirs(logDir)
    val tmp = new Path(logDir, s".tmp-colmap-${UUID.randomUUID()}")
    val out = fs.create(tmp, false)
    try out.write(updated.toSeq.sortBy(_._1).map { case (p, l) =>
      s"${Entry.enc(p)}\t${Entry.enc(l)}"
    }.mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    if (fs.exists(columnMappingPath)) fs.delete(columnMappingPath, false)
    if (!fs.rename(tmp, columnMappingPath))
      throw new IllegalStateException("column_mapping update failed")
  }

  // ---------------------------------------------------------------- //
  // True DROP COLUMN under column mapping (Delta's column-mapping     //
  // drop): metadata-only — the physical column stays in existing      //
  // files but is hidden from every read surface; rewrites (merge,     //
  // compaction, purge) copy only visible columns, so the data         //
  // physically ages out with churn. A re-added column of the same     //
  // logical name gets a FRESH physical id, so old values can never    //
  // resurrect. This is the hard delete next to deprecateColumns'      //
  // Glue-policy soft delete.                                          //
  // ---------------------------------------------------------------- //

  private val droppedPath = new Path(logDir, "dropped_columns")

  /** Dropped PHYSICAL column names → the logical name they carried at
    * drop time (for messages). Read fresh per use, like the mapping.
    */
  def droppedColumns: Map[String, String] = mappingLock.synchronized {
    if (!fs.exists(droppedPath)) return Map.empty
    val in = fs.open(droppedPath)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.nonEmpty).map { l =>
        val i = l.indexOf('\t')
        Entry.dec(l.substring(0, i)) -> Entry.dec(l.substring(i + 1))
      }.toMap
    finally in.close()
  }

  private def writeDropped(updated: Map[String, String]): Unit = {
    fs.mkdirs(logDir)
    val tmp = new Path(logDir, s".tmp-dropped-${UUID.randomUUID()}")
    val out = fs.create(tmp, false)
    try out.write(updated.toSeq.sortBy(_._1).map { case (p, l) =>
      s"${Entry.enc(p)}\t${Entry.enc(l)}"
    }.mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    if (fs.exists(droppedPath)) fs.delete(droppedPath, false)
    if (!fs.rename(tmp, droppedPath))
      throw new IllegalStateException("dropped_columns update failed")
  }

  /** The physical storage name a logical column resolves to — the
    * mapping inverse without [[toPhysical]]'s stale-name refusal.
    */
  private def physicalNameOf(logical: String): String =
    columnMapping.collectFirst {
      case (p, l) if l == logical => p
    }.getOrElse(logical)

  /** ALTER TABLE DROP COLUMN — metadata-only via column mapping: no
    * file is touched; the column's physical storage is recorded in the
    * `dropped_columns` sidecar and every read surface hides it from
    * now on (ALL versions, like renames — sidecars are table-global,
    * readers key on paths). Refuses the same lattice as rename
    * (partition source, CHECK-referenced, generated, configured
    * stats/bloom columns) plus the last visible column. Like rename,
    * the drop applies to time-travel reads too, and active streams pin
    * their pre-drop schema until restarted.
    */
  def dropColumn(name: String): Unit = {
    require(name != ManifestTable.RidPhysCol && name != ManifestTable.RowIdCol,
      s"$name is engine-reserved")
    require(!identityColumns.contains(name),
      s"$name is an identity column (derived, not stored) — " +
        "dropIdentityColumn instead")
    val referencing = constraints.filter { case (_, s) =>
      try spark.sessionState.sqlParser.parseExpression(s)
        .collect { case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute => a.name }
        .contains(name)
      catch { case _: Exception => s.contains(name) } // conservative
    }
    require(referencing.isEmpty,
      s"cannot drop $name: referenced by CHECK constraint(s) " +
        s"${referencing.keys.mkString(", ")} — drop them first")
    val gen = generatedColumns
    require(!gen.contains(name),
      s"cannot drop generated column $name — " +
        "dropGeneratedColumn first")
    val genReferencing = gen.filter { case (_, s) =>
      try spark.sessionState.sqlParser.parseExpression(s)
        .collect { case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute => a.name }
        .contains(name)
      catch { case _: Exception => s.contains(name) } // conservative
    }
    require(genReferencing.isEmpty,
      s"cannot drop $name: referenced by generated column(s) " +
        s"${genReferencing.keys.mkString(", ")} — drop them first")
    val physical = physicalNameOf(name)
    require(!identityPartCols.contains(physical)
      && !transforms.exists(_.src == physical),
      s"cannot drop partition column $name (hive paths and derived " +
        "layouts carry its name)")
    require(!allStatsCols.contains(physical) && !bloomCol.contains(physical),
      s"cannot drop $name: it is a configured stats/bloom column — " +
        "maintenance jobs key on it; reconfigure the table first")
    declaredLock.synchronized {
      mappingLock.synchronized {
        val declared = declaredColumns
        val isDeclared = declared.fieldNames.contains(name)
        val visible =
          if (latestVersion.isDefined) read().columns.toSet
          else declared.fieldNames.toSet
        require(visible.contains(name) || isDeclared,
          s"no column $name (have: ${visible.toSeq.sorted.mkString(", ")})")
        require((visible - name).nonEmpty,
          s"cannot drop $name: it is the table's last visible column")
        // hide the physical storage; forget any rename pointing at it
        writeDropped(droppedColumns + (physical -> name))
        if (columnMapping.contains(physical))
          writeMapping(columnMapping - physical)
        // a declared entry (including a DEFAULT or deprecation marker)
        // goes entirely — this is DROP, not DEPRECATE
        if (isDeclared) writeDeclared(
          StructType(declared.fields.filterNot(_.name == name)))
      }
    }
  }

  // ---------------------------------------------------------------- //
  // Generated columns (Delta GENERATED ALWAYS AS): registered          //
  // expressions every writer either COMPUTES (column absent from the  //
  // incoming frame) or VALIDATES in-job (column present — a value     //
  // disagreeing with the expression fails the write, so a generated   //
  // column can never silently drift from its definition).             //
  // ---------------------------------------------------------------- //

  private val generatedPath = new Path(logDir, "generated_columns")
  private def generatedLock: Object =
    ManifestTable.lockFor(fs.makeQualified(logDir).toString + "#generated")

  /** Registered generated columns: name → SQL expression (over the
    * table's other columns). Read fresh per use, like constraints. */
  def generatedColumns: Map[String, String] = generatedLock.synchronized {
    if (!fs.exists(generatedPath)) return Map.empty
    val in = fs.open(generatedPath)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.nonEmpty).map { l =>
        val i = l.indexOf('\t')
        Entry.dec(l.substring(0, i)) -> Entry.dec(l.substring(i + 1))
      }.toMap
    finally in.close()
  }

  /** Register `name` as GENERATED ALWAYS AS (`sqlExpr`). Old files
    * simply lack the column (mergeSchema null-fills on read); every
    * write from now on carries it. */
  def addGeneratedColumn(name: String, sqlExpr: String): Unit = {
    require(name.nonEmpty && sqlExpr.nonEmpty, "generated column needs name + expr")
    spark.sessionState.sqlParser.parseExpression(sqlExpr) // fail fast on syntax
    generatedLock.synchronized {
      writeGenerated(generatedColumns + (name -> sqlExpr))
    }
  }

  def dropGeneratedColumn(name: String): Unit = generatedLock.synchronized {
    writeGenerated(generatedColumns - name)
  }

  private def writeGenerated(m: Map[String, String]): Unit = {
    fs.mkdirs(logDir)
    val tmp = new Path(logDir, s".tmp-gen-${UUID.randomUUID()}")
    val out = fs.create(tmp, false)
    try out.write(m.toSeq.sortBy(_._1).map { case (n, s) =>
      s"${Entry.enc(n)}\t${Entry.enc(s)}"
    }.mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    if (fs.exists(generatedPath)) fs.delete(generatedPath, false)
    if (!fs.rename(tmp, generatedPath))
      throw new IllegalStateException("generated_columns update failed")
  }

  /** Compute absent / validate present generated columns. Validation
    * rides the write job itself (one evaluation, assert_true filter —
    * the same no-TOCTOU shape as CHECK enforcement; the guard wraps
    * the ROW, never inlines into per-column expressions). */
  private def withGenerated(df: DataFrame): DataFrame =
    generatedColumns.foldLeft(df) { case (d, (name, sqlExpr)) =>
      if (!d.columns.contains(name)) d.withColumn(name, expr(sqlExpr))
      else d
        // NULL backfills (pre-registration rows null-fill on rewrite;
        // an explicit NULL means "compute it", the Delta semantics)
        .withColumn(name,
          when(col(name).isNull, expr(sqlExpr)).otherwise(col(name)))
        .filter(assert_true(
          col(name) <=> expr(sqlExpr),
          lit(s"generated column $name must equal $sqlExpr")).isNull)
    }

  // ---------------------------------------------------------------- //
  // Declared schema evolution (S7 as SQL): ALTER-style ADD COLUMNS    //
  // plus the Glue crawler SchemaChangePolicy                          //
  // (/root/reference/glue_infra.py:101-104) on manifest tables —      //
  // UPDATE_IN_DATABASE: added columns surface immediately (null for   //
  // files that predate them, real data once writes carry them);       //
  // DEPRECATE_IN_DATABASE: columns are never dropped, only flagged.   //
  // ---------------------------------------------------------------- //

  private val declaredPath = new Path(logDir, "declared_columns")
  private def declaredLock: Object =
    ManifestTable.lockFor(fs.makeQualified(logDir).toString + "#declared")

  /** Catalog-declared columns (added via [[addColumns]]) + deprecation
    * flags, as a StructType JSON sidecar. Field metadata key
    * "deprecated" marks soft-deleted columns (the SchemaRegistry
    * convention).
    */
  def declaredColumns: StructType = declaredLock.synchronized {
    if (!fs.exists(declaredPath)) new StructType()
    else {
      val in = fs.open(declaredPath)
      try org.apache.spark.sql.types.DataType.fromJson(
        scala.io.Source.fromInputStream(in, "UTF-8").mkString)
        .asInstanceOf[StructType]
      finally in.close()
    }
  }

  /** Bootstrap schema declaration — CREATE TABLE's contract that an
    * EMPTY table still reads (and accepts INSERTs) with its full
    * schema: a partitioned empty write lands zero parquet files, so
    * without a declaration the scan would surface zero columns.
    * Merges with any existing declaration (idempotent re-create).
    */
  def declareSchema(st: StructType): Unit = {
    val cur = declaredColumns
    val have = cur.fieldNames.toSet
    val merged = StructType(
      cur.fields ++ st.fields.filterNot(f => have.contains(f.name)))
    writeDeclared(merged)
  }

  private def writeDeclared(st: StructType): Unit = {
    fs.mkdirs(logDir)
    val tmp = new Path(logDir, s".tmp-declared-${UUID.randomUUID()}")
    val out = fs.create(tmp, false)
    try out.write(st.json.getBytes("UTF-8")) finally out.close()
    if (fs.exists(declaredPath)) fs.delete(declaredPath, false)
    if (!fs.rename(tmp, declaredPath))
      throw new IllegalStateException("declared_columns update failed")
  }

  private def isDeprecatedField(f: org.apache.spark.sql.types.StructField): Boolean =
    f.metadata.contains("deprecated") && f.metadata.getBoolean("deprecated")

  private def deprecateField(
      f: org.apache.spark.sql.types.StructField): org.apache.spark.sql.types.StructField =
    f.copy(metadata = new org.apache.spark.sql.types.MetadataBuilder()
      .withMetadata(f.metadata).putBoolean("deprecated", true).build())

  /** ALTER TABLE ADD COLUMNS — metadata-only: `ddl` is a Spark DDL
    * column list ("c1 BIGINT, c2 STRING"). Added columns surface on
    * every read immediately (typed NULL until a write carries data —
    * mergeSchema then takes over file-by-file). Refuses names that
    * collide with live columns, with the PHYSICAL name of a renamed
    * column (a file written with that name would be re-renamed by the
    * mapping and duplicate the logical column), or with the hidden
    * layout prefix.
    */
  def addColumns(ddl: String): Unit = {
    val add = StructType.fromDDL(ddl)
    require(add.nonEmpty, "addColumns: empty column list")
    addDeclaredFields(add.fields.toSeq)
  }

  /** L40: ALTER TABLE ADD COLUMN ... DEFAULT — metadata-only like
    * [[addColumns]], plus a stored DEFAULT applied to every row that
    * PREDATES the column: declared-only reads surface the default
    * (not NULL), and once later writes materialize the column
    * file-by-file, files lacking it keep reading the default through
    * the parquet reader's existence-default slot (Spark's
    * EXISTS_DEFAULT field metadata) while explicit NULLs written to
    * newer files stay NULL — the Delta/Iceberg column-DEFAULT
    * contract, so downstream non-null expectations don't break on
    * legacy rows. The expression is evaluated ONCE here and stored as
    * a literal (Delta's materialize-at-ALTER semantics); column
    * references refuse — a default is a constant.
    */
  def addColumnWithDefault(name: String, typeDdl: String,
      defaultSql: String): Unit = {
    val dt = StructType.fromDDL(s"`$name` $typeDdl").fields.head.dataType
    val parsed = spark.sessionState.sqlParser.parseExpression(defaultSql)
    require(!parsed.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute]),
      s"DEFAULT for $name references columns — a column default must " +
        "be a constant expression")
    val v = spark.range(1).select(expr(defaultSql).cast(dt)).head().get(0)
    val litSql = org.apache.spark.sql.catalyst.expressions.Literal
      .create(v, dt).sql
    addDeclaredFields(Seq(org.apache.spark.sql.types.StructField(
      name, dt, nullable = true,
      new org.apache.spark.sql.types.MetadataBuilder()
        .putString(ManifestTable.DefaultKey, litSql).build())))
  }

  private def addDeclaredFields(
      fields: Seq[org.apache.spark.sql.types.StructField]): Unit =
    declaredLock.synchronized {
      val cur = declaredColumns
      val logical: Set[String] =
        if (latestVersion.isDefined) read().columns.toSet else Set.empty
      fields.foreach { f =>
        require(!logical.contains(f.name) && !cur.fieldNames.contains(f.name),
          s"addColumns: column ${f.name} already exists")
        require(!columnMapping.contains(f.name),
          s"addColumns: ${f.name} is the physical name of a renamed " +
            s"column (→ ${columnMapping(f.name)}); choose another name")
        require(!f.name.startsWith(PartitionTransform.Prefix),
          s"addColumns: ${f.name} collides with the hidden layout prefix")
      }
      // RE-ADD after DROP: a name whose physical storage was dropped
      // gets a FRESH physical id (a rename mapping minted up front) —
      // writes land under the new id, so old files' values can never
      // resurrect; files predating the re-add read NULL (or the
      // declared DEFAULT)
      mappingLock.synchronized {
        val dropped = droppedColumns
        val mints = fields.map(_.name).filter(dropped.contains).map { n =>
          s"${n}_${UUID.randomUUID().toString.take(8)}" -> n
        }
        if (mints.nonEmpty) writeMapping(columnMapping ++ mints)
      }
      writeDeclared(StructType(cur.fields ++ fields))
    }

  // ---------------------------------------------------------------- //
  // Identity columns (GENERATED ALWAYS AS IDENTITY): values DERIVE    //
  // from the T16 stable row id — `start + step * _row_id` — so the    //
  // collision-free commit-time allocator (version bands + persisted   //
  // watermark) IS the identity allocator: unique and monotonically    //
  // advancing across appends, merges, concurrent commits, restore     //
  // and clone, with zero write-path coordination. Values are sparse   //
  // (gaps between commits — the Delta identity contract allows gaps); //
  // they survive rewrites because row ids do (materialized            //
  // [[ManifestTable.RidPhysCol]] in copies). GENERATED ALWAYS: user   //
  // frames carrying the column refuse at every public write surface.  //
  // ---------------------------------------------------------------- //

  private val identityPath = new Path(logDir, "identity_columns")
  private def identityLock: Object =
    ManifestTable.lockFor(fs.makeQualified(logDir).toString + "#identity")

  /** Registered identity columns: name → (start, step). Read fresh per
    * use, like the mapping/constraint sidecars.
    */
  def identityColumns: Map[String, (Long, Long)] = identityLock.synchronized {
    if (!fs.exists(identityPath)) return Map.empty
    val in = fs.open(identityPath)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.nonEmpty).map { l =>
        val Array(n, s, k) = l.split('\t')
        Entry.dec(n) -> (s.toLong, k.toLong)
      }.toMap
    finally in.close()
  }

  /** Register `name` as GENERATED ALWAYS AS IDENTITY (START WITH
    * `start` INCREMENT BY `step`). Metadata-only: every read from now
    * on surfaces the column as `start + step * row_id`. Rows whose
    * files predate row tracking read NULL — `CALL
    * graft.backfill_row_ids` (one governed rewrite) adopts them.
    */
  def addIdentityColumn(name: String, start: Long = 1L,
      step: Long = 1L): Unit = {
    require(step != 0L, "identity step must be non-zero")
    require(name != ManifestTable.RidPhysCol && name != ManifestTable.RowIdCol,
      s"$name is engine-reserved")
    require(!name.startsWith(PartitionTransform.Prefix),
      s"$name collides with the hidden layout prefix")
    identityLock.synchronized {
      val visible =
        if (latestVersion.isDefined) read().columns.toSet
        else declaredColumns.fieldNames.toSet
      require(!visible.contains(name) && !declaredColumns.fieldNames
        .contains(name) && !identityColumns.contains(name),
        s"addIdentityColumn: column $name already exists")
      writeIdentity(identityColumns + (name -> (start, step)))
    }
  }

  def dropIdentityColumn(name: String): Unit = identityLock.synchronized {
    writeIdentity(identityColumns - name)
  }

  private def writeIdentity(m: Map[String, (Long, Long)]): Unit = {
    fs.mkdirs(logDir)
    val tmp = new Path(logDir, s".tmp-identity-${UUID.randomUUID()}")
    val out = fs.create(tmp, false)
    try out.write(m.toSeq.sortBy(_._1).map { case (n, (s, k)) =>
      s"${Entry.enc(n)}\t$s\t$k"
    }.mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    if (fs.exists(identityPath)) fs.delete(identityPath, false)
    if (!fs.rename(tmp, identityPath))
      throw new IllegalStateException("identity_columns update failed")
  }

  /** Surface registered identity columns on a rid-carrying frame. */
  private def withIdentityCols(df: DataFrame,
      ids: Map[String, (Long, Long)]): DataFrame =
    ids.toSeq.sortBy(_._1).foldLeft(df) { case (d, (n, (s, k))) =>
      d.withColumn(n, lit(s) + lit(k) * col(ManifestTable.RowIdCol))
    }

  /** DEPRECATE columns — the Glue DeleteBehavior: data is never
    * dropped; declared-only columns stop surfacing in reads (they hold
    * no data anywhere), file-backed columns keep reading — rewrites,
    * merges, and time travel all preserve them — but carry the flag in
    * [[describeSchema]], exactly the catalog-level soft delete the
    * reference's DEPRECATE_IN_DATABASE policy specifies.
    */
  def deprecateColumns(names: Seq[String]): Unit = {
    require(names.nonEmpty, "deprecateColumns: empty column list")
    declaredLock.synchronized {
      val cur = declaredColumns
      val logicalTypes: Map[String, org.apache.spark.sql.types.DataType] =
        if (latestVersion.isDefined)
          read().schema.fields.map(f => f.name -> f.dataType).toMap
        else Map.empty
      val updated = names.foldLeft(cur) { (st, n) =>
        if (st.fieldNames.contains(n))
          StructType(st.fields.map(f => if (f.name == n) deprecateField(f) else f))
        else logicalTypes.get(n) match {
          case Some(dt) => // marker entry for a file-backed column
            StructType(st.fields :+ deprecateField(
              org.apache.spark.sql.types.StructField(n, dt)))
          case None => throw new IllegalArgumentException(
            s"deprecateColumns: no column $n")
        }
      }
      writeDeclared(updated)
    }
  }

  /** The declared-schema view of reads: append every live declared
    * column missing from the scan as a typed NULL. Deprecated
    * declared-only columns stay hidden; deprecated FILE-backed columns
    * keep reading (data preserved — DEPRECATE, not DROP).
    */
  private def withDeclared(df: DataFrame): DataFrame = {
    val have = df.columns.toSet
    declaredColumns.fields
      .filterNot(f => have.contains(f.name) || isDeprecatedField(f))
      .foldLeft(df)((d, f) => d.withColumn(f.name,
        // L40: a declared DEFAULT surfaces instead of NULL for rows
        // predating the column (files HOLDING the column are the
        // readFiles existence-default case, not this one)
        ManifestTable.defaultOf(f)
          .map(sql => expr(sql).cast(f.dataType))
          .getOrElse(lit(null).cast(f.dataType))))
  }

  /** Declared columns carrying a DEFAULT, keyed by PHYSICAL name (the
    * name parquet files would hold) → the stored literal SQL.
    */
  private def declaredDefaults: Map[String, String] = {
    val defaulted = declaredColumns.fields
      .filter(_.metadata.contains(ManifestTable.DefaultKey))
    if (defaulted.isEmpty) Map.empty
    else {
      val m = columnMapping // ONE sidecar read, not one per field
      def phys(l: String): String =
        m.collectFirst { case (pn, ln) if ln == l => pn }.getOrElse(l)
      defaulted.map(f =>
        phys(f.name) -> f.metadata.getString(ManifestTable.DefaultKey)).toMap
    }
  }

  /** Amend a read schema so columns with a declared DEFAULT carry
    * Spark's EXISTS_DEFAULT metadata — the parquet readers then fill
    * the column for files LACKING it (rows predating the column) while
    * files holding it keep their stored values, explicit NULLs
    * included. None when no declared default touches the schema.
    */
  private def withExistenceDefaults(st: StructType,
      defaults: Map[String, String]): Option[StructType] = {
    if (defaults.isEmpty) return None
    var changed = false
    val fields = st.fields.map { f =>
      defaults.get(f.name) match {
        case Some(sql)
            if !f.metadata.contains(ManifestTable.ExistsDefaultKey) =>
          changed = true
          f.copy(metadata = new org.apache.spark.sql.types.MetadataBuilder()
            .withMetadata(f.metadata)
            .putString(ManifestTable.ExistsDefaultKey, sql).build())
        case _ => f
      }
    }
    if (changed) Some(StructType(fields)) else None
  }

  /** DESCRIBE SCHEMA — every column with its provenance and
    * deprecation flag: `source` = "declared" for columns the catalog
    * sidecar governs (added and/or deprecated through it), "data" for
    * plain file-backed columns. Deprecated declared-only columns are
    * hidden from reads but still listed here — the catalog remembers
    * them, per the DEPRECATE policy.
    */
  def describeSchema(): Seq[(String, String, String, Boolean)] = {
    val declared = declaredColumns
    val byName = declared.fields.map(f => f.name -> f).toMap
    val scan =
      if (latestVersion.isDefined) read().schema.fields.toSeq else Seq.empty
    val scanNames = scan.map(_.name).toSet
    val ids = identityColumns
    scan.map { f =>
      byName.get(f.name) match {
        case Some(d) =>
          (f.name, f.dataType.simpleString, "declared", isDeprecatedField(d))
        case None if ids.contains(f.name) =>
          (f.name, f.dataType.simpleString, "identity", false)
        case None => (f.name, f.dataType.simpleString, "data", false)
      }
    } ++ declared.fields.toSeq.filterNot(f => scanNames.contains(f.name)).map(f =>
      (f.name, f.dataType.simpleString, "declared", isDeprecatedField(f)))
  }

  private def constraintsLock: Object =
    ManifestTable.lockFor(
      fs.makeQualified(logDir).toString + "#constraints")

  /** Registered CHECK constraints: name → SQL boolean expression.
    * Persisted in the log dir, so EVERY writer instance on this root
    * enforces them (the Delta `ALTER TABLE ADD CONSTRAINT` model).
    */
  def constraints: Map[String, String] = constraintsLock.synchronized {
    if (!fs.exists(constraintsPath)) return Map.empty
    val in = fs.open(constraintsPath)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.nonEmpty).map { l =>
        val i = l.indexOf('\t')
        Entry.dec(l.substring(0, i)) -> Entry.dec(l.substring(i + 1))
      }.toMap
    finally in.close()
  }

  /** L17: ADD CONSTRAINT — registers a CHECK expression that every
    * subsequent data-adding commit (write, merge, partition overwrite,
    * updateWhere) enforces INSIDE the write job itself
    * ([[enforced]]): the same evaluation that produces the written
    * rows checks them, so a nondeterministic input can never pass a
    * pre-check and then materialize different, violating rows — and
    * no separate validation pass re-reads the input. A violating
    * commit throws and leaves the table untouched. Like Delta, adding
    * a constraint first validates the EXISTING data — a table that
    * already violates it rejects the constraint, not the data. SQL
    * CHECK semantics: NULL evaluations pass (use IS NOT NULL
    * explicitly for NOT NULL gates). Pure-movement commits (compact,
    * optimize, restore) skip re-validation — they add no new rows.
    */
  def addConstraint(name: String, sqlExpr: String): Unit = {
    require(name.nonEmpty, "constraint needs a name")
    if (latestVersion.isDefined)
      checkAgainst(read(), Map(name -> sqlExpr), "existing table data")
    constraintsLock.synchronized {
      writeConstraints(constraints + (name -> sqlExpr))
    }
  }

  def dropConstraint(name: String): Unit = constraintsLock.synchronized {
    writeConstraints(constraints - name)
  }

  private def writeConstraints(m: Map[String, String]): Unit = {
    fs.mkdirs(logDir)
    val tmp = new Path(logDir, s".tmp-constraints-${UUID.randomUUID()}")
    val out = fs.create(tmp, false)
    try out.write(m.toSeq.sortBy(_._1).map { case (n, s) =>
      s"${Entry.enc(n)}\t${Entry.enc(s)}"
    }.mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    fs.delete(constraintsPath, false)
    if (!fs.rename(tmp, constraintsPath))
      throw new IllegalStateException(s"constraint commit at $root failed")
  }

  /** Wrap a to-be-written DataFrame so the write job itself enforces
    * every registered constraint per row: `assert_true` throws (with
    * the constraint's name) on the first violating row, mid-job — one
    * evaluation of the input, no pre-check/act race on
    * nondeterministic inputs. The identity when no constraints exist.
    */
  private def enforced(df: DataFrame): DataFrame =
    constraints.foldLeft(df) { case (d, (n, s)) =>
      d.filter(assert_true(
        coalesce(expr(s).cast("boolean"), lit(true)),
        lit(s"CHECK constraint $n ($s) violated")).isNull)
    }

  private def checkAgainst(df: DataFrame, cs: Map[String, String],
      what: String): Unit = {
    val ordered = cs.toSeq
    val aggs = ordered.zipWithIndex.map { case ((_, s), i) =>
      sum(when(!coalesce(expr(s).cast("boolean"), lit(true)), 1L)
        .otherwise(0L)).as(s"_c$i")
    }
    val row = df.agg(aggs.head, aggs.tail: _*).first()
    val violated = ordered.zipWithIndex.flatMap { case ((n, s), i) =>
      val v = if (row.isNullAt(i)) 0L else row.getLong(i)
      if (v > 0) Some(s"$n ($s): $v row(s)") else None
    }
    if (violated.nonEmpty)
      throw new IllegalArgumentException(
        s"CHECK constraint(s) violated by $what — ${violated.mkString("; ")}")
  }

  /** DESCRIBE DETAIL — one-row operational summary of the table (the
    * Delta `DESCRIBE DETAIL` surface): version, file count, total
    * bytes, partition/stats/bloom config, deletion-vector count,
    * constraint count. Driver-side O(files).
    */
  def describeDetail(): DataFrame = {
    import spark.implicits._
    val v = latestVersion
    val entries = v.map(entriesOf).getOrElse(Seq.empty)
    val bytes = entries.map(e =>
      fs.getFileStatus(new Path(root, e.rel)).getLen).sum
    Seq((root, "graft-manifest", v.getOrElse(-1),
      entries.size.toLong, bytes,
      partCols, allStatsCols, bloomCol.toSeq,
      entries.count(_.stats.contains(DvKey)).toLong,
      constraints.size.toLong))
      .toDF("location", "format", "version", "num_files", "size_bytes",
        "partition_columns", "stats_columns", "bloom_columns",
        "num_dv_files", "num_constraints")
  }

  /** ANALYZE TABLE — one aggregation pass over the LIVE rows of the
    * latest version computing the table row count plus, per analyzed
    * column, non-null count, approximate NDV (HLL++, ±~2%), and
    * min/max — persisted as a stats sidecar in the log dir, pinned to
    * the analyzed version. This is the cost-based-planning input: a
    * 1000-executor join planner (and [[readForJoin]] here) consults
    * O(1) metadata instead of scanning 100 TB to learn a dimension
    * table is 40 MB. `columns` restricts the pass; default = every
    * atomic column. Returns the analyzed version.
    *
    * The scan is DV-aware (reads live rows, not raw files) and
    * single-job: all per-column aggregates ride one hash-free global
    * aggregation with map-side partials.
    */
  def analyze(columns: Seq[String] = Seq.empty): Int = {
    val v = latestVersion.getOrElse(
      throw new IllegalStateException(s"analyze: no versions at $root"))
    val df = read(Some(v))
    val atomic = df.schema.fields
      .filter(f => f.dataType match {
        case _: ArrayType | _: MapType | _: StructType | BinaryType => false
        case _ => true
      }).map(_.name).toSeq
    val cols =
      if (columns.isEmpty) atomic
      else {
        val bad = columns.filterNot(atomic.contains)
        require(bad.isEmpty,
          s"analyze: non-atomic or unknown column(s) ${bad.mkString(", ")}")
        columns
      }
    val aggs = count(lit(1)).as("_rows") +: cols.flatMap { c =>
      Seq(count(col(c)).as(s"_nn_$c"),
        approx_count_distinct(col(c)).as(s"_ndv_$c"),
        min(col(c)).cast("string").as(s"_mn_$c"),
        max(col(c)).cast("string").as(s"_mx_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).first()
    val rows = row.getLong(0)
    val bytes = entriesOf(v).map(e =>
      fs.getFileStatus(new Path(root, e.rel)).getLen).sum
    val enc = (s: String) => Entry.enc(s)
    val colLines = cols.zipWithIndex.map { case (c, i) =>
      val base = 1 + i * 4
      val mn = if (row.isNullAt(base + 2)) "" else enc(row.getString(base + 2))
      val mx = if (row.isNullAt(base + 3)) "" else enc(row.getString(base + 3))
      s"col=${enc(c)},${row.getLong(base)},${row.getLong(base + 1)},$mn,$mx"
    }
    val content = (Seq(s"version=$v", s"rows=$rows", s"bytes=$bytes")
      ++ colLines).mkString("\n") + "\n"
    val tmp = new Path(logDir, s".tmp-stats-${UUID.randomUUID()}")
    val out = fs.create(tmp, false)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    val dest = new Path(logDir, s"stats_v$v")
    if (fs.exists(dest)) fs.delete(dest, false)
    if (!fs.rename(tmp, dest)) { fs.delete(tmp, false); }
    v
  }

  /** Most recent persisted ANALYZE snapshot:
    * (analyzed version, row count, data bytes). None until the first
    * [[analyze]]. O(1) metadata — no data scan.
    */
  def tableStats: Option[(Int, Long, Long)] = statsFileLines.map { lines =>
    val kv = lines.filter(l => l.contains('=') && !l.startsWith("col="))
      .map { l => val i = l.indexOf('='); l.take(i) -> l.drop(i + 1) }.toMap
    (kv("version").toInt, kv("rows").toLong, kv("bytes").toLong)
  }

  /** Per-column statistics of the most recent ANALYZE, as a local
    * DataFrame (the `DESCRIBE STATS` surface): column, non-null count,
    * approximate NDV, min, max (stringified, NULL when the column was
    * all-NULL). Empty if never analyzed.
    */
  def columnStats(): DataFrame = {
    import spark.implicits._
    statsFileLines.getOrElse(Seq.empty)
      .filter(_.startsWith("col="))
      .map { l =>
        val parts = l.stripPrefix("col=").split(",", -1)
        (Entry.dec(parts(0)), parts(1).toLong, parts(2).toLong,
          if (parts(3).isEmpty) null else Entry.dec(parts(3)),
          if (parts(4).isEmpty) null else Entry.dec(parts(4)))
      }.toDF("column", "non_null", "ndv", "min", "max")
  }

  private def statsFileLines: Option[Seq[String]] = {
    if (!fs.exists(logDir)) return None
    val stats = fs.listStatus(logDir).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("stats_v"))
      .map(n => n.stripPrefix("stats_v").toInt)
    if (stats.isEmpty) return None
    val p = new Path(logDir, s"stats_v${stats.max}")
    val in = fs.open(p)
    try Some(scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList)
    finally in.close()
  }

  /** Read with a stats-driven broadcast decision: when the CURRENT
    * version's total data bytes fall under `broadcastThreshold`, the
    * result carries a broadcast hint — so `fact.join(dim.readForJoin(),
    * keys)` picks BroadcastHashJoin without the caller hand-placing
    * hints or Spark's size estimator seeing through the scan. File
    * sizes come from commit metadata (O(files) driver-side, no scan),
    * so the decision is always CURRENT — unlike [[tableStats]], which
    * is pinned to its analyze version. Same compressed-bytes threshold
    * semantics as Delta/Spark `autoBroadcastJoinThreshold`.
    */
  def readForJoin(broadcastThreshold: Long = 10L << 20): DataFrame = {
    val small = latestVersion.exists { v =>
      var total = 0L
      val it = entriesOf(v).iterator
      var under = true
      while (it.hasNext && under) {
        total += fs.getFileStatus(new Path(root, it.next().rel)).getLen
        under = total <= broadcastThreshold
      }
      under
    }
    if (small) broadcast(read()) else read()
  }

  /** Stream-source surface: rows of the files ADDED between two
    * versions, read DV-aware as of `vTo` — what a table-as-stream
    * micro-batch emits. With `failOnChange`, any non-append difference
    * (a removed file, or a same-path entry whose stats/DV reference
    * changed — i.e. a merge rewrite, compaction, delete, or update)
    * throws instead of silently emitting partial or duplicate data —
    * the Delta source's append-only contract; `ignoreChanges` relaxes
    * it to at-least-once on rewritten files.
    */
  private[graft] def addedBetween(vFrom: Option[Int], vTo: Int,
      failOnChange: Boolean): DataFrame = {
    val toEntries = entriesOf(vTo)
    val fromEntries = vFrom.map(entriesOf).getOrElse(Seq.empty)
    val fromByRel = fromEntries.map(e => e.rel -> e).toMap
    if (failOnChange && vFrom.isDefined) {
      val toByRel = toEntries.map(e => e.rel -> e).toMap
      val removed = fromEntries.filterNot(e => toByRel.contains(e.rel))
      val changed = fromEntries.filter(e =>
        toByRel.get(e.rel).exists(_ != e))
      if (removed.nonEmpty || changed.nonEmpty)
        throw new IllegalStateException(
          s"non-append change between v${vFrom.get} and v$vTo " +
            s"(${removed.size} removed, ${changed.size} rewritten/DV-marked " +
            "files): a table stream is append-only; pass " +
            "ignoreChanges=true to emit newly-added files anyway " +
            "(at-least-once on rewrites)")
    }
    val added = toEntries.filterNot(e => fromByRel.contains(e.rel))
    if (added.isEmpty) read(Some(vTo)).filter(lit(false))
    else readEntries(added)
  }

  /** Files metadata table (the Iceberg `table.files` surface): one row
    * per data file of a version — relative path, size, per-column zone
    * map [min, max], and the deletion-vector sidecar reference if any.
    * What an operator reads to see WHY a query pruned (or didn't), and
    * what external tooling consumes to audit layout. Driver-side
    * O(files), served as a local DataFrame.
    */
  def filesDf(version: Option[Int] = None): DataFrame = {
    import spark.implicits._
    val v = version.orElse(latestVersion)
      .getOrElse(throw new IllegalStateException(s"no versions at $root"))
    entriesOf(v).map { e =>
      val len = fs.getFileStatus(new Path(root, e.rel)).getLen
      val zones = e.stats.toSeq
        // engine keys ('#dv', '#n', '#rid') and bloom bitsets are not
        // zone maps
        .filter { case (c, s) => !c.startsWith("#") && s.kind != "B" }
        .sortBy(_._1)
        .map { case (c, s) => (c, s.mn, s.mx) }
      (e.rel, len, zones, e.stats.get(DvKey).map(_.mn))
    }.toDF("file", "size_bytes", "zone_maps", "dv_sidecar")
  }

  /** DESCRIBE HISTORY — one row per committed version (the Delta
    * `DESCRIBE HISTORY` surface): commit time, file count, rows
    * masked by deletion vectors, and the file-set delta vs the
    * previous version (added/removed counts — how a reader tells an
    * append from a compaction from a merge). Driver-side O(versions ·
    * files).
    */
  def history(): DataFrame = {
    import spark.implicits._
    val vs = versions
    val byV = vs.map(v => v -> entriesOf(v)).toMap
    vs.map { v =>
      val es = byV(v)
      val prev = byV.get(v - 1).map(_.map(_.rel).toSet).getOrElse(Set.empty)
      val rels = es.map(_.rel).toSet
      val dvRows = es.flatMap(_.stats.get(DvKey))
        .map(s => try s.mx.toLong catch { case _: NumberFormatException => 0L })
        .sum
      (v, new java.sql.Timestamp(commitTimeOf(v)), es.size.toLong,
        (rels -- prev).size.toLong, (prev -- rels).size.toLong, dvRows)
    }.toDF("version", "commit_ts", "num_files",
      "files_added", "files_removed", "dv_deleted_rows")
      .orderBy(col("version").asc)
  }

  /** L15: row-level DELETE via deletion vectors (merge-on-read — the
    * Delta DV / Iceberg v2 position-delete model). Matching rows are
    * recorded as (file-basename, row_index) positions in a sidecar
    * parquet under `_graft_dv/`; the touched files' manifest entries
    * re-point at the sidecar and NO data file is rewritten. Cost is
    * O(matching rows + one manifest commit) — at 100 TB a point delete
    * (GDPR erasure, bad-batch retraction) touches a handful of files'
    * entries instead of rewriting partitions. Readers anti-join the
    * positions out ([[readEntries]]); the next compaction/merge of a
    * file materializes its deletes and drops the DV. A new sidecar for
    * a file absorbs the file's previous positions, so each entry
    * references exactly ONE sidecar (bounded read fan-in), while stale
    * shared sidecars stay harmless (positions are permanent row ids).
    * Zone maps/blooms of DV-carrying files stay valid — they describe
    * a superset, which can only under-prune, never lose rows. Returns
    * the committed version, or the current one when nothing matched.
    */
  def delete(predicate: Column): Int = {
    val v0 = latestVersion.getOrElse(
      throw new IllegalStateException(s"no versions at $root"))
    val entries = entriesOf(v0)
    deleteFrom(v0, entries, entries, predicate)
  }

  /** Point delete with BLOOM file skipping (L14 ∘ L15): only files
    * whose bloom might contain the value are scanned for positions —
    * the "erase one doc_id among 100k files" path, O(candidate files)
    * instead of O(table). Exact: the bloom only ever over-selects.
    */
  def deleteEq(c: String, value: String): Int = {
    val v0 = latestVersion.getOrElse(
      throw new IllegalStateException(s"no versions at $root"))
    deleteFrom(v0, entriesOf(v0), prunedEntriesEq(c, value, Some(v0)),
      col(c).cast("string") === lit(value))
  }

  /** Batch point delete — one commit for a SET of keys (the GDPR
    * erasure-queue shape: requests arrive in batches, each batch is
    * one DV commit, not one per key). Bloom-prunes to the files that
    * might contain ANY of the values when the column carries a bloom.
    */
  def deleteKeys(c: String, values: Seq[String]): Int = {
    val v0 = latestVersion.getOrElse(
      throw new IllegalStateException(s"no versions at $root"))
    // NULL keys are dropped explicitly (they cannot equal any stored
    // value; inside an IN literal they'd vanish silently instead)
    val vals = values.filter(_ != null).distinct
    if (vals.isEmpty) return v0
    val entries = entriesOf(v0)
    deleteFromWith(v0, entries,
      keyCandidates(entries, toPhysical(c), vals), keyMatcher(c, vals))
  }

  /** Candidate files that may hold ANY of `vals` in physical column
    * `pc`: bloom-pruned when the column carries a bloom (hash each
    * value once, decode each entry's bitset once — O(files + keys)),
    * zone-map-pruned when it carries stats (the NSW refresh's shard_id
    * batch: O(delta shards), not O(table)), all files otherwise.
    * Shared by [[deleteKeys]] and [[deleteKeysAndAppend]] so the
    * single- and multi-batch key-delete paths cannot diverge.
    */
  private def keyCandidates(entries: Seq[Entry], pc: String,
      vals: Seq[String]): Seq[Entry] =
    if (bloomCol.contains(pc)) {
      val raws = vals.map(bloomRawHashes)
      entries.filter(e =>
        e.stats.get(bloomKey(pc)).forall(bloomTestEntry(_, raws)))
    } else if (allStatsCols.contains(pc)) {
      // sort the keys once per stats kind, then each entry answers
      // "any key inside my [min, max]?" with one binary search —
      // O(files·log keys), not O(files × keys) BigDecimal re-parses
      // (the same once-per-value discipline as the bloom branch).
      // Numeric kinds sort ONLY the BigDecimal-parseable keys: folding
      // statCmp's lexicographic fallback into one sortWith makes the
      // comparator non-transitive ('2'<'10' numeric, '10'<'1a' lex,
      // '1a'<'2' lex — a cycle), and binary search over the resulting
      // inconsistently ordered array can wrongly prune a file that
      // DOES hold a key — a silently incomplete erasure. Unparseable
      // keys ('NaN'/'Infinity' cast-strings of doubles) or unparseable
      // entry bounds disable numeric pruning for the affected entries:
      // a file is only skipped when provably clean.
      lazy val numSorted: Array[BigDecimal] =
        vals.flatMap(tryBigDecimal).toArray.sorted
      lazy val numKeysAllParse: Boolean = vals.forall(tryBigDecimal(_).isDefined)
      val lexSorted = scala.collection.mutable.Map.empty[String, Array[String]]
      entries.filter(e => e.stats.get(pc).forall { s =>
        if (s.kind == "N") {
          if (!numKeysAllParse) true // a NaN-ish key: cannot prove clean
          else (tryBigDecimal(s.mn), tryBigDecimal(s.mx)) match {
            case (Some(mn), Some(mx)) =>
              var lo = 0
              var hi = numSorted.length // first key >= min
              while (lo < hi) {
                val mid = (lo + hi) >>> 1
                if (numSorted(mid) < mn) lo = mid + 1 else hi = mid
              }
              lo < numSorted.length && numSorted(lo) <= mx
            case _ => true // legacy/odd numeric bounds: never prune
          }
        } else {
          val keys = lexSorted.getOrElseUpdate(s.kind, vals.toArray.sorted)
          var lo = 0
          var hi = keys.length // first key >= min
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (keys(mid).compareTo(s.mn) < 0) lo = mid + 1 else hi = mid
          }
          lo < keys.length && keys(lo).compareTo(s.mx) <= 0
        }
      })
    } else entries

  private def tryBigDecimal(s: String): Option[BigDecimal] =
    try Some(BigDecimal(s)) catch { case _: NumberFormatException => None }

  /** Row matcher for a key set: a literal IN below
    * [[ManifestTable.InLiteralMaxKeys]]; past it, a broadcast
    * semi-join (a huge erasure batch must not become a huge In
    * expression — analysis-time O(keys) tree, codegen pressure).
    */
  private def keyMatcher(c: String,
      vals: Seq[String]): DataFrame => DataFrame =
    if (vals.size <= ManifestTable.InLiteralMaxKeys)
      live => live.filter(col(c).cast("string").isin(vals: _*))
    else {
      val keysDf = spark.createDataset(vals)(org.apache.spark.sql.Encoders.STRING)
        .toDF("_graft_erase_key")
      live => live.join(org.apache.spark.sql.functions.broadcast(keysDf),
        col(c).cast("string") === col("_graft_erase_key"), "left_semi")
    }

  /** Range delete with ZONE-MAP file skipping (L7 ∘ L15): only files
    * whose [min,max] intersects the range are scanned — retracting a
    * bad ingest window from a time-clustered table touches the few
    * files holding it.
    */
  def deleteRange(c: String, lo: String, hi: String): Int = {
    val v0 = latestVersion.getOrElse(
      throw new IllegalStateException(s"no versions at $root"))
    deleteFrom(v0, entriesOf(v0), prunedEntriesBy(c, lo, hi, Some(v0)),
      col(c) >= lit(lo) && col(c) <= lit(hi))
  }

  /** Position-mark rows of `candidates` matching `predicate`; commit
    * as a delta against the FULL snapshot (`all`). Only candidate
    * files are scanned — callers narrow them via bloom/zone pruning.
    */
  private def deleteFrom(v0: Int, all: Seq[Entry], candidates: Seq[Entry],
      predicate: Column): Int =
    deleteFromWith(v0, all, candidates, _.filter(predicate))

  /** Generalized form: `matcher` selects the rows to mark from the
    * live candidate scan (a filter for predicate deletes, a semi-join
    * for large key sets).
    */
  private def deleteFromWith(v0: Int, all: Seq[Entry], candidates: Seq[Entry],
      matcher: DataFrame => DataFrame): Int = {
    if (candidates.isEmpty) return v0
    if (!cdcEnabled) {
      val hits = matcher(liveWithPos(candidates, withRid = false))
        .select(col(DvFileCol), col(DvPosCol))
      return commitDv(v0, all, hits, Seq.empty, marksUnique = true)
    }
    // T15: the matched rows ARE the commit's change rows. Materialize
    // the hit set exactly once so the DV marks and the recorded
    // deletes cannot diverge under a nondeterministic predicate —
    // the same discipline updateWhere applies.
    val hits = matcher(liveWithPos(candidates, withRid = false))
      .localCheckpoint(true)
    try {
      val dataCols = hits.columns
        .filterNot(Set(DvFileCol, DvPosCol, ManifestTable.RowIdCol)).toSeq
      commitDv(v0, all, hits.select(col(DvFileCol), col(DvPosCol)), Seq.empty,
        cdc = Some(hits.select(dataCols.map(col): _*)
          .withColumn(ManifestTable.ChangeTypeCol, lit("delete"))),
        marksUnique = true)
    } finally graft.functions.CheckpointOps.release(hits)
  }

  /** The LIVE rows of `entries` with their permanent (file, pos) row
    * ids: logical column names for caller predicates (DV marker
    * columns are reserved and never mapped) and already-deleted rows
    * anti-joined out — re-deleting a dead row must not inflate counts,
    * and updates/merges must never resurrect one. The shared preamble
    * of every row-level mutation (delete / update / merge).
    */
  private def liveWithPos(entries: Seq[Entry],
      withRid: Boolean = true): DataFrame = {
    val files = entries.map(e => new Path(root, e.rel).toString)
    // withDeclared on the file read: row-level DML (UPDATE/MERGE/
    // DELETE) matches and assigns against the LOGICAL schema — a
    // declared-only column from ALTER TABLE ADD COLUMNS resolves at
    // analysis (read() carries it), so the mutation path must carry
    // it too or `SET note = 'x'` dies here on a column the analyzer
    // accepted (the read() branch already includes it)
    val withPos =
      if (files.isEmpty) {
        val base = read()
          .withColumn(DvFileCol, lit(null).cast("string"))
          .withColumn(DvPosCol, lit(null).cast("long"))
        if (withRid)
          base.withColumn(ManifestTable.RowIdCol, lit(null).cast("long"))
        else base
      } else if (!withRid)
        // deletes only MARK positions — no copy is written, so the
        // row-id resolution (bases broadcast + coalesce) is pure
        // per-commit overhead there and is skipped
        withDeclared(toLogicalRename(readFiles(files, withPos = true)))
      else {
        // stable row id rides the mutation read so update/merge COPIES
        // can materialize it ([[ManifestTable.RidPhysCol]]) — an
        // updated row keeps its identity across the DV-mark + append
        import spark.implicits._
        val bases = entries.map(e => (new Path(e.rel).getName,
          e.stats.get(ManifestTable.RidKey).map(_.mn.toLong)))
          .toDF(DvFileCol, "_graft_rid_base")
        val raw = readFiles(files, withPos = true, keepRid = true)
        val phys =
          if (raw.columns.contains(ManifestTable.RidPhysCol))
            col(ManifestTable.RidPhysCol)
          else lit(null).cast("long")
        withDeclared(toLogicalRename(raw
          .join(broadcast(bases), Seq(DvFileCol), "left")
          .withColumn(ManifestTable.RowIdCol,
            coalesce(phys, col("_graft_rid_base") + col(DvPosCol)))
          .drop("_graft_rid_base", ManifestTable.RidPhysCol)))
      }
    dvOf(entries).fold(withPos)(dv =>
      withPos.join(dv, Seq(DvFileCol, DvPosCol), "left_anti"))
  }

  /** Resolve assignment-map keys against `cols` with the session
    * resolver (case-insensitive under the default
    * spark.sql.caseSensitive=false — `CALL graft.update` hands user-
    * typed names straight through) and normalize each to the actual
    * column name; loud on unknown, ambiguous, or twice-assigned keys.
    */
  private def resolveSetKeys(what: String, cols: Seq[String],
      set: Map[String, Column]): Map[String, Column] = {
    val resolver = spark.sessionState.conf.resolver
    val pairs = set.toSeq.map { case (k, v) =>
      val hits = cols.filter(c => resolver(c, k))
      if (hits.isEmpty) throw new IllegalArgumentException(
        s"$what assigns unknown column(s): $k")
      if (hits.size > 1) throw new IllegalArgumentException(
        s"$what: ambiguous column $k matches ${hits.mkString(", ")}")
      hits.head -> v
    }
    val dup = pairs.groupBy(_._1).collect { case (n, ps) if ps.size > 1 => n }
    if (dup.nonEmpty) throw new IllegalArgumentException(
      s"$what: column(s) assigned more than once: " +
        dup.toSeq.sorted.mkString(", "))
    pairs.toMap
  }

  /** L16: row-level UPDATE via deletion vectors — `UPDATE ... SET ...
    * WHERE ...` without rewriting any existing file: matching rows are
    * DV-marked in place and their updated copies append as new files
    * (merge-on-read update). An assignment may change the partition
    * column — the new copy simply lands in its new partition while the
    * old position is dead. `set` maps column name → new value
    * expression (may reference the old row's columns).
    */
  def updateWhere(predicate: Column, set: Map[String, Column]): Int = {
    val v0 = latestVersion.getOrElse(
      throw new IllegalStateException(s"no versions at $root"))
    val entries = entriesOf(v0)
    if (entries.isEmpty) return v0
    require(set.nonEmpty, "updateWhere needs at least one assignment")
    set.keys.find(identityColumns.contains).foreach(n =>
      throw new IllegalArgumentException(s"updateWhere: $n is GENERATED " +
        "ALWAYS AS IDENTITY — its values cannot be assigned"))
    val live = liveWithPos(entries)
    // materialize the matched row set EXACTLY once (eager checkpoint):
    // the marks and the appended copies must come from the same rows,
    // or a nondeterministic predicate/assignment could kill one row
    // set and append a different one — silent loss or duplication
    val hits = live.filter(predicate).localCheckpoint(true)
    try {
      // ANSI UPDATE semantics: every assignment sees the OLD row — one
      // simultaneous select, not a sequential withColumn fold (which
      // would feed later assignments the NEW value of earlier ones:
      // `SET a = b, b = a` must swap, not duplicate). Keys resolve
      // case-insensitively to existing columns; a typo'd key would
      // otherwise silently ADD a column and fail later at commit.
      val cols = hits.columns
        .filterNot(Set(DvFileCol, DvPosCol, ManifestTable.RowIdCol)).toSeq
      // values cast to the column's type (ANSI store assignment), the
      // same normalization MERGE applies: `SET amount = 99.0` hands a
      // DECIMAL(3,1) literal at a DOUBLE column — written uncast, the
      // copy's parquet schema no longer merges with the table's and
      // the table is unreadable after a successful commit
      val setN = resolveSetKeys("UPDATE", cols, set).map { case (k, v) =>
        k -> v.cast(hits.schema(k).dataType)
      }
      // the copy materializes the row's stable id (T16 row tracking):
      // an UPDATE changes values, not identity — the appended file
      // carries the id physically so reads and the keyless change feed
      // keep pairing old and new
      val updated0 = hits.select(
        cols.map(c => setN.getOrElse(c, col(c)).as(c)) :+
          col(ManifestTable.RowIdCol).as(ManifestTable.RidPhysCol): _*)
      // T15: with CDC on, the postimages are recorded in the sidecar
      // AND written as the appended copies — materialize them once so
      // a nondeterministic assignment cannot record one set of rows
      // and write another. cdcEnabled snapshots ONCE (it is an
      // fs.exists): a mid-operation enableCdc/disableCdc toggle must
      // not split the checkpoint from its release or from the
      // sidecar decision.
      val cdcOn = cdcEnabled
      val updated = if (!cdcOn) updated0
        else updated0.localCheckpoint(true)
      try {
        val cdc = if (!cdcOn) None else Some(
          hits.select(cols.map(col): _*)
            .withColumn(ManifestTable.ChangeTypeCol, lit("update_preimage"))
            .unionByName(updated.drop(ManifestTable.RidPhysCol).withColumn(
              ManifestTable.ChangeTypeCol, lit("update_postimage"))))
        commitDv(v0, entries, hits.select(col(DvFileCol), col(DvPosCol)),
          Seq(enforced(updated)), cdc = cdc, marksUnique = true)
      } finally if (cdcOn) graft.functions.CheckpointOps.release(updated)
    } finally graft.functions.CheckpointOps.release(hits) // RDD-level: Dataset.unpersist no-ops on checkpoints
  }

  /** General `MERGE INTO` via deletion vectors (merge-on-read): ONE
    * commit that DV-marks the matched targets an applying clause
    * updates or deletes and appends the updated copies plus the
    * not-matched inserts — cost O(matched + inserted rows) and one
    * manifest delta, never a table rewrite (the Delta/Iceberg
    * copy-on-read MERGE shape; at 100 TB a CDC batch touches the
    * files holding matched rows' entries, not partitions). Supports
    * the full three-sided statement with arbitrary (non-equi) join
    * conditions and conditional clauses, first-match-wins:
    *
    *   WHEN MATCHED [AND c]               THEN UPDATE SET ... | DELETE
    *   WHEN NOT MATCHED [AND c]           THEN INSERT ...
    *   WHEN NOT MATCHED BY SOURCE [AND c] THEN UPDATE SET ... | DELETE
    *
    * `source` column names must be DISJOINT from the table's logical
    * columns ([[graft.sql.GraftDmlRules]] renames the source side
    * before lowering; Scala callers rename explicitly) so `on` and
    * clause expressions can refer to both sides by plain name. A row
    * no clause applies to is untouched. A target row with more than
    * one APPLYING matched source row is the standard MERGE cardinality
    * violation and throws — compact the feed first
    * ([[Merge.latestPerKey]]). A merge where nothing matches and
    * nothing inserts is a version no-op. Keyed equality upserts with a
    * unique feed can also use [[Merge.upsert]] + [[write]] (full
    * rewrite — better when MOST rows change; this path wins when a
    * small fraction does).
    */
  def mergeInto(source: DataFrame, on: Column,
      matched: Seq[MergeMatchedClause] = Nil,
      notMatched: Seq[MergeInsertClause] = Nil,
      notMatchedBySource: Seq[MergeMatchedClause] = Nil): Int = {
    val v0 = latestVersion.getOrElse(
      throw new IllegalStateException(s"no versions at $root"))
    require(matched.nonEmpty || notMatched.nonEmpty ||
      notMatchedBySource.nonEmpty, "MERGE needs at least one clause")
    val entries = entriesOf(v0)
    // ids are consumed only by UPDATE-arm copies; a delete/insert-only
    // merge (the common CDC-apply shape) skips the resolution
    val needRid = (matched ++ notMatchedBySource)
      .exists(_.isInstanceOf[MergeUpdateClause])
    val live = liveWithPos(entries, withRid = needRid)
    val targetCols = live.columns
      .filterNot(Set(DvFileCol, DvPosCol, ManifestTable.RowIdCol)).toSeq
    val armCol = "_graft_merge_arm"
    val overlap = source.columns.toSet
      .intersect(targetCols.toSet + DvFileCol + DvPosCol +
        ManifestTable.RowIdCol + ManifestTable.RidPhysCol)
    require(overlap.isEmpty, "MERGE source columns collide with target " +
      s"columns: ${overlap.toSeq.sorted.mkString(", ")} — rename the " +
      "source side first")
    val armClash = (targetCols ++ source.columns).filter(_ == armCol)
    require(armClash.isEmpty,
      s"column name $armCol is reserved by MERGE — rename it first")
    // normalize clause maps: keys resolved (case-insensitively) to the
    // actual target column, values cast to the column's type — a
    // mismatched insert/update type would otherwise write a data file
    // whose schema no longer merges with the table's (unreadable
    // after a successful commit)
    def normalize(what: String, set: Map[String, Column]) =
      resolveSetKeys(what, targetCols, set).map { case (k, v) =>
        k -> v.cast(live.schema(k).dataType)
      }
    val matchedN = matched.map {
      case MergeUpdateClause(c, set) =>
        MergeUpdateClause(c, normalize("WHEN MATCHED UPDATE", set))
      case d => d
    }
    val bySourceN = notMatchedBySource.map {
      case MergeUpdateClause(c, set) => MergeUpdateClause(c,
        normalize("WHEN NOT MATCHED BY SOURCE UPDATE", set))
      case d => d
    }
    val notMatchedN = notMatched.map(c => MergeInsertClause(c.condition,
      normalize("WHEN NOT MATCHED INSERT", c.values)))
    // the source materializes EXACTLY once: three independent joins
    // read it (matched inner, insert anti, by-source anti) — a
    // nondeterministic source (sample/rand/LIMIT) evaluated per join
    // could mark a target row AND miss its replacement, or insert a
    // feed row it also applied as an update (the per-hit-set
    // checkpoints below only protect within one set)
    val src = source.localCheckpoint(true)

    // first-match-wins clause index; -1 = no clause applies (NULL
    // conditions are "does not apply", like SQL WHEN ... AND)
    def tagged(df: DataFrame, conds: Seq[Option[Column]]): DataFrame =
      df.withColumn(armCol, conds.zipWithIndex.foldRight(lit(-1)) {
        case ((c, i), els) => when(
          coalesce(c.getOrElse(lit(true)).cast("boolean"), lit(false)),
          lit(i)).otherwise(els)
      })
    // matched/by-source hit sets materialize EXACTLY once (eager
    // checkpoint): marks and updated copies must come from the same
    // rows or a nondeterministic source/condition could kill one row
    // set and append another — silent loss or duplication (same
    // discipline as updateWhere)
    val matchedHits =
      if (matchedN.isEmpty) None
      else Some(tagged(live.join(src, on, "inner"),
        matchedN.map(_.condition))
        .filter(col(armCol) >= 0).localCheckpoint(true))
    val bySourceHits =
      if (bySourceN.isEmpty) None
      else Some(tagged(live.join(src, on, "left_anti"),
        bySourceN.map(_.condition))
        .filter(col(armCol) >= 0).localCheckpoint(true))
    val insertRows =
      if (notMatchedN.isEmpty) None
      else {
        val unmatched = tagged(src.join(live, on, "left_anti"),
          notMatchedN.map(_.condition))
        Some(notMatchedN.zipWithIndex.map { case (c, i) =>
          unmatched.filter(col(armCol) === i).select(targetCols.map { t =>
            c.values.get(t).map(_.as(t)).getOrElse(
              lit(null).cast(live.schema(t).dataType).as(t))
          }: _*)
        }.reduce(_ unionAll _).localCheckpoint(true))
      }
    val cdcOn = cdcEnabled
    // T15: update-copy frames are recorded in the CDC sidecar AND
    // written as appended files — checkpoint each once (CDC mode only)
    // so a nondeterministic SET expression cannot record one set of
    // postimages and write another
    val copyCheckpoints = scala.collection.mutable.ArrayBuffer[DataFrame]()
    val allCheckpoints = Seq(src) ++
      matchedHits.toSeq ++ bySourceHits.toSeq ++ insertRows.toSeq
    try {
      matchedHits.foreach { h =>
        val dup = h.groupBy(col(DvFileCol), col(DvPosCol))
          .agg(count(lit(1)).as("_n")).filter(col("_n") > 1)
          .limit(1).collect()
        if (dup.nonEmpty) throw new IllegalArgumentException(
          "MERGE cardinality violation: a target row (file=" +
            s"${dup.head.get(0)}, pos=${dup.head.get(1)}) matches " +
            "multiple source rows with an applying WHEN MATCHED " +
            "clause; deduplicate the source (e.g. Merge.latestPerKey)")
      }
      // bounded probes on cached checkpoint blocks — a merge that
      // matches nothing and inserts nothing must NOT bump the version
      // (the delete/update no-op contract)
      val haveMarks =
        (matchedHits.toSeq ++ bySourceHits.toSeq).exists(!_.isEmpty)
      val haveInserts = insertRows.exists(!_.isEmpty)
      if (!haveMarks && !haveInserts) return v0
      def updatedCopies(hitsOpt: Option[DataFrame],
          clauses: Seq[MergeMatchedClause]): Seq[DataFrame] =
        hitsOpt.toSeq.flatMap { h =>
          clauses.zipWithIndex.collect {
            case (MergeUpdateClause(_, set), i) =>
              // copies materialize the row's stable id (T16): an
              // UPDATE arm changes values, not identity
              val c = h.filter(col(armCol) === i).select(
                targetCols.map(t => set.getOrElse(t, col(t)).as(t)) :+
                  col(ManifestTable.RowIdCol)
                    .as(ManifestTable.RidPhysCol): _*)
              if (!cdcOn) c
              else { val cc = c.localCheckpoint(true); copyCheckpoints += cc; cc }
          }
        }
      val matchedCopies = updatedCopies(matchedHits, matchedN)
      val bySourceCopies = updatedCopies(bySourceHits, bySourceN)
      val adds = (matchedCopies ++ bySourceCopies ++
        insertRows.toSeq).map(enforced)
      // T15: the commit's change rows, assembled from the SAME
      // checkpointed hit/copy/insert frames the write uses — per
      // matched arm the preimage (update) or the dead row (delete),
      // every update copy as a postimage, every insert row as an
      // insert. O(changed rows), written once at commit.
      val ct = ManifestTable.ChangeTypeCol
      val cdc: Option[DataFrame] = if (!cdcOn) None else {
        def pres(hitsOpt: Option[DataFrame],
            clauses: Seq[MergeMatchedClause]): Seq[DataFrame] =
          hitsOpt.toSeq.flatMap { h =>
            clauses.zipWithIndex.map {
              case (MergeUpdateClause(_, _), i) =>
                h.filter(col(armCol) === i).select(targetCols.map(col): _*)
                  .withColumn(ct, lit("update_preimage"))
              case (MergeDeleteClause(_), i) =>
                h.filter(col(armCol) === i).select(targetCols.map(col): _*)
                  .withColumn(ct, lit("delete"))
            }
          }
        (pres(matchedHits, matchedN) ++ pres(bySourceHits, bySourceN) ++
          (matchedCopies ++ bySourceCopies)
            .map(_.drop(ManifestTable.RidPhysCol)
              .withColumn(ct, lit("update_postimage"))) ++
          insertRows.toSeq.map(_.withColumn(ct, lit("insert"))))
          .reduceOption(_ unionByName _)
      }
      val marks = (matchedHits.toSeq ++ bySourceHits.toSeq)
        .map(_.select(col(DvFileCol), col(DvPosCol)))
        .reduceOption(_ unionAll _)
        .getOrElse(live.limit(0).select(col(DvFileCol), col(DvPosCol)))
      commitDv(v0, entries, marks, adds, appendWithoutMarks = true,
        cdc = cdc, marksUnique = true)
    } finally (allCheckpoints ++ copyCheckpoints)
      .foreach(graft.functions.CheckpointOps.release)
  }

  /** Shared DV commit: record `marks` (positions to kill, computed
    * against snapshot `v0`) in a fresh sidecar, re-point the touched
    * entries, append `adds` rows as new files, and commit the delta.
    * Disjoint concurrent writers (appends, merges of other partitions)
    * rebase; a concurrent rewrite of a touched file conflicts via the
    * removed-still-referenced check. `conflictsWith` narrows further
    * (see [[commitDelta]]). `appendWithoutMarks` keeps the appends
    * when the mark set is empty (an upsert whose keys are all new) —
    * the default preserves the delete/update contract that a no-match
    * predicate is a version no-op.
    */
  private def commitDv(v0: Int, entries: Seq[Entry], marks: DataFrame,
      adds: Seq[DataFrame], conflictsWith: Entry => Boolean = _ => false,
      appendWithoutMarks: Boolean = false,
      cdc: Option[DataFrame] = None,
      marksUnique: Boolean = false): Int = {
    val cached = marks.cache()
    try {
      // one bounded job: per-file NEW-mark counts (≤ one row per file)
      val newPerFile = cached.groupBy(col(DvFileCol)).count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      if (newPerFile.isEmpty && !(appendWithoutMarks && adds.nonEmpty))
        return v0
      // T15: persist the caller's change rows BEFORE the manifest
      // commit (a crash in between leaks an untagged sidecar vacuum
      // sweeps), then stamp the committed version with its sidecar —
      // the stamp is what the keyless change feed resolves
      val cdcRel = cdc.map(writeCdcFile)
      def stamped(v: Int): Int = {
        cdcRel.foreach(putVersionTag(v, ManifestTable.CdcTagKey, _))
        v
      }
      if (newPerFile.isEmpty)
        return stamped(commitDelta(entries, Set.empty,
          adds.flatMap(df => newEntries(writeDataFiles(df))), conflictsWith))
      val touched = entries.filter(e =>
        newPerFile.contains(new Path(e.rel).getName))
      // absorb each touched file's PRIOR positions so its entry points
      // at exactly one sidecar
      val oldRels = touched.flatMap(_.stats.get(DvKey).map(_.mn)).distinct
      val oldForTouched =
        if (oldRels.isEmpty) None
        else Some(spark.read.schema(ManifestTable.DvSidecarSchema)
          .parquet(oldRels.map(r => new Path(root, r).toString): _*)
          .select(col(DvFileCol), col(DvPosCol))
          .filter(col(DvFileCol)
            .isin(touched.map(e => new Path(e.rel).getName): _*)))
      // `marksUnique` fast path: single-hit-set callers (predicate
      // deletes, UPDATE copies, cardinality-checked MERGE arms) mark
      // each live position at most once, and live reads anti-join the
      // existing DV out, so new marks are disjoint from prior ones —
      // the distinct shuffle is a no-op and the per-file totals are
      // newPerFile + each entry's prior count (already in its DV stat).
      // Falls back to distinct + sidecar recount when the caller may
      // emit overlapping marks (multi-batch key deletes) or a prior
      // count is unparseable.
      val priorPerFile: Option[Map[String, Long]] =
        if (!marksUnique) None
        else {
          val parsed = touched.map { e =>
            e.stats.get(DvKey) match {
              case None => Some(new Path(e.rel).getName -> 0L)
              case Some(s) =>
                s.mx.toLongOption.map(new Path(e.rel).getName -> _)
            }
          }
          if (parsed.contains(None)) None else Some(parsed.flatten.toMap)
        }
      val allMarks = priorPerFile match {
        case Some(_) => oldForTouched.fold(cached: DataFrame)(o =>
          cached.unionByName(o))
        case None => oldForTouched.fold(cached.distinct())(o =>
          cached.unionByName(o).distinct())
      }
      // size the sidecar from the (driver-known) mark count: the
      // default shuffle parallelism would mint up to 32 files for a
      // typically-tiny position set — sidecar-level small-file bloat
      // on every DV commit. ~4M positions per file; coalesce narrows
      // without another shuffle.
      val oldCount = touched.flatMap(_.stats.get(DvKey))
        .map(s => try s.mx.toLong catch { case _: NumberFormatException => 0L })
        .sum
      val approxMarks = newPerFile.values.sum + oldCount
      val sidecarFiles =
        math.max(1L, math.min(16L, (approxMarks + 3999999L) / 4000000L)).toInt
      val dvRel = s"_graft_dv/${UUID.randomUUID()}.parquet"
      allMarks.coalesce(sidecarFiles)
        .write.options(ManifestTable.InternalWriteOptions)
        .parquet(new Path(root, dvRel).toString)
      // totals: driver arithmetic on the unique-marks path; otherwise
      // re-read from the written sidecar (≤ one row per file)
      val totalPerFile = priorPerFile match {
        case Some(prior) => newPerFile.map { case (f, n) =>
          f -> (n + prior.getOrElse(f, 0L))
        }
        case None => spark.read.schema(ManifestTable.DvSidecarSchema)
          .parquet(new Path(root, dvRel).toString)
          .groupBy(col(DvFileCol)).count().collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
      }
      val repointed = touched.map { e =>
        val n = totalPerFile.getOrElse(new Path(e.rel).getName, 0L)
        e.copy(stats = e.stats + (DvKey -> ColStats(dvRel, n.toString, "D")))
      }
      val added = repointed ++ adds.flatMap(df => newEntries(writeDataFiles(df)))
      stamped(commitDelta(entries, touched.map(_.rel).toSet, added,
        conflictsWith))
    } finally cached.unpersist()
  }

  /** Atomic multi-key DV-delete + append — the vector-index refresh
    * commit ([[graft.operators.PqIndex]]/[[graft.operators.NswIndex]]
    * `refreshFrom`): mark every row matching ANY `(column, keys)`
    * batch dead AND append `adds`, as ONE optimistic commit. A reader
    * — or a crash at any point — sees either the full old state or
    * the full new state; there is no window where the deletes are
    * visible without the re-append (the two-commit form silently lost
    * the deleted rows when a replay re-derived its delta from the
    * half-applied table). Each batch bloom-prunes its candidate files
    * like [[deleteKeys]]; all marks ride one DV sidecar.
    *
    * `strict = true` additionally makes ANY concurrently-added file a
    * conflict (not just overlapping rewrites): single-writer
    * maintenance like an index refresh must observe a racing refresh's
    * commit as a ConcurrentModificationException, never interleave
    * with it — two refreshes deriving the same delta from the same
    * cursor would otherwise both append and duplicate rows.
    *
    * `version` pins the snapshot the caller DERIVED its delta from
    * (the optimistic-concurrency base): marks are computed against
    * that snapshot's files, and any commit that landed since is
    * rebased over or conflicts per [[commitDelta]]. Left unset, the
    * latest version at call time is the base — correct only when the
    * delta was derived in the same breath.
    */
  def deleteKeysAndAppend(deletes: Seq[(String, Seq[String])],
      adds: Seq[DataFrame], strict: Boolean = false,
      version: Option[Int] = None): Int = {
    val v0 = version.orElse(latestVersion).getOrElse(
      throw new IllegalStateException(s"no versions at $root"))
    val entries = entriesOf(v0)
    val conflictsWith: Entry => Boolean = if (strict) _ => true else _ => false
    val cdcOn = cdcEnabled
    // T15 (CDC mode): full hit rows are both the DV marks and the
    // recorded deletes, and the adds are both the written data files
    // and the recorded inserts — checkpoint EACH once so the sidecar
    // and the commit cannot diverge (adds may derive from a
    // concurrently-changing source, e.g. an index refresh delta)
    val hitCheckpoints = scala.collection.mutable.ArrayBuffer[DataFrame]()
    val addsC = if (!cdcOn) adds else adds.map(_.localCheckpoint(true))
    try {
      val hitDfs = deletes.flatMap { case (c, values0) =>
        val vals = values0.filter(_ != null).distinct
        if (vals.isEmpty || entries.isEmpty) None
        else {
          // the same candidate pruning + key matching as deleteKeys
          // (one shared pipeline — the paths cannot diverge)
          val candidates = keyCandidates(entries, toPhysical(c), vals)
          if (candidates.isEmpty) None
          else {
            val files = candidates.map(e => new Path(root, e.rel).toString)
            val withPos = toLogicalRename(readFiles(files, withPos = true))
            val live = dvOf(candidates).fold(withPos)(dv =>
              withPos.join(dv, Seq(DvFileCol, DvPosCol), "left_anti"))
            val hits = keyMatcher(c, vals)(live)
            if (!cdcOn) Some(hits)
            else { val h = hits.localCheckpoint(true); hitCheckpoints += h; Some(h) }
          }
        }
      }
      val marks = hitDfs.map(_.select(col(DvFileCol), col(DvPosCol)))
        .reduceOption(_.unionByName(_)).getOrElse(
        // empty stand-in so commitDv's count job is trivially empty
        spark.range(0).select(lit("").as(DvFileCol), lit(0L).as(DvPosCol)))
      if (hitDfs.isEmpty && addsC.isEmpty) return v0
      val ct = ManifestTable.ChangeTypeCol
      val cdc: Option[DataFrame] = if (!cdcOn) None else
        (hitDfs.map(h => h.select(h.columns
            .filterNot(Set(DvFileCol, DvPosCol)).toSeq.map(col): _*)
            .withColumn(ct, lit("delete"))) ++
          addsC.map(_.withColumn(ct, lit("insert"))))
          .reduceOption(_ unionByName _)
      commitDv(v0, entries, marks, addsC, conflictsWith,
        appendWithoutMarks = true, cdc = cdc)
    } finally {
      hitCheckpoints.foreach(graft.functions.CheckpointOps.release)
      if (cdcOn) addsC.foreach(graft.functions.CheckpointOps.release)
    }
  }

  /** Entries of a snapshot whose partition tuple satisfies `pred` —
    * the `OPTIMIZE ... WHERE` scope every partition-scoped maintenance
    * op shares. The predicate may reference LAYOUT columns only
    * (identity partition columns by logical name, or transform names
    * like `days(ts)` compared as strings); anything else refuses — a
    * scope on a data column would need a data scan to answer, and
    * maintenance scoping exists precisely to avoid one. Evaluation is
    * ONE local projection over the distinct carried tuples (O(files)
    * path parsing, zero data IO). A file carrying NO segment for a
    * referenced column (a pre-spec-evolution layout) stays in scope:
    * rewriting more than asked is layout-safe, while skipping a file
    * the predicate meant would strand it forever.
    */
  private def entriesInScope(entries: Seq[Entry], pred: Column): Seq[Entry] = {
    if (entries.isEmpty) return entries
    val physCols = entries
      .flatMap(e => ManifestTable.layoutColsOf(e.rel)).distinct
    val m = columnMapping // physical path keys surface as logical names
    val logical = physCols.map(c => m.getOrElse(c, c))
    def tupleOf(e: Entry): Option[Seq[String]] = {
      val vs = physCols.map(c => partValueOf(e.rel, c))
      if (vs.exists(_.isEmpty)) None else Some(vs.map(_.get))
    }
    val tuples = entries.flatMap(tupleOf).distinct
    if (tuples.isEmpty) throw new IllegalArgumentException(
      "maintenance scope may reference partition columns only; the " +
        s"table at $root carries no partition layout to scope by")
    // evaluate the predicate LOCALLY per distinct tuple, typed through
    // the source column where one resolves (so `col("k") < 2` compares
    // numerically, not lexically); the ORIGINAL path strings key the
    // kept set — a cast-and-back could reformat and miss. A predicate
    // off the layout fails resolution here: a scope on a data column
    // would need a data scan to answer, which scoping exists to avoid.
    val idxCol = "__graft_scope_idx"
    import org.apache.spark.sql.types.{StringType, StructField}
    val schema = StructType(logical.map(StructField(_, StringType)) :+
      StructField(idxCol, org.apache.spark.sql.types.IntegerType))
    val rows = tuples.zipWithIndex.map { case (t, i) =>
      org.apache.spark.sql.Row.fromSeq(t :+ i)
    }
    val local = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
    val typed = logical.foldLeft(local)((d, c) =>
      scala.util.Try(srcType(c)).toOption.filter(_ != StringType)
        .fold(d)(dt => d.withColumn(c, d(c).cast(dt))))
    val kept = try {
      typed.filter(pred).select(idxCol)
        .collect() // bounded: distinct carried partition tuples
        .map(r => tuples(r.getInt(0))).toSet
    } catch {
      case e: org.apache.spark.sql.AnalysisException =>
        throw new IllegalArgumentException(
          "maintenance scope may reference partition columns only " +
            s"(${logical.sorted.mkString(", ")}): ${e.getMessage}", e)
    }
    entries.filter(e => tupleOf(e).forall(kept.contains))
  }

  /** L5: OPTIMIZE — small-file compaction after many appends: rewrite
    * the latest version through `targetFiles` shuffle partitions
    * (hash-by-partition-column when partitioned, so each partition
    * value lands in few files).
    */
  def compact(targetFiles: Int = 1): Int = {
    val v0 = latestVersion
    val df = withDerived(readRidPhys(v0))
    val compacted =
      if (partCols.nonEmpty) df.repartition(targetFiles, partCols.map(col): _*)
      else df.repartition(targetFiles)
    stampCdcNone(rewriteSnapshot(v0, compacted))
  }

  /** Partition-scoped OPTIMIZE (`OPTIMIZE ... WHERE`): rewrite ONLY
    * the files whose partition tuple satisfies `scope` into
    * `targetFiles` outputs; every out-of-scope file carries forward by
    * reference. At 100 TB one compacts yesterday's partition, never
    * the table — cost is O(scope), and concurrent writers to other
    * partitions rebase cleanly (the commit is a delta on the scoped
    * files only).
    */
  def compact(targetFiles: Int, scope: Column): Int = {
    val v0 = latestVersion.getOrElse(
      throw new IllegalStateException(s"no versions at $root"))
    val entries = entriesOf(v0)
    val chosen = entriesInScope(entries, scope)
    if (chosen.isEmpty) return v0
    val df = withDerived(readEntriesRid(chosen) // DV-applying read
      .withColumnRenamed(ManifestTable.RowIdCol, ManifestTable.RidPhysCol))
    val compacted =
      if (partCols.nonEmpty) df.repartition(targetFiles, partCols.map(col): _*)
      else df.repartition(targetFiles)
    val newFiles = newEntries(writeDataFiles(compacted))
    stampCdcNone(commitDelta(entries, chosen.map(_.rel).toSet, newFiles))
  }

  /** L5d: incremental bin-pack OPTIMIZE — the form that survives
    * 100 TB: only files SMALLER than `minFileBytes` (plus any file
    * carrying a deletion vector, whose deletes this materializes) are
    * rewritten into ~`targetFileBytes` outputs; every compliant file
    * carries forward BY REFERENCE. Cost is O(small files), not
    * O(table) — compacting a petabyte table that's 99% compliant
    * touches 1% of it, where [[compact]]'s full rewrite is a non-
    * starter. Concurrent appends rebase (the rewritten set is
    * disjoint from new files); a concurrent rewrite of a picked file
    * conflicts. Returns the new version, or the current one when
    * nothing needs packing.
    */
  def compactSmall(minFileBytes: Long, targetFileBytes: Long = 128L << 20,
      scope: Option[Column] = None): Int = {
    val v0 = latestVersion.getOrElse(
      throw new IllegalStateException(s"no versions at $root"))
    val entries = entriesOf(v0)
    // scope narrows the CANDIDATES; the commit delta is still against
    // the full snapshot, so out-of-scope files carry by reference
    val sized = scope.fold(entries)(entriesInScope(entries, _)).map { e =>
      e -> fs.getFileStatus(new Path(root, e.rel)).getLen
    }
    val (small, kept) = sized.partition { case (e, len) =>
      len < minFileBytes || e.stats.contains(DvKey)
    }
    if (small.isEmpty || (small.size == 1 && !small.head._1.stats.contains(DvKey)))
      return v0 // nothing to pack (a single small DV-free file gains nothing)
    val totalBytes = small.map(_._2).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    val packed = withDerived(readEntriesRid(small.map(_._1)) // DV-applying read
      .withColumnRenamed(ManifestTable.RowIdCol, ManifestTable.RidPhysCol))
    val repart =
      if (partCols.nonEmpty) packed.repartition(nOut, partCols.map(col): _*)
      else packed.repartition(nOut)
    val newFiles = newEntries(writeDataFiles(repart))
    stampCdcNone(commitDelta(entries, small.map(_._1.rel).toSet, newFiles))
  }

  /** REORG PURGE — materialize soft deletes: rewrite exactly the files
    * carrying a deletion vector (optionally only those whose deleted
    * fraction ≥ `minDeletedFraction`), dropping their DV sidecars, and
    * leave every clean file untouched. The Delta `REORG TABLE ...
    * APPLY (PURGE)` operation, and the back-pressure valve for the DV
    * design: DV deletes are O(matched rows) per commit, but reads pay
    * the anti-join per DV'd file forever — once a file is mostly
    * dead, rewriting it is cheaper than carrying the vector.
    *
    * Cost is O(DV'd files): candidate row counts come from parquet
    * footers only (no data scan), the rewrite reads just the chosen
    * files DV-applied, and the commit is an O(delta) entry. Untouched
    * files carry forward by reference.
    */
  def reorgPurge(minDeletedFraction: Double = 0.0,
      scope: Option[Column] = None): Int = {
    val v0 = latestVersion.getOrElse(
      throw new IllegalStateException(s"no versions at $root"))
    val entries = entriesOf(v0)
    val dvd = scope.fold(entries)(entriesInScope(entries, _))
      .filter(_.stats.contains(DvKey))
    val chosen =
      if (minDeletedFraction <= 0.0) dvd
      else {
        // per-file row counts in ONE job, grouped by input_file_name
        // and keyed by basename (uuid-named files — the newEntries
        // pattern): a count() per candidate file in a driver loop
        // would be O(DV'd files) sequential Spark jobs
        val counts = spark.read
          .parquet(dvd.map(e => new Path(root, e.rel).toString): _*)
          .groupBy(input_file_name().as("_f"))
          .agg(count(lit(1)).as("_n"))
          .collect() // bounded: one row per DV'd candidate file
          .map(r => new Path(r.getString(0)).getName -> r.getLong(1))
          .toMap
        dvd.filter { e =>
          val marks = e.stats(DvKey).mx.toLong
          val rows = counts.getOrElse(new Path(root, e.rel).getName, 0L)
          rows > 0 && marks.toDouble / rows >= minDeletedFraction
        }
      }
    if (chosen.isEmpty) return v0
    val purged = withDerived(readEntriesRid(chosen) // DV-applying read
      .withColumnRenamed(ManifestTable.RowIdCol, ManifestTable.RidPhysCol))
    val repart =
      if (partCols.nonEmpty)
        purged.repartition(math.max(1, chosen.size), partCols.map(col): _*)
      else purged.repartition(math.max(1, chosen.size))
    val newFiles = newEntries(writeDataFiles(repart))
    // row-preserving for the FEED: dead rows stay dead, live rows move
    // verbatim — the change feed sees nothing
    stampCdcNone(commitDelta(entries, chosen.map(_.rel).toSet, newFiles))
  }

  /** T16 follow-up: adopt row tracking on a legacy table — one
    * governed rewrite of EXACTLY the files carrying no `#rid`
    * allotment (pre-row-tracking writes), so every live row gains a
    * stable id and the keyless change feed stops refusing. Ids are
    * FRESH — a legacy file's rows never had any, so there is nothing
    * to preserve — and later rewrites preserve them like any other.
    * The rewrite is invisible to the change feed (dead rows stay dead:
    * the read applies deletion vectors and the commit stamps no CDC),
    * and costs O(unstamped files); stamped files carry forward by
    * reference. Returns the new version, or the current one when the
    * table is already fully tracked.
    */
  def backfillRowIds(): Int = {
    val v0 = latestVersion.getOrElse(
      throw new IllegalStateException(s"no versions at $root"))
    val entries = entriesOf(v0)
    val unstamped = entries.filterNot(_.stats.contains(ManifestTable.RidKey))
    if (unstamped.isEmpty) return v0
    val df = withDerived(readEntries(unstamped)) // DV-applying read
    val repart =
      if (partCols.nonEmpty)
        df.repartition(math.max(1, unstamped.size), partCols.map(col): _*)
      else df.repartition(math.max(1, unstamped.size))
    val newFiles = newEntries(writeDataFiles(repart))
    val v = commitDelta(entries, unstamped.map(_.rel).toSet, newFiles)
    // stamped UNCONDITIONALLY (not the cdcEnabled-gated stampCdcNone):
    // live rows move verbatim by construction, and the usual keyless
    // fallback (row-id diff) is exactly what a pre-tracking file
    // cannot serve — without the stamp the adoption commit itself
    // would be the last refusing version
    putVersionTag(v, ManifestTable.CdcTagKey, ManifestTable.CdcNoChanges)
    v
  }

  /** L5b: cluster-compact — rewrite range-partitioned by `column` so
    * each file covers a narrow value range (the single-dimension
    * OPTIMIZE ZORDER analogue). Pays one sort-shuffle to make every
    * later [[readRange]] on that column skip most files: the write-once
    * read-many trade a 100 TB table wants.
    */
  def optimizeBy(column: String, targetFiles: Int = 8): Int = {
    val v0 = latestVersion
    stampCdcNone(rewriteSnapshot(v0,
      readRidPhys(v0).repartitionByRange(targetFiles, col(column))))
  }

  /** L5c: two-dimensional OPTIMIZE ZORDER — rewrite the table clustered
    * along the Morton curve of (c1, c2) so range reads on EITHER column
    * skip most files (a single-column sort only ever helps one of
    * them). Pair with `statsCols = Seq(c1, c2)` so both zone maps are
    * recorded. One quantile-sketch pass + one range-shuffle write; the
    * same write-once/read-many trade as [[optimizeBy]], paid per
    * OPTIMIZE, never per query.
    */
  def optimizeByZ(c1: String, c2: String, targetFiles: Int = 8): Int =
    optimizeByZ(Seq(c1, c2), targetFiles)

  /** N-column form — same Morton rewrite over every listed dimension
    * (2–4 columns is the practical range; each added dimension dilutes
    * per-dimension clustering).
    */
  def optimizeByZ(cols: Seq[String], targetFiles: Int): Int = {
    val v0 = latestVersion
    val df = readRidPhys(v0)
    val z = graft.operators.ZOrder.zValue(df, cols, bits = 4)
    stampCdcNone(rewriteSnapshot(v0, df.withColumn("_zorder", z)
      .repartitionByRange(targetFiles, col("_zorder"))
      .sortWithinPartitions("_zorder")
      .drop("_zorder")))
  }

  /** Partition-scoped ZORDER (`OPTIMIZE ... WHERE ... ZORDER BY`):
    * Morton-cluster ONLY the files whose partition tuple satisfies
    * `scope`; the rest of the table carries forward untouched.
    * Clustering quality is per-scope — exactly the Delta semantics,
    * and the only affordable form at 100 TB (z-order one day, not the
    * table).
    */
  def optimizeByZ(cols: Seq[String], targetFiles: Int, scope: Column): Int = {
    val v0 = latestVersion.getOrElse(
      throw new IllegalStateException(s"no versions at $root"))
    val entries = entriesOf(v0)
    val chosen = entriesInScope(entries, scope)
    if (chosen.isEmpty) return v0
    val df = withDerived(readEntriesRid(chosen) // DV-applying read
      .withColumnRenamed(ManifestTable.RowIdCol, ManifestTable.RidPhysCol))
    val z = graft.operators.ZOrder.zValue(df, cols, bits = 4)
    val newFiles = newEntries(writeDataFiles(df.withColumn("_zorder", z)
      .repartitionByRange(targetFiles, col("_zorder"))
      .sortWithinPartitions("_zorder")
      .drop("_zorder")))
    stampCdcNone(commitDelta(entries, chosen.map(_.rel).toSet, newFiles))
  }

  /** Auto-OPTIMIZE advisor (the `CALL graft.maintenance_plan` body):
    * read-only layout diagnosis from the manifest + file statuses —
    * file-size histogram, deletion-vector load, leading-zone-map
    * clustering overlap — returning ordered recommendations
    * `(priority, action, reason, command)`. Executes NOTHING: the
    * operator (or a scheduler) reads the plan and runs the commands.
    * O(files) driver work, zero data IO — the same inputs
    * `describeDetail`/`filesDf` serve. A well-laid-out table returns
    * an empty plan.
    */
  def maintenancePlan(smallFileBytes: Long = 32L << 20)
      : Seq[(Int, String, String, String)] = {
    val v0 = latestVersion.getOrElse(return Seq.empty)
    val entries = entriesOf(v0)
    if (entries.isEmpty) return Seq.empty
    val out = Seq.newBuilder[(Int, String, String, String)]
    // 1. small-file load: ≥ 2 files under the threshold bin-pack into
    // fewer (compactSmall itself no-ops below that, so neither should
    // the advice)
    // scoped-command helper: when the need concentrates in a MINORITY
    // of leading-partition values (and that column is a plain identity
    // layout column a SQL predicate can name), recommend the
    // partition-scoped form — at 100 TB the operator should compact
    // the hot partitions, never the table. Returns the extra predicate
    // argument (with leading comma-space) or "" for the unscoped form.
    def scopeArg(affected: Seq[Entry]): String = {
      val lead = partCols.headOption
        .filter(c => !c.contains('(')) // transform names don't parse
        .getOrElse(return "")
      def vals(es: Seq[Entry]): Option[Set[String]] = {
        val vs = es.map(e => partValueOf(e.rel, lead))
        if (vs.exists(v => v.isEmpty || v.get == null)) None
        else Some(vs.map(_.get).toSet)
      }
      (vals(affected), vals(entries)) match {
        case (Some(hot), Some(all))
            if hot.size <= 4 && hot.size * 2 <= all.size =>
          val in = hot.toSeq.sorted
            .map(v => "''" + v.replace("'", "''''") + "''")
            .mkString(", ")
          s", '$lead IN ($in)'"
        case _ => ""
      }
    }
    val sized = entries.map(e =>
      e -> fs.getFileStatus(new Path(root, e.rel)).getLen)
    val small = sized.filter(_._2 < smallFileBytes)
    if (small.size >= 2)
      out += ((1, "compact_small",
        s"${small.size} of ${entries.size} file(s) are under " +
          s"$smallFileBytes bytes (smallest ${small.map(_._2).min}); " +
          "reads pay per-file open/footer cost",
        s"CALL graft.optimize_small('$root', $smallFileBytes, " +
          s"${128L << 20}${scopeArg(small.map(_._1))})"))
    // 2. deletion-vector load: masked rows cost every read an
    // anti-join; past a few percent the rewrite amortizes
    val dvd = entries.filter(_.stats.contains(DvKey))
    val masked = dvd.flatMap(_.stats.get(DvKey))
      .map(s => try s.mx.toLong catch { case _: NumberFormatException => 0L })
      .sum
    val totalRows = {
      val cs = entries.map(_.stats.get(ManifestTable.CountKey))
      if (cs.exists(_.isEmpty)) None
      else try Some(cs.map(_.get.mn.toLong).sum)
      catch { case _: NumberFormatException => None }
    }
    if (masked > 0 && totalRows.forall(t => t > 0 && masked.toDouble / t >= 0.02))
      out += ((2, "reorg_purge",
        s"${dvd.size} file(s) carry deletion vectors masking $masked " +
          s"row(s)${totalRows.map(t => f" (${100.0 * masked / t}%.1f%% of " +
            "the table)").getOrElse("")}; every read pays the anti-join",
        s"CALL graft.reorg('$root', 0.02${scopeArg(dvd)})"))
    // 3. clustering: if the leading zone-map column's per-file
    // [min, max] intervals overlap heavily, range reads cannot prune —
    // a sort/z-order rewrite restores skipping
    allStatsCols.headOption.foreach { c =>
      val stats = entries.map(_.stats.get(c))
      if (entries.size > 4 && stats.forall(_.isDefined)) {
        val kind = stats.head.get.kind
        val sorted = stats.map(_.get).sortWith((a, b) => statCmp(a.mn, b.mn, kind) < 0)
        val overlaps = sorted.sliding(2).count {
          case Seq(a, b) => statCmp(b.mn, a.mx, kind) <= 0
          case _ => false
        }
        if (overlaps.toDouble / (entries.size - 1) > 0.5)
          out += ((3, "zorder",
            s"$overlaps of ${entries.size - 1} adjacent file pairs " +
              s"overlap on zone-map column '$c' — range reads cannot " +
              "skip files",
            s"CALL graft.zorder('$root', " +
              s"'${allStatsCols.take(2).mkString(",")}')"))
      }
    }
    out.result()
  }

  /** L8: change data feed — keyed row-level diff between two committed
    * versions (the Delta CDF / `table_changes` surface): what a
    * downstream consumer must apply to catch up from `vFrom` to `vTo`.
    * Emits `_change_type` ∈ insert | delete | update_preimage |
    * update_postimage. Computed from the two version snapshots (full
    * outer on the keys), so it works for ANY pair of versions — no
    * per-commit change files needed; cost is one shuffle over the two
    * snapshots, read through the same file manifests as time travel.
    */
  def changesBetween(vFrom: Int, vTo: Int, keys: Seq[String]): DataFrame = {
    val pre = read(Some(vFrom))
    val post = read(Some(vTo))
    require(pre.columns.sorted.sameElements(post.columns.sorted),
      "schema changed between versions; diff by key is ambiguous")
    diffByKey(pre, post, keys)
  }

  /** Change rows for ONE commit — `changesBetween(v-1, v, keys)` but
    * O(changed files) instead of O(table): rows of files an adjacent
    * version pair does NOT share (added, removed, or re-pointed with
    * different stats — a DV delete changes the entry, not the path)
    * are the only rows that can differ, so the keyed diff joins just
    * those. A compaction that moves rows verbatim emits nothing; a
    * 100 TB table pays its commit's delta per version, never a
    * snapshot-pair shuffle. This is what the streaming change feed
    * ([[graft.streaming.GraftTableSource]] with `readChangeFeed`)
    * drains per trigger. Assumes `keys` are unique per version, the
    * same contract [[changesBetween]] carries.
    */
  def changesAt(v: Int, keys: Seq[String]): DataFrame =
    changesAt(v, Some(keys))

  /** T15: the generalized form the change feed drains. Resolution
    * order per version: (1) a write-time CDC sidecar (stamped by
    * DML committed after [[enableCdc]]) is read directly — O(recorded
    * change rows), no keys, no join; (2) a zero-change stamp
    * (compaction/clustering/purge) replays as empty; (3) a pure
    * add/remove commit replays keylessly from its file delta; (4)
    * anything else falls back to the keyed per-commit diff — and
    * REFUSES keylessly, naming the fix, rather than guessing row
    * identity.
    */
  def changesAt(v: Int, keysOpt: Option[Seq[String]]): DataFrame = {
    require(versions.contains(v), s"no version $v at $root")
    val cdcTag = versionTag(v, ManifestTable.CdcTagKey)
    cdcTag match {
      case Some(ManifestTable.CdcNoChanges) =>
        return withDeclared(readEntries(entriesOf(v))).limit(0)
          .withColumn("_change_type", lit("insert"))
      case Some(rel) if rel != ManifestTable.CdcFileDiff =>
        return spark.read.parquet(new Path(root, rel).toString)
      case _ => () // filediff resolves below, after the file sets
    }
    val preE = if (v == 0) Seq.empty[Entry] else entriesOf(v - 1)
    val postE = entriesOf(v)
    val preBy = preE.map(e => e.rel -> e).toMap
    val postBy = postE.map(e => e.rel -> e).toMap
    val changed = (preBy.keySet ++ postBy.keySet)
      .filter(r => preBy.get(r) != postBy.get(r))
    val preChanged = preE.filter(e => changed(e.rel))
    val postChanged = postE.filter(e => changed(e.rel))
    // pure-add / pure-remove commits (appends; full deletes) skip the
    // join: with unique keys every row of a side-exclusive file set is
    // an insert (resp. delete). The initial snapshot (v0) is the big
    // win — one scan, no shuffle.
    if (preChanged.isEmpty && postChanged.isEmpty)
      return withDeclared(readEntries(postE)).limit(0)
        .withColumn("_change_type", lit("insert"))
    if (preChanged.isEmpty)
      return withDeclared(readEntries(postChanged))
        .withColumn("_change_type", lit("insert"))
    if (postChanged.isEmpty)
      return withDeclared(readEntries(preChanged))
        .withColumn("_change_type", lit("delete"))
    val pre = withDeclared(readEntries(preChanged))
    val post = withDeclared(readEntries(postChanged))
    // a column added by this commit's files is null on the pre side
    // (same null-fill contract the streaming append path uses)
    val allCols = (pre.schema ++ post.schema.filterNot(f =>
      pre.columns.contains(f.name))).toSeq
    def pad(df: DataFrame) = allCols.foldLeft(df) { (d, f) =>
      if (d.columns.contains(f.name)) d
      else d.withColumn(f.name, lit(null).cast(f.dataType))
    }
    // T15: a whole-file-replacement stamp — removed files' live rows
    // are the deletes, added files' rows the inserts, keylessly and
    // at O(changed files). Defensive invariant: the stamp is only
    // ever written for commits that re-point nothing — a violated
    // stamp (corruption, an out-of-band tag write) must NOT brick the
    // version: with keys the keyed diff below still answers exactly;
    // only the keyless read has no recourse and refuses.
    if (cdcTag.contains(ManifestTable.CdcFileDiff)) {
      val shared = preChanged.map(_.rel).toSet
        .intersect(postChanged.map(_.rel).toSet)
      if (shared.isEmpty)
        return pad(pre).withColumn("_change_type", lit("delete"))
          .unionByName(pad(post).withColumn("_change_type", lit("insert")))
      if (keysOpt.isEmpty) throw new IllegalArgumentException(
        s"version $v carries a file-diff CDC stamp but re-points " +
          s"${shared.size} file(s) — invalid stamp; pass keys for a " +
          "keyed diff")
      // else: fall through to the keyed diff, which ignores the stamp
    }
    keysOpt match {
      case Some(keys) => diffByKey(pad(pre), pad(post), keys)
      case None =>
        // T16 row tracking: an in-place commit with no sidecar diffs
        // by the STABLE ROW ID — re-pointed files resolve the same
        // ids on both sides (base + row index is DV-independent), and
        // update copies carry their old id physically, so the keyed
        // kernel pairs pre/post exactly. Refuses (naming every fix)
        // only when a touched file predates row tracking: NULL ids
        // under the null-safe join would cross-match unrelated rows.
        val preR = withDeclared(readEntriesRid(preChanged))
        val postR = withDeclared(readEntriesRid(postChanged))
        // a #rid-stamped file can never yield a NULL id (base + index
        // is total), so the probe jobs run only for files PREDATING
        // row tracking, whose physical column may or may not cover
        val allStamped = (preChanged ++ postChanged)
          .forall(_.stats.contains(ManifestTable.RidKey))
        def hasNullIds(df: DataFrame): Boolean =
          df.filter(col(ManifestTable.RowIdCol).isNull).limit(1)
            .count() > 0
        if (!allStamped && (hasNullIds(preR) || hasNullIds(postR)))
          throw new IllegalArgumentException(
            s"version $v at $root changed rows in place, carries no " +
              "change-data sidecar (CDC was not enabled when it " +
              "committed), and a touched file predates row tracking " +
              "(no row-id stamp) — pass keys for a keyed diff, " +
              "enableCdc() before such commits, or rewrite the file " +
              "(compactSmall/reorgPurge) to materialize row ids")
        val allColsR = (preR.schema ++ postR.schema.filterNot(f =>
          preR.columns.contains(f.name))).toSeq
        def padR(df: DataFrame) = allColsR.foldLeft(df) { (d, f) =>
          if (d.columns.contains(f.name)) d
          else d.withColumn(f.name, lit(null).cast(f.dataType))
        }
        diffByKey(padR(preR), padR(postR), Seq(ManifestTable.RowIdCol))
          .drop(ManifestTable.RowIdCol)
    }
  }

  /** Keyed row-level diff of two same-schema frames — the CDF kernel
    * shared by [[changesBetween]] (snapshot pair) and [[changesAt]]
    * (changed files of one commit).
    */
  private def diffByKey(pre: DataFrame, post: DataFrame,
      keys: Seq[String]): DataFrame = {
    val cols = pre.columns.toSeq
    val preK = pre.select(cols.map(col): _*)
    val postK = post.select(cols.map(col): _*)
    val cond = keys.map(k => col(s"p.$k") <=> col(s"q.$k")).reduce(_ && _)
    val joined = preK.as("p").join(postK.as("q"), cond, "full_outer")
    val preAbsent = keys.map(k => col(s"p.$k").isNull).reduce(_ && _)
    val postAbsent = keys.map(k => col(s"q.$k").isNull).reduce(_ && _)
    val changed = cols.filterNot(keys.contains)
      .map(c => !(col(s"p.$c") <=> col(s"q.$c")))
      .foldLeft(lit(false))(_ || _)
    // ONE pass over the join: each matched-and-changed key explodes to
    // (preimage, postimage); inserts/deletes emit one row; unchanged
    // keys emit none — no re-scan of the join per change type
    val preRow = struct(cols.map(c => col(s"p.$c").as(c)): _*)
    val postRow = struct(cols.map(c => col(s"q.$c").as(c)): _*)
    def tag(row: Column, t: String) =
      struct(row.as("row"), lit(t).as("t"))
    joined
      .select(explode(
        when(preAbsent, array(tag(postRow, "insert")))
          .when(postAbsent, array(tag(preRow, "delete")))
          .when(changed, array(tag(preRow, "update_preimage"),
            tag(postRow, "update_postimage")))
        // no otherwise: unchanged keys yield NULL and explode drops them
      ).as("e"))
      .select(col("e.row.*"), col("e.t").as("_change_type"))
  }

  /** Version-scoped tag (small key=value sidecar in the log dir, e.g.
    * the incremental-view as-of marker). Written BEFORE the version it
    * describes commits: an orphaned tag for a never-committed version
    * is harmless and simply overwritten on retry, so tag-then-commit
    * yields an atomic (version, tag) pair under crash-replay.
    */
  def putVersionTag(version: Int, key: String, value: String): Unit = {
    fs.mkdirs(logDir)
    val p = new Path(logDir, f"tag-$key-v$version%05d")
    val tmp = new Path(logDir, s".tmp-tag-${UUID.randomUUID()}")
    val out = fs.create(tmp, false)
    try out.write(value.getBytes("UTF-8")) finally out.close()
    fs.delete(p, false) // retry after a crash overwrites the orphan
    if (!fs.rename(tmp, p))
      throw new IllegalStateException(s"tag commit $key@v$version failed")
  }

  def versionTag(version: Int, key: String): Option[String] = {
    val p = new Path(logDir, f"tag-$key-v$version%05d")
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
      finally in.close()
    }
  }

  /** L11: RESTORE — roll the table back to an earlier version by
    * committing a NEW version that references exactly that version's
    * files (the Delta `RESTORE TABLE … TO VERSION AS OF` contract:
    * history is preserved, nothing is rewritten, and the bad versions
    * stay readable for forensics until VACUUM). O(manifest), zero data
    * movement.
    */
  def restore(version: Int): Int = {
    require(versions.contains(version), s"no version $version at $root")
    val target = entriesOf(version)
    val v = commit(target, stampNew = false)
    // T15: a restore's changes derive keylessly from its file delta —
    // UNLESS a shared file's entry changed across it (a DV re-point
    // straddling the restore window: the dead-row set can't be
    // attributed at file granularity). Then the keyed diff remains
    // the fallback. The check compares against the ACTUAL previous
    // version — commit() retries version races, so a concurrent
    // commit may have landed after any pre-commit snapshot; deciding
    // the stamp from v-1 itself cannot be raced.
    val prevBy = entriesOf(v - 1).map(e => e.rel -> e).toMap
    val repointed = target.filter(e => prevBy.get(e.rel).exists(_ != e))
    if (repointed.isEmpty) stampCdcFileDiff(v) else v
  }

  // ---- T15: write-time change-data capture (the Delta `_change_data` model) ----

  private val cdcMarker = new Path(logDir, "cdc-enabled")

  /** Enable write-time CDC: from here on, every row-level DML commit
    * (DELETE / UPDATE / MERGE INTO / index refresh) persists its exact
    * change rows to a `_graft_cdc/` sidecar at commit time — the Delta
    * `delta.enableChangeDataFeed` contract. The change feed then
    * replays those commits WITHOUT a `keys` option and at O(recorded
    * change rows), never a per-version diff join; row-preserving
    * maintenance (compaction, clustering, purge, spec rewrite) stamps
    * a zero-change marker so it replays as nothing. Appends need no
    * sidecar (added files ARE the inserts). The cost: DML materializes
    * its matched rows once more to write them — O(changed rows), the
    * price Delta pays for its change files. Whole-file-replacement
    * commits (`write(_, "overwrite")`, `restore`, the legacy
    * partition-rewrite `merge`) don't write a sidecar: they stamp
    * [[ManifestTable.CdcFileDiff]] and the feed derives their changes
    * from the file delta (removed rows → delete, added rows → insert
    * — the Delta INSERT-OVERWRITE representation; exact in effect,
    * coarse for rewrites carrying rows verbatim). Only commits that
    * PREDATE enablement still need `keys` to replay.
    */
  def enableCdc(): Unit = {
    fs.mkdirs(logDir)
    if (!fs.exists(cdcMarker)) {
      val out = fs.create(cdcMarker, false)
      try out.write("1".getBytes("UTF-8")) finally out.close()
    }
  }

  /** Stop capturing (existing sidecars stay readable). */
  def disableCdc(): Unit = fs.delete(cdcMarker, false): Unit

  def cdcEnabled: Boolean = fs.exists(cdcMarker)

  /** Persist a frame of change rows (table columns + `_change_type`)
    * as this commit's CDC sidecar; returns the sidecar's relative
    * path. Called BEFORE the manifest commit — a crash in between
    * leaks an untagged sidecar that [[vacuum]] sweeps.
    */
  private def writeCdcFile(cdc: DataFrame): String = {
    val rel = s"_graft_cdc/${UUID.randomUUID()}.parquet"
    // small change sets dominate; cap the sidecar's file count like
    // the DV path (the default 32 shuffle partitions would mint 32
    // tiny files per DML commit; coalesce past 16 is a no-op)
    cdc.coalesce(16).write.options(ManifestTable.InternalWriteOptions)
      .parquet(new Path(root, rel).toString)
    rel
  }

  /** Stamp a freshly committed row-preserving version (compaction,
    * clustering, purge, layout rewrite) as changing nothing, so a
    * keyless change feed replays it as empty. Only ever stamps a
    * version the caller just minted — never an existing one.
    */
  private def stampCdcNone(v: Int): Int = {
    if (cdcEnabled) putVersionTag(v, ManifestTable.CdcTagKey,
      ManifestTable.CdcNoChanges)
    v
  }

  /** Stamp a freshly committed whole-file-replacement version
    * (overwrite / restore / legacy merge rewrite) as keylessly
    * derivable from its file delta — see [[ManifestTable.CdcFileDiff]].
    * Valid ONLY when no shared file was re-pointed by the commit
    * (fresh-uuid rewrites guarantee it; restore checks explicitly).
    */
  private def stampCdcFileDiff(v: Int): Int = {
    if (cdcEnabled) putVersionTag(v, ManifestTable.CdcTagKey,
      ManifestTable.CdcFileDiff)
    v
  }

  // ---- L36: named immutable version refs (the Iceberg TAG surface) ----

  /** Cross-process ref lock (r16 verdict item 5): every ref mutation —
    * tag create/drop, branch stage/drop, vacuum's snapshot-and-delete
    * window — runs inside BOTH the in-JVM monitor (the fast path, as
    * before) and a create-exclusive `refs.lock` FILE in the log dir,
    * so a tagger in another PROCESS now WAITS for a running vacuum
    * instead of racing its delete phase (the previously documented
    * single-maintenance-writer caveat). `create(overwrite = false)`
    * is atomic-exclusive on HDFS but only exists-then-open on
    * LocalFileSystem (and not exclusive on S3A), so acquisition is
    * READ-BACK FENCED: the winner is whoever's token survives in the
    * file — at most one process ever believes it holds the lock, and
    * the heartbeat re-verifies the token every beat, aborting loudly
    * if the lock was broken and re-taken while held. Reentrant per
    * thread (nested ref mutations no-op re-enter, see
    * [[ManifestTable.refLocksHeldByThread]]).
    *
    * Liveness: the holder heartbeats the file's mtime every
    * [[ManifestTable.RefLockStaleMs]]/3; a lock whose mtime ages past
    * the horizon belonged to a crashed process and is BROKEN by
    * rename-to-tombstone (rename is atomic — of N concurrent breakers
    * exactly one wins; the losers loop back to the create race), so an
    * abandoned lock costs one TTL, never a deadlock. Acquisition fails
    * loudly after [[ManifestTable.RefLockAcquireMs]].
    */
  private def withRefLock[T](body: => T): T = {
    val lockKey = fs.makeQualified(logDir).toString + "#refs"
    // reentrancy: the JVM monitor below reenters fine, but the FILE
    // lock would then deadlock against our own heartbeat (create fails
    // forever on a lock we keep fresh) — a nested ref mutation (e.g. a
    // dropTag from inside a vacuum callback) no-op re-enters instead
    if (ManifestTable.refLocksHeldByThread.get().contains(lockKey))
      return body
    ManifestTable.lockFor(lockKey).synchronized {
      fs.mkdirs(logDir)
      val lockPath = new Path(logDir, "refs.lock")
      val token = UUID.randomUUID().toString
      val deadline = System.currentTimeMillis() +
        ManifestTable.RefLockAcquireMs
      var held = false
      while (!held) {
        try {
          // ATOMICITY NOTE (the tryPublish caveat's lock-file twin):
          // create(overwrite=false) is atomic-exclusive on HDFS and
          // most object stores, but LocalFileSystem implements it as
          // exists-then-open — two FOREIGN processes can both pass in
          // a narrow window. The read-back fence below closes it:
          // after writing, re-read the file and only treat the lock
          // as held if OUR token survived (at most one writer's full
          // token line is the final content, so at most one holder).
          val out = fs.create(lockPath, false) // exclusive where the FS can
          try out.write(
            s"$token ${ProcessHandle.current().pid()}".getBytes("UTF-8"))
          finally out.close()
          val mine =
            try readLogLines(lockPath).headOption.exists(_.startsWith(token))
            catch { case _: java.io.IOException => false }
          if (mine) held = true
          else Thread.sleep(50) // lost a double-create race: re-queue
        } catch {
          case _: java.io.IOException =>
            val st =
              try Some(fs.getFileStatus(lockPath))
              catch { case _: java.io.FileNotFoundException => None }
            st match {
              case Some(s) if System.currentTimeMillis() -
                  s.getModificationTime > ManifestTable.RefLockStaleMs =>
                // presumed-dead holder: break by atomic rename — only
                // one breaker wins. FENCED: rename preserves mtime, so
                // the tombstone's mtime proves WHICH file was renamed;
                // a breaker that raced another breaker's fresh lock
                // (observed stale → someone else broke it → a new
                // holder created → we renamed THAT) sees a fresher
                // tombstone and restores it instead of deleting — two
                // processes can never both believe they broke through
                val tomb = new Path(logDir,
                  s".tmp-broken-lock-${UUID.randomUUID()}")
                try {
                  if (fs.rename(lockPath, tomb)) {
                    val t = fs.getFileStatus(tomb)
                    if (t.getModificationTime == s.getModificationTime)
                      fs.delete(tomb, false): Unit // the stale one: gone
                    else if (!fs.rename(tomb, lockPath))
                      fs.delete(tomb, false): Unit // lost the restore race
                  }
                } catch { case _: java.io.IOException => () }
              case _ =>
                if (System.currentTimeMillis() > deadline)
                  throw new IllegalStateException(
                    s"ref lock at $lockPath held past the " +
                      s"${ManifestTable.RefLockAcquireMs} ms acquire " +
                      "budget — a foreign maintenance writer is stuck " +
                      "or its host died mid-heartbeat; inspect and " +
                      "delete the lock file if so")
                Thread.sleep(50)
            }
        }
      }
      // heartbeat so a LONG vacuum is never mistaken for a dead holder.
      // NonFatal-proof: an FS whose setTimes throws Unsupported must
      // not kill the thread silently (frozen mtime → stale-break →
      // two maintenance writers). Each beat also re-reads the token:
      // a lock broken and re-taken while we were paused flips `lost`,
      // and the holder aborts LOUDLY after the body instead of
      // pretending its mutations ran exclusively.
      @volatile var stop = false
      @volatile var lost = false
      val beat = new Thread(() => {
        while (!stop && !lost) {
          try {
            val stillMine = readLogLines(lockPath).headOption
              .exists(_.startsWith(token))
            if (!stillMine) lost = true
            else fs.setTimes(lockPath, System.currentTimeMillis(), -1)
          } catch { case scala.util.control.NonFatal(_) => () }
          val napMs = math.max(1000L, ManifestTable.RefLockStaleMs / 3)
          var slept = 0L
          while (!stop && slept < napMs) { Thread.sleep(200); slept += 200 }
        }
      }, "graft-ref-lock-heartbeat")
      beat.setDaemon(true)
      beat.start()
      ManifestTable.refLocksHeldByThread.get().add(lockKey): Unit
      try {
        val r = body
        if (lost) throw new IllegalStateException(
          s"ref lock at $lockPath was broken and re-taken while held " +
            "(heartbeat token mismatch) — this mutation may have " +
            "overlapped a foreign maintenance writer; inspect the log")
        r
      } finally {
        ManifestTable.refLocksHeldByThread.get().remove(lockKey): Unit
        stop = true
        beat.join()
        // release only OUR lock — by RENAME-then-verify, not
        // read-then-delete: a holder paused past the TTL may have been
        // broken and replaced, and with the heartbeat already joined a
        // pause between a read and a delete could kill the NEW
        // holder's lock. Rename is atomic: whatever file we renamed is
        // frozen under the private name, so the token check can never
        // race — ours deletes, a foreigner's is restored
        val tomb = new Path(logDir, s".tmp-release-${UUID.randomUUID()}")
        try {
          if (fs.rename(lockPath, tomb)) {
            val mine =
              try readLogLines(tomb).headOption.exists(_.startsWith(token))
              catch { case _: java.io.IOException => false }
            if (mine) fs.delete(tomb, false): Unit
            else if (!fs.rename(tomb, lockPath))
              fs.delete(tomb, false): Unit // lost the restore race
          }
        } catch { case _: java.io.IOException => () }
      }
    }
  }

  private def refFile(name: String): Path = {
    require(name.matches("[A-Za-z0-9_\\-]+"), s"bad tag name: $name")
    new Path(logDir, s"ref-$name")
  }

  /** Tag `version` (default: latest) as `name` — an immutable named
    * ref (Iceberg's `CREATE TAG`): audit snapshots, model-training
    * data pins, release baselines. Tags are refs, not copies — one
    * tiny file in the log — and they RETAIN: [[vacuum]] keeps a tagged
    * version's data files, DV sidecars and a standalone manifest alive
    * past the retain horizon until the tag is dropped. Re-tagging an
    * existing name refuses (immutability is the point; drop first).
    */
  def createTag(name: String, version: Option[Int] = None): Int = {
    // all-digit names are unreachable through SQL time travel:
    // `VERSION AS OF '2024'` resolves digit-only strings as version
    // numbers first (graft.sql.GraftCatalog.loadTable), so a tag
    // named '2024' would be silently shadowed — refuse at creation
    require(name.exists(c => c < '0' || c > '9'),
      s"tag name '$name' is all digits — it would be shadowed by " +
        "numeric version resolution in VERSION AS OF; include at " +
        "least one non-digit character")
    val v = version.getOrElse(latestVersion.getOrElse(
      throw new IllegalArgumentException(s"no committed versions at $root")))
    require(versions.contains(v), s"no version $v at $root")
    val p = refFile(name)
    fs.mkdirs(logDir)
    val tmp = new Path(logDir, s".tmp-ref-${UUID.randomUUID()}")
    val out = fs.create(tmp, false)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    // rename OVERWRITES on a local FS: serialize the exists-check +
    // rename pair (the branch-staging discipline) so two taggers
    // cannot both win. ONE lock for all refs, shared with [[vacuum]]'s
    // delete phase: a tag created mid-vacuum must either be seen by
    // vacuum's tag re-read or wait until its deletes are done — never
    // land between them and dangle over deleted files. [[withRefLock]]
    // extends the guarantee across PROCESSES via the create-exclusive
    // refs.lock file (r16 verdict item 5).
    withRefLock {
      if (fs.exists(p) || !fs.rename(tmp, p)) {
        fs.delete(tmp, false)
        throw new IllegalArgumentException(
          s"tag $name already exists at $root (tags are immutable; " +
            "dropTag first to re-point)")
      }
    }
    v
  }

  /** The version a tag points at, if the tag exists. */
  def tagRef(name: String): Option[Int] = {
    val p = refFile(name)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toInt)
      finally in.close()
    }
  }

  /** All tags, name → version, name-ordered. */
  def tagRefs: Seq[(String, Int)] =
    if (!fs.exists(logDir)) Seq.empty
    else fs.listStatus(logDir).map(_.getPath.getName).toSeq
      .filter(_.startsWith("ref-")).map(_.stripPrefix("ref-")).sorted
      .flatMap(n => tagRef(n).map(n -> _))

  /** Time-travel read by tag (`VERSION AS OF '<tag>'`). */
  def readTagged(name: String): DataFrame =
    read(Some(tagRef(name).getOrElse(throw new IllegalArgumentException(
      s"no tag $name at $root (tags: ${tagRefs.map(_._1).mkString(", ")})"))))

  /** Drop a tag: the ref file goes now; the version's files become
    * vacuum-eligible again (nothing is deleted here).
    */
  def dropTag(name: String): Unit = withRefLock {
    val p = refFile(name)
    require(fs.exists(p), s"no tag $name at $root")
    fs.delete(p, false): Unit
  }

  /** L12: SHALLOW CLONE — create an independent table at `destRoot`
    * whose v0 references THIS table's current data files by absolute
    * path (no copy; Delta SHALLOW CLONE). The clone's own writes land
    * under its own root and never touch the source; the source must
    * not be VACUUMed below the cloned version while the clone lives —
    * the same lifetime contract Delta documents. O(manifest).
    */
  def shallowClone(destRoot: String): ManifestTable = {
    val dest = new ManifestTable(spark, destRoot, partitionCol,
      statsCol, statsCols, bloomCol, bloomBits, bloomHashes, partitionCols,
      partitionSpec)
    val v = latestVersion.getOrElse(
      throw new IllegalStateException(s"no versions at $root"))
    // qualify: clone entries must resolve against the SOURCE root —
    // data paths AND deletion-vector sidecar refs (a root-relative DV
    // ref would resolve against the CLONE's root and resurrect the
    // source's deleted rows)
    val absEntries = entriesOf(v).map { e =>
      e.copy(
        rel = fs.makeQualified(new Path(root, e.rel)).toString,
        stats = e.stats.map {
          case (DvKey, s) =>
            DvKey -> s.copy(mn = fs.makeQualified(new Path(root, s.mn)).toString)
          case kv => kv
        })
    }
    dest.commitEntries(absEntries.map(e =>
      (e.rel, e.stats.map { case (c, s) => (c, s.mn, s.mx, s.kind) }.toSeq)))
    dest
  }

  /** Internal cross-instance commit hook for [[shallowClone]] (the
    * clone's Entry type is path-compatible: absolute paths survive
    * `new Path(root, rel)` resolution untouched).
    */
  private[lake] def commitEntries(
      es: Seq[(String, Seq[(String, String, String, String)])]): Int =
    commit(es.map { case (rel, stats) =>
      Entry(rel, stats.map { case (c, mn, mx, k) => c -> ColStats(mn, mx, k) }.toMap)
    }, stampNew = false)

  /** L4: VACUUM — delete data files unreferenced by the `retain` most
    * recent versions, and drop manifests older than those. Returns
    * deleted file paths — use [[vacuumCount]] when the table is large
    * enough that the path list itself should never sit on the driver.
    * `dryRun` lists what WOULD be deleted without touching anything
    * (the Delta `VACUUM ... DRY RUN` safety valve — the check an
    * operator runs before an irreversible cleanup, e.g. to confirm no
    * shallow clone still references the files).
    */
  def vacuum(retain: Int = 1, dryRun: Boolean = false,
      minAgeMs: Long = ManifestTable.DefaultVacuumMinAgeMs): Seq[String] =
    vacuumImpl(retain, dryRun, minAgeMs) { (data, _, other) =>
      data.collect().toSeq ++ other
    }

  /** Scale form of [[vacuum]]: identical work, but only the COUNT of
    * deleted files crosses the driver — the referenced set, the
    * candidate list and the deleted-path list stay distributed
    * Datasets end-to-end. At 10⁷ files [[vacuum]]'s returned Seq is
    * gigabytes of path strings on the driver; a maintenance job at
    * that scale wants this form (see `graft.tools.VacuumScale` for the
    * measured heap evidence).
    */
  def vacuumCount(retain: Int = 1, dryRun: Boolean = false,
      minAgeMs: Long = ManifestTable.DefaultVacuumMinAgeMs): Long =
    vacuumImpl(retain, dryRun, minAgeMs) { (_, dataCount, other) =>
      dataCount + other.size
    }

  /** [[vacuumCount]] that additionally persists the deleted (or, with
    * `dryRun`, would-be-deleted) path list as a single-column parquet
    * table at `outPath` — the audit-trail form for big tables, written
    * executor-to-disk without driver materialization.
    */
  def vacuumReport(outPath: String, retain: Int = 1,
      dryRun: Boolean = false,
      minAgeMs: Long = ManifestTable.DefaultVacuumMinAgeMs): Long = {
    import spark.implicits._
    vacuumImpl(retain, dryRun, minAgeMs) { (data, dataCount, other) =>
      data.toDF("path")
        .unionByName(other.toDF("path"))
        .write.mode("overwrite").parquet(outPath)
      dataCount + other.size
    }
  }

  /** The vacuum engine behind [[vacuum]]/[[vacuumCount]]. `finish`
    * receives (persisted Dataset of deleted data-file paths, its
    * count, driver-side list of deleted sidecar/manifest/tmp paths)
    * and shapes the caller's result; it runs before unpersist, under
    * the ref lock.
    *
    * Scale: NOTHING O(data files) is ever materialized on the driver.
    *  - The data-tree listing fans out over first-level subdirs as a
    *    Spark job (a 10⁶–10⁷-file table lists in parallel, not hours
    *    of serialized driver `listStatus`).
    *  - The referenced set is built by parsing the kept versions'
    *    manifest/delta chain files IN EXECUTORS: the driver only
    *    enumerates the chain (O(keepVs × checkpoint cadence) file
    *    paths); a distributed groupBy folds each (kept version, rel)
    *    to its last add/remove event — ties (a re-point's -/+ pair in
    *    one delta) resolve to "referenced", the conservative side.
    *  - Candidates are the listing anti-joined against that referenced
    *    DataFrame, and the delete phase is a `mapPartitions` over the
    *    surviving Dataset; only the count is collected.
    * Sidecar sweeps (DV, CDC) and the manifest/tmp tail stay
    * driver-side: they are one `listStatus` each, O(sidecars) —
    * documented and bounded.
    *
    * Retention horizon (the Delta deletedFileRetentionDuration
    * pattern): an unreferenced file younger than `minAgeMs` may belong
    * to an IN-FLIGHT commit — a concurrent writer stages data files
    * and DV sidecars BEFORE its manifest rename, and vacuuming them
    * leaves the winning commit unreadable. Age gates on modification
    * time; tests pass minAgeMs = 0 for immediacy.
    *
    * Concurrency: the tag snapshot, referenced-set build and every
    * delete run under the shared ref lock (see [[createTag]]) — an
    * in-process `createTag` cannot land between the snapshot and the
    * deletes and be left dangling. Cross-process taggers racing a
    * vacuum are the documented single-maintenance-writer caveat.
    */
  private def vacuumImpl[T](retain: Int, dryRun: Boolean, minAgeMs: Long)(
      finish: (Dataset[String], Long, Seq[String]) => T): T = {
    val cutoff = System.currentTimeMillis() - minAgeMs
    // ---- phase 1 (no lock): distributed data-tree listing ----
    // serializable conf snapshot for executor-side FileSystem access;
    // a local val so task closures capture it, never `this`
    val confMap: Map[String, String] = {
      val c = spark.sessionState.newHadoopConf()
      val it = c.iterator()
      val b = Map.newBuilder[String, String]
      while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue }
      b.result()
    }
    import spark.implicits._
    val listedDf: DataFrame = {
      if (!fs.exists(dataDir))
        Seq.empty[(String, Long)].toDF("path", "mtime")
      else {
        val top = fs.listStatus(dataDir).toSeq
        val (subdirs, files) = top.partition(_.isDirectory)
        val topRows = files.map(st =>
          (fs.makeQualified(st.getPath).toString, st.getModificationTime))
          .toDF("path", "mtime")
        if (subdirs.isEmpty) topRows
        else {
          val dirStrs = subdirs.map(_.getPath.toString)
          val slices = math.max(1, math.min(dirStrs.size,
            4 * spark.sparkContext.defaultParallelism))
          spark.sparkContext.parallelize(dirStrs, slices).flatMap { d =>
            val p = new org.apache.hadoop.fs.Path(d)
            val tfs = p.getFileSystem(ManifestTable.confFromMap(confMap))
            val out = scala.collection.mutable.ArrayBuffer[(String, Long)]()
            def walk(q: org.apache.hadoop.fs.Path): Unit =
              tfs.listStatus(q).foreach { st =>
                if (st.isDirectory) walk(st.getPath)
                else out += ((tfs.makeQualified(st.getPath).toString,
                  st.getModificationTime))
              }
            walk(p)
            out
          }.toDF("path", "mtime").unionByName(topRows)
        }
      }
    }
    // materialize the listing BEFORE taking the ref lock — the lock
    // must not be held for the long part of the job
    val listed = listedDf.persist()
    listed.count(): Unit
    var folded: DataFrame = null
    var matDeleted: Dataset[String] = null
    try {
      withRefLock {
        val vs = versions
        // named tags RETAIN their versions (Iceberg's tag-retention
        // contract): a tagged version's files, DV sidecars and manifest
        // survive any retain horizon until the tag is dropped. Read
        // UNDER the ref lock: a concurrent in-process createTag either
        // lands before this snapshot or waits out the deletes.
        val taggedVs = tagRefs.map(_._2).filter(vs.contains).toSet
        val keepVs = (vs.takeRight(retain) ++ taggedVs).distinct.sorted
        // chain descriptors for every kept version — the same
        // checkpoint-or-nearest-below resolution [[entriesOf]] walks,
        // but only the FILE PATHS are enumerated driver-side; their
        // contents are parsed in executors. Staged WAP branches count
        // as references — their files are pre-publish, not garbage
        // (all-adds, so they ride as pseudo-manifests).
        val chainFiles: Seq[(Int, Int, String, Boolean)] =
          keepVs.flatMap { v =>
            if (fs.exists(manifestPath(v)))
              Seq((v, v, manifestPath(v).toString, true))
            else {
              var s = v - 1
              while (s >= 0 && !fs.exists(manifestPath(s))) s -= 1
              if (s < 0) throw new IllegalStateException(
                s"no checkpoint manifest at or below v$v under $logDir")
              (v, s, manifestPath(s).toString, true) +:
                (s + 1 to v).map(d => (v, d, deltaPath(d).toString, false))
            }
          } ++ branches.zipWithIndex.map { case (b, i) =>
            (-1 - i, 0, branchFile(b).toString, true)
          }
        val encDv = java.net.URLEncoder.encode(ManifestTable.DvKey, "UTF-8")
        val rootStr = root.toString
        val events: DataFrame =
          if (chainFiles.isEmpty)
            Seq.empty[(Int, String, Int, Int, String)]
              .toDF("keepV", "rel", "ver", "add", "dv")
          else {
            val slices = math.max(1, math.min(chainFiles.size,
              4 * spark.sparkContext.defaultParallelism))
            spark.sparkContext.parallelize(chainFiles, slices)
              .flatMap { case (keepV, ver, pathStr, isManifest) =>
                val p = new org.apache.hadoop.fs.Path(pathStr)
                val tfs = p.getFileSystem(ManifestTable.confFromMap(confMap))
                val in = tfs.open(p)
                // drop '#'-metadata lines (the `#ict` commit stamp) —
                // they are commit-level, not file references
                val lines =
                  try scala.io.Source.fromInputStream(in, "UTF-8")
                    .getLines()
                    .filter(l => l.nonEmpty && !l.startsWith("#")).toList
                  finally in.close()
                // rel + DV ref only — zone-map stats are irrelevant to
                // reachability, so the parse stays a cheap split
                def parseAdd(entryLine: String): (String, String) = {
                  val fields = entryLine.split('\t')
                  val dv = fields.iterator.drop(1)
                    .find(_.startsWith(encDv + "="))
                    .map { f =>
                      java.net.URLDecoder.decode(
                        f.substring(encDv.length + 1).split(':')(0), "UTF-8")
                    }.orNull
                  (fields(0), dv)
                }
                lines.map { line =>
                  if (isManifest) {
                    val (rel, dv) = parseAdd(line)
                    (keepV, rel, ver, 1, dv)
                  } else if (line.startsWith("-\t"))
                    (keepV, line.substring(2).split('\t')(0), ver, 0,
                      null: String)
                  else if (line.startsWith("+\t")) {
                    val (rel, dv) = parseAdd(line.substring(2))
                    (keepV, rel, ver, 1, dv)
                  } else throw new IllegalStateException(
                    s"bad delta line in $pathStr: $line")
                }
              }.toDF("keepV", "rel", "ver", "add", "dv")
          }
        // last event per (kept version, rel) wins: within a version a
        // re-point's -/+ pair ties on `ver`, and add=1 > remove=0
        // sorts the add on top — the conservative (keep) side
        folded = events.groupBy("keepV", "rel")
          .agg(max(struct(col("ver"), col("add"), col("dv"))).as("last"))
          .filter(col("last.add") === 1)
          .persist()
        folded.count(): Unit
        // qualify both sides: manifest paths are scheme-less, listStatus
        // returns fully-qualified (file:/…) paths — done in executors,
        // so the referenced set never exists as a driver collection
        val refPaths = folded.select("rel").distinct().as[String]
          .mapPartitions { it =>
            val conf = ManifestTable.confFromMap(confMap)
            val rootP = new org.apache.hadoop.fs.Path(rootStr)
            val rfs = rootP.getFileSystem(conf)
            it.map(rel => rfs.makeQualified(
              new org.apache.hadoop.fs.Path(rootP, rel)).toString)
          }.toDF("path")
        // distributed anti-join: the listed tree minus the referenced
        // set minus the too-young — then the delete phase runs
        // DIRECTLY on the surviving Dataset; no driver round-trip
        val survivors = listed
          .filter(col("mtime") < cutoff && col("path").endsWith(".parquet"))
          .join(refPaths, Seq("path"), "left_anti")
          .select("path").as[String]
        val deletedData =
          if (dryRun) survivors
          else survivors.mapPartitions { it =>
            val conf = ManifestTable.confFromMap(confMap)
            it.map { s =>
              val p = new org.apache.hadoop.fs.Path(s)
              p.getFileSystem(conf).delete(p, false)
              s
            }
          }
        // persist + count forces every delete NOW, under the lock, and
        // pins the path list executor-side for callers that want it
        matDeleted = deletedData.persist()
        val dataCount = matDeleted.count()
        // sidecar / manifest / tmp cleanup stays a driver list —
        // O(sidecars + versions), never O(data files)
        val deleted = scala.collection.mutable.ArrayBuffer[String]()
        // deletion-vector sidecars unreferenced by any kept entry go
        // too (a sidecar is a directory written by Spark — removed
        // whole). Live DV refs come out of the SAME distributed fold —
        // the winning add's DV stat — collected at O(live sidecars).
        val dvReferenced = folded.filter(col("last.dv").isNotNull)
          .select(col("last.dv")).distinct().as[String].collect()
          .map(r => fs.makeQualified(new Path(root, r)).toString).toSet
        if (fs.exists(dvDir)) fs.listStatus(dvDir).foreach { st =>
          if (st.getModificationTime < cutoff &&
              !dvReferenced.contains(fs.makeQualified(st.getPath).toString)) {
            if (!dryRun) fs.delete(st.getPath, true)
            deleted += st.getPath.toString
          }
        }
        // CDC sidecars: kept versions' stamps are the live references;
        // everything else old enough goes — dropped versions' change
        // files and crash leaks (a commit that died between sidecar
        // write and manifest rename)
        val cdcReferenced = keepVs
          .flatMap(v => versionTag(v, ManifestTable.CdcTagKey))
          .filter(_ != ManifestTable.CdcNoChanges)
          .map(r => fs.makeQualified(new Path(root, r)).toString).toSet
        if (fs.exists(cdcDir)) fs.listStatus(cdcDir).foreach { st =>
          if (st.getModificationTime < cutoff &&
              !cdcReferenced.contains(fs.makeQualified(st.getPath).toString)) {
            if (!dryRun) fs.delete(st.getPath, true)
            deleted += st.getPath.toString
          }
        }
        vacuumManifests(vs, keepVs, taggedVs, retain, dryRun, cutoff, deleted)
        finish(matDeleted, dataCount, deleted.toSeq)
      }
    } finally {
      listed.unpersist(): Unit
      if (folded != null) folded.unpersist(): Unit
      if (matDeleted != null) matDeleted.unpersist(): Unit
    }
  }

  /** The manifest/tag/tmp cleanup tail of [[vacuum]] — runs under the
    * ref lock with the delete phase.
    */
  private def vacuumManifests(vs: Seq[Int], keepVs: Seq[Int],
      taggedVs: Set[Int], retain: Int, dryRun: Boolean, cutoff: Long,
      deleted: scala.collection.mutable.ArrayBuffer[String]): Unit = {
    if (!dryRun) {
      val dropped = vs.dropRight(retain).toSet -- taggedVs
      // a kept version whose delta chain is BROKEN by the drop must
      // stand alone: entriesOf walks v, v-1, … to the nearest manifest,
      // so the break is exactly "v is delta-only AND v-1 is dropped" —
      // the oldest of the retained tail, or a TAGGED island below it.
      // Kept versions whose v-1 is also kept resolve through it (it is
      // processed first — keepVs ascends) and MUST NOT be checkpointed:
      // one vacuum would otherwise write up to `retain` full O(files)
      // manifests where the delta-log design needs one
      keepVs.foreach { kept =>
        if (dropped.contains(kept - 1) && !fs.exists(manifestPath(kept))) {
          val resolved = entriesOf(kept)
          // stamp the ORIGINAL commit time (read while the delta still
          // exists) so this late-written checkpoint never shifts
          // TIMESTAMP AS OF — the header form of the old min() rule
          val origIct = commitTimeOf(kept)
          val tmp = new Path(logDir, s".tmp-ckpt-${UUID.randomUUID()}")
          val out = fs.create(tmp, false)
          try out.write(
            (ManifestTable.IctPrefix + origIct + "\n" +
              resolved.map(_.line).mkString("\n") + "\n").getBytes("UTF-8"))
          finally out.close()
          if (!fs.rename(tmp, manifestPath(kept))) {
            fs.delete(tmp, false)
            // a concurrent vacuum may have materialized the same
            // checkpoint between our exists-check and rename — its
            // content is identical, so losing that race IS success
            if (!fs.exists(manifestPath(kept)))
              throw new IllegalStateException(
                s"checkpoint materialization for v$kept failed")
          }
        }
      }
      dropped.foreach { v =>
        fs.delete(manifestPath(v), false)
        fs.delete(deltaPath(v), false): Unit
      }
      // version tags of vacuumed versions go with their manifests —
      // a long-lived IVM pipeline would otherwise leak one tag file
      // per vacuumed view commit forever
      fs.listStatus(logDir).foreach { st =>
        val name = st.getPath.getName
        if (name.startsWith("tag-")) {
          val v = name.substring(name.lastIndexOf("-v") + 2)
          if (v.forall(_.isDigit) && dropped.contains(v.toInt))
            fs.delete(st.getPath, false)
        }
      }
    }
    // temp files stranded by a crash mid-atomic-rename (txn sidecars,
    // branch/tag staging) — old enough that no writer can still be
    // mid-rename; vacuum is their only cleanup path. Reported and
    // dryRun-aware like the data/DV sweeps.
    if (fs.exists(logDir)) fs.listStatus(logDir).foreach { st =>
      val name = st.getPath.getName
      if (name.startsWith(".tmp-") && st.getModificationTime < cutoff) {
        if (!dryRun) fs.delete(st.getPath, false)
        deleted += st.getPath.toString
      }
    }
  }
}

package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{HashPartitioning, Partitioning}
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan}

/** Storage-partitioned scan over a hash-bucketed table layout — the
  * shuffle-elision half of L22's `bucket(n, c)` transform (the other
  * half is pruning): a table whose files are laid out by
  * `pmod(hash(key), n)` ALREADY satisfies Spark's
  * `HashPartitioning(key, n)` — the bucket derivation and
  * `HashPartitioning.partitionIdExpression` are the same expression —
  * so a scan that exposes one RDD partition per bucket and REPORTS
  * that partitioning lets Catalyst plan a same-bucketed fact⋈fact
  * join with NO Exchange on either side (the standard Delta/Iceberg
  * bucketed-join answer to the biggest recurring shuffle at 100 TB:
  * both tables sort locally per bucket and merge-join in place).
  *
  * The logical leaf carries one file group per bucket id plus a
  * builder that reads a group through the owning
  * [[graft.lake.ManifestTable]]'s scan path (schema alignment,
  * hidden-column drop, renames), so governed-read semantics are
  * identical to `read()` — enforced by the table before handing the
  * groups over (no deletion vectors; DV tables must REORG PURGE
  * before bucketed-join reads).
  */
case class BucketedTableScan(
    output: Seq[Attribute],
    keyName: String,
    numBuckets: Int,
    fileGroups: Seq[Seq[String]],
    sizeInBytes: BigInt,
    // driver-only: doExecute resolves the per-bucket DataFrames before
    // any task ships; plan trees serialize into task closures, so the
    // ManifestTable-capturing builder must not ride along. Args:
    // (bucket's files, bucket id) — the id feeds the per-row placement
    // integrity check
    @transient build: (Seq[String], Int) => DataFrame) extends LeafNode
    with org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation {
  require(fileGroups.length == numBuckets,
    s"expected $numBuckets file groups, got ${fileGroups.length}")

  /** Self-joins/unions of one readBucketed frame: DeduplicateRelations
    * can only re-instance leaves that implement MultiInstanceRelation
    * (as LogicalRDD and every built-in scan do); without this a
    * `d.as("a").join(d.as("b"), …)` fails analysis on conflicting
    * attribute ids.
    */
  override def newInstance(): BucketedTableScan =
    copy(output = output.map(_.newInstance()))

  /** Real on-disk bytes (from the manifest's file statuses), so join
    * selection sees honest sizes. A tiny bucketed side may then plan
    * as a broadcast join — correct, and still shuffle-free for the
    * big side — while two large sides merge-join on the reported
    * partitioning.
    */
  override def computeStats(): org.apache.spark.sql.catalyst.plans.logical.Statistics =
    org.apache.spark.sql.catalyst.plans.logical.Statistics(
      sizeInBytes = sizeInBytes)
}

/** Planner strategy: registered by [[graft.GraftExtensions]] and
  * idempotently via `spark.experimental.extraStrategies` on first
  * `readBucketed` call.
  */
object BucketedScanStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case s: BucketedTableScan => BucketedScanExec(s) :: Nil
    case _ => Nil
  }

  /** Runtime registration — safe to call repeatedly. Synchronized on
    * `spark.experimental` because `extraStrategies` is a plain
    * read-modify-write: two concurrent first-time `readBucketed` calls
    * would otherwise lose one append (or duplicate the strategy). A
    * third-party component mutating `extraStrategies` WITHOUT holding
    * the same monitor can still race — Spark's API offers no atomic
    * update — which is why [[graft.GraftExtensions]] injection at
    * session build remains the recommended path; this runtime hook is
    * the fallback for sessions built without the extension.
    */
  def ensureRegistered(spark: SparkSession): Unit =
    spark.experimental.synchronized {
      // planner.strategies covers BOTH registration channels
      // (extraStrategies is its prefix; extension-injected strategies
      // follow) — an extensions-built session already injected the
      // strategy, and appending it to extraStrategies too would run it
      // twice per query (duplicate candidates, wasted planning)
      if (!spark.sessionState.planner.strategies
          .contains(BucketedScanStrategy)) {
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ BucketedScanStrategy
      }
    }
}

/** One RDD partition per bucket: partition `b`'s rows are exactly the
  * rows with `pmod(hash(key), n) = b`, so `outputPartitioning` is the
  * real thing, not a claim — EnsureRequirements sees both sides of a
  * same-key same-n join already clustered and inserts only the local
  * sorts. Each bucket is read in a single task (the same degree of
  * parallelism Spark's own bucketed tables get); size `n` for the
  * target concurrency at write time.
  */
case class BucketedScanExec(scan: BucketedTableScan)
    extends LeafExecNode {

  override def output: Seq[Attribute] = scan.output

  override val outputPartitioning: Partitioning =
    HashPartitioning(
      scan.output.filter(_.name == scan.keyName),
      scan.numBuckets)

  override protected def doExecute(): RDD[InternalRow] = {
    val sc = session.sparkContext
    val names = scan.output.map(_.name)
    val perBucket: Seq[RDD[InternalRow]] =
      scan.fileGroups.zipWithIndex.map { case (files, b) =>
        if (files.isEmpty) sc.parallelize(Seq.empty[InternalRow], 1)
        else {
          // select in declared order so rows line up with `output`
          // (quoted: a physical name with a dot must not parse as
          // struct access)
          val df = scan.build(files, b)
            .select(names.map(graft.functions.Cols.quoted): _*)
          df.queryExecution.toRdd.coalesce(1)
        }
      }
    sc.union(perBucket)
  }

  override def simpleString(maxFields: Int): String =
    s"BucketedScanExec ${scan.keyName} into ${scan.numBuckets} buckets, " +
      s"${scan.fileGroups.map(_.size).sum} files"
}

package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.{CosineSimilarity, TextFunctions, TextNormalize}

/** Session-extension entry point — the deployment-grade way to expose
  * the engine's native Expressions in plain SQL, with no code on the
  * user side:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   spark.sql("SELECT graft_cosine(a.embedding, b.embedding) ...")
  * }}}
  *
  * The per-session `CosineSimilarity.register` / `registerRollingHash`
  * temp-function calls remain for ad-hoc use; this class is the
  * cluster-wide configuration surface (every new session gets the
  * functions at build time, exactly how Delta/Iceberg register their
  * SQL surface).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** Wrong-arity SQL calls must fail with a clear message, not an
    * IndexOutOfBoundsException from exprs(1) mid-resolution.
    */
  private def arity[A](name: String, n: Int,
      f: Seq[org.apache.spark.sql.catalyst.expressions.Expression] => A)(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): A = {
    if (exprs.length != n)
      throw new IllegalArgumentException(
        s"$name expects $n argument(s), got ${exprs.length}")
    f(exprs)
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    // CALL graft.<proc>(...) procedure surface (MERGE/DELETE/UPDATE/
    // OPTIMIZE/VACUUM/RESTORE/DESCRIBE over manifest tables); every
    // other statement delegates to the stock parser untouched
    ext.injectParser((session, delegate) =>
      new graft.sql.GraftSqlParser(delegate, session))
    // plain-SQL UPDATE / MERGE INTO over catalog-resolved manifest
    // tables: lower the resolved plans onto the DV merge-on-read
    // paths (updateWhere / mergeInto) — see graft.sql.GraftDmlRules
    ext.injectResolutionRule(session => graft.sql.GraftDmlRule(session))
    // persistent SQL views over GraftCatalog (CREATE/SELECT/SHOW/DROP
    // VIEW) — the DSv2 ViewCatalog wiring Spark core does not ship;
    // see graft.sql.GraftViewRule
    ext.injectResolutionRule(session => graft.sql.GraftViewRule(session))
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine",
        "graft_cosine(a, b) - cosine similarity of two float/double arrays; NULL on length mismatch"),
      arity("graft_cosine", 2, es => CosineSimilarity(es.head, es(1)))))
    ext.injectFunction((
      FunctionIdentifier("graft_rolling_hash"),
      new ExpressionInfo(classOf[TextFunctions.RollingHash].getName,
        "graft_rolling_hash",
        "graft_rolling_hash(s) - base-31 rolling hash of a string (document fingerprinting)"),
      arity("graft_rolling_hash", 1, es => TextFunctions.RollingHash(es.head, 31))))
    ext.injectFunction((
      FunctionIdentifier("graft_normalize_text"),
      new ExpressionInfo(classOf[TextNormalize].getName,
        "graft_normalize_text",
        "graft_normalize_text(s) - NFC normalize, strip control chars, collapse whitespace, trim"),
      arity("graft_normalize_text", 1, es => TextNormalize(es.head))))
    // L35: SQL table function over the batch change feed — Delta's
    // `table_changes` TVF role: `SELECT * FROM graft_table_changes(
    // '<root-or-cat.ns.table>', fromV, toV[, 'k1,k2'])`. The 3-arg
    // form reads KEYLESSLY (T15: write-time CDC sidecars / zero-change
    // stamps / pure file deltas); the keys_csv arg supplies row
    // identity for the keyed-diff fallback on pre-CDC history. Args
    // must be literals (the table address and version range shape the
    // plan); the returned plan is the same per-commit O(change rows)
    // union the batch reader builds.
    ext.injectTableFunction((
      FunctionIdentifier("graft_table_changes"),
      new ExpressionInfo("graft.streaming.GraftTableSource",
        "graft_table_changes",
        "graft_table_changes(table, from_version, to_version[, keys_csv])" +
          " - change rows (_change_type, _commit_version) for the" +
          " inclusive commit range of a graft table"),
      exprs => {
        if (exprs.length != 4 && exprs.length != 3)
          throw new IllegalArgumentException(
            "graft_table_changes expects (table, from_version, " +
              s"to_version[, keys_csv]), got ${exprs.length} argument(s)")
        def lit(i: Int): Any = {
          val e = exprs(i)
          if (!e.foldable) throw new IllegalArgumentException(
            s"graft_table_changes: argument ${i + 1} must be a literal" +
              s" (got $e) — the table address and version range shape" +
              " the plan")
          e.eval()
        }
        def str(i: Int): String = lit(i) match {
          case null => throw new IllegalArgumentException(
            s"graft_table_changes: argument ${i + 1} must not be NULL")
          case v => v.toString
        }
        def intArg(i: Int): Int = lit(i) match {
          case n: Int => n
          case n: Long =>
            // SQL integer literals beyond 2^31 parse as Long — a bare
            // toInt would wrap them into a VALID wrong range
            if (n.isValidInt) n.toInt
            else throw new IllegalArgumentException(
              s"graft_table_changes: argument ${i + 1} = $n is not a" +
                " valid version number")
          case n: Short => n.toInt
          case n: Byte => n.toInt
          case other => throw new IllegalArgumentException(
            s"graft_table_changes: argument ${i + 1} must be an" +
              s" integer version, got $other")
        }
        val session = org.apache.spark.sql.SparkSession.active
        val root = graft.sql.GraftNames.resolveRoot(session, str(0))
        val keysOpt =
          if (exprs.length == 3) None
          else {
            val ks = str(3).split(",").map(_.trim).filter(_.nonEmpty).toSeq
            if (ks.isEmpty) throw new IllegalArgumentException(
              "graft_table_changes: keys_csv is empty — name key " +
                "columns, or use the 3-argument form for keyless " +
                "sidecar replay")
            Some(ks)
          }
        graft.streaming.GraftTableSource
          .batchChanges(session, root, keysOpt, intArg(1), intArg(2))
          .queryExecution.analyzed
      }))
    // optimizer rule: defensive re-normalization in composed cleaning
    // pipelines collapses to one pass (idempotent kernel)
    ext.injectOptimizerRule(_ => graft.plans.GraftRules.CollapseNormalize)
    // storage-partitioned scans (ManifestTable.readBucketed) — also
    // self-registered via experimental.extraStrategies on first use
    ext.injectPlannerStrategy(_ => graft.plans.BucketedScanStrategy)
  }
}

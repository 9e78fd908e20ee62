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
    // optimizer rule: defensive re-normalization in composed cleaning
    // pipelines collapses to one pass (idempotent kernel)
    ext.injectOptimizerRule(_ => graft.plans.GraftRules.CollapseNormalize)
    // storage-partitioned scans (ManifestTable.readBucketed) — also
    // self-registered via experimental.extraStrategies on first use
    ext.injectPlannerStrategy(_ => graft.plans.BucketedScanStrategy)
  }
}

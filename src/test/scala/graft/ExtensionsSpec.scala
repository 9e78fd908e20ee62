package graft

import org.apache.spark.sql.SparkSession

/** GraftExtensions must make the native functions available in plain
  * SQL on a session built with spark.sql.extensions — the config-only
  * deployment path (no user code).
  */
class ExtensionsSpec extends SparkTestBase {
  quiet()

  test("spark.sql.extensions=graft.GraftExtensions registers SQL functions") {
    val saved = SparkSession.getDefaultSession
    val savedActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      // reuses the JVM's SparkContext. withExtensions is the same
      // injection hook spark.sql.extensions=graft.GraftExtensions runs
      // at session build — the config form needs a fresh SparkContext
      // (static conf), which a shared-JVM test can't create.
      val s2 = SparkSession.builder()
        .withExtensions(new GraftExtensions().apply(_))
        .getOrCreate()
      try {
        val cos = s2.sql(
          """SELECT graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c,
            |       graft_cosine(array(1.0D, 0.0D), array(1.0D)) AS mismatch,
            |       graft_rolling_hash('spark') AS h""".stripMargin).head()
        assert(cos.getDouble(0) === 1.0)
        assert(cos.isNullAt(1))
        assert(cos.getLong(2) === "spark".foldLeft(0L)((h, c) => h * 31 + c))
      } finally {
        // leave the shared context alive; only drop the session objects
        SparkSession.clearDefaultSession()
        SparkSession.clearActiveSession()
      }
    } finally {
      saved.foreach(SparkSession.setDefaultSession)
      savedActive.foreach(SparkSession.setActiveSession)
    }
  }

  test("CollapseNormalize rule: nested graft_normalize_text flattens to one pass") {
    val saved = SparkSession.getDefaultSession
    val savedActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s2 = SparkSession.builder()
        .withExtensions(new GraftExtensions().apply(_))
        .getOrCreate()
      try {
        // non-foldable input (id) so ConstantFolding can't pre-evaluate
        s2.range(1).selectExpr("concat('  a\tb  ', cast(id AS string)) AS t")
          .createOrReplaceTempView("ext_t")
        val df = s2.sql(
          "SELECT graft_normalize_text(graft_normalize_text(graft_normalize_text(t))) AS c FROM ext_t")
        val applications = df.queryExecution.optimizedPlan.collect {
          case p => p.expressions.map(_.collect {
            case e: graft.functions.TextNormalize => e
          }.size).sum
        }.sum
        assert(applications === 1,
          s"expected one TextNormalize after optimization, got $applications:\n" +
            df.queryExecution.optimizedPlan)
        assert(df.head().getString(0) === "a b 0") // semantics preserved
      } finally {
        SparkSession.clearDefaultSession()
        SparkSession.clearActiveSession()
      }
    } finally {
      saved.foreach(SparkSession.setDefaultSession)
      savedActive.foreach(SparkSession.setActiveSession)
    }
  }
}

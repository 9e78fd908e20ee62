package graft

import graft.lake.ManifestTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Persistent SQL views over GraftCatalog (graft.sql.GraftViewRule):
  * CREATE/SELECT/SHOW/DROP VIEW through plain SQL, definitions stored
  * in the `_graft_views` sidecar next to the data — so they survive
  * sessions — and resolved at READ time (a view over a governed table
  * tracks the table's latest version unless the text pins AS OF).
  */
class GraftViewSpec extends SparkTestBase {
  quiet()
  import spark.implicits._

  private val lakeRoot =
    s"${sys.props("java.io.tmpdir")}/graft_view_lake_${System.nanoTime()}"

  private def freshSession(tag: String): SparkSession = {
    val s = extensionsSession(s"graft-views-$tag")
    s.conf.set("spark.sql.catalog.gview", "graft.sql.GraftCatalog")
    s.conf.set("spark.sql.catalog.gview.root", lakeRoot)
    s
  }

  private lazy val setup: Unit = {
    val orders = Seq((1L, "A", 10.0), (2L, "B", 20.0), (3L, "A", 30.0))
      .toDF("order_id", "status", "amount")
    new ManifestTable(spark, s"$lakeRoot/silver/orders")
      .write(orders, "overwrite")
  }

  test("CREATE / SELECT / SHOW / DROP round-trip, across two fresh sessions") {
    setup
    val s1 = freshSession("a")
    s1.sql("""CREATE VIEW gview.silver.big_orders AS
             |SELECT order_id, amount FROM gview.silver.orders
             |WHERE amount > 15.0""".stripMargin)

    val got = s1.sql("SELECT order_id FROM gview.silver.big_orders ORDER BY order_id")
      .collect().map(_.getLong(0)).toSeq
    assert(got === Seq(2L, 3L))

    val shown = s1.sql("SHOW VIEWS IN gview.silver").collect()
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(2)))
    assert(shown.toSeq === Seq(("silver", "big_orders", false)))

    // a SECOND fresh session sees the view: the definition lives in
    // the sidecar, not in any session state
    val s2 = freshSession("b")
    val got2 = s2.sql("SELECT sum(amount) AS s FROM gview.silver.big_orders")
      .head().getDouble(0)
    assert(got2 === 50.0)

    // DROP from the second session; the first no longer resolves it
    s2.sql("DROP VIEW gview.silver.big_orders")
    val err = intercept[Exception] {
      s1.sql("SELECT * FROM gview.silver.big_orders").collect()
    }
    assert(messageChain(err).toLowerCase.contains("table or view not found") ||
      messageChain(err).contains("TABLE_OR_VIEW_NOT_FOUND"))
    // IF EXISTS tolerates the gone view; bare DROP refuses
    s1.sql("DROP VIEW IF EXISTS gview.silver.big_orders")
    intercept[Exception] { s1.sql("DROP VIEW gview.silver.big_orders") }
  }

  test("views pin semantics at READ time: table churn flows through") {
    setup
    val s1 = freshSession("c")
    s1.sql("""CREATE VIEW gview.silver.all_orders AS
             |SELECT order_id, status, amount FROM gview.silver.orders""".stripMargin)
    assert(s1.sql("SELECT count(*) FROM gview.silver.all_orders")
      .head().getLong(0) === 3L)
    // mutate the table AFTER view creation — the view must see it
    new ManifestTable(spark, s"$lakeRoot/silver/orders").merge(
      Seq((4L, "D", 40.0), (2L, "B", 25.0)).toDF("order_id", "status", "amount"),
      Seq("order_id"))
    assert(s1.sql("SELECT count(*) FROM gview.silver.all_orders")
      .head().getLong(0) === 4L)
    assert(s1.sql(
      "SELECT amount FROM gview.silver.all_orders WHERE order_id = 2")
      .head().getDouble(0) === 25.0)
    // an AS OF in the view text pins explicitly
    s1.sql("""CREATE VIEW gview.silver.orders_v0 AS
             |SELECT * FROM gview.silver.orders VERSION AS OF 0""".stripMargin)
    assert(s1.sql("SELECT count(*) FROM gview.silver.orders_v0")
      .head().getLong(0) === 3L)
    s1.sql("DROP VIEW gview.silver.all_orders")
    s1.sql("DROP VIEW gview.silver.orders_v0")
  }

  test("column aliases, OR REPLACE, IF NOT EXISTS, and name collisions") {
    setup
    val s1 = freshSession("d")
    s1.sql("""CREATE VIEW gview.silver.renamed (oid, amt) AS
             |SELECT order_id, amount FROM gview.silver.orders""".stripMargin)
    val df = s1.sql("SELECT * FROM gview.silver.renamed")
    assert(df.columns.toSeq === Seq("oid", "amt"))

    // OR REPLACE swaps the definition in place
    s1.sql("""CREATE OR REPLACE VIEW gview.silver.renamed (oid) AS
             |SELECT order_id FROM gview.silver.orders WHERE status = 'A'""".stripMargin)
    val got = s1.sql("SELECT oid FROM gview.silver.renamed ORDER BY oid")
      .collect().map(_.getLong(0)).toSeq
    assert(got === Seq(1L, 3L))

    // IF NOT EXISTS over an existing view is a no-op
    s1.sql("""CREATE VIEW IF NOT EXISTS gview.silver.renamed AS
             |SELECT 1 AS one""".stripMargin)
    assert(s1.sql("SELECT * FROM gview.silver.renamed").columns.toSeq === Seq("oid"))
    // bare CREATE over an existing view refuses
    intercept[Exception] {
      s1.sql("CREATE VIEW gview.silver.renamed AS SELECT 1 AS one")
    }
    // a view may not shadow a table, nor a table a view
    intercept[Exception] {
      s1.sql("CREATE VIEW gview.silver.orders AS SELECT 1 AS one")
    }
    val clash = intercept[Exception] {
      s1.sql("CREATE TABLE gview.silver.renamed (id BIGINT)")
    }
    assert(messageChain(clash).toLowerCase.contains("view"))
    s1.sql("DROP VIEW gview.silver.renamed")
  }

  test("unqualified names in the text resolve against the CREATE-time context") {
    setup
    val s1 = freshSession("e")
    s1.sql("USE gview.silver")
    try s1.sql(
      "CREATE VIEW ctx_view AS SELECT order_id FROM orders WHERE amount >= 20.0")
    finally s1.sql("USE spark_catalog.default")
    // read from a session whose current catalog is NOT gview — the
    // stored context must qualify `orders`. Expectation derived from
    // the table (earlier tests merge rows into it).
    val want = new ManifestTable(spark, s"$lakeRoot/silver/orders").read()
      .filter(col("amount") >= 20.0).select("order_id")
      .as[Long].collect().sorted.toSeq
    val s2 = freshSession("f")
    val got = s2.sql("SELECT order_id FROM gview.silver.ctx_view ORDER BY order_id")
      .collect().map(_.getLong(0)).toSeq
    assert(got === want && got.nonEmpty)
    s2.sql("DROP VIEW gview.silver.ctx_view")
  }

  test("explicit non-graft catalogs pass through; bare names resolve under a graft current catalog") {
    setup
    val s1 = freshSession("h")
    s1.sql("USE gview.silver")
    try {
      // view commands naming the SESSION catalog explicitly are NOT
      // ours — they must reach stock Spark, not be re-homed into gview
      s1.sql("SHOW VIEWS IN spark_catalog.default").collect() // must not throw
      s1.sql("DROP VIEW IF EXISTS spark_catalog.default.no_such_view") // no-op
      // a BARE view name works end to end under the graft current
      // catalog: create, SELECT unqualified, drop
      s1.sql("CREATE VIEW bare_v AS SELECT order_id FROM orders WHERE amount > 15.0")
      assert(s1.sql("SELECT * FROM bare_v").count() ===
        s1.sql("SELECT * FROM gview.silver.bare_v").count())
      // a temp view SHADOWS the stored view (Spark precedence)
      s1.range(3).toDF("order_id").createOrReplaceTempView("bare_v")
      assert(s1.sql("SELECT * FROM bare_v").count() === 3)
      s1.catalog.dropTempView("bare_v")
      s1.sql("DROP VIEW bare_v")
      assert(!new org.apache.hadoop.fs.Path(s"$lakeRoot/silver/_graft_views/bare_v.properties")
        .getFileSystem(spark.sessionState.newHadoopConf())
        .exists(new org.apache.hadoop.fs.Path(
          s"$lakeRoot/silver/_graft_views/bare_v.properties")))
    } finally s1.sql("USE spark_catalog.default")
  }

  test("OR REPLACE cannot shadow a table; column comments round-trip null") {
    setup
    val s1 = freshSession("i")
    // CREATE OR REPLACE VIEW over an existing TABLE name refuses (the
    // bare-CREATE guard alone left replaceView as a hole)
    val err = intercept[Exception] {
      s1.sql("CREATE OR REPLACE VIEW gview.silver.orders AS SELECT 1 AS one")
    }
    assert(messageChain(err).toLowerCase.contains("already exists"))
    // a comment-less column round-trips as NULL, not the string "null"
    s1.sql("""CREATE VIEW gview.silver.commented
             |  (oid COMMENT 'the id', amt) AS
             |SELECT order_id, amount FROM gview.silver.orders""".stripMargin)
    val cat = new graft.sql.GraftCatalog()
    cat.initialize("gview_check",
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Collections.singletonMap("root", lakeRoot)))
    val v = cat.loadView(org.apache.spark.sql.connector.catalog.Identifier
      .of(Array("silver"), "commented"))
    assert(v.columnComments().toSeq === Seq("the id", null))
    assert(v.columnAliases().toSeq === Seq("oid", "amt"))
    s1.sql("DROP VIEW gview.silver.commented")
  }

  test("ALTER VIEW AS replaces the definition in place; RENAME TO moves it") {
    setup
    val s1 = freshSession("j")
    s1.sql("""CREATE VIEW gview.silver.altered AS
             |SELECT order_id FROM gview.silver.orders""".stripMargin)
    val before = s1.sql("SELECT * FROM gview.silver.altered").count()
    assert(before >= 3L)

    s1.sql("""ALTER VIEW gview.silver.altered AS
             |SELECT order_id, amount FROM gview.silver.orders
             |WHERE amount > 15.0""".stripMargin)
    val after = s1.sql("SELECT * FROM gview.silver.altered")
    assert(after.columns.toSeq === Seq("order_id", "amount"))
    assert(after.count() < before)
    // ALTER VIEW AS on a missing graft view falls through to stock →
    // standard not-found error, never a silent create
    intercept[Exception] {
      s1.sql("ALTER VIEW gview.silver.no_such AS SELECT 1 AS one")
    }
    assert(!s1.sql("SHOW VIEWS IN gview.silver").collect()
      .map(_.getString(1)).contains("no_such"))

    // RENAME: old name gone, new name serves the same definition
    s1.sql("ALTER VIEW gview.silver.altered RENAME TO gview.silver.renamed_v")
    assert(s1.sql("SELECT * FROM gview.silver.renamed_v").count() === after.count())
    intercept[Exception] {
      s1.sql("SELECT * FROM gview.silver.altered").collect()
    }
    // survives sessions (the sidecar file moved)
    val s2 = freshSession("k")
    assert(s2.sql("SELECT * FROM gview.silver.renamed_v").count() === after.count())
    // renaming onto an existing TABLE name refuses inside renameView?
    // (a view and table must never share a name — the rename lands on
    // the view path namespace, so guard via the catalog's own check)
    intercept[Exception] {
      s2.sql("ALTER VIEW gview.silver.renamed_v RENAME TO gview.silver.renamed_v")
    }
    // ...and never onto an existing TABLE name
    val clash = intercept[Exception] {
      s2.sql("ALTER VIEW gview.silver.renamed_v RENAME TO gview.silver.orders")
    }
    assert(messageChain(clash).toLowerCase.contains("already exists"))
    // a table rename onto an existing VIEW name refuses too (mirror)
    new ManifestTable(spark, s"$lakeRoot/silver/rn_table")
      .write(Seq((1L, "a")).toDF("id", "v"), "overwrite")
    val clash2 = intercept[Exception] {
      s2.sql("ALTER TABLE gview.silver.rn_table RENAME TO gview.silver.renamed_v")
    }
    assert(messageChain(clash2).toLowerCase.contains("already exists"))
    // the target resolves relative to the SOURCE view, not the
    // session's current catalog/namespace: from a non-graft current
    // catalog, a 2-part and a bare target both stay in gview.silver
    s2.sql("ALTER VIEW gview.silver.renamed_v RENAME TO silver.rel_v")
    assert(s2.sql("SELECT * FROM gview.silver.rel_v").count() === after.count())
    s2.sql("ALTER VIEW gview.silver.rel_v RENAME TO bare_renamed")
    assert(s2.sql("SELECT * FROM gview.silver.bare_renamed").count() === after.count())
    // an explicit different catalog refuses loudly
    val cross = intercept[Exception] {
      s2.sql("ALTER VIEW gview.silver.bare_renamed RENAME TO spark_catalog.default.x")
    }
    assert(messageChain(cross).contains("must stay inside catalog"))
    s2.sql("DROP VIEW gview.silver.bare_renamed")
  }

  test("views compose: WITH clauses inside the text; views over views; recursion refuses") {
    setup
    val s1 = freshSession("g")
    val want = new ManifestTable(spark, s"$lakeRoot/silver/orders").read()
      .filter(col("amount") > 15.0).count()
    s1.sql("""CREATE VIEW gview.silver.cte_view AS
             |WITH a AS (SELECT order_id, amount FROM gview.silver.orders)
             |SELECT order_id FROM a WHERE amount > 15.0""".stripMargin)
    assert(s1.sql("SELECT * FROM gview.silver.cte_view").count() === want)

    s1.sql("""CREATE VIEW gview.silver.outer_view AS
             |SELECT count(*) AS n FROM gview.silver.cte_view""".stripMargin)
    assert(s1.sql("SELECT n FROM gview.silver.outer_view").head().getLong(0) === want)

    // self-reference (possible via OR REPLACE) refuses at read time
    s1.sql("""CREATE OR REPLACE VIEW gview.silver.cte_view AS
             |SELECT * FROM gview.silver.cte_view""".stripMargin)
    val err = intercept[Exception] {
      s1.sql("SELECT * FROM gview.silver.cte_view").collect()
    }
    assert(messageChain(err).contains("recursive graft view"))
    s1.sql("DROP VIEW gview.silver.outer_view")
    s1.sql("DROP VIEW gview.silver.cte_view")
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The CALL graft.<proc>(...) SQL DML surface: a session configured
  * with GraftExtensions drives the full medallion lifecycle — ingest
  * write, keyed merge, DV delete, row update, optimize, describe,
  * restore, vacuum — entirely through spark.sql(...).
  */
class SqlDmlSpec extends SparkTestBase {
  quiet()

  lazy val sqlSpark: SparkSession = extensionsSession("graft-sql-dml")

  private def scratch(name: String): String = {
    val dir = s"${sys.props("java.io.tmpdir")}/graft_sqldml_$name"
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    dir
  }

  test("non-CALL statements parse and run exactly as stock Spark SQL") {
    Q.t(sqlSpark, sf, "orders").createOrReplaceTempView("sql_dml_orders")
    val n = sqlSpark.sql(
      "SELECT count(*) AS n FROM sql_dml_orders WHERE o_orderstatus = 'F'")
      .first().getLong(0)
    assert(n > 0)
    // injected scalar functions resolve through the same session
    assert(sqlSpark.sql("SELECT graft_rolling_hash('abc') AS h").count() === 1)
  }

  test("medallion pipeline end-to-end through spark.sql only") {
    val bronze = scratch("bronze")
    val silver = scratch("silver")
    val orders = Q.t(sqlSpark, sf, "orders")
      .select(col("o_orderkey").as("order_id"),
        col("o_orderstatus").as("status"),
        col("o_totalprice").as("amount"),
        col("o_orderpriority").as("priority"))
    orders.createOrReplaceTempView("feed_full")

    // bronze ingest (partitioned by status), silver initial load
    val v0 = sqlSpark.sql(
      s"CALL graft.write('$bronze', 'feed_full', 'overwrite', 'status')")
      .first().getInt(0)
    assert(v0 === 0)
    sqlSpark.sql(s"CALL graft.write('$silver', 'feed_full', 'overwrite', 'status')")

    // CDC merge: bump 5 amounts
    orders.limit(5).withColumn("amount", col("amount") + 10)
      .createOrReplaceTempView("feed_updates")
    val v1 = sqlSpark.sql(
      s"CALL graft.merge('$silver', 'feed_updates', 'order_id')")
      .first().getInt(0)
    assert(v1 === 1)

    // DV delete (quoted-quote predicate) + row update
    val nP = orders.filter(col("status") === "P").count()
    assert(nP > 0)
    sqlSpark.sql(s"CALL graft.delete('$silver', 'status = ''P''')")
    sqlSpark.sql(
      s"CALL graft.update('$silver', 'amount > 100000', " +
        "'priority = ''5-LOW'', amount = amount + 0')")

    // optimize + describes + vacuum, all from SQL
    sqlSpark.sql(s"CALL graft.optimize('$silver', 2)")
    val hist = sqlSpark.sql(s"CALL graft.describe_history('$silver')").collect()
    assert(hist.length === 5, s"5 versions expected: ${hist.length}")
    val detail = sqlSpark.sql(s"CALL graft.describe_detail('$silver')").first()
    assert(detail.getAs[Seq[String]]("partition_columns") === Seq("status"),
      "config sidecar must surface the partition spec through SQL")
    val removed = sqlSpark.sql(s"CALL graft.vacuum('$silver', 1, 0)").collect()
    assert(removed.nonEmpty, "vacuum after optimize must collect dead files")

    // final state: merged amounts, deleted partition, updated priority
    val got = graft.lake.ManifestTable.forRoot(sqlSpark, silver).read()
    assert(got.filter(col("status") === "P").count() === 0)
    val expectCount = orders.filter(col("status") =!= "P").count()
    assert(got.count() === expectCount)
    assert(got.filter(col("amount") > 100000
      && col("priority") =!= "5-LOW").count() === 0)

    // restore rewinds to the pre-delete version — but vacuum(retain=1)
    // dropped those files, so restore the LATEST (idempotence check)
    val vLatest = graft.lake.ManifestTable.forRoot(sqlSpark, silver)
      .latestVersion.get
    val vR = sqlSpark.sql(s"CALL graft.restore('$silver', $vLatest)")
      .first().getInt(0)
    assert(vR === vLatest + 1)
    assert(graft.lake.ManifestTable.forRoot(sqlSpark, silver).read()
      .count() === expectCount)
  }

  test("CDC lifecycle through SQL: enable_cdc, DML, keyless table_changes, disable_cdc") {
    import graft.lake.ManifestTable
    val root = scratch("cdc_sql")
    val orders = Q.t(sqlSpark, sf, "orders")
      .select("o_orderkey", "o_totalprice")
    new ManifestTable(sqlSpark, root).write(orders, "overwrite") // v0
    sqlSpark.sql(s"CALL graft.enable_cdc('$root')")
    sqlSpark.sql(s"CALL graft.update('$root', 'o_orderkey % 9 = 0', " +
      "'o_totalprice = o_totalprice + 1.0')") // v1: sidecar
    sqlSpark.sql(s"CALL graft.delete('$root', 'o_orderkey % 11 = 0')") // v2
    val ch = sqlSpark.sql(s"SELECT * FROM graft_table_changes('$root', 1, 2)")
    assert(ch.filter(col("_change_type") === "update_postimage").count() > 0)
    assert(ch.filter(col("_change_type") === "delete").count() > 0)
    // keyless sidecar replay ≡ the keyed snapshot diff, per version
    val mt = ManifestTable.forRoot(sqlSpark, root)
    (1 to 2).foreach { v =>
      val a = mt.changesAt(v, None)
      val b = mt.changesBetween(v - 1, v, Seq("o_orderkey"))
        .select(a.columns.map(col): _*)
      assert(a.exceptAll(b).count() === 0, s"v$v")
      assert(b.exceptAll(a).count() === 0, s"v$v")
    }
    // disable stops capture: the next DML has no sidecar — but T16
    // row tracking keeps the keyless read answering, equal to the
    // keyed diff (the sidecar is an optimization, not the only truth)
    sqlSpark.sql(s"CALL graft.disable_cdc('$root')")
    sqlSpark.sql(s"CALL graft.delete('$root', 'o_orderkey % 13 = 0')") // v3
    val v3k = mt.changesAt(3, None)
    val v3keyed = mt.changesBetween(2, 3, Seq("o_orderkey"))
      .select(v3k.columns.map(col): _*)
    assert(v3k.exceptAll(v3keyed).count() === 0)
    assert(v3keyed.exceptAll(v3k).count() === 0)
  }

  test("maintenance_plan recommends compact_small + reorg on a messy table, nothing on a clean one") {
    import graft.lake.ManifestTable
    val root = scratch("advisor")
    val orders = Q.t(sqlSpark, sf, "orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val mt = new ManifestTable(sqlSpark, root)
    // stage the mess: 8 small files + a DV delete masking >2% of rows
    mt.write(orders.repartition(8), "overwrite")
    mt.delete(col("o_orderkey") % 3 === 0)
    val plan = sqlSpark.sql(s"CALL graft.maintenance_plan('$root')")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(3)))
    val actions = plan.map(_._2).toSeq
    assert(actions.contains("compact_small"), s"plan was ${plan.toSeq}")
    assert(actions.contains("reorg_purge"), s"plan was ${plan.toSeq}")
    // ordered by priority, and every row carries a runnable command
    assert(plan.map(_._1).toSeq == plan.map(_._1).toSeq.sorted)
    assert(plan.forall(_._3.startsWith("CALL graft.")))
    // the advisor executes nothing: same version before and after
    val vBefore = mt.latestVersion
    sqlSpark.sql(s"CALL graft.maintenance_plan('$root')").collect()
    assert(mt.latestVersion === vBefore)
    // run the advice; with a tiny small-file threshold the clean table
    // (one packed file, no DVs) recommends NOTHING
    mt.reorgPurge()
    mt.compact(1)
    val clean = sqlSpark.sql(
      s"CALL graft.maintenance_plan('$root', 1)").collect()
    assert(clean.isEmpty, s"clean table plan: ${clean.toSeq}")
  }

  test("maintenance_plan sweeps a namespace: two tables with different " +
      "needs, one priority-ordered plan, each row naming its table") {
    import graft.lake.ManifestTable
    val lake = scratch("advisor_ns")
    val orders = Q.t(sqlSpark, sf, "orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    // table A: small-file mess only
    val a = new ManifestTable(sqlSpark, s"$lake/db/frag")
    a.write(orders.repartition(8), "overwrite")
    // table B: DV load only (one packed file, >2% masked)
    val b = new ManifestTable(sqlSpark, s"$lake/db/masked")
    b.write(orders.repartition(1), "overwrite")
    b.delete(col("o_orderkey") % 3 === 0)
    sqlSpark.conf.set("spark.sql.catalog.adv_ns", "graft.sql.GraftCatalog")
    sqlSpark.conf.set("spark.sql.catalog.adv_ns.root", lake)
    val plan = sqlSpark.sql(s"CALL graft.maintenance_plan('adv_ns.db.*')")
      .collect().map(r =>
        (r.getInt(0), r.getString(1), r.getString(3), r.getString(4)))
    assert(plan.exists(p => p._2 == "compact_small" && p._4.endsWith("frag")),
      s"plan was ${plan.toSeq}")
    assert(plan.exists(p => p._2 == "reorg_purge" && p._4.endsWith("masked")),
      s"plan was ${plan.toSeq}")
    assert(!plan.exists(p => p._2 == "reorg_purge" && p._4.endsWith("frag")))
    assert(plan.map(_._1).toSeq === plan.map(_._1).toSeq.sorted,
      "sweep output must stay priority-ordered across tables")
    assert(plan.forall(_._3.startsWith("CALL graft.")))
    // the path-glob form sweeps the same tables
    val byPath = sqlSpark.sql(s"CALL graft.maintenance_plan('$lake/db/*')")
      .collect()
    assert(byPath.length === plan.length)
  }

  test("zorder procedure clusters and describe reflects it") {
    val root = scratch("zorder")
    Q.t(sqlSpark, sf, "orders")
      .select(col("o_orderkey").as("id"), col("o_custkey").as("cust"),
        col("o_totalprice").as("amt"))
      .createOrReplaceTempView("feed_z")
    sqlSpark.sql(s"CALL graft.write('$root', 'feed_z', 'overwrite')")
    val v = sqlSpark.sql(s"CALL graft.zorder('$root', 'cust,amt', 4)")
      .first().getInt(0)
    assert(v === 1)
    assert(graft.lake.ManifestTable.forRoot(sqlSpark, root).read().count() ===
      Q.t(sqlSpark, sf, "orders").count())
  }

  test("vector store end-to-end through SQL: pq_build, pq_query, pq_refresh") {
    import graft.operators.PqIndex
    val idxRoot = scratch("pq_idx")
    val srcRoot = scratch("pq_src")
    Q.t(sqlSpark, sf, "embeddings").createOrReplaceTempView("sql_emb")
    Q.t(sqlSpark, sf, "embeddings").filter(col("vec_id") < 10)
      .createOrReplaceTempView("sql_probes")
    val v = sqlSpark.sql(
      s"CALL graft.pq_build('$idxRoot', 'sql_emb', 'embedding')")
      .first().getInt(0)
    assert(v === 0)
    val got = sqlSpark.sql(
      s"CALL graft.pq_query('$idxRoot', 'sql_emb', 'sql_probes', 'embedding')")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    // identical to serving the same persisted index through the Scala API
    val emb = graft.queries.Similarity.unitVectors(sqlSpark, sf)
    val probes = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("v").as("q_v"))
    val scala0 = PqIndex.load(sqlSpark, idxRoot).get
      .query(emb, probes)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === scala0.toSeq)

    // refresh through SQL: append a clone of vec 3 to a source table,
    // catch the index up, and see it surface as the top neighbor
    val source = new graft.lake.ManifestTable(sqlSpark, srcRoot)
    source.write(emb, "overwrite") // v0 ≡ the indexed corpus
    source.write(emb.filter(col("vec_id") === 3)
      .withColumn("vec_id", col("vec_id") + 1000000L), "append") // v1
    // the index was built from a view (cursor -1): the first refresh
    // bootstraps by re-upserting the whole source, then catches up
    val cursor = sqlSpark.sql(
      s"CALL graft.pq_refresh('$idxRoot', '$srcRoot', 'vec_id', 'v')")
      .first().getInt(0)
    assert(cursor === 1)
    source.read().createOrReplaceTempView("sql_src_corpus")
    emb.filter(col("vec_id") === 3)
      .createOrReplaceTempView("sql_probe3")
    val top = sqlSpark.sql(
      s"CALL graft.pq_query('$idxRoot', 'sql_src_corpus', 'sql_probe3', 'v')")
      .filter(col("rn") === 1).first()
    assert(top.getLong(2) === 1000003L, s"clone must be top neighbor: $top")
  }

  test("graph-ANN end-to-end through SQL: nsw_build, nsw_query, nsw_refresh") {
    import graft.operators.NswIndex
    val idxRoot = scratch("nsw_idx")
    val srcRoot = scratch("nsw_src")
    Q.t(sqlSpark, sf, "embeddings").createOrReplaceTempView("sql_nsw_emb")
    Q.t(sqlSpark, sf, "embeddings").filter(col("vec_id") < 10)
      .createOrReplaceTempView("sql_nsw_probes")
    val v = sqlSpark.sql(
      s"CALL graft.nsw_build('$idxRoot', 'sql_nsw_emb', 'embedding')")
      .first().getInt(0)
    assert(v === 0)
    val got = sqlSpark.sql(
      s"CALL graft.nsw_query('$idxRoot', 'sql_nsw_probes', 'embedding')")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    // identical to serving the same persisted index through the Scala API
    val emb = graft.queries.Similarity.unitVectors(sqlSpark, sf)
    val probes = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("v").as("q_v"))
    val scala0 = NswIndex.load(sqlSpark, idxRoot).get
      .query(probes)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === scala0.toSeq)

    // refresh through SQL: append a clone of vec 3 to a source table,
    // splice the index up to it, and see it surface as top neighbor
    val source = new graft.lake.ManifestTable(sqlSpark, srcRoot)
    source.write(emb, "overwrite") // v0 ≡ the indexed corpus
    source.write(emb.filter(col("vec_id") === 3)
      .withColumn("vec_id", col("vec_id") + 1000000L), "append") // v1
    val cursor = sqlSpark.sql(
      s"CALL graft.nsw_refresh('$idxRoot', '$srcRoot', 'vec_id', 'v')")
      .first().getInt(0)
    assert(cursor === 1)
    emb.filter(col("vec_id") === 3)
      .createOrReplaceTempView("sql_nsw_probe3")
    val top = sqlSpark.sql(
      s"CALL graft.nsw_query('$idxRoot', 'sql_nsw_probe3', 'v')")
      .filter(col("rn") === 1).first()
    assert(top.getLong(2) === 1000003L, s"clone must be top neighbor: $top")
  }

  test("IntegerType corpus ids build and serve BOTH vector indexes through SQL, identically to long ids") {
    // the first-class API edge that used to die in a getLong: a corpus
    // whose vec_id is int (or any integral) must build the same index
    // a bigint corpus does — ids normalize to long at the seed source
    val pqRootI = scratch("pq_intid"); val pqRootL = scratch("pq_longid")
    val nswRootI = scratch("nsw_intid"); val nswRootL = scratch("nsw_longid")
    Q.t(sqlSpark, sf, "embeddings")
      .withColumn("vec_id", col("vec_id").cast("int"))
      .createOrReplaceTempView("sql_int_emb")
    Q.t(sqlSpark, sf, "embeddings").createOrReplaceTempView("sql_long_emb")
    Q.t(sqlSpark, sf, "embeddings").filter(col("vec_id") < 10)
      .withColumn("vec_id", col("vec_id").cast("int"))
      .createOrReplaceTempView("sql_int_probes")
    for ((root, view) <- Seq(pqRootI -> "sql_int_emb", pqRootL -> "sql_long_emb"))
      assert(sqlSpark.sql(
        s"CALL graft.pq_build('$root', '$view', 'embedding')")
        .first().getInt(0) === 0)
    for ((root, view) <- Seq(nswRootI -> "sql_int_emb", nswRootL -> "sql_long_emb"))
      assert(sqlSpark.sql(
        s"CALL graft.nsw_build('$root', '$view', 'embedding')")
        .first().getInt(0) === 0)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    val pqI = rows(sqlSpark.sql(
      s"CALL graft.pq_query('$pqRootI', 'sql_int_emb', 'sql_int_probes', 'embedding')"))
    val pqL = rows(sqlSpark.sql(
      s"CALL graft.pq_query('$pqRootL', 'sql_long_emb', 'sql_int_probes', 'embedding')"))
    assert(pqI.nonEmpty && pqI === pqL,
      "an int-id corpus must build/serve the identical PQ index")
    val nswI = rows(sqlSpark.sql(
      s"CALL graft.nsw_query('$nswRootI', 'sql_int_probes', 'embedding')"))
    val nswL = rows(sqlSpark.sql(
      s"CALL graft.nsw_query('$nswRootL', 'sql_int_probes', 'embedding')"))
    assert(nswI.nonEmpty && nswI === nswL,
      "an int-id corpus must build/serve the identical NSW index")
  }

  test("constraints and files metadata through SQL") {
    val root = scratch("meta")
    Q.t(sqlSpark, sf, "orders")
      .select(col("o_orderkey").as("id"), col("o_totalprice").as("amt"))
      .createOrReplaceTempView("feed_meta")
    sqlSpark.sql(s"CALL graft.write('$root', 'feed_meta', 'overwrite')")
    sqlSpark.sql(s"CALL graft.constraint_add('$root', 'amt_pos', 'amt > 0')")
    val cs = sqlSpark.sql(s"CALL graft.constraints('$root')").collect()
    assert(cs.map(r => (r.getString(0), r.getString(1))).toSeq ===
      Seq(("amt_pos", "amt > 0")))
    // a violating write through SQL fails loudly and commits nothing
    sqlSpark.sql("SELECT -1L AS id, CAST(-5.0 AS DOUBLE) AS amt")
      .createOrReplaceTempView("feed_bad")
    val before = graft.lake.ManifestTable.forRoot(sqlSpark, root).latestVersion
    val ex = intercept[Exception] {
      sqlSpark.sql(s"CALL graft.write('$root', 'feed_bad', 'append')").collect()
    }
    val msgs = Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null).map(e => Option(e.getMessage).getOrElse(""))
      .mkString(" | ")
    assert(msgs.contains("amt_pos"), msgs.take(300))
    assert(graft.lake.ManifestTable.forRoot(sqlSpark, root)
      .latestVersion === before)
    // files metadata: every file row carries its size and zone maps
    val files = sqlSpark.sql(s"CALL graft.describe_files('$root')").collect()
    assert(files.nonEmpty)
    assert(files.forall(_.getLong(1) > 0))
    sqlSpark.sql(s"CALL graft.constraint_drop('$root', 'amt_pos')")
    assert(sqlSpark.sql(s"CALL graft.constraints('$root')").count() === 0)
  }

  test("CALL graft.reorg purges DV'd files via SQL") {
    import graft.lake.ManifestTable
    val dir = scratch("reorg_sql")
    val mt = new ManifestTable(sqlSpark, dir)
    mt.write(Q.t(sqlSpark, sf, "orders")
      .select(col("o_orderkey"), col("o_orderstatus")).repartition(2),
      "overwrite")
    mt.delete(col("o_orderstatus") === "F")
    val live = mt.read().count()
    val res = sqlSpark.sql(s"CALL graft.reorg('$dir')").collect()
    assert(res.length === 1)
    val mt2 = ManifestTable.forRoot(sqlSpark, dir)
    assert(mt2.read().count() === live)
    assert(mt2.describeDetail().select("num_dv_files").head().getLong(0) === 0)
  }

  test("WAP stage/publish/drop via SQL") {
    import graft.lake.ManifestTable
    val dir = scratch("wap_sql")
    val mt = new ManifestTable(sqlSpark, dir)
    import sqlSpark.implicits._
    mt.write(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), "overwrite")
    Seq((3L, "c")).toDF("id", "v").createOrReplaceTempView("wap_src")
    sqlSpark.sql(s"CALL graft.wap_stage('$dir', 'wap_src', 'nightly')").collect()
    assert(mt.read().count() === 2) // still invisible on main
    assert(mt.readBranch("nightly").count() === 3)
    val v = sqlSpark.sql(s"CALL graft.wap_publish('$dir', 'nightly')")
      .head().getInt(0)
    assert(v > 0)
    assert(mt.read().count() === 3)
    // drop path
    Seq((9L, "z")).toDF("id", "v").createOrReplaceTempView("wap_src2")
    sqlSpark.sql(s"CALL graft.wap_stage('$dir', 'wap_src2', 'scrap')").collect()
    sqlSpark.sql(s"CALL graft.wap_drop('$dir', 'scrap')").collect()
    assert(mt.branches.isEmpty)
    assert(mt.read().count() === 3)
  }

  test("schema evolution from SQL: add_columns, deprecate_columns, registry refresh") {
    import sqlSpark.implicits._
    val dir = scratch("schemaevo")
    val regDir = scratch("schemaevo_reg")
    Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "name", "amt")
      .createOrReplaceTempView("evo_feed")
    sqlSpark.sql(s"CALL graft.write('$dir', 'evo_feed', 'overwrite')").collect()

    // ADD COLUMNS: metadata-only, surfaces immediately as typed NULL
    sqlSpark.sql(
      s"CALL graft.add_columns('$dir', 'loyalty_tier STRING, score BIGINT')")
      .collect()
    val mt = graft.lake.ManifestTable.forRoot(sqlSpark, dir)
    val r = mt.read()
    assert(r.columns.toSet ===
      Set("id", "name", "amt", "loyalty_tier", "score"))
    assert(r.filter(col("score").isNull).count() === 2)
    // a later write materializes real data for the declared column
    Seq((3L, "c", 30.0, "gold", 7L))
      .toDF("id", "name", "amt", "loyalty_tier", "score")
      .createOrReplaceTempView("evo_feed2")
    sqlSpark.sql(s"CALL graft.write('$dir', 'evo_feed2', 'append')").collect()
    assert(mt.read().filter(col("score") === 7L).count() === 1)
    // collisions refuse
    intercept[Exception] {
      sqlSpark.sql(s"CALL graft.add_columns('$dir', 'name STRING')").collect()
    }

    // DEPRECATE: declared-only column hides; file-backed column stays
    // readable but flagged
    sqlSpark.sql(s"CALL graft.deprecate_columns('$dir', 'amt')").collect()
    val schema = sqlSpark.sql(s"CALL graft.describe_schema('$dir')").collect()
      .map(row => row.getString(0) -> (row.getString(2), row.getBoolean(3)))
      .toMap
    assert(schema("amt") === (("declared", true)))
    assert(schema("loyalty_tier") === (("declared", false)))
    assert(schema("id") === (("data", false)))
    assert(mt.read().columns.contains("amt"), "deprecate keeps data")

    // registry refresh applies the UPDATE/DEPRECATE policy and
    // reports the diff
    val d1 = sqlSpark.sql(
      s"CALL graft.schema_register('$dir', '$regDir', 'evo')").collect()
    assert(d1.map(_.getString(0)).forall(_ === "added")) // first registration
    val reg = new graft.meta.SchemaRegistry(sqlSpark, regDir)
    assert(reg.tables === Seq("evo"))
    assert(reg.schemaOf("evo").get.fieldNames.contains("loyalty_tier"))
  }

  test("rename then re-add the old physical name refuses (mapping integrity)") {
    import sqlSpark.implicits._
    val dir = scratch("renameadd")
    Seq((1L, 5.0)).toDF("id", "amt").createOrReplaceTempView("ra_feed")
    sqlSpark.sql(s"CALL graft.write('$dir', 'ra_feed', 'overwrite')").collect()
    sqlSpark.sql(s"CALL graft.rename_column('$dir', 'amt', 'amount')").collect()
    // 'amt' is now the PHYSICAL name behind 'amount': a declared column
    // under that name would be re-renamed by the mapping on read and
    // duplicate the logical column — must refuse
    val ex = intercept[Exception] {
      sqlSpark.sql(s"CALL graft.add_columns('$dir', 'amt DOUBLE')").collect()
    }
    assert(ex.getMessage.contains("physical name"))
    // adding under a fresh name works, and renaming a DECLARED column
    // refuses (catalog identity is by name)
    sqlSpark.sql(s"CALL graft.add_columns('$dir', 'amt_v2 DOUBLE')").collect()
    val mt = graft.lake.ManifestTable.forRoot(sqlSpark, dir)
    assert(mt.read().columns.toSet === Set("id", "amount", "amt_v2"))
    intercept[Exception] {
      sqlSpark.sql(s"CALL graft.rename_column('$dir', 'amt_v2', 'x')").collect()
    }
  }

  test("tokenizer lifecycle through SQL: bpe_train, bpe_save, bpe_merges") {
    val root = scratch("bpe")
    val docs = Q.t(sqlSpark, sf, "documents").orderBy("doc_id").limit(60)
    docs.createOrReplaceTempView("sql_bpe_docs")
    // train-via-SQL equals the Scala surface merge-for-merge
    val viaSql = sqlSpark
      .sql("CALL graft.bpe_train('sql_bpe_docs', 'text', 8)")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(4)))
    val viaApi = graft.operators.BpeTrainer.train(docs, numMerges = 8)
      .map(m => (m.rank,
        m.left.replace(graft.functions.Bpe.W, "</w>"),
        m.right.replace(graft.functions.Bpe.W, "</w>"), m.freq))
    assert(viaSql.toSeq === viaApi)
    // persist: version 0, and the stored rows read back in rank order
    val v0 = sqlSpark
      .sql(s"CALL graft.bpe_save('$root', 'sql_bpe_docs', 'text', 8)")
      .first().getInt(0)
    val stored = sqlSpark.sql(s"CALL graft.bpe_merges('$root')")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(4)))
    assert(stored.toSeq === viaApi)
    // retrain deeper → overwrite commit; the OLD tokenizer is still
    // readable by version (tokenizers time-travel like any table)
    val v1 = sqlSpark
      .sql(s"CALL graft.bpe_save('$root', 'sql_bpe_docs', 'text', 12)")
      .first().getInt(0)
    assert(v1 == v0 + 1)
    assert(sqlSpark.sql(s"CALL graft.bpe_merges('$root')").count() == 12)
    val old = sqlSpark.sql(s"CALL graft.bpe_merges('$root', $v0)")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(4)))
    assert(old.toSeq === viaApi)
  }

  test("unigram lifecycle through SQL: unigram_train, _save, _vocab") {
    val root = scratch("unigram")
    val docs = Q.t(sqlSpark, sf, "documents").orderBy("doc_id").limit(60)
    docs.createOrReplaceTempView("sql_uni_docs")
    // train-via-SQL equals the Scala surface entry for entry
    val viaSql = sqlSpark
      .sql("CALL graft.unigram_train('sql_uni_docs', 'text', 50)")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val viaApi = graft.operators.UnigramTrainer
      .train(docs, targetVocab = 50)
      .map(e => (e.piece, e.count))
    assert(viaSql.toSeq === viaApi)
    // persist: version 0, read back in (count desc, piece asc) order
    val v0 = sqlSpark
      .sql(s"CALL graft.unigram_save('$root', 'sql_uni_docs', 'text', 50)")
      .first().getInt(0)
    val stored = sqlSpark.sql(s"CALL graft.unigram_vocab('$root')")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(stored.toSeq === viaApi)
    // retrain to a different target → overwrite commit; the OLD
    // vocabulary is still readable by version
    val v1 = sqlSpark
      .sql(s"CALL graft.unigram_save('$root', 'sql_uni_docs', 'text', 30)")
      .first().getInt(0)
    assert(v1 == v0 + 1)
    assert(sqlSpark.sql(s"CALL graft.unigram_vocab('$root')").count() <
      stored.length)
    val old = sqlSpark.sql(s"CALL graft.unigram_vocab('$root', $v0)")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(old.toSeq === viaApi)
  }

  test("unigram_bind serves SQL encode equal to encodeCounts, entry for entry") {
    val root = scratch("unigram_bind")
    val docs = Q.t(sqlSpark, sf, "documents").orderBy("doc_id").limit(80)
    docs.createOrReplaceTempView("sql_unib_docs")
    sqlSpark.sql(
      s"CALL graft.unigram_save('$root', 'sql_unib_docs', 'text', 60)")
    // bind the persisted vocabulary (latest version) into the one-arg
    // SQL function
    val bound = sqlSpark.sql(s"CALL graft.unigram_bind('$root')").first()
    assert(bound.getInt(1) > 0, "bind reports the vocabulary size")
    val viaSql = sqlSpark.sql(
      "SELECT doc_id, graft_unigram_encode(text) AS n_pieces " +
        "FROM sql_unib_docs ORDER BY doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // the Dataset surface on the SAME persisted counts (log-probs
    // recomputed from integer counts on both paths)
    val counts = graft.lake.ManifestTable.forRoot(sqlSpark, root).read()
      .select("piece", "count")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val viaApi = graft.operators.UnigramTrainer
      .encodeCounts(docs, graft.operators.UnigramTrainer.fixedVocab(counts))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(viaSql.toSeq === viaApi.toSeq)
    assert(viaSql.exists(_._2 > 0L), "non-trivial piece counts")
    // a rebind after a retrain picks up the NEW vocabulary
    sqlSpark.sql(
      s"CALL graft.unigram_save('$root', 'sql_unib_docs', 'text', 20)")
    val rebound = sqlSpark.sql(s"CALL graft.unigram_bind('$root')").first()
    assert(rebound.getInt(0) === bound.getInt(0) + 1, "binds the new version")
    // binding an explicit OLD version restores the old answers
    sqlSpark.sql(s"CALL graft.unigram_bind('$root', ${bound.getInt(0)})")
    val viaSqlOld = sqlSpark.sql(
      "SELECT doc_id, graft_unigram_encode(text) AS n_pieces " +
        "FROM sql_unib_docs ORDER BY doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(viaSqlOld.toSeq === viaApi.toSeq)
    // the Column API (which re-registers the function) must NOT break
    // the bound one-argument SQL form: both surfaces share ONE
    // registration that dispatches on arity
    val viaCol = docs.select(col("doc_id"),
      graft.functions.UnigramEncodeCount.countCol(sqlSpark, col("text"), counts)
        .as("n_pieces"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(viaCol.toSeq === viaApi.toSeq)
    sqlSpark.sql(s"CALL graft.unigram_bind('$root', ${bound.getInt(0)})")
    val viaSqlAfterCol = sqlSpark.sql(
      "SELECT doc_id, graft_unigram_encode(text) AS n_pieces " +
        "FROM sql_unib_docs ORDER BY doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(viaSqlAfterCol.toSeq === viaApi.toSeq,
      "countCol's registration must not clobber the bound 1-arg form")
  }

  test("malformed CALLs fail loudly, not silently") {
    intercept[Exception] {
      sqlSpark.sql("CALL graft.nosuch('/tmp/x')").collect()
    }
    intercept[Exception] {
      sqlSpark.sql("CALL graft.merge('/tmp/x', unquoted, 'k')").collect()
    }
    intercept[Exception] {
      sqlSpark.sql("CALL graft.merge('/tmp/x', 'v',)").collect()
    }
  }
}

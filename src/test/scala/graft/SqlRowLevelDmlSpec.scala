package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Plain-SQL `UPDATE` / `MERGE INTO` over catalog tables — the
  * GraftDmlRules lowering onto updateWhere / mergeInto: ANSI
  * simultaneous assignments, three-sided merge clauses with
  * first-match-wins, source-name disambiguation, cardinality
  * violation, no-op version contract, and loud refusal of the shapes
  * the lowering does not support.
  */
class SqlRowLevelDmlSpec extends SparkTestBase {
  quiet()

  private val lakeRoot =
    s"${sys.props("java.io.tmpdir")}/graft_rldml_${System.nanoTime()}"

  /** A session with GraftExtensions on the shared context (the base
    * test session predates the extensions) — same pattern as
    * SqlDmlSpec, plus the DSv2 catalog pointed at this suite's root.
    */
  lazy val s: SparkSession = {
    val ss = extensionsSession("graft-rldml")
    ss.conf.set("spark.sql.catalog.rldml", "graft.sql.GraftCatalog")
    ss.conf.set("spark.sql.catalog.rldml.root", lakeRoot)
    ss
  }

  private def mt(name: String) =
    graft.lake.ManifestTable.forRoot(s, s"$lakeRoot/db/$name")

  /** Fresh 4-row table under the catalog; returns its SQL name. */
  private def fresh(name: String): String = {
    import s.implicits._
    val df = Seq((1L, "A", 10.0), (2L, "B", 20.0), (3L, "A", 30.0),
      (4L, "C", 40.0)).toDF("id", "status", "amount")
    new graft.lake.ManifestTable(s, s"$lakeRoot/db/$name")
      .write(df, "overwrite")
    s"rldml.db.$name"
  }

  private def rows(t: String): Seq[(Long, String, Double)] = {
    import s.implicits._
    s.sql(s"SELECT * FROM $t").as[(Long, String, Double)]
      .collect().sortBy(_._1).toSeq
  }

  test("UPDATE ... SET ... WHERE lowers to a DV merge-on-read commit") {
    val t = fresh("upd1")
    val v = s.sql(s"UPDATE $t SET amount = amount * 2 WHERE status = 'A'")
      .first().getInt(0)
    assert(v === 1, "one commit on top of the initial write")
    assert(rows(t) === Seq((1L, "A", 20.0), (2L, "B", 20.0),
      (3L, "A", 60.0), (4L, "C", 40.0)))
    // merge-on-read: the pre-update snapshot is intact (time travel)
    assert(mt("upd1").read(Some(0)).filter(col("amount") === 10.0)
      .count() === 1)
    // int literal into a double column: store-assignment cast
    s.sql(s"UPDATE $t SET amount = 7 WHERE id = 4")
    assert(rows(t).find(_._1 == 4L).get._3 === 7.0)
  }

  test("UPDATE assignments are simultaneous (ANSI): SET a=b, b=a swaps") {
    import s.implicits._
    val root = s"$lakeRoot/db/swap"
    new graft.lake.ManifestTable(s, root)
      .write(Seq((1L, 5.0, 9.0)).toDF("id", "a", "b"), "overwrite")
    s.sql(s"UPDATE rldml.db.swap SET a = b, b = a")
    val r = s.sql("SELECT a, b FROM rldml.db.swap").first()
    assert(r.getDouble(0) === 9.0 && r.getDouble(1) === 5.0,
      "later assignments must see the OLD row, not earlier results")
  }

  test("UPDATE with a subquery condition is refused loudly") {
    val t = fresh("updsub")
    val e = intercept[Exception] {
      s.sql(s"UPDATE $t SET amount = 0 " +
        s"WHERE id IN (SELECT id FROM $t WHERE status = 'A')")
    }
    assert(messageChain(e).contains("subqueries are not supported"))
  }

  test("UPDATE on a non-graft table still raises Spark's standard error") {
    import s.implicits._
    Seq((1, "x")).toDF("id", "v").createOrReplaceTempView("rldml_plain")
    val e = intercept[Exception] {
      s.sql("UPDATE rldml_plain SET v = 'y'")
    }
    assert(!messageChain(e).contains("graft"),
      s"must be the stock error, got: ${messageChain(e)}")
  }

  test("MERGE INTO: matched update + not-matched insert, same col names") {
    import s.implicits._
    val t = fresh("m1")
    // source shares every column name with the target — the lowering's
    // positional rename must disambiguate
    Seq((2L, "B", 200.0), (9L, "Z", 90.0))
      .toDF("id", "status", "amount").createOrReplaceTempView("m1_src")
    val v = s.sql(
      s"""MERGE INTO $t AS t USING m1_src AS s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET amount = s.amount
         |WHEN NOT MATCHED THEN INSERT (id, status, amount)
         |  VALUES (s.id, s.status, s.amount)""".stripMargin)
      .first().getInt(0)
    assert(v === 1)
    assert(rows(t) === Seq((1L, "A", 10.0), (2L, "B", 200.0),
      (3L, "A", 30.0), (4L, "C", 40.0), (9L, "Z", 90.0)))
    // pre-merge snapshot intact; the merge appended, never rewrote
    assert(mt("m1").read(Some(0)).count() === 4)
  }

  test("MERGE conditional arms are first-match-wins; DELETE arm marks") {
    import s.implicits._
    val t = fresh("m2")
    Seq((1L, 100.0), (2L, 0.0), (3L, 300.0))
      .toDF("sid", "samount").createOrReplaceTempView("m2_src")
    s.sql(
      s"""MERGE INTO $t USING m2_src ON id = sid
         |WHEN MATCHED AND samount = 0 THEN DELETE
         |WHEN MATCHED AND id = 1 THEN UPDATE SET amount = samount
         |WHEN MATCHED THEN UPDATE SET status = 'M'
         |""".stripMargin)
    assert(rows(t) === Seq((1L, "A", 100.0), (3L, "M", 30.0),
      (4L, "C", 40.0)),
      "id=2 deleted, id=1 hit arm 2 only (first match wins), id=3 arm 3")
  }

  test("MERGE NOT MATCHED BY SOURCE delete/update arms") {
    import s.implicits._
    val t = fresh("m3")
    Seq(1L, 2L).toDF("sid").createOrReplaceTempView("m3_src")
    s.sql(
      s"""MERGE INTO $t USING m3_src ON id = sid
         |WHEN MATCHED THEN UPDATE SET status = 'K'
         |WHEN NOT MATCHED BY SOURCE AND id = 3 THEN DELETE
         |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET status = 'G'
         |""".stripMargin)
    assert(rows(t) === Seq((1L, "K", 10.0), (2L, "K", 20.0),
      (4L, "G", 40.0)))
  }

  test("MERGE with a non-equi ON condition") {
    import s.implicits._
    val t = fresh("m4")
    Seq((0L, 25.0)).toDF("lo", "hi").createOrReplaceTempView("m4_src")
    s.sql(
      s"""MERGE INTO $t USING m4_src ON id > lo AND amount < hi
         |WHEN MATCHED THEN UPDATE SET status = 'R'
         |""".stripMargin)
    assert(rows(t) === Seq((1L, "R", 10.0), (2L, "R", 20.0),
      (3L, "A", 30.0), (4L, "C", 40.0)))
  }

  test("MERGE partial INSERT column list fills NULL") {
    import s.implicits._
    val t = fresh("m5")
    Seq(7L).toDF("sid").createOrReplaceTempView("m5_src")
    s.sql(
      s"""MERGE INTO $t USING m5_src ON id = sid
         |WHEN NOT MATCHED THEN INSERT (id) VALUES (sid)""".stripMargin)
    val r = s.sql(s"SELECT * FROM $t WHERE id = 7").first()
    assert(r.isNullAt(1) && r.isNullAt(2))
  }

  test("MERGE cardinality violation throws; no partial commit") {
    import s.implicits._
    val t = fresh("m6")
    val v0 = mt("m6").latestVersion.get
    Seq((1L, 1.0), (1L, 2.0)).toDF("sid", "samount")
      .createOrReplaceTempView("m6_src")
    val e = intercept[Exception] {
      s.sql(
        s"""MERGE INTO $t USING m6_src ON id = sid
           |WHEN MATCHED THEN UPDATE SET amount = samount""".stripMargin)
    }
    assert(messageChain(e).contains("cardinality violation"))
    assert(mt("m6").latestVersion.get === v0, "no version published")
    assert(rows(t).find(_._1 == 1L).get._3 === 10.0)
  }

  test("MERGE matching nothing and inserting nothing is a version no-op") {
    import s.implicits._
    val t = fresh("m7")
    val v0 = mt("m7").latestVersion.get
    Seq(99L).toDF("sid").createOrReplaceTempView("m7_src")
    val v = s.sql(
      s"""MERGE INTO $t USING m7_src ON id = sid
         |WHEN MATCHED THEN DELETE""".stripMargin).first().getInt(0)
    assert(v === v0 && mt("m7").latestVersion.get === v0)
  }

  test("MERGE WITH SCHEMA EVOLUTION: new source columns flow through " +
      "the L26 add-column policy (Delta autoMerge semantics)") {
    import s.implicits._
    val t = fresh("m8")
    // source = target schema + a NEW column `note`
    Seq((1L, "Z", 11.0, "hot"), (9L, "N", 90.0, "fresh"))
      .toDF("id", "status", "amount", "note")
      .createOrReplaceTempView("m8_src")
    s.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO $t USING m8_src ON $t.id = m8_src.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val out = s.sql(s"SELECT id, status, amount, note FROM $t")
      .as[(Long, String, Double, Option[String])].collect().sortBy(_._1)
    assert(out === Seq(
      (1L, "Z", 11.0, Some("hot")),   // matched: full replace incl note
      (2L, "B", 20.0, None),          // untouched legacy rows read NULL
      (3L, "A", 30.0, None),
      (4L, "C", 40.0, None),
      (9L, "N", 90.0, Some("fresh")))) // insert carries the new column
    // the evolution went through the declared-schema policy: the
    // column is part of the table now, not a per-file artifact
    assert(mt("m8").read(Some(0)).columns.contains("note"),
      "time travel surfaces the declared column (typed NULL) too")
  }

  test("the same MERGE without WITH SCHEMA EVOLUTION does NOT evolve: " +
      "star actions align to the target, explicit new-column " +
      "assignment refuses loudly") {
    import s.implicits._
    val t = fresh("m8b")
    Seq((1L, "Z", 11.0, "hot")).toDF("id", "status", "amount", "note")
      .createOrReplaceTempView("m8b_src")
    // star actions: standard SQL alignment — the extra source column
    // is simply not assigned, and the schema must not change
    s.sql(
      s"""MERGE INTO $t USING m8b_src ON $t.id = m8b_src.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(!s.sql(s"SELECT * FROM $t").columns.contains("note"),
      "a plain MERGE must not evolve the schema")
    assert(rows(t).find(_._1 == 1L).get === ((1L, "Z", 11.0)))
    // an EXPLICIT assignment to the unknown column is an analysis error
    val e = intercept[Exception] {
      s.sql(
        s"""MERGE INTO $t USING m8b_src ON $t.id = m8b_src.id
           |WHEN MATCHED THEN UPDATE SET note = m8b_src.note""".stripMargin)
    }
    assert(!s.sql(s"SELECT * FROM $t").columns.contains("note"))
  }

  test("WITH SCHEMA EVOLUTION type conflicts are refused loudly " +
      "(add-only policy: no silent type widening)") {
    import s.implicits._
    val root = s"$lakeRoot/db/m8c"
    new graft.lake.ManifestTable(s, root)
      .write(Seq((1L, 10)).toDF("id", "n"), "overwrite") // n: INT
    Seq((1L, 99L)).toDF("id", "n") // n: LONG — an upcast-able widening
      .createOrReplaceTempView("m8c_src")
    val e = intercept[Exception] {
      s.sql(
        s"""MERGE WITH SCHEMA EVOLUTION INTO rldml.db.m8c USING m8c_src
           |ON rldml.db.m8c.id = m8c_src.id
           |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    }
    assert(messageChain(e).toLowerCase.contains("not supported"),
      s"expected the alterTable refusal, got: ${messageChain(e)}")
  }

  test("self-merge: the target is its own (aggregated) source") {
    import s.implicits._
    val t = fresh("m9")
    // delete every row whose amount is below the table's own mean
    s.sql(
      s"""MERGE INTO $t USING
         |  (SELECT avg(amount) AS mean FROM $t) m ON amount < mean
         |WHEN MATCHED THEN DELETE""".stripMargin)
    assert(rows(t) === Seq((3L, "A", 30.0), (4L, "C", 40.0)))
  }

  test("MERGE commit shape: appends + DV marks, zero files rewritten") {
    import s.implicits._
    val t = fresh("shape1")
    Seq((2L, 200.0), (9L, 90.0)).toDF("sid", "samount")
      .createOrReplaceTempView("shape1_src")
    s.sql(
      s"""MERGE INTO $t USING shape1_src ON id = sid
         |WHEN MATCHED THEN UPDATE SET amount = samount
         |WHEN NOT MATCHED THEN INSERT (id, amount) VALUES (sid, samount)
         |""".stripMargin)
    // the merge version is a pure delta: new files for the updated
    // copy + insert, DV sidecar re-points, NOTHING removed — the
    // O(matched + inserted) commit contract at any table size
    val h = mt("shape1").history()
      .orderBy(col("version").desc).first()
    assert(h.getAs[Long]("files_removed") === 0L,
      s"merge must never rewrite existing data files: $h")
    assert(h.getAs[Long]("files_added") > 0L)
    assert(h.getAs[Long]("dv_deleted_rows") === 1L, s"one matched mark: $h")
  }

  test("updateWhere resolves assignment keys case-insensitively") {
    fresh("ci1")
    val tab = mt("ci1")
    tab.updateWhere(col("id") === 1L, Map("AMOUNT" -> lit(99.0)))
    assert(tab.read().filter(col("id") === 1L).select("amount")
      .first().getDouble(0) === 99.0)
    val e = intercept[IllegalArgumentException] {
      tab.updateWhere(col("id") === 1L, Map("nope" -> lit(0.0)))
    }
    assert(e.getMessage.contains("unknown column"))
  }

  test("mergeInto API casts clause values to the column type") {
    import s.implicits._
    fresh("cast1")
    val tab = mt("cast1")
    // INT literal into a DOUBLE column: without the cast the appended
    // file's schema would no longer merge with the table's
    tab.mergeInto(Seq(9L).toDF("sid"), col("id") === col("sid"),
      notMatched = Seq(graft.lake.MergeInsertClause(None,
        Map("id" -> col("sid"), "amount" -> lit(1)))))
    tab.mergeInto(Seq(1L).toDF("sid2"), col("id") === col("sid2"),
      matched = Seq(graft.lake.MergeUpdateClause(None,
        Map("amount" -> lit(2)))))
    val got = tab.read().filter(col("id").isin(1L, 9L))
      .select("id", "amount").collect().map(r =>
        (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    assert(got === Seq((1L, 2.0), (9L, 1.0)))
  }

  test("mergeInto refuses a source column named _graft_merge_arm") {
    import s.implicits._
    fresh("arm1")
    val e = intercept[IllegalArgumentException] {
      mt("arm1").mergeInto(
        Seq((1L, 0)).toDF("sid", "_graft_merge_arm"),
        col("id") === col("sid"),
        matched = Seq(graft.lake.MergeDeleteClause(None)))
    }
    assert(e.getMessage.contains("reserved by MERGE"))
  }

  test("mergeInto API: insert-only merge into an empty table") {
    import s.implicits._
    s.sql("CREATE TABLE rldml.db.m10 (id BIGINT, v STRING)")
    val src = Seq((5L, "x")).toDF("sid", "sv")
    val tab = mt("m10")
    val v = tab.mergeInto(src, col("id") === col("sid"),
      notMatched = Seq(graft.lake.MergeInsertClause(None,
        Map("id" -> col("sid"), "v" -> col("sv")))))
    assert(v === tab.latestVersion.get)
    assert(tab.read().count() === 1)
  }

  test("row-level DML sees declared-only columns (ALTER ADD COLUMNS)") {
    val t = fresh("declared1")
    s.sql(s"ALTER TABLE $t ADD COLUMNS (note STRING)")
    // UPDATE assigns a column that exists only in the declared schema
    s.sql(s"UPDATE $t SET note = 'flagged' WHERE status = 'A'")
    val notes = s.sql(s"SELECT id, note FROM $t ORDER BY id")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(notes(1L) === Some("flagged") && notes(3L) === Some("flagged"))
    assert(notes(2L) === None && notes(4L) === None)
    // DELETE matches on it
    s.sql(s"DELETE FROM $t WHERE note = 'flagged'")
    assert(s.sql(s"SELECT count(*) FROM $t").first().getLong(0) === 2L)
    // MERGE inserts into it
    import s.implicits._
    Seq((9L, "D", 90.0, "new")).toDF("sid", "sstatus", "samount", "snote")
      .createOrReplaceTempView("decl_feed")
    s.sql(
      s"""MERGE INTO $t USING decl_feed ON id = sid
         |WHEN NOT MATCHED THEN
         |  INSERT (id, status, amount, note)
         |  VALUES (sid, sstatus, samount, snote)""".stripMargin)
    assert(s.sql(s"SELECT note FROM $t WHERE id = 9").first()
      .getString(0) === "new")
    // a column COMMENT has no declared-schema home: refused loudly,
    // never silently dropped (same policy as CREATE TABLE)
    val e = intercept[Exception] {
      s.sql(s"ALTER TABLE $t ADD COLUMNS (c2 STRING COMMENT 'audit')")
    }
    assert(messageChain(e).contains("COMMENT"))
  }

  test("TRUNCATE on a writer-created partitioned table keeps the schema") {
    import s.implicits._
    // created by a plain partitioned write — no CREATE TABLE, so the
    // schema lives only in data files until TRUNCATE declares it
    new graft.lake.ManifestTable(s, s"$lakeRoot/db/trunc_p",
      partitionCols = Seq("status"))
      .write(Seq((1L, "A", 10.0)).toDF("id", "status", "amount"),
        "overwrite")
    s.sql("TRUNCATE TABLE rldml.db.trunc_p")
    val emptied = s.sql("SELECT * FROM rldml.db.trunc_p")
    assert(emptied.count() === 0)
    assert(emptied.columns.sorted.toSeq === Seq("amount", "id", "status"),
      "the empty partitioned overwrite must not erase the schema")
    // explicit column list: hive-layout reads order partition columns
    // LAST, so the declared order is (id, amount, status)
    s.sql("INSERT INTO rldml.db.trunc_p (id, status, amount) " +
      "VALUES (2, 'B', 20.0)")
    assert(s.sql("SELECT id FROM rldml.db.trunc_p").first().getLong(0) === 2L)
    // an UNPARTITIONED truncate must NOT declare (declaring is
    // one-way: declared columns refuse rename_column) — the empty
    // overwrite's own parquet footer keeps the schema
    val tu = fresh("trunc_u")
    s.sql(s"TRUNCATE TABLE $tu")
    assert(s.sql(s"SELECT * FROM $tu").columns.sorted.toSeq
      === Seq("amount", "id", "status"))
    mt("trunc_u").renameColumn("status", "state") // still a data column
    assert(mt("trunc_u").read().columns.contains("state"))
    // a column COMMENT on CREATE TABLE refuses loudly too (it would
    // silently vanish through the null-fill read path)
    val eC = intercept[Exception] {
      s.sql("CREATE TABLE rldml.db.ccmt (c1 STRING COMMENT 'audit')")
    }
    assert(messageChain(eC).contains("COMMENT"))
  }
}

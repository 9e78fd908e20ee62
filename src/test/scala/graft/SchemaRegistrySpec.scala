package graft

import graft.meta.SchemaRegistry
import org.apache.spark.sql.types._

/** S6/S7: Glue-SchemaChangePolicy-equivalent evolution —
  * UPDATE_IN_DATABASE (add/retype) + DEPRECATE_IN_DATABASE (soft
  * delete), per /root/reference/glue_infra.py:101-104.
  */
class SchemaRegistrySpec extends SparkTestBase {
  quiet()

  private def freshRegistry(name: String): SchemaRegistry = {
    val dir = s"${sys.props("java.io.tmpdir")}/graft_test_registry_$name"
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    new SchemaRegistry(spark, dir)
  }

  val v1 = StructType(Seq(
    StructField("id", IntegerType),
    StructField("amount", DoubleType),
    StructField("note", StringType)))

  test("first registration adds all columns") {
    val reg = freshRegistry("first")
    val diff = reg.register("t", v1)
    assert(diff.added === Seq("id", "amount", "note"))
    assert(reg.schemaOf("t").contains(v1))
    assert(reg.tables === Seq("t"))
  }

  test("new column appends (UPDATE_IN_DATABASE)") {
    val reg = freshRegistry("add")
    reg.register("t", v1)
    val v2 = StructType(v1.fields :+ StructField("extra", LongType))
    val diff = reg.register("t", v2)
    assert(diff.added === Seq("extra"))
    assert(diff.deprecated.isEmpty)
    assert(reg.schemaOf("t").get.fieldNames.toSeq ===
      Seq("id", "amount", "note", "extra"))
  }

  test("missing column deprecates, not drops (DEPRECATE_IN_DATABASE)") {
    val reg = freshRegistry("dep")
    reg.register("t", v1)
    val without = StructType(v1.fields.filterNot(_.name == "note"))
    val diff = reg.register("t", without)
    assert(diff.deprecated === Seq("note"))
    val evolved = reg.schemaOf("t").get
    assert(evolved.fieldNames.contains("note")) // kept
    assert(reg.isDeprecated(evolved("note")))
    // re-registering the same shrunken schema reports no NEW deprecations
    assert(reg.register("t", without).deprecated.isEmpty)
  }

  test("type change updates in place") {
    val reg = freshRegistry("retype")
    reg.register("t", v1)
    val retyped = StructType(v1.fields.map {
      case f if f.name == "amount" => f.copy(dataType = DecimalType(10, 2))
      case f => f
    })
    val diff = reg.register("t", retyped)
    assert(diff.retyped === Seq(("amount", "double", "decimal(10,2)")))
    assert(reg.schemaOf("t").get("amount").dataType === DecimalType(10, 2))
  }

  test("re-appearing column clears deprecation") {
    val reg = freshRegistry("revive")
    reg.register("t", v1)
    reg.register("t", StructType(v1.fields.filterNot(_.name == "note")))
    reg.register("t", v1)
    assert(!reg.isDeprecated(reg.schemaOf("t").get("note")))
  }

  test("re-appearing column with a NEW TYPE also clears deprecation") {
    import org.apache.spark.sql.types._
    val reg = freshRegistry("revive_retype")
    reg.register("t", v1)
    reg.register("t", StructType(v1.fields.filterNot(_.name == "note")))
    // 'note' comes back retyped: it is live in the source, so keeping
    // the deprecated flag would make consumers silently drop it
    val retyped = StructType(v1.fields.map(f =>
      if (f.name == "note") f.copy(dataType = IntegerType) else f))
    reg.register("t", retyped)
    val f = reg.schemaOf("t").get("note")
    assert(f.dataType === IntegerType)
    assert(!reg.isDeprecated(f), "retyped revival must shed the deprecation flag")
  }
}

/** L40: DEFAULT values on evolved columns — declared-only reads, the
  * existence-default slot for files predating the column, explicit
  * NULLs surviving, and the constant-only refusal.
  */
class DefaultColumnSpec extends SparkTestBase {
  quiet()
  import spark.implicits._
  import graft.lake.ManifestTable
  import org.apache.spark.sql.functions._

  private def scratch(name: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_dflt_${name}_${System.nanoTime()}"

  test("declared-only DEFAULT surfaces instead of NULL; files predating " +
      "the column read it; newer explicit NULLs stay NULL") {
    val mt = new ManifestTable(spark, scratch("mixed"))
    mt.write(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), "overwrite")
    mt.addColumnWithDefault("chan", "STRING", "'web'")
    // declared-only (no file holds it yet): every row reads the default
    assert(mt.read().select("chan").as[String].collect().toSeq ===
      Seq("web", "web"))
    // materialize the column in a NEW file, with one explicit NULL
    mt.write(Seq((3L, "c", "store"), (4L, "d", null))
      .toDF("id", "s", "chan"), "append")
    val out = mt.read().select("id", "chan").as[(Long, Option[String])]
      .collect().toMap
    assert(out(1L) === Some("web") && out(2L) === Some("web"),
      "pre-column files must read the default")
    assert(out(3L) === Some("store"))
    assert(out(4L) === None,
      "an explicit NULL in a newer file must stay NULL — the " +
        "default is an existence default, not a coalesce")
  }

  test("typed + expression defaults are evaluated once and stored as " +
      "literals; column references refuse") {
    val mt = new ManifestTable(spark, scratch("typed"))
    mt.write(Seq((1L, 5.0)).toDF("id", "x"), "overwrite")
    mt.addColumnWithDefault("since", "DATE", "DATE'2024-01-02'")
    mt.addColumnWithDefault("score", "DOUBLE", "1 + 2 * 3")
    val r = mt.read().select("since", "score").first()
    assert(r.getDate(0).toString === "2024-01-02")
    assert(r.getDouble(1) === 7.0)
    val e = intercept[IllegalArgumentException] {
      mt.addColumnWithDefault("bad", "DOUBLE", "x * 2")
    }
    assert(e.getMessage.contains("constant"))
  }

  test("DML over a defaulted column: an update copy materializes the " +
      "default it read") {
    val mt = new ManifestTable(spark, scratch("dml"))
    mt.write(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), "overwrite")
    mt.addColumnWithDefault("chan", "STRING", "'web'")
    mt.updateWhere(col("id") === 1L, Map("s" -> lit("a!")))
    assert(mt.read().filter(col("id") === 1L)
      .select("chan").as[String].first() === "web")
    assert(mt.read().filter(col("s") === "a!").count() === 1)
  }

  test("SQL surface: CALL graft.add_columns(root, 'c TYPE', default)") {
    val ss = extensionsSession("graft-default-sql")
    val root = scratch("sql")
    new ManifestTable(ss, root)
      .write(ss.range(3).toDF("id"), "overwrite")
    ss.sql(s"CALL graft.add_columns('$root', 'tier STRING', '''bronze''')")
    assert(ss.sql(s"CALL graft.describe_schema('$root')")
      .collect().exists(_.getString(0) == "tier"))
    val vals = ManifestTable.forRoot(ss, root).read()
      .select("tier").distinct().collect().map(_.getString(0)).toSeq
    assert(vals === Seq("bronze"))
  }
}

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

package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}

/** One table-address vocabulary for every non-SELECT surface.
  *
  * The DSv2 catalog gives `SELECT`/DML a NAME for each governed table,
  * but the `CALL graft.*` procedures and the `graft-table` streaming
  * source were still addressed by filesystem root — so the moment a
  * user graduated from queries to maintenance (`OPTIMIZE`, `VACUUM`,
  * `RESTORE`) or to tailing a table, they had to know where the
  * catalog had put it. This resolver closes that seam: an address is
  * either
  *
  *   - a filesystem path (contains `/` — used verbatim), or
  *   - a dotted catalog name `cat.ns….table`, resolved through the
  *     session's registered [[GraftCatalog]] to the table directory
  *     the catalog manages (`<root>/<ns…>/<table>`).
  *
  * Resolution is strict: a dotted name whose head is not a registered
  * GraftCatalog, or that names no existing table, fails loudly — it is
  * never silently treated as a relative path (a typo'd name would
  * otherwise create a fresh empty table in the working directory and
  * "succeed").
  *
  * Scale: resolution is two driver-side filesystem `exists` calls (the
  * catalog's own table check); nothing is scanned.
  */
object GraftNames {

  /** True when `address` can only be a path: qualified URIs and
    * anything with a directory separator.
    */
  private def isPath(address: String): Boolean =
    address.contains('/') || address.contains('\\')

  /** Guard for PATH-ONLY options (the source/sink `root`/`path`):
    * values pass through verbatim, except that a slash-less dotted
    * value whose head names a registered [[GraftCatalog]] is ambiguous
    * — the user almost certainly meant the name — and refuses with
    * guidance rather than silently creating a fresh table at a literal
    * relative path while the governed table goes untouched.
    */
  def requireUnambiguousPath(spark: SparkSession, address: String): String = {
    if (!isPath(address) && address.contains('.')) {
      // limit -1 keeps empty segments ('.': ["",""]); head is then ""
      // and never names a catalog, so bare dots pass through verbatim
      val head = address.split("\\.", -1).head
      val namesGraftCatalog = try {
        spark.sessionState.catalogManager.catalog(head)
          .isInstanceOf[GraftCatalog]
      } catch { case _: Exception => false }
      require(!namesGraftCatalog,
        s"option value '$address' is ambiguous: '$head' is a registered " +
          "graft catalog — pass catalog names via .option(\"table\", …), " +
          s"or make the path unambiguous (e.g. ./$address)")
    }
    address
  }

  /** Resolve a table address (path or `cat.ns….table` name) to the
    * manifest-table root directory. Paths pass through verbatim.
    */
  def resolveRoot(spark: SparkSession, address: String): String = {
    if (isPath(address) || !address.contains('.')) address
    else {
      // limit -1 keeps trailing empty segments — a plain split drops
      // them, so 'cat.ns.' would silently collapse to table 'ns' in
      // the ROOT namespace (a DIFFERENT table than anything the user
      // named) instead of failing here
      val parts = address.split("\\.", -1)
      require(parts.length >= 2 && parts.forall(_.nonEmpty),
        s"malformed table name '$address': expected cat.ns….table")
      val cat = try {
        spark.sessionState.catalogManager.catalog(parts.head)
      } catch {
        case e: Exception => throw new IllegalArgumentException(
          s"table address '$address' looks like a catalog name but " +
            s"'${parts.head}' is not a registered catalog " +
            "(set spark.sql.catalog." + parts.head + " = " +
            "graft.sql.GraftCatalog, or pass a filesystem root)", e)
      }
      cat match {
        case g: GraftCatalog =>
          val ident = Identifier.of(parts.tail.init, parts.last)
          g.loadTable(ident) match {
            case t: GraftSqlTable => t.root
            case other => throw new IllegalArgumentException(
              s"'$address' resolved to unexpected table ${other.getClass}")
          }
        case other: TableCatalog => throw new IllegalArgumentException(
          s"catalog '${parts.head}' is ${other.getClass.getName}, not a " +
            "graft.sql.GraftCatalog — only graft catalogs expose " +
            "manifest roots")
        case other => throw new IllegalArgumentException(
          s"catalog '${parts.head}' (${other.getClass.getName}) is not " +
            "a table catalog")
      }
    }
  }

  /** Expand a SWEEP address — `cat.ns.*` (every table the catalog
    * lists in the namespace) or a path glob ending in `"/" + "*"`
    * (every manifest-table child directory) — to name-ordered table
    * roots; a non-glob address resolves to its single root. The
    * multi-table maintenance surface
    * (`CALL graft.maintenance_plan('lake.silver.*')`) rides on this so
    * the advisor covers the lake, not one root at a time.
    */
  def resolveRoots(spark: SparkSession, address: String): Seq[String] = {
    if (isPath(address) && address.endsWith("/*")) {
      val parent = new org.apache.hadoop.fs.Path(address.dropRight(2))
      val fs = parent.getFileSystem(spark.sessionState.newHadoopConf())
      require(fs.exists(parent), s"no directory $parent to sweep")
      fs.listStatus(parent).toSeq.filter(_.isDirectory).map(_.getPath)
        .filter(p => fs.exists(
          new org.apache.hadoop.fs.Path(p, "_graft_log")))
        .map(_.toString).sorted
    } else if (!isPath(address) && address.endsWith(".*")) {
      val parts = address.split("\\.", -1)
      require(parts.length >= 2 && parts.forall(_.nonEmpty),
        s"malformed sweep address '$address': expected cat.ns….*")
      val cat = try {
        spark.sessionState.catalogManager.catalog(parts.head)
      } catch {
        case e: Exception => throw new IllegalArgumentException(
          s"sweep address '$address' names no registered catalog " +
            s"'${parts.head}'", e)
      }
      cat match {
        case g: GraftCatalog =>
          g.listTables(parts.tail.init).toSeq.sortBy(_.name).map { id =>
            g.loadTable(id) match {
              case t: GraftSqlTable => t.root
              case other => throw new IllegalArgumentException(
                s"'$address' listed unexpected table ${other.getClass}")
            }
          }
        case other => throw new IllegalArgumentException(
          s"catalog '${parts.head}' (${other.getClass.getName}) is not " +
            "a graft.sql.GraftCatalog — only graft catalogs can sweep")
      }
    } else Seq(resolveRoot(spark, address))
  }
}

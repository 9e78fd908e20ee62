package graft.sql

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.AliasIdentifier
import org.apache.spark.sql.catalyst.analysis.{CurrentNamespace, UnresolvedAttribute, UnresolvedIdentifier, UnresolvedNamespace, UnresolvedRelation, UnresolvedTableOrView, UnresolvedView}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute}
import org.apache.spark.sql.catalyst.plans.logical.{AlterViewAs, CreateView, DropView, LogicalPlan, Project, RenameTable, ShowViews, SubqueryAlias, UnaryCommand}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, ViewCatalog, ViewInfo}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.StructType

/** Persistent SQL views over [[GraftCatalog]] — the analyzer wiring
  * Spark core does not ship: the DSv2 `ViewCatalog` interface exists
  * (and [[GraftCatalog]] implements it, persisting each view as a
  * properties file in a `_graft_views` sidecar next to the data), but
  * as of Spark 4.x no built-in rule routes `CREATE VIEW` / relation
  * resolution / `SHOW VIEWS` / `DROP VIEW` to a V2 view catalog — the
  * same gap Iceberg fills with its own extension rules. This rule is
  * that wiring, injected by [[graft.GraftExtensions]]:
  *
  *  - `CREATE [OR REPLACE] VIEW cat.ns.v AS SELECT …` → persisted
  *    through `ViewCatalog.createView`/`replaceView` with the view
  *    text, the session's current catalog/namespace (the resolution
  *    context unqualified names in the text need later), the analyzed
  *    output schema, and any user column aliases/comments;
  *  - `SELECT … FROM cat.ns.v` → the analyzer's table lookup misses
  *    (views are not tables), leaving the relation unresolved; this
  *    rule then substitutes the STORED TEXT, re-parsed and re-resolved
  *    on every reference — views pin semantics at READ time, so a view
  *    over a governed table tracks the table's latest version (an
  *    `AS OF` in the view text pins explicitly), the Athena/Glue
  *    behavior the reference's consumers expect;
  *  - `SHOW VIEWS IN cat.ns` / `DROP VIEW cat.ns.v` → catalog calls.
  *
  * Unqualified relation names inside the stored text are qualified
  * with the view's CREATE-time catalog/namespace before resolution, so
  * a view reads the tables its author named regardless of the reading
  * session's defaults. A view whose text references itself (possible
  * via CREATE OR REPLACE) is refused at read time; longer reference
  * cycles exhaust the analyzer's fixed-point iteration budget and fail
  * analysis rather than hanging. `ALTER VIEW … AS` replaces a stored
  * definition in place (properties carried over) and `ALTER VIEW …
  * RENAME TO` moves the sidecar file within the catalog; `ALTER VIEW
  * … SET/UNSET TBLPROPERTIES` keeps its stock (session-catalog)
  * meaning — graft view properties change via CREATE OR REPLACE.
  */
case class GraftViewRule(session: SparkSession) extends Rule[LogicalPlan] {

  import GraftViewRules._

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperators {
      case u @ UnresolvedRelation(parts, _, false) =>
        lookupView(session, parts) match {
          case Some((catName, cat, ident)) => expand(session, catName, cat, ident)
          case None => u
        }
      case s: GraftCreateViewStatement if s.query.resolved =>
        lowerCreate(session, s)
      case s: GraftAlterViewAsStatement if s.query.resolved =>
        lowerAlterAs(session, s)
    }
}

/** Parse-time intermediate for `CREATE VIEW` on a graft catalog: the
  * parser swap-in ([[GraftViewRules.interceptParsed]]) must happen
  * BEFORE analysis — `ResolveSessionCatalog` throws
  * MISSING_CATALOG_ABILITY for view commands on any non-session
  * catalog, so a resolution rule would never see the stock
  * `CreateView` — but the view's output schema needs the ANALYZED
  * query, so this node keeps the query as its child for the fixed
  * point to resolve; [[GraftViewRule]] then lowers it onto the eager
  * [[GraftCreateViewCommand]].
  */
case class GraftCreateViewStatement(cat: GraftCatalog, ident: Identifier,
    userSpecifiedColumns: Seq[(String, Option[String])],
    comment: Option[String], properties: Map[String, String],
    originalText: Option[String], query: LogicalPlan,
    allowExisting: Boolean, replace: Boolean) extends UnaryCommand {
  override def child: LogicalPlan = query
  override protected def withNewChildInternal(
      newChild: LogicalPlan): GraftCreateViewStatement = copy(query = newChild)
}

/** Parse-time intermediate for `ALTER VIEW ... AS` — same child-query
  * analysis contract as [[GraftCreateViewStatement]]: the new text
  * replaces the definition (column list resets to the query's own,
  * the resolution context re-captures the CURRENT session defaults —
  * Spark's ALTER VIEW AS semantics), while user properties and the
  * comment carry over from the stored view.
  */
case class GraftAlterViewAsStatement(cat: GraftCatalog, ident: Identifier,
    originalText: String, query: LogicalPlan) extends UnaryCommand {
  override def child: LogicalPlan = query
  override protected def withNewChildInternal(
      newChild: LogicalPlan): GraftAlterViewAsStatement = copy(query = newChild)
}

object GraftViewRules {

  /** Parser-level rewrite of the three view commands when their target
    * resolves to a graft catalog (explicitly `cat.ns.v`, or relative
    * to a graft CURRENT catalog); everything else — session-catalog
    * views, temp views (which parse to CreateViewCommand and are never
    * seen here; a 1-part DROP VIEW naming a temp view is explicitly
    * left alone) — passes through to stock Spark untouched.
    */
  def interceptParsed(session: SparkSession, plan: LogicalPlan): LogicalPlan =
    plan match {
      case c: CreateView => c.child match {
        case UnresolvedIdentifier(parts, _) =>
          catalogAndIdent(session, parts) match {
            case Some((cat, ident)) =>
              GraftCreateViewStatement(cat, ident, c.userSpecifiedColumns,
                c.comment, c.properties, c.originalText, c.query,
                c.allowExisting, c.replace)
            case None => c
          }
        case _ => c
      }
      case d @ DropView(UnresolvedIdentifier(parts, _), ifExists) =>
        val isTemp = parts.size == 1 &&
          session.sessionState.catalog.isTempView(parts)
        if (isTemp) d
        else catalogAndIdent(session, parts) match {
          case Some((cat, ident)) =>
            GraftDropViewCommand(cat, ident, ifExists, d.output)
          case None => d
        }
      case s @ ShowViews(UnresolvedNamespace(parts, _), pattern, output) =>
        catalogAndNamespace(session, parts) match {
          case Some((cat, ns)) => GraftShowViewsCommand(cat, ns, pattern, output)
          case None => s
        }
      case s @ ShowViews(CurrentNamespace, pattern, output) =>
        session.sessionState.catalogManager.currentCatalog match {
          case g: GraftCatalog => GraftShowViewsCommand(g,
            session.sessionState.catalogManager.currentNamespace.toSeq,
            pattern, output)
          case _ => s
        }
      // ALTER VIEW ... AS: only when the target IS a stored graft view
      // (temp views keep Spark's semantics; a missing name falls
      // through to the stock not-found error)
      case a @ AlterViewAs(UnresolvedView(parts, _, _, _), text, query) =>
        val isTemp = parts.size == 1 &&
          session.sessionState.catalog.isTempView(parts)
        if (isTemp) a
        else catalogAndIdent(session, parts) match {
          case Some((cat, ident)) if cat.viewExists(ident) =>
            GraftAlterViewAsStatement(cat, ident, text, query)
          case _ => a
        }
      // ALTER VIEW ... RENAME TO: the new name resolves relative to
      // the SOURCE view — a bare name keeps the source namespace (SQL
      // RENAME semantics), a namespace-qualified name stays in the
      // source's catalog, and an explicit DIFFERENT catalog refuses
      // loudly; the reading session's current catalog/namespace play
      // no part
      case r @ RenameTable(UnresolvedTableOrView(parts, _, _), newName, true)
          if !(parts.size == 1 &&
            session.sessionState.catalog.isTempView(parts)) =>
        catalogAndIdent(session, parts) match {
          case Some((cat, ident)) if cat.viewExists(ident) =>
            val toParts = newName match {
              case ps if ps.size >= 2 && ps.head == cat.name() => ps.tail
              case ps if ps.size >= 2 &&
                  catalogNamed(session, ps.head).exists(_.name() != cat.name()) =>
                throw new UnsupportedOperationException(
                  s"RENAME VIEW ${parts.mkString(".")}: the new name " +
                    s"${newName.mkString(".")} must stay inside catalog " +
                    s"${cat.name()}")
              case ps => ps
            }
            val toIdent =
              if (toParts.size == 1)
                Identifier.of(ident.namespace(), toParts.head)
              else Identifier.of(toParts.init.toArray, toParts.last)
            GraftRenameViewCommand(cat, ident, toIdent)
          case _ => r
        }
      case other => other
    }

  /** A registered catalog plugin by name, None when unregistered. */
  private def catalogNamed(session: SparkSession, name: String)
      : Option[org.apache.spark.sql.connector.catalog.CatalogPlugin] =
    try Some(session.sessionState.catalogManager.catalog(name))
    catch { case _: Exception => None }

  /** Spark's catalog-and-identifier resolution, restricted to graft
    * catalogs: a leading catalog-name segment wins — and if that
    * segment names a registered NON-graft catalog the command is NOT
    * ours (it must pass through to stock Spark, never be re-homed
    * under a graft current catalog); otherwise the current catalog
    * (1-part names land in the current namespace).
    */
  private def catalogAndIdent(session: SparkSession,
      parts: Seq[String]): Option[(GraftCatalog, Identifier)] = {
    val mgr = session.sessionState.catalogManager
    val headCatalog =
      if (parts.size >= 2) catalogNamed(session, parts.head) else None
    headCatalog match {
      case Some(g: GraftCatalog) =>
        Some((g, Identifier.of(parts.tail.init.toArray, parts.last)))
      case Some(_) => None // explicit non-graft catalog: not ours
      case None => mgr.currentCatalog match {
        case g: GraftCatalog =>
          val ident = if (parts.size == 1)
            Identifier.of(mgr.currentNamespace, parts.head)
          else Identifier.of(parts.init.toArray, parts.last)
          Some((g, ident))
        case _ => None
      }
    }
  }

  private def catalogAndNamespace(session: SparkSession,
      parts: Seq[String]): Option[(GraftCatalog, Seq[String])] = {
    val mgr = session.sessionState.catalogManager
    val headCatalog =
      if (parts.isEmpty) None else catalogNamed(session, parts.head)
    headCatalog match {
      case Some(g: GraftCatalog) => Some((g, parts.tail))
      case Some(_) => None // explicit non-graft catalog: not ours
      case None => mgr.currentCatalog match {
        case g: GraftCatalog => Some((g, parts))
        case _ => None
      }
    }
  }

  /** (catalog name, catalog, view identifier) when `parts` names a
    * stored graft view — fully qualified (`cat.ns.v`) or relative to a
    * graft CURRENT catalog (including a bare 1-part name, provided no
    * temp view shadows it: temp views always win, Spark's precedence).
    * A leading registered non-graft catalog never matches. The
    * `viewExists` probe is one filesystem existence check per
    * unresolved relation per fixed-point iteration — the same cost
    * class as DSv2's own uncached per-iteration `loadTable` probe, and
    * not cacheable across statements without going stale against
    * other sessions' CREATE/DROP VIEW.
    */
  private[sql] def lookupView(session: SparkSession,
      parts: Seq[String]): Option[(String, GraftCatalog, Identifier)] = {
    val mgr = session.sessionState.catalogManager
    val headCatalog =
      if (parts.size >= 2) catalogNamed(session, parts.head) else None
    headCatalog match {
      case Some(g: GraftCatalog) =>
        val ident = Identifier.of(parts.tail.init.toArray, parts.last)
        if (g.viewExists(ident)) Some((parts.head, g, ident)) else None
      case Some(_) => None // explicit non-graft catalog: not ours
      case None => mgr.currentCatalog match {
        case g: GraftCatalog
            if !session.sessionState.catalog.isTempView(parts) =>
          val ident = if (parts.size == 1)
            Identifier.of(mgr.currentNamespace, parts.head)
          else Identifier.of(parts.init.toArray, parts.last)
          if (g.viewExists(ident)) Some((g.name(), g, ident)) else None
        case _ => None
      }
    }
  }

  /** The stored text, re-parsed with unqualified names bound to the
    * view's CREATE-time context, wrapped in the stored column aliases
    * and the view's own alias.
    */
  private[sql] def expand(session: SparkSession, catName: String,
      cat: GraftCatalog, ident: Identifier): LogicalPlan = {
    val v = cat.loadView(ident)
    val parsed = session.sessionState.sqlParser.parsePlan(v.query)
    // the Substitution batch already ran for the OUTER statement, so a
    // WITH clause inside the stored text must be substituted here —
    // and BEFORE qualification, so CTE names resolve as CTE refs
    // instead of being qualified into table lookups
    val substituted =
      org.apache.spark.sql.catalyst.analysis.CTESubstitution(parsed)
    val ctxCat = v.currentCatalog
    val ctxNs = v.currentNamespace.toSeq
    val mgr = session.sessionState.catalogManager
    def isCatalogName(n: String): Boolean =
      try { mgr.catalog(n); true } catch { case _: Exception => false }
    val qualified = substituted.transformWithSubqueries {
      case UnresolvedRelation(ps, opts, false)
          if ps.size == 1 || (ps.size == 2 && !isCatalogName(ps.head)) =>
        val full = if (ps.size == 1) ctxCat +: ctxNs :+ ps.head
          else ctxCat +: ps
        UnresolvedRelation(full, opts, isStreaming = false)
    }
    val self = (catName +: ident.namespace().toSeq :+ ident.name())
      .map(_.toLowerCase)
    qualified.foreach {
      case UnresolvedRelation(ps, _, _)
          if ps.map(_.toLowerCase) == self =>
        throw new UnsupportedOperationException(
          s"recursive graft view ${self.mkString(".")}: the stored text " +
            "references the view itself (CREATE OR REPLACE re-resolves " +
            "at read time, so self-reference can never terminate)")
      case _ => ()
    }
    val aliased =
      if (v.columnAliases() == null || v.columnAliases().isEmpty) qualified
      else Project(
        v.queryColumnNames().zip(v.columnAliases()).toIndexedSeq.map {
          case (q, a) => Alias(UnresolvedAttribute.quoted(q), a)()
        }, qualified)
    SubqueryAlias(
      AliasIdentifier(ident.name(), catName +: ident.namespace().toSeq),
      aliased)
  }

  private[sql] def lowerCreate(session: SparkSession,
      s: GraftCreateViewStatement): LogicalPlan = {
    val sql = s.originalText.getOrElse(throw new UnsupportedOperationException(
      "CREATE VIEW on a graft catalog requires the literal view text " +
        "(Dataset.createTempView-style plans have no SQL to persist)"))
    val querySchema = StructType(s.query.schema.fields)
    require(s.userSpecifiedColumns.isEmpty ||
      s.userSpecifiedColumns.size == querySchema.size,
      s"CREATE VIEW column list has ${s.userSpecifiedColumns.size} names " +
        s"but the query produces ${querySchema.size} columns")
    val mgr = session.sessionState.catalogManager
    val aliases = s.userSpecifiedColumns.map(_._1)
    val schema =
      if (aliases.isEmpty) querySchema
      else StructType(querySchema.fields.zip(aliases).map {
        case (f, a) => f.copy(name = a)
      })
    val props = s.properties ++
      s.comment.map(ViewCatalog.PROP_COMMENT -> _)
    val info = new ViewInfo(s.ident, sql,
      mgr.currentCatalog.name(), mgr.currentNamespace,
      schema, querySchema.fieldNames,
      aliases.toArray,
      s.userSpecifiedColumns.map(_._2.orNull).toArray,
      { val m = new java.util.HashMap[String, String]()
        props.foreach { case (k, vv) => m.put(k, vv) }
        m })
    GraftCreateViewCommand(s.cat, info, s.allowExisting, s.replace)
  }

  private[sql] def lowerAlterAs(session: SparkSession,
      s: GraftAlterViewAsStatement): LogicalPlan = {
    val mgr = session.sessionState.catalogManager
    val old = s.cat.loadView(s.ident)
    val schema = StructType(s.query.schema.fields)
    val info = new ViewInfo(s.ident, s.originalText,
      mgr.currentCatalog.name(), mgr.currentNamespace,
      schema, schema.fieldNames,
      Array.empty[String], Array.empty[String],
      old.properties())
    GraftAlterViewAsCommand(s.cat, info)
  }
}

/** Eager ALTER VIEW ... AS: replace-in-place, never create. */
case class GraftAlterViewAsCommand(cat: GraftCatalog, info: ViewInfo)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    cat.replaceView(info, orCreate = false)
    Nil
  }
}

/** Eager ALTER VIEW ... RENAME TO within one graft catalog. */
case class GraftRenameViewCommand(cat: GraftCatalog, from: Identifier,
    to: Identifier) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    cat.renameView(from, to)
    Nil
  }
}

/** Eager CREATE VIEW against the graft view catalog. */
case class GraftCreateViewCommand(cat: GraftCatalog, info: ViewInfo,
    allowExisting: Boolean, replace: Boolean) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    if (allowExisting && cat.viewExists(info.ident())) Nil
    else {
      if (replace) cat.replaceView(info, orCreate = true)
      else cat.createView(info)
      Nil
    }
  }
}

/** Eager DROP VIEW; honors IF EXISTS. */
case class GraftDropViewCommand(cat: GraftCatalog, ident: Identifier,
    ifExists: Boolean, override val output: Seq[Attribute])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val dropped = cat.dropView(ident)
    if (!dropped && !ifExists)
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(
        Identifier.of(cat.name() +: ident.namespace(), ident.name()))
    Nil
  }
}

/** SHOW VIEWS IN cat.ns — namespace, viewName, isTemporary rows, with
  * the stock `*`/`|` pattern filter.
  */
case class GraftShowViewsCommand(cat: GraftCatalog, namespace: Seq[String],
    pattern: Option[String], override val output: Seq[Attribute])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val names = cat.listViews(namespace: _*).map(_.name()).toSeq
    val kept = pattern match {
      case Some(p) =>
        org.apache.spark.sql.catalyst.util.StringUtils
          .filterPattern(names, p)
      case None => names
    }
    kept.sorted.map(n => Row(namespace.mkString("."), n, false))
  }
}

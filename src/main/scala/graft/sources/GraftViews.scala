package graft.sources

import org.apache.spark.sql.{GraftColumnBridge, Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedIdentifier, UnresolvedNamespace, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression}
import org.apache.spark.sql.catalyst.parser.{ParseException, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, ViewInfo}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.StructType

/** SQL views on the graft catalog.
  *
  * Spark 4.1 ships the [[org.apache.spark.sql.connector.catalog.ViewCatalog]]
  * SPI but NO built-in execution for it — the analyzer's
  * ResolveSessionCatalog rejects every view statement aimed at a
  * non-session catalog before any extension resolution rule can run
  * (`MISSING_CATALOG_ABILITY`), and nothing in the engine calls
  * `loadView`. Engines that ship V2 views (Iceberg) bring their own
  * rules; this is that wiring for graft, in two pieces:
  *
  *  - [[GraftViewParser]] — a delegating parser: view DDL
  *    (`CREATE/DROP VIEW`, `SHOW VIEWS`) whose multi-part target names
  *    a [[GraftCatalog]] is rewritten into runnable commands AT PARSE
  *    TIME, before the analyzer's session-catalog check can throw.
  *    Everything else passes through untouched.
  *  - [[GraftViewReadRule]] — a resolution rule: an
  *    [[UnresolvedRelation]] naming a stored graft view expands into
  *    its re-parsed SQL body (plus the stored column aliases), wrapped
  *    in a [[SubqueryAlias]]; the analyzer then resolves the body in
  *    the same pass, so views compose over tables and other views.
  *
  * Contract: view targets must be multi-part (`catalog.ns.view` or
  * `ns.view` under a graft current catalog) — single-part names stay
  * with Spark's temp-view machinery. View bodies re-parse in the
  * READER's session, so bodies should fully qualify the relations they
  * reference (the stored create-time catalog/namespace context is kept
  * for inspection, mirroring the ViewCatalog metadata contract).
  */
object GraftViews {

  /** Resolve a multi-part name to (graft catalog plugin, identifier) —
    * None when the name does not land in a GraftCatalog.
    */
  def target(session: SparkSession, parts: Seq[String])
      : Option[(GraftCatalog, Identifier)] = {
    if (parts.length < 2) return None
    val cm = session.sessionState.catalogManager
    val (cat, idParts) =
      if (cm.isCatalogRegistered(parts.head))
        (cm.catalog(parts.head), parts.tail)
      else (cm.currentCatalog, parts)
    cat match {
      case g: GraftCatalog if idParts.nonEmpty =>
        val ns =
          if (idParts.length == 1) cm.currentNamespace
          else idParts.init.toArray
        Some((g, Identifier.of(ns, idParts.last)))
      case _ => None
    }
  }
}

/** Delegating parser that rewrites graft-catalog view DDL into runnable
  * commands (see [[GraftViews]]).
  */
class GraftViewParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    rewrite(delegate.parsePlan(sqlText))

  // parameterized SQL (spark.sql(text, args)) routes through this
  // entry point — it MUST delegate (the interface default re-parses
  // without binding the parameters and every `:name` comes back
  // unbound); view DDL is never parameterized, but rewrite anyway for
  // uniformity
  override def parsePlanWithParameters(sqlText: String,
      ctx: org.apache.spark.sql.catalyst.parser.ParameterContext)
      : LogicalPlan =
    rewrite(delegate.parsePlanWithParameters(sqlText, ctx))

  private def rewrite(plan: LogicalPlan): LogicalPlan = plan match {
    case c @ CreateView(UnresolvedIdentifier(parts, _), userCols, comment,
        _, properties, originalText, _, allowExisting, replace, _) =>
      GraftViews.target(session, parts) match {
        case Some((_, ident)) =>
          val text = originalText.getOrElse(
            throw new IllegalArgumentException(
              "CREATE VIEW needs the original query text"))
          GraftCreateViewCommand(parts, ident.namespace, ident.name,
            userCols, comment, properties, text, allowExisting, replace)
        case None => c
      }
    case d @ DropView(UnresolvedIdentifier(parts, _), ifExists) =>
      GraftViews.target(session, parts) match {
        case Some(_) => GraftDropViewCommand(parts, ifExists)
        case None => d
      }
    case r @ RenameTable(u: org.apache.spark.sql.catalyst.analysis
        .UnresolvedTableOrView, newName, true) =>
      GraftViews.target(session, u.multipartIdentifier) match {
        case Some(_) => GraftRenameViewCommand(u.multipartIdentifier, newName)
        case None => r
      }
    case s @ ShowViews(UnresolvedNamespace(parts, _), pattern, output)
        if parts.nonEmpty =>
      // SHOW VIEWS IN catalog.ns — ours iff the head names a graft
      // catalog (a bare `SHOW VIEWS` stays with the session catalog)
      val cm = session.sessionState.catalogManager
      val isGraft = cm.isCatalogRegistered(parts.head) &&
        cm.catalog(parts.head).isInstanceOf[GraftCatalog]
      if (isGraft) GraftShowViewsCommand(parts.head, parts.tail, pattern,
        output)
      else s
    case other => other
  }

  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String)
      : org.apache.spark.sql.types.DataType = delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

/** Expand reads of stored graft views (see [[GraftViews]]). */
class GraftViewReadRule(session: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperators {
      case u: UnresolvedRelation =>
        GraftViews.target(session, u.multipartIdentifier) match {
          case Some((cat, ident)) if
              scala.util.Try(cat.viewExists(ident)).getOrElse(false) =>
            val v = cat.loadView(ident)
            val body = session.sessionState.sqlParser.parsePlan(v.query)
            val aliased =
              if (v.columnAliases.isEmpty) body
              else Project(v.columnAliases.zip(v.queryColumnNames).map {
                case (a, q) =>
                  Alias(UnresolvedAttribute.quoted(q), a)()
              }.toIndexedSeq, body)
            SubqueryAlias(ident.name, aliased)
          case _ => u
        }
    }
}

case class GraftCreateViewCommand(rawParts: Seq[String],
    ns: Array[String], viewName: String,
    userCols: Seq[(String, Option[String])], comment: Option[String],
    properties: Map[String, String], originalText: String,
    allowExisting: Boolean, replace: Boolean) extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val (cat, ident) = GraftViews.target(spark, rawParts).getOrElse(
      throw new IllegalStateException(s"not a graft view target: " +
        rawParts.mkString(".")))
    if (cat.viewExists(ident) && allowExisting) return Nil
    // schema capture: analyze the body once at CREATE — the
    // ViewCatalog metadata contract (queryColumnNames + aliases)
    val parsed = spark.sessionState.sqlParser.parsePlan(originalText)
    val analyzed = GraftColumnBridge.ofRows(spark, parsed)
    val qSchema = analyzed.schema
    require(userCols.isEmpty || userCols.length == qSchema.length,
      s"view column list has ${userCols.length} names for " +
        s"${qSchema.length} query columns")
    val schema =
      if (userCols.isEmpty) qSchema
      else StructType(qSchema.fields.zip(userCols).map {
        case (f, (a, c)) =>
          val renamed = f.copy(name = a)
          c.map(renamed.withComment).getOrElse(renamed)
      })
    val cm = spark.sessionState.catalogManager
    import scala.jdk.CollectionConverters._
    val info = new ViewInfo(ident, originalText, cm.currentCatalog.name,
      cm.currentNamespace, schema, qSchema.fieldNames,
      userCols.map(_._1).toArray, userCols.map(_._2.orNull).toArray,
      (properties ++ comment.map("comment" -> _)).asJava)
    if (replace && cat.viewExists(ident)) cat.dropView(ident)
    cat.createView(info)
    Nil
  }
}

case class GraftDropViewCommand(rawParts: Seq[String],
    ifExists: Boolean) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val (cat, ident) = GraftViews.target(spark, rawParts).getOrElse(
      throw new IllegalStateException(s"not a graft view target: " +
        rawParts.mkString(".")))
    val dropped = cat.dropView(ident)
    if (!dropped && !ifExists)
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchViewException(ident)
    Nil
  }
}

case class GraftRenameViewCommand(rawParts: Seq[String],
    newName: Seq[String]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val (cat, ident) = GraftViews.target(spark, rawParts).getOrElse(
      throw new IllegalStateException(s"not a graft view target: " +
        rawParts.mkString(".")))
    // RENAME TO takes an identifier in the SAME catalog; accept a bare
    // name (stays in the source namespace), ns.view, or catalog.ns.view
    val stripped =
      if (newName.length >= 3 && spark.sessionState.catalogManager
        .isCatalogRegistered(newName.head)) newName.tail
      else newName
    val to = stripped match {
      case Seq(n) => Identifier.of(ident.namespace, n)
      case parts => Identifier.of(parts.init.toArray, parts.last)
    }
    cat.renameView(ident, to)
    Nil
  }
}

case class GraftShowViewsCommand(catalogName: String, ns: Seq[String],
    pattern: Option[String], override val output: Seq[Attribute])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val cat = spark.sessionState.catalogManager.catalog(catalogName)
      .asInstanceOf[GraftCatalog]
    val views = cat.listViews(ns: _*).map(_.name).sorted.toSeq
    val kept = pattern match {
      case Some(p) => org.apache.spark.sql.catalyst.util.StringUtils
        .filterPattern(views, p)
      case None => views
    }
    kept.map(n => Row(ns.mkString("."), n, false))
  }
}

package graft.sources

import graft.storage.Lakehouse
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** SQL row-level DML on catalog tables — `UPDATE`, `MERGE INTO`, and
  * arbitrary-predicate `DELETE` — via an analyzer extension
  * (injected by [[graft.functions.GraftExtensions]]).
  *
  * Spark's built-in paths cover only part of the DML surface for a V2
  * table: `DELETE FROM` works when every predicate translates to a
  * pushed [[org.apache.spark.sql.sources.Filter]] (the `SupportsDelete`
  * contract), and `UPDATE`/`MERGE` require the full
  * `SupportsRowLevelOperations` write machinery. This rule takes the
  * road Delta Lake shipped on for years (DeltaAnalysis → RunnableCommand):
  * a post-hoc resolution rule matches the RESOLVED logical command over a
  * [[GraftTable]] and replaces it with a command that re-expresses the
  * operation through the lakehouse's own copy-on-write protocol —
  * [[Lakehouse.update]] / [[Lakehouse.overwritePartitioned]] with an
  * exact read basis, so every SQL DML statement inherits the SAME
  * crash-safety and conflict-detection contract as the Scala API
  * (appends racing a SQL UPDATE are rebased above it; two racing
  * rewrites fail loudly).
  *
  * Expressions captured from the analyzed statement are DETACHED —
  * attribute references become name-addressed unresolved attributes
  * (qualified `__t`/`__s` for MERGE's two sides) — and re-resolve
  * against the command's own snapshot read at execution time. That
  * re-resolution is what lets the command read the table through the
  * basis-tracked [[Lakehouse.readWithBasis]] instead of the statement's
  * planned scan: the snapshot and the conflict basis come from ONE
  * listing, the concurrency contract's requirement.
  *
  * Scope contract (all rejected loudly, never silently mis-executed):
  * subquery predicates, nested-field assignments, and time-travel
  * targets. CDF recording follows the table's `graft.cdf` property,
  * same as SQL DELETE.
  */
class GraftDmlRule(session: SparkSession) extends Rule[LogicalPlan] {

  import GraftDml._

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperators {
      case u @ UpdateTable(table, assignments, condition)
          if u.resolved && graftTable(table).isDefined =>
        val (rel, tbl) = graftTable(table).get
        checkWritable(tbl, "UPDATE")
        checkNoSubquery(condition.toSeq ++ assignments, "UPDATE")
        // detached names re-resolve against the PHYSICAL snapshot read
        // — renamed columns translate here, once (see RenamedColumnsProp)
        val l2p = GraftCatalog.invertRenames(tbl.renamedCols)
        val detach = detacher(Map(rel.outputSet -> (Nil, l2p)))
        GraftUpdateCommand(tbl.tableDir, tbl.contractSchema,
          condition.map(detach).getOrElse(lit(true)),
          assignments.map(a =>
            physName(l2p, topLevelName(a.key, "UPDATE SET")) ->
              detach(a.value)),
          tbl.cdfEnabled, tbl.rewriteSpecs, mor = tbl.morDeletes)

      case d @ DeleteFromTable(table, condition)
          if d.resolved && graftTable(table).isDefined &&
            !translatesToFilters(table, condition) &&
            !hasSubquery(Seq(condition)) =>
        // arbitrary row-level predicates (expressions the pushed-Filter
        // bridge can't carry — functions, arithmetic, CASE …); the
        // simple-predicate path stays on SupportsDelete.deleteWhere
        val (rel, tbl) = graftTable(table).get
        checkWritable(tbl, "DELETE")
        val detach = detacher(Map(
          rel.outputSet -> (Nil, GraftCatalog.invertRenames(tbl.renamedCols))))
        GraftDeleteCommand(tbl.tableDir, tbl.contractSchema,
          detach(condition), tbl.cdfEnabled, tbl.rewriteSpecs,
          mor = tbl.morDeletes)

      case m @ MergeIntoTable(target, source, mergeCond, matched,
          notMatched, notMatchedBySource, withSchemaEvolution)
          if m.resolved && graftTable(target).isDefined =>
        val (rel, tbl) = graftTable(target).get
        checkWritable(tbl, "MERGE INTO")
        require(!withSchemaEvolution, "MERGE … WITH SCHEMA EVOLUTION is " +
          "not supported — ALTER TABLE ADD COLUMN first")
        val exprs = mergeCond +: (matched ++ notMatched ++
          notMatchedBySource).flatMap(actionExprs)
        checkNoSubquery(exprs, "MERGE INTO")
        val l2p = GraftCatalog.invertRenames(tbl.renamedCols)
        val detach = detacher(Map(
          rel.outputSet -> (Seq(TargetAlias), l2p),
          source.outputSet -> (Seq(SourceAlias), Map.empty)))
        GraftMergeCommand(tbl.tableDir, tbl.contractSchema, source,
          detach(mergeCond),
          (matched ++ notMatchedBySource).map(toAct(_, detach, l2p))
            .toIndexedSeq,
          matched.length,
          notMatched.map(toAct(_, detach, l2p)).toIndexedSeq,
          tbl.cdfEnabled, tbl.rewriteSpecs, mor = tbl.morDeletes)
    }

  /** The GraftTable under the statement's target (aliases stripped). */
  private def graftTable(plan: LogicalPlan)
      : Option[(DataSourceV2Relation, GraftTable)] = plan match {
    case SubqueryAlias(_, child) => graftTable(child)
    case r: DataSourceV2Relation => r.table match {
      case t: GraftTable => Some((r, t))
      case _ => None
    }
    case _ => None
  }

  private def checkWritable(tbl: GraftTable, op: String): Unit =
    require(tbl.pinnedAsOf.isEmpty && tbl.pinnedBranch.isEmpty,
      s"$op on a VERSION/TIMESTAMP AS OF snapshot or branch audit " +
        "view is not allowed")

  private def actionExprs(a: MergeAction): Seq[Expression] = a match {
    case UpdateAction(cond, assigns, _) => cond.toSeq ++ assigns
    case DeleteAction(cond) => cond.toSeq
    case InsertAction(cond, assigns) => cond.toSeq ++ assigns
    case other => throw new UnsupportedOperationException(
      s"MERGE action ${other.getClass.getSimpleName}")
  }

  private def toAct(a: MergeAction, detach: Expression => Column,
      l2p: Map[String, String]): GraftDml.Act = a match {
    case UpdateAction(cond, assigns, _) =>
      GraftDml.UpdateAct(cond.map(detach), assigns.map(as =>
        physName(l2p, topLevelName(as.key, "MERGE UPDATE SET")) ->
          detach(as.value)))
    case DeleteAction(cond) => GraftDml.DeleteAct(cond.map(detach))
    case InsertAction(cond, assigns) =>
      GraftDml.InsertAct(cond.map(detach), assigns.map(as =>
        physName(l2p, topLevelName(as.key, "MERGE INSERT")) ->
          detach(as.value)))
    case other => throw new UnsupportedOperationException(
      s"MERGE action ${other.getClass.getSimpleName}")
  }

  /** A renamed column's assignment key / reference, translated to the
    * physical name the command's snapshot read carries.
    */
  private def physName(l2p: Map[String, String], n: String): String =
    LakehouseBatch.ciLookup(l2p, n).getOrElse(n)

  private def topLevelName(key: Expression, ctx: String): String = key match {
    case a: Attribute => a.name
    case other => throw new UnsupportedOperationException(
      s"$ctx supports top-level columns only (got $other)")
  }

  /** Expression → Column with attribute references re-addressed by name
    * (optionally qualified), so they re-resolve against the command's
    * own snapshot read.
    */
  private def detacher(
      sides: Map[AttributeSet, (Seq[String], Map[String, String])])
      : Expression => Column = { e =>
    GraftColumnBridge.toColumn(e.transform {
      case a: AttributeReference =>
        sides.collectFirst {
          case (set, (qual, ren)) if set.contains(a) =>
            UnresolvedAttribute(qual :+
              LakehouseBatch.ciLookup(ren, a.name).getOrElse(a.name))
        }.getOrElse(throw new IllegalStateException(
          s"reference $a escapes the statement's relations"))
    })
  }

  private def hasSubquery(exprs: Seq[Expression]): Boolean =
    exprs.exists(_.exists(_.isInstanceOf[SubqueryExpression]))

  private def checkNoSubquery(exprs: Seq[Expression], op: String): Unit =
    require(!hasSubquery(exprs),
      s"graft $op does not support subquery predicates — materialize " +
        "the subquery into a source table and MERGE on it")

  /** Would Spark's own SupportsDelete path take this DELETE? Mirrors the
    * pushed-Filter translation: every conjunct must map to a V1 Filter
    * that [[GraftTable.toColumn]] accepts.
    */
  private def translatesToFilters(table: LogicalPlan,
      condition: Expression): Boolean = {
    import org.apache.spark.sql.catalyst.expressions._
    // the shape DataSourceStrategy.translateFilter accepts AND
    // GraftTable.toColumn carries: boolean combinations of
    // attribute-vs-literal comparisons (+ IN / IS NULL / LIKE-prefixes)
    def lit(e: Expression): Boolean = e match {
      case Literal(_, _) => true
      case _ => false
    }
    def attr(e: Expression): Boolean = e.isInstanceOf[Attribute]
    def ok(e: Expression): Boolean = e match {
      case And(l, r) => ok(l) && ok(r)
      case Or(l, r) => ok(l) && ok(r)
      case Not(x) => ok(x)
      case b: BinaryComparison =>
        (attr(b.left) && lit(b.right)) || (lit(b.left) && attr(b.right))
      case In(a, vs) => attr(a) && vs.forall(lit)
      case InSet(a, _) => attr(a)
      case IsNull(a) => attr(a)
      case IsNotNull(a) => attr(a)
      case StartsWith(a, v) => attr(a) && lit(v)
      case EndsWith(a, v) => attr(a) && lit(v)
      case Contains(a, v) => attr(a) && lit(v)
      case Literal(_, org.apache.spark.sql.types.BooleanType) => true
      case _ => false
    }
    ok(condition)
  }
}

private[sources] object GraftDml {

  /** Zone-map stat names of a rendered partition-spec list: identity
    * columns by name, bucket specs as the derived `_gbk<n>_<col>`
    * column — the same mapping the INSERT path records, so the scan's
    * storage-partitioned-join key proof survives a MERGE.
    */
  def statNamesOf(renders: Seq[String]): Seq[String] =
    PartSpec.statNames(renders.map(PartSpec.parse))
  val TargetAlias = "__t"
  val SourceAlias = "__s"

  sealed trait Act
  final case class UpdateAct(cond: Option[Column],
      assigns: Seq[(String, Column)]) extends Act
  final case class DeleteAct(cond: Option[Column]) extends Act
  final case class InsertAct(cond: Option[Column],
      assigns: Seq[(String, Column)]) extends Act

  def lakeOf(spark: SparkSession, tableDir: String): (Lakehouse, String) = {
    val dir = new Path(tableDir)
    // reader-vs-GC grace (`spark.graft.gcGraceMs`): a CoW DML's FULL
    // commit GCs what it shadows — with zero grace a CONCURRENT
    // statement that resolved its snapshot first reads deleted files
    // (StressRace ddl exposed it); the conf is the SQL surface's
    // equivalent of the Lakehouse constructor parameter
    (new Lakehouse(spark, dir.getParent.toString,
      gcGraceMs = GraftCatalog.gcGraceMs(spark)), dir.getName)
  }

  /** The table's enforced CHECK + NOT NULL constraints as ONE
    * assert-backed filter over the PHYSICAL post-image space — read
    * from the CURRENT on-disk props/schema at EXECUTION time, never
    * baked from the analysis-time table handle: a constraint added (or
    * dropped) between a DML statement's analysis and its run must be
    * enforced (or not) as of the COMMIT, or a stale handle lands
    * violating rows after ADD CONSTRAINT's validation scan — the write
    * race Delta closes with commit-time metadata conflict checks.
    *
    * Returns (guard, preMarkerHook): the guard keeps every satisfying
    * row (NULL passes, SQL-standard CHECK) and throws naming the
    * constraint on the first violation; the hook re-reads the same
    * metadata immediately before the commit marker and aborts with
    * ConcurrentModificationException if it drifted while the statement
    * executed — the DML side of the two-sided closure (ADD CONSTRAINT
    * re-validates commits that land during its own scan→persist
    * window).
    */
  def runtimeCheckGuard(spark: SparkSession, tableDir: String)
      : (Option[Column], () => Unit) = {
    val dir = new Path(tableDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def readState(): (Seq[(String, String)], Map[String, String],
        Seq[String]) = {
      val props =
        try GraftCatalog.readProps(fs,
          new Path(dir, GraftCatalog.PropsFile))
        catch { case _: java.io.FileNotFoundException =>
          Map.empty[String, String] }
      val checks = props.toSeq
        .filter(_._1.startsWith(GraftCatalog.CheckPropPrefix))
        .sortBy(_._1)
        .map { case (k, sql) =>
          (k.stripPrefix(GraftCatalog.CheckPropPrefix), sql) }
      val renames = GraftCatalog.parseRenames(props)
      val required =
        try GraftCatalog.readSchema(fs,
          new Path(dir, GraftCatalog.SchemaFile))
          .fields.toSeq.filterNot(_.nullable).map(_.name)
        catch { case _: java.io.FileNotFoundException => Nil }
      (checks, renames, required)
    }
    val state = readState()
    val (checks, renames, required) = state
    val l2p = GraftCatalog.invertRenames(renames)
    val guards = checks.map { case (n, sql) =>
      // predicate names are LOGICAL (the user's contract); the
      // post-image frames are PHYSICAL — translate here, once
      val parsed = spark.sessionState.sqlParser.parseExpression(sql)
        .transform {
          case a: UnresolvedAttribute if a.nameParts.length == 1 =>
            UnresolvedAttribute(Seq(LakehouseBatch
              .ciLookup(l2p, a.nameParts.head)
              .getOrElse(a.nameParts.head)))
        }
      assert_true(
        coalesce(GraftColumnBridge.toColumn(parsed).cast("boolean"),
          lit(true)),
        lit(s"CHECK constraint $n violated: ($sql)")).isNull
    } ++
      // NOT NULL columns: the insert paths get AssertNotNull from
      // Spark's own resolution; the DML post-images enforce here —
      // an UPDATE SET c = NULL or a MERGE INSERT omitting a required
      // column must abort, not land corruption
      required.map { f =>
        assert_true(col(f).isNotNull,
          lit(s"NOT NULL constraint violated: column " +
            s"${LakehouseBatch.ciLookup(renames, f).getOrElse(f)} " +
            "is required")).isNull
      }
    val hook = () => {
      if (readState() != state)
        throw new java.util.ConcurrentModificationException(
          s"constraints of $tableDir changed while a DML statement " +
            "executed (concurrent ADD/DROP CONSTRAINT or schema " +
            "change) — re-run the statement")
    }
    (guards.reduceOption(_ && _), hook)
  }
}

/** `UPDATE t SET … WHERE …` → [[Lakehouse.update]] (copy-on-write FULL
  * commit, basis-tracked), or under `graft.deleteMode=mor` the
  * merge-on-read [[Lakehouse.updateRowsMoR]] — one atomic delta whose
  * DV masks the pre-images and whose data files are the post-images
  * (matched-rows cost, never a table rewrite).
  */
case class GraftUpdateCommand(tableDir: String, contract: StructType,
    condition: Column, assignments: Seq[(String, Column)],
    cdf: Boolean, partCols: Seq[String] = Nil, mor: Boolean = false)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val (lake, t) = GraftDml.lakeOf(spark, tableDir)
    // CHECK/NOT NULL enforcement from the CURRENT on-disk metadata,
    // re-verified pre-marker (see GraftDml.runtimeCheckGuard)
    val (rowCheck, guardHook) =
      GraftDml.runtimeCheckGuard(spark, tableDir)
    if (mor) {
      // the batch changeFeed DOES type a mixed commit (delete
      // pre-images + insert post-images), but the recorded-CDF
      // contract (update_preimage/postimage rows under _GRAFT_CDF)
      // is the copy-on-write path's — mirror MoR DELETE's refusal
      require(!cdf, "graft.deleteMode=mor cannot record a change feed " +
        "— use copy-on-write updates on CDF tables")
      lake.updateRowsMoR(t, contract, condition, assignments,
        beforeCommit = guardHook, clusterCols = partCols,
        rowCheck = rowCheck)
    } else
      lake.update(t, contract, condition, assignments, cdf,
        beforeCommit = guardHook, clusterCols = partCols,
        rowCheck = rowCheck)
    Nil
  }
}

/** `DELETE FROM t WHERE <arbitrary row-level predicate>` →
  * [[Lakehouse.delete]] (the same call `SupportsDelete.deleteWhere`
  * makes — this command just carries predicates the pushed-Filter
  * bridge can't).
  */
case class GraftDeleteCommand(tableDir: String, contract: StructType,
    condition: Column, cdf: Boolean, partCols: Seq[String] = Nil,
    mor: Boolean = false)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val (lake, t) = GraftDml.lakeOf(spark, tableDir)
    // graft.deleteMode=mor: a deletion-vector delta instead of the
    // copy-on-write rewrite (same routing as deleteWhere; the CDF
    // refusal mirrors it)
    if (mor) {
      require(!cdf, "graft.deleteMode=mor cannot record a change feed " +
        "— use copy-on-write deletes on CDF tables")
      lake.deleteRowsMoR(t, contract, condition)
    } else
      lake.delete(t, contract, condition, cdf, clusterCols = partCols)
    Nil
  }
}

/** Full SQL `MERGE INTO` semantics as ONE copy-on-write commit:
  * arbitrary join condition, ordered `WHEN MATCHED [AND …] THEN
  * UPDATE/DELETE`, `WHEN NOT MATCHED [AND …] THEN INSERT`, and `WHEN NOT
  * MATCHED BY SOURCE THEN UPDATE/DELETE` clauses — the first applicable
  * clause wins, rows no clause touches pass through, exactly the SQL
  * standard's rule.
  *
  * Scale shape: ONE full-outer join of the basis-tracked target snapshot
  * against the source (AQE broadcasts a CDC-sized source), a
  * WHEN-chained projection (codegen'd — no per-action passes), plus one
  * aggregate over the matched subset for the multi-match guard
  * (Delta's `multipleSourceRowMatchingTargetRow` error) and the rewrite
  * commit. The `notMatchedBySource` branch costs nothing extra — it is
  * the same joined frame's target-only rows.
  */
case class GraftMergeCommand(tableDir: String, contract: StructType,
    source: LogicalPlan, mergeCond: Column,
    targetActs: IndexedSeq[GraftDml.Act], numMatchedActs: Int,
    insertActs: IndexedSeq[GraftDml.Act], cdf: Boolean,
    partCols: Seq[String] = Nil, mor: Boolean = false)
    extends LeafRunnableCommand {

  import GraftDml._

  // the captured source plan must survive into run(); it is NOT a child
  // (children would re-plan it as part of this command's query plan)
  override def innerChildren: Seq[LogicalPlan] = Seq(source)

  override def run(spark: SparkSession): Seq[Row] = {
    val (lake, t) = GraftDml.lakeOf(spark, tableDir)
    // CHECK/NOT NULL enforcement from the CURRENT on-disk metadata,
    // re-verified pre-marker (see GraftDml.runtimeCheckGuard)
    val (rowCheck, guardHook) =
      GraftDml.runtimeCheckGuard(spark, tableDir)
    val (matchedActs, nmbsActs) = targetActs.splitAt(numMatchedActs)

    // graft.deleteMode=mor: the target side reads MASKED rows with
    // physical identity, and the statement commits ONE merge-on-read
    // delta (changed rows' positions → DV; update post-images +
    // inserts → data files) instead of rewriting the table —
    // pass-through rows never move. The basis of the masked read rides
    // into commitMoRDelta so a FULL rewrite racing the merge is
    // detected (a positional DV against replaced files would mask
    // nothing) instead of silently voiding the delta.
    if (mor) require(!cdf, "graft.deleteMode=mor cannot record a " +
      "change feed — use copy-on-write MERGE on CDF tables")
    // MoR: resolve the masked-read context ONCE — the merge's matched
    // scan and commitMoRDelta's post-mask extremes pass share the same
    // snapshot without a second listing walk
    val morCtx = if (mor) Some(lake.maskedCtx(t)) else None
    val (tgt0, basis) = morCtx match {
      case Some(c) => (lake.readMaskedWithPosOn(c, contract), c.basis)
      case None => lake.readWithBasis(t, contract)
    }
    val srcDf = GraftColumnBridge.ofRows(spark, source)
    val rid = "__graft_t_rid"
    val mark = "__graft_s_mark"
    require(!srcDf.columns.contains(mark) && !tgt0.columns.contains(rid),
      s"reserved column name collision: $rid/$mark")
    val tgt = tgt0.withColumn(rid, monotonically_increasing_id())
      .alias(TargetAlias)
    val src = srcDf.withColumn(mark, lit(true)).alias(SourceAlias)

    val j = (targetActs.nonEmpty, insertActs.nonEmpty) match {
      // an INSERT-only merge needs no target-only rows from the join
      // side and vice versa — join type narrows accordingly so the
      // common upsert doesn't pay a full-outer shuffle of both sides
      case (true, true) => tgt.join(src, mergeCond, "full_outer")
      case (true, false) => tgt.join(src, mergeCond, "left_outer")
      case (false, true) => tgt.join(src, mergeCond, "right_outer")
      case (false, false) => return Nil // no actions: a no-op statement
    }
    val targetExists = col(rid).isNotNull
    val sourceExists = col(mark).isNotNull
    val matchedPred = targetExists && sourceExists

    // SQL contract: a target row matched by >1 source row has no
    // deterministic action order — refuse (one aggregate, matched only)
    if (matchedActs.nonEmpty) {
      val dup = j.filter(matchedPred).groupBy(col(rid)).count()
        .filter(col("count") > 1).limit(1).count()
      require(dup == 0L, "MERGE: a target row matches multiple source " +
        "rows — deduplicate the source on the merge keys")
    }

    def condOf(c: Option[Column]): Column =
      coalesce(c.getOrElse(lit(true)).cast("boolean"), lit(false))

    // first-applicable-action fold (right fold: earlier clauses win)
    def chainValue(acts: Seq[Act], f: org.apache.spark.sql.types.StructField,
        default: Column): Column =
      acts.foldRight(default) {
        case (UpdateAct(c, assigns), rest) =>
          val v = assigns.collectFirst {
            case (n, col) if n.equalsIgnoreCase(f.name) => col }
            .map(_.cast(f.dataType)).getOrElse(default)
          when(condOf(c), v).otherwise(rest)
        case (DeleteAct(c), rest) =>
          when(condOf(c), default).otherwise(rest) // value unused: !keep
        case (InsertAct(c, assigns), rest) =>
          val v = assigns.collectFirst {
            case (n, col) if n.equalsIgnoreCase(f.name) => col }
            .map(_.cast(f.dataType))
            .getOrElse(lit(null).cast(f.dataType))
          when(condOf(c), v).otherwise(rest)
      }
    def chainFlag(acts: Seq[Act], pick: Act => Option[Column],
        default: Column): Column =
      acts.foldRight(default) { (a, rest) =>
        val c = a match {
          case UpdateAct(cc, _) => cc
          case DeleteAct(cc) => cc
          case InsertAct(cc, _) => cc
        }
        when(condOf(c), pick(a).getOrElse(lit(false))).otherwise(rest)
      }
    def keepOf(a: Act) = a match {
      case _: DeleteAct => Some(lit(false))
      case _ => Some(lit(true))
    }
    def updatedOf(a: Act) = a match {
      case _: UpdateAct => Some(lit(true))
      case _ => Some(lit(false))
    }
    def deletedOf(a: Act) = a match {
      case _: DeleteAct => Some(lit(true))
      case _ => Some(lit(false))
    }

    val keep = "__graft_keep"
    val upd = "__graft_upd"
    val del = "__graft_del"

    val tRows = j.filter(targetExists)
    val tCols = contract.fields.toIndexedSeq.map { f =>
      val default = col(s"$TargetAlias.${f.name}")
      when(matchedPred, chainValue(matchedActs, f, default))
        .otherwise(chainValue(nmbsActs, f, default)).as(f.name)
    }
    val tFlags = Seq(
      when(matchedPred, chainFlag(matchedActs, keepOf, lit(true)))
        .otherwise(chainFlag(nmbsActs, keepOf, lit(true))).as(keep),
      when(matchedPred, chainFlag(matchedActs, updatedOf, lit(false)))
        .otherwise(chainFlag(nmbsActs, updatedOf, lit(false))).as(upd),
      when(matchedPred, chainFlag(matchedActs, deletedOf, lit(false)))
        .otherwise(chainFlag(nmbsActs, deletedOf, lit(false))).as(del))
    val tOut = tRows.select(tCols ++ tFlags: _*)

    val sRows = j.filter(!targetExists)
    val sCols = contract.fields.toIndexedSeq.map(f =>
      chainValue(insertActs, f, lit(null).cast(f.dataType)).as(f.name))
    val sOut = sRows.select(sCols :+
      chainFlag(insertActs, keepOf, lit(false)).as(keep): _*)

    val outCols = contract.fieldNames.toIndexedSeq.map(col)
    // enforced CHECK constraints: the assert-backed guard validates the
    // post-state single-pass inside the frame the write was already
    // computing (see GraftDmlRule.checkGuard)
    def checked(df: org.apache.spark.sql.DataFrame) =
      rowCheck.foldLeft(df)((d, g) => d.filter(g))
    val result = checked(tOut.filter(col(keep)).select(outCols: _*)
      .unionByName(sOut.filter(col(keep)).select(outCols: _*)))

    val changes =
      if (!cdf) None
      else {
        val pre = tRows.filter(
          when(matchedPred, chainFlag(matchedActs, updatedOf, lit(false)))
            .otherwise(chainFlag(nmbsActs, updatedOf, lit(false))))
          .select(contract.fieldNames.toIndexedSeq
            .map(n => col(s"$TargetAlias.$n").as(n)): _*)
          .withColumn("_change_type", lit("update_preimage"))
        val post = tOut.filter(col(upd)).select(outCols: _*)
          .withColumn("_change_type", lit("update_postimage"))
        val dels = tRows.filter(
          when(matchedPred, chainFlag(matchedActs, deletedOf, lit(false)))
            .otherwise(chainFlag(nmbsActs, deletedOf, lit(false))))
          .select(contract.fieldNames.toIndexedSeq
            .map(n => col(s"$TargetAlias.$n").as(n)): _*)
          .withColumn("_change_type", lit("delete"))
        val ins = sOut.filter(col(keep)).select(outCols: _*)
          .withColumn("_change_type", lit("insert"))
        Some(pre.unionByName(post).unionByName(dels).unionByName(ins))
      }

    if (mor) {
      // changed rows (update or delete fired) are masked by position;
      // only post-images and inserts are written — matched-rows cost
      def changedOf(a: Act) = a match {
        case _: InsertAct => Some(lit(false))
        case _ => Some(lit(true)) // update or delete: the row moves
      }
      val masks = tRows.filter(
        when(matchedPred, chainFlag(matchedActs, changedOf, lit(false)))
          .otherwise(chainFlag(nmbsActs, changedOf, lit(false))))
        .select(
          col(s"$TargetAlias.${graft.storage.Lakehouse.FileCol}")
            .as("file"),
          col(s"$TargetAlias.${graft.storage.Lakehouse.PosCol}")
            .as("pos"))
      val newRows = checked(tOut.filter(col(upd)).select(outCols: _*)
        .unionByName(sOut.filter(col(keep)).select(outCols: _*)))
      val (clusteredNew, stats) =
        if (partCols.isEmpty) (newRows, Nil)
        else (graft.storage.Clustering.bySpecs(spark, newRows,
          partCols.map(PartSpec.parse)),
          GraftDml.statNamesOf(partCols))
      // extremesSchema: the MoR MERGE also records post-mask extremes
      // (round-9 limit closed) — MIN/MAX pushdown survives a merge now
      lake.commitMoRDelta(t, masks, Some(clusteredNew), statsCols = stats,
        beforeCommit = guardHook, basis = basis,
        extremesSchema = Some(contract), morCtx = morCtx)
      return Nil
    }

    // a PARTITIONED BY table's rewrite re-establishes the exact
    // one-file-per-key clustering and zone maps the INSERT path
    // maintains — a merge must not silently degrade q76-style partition
    // pruning or the q81 key-grouped report (UPDATE/DELETE rewrites go
    // through Lakehouse.update/delete, whose snapshots a standing
    // `CALL compact` or graft.autoCompact re-cluster)
    val (clustered, stats) =
      if (partCols.isEmpty) (result, Nil)
      else (graft.storage.Clustering.bySpecs(spark, result,
        partCols.map(PartSpec.parse)),
        GraftDml.statNamesOf(partCols))
    lake.overwritePartitioned(t, clustered, Nil,
      beforeCommit = guardHook, readBasis = Some(basis),
      statsCols = stats, changeData = changes)
    Nil
  }
}

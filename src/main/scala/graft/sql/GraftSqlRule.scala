package graft.sql

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{EliminateSubqueryAliases, UnresolvedAttribute}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.graftsql.{Bridge, GraftDeleteCommand, GraftMergeCommand, GraftMergeEnrichedCommand, GraftUpdateCommand}

import graft.sources.VersionedTable

/** The resolution rule behind the SQL-text surface (VERDICT r12 #2) —
  * the Delta-analysis shape: inside the analyzer's fixed point it
  *
  *   1. REPLACES every resolved [[GraftTable]] read relation with the
  *      planner-integrated [[VersionedTable.table]] plan (an
  *      exprId-preserving Project over the SnapshotFileIndex scan), so
  *      `SELECT … FROM wh.t [VERSION AS OF n]` gets commit-list file
  *      pruning, bloom probes and pushdown — NOT the V1Scan fallback;
  *   2. CONVERTS resolved `DELETE FROM` / `UPDATE` / `MERGE INTO` on
  *      graft tables into eagerly-executed commands calling the
  *      versioned verbs (`deleteWherePredicate` / `updateWhere` /
  *      `mergeInto`), before CheckAnalysis would refuse them (Spark's
  *      own row-level rewrites skip tables without
  *      SupportsRowLevelOperations).
  *
  * DML targets are deliberately NOT read-replaced: the conversion needs
  * the DSv2 relation intact to recognize the table. Attribute
  * references in conditions/assignments are remapped to by-name
  * unresolved attributes (`t.<col>` / `s.<col>` for merge clauses — the
  * struct aliases [[VersionedTable.mergeInto]] resolves against), so
  * the captured Columns bind to the verbs' own frames at run time.
  *
  * MERGE translates two ways: STAR-equivalent actions (`UPDATE SET * /
  * INSERT *` — the reference's canonical shape, /root/reference Gincr
  * cell 10) pass the source through whole-row; everything else —
  * partial assignments, expressions over `t.*`/`s.*` — goes through
  * the enrichment join ([[org.apache.spark.sql.graftsql.GraftMergeEnrichedCommand]]),
  * which materializes per-column clause values and condition flags
  * before the same bounded merge — including `WHEN NOT MATCHED BY
  * SOURCE` (full-outer enrichment; unmatched target rows re-match
  * themselves through the key join). Refused LOUDLY (never silently
  * wrong): a non-equi ON, differently-named ON keys, merge-key
  * reassignment, repeated clauses of one kind, duplicate-keyed
  * targets, and NMBS over null-keyed target rows. Standalone UPDATE
  * supports arbitrary per-column expressions. */
case class GraftSqlRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = rewrite(plan)

  // ---- plumbing ----------------------------------------------------

  private def graftRelation(p: LogicalPlan): Option[(DataSourceV2Relation, GraftTable)] =
    EliminateSubqueryAliases(p) match {
      case r: DataSourceV2Relation => r.table match {
        case t: GraftTable => Some((r, t))
        case _ => None
      }
      case _ => None
    }

  private def requireWritable(t: GraftTable): Unit =
    require(t.pinnedVersion.isEmpty,
      s"cannot run DML against a time-travel pin of ${t.name()}")

  /** `With` common-subexpression nodes (what BETWEEN desugars to)
    * refuse attribute rewrites while resolved — inline each ref to its
    * definition BEFORE the by-name remap (re-resolution rebuilds the
    * sharing; correctness is unchanged). */
  private def inlineWith(e: Expression): Expression = e.transformUp {
    case w: With =>
      val defs = w.defs.map(d => d.id -> d.child).toMap
      w.child.transformUp {
        case r: CommonExpressionRef => defs.getOrElse(r.id, r)
      }
  }

  /** Resolved target attributes → by-name unresolved ones: the Column
    * re-resolves against the verb's own frame. */
  private def byName(e: Expression, target: AttributeSet): Column =
    Bridge.column(inlineWith(e).transform {
      case a: AttributeReference if target.contains(a) =>
        UnresolvedAttribute(Seq(a.name))
    })

  /** Merge-clause remap: target attrs → `t.<col>`, source attrs →
    * `s.<col>` (the struct aliases of the merge's internal join). */
  private def tsCol(e: Expression, tgt: AttributeSet, src: AttributeSet): Column =
    Bridge.column(inlineWith(e).transform {
      case a: AttributeReference if tgt.contains(a) =>
        UnresolvedAttribute(Seq("t", a.name))
      case a: AttributeReference if src.contains(a) =>
        UnresolvedAttribute(Seq("s", a.name))
    })

  private def splitAnd(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitAnd(l) ++ splitAnd(r)
    case other => Seq(other)
  }

  // ---- the rewrite -------------------------------------------------

  private def rewrite(p: LogicalPlan): LogicalPlan = p match {
    case d @ DeleteFromTable(target, cond) =>
      graftRelation(target) match {
        case Some((r, t)) if d.resolved =>
          requireWritable(t)
          GraftDeleteCommand(t.root, byName(cond, r.outputSet))
        case _ => d // not ours, or still resolving — leave intact
      }

    case u @ UpdateTable(target, assignments, cond) =>
      graftRelation(target) match {
        case Some((r, t)) if u.resolved =>
          requireWritable(t)
          val set = assignments.flatMap { a =>
            val name = a.key match {
              case ar: AttributeReference => ar.name
              case other => throw new UnsupportedOperationException(
                "UPDATE on graft tables assigns top-level columns, got " +
                  other.sql)
            }
            val identity = a.value match {
              case v: AttributeReference => a.key match {
                case k: AttributeReference => v.exprId == k.exprId
                case _ => false
              }
              case _ => false
            }
            if (identity) None else Some(name -> byName(a.value, r.outputSet))
          }
          GraftUpdateCommand(t.root,
            byName(cond.getOrElse(Literal.TrueLiteral), r.outputSet), set)
        case _ => u
      }

    case m: MergeIntoTable =>
      graftRelation(m.targetTable) match {
        case Some((r, t)) if m.resolved => rewriteMerge(m, r, t)
        case _ => m
      }

    case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] =>
      readPlan(r, r.table.asInstanceOf[GraftTable])

    // `spark.readStream.table("wh.t")` (VERDICT r13 #6): the analyzer
    // resolves the catalog table to a StreamingRelationV2; swap it for
    // the V1 versioned-feed relation (the Delta bridge pattern — its
    // DeltaAnalysis does exactly this), exprId-preserving like the
    // batch read swap. Default is the PLAIN append stream in the
    // table's own schema; `.option("readChangeFeed", "true")` serves
    // the CDF schema, and startingVersion / startingTimestamp /
    // maxVersionsPerTrigger / skipChangeCommits pass through.
    case s: org.apache.spark.sql.catalyst.streaming.StreamingRelationV2
        if s.table.isInstanceOf[GraftTable] =>
      val t = s.table.asInstanceOf[GraftTable]
      require(t.pinnedVersion.isEmpty,
        s"cannot stream from a time-travel pin of ${t.name()}")
      import scala.jdk.CollectionConverters._
      val opts = s.extraOptions.asCaseSensitiveMap().asScala.toMap
      val params = opts ++ Map("path" -> t.root,
        "readChangeFeed" -> s.extraOptions.getBoolean("readChangeFeed", false).toString)
      val rel = Bridge.feedStreamingRelation(spark, params)
      val byN = rel.output.map(a => a.name -> a).toMap
      val projectList = s.output.map { old =>
        val a = byN.getOrElse(old.name, throw new IllegalStateException(
          s"column `${old.name}` missing from the versioned feed of ${t.root}"))
        Alias(a, old.name)(exprId = old.exprId, qualifier = old.qualifier)
      }
      // CDF mode exposes the feed's metadata columns BEYOND the catalog
      // relation's output — parents resolve them by name
      val extras = rel.output.filterNot(a => s.output.exists(_.name == a.name))
      Project(projectList ++ extras, rel)

    case other =>
      other.mapChildren(rewrite).transformExpressionsDown {
        case sq: SubqueryExpression => sq.withNewPlan(rewrite(sq.plan))
      }
  }

  /** The fast read path: the planner-integrated frame, projected back
    * onto the relation's original exprIds so every parent reference
    * survives the swap. */
  private def readPlan(r: DataSourceV2Relation, t: GraftTable): LogicalPlan = {
    val plan = VersionedTable.table(spark, t.root, t.pinnedVersion)
      .queryExecution.analyzed
    val byN = plan.output.map(a => a.name -> a).toMap
    val projectList = r.output.map { old =>
      val a = byN.getOrElse(old.name, throw new IllegalStateException(
        s"column `${old.name}` missing from the versioned read of ${t.root}"))
      Alias(a, old.name)(exprId = old.exprId, qualifier = old.qualifier)
    }
    Project(projectList, plan)
  }

  // ---- MERGE translation -------------------------------------------

  private def unsupported(what: String): Nothing =
    throw new UnsupportedOperationException(
      s"graft MERGE supports `ON t.<k> = s.<k> [AND …]` with star-equivalent " +
        s"`WHEN MATCHED [AND c] THEN UPDATE SET * | DELETE` and " +
        s"`WHEN NOT MATCHED [AND c] THEN INSERT *` — $what")

  private def rewriteMerge(m: MergeIntoTable, r: DataSourceV2Relation,
                           t: GraftTable): LogicalPlan = {
    requireWritable(t)
    val tgt = r.outputSet
    val src = m.sourceTable.outputSet
    val keys = splitAnd(m.mergeCondition).map {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if tgt.contains(a) && src.contains(b) =>
        if (a.name != b.name) unsupported(
          s"ON keys must share a name, got t.${a.name} = s.${b.name} " +
            "(alias the source column)")
        a.name
      case EqualTo(b: AttributeReference, a: AttributeReference)
          if tgt.contains(a) && src.contains(b) =>
        if (a.name != b.name) unsupported(
          s"ON keys must share a name, got s.${b.name} = t.${a.name}")
        a.name
      case other => unsupported(s"ON conjunct `${other.sql}` is not an equi-key")
    }
    val srcByName = m.sourceTable.output.map(a => a.name -> a).toMap

    /** True iff the assignment list is star-EQUIVALENT: every value is
      * the same-named source attr (`t.<key>` / NULL-for-source-missing
      * allowed), AND the assignments COVER every target column the
      * whole-row path would write differently — an UPDATE must assign
      * every target column (unassigned columns keep their target value
      * in SQL, but the whole-row path would overwrite them), and an
      * INSERT may leave a column unassigned only when the source lacks
      * it too (both paths then write NULL). Anything short of that
      * takes the enrichment join — never a silent semantic drift. */
    def isStar(assignments: Seq[Assignment], forInsert: Boolean): Boolean = {
      val assigned = assignments.flatMap(_.key match {
        case k: AttributeReference => Some(k.name)
        case _ => None
      }).toSet
      val shapeOk = assignments.forall { a =>
        a.key match {
          case k: AttributeReference => a.value match {
            case v: AttributeReference if src.contains(v) && v.name == k.name => true
            case v: AttributeReference
                if tgt.contains(v) && v.name == k.name && keys.contains(k.name) => true
            case Literal(null, _) if !srcByName.contains(k.name) => true
            case _ => false
          }
          case _ => false
        }
      }
      val coverageOk = r.output.map(_.name).forall(c =>
        assigned.contains(c) || (forInsert && !srcByName.contains(c)))
      shapeOk && coverageOk
    }

    // collect at most one clause of each kind (the engine's shape)
    var updAct: Option[(Option[Expression], Option[Seq[Assignment]])] = None
    var delCond: Option[Option[Expression]] = None
    var deleteListedFirst = false
    m.matchedActions.foreach {
      case UpdateStarAction(c) =>
        if (updAct.isDefined) unsupported("two UPDATE clauses are not")
        updAct = Some((c, None))
      case UpdateAction(c, assignments, fromStar) =>
        if (updAct.isDefined) unsupported("two UPDATE clauses are not")
        updAct = Some((c, if (fromStar) None else Some(assignments)))
      case DeleteAction(c) =>
        if (delCond.isDefined) unsupported("two DELETE clauses are not")
        deleteListedFirst = updAct.isEmpty
        delCond = Some(c)
      case other => unsupported(s"matched action $other is not")
    }
    var insAct: Option[(Option[Expression], Option[Seq[Assignment]])] = None
    m.notMatchedActions.foreach {
      case InsertStarAction(c) =>
        if (insAct.isDefined) unsupported("two INSERT clauses are not")
        insAct = Some((c, None))
      case InsertAction(c, assignments) =>
        if (insAct.isDefined) unsupported("two INSERT clauses are not")
        insAct = Some((c, Some(assignments)))
      case other => unsupported(s"not-matched action $other is not")
    }
    // WHEN NOT MATCHED BY SOURCE (VERDICT r13 #3): UPDATE/DELETE over
    // target rows with no source match — always the enrichment path
    // (the whole-row engine merge cannot see unmatched target rows)
    var nmbsUpd: Option[(Option[Expression], Seq[Assignment])] = None
    var nmbsDel: Option[Option[Expression]] = None
    var nmbsDeleteListedFirst = false
    m.notMatchedBySourceActions.foreach {
      case UpdateAction(c, assignments, _) =>
        if (nmbsUpd.isDefined)
          unsupported("two NOT MATCHED BY SOURCE UPDATE clauses are not")
        nmbsUpd = Some((c, assignments))
      case DeleteAction(c) =>
        if (nmbsDel.isDefined)
          unsupported("two NOT MATCHED BY SOURCE DELETE clauses are not")
        nmbsDeleteListedFirst = nmbsUpd.isEmpty
        nmbsDel = Some(c)
      case other => unsupported(s"not-matched-by-source action $other is not")
    }
    val hasNmbs = nmbsUpd.isDefined || nmbsDel.isDefined
    val starForm = !hasNmbs &&
      updAct.forall(_._2.forall(isStar(_, forInsert = false))) &&
        insAct.forall(_._2.forall(isStar(_, forInsert = true)))

    if (starForm) {
      // WHOLE-ROW fast path: no enrichment join, the source passes
      // through untouched and the engine's alignment does the rest
      val updateWhen = updAct.map(_._1.getOrElse(Literal.TrueLiteral))
      val deleteWhen = delCond.map(_.getOrElse(Literal.TrueLiteral))
      val insertWhen = insAct.map(_._1.getOrElse(Literal.TrueLiteral))
      // SQL evaluates matched clauses in listed order; the engine is
      // fixed update-then-delete — a delete listed FIRST folds its
      // (negated, null-safe) condition into the update guard so both
      // orders produce SQL semantics
      val (uw, dw) = (updateWhen, deleteWhen) match {
        case (Some(u), Some(d)) if deleteListedFirst =>
          (Some(And(Not(Coalesce(Seq(d, Literal.FalseLiteral))), u)), Some(d))
        case other => other
      }
      GraftMergeCommand(t.root, m.sourceTable, keys,
        uw.map(tsCol(_, tgt, src)), dw.map(tsCol(_, tgt, src)),
        insertWhen.map(tsCol(_, tgt, src)),
        evolveSchema = m.schemaEvolutionEnabled)
    } else {
      // FULL-FORM path: partial assignments / expressions over t.*,s.*
      // run through the enrichment join ([[GraftMergeEnrichedCommand]]).
      if (m.schemaEvolutionEnabled)
        unsupported("WITH SCHEMA EVOLUTION needs star-form actions and")
      def setOf(assignments: Seq[Assignment], action: String,
                allowTarget: Boolean): Seq[(String, Column)] =
        assignments.flatMap { a =>
          val name = a.key match {
            case k: AttributeReference => k.name
            case other => unsupported(s"$action assigns `${other.sql}`")
          }
          if (!allowTarget && a.value.references.exists(tgt.contains))
            unsupported(s"$action value `${a.value.sql}` references the target")
          if (keys.contains(name)) {
            // a key assignment must be the identity (s.<k>, or t.<k> on
            // a matched row) — rewriting merge keys would change what
            // the engine matches on
            val ok = a.value match {
              case v: AttributeReference => v.name == name
              case _ => false
            }
            if (!ok) unsupported(
              s"$action reassigns merge key `$name` to `${a.value.sql}`")
            None // keys pass through as s.<k>
          } else Some(name -> tsCol(a.value, tgt, src))
        }
      val updSet = updAct.flatMap(_._2).map(setOf(_, "UPDATE", allowTarget = true))
        .getOrElse(Seq.empty)
      val insSet = insAct.flatMap(_._2).map(setOf(_, "INSERT", allowTarget = false))
        .getOrElse(Seq.empty)
      // NMBS assignments reference the target alone (the analyzer
      // enforces it — there is no source row); keys may only be identity
      val nmbsSet = nmbsUpd.map(a => setOf(a._2, "NOT MATCHED BY SOURCE UPDATE",
        allowTarget = true)).getOrElse(Seq.empty)
      // a star action mixed with a partial one still enriches: its
      // per-column set is the full same-named-source mapping
      val starSet = m.sourceTable.output.map(_.name)
        .filterNot(keys.contains).map(n => n -> Bridge.column(
          org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(Seq("s", n))))
      GraftMergeEnrichedCommand(t.root, m.sourceTable, keys,
        updSet = if (updAct.exists(_._2.isEmpty)) starSet else updSet,
        insSet = if (insAct.exists(_._2.isEmpty)) starSet else insSet,
        nmbsSet = nmbsSet,
        hasUpdate = updAct.isDefined, hasDelete = delCond.isDefined,
        hasInsert = insAct.isDefined,
        hasNmbsUpdate = nmbsUpd.isDefined, hasNmbsDelete = nmbsDel.isDefined,
        updCond = updAct.flatMap(_._1).map(tsCol(_, tgt, src)),
        delCond = delCond.flatMap(identity).map(tsCol(_, tgt, src)),
        insCond = insAct.flatMap(_._1).map(tsCol(_, tgt, src)),
        nmbsUpdCond = nmbsUpd.flatMap(_._1).map(tsCol(_, tgt, src)),
        nmbsDelCond = nmbsDel.flatMap(identity).map(tsCol(_, tgt, src)),
        deleteListedFirst = deleteListedFirst,
        nmbsDeleteListedFirst = nmbsDeleteListedFirst)
    }
  }
}

/** Session extension entry point:
  * `spark.sql.extensions=graft.sql.GraftSparkExtensions` (or
  * `.withExtensions`) — one resolution rule (reads + DML) and one
  * delegating parser (maintenance verbs), nothing else. */
class GraftSparkExtensions
    extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectResolutionRule(session => GraftSqlRule(session))
    ext.injectParser((session, delegate) => new GraftSqlParser(session, delegate))
    ()
  }
}

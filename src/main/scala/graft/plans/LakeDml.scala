package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, EqualTo, Expression, PlanExpression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, InsertAction, LogicalPlan, MergeIntoTable, UpdateAction, UpdateTable}
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation}
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.graft.ColumnBridge

import graft.sources.{GraftLakeCatalogTable, LakeTable}

/** SQL `MERGE INTO` / `UPDATE` for graftlake catalog tables.
  *
  * Spark's own row-level-operation rewrite (`RewriteMergeIntoTable` /
  * `RewriteUpdateTable`) serves tables implementing the full
  * SupportsRowLevelOperations + executor-side V2 write stack; for every
  * other V2 table the analyzer resolves the command and the PLANNER
  * refuses it ("does not support MERGE INTO TABLE"). That planner seam
  * is exactly where a whole-operator extension belongs (the brief's
  * option (c): custom strategy via extraStrategies): [[LakeDmlStrategy]]
  * claims the RESOLVED `MergeIntoTable`/`UpdateTable` whose target is a
  * [[GraftLakeCatalogTable]] and lowers it onto the lake's native
  * transactional ops — the keyed copy-on-write [[LakeTable.merge]] and
  * [[LakeTable.delete]] — so SQL MERGE rides the same O(batch + touched
  * files) kernel as every other write path, one atomic version per
  * statement. Non-graftlake targets fall through untouched.
  *
  * Supported surface (anything else is REFUSED with the reason — never
  * silently approximated):
  *   - `MERGE INTO t USING s ON <conj. of t.key = srcExpr covering
  *     exactly t's merge identity>`
  *   - `WHEN MATCHED [AND cond] THEN UPDATE SET *` (or an explicit SET
  *     covering every target column), or `WHEN MATCHED [AND cond] THEN
  *     DELETE`
  *   - `WHEN NOT MATCHED [AND cond] THEN INSERT *` (or all columns)
  *   - action conditions and assignment values may reference SOURCE
  *     columns only (a matched-row condition over target columns needs
  *     the row-level join Spark's own rewrite would build)
  *   - `UPDATE t SET col = expr, ... [WHERE cond]` — any subset of
  *     non-key columns; cond/values over the target row, no subqueries
  *
  * Execution is read-modify-merge with snapshot isolation: the
  * statement reads the table's LATEST version, computes the batch, and
  * commits through the optimistic-concurrency merge (losing a publish
  * race rebases exactly like the programmatic API).
  */
object LakeDml {
  /** Idempotently inject the strategy (the TopKPerGroup registration
    * pattern). [[graft.sources.GraftLakeCatalog.initialize]] calls this,
    * so configuring the catalog IS enabling its SQL DML. */
  def register(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(LakeDmlStrategy))
      spark.experimental.extraStrategies =
        LakeDmlStrategy +: spark.experimental.extraStrategies
}

object LakeDmlStrategy extends SparkStrategy with PredicateHelper {

  private def refuse(what: String): Nothing =
    throw new UnsupportedOperationException(s"graftlake MERGE/UPDATE: $what")

  /** The lake table behind a resolved target plan, if any. */
  private def lakeTarget(plan: LogicalPlan): Option[(GraftLakeCatalogTable, Seq[Attribute])] =
    plan.collectFirst {
      case r: DataSourceV2Relation if r.table.isInstanceOf[GraftLakeCatalogTable] =>
        (r.table.asInstanceOf[GraftLakeCatalogTable], r.output)
      case s: DataSourceV2ScanRelation if s.relation.table.isInstanceOf[GraftLakeCatalogTable] =>
        (s.relation.table.asInstanceOf[GraftLakeCatalogTable], s.output)
    }

  /** Rebind a resolved expression's attributes BY NAME so it can
    * re-resolve against the runtime frame the executor builds (the
    * original exprIds belong to the command's plan, not ours). */
  private def byName(e: Expression): Column = {
    if (e.exists(_.isInstanceOf[PlanExpression[_]]))
      refuse(s"subqueries are not supported in this clause: $e")
    ColumnBridge.column(e.transform {
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    })
  }

  private def assignedName(a: Assignment): String = a.key match {
    case ar: AttributeReference => ar.name
    case other => refuse(s"only top-level columns can be assigned, not $other")
  }

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {

    case u: UpdateTable =>
      lakeTarget(u.table) match {
        case None => Nil // not ours: the built-in planner handles (or refuses) it
        case Some((t, _)) =>
          val schema = t.m.schema
          val keys = t.m.keys
          val byCol = u.assignments.map(a => assignedName(a) -> a.value).toMap
          byCol.keys.foreach { c =>
            if (keys.contains(c)) refuse(
              s"reassigning merge-identity column $c would change row identity; " +
                "DELETE + INSERT instead")
            if (!schema.fieldNames.contains(c)) refuse(s"unknown column $c")
          }
          val condCol = u.condition.map(byName).getOrElse(lit(true))
          val setCols = byCol.map { case (c, v) =>
            c -> byName(v).cast(schema(c).dataType)
          }
          exec(s"graftlake UPDATE ${t.name()}", { () =>
            val spark = SparkSession.active
            // read-modify-merge: matching rows get their assigned
            // columns recomputed, everything else carries; merge's
            // copy-on-write keeps the rewrite O(touched files)
            val snap = LakeTable.read(spark, t.tablePath)
            val updates = snap.filter(condCol)
              .select(schema.fieldNames.toIndexedSeq.map(c =>
                setCols.get(c).map(_.as(c)).getOrElse(col(c))): _*)
            LakeTable.merge(spark, t.tablePath, updates, keys)
            ()
          })
      }

    case m: MergeIntoTable =>
      lakeTarget(m.targetTable) match {
        case None => Nil
        case Some((t, tgtOutput)) =>
          val schema = t.m.schema
          val keys = t.m.keys
          val tgtSet = AttributeSet(tgtOutput)
          val srcSet = AttributeSet(m.sourceTable.output)
          if (m.notMatchedBySourceActions.nonEmpty)
            refuse("WHEN NOT MATCHED BY SOURCE is not supported")
          // ON must equate exactly the table's merge identity with
          // source-side expressions — that is what makes the statement
          // lowerable onto the keyed merge
          val keyPairs = splitConjunctivePredicates(m.mergeCondition).map {
            case EqualTo(l: AttributeReference, r)
                if tgtSet.contains(l) && r.references.subsetOf(srcSet) => (l.name, r)
            case EqualTo(l, r: AttributeReference)
                if tgtSet.contains(r) && l.references.subsetOf(srcSet) => (r.name, l)
            case other => refuse(
              s"ON must be a conjunction of target-key = source-expression equalities, got $other")
          }
          if (keyPairs.map(_._1).sorted != keys.sorted)
            refuse(s"ON must cover exactly the table's merge identity " +
              s"(${keys.mkString(", ")}), got ${keyPairs.map(_._1).mkString(", ")}")
          // source-only conditions: evaluable on the source frame alone
          def srcOnly(cond: Option[Expression], where: String): Column = {
            cond.foreach(c => if (!c.references.subsetOf(srcSet))
              refuse(s"$where condition may reference SOURCE columns only, got $c"))
            cond.map(byName).getOrElse(lit(true))
          }
          // full-row projection of the source through an action's
          // assignments, in target-schema order. A KEY column's assigned
          // value must BE the ON clause's source expression: the lowering
          // classifies matched/unmatched by the ON key, so an action that
          // assigns a key something else (SET k = s.k + 1) would land
          // rows under a different identity than the one that classified
          // them — refused, never silently mis-keyed.
          val onKeyExpr = keyPairs.toMap
          def projection(assigns: Seq[Assignment], what: String): Seq[Column] = {
            val byCol = assigns.map(a => assignedName(a) -> a.value).toMap
            byCol.values.foreach(v => if (!v.references.subsetOf(srcSet))
              refuse(s"$what values may reference SOURCE columns only, got $v"))
            byCol.foreach { case (c, v) =>
              if (keys.contains(c) && !v.semanticEquals(onKeyExpr(c)))
                refuse(s"$what assigns merge-identity column $c a value " +
                  s"($v) different from the ON clause's (${onKeyExpr(c)}) — " +
                  "rows are classified by the ON key; reassigning identity " +
                  "needs DELETE + INSERT")
            }
            schema.fieldNames.toIndexedSeq.map(c => byCol.get(c) match {
              case Some(v) => byName(v).cast(schema(c).dataType).as(c)
              case None => refuse(s"$what must assign every target column " +
                s"(missing $c) — partial SET needs the row-level join; " +
                "use UPDATE for partial column rewrites")
            })
          }
          val matched = m.matchedActions match {
            case Seq() => None
            case Seq(a) => Some(a)
            case _ => refuse("at most one WHEN MATCHED action is supported")
          }
          val notMatched = m.notMatchedActions match {
            case Seq() => None
            case Seq(i: InsertAction) => Some(i)
            case Seq(other) => refuse(s"unsupported WHEN NOT MATCHED action $other")
            case _ => refuse("at most one WHEN NOT MATCHED action is supported")
          }
          val keyExprCols = keyPairs.map { case (n, e) => byName(e).as(n) }
          val upd = matched.collect { case ua: UpdateAction =>
            (srcOnly(ua.condition, "WHEN MATCHED"),
              projection(ua.assignments, "UPDATE SET"))
          }
          val del = matched.collect { case da: DeleteAction =>
            srcOnly(da.condition, "WHEN MATCHED")
          }
          val ins = notMatched.map(ia =>
            (srcOnly(ia.condition, "WHEN NOT MATCHED"),
              projection(ia.assignments, "INSERT")))
          matched.foreach {
            case _: UpdateAction | _: DeleteAction => ()
            case other => refuse(s"unsupported WHEN MATCHED action $other")
          }
          val srcPlan = m.sourceTable
          exec(s"graftlake MERGE INTO ${t.name()}", { () =>
            val spark = SparkSession.active
            val src = ColumnBridge.ofRows(spark, srcPlan)
            val tgtKeys = LakeTable.read(spark, t.tablePath).select(keys.map(col): _*)
            // each action's batch is keyed, filtered, and scoped to its
            // match class; update ∪ insert commit as ONE merge version
            val updBatch = upd.map { case (c, proj) =>
              src.filter(c).select(proj: _*).join(tgtKeys, keys, "left_semi")
            }
            val insBatch = ins.map { case (c, proj) =>
              src.filter(c).select(proj: _*).join(tgtKeys, keys, "left_anti")
            }
            (updBatch ++ insBatch).reduceOption(_ unionByName _).foreach { batch =>
              LakeTable.merge(spark, t.tablePath, batch, keys)
            }
            del.foreach { c =>
              val doomed = src.filter(c).select(keyExprCols: _*)
              LakeTable.delete(spark, t.tablePath, doomed, keys)
            }
            ()
          })
      }

    case _ => Nil
  }

  private def exec(label: String, run: () => Unit): Seq[SparkPlan] =
    Seq(LakeDmlExec(label, run))
}

/** Leaf command node: the statement's side effect runs ONCE (commands
  * execute eagerly through executeCollect; the lazy val keeps a later
  * doExecute from double-committing). */
case class LakeDmlExec(label: String, run: () => Unit) extends LeafExecNode {
  override def output: Seq[Attribute] = Nil
  override def nodeName: String = label
  @transient private lazy val done: Unit = run()
  override def executeCollect(): Array[InternalRow] = { done; Array.empty }
  override protected def doExecute(): RDD[InternalRow] = { done; sparkContext.emptyRDD }
}

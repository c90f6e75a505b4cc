package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, EqualTo, Expression, PlanExpression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, DeleteFromTable, InsertAction, LogicalPlan, MergeAction, MergeIntoTable, UpdateAction, UpdateTable}
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation}
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.{coalesce, col, lit, max, min}
import org.apache.spark.sql.graft.ColumnBridge

import graft.sources.{GraftLakeCatalogTable, GraftLakeSource, LakeTable}

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
  * transactional ops — the keyed copy-on-write [[LakeTable.mergeDelete]]
  * and [[LakeTable.delete]] — so SQL MERGE rides the same O(batch +
  * touched files) kernel as every other write path, ONE atomic version
  * per statement. Non-graftlake targets fall through untouched.
  *
  * Two lowerings, picked per statement:
  *
  *   - SOURCE-ONLY (the cheap path): every action condition and
  *     assignment value references source columns alone, projections
  *     cover the full row, one action per match class, no NOT MATCHED
  *     BY SOURCE. The batch is computed from the source frame plus a
  *     KEY-ONLY scan of the target (matched/unmatched classification) —
  *     the target's non-key columns never move.
  *   - ROW-LEVEL (the general path): conditions/values referencing
  *     TARGET columns, partial `UPDATE SET`, multiple WHEN clauses
  *     (first-match-wins, the SQL precedence), and `WHEN NOT MATCHED BY
  *     SOURCE` lower through a real src ⋈ tgt join with provenance-
  *     renamed columns (`__s_*` / `__t_*` — exprIds decide which side a
  *     reference means, so shared names cannot collide).
  *
  * Both classification scans are ENVELOPE-PRUNED (VERDICT r15 ask #4):
  * the statement's source keys bound a min/max box per key column and
  * manifest stats prune target files before any opens — sound, because
  * a target row that matches a source key lies inside the envelope, so
  * its file always survives the prune. A statement with NOT MATCHED BY
  * SOURCE actions reads the full target instead (it is semantically an
  * O(table) statement — every target row must be classified).
  *
  * Still refused, loudly and with the reason (never approximated):
  * subqueries in any clause; an ON that is not a conjunction of
  * target-key = source-expression equalities covering exactly the merge
  * identity; reassigning a merge-identity column to anything but the ON
  * clause's own source expression (rows are CLASSIFIED by the ON key —
  * landing them under a different identity would silently corrupt the
  * upsert); MERGE WITH SCHEMA EVOLUTION; a source whose output carries
  * duplicate column names (the row-level rename has no unambiguous
  * by-name form).
  *
  * Execution is read-modify-merge with snapshot isolation: the
  * statement reads the table's LATEST version, computes the batch, and
  * commits through the optimistic-concurrency merge (losing a publish
  * race rebases exactly like the programmatic API).
  */
object LakeDml extends PredicateHelper {
  /** Idempotently inject the strategy (the TopKPerGroup registration
    * pattern). [[graft.sources.GraftLakeCatalog.initialize]] calls this,
    * so configuring the catalog IS enabling its SQL DML. */
  def register(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(LakeDmlStrategy))
      spark.experimental.extraStrategies =
        LakeDmlStrategy +: spark.experimental.extraStrategies

  /** Largest doomed-key set a row-level DELETE commits as an
    * equality-delete sidecar; beyond it the statement rewrites the
    * survivors instead (the sidecar would otherwise ride every reader's
    * broadcast anti-join — the 'bounded by contract' assumption the DV
    * kernel documents). `var` so specs can drive the fallback
    * deterministically at test scale. */
  private[graft] var DvDeleteCap: Long = 2000000L

  /** Envelope-pruned target read for merge classification: `srcKeys`
    * (key-named columns) bound a per-column min/max box; manifest stats
    * prune entries before any file opens. Sound for BOTH classification
    * joins: every target row whose key equals a source key lies inside
    * the envelope, so its file intersects the box and is kept — a
    * pruned-out file cannot hold a matched key, and the anti-join only
    * needs target keys that COULD equal a source key. Records its
    * (kept, total) decision under `<path>@classify` for the pruning
    * observability hook. Cost: one small agg job over the source keys +
    * an O(#files) driver-side stats pass. */
  private[graft] def prunedTargetRead(spark: SparkSession, path: String,
      srcKeys: DataFrame, keys: Seq[String]): DataFrame = {
    val v = LakeTable.latestVersion(path)
    val m = LakeTable.manifest(path, v)
    if (m.files.isEmpty) return LakeTable.readEntries(spark, m, m.files)
    val aggs = keys.flatMap(k => Seq(min(col(k)), max(col(k))))
    val row = srcKeys.agg(aggs.head, aggs.tail: _*).head()
    val preds = keys.zipWithIndex.flatMap { case (k, i) =>
      (Option(row.get(2 * i)), Option(row.get(2 * i + 1))) match {
        case (Some(lo), Some(hi)) =>
          Some((k, Some(lo): Option[Any], Some(hi): Option[Any]))
        case _ => None // empty source / all-null key: no honest bound
      }
    }
    val kept = m.files.filter(LakeTable.entryMatches(_, preds))
    GraftLakeSource.recordPrune(s"$path@classify", kept.size, m.files.size)
    LakeTable.readEntries(spark, m, kept)
  }

  /** Predicate-pruned target read for UPDATE / row-level DELETE: the
    * statement's WHERE conjuncts translate to source filters
    * (DataSourceStrategy — the same translation a scan's pushdown gets)
    * and prune manifest entries through the one `entryMatches` kernel.
    * Sound because the DML batch needs only MATCHING rows: a file whose
    * stats envelope cannot satisfy the predicate holds no row the
    * statement would touch, and copy-on-write carries it by reference.
    * Untranslatable conjuncts simply prune nothing (the full filter
    * re-applies on the survivors) — a selective keyed UPDATE reads
    * O(matching files), not O(table). */
  private[graft] def prunedByPredicate(spark: SparkSession, path: String,
      cond: Option[Expression]): DataFrame = {
    val v = LakeTable.latestVersion(path)
    val m = LakeTable.manifest(path, v)
    val preds = cond.toSeq.flatMap(splitConjunctivePredicates)
      .flatMap(e => ColumnBridge.translateFilter(e))
      .flatMap(f => GraftLakeSource.toIntervals(f))
    val kept = m.files.filter(LakeTable.entryMatches(_, preds))
    GraftLakeSource.recordPrune(s"$path@dml", kept.size, m.files.size)
    LakeTable.readEntries(spark, m, kept)
  }
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

  private def noSubqueries(e: Expression): Unit =
    if (e.exists(_.isInstanceOf[PlanExpression[_]]))
      refuse(s"subqueries are not supported in this clause: $e")

  /** Rebind a resolved expression's attributes BY NAME so it can
    * re-resolve against the runtime frame the executor builds (the
    * original exprIds belong to the command's plan, not ours). Used by
    * the source-only path, where the runtime frame IS the source. */
  private def byName(e: Expression): Column = {
    noSubqueries(e)
    ColumnBridge.column(e.transform {
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    })
  }

  /** Row-level rebinding: provenance (exprId membership) decides which
    * side a reference means, and the name carries it — `__t_<c>` for
    * target columns, `__s_<c>` for source — so a condition like
    * `tg.v < src.v` survives the shared name. */
  private def byProvenance(e: Expression, tgtSet: AttributeSet,
      srcSet: AttributeSet): Column = {
    noSubqueries(e)
    ColumnBridge.column(e.transform {
      case a: AttributeReference if tgtSet.contains(a) =>
        UnresolvedAttribute.quoted(s"__t_${a.name}")
      case a: AttributeReference if srcSet.contains(a) =>
        UnresolvedAttribute.quoted(s"__s_${a.name}")
      case a: AttributeReference =>
        refuse(s"reference $a resolves to neither the target nor the source")
    })
  }

  private def assignedName(a: Assignment): String = a.key match {
    case ar: AttributeReference => ar.name
    case other => refuse(s"only top-level columns can be assigned, not $other")
  }

  /** First-match-wins effective conditions (the SQL MERGE precedence):
    * a row takes clause j iff its condition is TRUE and no earlier
    * clause's condition was (null = not taken, per SQL three-valued
    * filtering). */
  private def effConds(conds: Seq[Column]): Seq[Column] =
    conds.zipWithIndex.map { case (c, i) =>
      conds.take(i).foldLeft(coalesce(c, lit(false)))(
        (acc, prev) => acc && !coalesce(prev, lit(false)))
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
          val condExpr = u.condition
          exec(s"graftlake UPDATE ${t.name()}", { () =>
            val spark = SparkSession.active
            // read-modify-merge: matching rows get their assigned
            // columns recomputed, everything else carries; merge's
            // copy-on-write keeps the rewrite O(touched files), and the
            // READ is predicate-pruned from the manifest stats — a
            // selective keyed UPDATE opens O(matching files)
            val snap = LakeDml.prunedByPredicate(spark, t.tablePath, condExpr)
            val updates = snap.filter(condCol)
              .select(schema.fieldNames.toIndexedSeq.map(c =>
                setCols.get(c).map(_.as(c)).getOrElse(col(c))): _*)
            LakeTable.merge(spark, t.tablePath, updates, keys)
            ()
          })
      }

    // DELETE FROM with a predicate Spark could NOT translate to source
    // filters: the translatable shapes never reach the planner as
    // DeleteFromTable (the metadata-only rewrite routes them through
    // SupportsDelete.deleteWhere first), so what lands here is exactly
    // the formerly-refused row-level remainder — `WHERE v % 7 = 3`,
    // function predicates, any expression over the row. Lowered as
    // read → filter → merge-on-read DV commit over the matching keys:
    // one version, zero data files rewritten, the same kernel as the
    // translatable path. Subqueries stay refused (byName).
    case d: DeleteFromTable =>
      lakeTarget(d.table) match {
        case None => Nil
        case Some((t, _)) =>
          val cond = byName(d.condition)
          val condExpr = d.condition
          val keys = t.m.keys
          exec(s"graftlake DELETE FROM ${t.name()} (row-level)", { () =>
            val spark = SparkSession.active
            val path = t.tablePath
            // the doomed-key read is predicate-pruned like UPDATE's.
            // Materialized ONCE (review r17 #4): the cap decision and
            // the committed sidecar must reflect the SAME snapshot — a
            // def would re-resolve latestVersion on each use, and a
            // concurrent commit between count() and deleteDV could make
            // them diverge.
            val doomed = LakeDml.prunedByPredicate(spark, path,
              Some(condExpr)).filter(cond).select(keys.map(col): _*)
              .localCheckpoint()
            val n = doomed.count()
            if (n == 0) {
              // a statement touching nothing commits nothing (the
              // commitBatches contract; review r16-2 #4) — no spurious
              // empty versions for CDC consumers or the vacuum horizon
              ()
            } else if (n <= LakeDml.DvDeleteCap) {
              LakeTable.deleteDV(spark, path, doomed, keys); ()
            } else {
              // UNSELECTIVE delete: the O(keys) sidecar contract no
              // longer holds — the doomed set is a sizable fraction of
              // the table, and a sidecar that big would ride every
              // reader's broadcast (review r16-2 #3). Rewrite the
              // SURVIVORS as one forward commit instead (layout and
              // clustering preserved; history and pinned readers
              // survive as for any overwrite).
              val m = LakeTable.manifest(path, LakeTable.latestVersion(path))
              // SQL three-valued logic: a row where cond is NULL is NOT
              // deleted (DELETE removes rows where cond IS TRUE), so it
              // must SURVIVE — !cond alone would yield NULL and drop it.
              // coalesce(cond, false) makes the survivor filter match
              // the DV path's filter(cond) complement exactly.
              val survivors = LakeTable.read(spark, path)
                .filter(!coalesce(cond, lit(false)))
              LakeTable.overwrite(spark, path, survivors, m.keys,
                nBuckets =
                  if (m.clusterBuckets > 0) m.clusterBuckets
                  else math.max(8, m.files.size),
                layout = if (m.clusterBuckets > 0) "cluster" else "hash",
                partitionBy = m.parts)
              ()
            }
          })
      }

    case m: MergeIntoTable =>
      lakeTarget(m.targetTable) match {
        case None => Nil
        case Some((t, tgtOutput)) =>
          if (m.withSchemaEvolution)
            refuse("WITH SCHEMA EVOLUTION is not supported — the lake's SQL " +
              "surface evolves schemas through ALTER TABLE ADD COLUMN")
          val schema = t.m.schema
          val keys = t.m.keys
          val tgtSet = AttributeSet(tgtOutput)
          val srcSet = AttributeSet(m.sourceTable.output)
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
          val onKeyExpr = keyPairs.toMap

          // a KEY column's assigned value must BE the ON clause's source
          // expression: the lowering classifies matched/unmatched by the
          // ON key, so an action that assigns a key something else
          // (SET k = s.k + 1) would land rows under a different identity
          // than the one that classified them — refused, never
          // silently mis-keyed.
          def checkKeyAssign(c: String, v: Expression, what: String): Unit =
            if (keys.contains(c) && !v.semanticEquals(onKeyExpr(c)))
              refuse(s"$what assigns merge-identity column $c a value " +
                s"($v) different from the ON clause's (${onKeyExpr(c)}) — " +
                "rows are classified by the ON key; reassigning identity " +
                "needs DELETE + INSERT")

          def checkAssigns(assigns: Seq[Assignment], what: String): Map[String, Expression] = {
            val byCol = assigns.map(a => assignedName(a) -> a.value).toMap
            byCol.foreach { case (c, v) =>
              if (!schema.fieldNames.contains(c)) refuse(s"$what: unknown column $c")
              checkKeyAssign(c, v, what)
            }
            byCol
          }

          def srcOnly(e: Expression): Boolean = e.references.subsetOf(srcSet)
          def tgtOnly(e: Expression): Boolean = e.references.subsetOf(tgtSet)
          def fullAssign(byCol: Map[String, Expression]): Boolean =
            schema.fieldNames.forall(byCol.contains)

          // ---- eligibility for the cheap source-only lowering ----
          def actionSourceOnly(a: MergeAction): Boolean = a match {
            case ua: UpdateAction =>
              ua.condition.forall(srcOnly) && ua.assignments.forall(x => srcOnly(x.value)) &&
                fullAssign(ua.assignments.map(x => assignedName(x) -> x.value).toMap)
            case da: DeleteAction => da.condition.forall(srcOnly)
            case ia: InsertAction =>
              ia.condition.forall(srcOnly) && ia.assignments.forall(x => srcOnly(x.value)) &&
                fullAssign(ia.assignments.map(x => assignedName(x) -> x.value).toMap)
            case _ => false
          }
          val fastEligible =
            m.notMatchedBySourceActions.isEmpty &&
              m.matchedActions.size <= 1 && m.notMatchedActions.size <= 1 &&
              m.matchedActions.forall(actionSourceOnly) &&
              m.notMatchedActions.forall {
                case ia: InsertAction => actionSourceOnly(ia)
                case _ => false
              }

          val keyExprCols = keyPairs.map { case (n, e) => byName(e).as(n) }
          val srcPlan = m.sourceTable

          if (fastEligible) {
            // ---- SOURCE-ONLY path: batch from the source frame + a
            // key-only pruned classification scan ----
            def projection(assigns: Seq[Assignment]): Seq[Column] = {
              val byCol = checkAssigns(assigns, "projection")
              schema.fieldNames.toIndexedSeq.map(c =>
                byName(byCol(c)).cast(schema(c).dataType).as(c))
            }
            val upd = m.matchedActions.collectFirst { case ua: UpdateAction =>
              (ua.condition.map(byName).getOrElse(lit(true)), projection(ua.assignments))
            }
            val del = m.matchedActions.collectFirst { case da: DeleteAction =>
              da.condition.map(byName).getOrElse(lit(true))
            }
            val ins = m.notMatchedActions.collectFirst { case ia: InsertAction =>
              (ia.condition.map(byName).getOrElse(lit(true)), projection(ia.assignments))
            }
            exec(s"graftlake MERGE INTO ${t.name()}", { () =>
              val spark = SparkSession.active
              val src = ColumnBridge.ofRows(spark, srcPlan)
              val tgtKeys = LakeDml.prunedTargetRead(spark, t.tablePath,
                src.select(keyExprCols: _*), keys).select(keys.map(col): _*)
              // each action's batch is keyed, filtered, and scoped to
              // its match class; update ∪ insert ∪ matched-delete commit
              // as ONE atomic version (ADVICE r15: the delete is scoped
              // to PRE-STATEMENT matched keys — an unmatched source row
              // that satisfies both the delete and insert conditions
              // inserts and SURVIVES, per MERGE semantics)
              val updBatch = upd.map { case (c, proj) =>
                src.filter(c).select(proj: _*).join(tgtKeys, keys, "left_semi")
              }
              val insBatch = ins.map { case (c, proj) =>
                src.filter(c).select(proj: _*).join(tgtKeys, keys, "left_anti")
              }
              val delBatch = del.map { c =>
                src.filter(c).select(keyExprCols: _*).join(tgtKeys, keys, "left_semi")
              }
              commitBatches(spark, t.tablePath, keys,
                (updBatch ++ insBatch).reduceOption(_ unionByName _), delBatch)
            })
          } else {
            // ---- ROW-LEVEL path: src ⋈ tgt with provenance-renamed
            // columns; partial SET, target references, multiple clauses
            // (first-match-wins), NOT MATCHED BY SOURCE ----
            val srcNames = m.sourceTable.output.map(_.name)
            if (srcNames.distinct.size != srcNames.size)
              refuse(s"source output carries duplicate column names " +
                s"(${srcNames.mkString(", ")}) — alias them apart first")

            def rebind(e: Expression): Column = byProvenance(e, tgtSet, srcSet)

            sealed trait Rep { def cond: Column }
            case class UpdRep(cond: Column, sets: Map[String, Column]) extends Rep
            case class DelRep(cond: Column) extends Rep
            case class InsRep(cond: Column, sets: Map[String, Column]) extends Rep

            def updRep(ua: UpdateAction, what: String,
                restrict: Option[Expression => Boolean]): UpdRep = {
              val byCol = checkAssigns(ua.assignments, what)
              restrict.foreach { ok =>
                ua.condition.foreach(c => if (!ok(c)) refuse(
                  s"$what condition may not cross match classes, got $c"))
                byCol.values.foreach(v => if (!ok(v)) refuse(
                  s"$what values may not cross match classes, got $v"))
              }
              UpdRep(ua.condition.map(rebind).getOrElse(lit(true)),
                // identity-preserving key assignment is a no-op on
                // matched rows (__t_key already equals the ON value)
                byCol.filterNot { case (c, _) => keys.contains(c) }
                  .map { case (c, v) => c -> rebind(v).cast(schema(c).dataType) })
            }

            val matchedReps: Seq[Rep] = m.matchedActions.map {
              case ua: UpdateAction => updRep(ua, "WHEN MATCHED UPDATE", None)
              case da: DeleteAction =>
                da.condition.foreach(noSubqueries)
                DelRep(da.condition.map(rebind).getOrElse(lit(true)))
              case other => refuse(s"unsupported WHEN MATCHED action $other")
            }
            val insertReps: Seq[InsRep] = m.notMatchedActions.map {
              case ia: InsertAction =>
                ia.condition.foreach(c => if (!srcOnly(c)) refuse(
                  s"WHEN NOT MATCHED condition may reference SOURCE columns only " +
                    s"(the target row does not exist), got $c"))
                val byCol = checkAssigns(ia.assignments, "INSERT")
                byCol.values.foreach(v => if (!srcOnly(v)) refuse(
                  s"INSERT values may reference SOURCE columns only, got $v"))
                keys.foreach(k => if (!byCol.contains(k)) refuse(
                  s"INSERT must assign merge-identity column $k"))
                InsRep(ia.condition.map(rebind).getOrElse(lit(true)),
                  byCol.map { case (c, v) => c -> rebind(v).cast(schema(c).dataType) })
              case other => refuse(s"unsupported WHEN NOT MATCHED action $other")
            }
            val nmbsReps: Seq[Rep] = m.notMatchedBySourceActions.map {
              case ua: UpdateAction =>
                updRep(ua, "WHEN NOT MATCHED BY SOURCE UPDATE", Some(tgtOnly))
              case da: DeleteAction =>
                da.condition.foreach { c =>
                  noSubqueries(c)
                  if (!tgtOnly(c)) refuse(
                    "WHEN NOT MATCHED BY SOURCE condition may reference TARGET " +
                      s"columns only (the source row does not exist), got $c")
                }
                DelRep(da.condition.map(rebind).getOrElse(lit(true)))
              case other => refuse(s"unsupported WHEN NOT MATCHED BY SOURCE action $other")
            }

            exec(s"graftlake MERGE INTO ${t.name()} (row-level)", { () =>
              val spark = SparkSession.active
              val src = ColumnBridge.ofRows(spark, srcPlan)
              val srcR = src.select(src.columns.toIndexedSeq.map(c =>
                col(c).as(s"__s_$c")): _*)
              // computed ON keys ride as __k_<key>, cast to the target
              // key types so the join compares on one axis
              val srcK = srcR.select(srcR.columns.toIndexedSeq.map(col) ++
                keyPairs.map { case (n, e) =>
                  rebind(e).cast(schema(n).dataType).as(s"__k_$n") }: _*)
              // a NOT MATCHED BY SOURCE statement classifies EVERY
              // target row — full read; otherwise the envelope-pruned
              // classification scan suffices (matched keys cannot live
              // in pruned files)
              val tgtBase =
                if (nmbsReps.nonEmpty) LakeTable.read(spark, t.tablePath)
                else LakeDml.prunedTargetRead(spark, t.tablePath,
                  srcK.select(keys.map(k => col(s"__k_$k").as(k)): _*), keys)
              val tgtR = tgtBase.select(schema.fieldNames.toIndexedSeq.map(c =>
                col(c).as(s"__t_$c")): _*)
              val joinCond = keys.map(k => col(s"__k_$k") === col(s"__t_$k"))
                .reduce(_ && _)
              val matched = srcK.join(tgtR, joinCond, "inner")
              val unmatched = srcK.join(
                tgtR.select(keys.map(k => col(s"__t_$k")): _*), joinCond, "left_anti")
              val upserts = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
              val deletes = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
              def emit(frame: DataFrame, reps: Seq[Rep],
                  fallback: String => Column): Unit =
                reps.zip(effConds(reps.map(_.cond))).foreach {
                  case (UpdRep(_, sets), eff) =>
                    upserts += frame.filter(eff).select(
                      schema.fieldNames.toIndexedSeq.map(c =>
                        sets.getOrElse(c, fallback(c)).as(c)): _*)
                  case (DelRep(_), eff) =>
                    deletes += frame.filter(eff).select(
                      keys.map(k => col(s"__t_$k").as(k)): _*)
                  case (InsRep(_, sets), eff) =>
                    upserts += frame.filter(eff).select(
                      schema.fieldNames.toIndexedSeq.map(c =>
                        sets.getOrElse(c, fallback(c)).as(c)): _*)
                }
              emit(matched, matchedReps, c => col(s"__t_$c"))
              emit(unmatched, insertReps, c => lit(null).cast(schema(c).dataType))
              if (nmbsReps.nonEmpty) {
                val nmbs = tgtR.join(
                  srcK.select(keys.map(k => col(s"__k_$k")): _*), joinCond, "left_anti")
                emit(nmbs, nmbsReps, c => col(s"__t_$c"))
              }
              commitBatches(spark, t.tablePath, keys,
                upserts.reduceOption(_ unionByName _),
                deletes.reduceOption(_ unionByName _))
            })
          }
      }

    case _ => Nil
  }

  /** Commit a statement's upsert batch and delete keys as ONE version
    * ([[LakeTable.mergeDelete]]); a delete-only statement rides the
    * single-commit [[LakeTable.delete]]; an empty statement commits
    * nothing.
    *
    * CARDINALITY GUARD (the SQL MERGE_CARDINALITY_VIOLATION contract,
    * extended to inserts because the table is KEYED): a duplicate key
    * across the statement's claimed rows means either one target row
    * was matched by several source rows or two source rows insert the
    * same identity — committing would silently break the one-row-per-
    * key invariant every later merge/delete relies on. One small agg
    * over the batch keys, refused loudly, never approximated. */
  private def commitBatches(spark: SparkSession, path: String,
      keys: Seq[String], batch: Option[DataFrame],
      delKeys: Option[DataFrame]): Unit = {
    // ONE evaluation serves both the guard and the commit (review r16-2
    // #1): localCheckpoint materializes the statement's batches, so the
    // cardinality check cannot diverge from the committed rows under a
    // non-deterministic source, and the merge kernel's discovery /
    // survivor passes re-read blocks instead of re-running the source
    // joins. Blocks are statement-sized and reclaimed on GC.
    // Empty-statement contract (review r17 #3): a statement whose
    // materialized batches carry ZERO rows commits NOTHING — same as
    // the delete-only n == 0 path above. Without this, an empty MERGE
    // would mint a spurious version for CDC consumers and the vacuum
    // horizon. The batches are already checkpointed, so the counts are
    // reads of materialized blocks, not re-runs of the source joins.
    val bcp = batch.map(_.localCheckpoint())
    val dcp = delKeys.map(_.localCheckpoint())
    // the tag/agg aliases below would silently SHADOW a key column of the
    // same name (withColumn replaces; the groupBy output would then fold
    // the key into the tag), corrupting both the cardinality check and
    // the empty-batch counts — refuse loudly instead (ADVICE r18)
    for (reserved <- Seq("__src", "__n", "__nb", "__nd"))
      require(!keys.contains(reserved),
        s"graftlake MERGE: key column name $reserved collides with an " +
          "internal statement-guard alias; rename the key column")
    // ONE aggregate job answers all three questions the three separate
    // actions used to ask (batch empty? delete batch empty? any
    // duplicated key across the union?): group the tagged key union,
    // then fold to (per-source row counts, max group size). Empty
    // batches contribute no rows, so the duplicate test over the full
    // tagged union is identical to the old test over the non-empty
    // subset. The checkpoints above stay the single evaluation point.
    val tagged = (bcp.map(_.select(keys.map(col): _*)
        .withColumn("__src", lit(1))).toSeq ++
      dcp.map(_.select(keys.map(col): _*)
        .withColumn("__src", lit(2))).toSeq)
      .reduceOption(_ unionByName _)
    val (nBatch, nDel) = tagged match {
      case None => (0L, 0L)
      case Some(t) =>
        import org.apache.spark.sql.functions.{count => fcount, max => fmax, sum => fsum, when}
        val row = t.groupBy(keys.map(col): _*)
          .agg(fcount(lit(1)).as("__n"),
            fsum(when(col("__src") === 1, 1L).otherwise(0L)).as("__nb"),
            fsum(when(col("__src") === 2, 1L).otherwise(0L)).as("__nd"))
          .agg(coalesce(fmax(col("__n")), lit(0L)),
            coalesce(fsum(col("__nb")), lit(0L)),
            coalesce(fsum(col("__nd")), lit(0L))).head()
        if (row.getLong(0) > 1) throw new IllegalStateException(
          "graftlake MERGE: cardinality violation — more than one source row " +
            "claimed the same target key (matched several times, or duplicate " +
            "insert identities); the keyed table admits one row per key, so " +
            "collapse the source per key first")
        (row.getLong(1), row.getLong(2))
    }
    val bc = bcp.filter(_ => nBatch > 0)
    val dc = dcp.filter(_ => nDel > 0)
    (bc, dc) match {
      case (Some(b), d) => LakeTable.mergeDelete(spark, path, b, d, keys); ()
      case (None, Some(d)) => LakeTable.delete(spark, path, d, keys); ()
      case (None, None) => ()
    }
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

package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteFromTable, InsertStarAction, LogicalPlan, MergeIntoTable, SubqueryAlias, UpdateStarAction, UpdateTable}
import org.apache.spark.sql.functions.expr

/** SQL text surface for the MergeStore table verbs: the thin dispatcher
  * that lets an analyst's `UPDATE / DELETE FROM / MERGE INTO` statement
  * drive the format without touching the Scala API — the BI-facing
  * route the reference's documented consumers
  * (`architecture.md:50-56`) would use. Spark's OWN parser produces
  * the standard DML logical plans (`UpdateTable`, `DeleteFromTable`,
  * `MergeIntoTable` — the DSv2 grammar); this walks the UNRESOLVED
  * plan, maps the named table through a caller-supplied
  * name → MergeStore-path catalog, and dispatches to the matching
  * verb. No SQL dialect is invented and no expression is re-parsed by
  * hand: conditions and SET values round-trip through
  * `Expression.sql` back into `functions.expr`, so they evaluate with
  * Spark's exact semantics inside the verb's own plan.
  *
  * Supported statements (refusals are loud and name the limit):
  *   - `UPDATE t SET c = e [, ...] [WHERE p]` → [[MergeStore.updateWhere]]
  *     (or [[MergeStore.updateWhereMor]] with `mor = true`)
  *   - `DELETE FROM t [WHERE p]` → [[MergeStore.deleteWhere]] /
  *     [[MergeStore.deleteWhereMor]]
  *   - `MERGE INTO t USING s ON t.k = s.k [AND ...]
  *      WHEN MATCHED THEN UPDATE SET *
  *      WHEN NOT MATCHED THEN INSERT *` → [[MergeStore.merge]] on the
  *     ON-clause key columns; `s` is a table/temp view name. The
  *     single-action forms keep SQL semantics: UPDATE-only ignores
  *     unmatched source rows, INSERT-only leaves matched target rows
  *     untouched (source filtered against the statement's snapshot
  *     before the verb — see [[mergeFiltered]]).
  *   - `MERGE INTO t USING s ON ... WHEN MATCHED THEN DELETE` (sole
  *     action) → [[MergeStore.delete]] by the source's key set.
  *
  * Concurrency, constraints, stats upkeep, and the change feed are the
  * dispatched verb's own — SQL is a spelling, not a second engine. */
object SqlVerbs {

  sealed trait VerbResult
  final case class Updated(stats: MergeStore.UpdateStats) extends VerbResult
  final case class Deleted(stats: MergeStore.DeleteStats) extends VerbResult
  final case class MorDeleted(stats: MergeStore.MorDeleteStats)
    extends VerbResult
  final case class Merged(stats: MergeStore.MergeStats) extends VerbResult

  /** Parse and execute one DML statement against `tables`
    * (logical name → MergeStore table path). `mor = true` routes
    * UPDATE/DELETE through the merge-on-read (deletion-vector) verbs. */
  def execute(spark: SparkSession, sqlText: String,
              tables: Map[String, String], mor: Boolean = false,
              maxRetries: Int = 3): VerbResult = {
    val plan = spark.sessionState.sqlParser.parsePlan(sqlText)
    plan match {
      case UpdateTable(rel, assignments, cond) =>
        val path = pathOf(rel, tables)
        val set = assignments.map { case Assignment(k, v) =>
          attrName(k) -> expr(v.sql)
        }.toMap
        val where = cond.map(c => expr(c.sql))
          .getOrElse(org.apache.spark.sql.functions.lit(true))
        if (mor) Updated(MergeStore.updateWhereMor(spark, path, where, set,
          maxRetries = maxRetries))
        else Updated(MergeStore.updateWhere(spark, path, where, set,
          maxRetries = maxRetries))
      case DeleteFromTable(rel, cond) =>
        val path = pathOf(rel, tables)
        val where = expr(cond.sql)
        if (mor) MorDeleted(MergeStore.deleteWhereMor(spark, path, where,
          maxRetries = maxRetries))
        else Deleted(MergeStore.deleteWhere(spark, path, where,
          maxRetries = maxRetries))
      case m: MergeIntoTable =>
        executeMerge(spark, m, tables, maxRetries)
      case other => sys.error(
        s"SqlVerbs supports UPDATE / DELETE FROM / MERGE INTO; got " +
          s"${other.getClass.getSimpleName} — run queries through " +
          "spark.sql over MergeStore.read, and DDL through the Scala API")
    }
  }

  private def executeMerge(spark: SparkSession, m: MergeIntoTable,
                           tables: Map[String, String],
                           maxRetries: Int): VerbResult = {
    val path = pathOf(m.targetTable, tables)
    // Lazy: unsupported action shapes must refuse BEFORE the source
    // resolves (a misspelled view would otherwise mask the real error).
    lazy val source = sourceDf(spark, m.sourceTable)
    val pk = keyColumns(m.mergeCondition)
    require(pk.nonEmpty,
      "MERGE ON clause must be a conjunction of same-named column " +
        s"equalities (t.k = s.k); got: ${m.mergeCondition.sql}")
    require(m.notMatchedBySourceActions.isEmpty,
      "WHEN NOT MATCHED BY SOURCE is not supported — express removals " +
        "as an explicit DELETE")
    (m.matchedActions, m.notMatchedActions) match {
      // The canonical upsert: UPDATE SET * + INSERT *.
      case (Seq(UpdateStarAction(None)), Seq(InsertStarAction(None))) =>
        Merged(MergeStore.merge(spark, source, path, pk,
          maxRetries = maxRetries))
      // UPDATE-only: SQL says unmatched source rows are IGNORED, so
      // the source filters to keys PRESENT in the statement's snapshot
      // before the upsert verb runs (a bare merge would insert them).
      case (Seq(UpdateStarAction(None)), Seq()) =>
        Merged(mergeFiltered(spark, path, source, pk, "left_semi",
          maxRetries))
      // INSERT-only: matched target rows must stay UNTOUCHED, so the
      // source filters to keys ABSENT from the snapshot.
      case (Seq(), Seq(InsertStarAction(None))) =>
        Merged(mergeFiltered(spark, path, source, pk, "left_anti",
          maxRetries))
      // Sole WHEN MATCHED THEN DELETE: key-set removal.
      case (Seq(org.apache.spark.sql.catalyst.plans.logical
          .DeleteAction(None)), Seq()) =>
        Deleted(MergeStore.delete(spark, path, source, pk,
          maxRetries = maxRetries))
      case _ => sys.error(
        "MERGE supports WHEN MATCHED THEN UPDATE SET * and/or WHEN " +
          "NOT MATCHED THEN INSERT *, or a sole WHEN MATCHED THEN " +
          "DELETE — conditional/column-list actions are not supported")
    }
  }

  /** Single-action MERGE forms: the source semi/anti-joins the
    * statement's PINNED snapshot on the key (update-only keeps matched
    * keys, insert-only keeps unmatched), then the upsert verb runs
    * against that SAME snapshot. On a lost CAS the whole
    * filter-then-merge REPLAYS against the fresh head — retrying only
    * the inner merge would re-match a stale filter (a key a rival
    * inserted mid-flight must count as "matched" for SQL's
    * NOT-MATCHED evaluation, exactly OCC's serializability story).
    * The inner merge may still resolve a provably file-disjoint rival
    * by rebase: its read set and this filter share one snapshot. */
  private def mergeFiltered(spark: SparkSession, path: String,
                            source: DataFrame, pk: Seq[String],
                            joinType: String, maxRetries: Int)
      : MergeStore.MergeStats = {
    val v = MergeStore.version(path)
      .getOrElse(sys.error(s"no committed version at $path"))
    val filtered = source.join(
      MergeStore.read(spark, path, Some(v)).select(pk.map(
        org.apache.spark.sql.functions.col): _*),
      pk, joinType)
    try MergeStore.merge(spark, filtered, path, pk,
      snapshotVersion = Some(v))
    catch {
      case _: java.util.ConcurrentModificationException
          if maxRetries > 0 =>
        val st = mergeFiltered(spark, path, source, pk, joinType,
          maxRetries - 1)
        st.copy(recomputes = st.recomputes + 1)
    }
  }

  private def pathOf(rel: LogicalPlan,
                     tables: Map[String, String]): String = rel match {
    case r: UnresolvedRelation =>
      val name = r.multipartIdentifier.mkString(".")
      tables.getOrElse(name, tables.getOrElse(
        r.multipartIdentifier.last,
        sys.error(s"unknown MergeStore table '$name' — register it in " +
          s"the catalog map (known: ${tables.keys.toSeq.sorted.mkString(", ")})")))
    case SubqueryAlias(_, child) => pathOf(child, tables)
    case other => sys.error(
      s"expected a bare table name, got ${other.getClass.getSimpleName}")
  }

  /** MERGE source: a table / temp view name (optionally aliased). A
    * registered MergeStore table name resolves through [[MergeStore.read]];
    * anything else goes to the session catalog (temp views, catalog
    * tables). Subqueries: register a temp view first. */
  private def sourceDf(spark: SparkSession, rel: LogicalPlan): DataFrame =
    rel match {
      case r: UnresolvedRelation => spark.table(r.multipartIdentifier
        .mkString("."))
      case SubqueryAlias(_, child) => sourceDf(spark, child)
      case other => sys.error(
        "MERGE USING must name a table or temp view (register a " +
          s"subquery as a temp view first); got ${other.getClass.getSimpleName}")
    }

  private def attrName(e: Expression): String = e match {
    case a: UnresolvedAttribute => a.nameParts.last
    case other => sys.error(
      s"SET target must be a bare column, got: ${other.sql}")
  }

  /** Key columns of a MERGE ON conjunction: every conjunct must be an
    * equality between the SAME column name on both sides. */
  private def keyColumns(cond: Expression): Seq[String] = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    val keys = conjuncts(cond).map {
      case EqualTo(a: UnresolvedAttribute, b: UnresolvedAttribute)
          if a.nameParts.last == b.nameParts.last => a.nameParts.last
      case other => return Seq.empty
    }
    keys.distinct
  }
}

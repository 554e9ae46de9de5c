package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{CurrentDate, CurrentTimestamp, Expression, Literal, Now}
import org.apache.spark.sql.catalyst.plans.logical.{InsertIntoStatement, LogicalPlan, UnresolvedWith}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedFunction, UnresolvedIdentifier, UnresolvedRelation, UnresolvedTable, UnresolvedTableOrView}
import org.apache.spark.sql.types.{DateType, TimestampType}

/** Thin bridge into spark-sql private[sql] surface (plan → DataFrame), used
  * for the unit-test harness's plan rewrites. Lives in an org.apache.spark.sql
  * subpackage on purpose — the standard extension-point pattern.
  */
object SqlBridge {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The analyzed Catalyst plan behind a DataFrame. */
  def analyzedPlan(df: DataFrame): LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].queryExecution.analyzed

  /** Clone `spark` (shared catalog + state, copied conf/temp views) with
    * per-clone conf overrides — the safe way to run ONE write under a
    * different SQL conf without racing concurrent writers that share the
    * original session (cloneSession is private[sql], hence bridged). */
  def sessionWithConf(spark: SparkSession, kv: (String, String)*): SparkSession = {
    val c = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].cloneSession()
    kv.foreach { case (k, v) => c.conf.set(k, v) }
    c
  }

  /** The bucket count recorded in a catalog TABLE's metadata (None for
    * views, unbucketed tables, or anything the catalog can't describe).
    * The public Catalog API exposes `isBucket` per column but never the
    * COUNT, which is the part an append must match (sessionState is
    * private[sql], hence bridged). */
  def bucketCount(spark: SparkSession, table: String): Option[Int] =
    try {
      val ss = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sessionState
      ss.catalog.getTableMetadata(ss.sqlParser.parseTableIdentifier(table))
        .bucketSpec.map(_.numBuckets)
    } catch { case _: Throwable => None }

  /** Wrap a raw Catalyst expression as a user-facing Column (Spark 4 Columns
    * are ColumnNode-backed; this is the classic-session escape hatch). */
  def column(e: Expression): org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  /** The inverse: the Catalyst expression behind a Column. */
  def expression(c: org.apache.spark.sql.Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  /** The freeze rewrite, usable on parsed (UnresolvedFunction) and analyzed
    * (CurrentTimestamp/Now/CurrentDate) plans alike. */
  def freezeExpressions(plan: LogicalPlan, epochMicros: Long): LogicalPlan = {
    def frozenFor(name: String): Option[Expression] = name.toLowerCase match {
      case "current_timestamp" | "now" | "localtimestamp" =>
        Some(Literal(epochMicros, TimestampType))
      case "current_date" | "curdate" =>
        Some(Literal((epochMicros / 86400000000L).toInt, DateType))
      case _ => scala.None
    }
    plan.transformAllExpressions {
      case _: CurrentTimestamp => Literal(epochMicros, TimestampType)
      case _: Now              => Literal(epochMicros, TimestampType)
      case _: CurrentDate      => Literal((epochMicros / 86400000000L).toInt, DateType)
      case f: UnresolvedFunction
        if f.nameParts.size == 1 && frozenFor(f.nameParts.head).nonEmpty =>
        frozenFor(f.nameParts.head).get
    }
  }

  /** FreezeTime (reference pkg/sqlparser/parser.go:451-461): replace
    * now()/current_timestamp/current_date with literals so test runs are
    * deterministic. Plan-level, not regex — comments/strings are safe. */
  def freezeTime(spark: SparkSession, sql: String, epochMicros: Long): DataFrame =
    ofRows(spark, freezeExpressions(spark.sessionState.sqlParser.parsePlan(sql), epochMicros))

  /** Register a native Catalyst expression as a session SQL function —
    * the extension path for custom expressions (SparkSessionExtensions'
    * injectFunction equivalent, scoped to one session). */
  def registerFunction(spark: SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "built-in")

  /** RenameTables (reference pkg/sqlparser/parser.go:263-270): rewrite table
    * references per `mapping` at the plan level, so matches inside string
    * literals and comments are untouched (unlike a regex rewrite). CTE names
    * shadow catalog tables and are never renamed. Used by the unit-test
    * fixture injection and the dev-environment schema_prefix rewrite.
    *
    * Write/DDL targets are renamed too: CTAS / REPLACE TABLE / CREATE VIEW
    * name their target with an [[UnresolvedIdentifier]], DROP/ALTER/REFRESH
    * with [[UnresolvedTable]]/[[UnresolvedTableOrView]], and INSERT with a
    * plain [[UnresolvedRelation]] — all four shapes go through `mapping`.
    * `prefixUnmapped` (the dev sandbox's physicalName) additionally rewrites
    * DDL targets that are NOT in the mapping, so a script asset's ad-hoc
    * `CREATE TABLE scratch AS …` lands in the sandbox instead of prod
    * (reference devenv/modifier.go isolation contract). Reads of unmapped
    * tables are never prefixed — dev runs read prod sources by design. */
  def renameTables(plan: LogicalPlan, mapping: Map[String, String],
                   prefixUnmapped: String => String = identity): LogicalPlan = {
    val norm = mapping.map { case (k, v) => k.toLowerCase -> v }
    def target(parts: Seq[String]): Option[Seq[String]] = {
      val key = parts.mkString(".").toLowerCase
      norm.get(key).orElse {
        val p = prefixUnmapped(parts.mkString("."))
        if (p == parts.mkString(".")) scala.None else Some(p)
      }.map(_.split('.').toSeq)
    }
    val cteNames = plan.collect {
      case w: UnresolvedWith => w.cteRelations.map(_._1.toLowerCase)
    }.flatten.toSet
    def rewrite(p: LogicalPlan): LogicalPlan =
      // transformWithSubqueries descends into IN/EXISTS/scalar subquery plans;
      // CTE definitions are NOT plan children (UnresolvedWith keeps them in
      // cteRelations), so they recurse explicitly
      p.transformWithSubqueries {
        case w: UnresolvedWith =>
          w.copy(cteRelations = w.cteRelations.map { case (n, rel, mr) =>
            (n, rewrite(rel).asInstanceOf[org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias], mr)
          })
        // INSERT's target is a plain UnresolvedRelation — at the statement
        // level it is a write, so the unmapped-prefix fallback applies
        case ins: InsertIntoStatement =>
          ins.table match {
            case r: UnresolvedRelation if target(r.multipartIdentifier).nonEmpty =>
              ins.copy(table = UnresolvedRelation(target(r.multipartIdentifier).get))
            case _ => ins
          }
        case r: UnresolvedRelation
          if !cteNames.contains(r.multipartIdentifier.mkString(".").toLowerCase) &&
             norm.contains(r.multipartIdentifier.mkString(".").toLowerCase) =>
          UnresolvedRelation(norm(r.multipartIdentifier.mkString(".").toLowerCase).split('.').toSeq)
        case i: UnresolvedIdentifier if target(i.nameParts).nonEmpty =>
          i.copy(nameParts = target(i.nameParts).get)
        case t: UnresolvedTable if target(t.multipartIdentifier).nonEmpty =>
          t.copy(multipartIdentifier = target(t.multipartIdentifier).get)
        case tv: UnresolvedTableOrView if target(tv.multipartIdentifier).nonEmpty =>
          tv.copy(multipartIdentifier = target(tv.multipartIdentifier).get)
      }
    rewrite(plan)
  }

  def renameTablesSql(spark: SparkSession, sql: String, mapping: Map[String, String],
                      prefixUnmapped: String => String = identity): DataFrame =
    ofRows(spark, renameTables(spark.sessionState.sqlParser.parsePlan(sql), mapping, prefixUnmapped))

  /** ExtractSelect (reference parser.go:429-439): pull the SELECT out of a
    * DML/DDL statement (INSERT INTO … SELECT, CTAS, CREATE VIEW). Returns the
    * original SQL's query child, or the plan itself when already a query. */
  def extractSelect(spark: SparkSession, sql: String): LogicalPlan = {
    import org.apache.spark.sql.catalyst.plans.logical._
    spark.sessionState.sqlParser.parsePlan(sql) match {
      case i: InsertIntoStatement => i.query
      case c: CreateTableAsSelect => c.query
      case r: ReplaceTableAsSelect => r.query
      case v: CreateView => v.query
      case other => other
    }
  }

  /** SelectFromCTE (reference parser.go:440-450) at the plan level: keep the
    * CTE prologue, swap the main query for SELECT * FROM cte. */
  def selectFromCtePlan(spark: SparkSession, sql: String, cteName: String): LogicalPlan =
    spark.sessionState.sqlParser.parsePlan(sql) match {
      case w: UnresolvedWith if w.cteRelations.exists(_._1 == cteName) =>
        w.copy(child = UnresolvedRelation(Seq(cteName)))
      case _ =>
        throw new IllegalArgumentException(s"query has no CTE named '$cteName'")
    }

  /** SelectFromCTE — used for per-CTE unit-test assertions. */
  def selectFromCte(spark: SparkSession, sql: String, cteName: String,
                    epochMicros: Option[Long] = None): DataFrame = {
    val rewritten = selectFromCtePlan(spark, sql, cteName)
    val frozen = epochMicros match {
      case Some(us) => freezeExpressions(rewritten, us)
      case scala.None => rewritten
    }
    ofRows(spark, frozen)
  }
}

package graft.lineage

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import graft.model.{Asset, Pipeline}

/** Column-level lineage + used-table extraction over Catalyst plans.
  *
  * The reference shells out to a Python sqlglot service for this
  * (pkg/sqlparser/parser.go:168-239) and propagates through upstreams in
  * pkg/lineage/lineage.go:101-215. Here the *analyzed* LogicalPlan already
  * carries resolved attribute references, so lineage is a bottom-up fold:
  * map every output ExprId to the set of (table, column) leaves it draws
  * from; WHERE/JOIN-only columns are reported as non-selected (parser.go
  * ColumnLineage's non_selected).
  */
object Lineage {

  final case class ColumnRef(table: String, column: String)
  final case class ColumnLineage(column: String, upstreams: Seq[ColumnRef])
  final case class QueryLineage(columns: Seq[ColumnLineage], nonSelected: Seq[ColumnRef])

  /** Tables referenced by a query — unresolved parse, no catalog needed
    * (reference parser.go:200-239 UsedTables). */
  def usedTables(spark: SparkSession, sql: String): Seq[String] =
    spark.sessionState.sqlParser.parsePlan(sql).collect {
      case r: UnresolvedRelation => r.multipartIdentifier.mkString(".")
    }.distinct.sorted

  /** Auto-dependency inference: used tables that are pipeline assets but not
    * declared upstream (reference parser.go GetMissingDependenciesForAsset
    * :515-580). */
  def missingDependencies(spark: SparkSession, pipeline: Pipeline, asset: Asset): Seq[String] = {
    val assetNames = pipeline.assets.map(_.name).toSet
    val declared = asset.upstreams.map(_.value).toSet
    usedTables(spark, asset.content)
      .filter(assetNames)
      .filterNot(declared)
      .filterNot(_ == asset.name)
  }

  def columnLineage(spark: SparkSession, sql: String): QueryLineage = {
    val analyzed = spark.sql(sql).queryExecution.analyzed
    val leafMap = scala.collection.mutable.Map[ExprId, Set[ColumnRef]]()
    val nonSelected = scala.collection.mutable.LinkedHashSet[ColumnRef]()

    def relationName(p: LogicalPlan): Option[String] = p match {
      case s: SubqueryAlias => Some(s.alias)
      case _ => scala.None
    }

    def refsOf(e: Expression): Set[ColumnRef] =
      e.references.toSeq.flatMap(a => leafMap.getOrElse(a.exprId, Set.empty[ColumnRef])).toSet

    def visit(plan: LogicalPlan, aliasAbove: Option[String]): Unit = plan match {
      case s: SubqueryAlias =>
        visit(s.child, Some(s.alias.split('.').last))
      case v: View => // temp views analyze as SubqueryAlias(name, View(_, plan))
        visit(v.child, aliasAbove)
      case l: LeafNode =>
        val table = aliasAbove.getOrElse(l.nodeName)
        l.output.foreach(a => leafMap(a.exprId) = Set(ColumnRef(table, a.name)))
      case p =>
        p.children.foreach(visit(_, scala.None))
        p match {
          case prj: Project =>
            prj.projectList.foreach(ne => leafMap(ne.exprId) = refsOf(ne))
          case agg: Aggregate =>
            agg.aggregateExpressions.foreach(ne => leafMap(ne.exprId) = refsOf(ne))
          case w: Window =>
            w.windowExpressions.foreach(ne => leafMap(ne.exprId) = refsOf(ne))
          case u: Union =>
            // each output column draws from the same position of every branch
            u.output.zipWithIndex.foreach { case (out, i) =>
              leafMap(out.exprId) = u.children
                .flatMap(c => leafMap.getOrElse(c.output(i).exprId, Set.empty[ColumnRef])).toSet
            }
          case f: Filter => nonSelected ++= refsOf(f.condition)
          case j: Join => j.condition.foreach(c => nonSelected ++= refsOf(c))
          case _ => ()
        }
    }
    visit(analyzed, scala.None)

    val cols = analyzed.output.map { a =>
      ColumnLineage(a.name,
        leafMap.getOrElse(a.exprId, Set.empty)
          .toSeq.sortBy(r => (r.table, r.column)))
    }
    val selected = cols.flatMap(_.upstreams).toSet
    QueryLineage(cols.toSeq, nonSelected.toSeq.filterNot(selected).sortBy(r => (r.table, r.column)))
  }
}

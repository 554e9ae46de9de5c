package graft.materialize

import org.apache.spark.sql.SparkSession
import graft.model.Asset

/** Metadata push (reference bigquery metadata push operator, wired in
  * cmd/run.go:2007-2038): asset and column descriptions land in the
  * warehouse catalog so they show up in DESCRIBE / catalog browsers.
  * Spark mapping: table comment via TBLPROPERTIES, column comments via
  * ALTER COLUMN (v2) with a CHANGE COLUMN (v1 Hive-style) fallback. */
object MetadataPush {

  private def q(s: String): String = s.replace("'", "''")

  /** Push descriptions for `asset` (its physical table must exist).
    * Returns the number of comments applied. */
  def push(spark: SparkSession, asset: Asset, tableName: String = ""): Int = {
    val table = if (tableName.nonEmpty) tableName else asset.name
    val isView =
      try spark.catalog.getTable(table).tableType == "VIEW"
      catch { case _: Exception => false }
    var applied = 0
    if (asset.description.nonEmpty) {
      // views take ALTER VIEW; ALTER TABLE on a view throws
      val kind = if (isView) "VIEW" else "TABLE"
      spark.sql(s"ALTER $kind $table SET TBLPROPERTIES('comment' = '${q(asset.description)}')")
      applied += 1
    }
    // column comments are table-only DDL: a graft generation view forwards
    // them to its backing table (DESCRIBE through the view still shows them);
    // a plain user view has nowhere to put them
    val colTarget =
      if (!isView) table
      else SessionCatalogWarehouse.backingTable(spark, table).getOrElse { return applied }
    val existing = spark.table(colTarget).columns.toSet
    asset.columns.filter(c => c.description.nonEmpty && existing.contains(c.name)).foreach { c =>
      try
        spark.sql(s"ALTER TABLE $colTarget ALTER COLUMN ${c.name} COMMENT '${q(c.description)}'")
      catch { case _: Exception =>
        val typ = spark.table(colTarget).schema(c.name).dataType.sql
        spark.sql(s"ALTER TABLE $colTarget CHANGE COLUMN ${c.name} ${c.name} $typ COMMENT '${q(c.description)}'")
      }
      applied += 1
    }
    applied
  }
}

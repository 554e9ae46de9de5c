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
    if (isView) return applied // column comments are table-only DDL
    val existing = spark.table(table).columns.toSet
    asset.columns.filter(c => c.description.nonEmpty && existing.contains(c.name)).foreach { c =>
      try
        spark.sql(s"ALTER TABLE $table ALTER COLUMN ${c.name} COMMENT '${q(c.description)}'")
      catch { case _: Exception =>
        val typ = spark.table(table).schema(c.name).dataType.sql
        spark.sql(s"ALTER TABLE $table CHANGE COLUMN ${c.name} ${c.name} $typ COMMENT '${q(c.description)}'")
      }
      applied += 1
    }
    applied
  }
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.materialize.{Materializer, Warehouse}
import graft.model._

/** Python-asset materialization contract (reference pkg/python/uv.go:371-482:
  * the wrapped user script calls materialize(), the result is written to a
  * columnar handoff file, and the loader applies the asset's strategy via the
  * mapping in pkg/python/materialization_mapping.go:9-31).
  *
  * Here the handoff format is parquet (Arrow-compatible on both sides): any
  * external process — a PySpark script, pandas, an ingestr job — writes the
  * handoff path; `ingest` loads it with the SAME strategy writers the SQL
  * assets use, so Python assets get merge/append/delete+insert for free.
  */
object PythonHandoff {

  /** create+replace→replace, append→append, merge→merge,
    * delete+insert→delete+insert; anything else falls back to replace. */
  def mappedStrategy(s: Option[Strategy]): Strategy = s match {
    case Some(Strategy.Append)       => Strategy.Append
    case Some(Strategy.Merge)        => Strategy.Merge
    case Some(Strategy.DeleteInsert) => Strategy.DeleteInsert
    case _                           => Strategy.CreateReplace
  }

  def readHandoff(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Ingest a handoff file into the warehouse under the asset's
    * materialization strategy. */
  def ingest(wh: Warehouse, asset: Asset, handoffPath: String): Unit = {
    val df = readHandoff(wh.spark, handoffPath)
    df.createOrReplaceTempView("__py_handoff")
    val effective = asset.copy(materialization = asset.materialization.copy(
      typ = MaterializationType.Table,
      strategy = Some(mappedStrategy(asset.materialization.strategy))))
    Materializer.execute(wh, effective, "SELECT * FROM __py_handoff")
  }
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import graft.model.Asset

/** Seed loading (reference pkg/ingestr/operator.go:440-448 scheme map,
  * :683-830 SeedOperator): a local csv/parquet/json/jsonl/ndjson/avro/orc file
  * becomes a warehouse table; declared columns cast the inferred schema.
  */
object Seeds {

  val SupportedExtensions: Set[String] = Set("csv", "parquet", "json", "jsonl", "ndjson", "avro", "orc")

  def read(spark: SparkSession, path: String): DataFrame =
    readAs(spark, path.split('.').last.toLowerCase, path)

  /** Read `path` as an explicit format (reference file_type override,
    * ingestr/operator.go:330-334). */
  def readAs(spark: SparkSession, format: String, path: String): DataFrame = {
    val ext = format.toLowerCase
    ext match {
      case "csv" =>
        spark.read.option("header", "true").option("inferSchema", "true").csv(path)
      case "parquet" => spark.read.parquet(path)
      case "json" | "jsonl" | "ndjson" =>
        // json = array-or-object documents; jsonl/ndjson = one object per line
        if (ext == "json") spark.read.option("multiLine", "true").json(path)
        else spark.read.json(path)
      case "avro" => spark.read.format("avro").load(path)
      case "orc" => spark.read.orc(path)
      case other => throw new IllegalArgumentException(s"unsupported seed format: .$other")
    }
  }

  /** Apply declared column types/order (sparse declarations keep inferred
    * types for undeclared columns, like the reference's type hints). */
  def applyColumns(df: DataFrame, asset: Asset): DataFrame =
    if (asset.columns.isEmpty) df
    else {
      val declared = asset.columns.map(c => c.name -> c.typ).toMap
      val cols = df.columns.map { name =>
        declared.get(name).filter(_.nonEmpty) match {
          case Some(t) => col(name).cast(t).as(name)
          case scala.None => col(name)
        }
      }
      df.select(cols.toSeq: _*)
    }

  /** Load the seed file for `asset` (parameters.path, resolved against
    * `baseDir`) into the warehouse under the asset's name. */
  def load(spark: SparkSession, asset: Asset, baseDir: String): DataFrame = {
    val rel = asset.parameters.getOrElse("path",
      throw new IllegalArgumentException(s"${asset.name}: seed asset needs parameters.path"))
    val path = if (rel.startsWith("/")) rel else s"$baseDir/${rel.stripPrefix("./")}"
    applyColumns(read(spark, path), asset)
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines. Spark's native
  * `sample()`/`sampleBy()` are seed-dependent on partitioning, so two runs
  * (or two engines) disagree; these operators derive the keep/split decision
  * from a portable md5 hash of the ROW ID — the same row lands in the same
  * split on any engine, any cluster size, any day. Pure projections +
  * filters: no shuffle, scan-speed at 100 TB, and fully pushdown-friendly.
  */
object Sampling {

  /** Portable per-row bucket in [0, 100): first 8 md5 hex chars of the id
    * rendered as a number. Uniform (md5), deterministic, engine-agnostic —
    * the DuckDB twin is `CAST('0x' || substr(md5(id), 1, 8) AS BIGINT) % 100`. */
  def hashBucket(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long") % 100

  /** Stratified sample: per-stratum keep-percentages (0-100). Strata missing
    * from `rates` keep `defaultRate`. A 30%-of-'en', 100%-of-'de' config is
    * `Map("en" -> 30, "de" -> 100)` — rebalancing a skewed corpus without a
    * shuffle (the classic downsample-the-head training-data move). */
  def stratified(df: DataFrame, strataCol: String, rates: Map[String, Int],
                 defaultRate: Int = 0, idCol: String = "doc_id"): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    df.where(hashBucket(col(idCol)) < rate)
  }

  /** Deterministic train/valid/test split: bucket < trainPct → train,
    * < trainPct+validPct → valid, else test. Same row, same split, forever —
    * the property that keeps eval sets uncontaminated across pipeline runs. */
  def split(df: DataFrame, trainPct: Int = 80, validPct: Int = 10,
            idCol: String = "doc_id"): DataFrame = {
    val b = hashBucket(col(idCol))
    df.withColumn("split",
      when(b < trainPct, "train")
        .when(b < trainPct + validPct, "valid")
        .otherwise("test"))
  }
}

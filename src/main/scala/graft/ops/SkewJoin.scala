package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for pathological join keys.
  *
  * AQE's skew-join split handles moderate skew automatically (enabled by
  * default); salting is the explicit tool for the degenerate case — one key
  * carrying a double-digit percentage of a 100 TB table, where a single
  * task would otherwise process the whole hot key.
  */
object SkewJoin {

  /** Salted equi-join: the big side gets a deterministic salt in
    * [0, salt) (hash of its row id — stable within a run), the small side
    * replicates `salt`×, and the join adds the salt to the key set, so a hot
    * key's rows spread across `salt` tasks instead of one. Results are
    * identical to the unsalted join; cost is small-side replication — use a
    * salt big enough to break the hot task, not more. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 salt: Int, joinType: String = "inner"): DataFrame = {
    require(salt > 0, "salt must be positive")
    // only big-side-preserving joins are salt-correct: a right/full outer
    // would surface the replicated small side `salt` times for unmatched keys
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi")(
      joinType.toLowerCase),
      s"saltedJoin supports inner/left-preserving joins, got '$joinType'")
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salt)).cast("int"))
    val saltedSmall = small
      .withColumn("__salt", explode(sequence(lit(0), lit(salt - 1))))
      .withColumn("__salt", col("__salt").cast("int"))
    saltedBig.join(saltedSmall, keys :+ "__salt", joinType).drop("__salt")
  }
}

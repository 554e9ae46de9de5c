package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.Tables

/** An oracle-checked query: a Spark program plus (optionally) the equivalent
  * ANSI SQL the driver runs in DuckDB over the same parquet tables.
  *
  * Determinism rules for hash parity with DuckDB (floating point is NOT
  * associative, so raw double SUM/AVG would differ bit-for-bit):
  *   - money/measure sums go through DECIMAL(18,4) (exact, order-independent),
  *     then CAST to DOUBLE at the end;
  *   - integer sums are CAST to BIGINT in both dialects (DuckDB widens to
  *     HUGEINT otherwise);
  *   - passthrough doubles (min/max/projection) are safe — same stored bits.
  */
final case class OQ(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object OQ {
  /** Query whose SQL text is valid in BOTH Spark SQL and DuckDB — one source
    * of truth, zero drift between engine and oracle. */
  def shared(name: String, sql: String): OQ =
    OQ(name, (s, d) => { Tables.register(s, d); s.sql(sql) }, Some(sql))

  /** Same semantics, dialect-divergent text. */
  def split(name: String, sparkSql: String, duckSql: String): OQ =
    OQ(name, (s, d) => { Tables.register(s, d); s.sql(sparkSql) }, Some(duckSql))

  /** DataFrame-API Spark side with a DuckDB oracle. */
  def df(name: String, f: (SparkSession, String) => DataFrame, duckSql: String): OQ =
    OQ(name, (s, d) => { Tables.register(s, d); f(s, d) }, Some(duckSql))

  /** Not SQL-expressible — driver records a weaker rows-only check. */
  def rowsOnly(name: String, f: (SparkSession, String) => DataFrame): OQ =
    OQ(name, (s, d) => { Tables.register(s, d); f(s, d) }, None)

  def toQueryMap(qs: Seq[OQ]): Map[String, (SparkSession, String) => DataFrame] =
    qs.map(q => q.name -> q.run).toMap

  def toOracleMap(qs: Seq[OQ]): Map[String, String] =
    qs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}

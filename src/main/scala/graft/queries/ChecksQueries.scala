package graft.queries

import graft.checks.Checks
import graft.model.{CheckValue, ColumnCheck, CustomCheck}

/** Oracle-checked runs of every quality check generator (SURVEY §2.4;
  * reference pkg/ansisql/checks.go, pkg/duckdb/checks.go). Each query executes
  * the SQL our generator emits and returns (check_name, violations); the
  * oracle re-states the check in DuckDB SQL. Columns are chosen so several
  * checks have real violations (c_acctbal goes negative, statuses include P).
  */
object ChecksQueries {

  private def checkQ(qname: String, table: String, column: String,
                     check: ColumnCheck, duck: String): OQ =
    OQ.df(qname,
      (s, _) => s.sql(Checks.buildSql(table, column, check))
        .selectExpr(s"'${check.name}' AS check_name", "violations"),
      duck)

  val notNull: OQ = checkQ("check_not_null", "customer", "c_name", ColumnCheck("not_null"),
    "SELECT 'not_null' AS check_name, count(CASE WHEN c_name IS NULL THEN 1 END) AS violations FROM customer")

  val unique: OQ = checkQ("check_unique", "lineitem", "l_orderkey", ColumnCheck("unique"),
    "SELECT 'unique' AS check_name, count(l_orderkey) - count(DISTINCT l_orderkey) AS violations FROM lineitem")

  val positive: OQ = checkQ("check_positive", "customer", "c_acctbal", ColumnCheck("positive"),
    "SELECT 'positive' AS check_name, count(CASE WHEN c_acctbal <= 0 THEN 1 END) AS violations FROM customer")

  val nonNegative: OQ = checkQ("check_non_negative", "customer", "c_acctbal", ColumnCheck("non_negative"),
    "SELECT 'non_negative' AS check_name, count(CASE WHEN c_acctbal < 0 THEN 1 END) AS violations FROM customer")

  val negative: OQ = checkQ("check_negative", "customer", "c_acctbal", ColumnCheck("negative"),
    "SELECT 'negative' AS check_name, count(CASE WHEN c_acctbal >= 0 THEN 1 END) AS violations FROM customer")

  val minCheck: OQ = checkQ("check_min", "part", "p_retailprice",
    ColumnCheck("min", Some(CheckValue.FloatVal(1000.0))),
    "SELECT 'min' AS check_name, count(CASE WHEN p_retailprice < 1000.0 THEN 1 END) AS violations FROM part")

  val maxCheck: OQ = checkQ("check_max", "part", "p_retailprice",
    ColumnCheck("max", Some(CheckValue.FloatVal(1500.0))),
    "SELECT 'max' AS check_name, count(CASE WHEN p_retailprice > 1500.0 THEN 1 END) AS violations FROM part")

  val acceptedValues: OQ = checkQ("check_accepted_values", "orders", "o_orderstatus",
    ColumnCheck("accepted_values", Some(CheckValue.ListVal(Seq(
      CheckValue.StrVal("F"), CheckValue.StrVal("O"))))),
    "SELECT 'accepted_values' AS check_name, count(CASE WHEN CAST(o_orderstatus AS STRING) NOT IN ('F', 'O') THEN 1 END) AS violations FROM orders")

  val pattern: OQ = checkQ("check_pattern", "part", "p_brand",
    ColumnCheck("pattern", Some(CheckValue.StrVal("^Brand#[0-9]+$"))),
    "SELECT 'pattern' AS check_name, count(CASE WHEN NOT regexp_matches(p_brand, '^Brand#[0-9]+$') THEN 1 END) AS violations FROM part")

  /** custom check with expected count over a wrapped query. */
  val customCount: OQ = OQ.df("check_custom_count",
    (s, _) => {
      val ck = CustomCheck("big_orders",
        "SELECT o_orderkey FROM orders WHERE o_totalprice > 100000", count = Some(0))
      val r = Checks.runCustom(s, ck)
      import s.implicits._
      Seq((r.check, r.actual)).toDF("check_name", "actual")
    },
    "SELECT 'custom:big_orders' AS check_name, count(*) AS actual FROM (SELECT o_orderkey FROM orders WHERE o_totalprice > 100000) t")

  /** custom check comparing a scalar result to `value`. */
  val customValue: OQ = OQ.df("check_custom_value",
    (s, _) => {
      val ck = CustomCheck("null_free_regions",
        "SELECT count(*) FROM region WHERE r_name IS NULL", value = Some(0))
      val r = Checks.runCustom(s, ck)
      import s.implicits._
      Seq((r.check, r.expected, r.actual, r.passed)).toDF("check_name", "expected", "actual", "passed")
    },
    """SELECT 'custom:null_free_regions' AS check_name, CAST(0 AS BIGINT) AS expected,
      |  (SELECT count(*) FROM region WHERE r_name IS NULL) AS actual, TRUE AS passed""".stripMargin)

  val all: Seq[OQ] = Seq(notNull, unique, positive, nonNegative, negative,
    minCheck, maxCheck, acceptedValues, pattern, customCount, customValue)
}

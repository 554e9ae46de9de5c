package graft.queries

import org.apache.spark.sql.functions._

/** Relational constructs the reference generates or delegates (SURVEY §2.3).
  *
  * Bruin itself executes no joins/aggregates — it generates SQL (LEFT JOIN for
  * SCD2 expiry, LEFT ANTI via NOT EXISTS for merge/datavault inserts, LAG for
  * satellites, ROW_NUMBER dedup, UNION ALL rebuilds, DISTINCT key extraction —
  * reference pkg/duckdb/materialization.go, pkg/duckdb/datavault_materialization.go,
  * pkg/ansisql/bruin_funcs.go) and hands it to the warehouse. Here Spark SQL /
  * Catalyst is that warehouse; these queries pin the semantics against DuckDB.
  *
  * Scale notes: all of these are declarative single-pass plans — Catalyst
  * pushes the filters into the parquet scan, prunes columns, picks broadcast
  * joins for the small dimensions (nation/region/customer at bench SF), and
  * AQE coalesces shuffle partitions. Nothing here collects to the driver.
  */
object Relational {

  /** TPC-H Q1-shaped pricing summary: map-side partial agg, one shuffle on the
    * (tiny) group key — at 100 TB this is the canonical "scan-heavy, agg-light"
    * plan and stays a single exchange. */
  val aggPricingSummary: OQ = OQ.shared("rel_agg_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
      |  CAST(MIN(l_extendedprice) AS DOUBLE) AS min_price,
      |  CAST(MAX(l_extendedprice) AS DOUBLE) AS max_price,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2001-06-30 00:00:00'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin)

  /** 4-way star join: fact (lineitem) joined to dims; Catalyst broadcasts the
    * small sides (customer/nation at test SF; nation/region always). */
  val joinRevenueByNation: OQ = OQ.shared("rel_join_revenue_by_nation",
    """SELECT n_name,
      |  COUNT(*) AS n_items,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders   ON l_orderkey  = o_orderkey
      |JOIN customer ON o_custkey   = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |GROUP BY n_name""".stripMargin)

  /** NOT EXISTS → left-anti join (merge-insert / datavault hub pattern,
    * reference duckdb/materialization.go:139-163). */
  val leftAntiCustomersWithoutOrders: OQ = OQ.shared("rel_left_anti",
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin)

  /** EXISTS → left-semi join. */
  val semiJoin: OQ = OQ.shared("rel_semi_join",
    """SELECT s_suppkey, s_name FROM supplier
      |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey AND l_quantity > 49)""".stripMargin)

  /** LEFT OUTER join (SCD2 expire/detect shape, materialization.go:392-519). */
  val leftJoin: OQ = OQ.shared("rel_left_join",
    """SELECT c_custkey, c_mktsegment,
      |  COALESCE(CAST(o_cnt AS BIGINT), 0) AS order_cnt
      |FROM customer
      |LEFT JOIN (SELECT o_custkey, COUNT(*) AS o_cnt FROM orders GROUP BY o_custkey) o
      |  ON c_custkey = o_custkey""".stripMargin)

  /** LAG window (datavault satellite hashdiff chain, datavault_materialization.go:167). */
  val windowLag: OQ = OQ.shared("rel_window_lag",
    """SELECT o_custkey, o_orderkey,
      |  LAG(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_orderkey
      |FROM orders""".stripMargin)

  /** ROW_NUMBER dedup (the `deduplicate` jinja macro, ansisql/bruin_funcs.go:7-65). */
  val windowDedup: OQ = OQ.shared("rel_window_dedup",
    """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity FROM (
      |  SELECT l_orderkey, l_linenumber, l_partkey, l_quantity,
      |    ROW_NUMBER() OVER (PARTITION BY l_orderkey
      |      ORDER BY l_linenumber, l_partkey, l_suppkey, l_extendedprice) AS rn
      |  FROM lineitem) t
      |WHERE rn = 1""".stripMargin)

  /** Running total window (semantic layer `running_total`, semantic-engine :526-566). */
  val windowRunningTotal: OQ = OQ.shared("rel_window_running_total",
    """SELECT o_custkey, o_orderkey,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
      |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
      |FROM orders""".stripMargin)

  /** UNION ALL + DISTINCT (SCD2 rebuild / delete+insert key extraction). */
  val unionDistinct: OQ = OQ.shared("rel_union_distinct",
    """SELECT DISTINCT side, nk FROM (
      |  SELECT 'cust' AS side, c_nationkey AS nk FROM customer
      |  UNION ALL
      |  SELECT 'supp' AS side, s_nationkey AS nk FROM supplier) u""".stripMargin)

  /** GROUP BY ROLLUP — grouping-set aggregation delegated to Catalyst. */
  val rollup: OQ = OQ.shared("rel_rollup",
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n
      |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin)

  /** GROUP BY CUBE with GROUPING() markers — the Expand operator: one scan
    * fans out to all 4 grouping sets, partial-aggregated map-side. */
  val cube: OQ = OQ.shared("rel_cube",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
      |  CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
      |  COUNT(*) AS n
      |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin)

  /** EXCEPT / INTERSECT set operators (Catalyst plans them as anti/semi
    * aggregate joins — distinct semantics, portable text). */
  val exceptIntersect: OQ = OQ.shared("rel_except_intersect",
    """SELECT 'only_cust' AS side, nk FROM (
      |  SELECT c_nationkey AS nk FROM customer
      |  EXCEPT SELECT s_nationkey FROM supplier) e
      |UNION ALL
      |SELECT 'both' AS side, nk FROM (
      |  SELECT c_nationkey AS nk FROM customer
      |  INTERSECT SELECT s_nationkey FROM supplier) i""".stripMargin)

  /** Exact continuous percentiles (profile-grade stats): Spark's
    * percentile() and DuckDB's quantile_cont() share the linear-
    * interpolation definition; rounded to absorb last-ulp arithmetic
    * differences. Exact percentile buffers each group's values — right
    * for oracle-grade determinism over bounded groups (3 here); at
    * 100 TB with high-cardinality groups use approx_percentile (t-digest,
    * constant memory) and accept the documented error bound. */
  val percentiles: OQ = OQ.split("rel_percentiles",
    """SELECT l_returnflag,
      |  round(percentile(l_quantity, 0.5), 4) AS qty_p50,
      |  round(percentile(l_quantity, 0.9), 4) AS qty_p90,
      |  round(percentile(l_extendedprice, 0.5), 4) AS price_p50
      |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    """SELECT l_returnflag,
      |  round(quantile_cont(l_quantity, 0.5), 4) AS qty_p50,
      |  round(quantile_cont(l_quantity, 0.9), 4) AS qty_p90,
      |  round(quantile_cont(l_extendedprice, 0.5), 4) AS price_p50
      |FROM lineitem GROUP BY l_returnflag""".stripMargin)

  /** RANGE window frame — value-based framing (deterministic under ties,
    * unlike ROWS), the moving-aggregate shape time-series assets use. */
  val windowRange: OQ = OQ.shared("rel_window_range",
    """SELECT l_orderkey, l_linenumber, l_quantity,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) OVER (
      |    PARTITION BY l_returnflag ORDER BY l_quantity
      |    RANGE BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS nearby_price
      |FROM lineitem WHERE l_orderkey < 1000""".stripMargin)

  /** Pivot via conditional aggregation (the `pivot` jinja macro shape,
    * bruin_funcs.go:169-175) — portable across both dialects. */
  val pivot: OQ = OQ.shared("rel_pivot",
    """SELECT o_orderpriority,
      |  COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
      |  COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
      |  COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
      |FROM orders GROUP BY o_orderpriority""".stripMargin)

  /** Top-K with deterministic tie-break — Spark plans TakeOrderedAndProject
    * (no global sort of the full relation). */
  val topK: OQ = OQ.shared("rel_topk",
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin)

  /** GROUP BY ordinal (jinja group_by(1,2) macro, bruin_funcs.go:82-101). */
  val groupByOrdinal: OQ = OQ.shared("rel_group_by_ordinal",
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n
      |FROM lineitem GROUP BY 1, 2""".stripMargin)

  /** date_spine / generate_series (bruin_funcs.go:237-500; the reference's own
    * Spark variant at :344-361 uses sequence()+explode — we do the same). */
  val dateSpine: OQ = OQ.split("rel_date_spine",
    """SELECT CAST(CAST(d AS DATE) AS STRING) AS day FROM (
      |  SELECT explode(sequence(DATE '2024-01-01', DATE '2024-03-31', interval 1 day)) AS d)""".stripMargin,
    """SELECT CAST(CAST(gs AS DATE) AS VARCHAR) AS day
      |FROM generate_series(DATE '2024-01-01', DATE '2024-03-31', INTERVAL 1 DAY) t(gs)""".stripMargin)

  /** Time-bucketed event aggregation (time_interval materialization shape +
    * `events` stream table; ts is ns in parquet, truncated to us both sides). */
  val eventDaily: OQ = OQ.shared("rel_event_daily",
    """SELECT CAST(CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS STRING) AS day, event_type,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value,
      |  COUNT(DISTINCT user_id) AS uniq_users
      |FROM events
      |WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-15 00:00:00'
      |GROUP BY 1, 2""".stripMargin)

  /** AS-OF join: each click matched to the user's latest purchase at-or-
    * before it ([[graft.ops.AsOf]] — union-and-sweep, one shuffle, no
    * inequality-join blowup). The oracle replays the same sweep with
    * DuckDB window functions; the carried payload is a struct in both
    * engines so a match is atomic. */
  val asofJoin: OQ = OQ.df("rel_asof_join",
    (s, _) => {
      import org.apache.spark.sql.functions.col
      val ev = s.table("events")
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("p_ts"),
          col("event_id").as("p_event_id"), col("value").as("p_value"))
      graft.ops.AsOf.asofJoin(clicks, purchases, Seq("user_id"), "ts", "p_ts",
        payload = Seq("p_event_id", "p_value"), tieCol = "p_event_id")
        .selectExpr("event_id", "user_id", "unix_micros(ts) AS ts_us", "value",
          "p_event_id", "p_value")
    },
    """WITH l AS (SELECT event_id, user_id, ts, value FROM events
      |  WHERE event_type = 'click'),
      |r AS (SELECT user_id, ts AS p_ts, event_id AS p_event_id, value AS p_value
      |  FROM events WHERE event_type = 'purchase'),
      |u AS (
      |  SELECT user_id, ts AS t, 1 AS tag, CAST(NULL AS BIGINT) AS tie,
      |    NULL AS r_pay,
      |    struct_pack(event_id := event_id, ts := ts, value := value) AS l_pay
      |  FROM l
      |  UNION ALL
      |  SELECT user_id, p_ts AS t, 0 AS tag, p_event_id AS tie,
      |    struct_pack(p_event_id := p_event_id, p_value := p_value) AS r_pay,
      |    NULL AS l_pay
      |  FROM r),
      |w AS (SELECT user_id, tag, l_pay,
      |  last_value(r_pay IGNORE NULLS) OVER (PARTITION BY user_id
      |    ORDER BY t, tag, tie ASC NULLS FIRST
      |    ROWS UNBOUNDED PRECEDING) AS m
      |  FROM u)
      |SELECT l_pay.event_id AS event_id, user_id, epoch_us(l_pay.ts) AS ts_us,
      |  l_pay.value AS value, m.p_event_id AS p_event_id, m.p_value AS p_value
      |FROM w WHERE tag = 1""".stripMargin)

  /** Bucketized point-in-interval range join: 25 overlapping 3-day windows
    * derived from nation keys, events counted per containing window. The
    * Spark side is [[graft.ops.RangeJoin.pointInInterval]] (equi-join on a
    * manufactured day bucket — never a nested-loop join); DuckDB's IEJoin
    * handles the BETWEEN form natively. */
  val rangeJoin: OQ = OQ.df("rel_range_join",
    (s, _) => {
      val windows = s.table("nation").select(
        col("n_nationkey").cast("long").as("win_id"),
        (to_timestamp(lit("2024-01-01 00:00:00")) +
          make_dt_interval(col("n_nationkey"))).as("win_start"),
        (to_timestamp(lit("2024-01-01 00:00:00")) +
          make_dt_interval(col("n_nationkey") + 3)).as("win_end"))
      graft.ops.RangeJoin.pointInInterval(
        s.table("events").select("event_id", "ts", "value"), windows)
        .groupBy("win_id")
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,4)")).cast("double").as("total_value"))
    },
    """WITH w AS (SELECT CAST(n_nationkey AS BIGINT) AS win_id,
      |  TIMESTAMP '2024-01-01 00:00:00' + n_nationkey * INTERVAL 1 DAY AS win_start,
      |  TIMESTAMP '2024-01-01 00:00:00' + (n_nationkey + 3) * INTERVAL 1 DAY AS win_end
      |  FROM nation)
      |SELECT win_id, count(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
      |FROM events JOIN w
      |  ON CAST(events.ts AS TIMESTAMP) >= w.win_start
      | AND CAST(events.ts AS TIMESTAMP) < w.win_end
      |GROUP BY 1""".stripMargin)

  /** Interval-overlap join between two window families (nation-derived
    * 3-day windows vs region-derived 5-day windows) — the canonical-bucket
    * emission means the oracle can be a plain inequality join. */
  val intervalOverlap: OQ = OQ.df("rel_interval_overlap",
    (s, _) => {
      val t0 = to_timestamp(lit("2024-01-01 00:00:00"))
      val l = s.table("nation").select(
        col("n_nationkey").cast("long").as("l_id"),
        (t0 + make_dt_interval(col("n_nationkey"))).as("l_start"),
        (t0 + make_dt_interval(col("n_nationkey") + 3)).as("l_end"))
      val r = s.table("region").select(
        col("r_regionkey").cast("long").as("r_id"),
        (t0 + make_dt_interval(col("r_regionkey") * 5)).as("r_start"),
        (t0 + make_dt_interval(col("r_regionkey") * 5 + 5)).as("r_end"))
      graft.ops.RangeJoin.intervalOverlap(l, r)
        .select("l_id", "r_id")
    },
    """WITH l AS (SELECT CAST(n_nationkey AS BIGINT) AS l_id,
      |  TIMESTAMP '2024-01-01 00:00:00' + n_nationkey * INTERVAL 1 DAY AS l_start,
      |  TIMESTAMP '2024-01-01 00:00:00' + (n_nationkey + 3) * INTERVAL 1 DAY AS l_end
      |  FROM nation),
      |r AS (SELECT CAST(r_regionkey AS BIGINT) AS r_id,
      |  TIMESTAMP '2024-01-01 00:00:00' + r_regionkey * 5 * INTERVAL 1 DAY AS r_start,
      |  TIMESTAMP '2024-01-01 00:00:00' + (r_regionkey * 5 + 5) * INTERVAL 1 DAY AS r_end
      |  FROM region)
      |SELECT l_id, r_id FROM l JOIN r
      |  ON l.l_start < r.r_end AND r.r_start < l.l_end""".stripMargin)

  /** Ordered 3-step funnel (view → click → purchase): first time of each
    * step strictly after the previous. The oracle replays the ladder as
    * sequential min-after CTEs — provably the same recurrence. */
  val funnel: OQ = OQ.df("rel_funnel",
    (s, _) => graft.ops.Funnel.funnel(s.table("events"),
      Seq("view", "click", "purchase")),
    """WITH s1 AS (SELECT user_id, min(epoch_us(ts)) AS t1 FROM events
      |  WHERE event_type = 'view' AND user_id IS NOT NULL AND ts IS NOT NULL
      |  GROUP BY 1),
      |s2 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t2 FROM events e
      |  JOIN s1 ON e.user_id = s1.user_id
      |  WHERE e.event_type = 'click' AND epoch_us(e.ts) > s1.t1 GROUP BY 1),
      |s3 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t3 FROM events e
      |  JOIN s2 ON e.user_id = s2.user_id
      |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s2.t2 GROUP BY 1)
      |SELECT s1.user_id,
      |  CAST(1 + CASE WHEN s2.user_id IS NULL THEN 0 ELSE 1 END
      |         + CASE WHEN s3.user_id IS NULL THEN 0 ELSE 1 END AS INT) AS stage,
      |  s1.t1 AS t1_us, s2.t2 AS t2_us, s3.t3 AS t3_us
      |FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
      |        LEFT JOIN s3 ON s2.user_id = s3.user_id""".stripMargin)

  /** Weekly cohort retention (integer epoch-weeks — portable arithmetic). */
  val retention: OQ = OQ.df("rel_retention",
    (s, _) => graft.ops.Funnel.retention(s.table("events")),
    """WITH a AS (SELECT DISTINCT user_id,
      |    CAST(epoch_us(ts) // CAST(604800000000 AS BIGINT) AS BIGINT) AS w FROM events),
      |c AS (SELECT user_id, min(w) AS cw FROM a GROUP BY 1)
      |SELECT cw AS cohort_week, a.w - cw AS week_offset,
      |  count(DISTINCT a.user_id) AS n_users
      |FROM a JOIN c ON a.user_id = c.user_id GROUP BY 1, 2""".stripMargin)

  /** Salted skew join: the [[graft.ops.SkewJoin.saltedJoin]] rewrite (fact
    * salts 8 ways, dim explodes 8 ways) aggregated to revenue by brand. The
    * oracle is the PLAIN join — re-proving every round that salting changes
    * the layout, never the answer. DECIMAL(18,4) products make the sum
    * order-independent across engines. */
  val skewSaltedJoin: OQ = OQ.df("rel_skew_salted_join",
    (s, _) => graft.ops.SkewJoin.saltedJoin(
      s.table("lineitem"),
      s.table("part").withColumnRenamed("p_partkey", "l_partkey"),
      keys = Seq("l_partkey"), salt = 8)
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_extendedprice").cast("decimal(18,4)") *
          (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)")))
          .cast("double").as("revenue")),
    """SELECT p_brand,
      |  COUNT(*) AS n_items,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand""".stripMargin)

  /** Per-group winsorization of event values ([[graft.ops.Outliers
    * .winsorize]]): interpolated p05/p95 clamp — the oracle recomputes the
    * bounds with quantile_cont and must clip the same rows. */
  val winsorize: OQ = OQ.df("rel_winsorize",
    (s, _) => graft.ops.Outliers.winsorize(
      s.table("events").where(col("value").isNotNull),
      valueCol = "value", groupCols = Seq("event_type"))
      .select(col("event_id"), col("event_type"), round(col("value"), 6).as("value"),
        col("winsorized"), col("is_clipped"), col("q_lo"), col("q_hi")),
    """WITH b AS (SELECT event_type,
      |    quantile_cont(value, 0.05) AS qlo, quantile_cont(value, 0.95) AS qhi
      |  FROM events WHERE value IS NOT NULL GROUP BY 1)
      |SELECT event_id, e.event_type, round(value, 6) AS value,
      |  round(least(greatest(value, qlo), qhi), 6) AS winsorized,
      |  (value < qlo OR value > qhi) AS is_clipped,
      |  round(qlo, 6) AS q_lo, round(qhi, 6) AS q_hi
      |FROM events e JOIN b ON e.event_type = b.event_type
      |WHERE value IS NOT NULL""".stripMargin)

  val all: Seq[OQ] = Seq(
    aggPricingSummary, joinRevenueByNation, leftAntiCustomersWithoutOrders,
    semiJoin, leftJoin, windowLag, windowDedup, windowRunningTotal,
    unionDistinct, rollup, cube, exceptIntersect, windowRange, percentiles,
    pivot, topK, groupByOrdinal, dateSpine, eventDaily, asofJoin, rangeJoin,
    intervalOverlap, funnel, retention, skewSaltedJoin, winsorize)
}

/* @bruin
name: product_stats
type: spark.sql
description: revenue per product above the configured price floor
depends:
  - raw_products
  - raw_orders
materialization:
  type: table
  strategy: create+replace
columns:
  - extends: Product.product_id
    checks: [not_null]
custom_checks:
  - name: has_rows
    query: SELECT CASE WHEN count(*) > 0 THEN 1 ELSE 0 END FROM product_stats
    value: 1
hooks:
  pre:
    - CREATE OR REPLACE TEMPORARY VIEW run_marker AS SELECT 'running' AS state
  post:
    - CREATE OR REPLACE TEMPORARY VIEW run_marker AS SELECT 'done' AS state
@bruin */
SELECT p.product_id, p.name, sum(o.qty) AS units,
  CAST(sum(o.qty * p.price) AS DECIMAL(18,2)) AS revenue
FROM raw_products p
JOIN raw_orders o ON p.product_id = o.product_id
WHERE {{ price_floor('p.price', var.min_price) }}
GROUP BY p.product_id, p.name

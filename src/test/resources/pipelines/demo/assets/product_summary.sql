/* @bruin
name: product_summary
type: duckdb.sql
depends:
  - expensive_products
materialization:
  type: table
  strategy: create+replace
@bruin */
SELECT count(*) AS n_products, min(price) AS min_price FROM expensive_products

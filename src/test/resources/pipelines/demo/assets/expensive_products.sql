/* @bruin
name: expensive_products
type: duckdb.sql
depends:
  - raw_products
materialization:
  type: table
  strategy: create+replace
columns:
  - name: product_id
    type: INT
    checks: [not_null]
  - name: price
    type: DOUBLE
    checks:
      - name: min
        value: 300
custom_checks:
  - name: has_rows
    query: SELECT count(*) FROM expensive_products
    value: 2
@bruin */
SELECT product_id, name, price FROM raw_products WHERE {{ price_filter('price', var.min_price) }}

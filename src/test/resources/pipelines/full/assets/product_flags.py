""" @bruin
name: product_flags
type: spark.python
depends:
  - product_stats
materialization:
  type: table
  strategy: create+replace
@bruin """
import os

def materialize():
    assert os.environ["GRAFT_PIPELINE"] == "full"
    return [{"product_id": 1, "flag": "hot"},
            {"product_id": 2, "flag": "warm"}]

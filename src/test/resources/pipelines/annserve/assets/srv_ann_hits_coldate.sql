/* @bruin
name: srv_ann_hits_coldate
type: spark.sql
description: float-IVF serving into a PRE-EXISTING sink that carries window_date WITHOUT being partitioned by it (a CTAS copy) — the writer must keep the column in the data but take a PLAIN append, never a partitionBy that fails the partition-spec validation
depends:
  - srv_vec_index
materialization:
  type: table
parameters:
  serve: ann
  serve_index: srv_vec_index
  serve_k: "3"
  serve_nprobe: "4"
  serve_window: "1 minute"
  serve_watermark: "1 minute"
  serve_recall_min: "1.0"
  serve_recall_sample: "10"
  source_uri: file:///tmp/graft-srv-coldate-feed
  source_stream: "true"
@bruin */
SELECT 'serving asset: hits append to srv_ann_hits_coldate; this body is not executed'

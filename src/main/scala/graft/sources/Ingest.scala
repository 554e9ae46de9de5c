package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.materialize.{Materializer, Warehouse}
import graft.model._

/** Ingestion operator — the ingestr-equivalent (reference
  * pkg/ingestr/operator.go:184-437; flag surface pkg/python/helper.go:13-201):
  * copy an external source (JDBC database or file) into the warehouse with an
  * incremental strategy, primary keys, column type hints, interval filtering
  * and column masking. The write half reuses the [[Materializer]] strategy
  * writers, exactly like the reference maps ingestr strategies onto its
  * materialization strategies (pkg/python/materialization_mapping.go:9-31).
  *
  * Asset parameters:
  *  - `source_uri`    — `jdbc:<subprotocol>://…` or a file path/URI. A file
  *                      URI may force its format with a scheme prefix
  *                      (`csv://data/x.txt`) or via `file_type`.
  *  - `source_table`  — JDBC table (or `(SELECT …) q` pushdown subquery).
  *  - `incremental_strategy` — replace | append | merge | delete+insert |
  *                      truncate+insert (reference BruinToIngestrStrategyMap).
  *  - `incremental_key`, `interval_start`, `interval_end` — source rows are
  *    filtered to key ∈ [start, end] (reference --interval-start/--interval-end).
  *  - `jdbc_*`        — passed through to the JDBC reader; at scale set
  *    `jdbc_partitionColumn`/`jdbc_lowerBound`/`jdbc_upperBound`/
  *    `jdbc_numPartitions` so the scan parallelizes instead of reading the
  *    whole table through one connection.
  *
  * Column hints come from the asset's declared columns (cast, like the
  * reference `--columns name:type`); `mask:` on a column applies hash/md5/
  * star/null before the data ever lands (reference --mask col:fn).
  */
object Ingest {

  /** reference python/materialization_mapping.go:9-31. */
  def strategyOf(name: String): Strategy = name.trim.toLowerCase match {
    case "" | "replace" | "create+replace" => Strategy.CreateReplace
    case "append"                          => Strategy.Append
    case "merge"                           => Strategy.Merge
    case "delete+insert"                   => Strategy.DeleteInsert
    case "truncate+insert"                 => Strategy.TruncateInsert
    case other =>
      throw new IllegalArgumentException(s"unknown incremental_strategy: $other")
  }

  /** Read the external source as a DataFrame (no action triggered). */
  def read(spark: SparkSession, asset: Asset, baseDir: String = "."): DataFrame = {
    val uri = asset.parameters.getOrElse("source_uri",
      throw new IllegalArgumentException(s"${asset.name}: ingest needs parameters.source_uri"))
    if (uri.startsWith("jdbc:")) {
      val table = asset.parameters.getOrElse("source_table",
        throw new IllegalArgumentException(s"${asset.name}: JDBC ingest needs parameters.source_table"))
      val reader = spark.read.format("jdbc")
        .option("url", uri).option("dbtable", table)
      val withOpts = asset.parameters.foldLeft(reader) {
        case (r, (k, v)) if k.startsWith("jdbc_") => r.option(k.stripPrefix("jdbc_"), v)
        case (r, _) => r
      }
      withOpts.load()
    } else {
      // file source; scheme prefix (csv://…) or file_type forces the format
      val (fmt, path) = uri.split("://", 2) match {
        case Array(sch, p) if Seeds.SupportedExtensions.contains(sch.toLowerCase) =>
          (Some(sch.toLowerCase), p)
        case _ => (asset.parameters.get("file_type"), uri)
      }
      // remote URIs (s3://, hdfs://, file://) pass through untouched — only
      // plain relative paths resolve against the pipeline dir
      val resolved =
        if (path.startsWith("/") || path.contains("://")) path
        else s"$baseDir/${path.stripPrefix("./")}"
      fmt match {
        case Some(f)    => Seeds.readAs(spark, f, resolved)
        case scala.None => Seeds.read(spark, resolved)
      }
    }
  }

  /** Interval filter + type hints + masking, all as one narrow projection
    * (no shuffle; filters reach the source scan via pushdown). */
  def transform(df: DataFrame, asset: Asset): DataFrame = {
    val filtered = (asset.parameters.get("incremental_key"),
                    asset.parameters.get("interval_start"),
                    asset.parameters.get("interval_end")) match {
      case (Some(k), Some(lo), Some(hi)) =>
        df.where(col(k) >= to_timestamp(lit(lo)) && col(k) <= to_timestamp(lit(hi)))
      case _ => df
    }
    masked(Seeds.applyColumns(filtered, asset), asset)
  }

  /** Column masking (reference ingestr --mask; fn per pkg/mask). */
  def masked(df: DataFrame, asset: Asset): DataFrame =
    asset.columns.filter(_.mask.nonEmpty).foldLeft(df) { (d, c) =>
      val m = c.mask.toLowerCase match {
        case "hash"  => sha2(col(c.name).cast("string"), 256)
        case "md5"   => md5(col(c.name).cast("string"))
        case "star"  => when(col(c.name).isNull, lit(null)).otherwise(lit("****"))
        case "null"  => lit(null).cast("string")
        case other   => throw new IllegalArgumentException(s"unknown mask function: $other")
      }
      d.withColumn(c.name, m)
    }

  /** A broker-backed `source_uri`, when the asset is one (reference
    * pkg/ingestr/operator.go:596-640 routes kafka/kinesis URIs to the
    * streaming path). Routing rule, backward-compatible with the batch
    * file reader:
    *  - `jdbc:` and format-prefixed (`csv://…`) URIs are always batch;
    *  - a `<scheme>+cdc://` URI always streams (CDC is stream-only);
    *  - a plain `file://` URI stays batch unless `source_stream: true`
    *    opts in (the file scheme doubles as the broker stand-in);
    *  - any other registered stream scheme (`kafka://`, …) streams.
    */
  def brokerResolved(asset: Asset): Option[graft.streaming.StreamSources.Resolved] =
    asset.parameters.get("source_uri")
      .filterNot(_.startsWith("jdbc:"))
      .flatMap(uri => uri.split("://", 2) match {
        case Array(s, _) => Some((uri, s.toLowerCase))
        case _           => scala.None
      })
      .flatMap { case (uri, scheme) =>
        val cdc = scheme.endsWith("+cdc")
        val base = scheme.stripSuffix("+cdc")
        val streamRequested = cdc ||
          asset.parameters.get("source_stream").exists(_.equalsIgnoreCase("true"))
        if (Seeds.SupportedExtensions.contains(base)) scala.None
        else if (base == "file" && !streamRequested) scala.None
        else if (streamRequested || KnownBrokerSchemes.contains(base))
          // streaming was asked for by name — a missing connector must
          // surface the registry's "registered schemes" error, not fall
          // into the batch file reader's "no filesystem for scheme kafka"
          Some(graft.streaming.StreamSources.forUri(uri))
        else
          // unknown scheme: could be a registered custom broker (streams)
          // or a remote filesystem like s3:// (batch passthrough)
          scala.util.Try(graft.streaming.StreamSources.forUri(uri)).toOption
      }

  /** Schemes that are broker addresses by definition — even when the
    * matching connector jar is absent (so the error names the gap). */
  private val KnownBrokerSchemes = Set("kafka", "kinesis")

  /** DDL for the broker value decoder: explicit `record_ddl` param, else
    * derived from the asset's declared columns (the reference derives the
    * record shape from `--columns name:type` the same way). */
  private def recordDdlOf(asset: Asset): String =
    asset.parameters.get("record_ddl").getOrElse {
      val typed = asset.columns.filter(_.typ.nonEmpty)
      require(typed.nonEmpty,
        s"${asset.name}: broker ingest needs record_ddl or typed columns to decode values")
      typed.map(c => s"${c.name} ${c.typ}").mkString(", ")
    }

  /** Streaming ingest: broker source → (envelope decode) → transform →
    * CDC fold or per-micro-batch strategy write. The default (no
    * `foreground`) runs with Trigger.AvailableNow semantics — drain what
    * the broker has, then return — which is exactly the reference's
    * scheduled-ingestr contract (each `bruin run` copies the source's
    * current state). `foreground = true` is the `run --stream` mode: the
    * asset's `flush_interval` becomes a ProcessingTime trigger and the
    * call blocks until the query is stopped or the process interrupted
    * (reference cmd/run.go:918-946). */
  /** The asset as the Materializer sees it: table-typed, with the ingestr
    * strategy and incremental key resolved from parameters. Shared by the
    * batch and streaming paths so strategy resolution cannot diverge. */
  private def effectiveIngestAsset(asset: Asset): Asset = {
    val strategy = strategyOf(asset.parameters.getOrElse("incremental_strategy", "replace"))
    asset.copy(materialization = asset.materialization.copy(
      typ = MaterializationType.Table,
      strategy = Some(strategy),
      incrementalKey = asset.parameters.get("incremental_key")
        .orElse(asset.materialization.incrementalKey)))
  }

  def runStream(wh: Warehouse, asset: Asset,
                resolved: graft.streaming.StreamSources.Resolved,
                ctx: Materializer.Context = Materializer.Context(),
                foreground: Boolean = false): Unit = {
    import graft.streaming.Streams
    val raw = resolved.source.load(wh.spark, resolved.uri,
      Streams.sourceOptionsFor(asset.parameters))
    // a kafka-shaped frame needs its value column decoded; an already-typed
    // frame (the file stand-in, a pre-decoded custom source) passes through
    val typed =
      if (!Streams.isBrokerEnvelope(raw)) raw
      else if (resolved.cdc) Streams.debeziumDecode(raw, recordDdlOf(asset))
      else Streams.decodeJsonValue(raw, recordDdlOf(asset))
    val df = transform(typed, asset)
    val trigger =
      if (foreground) Streams.triggerFor(asset.parameters)
      else org.apache.spark.sql.streaming.Trigger.AvailableNow()
    if (resolved.cdc) {
      Streams.cdcApply(wh, asset, df, trigger = trigger).awaitTermination()
    } else {
      val effective = effectiveIngestAsset(asset)
      // a whole-table strategy (replace/truncate+insert) on a STREAM means
      // "this run's result replaces the table", not "every micro-batch
      // does": batch 0 replaces, later batches of the same run append —
      // otherwise each trigger would silently delete everything the
      // previous one landed
      val isFullCopy = effective.materialization.strategy match {
        case Some(Strategy.CreateReplace) | Some(Strategy.TruncateInsert) => true
        case _ => false
      }
      val perBatch: (Asset, Long) => Asset =
        if (!isFullCopy) (a, _) => a
        else (a, batchId) =>
          if (batchId == 0L) a
          else a.copy(materialization = a.materialization.copy(
            strategy = Some(Strategy.Append)))
      // INCREMENTAL strategies (append/merge/delete+insert) track broker
      // offsets in a persistent per-asset checkpoint: a scheduled re-run
      // resumes from committed offsets instead of re-draining the topic
      // and duplicating every previously landed row. Full-copy strategies
      // (replace/truncate+insert) deliberately re-drain — "each run copies
      // current state" — so they get no checkpoint AT ALL, not even an
      // explicit `checkpoint_location`: a persisted offset log makes a
      // re-run resume with batchId > 0, every batch maps to Append, and
      // the promised replace silently never happens (worse, the "copy"
      // would then hold only the delta since the last run). The two
      // contracts are mutually exclusive, so the parameter is ignored
      // with a warning rather than honored into corruption.
      val cpOpt =
        if (isFullCopy) {
          asset.parameters.get("checkpoint_location").foreach { loc =>
            System.err.println(s"graft: ${asset.name}: ignoring " +
              s"checkpoint_location=$loc — a full-copy strategy " +
              "(replace/truncate+insert) re-drains the source every run; " +
              "a persistent checkpoint would turn the replace into an " +
              "append of the delta. Use an incremental strategy to resume " +
              "from offsets.")
          }
          scala.None
        } else asset.parameters.get("checkpoint_location").orElse {
          // keep the warehouse dir's URI intact (hdfs://, s3a://, file:) —
          // same scheme-preserving concat as runAppendToTable; the wipe
          // below goes through the Hadoop FS so any scheme works
          val cp = wh.spark.conf.get("spark.sql.warehouse.dir") +
            s"/_graft_checkpoints/ingest_${asset.name.replace('.', '_')}"
          // committed offsets with the sink table GONE = a stale checkpoint
          // (e.g. the table was dropped for a rebuild): wipe it so the
          // rebuild re-drains from earliest instead of landing zero rows
          if (!wh.exists(asset.name)) {
            val p = new org.apache.hadoop.fs.Path(cp)
            val fs = p.getFileSystem(wh.spark.sessionState.newHadoopConf())
            if (fs.exists(p)) fs.delete(p, true)
          }
          Some(cp)
        }
      val writer = df.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
          Materializer.executeDf(wh, perBatch(effective, batchId), batch, ctx)
        }
        .trigger(trigger)
      cpOpt.foreach(writer.option("checkpointLocation", _))
      val q = writer.start()
      q.awaitTermination()
    }
  }

  /** Full ingest: read → transform → strategy write via the Materializer.
    * Broker-backed sources route through the streaming path instead. */
  def run(wh: Warehouse, asset: Asset, baseDir: String = ".",
          ctx: Materializer.Context = Materializer.Context()): Unit =
    brokerResolved(asset) match {
      case Some(r) => runStream(wh, asset, r, ctx)
      case scala.None =>
        val df = transform(read(wh.spark, asset, baseDir), asset)
        Materializer.executeDf(wh, effectiveIngestAsset(asset), df, ctx)
    }
}

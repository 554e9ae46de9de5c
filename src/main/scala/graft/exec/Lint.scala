package graft.exec

import org.apache.spark.sql.SparkSession
import graft.model._

/** Validation rules (reference pkg/lint/list.go:32-371, rules.go — the
  * high-value subset) + analyze-only dry-run (pkg/query/dryrun.go).
  */
object Lint {

  /** `severity`: "error" fails runs/lint; "warning" is reported but not
    * fatal (reference has warning-level rules — forward-compatible header
    * keys must not abort pipelines that ran before the rule existed). */
  final case class Issue(rule: String, asset: String, message: String,
                         severity: String = "error") {
    // closed set — a typo'd severity must not silently fail open
    require(severity == "error" || severity == "warning",
      s"unknown severity '$severity'")
    def isError: Boolean = severity == "error"
  }

  private val ValidName = """^[a-zA-Z0-9_\-\.]+$""".r
  private val KnownChecks = Set("not_null", "unique", "positive", "non_negative",
    "negative", "min", "max", "accepted_values", "pattern")

  private val KnownAssetTypes = Set(AssetType.SparkSql, AssetType.SparkPython,
    AssetType.Ingest, AssetType.Seed, AssetType.SensorQuery, AssetType.SensorTable,
    AssetType.Empty)
  private val KnownSchedules = Set("", "continuous", "hourly", "daily", "weekly", "monthly")
  private val KnownStrategyNames = Set("", "replace", "create+replace", "append",
    "merge", "delete+insert", "truncate+insert")

  def validate(pipeline: Pipeline,
               environment: Option[graft.config.Environment] = scala.None,
               glossary: Option[Glossary] = scala.None,
               /** when present, hook + custom-check SQL is analyze-dry-run
                 * (reference hook-query-dry-run / custom-check-query-dry-run;
                 * needs a session, so plain lint stays warehouse-free). */
               spark: Option[SparkSession] = scala.None,
               /** user macro files prelude — dry-run renders with the SAME
                 * prelude the runner prepends, else project-macro hooks
                 * would falsely fail to parse. */
               macroPrelude: String = ""): Seq[Issue] = {
    val issues = scala.collection.mutable.ArrayBuffer[Issue]()
    val names = pipeline.assets.map(_.name)

    def lintNotifications(n: Notifications, asset: String): Unit = {
      val channels = n.slack.map(_.stripPrefix("#"))
      channels.filter(_.isEmpty).foreach { _ =>
        issues += Issue("valid-notifications", asset, "slack channel is empty")
      }
      channels.filter(_.nonEmpty).groupBy(identity).filter(_._2.size > 1).keys.foreach { c =>
        issues += Issue("valid-notifications", asset, s"slack channel '#$c' repeated")
      }
      n.emails.filter(_.isEmpty).foreach { _ =>
        issues += Issue("valid-notifications", asset, "email notification has no recipients")
      }
      n.emails.flatten.filter(r => r.trim.isEmpty || !r.contains('@')).foreach { r =>
        issues += Issue("valid-notifications", asset, s"bad email recipient '$r'")
      }
      n.emails.map(_.map(_.trim).sorted).groupBy(identity)
        .filter(_._2.size > 1).keys.foreach { g =>
          issues += Issue("valid-notifications", asset,
            s"email recipient group repeated: ${g.mkString(", ")}")
        }
    }
    lintNotifications(pipeline.notifications, "")
    pipeline.unknownFields.foreach { k =>
      issues += Issue("unknown-pipeline-fields", "", s"unknown pipeline.yml key '$k'",
        severity = "warning")
    }

    // variables schema + variants (reference valid-variables)
    Variables.validate(pipeline).foreach(m => issues += Issue("valid-variables", "", m))

    // pipeline-level rules (reference list.go valid-pipeline-*)
    if (pipeline.name.isEmpty || ValidName.findFirstIn(pipeline.name).isEmpty)
      issues += Issue("valid-pipeline-name", "", s"invalid pipeline name '${pipeline.name}'")
    val cronOk = {
      val fields = pipeline.schedule.trim.split("\\s+")
      (fields.length == 5 || fields.length == 6) &&
        fields.forall(_.matches("""[\dA-Za-z*,/\-]+""")) // MON/JAN names allowed
    }
    if (!KnownSchedules.contains(pipeline.schedule) &&
        !pipeline.schedule.matches("""^@\w+$""") && !cronOk)
      issues += Issue("valid-pipeline-schedule", "",
        s"schedule '${pipeline.schedule}' is neither a named schedule nor cron")
    if (pipeline.startDate.nonEmpty &&
        scala.util.Try(java.time.LocalDate.parse(pipeline.startDate.take(10))).isFailure)
      issues += Issue("valid-pipeline-start-date", "",
        s"start_date '${pipeline.startDate}' is not a date")
    if (pipeline.concurrency < 1)
      issues += Issue("valid-pipeline-concurrency", "",
        s"concurrency must be >= 1, got ${pipeline.concurrency}")

    // duplicate asset names
    names.groupBy(identity).filter(_._2.size > 1).keys.foreach { n =>
      issues += Issue("asset-name-unique", n, s"asset '$n' defined more than once")
    }
    val nameSet = names.toSet

    pipeline.assets.foreach { a =>
      if (ValidName.findFirstIn(a.name).isEmpty)
        issues += Issue("task-name-valid", a.name, s"invalid asset name '${a.name}'")

      // dependency-exists (uri/symbolic upstreams are external by design)
      a.upstreams.filter(u => u.typ == "asset" && !u.isSymbolic).foreach { u =>
        if (!nameSet.contains(u.value))
          issues += Issue("dependency-exists", a.name, s"upstream '${u.value}' is not in the pipeline")
      }
      // cross-pipeline uri dependencies must be scheme-qualified with a
      // non-empty scheme AND path (reference cross-pipeline-uri-dependencies)
      a.upstreams.filter(_.typ == "uri").foreach { u =>
        if (!u.value.matches("[A-Za-z][A-Za-z0-9+.-]*://.+"))
          issues += Issue("cross-pipeline-uri-dependencies", a.name,
            s"uri dependency '${u.value}' is not a scheme-qualified uri")
      }

      // duplicate column names
      a.columns.groupBy(_.name).filter(_._2.size > 1).keys.foreach { c =>
        issues += Issue("duplicate-column-names", a.name, s"column '$c' declared twice")
      }

      // materialization-config
      val mat = a.materialization
      mat.strategy.foreach {
        case Strategy.DeleteInsert | Strategy.TimeInterval if mat.incrementalKey.isEmpty =>
          issues += Issue("materialization-config", a.name,
            s"strategy ${mat.strategy.get.name} requires incremental_key")
        case Strategy.Merge | Strategy.SCD2ByColumn if a.primaryKeys.isEmpty =>
          issues += Issue("materialization-config", a.name,
            s"strategy ${mat.strategy.get.name} requires primary_key columns")
        case Strategy.SCD2ByTime if a.primaryKeys.isEmpty || mat.incrementalKey.isEmpty =>
          issues += Issue("materialization-config", a.name,
            "scd2_by_time requires primary_key columns and incremental_key")
        case Strategy.DDL if a.columns.isEmpty =>
          issues += Issue("materialization-config", a.name, "ddl strategy requires declared columns")
        case _ => ()
      }
      if (mat.strategy.nonEmpty && mat.typ != MaterializationType.Table)
        issues += Issue("materialization-config", a.name,
          "strategy requires materialization type: table")

      // check validity
      a.columns.foreach { c =>
        c.checks.foreach { ck =>
          if (!KnownChecks.contains(ck.name))
            issues += Issue("check-valid", a.name, s"unknown check '${ck.name}' on ${c.name}")
          if (Set("min", "max", "accepted_values", "pattern")(ck.name) && ck.value.isEmpty)
            issues += Issue("check-valid", a.name, s"check '${ck.name}' on ${c.name} needs a value")
        }
      }

      // seed config
      if (a.assetType == AssetType.Seed && !a.parameters.contains("path"))
        issues += Issue("valid-seed", a.name, "seed asset requires parameters.path")

      // asset type + name shape
      if (!KnownAssetTypes.contains(a.assetType))
        issues += Issue("valid-task-type", a.name, s"unknown asset type '${a.assetType}'")
      if (a.name.split('.').length > 3)
        issues += Issue("asset-name-component-count", a.name,
          "asset name has more than 3 dot-separated components")

      // executable content (reference valid-executable-file)
      if ((a.assetType == AssetType.SparkSql || a.assetType == AssetType.SensorQuery) &&
          a.content.trim.isEmpty)
        issues += Issue("valid-executable-file", a.name, "asset has no SQL content")
      if (a.assetType == AssetType.SparkPython &&
          a.content.trim.isEmpty && !a.parameters.contains("path"))
        issues += Issue("valid-executable-file", a.name,
          "python asset needs a script body or parameters.path")

      // ingest config (reference valid-ingestr)
      if (a.assetType == AssetType.Ingest) {
        if (!a.parameters.contains("source_uri") && !a.parameters.contains("source_connection"))
          issues += Issue("valid-ingestr", a.name,
            "ingest asset requires source_uri or source_connection")
        val strat = a.parameters.getOrElse("incremental_strategy", "")
        if (!KnownStrategyNames.contains(strat))
          issues += Issue("valid-ingestr", a.name, s"unknown incremental_strategy '$strat'")
        if (strat == "merge" && a.primaryKeys.isEmpty)
          issues += Issue("valid-ingestr", a.name, "merge ingestion requires primary_key columns")
        if (strat == "delete+insert" && !a.parameters.contains("incremental_key"))
          issues += Issue("valid-ingestr", a.name, "delete+insert ingestion requires incremental_key")
      }

      // retrieval-serving config (`serve:` assets, graft.exec.Serving) —
      // every runtime require() in Serving.run has a lint twin here, so a
      // misdeclared serving asset fails at `graft lint` like every other
      // asset class instead of at stream start (reference precedent: the
      // materialization-config rules, pkg/lint/rules.go)
      a.parameters.get("serve").foreach { kind =>
        if (!Serving.Kinds.contains(kind))
          issues += Issue("valid-serve", a.name,
            s"unknown serve '$kind' (supported: ${Serving.Kinds.toSeq.sorted.mkString(", ")})")
        if (!a.parameters.contains("serve_index"))
          issues += Issue("valid-serve", a.name, s"serve: $kind requires parameter 'serve_index'")
        if (kind == "rerank" && !a.parameters.contains("serve_corpus"))
          issues += Issue("valid-serve", a.name,
            "serve: rerank requires parameter 'serve_corpus' (stage-2 float vectors)")
        // the streaming query feed: same resolution rule Serving/Ingest use
        a.parameters.get("source_uri") match {
          case scala.None =>
            issues += Issue("valid-serve", a.name,
              "serving asset needs a streaming query feed — set source_uri " +
                "(file:///path with source_stream: \"true\", or a broker scheme)")
          case Some(uri) =>
            val scheme = uri.split("://", 2) match {
              case Array(s, _) => s.toLowerCase; case _ => ""
            }
            if (scheme.endsWith("+cdc"))
              issues += Issue("valid-serve", a.name, "a CDC feed cannot drive retrieval serving")
            else if (scheme == "file" &&
                !a.parameters.get("source_stream").exists(_.equalsIgnoreCase("true")))
              issues += Issue("valid-serve", a.name,
                "file:// query feed requires source_stream: \"true\" (a batch file is not a feed)")
            else if (scheme.isEmpty)
              issues += Issue("valid-serve", a.name,
                s"source_uri '$uri' is not a scheme-qualified uri")
        }
        Seq("serve_k", "serve_nprobe", "serve_shortlist", "serve_max_hamming",
            "serve_recall_sample", "serve_recall_every").foreach { kk =>
          a.parameters.get(kk).foreach { v =>
            if (scala.util.Try(v.trim.toInt).toOption.forall(_ < 1))
              issues += Issue("valid-serve", a.name, s"$kk must be a positive integer, got '$v'")
          }
        }
        a.parameters.get("serve_recall_sample")
          .flatMap(v => scala.util.Try(v.trim.toInt).toOption)
          .filter(_ > graft.ops.Similarity.MaxRecallSample).foreach { v =>
            issues += Issue("valid-serve", a.name,
              s"serve_recall_sample $v exceeds the bounded-sample cap " +
                s"${graft.ops.Similarity.MaxRecallSample}")
          }
        // the recall monitor reads the `<asset>_recall_feed` capture the
        // serving run itself writes — any feed scheme (file or broker) is
        // monitorable. But an `ann` serve with NO declared float corpus
        // falls back to grading against the SAME index artifact, which is
        // blind to index coverage loss — name the weaker guarantee.
        if (a.parameters.contains("serve_recall_min") && kind == "ann" &&
            !a.parameters.contains("serve_recall_corpus") &&
            !a.parameters.contains("serve_corpus"))
          issues += Issue("valid-serve", a.name,
            "ann recall baseline falls back to full-probe over the SAME " +
              "index — blind to index coverage loss; declare " +
              "serve_recall_corpus for an exact corpus baseline",
            severity = "warning")
        a.parameters.get("serve_recall_min").foreach { v =>
          val d = scala.util.Try(v.trim.toDouble).toOption
          if (d.forall(x => x < 0.0 || x > 1.0))
            issues += Issue("valid-serve", a.name, s"serve_recall_min must be in [0, 1], got '$v'")
        }
        if (a.parameters.contains("serve_recall_min") && kind == "ivfadc" &&
            !a.parameters.contains("serve_recall_corpus") && !a.parameters.contains("serve_corpus"))
          issues += Issue("valid-serve", a.name,
            "recall monitoring over ivfadc needs serve_recall_corpus (the PQ index " +
              "has no float vectors to re-score exactly)")
        if (a.parameters.contains("serve_recall_min") && kind == "hamming" &&
            !a.parameters.contains("serve_recall_corpus"))
          issues += Issue("valid-serve", a.name,
            "recall monitoring over hamming needs serve_recall_corpus (the banded " +
              "index is a complete route by pigeonhole — it can never grade its " +
              "own coverage)")
        // query-drift monitor twins (Serving.driftMonitor's requires)
        a.parameters.get("serve_drift_max_psi").foreach { v =>
          if (scala.util.Try(v.trim.toDouble).toOption.forall(_ <= 0.0))
            issues += Issue("valid-serve", a.name,
              s"serve_drift_max_psi must be a positive number, got '$v'")
          // the hamming tier's drift reference is the signature index's own
          // population — no corpus declaration needed
          if (kind != "hamming" &&
              !Seq("serve_drift_ref", "serve_recall_corpus", "serve_corpus")
                .exists(a.parameters.contains))
            issues += Issue("valid-serve", a.name,
              "drift monitoring needs a reference corpus — declare serve_drift_ref " +
                "(or serve_recall_corpus / serve_corpus)")
          // ...and for the same reason the vector-tier drift knobs are
          // IGNORED on hamming: a declared reference would never be what
          // the gate actually grades against — warn instead of silently
          // accepting a threshold tuned to the wrong distribution
          if (kind == "hamming")
            Seq("serve_drift_ref", "serve_drift_dirs", "serve_drift_buckets")
              .filter(a.parameters.contains).foreach { k =>
                issues += Issue("valid-serve", a.name,
                  s"$k is ignored on a hamming serve asset — per-bit drift " +
                    "grades against the signature index's own population " +
                    "(each bit is a direction, shares are binary)",
                  severity = "warning")
              }
        }
        a.parameters.get("serve_drift_buckets").foreach { v =>
          if (scala.util.Try(v.trim.toInt).toOption.forall(_ < 2))
            issues += Issue("valid-serve", a.name,
              s"serve_drift_buckets must be an integer >= 2, got '$v'")
        }
        a.parameters.get("serve_drift_dirs").foreach { v =>
          if (scala.util.Try(v.trim.toInt).toOption.forall(_ < 1))
            issues += Issue("valid-serve", a.name,
              s"serve_drift_dirs must be a positive integer, got '$v'")
        }
      }

      // sensor config (reference valid-table-sensor-table / valid-sensor-timeout)
      if (a.assetType == AssetType.SensorTable &&
          !a.parameters.contains("table") && a.content.trim.isEmpty)
        issues += Issue("valid-table-sensor-table", a.name, "table sensor needs parameters.table")
      a.parameters.get("mode").foreach { m =>
        if ((a.assetType == AssetType.SensorQuery || a.assetType == AssetType.SensorTable) &&
            !Set("skip", "once", "wait")(m))
          issues += Issue("valid-sensor-mode", a.name, s"unknown sensor mode '$m'")
      }

      // numeric execution knobs (reference valid-timeout)
      Seq("timeout", "rerun_cooldown", "retries").foreach { k =>
        a.parameters.get(k).foreach { v =>
          if (scala.util.Try(v.toLong).toOption.forall(_ < 0))
            issues += Issue("valid-timeout", a.name, s"$k must be a non-negative number, got '$v'")
        }
      }

      // interval modifiers parse (reference valid-time-interval shape)
      Seq(a.intervalModifiers.start, a.intervalModifiers.end).flatten.foreach { m =>
        if (scala.util.Try(IntervalModifiers.shift(java.time.LocalDateTime.now, m)).isFailure)
          issues += Issue("valid-interval-modifiers", a.name, s"bad interval modifier '$m'")
      }

      // custom checks (reference custom-check-query-exists)
      a.customChecks.groupBy(_.name).filter(_._2.size > 1).keys.foreach { n =>
        issues += Issue("custom-check-name-unique", a.name, s"custom check '$n' defined twice")
      }
      a.customChecks.filter(_.query.trim.isEmpty).foreach { c =>
        issues += Issue("custom-check-query-exists", a.name,
          s"custom check '${c.name}' has no query")
      }

      // duplicate tags
      a.tags.groupBy(identity).filter(_._2.size > 1).keys.foreach { t =>
        issues += Issue("duplicate-tags", a.name, s"tag '$t' repeated")
      }

      // typo'd header keys (reference unknown-asset-fields) — warning, not
      // error: forward-compatible metadata must not abort existing runs
      a.unknownFields.foreach { k =>
        issues += Issue("unknown-asset-fields", a.name, s"unknown asset header key '$k'",
          severity = "warning")
      }

      // criticality tier 1..5 (reference valid-asset-tier, rules.go:62)
      if (a.tier != 0 && (a.tier < 1 || a.tier > 5))
        issues += Issue("valid-asset-tier", a.name,
          s"tier must be between 1 and 5, got ${a.tier}")

      // notification targets (reference valid-pipeline/asset-notifications)
      lintNotifications(a.notifications, a.name)

      // analyze-only dry-run of hook + custom-check SQL (reference
      // hook-query-dry-run / custom-check-query-dry-run); parse errors only —
      // unresolved tables are expected before the pipeline ever ran
      spark.foreach { s =>
        // render with a placeholder context first — hooks/checks are templates
        val ctx = graft.render.Template.context(
          java.time.LocalDateTime.of(2024, 1, 1, 0, 0),
          java.time.LocalDateTime.of(2024, 1, 2, 0, 0),
          executionDate = java.time.LocalDateTime.of(2024, 1, 1, 0, 0),
          pipelineName = pipeline.name, runId = "lint",
          thisAsset = a.name, vars = pipeline.variables)
        def parses(sql: String): Boolean = scala.util.Try {
          s.sessionState.sqlParser.parsePlan(
            graft.render.Template.render(macroPrelude + sql, ctx))
        }.isSuccess
        (a.hooks.pre ++ a.hooks.post).filterNot(parses).foreach { h =>
          issues += Issue("hook-query-dry-run", a.name, s"hook does not parse: $h")
        }
        a.customChecks.filter(c => c.query.trim.nonEmpty && !parses(c.query)).foreach { c =>
          issues += Issue("custom-check-query-dry-run", a.name,
            s"custom check '${c.name}' query does not parse")
        }
      }

      // secrets (reference secret-mapping-key-exists)
      a.secrets.groupBy(_.injectAs).filter(_._2.size > 1).keys.foreach { k =>
        issues += Issue("secret-mapping-unique", a.name, s"secret injected twice as '$k'")
      }
      environment.foreach { env =>
        a.secrets.filter(s => env.connection(s.key).isEmpty).foreach { s =>
          issues += Issue("secret-mapping-key-exists", a.name,
            s"secret '${s.key}' not found in environment '${env.name}'")
        }
      }

      // glossary entity references (reference valid-entity-references)
      a.columns.filter(_.extendsRef.nonEmpty).foreach { c =>
        c.extendsRef.split("\\.", 2) match {
          case Array(en, an) =>
            glossary match {
              case Some(g) if g.entity(en).isEmpty =>
                issues += Issue("valid-entity-references", a.name,
                  s"entity '$en' not found in glossary")
              case Some(g) if !g.entity(en).get.attributes.contains(an) =>
                issues += Issue("valid-entity-references", a.name,
                  s"attribute '$an' not found in entity '$en'")
              case scala.None =>
                issues += Issue("valid-entity-references", a.name,
                  s"column extends '${c.extendsRef}' but no glossary file exists")
              case _ => ()
            }
          case _ =>
            issues += Issue("valid-entity-references", a.name,
              s"bad extends reference '${c.extendsRef}' (want Entity.Attribute)")
        }
      }
    }

    // acyclic-pipeline
    issues ++= findCycle(pipeline).map(c =>
      Issue("acyclic-pipeline", c.head, s"dependency cycle: ${c.mkString(" -> ")}"))

    issues.toSeq
  }

  private def findCycle(pipeline: Pipeline): Option[Seq[String]] = {
    val names = pipeline.assets.map(_.name).toSet
    val edges = pipeline.assets.map(a => a.name -> a.dependsOn.filter(names)).toMap
    val color = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)
    val stack = scala.collection.mutable.ArrayBuffer[String]()
    def dfs(n: String): Option[Seq[String]] = {
      color(n) = 1; stack += n
      val hit = edges.getOrElse(n, Nil).view.flatMap { m =>
        if (color(m) == 1) Some(stack.dropWhile(_ != m).toSeq :+ m)
        else if (color(m) == 0) dfs(m)
        else scala.None
      }.headOption
      color(n) = 2; stack.remove(stack.length - 1)
      hit
    }
    pipeline.assets.view.flatMap(a => if (color(a.name) == 0) dfs(a.name) else scala.None).headOption
  }

  /** Dry-run: analyze the rendered query without executing (Catalyst resolves
    * tables/columns/types — the Spark analogue of EXPLAIN-based validation). */
  def dryRun(spark: SparkSession, sql: String): Either[String, Unit] =
    try { spark.sql(sql).queryExecution.analyzed; Right(()) }
    catch { case e: Throwable => Left(e.getMessage) }
}

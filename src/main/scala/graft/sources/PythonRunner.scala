package graft.sources

import java.nio.file.{Files, Path, Paths}
import graft.config.Environment
import graft.materialize.{Materializer, Warehouse}
import graft.model._
import graft.render.Template

/** Python asset runner (reference pkg/python/uv.go:371-482): wrap the user
  * script, call its `materialize()`, persist the result to a handoff file,
  * and load it through the same strategy writers SQL assets use
  * (strategy map pkg/python/materialization_mapping.go:9-31).
  *
  * Contract with the subprocess:
  *  - the template context is exported as `GRAFT_*` env vars (reference
  *    BRUIN_* contract, pkg/jinja/jinja.go:96-119);
  *  - asset `secrets:` inject environment connections as JSON env vars
  *    (reference python/operator.go:152-182);
  *  - `materialize()` may return a list of dicts or a pandas DataFrame; the
  *    wrapper writes JSON-lines with stdlib-only code so user environments
  *    need no extra packages, and Spark reads the handoff natively. A script
  *    with no materialize() runs for its side effects only.
  */
object PythonRunner {

  /** The wrapper executed by the interpreter ($SCRIPT / $OUT substituted). */
  private val WrapperTemplate =
    """import importlib.util, json, os, sys, datetime, decimal
      |
      |spec = importlib.util.spec_from_file_location("graft_asset", r"$SCRIPT")
      |mod = importlib.util.module_from_spec(spec)
      |spec.loader.exec_module(mod)
      |
      |if hasattr(mod, "materialize"):
      |    result = mod.materialize()
      |    if result is None:
      |        rows = []  # file still written: empty result replaces stale data
      |    elif hasattr(result, "to_dict"):  # pandas DataFrame
      |        rows = result.to_dict("records")
      |    elif isinstance(result, list):
      |        rows = result
      |    else:
      |        raise TypeError("materialize() must return a list of dicts or a DataFrame, got %r" % type(result))
      |    def _default(o):
      |        if isinstance(o, (datetime.date, datetime.datetime)):
      |            return o.isoformat(sep=" ")
      |        if isinstance(o, decimal.Decimal):
      |            return float(o)
      |        return str(o)
      |    with open(r"$OUT", "w") as f:
      |        for r in rows:
      |            f.write(json.dumps(r, default=_default))
      |            f.write("\n")
      |""".stripMargin

  /** GRAFT_* env contract (reference BRUIN_*, jinja.go:96-119). */
  def envVars(tplCtx: Template.Ctx): Map[String, String] = {
    def s(k: String): String = String.valueOf(tplCtx.getOrElse(k, ""))
    Map(
      "GRAFT_START_DATE" -> s("start_date"),
      "GRAFT_START_DATETIME" -> s("start_datetime"),
      "GRAFT_START_TIMESTAMP" -> s("start_timestamp"),
      "GRAFT_END_DATE" -> s("end_date"),
      "GRAFT_END_DATETIME" -> s("end_datetime"),
      "GRAFT_END_TIMESTAMP" -> s("end_timestamp"),
      "GRAFT_EXECUTION_DATE" -> s("execution_date"),
      "GRAFT_EXECUTION_DATETIME" -> s("execution_datetime"),
      "GRAFT_EXECUTION_TIMESTAMP" -> s("execution_timestamp"),
      "GRAFT_RUN_ID" -> s("run_id"),
      "GRAFT_PIPELINE" -> s("pipeline"),
      "GRAFT_THIS" -> s("this"),
      "GRAFT_FULL_REFRESH" -> (if (tplCtx.get("full_refresh").contains(true)) "1" else ""),
      "PYTHONUNBUFFERED" -> "1")
  }

  /** Secrets → env vars with JSON connection details (reference
    * python/operator.go:152-182). */
  def secretVars(asset: Asset, env: Environment): Map[String, String] =
    asset.secrets.map { sm =>
      val conn = env.connection(sm.key).getOrElse(
        throw new IllegalArgumentException(
          s"${asset.name}: there's no secret with the name '${sm.key}'"))
      val optionsJson = conn.options.map { case (k, v) =>
        s""""${k}": "${v.replace("\"", "\\\"")}"""" }.mkString("{", ", ", "}")
      sm.injectAs ->
        s"""{"name": "${conn.name}", "type": "${conn.typ}", "uri": "${conn.uri.replace("\"", "\\\"")}", "options": $optionsJson}"""
    }.toMap

  /** Execute the asset's script and materialize its output. */
  def run(wh: Warehouse, asset: Asset, baseDir: String,
          ctx: Materializer.Context = Materializer.Context(),
          tplCtx: Template.Ctx = Map.empty,
          environment: Environment = Environment()): Unit = {
    val scriptPath: Path = asset.parameters.get("path") match {
      case Some(rel) =>
        val p = if (rel.startsWith("/")) Paths.get(rel) else Paths.get(baseDir, rel.stripPrefix("./"))
        require(Files.exists(p), s"${asset.name}: script not found: $p")
        p
      case scala.None => // inline script body (post @bruin-header strip)
        val p = Files.createTempFile("graft_py_asset", ".py")
        Files.writeString(p, asset.content)
        p
    }
    val out = Files.createTempFile("graft_py_handoff", ".jsonl")
    Files.delete(out) // wrapper creates it; absence = no materialize()
    val wrapper = Files.createTempFile("graft_py_wrapper", ".py")
    Files.writeString(wrapper,
      WrapperTemplate
        .replace("$SCRIPT", scriptPath.toAbsolutePath.toString)
        .replace("$OUT", out.toAbsolutePath.toString))

    val interpreter = asset.parameters.getOrElse("interpreter", "python3")
    val pb = new ProcessBuilder(interpreter, wrapper.toAbsolutePath.toString)
    pb.redirectErrorStream(true)
    val pe = pb.environment()
    (envVars(tplCtx) ++ secretVars(asset, environment)).foreach { case (k, v) => pe.put(k, v) }
    val proc = pb.start()
    val output = new String(proc.getInputStream.readAllBytes(), "UTF-8")
    val code = proc.waitFor()
    try {
      require(code == 0, s"${asset.name}: python exited $code\n$output")
      // file existence = materialize() was defined; zero bytes = it returned
      // an empty result, which still materializes (an empty typed table) —
      // stale data from the previous run must not survive
      if (Files.exists(out)) {
        val df =
          if (Files.size(out) > 0) Seeds.applyColumns(wh.spark.read.json(out.toString), asset)
          else {
            require(asset.columns.nonEmpty,
              s"${asset.name}: materialize() returned no rows — declare columns so the empty table has a schema")
            wh.spark.createDataFrame(
              wh.spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
              graft.unittest.UnitTests.declaredSchema(asset))
          }
        val effective = asset.copy(materialization = asset.materialization.copy(
          typ = MaterializationType.Table,
          strategy = Some(PythonHandoff.mappedStrategy(asset.materialization.strategy))))
        Materializer.executeDf(wh, effective, df, ctx)
      }
    } finally {
      Files.deleteIfExists(out)
      Files.deleteIfExists(wrapper)
      if (asset.parameters.get("path").isEmpty) Files.deleteIfExists(scriptPath)
    }
  }
}

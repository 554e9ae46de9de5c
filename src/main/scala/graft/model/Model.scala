package graft.model

/** Core pipeline/asset data model.
  *
  * Mirrors the reference's abstractions (pipeline.Pipeline /
  * pipeline.Asset / pipeline.Column / pipeline.Materialization at
  * reference pkg/pipeline/pipeline.go:2238-2269, 1297-1341, 845-869,
  * 592-660) re-expressed as idiomatic Scala case classes. Column types stay
  * free-form SQL strings (the reference owns no type system — SURVEY §1.2);
  * they are parsed on demand with Spark's own DDL parser.
  */

sealed trait MaterializationType
object MaterializationType {
  case object None  extends MaterializationType
  case object View  extends MaterializationType
  case object Table extends MaterializationType
  def parse(s: String): MaterializationType = s.trim.toLowerCase match {
    case "view"  => View
    case "table" => Table
    case "" | "none" => None
    case other => throw new IllegalArgumentException(s"unknown materialization type: $other")
  }
}

sealed abstract class Strategy(val name: String)
object Strategy {
  case object CreateReplace      extends Strategy("create+replace")
  case object Append             extends Strategy("append")
  case object TruncateInsert     extends Strategy("truncate+insert")
  case object DeleteInsert       extends Strategy("delete+insert")
  case object Merge              extends Strategy("merge")
  case object TimeInterval       extends Strategy("time_interval")
  case object DDL                extends Strategy("ddl")
  case object SCD2ByColumn       extends Strategy("scd2_by_column")
  case object SCD2ByTime         extends Strategy("scd2_by_time")
  case object DataVaultHub       extends Strategy("datavault_hub")
  case object DataVaultLink      extends Strategy("datavault_link")
  case object DataVaultSatellite extends Strategy("datavault_satellite")

  val all: Seq[Strategy] = Seq(CreateReplace, Append, TruncateInsert,
    DeleteInsert, Merge, TimeInterval, DDL, SCD2ByColumn, SCD2ByTime,
    DataVaultHub, DataVaultLink, DataVaultSatellite)

  def parse(s: String): Strategy =
    all.find(_.name == s.trim.toLowerCase).getOrElse(
      throw new IllegalArgumentException(s"unknown materialization strategy: $s"))
}

/** Time granularity for time_interval strategies (reference pipeline.go:592-660). */
sealed trait TimeGranularity
object TimeGranularity {
  case object Date      extends TimeGranularity
  case object Timestamp extends TimeGranularity
  def parse(s: String): TimeGranularity = s.trim.toLowerCase match {
    case "date" => Date
    case _      => Timestamp
  }
}

final case class Materialization(
    typ: MaterializationType = MaterializationType.None,
    strategy: Option[Strategy] = None,
    partitionBy: Seq[String] = Nil,
    clusterBy: Seq[String] = Nil,
    /** hash-bucketed layout (Spark-native): joins/aggregations between
      * co-bucketed tables on the bucket keys skip the shuffle entirely. */
    bucketBy: Seq[String] = Nil,
    buckets: Int = 0,
    incrementalKey: Option[String] = None,
    incrementalPredicate: Option[String] = None,
    timeGranularity: TimeGranularity = TimeGranularity.Timestamp)

/** Check value — tagged union in the reference (pipeline.go:679-686). */
sealed trait CheckValue
object CheckValue {
  final case class IntVal(v: Long)            extends CheckValue
  final case class FloatVal(v: Double)        extends CheckValue
  final case class StrVal(v: String)          extends CheckValue
  final case class BoolVal(v: Boolean)        extends CheckValue
  final case class ListVal(v: Seq[CheckValue]) extends CheckValue

  def of(raw: Any): CheckValue = raw match {
    case i: Int                => IntVal(i.toLong)
    case l: Long               => FloatValOrInt(l)
    case d: Double             => FloatVal(d)
    case f: Float              => FloatVal(f.toDouble)
    case b: Boolean            => BoolVal(b)
    case s: String             => StrVal(s)
    case xs: java.util.List[_] => ListVal(xs.toArray.toSeq.map(of))
    case xs: Seq[_]            => ListVal(xs.map(of))
    case other                 => StrVal(String.valueOf(other))
  }
  private def FloatValOrInt(l: Long): CheckValue = IntVal(l)

  /** Render as a SQL literal (strings quoted, lists parenthesized). */
  def toSql(v: CheckValue): String = v match {
    case IntVal(i)    => i.toString
    case FloatVal(d)  => d.toString
    case BoolVal(b)   => b.toString.toUpperCase
    case StrVal(s)    => "'" + s.replace("'", "''") + "'"
    case ListVal(xs)  => xs.map(toSql).mkString("(", ", ", ")")
  }
}

/** Column-level quality check (reference pipeline.go:808-826). */
final case class ColumnCheck(
    name: String,
    value: Option[CheckValue] = None,
    blocking: Boolean = true)

/** Custom (asset-level) check: arbitrary SQL + expected value/count
  * (reference pipeline.go:1078-1088). */
final case class CustomCheck(
    name: String,
    query: String,
    value: Option[Long] = None,
    count: Option[Long] = None,
    blocking: Boolean = true)

final case class Column(
    name: String,
    typ: String = "",
    description: String = "",
    primaryKey: Boolean = false,
    updateOnMerge: Boolean = false,
    nullable: Boolean = true,
    /** masking function applied on ingestion: hash|md5|star|null
      * (reference ingestr --mask, pkg/ingestr/operator.go:138-176). */
    mask: String = "",
    /** custom matched-update expression for merge, with target./source.
      * aliases (reference Column.MergeSQL, duckdb/materialization.go:146-151);
      * overrides update_on_merge when set. */
    mergeSql: String = "",
    /** glossary inheritance: `Entity.Attribute` (reference EntityAttribute,
      * pipeline.go:828-846). */
    extendsRef: String = "",
    checks: Seq[ColumnCheck] = Nil,
    upstreams: Seq[ColumnLineageRef] = Nil)

/** Column-level lineage edge (filled by the lineage extractor). */
final case class ColumnLineageRef(table: String, column: String)

/** Typed dependency (reference pipeline.go:1150-1161): mode `symbolic`
  * edges are lineage-only and never scheduled (scheduler.go:808-811). */
final case class Upstream(value: String, typ: String = "asset", mode: String = "full") {
  def isSymbolic: Boolean = mode == "symbolic"
}

object AssetType {
  val SparkSql    = "spark.sql"
  val SparkPython = "spark.python"
  val Ingest      = "ingest"
  val Seed        = "seed"
  val SensorQuery = "sensor.query"
  val SensorTable = "sensor.table"
  val Empty       = "empty"

  /** Collapse the reference's ~90 platform-specific constants
    * (pipeline.go:35-165) onto the Spark-native set. */
  def normalize(raw: String): String = {
    val r = raw.trim.toLowerCase
    if (r.isEmpty || r == "empty") Empty
    else if (r.endsWith(".seed") || r == "seed") Seed
    else if (r.endsWith(".sensor.query") || r == "sensor.query") SensorQuery
    else if (r.endsWith(".sensor.table") || r == "sensor.table") SensorTable
    else if (r == "python" || r.endsWith(".python") || r == "spark.python") SparkPython
    else if (r == "ingestr" || r == "ingest") Ingest
    else SparkSql // any "<platform>.sql" flavor executes as Spark SQL here
  }
}

final case class UnitTestFixture(asset: String, rows: Seq[Map[String, Any]])
final case class UnitTestExpectation(
    rows: Seq[Map[String, Any]] = Nil,
    count: Option[Long] = None,
    matchMode: String = "subset", // subset | exact
    order: String = "any")        // any | strict
final case class UnitTest(
    name: String,
    inputs: Seq[UnitTestFixture] = Nil,
    expected: UnitTestExpectation = UnitTestExpectation(),
    /** per-CTE expected outputs (reference SelectFromCTE assertions,
      * pkg/unittest/warehouse.go + parser.go:440-450). */
    cteExpectations: Map[String, UnitTestExpectation] = Map.empty,
    executionTime: Option[String] = None)

/** Per-asset interval shift (reference pipeline.go:1375-1499 TimeModifier /
  * IntervalModifiers): scalar forms like "-2h", "1d", "30m", "45s", "1M". */
final case class IntervalModifiers(start: Option[String] = None, end: Option[String] = None)

object IntervalModifiers {
  /** Apply a "-2h"-style modifier to a timestamp. */
  def shift(t: java.time.LocalDateTime, modifier: String): java.time.LocalDateTime = {
    val m = """(-?\d+)\s*([smhdM])""".r
    modifier.trim match {
      case m(n, unit) =>
        val v = n.toLong
        unit match {
          case "s" => t.plusSeconds(v)
          case "m" => t.plusMinutes(v)
          case "h" => t.plusHours(v)
          case "d" => t.plusDays(v)
          case "M" => t.plusMonths(v)
        }
      case other => throw new IllegalArgumentException(s"bad interval modifier: '$other'")
    }
  }
}

/** Pre/post hook query lists (reference pipeline/hooks.go:24-54). */
final case class Hooks(pre: Seq[String] = Nil, post: Seq[String] = Nil)

/** Notification routing (reference pipeline.go Notifications — slack
  * channels + email recipient groups; delivery is a platform concern, the
  * model and its lint validation are the engine's). */
final case class Notifications(slack: Seq[String] = Nil,
                               emails: Seq[Seq[String]] = Nil) {
  def isEmpty: Boolean = slack.isEmpty && emails.isEmpty
}

/** Secret mapping (reference pipeline.go Secrets + python/operator.go:152-182):
  * connection `key` from the environment config is injected into the asset
  * subprocess as env var `injectAs` (JSON connection details). */
final case class SecretMapping(key: String, injectAs: String)

final case class Asset(
    name: String,
    assetType: String = AssetType.SparkSql,
    description: String = "",
    content: String = "",                     // SQL body (post header strip)
    upstreams: Seq[Upstream] = Nil,
    columns: Seq[Column] = Nil,
    materialization: Materialization = Materialization(),
    customChecks: Seq[CustomCheck] = Nil,
    parameters: Map[String, String] = Map.empty,
    secrets: Seq[SecretMapping] = Nil,
    intervalModifiers: IntervalModifiers = IntervalModifiers(),
    hooks: Hooks = Hooks(),
    tags: Seq[String] = Nil,
    owner: String = "",
    /** criticality 1 (highest) .. 5; 0 = unset (reference pipeline.go Tier). */
    tier: Int = 0,
    notifications: Notifications = Notifications(),
    /** header keys the parser did not recognize (reference
      * unknown-asset-fields — typo'd keys silently dropped are a lint). */
    unknownFields: Seq[String] = Nil,
    unitTests: Seq[UnitTest] = Nil) {

  /** Per-asset execution knobs (reference pipeline.go:1332-1335). */
  def timeoutSeconds: Option[Long] = parameters.get("timeout").map(_.toLong)
  def rerunCooldownSeconds: Option[Long] = parameters.get("rerun_cooldown").map(_.toLong)
  def retriesOverride: Option[Int] = parameters.get("retries").map(_.toInt)
  /** connections this asset touches (concurrency limits key off these). */
  def connections: Seq[String] =
    (parameters.get("connection").toSeq ++ parameters.get("source_connection").toSeq).distinct

  def primaryKeys: Seq[String] = columns.filter(_.primaryKey).map(_.name)
  def mergeUpdateColumns: Seq[String] = columns.filter(_.updateOnMerge).map(_.name)
  def dependsOn: Seq[String] = upstreams.filterNot(_.isSymbolic).map(_.value)
}

final case class Pipeline(
    name: String,
    schedule: String = "",
    startDate: String = "",
    assets: Seq[Asset] = Nil,
    variables: Map[String, Any] = Map.empty,
    /** per-variable JSON-schema-ish declarations (type/description/default —
      * reference pkg/pipeline/variables.go:17-81). */
    variableSchema: Map[String, Map[String, Any]] = Map.empty,
    /** named variable presets (reference variant.go:22-105). */
    variants: Map[String, Map[String, Any]] = Map.empty,
    concurrency: Int = 1,
    retries: Int = 0,
    notifications: Notifications = Notifications(),
    unknownFields: Seq[String] = Nil) {

  def asset(name: String): Option[Asset] = assets.find(_.name == name)
}

/** Variable override/variant plumbing (reference variables.go + variant.go). */
object Variables {

  /** JSON-schema primitive type check (reference variant.go:64-99). */
  def typeMatches(value: Any, declared: String): Boolean = declared match {
    case "string"  => value.isInstanceOf[String]
    case "integer" => value match {
      case _: Int | _: Long => true
      case d: Double => d == math.floor(d) && !d.isInfinite
      case _ => false
    }
    case "number"  => value.isInstanceOf[Int] || value.isInstanceOf[Long] ||
      value.isInstanceOf[Double] || value.isInstanceOf[Float]
    case "boolean" => value.isInstanceOf[Boolean]
    case "array"   => value.isInstanceOf[Seq[_]]
    case "object"  => value.isInstanceOf[Map[_, _]]
    case "null"    => value == null
    case _         => true // unknown type — permissive, like the reference
  }

  /** `--var k=v` overrides: unknown variables and schema-type mismatches
    * throw (reference Variables.Merge / validateOverrideType). */
  def applyOverrides(p: Pipeline, overrides: Map[String, Any]): Pipeline = {
    overrides.foreach { case (k, v) =>
      require(p.variables.contains(k) || p.variableSchema.contains(k),
        s"no such variable '$k'")
      p.variableSchema.get(k).flatMap(_.get("type")).map(String.valueOf).foreach { t =>
        require(typeMatches(v, t),
          s"variable '$k': type mismatch, expected $t, got ${String.valueOf(v)}")
      }
    }
    p.copy(variables = p.variables ++ overrides)
  }

  /** Apply a named variant preset. */
  def applyVariant(p: Pipeline, variant: String): Pipeline =
    applyOverrides(p, p.variants.getOrElse(variant,
      throw new IllegalArgumentException(
        s"unknown variant '$variant' (have: ${p.variants.keys.toSeq.sorted.mkString(", ")})")))

  /** Validation issues: schema vars need defaults; variants must reference
    * known variables with matching types. */
  def validate(p: Pipeline): Seq[String] = {
    val noDefault = p.variableSchema.collect {
      case (k, schema) if !schema.contains("default") && !p.variables.contains(k) =>
        s"variable '$k' must have a default value"
    }.toSeq
    val badVariants = p.variants.toSeq.flatMap { case (vn, overrides) =>
      overrides.flatMap { case (k, v) =>
        if (!p.variables.contains(k) && !p.variableSchema.contains(k))
          Some(s"variant '$vn' references unknown variable '$k'")
        else p.variableSchema.get(k).flatMap(_.get("type")).map(String.valueOf)
          .filterNot(t => typeMatches(v, t))
          .map(t => s"variant '$vn' variable '$k': type mismatch (expected $t)")
      }
    }
    noDefault ++ badVariants
  }
}

package graft.unittest

import java.time.{Instant, LocalDateTime, ZoneOffset}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.graft.SqlBridge
import org.apache.spark.sql.types._
import graft.model._

/** SQL unit-test harness (reference pkg/unittest/warehouse.go:51-236 +
  * compare.go:23-211): mocked inputs become typed temp views (sparse rows →
  * NULL, declared-type casts, empty input → empty typed relation), now() is
  * frozen at execution_time, and results compare with subset/exact ×
  * any/strict semantics under tolerant scalar equality (numbers within 1e-9,
  * time normalization).
  */
object UnitTests {

  final case class TestFailure(test: String, reason: String)

  def run(spark: SparkSession, pipeline: Pipeline, asset: Asset,
          test: UnitTest): Option[TestFailure] = {
    // 1. mock inputs as typed temp views
    test.inputs.foreach { fx =>
      val upstream = pipeline.asset(fx.asset)
      val df = fixtureDf(spark, fx, upstream)
      df.createOrReplaceTempView(viewName(fx.asset))
    }
    // unmocked upstreams with declared columns → empty typed relations
    val emptied = asset.upstreams.filterNot(u => test.inputs.exists(_.asset == u.value)).flatMap { u =>
      pipeline.asset(u.value).filter(_.columns.nonEmpty).map { ua =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], declaredSchema(ua))
          .createOrReplaceTempView(viewName(u.value))
        u.value
      }
    }

    // 2. rewrite table refs to the mocked views (plan-level — string literals
    //    and comments are safe, reference RenameTables parser.go:263-270) +
    //    freeze time
    val mapping = (test.inputs.map(_.asset) ++ emptied).map(t => t -> viewName(t)).toMap
    val plan = SqlBridge.renameTables(
      spark.sessionState.sqlParser.parsePlan(asset.content), mapping)
    val frozenMicros = test.executionTime.map(parseMicros)
    val result = SqlBridge.ofRows(spark,
      frozenMicros.fold(plan)(us => SqlBridge.freezeExpressions(plan, us)))

    // 3. per-CTE assertions (reference SelectFromCTE, parser.go:440-450):
    //    re-point the query at each asserted CTE under the same fixtures
    val cteFailure = test.cteExpectations.view.flatMap { case (cte, exp) =>
      val ctePlan =
        try SqlBridge.renameTables(
          SqlBridge.selectFromCtePlan(spark, asset.content, cte), mapping)
        catch { case e: IllegalArgumentException =>
          return Some(TestFailure(test.name, e.getMessage))
        }
      val cteResult = SqlBridge.ofRows(spark,
        frozenMicros.fold(ctePlan)(us => SqlBridge.freezeExpressions(ctePlan, us)))
      compare(cteResult, exp, s"${test.name} [cte $cte]")
    }.headOption
    if (cteFailure.nonEmpty) return cteFailure

    // 4. compare the main result
    compare(result, test.expected, test.name)
  }

  private def viewName(asset: String): String = "__fx_" + asset.replace('.', '_')

  private def parseMicros(s: String): Long = {
    val ldt = LocalDateTime.parse(s.replace(" ", "T").take(19))
    ldt.toInstant(ZoneOffset.UTC).toEpochMilli * 1000L
  }

  def declaredSchema(asset: Asset): StructType =
    StructType(asset.columns.map { c =>
      val t = if (c.typ.nonEmpty) CatalystSqlParserShim.parse(c.typ) else StringType
      StructField(c.name, t, nullable = true)
    })

  /** Sparse rows → NULL for unlisted columns, cast to declared types
    * (reference warehouse.go:164-236). */
  def fixtureDf(spark: SparkSession, fx: UnitTestFixture, upstream: Option[Asset]): DataFrame = {
    val declared = upstream.map(_.columns).getOrElse(Nil)
    val columns: Seq[String] =
      if (declared.nonEmpty) declared.map(_.name)
      else fx.rows.flatMap(_.keys).distinct
    val schema = if (declared.nonEmpty) declaredSchema(upstream.get)
      else StructType(columns.map(StructField(_, StringType)))
    val rows = fx.rows.map { m =>
      Row.fromSeq(columns.map { c =>
        m.get(c).map(v => coerce(v, schema(c).dataType)).orNull
      })
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  private def coerce(v: Any, t: DataType): Any = (v, t) match {
    case (null, _) => null
    case (v: Number, LongType) => v.longValue
    case (v: Number, IntegerType) => v.intValue
    case (v: Number, DoubleType) => v.doubleValue
    case (v: Number, _: DecimalType) => new java.math.BigDecimal(v.toString)
    case (v, StringType) => String.valueOf(v)
    case (v: String, TimestampType) =>
      java.sql.Timestamp.valueOf(v.replace("T", " ").take(19) match {
        case d if d.length == 10 => d + " 00:00:00"
        case d => d
      })
    case (v: String, DateType) => java.sql.Date.valueOf(v.take(10))
    case (v: String, LongType) => v.toLong
    case (v: String, IntegerType) => v.toInt
    case (v: String, DoubleType) => v.toDouble
    case (v: Boolean, BooleanType) => v
    case (v, _) => v
  }

  // ---- comparison ---------------------------------------------------------

  /** Tolerant scalar equality (compare.go:134-211). */
  def scalarEq(a: Any, b: Any): Boolean = (a, b) match {
    case (null, null) => true
    case (null, _) | (_, null) => false
    case (x: Number, y: Number) => math.abs(x.doubleValue - y.doubleValue) < 1e-9
    case (x: java.sql.Timestamp, y) => normTime(x.toString) == normTime(String.valueOf(y))
    case (x, y: java.sql.Timestamp) => normTime(String.valueOf(x)) == normTime(y.toString)
    case (x: Boolean, y: String) => x.toString.equalsIgnoreCase(y)
    case (x: String, y: Boolean) => y.toString.equalsIgnoreCase(x)
    case (x: Number, y: String) if y.matches("-?\\d+(\\.\\d+)?") =>
      math.abs(x.doubleValue - y.toDouble) < 1e-9
    case (x: String, y: Number) if x.matches("-?\\d+(\\.\\d+)?") =>
      math.abs(x.toDouble - y.doubleValue) < 1e-9
    case (x, y) => String.valueOf(x) == String.valueOf(y)
  }

  private def normTime(s: String): String =
    s.replace("T", " ").stripSuffix(".0").take(19)

  private def rowMatches(actual: Map[String, Any], expected: Map[String, Any]): Boolean =
    expected.forall { case (k, v) => actual.contains(k) && scalarEq(actual(k), v) }

  def compare(result: DataFrame, exp: UnitTestExpectation, testName: String): Option[TestFailure] = {
    val actualRows = result.collect().map(r =>
      result.columns.zipWithIndex.map { case (c, i) => c -> r.get(i) }.toMap).toSeq

    exp.count.foreach { c =>
      if (actualRows.size != c)
        return Some(TestFailure(testName, s"expected count $c, got ${actualRows.size}"))
    }
    if (exp.rows.isEmpty) return scala.None

    (exp.matchMode, exp.order) match {
      case ("exact", "strict") =>
        if (actualRows.size != exp.rows.size)
          return Some(TestFailure(testName, s"expected ${exp.rows.size} rows, got ${actualRows.size}"))
        actualRows.zip(exp.rows).zipWithIndex.foreach { case ((a, e), i) =>
          if (!rowMatches(a, e)) return Some(TestFailure(testName, s"row $i mismatch: got $a, want $e"))
        }
        scala.None
      case ("exact", _) =>
        if (actualRows.size != exp.rows.size)
          return Some(TestFailure(testName, s"expected ${exp.rows.size} rows, got ${actualRows.size}"))
        matchAll(actualRows, exp.rows, testName)
      case (_, "strict") =>
        // expected must appear as an ordered subsequence
        var idx = 0
        exp.rows.foreach { e =>
          val found = actualRows.indexWhere(a => rowMatches(a, e), idx)
          if (found < 0) return Some(TestFailure(testName, s"row not found in order: $e"))
          idx = found + 1
        }
        scala.None
      case _ => matchAll(actualRows, exp.rows, testName, subset = true)
    }
  }

  private def matchAll(actual: Seq[Map[String, Any]], expected: Seq[Map[String, Any]],
                       testName: String, subset: Boolean = false): Option[TestFailure] = {
    val used = scala.collection.mutable.Set[Int]()
    expected.foreach { e =>
      val i = actual.indices.find(i => !used(i) && rowMatches(actual(i), e))
      i match {
        case Some(ix) => used += ix
        case scala.None => return Some(TestFailure(testName, s"no matching row for: $e"))
      }
    }
    scala.None
  }
}

/** Parse a SQL type string with Spark's own parser (SURVEY §1.2). */
object CatalystSqlParserShim {
  def parse(typ: String): DataType =
    try org.apache.spark.sql.types.DataType.fromDDL(typ)
    catch { case _: Throwable => StringType }
}

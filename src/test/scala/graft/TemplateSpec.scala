package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.render.{Macros, Template}
import graft.checks.Checks
import graft.model.{CheckValue, ColumnCheck}

class TemplateSpec extends AnyFunSuite {

  private val ctx = Template.context(
    java.time.LocalDateTime.of(2024, 1, 1, 0, 0),
    java.time.LocalDateTime.of(2024, 1, 31, 0, 0),
    java.time.LocalDateTime.of(2024, 1, 15, 0, 0),
    pipelineName = "p", runId = "r",
    vars = Map("env" -> "prod", "limit" -> 10L))

  test("variable substitution and strictness") {
    assert(Template.render("SELECT '{{ start_date }}' d", ctx) == "SELECT '2024-01-01' d")
    assert(Template.render("{{ var.env }}-{{ var.limit }}", ctx) == "prod-10")
    assert(Template.render("{{ end_date_nodash }}", ctx) == "20240131")
    intercept[NoSuchElementException](Template.render("{{ nope }}", ctx))
  }

  test("macros render the reference SQL shapes") {
    assert(Template.render("{{ group_by(3) }}", ctx) == "group by 1, 2, 3")
    assert(Template.render("{{ safe_divide('a', 'b') }}", ctx) == "(a) / nullif((b), 0)")
    assert(Template.render("{{ safe_add('a', 'b') }}", ctx) == "coalesce(a, 0) +\n    coalesce(b, 0)")
    assert(Template.render("{{ generate_surrogate_key(['a', 'b']) }}", ctx) ==
      "md5(concat(coalesce(cast(a as string), '_bruin_surrogate_key_null_'), '-', coalesce(cast(b as string), '_bruin_surrogate_key_null_')))")
    assert(Macros.slugify("Hello World-2024!") == "hello_world_2024")
    assert(Macros.slugify("9lives") == "_9lives")
    val piv = Template.render("{{ pivot('c', ['x'], agg='count') }}", ctx)
    assert(piv.contains("count(") && piv.contains("when c = 'x'") && piv.contains("as `x`"))
  }

  test("data-op macros render the engine's SQL shapes") {
    // dedup_exact: one content-hash GROUP BY over the normalized text
    // the Spark-SQL string literal carries an ESCAPED backslash ('\\s+'),
    // which the SQL parser reads back as the regex \s+
    val de = Template.render("{{ dedup_exact('docs') }}", ctx)
    assert(de.contains("""md5(trim(regexp_replace(lower(text), '\\s+', ' ')))""") &&
      de.contains("min(doc_id) as keep_id") && de.contains("group by 1"), de)
    val deKw = Template.render("{{ dedup_exact('docs', id_col='id', text_col='body') }}", ctx)
    assert(deKw.contains("lower(body)") && deKw.contains("min(id)"), deKw)
    // stratified_split: the engine's portable md5 bucket, cumulative cutoffs
    val sp = Template.render("{{ stratified_split('docs', 'id', 70, 20) }}", ctx)
    assert(sp.contains("conv(substring(md5(cast(id as string)), 1, 8), 16, 10)") &&
      sp.contains("< 70") && sp.contains("< 90") && sp.contains("'test'"), sp)
    intercept[IllegalArgumentException](
      Template.render("{{ stratified_split('d', 'i', 80, 30) }}", ctx))
    // token_chunk: step = chunk - overlap, slice bounded by chunk
    val ch = Template.render("{{ token_chunk('docs', 'doc_id', 'body', 32, 8) }}", ctx)
    assert(ch.contains("sequence(0, size(__ws) - 1, 24)") &&
      ch.contains("slice(__ws, s + 1, 32)") && ch.contains("lower(body)"), ch)
    intercept[IllegalArgumentException](
      Template.render("{{ token_chunk('d', 'i', 't', 8, 8) }}", ctx))
  }

  test("kwargs and unit validation") {
    val hv = Template.render("{{ haversine_distance('a', 'b', 'c', 'd', unit='km') }}", ctx)
    assert(hv.endsWith("* 1.60934"))
    intercept[IllegalArgumentException](
      Template.render("{{ haversine_distance('a','b','c','d', unit='parsec') }}", ctx))
  }

  test("check SQL generation") {
    assert(Checks.buildSql("t", "c", ColumnCheck("not_null")) ==
      "SELECT count(CASE WHEN c IS NULL THEN 1 END) AS violations FROM t")
    assert(Checks.buildSql("t", "c", ColumnCheck("unique")) ==
      "SELECT count(c) - count(DISTINCT c) AS violations FROM t")
    assert(Checks.buildSql("t", "c", ColumnCheck("accepted_values",
      Some(CheckValue.ListVal(Seq(CheckValue.StrVal("a"), CheckValue.IntVal(1)))))) ==
      "SELECT count(CASE WHEN CAST(c AS STRING) NOT IN ('a', 1) THEN 1 END) AS violations FROM t")
    val batch = Checks.batchSql("t", Seq("a" -> ColumnCheck("not_null"), "b" -> ColumnCheck("positive")))
    assert(batch.startsWith("SELECT count(CASE WHEN a IS NULL") && batch.contains("AS v1"))
  }

  test("control flow: if/elif/else with operators") {
    val t = "{% if var.env == 'prod' %}real{% elif var.env == 'dev' %}fake{% else %}none{% endif %}"
    assert(Template.render(t, ctx) == "real")
    assert(Template.render(t, ctx + ("var" -> Map("env" -> "dev"))) == "fake")
    assert(Template.render(t, ctx + ("var" -> Map("env" -> "x"))) == "none")
    assert(Template.render("{% if var.limit > 5 and not full_refresh %}y{% endif %}", ctx) == "y")
    assert(Template.render("{% if 'b' in ['a', 'b'] %}has{% endif %}", ctx) == "has")
    assert(Template.render("{% if var.limit >= 10 or false %}ok{% endif %}", ctx) == "ok")
  }

  test("control flow: for with loop variables and whitespace trim") {
    val t = "SELECT{% for c in ['a', 'b', 'c'] %} {{ c }}{% if not loop.last %},{% endif %}{% endfor %} FROM t"
    assert(Template.render(t, ctx) == "SELECT a, b, c FROM t")
    assert(Template.render("{% for i in [1, 2] %}{{ loop.index }}:{{ i * 10 }} {% endfor %}", ctx)
      == "1:10 2:20 ")
    assert(Template.render("x {%- if true %} y{% endif %}", ctx) == "x y")
  }

  test("jinja comments are dropped") {
    assert(Template.render("a{# anything {{ even_this }} #}b", ctx) == "ab")
    intercept[IllegalArgumentException](Template.render("a{# unclosed", ctx))
  }

  test("or/and return operands; {{- -}} trims whitespace") {
    // jinja fallback idiom must render the operand, never a Boolean
    assert(Template.render("tbl_{{ var.env or 'dev' }}", ctx) == "tbl_prod")
    assert(Template.render("tbl_{{ '' or 'dev' }}", ctx) == "tbl_dev")
    assert(Template.render("{{ var.env and 'suffix' }}", ctx) == "suffix")
    assert(Template.render("{{ '' and 'suffix' }}", ctx) == "")
    // expression-tag whitespace control
    assert(Template.render("a {{- 'X' -}} b", ctx) == "aXb")
    assert(Template.render("a {{- var.env }}", ctx) == "aprod")
  }

  test("set and arithmetic") {
    assert(Template.render("{% set n = var.limit * 2 %}LIMIT {{ n }}", ctx) == "LIMIT 20")
    assert(Template.render("{{ 7 % 3 }}-{{ 2 + 3 * 4 }}-{{ 'a' ~ 'b' }}", ctx) == "1-14-ab")
    assert(Template.render("{{ (2 + 3) * 4 }}", ctx) == "20")
  }

  test("user macros: definitions, defaults, kwargs, macro files") {
    val t =
      """{% macro gte(col, threshold=0) -%}
        |{{ col }} >= {{ threshold }}
        |{%- endmacro %}WHERE {{ gte('price', 300) }} AND {{ gte('qty') }}""".stripMargin
    assert(Template.render(t, ctx) == "WHERE price >= 300 AND qty >= 0")

    // macro files concatenate and prepend (reference jinja.go LoadMacros)
    val dir = java.nio.file.Files.createTempDirectory("graft-macros")
    java.nio.file.Files.createDirectory(dir.resolve("macros"))
    java.nio.file.Files.writeString(dir.resolve("macros/m.sql"),
      "{% macro upper_env() %}{{ var.env }}{% endmacro %}")
    val prelude = Template.loadMacros(dir.toString)
    assert(Template.render(prelude + "env={{ upper_env() }}", ctx).trim == "env=prod")
    assert(Template.loadMacros("/nonexistent-dir") == "")
  }
}

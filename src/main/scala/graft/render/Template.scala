package graft.render

import java.time.LocalDateTime
import java.time.format.DateTimeFormatter

/** Jinja-style renderer for asset SQL.
  *
  * The reference renders with gonja + strict-undefined (pkg/jinja/jinja.go:19-245).
  * Our surface:
  *  - `{{ expr }}` — (dotted) variables, literals, builtin macro calls
  *    ([[Macros]] — the SQL-generating functions of pkg/jinja/bruin_funcs.go
  *    in Spark dialect), user macro calls, and operators
  *    (comparisons, and/or/not, + - * / %, ~ concat, in);
  *  - `{% if %} / {% elif %} / {% else %} / {% endif %}`;
  *  - `{% for x in list %} … {% endfor %}` with `loop.index/index0/first/last`;
  *  - `{% set name = expr %}`;
  *  - `{% macro name(a, b='dflt') %} … {% endmacro %}` — user macros; macro
  *    files under `*.sql` files in the macros dir are concatenated and prepended, exactly like
  *    the reference (pkg/jinja/jinja.go:37-68 LoadMacros).
  * `{%-`/`-%}` trim adjacent whitespace. Undefined variables throw (strict).
  */
object Template {

  type Ctx = Map[String, Any]

  /** The reference's template context (pkg/jinja/jinja.go:149-170). */
  def context(
      startDate: LocalDateTime,
      endDate: LocalDateTime,
      executionDate: LocalDateTime,
      pipelineName: String = "",
      runId: String = "",
      fullRefresh: Boolean = false,
      thisAsset: String = "",
      vars: Map[String, Any] = Map.empty): Ctx = {
    val d = DateTimeFormatter.ofPattern("yyyy-MM-dd")
    val nd = DateTimeFormatter.ofPattern("yyyyMMdd")
    val dt = DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss")
    val ts = DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")
    Map(
      "start_date" -> startDate.format(d), "start_date_nodash" -> startDate.format(nd),
      "start_datetime" -> startDate.format(dt), "start_timestamp" -> startDate.format(ts),
      "end_date" -> endDate.format(d), "end_date_nodash" -> endDate.format(nd),
      "end_datetime" -> endDate.format(dt), "end_timestamp" -> endDate.format(ts),
      "execution_date" -> executionDate.format(d),
      "execution_date_nodash" -> executionDate.format(nd),
      "execution_datetime" -> executionDate.format(dt),
      "execution_timestamp" -> executionDate.format(ts),
      "ds" -> executionDate.format(d),
      "pipeline" -> pipelineName, "run_id" -> runId,
      "full_refresh" -> fullRefresh, "this" -> thisAsset,
      "var" -> vars)
  }

  /** Concatenate the `*.sql` files under dir/macros for prepending to templates (reference
    * jinja.go:37-68 LoadMacros). Empty string when the directory is absent. */
  def loadMacros(baseDir: String): String = {
    val dir = java.nio.file.Paths.get(baseDir).resolve("macros")
    if (!java.nio.file.Files.isDirectory(dir)) ""
    else {
      graft.core.Fs.listDir(dir)
        .filter(_.toString.endsWith(".sql")).sortBy(_.toString)
        .map(p => java.nio.file.Files.readString(p)).mkString("", "\n", "\n")
    }
  }

  def render(text: String, ctx: Ctx): String =
    renderNodes(parse(text), new Scope(ctx))

  // ---- AST ----------------------------------------------------------------

  private sealed trait Node
  private final case class TextN(s: String) extends Node
  private final case class OutN(expr: String) extends Node
  private final case class IfN(branches: Seq[(Option[String], Vector[Node])]) extends Node
  private final case class ForN(v: String, listExpr: String, body: Vector[Node]) extends Node
  private final case class SetN(name: String, expr: String) extends Node
  private final case class MacroN(name: String, params: Seq[(String, Option[String])],
                                  body: Vector[Node]) extends Node

  private final class Scope(init: Map[String, Any]) {
    private val vars = scala.collection.mutable.Map[String, Any](init.toSeq: _*)
    val macros = scala.collection.mutable.Map[String, MacroN]()
    def get(k: String): Option[Any] = vars.get(k)
    def set(k: String, v: Any): Unit = vars(k) = v
    def child(extra: Map[String, Any]): Scope = {
      val s = new Scope(vars.toMap ++ extra)
      s.macros ++= macros
      s
    }
  }

  // ---- tokenizer + block parser -------------------------------------------

  private sealed trait Tok
  private final case class TextT(s: String) extends Tok
  private final case class OutT(expr: String) extends Tok
  private final case class TagT(body: String, trimL: Boolean, trimR: Boolean) extends Tok

  private def tokenize(text: String): Vector[Tok] = {
    val raw = Vector.newBuilder[Tok]
    var i = 0
    while (i < text.length) {
      val o1 = text.indexOf("{{", i)
      val o2 = text.indexOf("{%", i)
      val o3 = text.indexOf("{#", i)
      val open = Seq(o1, o2, o3).filter(_ >= 0).minOption.getOrElse(-1)
      if (open < 0) { raw += TextT(text.substring(i)); i = text.length }
      else {
        if (open > i) raw += TextT(text.substring(i, open))
        if (text.startsWith("{#", open)) { // jinja comment: dropped entirely
          val close = text.indexOf("#}", open + 2)
          require(close >= 0, s"unclosed {# at offset $open")
          i = close + 2
        } else if (text.startsWith("{{", open)) {
          val close = text.indexOf("}}", open + 2)
          require(close >= 0, s"unclosed {{ at offset $open")
          // {{- expr -}} whitespace control: markers are stripped here and the
          // neighbour trim is applied via a zero-width tag marker below
          val body = text.substring(open + 2, close)
          val trimL = body.startsWith("-")
          val trimR = body.endsWith("-") && body.length > 1
          if (trimL) raw += TagT("__ws_trim__", trimL = true, trimR = false)
          raw += OutT(body.stripPrefix("-").stripSuffix("-").trim)
          if (trimR) raw += TagT("__ws_trim__", trimL = false, trimR = true)
          i = close + 2
        } else {
          val close = text.indexOf("%}", open + 2)
          require(close >= 0, s"unclosed {% at offset $open")
          val body = text.substring(open + 2, close)
          val trimL = body.startsWith("-")
          val trimR = body.endsWith("-")
          raw += TagT(body.stripPrefix("-").stripSuffix("-").trim, trimL, trimR)
          i = close + 2
        }
      }
    }
    // apply whitespace-control markers to neighbouring text tokens
    val toks = raw.result()
    toks.zipWithIndex.map {
      case (TextT(s), idx) =>
        var v = s
        if (idx + 1 < toks.length) toks(idx + 1) match {
          case TagT(_, true, _) => v = v.replaceAll("\\s+$", "")
          case _ => ()
        }
        if (idx > 0) toks(idx - 1) match {
          case TagT(_, _, true) => v = v.replaceAll("^\\s+", "")
          case _ => ()
        }
        TextT(v)
      case (t, _) => t
    }
  }

  private def parse(text: String): Vector[Node] = {
    val toks = tokenize(text)
    val (nodes, rest) = parseBlock(toks, 0, Set.empty)
    require(rest == toks.length, s"unexpected block close near token $rest")
    nodes
  }

  /** Parse until a closing tag named in `stop` (returned without consuming). */
  private def parseBlock(toks: Vector[Tok], start: Int,
                         stop: Set[String]): (Vector[Node], Int) = {
    val nodes = Vector.newBuilder[Node]
    var i = start
    while (i < toks.length) {
      toks(i) match {
        case TextT(s) => nodes += TextN(s); i += 1
        case OutT(e)  => nodes += OutN(e); i += 1
        case TagT("__ws_trim__", _, _) => i += 1 // zero-width whitespace marker
        case TagT(body, _, _) =>
          val word = body.takeWhile(!_.isWhitespace)
          if (stop.contains(word)) return (nodes.result(), i)
          word match {
            case "if" =>
              val branches = Vector.newBuilder[(Option[String], Vector[Node])]
              var cond: Option[String] = Some(body.drop(2).trim)
              var j = i + 1
              var done = false
              while (!done) {
                val (b, k) = parseBlock(toks, j, Set("elif", "else", "endif"))
                require(k < toks.length, "missing {% endif %}")
                branches += ((cond, b))
                toks(k) match {
                  case TagT(t, _, _) if t.startsWith("elif") => cond = Some(t.drop(4).trim); j = k + 1
                  case TagT("else", _, _)  => cond = scala.None; j = k + 1
                  case TagT("endif", _, _) => i = k + 1; done = true
                  case other => throw new IllegalArgumentException(s"bad if structure: $other")
                }
              }
              nodes += IfN(branches.result())
            case "for" =>
              val m = """for\s+(\w+)\s+in\s+(.+)""".r
              body match {
                case m(v, listExpr) =>
                  val (b, k) = parseBlock(toks, i + 1, Set("endfor"))
                  require(k < toks.length, "missing {% endfor %}")
                  nodes += ForN(v, listExpr.trim, b)
                  i = k + 1
                case _ => throw new IllegalArgumentException(s"bad for tag: {% $body %}")
              }
            case "set" =>
              val m = """set\s+(\w+)\s*=\s*(.+)""".r
              body match {
                case m(n, e) => nodes += SetN(n, e.trim); i += 1
                case _ => throw new IllegalArgumentException(s"bad set tag: {% $body %}")
              }
            case "macro" =>
              val m = """(?s)macro\s+(\w+)\s*\((.*)\)""".r
              body match {
                case m(n, paramList) =>
                  val params = paramList.split(',').map(_.trim).filter(_.nonEmpty).toSeq.map { p =>
                    p.split("=", 2) match {
                      case Array(pn, dflt) => (pn.trim, Some(dflt.trim))
                      case Array(pn)       => (pn.trim, scala.None)
                    }
                  }
                  val (b, k) = parseBlock(toks, i + 1, Set("endmacro"))
                  require(k < toks.length, "missing {% endmacro %}")
                  nodes += MacroN(n, params, b)
                  i = k + 1
                case _ => throw new IllegalArgumentException(s"bad macro tag: {% $body %}")
              }
            case other =>
              throw new IllegalArgumentException(s"unknown template tag: {% $other … %}")
          }
      }
    }
    require(stop.isEmpty, s"missing closing tag, expected one of: ${stop.mkString("/")}")
    (nodes.result(), toks.length)
  }

  // ---- evaluation ---------------------------------------------------------

  private def renderNodes(nodes: Vector[Node], scope: Scope): String = {
    val sb = new StringBuilder
    nodes.foreach {
      case TextN(s) => sb.append(s)
      case OutN(e)  => sb.append(stringify(evalIn(e, scope)))
      case SetN(n, e) => scope.set(n, evalIn(e, scope))
      case m: MacroN  => scope.macros(m.name) = m
      case IfN(branches) =>
        branches.find { case (cond, _) => cond.forall(c => truthy(evalIn(c, scope))) }
          .foreach { case (_, body) => sb.append(renderNodes(body, scope)) }
      case ForN(v, listExpr, body) =>
        val items = evalIn(listExpr, scope) match {
          case s: Seq[_] => s
          case other => throw new IllegalArgumentException(s"not iterable: $other")
        }
        items.zipWithIndex.foreach { case (item, idx) =>
          val loop = Map(
            "index" -> (idx + 1L), "index0" -> idx.toLong,
            "first" -> (idx == 0), "last" -> (idx == items.size - 1),
            "length" -> items.size.toLong)
          sb.append(renderNodes(body, scope.child(Map(v -> item, "loop" -> loop))))
        }
    }
    sb.toString
  }

  /** Invoke user macro `m`: bind args to params (defaults for the rest),
    * render its body. */
  private def callUserMacro(m: MacroN, args: Seq[Any], kwargs: Map[String, Any],
                            scope: Scope): String = {
    val bound = m.params.zipWithIndex.map { case ((name, dflt), i) =>
      val v: Any =
        if (i < args.length) args(i)
        else if (kwargs.contains(name)) kwargs(name)
        else dflt match {
          case Some(e) => evalIn(e, scope)
          case scala.None => throw new IllegalArgumentException(
            s"macro ${m.name}: missing argument '$name'")
        }
      name -> v
    }.toMap
    renderNodes(m.body, scope.child(bound)).trim
  }

  def truthy(v: Any): Boolean = v match {
    case null => false
    case b: Boolean => b
    case s: String => s.nonEmpty
    case n: Long => n != 0
    case n: Int => n != 0
    case d: Double => d != 0.0
    case s: Seq[_] => s.nonEmpty
    case m: Map[_, _] => m.nonEmpty
    case _ => true
  }

  private def stringify(v: Any): String = v match {
    case s: String => s
    case b: Boolean => b.toString
    case d: Double if d == d.floor && !d.isInfinite => d.toLong.toString
    case s: Seq[_] => s.map(stringify).mkString(", ")
    case other => String.valueOf(other)
  }

  private def evalIn(expr: String, scope: Scope): Any =
    new Parser(expr, scope).parseExpr()

  /** Public single-expression evaluation (builtin-macro calls included). */
  def eval(expr: String, ctx: Ctx): Any = evalIn(expr, new Scope(ctx))

  // ---- expression parser --------------------------------------------------

  private final class Parser(s: String, scope: Scope) {
    private var pos = 0

    def parseExpr(): Any = {
      skipWs()
      val v = parseOr()
      skipWs()
      require(pos >= s.length || peek == ',' || peek == ')' || peek == '=',
        s"unexpected trailing input in template expression: '${s.substring(pos)}'")
      v
    }

    private def peek: Char = if (pos < s.length) s.charAt(pos) else ' '
    private def skipWs(): Unit = while (pos < s.length && s.charAt(pos).isWhitespace) pos += 1

    private def tryKeyword(kw: String): Boolean = {
      skipWs()
      var j = pos
      while (j < s.length && (s.charAt(j).isLetterOrDigit || s.charAt(j) == '_')) j += 1
      if (s.substring(pos, j) == kw) { pos = j; true } else false
    }

    // jinja semantics: or/and return an OPERAND, not a Boolean —
    // `{{ var.suffix or 'dev' }}` renders the fallback string, never "true"
    private def parseOr(): Any = {
      var left = parseAnd()
      while (tryKeyword("or")) {
        val r = parseAnd() // always parse: no short-circuit skipping
        left = if (truthy(left)) left else r
      }
      left
    }

    private def parseAnd(): Any = {
      var left = parseNot()
      while (tryKeyword("and")) {
        val r = parseNot()
        left = if (truthy(left)) r else left
      }
      left
    }

    private def parseNot(): Any =
      if (tryKeyword("not")) !truthy(parseNot()) else parseCmp()

    private def parseCmp(): Any = {
      val left = parseAdd()
      skipWs()
      val op = Seq("==", "!=", ">=", "<=", ">", "<").find(o => s.startsWith(o, pos))
      op match {
        case Some(o) =>
          pos += o.length
          compare(left, parseAdd(), o)
        case scala.None =>
          if (tryKeyword("in")) {
            parseAdd() match {
              case coll: Seq[_] => coll.exists(x => looseEq(x, left))
              case str: String => str.contains(String.valueOf(left))
              case m: Map[_, _] => m.asInstanceOf[Map[String, Any]].contains(String.valueOf(left))
              case other => throw new IllegalArgumentException(s"'in' needs a collection, got $other")
            }
          } else left
      }
    }

    private def parseAdd(): Any = {
      var left = parseMul()
      var go = true
      while (go) {
        skipWs()
        peek match {
          case '+' => pos += 1; left = arith(left, parseMul(), "+")
          case '~' => pos += 1; left = stringify(left) + stringify(parseMul())
          case '-' => pos += 1; left = arith(left, parseMul(), "-")
          case _ => go = false
        }
      }
      left
    }

    private def parseMul(): Any = {
      var left = parsePrimary()
      var go = true
      while (go) {
        skipWs()
        peek match {
          case '*' => pos += 1; left = arith(left, parsePrimary(), "*")
          case '/' => pos += 1; left = arith(left, parsePrimary(), "/")
          case '%' => pos += 1; left = arith(left, parsePrimary(), "%")
          case _ => go = false
        }
      }
      left
    }

    def parsePrimary(): Any = {
      skipWs()
      peek match {
        case '\'' | '"' => parseString()
        case c if c.isDigit => parseNumber()
        case '-' => pos += 1; arith(0L, parsePrimary(), "-")
        case c if c.isLetter || c == '_' => parseIdentOrCall()
        case '[' => parseList()
        case '(' =>
          pos += 1
          val v = parseOr()
          skipWs(); require(peek == ')', s"expected ) in: $s"); pos += 1
          v
        case other => throw new IllegalArgumentException(s"bad template expression at '$other' in: $s")
      }
    }

    private def parseString(): String = {
      val quote = s.charAt(pos); pos += 1
      val sb = new StringBuilder
      while (pos < s.length && s.charAt(pos) != quote) { sb.append(s.charAt(pos)); pos += 1 }
      require(pos < s.length, s"unterminated string in: $s")
      pos += 1
      sb.toString
    }

    private def parseNumber(): Any = {
      val start = pos
      while (pos < s.length && (s.charAt(pos).isDigit || s.charAt(pos) == '.')) pos += 1
      val tok = s.substring(start, pos)
      if (tok.contains('.')) tok.toDouble else tok.toLong
    }

    private def parseList(): Seq[Any] = {
      pos += 1 // [
      val items = scala.collection.mutable.ArrayBuffer[Any]()
      skipWs()
      while (peek != ']') {
        items += parseOr()
        skipWs()
        if (peek == ',') { pos += 1; skipWs() }
      }
      pos += 1
      items.toSeq
    }

    private def parseIdentOrCall(): Any = {
      val start = pos
      while (pos < s.length && (s.charAt(pos).isLetterOrDigit || s.charAt(pos) == '_' || s.charAt(pos) == '.')) pos += 1
      val name = s.substring(start, pos)
      skipWs()
      if (peek == '(') {
        pos += 1
        val args = scala.collection.mutable.ArrayBuffer[Any]()
        val kwargs = scala.collection.mutable.LinkedHashMap[String, Any]()
        skipWs()
        while (peek != ')') {
          // kwarg? lookahead ident '='
          val save = pos
          var isKw = false
          var kwName = ""
          if (peek.isLetter || peek == '_') {
            val ks = pos
            while (pos < s.length && (s.charAt(pos).isLetterOrDigit || s.charAt(pos) == '_')) pos += 1
            kwName = s.substring(ks, pos)
            skipWs()
            if (peek == '=' && (pos + 1 >= s.length || s.charAt(pos + 1) != '=')) { isKw = true; pos += 1 }
            else pos = save
          }
          val v = parseOr()
          if (isKw) kwargs(kwName) = v else args += v
          skipWs()
          if (peek == ',') { pos += 1; skipWs() }
        }
        pos += 1
        val fnName = name.stripPrefix("bruin.")
        scope.macros.get(fnName) match {
          case Some(userMacro) => callUserMacro(userMacro, args.toSeq, kwargs.toMap, scope)
          case scala.None =>
            Macros.registry.get(fnName) match {
              case Some(fn) => fn(args.toSeq, kwargs.toMap)
              case scala.None => throw new IllegalArgumentException(s"unknown template function: $name")
            }
        }
      } else lookup(name)
    }

    private def lookup(name: String): Any = {
      val parts = name.split('.')
      var cur: Any = scope.get(parts.head).getOrElse(
        if (parts.head == "true") true
        else if (parts.head == "false") false
        else throw new NoSuchElementException(s"undefined template variable: ${parts.head}"))
      parts.tail.foreach { p =>
        cur = cur match {
          case m: Map[_, _] => m.asInstanceOf[Map[String, Any]].getOrElse(p,
            throw new NoSuchElementException(s"undefined template variable: $name"))
          case other => throw new NoSuchElementException(s"cannot deref '$p' on $other")
        }
      }
      cur
    }
  }

  // ---- operator helpers ---------------------------------------------------

  private def num(v: Any): Option[Double] = v match {
    case n: Long => Some(n.toDouble)
    case n: Int => Some(n.toDouble)
    case n: Double => Some(n)
    case s: String if s.matches("-?\\d+(\\.\\d+)?") => Some(s.toDouble)
    case _ => scala.None
  }

  private def looseEq(a: Any, b: Any): Boolean = (num(a), num(b)) match {
    case (Some(x), Some(y)) => x == y
    case _ => String.valueOf(a) == String.valueOf(b)
  }

  private def compare(a: Any, b: Any, op: String): Boolean = op match {
    case "==" => looseEq(a, b)
    case "!=" => !looseEq(a, b)
    case _ =>
      val c = (num(a), num(b)) match {
        case (Some(x), Some(y)) => x.compareTo(y)
        case _ => String.valueOf(a).compareTo(String.valueOf(b))
      }
      op match {
        case ">" => c > 0
        case ">=" => c >= 0
        case "<" => c < 0
        case "<=" => c <= 0
      }
  }

  private def arith(a: Any, b: Any, op: String): Any = (num(a), num(b)) match {
    case (Some(x), Some(y)) =>
      val r = op match {
        case "+" => x + y; case "-" => x - y; case "*" => x * y
        case "/" => x / y; case "%" => x % y
      }
      (a, b) match {
        case (_: Long, _: Long) if op != "/" => r.toLong
        case _ => r
      }
    case _ if op == "+" => stringify(a) + stringify(b)
    case _ => throw new IllegalArgumentException(s"non-numeric operands for $op: $a, $b")
  }
}

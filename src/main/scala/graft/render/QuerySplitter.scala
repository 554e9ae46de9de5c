package graft.render

/** Multi-statement splitting + comment stripping (reference
  * pkg/query/extract.go:116-337 stripSQLComments, :359-408 splitQueries):
  * split on ';' while respecting single/double quotes, $$-quoted blocks and
  * line/block comments; strip comments outside strings. Pure string
  * algorithm — runs on the driver before any Spark call.
  */
object QuerySplitter {

  def stripComments(sql: String): String = {
    val sb = new StringBuilder
    var i = 0
    val n = sql.length
    var inSingle = false
    var inDouble = false
    while (i < n) {
      val c = sql.charAt(i)
      if (inSingle) {
        sb.append(c)
        if (c == '\'') {
          if (i + 1 < n && sql.charAt(i + 1) == '\'') { sb.append('\''); i += 1 }
          else inSingle = false
        }
        i += 1
      } else if (inDouble) {
        sb.append(c); if (c == '"') inDouble = false; i += 1
      } else if (c == '\'') { inSingle = true; sb.append(c); i += 1 }
      else if (c == '"') { inDouble = true; sb.append(c); i += 1 }
      else if (c == '-' && i + 1 < n && sql.charAt(i + 1) == '-') {
        while (i < n && sql.charAt(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < n && sql.charAt(i + 1) == '*') {
        var depth = 1; i += 2
        while (i < n && depth > 0) {
          if (sql.charAt(i) == '/' && i + 1 < n && sql.charAt(i + 1) == '*') { depth += 1; i += 2 }
          else if (sql.charAt(i) == '*' && i + 1 < n && sql.charAt(i + 1) == '/') { depth -= 1; i += 2 }
          else i += 1
        }
        sb.append(' ')
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  def split(sql: String): Seq[String] = {
    val stripped = stripComments(sql)
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val cur = new StringBuilder
    var i = 0
    val n = stripped.length
    var inSingle = false
    var inDouble = false
    var inDollar = false
    while (i < n) {
      val c = stripped.charAt(i)
      if (inSingle) {
        cur.append(c)
        if (c == '\'') {
          if (i + 1 < n && stripped.charAt(i + 1) == '\'') { cur.append('\''); i += 1 }
          else inSingle = false
        }
        i += 1
      } else if (inDouble) { cur.append(c); if (c == '"') inDouble = false; i += 1 }
      else if (inDollar) {
        cur.append(c)
        if (c == '$' && i + 1 < n && stripped.charAt(i + 1) == '$') { cur.append('$'); i += 1; inDollar = false }
        i += 1
      } else c match {
        case '\'' => inSingle = true; cur.append(c); i += 1
        case '"'  => inDouble = true; cur.append(c); i += 1
        case '$' if i + 1 < n && stripped.charAt(i + 1) == '$' =>
          inDollar = true; cur.append("$$"); i += 2
        case ';' =>
          val stmt = cur.toString.trim
          if (stmt.nonEmpty) out += stmt
          cur.clear(); i += 1
        case _ => cur.append(c); i += 1
      }
    }
    val last = cur.toString.trim
    if (last.nonEmpty) out += last
    out.toSeq
  }

  /** AddLimit (reference parser.go:414-428): wrap a SELECT with a limit. */
  def addLimit(sql: String, limit: Int): String =
    s"SELECT * FROM (${sql.trim.stripSuffix(";")}) __graft_limited LIMIT $limit"

  /** IsSingleSelectQuery (parser.go:480-513). */
  def isSingleSelect(sql: String): Boolean = {
    val stmts = split(sql)
    stmts.size == 1 && {
      val s = stmts.head.toLowerCase.trim
      s.startsWith("select") || s.startsWith("with") || s.startsWith("(")
    }
  }
}

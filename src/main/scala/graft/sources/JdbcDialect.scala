package graft.sources

/** Per-dialect SQL generation for source-database extraction — the three
  * concrete database shapes the reference ships helpers for
  * (utils/extract_data/aje_libs/bd/helpers/database/{oracle,mysql,
  * sqlserver}_helper.py, dispatched by endpoint BD_TYPE in
  * load_with_query_python.py:92-127) plus the per-type date-literal
  * rendering its change_date_format performs
  * (load_with_query_python.py:379-404). Everything here is standard
  * public dialect SQL:
  *
  *  - first-N (probe/sample pagination): Oracle wraps with
  *    `ROWNUM <= n`, SQL Server prefixes `TOP (n)`, MySQL appends
  *    `LIMIT n`;
  *  - typed date literals for the incremental window: Oracle
  *    `TO_DATE`/`TO_TIMESTAMP`, SQL Server `CONVERT(smalldatetime|
  *    DATETIME, ...)`, MySQL quoted ISO literals, epoch-seconds
  *    passthrough for BIGINT filter columns;
  *  - connectivity probes: `SELECT 1 FROM DUAL` where a FROM clause is
  *    mandatory, plain `SELECT 1` elsewhere;
  *  - driver class + JDBC URL shapes as the reference configures them.
  */
sealed trait JdbcDialect {
  def name: String
  def driver: String
  def url(server: String, port: Int, database: String): String

  /** First-N wrapper over a full SELECT — the dialect's pagination for
    * bound probes and sampled extractions. `query` is a complete SELECT
    * statement (not a derived-table alias form). */
  def firstN(query: String, n: Int): String

  /** Render the incremental window's date boundary as a typed literal.
    * `filterType` uses the reference's FILTER_TYPE vocabulary; values
    * are `yyyy-MM-dd HH:mm:ss[.SSSSSS]` strings except BIGINT, which is
    * already epoch seconds. Unknown types refuse loudly — a silently
    * unquoted literal is a syntax error at best and an injection at
    * worst. */
  def dateLiteral(filterType: String, value: String): String

  /** The no-op connectivity probe. */
  def probeSql: String = "SELECT 1"
}

object JdbcDialect {
  /** BD_TYPE vocabulary of the reference's endpoint records. */
  def forName(name: String): JdbcDialect = name.trim.toLowerCase match {
    case "oracle" => OracleDialect
    case "mssql" | "sqlserver" => SqlServerDialect
    case "mysql" => MySqlDialect
    case other => throw new IllegalArgumentException(
      s"unknown BD_TYPE '$other' — expected oracle | mssql | mysql")
  }

  private[sources] def refuse(dialect: String, filterType: String): Nothing =
    throw new IllegalArgumentException(
      s"$dialect cannot render FILTER_TYPE '$filterType' — " +
        "add an explicit literal form rather than risk unquoted SQL")

  private val DatetimeValue =
    """\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}(?:\.\d{1,6})?""".r
  private val NumericValue = """-?\d{1,19}""".r

  /** Boundary values are interpolated into quoted SQL literals, so they
    * must be shaped like the reference's window strings
    * (`yyyy-MM-dd HH:mm:ss[.SSSSSS]`) — anything else (including a value
    * carrying a quote) refuses rather than emitting injectable SQL. */
  private[sources] def requireDatetime(dialect: String, value: String): String = {
    require(DatetimeValue.pattern.matcher(value).matches(),
      s"$dialect date boundary '$value' is not a yyyy-MM-dd HH:mm:ss[.ffffff] " +
        "window string — refusing to interpolate into a SQL literal")
    value
  }

  /** BIGINT filter columns hold epoch seconds. The reference's
    * change_date_format accepts the same `yyyy-MM-dd HH:mm:ss` window
    * string here and converts it with local-zone datetime.timestamp()
    * (load_with_query_python.py:394-399); a value that is already
    * numeric passes through. Anything else refuses — the emitted
    * predicate is unquoted. */
  private[sources] def epochSeconds(dialect: String, value: String): String =
    value match {
      case NumericValue() => value
      case DatetimeValue() =>
        val ldt = java.time.LocalDateTime.parse(
          value.take(19).replace(' ', 'T'))
        ldt.atZone(java.time.ZoneId.systemDefault()).toEpochSecond.toString
      case other => throw new IllegalArgumentException(
        s"$dialect BIGINT boundary '$other' is neither epoch seconds nor a " +
          "yyyy-MM-dd HH:mm:ss window string")
    }

  private val SelectHead = """(?is)^\s*SELECT\b.*""".r
  /** True iff the statement's head keyword is SELECT (case-insensitive,
    * leading whitespace allowed). CTE (`WITH ...`) and DML heads refuse
    * in dialects that must splice into the head clause. */
  private[sources] def startsWithSelect(query: String): Boolean =
    SelectHead.pattern.matcher(query).matches()
}

case object OracleDialect extends JdbcDialect {
  val name = "oracle"
  val driver = "oracle.jdbc.driver.OracleDriver"
  def url(server: String, port: Int, database: String): String =
    s"jdbc:oracle:thin:@//$server:$port/$database" // service-name form
  def firstN(query: String, n: Int): String =
    s"SELECT * FROM ($query) WHERE ROWNUM <= $n"
  def dateLiteral(filterType: String, value: String): String =
    filterType match {
      case "DATE" =>
        val v = JdbcDialect.requireDatetime(name, value)
        s"TO_DATE('${v.take(19)}', 'YYYY-MM-DD HH24:MI:SS')"
      case "TIMESTAMP(6)" =>
        s"TO_TIMESTAMP('${JdbcDialect.requireDatetime(name, value)}', 'YYYY-MM-DD HH24:MI:SS.FF')"
      case "BIGINT" => JdbcDialect.epochSeconds(name, value)
      case other => JdbcDialect.refuse(name, other)
    }
  override def probeSql: String = "SELECT 1 FROM DUAL"
}

case object SqlServerDialect extends JdbcDialect {
  val name = "mssql"
  val driver = "com.microsoft.sqlserver.jdbc.SQLServerDriver"
  def url(server: String, port: Int, database: String): String =
    s"jdbc:sqlserver://$server:$port;databaseName=$database"
  def firstN(query: String, n: Int): String = {
    // TOP belongs to the statement-head SELECT only. A CTE
    // (`WITH x AS (SELECT ...) SELECT ...`) has no head SELECT to
    // splice into — injecting after the first inner SELECT would
    // silently limit the CTE instead of the result — so refuse
    // anything whose head keyword is not SELECT.
    require(JdbcDialect.startsWithSelect(query),
      s"$name firstN requires a statement starting with SELECT " +
        s"(wrap CTEs as SELECT * FROM (...)): $query")
    val m = java.util.regex.Pattern.compile("(?i)SELECT").matcher(query)
    m.find() // guaranteed by the require; anchored at the head
    query.substring(0, m.end) + s" TOP ($n)" + query.substring(m.end)
  }
  def dateLiteral(filterType: String, value: String): String =
    filterType match {
      case "smalldatetime" =>
        s"CONVERT(smalldatetime, '${JdbcDialect.requireDatetime(name, value)}', 120)"
      case "SQL_DATETIME" =>
        s"CONVERT(DATETIME, '${JdbcDialect.requireDatetime(name, value)}', 102)"
      case "BIGINT" => JdbcDialect.epochSeconds(name, value)
      case other => JdbcDialect.refuse(name, other)
    }
}

case object MySqlDialect extends JdbcDialect {
  val name = "mysql"
  val driver = "com.mysql.cj.jdbc.Driver"
  def url(server: String, port: Int, database: String): String =
    s"jdbc:mysql://$server:$port/$database?characterEncoding=utf8mb4"
  def firstN(query: String, n: Int): String = s"$query LIMIT $n"
  def dateLiteral(filterType: String, value: String): String =
    filterType match {
      // MySQL accepts ISO datetime literals directly; timestamp
      // microseconds included
      case "DATE" | "DATETIME" =>
        s"'${JdbcDialect.requireDatetime(name, value).take(19)}'"
      case "TIMESTAMP(6)" => s"'${JdbcDialect.requireDatetime(name, value)}'"
      case "BIGINT" => JdbcDialect.epochSeconds(name, value)
      case other => JdbcDialect.refuse(name, other)
    }
}

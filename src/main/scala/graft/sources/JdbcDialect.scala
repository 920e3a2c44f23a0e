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
        s"TO_DATE('${value.take(19)}', 'YYYY-MM-DD HH24:MI:SS')"
      case "TIMESTAMP(6)" =>
        s"TO_TIMESTAMP('$value', 'YYYY-MM-DD HH24:MI:SS.FF')"
      case "BIGINT" => value
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
    // TOP goes right after the first SELECT keyword of the outer query
    val at = query.indexOf("SELECT")
    require(at >= 0, s"not a SELECT: $query")
    query.substring(0, at + 6) + s" TOP ($n)" + query.substring(at + 6)
  }
  def dateLiteral(filterType: String, value: String): String =
    filterType match {
      case "smalldatetime" => s"CONVERT(smalldatetime, '$value', 120)"
      case "SQL_DATETIME" => s"CONVERT(DATETIME, '$value', 102)"
      case "BIGINT" => value
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
      case "DATE" | "DATETIME" => s"'${value.take(19)}'"
      case "TIMESTAMP(6)" => s"'$value'"
      case "BIGINT" => value
      case other => JdbcDialect.refuse(name, other)
    }
}

package graft

import java.sql.DriverManager
import java.util.Properties

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{JdbcExtract, JdbcServing}
import graft.sources.JdbcExtract.Extract

/** JDBC extraction against a real (embedded Derby) database: partitioned
  * range scan, bound probing with the reference's sentinel filter,
  * predicate pushdown into the generated SQL, and the serving loader's
  * existence-probe preaction edges. */
class JdbcExtractSpec extends AnyFunSuite {
  import TestSpark._

  private val url = "jdbc:derby:memory:graft_extract;create=true"
  private val props = {
    val p = new Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  private lazy val seeded: Unit = {
    val c = DriverManager.getConnection(url)
    val st = c.createStatement()
    st.execute("CREATE TABLE ventas (id INT, cod_compania VARCHAR(4), imp DOUBLE)")
    val ins = c.prepareStatement("INSERT INTO ventas VALUES (?, ?, ?)")
    // id 0 is the BigMagic-style sentinel the bounds probe must skip
    (0 to 100).foreach { i =>
      ins.setInt(1, i); ins.setString(2, f"${i % 4}%02d"); ins.setDouble(3, i * 1.5)
      ins.addBatch()
    }
    ins.executeBatch()
    st.close(); c.close()
  }

  test("partitioned extract reads every row across the requested ranges") {
    seeded
    val df = JdbcExtract.read(spark, url, props, Extract(
      query = "SELECT id, cod_compania, imp FROM ventas",
      partitionColumn = Some("id"), numPartitions = 4,
      boundsProbeFilter = Some("id <> 0")))
    assert(df.rdd.getNumPartitions == 4)
    // the probe excluded id=0 from the BOUNDS, but Spark's unbounded
    // first/last ranges still capture it (and MIN/MAX rows) in the scan
    assert(df.count() == 101)
    assert(df.selectExpr("min(id)", "max(id)").collect()
      .map(r => (r.getInt(0), r.getInt(1))).head == ((0, 100)))
  }

  test("business filter rides inside the subquery; explicit bounds skip the probe") {
    seeded
    val df = JdbcExtract.read(spark, url, props, Extract(
      query = "SELECT id, cod_compania, imp FROM ventas",
      partitionColumn = Some("id"), numPartitions = 3,
      filter = Some("cod_compania = '01'"), bounds = Some((1L, 100L))))
    val ids = df.select("id").collect().map(_.getInt(0)).sorted
    assert(ids.toSeq == (0 to 100).filter(_ % 4 == 1))
  }

  test("later .filter pushes down into the generated source SQL") {
    seeded
    val df = JdbcExtract.read(spark, url, props, Extract(
      query = "SELECT id, cod_compania, imp FROM ventas",
      partitionColumn = Some("id"), numPartitions = 2,
      boundsProbeFilter = Some("id <> 0")))
      .filter("imp > 90.0")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("GreaterThan(IMP,90.0)"),
      s"filter not pushed to the JDBC scan:\n$scan")
    assert(df.count() == (0 to 100).count(_ * 1.5 > 90.0))
  }

  test("bounds probe fails loudly when the probe filter matches nothing") {
    seeded
    val e = intercept[Exception] {
      JdbcExtract.read(spark, url, props, Extract(
        query = "SELECT id, cod_compania, imp FROM ventas",
        partitionColumn = Some("id"),
        filter = Some("cod_compania = 'ZZ'")))
    }
    assert(e.getMessage.contains("bounds probe"))
  }

  test("serving preaction: existence probe falls back to the no-op select 1") {
    // reference common_jobs_functions.py:511-549 — stage loader's
    // compania×fecha dual-filter delete, single vs multi element shapes
    val one = JdbcServing.effectivePreaction("stage_t",
      Seq("cod_compania" -> Seq("01"), "fecha" -> Seq("2024-01-01")),
      tableExists = _ => true)
    assert(one.contains(
      "DELETE FROM stage_t WHERE cod_compania IN ('01') AND fecha IN ('2024-01-01');"))
    val many = JdbcServing.effectivePreaction("stage_t",
      Seq("cod_compania" -> Seq("01", "02"), "fecha" -> Seq("2024-01-01", "2024-01-02")),
      tableExists = _ => true)
    assert(many.contains(
      "DELETE FROM stage_t WHERE cod_compania IN ('01', '02') " +
        "AND fecha IN ('2024-01-01', '2024-01-02');"))
    // table missing: the DELETE collapses to the reference's dummy query
    assert(JdbcServing.effectivePreaction("stage_t",
      Seq("cod_compania" -> Seq("01")), tableExists = _ => false)
      .contains("select 1;"))
    // no filters: plain append — no probe, no preaction
    assert(JdbcServing.effectivePreaction("stage_t", Nil,
      tableExists = _ => sys.error("must not probe")).isEmpty)
  }

  test("reference table-config row compiles to the reference's generated SQL") {
    // one row of datalake_tables_bigmagic.csv, abbreviated: the rendered
    // pieces must match load_with_query_python.py's construction
    // (ID_COLUMN prepended :345, FROM + JOIN_EXPR :348, FILTER_EXP
    // appended :352, {0}/{1} window binding :357, pc <> 0 probe :310)
    val cfg = Map(
      "COLUMNS" -> "t2.compania compania, t2.importe importe",
      "ID_COLUMN" -> "t2.nropedido",
      "SOURCE_SCHEMA" -> "dbo",
      "SOURCE_TABLE" -> "tpedid7f t2",
      "JOIN_EXPR" -> "inner join dbo.tpedid1f t on t.nropedido = t2.nropedido",
      "FILTER_COLUMN" -> "fechapedid between {0} and {1}",
      "FILTER_EXP" -> "t2.compania in (select compania from dbo.mcompa1f b where b.flgbi = 'a')")
    val e = JdbcExtract.fromTableConfig(cfg,
      partitionColumn = Some("t2.nropedido"), numPartitions = 10,
      window = Some(("20240101", "20240131")))
    assert(e.query ==
      "SELECT t2.nropedido as id, t2.compania compania, t2.importe importe " +
        "FROM dbo.tpedid7f t2 inner join dbo.tpedid1f t on t.nropedido = t2.nropedido")
    // each predicate individually parenthesized: an OR inside FILTER_EXP
    // must not capture the window predicate by AND precedence
    assert(e.filter.contains(
      "(t2.compania in (select compania from dbo.mcompa1f b where b.flgbi = 'a'))" +
        " AND (fechapedid between 20240101 and 20240131)"))
    assert(e.boundsProbeFilter.contains("t2.nropedido <> 0"))
    assert(e.numPartitions == 10)
    // no window bound → the incremental predicate is dropped, the
    // standing business filter stays (full-load path)
    val full = JdbcExtract.fromTableConfig(cfg)
    assert(full.filter.contains(
      "(t2.compania in (select compania from dbo.mcompa1f b where b.flgbi = 'a'))"))
    assert(!full.filter.get.contains("fechapedid"))
  }

  test("dialect matrix: driver/url, first-N pagination, typed date literals, probes") {
    import graft.sources.{JdbcDialect, MySqlDialect, OracleDialect, SqlServerDialect}
    // BD_TYPE dispatch (load_with_query_python.py:92-127 vocabulary)
    assert(JdbcDialect.forName("oracle") == OracleDialect)
    assert(JdbcDialect.forName("MSSQL") == SqlServerDialect)
    assert(JdbcDialect.forName("sqlserver") == SqlServerDialect)
    assert(JdbcDialect.forName("mysql") == MySqlDialect)
    intercept[IllegalArgumentException](JdbcDialect.forName("postgres"))
    // driver + URL shapes as the reference configures them
    assert(OracleDialect.driver == "oracle.jdbc.driver.OracleDriver")
    assert(OracleDialect.url("db1", 1521, "PROD") ==
      "jdbc:oracle:thin:@//db1:1521/PROD")
    assert(SqlServerDialect.driver == "com.microsoft.sqlserver.jdbc.SQLServerDriver")
    assert(SqlServerDialect.url("db2", 1433, "ventas") ==
      "jdbc:sqlserver://db2:1433;databaseName=ventas")
    assert(MySqlDialect.driver == "com.mysql.cj.jdbc.Driver")
    assert(MySqlDialect.url("db3", 3306, "raw") ==
      "jdbc:mysql://db3:3306/raw?characterEncoding=utf8mb4")
    // first-N pagination per dialect
    val q = "SELECT a, b FROM t WHERE x > 0"
    assert(OracleDialect.firstN(q, 10) ==
      s"SELECT * FROM ($q) WHERE ROWNUM <= 10")
    assert(SqlServerDialect.firstN(q, 10) ==
      "SELECT TOP (10) a, b FROM t WHERE x > 0")
    assert(MySqlDialect.firstN(q, 10) == s"$q LIMIT 10")
    // typed date literals (the reference's change_date_format matrix,
    // load_with_query_python.py:379-404)
    val v = "2024-01-31 23:59:59.123456"
    assert(OracleDialect.dateLiteral("DATE", v) ==
      "TO_DATE('2024-01-31 23:59:59', 'YYYY-MM-DD HH24:MI:SS')")
    assert(OracleDialect.dateLiteral("TIMESTAMP(6)", v) ==
      s"TO_TIMESTAMP('$v', 'YYYY-MM-DD HH24:MI:SS.FF')")
    assert(SqlServerDialect.dateLiteral("smalldatetime", v) ==
      s"CONVERT(smalldatetime, '$v', 120)")
    assert(SqlServerDialect.dateLiteral("SQL_DATETIME", v) ==
      s"CONVERT(DATETIME, '$v', 102)")
    assert(MySqlDialect.dateLiteral("DATE", v) == "'2024-01-31 23:59:59'")
    assert(Seq(OracleDialect, SqlServerDialect, MySqlDialect)
      .forall(_.dateLiteral("BIGINT", "1706655600") == "1706655600"))
    // unknown FILTER_TYPE refuses loudly, never emits unquoted SQL
    intercept[IllegalArgumentException](
      OracleDialect.dateLiteral("smalldatetime", v))
    intercept[IllegalArgumentException](
      SqlServerDialect.dateLiteral("TIMESTAMP(6)", v))
    // probes: Oracle needs a FROM
    assert(OracleDialect.probeSql == "SELECT 1 FROM DUAL")
    assert(SqlServerDialect.probeSql == "SELECT 1" &&
      MySqlDialect.probeSql == "SELECT 1")
  }

  test("dialect hardening: head-anchored TOP, literal validation, BIGINT window conversion") {
    import graft.sources.{MySqlDialect, OracleDialect, SqlServerDialect}
    // TOP anchors to the statement-head SELECT, case-insensitively
    assert(SqlServerDialect.firstN("select a from t", 5) ==
      "select TOP (5) a from t")
    assert(SqlServerDialect.firstN("  SELECT a FROM t", 5) ==
      "  SELECT TOP (5) a FROM t")
    // a CTE head must refuse — splicing TOP into the inner SELECT would
    // silently limit the CTE instead of the result
    intercept[IllegalArgumentException](SqlServerDialect.firstN(
      "WITH x AS (SELECT a FROM t) SELECT * FROM x", 5))
    intercept[IllegalArgumentException](
      SqlServerDialect.firstN("DELETE FROM t", 5))
    // boundary values interpolated into quoted literals must be window
    // strings; a quote-bearing value refuses instead of emitting
    // injectable SQL
    Seq(OracleDialect, SqlServerDialect, MySqlDialect).foreach { d =>
      val ft = d match {
        case OracleDialect => "DATE"
        case SqlServerDialect => "smalldatetime"
        case MySqlDialect => "DATE"
      }
      intercept[IllegalArgumentException](
        d.dateLiteral(ft, "2024-01-01 00:00:00' OR '1'='1"))
      intercept[IllegalArgumentException](d.dateLiteral(ft, "not-a-date"))
    }
    // BIGINT accepts the reference's datetime window string and converts
    // to epoch seconds (change_date_format, load_with_query_python.py:
    // 394-399 — local-zone datetime.timestamp()); verified against the
    // independent java.sql local-zone parse
    val win = "2024-01-31 23:59:59"
    val expected = (java.sql.Timestamp.valueOf(win).getTime / 1000L).toString
    Seq(OracleDialect, SqlServerDialect, MySqlDialect).foreach { d =>
      assert(d.dateLiteral("BIGINT", win) == expected)
      // non-numeric, non-window values refuse (the predicate is unquoted)
      intercept[IllegalArgumentException](d.dateLiteral("BIGINT", "1; DROP"))
    }
  }

  test("dialect-typed window renders into the incremental predicate; sample query paginates") {
    import graft.sources.{MySqlDialect, OracleDialect, SqlServerDialect}
    val base = Map(
      "COLUMNS" -> "compania, importe",
      "SOURCE_SCHEMA" -> "dbo", "SOURCE_TABLE" -> "tventas",
      "FILTER_COLUMN" -> "fecha_crea,fecha_mod", "FILTER_TYPE" -> "smalldatetime")
    val w = Some(("2024-01-01 00:00:00", "2024-01-31 23:59:59"))
    val ms = JdbcExtract.fromTableConfig(base, window = w,
      dialect = Some(SqlServerDialect))
    // dual-column form: either column in-window (reference
    // get_query_for_date_range:368-373), typed boundaries
    assert(ms.filter.contains(
      "((fecha_crea IS NOT NULL AND fecha_crea BETWEEN " +
        "CONVERT(smalldatetime, '2024-01-01 00:00:00', 120) AND " +
        "CONVERT(smalldatetime, '2024-01-31 23:59:59', 120)) OR " +
        "(fecha_mod IS NOT NULL AND fecha_mod BETWEEN " +
        "CONVERT(smalldatetime, '2024-01-01 00:00:00', 120) AND " +
        "CONVERT(smalldatetime, '2024-01-31 23:59:59', 120)))"))
    // bare-column + Oracle DATE
    val ora = JdbcExtract.fromTableConfig(
      base + ("FILTER_COLUMN" -> "fecha", "FILTER_TYPE" -> "DATE"),
      window = w, dialect = Some(OracleDialect))
    assert(ora.filter.contains(
      "(fecha IS NOT NULL AND fecha BETWEEN " +
        "TO_DATE('2024-01-01 00:00:00', 'YYYY-MM-DD HH24:MI:SS') AND " +
        "TO_DATE('2024-01-31 23:59:59', 'YYYY-MM-DD HH24:MI:SS'))"))
    // sampled extraction paginates per dialect and keeps the filter
    val s = JdbcExtract.sampleQuery(ora, MySqlDialect, 100)
    assert(s.startsWith("(SELECT * FROM (SELECT compania, importe FROM dbo.tventas) q WHERE ("))
    assert(s.endsWith(") LIMIT 100) graft_sample"))
    val so = JdbcExtract.sampleQuery(ora, OracleDialect, 5)
    assert(so.contains("WHERE ROWNUM <= 5") && so.endsWith(") graft_sample"))
  }

  test("config-driven extract runs end to end against the database") {
    seeded
    val cfg = Map("COLUMNS" -> "cod_compania, imp", "ID_COLUMN" -> "id",
      "SOURCE_TABLE" -> "ventas", "FILTER_EXP" -> "imp >= 0")
    val e = JdbcExtract.fromTableConfig(cfg,
      partitionColumn = Some("id"), numPartitions = 4)
    val df = JdbcExtract.read(spark, url, props, e)
    assert(df.columns.map(_.toLowerCase).toSeq == Seq("id", "cod_compania", "imp"))
    // the sentinel only shapes the BOUNDS; row id=0 still arrives via the
    // unbounded first range partition
    assert(df.count() == 101)
  }

  test("probeViaJdbc answers through a real connection") {
    seeded
    val probe = JdbcServing.probeViaJdbc(spark, url, props,
      t => s"(SELECT 1 AS one FROM $t FETCH FIRST 1 ROWS ONLY) graft_probe")
    assert(probe("ventas"))
    assert(!probe("no_such_table"))
  }

  test("staged bulk load: manifest covers exactly the part files, COPY after DELETE") {
    import spark.implicits._
    val df = Seq(
      (1L, "a|b", Option("x"), BigDecimal("12.340000")),
      (2L, "c\"d", None, BigDecimal("-0.500000")),
      (3L, "plain", Option("z"), BigDecimal("7.000000"))
    ).toDF("id", "txt", "opt", "imp")
      .select($"id", $"txt", $"opt", $"imp".cast("decimal(18,6)").as("imp"))
      .repartition(2)
    val staging = java.nio.file.Files.createTempDirectory("graft-copy").toString
    val ran = scala.collection.mutable.ArrayBuffer[String]()
    val staged = JdbcServing.bulkLoad(df, "analytics.fact_x", staging,
      filters = Seq("id_periodo" -> Seq("199504")))(ran += _)
    // statement ORDER is the loader's contract: slice delete, then COPY
    assert(ran.size == 2)
    assert(ran(0).startsWith("DELETE FROM analytics.fact_x WHERE id_periodo IN ('199504')"))
    assert(ran(1) == staged.copySql)
    assert(staged.copySql.startsWith(
      "COPY analytics.fact_x (id, txt, opt, imp) FROM '") &&
      staged.copySql.contains("MANIFEST") && staged.copySql.contains("GZIP"))
    // the manifest names exactly the staged part files, all mandatory —
    // a stale file in the staging prefix can never leak into the load
    val manifest = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(staged.manifestPath)), "UTF-8")
    val mNode = com.fasterxml.jackson.databind.json.JsonMapper.builder()
      .build().readTree(manifest)
    val entries = mNode.get("entries").elements()
    var nMand = 0
    while (entries.hasNext) {
      val e = entries.next()
      assert(e.get("mandatory").asBoolean(), "every entry must be mandatory")
      nMand += 1
    }
    assert(nMand == staged.files.size)
    staged.files.foreach(f => assert(manifest.contains(f)))
    assert(staged.files.nonEmpty && staged.files.forall(_.contains("part-")))
    // round-trip: the staged CSV re-reads bit-equal under the declared
    // conventions (delimiter in data, quotes, nulls, decimals)
    val back = JdbcServing.readStaged(spark, staging, df.schema)
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
  }
}

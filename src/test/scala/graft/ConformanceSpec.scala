package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Conformance
import graft.sources.Conformance.Col

/** The declarative conformance interpreter: reference formula pins
  * (default/literal/fecha/hora/get_date dispatch, numeric parsing) and the
  * headline law — q3's hand-written dim build is reproducible from pure
  * metadata, bit-equal. */
class ConformanceSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("q3 dim build from a declarative spec is bit-equal to the hand-written form") {
    val cst = graft.core.Tables.customer(spark, sf)
    val nat = graft.core.Tables.nation(spark, sf)
    val reg = graft.core.Tables.region(spark, sf)
    val joined = cst
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"), "left")
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"), "left")
    // the spec a metadata table would carry for this dim — adding a
    // conformed table means writing rows like these, not Scala
    val spec = Seq(
      Col("id_cliente", "c_custkey,c_nationkey", function = "surrogate"),
      Col("cod_cliente", "c_custkey", "bigint"),
      Col("desc_cliente", "c_name", "varchar", function = "upper_trim"),
      Col("desc_nacion", "n_name", "varchar", "NATION DEFAULT", "coalesce_default"),
      Col("desc_region", "r_name", "varchar", "REGION DEFAULT", "coalesce_default"),
      Col("desc_segmento", "c_mktsegment", "varchar", function = "upper_trim"),
      Col("imp_saldo", "c_acctbal", "double precision"),
      Col("es_moroso", "c_acctbal", "integer", function = "flag_negative"))
    val declared = Conformance.conform(joined, spec)
    val handWritten = graft.pipeline.CoreQueries.q3DimConform(spark, sf)
    assert(declared.columns.toSeq == handWritten.columns.toSeq)
    assert(declared.schema == handWritten.schema,
      s"schema drift:\n${declared.schema}\nvs\n${handWritten.schema}")
    assert(declared.exceptAll(handWritten).isEmpty
      && handWritten.exceptAll(declared).isEmpty,
      "declared conformance must be value-identical to the hand-written dim")
    // one projection, no quadratic plans, still a broadcast star join
    val plan = declared.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }

  test("default dispatch: literal wins, 'null' means NULL, types follow the redshift vocabulary") {
    val df = Seq(("7", "x")).toDF("a", "b")
    val out = Conformance.conform(df, Seq(
      Col("s", "a", "character varying"),
      Col("i", "a", "integer"),
      Col("small", "a", "smallint"),            // widens to int, like the reference
      Col("n", "a", "numeric(16,4)"),
      Col("nd", "a", "numeric"),                // default precision 38,12
      Col("lit_s", "", "varchar", "PE"),        // literal wins
      Col("lit_null", "a", "varchar", "null"),  // literal "null" -> SQL NULL
      Col("d", "", "double precision", "2.5")))
    val r = out.head()
    assert(out.schema.map(f => (f.name, f.dataType.simpleString)) == Seq(
      "s" -> "string", "i" -> "int", "small" -> "int",
      "n" -> "decimal(16,4)", "nd" -> "decimal(38,12)",
      "lit_s" -> "string", "lit_null" -> "string", "d" -> "double"))
    assert(r.getString(0) == "7" && r.getInt(1) == 7 && r.getInt(2) == 7)
    assert(r.getDecimal(3).toPlainString == "7.0000")
    assert(r.getString(5) == "PE" && r.isNullAt(6) && r.getDouble(7) == 2.5)
  }

  test("fecha/hora bigmagic and get_date dispatch match the Periods formulas") {
    val df = Seq("2024-02-29 18:30:15").toDF("s")
      .select(to_timestamp($"s").as("ts"))
    val out = Conformance.conform(df, Seq(
      Col("fecha", "ts", "integer", function = "convert_fecha_bigmagic"),
      Col("hora", "ts", "varchar", function = "convert_hora_bigmagic"),
      Col("carga_s", "", "varchar", function = "get_date"),
      Col("carga_i", "", "integer", function = "get_date"),
      Col("carga_d", "", "date", function = "get_date")),
      today = "2026-08-13")
    val r = out.head()
    // 2008-01-01 -> 733042; 2024-02-29 is 5903 days later
    assert(r.getInt(0) == 733042 + java.time.temporal.ChronoUnit.DAYS.between(
      java.time.LocalDate.parse("2008-01-01"), java.time.LocalDate.parse("2024-02-29")).toInt)
    assert(r.getString(1) == "183015")
    assert(r.getString(2) == "20260813" && r.getInt(3) == 20260813)
    assert(r.getDate(4).toString == "2026-08-13")
  }

  test("csv-artifact specs load in ordinal order and drive conform") {
    val dir = java.nio.file.Files.createTempDirectory("graft_conf_spec")
    java.nio.file.Files.writeString(dir.resolve("columns.csv"),
      "table;target_column;source;target_type;literal;function;ordinal\n" +
        "m_demo;cod;k;bigint;;;1\n" +
        "m_demo;descr;name;varchar;;upper_trim;2\n" +
        "m_demo;pais;;varchar;PE;;3\n")
    val specs = Conformance.fromCsv(spark, dir.resolve("columns.csv").toString)
    val out = Conformance.conform(
      Seq((1L, " lima ")).toDF("k", "name"), specs("m_demo"))
    assert(out.columns.toSeq == Seq("cod", "descr", "pais"))
    assert(out.as[(Long, String, String)].head() == ((1L, "LIMA", "PE")))
  }

  test("unknown function names fail fast, not silently") {
    intercept[IllegalArgumentException] {
      Conformance.compile(Col("x", "a", function = "no_such_fn"))
    }
  }

  test("stripQuals removes alias qualifiers but never touches string literals") {
    import graft.sources.ConformanceSql.stripQuals
    assert(stripQuals("tv.total + m.importe", Set("tv", "m")) ==
      "total + importe")
    // a literal embedding an alias token must survive verbatim
    assert(stripQuals("CASE WHEN tv.cod = 'tv.total' THEN 'm.x' ELSE tv.x END",
      Set("tv", "m")) == "CASE WHEN cod = 'tv.total' THEN 'm.x' ELSE x END")
    // SQL-escaped quotes stay inside one literal segment
    assert(stripQuals("concat(tv.a, 'it''s tv.b here', tv.c)", Set("tv")) ==
      "concat(a, 'it''s tv.b here', c)")
    // word boundary: an identifier merely ENDING in the alias is kept
    assert(stripQuals("atv.x + tv.x", Set("tv")) == "atv.x + x")
  }

  test("conformance execution leaves the caller session's ANSI mode untouched") {
    // ConformanceLake flips ANSI off (Spark-3-faithful semantics) in a
    // cached session CLONE; the caller's session must never see it —
    // a leaked flip silently changes unrelated queries built afterwards
    val key = "spark.sql.ansi.enabled"
    val before = spark.conf.get(key)
    assert(graft.sources.ConformanceLake.runJob(spark, sf, "m_pais").count() > 0)
    assert(spark.conf.get(key) == before,
      "the ANSI flip leaked into the caller session")
  }

  test("job plans and the session clone are memoized per (session, dir, params)") {
    import graft.sources.ConformanceLake
    val a = ConformanceLake.runJob(spark, sf, "m_pais")
    val b = ConformanceLake.runJob(spark, sf, "m_pais")
    // same analyzed DataFrame — plan construction paid once
    assert(a eq b)
    assert(a.sparkSession eq b.sparkSession)
    assert(a.sparkSession ne spark)
  }

  test("serveJob (optimized-plan cache) is value-identical to the gate form and memoized") {
    import graft.sources.{ConformanceGate, ConformanceLake}
    val served = ConformanceLake.serveJob(spark, sf, "t_venta")
    val direct = ConformanceGate.normalize(
      ConformanceLake.runJob(spark, sf, "t_venta"))
    assert(served.columns.toSeq == direct.columns.toSeq)
    assert(served.schema == direct.schema)
    assert(served.exceptAll(direct).isEmpty && direct.exceptAll(served).isEmpty,
      "serving from the cached optimized plan must not change values")
    // and the served Dataset is memoized (the fixpoint paid once)
    assert(ConformanceLake.serveJob(spark, sf, "t_venta") eq served)
  }

  test("narrow serve: small cache-free closures run AQE-off/4-partition; cache-backed keep the clone") {
    import graft.sources.ConformanceLake
    // t_venta's closure has no persisted upstreams and tiny file leaves at
    // test SF -> the served frame executes on the narrow session (the
    // measured ~20-stage scheduling-floor fix); value identity is pinned
    // by the test above, which compares it against the clone-run gate
    // form. Fresh outer session: earlier suites may have persisted
    // OTHER jobs' upstreams into the shared clone, and a cache-backed
    // plan correctly refuses the narrow path.
    val isolated = spark.newSession()
    val narrow = ConformanceLake.serveJob(isolated, sf, "t_venta")
    assert(narrow.sparkSession.conf.get("spark.sql.adaptive.enabled") == "false")
    assert(narrow.sparkSession.conf.get("spark.sql.shuffle.partitions") == "4")
    assert(narrow.sparkSession.conf.get("spark.sql.ansi.enabled") == "false")
    // fact_cliente_venta's closure reads persisted upstream jobs
    // (InMemoryRelation leaves): the narrow conf must never own their
    // MATERIALIZATION (measured 36 s -> 89 s when it does), so it serves
    // on the regular clone
    val cached = ConformanceLake.serveJob(isolated, sf, "fact_cliente_venta")
    assert(cached.sparkSession.conf.get("spark.sql.adaptive.enabled") != "false")
    // and the size guard: with the byte cap forced to zero, even a
    // cache-free closure stays on the clone (fresh session+dir so the
    // serve/clone caches cannot answer from this test's earlier entries)
    val other = spark.newSession()
    ConformanceLake.session(other, sf)
      .conf.set("spark.graft.conformance.narrowServeBytes", "0")
    val big = ConformanceLake.serveJob(other, sf, "t_venta")
    assert(big.sparkSession.conf.get("spark.sql.adaptive.enabled") != "false")
  }

  test("frozen catalog oracles match the runtime ConformanceSql rendering") {
    // The q70–q73 oracle SQL the driver executes is frozen under
    // resources/graft/conformance/oracles/. If the transcribed job
    // metadata, stage synthesis, or the SQL renderer changes, the frozen
    // copy goes stale — this pin turns that drift into a test failure
    // instead of a CORRECTNESS gate miss. (Rendering depends only on
    // metadata + output schema, so any SF works.)
    graft.pipeline.ConformanceQueries.sampledJobs.foreach { case (key, job) =>
      val runtime = graft.pipeline.ConformanceQueries.renderOracle(spark, sf, job)
      val frozen = graft.pipeline.ConformanceQueries.oracles(key)
      assert(runtime == frozen,
        s"$job: frozen oracle is stale — re-dump via graft.ConformanceDump")
    }
  }
}

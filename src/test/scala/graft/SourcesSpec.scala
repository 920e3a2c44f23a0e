package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{JdbcServing, LakeIO, SchemaRegistry}

class SourcesSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("lake write/read/append roundtrip with dynamic partition overwrite") {
    val root = Files.createTempDirectory("graft_lake").toString
    val lake = LakeIO(spark, root)
    val v1 = Seq((1L, "202401", 10.0), (2L, "202402", 20.0)).toDF("id", "periodo", "imp")
    lake.write(v1, lake.layers.Domain, "t", Seq("periodo"))
    assert(lake.read(lake.layers.Domain, "t").count() == 2)

    // dynamic overwrite: rewriting only 202402 must leave 202401 intact
    val v2 = Seq((3L, "202402", 30.0)).toDF("id", "periodo", "imp")
    lake.write(v2, lake.layers.Domain, "t", Seq("periodo"))
    val after = lake.read(lake.layers.Domain, "t")
    assert(after.filter($"periodo" === "202401").count() == 1)
    assert(after.filter($"periodo" === "202402").select("id").as[Long].collect().toSet == Set(3L))
  }

  test("partition-scoped upsert merges keys and preserves untouched partitions") {
    val root = Files.createTempDirectory("graft_lake").toString
    val lake = LakeIO(spark, root)
    val base = Seq((1L, "202401", 10.0), (2L, "202402", 20.0), (3L, "202402", 30.0))
      .toDF("id", "periodo", "imp")
    lake.write(base, lake.layers.Domain, "t", Seq("periodo"))
    // update id=2 and insert id=4, both in 202402; 202401 untouched
    val delta = Seq((2L, "202402", 99.0), (4L, "202402", 40.0)).toDF("id", "periodo", "imp")
    lake.upsert(delta, lake.layers.Domain, "t", keys = Seq("id"), partitionBy = Seq("periodo"))
    val out = lake.read(lake.layers.Domain, "t")
    assert(out.count() == 4)
    assert(out.filter($"id" === 2L).select("imp").as[Double].head() == 99.0)
    assert(out.filter($"periodo" === "202401").count() == 1)
  }

  test("upsert on unpartitioned table") {
    val root = Files.createTempDirectory("graft_lake").toString
    val lake = LakeIO(spark, root)
    lake.write(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), lake.layers.Stage, "u")
    lake.upsert(Seq((2L, "B"), (3L, "c")).toDF("id", "v"), lake.layers.Stage, "u", Seq("id"))
    val out = lake.read(lake.layers.Stage, "u").as[(Long, String)].collect().toSet
    assert(out == Set((1L, "a"), (2L, "B"), (3L, "c")))
  }

  test("lake upsert tolerates source schema drift across partitions") {
    val root = Files.createTempDirectory("graft_lake").toString
    val lake = LakeIO(spark, root)
    lake.write(Seq((1L, "202401", 10.0), (2L, "202402", 20.0))
      .toDF("id", "periodo", "imp"), lake.layers.Domain, "t", Seq("periodo"))
    // source adds `tag`; only 202402 is touched
    lake.upsert(Seq((2L, "202402", 21.0, "x")).toDF("id", "periodo", "imp", "tag"),
      lake.layers.Domain, "t", keys = Seq("id"), partitionBy = Seq("periodo"))
    val out = lake.read(lake.layers.Domain, "t")
    assert(out.columns.contains("tag"),
      "the evolved column must stay visible across mixed-schema partitions")
    assert(out.filter($"id" === 2L).select("tag").as[String].head() == "x")
    assert(out.filter($"id" === 1L).select("tag").collect().head.isNullAt(0))
  }

  test("jdbc preaction SQL mirrors the reference delete-by-slice") {
    assert(JdbcServing.deletePreaction("fact_venta",
      Seq("id_pais" -> Seq("PE", "CO"), "id_periodo" -> Seq("202401"))) ==
      Some("DELETE FROM fact_venta WHERE id_pais IN ('PE', 'CO') AND id_periodo IN ('202401');"))
    assert(JdbcServing.deletePreaction("t", Nil).isEmpty)
    // values are quoted against injection
    assert(JdbcServing.deletePreaction("t", Seq("c" -> Seq("x'y"))).get.contains("'x''y'"))
  }

  test("jdbc preaction renders typed literals unquoted (reference int filters)") {
    // the reference filters id_compania/periods as ints
    // (common_jobs_functions.py:511-573); int-typed warehouse columns must
    // compare against int literals, not coerced strings
    assert(JdbcServing.deletePreaction("fact_venta",
      Seq("id_compania" -> Seq(1, 5), "id_periodo" -> Seq(202401L))) ==
      Some("DELETE FROM fact_venta WHERE id_compania IN (1, 5) AND id_periodo IN (202401);"))
    assert(JdbcServing.sqlLiteral(java.time.LocalDate.parse("2024-01-31")) ==
      "DATE '2024-01-31'")
    assert(JdbcServing.sqlLiteral(BigDecimal("12.500000")) == "12.500000")
    assert(JdbcServing.sqlLiteral(null) == "NULL")
    assert(JdbcServing.sqlLiteral(true) == "true")
  }

  test("z-ordered write keeps BOTH dimensions narrow inside every file") {
    val root = Files.createTempDirectory("graft_zorder").toString
    val lake = LakeIO(spark, root)
    val orders = graft.core.Tables.orders(spark, TestSpark.sf)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    lake.writeZOrdered(orders, lake.layers.Analytics, "t_z",
      zCols = Seq("o_custkey", "o_totalprice"), numFiles = 8)
    val dir = new java.io.File(lake.tablePath(lake.layers.Analytics, "t_z"))
    val files = dir.listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length >= 4, s"expected several files, got ${files.length}")
    val global = orders.agg(
      max("o_custkey") - min("o_custkey"),
      max("o_totalprice") - min("o_totalprice")).head()
    val (gc, gp) = (global.getLong(0).toDouble, global.getDouble(1))
    // per file, each z column spans a small fraction of its global range —
    // the property that lets a range predicate on EITHER column skip files
    val spans = files.map { f =>
      val r = spark.read.parquet(f.getPath).agg(
        max("o_custkey") - min("o_custkey"),
        max("o_totalprice") - min("o_totalprice")).head()
      (r.getLong(0).toDouble / gc, r.getDouble(1) / gp)
    }
    val (avgC, avgP) = (spans.map(_._1).sum / spans.length,
      spans.map(_._2).sum / spans.length)
    assert(avgC < 0.6 && avgP < 0.6,
      s"avg per-file span fractions too wide: custkey=$avgC price=$avgP")
    // and the data survives the reorganization intact
    assert(lake.read(lake.layers.Analytics, "t_z").count() == orders.count())
  }

  test("lake read dispatches on table format: plain parquet vs txn log") {
    val root = Files.createTempDirectory("graft_mixed").toString
    val lake = LakeIO(spark, root)
    lake.write(Seq((1L, "plain")).toDF("id", "v"), lake.layers.Stage, "t_plain")
    lake.txn(lake.layers.Stage, "t_txn").overwrite(Seq((2L, "txn")).toDF("id", "v"))
    assert(lake.read(lake.layers.Stage, "t_plain").as[(Long, String)].head() == ((1L, "plain")))
    assert(lake.read(lake.layers.Stage, "t_txn").as[(Long, String)].head() == ((2L, "txn")))
    // a txn upsert through the same read path sees merged state
    lake.txn(lake.layers.Stage, "t_txn").upsert(Seq((2L, "txn2")).toDF("id", "v"), Seq("id"))
    assert(lake.read(lake.layers.Stage, "t_txn").as[(Long, String)].head() == ((2L, "txn2")))
  }

  test("registerViews exposes every base table to SQL text") {
    graft.core.Tables.registerViews(spark, TestSpark.sf)
    assert(spark.sql("SELECT count(*) FROM lineitem").head().getLong(0) > 0)
    assert(spark.sql(
      "SELECT count(*) FROM events WHERE ts IS NOT NULL").head().getLong(0) > 0)
    assert(spark.sql(
      "SELECT l_returnflag, count(*) FROM lineitem GROUP BY 1").count() > 0)
  }

  test("previousPeriod matches the reference across year boundaries") {
    import graft.operators.Periods
    assert(Periods.previousPeriod("202401") == "202312")
    assert(Periods.previousPeriod("202403") == "202402")
    assert(Periods.previousPeriod("202001") == "201912")
    // Column form agrees with the string form
    val out = Seq("202401", "202403", "202001").toDF("p")
      .select(Periods.previousPeriod(col("p"))).as[String].collect().toSeq
    assert(out == Seq("202312", "202402", "201912"))
  }

  test("schema registry builds typed empty frames") {
    import SchemaRegistry._
    val reg = Registry(Map("m_cliente" -> Seq(
      ColumnSpec("id_cliente", "string"), ColumnSpec("saldo", "double"),
      ColumnSpec("alta", "date"))))
    val df = reg.emptyFrame(spark, "m_cliente")
    assert(df.count() == 0)
    assert(df.schema.map(f => (f.name, f.dataType.simpleString)) ==
      Seq(("id_cliente", "string"), ("saldo", "double"), ("alta", "date")))
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{ConformanceExact, ConformanceSql, ExactDecimalSql}

/** The exact-decimal oracle renderer (ExactDecimalSql / ConformanceExact):
  * empirical pins of the Spark decimal semantics it replays, plus the
  * structural laws the spliced templates must obey.
  *
  * Background: Spark (ANSI off, allowPrecisionLoss — what the reference's
  * Glue jobs run under) evaluates decimal arithmetic EXACTLY and then
  * rounds HALF_UP (away from zero) to the Catalyst result scale, nulling
  * on precision-38 overflow and on divide-by-zero. The renderer replays
  * that in DuckDB HUGEINT arithmetic; these pins fail the build if a
  * Spark upgrade ever changes the semantics the replay assumes.
  */
class ExactDecimalSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val ansiOff = {
    val s = spark.newSession()
    s.conf.set("spark.sql.ansi.enabled", "false")
    s
  }

  private def one(sql: String): String =
    String.valueOf(ansiOff.sql(sql).head().get(0))

  test("divide rounds HALF_UP (away from zero) at the result scale") {
    // 1e-6 / 4096 = 2.44140625e-10 — exact half at the (29,17) result
    // scale; HALF_UP gives ...63, HALF_EVEN would give ...62
    assert(one("SELECT CAST(0.000001 AS DECIMAL(18,6)) / CAST(4096 AS DECIMAL(10,0))")
      == "2.4414063E-10")
    assert(one("SELECT CAST(-0.000001 AS DECIMAL(18,6)) / CAST(4096 AS DECIMAL(10,0))")
      == "-2.4414063E-10")
  }

  test("multiply overflow-rescale rounds HALF_UP at the reduced scale") {
    // (38,12)*(38,12) -> (38,6); 1e-6 * 0.5 = 5e-7, an exact half
    assert(one("SELECT CAST(0.000001 AS DECIMAL(38,12)) * CAST(0.5 AS DECIMAL(38,12))")
      == "0.000001")
    assert(one("SELECT CAST(-0.000001 AS DECIMAL(38,12)) * CAST(0.5 AS DECIMAL(38,12))")
      == "-0.000001")
  }

  test("narrowing decimal cast rounds HALF_UP; overflow and /0 null (ANSI off)") {
    assert(one("SELECT CAST(CAST(0.0000005 AS DECIMAL(38,12)) AS DECIMAL(38,6))")
      == "0.000001")
    assert(one("SELECT CAST(CAST(-0.0000005 AS DECIMAL(38,12)) AS DECIMAL(38,6))")
      == "-0.000001")
    assert(one("SELECT CAST(1 AS DECIMAL(18,6)) / CAST(0 AS DECIMAL(10,0))") == "null")
    assert(one("SELECT CAST(1e19 AS DECIMAL(38,12)) * CAST(1e19 AS DECIMAL(38,12))")
      == "null")
  }

  test("needsExact: rescale arithmetic and narrowing casts, nothing else") {
    import ansiOff.implicits._
    val df = Seq((BigDecimal(1), BigDecimal(2))).toDF("a", "b")
      .select($"a".cast("decimal(18,6)").as("a"), $"b".cast("decimal(38,12)").as("b"))
    def resolved(e: String) =
      df.select(expr(e)).queryExecution.analyzed.expressions.head
    assert(ExactDecimalSql.needsExact(resolved("a * b")))
    assert(ExactDecimalSql.needsExact(resolved("a / b")))
    assert(ExactDecimalSql.needsExact(resolved("CAST(b AS DECIMAL(38,6))")))
    // widening casts and bare column moves are natively exact in DuckDB
    assert(!ExactDecimalSql.needsExact(resolved("CAST(a AS DECIMAL(38,12))")))
    assert(!ExactDecimalSql.needsExact(resolved("a")))
    assert(!ExactDecimalSql.needsExact(resolved("upper('x')")))
  }

  test("exact templates are toDuck-invariant and land on the decimal-heavy jobs") {
    // ConformanceSql.render post-processes the assembled query with
    // toDuck (Spark->DuckDB dialect rewrites); the spliced templates are
    // already DuckDB SQL, so the rewrite must be a no-op on them —
    // otherwise e.g. the coalesce numeric-arg quoting would corrupt
    // HUGEINT arithmetic
    val ts = ConformanceExact.templates(spark, sf, "fact_cliente_venta")
    assert(ts.nonEmpty, "fact_cliente_venta closure must need exact ops")
    ts.values.foreach { t =>
      assert(ConformanceSql.toDuck(t.template) == t.template,
        "exact template must be invariant under the dialect rewrite")
    }
    // the five decimal-chain jobs in this closure
    assert(ts.keys.map(_._1).toSet == Set("t_venta_detalle", "fact_cliente_venta"))
    // q70 stability: t_venta's closure has NO decimal arithmetic, so its
    // frozen oracle is untouched by the exact-rendering path
    assert(ConformanceExact.templates(spark, sf, "t_venta").isEmpty)
  }

  test("replay envelope: lake magnitudes stay far inside DECIMAL128/int128") {
    // The HUGEINT replay equals Spark's MathContext.DECIMAL128 arithmetic
    // while every exact intermediate holds <= 34 significant digits —
    // integer digits + combined scale (<= 24 in these chains) <= 34, i.e.
    // values < ~1e9 (ExactDecimalSql scaladoc). The stage measures are
    // the chains' inputs; pin their magnitude three orders below that.
    val clone = graft.sources.ConformanceLake.session(spark, sf)
    val m = clone.sql(
      """SELECT greatest(
        |  max(abs(imp_valorizado)), max(abs(imp_cobrar)),
        |  max(abs(cant_paquete * cant_unidad))) FROM stage_t_documento_venta_detalle
        |""".stripMargin).head().getDecimal(0)
    assert(m.doubleValue < 1e9, s"stage magnitudes outside replay envelope: $m")
  }
}

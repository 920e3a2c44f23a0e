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

  test("differential fuzz: Spark decimal ops == the HUGEINT replay semantics") {
    // The renderer's DuckDB SQL implements: exact integer arithmetic on
    // unscaled values + round-half-away-from-zero rescale + NULL when
    // |unscaled| >= 10^p. This pins that MODEL against Spark itself over
    // randomized inputs (including exact half-boundary values), so the
    // DuckDB gate can only disagree through a rendering bug, never a
    // semantics misunderstanding.
    import java.math.BigInteger
    val TEN = BigInteger.TEN
    def pow10(k: Int) = TEN.pow(k)
    // round-half-away division, the roundDivSql twin
    def roundDiv(n: BigInteger, d: BigInteger): BigInteger = {
      val sign = if (n.signum * d.signum < 0) -1 else 1
      val q = n.abs.multiply(BigInteger.TWO).add(d.abs)
        .divide(d.abs.multiply(BigInteger.TWO))
      if (sign < 0) q.negate else q
    }
    def check(x: BigInteger, p: Int): Option[BigInteger] =
      if (x.abs.compareTo(pow10(p)) >= 0) None else Some(x)
    def rescale(x: BigInteger, from: Int, to: Int): BigInteger =
      if (to >= from) x.multiply(pow10(to - from))
      else roundDiv(x, pow10(from - to))

    val rnd = new scala.util.Random(20260814L)
    def dec(intDigits: Int, scale: Int): java.math.BigDecimal = {
      // uniform over the full DIGIT range (not bit-length!), signed, with
      // exact half-boundary and max-magnitude adversaries mixed in — the
      // magnitudes must reach the precision ceiling so the overflow-NULL
      // path is genuinely exercised
      val ceil = BigInt(10).pow(intDigits + scale)
      val base0 = BigInt(ceil.bitLength, rnd).mod(ceil)
      val base = (rnd.nextInt(4) match {
        case 0 => base0 - (base0 mod BigInt(10)) + 5 // ...5 trailing digit
        case 1 => ceil - 1 - (base0 mod BigInt(1000)) // near the ceiling
        case _ => base0
      }) * (if (rnd.nextBoolean()) 1 else -1)
      new java.math.BigDecimal(base.bigInteger, scale)
    }
    // (a, b): realistic magnitudes. w: a wide (38,12) operand whose
    // narrowing cast to (18,2) can overflow — the one overflow-NULL path
    // REACHABLE inside the <=34-significant-digit envelope (a decimal
    // MULTIPLY can only overflow precision 38 when its exact product
    // already exceeds 34 digits, i.e. outside the envelope where Spark's
    // DECIMAL128 pre-rounding kicks in and this replay does not apply)
    val samples = (1 to 400).map(_ =>
      (dec(6, 6), dec(4, 12), dec(20, 12)))
    import ansiOff.implicits._
    val df = samples.map { case (a, b, w) =>
        (a.toPlainString, b.toPlainString, w.toPlainString) }
      .toDF("a", "b", "w")
      .selectExpr(
        "CAST(a AS DECIMAL(18,6)) AS a", "CAST(b AS DECIMAL(38,12)) AS b",
        "CAST(w AS DECIMAL(38,12)) AS w")
      .selectExpr("a", "b", "a * b AS m", "a / b AS d", "a + b AS s2",
        "CAST(a AS DECIMAL(18,2)) AS c", "w", "CAST(w AS DECIMAL(18,2)) AS cw")
    val m = df.schema("m").dataType.asInstanceOf[org.apache.spark.sql.types.DecimalType]
    val dT = df.schema("d").dataType.asInstanceOf[org.apache.spark.sql.types.DecimalType]
    val sT = df.schema("s2").dataType.asInstanceOf[org.apache.spark.sql.types.DecimalType]
    df.collect().foreach { r =>
      val a = r.getDecimal(0); val b = r.getDecimal(1)
      val ua = a.unscaledValue; val ub = b.unscaledValue
      // multiply: exact product at s1+s2, rescale to result scale
      val expM = check(rescale(ua.multiply(ub), 6 + 12, m.scale), m.precision)
      assert(Option(r.getDecimal(2)).map(_.unscaledValue) == expM,
        s"multiply mismatch for $a * $b")
      // divide: round(a * 10^(s+s2-s1) / b) at the result scale
      val expD =
        if (ub.signum == 0) None
        else check(roundDiv(ua.multiply(pow10(dT.scale + 12 - 6)), ub), dT.precision)
      assert(Option(r.getDecimal(3)).map(_.unscaledValue) == expD,
        s"divide mismatch for $a / $b")
      // add: align to max scale, sum, rescale to the result scale
      val mScale = math.max(6, 12)
      val expS = check(rescale(
        rescale(ua, 6, mScale).add(rescale(ub, 12, mScale)), mScale, sT.scale),
        sT.precision)
      assert(Option(r.getDecimal(4)).map(_.unscaledValue) == expS,
        s"add mismatch for $a + $b")
      // narrowing cast rounds half-away at the target scale
      val expC = check(rescale(ua, 6, 2), 18)
      assert(Option(r.getDecimal(5)).map(_.unscaledValue) == expC,
        s"cast mismatch for $a")
      // wide narrowing cast: (38,12) -> (18,2), overflow-NULL reachable
      val uw = r.getDecimal(6).unscaledValue
      val expW = check(rescale(uw, 12, 2), 18)
      assert(Option(r.getDecimal(7)).map(_.unscaledValue) == expW,
        s"wide cast mismatch for ${r.getDecimal(6)}")
    }
    // sanity: the adversarial family genuinely reached the NULL branch
    assert(df.selectExpr("count(*) - count(cw)").head().getLong(0) > 0,
      "wide-cast family never overflowed — fuzz lost its teeth")
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

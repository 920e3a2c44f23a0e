package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.operators.ApproxDistinct

class HllSpec extends AnyFunSuite {
  import TestSpark._

  // Scala-side brute reference of the register construction — the spec's
  // independent twin of functions/HllRegisters.update
  private def bruteRegs(hashes: Seq[Long], p: Int): Seq[Int] = {
    val regs = new Array[Int](1 << p)
    hashes.foreach { h =>
      val idx = (h >>> (64 - p)).toInt
      val w = h << p
      val rho = if (w == 0L) 64 - p + 1 else java.lang.Long.numberOfLeadingZeros(w) + 1
      if (rho > regs(idx)) regs(idx) = rho
    }
    regs.toSeq
  }

  test("md5_low64: pins the DuckDB md5_number_lower family") {
    // duckdb: select md5_number_lower('hello') = 10575884659879408057
    // (as a signed 64-bit value: 10575884659879408057 - 2^64)
    val expect = java.lang.Long.parseUnsignedLong("10575884659879408057")
    assert(graft.functions.TextHash.md5Low64(UTF8String.fromString("hello")) == expect)
    val s = spark
    import s.implicits._
    val got = Seq("hello").toDF("s")
      .select(ApproxDistinct.md5Low64(col("s"))).head().getLong(0)
    assert(got == expect)
  }

  test("hll_registers: equals the brute reference, any partitioning") {
    val s = spark
    import s.implicits._
    val hashes = (1 to 5000).map(i =>
      graft.functions.TextHash.md5Low64(UTF8String.fromString(s"item-$i")))
    val expect = bruteRegs(hashes, p = 9)
    for (parts <- Seq(1, 7)) {
      val got = hashes.toDF("h").repartition(parts)
        .agg(ApproxDistinct.registers(col("h"), 9))
        .head().getSeq[Int](0)
      assert(got == expect, s"parts=$parts")
    }
  }

  test("hll_registers: rho landmarks — top bits bucket, trailing bits count") {
    val s = spark
    import s.implicits._
    val p = 9
    // h = 0: bucket 0, remaining 55 bits all zero -> rho = 56
    // h = 1: bucket 0, remaining bits ...001 -> bit length 1 -> rho = 55
    // h = 3L<<54: bucket 1, remaining 55 bits = 2^54 -> rho = 1
    // h = -1: bucket 511, remaining all ones -> rho = 1
    val regs = Seq(0L, 1L, 3L << 54, -1L).toDF("h")
      .agg(ApproxDistinct.registers(col("h"), p)).head().getSeq[Int](0)
    assert(regs(0) == 56) // max(rho(0)=56, rho(1)=55)
    assert(regs(1) == 1)
    assert(regs(511) == 1)
    assert(regs.zipWithIndex.collect {
      case (r, i) if i != 0 && i != 1 && i != 511 => r }.forall(_ == 0))
  }

  test("estimator: exact integer S and v_zero from a pinned register set") {
    val s = spark
    import s.implicits._
    // registers: 510 zeros, one 1, one 56 (p = 9, Q+1 = 56):
    // S = 510*2^56 + 2^55 + 2^0 — exact in DECIMAL(38,0), one CR cast
    val regs = Array.fill(512)(0)
    regs(7) = 1; regs(300) = 56
    val df = Seq(1).toDF("x").select(typedlit(regs.toSeq).as("regs"))
    val got = df.select(
      ApproxDistinct.sScaled(col("regs"), 9).as("s"),
      ApproxDistinct.vZero(col("regs")).as("v"))
      .head()
    val sExact = BigInt(510) * BigInt(2).pow(56) + BigInt(2).pow(55) + 1
    assert(got.getDouble(0) == sExact.toDouble)
    assert(got.getInt(1) == 510)
  }

  test("estimateByGroup: per-group error inside the p=9 band, partition-stable") {
    val s = spark
    import s.implicits._
    // three groups of very different true cardinality; values are fixed
    // strings, so the estimate is DETERMINISTIC — the bound is a pin,
    // not a flaky statistical assertion (sigma = 1.04/sqrt(512) = 4.6%)
    val rows =
      (1 to 20000).map(i => ("big", s"v$i")) ++
      (1 to 3000).map(i => ("mid", s"w$i")) ++
      (1 to 3000).map(i => ("dup", s"w${i % 400}"))
    for (parts <- Seq(1, 13)) {
      val df = rows.toDF("g", "v").repartition(parts)
      val est = ApproxDistinct.estimateByGroup(df, Seq("g"), "v", p = 9)
        .collect().map(r => r.getString(0) -> r.getAs[Double]("est_distinct"))
        .toMap
      assert(math.abs(est("big") - 20000) / 20000.0 < 0.15, est("big"))
      assert(math.abs(est("mid") - 3000) / 3000.0 < 0.15, est("mid"))
      assert(math.abs(est("dup") - 400) / 400.0 < 0.15, est("dup"))
    }
  }

  test("sketch table: hll_merge of per-day sketches == sketch of the raw union") {
    // the production rollup: one register array per (day, lang) stored
    // once; a window query merges the stored sketches — register-equal
    // to sketching the raw union, so estimates are bit-identical
    val s = spark
    import s.implicits._
    val raw = (1 to 3000).map { i =>
      (s"d${i % 5}", if (i % 2 == 0) "es" else "en", s"user-${i % 700}")
    }
    val df = raw.toDF("dia", "lang", "user")
    val daily = df.groupBy(col("dia"), col("lang"))
      .agg(ApproxDistinct.registers(
        ApproxDistinct.md5Low64(col("user")), 9).as("regs"))
    val merged = daily.groupBy(col("lang"))
      .agg(ApproxDistinct.mergeRegisters(col("regs"), 9).as("regs"))
      .collect().map(r => r.getString(0) -> r.getSeq[Int](1)).toMap
    val direct = df.groupBy(col("lang"))
      .agg(ApproxDistinct.registers(
        ApproxDistinct.md5Low64(col("user")), 9).as("regs"))
      .collect().map(r => r.getString(0) -> r.getSeq[Int](1)).toMap
    assert(merged == direct)
  }

  test("hll_merge: a mixed-p sketch row fails loudly") {
    val s = spark
    import s.implicits._
    val df = Seq(Seq(1, 2, 3)).toDF("regs") // length 3 != 2^9
    intercept[Exception] {
      df.agg(ApproxDistinct.mergeRegisters(col("regs"), 9)).head()
    }
  }

  test("merge tree: union of sketches == sketch of union (register-wise max)") {
    val s = spark
    import s.implicits._
    val a = (1 to 2000).map(i => s"x$i")
    val b = (1500 to 3500).map(i => s"x$i") // overlapping
    def regsOf(xs: Seq[String]) = xs.toDF("v")
      .agg(ApproxDistinct.registers(ApproxDistinct.md5Low64(col("v")), 9))
      .head().getSeq[Int](0)
    val merged = regsOf(a).zip(regsOf(b)).map { case (x, y) => math.max(x, y) }
    assert(merged == regsOf(a ++ b))
  }

  test("streaming: hll_registers runs in a watermarked windowed aggregation") {
    // the sketch buffer serializes into the state store like any other
    // ImperativeAggregate — a per-window approximate-distinct stream is
    // just groupBy(window).agg(hll_registers), no custom state code
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(java.sql.Timestamp, String)]
    val est = input.toDF().toDF("ts", "user")
      .withWatermark("ts", "10 seconds")
      .groupBy(window(col("ts"), "1 minute").as("w"))
      .agg(ApproxDistinct.registers(
        ApproxDistinct.md5Low64(col("user")), 9).as("regs"))
      .select(col("w.start").as("inicio"),
        ApproxDistinct.vZero(col("regs")).as("v"),
        ApproxDistinct.sScaled(col("regs"), 9).as("s"))
    val q = est.writeStream.outputMode("update").format("memory")
      .queryName("hll_stream").start()
    try {
      def t(sec: Int) = new java.sql.Timestamp(60000L + sec * 1000L)
      input.addData((1 to 800).map(i => (t(i % 50), s"u${i % 300}")): _*)
      q.processAllAvailable()
      val rows = spark.table("hll_stream").collect()
      assert(rows.nonEmpty)
      val r = rows.maxBy(_.getTimestamp(0).getTime)
      // 300 distinct users; batch twin must agree exactly on the state
      val batch = (1 to 800).map(i => s"u${i % 300}").toDF("user")
        .agg(ApproxDistinct.registers(
          ApproxDistinct.md5Low64(col("user")), 9).as("regs"))
        .select(ApproxDistinct.vZero(col("regs")),
          ApproxDistinct.sScaled(col("regs"), 9))
        .head()
      assert(r.getInt(1) == batch.getInt(0))
      assert(r.getDouble(2) == batch.getDouble(1))
    } finally q.stop()
  }

  test("hll_registers: bad p and wrong input type fail at analysis time") {
    val s = spark
    import s.implicits._
    val df = Seq(1L).toDF("h")
    intercept[Exception] {
      df.agg(ApproxDistinct.registers(col("h"), 3)).head()
    }
    intercept[Exception] {
      df.agg(ApproxDistinct.registers(col("h").cast("string"), 9)).head()
    }
  }
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{DimLookup, LongLongMap}
import graft.pipeline.CoreQueries

/** DimLookup: the broadcast FK→attribute probe must be semantically an
  * inner equi-join against a uniquely-keyed dim — including the drop of
  * unmatched and NULL FKs — while never planning a join operator. */
class DimLookupSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(): String =
    Files.createTempDirectory("dimlookup").toString

  test("map probe: hits, misses, negative keys, dense and strided ids") {
    val m = LongLongMap.create(5)
    Seq(0L -> 10L, 1L -> 11L, -7L -> 3L, (1L << 40) -> 4L, 999L -> 5L)
      .foreach { case (k, v) => m.insert(k, v) }
    assert(m.probe(0L) == 10L && m.probe(1L) == 11L && m.probe(-7L) == 3L)
    assert(m.probe(1L << 40) == 4L && m.probe(999L) == 5L)
    assert(m.probe(2L) == LongLongMap.Miss && m.probe(-8L) == LongLongMap.Miss)
  }

  test("duplicate dim key refuses loudly (a join there would fan out)") {
    val m = LongLongMap.create(4)
    m.insert(5L, 1L)
    val e = intercept[IllegalStateException](m.insert(5L, 2L))
    assert(e.getMessage.contains("duplicate"))
  }

  test("reserved sentinel key/value refuses loudly") {
    val m = LongLongMap.create(4)
    intercept[IllegalArgumentException](m.insert(Long.MinValue, 1L))
    intercept[IllegalArgumentException](m.insert(1L, Long.MinValue))
  }

  test("lookup column == inner join, including unmatched and NULL FKs") {
    import spark.implicits._
    val dir = tmp()
    // dim with a hole at key 3; fact carries matched, unmatched, NULL
    Seq((1L, 100L), (2L, 200L), (4L, 400L)).toDF("k", "v")
      .write.parquet(s"$dir/dim.parquet")
    val fact = Seq(Some(1L), Some(2L), Some(3L), Some(4L), None, Some(99L))
      .toDF("fk")
    val dim = spark.read.parquet(s"$dir/dim.parquet")
    val viaJoin = fact.join(dim, col("fk") === col("k"))
      .select(col("fk"), col("v")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lookup = DimLookup.forParquet(spark, s"$dir/dim.parquet", "k", "v").get
    val viaLookup = fact.withColumn("v", lookup(col("fk")))
      .filter(col("v").isNotNull)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaLookup == viaJoin)
    assert(viaLookup == Set(1L -> 100L, 2L -> 200L, 4L -> 400L))
  }

  test("string lookup == inner join on a name dim; refusals fall back") {
    import spark.implicits._
    // multi-byte UTF-8 survives the blob round-trip; key 3 misses
    val dim = Seq((1L, "añejo"), (2L, "crudo"), (4L, "寿司"))
      .toDF("k", "nombre")
    val fact = Seq(Some(1L), Some(2L), Some(3L), Some(4L), None)
      .toDF("fk")
    val viaJoin = fact.join(dim, col("fk") === col("k"))
      .select(col("fk"), col("nombre"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val lookup = DimLookup.forFrameString(dim, "k", "nombre").get
    val viaLookup = fact.withColumn("nombre", lookup(col("fk")))
      .filter(col("nombre").isNotNull)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(viaLookup == viaJoin)
    assert(viaLookup == Set(1L -> "añejo", 2L -> "crudo", 4L -> "寿司"))
    // un-mappable frames answer None (the caller keeps its join):
    // duplicate keys fan out, NULL values can't be represented
    assert(DimLookup.forFrameString(
      Seq((1L, "a"), (1L, "b")).toDF("k", "nombre"), "k", "nombre").isEmpty)
    assert(DimLookup.forFrameString(
      Seq((1L, "a"), (2L, null)).toDF("k", "nombre"), "k", "nombre").isEmpty)
    // and the cap governs frames like parquet dims
    try {
      spark.conf.set("spark.graft.dimLookup.maxEntries", "1")
      assert(DimLookup.forFrameString(dim, "k", "nombre").isEmpty)
      assert(DimLookup.forFrame(dim.select(col("k"), lit(7L).as("v")),
        "k", "v").isEmpty)
    } finally spark.conf.unset("spark.graft.dimLookup.maxEntries")
  }

  test("cache reuses by fingerprint and invalidates on rewrite") {
    import spark.implicits._
    val dir = tmp()
    val p = s"$dir/dim.parquet"
    Seq((1L, 10L)).toDF("k", "v").write.parquet(p)
    val a = DimLookup.forParquet(spark, p, "k", "v").get
    val b = DimLookup.forParquet(spark, p, "k", "v").get
    val probe = spark.range(1).select(a(lit(1L)).as("va"), b(lit(1L)).as("vb")).head
    assert(probe.getLong(0) == 10L && probe.getLong(1) == 10L)
    // rewrite with a different mapping: the stale map must not serve it
    Thread.sleep(1100) // mtime granularity
    Seq((1L, 20L)).toDF("k", "v").write.mode("overwrite").parquet(p)
    val c = DimLookup.forParquet(spark, p, "k", "v").get
    assert(spark.range(1).select(c(lit(1L))).head.getLong(0) == 20L)
  }

  test("entry cap: oversized dim answers None (caller keeps its join)") {
    import spark.implicits._
    val dir = tmp()
    val p = s"$dir/dim.parquet"
    (1L to 100L).map(i => (i, i)).toDF("k", "v").write.parquet(p)
    spark.conf.set("spark.graft.dimLookup.maxEntries", "10")
    try assert(DimLookup.forParquet(spark, p, "k", "v").isEmpty)
    finally spark.conf.unset("spark.graft.dimLookup.maxEntries")
    assert(DimLookup.forParquet(spark, p, "k", "v").isDefined)
  }

  test("q8 catalog form: lookup path == shuffle-join fallback, no join operator") {
    val viaLookup = CoreQueries.q8CustomerMetricsOnePass(spark, sf)
    assert(!viaLookup.queryExecution.executedPlan.toString.contains("Join"),
      "lookup path must not plan a join operator")
    // force the fallback by shrinking the cap below the orders count
    spark.conf.set("spark.graft.dimLookup.maxEntries", "1")
    val viaJoin =
      try CoreQueries.q8CustomerMetricsOnePass(spark, sf)
      finally spark.conf.unset("spark.graft.dimLookup.maxEntries")
    assert(viaJoin.queryExecution.executedPlan.toString.contains("Join"),
      "capped form must fall back to the join")
    assert(viaLookup.exceptAll(viaJoin).isEmpty &&
      viaJoin.exceptAll(viaLookup).isEmpty,
      "lookup and join forms must be value-identical")
  }
}

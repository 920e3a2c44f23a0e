package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registry of the lake's base tables (driver testdata layout: one parquet
  * per table under a scale-factor directory).
  *
  * Mirrors the reference's layer-addressed reads
  * (reference: artifacts/aws-glue/layer/common_jobs_functions.py:222-277
  * `SPARK_CONTROLLER.read_table`) re-expressed as plain parquet scans so
  * Catalyst sees a declarative relation (filter/column pushdown applies).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  /** Resolved-relation cache: repeated reads of the same base table
    * otherwise re-run file listing + parquet schema inference (a driver
    * job) on EVERY query construction. Keyed per session so concurrent
    * sessions never share relations; entries are plan-time objects only
    * (no data is pinned). */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    cache.computeIfAbsent((spark, path(dir, name)),
      key => key._1.read.parquet(key._2))

  def region(spark: SparkSession, dir: String): DataFrame    = apply(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = apply(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = apply(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = apply(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "lineitem")
  /** events.ts arrives in whatever physical form the generator used —
    * TIMESTAMP(NANOS) (Spark 4 maps it only to long nanos via the legacy
    * conf) or naive µs TIMESTAMP (maps to TimestampNTZType, which
    * watermarks and unix_micros reject). Normalize both to TimestampType:
    * nanos floor-divide to µs (DuckDB's epoch_us), NTZ casts to an
    * identical instant because the session timezone is pinned UTC. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = apply(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")

  /** Register every base table as a temp view (events with its timestamp
    * conversion applied), so `spark.sql("SELECT ... FROM lineitem")` works
    * for SQL-text users alongside the DataFrame surface. */
  def registerViews(spark: SparkSession, dir: String): Unit =
    all.foreach { name =>
      val df = if (name == "events") events(spark, dir) else apply(spark, dir, name)
      df.createOrReplaceTempView(name)
    }
}

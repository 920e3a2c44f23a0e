package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-row kernel decomposition for the q50 scan-agg branches (r14
  * VERDICT item 3): times variants of the lineitem branch on a scale
  * slice so the per-row cost splits into scan floor, period-key
  * extraction, and micros conversion — the measurement that decides
  * whether the date kernel is worth replacing (guide §1.2: per-task work
  * only after the job shape is right; the shape here is already one
  * map-side-combined exchange per branch).
  *
  * Usage: runMain graft.AggKernelProbe [sliceDir] [runs=3]
  */
object AggKernelProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scaled_100x")
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b0 = SparkSession.builder()
      .master(s"local[$cpus]").config("spark.sql.shuffle.partitions", cpus)
    val shm = new java.io.File("/dev/shm")
    if (shm.isDirectory && shm.canWrite) b0.config("spark.local.dir", "/dev/shm/graft-scratch")
    val spark = graft.core.GraftSession.tuned(b0
      .config("spark.sql.files.maxPartitionBytes", (32 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import graft.operators.{CurrencyMicros, Periods}
    val li = graft.core.Tables.lineitem(spark, dir)
    val amount = col("l_extendedprice") * (lit(1.0) - col("l_discount"))

    // integer civil-from-days period key (Howard Hinnant's civil_from_days,
    // positive-days domain — every lake date is post-1970): no
    // LocalDate/LocalDateTime allocation per row, pure int codegen
    def periodKeyInt(c: String): Column = {
      val z = s"(unix_date(CAST($c AS DATE)) + 719468)"
      val doe = s"($z % 146097)"
      val yoe = s"(($doe - $doe div 1460 + $doe div 36524 - $doe div 146096) div 365)"
      val doy = s"($doe - (365 * $yoe + $yoe div 4 - $yoe div 100))"
      val mp = s"((5 * $doy + 2) div 153)"
      val m = s"($mp + IF($mp < 10, 3, -9))"
      val y = s"($yoe + ($z div 146097) * 400 + IF($m <= 2, 1, 0))"
      expr(s"CAST($y * 100 + $m AS INT)")
    }

    val variants: Seq[(String, DataFrame)] = Seq(
      "v0_scan_sum_only" -> li.agg(sum(col("l_extendedprice")), count(lit(1))),
      "v1_current_branch" -> li.groupBy(Periods.periodKey(col("l_shipdate")).as("p"))
        .agg(count(lit(1)), sum(CurrencyMicros.micros(amount))),
      "v2_periodkey_count" -> li.groupBy(Periods.periodKey(col("l_shipdate")).as("p"))
        .agg(count(lit(1))),
      "v2d_periodkey_on_date" -> li.groupBy(Periods.periodKey(col("l_shipdate").cast("date")).as("p"))
        .agg(count(lit(1))),
      "v2i_periodkey_int" -> li.groupBy(periodKeyInt("l_shipdate").as("p"))
        .agg(count(lit(1))),
      "v3_micros_only" -> li.agg(sum(CurrencyMicros.micros(amount)), count(lit(1))),
      "v4_string_periodOf" -> li.groupBy(Periods.periodOf(col("l_shipdate")).as("p"))
        .agg(count(lit(1))),
      "v5_int_branch" -> li.groupBy(periodKeyInt("l_shipdate").as("p"))
        .agg(count(lit(1)), sum(CurrencyMicros.micros(amount))))

    // parity check: the int period key must equal the year*100+month key
    val mismatch = li.select(Periods.periodKey(col("l_shipdate")).as("a"),
        periodKeyInt("l_shipdate").as("b"))
      .filter(col("a") =!= col("b")).count()
    println(s"[agg-kernel] periodKeyInt mismatches vs year*100+month: $mismatch")

    variants.foreach { case (name, df) =>
      val walls = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[agg-kernel] $name%-22s min=${walls.min}%.3f s all=${walls.map(w => f"$w%.2f").mkString(",")}")
    }
    spark.stop()
  }
}

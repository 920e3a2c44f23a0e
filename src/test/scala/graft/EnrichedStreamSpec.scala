package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EnrichedStreamSpec extends AnyFunSuite {
  import TestSpark._

  test("streaming dedup drops re-delivered events within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, java.sql.Timestamp, Double)]
    val events = input.toDF().toDF("event_id", "ts", "value")
    val deduped = graft.streaming.EventsStream.dedupedStream(events, Seq("event_id"))
    val q = deduped.writeStream.outputMode("append").format("memory")
      .queryName("graft_dedup_stream").start()
    try {
      def ts(m: Long) = new java.sql.Timestamp(m * 60000L)
      input.addData((1L, ts(5), 1.0), (2L, ts(6), 2.0), (1L, ts(5), 1.0))
      q.processAllAvailable()
      input.addData((2L, ts(7), 2.0), (3L, ts(8), 3.0)) // event 2 re-delivered
      q.processAllAvailable()
      val out = spark.table("graft_dedup_stream").select("event_id")
        .as[Long].collect().sorted.toSeq
      assert(out == Seq(1L, 2L, 3L), s"got $out")
    } finally q.stop()
  }

  test("parquet file sink emits exactly the batch rollup below the watermark") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_sink")
    val out = s"$tmp/out"
    val wm = graft.streaming.EventsStream.tumblingToParquet(
      spark, sf, out, s"$tmp/ckpt")
    val wmTs = java.time.Instant.parse(wm)
    val emitted = spark.read.parquet(out)
      .select("ventana", "event_type", "n_eventos", "imp_valor")
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
    assert(emitted.nonEmpty, "expected finalized windows in the file sink")
    // append mode must emit a window iff the final watermark passed its end
    val batch = graft.core.Tables.events(spark, sf)
      .groupBy(date_trunc("hour", col("ts")).as("ventana"), col("event_type"))
      .agg(count(lit(1)).as("n_eventos"),
        sum(col("value").cast("decimal(38,6)")).cast("double").as("imp_valor"))
      .filter(col("ventana") + expr("INTERVAL 1 HOUR") <= lit(java.sql.Timestamp.from(wmTs)))
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
    assert(emitted == batch,
      s"sink rows must equal the batch rollup of finalized windows " +
      s"(emitted=${emitted.size}, batch=${batch.size}, watermark=$wm)")
  }

  test("file sink restart from checkpoint re-emits nothing (exactly-once)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_sink_restart")
    val out = s"$tmp/out"
    val ckpt = s"$tmp/ckpt"
    graft.streaming.EventsStream.tumblingToParquet(spark, sf, out, ckpt)
    val firstRows = spark.read.parquet(out).count()
    assert(firstRows > 0)
    // second run with the same checkpoint: source exhausted, no new output
    graft.streaming.EventsStream.tumblingToParquet(spark, sf, out, ckpt)
    assert(spark.read.parquet(out).count() == firstRows,
      "restart against an exhausted source must not duplicate windows")
  }

  test("stream-stream interval join matches the batch interval join") {
    // watermark far beyond the data's 30-day span: nothing is ever late,
    // so the streaming inner join must emit exactly the batch pair set
    val streamed = graft.streaming.EventsStream.intervalJoined(
        spark, sf, "view", "purchase",
        windowSeconds = 3600, watermarkDelay = "90 days")
      .select("user_id", "id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val ev = graft.core.Tables.events(spark, sf)
    val a = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("id_a"), col("ts").as("ts_a"))
    val b = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("ub"), col("event_id").as("id_b"), col("ts").as("ts_b"))
    val batch = a.join(b,
        col("user_id") === col("ub") && col("ts_b") >= col("ts_a") &&
          col("ts_b") <= col("ts_a") + expr("INTERVAL 3600 SECONDS"))
      .select("user_id", "id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(batch.nonEmpty, "test data must contain view->purchase pairs")
    assert(streamed == batch,
      s"stream/batch divergence: missing=${batch -- streamed} extra=${streamed -- batch}")
  }

  test("interval-join parquet sink: full pair set once, restart adds nothing") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_sjoin_sink")
    val out = s"$tmp/out"
    val ckpt = s"$tmp/ckpt"
    graft.streaming.EventsStream.intervalJoinToParquet(
      spark, sf, out, ckpt, "view", "purchase",
      windowSeconds = 3600, watermarkDelay = "90 days")
    val emitted = spark.read.parquet(out)
      .select("user_id", "id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // inner stream-stream joins emit per batch with no watermark delay, so
    // the bounded run's file sink holds exactly the memory-sink pair set
    val viaMemory = graft.streaming.EventsStream.intervalJoined(
        spark, sf, "view", "purchase",
        windowSeconds = 3600, watermarkDelay = "90 days")
      .select("user_id", "id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(emitted == viaMemory && emitted.nonEmpty)
    // restart against the exhausted source: exactly-once, no re-emission
    graft.streaming.EventsStream.intervalJoinToParquet(
      spark, sf, out, ckpt, "view", "purchase",
      windowSeconds = 3600, watermarkDelay = "90 days")
    assert(spark.read.parquet(out).count() == emitted.size,
      "restart must not duplicate joined pairs")
  }

  test("interval join under a realistic watermark holds bounded state (plateau)") {
    // The production form of q41: minutes-scale watermark, continuous
    // feed. The join must hold O(watermark + window) state per side, NOT
    // the whole stream — on an unbounded feed that difference is the
    // whole 100 TB story. Feed K batches of constant size with event
    // time advancing 10 min per batch (window 60 s, delay 5 min): once
    // the watermark is moving, eviction must hold total state rows flat
    // while cumulative input keeps growing.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, java.sql.Timestamp, String)]
    val events = input.toDF().toDF("event_id", "user_id", "ts", "event_type")
    val joined = graft.streaming.EventsStream.intervalJoinStreams(
      events.filter(col("event_type") === "view"),
      events.filter(col("event_type") === "purchase"),
      windowSeconds = 60, watermarkDelay = "5 minutes")
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("graft_sjoin_bounded").start()
    val states = scala.collection.mutable.ArrayBuffer[Long]()
    try {
      val users = 1L to 5L
      val k = 10
      (0 until k).foreach { i =>
        // offset away from epoch 0: the initial watermark is 0, and rows
        // AT the watermark are dropped as late
        val base = 3600000L + i * 600000L // batches 10 min apart
        val batch = users.flatMap { u =>
          Seq((i * 100L + u, u, new java.sql.Timestamp(base), "view"),
            (i * 100L + 50L + u, u,
              new java.sql.Timestamp(base + 30000L), "purchase"))
        }
        input.addData(batch)
        q.processAllAvailable()
        states += Option(q.lastProgress).toSeq
          .flatMap(_.stateOperators.map(_.numRowsTotal)).sum
        info(s"batch $i: state=${states.last} emitted=${spark.table("graft_sjoin_bounded").count()}")
      }
      val out = spark.table("graft_sjoin_bounded").count()
      assert(out == (k * users.size).toLong, s"expected ${k * users.size} pairs, got $out")
      // plateau: once eviction is active (watermark trails by delay +
      // window < 2 batches), state stops tracking cumulative input.
      // Without watermark eviction state would reach 10 rows/batch × 10
      // batches = 100 rows; bound it by 3 batches' worth.
      val fed = k * users.size * 2
      assert(states.last <= 3L * users.size * 2,
        s"state ${states.last} rows has not plateaued (fed $fed); trace=$states")
      // and the plateau is flat, not merely sub-linear: the late-run
      // maximum must not exceed the mid-run maximum
      assert(states.drop(6).max <= states.slice(2, 6).max,
        s"state still growing late in the run: $states")
    } finally q.stop()
  }

  test("state-partition knob changes no results and restores the session conf") {
    import graft.streaming.StreamConf
    val shuffleKey = "spark.sql.shuffle.partitions"
    val before = spark.conf.get(shuffleKey)
    val base = graft.streaming.EventsStream.tumblingCounts(spark, sf)
      .collect().map(_.toSeq).toSet
    spark.conf.set(StreamConf.Key, "2")
    try {
      val narrow = graft.streaming.EventsStream.tumblingCounts(spark, sf)
        .collect().map(_.toSeq).toSet
      // state partition count is a physical knob: the emitted rollup must
      // be identical, and the batch-side shuffle width must come back
      assert(narrow == base)
      assert(spark.conf.get(shuffleKey) == before,
        "withStatePartitions must restore the session shuffle width")
    } finally spark.conf.unset(StreamConf.Key)
  }

  test("bounded dedup run collapses a self-unioned source to the distinct set") {
    val out = graft.streaming.EventsStream.dedupedRun(spark, sf)
    val total = graft.core.Tables.events(spark, sf).count()
    // every event redelivered once; dedup must emit each exactly once
    assert(out.count() == total)
    assert(out.select("event_id").distinct().count() == total)
  }

  test("stream-static enrichment attaches dim attributes per event") {
    val out = graft.streaming.EventsStream.enriched(spark, sf)
    val total = graft.core.Tables.events(spark, sf).count()
    assert(out.count() == total)
    // users within the customer key range must be enriched
    val maxCust = graft.core.Tables.customer(spark, sf)
      .agg(max("c_custkey")).head().getLong(0)
    assert(out.filter(col("user_id") <= maxCust && col("segmento").isNull).count() == 0)
  }
}

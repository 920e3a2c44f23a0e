package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.SessionizeStream
import graft.streaming.SessionizeStream.{Event, SessionOut}

class SessionizeStreamSpec extends AnyFunSuite {
  import TestSpark._

  // NOTE: start above epoch 0 — a ts equal to the initial watermark (0)
  // is dropped as late by flatMapGroupsWithState.
  private def ts(minutes: Long): Timestamp = new Timestamp(minutes * 60000L)

  private def runScenario(queryName: String): Unit = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = SessionizeStream.sessionize(input.toDS(), gapSeconds = 1800,
      watermarkDelay = "1 minute")
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName(queryName).start()
    try {
      // user 1: two events 5 min apart (one session), then a 2h gap
      input.addData(Event(1L, ts(5), 1.0), Event(1L, ts(10), 2.0))
      q.processAllAvailable()
      input.addData(Event(1L, ts(130), 5.0)) // closes first session inline
      q.processAllAvailable()
      // user 2 traffic advances the watermark past user 1's timeout
      input.addData(Event(2L, ts(600), 9.0))
      q.processAllAvailable()
      input.addData(Event(2L, ts(1300), 9.0))
      q.processAllAvailable()

      val out = spark.table(queryName).as[SessionOut].collect()
      val u1 = out.filter(_.user_id == 1L).sortBy(_.inicio.getTime)
      assert(u1.length == 2, s"expected both user-1 sessions, got ${u1.toSeq}")
      assert(u1(0).n_eventos == 2 && u1(0).imp_valor == 3.0)
      assert(u1(0).inicio == ts(5) && u1(0).fin == ts(10))
      // second session closed by event-time timeout, not by an event
      assert(u1(1).n_eventos == 1 && u1(1).imp_valor == 5.0 && u1(1).inicio == ts(130))
      // user 2's first session closed inline by its second event
      val u2 = out.filter(_.user_id == 2L)
      assert(u2.exists(s => s.inicio == ts(600) && s.n_eventos == 1))
    } finally q.stop()
  }

  test("stateful sessionizer closes sessions on gap and on watermark timeout") {
    runScenario("graft_sessions_test")
  }

  test("sessionizer runs on the RocksDB state store provider") {
    // the production state backend at scale: state lives off-heap/on-disk
    // per executor instead of the in-memory HDFS-backed default
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try runScenario("graft_sessions_rocksdb")
    finally prior match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}

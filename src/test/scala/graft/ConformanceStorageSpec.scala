package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{ConformanceJobs, ConformanceLake, ConformanceRunner, ConformanceStorage}
import graft.sources.ConformanceRunner.Params

/** The storage-backed conformance flow (round-6 verdict item 2): the
  * reference materializes every layer to the lake and re-reads —
  * ConformanceStorage replays exactly that over TxnTables, and these
  * specs pin (a) bit-equality with the in-memory engine on a whole fact
  * closure, (b) partition-scoped incremental semantics: an
  * incremental-period re-run rewrites ONLY the touched partitions, and
  * (c) upsert idempotence for the merge-mode jobs.
  */
class ConformanceStorageSpec extends AnyFunSuite {
  import TestSpark._

  private def tmpRoot(tag: String): String =
    Files.createTempDirectory(s"graft-confstore-$tag").toString

  test("fact closure through storage is bit-equal to the in-memory engine") {
    val lake = tmpRoot("eq")
    val t = ConformanceStorage.runToLake(spark, sf, lake, "fact_reparto_detalle")
    val inMemory = ConformanceLake.runJob(spark, sf, "fact_reparto_detalle")
    // partitioned storage reads surface partition columns last — align
    // column order, then demand bit-equality
    import org.apache.spark.sql.functions.col
    val viaStorage = t.read().select(inMemory.columns.map(col).toIndexedSeq: _*)
    assert(viaStorage.columns.toSeq == inMemory.columns.toSeq)
    assert(viaStorage.exceptAll(inMemory).isEmpty
      && inMemory.exceptAll(viaStorage).isEmpty,
      "storage-materialized fact must equal the plan-resolved fact")
  }

  test("incremental period re-run rewrites only the touched partitions") {
    val lake = tmpRoot("incr")
    val first = Params(periods = Seq("199504", "199505"))
    val t = ConformanceStorage.runToLake(spark, sf, lake,
      "fact_reparto_detalle", first)
    val before = t.entriesFull().groupBy(_.part)
    assert(before.keys.exists(_.contains("id_periodo=199504")))

    // a later run covering ONLY the next period (the daily-job shape)
    val incr = Params(periods = Seq("199506"))
    ConformanceStorage.runToLake(spark, sf, lake, "fact_reparto_detalle", incr)
    val after = t.entriesFull().groupBy(_.part)
    assert(after.keys.exists(_.contains("id_periodo=199506")),
      "incremental run must add the new period's partitions")
    // untouched periods: identical FILES carried by reference, not
    // rewritten — the property that bounds an incremental rebuild's IO
    // by the churn, not the table size
    before.filter(_._1.contains("id_periodo=19950")).foreach { case (part, es) =>
      assert(after.contains(part), s"partition $part lost by incremental run")
      assert(after(part).map(_.file).toSet == es.map(_.file).toSet,
        s"partition $part was rewritten by a run that never touched it")
    }
  }

  test("upsert-mode jobs are idempotent through storage") {
    val lake = tmpRoot("upsert")
    // m_tipo_venta: a master with id columns and writeMode=upsert
    val job = ConformanceJobs.byName("m_tipo_venta")
    assume(job.writeMode == "upsert" && job.idColumns.nonEmpty)
    val mem = ConformanceLake.runJob(spark, sf, "m_tipo_venta")
    import org.apache.spark.sql.functions.col
    // partitioned storage reads surface partition columns last — align
    def aligned(t: graft.sources.TxnTable) =
      t.read().select(mem.columns.map(col).toIndexedSeq: _*).collect().toSet
    val t1 = ConformanceStorage.runToLake(spark, sf, lake, "m_tipo_venta")
    val once = aligned(t1)
    ConformanceStorage.runToLake(spark, sf, lake, "m_tipo_venta")
    val twice = aligned(t1)
    assert(once == twice, "re-running an upsert job must not change the table")
    // and it matches the in-memory engine
    assert(twice == mem.collect().toSet)
  }

  test("changes() between incremental versions touch only the new period") {
    val lake = tmpRoot("cdc")
    val t = ConformanceStorage.runToLake(spark, sf, lake,
      "t_reparto", Params(periods = Seq("199504")))
    val v1 = t.version()
    ConformanceStorage.runToLake(spark, sf, lake,
      "t_reparto", Params(periods = Seq("199505")))
    val v2 = t.version()
    val delta = t.changes(v1, v2)
    import org.apache.spark.sql.functions.col
    assert(delta.count() > 0)
    assert(delta.filter(col("id_periodo") =!= "199505").count() == 0,
      "CDC between incremental versions must only carry the new period")
  }
}

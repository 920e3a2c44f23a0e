package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{JobLock, JobLog, LakeIO, Maintenance}

class MaintenanceSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("compaction reduces file count and preserves data") {
    val root = Files.createTempDirectory("graft_compact").toString
    val lake = LakeIO(spark, root)
    // 8 appends of tiny frames -> many small files
    (1 to 8).foreach { i =>
      lake.append(Seq((i.toLong, s"p${i % 2}", i * 1.0)).toDF("id", "particion", "v"),
        lake.layers.Domain, "t", Seq("particion"))
    }
    val before = Maintenance.fileCount(lake, lake.layers.Domain, "t")
    val sumBefore = lake.read(lake.layers.Domain, "t").agg(org.apache.spark.sql.functions.sum("v"))
      .head().getDouble(0)
    Maintenance.compact(lake, lake.layers.Domain, "t", Seq("particion"))
    val after = Maintenance.fileCount(lake, lake.layers.Domain, "t")
    val sumAfter = lake.read(lake.layers.Domain, "t").agg(org.apache.spark.sql.functions.sum("v"))
      .head().getDouble(0)
    assert(after < before, s"expected fewer files: $before -> $after")
    assert(sumBefore == sumAfter)
    assert(lake.read(lake.layers.Domain, "t").count() == 8)
  }

  test("job log tracks status transitions and failures") {
    val root = Files.createTempDirectory("graft_log").toString
    val log = JobLog(root)
    log.tracked("t_venta", "domain") { 42 }
    assert(log.lastStatus("t_venta").contains(log.Status.Succeeded))
    intercept[RuntimeException] {
      log.tracked("t_rota", "domain") { throw new RuntimeException("boom") }
    }
    assert(log.lastStatus("t_rota").contains(log.Status.Failed))
    assert(log.lastStatus("t_inexistente").isEmpty)
  }

  test("job lock gives exclusive execution with skip semantics") {
    val root = Files.createTempDirectory("graft_lock").toString
    val lock = JobLock(root)
    assert(lock.tryAcquire("carga_pe"))
    // second acquirer is told to skip, like the reference's wait response
    assert(lock.exclusively("carga_pe") { 1 }.isEmpty)
    lock.release("carga_pe")
    assert(lock.exclusively("carga_pe") { 2 }.contains(2))
  }
}

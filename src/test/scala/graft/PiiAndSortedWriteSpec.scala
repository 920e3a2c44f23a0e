package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.TextAnalysis
import graft.sources.LakeIO

class PiiAndSortedWriteSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("pii scrub replaces emails, phones, ips, and card numbers") {
    val df = Seq(
      "contact me at jane.doe+x@example.co.uk today",
      "call 555-123-4567 or +51 999-888-777",
      "server at 192.168.1.100 responded",
      "card 4111111111111111 declined",
      "clean text with no pii at all").toDF("text")
    val out = df.select(TextAnalysis.scrubPii($"text").as("t"),
      TextAnalysis.piiCount($"text").as("n")).as[(String, Int)].collect()
    assert(out(0)._1 == "contact me at <EMAIL> today" && out(0)._2 == 1)
    assert(out(1)._1.contains("<PHONE>") && !out(1)._1.contains("4567"))
    assert(out(2)._1 == "server at <IP> responded")
    assert(out(3)._1 == "card <CARD> declined")
    assert(out(4)._1 == "clean text with no pii at all" && out(4)._2 == 0)
  }

  test("sorted write produces range-disjoint files (min/max prunable)") {
    val root = Files.createTempDirectory("graft_sorted").toString
    val lake = LakeIO(spark, root)
    val ord = graft.core.Tables.orders(spark, sf)
    lake.writeSorted(ord, lake.layers.Domain, "orders_sorted",
      sortCols = Seq("o_orderdate"), numFiles = 4)
    // per-file ranges must not overlap (except at boundaries)
    val files = new java.io.File(lake.tablePath(lake.layers.Domain, "orders_sorted"))
      .listFiles().filter(_.getName.endsWith(".parquet")).map(_.getPath).sorted
    assert(files.length >= 2)
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(unix_micros(col("o_orderdate").cast("timestamp"))),
          max(unix_micros(col("o_orderdate").cast("timestamp")))).head()
      (r.getLong(0), r.getLong(1), f)
    }.sortBy(_._1)
    ranges.toSeq.sliding(2).foreach { pair =>
      if (pair.length == 2) {
        val (_, maxA, fa) = pair(0)
        val (minB, _, fb) = pair(1)
        assert(maxA <= minB, s"overlapping ranges between $fa and $fb")
      }
    }
    // data preserved
    assert(lake.read(lake.layers.Domain, "orders_sorted").count() == ord.count())
  }
}

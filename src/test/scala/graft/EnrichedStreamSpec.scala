package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EnrichedStreamSpec extends AnyFunSuite {
  import TestSpark._

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

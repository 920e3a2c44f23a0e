package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed (pre-partitioned) tables for shuffle-free co-located joins.
  *
  * The big recurring join in the reference is fact ⋈ fact on the document
  * key (t_venta ⋈ t_venta_detalle on id_venta). Bucketing both sides by
  * that key at write time moves the shuffle from every query to the single
  * ingestion write: Spark's sort-merge join then reads co-located buckets
  * with NO exchange. At 100 TB, bucket the conformed domain layer once and
  * every downstream analytics join skips its largest shuffle.
  *
  * Bucketed tables need the session catalog (saveAsTable), so callers point
  * the session's warehouse at the lake root.
  */
object Bucketing {
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int, sortCol: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCol)
    sortCol.fold(w)(s => w.sortBy(s)).format("parquet").saveAsTable(table)
  }

  /** Join two same-bucketed tables on the bucket key — plans with zero
    * Exchange when bucket counts match. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   key: String, joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key), joinType)
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Two-level per-group quota selection — the 100 TB form of "keep the
  * quota(n) first rows of every group in priority order".
  *
  * The direct form (`row_number() OVER (PARTITION BY group ORDER BY
  * priority)`) puts each whole group through ONE reducer: fine for many
  * small groups, a scale-killer when strata are few and huge (languages,
  * sources). This operator splits the rank into
  *
  *   rank = (rows of the group in earlier priority-prefix buckets)
  *        + (exact rank within this (group, bucket))
  *
  * via (1) a tiny histogram aggregation per (group, bucket) whose running
  * sum yields each bucket's offset, and (2) a window partitioned by
  * (group, bucket) — the wide shuffle spreads every group over as many
  * reducers as there are buckets, and no reducer ever sees more than
  * ~n/buckets rows. The bucket must be a PREFIX of the priority order
  * (rows in bucket b all sort before bucket b+1), which makes the summed
  * rank exactly the global per-group rank — the result is bit-identical
  * to the single-window form (spec-pinned), not an approximation.
  *
  * The histogram is groups × buckets rows — broadcast back to the data.
  *
  * reference: the per-source/per-language gates this refines are
  * artifacts/aws-glue-shaped mixture builds (see pipeline/TrainingQueries
  * q47, pipeline/CurationQueries q57); the two-level split itself has no
  * reference counterpart. */
object StratifiedQuota {

  /** Rows whose per-group priority rank is within `quotaOf(groupSize)`.
    *
    * @param group     grouping column names (the strata)
    * @param priority  orderable priority; smallest ranks first
    * @param bucket    coarse prefix of `priority`'s order (e.g. the first
    *                  two hex chars of an md5 priority → 256 buckets)
    * @param tiebreaks total-order completion after `priority`
    * @param quotaOf   per-group quota as a function of the group row count
    * @param rankCol/nCol/quotaCol output column names (LongType counts,
    *                  IntegerType rank; cast afterwards if needed)
    */
  def select(df: DataFrame, group: Seq[String], priority: Column,
             bucket: Column, tiebreaks: Seq[Column],
             quotaOf: Column => Column,
             rankCol: String = "rango", nCol: String = "n_grupo",
             quotaCol: String = "cuota"): DataFrame = {
    val g = group.map(col)
    val keyed = df.withColumn("__p", priority).withColumn("__b", bucket)
    val hist = keyed.groupBy(g :+ col("__b"): _*)
      .agg(count(lit(1)).as("__c"))
    // per-group running offset + total; both windows share one tiny
    // partitioning of the (groups × buckets)-row histogram
    val wOrd = Window.partitionBy(g: _*).orderBy(col("__b"))
    val wAll = Window.partitionBy(g: _*)
    val meta = hist
      .withColumn("__below", sum(col("__c")).over(wOrd) - col("__c"))
      .withColumn(nCol, sum(col("__c")).over(wAll))
      .drop("__c")
    val wBkt = Window.partitionBy(g :+ col("__b"): _*)
      .orderBy(col("__p") +: tiebreaks: _*)
    keyed.join(broadcast(meta), group :+ "__b")
      .withColumn(rankCol,
        (col("__below") + row_number().over(wBkt)).cast("int"))
      .withColumn(quotaCol, quotaOf(col(nCol)))
      .filter(col(rankCol) <= col(quotaCol))
      .drop("__p", "__b", "__below")
  }
}

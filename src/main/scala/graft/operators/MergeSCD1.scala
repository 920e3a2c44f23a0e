package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD1 merge (upsert) semantics, storage-agnostic.
  *
  * The reference merges with Delta's `whenMatchedUpdateAll /
  * whenNotMatchedInsertAll` (reference: artifacts/aws-glue/layer/
  * common_jobs_functions.py:288-304 `update_table`). Re-expressed as a
  * relational operator: union target+source and keep the source row per
  * key. One shuffle on the merge key; equivalent to a full-outer-join
  * merge but with half the shuffled payload (no wide join row).
  *
  * At lake scale this pairs with partition pruning: merge only the
  * partitions the source touches (reference partitions by
  * id_pais/id_periodo and overwrites dynamically — see LakeIO.upsert).
  */
object MergeSCD1 {
  private val SIDE = "__graft_src"

  /** Rows from `source` win over `target` on key equality; all other
    * target rows pass through. Schemas align by name with Delta-style
    * evolution (the reference's merge runs with autoMerge semantics,
    * reference: common_jobs_functions.py:288-304):
    *  - columns only in `source` are appended; pre-existing target rows
    *    read null there;
    *  - columns only in `target` behave like `whenMatchedUpdateAll`: a
    *    matched row KEEPS the target's value (the source cannot set what
    *    it does not carry), filled via a window over the same merge keys
    *    the dedup already shuffles on — no extra Exchange. */
  def merge(target: DataFrame, source: DataFrame, keys: Seq[String]): DataFrame = {
    val tCols = target.columns.toSeq
    val extras = source.columns.toSeq.filterNot(tCols.contains)
    val srcMissing = tCols.filterNot(source.columns.contains).filterNot(keys.contains)
    val tagged = source.withColumn(SIDE, lit(0))
      .unionByName(target.withColumn(SIDE, lit(1)), allowMissingColumns = true)
      .select((tCols ++ extras).map(col) :+ col(SIDE): _*)
    val filled =
      if (srcMissing.isEmpty) tagged
      else {
        val w = Window.partitionBy(keys.map(col): _*)
        srcMissing.foldLeft(tagged) { (d, c) =>
          d.withColumn(c, coalesce(col(c), first(col(c), ignoreNulls = true).over(w)))
        }
      }
    DedupLatest.latest(filled, keys, Seq(col(SIDE).asc)).drop(SIDE)
  }

  /** Update-only merge: matched keys take the source row, unmatched source
    * rows are DROPPED (the reference's whenMatchedUpdateAll-without-insert,
    * reference: common_jobs_functions.py:323-337 `read_spark_table`).
    * The semi join restricts the source to existing keys, then the normal
    * merge applies — still one shuffle per side on the keys. */
  def updateOnly(target: DataFrame, source: DataFrame, keys: Seq[String]): DataFrame = {
    val existing = source.join(target.select(keys.map(col): _*).distinct(),
      keys, "left_semi")
    merge(target, existing, keys)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Gap-based sessionization (batch form).
  *
  * The reference's visit/event flows (t_visita, events stream) group
  * activity bursts; the canonical formulation: a new session starts when
  * the gap to the previous event exceeds a threshold. Implemented as
  * lag + running sum over one window — a single shuffle on the user key,
  * linear per partition, no self-join. The streaming twin lives in
  * graft.streaming (flatMapGroupsWithState).
  */
object Sessionize {
  /** Adds `sessionCol` (1-based per-user session ordinal). `order` must
    * totally order events within a user (pass a unique tiebreak). */
  def byGap(df: DataFrame, userCol: String, tsCol: String,
            gapSeconds: Long, tiebreak: Column,
            sessionCol: String = "session_id"): DataFrame = {
    val w  = Window.partitionBy(col(userCol)).orderBy(col(tsCol), tiebreak)
    val us = unix_micros(col(tsCol))
    val prev = lag(us, 1).over(w)
    val isNew = when(prev.isNull || (us - prev) > gapSeconds * 1000000L, 1L).otherwise(0L)
    df.withColumn(sessionCol,
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast(LongType))
  }
}

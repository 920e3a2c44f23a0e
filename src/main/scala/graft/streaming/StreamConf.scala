package graft.streaming

import org.apache.spark.sql.SparkSession

/** Streaming state sizing, decoupled from batch shuffle width.
  *
  * A stateful streaming operator keeps one state-store instance per
  * shuffle partition — a stream-stream join keeps FOUR (two stores per
  * side) — and every micro-batch pays a per-instance commit (delta file
  * write + snapshot bookkeeping) whether or not the partition saw data.
  * Unlike batch shuffle width, which tracks scan volume, the right state
  * partition count tracks stateful-key cardinality and arrival rate; a
  * session sized for wide batch scans (shuffle.partitions = cores or
  * more) pays that per-instance commit tax for no parallelism benefit
  * when per-batch state is small.
  *
  * `spark.graft.stream.statePartitions` sets the count independently of
  * `spark.sql.shuffle.partitions`. The count is pinned into the
  * checkpoint by the first batch (Spark re-reads it from the offset log
  * on restart), which is exactly the property that makes a scoped
  * set/restore around stream start safe: later batches ignore the
  * restored session value.
  */
object StreamConf {
  val Key = "spark.graft.stream.statePartitions"
  private val ShuffleKey = "spark.sql.shuffle.partitions"

  /** Runs `body` (define + start + drain a stream) with shuffle
    * partitions set to the configured state-partition count, restoring
    * the session value afterwards. No-op when the conf is unset. */
  def withStatePartitions[T](spark: SparkSession)(body: => T): T =
    spark.conf.getOption(Key) match {
      case None => body
      case Some(n) =>
        val prev = spark.conf.get(ShuffleKey)
        spark.conf.set(ShuffleKey, n)
        try body finally spark.conf.set(ShuffleKey, prev)
    }
}

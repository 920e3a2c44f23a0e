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

  private val NoDataKey = "spark.sql.streaming.noDataMicroBatches.enabled"

  /** Runs `body` with the post-data no-data micro-batch disabled,
    * restoring the session value afterwards (the stream clones its
    * session at start, so the scoped set binds the whole run).
    *
    * ONLY for bounded AvailableNow runs whose sinks already hold every
    * output row once the data batches finish: append-mode dropDuplicates
    * emits at arrival, stream-stream INNER joins emit at match time —
    * for those, the extra no-data batch after the last data batch exists
    * to advance the watermark and evict state, re-executing the full
    * plan for zero output rows (r14 floor probe: 0.53 s of q41's 1.83 s
    * wall, 0.18 s of q59's 1.11 s — walCommit + commitOffsets + a
    * no-input addBatch). A continuous deployment keeps the default: the
    * no-data batch is what bounds state between data arrivals.
    *
    * NOT for event-time TIMEOUT emission (q37's sessionizer fires
    * timeouts in the post-data batch) and NOT for watermark-gated
    * append aggregations (file-sink tumbling emits a window only once
    * the watermark passes its end). */
  def withoutNoDataBatch[T](spark: SparkSession)(body: => T): T = {
    val prev = spark.conf.getOption(NoDataKey)
    spark.conf.set(NoDataKey, "false")
    try body finally prev match {
      case Some(v) => spark.conf.set(NoDataKey, v)
      case None    => spark.conf.unset(NoDataKey)
    }
  }
}

package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory with the scale-oriented defaults every entry point uses.
  *
  * The knobs are cluster-size-relative (AQE, broadcast threshold), never
  * hard-coded to local mode, so the same plans hold on a 1000-executor
  * cluster; `shufflePartitions` is the only local-mode concession.
  */
object GraftSession {
  /** graft's recommended conf set, applied to any builder — the same knobs
    * whether the session is local or a 1000-executor cluster (cluster
    * sizing itself — executors, memory, shuffle partitions — stays with
    * the deployment). Includes the GraftExtensions injection so every
    * kernel is SQL-callable from session start. */
  def tuned(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    // ObjectHashAggregate falls back to SORT-BASED aggregation after only
    // 128 map keys — tuned for aggregates whose per-group object buffers
    // can be huge, but graft's TypedImperativeAggregates
    // (multi_distinct_count's CompactLongSets) hold state bounded by the
    // PARTITION's row count, so the fallback buys nothing and costs a
    // whole-fact sort: measured at the 100x relational slice, q8 went
    // super-linear (scaling exponent 1.30, 945 task-seconds) purely from
    // sorting + spilling 60M rows that a 47k-key hash map handled in
    // seconds. 2^19 keys keeps worst-case simultaneous map state around
    // ~100 MB/task (all-distinct adversarial partition) so the fallback
    // still protects the heap where it actually can matter.
    .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
      (1 << 19).toString)
    // 64 MB broadcast threshold (the 10 MB default predates multi-GB
    // executors). The knob is inherently scale-adaptive: a side only
    // broadcasts when its MEASURED size is under the cap, so a fact that
    // outgrows it shuffles exactly as before — raising it just stops a
    // 26 MB join side from dragging a two-stage plan into four stages of
    // shuffle machinery (q8 at the 10x relational slice: the orders side
    // crossed 10 MB and the wall doubled on stage serialization alone).
    // Executor sizing note: a 64 MB broadcast deserializes to a few
    // hundred MB of build map at worst, the standard budget for >= 4 GB
    // executors, which GraftSession targets.
    .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)

  def local(cores: Int = Runtime.getRuntime.availableProcessors(),
            shufflePartitions: Int = 32): SparkSession = {
    val s = tuned(SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      // Deployment-sizing knob (like shuffle.partitions, NOT in tuned()):
      // on a single node reading local NVMe, split metadata is free and
      // the lake's write layout caps row groups at 16 MB, so 32 MB scan
      // splits (~2 row groups) pack waves far better than the 128 MB
      // default — measured at the 100x slice, a 3-branch scan-agg's wall
      // dropped 1.22 -> 0.90 s purely from wave-tail smoothing. Only
      // binds once a table exceeds cores x 32 MB (Spark already targets
      // one split per core below that), so small-SF plans are unchanged.
      // A multi-rack deployment would keep 128 MB+ to bound task count.
      .config("spark.sql.files.maxPartitionBytes", (32 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

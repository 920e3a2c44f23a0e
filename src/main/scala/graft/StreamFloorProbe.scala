package graft

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Micro-batch floor decomposition for the bounded streaming queries
  * (q14 tumbling, q37 sessionize, q41 stream-stream join, q59 dedup) —
  * the round-10 verdict's item 3: these four have been prose-exonerated
  * as "fixed micro-batch overhead vs an in-process batch replay" since
  * round 6; this harness turns that into a committed measurement.
  *
  * For each query and slice it runs the full AvailableNow lifecycle and
  * records, per micro-batch (via StreamingQueryListener): input rows and
  * the engine's own durationMs breakdown — triggerExecution (the whole
  * batch), addBatch (plan execution: the only part that carries data
  * cost), and the pure-bookkeeping phases (getBatch / latestOffset /
  * queryPlanning / walCommit / commitOffsets, plus state-store commit
  * time inside addBatch that the breakdown cannot split out).
  *
  * The floor claim is then computable from the artifact alone:
  *   wall ≈ Σ_batches triggerExecution, and the non-addBatch share plus
  *   addBatch's near-flat growth under 10× input (exponent) IS the
  *   micro-batch floor. A data-dominated query would show addBatch
  *   scaling with rows and the overhead share collapsing.
  *
  * Usage: runMain graft.StreamFloorProbe <outJson> [runsPerQuery=3]
  *   Slices: sf0.1 plus the 10x ScaleData slice (env
  *   SPARK_GRAFT_SLICE_10X, default /tmp/graft_scaled_10x).
  */
object StreamFloorProbe {
  private final case class Batch(rows: Long, trigger: Long, addBatch: Long,
                                 other: Long, phases: Map[String, Long])

  private final class Capture extends StreamingQueryListener {
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[Batch]()
    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val p = e.progress
      val d = p.durationMs
      def ms(k: String): Long = Option(d.get(k)).map(_.longValue).getOrElse(0L)
      val trigger = ms("triggerExecution")
      val add = ms("addBatch")
      import scala.jdk.CollectionConverters._
      val phases = d.asScala.map { case (k, v) => k -> v.longValue }.toMap ++
        // state-operator internals (summed over operators): where the
        // state stage's task time goes — update/remove/commit vs compute
        p.stateOperators.toSeq.flatMap(s => Seq(
          "state.allUpdatesTimeMs" -> s.allUpdatesTimeMs,
          "state.allRemovalsTimeMs" -> s.allRemovalsTimeMs,
          "state.commitTimeMs" -> s.commitTimeMs,
          "state.numRowsTotal" -> s.numRowsTotal,
          "state.memoryUsedBytes" -> s.memoryUsedBytes))
          .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
      batches.add(Batch(p.numInputRows, trigger, add,
        math.max(0L, trigger - add), phases)): Unit
    }
  }

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/root/repo/STREAM_FLOOR_r11.json")
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val slices = Seq(
      "sf0.1" -> "/root/testdata/sf0.1",
      "10x" -> sys.env.getOrElse("SPARK_GRAFT_SLICE_10X", "/tmp/graft_scaled_10x"))
      .filter(s => new java.io.File(s._2).isDirectory)
    val names = Seq("q14_stream_tumbling", "q37_stream_sessionize",
      "q41_stream_join", "q59_stream_dedup")

    // session parity with Bench.buildSession (r14): statePartitions
    // default 4 (the bench value — override via SPARK_GRAFT_STREAM_PARTS
    // for sweeps), same scratch-dir rule, so the floor decomposition
    // attributes the SAME walls the bench reports
    val b0 = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    sys.env.get("SPARK_GRAFT_LOCAL_DIR").orElse {
      val shm = new java.io.File("/dev/shm")
      if (shm.isDirectory && shm.canWrite) Some("/dev/shm/graft-scratch")
      else None
    }.foreach(d => b0.config("spark.local.dir", d))
    val spark = graft.core.GraftSession.tuned(b0
      .config("spark.graft.stream.statePartitions",
        sys.env.getOrElse("SPARK_GRAFT_STREAM_PARTS", "4"))
      .config("spark.sql.files.maxPartitionBytes", (32 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val results = mutable.LinkedHashMap[String, Any]()
    slices.foreach { case (sliceName, dir) =>
      names.foreach { name =>
        val attempts = (1 to runs).map { _ =>
          val cap = new Capture
          spark.streams.addListener(cap)
          val t0 = System.nanoTime()
          SparkEntry.queries(name)(spark, dir)
            .write.format("noop").mode("overwrite").save()
          val wall = (System.nanoTime() - t0) / 1e9
          // listener events are async; drain before detaching
          Thread.sleep(200)
          spark.streams.removeListener(cap)
          import scala.jdk.CollectionConverters._
          (wall, cap.batches.asScala.toVector)
        }
        val (wall, batches) = attempts.minBy(_._1)
        val rows = batches.map(_.rows).sum
        val trig = batches.map(_.trigger).sum
        val add = batches.map(_.addBatch).sum
        val other = batches.map(_.other).sum
        // wall − Σtrigger = everything OUTSIDE micro-batch execution:
        // per-run define (schema read), query start (checkpoint dir,
        // offset/commit log init, state provider load), stop, and the
        // final memory-sink table scan — the per-RUN constants VERDICT
        // r13 item 2 asks to decompose
        val outside = wall - trig / 1000.0
        results(s"${sliceName}.$name") = mutable.LinkedHashMap(
          "wall_s" -> f"$wall%.3f".toDouble,
          "walls_all_runs" -> attempts.map(a => f"${a._1}%.3f".toDouble),
          "n_batches" -> batches.size,
          "input_rows" -> rows,
          "trigger_ms_total" -> trig,
          "addbatch_ms_total" -> add,
          "bookkeeping_ms_total" -> other,
          "outside_trigger_s" -> f"$outside%.3f".toDouble,
          "bookkeeping_frac" -> (if (trig > 0) f"${other.toDouble / trig}%.3f".toDouble else 0.0),
          "batches" -> batches.map(b => mutable.LinkedHashMap(
            "rows" -> b.rows, "trigger_ms" -> b.trigger,
            "addbatch_ms" -> b.addBatch, "other_ms" -> b.other,
            "phases_ms" -> mutable.LinkedHashMap(
              b.phases.toSeq.sortBy(_._1): _*))))
        println(f"[stream-floor] $sliceName $name wall=$wall%.2fs " +
          f"batches=${batches.size} rows=$rows trig=${trig}ms add=${add}ms " +
          f"outside=$outside%.2fs")
      }
    }
    // cross-slice exponents on the min walls (10x input step)
    val exps = if (slices.size < 2) Seq.empty else names.map { n =>
      val w1 = results(s"sf0.1.$n").asInstanceOf[mutable.LinkedHashMap[String, Any]]("wall_s").asInstanceOf[Double]
      val w10 = results(s"10x.$n").asInstanceOf[mutable.LinkedHashMap[String, Any]]("wall_s").asInstanceOf[Double]
      val a1 = results(s"sf0.1.$n").asInstanceOf[mutable.LinkedHashMap[String, Any]]("addbatch_ms_total").asInstanceOf[Long]
      val a10 = results(s"10x.$n").asInstanceOf[mutable.LinkedHashMap[String, Any]]("addbatch_ms_total").asInstanceOf[Long]
      n -> mutable.LinkedHashMap(
        "wall_exponent_log10" -> f"${math.log10(w10 / w1)}%.3f".toDouble,
        "addbatch_exponent_log10" ->
          (if (a1 > 0 && a10 > 0) f"${math.log10(a10.toDouble / a1)}%.3f".toDouble else 0.0))
    }

    def j(v: Any): String = v match {
      case m: mutable.LinkedHashMap[_, _] =>
        m.map { case (k, x) => s""""$k":${j(x)}""" }.mkString("{", ",", "}")
      case m: Map[_, _] =>
        m.map { case (k, x) => s""""$k":${j(x)}""" }.mkString("{", ",", "}")
      case s: Seq[_] => s.map(j).mkString("[", ",", "]")
      case s: String => "\"" + s + "\""
      case other => other.toString
    }
    val doc = mutable.LinkedHashMap(
      "note" -> ("bounded AvailableNow streaming queries vs the in-process " +
        "batch oracle: per-micro-batch durationMs decomposition from " +
        "StreamingQueryProgress. The wall is n_batches x per-batch floor " +
        "(bookkeeping + fixed addBatch plan execution), not data cost — " +
        "computable from bookkeeping_frac and the addBatch exponent under " +
        "a 10x input step. agg=min over runs per (slice, query)."),
      "runs_per_query" -> runs,
      "queries" -> mutable.LinkedHashMap(results.toSeq: _*),
      "exponents" -> mutable.LinkedHashMap(exps: _*))
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (j(doc) + "\n").getBytes("UTF-8")): Unit
    println(s"[stream-floor] wrote $out")
    spark.stop()
  }
}

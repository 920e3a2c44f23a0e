package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Volume sweep for the heavy-hitter operators: runs the dedup / ANN /
  * curation / streaming queries on a corpus scaled `factor`× past sf0.1
  * (~sf1 volume), where cap and fallback paths that are invisible at small
  * SF start to activate (round 2's q20 bucket cap taught this).
  *
  * Scaling is metamorphic, not synthetic: each table is unioned `factor`
  * times with ids remapped by a stride chosen ≢ 0 (mod 10), so every
  * original document gains factor−1 EXACT copies spread across the %10
  * slices the catalog queries key on. Exact copies make sf1 ground truth
  * derivable without an sf1 oracle run:
  *   - exact dedup: distinct contents unchanged, copy counts ×factor;
  *   - near-dup: every doc has ≥ factor−1 partners at jaccard exactly 1;
  *   - components: every copy family shares one survivor;
  *   - IVF ANN: every query's neighbor is an exact copy at cosine ~1;
  *   - boilerplate: every gram's df ≥ factor, so frac_comun ≡ 1.0;
  *   - stream dedup: the self-union collapses back to factor×orig rows;
  *   - incremental dedup: stride ≡ 7 (mod 10) puts exactly one member of
  *     each family in the %10=3 increment, with factor−1 corpus twins.
  * A violated invariant = a cap/fallback path that breaks semantics at
  * volume. Results (timings + invariant verdicts) go to one JSON file.
  *
  * Identical copies are also the LSH adversarial case: family members
  * share every band bucket, multiplying bucket sizes by factor.
  */
object ScaleSweep {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse("/tmp/graft_scale_sweep")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.graft.stream.statePartitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dataDir = s"$outDir/data"
    // stride ≥ every original id, and ≡ 7 (mod 10) so the k·stride shifts
    // walk a family through all ten %10 slices exactly once
    def strideFor(maxId: Long): Long = {
      var s = maxId + 1
      while (s % 10 != 7) s += 1
      s
    }
    def scale(table: String, idCol: String): (Long, Long) = {
      // events.ts is TIMESTAMP(NANOS) parquet — read through the Tables
      // conversion (nanos -> µs) like every catalog query does
      val df = if (table == "events") graft.core.Tables.events(spark, src)
               else spark.read.parquet(s"$src/$table.parquet")
      val maxId = df.agg(max(col(idCol))).head.getLong(0)
      val stride = strideFor(maxId)
      val scaled = (0 until factor).map { k =>
        df.withColumn(idCol, col(idCol) + lit(k * stride))
      }.reduce(_ unionByName _)
      scaled.write.mode("overwrite").parquet(s"$dataDir/$table.parquet")
      (df.count(), stride)
    }
    val (origDocs, docStride) = scale("documents", "doc_id")
    val (origVecs, _) = scale("embeddings", "vec_id")
    val (origEvents, _) = scale("events", "event_id")
    println(s"[sweep] scaled $src ×$factor -> $dataDir " +
      s"(docs $origDocs, vecs $origVecs, events $origEvents, stride $docStride)")

    val results = scala.collection.mutable.LinkedHashMap[String, (Double, Boolean, String)]()
    // SPARK_GRAFT_SCALE_ONLY=q15_dedup_exact,q19_... restricts the sweep
    // (the factor-300 chain-activation run skips the quadratic-cost
    // increment queries)
    val only: Option[Set[String]] = sys.env.get("SPARK_GRAFT_SCALE_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def run(name: String)(invariant: DataFrame => (Boolean, String)): Unit = {
      if (only.exists(!_.contains(name))) return
      val t0 = System.nanoTime()
      try {
        val df = SparkEntry.queries(name)(spark, dataDir)
        df.write.format("noop").mode("overwrite").save()
        val (ok, detail) = invariant(df)
        val dt = (System.nanoTime() - t0) / 1e9
        results(name) = (dt, ok, detail)
        println(f"[sweep] $name%-22s ${dt}%7.1f s  ${if (ok) "OK " else "VIOLATED"}  $detail")
      } catch {
        case e: Throwable =>
          val dt = (System.nanoTime() - t0) / 1e9
          results(name) = (dt, false, s"ERROR ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(160)}")
          println(s"[sweep] $name FAILED: ${e.getMessage}")
          e.printStackTrace()
      }
      // unload streaming residue between queries (same hygiene as Bench)
      try spark.streams.active.foreach(_.stop()) catch { case _: Throwable => () }
      try org.apache.spark.sql.execution.streaming.state.StateStore.stop()
      catch { case _: Throwable => () }
    }

    run("q15_dedup_exact") { df =>
      val rows = df.count()
      val copies = df.agg(sum(col("n_copias"))).head.getLong(0)
      val origDistinct = spark.read.parquet(s"$src/documents.parquet")
        .select(md5(col("text"))).distinct().count()
      (rows == origDistinct && copies == factor * origDocs,
        s"distinct=$rows (orig $origDistinct), copies=$copies (${factor}×$origDocs)")
    }
    run("q19_minhash_dedup") { df =>
      val n = df.count()
      val okJ = df.filter(col("max_jaccard") === 1.0).count()
      if (factor - 1 < 256) {
        // all-pairs regime: every doc sees all its factor-1 exact twins
        val okDups = df.filter(col("n_dups") >= factor - 1).count()
        ((okDups >= n * 999 / 1000) && (okJ >= n * 999 / 1000),
          s"n=$n, >=${factor - 1} dups: $okDups, j==1: $okJ")
      } else {
        // chain regime (family > bucket cap): pair COUNTS drop to the
        // linear chain and every doc must keep >= 1 verified partner.
        // j==1 is NOT universal here, and correctly so: two ORIGINAL docs
        // that are near-identical share the exact 64-value minhash
        // signature, their scaled families merge into one equal-sig-order
        // run, ids interleave inside it, and the chain links verify at
        // their true j in [0.8, 1). Those docs still dedup (connectivity
        // is q38's law); require j==1 for the overwhelming majority and
        // >= 1 verified partner for everyone.
        val okAny = df.filter(col("n_dups") >= 1).count()
        (okAny == n && okJ >= n * 97 / 100,
          s"n=$n [chain regime], >=1 dup: $okAny, j==1: $okJ")
      }
    }
    run("q20_simhash") { df =>
      (df.count() > 0, s"rows=${df.count()}")
    }
    run("q38_dedup_components") { df =>
      val fam = df.groupBy((col("doc_id") % docStride).as("family"))
        .agg(countDistinct(col("survivor_id")).as("nsurv"),
          count(lit(1)).as("members"))
      val split = fam.filter(col("nsurv") > 1).count()
      val incomplete = fam.filter(col("members") =!= factor).count()
      val fams = fam.count()
      (split == 0 && incomplete == 0,
        s"families=$fams, split=$split, incomplete=$incomplete")
    }
    run("q55_ann_ivf") { df =>
      val n = df.count()
      val near1 = df.filter(col("cosine") >= 0.999999).count()
      (n == 5 && near1 == n, s"queries=$n, cos~1: $near1")
    }
    run("q56_boilerplate") { df =>
      val n = df.count()
      val all1 = df.filter(col("frac_comun") === 1.0).count()
      (n == factor * origDocs && all1 == n,
        s"rows=$n (exp ${factor * origDocs}), frac==1: $all1")
    }
    run("q59_stream_dedup") { df =>
      val n = df.count()
      (n == factor * origEvents, s"rows=$n (exp ${factor * origEvents})")
    }
    run("q60_incremental_dedup") { df =>
      val n = df.count()
      val okJ = df.filter(col("best_j") === 1.0).count()
      // each family has factor/10 members in the %10=3 increment and
      // factor - factor/10 corpus twins per increment doc
      val twins = factor - factor / 10
      if (twins <= 256) {
        val okM = df.filter(col("n_matches") >= twins).count()
        (okJ == n && okM == n, s"inc=$n, bestJ==1: $okJ, >=$twins matches: $okM")
      } else {
        // cap regime: oversized corpus buckets collapse to one rep per
        // distinct signature, so n_matches counts representatives and the
        // FLAG decision (>= 1 verified match at j >= 0.8) must hold for
        // all. best_j == 1 is NOT universal, and correctly so: an
        // original near-identical to another original with the SAME
        // 64-hash signature collapses into one rep (the overall min id,
        // possibly the other family's), and the verify lands at the true
        // j in [0.8, 1) — a legitimate near-dup flag, same phenomenon as
        // q19's equal-sig chain links. Require j==1 for ~everyone.
        val okM = df.filter(col("n_matches") >= 1).count()
        (okJ >= n * 98 / 100 && okM == n,
          s"inc=$n [cap regime], bestJ==1: $okJ, >=1 match: $okM")
      }
    }

    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val json = results.map { case (k, (t, ok, d)) =>
      s"${q(k)}:{\"sec\":$t,\"ok\":$ok,\"detail\":${q(d)}}"
    }.mkString(
      s"""{"factor":$factor,"src":${q(src)},"orig_docs":$origDocs,"queries":{""",
      ",", "}}")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$outDir/scale_sweep.json"),
      (json + "\n").getBytes("UTF-8")): Unit
    println(json)
    spark.stop()
    if (results.values.exists(!_._2)) sys.exit(1)
  }
}

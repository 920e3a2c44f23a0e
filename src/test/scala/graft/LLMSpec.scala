package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm._
import graft.pipeline.LLMQueries

class LLMSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("all llm queries produce rows at sf0.001") {
    LLMQueries.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("exact dedup collapses identical content") {
    val df = Seq((1L, "same text"), (2L, "same text"), (3L, "other")).toDF("doc_id", "text")
    val out = ExactDedup.summary(df, "text", "doc_id")
      .select("doc_id", "n_copias").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 2L), (3L, 1L)))
    assert(ExactDedup.dropExact(df, "text", "doc_id").count() == 2)
  }

  test("minhash LSH finds a near-duplicate pair") {
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 60).map(i => if (i == 30) "X" else s"w$i").mkString(" ")
    val distinctDoc = (100 to 160).map(i => s"z$i").mkString(" ")
    val df = Seq((1L, base), (2L, nearDup), (3L, distinctDoc)).toDF("doc_id", "text")
    val sig = df.withColumn("sig", MinHashLSH.signature(col("text"), k = 5, numHashes = 64))
    val banded = MinHashLSH.bands(sig, "sig", numBands = 16, rowsPerBand = 4)
    val pairs = MinHashLSH.candidatePairs(banded, "doc_id")
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), s"expected (1,2) in $pairs")
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("simhash: identical -> distance 0, near-dup -> small, distinct -> large") {
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 60).map(i => if (i == 30) "X" else s"w$i").mkString(" ")
    val distinctDoc = (100 to 160).map(i => s"z$i").mkString(" ")
    val df = Seq((1L, base), (2L, base), (3L, nearDup), (4L, distinctDoc)).toDF("id", "text")
      .withColumn("fp", SimHash.simhash64(col("text")))
    val fps = df.select("id", "fp").as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(fps(1L), fps(2L)) == 0)
    assert(ham(fps(1L), fps(3L)) < ham(fps(1L), fps(4L)))
    assert(ham(fps(1L), fps(3L)) <= 8)
  }

  test("degenerate bucket (thousands of identical docs) yields linear pairs") {
    val n = 2000
    val df = (0 until n).map(i => (i.toLong, "same boilerplate text repeated"))
      .toDF("doc_id", "text")
    val sig = df.withColumn("sig", MinHashLSH.signature(col("text")))
    val banded = MinHashLSH.bands(sig, "sig", numBands = 16, rowsPerBand = 4)
    val pairs = MinHashLSH.candidatePairs(banded, "doc_id", maxBucket = 256)
    // every band bucket holds all n docs -> chained, not squared: the n-1
    // consecutive pairs keep the component connected
    assert(pairs.count() == n - 1)
    assert(BoundedPairs.oversizedBuckets(
      banded, Seq("band_idx", "band_hash"), 256).count() == 16)
  }

  test("chain order keeps exact-dup families contiguous in mixed oversized buckets") {
    // one bucket, 300 identical-signature docs interleaved BY ID with 300
    // unrelated docs (alternating ids) — the adversarial layout where an
    // id-ordered chain links only across the groups, and downstream
    // verify (which would reject every cross pair) strands the family.
    val rows = (0 until 600).map { i =>
      // even ids: the identical family (same order key 7); odd: outsiders
      val ord = if (i % 2 == 0) 7L else 1000L + i
      (i.toLong, 0, 0L, ord)
    }
    val banded = rows.toDF("doc_id", "band_idx", "band_hash", "sig_order")
    // with the similarity-key chain: the family is one contiguous run —
    // exactly 299 family-internal links whatever interleaves it
    val ordered = BoundedPairs.withinBuckets(
        banded, Seq("band_idx", "band_hash"), "doc_id", maxBucket = 64,
        chainOrder = Seq(col("sig_order")))
      .filter(col("id_a") % 2 === 0 && col("id_b") % 2 === 0)
    assert(ordered.count() == 299,
      "equal-signature docs must form one contiguous chain run")
    // with id order alone: strict alternation -> ZERO family-internal
    // links; every link crosses groups and dies at the verify stage
    val idOrdered = BoundedPairs.withinBuckets(
        banded, Seq("band_idx", "band_hash"), "doc_id", maxBucket = 64)
      .filter(col("id_a") % 2 === 0 && col("id_b") % 2 === 0)
    assert(idOrdered.count() == 0,
      "sharpness: id-ordered chains must fail this layout (else the test is vacuous)")
    // both variants stay linear, never quadratic
    val total = BoundedPairs.withinBuckets(
      banded, Seq("band_idx", "band_hash"), "doc_id", maxBucket = 64,
      chainOrder = Seq(col("sig_order"))).count()
    assert(total == 599)
  }

  test("ngram jaccard on a known pair") {
    val df = Seq(("a b c d", "b c d e")).toDF("x", "y")
    val j = df.select(NgramJaccard.jaccard(
      Shingles.shingles(col("x"), 2), Shingles.shingles(col("y"), 2)))
      .as[Double].head()
    // x 2-grams: {a b, b c, c d}; y: {b c, c d, d e}; inter 2, union 4
    assert(math.abs(j - 0.5) < 1e-12)
  }

  test("brute-force topk: identical vector ranks first with cosine 1") {
    val df = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f)), (3L, Array(-1.0f, 0.0f))).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(df.filter($"vec_id" === 0), df, "vec_id", "embedding", 3)
      .orderBy("rango").as[(Long, Int, Long, Double)].collect()
    assert(top.head._3 == 1L && math.abs(top.head._4 - 1.0) < 1e-12)
    assert(top.last._3 == 3L && math.abs(top.last._4 + 1.0) < 1e-12)
  }

  test("exactNN grid join matches brute-force top-1 on real embeddings") {
    val emb = graft.core.Tables.embeddings(spark, sf)
    val grid = Similarity.exactNN(emb, "vec_id", "embedding", blocks = 4)
      .as[(Long, Long, Double)].collect().toSet
    val brute = Similarity.bruteForceTopK(emb, emb, "vec_id", "embedding", k = 1)
      .select("query_id", "neighbor_id", "cosine")
      .as[(Long, Long, Double)].collect().toSet
    assert(grid == brute)
  }

  test("q24 plan: distributed cell grouping, no driver-side corpus") {
    // the catalog runs the dense per-cell kernel: a collected corpus would
    // reappear as an ExistingRDD scan (the round-1 scale-killer) — the
    // dense form must instead read the parquet relation, shuffle on the
    // cell key, and run the kernel inside MapGroups
    val plan = LLMQueries.q24EmbeddingDedup(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ExistingRDD"),
      "corpus must not round-trip through the driver")
    assert(plan.contains("MapGroups"), s"expected the cell kernel in:\n$plan")
    assert(plan.contains("FileScan parquet"), s"expected a relation scan in:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"))
  }

  test("exactNN audit twin: equi-join, degrades to shuffle not cartesian") {
    // the expression form stays the audit twin: an equi-join Catalyst sizes
    // adaptively — broadcast while tiny is fine (no hint), but with
    // broadcast unavailable it must become a shuffled join, never a
    // CartesianProduct
    val emb = graft.core.Tables.embeddings(spark, sf)
    val plan = Similarity.exactNN(emb, "vec_id", "embedding")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ExistingRDD") && !plan.contains("MapPartitions"),
      "corpus must not round-trip through the driver")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      s"expected an equi-join in:\n$plan")
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val big = Similarity.exactNN(emb, "vec_id", "embedding")
        .queryExecution.executedPlan.toString
      assert(big.contains("SortMergeJoin") || big.contains("ShuffledHashJoin"),
        s"expected shuffled equi-join with broadcast off in:\n$big")
      assert(!big.contains("CartesianProduct") && !big.contains("BroadcastNestedLoop"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }

  test("nearDupInBuckets finds identical vectors within a bucket") {
    val df = Seq(
      (0L, Array(1.0f, 2.0f, 3.0f)), (1L, Array(1.0f, 2.0f, 3.0f)),
      (2L, Array(-5.0f, 1.0f, 0.5f))).toDF("vec_id", "embedding")
    val nn = Similarity.nearDupInBuckets(df, "vec_id", "embedding")
      .as[(Long, Long, Double)].collect()
      .map { case (q, n, c) => q -> ((n, c)) }.toMap
    assert(nn(0L)._1 == 1L && math.abs(nn(0L)._2 - 1.0) < 1e-12)
    assert(nn(1L)._1 == 0L && math.abs(nn(1L)._2 - 1.0) < 1e-12)
  }

  test("ivf: high recall on clustered data, deterministic cells on real embeddings") {
    // IVF's contract is data-adaptive cells: on clustered embeddings (the
    // real-world shape) probing a few cells finds the true neighbor. Build
    // 8 tight clusters; every vector's true NN is a cluster-mate.
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(8)(Array.fill(16)(rnd.nextFloat() * 10f - 5f))
    val vecs = (0 until 400).map { i =>
      val c = centers(i % 8)
      (i.toLong, c.map(x => x + (rnd.nextFloat() - 0.5f) * 0.01f))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val qs = df.filter($"vec_id" < 24)
    val exact = Similarity.bruteForceTopK(qs, df, "vec_id", "embedding", k = 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    val ivf = Similarity.ivfTopK(qs, df, "vec_id", "embedding", k = 1,
        nCells = 16, probes = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    assert(ivf.keySet == exact.keySet, "every query must produce a result")
    val hits = exact.count { case (q, n) => ivf.get(q).contains(n) }
    assert(hits == exact.size, s"recall@1 on clustered data: $hits/${exact.size}")
    // cells are data-adaptive but deterministic (reproducible across runs)
    val emb = graft.core.Tables.embeddings(spark, sf)
    val a1 = Similarity.ivfAssign(emb, "vec_id", "embedding", nCells = 16)
      .select("vec_id", "cell").as[(Long, Int)].collect().toMap
    val a2 = Similarity.ivfAssign(emb, "vec_id", "embedding", nCells = 16)
      .select("vec_id", "cell").as[(Long, Int)].collect().toMap
    assert(a1 == a2)
  }

  test("ivf incremental maintenance: O(increment) append equals full rebuild, serves new vectors") {
    val emb = graft.core.Tables.embeddings(spark, sf)
    val base = emb.filter($"vec_id" % 5 =!= 4)
    val increment = emb.filter($"vec_id" % 5 === 4)
    // freeze the model on the standing corpus; the daily loop never re-trains
    val model = Similarity.ivfModel(base, "vec_id", "embedding", nCells = 16)
    val idx0 = Similarity.ivfAssignTo(base, "vec_id", "embedding", model)
    // append path: only the increment is assigned (the corpus never rescanned)
    val appended = idx0.unionByName(
      Similarity.ivfAssignTo(increment, "vec_id", "embedding", model))
    // law: frozen-model assignment is per-row, so append == full rebuild
    val rebuilt = Similarity.ivfAssignTo(emb, "vec_id", "embedding", model)
    val a = appended.select($"vec_id", $"cell").as[(Long, Int)].collect().toMap
    val b = rebuilt.select($"vec_id", $"cell").as[(Long, Int)].collect().toMap
    assert(a == b, "incremental append must equal the full rebuild bit-for-bit")
    // serving: a query equal to an increment vector finds it at cosine ~1
    val probe = increment.limit(1)
    val probeId = probe.select($"vec_id").as[Long].head()
    val queries = probe.select(($"vec_id" + 1000000L).as("vec_id"), $"embedding")
    val served = Similarity.ivfTopKWith(queries, appended, model,
        "vec_id", "embedding", k = 1, probes = 4)
      .select($"neighbor_id", $"cosine").as[(Long, Double)].collect()
    assert(served.length == 1 && served(0)._1 == probeId &&
      served(0)._2 > 1.0 - 1e-9,
      s"query cloned from increment vector $probeId must find it: ${served.toSeq}")
  }

  test("ivf Lloyd refinement improves quantization and keeps recall") {
    val rnd = new scala.util.Random(13)
    val centers = Array.fill(8)(Array.fill(16)(rnd.nextFloat() * 10f - 5f))
    val vecs = (0 until 400).map { i =>
      val c = centers(i % 8)
      (i.toLong, c.map(x => x + (rnd.nextFloat() - 0.5f) * 0.01f))
    }
    val df = vecs.toDF("vec_id", "embedding").cache()
    // quantization quality = mean cosine of each vector to its centroid
    def meanAssignCos(refineIters: Int): Double = {
      val cs = (if (refineIters > 0)
        graft.llm.Similarity.ivfCentroidsRefined(df, "vec_id", "embedding", 8, refineIters)
      else graft.llm.Similarity.ivfCentroids(df, "vec_id", "embedding", 8))
        .map { case (_, v, n) => (v, n) }
      vecs.map { case (_, v) =>
        val nv = graft.llm.Similarity.VectorNorms.norm(v)
        cs.map { case (cv, cn) => graft.llm.Similarity.VectorNorms.dot(cv, v) / (cn * nv) }.max
      }.sum / vecs.size
    }
    val base = meanAssignCos(0)
    val refined = meanAssignCos(3)
    assert(refined >= base - 1e-9,
      s"Lloyd refinement must not worsen quantization: $refined < $base")
    // recall@1 with refined cells stays perfect on clustered data
    val qs = df.filter($"vec_id" < 24)
    val exact = Similarity.bruteForceTopK(qs, df, "vec_id", "embedding", k = 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    val ivf = Similarity.ivfTopK(qs, df, "vec_id", "embedding", k = 1,
        nCells = 8, probes = 2, refineIters = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    val hits = exact.count { case (q, n) => ivf.get(q).contains(n) }
    assert(hits == exact.size, s"refined recall@1: $hits/${exact.size}")
    df.unpersist(): Unit
  }

  test("nearDupInBuckets: high recall on clustered data, probes never hurt") {
    val rnd = new scala.util.Random(21)
    val centers = Array.fill(6)(Array.fill(24)(rnd.nextFloat() * 8f - 4f))
    val df = (0 until 240).map { i =>
      (i.toLong, centers(i % 6).map(x => x + (rnd.nextFloat() - 0.5f) * 0.01f))
    }.toDF("vec_id", "embedding")
    def found(probes: Int): Map[Long, Double] =
      Similarity.nearDupInBuckets(df, "vec_id", "embedding", numPlanes = 8, probes = probes)
        .as[(Long, Long, Double)].collect().map { case (q, _, c) => q -> c }.toMap
    val base = found(0)
    val probed = found(2)
    // cluster-mates are near-identical, so their sign patterns collide:
    // most vectors must find a >= 0.99-cosine neighbor without probing
    assert(base.count(_._2 >= 0.99) >= 216, s"recall too low: ${base.size}")
    // multiprobe can only widen the candidate set
    assert(probed.keySet.size >= base.keySet.size)
    assert(base.forall { case (q, c) => probed.get(q).exists(_ >= c - 1e-12) })
  }

  test("query-directed multiprobe beats fixed-order probing per probe") {
    val rnd = new scala.util.Random(33)
    val centers = Array.fill(6)(Array.fill(24)(rnd.nextFloat() * 8f - 4f))
    val df = (0 until 240).map { i =>
      // wider jitter than the clustered test: some cluster-mates land
      // across low-margin planes, which is the case probing exists for
      (i.toLong, centers(i % 6).map(x => x + (rnd.nextFloat() - 0.5f) * 0.6f))
    }.toDF("vec_id", "embedding")
    def goodPairs(probes: Int, adaptive: Boolean): Int =
      Similarity.nearDupInBuckets(df, "vec_id", "embedding",
          numPlanes = 8, probes = probes, adaptive = adaptive)
        .filter(col("cosine") >= 0.99).count().toInt
    val naive = goodPairs(2, adaptive = false)
    val directed = goodPairs(2, adaptive = true)
    // flipping the two lowest-margin planes must recover at least as many
    // true near neighbors as flipping planes 0 and 1 blindly
    assert(directed >= naive, s"directed=$directed naive=$naive")
    // and with the same probe budget it must strictly beat no probing
    assert(directed > goodPairs(0, adaptive = false))
    // probing every plane is order-independent: both strategies visit the
    // identical bucket set, so results coincide exactly
    assert(goodPairs(8, adaptive = true) == goodPairs(8, adaptive = false))
  }

  test("dense-kernel exact NN is bit-identical to the expression-form grid") {
    val e = graft.core.Tables.embeddings(spark, sf)
    val expr = Similarity.exactNN(e, "vec_id", "embedding")
    val dense = Similarity.exactNNDense(e, "vec_id", "embedding")
    assert(dense.except(expr).count() == 0 && expr.except(dense).count() == 0)
    // and with a different block count: the pair partition changes, the
    // result must not
    val dense3 = Similarity.exactNNDense(e, "vec_id", "embedding", blocks = 3)
    assert(dense3.except(expr).count() == 0 && expr.except(dense3).count() == 0)
    // domain note, verified: a zero-norm vector makes the EXPRESSION form
    // throw under ANSI division (no silent NaN ordering divergence is
    // possible on inputs it accepts); the dense kernel's Double.compare
    // keeps Spark's NaN-largest semantics for any caller that disables
    // ANSI. Both forms are defined on nonzero-norm corpora.
    val withZero = e.limit(20).union(
      e.sparkSession.createDataFrame(java.util.List.of(
        org.apache.spark.sql.Row(9999L, Seq.fill(24)(0.0f), 0)), e.schema))
    val thrown = intercept[Exception] {
      Similarity.exactNN(withZero, "vec_id", "embedding").collect()
    }
    def rootMessage(t: Throwable): String =
      (Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => String.valueOf(e.getMessage)).mkString(" | "))
    assert(rootMessage(thrown).contains("DIVIDE_BY_ZERO"),
      s"expected ANSI divide-by-zero, got: ${rootMessage(thrown)}")
  }

  test("quantized top-k: full recall after exact rescore on this corpus") {
    val e = graft.core.Tables.embeddings(spark, sf)
    val qs = e.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(qs, e, "vec_id", "embedding", k = 3)
      .select("query_id", "rango", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    val quant = Similarity.quantizedTopK(qs, e, "vec_id", "embedding", k = 3)
      .select("query_id", "rango", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    // int8 coarse cut at rescore=8 must keep every true top-3 neighbor;
    // the exact rescore then reproduces the brute-force ranking verbatim
    assert(quant == exact,
      s"missing: ${(exact -- quant).take(5)}; extra: ${(quant -- exact).take(5)}")
  }

  test("incremental dedup scores only increment-vs-corpus, finds planted dups") {
    val df = graft.pipeline.LLMQueries.q60IncrementalDedup(spark, sf).cache()
    // output is exactly the increment slice
    val incIds = graft.core.Tables.documents(spark, sf)
      .filter(col("doc_id") % 10 === 3).count()
    assert(df.count() == incIds)
    assert(df.filter(col("doc_id") % 10 =!= 3).count() == 0)
    // a best match is never an increment doc (asymmetry) and never -1
    // when matches exist
    assert(df.filter(col("n_matches") > 0 &&
      (col("best_match") % 10 === 3 || col("best_match") === -1)).count() == 0)
    // the testdata plants near-dup pairs across the slices
    assert(df.filter(col("n_matches") > 0).count() > 0)
    df.unpersist()
  }

  test("incremental dedup cap collapses duplicated-corpus buckets but keeps the flag") {
    import graft.llm.IncrementalDedup
    // corpus: one 600-copy identical family (every band bucket oversized
    // at cap 8) + distinct fillers; increment: one family twin + one novel
    val family = (0 until 600).map(i => (1000L + i, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
    val fillers = (0 until 20).map(i => (2000L + i, s"filler$i unique words nr$i " + ("x" + i + " ") * 8))
    val corpus = (family ++ fillers).toDF("doc_id", "text")
    val inc = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "completely different novel content with no twin anywhere at all ok")).toDF("doc_id", "text")
    val out = IncrementalDedup.flag(inc, corpus, maxBucket = 8)
      .orderBy("doc_id").collect()
    // twin: flagged at j=1 against a deterministic representative (the
    // family's min id) — NOT 600 matches; novel: clean
    assert(out(0).getAs[Long]("n_matches") >= 1L)
    assert(out(0).getAs[Long]("n_matches") <= 8L,
      s"cap must bound matches to reps, got ${out(0).getAs[Long]("n_matches")}")
    assert(out(0).getAs[Double]("best_j") == 1.0)
    assert(out(0).getAs[Long]("best_match") == 1000L)
    assert(out(1).getAs[Long]("n_matches") == 0L)
    // below the cap the exact match set is preserved: same corpus, cap
    // high enough that no bucket is oversized -> all 600 twins counted
    val exact = IncrementalDedup.flag(inc, corpus, maxBucket = 10000)
      .orderBy("doc_id").collect()
    assert(exact(0).getAs[Long]("n_matches") == 600L)
    assert(exact(0).getAs[Long]("best_match") == 1000L)
  }

  test("lsh buckets put identical vectors together") {
    val df = Seq((0L, Array(1.0f, 2.0f, 3.0f)), (1L, Array(1.0f, 2.0f, 3.0f)))
      .toDF("vec_id", "embedding")
    val b = Similarity.lshBuckets(df, "vec_id", "embedding").select("bucket")
      .as[Long].collect()
    assert(b(0) == b(1))
  }

  test("rolling min hash: superset text can only lower the min") {
    import graft.functions.RollingMinHash
    import org.apache.spark.unsafe.types.UTF8String
    val a = UTF8String.fromString("the quick brown fox jumps over the lazy dog")
    val b = UTF8String.fromString("PREFIX " + a.toString + " SUFFIX")
    assert(RollingMinHash.compute(b, 16) <= RollingMinHash.compute(a, 16))
    assert(RollingMinHash.compute(a, 16) == RollingMinHash.compute(a, 16))
  }

  test("q18 predicted language is deterministic and in range") {
    val langs = Set("en", "es", "fr", "de", "zh")
    val preds = LLMQueries.q18LangId(spark, sf).select("lang_pred").distinct()
      .as[String].collect().toSet
    assert(preds.subsetOf(langs))
  }

  test("connected components: chain, clique, and pair resolve to min-id survivors") {
    import graft.operators.ConnectedComponents
    // chain 1-2-3-4 (diameter 3, needs >1 round), clique {10,11,12}, pair {20,21}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (10L, 12L),
      (11L, 12L), (20L, 21L)).toDF("id_a", "id_b")
    val out = ConnectedComponents.components(edges)
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set(
      (1L, 1L, 4L), (2L, 1L, 4L), (3L, 1L, 4L), (4L, 1L, 4L),
      (10L, 10L, 3L), (11L, 10L, 3L), (12L, 10L, 3L),
      (20L, 20L, 2L), (21L, 20L, 2L)))
    // empty edge list resolves to an empty labeling, not a crash
    assert(ConnectedComponents.components(
      Seq.empty[(Long, Long)].toDF("id_a", "id_b")).isEmpty)
  }

  test("connected components: a long chain converges in logarithmic rounds") {
    import graft.operators.ConnectedComponents
    // the BoundedPairs cap turns a degenerate bucket of m identical docs
    // into an m-node PATH; one-hop propagation alone would need m rounds,
    // so this pins the star-contraction round count (~log2(300) ≈ 9)
    val chain = (1L until 300L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    // maxDriverEdges = 0 forces the distributed path: this test pins the
    // CONTRACTION round law, which the driver fast path would bypass
    val (lbl, rounds) = ConnectedComponents.labelsWithRounds(chain, maxDriverEdges = 0L)
    assert(rounds <= 12, s"expected O(log n) rounds for a 300-node path, got $rounds")
    val out = ConnectedComponents.components(chain)
      .as[(Long, Long, Long)].collect()
    assert(out.length == 300)
    assert(out.forall { case (_, survivor, size) => survivor == 1L && size == 300L },
      s"non-converged labels: ${out.filter(_._2 != 1L).take(5).mkString(",")}")
    assert(lbl.filter(col("label") =!= 1L).isEmpty)
  }

  test("connected components: driver fast path equals the distributed fixpoint") {
    import graft.operators.ConnectedComponents
    // r13 bounded driver union-find: same labels as star contraction on a
    // graph mixing a chain, a clique, a self-pair-only node, a cross edge
    // and duplicate/reversed edges (the shapes whose union order differs
    // most between the two algorithms)
    val edges = ((1L until 40L).map(i => (i, i + 1)) ++
      Seq((100L, 101L), (101L, 102L), (102L, 100L), (100L, 102L),
        (200L, 200L), (40L, 100L), (300L, 301L), (301L, 300L)))
      .toDF("id_a", "id_b")
    val fast = ConnectedComponents.labels(edges)
      .as[(Long, Long)].collect().toSet
    val dist = ConnectedComponents.labels(edges, maxDriverEdges = 0L)
      .as[(Long, Long)].collect().toSet
    assert(fast == dist, s"driver path diverged: ${(fast diff dist).take(5)} vs ${(dist diff fast).take(5)}")
    // self-pair-only node labels itself on both paths
    assert(fast.contains((200L, 200L)))
    // the cap gates the collect: at cap 0 the distributed path ran (above);
    // at cap >= |edges| the driver path ran — both already asserted equal
  }

  test("connected components: far-end label injection stays logarithmic") {
    import graft.operators.ConnectedComponents
    // the factor-300 sweep's killer shape: a path whose local min (100)
    // sits at one end, with ONE cross edge at the OTHER end (400) to a
    // smaller-id component {1,2}. Min-label propagation + pointer
    // halving needs ~300 rounds here (the new label enters at the far
    // end and walks one path hop per round — the old implementation
    // stranded 275 of 300 members at maxIter); star contraction
    // restructures the edges and stays O(log n).
    val path = (100L until 400L).map(i => (i, i + 1))
    val edges = (path ++ Seq((400L, 1L), (1L, 2L))).toDF("id_a", "id_b")
    val (lbl, rounds) = ConnectedComponents.labelsWithRounds(edges, maxDriverEdges = 0L)
    assert(rounds <= 12, s"expected O(log n) rounds, got $rounds")
    val bad = lbl.filter(col("label") =!= 1L)
    assert(bad.isEmpty,
      s"all 303 nodes share one component with min 1; stranded: ${bad.count()}")
    assert(lbl.count() == 303)
  }

  test("frame sampling yields ceil(duration/step) rows per payload, no shuffle") {
    val docs = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"), Multimodal.asBinary(col("text")).as("payload"))
    val frames = Multimodal.sampleFrames(docs, "payload", everySeconds = 10)
    val expected = docs
      .select(col("doc_id"), Multimodal.durationStub(col("payload")).as("dur"))
      .withColumn("n", ceil(col("dur").cast("double") / 10).cast("long"))
    val counts = frames.groupBy("doc_id").count()
      .join(expected, Seq("doc_id"))
    assert(counts.filter(col("count") =!= col("n")).count() == 0)
    // the explode is pipelined into the scan stage — no Exchange before it
    val plan = frames.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"frame explode must not shuffle:\n$plan")
    // deterministic stub: same payload -> same frame digests
    assert(Multimodal.sampleFrames(docs, "payload").select("frame_sha").collect().toSeq ==
      Multimodal.sampleFrames(docs, "payload").select("frame_sha").collect().toSeq)
  }

  test("AV frame sampling uses the decoded container duration, no shuffle") {
    import graft.llm.MediaSynth
    val synthUdf = udf((id: Long) => MediaSynth.synthAv(id))
    val docs = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id")).filter(col("doc_id") < 60)
      .withColumn("payload", synthUdf(col("doc_id")))
    val frames = Multimodal.sampleFramesAv(docs, "payload", everySeconds = 10)
    // per payload: ceil(floor(dur_ms/1000)/10) frames from the REAL
    // header duration; zero-duration payloads (sub-second clips)
    // contribute no rows
    val counts = frames.groupBy("doc_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 60L).foreach { id =>
      val durS = (id % 3 match {
        case 0 => MediaSynth.wavDurationMs(id)
        case 1 => MediaSynth.mp3DurationMs(id)
        case _ => MediaSynth.mp4DurationMs(id)
      }) / 1000L
      val want = if (durS <= 0) 0L else (durS + 9) / 10
      assert(counts.getOrElse(id, 0L) == want, s"id=$id durS=$durS")
    }
    val plan = frames.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"AV frame explode must not shuffle:\n$plan")
  }

  test("pcm windows: zero shuffle, refused payloads emit no rows, window count exact") {
    import graft.llm.MediaSynth
    val synthUdf = udf((id: Long) =>
      if (id % 7 == 3) Array.fill[Byte](64)(0x11) // garbage: must refuse
      else MediaSynth.synthPcm(id))
    val docs = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id")).filter(col("doc_id") < 70)
      .withColumn("payload", synthUdf(col("doc_id")))
    val w = Multimodal.pcmWindows(docs, "payload")()
    val plan = w.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"pcm windows must not shuffle:\n$plan")
    val counts = w.groupBy("doc_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 70L).foreach { id =>
      val want =
        if (id % 7 == 3) 0L
        else (MediaSynth.pcmTotalSamples(id) + 511) / 512
      assert(counts.getOrElse(id, 0L) == want, s"id=$id")
    }
  }

  test("AV frame bytes are REAL PCM for payload-bearing wavs, stubbed otherwise") {
    import graft.llm.{MediaHeaders, MediaSynth}
    // slow the clock to 100 Hz (fmt rate + byte rate fields) so the
    // sub-second synth clips span ~2-20 s and ts>0 frames exist
    def slowPcm(id: Long): Array[Byte] = {
      val b = MediaSynth.synthPcm(id)
      val ba = 2 * MediaSynth.pcmChannels(id)
      val br = 100 * ba
      b(24) = 100; b(25) = 0; b(26) = 0; b(27) = 0
      b(28) = (br & 0xff).toByte; b(29) = ((br >> 8) & 0xff).toByte
      b(30) = 0; b(31) = 0
      b
    }
    // header-only wav control: id 3000 declares 33800 samples at 8 kHz
    // (4.2 s) but ships no data bytes — must take the stub path
    val synthUdf = udf((id: Long) =>
      if (id % 5 == 4) MediaSynth.synthAv(3000L)
      else slowPcm(id))
    val docs = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id")).filter(col("doc_id") < 40)
      .withColumn("payload", synthUdf(col("doc_id")))
    val rows = Multimodal.sampleFramesAv(docs, "payload", everySeconds = 10)
      .select("doc_id", "frame_ts", "frame_src", "frame_bytes").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0); val ts = r.getInt(1)
      if (id % 5 == 4) assert(r.getString(2) == "stub", s"id=$id")
      else {
        assert(r.getString(2) == "pcm", s"id=$id ts=$ts")
        val got = r.getAs[Array[Byte]]("frame_bytes")
        val ch = MediaSynth.pcmChannels(id)
        val k0 = ts * 100 * ch // 100 Hz patched clock, block-aligned
        got.grouped(2).zipWithIndex.foreach { case (pair, j) =>
          if (pair.length == 2) {
            val v = MediaSynth.pcmSample(id, (k0 + j).toLong)
            assert((pair(0) & 0xff) == (v & 0xff) &&
              (pair(1) & 0xff) == ((v >> 8) & 0xff), s"id=$id ts=$ts j=$j")
          }
        }
      }
    }
    // both sources really occurred
    assert(rows.exists(_.getString(2) == "pcm") &&
      rows.exists(_.getString(2) == "stub"))
  }

  test("multimodal decodeBatches matches the stub expressions") {
    val df = LLMQueries.q26MultimodalMeta(spark, sf)
    val viaBatch = Multimodal.decodeBatches(
      graft.core.Tables.documents(spark, sf)
        .select(col("doc_id"), Multimodal.asBinary(col("text")).as("payload")),
      "payload") { bytes =>
      val n = bytes.length
      (64 + n % 512, 64 + (n * 7) % 512, n % 3 match {
        case 0 => "png"; case 1 => "jpeg"; case _ => "webp" })
    }
    val a = df.select("doc_id", "ancho", "alto", "formato").as[(Long, Int, Int, String)].collect().toSet
    val b = viaBatch.select("doc_id", "ancho", "alto", "formato").as[(Long, Int, Int, String)].collect().toSet
    assert(a == b)
  }
}

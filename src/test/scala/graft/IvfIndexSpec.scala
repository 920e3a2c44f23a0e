package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.llm.{IvfIndex, Similarity}

/** Pins the persisted-IVF-index lifecycle (round-4 verdict item 3): the
  * serving path must be a pure function of the persisted artifacts — the
  * same result whether the index lives in memory, in the TxnTable pair,
  * or in the pruned subset of probed partitions — and the quality story
  * must be measurable (recall@k), not asserted.
  */
class IvfIndexSpec extends AnyFunSuite {
  import TestSpark._

  private val sf01 = "/root/testdata/sf0.01"
  private def emb = Tables.embeddings(spark, sf01)
  private def queries = emb.filter(col("vec_id") < 10)

  test("sqrtCells applies the √N rule with clamps") {
    assert(IvfIndex.sqrtCells(500) == 23)
    assert(IvfIndex.sqrtCells(2000) == 45)
    assert(IvfIndex.sqrtCells(1500000) == 1225)
    assert(IvfIndex.sqrtCells(100) == 16)   // min clamp
    assert(IvfIndex.sqrtCells(0) == 16)
    assert(IvfIndex.sqrtCells(10000000000L) == 65536) // max clamp
  }

  test("persisted-index serve == in-memory serve, pruned and unpruned") {
    val root = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    val model = IvfIndex.buildAndSave(emb, "vec_id", "embedding", root)
    // √500 → 23 cells, from the corpus count, not a toy constant
    assert(model.length == 23)
    val inMem = Similarity.ivfTopKWith(
        queries, Similarity.ivfAssignTo(emb, "vec_id", "embedding", model),
        model, "vec_id", "embedding", k = 10, probes = 4)
      .collect().map(_.toSeq).toSet
    val servedFull = IvfIndex.topK(queries, root, "vec_id", "embedding",
      k = 10, probes = 4, pruned = false).collect().map(_.toSeq).toSet
    val servedPruned = IvfIndex.topK(queries, root, "vec_id", "embedding",
      k = 10, probes = 4).collect().map(_.toSeq).toSet
    // bit-for-bit: same float bits through the parquet round-trip, same
    // deterministic scoring — cosine doubles included in the comparison
    assert(servedFull == inMem, "full-read serve diverged from in-memory")
    assert(servedPruned == inMem, "pruned serve diverged from in-memory")
    assert(inMem.nonEmpty)
  }

  test("filtered serve: full-probe top-k == brute force over the filtered corpus") {
    val root = java.nio.file.Files.createTempDirectory("graft_ivf_f").toString
    val model = IvfIndex.buildAndSave(emb, "vec_id", "embedding", root)
    val pred = pmod(col("label"), lit(2)) === 0
    // full probes ⇒ every cell is a candidate cell, so the filtered serve
    // must be EXACT over the filtered corpus — any divergence means the
    // semi-join dropped/added a candidate
    val served = IvfIndex.topKFiltered(queries, root, "vec_id", "embedding",
        k = 5, meta = emb, where = pred, probes = model.length)
      .collect().map(_.toSeq).toSet
    val brute = Similarity.bruteForceTopK(queries, emb.filter(pred),
        "vec_id", "embedding", k = 5)
      .collect().map(_.toSeq).toSet
    assert(served == brute, "filtered full-probe serve diverged from brute force")
    // every served neighbor satisfies the predicate
    val evenIds = emb.filter(pred).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    val servedIds = served.map(_(2).asInstanceOf[Long]) // (query_id, rango, neighbor_id, cosine)
    assert(servedIds.nonEmpty && servedIds.subsetOf(evenIds))
    // pruned and unpruned filtered serves agree at default probes
    val p = IvfIndex.topKFiltered(queries, root, "vec_id", "embedding",
      k = 5, meta = emb, where = pred).collect().map(_.toSeq).toSet
    val u = IvfIndex.topKFiltered(queries, root, "vec_id", "embedding",
      k = 5, meta = emb, where = pred, pruned = false)
      .collect().map(_.toSeq).toSet
    assert(p == u, "pruned filtered serve diverged from unpruned")
  }

  test("pruned serve reads only the probed cells' partitions") {
    val root = java.nio.file.Files.createTempDirectory("graft_ivf_pr").toString
    val model = IvfIndex.buildAndSave(emb, "vec_id", "embedding", root)
    val cells = IvfIndex.probedCells(queries, "embedding", model, probes = 4)
    // probe-set is bounded by nCells and usually far smaller
    assert(cells.nonEmpty && cells.size <= model.length)
    val pruned = IvfIndex.assignmentTable(spark, root)
      .readParts()(p => p.split('=') match {
        case Array("cell", v) => cells.contains(v.toInt)
        case _                => true
      })
    val full = IvfIndex.assignmentTable(spark, root).read()
    val prunedCells = pruned.select("cell").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(prunedCells == cells.intersect(
      full.select("cell").distinct().collect().map(_.getInt(0)).toSet))
    // the scan got smaller — partition pruning did real work
    assert(pruned.count() < full.count())
  }

  test("append-increment through the persisted table == rebuild on the frozen model") {
    val root = java.nio.file.Files.createTempDirectory("graft_ivf_inc").toString
    val base = emb.filter(col("vec_id") % 5 =!= 0)
    val increment = emb.filter(col("vec_id") % 5 === 0)
    val model = IvfIndex.buildAndSave(base, "vec_id", "embedding", root,
      nCells = IvfIndex.sqrtCells(500))
    IvfIndex.append(increment, "vec_id", "embedding", root): Unit
    val appended = IvfIndex.assignmentTable(spark, root).read()
      .select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val rebuilt = Similarity.ivfAssignTo(emb, "vec_id", "embedding", model)
      .select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(appended == rebuilt,
      "incremental append must equal a full rebuild against the frozen model")
  }

  test("two-level coarse quantizer: both levels persist; full-coarse-probe serve == flat") {
    val root = java.nio.file.Files.createTempDirectory("graft_ivf_2l").toString
    val model = IvfIndex.buildAndSave(emb, "vec_id", "embedding", root,
      nCells = 23, coarseCells = 5)
    val ct = IvfIndex.centroidTable(spark, root).read()
    assert(ct.filter(col("level") === 0).count() == 5)
    assert(ct.filter(col("level") === 1).count() == 23)
    val parents = ct.filter(col("level") === 1).select("coarse")
      .distinct().collect().map(_.getInt(0)).toSet
    assert(parents.subsetOf((0 until 5).toSet),
      s"fine rows must point at coarse cells, got $parents")
    // with EVERY coarse cell probed the resolved fine submodel is the
    // whole fine model, so the serve must equal the flat in-memory serve
    // bit for bit — the coarse level is pure routing, never scoring
    val inMem = Similarity.ivfTopKWith(
        queries, Similarity.ivfAssignTo(emb, "vec_id", "embedding", model),
        model, "vec_id", "embedding", k = 10, probes = 4)
      .collect().map(_.toSeq).toSet
    val served = IvfIndex.topK(queries, root, "vec_id", "embedding",
      k = 10, probes = 4, coarseProbes = 5).collect().map(_.toSeq).toSet
    assert(served == inMem, "full-coarse-probe serve diverged from flat")
    // the pruned partition read still applies beneath the coarse routing
    val servedNarrow = IvfIndex.topK(queries, root, "vec_id", "embedding",
      k = 10, probes = 4, coarseProbes = 2)
    assert(servedNarrow.count() > 0)
  }

  test("two-level append: increments route to their coarse cell's best fine centroid") {
    val root = java.nio.file.Files.createTempDirectory("graft_ivf_2li").toString
    val base = emb.filter(col("vec_id") % 5 =!= 0)
    val increment = emb.filter(col("vec_id") % 5 === 0)
    IvfIndex.buildAndSave(base, "vec_id", "embedding", root,
      nCells = 20, coarseCells = 4): Unit
    IvfIndex.append(increment, "vec_id", "embedding", root): Unit
    // recompute the two-level assignment law driver-side and compare
    val ct = IvfIndex.centroidTable(spark, root).read()
    val coarse = ct.filter(col("level") === 0)
      .select("cell", "centroid", "cnorm").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray, r.getDouble(2)))
      .sortBy(_._1)
    val fine = ct.filter(col("level") === 1)
      .select("cell", "centroid", "cnorm", "coarse").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray, r.getDouble(2), r.getInt(3)))
    // the routing law considers only POPULATED coarse cells (a childless
    // coarse cell has no fine candidates to offer); ties → lowest cell id
    val populated = fine.map(_._4).toSet
    def bestCoarse(v: Array[Float]): Int = {
      val nv = Similarity.VectorNorms.norm(v)
      coarse.filter(c => populated(c._1))
        .map { case (cell, cv, cn) =>
          (cell, Similarity.VectorNorms.dot(cv, v) / (cn * nv)) }
        .sortBy { case (cell, s) => (-s, cell) }.head._1
    }
    def bestFineIn(v: Array[Float], c: Int): Int = {
      val nv = Similarity.VectorNorms.norm(v)
      fine.filter(_._4 == c)
        .map { case (cell, cv, cn, _) =>
          (cell, Similarity.VectorNorms.dot(cv, v) / (cn * nv)) }
        .sortBy { case (cell, s) => (-s, cell) }.head._1
    }
    val got = IvfIndex.assignmentTable(spark, root).read()
      .select("vec_id", "embedding", "cell").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
      .filter(_._1 % 5 == 0)
    assert(got.nonEmpty)
    got.foreach { case (id, v, cell) =>
      assert(cell == bestFineIn(v, bestCoarse(v)),
        s"vec $id routed to $cell, law says ${bestFineIn(v, bestCoarse(v))}")
    }
  }

  test("two-level recall: clustered corpus serves near-exact through coarse routing") {
    import spark.implicits._
    val dim = 16
    def gaussians(seed: Long, n: Int): Array[Float] = {
      val r = new scala.util.Random(seed)
      Array.fill(n)(r.nextGaussian().toFloat)
    }
    def unit(seed: Long): Array[Float] = {
      val v = gaussians(seed, dim)
      val n = math.sqrt(v.map(x => x * x.toDouble).sum).toFloat
      v.map(_ / n)
    }
    val centers = (0 until 20).map(c => unit(1000L + c))
    val rows = (0L until 1000L).map { i =>
      val noise = gaussians(2000L + i, dim)
      val v = centers((i % 20).toInt).zip(noise)
        .map { case (a, b) => a + 0.15f * b }
      (i, v)
    }
    val corpus = rows.toDF("vec_id", "embedding")
    val qs = corpus.filter(col("vec_id") < 20)
    val root = java.nio.file.Files.createTempDirectory("graft_ivf_2lr").toString
    IvfIndex.buildAndSave(corpus, "vec_id", "embedding", root,
      nCells = 32, refineIters = 2, coarseCells = 6): Unit
    val exact = Similarity.bruteForceTopK(qs, corpus, "vec_id", "embedding",
      k = 10)
    // fixed-width probing (autoWiden off): the documented recall trade
    val r3 = Similarity.recallAtK(exact,
      IvfIndex.topK(qs, root, "vec_id", "embedding", k = 10, probes = 4,
        coarseProbes = 3, autoWiden = false))
    val r6 = Similarity.recallAtK(exact,
      IvfIndex.topK(qs, root, "vec_id", "embedding", k = 10, probes = 4,
        coarseProbes = 6, autoWiden = false))
    assert(r3 >= 0.7, s"two-level recall@10 (3/6 coarse probes) = $r3")
    assert(r6 >= r3, s"recall must be monotone in coarse probes: $r6 < $r3")
    // the default autoWiden serve recovers flat-class recall: widening
    // stops only when the probed-fine-cell set is stable, so a narrow
    // seed must not cost candidates the wider view would scan
    val rAuto = Similarity.recallAtK(exact,
      IvfIndex.topK(qs, root, "vec_id", "embedding", k = 10, probes = 4,
        coarseProbes = 1))
    assert(rAuto >= 0.85, s"auto-widened two-level recall@10 = $rAuto")
    assert(rAuto >= r3, s"auto-widen regressed below its fixed seed: $rAuto < $r3")
  }

  test("two-level append assigns EVERY input row — duplicate ids included") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_ivf_2ld").toString
    IvfIndex.buildAndSave(emb, "vec_id", "embedding", root,
      nCells = 20, coarseCells = 4): Unit
    // an increment where the SAME id appears twice with different vectors
    // (a re-ingest / CDC replay shape): the flat path assigns both rows,
    // so the two-level path must too — the r7 form collapsed them through
    // a window partitioned by id
    val dup = emb.filter(col("vec_id") < 3)
      .unionAll(emb.filter(col("vec_id") < 3)
        .withColumn("embedding",
          org.apache.spark.sql.functions.transform(col("embedding"),
            x => x * lit(-1.0f))))
    val before = IvfIndex.assignmentTable(spark, root).read().count()
    IvfIndex.append(dup, "vec_id", "embedding", root): Unit
    val after = IvfIndex.assignmentTable(spark, root).read().count()
    assert(after - before == 6,
      s"expected all 6 increment rows appended, got ${after - before}")
  }

  test("rows routed near a childless coarse cell are still assigned") {
    import spark.implicits._
    // hand-built two-level model: fine centroids live near e1 and e2;
    // coarse centroids are e1, e2 and e3 — no fine centroid is nearest
    // to e3, so coarse cell 2 is childless after saveTwoLevel
    def axis(i: Int): Array[Float] = {
      val v = Array.fill(4)(0f); v(i) = 1f; v
    }
    def withNorm(cell: Int, v: Array[Float]): (Int, Array[Float], Double) =
      (cell, v, Similarity.VectorNorms.norm(v))
    val fine = Array(
      withNorm(0, Array(1f, 0.1f, 0f, 0f)),
      withNorm(1, Array(1f, -0.1f, 0f, 0f)),
      withNorm(2, Array(0.1f, 1f, 0f, 0f)),
      withNorm(3, Array(-0.1f, 1f, 0f, 0f)))
    val coarse = Array(withNorm(0, axis(0)), withNorm(1, axis(1)),
      withNorm(2, axis(2)))
    val root = java.nio.file.Files.createTempDirectory("graft_ivf_2lc").toString
    IvfIndex.saveTwoLevel(spark, root, fine, coarse)
    val ct = IvfIndex.centroidTable(spark, root).read()
    val parents = ct.filter(col("level") === 1).select("coarse")
      .distinct().collect().map(_.getInt(0)).toSet
    assert(parents == Set(0, 1), s"fixture must leave coarse 2 childless: $parents")
    // seed an empty assignment table + pin so append can run
    IvfIndex.assignmentTable(spark, root).overwrite(
      Seq.empty[(Long, Array[Float], Int)].toDF("vec_id", "embedding", "cell"),
      partitionBy = Seq("cell")): Unit
    // publish the pin via a no-op append of zero rows? No — write directly
    // through a real append whose increment INCLUDES the near-e3 vector:
    // its global-nearest coarse cell is the childless 2, and the r7 form
    // dropped it via the inner fine join
    val inc = Seq(
      (100L, Array(0f, 0f, 1f, 0.05f)), // near e3 → childless coarse 2
      (101L, Array(1f, 0.2f, 0f, 0f))   // near e1 → coarse 0
    ).toDF("vec_id", "embedding")
    IvfIndex.append(inc, "vec_id", "embedding", root): Unit
    val got = IvfIndex.assignmentTable(spark, root).read()
      .select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(got.keySet == Set(100L, 101L),
      s"both rows must be assigned, got ${got.keySet}")
    // near-e3 routes to the nearest POPULATED coarse cell; either is a
    // legitimate nearest-non-empty outcome, but it must land in a real
    // fine cell of that coarse parent
    val fineParents = ct.filter(col("level") === 1)
      .select("cell", "coarse").collect()
      .map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(fineParents.contains(got(100L)),
      s"row 100 landed in unknown fine cell ${got(100L)}")
  }

  test("recall@k: full-probe IVF is exact; default probes clear a floor") {
    val exact = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding",
      k = 10)
    val model = Similarity.ivfModel(emb, "vec_id", "embedding",
      IvfIndex.sqrtCells(500))
    val assigned = Similarity.ivfAssignTo(emb, "vec_id", "embedding", model)
    // probes == nCells → every cell scanned → IVF degenerates to exact
    val fullProbe = Similarity.ivfTopKWith(queries, assigned, model,
      "vec_id", "embedding", k = 10, probes = model.length)
    assert(Similarity.recallAtK(exact, fullProbe) == 1.0,
      "full-probe IVF must reproduce the exact top-k")
    // the real trade-off point: 4/23 cells scanned. Uniform-random
    // embeddings are IVF's adversarial case (no cluster structure for
    // the cells to exploit: true neighbors are near-orthogonal and
    // scatter across cells), so the absolute number is modest — measured
    // 0.31 on this deterministic corpus. Pin a floor under it, plus the
    // law that buying more probes never costs recall.
    val r4 = Similarity.recallAtK(exact,
      Similarity.ivfTopKWith(queries, assigned, model,
        "vec_id", "embedding", k = 10, probes = 4))
    val r12 = Similarity.recallAtK(exact,
      Similarity.ivfTopKWith(queries, assigned, model,
        "vec_id", "embedding", k = 10, probes = 12))
    assert(r4 >= 0.25, s"recall@10 with 4/23 probes fell to $r4")
    assert(r12 >= r4, s"recall must be monotone in probes: $r12 < $r4")
  }

  test("clusterable corpus: IVF probes recover near-exact top-k") {
    // Real embedding corpora are clustered, and that structure is the
    // whole reason IVF works: a query's true neighbors share its
    // cluster, the cluster maps to few cells, probes cover them.
    // Deterministic planted-cluster corpus: 20 unit centers, 50 points
    // each at noise sigma 0.15 — the complement of the uniform-random
    // adversarial floor above.
    import spark.implicits._
    val dim = 16
    def gaussians(seed: Long, n: Int): Array[Float] = {
      val r = new scala.util.Random(seed)
      Array.fill(n)(r.nextGaussian().toFloat)
    }
    def unit(seed: Long): Array[Float] = {
      val v = gaussians(seed, dim)
      val n = math.sqrt(v.map(x => x * x.toDouble).sum).toFloat
      v.map(_ / n)
    }
    val centers = (0 until 20).map(c => unit(1000L + c))
    val rows = (0L until 1000L).map { i =>
      val noise = gaussians(2000L + i, dim)
      val v = centers((i % 20).toInt).zip(noise)
        .map { case (a, b) => a + 0.15f * b }
      (i, v)
    }
    val corpus = rows.toDF("vec_id", "embedding")
    val qs = corpus.filter(col("vec_id") < 20) // one query per cluster
    val exact = Similarity.bruteForceTopK(qs, corpus, "vec_id", "embedding",
      k = 10)
    val model = Similarity.ivfModel(corpus, "vec_id", "embedding",
      IvfIndex.sqrtCells(1000), refineIters = 2)
    val assigned = Similarity.ivfAssignTo(corpus, "vec_id", "embedding", model)
    val r = Similarity.recallAtK(exact,
      Similarity.ivfTopKWith(qs, assigned, model, "vec_id", "embedding",
        k = 10, probes = 4))
    assert(r >= 0.85, s"clustered-corpus recall@10 with 4/32 probes = $r")
  }

  test("serve-path model memo: same pin version reuses, a new version rebuilds") {
    // the memo keys on (root, kind, version): within one pinned version
    // the query-independent model collect runs once across serve calls
    // (the concurrency-contention fix); a rebuild publishes a new version
    // with its own entry — an entry is immutable for its version, so a
    // wrong-version model can never serve, and old versions age out of
    // the bounded LRU instead of fighting the current one
    val root = java.nio.file.Files.createTempDirectory("ivf_memo").toString
    var builds = 0
    def mk(tag: Int): IvfIndex.Model = {
      builds += 1
      Array((tag, Array(1.0f), 1.0))
    }
    val a = IvfIndex.memoModel(spark, root, "coarse", 3L)(mk(1))
    val b = IvfIndex.memoModel(spark, root, "coarse", 3L)(mk(2))
    assert(builds == 1 && (a eq b), "same version must reuse the instance")
    val c = IvfIndex.memoModel(spark, root, "coarse", 4L)(mk(3))
    assert(builds == 2 && c.head._1 == 3, "a new pin version must rebuild")
    // kinds and roots are independent namespaces
    IvfIndex.memoModel(spark, root, "flat", 4L)(mk(4)): Unit
    assert(builds == 3)
    assert(IvfIndex.memoModel(spark, root, "coarse", 4L)(mk(5)) eq c)
    // r11: versions coexist — a time-travel serve against the OLD pin
    // must not evict the current version (and vice versa); each version
    // holds its own immutable entry, so alternating clients never
    // rebuild per batch
    val old = IvfIndex.memoModel(spark, root, "coarse", 3L)(mk(6))
    assert(builds == 3 && (old eq a),
      "the old pinned version stays served from its own entry")
    assert(IvfIndex.memoModel(spark, root, "coarse", 4L)(mk(7)) eq c,
      "serving the old version must not evict the current one")
    assert(IvfIndex.memoModel(spark, root, "coarse", 3L)(mk(8)) eq old,
      "alternating versions must both stay cached")
    assert(builds == 3)
  }
}

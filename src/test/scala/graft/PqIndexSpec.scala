package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.llm.{IvfIndex, PqIndex, Similarity}

/** Pins the IVF-PQ layer: PQ must be a pure shortlist mechanism (exact
  * rescore ⇒ with a wide-enough shortlist it EQUALS the full-vector
  * serve bit-for-bit), the codec must round-trip its persistence, the
  * recall trade must be measured on clustered corpora (not asserted),
  * and stale codes (index moved past the PQ pin) must refuse rather
  * than silently under-serve. */
class PqIndexSpec extends AnyFunSuite {
  import TestSpark._

  private val sf01 = "/root/testdata/sf0.01"
  private def emb = Tables.embeddings(spark, sf01)
  private def queries = emb.filter(col("vec_id") < 10)

  test("codec round-trips persistence and encodes deterministically") {
    val root = java.nio.file.Files.createTempDirectory("graft_pq").toString
    val codec = PqIndex.train(emb, "vec_id", "embedding", m = 8, k = 32,
      sampleN = 200, iters = 3)
    assert(codec.dim == 64 && codec.m == 8 && codec.sub == 8)
    val v = PqIndex.saveCodec(spark, root, codec)
    val back = PqIndex.loadCodecAt(spark, root, v)
    assert(back.dim == codec.dim && back.m == codec.m)
    (0 until codec.m).foreach { i =>
      assert(back.codebooks(i).length == codec.codebooks(i).length)
      codec.codebooks(i).zip(back.codebooks(i)).foreach { case (a, b) =>
        assert(java.util.Arrays.equals(a, b), s"codebook $i drifted")
      }
    }
    // deterministic encode: same vector, same codes, twice
    val sample = emb.select(col("embedding")).head.getSeq[Float](0).toArray
    assert(java.util.Arrays.equals(codec.encode(sample), codec.encode(sample)))
  }

  test("wide shortlist: PQ serve equals the full-vector serve exactly") {
    // refine wide enough to shortlist every probed candidate ⇒ stage 2
    // rescores the same candidate set the full-vector serve scores, and
    // the exact rescore makes the results identical — PQ only chooses
    // WHO gets exact treatment, never what a score is worth.
    val root = java.nio.file.Files.createTempDirectory("graft_pq").toString
    IvfIndex.buildAndSave(emb, "vec_id", "embedding", root)
    val codec = PqIndex.train(emb, "vec_id", "embedding", m = 8, k = 32,
      sampleN = 200, iters = 3)
    PqIndex.buildCodes(spark, root, "vec_id", "embedding", codec)
    val full = IvfIndex.topK(queries, root, "vec_id", "embedding",
        k = 10, probes = 4)
      .collect().map(_.toSeq).toSet
    val pq = PqIndex.topK(queries, root, "vec_id", "embedding",
        k = 10, probes = 4, refine = 1000)
      .collect().map(_.toSeq).toSet
    assert(pq == full,
      "wide-shortlist PQ serve must equal the full-vector serve bit-for-bit")
  }

  test("filtered ADC serve equals the filtered full-vector serve exactly") {
    // the r11-verdict gap: q82/topKFiltered served full vectors only.
    // Same law as the wide-shortlist pin, under a metadata predicate:
    // with refine covering the probed population, filtered-PQ top-k must
    // be BIT-EQUAL to IvfIndex.topKFiltered on the same predicate — the
    // semi join lands before the ADC loop, so the shortlist is a true
    // top of the filtered corpus, never a post-top-k filter.
    val root = java.nio.file.Files.createTempDirectory("graft_pqf").toString
    IvfIndex.buildAndSave(emb, "vec_id", "embedding", root)
    val codec = PqIndex.train(emb, "vec_id", "embedding", m = 8, k = 32,
      sampleN = 200, iters = 3)
    PqIndex.buildCodes(spark, root, "vec_id", "embedding", codec)
    val meta = emb.select(col("vec_id"), col("label"))
    val pred = pmod(col("label"), lit(2)) === 0
    val full = IvfIndex.topKFiltered(queries, root, "vec_id", "embedding",
        k = 10, meta = meta, where = pred, probes = 4)
      .collect().map(_.toSeq).toSet
    val pq = PqIndex.topKFiltered(queries, root, "vec_id", "embedding",
        k = 10, meta = meta, where = pred, probes = 4, refine = 1000)
      .collect().map(_.toSeq).toSet
    assert(pq == full,
      "filtered wide-shortlist PQ must equal the filtered full-vector serve")
    // the predicate actually bit: no excluded neighbor is ever served
    val evenIds = emb.filter(pred).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    val served = pq.map(_(2).asInstanceOf[Long])
    assert(served.nonEmpty && served.subsetOf(evenIds))
  }

  test("clustered corpus: production-width PQ recall clears the floor") {
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
    val root = java.nio.file.Files.createTempDirectory("graft_pq").toString
    IvfIndex.buildAndSave(corpus, "vec_id", "embedding", root,
      refineIters = 2)
    val codec = PqIndex.train(corpus, "vec_id", "embedding", m = 4, k = 32,
      sampleN = 1000, iters = 5)
    PqIndex.buildCodes(spark, root, "vec_id", "embedding", codec)
    val exact = Similarity.bruteForceTopK(qs, corpus, "vec_id", "embedding",
      k = 10)
    val r4 = Similarity.recallAtK(exact,
      PqIndex.topK(qs, root, "vec_id", "embedding", k = 10, probes = 4,
        refine = 4))
    assert(r4 >= 0.85, s"clustered PQ recall@10 (probes=4, refine=4) = $r4")
    // the shortlist law: more refine can only widen the candidate set
    // stage 2 rescored, so recall is monotone in refine
    val r8 = Similarity.recallAtK(exact,
      PqIndex.topK(qs, root, "vec_id", "embedding", k = 10, probes = 4,
        refine = 8))
    assert(r8 >= r4, s"recall must be monotone in refine: $r8 < $r4")
  }

  test("appendCodes: incremental codes serve identically to a re-encode") {
    val root = java.nio.file.Files.createTempDirectory("graft_pq").toString
    IvfIndex.buildAndSave(emb, "vec_id", "embedding", root)
    val codec = PqIndex.train(emb, "vec_id", "embedding", m = 8, k = 32,
      sampleN = 200, iters = 2)
    PqIndex.buildCodes(spark, root, "vec_id", "embedding", codec)
    // an increment of NEW ids appends to the index, then appendCodes
    // patches the codes from the assignment CDC — O(churn), the
    // standing corpus is never re-encoded
    val inc = emb.filter(col("vec_id") < 30)
      .select((col("vec_id") + 10000L).as("vec_id"), col("embedding"))
    IvfIndex.append(inc, "vec_id", "embedding", root): Unit
    PqIndex.appendCodes(spark, root, "vec_id", "embedding"): Unit
    def serve() = PqIndex.topK(queries, root, "vec_id", "embedding",
        k = 10, probes = 4, refine = 4)
      .collect().map(_.toSeq).toSet
    val incremental = serve()
    // …and must serve exactly what a full re-encode at the same pin does
    PqIndex.buildCodes(spark, root, "vec_id", "embedding", codec)
    assert(serve() == incremental,
      "incrementally-maintained codes must serve identically to a rebuild")
    // idempotent when nothing moved
    PqIndex.appendCodes(spark, root, "vec_id", "embedding"): Unit
    assert(serve() == incremental)
    // duplicate-id appends are legal (the inverted file keeps every
    // row); the PQ serve must collapse them to ONE rank per neighbor
    // exactly like the full-vector serve, or the duplicate occupies
    // several ranks and pushes true neighbors out
    IvfIndex.append(emb.filter(col("vec_id") < 30), "vec_id", "embedding",
      root): Unit
    PqIndex.appendCodes(spark, root, "vec_id", "embedding"): Unit
    val wide = PqIndex.topK(queries, root, "vec_id", "embedding",
        k = 10, probes = 4, refine = 1000)
      .collect().map(_.toSeq).toSet
    val full = IvfIndex.topK(queries, root, "vec_id", "embedding",
        k = 10, probes = 4)
      .collect().map(_.toSeq).toSet
    assert(wide == full,
      "duplicate-id rows must collapse to one rank, equal to the " +
        "full-vector serve")
    // a REBUILD (new centroid version) invalidates incremental patching
    IvfIndex.buildAndSave(emb, "vec_id", "embedding", root)
    val e = intercept[IllegalArgumentException] {
      PqIndex.appendCodes(spark, root, "vec_id", "embedding")
    }
    assert(e.getMessage.contains("buildCodes"),
      s"rebuild refusal must name the heal: ${e.getMessage}")
  }

  test("two-level index: ADC serve equals the full-vector serve wide") {
    // PQ routing reuses resolveServe, so the coarse quantizer + auto
    // widening must compose with ADC untouched: wide-shortlist PQ over
    // a LEVEL-TAGGED index equals the full-vector two-level serve.
    val root = java.nio.file.Files.createTempDirectory("graft_pq2l").toString
    IvfIndex.buildAndSave(emb, "vec_id", "embedding", root,
      nCells = 23, coarseCells = 5)
    val codec = PqIndex.train(emb, "vec_id", "embedding", m = 8, k = 32,
      sampleN = 200, iters = 2)
    PqIndex.buildCodes(spark, root, "vec_id", "embedding", codec)
    val full = IvfIndex.topK(queries, root, "vec_id", "embedding",
        k = 10, probes = 4, coarseProbes = 2)
      .collect().map(_.toSeq).toSet
    val pq = PqIndex.topK(queries, root, "vec_id", "embedding",
        k = 10, probes = 4, refine = 1000, coarseProbes = 2)
      .collect().map(_.toSeq).toSet
    assert(pq == full,
      "two-level ADC serve must equal the two-level full-vector serve")
  }

  test("stale codes refuse: an index rebuild past the PQ pin is loud") {
    val root = java.nio.file.Files.createTempDirectory("graft_pq").toString
    IvfIndex.buildAndSave(emb, "vec_id", "embedding", root)
    val codec = PqIndex.train(emb, "vec_id", "embedding", m = 8, k = 32,
      sampleN = 200, iters = 1)
    PqIndex.buildCodes(spark, root, "vec_id", "embedding", codec)
    // the serve works at the matching pin…
    assert(PqIndex.topK(queries, root, "vec_id", "embedding", k = 5,
      probes = 4).count() > 0)
    // …then the index moves (an append re-pins assignments) and the
    // stale codes must refuse rather than silently drop the new rows
    IvfIndex.append(emb.filter(col("vec_id") >= 490), "vec_id", "embedding",
      root): Unit
    val e = intercept[IllegalArgumentException] {
      PqIndex.topK(queries, root, "vec_id", "embedding", k = 5, probes = 4)
    }
    assert(e.getMessage.contains("buildCodes"),
      s"stale-pin refusal must name the fix: ${e.getMessage}")
    // rebuilding the codes heals the serve
    PqIndex.buildCodes(spark, root, "vec_id", "embedding", codec)
    assert(PqIndex.topK(queries, root, "vec_id", "embedding", k = 5,
      probes = 4).count() > 0)
  }
}

package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}
import graft.operators.DedupLatest

/** Corpus deduplication: exact, MinHash+LSH, SimHash, n-gram Jaccard.
  *
  * Scale shape (100 TB): every path is (map to compact key) → (shuffle on
  * that key) → (work within buckets). Nothing here ever compares all pairs:
  * exact dedup shuffles 16-byte digests; MinHash shuffles (band, bandHash)
  * with bounded fanout; candidate verification runs only inside buckets.
  */
object ExactDedup {
  /** One row per distinct content hash: survivor id (min) + multiplicity.
    * Map-side partial aggregation halves the shuffle before it happens. */
  def summary(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copias"))

  /** Full surviving rows (smallest id per identical content). */
  def dropExact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    DedupLatest.latest(df.withColumn("__h", md5(col(textCol))),
      Seq("__h"), Seq(col(idCol).asc)).drop("__h")
}

/** Word-k-gram shingling shared by the near-dup families. Pure array
  * expressions (split / sequence / transform / slice) — codegen'd, no UDF. */
object Shingles {
  def words(text: Column): Column = split(trim(text), "\\s+")

  /** Distinct k-word shingles of `text`. */
  def shingles(text: Column, k: Int): Column = {
    val ws = words(text)
    array_distinct(transform(
      sequence(lit(0), greatest(size(ws) - k, lit(0))),
      i => array_join(slice(ws, i + 1, lit(k)), " ")))
  }

  /** 64-bit hashes of the shingle set (xxhash64, fixed seed). */
  def shingleHashes(text: Column, k: Int): Column =
    transform(shingles(text, k), s => xxhash64(s))
}

/** MinHash signatures + banded LSH candidate generation.
  * reference capability extension (SURVEY §2 row 19); standard
  * shingle→minhash→band→bucket-join construction. */
object MinHashLSH {
  /** numHashes minhash values; hash family h_i(x) = xxhash64(i, x). */
  def signature(text: Column, k: Int = 5, numHashes: Int = 64): Column = {
    val hs = Shingles.shingles(text, k)
    array((0 until numHashes).map { i =>
      array_min(transform(hs, s => xxhash64(lit(i), s)))
    }: _*)
  }

  /** Explode the signature into (band_idx, band_hash) rows.
    * rowsPerBand consecutive minhashes are hashed together per band. */
  def bands(df: DataFrame, sigCol: String, numBands: Int, rowsPerBand: Int): DataFrame = {
    val bandIdx = explode(sequence(lit(0), lit(numBands - 1)))
    df.withColumn("band_idx", bandIdx)
      .withColumn("band_hash",
        xxhash64(col("band_idx"),
          array_join(transform(
            slice(col(sigCol), col("band_idx") * rowsPerBand + 1, lit(rowsPerBand)),
            _.cast("string")), ",")))
  }

  /** Candidate pairs: ids sharing at least one band bucket. The self-join
    * shuffles on (band_idx, band_hash) — bounded buckets, never all-pairs. */
  def candidatePairs(banded: DataFrame, idCol: String): DataFrame = {
    val a = banded.select(col("band_idx"), col("band_hash"), col(idCol).as("id_a"))
    val b = banded.select(col("band_idx"), col("band_hash"), col(idCol).as("id_b"))
    a.join(b, Seq("band_idx", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }
}

/** 64-bit SimHash over word unigrams + banded hamming candidates. */
object SimHash {
  /** Classic bit-vote simhash: bit j of the fingerprint is 1 iff more word
    * hashes have bit j set than not. Expressed as 64 array-aggregates —
    * all codegen'd; one pass over each document's word array. */
  def simhash64(text: Column): Column = {
    val hs = transform(Shingles.words(text), w => xxhash64(w))
    val n = size(hs)
    val bits = (0 until 64).map { j =>
      val votes = aggregate(hs, lit(0L),
        (acc, h) => acc + shiftright(h, j).bitwiseAND(lit(1L)))
      when(votes * 2 > n.cast(LongType), lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a + b)
  }

  /** Split the 64-bit fingerprint into `numBands` bit-bands; near-dups
    * (hamming distance <= numBands - equal bands needed) collide in >=1. */
  def bandColumns(fp: Column, numBands: Int = 4): Seq[Column] = {
    val width = 64 / numBands
    (0 until numBands).map { b =>
      shiftrightunsigned(fp, b * width)
        .bitwiseAND(lit((1L << width) - 1)).as(s"band_$b")
    }
  }

  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}

/** Exact n-gram Jaccard similarity (the verification stage after LSH). */
object NgramJaccard {
  def jaccard(shinglesA: Column, shinglesB: Column): Column = {
    val inter = size(array_intersect(shinglesA, shinglesB)).cast(DoubleType)
    val union = size(array_union(shinglesA, shinglesB))
    when(union === 0, lit(0.0)).otherwise(inter / union)
  }
}

package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType
import org.apache.spark.sql.expressions.Window
import graft.core.Tables
import graft.llm.Shingles

/** Corpus-curation wave 2 (round 3): the mixture/layout ops a pretraining
  * build runs AFTER dedup and quality gating — corpus-common-boilerplate
  * scoring, temperature-based language rebalancing, and the deterministic
  * global shuffle that turns a curated corpus into training shards.
  *
  * Everything here is oracle-checked (DuckDB) through the portable md5
  * hash family the q36/q46/q49 wave established. */
object CurationQueries {

  // ---------------------------------------------------------------- q56
  /** Corpus-common-boilerplate scoring: for each document, the fraction of
    * its distinct word-3-grams that are "common" in the corpus (appear in
    * >= 3 documents) — the within-corpus twin of q34's benchmark
    * decontamination, and the signal C4-style pipelines use to strip
    * boilerplate that repeats across many pages.
    *
    * Scale shape (100 TB): grams shuffle as 8-byte xxhash64 keys, never as
    * strings; document frequency is one hash aggregation; the gram→df join
    * is keyed on the same 8-byte hash so AQE can pick broadcast vs shuffle
    * by the real size of the common-gram set. Two exchanges total on the
    * gram stream (df agg reuses the join's partitioning) + one on doc_id.
    * As in q34, hash collisions could only merge two distinct grams'
    * df counts (~n²/2^65) — zero on this corpus, oracle-verified. */
  def q56Boilerplate(spark: SparkSession, dir: String,
                     minDf: Int = 3): DataFrame = {
    val d = Tables.documents(spark, dir)
    // shingles() is distinct-per-document, so (doc_id, gh) needs no dedup
    val grams = d
      .select(col("doc_id"), explode(Shingles.shingles(col("text"), 3)).as("g"))
      .select(col("doc_id"), xxhash64(col("g")).as("gh"))
    val gramDf = grams.groupBy(col("gh"))
      .agg(count(lit(1)).as("df"))
    grams.join(gramDf, Seq("gh"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast(IntegerType).as("n_grams"),
        sum(when(col("df") >= minDf, 1L).otherwise(0L))
          .cast(IntegerType).as("n_comunes"))
      .withColumn("frac_comun",
        col("n_comunes").cast("double") / col("n_grams"))
  }

  val q56Sql: String =
    """WITH g AS (
      |  SELECT doc_id, unnest(list_distinct(list_transform(
      |    range(1, greatest(len(regexp_split_to_array(trim(text), '\s+')) - 3, 0) + 2),
      |    i -> array_to_string(regexp_split_to_array(trim(text), '\s+')[i:i+2], ' ')))) AS g
      |  FROM documents),
      |df AS (
      |  SELECT g, count(*) AS df FROM g GROUP BY g)
      |SELECT g.doc_id,
      |  CAST(count(*) AS INTEGER) AS n_grams,
      |  CAST(sum(CASE WHEN df.df >= 3 THEN 1 ELSE 0 END) AS INTEGER) AS n_comunes,
      |  CAST(sum(CASE WHEN df.df >= 3 THEN 1 ELSE 0 END) AS DOUBLE)
      |    / count(*) AS frac_comun
      |FROM g JOIN df USING (g)
      |GROUP BY g.doc_id""".stripMargin

  // ---------------------------------------------------------------- q57
  /** Temperature-based language rebalancing: per language, keep
    * ceil(3·sqrt(n_lang)) documents chosen in deterministic md5 order —
    * the alpha=0.5 sampling step multilingual pretraining mixes with so
    * high-resource languages stop drowning low-resource ones (quota grows
    * sublinearly with corpus share).
    *
    * sqrt is IEEE-exact in both engines (unlike pow(x, alpha) for general
    * alpha, which is libm-dependent — the reason the catalog form pins
    * alpha to 0.5), so quota and membership are bit-reproducible.
    *
    * Scale shape: the catalog form runs on operators/StratifiedQuota —
    * languages are few and huge, so a single PARTITION BY lang window
    * would rank each whole language on one reducer; the two-level split
    * (histogram over 256 md5-prefix buckets → exact rank within
    * (lang, bucket) + bucket offset) spreads every language over 256
    * reducers and stays bit-identical to the window form
    * (StratifiedQuotaSpec pins the equality). */
  def q57TemperatureMix(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val h = md5(col("doc_id").cast("string"))
    graft.operators.StratifiedQuota.select(
        d.select(col("doc_id"), col("lang")),
        group = Seq("lang"), priority = h, bucket = substring(h, 1, 2),
        tiebreaks = Seq(col("doc_id")),
        quotaOf = n => ceil(sqrt(n) * 3).cast(IntegerType),
        nCol = "n_lang")
      .select(col("doc_id"), col("lang"),
        col("n_lang").cast(IntegerType).as("n_lang"),
        col("rango"), col("cuota"))
  }

  /** Single-window reference form of q57 — the spec pin for the two-level
    * StratifiedQuota rewrite (bit-identical output, one reducer per lang). */
  def q57WindowForm(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val wRank = Window.partitionBy(col("lang"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    val wAll = Window.partitionBy(col("lang"))
    d.select(col("doc_id"), col("lang"))
      .withColumn("n_lang", count(lit(1)).over(wAll).cast(IntegerType))
      .withColumn("rango", row_number().over(wRank).cast(IntegerType))
      .withColumn("cuota", ceil(sqrt(col("n_lang")) * 3).cast(IntegerType))
      .filter(col("rango") <= col("cuota"))
  }

  val q57Sql: String =
    """WITH r AS (
      |  SELECT doc_id, lang,
      |    CAST(count(*) OVER (PARTITION BY lang) AS INTEGER) AS n_lang,
      |    CAST(row_number() OVER (PARTITION BY lang
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INTEGER) AS rango
      |  FROM documents)
      |SELECT doc_id, lang, n_lang, rango,
      |  CAST(ceil(sqrt(n_lang) * 3) AS INTEGER) AS cuota
      |FROM r WHERE rango <= CAST(ceil(sqrt(n_lang) * 3) AS INTEGER)""".stripMargin

  // ---------------------------------------------------------------- q58
  /** Deterministic global shuffle → training shards: every document lands
    * in one of 256 shards (two md5 hex nibbles) with a dense intra-shard
    * ordinal in md5 order — the reproducible corpus layout a training run
    * reads sequentially (shard files, shuffled order, no seed state).
    * Membership AND position are pure functions of doc_id, so any engine
    * can recompute a shard independently.
    *
    * Scale shape: one shuffle keyed on the 256 shard prefixes, position
    * from a window on that same partitioning; md5 is uniform so shards
    * stay balanced at any corpus size (widen the prefix for more). */
  def q58ShuffleShard(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val wPos = Window.partitionBy(col("shard"))
      .orderBy(col("h"), col("doc_id"))
    d.select(col("doc_id"), col("source"),
        md5(col("doc_id").cast("string")).as("h"))
      .withColumn("shard", substring(col("h"), 1, 2))
      .withColumn("pos", row_number().over(wPos).cast(IntegerType))
      .drop("h")
  }

  val q58Sql: String =
    """WITH h AS (
      |  SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS h
      |  FROM documents)
      |SELECT doc_id, source, substr(h, 1, 2) AS shard,
      |  CAST(row_number() OVER (PARTITION BY substr(h, 1, 2)
      |    ORDER BY h, doc_id) AS INTEGER) AS pos
      |FROM h""".stripMargin

  // ---------------------------------------------------------------- q61
  /** Per-source corpus health report — the monitoring rollup a curation
    * platform publishes after every ingest: volumes, token mass, quality
    * and duplication posture, language breadth. Every metric is count /
    * integer-sum / threshold-count arithmetic (no floating-point
    * accumulation), so the report is bit-reproducible across engines;
    * the only doubles are single divisions at the end.
    *
    * Scale shape: one exact-dup pre-aggregation on (16-byte content hash)
    * and one rollup on source — both map-side combined; nothing is
    * quadratic and no string ever shuffles (the md5 digest does). */
  def q61CorpusReport(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    // documents whose content hash repeats anywhere in the corpus
    val dupDocs = d.select(col("doc_id"), md5(col("text")).as("__h"))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col("__h"))))
      .filter(col("__n") > 1).select(col("doc_id"))
    val calidad = graft.llm.TextAnalysis.qualityScore(col("text"))
    d.select(col("doc_id"), col("source"), col("lang"),
        size(graft.llm.Shingles.words(col("text"))).cast("long").as("__tokens"),
        calidad.as("__calidad"))
      .join(dupDocs.withColumn("__dup", lit(1L)), Seq("doc_id"), "left")
      .na.fill(0L, Seq("__dup"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__tokens")).as("tokens_total"),
        sum(when(col("__calidad") >= 0.5, 1L).otherwise(0L)).as("n_alta_calidad"),
        sum(col("__dup")).as("n_dups"),
        countDistinct(col("lang")).as("n_langs"))
      .withColumn("tokens_prom",
        col("tokens_total").cast("double") / col("n_docs"))
  }

  val q61Sql: String =
    """WITH m AS (
      |  SELECT doc_id, source, lang,
      |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS tokens,
      |    CAST(len(regexp_extract_all(text,
      |      '\b(the|a|an|and|or|of|to|in|is|on|for)\b')) AS DOUBLE)
      |      / len(regexp_split_to_array(trim(text), '\s+')) * 0.5
      |      + (1.0 - CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE)
      |               / length(text)) * 0.3
      |      + least(CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE)
      |              / 200.0, 1.0) * 0.2 AS calidad,
      |    CASE WHEN count(*) OVER (PARTITION BY md5(text)) > 1
      |      THEN 1 ELSE 0 END AS dup
      |  FROM documents)
      |SELECT source,
      |  count(*) AS n_docs,
      |  CAST(sum(tokens) AS BIGINT) AS tokens_total,
      |  CAST(sum(CASE WHEN calidad >= 0.5 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_alta_calidad,
      |  CAST(sum(dup) AS BIGINT) AS n_dups,
      |  count(DISTINCT lang) AS n_langs,
      |  CAST(sum(tokens) AS DOUBLE) / count(*) AS tokens_prom
      |FROM m GROUP BY source""".stripMargin

  // ---------------------------------------------------------------- q62
  /** Symmetric int8 embedding quantization — the vector-compression step
    * that cuts a 100 TB float32 embedding store 4× for ANN serving:
    * per-vector absolute-max scale, elements mapped to
    * floor(x/scale·127 + 0.5) ∈ [-127, 127]. Every step is IEEE-exact
    * double arithmetic (division, multiply, floor — no libm), so the
    * quantized codes are bit-reproducible across engines; the oracle
    * pins every element through an md5 digest of the code string plus
    * the code sum. Zero-shuffle map stage. */
  def q62Quantize(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val scale = array_max(transform(col("embedding"), x => abs(x)))
      .cast("double")
    val codes = transform(col("embedding"), x =>
      when(col("escala") === 0.0, lit(0L)).otherwise(
        floor(x.cast("double") / col("escala") * lit(127.0) + lit(0.5))
          .cast("long")))
    e.select(col("vec_id"), scale.as("escala"), col("embedding"))
      .withColumn("codes", codes)
      .select(col("vec_id"), col("escala"),
        aggregate(col("codes"), lit(0L), (acc, x) => acc + x).as("suma_q"),
        md5(concat_ws(",", transform(col("codes"), _.cast("string"))))
          .as("md5_q"))
  }

  val q62Sql: String =
    """WITH q AS (
      |  SELECT vec_id,
      |    CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE)
      |      AS escala,
      |    embedding
      |  FROM embeddings),
      |c AS (
      |  SELECT vec_id, escala,
      |    list_transform(embedding, x -> CASE WHEN escala = 0.0 THEN 0
      |      ELSE CAST(floor(CAST(x AS DOUBLE) / escala * 127.0 + 0.5) AS BIGINT)
      |      END) AS codes
      |  FROM q)
      |SELECT vec_id, escala,
      |  CAST(list_sum(codes) AS BIGINT) AS suma_q,
      |  md5(array_to_string(codes, ',')) AS md5_q
      |FROM c""".stripMargin

  // ---------------------------------------------------------------- q64
  /** Collocation (phrase) detection — the word2phrase step tokenizer /
    * phrase-vocabulary builds run over a corpus: count adjacent word
    * pairs, score each by corpus lift
    * `n_total · count(w1 w2) / (count(w1) · count(w2))` (a PMI monotone
    * transform kept rational — one double division, no logs, so the score
    * is bit-portable), keep pairs seen ≥ 5 times, top 50 by
    * (lift, pair). High-lift pairs are the multi-word expressions worth
    * fusing into single tokens.
    *
    * Scale shape: one shuffle for pair counts (map-side combined), word
    * counts ride a second tiny agg joined back by each pair endpoint —
    * both joins AQE-broadcast the aggregated (vocabulary-sized) sides at
    * any corpus size; the final top-50 is a single-reducer sort over the
    * ≥5-count survivors only. */
  def q64Collocations(spark: SparkSession, dir: String,
                      minCount: Long = 5L, topK: Int = 50): DataFrame = {
    val d = Tables.documents(spark, dir)
    val words = d.select(graft.llm.Shingles.words(col("text")).as("ws"))
    // every OCCURRENCE counts (unlike the distinct-per-doc shingle
    // kernel), so pairs are built positionally
    val occ = words.select(posexplode(col("ws")).as(Seq("i", "w1")),
        col("ws"))
      .filter(col("i") < size(col("ws")) - 1)
      .select(col("w1"), element_at(col("ws"), col("i") + 2).as("w2"))
    val pairCounts = occ.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("n_par"))
    val wordCounts = words.select(explode(col("ws")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n_w"))
    // the corpus token total is ONE bounded row — resolve it driver-side
    // (the Similarity.ivfCentroids bounded-build-side pattern) and inject
    // it as a literal; a crossJoin(broadcast(1-row)) would plan a
    // BroadcastNestedLoopJoin and trip the quadratic-join gate
    // sum() over an empty corpus is NULL — degrade to 0 (the result is
    // empty anyway since pairCounts is empty) instead of throwing
    val nTotal = Option(words.agg(sum(size(col("ws")))).head.get(0))
      .fold(0L)(_.asInstanceOf[Long])
    pairCounts.filter(col("n_par") >= minCount)
      .join(wordCounts.select(col("w").as("w1"), col("n_w").as("n_w1")), Seq("w1"))
      .join(wordCounts.select(col("w").as("w2"), col("n_w").as("n_w2")), Seq("w2"))
      .withColumn("lift",
        (lit(nTotal) * col("n_par")).cast("double")
          / (col("n_w1") * col("n_w2")))
      .select(col("w1"), col("w2"), col("n_par"), col("n_w1"), col("n_w2"),
        col("lift"))
      .orderBy(col("lift").desc, col("w1"), col("w2"))
      .limit(topK)
  }

  val q64Sql: String =
    """WITH ws AS (
      |  SELECT regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
      |occ AS (
      |  SELECT ws[i] AS w1, ws[i+1] AS w2
      |  FROM ws, unnest(range(1, len(ws))) AS t(i)),
      |pc AS (SELECT w1, w2, count(*) AS n_par FROM occ GROUP BY w1, w2),
      |wc AS (SELECT w, count(*) AS n_w FROM (
      |  SELECT unnest(ws) AS w FROM ws) GROUP BY w),
      |tot AS (SELECT CAST(sum(len(ws)) AS BIGINT) AS n_total FROM ws)
      |SELECT p.w1, p.w2, p.n_par, a.n_w AS n_w1, b.n_w AS n_w2,
      |  CAST(tot.n_total * p.n_par AS DOUBLE) / (a.n_w * b.n_w) AS lift
      |FROM pc p
      |JOIN wc a ON a.w = p.w1
      |JOIN wc b ON b.w = p.w2
      |CROSS JOIN tot
      |WHERE p.n_par >= 5
      |ORDER BY lift DESC, p.w1, p.w2
      |LIMIT 50""".stripMargin

  // ---------------------------------------------------------------- q67
  /** Per-source TF-IDF distinctive terms: for each source, the 5 words
    * whose frequency is most out of proportion with how many sources use
    * them — the corpus-mix diagnostic (what makes each slice distinctive)
    * run next to q61's volume report. Scoring is kept rational:
    * tf · n_sources / df_sources (one double division, no logs), so the
    * ranking is bit-portable across engines.
    *
    * Scale shape: tf aggregates on (source, word) with map-side combine;
    * source-df is a second aggregation OVER the tf rows (vocabulary-sized,
    * not corpus-sized); the join back is keyed on the word and both sides
    * are vocabulary-sized, so AQE picks broadcast vs shuffle by real size.
    * The source count is ONE driver-resolved scalar (the q64 pattern —
    * never a 1-row crossJoin). Final top-5 is a window over source. */
  def q67TfIdf(spark: SparkSession, dir: String, topK: Int = 5): DataFrame = {
    val d = Tables.documents(spark, dir)
    val nSources = d.agg(countDistinct(col("source"))).head.getLong(0)
    val words = d.select(col("source"),
      explode(Shingles.words(col("text"))).as("palabra"))
    val tf = words.groupBy(col("source"), col("palabra"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("palabra")).agg(count(lit(1)).as("df"))
    val scored = tf.join(df, Seq("palabra"))
      .withColumn("score",
        (col("tf") * lit(nSources)).cast("double") / col("df"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("score").desc, col("palabra").asc)
    scored.withColumn("rango", row_number().over(w))
      .filter(col("rango") <= topK)
      .select(col("source"), col("palabra"), col("tf"), col("df"),
        col("score"), col("rango").cast(IntegerType).as("rango"))
  }

  val q67Sql: String =
    """WITH w AS (
      |  SELECT source, unnest(regexp_split_to_array(trim(text), '\s+')) AS palabra
      |  FROM documents),
      |tf AS (SELECT source, palabra, count(*) AS tf FROM w GROUP BY 1, 2),
      |df AS (SELECT palabra, count(*) AS df FROM tf GROUP BY 1),
      |ns AS (SELECT count(DISTINCT source) AS n FROM documents),
      |scored AS (
      |  SELECT tf.source, tf.palabra, tf.tf, df.df,
      |    CAST(tf.tf * ns.n AS DOUBLE) / df.df AS score
      |  FROM tf JOIN df USING (palabra) CROSS JOIN ns)
      |SELECT source, palabra, tf, df, score, CAST(rango AS INTEGER) AS rango
      |FROM (SELECT *, row_number() OVER (PARTITION BY source
      |        ORDER BY score DESC, palabra ASC) AS rango FROM scored)
      |WHERE rango <= 5""".stripMargin

  // ---------------------------------------------------------------- maps
  // ---------------------------------------------------------------- q81
  /** Deterministic weighted sampling per source (Priority Sampling,
    * Duffield–Lund–Thorup JACM'07 — graft.operators.WeightedSample): the
    * 10 documents per source with the largest priorities w/u, where the
    * weight w is the document length and u is a hash-derived uniform —
    * inclusion probability proportional to length, reproducible across
    * retries/partitionings, and selected by the bounded-state
    * `top_k_double` aggregate so the shuffle carries at most k pairs per
    * (source, partition) instead of the corpus. The priority formula is
    * pure integer arithmetic + two correctly-rounded IEEE double ops, so
    * the DuckDB oracle reproduces it bit-exactly (no pow/ln). */
  def q81WeightedSample(spark: SparkSession, dir: String, k: Int = 10): DataFrame =
    graft.operators.WeightedSample.perGroup(
      Tables.documents(spark, dir), Seq("source"), "doc_id", "n_chars", k)
      .orderBy(col("source"), col("rk"))

  val q81Sql: String =
    """WITH hn AS (
      |  -- (doc_id * 2654435761) mod 2^32 via 16-bit split partial
      |  -- products (each < 2^49) so BIGINT never overflows at any id
      |  SELECT source, doc_id, n_chars,
      |    (((doc_id % 4294967296) % 65536) * 2654435761
      |     + ((doc_id % 4294967296) // 65536) * 2041643008) % 4294967296
      |      + 1 AS num
      |  FROM documents),
      |s AS (
      |  SELECT source, doc_id,
      |    (CAST(n_chars AS DOUBLE) * 4294967296.0) /
      |      CAST(num AS DOUBLE) AS priority
      |  FROM hn),
      |r AS (
      |  SELECT source, doc_id, priority,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY priority DESC, doc_id ASC) AS rn
      |  FROM s)
      |SELECT source, CAST(rn AS INTEGER) AS rk, doc_id, priority
      |FROM r WHERE rn <= 10 ORDER BY source, rk""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q56_boilerplate"     -> ((s, d) => q56Boilerplate(s, d)),
    "q57_temperature_mix" -> (q57TemperatureMix _),
    "q58_shuffle_shard"   -> (q58ShuffleShard _),
    "q61_corpus_report"   -> (q61CorpusReport _),
    "q62_quantize"        -> (q62Quantize _),
    "q64_collocations"    -> ((s, d) => q64Collocations(s, d)),
    "q67_tfidf"           -> ((s, d) => q67TfIdf(s, d)),
    "q81_weighted_sample" -> ((s, d) => q81WeightedSample(s, d)))

  val oracles: Map[String, String] = Map(
    "q56_boilerplate"     -> q56Sql,
    "q57_temperature_mix" -> q57Sql,
    "q58_shuffle_shard"   -> q58Sql,
    "q61_corpus_report"   -> q61Sql,
    "q62_quantize"        -> q62Sql,
    "q64_collocations"    -> q64Sql,
    "q67_tfidf"           -> q67Sql,
    "q81_weighted_sample" -> q81Sql)
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.{Num, Tables}

/** Text-analysis operators for the LLM-training-data pipeline (SURVEY.md
  * §2.11). They generalize the reference's text handling — P8 keyword
  * containment (/root/reference/src/youtube_collector.py:77-78) and the
  * summary histograms (:241-268) — into corpus-level statistics.
  *
  * All are single-shuffle groupBy programs with map-side partial aggregation:
  * at 100 TB the shuffle carries one row per (group × input partition).
  * Averages are derived from exact integer sums divided once at the end, so
  * the doubles are deterministic cross-engine.
  */
object TextAnalysis {

  /** X4 `q_text_stats`: per-language corpus statistics over `documents` —
    * doc count, distinct sources, exact char totals and extrema, and an
    * average derived from the exact sum. */
  def textStatsQ(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .groupBy(col("lang"))
      .agg(
        Num.countStar.as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        sum(col("n_chars")).as("total_chars"),
        (sum(col("n_chars")).cast("double") / Num.countStar).as("avg_chars"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))
      .orderBy(col("lang"))

  val textStatsOracle: String =
    """SELECT lang, COUNT(*) AS n_docs,
      | COUNT(DISTINCT source) AS n_sources,
      | CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      | CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
      | MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  /** `q_rollup_text`: hierarchical corpus reporting via ROLLUP
    * (lang → lang×source → grand total) — one pass, Spark expands the
    * grouping sets inside a single aggregate (no re-scan per level).
    * Grouped keys are sentinel-coalesced through grouping() so the output
    * carries no NULL group keys (cross-engine null ordering/hashing stays
    * out of the comparison). */
  def rollupTextQ(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .rollup(col("lang"), col("source"))
      .agg(Num.countStar.as("n_docs"), sum(col("n_chars")).as("total_chars"),
        grouping(col("lang")).as("g_lang"),
        grouping(col("source")).as("g_source"))
      .select(
        when(col("g_lang") === 1, "(all)").otherwise(col("lang")).as("lang"),
        when(col("g_source") === 1, "(all)").otherwise(col("source")).as("source"),
        col("n_docs"), col("total_chars"))
      .orderBy(col("lang"), col("source"))

  val rollupTextOracle: String =
    """SELECT
      | CASE WHEN GROUPING(lang) = 1 THEN '(all)' ELSE lang END AS lang,
      | CASE WHEN GROUPING(source) = 1 THEN '(all)' ELSE source END AS source,
      | COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
      |FROM documents
      |GROUP BY ROLLUP (lang, source)
      |ORDER BY lang, source""".stripMargin

  /** `q_cube_text`: full CUBE (all 2ⁿ grouping sets — lang, source, both,
    * neither) — completes the grouping-sets family next to X19's ROLLUP.
    * Same single-pass expansion inside one aggregate; same
    * grouping()-sentinel convention keeping NULL group keys out of the
    * cross-engine compare. */
  def cubeTextQ(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .cube(col("lang"), col("source"))
      .agg(Num.countStar.as("n_docs"),
        sum(col("n_chars")).cast("long").as("total_chars"),
        grouping(col("lang")).as("g_lang"),
        grouping(col("source")).as("g_source"))
      .select(
        when(col("g_lang") === 1, "(all)").otherwise(col("lang")).as("lang"),
        when(col("g_source") === 1, "(all)").otherwise(col("source")).as("source"),
        col("n_docs"), col("total_chars"))
      .orderBy(col("lang"), col("source"))

  val cubeTextOracle: String =
    """SELECT
      | CASE WHEN GROUPING(lang) = 1 THEN '(all)' ELSE lang END AS lang,
      | CASE WHEN GROUPING(source) = 1 THEN '(all)' ELSE source END AS source,
      | COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
      |FROM documents
      |GROUP BY CUBE (lang, source)
      |ORDER BY lang, source""".stripMargin

  /** Words array (lower-cased, alnum runs) — shared by the per-doc ops.
    * Purely narrow Column work: no shuffle, stays in whole-stage codegen. */
  private val words: Column = graft.engine.Text.words
  private val wordsSql = graft.engine.Text.wordsSql

  /** BPE-ish tokenizer regex: letter runs, digit runs, or single
    * non-alnum-non-space chars — a deterministic stand-in for a real BPE
    * vocab (same shape GPT-style pre-tokenizers use). */
  val TokenRegex = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  /** `q_token_stats`: whitespace word count + BPE-ish token count + average
    * token length per document. */
  def tokenStatsQ(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        size(words).as("n_words"),
        size(regexp_extract_all(lower(col("text")), lit(TokenRegex), lit(0)))
          .as("n_tokens"),
        length(col("text")).as("n_chars_measured"))
      .withColumn("avg_chars_per_token",
        col("n_chars_measured").cast("double") /
          greatest(col("n_tokens"), lit(1)))
      .orderBy(col("doc_id"))

  val tokenStatsOracle: String =
    s"""SELECT doc_id,
       | len($wordsSql) AS n_words,
       | len(regexp_extract_all(lower(text), '$TokenRegex')) AS n_tokens,
       | length(text) AS n_chars_measured,
       | CAST(length(text) AS DOUBLE)
       |   / greatest(len(regexp_extract_all(lower(text), '$TokenRegex')), 1)
       |   AS avg_chars_per_token
       |FROM documents ORDER BY doc_id""".stripMargin

  /** Marker lexicons for the n-gram/stopword language-ID heuristic. The
    * MECHANISM (score = marker-token occurrences, argmax with lexicographic
    * tie-break) is the capability; the marker sets are runtime parameters —
    * here tuned to the harness vocabulary so scores are non-trivial. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "und", "data", "window"),
    "en" -> Seq("the", "a", "table", "query"),
    "es" -> Seq("el", "la", "row", "column"),
    "zh" -> Seq("spark", "stream", "batch"))

  /** `q_lang_id`: score each candidate language by marker-token occurrence
    * count over the word array (occurrences, not containment — a frequency
    * heuristic), predict the argmax, tie -> lexicographically first lang. */
  def langIdQ(spark: SparkSession, sfDir: String): DataFrame = {
    val scores = LangMarkers.map { case (lang, markers) =>
      lang -> size(filter(words, w => w.isin(markers: _*)))
    }
    // argmax with ties to the lexicographically-first language: fold over
    // the (sorted) languages keeping the strictly-greater score.
    val (bestLang, _) = scores.tail.foldLeft(
      (lit(scores.head._1), scores.head._2)) {
      case ((curLang, curScore), (lang, score)) =>
        (when(score > curScore, lang).otherwise(curLang),
          greatest(curScore, score))
    }
    Tables.documents(spark, sfDir)
      .select(col("doc_id") +: col("lang").as("actual_lang") +:
        scores.map { case (l, s) => s.as(s"score_$l") } :+
        bestLang.as("predicted_lang"): _*)
      .withColumn("is_match", (col("predicted_lang") === col("actual_lang")).cast("int"))
      .orderBy(col("doc_id"))
  }

  val langIdOracle: String = {
    val scoreSql = LangMarkers.map { case (lang, markers) =>
      val in = markers.map(m => s"'$m'").mkString(", ")
      lang -> s"len(list_filter($wordsSql, w -> w IN ($in)))"
    }
    val best = scoreSql.tail.foldLeft(s"'${scoreSql.head._1}'" -> scoreSql.head._2) {
      case ((curLang, curScore), (lang, score)) =>
        (s"CASE WHEN $score > $curScore THEN '$lang' ELSE $curLang END",
          s"greatest($curScore, $score)")
    }._1
    s"""SELECT doc_id, lang AS actual_lang,
       | ${scoreSql.map { case (l, s) => s"$s AS score_$l" }.mkString(",\n ")},
       | $best AS predicted_lang,
       | CAST($best = lang AS INT) AS is_match
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** Stopword set for the quality heuristic (vocabulary-tuned parameter). */
  val Stopwords: Seq[String] = Seq("the", "a")

  /** Cross-engine-safe 4-decimal rounding: floor(x·10⁴ + 0.5)/10⁴. Library
    * HALF_EVEN implementations diverge on exact .xxxx5 ties (Spark bround
    * works on the exact binary value via BigDecimal; DuckDB round_even
    * multiplies first — found live at sf0.1 on 0.1% of quality scores).
    * This formula is the SAME double expression on both engines, so ties
    * resolve identically by construction. */
  private def round4(c: Column): Column =
    floor(c * 10000.0 + 0.5) / 10000.0
  private def round4Sql(e: String): String =
    s"floor(($e) * 10000.0 + 0.5) / 10000.0"

  /** `q_quality_score`: length/punctuation/stopword heuristics combined into
    * a single rounded score — the shape of a pre-training quality filter
    * (length prior + cleanliness + naturalness), all in codegen'd Columns. */
  def qualityScoreQ(spark: SparkSession, sfDir: String): DataFrame = {
    val nWords = size(words)
    // punctuation = chars that survive stripping alnum/space (an earlier
    // form subtracted the wrong way round and measured CLEANLINESS —
    // rewarding "!!!###" as maximally clean; both engines agreed so the
    // cross-engine gate could never see it)
    val nPunct = length(regexp_replace(lower(col("text")), "[a-z0-9 ]", ""))
    val punctRatio = nPunct.cast("double") / greatest(length(col("text")), lit(1))
    val stopRatio = size(filter(words, w => w.isin(Stopwords: _*))).cast("double") /
      greatest(nWords, lit(1))
    val lengthPrior = least(nWords.cast("double") / 100.0, lit(1.0))
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        nWords.as("n_words"),
        round4(punctRatio).as("punct_ratio"),
        round4(stopRatio).as("stopword_ratio"),
        round4(lengthPrior * 0.5 + (lit(1.0) - punctRatio) * 0.3 +
          stopRatio * 0.2).as("quality_score"))
      .orderBy(col("doc_id"))
  }

  val qualityScoreOracle: String = {
    val stopIn = Stopwords.map(s => s"'$s'").mkString(", ")
    s"""WITH q AS (
       |  SELECT doc_id,
       |    len($wordsSql) AS n_words,
       |    CAST(length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g'))
       |         AS DOUBLE) / greatest(length(text), 1) AS punct_ratio,
       |    CAST(len(list_filter($wordsSql, w -> w IN ($stopIn))) AS DOUBLE)
       |      / greatest(len($wordsSql), 1) AS stop_ratio
       |  FROM documents)
       |SELECT doc_id, n_words,
       |  ${round4Sql("punct_ratio")} AS punct_ratio,
       |  ${round4Sql("stop_ratio")} AS stopword_ratio,
       |  ${round4Sql("least(CAST(n_words AS DOUBLE) / 100.0, 1.0) * 0.5" +
            " + (1.0 - punct_ratio) * 0.3 + stop_ratio * 0.2")} AS quality_score
       |FROM q ORDER BY doc_id""".stripMargin
  }

  /** `q_fingerprint`: rolling-hash document fingerprint — 4-word shingles
    * hashed to 60-bit ints (same md5 scheme as Dedup), fingerprint = the two
    * smallest hash values (winnowing-style minima; enough to identify a
    * document under small edits). */
  def fingerprintQ(spark: SparkSession, sfDir: String): DataFrame = {
    val sg4 = transform(sequence(lit(1), size(col("ws")) - 3), i =>
      concat_ws(" ", element_at(col("ws"), i), element_at(col("ws"), i + 1),
        element_at(col("ws"), i + 2), element_at(col("ws"), i + 3)))
    val hashes = array_sort(transform(col("sg4"), s =>
      conv(substring(md5(s), 1, 15), 16, 10).cast("long")))
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), words.as("ws"))
      .filter(size(col("ws")) >= 4)
      .select(col("doc_id"), sg4.as("sg4"))
      .select(col("doc_id"),
        element_at(hashes, 1).as("fp1"),
        // try_: a 4-word doc has ONE shingle, and under ANSI a plain
        // element_at(hashes, 2) throws where the oracle's hs[2] is NULL
        try_element_at(hashes, lit(2)).as("fp2"),
        size(col("sg4")).as("n_shingles"))
      .orderBy(col("doc_id"))
  }

  val fingerprintOracle: String =
    s"""WITH sh AS (
       |  SELECT doc_id,
       |    list_transform(range(1, len(ws)-2),
       |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]) AS sg4
       |  FROM (SELECT doc_id, $wordsSql AS ws FROM documents) t
       |  WHERE len(ws) >= 4),
       |h AS (
       |  SELECT doc_id,
       |    list_sort(list_transform(sg4,
       |      s -> CAST(concat('0x', substr(md5(s),1,15)) AS BIGINT))) AS hs,
       |    len(sg4) AS n_shingles
       |  FROM sh)
       |SELECT doc_id, hs[1] AS fp1, hs[2] AS fp2, n_shingles
       |FROM h ORDER BY doc_id""".stripMargin

  /** `q_simhash`: 32-bit SimHash over the token multiset (frequency-
    * weighted). Bit j is set iff the sum over tokens of ±1 (per token's
    * md5-hash bit j) is positive; emitted MSB-first as a '0'/'1' string so
    * no cross-engine bit-shift arithmetic is needed. Near-dup docs differ in
    * few bit positions (Hamming distance) — the pairing step would bucket on
    * bit-bands exactly like Dedup's MinHash banding. */
  def simhashQ(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.VectorExprs.ensureRegistered(spark)
    val hs = transform(words, w =>
      conv(substring(md5(w), 1, 8), 16, 10).cast("long"))
    // Native single-pass signature (VectorExprs.SimHash32); the MSB-first
    // bit string is just the binary rendering of the value.
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), hs.as("hs"))
      .select(col("doc_id"),
        lpad(bin(graft.functions.VectorExprs.simhash32(col("hs"))), 32, "0")
          .as("simhash_bits"))
      .orderBy(col("doc_id"))
  }

  val simhashOracle: String =
    s"""WITH h AS (
       |  SELECT doc_id,
       |    list_transform($wordsSql,
       |      w -> CAST(concat('0x', substr(md5(w),1,8)) AS BIGINT)) AS hs
       |  FROM documents)
       |SELECT doc_id,
       |  array_to_string(list_transform(range(31, -1, -1), j ->
       |    CASE WHEN list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(hs, h -> ((h >> j) & 1) * 2 - 1)), (a,b) -> a+b) > 0
       |    THEN '1' ELSE '0' END), '') AS simhash_bits
       |FROM h ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------------
  // `q_simhash_pairs`: SimHash near-dup PAIRING — the banded-bucket
  // candidate step on top of q_simhash's signature. 32-bit signature split
  // into 4 byte bands; by pigeonhole any pair within Hamming distance
  // HamMax=3 agrees on at least one whole band, so banding is LOSSLESS for
  // the target radius — the banded plan computes exactly "all pairs with
  // hamming(sim_a, sim_b) <= 3", which is what the oracle states
  // brute-force. Scale: candidates come only from shared (band, byte)
  // buckets (an equi-join), never from an all-pairs product; a stop-bucket
  // (degenerate byte value) would be df-capped like Dedup's posting lists.
  //
  // Scale calibration (round-8 10x soak): wall time tracks OUTPUT size —
  // per-pair cost actually fell 12.3 -> 8.2 µs/pair at 10x docs — and on
  // the low-entropy synthetic corpus the radius-3 pair set is genuinely
  // dense (~16 pairs/doc), so the measured 20x is the data's pair
  // density, not a candidate-stage blow-up. Design note for real corpora:
  // a 32-bit fingerprint's chance-collision rate at radius 3 is
  // ~5.5e3/2^32 ≈ 1.3e-6 per pair, which stays selective to ~10^8 docs;
  // beyond that the published form (Manku et al., WWW'07) widens the
  // fingerprint to 64 bits and keeps radius ≤ 3 (~4.2e4/2^64 ≈ 2e-15),
  // which is a constant-width change to `hs`/`simhash` here — the banding
  // algebra (bands > HamMax ⇒ lossless) is width-independent.
  // ------------------------------------------------------------------

  val SimBands = 4
  val HamMax = 3

  def simhashPairsQ(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.VectorExprs.ensureRegistered(spark)
    val hs = transform(words, w =>
      conv(substring(md5(w), 1, 8), 16, 10).cast("long"))
    // simhash value via the native single-pass expression (VectorExprs.
    // SimHash32) — the HOF formulation interprets 32 lambda passes per doc
    // and dominated the whole query (measured ~10 s of 13.8 s at sf0.1).
    val bandKeys = array((0 until SimBands).map { j =>
      pmod(shiftright(col("simv"), 8 * j), lit(256))
    }: _*)
    // Band rows CARRY the 8-byte signature, so the bucket join verifies
    // Hamming distance inline — no post-candidate re-join against the
    // signature table (the round-3 form paid two extra key-partitioned
    // joins for it). This is the right trade exactly because a SimHash
    // signature is one long; MinHash keeps the verify join because its
    // shingle sets are too fat to duplicate per band row. Materialized:
    // the band frame feeds both sides of the pair join.
    val bands = graft.engine.Materialize.diskBacked(
      Tables.documents(spark, sfDir)
        .select(col("doc_id"), hs.as("hs"))
        .select(col("doc_id"),
          graft.functions.VectorExprs.simhash32(col("hs")).as("simv"))
        .select(col("doc_id"), col("simv"),
          posexplode(bandKeys).as(Seq("band", "key"))))
    bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simv").bitwiseXOR(col("b.simv"))).as("hamming"))
      .distinct() // a pair can share several bands; hamming is pair-determined
      .filter(col("hamming") <= HamMax)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Oracle: the DEFINITION the lossless banding implements — all pairs
    * within the Hamming radius (brute-force is fine for an oracle). */
  val simhashPairsOracle: String =
    s"""WITH h AS (
       |  SELECT doc_id,
       |    list_transform($wordsSql,
       |      w -> CAST(concat('0x', substr(md5(w),1,8)) AS BIGINT)) AS hs
       |  FROM documents),
       |sim AS (
       |  SELECT doc_id,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(range(0, 32), j ->
       |        CASE WHEN list_reduce(list_prepend(CAST(0 AS BIGINT),
       |          list_transform(hs, h -> ((h >> j) & 1) * 2 - 1)), (a,b) -> a+b) > 0
       |        THEN (CAST(1 AS BIGINT) << j) ELSE 0 END)), (a,b) -> a+b) AS simv
       |  FROM h)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(bit_count(CAST(xor(a.simv, b.simv) AS BIGINT)) AS INT) AS hamming
       |FROM sim a JOIN sim b ON a.doc_id < b.doc_id
       |WHERE bit_count(CAST(xor(a.simv, b.simv) AS BIGINT)) <= ${HamMax}
       |ORDER BY doc_a, doc_b""".stripMargin

  /** `q_simhash_est` (X241): SimHash sketch-accuracy evaluation — the
    * simhash leg of the sketch-error trio (X202 measured MinHash's
    * Jaccard estimate against exact Jaccard; this measures what a
    * 32-bit SimHash's bit-agreement actually says about the exact
    * token-vector similarity of each detected pair). Per X26 candidate
    * pair: the Hamming distance, its per-mille bit agreement
    * ((32−h)·1000/32 — the quantity SimHash theory ties to the angular
    * similarity), and the EXACT cosine's three sufficient statistics
    * (Σtf_a·tf_b, Σtf_a², Σtf_b²) as order-independent integer sums —
    * the spearman/X132 convention: the caller does the one float
    * division, no double ever crosses the engine boundary. An
    * estimator nobody audits becomes a silent recall cliff when the
    * corpus shifts; this gate makes the simhash dial a measured one.
    *
    * Scale shape: rides X26's banded pair frame (never all-pairs); the
    * exact-side joins are pair-bounded × document-length with the tf
    * frame materialized once and keyed on doc — the X2 verify-join
    * discipline. */
  def simhashEstQ(spark: SparkSession, sfDir: String): DataFrame = {
    val pairs = simhashPairsQ(spark, sfDir)
    val tf = graft.engine.Materialize.diskBacked(
      Tables.documents(spark, sfDir)
        .select(col("doc_id"), explode(words).as("term"))
        .groupBy(col("doc_id"), col("term"))
        .agg(Num.countStar.as("tf")))
    val norms = tf.groupBy(col("doc_id"))
      .agg(sum(col("tf") * col("tf")).as("n2"))
    pairs
      .join(tf.select(col("doc_id").as("doc_a"), col("term"),
        col("tf").as("tfa")), Seq("doc_a"))
      .join(tf.select(col("doc_id").as("doc_b"), col("term"),
        col("tf").as("tfb")), Seq("doc_b", "term"))
      .groupBy(col("doc_a"), col("doc_b"), col("hamming"))
      .agg(sum(col("tfa") * col("tfb")).as("dot"))
      .join(norms.select(col("doc_id").as("doc_a"), col("n2").as("na2")),
        Seq("doc_a"))
      .join(norms.select(col("doc_id").as("doc_b"), col("n2").as("nb2")),
        Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        col("hamming").cast("long").as("hamming"),
        Num.divLong((lit(32L) - col("hamming")) * 1000L, 32L)
          .as("agreement_pm"),
        col("dot"), col("na2"), col("nb2"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val simhashEstOracle: String =
    s"""WITH sp AS ($simhashPairsOracle),
       |tf AS (
       |  SELECT doc_id, w AS term, CAST(COUNT(*) AS BIGINT) AS tf
       |  FROM (SELECT doc_id, unnest($wordsSql) AS w FROM documents)
       |  GROUP BY 1, 2),
       |norms AS (
       |  SELECT doc_id, CAST(SUM(tf * tf) AS BIGINT) AS n2
       |  FROM tf GROUP BY 1),
       |d AS (
       |  SELECT sp.doc_a, sp.doc_b, sp.hamming,
       |    CAST(SUM(a.tf * b.tf) AS BIGINT) AS dot
       |  FROM sp
       |  JOIN tf a ON a.doc_id = sp.doc_a
       |  JOIN tf b ON b.doc_id = sp.doc_b AND b.term = a.term
       |  GROUP BY 1, 2, 3)
       |SELECT d.doc_a, d.doc_b, CAST(d.hamming AS BIGINT) AS hamming,
       |  (32 - d.hamming) * 1000 // 32 AS agreement_pm,
       |  d.dot, na.n2 AS na2, nb.n2 AS nb2
       |FROM d
       |JOIN norms na ON na.doc_id = d.doc_a
       |JOIN norms nb ON nb.doc_id = d.doc_b
       |ORDER BY doc_a, doc_b""".stripMargin

  /** `q_word_topk`: corpus-wide word frequency top-k — the classic
    * two-phase count (map-side partial aggregation, one shuffle on word)
    * with a deterministic total order (count desc, word asc) before the
    * limit. At 100 TB the limit pushes into a TakeOrdered over the
    * aggregated (vocabulary-sized) frame — no full sort of the corpus. */
  val TopKWords = 20

  def wordTopkQ(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(explode(words).as("word"))
      .groupBy(col("word"))
      .agg(Num.countStar.as("n"))
      .orderBy(col("n").desc, col("word"))
      .limit(TopKWords)

  val wordTopkOracle: String =
    s"""SELECT w AS word, COUNT(*) AS n
       |FROM (SELECT unnest($wordsSql) AS w FROM documents)
       |GROUP BY 1 ORDER BY n DESC, word LIMIT ${TopKWords}""".stripMargin

  /** `q_tfidf`: rarity-weighted top terms per document — tf from one
    * explode+count, document frequency from the distinct (doc, term) frame,
    * ranked per doc by (tf desc, df asc, term asc). The ordering IS tf-idf
    * ordering (idf is monotone-decreasing in df) expressed in exact
    * integers, so no cross-engine float-log drift can flip a rank. The df
    * side is vocabulary-sized — broadcast to the tf frame; one shuffle on
    * (doc_id, term), one vocabulary-sized aggregate, one window per doc. */
  val TfidfTopTerms = 3

  def tfidfQ(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // MATERIALIZED: tf feeds both the dfreq aggregate and the join probe —
    // unmaterialized, the corpus tokenize + shuffle executes twice (the
    // multi-consumer rule ngramLmQ documents)
    val tf = graft.engine.Materialize.diskBacked(
      Tables.documents(spark, sfDir)
        .select(col("doc_id"), explode(words).as("term"))
        .groupBy(col("doc_id"), col("term"))
        .agg(Num.countStar.as("tf")))
    val dfreq = tf.groupBy(col("term")).agg(Num.countStar.as("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tf").desc, col("df").asc, col("term").asc)
    tf.join(broadcast(dfreq), Seq("term"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= TfidfTopTerms)
      .select(col("doc_id"), col("rnk"), col("term"), col("tf"), col("df"))
      .orderBy(col("doc_id"), col("rnk"))
  }

  val tfidfOracle: String =
    s"""WITH tf AS (
       |  SELECT doc_id, w AS term, COUNT(*) AS tf
       |  FROM (SELECT doc_id, unnest($wordsSql) AS w FROM documents)
       |  GROUP BY 1, 2),
       |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
       |ranked AS (
       |  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
       |    ROW_NUMBER() OVER (PARTITION BY tf.doc_id
       |      ORDER BY tf.tf DESC, dfreq.df ASC, tf.term ASC) AS rnk
       |  FROM tf JOIN dfreq USING (term))
       |SELECT doc_id, rnk, term, tf, df
       |FROM ranked WHERE rnk <= ${TfidfTopTerms}
       |ORDER BY doc_id, rnk""".stripMargin

  /** `q_bm25`: BM25 retrieval scoring per (query-term, doc) — the ranking
    * function real retrieval pipelines layer over the X20 tf/df plumbing.
    * Both BM25 refinements over raw tf-idf are exercised: tf SATURATION
    * (k1: the 10th occurrence adds less than the 2nd) and document-LENGTH
    * normalization (b: a term hit in a short doc outranks the same hit in a
    * long one). The idf weight is Robertson's (N - df + ½)/(df + ½) WITHOUT
    * the log — per term the log is monotone, so per-term rankings are
    * BM25-identical, and it keeps every arithmetic step a raw IEEE op
    * (ln is not bit-reproducible across engines; see q_tfidf for the same
    * reasoning). Every input is an exact integer (tf, df, dl, N) cast once
    * to double, every op is written in the same order in both engines, so
    * the scores hash-match bit-for-bit.
    *
    * Plan shape: tf is one (doc, term) aggregate filtered to the query
    * terms BEFORE the shuffle (the term filter prunes at the explode); dl
    * is a narrow per-doc column; df and the (N, avgdl) scalars are
    * vocabulary-sized/1-row broadcasts. One data-sized shuffle total. */
  val Bm25K1 = 1.2
  val Bm25B = 0.75
  val Bm25Terms: Seq[String] = Seq("join", "merge", "scan", "window")
  val Bm25TopDocs = 15

  def bm25Q(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), words.as("ws"))
      .select(col("doc_id"), explode(col("ws")).as("term"),
        size(col("ws")).cast("long").as("dl"))
    // MATERIALIZED: tf feeds both the dfreq aggregate and the scoring
    // join — the watchlist-filtered fold of the tokenized corpus must not
    // run twice (the multi-consumer rule)
    val tf = graft.engine.Materialize.diskBacked(
      docs.filter(col("term").isInCollection(Bm25Terms))
        .groupBy(col("doc_id"), col("term"))
        .agg(Num.countStar.as("tf"), min(col("dl")).as("dl")))
    val dfreq = tf.groupBy(col("term")).agg(Num.countStar.as("df"))
    // corpus scalars: N docs and average doc length (exact longs, one
    // division) — a 1-row broadcast, the A5 scalar-subquery shape
    val corpus = Tables.documents(spark, sfDir)
      .select(col("doc_id"), size(words).cast("long").as("dl"))
      .agg(Num.countStar.as("n_docs"), sum(col("dl")).as("total_dl"))
      .select(col("n_docs"),
        (col("total_dl").cast("double") / col("n_docs")).as("avgdl"))
    val k1 = lit(Bm25K1)
    val b = lit(Bm25B)
    val idf = (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))
    val score = idf * (col("tf") * (k1 + lit(1))) /
      (col("tf") + k1 * (lit(1) - b + b * col("dl") / col("avgdl")))
    val w = Window.partitionBy(col("term"))
      .orderBy(col("score").desc, col("doc_id").asc)
    tf.join(broadcast(dfreq), Seq("term"))
      .crossJoin(broadcast(corpus))
      .withColumn("score", score)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= Bm25TopDocs)
      .select(col("term"), col("rnk"), col("doc_id"), col("tf"), col("df"),
        col("dl"), col("score"))
      .orderBy(col("term"), col("rnk"))
  }

  val bm25Oracle: String = {
    val terms = Bm25Terms.map(t => s"'$t'").mkString(", ")
    s"""WITH dw AS (
       |  SELECT doc_id, $wordsSql AS ws FROM documents),
       |tf AS (
       |  SELECT doc_id, w AS term, COUNT(*) AS tf, MIN(dl) AS dl
       |  FROM (SELECT doc_id, unnest(ws) AS w, len(ws) AS dl FROM dw)
       |  WHERE w IN ($terms)
       |  GROUP BY 1, 2),
       |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
       |corpus AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(len(ws)) AS DOUBLE) / COUNT(*) AS avgdl
       |  FROM dw),
       |scored AS (
       |  SELECT tf.term, tf.doc_id, tf.tf, dfreq.df, tf.dl,
       |    -- literals CAST to DOUBLE: DuckDB parses bare 1.2/0.5/0.75 as
       |    -- DECIMAL and would do exact-decimal sub-arithmetic, drifting
       |    -- 1 ulp from Spark's IEEE doubles
       |    (c.n_docs - dfreq.df + CAST(0.5 AS DOUBLE))
       |      / (dfreq.df + CAST(0.5 AS DOUBLE))
       |      * (tf.tf * (CAST($Bm25K1 AS DOUBLE) + 1))
       |      / (tf.tf + CAST($Bm25K1 AS DOUBLE)
       |         * (1 - CAST($Bm25B AS DOUBLE)
       |            + CAST($Bm25B AS DOUBLE) * tf.dl / c.avgdl))
       |      AS score
       |  FROM tf JOIN dfreq USING (term) CROSS JOIN corpus c)
       |SELECT term, rnk, doc_id, CAST(tf AS BIGINT) AS tf,
       |  CAST(df AS BIGINT) AS df, CAST(dl AS BIGINT) AS dl, score
       |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY term
       |        ORDER BY score DESC, doc_id ASC) AS rnk FROM scored) t
       |WHERE rnk <= ${Bm25TopDocs}
       |ORDER BY term, rnk""".stripMargin
  }

  /** Kept vocabulary size; id 1 is reserved for OOV, word ids start at 2. */
  val VocabSize = 24

  /** `q_vocab_encode`: corpus-frequency vocabulary + id encoding — the
    * actual tokenize-to-ids step of training-data prep: build the top-K
    * vocabulary from the corpus (frequency-ranked, lexicographic
    * tie-break), then map every document to its id sequence with unknowns
    * collapsed to the OOV id.
    *
    * Scale shape: the vocabulary aggregate is two-phase over the WORD
    * domain (bounded by the language, not the corpus), and its ranking
    * window runs on that domain-bounded frame — the one single-partition
    * window in the repo, legal because its input can't exceed |vocabulary|
    * (a real 50k-token vocab is still one executor's work). Encoding is
    * then fully narrow: the vocab ships as ONE broadcast map row and each
    * document transforms in place — order preserved by construction
    * (transform, not explode/reassemble), no shuffle touches a document.
    * Ids ride as a space-joined string (id sequences hash-gate as text;
    * cross-engine array hashing does not). */
  def vocabEncodeQ(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), words.as("ws"))
    val vocab = docs.select(explode(col("ws")).as("w"))
      .groupBy(col("w")).agg(Num.countStar.as("cnt"))
      .withColumn("id",
        row_number().over(Window.orderBy(col("cnt").desc, col("w").asc)) + 1)
      .filter(col("id") <= VocabSize + 1)
    val vmap = vocab
      .agg(map_from_entries(collect_list(struct(col("w"), col("id"))))
        .as("vmap"))
    docs.crossJoin(broadcast(vmap))
      .select(col("doc_id"), size(col("ws")).as("n_tokens"),
        concat_ws(" ", transform(col("ws"),
          w => coalesce(element_at(col("vmap"), w), lit(1)).cast("string")))
          .as("input_ids"))
      .orderBy(col("doc_id"))
  }

  val vocabEncodeOracle: String =
    s"""WITH dw AS (
       |  SELECT doc_id, $wordsSql AS ws FROM documents),
       |tok AS (SELECT doc_id, unnest(ws) AS w FROM dw),
       |vocab AS (
       |  SELECT w AS word,
       |    ROW_NUMBER() OVER (ORDER BY cnt DESC, w ASC) + 1 AS id
       |  FROM (SELECT w, COUNT(*) AS cnt FROM tok GROUP BY 1)
       |  QUALIFY ROW_NUMBER() OVER (ORDER BY cnt DESC, w ASC) <= ${VocabSize}),
       |m AS (SELECT map(list(word ORDER BY id), list(id ORDER BY id)) AS vmap
       |      FROM vocab)
       |SELECT doc_id, len(ws) AS n_tokens,
       |  array_to_string(list_transform(ws,
       |    w -> CAST(coalesce(map_extract(vmap, w)[1], 1) AS VARCHAR)), ' ')
       |    AS input_ids
       |FROM dw, m ORDER BY doc_id""".stripMargin

  /** Bigram report size. */
  val NgramLmTopK = 25

  /** `q_ngram_lm`: corpus bigram language-model counts — the top-K word
    * bigrams with their left-context totals, i.e. the numerator and
    * denominator of the conditional probability P(w2 | w1) = n / w1_total
    * as exact integers (the division — and any smoothing constant — is the
    * caller's; integer counts are what keep the gate bit-exact and what a
    * real LM trainer ships between stages anyway).
    *
    * Plan: bigrams come from zip_with over each doc's own token array (a
    * narrow, codegen'd projection — no self-join, no window), then ONE
    * two-phase count on (w1, w2); the left totals aggregate from that
    * already-vocabulary-sized frame, not from the corpus, and broadcast
    * back. The bigram frame is disk-materialized so the totals branch
    * reuses it instead of re-tokenizing the corpus (Spark has no
    * cross-branch subtree reuse — see graft.engine.Materialize). The final
    * top-K is a global sort of a vocab²-bounded frame with
    * TakeOrderedAndProject doing a per-partition heap. */
  /** The materialized (w1, w2, n) bigram-count frame — ONE front shared by
    * the LM counts (ngramLmQ) and the collocation miner (collocationsQ):
    * corpus tokenize → adjacent-pair explode → map-side-combined count,
    * disk-backed because every consumer fans it into several branches. */
  private def bigramCounts(spark: SparkSession, sfDir: String): DataFrame =
    graft.engine.Materialize.diskBacked(Tables.documents(spark, sfDir)
      .select(words.as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(explode(zip_with(
        slice(col("ws"), lit(1), size(col("ws")) - 1),
        slice(col("ws"), lit(2), size(col("ws")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy(col("w1"), col("w2"))
      .agg(Num.countStar.as("n")))

  /** The bigram-count CTEs (`d`, `bg`, `c`) shared by both oracles. */
  private val bigramCteSql: String =
    s"""d AS (SELECT $wordsSql AS ws FROM documents),
       |bg AS (
       |  SELECT ws[i] AS w1, ws[i + 1] AS w2
       |  FROM d, UNNEST(range(1, len(ws))) AS u(i)
       |  WHERE len(ws) >= 2),
       |c AS (SELECT w1, w2, COUNT(*) AS n FROM bg GROUP BY 1, 2)""".stripMargin

  def ngramLmQ(spark: SparkSession, sfDir: String): DataFrame = {
    val bi = bigramCounts(spark, sfDir)
    val totals = bi.groupBy(col("w1")).agg(sum(col("n")).as("w1_total"))
    bi.join(broadcast(totals), Seq("w1"))
      .orderBy(col("n").desc, col("w1"), col("w2"))
      .limit(NgramLmTopK)
      .select(col("w1"), col("w2"), col("n"), col("w1_total"))
  }

  val ngramLmOracle: String =
    s"""WITH $bigramCteSql,
       |p AS (SELECT w1, CAST(SUM(n) AS BIGINT) AS w1_total FROM c GROUP BY 1)
       |SELECT c.w1, c.w2, c.n, p.w1_total
       |FROM c JOIN p USING (w1)
       |ORDER BY n DESC, w1, w2 LIMIT ${NgramLmTopK}""".stripMargin

  // `q_collocations`: PMI-style collocation mining in exact integers

  /** Minimum bigram count / rational lift threshold (num/den = 1.5×,
    * chosen against the corpus: the synthetic text is near-independent,
    * so ≥ 2× lift leaves a 1-row report at sf0.1) / rows reported. */
  val CollocMinCount = 3
  val CollocLiftNum = 3
  val CollocLiftDen = 2
  val CollocTopK = 30

  /** `q_collocations`: collocation extraction — bigrams whose observed
    * count beats independence by ≥ Num/Den× (the PMI > log(lift)
    * filter every phrase-mining / tokenizer-vocab pipeline runs), with
    * ALL arithmetic exact: the lift test den·n_ab·N ≥ num·n_a·n_b is
    * integer CROSS-MULTIPLICATION (no log, no division) carried in
    * DECIMAL(38,0) — n_ab·N can approach N², past 2⁶³ once the corpus
    * holds ~3·10⁹ bigram tokens, so 128-bit headroom is required at the
    * 100 TB design point (same convention as the corr-matrix exact
    * sums), marginals n_a/n_b are
    * the bigram frame's own position totals (one consistent probability
    * space, no second corpus pass), and the report orders by exact count.
    * PMI itself is left to the caller (spearman/corr convention).
    *
    * Scale shape: everything downstream of the shared bigram front runs
    * on the vocabulary-bounded count frame — two marginal aggregates
    * broadcast back, a 1-row total, a TakeOrdered. */
  def collocationsQ(spark: SparkSession, sfDir: String): DataFrame = {
    val bi = bigramCounts(spark, sfDir)
    val m1 = bi.groupBy(col("w1")).agg(sum(col("n")).as("n_a"))
    val m2 = bi.groupBy(col("w2")).agg(sum(col("n")).as("n_b"))
    val tot = bi.agg(sum(col("n")).as("n_total"))
    bi.join(broadcast(m1), Seq("w1"))
      .join(broadcast(m2), Seq("w2"))
      .crossJoin(broadcast(tot))
      .filter(col("n") >= CollocMinCount &&
        lit(CollocLiftDen).cast("decimal(38,0)") * col("n") * col("n_total") >=
          lit(CollocLiftNum).cast("decimal(38,0)") * col("n_a") * col("n_b"))
      .select(col("w1"), col("w2"), col("n").as("n_ab"),
        col("n_a"), col("n_b"), col("n_total"))
      .orderBy(col("n_ab").desc, col("w1"), col("w2"))
      .limit(CollocTopK)
  }

  val collocationsOracle: String =
    s"""WITH $bigramCteSql,
       |m1 AS (SELECT w1, CAST(SUM(n) AS BIGINT) AS n_a FROM c GROUP BY 1),
       |m2 AS (SELECT w2, CAST(SUM(n) AS BIGINT) AS n_b FROM c GROUP BY 1),
       |t AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total FROM c)
       |SELECT c.w1, c.w2, c.n AS n_ab, m1.n_a, m2.n_b, t.n_total
       |FROM c JOIN m1 USING (w1) JOIN m2 USING (w2), t
       |WHERE c.n >= ${CollocMinCount}
       |  AND CAST(${CollocLiftDen} AS DECIMAL(38,0)) * c.n * t.n_total
       |    >= CAST(${CollocLiftNum} AS DECIMAL(38,0)) * m1.n_a * m2.n_b
       |ORDER BY n_ab DESC, w1, w2 LIMIT ${CollocTopK}""".stripMargin

  /** A bigram whose corpus count is ≤ this is "rare" for the LM filter. */
  val LmRareMax = 2

  /** `q_lm_quality`: the LM-based quality filter every pretraining corpus
    * runs — score each document by how far its bigrams sit from the
    * corpus's own language model, flag the outliers. A true perplexity
    * needs log-probabilities, whose last-ulp behavior is not identical
    * across engines; the gate-stable surrogate is the RARE-BIGRAM
    * FRACTION: per doc, the share of its bigram occurrences whose corpus
    * frequency is ≤ LmRareMax. Gibberish and boilerplate-mangled docs
    * score high; the flag is the exact integer comparison
    * 2·n_rare > n_bigrams (no float division anywhere near the gate).
    *
    * Plan: doc bigrams explode once (data-sized, materialized for the two
    * consumers), fold to the vocab²-bounded corpus LM, then ONE shuffle
    * join of doc-bigrams against the LM on (w1, w2) and a per-doc rollup.
    * At 100 TB the LM side's materialized stats let the optimizer
    * broadcast it when the vocabulary allows; nothing row-proportional is
    * ever windowed. */
  def lmQualityQ(spark: SparkSession, sfDir: String): DataFrame = {
    val docBg = graft.engine.Materialize.diskBacked(
      Tables.documents(spark, sfDir)
        .select(col("doc_id"), words.as("ws"))
        .filter(size(col("ws")) >= 2)
        .select(col("doc_id"), explode(zip_with(
          slice(col("ws"), lit(1), size(col("ws")) - 1),
          slice(col("ws"), lit(2), size(col("ws")) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
        .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2")))
    val lm = docBg.groupBy(col("w1"), col("w2")).agg(Num.countStar.as("n"))
    docBg.join(lm, Seq("w1", "w2"))
      .groupBy(col("doc_id"))
      .agg(Num.countStar.as("n_bigrams"),
        sum((col("n") <= LmRareMax).cast("long")).as("n_rare"))
      .select(col("doc_id"), col("n_bigrams"), col("n_rare"),
        (col("n_rare") * 2 > col("n_bigrams")).as("flagged"))
      .orderBy(col("doc_id"))
  }

  val lmQualityOracle: String =
    s"""WITH d AS (SELECT doc_id, $wordsSql AS ws FROM documents),
       |bg AS (
       |  SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
       |  FROM d, UNNEST(range(1, len(ws))) AS u(i)
       |  WHERE len(ws) >= 2),
       |c AS (SELECT w1, w2, COUNT(*) AS n FROM bg GROUP BY 1, 2),
       |s AS (
       |  SELECT bg.doc_id, COUNT(*) AS n_bigrams,
       |    CAST(SUM(CASE WHEN c.n <= ${LmRareMax} THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_rare
       |  FROM bg JOIN c USING (w1, w2)
       |  GROUP BY 1)
       |SELECT doc_id, n_bigrams, n_rare, n_rare * 2 > n_bigrams AS flagged
       |FROM s ORDER BY doc_id""".stripMargin

  /** X121 `q_entropy`: per-document token Shannon entropy rolled up per
    * language — the "is this text natural or degenerate" quality signal
    * (boilerplate, keyword-stuffed, and template docs all crater it)
    * curation stacks filter on alongside the X9 heuristics.
    *
    * H(doc) = ln(n) − Σ tf·ln(tf) / n over the term-frequency vector —
    * one corpus tokenize → (doc, term) count → per-doc fold → per-lang
    * average. Every count is exact; ln enters only in the last two steps
    * and the per-lang averages are collapsed with the repo's cross-engine
    * round6 (ln is not bit-reproducible across engines — same reasoning
    * as q_tfidf, which avoids logs entirely; an AVERAGE of log terms
    * cannot, so it is rounded instead). The type-token ratio rides along
    * for free from the same fold. Docs with zero alphanumeric tokens have
    * no entropy and drop out of the fold (explode emits nothing). */
  def entropyQ(spark: SparkSession, sfDir: String): DataFrame = {
    val round6 = (c: Column) => floor(c * 1e6 + 0.5) / 1e6
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), explode(words).as("term"))
      .groupBy(col("doc_id"), col("lang"), col("term"))
      .agg(Num.countStar.as("tf"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("tf")).as("n_words"),
        Num.countStar.as("n_terms"),
        sum(col("tf").cast("double") * log(col("tf").cast("double")))
          .as("s"))
      .select(col("lang"),
        (log(col("n_words").cast("double")) -
          col("s") / col("n_words").cast("double")).as("ent"),
        (col("n_terms").cast("double") / col("n_words").cast("double"))
          .as("ttr"))
      .groupBy(col("lang"))
      .agg(Num.countStar.as("n_docs"),
        round6(sum(col("ent")) / count(lit(1))).as("avg_entropy"),
        round6(sum(col("ttr")) / count(lit(1))).as("avg_ttr"))
      .orderBy(col("lang"))
  }

  val entropyOracle: String =
    s"""WITH tf AS (
       |  SELECT doc_id, lang, w AS term, COUNT(*) AS tf
       |  FROM (SELECT doc_id, lang, unnest($wordsSql) AS w FROM documents)
       |  GROUP BY 1, 2, 3),
       |d AS (
       |  SELECT doc_id, lang, SUM(tf) AS n_words, COUNT(*) AS n_terms,
       |    SUM(CAST(tf AS DOUBLE) * ln(CAST(tf AS DOUBLE))) AS s
       |  FROM tf GROUP BY 1, 2),
       |e AS (
       |  SELECT lang,
       |    ln(CAST(n_words AS DOUBLE)) - s / CAST(n_words AS DOUBLE) AS ent,
       |    CAST(n_terms AS DOUBLE) / CAST(n_words AS DOUBLE) AS ttr
       |  FROM d)
       |SELECT lang, COUNT(*) AS n_docs,
       |  floor(SUM(ent) / COUNT(*) * 1e6 + 0.5) / 1e6 AS avg_entropy,
       |  floor(SUM(ttr) / COUNT(*) * 1e6 + 0.5) / 1e6 AS avg_ttr
       |FROM e GROUP BY 1 ORDER BY lang""".stripMargin

  // `q_feature_hash` (X232): hashing-trick vectorization audit

  /** Feature-space width for the hashing trick. Deliberately SMALLER
    * than a production 2^18+ so collisions actually occur at gate scale
    * and the collision accounting has teeth. */
  val FeatureHashBuckets = 64L

  /** `q_feature_hash`: the HASHING TRICK (feature hashing) — the
    * vocabulary-free text vectorizer: token → bucket = h(token) mod B,
    * no dictionary build, no OOV handling, bounded feature width no
    * matter how the vocabulary grows. That statelessness is why it's
    * the default first vectorizer at corpus scale (a dictionary is a
    * second full pass plus a broadcast that grows with the vocab; the
    * hash is a per-row expression) — and its known cost is COLLISIONS,
    * which this operator makes measurable per bucket: occupancy
    * (occurrence mass), n_terms (> 1 = colliding features), and
    * document reach. The hash is the engine-portable md5-prefix draw
    * (the X190 shard-assignment discipline), so both engines bucket
    * identically and the audit hash-gates.
    *
    * Scale shape: one explode + one aggregate keyed on (bucket, term) /
    * (bucket, doc) under Spark's distinct-aggregate expand — partial
    * aggregation dedups map-side, the final shuffle is
    * feature-width-bounded. No dictionary, no second corpus pass. */
  def featureHashQ(spark: SparkSession, sfDir: String): DataFrame = {
    val bucket = (conv(substring(md5(concat(lit("fh"), col("term"))), 1, 15),
      16, 10).cast("long") % FeatureHashBuckets).as("bucket")
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(words).as("term"))
      .select(col("doc_id"), col("term"), bucket)
      .groupBy(col("bucket"))
      .agg(Num.countStar.as("n_occurrences"),
        countDistinct(col("term")).as("n_terms"),
        countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("bucket"))
  }

  val featureHashOracle: String =
    s"""WITH tok AS (
       |  SELECT doc_id, unnest($wordsSql) AS term FROM documents),
       |b AS (
       |  SELECT doc_id, term,
       |    CAST(concat('0x', substr(md5('fh' || term), 1, 15)) AS BIGINT)
       |      % ${FeatureHashBuckets} AS bucket
       |  FROM tok)
       |SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       |  CAST(COUNT(DISTINCT term) AS BIGINT) AS n_terms,
       |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
       |FROM b GROUP BY 1 ORDER BY bucket""".stripMargin

  /** Inverted-index report bounds: hapax terms pruned, top terms by df. */
  val IdxMinDf = 2
  val IdxTopTerms = 40
  val IdxPostingsHead = 5

  /** X122 `q_inverted_index`: term → (document frequency, head of the
    * sorted postings list) — the retrieval-index build step (and the
    * exploratory "which docs contain this term" surface) over the same
    * tokenize → distinct (term, doc) stream the dedup and tf-idf
    * operators share. Postings are materialized per term by a sorted
    * collect bounded to [[IdxPostingsHead]] ids; hapax terms (df <
    * [[IdxMinDf]] — the long tail that dominates vocabulary size) are
    * pruned BEFORE the global ranking window, so the single-task
    * row_number sees the pruned vocabulary, not the corpus. At 100 TB the
    * same plan holds: postings build is one (term)-keyed shuffle of
    * (term, doc) pairs; only the bounded report passes a single task. */
  def invertedIndexQ(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("df").desc, col("term").asc)
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(words).as("term"))
      .distinct()
      .groupBy(col("term"))
      .agg(Num.countStar.as("df"),
        array_join(
          slice(sort_array(collect_list(col("doc_id"))), 1, IdxPostingsHead)
            .cast("array<string>"), ",")
          .as("postings_head"))
      .filter(col("df") >= IdxMinDf)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= IdxTopTerms)
      .select(col("rnk"), col("term"), col("df"), col("postings_head"))
      .orderBy(col("rnk"))
  }

  /** X127 `q_source_overlap`: pairwise vocabulary-overlap matrix between
    * sources — the "which feeds duplicate each other" diagnostic a corpus
    * curator reads before weighting or dropping a source (high overlap
    * coefficient = one source is near-contained in the other). Shared-term
    * counts come from a self-join of the distinct (source, term) vocabulary
    * frame ON THE TERM: per-term fan-out is bounded by |sources|² — a
    * category-domain constant — so the join output is |vocab|·C(s,2) at
    * worst, never corpus-sized. The overlap coefficient |A∩B| / min(|A|,|B|)
    * uses exact integer counts with one rounded division; vocabulary sizes
    * broadcast back onto the source-pair frame. */
  def sourceOverlapQ(spark: SparkSession, sfDir: String): DataFrame = {
    // MATERIALIZED: the vocabulary frame feeds both self-join sides AND
    // the per-source size aggregate — three consumers of one tokenize.
    val vocab = graft.engine.Materialize.diskBacked(
      Tables.documents(spark, sfDir)
        .select(col("source"), explode(words).as("term"))
        .distinct())
    val sizes = vocab.groupBy(col("source")).agg(Num.countStar.as("v"))
    val a = vocab.select(col("term"), col("source").as("source_a"))
    val b = vocab.select(col("term"), col("source").as("source_b"))
    a.join(b, Seq("term"))
      .filter(col("source_a") < col("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(Num.countStar.as("shared"))
      .join(broadcast(sizes.select(col("source").as("source_a"),
        col("v").as("vocab_a"))), Seq("source_a"))
      .join(broadcast(sizes.select(col("source").as("source_b"),
        col("v").as("vocab_b"))), Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("shared"),
        col("vocab_a"), col("vocab_b"),
        (floor(col("shared").cast("double") /
          least(col("vocab_a"), col("vocab_b")).cast("double") * 1e6 + 0.5)
          / 1e6).as("overlap"))
      .orderBy(col("source_a"), col("source_b"))
  }

  val sourceOverlapOracle: String =
    s"""WITH vocab AS (
       |  SELECT DISTINCT source, w AS term
       |  FROM (SELECT source, unnest($wordsSql) AS w FROM documents)),
       |sizes AS (SELECT source, COUNT(*) AS v FROM vocab GROUP BY 1),
       |p AS (
       |  SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS shared
       |  FROM vocab a JOIN vocab b ON a.term = b.term AND a.source < b.source
       |  GROUP BY 1, 2)
       |SELECT source_a, source_b, shared, sa.v AS vocab_a, sb.v AS vocab_b,
       |  floor(CAST(shared AS DOUBLE) / least(sa.v, sb.v) * 1e6 + 0.5) / 1e6
       |    AS overlap
       |FROM p
       |JOIN sizes sa ON sa.source = p.source_a
       |JOIN sizes sb ON sb.source = p.source_b
       |ORDER BY source_a, source_b""".stripMargin

  // `q_bpe_pairs`: BPE merge-pair counting (tokenizer-training step)

  /** Merge candidates reported. */
  val BpePairTopK = 30

  /** `q_bpe_pairs`: the counting step of one BPE training iteration — the
    * distributed job a tokenizer build runs over the full corpus: count
    * adjacent symbol pairs (here: character bigrams inside words) weighted
    * by word frequency; the argmax pair is the next merge rule.
    *
    * Scale shape — the whole point of the word-frequency detour: the
    * corpus collapses to its VOCABULARY first (one map-side-combined
    * aggregate; vocab ≪ corpus tokens, and it only shrinks relatively as
    * the corpus grows), so the pair explode fans out Σ|word| over
    * DISTINCT words, not over corpus tokens — at 100 TB the second stage's
    * input is megabytes. The pair aggregate's output is alphabet²-bounded.
    * Real BPE iterates merge→recount; each iteration is this same shape
    * over the current symbol sequences, so the one-iteration query is the
    * scalability proof for the loop. Length-1 words carry no pair and are
    * filtered BEFORE the explode (also keeps Spark's `sequence(1, 0)`
    * descending-step edge out of the plan). */
  def bpePairsQ(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(explode(words).as("word"))
      .groupBy(col("word")).agg(Num.countStar.as("freq"))
      .filter(length(col("word")) >= 2)
      .select(col("word"), col("freq"),
        explode(sequence(lit(1), length(col("word")) - 1)).as("i"))
      .select(expr("substring(word, i, 2)").as("pair"), col("freq"))
      .groupBy(col("pair")).agg(sum(col("freq")).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(BpePairTopK)

  val bpePairsOracle: String =
    s"""WITH vocab AS (
       |  SELECT w AS word, COUNT(*) AS freq
       |  FROM (SELECT unnest($wordsSql) AS w FROM documents)
       |  GROUP BY 1),
       |pos AS (
       |  SELECT word, freq,
       |    unnest(generate_series(1, length(word) - 1)) AS i
       |  FROM vocab WHERE length(word) >= 2)
       |SELECT substr(word, i, 2) AS pair, CAST(SUM(freq) AS BIGINT) AS n
       |FROM pos GROUP BY 1
       |ORDER BY n DESC, pair LIMIT ${BpePairTopK}""".stripMargin

  val invertedIndexOracle: String =
    s"""WITH posting AS (
       |  SELECT DISTINCT w AS term, doc_id
       |  FROM (SELECT doc_id, unnest($wordsSql) AS w FROM documents)),
       |agg AS (
       |  SELECT term, COUNT(*) AS df,
       |    array_to_string((list_sort(list(doc_id)))[1:${IdxPostingsHead}], ',')
       |      AS postings_head
       |  FROM posting GROUP BY 1
       |  HAVING COUNT(*) >= ${IdxMinDf}),
       |ranked AS (
       |  SELECT *, ROW_NUMBER() OVER (ORDER BY df DESC, term ASC) AS rnk
       |  FROM agg)
       |SELECT rnk, term, df, postings_head
       |FROM ranked WHERE rnk <= ${IdxTopTerms} ORDER BY rnk""".stripMargin

  // ------------------------------------------------------------------
  // `q_readability` (X209): integer Flesch reading-ease bands
  // ------------------------------------------------------------------

  /** `q_readability`: Flesch reading-ease per document, folded to band
    * histograms per source — the classic quality-filter signal corpus
    * pipelines run next to X9's ratio score (C4/Gopher-style filters cut
    * on readability-adjacent stats; a score of 30 vs 90 separates legal
    * boilerplate from conversational text). Flesch = 206.835 −
    * 1.015·(words/sentences) − 84.6·(syllables/words), computed ENTIRELY
    * in milli-scaled integer arithmetic (two exact integral divisions per
    * doc, subtraction in Longs): no float ever enters, so the per-band
    * counts and mean hash-gate cross-engine. Proxies are the standard
    * text-stat ones, one regex pass each: sentences = `[.!?]+` runs
    * (min 1), syllables = `[aeiouy]+` vowel runs in the lowered text —
    * deterministic and tokenizer-consistent ([[graft.engine.Text]] for
    * words).
    *
    * Scale shape: one narrow codegen'd pass per doc (regexp counts +
    * two divs), then a (source × 4-band)-bounded aggregate — nothing
    * data-sized after the scan. */
  def readabilityQ(spark: SparkSession, sfDir: String): DataFrame = {
    val w = size(graft.engine.Text.words).cast("long")
    val s = greatest(lit(1L),
      size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0))).cast("long"))
    val y = size(regexp_extract_all(lower(col("text")), lit("[aeiouy]+"),
      lit(0))).cast("long")
    val score = lit(206835L) - Num.divLong(lit(1015L) * col("w"), col("s")) -
      Num.divLong(lit(84600L) * col("y"), col("w"))
    Tables.documents(spark, sfDir)
      .select(col("source"), w.as("w"), s.as("s"), y.as("y"))
      .filter(col("w") >= 1L)
      .select(col("source"), col("w"), score.as("score_milli"))
      .select(col("source"), col("score_milli"),
        when(col("score_milli") >= 90000L, "A_very_easy")
          .when(col("score_milli") >= 60000L, "B_standard")
          .when(col("score_milli") >= 30000L, "C_difficult")
          .otherwise("D_very_difficult").as("band"))
      .groupBy(col("source"), col("band"))
      // sum, not mean: scores can be negative and integral division of a
      // negative dividend truncates in Spark but floors in DuckDB — the
      // exact Long sum sidesteps the divergence (Num.divLong's documented
      // nonneg-only contract)
      .agg(Num.countStar.as("n_docs"),
        sum(col("score_milli")).as("sum_milli"),
        min(col("score_milli")).as("min_milli"),
        max(col("score_milli")).as("max_milli"))
      .orderBy(col("source"), col("band"))
  }

  val readabilityOracle: String =
    s"""WITH t AS (
       |  SELECT source,
       |    CAST(len($wordsSql) AS BIGINT) AS w,
       |    greatest(1, CAST(len(regexp_extract_all(text, '[.!?]+'))
       |      AS BIGINT)) AS s,
       |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
       |      AS BIGINT) AS y
       |  FROM documents),
       |sc AS (
       |  SELECT source,
       |    206835 - (1015 * w) // s - (84600 * y) // w AS score_milli
       |  FROM t WHERE w >= 1),
       |b AS (
       |  SELECT source, score_milli,
       |    CASE WHEN score_milli >= 90000 THEN 'A_very_easy'
       |         WHEN score_milli >= 60000 THEN 'B_standard'
       |         WHEN score_milli >= 30000 THEN 'C_difficult'
       |         ELSE 'D_very_difficult' END AS band
       |  FROM sc)
       |SELECT source, band, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(score_milli) AS BIGINT) AS sum_milli,
       |  CAST(MIN(score_milli) AS BIGINT) AS min_milli,
       |  CAST(MAX(score_milli) AS BIGINT) AS max_milli
       |FROM b GROUP BY 1, 2 ORDER BY source, band""".stripMargin
  // ------------------------------------------------------------------
  // `q_ctfidf` (X220): class-based TF-IDF term ranking
  // ------------------------------------------------------------------

  /** Top terms reported per class. */
  val CtfidfTopK = 5

  /** `q_ctfidf`: CLASS-based TF-IDF — X25 ranks terms against documents;
    * this ranks them against CLASSES (all docs of a language pooled into
    * one pseudo-document), the c-TF-IDF trick topic-labeling pipelines
    * use to name a cluster by what distinguishes it from the other
    * clusters, not what is merely frequent in it. Score = class term
    * frequency × (n_classes / class-df), kept RATIONAL-EXACT: the
    * per-mille scaled score is tf·n_classes·1000 ÷ class_df in integral
    * division, so the ranking (and its tiebreaks) hash-gates without a
    * single float. Per class: top CtfidfTopK terms, fully tiebroken
    * (score desc, term asc).
    *
    * Scale shape: one explode → (class, term) aggregate (map-side
    * combined, vocab-bounded output), one vocab-bounded class-df
    * aggregate joined back, one class-partitioned rank window over
    * vocab-bounded rows. The corpus-sized work is exactly the X24/X25
    * token pass. */
  def ctfidfQ(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // tf feeds three branches (class-df, class count, the scored join) —
    // materialized so the corpus explode runs ONCE (multi-consumer rule);
    // everything after it is vocab-bounded
    val tf = graft.engine.Materialize.diskBacked(
      Tables.documents(spark, sfDir)
        .select(col("lang"), explode(graft.engine.Text.words).as("w"))
        .groupBy(col("lang"), col("w"))
        .agg(Num.countStar.as("tf")))
    val cdf = tf.groupBy(col("w")).agg(Num.countStar.as("class_df"))
    // class count as a 1-row broadcast, not a construction-time job
    val nc = tf.select(col("lang")).distinct()
      .agg(Num.countStar.as("n_classes"))
    val rank = Window.partitionBy(col("lang"))
      .orderBy(col("score_permille").desc, col("w").asc)
    tf.join(cdf, Seq("w"))
      .crossJoin(broadcast(nc))
      .withColumn("score_permille",
        Num.divLong(col("tf") * col("n_classes") * 1000L, col("class_df")))
      .withColumn("rnk", row_number().over(rank))
      .filter(col("rnk") <= CtfidfTopK)
      .select(col("lang"), col("rnk").cast("long").as("rnk"), col("w"),
        col("tf"), col("class_df"), col("score_permille"))
      .orderBy(col("lang"), col("rnk"))
  }

  val ctfidfOracle: String =
    s"""WITH tf AS (
       |  SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS tf
       |  FROM (SELECT lang, unnest($wordsSql) AS w FROM documents)
       |  GROUP BY 1, 2),
       |cdf AS (
       |  SELECT w, CAST(COUNT(*) AS BIGINT) AS class_df FROM tf GROUP BY 1),
       |nc AS (SELECT COUNT(DISTINCT lang) AS n FROM tf),
       |scored AS (
       |  SELECT tf.lang, tf.w, tf.tf, cdf.class_df,
       |    tf.tf * nc.n * 1000 // cdf.class_df AS score_permille
       |  FROM tf JOIN cdf USING (w), nc),
       |r AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
       |    ORDER BY score_permille DESC, w ASC) AS rnk
       |  FROM scored)
       |SELECT lang, CAST(rnk AS BIGINT) AS rnk, w, tf, class_df,
       |  CAST(score_permille AS BIGINT) AS score_permille
       |FROM r WHERE rnk <= ${CtfidfTopK}
       |ORDER BY lang, rnk""".stripMargin
  // ------------------------------------------------------------------
  // `q_lang_confusion` (X223): multi-class confusion matrix for X7
  // ------------------------------------------------------------------

  /** `q_lang_confusion`: the MULTI-CLASS evaluation closing the loop on
    * X7's language identifier — X198 grades the binary purchase scorer;
    * real corpus routing is multi-class, and its operational artifact is
    * the CONFUSION MATRIX: which languages leak into which, with
    * per-actual recall and per-predicted precision as exact per-mille.
    * Built as a pure rollup over X7's own per-doc output (one
    * definition of the predictor — a drifted reimplementation here
    * would be an eval of the wrong model), with the two marginals as
    * window sums over the (langs × langs)-bounded matrix.
    *
    * Scale shape: the predictor pass is X7's narrow per-doc work; the
    * matrix and both marginals are label-domain-bounded. */
  def langConfusionQ(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = langIdQ(spark, sfDir)
      .groupBy(col("actual_lang"), col("predicted_lang"))
      .agg(Num.countStar.as("n"))
    cells
      .withColumn("actual_total",
        sum(col("n")).over(Window.partitionBy(col("actual_lang"))))
      .withColumn("pred_total",
        sum(col("n")).over(Window.partitionBy(col("predicted_lang"))))
      .select(col("actual_lang"), col("predicted_lang"), col("n"),
        Num.divLong(col("n") * 1000, col("actual_total"))
          .as("recall_permille"),
        Num.divLong(col("n") * 1000, col("pred_total"))
          .as("precision_permille"))
      .orderBy(col("actual_lang"), col("predicted_lang"))
  }

  val langConfusionOracle: String =
    s"""WITH pred AS ($langIdOracle),
       |cells AS (
       |  SELECT actual_lang, predicted_lang, CAST(COUNT(*) AS BIGINT) AS n
       |  FROM pred GROUP BY 1, 2),
       |m AS (
       |  SELECT *,
       |    CAST(SUM(n) OVER (PARTITION BY actual_lang) AS BIGINT)
       |      AS actual_total,
       |    CAST(SUM(n) OVER (PARTITION BY predicted_lang) AS BIGINT)
       |      AS pred_total
       |  FROM cells)
       |SELECT actual_lang, predicted_lang, n,
       |  n * 1000 // actual_total AS recall_permille,
       |  n * 1000 // pred_total AS precision_permille
       |FROM m ORDER BY actual_lang, predicted_lang""".stripMargin
  // ------------------------------------------------------------------
  // `q_diversity` (X224): Simpson diversity of the language mix
  // ------------------------------------------------------------------

  /** `q_diversity`: SIMPSON DIVERSITY of each source's language mix —
    * the corpus-health companion to X121's Shannon entropy that stays
    * RATIONAL-EXACT: Simpson's index is Σpᵢ² = Σnᵢ²/n², so both the
    * homogeneity (per-million) and its inverse — the EFFECTIVE NUMBER
    * of languages, the number a mixing dashboard actually shows — are
    * one integral division each, no log and no float anywhere. A source
    * feeding one language scores homogeneity 1e6 / effective 1000
    * (per-mille); a uniform 6-way mix scores ~167k / ~6000. Dominant
    * language and its share ride along, fully tiebroken.
    *
    * Scale shape: one (source × lang)-bounded aggregate off the scan,
    * then arithmetic on the bounded frame — the X22 fan-out discipline
    * with nothing data-sized after the first fold. */
  def diversityQ(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byLang = Tables.documents(spark, sfDir)
      .groupBy(col("source"), col("lang"))
      .agg(Num.countStar.as("n_l"))
    val top = Window.partitionBy(col("source"))
      .orderBy(col("n_l").desc, col("lang").asc)
    byLang
      .withColumn("rn", row_number().over(top))
      .groupBy(col("source"))
      .agg(sum(col("n_l")).as("n_docs"),
        Num.countStar.as("n_langs"),
        sum(col("n_l") * col("n_l")).as("sum_sq"),
        min(when(col("rn") === 1, col("lang"))).as("dominant_lang"),
        min(when(col("rn") === 1, col("n_l"))).as("dominant_n"))
      .select(col("source"), col("n_docs"), col("n_langs"),
        Num.divLong(col("sum_sq") * 1000000L,
          col("n_docs") * col("n_docs")).as("simpson_ppm"),
        Num.divLong(col("n_docs") * col("n_docs") * 1000L, col("sum_sq"))
          .as("effective_langs_permille"),
        col("dominant_lang"),
        Num.divLong(col("dominant_n") * 1000L, col("n_docs"))
          .as("dominant_share_permille"))
      .orderBy(col("source"))
  }

  val diversityOracle: String =
    """WITH bl AS (
      |  SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n_l
      |  FROM documents GROUP BY 1, 2),
      |r AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY source
      |    ORDER BY n_l DESC, lang ASC) AS rn
      |  FROM bl),
      |g AS (
      |  SELECT source, CAST(SUM(n_l) AS BIGINT) AS n_docs,
      |    CAST(COUNT(*) AS BIGINT) AS n_langs,
      |    CAST(SUM(n_l * n_l) AS BIGINT) AS sum_sq,
      |    MIN(CASE WHEN rn = 1 THEN lang END) AS dominant_lang,
      |    CAST(MIN(CASE WHEN rn = 1 THEN n_l END) AS BIGINT) AS dominant_n
      |  FROM r GROUP BY 1)
      |SELECT source, n_docs, n_langs,
      |  sum_sq * 1000000 // (n_docs * n_docs) AS simpson_ppm,
      |  n_docs * n_docs * 1000 // sum_sq AS effective_langs_permille,
      |  dominant_lang,
      |  dominant_n * 1000 // n_docs AS dominant_share_permille
      |FROM g ORDER BY source""".stripMargin

  // `q_bpe_train` (X246 family): byte-pair-encoding merge training

  /** Number of BPE merge rounds trained (each emits one merge rule). */
  val BpeRounds = 3
  /** Fixed replace passes per merge. One string `replace` pass merges
    * left-to-right non-overlapping occurrences OF THE ORIGINAL string,
    * so a chain "a b a b" resolves over multiple passes (occurrences at
    * least halve per pass); 16 passes cover chains to 2^16 symbols —
    * far past any alnum token. BOTH engines run exactly this many
    * passes with the same left-to-right scan, so they produce identical
    * intermediate strings, not merely an identical fixpoint. */
  val BpeMergePasses = 16

  /** `q_bpe_train` (X248): BYTE-PAIR-ENCODING merge training — the
    * tokenizer-training loop itself, run as a Spark job (X128 counts
    * one round's pair statistics; X66 ENCODES with a fixed vocab; this
    * TRAINS the merges, the artifact `merges.txt` every BPE tokenizer
    * ships). Standard formulation: training runs on the word-frequency
    * table, never the raw corpus — one data-sized groupBy(word) fold,
    * then every round is vocab-bounded. Each word starts as its
    * space-joined character sequence with sentinel spaces; per round:
    * (1) adjacent-pair counts weighted by word frequency, (2) argmax
    * pair (count desc, then lexicographic — fully deterministic),
    * (3) corpus-wide merge of that pair via BpeMergePasses identical
    * left-to-right string-replace passes (see there). The gated
    * artifact: per round, the merge rule, its pair count, and the
    * total symbol count after the merge — compression-per-merge made
    * visible, the curve a tokenizer team reads to pick vocab size.
    *
    * Scale: the ONLY data-sized work is the word-count fold (two-phase,
    * map-side combined). Rounds iterate driver-side but each step is a
    * job over the vocabulary frame (≤ a few million rows at any corpus
    * size — bounded by the language, not the data); disk-backed
    * between rounds so round r+1's plan doesn't re-derive r's 16
    * replaces. The argmax is a TakeOrderedAndProject (top-1), never a
    * full sort. */
  def bpeTrainQ(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.engine.Materialize
    val symsOf = filter(split(col("sym"), " "), s => s =!= "")
    val vocab0 = Materialize.diskBacked(
      Tables.documents(spark, sfDir)
        .select(explode(graft.engine.Text.words).as("word"))
        .groupBy(col("word")).agg(Num.countStar.as("cnt"))
        .select(concat(lit(" "),
          regexp_replace(col("word"), "(.)", "$1 ")).as("sym"), col("cnt")))
    def bestPair(v: DataFrame): DataFrame =
      v.select(col("cnt"), symsOf.as("ss"))
        .filter(size(col("ss")) >= 2)
        .select(col("cnt"), explode(transform(
          sequence(lit(1), size(col("ss")) - 1),
          i => struct(element_at(col("ss"), i).as("a"),
            element_at(col("ss"), i + 1).as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("cnt")).as("pair_count"))
        .orderBy(col("pair_count").desc, col("a"), col("b"))
        .limit(1)
    def merged(v: DataFrame, best: DataFrame): DataFrame = {
      val joined = v.crossJoin(broadcast(best))
      (1 to BpeMergePasses).foldLeft(joined) { (d, _) =>
        d.withColumn("sym", call_function("replace", col("sym"),
          concat(lit(" "), col("a"), lit(" "), col("b"), lit(" ")),
          concat(lit(" "), col("a"), col("b"), lit(" "))))
      }.select(col("sym"), col("cnt"))
    }
    var v = vocab0
    val rounds = (1 to BpeRounds).map { r =>
      val best = Materialize.diskBacked(bestPair(v))
      v = Materialize.diskBacked(merged(v, best))
      val st = v.agg(sum(size(symsOf) * col("cnt")).as("syms_total"))
      best.crossJoin(broadcast(st))
        .select(lit(r.toLong).as("round"), col("a"), col("b"),
          col("pair_count"), col("syms_total"))
    }
    rounds.reduce(_ unionAll _).orderBy(col("round"))
  }

  val bpeTrainOracle: String = {
    val wordsSql = graft.engine.Text.wordsSql
    def mergeExpr(sym: String): String =
      (1 to BpeMergePasses).foldLeft(sym) { (e, _) =>
        s"replace($e, ' ' || b.a || ' ' || b.b || ' ', ' ' || b.a || b.b || ' ')"
      }
    def round(r: Int): String =
      s"""s$r AS (
         |  SELECT cnt, list_filter(string_split(sym, ' '), x -> x <> '')
         |    AS syms
         |  FROM v${r - 1}),
         |pr$r AS (
         |  SELECT cnt, syms, unnest(range(1, len(syms))) AS i FROM s$r),
         |p$r AS (
         |  SELECT syms[i] AS a, syms[i + 1] AS b,
         |    CAST(SUM(cnt) AS BIGINT) AS pair_count
         |  FROM pr$r GROUP BY 1, 2),
         |b$r AS (
         |  SELECT a, b, pair_count FROM p$r
         |  ORDER BY pair_count DESC, a, b LIMIT 1),
         |v$r AS (
         |  SELECT ${mergeExpr("v.sym")} AS sym, v.cnt
         |  FROM v${r - 1} v, b$r b),
         |st$r AS (
         |  SELECT CAST(SUM(cnt * len(list_filter(string_split(sym, ' '),
         |    x -> x <> ''))) AS BIGINT) AS syms_total
         |  FROM v$r)""".stripMargin
    val selects = (1 to BpeRounds).map { r =>
      s"""SELECT CAST($r AS BIGINT) AS round, a, b, pair_count, syms_total
         |FROM b$r, st$r""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH wc AS (
       |  SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
       |    SELECT unnest($wordsSql) AS word FROM documents)
       |  GROUP BY 1),
       |v0 AS (
       |  SELECT ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') AS sym, cnt
       |  FROM wc),
       |${(1 to BpeRounds).map(round).mkString(",\n")}
       |$selects
       |ORDER BY round""".stripMargin
  }
}

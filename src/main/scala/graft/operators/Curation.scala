package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.{Num, Tables}

/** Corpus-curation operators (SURVEY.md §2.11) — the canonical pre-training
  * quartet a 100 TB data pipeline runs after dedup: deterministic
  * train/val/test splitting, eval-set decontamination, repetition (Gopher-
  * style) quality metrics, and pattern redaction. All are pure Column
  * programs or bounded broadcast joins; nothing all-pairs, nothing
  * collected to the driver.
  */
object Curation {

  /** Split fractions by hash bucket (out of 100): [0,80) train, [80,90)
    * val, rest test. */
  val TrainPct = 80
  val ValPct = 90

  /** `q_split`: deterministic train/val/test assignment by content-stable
    * hash of the document key — the property that matters at scale is that
    * the split is a PURE FUNCTION of the key (reshuffles, re-runs, and
    * late-arriving shards land identically; no sampled state to persist).
    * One narrow map + one 3-group aggregate. */
  def splitQ(spark: SparkSession, sfDir: String): DataFrame = {
    val bucket = pmod(
      conv(substring(md5(concat(lit("s"), col("doc_id"))), 1, 15), 16, 10)
        .cast("long"), lit(100))
    Tables.documents(spark, sfDir)
      .select(
        when(bucket < TrainPct, "train")
          .when(bucket < ValPct, "val")
          .otherwise("test").as("split"),
        col("n_chars"))
      .groupBy(col("split"))
      .agg(Num.countStar.as("n_docs"), sum(col("n_chars")).as("total_chars"))
      .select(col("split"), col("n_docs"),
        col("total_chars").cast("long").as("total_chars"))
      .orderBy(col("split"))
  }

  val splitOracle: String =
    s"""SELECT
       |  CASE WHEN b < ${TrainPct} THEN 'train'
       |       WHEN b < ${ValPct} THEN 'val' ELSE 'test' END AS split,
       |  COUNT(*) AS n_docs,
       |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
       |FROM (SELECT n_chars,
       |        CAST(concat('0x', substr(md5('s' || doc_id),1,15)) AS BIGINT)
       |          % 100 AS b
       |      FROM documents)
       |GROUP BY 1 ORDER BY split""".stripMargin

  /** Eval-set membership predicate (doc_id % EvalMod == 0) — stands in for
    * "the benchmark suite" at harness scale. */
  val EvalMod = 97

  /** `q_decontaminate`: n-gram decontamination — flag every corpus document
    * sharing a 3-shingle with the eval set, with the shared-shingle count.
    * The eval shingle set is distinct-hashed and BROADCAST (eval suites are
    * bounded — MB-scale — regardless of corpus size); the corpus side is
    * the same hashed-shingle postings stream the ngram dedup uses, so the
    * whole check is one broadcast semi-join + one groupBy on doc_id. This
    * is how you decontaminate 100 TB against a benchmark: never join
    * corpus×corpus, always corpus×(small eval index). */
  def decontaminateQ(spark: SparkSession, sfDir: String): DataFrame = {
    // Materialized for the same two reasons as Dedup.materialize: the frame
    // feeds both join branches (no cross-branch subtree reuse), and without
    // a plan break CollapseProject inlines the words array into every
    // element_at lambda of the pushed-down explode precondition — the
    // shingle filter then recomputes split(lower(text)) PER ELEMENT,
    // turning the scan quadratic (measured 25 s vs 1.5 s at sf0.1).
    val sh = graft.engine.Materialize.diskBacked(
      Dedup.shingled(Tables.documents(spark, sfDir)))
    val evalSet = sh.filter(col("doc_id") % EvalMod === 0)
      .select(explode(col("sg")).as("s")).distinct()
    sh.filter(col("doc_id") % EvalMod =!= 0)
      .select(col("doc_id"), explode(col("sg")).as("s"))
      .join(broadcast(evalSet), Seq("s"))
      .groupBy(col("doc_id"))
      .agg(Num.countStar.as("n_hits"))
      .orderBy(col("doc_id"))
  }

  val decontaminateOracle: String =
    s"""WITH ${Dedup.shingleCteSql},
       |eval AS (
       |  SELECT DISTINCT unnest(sg) AS s FROM sh WHERE doc_id % ${EvalMod} = 0),
       |corpus AS (
       |  SELECT doc_id, unnest(sg) AS s FROM sh WHERE doc_id % ${EvalMod} <> 0)
       |SELECT doc_id, COUNT(*) AS n_hits
       |FROM corpus JOIN eval USING (s)
       |GROUP BY 1 ORDER BY doc_id""".stripMargin

  /** Cross-engine-safe 4-decimal rounding (same construction as
    * TextAnalysis.round4 — identical double expression on both engines). */
  private def round4(c: org.apache.spark.sql.Column) =
    floor(c * 10000.0 + 0.5) / 10000.0

  /** `q_repetition`: Gopher-style repetition metrics per document —
    * duplicate-word fraction and duplicate-3-gram fraction (1 − distinct/
    * total). High values mark boilerplate/templated text for downpweighting
    * or removal. Narrow Column work only; docs with <3 words drop out with
    * the shingle path. */
  def repetitionQ(spark: SparkSession, sfDir: String): DataFrame = {
    val ws = graft.engine.Text.words
    val sg = transform(sequence(lit(1), size(col("ws")) - 2), i =>
      concat_ws(" ", element_at(col("ws"), i), element_at(col("ws"), i + 1),
        element_at(col("ws"), i + 2)))
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), ws.as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col("doc_id"), col("ws"), sg.as("sg"))
      .select(col("doc_id"),
        size(col("ws")).as("n_words"),
        round4(lit(1.0) - size(array_distinct(col("ws"))).cast("double")
          / size(col("ws"))).as("dup_word_ratio"),
        round4(lit(1.0) - size(array_distinct(col("sg"))).cast("double")
          / size(col("sg"))).as("dup_shingle_ratio"))
      .orderBy(col("doc_id"))
  }

  val repetitionOracle: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
      |                w -> w <> '') AS ws
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, ws,
      |    list_transform(range(1, len(ws)-1),
      |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) AS sg
      |  FROM t WHERE len(ws) >= 3)
      |SELECT doc_id,
      |  len(ws) AS n_words,
      |  floor((1.0 - CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws))
      |        * 10000.0 + 0.5) / 10000.0 AS dup_word_ratio,
      |  floor((1.0 - CAST(len(list_distinct(sg)) AS DOUBLE) / len(sg))
      |        * 10000.0 + 0.5) / 10000.0 AS dup_shingle_ratio
      |FROM s ORDER BY doc_id""".stripMargin

  /** `q_redact`: pattern redaction over the event props payload — numeric
    * identifiers masked, with a per-row redaction count (the PII-scrub
    * shape: same plan with SSN/email/phone alternations in the pattern).
    * Pure codegen'd Column work — regexp_replace replaces all occurrences
    * on both engines (DuckDB needs the 'g' flag). */
  val RedactPattern = "[0-9]+"

  def redactQ(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("event_id"),
        regexp_replace(col("props"), RedactPattern, "#").as("redacted"),
        size(regexp_extract_all(col("props"), lit(RedactPattern), lit(0)))
          .as("n_redactions"))
      .orderBy(col("event_id"))

  val redactOracle: String =
    s"""SELECT event_id,
       |  regexp_replace(props, '${RedactPattern}', '#', 'g') AS redacted,
       |  len(regexp_extract_all(props, '${RedactPattern}')) AS n_redactions
       |FROM events ORDER BY event_id""".stripMargin

  /** `q_sample_stratified`: deterministic per-stratum downsampling — each
    * label keeps a DIFFERENT fraction ((label+1)·50‰ here, i.e. rebalancing
    * toward rare classes / downweighting over-represented sources), decided
    * by a content-stable hash of the row key. Like q_split, membership is a
    * PURE FUNCTION of the key: re-runs, reshuffles, and late shards sample
    * identically with no persisted RNG state, and the filter is a narrow
    * codegen'd map evaluated AT THE SCAN (no shuffle at all) — the only way
    * sampling stays exactly reproducible over 100 TB. */
  val SamplePerMille = 50

  def sampleStratifiedQ(spark: SparkSession, sfDir: String): DataFrame = {
    val h = pmod(
      conv(substring(md5(concat(lit("p"), col("vec_id"))), 1, 15), 16, 10)
        .cast("long"), lit(1000))
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"))
      .filter(h < (col("label") + 1) * SamplePerMille)
      .orderBy(col("vec_id"))
  }

  val sampleStratifiedOracle: String =
    s"""SELECT vec_id, label FROM embeddings
       |WHERE CAST(concat('0x', substr(md5('p' || vec_id),1,15)) AS BIGINT)
       |        % 1000 < (label + 1) * ${SamplePerMille}
       |ORDER BY vec_id""".stripMargin

  /** Context-window token budget for sequence packing. */
  val PackBudget = 1024
  /** Packing shards — each worker packs its own shard independently. */
  val PackShards = 8

  /** `q_pack_sequences`: greedy sequence packing — documents are laid
    * end-to-end in key order and cut into context-window bins of
    * PackBudget tokens (the pre-training batch-construction step: bin =
    * which context window a document starts in). Packing is a running
    * token-count cumsum, so it is SEQUENTIAL per packing unit; the scale
    * shape is to pack per SHARD (doc_id % PackShards) — each shard is one
    * window partition, packed independently and in parallel, which is
    * exactly how a 1000-executor packer works (a single global order would
    * serialize on one reducer). Token counts are clamped ≥ 1 (an empty doc
    * still occupies a slot), keeping the cumsum positive. One shuffle on
    * shard; the bin aggregate reuses the same partitioning. */
  def packSequencesQ(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ws = graft.engine.Text.words
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), (col("doc_id") % PackShards).as("shard"),
        greatest(size(ws), lit(1)).cast("long").as("toks"))
      .withColumn("cum", sum(col("toks")).over(w))
      // bin = context window the document STARTS in (start offset = cum-toks)
      .withColumn("bin", expr(s"(cum - toks) div $PackBudget"))
      .groupBy(col("shard"), col("bin"))
      .agg(Num.countStar.as("n_docs"),
        sum(col("toks")).as("bin_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy(col("shard"), col("bin"))
  }

  val packSequencesOracle: String =
    s"""WITH t AS (
       |  SELECT doc_id, doc_id % ${PackShards} AS shard,
       |    greatest(len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
       |      w -> w <> '')), 1) AS toks
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, shard, toks,
       |    CAST(SUM(toks) OVER (PARTITION BY shard ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
       |  FROM t)
       |SELECT shard, (cum - toks) // ${PackBudget} AS bin, COUNT(*) AS n_docs,
       |  CAST(SUM(toks) AS BIGINT) AS bin_tokens,
       |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
       |FROM c GROUP BY 1, 2 ORDER BY shard, bin""".stripMargin

  /** Deterministic stand-in for the erasure-request list: every
    * 1-in-ForgetMod-th user has asked to be forgotten. */
  val ForgetMod = 37

  /** `q_forget`: right-to-be-forgotten propagation — the compliance pass a
    * training-data pipeline must run BEFORE extraction: given an erasure
    * list, remove every event of the listed users and report, per
    * downstream partition (event_type), exactly what changed
    * (rows before / erased / after, users erased) so the rebuild can
    * target only touched partitions instead of rewriting the corpus.
    *
    * Shape: the erasure list is dim-sized → broadcast; the fact side is
    * ONE scan with the membership flag computed inline (a broadcast
    * LEFT SEMI twin via conditional aggregation — erased and retained
    * counted in the same two-phase aggregate, no second pass, no join
    * output materialized). At 100 TB the report drives partition-slice
    * rewrites (D1's overwrite) of only the touched slices. */
  def forgetQ(spark: SparkSession, sfDir: String): DataFrame = {
    val erased = col("user_id") % ForgetMod === 0
    Tables.events(spark, sfDir)
      .select(col("event_type"), col("user_id"), erased.as("gone"))
      .groupBy(col("event_type"))
      .agg(Num.countStar.as("rows_before"),
        sum(when(col("gone"), 1L).otherwise(0L)).cast("long").as("rows_erased"),
        sum(when(!col("gone"), 1L).otherwise(0L)).cast("long").as("rows_after"),
        countDistinct(when(col("gone"), col("user_id"))).as("users_erased"))
      .orderBy(col("event_type"))
  }

  val forgetOracle: String =
    s"""SELECT event_type,
       |  COUNT(*) AS rows_before,
       |  CAST(SUM(CASE WHEN user_id % ${ForgetMod} = 0 THEN 1 ELSE 0 END)
       |       AS BIGINT) AS rows_erased,
       |  CAST(SUM(CASE WHEN user_id % ${ForgetMod} = 0 THEN 0 ELSE 1 END)
       |       AS BIGINT) AS rows_after,
       |  CAST(COUNT(DISTINCT CASE WHEN user_id % ${ForgetMod} = 0
       |       THEN user_id END) AS BIGINT) AS users_erased
       |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin

  /** Per-source document quota. */
  val DomainCapK = 10

  /** `q_domain_cap`: per-domain quota subsampling — the pretraining-mix
    * balancing pass that caps any one source's contribution: each source
    * keeps its DomainCapK best documents by a deterministic priority
    * (longest first, doc_id tiebreak), so no domain can dominate the mix.
    *
    * Same semantics as `ROW_NUMBER() OVER (PARTITION BY source ORDER BY
    * n_chars DESC, doc_id)` ≤ K — but NOT computed that way: a giant
    * source would funnel through one reducer. Instead the
    * histogram-rank decomposition (the `q_window_analytics` NTILE trick):
    * a (source, n_chars) count histogram gives each length its global
    * rank offset over the distinct-length frame (domain-bounded, then
    * broadcast back), and a row_number within (source, n_chars) — fine
    * partitions — completes the exact rank. The quota filter then drops
    * everything below the cut before any further stage sees it. */
  def domainCapQ(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byLenDesc = Window.partitionBy(col("source"))
      .orderBy(col("n_chars").desc)
    val docs = Tables.documents(spark, sfDir)
      .select(col("source"), col("doc_id"), col("n_chars"))
    val hist = docs.groupBy(col("source"), col("n_chars"))
      .agg(Num.countStar.as("cnt"))
      .withColumn("cum_prev", sum(col("cnt")).over(byLenDesc) - col("cnt"))
      .select(col("source"), col("n_chars"), col("cum_prev"))
      // quota pre-prune: a length bucket whose offset is already past the
      // cap can't contribute a kept row — the broadcast stays ≤ K buckets
      // per source no matter how long the length tail is
      .filter(col("cum_prev") < DomainCapK)
    val byBucket = Window.partitionBy(col("source"), col("n_chars"))
      .orderBy(col("doc_id"))
    docs.join(broadcast(hist), Seq("source", "n_chars"))
      .withColumn("rnk", col("cum_prev") + row_number().over(byBucket))
      .filter(col("rnk") <= DomainCapK)
      .select(col("source"), col("doc_id"), col("n_chars"),
        col("rnk").cast("long").as("rnk"))
      .orderBy(col("source"), col("rnk"))
  }

  val domainCapOracle: String =
    s"""WITH r AS (
       |  SELECT source, doc_id, n_chars,
       |    ROW_NUMBER() OVER (PARTITION BY source
       |                       ORDER BY n_chars DESC, doc_id) AS rnk
       |  FROM documents)
       |SELECT source, doc_id, n_chars, rnk FROM r
       |WHERE rnk <= ${DomainCapK}
       |ORDER BY source, rnk""".stripMargin

  /** `q_mix_sources`: TEMPERATURE-WEIGHTED SOURCE MIXING — the data-mixture
    * step that decides how much of each source a pretraining run sees.
    * Raw-proportional sampling lets the biggest source drown the mixture;
    * the standard fix reweights source s ∝ n_s^α with α < 1 (α = 1/2 here,
    * the multilingual-sampling classic — smaller sources get upsampled
    * relative to their share).
    *
    * Everything near the gate is INTEGER: weight_s = floor(sqrt(n_s))
    * (sqrt of an integer-valued double is correctly rounded IEEE in both
    * engines, floor pins it), the budget split target_s =
    * (B·w_s) div Σw (exact bigint arithmetic — no float summation-order
    * hazard), and membership is the md5 per-mille hash rule from X42
    * (thresh_s = 1000·target_s div n_s), so the sampled set is a pure
    * function of (doc_id, thresholds) — stable across engines, reruns and
    * partitionings. Hash-proportion selection lands ~target_s rows rather
    * than exactly target_s; that is the scalable trade (an exact-count cut
    * would rank every source's rows — X75's machinery — for no training
    * benefit).
    *
    * Plan: one two-phase count per source (bounded frame), the allocation
    * arithmetic on that bounded frame (the Σw "grand total" window runs
    * over |sources| rows, not data), one broadcast join of thresholds back
    * onto the scan, one bounded rollup of the sampled set. */
  def mixSourcesQ(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("source"))
    val counts = docs.groupBy(col("source")).agg(Num.countStar.as("n_total"))
      .withColumn("w", floor(sqrt(col("n_total").cast("double"))).cast("long"))
    val allW = Window.partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    val alloc = counts
      .withColumn("sum_w", sum(col("w")).over(allW))
      .withColumn("sum_nt", sum(col("n_total")).over(allW))
      // target capped at the source's size: this op SELECTS (keeps at most
      // every row once, no replication), so an upsampled small source whose
      // α-share exceeds its row count delivers all its rows and the mixture
      // under-fills rather than silently over-sampling nothing — without
      // the cap the per-mille threshold would exceed 999 and quietly turn
      // the allocation into "take everything" with no visible signal.
      .withColumn("target",
        expr("least(((sum_nt div 2) * w) div sum_w, n_total)"))
      .withColumn("thresh", expr("(1000 * target) div n_total"))
      .select(col("source"), col("n_total"), col("w"), col("target"), col("thresh"))
    val h = pmod(
      conv(substring(md5(concat(lit("mix"), col("doc_id"))), 1, 15), 16, 10)
        .cast("long"), lit(1000))
    docs.join(broadcast(alloc), Seq("source"))
      .filter(h < col("thresh"))
      .groupBy(col("source"))
      .agg(max(col("n_total")).as("n_total"), max(col("w")).as("weight"),
        max(col("target")).as("target"), Num.countStar.as("n_sampled"))
      .orderBy(col("source"))
  }

  val mixSourcesOracle: String =
    """WITH c AS (
      |  SELECT source, COUNT(*) AS n_total,
      |    CAST(FLOOR(sqrt(CAST(COUNT(*) AS DOUBLE))) AS BIGINT) AS w
      |  FROM documents GROUP BY 1),
      |a AS (
      |  SELECT source, n_total, w,
      |    LEAST(CAST((CAST((SELECT SUM(n_total) FROM c) AS BIGINT) // 2) * w
      |      // CAST((SELECT SUM(w) FROM c) AS BIGINT) AS BIGINT), n_total)
      |      AS target
      |  FROM c),
      |t AS (
      |  SELECT source, n_total, w, target,
      |    CAST(1000 * target // n_total AS BIGINT) AS thresh
      |  FROM a)
      |SELECT d.source, MAX(t.n_total) AS n_total, MAX(t.w) AS weight,
      |  MAX(t.target) AS target, COUNT(*) AS n_sampled
      |FROM documents d JOIN t USING (source)
      |WHERE CAST(concat('0x', substr(md5('mix' || d.doc_id),1,15)) AS BIGINT)
      |        % 1000 < t.thresh
      |GROUP BY 1 ORDER BY d.source""".stripMargin

  /** PPS inclusion scale: p(doc) = n_chars / PpsDen. Chosen above the
    * corpus's max n_chars (577 at every sf) so every probability stays
    * < 1 and the length gradient is live across the whole corpus — a
    * doc twice as long is exactly twice as likely to be kept. */
  val PpsDen = 600L
  /** Hash-uniform domain for the inclusion draw (µ = micro-probability). */
  val PpsDomain = 1000000L

  /** X104 `q_pps_sample`: probability-proportional-to-size (Poisson/PPS)
    * sampling — the unequal-probability companion to X42's equal-rate
    * stratified sample. Long documents carry more of a pretraining
    * token budget than short ones; sampling docs UNIFORMLY under-weights
    * exactly the docs that matter. PPS keeps doc i with p_i ∝ its size
    * (here n_chars), which is the design that makes the Horvitz–Thompson
    * estimator Σ 1/p_i unbiased for corpus totals from the sample alone.
    *
    * Scale/determinism shape (the X31/X42 discipline): membership is a
    * PURE FUNCTION of the row — u(doc) = md5('pps'‖doc_id) mod 1e6,
    * keep iff u · PpsDen < n_chars · 1e6, all-BIGINT exact compare (no
    * float probability, no RNG state, no assignment table, no join).
    * Inclusion evaluates inline at the scan; re-running the extraction
    * reproduces the identical sample on any cluster. The report rolls up
    * drawn vs total count and weight-mass per source in ONE two-phase
    * aggregate, so the gate checks both the rule and that sampled weight
    * tracks p_i across every source. */
  def ppsSampleQ(spark: SparkSession, sfDir: String): DataFrame = {
    val u = pmod(
      conv(substring(md5(concat(lit("pps"), col("doc_id"))), 1, 15), 16, 10)
        .cast("long"), lit(PpsDomain))
    val keep = (u * PpsDen) < (col("n_chars") * PpsDomain)
    Tables.documents(spark, sfDir)
      .select(col("source"), col("n_chars"), keep.cast("long").as("k"))
      .groupBy(col("source"))
      .agg(Num.countStar.as("n_docs"),
        sum(col("n_chars")).as("w_total"),
        sum(col("k")).as("n_sampled"),
        sum(col("k") * col("n_chars")).as("w_sampled"))
      .orderBy(col("source"))
  }

  val ppsSampleOracle: String =
    s"""SELECT source, COUNT(*) AS n_docs,
       |  CAST(SUM(n_chars) AS BIGINT) AS w_total,
       |  CAST(SUM(CASE WHEN CAST(concat('0x', substr(md5('pps' || doc_id),1,15)) AS BIGINT)
       |        % ${PpsDomain} * ${PpsDen} < n_chars * ${PpsDomain}
       |      THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
       |  CAST(SUM(CASE WHEN CAST(concat('0x', substr(md5('pps' || doc_id),1,15)) AS BIGINT)
       |        % ${PpsDomain} * ${PpsDen} < n_chars * ${PpsDomain}
       |      THEN n_chars ELSE 0 END) AS BIGINT) AS w_sampled
       |FROM documents GROUP BY source ORDER BY source""".stripMargin

  /** Pseudonymization pepper. In production this is a managed secret,
    * rotated per policy; a literal here keeps the gate deterministic. */
  val TokenPepper = "pepper-2024"
  /** Token width in hex chars (64 bits — collision-safe to ~10^9 users). */
  val TokenHex = 16

  /** X110 `q_pseudonymize`: deterministic PII tokenization — the
    * governance transform between X34's redaction (destroys utility) and
    * X97's erasure (removes rows): user ids are replaced by
    * HMAC-style tokens substr(sha256(pepper ‖ id), 16 hex) that are (a)
    * irreversible without the pepper, (b) CONSISTENT — the same user maps
    * to the same token in every table tokenized with the same pepper, so
    * joins, sessionization, and per-user aggregation still work on the
    * pseudonymized copy, and (c) revocable wholesale by rotating the
    * pepper. Tokenization is a pure codegen'd scan expression — no
    * mapping table to secure, replicate, or join (a 10^9-row lookup table
    * is itself PII); the rollup gates the injectivity that consistency
    * relies on: per event_type, distinct tokens ≡ distinct raw users
    * (any collision would shrink n_tokens below n_users and break the
    * hash gate). */
  def pseudonymizeQ(spark: SparkSession, sfDir: String): DataFrame = {
    val token = substring(
      sha2(concat(lit(TokenPepper), col("user_id")), 256), 1, TokenHex)
    Tables.events(spark, sfDir)
      .select(col("event_type"), col("user_id"), token.as("tok"))
      .groupBy(col("event_type"))
      .agg(Num.countStar.as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        countDistinct(col("tok")).as("n_tokens"),
        min(col("tok")).as("first_token"))
      .orderBy(col("event_type"))
  }

  val pseudonymizeOracle: String =
    s"""SELECT event_type, COUNT(*) AS n_events,
       |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       |  CAST(COUNT(DISTINCT substr(sha256('${TokenPepper}' || user_id), 1,
       |    ${TokenHex})) AS BIGINT) AS n_tokens,
       |  MIN(substr(sha256('${TokenPepper}' || user_id), 1, ${TokenHex}))
       |    AS first_token
       |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin

  /** Fixed token capacity of one packed training sequence. */
  val PackCap = 2048L

  /** `q_seq_pack`: GLOBAL token-stream layout — the concat-and-chunk
    * assignment GPT-style pretraining uses: documents are laid out
    * end-to-end in ONE global token stream (doc_id order) and the stream
    * is cut at fixed `PackCap`-token boundaries; each document's
    * assignment is (start offset, first/last chunk, chunks spanned).
    * Complements `q_pack_sequences`, which packs greedy per-shard bins
    * (parallel but shard-local): here the offsets are a pure function of
    * the single global order — the layout a trainer needs when chunk ids
    * must be stable across reshuffles and documents may straddle chunk
    * boundaries — which per-shard windows cannot produce.
    *
    * Scale shape: the global running token offset is the textbook trap of
    * a single-partition `SUM OVER (ORDER BY ...)` window; instead it is
    * the shared scan primitive `engine/Scan.exclusivePrefix` with the
    * (+, 0) monoid — X103's carry machinery — two narrow passes over the
    * range-sorted (doc_id, n_tokens) frame, parallelism preserved at any
    * corpus width. Token counts reuse X6's BPE-ish `TokenRegex` so the
    * stream the packer cuts is the one the token-stats op measures.
    * Integer chunk math only (non-negative longs, floor division), so the
    * oracle's window form matches bit-for-bit. Zero-token docs are
    * excluded on both sides (they occupy no stream positions). */
  def seqPackQ(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val toks = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        size(regexp_extract_all(lower(col("text")),
          lit(TextAnalysis.TokenRegex), lit(0))).cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
    val nPart = spark.sessionState.conf.numShufflePartitions
    // persisted so both scan passes read identical blocks (Scan's contract)
    val sorted = toks.repartitionByRange(nPart, col("doc_id"))
      .sortWithinPartitions(col("doc_id"))
      .as[(Long, Long)]
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    spark.createDataset(
      graft.engine.Scan.exclusivePrefix[(Long, Long), Long](
        sorted.rdd, 0L, _._2, _ + _)
        .map { case (start, (id, n)) =>
          (id, n, start, start / PackCap, (start + n - 1) / PackCap)
        })
      .toDF("doc_id", "n_tokens", "start_tok", "first_chunk", "last_chunk")
      .withColumn("n_chunks", col("last_chunk") - col("first_chunk") + 1L)
      .orderBy(col("doc_id"))
  }

  val seqPackOracle: String =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    CAST(len(regexp_extract_all(lower(text),
       |      '${TextAnalysis.TokenRegex}')) AS BIGINT) AS n_tokens
       |  FROM documents),
       |pos AS (
       |  SELECT doc_id, n_tokens,
       |    CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS BIGINT) AS start_tok
       |  FROM toks WHERE n_tokens > 0)
       |SELECT doc_id, n_tokens, start_tok,
       |  start_tok // ${PackCap} AS first_chunk,
       |  (start_tok + n_tokens - 1) // ${PackCap} AS last_chunk,
       |  (start_tok + n_tokens - 1) // ${PackCap}
       |    - start_tok // ${PackCap} + 1 AS n_chunks
       |FROM pos ORDER BY doc_id""".stripMargin

  /** Number of length buckets per language for the batching report. */
  val LenBuckets = 8

  /** X123 `q_length_buckets`: length-bucketed batching report — assign
    * each document to one of [[LenBuckets]] equal-count buckets by length
    * within its language (ntile over (n_chars, doc_id) — the doc_id
    * tiebreak makes the tiling a pure function of the data), and report
    * per bucket the padding waste a fixed-shape batch of that bucket
    * would pay: max_len·count − sum_len, in exact integers. This is the
    * planning surface for length-grouped batching (the standard trick for
    * cutting padding FLOPs in training and batched inference): the waste
    * column quantifies what bucketing buys vs. one global batch shape.
    *
    * Scale shape: the window input is the (lang, n_chars, doc_id)
    * METADATA projection — 16 bytes/doc, not the corpus — so a per-lang
    * sort-window holds to corpus sizes where doc COUNT per language fits
    * a task's sort budget (~10⁹ docs/lang per task at 16 B/row); past
    * that, swap ntile for rank-over-histogram as q_percentiles does. */
  def lengthBucketsQ(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("n_chars"), col("doc_id"))
    Tables.documents(spark, sfDir)
      .select(col("lang"), col("n_chars"), col("doc_id"))
      .withColumn("bucket", ntile(LenBuckets).over(w))
      .groupBy(col("lang"), col("bucket"))
      .agg(Num.countStar.as("n_docs"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"),
        sum(col("n_chars")).as("sum_chars"),
        (max(col("n_chars")) * Num.countStar - sum(col("n_chars")))
          .as("pad_waste"))
      .orderBy(col("lang"), col("bucket"))
  }

  val lengthBucketsOracle: String =
    s"""WITH b AS (
       |  SELECT lang, n_chars,
       |    NTILE(${LenBuckets}) OVER (PARTITION BY lang
       |      ORDER BY n_chars, doc_id) AS bucket
       |  FROM documents)
       |SELECT lang, bucket, COUNT(*) AS n_docs,
       |  MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars,
       |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       |  CAST(MAX(n_chars) * COUNT(*) - SUM(n_chars) AS BIGINT) AS pad_waste
       |FROM b GROUP BY 1, 2 ORDER BY lang, bucket""".stripMargin

  /** Candidate slots drawn per user and negatives kept (slots > kept gives
    * headroom for candidates knocked out as true interactions). */
  val NegSlots = 8
  val NegKeep = 3

  /** X125 `q_negative_sample`: deterministic negative sampling for
    * recommender / contrastive training data — for every customer, draw
    * candidate items by content-stable hash, remove the ones the customer
    * actually interacted with (orders⋈lineitem), keep the first
    * [[NegKeep]] surviving slots. The properties that matter at 100 TB
    * are the same as X31's split: the sample is a PURE FUNCTION of
    * (user, slot) — re-runs, reshuffles and late shards reproduce it
    * bit-for-bit with no sampled state to persist — and the anti-join is
    * the ONLY data-sized operation (users × slots is bounded fan-out;
    * candidates join interactions key-partitioned).
    *
    * Duplicate candidates (two slots hashing to one item) collapse to
    * their first slot before ranking, so the kept set is always
    * [[NegKeep]] DISTINCT items per user (or fewer when the headroom
    * runs out). */
  def negativeSampleQ(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val maxPk = Tables.part(spark, sfDir).agg(max(col("p_partkey")).as("mpk"))
    val cand = pmod(
      conv(substring(md5(concat(lit("ns"), col("custkey"), lit("_"),
        col("slot"))), 1, 15), 16, 10).cast("long"),
      col("mpk")) + 1
    val candidates = Tables.customer(spark, sfDir)
      .select(col("c_custkey").as("custkey"))
      .crossJoin(broadcast(maxPk))
      .select(col("custkey"),
        explode(sequence(lit(1), lit(NegSlots))).as("slot"), col("mpk"))
      .select(col("custkey"), col("slot"), cand.as("cand"))
    val interactions = Tables.orders(spark, sfDir)
      .join(Tables.lineitem(spark, sfDir),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("custkey"), col("l_partkey").as("cand"))
    val w = Window.partitionBy(col("custkey")).orderBy(col("slot"))
    candidates
      .join(interactions, Seq("custkey", "cand"), "left_anti")
      .groupBy(col("custkey"), col("cand"))
      .agg(min(col("slot")).as("slot"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= NegKeep)
      .groupBy(col("custkey"))
      .agg(Num.countStar.as("n_neg"),
        array_join(transform(
          sort_array(collect_list(struct(col("slot"), col("cand")))),
          s => s.getField("cand").cast("string")), ",").as("neg_items"))
      .orderBy(col("custkey"))
  }

  val negativeSampleOracle: String =
    s"""WITH mx AS (SELECT MAX(p_partkey) AS mpk FROM part),
       |cand AS (
       |  SELECT c.c_custkey AS custkey, s.slot,
       |    CAST(concat('0x', substr(md5('ns' || c.c_custkey || '_' || s.slot),
       |      1, 15)) AS BIGINT) % mx.mpk + 1 AS cand
       |  FROM customer c, mx,
       |    (SELECT unnest(generate_series(1, ${NegSlots})) AS slot) s),
       |inter AS (
       |  SELECT DISTINCT o.o_custkey AS custkey, l.l_partkey AS cand
       |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
       |neg AS (
       |  SELECT custkey, cand, MIN(slot) AS slot
       |  FROM cand
       |  WHERE NOT EXISTS (SELECT 1 FROM inter i
       |    WHERE i.custkey = cand.custkey AND i.cand = cand.cand)
       |  GROUP BY 1, 2),
       |kept AS (
       |  SELECT custkey, cand, slot,
       |    ROW_NUMBER() OVER (PARTITION BY custkey ORDER BY slot) AS rnk
       |  FROM neg)
       |SELECT custkey, COUNT(*) AS n_neg,
       |  string_agg(CAST(cand AS VARCHAR), ',' ORDER BY slot) AS neg_items
       |FROM kept WHERE rnk <= ${NegKeep}
       |GROUP BY 1 ORDER BY custkey""".stripMargin

  // `q_kshot_sample`: exact-k per-class deterministic subset

  /** Items kept per label. */
  val KshotK = 5

  /** `q_kshot_sample`: EXACT-k per-class sampling — few-shot eval-set and
    * balanced-probe construction, where each class must contribute
    * exactly k items (X42's Bernoulli sampling gives a random-sized
    * fraction; this gives a fixed-size panel). Selection order is the
    * shared md5-prefix hash (X31's cross-engine convention) with id as
    * the total-order tiebreak, so the panel is a pure function of
    * (id, seed): re-runs, reshuffles, and engine choice all reproduce it
    * bit-for-bit, and adding non-panel items to the corpus never evicts a
    * selected one whose hash rank still clears k.
    *
    * Scale shape: the rank-limit filter compiles to WindowGroupLimit
    * (PlanSpec-guarded) — each input partition pre-prunes to its own
    * top-k per label BEFORE the exchange, so the per-label sort touches
    * ≤ k·partitions rows, never the label's full population — the same
    * map-side top-k that powers q_topk_per_group. */
  def kshotSampleQ(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = conv(substring(md5(concat(lit("k"), col("vec_id"))), 1, 15), 16, 10)
      .cast("long")
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"), h.as("h"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("label")).orderBy(col("h"), col("vec_id"))))
      .filter(col("rnk") <= KshotK)
      .select(col("label"), col("rnk").cast("long").as("rnk"), col("vec_id"))
      .orderBy(col("label"), col("rnk"))
  }

  val kshotSampleOracle: String =
    s"""SELECT label, CAST(rnk AS BIGINT) AS rnk, vec_id FROM (
       |  SELECT label, vec_id,
       |    ROW_NUMBER() OVER (PARTITION BY label
       |      ORDER BY CAST(concat('0x', substr(md5('k' || vec_id), 1, 15))
       |        AS BIGINT), vec_id) AS rnk
       |  FROM embeddings) t
       |WHERE rnk <= ${KshotK}
       |ORDER BY label, rnk""".stripMargin

  // `q_coherent_sample`: join-preserving universe sampling

  /** Kept fraction of the key universe, in percent. */
  val CoherentPct = 20

  /** `q_coherent_sample`: universe (coherent) sampling — hash the JOIN KEY
    * into [0,100) and keep the same slice on every table (the
    * BlinkDB/Quickr discipline for approximating joins): because both
    * sides keep exactly the customers whose key-hash lands under the
    * cutoff, the join of the samples IS the sample of the join — no
    * cross-table coordination, no foreign-key lookup, and the estimator
    * scales counts by one known inverse inclusion probability.
    * Independent per-table Bernoulli sampling destroys this (a kept
    * order's customer is dropped with probability 1-p).
    *
    * Scale shape: the hash predicate evaluates inside each scan's
    * projection (no shuffle, no sample table to join); the report joins
    * the two sampled sides on the shared key slice and compares the
    * scaled estimate against the true join count — the validation a
    * sampling pipeline ships alongside the estimator. All counts exact
    * ints; the estimate's one division is the only double. */
  def coherentSampleQ(spark: SparkSession, sfDir: String): DataFrame = {
    def keep(c: org.apache.spark.sql.Column) = pmod(
      conv(substring(md5(concat(lit("cs"), c)), 1, 15), 16, 10)
        .cast("long"), lit(100)) < CoherentPct
    val cust = Tables.customer(spark, sfDir)
      .filter(keep(col("c_custkey"))).select(col("c_custkey"))
    val ords = Tables.orders(spark, sfDir)
      .filter(keep(col("o_custkey")))
      .select(col("o_custkey"), col("o_totalprice"))
    val sampled = cust.join(ords, col("c_custkey") === col("o_custkey"))
      .agg(Num.countStar.as("joined_rows"),
        Num.sumMoney(col("o_totalprice")).as("joined_price"))
    val truth = Tables.customer(spark, sfDir).select(col("c_custkey"))
      .join(Tables.orders(spark, sfDir).select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"))
      .agg(Num.countStar.as("true_rows"))
    sampled.crossJoin(broadcast(truth))
      .select(col("joined_rows"), col("joined_price"),
        (col("joined_rows").cast("double") * lit(100.0) / lit(CoherentPct))
          .as("est_rows"),
        col("true_rows"))
  }

  val coherentSampleOracle: String =
    s"""WITH cust AS (
       |  SELECT c_custkey FROM customer
       |  WHERE CAST(concat('0x', substr(md5('cs' || c_custkey), 1, 15))
       |          AS BIGINT) % 100 < ${CoherentPct}),
       |ords AS (
       |  SELECT o_custkey, o_totalprice FROM orders
       |  WHERE CAST(concat('0x', substr(md5('cs' || o_custkey), 1, 15))
       |          AS BIGINT) % 100 < ${CoherentPct}),
       |s AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS joined_rows,
       |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
       |      AS joined_price
       |  FROM cust JOIN ords ON c_custkey = o_custkey),
       |t AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS true_rows
       |  FROM customer JOIN orders ON c_custkey = o_custkey)
       |SELECT joined_rows, joined_price,
       |  CAST(joined_rows AS DOUBLE) * 100.0 / ${CoherentPct} AS est_rows,
       |  true_rows
       |FROM s, t""".stripMargin

  // `q_kanon`: k-anonymity / l-diversity audit

  /** Anonymity threshold audited. */
  val KanonK = 5
  /** Diversity threshold audited (distinct sensitive values per class). */
  val KanonL = 3

  /** `q_kanon`: k-anonymity + l-diversity audit over the released view
    * (customer joined to nation) — the privacy gate beside X34 redaction,
    * X110 pseudonymization, and X97 erasure: BEFORE release, how many
    * quasi-identifier equivalence classes (nation × mktsegment) are
    * smaller than k (re-identifiable), and how many fail l-diversity on
    * the sensitive column (order priority — a class where everyone
    * shares the sensitive value leaks it even at size ≥ k)?
    *
    * Scale shape: one fact⋈dim⋈dim join chain folds straight to the
    * equivalence-class frame (bounded by the quasi-identifier domain,
    * |nation|·|segment| cells); the audit report is a second fold over
    * those cells. Exact integer counts end to end. */
  def kanonQ(spark: SparkSession, sfDir: String): DataFrame = {
    val classes = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, sfDir),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("c_mktsegment"))
      .agg(Num.countStar.as("class_size"),
        countDistinct(col("o_orderpriority")).as("n_sensitive"))
    classes.agg(
      Num.countStar.as("n_classes"),
      sum(when(col("class_size") < KanonK, 1L).otherwise(0L))
        .as("n_below_k"),
      sum(when(col("class_size") < KanonK, col("class_size"))
        .otherwise(0L)).as("n_rows_at_risk"),
      sum(when(col("n_sensitive") < KanonL, 1L).otherwise(0L))
        .as("n_below_l"),
      min(col("class_size")).as("min_class_size"))
  }

  val kanonOracle: String =
    s"""WITH cls AS (
       |  SELECT n_name, c_mktsegment, COUNT(*) AS class_size,
       |    COUNT(DISTINCT o_orderpriority) AS n_sensitive
       |  FROM orders
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN nation ON c_nationkey = n_nationkey
       |  GROUP BY 1, 2)
       |SELECT COUNT(*) AS n_classes,
       |  CAST(SUM(CASE WHEN class_size < ${KanonK} THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_below_k,
       |  CAST(SUM(CASE WHEN class_size < ${KanonK} THEN class_size
       |    ELSE 0 END) AS BIGINT) AS n_rows_at_risk,
       |  CAST(SUM(CASE WHEN n_sensitive < ${KanonL} THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_below_l,
       |  CAST(MIN(class_size) AS BIGINT) AS min_class_size
       |FROM cls""".stripMargin

  // `q_rand_response` (X234): local differential privacy by randomized
  // response, with the debiased aggregate and its accuracy audit

  /** Flip probability 1−p = 250‰ → report-truth probability p = 3/4,
    * i.e. per-report privacy ε = ln(p/(1−p)) = ln 3 — Warner's classic
    * dial. Flips draw from the engine-portable md5-uniform (the X200
    * bootstrap discipline), so both engines flip the same rows. */
  val RrFlipPermille = 250L

  /** `q_rand_response` (X234): LOCAL differential privacy — each row's
    * sensitive bit ("did this user purchase") is randomized BEFORE
    * aggregation (report truth w.p. 3/4, lie w.p. 1/4), so the collector
    * never holds a trustworthy per-user bit; the population rate is then
    * recovered by the unbiased inversion est = (n_yes − (1−p)·n)/(2p−1),
    * which at p = 3/4 is exactly (4·n_yes − n)/2 — kept as the ×2
    * integer `est_x2` so no fraction ever crosses the engine boundary.
    * The statistical leg of the privacy family: X110 pseudonymizes
    * identity, X34 redacts content, X166 audits k-anonymity, X97
    * forgets — this one makes the VALUES deniable while keeping the
    * aggregate usable, and reports its own accuracy (|est − truth|, the
    * noise floor a 1/√n mechanism pays) because a privacy mechanism
    * whose error nobody measures gets turned off the first time a
    * dashboard wobbles.
    *
    * Scale shape: one narrow pass (two md5 evaluations fused into the
    * scan projection) into a date-bounded aggregate — the mechanism
    * adds zero shuffles to the count it privatizes. */
  def randResponseQ(spark: SparkSession, sfDir: String): DataFrame = {
    val truth = when(col("event_type") === "purchase", 1L).otherwise(0L)
    val u = conv(substring(md5(concat(lit("rr"), col("event_id"))), 1, 15),
      16, 10).cast("long") % 1000L
    val flip = (u < RrFlipPermille).cast("long")
    Tables.events(spark, sfDir)
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"),
        truth.as("t"), flip.as("f"))
      .select(col("day"), col("t"),
        ((col("t") + col("f")) % 2L).as("r"))
      .groupBy(col("day"))
      .agg(Num.countStar.as("n"), sum(col("r")).as("n_yes"),
        sum(col("t")).as("true_pos"))
      .select(col("day"), col("n"), col("n_yes"),
        (col("n_yes") * 4L - col("n")).as("est_x2"), col("true_pos"),
        abs(col("n_yes") * 4L - col("n") - col("true_pos") * 2L)
          .as("err_x2"))
      .orderBy(col("day"))
  }

  val randResponseOracle: String =
    s"""WITH m AS (
       |  SELECT strftime(ts, '%Y-%m-%d') AS day,
       |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS t,
       |    CASE WHEN CAST(concat('0x', substr(md5('rr' || event_id), 1, 15))
       |      AS BIGINT) % 1000 < ${RrFlipPermille} THEN 1 ELSE 0 END AS f
       |  FROM events),
       |g AS (
       |  SELECT day, CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM((t + f) % 2) AS BIGINT) AS n_yes,
       |    CAST(SUM(t) AS BIGINT) AS true_pos
       |  FROM m GROUP BY 1)
       |SELECT day, n, n_yes, n_yes * 4 - n AS est_x2, true_pos,
       |  abs(n_yes * 4 - n - true_pos * 2) AS err_x2
       |FROM g ORDER BY day""".stripMargin

  // `q_waterfill` (X242): token-budget water-filling allocator

  /** Budget = total corpus tokens / this denominator. */
  val WaterfillBudgetDen = 2L

  /** `q_waterfill` (X242): WATER-FILLING allocation of a token budget
    * across sources — the mixture-design step after X95's recipe
    * mixing: given budget B (half the corpus here) and per-source token
    * supplies c_s, find the unique cap L such that taking
    * min(c_s, L) from every source spends the budget — small sources
    * keep everything, big sources are capped at the common level (the
    * max-min-fair allocation; proportional sampling would starve small
    * sources, a fixed per-source quota would waste headroom). The
    * level search is the exact-integer sorted walk: sources ascend by
    * supply, candidate level at step j is (B − P_{j−1}) div (n−j+1),
    * and the binding step is the FIRST whose own supply exceeds its
    * candidate level (none binding ⇒ budget covers everything, cap
    * −1). Every quantity is a Long; both engines take the identical
    * walk.
    *
    * Scale shape: one map-side-combined token count per source is the
    * only data-sized work; the walk runs on the |sources|-bounded frame
    * (the deliberately single-partition window of X235's global CDF).
    * The allocation artifact feeds X104/X42-style samplers as their
    * per-source quota. */
  def waterfillQ(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ws = graft.engine.Text.words
    val counts = graft.engine.Materialize.diskBacked(
      Tables.documents(spark, sfDir)
        .groupBy(col("source")).agg(sum(size(ws)).as("c")))
    val tot = counts.groupBy()
      .agg(sum(col("c")).as("tot"), Num.countStar.as("n"))
    val byC = Window.orderBy(col("c").asc, col("source").asc)
    val frame = counts.crossJoin(broadcast(tot))
      .withColumn("rn", row_number().over(byC).cast("long"))
      .withColumn("p_prev", coalesce(sum(col("c")).over(
        byC.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("l_cand", Num.divLong(
        Num.divLong(col("tot"), WaterfillBudgetDen) - col("p_prev"),
        col("n") - col("rn") + 1L))
      .withColumn("cond", col("c") > col("l_cand"))
    val jstar = frame.groupBy()
      .agg(min(when(col("cond"), col("rn"))).as("jstar"))
    val withJ = frame.crossJoin(broadcast(jstar))
    val level = withJ.groupBy()
      .agg(max(when(col("rn") === col("jstar"), col("l_cand"))).as("level"))
    withJ.crossJoin(broadcast(level))
      .select(col("source"), col("c").as("tokens"),
        when(col("jstar").isNull, col("c"))
          .otherwise(least(col("c"), col("level"))).as("alloc"),
        coalesce(col("level"), lit(-1L)).as("level"))
      .orderBy(col("source"))
  }

  val waterfillOracle: String = {
    val wordsSql = graft.engine.Text.wordsSql
    s"""WITH counts AS (
       |  SELECT source, CAST(SUM(len($wordsSql)) AS BIGINT) AS c
       |  FROM documents GROUP BY 1),
       |tot AS (
       |  SELECT CAST(SUM(c) AS BIGINT) AS tot,
       |    CAST(COUNT(*) AS BIGINT) AS n
       |  FROM counts),
       |f AS (
       |  SELECT counts.*, tot.tot, tot.n,
       |    CAST(ROW_NUMBER() OVER (ORDER BY c ASC, source ASC) AS BIGINT)
       |      AS rn,
       |    CAST(COALESCE(SUM(c) OVER (ORDER BY c ASC, source ASC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS BIGINT) AS p_prev
       |  FROM counts, tot),
       |g AS (
       |  SELECT *, (tot // ${WaterfillBudgetDen} - p_prev) // (n - rn + 1)
       |    AS l_cand
       |  FROM f),
       |j AS (SELECT MIN(CASE WHEN c > l_cand THEN rn END) AS jstar FROM g),
       |lv AS (
       |  SELECT MAX(CASE WHEN g.rn = j.jstar THEN g.l_cand END) AS level
       |  FROM g, j)
       |SELECT g.source, g.c AS tokens,
       |  CASE WHEN j.jstar IS NULL THEN g.c
       |       ELSE least(g.c, lv.level) END AS alloc,
       |  COALESCE(lv.level, -1) AS level
       |FROM g, j, lv
       |ORDER BY g.source""".stripMargin
  }

  // `q_boilerplate` (X238): cross-document repeated-passage audit

  /** Passage width (words) and the cross-document frequency at which a
    * passage counts as boilerplate. */
  val PassageWords = 8
  val BoilerplateMinDocs = 3

  /** `q_boilerplate` (X238): BOILERPLATE detection by cross-document
    * passage frequency — the curation step between exact dedup (X1:
    * whole docs) and near-dup (X2: mostly-similar docs): a corpus where
    * no two documents match can still be 30% navigation chrome, license
    * headers and cookie banners, because the REPEATED UNIT is the
    * passage, not the document (the CCNet/RefinedWeb line-dedup insight,
    * over fixed 8-word passages since this corpus has no line
    * structure). Every full passage is hashed per document, passage →
    * document-frequency is one aggregate, and a passage in ≥ 3 distinct
    * docs is boilerplate; the per-source readout (docs, passage
    * instances, boilerplate instances, per-mille ratio) is the
    * dashboard that decides whether a source needs passage-level
    * cleaning before it may enter training. Docs shorter than one full
    * passage carry no evidence and sit out (both engines filter
    * identically).
    *
    * Scale shape: the passage fan-out is ~n_words/8 rows per doc
    * (narrow, codegen'd slice+concat — no shuffle), the df aggregate
    * and the frequency join are the ONE data-sized shuffle pair (keyed
    * on passage text — at 100 TB the passage would be hashed to 64 bits
    * first, the X2 shingle discipline; text is kept here so the oracle
    * reads naturally), and the rollup is source-bounded. */
  def boilerplateQ(spark: SparkSession, sfDir: String): DataFrame = {
    val ws = graft.engine.Text.words
    val base = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), ws.as("ws"))
      .withColumn("nc",
        floor(size(col("ws")) / PassageWords).cast("int"))
      .filter(col("nc") >= 1)
    val passages = graft.engine.Materialize.diskBacked(
      base.select(col("doc_id"), col("source"),
        explode(transform(sequence(lit(0), col("nc") - 1),
          i => concat_ws(" ",
            slice(col("ws"), i * PassageWords + 1, lit(PassageWords)))))
          .as("p")))
    val freq = passages.groupBy(col("p"))
      .agg(countDistinct(col("doc_id")).as("df"))
    passages.join(freq, Seq("p"))
      .groupBy(col("source"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        Num.countStar.as("n_passages"),
        sum((col("df") >= BoilerplateMinDocs).cast("long"))
          .as("n_boilerplate"))
      .withColumn("boilerplate_pm",
        Num.divLong(col("n_boilerplate") * 1000L, col("n_passages")))
      .orderBy(col("source"))
  }

  val boilerplateOracle: String = {
    val wordsSql = graft.engine.Text.wordsSql
    val pw = PassageWords
    s"""WITH d AS (
       |  SELECT doc_id, source, $wordsSql AS ws FROM documents),
       |c AS (
       |  SELECT doc_id, source, len(ws) // $pw AS nc, ws
       |  FROM d WHERE len(ws) >= $pw),
       |p AS (
       |  SELECT doc_id, source,
       |    array_to_string(list_slice(ws, i * $pw + 1, i * $pw + $pw), ' ')
       |      AS p
       |  FROM c, UNNEST(range(0, nc)) AS u(i)),
       |f AS (
       |  SELECT p, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
       |  FROM p GROUP BY 1),
       |j AS (SELECT p.source, p.doc_id, f.df FROM p JOIN f USING (p))
       |SELECT source, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       |  CAST(COUNT(*) AS BIGINT) AS n_passages,
       |  CAST(SUM(CASE WHEN df >= ${BoilerplateMinDocs} THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_boilerplate,
       |  CAST(SUM(CASE WHEN df >= ${BoilerplateMinDocs} THEN 1 ELSE 0 END)
       |    AS BIGINT) * 1000
       |    // CAST(COUNT(*) AS BIGINT) AS boilerplate_pm
       |FROM j GROUP BY 1 ORDER BY source""".stripMargin
  }

  // `q_poststrat`: post-stratified estimation over the universe sample

  /** `q_poststrat`: post-stratified revenue estimation from X147's 20%
    * universe sample — the estimator a sampling pipeline actually ships:
    * within each customer stratum (mktsegment), scale the sampled
    * customers' revenue by N_h/n_h (known population counts over realized
    * sample counts), correcting the raw inverse-probability estimate for
    * the sample's per-stratum imbalance. The gated report carries the
    * truth column per stratum, so the artifact IS the estimator-quality
    * ledger. Coherence matters: the same key slice on customers and
    * orders (X147) means a sampled customer contributes ALL their orders
    * — independent per-table sampling would bias every stratum downward.
    *
    * Scale shape: ONE fact⋈dim join (orders⋈customer on custkey, the
    * engine's standard co-partitioned equi-join) aggregated to the
    * 5-row stratum frame with conditional sums; population/sample counts
    * fold off the dimension alone. Revenue exact cents in DECIMAL; the
    * N_h/n_h scaling is decimal-product-then-one-division; no float
    * enters before the last two columns. */
  def poststratQ(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    def keep(c: org.apache.spark.sql.Column) = pmod(
      conv(substring(md5(concat(lit("cs"), c)), 1, 15), 16, 10)
        .cast("long"), lit(100)) < CoherentPct
    val cents = (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
      .cast("long")
    val cust = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_mktsegment"),
        keep(col("c_custkey")).as("in_sample"))
    val counts = cust.groupBy(col("c_mktsegment"))
      .agg(Num.countStar.as("n_pop"),
        sum(when(col("in_sample"), 1L).otherwise(0L)).as("n_sampled"))
    val rev = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), cents.as("cents"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(sum(col("cents").cast(DecimalType(38, 0))).cast("long")
          .as("true_rev_cents"),
        sum(when(col("in_sample"), col("cents")).otherwise(0L)
          .cast(DecimalType(38, 0))).cast("long").as("sample_rev_cents"))
    counts.join(rev, Seq("c_mktsegment"))
      .select(col("c_mktsegment").as("segment"), col("n_pop"),
        col("n_sampled"), col("sample_rev_cents"), col("true_rev_cents"))
      .withColumn("est_rev_cents",
        (col("sample_rev_cents").cast(DecimalType(38, 0)) * col("n_pop"))
          .cast("double") / col("n_sampled").cast("double"))
      .withColumn("err",
        col("est_rev_cents") / col("true_rev_cents").cast("double") - 1.0)
      .orderBy(col("segment"))
  }

  val poststratOracle: String =
    s"""WITH cust AS (
       |  SELECT c_custkey, c_mktsegment,
       |    CAST(concat('0x', substr(md5('cs' || c_custkey), 1, 15))
       |      AS BIGINT) % 100 < ${CoherentPct} AS in_sample
       |  FROM customer),
       |counts AS (
       |  SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_pop,
       |    CAST(SUM(CASE WHEN in_sample THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_sampled
       |  FROM cust GROUP BY 1),
       |rev AS (
       |  SELECT c_mktsegment,
       |    CAST(SUM(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
       |      AS BIGINT) AS DECIMAL(38,0))) AS BIGINT) AS true_rev_cents,
       |    CAST(SUM(CAST(CASE WHEN in_sample
       |      THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
       |      ELSE 0 END AS DECIMAL(38,0))) AS BIGINT) AS sample_rev_cents
       |  FROM orders JOIN cust ON o_custkey = c_custkey
       |  GROUP BY 1)
       |SELECT c_mktsegment AS segment, n_pop, n_sampled, sample_rev_cents,
       |  true_rev_cents,
       |  CAST(CAST(sample_rev_cents AS DECIMAL(38,0)) * n_pop AS DOUBLE)
       |    / CAST(n_sampled AS DOUBLE) AS est_rev_cents,
       |  CAST(CAST(sample_rev_cents AS DECIMAL(38,0)) * n_pop AS DOUBLE)
       |    / CAST(n_sampled AS DOUBLE) / CAST(true_rev_cents AS DOUBLE)
       |    - 1.0 AS err
       |FROM counts JOIN rev USING (c_mktsegment)
       |ORDER BY segment""".stripMargin
  // ------------------------------------------------------------------
  // `q_quality_waterfall` (X189): first-fail filter-rule accounting
  // ------------------------------------------------------------------

  /** Waterfall bounds — integer cross-multiplied at compare time so the
    * thresholds are exact on both engines. */
  val WfMinWords = 16
  val WfMaxWords = 95
  val WfMeanLenMaxTenths = 48 // mean word length ≤ 4.8 chars
  val WfMinStopwords = 1

  /** `q_quality_waterfall`: Gopher/C4-style quality filtering as a
    * WATERFALL — ordered rules, each document charged to the FIRST rule
    * that rejects it, with per-rule kill counts, corpus share, and the
    * cumulative survivor count after each stage. X9 (`q_quality_score`)
    * scores documents; a production cleaning pipeline additionally needs
    * this accounting form — "which rule costs how much corpus" is what a
    * data engineer tunes against (the published C4/Gopher/RefinedWeb
    * pipelines all report exactly this waterfall), and charging to the
    * first failing rule makes the stages sum to the corpus, unlike
    * per-rule independent counts that double-bill a doc failing two
    * rules.
    *
    * Rules (ordered): too_short (< 16 words), too_long (> 95),
    * mean_word_len (> 4.8 chars/word — templated/codey text),
    * low_stopword (< 1 of the corpus stopwords: function-word absence =
    * non-prose). Every ratio compare is integer cross-multiplied
    * (chars·10 > 48·words; never a double threshold), so the gate is
    * exact cross-engine.
    *
    * Scale shape: ONE narrow codegen pass computes all rule inputs per
    * doc (no shuffle until the final rules-bounded groupBy), the
    * waterfall CASE is a per-row expression, and the output is
    * |rules|+1 rows — the cumulative column comes from a window over
    * that bounded frame, not the data. */
  def qualityWaterfallQ(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ws = graft.engine.Text.words
    val nWords = size(col("ws")).cast("long")
    val nChars = aggregate(transform(col("ws"), w => length(w)),
      lit(0L), (acc, x) => acc + x)
    val nStop = size(filter(col("ws"),
      w => w.isin(graft.operators.TextAnalysis.Stopwords: _*))).cast("long")
    val outcome = when(nWords < WfMinWords, "1_too_short")
      .when(nWords > WfMaxWords, "2_too_long")
      .when(nChars * 10 > nWords * WfMeanLenMaxTenths, "3_mean_word_len")
      .when(nStop < WfMinStopwords, "4_low_stopword")
      .otherwise("5_pass")
    val total = Tables.documents(spark, sfDir)
      .agg(Num.countStar.as("n_total"))
    val byStage = Window.orderBy(col("outcome"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), ws.as("ws"))
      .select(outcome.as("outcome"), nWords.as("nw"))
      .groupBy(col("outcome"))
      .agg(Num.countStar.as("n_docs"), sum(col("nw")).as("n_words_total"))
      .crossJoin(broadcast(total))
      .withColumn("pct_of_corpus",
        floor(col("n_docs") * 1000000.0 / col("n_total") + 0.5) / 10000.0)
      .withColumn("killed_so_far",
        sum(when(col("outcome") =!= "5_pass", col("n_docs"))
          .otherwise(lit(0L))).over(byStage))
      .select(col("outcome"), col("n_docs"), col("n_words_total"),
        col("pct_of_corpus"),
        (col("n_total") - col("killed_so_far")).as("survivors_after"))
      .orderBy(col("outcome"))
  }

  val qualityWaterfallOracle: String = {
    val stopIn = graft.operators.TextAnalysis.Stopwords
      .map(s => s"'$s'").mkString(", ")
    val wordsSql = graft.engine.Text.wordsSql
    s"""WITH d AS (
       |  SELECT doc_id, $wordsSql AS ws FROM documents),
       |m AS (
       |  SELECT doc_id, CAST(len(ws) AS BIGINT) AS nw,
       |    CAST(list_reduce(list_prepend(0, list_transform(ws,
       |      w -> length(w))), (a, b) -> a + b) AS BIGINT) AS nc,
       |    CAST(len(list_filter(ws, w -> w IN ($stopIn))) AS BIGINT)
       |      AS nstop
       |  FROM d),
       |o AS (
       |  SELECT CASE
       |    WHEN nw < ${WfMinWords} THEN '1_too_short'
       |    WHEN nw > ${WfMaxWords} THEN '2_too_long'
       |    WHEN nc * 10 > nw * ${WfMeanLenMaxTenths} THEN '3_mean_word_len'
       |    WHEN nstop < ${WfMinStopwords} THEN '4_low_stopword'
       |    ELSE '5_pass' END AS outcome, nw
       |  FROM m),
       |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM o),
       |g AS (
       |  SELECT outcome, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(nw) AS BIGINT) AS n_words_total
       |  FROM o GROUP BY 1)
       |SELECT outcome, n_docs, n_words_total,
       |  floor(n_docs * 1000000.0 / n_total + 0.5) / 10000.0
       |    AS pct_of_corpus,
       |  n_total - CAST(SUM(CASE WHEN outcome <> '5_pass' THEN n_docs
       |    ELSE 0 END) OVER (ORDER BY outcome
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |    AS survivors_after
       |FROM g, t ORDER BY outcome""".stripMargin
  }
  // ------------------------------------------------------------------
  // `q_shard_assign` (X190): deterministic training-shard assignment
  // ------------------------------------------------------------------

  val ShardCount = 16

  /** `q_shard_assign`: the WRITE side of a training run — deal the corpus
    * into [[ShardCount]] shards by a salted content-independent hash of
    * the document key and account each shard's budget (docs, tokens,
    * chars) plus its per-mille deviation from the mean token load. The
    * deviation column is what a data engineer actually reads: a skewed
    * shard stalls the trailing data-parallel rank every epoch, so "how
    * unbalanced is the deal" must be part of the artifact, not a
    * separate query. Hash-dealing (vs round-robin) keeps assignment
    * STABLE under corpus append — adding documents never moves an
    * existing one (the property that lets shard-level dedup/packing
    * caches survive incremental rebuilds).
    *
    * Scale: one narrow pass computes (shard, tokens, chars) per doc, one
    * |shards|-bounded aggregate, and the mean joins back as a broadcast
    * 1-row frame. Deterministic cross-engine by the md5/conv salt idiom
    * (X31's split discipline); deviation is integer per-mille via
    * divLong, never a double ratio. */
  def shardAssignQ(spark: SparkSession, sfDir: String): DataFrame = {
    val ws = graft.engine.Text.words
    val shard = pmod(
      conv(substring(md5(concat(lit("shard"), col("doc_id"))), 1, 15), 16, 10)
        .cast("long"), lit(ShardCount.toLong))
    val perDoc = Tables.documents(spark, sfDir)
      .select(shard.as("shard"),
        size(ws).cast("long").as("nw"),
        length(col("text")).cast("long").as("nc"))
    val shards = perDoc.groupBy(col("shard"))
      .agg(Num.countStar.as("n_docs"), sum(col("nw")).as("n_tokens"),
        sum(col("nc")).as("n_chars"))
    val mean = shards.agg(
      sum(col("n_tokens")).as("tok_total"),
      Num.countStar.as("n_shards"))
    shards.crossJoin(broadcast(mean))
      .select(col("shard"), col("n_docs"), col("n_tokens"), col("n_chars"),
        // |n_tokens·n_shards − tok_total| · 1000 / tok_total, floored —
        // exact integer per-mille deviation from the mean token load
        Num.divLong(
          abs(col("n_tokens") * col("n_shards") - col("tok_total")) * 1000,
          col("tok_total")).as("dev_permille"))
      .orderBy(col("shard"))
  }

  val shardAssignOracle: String = {
    val wordsSql = graft.engine.Text.wordsSql
    s"""WITH d AS (
       |  SELECT CAST(concat('0x', substr(md5('shard' || CAST(doc_id AS
       |      VARCHAR)), 1, 15)) AS BIGINT) % ${ShardCount} AS shard,
       |    CAST(len($wordsSql) AS BIGINT) AS nw,
       |    CAST(length(text) AS BIGINT) AS nc
       |  FROM documents),
       |g AS (
       |  SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(nw) AS BIGINT) AS n_tokens,
       |    CAST(SUM(nc) AS BIGINT) AS n_chars
       |  FROM d GROUP BY 1),
       |t AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS tok_total,
       |  CAST(COUNT(*) AS BIGINT) AS n_shards FROM g)
       |SELECT shard, n_docs, n_tokens, n_chars,
       |  abs(n_tokens * n_shards - tok_total) * 1000 // tok_total
       |    AS dev_permille
       |FROM g, t ORDER BY shard""".stripMargin
  }

  // ------------------------------------------------------------------
  // `q_ngram_novelty` (X191): first-occurrence novelty curve
  // ------------------------------------------------------------------

  /** `q_ngram_novelty`: per document (in doc_id ingestion order), the
    * fraction of its distinct 3-gram shingles NEVER seen in any earlier
    * document — the novelty curve data-mixing work reads to decide when a
    * source is mined out (novelty → 0 means additional documents only
    * repeat the prefix corpus; the published dedup/mixing pipelines
    * track exactly this saturation signal). Reported as a per-mille
    * integer so the gate is exact.
    *
    * Scale shape: novelty-by-first-occurrence looks sequential but
    * reduces to one aggregate + one join: each shingle's FIRST owner is
    * min(doc_id) over its postings (map-side-combined), and a doc's
    * novel count is how many of those minima land on it. No per-prefix
    * rescans, no window over the corpus — the 100 TB form is two
    * shuffles on the shingle key and one on the doc key. */
  def ngramNoveltyQ(spark: SparkSession, sfDir: String): DataFrame = {
    val sh = graft.engine.Materialize.diskBacked(
      graft.operators.Dedup.shingled(Tables.documents(spark, sfDir)))
    val postings = sh.select(col("doc_id"), explode(col("sg")).as("s"))
    val firstOwner = postings.groupBy(col("s"))
      .agg(min(col("doc_id")).as("first_doc"))
    val novel = firstOwner.groupBy(col("first_doc").as("doc_id"))
      .agg(Num.countStar.as("n_novel"))
    sh.select(col("doc_id"), size(col("sg")).cast("long").as("n_shingles"))
      .join(novel, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"))
      .withColumn("novelty_permille",
        Num.divLong(col("n_novel") * 1000, col("n_shingles")))
      .orderBy(col("doc_id"))
  }

  val ngramNoveltyOracle: String =
    s"""WITH ${graft.operators.Dedup.shingleCteSql},
       |postings AS (SELECT doc_id, unnest(sg) AS s FROM sh),
       |fo AS (SELECT s, MIN(doc_id) AS first_doc FROM postings GROUP BY 1),
       |novel AS (
       |  SELECT first_doc AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_novel
       |  FROM fo GROUP BY 1)
       |SELECT sh.doc_id, CAST(len(sh.sg) AS BIGINT) AS n_shingles,
       |  COALESCE(n.n_novel, 0) AS n_novel,
       |  COALESCE(n.n_novel, 0) * 1000 // len(sh.sg) AS novelty_permille
       |FROM sh LEFT JOIN novel n ON n.doc_id = sh.doc_id
       |ORDER BY sh.doc_id""".stripMargin
  // ------------------------------------------------------------------
  // `q_temporal_split` (X201): time-based split + leakage audit
  // ------------------------------------------------------------------

  /** Split boundary: events strictly before this date train, the rest
    * test — pinned so the oracle shares it. */
  val TemporalSplitDate = "2024-01-22"

  /** `q_temporal_split`: the TIME-based train/test split — the split
    * X31's hash split must NOT be used for when the model will be asked
    * about the future (a hash split leaks tomorrow into training; every
    * forecasting/recsys eval protocol splits on time instead) — plus the
    * LEAKAGE AUDIT that has to ship with it: how many users span both
    * sides (their test rows are partially memorable from training — the
    * entity-overlap statistic an honest eval reports), and each side's
    * volume/user/value profile. One pass classifies rows against the
    * pinned boundary; the span audit is a per-user two-sided flag fold
    * (map-side combined) re-aggregated to one row per split — nothing
    * data-sized after the first fold.
    *
    * Output: per split (train/test): n_events, n_users, value_cents,
    * n_spanning_users (identical on both rows — the overlap is a
    * property of the PAIR), span_pct_permille of that side's users. */
  def temporalSplitQ(spark: SparkSession, sfDir: String): DataFrame = {
    val side = when(to_date(col("ts")) < lit(TemporalSplitDate).cast("date"),
      "train").otherwise("test")
    val cents = floor(col("value") * 100).cast("long")
    val ev = Tables.events(spark, sfDir)
      .select(side.as("split"), col("user_id"), cents.as("c"))
    val perUser = ev.groupBy(col("user_id"))
      .agg(max(when(col("split") === "train", 1L).otherwise(0L)).as("in_tr"),
        max(when(col("split") === "test", 1L).otherwise(0L)).as("in_te"))
    val spanning = perUser
      .agg(sum(col("in_tr") * col("in_te")).as("n_spanning_users"))
    ev.groupBy(col("split"))
      .agg(Num.countStar.as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("c")).as("value_cents"))
      .crossJoin(broadcast(spanning))
      .withColumn("span_pct_permille",
        Num.divLong(col("n_spanning_users") * 1000, col("n_users")))
      .orderBy(col("split").desc) // train before test
  }

  val temporalSplitOracle: String =
    s"""WITH ev AS (
       |  SELECT CASE WHEN CAST(ts AS DATE) < DATE '${TemporalSplitDate}'
       |      THEN 'train' ELSE 'test' END AS split,
       |    user_id, CAST(FLOOR(value * 100) AS BIGINT) AS c
       |  FROM events),
       |pu AS (
       |  SELECT user_id,
       |    MAX(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS in_tr,
       |    MAX(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS in_te
       |  FROM ev GROUP BY 1),
       |sp AS (
       |  SELECT CAST(SUM(in_tr * in_te) AS BIGINT) AS n_spanning_users
       |  FROM pu),
       |g AS (
       |  SELECT split, CAST(COUNT(*) AS BIGINT) AS n_events,
       |    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       |    CAST(SUM(c) AS BIGINT) AS value_cents
       |  FROM ev GROUP BY 1)
       |SELECT split, n_events, n_users, value_cents, sp.n_spanning_users,
       |  sp.n_spanning_users * 1000 // n_users AS span_pct_permille
       |FROM g, sp ORDER BY split DESC""".stripMargin
  // ------------------------------------------------------------------
  // `q_curation_pipeline` (X214): end-to-end training-data export
  // ------------------------------------------------------------------

  /** Minimum word count a kept document needs, and the export shard
    * count. */
  val CurMinWords = 10
  val CurShards = 4

  /** `q_curation_pipeline`: the training-data EXPORT pipeline as one
    * gated composition — the flow every corpus team runs nightly:
    * language filter (keep `en`) -> quality floor (>= CurMinWords
    * tokenizer words) -> EXACT dedup (md5(text) groups, min doc_id
    * survives, the X1 discipline) -> token accounting -> deterministic
    * hash sharding (md5-hash60 mod CurShards, the X190 assignment made
    * content-addressed) -> per-shard manifest rollup (docs, tokens, id
    * checksum). One gate proves the STAGES COMPOSE: a filter applied in
    * the wrong order (dedup before language filter changes survivors),
    * a tokenizer fork, or a shard function drift each moves the hash.
    * Every stage is the production-shaped primitive already gated alone
    * (X7/X9/X1/X6/X190); this is the assembled artifact a user ships.
    *
    * Scale shape: narrow per-doc work + one dedup aggregate on the text
    * hash + one shard-bounded rollup; nothing pairwise, nothing
    * collected. */
  def curationPipelineQ(spark: SparkSession, sfDir: String): DataFrame = {
    val words = graft.engine.Text.words
    val kept = Tables.documents(spark, sfDir)
      .filter(col("lang") === "en")
      .select(col("doc_id"), col("text"), size(words).cast("long").as("n_tokens"))
      .filter(col("n_tokens") >= CurMinWords)
    val deduped = kept
      .groupBy(md5(col("text")).as("th"))
      .agg(min(col("doc_id")).as("doc_id"), max(col("n_tokens")).as("n_tokens"))
    deduped
      .select(col("doc_id"), col("n_tokens"),
        pmod(conv(substring(md5(concat(lit("shard_"),
          col("doc_id").cast("string"))), 1, 15),
          16, 10).cast("long"), lit(CurShards.toLong)).as("shard"))
      .groupBy(col("shard"))
      .agg(Num.countStar.as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(col("doc_id")).as("id_checksum"))
      .orderBy(col("shard"))
  }

  val curationPipelineOracle: String =
    s"""WITH kept AS (
       |  SELECT doc_id, text,
       |    CAST(len(${graft.engine.Text.wordsSql}) AS BIGINT) AS n_tokens
       |  FROM documents
       |  WHERE lang = 'en'
       |    AND len(${graft.engine.Text.wordsSql}) >= ${CurMinWords}),
       |dd AS (
       |  SELECT MIN(doc_id) AS doc_id, MAX(n_tokens) AS n_tokens
       |  FROM kept GROUP BY md5(text)),
       |sh AS (
       |  SELECT doc_id, n_tokens,
       |    CAST(concat('0x', substr(md5('shard_' || doc_id), 1, 15))
       |      AS BIGINT) % ${CurShards} AS shard
       |  FROM dd)
       |SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       |  CAST(SUM(doc_id) AS BIGINT) AS id_checksum
       |FROM sh GROUP BY 1 ORDER BY shard""".stripMargin

  // `q_dp_release` (X249): central-DP noisy release by the discrete
  // Laplace mechanism

  /** Per-mille PMF of the discrete Laplace (two-sided geometric) with
    * ε = ln 2 — P(z) = (1/3)(1/2)^|z|, quantized so the 17 cells over
    * z ∈ [−8, 8] sum to exactly 1000 (the 3‰ quantization residue
    * lands on z = 0: 333 → 336; ε accounting treats the mechanism as
    * standard, the perturbation is < 1% of any cell). Index 0 ↔ z=−8. */
  val DpLadderPm: Seq[Long] =
    Seq(1L, 3L, 5L, 10L, 21L, 42L, 83L, 167L, 336L,
      167L, 83L, 42L, 21L, 10L, 5L, 3L, 1L)
  /** Cumulative per-mille thresholds: draw u < DpCdfPm(i) ⇒ z = i − 8. */
  val DpCdfPm: Seq[Long] = DpLadderPm.scanLeft(0L)(_ + _).tail

  /** `q_dp_release` (X249): CENTRAL differential privacy — the other
    * half of the privacy-mechanism pair (X234 randomizes each ROW
    * before collection; this trusts the aggregator and noises the
    * released AGGREGATE, the deployment model of every public-stats DP
    * release): per-day purchase counts get one discrete-Laplace draw
    * (ε = ln 2 per released cell; counts have sensitivity 1 under
    * add/remove-one-event) via the md5-uniform per-mille pushed
    * through the pinned integer CDF ladder — the X200 bootstrap
    * discipline, so BOTH engines draw the identical noise and the
    * randomized release hash-gates bit-exact. The discrete mechanism
    * (two-sided geometric) is the production choice over continuous
    * Laplace precisely because integers survive exact engines — the
    * same reason the US Census moved to discrete noise. The artifact
    * carries the true count beside the release (this is the
    * mechanism's accuracy AUDIT, not a real release) and the global
    * mean |noise| in millis — the utility line a DP dashboard pins.
    *
    * Scale: one narrow filtered pass to the day-bounded frame; the
    * draw and ladder are per-CELL work (one md5 on the day string),
    * free at any volume. */
  def dpReleaseQ(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(Num.countStar.as("n_true"))
    val u = conv(substring(md5(concat(lit("dp"), col("day"))), 1, 15),
      16, 10).cast("long") % 1000L
    val z = DpCdfPm.zipWithIndex.init.foldRight(
      lit(8L): org.apache.spark.sql.Column) { case ((t, i), acc) =>
      when(u < t, lit(i.toLong - 8L)).otherwise(acc)
    }
    val noised = daily.select(col("day"), col("n_true"), z.as("z"))
      .withColumn("n_released", col("n_true") + col("z"))
      .withColumn("abs_err", abs(col("z")))
    val mae = noised.agg(
      Num.divLong(sum(col("abs_err")) * 1000L, Num.countStar)
        .as("mae_millis"))
    noised.crossJoin(broadcast(mae)).orderBy(col("day"))
  }

  val dpReleaseOracle: String = {
    val cases = DpCdfPm.zipWithIndex.init
      .map { case (t, i) => s"WHEN u < $t THEN ${i - 8}" }.mkString(" ")
    s"""WITH daily AS (
       |  SELECT strftime(ts, '%Y-%m-%d') AS day,
       |    CAST(COUNT(*) AS BIGINT) AS n_true
       |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
       |d AS (
       |  SELECT day, n_true,
       |    CAST(concat('0x', substr(md5('dp' || day), 1, 15)) AS BIGINT)
       |      % 1000 AS u
       |  FROM daily),
       |n AS (
       |  SELECT day, n_true,
       |    CAST(CASE $cases ELSE 8 END AS BIGINT) AS z
       |  FROM d),
       |w AS (
       |  SELECT day, n_true, z, n_true + z AS n_released, abs(z) AS abs_err
       |  FROM n),
       |m AS (
       |  SELECT CAST(SUM(abs_err) AS BIGINT) * 1000 // COUNT(*)
       |    AS mae_millis FROM w)
       |SELECT day, n_true, z, n_released, abs_err, m.mae_millis
       |FROM w, m ORDER BY day""".stripMargin
  }
}

package graft.queries

import org.apache.spark.sql.functions._
import Q._
import Tables._

/** Text-analysis operators over the `documents` table — the
  * oracle-checkable slice of the training-data pipeline (the
  * non-SQL-expressible ones — MinHash/SimHash/LSH — live in
  * graft.operators and register rows-only checks).
  *
  * All token logic is single-space/whitespace-regex based and written
  * identically on the Spark and DuckDB sides; ratios are per-row double
  * arithmetic (deterministic, no accumulation-order issues).
  */
object TextQueries {

  private val stopwords = Seq("the", "a", "and", "of", "to", "in", "is")
  private def sqlStopList = stopwords.map(w => s"'$w'").mkString("[", ", ", "]")

  /** Whitespace token counting (BPE-ish regex split), per document. */
  val tx1Tokens = Q(
    "tx1_token_count",
    (s, d) =>
      documents(s, d)
        .select(col("doc_id"),
          size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"),
          length(col("text")).cast("long").as("n_chars_measured"))
        .orderBy(col("doc_id")),
    sql = Some("""
      SELECT doc_id,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
               AS n_tokens,
             CAST(length(text) AS BIGINT) AS n_chars_measured
      FROM documents
      ORDER BY doc_id"""))

  /** Corpus rollup per language: doc counts and exact char totals. */
  val tx2LangStats = Q(
    "tx2_lang_stats",
    (s, d) =>
      documents(s, d)
        .groupBy(col("lang"))
        .agg(cnt.as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          (sum(col("n_chars")).cast("double") / count(lit(1)))
            .as("avg_chars"))
        .orderBy(col("lang")),
    sql = Some("""
      SELECT lang, COUNT(*) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS total_chars,
             CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
      FROM documents
      GROUP BY lang
      ORDER BY lang"""))

  /** Exact deduplication by full-text equality: keep-first (min doc_id)
    * per distinct text — the hash-groupBy dedup primitive. At scale the
    * groupBy key would be a 128-bit text hash, not the text itself; both
    * shuffle once on the key.
    */
  val tx3ExactDedup = Q(
    "tx3_exact_dedup",
    (s, d) =>
      documents(s, d)
        .groupBy(col("text"))
        .agg(min(col("doc_id")).as("keep_id"), cnt.as("n_copies"))
        .select(col("keep_id"), col("n_copies"))
        .orderBy(col("keep_id")),
    sql = Some("""
      SELECT CAST(MIN(doc_id) AS BIGINT) AS keep_id, COUNT(*) AS n_copies
      FROM documents
      GROUP BY text
      ORDER BY keep_id"""),
    bench = true)

  /** Heuristic quality scoring: token count, mean token length, and
    * stopword ratio per document — pure per-row arithmetic.
    */
  val tx4Quality = Q(
    "tx4_quality_score",
    (s, d) => {
      val toks = split(trim(col("text")), "\\s+")
      val nTok = size(toks).cast("double")
      val nStop = size(filter(toks,
        t => array_contains(lit(stopwords.toArray), t))).cast("double")
      documents(s, d)
        .select(col("doc_id"),
          nTok.cast("long").as("n_tokens"),
          (length(col("text")).cast("double") / nTok).as("mean_tok_span"),
          (nStop / nTok).as("stopword_ratio"))
        .orderBy(col("doc_id"))
    },
    sql = Some(s"""
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             CAST(length(text) AS DOUBLE) / len(toks) AS mean_tok_span,
             CAST(len(list_filter(toks, t -> list_contains($sqlStopList, t)))
               AS DOUBLE) / len(toks) AS stopword_ratio
      FROM (SELECT doc_id, text,
                   regexp_split_to_array(trim(text), '\\s+') AS toks
            FROM documents) t
      ORDER BY doc_id"""))

  /** Document fingerprinting via md5 (content-hash identity — the
    * exact-dedup key at scale). Rolling-hash / SimHash fingerprints are
    * in graft.operators.TextDedup.
    */
  val tx5Fingerprint = Q(
    "tx5_md5_fingerprint",
    (s, d) =>
      documents(s, d)
        .select(col("doc_id"), md5(col("text")).as("fingerprint"))
        .orderBy(col("doc_id")),
    sql = Some("""
      SELECT doc_id, md5(text) AS fingerprint
      FROM documents
      ORDER BY doc_id"""))

  /** Per-source × lang contingency counts (data-mix reporting). */
  val tx6SourceMix = Q(
    "tx6_source_mix",
    (s, d) =>
      documents(s, d)
        .groupBy(col("source"), col("lang"))
        .agg(cnt.as("n_docs"))
        .orderBy(col("source"), col("lang")),
    sql = Some("""
      SELECT source, lang, COUNT(*) AS n_docs
      FROM documents
      GROUP BY source, lang
      ORDER BY source, lang"""))

  /** Heuristic language-ID (stopword profiles, argmax with
    * lexicographic tie-break) vs the labeled lang column.
    */
  val tx7LangId = Q(
    "tx7_langid",
    (s, d) => {
      import graft.operators.TextAnalysisOps
      documents(s, d)
        .select(col("doc_id"), col("lang").as("labeled"),
          TextAnalysisOps.langId(col("text")).as("predicted"),
          round(array_max(TextAnalysisOps.langScores(col("text"))), 6)
            .as("score"))
        .orderBy(col("doc_id"))
    },
    sql = {
      import graft.operators.TextAnalysisOps.stopwordProfiles
      val langsArr = stopwordProfiles.map(p => s"'${p._1}'")
        .mkString("[", ", ", "]")
      val scoresArr = stopwordProfiles.map { case (_, words) =>
        val list = words.map(w => s"'$w'").mkString("[", ", ", "]")
        s"""CAST(len(list_filter(toks, t -> list_contains($list, t)))
              AS DOUBLE) / len(toks)"""
      }.mkString("[", ",\n               ", "]")
      Some(s"""
      WITH t AS (
        SELECT doc_id, lang AS labeled,
               regexp_split_to_array(trim(text), '\\s+') AS toks
        FROM documents),
      scored AS (
        SELECT doc_id, labeled, $scoresArr AS scores
        FROM t)
      SELECT doc_id, labeled,
             ($langsArr)[list_position(scores, list_max(scores))]
               AS predicted,
             ROUND(list_max(scores), 6) AS score
      FROM scored
      ORDER BY doc_id""")
    })

  /** Token-window chunking with overlap (size 32, stride 24) — the
    * LLM-pipeline chunker; chunks identified by content hash.
    */
  val tx8Chunking = Q(
    "tx8_chunking",
    (s, d) =>
      graft.operators.ChunkingOps.chunk(documents(s, d), "doc_id", "text",
        size = 32, stride = 24)
        .select(col("doc_id"), col("chunk_id"), col("n_tokens"),
          md5(col("chunk_text")).as("chunk_md5"))
        .orderBy(col("doc_id"), col("chunk_id")),
    sql = Some("""
      WITH t AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
        FROM documents),
      g AS (
        SELECT doc_id, toks,
               unnest(range(0, greatest((len(toks)-1)//24, 0) + 1)) AS i
        FROM t)
      SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
             CAST(len(toks[i*24+1 : i*24+32]) AS BIGINT) AS n_tokens,
             md5(array_to_string(toks[i*24+1 : i*24+32], ' ')) AS chunk_md5
      FROM g
      WHERE len(toks[i*24+1 : i*24+32]) > 0
      ORDER BY doc_id, chunk_id"""))

  /** Deterministic stratified sampling for training-data mixing:
    * per-language keep rates applied via a content-independent hash of
    * the document id (reproducible across runs/engines/partitionings —
    * no rand()), the sampling primitive of corpus mix control.
    */
  val tx9Sample = Q(
    "tx9_stratified_sample",
    (s, d) => {
      val bucket = pmod(
        conv(substring(md5(concat(col("doc_id").cast("string"), lit("|mix"))),
          1, 15), 16, 10).cast("long"), lit(100L))
      val rate = when(col("lang") === "en", 80)
        .when(col("lang") === "zh", 50)
        .otherwise(25)
      documents(s, d)
        .withColumn("bucket", bucket)
        .filter(col("bucket") < rate)
        .select(col("doc_id"), col("lang"), col("bucket"))
        .orderBy(col("doc_id"))
    },
    sql = Some("""
      SELECT doc_id, lang, bucket
      FROM (SELECT doc_id, lang,
                   CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|mix'),
                     1, 15)) AS BIGINT) % 100 AS bucket
            FROM documents) t
      WHERE bucket < CASE WHEN lang = 'en' THEN 80
                          WHEN lang = 'zh' THEN 50
                          ELSE 25 END
      ORDER BY doc_id"""))

  /** TF-IDF top-3 terms per document — keyword extraction for corpus
    * exploration/labeling. Scale shape: the vocabulary relations (df,
    * doc count) are tiny next to the token stream, so both ship as
    * broadcasts; the per-doc top-k avoids a window sort (collect the
    * ≤|vocab| scored terms per doc, array_sort, slice). Determinism:
    * scores are rounded to 6 dp BEFORE ranking and the tie-break
    * (score DESC, term ASC) is total, so both engines rank
    * identically; ln() may differ by 1 ulp across libm builds, which
    * is orders of magnitude below the rounding step.
    */
  val tx10Tfidf = Q(
    "tx10_tfidf_top_terms",
    (s, d) => {
      val docs = documents(s, d)
      val tok = docs.select(col("doc_id"),
        explode(split(trim(col("text")), "\\s+")).as("term"))
      val tf = tok.groupBy(col("doc_id"), col("term")).agg(cnt.as("tf"))
      val df = tok.distinct().groupBy(col("term")).agg(cnt.as("df"))
      val nDocs = docs.agg(cnt.as("n_docs"))
      tf.join(broadcast(df), "term")
        .crossJoin(broadcast(nDocs))
        .withColumn("score", round(
          col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
        .groupBy(col("doc_id"))
        .agg(slice(array_sort(collect_list(
          struct((-col("score")).as("neg"), col("term")))), 1, 3).as("top"))
        .select(col("doc_id"), posexplode(col("top")).as(Seq("idx", "t")))
        .select(col("doc_id"), (col("idx") + 1).cast("long").as("rank"),
          col("t.term").as("term"), (-col("t.neg")).as("tfidf"))
        .orderBy(col("doc_id"), col("rank"))
    },
    sql = Some("""
      WITH tok AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+'))
                 AS term
        FROM documents),
      tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
      df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
      n AS (SELECT COUNT(*) AS n_docs FROM documents),
      scored AS (
        SELECT tf.doc_id, tf.term,
               ROUND(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6)
                 AS tfidf
        FROM tf JOIN df USING (term) CROSS JOIN n),
      ranked AS (
        SELECT doc_id, term, tfidf,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                 ORDER BY tfidf DESC, term) AS rank
        FROM scored)
      SELECT doc_id, CAST(rank AS BIGINT) AS rank, term, tfidf
      FROM ranked
      WHERE rank <= 3
      ORDER BY doc_id, rank"""))

  /** Unigram language-model scoring: each document's mean log
    * probability under the corpus unigram distribution — the
    * perplexity-style quality filter of training-data pipelines (a
    * document of globally-rare tokens scores low). Scale shape: the
    * unigram table is vocabulary-sized → broadcast; one shuffle for
    * the counts, one for the per-doc sum. Determinism: per-token
    * logprobs are rounded to 6 dp then DECIMAL-routed through the
    * sum, so partition order never shows.
    */
  val tx11Logprob = Q(
    "tx11_unigram_logprob",
    (s, d) => {
      val tok = documents(s, d).select(col("doc_id"),
        explode(split(trim(col("text")), "\\s+")).as("term"))
      val counts = tok.groupBy(col("term")).agg(cnt.as("c"))
      val total = counts.agg(sum(col("c")).as("n_total"))
      tok.join(broadcast(counts), "term")
        .crossJoin(broadcast(total))
        .withColumn("lp", round(
          log(col("c").cast("double") / col("n_total").cast("double")), 6))
        .groupBy(col("doc_id"))
        .agg(cnt.as("n_tokens"), dsum(col("lp")).as("sum_logprob"))
        .withColumn("mean_logprob", col("sum_logprob") / col("n_tokens"))
        .orderBy(col("doc_id"))
    },
    sql = Some(s"""
      WITH tok AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+'))
                 AS term
        FROM documents),
      c AS (SELECT term, COUNT(*) AS c FROM tok GROUP BY 1),
      n AS (SELECT CAST(SUM(c) AS DOUBLE) AS n_total FROM c),
      lp AS (
        SELECT tok.doc_id,
               ROUND(ln(CAST(c.c AS DOUBLE) / n.n_total), 6) AS lp
        FROM tok JOIN c USING (term) CROSS JOIN n)
      SELECT doc_id, COUNT(*) AS n_tokens,
             ${sqlDsum("lp")} AS sum_logprob,
             ${sqlDsum("lp")} / COUNT(*) AS mean_logprob
      FROM lp
      GROUP BY doc_id
      ORDER BY doc_id"""))

  /** End-to-end corpus curation — the composition every training-data
    * pipeline runs, as ONE declarative plan Catalyst optimizes whole:
    * quality gate (≥ 60 tokens) → exact dedup keep-first (min doc_id
    * per distinct text, AFTER the gate so boilerplate shorts never win
    * a dedup group) → deterministic stratified sample (per-lang keep
    * rates on a content-independent doc_id hash, tx9's primitive) →
    * per-(lang, source) mix report. Stage order matters and is pinned
    * by the oracle. Scale: one shuffle per keyed stage (dedup group,
    * final mix agg); the gate and sampler are scan-local predicates
    * Catalyst pushes below the dedup shuffle.
    */
  val tx12Pipeline = Q(
    "tx12_corpus_pipeline",
    (s, d) => {
      val toks = split(trim(col("text")), "\\s+")
      val gated = documents(s, d)
        .withColumn("n_tokens", size(toks).cast("long"))
        .filter(col("n_tokens") >= 60)
      val deduped = gated
        .groupBy(col("text"))
        .agg(min(struct(col("doc_id"), col("lang"), col("source"),
          col("n_tokens"))).as("keep"))
        .select(col("keep.doc_id").as("doc_id"), col("keep.lang").as("lang"),
          col("keep.source").as("source"),
          col("keep.n_tokens").as("n_tokens"))
      val bucket = pmod(
        conv(substring(md5(concat(col("doc_id").cast("string"), lit("|mix"))),
          1, 15), 16, 10).cast("long"), lit(100L))
      deduped
        .withColumn("bucket", bucket)
        .filter(col("bucket") < when(col("lang") === "en", 80)
          .when(col("lang") === "zh", 50).otherwise(25))
        .groupBy(col("lang"), col("source"))
        .agg(cnt.as("n_docs"), sum(col("n_tokens")).as("total_tokens"))
        .orderBy(col("lang"), col("source"))
    },
    sql = Some("""
      WITH gated AS (
        SELECT * FROM (
          SELECT doc_id, text, lang, source,
                 CAST(len(regexp_split_to_array(trim(text), '\s+'))
                   AS BIGINT) AS n_tokens
          FROM documents) t
        WHERE n_tokens >= 60),
      deduped AS (
        SELECT MIN(doc_id) AS doc_id,
               arg_min(lang, doc_id) AS lang,
               arg_min(source, doc_id) AS source,
               arg_min(n_tokens, doc_id) AS n_tokens
        FROM gated
        GROUP BY text),
      sampled AS (
        SELECT lang, source, n_tokens
        FROM (SELECT *,
                CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|mix'),
                  1, 15)) AS BIGINT) % 100 AS bucket
              FROM deduped) t
        WHERE bucket < CASE WHEN lang = 'en' THEN 80
                            WHEN lang = 'zh' THEN 50 ELSE 25 END)
      SELECT lang, source, COUNT(*) AS n_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
      FROM sampled
      GROUP BY lang, source
      ORDER BY lang, source"""))

  /** PII scrubbing: regex-redact emails / phone numbers / IPv4s to
    * typed placeholders, report per-doc match counts + a fingerprint
    * of the scrubbed text. The synthetic corpus contains no PII (no
    * digits, no `@`), so the query first INJECTS deterministic
    * doc_id-derived PII-shaped strings — identically on both engines —
    * then proves the scrubber actually fires (counts are nonzero and
    * the fingerprint differs from the injected text's).
    *
    * Scan-local (one projection, no shuffle); regexes are shared
    * Java/RE2-compatible syntax so Spark and DuckDB see the same
    * matches. At 100 TB this is the cheapest kind of operator — pure
    * map — and the codegen'd `regexp_replace`/`regexp_count` keep it
    * inside WholeStageCodegen.
    */
  val tx13PiiScrub = Q(
    "tx13_pii_scrub",
    (s, d) => {
      val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phoneRe = "\\+1-555-[0-9]{4}"
      val ipRe = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
      documents(s, d)
        .withColumn("pii_text", concat(col("text"),
          lit(" contact user"), col("doc_id"),
          lit("@example.com or +1-555-"),
          lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
          lit(" from 10.0."), (pmod(col("doc_id"), lit(256))).cast("string"),
          lit(".1")))
        .select(col("doc_id"),
          regexp_count(col("pii_text"), lit(emailRe)).as("n_emails"),
          regexp_count(col("pii_text"), lit(phoneRe)).as("n_phones"),
          regexp_count(col("pii_text"), lit(ipRe)).as("n_ips"),
          md5(regexp_replace(
            regexp_replace(
              regexp_replace(col("pii_text"), emailRe, "<EMAIL>"),
              phoneRe, "<PHONE>"),
            ipRe, "<IP>")).as("scrubbed_md5"))
        .orderBy(col("doc_id"))
    },
    sql = Some("""
      SELECT doc_id,
             CAST(len(regexp_extract_all(pii_text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
               AS INT) AS n_emails,
             CAST(len(regexp_extract_all(pii_text,
               '\+1-555-[0-9]{4}')) AS INT) AS n_phones,
             CAST(len(regexp_extract_all(pii_text,
               '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b'))
               AS INT) AS n_ips,
             md5(regexp_replace(regexp_replace(regexp_replace(pii_text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
               '<EMAIL>', 'g'),
               '\+1-555-[0-9]{4}', '<PHONE>', 'g'),
               '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b',
               '<IP>', 'g')) AS scrubbed_md5
      FROM (
        SELECT doc_id,
               text || ' contact user' || doc_id ||
               '@example.com or +1-555-' ||
               lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
               ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1'
                 AS pii_text
        FROM documents)
      ORDER BY doc_id"""))

  /** Gopher-style repetition signals: duplicate-token and
    * duplicate-bigram fractions per document — the "is this page
    * boilerplate/spam" filter every pretraining pipeline runs.
    * Scan-local HOFs on a token array built ONCE per row: Spark
    * re-evaluates a HOF's array argument per element, so the split
    * lives in its own projection below the distinct-counting
    * expressions instead of being inlined into each of them.
    */
  val tx14Repetition = Q(
    "tx14_repetition_ratio",
    (s, d) =>
      documents(s, d)
        .withColumn("toks", split(trim(col("text")), "\\s+"))
        .withColumn("bigrams",
          when(size(col("toks")) >= 2,
            expr("transform(sequence(0, size(toks) - 2), " +
              "i -> concat(toks[i], ' ', toks[i + 1]))"))
            .otherwise(array().cast("array<string>")))
        .select(col("doc_id"),
          size(col("toks")).as("n_tokens"),
          size(array_distinct(col("toks"))).as("n_distinct_tokens"),
          round(lit(1) - size(array_distinct(col("toks")))
            .cast("double") / size(col("toks")), 6)
            .as("dup_token_ratio"),
          size(col("bigrams")).as("n_bigrams"),
          size(array_distinct(col("bigrams"))).as("n_distinct_bigrams"),
          round(when(size(col("bigrams")) > 0,
            lit(1) - size(array_distinct(col("bigrams")))
              .cast("double") / size(col("bigrams"))).otherwise(0.0), 6)
            .as("dup_bigram_ratio"))
        .orderBy(col("doc_id")),
    sql = Some("""
      SELECT doc_id,
             CAST(len(toks) AS INT) AS n_tokens,
             CAST(len(list_distinct(toks)) AS INT) AS n_distinct_tokens,
             ROUND(1 - CAST(len(list_distinct(toks)) AS DOUBLE)
               / len(toks), 6) AS dup_token_ratio,
             CAST(len(bigrams) AS INT) AS n_bigrams,
             CAST(len(list_distinct(bigrams)) AS INT)
               AS n_distinct_bigrams,
             ROUND(CASE WHEN len(bigrams) > 0
               THEN 1 - CAST(len(list_distinct(bigrams)) AS DOUBLE)
                 / len(bigrams) ELSE 0.0 END, 6) AS dup_bigram_ratio
      FROM (
        SELECT doc_id, toks,
               CASE WHEN len(toks) >= 2 THEN
                 list_transform(range(1, len(toks)),
                   i -> toks[i] || ' ' || toks[i + 1])
               ELSE [] END AS bigrams
        FROM (
          SELECT doc_id,
                 regexp_split_to_array(trim(text), '\s+') AS toks
          FROM documents))
      ORDER BY doc_id"""))

  /** Rolling-hash (Rabin-Karp) document fingerprinting — the
    * winnowing primitive: every 8-token window's polynomial hash via
    * the native O(n) `rolling_hash` kernel (one pass with the rolling
    * update; the HOF formulation the oracle runs is O(n·w) per doc),
    * reduced per doc to the minimum window hash (the winnowing
    * fingerprint) and the distinct-window count. Token hashes use the
    * portable 60-bit md5 prefix, so both engines hash identically.
    */
  val tx15RollingFp = Q(
    "tx15_rolling_fingerprint",
    (s, d) =>
      documents(s, d)
        .withColumn("th", expr(
          "transform(split(trim(text), '\\\\s+'), " +
            "t -> cast(conv(substr(md5(t), 1, 15), 16, 10) as bigint))"))
        .withColumn("rh",
          graft.functions.VectorFunctions.rolling_hash(col("th"), 8))
        .select(col("doc_id"),
          size(col("rh")).as("n_windows"),
          array_min(col("rh")).as("fingerprint"),
          size(array_distinct(col("rh"))).as("n_distinct_windows"))
        .orderBy(col("doc_id")),
    sql = Some("""
      WITH t AS (
        SELECT doc_id,
               list_transform(regexp_split_to_array(trim(text), '\s+'),
                 s -> CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)
                   % 2147483647) AS th
        FROM documents),
      r AS (
        SELECT doc_id,
               CASE WHEN len(th) >= 8 THEN
                 list_transform(range(1, len(th) - 8 + 2),
                   i -> list_reduce(th[i : i + 7],
                     (a, b) -> (a * 1000003 + b) % 2147483647))
               ELSE [] END AS rh
        FROM t)
      SELECT doc_id,
             CAST(len(rh) AS INT) AS n_windows,
             list_min(rh) AS fingerprint,
             CAST(len(list_distinct(rh)) AS INT) AS n_distinct_windows
      FROM r
      ORDER BY doc_id"""),
    bench = true)

  /** BPE-style pre-tokenization (tx1 is the whitespace variant): the
    * GPT-2 pre-tokenizer regex minus its negative lookahead (RE2 has
    * none, and the oracle runs RE2) — leading-space letter runs,
    * digit runs, punctuation runs, whitespace runs. What a real BPE
    * tokenizer applies BEFORE merges; token counts from it are the
    * unit every data-mix budget is denominated in. Scan-local
    * regexp_extract_all, identical pattern text both engines.
    */
  val tx16BpeTokens = Q(
    "tx16_bpe_pretokenize",
    (s, d) => {
      val pat = " ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"
      documents(s, d)
        .withColumn("toks",
          regexp_extract_all(col("text"), lit(pat), lit(0)))
        .select(col("doc_id"),
          size(col("toks")).as("n_tokens"),
          size(filter(col("toks"), t => t.rlike("\\p{L}")))
            .as("n_word_tokens"),
          size(array_distinct(col("toks"))).as("n_distinct"),
          md5(array_join(col("toks"), "|")).as("tok_md5"))
        .orderBy(col("doc_id"))
    },
    sql = Some("""
      WITH t AS (
        SELECT doc_id,
               regexp_extract_all(text,
                 ' ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+') AS toks
        FROM documents)
      SELECT doc_id,
             CAST(len(toks) AS INT) AS n_tokens,
             CAST(len(list_filter(toks,
               t -> regexp_matches(t, '\p{L}'))) AS INT)
               AS n_word_tokens,
             CAST(len(list_distinct(toks)) AS INT) AS n_distinct,
             md5(array_to_string(toks, '|')) AS tok_md5
      FROM t
      ORDER BY doc_id"""))

  /** The round-5 capstone: a corpus FREEZE in one declarative plan —
    * repetition gate (tx14's dup-token ratio ≤ 0.6) → length gate →
    * PII scrub (tx13's email redaction, applied BEFORE dedup so the
    * dedup key is the clean text) → exact dedup on the scrubbed md5 →
    * near-dup dedup on the winnowing fingerprint (tx15's rolling-hash
    * min — two docs sharing a min window hash collapse to the
    * smallest doc_id) → per-(lang, source) mix report.
    *
    * Scale shape: the gates and scrub are scan-local; the plan
    * shuffles the corpus exactly twice (md5 key, then fingerprint
    * key), both with map-side min(struct) combines; the report agg
    * moves one row per surviving doc. Stage ORDER is pinned by the
    * oracle: scrub-then-dedup ≠ dedup-then-scrub.
    */
  val tx17Freeze = Q(
    "tx17_corpus_freeze",
    (s, d) => {
      val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val base = documents(s, d)
        .withColumn("toks", split(trim(col("text")), "\\s+"))
        .withColumn("n_tokens", size(col("toks")).cast("long"))
        .withColumn("dup_ratio",
          round(lit(1) - size(array_distinct(col("toks"))).cast("double")
            / size(col("toks")), 6))
        .filter(col("n_tokens") >= 40 && col("dup_ratio") <= 0.6)
        .withColumn("clean", regexp_replace(col("text"), emailRe, "<EMAIL>"))
      val exact = base
        .groupBy(md5(col("clean")).as("k"))
        .agg(min(struct(col("doc_id"), col("lang"), col("source"),
          col("n_tokens"), col("dup_ratio"), col("clean"))).as("keep"))
        .select(col("keep.*"))
      val withFp = exact
        .withColumn("th", expr(
          "transform(split(trim(clean), '\\\\s+'), " +
            "t -> cast(conv(substr(md5(t), 1, 15), 16, 10) as bigint))"))
        .withColumn("fp", array_min(
          graft.functions.VectorFunctions.rolling_hash(col("th"), 8)))
      withFp
        .groupBy(col("fp"))
        .agg(min(struct(col("doc_id"), col("lang"), col("source"),
          col("n_tokens"), col("dup_ratio"))).as("keep"))
        .select(col("keep.*"))
        .groupBy(col("lang"), col("source"))
        .agg(cnt.as("n_docs"), sum(col("n_tokens")).as("total_tokens"),
          davg(col("dup_ratio")).as("mean_dup_ratio"))
        .orderBy(col("lang"), col("source"))
    },
    sql = Some(s"""
      WITH base AS (
        SELECT doc_id, lang, source, text,
               regexp_split_to_array(trim(text), '\\s+') AS toks
        FROM documents),
      gated AS (
        SELECT doc_id, lang, source,
               CAST(len(toks) AS BIGINT) AS n_tokens,
               ROUND(1 - CAST(len(list_distinct(toks)) AS DOUBLE)
                 / len(toks), 6) AS dup_ratio,
               regexp_replace(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                 '<EMAIL>', 'g') AS clean
        FROM base
        WHERE len(toks) >= 40
          AND ROUND(1 - CAST(len(list_distinct(toks)) AS DOUBLE)
                / len(toks), 6) <= 0.6),
      exact AS (
        SELECT MIN(doc_id) AS doc_id,
               arg_min(lang, doc_id) AS lang,
               arg_min(source, doc_id) AS source,
               arg_min(n_tokens, doc_id) AS n_tokens,
               arg_min(dup_ratio, doc_id) AS dup_ratio,
               arg_min(clean, doc_id) AS clean
        FROM gated GROUP BY md5(clean)),
      fp AS (
        SELECT doc_id, lang, source, n_tokens, dup_ratio,
               list_min(list_transform(range(1, len(th) - 8 + 2),
                 i -> list_reduce(th[i : i + 7],
                   (a, b) -> (a * 1000003 + b) % 2147483647))) AS fp
        FROM (SELECT *,
                list_transform(regexp_split_to_array(trim(clean), '\\s+'),
                  s -> CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)
                    % 2147483647) AS th
              FROM exact)),
      neardedup AS (
        SELECT MIN(doc_id) AS doc_id,
               arg_min(lang, doc_id) AS lang,
               arg_min(source, doc_id) AS source,
               arg_min(n_tokens, doc_id) AS n_tokens,
               arg_min(dup_ratio, doc_id) AS dup_ratio
        FROM fp GROUP BY fp)
      SELECT lang, source, COUNT(*) AS n_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
             ${sqlDavg("dup_ratio")} AS mean_dup_ratio
      FROM neardedup
      GROUP BY lang, source
      ORDER BY lang, source"""))

  /** One BPE merge step (vocabulary induction): count adjacent
    * character pairs across the corpus, weighted by word frequency —
    * the argmax pair is the merge a BPE trainer performs first. Top-20
    * merge candidates out, ties broken on the pair string.
    *
    * Scale shape: the only corpus-size stage is the word explode +
    * count (map-side combinable hash agg); pair generation runs at
    * DISTINCT-WORD scale — the classic BPE-trainer optimization (a
    * 100 TB corpus has billions of word instances but only millions of
    * distinct words). The pair agg shuffles word-level rows only, and
    * top-k plans TakeOrderedAndProject, never a global sort.
    */
  val tx18BpeMerge = Q(
    "tx18_bpe_merge_step",
    (s, d) => {
      val words = documents(s, d)
        .select(explode(split(trim(col("text")), "\\s+")).as("w"))
        .filter(length(col("w")) >= 2)
        .groupBy(col("w")).agg(cnt.as("freq"))
      words
        .select(col("freq"), explode(
          transform(sequence(lit(1), length(col("w")) - 1), i =>
            concat(col("w").substr(i, lit(1)), lit(" "),
              col("w").substr(i + 1, lit(1))))).as("pair"))
        .groupBy(col("pair")).agg(sum(col("freq")).as("n"))
        .orderBy(col("n").desc, col("pair"))
        .limit(20)
    },
    sql = Some("""
      WITH winst AS (
        SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS w
        FROM documents),
      words AS (
        SELECT w, COUNT(*) AS freq
        FROM winst WHERE length(w) >= 2 GROUP BY w),
      pairs AS (
        SELECT unnest(list_transform(range(1, length(w)),
                 i -> w[i:i] || ' ' || w[i+1:i+1])) AS pair,
               freq
        FROM words)
      SELECT pair, CAST(SUM(freq) AS BIGINT) AS n
      FROM pairs GROUP BY pair
      ORDER BY n DESC, pair LIMIT 20"""))

  /** Temperature-scaled data-mixture weights (the sampling-alpha op a
    * multi-source training run uses to up-weight low-resource slices):
    * per-language token totals → weight ∝ tokens^0.5, normalized →
    * expected docs for a 10k-sample budget. alpha = 0.5 flattens the
    * mix: en holds 44% of docs here but gets well under 44% of the
    * budget.
    *
    * Scale shape: one map-side-combinable agg over the corpus; the
    * normalizer joins back as a broadcast 1-row scalar (q15/q20
    * pattern — no window, no driver collect). The per-group sqrt is
    * 6-dp-rounded then DECIMAL-summed so the normalizer is bit-stable
    * under any partition order.
    */
  val tx19MixWeights = Q(
    "tx19_mix_weights",
    (s, d) => {
      val byLang = documents(s, d)
        .select(col("lang"),
          size(split(trim(col("text")), "\\s+")).cast("long").as("ntok"))
        .groupBy(col("lang"))
        .agg(cnt.as("n_docs"), sum(col("ntok")).as("total_tokens"))
        .withColumn("rs", round(sqrt(col("total_tokens")), 6))
      val tot = byLang.agg(dsum(col("rs")).as("t"))
      byLang.crossJoin(broadcast(tot))
        .select(col("lang"), col("n_docs"), col("total_tokens"),
          round(col("rs") / col("t"), 6).as("weight"),
          floor(lit(10000) * round(col("rs") / col("t"), 6)).cast("long")
            .as("expected_docs"))
        .orderBy(col("lang"))
    },
    sql = Some(s"""
      WITH d AS (
        SELECT lang,
               len(regexp_split_to_array(trim(text), '\\s+')) AS ntok
        FROM documents),
      by_lang AS (
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(ntok) AS BIGINT) AS total_tokens
        FROM d GROUP BY lang),
      w AS (SELECT *, ROUND(sqrt(total_tokens), 6) AS rs FROM by_lang),
      tot AS (SELECT ${sqlDsum("rs")} AS t FROM w)
      SELECT lang, n_docs, total_tokens,
             ROUND(rs / t, 6) AS weight,
             CAST(FLOOR(10000 * ROUND(rs / t, 6)) AS BIGINT)
               AS expected_docs
      FROM w, tot ORDER BY lang"""))

  /** Segment-level (C4-style) boilerplate detection: chunk every doc
    * with tx8's exact parameters, find chunks whose hash appears in
    * MORE THAN ONE document, and report each doc's shared-chunk
    * fraction — the filter signal for nav-bars/footers/licence
    * blocks that document-level dedup can't see.
    *
    * Scale shape: one chunking pass; the (hash, doc) partial agg and
    * the hash-level agg that feeds the shared set read the SAME
    * exchange (dd2's reuse pattern), and the shared-hash relation is
    * duplicate-scale (tiny) so it broadcasts back — the corpus
    * shuffles twice ((h, doc) then doc), never for the join.
    */
  val tx20Boilerplate = Q(
    "tx20_boilerplate_chunks",
    (s, d) => {
      val perDocHash = graft.operators.ChunkingOps
        .chunk(documents(s, d), "doc_id", "text", size = 32, stride = 24)
        .select(col("doc_id"), md5(col("chunk_text")).as("h"))
        .groupBy(col("h"), col("doc_id")).agg(cnt.as("k"))
      val shared = perDocHash.groupBy(col("h")).agg(cnt.as("nd"))
        .filter(col("nd") > 1)
        .select(col("h"), lit(1L).as("is_shared"))
      perDocHash.join(broadcast(shared), Seq("h"), "left")
        .groupBy(col("doc_id"))
        .agg(sum(col("k")).as("n_chunks"),
          sum(when(col("is_shared").isNotNull, col("k")).otherwise(0L))
            .as("n_shared_chunks"))
        .select(col("doc_id"), col("n_chunks"), col("n_shared_chunks"),
          round(col("n_shared_chunks").cast("double") / col("n_chunks"), 6)
            .as("boilerplate_ratio"))
        .orderBy(col("doc_id"))
    },
    sql = Some("""
      WITH t AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
        FROM documents),
      g AS (
        SELECT doc_id, toks,
               unnest(range(0, greatest((len(toks)-1)//24, 0) + 1)) AS i
        FROM t),
      c AS (
        SELECT doc_id,
               md5(array_to_string(toks[i*24+1 : i*24+32], ' ')) AS h
        FROM g WHERE len(toks[i*24+1 : i*24+32]) > 0),
      pd AS (SELECT h, doc_id, COUNT(*) AS k FROM c GROUP BY h, doc_id),
      sh AS (SELECT h FROM pd GROUP BY h HAVING COUNT(*) > 1),
      agg AS (
        SELECT pd.doc_id,
               CAST(SUM(k) AS BIGINT) AS n_chunks,
               CAST(SUM(CASE WHEN sh.h IS NOT NULL THEN k ELSE 0 END)
                 AS BIGINT) AS n_shared_chunks
        FROM pd LEFT JOIN sh ON pd.h = sh.h
        GROUP BY pd.doc_id)
      SELECT doc_id, n_chunks, n_shared_chunks,
             ROUND(CAST(n_shared_chunks AS DOUBLE) / n_chunks, 6)
               AS boilerplate_ratio
      FROM agg ORDER BY doc_id"""))

  /** Per-source quality cap: keep only each source's top-3 documents
    * by quality rank — the "cap every crawl domain at its N best
    * pages" curation primitive (the frequency-capping half of
    * source-mix control; tx9's stratified sample is the rate half).
    * The rank key is INTEGER-exact (stopword density in ppm,
    * `1e6·n_stop DIV n_tok`) with a doc_id tie-break, so the ranking
    * is bit-identical across engines — a double-ratio ORDER BY could
    * disagree in the last ulp and flip a rank.
    *
    * Scale shape: one hash exchange on `source` + a per-partition
    * sort for `row_number` — partition count = number of sources
    * (domains: millions at crawl scale, well-spread), per-group state
    * is the sort, and only capped rows survive the filter. The
    * scoring is scan-local.
    */
  val tx21SourceCap = Q(
    "tx21_per_source_quality_cap",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val toks = split(trim(col("text")), "\\s+")
      val nTok = size(toks).cast("long")
      val nStop = size(filter(toks,
        t => array_contains(lit(stopwords.toArray), t))).cast("long")
      val scored = documents(s, d)
        .select(col("source"), col("doc_id"),
          (nStop * 1000000L).as("num"), nTok.as("den"))
        .select(col("source"), col("doc_id"),
          expr("num DIV den").as("q_ppm"))
      val w = Window.partitionBy(col("source"))
        .orderBy(col("q_ppm").desc, col("doc_id"))
      scored
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .orderBy(col("source"), col("rn"))
    },
    sql = Some(s"""
      WITH scored AS (
        SELECT source, doc_id,
               1000000 * CAST(len(list_filter(toks,
                   t -> list_contains($sqlStopList, t))) AS BIGINT)
                 // CAST(len(toks) AS BIGINT) AS q_ppm
        FROM (SELECT source, doc_id,
                     regexp_split_to_array(trim(text), '\\s+') AS toks
              FROM documents) t),
      ranked AS (
        SELECT source, doc_id, q_ppm,
               ROW_NUMBER() OVER (PARTITION BY source
                 ORDER BY q_ppm DESC, doc_id) AS rn
        FROM scored)
      SELECT source, doc_id, q_ppm, rn
      FROM ranked WHERE rn <= 3
      ORDER BY source, rn"""))

  /** Sequence-packing manifest ([[graft.operators.PackingOps]]): lay
    * each source's documents end-to-end (doc_id order) and cut
    * 512-token training sequences across the concatenation — the
    * "concat then chunk" packing that wastes no pad tokens. Each row
    * maps a document to its token range and the sequences it spans;
    * tx1's whitespace tokenization keeps the token unit consistent
    * across the text queries. Packing is PER SOURCE (one hash
    * exchange + per-partition window sort), never a global order —
    * all derived columns are integer division on exact token offsets,
    * bit-identical across engines.
    */
  val tx22Packing = Q(
    "tx22_sequence_packing",
    (s, d) =>
      graft.operators.PackingOps.packManifest(documents(s, d),
        "source", "doc_id", "text", capacity = 512)
        .orderBy(col("source"), col("doc_id")),
    sql = Some("""
      WITH t AS (
        SELECT source, doc_id,
               CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
                 AS n_tokens
        FROM documents),
      o AS (
        SELECT source, doc_id, n_tokens,
               CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS end_off
        FROM t)
      SELECT source, doc_id, n_tokens, end_off - n_tokens AS start_off,
             (end_off - n_tokens) // 512 AS seq_first,
             (end_off - 1) // 512 AS seq_last,
             (end_off - 1) // 512 - (end_off - n_tokens) // 512 + 1
               AS n_seqs
      FROM o
      ORDER BY source, doc_id"""))

  /** Corpus snapshot delta — the incremental-refresh primitive: a new
    * crawl snapshot lands and the pipeline needs exactly what changed
    * (add / delete / update / unchanged per document) before deciding
    * what to re-process downstream (re-dedup only updated docs,
    * retire deleted ones). Snapshots are simulated deterministically
    * from `documents`: the "old" snapshot is doc_id%10<8, the "new"
    * one doc_id%10>=2 with every doc_id%3==0 text revised — so all
    * four statuses occur and both engines derive identical content
    * hashes.
    *
    * Scale shape: content comparison is by md5 computed scan-local on
    * EACH side, so the full-outer join carries (id, hash) pairs only —
    * never document bodies; both sides hash-partition on doc_id (one
    * exchange each, co-partitioned merge). At 100 TB the snapshots
    * would be bucketed on doc_id and the exchanges vanish entirely
    * (see BucketingSpec for the engine's zero-shuffle bucketed-join
    * evidence).
    */
  val tx23SnapshotDelta = Q(
    "tx23_snapshot_delta",
    (s, d) => {
      val base = documents(s, d).select(col("doc_id"), col("text"))
      val oldSnap = base.filter(col("doc_id") % 10 < 8)
        .select(col("doc_id"), md5(col("text")).as("old_md5"))
      val newSnap = base.filter(col("doc_id") % 10 >= 2)
        .select(col("doc_id"),
          md5(when(col("doc_id") % 3 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text"))).as("new_md5"))
      oldSnap.join(newSnap, Seq("doc_id"), "full_outer")
        .withColumn("status",
          when(col("old_md5").isNull, "added")
            .when(col("new_md5").isNull, "deleted")
            .when(col("old_md5") === col("new_md5"), "unchanged")
            .otherwise("updated"))
        .select(col("doc_id"), col("status"), col("old_md5"),
          col("new_md5"))
        .orderBy(col("doc_id"))
    },
    sql = Some("""
      WITH old AS (
        SELECT doc_id, md5(text) AS old_md5
        FROM documents WHERE doc_id % 10 < 8),
      neu AS (
        SELECT doc_id,
               md5(CASE WHEN doc_id % 3 = 0 THEN text || ' v2'
                        ELSE text END) AS new_md5
        FROM documents WHERE doc_id % 10 >= 2)
      SELECT doc_id,
             CASE WHEN o.old_md5 IS NULL THEN 'added'
                  WHEN n.new_md5 IS NULL THEN 'deleted'
                  WHEN o.old_md5 = n.new_md5 THEN 'unchanged'
                  ELSE 'updated' END AS status,
             o.old_md5, n.new_md5
      FROM old o FULL OUTER JOIN neu n USING (doc_id)
      ORDER BY doc_id"""))

  /** Training-shard manifest — the terminal write-planning step after
    * packing (tx22): every document lands in one of 16 shards by a
    * content-independent md5 hash of its id (the reshuffle-free
    * "global shuffle" of training data: hash placement decorrelates
    * neighbouring source documents without ever materializing a global
    * order), and the manifest reports each shard's doc count, token
    * total, source diversity, and id range — the numbers a trainer
    * needs to size epochs and verify balance. One shuffle at SHARD
    * cardinality (16 rows out) after map-side combine; the hash is the
    * same doc_id-keyed md5 family as tx9's sampler, so both engines
    * derive identical placements.
    */
  val tx24ShardManifest = Q(
    "tx24_shard_manifest",
    (s, d) => {
      val shard = pmod(
        conv(substring(md5(concat(col("doc_id").cast("string"),
          lit("|shard"))), 1, 15), 16, 10).cast("long"), lit(16L))
      documents(s, d)
        .select(col("doc_id"), col("source"), shard.as("shard"),
          size(split(trim(col("text")), "\\s+")).cast("long")
            .as("n_tokens"))
        .groupBy(col("shard"))
        .agg(cnt.as("n_docs"), sum(col("n_tokens")).as("total_tokens"),
          countDistinct(col("source")).as("n_sources"),
          min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
        .orderBy(col("shard"))
    },
    sql = Some("""
      WITH t AS (
        SELECT doc_id, source,
               CAST(('0x' || substr(md5(doc_id::VARCHAR || '|shard'), 1, 15))
                 AS BIGINT) % 16 AS shard,
               CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
                 AS n_tokens
        FROM documents)
      SELECT shard, COUNT(*) AS n_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
             COUNT(DISTINCT source) AS n_sources,
             MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
      FROM t GROUP BY shard ORDER BY shard"""))

  /** One BPE training iteration's oracle block: from `state{k}`
    * (w, freq, syms), derive the pair counts, the top-5 merge table
    * rows, and `state{k+1}` with the rank-1 merge applied. The merge
    * application is the window formulation of the greedy left-to-right
    * scan: consecutive matched positions form runs (i − row_number),
    * greedy picks the odd positions of each run, and a row whose LEFT
    * neighbor was picked is consumed. Provably equivalent to the
    * engine's array fold ([[graft.operators.BpeOps.applyMerge]]) — two
    * independent formulations of the same semantics, which is the
    * point of the oracle.
    */
  private def bpeIterSql(k: Int, topK: Int = 5,
      materialized: Boolean = false): String = {
    val mat = if (materialized) "MATERIALIZED " else ""
    s"""
      pairs$k AS $mat(
        SELECT syms[i] || ' ' || syms[i+1] AS pair,
               CAST(SUM(freq) AS BIGINT) AS n
        FROM (SELECT freq, syms, unnest(range(1, len(syms))) AS i
              FROM state$k)
        GROUP BY 1),
      top$k AS $mat(
        SELECT CAST($k AS BIGINT) AS step,
               CAST(ROW_NUMBER() OVER (ORDER BY n DESC, pair) AS BIGINT)
                 AS rank, pair, n
        FROM pairs$k ORDER BY n DESC, pair LIMIT $topK),
      ab$k AS $mat(
        SELECT string_split(pair, ' ')[1] AS a,
               string_split(pair, ' ')[2] AS b
        FROM top$k WHERE rank = 1),
      sym$k AS $mat(
        SELECT w, freq, i, syms[i] AS sym, syms[i+1] AS nxt
        FROM (SELECT w, freq, syms, unnest(range(1, len(syms)+1)) AS i
              FROM state$k)),
      match$k AS $mat(
        SELECT w, freq, i, sym, nxt,
               (sym = (SELECT a FROM ab$k) AND
                nxt IS NOT NULL AND nxt = (SELECT b FROM ab$k)) AS m
        FROM sym$k),
      run$k AS $mat(
        SELECT *, CASE WHEN m THEN i - ROW_NUMBER()
            OVER (PARTITION BY w, m ORDER BY i) END AS run
        FROM match$k),
      pick$k AS $mat(
        SELECT *, m AND (ROW_NUMBER()
            OVER (PARTITION BY w, run ORDER BY i) % 2 = 1) AS picked
        FROM run$k),
      keep$k AS $mat(
        SELECT *, COALESCE(LAG(picked) OVER (PARTITION BY w ORDER BY i),
                           FALSE) AS consumed
        FROM pick$k),
      state${k + 1} AS $mat(
        SELECT w, freq,
               list(CASE WHEN picked THEN sym ||
                 (SELECT b FROM ab$k) ELSE sym END ORDER BY i) AS syms
        FROM keep$k WHERE NOT consumed
        GROUP BY w, freq)"""
  }

  /** Multi-step BPE merge loop — tx18 iterated (the trainer a real
    * tokenizer runs): three merge rounds, each applying the previous
    * round's top pair to the distinct-word symbolization before
    * recounting. Output = the merge table (top-5 candidates per round,
    * rank 1 applied). See [[graft.operators.BpeOps]] for the scale
    * shape (cached word table; per-iteration = one hash agg +
    * TakeOrderedAndProject + a bounded collect).
    */
  val tx25BpeTrain = Q(
    "tx25_bpe_train_loop",
    (s, d) =>
      graft.operators.BpeOps.trainMerges(documents(s, d), steps = 3,
        topK = 5).orderBy(col("step"), col("rank")),
    sql = Some(s"""
      WITH winst AS (
        SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
        FROM documents),
      words AS (
        SELECT w, COUNT(*) AS freq FROM winst
        WHERE length(w) >= 2 GROUP BY w),
      state1 AS (
        SELECT w, freq,
               list_transform(range(1, length(w)+1), i -> w[i:i]) AS syms
        FROM words),
      ${bpeIterSql(1)},${bpeIterSql(2)},${bpeIterSql(3)}
      SELECT step, rank, pair, n FROM top1
      UNION ALL SELECT step, rank, pair, n FROM top2
      UNION ALL SELECT step, rank, pair, n FROM top3
      ORDER BY step, rank"""))

  /** BPE training at REAL step counts — tx25's loop run for 50 merges,
    * exercising the epoch formulation of
    * [[graft.operators.BpeOps.trainMerges]]: merges since the last
    * epoch boundary apply as ONE data-driven merge-table fold (constant
    * plan depth in the step count) and the symbol table re-persists
    * every 16 accepted merges, so per-iteration recompute is bounded no
    * matter how far the vocabulary grows. Output = the applied (rank-1)
    * merge of each of the 50 rounds. The oracle unrolls the same 50
    * iterations as MATERIALIZED CTEs (the window-function formulation of
    * greedy merge application — see [[bpeIterSql]]); materialization
    * keeps DuckDB from exponentially inlining the multiply-referenced
    * state cascade.
    */
  val tx26BpeTrainEpochs = Q(
    "tx26_bpe_train_epochs",
    (s, d) =>
      graft.operators.BpeOps.trainMerges(documents(s, d), steps = 50,
        topK = 1, epochLen = 16).orderBy(col("step")),
    sql = Some(s"""
      WITH winst AS (
        SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
        FROM documents),
      words AS MATERIALIZED (
        SELECT w, COUNT(*) AS freq FROM winst
        WHERE length(w) >= 2 GROUP BY w),
      state1 AS MATERIALIZED (
        SELECT w, freq,
               list_transform(range(1, length(w)+1), i -> w[i:i]) AS syms
        FROM words),
      ${(1 to 50).map(k => bpeIterSql(k, topK = 1, materialized = true))
        .mkString(",")}
      ${(1 to 50).map(k => s"SELECT step, rank, pair, n FROM top$k")
        .mkString("\n      UNION ALL ")}
      ORDER BY step"""))

  /** CORPUS ENCODING with the trained vocabulary — the consumer half
    * of tx26's trainer (train merges → tokenize the corpus): per-doc
    * BPE token counts after applying all 50 trained merges. The scale
    * shape real tokenizer deployment has: the merge table is DATA (a
    * 50-element literal driving ONE [[graft.operators.BpeOps.applyMergeTable]]
    * fold), symbolization runs ONCE per DISTINCT word (vocabulary
    * scale), and the corpus-scale pass is a broadcast vocab join +
    * per-doc sum (tx10's discipline — the token stream never shuffles
    * for the vocab). Word universe = the trainer's (length ≥ 2,
    * whitespace tokens). The oracle replays the 50 training rounds
    * (tx26's cascade) to state51 and joins the per-doc word instances
    * back — two independent formulations of train-then-encode.
    */
  val tx27BpeEncode = Q(
    "tx27_bpe_encode",
    (s, d) => {
      import graft.operators.BpeOps
      val docs = documents(s, d)
      val mergeSeq = BpeOps.trainMerges(docs, steps = 50, topK = 1,
        epochLen = 16).orderBy(col("step"))
        .collect().map(_.getString(2)).toSeq // 50 driver-side rows
      val vocab = BpeOps.words(docs).select(col("w"),
        size(BpeOps.applyMergeTable(BpeOps.charSyms(col("w")),
          typedLit(mergeSeq))).cast("long").as("n_syms"))
      docs
        .select(col("doc_id"),
          explode(split(trim(col("text")), "\\s+")).as("w"))
        .filter(length(col("w")) >= 2)
        .join(broadcast(vocab), Seq("w"))
        .groupBy(col("doc_id"))
        .agg(cnt.as("n_words"), sum(col("n_syms")).as("n_bpe_tokens"))
        .orderBy(col("doc_id"))
    },
    sql = Some(s"""
      WITH winst AS (
        SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
        FROM documents),
      words AS MATERIALIZED (
        SELECT w, COUNT(*) AS freq FROM winst
        WHERE length(w) >= 2 GROUP BY w),
      state1 AS MATERIALIZED (
        SELECT w, freq,
               list_transform(range(1, length(w)+1), i -> w[i:i]) AS syms
        FROM words),
      ${(1 to 50).map(k => bpeIterSql(k, 1, materialized = true))
        .mkString(",")},
      winst_doc AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
        FROM documents)
      SELECT d.doc_id, COUNT(*) AS n_words,
             CAST(SUM(len(s.syms)) AS BIGINT) AS n_bpe_tokens
      FROM winst_doc d JOIN state51 s ON d.w = s.w
      WHERE length(d.w) >= 2
      GROUP BY d.doc_id
      ORDER BY d.doc_id"""))

  /** Per-doc interpolated bigram logprob — the plan behind tx28, and
    * the scoring stage of tx33's filter: (doc_id, n_bigrams,
    * sum_logprob, mean_logprob), docs with < 2 tokens absent.
    */
  private def bigramDocLp(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val toks = split(trim(col("text")), "\\s+")
    val bg = documents(s, d)
      .select(col("doc_id"), toks.as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("t")) - 1),
        i => struct(element_at(col("t"), i).as("w1"),
          element_at(col("t"), i + 1).as("w2")))).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val tok = documents(s, d).select(col("doc_id"),
      explode(toks).as("term"))
    val cb = bg.groupBy(col("w1"), col("w2")).agg(cnt.as("cb"))
    val c1 = bg.groupBy(col("w1")).agg(cnt.as("c1"))
    val cu = tok.groupBy(col("term")).agg(cnt.as("cu"))
    val total = cu.agg(sum(col("cu")).as("n_total"))
    bg.join(cb, Seq("w1", "w2"))
      .join(c1, Seq("w1"))
      .join(cu.withColumnRenamed("term", "w2"), Seq("w2"))
      .crossJoin(broadcast(total))
      .withColumn("lp", round(log(
        lit(0.75) * (col("cb").cast("double") / col("c1").cast("double"))
          + lit(0.25) * (col("cu").cast("double")
            / col("n_total").cast("double"))), 6))
      .groupBy(col("doc_id"))
      .agg(cnt.as("n_bigrams"), dsum(col("lp")).as("sum_logprob"))
      .withColumn("mean_logprob", col("sum_logprob") / col("n_bigrams"))
  }

  /** BIGRAM language-model scoring with unigram interpolation
    * (tx11's perplexity filter upgraded to the ccnet-style shape):
    * per-doc mean log of `0.75·P(w2|w1) + 0.25·P(w2)`, where
    * P(w2|w1) = c(w1w2)/c1(w1) with c1 = bigram-start count and
    * P(w2) = unigram MLE. Bigrams are built IN-ROW from the token
    * array (no position join), so corpus-scale work is one explode +
    * three vocabulary-keyed joins Catalyst sizes freely (bigram/
    * unigram tables broadcast at fixture scale, shuffle at corpus
    * scale — the plan is hint-free by design); the 1-row total
    * broadcasts. Determinism: all counts exact, per-instance logs
    * rounded 6dp then DECIMAL-routed (tx11's discipline). Docs under
    * 2 tokens have no bigrams and drop out on both engines.
    */
  val tx28BigramLm = Q(
    "tx28_bigram_logprob",
    (s, d) => bigramDocLp(s, d).orderBy(col("doc_id")),
    sql = Some(s"""
      WITH arr AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
        FROM documents),
      bg AS (
        SELECT doc_id, b[1] AS w1, b[2] AS w2
        FROM (SELECT doc_id, unnest(list_transform(range(1, len(t)),
                i -> [t[i], t[i+1]])) AS b
              FROM arr WHERE len(t) >= 2)),
      tok AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+'))
                 AS term
        FROM documents),
      cb AS (SELECT w1, w2, COUNT(*) AS cb FROM bg GROUP BY 1, 2),
      c1 AS (SELECT w1, COUNT(*) AS c1 FROM bg GROUP BY 1),
      cu AS (SELECT term, COUNT(*) AS cu FROM tok GROUP BY 1),
      n AS (SELECT CAST(SUM(cu) AS DOUBLE) AS n_total FROM cu),
      lp AS (
        SELECT bg.doc_id,
               ROUND(ln(0.75 * (CAST(cb.cb AS DOUBLE)
                                / CAST(c1.c1 AS DOUBLE))
                 + 0.25 * (CAST(cu.cu AS DOUBLE) / n.n_total)), 6) AS lp
        FROM bg
        JOIN cb USING (w1, w2)
        JOIN c1 USING (w1)
        JOIN cu ON cu.term = bg.w2
        CROSS JOIN n)
      SELECT doc_id, COUNT(*) AS n_bigrams,
             ${sqlDsum("lp")} AS sum_logprob,
             ${sqlDsum("lp")} / COUNT(*) AS mean_logprob
      FROM lp
      GROUP BY doc_id
      ORDER BY doc_id"""))

  /** CDC changelog DERIVE + APPLY (tx29) — the other half of tx23's
    * snapshot delta: express the old→new difference as an explicit
    * changelog of (doc_id, op ∈ {I,U,D}, payload) rows, then APPLY it
    * to the old snapshot — the MERGE-INTO shape every incremental
    * table maintenance job runs. The oracle doesn't replicate the
    * machinery at all: it simply produces the NEW snapshot, because
    * the operator's contract is the round-trip LAW
    * `apply(diff(old, new), old) == new` — any slip in either half
    * (a missed delete, a double-applied update, an unchanged row
    * misclassified) breaks the hash. Scale shape: the diff is one
    * full-outer join keyed on doc_id (corpus-scale, single shuffle);
    * the changelog is DELTA-scale, so the apply side broadcasts it
    * into one scan of the old snapshot — the base table never
    * shuffles to absorb a delta.
    */
  val tx29ChangelogApply = Q(
    "tx29_changelog_apply",
    (s, d) => {
      val base = documents(s, d).filter(col("doc_id") % 10 < 8)
        .select(col("doc_id"), col("text"))
      val next = documents(s, d).filter(col("doc_id") % 10 >= 2)
        .select(col("doc_id"),
          when(col("doc_id") % 3 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")).as("text"))
      // DIFF → changelog: I/U/D rows only (hash-equal rows drop out).
      // Scoped-cached: BOTH apply consumers (anti keys + payloads)
      // read it, and without the cache each would re-run the
      // corpus-keyed full-outer diff (plan-gated to exactly one).
      val log = org.apache.spark.sql.graft.ScopedCaches.scoped(
        base.select(col("doc_id"), col("text").as("old_text"))
          .join(next.select(col("doc_id"), col("text").as("new_text")),
            Seq("doc_id"), "full_outer")
          .select(col("doc_id"),
            when(col("old_text").isNull, "I")
              .when(col("new_text").isNull, "D")
              .when(md5(col("old_text")) =!= md5(col("new_text")), "U")
              .as("op"),
            col("new_text"))
          .filter(col("op").isNotNull))
      // APPLY: delete+update keys leave the base, I+U payloads come in
      val touched = broadcast(log.select(col("doc_id")))
      val applied = base.join(touched, Seq("doc_id"), "left_anti")
        .unionByName(log.filter(col("op") =!= "D")
          .select(col("doc_id"), col("new_text").as("text")))
      applied.select(col("doc_id"), md5(col("text")).as("content_md5"))
        .orderBy(col("doc_id"))
    },
    sql = Some("""
      SELECT doc_id,
             md5(CASE WHEN doc_id % 3 = 0 THEN text || ' v2'
                 ELSE text END) AS content_md5
      FROM documents
      WHERE doc_id % 10 >= 2
      ORDER BY doc_id"""))

  /** Incremental aggregate-VIEW maintenance (tx30) — the materialized-
    * view refresh every warehouse runs on top of tx29's changelog: a
    * per-language (n_docs, n_tokens) view of the OLD snapshot is
    * brought to the NEW snapshot by merging delta CONTRIBUTIONS
    * (+1/−1 docs, ±token deltas per I/U/D row) — the base corpus is
    * never re-aggregated. In production `view` is the stored MV and
    * the changelog arrives from CDC; both are materialized inline here
    * so the oracle can check the refresh LAW:
    * `merge(view(old), Δ(old→new)) == agg(new)` — the oracle just
    * aggregates the new snapshot directly, so a wrong sign on a delete,
    * a U row double-counted, or a missed insert breaks the hash.
    * Scale shape: the changelog is delta-scale, its contribution
    * aggregate is group-scale, and the final merge joins two
    * GROUP-scale relations — refresh cost is O(Δ + groups), not
    * O(corpus) (plan-gated: two aggregates, two full-outer joins, and
    * the refresh join's inputs are both aggregates). U rows can't move
    * a doc between languages here (the update touches only `text`), so
    * the Δ needs no per-group re-keying — a lang-changing update would
    * split into a (D, old-lang) + (I, new-lang) pair upstream.
    */
  val tx30IncrementalAgg = Q(
    "tx30_incremental_agg",
    (s, d) => {
      def tok(c: org.apache.spark.sql.Column) =
        size(split(trim(c), "\\s+")).cast("long")
      val old = documents(s, d).filter(col("doc_id") % 10 < 8)
        .select(col("doc_id"), col("lang"), col("text"))
      val next = documents(s, d).filter(col("doc_id") % 10 >= 2)
        .select(col("doc_id"), col("lang"),
          when(col("doc_id") % 3 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")).as("text"))
      // the maintained view (group-scale): per-lang doc/token totals
      val view = old.groupBy(col("lang"))
        .agg(cnt.as("n_docs"), sum(tok(col("text"))).as("n_tokens"))
      // changelog with MEASURE contributions (delta-scale): one
      // corpus-keyed full-outer diff, unchanged rows drop out
      val log = old.select(col("doc_id"), col("lang").as("old_lang"),
          tok(col("text")).as("old_tok"), md5(col("text")).as("old_md5"))
        .join(next.select(col("doc_id"), col("lang").as("new_lang"),
            tok(col("text")).as("new_tok"), md5(col("text")).as("new_md5")),
          Seq("doc_id"), "full_outer")
        .select(coalesce(col("new_lang"), col("old_lang")).as("lang"),
          when(col("old_md5").isNull, "I")
            .when(col("new_md5").isNull, "D")
            .when(col("old_md5") =!= col("new_md5"), "U").as("op"),
          col("old_tok"), col("new_tok"))
        .filter(col("op").isNotNull)
      // delta contributions, then the group-scale merge
      val delta = log.groupBy(col("lang"))
        .agg(sum(when(col("op") === "I", 1L)
            .when(col("op") === "D", -1L).otherwise(0L)).as("dn"),
          sum(coalesce(col("new_tok"), lit(0L)) -
            coalesce(col("old_tok"), lit(0L))).as("dtok"))
      view.join(delta, Seq("lang"), "full_outer")
        .select(col("lang"),
          (coalesce(col("n_docs"), lit(0L)) +
            coalesce(col("dn"), lit(0L))).as("n_docs"),
          (coalesce(col("n_tokens"), lit(0L)) +
            coalesce(col("dtok"), lit(0L))).as("n_tokens"))
        .filter(col("n_docs") > 0)
        .orderBy(col("lang"))
    },
    sql = Some("""
      SELECT lang, COUNT(*) AS n_docs,
             CAST(SUM(CAST(len(regexp_split_to_array(trim(
               CASE WHEN doc_id % 3 = 0 THEN text || ' v2' ELSE text END),
               '\s+')) AS BIGINT)) AS BIGINT) AS n_tokens
      FROM documents
      WHERE doc_id % 10 >= 2
      GROUP BY lang
      ORDER BY lang"""))

  /** WEIGHTED priority sampling (tx31) — Duffield-Lund-Thorup priority
    * sampling, the importance-weighted cousin of tx9's stratified
    * sample: each doc draws priority `q = w·M/(h+1)` (w = n_chars, h a
    * 52-bit md5 hash, M = 2^52), and the k=50 highest-priority docs
    * per source are the sample — longer docs proportionally likelier,
    * yet fully deterministic and replayable (the hash IS the
    * randomness). Numerics: w·M is exact (integer × power of two) and
    * the division is one correctly-rounded IEEE op, so both engines
    * compute bit-identical priorities — no transcendentals (the
    * u^(1/w) exponential-race formulation would hinge on pow's last
    * ulp). Scale shape: the per-source threshold (k-th priority) comes
    * from the `topk_values` kernel — O(k) agg state, NO corpus-wide
    * window sort — then broadcasts back and the sample is a scan-local
    * filter: two scans, zero corpus shuffles (plan-gated: no Window,
    * threshold join broadcasts). Sub-k sources keep everything
    * (threshold coalesced to 0). The oracle takes the same
    * threshold-then-filter path via a rank window, so boundary ties
    * admit the same rows on both sides.
    */
  val tx31WeightedSample = Q(
    "tx31_weighted_sample",
    (s, d) => {
      val m = 4503599627370496.0 // 2^52
      val pri = documents(s, d)
        .select(col("doc_id"), col("source"),
          (col("n_chars").cast("double") * m /
            (conv(substring(md5(concat(col("doc_id").cast("string"),
              lit("|ws"))), 1, 13), 16, 10).cast("double") + 1.0))
            .as("q"))
      val thr = pri.groupBy(col("source"))
        .agg(coalesce(
          try_element_at(graft.functions.VectorFunctions
            .topk_values(col("q"), 50), lit(50)), lit(0.0)).as("thr"))
      pri.join(broadcast(thr), Seq("source"))
        .filter(col("q") >= col("thr"))
        .select(col("source"), col("doc_id"))
        .orderBy(col("source"), col("doc_id"))
    },
    sql = Some("""
      WITH p AS (
        SELECT doc_id, source,
               -- explicit DOUBLE: a bare x.0 literal is DECIMAL in
               -- DuckDB, which would route the priority through
               -- decimal arithmetic instead of Spark's IEEE doubles
               n_chars * CAST(4503599627370496 AS DOUBLE) /
                 (CAST(('0x' || substr(md5(doc_id::VARCHAR || '|ws'),
                    1, 13)) AS BIGINT) + 1) AS q
        FROM documents),
      t AS (
        SELECT source, q,
               row_number() OVER (PARTITION BY source ORDER BY q DESC)
                 AS rn
        FROM p),
      thr AS (
        SELECT source,
               COALESCE(MAX(CASE WHEN rn = 50 THEN q END), 0.0) AS thr
        FROM t GROUP BY source)
      SELECT p.source, p.doc_id
      FROM p JOIN thr ON p.source = thr.source
      WHERE p.q >= thr.thr
      ORDER BY p.source, p.doc_id"""))

  /** k-ANONYMITY / l-DIVERSITY audit (dq2) — the privacy gate a corpus
    * release runs over its quasi-identifiers: every (lang, source)
    * cell reports its population, whether it meets k=5 anonymity
    * (fewer than k records in a QI cell means those records are
    * re-identifiable by the cell alone), and the diversity of a
    * sensitive attribute (distinct 256-char size bands; a cell whose
    * members all share one band leaks the attribute even at k≥5).
    * One pass: a two-key hash aggregate with a count-distinct — flags
    * as 0/1 longs so both engines hash identically.
    */
  val dq2KAnonymity = Q(
    "dq2_k_anonymity",
    (s, d) =>
      documents(s, d)
        .groupBy(col("lang"), col("source"))
        .agg(cnt.as("n_docs"),
          countDistinct(expr("n_chars DIV 256")).as("l_div"))
        .select(col("lang"), col("source"), col("n_docs"),
          (col("n_docs") >= 5).cast("long").as("k_anon"),
          col("l_div"),
          (col("l_div") >= 3).cast("long").as("l_diverse"))
        .orderBy(col("lang"), col("source")),
    sql = Some("""
      SELECT lang, source, COUNT(*) AS n_docs,
             CAST(COUNT(*) >= 5 AS BIGINT) AS k_anon,
             COUNT(DISTINCT n_chars // 256) AS l_div,
             CAST(COUNT(DISTINCT n_chars // 256) >= 3 AS BIGINT)
               AS l_diverse
      FROM documents
      GROUP BY lang, source
      ORDER BY lang, source"""))

  /** Data-VALIDATION suite (dq1) — the pre-training gate every corpus
    * refresh runs before anything downstream consumes it: a fixed set
    * of declared constraints (completeness, uniqueness, domain,
    * consistency) evaluated in ONE corpus scan. All constraint
    * aggregates fold into a single global aggregation (scan-local
    * conditional sums — at 100 TB this is one pass + a 1-row shuffle,
    * NOT one job per constraint, the naive per-check loop), then the
    * 1-row result unpivots to the (constraint, observed, passed)
    * report. `observed` is the VIOLATION COUNT (0 = clean) except
    * row_count_min, where it's the row count itself; everything
    * integer-exact.
    */
  val dq1ConstraintReport = Q(
    "dq1_constraint_report",
    (s, d) => {
      val a = documents(s, d).agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("doc_id")).as("n_ids"),
        sum(when(col("doc_id").isNull, 1L).otherwise(0L)).as("null_id"),
        sum(when(col("text").isNull || length(col("text")) === 0, 1L)
          .otherwise(0L)).as("empty_text"),
        sum(when(col("lang").isNull || length(col("lang")) =!= 2, 1L)
          .otherwise(0L)).as("bad_lang"),
        sum(when(col("source").isNull, 1L).otherwise(0L)).as("null_source"),
        sum(when(col("n_chars") =!= length(col("text")), 1L).otherwise(0L))
          .as("bad_nchars"),
        sum(when(col("n_chars") < 0, 1L).otherwise(0L)).as("neg_nchars"))
      def c(name: String, observed: org.apache.spark.sql.Column,
          passed: org.apache.spark.sql.Column) =
        struct(lit(name).as("check_name"), observed.as("observed"),
          when(passed, 1L).otherwise(0L).as("passed"))
      a.select(explode(array(
          c("row_count_min_100", col("n_rows"), col("n_rows") >= 100),
          c("doc_id_unique", col("n_rows") - col("n_ids"),
            col("n_rows") === col("n_ids")),
          c("doc_id_complete", col("null_id"), col("null_id") === 0),
          c("text_nonempty", col("empty_text"), col("empty_text") === 0),
          c("lang_iso2", col("bad_lang"), col("bad_lang") === 0),
          c("source_complete", col("null_source"), col("null_source") === 0),
          c("n_chars_consistent", col("bad_nchars"), col("bad_nchars") === 0),
          c("n_chars_nonnegative", col("neg_nchars"), col("neg_nchars") === 0)
        )).as("r"))
        .select(col("r.check_name").as("check_name"),
          col("r.observed").as("observed"), col("r.passed").as("passed"))
        .orderBy(col("check_name"))
    },
    sql = Some("""
      WITH a AS (
        SELECT COUNT(*) AS n_rows,
               COUNT(DISTINCT doc_id) AS n_ids,
               CAST(SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS null_id,
               CAST(SUM(CASE WHEN text IS NULL OR length(text) = 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS empty_text,
               CAST(SUM(CASE WHEN lang IS NULL OR length(lang) <> 2
                             THEN 1 ELSE 0 END) AS BIGINT) AS bad_lang,
               CAST(SUM(CASE WHEN source IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS null_source,
               CAST(SUM(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END)
                    AS BIGINT) AS bad_nchars,
               CAST(SUM(CASE WHEN n_chars < 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS neg_nchars
        FROM documents)
      SELECT check_name, observed, passed FROM (
        SELECT 'row_count_min_100' AS check_name, n_rows AS observed,
               CAST(CASE WHEN n_rows >= 100 THEN 1 ELSE 0 END AS BIGINT)
                 AS passed FROM a
        UNION ALL
        SELECT 'doc_id_unique', n_rows - n_ids,
               CAST(CASE WHEN n_rows = n_ids THEN 1 ELSE 0 END AS BIGINT)
          FROM a
        UNION ALL
        SELECT 'doc_id_complete', null_id,
               CAST(CASE WHEN null_id = 0 THEN 1 ELSE 0 END AS BIGINT)
          FROM a
        UNION ALL
        SELECT 'text_nonempty', empty_text,
               CAST(CASE WHEN empty_text = 0 THEN 1 ELSE 0 END AS BIGINT)
          FROM a
        UNION ALL
        SELECT 'lang_iso2', bad_lang,
               CAST(CASE WHEN bad_lang = 0 THEN 1 ELSE 0 END AS BIGINT)
          FROM a
        UNION ALL
        SELECT 'source_complete', null_source,
               CAST(CASE WHEN null_source = 0 THEN 1 ELSE 0 END AS BIGINT)
          FROM a
        UNION ALL
        SELECT 'n_chars_consistent', bad_nchars,
               CAST(CASE WHEN bad_nchars = 0 THEN 1 ELSE 0 END AS BIGINT)
          FROM a
        UNION ALL
        SELECT 'n_chars_nonnegative', neg_nchars,
               CAST(CASE WHEN neg_nchars = 0 THEN 1 ELSE 0 END AS BIGINT)
          FROM a)
      ORDER BY check_name"""))

  /** Heavy-hitter tokens via sketch → exact recount (tx32): pass 1 is
    * the native Misra-Gries aggregate
    * ([[org.apache.spark.sql.graft.HeavyHittersSketch]]) — k-1
    * counters per map task, only (item, count_lo) pairs cross the
    * exchange, NEVER the token stream (the groupBy-count alternative
    * shuffles every distinct token; at 100 TB with billions of
    * distincts that exchange is the job). Pass 2 exactly recounts the
    * ≤ k-1 candidates (broadcast semi-join filters map-side) and
    * thresholds on true counts, so the result is deterministic — the
    * MG guarantee (any item with count > n/k is in the sketch) makes
    * the candidate set a superset, and the recount makes it exact.
    * DuckDB oracles the direct computation.
    */
  val q32HeavyHitters = Q(
    "tx32_heavy_hitters",
    (s, d) => {
      val K = 30 // threshold n/30 ≈ 3.33% of the token stream
      val tok = spread(documents(s, d)).select(
        explode(split(trim(col("text")), "\\s+")).as("term"))
      val cands = tok
        .agg(graft.functions.VectorFunctions
          .heavy_hitters(col("term"), K).as("hh"))
        .select(explode(col("hh")).as("c"))
        .select(col("c.item").as("term"))
      val total = tok.agg(cnt.as("n_total"))
      tok.join(broadcast(cands), "term")
        .groupBy(col("term"))
        .agg(cnt.as("n_term"))
        .crossJoin(broadcast(total))
        .filter(col("n_term") * K > col("n_total"))
        .select(col("term"), col("n_term"), col("n_total"))
        .orderBy(col("n_term").desc, col("term"))
    },
    sql = Some("""
      WITH tok AS (
        SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        FROM documents),
      n AS (SELECT COUNT(*) AS n_total FROM tok),
      c AS (SELECT term, COUNT(*) AS n_term FROM tok GROUP BY 1)
      SELECT c.term, c.n_term, n.n_total
      FROM c CROSS JOIN n
      WHERE c.n_term * 30 > n.n_total
      ORDER BY c.n_term DESC, c.term"""),
    bench = true)

  /** CCNet-style PERPLEXITY FILTER as an order statistic: score every
    * doc with the tx28 bigram LM, rank the corpus by mean logprob
    * (ascending, doc_id tie-break — a total order), and drop the worst
    * fifth (grank ≤ n DIV 5 — lowest logprob = highest perplexity).
    * The global rank is [[graft.operators.RankOps.withGlobalRank]] —
    * q20's window-free machinery, so no single-task global sort at any
    * scale. Report: bucket × (count, decimal-routed mean, min/max of
    * the per-doc score) — the before/after readout a filtering run
    * ships. The oracle computes the same rank with a plain
    * ROW_NUMBER(), proving the distributed rank assembly bit-equal.
    */
  val tx33PerplexityFilter = Q(
    "tx33_perplexity_filter",
    (s, d) => {
      // 6dp-quantize the score BEFORE ranking and averaging: the davg
      // DECIMAL(18,6) route is exact only on values already at 6dp,
      // and the quantization must be em3's floor(x·1e6 + 0.5)/1e6 —
      // identical IEEE arithmetic on both engines — because a decimal
      // ROUND's half-boundary behavior differs across engines (seen
      // live: two sf0.1 docs flipped 1µ between Spark round and
      // DuckDB ROUND)
      val ranked = graft.operators.RankOps.withGlobalRank(
        bigramDocLp(s, d).select(col("doc_id"),
          (floor(col("mean_logprob") * 1e6 + 0.5) / 1e6)
            .as("mean_logprob")),
        Seq(col("mean_logprob"), col("doc_id")),
        s.sparkContext.defaultParallelism)
      ranked
        .select(when(col("grank") <= expr("n_total DIV 5"), "dropped")
          .otherwise("kept").as("bucket"), col("mean_logprob"))
        .groupBy(col("bucket"))
        .agg(cnt.as("n_docs"),
          davg(col("mean_logprob")).as("avg_lp"),
          min(col("mean_logprob")).as("min_lp"),
          max(col("mean_logprob")).as("max_lp"))
        .orderBy(col("bucket"))
    },
    sql = Some(s"""
      WITH arr AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
        FROM documents),
      bg AS (
        SELECT doc_id, b[1] AS w1, b[2] AS w2
        FROM (SELECT doc_id, unnest(list_transform(range(1, len(t)),
                i -> [t[i], t[i+1]])) AS b
              FROM arr WHERE len(t) >= 2)),
      tok AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+'))
                 AS term
        FROM documents),
      cb AS (SELECT w1, w2, COUNT(*) AS cb FROM bg GROUP BY 1, 2),
      c1 AS (SELECT w1, COUNT(*) AS c1 FROM bg GROUP BY 1),
      cu AS (SELECT term, COUNT(*) AS cu FROM tok GROUP BY 1),
      n AS (SELECT CAST(SUM(cu) AS DOUBLE) AS n_total FROM cu),
      lp AS (
        SELECT bg.doc_id,
               ROUND(ln(0.75 * (CAST(cb.cb AS DOUBLE)
                                / CAST(c1.c1 AS DOUBLE))
                 + 0.25 * (CAST(cu.cu AS DOUBLE) / n.n_total)), 6) AS lp
        FROM bg
        JOIN cb USING (w1, w2)
        JOIN c1 USING (w1)
        JOIN cu ON cu.term = bg.w2
        CROSS JOIN n),
      doclp AS (
        SELECT doc_id,
               floor(${sqlDsum("lp")} / COUNT(*) * 1e6 + 0.5) / 1e6
                 AS mean_logprob
        FROM lp GROUP BY doc_id),
      ranked AS (
        SELECT mean_logprob,
               ROW_NUMBER() OVER (ORDER BY mean_logprob, doc_id) AS grank,
               COUNT(*) OVER () AS n
        FROM doclp)
      SELECT CASE WHEN grank <= n // 5 THEN 'dropped' ELSE 'kept' END
               AS bucket,
             COUNT(*) AS n_docs,
             ${sqlDavg("mean_logprob")} AS avg_lp,
             MIN(mean_logprob) AS min_lp,
             MAX(mean_logprob) AS max_lp
      FROM ranked
      GROUP BY 1
      ORDER BY bucket"""))

  /** Referential-integrity audit across the warehouse FK chain
    * (lineitem→orders→customer→nation, supplier→nation): per FK, row
    * count, NULL-key count, and ORPHAN count (non-null keys with no
    * parent). Orphan detection is a left-anti equi-join — Catalyst
    * broadcasts the dim-sized parents (nation, customer) and
    * shuffle-joins the fact-sized ones, both linear; the audit row
    * per FK is three scalar aggregates, so the report costs one pass
    * per relation regardless of scale. The integrity contract a
    * pipeline run asserts before training-data joins trust the keys.
    */
  val dq3FkOrphans = Q(
    "dq3_fk_orphans",
    (s, d) => {
      def audit(fkName: String, child: org.apache.spark.sql.DataFrame,
          fk: String, parent: org.apache.spark.sql.DataFrame,
          pk: String) = {
        val stats = child.agg(cnt.as("n_rows"),
          sum(when(col(fk).isNull, 1L).otherwise(0L)).as("n_null_fk"))
        val orphans = child.filter(col(fk).isNotNull)
          .select(col(fk).as("k"))
          .join(parent.select(col(pk).as("k")), Seq("k"), "left_anti")
          .agg(cnt.as("n_orphans"))
        stats.crossJoin(orphans) // two 1-row scalars
          .select(lit(fkName).as("fk"), col("n_rows"), col("n_null_fk"),
            col("n_orphans"))
      }
      audit("customer.c_nationkey->nation", customer(s, d), "c_nationkey",
          nation(s, d), "n_nationkey")
        .unionByName(audit("lineitem.l_orderkey->orders", lineitem(s, d),
          "l_orderkey", orders(s, d), "o_orderkey"))
        .unionByName(audit("orders.o_custkey->customer", orders(s, d),
          "o_custkey", customer(s, d), "c_custkey"))
        .unionByName(audit("supplier.s_nationkey->nation", supplier(s, d),
          "s_nationkey", nation(s, d), "n_nationkey"))
        .orderBy(col("fk"))
    },
    sql = Some("""
      SELECT * FROM (
        SELECT 'customer.c_nationkey->nation' AS fk,
               (SELECT COUNT(*) FROM customer) AS n_rows,
               (SELECT COUNT(*) FROM customer
                WHERE c_nationkey IS NULL) AS n_null_fk,
               (SELECT COUNT(*) FROM customer c
                WHERE c_nationkey IS NOT NULL AND NOT EXISTS
                  (SELECT 1 FROM nation n
                   WHERE n.n_nationkey = c.c_nationkey)) AS n_orphans
        UNION ALL
        SELECT 'lineitem.l_orderkey->orders',
               (SELECT COUNT(*) FROM lineitem),
               (SELECT COUNT(*) FROM lineitem WHERE l_orderkey IS NULL),
               (SELECT COUNT(*) FROM lineitem l
                WHERE l_orderkey IS NOT NULL AND NOT EXISTS
                  (SELECT 1 FROM orders o
                   WHERE o.o_orderkey = l.l_orderkey))
        UNION ALL
        SELECT 'orders.o_custkey->customer',
               (SELECT COUNT(*) FROM orders),
               (SELECT COUNT(*) FROM orders WHERE o_custkey IS NULL),
               (SELECT COUNT(*) FROM orders o
                WHERE o_custkey IS NOT NULL AND NOT EXISTS
                  (SELECT 1 FROM customer c
                   WHERE c.c_custkey = o.o_custkey))
        UNION ALL
        SELECT 'supplier.s_nationkey->nation',
               (SELECT COUNT(*) FROM supplier),
               (SELECT COUNT(*) FROM supplier WHERE s_nationkey IS NULL),
               (SELECT COUNT(*) FROM supplier s
                WHERE s_nationkey IS NOT NULL AND NOT EXISTS
                  (SELECT 1 FROM nation n
                   WHERE n.n_nationkey = s.s_nationkey)))
      ORDER BY fk"""))

  /** CROSS-DOCUMENT repeated-span report (the exact-substring dedup
    * shape of Lee et al., "Deduplicating Training Data Makes Language
    * Models Better", 2022, public): every 8-token window's rolling
    * hash (tx15's native O(n) kernel), a window is REPEATED when it
    * occurs in ≥ 2 distinct documents, and each doc reports its
    * window count, repeated-window count, and distinct repeated
    * spans — the per-doc readout that drives span-cut curation
    * (tx3/dd2 kill whole near-dup docs; this finds the shared
    * boilerplate *inside* otherwise-unique docs). Scale shape: one
    * token-scale explode, one narrow (h, doc_id) exchange for the
    * cross-doc census, one semi-join back on h; at 100 TB the census
    * side can feed a Bloom broadcast (dd9's discipline) instead of
    * the semi-join shuffle. Hash collisions fold identically on both
    * engines (same polynomial, same 60-bit md5 token hashes).
    */
  val tx34SubstringDedup = Q(
    "tx34_substring_dedup",
    (s, d) => {
      val wins = spread(documents(s, d))
        .withColumn("th", expr(
          "transform(split(trim(text), '\\\\s+'), " +
            "t -> cast(conv(substr(md5(t), 1, 15), 16, 10) as bigint))"))
        .withColumn("rh",
          graft.functions.VectorFunctions.rolling_hash(col("th"), 8))
      val w = wins.select(col("doc_id"), explode(col("rh")).as("h"))
      val rep = w.groupBy(col("h"))
        .agg(countDistinct(col("doc_id")).as("nd"))
        .filter(col("nd") >= 2)
        .select(col("h"))
      val perDoc = w.join(rep, Seq("h"), "left_semi")
        .groupBy(col("doc_id"))
        .agg(cnt.as("n_repeated_windows"),
          countDistinct(col("h")).as("n_repeated_distinct"))
      wins.select(col("doc_id"), size(col("rh")).as("n_windows"))
        .join(perDoc, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_windows"),
          coalesce(col("n_repeated_windows"), lit(0L))
            .as("n_repeated_windows"),
          coalesce(col("n_repeated_distinct"), lit(0L))
            .as("n_repeated_distinct"))
        .orderBy(col("doc_id"))
    },
    sql = Some("""
      WITH t AS (
        SELECT doc_id,
               list_transform(regexp_split_to_array(trim(text), '\s+'),
                 s -> CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)
                   % 2147483647) AS th
        FROM documents),
      r AS (
        SELECT doc_id,
               CASE WHEN len(th) >= 8 THEN
                 list_transform(range(1, len(th) - 8 + 2),
                   i -> list_reduce(th[i : i + 7],
                     (a, b) -> (a * 1000003 + b) % 2147483647))
               ELSE [] END AS rh
        FROM t),
      w AS (SELECT doc_id, unnest(rh) AS h FROM r),
      rep AS (
        SELECT h FROM (
          SELECT h, COUNT(DISTINCT doc_id) AS nd FROM w GROUP BY h)
        WHERE nd >= 2),
      pr AS (
        SELECT w.doc_id, COUNT(*) AS n_repeated_windows,
               COUNT(DISTINCT w.h) AS n_repeated_distinct
        FROM w JOIN rep USING (h)
        GROUP BY w.doc_id)
      SELECT r.doc_id, CAST(len(rh) AS INT) AS n_windows,
             COALESCE(pr.n_repeated_windows, 0) AS n_repeated_windows,
             COALESCE(pr.n_repeated_distinct, 0) AS n_repeated_distinct
      FROM r LEFT JOIN pr USING (doc_id)
      ORDER BY r.doc_id"""))

  /** Key-skew diagnostic (dq4) — the report a pipeline runs over a
    * join/aggregation key BEFORE shuffling 100 TB on it: per-key
    * cardinalities folded into a log2 group-size histogram (bucket =
    * ⌊log2(rows-per-key)⌋ via the integer-exact `length(bin(c)) - 1`,
    * no float log), each bucket carrying its key count, row mass,
    * parts-per-million share of the table, and heaviest key size.
    * A fat top bucket is the "salt this key" signal ev11 acts on.
    * ONE scan, two hash aggregations (rows→keys, keys→buckets) — the
    * first is the only full shuffle, partial-aggregated map-side; the
    * table total folds out of the ≤64-row bucket aggregate with a
    * whole-frame window, so nothing re-scans the data for it (the
    * naive scalar-subquery formulation plans a second full scan+agg —
    * plan-gated against).
    */
  val dq4SkewReport = Q(
    "dq4_skew_report",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      events(s, d).groupBy(col("user_id")).agg(cnt.as("c"))
        .groupBy((length(bin(col("c"))) - 1).cast("long").as("log2_bucket"))
        .agg(cnt.as("n_keys"), sum(col("c")).as("bucket_rows"),
          max(col("c")).as("max_key_rows"))
        .withColumn("n_rows", sum(col("bucket_rows")).over(
          Window.rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing)))
        .select(col("log2_bucket"), col("n_keys"), col("bucket_rows"),
          expr("bucket_rows * 1000000 DIV n_rows").as("share_ppm"),
          col("max_key_rows"))
        .orderBy(col("log2_bucket"))
    },
    sql = Some("""
      WITH k AS (
        SELECT user_id, COUNT(*) AS c FROM events GROUP BY user_id),
      h AS (
        SELECT CAST(length(bin(c)) - 1 AS BIGINT) AS log2_bucket,
               COUNT(*) AS n_keys,
               CAST(SUM(c) AS BIGINT) AS bucket_rows,
               MAX(c) AS max_key_rows
        FROM k GROUP BY 1)
      SELECT log2_bucket, n_keys, bucket_rows,
             CAST(bucket_rows * 1000000 //
               CAST(SUM(bucket_rows) OVER () AS BIGINT) AS BIGINT)
               AS share_ppm,
             max_key_rows
      FROM h
      ORDER BY log2_bucket"""))

  /** ONE-PASS column profiler (dq5) — the table-level twin of dq1's
    * constraint suite: every column's null count, exact distinct
    * count, and min/max (numeric columns as doubles — timestamps via
    * epoch micros; string columns lexicographic) computed in a SINGLE
    * aggregation over one scan (30 scan-local aggregate expressions,
    * NOT one job per column — at 100 TB the per-column-loop profiler
    * is 6 scans for no reason), then the 1-row result unpivots to the
    * per-column report.
    */
  val dq5ColumnProfile = Q(
    "dq5_column_profile",
    (s, d) => {
      val o = Tables.orders(s, d)
      def nn(c: String) = sum(when(col(c).isNull, 1L).otherwise(0L))
      val dnull = lit(null).cast("double")
      val snull = lit(null).cast("string")
      val odMicros = unix_micros(col("o_orderdate").cast("timestamp"))
      val a = o.agg(
        cnt.as("n_rows"),
        nn("o_orderkey").as("nn_ok"),
        countDistinct(col("o_orderkey")).as("nd_ok"),
        min(col("o_orderkey")).cast("double").as("mn_ok"),
        max(col("o_orderkey")).cast("double").as("mx_ok"),
        nn("o_custkey").as("nn_ck"),
        countDistinct(col("o_custkey")).as("nd_ck"),
        min(col("o_custkey")).cast("double").as("mn_ck"),
        max(col("o_custkey")).cast("double").as("mx_ck"),
        nn("o_orderstatus").as("nn_os"),
        countDistinct(col("o_orderstatus")).as("nd_os"),
        min(col("o_orderstatus")).as("mn_os"),
        max(col("o_orderstatus")).as("mx_os"),
        nn("o_totalprice").as("nn_tp"),
        countDistinct(col("o_totalprice")).as("nd_tp"),
        min(col("o_totalprice")).as("mn_tp"),
        max(col("o_totalprice")).as("mx_tp"),
        nn("o_orderdate").as("nn_od"),
        countDistinct(col("o_orderdate")).as("nd_od"),
        min(odMicros).cast("double").as("mn_od"),
        max(odMicros).cast("double").as("mx_od"),
        nn("o_orderpriority").as("nn_op"),
        countDistinct(col("o_orderpriority")).as("nd_op"),
        min(col("o_orderpriority")).as("mn_op"),
        max(col("o_orderpriority")).as("mx_op"))
      def num(name: String, k: String) =
        struct(lit(name).as("column_name"), col(s"nn_$k").as("n_nulls"),
          col(s"nd_$k").as("n_distinct"),
          col(s"mn_$k").as("min_num"), col(s"mx_$k").as("max_num"),
          snull.as("min_str"), snull.as("max_str"))
      def str(name: String, k: String) =
        struct(lit(name).as("column_name"), col(s"nn_$k").as("n_nulls"),
          col(s"nd_$k").as("n_distinct"),
          dnull.as("min_num"), dnull.as("max_num"),
          col(s"mn_$k").as("min_str"), col(s"mx_$k").as("max_str"))
      a.select(col("n_rows"), explode(array(
          num("o_orderkey", "ok"), num("o_custkey", "ck"),
          str("o_orderstatus", "os"), num("o_totalprice", "tp"),
          num("o_orderdate", "od"), str("o_orderpriority", "op"))).as("r"))
        .select(col("r.column_name").as("column_name"), col("n_rows"),
          col("r.n_nulls").as("n_nulls"),
          col("r.n_distinct").as("n_distinct"),
          col("r.min_num").as("min_num"), col("r.max_num").as("max_num"),
          col("r.min_str").as("min_str"), col("r.max_str").as("max_str"))
        .orderBy(col("column_name"))
    },
    sql = Some("""
      WITH p AS (
        SELECT 'o_orderkey' AS column_name, COUNT(*) AS n_rows,
               CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_nulls,
               COUNT(DISTINCT o_orderkey) AS n_distinct,
               CAST(MIN(o_orderkey) AS DOUBLE) AS min_num,
               CAST(MAX(o_orderkey) AS DOUBLE) AS max_num,
               CAST(NULL AS VARCHAR) AS min_str,
               CAST(NULL AS VARCHAR) AS max_str
        FROM orders
        UNION ALL
        SELECT 'o_custkey', COUNT(*),
               CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                 AS BIGINT),
               COUNT(DISTINCT o_custkey),
               CAST(MIN(o_custkey) AS DOUBLE), CAST(MAX(o_custkey) AS DOUBLE),
               CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
        FROM orders
        UNION ALL
        SELECT 'o_orderstatus', COUNT(*),
               CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)
                 AS BIGINT),
               COUNT(DISTINCT o_orderstatus),
               CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
               MIN(o_orderstatus), MAX(o_orderstatus)
        FROM orders
        UNION ALL
        SELECT 'o_totalprice', COUNT(*),
               CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END)
                 AS BIGINT),
               COUNT(DISTINCT o_totalprice),
               MIN(o_totalprice), MAX(o_totalprice),
               CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
        FROM orders
        UNION ALL
        SELECT 'o_orderdate', COUNT(*),
               CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END)
                 AS BIGINT),
               COUNT(DISTINCT o_orderdate),
               CAST(MIN(epoch_us(o_orderdate)) AS DOUBLE),
               CAST(MAX(epoch_us(o_orderdate)) AS DOUBLE),
               CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
        FROM orders
        UNION ALL
        SELECT 'o_orderpriority', COUNT(*),
               CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END)
                 AS BIGINT),
               COUNT(DISTINCT o_orderpriority),
               CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
               MIN(o_orderpriority), MAX(o_orderpriority)
        FROM orders)
      SELECT column_name, n_rows, n_nulls, n_distinct,
             min_num, max_num, min_str, max_str
      FROM p
      ORDER BY column_name"""))

  /** Snapshot DRIFT report (dq6) — the check a pipeline runs when a
    * new crawl snapshot lands: has the length distribution moved
    * enough to re-tune downstream filters? Old/new snapshots are
    * tx23's deterministic splits; each side's n_chars histogram
    * (64-char buckets) is computed in one map-side-combined agg, the
    * two ≤16-row histograms full-outer join on bucket, and the drift
    * is each bucket's parts-per-million share delta — all integer
    * arithmetic, no chi-square float. Scale: two scans (or one with a
    * conditional agg — kept as two for snapshot stores that live in
    * different locations), then tiny-side work only.
    */
  /** Outlier audit (dq7): per event type, how many values fail the 3σ
    * test — entirely in EXACT integer arithmetic. (x−μ)² > 9σ² is
    * cleared of divisions by multiplying through by n²:
    * (n·x − S)² > 9·(n·Q − S²) with S=Σx, Q=Σx² over exact cents.
    * The intermediates reach ~10²³, so both engines compute in their
    * exact 128-bit-capable integer types (Spark DECIMAL(38,0), DuckDB
    * HUGEINT) — the BOOLEAN is what crosses the engine boundary, and
    * exact integers make it bit-identical; a float σ would make the
    * boundary rows engine-dependent. Two passes over one scan shape:
    * tiny per-type moment table broadcast back onto the stream — at
    * 100 TB the moments are a map-side aggregate and the outlier pass
    * is scan-local.
    */
  val dq7OutlierReport = Q(
    "dq7_outlier_report",
    (s, d) => {
      val e = Tables.events(s, d).select(col("event_type"),
        expr("CAST(ROUND(value * 100) AS BIGINT)").as("x"))
      val moments = e.groupBy(col("event_type")).agg(
        cnt.as("n"),
        expr("CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0))").as("s"),
        expr("CAST(SUM(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0))")
          .as("q"),
        max(abs(col("x"))).as("mx"))
        // Overflow guard: DECIMAL(38,0) products silently NULL on
        // overflow in non-ANSI mode, which would make the 3σ predicate
        // false and UNDERCOUNT outliers. The largest intermediates are
        // dev² ≤ (2·n·mx)² and 9·(n·q − s²) ≤ 18·(n·mx)², both within
        // 38 digits iff n·mx ≤ 2e18 — assert that loudly per group.
        // (assert_true returns NULL on success, so the filter keeps
        // every row and cannot be pruned out of the plan.)
        .filter(expr(
          """assert_true(CAST(n AS DECIMAL(38,0)) * mx
            |  <= CAST(2000000000000000000 AS DECIMAL(38,0)),
            |  'dq7: n*max|x| exceeds exact DECIMAL(38,0) 3-sigma range; '
            |  || 'shard the scan or widen the arithmetic') IS NULL"""
            .stripMargin))
        .drop("mx")
      e.join(broadcast(moments), Seq("event_type"))
        .withColumn("dev", expr("CAST(n AS DECIMAL(38,0)) * x - s"))
        .groupBy(col("event_type"))
        .agg(max(col("n")).as("n_events"),
          sum(when(expr(
            "dev * dev > 9 * (CAST(n AS DECIMAL(38,0)) * q - s * s)"),
            1L).otherwise(0L)).as("n_outliers"))
        .orderBy(col("event_type"))
    },
    sql = Some("""
      WITH e AS (
        SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS x
        FROM events),
      st AS (
        SELECT event_type, COUNT(*) AS n,
               CAST(SUM(x) AS HUGEINT) AS s,
               SUM(CAST(x AS HUGEINT) * x) AS q
        FROM e GROUP BY 1)
      SELECT e.event_type, MAX(st.n) AS n_events,
             CAST(SUM(CASE WHEN
                 (CAST(st.n AS HUGEINT) * e.x - st.s)
               * (CAST(st.n AS HUGEINT) * e.x - st.s)
               > 9 * (CAST(st.n AS HUGEINT) * st.q - st.s * st.s)
               THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      FROM e JOIN st USING (event_type)
      GROUP BY 1 ORDER BY 1"""))

  val dq6DriftReport = Q(
    "dq6_drift_report",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val base = documents(s, d).select(col("doc_id"), col("n_chars"))
      def hist(df: org.apache.spark.sql.DataFrame, n: String) =
        df.groupBy(expr("n_chars DIV 64").as("bucket"))
          .agg(cnt.as(n))
      val old = hist(base.filter(col("doc_id") % 10 < 8), "n_old")
      val neu = hist(base.filter(col("doc_id") % 10 >= 2), "n_new")
      val wAll = Window.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      old.join(neu, Seq("bucket"), "full_outer")
        .select(col("bucket"),
          coalesce(col("n_old"), lit(0L)).as("n_old"),
          coalesce(col("n_new"), lit(0L)).as("n_new"))
        .withColumn("t_old", sum(col("n_old")).over(wAll))
        .withColumn("t_new", sum(col("n_new")).over(wAll))
        .select(col("bucket"), col("n_old"), col("n_new"),
          expr("n_old * 1000000 DIV t_old").as("share_old_ppm"),
          expr("n_new * 1000000 DIV t_new").as("share_new_ppm"),
          expr("abs(n_new * 1000000 DIV t_new - " +
            "n_old * 1000000 DIV t_old)").as("drift_ppm"))
        .orderBy(col("bucket"))
    },
    sql = Some("""
      WITH o AS (
        SELECT n_chars // 64 AS bucket, COUNT(*) AS n_old
        FROM documents WHERE doc_id % 10 < 8 GROUP BY 1),
      nn AS (
        SELECT n_chars // 64 AS bucket, COUNT(*) AS n_new
        FROM documents WHERE doc_id % 10 >= 2 GROUP BY 1),
      j AS (
        SELECT COALESCE(o.bucket, nn.bucket) AS bucket,
               COALESCE(o.n_old, 0) AS n_old,
               COALESCE(nn.n_new, 0) AS n_new
        FROM o FULL OUTER JOIN nn ON o.bucket = nn.bucket),
      t AS (
        SELECT bucket, n_old, n_new,
               CAST(SUM(n_old) OVER () AS BIGINT) AS t_old,
               CAST(SUM(n_new) OVER () AS BIGINT) AS t_new
        FROM j)
      SELECT bucket, n_old, n_new,
             CAST(n_old * 1000000 // t_old AS BIGINT) AS share_old_ppm,
             CAST(n_new * 1000000 // t_new AS BIGINT) AS share_new_ppm,
             CAST(abs(n_new * 1000000 // t_new -
               n_old * 1000000 // t_old) AS BIGINT) AS drift_ppm
      FROM t
      ORDER BY bucket"""))

  /** Seed-deterministic global shuffle (tx35) — how 100 TB of training
    * data gets "randomly" shuffled reproducibly: every doc hashes to a
    * 60-bit priority from md5(doc_id | seed), shard =
    * priority mod 8, position = dense order of priority within the
    * shard. One hash exchange on `shard` + a partition-local sort —
    * NO global sort, and re-running with the same seed bit-reproduces
    * every (shard, pos) assignment on any cluster size.
    */
  val tx35Shuffle = Q(
    "tx35_deterministic_shuffle",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val h = conv(substring(md5(concat(col("doc_id").cast("string"),
        lit("|s42"))), 1, 15), 16, 10).cast("long")
      documents(s, d).select(col("doc_id"), h.as("h"))
        .withColumn("shard", pmod(col("h"), lit(8L)))
        .withColumn("pos",
          (row_number().over(Window.partitionBy(col("shard"))
            .orderBy(col("h"), col("doc_id"))) - 1).cast("long"))
        .select(col("shard"), col("pos"), col("doc_id"))
        .orderBy(col("shard"), col("pos"))
    },
    sql = Some("""
      WITH p AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(doc_id::VARCHAR || '|s42'),
                 1, 15)) AS BIGINT) AS h
        FROM documents)
      SELECT h % 8 AS shard,
             CAST(ROW_NUMBER() OVER (PARTITION BY h % 8
               ORDER BY h, doc_id) - 1 AS BIGINT) AS pos,
             doc_id
      FROM p
      ORDER BY shard, pos"""))

  /** END-TO-END training-set build (tx36) — the composed pipeline a
    * user actually runs, as ONE query: quality gate (st17's length
    * floor) → exact-dedup keep-list (min id per content hash, tx3's
    * rule) → seeded deterministic shard assignment (tx35's md5
    * priority) → per-shard greedy sequence packing at capacity 512
    * (tx22's offset model, token order = the shard's priority order).
    * Every per-doc row carries its shard, rank, token span, and
    * first/last packed sequence — so the oracle hash-checks the whole
    * composition, not just each stage in isolation. Plan shape: one
    * keyed agg + semi join (dedup), then ONE hash exchange on shard
    * whose partition-local sort feeds both windows — the same
    * exchange discipline ev7's gate locks.
    */
  val tx36TrainingSet = Q(
    "tx36_training_set_build",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val q = documents(s, d).filter(col("n_chars") >= 100)
        .select(col("doc_id"), col("text"), md5(col("text")).as("h"))
      val keep = q.groupBy(col("h")).agg(min(col("doc_id")).as("doc_id"))
      val kept = q.join(keep.select(col("doc_id")), Seq("doc_id"),
        "left_semi")
      val pri = conv(substring(md5(concat(col("doc_id").cast("string"),
        lit("|ts42"))), 1, 15), 16, 10).cast("long")
      val s1 = kept.select(col("doc_id"), pri.as("p"),
          size(split(trim(col("text")), "\\s+")).cast("long")
            .as("n_tokens"))
        .withColumn("shard", pmod(col("p"), lit(4L)))
      val w = Window.partitionBy(col("shard"))
        .orderBy(col("p"), col("doc_id"))
      s1.withColumn("end_off", sum(col("n_tokens")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("pos", (row_number().over(w) - 1).cast("long"))
        .select(col("shard"), col("pos"), col("doc_id"), col("n_tokens"),
          (col("end_off") - col("n_tokens")).as("start_off"),
          expr("(end_off - n_tokens) DIV 512").as("seq_first"),
          expr("(end_off - 1) DIV 512").as("seq_last"))
        .orderBy(col("shard"), col("pos"))
    },
    sql = Some("""
      WITH q AS (
        SELECT doc_id, text, md5(text) AS h
        FROM documents WHERE n_chars >= 100),
      k AS (SELECT h, MIN(doc_id) AS doc_id FROM q GROUP BY h),
      kept AS (
        SELECT q.doc_id, q.text FROM q
        WHERE EXISTS (SELECT 1 FROM k WHERE k.doc_id = q.doc_id)),
      s AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(doc_id::VARCHAR || '|ts42'),
                 1, 15)) AS BIGINT) AS p,
               CAST(len(regexp_split_to_array(trim(text), '\s+'))
                 AS BIGINT) AS n_tokens
        FROM kept),
      o AS (
        SELECT doc_id, p, p % 4 AS shard, n_tokens,
               CAST(SUM(n_tokens) OVER (PARTITION BY p % 4
                 ORDER BY p, doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW) AS BIGINT) AS end_off,
               CAST(ROW_NUMBER() OVER (PARTITION BY p % 4
                 ORDER BY p, doc_id) - 1 AS BIGINT) AS pos
        FROM s)
      SELECT shard, pos, doc_id, n_tokens,
             end_off - n_tokens AS start_off,
             (end_off - n_tokens) // 512 AS seq_first,
             (end_off - 1) // 512 AS seq_last
      FROM o
      ORDER BY shard, pos"""))

  /** Idempotently build the stored text index for `d` (tx37 probes
    * it). Keyed on catalog existence, not a JVM memo (suites recreate
    * the SparkContext — ensureIvfIndex's discipline).
    */
  def ensureTextIndex(s: org.apache.spark.sql.SparkSession,
      d: String): String = synchronized {
    val t = s"graft_text_index_${Integer.toHexString(d.hashCode)}"
    if (!s.catalog.tableExists(t) || !s.catalog.tableExists(t + "_docs") ||
        !s.catalog.tableExists(t + "_meta")) {
      graft.operators.TextRetrievalOps.writeTextIndex(documents(s, d),
        "doc_id", "text", t, location = Some(java.nio.file.Files
          .createTempDirectory("graft_text_idx").toString))
    }
    t
  }

  /** BM25 ranked retrieval off the STORED posting-list index (tx37) —
    * the sparse-lexical member of the retrieval family (dense ANN =
    * sim7, geo = wod7/wod8): textbook BM25 (k1=1.2, b=0.75) over a
    * term-bucketed inverted index; candidates are the bucket-aligned
    * postings of the broadcast query terms, document frequencies fold
    * out of the candidates, the length join is bucket-co-located, and
    * top-10 plans as TakeOrderedAndProject. The oracle recomputes the
    * entire pipeline — tokenization, df/dl/avgdl, the pinned-order
    * IEEE score, 6 dp rounding, decimal-routed sum, rank — from the
    * raw table.
    */
  val tx37Bm25 = Q(
    "tx37_bm25_topk",
    (s, d) =>
      graft.operators.TextRetrievalOps.bm25TopK(s, ensureTextIndex(s, d),
        Seq("spark", "vector", "hash", "window"), topK = 10),
    sql = Some(s"""
      WITH tok AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+'))
                 AS term
        FROM documents),
      meta AS (
        SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS n,
               CAST(COUNT(*) AS DOUBLE) AS tot
        FROM tok),
      dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
      p AS (
        SELECT term, doc_id, COUNT(*) AS tf
        FROM tok
        WHERE term IN ('spark', 'vector', 'hash', 'window')
        GROUP BY term, doc_id),
      dft AS (SELECT term, COUNT(*) AS df FROM p GROUP BY term),
      sc AS (
        SELECT p.doc_id,
               ROUND(ln((meta.n - CAST(dft.df AS DOUBLE) + 0.5) /
                        (CAST(dft.df AS DOUBLE) + 0.5) + 1.0) *
                     (CAST(p.tf AS DOUBLE) * 2.2) /
                     (CAST(p.tf AS DOUBLE) + 1.2 *
                       (0.25 + 0.75 * (CAST(dl.dl AS DOUBLE) /
                         (meta.tot / meta.n)))), 6) AS s
        FROM p
        JOIN dft USING (term)
        JOIN dl USING (doc_id), meta)
      SELECT doc_id, ${sqlDsum("s")} AS score
      FROM sc
      GROUP BY doc_id
      ORDER BY score DESC, doc_id
      LIMIT 10"""))

  /** Incremental index maintenance ≡ rebuild (tx38): the index is
    * built from the low-id three quarters of the corpus, the high-id
    * quarter is folded in via [[graft.operators.TextRetrievalOps
    * .appendToTextIndex]] (bucket-aligned appends + exact meta
    * update, nothing rewritten), and the same BM25 probe must return
    * tx37's answer — so the oracle is tx37's SQL verbatim (dd10/st15's
    * construction-equivalence discipline, applied to the lexical
    * index). The per-run table is rebuilt each invocation: the append
    * MUTATES it, so tx37's catalog-keyed ensure-cache would be wrong
    * here.
    */
  val tx38IncrementalIndex = Q(
    "tx38_incremental_text_index",
    (s, d) => {
      import graft.operators.TextRetrievalOps
      val docs = documents(s, d)
      val r = docs.agg(min(col("doc_id")), max(col("doc_id"))).head()
      val cut = r.getLong(0) + (r.getLong(1) - r.getLong(0) + 1) * 3 / 4
      val t = s"graft_text_incr_${Integer.toHexString(d.hashCode)}"
      TextRetrievalOps.writeTextIndex(docs.filter(col("doc_id") < cut),
        "doc_id", "text", t, location = Some(java.nio.file.Files
          .createTempDirectory("graft_text_incr").toString))
      TextRetrievalOps.appendToTextIndex(s, t,
        docs.filter(col("doc_id") >= cut), "doc_id", "text")
      TextRetrievalOps.bm25TopK(s, t,
        Seq("spark", "vector", "hash", "window"), topK = 10)
    },
    sql = tx37Bm25.sql)

  /** Phrase search (tx39) — exact adjacent-bigram matching ("hash
    * join"), the retrieval primitive BM25's bag-of-words can't
    * express. Computed SCAN-LOCAL as a pure list expression (token
    * positions never explode into rows, no self-join on position —
    * the naive positional-join formulation shuffles the whole token
    * stream); per matching doc: occurrence count. At 100 TB this
    * composes with tx37's index as a candidate-then-verify (postings
    * intersect candidates, this expression verifies adjacency on the
    * fetched docs).
    */
  val tx39PhraseSearch = Q(
    "tx39_phrase_search",
    (s, d) =>
      documents(s, d)
        .select(col("doc_id"),
          split(trim(col("text")), "\\s+").as("toks"))
        .select(col("doc_id"), expr("""
          CASE WHEN size(toks) < 2 THEN 0L ELSE
            CAST(size(filter(sequence(1, size(toks) - 1),
              i -> element_at(toks, CAST(i AS INT)) = 'hash' AND
                   element_at(toks, CAST(i + 1 AS INT)) = 'join'))
              AS BIGINT)
          END""").as("n_occ"))
        .filter(col("n_occ") > 0)
        .orderBy(col("doc_id")),
    sql = Some("""
      WITH t AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
        FROM documents)
      SELECT doc_id,
             CASE WHEN len(toks) < 2 THEN 0 ELSE
               CAST(len(list_filter(range(1, len(toks)),
                 i -> toks[i] = 'hash' AND toks[i+1] = 'join'))
                 AS BIGINT)
             END AS n_occ
      FROM t
      WHERE CASE WHEN len(toks) < 2 THEN 0 ELSE
              len(list_filter(range(1, len(toks)),
                i -> toks[i] = 'hash' AND toks[i+1] = 'join'))
            END > 0
      ORDER BY doc_id"""))

  /** Dataset card (tx40): the one-row corpus summary a training run
    * records next to its data — sizes, vocabulary-bearing token mass,
    * duplication, language spread, short-doc fraction — in ONE pass
    * over the corpus (single scan; the two exact count-distincts share
    * Spark's expand-based multi-distinct aggregation). Alongside the
    * exact unique-text count, the card carries the KMV ESTIMATE of the
    * same quantity: at 100 TB the exact distinct is the one field that
    * stops scaling (a full text shuffle), and the sketch column is the
    * drop-in replacement — shipping both, oracle-checked, documents
    * that the estimator is trustworthy where it matters.
    */
  val tx40DatasetCard = Q(
    "tx40_dataset_card",
    (s, d) => {
      val nt = size(split(trim(col("text")), "\\s+")).cast("long")
      documents(s, d)
        .select(col("lang"), col("text"), nt.as("nt"),
          length(col("text")).cast("long").as("nc"),
          conv(substring(md5(col("text")), 1, 13), 16, 10)
            .cast("long").as("th"))
        .agg(
          cnt.as("n_docs"),
          sum(col("nt")).as("n_tokens_total"),
          sum(col("nc")).as("n_chars_total"),
          countDistinct(col("text")).as("n_unique_texts"),
          graft.functions.VectorFunctions.kmv_sketch(col("th"), 64)
            .as("sk"),
          countDistinct(col("lang")).as("n_langs"),
          sum(when(col("nt") < lit(10L), 1L).otherwise(0L))
            .as("n_short_docs"),
          min(col("nt")).as("min_tokens"),
          max(col("nt")).as("max_tokens"))
        .select(col("n_docs"), col("n_tokens_total"), col("n_chars_total"),
          col("n_unique_texts"),
          graft.functions.VectorFunctions.kmv_estimate(col("sk"))
            .as("est_unique_texts"),
          col("n_langs"), col("n_short_docs"),
          col("min_tokens"), col("max_tokens"),
          expr("(n_docs - n_unique_texts) * 1000000 DIV n_docs")
            .as("dup_ppm"))
    },
    sql = Some("""
      WITH e AS (
        SELECT lang, text,
               CAST(len(regexp_split_to_array(trim(text), '\s+'))
                 AS BIGINT) AS nt,
               CAST(length(text) AS BIGINT) AS nc,
               CAST(('0x' || substr(md5(text), 1, 13)) AS BIGINT) AS th
        FROM documents),
      card AS (
        SELECT COUNT(*) AS n_docs,
               CAST(SUM(nt) AS BIGINT) AS n_tokens_total,
               CAST(SUM(nc) AS BIGINT) AS n_chars_total,
               COUNT(DISTINCT text) AS n_unique_texts,
               COUNT(DISTINCT lang) AS n_langs,
               CAST(SUM(CASE WHEN nt < 10 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_short_docs,
               MIN(nt) AS min_tokens,
               MAX(nt) AS max_tokens
        FROM e),
      dh AS (SELECT DISTINCT th FROM e),
      r AS (
        SELECT th, row_number() OVER (ORDER BY th) AS rn,
               COUNT(*) OVER () AS nd
        FROM dh),
      est AS (
        SELECT CASE WHEN MAX(nd) < 64 THEN MAX(nd)
                    ELSE CAST(FLOOR(CAST(63 AS DOUBLE)
                           * 4503599627370496.0
                           / CAST(MAX(CASE WHEN rn = 64 THEN th END)
                                  AS DOUBLE)) AS BIGINT)
               END AS est_unique_texts
        FROM r)
      SELECT c.n_docs, c.n_tokens_total, c.n_chars_total,
             c.n_unique_texts, est.est_unique_texts, c.n_langs,
             c.n_short_docs, c.min_tokens, c.max_tokens,
             (c.n_docs - c.n_unique_texts) * 1000000 // c.n_docs
               AS dup_ppm
      FROM card c CROSS JOIN est"""))

  /** DELETE-bearing maintenance of the BM25 index (tx41): tx38 proved
    * append ≡ rebuild; this proves CHANGELOG (hard deletes + upserts)
    * ≡ rebuild. The full-corpus index's postings and lengths tables
    * are adopted into versioned serving, [[graft.operators
    * .TextRetrievalOps.applyChangelogToTextIndex]] drops every
    * removed doc's rows and folds in the upserts' recomputed rows
    * (one view-flip per table, meta recomputed exactly), and the same
    * BM25 probe as tx37 runs against the maintained index. The oracle
    * recomputes the whole ranking from the POST-changelog corpus — a
    * cross-engine rebuild-equivalence row (dd20's discipline on the
    * lexical index). Rebuilt per run: deletes make the mutation
    * non-idempotent (tx38's reasoning, one step further).
    */
  val tx41TextIndexDeletes = Q(
    "tx41_text_index_deletes",
    (s, d) => {
      import graft.operators.{BucketedStores, TextRetrievalOps}
      val t = s"graft_text_del_${Integer.toHexString(d.hashCode)}"
      BucketedStores.dropVersioned(s, t)
      BucketedStores.dropVersioned(s, t + "_docs")
      s.sql(s"DROP TABLE IF EXISTS ${t}_meta")
      TextRetrievalOps.writeTextIndex(documents(s, d), "doc_id", "text",
        t, location = Some(java.nio.file.Files
          .createTempDirectory("graft_text_del").toString))
      BucketedStores.adoptVersioned(s, t)
      BucketedStores.adoptVersioned(s, t + "_docs")
      val (upserts, deleteIds) = DedupQueries.indexChangelog(s, d)
      TextRetrievalOps.applyChangelogToTextIndex(s, t, deleteIds,
        upserts, "doc_id", "text")
      TextRetrievalOps.bm25TopK(s, t,
        Seq("spark", "vector", "hash", "window"), topK = 10)
    },
    sql = Some(bm25ChangelogOracleSql))

  /** The BM25 ranking rebuilt from the post-changelog corpus — shared
    * by tx41 (copy-on-write maintenance) and tx42 (merge-on-read):
    * both disciplines must produce this identical top-10.
    */
  private def bm25ChangelogOracleSql: String = s"""
      WITH base AS (
        SELECT doc_id,
               CASE WHEN doc_id % 5 = 0 THEN text || ' upd' ELSE text END
                 AS text
        FROM documents WHERE doc_id % 7 <> 3),
      tok AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+'))
                 AS term
        FROM base),
      meta AS (
        SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS n,
               CAST(COUNT(*) AS DOUBLE) AS tot
        FROM tok),
      dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
      p AS (
        SELECT term, doc_id, COUNT(*) AS tf
        FROM tok
        WHERE term IN ('spark', 'vector', 'hash', 'window')
        GROUP BY term, doc_id),
      dft AS (SELECT term, COUNT(*) AS df FROM p GROUP BY term),
      sc AS (
        SELECT p.doc_id,
               ROUND(ln((meta.n - CAST(dft.df AS DOUBLE) + 0.5) /
                        (CAST(dft.df AS DOUBLE) + 0.5) + 1.0) *
                     (CAST(p.tf AS DOUBLE) * 2.2) /
                     (CAST(p.tf AS DOUBLE) + 1.2 *
                       (0.25 + 0.75 * (CAST(dl.dl AS DOUBLE) /
                         (meta.tot / meta.n)))), 6) AS s
        FROM p
        JOIN dft USING (term)
        JOIN dl USING (doc_id), meta)
      SELECT doc_id, ${sqlDsum("s")} AS score
      FROM sc
      GROUP BY doc_id
      ORDER BY score DESC, doc_id
      LIMIT 10"""

  /** tx41 under MERGE-ON-READ maintenance (tx42): the postings and
    * lengths tables stay append-only through the changelog —
    * tombstones + `_seq`-stamped recomputed rows
    * ([[graft.operators.TextRetrievalOps.applyChangelogToTextIndexMor]]),
    * only the 1-row meta is rewritten — and the same BM25 probe runs
    * against the tombstone-subtracting views. Same oracle as tx41:
    * both maintenance disciplines must produce the identical top-10.
    * Completes the MoR discipline across all three stored index
    * families (LSH/pair dd-pl, lexical tx, dense sim).
    */
  val tx42TextIndexMorDeletes = Q(
    "tx42_text_index_mor_deletes",
    (s, d) => {
      import graft.operators.{BucketedStores, TextRetrievalOps}
      val t = s"graft_text_mor_${Integer.toHexString(d.hashCode)}"
      BucketedStores.dropVersioned(s, t)
      BucketedStores.dropVersioned(s, t + "_docs")
      s.sql(s"DROP TABLE IF EXISTS ${t}_meta")
      TextRetrievalOps.writeTextIndex(documents(s, d), "doc_id", "text",
        t, location = Some(java.nio.file.Files
          .createTempDirectory("graft_text_mor").toString), mor = true)
      val (upserts, deleteIds) = DedupQueries.indexChangelog(s, d)
      TextRetrievalOps.applyChangelogToTextIndexMor(s, t, deleteIds,
        upserts, "doc_id", "text")
      TextRetrievalOps.bm25TopK(s, t,
        Seq("spark", "vector", "hash", "window"), topK = 10)
    },
    sql = Some(bm25ChangelogOracleSql))

  /** tx43: tx37's stored-index BM25 as PURE SQL TEXT — the
    * `GRAFT_BM25('<index>', '<terms>', k)` table-valued macro
    * ([[org.apache.spark.sql.graft.GraftBm25Rewrite]]) expands at
    * parse time to the same textbook scoring over the same postings
    * (IN-list candidates bucket-prune the term-bucketed scan), so
    * tx37's oracle verbatim — lexical retrieval joins ANN (sim12),
    * as-of, time travel, and maintenance on the SQL surface.
    */
  val tx43Bm25Sql = Q(
    "tx43_bm25_sql",
    (s, d) => {
      val t = ensureTextIndex(s, d)
      s.sql("SELECT doc_id, score FROM " +
        s"GRAFT_BM25('$t', 'spark vector hash window', 10) " +
        "ORDER BY score DESC, doc_id")
    },
    sql = tx37Bm25.sql)

  /** tx44: HYBRID retrieval — reciprocal-rank fusion of the lexical
    * (GRAFT_BM25 over the stored postings index) and dense
    * (GRAFT_ANN over the stored IVF index) result lists in ONE SQL
    * statement: score(d) = Σ_lists round(1/(60 + rank_d), 6), the
    * textbook RRF constant, decimal-routed sum, (score DESC, doc_id)
    * tie-break. Both macros expand in the same parse (composition was
    * spec-only until now); the oracle recomputes BOTH retrieval
    * pipelines from the raw tables — tokenization/df/dl/BM25 ranks on
    * one side, quantizer/probes/cosine ranks on the other — and the
    * same fusion, so the hash match proves the fused answer, not just
    * that the statement parses. Ids follow the pipeline convention
    * that `embeddings.vec_id` IS the document id of the embedded doc.
    *
    * Scale shape: each retrieval list is top-k (query-scale); the
    * fusion is a UNION ALL + one tiny aggregation — corpus-scale work
    * stays inside the two index probes (bucket-aligned scans).
    */
  val tx44HybridRrf = Q(
    "tx44_hybrid_rrf",
    (s, d) => {
      val tIdx = ensureTextIndex(s, d)
      val vIdx = SimilarityQueries.ensureIvfIndex(s, d)
      embeddings(s, d).filter(col("vec_id") === 11L)
        .createOrReplaceTempView("tx44_probe")
      s.sql(s"""
        WITH lex AS (
          SELECT doc_id,
                 ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS r
          FROM GRAFT_BM25('$tIdx', 'spark vector hash window', 20)),
        vec AS (
          SELECT ann_id AS doc_id, rank AS r
          FROM GRAFT_ANN('$vIdx', 'tx44_probe', 20, 3)),
        u AS (SELECT doc_id, r FROM lex
              UNION ALL SELECT doc_id, r FROM vec),
        f AS (SELECT doc_id,
                     CAST(SUM(CAST(round(1.0 / (60.0 + r), 6)
                       AS DECIMAL(18,6))) AS DOUBLE) AS rrf_score
              FROM u GROUP BY doc_id)
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY rrf_score DESC, doc_id)
                 AS BIGINT) AS rank,
               doc_id, rrf_score
        FROM f ORDER BY rrf_score DESC, doc_id LIMIT 10""")
    },
    bench = true,
    sql = Some(s"""
      WITH tok AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+'))
                 AS term
        FROM documents),
      meta AS (
        SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS n,
               CAST(COUNT(*) AS DOUBLE) AS tot
        FROM tok),
      dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
      p AS (
        SELECT term, doc_id, COUNT(*) AS tf
        FROM tok
        WHERE term IN ('spark', 'vector', 'hash', 'window')
        GROUP BY term, doc_id),
      dft AS (SELECT term, COUNT(*) AS df FROM p GROUP BY term),
      sc AS (
        SELECT p.doc_id,
               ROUND(ln((meta.n - CAST(dft.df AS DOUBLE) + 0.5) /
                        (CAST(dft.df AS DOUBLE) + 0.5) + 1.0) *
                     (CAST(p.tf AS DOUBLE) * 2.2) /
                     (CAST(p.tf AS DOUBLE) + 1.2 *
                       (0.25 + 0.75 * (CAST(dl.dl AS DOUBLE) /
                         (meta.tot / meta.n)))), 6) AS s
        FROM p
        JOIN dft USING (term)
        JOIN dl USING (doc_id), meta),
      lexs AS (
        SELECT doc_id, ${sqlDsum("s")} AS score
        FROM sc GROUP BY doc_id
        ORDER BY score DESC, doc_id LIMIT 20),
      lex AS (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS r
        FROM lexs),
      v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
            FROM embeddings),
      c AS (SELECT vec_id AS cid, e AS ce FROM v
           ORDER BY vec_id LIMIT 16),
      cscore AS (
        SELECT v.vec_id, c.cid,
               ROUND(list_cosine_similarity(v.e, c.ce), 6) AS cs
        FROM v CROSS JOIN c),
      cranked AS (
        SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                 ORDER BY cs DESC, cid) AS rn
        FROM cscore),
      assign AS (SELECT vec_id, cid FROM cranked WHERE rn = 1),
      probes AS (SELECT vec_id, cid FROM cranked
                 WHERE rn <= 3 AND vec_id = 11),
      cand AS (
        SELECT p.vec_id AS id_a, a.vec_id AS id_b,
               ROUND(list_cosine_similarity(va.e, vb.e), 6) AS score
        FROM probes p
        JOIN assign a ON p.cid = a.cid AND p.vec_id <> a.vec_id
        JOIN v va ON va.vec_id = p.vec_id
        JOIN v vb ON vb.vec_id = a.vec_id),
      vecranked AS (
        SELECT id_b AS doc_id, score,
               ROW_NUMBER() OVER (ORDER BY score DESC, id_b) AS r
        FROM cand),
      vec AS (SELECT doc_id, r FROM vecranked WHERE r <= 20),
      u AS (SELECT doc_id, r FROM lex
            UNION ALL SELECT doc_id, r FROM vec),
      f AS (SELECT doc_id,
                   CAST(SUM(CAST(ROUND(1.0 / (60.0 + r), 6)
                     AS DECIMAL(18,6))) AS DOUBLE) AS rrf_score
            FROM u GROUP BY doc_id)
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY rrf_score DESC, doc_id)
               AS BIGINT) AS rank,
             doc_id, rrf_score
      FROM f ORDER BY rrf_score DESC, doc_id LIMIT 10"""))

  /** tx45: the BATCH (table-driven) GRAFT_BM25 form — the second
    * argument names a `(query_id, terms)` relation and every query in
    * the batch scores in ONE pass over the postings (the actual
    * pipeline shape; the literal form can't batch). Tokenization
    * happens INSIDE the expansion (split + lateral explode — query
    * text flows through a join, never a spliced literal, so the
    * injection guard holds by construction) and the candidate join
    * lands on the BUCKETED `term` column with the tiny term set
    * broadcast — the corpus-scale postings never shuffle (plan-gated
    * in GraftCommandsSpec). Oracle: the full batch recompute —
    * per-query tokenization, per-term df over the union of query
    * terms, BM25 with the pinned order/rounding/decimal discipline,
    * per-query (score DESC, doc_id) rank.
    */
  val tx45Bm25Batch = Q(
    "tx45_bm25_batch_sql",
    (s, d) => {
      import s.implicits._
      val t = ensureTextIndex(s, d)
      Seq((1L, "spark vector"), (2L, "hash window data"),
          (3L, "vector spark"))
        .toDF("query_id", "terms")
        .createOrReplaceTempView("tx45_queries")
      s.sql("SELECT query_id, doc_id, score, CAST(rank AS BIGINT) " +
        s"AS rank FROM GRAFT_BM25('$t', 'tx45_queries', 5) " +
        "ORDER BY query_id, rank")
    },
    sql = Some(s"""
      WITH qs(query_id, terms) AS (
        VALUES (CAST(1 AS BIGINT), 'spark vector'),
               (CAST(2 AS BIGINT), 'hash window data'),
               (CAST(3 AS BIGINT), 'vector spark')),
      qt AS (
        SELECT DISTINCT query_id,
               unnest(regexp_split_to_array(trim(terms), ' +')) AS term
        FROM qs),
      qtd AS (SELECT query_id, term FROM qt WHERE term <> ''),
      tok AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+'))
                 AS term
        FROM documents),
      meta AS (
        SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS n,
               CAST(COUNT(*) AS DOUBLE) AS tot
        FROM tok),
      dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
      p AS (
        SELECT term, doc_id, COUNT(*) AS tf
        FROM tok
        WHERE term IN (SELECT term FROM qtd)
        GROUP BY term, doc_id),
      cand AS (
        SELECT q.query_id, p.term, p.doc_id, p.tf
        FROM p JOIN qtd q ON p.term = q.term),
      dft AS (
        SELECT term, COUNT(DISTINCT doc_id) AS df
        FROM cand GROUP BY term),
      sc AS (
        SELECT c.query_id, c.doc_id,
               ROUND(ln((meta.n - CAST(dft.df AS DOUBLE) + 0.5) /
                        (CAST(dft.df AS DOUBLE) + 0.5) + 1.0) *
                     (CAST(c.tf AS DOUBLE) * 2.2) /
                     (CAST(c.tf AS DOUBLE) + 1.2 *
                       (0.25 + 0.75 * (CAST(dl.dl AS DOUBLE) /
                         (meta.tot / meta.n)))), 6) AS s
        FROM cand c
        JOIN dft ON c.term = dft.term
        JOIN dl ON c.doc_id = dl.doc_id, meta),
      agg AS (
        SELECT query_id, doc_id, ${sqlDsum("s")} AS score
        FROM sc GROUP BY query_id, doc_id),
      rk AS (
        SELECT query_id, doc_id, score,
               ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY score DESC, doc_id) AS rank
        FROM agg)
      SELECT query_id, doc_id, score, CAST(rank AS BIGINT) AS rank
      FROM rk WHERE rank <= 5
      ORDER BY query_id, rank"""))

  /** tx46: BATCH hybrid retrieval — tx44's reciprocal-rank fusion at
    * the pipeline's real shape: BOTH retrieval macros table-driven
    * (GRAFT_BM25 over a `(query_id, terms)` batch, GRAFT_ANN over the
    * matching probe-vector batch, `query_id` = the probe's `vec_id`
    * by the embedding-id convention), fused per query in one SQL
    * statement. One pass over the postings serves every lexical
    * query; one pass over the inverted lists serves every probe; the
    * fusion is a per-query UNION + tiny aggregation. Oracle: the full
    * batch recompute of both pipelines and the fusion.
    */
  val tx46HybridBatchRrf = Q(
    "tx46_hybrid_batch_rrf",
    (s, d) => {
      import s.implicits._
      val tIdx = ensureTextIndex(s, d)
      val vIdx = SimilarityQueries.ensureIvfIndex(s, d)
      Seq((11L, "spark vector"), (17L, "hash window"))
        .toDF("query_id", "terms")
        .createOrReplaceTempView("tx46_queries")
      embeddings(s, d).filter(col("vec_id").isin(11L, 17L))
        .createOrReplaceTempView("tx46_probes")
      s.sql(s"""
        WITH lex AS (
          SELECT query_id, doc_id, rank AS r
          FROM GRAFT_BM25('$tIdx', 'tx46_queries', 20)),
        vec AS (
          SELECT id_a AS query_id, ann_id AS doc_id, rank AS r
          FROM GRAFT_ANN('$vIdx', 'tx46_probes', 20, 3)),
        u AS (SELECT query_id, doc_id, r FROM lex
              UNION ALL SELECT query_id, doc_id, r FROM vec),
        f AS (SELECT query_id, doc_id,
                     CAST(SUM(CAST(round(1.0 / (60.0 + r), 6)
                       AS DECIMAL(18,6))) AS DOUBLE) AS rrf_score
              FROM u GROUP BY query_id, doc_id),
        rk AS (SELECT query_id, doc_id, rrf_score,
                      ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY rrf_score DESC, doc_id) AS rank
               FROM f)
        SELECT query_id, CAST(rank AS BIGINT) AS rank, doc_id, rrf_score
        FROM rk WHERE rank <= 10
        ORDER BY query_id, rank""")
    },
    sql = Some(s"""
      WITH qs(query_id, terms) AS (
        VALUES (CAST(11 AS BIGINT), 'spark vector'),
               (CAST(17 AS BIGINT), 'hash window')),
      qt AS (
        SELECT DISTINCT query_id,
               unnest(regexp_split_to_array(trim(terms), ' +')) AS term
        FROM qs),
      qtd AS (SELECT query_id, term FROM qt WHERE term <> ''),
      tok AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+'))
                 AS term
        FROM documents),
      meta AS (
        SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS n,
               CAST(COUNT(*) AS DOUBLE) AS tot
        FROM tok),
      dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
      p AS (
        SELECT term, doc_id, COUNT(*) AS tf
        FROM tok
        WHERE term IN (SELECT term FROM qtd)
        GROUP BY term, doc_id),
      cand0 AS (
        SELECT q.query_id, p.term, p.doc_id, p.tf
        FROM p JOIN qtd q ON p.term = q.term),
      dft AS (
        SELECT term, COUNT(DISTINCT doc_id) AS df
        FROM cand0 GROUP BY term),
      sc AS (
        SELECT c.query_id, c.doc_id,
               ROUND(ln((meta.n - CAST(dft.df AS DOUBLE) + 0.5) /
                        (CAST(dft.df AS DOUBLE) + 0.5) + 1.0) *
                     (CAST(c.tf AS DOUBLE) * 2.2) /
                     (CAST(c.tf AS DOUBLE) + 1.2 *
                       (0.25 + 0.75 * (CAST(dl.dl AS DOUBLE) /
                         (meta.tot / meta.n)))), 6) AS s
        FROM cand0 c
        JOIN dft ON c.term = dft.term
        JOIN dl ON c.doc_id = dl.doc_id, meta),
      agg AS (
        SELECT query_id, doc_id, ${sqlDsum("s")} AS score
        FROM sc GROUP BY query_id, doc_id),
      lexr AS (
        SELECT query_id, doc_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY score DESC, doc_id) AS r
        FROM agg),
      lex AS (SELECT query_id, doc_id, r FROM lexr WHERE r <= 20),
      v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
            FROM embeddings),
      c AS (SELECT vec_id AS cid, e AS ce FROM v
           ORDER BY vec_id LIMIT 16),
      cscore AS (
        SELECT v.vec_id, c.cid,
               ROUND(list_cosine_similarity(v.e, c.ce), 6) AS cs
        FROM v CROSS JOIN c),
      cranked AS (
        SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                 ORDER BY cs DESC, cid) AS rn
        FROM cscore),
      assign AS (SELECT vec_id, cid FROM cranked WHERE rn = 1),
      probes AS (SELECT vec_id, cid FROM cranked
                 WHERE rn <= 3 AND vec_id IN (11, 17)),
      cand AS (
        SELECT p.vec_id AS id_a, a.vec_id AS id_b,
               ROUND(list_cosine_similarity(va.e, vb.e), 6) AS score
        FROM probes p
        JOIN assign a ON p.cid = a.cid AND p.vec_id <> a.vec_id
        JOIN v va ON va.vec_id = p.vec_id
        JOIN v vb ON vb.vec_id = a.vec_id),
      vecr AS (
        SELECT id_a AS query_id, id_b AS doc_id,
               ROW_NUMBER() OVER (PARTITION BY id_a
                 ORDER BY score DESC, id_b) AS r
        FROM cand),
      vec AS (SELECT query_id, doc_id, r FROM vecr WHERE r <= 20),
      u AS (SELECT query_id, doc_id, r FROM lex
            UNION ALL SELECT query_id, doc_id, r FROM vec),
      f AS (SELECT query_id, doc_id,
                   CAST(SUM(CAST(ROUND(1.0 / (60.0 + r), 6)
                     AS DECIMAL(18,6))) AS DOUBLE) AS rrf_score
            FROM u GROUP BY query_id, doc_id),
      rk AS (SELECT query_id, doc_id, rrf_score,
                    ROW_NUMBER() OVER (PARTITION BY query_id
                      ORDER BY rrf_score DESC, doc_id) AS rank
             FROM f)
      SELECT query_id, CAST(rank AS BIGINT) AS rank, doc_id, rrf_score
      FROM rk WHERE rank <= 10
      ORDER BY query_id, rank"""))

  val all: Seq[Q] = Seq(tx1Tokens, tx2LangStats, tx3ExactDedup, tx4Quality,
    tx5Fingerprint, tx6SourceMix, tx7LangId, tx8Chunking, tx9Sample,
    tx10Tfidf, tx11Logprob, tx12Pipeline, tx13PiiScrub, tx14Repetition,
    tx15RollingFp, tx16BpeTokens, tx17Freeze, tx18BpeMerge, tx19MixWeights,
    tx20Boilerplate, tx21SourceCap, tx22Packing, tx23SnapshotDelta,
    tx24ShardManifest, tx25BpeTrain, tx26BpeTrainEpochs, tx27BpeEncode,
    tx28BigramLm, tx29ChangelogApply, tx30IncrementalAgg,
    tx31WeightedSample, q32HeavyHitters, tx33PerplexityFilter,
    dq1ConstraintReport, dq2KAnonymity, dq3FkOrphans, tx34SubstringDedup,
    dq4SkewReport, dq5ColumnProfile, dq6DriftReport, dq7OutlierReport,
    tx35Shuffle,
    tx36TrainingSet, tx37Bm25, tx38IncrementalIndex, tx39PhraseSearch,
    tx40DatasetCard, tx41TextIndexDeletes, tx42TextIndexMorDeletes,
    tx43Bm25Sql, tx44HybridRrf, tx45Bm25Batch, tx46HybridBatchRrf)
}

package graft.operators

import graft.Tables
import graft.functions.{Portable, TopK}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

/** Text-analysis operators for training-data pipelines: token counting
  * (whitespace + regex token classes), quality scoring (length / stopword /
  * diversity ratios), corpus-profile language identification, and a
  * positional rolling-hash document fingerprint.
  *
  * All are single-pass, shuffle-light (per-doc row-local expressions plus
  * one keyed aggregation where needed) and mirrored exactly in DuckDB SQL.
  */
object TextQueries {
  import Portable._

  /** Stopword list used by the quality score + language profiles. */
  private val Stopwords = Seq("the", "a", "of", "to", "and", "in")
  private def stopSqlList: String = Stopwords.map(w => s"'$w'").mkString("(", ", ", ")")

  /** q81's four-rule quality gate as ONE row-local conjunction over the
    * token array + char count — the single source q98/q100 score with
    * (q81 itself keeps the rules separate for its per-rule failure
    * histogram; these expressions must stay in sync with its flags).
    */
  private[operators] def qualityPass(t: Column, nc: Column): Column = {
    val stopArr = array(Stopwords.map(lit): _*)
    val nTok = size(t).cast("long")
    val nUniq = size(array_distinct(t)).cast("long")
    val nStop = size(filter(t, x => array_contains(stopArr, x))).cast("long")
    nTok.between(25L, 90L) &&
      ((nc - (nTok - 1)).cast("double") / nTok).between(4.0, 5.0) &&
      nStop >= 2 &&
      nUniq.cast("double") / nTok >= 0.5
  }

  /** DuckDB mirror of [[qualityPass]]; `t` is a list expression, `nc` a
    * BIGINT char count. */
  private[operators] def qualityPassSql(t: String, nc: String): String =
    s"""((len($t) BETWEEN 25 AND 90)
       |      AND (CAST($nc - (len($t) - 1) AS DOUBLE) / len($t) BETWEEN 4.0 AND 5.0)
       |      AND len(list_filter($t, x -> x IN $stopSqlList)) >= 2
       |      AND CAST(len(list_distinct($t)) AS DOUBLE) / len($t) >= 0.5)""".stripMargin

  /** Fixed-window chunk frame — THE chunk identity (window `w`, stride
    * `st`, hash60 of the space-joined slice), single source for q88, q96
    * and the streaming chunk dedup (whose Scala mirror
    * [[graft.streaming.GraftStreaming.chunkHashes]] is pinned equal by
    * `StreamingChunkDedupSpec`). Returns (doc_id, source, chunk_idx,
    * n_tok_chunk, chunk_hash); row-local fan-out, no joins.
    */
  private[graft] def chunkFrame(docs: org.apache.spark.sql.DataFrame,
      w: Int, st: Int): org.apache.spark.sql.DataFrame = {
    import docs.sparkSession.implicits._
    docs
      .select($"doc_id", $"source", Portable.spaceSplit($"text").as("t"))
      .filter(size($"t") > 0)
      .select($"doc_id", $"source", $"t",
        posexplode(sequence(lit(0), size($"t") - 1, lit(st)))
          .as(Seq("chunk_idx", "off")))
      .select($"doc_id", $"source", $"chunk_idx".cast("long").as("chunk_idx"),
        least(size($"t") - $"off", lit(w)).cast("long").as("n_tok_chunk"),
        Portable.hash60(concat_ws(" ", slice($"t", $"off" + 1, lit(w))))
          .as("chunk_hash"))
  }

  /** Rolling-hash constants: positional multipliers 13^(i mod 8) mod FpMod. */
  private val FpBase = 13L
  private val FpCycle = 8
  private val fpPow: IndexedSeq[Long] =
    (0 until FpCycle).scanLeft(1L)((acc, _) => (acc * FpBase) % Portable.FpMod).take(FpCycle).toIndexedSeq

  val all: Seq[CatalogQuery] = Seq(

    // Token counting: whitespace tokens, regex word tokens (BPE-ish class
    // split), distinct tokens. Row-local; the scan reads only (doc_id, text).
    CatalogQuery(
      "q24_text_tokens",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select($"doc_id",
            size(Portable.spaceSplit($"text")).cast("long").as("n_ws"),
            size(regexp_extract_all($"text", lit("[a-z]+"), lit(0))).cast("long").as("n_word"),
            size(array_distinct(Portable.spaceSplit($"text"))).cast("long").as("n_distinct"),
            length($"text").cast("long").as("n_chars_m"))
          .orderBy($"doc_id")
      },
      Some("""
        |SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws,
        |  CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS n_word,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
        |  CAST(length(text) AS BIGINT) AS n_chars_m
        |FROM documents ORDER BY doc_id
        |""".stripMargin)),

    // Quality scoring: stopword ratio, lexical diversity, mean token
    // length. Ratios are single double divisions over exact integers and
    // the score mirrors the identical expression tree in DuckDB.
    CatalogQuery(
      "q25_text_quality",
      (s, d) => {
        import s.implicits._
        val stopArr = array(Stopwords.map(lit): _*)
        Tables.documents(s, d)
          .select($"doc_id", $"lang", Portable.spaceSplit($"text").as("t"), length($"text").as("len"))
          .select($"doc_id", $"lang",
            size($"t").cast("long").as("n_tok"),
            size(array_distinct($"t")).cast("long").as("n_uniq"),
            size(filter($"t", x => array_contains(stopArr, x))).cast("long").as("n_stop"),
            $"len".cast("long").as("n_chars_m"))
          .withColumn("stop_ratio", $"n_stop".cast("double") / $"n_tok")
          .withColumn("diversity", $"n_uniq".cast("double") / $"n_tok")
          .withColumn("mean_tok_len",
            ($"n_chars_m" - ($"n_tok" - 1)).cast("double") / $"n_tok")
          .withColumn("quality",
            lit(0.4) * $"diversity" + lit(0.4) * (lit(1.0) - $"stop_ratio")
              + lit(0.2) * least($"mean_tok_len" / lit(8.0), lit(1.0)))
          .select($"doc_id", $"lang", $"n_tok", $"n_uniq", $"n_stop",
            $"stop_ratio", $"diversity", $"mean_tok_len", $"quality")
          .orderBy($"doc_id")
      },
      Some(s"""
        |SELECT doc_id, lang, n_tok, n_uniq, n_stop, stop_ratio, diversity,
        |       mean_tok_len,
        |       0.4 * diversity + 0.4 * (1.0 - stop_ratio)
        |         + 0.2 * least(mean_tok_len / 8.0, 1.0) AS quality
        |FROM (
        |  SELECT doc_id, lang, n_tok, n_uniq, n_stop,
        |    CAST(n_stop AS DOUBLE) / n_tok AS stop_ratio,
        |    CAST(n_uniq AS DOUBLE) / n_tok AS diversity,
        |    CAST(n_chars_m - (n_tok - 1) AS DOUBLE) / n_tok AS mean_tok_len
        |  FROM (
        |    SELECT doc_id, lang,
        |      CAST(len(t) AS BIGINT) AS n_tok,
        |      CAST(len(list_distinct(t)) AS BIGINT) AS n_uniq,
        |      CAST(len(list_filter(t, x -> x IN $stopSqlList)) AS BIGINT) AS n_stop,
        |      CAST(length(text) AS BIGINT) AS n_chars_m
        |    FROM (SELECT doc_id, lang, text, string_split(text, ' ') AS t FROM documents)))
        |ORDER BY doc_id
        |""".stripMargin)),

    // Language ID, corpus-profile n-gram heuristic: build a top-10 token
    // profile per language from the labeled corpus (train), then classify
    // each doc by profile-hit count (argmax, alphabetical tiebreak). The
    // profile is tiny -> broadcast join; scoring is one aggregation.
    CatalogQuery(
      "q26_text_langid",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
        // row-local per-doc tf (TokenCounts kernel): both the training
        // aggregate and the scoring join consume distinct-token rows
        // instead of every token instance — the instance frame never
        // exists, let alone shuffles
        val tfd = docs
          .select($"doc_id", $"lang", explode(Portable.tokenCounts($"text")).as("tc"))
          .select($"doc_id", $"lang", $"tc.tok".as("tok"), $"tc.cnt".as("cnt"))
        // train: top-10 tokens per language (freq desc, token asc).
        // Unlabeled (NULL-lang) docs are excluded from TRAINING — they
        // cannot label a profile, and a NULL p_lang candidate would
        // also diverge between the engines' NULL orderings (Spark
        // sorts NULLS FIRST, DuckDB NULLS LAST); they still get SCORED
        // and predicted like every other doc.
        val freq = tfd.filter($"lang".isNotNull)
          .groupBy($"lang", $"tok").agg(sum($"cnt").as("cnt"))
        val wP = Window.partitionBy($"lang").orderBy($"cnt".desc, $"tok")
        val profile = freq.withColumn("rk", row_number().over(wP)).filter($"rk" <= 10)
          .select($"lang".as("p_lang"), $"tok")
        // score each (doc, candidate lang) by token instances hitting the profile
        val hits = tfd.join(broadcast(profile), Seq("tok"))
          .groupBy($"doc_id", $"p_lang").agg(sum($"cnt").as("score"))
        // argmax per doc as ONE aggregate (min over (-score, p_lang) struct =
        // score desc, lang asc tiebreak) — not a docs x langs crossJoin grid
        // + window: at 100 TB the grid multiplies the doc table by #langs
        // before sorting, while this shape aggregates hits per doc first.
        // Docs with zero profile hits fall back to the alphabetically first
        // language at score 0 (what the grid's all-zero row_number picked),
        // via a one-row broadcast of min(p_lang).
        val best = hits
          .groupBy($"doc_id")
          .agg(min(struct((-$"score").as("ns"), $"p_lang")).as("b"))
          .select($"doc_id", (-$"b.ns").as("score"), $"b.p_lang".as("p_lang"))
        val minLang = profile.agg(min($"p_lang").as("min_lang"))
        docs.select($"doc_id", $"lang")
          .join(best, Seq("doc_id"), "left")
          .crossJoin(broadcast(minLang))
          .select($"doc_id", $"lang".as("true_lang"),
            coalesce($"p_lang", $"min_lang").as("pred_lang"),
            coalesce($"score", lit(0L)).as("score"))
          .withColumn("correct", $"pred_lang" === $"true_lang")
          .orderBy($"doc_id")
      },
      Some("""
        |WITH tok AS (
        |  SELECT doc_id, lang, tok FROM (
        |    SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok FROM documents)
        |  WHERE tok <> ''),
        |freq AS (SELECT lang, tok, count(*) AS cnt FROM tok
        |  WHERE lang IS NOT NULL GROUP BY 1, 2),
        |profile AS (
        |  SELECT lang AS p_lang, tok FROM (
        |    SELECT lang, tok, row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, tok) AS rk
        |    FROM freq)
        |  WHERE rk <= 10),
        |hits AS (
        |  SELECT doc_id, p_lang, count(*) AS score
        |  FROM tok JOIN profile USING (tok) GROUP BY 1, 2),
        |grid AS (
        |  SELECT d.doc_id, d.lang, p.p_lang
        |  FROM documents d CROSS JOIN (SELECT DISTINCT p_lang FROM profile) p),
        |scored AS (
        |  SELECT g.doc_id, g.lang, g.p_lang, coalesce(h.score, 0) AS score
        |  FROM grid g LEFT JOIN hits h ON h.doc_id = g.doc_id AND h.p_lang = g.p_lang)
        |SELECT doc_id, true_lang, pred_lang, score, pred_lang = true_lang AS correct
        |FROM (
        |  SELECT doc_id, lang AS true_lang, p_lang AS pred_lang, CAST(score AS BIGINT) AS score,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, p_lang) AS rk
        |  FROM scored)
        |WHERE rk = 1 ORDER BY doc_id
        |""".stripMargin)),

    // Document fingerprint: positional rolling hash — sum over tokens of
    // hash(token) * 13^(pos mod 8), mod 1000003. Exact integer arithmetic,
    // order-independent sum of positional terms -> identical in DuckDB.
    CatalogQuery(
      "q27_text_fingerprint",
      (s, d) => {
        import s.implicits._
        val powExpr = fpPow.zipWithIndex
          .map { case (p, j) => s"WHEN $j THEN ${p}L" }
          .mkString("CASE CAST(pos % 8 AS INT) ", " ", " END")
        Tables.documents(s, d)
          .select($"doc_id", posexplode(Portable.spaceSplit($"text")).as(Seq("pos", "tok")))
          .filter($"tok" =!= "")
          .select($"doc_id",
            ((hashP($"tok") % Portable.FpMod) * expr(powExpr) % Portable.FpMod).as("term"))
          .groupBy($"doc_id")
          .agg((sum($"term") % Portable.FpMod).as("fingerprint"))
          .orderBy($"doc_id")
      },
      Some {
        val powCase = fpPow.zipWithIndex
          .map { case (p, j) => s"WHEN $j THEN $p" }
          .mkString("CASE (pos % 8) ", " ", " END")
        s"""
          |WITH tok AS (
          |  SELECT doc_id, i - 1 AS pos, t[i] AS tok
          |  FROM (SELECT doc_id, t, unnest(range(1, len(t) + 1)) AS i
          |        FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents))
          |  WHERE t[i] <> '')
          |SELECT doc_id,
          |  CAST(sum((${hashPSql("tok")} % ${Portable.FpMod}) * ($powCase) % ${Portable.FpMod})
          |       % ${Portable.FpMod} AS BIGINT) AS fingerprint
          |FROM tok GROUP BY doc_id ORDER BY doc_id
          |""".stripMargin
      }),

    // PII scrubbing: redact emails, phone numbers, and IPv4 addresses
    // with class tokens and count each redaction — the privacy pass every
    // training pipeline runs before tokenization. The synthetic corpus
    // carries no PII, so the fixture embeds deterministic doc_id-derived
    // PII identically in both engines; the OPERATOR under test is the
    // three-stage regex scrub kernel (patterns restricted to the
    // Java-regex ∩ RE2 common dialect so both engines match identically;
    // counts taken per stage BEFORE that stage's scrub). Entirely
    // row-local — projection-only plan, no exchange before the output
    // sort; at 100 TB this is a pure map stage.
    CatalogQuery(
      "q74_pii_scrub",
      (s, d) => {
        import s.implicits._
        // One codegen'd pass over the document ([[graft.functions.ScrubPii]])
        // instead of six java.util.regex passes — same sequential
        // email→phone→IPv4 semantics the oracle's regex chain runs
        // (PiiScrubSpec pins the equivalence property-wise; the gate
        // checks it end-to-end against RE2).
        Tables.documents(s, d)
          .select($"doc_id", concat($"text",
            lit(" contact user"), $"doc_id".cast("string"),
            lit("@mail.example.com or +1-555-"),
            lpad(($"doc_id" * 7 % 10000).cast("string"), 4, "0"),
            lit(" ip 10."), ($"doc_id" % 256).cast("string"),
            lit(".0."), ($"doc_id" * 3 % 256).cast("string")).as("profile"))
          .select($"doc_id", Portable.scrubPii($"profile").as("p"))
          .select($"doc_id",
            $"p.n_emails".as("n_emails"),
            $"p.n_phones".as("n_phones"),
            $"p.n_ips".as("n_ips"),
            md5($"p.scrubbed").as("scrub_md5"))
          .orderBy($"doc_id")
      },
      Some("""
        |WITH p AS (
        |  SELECT doc_id, text || ' contact user' || CAST(doc_id AS VARCHAR)
        |    || '@mail.example.com or +1-555-'
        |    || lpad(CAST(doc_id * 7 % 10000 AS VARCHAR), 4, '0')
        |    || ' ip 10.' || CAST(doc_id % 256 AS VARCHAR)
        |    || '.0.' || CAST(doc_id * 3 % 256 AS VARCHAR) AS profile
        |  FROM documents),
        |e AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(profile,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
        |      AS n_emails,
        |    regexp_replace(profile,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g')
        |      AS t1
        |  FROM p),
        |ph AS (
        |  SELECT doc_id, n_emails,
        |    CAST(len(regexp_extract_all(t1, '\+\d{1,2}-\d{3}-\d{4}')) AS BIGINT)
        |      AS n_phones,
        |    regexp_replace(t1, '\+\d{1,2}-\d{3}-\d{4}', '<PHONE>', 'g') AS t2
        |  FROM e)
        |SELECT doc_id, n_emails, n_phones,
        |  CAST(len(regexp_extract_all(t2,
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips,
        |  md5(regexp_replace(t2,
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g')) AS scrub_md5
        |FROM ph ORDER BY doc_id
        |""".stripMargin)),

    // Out-of-vocabulary audit: per-source token coverage against the
    // corpus's top-20 vocabulary — the tokenizer-coverage report run
    // before committing a vocab. Two passes, both row-local off the
    // TokenCounts kernel: pass 1 derives the vocabulary (distinct-token
    // frame through one exchange, top-20 via a BOUNDED 20-row collect —
    // the q36/q77 codebook convention); pass 2 scores every doc against
    // the vocabulary as a LITERAL array (array_contains over the in-row
    // token-count array — no join, and zero-token docs keep their row
    // because the array form never explodes) and partial-aggregates
    // straight to the ~20-row source frame. Exchanges: one distinct-token
    // frame + one ~20-row final — never token instances, never a doc join.
    CatalogQuery(
      "q75_oov_rate",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
        val vocab: Seq[String] = docs
          .select(explode(Portable.tokenCounts($"text")).as("t"))
          .groupBy($"t.tok".as("tok")).agg(sum($"t.cnt").cast("long").as("n"))
          .orderBy($"n".desc, $"tok").limit(20)
          .collect().map(_.getString(0)).toSeq
        val vocabArr = array(vocab.map(lit): _*)
        val cnt = (acc: Column, x: Column) => acc + x.getField("cnt")
        docs
          .select($"source", Portable.tokenCounts($"text").as("tc"))
          .select($"source",
            aggregate($"tc", lit(0L), cnt).as("n_tok"),
            aggregate(filter($"tc", x => array_contains(vocabArr, x.getField("tok"))),
              lit(0L), cnt).as("n_in"))
          .groupBy($"source")
          .agg(count(lit(1)).as("n_docs"),
            sum($"n_tok").cast("long").as("total_tok"),
            sum($"n_tok" - $"n_in").cast("long").as("total_oov"))
          .withColumn("oov_rate", $"total_oov".cast("double") / $"total_tok")
          .orderBy($"source")
      },
      Some("""
        |WITH tok AS (
        |  SELECT doc_id, tok, count(*) AS cnt FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
        |  WHERE tok <> '' GROUP BY doc_id, tok),
        |vocab AS (
        |  SELECT tok FROM (
        |    SELECT tok, CAST(sum(cnt) AS BIGINT) AS n FROM tok GROUP BY tok
        |    ORDER BY n DESC, tok LIMIT 20)),
        |pd AS (
        |  SELECT t.doc_id, CAST(sum(t.cnt) AS BIGINT) AS n_tok,
        |    CAST(sum(CASE WHEN v.tok IS NOT NULL THEN t.cnt ELSE 0 END) AS BIGINT)
        |      AS n_in
        |  FROM tok t LEFT JOIN vocab v ON t.tok = v.tok GROUP BY t.doc_id),
        |pj AS (
        |  SELECT d.source, coalesce(pd.n_tok, 0) AS n_tok,
        |    coalesce(pd.n_tok - pd.n_in, 0) AS n_oov
        |  FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS total_tok,
        |  CAST(sum(n_oov) AS BIGINT) AS total_oov,
        |  CAST(sum(n_oov) AS DOUBLE) / sum(n_tok) AS oov_rate
        |FROM pj GROUP BY source ORDER BY source
        |""".stripMargin)),

    // BPE-ish pretokenizer budget: per-source token accounting under a
    // GPT-2-style pretokenizer regex (contraction suffixes | letter runs
    // | digit runs | punctuation runs), restricted to the Java-regex ∩
    // RE2 common dialect (no lookahead — RE2 has none; alternation
    // branches are disjoint at their first character so leftmost-first
    // picks identically in both engines). The synthetic corpus is
    // space-separated lowercase words, so the fixture appends
    // deterministic doc_id-derived mixed content (contractions, version
    // numbers, hashtags) to make every class fire. Class counts come
    // from the one tokenized array (first-char classification), never a
    // second scan. Shape: scan → row-local regex project → partial agg →
    // ONE ~20-row source-keyed exchange → final agg; at 100 TB this is
    // the token-budget report a pipeline runs before mixing sources, and
    // it is a pure map stage plus a constant-size shuffle.
    CatalogQuery(
      "q76_bpe_tokens",
      (s, d) => {
        import s.implicits._
        // One codegen'd pass per doc ([[graft.functions.BpeTokenStats]])
        // instead of regexp_extract_all + per-token classification — the
        // alternation the oracle runs reduces to ordered run-scanning
        // (BpeTokenStatsSpec pins the equivalence property-wise).
        // the fixture includes STRAY apostrophes (possessive-plural na',
        // quoted ''x) so the gate distinguishes true contraction-branch
        // tokens from apostrophe-led punctuation runs in both engines
        val aug = concat($"text",
          lit(" it's v"), ($"doc_id" % 9).cast("string"),
          lit("."), ($"doc_id" * 3 % 10).cast("string"),
          lit(" #t"), ($"doc_id" % 100).cast("string"),
          lit(" don't stop-2024 na' ''x"))
        Tables.documents(s, d)
          .select($"source", Portable.bpeTokenStats(aug).as("t"))
          .select($"source",
            $"t.n_tok".as("n_tok"), $"t.n_alpha".as("n_alpha"),
            $"t.n_num".as("n_num"), $"t.n_contr".as("n_contr"))
          .groupBy($"source")
          .agg(count(lit(1)).as("n_docs"),
            sum($"n_tok").cast("long").as("total_tok"),
            sum($"n_alpha").cast("long").as("total_alpha"),
            sum($"n_num").cast("long").as("total_num"),
            sum($"n_contr").cast("long").as("total_contr"))
          .select($"source", $"n_docs", $"total_tok", $"total_alpha",
            $"total_num", $"total_contr",
            ($"total_tok" - $"total_alpha" - $"total_num" - $"total_contr")
              .as("total_punct"),
            ($"total_tok".cast("double") / $"n_docs").as("tok_per_doc"))
          .orderBy($"source")
      },
      Some("""
        |WITH a AS (
        |  SELECT source, text || ' it''s v' || CAST(doc_id % 9 AS VARCHAR)
        |    || '.' || CAST(doc_id * 3 % 10 AS VARCHAR)
        |    || ' #t' || CAST(doc_id % 100 AS VARCHAR)
        |    || ' don''t stop-2024 na'' ''''x' AS aug
        |  FROM documents),
        |t AS (
        |  SELECT source, regexp_extract_all(aug,
        |    '''(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]+') AS toks
        |  FROM a),
        |c AS (
        |  SELECT source,
        |    CAST(len(toks) AS BIGINT) AS n_tok,
        |    CAST(len(list_filter(toks, x -> regexp_matches(x, '^[A-Za-z]'))) AS BIGINT) AS n_alpha,
        |    CAST(len(list_filter(toks, x -> regexp_matches(x, '^[0-9]'))) AS BIGINT) AS n_num,
        |    CAST(len(list_filter(toks, x -> x IN
        |      ('''s', '''t', '''re', '''ve', '''m', '''ll', '''d'))) AS BIGINT)
        |      AS n_contr
        |  FROM t)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS total_tok,
        |  CAST(sum(n_alpha) AS BIGINT) AS total_alpha,
        |  CAST(sum(n_num) AS BIGINT) AS total_num,
        |  CAST(sum(n_contr) AS BIGINT) AS total_contr,
        |  CAST(sum(n_tok) - sum(n_alpha) - sum(n_num) - sum(n_contr) AS BIGINT)
        |    AS total_punct,
        |  CAST(sum(n_tok) AS DOUBLE) / count(*) AS tok_per_doc
        |FROM c GROUP BY source ORDER BY source
        |""".stripMargin)),

    // Gopher-style composite quality gate: four independent per-doc rules
    // (token-count bounds, mean-token-length bounds, minimum stopword
    // hits, minimum lexical diversity — the published rule families from
    // the Gopher/C4 data-cleaning recipes, thresholds tuned so every rule
    // fires on this corpus) scored in ONE row-local pass, then a
    // per-source verdict report: pass counts plus a per-rule failure
    // histogram, the report an operator reads before dropping a source.
    // Shape: scan → row-local flags (whole-stage codegen; the four rules
    // share the single tokenized array) → map-side partial agg → ONE
    // ~20-row source-keyed exchange. No joins, no windows; at 100 TB the
    // only data-scale work is the scan itself.
    CatalogQuery(
      "q81_quality_gate",
      (s, d) => {
        import s.implicits._
        val stopArr = array(Stopwords.map(lit): _*)
        val flags = Tables.documents(s, d)
          .select($"source", Portable.spaceSplit($"text").as("t"),
            length($"text").cast("long").as("n_chars_m"))
          .select($"source",
            size($"t").cast("long").as("n_tok"),
            size(array_distinct($"t")).cast("long").as("n_uniq"),
            size(filter($"t", x => array_contains(stopArr, x))).cast("long").as("n_stop"),
            $"n_chars_m")
          .select($"source",
            ($"n_tok" >= 25 && $"n_tok" <= 90).as("ok_tok"),
            (($"n_chars_m" - ($"n_tok" - 1)).cast("double") / $"n_tok")
              .between(4.0, 5.0).as("ok_len"),
            ($"n_stop" >= 2).as("ok_stop"),
            ($"n_uniq".cast("double") / $"n_tok" >= 0.5).as("ok_div"))
        flags.groupBy($"source")
          .agg(
            count(lit(1)).as("n_docs"),
            sum(when($"ok_tok" && $"ok_len" && $"ok_stop" && $"ok_div", 1L)
              .otherwise(0L)).as("n_pass"),
            sum(when(!$"ok_tok", 1L).otherwise(0L)).as("fail_tok"),
            sum(when(!$"ok_len", 1L).otherwise(0L)).as("fail_len"),
            sum(when(!$"ok_stop", 1L).otherwise(0L)).as("fail_stop"),
            sum(when(!$"ok_div", 1L).otherwise(0L)).as("fail_div"))
          .withColumn("pass_rate", $"n_pass".cast("double") / $"n_docs")
          .orderBy($"source")
      },
      Some(s"""
        |WITH m AS (
        |  SELECT source,
        |    CAST(len(t) AS BIGINT) AS n_tok,
        |    CAST(len(list_distinct(t)) AS BIGINT) AS n_uniq,
        |    CAST(len(list_filter(t, x -> x IN $stopSqlList)) AS BIGINT) AS n_stop,
        |    CAST(length(text) AS BIGINT) AS n_chars_m
        |  FROM (SELECT source, text, string_split(text, ' ') AS t FROM documents)),
        |f AS (
        |  SELECT source,
        |    (n_tok BETWEEN 25 AND 90) AS ok_tok,
        |    (CAST(n_chars_m - (n_tok - 1) AS DOUBLE) / n_tok BETWEEN 4.0 AND 5.0)
        |      AS ok_len,
        |    (n_stop >= 2) AS ok_stop,
        |    (CAST(n_uniq AS DOUBLE) / n_tok >= 0.5) AS ok_div
        |  FROM m)
        |SELECT source, n_docs, n_pass, fail_tok, fail_len, fail_stop, fail_div,
        |  CAST(n_pass AS DOUBLE) / n_docs AS pass_rate
        |FROM (
        |  SELECT source,
        |    count(*) AS n_docs,
        |    CAST(sum(CASE WHEN ok_tok AND ok_len AND ok_stop AND ok_div
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
        |    CAST(sum(CASE WHEN NOT ok_tok THEN 1 ELSE 0 END) AS BIGINT) AS fail_tok,
        |    CAST(sum(CASE WHEN NOT ok_len THEN 1 ELSE 0 END) AS BIGINT) AS fail_len,
        |    CAST(sum(CASE WHEN NOT ok_stop THEN 1 ELSE 0 END) AS BIGINT) AS fail_stop,
        |    CAST(sum(CASE WHEN NOT ok_div THEN 1 ELSE 0 END) AS BIGINT) AS fail_div
        |  FROM f GROUP BY source)
        |ORDER BY source
        |""".stripMargin)),

    // Fixed-window chunking with overlap (window 32 tokens, stride 24 —
    // the split-documents-into-training/RAG-chunks op; q50 PACKS whole
    // docs into budgets, this SPLITS docs into windows). Each chunk
    // carries its token count and a portable content hash, so downstream
    // chunk-level dedup/indexing needs no second tokenization pass.
    // Shape: row-local offset sequence + slice + hash (one fan-out
    // proportional to tokens/stride, like the shingle explode), no
    // joins; the only exchange is the output sort at this scale and
    // nothing at all when consumed unsorted at 100 TB.
    CatalogQuery(
      "q88_chunk_docs",
      (s, d) => {
        import s.implicits._
        chunkFrame(Tables.documents(s, d), 32, 24)
          .select($"doc_id", $"chunk_idx", $"n_tok_chunk", $"chunk_hash")
          .orderBy($"doc_id", $"chunk_idx")
      },
      Some(s"""
        |WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |  WHERE len(string_split(text, ' ')) > 0),
        |c AS (
        |  SELECT doc_id, t,
        |    CAST(i / 24 AS BIGINT) AS chunk_idx, CAST(i AS BIGINT) AS off
        |  FROM (SELECT doc_id, t, unnest(range(0, len(t), 24)) AS i FROM toks))
        |SELECT doc_id, chunk_idx,
        |  CAST(least(len(t) - off, 32) AS BIGINT) AS n_tok_chunk,
        |  ${hash60Sql("array_to_string(list_slice(t, off + 1, off + 32), ' ')")}
        |    AS chunk_hash
        |FROM c ORDER BY doc_id, chunk_idx
        |""".stripMargin)),

    // BM25 top-k retrieval (Robertson-Spärck Jones, k1 = 1.2, b = 0.75)
    // for a bounded query batch: queries are the first NumQ docs (q36's
    // head-rows convention), each query's terms the TermsPerQ
    // alphabetically-first distinct tokens (order-free, so the SQL
    // mirror is a plain window — and pure-ASCII tokens collate the same
    // in both engines). Scoring is FIXED-POINT integer arithmetic:
    // rational idf (2(N-df)+1)/(2df+1) and the k1/b tf-saturation term
    // are each scaled by 1e5 and floor-divided, so the summed per-term
    // scores are exact 64-bit integers — no libm, no order-dependent
    // double accumulation, bit-identical across engines (ANSI mode
    // would fail loudly on overflow; operands stay < 2^60 for any
    // corpus with <= ~1e9 docs x 1e3-token docs).
    //
    // Shape, and why it holds at 100 TB: three bounded collects (query
    // batch via pushed doc_id filter; one stats row; <= NumQ x TermsPerQ
    // df rows off a ~40-key exchange) turn the whole scoring pass into a
    // ROW-LOCAL expression over the in-row TokenCounts array — tf
    // lookups never explode, docs never join, no doc-keyed exchange
    // exists. Per-query candidates flow straight into the bounded
    // topk_min aggregate (map-side partials keep <= TopN rows per query
    // per partition), so the only data-scale work is corpus map passes.
    CatalogQuery(
      "q89_bm25_topk",
      (s, d) => {
        import s.implicits._
        val NumQ = 5L
        val TermsPerQ = 8
        val TopN = 10
        val Fx = 100000L // fixed-point scale for idf and tf parts
        val docs = Tables.documents(s, d)
        val cnt = (acc: Column, x: Column) => acc + x.getField("cnt")
        // bounded collect #1: the query batch = the NumQ smallest doc_ids
        // (robust to fixtures whose ids don't start at 0). Two scans on
        // purpose: the id probe reads ONLY the doc_id column (a
        // TakeOrdered over (doc_id, text) would drag the whole text
        // column through the scan), then the text fetch pushes an IN
        // filter so parquet row-group stats skip everything else.
        val qids: Seq[Long] = docs
          .select($"doc_id").orderBy($"doc_id").limit(NumQ.toInt)
          .collect().map(_.getLong(0)).toSeq
        val qterms: Seq[(Long, Seq[String])] = docs
          .filter($"doc_id".isin(qids: _*)).select($"doc_id", $"text")
          .collect().sortBy(_.getLong(0))
          .map(r => (r.getLong(0),
            Option(r.getString(1)).getOrElse("").split(' ').filter(_.nonEmpty)
              .distinct.sorted.take(TermsPerQ).toSeq)).toSeq
        val qtNE = qterms.filter(_._2.nonEmpty)
        val allTerms = qtNE.flatMap(_._2).distinct.sorted
        if (qtNE.isEmpty)
          // degenerate batch (no docs, or all-empty texts): the oracle's
          // join form yields zero rows too
          Seq.empty[(Long, Long, Long, Long)].toDF("qid", "rk", "doc_id", "score")
        else {
        // The corpus is tokenized ONCE: `base` reduces each doc to
        // (doc_id, dl, tf0..tf39) — total token count plus one flat
        // INTEGER column per query term (allTerms is driver-known and
        // <= NumQ x TermsPerQ) — and is cached so the stats action below
        // and the scoring pass that follows both read the reduced frame
        // instead of re-running TokenCounts over the text (the r8-judged
        // 3.4x-at-100x gap was exactly this second tokenization). Flat
        // primitive columns, deliberately NOT a term->tf map: MapType
        // defeats the columnar cache and codegen, and a first cut that
        // cached the map measured SLOWER than tokenizing twice. The
        // cached projection is ~42 longs per doc, not the text — at
        // 100 TB it is a sliver of the corpus, read once. Lifetime: per
        // the q36 convention — both harnesses clearCache() per query; a
        // long-lived session evicts under pressure.
        // coalesce: a NULL text must still reach the stats pass (N
        // counts every doc, like the oracle's count(*) FROM documents)
        val tfIdx: Map[String, Int] = allTerms.zipWithIndex.toMap
        val base = docs
          .select($"doc_id", tokenCounts(coalesce($"text", lit(""))).as("tc"))
          .select($"doc_id",
            aggregate($"tc", lit(0L), cnt).as("dl"),
            map_from_entries(
              filter($"tc", x => x.getField("tok").isin(allTerms: _*))).as("tfm"))
          .select($"doc_id" +: $"dl" +: allTerms.map(term =>
            coalesce(element_at($"tfm", term), lit(0L)).as(s"tf${tfIdx(term)}")): _*)
          .cache()
        // bounded collect #2: corpus stats (N docs, T total tokens) AND
        // per-term df in ONE global aggregate over the cached frame —
        // df(term) = docs with tf > 0 (TokenCounts only emits counts
        // >= 1, so map-presence and tf > 0 are the same predicate). No
        // explode, no keyed exchange: one partial-agg row per partition.
        val statAggs: Seq[Column] =
          count(lit(1)).cast("long").as("n") +:
          coalesce(sum($"dl"), lit(0L)).cast("long").as("t") +:
          allTerms.map(term => sum(when(col(s"tf${tfIdx(term)}") > 0, 1L)
            .otherwise(0L)).cast("long").as(s"df${tfIdx(term)}"))
        val statRow = base.agg(statAggs.head, statAggs.tail: _*).collect().head
        val n = statRow.getLong(0)
        val t = statRow.getLong(1)
        val dfMap: Map[String, Long] = allTerms.map(term =>
          term -> statRow.getLong(2 + tfIdx(term))).toMap
        // fixed-point idf per term, computed driver-side over the bounded
        // df map — floor((1e5 * (2(N-df)+1)) / (2df+1)), same floor the
        // oracle's // takes
        val idfFx: Map[String, Long] = allTerms.map { term =>
          val df = dfMap.getOrElse(term, 0L)
          term -> (Fx * (2L * (n - df) + 1L)) / (2L * df + 1L)
        }.toMap
        // row-local scoring: tf is a plain cached integer column —
        // whole-stage codegen, no map lookup, no array traversal;
        // tf-part = floor(1e5 * 44*tf*T / (20*tf*T + 6*T + 18*dl*N))
        // (k1 = 6/5, b = 3/4 cleared to integers over denominator 20T)
        def tf(term: String): Column = col(s"tf${tfIdx(term)}")
        def score(terms: Seq[String]): Column = terms.map { term =>
          val tfc = tf(term)
          val tfFx = Portable.idiv(lit(Fx * 44L) * tfc * lit(t),
            lit(20L) * tfc * lit(t) + lit(6L * t) + lit(18L * n) * $"dl")
          Portable.idiv(lit(idfFx(term)) * tfFx, lit(Fx))
        }.reduce(_ + _)
        val cands = qtNE.map { case (qid, terms) =>
          struct(lit(qid).as("qid"),
            struct((-score(terms)).as("neg_score"), $"doc_id").as("item"))
        }
        // scoring reads the SAME cached reduced frame — no second
        // tokenization. (A null-text doc scores 0 via its empty tfm and
        // is dropped by the score >= 1 filter, exactly like the old
        // null-propagation path and the oracle's join form.)
        base
          .select(explode(array(cands: _*)).as("c"))
          // score >= 1 keeps the candidate sets identical to the oracle's
          // (its join form never sees docs with no query term)
          .filter($"c.item.neg_score" < 0 && $"c.item.doc_id" =!= $"c.qid")
          .groupBy($"c.qid".as("qid"))
          .agg(TopK.topkMin($"c.item", TopN).as("top"))
          .select($"qid", posexplode($"top"))
          .select($"qid", ($"pos" + 1).cast("long").as("rk"),
            $"col.doc_id".as("doc_id"), (-$"col.neg_score").as("score"))
          .orderBy($"qid", $"rk")
        }
      },
      Some("""
        |WITH tok AS (
        |  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
        |  WHERE tok <> '' GROUP BY doc_id, tok),
        |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tok GROUP BY doc_id),
        |st AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |              CAST((SELECT coalesce(sum(tf), 0) FROM tok) AS BIGINT) AS t
        |       FROM documents),
        |qt AS (
        |  SELECT qid, tok FROM (
        |    SELECT doc_id AS qid, tok,
        |      row_number() OVER (PARTITION BY doc_id ORDER BY tok) AS rk
        |    FROM tok
        |    WHERE doc_id IN (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 5))
        |  WHERE rk <= 8),
        |df AS (
        |  SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tok
        |  WHERE tok IN (SELECT DISTINCT tok FROM qt) GROUP BY tok),
        |scored AS (
        |  SELECT qt.qid, tk.doc_id,
        |    CAST(sum(
        |      ((100000 * (2 * (st.n - df.df) + 1)) // (2 * df.df + 1))
        |      * ((4400000 * tk.tf * st.t)
        |         // (20 * tk.tf * st.t + 6 * st.t + 18 * dl.dl * st.n))
        |      // 100000) AS BIGINT) AS score
        |  FROM qt
        |  JOIN tok tk ON tk.tok = qt.tok
        |  JOIN df ON df.tok = qt.tok
        |  JOIN dl ON dl.doc_id = tk.doc_id
        |  CROSS JOIN st
        |  WHERE tk.doc_id <> qt.qid
        |  GROUP BY qt.qid, tk.doc_id
        |  HAVING sum(
        |      ((100000 * (2 * (st.n - df.df) + 1)) // (2 * df.df + 1))
        |      * ((4400000 * tk.tf * st.t)
        |         // (20 * tk.tf * st.t + 6 * st.t + 18 * dl.dl * st.n))
        |      // 100000) >= 1)
        |SELECT qid, CAST(rk AS BIGINT) AS rk, doc_id, score FROM (
        |  SELECT qid, doc_id, score,
        |    row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rk
        |  FROM scored)
        |WHERE rk <= 10 ORDER BY qid, rk
        |""".stripMargin)),

    // Hashed-bigram linear quality classifier — the fastText/CCNet-style
    // "score every doc with a linear model over hashed n-gram features"
    // ENGINE pass (the model here is a deterministic hash-derived weight
    // table, a stand-in for offline-trained weights: what the engine owns
    // is the scoring shape, not the training). Each doc's score is the
    // integer sum of per-bigram weights w(g) = hash60("w:" || (g mod P))
    // mod 2001 - 1000 ∈ [-1000, 1000] — exact 64-bit arithmetic, so
    // cross-engine results are bit-identical (no sigmoid/libm; the sign
    // is the verdict). Shape: ONE corpus pass, entirely row-local
    // (fused NGramHashes kernel → per-element weight → in-row sum), then
    // a ~|sources|-row aggregate. Zero joins, zero data-scale exchanges —
    // the classifier cost is pure map work at any corpus size (the md5
    // per bigram dominates; a production model would memoize a weight
    // array, which is the q36/q77 broadcast-literal convention).
    CatalogQuery(
      "q93_quality_classifier",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.graft.Bridge
        val grams = Bridge.column(graft.functions.NGramHashes(
          Bridge.expression(spaceSplit($"text")), 2))
        val weight: Column => Column = h =>
          (Portable.hash60(concat(lit("w:"), (h % P).cast("string")))
            % 2001L) - 1000L
        Tables.documents(s, d)
          .select($"source", grams.as("g"))
          .filter(size($"g") > 0)
          .select($"source",
            aggregate($"g", lit(0L), (acc, x) => acc + weight(x)).as("score"))
          .groupBy($"source")
          .agg(
            count(lit(1)).as("n_docs"),
            sum(when($"score" > 0, 1L).otherwise(0L)).cast("long").as("n_pos"),
            sum($"score").cast("long").as("sum_score"))
          .orderBy($"source")
      },
      Some(s"""
        |WITH toks AS (
        |  SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2),
        |occ AS (
        |  SELECT doc_id, source,
        |    (${hash60Sql(s"'w:' || CAST(${hashPSql("concat(t[i], ' ', t[i+1])")} AS VARCHAR)")}
        |      % 2001) - 1000 AS w
        |  FROM (SELECT doc_id, source, t, unnest(range(1, len(t))) AS i FROM toks)),
        |sc AS (
        |  SELECT doc_id, source, CAST(sum(w) AS BIGINT) AS score
        |  FROM occ GROUP BY 1, 2)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN score > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
        |  CAST(sum(score) AS BIGINT) AS sum_score
        |FROM sc GROUP BY source ORDER BY source
        |""".stripMargin)),

    // Chunk-level dedup APPLY (the materialization step after q88/q91:
    // Lee '22 keep-first-occurrence): every chunk instance whose content
    // hash appeared earlier — globally ordered by (doc_id, chunk_idx) —
    // is dropped; the report accounts surviving chunk/token mass per
    // source. Shape: chunks fan out row-locally (q88's machinery with
    // source and token count riding along), ONE chunk-hash-keyed
    // aggregate computes each hash's winner as min(struct(doc_id,
    // chunk_idx, source, n_tok)) — map-side combinable, no window sort
    // of the chunk frame, and NO join back: the winners ARE the kept
    // set, so per-source kept mass aggregates straight off the winner
    // structs while totals aggregate off the pre-explode frame. Two
    // corpus map passes + one keyed exchange + two ~|sources|-row
    // aggregates; deterministic at any parallelism (struct min is
    // order-free).
    CatalogQuery(
      "q96_chunk_dedup_apply",
      (s, d) => {
        import s.implicits._
        val chunks = chunkFrame(Tables.documents(s, d), 32, 24)
          .withColumnRenamed("n_tok_chunk", "n_tok")
        val totals = chunks.groupBy($"source")
          .agg(count(lit(1)).as("n_chunks"),
            sum($"n_tok").cast("long").as("tok_total"))
        val kept = chunks
          .groupBy($"chunk_hash")
          .agg(min(struct($"doc_id", $"chunk_idx", $"source", $"n_tok")).as("f"))
          .groupBy($"f.source".as("source"))
          .agg(count(lit(1)).as("n_kept"),
            sum($"f.n_tok").cast("long").as("tok_kept"))
        totals.join(kept, Seq("source"), "left")
          .select($"source", $"n_chunks",
            coalesce($"n_kept", lit(0L)).as("n_kept"),
            $"tok_total", coalesce($"tok_kept", lit(0L)).as("tok_kept"))
          .orderBy($"source")
      },
      Some(s"""
        |WITH toks AS (
        |  SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
        |  WHERE len(string_split(text, ' ')) > 0),
        |c AS (
        |  SELECT doc_id, source,
        |    CAST(i / 24 AS BIGINT) AS chunk_idx,
        |    CAST(least(len(t) - i, 32) AS BIGINT) AS n_tok,
        |    ${hash60Sql("array_to_string(list_slice(t, i + 1, i + 32), ' ')")}
        |      AS chunk_hash
        |  FROM (SELECT doc_id, source, t, unnest(range(0, len(t), 24)) AS i FROM toks)),
        |w AS (
        |  SELECT source, n_tok FROM (
        |    SELECT source, n_tok,
        |      row_number() OVER (PARTITION BY chunk_hash
        |        ORDER BY doc_id, chunk_idx) AS rk
        |    FROM c)
        |  WHERE rk = 1),
        |tot AS (
        |  SELECT source, count(*) AS n_chunks, CAST(sum(n_tok) AS BIGINT) AS tok_total
        |  FROM c GROUP BY source),
        |kp AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
        |    CAST(sum(n_tok) AS BIGINT) AS tok_kept
        |  FROM w GROUP BY source)
        |SELECT tot.source, n_chunks,
        |  coalesce(kp.n_kept, 0) AS n_kept,
        |  tok_total, coalesce(kp.tok_kept, 0) AS tok_kept
        |FROM tot LEFT JOIN kp ON kp.source = tot.source
        |ORDER BY tot.source
        |""".stripMargin)),

    // Dataset card — the per-(source, split) manifest a pipeline signs
    // off on before training: doc and token counts, quality-gate pass
    // count (q81's four rules, same expressions), and exact-duplicate
    // count (q19's content-hash identity; a doc is a duplicate when its
    // hash's FIRST owner — min doc_id, q96's winner convention — is a
    // different doc, wherever that owner lives). Composition shape: one
    // row-local pass computes split/tokens/flags/hash; totals aggregate
    // straight off it; the dup side is a q96-style winner aggregate
    // (Catalyst prunes the tokenization out of that branch — it only
    // needs the hash), so the corpus crosses one content-hash exchange
    // as winner structs and one (source, split) exchange as partials.
    // No windows; the only join is (source, split)-keyed and tiny.
    CatalogQuery(
      "q98_dataset_card",
      (s, d) => {
        import s.implicits._
        val base = Tables.documents(s, d)
          .select($"doc_id", $"source",
            Portable.splitAssign($"doc_id").as("split"),
            Portable.spaceSplit($"text").as("t"),
            length($"text").cast("long").as("nc"),
            Portable.hash60($"text").as("h"))
          .select($"doc_id", $"source", $"split", $"h",
            size($"t").cast("long").as("n_tok"),
            qualityPass($"t", $"nc").as("pass"))
        val totals = base.groupBy($"source", $"split")
          .agg(count(lit(1)).as("n_docs"),
            sum($"n_tok").cast("long").as("tok_total"),
            sum(when($"pass", 1L).otherwise(0L)).cast("long").as("n_pass"))
        val firsts = base
          .groupBy($"h")
          .agg(min(struct($"doc_id", $"source", $"split")).as("f"))
          .groupBy($"f.source".as("source"), $"f.split".as("split"))
          .agg(count(lit(1)).as("n_first"))
        totals.join(firsts, Seq("source", "split"), "left")
          .select($"source", $"split", $"n_docs", $"tok_total", $"n_pass",
            ($"n_docs" - coalesce($"n_first", lit(0L))).as("n_dup"))
          .orderBy($"source", $"split")
      },
      Some(s"""
        |WITH b AS (
        |  SELECT doc_id, source, ${Portable.splitAssignSql("doc_id")} AS split,
        |    string_split(text, ' ') AS t,
        |    CAST(length(text) AS BIGINT) AS nc,
        |    ${hash60Sql("text")} AS h
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, source, split, h,
        |    CAST(len(t) AS BIGINT) AS n_tok,
        |    ${qualityPassSql("t", "nc")} AS pass
        |  FROM b),
        |tot AS (
        |  SELECT source, split, count(*) AS n_docs,
        |    CAST(sum(n_tok) AS BIGINT) AS tok_total,
        |    CAST(sum(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
        |  FROM f GROUP BY 1, 2),
        |w AS (
        |  SELECT source, split, CAST(count(*) AS BIGINT) AS n_first FROM (
        |    SELECT source, split FROM (
        |      SELECT source, split,
        |        row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rk
        |      FROM f)
        |    WHERE rk = 1)
        |  GROUP BY 1, 2)
        |SELECT tot.source, tot.split, n_docs, tok_total, n_pass,
        |  CAST(n_docs - coalesce(w.n_first, 0) AS BIGINT) AS n_dup
        |FROM tot LEFT JOIN w ON w.source = tot.source AND w.split = tot.split
        |ORDER BY tot.source, tot.split
        |""".stripMargin))
  )
}

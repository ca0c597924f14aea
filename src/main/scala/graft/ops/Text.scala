package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.Tables

/** Text-analysis operators over the `documents` table: language ID,
  * quality scoring, token counting, document fingerprinting — the
  * text half of an LLM-training-data pipeline.
  *
  * Portability contract with the DuckDB oracle: every hash is an
  * **unrolled polynomial over `ascii(substr(...))`** — plain integer
  * arithmetic over functions both engines define identically, so the
  * oracle evaluates the *same* formula (no engine-specific murmur/md5
  * in results). Double-typed outputs are built from exact integers
  * with the identical expression shape on both sides, so IEEE ops
  * produce identical bits.
  *
  * Scale notes: every query here is a single narrow projection over
  * the scan followed by at most one aggregation — no joins, no
  * per-doc shuffles; array work happens inside the row (higher-order
  * functions), so a 100 TB corpus runs embarrassingly parallel and
  * the only exchange is the final per-source/per-lang rollup.
  */
object Text {

  /** base^k coefficient for the unrolled polynomial hash. */
  private def powb(base: Long, k: Int): Long =
    (0 until k).foldLeft(1L)((a, _) => a * base)

  /** SQL fragment: polynomial hash of the first `width` chars of
    * expression `e` — `sum ascii(substr(e,k,1)) * base^(width-k)`.
    * `ascii('') = 0` in both engines, so short strings pad with zeros.
    * Valid Spark SQL *and* DuckDB SQL (same string). Every value stays
    * far below 2^63 (base 37, width 8: < 2^47), so DuckDB's
    * overflow-checking BIGINT arithmetic never errors.
    */
  def polyHashSqlB(e: String, width: Int, base: Long): String =
    (1 to width)
      .map(k => s"CAST(ascii(substr($e,$k,1)) AS BIGINT)*${powb(base, width - k)}")
      .mkString("(", " + ", ")")

  /** [[polyHashSqlB]] at the default base 31. */
  def polyHashSql(e: String, width: Int): String = polyHashSqlB(e, width, 31L)

  /** Word list: trim, split on space, drop empties. Spark side. */
  def wordsCol(text: Column): Column =
    filter(split(trim(text), " "), w => w =!= "")

  /** Same as [[wordsCol]] for the DuckDB oracle. */
  def wordsSql(text: String): String =
    s"list_filter(string_split(trim($text), ' '), x -> x <> '')"

  // ---- t21: quality scoring ------------------------------------------------

  /** Heuristic quality score per document: length saturation, lexical
    * diversity, stopword pressure. All inputs are exact integers; the
    * final formula is the same double expression on both sides.
    */
  private def t21Quality(s: SparkSession, d: String): DataFrame =
    Tables
      .documents(s, d)
      .withColumn("words", wordsCol(col("text")))
      .select(
        col("doc_id"),
        length(trim(col("text"))).as("n_chars_m"),
        size(col("words")).as("n_words"),
        size(array_distinct(col("words"))).as("n_uniq"),
        size(filter(col("words"), w => w.isin("the", "a"))).as("n_stop")
      )
      .withColumn("avg_word_len",
        (col("n_chars_m") - (col("n_words") - 1)).cast("double") / col("n_words"))
      .withColumn("stop_ratio", col("n_stop").cast("double") / col("n_words"))
      .withColumn("uniq_ratio", col("n_uniq").cast("double") / col("n_words"))
      .withColumn(
        "quality",
        least(col("n_words").cast("double") / 80.0, lit(1.0)) * 0.4 +
          col("uniq_ratio") * 0.3 + (lit(1.0) - col("stop_ratio")) * 0.3
      )
      .select("doc_id", "n_words", "n_uniq", "n_stop", "avg_word_len",
        "stop_ratio", "uniq_ratio", "quality")
      .orderBy("doc_id")

  private val t21Oracle: String = {
    val ws = wordsSql("text")
    s"""SELECT doc_id, n_words, n_uniq, n_stop,
       |       CAST(n_chars_m - (n_words - 1) AS DOUBLE) / n_words AS avg_word_len,
       |       CAST(n_stop AS DOUBLE) / n_words AS stop_ratio,
       |       CAST(n_uniq AS DOUBLE) / n_words AS uniq_ratio,
       |       least(CAST(n_words AS DOUBLE) / 80.0, 1.0) * 0.4
       |         + (CAST(n_uniq AS DOUBLE) / n_words) * 0.3
       |         + (1.0 - CAST(n_stop AS DOUBLE) / n_words) * 0.3 AS quality
       |FROM (
       |  SELECT doc_id, length(trim(text)) AS n_chars_m,
       |         CAST(len($ws) AS INT) AS n_words,
       |         CAST(len(list_distinct($ws)) AS INT) AS n_uniq,
       |         CAST(len(list_filter($ws, x -> x IN ('the','a'))) AS INT) AS n_stop
       |  FROM documents)
       |ORDER BY doc_id""".stripMargin
  }

  // ---- t22: language identification ---------------------------------------

  /** Marker-word profiles. In a production pipeline these come from
    * per-language frequency tables; here they are fixed sets chosen
    * from the harness vocabulary so the classifier output is
    * non-trivial. Scoring counts occurrences *with multiplicity*;
    * ties resolve by fixed language order (the CASE chain).
    */
  private val markers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("customer", "row", "key"),
    "en" -> Seq("hash", "order", "table"),
    "es" -> Seq("slow", "agg", "merge"),
    "fr" -> Seq("scan", "data", "query"),
    "zh" -> Seq("join", "small", "the")
  )

  private def t22LangId(s: SparkSession, d: String): DataFrame = {
    val base = Tables
      .documents(s, d)
      .withColumn("words", wordsCol(col("text")))
    val scored = markers.foldLeft(base) { case (df, (lang, ms)) =>
      df.withColumn(s"s_$lang",
        size(filter(col("words"), w => w.isin(ms.map(x => x: Any): _*))))
    }
    val best = greatest(markers.map { case (l, _) => col(s"s_$l") }: _*)
    val pred = markers.foldLeft(when(lit(false), "")) { case (c, (l, _)) =>
      c.when(col(s"s_$l") === col("best"), l)
    }
    scored
      .withColumn("best", best)
      .withColumn("pred_lang", pred.otherwise("und"))
      .withColumn("is_match", (col("pred_lang") === col("lang")).cast("int"))
      .select(Seq(col("doc_id"), col("lang"), col("pred_lang"), col("best"), col("is_match")) ++
        markers.map { case (l, _) => col(s"s_$l") }: _*)
      .orderBy("doc_id")
  }

  private val t22Oracle: String = {
    val ws = wordsSql("text")
    val scoreCols = markers
      .map { case (l, ms) =>
        val inList = ms.map(m => s"'$m'").mkString(", ")
        s"CAST(len(list_filter($ws, x -> x IN ($inList))) AS INT) AS s_$l"
      }
      .mkString(",\n         ")
    val bestExpr = markers.map { case (l, _) => s"s_$l" }.mkString("greatest(", ", ", ")")
    val caseExpr = markers
      .map { case (l, _) => s"WHEN s_$l = best THEN '$l'" }
      .mkString("CASE ", " ", " ELSE 'und' END")
    val sCols = markers.map { case (l, _) => s"s_$l" }.mkString(", ")
    s"""SELECT doc_id, lang, $caseExpr AS pred_lang, best,
       |       CAST(($caseExpr) = lang AS INT) AS is_match, $sCols
       |FROM (
       |  SELECT doc_id, lang, $bestExpr AS best, s_de, s_en, s_es, s_fr, s_zh FROM (
       |    SELECT doc_id, lang,
       |         $scoreCols
       |    FROM documents))
       |ORDER BY doc_id""".stripMargin
  }

  // ---- t23: token counting -------------------------------------------------

  /** Whitespace tokens vs regex (BPE-ish pre-tokenizer) tokens,
    * rolled up per source — the corpus-accounting query every
    * training pipeline runs. One scan, one small shuffle on `source`.
    */
  private val tokenPattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  private def t23TokenStats(s: SparkSession, d: String): DataFrame =
    Tables
      .documents(s, d)
      .select(
        col("source"),
        col("n_chars"),
        size(wordsCol(col("text"))).as("ws_tokens"),
        size(regexp_extract_all(col("text"), lit(tokenPattern), lit(0))).as("re_tokens")
      )
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("ws_tokens")).as("sum_ws_tokens"),
        sum(col("re_tokens")).as("sum_re_tokens"),
        (sum(col("ws_tokens")).cast("double") / count(lit(1))).as("avg_tokens_per_doc"),
        (sum(col("n_chars")).cast("double") / sum(col("re_tokens"))).as("chars_per_token")
      )
      .orderBy("source")

  private val t23Oracle: String =
    s"""SELECT source, count(*) AS n_docs,
       |       CAST(sum(ws_tokens) AS BIGINT) AS sum_ws_tokens,
       |       CAST(sum(re_tokens) AS BIGINT) AS sum_re_tokens,
       |       CAST(CAST(sum(ws_tokens) AS BIGINT) AS DOUBLE) / count(*) AS avg_tokens_per_doc,
       |       CAST(CAST(sum(n_chars) AS BIGINT) AS DOUBLE) / CAST(sum(re_tokens) AS BIGINT) AS chars_per_token
       |FROM (
       |  SELECT source, n_chars,
       |         CAST(len(${wordsSql("text")}) AS INT) AS ws_tokens,
       |         CAST(len(regexp_extract_all(text, '$tokenPattern')) AS INT) AS re_tokens
       |  FROM documents)
       |GROUP BY source ORDER BY source""".stripMargin

  // ---- t24: document fingerprinting (winnowing) ----------------------------

  /** Winnowing fingerprints (Schleimer et al., SIGMOD'03): rolling
    * 5-gram char hashes, minimum per sliding window of 4, distinct.
    * The per-doc fingerprint *set* is summarized by order-insensitive
    * exact aggregates (count/min/max/sum) so the compare is stable.
    * All row-local array work — zero shuffles beyond the final sort.
    */
  private def t24Fingerprint(s: SparkSession, d: String): DataFrame = {
    val h5 = polyHashSql("substr(text, CAST(i AS INT), 5)", 5)
    // `grams` is referenced only via per-row slices (never inside a
    // per-element lambda): interpreted HOFs re-evaluate lambda-scoped
    // references once per element, which would make winnowing
    // quadratic in document length.
    Tables
      .documents(s, d)
      // Guarded for short docs: Spark's sequence(1, n<1) is descending
      // (not empty like DuckDB's generate_series) and slice() throws
      // on negative length — a <5-char text or <4-gram doc yields an
      // empty fingerprint set instead of an analysis exception.
      .withColumn("grams", expr(
        s"""CASE WHEN length(text) >= 5
           |THEN transform(sequence(1, length(text)-4), i -> $h5)
           |ELSE CAST(array() AS ARRAY<BIGINT>) END""".stripMargin))
      .withColumn("fps", expr(
        """CASE WHEN size(grams) >= 4 THEN
          |  array_distinct(transform(
          |    arrays_zip(slice(grams, 1, size(grams)-3), slice(grams, 2, size(grams)-3),
          |               slice(grams, 3, size(grams)-3), slice(grams, 4, size(grams)-3)),
          |    t -> least(t['0'], t['1'], t['2'], t['3'])))
          |ELSE CAST(array() AS ARRAY<BIGINT>) END""".stripMargin))
      .select(
        col("doc_id"),
        size(col("fps")).as("n_fps"),
        array_min(col("fps")).as("min_fp"),
        array_max(col("fps")).as("max_fp"),
        expr("aggregate(fps, 0L, (acc, x) -> acc + x)").as("sum_fp")
      )
      .orderBy("doc_id")
  }

  private val t24Oracle: String = {
    val h5 = polyHashSql("substr(text, CAST(i AS INT), 5)", 5)
    s"""SELECT doc_id, CAST(len(fps) AS INT) AS n_fps,
       |       list_min(fps) AS min_fp, list_max(fps) AS max_fp,
       |       CAST(list_sum(fps) AS BIGINT) AS sum_fp
       |FROM (
       |  SELECT doc_id, list_distinct(
       |           list_transform(generate_series(1, len(grams)-3),
       |                          j -> list_min(list_slice(grams, j, j+3)))) AS fps
       |  FROM (
       |    SELECT doc_id,
       |           list_transform(generate_series(1, length(text)-4), i -> $h5) AS grams
       |    FROM documents))
       |ORDER BY doc_id""".stripMargin
  }

  // ---- t25: TF-IDF term ranking -------------------------------------------

  /** Top-3 distinguishing terms per document by tf/df (the idf factor
    * `ln(N/df)` is monotone in 1/df, so ranking by the exact rational
    * tf/df gives the same order as tf·idf without a transcendental —
    * `ln` can differ in the last ulp across libm implementations,
    * which a hash compare would catch).
    *
    * Scale shape: two hash aggregations (term frequency per doc,
    * document frequency per term) and one shuffle join on the term —
    * the canonical distributed TF-IDF plan; nothing is quadratic and
    * no driver-side vocabulary.
    */
  private def t25Tfidf(s: SparkSession, d: String): DataFrame = {
    val words = Tables
      .documents(s, d)
      .select(col("doc_id"), explode(wordsCol(col("text"))).as("w"))
    val tf = words.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
    val df = words.groupBy("w").agg(countDistinct(col("doc_id")).as("df"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy((col("tf").cast("double") / col("df")).desc, col("w"))
    tf.join(df, "w")
      .withColumn("rnk", row_number().over(win))
      .filter(col("rnk") <= 3)
      .select("doc_id", "w", "tf", "df", "rnk")
      .orderBy("doc_id", "rnk")
  }

  private val t25Oracle: String = {
    val ws = wordsSql("text")
    s"""WITH words AS (SELECT doc_id, unnest($ws) AS w FROM documents),
       |tf AS (SELECT doc_id, w, count(*) AS tf FROM words GROUP BY doc_id, w),
       |df AS (SELECT w, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM words GROUP BY w)
       |SELECT doc_id, w, tf, df, rnk FROM (
       |  SELECT tf.doc_id, tf.w, tf.tf, df.df,
       |         CAST(row_number() OVER (PARTITION BY tf.doc_id
       |              ORDER BY CAST(tf.tf AS DOUBLE) / df.df DESC, tf.w) AS INT) AS rnk
       |  FROM tf JOIN df ON tf.w = df.w)
       |WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin
  }

  // ---- t26: deterministic train/val/test split ----------------------------

  /** Content-hash dataset split — the canonical train/val/test
    * assignment of a training-data pipeline. The split key hashes the
    * TEXT, not the id: a re-crawled or re-ingested copy of the same
    * content lands in the same split, so near-identical documents
    * can't leak across the train/test boundary via a new id. The hash
    * is the engines' shared polynomial, so assignment is
    * deterministic and reproducible anywhere — no RNG, no seed file.
    * Scan-only: one row-local projection, one tiny (source, split)
    * rollup.
    */
  private def t26TrainSplit(s: SparkSession, d: String): DataFrame =
    Tables
      .documents(s, d)
      .withColumn("h", expr(s"${polyHashSql("text", 8)} % 100"))
      .withColumn("split",
        when(col("h") < 80, "train").when(col("h") < 90, "val").otherwise("test"))
      .groupBy(col("source"), col("split"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("n_chars_total"),
        min(col("doc_id")).as("min_doc")
      )
      .orderBy("source", "split")

  private val t26Oracle: String =
    s"""SELECT source, split, count(*) AS n_docs,
       |       CAST(sum(n_chars) AS BIGINT) AS n_chars_total,
       |       min(doc_id) AS min_doc
       |FROM (
       |  SELECT source, n_chars, doc_id,
       |         CASE WHEN ${polyHashSql("text", 8)} % 100 < 80 THEN 'train'
       |              WHEN ${polyHashSql("text", 8)} % 100 < 90 THEN 'val'
       |              ELSE 'test' END AS split
       |  FROM documents)
       |GROUP BY source, split ORDER BY source, split""".stripMargin

  // ---- t27: repetition-based quality filters (Gopher rules) ----------------

  /** Gopher-style repetition filters (Rae et al. 2021 §A1.1): a doc
    * whose mass concentrates in few distinct words — or in ONE top
    * word — is boilerplate or a generation loop, not training text.
    * Word-level here (the harness corpus has no line structure; the
    * line/paragraph variants are the same two-level aggregation over
    * a different tokenizer). Shape: explode → (doc, word) count →
    * per-doc rollup — two map-side-combinable hash aggregations, no
    * joins; the largest shuffle key set is the per-doc vocabulary.
    */
  private def t27Repetition(s: SparkSession, d: String): DataFrame =
    Tables
      .documents(s, d)
      .select(col("doc_id"), explode(wordsCol(col("text"))).as("w"))
      .groupBy("doc_id", "w")
      .agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id")
      .agg(
        sum(col("cnt")).as("n_words"),
        count(lit(1)).as("n_uniq"),
        max(col("cnt")).as("top_cnt")
      )
      .withColumn("top_frac", col("top_cnt").cast("double") / col("n_words"))
      .withColumn("dup_frac", lit(1.0) - col("n_uniq").cast("double") / col("n_words"))
      .withColumn("keep",
        (col("n_words") >= 30 && col("top_frac") <= 0.08).cast("int"))
      .select("doc_id", "n_words", "n_uniq", "top_cnt", "top_frac", "dup_frac", "keep")
      .orderBy("doc_id")

  private val t27Oracle: String = {
    val ws = wordsSql("text")
    s"""SELECT doc_id, n_words, n_uniq, top_cnt,
       |       CAST(top_cnt AS DOUBLE) / n_words AS top_frac,
       |       1.0 - CAST(n_uniq AS DOUBLE) / n_words AS dup_frac,
       |       CAST(n_words >= 30 AND CAST(top_cnt AS DOUBLE) / n_words <= 0.08 AS INT) AS keep
       |FROM (
       |  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_words,
       |         count(*) AS n_uniq, max(cnt) AS top_cnt
       |  FROM (SELECT doc_id, w, count(*) AS cnt
       |        FROM (SELECT doc_id, unnest($ws) AS w FROM documents)
       |        GROUP BY doc_id, w)
       |  GROUP BY doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  // ---- t28: PII redaction ---------------------------------------------------

  /** PII scrubbing: count and redact email / IPv4 / phone patterns.
    * The corpus carries no natural PII, so the query PLANTS a
    * deterministic contact line per doc (both engines build the same
    * string), then redacts it — the assertion is that counting and
    * replacement behave identically at any scale. Row-local regex
    * over the scan: zero shuffles; the redacted text is summarized by
    * its md5 (engine-shared digest) rather than returned wholesale.
    * Parity notes: patterns stay in the RE2 ∩ java.util.regex common
    * subset (char classes, +, \\.), and the DuckDB side needs the 'g'
    * flag to match Spark's replace-all default.
    */
  private val emailRe = "[a-z0-9]+@[a-z0-9.]+"
  private val ipRe = "[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+"
  private val telRe = "555-[0-9]+"
  private val plantSql =
    "text || ' contact u' || doc_id || '@ex.com or 10.0.' || (doc_id % 256) || " +
      "'.' || (doc_id % 100) || ' tel 555-0' || (doc_id % 1000)"

  private def t28PiiRedact(s: SparkSession, d: String): DataFrame =
    Tables
      .documents(s, d)
      .withColumn("full_text", expr(plantSql))
      .select(
        col("doc_id"),
        size(regexp_extract_all(col("full_text"), lit(emailRe), lit(0))).as("n_email"),
        size(regexp_extract_all(col("full_text"), lit(ipRe), lit(0))).as("n_ip"),
        size(regexp_extract_all(col("full_text"), lit(telRe), lit(0))).as("n_tel"),
        md5(
          regexp_replace(
            regexp_replace(
              regexp_replace(col("full_text"), lit(emailRe), lit("<EMAIL>")),
              lit(ipRe), lit("<IP>")),
            lit(telRe), lit("<TEL>"))).as("red_md5")
      )
      .orderBy("doc_id")

  private val t28Oracle: String =
    s"""SELECT doc_id,
       |       CAST(len(regexp_extract_all(full_text, '[a-z0-9]+@[a-z0-9.]+')) AS INT) AS n_email,
       |       CAST(len(regexp_extract_all(full_text, '[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+')) AS INT) AS n_ip,
       |       CAST(len(regexp_extract_all(full_text, '555-[0-9]+')) AS INT) AS n_tel,
       |       md5(regexp_replace(regexp_replace(regexp_replace(full_text,
       |           '[a-z0-9]+@[a-z0-9.]+', '<EMAIL>', 'g'),
       |           '[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+', '<IP>', 'g'),
       |           '555-[0-9]+', '<TEL>', 'g')) AS red_md5
       |FROM (SELECT doc_id, $plantSql AS full_text FROM documents)
       |ORDER BY doc_id""".stripMargin

  // ---- t29: document chunking ----------------------------------------------

  /** Context-window chunking with overlap — the tokenize-and-chunk
    * step between curation and training: windows of 32 tokens at
    * stride 24 (8-token overlap so no span is split across a chunk
    * boundary unseen). Chunk count `1 + ceil((n−32)/24)` is computed
    * with positive-operand integer division only (DuckDB `//` floors,
    * Spark DIV truncates — they agree exactly on non-negatives, which
    * the CASE guarantees). Row-local explode: each doc fans out to
    * O(n/stride) chunk rows with no shuffle; each chunk is summarized
    * by its md5 (engine-shared) rather than materialized.
    */
  private def t29Chunk(s: SparkSession, d: String): DataFrame =
    Tables
      .documents(s, d)
      .withColumn("words", wordsCol(col("text")))
      .withColumn("n", size(col("words")))
      .withColumn("n_chunks", expr(
        "CASE WHEN n <= 32 THEN 1 ELSE 1 + (n - 32 + 23) DIV 24 END"))
      .select(col("doc_id"), col("words"), col("n"),
        explode(expr("sequence(0, n_chunks - 1)")).as("chunk_id"))
      .select(
        col("doc_id"), col("chunk_id").cast("int").as("chunk_id"),
        (col("chunk_id") * 24 + 1).cast("int").as("start"),
        expr("size(slice(words, CAST(chunk_id * 24 + 1 AS INT), 32))").as("n_tokens"),
        md5(expr("array_join(slice(words, CAST(chunk_id * 24 + 1 AS INT), 32), ' ')"))
          .as("chunk_md5")
      )
      .orderBy("doc_id", "chunk_id")

  private val t29Oracle: String = {
    val ws = wordsSql("text")
    s"""SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
       |       CAST(chunk_id * 24 + 1 AS INT) AS start,
       |       CAST(len(list_slice(words, chunk_id * 24 + 1, chunk_id * 24 + 32)) AS INT) AS n_tokens,
       |       md5(array_to_string(list_slice(words, chunk_id * 24 + 1, chunk_id * 24 + 32), ' ')) AS chunk_md5
       |FROM (
       |  SELECT doc_id, words,
       |         unnest(generate_series(0, CASE WHEN len(words) <= 32 THEN 0
       |                ELSE (len(words) - 32 + 23) // 24 END)) AS chunk_id
       |  FROM (SELECT doc_id, $ws AS words FROM documents))
       |ORDER BY doc_id, chunk_id""".stripMargin
  }

  // ---- t30: deterministic source mixing (weighted sampling) ----------------

  /** Training-mixture construction: source `srcI` keeps a per-mill
    * fraction `min((I+1)·50, 1000)` of its documents, selected by a
    * DETERMINISTIC doc-id coin — the base-31 polynomial over the
    * first 8 md5 hex chars of the id, mod 1000 (md5 is engine-shared,
    * so the oracle replays the identical coin). Deterministic
    * sampling is what makes a 100 TB mixture reproducible and
    * incrementally extendable: re-running over a grown corpus keeps
    * every earlier keep/drop decision, so only new documents need
    * downstream processing. Pure scan projection + one low-cardinality
    * agg — the corpus rows themselves never shuffle.
    */
  private def t30DataMix(s: SparkSession, d: String): DataFrame =
    Tables
      .documents(s, d)
      .withColumn("per_mill",
        least((expr("CAST(substr(source, 4, 8) AS INT)") + 1) * 50, lit(1000)))
      .withColumn("coin",
        expr(s"${polyHashSql("md5(CAST(doc_id AS STRING))", 8)} % 1000"))
      .groupBy(col("source"))
      .agg(
        max(col("per_mill")).as("per_mill"),
        count(lit(1)).as("n_total"),
        sum(when(col("coin") < col("per_mill"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("coin") < col("per_mill"), col("n_chars")).otherwise(0L))
          .as("kept_chars")
      )
      .orderBy("source")

  private val t30Oracle: String =
    s"""SELECT source, max(per_mill) AS per_mill, count(*) AS n_total,
       |       CAST(sum(CASE WHEN coin < per_mill THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |       CAST(sum(CASE WHEN coin < per_mill THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars
       |FROM (
       |  SELECT source, n_chars,
       |         least((CAST(substr(source, 4, 8) AS INT) + 1) * 50, 1000) AS per_mill,
       |         ${polyHashSql("md5(CAST(doc_id AS VARCHAR))", 8)} % 1000 AS coin
       |  FROM documents)
       |GROUP BY source ORDER BY source""".stripMargin

  // ---- t31: per-source frequency cap with sampled overflow -----------------

  /** Domain/source frequency capping — the curation rule that stops a
    * single over-crawled source from dominating the mixture: each
    * source keeps its top `cap` documents outright (quality proxy:
    * longest first, doc id as the tiebreak), and the overflow is NOT
    * discarded wholesale but thinned by the same deterministic
    * md5-coin as [[t30DataMix]] at 10% — the two-tier keep/sample
    * policy real pipelines use so capped sources still contribute
    * long-tail diversity. One window pass per source partition plus a
    * row-local coin: no corpus-wide shuffle beyond the rank.
    */
  private def t31SourceCap(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("n_chars").desc, col("doc_id"))
    Tables
      .documents(s, d)
      .withColumn("rk", row_number().over(w))
      .withColumn("coin",
        expr(s"${polyHashSql("md5(CAST(doc_id AS STRING))", 8)} % 1000"))
      .filter(col("rk") <= 15 || col("coin") < 100)
      .select(col("doc_id"), col("source"), col("rk"),
        when(col("rk") <= 15, "top").otherwise("sampled").as("tier"))
      .orderBy("doc_id")
  }

  private val t31Oracle: String =
    s"""SELECT doc_id, source, rk,
       |       CASE WHEN rk <= 15 THEN 'top' ELSE 'sampled' END AS tier
       |FROM (
       |  SELECT doc_id, source,
       |         CAST(row_number() OVER (PARTITION BY source
       |                                 ORDER BY n_chars DESC, doc_id) AS INT) AS rk,
       |         ${polyHashSql("md5(CAST(doc_id AS VARCHAR))", 8)} % 1000 AS coin
       |  FROM documents)
       |WHERE rk <= 15 OR coin < 100
       |ORDER BY doc_id""".stripMargin

  // ---- t35: boilerplate removal by segment document-frequency --------------

  /** The C4/RefinedWeb boilerplate step: a text segment that recurs
    * across MANY documents (cookie banners, nav bars, license
    * footers) is template noise, not content — drop EVERY copy. This
    * is the policy complement of d10's span dedup (d10 keeps the
    * first occurrence; boilerplate removal keeps none): the decision
    * key is the segment's document frequency, computed corpus-wide
    * and joined back, and the output is the per-doc cleaning ledger
    * (segments seen / segments dropped / keep ratio) with the
    * corpus-level boilerplate vocabulary size riding every row.
    *
    * The corpus view plants its own boilerplate the way the web
    * serves it: every 25th doc carries an 8-word subscription banner
    * PREFIX (exactly one [[Dedup.spanSegments]] segment, so the
    * planted df is the planted doc count, provably ≥ the threshold;
    * a suffix would smear into the trailing partial segment and
    * plant nothing).
    *
    * Scale shape: segments shuffle on their md5 digest, never the
    * raw text (d1's rule); df is one map-side-combinable groupBy;
    * the join back is keyed on the same digest; the per-doc rollup
    * shuffles bounded (doc_id, counts) rows. Three keyed exchanges,
    * nothing pairwise, nothing driver-side.
    */
  private def t35Boilerplate(s: SparkSession, d: String): DataFrame = {
    val banner = "subscribe to our newsletter click here now please"
    val docs = Tables.documents(s, d)
      .select(col("doc_id"),
        when(col("doc_id") % 25 === 0, concat(lit(banner + " "), col("text")))
          .otherwise(col("text")).as("text"))
      .withColumn("ws", wordsCol(col("text")))
    val segs = Dedup.spanSegments(docs, 8)
      .select(col("doc_id"), md5(col("seg")).as("k"))
    val dfreq = segs.groupBy("k")
      .agg(countDistinct(col("doc_id")).as("df_docs"))
    val boilerVocab = dfreq.filter(col("df_docs") >= 3)
      .agg(count(lit(1)).as("n_boiler_corpus"))
    val perDoc = segs.join(dfreq, Seq("k"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_segs"),
        sum((col("df_docs") >= 3).cast("long")).as("n_boiler"))
      .withColumn("keep_ratio",
        (col("n_segs") - col("n_boiler")).cast("double") / col("n_segs"))
    perDoc.join(broadcast(boilerVocab)).orderBy("doc_id")
  }

  private val t35Oracle: String = {
    val banner = "subscribe to our newsletter click here now please"
    s"""WITH src AS (
       |  SELECT doc_id,
       |         CASE WHEN doc_id % 25 = 0 THEN '$banner ' || text ELSE text END AS text
       |  FROM documents),
       |docs AS (SELECT doc_id, ${wordsSql("text")} AS ws FROM src),
       |${Dedup.spanSegsSql("docs", 8)},
       |keyed AS (SELECT doc_id, md5(seg) AS k FROM segs),
       |dfreq AS (SELECT k, count(DISTINCT doc_id) AS df_docs FROM keyed GROUP BY k),
       |bc AS (SELECT count(*) AS n_boiler_corpus FROM dfreq WHERE df_docs >= 3),
       |perdoc AS (
       |  SELECT doc_id, count(*) AS n_segs,
       |         sum(CASE WHEN df_docs >= 3 THEN 1 ELSE 0 END) AS n_boiler
       |  FROM keyed JOIN dfreq USING (k) GROUP BY doc_id)
       |SELECT doc_id, CAST(n_segs AS BIGINT) AS n_segs,
       |       CAST(n_boiler AS BIGINT) AS n_boiler,
       |       CAST(n_segs - n_boiler AS DOUBLE) / n_segs AS keep_ratio,
       |       CAST(n_boiler_corpus AS BIGINT) AS n_boiler_corpus
       |FROM perdoc CROSS JOIN bc ORDER BY doc_id""".stripMargin
  }

  // ---- t36: Gopher-rules filter panel --------------------------------------

  /** The published Gopher document-quality rule set (Rae et al. 2021
    * §A1.1) as a per-rule flag panel — the complement of t21's single
    * composite score: a curation run wants to know WHICH rule dropped
    * a document (to tune thresholds per source), so every rule emits
    * its measured ratio and its own pass flag, and `keep` is their
    * conjunction. The harness corpus is flat word soup, so the
    * structural features the rules measure are PLANTED
    * deterministically per doc_id (the t28 pattern — both engines
    * build identical inputs): lines are 10-word chunks; docs with
    * `doc_id % 7 = 0` are fully bulleted (else every (i+doc_id)%3=0
    * line); docs with `doc_id % 11 = 0` end every line in an ellipsis
    * (else every (i+doc_id)%4=1 line); `(doc_id % 4) * 8` non-alpha
    * `###` tokens are appended. Rules: word count ≥ 20, mean word
    * length in [3,10], symbol-to-word ratio ≤ 0.1, bullet-line ratio
    * ≤ 0.9, ellipsis-line ratio ≤ 0.3, alphabetic-word ratio ≥ 0.8,
    * ≥ 2 stopwords.
    *
    * Scale shape: row-local arithmetic over one scan (line-pattern
    * counts are lambda filters over a tiny per-doc index range — no
    * explode, no join, no shuffle at all before the output sort).
    * Determinism: exact integers + IEEE divisions with the identical
    * expression shape on both sides (the repo contract).
    */
  private def t36GopherRules(s: SparkSession, d: String): DataFrame =
    Tables
      .documents(s, d)
      .withColumn("ws", wordsCol(col("text")))
      .select(
        col("doc_id"),
        length(trim(col("text"))).as("n_chars_m"),
        size(col("ws")).as("n_words"),
        size(filter(col("ws"),
          w => w.isin("the", "a", "data", "value", "table"))).as("n_stop")
      )
      .withColumn("n_extra", ((col("doc_id") % 4) * 8).cast("int"))
      .withColumn("n_total", col("n_words") + col("n_extra"))
      .withColumn("n_lines", expr("CAST((n_words + 9) DIV 10 AS INT)"))
      .withColumn("n_bullet", expr(
        """CASE WHEN doc_id % 7 = 0 THEN n_lines
          |     ELSE size(filter(sequence(CAST(0 AS BIGINT), CAST(n_lines - 1 AS BIGINT)),
          |                      i -> (i + doc_id) % 3 = 0)) END""".stripMargin))
      .withColumn("n_ellip", expr(
        """CASE WHEN doc_id % 11 = 0 THEN n_lines
          |     ELSE size(filter(sequence(CAST(0 AS BIGINT), CAST(n_lines - 1 AS BIGINT)),
          |                      i -> (i + doc_id) % 4 = 1)) END""".stripMargin))
      .withColumn("mean_word_len",
        (col("n_chars_m") - (col("n_words") - 1)).cast("double") / col("n_words"))
      .withColumn("symbol_ratio",
        (col("n_extra") * 3).cast("double") / col("n_total"))
      .withColumn("bullet_ratio", col("n_bullet").cast("double") / col("n_lines"))
      .withColumn("ellip_ratio", col("n_ellip").cast("double") / col("n_lines"))
      .withColumn("alpha_ratio", col("n_words").cast("double") / col("n_total"))
      .withColumn("r_words", (col("n_total") >= 20).cast("int"))
      .withColumn("r_wordlen",
        (col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0).cast("int"))
      .withColumn("r_symbol", (col("symbol_ratio") <= 0.1).cast("int"))
      .withColumn("r_bullet", (col("bullet_ratio") <= 0.9).cast("int"))
      .withColumn("r_ellip", (col("ellip_ratio") <= 0.3).cast("int"))
      .withColumn("r_alpha", (col("alpha_ratio") >= 0.8).cast("int"))
      .withColumn("r_stop", (col("n_stop") >= 2).cast("int"))
      .withColumn("keep",
        (col("r_words") * col("r_wordlen") * col("r_symbol") * col("r_bullet")
          * col("r_ellip") * col("r_alpha") * col("r_stop")).cast("int"))
      .select("doc_id", "n_words", "n_extra", "n_lines", "n_stop",
        "mean_word_len", "symbol_ratio", "bullet_ratio", "ellip_ratio",
        "alpha_ratio", "r_words", "r_wordlen", "r_symbol", "r_bullet",
        "r_ellip", "r_alpha", "r_stop", "keep")
      .orderBy("doc_id")

  private val t36Oracle: String = {
    val ws = wordsSql("text")
    s"""WITH m AS (
       |  SELECT doc_id, length(trim(text)) AS n_chars_m,
       |         CAST(len($ws) AS INT) AS n_words,
       |         CAST(len(list_filter($ws,
       |              x -> x IN ('the','a','data','value','table'))) AS INT) AS n_stop
       |  FROM documents),
       |g AS (
       |  SELECT doc_id, n_words, n_stop,
       |         CAST((doc_id % 4) * 8 AS INT) AS n_extra,
       |         CAST(n_words + (doc_id % 4) * 8 AS INT) AS n_total,
       |         CAST((n_words + 9) // 10 AS INT) AS n_lines,
       |         CAST(n_chars_m - (n_words - 1) AS DOUBLE) / n_words AS mean_word_len
       |  FROM m),
       |r AS (
       |  SELECT doc_id, n_words, n_extra, n_lines, n_stop, mean_word_len,
       |         CAST(n_extra * 3 AS DOUBLE) / n_total AS symbol_ratio,
       |         CAST(CASE WHEN doc_id % 7 = 0 THEN n_lines
       |              ELSE len(list_filter(generate_series(0, CAST(n_lines - 1 AS BIGINT)),
       |                       i -> (i + doc_id) % 3 = 0)) END AS DOUBLE)
       |           / n_lines AS bullet_ratio,
       |         CAST(CASE WHEN doc_id % 11 = 0 THEN n_lines
       |              ELSE len(list_filter(generate_series(0, CAST(n_lines - 1 AS BIGINT)),
       |                       i -> (i + doc_id) % 4 = 1)) END AS DOUBLE)
       |           / n_lines AS ellip_ratio,
       |         CAST(n_words AS DOUBLE) / n_total AS alpha_ratio,
       |         CAST(n_total >= 20 AS INT) AS r_words
       |  FROM g)
       |SELECT doc_id, n_words, n_extra, n_lines, n_stop, mean_word_len,
       |       symbol_ratio, bullet_ratio, ellip_ratio, alpha_ratio, r_words,
       |       r_wordlen, r_symbol, r_bullet, r_ellip, r_alpha, r_stop,
       |       CAST(r_words * r_wordlen * r_symbol * r_bullet
       |            * r_ellip * r_alpha * r_stop AS INT) AS keep
       |FROM (
       |  SELECT *,
       |         CAST(mean_word_len >= 3.0 AND mean_word_len <= 10.0 AS INT) AS r_wordlen,
       |         CAST(symbol_ratio <= 0.1 AS INT) AS r_symbol,
       |         CAST(bullet_ratio <= 0.9 AS INT) AS r_bullet,
       |         CAST(ellip_ratio <= 0.3 AS INT) AS r_ellip,
       |         CAST(alpha_ratio >= 0.8 AS INT) AS r_alpha,
       |         CAST(n_stop >= 2 AS INT) AS r_stop
       |  FROM r)
       |ORDER BY doc_id""".stripMargin
  }

  // ---- t37: vocabulary construction + OOV coverage -------------------------

  /** Tokenizer-budget planning: build the top-K vocabulary by corpus
    * frequency and measure what it covers — the analysis run before
    * committing to a vocab size, and the per-doc out-of-vocabulary
    * rate that flags documents a tokenizer would shred into bytes
    * (high-OOV docs are disproportionately boilerplate, code, or
    * wrong-language text, so `oov_rate` doubles as a quality signal).
    * Vocab membership is decided by `(count DESC, word)` — fully
    * deterministic, no RNG — and the corpus-level coverage (fraction
    * of all tokens inside the vocab) rides every row as the headline
    * number.
    *
    * Scale shape: one word-keyed count agg (map-side combinable — the
    * t25 df shape), a top-K rank over the DISTINCT-WORD frame (single
    * partition, but bounded by vocabulary size, not corpus size — the
    * t34 decomposition argument; a web-scale run ranks a few million
    * tiny (word, count) rows, not documents), then the vocab
    * broadcasts back into a doc-keyed agg. Documents never shuffle;
    * both exchanges lead with bounded keys.
    */
  private def t37VocabCoverage(s: SparkSession, d: String): DataFrame = {
    val words = Tables.documents(s, d)
      .select(col("doc_id"), explode(wordsCol(col("text"))).as("w"))
    val counts = words.groupBy("w").agg(count(lit(1)).as("cnt"))
    val wRank = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("w"))
    val vocab = counts
      .withColumn("vr", row_number().over(wRank)).filter(col("vr") <= 16)
      .select(col("w"), lit(1).as("in_v"))
    val perDoc = words.join(broadcast(vocab), Seq("w"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_v").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate", col("n_oov").cast("double") / col("n_tokens"))
    val corpus = perDoc
      .agg(sum("n_tokens").as("tot_tokens"), sum("n_oov").as("tot_oov"))
      .select((lit(1.0) - col("tot_oov").cast("double") / col("tot_tokens"))
        .as("coverage"))
    perDoc.join(broadcast(corpus)).orderBy("doc_id")
  }

  private val t37Oracle: String = {
    val ws = wordsSql("text")
    s"""WITH words AS (SELECT doc_id, unnest($ws) AS w FROM documents),
       |counts AS (SELECT w, count(*) AS cnt FROM words GROUP BY w),
       |vocab AS (
       |  SELECT w FROM (
       |    SELECT w, row_number() OVER (ORDER BY cnt DESC, w) AS vr
       |    FROM counts) WHERE vr <= 16),
       |perdoc AS (
       |  SELECT doc_id, count(*) AS n_tokens,
       |         sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS n_oov
       |  FROM words wo LEFT JOIN vocab v ON wo.w = v.w
       |  GROUP BY doc_id),
       |corpus AS (
       |  SELECT CAST(1 AS DOUBLE) - CAST(sum(n_oov) AS DOUBLE) / sum(n_tokens) AS coverage
       |  FROM perdoc)
       |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       |       CAST(n_oov AS BIGINT) AS n_oov,
       |       CAST(n_oov AS DOUBLE) / n_tokens AS oov_rate, coverage
       |FROM perdoc CROSS JOIN corpus ORDER BY doc_id""".stripMargin
  }

  // ---- t38: split-leakage audit --------------------------------------------

  /** The integrity audit of the pipeline's OWN split: how much 13-gram
    * content crosses the train/test boundary? t26's content-hash split
    * prevents EXACT copies from straddling (same text → same side),
    * but near-duplicates hash differently and leak — this measures
    * the leak instead of assuming it away, the check a training run
    * does before trusting its eval numbers (d6 audits against an
    * EXTERNAL benchmark; this audits the internal boundary).
    *
    * Scale shape: both sides reduce to 64-bit gram hashes at the scan
    * (the d6 posture); the crossing set comes out of ONE gram-keyed
    * aggregate that counts distinct carrier docs per side — map-side
    * combinable, no text shuffled, no pairwise work. Per split the
    * rollup reports documents carrying any crossing gram, the
    * distinct crossing grams, and the gram-level leak rate.
    */
  private def t38SplitLeakage(s: SparkSession, d: String): DataFrame = {
    // The corpus's only gram-sharing pairs are EXACT duplicates, which
    // the content-hash split provably keeps same-side (measured: the
    // unplanted audit reads 0.0 everywhere — t26 doing its job). The
    // leak class the audit exists for is NEAR-duplicates — re-crawls
    // that differ by a byte and hash to a random side — so the gate
    // PLANTS them (the s3/t28 pattern): every 17th doc gains a
    // PREFIXED variant under a shifted id — prefixed, not suffixed,
    // because the split coin hashes the first 8 chars (a suffix
    // variant keeps its coin and the plant never straddles; measured
    // before this comment existed) — and a doc-varying prefix spreads
    // the variants' coins so ~2·p(1−p) of them cross the boundary
    // while every original 13-gram survives intact downstream of the
    // added words.
    val base = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val variants = base.filter(col("doc_id") % 17 === 0)
      .select((col("doc_id") + 2000000L).as("doc_id"),
        concat(lit("r"), (col("doc_id") % 89).cast("string"),
          lit(" recrawl "), col("text")).as("text"))
    val grams = base.unionByName(variants)
      .withColumn("split", expr(
        s"CASE WHEN ${polyHashSql("text", 8)} % 100 < 80 THEN 'train' ELSE 'test' END"))
      .select(col("doc_id"), col("split"),
        explode(graft.functions.SimHashFunctions
          .poly_grams(wordsCol(col("text")), 13)).as("gram"))
    // per gram: does it appear on both sides? (one keyed agg)
    val crossing = grams
      .groupBy("gram")
      .agg(
        countDistinct(when(col("split") === "train", col("doc_id"))).as("n_train"),
        countDistinct(when(col("split") === "test", col("doc_id"))).as("n_test"))
      .filter(col("n_train") > 0 && col("n_test") > 0)
      .select(col("gram"), lit(1).as("crossing"))
    grams
      .join(broadcast(crossing), Seq("gram"), "left")
      .groupBy("split")
      .agg(
        countDistinct(col("doc_id")).as("n_docs"),
        countDistinct(col("gram")).as("n_grams"),
        countDistinct(when(col("crossing").isNotNull, col("doc_id"))).as("n_leaked_docs"),
        countDistinct(when(col("crossing").isNotNull, col("gram"))).as("n_leaked_grams"))
      .withColumn("leak_rate",
        col("n_leaked_grams").cast("double") / col("n_grams"))
      .orderBy("split")
  }

  private val t38Oracle: String = {
    val ws = wordsSql("text")
    s"""WITH src AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 2000000,
       |         'r' || CAST(doc_id % 89 AS VARCHAR) || ' recrawl ' || text
       |  FROM documents WHERE doc_id % 17 = 0),
       |g AS (
       |  SELECT doc_id,
       |         CASE WHEN ${polyHashSql("text", 8)} % 100 < 80
       |              THEN 'train' ELSE 'test' END AS split,
       |         unnest(list_distinct(list_transform(
       |           generate_series(1, greatest(len(hw)-12, 0)),
       |           i -> ${Dedup.gram13Sql(k => s"hw[i+$k]")}))) AS gram
       |  FROM (SELECT doc_id, text,
       |               list_transform($ws, w -> ${polyHashSql("w", 8)}) AS hw
       |        FROM src)),
       |crossing AS (
       |  SELECT gram FROM g GROUP BY gram
       |  HAVING count(DISTINCT CASE WHEN split = 'train' THEN doc_id END) > 0
       |     AND count(DISTINCT CASE WHEN split = 'test' THEN doc_id END) > 0)
       |SELECT split,
       |       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       |       CAST(count(DISTINCT g.gram) AS BIGINT) AS n_grams,
       |       CAST(count(DISTINCT CASE WHEN c.gram IS NOT NULL THEN doc_id END) AS BIGINT)
       |         AS n_leaked_docs,
       |       CAST(count(DISTINCT CASE WHEN c.gram IS NOT NULL THEN g.gram END) AS BIGINT)
       |         AS n_leaked_grams,
       |       CAST(count(DISTINCT CASE WHEN c.gram IS NOT NULL THEN g.gram END) AS DOUBLE)
       |         / count(DISTINCT g.gram) AS leak_rate
       |FROM g LEFT JOIN crossing c ON g.gram = c.gram
       |GROUP BY split ORDER BY split""".stripMargin
  }

  // ---- t39: n-gram novelty (freshness along the ingest order) -------------

  /** Per-document NOVELTY against everything ingested before it: the
    * per-mille of a document's distinct 13-grams whose FIRST
    * occurrence (min doc_id — the ingest order) is this document.
    * The prioritization signal a continual-pretraining pipeline ranks
    * fresh crawls by: high novelty = content the corpus hasn't said
    * yet, low novelty = paraphrase/boilerplate mass. d9 measures the
    * SYMMETRIC overlap diagnostic (is this duplicated anywhere?);
    * novelty is its DIRECTED, order-aware counterpart (was it said
    * FIRST here?) — both ride the same codegen'd gram scan.
    *
    * Scale shape (d9's): the gram table is the canonical word-count
    * shuffle on a LONG key (never raw text); first-occurrence
    * election is a map-side-combinable `min`; one gram-keyed
    * equi-join back; integer per-mille output keeps the gate
    * hash-exact.
    */
  /** The exploded (doc_id, n_grams, gram) frame t39 runs over —
    * exposed (with [[t39From]]) so the plan-audit spec can check the
    * PRE-checkpoint plan (the gate's localCheckpoint erases it).
    */
  private[ops] def t39Exploded(s: SparkSession, d: String): DataFrame =
    Tables
      .documents(s, d)
      .select(col("doc_id"),
        graft.functions.SimHashFunctions
          .poly_grams(wordsCol(col("text")), 13).as("g"))
      .select(col("doc_id"), size(col("g")).as("n_grams"),
        explode(col("g")).as("gram"))

  private[ops] def t39From(exploded: DataFrame): DataFrame = {
    val first = exploded.groupBy("gram").agg(min(col("doc_id")).as("first_doc"))
    exploded
      .join(first, Seq("gram"))
      .groupBy(col("doc_id"))
      .agg(max(col("n_grams")).as("n_grams"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty_permille", expr("(1000 * n_novel) DIV n_grams"))
      .orderBy("doc_id")
  }

  private def t39Novelty(s: SparkSession, d: String): DataFrame = {
    // persist: the gram extraction feeds the election AND the
    // join-back (d9's pattern)
    val exploded = t39Exploded(s, d).persist()
    val out = t39From(exploded).localCheckpoint(true)
    exploded.unpersist(blocking = false)
    out
  }

  private val t39Oracle: String = {
    val ws = wordsSql("text")
    s"""WITH g AS (
       |  SELECT doc_id, list_distinct(list_transform(
       |           generate_series(1, greatest(len(hw)-12, 0)),
       |           i -> ${Dedup.gram13Sql(k => s"hw[i+$k]")})) AS g
       |  FROM (SELECT doc_id, list_transform($ws, w -> ${polyHashSql("w", 8)}) AS hw
       |        FROM documents)),
       |e AS (SELECT doc_id, CAST(len(g) AS INT) AS n_grams, unnest(g) AS gram FROM g),
       |f AS (SELECT gram, min(doc_id) AS first_doc FROM e GROUP BY gram)
       |SELECT e.doc_id, max(e.n_grams) AS n_grams,
       |       CAST(sum(CASE WHEN f.first_doc = e.doc_id THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_novel,
       |       CAST((1000 * sum(CASE WHEN f.first_doc = e.doc_id THEN 1 ELSE 0 END))
       |            // max(e.n_grams) AS BIGINT) AS novelty_permille
       |FROM e JOIN f USING (gram)
       |GROUP BY e.doc_id ORDER BY e.doc_id""".stripMargin
  }

  // ---- t40: distributed BPE tokenizer training -----------------------------

  /** Merge rounds the t40 gate learns; the oracle unrolls the same
    * count. 24 is deep enough that learned symbols re-enter later
    * merges (round 6 at sf0.001 already merges the round-1 symbol).
    */
  private[ops] val BpeRounds = 24

  /** Word-length cap (standard BPE practice: pathological unbroken
    * strings would otherwise dominate pair space); also bounds the
    * one corpus-sized exchange key below.
    */
  private[ops] val BpeMaxWordLen = 24

  /** Learned symbols get ids BpeMergeBase+round — disjoint from the
    * codepoint range, identical on both sides because the merge
    * sequence is deterministic.
    */
  private[ops] val BpeMergeBase = 1000000L

  /** Word-frequency table with initial symbol sequences: one corpus
    * pass, grouped by the (≤[[BpeMaxWordLen]]-char) word — the ONLY
    * corpus-sized exchange in t40, map-side combined down to the
    * distinct-word vocabulary (Heaps' law: sublinear in corpus size,
    * which is what makes distributed BPE training tractable at
    * 100 TB — every merge round below touches this table, never the
    * corpus). Symbols start as codepoints (`ascii` agrees with DuckDB
    * on substr(w,i,1), the polyHash precedent) plus a terminal 0
    * end-of-word marker so suffix merges are distinguishable.
    */
  private[ops] def bpeWordTable(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(wordsCol(col("text"))).as("w"))
      .filter(length(col("w")) <= BpeMaxWordLen)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(col("w"),
        expr("concat(transform(sequence(1, length(w)), " +
          "i -> CAST(ascii(substr(w, i, 1)) AS BIGINT)), " +
          "array(CAST(0 AS BIGINT)))").as("syms"),
        col("cnt"))

  /** One merge round's pair-count election over the word table:
    * adjacent-pair explode (naive overlap counting — the classic
    * algorithm's semantics, and exactly what the oracle counts),
    * frequency-weighted, shuffled ONLY on the two bigint symbol ids,
    * then a deterministic argmax (count desc, then lowest pair —
    * TakeOrderedAndProject, no global sort). The index filter runs
    * over ascending `sequence(1, size)` because `sequence(1, 0)` is
    * Spark's DESCENDING [1,0] (t32's documented hazard) — a word
    * fully merged to one symbol must yield zero pairs, not a throw.
    */
  private[ops] def bpePairCounts(words: DataFrame): DataFrame =
    words
      .select(col("cnt"), col("syms"),
        explode(expr("filter(sequence(1, size(syms)), i -> i < size(syms))")).as("i"))
      .select(col("cnt"),
        expr("element_at(syms, i)").as("l"),
        expr("element_at(syms, i + 1)").as("r"))
      .groupBy("l", "r").agg(sum(col("cnt")).as("c"))

  /** Greedy left-to-right rewrite of one learned merge (l,r)→m over a
    * symbol sequence, as a row-local array fold — `aggregate` here,
    * `list_reduce` over singleton lists in the oracle. Greedy matters:
    * in `aaa` with merge (a,a) the first pair wins and the result is
    * `[aa, a]`; a positional rewrite would disagree with every real
    * BPE implementation (and with the oracle's identical fold).
    */
  private[ops] def bpeRewriteSql(l: Long, r: Long, m: Long): String =
    s"""aggregate(syms, CAST(array() AS ARRAY<BIGINT>),
       |  (acc, x) -> CASE WHEN size(acc) > 0 AND element_at(acc, -1) = ${l}L AND x = ${r}L
       |              THEN concat(slice(acc, 1, size(acc) - 1), array(${m}L))
       |              ELSE concat(acc, array(x)) END)""".stripMargin

  /** Distributed BPE tokenizer training — the merge-learning step t37
    * budgets for and t23 consumes (references the reference's text
    * statistics surface only by analogy; BPE itself is Sennrich et
    * al. 2016, the standard subword tokenizer of LLM pipelines).
    * [[BpeRounds]] rounds of: count adjacent symbol pairs over the
    * word-frequency table, elect the most frequent pair
    * (deterministic tie-break), broadcast it into a row-local rewrite
    * of the symbol sequences. Returns the learned merge table —
    * that plus the initial alphabet IS the trained tokenizer.
    *
    * Scale shape: the corpus is read ONCE (word count, the t35/d6
    * discipline — the only corpus-sized exchange keys on the bounded
    * word, and document text never enters an exchange). Every round
    * then runs on the vocabulary-sized word table: a map-side-combined
    * pair agg whose shuffle carries one row per distinct pair per
    * partition, a 1-row TakeOrdered election (the only driver-side
    * data, 3 ints/round — control plane, like the codebook collects),
    * and a row-local rewrite. The table is eagerly localCheckpointed
    * each round so round k reads materialized round k-1 instead of
    * recomputing the whole chain (without it the loop is quadratic in
    * rounds — the same lineage trap the sweep caught in the GTID agg).
    */
  /** The shared training loop: returns the learned merge table AND
    * the fully-rewritten word table (the tokenizer's working form —
    * word → final symbol sequence), so t40 reports the merges and t41
    * applies them without a second training pass.
    */
  /** The trained tokenizer memoized per (session, corpus dir) — the
    * CDC GateTmp discipline applied to tokenizer state: production
    * trains ONCE and every consumer (t40 reports merges, t41 encodes,
    * t42 decodes) reuses the artifact; retraining per query would
    * triple-charge the 24 driver-paced rounds for identical output.
    * Keyed by session UUID (collision-free — an identity hash can
    * recur after GC and hand a later session a frame whose
    * checkpointed blocks died with the original) because the cached
    * word-table frame's blocks die with its session; a hit verifies
    * its own entry's session is alive (O(1)), and entries of other
    * STOPPED sessions are evicted on every cache miss, so a
    * long-lived JVM cycling sessions doesn't retain dead frames while
    * warm hits stay O(1).
    */
  private val bpeMemo = scala.collection.concurrent.TrieMap
    .empty[(String, String), (SparkSession, Seq[(Int, Long, Long, Long, Long)], DataFrame)]

  private def bpeSessionKey(s: SparkSession): String =
    // sessionUUID is private[sql] in the Scala signature but public
    // bytecode; reflection reads the collision-free id without a shim
    // class in Spark's package. Fallback (non-classic session impls):
    // identity hash — NOT collision-free. A recycled hash colliding
    // with a DEAD entry is caught by bpeTrained's on-hit liveness
    // check; two LIVE sessions sharing a hash remains possible, so
    // this path is best-effort and acceptable only because every
    // in-repo caller is a classic SparkSession that takes the UUID
    // branch. Fatal errors (OOM, linkage) propagate.
    try s.getClass.getMethod("sessionUUID").invoke(s).toString
    catch {
      case scala.util.control.NonFatal(_) => "id:" + System.identityHashCode(s)
    }

  private[ops] def bpeTrained(s: SparkSession, d: String)
      : (Seq[(Int, Long, Long, Long, Long)], DataFrame) = {
    val key = (bpeSessionKey(s), d)
    // a hit must verify its entry's session is ALIVE (one O(1)
    // isStopped check): under the identity-hash fallback key a
    // recycled hash can collide with a dead entry, and returning it
    // would hand out a stopped session's checkpointed frame — evict
    // and rebuild instead
    bpeMemo.get(key).foreach { case (sess, _, _) =>
      if (sess.sparkContext.isStopped) bpeMemo.remove(key)
    }
    // evict OTHER dead-session entries only on a miss (an insert is
    // coming): the warm-hit path stays O(1) instead of paying an
    // O(entries) sweep per access
    if (!bpeMemo.contains(key))
      bpeMemo.filterInPlace { case (_, (sess, _, _)) => !sess.sparkContext.isStopped }
    val (_, merges, words) =
      bpeMemo.getOrElseUpdate(key, {
        val (m, w) = bpeTrainLoop(s, d); (s, m, w)
      })
    (merges, words)
  }

  private[ops] def bpeTrainLoop(s: SparkSession, d: String)
      : (Seq[(Int, Long, Long, Long, Long)], DataFrame) = {
    var words = bpeWordTable(s, d).localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, Long, Long)]
    for (k <- 1 to BpeRounds) {
      val best = bpePairCounts(words)
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(1).collect()
      require(best.nonEmpty, s"t40: pair space exhausted at round $k")
      val (l, r, c) = (best(0).getLong(0), best(0).getLong(1), best(0).getLong(2))
      val m = BpeMergeBase + k
      merges += ((k, l, r, m, c))
      // LAZY checkpoint: still truncates lineage (round k reads a
      // materialized round k-1, never the whole rewrite chain); the
      // materialization rides the next round's election job instead
      // of costing one of its own. Measured neutral at sf0.1 (the
      // round cost is dominated by per-round planning + codegen of
      // the fresh literal-bearing rewrite, not task count), kept for
      // the halved job count at cluster scale where scheduling is
      // the overhead that grows
      words = words
        .withColumn("syms", expr(bpeRewriteSql(l, r, m)))
        .localCheckpoint(false)
    }
    (merges.toSeq, words)
  }

  private def t40BpeTrain(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    bpeTrained(s, d)._1
      .toDF("round", "left_sym", "right_sym", "new_sym", "pair_count")
      .orderBy("round")
  }

  /** t41: ENCODE the corpus with the trained tokenizer — the apply
    * half of the t40/t41 pair (a tokenizer you can train but not run
    * is half an operator). The trained state is the rewritten word
    * table itself (word → final symbol sequence after all
    * [[BpeRounds]] merges — how production tokenizers cache frequent
    * words); encoding is then ONE corpus pass: explode words, join
    * the vocabulary on the word key (AQE broadcasts when the vocab
    * fits, the same judgment it makes for t25's df side), and roll up
    * per document. Reports the compression the learned merges bought:
    * `saved_permille = 1000·(chars+words − bpe_tokens) / (chars+words)`
    * against the character+end-marker baseline (what the token count
    * would be with zero merges). All-integer; the oracle re-derives
    * the identical vocabulary through the same unrolled chain with
    * the word column carried through.
    *
    * Scale shape: training cost is t40's (vocabulary-sized rounds);
    * encoding adds one word-keyed corpus exchange and one doc-keyed
    * rollup — the t25 topology. Document text never keys an exchange.
    */
  private def t41BpeEncode(s: SparkSession, d: String): DataFrame = {
    val vocab = bpeTrained(s, d)._2
      .select(col("w"), size(col("syms")).as("n_tok"))
    Tables.documents(s, d)
      .select(col("doc_id"), explode(wordsCol(col("text"))).as("w"))
      .filter(length(col("w")) <= BpeMaxWordLen)
      .join(vocab, Seq("w"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("w"))).as("n_chars"),
        sum(col("n_tok")).as("n_bpe_tokens"))
      .withColumn("saved_permille",
        expr("(1000 * (n_chars + n_words - n_bpe_tokens)) DIV (n_chars + n_words)"))
      .orderBy("doc_id")
  }

  /** The unrolled training chain shared by the t40 and t41 oracles:
    * w0 (word-frequency table with initial symbol sequences, the word
    * carried through every round so t41 can join the corpus back),
    * then per round a pair-count CTE, a 1-row election, and the
    * list_reduce greedy rewrite. w-CTEs MATERIALIZED: each is
    * referenced twice (next round's pair count + rewrite); inlining
    * would re-derive the whole chain per reference — exponential in
    * rounds.
    */
  private def bpeChainSql: String = {
    val ws = wordsSql("text")
    val w0 =
      s"""w0 AS MATERIALIZED (
         |  SELECT w,
         |         list_append(list_transform(generate_series(1, CAST(len(w) AS INT)),
         |           i -> CAST(ascii(substr(w, i, 1)) AS BIGINT)), CAST(0 AS BIGINT)) AS syms,
         |         cnt
         |  FROM (SELECT w, CAST(count(*) AS BIGINT) AS cnt
         |        FROM (SELECT unnest($ws) AS w FROM documents)
         |        WHERE len(w) <= $BpeMaxWordLen GROUP BY w))""".stripMargin
    val rounds = (1 to BpeRounds).map { k =>
      val m = BpeMergeBase + k
      s"""p$k AS (
         |  SELECT syms[i] AS l, syms[i + 1] AS r, sum(cnt) AS c
         |  FROM w${k - 1}, unnest(generate_series(1, len(syms) - 1)) AS t(i)
         |  GROUP BY 1, 2),
         |b$k AS MATERIALIZED (SELECT l, r, c FROM p$k ORDER BY c DESC, l ASC, r ASC LIMIT 1),
         |w$k AS MATERIALIZED (
         |  SELECT w, list_reduce(list_transform(syms, s -> [s]),
         |           (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = b.l AND x[1] = b.r
         |                       THEN acc[:len(acc) - 1] || [CAST($m AS BIGINT)]
         |                       ELSE acc || x END) AS syms, cnt
         |  FROM w${k - 1} CROSS JOIN b$k b)""".stripMargin
    }
    s"$w0,\n${rounds.mkString(",\n")}"
  }

  private val t40Oracle: String = {
    val sel = (1 to BpeRounds).map { k =>
      s"SELECT $k AS round, l AS left_sym, r AS right_sym, " +
        s"CAST(${BpeMergeBase + k} AS BIGINT) AS new_sym, CAST(c AS BIGINT) AS pair_count FROM b$k"
    }.mkString("\nUNION ALL\n")
    s"WITH $bpeChainSql\n$sel\nORDER BY round"
  }

  private val t41Oracle: String = {
    val ws = wordsSql("text")
    s"""WITH $bpeChainSql,
       |wt AS (SELECT w, CAST(len(syms) AS BIGINT) AS n_tok FROM w$BpeRounds),
       |docw AS (
       |  SELECT doc_id, w FROM (
       |    SELECT doc_id, unnest($ws) AS w FROM documents)
       |  WHERE len(w) <= $BpeMaxWordLen)
       |SELECT d.doc_id,
       |       CAST(count(*) AS BIGINT) AS n_words,
       |       CAST(sum(len(d.w)) AS BIGINT) AS n_chars,
       |       CAST(sum(t.n_tok) AS BIGINT) AS n_bpe_tokens,
       |       CAST((1000 * (sum(len(d.w)) + count(*) - sum(t.n_tok)))
       |            // (sum(len(d.w)) + count(*)) AS BIGINT) AS saved_permille
       |FROM docw d JOIN wt t ON t.w = d.w
       |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin
  }

  // ---- t42: BPE decode round trip (tokenizer losslessness) -----------------

  /** DECODE the trained tokenizer's output back to text — the inverse
    * that completes the t40/t41/t43 lifecycle (train → encode → pack)
    * and proves the learned merge table is lossless, the property a
    * production pipeline must hold before it dares store the corpus
    * tokenized. Decoding inverts the merge chain: round k's pair
    * (l, r) can only reference codepoints or earlier merges, so the
    * expansion closure exp(m) = exp(l) ++ exp(r) built oldest-first
    * over the learned table (already driver-side control plane — t40
    * collects 3 ints per round) folds to a 24-entry symbol →
    * codepoint-array literal map applied in ONE shallow row-local
    * expression. (A 24-deep chain of nested flatten/transform
    * rewrites computes the same bits but pays ~2 s of codegen on a
    * vocabulary-sized table — measured, the t40 per-round-planning
    * cost signature — so the composed form is the one that ships.)
    * The ORACLE states the lossless contract directly — it recomputes the pre-merge
    * codepoint sequence straight from the word — so any divergence
    * anywhere in train-then-decode breaks the hash. Sequences are
    * compared via the shared fold hash (init 0, ·1000003 + s mod
    * 2³¹−1; values stay < 2⁵¹) rather than `chr` reassembly because
    * Spark's `chr` truncates codepoints mod 256 while DuckDB's is
    * full Unicode — the hash sidesteps the engine disagreement
    * without weakening the check (both sides hash full codepoints).
    *
    * Scale shape: everything after the t40 training loop is row-local
    * work on the vocabulary-sized word table (Heaps-bounded, corpus-
    * independent) — zero additional exchanges, zero corpus passes.
    */
  private def t42BpeDecode(s: SparkSession, d: String): DataFrame = {
    val (merges, trained) = bpeTrained(s, d)
    val exp = scala.collection.mutable.Map.empty[Long, Vector[Long]]
    def expand(sym: Long): Vector[Long] = exp.getOrElse(sym, Vector(sym))
    merges.sortBy(_._1).foreach { case (_, l, r, m, _) =>
      exp(m) = expand(l) ++ expand(r)
    }
    val cases = exp.toSeq.sortBy(_._1).map { case (m, cps) =>
      s"WHEN ${m}L THEN array(${cps.mkString("L, ")}L)"
    }.mkString(" ")
    trained
      .select(col("w"), col("cnt"), size(col("syms")).cast("long").as("n_tok"),
        expr(s"flatten(transform(syms, s -> CASE s $cases ELSE array(s) END))")
          .as("dec"))
      .select(col("w"), col("cnt"), col("n_tok"),
        size(col("dec")).cast("long").as("n_decoded"),
        expr("aggregate(dec, CAST(0 AS BIGINT), " +
          "(acc, x) -> (acc * 1000003 + x) % 2147483647)").as("decoded_hash"))
      .orderBy("w")
  }

  private val t42Oracle: String =
    s"""WITH $bpeChainSql
       |SELECT w, cnt, CAST(len(syms) AS BIGINT) AS n_tok,
       |       CAST(len(w) + 1 AS BIGINT) AS n_decoded,
       |       CAST(list_reduce(
       |         list_prepend(CAST(0 AS BIGINT),
       |           list_append(list_transform(generate_series(1, CAST(len(w) AS INT)),
       |             i -> CAST(ascii(substr(w, i, 1)) AS BIGINT)), CAST(0 AS BIGINT))),
       |         (acc, x) -> (acc * 1000003 + x) % 2147483647) AS BIGINT) AS decoded_hash
       |FROM w$BpeRounds ORDER BY w""".stripMargin

  // ---- t44: DSIR-style importance weights ----------------------------------

  /** Hashed-n-gram feature-bucket count, shared by both distributions. */
  private[ops] val DsirBuckets = 4096L

  /** Importance weighting for targeted data selection — the
    * DSIR shape (Xie et al. 2023, "Data Selection for Language
    * Models via Importance Resampling"): fit two hashed-unigram
    * bucket distributions — TARGET (here the English slice, standing
    * in for the high-quality domain corpus) and RAW (the whole
    * corpus) — and weight every document by how target-like its
    * feature stream is. Production DSIR scores log p(b)−log q(b);
    * `ln` is libm-dependent, so this gate scores the integer-scaled
    * probability ratio `(10⁶·(c_t+1)·(N_q+B)) DIV ((c_q+1)·(N_t+B))`
    * per occurrence (Laplace-smoothed, exact in both engines — the
    * t32 trick), which ranks documents monotonically per-bucket the
    * same way. The resample half of DSIR already exists as
    * p13_mixture_sample; the weights are the missing half.
    *
    * Scale shape: the corpus reduces at the scan to (doc_id, bucket)
    * with B = [[DsirBuckets]] buckets; both distributions are
    * B-bounded aggregates (map-side combined), the weight table is a
    * B-row broadcast join, and the only corpus-sized exchange is the
    * final doc_id rollup — word text never keys an exchange. The
    * scalar totals fold in as windows over the B-row table, not a
    * corpus pass. Integer headroom: ratios stay < 2⁶³ through the
    * derived-sf1 sweep; a 100 TB deployment would flip the scaled
    * ratio to log-space doubles and loosen the oracle to tolerance,
    * as mm15 does for lossy codecs.
    */
  private def t44Dsir(s: SparkSession, d: String): DataFrame = {
    val occ = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), explode(wordsCol(col("text"))).as("w"))
      .select(col("doc_id"), col("lang"),
        expr(s"(${polyHashSql("w", 8)}) % $DsirBuckets").as("b"))
    val raw = occ.groupBy("b").agg(count(lit(1)).as("c_q"))
    val tgt = occ.filter(col("lang") === "en")
      .groupBy("b").agg(count(lit(1)).as("c_t"))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    val weights = raw
      .join(tgt, Seq("b"), "left")
      .na.fill(0L, Seq("c_t"))
      .withColumn("n_t", sum(col("c_t")).over(wAll))
      .withColumn("n_q", sum(col("c_q")).over(wAll))
      .select(col("b"), expr(
        s"(1000000 * (c_t + 1) * (n_q + $DsirBuckets)) DIV " +
          s"((c_q + 1) * (n_t + $DsirBuckets))").as("ratio"))
    occ
      .join(broadcast(weights), Seq("b"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_feats"), sum(col("ratio")).as("score_sum"))
      .withColumn("avg_ratio", expr("score_sum DIV n_feats"))
      .orderBy("doc_id")
  }

  private val t44Oracle: String = {
    val ws = wordsSql("text")
    val h = polyHashSql("w", 8)
    s"""WITH occ AS (
       |  SELECT doc_id, lang, ($h) % $DsirBuckets AS b
       |  FROM (SELECT doc_id, lang, unnest($ws) AS w FROM documents)),
       |raw AS (SELECT b, CAST(count(*) AS BIGINT) AS c_q FROM occ GROUP BY b),
       |tgt AS (SELECT b, CAST(count(*) AS BIGINT) AS c_t
       |        FROM occ WHERE lang = 'en' GROUP BY b),
       |wt AS (
       |  SELECT r.b, COALESCE(t.c_t, 0) AS c_t, r.c_q,
       |         CAST(sum(COALESCE(t.c_t, 0)) OVER () AS BIGINT) AS n_t,
       |         CAST(sum(r.c_q) OVER () AS BIGINT) AS n_q
       |  FROM raw r LEFT JOIN tgt t ON t.b = r.b),
       |wr AS (
       |  SELECT b, (1000000 * (c_t + 1) * (n_q + $DsirBuckets))
       |            // ((c_q + 1) * (n_t + $DsirBuckets)) AS ratio
       |  FROM wt)
       |SELECT o.doc_id,
       |       CAST(count(*) AS BIGINT) AS n_feats,
       |       CAST(sum(w.ratio) AS BIGINT) AS score_sum,
       |       CAST(sum(w.ratio) // count(*) AS BIGINT) AS avg_ratio
       |FROM occ o JOIN wr w ON w.b = o.b
       |GROUP BY o.doc_id ORDER BY o.doc_id""".stripMargin
  }

  // ---- t45: robust per-source outlier flags (median / MAD) -----------------

  /** Grouped k-th smallest (k = (n+1) DIV 2, the lower median) from a
    * DOMAIN-BOUNDED frequency rollup: one corpus exchange keyed on
    * (group, value), then windows over the rollup — whose row count is
    * groups × distinct values, not the corpus. The per-group-sort
    * alternative (row_number per group — the oracle's brute force)
    * dies at 100 TB: ten sources would mean ten corpus-sized sorted
    * partitions. This is q53's "never globally sort" discipline for
    * GROUPED medians over bounded-domain integers (q53 itself narrows
    * unbounded doubles).
    */
  private def groupedMedian(df: DataFrame, grp: String, v: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val freq = df.groupBy(col(grp), col(v).as("val")).agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy(col(grp)).orderBy(col("val"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col(grp))
    freq
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("n", sum(col("c")).over(wAll))
      .filter(col("cum") >= expr("(n + 1) DIV 2"))
      .groupBy(col(grp)).agg(min(col("val")).as("med"))
  }

  /** Robust per-source length outliers — median absolute deviation
    * (the statistic quality pipelines use where mean/stddev break on
    * heavy tails): per source, med = lower median of n_chars, mad =
    * lower median of |n_chars − med|, and a document is flagged when
    * its deviation exceeds 3·MAD. Both medians are EXACT, computed by
    * [[groupedMedian]]'s frequency-rollup shape; the oracle brute-
    * forces the same k-th smallest with per-group row_number. All
    * integer (n_chars, absolute deviations, a 3× threshold) — no
    * quantile interpolation to diverge on.
    *
    * Scale shape: two (source, value)-keyed rollup exchanges and two
    * broadcast joins of the ≤|sources|-row median tables back onto
    * the scan — the corpus itself never keys an exchange; the final
    * orderBy is the output contract, not the algorithm.
    */
  private def t45MadOutliers(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("source"), col("n_chars"))
    val med = groupedMedian(docs, "source", "n_chars")
    val dev = docs.join(broadcast(med), Seq("source"))
      .withColumn("dev", abs(col("n_chars") - col("med")))
    val mad = groupedMedian(dev, "source", "dev")
      .withColumnRenamed("med", "mad")
    dev.join(broadcast(mad), Seq("source"))
      .select(col("doc_id"), col("source"), col("n_chars"), col("med"),
        col("dev"), col("mad"),
        (col("dev") > col("mad") * 3).cast("int").as("is_outlier"))
      .orderBy("doc_id")
  }

  private val t45Oracle: String =
    """WITH d AS (SELECT doc_id, source, n_chars FROM documents),
      |g AS (SELECT source, count(*) AS n FROM d GROUP BY source),
      |r1 AS (SELECT d.*, row_number() OVER (PARTITION BY d.source ORDER BY n_chars) AS rn, g.n
      |       FROM d JOIN g USING (source)),
      |med AS (SELECT source, min(n_chars) AS med FROM r1 WHERE rn = (n + 1) // 2 GROUP BY source),
      |dev AS (SELECT d.doc_id, d.source, d.n_chars, m.med,
      |               abs(d.n_chars - m.med) AS dev
      |        FROM d JOIN med m USING (source)),
      |r2 AS (SELECT dev.*, row_number() OVER (PARTITION BY dev.source ORDER BY dev) AS rn, g.n
      |       FROM dev JOIN g USING (source)),
      |mad AS (SELECT source, min(dev) AS mad FROM r2 WHERE rn = (n + 1) // 2 GROUP BY source)
      |SELECT dev.doc_id, dev.source, dev.n_chars, dev.med, dev.dev, mad.mad,
      |       CAST(dev.dev > 3 * mad.mad AS INT) AS is_outlier
      |FROM dev JOIN mad USING (source)
      |ORDER BY dev.doc_id""".stripMargin

  // ---- t46: PMI-ranked collocation mining -----------------------------------

  /** Collocation extraction — the phrase-mining pass tokenizer and
    * vocabulary pipelines run before merge learning (t40 learns
    * merges bottom-up; this surfaces the word PAIRS whose cohesion
    * justifies multi-word tokens): rank every bigram type by
    * pointwise mutual information, `PMI = log(N·c(ab) / (c(a)·c(b)))`.
    * log is monotone, so the RANKING needs only the ratio — scored
    * here all-integer as `((c_ab·10⁶) DIV c_a) · N DIV c_b` (no libm,
    * no doubles to diverge on; `c_ab ≤ c_a` bounds the first quotient
    * by 10⁶, so the product stays under 10⁶·N ≪ 2⁶³). A min-support
    * floor (c_ab ≥ 5) drops the hapax pairs PMI notoriously inflates.
    *
    * Scale shape: two corpus exchanges (word-keyed unigram rollup,
    * bigram-keyed pair rollup), both map-side combined; everything
    * after is MODEL-sized — the unigram and surviving-bigram tables
    * are vocabulary-bounded (Heaps' law), their joins key on words,
    * the corpus total is one broadcast scalar, and the top-k is a
    * TakeOrdered, never a global sort.
    */
  private def t46Collocations(s: SparkSession, d: String): DataFrame = {
    val words = Tables.documents(s, d)
      .select(explode(wordsCol(col("text"))).as("w"))
    val uni = words.groupBy("w").agg(count(lit(1)).as("c"))
    val nTotal = uni.agg(sum(col("c")).as("n_words"))
    val bg = Tables.documents(s, d)
      .select(wordsCol(col("text")).as("ws"))
      .select(explode(expr(
        """CASE WHEN size(ws) >= 2 THEN
          |  transform(sequence(1, size(ws) - 1), i ->
          |    concat(element_at(ws, CAST(i AS INT)), ' ',
          |           element_at(ws, CAST(i AS INT) + 1)))
          |ELSE CAST(array() AS ARRAY<STRING>) END""".stripMargin)).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= 5)
      .withColumn("w1", expr("split(bg, ' ')[0]"))
      .withColumn("w2", expr("split(bg, ' ')[1]"))
    bg.join(uni.select(col("w").as("w1"), col("c").as("c_a")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("c").as("c_b")), Seq("w2"))
      .crossJoin(broadcast(nTotal))
      .select(col("w1"), col("w2"), col("c_ab"), col("c_a"), col("c_b"),
        col("n_words"),
        expr("((c_ab * 1000000) DIV c_a) * n_words DIV c_b").as("pmi_score"))
      .orderBy(col("pmi_score").desc, col("w1"), col("w2"))
      .limit(100)
  }

  private val t46Oracle: String = {
    val ws = wordsSql("text")
    s"""WITH w AS (SELECT doc_id, $ws AS ws FROM documents),
       |u AS (SELECT unnest(ws) AS w FROM w),
       |uni AS (SELECT w, count(*) AS c FROM u GROUP BY w),
       |n AS (SELECT CAST(sum(c) AS BIGINT) AS n_words FROM uni),
       |bg0 AS (
       |  SELECT unnest(list_transform(generate_series(1, greatest(len(ws) - 1, 0)),
       |                i -> ws[i] || ' ' || ws[i + 1])) AS bg
       |  FROM w),
       |bg AS (SELECT bg, count(*) AS c_ab FROM bg0 GROUP BY bg HAVING count(*) >= 5)
       |SELECT string_split(bg, ' ')[1] AS w1, string_split(bg, ' ')[2] AS w2,
       |       CAST(c_ab AS BIGINT) AS c_ab,
       |       CAST(a.c AS BIGINT) AS c_a, CAST(b.c AS BIGINT) AS c_b,
       |       n.n_words,
       |       ((c_ab * 1000000) // a.c) * n.n_words // b.c AS pmi_score
       |FROM bg
       |JOIN uni a ON string_split(bg, ' ')[1] = a.w
       |JOIN uni b ON string_split(bg, ' ')[2] = b.w
       |CROSS JOIN n
       |ORDER BY pmi_score DESC, w1, w2
       |LIMIT 100""".stripMargin
  }

  // ---- t47: lexicon blocklist filter (unigrams + phrases) -------------------

  /** Safety-lexicon filtering — the C4-style "badwords" gate every
    * public pretraining corpus passes through, with the part naive
    * token matching misses: MULTI-TOKEN phrases. A document's blocked
    * mass is its unigram hits plus (tokens covered by) phrase hits;
    * the per-mille ratio against its length decides the flag, so a
    * long document mentioning a blocked term once survives while a
    * concentrated one is dropped — ratio, not presence, is what the
    * production filters actually gate on.
    *
    * Scale shape: entirely row-local — the lexicon compiles into the
    * projection (unigram membership + a positional phrase scan as
    * higher-order array functions), so a 100 TB corpus runs map-only
    * with zero exchanges; the output orderBy is the gate contract,
    * not the algorithm. A growing real-world lexicon would broadcast
    * instead of inlining — same topology.
    */
  private def t47Blocklist(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"), wordsCol(col("text")).as("ws"))
      .select(col("doc_id"), col("source"),
        size(col("ws")).as("n_tokens"),
        expr("size(filter(ws, x -> x IN ('scan', 'merge')))").as("n_uni"),
        expr(
          """CASE WHEN size(ws) >= 2 THEN
            |  size(filter(sequence(1, size(ws) - 1), i ->
            |    element_at(ws, CAST(i AS INT)) = 'sort' AND
            |    element_at(ws, CAST(i AS INT) + 1) = 'key'))
            |ELSE 0 END""".stripMargin).as("n_phrase"))
      .withColumn("blocked_tokens", col("n_uni") + col("n_phrase") * 2)
      .withColumn("ratio_pm",
        expr("CAST((blocked_tokens * 1000) DIV greatest(n_tokens, 1) AS INT)"))
      .withColumn("is_blocked", (col("ratio_pm") > 80).cast("int"))
      .orderBy("doc_id")

  private val t47Oracle: String = {
    val ws = wordsSql("text")
    s"""WITH w AS (SELECT doc_id, source, $ws AS ws FROM documents),
       |per AS (
       |  SELECT doc_id, source,
       |         CAST(len(ws) AS INT) AS n_tokens,
       |         CAST(len(list_filter(ws, x -> x IN ('scan', 'merge'))) AS INT) AS n_uni,
       |         CAST(len(list_filter(generate_series(1, greatest(len(ws) - 1, 0)),
       |           i -> ws[i] = 'sort' AND ws[i + 1] = 'key')) AS INT) AS n_phrase
       |  FROM w)
       |SELECT doc_id, source, n_tokens, n_uni, n_phrase,
       |       CAST(n_uni + n_phrase * 2 AS INT) AS blocked_tokens,
       |       CAST((n_uni + n_phrase * 2) * 1000 // greatest(n_tokens, 1) AS INT) AS ratio_pm,
       |       CAST((n_uni + n_phrase * 2) * 1000 // greatest(n_tokens, 1) > 80 AS INT) AS is_blocked
       |FROM per ORDER BY doc_id""".stripMargin
  }

  // ---- t48: tokenizer fertility by language ---------------------------------

  /** Tokenizer fertility — the fairness metric every multilingual
    * tokenizer evaluation reports (tokens emitted per word, by
    * language): a language the vocabulary under-serves pays more
    * tokens for the same text, which is training-budget skew the
    * mixture planner (p11/t30) must see. Computed against the t40
    * trained tokenizer's memoized artifact — production trains once
    * and evaluates everywhere; retraining per metric would re-pay the
    * 24 driver-paced rounds for identical bits. Reported per lang:
    * token/word fertility and chars-per-token compression, both
    * integer per-mille.
    *
    * Scale shape: one corpus explode joined to the vocabulary-bounded
    * word table (broadcastable — ≤ |vocab| rows), then a rollup on
    * the ≤10¹-value lang key, map-side combined. The corpus exchange
    * keys on lang only; word text crosses as the broadcast side.
    */
  private def t48Fertility(s: SparkSession, d: String): DataFrame = {
    val vocab = bpeTrained(s, d)._2
      .select(col("w"), size(col("syms")).as("n_tok"))
    Tables.documents(s, d)
      .select(col("lang"), explode(wordsCol(col("text"))).as("w"))
      .filter(length(col("w")) <= BpeMaxWordLen)
      .join(broadcast(vocab), Seq("w"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("w"))).as("n_chars"),
        sum(col("n_tok")).as("n_bpe_tokens"))
      .select(col("lang"), col("n_words"), col("n_chars"), col("n_bpe_tokens"),
        expr("(1000 * n_bpe_tokens) DIV n_words").as("fertility_pm"),
        expr("(1000 * n_chars) DIV n_bpe_tokens").as("chars_per_tok_pm"))
      .orderBy("lang")
  }

  private val t48Oracle: String = {
    val ws = wordsSql("text")
    s"""WITH $bpeChainSql,
       |wt AS (SELECT w, CAST(len(syms) AS BIGINT) AS n_tok FROM w$BpeRounds),
       |docw AS (
       |  SELECT lang, w FROM (
       |    SELECT lang, unnest($ws) AS w FROM documents)
       |  WHERE len(w) <= $BpeMaxWordLen)
       |SELECT d.lang,
       |       CAST(count(*) AS BIGINT) AS n_words,
       |       CAST(sum(len(d.w)) AS BIGINT) AS n_chars,
       |       CAST(sum(t.n_tok) AS BIGINT) AS n_bpe_tokens,
       |       (1000 * CAST(sum(t.n_tok) AS BIGINT)) // count(*) AS fertility_pm,
       |       (1000 * CAST(sum(len(d.w)) AS BIGINT)) // CAST(sum(t.n_tok) AS BIGINT)
       |         AS chars_per_tok_pm
       |FROM docw d JOIN wt t ON t.w = d.w
       |GROUP BY d.lang ORDER BY d.lang""".stripMargin
  }

  // ---- t49: vocabulary growth curve (Heaps' law) -----------------------------

  /** The vocabulary-growth curve — the Heaps'-law diagnostic corpus
    * builders read to decide whether more data still buys new
    * vocabulary (a flattening curve means the crawl is saturating;
    * a steep one means the corpus is still linguistically open):
    * split the corpus into 10 equal doc_id prefix buckets and report,
    * per bucket, the tokens added, the NEW word types first seen in
    * it, the cumulative vocabulary, and vocabulary-per-million-tokens.
    *
    * Scale shape: "distinct words in every prefix" recomputed per
    * prefix is 10 corpus-sized distincts; instead each word's FIRST
    * bucket is elected once (word-keyed min rollup, map-side
    * combined — t39's first-occurrence discipline lifted from grams
    * to the growth curve), the curve is a rollup on the 10-value
    * bucket key, and the cumulative sum is a window over ≤10 rows.
    * The corpus total broadcasts as one scalar for the bucket split.
    */
  private def t49VocabGrowth(s: SparkSession, d: String): DataFrame = {
    val words = Tables.documents(s, d)
      .select(col("doc_id"), explode(wordsCol(col("text"))).as("w"))
    val nDocs = Tables.documents(s, d)
      .agg((max(col("doc_id")) + 1).as("n_docs"))
    val bucketed = words.crossJoin(broadcast(nDocs))
      .select(expr("CAST((doc_id * 10) DIV n_docs AS INT)").as("bucket"), col("w"))
    val tokens = bucketed.groupBy("bucket").agg(count(lit(1)).as("n_tokens"))
    val firstSeen = bucketed.groupBy("w").agg(min(col("bucket")).as("first_bucket"))
      .groupBy(col("first_bucket").as("bucket"))
      .agg(count(lit(1)).as("n_new_types"))
    val wCum = org.apache.spark.sql.expressions.Window.orderBy(col("bucket"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    tokens.join(firstSeen, Seq("bucket"), "left")
      .select(col("bucket"), col("n_tokens"),
        coalesce(col("n_new_types"), lit(0L)).as("n_new_types"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(wCum))
      .withColumn("vocab_size", sum(col("n_new_types")).over(wCum))
      .withColumn("types_per_mtok",
        expr("(vocab_size * 1000000) DIV cum_tokens"))
      .orderBy("bucket")
  }

  private val t49Oracle: String = {
    val ws = wordsSql("text")
    s"""WITH n AS (SELECT max(doc_id) + 1 AS n_docs FROM documents),
       |wds AS (
       |  SELECT CAST((doc_id * 10) // n.n_docs AS INT) AS bucket, unnest($ws) AS w
       |  FROM documents, n),
       |tok AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_tokens FROM wds GROUP BY bucket),
       |fs AS (
       |  SELECT first_bucket AS bucket, CAST(count(*) AS BIGINT) AS n_new_types
       |  FROM (SELECT w, min(bucket) AS first_bucket FROM wds GROUP BY w)
       |  GROUP BY 1)
       |SELECT bucket, n_tokens,
       |       COALESCE(n_new_types, 0) AS n_new_types,
       |       CAST(sum(n_tokens) OVER (ORDER BY bucket
       |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens,
       |       CAST(sum(COALESCE(n_new_types, 0)) OVER (ORDER BY bucket
       |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS vocab_size,
       |       (CAST(sum(COALESCE(n_new_types, 0)) OVER (ORDER BY bucket
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) * 1000000)
       |         // CAST(sum(n_tokens) OVER (ORDER BY bucket
       |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |         AS types_per_mtok
       |FROM tok LEFT JOIN fs USING (bucket)
       |ORDER BY bucket""".stripMargin
  }

  // ---- t50: Zipf rank-frequency diagnostic -----------------------------------

  /** The Zipf's-law fit — t49's dual (Heaps describes vocabulary
    * growth, Zipf the frequency ladder the vocabulary sits on): rank
    * every word type by frequency and report, per rank decile, the
    * type count and the rank×frequency mass. For natural language
    * rank×freq is near-constant (the Zipf plateau); a corpus whose
    * head deciles dwarf the tail is boilerplate-heavy, one with a flat
    * profile is template noise — this is the one-page distribution
    * fingerprint corpus reviews put next to the data card (p15).
    *
    * Scale shape: ONE corpus exchange (the word-keyed frequency
    * rollup, map-side combined); everything after operates on the
    * VOCABULARY table, which Heaps' law bounds far below corpus size —
    * its global rank window is model-sized control-plane work (t34's
    * discipline), never a corpus sort. Ranks tie-break (count desc,
    * word) so both engines agree exactly.
    */
  private def t50ZipfFit(s: SparkSession, d: String): DataFrame = {
    val uni = Tables.documents(s, d)
      .select(explode(wordsCol(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val wRank = org.apache.spark.sql.expressions.Window
      .orderBy(col("c").desc, col("w"))
    uni.withColumn("rnk", row_number().over(wRank).cast("long"))
      .crossJoin(broadcast(uni.agg(count(lit(1)).as("n_types"))))
      .withColumn("decile", expr("CAST(((rnk - 1) * 10) DIV n_types AS INT)"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_in_decile"),
        min(col("rnk")).as("rank_lo"), max(col("rnk")).as("rank_hi"),
        sum(col("c")).as("freq_mass"),
        sum(col("rnk") * col("c")).as("rf_sum"))
      .withColumn("mean_rf", expr("rf_sum DIV n_in_decile"))
      .orderBy("decile")
  }

  private val t50Oracle: String = {
    val ws = wordsSql("text")
    s"""WITH uni AS (
       |  SELECT w, CAST(count(*) AS BIGINT) AS c
       |  FROM (SELECT unnest($ws) AS w FROM documents) GROUP BY w),
       |n AS (SELECT CAST(count(*) AS BIGINT) AS n_types FROM uni),
       |rk AS (
       |  SELECT w, c, CAST(row_number() OVER (ORDER BY c DESC, w) AS BIGINT) AS rnk
       |  FROM uni)
       |SELECT CAST(((rnk - 1) * 10) // n.n_types AS INT) AS decile,
       |       CAST(count(*) AS BIGINT) AS n_in_decile,
       |       min(rnk) AS rank_lo, max(rnk) AS rank_hi,
       |       CAST(sum(c) AS BIGINT) AS freq_mass,
       |       CAST(sum(rnk * c) AS BIGINT) AS rf_sum,
       |       CAST(sum(rnk * c) AS BIGINT) // count(*) AS mean_rf
       |FROM rk, n
       |GROUP BY 1 ORDER BY decile""".stripMargin
  }

  // ---- t51: trained quality classifier (logistic regression) ----------------

  /** Hashed-feature buckets for the classifier — [[T51Bias]] is the
    * always-on intercept feature one past the last hash bucket.
    */
  private[ops] val T51Buckets = 256
  private[ops] val T51Bias = T51Buckets
  /** Full-batch gradient rounds — fixed, so the oracle unrolls them. */
  private[ops] val T51Rounds = 8
  /** Fixed-point scale: probabilities/weights live in micro-units. */
  private[ops] val T51Scale = 1000000L

  /** Engine-exact floor division (d > 0): both Spark's `DIV` and
    * DuckDB's `//` round NEGATIVE quotients differently across
    * engines/versions, so every signed division in the training loop
    * first subtracts the positive remainder — the quotient is then an
    * exact division both engines agree on bit-for-bit. Spark side
    * (`pmod` is built in).
    */
  private def fdivS(a: String, d: String): String =
    s"((($a) - pmod(($a), ($d))) DIV ($d))"

  /** [[fdivS]] for the DuckDB oracle (`pmod` spelled out). */
  private def fdivD(a: String, d: String): String =
    s"((($a) - (((($a) % ($d)) + ($d)) % ($d))) // ($d))"

  // The feature vector is per-mille unigram rates over [[T51Buckets]]
  // hashed buckets plus the bias feature, assembled in [[t51Feats]] by
  // the linear explode->rollup shape (the oracle's own `occ` CTE). An
  // earlier cut built it row-locally with nested higher-order
  // functions — per distinct bucket it re-hashed EVERY word, an
  // O(distinct_buckets x words) inner loop per document that made the
  // one-time feature build dominate all eight training rounds
  // combined (~9.8 s of the query's ~9.8 s at sf0.1).

  /** One full-batch gradient round, exposed pre-collect for the plan
    * audit: margins and errors are ROW-LOCAL (the weight vector rides
    * the plan as a 257-element literal array — no join), so the only
    * corpus-sized exchange is the bucket-keyed gradient rollup —
    * B-bounded, map-side combined. Returns ≤ [[T51Buckets]]+1 rows.
    */
  private[ops] def t51Grad(feats: DataFrame, w: Array[Long]): DataFrame = {
    val wArr = array(w.map(lit(_)): _*)
    feats
      .withColumn("msum", aggregate(col("feats"), lit(0L),
        (acc, f) => acc + f.getField("x") * element_at(wArr, f.getField("b") + 1)))
      .withColumn("m", expr(fdivS("msum", "1000")))
      .withColumn("p", greatest(lit(0L),
        least(lit(T51Scale), lit(T51Scale / 2) + expr(fdivS("m", "4")))))
      .withColumn("err", col("y") * lit(T51Scale) - col("p"))
      .select(col("err"), explode(col("feats")).as("f"))
      .select(col("f.b").as("b"), expr(fdivS("err * f.x", "1000")).as("gterm"))
      .groupBy("b").agg(sum(col("gterm")).as("g"))
  }

  /** The learn-from-labels member of the text family: a logistic-
    * regression quality classifier on hashed unigram features — the
    * fastText/CCNet-shaped filter every production corpus pipeline
    * trains (positive class = the curated half of the sources,
    * `src0..src9`; negative = the crawl half), where t32/t36 score by
    * FIXED rules. [[T51Rounds]] deterministic full-batch gradient
    * rounds in integer fixed-point: features are per-mille unigram
    * rates over [[T51Buckets]] hashed buckets plus a bias
    * ([[t51Feats]], built by a linear explode→rollup), the link is the
    * piecewise-linear HARD sigmoid `clamp(½ + m/4, 0, 1)` (Courbariaux
    * et al. 2015's binarized-net link — exact in integer arithmetic,
    * where the logistic exp is libm-bound, the t44 trick), and every
    * signed division floors via the positive-remainder identity so
    * both engines agree bit-for-bit. The oracle replays the identical
    * rounds as unrolled CTEs (t40's recipe).
    *
    * Scale shape: the corpus reduces ONCE to a pinned row-local
    * feature frame (doc_id, y, feats); each round is one pass over it
    * whose margins/errors are row-local (the weight vector is a
    * literal array — no join anywhere in the round) and whose only
    * corpus-sized exchange keys on the BUCKET (B-bounded, map-side
    * combined); the ≤257-row gradient is driver-side control-plane
    * (q53's histogram discipline). Full-batch GD at 100 TB is
    * R passes over the feature frame — the standard distributed
    * L-BFGS/GD layout (weights broadcast out, gradients tree-reduced
    * back). Integer headroom: |err·x| ≤ 10⁹ per row, so the bucket
    * sum stays < 2⁶³ to ~10⁹ docs; past that the gradient would flip
    * to doubles and the oracle to tolerance (mm15's lossy contract).
    *
    * Train accuracy on the fixture is ceiling-bound by design: the
    * planted per-source unigram signatures differ by only ±10-20
    * per-mille, and a float LR run to convergence measures 0.60 train
    * accuracy — the integer model's 0.61 at sf0.01 IS the signal;
    * the spec asserts it beats the majority class, not a vanity bar.
    */
  /** The corpus→features reduction, pre-checkpoint (the plan-audit
    * seam — the registered query pins it eagerly): tokenize-explode,
    * roll up occurrence counts on (doc_id, bucket) — each word hashed
    * exactly ONCE, linear in corpus tokens — union the always-present
    * bias row per doc, and regroup to the per-doc feature array. Two
    * doc-keyed exchanges, both map-side combined, no join; the array
    * order is nondeterministic but every consumer folds it with a
    * commutative integer sum.
    */
  private[ops] def t51Feats(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"),
        expr("CAST(CASE WHEN CAST(substring(source, 4) AS INT) < 10 THEN 1 ELSE 0 END AS BIGINT)").as("y"),
        expr("filter(split(trim(text), ' '), v -> v <> '')").as("ws"))
    val occ = docs
      .select(col("doc_id"), col("y"), size(col("ws")).as("n"),
        explode(col("ws")).as("w"))
      .select(col("doc_id"), col("y"), col("n"),
        expr(s"CAST((${polyHashSql("w", 8)}) % $T51Buckets AS INT)").as("b"))
      .groupBy(col("doc_id"), col("b"))
      .agg(first(col("y")).as("y"),
        expr("CAST(1000 * count(1) AS BIGINT) DIV CAST(first(n) AS BIGINT)").as("x"))
    val bias = docs.select(col("doc_id"), col("y"),
      lit(T51Bias).as("b"), lit(1000L).as("x"))
    occ.unionByName(bias)
      .groupBy(col("doc_id"))
      .agg(first(col("y")).as("y"),
        collect_list(struct(col("b"), col("x"))).as("feats"))
  }

  private def t51QualityClf(s: SparkSession, d: String): DataFrame = {
    val feats = t51Feats(s, d).localCheckpoint(true)
    val n = feats.count()
    val w = Array.fill(T51Buckets + 1)(0L)
    (1 to T51Rounds).foreach { _ =>
      t51Grad(feats, w).collect().foreach { r =>
        val b = r.getAs[Int]("b")
        w(b) += Math.floorDiv(r.getAs[Long]("g"), n)
      }
    }
    val wArr = array(w.map(lit(_)): _*)
    feats
      .withColumn("msum", aggregate(col("feats"), lit(0L),
        (acc, f) => acc + f.getField("x") * element_at(wArr, f.getField("b") + 1)))
      .withColumn("score", greatest(lit(0L), least(lit(T51Scale),
        lit(T51Scale / 2) + expr(fdivS(fdivS("msum", "1000"), "4")))))
      .select(col("doc_id"), col("y").cast("int").as("label"), col("score"),
        expr(s"CAST(CASE WHEN score >= ${T51Scale / 2} THEN 1 ELSE 0 END AS INT)").as("pred"),
        expr(s"CAST(CASE WHEN (score >= ${T51Scale / 2}) = (y = 1) THEN 1 ELSE 0 END AS INT)").as("correct"))
      .orderBy("doc_id")
  }

  /** The t51 training chain as a reusable WITH body ending in
    * `sc(doc_id, score)` + `lab(doc_id, y)` — p18's labeling queue
    * replays the identical training before its acquisition step.
    */
  private[ops] val t51OracleCtes: String = {
    val ws = wordsSql("text")
    val h = polyHashSql("w", 8)
    val rounds = (1 to T51Rounds).map { k =>
      s"""m$k AS (
         |  SELECT o.doc_id, ${fdivD("sum(o.x * w.wt)", "1000")} AS m
         |  FROM occ o JOIN w${k - 1} w USING (b) GROUP BY o.doc_id),
         |e$k AS (
         |  SELECT m.doc_id,
         |         l.y * $T51Scale - GREATEST(0, LEAST($T51Scale,
         |           ${T51Scale / 2} + ${fdivD("m.m", "4")})) AS err
         |  FROM m$k m JOIN lab l USING (doc_id)),
         |g$k AS (
         |  SELECT o.b, CAST(sum(${fdivD("e.err * o.x", "1000")}) AS BIGINT) AS g
         |  FROM occ o JOIN e$k e USING (doc_id) GROUP BY o.b),
         |w$k AS (
         |  SELECT w.b, w.wt + CASE WHEN g.g IS NULL THEN 0
         |           ELSE ${fdivD("g.g", "nn.nd")} END AS wt
         |  FROM w${k - 1} w LEFT JOIN g$k g USING (b) CROSS JOIN nn)""".stripMargin
    }.mkString(",\n")
    s"""wl AS (SELECT doc_id, $ws AS ws FROM documents),
       |lab AS (
       |  SELECT doc_id, CAST(CASE WHEN CAST(substr(source, 4) AS INT) < 10
       |           THEN 1 ELSE 0 END AS BIGINT) AS y FROM documents),
       |tok AS (SELECT doc_id, len(ws) AS n, unnest(ws) AS w FROM wl),
       |occ AS (
       |  SELECT doc_id, b, x FROM (
       |    SELECT doc_id, CAST(($h) % $T51Buckets AS INT) AS b,
       |           CAST(1000 * count(*) AS BIGINT) // CAST(min(n) AS BIGINT) AS x
       |    FROM tok GROUP BY doc_id, CAST(($h) % $T51Buckets AS INT))
       |  UNION ALL
       |  SELECT doc_id, $T51Bias AS b, CAST(1000 AS BIGINT) AS x FROM wl),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents),
       |w0 AS (SELECT CAST(unnest(generate_series(0, $T51Bias)) AS INT) AS b,
       |              CAST(0 AS BIGINT) AS wt),
       |$rounds,
       |sc AS (
       |  SELECT o.doc_id, GREATEST(0, LEAST($T51Scale, ${T51Scale / 2} +
       |           ${fdivD(fdivD("sum(o.x * w.wt)", "1000"), "4")})) AS score
       |  FROM occ o JOIN w$T51Rounds w USING (b) GROUP BY o.doc_id)""".stripMargin
  }

  private val t51Oracle: String =
    s"""WITH $t51OracleCtes
       |SELECT s.doc_id, CAST(l.y AS INT) AS label, CAST(s.score AS BIGINT) AS score,
       |       CAST(CASE WHEN s.score >= ${T51Scale / 2} THEN 1 ELSE 0 END AS INT) AS pred,
       |       CAST(CASE WHEN (s.score >= ${T51Scale / 2}) = (l.y = 1) THEN 1 ELSE 0 END AS INT) AS correct
       |FROM sc s JOIN lab l USING (doc_id) ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t51_quality_clf" -> (t51QualityClf _),
    "t50_zipf_fit" -> (t50ZipfFit _),
    "t49_vocab_growth" -> (t49VocabGrowth _),
    "t48_fertility" -> (t48Fertility _),
    "t47_blocklist" -> (t47Blocklist _),
    "t46_collocations" -> (t46Collocations _),
    "t45_mad_outliers" -> (t45MadOutliers _),
    "t44_dsir" -> (t44Dsir _),
    "t42_bpe_decode" -> (t42BpeDecode _),
    "t43_seq_pack" -> (t43SeqPack _),
    "t41_bpe_encode" -> (t41BpeEncode _),
    "t40_bpe_train" -> (t40BpeTrain _),
    "t39_novelty" -> (t39Novelty _),
    "t38_split_leakage" -> (t38SplitLeakage _),
    "t37_vocab_coverage" -> (t37VocabCoverage _),
    "t36_gopher_rules" -> (t36GopherRules _),
    "t35_boilerplate" -> (t35Boilerplate _),
    "t29_chunk" -> (t29Chunk _),
    "t27_repetition" -> (t27Repetition _),
    "t28_pii_redact" -> (t28PiiRedact _),
    "t26_train_split" -> (t26TrainSplit _),
    "t21_quality_score" -> (t21Quality _),
    "t22_lang_id" -> (t22LangId _),
    "t23_token_stats" -> (t23TokenStats _),
    "t24_fingerprint" -> (t24Fingerprint _),
    "t25_tfidf" -> (t25Tfidf _),
    "t30_data_mix" -> (t30DataMix _),
    "t31_source_cap" -> (t31SourceCap _),
    "t32_bigram_lm" -> (t32BigramLm _),
    "t34_ppl_buckets" -> (t34PplBuckets _),
    "t33_token_mask" -> (t33TokenMask _)
  )

  // ---- t32: bigram language-model scoring ----------------------------------

  /** Statistical-LM quality scoring (the KenLM-shaped filter of a
    * curation pipeline, arithmetic kept cross-engine-exact): train a
    * bigram MLE model ON the corpus itself — c(w₁w₂) and its prefix
    * total c(w₁·) — then score every document by the mean scaled
    * conditional probability of its bigrams,
    * `avg_score = (Σ (10⁶·c(w₁w₂)) DIV c(w₁·)) DIV n_bigrams`.
    * Log-prob would be the textbook form but `ln` is libm-dependent;
    * integer-scaled probability ranks documents the same way for a
    * fixed model and hashes identically in both engines (same trick
    * as t25's rational tf/df).
    *
    * Scale shape: the MODEL is vocabulary²-bounded — orders of
    * magnitude smaller than the corpus — so at 100 TB it broadcasts
    * to the scoring join (here AQE makes that call); the corpus-side
    * cost is one explode + one shuffle on the bigram key, the same
    * topology as word count. Docs with < 2 words have no bigrams and
    * drop out (the Spark side needs the explicit size guard below;
    * DuckDB's `generate_series(1, 0)` is empty on its own).
    */
  /** Per-document bigram-LM scores (doc_id, n_bigrams, score_sum,
    * avg_score), unordered — the shared body of t32 (which reports
    * them) and t34 (which filters the corpus on them).
    */
  private[ops] def bigramScores(s: SparkSession, d: String): DataFrame = {
    // CASE-guarded like t24/d2: Spark's sequence(1, 0) is the
    // DESCENDING [1, 0] (step -1), so an unguarded transform would
    // evaluate element_at(ws, 0) and throw on a 0/1-word document —
    // the guard makes both engines agree on "no bigrams" instead
    val bigrams = Tables
      .documents(s, d)
      .select(col("doc_id"), wordsCol(col("text")).as("ws"))
      .select(col("doc_id"), explode(expr(
        """CASE WHEN size(ws) >= 2 THEN
          |  transform(sequence(1, size(ws) - 1), i ->
          |    concat(element_at(ws, CAST(i AS INT)), ' ',
          |           element_at(ws, CAST(i AS INT) + 1)))
          |ELSE CAST(array() AS ARRAY<STRING>) END""".stripMargin)).as("bg"))
    val bgCounts = bigrams.groupBy("bg").agg(count(lit(1)).as("c_bg"))
    val w1Counts = bgCounts
      .withColumn("w1", expr("split(bg, ' ')[0]"))
      .groupBy("w1").agg(sum(col("c_bg")).as("c_w1"))
    val model = bgCounts
      .withColumn("w1", expr("split(bg, ' ')[0]"))
      .join(w1Counts, Seq("w1"))
      .select(col("bg"), col("c_bg"), col("c_w1"))
    bigrams
      .join(model, Seq("bg"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(expr("(1000000 * c_bg) DIV c_w1")).as("score_sum"))
      .withColumn("avg_score", expr("score_sum DIV n_bigrams"))
  }

  private def t32BigramLm(s: SparkSession, d: String): DataFrame =
    bigramScores(s, d).orderBy("doc_id")

  // ---- t34: perplexity-tertile corpus filter -------------------------------

  /** The CCNet-style perplexity filter: score every document with the
    * corpus bigram LM (t32's integer-exact scores — higher = more
    * probable = "cleaner"), rank the corpus, and split it into
    * head / middle / tail tertiles, keeping head+middle. This is the
    * classic quality gate between raw crawl and training mix (CCNet
    * keeps the low-perplexity head; the tail is the noise bucket).
    *
    * Scale shape: the naive form is a GLOBAL row_number over the
    * corpus — a single-partition sort that dies at 100 TB. Instead
    * the rank decomposes through the score DISTRIBUTION: avg_score
    * has at most 10⁶+1 distinct values (per-mille-of-10⁶ integers),
    * so `rnk = (#docs with higher score) + (rank among equal scores
    * by doc_id)`. The distribution table is model-bounded (one tiny
    * groupBy), its cumulative sum is a window over ≤10⁶ rows
    * (control-plane), and the corpus side pays one broadcast join on
    * avg_score plus a per-score-partition window — no global sort
    * anywhere. The oracle computes the same rank with DuckDB's plain
    * global row_number, proving the decomposition exact.
    */
  /** The lazy tertile plan over per-doc scores — split out so the
    * plan audit can inspect the pre-checkpoint shape.
    */
  private[ops] def t34From(sc: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dist = sc.groupBy(col("avg_score")).agg(count(lit(1)).as("c"))
    // bounded side: ≤ 10^6+1 rows regardless of corpus size
    val wCum = Window.orderBy(col("avg_score").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = dist
      .withColumn("before", coalesce(sum(col("c")).over(wCum), lit(0L)))
      .crossJoin(broadcast(dist.agg(sum(col("c")).as("n_docs"))))
      .select("avg_score", "before", "n_docs")
    val wIn = Window.partitionBy(col("avg_score")).orderBy(col("doc_id"))
    sc
      .join(broadcast(cum), Seq("avg_score"))
      .withColumn("rnk", col("before") + row_number().over(wIn))
      .withColumn("bucket", expr(
        """CASE WHEN (rnk - 1) * 3 < n_docs THEN 'head'
          |     WHEN (rnk - 1) * 3 < 2 * n_docs THEN 'middle'
          |     ELSE 'tail' END""".stripMargin))
      .withColumn("kept", col("bucket") =!= "tail")
      .select("doc_id", "avg_score", "rnk", "bucket", "kept")
  }

  private def t34PplBuckets(s: SparkSession, d: String): DataFrame = {
    // an eager checkpoint, not persist(): the per-doc score frame is
    // consumed three times (distribution, total, final join) but read
    // back raw — the columnar cache build cost more than it saved
    // (same finding as the q54 pin probe)
    val sc = bigramScores(s, d).localCheckpoint(true)
    t34From(sc)
      .orderBy("doc_id")
      .localCheckpoint(true)
  }

  /** Oracle CTE prefix shared by t32/t34: bigram model + per-doc
    * scores, ending in `sc(doc_id, n_bigrams, score_sum, avg_score)`.
    */
  private val bigramOracleCtes: String = {
    val ws = wordsSql("text")
    s"""w AS (SELECT doc_id, $ws AS ws FROM documents),
       |bg AS (
       |  SELECT doc_id,
       |         unnest(list_transform(generate_series(1, greatest(len(ws) - 1, 0)),
       |                i -> ws[i] || ' ' || ws[i + 1])) AS bg
       |  FROM w),
       |m AS (SELECT bg, count(*) AS c_bg FROM bg GROUP BY bg),
       |m1 AS (SELECT string_split(bg, ' ')[1] AS w1,
       |              CAST(sum(c_bg) AS BIGINT) AS c_w1
       |       FROM m GROUP BY 1),
       |model AS (
       |  SELECT m.bg, m.c_bg, m1.c_w1 FROM m
       |  JOIN m1 ON string_split(m.bg, ' ')[1] = m1.w1),
       |sc AS (
       |  SELECT b.doc_id, count(*) AS n_bigrams,
       |         CAST(sum((1000000 * c_bg) // c_w1) AS BIGINT) AS score_sum,
       |         CAST(CAST(sum((1000000 * c_bg) // c_w1) AS BIGINT) // count(*) AS BIGINT) AS avg_score
       |  FROM bg b JOIN model ON b.bg = model.bg
       |  GROUP BY b.doc_id)""".stripMargin
  }

  private val t32Oracle: String =
    s"""WITH $bigramOracleCtes
       |SELECT doc_id, n_bigrams, score_sum, avg_score
       |FROM sc ORDER BY doc_id""".stripMargin

  private val t34Oracle: String =
    s"""WITH $bigramOracleCtes,
       |r AS (
       |  SELECT doc_id, avg_score,
       |         CAST(row_number() OVER (ORDER BY avg_score DESC, doc_id) AS BIGINT) AS rnk,
       |         count(*) OVER () AS n_docs
       |  FROM sc)
       |SELECT doc_id, avg_score, rnk, bucket, bucket <> 'tail' AS kept FROM (
       |  SELECT doc_id, avg_score, rnk,
       |         CASE WHEN (rnk - 1) * 3 < n_docs THEN 'head'
       |              WHEN (rnk - 1) * 3 < 2 * n_docs THEN 'middle'
       |              ELSE 'tail' END AS bucket
       |  FROM r)
       |ORDER BY doc_id""".stripMargin

  // ---- t33: deterministic masking augmentation -----------------------------

  /** Training-data augmentation that must be REPRODUCIBLE: BERT-style
    * token masking where the mask decision for word i of doc d is a
    * pure function of (d, i) — an md5 coin at 15% — so any re-run,
    * any engine, any partitioning produces the identical corrupted
    * corpus (the property that makes training runs comparable and
    * ablations honest; `rand()` masking loses it). Row-local
    * transform, zero shuffles; the gate pins the masked text itself
    * via md5, not just the mask counts.
    */
  private def t33TokenMask(s: SparkSession, d: String): DataFrame = {
    val coin = polyHashSql("md5(concat(CAST(doc_id AS STRING), '-', CAST(i AS STRING)))", 8)
    Tables
      .documents(s, d)
      .select(col("doc_id"), wordsCol(col("text")).as("ws"))
      // the standard empty-guard (t32/t24/d2): sequence(1, 0) descends
      .withColumn("masked", expr(
        s"""CASE WHEN size(ws) >= 1 THEN
           |  transform(sequence(1, size(ws)), i ->
           |    CASE WHEN $coin % 100 < 15 THEN '<MASK>'
           |         ELSE element_at(ws, CAST(i AS INT)) END)
           |ELSE CAST(array() AS ARRAY<STRING>) END""".stripMargin))
      .select(
        col("doc_id"),
        size(col("ws")).as("n_words"),
        expr("size(filter(masked, x -> x = '<MASK>'))").as("n_masked"),
        md5(array_join(col("masked"), " ")).as("masked_md5"))
      .orderBy("doc_id")
  }

  private val t33Oracle: String = {
    val ws = wordsSql("text")
    val coin = polyHashSql(
      "md5(CAST(doc_id AS VARCHAR) || '-' || CAST(i AS VARCHAR))", 8)
    s"""SELECT doc_id, CAST(len(ws) AS INT) AS n_words,
       |       CAST(len(list_filter(masked, x -> x = '<MASK>')) AS INT) AS n_masked,
       |       md5(array_to_string(masked, ' ')) AS masked_md5
       |FROM (
       |  SELECT doc_id, ws,
       |         list_transform(generate_series(1, len(ws)), i ->
       |           CASE WHEN $coin % 100 < 15 THEN '<MASK>' ELSE ws[i] END) AS masked
       |  FROM (SELECT doc_id, $ws AS ws FROM documents))
       |ORDER BY doc_id""".stripMargin
  }

  // ---- t43: sequence packing (concat-and-split at context length) ----------

  /** Pack the tokenized corpus into fixed-length training sequences
    * the way GPT-style pipelines do: concatenate documents in a
    * deterministic order and split every L = 128 tokens — each doc
    * occupies the token interval [off, off+tok) of its shard's
    * stream, and every sequence is the interval [s·L, (s+1)·L), so a
    * doc's fragments are just the interval intersections. The output
    * is the packing MANIFEST (shard, seq, doc_id, start_in_seq,
    * frag_tokens) a loader needs to materialize any sequence — the
    * step between t29's per-doc chunking and an actual training
    * batch: zero padding anywhere except each shard's final partial
    * sequence.
    *
    * Scale shape: packing is SHARD-LOCAL by construction (shard =
    * doc_id % 8 here; production shards are the p3/p10 units sized to
    * a worker) — the prefix sum is a window partitioned on shard, so
    * the only exchange keys on shard and NOTHING goes single-
    * partition; fragment fan-out is a row-local explode of size
    * ≤ tok/L + 1. All arithmetic is non-negative integer division,
    * exact in both engines.
    */
  private def t43SeqPack(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(s, d)
      .select(col("doc_id"), (col("doc_id") % 8).as("shard"),
        size(wordsCol(col("text"))).cast("long").as("tok"))
      .filter(col("tok") > 0)
      .withColumn("off", coalesce(sum("tok").over(w), lit(0L)))
      .withColumn("seq",
        explode(expr("sequence(off DIV 128, (off + tok - 1) DIV 128)")))
      .select(col("shard"), col("seq"), col("doc_id"),
        (greatest(col("off"), col("seq") * 128) - col("seq") * 128).as("start_in_seq"),
        (least(col("off") + col("tok"), (col("seq") + 1) * 128)
          - greatest(col("off"), col("seq") * 128)).as("frag_tokens"))
      .orderBy("shard", "seq", "doc_id")
  }

  private val t43Oracle: String = {
    val ws = wordsSql("text")
    s"""WITH dt AS (
       |  SELECT doc_id, doc_id % 8 AS shard, CAST(len($ws) AS BIGINT) AS tok
       |  FROM documents WHERE len($ws) > 0),
       |o AS (
       |  SELECT *, COALESCE(CAST(sum(tok) OVER (PARTITION BY shard ORDER BY doc_id
       |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS off
       |  FROM dt),
       |f AS (
       |  SELECT shard, doc_id, off, tok,
       |         unnest(generate_series(off // 128, (off + tok - 1) // 128)) AS seq
       |  FROM o)
       |SELECT shard, seq, doc_id,
       |       greatest(off, seq * 128) - seq * 128 AS start_in_seq,
       |       least(off + tok, (seq + 1) * 128) - greatest(off, seq * 128) AS frag_tokens
       |FROM f ORDER BY shard, seq, doc_id""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "t51_quality_clf" -> t51Oracle,
    "t50_zipf_fit" -> t50Oracle,
    "t49_vocab_growth" -> t49Oracle,
    "t48_fertility" -> t48Oracle,
    "t47_blocklist" -> t47Oracle,
    "t46_collocations" -> t46Oracle,
    "t45_mad_outliers" -> t45Oracle,
    "t44_dsir" -> t44Oracle,
    "t42_bpe_decode" -> t42Oracle,
    "t43_seq_pack" -> t43Oracle,
    "t41_bpe_encode" -> t41Oracle,
    "t40_bpe_train" -> t40Oracle,
    "t39_novelty" -> t39Oracle,
    "t38_split_leakage" -> t38Oracle,
    "t37_vocab_coverage" -> t37Oracle,
    "t36_gopher_rules" -> t36Oracle,
    "t35_boilerplate" -> t35Oracle,
    "t33_token_mask" -> t33Oracle,
    "t32_bigram_lm" -> t32Oracle,
    "t34_ppl_buckets" -> t34Oracle,
    "t29_chunk" -> t29Oracle,
    "t27_repetition" -> t27Oracle,
    "t28_pii_redact" -> t28Oracle,
    "t26_train_split" -> t26Oracle,
    "t21_quality_score" -> t21Oracle,
    "t22_lang_id" -> t22Oracle,
    "t23_token_stats" -> t23Oracle,
    "t24_fingerprint" -> t24Oracle,
    "t25_tfidf" -> t25Oracle,
    "t30_data_mix" -> t30Oracle,
    "t31_source_cap" -> t31Oracle
  )
}

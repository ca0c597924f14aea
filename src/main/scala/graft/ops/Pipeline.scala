package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** The capstone composite: a miniature training-data curation
  * pipeline — quality-score → filter → exact-dedup → split — run as
  * ONE declarative plan. Each stage exists standalone (t21, d1, t26);
  * composing them is the point: Catalyst fuses the scoring and split
  * projections into the scan, the dedup is the only shuffle, and the
  * final rollup is map-side-combinable — the whole curation pass over
  * 100 TB is scan → one content-hash shuffle → tiny agg.
  *
  * Determinism: quality is built from exact integer counts with the
  * identical double expression on both engines; the dedup canonical
  * row is `arg_min`/`min_by` on the unique doc_id; the split key is
  * the engines' shared polynomial hash of the TEXT (copies collapse
  * to one row AND would land in the same split anyway — no
  * train/test leakage through duplicates).
  */
object Pipeline {

  /** The pipeline's quality score over a `words` array column —
    * length saturation + type/token ratio + stopword penalty, every
    * term a ratio of exact integer counts so both engines evaluate
    * the identical double expression. Shared by p1 (batch curation)
    * and p6 (streaming ingestion): the streaming gate must run the
    * SAME scorer, not a copy.
    */
  private[ops] def qualityCol(words: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val nWords = size(words)
    least(nWords.cast("double") / 80.0, lit(1.0)) * 0.4 +
      (size(array_distinct(words)).cast("double") / nWords) * 0.3 +
      (lit(1.0) -
        size(filter(words, w => w.isin("the", "a"))).cast("double")
          / nWords) * 0.3
  }

  private def p1Curation(s: SparkSession, d: String): DataFrame = {
    val scored = Tables
      .documents(s, d)
      .withColumn("words", Text.wordsCol(col("text")))
      .withColumn("n_words", size(col("words")))
      .withColumn("quality", qualityCol(col("words")))
      .filter(col("quality") >= 0.5)
    val deduped = scored
      .groupBy(md5(col("text")).as("text_key"))
      .agg(
        min(col("doc_id")).as("doc_id"),
        min_by(col("source"), col("doc_id")).as("source"),
        min_by(col("quality"), col("doc_id")).as("quality"),
        min_by(col("text"), col("doc_id")).as("text")
      )
    deduped
      .withColumn("h", expr(s"${Text.polyHashSql("text", 8)} % 100"))
      .withColumn("split",
        when(col("h") < 80, "train").when(col("h") < 90, "val").otherwise("test"))
      .groupBy(col("source"), col("split"))
      .agg(
        count(lit(1)).as("n_docs"),
        min(col("quality")).as("min_q"),
        max(col("quality")).as("max_q")
      )
      .orderBy("source", "split")
  }

  private val p1Oracle: String = {
    val ws = Text.wordsSql("text")
    s"""WITH scored AS (
       |  SELECT doc_id, source, text, quality FROM (
       |    SELECT doc_id, source, text,
       |           least(CAST(n_words AS DOUBLE) / 80.0, 1.0) * 0.4
       |             + (CAST(n_uniq AS DOUBLE) / n_words) * 0.3
       |             + (1.0 - CAST(n_stop AS DOUBLE) / n_words) * 0.3 AS quality
       |    FROM (SELECT doc_id, source, text,
       |                 CAST(len($ws) AS INT) AS n_words,
       |                 CAST(len(list_distinct($ws)) AS INT) AS n_uniq,
       |                 CAST(len(list_filter($ws, x -> x IN ('the','a'))) AS INT) AS n_stop
       |          FROM documents))
       |  WHERE quality >= 0.5),
       |deduped AS (
       |  SELECT min(doc_id) AS doc_id,
       |         arg_min(source, doc_id) AS source,
       |         arg_min(quality, doc_id) AS quality,
       |         arg_min(text, doc_id) AS text
       |  FROM scored GROUP BY md5(text))
       |SELECT source, split, count(*) AS n_docs,
       |       min(quality) AS min_q, max(quality) AS max_q
       |FROM (
       |  SELECT source, quality,
       |         CASE WHEN ${Text.polyHashSql("text", 8)} % 100 < 80 THEN 'train'
       |              WHEN ${Text.polyHashSql("text", 8)} % 100 < 90 THEN 'val'
       |              ELSE 'test' END AS split
       |  FROM deduped)
       |GROUP BY source, split ORDER BY source, split""".stripMargin
  }

  // ---- p2: sequence packing ------------------------------------------------

  /** Context-window packing: assign documents to fixed-token-budget
    * training sequences (budget 2048, whitespace tokens). Sharded
    * contiguous fill: docs are ordered within `doc_id % 8` shards and
    * a running token sum assigns bin `(cum−1) DIV budget` — every
    * step is integer, so both engines agree exactly.
    *
    * Scale design: packing is a RUNNING-SUM problem, which naively
    * wants a global order (single-partition window — the classic
    * scale-killer). Sharding first makes it embarrassingly parallel:
    * each shard packs independently and the shard count scales with
    * the cluster, at the cost of at most one under-filled trailing
    * bin per shard — the standard distributed-packing tradeoff. The
    * rollup reports per-bin fill so that waste is visible.
    */
  /** Pack a (doc_id, tokens) frame into 2048-token bins across 8
    * hash shards: running-sum window PER SHARD (never a global
    * window), then per-(shard, bin) stats. Shared by p2 and the p4
    * capstone so the capstone runs this operator's machinery, not a
    * copy.
    */
  private def packBins(docsTokens: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    docsTokens
      .withColumn("shard", col("doc_id") % 8)
      .withColumn("cum", sum(col("tokens")).over(w))
      .withColumn("bin", expr("(cum - 1) DIV 2048"))
      .groupBy("shard", "bin")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("tokens")).as("bin_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc")
      )
      .orderBy("shard", "bin")
  }

  /** The packing SQL over a relation `rel(doc_id, tokens)` — the
    * oracle half of [[packBins]], shared by p2 and p4.
    */
  private def packBinsSql(rel: String): String =
    s"""SELECT shard, bin, count(*) AS n_docs,
       |       CAST(sum(tokens) AS BIGINT) AS bin_tokens,
       |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
       |FROM (
       |  SELECT doc_id, shard, tokens,
       |         (CAST(cum AS BIGINT) - 1) // 2048 AS bin FROM (
       |    SELECT doc_id, shard, tokens,
       |           sum(tokens) OVER (PARTITION BY shard ORDER BY doc_id
       |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |    FROM (SELECT doc_id, doc_id % 8 AS shard, tokens FROM $rel)))
       |GROUP BY shard, bin ORDER BY shard, bin""".stripMargin

  private def p2SeqPack(s: SparkSession, d: String): DataFrame =
    packBins(Tables
      .documents(s, d)
      .select(col("doc_id"), size(Text.wordsCol(col("text"))).as("tokens")))

  private val p2Oracle: String = {
    val ws = Text.wordsSql("text")
    s"""WITH toks AS (SELECT doc_id, CAST(len($ws) AS INT) AS tokens FROM documents)
       |${packBinsSql("toks")}""".stripMargin
  }

  // ---- p3: deterministic shard shuffle (training-order permutation) --------

  /** The last step of a curation pipeline: hand the trainer a
    * reproducible pseudo-random READING ORDER over the corpus. A
    * naive global shuffle is `ORDER BY random()` — non-reproducible
    * AND, done as one global row_number, a single-partition window
    * (the classic scale-killer, same trap p2 dodges). The distributed
    * answer: a deterministic md5-derived coin both engines compute
    * identically gives every doc a (shard, position) — shard = h % 16
    * spreads docs uniformly, position = rank of h within the shard —
    * and each of the 16 shards sorts independently (one hash exchange,
    * parallel intra-shard sorts; shard count scales with the cluster).
    * A trainer reading shards round-robin sees a fixed global
    * permutation with no coordination. The result pins that
    * permutation, not just membership: `ord_sig` folds position into
    * an order-sensitive checksum, so both engines must agree on the
    * EXACT order within every shard, byte for byte.
    */
  private def p3ShardShuffle(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))
    Tables
      .documents(s, d)
      .select(col("doc_id"), col("n_chars"),
        expr(Text.polyHashSql("md5(CAST(doc_id AS STRING))", 8)).as("h"))
      .withColumn("shard", col("h") % 16)
      .withColumn("pos", row_number().over(w))
      .groupBy("shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        sum(col("pos") * (col("doc_id") % 997)).as("ord_sig"))
      .orderBy("shard")
  }

  private val p3Oracle: String = {
    val h = Text.polyHashSql("md5(CAST(doc_id AS VARCHAR))", 8)
    s"""SELECT shard, count(*) AS n_docs,
       |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       |       CAST(sum(pos * (doc_id % 997)) AS BIGINT) AS ord_sig
       |FROM (
       |  SELECT doc_id, n_chars, shard,
       |         row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS pos
       |  FROM (SELECT doc_id, n_chars, $h AS h, $h % 16 AS shard
       |        FROM documents))
       |GROUP BY shard ORDER BY shard""".stripMargin
  }

  // ---- p4: the whole training-data pipeline, one oracle -------------------

  /** CAPSTONE (the LLM-pipeline counterpart of `cdc_full_protocol`):
    * the complete curation flow COMPOSED as one lazy plan under one
    * hash-checked oracle —
    *
    *   1. QUALITY GATE: word-count bounds (30..400) — the cheap
    *      row-local filter that runs first so every later stage
    *      touches less data; eval-set docs (`doc_id % 11 = 0`, d6's
    *      benchmark definition) leave the corpus here too;
    *   2. DECONTAMINATION (d6's machinery): any surviving doc sharing
    *      13-grams with the benchmark beyond 2·hits > grams is
    *      dropped — broadcast the benchmark gram set, never join
    *      corpus×corpus;
    *   3. SPAN DEDUP (d10's machinery): 10-word segments keep only
    *      their first corpus occurrence ((doc_id, idx) election over
    *      the SURVIVOR corpus), docs keep their surviving token
    *      counts;
    *   4. SEQUENCE PACKING (p2's machinery): deduped token counts
    *      pack into 2048-token bins per 8-way shard (running-sum
    *      window per shard — never a global window).
    *
    * Output: per (shard, bin) pack stats over the CLEANED corpus. A
    * mistake anywhere — a doc wrongly kept or dropped, a span
    * mis-elected, a token miscounted, a bin boundary off by one —
    * shifts every downstream pack and breaks the hash. Each stage
    * keeps its standalone operator's scale shape; composing them adds
    * NO new shuffles beyond the stages' own (filter is free, the gram
    * join broadcasts, dedup shuffles segment/doc, packing shuffles
    * shard).
    */
  /** Span width shared by p4's plan and its oracle. */
  private val p4Span = 10

  private def p4FullPipeline(s: SparkSession, d: String): DataFrame = {
    val span = p4Span
    // stage 1: quality + eval-set removal. The tokenized corpus feeds
    // THREE consumers (benchmark grams, corpus grams, the survivor
    // dedup) — checkpoint it once or the full-corpus word split runs
    // three times (the d9 persist lesson, same family)
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), Text.wordsCol(col("text")).as("ws"))
      .withColumn("n_words", size(col("ws")))
      .localCheckpoint(true)
    val quality = docs
      .filter(col("n_words") >= 30 && col("n_words") <= 400 &&
        col("doc_id") % 11 =!= 0)
    // stage 2: decontamination against the benchmark gram set
    val bench = docs.filter(col("doc_id") % 11 === 0)
      .select(explode(graft.functions.SimHashFunctions
        .poly_grams(col("ws"), 13)).as("gram")).distinct()
    val contaminated = quality
      .select(col("doc_id"),
        graft.functions.SimHashFunctions.poly_grams(col("ws"), 13).as("g"))
      .select(col("doc_id"), size(col("g")).as("n_grams"), explode(col("g")).as("gram"))
      .join(broadcast(bench), "gram")
      .groupBy("doc_id")
      .agg(countDistinct(col("gram")).as("n_hits"), max(col("n_grams")).as("n_grams"))
      .filter(col("n_hits") * 2 > col("n_grams"))
      .select("doc_id")
    val survivors = quality.join(contaminated, Seq("doc_id"), "left_anti")
    // stage 3: span dedup over the survivor corpus — d10's machinery
    val cleaned = Dedup.keptSpans(Dedup.spanSegments(survivors, span))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("keep"), expr("size(split(seg, ' '))"))
        .otherwise(0L)).as("tokens"))
    // stage 4: shard-parallel sequence packing — p2's machinery
    packBins(cleaned)
  }

  private val p4Oracle: String = {
    val ws = Text.wordsSql("text")
    val gram = Dedup.gram13Sql(k => s"hw[i+$k]")
    s"""WITH docs AS (
       |  SELECT doc_id, $ws AS ws FROM documents),
       |quality AS (
       |  SELECT doc_id, ws FROM docs
       |  WHERE len(ws) BETWEEN 30 AND 400 AND doc_id % 11 <> 0),
       |grams AS (
       |  SELECT doc_id, list_distinct(list_transform(
       |           generate_series(1, greatest(len(hw) - 12, 0)),
       |           i -> $gram)) AS g
       |  FROM (SELECT doc_id, list_transform(ws, w -> ${Text.polyHashSql("w", 8)}) AS hw
       |        FROM docs)),
       |bench AS (
       |  SELECT DISTINCT unnest(g) AS gram FROM grams WHERE doc_id % 11 = 0),
       |contaminated AS (
       |  SELECT c.doc_id
       |  FROM (SELECT q.doc_id, CAST(len(g.g) AS INT) AS n_grams, unnest(g.g) AS gram
       |        FROM quality q JOIN grams g ON q.doc_id = g.doc_id) c
       |  JOIN bench b ON c.gram = b.gram
       |  GROUP BY c.doc_id HAVING 2 * count(DISTINCT c.gram) > max(c.n_grams)),
       |survivors AS (
       |  SELECT doc_id, ws FROM quality
       |  WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)),
       |${Dedup.spanSegsSql("survivors", p4Span)},
       |cleaned AS (
       |  SELECT doc_id,
       |         CAST(sum(CASE WHEN rn = 1 THEN len(string_split(seg, ' '))
       |                       ELSE 0 END) AS BIGINT) AS tokens
       |  FROM ranked GROUP BY doc_id)
       |${packBinsSql("cleaned")}""".stripMargin
  }

  // ---- p5: retrieval serving capstone (IVF probe → ADC → exact rerank) ----

  /** p4 is the CURATION capstone; this is the SERVING one — the
    * production read path of a billion-vector store, composed from
    * the index structures the s-family builds: the trained IVF
    * coarse quantizer (s4/s11) prunes the corpus to each query's
    * top-2 cells, PQ asymmetric-distance scoring (s9) ranks those
    * candidates by scanning CODES only, and the ADC top-20 get an
    * exact-cosine rerank for the final top-5 — FAISS `IndexIVFPQ` +
    * refine, as one lazy Spark plan under one oracle.
    *
    * Scale shape: the index frame (cell id + PQ codes per vector) is
    * ONE scan projection — at production scale it is the STORED
    * index (s4's output maintained by s10), so a query reads
    * ~nprobe/k of the codes and never touches a float vector until
    * the 20-row refine, whose full-precision reads are broadcast
    * point-lookups against the vector store. The only exchanges in
    * the whole plan are the two per-query top-k windows on qid
    * (plan-contract-tested); every join keyed on data is a
    * broadcast of control-plane-sized sides.
    *
    * Determinism: every stage reuses the integer-exact machinery its
    * standalone gate proved (quantized vectors, exact dots, one IEEE
    * division per centroid score, ADC totals in fixed subspace
    * order), so probe choice, ADC ranking, and the rerank are
    * bit-identical in DuckDB.
    */
  private def p5Retrieval(s: SparkSession, d: String): DataFrame = {
    val base = Similarity.quantized(s, d)
    val cents = Similarity.collectCents(Similarity.trainCodebook(base, iters = 2))
    val probes = Similarity.ivfProbes(base, cents, nprobe = 2)
      .select(col("qid"), col("pcid"))
    val subs = Similarity.pqSubs(s, d) // checkpointed: trains + LUTs
    val pcb = Similarity.pqTrain(subs)
    // the stored IVF-PQ index: one scan projection carrying cell + codes
    val coded = Similarity
      .pqCodeCols(Similarity.assignCellsFrom(Similarity.pqSubCols(base), cents), pcb)
      .select(col("vec_id") +: col("cid") +:
        (0 until Similarity.pqM).map(m => col(s"c$m")): _*)
    val wAdc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("adc_score").desc, col("vec_id"))
    val adc20 = coded
      .filter(col("vec_id") >= 5)
      .join(broadcast(probes), col("cid") === col("pcid"))
      .join(broadcast(Similarity.pqLuts(subs, pcb)), Seq("qid"))
      .withColumn("adc_score", Similarity.pqAdcScore(pcb))
      .withColumn("ar", row_number().over(wAdc))
      .filter(col("ar") <= 20)
      .select(col("qid"), col("vec_id"), col("cid").as("cell"), col("adc_score"))
    val qvecs = base.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("q").as("qv"))
    val wTop = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    base
      .filter(col("vec_id") >= 5)
      .join(broadcast(adc20), Seq("vec_id"))
      .join(broadcast(qvecs), Seq("qid"))
      .withColumn("cos",
        graft.functions.VectorFunctions.cosine_similarity(col("q"), col("qv")))
      .withColumn("rnk", row_number().over(wTop))
      .filter(col("rnk") <= 5)
      .select("qid", "vec_id", "cell", "adc_score", "cos", "rnk")
      .orderBy("qid", "rnk")
  }

  private val p5Oracle: String = {
    def dot8(a: String, b: String) = Similarity.pqDot8(a, b)
    val pivots = (0 until Similarity.pqM)
      .map(m => s"max(CASE WHEN m = $m THEN t END) AS t$m").mkString(",\n         ")
    val total = (0 until Similarity.pqM).map(m => s"t$m").mkString(" + ")
    s"""WITH base AS (
       |  SELECT vec_id,
       |         list_transform(embedding::DOUBLE[], x -> CAST(floor(x * 1000) AS BIGINT)) AS q
       |  FROM embeddings),
       |${Similarity.ivfOracleChain},
       |${Similarity.ivfProbeOracleCtes},
       |${Similarity.pqSubsOracleCte},
       |${Similarity.pqOracleChain},
       |cand AS (
       |  SELECT p.qid, x.vec_id, a.cid AS cell, x.m, x.cid AS code
       |  FROM codes x
       |  JOIN a3 a ON a.vec_id = x.vec_id
       |  JOIN probes p ON p.cid = a.cid
       |  WHERE x.vec_id >= 5),
       |terms AS (
       |  SELECT c.qid, c.vec_id, c.cell, c.m,
       |         CAST(${dot8("q.sub", "cb.sv")} AS DOUBLE) / cb.n AS t
       |  FROM cand c
       |  JOIN pc1 cb ON cb.m = c.m AND cb.cid = c.code
       |  JOIN subs q ON q.m = c.m AND q.vec_id = c.qid),
       |piv AS (
       |  SELECT qid, vec_id, cell,
       |         $pivots
       |  FROM terms GROUP BY qid, vec_id, cell),
       |adc20 AS (
       |  SELECT qid, vec_id, cell, adc_score FROM (
       |    SELECT qid, vec_id, cell, $total AS adc_score,
       |           row_number() OVER (PARTITION BY qid ORDER BY $total DESC, vec_id) AS ar
       |    FROM piv) WHERE ar <= 20),
       |rer AS (
       |  SELECT a.qid, a.vec_id, a.cell, a.adc_score,
       |         list_cosine_similarity(b.q::DOUBLE[], qb.q::DOUBLE[]) AS cos
       |  FROM adc20 a
       |  JOIN base b ON b.vec_id = a.vec_id
       |  JOIN base qb ON qb.vec_id = a.qid)
       |SELECT qid, vec_id, cell, adc_score, cos, rnk FROM (
       |  SELECT qid, vec_id, cell, adc_score, cos,
       |         CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS INT) AS rnk
       |  FROM rer)
       |WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin
  }

  // ---- p6: streaming ingestion — the curation front door ------------------

  /** A document ingestion event: what a crawler hand-off actually
    * delivers — an id, an arrival time, the payload, a provenance
    * tag. The harness synthesizes arrival times deterministically
    * from doc_id (one doc per 10 minutes) so both engines agree on
    * event time exactly.
    */
  final case class DocEvent(
      doc_id: Long, ts: java.sql.Timestamp, text: String, source: String)

  /** Streaming ingestion for the training-data pipeline: documents
    * arrive as a live stream (at-least-once, like any crawler
    * hand-off) and ONE streaming plan chains TWO stateful operators —
    * `dropDuplicatesWithinWatermark` on the delivery id (exactly-once
    * admission; state bounded by the watermark delay) followed by a
    * tumbling-window corpus-stats aggregation (append mode: a
    * window's row is emitted exactly once, when the event-time
    * watermark passes its end) — with the p1 quality scorer fused in
    * between as a stateless projection. This is the capability the
    * batch p-family lacks: corpus curation stats that update
    * CONTINUOUSLY as the crawl lands, no nightly re-scan of 100 TB —
    * only the watermark-deep tail of windows is ever open state.
    *
    * The replay plants duplicate deliveries both IN-batch and
    * ACROSS micro-batches (the cross-batch one must be caught by
    * state or discarded as late — either way admitted once), and the
    * append-mode contract makes the trailing (unfinalized) windows'
    * ABSENCE part of what the oracle checks, like cdc_session_stream.
    * Window starts surface as epoch micros: exact integers compare
    * across engines without timestamp-precision coupling.
    */
  private def p6StreamIngest(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    // Arrival events are synthesized IN-PLAN (`timestamp_seconds`
    // keeps the epoch arithmetic exact — the same instants the
    // MemoryStream feed used to build driver-side) and each delivery
    // wave is spooled to ONE parquet file by a distributed write; the
    // stream then ingests from a FILE source, one wave per
    // micro-batch (mtime order × maxFilesPerTrigger=1). Nothing
    // corpus-sized ever crosses the driver — at 100 TB the spool is
    // the crawler's landing bucket and this exact plan tails it.
    val ev = Tables.documents(s, d)
      .select(col("doc_id"),
        expr("timestamp_seconds(1700000000 + doc_id * 600)").as("ts"),
        col("text"), col("source"))
    val half = Tables.documents(s, d).count() / 2
    val wave1 = ev.filter(col("doc_id") < half)
    // second delivery wave: its own docs, PLUS a replay of every
    // 10th first-wave doc (cross-batch duplicate delivery) and a
    // second copy of every 20th second-wave doc (in-batch duplicate)
    val wave2 = ev.filter(col("doc_id") >= half)
      .unionByName(ev.filter(col("doc_id") < half && col("doc_id") % 10 === 0))
      .unionByName(ev.filter(col("doc_id") >= half && col("doc_id") % 20 === 0))
    val name = "p6_stream_ingest_sink"
    val cs = { val c = s.newSession(); c.conf.set("spark.sql.shuffle.partitions", "4"); c }
    val spool = java.nio.file.Files.createTempDirectory("graft-p6-")
    try {
      def spoolWave(df: DataFrame, fname: String, mtimeMs: Long): Unit = {
        val stage = spool.resolve(fname + ".stage")
        df.coalesce(1).write.mode("overwrite").parquet(stage.toString)
        val part = graft.Fs.listDir(stage)
          .find(p => p.getFileName.toString.startsWith("part-") &&
            p.getFileName.toString.endsWith(".parquet")).get
        java.nio.file.Files.move(part, spool.resolve(fname))
        // mtime orders the file source's processing: wave 1 strictly first
        java.nio.file.Files.setLastModifiedTime(spool.resolve(fname),
          java.nio.file.attribute.FileTime.fromMillis(mtimeMs))
        // drop the staging dir so the source only ever lists wave files
        graft.Fs.deleteRecursively(stage)
      }
      val t0 = System.currentTimeMillis()
      spoolWave(wave1, "wave1.parquet", t0 - 60000L)
      spoolWave(wave2, "wave2.parquet", t0)
      val q = cs.readStream
        .schema(org.apache.spark.sql.Encoders.product[DocEvent].schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(spool.toString)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark("doc_id")
        .withColumn("words", Text.wordsCol(col("text")))
        .withColumn("quality", qualityCol(col("words")))
        .filter(col("quality") >= 0.5)
        .groupBy(window(col("ts"), "1 day"), col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(size(col("words")).cast("long")).as("n_tokens"),
          min(col("quality")).as("min_q"),
          max(col("quality")).as("max_q"))
        .select(unix_micros(col("window.start")).as("w_us"),
          col("source"), col("n_docs"), col("n_tokens"),
          col("min_q"), col("max_q"))
        .writeStream.format("memory").queryName(name).outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // memory sink rows are already materialized; pin them so the
      // returned frame outlives the spool cleanup below
      cs.table(name).orderBy("w_us", "source").localCheckpoint(true)
    } finally graft.Fs.deleteRecursively(spool)
  }

  private val p6Oracle: String = {
    val ws = Text.wordsSql("text")
    s"""WITH ev AS (
       |  SELECT make_timestamp((1700000000 + doc_id * 600) * 1000000) AS ts,
       |         text, source
       |  FROM documents),
       |scored AS (
       |  SELECT ts, source, n_words,
       |         least(CAST(n_words AS DOUBLE) / 80.0, 1.0) * 0.4
       |           + (CAST(n_uniq AS DOUBLE) / n_words) * 0.3
       |           + (1.0 - CAST(n_stop AS DOUBLE) / n_words) * 0.3 AS quality
       |  FROM (SELECT ts, source,
       |               CAST(len($ws) AS INT) AS n_words,
       |               CAST(len(list_distinct($ws)) AS INT) AS n_uniq,
       |               CAST(len(list_filter($ws, x -> x IN ('the','a'))) AS INT) AS n_stop
       |        FROM ev))
       |SELECT w_us, source, n_docs, n_tokens, min_q, max_q FROM (
       |  SELECT epoch_us(time_bucket(INTERVAL 1 DAY, ts)) AS w_us, source,
       |         count(*) AS n_docs, CAST(sum(n_words) AS BIGINT) AS n_tokens,
       |         min(quality) AS min_q, max(quality) AS max_q
       |  FROM scored WHERE quality >= 0.5
       |  GROUP BY 1, 2)
       |WHERE w_us + 86400000000 <= (SELECT epoch_us(max(ts)) - 3600000000 FROM ev)
       |ORDER BY w_us, source""".stripMargin
  }

  // ---- p7: incremental curation off a change feed (CDC × curation) --------

  /** The weld between the engine's two halves: the curated corpus is
    * a LIVING table maintained from a change feed, and this query is
    * one incremental maintenance cycle run as a single plan — the
    * reference's latest-wins upsert semantics
    * (`internal/syncdb/fullamount_service.go`'s apply loop) driving
    * the curation decisions p1 makes in batch and d8 makes against a
    * standing index.
    *
    * One change batch arrives against the standing corpus:
    *   - revisions (same pk, content edited),
    *   - vandalized updates (same pk, content now junk),
    *   - deletes,
    *   - a re-crawl of standing content under fresh ids (exact dups),
    *   - genuinely new documents under fresh ids.
    * Every change is adjudicated in one pass: deletes leave the
    * curated set; updates/inserts re-run the p1 quality gate
    * ([[qualityCol]] — the same scorer, not a copy) and probe the
    * standing MinHash/LSH index (d8's band-join shape) for near-dups
    * against the SURVIVING corpus — rows whose pk is touched by the
    * batch are excluded from the index first, so an update is never
    * rejected as a duplicate of its own previous version. The output
    * is the curation ledger: per change, its op, quality, verified
    * near-dup count, and the resulting status
    * (deleted / dropped_quality / dropped_dup / admitted).
    *
    * Scale shape: the delta is bounded-small and rides broadcast
    * everywhere (probe bands, shingle fetch, index exclusion); the
    * corpus contributes one scan → minhash aggregation (at 100 TB the
    * standing bands/shingle sets are the STORED index d8 maintains —
    * recomputing here keeps the gate self-contained, exactly like
    * s11's stance on the IVF assignment). Decision logic is a
    * row-local projection over the joined ledger. Nothing is
    * quadratic in the corpus; a day's increment costs O(Δ · band
    * bucket) like d8/d12.
    */
  /** The lazy p7 plan plus the persisted corpus-shingle handle (the
    * caller materializes, then unpersists). Split from the gate so
    * [[PlanAuditSpec]] can read the physical plan that actually runs —
    * the gate's eager checkpoint would otherwise reduce the explain to
    * a checkpoint scan.
    */
  private[ops] def p7CurationPlan(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    def slice(lo: Long, hi: Long) =
      docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
    val delta = slice(10, 15)
      .select(col("doc_id"), lit("u").as("op"),
        concat(col("text"), lit(" revised edition")).as("text"))
      .unionByName(slice(15, 18)
        .select(col("doc_id"), lit("u").as("op"),
          lit("the the the the").as("text")))
      .unionByName(slice(20, 25)
        .select(col("doc_id"), lit("d").as("op"),
          lit(null).cast("string").as("text")))
      .unionByName(slice(0, 3)
        .select((col("doc_id") + 8000000L).as("doc_id"), lit("u").as("op"),
          col("text")))
      .unionByName(slice(30, 33)
        .select((col("doc_id") + 7999980L).as("doc_id"), lit("u").as("op"),
          reverse(col("text")).as("text")))
      .localCheckpoint(true) // ≤19 rows, reused by probe + exclusion + ledger
    // latest-wins: every standing row whose pk the batch touches is
    // stale (updated or deleted) and must not serve as dedup evidence
    val surviving = docs
      .join(broadcast(delta.select(col("doc_id"))), Seq("doc_id"), "left_anti")
    val corpusShs = Dedup.shinglesOf(surviving).persist()
    val corpusBands = Dedup.minhashBands(corpusShs)
    val upserts = delta.filter(col("op") === "u")
    val upShs = Dedup.shinglesOf(upserts).localCheckpoint(true)
    val upBands = Dedup.minhashBands(upShs)
    val dups = corpusBands
      .join(broadcast(upBands.select(col("doc_id").as("new_id"), col("band"))), "band")
      .select(col("new_id"), col("doc_id").as("corpus_id"))
      .dropDuplicates("new_id", "corpus_id")
      .join(broadcast(upShs.select(col("doc_id").as("new_id"), col("shs").as("sn"))), "new_id")
      .join(corpusShs.select(col("doc_id").as("corpus_id"), col("shs").as("sc")), "corpus_id")
      .filter(size(array_intersect(col("sn"), col("sc"))).cast("double")
        / size(array_union(col("sn"), col("sc"))) >= 0.5)
      .groupBy(col("new_id").as("doc_id"))
      .agg(count(lit(1)).as("n_dups"))
    val out = delta
      .withColumn("quality",
        when(col("op") === "d", lit(-1.0))
          .otherwise(qualityCol(Text.wordsCol(col("text")))))
      .join(broadcast(dups), Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_dups"))
      .withColumn("status",
        when(col("op") === "d", "deleted")
          .when(col("quality") < 0.5, "dropped_quality")
          .when(col("n_dups") > 0, "dropped_dup")
          .otherwise("admitted"))
      .select("doc_id", "op", "quality", "n_dups", "status")
      .orderBy("doc_id")
    (out, corpusShs)
  }

  private def p7CdcCuration(s: SparkSession, d: String): DataFrame = {
    val (plan, corpusShs) = p7CurationPlan(s, d)
    // unpersist in finally: if the checkpoint action throws, the
    // cached corpus blocks must not outlive the query in this
    // long-lived bench JVM (Bench.clearCache is the backstop, not
    // the owner)
    try plan.localCheckpoint(true)
    finally corpusShs.unpersist(blocking = false)
  }

  private val p7Oracle: String = {
    val ws = Text.wordsSql("text")
    s"""WITH delta AS (
       |  SELECT doc_id, 'u' AS op, text || ' revised edition' AS text
       |  FROM documents WHERE doc_id >= 10 AND doc_id < 15
       |  UNION ALL
       |  SELECT doc_id, 'u', 'the the the the'
       |  FROM documents WHERE doc_id >= 15 AND doc_id < 18
       |  UNION ALL
       |  SELECT doc_id, 'd', NULL
       |  FROM documents WHERE doc_id >= 20 AND doc_id < 25
       |  UNION ALL
       |  SELECT doc_id + 8000000, 'u', text FROM documents WHERE doc_id < 3
       |  UNION ALL
       |  SELECT doc_id + 7999980, 'u', reverse(text)
       |  FROM documents WHERE doc_id >= 30 AND doc_id < 33),
       |surviving AS (
       |  SELECT doc_id, text FROM documents
       |  WHERE doc_id NOT IN (SELECT doc_id FROM delta)),
       |ups AS (SELECT doc_id, text FROM delta WHERE op = 'u'),
       |${Dedup.lshCtesSql("surviving", "")},
       |${Dedup.lshCtesSql("ups", "n")},
       |dup AS (
       |  SELECT new_id AS doc_id, count(*) AS n_dups FROM (
       |    SELECT DISTINCT n.doc_id AS new_id, c.doc_id AS corpus_id,
       |           n.shs AS sn, c.shs AS sc
       |    FROM nbands n JOIN bands c ON n.band = c.band)
       |  WHERE CAST(len(list_intersect(sn, sc)) AS DOUBLE)
       |          / len(list_distinct(list_concat(sn, sc))) >= 0.5
       |  GROUP BY new_id),
       |scored AS (
       |  SELECT doc_id,
       |         least(CAST(n_words AS DOUBLE) / 80.0, 1.0) * 0.4
       |           + (CAST(n_uniq AS DOUBLE) / n_words) * 0.3
       |           + (1.0 - CAST(n_stop AS DOUBLE) / n_words) * 0.3 AS quality
       |  FROM (SELECT doc_id,
       |               CAST(len($ws) AS INT) AS n_words,
       |               CAST(len(list_distinct($ws)) AS INT) AS n_uniq,
       |               CAST(len(list_filter($ws, x -> x IN ('the','a'))) AS INT) AS n_stop
       |        FROM ups))
       |SELECT d.doc_id, d.op,
       |       CASE WHEN d.op = 'd' THEN -1.0 ELSE s.quality END AS quality,
       |       CAST(COALESCE(p.n_dups, 0) AS BIGINT) AS n_dups,
       |       CASE WHEN d.op = 'd' THEN 'deleted'
       |            WHEN s.quality < 0.5 THEN 'dropped_quality'
       |            WHEN COALESCE(p.n_dups, 0) > 0 THEN 'dropped_dup'
       |            ELSE 'admitted' END AS status
       |FROM delta d
       |LEFT JOIN scored s ON s.doc_id = d.doc_id
       |LEFT JOIN dup p ON p.doc_id = d.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }

  // ---- p8: incremental boilerplate-vocabulary maintenance off a change feed

  /** t35's corpus-wide segment-df table, maintained INCREMENTALLY
    * from a change batch instead of recomputed — the same weld p7
    * makes for the dedup index, applied to the boilerplate
    * vocabulary (and, by the same math, to any df-keyed statistic:
    * t25's idf, d6's contamination grams). df is a per-segment count
    * of DISTINCT documents, so a change batch moves it by exactly
    * (after-image segment set) − (before-image segment set) per
    * touched document: retract −1 for each distinct segment of a
    * replaced/deleted before-image, add +1 for each distinct segment
    * of an admitted after-image. Untouched keys cannot move (only Δ
    * documents changed), so the gate proves the interesting half:
    * for every TOUCHED key, the incrementally-maintained count equals
    * a from-scratch recompute over the post-change corpus —
    * `df_incr == df_full` rides every output row and the oracle
    * computes both sides independently.
    *
    * The batch exercises every df transition the C4 policy cares
    * about: deleting all standing banner carriers (the planted
    * vocabulary entry drains — `left_vocab` at sf where its df ≥ 3),
    * re-crawled docs arriving under fresh ids with a NEW 8-word
    * banner prefix (df 0 → 4: `entered_vocab` at every sf), and
    * 3-word-prefix revisions that shift every span boundary (full
    * retract + full re-add of a document's segment set).
    *
    * Scale shape — the incremental story, structurally: the corpus
    * is SCANNED (segments → digests, a projection) but never
    * shuffled corpus-wide. Both df aggregations are semi-join-
    * filtered to the batch's touched keys BEFORE their exchange, so
    * every hash exchange in the plan carries O(Δ · segments) digest
    * rows; the touched-key set, net deltas, and both filtered df
    * tables ride broadcast. At 100 TB the standing df table is
    * STORED (the d8 stance: recomputing df0 here keeps the gate
    * self-contained) and a day's increment costs one corpus scan at
    * most — or zero, when the stored table is trusted and only the
    * net-delta half runs.
    */
  private def p8DfMaint(s: SparkSession, d: String): DataFrame = {
    val banner = "subscribe to our newsletter click here now please"
    val banner2 = "limited time offer act now before midnight tonight"
    val src = Tables.documents(s, d)
      .select(col("doc_id"),
        when(col("doc_id") % 25 === 0, concat(lit(banner + " "), col("text")))
          .otherwise(col("text")).as("text"))
    def slice(lo: Long, hi: Long) =
      src.filter(col("doc_id") >= lo && col("doc_id") < hi)
    val delta = src.filter(col("doc_id") % 25 === 0)
      .select(col("doc_id"), lit("d").as("op"), lit(null).cast("string").as("text"))
      .unionByName(slice(10, 13)
        .select(col("doc_id"), lit("u").as("op"),
          concat(lit("breaking update revised "), col("text")).as("text")))
      .unionByName(slice(40, 44)
        .select((col("doc_id") + 6000000L).as("doc_id"), lit("u").as("op"),
          concat(lit(banner2 + " "), col("text")).as("text")))
      .localCheckpoint(true) // bounded batch, reused by every leg below
    // per-segment digests with per-doc multiplicity — deduped to df's
    // distinct-membership unit LATE (distinct on the bounded Δ legs,
    // countDistinct after the touched-key filter on the corpus legs),
    // so no corpus-wide exchange ever plans
    def segKeys(docs: DataFrame): DataFrame =
      Dedup.spanSegments(docs.withColumn("ws", Text.wordsCol(col("text"))), 8)
        .select(md5(col("seg")).as("k"), col("doc_id"))
    val touchedPks = delta.select("doc_id")
    val befores = src.join(broadcast(touchedPks), Seq("doc_id"), "left_semi")
    val afters = delta.filter(col("op") === "u").select("doc_id", "text")
    // the maintenance math: net df movement per touched key
    val net = segKeys(befores).distinct().select(col("k"), lit(-1L).as("w"))
      .unionByName(segKeys(afters).distinct().select(col("k"), lit(1L).as("w")))
      .groupBy("k").agg(sum("w").as("net"))
      .localCheckpoint(true) // O(Δ·segments) rows, reused thrice
    val touchedKeys = net.select("k")
    // standing df, touched keys only: semi-filter BEFORE the agg so
    // the exchange never carries corpus-df work (production reads
    // the stored table instead — this is the self-contained stand-in)
    val df0 = segKeys(src)
      .join(broadcast(touchedKeys), Seq("k"), "left_semi")
      .groupBy("k").agg(countDistinct(col("doc_id")).as("df_old"))
    // from-scratch recompute over the post-change corpus, same filter
    val post = src.join(broadcast(touchedPks), Seq("doc_id"), "left_anti")
      .unionByName(afters)
    val df1 = segKeys(post)
      .join(broadcast(touchedKeys), Seq("k"), "left_semi")
      .groupBy("k").agg(countDistinct(col("doc_id")).as("df_full"))
    net
      .join(broadcast(df0), Seq("k"), "left").na.fill(0L, Seq("df_old"))
      .join(broadcast(df1), Seq("k"), "left").na.fill(0L, Seq("df_full"))
      .withColumn("df_incr", col("df_old") + col("net"))
      .withColumn("ok", col("df_incr") === col("df_full"))
      .withColumn("status",
        when(col("df_old") < 3 && col("df_incr") >= 3, "entered_vocab")
          .when(col("df_old") >= 3 && col("df_incr") < 3, "left_vocab")
          .when(col("df_incr") >= 3, "still_boiler")
          .otherwise("not_boiler"))
      .select("k", "df_old", "net", "df_incr", "df_full", "ok", "status")
      .orderBy("k")
  }

  private val p8Oracle: String = {
    val banner = "subscribe to our newsletter click here now please"
    val banner2 = "limited time offer act now before midnight tonight"
    val ws = Text.wordsSql("text")
    def segSql(rel: String) =
      s"""SELECT DISTINCT doc_id, md5(seg) AS k FROM (
         |    SELECT doc_id,
         |           unnest(list_transform(
         |             generate_series(1, CAST(ceil(len(ws) / 8.0) AS BIGINT)),
         |             i -> array_to_string(ws[(i-1)*8+1 : i*8], ' '))) AS seg
         |    FROM (SELECT doc_id, $ws AS ws FROM $rel) WHERE len(ws) >= 1)""".stripMargin
    s"""WITH src AS (
       |  SELECT doc_id,
       |         CASE WHEN doc_id % 25 = 0 THEN '$banner ' || text ELSE text END AS text
       |  FROM documents),
       |delta AS (
       |  SELECT doc_id, 'd' AS op, NULL AS text FROM src WHERE doc_id % 25 = 0
       |  UNION ALL
       |  SELECT doc_id, 'u', 'breaking update revised ' || text
       |  FROM src WHERE doc_id >= 10 AND doc_id < 13
       |  UNION ALL
       |  SELECT doc_id + 6000000, 'u', '$banner2 ' || text
       |  FROM src WHERE doc_id >= 40 AND doc_id < 44),
       |bef AS (
       |  SELECT s.doc_id, s.text FROM src s
       |  WHERE s.doc_id IN (SELECT doc_id FROM delta)),
       |aft AS (SELECT doc_id, text FROM delta WHERE op = 'u'),
       |net AS (
       |  SELECT k, CAST(sum(w) AS BIGINT) AS net FROM (
       |    SELECT k, -1 AS w FROM (${segSql("bef")})
       |    UNION ALL
       |    SELECT k, 1 AS w FROM (${segSql("aft")}))
       |  GROUP BY k),
       |df0 AS (
       |  SELECT k, count(*) AS df_old FROM (${segSql("src")})
       |  WHERE k IN (SELECT k FROM net) GROUP BY k),
       |post AS (
       |  SELECT doc_id, text FROM src
       |  WHERE doc_id NOT IN (SELECT doc_id FROM delta)
       |  UNION ALL
       |  SELECT doc_id, text FROM aft),
       |df1 AS (
       |  SELECT k, count(*) AS df_full FROM (${segSql("post")})
       |  WHERE k IN (SELECT k FROM net) GROUP BY k)
       |SELECT n.k, CAST(COALESCE(d0.df_old, 0) AS BIGINT) AS df_old, n.net,
       |       CAST(COALESCE(d0.df_old, 0) + n.net AS BIGINT) AS df_incr,
       |       CAST(COALESCE(d1.df_full, 0) AS BIGINT) AS df_full,
       |       COALESCE(d0.df_old, 0) + n.net = COALESCE(d1.df_full, 0) AS ok,
       |       CASE WHEN COALESCE(d0.df_old, 0) < 3
       |                 AND COALESCE(d0.df_old, 0) + n.net >= 3 THEN 'entered_vocab'
       |            WHEN COALESCE(d0.df_old, 0) >= 3
       |                 AND COALESCE(d0.df_old, 0) + n.net < 3 THEN 'left_vocab'
       |            WHEN COALESCE(d0.df_old, 0) + n.net >= 3 THEN 'still_boiler'
       |            ELSE 'not_boiler' END AS status
       |FROM net n
       |LEFT JOIN df0 d0 ON d0.k = n.k
       |LEFT JOIN df1 d1 ON d1.k = n.k
       |ORDER BY n.k""".stripMargin
  }

  // ---- p9: incremental IVF-index maintenance off a change feed ------------

  /** The vector-index member of the maintenance-weld family (p7 =
    * dedup index, p8 = boilerplate vocabulary, this = the ANN index):
    * the stored IVF cell assignment that s11/s15 read is kept current
    * from a change feed WITHOUT rescanning the corpus. The codebook
    * stays FIXED during maintenance (s10's standing-codebook stance —
    * retraining is a separate decision driven by s13's drift signal);
    * a change batch moves each cell's population by exactly
    * (assignments of admitted after-images) − (stale rows of touched
    * ids): updates re-assign (an edited embedding may cross a cell
    * boundary), deletes only retract, re-ingests under fresh ids only
    * add. The gate runs the incremental bookkeeping AND a
    * from-scratch re-assignment of the post-change corpus in ONE
    * plan; `n_after_incr == n_after_full` rides every cell row, both
    * sides computed independently by the oracle.
    *
    * Scale shape: the delta is bounded and rides broadcast into every
    * leg (stale-row semi-join, post-corpus anti-join); every corpus
    * read is a scan projection against the broadcast codebook literal
    * (the s4 shape — no shuffle to assign); the only exchanges are
    * the ≤k-row cid rollups, and the final reconciliation joins onto
    * the k-row cell universe are all broadcast. At 100 TB the
    * standing assignment is the STORED index (recomputing `before`
    * here keeps the gate self-contained, s11's stance) and a day's
    * increment costs O(Δ) assignment work — or the full-recompute
    * validation leg on a schedule, which is this same plan minus the
    * trust.
    */
  private def p9IndexMaint(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val base = Similarity.quantized(s, d)
    val cents = Similarity.collectCents(Similarity.trainCodebook(base, iters = 2))
    val emb = Tables.embeddings(s, d)
    def q(sign: String) = expr(
      s"transform(embedding, x -> CAST(floor($sign CAST(x AS DOUBLE) * 1000) AS DOUBLE))")
    val delta = emb.filter(col("vec_id") >= 10 && col("vec_id") < 20)
      .select(col("vec_id"), lit("u").as("op"), q("-").as("q"))
      .unionByName(emb.filter(col("vec_id") >= 20 && col("vec_id") < 30)
        .select(col("vec_id"), lit("d").as("op"),
          lit(null).cast("array<double>").as("q")))
      .unionByName(emb.filter(col("vec_id") >= 30 && col("vec_id") < 40)
        .select((col("vec_id") + 5000000L).as("vec_id"), lit("i").as("op"),
          q("").as("q")))
      .localCheckpoint(true) // bounded batch, reused by every leg below
    val touched = delta.select("vec_id")
    val assigned = Similarity.assignCellsFrom(base, cents)
    val before = assigned.groupBy("cid").agg(count(lit(1)).as("n_before"))
    val removed = assigned
      .join(broadcast(touched), Seq("vec_id"), "left_semi")
      .groupBy("cid").agg(count(lit(1)).as("n_removed"))
    val adds = delta.filter(col("op") =!= "d").select("vec_id", "q")
    val added = Similarity.assignCellsFrom(adds, cents)
      .groupBy("cid").agg(count(lit(1)).as("n_added"))
    val post = base.join(broadcast(touched), Seq("vec_id"), "left_anti")
      .unionByName(adds)
    val full = Similarity.assignCellsFrom(post, cents)
      .groupBy("cid").agg(count(lit(1)).as("n_after_full"))
    // reconcile over the full cell universe (a cell may be present
    // only in `added`, or drain to zero) — k literal rows
    cents.map(_._1).toSeq.toDF("cid")
      .join(broadcast(before), Seq("cid"), "left").na.fill(0L, Seq("n_before"))
      .join(broadcast(removed), Seq("cid"), "left").na.fill(0L, Seq("n_removed"))
      .join(broadcast(added), Seq("cid"), "left").na.fill(0L, Seq("n_added"))
      .join(broadcast(full), Seq("cid"), "left").na.fill(0L, Seq("n_after_full"))
      .withColumn("n_after_incr", col("n_before") - col("n_removed") + col("n_added"))
      .withColumn("ok", col("n_after_incr") === col("n_after_full"))
      .select("cid", "n_before", "n_removed", "n_added",
        "n_after_incr", "n_after_full", "ok")
      .orderBy("cid")
  }

  private val p9Oracle: String = {
    def assignSql(rel: String) =
      s"""SELECT vec_id, cid FROM (
         |  SELECT x.vec_id, c.cid,
         |         row_number() OVER (PARTITION BY x.vec_id ORDER BY
         |           CAST(list_sum(list_transform(generate_series(1, 64),
         |                i -> x.q[i] * c.sv[i])) AS DOUBLE) / c.n DESC,
         |           c.cid) AS rnk
         |  FROM $rel x, c2 c) WHERE rnk = 1""".stripMargin
    s"""WITH base AS (
       |  SELECT vec_id,
       |         list_transform(embedding::DOUBLE[], x -> CAST(floor(x * 1000) AS BIGINT)) AS q
       |  FROM embeddings),
       |${Similarity.ivfOracleChain},
       |delta AS (
       |  SELECT vec_id, 'u' AS op,
       |         list_transform(embedding::DOUBLE[], x -> CAST(floor(-x * 1000) AS BIGINT)) AS q
       |  FROM embeddings WHERE vec_id >= 10 AND vec_id < 20
       |  UNION ALL
       |  SELECT vec_id, 'd', NULL FROM embeddings WHERE vec_id >= 20 AND vec_id < 30
       |  UNION ALL
       |  SELECT vec_id + 5000000, 'i',
       |         list_transform(embedding::DOUBLE[], x -> CAST(floor(x * 1000) AS BIGINT))
       |  FROM embeddings WHERE vec_id >= 30 AND vec_id < 40),
       |adds AS (SELECT vec_id, q FROM delta WHERE op <> 'd'),
       |post AS (
       |  SELECT vec_id, q FROM base
       |  WHERE vec_id NOT IN (SELECT vec_id FROM delta)
       |  UNION ALL
       |  SELECT vec_id, q FROM adds),
       |aAdds AS (${assignSql("adds")}),
       |aPost AS (${assignSql("post")}),
       |bef AS (SELECT cid, count(*) AS n_before FROM a3 GROUP BY cid),
       |rem AS (
       |  SELECT cid, count(*) AS n_removed FROM a3
       |  WHERE vec_id IN (SELECT vec_id FROM delta) GROUP BY cid),
       |addc AS (SELECT cid, count(*) AS n_added FROM aAdds GROUP BY cid),
       |fullc AS (SELECT cid, count(*) AS n_after_full FROM aPost GROUP BY cid)
       |SELECT u.cid,
       |       CAST(COALESCE(b.n_before, 0) AS BIGINT) AS n_before,
       |       CAST(COALESCE(r.n_removed, 0) AS BIGINT) AS n_removed,
       |       CAST(COALESCE(a.n_added, 0) AS BIGINT) AS n_added,
       |       CAST(COALESCE(b.n_before, 0) - COALESCE(r.n_removed, 0)
       |            + COALESCE(a.n_added, 0) AS BIGINT) AS n_after_incr,
       |       CAST(COALESCE(f.n_after_full, 0) AS BIGINT) AS n_after_full,
       |       COALESCE(b.n_before, 0) - COALESCE(r.n_removed, 0) + COALESCE(a.n_added, 0)
       |         = COALESCE(f.n_after_full, 0) AS ok
       |FROM (SELECT DISTINCT cid FROM c2) u
       |LEFT JOIN bef b ON b.cid = u.cid
       |LEFT JOIN rem r ON r.cid = u.cid
       |LEFT JOIN addc a ON a.cid = u.cid
       |LEFT JOIN fullc f ON f.cid = u.cid
       |ORDER BY u.cid""".stripMargin
  }

  // ---- p10: multimodal training-shard manifest -----------------------------

  /** The shard manifest a MULTIMODAL training run reads — the closing
    * weld of four proven pieces, priced in the currency the trainer
    * actually budgets: context-window tokens where an image bills its
    * 576 ViT patch tokens (mm11's pricing), not bytes or rows.
    * Per document: multimodal token cost, the t26 content-hash split
    * (train/val/test — re-ingested copies land in the same split),
    * and the p3 md5 shard coin; per (split, shard): documents pack
    * into 4096-token bins along the deterministic (h, doc_id) reading
    * order, so the manifest pins a reproducible permutation AND its
    * packing in one result — what a resumable loader needs to seek
    * anywhere in epoch k without replaying.
    *
    * Scale shape: one scan with row-local pricing/split/coin
    * projections, one (split, shard)-keyed window for the running
    * token sum (shard count scales with the cluster; no global
    * window), one keyed rollup. Text never shuffles — only
    * (doc_id, tokens, keys) rows move.
    */
  private def p10MmShards(s: SparkSession, d: String): DataFrame = {
    val priced = Tables
      .documents(s, d)
      .select(col("doc_id"),
        size(Text.wordsCol(col("text"))).as("text_tokens"),
        when(col("doc_id") % 3 === 0, 576).otherwise(0).as("img_tokens"),
        expr(Text.polyHashSql("md5(CAST(doc_id AS STRING))", 8)).as("h"),
        expr(s"${Text.polyHashSql("text", 8)} % 100").as("coin"))
      .withColumn("split", expr(
        "CASE WHEN coin < 80 THEN 'train' WHEN coin < 90 THEN 'val' ELSE 'test' END"))
      .withColumn("tokens", col("text_tokens") + col("img_tokens"))
      .withColumn("shard", col("h") % 8)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("split"), col("shard")).orderBy(col("h"), col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    priced
      .withColumn("cum", sum(col("tokens")).over(w))
      // greatest(..., 0): a zero-token leading document gives cum = 0,
      // where Spark's DIV truncates toward zero but DuckDB's // floors
      // to -1 — clamping on BOTH sides keeps the engines in agreement
      .withColumn("bin", expr("greatest(cum - 1, 0) DIV 4096"))
      .groupBy("split", "shard", "bin")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("img_tokens") > 0, 1L).otherwise(0L)).as("n_imgs"),
        sum(col("text_tokens")).as("text_tokens"),
        sum(col("img_tokens")).as("img_tokens"),
        sum(col("tokens")).as("bin_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy("split", "shard", "bin")
  }

  private val p10Oracle: String = {
    val ws = Text.wordsSql("text")
    val h = Text.polyHashSql("md5(CAST(doc_id AS VARCHAR))", 8)
    val coin = s"${Text.polyHashSql("text", 8)} % 100"
    s"""WITH priced AS (
       |  SELECT doc_id,
       |         CAST(len($ws) AS INT) AS text_tokens,
       |         CAST(CASE WHEN doc_id % 3 = 0 THEN 576 ELSE 0 END AS INT) AS img_tokens,
       |         $h AS h,
       |         CASE WHEN $coin < 80 THEN 'train'
       |              WHEN $coin < 90 THEN 'val' ELSE 'test' END AS split
       |  FROM documents),
       |binned AS (
       |  SELECT doc_id, split, h % 8 AS shard, text_tokens, img_tokens,
       |         text_tokens + img_tokens AS tokens,
       |         greatest(CAST(sum(text_tokens + img_tokens) OVER (
       |            PARTITION BY split, h % 8 ORDER BY h, doc_id
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - 1, 0)
       |           // 4096 AS bin
       |  FROM priced)
       |SELECT split, shard, bin, count(*) AS n_docs,
       |       CAST(sum(CASE WHEN img_tokens > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_imgs,
       |       CAST(sum(text_tokens) AS BIGINT) AS text_tokens,
       |       CAST(sum(img_tokens) AS BIGINT) AS img_tokens,
       |       CAST(sum(tokens) AS BIGINT) AS bin_tokens,
       |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
       |FROM binned GROUP BY split, shard, bin ORDER BY split, shard, bin""".stripMargin
  }

  // ---- p11: mixture scheduling (per-source token budget water-filling) ----

  /** Training-mixture allocation: given each source's AVAILABLE token
    * mass and a target weight, split a global token budget across
    * sources by WATER-FILLING — the domain-mixing step (DoReMi /
    * Pile-style recipes) every large pretraining pipeline runs
    * between curation and sharding. A source whose fair share
    * (weight-proportional slice of the remaining budget) exceeds what
    * it HAS caps at its availability and releases the surplus to the
    * rest; the fixpoint is computed in closed form: sorted ascending
    * by avail/weight, the capped set is a PREFIX, so prefix sums name
    * the exact cap boundary — no iteration, no driver loop.
    *
    * Scale shape: the only data-sized work is one source-keyed
    * aggregation with map-side partial sums (tokens count in the
    * scan projection); everything after runs on the #sources-row
    * rollup — the SinglePartition windows are bounded by the source
    * vocabulary, not the corpus (the t34 decomposition argument).
    * All allocation arithmetic is INTEGER (BIGINT products and
    * truncating division of positives), so DuckDB replays it
    * bit-exactly.
    */
  /** The p11 allocation frame BEFORE its reporting projection —
    * (source, n_docs, avail, weight, capped, alloc_tokens, …scratch) —
    * shared with p13, which realizes the plan as an actual sample.
    */
  private[ops] def p11Alloc(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perSrc = Tables.documents(s, d)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(Text.wordsCol(col("text"))).cast("long")).as("avail"))
      .withColumn("weight", expr("CAST(substring(source, 4) AS BIGINT) % 4 + 1"))
    val tot = perSrc.agg(sum("avail"), sum("weight")).head()
    val (totalAvail, wTot) = (tot.getLong(0), tot.getLong(1))
    val budget = totalAvail * 6 / 10
    val ord = Window.orderBy(col("avail").cast("double") / col("weight"), col("source"))
    val pre = ord.rowsBetween(Window.unboundedPreceding, -1)
    val upTo = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy(lit(1))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    perSrc
      .withColumn("cum_avail", coalesce(sum("avail").over(pre), lit(0L)))
      .withColumn("cum_w", coalesce(sum("weight").over(pre), lit(0L)))
      // would this source's fair share of what's left exceed its
      // availability? (cross-multiplied to stay in integers)
      .withColumn("flag",
        (col("avail") * (lit(wTot) - col("cum_w")) <
          col("weight") * (lit(budget) - col("cum_avail"))).cast("int"))
      // ascending avail/weight makes capped a prefix: the flag holds
      // exactly while every earlier source also capped
      .withColumn("capped", min("flag").over(upTo))
      .withColumn("capped_avail",
        sum(when(col("capped") === 1, col("avail")).otherwise(0L)).over(whole))
      .withColumn("capped_w",
        sum(when(col("capped") === 1, col("weight")).otherwise(0L)).over(whole))
      .withColumn("alloc_tokens",
        when(col("capped") === 1, col("avail"))
          .otherwise(expr(
            s"weight * ($budget - capped_avail) DIV greatest($wTot - capped_w, 1)")))
  }

  private def p11Mixture(s: SparkSession, d: String): DataFrame =
    p11Alloc(s, d)
      .select(col("source"), col("n_docs"), col("avail").as("avail_tokens"),
        col("weight"), col("capped"), col("alloc_tokens"))
      .orderBy("source")

  /** Shared oracle CTE chain for p11/p13: ends in `g` — per-source
    * (source, n_docs, avail, weight, capped, budget, wtot,
    * capped_avail, capped_w), everything the closed-form allocation
    * reads.
    */
  private val p11ChainSql: String = {
    val ws = Text.wordsSql("text")
    s"""per AS (
       |  SELECT source, count(*) AS n_docs,
       |         CAST(sum(len($ws)) AS BIGINT) AS avail,
       |         CAST(substr(source, 4) AS BIGINT) % 4 + 1 AS weight
       |  FROM documents GROUP BY source),
       |t AS (SELECT CAST(sum(avail) AS BIGINT) AS total_avail,
       |             CAST(sum(weight) AS BIGINT) AS wtot FROM per),
       |r AS (
       |  SELECT p.*, t.total_avail * 6 // 10 AS budget, t.wtot,
       |         COALESCE(CAST(sum(avail) OVER w AS BIGINT), 0) AS cum_avail,
       |         COALESCE(CAST(sum(weight) OVER w AS BIGINT), 0) AS cum_w
       |  FROM per p, t
       |  WINDOW w AS (ORDER BY avail * 1.0 / weight, source
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
       |f AS (
       |  SELECT *, CASE WHEN avail * (wtot - cum_w) < weight * (budget - cum_avail)
       |                 THEN 1 ELSE 0 END AS flag FROM r),
       |c AS (
       |  SELECT *, min(flag) OVER (ORDER BY avail * 1.0 / weight, source
       |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS capped
       |  FROM f),
       |g AS (
       |  SELECT *,
       |    CAST(sum(CASE WHEN capped = 1 THEN avail ELSE 0 END) OVER () AS BIGINT) AS capped_avail,
       |    CAST(sum(CASE WHEN capped = 1 THEN weight ELSE 0 END) OVER () AS BIGINT) AS capped_w
       |  FROM c)""".stripMargin
  }

  private val p11Oracle: String =
    s"""WITH $p11ChainSql
       |SELECT source, n_docs, avail AS avail_tokens, weight,
       |       CAST(capped AS INT) AS capped,
       |       CASE WHEN capped = 1 THEN avail
       |            ELSE weight * (budget - capped_avail) // greatest(wtot - capped_w, 1)
       |       END AS alloc_tokens
       |FROM g ORDER BY source""".stripMargin

  // ---- p13: deterministic mixture realization (sampling to the plan) ------

  /** Coin in [0, 1e6): a two-round LCG over (doc_id, epoch), written
    * once and evaluated verbatim by BOTH engines. `doc_id % 2^20`
    * first so every intermediate stays far inside BIGINT (DuckDB
    * errors on overflow where Spark wraps — the d2 lesson); at
    * trillion-doc scale the production coin is a 64-bit splitmix
    * native expression, same contract.
    */
  private val p13CoinSql: String =
    "((((doc_id % 1048576) * 1103515245 + 12345 + epoch * 7919) % 2147483648)" +
      " * 69069 + 1) % 2147483648 % 1000000"

  /** p13: REALIZE p11's token plan as an actual sample. Each document
    * flips a deterministic hash coin against its source's planned
    * token rate (alloc/avail in ppm), so the sampled token mass
    * tracks the allocation in expectation with ZERO coordination —
    * no global sort, no per-source quota counters, no driver state.
    * The coin is a pure function of (doc_id, epoch): re-running an
    * epoch reproduces the sample byte-for-byte (epoch-stable data
    * loading — the property that makes training restarts and shard
    * re-materialization safe), while a new epoch draws a fresh
    * sample under the same rates. Capped sources (rate = 1e6 ppm)
    * keep every document, exactly as water-filling intends.
    *
    * Scale shape: the rate table is #sources rows (broadcast); the
    * only data-sized work is one scan projection + that broadcast
    * join + one (epoch, source)-keyed rollup with map-side partial
    * sums. Sampling whole documents at a token rate leaves realized
    * ppm within one document of planned per source — the rollup
    * reports both so the gap itself is oracle-pinned.
    */
  private def p13MixtureSample(s: SparkSession, d: String): DataFrame = {
    val rates = p11Alloc(s, d)
      .select(col("source"), col("avail"), col("alloc_tokens"))
      .withColumn("rate_ppm", expr("alloc_tokens * 1000000 DIV greatest(avail, 1)"))
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        size(Text.wordsCol(col("text"))).cast("long").as("tok"))
      .join(broadcast(rates), "source")
      .withColumn("epoch", explode(array(lit(0L), lit(1L))))
      .withColumn("take", (expr(p13CoinSql) < col("rate_ppm")).cast("int"))
      .groupBy(col("epoch"), col("source"))
      .agg(
        max(col("alloc_tokens")).as("alloc_tokens"),
        max(col("avail")).as("avail_tokens"),
        sum(col("take")).cast("long").as("sampled_docs"),
        sum(col("take") * col("tok")).as("sampled_tokens"))
      .withColumn("realized_ppm",
        expr("sampled_tokens * 1000000 DIV greatest(avail_tokens, 1)"))
      .orderBy("epoch", "source")
  }

  private val p13Oracle: String = {
    val ws = Text.wordsSql("text")
    s"""WITH $p11ChainSql,
       |alloc AS (
       |  SELECT source, avail,
       |         CASE WHEN capped = 1 THEN avail
       |              ELSE weight * (budget - capped_avail) // greatest(wtot - capped_w, 1)
       |         END AS alloc_tokens
       |  FROM g),
       |rates AS (
       |  SELECT source, avail, alloc_tokens,
       |         alloc_tokens * 1000000 // greatest(avail, 1) AS rate_ppm
       |  FROM alloc),
       |docs AS (SELECT doc_id, source, CAST(len($ws) AS BIGINT) AS tok FROM documents),
       |e AS (SELECT CAST(unnest([0, 1]) AS BIGINT) AS epoch),
       |flips AS (
       |  SELECT e.epoch, d.source, r.alloc_tokens, r.avail, d.tok,
       |         CASE WHEN $p13CoinSql < r.rate_ppm THEN 1 ELSE 0 END AS take
       |  FROM docs d JOIN rates r USING (source), e)
       |SELECT epoch, source,
       |       CAST(max(alloc_tokens) AS BIGINT) AS alloc_tokens,
       |       CAST(max(avail) AS BIGINT) AS avail_tokens,
       |       CAST(sum(take) AS BIGINT) AS sampled_docs,
       |       CAST(sum(take * tok) AS BIGINT) AS sampled_tokens,
       |       CAST(sum(take * tok) AS BIGINT) * 1000000
       |         // greatest(CAST(max(avail) AS BIGINT), 1) AS realized_ppm
       |FROM flips GROUP BY epoch, source ORDER BY epoch, source""".stripMargin
  }

  // ---- p12: the end-to-end protocol capstone ------------------------------

  /** The engine's two halves as ONE composed flow under one oracle:
    * snapshot → binlog transport → watermark gate → curation
    * adjudication → vector-index maintenance. Every stage is a proven
    * component (`cdc_binlog_replay`'s codec, `cdc_gated_state`'s
    * snapshot∪gated protocol, p7's curation ledger, p9's
    * fixed-codebook cell assignment); the capstone pins the WELDS: the
    * change batch travels as real binlog v4 bytes (a mangled value
    * breaks the quality/dup columns), the at-least-once redelivery
    * below the watermark carries deliberately corrupted values whose
    * leak would flip the dup evidence (docs 0-2 reversed — their
    * re-crawled copies would stop matching and 'dropped_dup' would
    * read 'admitted'), and only curation-ADMITTED changes touch the
    * vector index (the weld a real pipeline gets wrong first:
    * vandalized or duplicate content must never reach the ANN index,
    * deletes always must).
    *
    * Output: the per-change protocol ledger — curation columns (p7's
    * quality/n_dups/status) plus the index consequence
    * (`index_action` ∈ added/reassigned/removed/none and the assigned
    * `cell`, NULL when the index is untouched). Updates re-embed
    * (negated embedding, p9's convention for "the content changed"),
    * inserts embed fresh, deletes retract their STANDING cell.
    *
    * Scale shape: the change batch is bounded and rides broadcast
    * through every leg (gate filter is row-local arithmetic, probe
    * bands, shingle fetch, embedding joins, cell assignment against
    * the codebook literal); the corpus contributes one documents scan
    * (shingle evidence) and one embeddings scan (codebook training —
    * at 100 TB both are the STORED index/codebook, recomputed here to
    * stay self-contained, s11's stance). Nothing joins corpus×corpus;
    * the transport runs inside mapPartitions.
    */
  /** Full-text rolling checksum, the mm2 recurrence
    * (`h = (31·h + byte) mod P`) as a codegen'd HOF chain — what the
    * wire carries in place of the text itself (see [[p12E2eProtocol]]).
    */
  private def ckSql(e: String): String =
    s"""CASE WHEN length($e) = 0 THEN CAST(0 AS BIGINT)
       |ELSE aggregate(transform(sequence(1, length($e)),
       |       i -> CAST(ascii(substr($e, i, 1)) AS BIGINT)),
       |     CAST(0 AS BIGINT), (a, b) -> (a * 31 + b) % 2147483647) END""".stripMargin

  private def p12E2eProtocol(s: SparkSession, d: String): DataFrame = {
    import graft.cdc.{CdcQueries, WatermarkGate}
    import graft.model.GtidSet
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    def slice(lo: Long, hi: Long) =
      docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
    // p7's five change classes, as (pk, op, new text). The WIRE format
    // carries a numeric value (the reference's row image — FeedRow),
    // so the feed ships the full-text checksum and the ledger fetches
    // content by (pk, checksum) from the batch's blob side — the
    // standard CDC-pointer shape for payloads too big for the log. A
    // transport that mangles the value misses the blob join and the
    // ledger visibly loses that row.
    val changes = slice(10, 15)
      .select(col("doc_id").as("pk"), lit("update").as("op"),
        concat(col("text"), lit(" revised edition")).as("text"))
      .unionByName(slice(15, 18)
        .select(col("doc_id").as("pk"), lit("update").as("op"),
          lit("the the the the").as("text")))
      .unionByName(slice(0, 3)
        .select((col("doc_id") + 8000000L).as("pk"), lit("insert").as("op"),
          col("text").as("text")))
      .unionByName(slice(30, 33)
        .select((col("doc_id") + 7999980L).as("pk"), lit("insert").as("op"),
          reverse(col("text")).as("text")))
    val deletes = slice(20, 25)
      .select(col("doc_id").as("pk"), lit("delete").as("op"),
        lit(null).cast("string").as("text"))
    // the at-least-once crash window: a redelivered slice BELOW the
    // watermark, content deliberately vandalized — the gate must drop
    // it; a leak marks the dup-evidence docs as touched and flips
    // their re-crawled copies from dropped_dup to admitted
    val redelivered = slice(0, 3)
      .select(col("doc_id").as("pk"), lit("update").as("op"),
        reverse(col("text")).as("text"))
    // pos: deterministic injective pk map — true changes land ABOVE
    // the watermark (1000003 is prime > every harness pk mod-class),
    // the redelivery below it
    val delta = changes.unionByName(deletes)
      .withColumn("pos", lit(1000000L) + col("pk") % 1000003L)
    val wire = delta.unionByName(redelivered.withColumn("pos", col("pk") + 1L))
      .select(col("pos"), lit(new java.sql.Timestamp(0L)).as("ts"),
        col("pk"), col("op"),
        coalesce(expr(ckSql("text")), lit(0L)).cast("double").as("value"))
    // transport: real binlog v4 bytes, encoded and decoded in tasks
    val decoded = CdcQueries.binlogRoundtrip(s, wire)
    val wm = GtidSet.parse("harness-src:1-500000")
    val gated = decoded
      .filter(!WatermarkGate.containsColumn(wm, "harness-src", col("pos")))
      .select(col("pk").as("doc_id"), col("op"),
        col("value").cast("long").as("ck"))
    // blob side: both the true batch's and the redelivery's payloads
    // exist (a crashed window re-exposes its blobs too); the decoded
    // checksum selects which one a leaked event would resolve to
    val blob = changes.unionByName(redelivered)
      .select(col("pk").as("doc_id"), col("text"),
        expr(ckSql("text")).as("ck"))
      .dropDuplicates("doc_id", "ck")
    val ledger0 = gated.filter(col("op") === "delete")
      .select(col("doc_id"), col("op"), lit(null).cast("string").as("text"))
      .unionByName(gated.filter(col("op") =!= "delete")
        .join(broadcast(blob), Seq("doc_id", "ck"))
        .select(col("doc_id"), col("op"), col("text")))
      .localCheckpoint(true) // bounded batch; feeds every leg below
    // latest-wins evidence: standing rows whose pk the feed touched
    // (updated, deleted, or leaked) are stale and carry no dup evidence
    val surviving = docs
      .join(broadcast(ledger0.select(col("doc_id"))), Seq("doc_id"), "left_anti")
    val corpusShs = Dedup.shinglesOf(surviving).persist()
    val corpusBands = Dedup.minhashBands(corpusShs)
    val upserts = ledger0.filter(col("op") =!= "delete")
    val upShs = Dedup.shinglesOf(upserts).localCheckpoint(true)
    val upBands = Dedup.minhashBands(upShs)
    val dups = corpusBands
      .join(broadcast(upBands.select(col("doc_id").as("new_id"), col("band"))), "band")
      .select(col("new_id"), col("doc_id").as("corpus_id"))
      .dropDuplicates("new_id", "corpus_id")
      .join(broadcast(upShs.select(col("doc_id").as("new_id"), col("shs").as("sn"))), "new_id")
      .join(corpusShs.select(col("doc_id").as("corpus_id"), col("shs").as("sc")), "corpus_id")
      .filter(size(array_intersect(col("sn"), col("sc"))).cast("double")
        / size(array_union(col("sn"), col("sc"))) >= 0.5)
      .groupBy(col("new_id").as("doc_id"))
      .agg(count(lit(1)).as("n_dups"))
    val statused = ledger0
      .withColumn("quality",
        when(col("op") === "delete", lit(-1.0))
          .otherwise(qualityCol(Text.wordsCol(col("text")))))
      .join(broadcast(dups), Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_dups"))
      .withColumn("status",
        when(col("op") === "delete", "deleted")
          .when(col("quality") < 0.5, "dropped_quality")
          .when(col("n_dups") > 0, "dropped_dup")
          .otherwise("admitted"))
      .localCheckpoint(true) // ≤19 rows; joined twice below
    // index consequence — ONLY what curation admitted (plus deletes):
    val base = Similarity.quantized(s, d)
    val cents = Similarity.collectCents(Similarity.trainCodebook(base, iters = 2))
    val emb = Tables.embeddings(s, d)
    // updates re-embed as the negated vector (p9's convention);
    // inserts carry the embedding of their source document
    val admitted = statused.filter(col("status") === "admitted")
      .withColumn("evec",
        when(col("op") === "update", col("doc_id"))
          .otherwise(col("doc_id") - 7999980L))
    val newQ = emb
      .join(broadcast(admitted.select(col("doc_id").as("adm_id"), col("evec"), col("op"))),
        col("vec_id") === col("evec"))
      .select(col("adm_id").as("vec_id"),
        when(col("op") === "update",
          expr("transform(embedding, x -> CAST(floor(-CAST(x AS DOUBLE) * 1000) AS DOUBLE))"))
          .otherwise(
            expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS DOUBLE))"))
          .as("q"))
    val newCells = Similarity.assignCellsFrom(newQ, cents)
      .select(col("vec_id").as("doc_id"), col("cid").as("cell"))
    // deletes retract their STANDING assignment
    val delCells = Similarity
      .assignCellsFrom(base.join(broadcast(statused.filter(col("op") === "delete")
        .select(col("doc_id").as("vec_id"))), Seq("vec_id"), "left_semi"), cents)
      .select(col("vec_id").as("doc_id"), col("cid").as("cell"))
    val out = statused
      .join(broadcast(newCells.unionByName(delCells)), Seq("doc_id"), "left")
      .withColumn("index_action",
        when(col("op") === "delete", "removed")
          .when(col("status") === "admitted" && col("op") === "update", "reassigned")
          .when(col("status") === "admitted", "added")
          .otherwise("none"))
      .select("doc_id", "op", "quality", "n_dups", "status", "index_action", "cell")
      .orderBy("doc_id")
    try out.localCheckpoint(true)
    finally corpusShs.unpersist(blocking = false)
  }

  private val p12Oracle: String = {
    val ws = Text.wordsSql("text")
    def assignSql(rel: String) =
      s"""SELECT vec_id, cid FROM (
         |  SELECT x.vec_id, c.cid,
         |         row_number() OVER (PARTITION BY x.vec_id ORDER BY
         |           CAST(list_sum(list_transform(generate_series(1, 64),
         |                i -> x.q[i] * c.sv[i])) AS DOUBLE) / c.n DESC,
         |           c.cid) AS rnk
         |  FROM $rel x, c2 c) WHERE rnk = 1""".stripMargin
    s"""WITH delta AS (
       |  SELECT doc_id AS pk, 'update' AS op, text || ' revised edition' AS value
       |  FROM documents WHERE doc_id >= 10 AND doc_id < 15
       |  UNION ALL
       |  SELECT doc_id, 'update', 'the the the the'
       |  FROM documents WHERE doc_id >= 15 AND doc_id < 18
       |  UNION ALL
       |  SELECT doc_id, 'delete', NULL
       |  FROM documents WHERE doc_id >= 20 AND doc_id < 25
       |  UNION ALL
       |  SELECT doc_id + 8000000, 'insert', text FROM documents WHERE doc_id < 3
       |  UNION ALL
       |  SELECT doc_id + 7999980, 'insert', reverse(text)
       |  FROM documents WHERE doc_id >= 30 AND doc_id < 33),
       |surviving AS (
       |  SELECT doc_id, text FROM documents
       |  WHERE doc_id NOT IN (SELECT pk FROM delta)),
       |ups AS (SELECT pk AS doc_id, value AS text FROM delta WHERE op <> 'delete'),
       |${Dedup.lshCtesSql("surviving", "")},
       |${Dedup.lshCtesSql("ups", "n")},
       |dup AS (
       |  SELECT new_id AS doc_id, count(*) AS n_dups FROM (
       |    SELECT DISTINCT n.doc_id AS new_id, c.doc_id AS corpus_id,
       |           n.shs AS sn, c.shs AS sc
       |    FROM nbands n JOIN bands c ON n.band = c.band)
       |  WHERE CAST(len(list_intersect(sn, sc)) AS DOUBLE)
       |          / len(list_distinct(list_concat(sn, sc))) >= 0.5
       |  GROUP BY new_id),
       |scored AS (
       |  SELECT doc_id,
       |         least(CAST(n_words AS DOUBLE) / 80.0, 1.0) * 0.4
       |           + (CAST(n_uniq AS DOUBLE) / n_words) * 0.3
       |           + (1.0 - CAST(n_stop AS DOUBLE) / n_words) * 0.3 AS quality
       |  FROM (SELECT doc_id,
       |               CAST(len($ws) AS INT) AS n_words,
       |               CAST(len(list_distinct($ws)) AS INT) AS n_uniq,
       |               CAST(len(list_filter($ws, x -> x IN ('the','a'))) AS INT) AS n_stop
       |        FROM ups)),
       |st AS (
       |  SELECT d.pk AS doc_id, d.op,
       |         CASE WHEN d.op = 'delete' THEN -1.0 ELSE s.quality END AS quality,
       |         CAST(COALESCE(p.n_dups, 0) AS BIGINT) AS n_dups,
       |         CASE WHEN d.op = 'delete' THEN 'deleted'
       |              WHEN s.quality < 0.5 THEN 'dropped_quality'
       |              WHEN COALESCE(p.n_dups, 0) > 0 THEN 'dropped_dup'
       |              ELSE 'admitted' END AS status
       |  FROM delta d
       |  LEFT JOIN scored s ON s.doc_id = d.pk
       |  LEFT JOIN dup p ON p.doc_id = d.pk),
       |base AS (
       |  SELECT vec_id,
       |         list_transform(embedding::DOUBLE[], x -> CAST(floor(x * 1000) AS BIGINT)) AS q
       |  FROM embeddings),
       |${Similarity.ivfOracleChain},
       |vsrc AS (
       |  SELECT st.doc_id,
       |         list_transform(e.embedding::DOUBLE[], x -> CAST(floor(-x * 1000) AS BIGINT)) AS q
       |  FROM st JOIN embeddings e ON e.vec_id = st.doc_id
       |  WHERE st.status = 'admitted' AND st.op = 'update'
       |  UNION ALL
       |  SELECT st.doc_id,
       |         list_transform(e.embedding::DOUBLE[], x -> CAST(floor(x * 1000) AS BIGINT)) AS q
       |  FROM st JOIN embeddings e ON e.vec_id = st.doc_id - 7999980
       |  WHERE st.status = 'admitted' AND st.op = 'insert'),
       |acells AS (SELECT vec_id AS doc_id, cid AS cell
       |           FROM (${assignSql("(SELECT doc_id AS vec_id, q FROM vsrc)")}) t),
       |rcells AS (
       |  SELECT st.doc_id, a.cid AS cell FROM st
       |  JOIN a3 a ON a.vec_id = st.doc_id WHERE st.op = 'delete')
       |SELECT st.doc_id, st.op, st.quality, st.n_dups, st.status,
       |       CASE WHEN st.op = 'delete' THEN 'removed'
       |            WHEN st.status = 'admitted' AND st.op = 'update' THEN 'reassigned'
       |            WHEN st.status = 'admitted' THEN 'added'
       |            ELSE 'none' END AS index_action,
       |       CAST(COALESCE(ac.cell, rc.cell) AS BIGINT) AS cell
       |FROM st
       |LEFT JOIN acells ac ON ac.doc_id = st.doc_id
       |LEFT JOIN rcells rc ON rc.doc_id = st.doc_id
       |ORDER BY st.doc_id""".stripMargin
  }

  // ---- p14: corrupt-tolerant JSONL ingestion --------------------------------

  /** Deliberately malformed lines planted among the spooled JSONL —
    * one per corruption class the reader must quarantine: truncated
    * record, non-JSON noise, bare brace garbage.
    */
  private val P14Corrupt = Seq(
    """{"doc_id": 900001, "text": "truncated""",
    """not json at all""",
    """{bad}""")

  private[ops] val p14Spooled =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Corrupt-tolerant ingestion — the pipeline's missing FIRST stage:
    * every other operator reads clean parquet, but a real corpus
    * arrives as JSONL with garbage interleaved, and the ingest step
    * must parse what parses, QUARANTINE what doesn't (never drop it
    * silently, never fail the batch), and account for both. The gate
    * spools `documents` to JSONL once per (JVM, sf dir) with
    * [[P14Corrupt]] planted, re-ingests with an explicit schema in
    * PERMISSIVE mode + `_corrupt_record`, and reports the audit row:
    * line/parsed/quarantined counts plus content invariants of the
    * parsed side (doc_id sum, text polynomial-hash sum, n_chars sum).
    * The ORACLE recomputes the invariants from the original table —
    * so the gate proves the JSON encode → decode round trip is
    * lossless AND the quarantine count is exactly the plants: a
    * parser that mangles one string or misclassifies one line breaks
    * the hash.
    *
    * Scale shape: the spool is a distributed text write; ingestion is
    * ONE schema-projected scan (JSON parsing is per-line, embarrass-
    * ingly parallel) folding straight into a map-side-combined global
    * aggregate — no exchange carries more than one row per partition.
    * At 100 TB this is exactly the shape: parse, quarantine, audit in
    * a single pass, with the quarantined raw lines kept queryable.
    */
  private def p14JsonlIngest(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val path = p14Spooled.computeIfAbsent(d, { _ =>
      val dir = java.nio.file.Files.createTempDirectory("graft-p14-")
      Runtime.getRuntime.addShutdownHook(
        new Thread(() => graft.Fs.deleteRecursively(dir)))
      val out = dir.resolve("docs").toString
      Tables.documents(s, d)
        .select(to_json(struct(col("doc_id"), col("text"), col("lang"),
          col("source"), col("n_chars"))).as("value"))
        .union(P14Corrupt.toDF("value"))
        .write.mode("overwrite").text(out)
      out
    })
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, text STRING, lang STRING, source STRING, " +
        "n_chars BIGINT, _corrupt_record STRING")
    val ok = col("_corrupt_record").isNull
    s.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(ok, 0L).otherwise(1L)).as("n_quarantined"),
        sum(when(ok, 1L).otherwise(0L)).as("n_parsed"),
        sum(when(ok, col("doc_id"))).as("sum_doc_id"),
        sum(when(ok, expr(Text.polyHashSql("text", 8)))).as("text_hash_sum"),
        sum(when(ok, col("n_chars"))).as("sum_chars"))
  }

  private val p14Oracle: String =
    s"""SELECT CAST(count(*) + ${P14Corrupt.size} AS BIGINT) AS n_lines,
       |       CAST(${P14Corrupt.size} AS BIGINT) AS n_quarantined,
       |       CAST(count(*) AS BIGINT) AS n_parsed,
       |       CAST(sum(doc_id) AS BIGINT) AS sum_doc_id,
       |       CAST(sum(${Text.polyHashSql("text", 8)}) AS BIGINT) AS text_hash_sum,
       |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
       |FROM documents""".stripMargin

  // ---- p15: dataset card -----------------------------------------------------

  /** The dataset card — the per-source manifest every published
    * training corpus ships (and every ingest review asks for first):
    * row and character volumes, exact-duplicate accounting, language
    * mix, and the short-document tail, one row per source. Re-ingest
    * pressure is made visible the same way d1 plants it (the first 10
    * docs replayed under shifted ids), so the duplicate columns are
    * provably non-vacuous: the replayed sources carry dups, the rest
    * must report zero.
    *
    * Scale shape: ONE scan into one source-keyed rollup. The unique-
    * content count groups on the engine-shared md5 digest (d1's key —
    * raw text never keys the exchange); Spark plans the distinct-
    * aggregate as the standard two-phase expand, still keyed on
    * (source, digest). Ratios are integer per-mille.
    */
  private def p15DataCard(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"), col("text"))
    val replayed = docs.filter(col("doc_id") < 10)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        col("source"), col("lang"), col("n_chars"), col("text"))
    docs.union(replayed)
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        countDistinct(md5(col("text"))).as("n_unique"),
        countDistinct(col("lang")).as("n_langs"),
        sum((col("lang") === "en").cast("long")).as("n_en"),
        sum((col("n_chars") < 200).cast("long")).as("n_short"))
      .select(col("source"), col("n_docs"), col("total_chars"),
        expr("total_chars DIV n_docs").as("mean_chars"),
        (col("n_docs") - col("n_unique")).as("n_exact_dups"),
        col("n_langs"),
        expr("(n_en * 1000) DIV n_docs").as("en_pm"),
        expr("(n_short * 1000) DIV n_docs").as("short_pm"))
      .orderBy("source")
  }

  private val p15Oracle: String =
    """WITH all_docs AS (
      |  SELECT doc_id, source, lang, n_chars, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, source, lang, n_chars, text
      |  FROM documents WHERE doc_id < 10),
      |card AS (
      |  SELECT source,
      |         CAST(count(*) AS BIGINT) AS n_docs,
      |         CAST(sum(n_chars) AS BIGINT) AS total_chars,
      |         CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_unique,
      |         CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
      |         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
      |         CAST(sum(CASE WHEN n_chars < 200 THEN 1 ELSE 0 END) AS BIGINT) AS n_short
      |  FROM all_docs GROUP BY source)
      |SELECT source, n_docs, total_chars,
      |       total_chars // n_docs AS mean_chars,
      |       n_docs - n_unique AS n_exact_dups,
      |       n_langs,
      |       (n_en * 1000) // n_docs AS en_pm,
      |       (n_short * 1000) // n_docs AS short_pm
      |FROM card ORDER BY source""".stripMargin

  // ---- p16: the dedup cascade funnel -----------------------------------------

  /** The dedup CASCADE — the stage order every production corpus
    * pipeline runs (CCNet/C4/Dolma/FineWeb all funnel this way) as one
    * accounted flow: (1) URL canonicalization keeps one fetch per
    * logical page, (2) exact content dedup (128-bit digest key)
    * collapses byte-identical re-ingests, (3) MinHash-LSH near-dup
    * removes any survivor with a smaller surviving near-neighbor
    * (verified Jaccard ≥ 0.5 — d3's gate). Cheap stages run first so
    * each stage shrinks the next one's input; the output is the
    * survivor funnel (n_in / n_removed / n_out per stage) — the
    * number a data-quality review reads before anything ships.
    *
    * The near-dup removal policy is deliberately one-shot, not a
    * fixpoint: drop any doc with a smaller near-neighbor among STAGE-2
    * SURVIVORS (not among stage-3 survivors) — deterministic, single
    * pass, and what batch pipelines actually do (a transitive chain
    * a~b~c drops both b and c; re-running would change nothing).
    *
    * Scale shape: stage exchanges key on the canonical URL, the md5
    * digest, and d3's bands — never text; the LSH leg pays only
    * stage-2 survivors; the removal set is tiny and broadcasts into
    * an anti-join. Survivor frames pin across their two consumers
    * (count + next stage) instead of recomputing the chain.
    */
  /** The lazy cascade plan — split out (t34's pattern) so the plan
    * audit can inspect the pre-checkpoint shape. Returns the funnel
    * frame plus the pinned intermediates the caller must release.
    */
  private[ops] def p16Lazy(s: SparkSession, d: String): (DataFrame, Seq[DataFrame]) = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val all = docs.union(docs.filter(col("doc_id") < 10)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      .withColumn("url", expr(Dedup.SynthUrlSpark))
      .withColumn("canon", expr(Dedup.CanonChainSpark))
      .persist()
    // stage 1: keep the min doc per canonical URL (min-struct election:
    // one exchange keyed on canon, the survivor's text rides as value)
    val s1 = all.groupBy("canon")
      .agg(min(struct(col("doc_id"), col("text"))).as("kp"))
      .select(col("kp.doc_id").as("doc_id"), col("kp.text").as("text"))
      .persist()
    // stage 2: exact dedup on the engine-shared digest (d1's key)
    val s2 = s1.groupBy(md5(col("text")).as("tkey"))
      .agg(min(struct(col("doc_id"), col("text"))).as("kp"))
      .select(col("kp.doc_id").as("doc_id"), col("kp.text").as("text"))
      .persist()
    // stage 3: near-dup over stage-2 survivors only (d3's banded LSH +
    // exact-Jaccard verification), one-shot smaller-neighbor removal
    val shs = Dedup.shinglesOf(s2).persist()
    val banded = Dedup.minhashBands(shs)
    val removed3 = banded.as("a")
      .join(banded.as("b"), col("a.band") === col("b.band") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
      .join(shs.select(col("doc_id").as("id_a"), col("shs").as("sa")), "id_a")
      .join(shs.select(col("doc_id").as("id_b"), col("shs").as("sb")), "id_b")
      .filter(size(array_intersect(col("sa"), col("sb"))).cast("double") /
        size(array_union(col("sa"), col("sb"))) >= 0.5)
      .select(col("id_b").as("doc_id")).distinct()
    val s3 = s2.join(broadcast(removed3), Seq("doc_id"), "left_anti")
    def stageRow(name: String, in: DataFrame, out: DataFrame): DataFrame =
      in.agg(count(lit(1)).as("n_in"))
        .crossJoin(out.agg(count(lit(1)).as("n_out")))
        .select(lit(name).as("stage"), col("n_in"),
          (col("n_in") - col("n_out")).as("n_removed"), col("n_out"))
    val funnel = stageRow("1_url", all, s1)
      .unionAll(stageRow("2_exact", s1, s2))
      .unionAll(stageRow("3_near", s2, s3))
      .orderBy("stage")
    (funnel, Seq(all, s1, s2, shs))
  }

  private def p16DedupCascade(s: SparkSession, d: String): DataFrame = {
    val (funnel, pinned) = p16Lazy(s, d)
    val out = funnel.localCheckpoint(true)
    pinned.foreach(_.unpersist(blocking = false))
    out
  }

  private val p16Oracle: String = {
    s"""WITH all_docs AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 10),
       |cn AS (
       |  SELECT doc_id, text, ${Dedup.CanonChainDuck} AS canon
       |  FROM (SELECT doc_id, text, ${Dedup.SynthUrlDuck} AS url FROM all_docs)),
       |k1 AS (SELECT min(doc_id) AS doc_id FROM cn GROUP BY canon),
       |s1 AS (SELECT cn.doc_id, cn.text FROM cn JOIN k1 USING (doc_id)),
       |k2 AS (SELECT min(doc_id) AS doc_id FROM s1 GROUP BY md5(text)),
       |s2 AS (SELECT s1.doc_id, s1.text FROM s1 JOIN k2 USING (doc_id)),
       |${Dedup.lshCtesSql("s2", "p")},
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.shs AS sa, b.shs AS sb
       |  FROM pbands a JOIN pbands b ON a.band = b.band AND a.doc_id < b.doc_id),
       |rem3 AS (
       |  SELECT DISTINCT id_b AS doc_id FROM cand
       |  WHERE CAST(len(list_intersect(sa, sb)) AS DOUBLE)
       |        / len(list_distinct(list_concat(sa, sb))) >= 0.5),
       |c0 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM all_docs),
       |c1 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM s1),
       |c2 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM s2),
       |c3 AS (SELECT c2.n - (SELECT CAST(count(*) AS BIGINT) FROM rem3) AS n FROM c2)
       |SELECT '1_url' AS stage, c0.n AS n_in, c0.n - c1.n AS n_removed, c1.n AS n_out
       |FROM c0, c1
       |UNION ALL
       |SELECT '2_exact', c1.n, c1.n - c2.n, c2.n FROM c1, c2
       |UNION ALL
       |SELECT '3_near', c2.n, c2.n - c3.n, c3.n FROM c2, c3
       |ORDER BY stage""".stripMargin
  }

  // ---- p17: deterministic epoch shuffle --------------------------------------

  /** The training-order shuffle — the pass between curation and the
    * data loader: every epoch must visit the whole corpus in a
    * different, RE-DERIVABLE pseudo-random order (resume-from-step
    * and byte-exact reruns both depend on the order being a pure
    * function of (doc, epoch), never an RNG stream). Each doc gets a
    * multiplicative-hash position key salted by the epoch, lands in a
    * shard by key range, and takes its in-shard rank; (shard,
    * pos_in_shard) IS the loader's read order.
    *
    * Scale shape: the position key is row-local integer arithmetic
    * (63-bit-safe: ids × the Knuth constant stay far under overflow —
    * Spark 4 ANSI would throw otherwise, a feature here); the ONLY
    * exchange keys on the shard; each shard sorts its own slice (the
    * 16-shard knob scales as corpus ÷ loader-file budget, keeping
    * per-shard sorts bounded — never one global sort). Two epochs ride
    * one plan via a row-local explode.
    */
  private def p17EpochShuffle(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("epoch"), col("shard")).orderBy(col("pos"), col("doc_id"))
    Tables.documents(s, d)
      .select(col("doc_id"), explode(array(lit(1), lit(2))).as("epoch"))
      .withColumn("pos",
        expr("(doc_id * 2654435761 + epoch * 40503 + 12345) % 2147483647"))
      .withColumn("shard", expr("CAST(pos % 16 AS INT)"))
      .withColumn("pos_in_shard", row_number().over(w))
      .select("epoch", "shard", "pos_in_shard", "doc_id", "pos")
      .orderBy("epoch", "shard", "pos_in_shard")
  }

  private val p17Oracle: String =
    """WITH e AS (
      |  SELECT doc_id, unnest([1, 2]) AS epoch FROM documents),
      |k AS (
      |  SELECT CAST(epoch AS INT) AS epoch, doc_id,
      |         (doc_id * 2654435761 + epoch * 40503 + 12345) % 2147483647 AS pos
      |  FROM e)
      |SELECT epoch, CAST(pos % 16 AS INT) AS shard,
      |       CAST(row_number() OVER (PARTITION BY epoch, pos % 16
      |         ORDER BY pos, doc_id) AS INT) AS pos_in_shard,
      |       doc_id, pos
      |FROM k ORDER BY epoch, shard, pos_in_shard""".stripMargin

  // ---- p18: active-learning labeling queue ---------------------------------

  /** Labeling budget per source. */
  private val P18PerSource = 4

  /** The model-in-the-loop weld: t51's TRAINED classifier picks what
    * to label next — per source, the [[P18PerSource]] docs whose
    * scores sit closest to the decision midpoint (smallest margin =
    * maximum uncertainty, ties by doc_id), the textbook
    * uncertainty-sampling acquisition (Lewis & Gale 1994) every
    * model-in-the-loop curation pipeline runs between labeling
    * rounds. Budget is allocated PER SOURCE so a skewed corpus can't
    * spend the whole round on one domain — the practical stratified
    * variant. Rank-based acquisition (top-k by uncertainty) rather
    * than a fixed band: the fixture's trained scores cluster within
    * ±800 of the midpoint, so any absolute band is either empty or
    * everything; the rank form is scale-free.
    *
    * Scale shape: re-runs t51's training (R bounded passes over the
    * pinned linear-built feature frame — the trained weights are a
    * 257-literal; cheap since the r17 rebuild), one doc-keyed join to
    * recover the source (scores and documents are both corpus-sized;
    * a keyed equi-join, no broadcast pretense), then the acquisition
    * is a source-keyed top-k window — group-bounded output, the same
    * shape as t31's caps.
    */
  private def p18LabelQueue(s: SparkSession, d: String): DataFrame = {
    val scored = graft.ops.Text.queries("t51_quality_clf")(s, d)
      .select(col("doc_id"), col("score"))
      .withColumn("margin", abs(col("score") - lit(graft.ops.Text.T51Scale / 2)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("margin").asc, col("doc_id"))
    Tables.documents(s, d).select(col("doc_id"), col("source"))
      .join(scored, Seq("doc_id"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= P18PerSource)
      .select(col("source"), col("doc_id"), col("score"), col("margin"), col("rnk"))
      .orderBy("source", "rnk")
  }

  private val p18Oracle: String =
    s"""WITH ${graft.ops.Text.t51OracleCtes}
       |SELECT source, doc_id, score, margin, rnk FROM (
       |  SELECT d.source, s.doc_id, CAST(s.score AS BIGINT) AS score,
       |         CAST(abs(s.score - ${graft.ops.Text.T51Scale / 2}) AS BIGINT) AS margin,
       |         CAST(row_number() OVER (PARTITION BY d.source
       |           ORDER BY abs(s.score - ${graft.ops.Text.T51Scale / 2}), s.doc_id) AS INT) AS rnk
       |  FROM sc s JOIN documents d USING (doc_id))
       |WHERE rnk <= $P18PerSource ORDER BY source, rnk""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p18_label_queue" -> (p18LabelQueue _),
    "p17_epoch_shuffle" -> (p17EpochShuffle _),
    "p16_dedup_cascade" -> (p16DedupCascade _),
    "p15_data_card" -> (p15DataCard _),
    "p14_jsonl_ingest" -> (p14JsonlIngest _),
    "p13_mixture_sample" -> (p13MixtureSample _),
    "p12_e2e_protocol" -> (p12E2eProtocol _),
    "p11_mixture" -> (p11Mixture _),
    "p10_mm_shards" -> (p10MmShards _),
    "p9_index_maint" -> (p9IndexMaint _),
    "p8_df_maint" -> (p8DfMaint _),
    "p7_cdc_curation" -> (p7CdcCuration _),
    "p1_curation" -> (p1Curation _),
    "p2_seq_pack" -> (p2SeqPack _),
    "p3_shard_shuffle" -> (p3ShardShuffle _),
    "p4_full_pipeline" -> (p4FullPipeline _),
    "p5_retrieval" -> (p5Retrieval _),
    "p6_stream_ingest" -> (p6StreamIngest _)
  )

  val oracles: Map[String, String] = Map(
    "p18_label_queue" -> p18Oracle,
    "p17_epoch_shuffle" -> p17Oracle,
    "p16_dedup_cascade" -> p16Oracle,
    "p15_data_card" -> p15Oracle,
    "p14_jsonl_ingest" -> p14Oracle,
    "p13_mixture_sample" -> p13Oracle,
    "p12_e2e_protocol" -> p12Oracle,
    "p11_mixture" -> p11Oracle,
    "p10_mm_shards" -> p10Oracle,
    "p9_index_maint" -> p9Oracle,
    "p8_df_maint" -> p8Oracle,
    "p7_cdc_curation" -> p7Oracle,
    "p1_curation" -> p1Oracle,
    "p2_seq_pack" -> p2Oracle,
    "p3_shard_shuffle" -> p3Oracle,
    "p4_full_pipeline" -> p4Oracle,
    "p5_retrieval" -> p5Oracle,
    "p6_stream_ingest" -> p6Oracle
  )
}

package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.Tables

/** One multimodal asset: opaque bytes plus typed metadata. The
  * harness has no real media files, so assets are derived
  * deterministically from `documents` (content = UTF-8 bytes of the
  * text, metadata from doc_id) — the *plumbing* (binary column,
  * metadata struct, partition-parallel decode, feature schema) is the
  * real thing; only the codec is a stub.
  */
final case class MmAsset(
    doc_id: Long,
    modality: String, // image | audio | video
    content: Array[Byte],
    width: Int, // image/video
    height: Int,
    sample_rate: Int // audio
)

/** Extracted features — what a real pipeline would hand to training. */
final case class MmFeature(
    doc_id: Long,
    modality: String,
    n_bytes: Int,
    checksum: Long,
    mean_byte: Double,
    frames_sampled: Int,
    thumb_bytes: Int
)

/** Resized asset: integer aspect-fit into a 224×224 training box plus
  * an 8×8 nearest-neighbor thumbnail checksum over the (stand-in)
  * pixel buffer.
  */
final case class MmResized(
    doc_id: Long,
    modality: String,
    out_w: Int,
    out_h: Int,
    out_bytes: Long, // the resized RGB buffer a real codec would emit
    pad_x: Int, // letterbox padding to the square box
    pad_y: Int,
    grid_checksum: Long
)

/** Multimodal-column operators: treat image/audio/video as `binary`
  * columns with typed metadata; decode / feature-extract / resize /
  * frame-sample run partition-parallel over a typed Dataset.
  *
  * STUB NOTICE: `decodeStub` stands in for a real codec (no media
  * libraries in this container). It is a deterministic fake — byte
  * statistics instead of pixel statistics — but the Spark-side
  * contract is real: per-partition batch processing (one codec init
  * per partition, the mapPartitions shape a JNI decoder needs),
  * binary transport, typed metadata, explicit feature schema.
  *
  * Scale notes: assets read columnar (binary column stays packed in
  * parquet pages); decode is embarrassingly parallel with zero
  * shuffles; feature output is narrow. At 100 TB the only knobs are
  * input split size (`maxPartitionBytes`) and executor memory per
  * decode — nothing here collects to the driver.
  */
object Multimodal {

  /** Deterministic asset table derived from `documents`. The reader
    * rides [[graft.Tables.fanOut]]: every downstream leg is a codec
    * (encode/decode/resize per row, milliseconds of CPU per asset), so
    * the scan must not arrive single-task (the fixture is one parquet
    * row group) — measured 3-4× on mm13/mm15/mm21 (see
    * OPTIMIZATION_r20.md).
    */
  def assets(s: SparkSession, d: String): Dataset[MmAsset] = {
    import s.implicits._
    Tables
      .fanOut(Tables.documents(s, d))
      .select(
        col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3).cast("int") + 1).as("modality"),
        encode(col("text"), "UTF-8").as("content"),
        (lit(64) + (col("doc_id") % 8) * 16).cast("int").as("width"),
        (lit(64) + (col("doc_id") % 5) * 16).cast("int").as("height"),
        element_at(array(lit(8000), lit(16000), lit(44100)),
          (col("doc_id") % 3).cast("int") + 1).as("sample_rate")
      )
      .as[MmAsset]
  }

  /** STUB for the real decoder. Deterministic byte-level stand-ins:
    * checksum = mod-P rolling hash (P = 2³¹−1, the repo's shared
    * modulus — kept inside BIGINT range so the DuckDB oracle can fold
    * the identical recurrence with `list_reduce`; a wrapping Long
    * would silently overflow there), mean byte value, "frame
    * sampling" = every `stride`-th byte, "thumbnail" = first w*h/64
    * bytes.
    */
  private[ops] def decodeStub(a: MmAsset): MmFeature = {
    val bytes = a.content
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum = (sum * 31 + (bytes(i) & 0xff)) % 2147483647L; i += 1 }
    val mean =
      if (bytes.isEmpty) 0.0
      else bytes.foldLeft(0L)((acc, b) => acc + (b & 0xff)).toDouble / bytes.length
    val stride = a.modality match {
      case "video" => 24
      case "audio" => 8
      case _ => 1
    }
    MmFeature(
      doc_id = a.doc_id,
      modality = a.modality,
      n_bytes = bytes.length,
      checksum = sum,
      mean_byte = mean,
      frames_sampled = if (bytes.isEmpty) 0 else (bytes.length + stride - 1) / stride,
      thumb_bytes = math.min(bytes.length, a.width * a.height / 64)
    )
  }

  /** Partition-parallel feature extraction: one decoder per
    * partition, batched iteration — the shape a real (JNI/FFI) codec
    * integration requires.
    */
  def extractFeatures(assets: Dataset[MmAsset]): Dataset[MmFeature] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // real pipeline: init codec once per partition here
      it.map(decodeStub)
    }
  }

  /** STUB resize (same contract as [[decodeStub]]): integer
    * aspect-preserving fit into the 224×224 training box (the long
    * side pins to 224, the short side scales by the same integer
    * ratio; the remainder is letterbox padding — all exact integer
    * arithmetic, so the oracle recomputes it bit-for-bit), plus a
    * REAL sampling pass: an 8×8 nearest-neighbor thumbnail over the
    * content treated as a `width`×`height` row-major buffer (output
    * cell (i,j) reads source byte at ((i·w)/8, (j·h)/8), clamped),
    * folded through the repo's shared mod-P rolling checksum. A real
    * codec swaps the byte buffer for pixels; the mapPartitions shape,
    * the output schema, and the interpolation index math are exactly
    * what it would run.
    */
  private[ops] def resizeStub(a: MmAsset): MmResized = {
    val (ow, oh) =
      if (a.width >= a.height) (224, a.height * 224 / a.width)
      else (a.width * 224 / a.height, 224)
    val bytes = a.content
    val n = bytes.length
    var sum = 0L
    if (n > 0) {
      var j = 0
      while (j < 8) {
        val y = j * a.height / 8
        var i = 0
        while (i < 8) {
          val x = i * a.width / 8
          val idx = math.min(n - 1, y * a.width + x)
          sum = (sum * 31 + (bytes(idx) & 0xff)) % 2147483647L
          i += 1
        }
        j += 1
      }
    }
    MmResized(a.doc_id, a.modality, ow, oh, ow.toLong * oh * 3,
      224 - ow, 224 - oh, sum)
  }

  /** Partition-parallel resize — one "codec" per partition, like
    * [[extractFeatures]].
    */
  def resize(assets: Dataset[MmAsset]): Dataset[MmResized] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(it => it.map(resizeStub))
  }

  /** mm1: asset catalog — binary sizes + typed metadata, fully
    * oracle-checkable (byte lengths of UTF-8 text match DuckDB's
    * octet_length over the encoded blob).
    */
  private def mm1Catalog(s: SparkSession, d: String): DataFrame =
    assets(s, d)
      .toDF()
      .select(
        col("doc_id"), col("modality"),
        length(col("content")).as("n_bytes"),
        col("width"), col("height"), col("sample_rate")
      )
      .orderBy("doc_id")

  private val mm1Oracle: String =
    """SELECT doc_id,
      |       (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] AS modality,
      |       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
      |       CAST(64 + (doc_id % 8) * 16 AS INT) AS width,
      |       CAST(64 + (doc_id % 5) * 16 AS INT) AS height,
      |       ([8000,16000,44100])[CAST(doc_id % 3 AS INT) + 1] AS sample_rate
      |FROM documents ORDER BY doc_id""".stripMargin

  /** mm2: per-modality rollup of extracted features. The decode stub
    * runs JVM-side in `mapPartitions`, but every stand-in statistic
    * is arithmetic over the ASCII byte stream, so the oracle can
    * recompute it in SQL — including the rolling checksum, folded
    * with `list_reduce` over the identical mod-P recurrence. The
    * mapPartitions plumbing is what a real codec needs; the oracle
    * proves the plumbing delivers every byte to it unmangled.
    */
  private def mm2Features(s: SparkSession, d: String): DataFrame =
    extractFeatures(assets(s, d))
      .toDF()
      .groupBy(col("modality"))
      .agg(
        count(lit(1)).as("n_assets"),
        sum(col("n_bytes")).as("total_bytes"),
        sum(col("frames_sampled")).as("total_frames"),
        min(col("checksum")).as("min_checksum"),
        max(col("checksum")).as("max_checksum")
      )
      .orderBy("modality")

  /** mm3: frame sampling — 4 evenly-strided slices per video asset,
    * each fingerprinted (md5). In a real pipeline the codec supplies
    * frame boundaries and the slices are pixel buffers; here the
    * boundaries are byte strides over the asset content, which keeps
    * the whole operator — offset arithmetic, slice, digest, one row
    * per (asset, frame) — SQL-expressible and oracle-checked, unlike
    * the mm2 stub. Row-local and shuffle-free up to the final sort.
    */
  private def mm3FrameSample(s: SparkSession, d: String): DataFrame =
    Tables
      .documents(s, d)
      .filter(col("doc_id") % 3 === 2) // the video modality of assets()
      .select(col("doc_id"), col("text"),
        floor(length(col("text")) / 4.0).cast("int").as("stride"))
      .select(col("doc_id"), col("text"), col("stride"),
        posexplode(sequence(lit(0), lit(3))).as(Seq("p", "frame_idx")))
      .select(
        col("doc_id"),
        col("frame_idx"),
        (lit(1) + col("frame_idx") * col("stride")).as("frame_off"),
        expr("md5(substr(text, 1 + frame_idx * stride, 16))").as("frame_md5")
      )
      .orderBy("doc_id", "frame_idx")

  private val mm3Oracle: String =
    """SELECT doc_id, frame_idx,
      |       1 + frame_idx * stride AS frame_off,
      |       md5(substr(text, 1 + frame_idx * stride, 16)) AS frame_md5
      |FROM (SELECT doc_id, text, CAST(floor(length(text) / 4.0) AS INT) AS stride
      |      FROM documents WHERE doc_id % 3 = 2),
      |     (VALUES (0), (1), (2), (3)) f(frame_idx)
      |ORDER BY doc_id, frame_idx""".stripMargin

  /** mm4: duplicate-video grouping by frame-fingerprint set — the
    * multimodal member of the dedup family. A video's identity is the
    * digest of its sampled frames' digests (mm3's exact frames), so
    * re-encodes that share content collapse to one group even though
    * the pipeline never compares raw bytes pairwise — the perceptual-
    * dedup shape (pHash per frame → content signature → hash-group)
    * with mm3's byte-stride frames standing in for decoded frames.
    * Planted re-ingests of the first 7 video assets (ids shifted by
    * 3,000,000 — divisible by 3, so the modality assignment is
    * preserved) guarantee duplicate groups exist. One scan + one
    * shuffle on the signature, identical to d1's scale shape.
    */
  private def mm4VideoDedup(s: SparkSession, d: String): DataFrame = {
    val vids = Tables
      .documents(s, d)
      .filter(col("doc_id") % 3 === 2) // the video modality of assets()
      .select(col("doc_id"), col("text"))
    val planted = vids
      .filter(col("doc_id") < 21)
      .select((col("doc_id") + 3000000L).as("doc_id"), col("text"))
    vids
      .union(planted)
      .select(col("doc_id"), col("text"),
        floor(length(col("text")) / 4.0).cast("int").as("stride"))
      .select(col("doc_id"), expr(
        """md5(concat_ws('|',
          |  md5(substr(text, 1, 16)),
          |  md5(substr(text, 1 + stride, 16)),
          |  md5(substr(text, 1 + 2 * stride, 16)),
          |  md5(substr(text, 1 + 3 * stride, 16))))""".stripMargin).as("vfp"))
      .groupBy(col("vfp"))
      .agg(
        min(col("doc_id")).as("canonical_id"),
        max(col("doc_id")).as("dup_id"),
        count(lit(1)).as("n_copies"))
      .filter(col("n_copies") > 1)
      .select("canonical_id", "dup_id", "n_copies")
      .orderBy("canonical_id")
  }

  private val mm4Oracle: String =
    """SELECT min(doc_id) AS canonical_id, max(doc_id) AS dup_id,
      |       count(*) AS n_copies
      |FROM (
      |  SELECT doc_id,
      |         md5(concat_ws('|',
      |           md5(substr(text, 1, 16)),
      |           md5(substr(text, 1 + stride, 16)),
      |           md5(substr(text, 1 + 2 * stride, 16)),
      |           md5(substr(text, 1 + 3 * stride, 16)))) AS vfp
      |  FROM (
      |    SELECT doc_id, text, CAST(floor(length(text) / 4.0) AS INT) AS stride
      |    FROM (
      |      SELECT doc_id, text FROM documents WHERE doc_id % 3 = 2
      |      UNION ALL
      |      SELECT doc_id + 3000000, text FROM documents
      |      WHERE doc_id % 3 = 2 AND doc_id < 21)))
      |GROUP BY vfp HAVING count(*) > 1
      |ORDER BY canonical_id""".stripMargin

  /** mm5: audio windowing + VAD-style gating — the audio member of
    * the family next to mm3's video frames: fixed-duration windows at
    * 50% overlap (width derived from the asset's sample rate, the
    * metadata-driven arithmetic a real resampler needs), each scored
    * and gated so "silent" windows drop before featurization — the
    * voice-activity-detection shape of a speech curation pipeline.
    * Per the family's stub contract the energy score is an md5-coin
    * over the window bytes (deterministic, oracle-foldable) standing
    * in for RMS over decoded samples; everything else — metadata
    * join-free derivation, strided full-window enumeration, overlap
    * arithmetic, the gate — is the real operator. Row-local explode
    * (≤6 windows/asset), zero shuffles before the final sort.
    */
  private def mm5AudioWindows(s: SparkSession, d: String): DataFrame =
    Tables
      .documents(s, d)
      .filter(col("doc_id") % 3 === 1) // the audio modality of assets()
      // sample_rate matches assets() metadata (audio ⇒ 16000); window
      // width = 1 ms of samples, stride = half a window (50% overlap)
      .select(col("doc_id"), col("text"), lit(16000).as("sample_rate"))
      .withColumn("width", (col("sample_rate") / 1000).cast("int"))
      .withColumn("stride", (col("width") / 2).cast("int"))
      .select(col("doc_id"), col("text"), col("sample_rate"), col("width"),
        col("stride"), posexplode(sequence(lit(0), lit(5))).as(Seq("p", "win_idx")))
      .withColumn("win_off", lit(1) + col("win_idx") * col("stride"))
      .filter(col("win_off") + col("width") <= length(col("text")) + 1)
      .withColumn("energy", expr(
        s"${graft.ops.Text.polyHashSql("md5(substr(text, win_off, width))", 8)} % 1000"))
      .filter(col("energy") >= 200)
      .select("doc_id", "win_idx", "win_off", "sample_rate", "energy")
      .orderBy("doc_id", "win_idx")

  private val mm5Oracle: String = {
    val h = graft.ops.Text.polyHashSql(
      "md5(substr(text, 1 + win_idx * stride, width))", 8)
    s"""SELECT doc_id, win_idx, 1 + win_idx * stride AS win_off,
       |       sample_rate, $h % 1000 AS energy
       |FROM (
       |  SELECT a.doc_id, a.text, a.sample_rate, a.width,
       |         a.width // 2 AS stride, f.win_idx
       |  FROM (SELECT doc_id, text, 16000 AS sample_rate,
       |               16000 // 1000 AS width
       |        FROM documents WHERE doc_id % 3 = 1) a,
       |       (VALUES (0), (1), (2), (3), (4), (5)) f(win_idx))
       |WHERE 1 + win_idx * stride + width <= length(text) + 1
       |  AND $h % 1000 >= 200
       |ORDER BY doc_id, win_idx""".stripMargin
  }

  /** mm6: the resize leg of the decode/extract/resize/frame-sample
    * quartet — visual assets (image + video) aspect-fit into the
    * square training box, with the thumbnail checksum proving the
    * sampling index math delivers the exact bytes a real
    * interpolator would read.
    */
  private def mm6Resize(s: SparkSession, d: String): DataFrame =
    resize(assets(s, d).filter(col("modality") =!= "audio"))
      .toDF()
      .orderBy("doc_id")

  // The stub indexes the UTF-8 BYTE array, so the oracle must too:
  // n is octet_length of the encoded blob (not the char count) and
  // the sampled byte comes out of hex(encode(text)) two nibbles at a
  // time — character accessors (length/ascii/substr on the VARCHAR)
  // would diverge on any non-ASCII text.
  private val mm6Oracle: String =
    """WITH a AS (
      |  SELECT doc_id,
      |         (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] AS modality,
      |         CAST(64 + (doc_id % 8) * 16 AS INT) AS w,
      |         CAST(64 + (doc_id % 5) * 16 AS INT) AS h,
      |         hex(encode(text)) AS hx,
      |         CAST(octet_length(encode(text)) AS INT) AS n
      |  FROM documents),
      |fit AS (
      |  SELECT *,
      |         CASE WHEN w >= h THEN 224 ELSE CAST((w * 224) // h AS INT) END AS out_w,
      |         CASE WHEN w >= h THEN CAST((h * 224) // w AS INT) ELSE 224 END AS out_h
      |  FROM a WHERE modality <> 'audio')
      |SELECT doc_id, modality, out_w, out_h,
      |       CAST(out_w AS BIGINT) * out_h * 3 AS out_bytes,
      |       224 - out_w AS pad_x, 224 - out_h AS pad_y,
      |       CASE WHEN n = 0 THEN 0 ELSE
      |         list_reduce(list_prepend(CAST(0 AS BIGINT),
      |           list_transform(
      |             list_transform(generate_series(0, 63),
      |               g -> least(n - 1, ((g // 8) * h // 8) * w + ((g % 8) * w // 8))),
      |             i -> CAST((strpos('0123456789ABCDEF', substr(hx, 2*i + 1, 1)) - 1) * 16
      |                     + (strpos('0123456789ABCDEF', substr(hx, 2*i + 2, 1)) - 1) AS BIGINT))),
      |           (x, y) -> (x * 31 + y) % 2147483647)
      |       END AS grid_checksum
      |FROM fit ORDER BY doc_id""".stripMargin

  /** mm7: image near-duplicate detection by perceptual fingerprint —
    * the CONTENT-similarity member of the multimodal family (mm4
    * groups byte-exact re-encodes; this one survives a retouch). The
    * pHash recipe: the asset's buffer is tiled onto the 8×8 grid
    * (mm6's index math, wrapped mod n so every cell reads a distinct
    * region of a short buffer), each tile contributes one fingerprint
    * bit, the 64 bits band 4×16 exactly like d4's SimHash, candidate
    * pairs share a band, and candidates verify by full 64-bit Hamming
    * distance ≤ 6.
    *
    * Stub contract (mm5's coin pattern): the per-tile bit is the
    * parity of the shared polynomial hash of md5(tile) — a
    * deterministic, oracle-foldable stand-in for the DCT-sign bit a
    * real pHash extracts, with the property a real one has: unrelated
    * assets get independent bits (expected Hamming 32; P(≤6) ≈ 2⁻⁴⁰),
    * while a small edit flips only the bits of the tiles it touches.
    * Planted retouches: the first 10 image assets re-ingested (ids
    * +3,000,000 — divisible by lcm(3,8,5) = 120, so modality and the
    * w/h metadata are preserved) with their FIRST character replaced;
    * only grid cells whose tile starts at the touched position can
    * flip (wraparound puts position 1 in ~one cell for these sizes),
    * so the pair verifies at Hamming ≲ 3 — caught here, provably
    * missed by mm4's exact fingerprint.
    *
    * Scale shape: the fingerprint is a row-local scan projection
    * (whole-stage codegen, no UDF); banding explodes ×4 and shuffles
    * on the band key, so pairwise work is per-bucket, never
    * corpus-wide — d1/d4's topology at any corpus size.
    */
  /** mm7's perceptual fingerprint as a reusable block over any
    * (doc_id, text) frame: tile index of grid cell g over a w×h
    * buffer, wrapped into the n-char stand-in; Spark `DIV` and DuckDB
    * `//` are both left-associative integer division, so the two
    * strings compute the identical index chain. The +g skew keeps
    * cells on distinct positions even when n divides the grid strides
    * (w and h are multiples of 16, so a short even-length buffer
    * would otherwise collapse every cell onto position 1 — one
    * retouched char would then flip ~32 bits and hide the planted
    * pair). Tiles are digested ONCE per cell (inner transform), then
    * the parity bit is taken from the digest — polyHashSql inlines
    * its argument per character, so hashing the digest directly would
    * md5 each tile 8 times. Geometry (w, h) derives from doc_id the
    * way [[assets]] does, so a re-ingest under a shifted id keeps its
    * tiling iff the shift is ≡ 0 (mod 8) and (mod 5) — the planted
    * ids (3M/8M/9M) all are.
    *
    * Output: (doc_id, bits, b0..b3), localCheckpoint'ed — one
    * fingerprint pass feeds the band join AND the bit-level verify.
    */
  private[ops] def imageFps(df: DataFrame): DataFrame = {
    val sparkBits =
      s"""transform(
         |  transform(sequence(0, 63), g ->
         |    md5(CASE WHEN n = 0 THEN '' ELSE
         |        substr(text, 1 + ((g DIV 8 * h DIV 8) * w + (g % 8 * w DIV 8) + g) % n, 8) END)),
         |  dg -> ${graft.ops.Text.polyHashSql("dg", 8)} % 2)""".stripMargin
    val bandExprs = (0 until 4).map { b =>
      (1 to 16).map(i => s"element_at(bits, ${16 * b + i}) * ${1L << (i - 1)}")
        .mkString("(", " + ", s") AS b$b")
    }
    df
      .withColumn("n", length(col("text")))
      .withColumn("w", (lit(64) + (col("doc_id") % 8) * 16).cast("int"))
      .withColumn("h", (lit(64) + (col("doc_id") % 5) * 16).cast("int"))
      .withColumn("bits", expr(sparkBits))
      .selectExpr("doc_id" +: "bits" +: bandExprs: _*)
      .localCheckpoint(true)
  }

  /** The 64-way bit Hamming distance between two fingerprint columns
    * (lambda-bound values only — the Round-12b rule).
    */
  private[ops] val fpHammingSql: String =
    """CAST(aggregate(zip_with(bits_a, bits_b,
      |  (x, y) -> CASE WHEN x <> y THEN 1 ELSE 0 END),
      |  0L, (acc, v) -> acc + v) AS INT)""".stripMargin

  private def mm7ImageDedup(s: SparkSession, d: String): DataFrame = {
    val hashed = imageFps(graft.Tables.fanOut(Tables.documents(s, d))
      .filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"), col("text"))
      .unionByName(
        Tables.documents(s, d)
          .filter(col("doc_id") % 3 === 0 && col("doc_id") < 30)
          .select((col("doc_id") + 3000000L).as("doc_id"),
            concat(lit("Z"), expr("substr(text, 2)")).as("text"))))
    // the band exchange carries IDS ONLY (3 longs/row, not the
    // 64-element fingerprints); the candidate pair set is tiny
    // (banding exists to make it so), so the verifier fetches bits
    // with two joins whose small side AQE broadcasts — the corpus
    // never shuffles its fingerprint arrays
    val bands = hashed.select(col("doc_id"),
      posexplode(array(col("b0"), col("b1"), col("b2"), col("b3")))
        .as(Seq("band_idx", "key")))
    val pairIds = bands.as("a")
      .join(bands.as("b"),
        col("a.band_idx") === col("b.band_idx") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    pairIds
      .join(hashed.select(col("doc_id").as("id_a"), col("bits").as("bits_a")), Seq("id_a"))
      .join(hashed.select(col("doc_id").as("id_b"), col("bits").as("bits_b")), Seq("id_b"))
      .withColumn("hamming", expr(
        """CAST(aggregate(zip_with(bits_a, bits_b,
          |  (x, y) -> CASE WHEN x <> y THEN 1 ELSE 0 END),
          |  0L, (acc, v) -> acc + v) AS INT)""".stripMargin))
      .filter(col("hamming") <= 6)
      .select("id_a", "id_b", "hamming")
      .orderBy("id_a", "id_b")
  }

  /** Oracle half of [[imageFps]]: the identical tile-digest bit chain
    * in DuckDB SQL, shared by the mm7 and mm12 oracles (ONE string so
    * the two gates can never fingerprint differently).
    */
  private val duckFpBits: String =
    s"""list_transform(
       |  list_transform(generate_series(0, 63), g ->
       |    md5(CASE WHEN n = 0 THEN '' ELSE
       |        substr(text, 1 + ((g // 8 * h // 8) * w + (g % 8 * w // 8) + g) % n, 8) END)),
       |  dg -> ${graft.ops.Text.polyHashSql("dg", 8)} % 2)""".stripMargin

  private val duckBandCols: String = (0 until 4).map { b =>
    (1 to 16).map(i => s"bits[${16 * b + i}] * ${1L << (i - 1)}")
      .mkString("(", " + ", s") AS b$b")
  }.mkString(",\n         ")

  /** Oracle fragment: fingerprints + bands over a CTE `img(doc_id,
    * text)` — ends in `bits(doc_id, bits)` and `bands(…, b0..b3)`.
    */
  private def duckFpCtes: String =
    s"""a AS (
       |  SELECT doc_id, text, CAST(length(text) AS INT) AS n,
       |         CAST(64 + (doc_id % 8) * 16 AS INT) AS w,
       |         CAST(64 + (doc_id % 5) * 16 AS INT) AS h
       |  FROM img),
       |bits AS (
       |  SELECT doc_id,
       |         $duckFpBits AS bits
       |  FROM a),
       |bands AS (
       |  SELECT doc_id, bits,
       |         $duckBandCols
       |  FROM bits)""".stripMargin

  private val mm7Oracle: String = {
    val duckBits = duckFpBits
    val bandCols = duckBandCols
    s"""WITH img AS (
       |  SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0
       |  UNION ALL
       |  SELECT doc_id + 3000000, 'Z' || substr(text, 2)
       |  FROM documents WHERE doc_id % 3 = 0 AND doc_id < 30),
       |a AS (
       |  SELECT doc_id, text, CAST(length(text) AS INT) AS n,
       |         CAST(64 + (doc_id % 8) * 16 AS INT) AS w,
       |         CAST(64 + (doc_id % 5) * 16 AS INT) AS h
       |  FROM img),
       |bits AS (
       |  SELECT doc_id,
       |         $duckBits AS bits
       |  FROM a),
       |bands AS (
       |  SELECT doc_id, bits,
       |         $bandCols
       |  FROM bits),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
       |  FROM bands x JOIN bands y
       |    ON x.doc_id < y.doc_id
       |   AND (x.b0 = y.b0 OR x.b1 = y.b1 OR x.b2 = y.b2 OR x.b3 = y.b3))
       |SELECT id_a, id_b, hamming FROM (
       |  SELECT c.id_a, c.id_b,
       |         CAST(list_sum(list_transform(generate_series(1, 64),
       |              i -> CASE WHEN p.bits[i] <> q.bits[i] THEN 1 ELSE 0 END)) AS INT)
       |           AS hamming
       |  FROM cand c
       |  JOIN bits p ON p.doc_id = c.id_a
       |  JOIN bits q ON q.doc_id = c.id_b)
       |WHERE hamming <= 6 ORDER BY id_a, id_b""".stripMargin
  }

  // ---- mm8: time-shift-robust audio near-dup (landmark pairs) --------------

  /** Offset-invariant audio near-dup — the matching capability the
    * rest of the family lacks: mm4 groups byte-EXACT re-encodes and
    * mm7 survives a retouch, but both are alignment-bound, so a clip
    * re-ingested with its head trimmed (the "same song, late start"
    * case) is provably invisible to them. This is the constellation-
    * map idea of audio fingerprinting (Wang's Shazam design, applied
    * to the harness byte stand-in): overlapping frames (width 16,
    * hop 8) hash to a per-frame digest; a LANDMARK is the combined
    * hash of frame t and frame t+3 — a RELATIVE pair, so a clip
    * shifted by any whole number of hops yields the same landmark
    * set; two clips match when they share ≥5 landmarks covering ≥50%
    * of the smaller set. Planted: audio assets (≥120 bytes) re-
    * ingested under fresh ids with the first hop (8 bytes) dropped —
    * every frame shifts one slot, byte-prefix and tile-grid
    * fingerprints all change, the landmark set barely moves.
    *
    * Overly common landmarks (the synthetic corpus repeats 16-byte
    * runs across docs) are dropped at document-frequency > 8 before
    * the pair join — the stop-landmark discipline real audio indexes
    * use, and the same hot-key bound t35/d3 rely on: bucket size is
    * capped, so the within-key pair work cannot go quadratic in the
    * corpus.
    *
    * Scale shape: frames/landmarks are row-local two-level transforms
    * (each frame digested ONCE — mm7's rule); the exchange carries
    * (key, doc_id, n_lm) longs; df-filter is one map-side-combinable
    * groupBy; the pair join is keyed with df-bounded buckets. Nothing
    * pairwise corpus-wide, nothing driver-side.
    */
  private def mm8AudioDedup(s: SparkSession, d: String): DataFrame = {
    val audio = graft.Tables.fanOut(Tables.documents(s, d))
      .filter(col("doc_id") % 3 === 1) // the audio modality of assets()
      .select(col("doc_id"), col("text"))
    val planted = audio
      .filter(col("doc_id") < 60 && length(col("text")) >= 120)
      .select((col("doc_id") + 9000000L).as("doc_id"),
        expr("substr(text, 9)").as("text"))
    // one fingerprint pass feeds the df filter AND both join sides
    // (mm7's checkpoint pattern): without the barrier the hs chain
    // re-runs for every consumer — and still ~5× per row inside, since
    // lmExpr's CASE/size/slice references each inline a copy
    val lmDocs = mm8Fingerprints(audio.unionByName(planted))
      .localCheckpoint(true)
    val (out, live) = mm8Pairs(lmDocs)
    // unpersist in finally: a failed checkpoint must not leak the
    // landmark cache into the long-lived bench JVM
    try out.localCheckpoint(true)
    finally live.unpersist(blocking = false)
  }

  /** The landmark-fingerprint phase over `(doc_id, text)` rows —
    * split from the gate so specs can run it over locally synthesized
    * audio with construction-derived exact expectations.
    *
    * Each frame is digested and hashed ONCE, via lambda-bound values
    * only (mm7's two-level rule, and then some): referencing a frame
    * COLUMN inside an interpreted HOF lambda is a trap — projection
    * collapse inlines the whole frame-transform into EVERY reference,
    * and the first version of this query re-digested each frame
    * hundreds of times (238 s at sf0.1; 1.3 s after this shape).
    * `hs` binds the digest as the outer lambda's variable; the
    * landmark pairing is a zip_with of two slices, whose lambda sees
    * two already-hashed longs. Arithmetic stays under 2^52:
    * hs < 2^31, × 1000003 < 2^51.
    */
  private[ops] def mm8Fingerprints(docs: DataFrame): DataFrame = {
    val P = graft.ops.Dedup.P
    def ph(e: String) = graft.ops.Text.polyHashSql(e, 8)
    val hsExpr =
      s"""CASE WHEN length(text) >= 16 THEN
         |  transform(
         |    transform(sequence(0, CAST((length(text) - 16) DIV 8 AS INT)),
         |      t -> md5(substr(text, 1 + t * 8, 16))),
         |    dg -> (${ph("dg")}) % $P)
         |ELSE CAST(array() AS ARRAY<BIGINT>) END""".stripMargin
    val lmExpr =
      s"""CASE WHEN size(hs) >= 4 THEN
         |  array_distinct(zip_with(
         |    slice(hs, 1, size(hs) - 3),
         |    slice(hs, 4, size(hs) - 3),
         |    (x, y) -> (x * 1000003 + y) % $P))
         |ELSE CAST(array() AS ARRAY<BIGINT>) END""".stripMargin
    docs
      .withColumn("hs", expr(hsExpr))
      .withColumn("lms", expr(lmExpr))
      .select(col("doc_id"), size(col("lms")).as("n_lm"), col("lms"))
  }

  /** The lazy landmark-pair phase over a fingerprinted frame
    * `(doc_id, n_lm, lms)` — split from the gate so [[PlanAuditSpec]]
    * can read the physical plan that actually runs (the gate's eager
    * checkpoint would reduce the explain to a checkpoint scan).
    * Returns (result, persisted live-landmark handle for the caller
    * to unpersist after materializing).
    */
  private[ops] def mm8Pairs(lmDocs: DataFrame): (DataFrame, DataFrame) = {
    val exploded = lmDocs
      .select(col("doc_id"), col("n_lm"), explode(col("lms")).as("key"))
    val live = exploded
      .join(exploded.groupBy("key")
        .agg(countDistinct(col("doc_id")).as("dfk"))
        .filter(col("dfk") <= 8)
        .select("key"), Seq("key"))
      .persist()
    val out = live.as("a")
      .join(live.as("b"),
        col("a.key") === col("b.key") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        col("a.n_lm").as("n_a"), col("b.n_lm").as("n_b"))
      .agg(count(lit(1)).as("n_shared"))
      .withColumn("ratio",
        col("n_shared").cast("double") / least(col("n_a"), col("n_b")))
      .filter(col("n_shared") >= 5 && col("ratio") >= 0.5)
      .select("id_a", "id_b", "n_shared", "n_a", "n_b", "ratio")
      .orderBy("id_a", "id_b")
    (out, live)
  }

  private val mm8Oracle: String = {
    val P = graft.ops.Dedup.P
    def ph(e: String) = graft.ops.Text.polyHashSql(e, 8)
    s"""WITH audio AS (
       |  SELECT doc_id, text FROM documents WHERE doc_id % 3 = 1
       |  UNION ALL
       |  SELECT doc_id + 9000000, substr(text, 9) FROM documents
       |  WHERE doc_id % 3 = 1 AND doc_id < 60 AND length(text) >= 120),
       |fr AS (
       |  SELECT doc_id, list_transform(generate_series(0, (length(text) - 16) // 8),
       |           t -> md5(substr(text, 1 + t * 8, 16))) AS fr
       |  FROM audio WHERE length(text) >= 16),
       |lm AS (
       |  SELECT doc_id, list_distinct(list_transform(generate_series(1, len(fr) - 3),
       |           t -> (((${ph("fr[t]")}) % $P) * 1000003
       |               + ((${ph("fr[t+3]")}) % $P)) % $P)) AS lms
       |  FROM fr WHERE len(fr) >= 4),
       |ex AS (
       |  SELECT doc_id, CAST(len(lms) AS INT) AS n_lm, unnest(lms) AS key FROM lm),
       |keep AS (SELECT key FROM ex GROUP BY key HAVING count(DISTINCT doc_id) <= 8),
       |live AS (SELECT ex.* FROM ex JOIN keep USING (key))
       |SELECT id_a, id_b, n_shared, n_a, n_b,
       |       CAST(n_shared AS DOUBLE) / least(n_a, n_b) AS ratio
       |FROM (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |         a.n_lm AS n_a, b.n_lm AS n_b,
       |         CAST(count(*) AS BIGINT) AS n_shared
       |  FROM live a JOIN live b ON a.key = b.key AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2, 3, 4)
       |WHERE n_shared >= 5 AND CAST(n_shared AS DOUBLE) / least(n_a, n_b) >= 0.5
       |ORDER BY id_a, id_b""".stripMargin
  }

  // ---- mm9: shot/scene segmentation over the frame stream -----------------

  /** Scene-change detection — the segmentation step a video curation
    * pipeline runs BEFORE frame sampling (sample per shot, not per
    * fixed stride, or a long static shot floods the batch with
    * near-identical frames while a fast cut sequence is missed).
    * Detector: per-frame 32-bit perceptual fingerprint, Hamming
    * distance to the previous frame, a cut wherever distance exceeds
    * the threshold; scenes are the islands between cuts, each
    * reported with its start frame, length, and keyframe fingerprint.
    *
    * Stand-in codec (family stub contract — reproduce the
    * DISCRIMINATION property, not just arithmetic shape): the decoded
    * frame stream of a video is its 16-byte slices each held for a
    * content-dependent shot length (2–5 frames, from the slice's
    * first byte), the way real footage holds a shot across many
    * near-identical frames. Within a shot the fingerprint is
    * identical (Hamming 0); across a cut the 32 md5-parity coins are
    * independent (expected Hamming 16, P(≤6) ≈ 1e-5) — so the
    * detector must RECOVER the planted shot structure from the frame
    * stream alone, and the oracle checks it does. The fingerprint is
    * computed once per SLICE (≤12 per asset) and inherited by its
    * frames; the parity bits hash lambda-bound digests only (mm7's
    * two-level rule — a column reference inside an interpreted HOF
    * lambda re-evaluates its whole chain per element).
    *
    * Scale shape: slice/frame explosion and fingerprinting are
    * row-local projections; the only exchanges are the per-asset
    * windows (frame order, cut cumsum), partitioned by doc_id with
    * per-asset work bounded by frames-per-asset — a codec-bounded
    * constant, never corpus-shaped. No joins, nothing pairwise, and
    * scene rows out are ~an order smaller than frame rows in.
    */
  /** The frame/scene chain shared by mm9 (segmentation rollup) and
    * mm14 (keyframe election): synthetic shot structure → per-frame
    * fingerprints → Hamming-cut scene ids. One Spark block and one
    * oracle fragment ([[mm9SceneChainSql]]) serve both gates, so the
    * two cannot diverge (the mm7/mm12 shared-digest discipline).
    * Returns `(doc_id, frame_idx, fp, scene_id)`.
    */
  private def sceneFrames(s: SparkSession, d: String): DataFrame = {
    def ph(e: String) = graft.ops.Text.polyHashSql(e, 8)
    // 32 independent md5-parity coins per slice, assembled LSB-first;
    // digests are bound through the zip_with lambda so each is
    // computed exactly once
    val fpExpr =
      s"""aggregate(
         |  zip_with(
         |    transform(sequence(0, 31), j -> md5(concat(sl, '#', CAST(j AS STRING)))),
         |    sequence(0, 31),
         |    (dg, j) -> ((${ph("dg")}) % 2) * shiftleft(CAST(1 AS BIGINT), j)),
         |  CAST(0 AS BIGINT), (acc, x) -> acc + x)""".stripMargin
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("slice_idx"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val wFrame = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    val wScene = wFrame
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val slices = graft.Tables.fanOut(Tables.documents(s, d))
      .filter(col("doc_id") % 3 === 2 && length(col("text")) >= 16)
      .select(col("doc_id"), col("text"),
        least(lit(12), (length(col("text")) / 16).cast("int")).as("n_slices"))
      .select(col("doc_id"),
        posexplode(sequence(lit(0), col("n_slices") - 1)).as(Seq("p", "slice_idx")),
        col("text"))
      .select(col("doc_id"), col("slice_idx"),
        expr("substr(text, 1 + 16 * slice_idx, 16)").as("sl"))
      .select(col("doc_id"), col("slice_idx"), col("sl"),
        (lit(2) + expr("ascii(substr(sl, 1, 1))") % 4).as("shot_len"),
        expr(fpExpr).as("fp"))
    val frames = slices
      .withColumn("st", coalesce(sum(col("shot_len")).over(wCum), lit(0L)))
      .select(col("doc_id"), col("fp"),
        posexplode(sequence(lit(1), col("shot_len"))).as(Seq("p2", "rep")),
        col("st"))
      .select(col("doc_id"), (col("st") + col("rep")).cast("long").as("frame_idx"),
        col("fp"))
    frames
      .withColumn("prev_fp", lag(col("fp"), 1).over(wFrame))
      .withColumn("cut",
        when(col("prev_fp").isNull, 1)
          .when(bit_count(expr("fp ^ prev_fp")) > 6, 1).otherwise(0))
      .withColumn("scene_id", sum(col("cut")).over(wScene).cast("long"))
      .select("doc_id", "frame_idx", "fp", "scene_id")
  }

  private def mm9SceneDetect(s: SparkSession, d: String): DataFrame =
    sceneFrames(s, d)
      .groupBy(col("doc_id"), col("scene_id"))
      .agg(
        min(col("frame_idx")).as("start_frame"),
        count(lit(1)).as("n_frames"),
        min_by(col("fp"), col("frame_idx")).as("key_fp"))
      .orderBy("doc_id", "scene_id")

  /** The oracle-side twin of [[sceneFrames]]: the CTE chain ending in
    * `scn(doc_id, frame_idx, fp, scene_id)`, shared by mm9 and mm14.
    */
  private val mm9SceneChainSql: String = {
    def ph(e: String) = graft.ops.Text.polyHashSql(e, 8)
    s"""vids AS (
       |  SELECT doc_id, text,
       |         least(12, CAST(length(text) // 16 AS INT)) AS n_slices
       |  FROM documents WHERE doc_id % 3 = 2 AND length(text) >= 16),
       |slices AS (
       |  SELECT doc_id, slice_idx, substr(text, 1 + 16 * slice_idx, 16) AS sl
       |  FROM (SELECT doc_id, text,
       |               unnest(generate_series(0, n_slices - 1)) AS slice_idx
       |        FROM vids)),
       |fps AS (
       |  SELECT doc_id, slice_idx,
       |         2 + ascii(substr(sl, 1, 1)) % 4 AS shot_len,
       |         CAST(list_sum(list_transform(generate_series(0, 31),
       |           j -> ((${ph("md5(sl || '#' || CAST(j AS VARCHAR))")}) % 2)
       |                * (CAST(1 AS BIGINT) << j))) AS BIGINT) AS fp
       |  FROM slices),
       |offs AS (
       |  SELECT doc_id, slice_idx, fp, shot_len,
       |         COALESCE(sum(shot_len) OVER (PARTITION BY doc_id ORDER BY slice_idx
       |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS st
       |  FROM fps),
       |reps AS (
       |  SELECT doc_id, st, fp,
       |         unnest(generate_series(1, shot_len)) AS rep
       |  FROM offs),
       |frames AS (
       |  SELECT doc_id, CAST(st + rep AS BIGINT) AS frame_idx, fp FROM reps),
       |cuts AS (
       |  SELECT doc_id, frame_idx, fp,
       |         CASE WHEN lag(fp) OVER w IS NULL THEN 1
       |              WHEN bit_count(xor(fp, lag(fp) OVER w)) > 6 THEN 1
       |              ELSE 0 END AS cut
       |  FROM frames WINDOW w AS (PARTITION BY doc_id ORDER BY frame_idx)),
       |scn AS (
       |  SELECT doc_id, frame_idx, fp,
       |         CAST(sum(cut) OVER (PARTITION BY doc_id ORDER BY frame_idx
       |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS scene_id
       |  FROM cuts)""".stripMargin
  }

  private val mm9Oracle: String =
    s"""WITH $mm9SceneChainSql
       |SELECT doc_id, scene_id, min(frame_idx) AS start_frame,
       |       count(*) AS n_frames, arg_min(fp, frame_idx) AS key_fp
       |FROM scn GROUP BY doc_id, scene_id ORDER BY doc_id, scene_id""".stripMargin

  // ---- mm14: keyframe election per scene (bit-majority centroid) ----------

  /** Pick each scene's REPRESENTATIVE frame — the keyframe a video
    * training pipeline keeps when it samples one frame per shot
    * (what mm9's `key_fp = first frame` approximates). Election is
    * medoid-style: the scene's 32-bit fingerprint CENTROID is the
    * per-bit majority vote across its frames, and the keyframe is the
    * frame with minimum Hamming distance to that centroid (ties →
    * earliest frame) — robust to a transient mid-shot frame in a way
    * first-frame selection is not.
    *
    * Scale shape: rides [[sceneFrames]] (doc-keyed windows), then one
    * bounded explode (32 bit positions × frames-per-doc ≤ 12·5) into
    * two (doc, scene)-keyed aggregations and a (doc, scene) equi-join
    * back to frames — every exchange keys on doc_id-derived columns;
    * nothing global, nothing all-pairs.
    */
  private def mm14Keyframes(s: SparkSession, d: String): DataFrame = {
    // The bit-majority centroid is a pure per-(doc, scene) fold, so it
    // rides 32 window sums over ONE scene-keyed window instead of a
    // 32-way bit explode into two grouped aggregations joined back to
    // the frames: the explode (32× the frame rows), both aggregation
    // exchanges, the join, and the two-consumer checkpoint all
    // disappear — and since [[sceneFrames]] leaves the frames
    // hash-partitioned by doc_id, hash(doc_id) already satisfies the
    // (doc_id, scene_id) clustering (subset rule), so the election
    // needs no new exchange at all: centroid, Hamming vote, and the
    // rank-1 pick are one sort on the standing doc layout.
    import org.apache.spark.sql.expressions.Window
    val wScene = Window.partitionBy(col("doc_id"), col("scene_id"))
    val onesCols = (0 until 32).map(j =>
      sum(expr(s"shiftright(fp, $j) & 1")).over(wScene).as(s"ones$j"))
    val centroid = (0 until 32).map(j =>
      when(col(s"ones$j") * 2 > col("nf"),
        expr(s"shiftleft(CAST(1 AS BIGINT), $j)")).otherwise(0L))
      .reduce(_ + _)
    val wElect = wScene.orderBy(col("ham"), col("frame_idx"))
    sceneFrames(s, d)
      .select(Seq(col("doc_id"), col("scene_id"), col("frame_idx"), col("fp"),
        count(lit(1)).over(wScene).as("nf")) ++ onesCols: _*)
      .withColumn("centroid_fp", centroid)
      .withColumn("ham", bit_count(expr("fp ^ centroid_fp")).cast("int"))
      .withColumn("rk", row_number().over(wElect))
      .filter(col("rk") === 1)
      .select(col("doc_id"), col("scene_id"),
        col("frame_idx").as("key_frame"), col("fp").as("key_fp"),
        col("centroid_fp"), col("ham").as("key_ham"))
      .orderBy("doc_id", "scene_id")
  }

  private val mm14Oracle: String =
    s"""WITH $mm9SceneChainSql,
       |bits AS (
       |  SELECT doc_id, scene_id, fp,
       |         unnest(generate_series(0, 31)) AS j
       |  FROM scn),
       |cent AS (
       |  SELECT doc_id, scene_id,
       |         CAST(sum(CASE WHEN ones * 2 > n
       |                       THEN (CAST(1 AS BIGINT) << CAST(j AS INT))
       |                       ELSE 0 END) AS BIGINT) AS centroid_fp
       |  FROM (SELECT doc_id, scene_id, j,
       |               sum((fp >> CAST(j AS INT)) & 1) AS ones, count(*) AS n
       |        FROM bits GROUP BY 1, 2, 3)
       |  GROUP BY 1, 2),
       |sel AS (
       |  SELECT s.doc_id, s.scene_id, s.frame_idx, s.fp, c.centroid_fp,
       |         CAST(bit_count(xor(s.fp, c.centroid_fp)) AS INT) AS ham,
       |         row_number() OVER (PARTITION BY s.doc_id, s.scene_id
       |           ORDER BY bit_count(xor(s.fp, c.centroid_fp)), s.frame_idx) AS rk
       |  FROM scn s JOIN cent c USING (doc_id, scene_id))
       |SELECT doc_id, scene_id, frame_idx AS key_frame, fp AS key_fp,
       |       centroid_fp, ham AS key_ham
       |FROM sel WHERE rk = 1 ORDER BY doc_id, scene_id""".stripMargin

  // ---- mm10: image-caption pair curation (the paired-dataset step) --------

  /** Curation of PAIRED multimodal data — the LAION-style pipeline
    * stage the family lacked: single-modality dedup (mm4/mm7) and
    * quality gates (t21) operate per asset, but a caption dataset is
    * curated per (image, text) PAIR: drop pairs whose caption does
    * not describe the image (the CLIP-score gate), then collapse
    * pixel-duplicate images keeping the best-captioned copy (LAION
    * dedups by image hash so one image never contributes many
    * near-identical training pairs).
    *
    * Stand-ins (family stub contract — discrimination preserved):
    * the caption of doc i is the first 12 words of doc i's text
    * (alt-text derived from content), and the alignment score is
    * 4-gram containment of the caption in the image's content —
    * integer-exact (one division), 1.0 by construction for a true
    * caption, ~0 for a planted swap (the 31-word fixture vocabulary
    * makes unigram overlap useless, which is exactly why the score
    * uses 4-grams: chance containment needs a shared 4-word run).
    * Planted misaligned pairs carry a far doc's caption and must
    * drop; planted re-ingests of the first 7 images arrive under
    * fresh ids with identical pixels and equal-quality captions, so
    * the per-fingerprint election keeps exactly the lowest id
    * (score-first election — a better-captioned copy WOULD win).
    *
    * Scale shape: grams are row-local native-expression projections
    * (PolyGrams — the d6 lesson: the HOF formulation is quadratic);
    * the caption fetch is one keyed equi-join; the dedup election is
    * a window over the md5 pixel fingerprint (mm7's perceptual fp
    * slots into the same key for near-dup grouping); the status join
    * is keyed on the unique pair id. Nothing pairwise, no text keys
    * on any exchange.
    */
  private def mm10PairCuration(s: SparkSession, d: String): DataFrame = {
    import graft.functions.SimHashFunctions.poly_grams
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val imgs0 = docs.filter(col("doc_id") % 3 === 0) // the image modality of assets()
    val caps = docs.select(col("doc_id").as("cap_id"),
      concat_ws(" ", slice(Text.wordsCol(col("text")), 1, 12)).as("cap_text"))
    val pairs = imgs0.select(col("doc_id").as("img_id"), col("text"),
        col("doc_id").as("cap_id"))
      .unionByName(imgs0.filter(col("doc_id") >= 30 && col("doc_id") < 60)
        .select((col("doc_id") + 2000000L).as("img_id"), col("text"),
          (col("doc_id") + 9L).as("cap_id")))
      .unionByName(imgs0.filter(col("doc_id") < 21)
        .select((col("doc_id") + 4000000L).as("img_id"), col("text"),
          col("doc_id").as("cap_id")))
    val scored = pairs
      .withColumn("fp", md5(col("text")))
      .withColumn("gi", poly_grams(Text.wordsCol(col("text")), 4))
      .join(caps.withColumn("gcap", poly_grams(Text.wordsCol(col("cap_text")), 4))
        .select("cap_id", "gcap"), Seq("cap_id"))
      .filter(size(col("gcap")) >= 1)
      .withColumn("n_hit", size(array_intersect(col("gcap"), col("gi"))))
      .withColumn("n_cap", size(col("gcap")))
      .withColumn("score", col("n_hit").cast("double") / col("n_cap"))
      .select("img_id", "cap_id", "fp", "n_hit", "n_cap", "score")
    val wElect = org.apache.spark.sql.expressions.Window
      .partitionBy(col("fp")).orderBy(col("score").desc, col("img_id"))
    val ranked = scored.filter(col("score") >= 0.5)
      .withColumn("rnk", row_number().over(wElect))
      .select(col("img_id"), col("rnk"))
    scored.join(ranked, Seq("img_id"), "left")
      .withColumn("status",
        when(col("score") < 0.5, "dropped_misaligned")
          .when(col("rnk") === 1, "admitted")
          .otherwise("dup_loser"))
      .select("img_id", "cap_id", "n_hit", "n_cap", "score", "status")
      .orderBy("img_id")
  }

  private val mm10Oracle: String = {
    val ws = graft.ops.Text.wordsSql("text")
    val P = graft.ops.Dedup.P
    def gram4(hw: String, i: String) =
      (1 until 4).foldLeft(s"$hw[$i]")((acc, k) => s"(($acc) * 1000003 + $hw[$i+$k]) % $P")
    def gramsOf(textCol: String) =
      s"""list_distinct(list_transform(
         |  generate_series(1, greatest(len(list_transform($textCol, w -> ${graft.ops.Text.polyHashSql("w", 8)})) - 3, 0)),
         |  i -> ${gram4(s"list_transform($textCol, w -> ${graft.ops.Text.polyHashSql("w", 8)})", "i")}))""".stripMargin
    s"""WITH docs AS (SELECT doc_id, text FROM documents),
       |caps AS (
       |  SELECT doc_id AS cap_id,
       |         ${gramsOf("ws[1:12]")} AS gcap
       |  FROM (SELECT doc_id, $ws AS ws FROM documents)),
       |imgs AS (
       |  SELECT doc_id AS img_id, text, doc_id AS cap_id FROM docs WHERE doc_id % 3 = 0
       |  UNION ALL
       |  SELECT doc_id + 2000000, text, doc_id + 9 FROM docs
       |  WHERE doc_id % 3 = 0 AND doc_id >= 30 AND doc_id < 60
       |  UNION ALL
       |  SELECT doc_id + 4000000, text, doc_id FROM docs
       |  WHERE doc_id % 3 = 0 AND doc_id < 21),
       |scored AS (
       |  SELECT img_id, p.cap_id, md5(p.text) AS fp,
       |         CAST(len(list_intersect(c.gcap, ${gramsOf(s"($ws)")})) AS INT) AS n_hit,
       |         CAST(len(c.gcap) AS INT) AS n_cap,
       |         CAST(len(list_intersect(c.gcap, ${gramsOf(s"($ws)")})) AS DOUBLE)
       |           / len(c.gcap) AS score
       |  FROM imgs p JOIN caps c ON c.cap_id = p.cap_id
       |  WHERE len(c.gcap) >= 1),
       |ranked AS (
       |  SELECT img_id,
       |         CAST(row_number() OVER (PARTITION BY fp ORDER BY score DESC, img_id) AS INT) AS rnk
       |  FROM scored WHERE score >= 0.5)
       |SELECT s.img_id, s.cap_id, s.n_hit, s.n_cap, s.score,
       |       CASE WHEN s.score < 0.5 THEN 'dropped_misaligned'
       |            WHEN r.rnk = 1 THEN 'admitted'
       |            ELSE 'dup_loser' END AS status
       |FROM scored s LEFT JOIN ranked r ON r.img_id = s.img_id
       |ORDER BY s.img_id""".stripMargin
  }

  // ---- mm11: interleaved image-text sequence assembly ----------------------

  /** The MMC4/OBELICS assembly step — the last transform before a
    * multimodal training run: each document becomes ONE ordered
    * sequence of segments, text chunks interleaved with image
    * placeholders, with per-segment token costs and cumulative
    * offsets (what the packer/loader consumes). Text is cut into
    * 8-word chunks (t29's idiom); a document's image (the separate
    * asset store contributes it via a doc_id equi-join — only
    * `doc_id % 3 = 0` docs have one) is spliced at the deterministic
    * slot `doc_id % (n_chunks + 1)`, shifting later chunks by one.
    * An image costs a fixed 576 tokens — the ViT patch-token count a
    * vision encoder bills per image — so `offset` prices the real
    * context-window budget, which is the number packing decisions are
    * made on.
    *
    * Scale shape: one equi-join on doc_id (co-partitioned key both
    * sides — at 100 TB both stores bucket by doc_id and the join is
    * shuffle-free), a row-local chunk explode, and the per-doc
    * running-offset window partitioned by doc_id — no global sort, no
    * wide exchange; segment payloads travel as md5 digests.
    */
  private def mm11Interleave(s: SparkSession, d: String): DataFrame = {
    val imgs = assets(s, d).toDF().filter(col("modality") === "image")
      .select(col("doc_id"), lit(1).as("is_img"))
    val docs = Tables.documents(s, d)
      .withColumn("ws", Text.wordsCol(col("text")))
      .withColumn("n_words", size(col("ws")))
      .withColumn("n_chunks", expr("CAST((n_words + 7) DIV 8 AS INT)"))
      .join(imgs, Seq("doc_id"), "left")
      .withColumn("img_pos",
        when(col("is_img").isNotNull,
          (col("doc_id") % (col("n_chunks") + 1)).cast("int")).otherwise(lit(-1)))
    // n_chunks >= 1 guard: Spark's sequence(0, -1) yields a DESCENDING
    // [0, -1] (two phantom chunks) for a zero-word document, while the
    // oracle's generate_series(0, -1) is empty — an empty doc has no
    // text segments on either engine only with the explicit filter
    val textSegs = docs
      .filter(col("n_chunks") >= 1)
      .select(col("doc_id"), col("ws"), col("img_pos"),
        explode(expr("sequence(0, n_chunks - 1)")).as("chunk_id"))
      .select(
        col("doc_id"),
        (col("chunk_id") + when(col("chunk_id") >= col("img_pos") && col("img_pos") >= 0, 1)
          .otherwise(0)).cast("int").as("seq"),
        lit("text").as("kind"),
        expr("size(slice(ws, chunk_id * 8 + 1, 8))").as("n_tokens"),
        md5(expr("array_join(slice(ws, chunk_id * 8 + 1, 8), ' ')")).as("seg_md5"))
    val imgSegs = docs.filter(col("img_pos") >= 0)
      .select(col("doc_id"), col("img_pos").as("seq"), lit("image").as("kind"),
        lit(576).as("n_tokens"), md5(col("text")).as("seg_md5"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("seq"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    textSegs.unionByName(imgSegs)
      .withColumn("tok_off", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .orderBy("doc_id", "seq")
  }

  private val mm11Oracle: String = {
    val ws = Text.wordsSql("text")
    s"""WITH d2 AS (
       |  SELECT doc_id, text, ws, CAST(len(ws) AS INT) AS n_words,
       |         CAST((len(ws) + 7) // 8 AS INT) AS n_chunks
       |  FROM (SELECT doc_id, text, $ws AS ws FROM documents)),
       |d3 AS (
       |  SELECT *, CASE WHEN doc_id % 3 = 0
       |                 THEN CAST(doc_id % (n_chunks + 1) AS INT)
       |                 ELSE -1 END AS img_pos
       |  FROM d2),
       |tsegs AS (
       |  SELECT doc_id,
       |         CAST(c + CASE WHEN c >= img_pos AND img_pos >= 0 THEN 1 ELSE 0 END AS INT) AS seq,
       |         'text' AS kind,
       |         CAST(len(list_slice(ws, c * 8 + 1, c * 8 + 8)) AS INT) AS n_tokens,
       |         md5(array_to_string(list_slice(ws, c * 8 + 1, c * 8 + 8), ' ')) AS seg_md5
       |  FROM (SELECT doc_id, ws, img_pos,
       |               unnest(generate_series(0, n_chunks - 1)) AS c
       |        FROM d3)),
       |isegs AS (
       |  SELECT doc_id, img_pos AS seq, 'image' AS kind,
       |         CAST(576 AS INT) AS n_tokens, md5(text) AS seg_md5
       |  FROM d3 WHERE img_pos >= 0),
       |segs AS (SELECT * FROM tsegs UNION ALL SELECT * FROM isegs)
       |SELECT doc_id, seq, kind, n_tokens, seg_md5,
       |       CAST(coalesce(sum(n_tokens) OVER (PARTITION BY doc_id ORDER BY seq
       |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_off
       |FROM segs ORDER BY doc_id, seq""".stripMargin
  }

  // ---- mm12: streaming image ingestion against a growing fp index ---------

  /** The streaming-ingest member of the image family — d12's loop
    * (text MinHash) and s17's (vector cells) applied to PERCEPTUAL
    * fingerprints, completing the ingestion-time dedup triangle: as
    * image waves arrive, each micro-batch fingerprints its assets
    * (the mm7 tile-digest bits), probes the ON-DISK band/fingerprint
    * index for retouched re-ingests (Hamming ≤ 6 after a banded
    * candidate cut), and appends itself so later waves — and
    * restarted sessions — see it. Wave 2 re-ingests a WAVE-1 image,
    * so its match proves mid-stream index growth; all planted ids
    * shift by multiples of 40 × 10⁵ (≡ 0 mod 8 and mod 5), keeping
    * the id-derived tile geometry — and so the fingerprints — aligned
    * with their originals.
    *
    * Scale shape per wave: fingerprinting is one scan projection over
    * the batch; the probe joins the batch's bands BROADCAST against
    * the standing band table (ids only — fingerprint arrays never
    * shuffle, mm7's contract); the bit-level verify fetches arrays
    * for the tiny candidate set. The index is appendable parquet —
    * no executor memory held between waves.
    */
  private def mm12StreamImageDedup(s: SparkSession, d: String): DataFrame = {
    val idx = java.nio.file.Files.createTempDirectory("graft-mm12-idx-")
    try mm12WithIndex(s, d, idx.toString)
    finally graft.Fs.deleteRecursively(idx)
  }

  private[graft] def mm12WithIndex(s: SparkSession, d: String, idxDir: String): DataFrame = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    val idxFps = s"$idxDir/fps"
    val idxBands = s"$idxDir/bands"
    val imgs = graft.Tables.fanOut(Tables.documents(s, d)).filter(col("doc_id") % 3 === 0)
      .select("doc_id", "text")
    def retouch(rows: Array[org.apache.spark.sql.Row], shift: Long) =
      rows.map(r => Dedup.NewDoc(shift + r.getLong(0), "Z" + r.getString(1).substring(1)))
    val seed = imgs.filter(col("doc_id") < 15).collect().sortBy(_.getLong(0))
    val wave1 = retouch(seed.take(2), 8000000L)
    // wave 2: one retouch of a corpus image wave 1 did NOT touch, and
    // one EXACT re-ingest of a wave-1 asset (the growth proof: its
    // match target entered the index mid-stream)
    val wave2 = retouch(seed.slice(2, 3), 8000000L) :+
      Dedup.NewDoc(9000000L + seed.head.getLong(0), wave1.head.text)
    if (!new java.io.File(idxFps).isDirectory) {
      val fps = imageFps(imgs)
      fps.select("doc_id", "bits").write.mode("overwrite").parquet(idxFps)
      fps.select(col("doc_id"),
        posexplode(array(col("b0"), col("b1"), col("b2"), col("b3")))
          .as(Seq("band_idx", "key")))
        .write.mode("overwrite").parquet(idxBands)
    }
    val matches = scala.collection.mutable.ArrayBuffer[(Int, Long, Long, Int)]()
    var nWaves = 0
    val ckpt = java.nio.file.Files.createTempDirectory("graft-mm12-")
    try {
      val input = MemoryStream[Dedup.NewDoc](
        org.apache.spark.sql.Encoders.product[Dedup.NewDoc], s)
      val q = input.toDS().writeStream
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[Dedup.NewDoc], _: Long) =>
            if (!batch.isEmpty) {
              nWaves += 1
              val newFps = imageFps(batch.toDF())
              val newBands = newFps.select(col("doc_id").as("new_id"),
                posexplode(array(col("b0"), col("b1"), col("b2"), col("b3")))
                  .as(Seq("band_idx", "key")))
              val out = s.read.parquet(idxBands)
                .join(broadcast(newBands), Seq("band_idx", "key"))
                .select(col("new_id"), col("doc_id").as("matched_id"))
                .dropDuplicates("new_id", "matched_id")
                .join(broadcast(newFps.select(col("doc_id").as("new_id"),
                  col("bits").as("bits_a"))), Seq("new_id"))
                .join(s.read.parquet(idxFps).select(col("doc_id").as("matched_id"),
                  col("bits").as("bits_b")), Seq("matched_id"))
                .withColumn("hamming", expr(fpHammingSql))
                .filter(col("hamming") <= 6)
                .select("new_id", "matched_id", "hamming")
                .collect()
              matches ++= out.map(r => (nWaves, r.getLong(0), r.getLong(1), r.getInt(2)))
              newFps.select("doc_id", "bits").write.mode("append").parquet(idxFps)
              newFps.select(col("doc_id"),
                posexplode(array(col("b0"), col("b1"), col("b2"), col("b3")))
                  .as(Seq("band_idx", "key")))
                .write.mode("append").parquet(idxBands)
              // small-files backstop: no-op listing under threshold,
              // content-identical fold above it (IndexCompactionSpec)
              IndexCompaction.compact(s, idxFps)
              IndexCompaction.compact(s, idxBands)
              ()
            }
          }
          .option("checkpointLocation", ckpt.toString)
          .start()
      // one long-lived query, one micro-batch per wave (see d12) —
      // the per-wave stream bootstrap drops; batches are identical
      try {
        input.addData(wave1.toSeq); q.processAllAvailable()
        input.addData(wave2.toSeq); q.processAllAvailable()
      } finally q.stop()
    } finally graft.Fs.deleteRecursively(ckpt)
    require(nWaves == 2, s"delivery waves must arrive separately, got $nWaves")
    import s.implicits._
    matches.toSeq.toDF("wave", "new_id", "matched_id", "hamming")
      .orderBy("wave", "new_id", "matched_id")
  }

  private val mm12Oracle: String =
    s"""WITH seedsrc AS (
       |  SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0 AND doc_id < 15
       |  ORDER BY doc_id LIMIT 3),
       |w1 AS (
       |  SELECT doc_id + 8000000 AS doc_id, 'Z' || substr(text, 2) AS text
       |  FROM seedsrc WHERE doc_id IN (SELECT doc_id FROM seedsrc ORDER BY doc_id LIMIT 2)),
       |w2 AS (
       |  SELECT doc_id + 8000000 AS doc_id, 'Z' || substr(text, 2) AS text
       |  FROM seedsrc WHERE doc_id = (SELECT max(doc_id) FROM seedsrc)
       |  UNION ALL
       |  SELECT 9000000 + (SELECT min(doc_id) FROM seedsrc),
       |         'Z' || substr((SELECT text FROM seedsrc ORDER BY doc_id LIMIT 1), 2)),
       |img AS (
       |  SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0
       |  UNION ALL SELECT doc_id, text FROM w1
       |  UNION ALL SELECT doc_id, text FROM w2),
       |$duckFpCtes,
       |probe AS (
       |  SELECT 1 AS wave, n.doc_id AS new_id, c.doc_id AS matched_id
       |  FROM bands n JOIN bands c
       |    ON (n.b0 = c.b0 OR n.b1 = c.b1 OR n.b2 = c.b2 OR n.b3 = c.b3)
       |  WHERE n.doc_id IN (SELECT doc_id FROM w1)
       |    AND c.doc_id < 8000000
       |  UNION
       |  SELECT 2, n.doc_id, c.doc_id
       |  FROM bands n JOIN bands c
       |    ON (n.b0 = c.b0 OR n.b1 = c.b1 OR n.b2 = c.b2 OR n.b3 = c.b3)
       |  WHERE n.doc_id IN (SELECT doc_id FROM w2)
       |    AND (c.doc_id < 8000000 OR c.doc_id IN (SELECT doc_id FROM w1)))
       |SELECT wave, new_id, matched_id, hamming FROM (
       |  SELECT p.wave, p.new_id, p.matched_id,
       |         CAST(list_sum(list_transform(generate_series(1, 64),
       |              i -> CASE WHEN x.bits[i] <> y.bits[i] THEN 1 ELSE 0 END)) AS INT)
       |           AS hamming
       |  FROM probe p
       |  JOIN bits x ON x.doc_id = p.new_id
       |  JOIN bits y ON y.doc_id = p.matched_id)
       |WHERE hamming <= 6 ORDER BY wave, new_id, matched_id""".stripMargin

  // ---- mm13: REAL image bytes through the codec seam ----------------------

  /** A real encoded image: genuine PNG bytes in the binary column. */
  final case class MmRealAsset(doc_id: Long, width: Int, height: Int, png: Array[Byte])

  /** Decoded + resized output of the real path — every field is
    * derivable from the planted pixel function, so the oracle checks
    * the full encode→decode→resize chain without a decoder of its own.
    */
  final case class MmRealDecoded(
      doc_id: Long, width: Int, height: Int,
      out_w: Int, out_h: Int, pad_x: Int, pad_y: Int, thumb_checksum: Long)

  /** The planted pixel function: channel values at (x, y) are a
    * closed-form integer function of (doc_id, x, y). This is what
    * makes a REAL codec round-trip oracle-checkable: PNG is lossless,
    * so the decoded pixel must equal the formula exactly, and DuckDB
    * recomputes the downstream thumbnail checksum from the formula
    * with no image library — any encoder or decoder defect (wrong
    * stride, channel swap, color-space bend, truncation) breaks the
    * equality and the gate goes red.
    */
  private[ops] def plantRGB(docId: Long, x: Int, y: Int): Int = {
    val r = ((docId + 2L * x + 3L * y) % 256).toInt
    val g = ((docId * 2 + 5L * x + y) % 256).toInt
    val b = ((docId * 3 + x + 7L * y) % 256).toInt
    (r << 16) | (g << 8) | b
  }

  /** Encode REAL PNGs partition-parallel — `javax.imageio`, pure JVM,
    * one encode context per partition (the JNI-codec shape the stub
    * family documents; here the codec is not a stub).
    */
  def encodeReal(meta: DataFrame): Dataset[MmRealAsset] = {
    import meta.sparkSession.implicits._
    meta.select("doc_id", "width", "height").as[(Long, Int, Int)]
      .mapPartitions { it =>
        it.map { case (id, w, h) =>
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          // fill the raster's backing int[] directly (TYPE_INT_RGB is
          // already packed RGB) — setRGB converts per pixel; the PNG
          // deflate still dominates the leg, this just stops paying
          // twice for the plant
          val buf = img.getRaster.getDataBuffer
            .asInstanceOf[java.awt.image.DataBufferInt].getData
          var y = 0
          while (y < h) {
            val base = y * w
            var x = 0
            while (x < w) { buf(base + x) = plantRGB(id, x, y); x += 1 }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          MmRealAsset(id, w, h, bos.toByteArray)
        }
      }
  }

  /** Decode REAL PNG bytes and run mm6's letterbox + 8×8 thumbnail
    * math over the genuinely decoded pixels — the resize leg with the
    * stub swapped out for `javax.imageio`.
    */
  def decodeReal(assets: Dataset[MmRealAsset]): Dataset[MmRealDecoded] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(a.png))
        require(img != null && img.getWidth == a.width && img.getHeight == a.height,
          s"decode failed for doc ${a.doc_id}")
        val (ow, oh) =
          if (a.width >= a.height) (224, a.height * 224 / a.width)
          else (a.width * 224 / a.height, 224)
        var sum = 0L
        var j = 0
        while (j < 8) {
          val y = j * a.height / 8
          var i = 0
          while (i < 8) {
            val x = i * a.width / 8
            val rgb = img.getRGB(x, y)
            sum = (sum * 31 + ((rgb >> 16) & 0xff)) % 2147483647L
            sum = (sum * 31 + ((rgb >> 8) & 0xff)) % 2147483647L
            sum = (sum * 31 + (rgb & 0xff)) % 2147483647L
            i += 1
          }
          j += 1
        }
        MmRealDecoded(a.doc_id, a.width, a.height, ow, oh, 224 - ow, 224 - oh, sum)
      }
    }
  }

  /** mm13: the image-modality assets as REAL PNGs — encode, decode,
    * letterbox, thumbnail — scan-shaped end to end (two mapPartitions
    * legs, zero shuffles, narrow output; binary payloads never leave
    * their partition).
    */
  private def mm13RealDecode(s: SparkSession, d: String): DataFrame = {
    val meta = assets(s, d).toDF().filter(col("modality") === "image")
      .select("doc_id", "width", "height")
    decodeReal(encodeReal(meta)).toDF().orderBy("doc_id")
  }

  // ---- mm15: the LOSSY codec leg (JPEG) ------------------------------------

  final case class MmJpegStat(
      doc_id: Long, width: Int, height: Int,
      out_w: Int, out_h: Int, pad_x: Int, pad_y: Int,
      n_bytes: Int, mluma_planted: Double, mluma_decoded: Double)

  /** Encode the planted pixel field as REAL JPEGs and decode them
    * back, per partition, carrying the full-image mean luma of BOTH
    * the pre-encode (planted, exact) and post-decode (lossy) pixels —
    * the raw material of mm15's tolerance contract. One task does
    * encode+decode back-to-back (real backfills fuse codec stages the
    * same way: the intermediate bytes are too big to ship).
    */
  private[ops] def jpegStats(meta: DataFrame): Dataset[MmJpegStat] = {
    import meta.sparkSession.implicits._
    meta.select("doc_id", "width", "height").as[(Long, Int, Int)]
      .mapPartitions { it =>
        it.map { case (id, w, h) =>
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var planted = 0.0
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = plantRGB(id, x, y)
              img.setRGB(x, y, rgb)
              planted += 0.299 * ((rgb >> 16) & 0xff) +
                0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "jpg", bos)
          val bytes = bos.toByteArray
          val dec = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          require(dec != null && dec.getWidth == w && dec.getHeight == h,
            s"jpeg decode failed for doc $id")
          var decoded = 0.0
          y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = dec.getRGB(x, y)
              decoded += 0.299 * ((rgb >> 16) & 0xff) +
                0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
              x += 1
            }
            y += 1
          }
          val n = w.toLong * h
          val (ow, oh) = if (w >= h) (224, h * 224 / w) else (w * 224 / h, 224)
          MmJpegStat(id, w, h, ow, oh, 224 - ow, 224 - oh,
            bytes.length, planted / n, decoded / n)
        }
      }
  }

  /** Tolerance band of mm15's contract: the decoded full-image mean
    * luma must sit within ±[[JpegLumaTol]] of the planted mean. JPEG's
    * DC coefficients carry block means nearly unchanged, so the
    * image-wide mean survives quantization far better than any single
    * pixel — ±2 is generous against codec/JRE drift while still
    * catching a broken decode (a channel swap alone moves the planted
    * field's mean by ~double digits).
    */
  private[ops] val JpegLumaTol = 2.0

  /** mm15: mm13's seam where exact pixel recomputation CANNOT work —
    * JPEG is lossy, so no oracle can rebuild the decoded checksum.
    * What IS oracle-predictable: decode success at the planted
    * dimensions, the letterbox math over those dimensions (exact,
    * hash-strict — same closed forms as mm13), that the codec
    * actually compressed (n_bytes < 3·w·h raw), and the tolerance
    * CONTRACT itself — `luma_in_tol` must be 1 (in-band; polarity
    * matches the sibling `compressed` flag, 1 = good) for every
    * asset, which the oracle asserts as a literal while Spark earns
    * it from real decoded pixels. The raw (non-reproducible) luma
    * numbers stay out of the hashed result; the spec bounds them and
    * proves they are genuinely lossy (nonzero error somewhere).
    * Plan shape: identical to mm13 — one mapPartitions codec leg,
    * zero shuffles.
    */
  private def mm15Jpeg(s: SparkSession, d: String): DataFrame = {
    val meta = assets(s, d).toDF().filter(col("modality") === "image")
      .select("doc_id", "width", "height")
    jpegStats(meta).toDF()
      .select(col("doc_id"), col("width"), col("height"),
        col("out_w"), col("out_h"), col("pad_x"), col("pad_y"),
        when(abs(col("mluma_decoded") - col("mluma_planted")) <= JpegLumaTol, 1)
          .otherwise(0).cast("int").as("luma_in_tol"),
        when(col("n_bytes") < col("width") * col("height") * 3, 1)
          .otherwise(0).cast("int").as("compressed"))
      .orderBy("doc_id")
  }

  // ---- mm16: the real AUDIO codec leg (WAV/PCM) ----------------------------

  final case class MmWavStat(
      doc_id: Long, sample_rate: Int, n_samples: Int,
      duration_ms: Long, pcm_checksum: Long)

  /** Closed-form planted 16-bit PCM sample — the audio analogue of
    * [[plantRGB]]: recomputable in SQL, wraps through the full signed
    * range so both byte orders and the sign bit are exercised.
    */
  private[ops] def plantPcm(docId: Long, i: Int): Int =
    (((docId * 31 + i * 7L) % 65536L) - 32768L).toInt

  /** Encode planted PCM as a REAL RIFF/WAV file and decode it back,
    * per partition (`javax.sound.sampled`, pure JVM — the audio
    * analogue of mm13's imageio leg, and the second existence proof
    * that the mm-family's codec seam carries real bytes). WAV is
    * lossless, so the decoded-sample checksum is oracle-exact, like
    * PNG and unlike mm15's JPEG.
    */
  private[ops] def wavStats(meta: DataFrame): Dataset[MmWavStat] = {
    import meta.sparkSession.implicits._
    meta.select("doc_id", "sample_rate", "n_samples").as[(Long, Int, Int)]
      .mapPartitions { it =>
        // Resolve the WAVE codec providers ONCE per partition via the
        // public SPI, and elect the single winning reader on the first
        // row. The AudioSystem statics route every call through
        // JDK13Services.getProviders (class-lock synchronized), and even
        // provider iteration probes SoftMidiAudioFileReader — whose
        // reject path takes a synchronized MidiSystem lookup — before
        // reaching WaveFileReader. Either way 32 executor threads
        // serialize on a global lock per row (measured: the 10× sweep ran
        // this leg at ~1 core, ratio 13×; reader-elected it runs at
        // ~540k rows/s across 32 threads, ~50× the contended path).
        import javax.sound.sampled.spi.{AudioFileReader, AudioFileWriter}
        import scala.jdk.CollectionConverters._
        val wave = javax.sound.sampled.AudioFileFormat.Type.WAVE
        val writer = java.util.ServiceLoader.load(classOf[AudioFileWriter])
          .asScala.find(_.isFileTypeSupported(wave))
          .getOrElse(sys.error("no WAVE AudioFileWriter provider"))
        val readers = java.util.ServiceLoader.load(classOf[AudioFileReader])
          .asScala.toVector
        var elected: AudioFileReader = null
        it.map { case (id, rate, n) =>
          def decode(bytes: Array[Byte]): javax.sound.sampled.AudioInputStream = {
            if (elected != null)
              return elected.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
            readers.iterator.flatMap { r =>
              try {
                val ais = r.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
                elected = r
                Some(ais)
              } catch { case _: javax.sound.sampled.UnsupportedAudioFileException => None }
            }.nextOption().getOrElse(sys.error(s"no provider decodes WAV for doc $id"))
          }
          val pcm = new Array[Byte](2 * n)
          var i = 0
          while (i < n) {
            val s = plantPcm(id, i)
            pcm(2 * i) = (s & 0xff).toByte // little-endian
            pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
            i += 1
          }
          val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
          val bos = new java.io.ByteArrayOutputStream()
          writer.write(
            new javax.sound.sampled.AudioInputStream(
              new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
            wave, bos)
          val wav = bos.toByteArray
          // decode: real header parse, frames streamed back out
          val ais = decode(wav)
          val df2 = ais.getFormat
          require(df2.getSampleRate == rate.toFloat &&
            df2.getSampleSizeInBits == 16 && df2.getChannels == 1,
            s"wav decode format drift for doc $id")
          val back = ais.readAllBytes()
          require(back.length == 2 * n, s"wav decode lost samples for doc $id")
          var sum = 0L
          i = 0
          while (i < n) {
            val lo = back(2 * i) & 0xff
            val hi = back(2 * i + 1)
            val s = (hi << 8) | lo // sign from the high byte
            sum = (sum * 31 + (s + 32768)) % 2147483647L
            i += 1
          }
          MmWavStat(id, rate, n, 1000L * n / rate, sum)
        }
      }
  }

  /** mm16: the audio-modality assets as REAL WAV bytes — encode,
    * header parse, decode, checksum over genuinely decoded samples.
    * Scan-shaped: one mapPartitions leg, zero shuffles, narrow
    * output. The oracle folds the identical rolling checksum over the
    * closed-form planted samples — losslessness is the bridge, mm13's
    * argument on the second modality.
    */
  private def mm16RealAudio(s: SparkSession, d: String): DataFrame = {
    val meta = assets(s, d).toDF().filter(col("modality") === "audio")
      .select(col("doc_id"), col("sample_rate"),
        (lit(400) + (col("doc_id") % 5) * 80).cast("int").as("n_samples"))
    wavStats(meta).toDF().orderBy("doc_id")
  }

  private val mm16Oracle: String =
    """WITH m AS (
      |  SELECT doc_id, 16000 AS sample_rate,
      |         CAST(400 + (doc_id % 5) * 80 AS INT) AS n_samples
      |  FROM documents WHERE doc_id % 3 = 1)
      |SELECT doc_id, sample_rate, n_samples,
      |       CAST(1000 * n_samples // sample_rate AS BIGINT) AS duration_ms,
      |       list_reduce(list_prepend(CAST(0 AS BIGINT),
      |         list_transform(generate_series(0, n_samples - 1),
      |           i -> (doc_id * 31 + i * 7) % 65536)),
      |         (a, b) -> (a * 31 + b) % 2147483647) AS pcm_checksum
      |FROM m ORDER BY doc_id""".stripMargin

  private val mm15Oracle: String =
    """WITH m AS (
      |  SELECT doc_id,
      |         CAST(64 + (doc_id % 8) * 16 AS BIGINT) AS w,
      |         CAST(64 + (doc_id % 5) * 16 AS BIGINT) AS h
      |  FROM documents WHERE doc_id % 3 = 0)
      |SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
      |       CAST(CASE WHEN w >= h THEN 224 ELSE w * 224 // h END AS INT) AS out_w,
      |       CAST(CASE WHEN w >= h THEN h * 224 // w ELSE 224 END AS INT) AS out_h,
      |       CAST(224 - CASE WHEN w >= h THEN 224 ELSE w * 224 // h END AS INT) AS pad_x,
      |       CAST(224 - CASE WHEN w >= h THEN h * 224 // w ELSE 224 END AS INT) AS pad_y,
      |       CAST(1 AS INT) AS luma_in_tol,
      |       CAST(1 AS INT) AS compressed
      |FROM m ORDER BY doc_id""".stripMargin

  private val mm13Oracle: String =
    """WITH m AS (
      |  SELECT doc_id,
      |         CAST(64 + (doc_id % 8) * 16 AS BIGINT) AS w,
      |         CAST(64 + (doc_id % 5) * 16 AS BIGINT) AS h
      |  FROM documents WHERE doc_id % 3 = 0)
      |SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
      |       CAST(CASE WHEN w >= h THEN 224 ELSE w * 224 // h END AS INT) AS out_w,
      |       CAST(CASE WHEN w >= h THEN h * 224 // w ELSE 224 END AS INT) AS out_h,
      |       CAST(224 - CASE WHEN w >= h THEN 224 ELSE w * 224 // h END AS INT) AS pad_x,
      |       CAST(224 - CASE WHEN w >= h THEN h * 224 // w ELSE 224 END AS INT) AS pad_y,
      |       list_reduce(list_prepend(CAST(0 AS BIGINT),
      |         flatten(flatten(
      |           list_transform(generate_series(0, 7), j ->
      |             list_transform(generate_series(0, 7), i -> [
      |               (doc_id + 2 * ((i * w) // 8) + 3 * ((j * h) // 8)) % 256,
      |               (doc_id * 2 + 5 * ((i * w) // 8) + ((j * h) // 8)) % 256,
      |               (doc_id * 3 + ((i * w) // 8) + 7 * ((j * h) // 8)) % 256]))))),
      |         (a, b) -> (a * 31 + b) % 2147483647) AS thumb_checksum
      |FROM m ORDER BY doc_id""".stripMargin

  // ---- mm17: audio resampling through two codec generations ----------------

  final case class MmResampleStat(
    doc_id: Long, in_rate: Int, out_rate: Int, n_in: Int, n_out: Int,
    out_checksum: Long)

  /** Sample-rate conversion on the real-WAV seam — the first DSP
    * transform over genuinely decoded audio (mm16 proves the codec
    * round trip; this transforms between two of them): decode the
    * planted WAV, 2:1 decimation-by-averaging in UNSIGNED sample
    * space (both engines' integer division agrees on non-negatives —
    * the shifted +32768 domain mm16's checksum already uses),
    * re-encode the half-rate PCM as a second REAL WAV, decode THAT,
    * and checksum what comes back. Two full encode/decode generations
    * stand between the plant and the reported checksum; WAV's
    * losslessness keeps the oracle closed-form — it folds the same
    * average over the recomputable plant, never touching a codec.
    *
    * Scale shape: mm16's — one mapPartitions codec leg, provider
    * elected once per partition, zero shuffles, narrow output.
    */
  private[ops] def resampleStats(meta: DataFrame): Dataset[MmResampleStat] = {
    import meta.sparkSession.implicits._
    meta.select("doc_id", "sample_rate", "n_samples").as[(Long, Int, Int)]
      .mapPartitions { it =>
        import javax.sound.sampled.spi.{AudioFileReader, AudioFileWriter}
        import scala.jdk.CollectionConverters._
        val wave = javax.sound.sampled.AudioFileFormat.Type.WAVE
        val writer = java.util.ServiceLoader.load(classOf[AudioFileWriter])
          .asScala.find(_.isFileTypeSupported(wave))
          .getOrElse(sys.error("no WAVE AudioFileWriter provider"))
        val readers = java.util.ServiceLoader.load(classOf[AudioFileReader])
          .asScala.toVector
        var elected: AudioFileReader = null
        def decode(bytes: Array[Byte], id: Long): javax.sound.sampled.AudioInputStream = {
          if (elected != null)
            return elected.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
          readers.iterator.flatMap { r =>
            try {
              val ais = r.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
              elected = r
              Some(ais)
            } catch { case _: javax.sound.sampled.UnsupportedAudioFileException => None }
          }.nextOption().getOrElse(sys.error(s"no provider decodes WAV for doc $id"))
        }
        def encodeWav(pcm: Array[Byte], rate: Int, n: Int): Array[Byte] = {
          val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
          val bos = new java.io.ByteArrayOutputStream()
          writer.write(
            new javax.sound.sampled.AudioInputStream(
              new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
            wave, bos)
          bos.toByteArray
        }
        it.map { case (id, rate, n) =>
          require(n % 2 == 0, s"decimation expects even sample counts, doc $id has $n")
          val pcm = new Array[Byte](2 * n)
          var i = 0
          while (i < n) {
            val s = plantPcm(id, i)
            pcm(2 * i) = (s & 0xff).toByte
            pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
            i += 1
          }
          // generation 1: real encode + decode at the source rate
          val back = decode(encodeWav(pcm, rate, n), id).readAllBytes()
          require(back.length == 2 * n, s"gen-1 decode lost samples for doc $id")
          // 2:1 decimation by pairwise average in unsigned space
          val nOut = n / 2
          val pcm2 = new Array[Byte](2 * nOut)
          var j = 0
          while (j < nOut) {
            def shifted(k: Int): Int = {
              val lo = back(2 * k) & 0xff
              val hi = back(2 * k + 1)
              ((hi << 8) | lo) + 32768
            }
            val avg = (shifted(2 * j) + shifted(2 * j + 1)) / 2 // non-negative
            val s2 = avg - 32768
            pcm2(2 * j) = (s2 & 0xff).toByte
            pcm2(2 * j + 1) = ((s2 >> 8) & 0xff).toByte
            j += 1
          }
          // generation 2: re-encode at half rate, decode, verify header
          val ais2 = decode(encodeWav(pcm2, rate / 2, nOut), id)
          require(ais2.getFormat.getSampleRate == (rate / 2).toFloat,
            s"resampled header rate drift for doc $id")
          val back2 = ais2.readAllBytes()
          require(back2.length == 2 * nOut, s"gen-2 decode lost samples for doc $id")
          var sum = 0L
          j = 0
          while (j < nOut) {
            val lo = back2(2 * j) & 0xff
            val hi = back2(2 * j + 1)
            sum = (sum * 31 + (((hi << 8) | lo) + 32768)) % 2147483647L
            j += 1
          }
          MmResampleStat(id, rate, rate / 2, n, nOut, sum)
        }
      }
  }

  private def mm17Resample(s: SparkSession, d: String): DataFrame = {
    val meta = assets(s, d).toDF().filter(col("modality") === "audio")
      .select(col("doc_id"), col("sample_rate"),
        (lit(400) + (col("doc_id") % 5) * 80).cast("int").as("n_samples"))
    resampleStats(meta).toDF().orderBy("doc_id")
  }

  private val mm17Oracle: String =
    """WITH m AS (
      |  SELECT doc_id, 16000 AS in_rate,
      |         CAST(400 + (doc_id % 5) * 80 AS INT) AS n_in
      |  FROM documents WHERE doc_id % 3 = 1)
      |SELECT doc_id, in_rate, CAST(in_rate // 2 AS INT) AS out_rate, n_in,
      |       CAST(n_in // 2 AS INT) AS n_out,
      |       list_reduce(list_prepend(CAST(0 AS BIGINT),
      |         list_transform(generate_series(0, n_in // 2 - 1),
      |           j -> (((doc_id * 31 + (2 * j) * 7) % 65536)
      |               + ((doc_id * 31 + (2 * j + 1) * 7) % 65536)) // 2)),
      |         (a, b) -> (a * 31 + b) % 2147483647) AS out_checksum
      |FROM m ORDER BY doc_id""".stripMargin

  // ---- mm18: peak-normalization (gain) on the real-WAV seam ----------------

  final case class MmGainStat(
    doc_id: Long, n_samples: Int, peak: Int, new_peak: Int, out_checksum: Long)

  /** Loudness/peak normalization — the gain pass every audio-pretraining
    * pipeline runs before batching (quiet clips drown in the loss; hot
    * clips clip): decode the planted WAV (generation 1), find the
    * per-clip peak deviation from the 16-bit midpoint, rescale every
    * sample to a 30 000-count target peak, re-encode + decode
    * (generation 2), checksum. The rescale is all-integer with an
    * explicit sign split — `sign(dev) · (|dev|·30000 DIV peak)` — so
    * both engines divide non-negative operands and agree exactly
    * (truncating vs flooring division only diverges below zero); WAV
    * losslessness keeps the two-codec-generation oracle closed-form.
    * By construction the max-|dev| sample lands on exactly 30 000
    * (peak·30000 DIV peak), so `new_peak` is the contract the spec
    * pins.
    *
    * Scale shape: mm16/mm17's — one mapPartitions codec leg, provider
    * elected once per partition, per-clip peak found row-locally
    * inside the same pass (no shuffle carries samples), narrow output.
    */
  private[ops] def gainStats(meta: DataFrame): Dataset[MmGainStat] = {
    import meta.sparkSession.implicits._
    meta.select("doc_id", "sample_rate", "n_samples").as[(Long, Int, Int)]
      .mapPartitions { it =>
        import javax.sound.sampled.spi.{AudioFileReader, AudioFileWriter}
        import scala.jdk.CollectionConverters._
        val wave = javax.sound.sampled.AudioFileFormat.Type.WAVE
        val writer = java.util.ServiceLoader.load(classOf[AudioFileWriter])
          .asScala.find(_.isFileTypeSupported(wave))
          .getOrElse(sys.error("no WAVE AudioFileWriter provider"))
        val readers = java.util.ServiceLoader.load(classOf[AudioFileReader])
          .asScala.toVector
        var elected: AudioFileReader = null
        def decode(bytes: Array[Byte], id: Long): javax.sound.sampled.AudioInputStream = {
          if (elected != null)
            return elected.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
          readers.iterator.flatMap { r =>
            try {
              val ais = r.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
              elected = r
              Some(ais)
            } catch { case _: javax.sound.sampled.UnsupportedAudioFileException => None }
          }.nextOption().getOrElse(sys.error(s"no provider decodes WAV for doc $id"))
        }
        def encodeWav(pcm: Array[Byte], rate: Int, n: Int): Array[Byte] = {
          val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
          val bos = new java.io.ByteArrayOutputStream()
          writer.write(
            new javax.sound.sampled.AudioInputStream(
              new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
            wave, bos)
          bos.toByteArray
        }
        it.map { case (id, rate, n) =>
          val pcm = new Array[Byte](2 * n)
          var i = 0
          while (i < n) {
            val s = plantPcm(id, i)
            pcm(2 * i) = (s & 0xff).toByte
            pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
            i += 1
          }
          // generation 1: real encode + decode
          val back = decode(encodeWav(pcm, rate, n), id).readAllBytes()
          require(back.length == 2 * n, s"gen-1 decode lost samples for doc $id")
          def sampleAt(k: Int): Int = {
            val lo = back(2 * k) & 0xff
            val hi = back(2 * k + 1)
            (hi << 8) | lo
          }
          var peak = 0
          i = 0
          while (i < n) {
            val a = math.abs(sampleAt(i)); if (a > peak) peak = a
            i += 1
          }
          require(peak > 0, s"degenerate all-silence clip for doc $id")
          val pcm2 = new Array[Byte](2 * n)
          var newPeak = 0
          i = 0
          while (i < n) {
            val dev = sampleAt(i)
            val mag = (math.abs(dev) * 30000) / peak // non-negative ÷ positive
            val s2 = if (dev < 0) -mag else mag
            if (mag > newPeak) newPeak = mag
            pcm2(2 * i) = (s2 & 0xff).toByte
            pcm2(2 * i + 1) = ((s2 >> 8) & 0xff).toByte
            i += 1
          }
          // generation 2: re-encode the normalized PCM, decode, checksum
          val back2 = decode(encodeWav(pcm2, rate, n), id).readAllBytes()
          require(back2.length == 2 * n, s"gen-2 decode lost samples for doc $id")
          var sum = 0L
          i = 0
          while (i < n) {
            val lo = back2(2 * i) & 0xff
            val hi = back2(2 * i + 1)
            sum = (sum * 31 + (((hi << 8) | lo) + 32768)) % 2147483647L
            i += 1
          }
          MmGainStat(id, n, peak, newPeak, sum)
        }
      }
  }

  private def mm18Gain(s: SparkSession, d: String): DataFrame = {
    val meta = assets(s, d).toDF().filter(col("modality") === "audio")
      .select(col("doc_id"), col("sample_rate"),
        (lit(400) + (col("doc_id") % 5) * 80).cast("int").as("n_samples"))
    gainStats(meta).toDF().orderBy("doc_id")
  }

  private val mm18Oracle: String =
    """WITH m AS (
      |  SELECT doc_id, CAST(400 + (doc_id % 5) * 80 AS INT) AS n
      |  FROM documents WHERE doc_id % 3 = 1),
      |dev AS (
      |  SELECT doc_id, n,
      |         list_transform(generate_series(0, n - 1),
      |           i -> ((doc_id * 31 + i * 7) % 65536) - 32768) AS ds
      |  FROM m),
      |pk AS (
      |  SELECT doc_id, n, ds,
      |         list_max(list_transform(ds, x -> abs(x))) AS peak
      |  FROM dev)
      |SELECT doc_id, n AS n_samples, CAST(peak AS INT) AS peak,
      |       CAST(list_max(list_transform(ds,
      |         x -> (abs(x) * 30000) // peak)) AS INT) AS new_peak,
      |       list_reduce(list_prepend(CAST(0 AS BIGINT),
      |         list_transform(ds,
      |           x -> CASE WHEN x < 0 THEN -((abs(x) * 30000) // peak)
      |                     ELSE (abs(x) * 30000) // peak END + 32768)),
      |         (a, b) -> (a * 31 + b) % 2147483647) AS out_checksum
      |FROM pk ORDER BY doc_id""".stripMargin

  // ---- mm19: windowed energy profile over real decoded audio ---------------

  final case class MmEnergyStat(doc_id: Long, win_id: Int, n_win: Int, energy: Long)

  /** Short-time energy — the feature every voice-activity detector and
    * silence trimmer consumes (the precursor to spectral features that
    * need an FFT): decode the planted WAV through a real codec
    * generation, then emit one row per non-overlapping 100-sample
    * window with the window's sum of squared deviations from the
    * midpoint. All-integer (squares of 16-bit deviations sum to
    * < 2³⁷ per window) and fan-out-shaped: the operator's OUTPUT is
    * per-window rows, the feature-frame layout downstream models
    * batch on.
    *
    * Scale shape: one mapPartitions codec leg (provider elected per
    * partition, the mm16 discipline) that flatMaps windows inside the
    * row — the fan-out never crosses an exchange; output is narrow
    * integers ordered by the gate contract.
    */
  private[ops] def energyStats(meta: DataFrame): Dataset[MmEnergyStat] = {
    import meta.sparkSession.implicits._
    meta.select("doc_id", "sample_rate", "n_samples").as[(Long, Int, Int)]
      .mapPartitions { it =>
        import javax.sound.sampled.spi.{AudioFileReader, AudioFileWriter}
        import scala.jdk.CollectionConverters._
        val wave = javax.sound.sampled.AudioFileFormat.Type.WAVE
        val writer = java.util.ServiceLoader.load(classOf[AudioFileWriter])
          .asScala.find(_.isFileTypeSupported(wave))
          .getOrElse(sys.error("no WAVE AudioFileWriter provider"))
        val readers = java.util.ServiceLoader.load(classOf[AudioFileReader])
          .asScala.toVector
        var elected: AudioFileReader = null
        def decode(bytes: Array[Byte], id: Long): Array[Byte] = {
          def via(r: AudioFileReader) =
            r.getAudioInputStream(new java.io.ByteArrayInputStream(bytes)).readAllBytes()
          if (elected != null) return via(elected)
          readers.iterator.flatMap { r =>
            try { val out = via(r); elected = r; Some(out) }
            catch { case _: javax.sound.sampled.UnsupportedAudioFileException => None }
          }.nextOption().getOrElse(sys.error(s"no provider decodes WAV for doc $id"))
        }
        it.flatMap { case (id, rate, n) =>
          val pcm = new Array[Byte](2 * n)
          var i = 0
          while (i < n) {
            val s = plantPcm(id, i)
            pcm(2 * i) = (s & 0xff).toByte
            pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
            i += 1
          }
          val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
          val bos = new java.io.ByteArrayOutputStream()
          writer.write(
            new javax.sound.sampled.AudioInputStream(
              new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
            wave, bos)
          val back = decode(bos.toByteArray, id)
          require(back.length == 2 * n, s"decode lost samples for doc $id")
          val win = 100
          (0 until n / win).map { w =>
            var e = 0L
            var k = w * win
            while (k < (w + 1) * win) {
              val lo = back(2 * k) & 0xff
              val hi = back(2 * k + 1)
              val dev = (hi << 8) | lo
              e += dev.toLong * dev
              k += 1
            }
            MmEnergyStat(id, w, win, e)
          }
        }
      }
  }

  private def mm19Energy(s: SparkSession, d: String): DataFrame = {
    val meta = assets(s, d).toDF().filter(col("modality") === "audio")
      .select(col("doc_id"), col("sample_rate"),
        (lit(400) + (col("doc_id") % 5) * 80).cast("int").as("n_samples"))
    energyStats(meta).toDF().orderBy("doc_id", "win_id")
  }

  private val mm19Oracle: String =
    """WITH m AS (
      |  SELECT doc_id, CAST(400 + (doc_id % 5) * 80 AS INT) AS n
      |  FROM documents WHERE doc_id % 3 = 1),
      |wins AS (
      |  SELECT doc_id, n, unnest(generate_series(0, n // 100 - 1)) AS win_id
      |  FROM m)
      |SELECT doc_id, CAST(win_id AS INT) AS win_id, 100 AS n_win,
      |       CAST(list_sum(list_transform(generate_series(win_id * 100, win_id * 100 + 99),
      |         i -> CAST(((doc_id * 31 + i * 7) % 65536) - 32768 AS BIGINT)
      |            * (((doc_id * 31 + i * 7) % 65536) - 32768))) AS BIGINT) AS energy
      |FROM wins ORDER BY doc_id, win_id""".stripMargin

  // ---- mm20: voice-activity segmentation over the energy profile -----------

  /** Voice-activity detection — the segmentation pass speech corpora
    * run before transcription batching: threshold mm19's short-time
    * energy at the clip's own EXACT lower median (adaptive per clip,
    * the way real VADs normalize against the clip's noise floor) and
    * merge consecutive above-threshold windows into speech segments
    * via the gaps-and-islands decomposition (`win_id − row_number`
    * island keys). One row per segment with its span and energy mass.
    *
    * Scale shape: the codec leg is mm19's single mapPartitions; every
    * window after it is PARTITIONED BY doc_id (a clip's window count
    * is duration-bounded — never a global sort); the median is the
    * k-th smallest by count, no interpolation to diverge on. The
    * segment rollup keys on (doc_id, island) — integers only.
    */
  private def mm20Vad(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val meta = assets(s, d).toDF().filter(col("modality") === "audio")
      .select(col("doc_id"), col("sample_rate"),
        (lit(400) + (col("doc_id") % 5) * 80).cast("int").as("n_samples"))
    val e = energyStats(meta).toDF()
    val wMed = Window.partitionBy(col("doc_id")).orderBy(col("energy"), col("win_id"))
    val med = e
      .withColumn("rn", row_number().over(wMed))
      .withColumn("n_w", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
      .filter(col("rn") === expr("(n_w + 1) DIV 2"))
      .select(col("doc_id"), col("energy").as("med_energy"))
    val wIsl = Window.partitionBy(col("doc_id")).orderBy(col("win_id"))
    e.join(med, Seq("doc_id"))
      .filter(col("energy") > col("med_energy"))
      .withColumn("isl", col("win_id") - row_number().over(wIsl))
      .groupBy(col("doc_id"), col("isl"))
      .agg(min(col("win_id")).as("seg_start"),
        max(col("win_id")).as("seg_end"),
        count(lit(1)).as("n_wins"),
        sum(col("energy")).as("seg_energy"))
      .select("doc_id", "seg_start", "seg_end", "n_wins", "seg_energy")
      .orderBy("doc_id", "seg_start")
  }

  private val mm20Oracle: String =
    """WITH m AS (
      |  SELECT doc_id, CAST(400 + (doc_id % 5) * 80 AS INT) AS n
      |  FROM documents WHERE doc_id % 3 = 1),
      |wins AS (
      |  SELECT doc_id, n, unnest(generate_series(0, n // 100 - 1)) AS win_id
      |  FROM m),
      |e AS (
      |  SELECT doc_id, CAST(win_id AS INT) AS win_id,
      |         CAST(list_sum(list_transform(generate_series(win_id * 100, win_id * 100 + 99),
      |           i -> CAST(((doc_id * 31 + i * 7) % 65536) - 32768 AS BIGINT)
      |              * (((doc_id * 31 + i * 7) % 65536) - 32768))) AS BIGINT) AS energy
      |  FROM wins),
      |med AS (
      |  SELECT doc_id, energy AS med_energy FROM (
      |    SELECT doc_id, energy,
      |           row_number() OVER (PARTITION BY doc_id ORDER BY energy, win_id) AS rn,
      |           count(*) OVER (PARTITION BY doc_id) AS n_w
      |    FROM e) WHERE rn = (n_w + 1) // 2),
      |sp AS (
      |  SELECT e.doc_id, e.win_id, e.energy,
      |         e.win_id - row_number() OVER (PARTITION BY e.doc_id ORDER BY e.win_id) AS isl
      |  FROM e JOIN med ON e.doc_id = med.doc_id
      |  WHERE e.energy > med.med_energy)
      |SELECT doc_id,
      |       CAST(min(win_id) AS INT) AS seg_start,
      |       CAST(max(win_id) AS INT) AS seg_end,
      |       CAST(count(*) AS BIGINT) AS n_wins,
      |       CAST(sum(energy) AS BIGINT) AS seg_energy
      |FROM sp GROUP BY doc_id, isl
      |ORDER BY doc_id, seg_start""".stripMargin

  // ---- mm21: ViT patch grid over really-decoded pixels ----------------------

  final case class MmPatchStat(
      doc_id: Long, py: Int, px: Int, n_px: Int, luma_sum: Long, mean_mluma: Long)

  /** Patchification — the preprocessing every vision transformer
    * consumes (an image becomes a grid of patch tokens before it ever
    * meets the model): decode the REAL PNG (mm13's imageio leg), split
    * the frame into a 4×4 patch grid, and emit one row per patch with
    * its exact integer luma mass (BT.601 weights ×1000 — no per-pixel
    * division to lose bits) and mean milli-luma. One image row fans
    * out to 16 patch-token rows — the (batch, seq) layout the training
    * stack batches on, produced from genuinely decoded bytes.
    *
    * Scale shape: mm13's — encode and decode+patch are two
    * mapPartitions legs, the fan-out is row-local (pixels never cross
    * an exchange), output is narrow integers. The fixture's dims are
    * divisible by 16, so the grid is exact with no remainder column.
    */
  private[ops] def patchStats(realAssets: Dataset[MmRealAsset]): Dataset[MmPatchStat] = {
    import realAssets.sparkSession.implicits._
    realAssets.mapPartitions { it =>
      it.flatMap { a =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(a.png))
        require(img != null && img.getWidth == a.width && img.getHeight == a.height,
          s"decode failed for doc ${a.doc_id}")
        // ONE bulk pixel fetch per image: per-pixel getRGB pays a
        // color-model conversion call per sample (~5× slower, measured)
        val pix = img.getRGB(0, 0, a.width, a.height, null, 0, a.width)
        val pw = a.width / 4
        val ph = a.height / 4
        for (py <- 0 until 4; px <- 0 until 4) yield {
          var sum = 0L
          var y = py * ph
          while (y < (py + 1) * ph) {
            val rowBase = y * a.width
            var x = px * pw
            while (x < (px + 1) * pw) {
              val rgb = pix(rowBase + x)
              sum += 299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
                114L * (rgb & 0xff)
              x += 1
            }
            y += 1
          }
          MmPatchStat(a.doc_id, py, px, pw * ph, sum, sum / (pw * ph))
        }
      }
    }
  }

  private def mm21PatchGrid(s: SparkSession, d: String): DataFrame = {
    val meta = assets(s, d).toDF().filter(col("modality") === "image")
      .select("doc_id", "width", "height")
    patchStats(encodeReal(meta)).toDF().orderBy("doc_id", "py", "px")
  }

  private val mm21Oracle: String =
    """WITH m AS (
      |  SELECT doc_id,
      |         CAST(64 + (doc_id % 8) * 16 AS INT) AS w,
      |         CAST(64 + (doc_id % 5) * 16 AS INT) AS h
      |  FROM documents WHERE doc_id % 3 = 0),
      |g AS (SELECT doc_id, w // 4 AS pw, h // 4 AS ph,
      |             unnest(generate_series(0, 3)) AS py
      |      FROM m),
      |g2 AS (SELECT doc_id, pw, ph, py, unnest(generate_series(0, 3)) AS px FROM g),
      |p AS (
      |  SELECT doc_id, py, px, pw * ph AS n_px,
      |         CAST(list_sum(list_transform(generate_series(py * ph, (py + 1) * ph - 1), y ->
      |           list_sum(list_transform(generate_series(px * pw, (px + 1) * pw - 1), x ->
      |             299 * ((doc_id + 2 * x + 3 * y) % 256)
      |           + 587 * ((doc_id * 2 + 5 * x + y) % 256)
      |           + 114 * ((doc_id * 3 + x + 7 * y) % 256))))) AS BIGINT) AS luma_sum
      |  FROM g2)
      |SELECT doc_id, CAST(py AS INT) AS py, CAST(px AS INT) AS px,
      |       CAST(n_px AS INT) AS n_px, luma_sum,
      |       luma_sum // n_px AS mean_mluma
      |FROM p ORDER BY doc_id, py, px""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm21_patch_grid" -> (mm21PatchGrid _),
    "mm20_vad" -> (mm20Vad _),
    "mm19_energy" -> (mm19Energy _),
    "mm18_gain" -> (mm18Gain _),
    "mm17_resample" -> (mm17Resample _),
    "mm16_real_audio" -> (mm16RealAudio _),
    "mm15_jpeg" -> (mm15Jpeg _),
    "mm14_keyframes" -> (mm14Keyframes _),
    "mm13_real_decode" -> (mm13RealDecode _),
    "mm12_stream_image" -> (mm12StreamImageDedup _),
    "mm11_interleave" -> (mm11Interleave _),
    "mm10_pair_curation" -> (mm10PairCuration _),
    "mm9_scene_detect" -> (mm9SceneDetect _),
    "mm8_audio_dedup" -> (mm8AudioDedup _),
    "mm5_audio_windows" -> (mm5AudioWindows _),
    "mm6_resize" -> (mm6Resize _),
    "mm7_image_dedup" -> (mm7ImageDedup _),
    "mm1_catalog" -> (mm1Catalog _),
    "mm2_features" -> (mm2Features _),
    "mm3_frame_sample" -> (mm3FrameSample _),
    "mm4_video_dedup" -> (mm4VideoDedup _)
  )

  private val mm2Oracle: String =
    """WITH f AS (
      |  SELECT (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] AS modality,
      |         CAST(length(text) AS INT) AS n_bytes,
      |         list_reduce(
      |           list_prepend(CAST(0 AS BIGINT),
      |             list_transform(generate_series(1, length(text)),
      |               i -> CAST(ascii(substr(text, i, 1)) AS BIGINT))),
      |           (a, b) -> (a * 31 + b) % 2147483647) AS checksum,
      |         CASE WHEN length(text) = 0 THEN 0
      |              ELSE CAST((length(text) + s - 1) // s AS INT) END AS frames_sampled
      |  FROM (SELECT doc_id, text,
      |               CASE CAST(doc_id % 3 AS INT)
      |                    WHEN 2 THEN 24 WHEN 1 THEN 8 ELSE 1 END AS s
      |        FROM documents))
      |SELECT modality, count(*) AS n_assets,
      |       CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
      |       CAST(sum(frames_sampled) AS BIGINT) AS total_frames,
      |       min(checksum) AS min_checksum, max(checksum) AS max_checksum
      |FROM f GROUP BY modality ORDER BY modality""".stripMargin

  val oracles: Map[String, String] = Map(
    "mm21_patch_grid" -> mm21Oracle,
    "mm20_vad" -> mm20Oracle,
    "mm19_energy" -> mm19Oracle,
    "mm18_gain" -> mm18Oracle,
    "mm17_resample" -> mm17Oracle,
    "mm16_real_audio" -> mm16Oracle,
    "mm15_jpeg" -> mm15Oracle,
    "mm14_keyframes" -> mm14Oracle,
    "mm13_real_decode" -> mm13Oracle,
    "mm12_stream_image" -> mm12Oracle,
    "mm11_interleave" -> mm11Oracle,
    "mm10_pair_curation" -> mm10Oracle,
    "mm9_scene_detect" -> mm9Oracle,
    "mm8_audio_dedup" -> mm8Oracle,
    "mm7_image_dedup" -> mm7Oracle,
    "mm5_audio_windows" -> mm5Oracle,
    "mm6_resize" -> mm6Oracle,
    "mm1_catalog" -> mm1Oracle,
    "mm2_features" -> mm2Oracle,
    "mm3_frame_sample" -> mm3Oracle,
    "mm4_video_dedup" -> mm4Oracle
  )
}

package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal column plumbing: opaque `binary` payloads with typed,
  * deterministic metadata extraction and a frame-sampling planner.
  *
  * The real decode (image/audio codec) is STUBBED — this container has
  * no media libraries — behind `fakeDecodeHex`: a deterministic
  * pseudo-decoder that reads "header fields" out of the payload's md5
  * hex. Everything around the stub is the real Spark plumbing you'd
  * ship: binary column synthesis, typed metadata schema, explode-based
  * frame batch planning, partition-friendly single-pass scans. To go
  * live you swap `fakeDecodeHex` for a real codec inside the same
  * `mapPartitions`/expression slot (batched per partition, one codec
  * instance per task — the Scala analog of a pandas-UDF batch).
  *
  * Hex→int parsing is done with a char-fold (`instr` on a hex
  * alphabet) that both Spark and DuckDB evaluate identically, so even
  * the stub decode is oracle-checked.
  */
object Multimodal {

  /** Fold hex-string expression `e` to a BIGINT (both dialects). */
  private def sparkHexToInt(e: String): String =
    s"aggregate(transform(sequence(1, length($e)), ci -> " +
      s"cast(instr('0123456789abcdef', substring($e, ci, 1)) - 1 as bigint)), " +
      s"0L, (acc, c) -> acc * 16 + c)"

  private def duckHexToInt(e: String): String =
    s"CAST(list_reduce(list_prepend(0::BIGINT, list_transform(range(1, length($e) + 1), " +
      s"ci -> (instr('0123456789abcdef', substring($e, ci, 1)) - 1)::BIGINT)), " +
      s"(acc, c) -> acc * 16 + c) AS BIGINT)"

  /** Deterministic fake payload: 16 md5 bytes of the text — stands in
    * for real image/audio/video bytes. */
  private val payloadCol = "unhex(md5(text))"

  // ---------------------------------------------------------------- metadata

  /** The UNSORTED metadata projection every q_mm_* query composes on.
    * Factored out of [[qMmMeta]] so downstream consumers never inherit
    * its presentation `orderBy`: Catalyst's EliminateSorts cannot
    * recurse through a Generate node, so composing q_mm_frames on the
    * sorted frame left a wasted full range-partition exchange + sort
    * of the meta rows below the explode. */
  private def metaFrame(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .withColumn("payload", expr(payloadCol))
      .withColumn("hex", md5($"text"))
      .withColumn("media_type",
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (expr(sparkHexToInt("substring(hex, 1, 2)")) % 3 + 1).cast("int")))
      .withColumn("width", (expr(sparkHexToInt("substring(hex, 3, 2)")) % 64 + 16).cast("int"))
      .withColumn("height", (expr(sparkHexToInt("substring(hex, 5, 2)")) % 64 + 16).cast("int"))
      .withColumn("n_frames",
        when($"media_type" === "video", (expr(sparkHexToInt("substring(hex, 7, 2)")) % 120 + 8).cast("int"))
          .otherwise(lit(1)))
      .select($"doc_id", $"media_type", $"width", $"height", $"n_frames",
        length($"payload").cast("int").as("payload_bytes"))
  }

  /** Binary payload + typed metadata decode (STUB decode, real schema):
    * media_type from source id, width/height/fps/frames from "header"
    * bytes. */
  def qMmMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    metaFrame(s, dir).orderBy($"doc_id")
  }

  /** The ONE oracle-side metadata CTE chain every q_mm_* oracle
    * interpolates — the SQL twin of [[metaFrame]], so a stub-header
    * change can never be applied to one oracle and missed in another.
    * payload_bytes derives from the same synthesized payload as the
    * Spark side (a NULL text yields NULL in both engines, never a
    * hardcoded 16). */
  private val metaCte: String =
    s"""h AS (SELECT doc_id, md5(text) AS hex,
       |  octet_length(unhex(md5(text)))::INTEGER AS payload_bytes
       |  FROM documents),
       |m0 AS (
       |  SELECT doc_id, hex, payload_bytes,
       |    ['image', 'audio', 'video'][(${duckHexToInt("substring(hex, 1, 2)")} % 3 + 1)::INTEGER] AS media_type,
       |    (${duckHexToInt("substring(hex, 3, 2)")} % 64 + 16)::INTEGER AS width,
       |    (${duckHexToInt("substring(hex, 5, 2)")} % 64 + 16)::INTEGER AS height
       |  FROM h
       |),
       |m AS (
       |  SELECT doc_id, hex, payload_bytes, media_type, width, height,
       |    CASE WHEN media_type = 'video'
       |         THEN (${duckHexToInt("substring(hex, 7, 2)")} % 120 + 8)::INTEGER
       |         ELSE 1 END AS n_frames
       |  FROM m0
       |)""".stripMargin

  val qMmMetaSql: String =
    s"""WITH $metaCte
       |SELECT doc_id, media_type, width, height, n_frames, payload_bytes
       |FROM m ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- frames

  /** Frame-sampling plan for video payloads: every 8th frame, with the
    * byte offset a decoder would seek to — the explode gives the
    * (doc, frame) work-list a downstream batched decoder consumes. */
  def qMmFrames(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    metaFrame(s, dir)
      .filter($"media_type" === "video")
      .withColumn("frame_idx", explode(expr("sequence(0, n_frames - 1, 8)")))
      .select($"doc_id", $"frame_idx".cast("int").as("frame_idx"),
        ($"frame_idx".cast("long") * $"width" * $"height" * 3L).as("byte_offset"))
      .orderBy($"doc_id", $"frame_idx")
  }

  val qMmFramesSql: String =
    s"""WITH $metaCte,
       |v AS (SELECT * FROM m WHERE media_type = 'video')
       |SELECT doc_id, CAST(f AS INTEGER) AS frame_idx,
       |  f::BIGINT * width * height * 3 AS byte_offset
       |FROM v, unnest(range(0, n_frames, 8)) AS t(f)
       |ORDER BY doc_id, frame_idx""".stripMargin

  // ---------------------------------------------------------------- features

  /** Batched feature extraction — the Scala analog of a pandas-UDF
    * `mapInPandas` decoder: payloads stream through `mapPartitions`
    * in fixed-size batches, one "codec" invocation per batch (real
    * codecs amortize model/handle setup per batch, which is the whole
    * point of the shape). The decode itself is the deterministic STUB
    * (mean byte brightness) so even this path is oracle-checked. */
  def extractFeatures(payloads: DataFrame, batchSize: Int): DataFrame = {
    val s = payloads.sparkSession
    import s.implicits._
    payloads.select($"doc_id", $"payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // one codec call per batch (stub: per-payload mean byte)
          batch.map { case (id, bytes) =>
            // null (e.g. a NULL-text doc's unhex(md5(NULL)) payload)
            // and empty payloads are DEFINED inputs → 0.0, never an
            // NPE or NaN; the oracle's CASE mirrors the same rule
            val brightness =
              if (bytes == null || bytes.isEmpty) 0.0
              else {
                var sum = 0L
                bytes.foreach(b => sum += (b & 0xff))
                math.round(sum.toDouble / bytes.length / 255.0 * 10000) / 10000.0
              }
            (id, brightness)
          }
        }
      }
      .toDF("doc_id", "brightness")
  }

  def qMmFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val payloads = graft.Tables.documents(s, dir)
      .select($"doc_id", expr(payloadCol).as("payload"))
    extractFeatures(payloads, batchSize = 64).orderBy($"doc_id")
  }

  val qMmFeaturesSql: String =
    s"""WITH $metaCte,
       |b AS (
       |  SELECT doc_id,
       |    CASE WHEN hex IS NULL THEN NULL
       |         ELSE list_transform(range(0, 16),
       |           i -> ${duckHexToInt("substring(hex, 2*i + 1, 2)")}) END AS bytes
       |  FROM m
       |)
       |SELECT doc_id,
       |  CASE WHEN bytes IS NULL THEN 0.0
       |       ELSE round(CAST(list_sum(bytes) AS DOUBLE) / len(bytes) / 255.0, 4)
       |       END AS brightness
       |FROM b ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- resize

  /** Resize planning for image/video payloads — the remaining member
    * of the decode / feature-extract / resize / frame-sample quartet:
    * fit each payload into a [[ResizeBox]]×[[ResizeBox]] box
    * preserving aspect ratio (standard vision-model preprocessing,
    * never upscaling). With the stub decoder the resize IS the plan —
    * target dims via floor (floor is bit-identical across engines,
    * unlike banker's-vs-half-up rounding), the scale factor, and the
    * output byte volume a real resampler would emit. The pixel loop
    * slots into the same batched mapPartitions shape as
    * [[extractFeatures]] when a codec exists. */
  private val ResizeBox = 32.0

  def qMmResize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    metaFrame(s, dir)
      .filter($"media_type" =!= "audio")
      .withColumn("scale",
        least(lit(ResizeBox) / $"width", lit(ResizeBox) / $"height", lit(1.0)))
      .withColumn("out_w", greatest(floor($"width" * $"scale"), lit(1.0)).cast("int"))
      .withColumn("out_h", greatest(floor($"height" * $"scale"), lit(1.0)).cast("int"))
      .select($"doc_id", $"media_type", $"width", $"height",
        round($"scale", 4).as("scale"), $"out_w", $"out_h",
        ($"out_w".cast("long") * $"out_h" * 3L * $"n_frames").as("out_bytes"))
      .orderBy($"doc_id")
  }

  val qMmResizeSql: String =
    s"""WITH $metaCte,
       |r AS (
       |  SELECT doc_id, media_type, width, height, n_frames,
       |    least($ResizeBox / width, $ResizeBox / height, 1.0) AS raw_scale
       |  FROM m WHERE media_type <> 'audio'
       |)
       |SELECT doc_id, media_type, width, height,
       |  round(raw_scale, 4) AS scale,
       |  greatest(floor(width * raw_scale), 1)::INTEGER AS out_w,
       |  greatest(floor(height * raw_scale), 1)::INTEGER AS out_h,
       |  greatest(floor(width * raw_scale), 1)::BIGINT *
       |    greatest(floor(height * raw_scale), 1)::BIGINT * 3 * n_frames AS out_bytes
       |FROM r ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_mm_meta" -> (qMmMeta(_, _)),
    "q_mm_frames" -> (qMmFrames(_, _)),
    "q_mm_features" -> (qMmFeatures(_, _)),
    "q_mm_resize" -> (qMmResize(_, _)))

  val oracles: Map[String, String] = Map(
    "q_mm_meta" -> qMmMetaSql,
    "q_mm_frames" -> qMmFramesSql,
    "q_mm_features" -> qMmFeaturesSql,
    "q_mm_resize" -> qMmResizeSql)
}

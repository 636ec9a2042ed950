package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column pipeline plumbing: media as opaque binary columns
  * with typed metadata, batched feature extraction over partitions.
  *
  * The actual codec step (image/audio decode) is STUBBED — the
  * container ships no codec libraries — behind [[decodeMedia]]; the
  * Spark-side plumbing is real: binary payload column, metadata
  * struct, `mapPartitions` with an explicit micro-batch shape (the
  * Scala analogue of mapInPandas' batch iterator), and a deterministic
  * fake feature extractor so the pipeline is testable end-to-end.
  *
  * Scale notes: payloads stay opaque binary all the way through the
  * scan (parquet reads them lazily per column chunk); feature
  * extraction is a narrow mapPartitions — no shuffle; batch size 64
  * bounds per-task peak memory at ~64 x payload size.
  */
object Multimodal {
  val P = 2147483647L

  case class MediaRow(doc_id: Long, mime: String, payload: Array[Byte])
  case class MediaFeatures(doc_id: Long, mime: String, n_bytes: Long,
                           checksum: Long, width: Long, height: Long)

  /** REAL DECODE NOT AVAILABLE IN THIS ENVIRONMENT.
    * Swap in an actual codec (e.g. javax.imageio / ffmpeg bindings) on
    * a cluster that ships one; everything downstream only sees the
    * MediaFeatures schema, so the swap is local to this function.
    */
  def decodeMedia(payload: Array[Byte], mime: String): Nothing =
    throw new UnsupportedOperationException(
      "media codecs not available in this container; use deterministic fake features")

  /** Deterministic fake "decode": polynomial checksum over bytes plus
    * stub dimensions derived from the byte length. */
  def fakeFeatures(r: MediaRow): MediaFeatures = {
    val checksum = r.payload.foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) % P)
    MediaFeatures(r.doc_id, r.mime, r.payload.length.toLong, checksum,
      r.payload.length.toLong % 640, (r.payload.length.toLong * 31) % 480)
  }

  /** Attach a binary payload + metadata to each document (stands in
    * for reading real media files alongside their manifest). */
  def attachPayload(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      lit("text/plain").as("mime"),
      col("text").cast("binary").as("payload"))

  /** Batched feature extraction: partitions stream through in
    * micro-batches of 64 rows (the mapInPandas batch shape). */
  def extractFeatures(media: DataFrame, batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.grouped(batchSize).flatMap(batch => batch.map(fakeFeatures))
    }
  }

  /** m01 pipeline: documents -> binary payload -> batched features. */
  def pipeline(documents: DataFrame): DataFrame = {
    val feats = extractFeatures(attachPayload(documents))
    feats.toDF().orderBy(col("doc_id"))
  }

  /** m02: binary-column digest + byte stats — the part of the
    * multimodal pipeline that IS SQL-expressible, so unlike m01 it
    * gets a full DuckDB oracle: media manifests at scale are exactly
    * this (content digest for dedup/idempotency + size for placement)
    * computed in the scan projection, no decode needed. The digest is
    * over the raw payload bytes, proving the binary column round-trips
    * bit-identically through the pipeline.
    */
  def binaryDigest(documents: DataFrame): DataFrame =
    attachPayload(documents)
      .select(col("doc_id"), col("mime"),
              length(col("payload")).cast("long").as("n_bytes"),
              sha2(col("payload"), 256).as("digest"))
      .orderBy(col("doc_id"))

  // DuckDB 1.0's sha256 takes VARCHAR (hashed as its UTF-8 bytes) —
  // identical bytes to Spark's sha2 over the cast-to-binary payload
  val binaryDigestOracle: String =
    """SELECT doc_id, 'text/plain' AS mime,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       sha256(text) AS digest
       FROM documents ORDER BY doc_id"""

  // ---- resize / frame-sample plumbing ---------------------------------

  case class Frame(doc_id: Long, frame_idx: Long, frame: Array[Byte])

  /** "Resize": deterministic stub standing in for an image resize —
    * truncate/pad the payload to targetBytes (a real codec swaps in
    * here; the schema and batch shape are what downstream consumes).
    */
  def resizeStub(media: DataFrame, targetBytes: Int = 256): DataFrame = {
    import media.sparkSession.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.map { r =>
        val out = java.util.Arrays.copyOf(r.payload, targetBytes)
        MediaRow(r.doc_id, r.mime, out)
      }
    }.toDF()
  }

  /** Frame sampling: split a binary payload into fixed-size frames and
    * keep every `stride`-th one — the video-frame-extraction shape
    * (one row per sampled frame, narrow flatMap, no shuffle).
    */
  def frameSample(media: DataFrame, frameBytes: Int = 64, stride: Int = 2): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.as[MediaRow].flatMap { r =>
      // ceil division: the partial tail frame is sampled too
      val n = math.max((r.payload.length + frameBytes - 1) / frameBytes, 1)
      (0 until n by stride).map { i =>
        val from = i * frameBytes
        val until = math.min(from + frameBytes, r.payload.length)
        Frame(r.doc_id, i.toLong, java.util.Arrays.copyOfRange(r.payload, from, until))
      }
    }
  }

  /** m03: frame-sample manifest WITH a full oracle — every sampled
    * frame's byte length + content digest. The payloads here are the
    * documents' ASCII text bytes, so byte offsets equal character
    * offsets and DuckDB can replay the exact slicing with substring —
    * turning the video-frame-extraction plumbing (m01's weaker
    * rows-only check) into a hash-verified path: frame boundaries,
    * tail-frame handling, stride, and bit-identical frame bytes are
    * all pinned by the digest. Narrow flatMap over the scan; one row
    * per sampled frame; no shuffle before the output sort.
    */
  def frameSampleSummary(documents: DataFrame, frameBytes: Int = 64,
                         stride: Int = 2): DataFrame =
    frameSample(attachPayload(documents), frameBytes, stride).toDF()
      .select(col("doc_id"), col("frame_idx"),
              length(col("frame")).cast("long").as("frame_len"),
              sha2(col("frame"), 256).as("frame_digest"))
      .orderBy(col("doc_id"), col("frame_idx"))

  /** DuckDB twin of [[frameSampleSummary]]: scalar generate_series
    * (the table-function form rejects lateral args) + substring over
    * the same 1-based offsets. sha256 hashes the VARCHAR's UTF-8
    * bytes == the frame's payload bytes (ASCII corpus). */
  def frameSampleSummaryOracle(frameBytes: Int = 64, stride: Int = 2): String =
    s"""WITH n AS (SELECT doc_id, text,
           CAST(ceil(greatest(length(text), 1) / $frameBytes.0) AS BIGINT) AS nf
         FROM documents),
       ix AS (SELECT doc_id, text,
           unnest(generate_series(0, nf - 1, $stride)) AS frame_idx FROM n),
       f AS (SELECT doc_id, frame_idx,
           substring(text, CAST(frame_idx * $frameBytes + 1 AS BIGINT), $frameBytes) AS frame
         FROM ix)
       SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
         CAST(length(frame) AS BIGINT) AS frame_len,
         sha256(frame) AS frame_digest
       FROM f ORDER BY doc_id, frame_idx"""
}

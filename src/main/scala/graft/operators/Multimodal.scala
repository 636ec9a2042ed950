package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column pipeline plumbing: media as opaque binary columns
  * with typed metadata, batched feature extraction over partitions.
  *
  * The codec story: IMAGE decode is REAL — [[imageDecode]] (m06) runs
  * the JDK's own PNG codec (javax.imageio) through encode → decode →
  * feature extraction under the DuckDB oracle gate — and so is AUDIO:
  * [[audioDecode]] (m07) runs the JDK's WAV/PCM codec
  * (javax.sound.sampled) through the same round trip. VIDEO is real
  * at both levels: [[videoDecode]] (m09) parses an intra-only
  * (MJPEG-class) container, and [[gopVideoDecode]] (m10) decodes a
  * GOP-structured INTER-FRAME container (I-frames + wraparound-delta
  * P-frames) with the real keyframe-chain dependency, including
  * seek-aware extraction ([[gopFrameExtract]], m13) that decodes only
  * the chains sampling needs. Resize ([[imageResize]], m11) and
  * sample-rate conversion ([[audioResample]], m12) are codec round
  * trips, not stubs. What stays external behind [[decodeMedia]] is
  * the production transform/entropy layer (DCT, motion search,
  * arithmetic coding) of shipped codecs — the dependency STRUCTURE
  * those codecs impose is all modeled here. m01's generic pipeline
  * keeps the deterministic fake extractor so the batch plumbing —
  * binary payload column, metadata struct, `mapPartitions` with an
  * explicit micro-batch shape (the Scala analogue of mapInPandas'
  * batch iterator) — stays testable end-to-end for every modality.
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

  /** PRODUCTION CODEC LIBRARIES (libjpeg-turbo/ffmpeg-class) NOT
    * AVAILABLE IN THIS ENVIRONMENT — images, audio, intra-only video,
    * and GOP inter-frame video are all handled for real with JDK
    * codecs, see [[imageDecode]] / [[audioDecode]] / [[videoDecode]] /
    * [[gopVideoDecode]]; what a real cluster would swap in here is
    * the transform/entropy layer (H.264/AAC decoding via ffmpeg
    * bindings). Everything downstream only sees the MediaFeatures
    * schema, so the swap is local to this function.
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

  // ---- m04: content-defined chunking ----------------------------------

  /** Rolling position-weighted window hash ending at byte i (1-based,
    * window [[CdcWindow]]): Σ_k ascii(byte[i-W+k]) · k. A chunk
    * boundary falls wherever hash % [[CdcDivisor]] == 0, so boundaries
    * move WITH content (insert a byte and only the chunks around the
    * edit re-digest) — the property fixed-size framing (m03) lacks and
    * the reason every large-binary dedup store chunks this way.
    * DuckDB fragment only: the Spark side runs the same arithmetic in
    * the native [[graft.functions.CdcBoundaries]] kernel, and the
    * oracle compare is what pins the two bit-identical. */
  private def cdcWinHash(W: Int): String =
    s"list_reduce(list_transform(generate_series(1, $W), k -> CAST(ascii(substring(text, CAST(i - $W + k AS INTEGER), 1)) AS BIGINT) * k), (a, v) -> a + v)"

  val CdcWindow = 8
  val CdcDivisor = 32

  /** m04: content-defined chunk manifest + cross-document chunk dedup
    * census. Every payload splits at content-derived boundaries
    * (average chunk ≈ [[CdcDivisor]] bytes); each chunk gets its byte
    * span and sha-256, and `n_shared` counts how many chunks
    * corpus-wide carry the same digest — the dedup signal a
    * chunk-store consumes (shared chunks are stored once at 100 TB;
    * the census is ONE window over the digest). As in m02/m03 the
    * payload is the document's ASCII bytes so DuckDB replays the
    * byte-exact pipeline: boundary hashes, spans, tail chunk and
    * digests are all oracle-pinned. Narrow per-row explode, no
    * shuffle before the census window on (digest)-partials.
    */
  /** The CDC chunk manifest (one row per chunk, no census) — shared by
    * m04's dedup census and m05's shard assembly. */
  private def chunkFrame(documents: DataFrame): DataFrame = {
    import graft.functions.GraftFunctions.cdc_boundaries
    // boundary scan runs in the native kernel (CdcBoundaries) — the
    // equivalent HOF-lambda fold (cdcWinHash, which the ORACLE still
    // evaluates) costs O(len·W) interpreted allocations per row:
    // 17s -> sub-second at sf0.1, same arithmetic, oracle-verified
    documents
      .select(col("doc_id"), col("text"),
        cdc_boundaries(col("text"), CdcWindow, CdcDivisor).as("ends"))
      .select(col("doc_id"), col("text"), explode(expr(
        """transform(sequence(1, size(ends)), k -> struct(
             CAST(k - 1 AS BIGINT) AS idx,
             CASE WHEN k = 1 THEN CAST(0 AS BIGINT) ELSE element_at(ends, k - 1) END AS st,
             element_at(ends, k) AS en))""")).as("ch"))
      .select(col("doc_id"), col("ch.idx").as("chunk_idx"), col("ch.st").as("start"),
        (col("ch.en") - col("ch.st")).as("n_bytes"),
        sha2(expr("substring(text, CAST(ch.st + 1 AS INT), CAST(ch.en - ch.st AS INT))"), 256)
          .as("digest"))
  }

  def cdcChunks(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    chunkFrame(documents)
      .withColumn("n_shared",
        count(lit(1)).over(Window.partitionBy(col("digest"))))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  /** The `b`/`c`/`m` CTE chain producing the oracle-side chunk
    * manifest `m(doc_id, chunk_idx, start, n_bytes, digest)` — shared
    * by the m04 and m05 oracles so the chunk definition cannot drift. */
  private def chunkCtes: String = {
    val (w, div) = (CdcWindow, CdcDivisor)
    s"""b AS (
         SELECT doc_id, text,
           list_concat(
             list_filter(generate_series($w, greatest(length(text) - 1, $w)),
                         i -> i <= length(text) - 1 AND (${cdcWinHash(w)}) % $div = 0),
             [CAST(length(text) AS BIGINT)]) AS ends
         FROM documents),
       c AS (
         SELECT doc_id, text, unnest(list_transform(generate_series(1, len(ends)),
           k -> struct_pack(idx := CAST(k - 1 AS BIGINT),
                            st := CASE WHEN k = 1 THEN CAST(0 AS BIGINT) ELSE ends[k - 1] END,
                            en := ends[k]))) AS ch
         FROM b),
       m AS (
         SELECT doc_id, ch.idx AS chunk_idx, ch.st AS start,
           CAST(ch.en - ch.st AS BIGINT) AS n_bytes,
           sha256(substring(text, CAST(ch.st + 1 AS INTEGER), CAST(ch.en - ch.st AS INTEGER))) AS digest
         FROM c)"""
  }

  def cdcChunksOracle: String =
    s"""WITH $chunkCtes
       SELECT doc_id, chunk_idx, start, n_bytes, digest,
         CAST(count(*) OVER (PARTITION BY digest) AS BIGINT) AS n_shared
       FROM m ORDER BY doc_id, chunk_idx"""

  // ---- m05: shard assembly over the deduped chunk store ---------------

  /** Writer-stream count for shard assembly — the parallelism of the
    * pack stage (each stream packs independently; the d15 "pb =
    * doc_id mod 16" convention). */
  val ShardStreams = 16L

  /** m05: SHARD ASSEMBLY — pack the DEDUPLICATED chunk store into
    * byte-budget shards, the WebDataset/tar-shard layout step every
    * multimodal training pipeline ends with: training readers stream
    * fixed-size shards, not millions of small objects. Composes m04
    * (content-defined chunks) with the store-once rule (only a
    * digest's FIRST occurrence — lowest (doc_id, chunk_idx) — ships
    * bytes; later occurrences are manifest pointers) and t08's
    * prefix-sum greedy packing.
    *
    * Scale shape: dedup is one shuffle on digest (32-byte keys, not
    * payloads); packing partitions by writer stream `pb = doc_id %
    * ShardStreams` — `ShardStreams` independent running sums, no
    * global window (t08's per-lang discipline), each stream emitting
    * shards sequentially exactly like a shard-writer task would. The
    * census output (one row per shard) is what the writer manifest
    * records; payload bytes would stream through the same plan with
    * the digest column carrying the store key.
    */
  def shardPack(documents: DataFrame, budget: Long = 4096): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wk = Window.partitionBy(col("digest"))
      .orderBy(col("doc_id").asc, col("chunk_idx").asc)
    val keep = chunkFrame(documents)
      .withColumn("rn", row_number().over(wk)).filter(col("rn") === 1)
      .withColumn("pb", col("doc_id") % ShardStreams)
    val wp = Window.partitionBy(col("pb"))
      .orderBy(col("doc_id").asc, col("chunk_idx").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    keep
      .withColumn("prefix", coalesce(sum(col("n_bytes")).over(wp), lit(0L)))
      .withColumn("shard_id", floor(col("prefix") / budget))
      .groupBy(col("pb"), col("shard_id"))
      .agg(count(lit(1)).as("n_chunks"),
           sum(col("n_bytes")).as("shard_bytes"),
           countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("pb"), col("shard_id"))
  }

  def shardPackOracle(budget: Long = 4096): String =
    s"""WITH $chunkCtes,
       keep AS (SELECT doc_id, chunk_idx, n_bytes,
           CAST(doc_id % $ShardStreams AS BIGINT) AS pb
         FROM (SELECT *, row_number() OVER (PARTITION BY digest
                 ORDER BY doc_id, chunk_idx) AS rn FROM m) x
         WHERE rn = 1),
       p AS (SELECT pb, doc_id, chunk_idx, n_bytes,
           coalesce(CAST(sum(n_bytes) OVER (PARTITION BY pb
             ORDER BY doc_id, chunk_idx
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS prefix
         FROM keep)
       SELECT pb, CAST(floor(prefix / $budget) AS BIGINT) AS shard_id,
         count(*) AS n_chunks, CAST(sum(n_bytes) AS BIGINT) AS shard_bytes,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
       FROM p GROUP BY pb, shard_id ORDER BY pb, shard_id"""

  // ---- m06: REAL image decode (javax.imageio, JDK-shipped PNG codec) --

  case class ImageFeatures(doc_id: Long, decode_ok: Boolean,
                           width: Long, height: Long,
                           sum_r: Long, sum_g: Long, sum_b: Long,
                           thumb_width: Long, thumb_height: Long,
                           thumb_sum_r: Long, thumb_sum_g: Long,
                           thumb_sum_b: Long)

  /** Deterministic image spec for doc_id: a W×H two-vertical-band RGB
    * image (left band color A, right band color B, split at W/2) —
    * every decoded feature below is integer arithmetic on these
    * parameters, which is what lets DuckDB oracle a REAL codec path.
    */
  private[graft] def imgW(id: Long): Int = 8 + (id % 9).toInt
  private[graft] def imgH(id: Long): Int = 8 + (id % 7).toInt
  private[graft] def colA(id: Long): (Int, Int, Int) =
    (((id * 5) % 256).toInt, ((id * 7) % 256).toInt, ((id * 13) % 256).toInt)
  private[graft] def colB(id: Long): (Int, Int, Int) =
    (((id * 3) % 256).toInt, ((id * 11) % 256).toInt, ((id * 17) % 256).toInt)

  /** Render the doc's image and encode it as REAL PNG bytes — the
    * ingest half of the codec round trip (stands in for reading media
    * files from the landing zone; narrow mapPartitions, no shuffle).
    */
  def renderPng(documents: DataFrame): DataFrame = {
    import documents.sparkSession.implicits._
    documents.select(col("doc_id")).as[Long].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // no executor tmp files
      it.map { id =>
        val (w, h, split) = (imgW(id), imgH(id), imgW(id) / 2)
        val (ra, ga, ba) = colA(id); val (rb, gb, bb) = colB(id)
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val (r, g, b) = if (x < split) (ra, ga, ba) else (rb, gb, bb)
            img.setRGB(x, y, (r << 16) | (g << 8) | b)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        (id, bos.toByteArray)
      }
    }.toDF("doc_id", "png")
  }

  /** m06: the REAL codec round trip under the oracle gate — render →
    * PNG-encode → PNG-DECODE (javax.imageio, the JDK's actual codec;
    * PNG is lossless so decoded pixels equal rendered pixels) →
    * per-channel pixel sums + a nearest-neighbor half-scale thumbnail
    * re-measured from the DECODED raster. Because the rendered image
    * is two flat vertical bands parameterized by doc_id, every output
    * is exact BIGINT arithmetic DuckDB replays without touching a
    * pixel — a wrong decode, a channel swap, a dropped row of pixels,
    * or a thumbnail off-by-one all break the hash. This closes the
    * m01 "decode is a declared boundary" caveat for images (audio /
    * video codecs stay out: the JDK ships none).
    *
    * Scale shape: both halves are narrow mapPartitions over the scan
    * (the mapInPandas batch shape m01 pins) — payload bytes never
    * shuffle; per-task peak memory is one decoded raster at a time.
    * A corrupt payload yields decode_ok=false with zeroed features
    * instead of a dead executor (spec-pinned) — at 100 TB corrupt
    * media is routine input, not an exception.
    */
  def imageDecode(documents: DataFrame): DataFrame =
    decodeFeatures(renderPng(documents)).orderBy(col("doc_id"))

  /** The decode half alone: (doc_id, png) → [[ImageFeatures]]. Fed by
    * [[renderPng]] in m06; fed garbage in the corrupt-payload spec. */
  def decodeFeatures(images: DataFrame): DataFrame = {
    import images.sparkSession.implicits._
    images.select(col("doc_id"), col("png"))
      .as[(Long, Array[Byte])].mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, png) =>
          try {
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(png))
            if (img == null) throw new java.io.IOException("unrecognized image")
            val (w, h) = (img.getWidth, img.getHeight)
            var (sr, sg, sb) = (0L, 0L, 0L)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val p = img.getRGB(x, y)
                sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
                x += 1
              }
              y += 1
            }
            // nearest-neighbor half-scale from the DECODED raster
            val (tw, th) = (math.max(1, w / 2), math.max(1, h / 2))
            var (tr, tg, tb) = (0L, 0L, 0L)
            var ty = 0
            while (ty < th) {
              var tx = 0
              while (tx < tw) {
                val p = img.getRGB(tx * 2, ty * 2)
                tr += (p >> 16) & 0xff; tg += (p >> 8) & 0xff; tb += p & 0xff
                tx += 1
              }
              ty += 1
            }
            ImageFeatures(id, decode_ok = true, w, h, sr, sg, sb,
                          tw, th, tr, tg, tb)
          } catch {
            // NonFatal, not just IOException: JDK image decoders are
            // known to throw unchecked exceptions on malformed input
            // (NegativeArraySizeException, IllegalArgumentException) —
            // corrupt media is data, not a dead executor
            case scala.util.control.NonFatal(_) =>
              ImageFeatures(id, decode_ok = false, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
          }
        }
      }.toDF()
  }

  /** DuckDB twin of [[imageDecode]]: the band arithmetic. Left band =
    * columns [0, W/2) so it has W/2 columns; the thumbnail samples
    * source columns 0,2,4,… so its left-band count is ceil((W/2)/2).
    */
  def imageDecodeOracle: String =
    """WITH p AS (SELECT doc_id,
           8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h,
           (8 + doc_id % 9) // 2 AS split,
           (doc_id * 5) % 256 AS ra, (doc_id * 7) % 256 AS ga,
           (doc_id * 13) % 256 AS ba,
           (doc_id * 3) % 256 AS rb, (doc_id * 11) % 256 AS gb,
           (doc_id * 17) % 256 AS bb
         FROM documents),
       t AS (SELECT *, w // 2 AS tw, h // 2 AS th,
           (split + 1) // 2 AS tsplit FROM p)
       SELECT doc_id, TRUE AS decode_ok,
         CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
         CAST(h * (split * ra + (w - split) * rb) AS BIGINT) AS sum_r,
         CAST(h * (split * ga + (w - split) * gb) AS BIGINT) AS sum_g,
         CAST(h * (split * ba + (w - split) * bb) AS BIGINT) AS sum_b,
         CAST(tw AS BIGINT) AS thumb_width, CAST(th AS BIGINT) AS thumb_height,
         CAST(th * (tsplit * ra + (tw - tsplit) * rb) AS BIGINT) AS thumb_sum_r,
         CAST(th * (tsplit * ga + (tw - tsplit) * gb) AS BIGINT) AS thumb_sum_g,
         CAST(th * (tsplit * ba + (tw - tsplit) * bb) AS BIGINT) AS thumb_sum_b
       FROM t ORDER BY doc_id"""

  // ---- m07: REAL audio decode (javax.sound.sampled, JDK WAV codec) ----

  case class AudioFeatures(doc_id: Long, decode_ok: Boolean,
                           frames: Long, sample_rate: Long,
                           channels: Long, bits: Long,
                           sum_v: Long, sum_abs: Long,
                           peak_abs: Long, zero_cross: Long)

  /** Deterministic waveform spec for doc_id: mono 16-bit signed PCM at
    * 8 kHz, [[audioFrames]] samples, sample i =
    * ((doc_id·31 + i·97) mod 4096) − 2048 — a full-swing integer
    * pseudo-noise ramp whose every decoded feature below is exact
    * BIGINT arithmetic, which is what lets DuckDB oracle a REAL codec
    * path (m06's two-band trick, transposed to one dimension). */
  private[graft] def audioFrames(id: Long): Int = 64 + (id % 129).toInt
  private[graft] def audioSample(id: Long, i: Int): Int =
    (((id * 31 + i.toLong * 97) % 4096) - 2048).toInt

  /** Render the doc's waveform and encode it as REAL WAV bytes (RIFF
    * container, PCM_SIGNED little-endian — javax.sound.sampled, the
    * JDK's own writer). The ingest half of the audio round trip;
    * narrow mapPartitions, no shuffle. */
  def renderWav(documents: DataFrame): DataFrame = {
    import documents.sparkSession.implicits._
    documents.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val n = audioFrames(id)
        val pcm = new Array[Byte](n * 2)
        var i = 0
        while (i < n) {
          val v = audioSample(id, i)
          pcm(2 * i) = (v & 0xff).toByte
          pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
          i += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1,
          /* signed = */ true, /* bigEndian = */ false)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        (id, bos.toByteArray)
      }
    }.toDF("doc_id", "wav")
  }

  /** m07: the REAL audio codec round trip under the oracle gate —
    * render → WAV-encode → WAV-DECODE (javax.sound.sampled, the JDK's
    * actual RIFF/PCM parser; PCM is lossless so decoded samples equal
    * rendered samples) → frame count, format fields, sample sum,
    * absolute-amplitude sum, peak, and zero-crossing count, all
    * re-measured from the DECODED frames. Because the waveform is an
    * integer pseudo-noise function of doc_id, every output is exact
    * BIGINT arithmetic DuckDB replays without touching a byte of WAV —
    * a header misparse, an endianness flip, a dropped frame, or a
    * sign-extension bug all break the hash. This closes the m01
    * "decode is a declared boundary" caveat for audio, as m06 did for
    * images (video stays out: the JDK ships no video codec).
    *
    * Scale shape: identical to m06 — both halves are narrow
    * mapPartitions over the scan, payload bytes never shuffle, peak
    * per-task memory is one decoded clip. A corrupt payload yields
    * decode_ok=false with zeroed features instead of a dead executor
    * (spec-pinned): at 100 TB corrupt media is routine input. */
  def audioDecode(documents: DataFrame): DataFrame =
    decodeAudioFeatures(renderWav(documents)).orderBy(col("doc_id"))

  /** The decode half alone: (doc_id, wav) → [[AudioFeatures]]. Fed by
    * [[renderWav]] in m07; fed garbage in the corrupt-payload spec.
    * Rejects layouts the feature math doesn't cover (stereo, 8-bit,
    * big-endian, float PCM) as decode failures rather than mis-sums.
    */
  def decodeAudioFeatures(audio: DataFrame): DataFrame = {
    import audio.sparkSession.implicits._
    val failed = (id: Long) =>
      AudioFeatures(id, decode_ok = false, 0, 0, 0, 0, 0, 0, 0, 0)
    audio.select(col("doc_id"), col("wav"))
      .as[(Long, Array[Byte])].mapPartitions { it =>
        it.map { case (id, wav) =>
          try {
            val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(wav))
            val fmt = ais.getFormat
            if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 ||
                fmt.isBigEndian || fmt.getEncoding !=
                  javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
              throw new java.io.IOException(s"unsupported PCM layout: $fmt")
            val bytes = ais.readAllBytes()
            val n = bytes.length / 2
            var sv = 0L; var sa = 0L; var pk = 0L; var zc = 0L
            var prevNeg = false
            var i = 0
            while (i < n) {
              val v = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8))
                .toShort.toInt
              sv += v
              val a = math.abs(v.toLong)
              sa += a
              if (a > pk) pk = a
              val neg = v < 0
              if (i > 0 && neg != prevNeg) zc += 1
              prevNeg = neg
              i += 1
            }
            AudioFeatures(id, decode_ok = true, n.toLong,
              fmt.getSampleRate.toLong, fmt.getChannels.toLong,
              fmt.getSampleSizeInBits.toLong, sv, sa, pk, zc)
          } catch {
            // NonFatal: malformed WAV headers can drive the JDK sound
            // stack into unchecked throws, same contract as images
            case scala.util.control.NonFatal(_) => failed(id)
          }
        }
      }.toDF()
  }

  // ---- m09: video frame decode (MJPEG-style intra-only container) -----

  case class VideoFeatures(doc_id: Long, decode_ok: Boolean,
                           n_frames: Long, width: Long, height: Long,
                           sum_r: Long, sum_g: Long, sum_b: Long,
                           motion: Long)

  /** Per-doc video spec: [[videoFrameCount]] frames of the doc's
    * m06 dimensions; frame f's two band colors shift with f so the
    * video has real inter-frame MOTION the features can measure. */
  private[graft] def videoFrameCount(id: Long): Int = 3 + (id % 4).toInt
  private[graft] def frameColA(id: Long, f: Int): (Int, Int, Int) =
    (((id * 5 + f * 19) % 256).toInt, ((id * 7 + f * 23) % 256).toInt,
     ((id * 13 + f * 29) % 256).toInt)
  private[graft] def frameColB(id: Long, f: Int): (Int, Int, Int) =
    (((id * 3 + f * 31) % 256).toInt, ((id * 11 + f * 37) % 256).toInt,
     ((id * 17 + f * 41) % 256).toInt)

  /** Render the doc's clip as a GVID container: magic ++ frame count
    * ++ per frame [length][REAL PNG bytes] — an intra-only
    * (MJPEG-class) layout: every frame is independently decodable by
    * the JDK's actual PNG codec. Inter-frame (H.264-class) codecs
    * are the one genuinely-external dependency left; the container
    * format itself is documented right here and costs nothing the
    * features don't measure. Narrow mapPartitions, no shuffle. */
  def renderVideo(documents: DataFrame): DataFrame = {
    import documents.sparkSession.implicits._
    documents.select(col("doc_id")).as[Long].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { id =>
        val (w, h, split) = (imgW(id), imgH(id), imgW(id) / 2)
        val bos = new java.io.ByteArrayOutputStream()
        val out = new java.io.DataOutputStream(bos)
        out.writeBytes("GVID")
        val nf = videoFrameCount(id)
        out.writeInt(nf)
        var f = 0
        while (f < nf) {
          val (ra, ga, ba) = frameColA(id, f)
          val (rb, gb, bb) = frameColB(id, f)
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val (r, g, b) = if (x < split) (ra, ga, ba) else (rb, gb, bb)
              img.setRGB(x, y, (r << 16) | (g << 8) | b)
              x += 1
            }
            y += 1
          }
          val fb = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", fb)
          val png = fb.toByteArray
          out.writeInt(png.length)
          out.write(png)
          f += 1
        }
        (id, bos.toByteArray)
      }
    }.toDF("doc_id", "video")
  }

  /** m09: REAL per-frame video decode under the oracle gate — parse
    * the GVID container, PNG-DECODE every frame through the JDK
    * codec, and measure: totals per channel across all decoded
    * frames plus MOTION ENERGY, the summed per-pixel absolute
    * difference between consecutive frames (the cut/scene-change
    * signal a video curation pipeline thresholds on). Frame colors
    * are doc- and frame-parameterized band fills, so every output is
    * exact BIGINT arithmetic DuckDB replays — a dropped frame, a
    * frame-order swap (motion is order-sensitive!), or a bad length
    * prefix breaks the hash. Narrow mapPartitions; corrupt
    * containers and corrupt embedded frames both degrade to
    * decode_ok=false rows. */
  def videoDecode(documents: DataFrame): DataFrame =
    decodeVideoFeatures(renderVideo(documents)).orderBy(col("doc_id"))

  /** The decode half alone: (doc_id, video) → [[VideoFeatures]]. */
  def decodeVideoFeatures(videos: DataFrame): DataFrame = {
    import videos.sparkSession.implicits._
    videos.select(col("doc_id"), col("video"))
      .as[(Long, Array[Byte])].mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, bytes) =>
          try {
            val in = new java.io.DataInputStream(
              new java.io.ByteArrayInputStream(bytes))
            val magic = new Array[Byte](4)
            in.readFully(magic)
            if (new String(magic, "US-ASCII") != "GVID")
              throw new java.io.IOException("bad container magic")
            val nf = in.readInt()
            if (nf <= 0 || nf > 1024)
              throw new java.io.IOException(s"implausible frame count $nf")
            var (w, h) = (0, 0)
            var (sr, sg, sb) = (0L, 0L, 0L)
            var motion = 0L
            var prev: java.awt.image.BufferedImage = null
            var f = 0
            while (f < nf) {
              val len = in.readInt()
              if (len <= 0 || len > bytes.length)
                throw new java.io.IOException(s"bad frame length $len")
              val fb = new Array[Byte](len)
              in.readFully(fb)
              val img = javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(fb))
              if (img == null)
                throw new java.io.IOException("unrecognized frame")
              if (f == 0) { w = img.getWidth; h = img.getHeight }
              else if (img.getWidth != w || img.getHeight != h)
                throw new java.io.IOException("frame dimension change")
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val p = img.getRGB(x, y)
                  sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff
                  sb += p & 0xff
                  if (prev != null) {
                    val q = prev.getRGB(x, y)
                    motion += math.abs(((p >> 16) & 0xff) - ((q >> 16) & 0xff)) +
                      math.abs(((p >> 8) & 0xff) - ((q >> 8) & 0xff)) +
                      math.abs((p & 0xff) - (q & 0xff))
                  }
                  x += 1
                }
                y += 1
              }
              prev = img
              f += 1
            }
            VideoFeatures(id, decode_ok = true, nf.toLong, w.toLong,
              h.toLong, sr, sg, sb, motion)
          } catch {
            case scala.util.control.NonFatal(_) =>
              VideoFeatures(id, decode_ok = false, 0, 0, 0, 0, 0, 0, 0)
          }
        }
      }.toDF()
  }

  /** DuckDB twin of [[videoDecode]]: band arithmetic per (doc, frame)
    * with lag() for the motion term — per-band uniform fills make the
    * per-pixel |Δ| sum collapse to h·(split·Σ|Δcol_A| +
    * (w−split)·Σ|Δcol_B|). */
  val videoDecodeOracle: String =
    """WITH p AS (SELECT doc_id,
           8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h,
           (8 + doc_id % 9) // 2 AS split,
           3 + doc_id % 4 AS nf
         FROM documents),
       f AS (SELECT doc_id, w, h, split, nf,
           unnest(generate_series(0, CAST(nf - 1 AS INT))) AS f FROM p),
       c AS (SELECT doc_id, w, h, split, nf, f,
           (doc_id * 5 + f * 19) % 256 AS ra,
           (doc_id * 7 + f * 23) % 256 AS ga,
           (doc_id * 13 + f * 29) % 256 AS ba,
           (doc_id * 3 + f * 31) % 256 AS rb,
           (doc_id * 11 + f * 37) % 256 AS gb,
           (doc_id * 17 + f * 41) % 256 AS bb
         FROM f),
       d AS (SELECT *,
           lag(ra) OVER fw AS pra, lag(ga) OVER fw AS pga,
           lag(ba) OVER fw AS pba, lag(rb) OVER fw AS prb,
           lag(gb) OVER fw AS pgb, lag(bb) OVER fw AS pbb
         FROM c WINDOW fw AS (PARTITION BY doc_id ORDER BY f))
       SELECT doc_id, TRUE AS decode_ok,
         CAST(max(nf) AS BIGINT) AS n_frames,
         CAST(max(w) AS BIGINT) AS width, CAST(max(h) AS BIGINT) AS height,
         CAST(sum(h * (split * ra + (w - split) * rb)) AS BIGINT) AS sum_r,
         CAST(sum(h * (split * ga + (w - split) * gb)) AS BIGINT) AS sum_g,
         CAST(sum(h * (split * ba + (w - split) * bb)) AS BIGINT) AS sum_b,
         CAST(sum(CASE WHEN pra IS NULL THEN 0 ELSE
           h * (split * (abs(ra - pra) + abs(ga - pga) + abs(ba - pba))
                + (w - split) * (abs(rb - prb) + abs(gb - pgb)
                                 + abs(bb - pbb))) END) AS BIGINT) AS motion
       FROM d GROUP BY doc_id ORDER BY doc_id"""

  // ---- m11: real image resize (decode → resample → re-encode) ---------

  case class ResizeFeatures(doc_id: Long, decode_ok: Boolean,
                            src_w: Long, src_h: Long,
                            out_w: Long, out_h: Long,
                            sum_r: Long, sum_g: Long, sum_b: Long)

  /** Per-doc resize target: 5..17 × 5..15 against 8..16 × 8..14
    * sources, so the battery exercises BOTH directions (upsample
    * repeats source columns, downsample drops them) and the identity
    * only by coincidence. */
  private[graft] def resizeW(id: Long): Int = 5 + (id % 13).toInt
  private[graft] def resizeH(id: Long): Int = 5 + (id % 11).toInt

  /** Nearest-neighbor resample of PNG bytes to (tw, th): decode
    * through the JDK codec, sample source pixel
    * (⌊x'·w/tw⌋, ⌊y'·h/th⌋) for each output pixel — the floor mapping,
    * documented so the oracle can replay which source COLUMN each
    * output column reads — and RE-ENCODE as PNG. Returns None on any
    * decode failure (NonFatal: JDK decoders throw unchecked on
    * malformed bytes). This is the real kernel behind the resize
    * step [[resizeStub]] only shapes: output bytes are a valid PNG of
    * exactly the resampled raster. */
  private[graft] def resizeKernel(png: Array[Byte], tw: Int,
                                  th: Int): Option[Array[Byte]] =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(png))
      if (img == null) return None
      val (w, h) = (img.getWidth, img.getHeight)
      val out = new java.awt.image.BufferedImage(
        tw, th, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < th) {
        val sy = (y.toLong * h / th).toInt
        var x = 0
        while (x < tw) {
          out.setRGB(x, y, img.getRGB((x.toLong * w / tw).toInt, sy))
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      Some(bos.toByteArray)
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Library surface: resize every payload to a fixed target; decode
    * failures carry through as NULL payloads (data, not dead tasks).
    * Narrow mapPartitions — payload bytes never shuffle. */
  def resizePng(images: DataFrame, tw: Int, th: Int): DataFrame = {
    import images.sparkSession.implicits._
    images.select(col("doc_id"), col("png"))
      .as[(Long, Array[Byte])].mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, png) => (id, resizeKernel(png, tw, th).orNull) }
      }.toDF("doc_id", "png")
  }

  /** m11: the resize ROUND TRIP under the oracle gate — render → PNG →
    * [[resizeKernel]] to the per-doc target → DECODE THE RE-ENCODED
    * BYTES AGAIN → per-channel sums. Measuring from the second decode
    * proves the emitted artifact is a valid PNG of exactly the
    * resampled raster (an encoder that wrote the wrong raster, or a
    * resample that read the wrong source column, breaks the hash).
    * The two-band source makes the check exact: output column x'
    * reads source column ⌊x'·w/tw⌋, so sum_r = th·(nA·ra + (tw−nA)·rb)
    * with nA = #{x' : ⌊x'·w/tw⌋ < split} — integer arithmetic DuckDB
    * replays per doc. Upgrades the mandate's "resize" from
    * [[resizeStub]]'s byte-shaping to a real codec path. */
  def imageResize(documents: DataFrame): DataFrame = {
    import documents.sparkSession.implicits._
    renderPng(documents).select(col("doc_id"), col("png"))
      .as[(Long, Array[Byte])].mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, png) =>
          val (tw, th) = (resizeW(id), resizeH(id))
          val feats = for {
            resized <- resizeKernel(png, tw, th)
            img <- Option(javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(resized)))
          } yield {
            var (sr, sg, sb) = (0L, 0L, 0L)
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                val p = img.getRGB(x, y)
                sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
                x += 1
              }
              y += 1
            }
            ResizeFeatures(id, decode_ok = true, imgW(id).toLong,
              imgH(id).toLong, img.getWidth.toLong, img.getHeight.toLong,
              sr, sg, sb)
          }
          feats.getOrElse(
            ResizeFeatures(id, decode_ok = false, 0, 0, 0, 0, 0, 0, 0))
        }
      }.toDF().orderBy(col("doc_id"))
  }

  /** DuckDB twin of [[imageResize]]: count which output columns land
    * left of the band split under the floor mapping, then the band
    * sums — a resample convention drift (round vs floor, x vs y order)
    * changes nA and breaks the hash. */
  val imageResizeOracle: String =
    """WITH p AS (SELECT doc_id,
           8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h,
           (8 + doc_id % 9) // 2 AS split,
           5 + doc_id % 13 AS tw, 5 + doc_id % 11 AS th,
           (doc_id * 5) % 256 AS ra, (doc_id * 7) % 256 AS ga,
           (doc_id * 13) % 256 AS ba, (doc_id * 3) % 256 AS rb,
           (doc_id * 11) % 256 AS gb, (doc_id * 17) % 256 AS bb
         FROM documents),
       xs AS (SELECT doc_id,
           unnest(generate_series(0, CAST(tw - 1 AS INT))) AS x FROM p),
       na AS (SELECT xs.doc_id,
           sum(CASE WHEN (xs.x * p.w) // p.tw < p.split THEN 1 ELSE 0 END) AS n_a
         FROM xs JOIN p ON xs.doc_id = p.doc_id GROUP BY xs.doc_id)
       SELECT p.doc_id, TRUE AS decode_ok,
         CAST(p.w AS BIGINT) AS src_w, CAST(p.h AS BIGINT) AS src_h,
         CAST(p.tw AS BIGINT) AS out_w, CAST(p.th AS BIGINT) AS out_h,
         CAST(p.th * (na.n_a * p.ra + (p.tw - na.n_a) * p.rb) AS BIGINT) AS sum_r,
         CAST(p.th * (na.n_a * p.ga + (p.tw - na.n_a) * p.gb) AS BIGINT) AS sum_g,
         CAST(p.th * (na.n_a * p.ba + (p.tw - na.n_a) * p.bb) AS BIGINT) AS sum_b
       FROM p JOIN na ON p.doc_id = na.doc_id ORDER BY p.doc_id"""

  // ---- m12: audio sample-rate conversion (decode → ZOH → re-encode) ---

  case class ResampleFeatures(doc_id: Long, decode_ok: Boolean,
                              src_frames: Long, out_rate: Long,
                              out_frames: Long, sum_v: Long,
                              sum_abs: Long, zero_cross: Long)

  /** Per-doc target rate against the 8 kHz source: 4 kHz (integral
    * downsample), 16 kHz (integral upsample), 6 kHz (the non-integral
    * 3:4 ratio where an index-mapping off-by-one actually shows). */
  private[graft] def resampleRate(id: Long): Int = (id % 3) match {
    case 0 => 4000
    case 1 => 16000
    case _ => 6000
  }

  /** Zero-order-hold resample of WAV bytes to dstRate: decode through
    * the JDK RIFF parser, map output frame j to source frame
    * ⌊j·srcRate/dstRate⌋ with ⌊n·dstRate/srcRate⌋ output frames — the
    * documented mapping the oracle replays — and RE-ENCODE as WAV at
    * the new rate. Layouts the mapping doesn't cover (stereo, 8-bit,
    * big-endian, float) and malformed bytes return None. */
  private[graft] def resampleKernel(wav: Array[Byte],
                                    dstRate: Int): Option[Array[Byte]] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(wav))
      val fmt = ais.getFormat
      if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 ||
          fmt.isBigEndian || fmt.getEncoding !=
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
        return None
      val srcRate = fmt.getSampleRate.toInt
      val bytes = ais.readAllBytes()
      val n = bytes.length / 2
      val m = (n.toLong * dstRate / srcRate).toInt
      val out = new Array[Byte](m * 2)
      var j = 0
      while (j < m) {
        val i = (j.toLong * srcRate / dstRate).toInt
        out(2 * j) = bytes(2 * i)
        out(2 * j + 1) = bytes(2 * i + 1)
        j += 1
      }
      val outFmt = new javax.sound.sampled.AudioFormat(dstRate.toFloat, 16, 1,
        /* signed = */ true, /* bigEndian = */ false)
      val outAis = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(out), outFmt, m.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(outAis,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      Some(bos.toByteArray)
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Library surface: rate-normalize every clip to a fixed target
    * (the audio pipeline's unconditional first step — models train at
    * ONE rate); undecodable payloads carry through as NULL. Narrow
    * mapPartitions, payload bytes never shuffle. */
  def resampleWav(audio: DataFrame, dstRate: Int): DataFrame = {
    import audio.sparkSession.implicits._
    audio.select(col("doc_id"), col("wav"))
      .as[(Long, Array[Byte])].mapPartitions { it =>
        it.map { case (id, wav) => (id, resampleKernel(wav, dstRate).orNull) }
      }.toDF("doc_id", "wav")
  }

  /** m12: the resample ROUND TRIP under the oracle gate — render →
    * WAV → [[resampleKernel]] to the per-doc rate → DECODE THE
    * RE-ENCODED BYTES AGAIN → sum / abs-sum / zero-crossings over the
    * output frames, plus the rate and frame count read back from the
    * new RIFF header. ZOH keeps every output sample equal to a
    * formula-addressable source sample, so the oracle replays the
    * index mapping exactly — a frame-count rounding drift, an
    * index-mapping off-by-one (6 kHz!), or a header that claims the
    * wrong rate all break the hash. The audio analogue of m11, same
    * contract: corrupt bytes degrade to decode_ok=false rows. */
  def audioResample(documents: DataFrame): DataFrame = {
    import documents.sparkSession.implicits._
    renderWav(documents).select(col("doc_id"), col("wav"))
      .as[(Long, Array[Byte])].mapPartitions { it =>
        it.map { case (id, wav) =>
          val feats = for {
            resampled <- resampleKernel(wav, resampleRate(id))
            out <- try {
              val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
                new java.io.ByteArrayInputStream(resampled))
              val fmt = ais.getFormat
              val bytes = ais.readAllBytes()
              val m = bytes.length / 2
              var sv = 0L; var sa = 0L; var zc = 0L
              var prevNeg = false
              var j = 0
              while (j < m) {
                val v = ((bytes(2 * j) & 0xff) | (bytes(2 * j + 1) << 8))
                  .toShort.toInt
                sv += v; sa += math.abs(v.toLong)
                val neg = v < 0
                if (j > 0 && neg != prevNeg) zc += 1
                prevNeg = neg
                j += 1
              }
              Some(ResampleFeatures(id, decode_ok = true,
                audioFrames(id).toLong, fmt.getSampleRate.toLong, m.toLong,
                sv, sa, zc))
            } catch { case scala.util.control.NonFatal(_) => None }
          } yield out
          feats.getOrElse(
            ResampleFeatures(id, decode_ok = false, 0, 0, 0, 0, 0, 0))
        }
      }.toDF().orderBy(col("doc_id"))
  }

  /** DuckDB twin of [[audioResample]]: generate the output frame
    * indices, map each back to its source frame, replay the waveform
    * formula, and aggregate — with lag() for the zero-crossing count
    * (order-sensitive, like m09's motion). */
  val audioResampleOracle: String =
    """WITH p AS (SELECT doc_id, 64 + doc_id % 129 AS n,
           CASE WHEN doc_id % 3 = 0 THEN 4000
                WHEN doc_id % 3 = 1 THEN 16000 ELSE 6000 END AS dst
         FROM documents),
       q AS (SELECT doc_id, n, dst, (n * dst) // 8000 AS m FROM p),
       j AS (SELECT doc_id, n, dst, m,
           unnest(generate_series(0, CAST(m - 1 AS INT))) AS j FROM q),
       s AS (SELECT doc_id, n, dst, m, j,
           ((doc_id * 31 + ((j * 8000) // dst) * 97) % 4096) - 2048 AS v
         FROM j),
       z AS (SELECT *, lag(v) OVER (PARTITION BY doc_id ORDER BY j) AS pv
         FROM s)
       SELECT doc_id, TRUE AS decode_ok,
         CAST(max(n) AS BIGINT) AS src_frames,
         CAST(max(dst) AS BIGINT) AS out_rate,
         CAST(max(m) AS BIGINT) AS out_frames,
         CAST(sum(v) AS BIGINT) AS sum_v,
         CAST(sum(abs(v)) AS BIGINT) AS sum_abs,
         CAST(sum(CASE WHEN pv IS NULL THEN 0
                       WHEN (v < 0) != (pv < 0) THEN 1 ELSE 0 END)
              AS BIGINT) AS zero_cross
       FROM z GROUP BY doc_id ORDER BY doc_id"""

  // ---- m10: inter-frame (GOP) video decode -----------------------------

  case class GopVideoFeatures(doc_id: Long, decode_ok: Boolean,
                              n_frames: Long, n_key: Long,
                              width: Long, height: Long,
                              sum_r: Long, sum_g: Long, sum_b: Long,
                              motion: Long)

  /** GOP clip spec: more frames than m09 (4..8) so every clip holds
    * at least one full keyframe interval, and a per-doc GOP size
    * (2..4) so the keyframe cadence itself is data the oracle checks. */
  private[graft] def gopFrameCount(id: Long): Int = 4 + (id % 5).toInt
  private[graft] def gopSize(id: Long): Int = 2 + (id % 3).toInt

  /** Render one band frame of the doc's clip (shared spec with m09:
    * left band [[frameColA]], right band [[frameColB]]). */
  private def renderBandFrame(id: Long, f: Int, w: Int, h: Int,
                              split: Int): java.awt.image.BufferedImage = {
    val (ra, ga, ba) = frameColA(id, f)
    val (rb, gb, bb) = frameColB(id, f)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, b) = if (x < split) (ra, ga, ba) else (rb, gb, bb)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    img
  }

  /** Render the doc's clip as a GVIP container — the INTER-FRAME
    * layout m09 declared out of scope, closed here with a GOP
    * (group-of-pictures) structure: magic ++ frame count ++ per frame
    * [type: 'I'|'P'][length][REAL PNG bytes], where every
    * [[gopSize]]-th frame is an I-frame (a full image) and every
    * other frame is a P-frame whose PNG stores the PER-PIXEL DELTA
    * vs the previous frame, each channel `(cur - prev) mod 256`.
    * Wraparound (not clamped) deltas make reconstruction EXACT
    * integer arithmetic — `(prev + delta) mod 256 == cur` for any
    * byte pair — which is what lets DuckDB oracle a stateful decode.
    * This is the real H.264-class dependency structure (you cannot
    * decode frame f without the frames back to its keyframe); only
    * the transform/entropy layers of a production codec stay
    * external. Narrow mapPartitions, no shuffle. */
  /** Encode a frame sequence as a GVIP container (the GOP encoder the
    * render path and the round-trip property test share). */
  private[graft] def encodeGop(frames: Seq[java.awt.image.BufferedImage],
                               g: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeBytes("GVIP")
    out.writeInt(frames.length)
    var prev: java.awt.image.BufferedImage = null
    var f = 0
    while (f < frames.length) {
      val cur = frames(f)
      val isKey = f % g == 0
      val payload =
        if (isKey) cur
        else {
          val (w, h) = (cur.getWidth, cur.getHeight)
          val d = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val c = cur.getRGB(x, y); val p = prev.getRGB(x, y)
              val dr = (((c >> 16) & 0xff) - ((p >> 16) & 0xff)) & 0xff
              val dg = (((c >> 8) & 0xff) - ((p >> 8) & 0xff)) & 0xff
              val db = ((c & 0xff) - (p & 0xff)) & 0xff
              d.setRGB(x, y, (dr << 16) | (dg << 8) | db)
              x += 1
            }
            y += 1
          }
          d
        }
      out.writeByte(if (isKey) 'I' else 'P')
      val fb = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(payload, "png", fb)
      val png = fb.toByteArray
      out.writeInt(png.length)
      out.write(png)
      prev = cur
      f += 1
    }
    bos.toByteArray
  }

  def renderGopVideo(documents: DataFrame): DataFrame = {
    import documents.sparkSession.implicits._
    documents.select(col("doc_id")).as[Long].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { id =>
        val (w, h, split) = (imgW(id), imgH(id), imgW(id) / 2)
        val frames = (0 until gopFrameCount(id)).map(
          renderBandFrame(id, _, w, h, split))
        (id, encodeGop(frames, gopSize(id)))
      }
    }.toDF("doc_id", "video")
  }

  /** m10: STATEFUL inter-frame video decode under the oracle gate —
    * parse the GVIP container and reconstruct every frame: I-frames
    * PNG-decode directly; P-frames PNG-decode to a delta image that
    * is applied to the PREVIOUS RECONSTRUCTED frame channel-wise mod
    * 256. The decoder carries the reconstruction across the frame
    * loop — drop any frame since the last keyframe and every later
    * P-frame in the GOP decodes wrong, which is exactly the
    * inter-frame failure mode intra-only m09 cannot express. Features
    * are the m09 battery (channel totals + order-sensitive motion
    * energy) over the RECONSTRUCTED frames plus the keyframe count,
    * so a botched delta application, a missed keyframe reset, or a
    * P-frame decoded as an I-frame all break the DuckDB hash.
    * Corrupt containers — bad magic, a P-frame first (no state to
    * predict from), truncated payloads, mid-clip dimension changes —
    * degrade to decode_ok=false rows, never dead tasks. */
  def gopVideoDecode(documents: DataFrame): DataFrame =
    decodeGopFeatures(renderGopVideo(documents)).orderBy(col("doc_id"))

  /** The decode half alone: (doc_id, video) → [[GopVideoFeatures]]. */
  def decodeGopFeatures(videos: DataFrame): DataFrame = {
    import videos.sparkSession.implicits._
    videos.select(col("doc_id"), col("video"))
      .as[(Long, Array[Byte])].mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, bytes) =>
          try {
            val in = new java.io.DataInputStream(
              new java.io.ByteArrayInputStream(bytes))
            val magic = new Array[Byte](4)
            in.readFully(magic)
            if (new String(magic, "US-ASCII") != "GVIP")
              throw new java.io.IOException("bad container magic")
            val nf = in.readInt()
            if (nf <= 0 || nf > 1024)
              throw new java.io.IOException(s"implausible frame count $nf")
            var (w, h) = (0, 0)
            var (sr, sg, sb) = (0L, 0L, 0L)
            var (motion, nKey) = (0L, 0L)
            // reconstruction state: packed RGB of the previous frame
            var prev: Array[Int] = null
            var f = 0
            while (f < nf) {
              val marker = in.readByte().toChar
              if (marker != 'I' && marker != 'P')
                throw new java.io.IOException(s"bad frame marker $marker")
              if (marker == 'P' && prev == null)
                throw new java.io.IOException("P-frame with no reference")
              val len = in.readInt()
              if (len <= 0 || len > bytes.length)
                throw new java.io.IOException(s"bad frame length $len")
              val fb = new Array[Byte](len)
              in.readFully(fb)
              val img = javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(fb))
              if (img == null)
                throw new java.io.IOException("unrecognized frame")
              if (f == 0) { w = img.getWidth; h = img.getHeight }
              else if (img.getWidth != w || img.getHeight != h)
                throw new java.io.IOException("frame dimension change")
              val cur = new Array[Int](w * h)
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val p = img.getRGB(x, y)
                  val rgb =
                    if (marker == 'I') p & 0xffffff
                    else {
                      val q = prev(y * w + x)
                      val r = (((q >> 16) & 0xff) + ((p >> 16) & 0xff)) & 0xff
                      val g = (((q >> 8) & 0xff) + ((p >> 8) & 0xff)) & 0xff
                      val b = ((q & 0xff) + (p & 0xff)) & 0xff
                      (r << 16) | (g << 8) | b
                    }
                  sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff
                  sb += rgb & 0xff
                  if (prev != null) {
                    val q = prev(y * w + x)
                    motion += math.abs(((rgb >> 16) & 0xff) - ((q >> 16) & 0xff)) +
                      math.abs(((rgb >> 8) & 0xff) - ((q >> 8) & 0xff)) +
                      math.abs((rgb & 0xff) - (q & 0xff))
                  }
                  cur(y * w + x) = rgb
                  x += 1
                }
                y += 1
              }
              if (marker == 'I') nKey += 1
              prev = cur
              f += 1
            }
            GopVideoFeatures(id, decode_ok = true, nf.toLong, nKey,
              w.toLong, h.toLong, sr, sg, sb, motion)
          } catch {
            case scala.util.control.NonFatal(_) =>
              GopVideoFeatures(id, decode_ok = false, 0, 0, 0, 0, 0, 0, 0, 0)
          }
        }
      }.toDF()
  }

  /** DuckDB twin of [[gopVideoDecode]]: the reconstruction is exact
    * (`(prev + (cur - prev) mod 256) mod 256 == cur` for bytes), so
    * the oracle replays the same band arithmetic as m09's — over the
    * m10 frame count — plus the keyframe cadence
    * `count(f % gop == 0)`. If the Scala decoder's stateful
    * reconstruction drifted by even one channel step the sums and
    * motion would diverge from this closed form. */
  val gopVideoDecodeOracle: String =
    """WITH p AS (SELECT doc_id,
           8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h,
           (8 + doc_id % 9) // 2 AS split,
           4 + doc_id % 5 AS nf, 2 + doc_id % 3 AS g
         FROM documents),
       f AS (SELECT doc_id, w, h, split, nf, g,
           unnest(generate_series(0, CAST(nf - 1 AS INT))) AS f FROM p),
       c AS (SELECT doc_id, w, h, split, nf, g, f,
           (doc_id * 5 + f * 19) % 256 AS ra,
           (doc_id * 7 + f * 23) % 256 AS ga,
           (doc_id * 13 + f * 29) % 256 AS ba,
           (doc_id * 3 + f * 31) % 256 AS rb,
           (doc_id * 11 + f * 37) % 256 AS gb,
           (doc_id * 17 + f * 41) % 256 AS bb
         FROM f),
       d AS (SELECT *,
           lag(ra) OVER fw AS pra, lag(ga) OVER fw AS pga,
           lag(ba) OVER fw AS pba, lag(rb) OVER fw AS prb,
           lag(gb) OVER fw AS pgb, lag(bb) OVER fw AS pbb
         FROM c WINDOW fw AS (PARTITION BY doc_id ORDER BY f))
       SELECT doc_id, TRUE AS decode_ok,
         CAST(max(nf) AS BIGINT) AS n_frames,
         CAST(sum(CASE WHEN f % g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_key,
         CAST(max(w) AS BIGINT) AS width, CAST(max(h) AS BIGINT) AS height,
         CAST(sum(h * (split * ra + (w - split) * rb)) AS BIGINT) AS sum_r,
         CAST(sum(h * (split * ga + (w - split) * gb)) AS BIGINT) AS sum_g,
         CAST(sum(h * (split * ba + (w - split) * bb)) AS BIGINT) AS sum_b,
         CAST(sum(CASE WHEN pra IS NULL THEN 0 ELSE
           h * (split * (abs(ra - pra) + abs(ga - pga) + abs(ba - pba))
                + (w - split) * (abs(rb - prb) + abs(gb - pgb)
                                 + abs(bb - pbb))) END) AS BIGINT) AS motion
       FROM d GROUP BY doc_id ORDER BY doc_id"""

  // ---- m13: GOP-aware frame extraction (seek + bounded decode) --------

  case class GopExtractFeatures(doc_id: Long, decode_ok: Boolean,
                                n_frames: Long, n_sampled: Long,
                                n_decoded: Long, sum_r: Long,
                                sum_g: Long, sum_b: Long)

  /** m13: extract every frame with index ≡ 1 (mod `stride`) from the
    * GVIP container WITHOUT decoding the rest — the real shape of
    * "sample every k-th frame" once the codec is inter-frame: a
    * sampled P-frame needs its keyframe chain, so the extractor
    * decodes exactly the merged runs [max(keyframe(s), prev_sample+1)
    * .. s] and LENGTH-SKIPS every other frame's bytes (no PNG decode
    * — the decode-cost analogue of partition pruning; n_decoded is
    * the cost the oracle audits). Features are the channel sums over
    * the SAMPLED frames only, measured from the reconstruction, so a
    * chain started mid-GOP, a skipped frame that was actually needed,
    * or an extractor that lazily decodes everything (n_decoded!) all
    * break the hash. Every clip has ≥4 frames, so frame 1 is always
    * sampled and no doc drops out. Narrow mapPartitions; corrupt
    * containers degrade to decode_ok=false. */
  def gopFrameExtract(documents: DataFrame, stride: Int = 3): DataFrame =
    extractGopFrames(renderGopVideo(documents), stride)
      .orderBy(col("doc_id"))

  /** The extract half alone: (doc_id, video) → [[GopExtractFeatures]]. */
  def extractGopFrames(videos: DataFrame, stride: Int): DataFrame = {
    import videos.sparkSession.implicits._
    videos.select(col("doc_id"), col("video"))
      .as[(Long, Array[Byte])].mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, bytes) =>
          try {
            val in = new java.io.DataInputStream(
              new java.io.ByteArrayInputStream(bytes))
            val magic = new Array[Byte](4)
            in.readFully(magic)
            if (new String(magic, "US-ASCII") != "GVIP")
              throw new java.io.IOException("bad container magic")
            val nf = in.readInt()
            if (nf <= 0 || nf > 1024)
              throw new java.io.IOException(s"implausible frame count $nf")
            val g = gopSize(id)
            val samples = (0 until nf).filter(_ % stride == 1)
            // merged decode runs: from the governing keyframe, or the
            // frame after the previous sample when its state is live
            val needed = new Array[Boolean](nf)
            var last = -1
            samples.foreach { s =>
              val key = s - s % g
              var f = if (last >= key) last + 1 else key
              while (f <= s) { needed(f) = true; f += 1 }
              last = s
            }
            val sampled = new Array[Boolean](nf)
            samples.foreach(sampled(_) = true)
            var (w, h) = (0, 0)
            var (sr, sg, sb) = (0L, 0L, 0L)
            var nDecoded = 0L
            var state: Array[Int] = null
            var f = 0
            while (f < nf) {
              val marker = in.readByte().toChar
              if (marker != 'I' && marker != 'P')
                throw new java.io.IOException(s"bad frame marker $marker")
              val len = in.readInt()
              if (len <= 0 || len > bytes.length)
                throw new java.io.IOException(s"bad frame length $len")
              if (!needed(f)) {
                in.skipBytes(len) // seek: bytes read past, never decoded
              } else {
                if (marker == 'P' && state == null)
                  throw new java.io.IOException("P-frame chain started mid-GOP")
                val fb = new Array[Byte](len)
                in.readFully(fb)
                val img = javax.imageio.ImageIO.read(
                  new java.io.ByteArrayInputStream(fb))
                if (img == null)
                  throw new java.io.IOException("unrecognized frame")
                if (w == 0) { w = img.getWidth; h = img.getHeight }
                else if (img.getWidth != w || img.getHeight != h)
                  throw new java.io.IOException("frame dimension change")
                nDecoded += 1
                val cur = new Array[Int](w * h)
                var y = 0
                while (y < h) {
                  var x = 0
                  while (x < w) {
                    val p = img.getRGB(x, y)
                    val rgb =
                      if (marker == 'I') p & 0xffffff
                      else {
                        val q = state(y * w + x)
                        val r = (((q >> 16) & 0xff) + ((p >> 16) & 0xff)) & 0xff
                        val gg = (((q >> 8) & 0xff) + ((p >> 8) & 0xff)) & 0xff
                        val b = ((q & 0xff) + (p & 0xff)) & 0xff
                        (r << 16) | (gg << 8) | b
                      }
                    cur(y * w + x) = rgb
                    if (sampled(f)) {
                      sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff
                      sb += rgb & 0xff
                    }
                    x += 1
                  }
                  y += 1
                }
                state = cur
              }
              f += 1
            }
            GopExtractFeatures(id, decode_ok = true, nf.toLong,
              samples.length.toLong, nDecoded, sr, sg, sb)
          } catch {
            case scala.util.control.NonFatal(_) =>
              GopExtractFeatures(id, decode_ok = false, 0, 0, 0, 0, 0, 0)
          }
        }
      }.toDF()
  }

  /** DuckDB twin of [[gopFrameExtract]]: the decode runs are disjoint
    * by construction (samples ascend), so the cost is the closed form
    * Σ_s (s − max(keyframe(s), prev_s + 1) + 1) via lag — an
    * extractor that decodes every frame, or re-decodes a live chain
    * from its keyframe, disagrees with this sum. Sampled-frame sums
    * replay the band arithmetic. */
  def gopExtractOracle(stride: Int = 3): String =
    s"""WITH p AS (SELECT doc_id,
           8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h,
           (8 + doc_id % 9) // 2 AS split,
           4 + doc_id % 5 AS nf, 2 + doc_id % 3 AS g
         FROM documents),
       f AS (SELECT doc_id, w, h, split, nf, g,
           unnest(generate_series(0, CAST(nf - 1 AS INT))) AS s FROM p),
       sm AS (SELECT * FROM f WHERE s % $stride = 1),
       d AS (SELECT *,
           lag(s) OVER (PARTITION BY doc_id ORDER BY s) AS ps FROM sm),
       c AS (SELECT doc_id, w, h, split, nf, s,
           s - greatest(s - s % g, coalesce(ps + 1, 0)) + 1 AS dec_cnt,
           (doc_id * 5 + s * 19) % 256 AS ra,
           (doc_id * 7 + s * 23) % 256 AS ga,
           (doc_id * 13 + s * 29) % 256 AS ba,
           (doc_id * 3 + s * 31) % 256 AS rb,
           (doc_id * 11 + s * 37) % 256 AS gb,
           (doc_id * 17 + s * 41) % 256 AS bb
         FROM d)
       SELECT doc_id, TRUE AS decode_ok,
         CAST(max(nf) AS BIGINT) AS n_frames,
         CAST(count(*) AS BIGINT) AS n_sampled,
         CAST(sum(dec_cnt) AS BIGINT) AS n_decoded,
         CAST(sum(h * (split * ra + (w - split) * rb)) AS BIGINT) AS sum_r,
         CAST(sum(h * (split * ga + (w - split) * gb)) AS BIGINT) AS sum_g,
         CAST(sum(h * (split * ba + (w - split) * bb)) AS BIGINT) AS sum_b
       FROM c GROUP BY doc_id ORDER BY doc_id"""

  // ---- m08: windowed audio energy (VAD-style activity detection) ------

  case class AudioWindowFeatures(doc_id: Long, decode_ok: Boolean,
                                 n_windows: Long, n_active: Long,
                                 peak_window: Long, peak_energy: Long)

  /** m08: WINDOWED energy over the decoded PCM — the audio analogue
    * of m03's frame sampling and the first step of every
    * voice-activity / silence-trimming pass: the clip splits into
    * fixed 32-frame windows (last one partial), each window's energy
    * is its absolute-amplitude sum, windows above the threshold count
    * as ACTIVE, and the peak window is reported (energy desc, lowest
    * index on ties — deterministic). Decode is the REAL WAV path
    * ([[renderWav]] → the JDK RIFF parser), not the waveform formula;
    * the oracle replays the window arithmetic from the spec, so a
    * windowing off-by-one (frame 32 in window 0, a dropped partial
    * tail) breaks the hash. All-integer features — no double hazards.
    *
    * Scale shape: same as m06/m07 — narrow mapPartitions end to end,
    * zero data shuffles, peak memory one clip per task. Corrupt
    * payloads degrade to decode_ok=false rows. */
  def audioWindows(documents: DataFrame, win: Int = 32,
                   threshold: Long = 32768L): DataFrame =
    windowFeatures(renderWav(documents), win, threshold)
      .orderBy(col("doc_id"))

  /** The windowing half alone: (doc_id, wav) → [[AudioWindowFeatures]].
    */
  def windowFeatures(audio: DataFrame, win: Int = 32,
                     threshold: Long = 32768L): DataFrame = {
    import audio.sparkSession.implicits._
    audio.select(col("doc_id"), col("wav"))
      .as[(Long, Array[Byte])].mapPartitions { it =>
        it.map { case (id, wav) =>
          try {
            val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(wav))
            val fmt = ais.getFormat
            if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 ||
                fmt.isBigEndian || fmt.getEncoding !=
                  javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
              throw new java.io.IOException(s"unsupported PCM layout: $fmt")
            val bytes = ais.readAllBytes()
            val n = bytes.length / 2
            val nWin = (n + win - 1) / win
            var nActive = 0L; var peakW = 0L; var peakE = -1L
            var w = 0
            while (w < nWin) {
              var e = 0L
              var i = w * win
              val end = math.min((w + 1) * win, n)
              while (i < end) {
                val v = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8))
                  .toShort.toInt
                e += math.abs(v.toLong)
                i += 1
              }
              if (e > threshold) nActive += 1
              if (e > peakE) { peakE = e; peakW = w.toLong }
              w += 1
            }
            AudioWindowFeatures(id, decode_ok = true, nWin.toLong,
              nActive, peakW, peakE)
          } catch {
            case scala.util.control.NonFatal(_) =>
              AudioWindowFeatures(id, decode_ok = false, 0, 0, 0, 0)
          }
        }
      }.toDF()
  }

  /** DuckDB twin of [[audioWindows]]: the window arithmetic replayed
    * from the waveform spec (i // win buckets the frames; peak picked
    * by energy desc, window index asc). */
  def audioWindowsOracle(win: Int = 32, threshold: Long = 32768L): String =
    s"""WITH p AS (SELECT doc_id, 64 + doc_id % 129 AS n FROM documents),
       s AS (SELECT doc_id, n,
               unnest(generate_series(0, CAST(n - 1 AS INT))) AS i FROM p),
       v AS (SELECT doc_id, i // $win AS wdx,
               abs(((doc_id * 31 + i * 97) % 4096) - 2048) AS a FROM s),
       w AS (SELECT doc_id, wdx, CAST(sum(a) AS BIGINT) AS energy
             FROM v GROUP BY 1, 2),
       r AS (SELECT doc_id, wdx, energy,
               row_number() OVER (PARTITION BY doc_id
                 ORDER BY energy DESC, wdx) AS rk FROM w)
       SELECT doc_id, TRUE AS decode_ok,
         CAST(count(*) AS BIGINT) AS n_windows,
         CAST(sum(CASE WHEN energy > $threshold THEN 1 ELSE 0 END)
              AS BIGINT) AS n_active,
         CAST(max(CASE WHEN rk = 1 THEN wdx END) AS BIGINT) AS peak_window,
         CAST(max(CASE WHEN rk = 1 THEN energy END) AS BIGINT) AS peak_energy
       FROM r GROUP BY doc_id ORDER BY doc_id"""

  /** DuckDB twin of [[audioDecode]]: the waveform arithmetic replayed
    * sample-by-sample (per-doc series ≤ 192 samples — bounded work,
    * no codec involved on the oracle side). */
  def audioDecodeOracle: String =
    """WITH p AS (SELECT doc_id, 64 + doc_id % 129 AS n FROM documents),
       s AS (SELECT doc_id, n,
               unnest(generate_series(0, CAST(n - 1 AS INT))) AS i FROM p),
       v AS (SELECT doc_id, n, i,
               ((doc_id * 31 + i * 97) % 4096) - 2048 AS val FROM s),
       c AS (SELECT doc_id, n, val,
               lag(val) OVER (PARTITION BY doc_id ORDER BY i) AS pv FROM v)
       SELECT doc_id, TRUE AS decode_ok,
         CAST(n AS BIGINT) AS frames,
         CAST(8000 AS BIGINT) AS sample_rate,
         CAST(1 AS BIGINT) AS channels,
         CAST(16 AS BIGINT) AS bits,
         CAST(sum(val) AS BIGINT) AS sum_v,
         CAST(sum(abs(val)) AS BIGINT) AS sum_abs,
         CAST(max(abs(val)) AS BIGINT) AS peak_abs,
         CAST(sum(CASE WHEN pv IS NOT NULL AND ((pv < 0) <> (val < 0))
                       THEN 1 ELSE 0 END) AS BIGINT) AS zero_cross
       FROM c GROUP BY doc_id, n ORDER BY doc_id"""

  // ---- m14: perceptual-hash image dedup (aHash over the raster) -------

  case class PhashFeatures(doc_id: Long, decode_ok: Boolean,
                           ph_hi: Long, ph_lo: Long)

  /** Bottom-quadrant colors for the m14 raster (top quadrants reuse
    * [[colA]]/[[colB]]): four flat regions give the 8×8 hash grid four
    * luminance levels, so the bit pattern varies with both the split
    * geometry and the per-doc color draws. */
  private[graft] def colC(id: Long): (Int, Int, Int) =
    (((id * 19) % 256).toInt, ((id * 23) % 256).toInt, ((id * 29) % 256).toInt)
  private[graft] def colD(id: Long): (Int, Int, Int) =
    (((id * 37) % 256).toInt, ((id * 41) % 256).toInt, ((id * 43) % 256).toInt)

  /** Render the doc's QUADRANT image (m06 geometry, four flat color
    * regions split at w/2 × h/2) as real PNG bytes. */
  def renderQuadPng(documents: DataFrame): DataFrame = {
    import documents.sparkSession.implicits._
    documents.select(col("doc_id")).as[Long].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { id =>
        val (w, h) = (imgW(id), imgH(id))
        val (split, vsplit) = (w / 2, h / 2)
        val ca = colA(id); val cb = colB(id)
        val cc = colC(id); val cd = colD(id)
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val (r, g, b) =
              if (y < vsplit) { if (x < split) ca else cb }
              else { if (x < split) cc else cd }
            img.setRGB(x, y, (r << 16) | (g << 8) | b)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        (id, bos.toByteArray)
      }
    }.toDF("doc_id", "png")
  }

  /** aHash (average hash) of PNG bytes, measured from the DECODED
    * raster: nearest-neighbor downsample to the 8×8 grid under the
    * documented floor mapping (⌊x·w/8⌋, ⌊y·h/8⌋ — m11's convention),
    * per-cell luminance lum = r + g + b, bit(x,y) = 1 iff
    * lum(x,y)·64 > Σ lums (the strict integer form of "above the
    * mean" — no double mean ever materializes). Rows 0–3 pack into
    * `ph_hi`, rows 4–7 into `ph_lo` (bit position 8·y + x within each
    * half), so both halves stay far inside the positive BIGINT range
    * on both engines. Corrupt bytes → decode_ok=false, zero hash. */
  def phashFeatures(images: DataFrame): DataFrame = {
    import images.sparkSession.implicits._
    images.select(col("doc_id"), col("png"))
      .as[(Long, Array[Byte])].mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, png) =>
          try {
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(png))
            if (img == null) throw new java.io.IOException("unrecognized image")
            val (w, h) = (img.getWidth, img.getHeight)
            val lum = Array.ofDim[Long](8, 8)
            var total = 0L
            var y = 0
            while (y < 8) {
              var x = 0
              while (x < 8) {
                val p = img.getRGB((x * w / 8), (y * h / 8))
                val l = ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
                lum(y)(x) = l; total += l
                x += 1
              }
              y += 1
            }
            var (hi, lo) = (0L, 0L)
            y = 0
            while (y < 8) {
              var x = 0
              while (x < 8) {
                if (lum(y)(x) * 64L > total) {
                  if (y < 4) hi |= 1L << (8 * y + x)
                  else lo |= 1L << (8 * (y - 4) + x)
                }
                x += 1
              }
              y += 1
            }
            PhashFeatures(id, decode_ok = true, hi, lo)
          } catch {
            case scala.util.control.NonFatal(_) =>
              PhashFeatures(id, decode_ok = false, 0L, 0L)
          }
        }
      }.toDF()
  }

  /** m14: PERCEPTUAL-hash image dedup — the image modality's answer to
    * d06's content digest: aHash ignores pixel-exact differences
    * (resize, re-encode, slight level shifts move few bits) where
    * sha-256 changes completely, so equal-hash buckets group VISUALLY
    * equivalent images. The full pipeline runs the REAL codec path
    * ([[renderQuadPng]] → PNG decode → 8×8 aHash) and then d01/d06's
    * keep-min-id census on the perceptual key: per doc, its hash, the
    * bucket's canonical keeper and the bucket size.
    *
    * Oracle-ability: the quadrant raster makes every hash bit a
    * closed-form integer comparison (cell luminance vs the 64-cell
    * total) DuckDB replays per doc — a downsample off-by-one, a
    * channel-weight drift, or a wrong packing order breaks the hash.
    *
    * Scale shape: hashing is a narrow mapPartitions over the scan
    * (payload bytes never shuffle); the census is ONE shuffle of
    * 16-byte hash keys + small ints — d06's exact plan with the
    * digest swapped for the perceptual key, so the apply/compose
    * stages (d10, t19) would slot in unchanged. At 100 TB the hash
    * column is the persisted asset; hamming-near pairs (the d03
    * analogue) band over the four 16-bit hash chunks if needed.
    */
  def imagePhash(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("ph_hi"), col("ph_lo"))
    phashFeatures(renderQuadPng(documents))
      .withColumn("keep_id", min(col("doc_id")).over(w))
      .withColumn("bucket_size", count(lit(1)).over(w))
      .select(col("doc_id"), col("decode_ok"), col("ph_hi"), col("ph_lo"),
              col("keep_id"), col("bucket_size"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB twin of [[imagePhash]]: per doc, which of the 8 sample
    * columns/rows land in the A-side of each split (floor mapping),
    * the four quadrant luminances, the 64-cell total, then the row
    * patterns packed exactly as the Scala bit loop does. */
  def imagePhashOracle: String =
    """WITH p AS (SELECT doc_id,
           8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h,
           (8 + doc_id % 9) // 2 AS split, (8 + doc_id % 7) // 2 AS vsplit,
           (doc_id * 5) % 256 + (doc_id * 7) % 256 + (doc_id * 13) % 256 AS la,
           (doc_id * 3) % 256 + (doc_id * 11) % 256 + (doc_id * 17) % 256 AS lb,
           (doc_id * 19) % 256 + (doc_id * 23) % 256 + (doc_id * 29) % 256 AS lc,
           (doc_id * 37) % 256 + (doc_id * 41) % 256 + (doc_id * 43) % 256 AS ld
         FROM documents),
       q AS (SELECT *,
           len(list_filter(generate_series(0, 7), x -> (x * w) // 8 < split)) AS nxa,
           len(list_filter(generate_series(0, 7), y -> (y * h) // 8 < vsplit)) AS nya
         FROM p),
       t AS (SELECT *,
           nya * (nxa * la + (8 - nxa) * lb)
             + (8 - nya) * (nxa * lc + (8 - nxa) * ld) AS total FROM q),
       b AS (SELECT *,
           list_sum(list_transform(generate_series(0, 7), x ->
             CASE WHEN (CASE WHEN (x * w) // 8 < split THEN la ELSE lb END) * 64
                       > total THEN 1 << x ELSE 0 END)) AS rowtop,
           list_sum(list_transform(generate_series(0, 7), x ->
             CASE WHEN (CASE WHEN (x * w) // 8 < split THEN lc ELSE ld END) * 64
                       > total THEN 1 << x ELSE 0 END)) AS rowbot
         FROM t),
       hsh AS (SELECT doc_id,
           coalesce(list_sum(list_transform(generate_series(0, 3), y ->
             (CASE WHEN (y * h) // 8 < vsplit THEN rowtop ELSE rowbot END)
               * (CAST(1 AS BIGINT) << (8 * y)))), 0) AS ph_hi,
           coalesce(list_sum(list_transform(generate_series(4, 7), y ->
             (CASE WHEN (y * h) // 8 < vsplit THEN rowtop ELSE rowbot END)
               * (CAST(1 AS BIGINT) << (8 * (y - 4))))), 0) AS ph_lo
         FROM b)
       SELECT doc_id, TRUE AS decode_ok,
         CAST(ph_hi AS BIGINT) AS ph_hi, CAST(ph_lo AS BIGINT) AS ph_lo,
         CAST(min(doc_id) OVER (PARTITION BY ph_hi, ph_lo) AS BIGINT) AS keep_id,
         CAST(count(*) OVER (PARTITION BY ph_hi, ph_lo) AS BIGINT) AS bucket_size
       FROM hsh ORDER BY doc_id"""
}

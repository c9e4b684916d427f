package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support (builder contract): image/audio/video
  * travel as opaque `BINARY` columns with typed metadata; decode /
  * feature-extract / resize / frame-sample run as batched
  * per-partition transforms.
  *
  * IMAGE decode ([[Codecs.decodeImage]]), multi-frame decode
  * ([[Codecs.decodeFrames]]) and resize ([[Codecs.resizeImage]]) are
  * REAL — the JDK's built-in `javax.imageio`/`Graphics2D`
  * (PNG/JPEG/BMP/GIF, no external libraries). The synthetic
  * `image/fake` rows and the audio/video paths remain deterministic
  * STUBS (this container has no audio/video libraries):
  * [[Codecs.decodeImageStub]] etc. derive fake metadata from the
  * bytes. Everything around the codec slot — schema, encoders,
  * partition-preserving batched execution, the binary round-trip — is
  * real and tested (MultimodalSpec, E03).
  *
  * In Scala the batched-vectorized shape is `mapPartitions` over an
  * iterator that is consumed in fixed-size batches (the JVM analogue of
  * `mapInPandas` batches); swapping the stub for a real codec changes
  * one function.
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, media_type: String, payload: Array[Byte])
  case class ImageFeatures(doc_id: Long, byte_len: Int, sha256: String,
      width: Int, height: Int, channels: Int, brightness: Double)
  case class FrameSample(doc_id: Long, frame_idx: Int, frame_sha: String)
  case class FrameFeatures(doc_id: Long, frame_idx: Int, width: Int,
      height: Int, channels: Int, brightness: Double)

  object Codecs {
    /** STUB image decode — a real implementation would parse the codec
      * header; this derives (width, height, channels, mean-brightness)
      * deterministically from the payload bytes. */
    def decodeImageStub(payload: Array[Byte]): (Int, Int, Int, Double) = {
      val n = payload.length
      val w = 64 + (if (n > 0) (payload(0) & 0x7f) else 0)
      val h = 64 + (if (n > 1) (payload(1) & 0x7f) else 0)
      val mean = if (n == 0) 0.0
        else payload.iterator.map(b => (b & 0xff).toDouble).sum / n / 255.0
      (w, h, 3, math.rint(mean * 1e6) / 1e6)
    }

    /** REAL image decode via the JDK's built-in `javax.imageio`
      * (PNG/JPEG/BMP/GIF — no external libraries, works offline):
      * (width, height, bands, mean brightness). Brightness is the mean
      * of every sample across all bands, each normalized by its band's
      * full-scale value (component bit depth), rounded to 1e-6 —
      * deterministic for a given payload. `None` when ImageIO cannot
      * decode the bytes (corrupt/unsupported) — callers choose the
      * sentinel. This is the "swap the stub for a real codec" slot the
      * class doc promises, exercised end-to-end in MultimodalSpec;
      * vectorized native codecs (libjpeg-turbo etc.) would slot in the
      * same way with per-batch amortization. */
    def decodeImage(payload: Array[Byte]): Option[(Int, Int, Int, Double)] =
      decodePayload(payload).map(frameStats)

    /** THE single-frame decode entry — every consumer of a decoded
      * still image ([[decodeImage]], [[dHash]], [[resizeImage]]) goes
      * through here, so the corrupt-payload discipline lives in ONE
      * place (VERDICT r14): NonFatal, not just IOException — the JDK
      * readers throw runtime exceptions (IndexOutOfBounds,
      * NegativeArraySize, …) on some malformed/truncated payloads, and
      * at corpus scale one fuzzed image must become a sentinel row,
      * never a failed job. `None` when the bytes don't decode. */
    private def decodePayload(payload: Array[Byte])
        : Option[java.awt.image.BufferedImage] =
      Option(
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        catch { case scala.util.control.NonFatal(_) => null })

    /** (width, height, bands, mean brightness) of one decoded frame.
      * PALETTE-INDEXED frames (GIF, indexed PNG) are resolved to RGB
      * first: their raster samples are palette INDICES, and averaging
      * indices would make "brightness" an artifact of palette order
      * rather than of the pixels. */
    private def frameStats(im0: java.awt.image.BufferedImage)
        : (Int, Int, Int, Double) = {
      val im =
        if (!im0.getColorModel.isInstanceOf[java.awt.image.IndexColorModel]) im0
        else {
          val rgb = new java.awt.image.BufferedImage(im0.getWidth,
            im0.getHeight, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = rgb.createGraphics()
          try g.drawImage(im0, 0, 0, null) finally g.dispose()
          rgb
        }
      val (w, h) = (im.getWidth, im.getHeight)
      val raster = im.getRaster
      val c = raster.getNumBands
      val cm = im.getColorModel
      var sum = 0.0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          var b = 0
          while (b < c) {
            val full = (1L << cm.getComponentSize(
              math.min(b, cm.getNumComponents - 1))) - 1L
            sum += raster.getSampleDouble(x, y, b) / full
            b += 1
          }
          x += 1
        }
        y += 1
      }
      val denom = w.toLong * h * c
      val mean = if (denom == 0) 0.0 else sum / denom
      (w, h, c, math.rint(mean * 1e6) / 1e6)
    }

    /** REAL multi-frame decode via `javax.imageio` readers (animated
      * GIF is the JDK-native multi-frame format; a single-frame
      * PNG/JPEG/BMP decodes as one frame): per-frame
      * (width, height, bands, mean brightness), same conventions as
      * [[decodeImage]]. `None` when no reader accepts the bytes or the
      * payload is corrupt mid-stream — callers choose the sentinel
      * (the [[decodeImage]] rule: corrupt media is data, not an
      * error). */
    def decodeFrames(payload: Array[Byte])
        : Option[Vector[(Int, Int, Int, Double)]] =
      try {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) None
          else {
            val reader = readers.next()
            try {
              // seekForwardOnly=false: getNumImages(true) walks the
              // whole stream before the frames are read back
              reader.setInput(iis, false, true)
              val n = reader.getNumImages(true)
              Some((0 until n).map(i => frameStats(reader.read(i))).toVector)
            } finally reader.dispose()
          }
        } finally if (iis != null) iis.close()
      } catch { case scala.util.control.NonFatal(_) => None }

    /** REAL resize (VERDICT r9 task 4 — the last stub with an
      * offline-feasible implementation): decode via `javax.imageio`,
      * scale to FIT WITHIN maxW×maxH preserving aspect ratio
      * (`Graphics2D` bilinear — the same zero-dependency JDK pattern
      * as [[decodeImage]]/[[decodeFrames]]), re-encode as PNG
      * (lossless and deterministic: a brightness assertion survives the
      * round-trip; JPEG would make the output quantizer-dependent).
      * An image already within bounds passes through BYTE-IDENTICAL —
      * no decode/re-encode churn, and downstream exact-dedup hashes
      * are preserved for the (typical) already-small majority. `None`
      * when the bytes don't decode — callers choose the sentinel. */
    def resizeImage(payload: Array[Byte], maxW: Int,
        maxH: Int): Option[Array[Byte]] =
      try {
        decodePayload(payload).flatMap { img =>
          // scale/encode guarded by the outer catch: a decodable-but-
          // degenerate image failing mid-encode is still data, not an
          // error
          val scale = math.min(1.0, math.min(
            maxW.toDouble / img.getWidth, maxH.toDouble / img.getHeight))
          if (scale >= 1.0) Some(payload)
          else {
            val w = math.max(1, math.round(img.getWidth * scale).toInt)
            val h = math.max(1, math.round(img.getHeight * scale).toInt)
            // alpha-aware target (ADVICE r10): an unconditional RGB
            // buffer composites transparent PNG/GIF pixels onto
            // uninitialized black — resized transparent images silently
            // gained black backgrounds while already-fitting ones kept
            // their alpha, an inconsistent output contract. The rule:
            // the output carries an alpha channel iff the input did
            // (opaque sources stay 3-band, preserving downstream
            // channel/brightness stats).
            val dst = new java.awt.image.BufferedImage(w, h,
              if (img.getColorModel.hasAlpha)
                java.awt.image.BufferedImage.TYPE_INT_ARGB
              else java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = dst.createGraphics()
            try {
              g.setRenderingHint(
                java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(img, 0, 0, w, h, null)
            } finally g.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(dst, "png", bos)
            Some(bos.toByteArray)
          }
        }
      } catch { case scala.util.control.NonFatal(_) => None }

    /** 64-bit difference hash (dHash) of an encoded image — the
      * standard public perceptual fingerprint (Krawetz's
      * hackerfactor writeup popularized it): decode, scale to 9×8,
      * grayscale (ITU-R 601 luma), and bit `y·8+x` records whether
      * luminance INCREASES from column x to x+1 in row y. Gradients,
      * not values: a re-encode, a resize, or a global brightness
      * shift moves every pixel together and leaves the 64
      * neighbor-comparisons (hence the hash) nearly unchanged, while
      * distinct images disagree on ~half the bits. Deterministic for
      * a given payload (same JDK bilinear scaler as [[resizeImage]]).
      * `None` when the bytes don't decode — corrupt media is data,
      * not an error (the [[decodeImage]] rule). */
    def dHash(payload: Array[Byte]): Option[Long] =
      try {
        decodePayload(payload).map { img =>
          val dst = new java.awt.image.BufferedImage(9, 8,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = dst.createGraphics()
          try {
            g.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, 9, 8, null)
          } finally g.dispose()
          def lum(x: Int, y: Int): Double = {
            val rgb = dst.getRGB(x, y)
            0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
              0.114 * (rgb & 0xff)
          }
          var bits = 0L
          var i = 0
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              if (lum(x, y) < lum(x + 1, y)) bits |= (1L << i)
              i += 1
              x += 1
            }
            y += 1
          }
          bits
        }
      } catch { case scala.util.control.NonFatal(_) => None }

    /** STUB frame sampling for the SYNTHETIC `image/fake` payloads —
      * every `stride`-th 16-byte window is a "frame". Retained (not
      * retired) deliberately: the fake rows' bytes are UTF-8 text, not
      * an encoded image, so the real [[decodeFrames]] path can never
      * apply to them; this stub is what keeps the fake corpus
      * deterministic through [[sampleFrames]] and the `image/fake`
      * branch of `extractFrameFeatures`. Real media types take the
      * real decoder (VERDICT r8 task 7 / r9 task 4). */
    def sampleFramesStub(payload: Array[Byte], stride: Int): Seq[Array[Byte]] =
      payload.grouped(16).zipWithIndex.collect {
        case (frame, i) if i % stride == 0 => frame
      }.toSeq

    def sha256Hex(bytes: Array[Byte]): String =
      MessageDigest.getInstance("SHA-256").digest(bytes)
        .map(b => f"$b%02x").mkString
  }

  /** Build a media table from documents: the UTF-8 payload stands in for
    * an encoded image. BinaryType column + typed metadata. */
  def mediaTable(s: SparkSession, dir: String): Dataset[MediaRecord] = {
    import s.implicits._
    graft.Tables(s, dir, "documents")
      .select($"doc_id", lit("image/fake").as("media_type"),
        encode($"text", "UTF-8").as("payload"))
      .as[MediaRecord]
  }

  /** Batched per-partition feature extraction. The `grouped(batchSize)`
    * shape is the integration point for a VECTORIZED decoder (real
    * codecs amortize per-call setup across a batch); it also means the
    * task holds up to `batchSize` raw payloads at once — size it DOWN
    * when payloads are MBs (a per-record codec could use batchSize=1
    * for strictly minimal memory; the stub decodes per record either
    * way, so results never depend on the batch split). */
  def extractImageFeatures(media: Dataset[MediaRecord],
      batchSize: Int = 64): Dataset[ImageFeatures] = {
    require(batchSize > 0, s"batchSize must be positive: $batchSize")
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { rec =>
          // `image/fake` rows (the synthetic mediaTable) keep the
          // deterministic stub; any other media type decodes FOR REAL
          // via javax.imageio. Undecodable real-typed payloads emit the
          // (-1, -1, 0, 0.0) sentinel instead of failing the job — at
          // corpus scale corrupt images are data, not errors (filter
          // `width >= 0` downstream).
          val (w, h, c, bright) =
            if (rec.media_type == "image/fake")
              Codecs.decodeImageStub(rec.payload)
            else Codecs.decodeImage(rec.payload).getOrElse((-1, -1, 0, 0.0))
          ImageFeatures(rec.doc_id, rec.payload.length,
            Codecs.sha256Hex(rec.payload), w, h, c, bright)
        }
      }
    }
  }

  /** Bound every image to maxW×maxH (aspect-preserving downscale, never
    * an upscale) — the standard pre-training normalization pass over a
    * crawled image corpus, where a handful of huge images dominate
    * storage and decode cost downstream. Dispatch follows
    * [[extractImageFeatures]]: real media types resize for real
    * ([[Codecs.resizeImage]] — already-fitting payloads pass through
    * byte-identical); `image/fake` synthetic rows pass through
    * untouched (their bytes are not an encoded image); an undecodable
    * real payload emits an EMPTY payload with media_type
    * `"corrupt/" + original` — a visible sentinel row, never a failed
    * job (filter `length(payload) > 0` or `media_type NOT LIKE
    * 'corrupt/%'` downstream). Partition-preserving map; batch shape as
    * in [[extractImageFeatures]]. */
  def resizeImages(media: Dataset[MediaRecord], maxW: Int, maxH: Int,
      batchSize: Int = 64): Dataset[MediaRecord] = {
    require(maxW > 0 && maxH > 0, s"bounds must be positive: $maxW x $maxH")
    require(batchSize > 0, s"batchSize must be positive: $batchSize")
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { rec =>
          if (rec.media_type == "image/fake") rec
          else Codecs.resizeImage(rec.payload, maxW, maxH) match {
            case Some(bytes) => rec.copy(payload = bytes)
            case None => rec.copy(media_type = s"corrupt/${rec.media_type}",
              payload = Array.emptyByteArray)
          }
        }
      }
    }
  }

  case class ImageFingerprint(doc_id: Long, fp: Long)

  /** Perceptual fingerprints ([[Codecs.dHash]]) of every DECODABLE real
    * image in `media` — the feature half of [[imageNearDupPairs]].
    * Synthetic `image/fake` rows (UTF-8 text, not an encoded image) and
    * undecodable payloads are dropped, not errors: at corpus scale a
    * corrupt image must cost a row, never a job. Partition-preserving
    * batched map, the [[extractImageFeatures]] shape. */
  def imageFingerprints(media: Dataset[MediaRecord],
      batchSize: Int = 64): Dataset[ImageFingerprint] = {
    require(batchSize > 0, s"batchSize must be positive: $batchSize")
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.flatMap { rec =>
        if (rec.media_type == "image/fake") None
        else Codecs.dHash(rec.payload).map(ImageFingerprint(rec.doc_id, _))
      })
    }
  }

  /** IMAGE NEAR-DUP (E11 — the north-star composition VERDICT r13 asked
    * for): all pairs of decodable images within Hamming distance
    * `maxDist` of each other's 64-bit dHash — re-encoded, resized and
    * brightness-shifted copies pair; distinct images do not (default 10
    * of 64 bits; distinct images disagree on ~32). The pair search is
    * [[graft.operators.HammingJoin]] — the oracle-verified banded
    * pigeonhole self-join behind q52 — NOT an all-pairs comparison, so
    * the 100 TB posture is the q52 one: candidates per band bucket, an
    * equi-join Spark shuffles on its keys, exact XOR+popcount verify.
    * Output: (doc_id_a < doc_id_b, hamming). Eager like
    * [[graft.operators.HammingJoin.selfJoin]]. */
  def imageNearDupPairs(media: Dataset[MediaRecord], maxDist: Int = 10,
      batchSize: Int = 64): DataFrame =
    graft.operators.HammingJoin.selfJoin(
      imageFingerprints(media, batchSize).toDF(), "doc_id", "fp", maxDist,
      bits = 64)

  /** Incremental image near-dup: every Hamming-≤`maxDist` dHash pair
    * INTRODUCED by the `delta` batch (at least one end new) without
    * ever comparing corpus images to each other — the per-increment
    * shape of image dedup ([[graft.operators.HammingJoin.newPairs]];
    * candidate volume tracks the delta, not the corpus, and in
    * production the corpus side is the stored fingerprint column, not
    * re-decoded images — pass it via [[imageFingerprints]] output
    * persisted from earlier batches). Undecodable/`image/fake` rows
    * drop on both sides, like [[imageNearDupPairs]]. Ids must be
    * globally unique across corpus ∪ delta. */
  def imageNearDupPairsDelta(corpus: Dataset[MediaRecord],
      delta: Dataset[MediaRecord], maxDist: Int = 10,
      batchSize: Int = 64): DataFrame =
    graft.operators.HammingJoin.newPairs(
      imageFingerprints(corpus, batchSize).toDF(),
      imageFingerprints(delta, batchSize).toDF(),
      "doc_id", "fp", maxDist, bits = 64)

  /** IMAGE DEDUP, one call (VERDICT r14 task 4 — the media twin of
    * `Graft.dedupPipeline`): fingerprint → banded near-dup pairs →
    * greedy min-id retention. Returns the retained rows of `media` —
    * for every near-dup pair the smaller doc_id survives (q76's greedy
    * rule, [[graft.operators.Dedup.greedyRetain]]). Rows that produce
    * no fingerprint (synthetic `image/fake`, undecodable payloads) are
    * RETAINED: they can't be shown near-dup of anything, and dropping
    * corrupt rows is the quality gate's job, not dedup's. */
  def imageDedup(media: Dataset[MediaRecord], maxDist: Int = 10,
      batchSize: Int = 64): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    val pairs = imageNearDupPairs(media, maxDist, batchSize)
    graft.operators.Dedup.greedyRetain(media.toDF(), pairs,
      "doc_id", "doc_id_b").as[MediaRecord]
  }

  /** Incremental [[imageDedup]]: retain the rows of the `delta` batch
    * that are near-dup of neither the corpus nor an earlier delta row —
    * pairs from [[imageNearDupPairsDelta]] (candidate volume tracks
    * the delta), retention the same greedy min-id rule. Requires delta
    * ids STRICTLY GREATER than every corpus id (the pipeline's
    * strictly-increasing-ids contract): a delta dup of a corpus image
    * is then always the pair's greater side, so retention drops the
    * newcomer and never the already-published corpus row. The corpus
    * is returned unchanged by definition — only delta rows are
    * decided. */
  def imageDedupDelta(corpus: Dataset[MediaRecord],
      delta: Dataset[MediaRecord], maxDist: Int = 10,
      batchSize: Int = 64): Dataset[MediaRecord] = {
    import delta.sparkSession.implicits._
    val pairs = imageNearDupPairsDelta(corpus, delta, maxDist, batchSize)
    graft.operators.Dedup.greedyRetain(delta.toDF(), pairs,
      "doc_id", "doc_id_b").as[MediaRecord]
  }

  /** Frame sampling: one media row → many frame rows (generator shape). */
  def sampleFrames(media: Dataset[MediaRecord], stride: Int = 4): Dataset[FrameSample] = {
    // driver-side argument error, not an executor-side ArithmeticException
    // (i % 0) mid-job; a negative stride would silently sample at |stride|
    require(stride > 0, s"stride must be positive: $stride")
    import media.sparkSession.implicits._
    media.flatMap { rec =>
      Codecs.sampleFramesStub(rec.payload, stride).zipWithIndex.map {
        case (frame, i) => FrameSample(rec.doc_id, i, Codecs.sha256Hex(frame))
      }
    }
  }

  /** REAL frame sampling with per-frame features (VERDICT r8 task 7 —
    * the last stubbed codec with an offline-feasible implementation):
    * every `stride`-th frame of each media row decodes to
    * (width, height, channels, brightness) via
    * [[Codecs.decodeFrames]]; `frame_idx` is the ORIGINAL frame index
    * (0, stride, 2·stride, …), so consumers see which frames were
    * kept. Dispatch mirrors [[extractImageFeatures]]: `image/fake`
    * rows keep the deterministic byte-window stub (each stub "frame"
    * through [[Codecs.decodeImageStub]]); any other media type decodes
    * for real, and an undecodable payload emits ONE sentinel row
    * (frame_idx −1, width/height −1) instead of failing the job. */
  def extractFrameFeatures(media: Dataset[MediaRecord],
      stride: Int = 1): Dataset[FrameFeatures] = {
    require(stride > 0, s"stride must be positive: $stride")
    import media.sparkSession.implicits._
    media.flatMap { rec =>
      if (rec.media_type == "image/fake")
        Codecs.sampleFramesStub(rec.payload, stride).zipWithIndex.map {
          case (frame, i) =>
            val (w, h, c, bright) = Codecs.decodeImageStub(frame)
            FrameFeatures(rec.doc_id, i * stride, w, h, c, bright)
        }
      else Codecs.decodeFrames(rec.payload) match {
        case Some(frames) => frames.zipWithIndex.collect {
          case ((w, h, c, bright), i) if i % stride == 0 =>
            FrameFeatures(rec.doc_id, i, w, h, c, bright)
        }
        case None => Seq(FrameFeatures(rec.doc_id, -1, -1, -1, 0, 0.0))
      }
    }
  }
}

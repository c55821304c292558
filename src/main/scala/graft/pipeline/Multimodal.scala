package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed partition-locally.
  *
  * The Spark-side machinery — schema, partitioning, batch shape,
  * mapPartitions signatures — is real and tested. PNG/JPEG images
  * decode for REAL via the JDK's built-in ImageIO codecs
  * ([[renderImage]] / [[decodeImageDims]]), WAV audio decodes for REAL
  * via javax.sound ([[renderWav]] / [[decodeAudioStats]]: format, frame
  * count, sample RMS), GIF video decodes for REAL frame-by-frame
  * ([[renderGif]] / [[decodeVideoStats]]), image feature extraction is
  * REAL ([[imagePHash]]: decode → integer block grid → aHash/dHash;
  * [[extractFeatures]]: decode → blockwise exact integer mean/variance
  * grid + float embedding), and resize is REAL ([[resizeImage]]:
  * nearest-neighbor rescale + lossless re-encode). Nothing on this
  * surface is stubbed; a learned embedding model (a codec this
  * container lacks) would drop into the same mapPartitions shape as
  * [[extractFeatures]] without touching the dataflow.
  */
object Multimodal {

  // ImageIO's stream cache defaults to FileCache*: every read/write
  // call spools the (tiny, in-memory) payload through a disk temp file.
  // Memory-backed streams decode the same bytes to the same pixels —
  // bit-identical — without a create/delete of a temp file per row.
  // JVM-global, set on class load (executors load this object before
  // first use; local mode shares the driver JVM).
  javax.imageio.ImageIO.setUseCache(false)

  /** Canonical media-table schema: opaque payload + typed metadata. */
  val schema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("codec", StringType, nullable = true))),
      nullable = true)))

  final case class MediaMeta(width: Option[Int], height: Option[Int],
      durationMs: Option[Long], codec: Option[String])
  final case class MediaRecord(mediaId: Long, kind: String,
      payload: Array[Byte], meta: MediaMeta)

  /** Payload statistics — pure byte-level, fully real. */
  def byteLength(payload: Column): Column = length(payload)

  /** Evenly sample `n` frames (byte slices) from a payload — the real
    * plumbing of video frame-sampling: slice offsets are computed from
    * metadata, output is an array of binary chunks. */
  def frameSample(payload: Column, n: Int, frameBytes: Int): Column = {
    val total = length(payload)
    val span = greatest(total - frameBytes, lit(0))
    transform(sequence(lit(0), lit(n - 1)), i => {
      val offset = span * i / lit(math.max(n - 1, 1)) + 1
      payload.substr(offset, lit(frameBytes))
    })
  }

  /** One decoded image reduced to a blockwise integer moment grid:
    * per-block EXACT luma sum and cleared-denominator variance
    * numerator (`n·Σg² − (Σg)²`, n = pixels per block) — all-integer,
    * so a SQL oracle recomputes both arrays bit-for-bit from a
    * generative pixel formula. `features` is the float embedding
    * derived from the same integers (normalized block means then
    * normalized variances, 2·grid² dims) for downstream ANN/near-dup
    * composition. Sentinel (-1 dims, empty arrays) for undecodable
    * payloads or sides not a multiple of `grid`. */
  final case class ImageFeatures(media_id: Long, width: Int, height: Int,
      block_sum: Array[Long], block_var_num: Array[Long],
      features: Array[Float])

  /** REAL image feature extraction: decode each payload with ImageIO,
    * reduce the integer-luma plane to a `grid`×`grid` matrix of exact
    * block sums and sum-of-squares, and emit (sums, variance
    * numerators, float embedding) per image — the decoded-raster
    * feature every image-curation stage downstream composes with
    * (near-dup via [[graft.pipeline.Ann]] cosine, quality filters on
    * blockwise contrast, SemDeDup-style clustering). Variance uses the
    * cleared-denominator form `n·Σg² − (Σg)²` so no division touches
    * the integers; with luma ≤ 255 and blocks up to 256² px the terms
    * stay far inside a signed 64-bit long. Runs as typed
    * mapPartitions: one codec instance per partition, batched rows —
    * expensive init amortized across the partition. */
  def extractFeatures(ds: Dataset[MediaRecord], grid: Int = 4)
      : Dataset[ImageFeatures] = {
    require(grid >= 1 && grid <= 64, s"grid must be in [1, 64], got $grid")
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { rec =>
        val img =
          try javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(rec.payload))
          catch { case _: java.io.IOException => null }
        if (img == null || img.getWidth % grid != 0 ||
            img.getHeight % grid != 0)
          ImageFeatures(rec.mediaId, -1, -1,
            Array.empty[Long], Array.empty[Long], Array.empty[Float])
        else {
          val (bw, bh) = (img.getWidth / grid, img.getHeight / grid)
          val n = bw.toLong * bh
          val s = new Array[Long](grid * grid)
          val ss = new Array[Long](grid * grid)
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              // integer luma of an RGB pixel; gray fixtures (r=g=b=v)
              // reduce to exactly v since (299+587+114)v/1000 = v
              val rgb = img.getRGB(x, y)
              val lum = (299 * ((rgb >> 16) & 0xFF) +
                587 * ((rgb >> 8) & 0xFF) + 114 * (rgb & 0xFF)) / 1000
              val b = (y / bh) * grid + x / bw
              s(b) += lum
              ss(b) += lum.toLong * lum
              x += 1
            }
            y += 1
          }
          val varNum = Array.tabulate(grid * grid)(b =>
            n * ss(b) - s(b) * s(b))
          val feats = new Array[Float](2 * grid * grid)
          var b = 0
          while (b < grid * grid) {
            feats(b) = (s(b).toDouble / (255.0 * n)).toFloat
            feats(grid * grid + b) =
              (varNum(b).toDouble / (255.0 * 255.0 * n * n)).toFloat
            b += 1
          }
          ImageFeatures(rec.mediaId, img.getWidth, img.getHeight,
            s, varNum, feats)
        }
      }
    }
  }

  /** REAL image resize: decode with ImageIO, nearest-neighbor rescale
    * of the pixel grid — source index is the exact integer
    * `sx = x·W div outW` (no interpolation, no float), so the output
    * pixels are a pure arithmetic function of the input and a SQL
    * oracle can restate a resized fixture bit-for-bit — and re-encode
    * as lossless PNG. The canonical thumbnail/normalize step before
    * feature extraction; one codec instance per partition; undecodable
    * payloads pass through unchanged with codec "undecodable" (a
    * 100 TB corpus always contains corrupt blobs, and a resize stage
    * must not drop or kill them). */
  def resizeImage(ds: Dataset[MediaRecord], outW: Int, outH: Int)
      : Dataset[MediaRecord] = {
    require(outW > 0 && outH > 0, s"bad target size ${outW}x$outH")
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { rec =>
        val img =
          try javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(rec.payload))
          catch { case _: java.io.IOException => null }
        if (img == null)
          rec.copy(meta = rec.meta.copy(codec = Some("undecodable")))
        else {
          val out = new java.awt.image.BufferedImage(
            outW, outH, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < outH) {
            val sy = (y.toLong * img.getHeight / outH).toInt
            var x = 0
            while (x < outW) {
              val sx = (x.toLong * img.getWidth / outW).toInt
              out.setRGB(x, y, img.getRGB(sx, sy) & 0xFFFFFF)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          require(javax.imageio.ImageIO.write(out, "png", bos),
            "no registered ImageIO writer for format 'png'")
          rec.copy(payload = bos.toByteArray,
            meta = rec.meta.copy(width = Some(outW), height = Some(outH),
              codec = Some("png")))
        }
      }
    }
  }

  final case class ImageDims(media_id: Long, width: Int, height: Int,
      codec: String)

  /** Render a REAL single-color image per (id, width, height) row with
    * the JDK's ImageIO encoder — the fixture side of the image path
    * (the synthetic testdata carries no media files). `format` is any
    * registered ImageIO writer name ("png", "jpg", "gif"); the stored
    * codec tag is the format's canonical name. One encoder per
    * partition via mapPartitions; headless-safe (BufferedImage never
    * touches a display). */
  def renderImage(ds: Dataset[(Long, Int, Int)],
      format: String): Dataset[MediaRecord] = {
    val codec = format match {
      case "jpg" => "jpeg"
      case f     => f
    }
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { case (id, w, h) =>
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        // deterministic per-id fill so payload bytes differ across rows
        val rgb = (id * 2654435761L & 0xFFFFFF).toInt
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { img.setRGB(x, y, rgb); x += 1 }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        // write() returns false (no exception) for an unregistered
        // format name — fail here, not later as null dims downstream
        require(javax.imageio.ImageIO.write(img, format, bos),
          s"no registered ImageIO writer for format '$format'")
        MediaRecord(id, "image", bos.toByteArray,
          MediaMeta(None, None, None, Some(codec)))
      }
    }
  }

  def renderPng(ds: Dataset[(Long, Int, Int)]): Dataset[MediaRecord] =
    renderImage(ds, "png")

  /** REAL image decode: parse each payload with ImageIO (PNG/JPEG/GIF —
    * whatever the JVM's registered readers handle) and report the
    * intrinsic pixel dimensions. Partition-local decoding — the same
    * shape as [[extractFeatures]]; a payload no reader accepts reports
    * (-1, -1, "undecodable") instead of failing the job (a 100 TB
    * corpus always contains corrupt blobs). */
  def decodeImageDims(ds: Dataset[MediaRecord]): Dataset[ImageDims] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { rec =>
        val img =
          try javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(rec.payload))
          catch { case _: java.io.IOException => null }
        if (img == null) ImageDims(rec.mediaId, -1, -1, "undecodable")
        else ImageDims(rec.mediaId, img.getWidth, img.getHeight,
          rec.meta.codec.getOrElse("image"))
      }
    }
  }

  final case class AudioStats(media_id: Long, sample_rate: Long,
      channels: Long, n_frames: Long, rms: Double, codec: String)

  /** Render a REAL RIFF/WAVE payload per (id, sampleRate, nFrames) row:
    * PCM signed 16-bit little-endian mono, written by the JDK's
    * javax.sound WAV writer. The signal is an alternating ±A square
    * wave with A = 1000 + id % 100, so the decoded RMS is EXACTLY A —
    * an integer ground truth a SQL oracle can state without modeling
    * float accumulation. One encoder per partition (mapPartitions). */
  def renderWav(ds: Dataset[(Long, Int, Int)]): Dataset[MediaRecord] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { case (id, rate, frames) =>
        val amp = (1000 + id % 100).toInt
        val pcm = new Array[Byte](frames * 2)
        var i = 0
        while (i < frames) {
          val v = if ((i & 1) == 0) amp else -amp
          pcm(2 * i) = (v & 0xFF).toByte
          pcm(2 * i + 1) = ((v >> 8) & 0xFF).toByte
          i += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(
          rate.toFloat, 16, 1, true, false)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        MediaRecord(id, "audio", bos.toByteArray,
          MediaMeta(None, None, Some(frames.toLong * 1000 / rate),
            Some("pcm_s16le")))
      }
    }
  }

  /** REAL audio decode: parse each payload with javax.sound's WAV
    * reader and report format (rate, channels), frame count, and the
    * RMS amplitude of the decoded PCM16 samples. Partition-local; an
    * unreadable payload reports a (-1, …, "undecodable") sentinel row
    * instead of failing the job. */
  def decodeAudioStats(ds: Dataset[MediaRecord]): Dataset[AudioStats] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { rec =>
        try {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(rec.payload))
          val fmt = ais.getFormat
          val bytes = ais.readAllBytes()
          val n = bytes.length / 2
          var sumSq = 0.0
          var i = 0
          while (i < n) {
            // PCM16 little-endian, mono or interleaved — RMS over all
            val v = ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xFF))
              .toDouble
            sumSq += v * v
            i += 1
          }
          val rms = if (n == 0) 0.0 else math.sqrt(sumSq / n)
          AudioStats(rec.mediaId, fmt.getSampleRate.toLong,
            fmt.getChannels.toLong, ais.getFrameLength,
            math.rint(rms * 1e6) / 1e6, "pcm_s16le")
        } catch {
          case _: javax.sound.sampled.UnsupportedAudioFileException |
              _: java.io.IOException =>
            AudioStats(rec.mediaId, -1L, -1L, -1L, -1.0, "undecodable")
        }
      }
    }
  }

  final case class VideoStats(media_id: Long, n_frames: Long, width: Long,
      height: Long, sampled_frames: Long, intensity_sum: Long, codec: String)

  /** Render a REAL multi-frame animated GIF per (id, side, nFrames) row
    * with the JDK's ImageIO GIF sequence writer — the fixture side of
    * the video path. Frame `f` is a solid gray at level
    * `(id*31 + f*17) mod 256`; frames are TYPE_BYTE_INDEXED over a full
    * 256-gray palette so the encoder stores the level losslessly (no
    * quantization — the decode oracle can state the intensity as
    * integer arithmetic). One writer per payload, one codec instance
    * per partition (mapPartitions). */
  def renderGif(ds: Dataset[(Long, Int, Int)]): Dataset[MediaRecord] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      val grays = Array.tabulate(256)(_.toByte)
      val palette = new java.awt.image.IndexColorModel(
        8, 256, grays, grays, grays)
      it.map { case (id, side, nFrames) =>
        val bos = new java.io.ByteArrayOutputStream()
        val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
        val writer = javax.imageio.ImageIO
          .getImageWritersByFormatName("gif").next()
        require(writer.canWriteSequence,
          "JDK GIF writer lost sequence support")
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        var f = 0
        while (f < nFrames) {
          val g = ((id * 31 + f * 17) % 256).toInt
          val img = new java.awt.image.BufferedImage(side, side,
            java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, palette)
          val raster = img.getRaster
          var y = 0
          while (y < side) {
            var x = 0
            while (x < side) { raster.setSample(x, y, 0, g); x += 1 }
            y += 1
          }
          writer.writeToSequence(
            new javax.imageio.IIOImage(img, null, null), null)
          f += 1
        }
        writer.endWriteSequence()
        writer.dispose()
        ios.close()
        MediaRecord(id, "video", bos.toByteArray,
          MediaMeta(Some(side), Some(side), Some(nFrames * 40L),
            Some("gif")))
      }
    }
  }

  /** REAL video decode + frame-sample: parse each payload with the
    * ImageIO GIF reader, count ALL frames (`getNumImages(true)` walks
    * the stream), then decode only every `stride`-th frame — the
    * canonical training-pipeline shape where a 10-minute clip yields a
    * handful of keyframes and the decoder must NOT materialize the
    * rest. Emits the exact per-frame mean intensity summed over the
    * sampled frames (solid-gray fixture frames make the mean an
    * integer). Unreadable payloads yield a (-1, …, "undecodable")
    * sentinel instead of failing the job. */
  def decodeVideoStats(ds: Dataset[MediaRecord], stride: Int = 2)
      : Dataset[VideoStats] = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { rec =>
        var iis: javax.imageio.stream.ImageInputStream = null
        try {
          iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(rec.payload))
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext)
            VideoStats(rec.mediaId, -1L, -1L, -1L, -1L, -1L, "undecodable")
          else {
            val reader = readers.next()
            try {
              reader.setInput(iis, false, true)
              val n = reader.getNumImages(true)
              val w = reader.getWidth(0)
              val h = reader.getHeight(0)
              var sampled = 0L
              var sum = 0L
              var f = 0
              while (f < n) {
                val img = reader.read(f)
                var acc = 0L
                var y = 0
                while (y < img.getHeight) {
                  var x = 0
                  while (x < img.getWidth) {
                    acc += (img.getRGB(x, y) & 0xFF) // gray: B==G==R
                    x += 1
                  }
                  y += 1
                }
                sum += acc / (img.getWidth.toLong * img.getHeight)
                sampled += 1
                f += stride
              }
              VideoStats(rec.mediaId, n.toLong, w.toLong, h.toLong,
                sampled, sum, rec.meta.codec.getOrElse("gif"))
            } finally reader.dispose()
          }
        } catch {
          case _: java.io.IOException =>
            VideoStats(rec.mediaId, -1L, -1L, -1L, -1L, -1L, "undecodable")
        } finally if (iis != null) iis.close()
      }
    }
  }

  /** One detected scene cut: frame `frame` starts a new shot because
    * its mean intensity jumped ≥ threshold from the previous frame. */
  final case class SceneCut(media_id: Long, frame: Long, prev_mean: Long,
      mean: Long, delta: Long)

  /** REAL scene-cut detection: decode EVERY frame of each video
    * payload, compute the exact per-frame mean intensity (integer
    * floor division — exact on the solid-gray fixture frames), and
    * emit a row wherever the frame-to-frame absolute delta reaches
    * `threshold` — the shot-boundary detector a video curation
    * pipeline runs before per-shot keyframe extraction.
    *
    * Scale shape: the frame scan is LOCAL to each payload — one
    * sequential decode per video inside `mapPartitions`, no state
    * across rows, no shuffle at all; output ∝ cut count. At 100 TB the
    * operator is pure scan parallelism: partition count × decode
    * throughput, with the frame-lag comparison in the decode loop
    * instead of a window over an exploded frame table (which would
    * shuffle W×H×F pixels worth of rows for a per-video-local
    * computation). Unreadable payloads yield no rows (they are the
    * `decodeVideoStats` sentinel's job to report). */
  def detectSceneCuts(ds: Dataset[MediaRecord], threshold: Long)
      : Dataset[SceneCut] = {
    require(threshold > 0, s"threshold must be positive, got $threshold")
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.flatMap { rec =>
        var iis: javax.imageio.stream.ImageInputStream = null
        try {
          iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(rec.payload))
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) Iterator.empty
          else {
            val reader = readers.next()
            try {
              reader.setInput(iis, false, true)
              val n = reader.getNumImages(true)
              val cuts =
                scala.collection.mutable.ArrayBuffer.empty[SceneCut]
              var prev = -1L
              var f = 0
              while (f < n) {
                val img = reader.read(f)
                var acc = 0L
                var y = 0
                while (y < img.getHeight) {
                  var x = 0
                  while (x < img.getWidth) {
                    acc += (img.getRGB(x, y) & 0xFF)
                    x += 1
                  }
                  y += 1
                }
                val mean = acc / (img.getWidth.toLong * img.getHeight)
                if (f > 0 && math.abs(mean - prev) >= threshold)
                  cuts += SceneCut(rec.mediaId, f.toLong, prev, mean,
                    math.abs(mean - prev))
                prev = mean
                f += 1
              }
              cuts.iterator
            } finally reader.dispose()
          }
        } catch {
          case _: java.io.IOException => Iterator.empty
        } finally if (iis != null) iis.close()
      }
    }
  }

  /** One extracted keyframe: the FIRST frame of shot `shot` (shot 0
    * starts at frame 0; each ≥-threshold intensity jump starts the
    * next), with its exact integer mean intensity and the frame
    * re-encoded as a standalone PNG — the still a downstream
    * captioning / image-embedding stage consumes. */
  final case class KeyFrame(media_id: Long, shot: Long, frame: Long,
      mean: Long, png: Array[Byte])

  /** Per-shot keyframe extraction — the stage AFTER shot-boundary
    * detection in a video curation pipeline: decode each payload once,
    * segment it into shots with the same frame-lag rule as
    * [[detectSceneCuts]], and emit ONLY each shot's first frame,
    * re-encoded as a lossless PNG. A 10-minute clip yields a handful
    * of stills; everything else is decoded, measured, and dropped in
    * the same sequential pass.
    *
    * Scale shape: identical to [[detectSceneCuts]] — per-payload local
    * loop inside `mapPartitions`, no shuffle, output ∝ shots. The PNG
    * bytes ride the SAME map stage (no second decode pass keyed by the
    * cut table). Unreadable payloads yield no rows. */
  def extractKeyframes(ds: Dataset[MediaRecord], threshold: Long)
      : Dataset[KeyFrame] = {
    require(threshold > 0, s"threshold must be positive, got $threshold")
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.flatMap { rec =>
        var iis: javax.imageio.stream.ImageInputStream = null
        try {
          iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(rec.payload))
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) Iterator.empty
          else {
            val reader = readers.next()
            try {
              reader.setInput(iis, false, true)
              val n = reader.getNumImages(true)
              val frames =
                scala.collection.mutable.ArrayBuffer.empty[KeyFrame]
              var prev = -1L
              var shot = -1L
              var f = 0
              while (f < n) {
                val img = reader.read(f)
                // one pixel pass: accumulate the mean AND copy raw
                // blue-channel samples into a gray raster (drawImage
                // would run an sRGB→linear color conversion and bend
                // the stored values)
                val gray = new java.awt.image.BufferedImage(
                  img.getWidth, img.getHeight,
                  java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
                val raster = gray.getRaster
                var acc = 0L
                var y = 0
                while (y < img.getHeight) {
                  var x = 0
                  while (x < img.getWidth) {
                    val v = img.getRGB(x, y) & 0xFF
                    raster.setSample(x, y, 0, v)
                    acc += v
                    x += 1
                  }
                  y += 1
                }
                val mean = acc / (img.getWidth.toLong * img.getHeight)
                if (f == 0 || math.abs(mean - prev) >= threshold) {
                  shot += 1
                  val bos = new java.io.ByteArrayOutputStream()
                  javax.imageio.ImageIO.write(gray, "png", bos)
                  frames += KeyFrame(rec.mediaId, shot, f.toLong, mean,
                    bos.toByteArray)
                }
                prev = mean
                f += 1
              }
              frames.iterator
            } finally reader.dispose()
          }
        } catch {
          case _: java.io.IOException => Iterator.empty
        } finally if (iis != null) iis.close()
      }
    }
  }

  /** Per-image intensity statistics for quality gating: pixel count,
    * distinct 8-bit levels, and Shannon entropy of the level histogram
    * in bits (round-6). Undecodable payloads yield the (-1, 0, -1)
    * sentinel. */
  final case class ImageEntropy(media_id: Long, n_px: Long,
      distinct_levels: Long, entropy_bits: Double)

  /** REAL image-entropy computation — the flat/synthetic-image screen
    * an image curation pipeline runs (a solid color scores 0 bits, a
    * noisy natural crop approaches 8): decode, one 256-bin histogram
    * per image, entropy `log2(n) − (Σ c·ln c)/(n·ln 2)` with the sum
    * folded over ASCENDING levels — the same left-to-right ordered-fold
    * discipline as the cosine kernels, so an external engine replays
    * the float sum bit-for-bit; round-6 absorbs the last-ulp `ln`
    * divergence (the lm_score discipline). Pure scan parallelism —
    * per-payload local loop, no shuffle. */
  def imageEntropy(ds: Dataset[MediaRecord]): Dataset[ImageEntropy] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { rec =>
        try {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(rec.payload))
          if (img == null) ImageEntropy(rec.mediaId, -1L, 0L, -1.0)
          else {
            val hist = new Array[Long](256)
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                hist(img.getRGB(x, y) & 0xFF) += 1
                x += 1
              }
              y += 1
            }
            val n = img.getWidth.toLong * img.getHeight
            var s = 0.0
            var dl = 0L
            var g = 0
            while (g < 256) {
              val c = hist(g)
              if (c > 0L) { dl += 1; s += c * math.log(c.toDouble) }
              g += 1
            }
            val ent = (math.log(n.toDouble) - s / n) / math.log(2.0)
            ImageEntropy(rec.mediaId, n, dl,
              BigDecimal(ent).setScale(6,
                BigDecimal.RoundingMode.HALF_UP).toDouble)
          }
        } catch {
          case _: java.io.IOException =>
            ImageEntropy(rec.mediaId, -1L, 0L, -1.0)
        }
      }
    }
  }

  // ---- perceptual hashing ----------------------------------------------

  /** Perceptual hashes of one image: aHash (block mean vs global mean)
    * and dHash (horizontal gradient sign), each as a packed long (bit
    * b = grid row-major position) AND as a '0'/'1' bitstring (the
    * engine-portable oracle form — packing bit 63 into a signed long is
    * representation-dependent; a bitstring is not). Undecodable
    * payloads carry empty bitstrings and -1 hashes. */
  final case class ImagePHash(media_id: Long, ahash: Long, dhash: Long,
      ahash_bits: String, dhash_bits: String)

  /** Portable 32-bit integer mix (multiply / xor-shift rounds) — the
    * nonlinearity every generative media fixture here runs through.
    * AFFINE formulas (gradients, LCGs) collapse under the final small
    * modulus: differences become near-constant, hash bits skew, and a
    * dedup fixture floods with accidental near-duplicates (measured: an
    * affine audio contour produced 6856 hamming-pairs at sf0.1 where
    * the planted truth is 400; this mix produces exactly 400, with
    * ~32/64 hash-bit balance and birthday-level band buckets).
    * Expressible verbatim in SQL (`*`, `&`, `>>`, `xor`), and every
    * intermediate stays under 2^63 for k ≤ ~3.4e9, so DuckDB's
    * overflow-checked BIGINT arithmetic agrees with JVM longs. */
  private[pipeline] def mix32(k: Long): Long = {
    var z = (k * 2654435761L) & 0xFFFFFFFFL
    z ^= z >>> 16
    z = (z * 40503L) & 0xFFFFFFFFL
    z ^= z >>> 13
    z
  }

  /** Render a REAL PNG per (id, seed, side) row whose pixel (x, y) is
    * the gray level `mix32(seed·side² + y·side + x) mod 256` — a
    * deterministic integer formula a SQL oracle can restate exactly
    * (PNG is lossless and luma of (g,g,g) is g, so the decoded grid IS
    * the formula); see [[mix32]] for why the mixing must be nonlinear.
    * Rows SHARING a seed render identical images — the planted
    * duplicates for image-level dedup. `format` is any lossless-RGB
    * registered ImageIO writer ("png", "bmp") — the same pixels in a
    * different container, for content-vs-byte dedup fixtures. */
  def renderGradientPng(ds: Dataset[(Long, Long, Int)],
      format: String = "png"): Dataset[MediaRecord] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { case (id, seed, side) =>
        val img = new java.awt.image.BufferedImage(
          side, side, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < side) {
          var x = 0
          while (x < side) {
            val g =
              (mix32(seed * side * side + y.toLong * side + x) % 256L).toInt
            img.setRGB(x, y, (g << 16) | (g << 8) | g)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        require(javax.imageio.ImageIO.write(img, format, bos),
          s"no registered ImageIO writer for format '$format'")
        MediaRecord(id, "image", bos.toByteArray,
          MediaMeta(Some(side), Some(side), None, Some(format)))
      }
    }
  }

  /** REAL image feature extraction: decode each payload with ImageIO,
    * reduce the grayscale plane to a `grid`×`grid` matrix of exact
    * integer block sums, and emit aHash/dHash — the standard
    * perceptual-hash pair (near-duplicate images differ in a few bits;
    * compose with [[Dedup.hammingDuplicates64]] for image-level
    * near-dup at corpus scale). All-integer arithmetic end-to-end:
    * aHash bit i is `grid² · blockSum_i > Σ blockSums` (block mean vs
    * global mean, cleared denominators), dHash bit is
    * `blockSum[y][x+1] > blockSum[y][x]` — no float rounding anywhere,
    * so a SQL oracle reproduces the hashes bit-for-bit. Image sides
    * must be multiples of `grid` (exact blocks); others — and
    * undecodable payloads — yield the (-1, "", "") sentinel row.
    * Partition-local decode, one codec instance per partition. */
  def imagePHash(ds: Dataset[MediaRecord], grid: Int = 8)
      : Dataset[ImagePHash] = {
    require(grid >= 2 && grid * grid <= 64,
      s"grid^2 must fit a 64-bit hash, got $grid")
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { rec =>
        val img =
          try javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(rec.payload))
          catch { case _: java.io.IOException => null }
        if (img == null || img.getWidth % grid != 0 ||
            img.getHeight % grid != 0)
          ImagePHash(rec.mediaId, -1L, -1L, "", "")
        else {
          val (bw, bh) = (img.getWidth / grid, img.getHeight / grid)
          val m = new Array[Long](grid * grid)
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              // integer luma of an RGB pixel; gray fixtures (r=g=b=v)
              // reduce to exactly v since (299+587+114)v/1000 = v
              val rgb = img.getRGB(x, y)
              val lum = (299 * ((rgb >> 16) & 0xFF) +
                587 * ((rgb >> 8) & 0xFF) + 114 * (rgb & 0xFF)) / 1000
              m((y / bh) * grid + x / bw) += lum
              x += 1
            }
            y += 1
          }
          var total = 0L
          var i = 0
          while (i < m.length) { total += m(i); i += 1 }
          val (aBits, dBits) = (new StringBuilder, new StringBuilder)
          var (aHash, dHash) = (0L, 0L)
          var b = 0
          while (b < grid * grid) {
            if (m(b) * (grid * grid) > total) {
              aHash |= 1L << b; aBits.append('1')
            } else aBits.append('0')
            b += 1
          }
          var yy = 0
          var d = 0
          while (yy < grid) {
            var xx = 0
            while (xx < grid - 1) {
              if (m(yy * grid + xx + 1) > m(yy * grid + xx)) {
                dHash |= 1L << d; dBits.append('1')
              } else dBits.append('0')
              xx += 1; d += 1
            }
            yy += 1
          }
          ImagePHash(rec.mediaId, aHash, dHash,
            aBits.toString, dBits.toString)
        }
      }
    }
  }

  /** Energy-contour fingerprint of one audio payload: the PCM16 stream
    * splits into `blocks` equal spans, bit b of the hash is
    * `energy[b+1] > energy[b]` (energy = Σ sample², exact long
    * arithmetic) — the audio analogue of dHash, robust to volume-
    * preserving shifts and oracle-able bit-for-bit on integer-exact
    * fixtures. Emitted as packed long AND bitstring (same convention
    * as [[ImagePHash]]). Undecodable or non-block-aligned payloads
    * yield the (-1, "") sentinel. */
  final case class AudioFingerprint(media_id: Long, ehash: Long,
      ehash_bits: String)

  /** Render a REAL RIFF/WAVE payload per (id, seed) row: PCM signed
    * 16-bit mono square wave whose amplitude is CONSTANT within each of
    * `blocks` equal spans and follows the exact integer formula
    * `A(seed, b) = 500 + mix32(seed·128 + b) mod 500` — per-block RMS
    * is exactly A, so a SQL oracle restates the whole energy contour;
    * see [[mix32]] for why affine contours are unusable as dedup
    * fixtures (measured hash-bit balance here: ~32/64 one-bits, banded
    * candidates at birthday level, hamming-pairs exactly the planted
    * 400 at sf0.1). Rows sharing a seed render identical audio — the
    * planted duplicates. */
  def renderModulatedWav(ds: Dataset[(Long, Long)], rate: Int = 8000,
      framesPerBlock: Int = 16, blocks: Int = 65)
      : Dataset[MediaRecord] = {
    require(framesPerBlock % 2 == 0,
      "framesPerBlock must be even (whole ± square-wave periods keep " +
        "per-block RMS exactly A)")
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { case (id, seed) =>
        val frames = framesPerBlock * blocks
        val pcm = new Array[Byte](frames * 2)
        var i = 0
        while (i < frames) {
          val b = i / framesPerBlock
          val amp = (500L + mix32(seed * 128L + b) % 500L).toInt
          val v = if ((i & 1) == 0) amp else -amp
          pcm(2 * i) = (v & 0xFF).toByte
          pcm(2 * i + 1) = ((v >> 8) & 0xFF).toByte
          i += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(
          rate.toFloat, 16, 1, true, false)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        MediaRecord(id, "audio", bos.toByteArray,
          MediaMeta(None, None, Some(frames.toLong * 1000 / rate),
            Some("pcm_s16le")))
      }
    }
  }

  /** REAL audio feature extraction: decode each payload with
    * javax.sound, split the PCM16 samples into `blocks` equal spans,
    * and hash the energy contour (bit b = `E[b+1] > E[b]`, exact long
    * sums — 64 bits at the default 65 blocks). Compose with
    * [[graft.pipeline.Dedup.hammingDuplicates64]] for audio-level
    * near-dup, the same shape as image pHash dedup. Partition-local
    * decode; corrupt or non-block-aligned payloads yield sentinels
    * instead of failing the job. */
  def audioEnergyHash(ds: Dataset[MediaRecord], blocks: Int = 65)
      : Dataset[AudioFingerprint] = {
    require(blocks >= 2 && blocks - 1 <= 64,
      s"blocks - 1 comparisons must fit 64 bits, got $blocks")
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { rec =>
        try {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(rec.payload))
          val bytes = ais.readAllBytes()
          val n = bytes.length / 2
          if (n < blocks || n % blocks != 0)
            AudioFingerprint(rec.mediaId, -1L, "")
          else {
            val span = n / blocks
            val e = new Array[Long](blocks)
            var i = 0
            while (i < n) {
              val v = ((bytes(2 * i + 1) << 8) |
                (bytes(2 * i) & 0xFF)).toLong
              e(i / span) += v * v
              i += 1
            }
            var hash = 0L
            val bits = new StringBuilder
            var b = 0
            while (b < blocks - 1) {
              if (e(b + 1) > e(b)) { hash |= 1L << b; bits.append('1') }
              else bits.append('0')
              b += 1
            }
            AudioFingerprint(rec.mediaId, hash, bits.toString)
          }
        } catch {
          case _: javax.sound.sampled.UnsupportedAudioFileException |
              _: java.io.IOException =>
            AudioFingerprint(rec.mediaId, -1L, "")
        }
      }
    }
  }

  /** Build a demo media table from any text source (payload = UTF-8
    * bytes) — lets the binary plumbing run against the driver's
    * documents table without real media files. */
  def fromText(df: DataFrame, idCol: Column, textCol: Column): DataFrame =
    df.select(idCol.cast("long").as("media_id"), lit("text").as("kind"),
      textCol.cast("binary").as("payload"),
      struct(lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(null).cast("long").as("duration_ms"),
        lit("utf-8").as("codec")).as("meta"))
}

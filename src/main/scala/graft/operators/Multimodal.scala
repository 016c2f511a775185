package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata; decode / feature-extraction runs
  * per partition in bounded batches.
  *
  * The image path is REAL: [[decodeImages]] and [[resizeImages]] parse and
  * re-encode actual PNG/JPEG bytes through `javax.imageio` (JDK-builtin —
  * no new dependency). Test images come from [[synthPng]], whose pixel
  * function is simple enough that a SQL oracle predicts any decoded pixel,
  * so the gates assert REAL decoded dimensions and pixel values
  * cross-engine, not stub constants. Multi-frame extraction is real for
  * BOTH containers a bare JDK decodes: animated GIF ([[decodeFrames]])
  * and MJPEG video ([[decodeVideoFrames]] — SOI-split concatenated
  * JPEGs, each through `javax.imageio`); audio is a real WAV codec round
  * trip ([[decodeAudio]]). [[sampleFrames]] is the codec-agnostic
  * byte-chunking sibling — its distributed shape (one pass, n× fan-out,
  * no shuffle, frames off the driver) is the one the decoders share.
  *
  * At 100 TB the payload column lives in its own parquet column chunk, so
  * metadata-only queries scan only the small columns; decode/resize are
  * map-side per-partition streams whose output is bounded by the target
  * dimensions regardless of input size.
  */
object Multimodal {

  /** Attach a binary payload column (here synthesized from text; in a real
    * pipeline this is the raw media bytes) plus cheap metadata columns.
    */
  def withPayload(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), encode(col(textCol), "UTF-8").as("payload"))
      .withColumn("byte_len", length(col("payload")))
      .withColumn("magic", expr("CAST(conv(hex(substring(payload, 1, 1)), 16, 10) AS INT)"))

  /** Deterministic grayscale test image, PNG-encoded: pixel (x, y) carries
    * value `(x + y + seed) mod 256` in all three channels. PNG is lossless,
    * so a decoder recovers every value exactly — which is what lets a SQL
    * oracle predict the decoded pixels of a REAL codec round trip.
    */
  def synthPng(width: Int, height: Int, seed: Int): Array[Byte] = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val v = (x + y + seed) & 0xFF
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Attach a REAL PNG payload per row, dimensions and seed derived
    * SQL-expressibly from the id:
    * `width = 16 + id mod 32`, `height = 16 + (id·7) mod 32`,
    * `seed = id mod 251`. The generation runs map-side (one encoder per
    * row inside the partition stream).
    */
  def withImagePayload(df: DataFrame, idCol: String): DataFrame = {
    val gen = udf { (id: Long) =>
      synthPng(16 + (id % 32).toInt, 16 + (id * 7 % 32).toInt, (id % 251).toInt)
    }
    df.select(col(idCol).cast("long").as(idCol))
      .withColumn("payload", gen(col(idCol)))
  }

  case class ImageMeta(doc_id: Long, byte_len: Int, width: Int, height: Int,
      top_left: Int)

  /** REAL image decode — `javax.imageio` handles PNG/JPEG/BMP/GIF out of
    * the JDK box. Batched per-partition (the Scala analog of mapInPandas):
    * rows stream through the decoder without materializing the partition;
    * only bounded metadata (dims + the top-left sample) flows out, the
    * pixel buffer dies with each row. A payload that no installed reader
    * understands fails loudly with the row id rather than passing nulls
    * downstream.
    */
  def decodeImages(spark: SparkSession, payloads: DataFrame,
      idCol: String): Dataset[ImageMeta] = {
    import spark.implicits._
    payloads.select(col(idCol).cast("long"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val img = ImageIO.read(new ByteArrayInputStream(bytes))
          require(img != null, s"row $id: payload is not a decodable image")
          ImageMeta(id, bytes.length, img.getWidth, img.getHeight,
            img.getRGB(0, 0) & 0xFF)
        }
      }
  }

  case class Resized(doc_id: Long, payload: Array[Byte], width: Int,
      height: Int, orig_len: Int)

  /** REAL image resize: decode via `javax.imageio`, resample with explicit
    * nearest-neighbor indexing — output pixel (x, y) takes source pixel
    * `(floor(x·srcW/dstW), floor(y·srcH/dstH))`, deterministic arithmetic
    * rather than the AWT rendering pipeline — and re-encode as PNG. The
    * property that matters at 100 TB holds by construction: output size is
    * bounded by the target dimensions regardless of input size, so resized
    * corpora shrink to target × row-count.
    */
  def resizeImages(spark: SparkSession, payloads: DataFrame, idCol: String,
      targetW: Int, targetH: Int): Dataset[Resized] = {
    import spark.implicits._
    payloads.select(col(idCol).cast("long"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val src = ImageIO.read(new ByteArrayInputStream(bytes))
          require(src != null, s"row $id: payload is not a decodable image")
          val out = new BufferedImage(targetW, targetH, BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < targetH) {
            val sy = (y.toLong * src.getHeight / targetH).toInt
            var x = 0
            while (x < targetW) {
              val sx = (x.toLong * src.getWidth / targetW).toInt
              out.setRGB(x, y, src.getRGB(sx, sy))
              x += 1
            }
            y += 1
          }
          val bos = new ByteArrayOutputStream()
          ImageIO.write(out, "png", bos)
          Resized(id, bos.toByteArray, targetW, targetH, bytes.length)
        }
      }
  }

  /** Deterministic animated GIF: frame f's pixel (x, y) carries gray value
    * `(x + y + seed + f·17) mod 256`. The image is TYPE_BYTE_INDEXED over
    * an exact 256-gray palette, so GIF's palettization is lossless and a
    * decoder recovers every value — the animated counterpart of
    * [[synthPng]].
    */
  def synthGif(width: Int, height: Int, frames: Int, seed: Int): Array[Byte] = {
    val grays = Array.tabulate(256)(_.toByte)
    val icm = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
    val bos = new ByteArrayOutputStream()
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val ios = ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < frames) {
        val img = new BufferedImage(width, height,
          BufferedImage.TYPE_BYTE_INDEXED, icm)
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) {
            val v = (x + y + seed + f * 17) & 0xFF
            img.setRGB(x, y, (v << 16) | (v << 8) | v)
            x += 1
          }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  /** Attach a REAL animated-GIF payload per row, geometry SQL-derived from
    * the id: `width = 16 + id mod 16`, `height = 16 + (id·3) mod 16`,
    * `frames = 4 + id mod 5`, `seed = id mod 251`.
    */
  def withGifPayload(df: DataFrame, idCol: String): DataFrame = {
    val gen = udf { (id: Long) =>
      synthGif(16 + (id % 16).toInt, 16 + (id * 3 % 16).toInt,
        4 + (id % 5).toInt, (id % 251).toInt)
    }
    df.select(col(idCol).cast("long").as(idCol))
      .withColumn("payload", gen(col(idCol)))
  }

  case class DecodedFrame(doc_id: Long, frame_idx: Int, width: Int,
      height: Int, top_left: Int)

  /** REAL frame extraction for the one animated container the JDK decodes
    * (GIF): open an ImageReader on the payload, count its frames, decode
    * `n` evenly spaced ones (frame k samples index `k·F/n`) and emit their
    * codec-reported geometry + top-left pixel. Same distributed shape as
    * [[sampleFrames]] — one pass, n× fan-out, no shuffle, pixel buffers
    * die per row; only bounded per-frame metadata flows out.
    */
  def decodeFrames(spark: SparkSession, payloads: DataFrame, idCol: String,
      n: Int): Dataset[DecodedFrame] = {
    import spark.implicits._
    payloads.select(col(idCol).cast("long"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
          val readers = ImageIO.getImageReaders(iis)
          require(readers.hasNext, s"row $id: payload is not a decodable image")
          val reader = readers.next()
          try {
            reader.setInput(iis)
            val total = reader.getNumImages(true)
            (0 until n).map { k =>
              val img = reader.read(k * total / n)
              DecodedFrame(id, k, img.getWidth, img.getHeight,
                img.getRGB(0, 0) & 0xFF)
            }
          } finally {
            reader.dispose()
            iis.close()
          }
        }
      }
  }

  /** Deterministic 16-bit mono PCM WAV: sample n of a sawtooth at `freq` Hz
    * over `SampleRate` Hz is the pure-integer value
    * `((n·freq) mod SampleRate) · 8 − 32000` — exactly replayable in SQL
    * (no trig, no floats), while the container round trip runs through the
    * REAL `javax.sound.sampled` WAV codec (JDK-builtin, no new
    * dependency): [[synthWav]] writes via `AudioSystem.write`,
    * [[decodeAudio]] re-parses header + PCM frames via
    * `AudioSystem.getAudioInputStream`.
    */
  val SampleRate = 8000

  def synthWav(frames: Int, freq: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      SampleRate.toFloat, 16, 1, true /* signed */, false /* little-endian */)
    val pcm = new Array[Byte](frames * 2)
    var n = 0
    while (n < frames) {
      val v = (n.toLong * freq % SampleRate).toInt * 8 - 32000
      pcm(2 * n) = (v & 0xFF).toByte
      pcm(2 * n + 1) = ((v >> 8) & 0xFF).toByte
      n += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, frames.toLong)
    val bos = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Attach a REAL WAV payload per row, parameters SQL-derived from the id:
    * `frames = 200 + (id mod 100)·4`, `freq = 100 + id mod 400`.
    */
  def withWavPayload(df: DataFrame, idCol: String): DataFrame = {
    // floorMod: Scala's % is negative for negative ids, which would feed
    // synthWav a negative frame count (NegativeArraySizeException); pmod
    // semantics match the SQL derivation for every id
    val gen = udf { (id: Long) =>
      synthWav(200 + java.lang.Math.floorMod(id, 100L).toInt * 4,
        100 + java.lang.Math.floorMod(id, 400L).toInt)
    }
    df.select(col(idCol).cast("long").as(idCol))
      .withColumn("payload", gen(col(idCol)))
  }

  case class AudioMeta(doc_id: Long, sample_rate: Int, channels: Int,
      bits: Int, n_frames: Long, peak: Int, sum_sq: Long)

  /** REAL audio decode: parse the WAV container through
    * `javax.sound.sampled.AudioSystem` — format fields come from the codec,
    * not from the synth parameters — then stream the PCM frames computing
    * peak amplitude and the integer sum of squares (the loudness/energy
    * feature a filtering pipeline keys on). Same distributed contract as
    * [[decodeImages]]: batched per partition, bounded metadata out, sample
    * buffers die per row, non-audio payloads fail loudly with the row id.
    */
  def decodeAudio(spark: SparkSession, payloads: DataFrame,
      idCol: String): Dataset[AudioMeta] = {
    import spark.implicits._
    payloads.select(col(idCol).cast("long"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val ais =
            try javax.sound.sampled.AudioSystem.getAudioInputStream(
              new ByteArrayInputStream(bytes))
            catch {
              case e: javax.sound.sampled.UnsupportedAudioFileException =>
                throw new IllegalArgumentException(
                  s"row $id: payload is not a decodable audio stream", e)
            }
          try {
            val fmt = ais.getFormat
            require(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian &&
              fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
              s"row $id: expected 16-bit little-endian signed PCM, got $fmt")
            val frames = ais.getFrameLength
            val buf = new Array[Byte](4096)
            var peak = 0
            var sumSq = 0L
            var carry = -1 // low byte of a sample split across reads
            var read = ais.read(buf)
            while (read > 0) {
              var i = 0
              if (carry >= 0 && read >= 1) {
                val v = (buf(0) << 8) | carry
                val a = math.abs(v)
                if (a > peak) peak = a
                sumSq += v.toLong * v
                carry = -1
                i = 1
              }
              while (i + 1 < read) {
                val v = (buf(i + 1) << 8) | (buf(i) & 0xFF)
                val a = math.abs(v)
                if (a > peak) peak = a
                sumSq += v.toLong * v
                i += 2
              }
              if (i < read) carry = buf(i) & 0xFF
              read = ais.read(buf)
            }
            AudioMeta(id, fmt.getSampleRate.toInt, fmt.getChannels,
              fmt.getSampleSizeInBits, frames, peak, sumSq)
          } finally ais.close()
        }
      }
  }

  /** One flat-color baseline JPEG at compression quality 1.0. A constant
    * image is DC-only after the DCT, and at quality 1.0 the JDK's
    * quantization table is all ones — so the decode returns every channel
    * value EXACTLY (verified for all 256 gray values in MultimodalSpec),
    * which is what lets a SQL oracle pin real decoded pixels through a
    * nominally lossy codec.
    */
  def synthJpegFlat(width: Int, height: Int, gray: Int): Array[Byte] = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    val v = gray & 0xFF
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, (v << 16) | (v << 8) | v); x += 1 }
      y += 1
    }
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(1.0f)
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  /** Deterministic MJPEG clip: `frames` concatenated baseline JPEGs
    * (M-JPEG is exactly that — the stream format of security cameras and
    * AVI MJPG payloads), frame f a flat gray of value
    * `(seed + f·17) mod 256`. The video counterpart of [[synthGif]].
    */
  def synthMjpeg(width: Int, height: Int, frames: Int, seed: Int): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    var f = 0
    while (f < frames) {
      bos.write(synthJpegFlat(width, height, (seed + f * 17) & 0xFF))
      f += 1
    }
    bos.toByteArray
  }

  /** Attach a REAL MJPEG payload per row, geometry SQL-derived from the
    * id (floorMod, so the derivation is total): `width = 16 + id mod 16`,
    * `height = 16 + (id·3) mod 16`, `frames = 4 + id mod 5`,
    * `seed = id mod 251`.
    */
  def withMjpegPayload(df: DataFrame, idCol: String): DataFrame = {
    val gen = udf { (id: Long) =>
      synthMjpeg(16 + java.lang.Math.floorMod(id, 16L).toInt,
        16 + java.lang.Math.floorMod(id * 3, 16L).toInt,
        4 + java.lang.Math.floorMod(id, 5L).toInt,
        java.lang.Math.floorMod(id, 251L).toInt)
    }
    df.select(col(idCol).cast("long").as(idCol))
      .withColumn("payload", gen(col(idCol)))
  }

  /** Offsets of every JPEG start-of-image in an MJPEG stream: positions
    * of `FF D8 FF`. Safe as a frame splitter: inside entropy-coded JPEG
    * data a raw FF is always byte-stuffed (FF 00) or a restart marker
    * (FF D0-D7), so SOI-followed-by-a-marker can only open a new frame.
    */
  private[operators] def mjpegFrameOffsets(bytes: Array[Byte]): IndexedSeq[Int] = {
    val out = IndexedSeq.newBuilder[Int]
    var i = 0
    while (i + 2 < bytes.length) {
      if (bytes(i) == 0xFF.toByte && bytes(i + 1) == 0xD8.toByte &&
        bytes(i + 2) == 0xFF.toByte) out += i
      i += 1
    }
    out.result()
  }

  /** REAL video-frame extraction for the one video container a bare JDK
    * decodes end-to-end: MJPEG. The stream is split on SOI markers
    * ([[mjpegFrameOffsets]]), `n` evenly spaced frames are selected
    * (frame k samples index `k·F/n`, the [[decodeFrames]] convention) and
    * each decodes through `javax.imageio`, emitting codec-reported
    * geometry + the top-left pixel. Same distributed contract as the
    * image/GIF/audio decoders: batched per partition, bounded metadata
    * out, pixel buffers die per row, non-MJPEG payloads fail loudly with
    * the row id.
    */
  def decodeVideoFrames(spark: SparkSession, payloads: DataFrame, idCol: String,
      n: Int): Dataset[DecodedFrame] = {
    import spark.implicits._
    payloads.select(col(idCol).cast("long"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val offs = mjpegFrameOffsets(bytes)
          require(offs.nonEmpty, s"row $id: payload is not an MJPEG stream")
          val total = offs.length
          (0 until n).map { k =>
            val fi = k * total / n
            val from = offs(fi)
            val until = if (fi + 1 < total) offs(fi + 1) else bytes.length
            val img = ImageIO.read(new ByteArrayInputStream(
              java.util.Arrays.copyOfRange(bytes, from, until)))
            require(img != null, s"row $id: frame $fi is not a decodable JPEG")
            DecodedFrame(id, k, img.getWidth, img.getHeight,
              img.getRGB(0, 0) & 0xFF)
          }
        }
      }
  }

  case class Frame(doc_id: Long, frame_idx: Int, frame_bytes: Array[Byte],
      offset: Int)

  /** Fixed-rate binary chunking: each payload yields `n` evenly sized
    * byte slices — the generic shard-splitting plumbing for opaque
    * payloads (its oracle gate checks the slice arithmetic end to end).
    * For CODEC-aware frame extraction use [[decodeFrames]] (animated GIF)
    * or [[decodeVideoFrames]] (MJPEG); this operator is content-agnostic
    * by design. The distributed shape is shared: one pass, output fan-out
    * n× without shuffles, chunk bytes stay off the driver.
    */
  /** Textured variant of [[synthPng]] for the perceptual-hash gates:
    * `v = (x·xStep + y·yStep + seed) mod 256` wraps every few pixels, so
    * the luminance field has real structure (the plain `x+y+seed`
    * gradient is monotone at gate dimensions and difference-hashes to
    * all-ones — useless as a dedup fixture). Still integer-SQL-derivable.
    */
  def synthTexturedPng(width: Int, height: Int, seed: Int,
      xStep: Int, yStep: Int): Array[Byte] = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val v = (x * xStep + y * yStep + seed) & 0xFF
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  case class AudioPrint(doc_id: Long, b0: Int, b1: Int, b2: Int, b3: Int)

  /** Audio fingerprint — [[dHash]]'s acoustic sibling: decode the REAL
    * WAV container, split the PCM stream into 65 equal windows (window
    * of sample n = `n·65/frames`, pure integer), accumulate each
    * window's absolute-amplitude energy, set bit w when window w+1 is
    * louder than window w. 64 difference bits as four 16-bit bands —
    * the same banding contract as the image hash, so the same
    * candidate-blocking near-dup shape applies. Energy-profile hashing
    * is amplitude-shift tolerant by construction (differences survive
    * gain changes that preserve ordering), the property that makes it a
    * dedup signal rather than a checksum.
    */
  def audioFingerprint(spark: SparkSession, payloads: DataFrame,
      idCol: String): Dataset[AudioPrint] = {
    import spark.implicits._
    payloads.select(col(idCol).cast("long"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val ais =
            try javax.sound.sampled.AudioSystem.getAudioInputStream(
              new ByteArrayInputStream(bytes))
            catch {
              case e: javax.sound.sampled.UnsupportedAudioFileException =>
                throw new IllegalArgumentException(
                  s"row $id: payload is not a decodable audio stream", e)
            }
          try {
            val fmt = ais.getFormat
            require(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian &&
              fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
              s"row $id: expected 16-bit little-endian signed PCM, got $fmt")
            val frames = ais.getFrameLength.toInt
            require(frames >= 65, s"row $id: need >= 65 frames, got $frames")
            val energy = new Array[Long](65)
            val buf = new Array[Byte](4096)
            var n = 0
            var lo = -1
            var read = ais.read(buf)
            while (read > 0) {
              var i = 0
              while (i < read) {
                if (lo < 0) lo = buf(i) & 0xFF
                else {
                  val v = (lo | (buf(i) << 8)).toShort.toInt
                  energy((n.toLong * 65 / frames).toInt) += math.abs(v)
                  n += 1
                  lo = -1
                }
                i += 1
              }
              read = ais.read(buf)
            }
            val bands = new Array[Int](4)
            var w = 0
            while (w < 64) {
              if (energy(w + 1) > energy(w)) bands(w >> 4) |= 1 << (w & 15)
              w += 1
            }
            AudioPrint(id, bands(0), bands(1), bands(2), bands(3))
          } finally ais.close()
        }
      }
  }

  case class DHash(doc_id: Long, b0: Int, b1: Int, b2: Int, b3: Int)

  /** Perceptual difference-hash (dHash) of each image payload: decode
    * through the REAL codec, sample a 9×8 nearest-neighbor luminance
    * grid (`src = idx·dim/9` resp. `/8` — pure integer positions), set
    * bit (r·8+c) when the right neighbor is brighter. The 64 bits are
    * returned as four 16-bit bands (b0 = bits 0-15, …) — the banding key
    * for [[nearDupImages]], and sign-free in any engine. Identical
    * images hash identically; brightness shifts preserve the hash
    * (differences survive +k); crops/rescales move few bits — the
    * standard image near-dup signal, per-row map-side.
    */
  def dHash(spark: SparkSession, payloads: DataFrame,
      idCol: String): Dataset[DHash] = {
    import spark.implicits._
    payloads.select(col(idCol).cast("long"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val img = ImageIO.read(new ByteArrayInputStream(bytes))
          require(img != null, s"row $id: payload is not a decodable image")
          val w = img.getWidth; val h = img.getHeight
          val p = Array.tabulate(8, 9)((r, c) =>
            img.getRGB(c * w / 9, r * h / 8) & 0xFF)
          val bands = new Array[Int](4)
          var r = 0
          while (r < 8) {
            var c = 0
            while (c < 8) {
              if (p(r)(c + 1) > p(r)(c)) {
                val pos = r * 8 + c
                bands(pos >> 4) |= 1 << (pos & 15)
              }
              c += 1
            }
            r += 1
          }
          DHash(id, bands(0), bands(1), bands(2), bands(3))
        }
      }
  }

  /** Near-duplicate image pairs by banded dHash: candidates share at
    * least one of the four 16-bit bands exactly (the LSH trade — a pair
    * with >`maxHamming` total but all bits concentrated outside every
    * shared band is missed; with 4 bands any pair within hamming 3 is
    * GUARANTEED a shared band by pigeonhole), then exact hamming
    * ≤ `maxHamming` verification via per-band xor bit_count. Join keys
    * on (band index, band value) — candidate volume tracks true
    * near-dups, never all pairs.
    */
  def nearDupImages(spark: SparkSession, payloads: DataFrame, idCol: String,
      maxHamming: Int): DataFrame = {
    val hashes = dHash(spark, payloads, idCol).toDF()
    val bands = hashes.select(col("doc_id"),
      posexplode(array(col("b0"), col("b1"), col("b2"), col("b3")))
        .as(Seq("band", "v")))
    val cand = bands.select(col("doc_id").as("a_id"), col("band"), col("v"))
      .join(bands.select(col("doc_id").as("b_id"), col("band"), col("v")),
        Seq("band", "v"))
      .where(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
    val ha = hashes.toDF("a_id", "a0", "a1", "a2", "a3")
    val hb = hashes.toDF("b_id", "c0", "c1", "c2", "c3")
    val hamming = Seq(("a0", "c0"), ("a1", "c1"), ("a2", "c2"), ("a3", "c3"))
      .map { case (x, y) => bit_count(col(x).bitwiseXOR(col(y))) }
      .reduce(_ + _)
    cand.join(ha, Seq("a_id")).join(hb, Seq("b_id"))
      .select(col("a_id"), col("b_id"), hamming.cast("int").as("hamming"))
      .where(col("hamming") <= maxHamming)
  }

  def sampleFrames(spark: SparkSession, payloads: DataFrame, idCol: String,
      n: Int): Dataset[Frame] = {
    import spark.implicits._
    payloads.select(col(idCol).cast("long"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val len = bytes.length
          (0 until n).iterator.map { k =>
            // frame k = bytes [k*len/n, (k+1)*len/n) — deterministic slice
            val from = (k.toLong * len / n).toInt
            val until = ((k + 1).toLong * len / n).toInt
            Frame(id, k, java.util.Arrays.copyOfRange(bytes, from, until), from)
          }
        }
      }
  }
}

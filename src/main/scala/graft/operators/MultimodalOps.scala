package graft.operators

import graft.Mapper
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata structs.
  *
  * Image decoding is REAL: `decodeImage` runs the JVM's bundled
  * `javax.imageio` codecs (PNG/JPEG/GIF/BMP) with a deterministic
  * nearest-neighbor luma resample. Payloads no registered reader
  * accepts (non-image bytes, exotic codecs — audio/video decode needs
  * libs this container doesn't ship) fall back to `decodeStub`'s
  * deterministic byte-derived fake, so pipelines keep flowing and the
  * fallback is exactly reproducible anywhere.
  */
object Multimodal {

  // ImageIO's default temp-FILE cache would put a disk write in every
  // decode call on the executor hot path; decode in-memory instead.
  javax.imageio.ImageIO.setUseCache(false)

  /** media column convention: binary payload + typed metadata. */
  val mediaSchema: StructType = StructType(
    Seq(
      StructField("bytes", BinaryType),
      StructField("mime", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType)
    )
  )

  /** Wrap a binary column into the media struct with declared metadata. */
  def asMedia(
      bytes: org.apache.spark.sql.Column,
      mime: String
  ): org.apache.spark.sql.Column =
    struct(
      bytes.as("bytes"),
      lit(mime).as("mime"),
      lit(null).cast(IntegerType).as("width"),
      lit(null).cast(IntegerType).as("height"),
      lit(null).cast(LongType).as("duration_ms")
    )

  /** Deterministic FALLBACK pseudo-pixels from the payload bytes (raw
    * byte values as floats — integer-valued, so exactly reproducible
    * anywhere). Used by [[decodeImage]] when no imageio reader accepts
    * the payload; also the reproducible reference in oracle SQL. */
  def decodeStub(bytes: Array[Byte], targetW: Int, targetH: Int): Array[Float] = {
    if (bytes == null) return Array.empty
    val out = new Array[Float](targetW * targetH)
    var i = 0
    while (i < out.length) {
      out(i) = (bytes(i % bytes.length) & 0xff).toFloat
      i += 1
    }
    out
  }

  /** Real image decode: `javax.imageio` (PNG/JPEG/GIF/BMP on a stock
    * JVM) + deterministic nearest-neighbor resample to targetW×targetH
    * integer ITU-R BT.601 luma values (integer arithmetic — no
    * platform-dependent float rendering, so results are bit-stable
    * across executors). Unreadable payloads → [[decodeStub]]. */
  def decodeImage(bytes: Array[Byte], targetW: Int, targetH: Int): Array[Float] = {
    if (bytes == null) return Array.empty
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null || img.getWidth <= 0 || img.getHeight <= 0)
      return decodeStub(bytes, targetW, targetH)
    val out = new Array[Float](targetW * targetH)
    var y = 0
    while (y < targetH) {
      val sy = math.min(img.getHeight - 1, y * img.getHeight / targetH)
      var x = 0
      while (x < targetW) {
        val sx = math.min(img.getWidth - 1, x * img.getWidth / targetW)
        val rgb = img.getRGB(sx, sy)
        val r = (rgb >> 16) & 0xff
        val g = (rgb >> 8) & 0xff
        val b = rgb & 0xff
        out(y * targetW + x) = ((299 * r + 587 * g + 114 * b) / 1000).toFloat
        x += 1
      }
      y += 1
    }
    out
  }

  /** Real audio decode: `javax.sound.sampled` (WAV/AIFF/AU PCM on a
    * stock JVM). Converts to 16-bit signed PCM, downmixes channels by
    * integer average, emits the first `maxSamples` samples as floats in
    * [-1, 1) (exact i/32768.0 — bit-stable everywhere). Payloads no
    * reader accepts (MP3/OGG need codecs this container doesn't ship)
    * fall back to [[decodeStub]]. */
  def decodeAudio(bytes: Array[Byte], maxSamples: Int): Array[Float] = {
    if (bytes == null) return Array.empty
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      val target = new javax.sound.sampled.AudioFormat(
        fmt.getSampleRate, 16, fmt.getChannels, true, false) // s16le
      val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(target, ais)
      try {
        val ch = fmt.getChannels
        val want = maxSamples * 2 * ch
        val buf = new Array[Byte](want)
        var off = 0
        var n = 0
        while (off < want && n >= 0) {
          n = pcm.read(buf, off, want - off)
          if (n > 0) off += n
        }
        val frames = off / (2 * ch)
        val out = new Array[Float](frames)
        var f = 0
        while (f < frames) {
          var acc = 0
          var c = 0
          while (c < ch) {
            val i = (f * ch + c) * 2
            acc += ((buf(i + 1).toInt << 8) | (buf(i) & 0xff)).toShort.toInt
            c += 1
          }
          out(f) = (acc / ch) / 32768.0f
          f += 1
        }
        out
      } finally pcm.close()
    } catch {
      case _: Exception => decodeStub(bytes, maxSamples, 1)
    }
  }

  // ------------------------------------------------------------------
  // MJPEG-in-AVI: real per-frame video decode on a stock JVM. AVI is a
  // RIFF container; for the MJPEG codec every '##dc'/'##db' chunk in the
  // 'movi' list is a standalone JPEG that javax.imageio decodes — no
  // external codecs needed. (Other codecs' frames aren't decodable here;
  // they fall back per payload, documented on [[SampleFrames]].)
  // ------------------------------------------------------------------

  private def fourcc(b: Array[Byte], off: Int): String =
    if (off + 4 > b.length) ""
    else new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  private def leInt(b: Array[Byte], off: Int): Long =
    if (off + 4 > b.length) -1L
    else ((b(off) & 0xffL)) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  def isAvi(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 12 &&
      fourcc(bytes, 0) == "RIFF" && fourcc(bytes, 8) == "AVI "

  /** Walk the RIFF tree and collect video-frame chunk payloads
    * ('##dc'/'##db', the stream-data fourccs) in stream order, recursing
    * into LISTs ('movi' and its 'rec ' groups). Truncated/odd chunks are
    * tolerated (web-crawled video is often damaged): parsing stops at
    * the first structurally impossible offset, keeping what was read. */
  def aviFrames(bytes: Array[Byte]): Vector[Array[Byte]] = {
    if (!isAvi(bytes)) return Vector.empty
    val out = Vector.newBuilder[Array[Byte]]
    def walk(start: Int, end: Int): Unit = {
      var off = start
      while (off + 8 <= end) {
        val id = fourcc(bytes, off)
        val size = leInt(bytes, off + 4)
        if (size < 0 || off + 8 + size > end) return // truncated: stop
        val body = off + 8
        if (id == "LIST") walk(body + 4, body + size.toInt)
        else if (id.length == 4 && {
          val s = id.substring(2)
          (s == "dc" || s == "db") &&
            id.charAt(0).isDigit && id.charAt(1).isDigit
        } && size > 0)
          out += java.util.Arrays.copyOfRange(bytes, body, body + size.toInt)
        off = body + size.toInt + (size.toInt & 1) // chunks are word-aligned
      }
    }
    walk(12, math.min(bytes.length, 8 + leInt(bytes, 4).toInt))
    out.result()
  }

  /** `dwMicroSecPerFrame` from the 'avih' main header, if present. */
  def aviMicrosPerFrame(bytes: Array[Byte]): Option[Long] = {
    if (!isAvi(bytes)) return None
    var found: Option[Long] = None
    def walk(start: Int, end: Int): Unit = {
      var off = start
      while (off + 8 <= end && found.isEmpty) {
        val id = fourcc(bytes, off)
        val size = leInt(bytes, off + 4)
        if (size < 0 || off + 8 + size > end) return
        val body = off + 8
        if (id == "LIST") walk(body + 4, body + size.toInt)
        else if (id == "avih" && size >= 4) {
          val v = leInt(bytes, body)
          if (v > 0) found = Some(v)
        }
        off = body + size.toInt + (size.toInt & 1)
      }
    }
    walk(12, math.min(bytes.length, 8 + leInt(bytes, 4).toInt))
    found
  }

  /** (width, height) of an image payload, or null if unreadable — reads
    * only the header via the imageio reader, not the pixel raster. */
  def imageDims(bytes: Array[Byte]): Option[(Int, Int)] = {
    if (bytes == null) return None
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(iis)
          Some((r.getWidth(0), r.getHeight(0)))
        } finally r.dispose()
      }
    } catch { case _: Exception => None }
    finally iis.close()
  }

  /** Perceptual difference-hash (dHash, Krawetz 2013): decode to a 9×8
    * luma grid ([[decodeImage]] — real codecs, deterministic byte
    * fallback) and set bit `y*8+x` when pixel (x,y) is brighter than its
    * right neighbor. Near-identical images (recompression, small edits,
    * brightness shifts) land within a few Hamming bits; unrelated images
    * differ in ~32. Empty/null payloads hash to 0. */
  def imageDHash(bytes: Array[Byte]): Long = {
    if (bytes == null || bytes.isEmpty) return 0L
    val luma = decodeImage(bytes, 9, 8)
    var h = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (luma(y * 9 + x) > luma(y * 9 + x + 1)) h |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    h
  }

  /** Integer DCT-II cosine table for [[imagePHash]]:
    * round(cos((2x+1)·u·π/64) · 10000) for u ∈ [0,8), x ∈ [0,32).
    * Evaluated ONCE on the driver from `math.cos` and interpolated
    * literally into the SQL oracle, so both engines multiply the same
    * integers — no trig in the distributed path. */
  lazy val pHashCosTable: Array[Array[Long]] =
    Array.tabulate(8, 32)((u, x) =>
      math.round(math.cos((2 * x + 1) * u * math.Pi / 64) * 10000))

  /** DCT perceptual hash (Krawetz pHash shape): 32×32 luma decode →
    * integer 2-D DCT-II (no normalization constants — thresholding
    * only compares coefficients) → top-left 8×8 low-frequency block →
    * bit k set when coefficient k exceeds the MEDIAN of the 63 non-DC
    * coefficients (32nd smallest — 31 below, 31 at-or-above). Where
    * [[imageDHash]] keys on local gradients (robust to recompression,
    * brittle to resizing), the DCT footprint survives resize/rescale
    * and mild blur — the two hashes band into the same pigeonhole
    * pairing layer and catch complementary near-dup classes. All
    * arithmetic is exact BIGINT (|coef| ≤ 255·10⁸·1024 < 2⁶³), and the
    * separable row/column evaluation is plain integer-sum
    * reassociation, so any engine replays the hash bit-for-bit. */
  def imagePHash(bytes: Array[Byte]): Long = {
    if (bytes == null || bytes.isEmpty) return 0L
    val luma = decodeImage(bytes, 32, 32)
    val c = pHashCosTable
    // g(u)(y) = Σ_x C[u][x] · l[y·32+x]   (luma is integer-valued)
    val g = Array.ofDim[Long](8, 32)
    var u = 0
    while (u < 8) {
      var y = 0
      while (y < 32) {
        var s = 0L
        var x = 0
        while (x < 32) {
          s += c(u)(x) * luma(y * 32 + x).toLong
          x += 1
        }
        g(u)(y) = s
        y += 1
      }
      u += 1
    }
    // f(u·8+v) = Σ_y C[v][y] · g(u)(y)
    val f = new Array[Long](64)
    u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0L
        var y = 0
        while (y < 32) {
          s += c(v)(y) * g(u)(y)
          y += 1
        }
        f(u * 8 + v) = s
        v += 1
      }
      u += 1
    }
    val sorted = java.util.Arrays.copyOfRange(f, 1, 64)
    java.util.Arrays.sort(sorted)
    val t = sorted(31)
    var h = 0L
    var k = 0
    while (k < 64) {
      if (f(k) > t) h |= 1L << k
      k += 1
    }
    h
  }

  /** Audio fingerprint, dHash-style: decode the first `65·win` samples
    * ([[decodeAudio]] — real WAV/AIFF/AU PCM, deterministic byte
    * fallback), take 65 contiguous windows' absolute-amplitude energy,
    * and set bit `w` when window w is louder than window w+1 — a coarse
    * envelope shape that survives gain changes poorly but recompression
    * and trailing-silence edits well. All sample values are dyadic
    * (i/32768 or whole byte floats), so the window sums and comparisons
    * replay bit-identically on any engine. Empty/null payloads → 0. */
  def audioDHash(bytes: Array[Byte], win: Int = 16): Long = {
    if (bytes == null || bytes.isEmpty) return 0L
    val samples = decodeAudio(bytes, 65 * win)
    val energy = new Array[Double](65)
    var w = 0
    while (w < 65) {
      var acc = 0.0
      var i = w * win
      val end = math.min(samples.length, (w + 1) * win)
      while (i < end) { acc += math.abs(samples(i)); i += 1 }
      energy(w) = acc
      w += 1
    }
    var h = 0L
    var b = 0
    while (b < 64) {
      if (energy(b) > energy(b + 1)) h |= 1L << b
      b += 1
    }
    h
  }
}

/** Decode + resize a media column into a fixed-shape float feature array —
  * the `mapInPandas`-shaped batch op, expressed as a Spark-native
  * transform (narrow, partition-parallel, no shuffle). Decode is
  * [[Multimodal.decodeImage]]: real imageio codecs, deterministic
  * byte-derived fallback for unreadable payloads. */
final case class DecodeMedia(
    mediaField: String,
    outputField: String = "features",
    targetW: Int = 16,
    targetH: Int = 16
) extends Mapper {
  override def inputFields: Seq[String] = Seq(mediaField)
  override def outputFields: Seq[String] = Seq(outputField)
  override protected def build(df: DataFrame): DataFrame = {
    val w = targetW
    val h = targetH
    val decode = udf { (bytes: Array[Byte]) => Multimodal.decodeImage(bytes, w, h) }
    df.withColumn(outputField, decode(col(s"$mediaField.bytes")))
  }
}

/** Image perceptual hash for near-duplicate image dedup: one 64-bit
  * dHash per media row ([[Multimodal.imageDHash]]). The hash column
  * feeds the SAME banded pairing layer as text simhash
  * ([[SimHashNearDup.candidatePairs]] — pigeonhole-exact recall at a
  * Hamming radius, bucket-local joins, never all-pairs), so image dedup
  * at 100 TB is a linear decode pass plus a keyed shuffle of 8-byte
  * chunks — raw image bytes never shuffle. Narrow, partition-parallel. */
final case class ImageDHash(
    mediaField: String,
    outputField: String = "dhash"
) extends Mapper {
  override def inputFields: Seq[String] = Seq(mediaField)
  override def outputFields: Seq[String] = Seq(outputField)
  override protected def build(df: DataFrame): DataFrame = {
    val dhash = udf { (bytes: Array[Byte]) => Multimodal.imageDHash(bytes) }
    df.withColumn(outputField, dhash(col(s"$mediaField.bytes")))
  }
}

/** DCT perceptual hash per media row ([[Multimodal.imagePHash]]):
  * resize-robust complement to [[ImageDHash]], same 64-bit output,
  * same banded pairing layer downstream. Narrow, partition-parallel;
  * raw image bytes never shuffle. */
final case class ImagePHash(
    mediaField: String,
    outputField: String = "phash"
) extends Mapper {
  override def inputFields: Seq[String] = Seq(mediaField)
  override def outputFields: Seq[String] = Seq(outputField)
  override protected def build(df: DataFrame): DataFrame = {
    val phash = udf { (bytes: Array[Byte]) => Multimodal.imagePHash(bytes) }
    df.withColumn(outputField, phash(col(s"$mediaField.bytes")))
  }
}

/** Audio near-dup fingerprint: one 64-bit energy-envelope hash per
  * media row ([[Multimodal.audioDHash]]) feeding the same banded
  * Hamming pairing as [[ImageDHash]] / text simhash. Narrow,
  * partition-parallel; raw audio bytes never shuffle. */
final case class AudioDHash(
    mediaField: String,
    outputField: String = "adhash",
    win: Int = 16
) extends Mapper {
  override def inputFields: Seq[String] = Seq(mediaField)
  override def outputFields: Seq[String] = Seq(outputField)
  override protected def build(df: DataFrame): DataFrame = {
    val wn = win
    val f = udf { (bytes: Array[Byte]) => Multimodal.audioDHash(bytes, wn) }
    df.withColumn(outputField, f(col(s"$mediaField.bytes")))
  }
}

/** Decode an audio media column into a fixed-length float sample array
  * (WAV/AIFF/AU via the JVM's own codecs; deterministic byte-derived
  * fallback otherwise). Narrow, partition-parallel, no shuffle. */
final case class DecodeAudio(
    mediaField: String,
    outputField: String = "samples",
    maxSamples: Int = 16000
) extends Mapper {
  override def inputFields: Seq[String] = Seq(mediaField)
  override def outputFields: Seq[String] = Seq(outputField)
  override protected def build(df: DataFrame): DataFrame = {
    val n = maxSamples
    val decode = udf { (bytes: Array[Byte]) => Multimodal.decodeAudio(bytes, n) }
    df.withColumn(outputField, decode(col(s"$mediaField.bytes")))
  }
}

/** Fill the media struct's width/height metadata from the image header
  * (header-only read — no raster decode). Unreadable payloads keep
  * their declared (possibly null) dims. */
final case class FillImageDims(mediaField: String) extends Mapper {
  override def inputFields: Seq[String] = Seq(mediaField)
  override def outputFields: Seq[String] = Seq(mediaField)
  override protected def build(df: DataFrame): DataFrame = {
    val dims = udf { (bytes: Array[Byte]) =>
      Multimodal.imageDims(bytes).map { case (w, h) => Array(w, h) }.orNull
    }
    df.withColumn("__graft_dims", dims(col(s"$mediaField.bytes")))
      .withColumn(
        mediaField,
        struct(
          col(s"$mediaField.bytes").as("bytes"),
          col(s"$mediaField.mime").as("mime"),
          coalesce(element_at(col("__graft_dims"), 1), col(s"$mediaField.width"))
            .as("width"),
          coalesce(element_at(col("__graft_dims"), 2), col(s"$mediaField.height"))
            .as("height"),
          col(s"$mediaField.duration_ms").as("duration_ms")
        )
      )
      .drop("__graft_dims")
  }
}

/** REAL frame sampling + per-frame decode for MJPEG AVI payloads: the
  * RIFF 'movi' chunks are standalone JPEGs, decoded with the same
  * deterministic [[Multimodal.decodeImage]] luma kernel as still images
  * — one output row per sampled frame with `frame_idx` and a
  * targetW×targetH feature array. Sampling steps every
  * `everyMs` of video time using the avih `dwMicroSecPerFrame` (30 fps
  * assumed when the header is absent). Non-AVI / non-MJPEG payloads take
  * the documented fallback: frame indices from `duration_ms` (the old
  * stub contract) with [[Multimodal.decodeStub]] features per index —
  * deterministic everywhere, so mixed/damaged corpora keep flowing.
  * Narrow 1→N explode; no shuffle. */
final case class SampleFrames(
    mediaField: String,
    everyMs: Long = 1000L,
    targetW: Int = 16,
    targetH: Int = 16,
    frameField: String = "frame_idx",
    outputField: String = "frame_features"
) extends Mapper {
  override def inputFields: Seq[String] = Seq(mediaField)
  override def outputFields: Seq[String] = Seq(frameField, outputField)
  override protected def build(df: DataFrame): DataFrame = {
    val tw = targetW
    val th = targetH
    val ems = math.max(1L, everyMs)
    val sample =
      udf { (bytes: Array[Byte], durationMs: java.lang.Long) =>
        if (Multimodal.isAvi(bytes)) {
          val frames = Multimodal.aviFrames(bytes)
          val mpf = Multimodal.aviMicrosPerFrame(bytes).getOrElse(33333L)
          val step = math.max(1L, math.round(ems * 1000.0 / mpf)).toInt
          (0 until frames.length by step).map { i =>
            (i.toLong, Multimodal.decodeImage(frames(i), tw, th).toSeq)
          }
        } else {
          val dur = if (durationMs == null) 0L else durationMs.longValue()
          val n = if (dur > 0) (dur / ems) + 1 else 1L
          (0L until n).map { i =>
            (i, Multimodal.decodeStub(bytes, tw, th).toSeq)
          }
        }
      }
    df.withColumn(
        "__graft_frames",
        explode(
          sample(col(s"$mediaField.bytes"), col(s"$mediaField.duration_ms")))
      )
      .withColumn(frameField, col("__graft_frames._1"))
      .withColumn(outputField, col("__graft_frames._2"))
      .drop("__graft_frames")
  }
}

/** Frame-INDEX sampling for video-like payloads: emit one row per sampled
  * frame index from declared duration (the 1→N explode pattern). Kept as
  * the lightweight index-only op; [[SampleFrames]] is the real MJPEG/AVI
  * per-frame decoder. */
final case class SampleFramesStub(
    mediaField: String,
    everyMs: Long = 1000L,
    frameField: String = "frame_idx"
) extends Mapper {
  override def inputFields: Seq[String] = Seq(mediaField)
  override def outputFields: Seq[String] = Seq(frameField)
  override protected def build(df: DataFrame): DataFrame = {
    val dur = coalesce(col(s"$mediaField.duration_ms"), lit(0L))
    df.withColumn(
      frameField,
      explode(
        when(dur > 0, sequence(lit(0L), floor(dur / everyMs).cast(LongType)))
          .otherwise(array(lit(0L)))
      )
    )
  }
}

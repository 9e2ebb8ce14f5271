package graft.operators

import graft.Mapper
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata structs.
  *
  * The Spark-side machinery here — schemas, partition-friendly batch
  * transforms, deterministic outputs — is real and tested. The actual
  * media decoding is STUBBED (`decodeStub`): this container ships no
  * image/audio codecs, so the decode produces a deterministic fake
  * derived from the bytes. Swap `decodeStub` for a real codec (e.g. a
  * JNI JPEG decoder) without touching any of the plumbing.
  */
object Multimodal {

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

  /** STUB decode: deterministic pseudo-pixels from the payload bytes
    * (raw byte values as floats — integer-valued, so exactly
    * reproducible anywhere). Real implementation = replace the body with
    * a codec call; signature and batch shape stay identical. */
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
}

/** Decode + resize a media column into a fixed-shape float feature array —
  * the `mapInPandas`-shaped batch op, expressed as a Spark-native
  * transform (narrow, partition-parallel, no shuffle).
  * The decode itself is [[Multimodal.decodeStub]] (clearly marked stub). */
final case class DecodeMediaStub(
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
    val decode = udf { (bytes: Array[Byte]) => Multimodal.decodeStub(bytes, w, h) }
    df.withColumn(outputField, decode(col(s"$mediaField.bytes")))
  }
}

/** Frame sampling for video-like payloads: emit one row per sampled frame
  * index (the 1→N explode pattern; decoding per frame remains stubbed). */
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

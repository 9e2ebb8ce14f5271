package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WARC-shape length-framed container codec — the one source/sink shape
  * the catalog's loaders didn't cover: MANY records per blob, each
  * framed by a Content-Length header (CommonCrawl WARC/WET layout).
  * Length framing exists because payloads may CONTAIN the record
  * marker and the header separator; any split-on-delimiter parser
  * corrupts such records, so the parser must walk the blob
  * sequentially, jumping payloads by their declared length.
  *
  * This is the character-framed shape of the format (Content-Length
  * counts characters, exact here because framing + parsing happen on
  * the same strings; real WARC counts bytes — at the Hadoop boundary
  * the same walk runs over byte arrays).
  *
  * Scale shape: render = one groupBy(group) collecting (id, record)
  * pairs; parse = a row-local sequential fold per blob (records inside
  * one blob are inherently ordered — that's the format), blobs
  * parallel across rows, then one explode. No shuffle beyond the
  * render groupBy. */
object WarcCodec {

  val Marker = "WARC/1.0\r\n"
  private val Sep = "\r\n\r\n"

  /** One framed record: marker, id + length headers, payload,
    * trailing separator. */
  def record(id: Column, payload: Column): Column =
    concat(
      lit(Marker),
      lit("WARC-Record-ID: "), id, lit("\r\n"),
      lit("Content-Length: "), length(payload).cast(StringType),
      lit(Sep), payload, lit(Sep))

  /** (group, blob): all records of a group concatenated in id order. */
  def render(
      df: DataFrame,
      groupField: String,
      idField: String,
      payloadField: String
  ): DataFrame =
    df.select(col(groupField).as("group"),
        col(idField).cast(StringType).as("__wc_id"),
        col(payloadField).as("__wc_p"))
      .groupBy("group")
      .agg(sort_array(collect_list(struct(
        col("__wc_id").as("id"),
        record(col("__wc_id"), col("__wc_p")).as("rec")))).as("__wc_rs"))
      .select(col("group"),
        array_join(transform(col("__wc_rs"), r => r("rec")), "")
          .as("blob"))

  /** Parse blobs back to (group, rid, content_length, payload) rows.
    * A sequential fold walks each blob: read the header (bounded by the
    * header/payload separator, wherever it falls — record ids of any
    * length are safe), jump the payload by its Content-Length, repeat.
    * The iteration budget is the marker-occurrence count (an upper
    * bound — payload-embedded fake markers inflate it; surplus steps
    * no-op once the cursor passes the end).
    *
    * Scale note: the fold's `concat(out, …)` copies the accumulated
    * record array each step, and the per-step separator scan reads the
    * blob tail — both make the per-blob cost quadratic in record
    * count. Keep the grouping grain at ~100 records per blob (the
    * q230 shard convention); for bigger containers, split groups
    * before rendering. */
  def parse(df: DataFrame, groupField: String, blobField: String): DataFrame = {
    val blob = col(blobField)
    val blobLen = length(blob).cast(LongType)
    val occurrences =
      ((blobLen - length(call_function("replace", blob, lit(Marker), lit(""))))
        / lit(Marker.length)).cast(LongType)
    val zero = struct(
      lit(1L).as("pos"),
      array().cast(
        "array<struct<rid:string,clen:bigint,payload:string>>").as("out"))
    val folded = aggregate(
      sequence(lit(1L), greatest(occurrences, lit(0L))),
      zero,
      (st, _) => {
        val pos = st("pos")
        val out = st("out")
        // Header window ends at the header/payload separator, located
        // in the blob tail — not a fixed-width substr, so a record id
        // long enough to push Content-Length past any fixed window
        // cannot corrupt the parse.
        val tail = blob.substr(pos, blobLen)
        val sepAt = instr(tail, Sep).cast(LongType) // 1-based within tail
        val hdr = tail.substr(lit(1L), sepAt + lit(3L))
        val rid = regexp_extract(hdr, "WARC-Record-ID: ([^\r]+)", 1)
        val clen = regexp_extract(hdr, "Content-Length: ([0-9]+)", 1)
          .cast(LongType)
        val payloadStart = pos + sepAt + 3
        val payload = blob.substr(payloadStart, clen)
        val stepped = struct(
          (payloadStart + clen + 4).as("pos"),
          concat(out, array(struct(
            rid.as("rid"), clen.as("clen"), payload.as("payload"))))
            .as("out"))
        when(pos <= blobLen, stepped).otherwise(st)
      })
    df.select(col(groupField).as("group"),
        explode(folded("out")).as("rec"))
      .select(col("group"), col("rec.rid").as("rid"),
        col("rec.clen").as("content_length"),
        col("rec.payload").as("payload"))
  }
}

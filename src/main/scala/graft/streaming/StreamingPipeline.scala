package graft.streaming

import graft.Mapper
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming support.
  *
  * The reference's only streaming notion is one-pass lazy iteration over
  * HF IterableDataset (/root/reference/src/smashed/base/interfaces.py:247);
  * every reference op is event-time-free, so running a mapper chain on a
  * streaming DataFrame "just works" for the narrow (per-row) operators —
  * the SAME Mapper values lower onto a streaming plan unchanged
  * (SURVEY §2.10). Order-sensitive batchers are rejected explicitly.
  *
  * Beyond parity, the helpers below add the streaming pieces a training-
  * data pipeline needs at scale: event-time windowed counts with
  * watermarks (late-data bounded state) and keyed custom state via
  * flatMapGroupsWithState (streaming dedup).
  */
object StreamingPipeline {

  /** Operators whose semantics depend on a global row order — meaningless
    * on an unbounded stream without explicit windows. */
  private def orderSensitive(m: Mapper): Boolean = m match {
    case f: graft.operators.FixedBatchSize     => f.orderBy.nonEmpty
    case _: graft.operators.FewShotJinjaMapper => true
    case _: graft.operators.EnumerateField     => true
    case p: graft.Pipeline                     => p.stages.exists(orderSensitive)
    case _                                     => false
  }

  /** Apply a mapper chain to a streaming DataFrame (same plan lowering as
    * batch); rejects order-sensitive stages with a clear error. */
  def apply(pipeline: Mapper, stream: DataFrame): DataFrame = {
    require(stream.isStreaming, "StreamingPipeline.apply expects a stream")
    require(
      !orderSensitive(pipeline),
      s"${pipeline.name} contains order-sensitive stages; " +
        "use event-time windows instead of global batching on streams"
    )
    pipeline(stream)
  }

  /** Event-time windowed counts with a watermark — the standard
    * late-data-bounded aggregation. State size is bounded by
    * (watermark horizon / slide) per key. */
  def windowedCounts(
      stream: DataFrame,
      tsField: String,
      keyField: String,
      windowDur: String = "1 minute",
      slide: String = "1 minute",
      watermark: String = "2 minutes"
  ): DataFrame =
    stream
      .withWatermark(tsField, watermark)
      .groupBy(window(col(tsField), windowDur, slide), col(keyField))
      .agg(count(lit(1)).as("n"))

  /** Streaming exact-dedup on a key (e.g. a text hash): emits only the
    * first occurrence of each key. Keyed state via flatMapGroupsWithState;
    * state per key is one boolean — at 100 TB/day the state store backs
    * onto RocksDB and the key should be the 64-bit hash, not the text. */
  def streamingDedup(
      stream: DataFrame,
      keyField: String
  ): DataFrame = {
    import stream.sparkSession.implicits._
    val enc = org.apache.spark.sql.Encoders.row(stream.schema)
    implicit val rowEnc: org.apache.spark.sql.Encoder[Row] = enc
    stream
      .groupByKey(r => r.getAs[Any](keyField).toString)
      .flatMapGroupsWithState[Boolean, Row](
        OutputMode.Append(),
        GroupStateTimeout.NoTimeout()
      ) { (_: String, rowsIt: Iterator[Row], state: GroupState[Boolean]) =>
        if (state.exists) Iterator.empty
        else {
          state.update(true)
          rowsIt.take(1)
        }
      }
  }
}

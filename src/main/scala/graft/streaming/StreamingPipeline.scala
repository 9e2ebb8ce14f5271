package graft.streaming

import graft.Mapper
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
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
  * watermarks (late-data bounded state), keyed custom state via
  * flatMapGroupsWithState (streaming dedup), and event-time gap
  * sessionization with timeout-driven emission.
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

  /** Event-time gap sessionization — the streaming analog of the batch
    * sessionize query (q04): rows keyed by `keyField` accumulate into a
    * session while inter-event gaps stay under `gapSeconds`; a session
    * closes either when a later event of the same key opens the next one
    * (emitted immediately) or when the event-time WATERMARK passes
    * `last + gap` (emitted via EventTimeTimeout, state removed — so
    * state per key is one (start,last,n) triple, bounded by the
    * watermark horizon, never the stream).
    *
    * Output: key, session_start, session_end (epoch millis), n_events.
    * Late events beyond the watermark are dropped by the watermark
    * itself — standard Structured Streaming semantics. A late event
    * that is still inside the watermark but PRECEDES the open session's
    * start merges into it (counted, start unchanged) rather than
    * rewriting history — the same forward-only tradeoff the built-in
    * session_window aggregation makes for already-emitted windows. */
  def sessionize(
      stream: DataFrame,
      tsField: String,
      keyField: String,
      gapSeconds: Long = 1800L,
      watermark: String = "2 minutes"
  ): DataFrame = {
    require(gapSeconds > 0, "gapSeconds must be positive")
    import stream.sparkSession.implicits._
    val gapMs = gapSeconds * 1000L
    stream
      // project/cast FIRST: a cast of a watermarked column mints a fresh
      // attribute without the watermark metadata
      .select(
        col(keyField).cast("string").as("k"),
        col(tsField).cast("timestamp").as("ts")
      )
      .withWatermark("ts", watermark)
      .as[(String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Long), (String, Long, Long, Long)](
        OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()
      ) { (k, it, state) =>
        if (state.hasTimedOut) {
          // watermark passed last+gap: the open session is final
          val (s, l, n) = state.get
          state.remove()
          Iterator((k, s, l, n))
        } else {
          val times = it.map(_._2.getTime).toArray.sorted
          val closed = scala.collection.mutable.ListBuffer.empty[(String, Long, Long, Long)]
          var cur = state.getOption
          times.foreach { t =>
            cur match {
              case Some((s, l, n)) if t - l <= gapMs =>
                cur = Some((s, math.max(l, t), n + 1))
              case Some(sess) =>
                closed += ((k, sess._1, sess._2, sess._3))
                cur = Some((t, t, 1L))
              case None =>
                cur = Some((t, t, 1L))
            }
          }
          cur.foreach { c =>
            state.update(c)
            state.setTimeoutTimestamp(c._2 + gapMs)
          }
          closed.iterator
        }
      }
      .toDF("key", "session_start", "session_end", "n_events")
  }

  /** Streaming NEAR-dup flagging: micro-batch incremental minhash dedup
    * against a durable parquet signature store. Each micro-batch (a) has
    * its minhash signatures computed, (b) is flagged against every
    * signature persisted by earlier epochs via
    * [[graft.operators.MinHashLSH.nearDupAgainst]] (bucket-local
    * incoming×existing join — work is batch-proportional, never
    * corpus-quadratic), (c) is handed to `onBatch`, and (d) appends its
    * own signatures to the store under `epoch=<id>` — an overwrite of
    * that one subdir, so a replayed epoch after failure is idempotent.
    *
    * The dedup state deliberately lives in the parquet store, NOT in the
    * executors' state store: near-dup state is the full signature+words
    * table of everything ever seen, which must outlive the query, be
    * shared with the batch side ([[graft.operators.MinHashLSH]] reads
    * the same layout), and at 100 TB it is a corpus-sized table — a
    * durable columnar store the bucket join can prune, not a per-key
    * RocksDB blob. Within-batch near-dups are NOT flagged here: compose
    * a batch-side dedup in `onBatch` if a single micro-batch can carry
    * its own near-dups.
    *
    * `onBatch` receives the batch WITH `minhash_sig` and the boolean
    * `dup_of_existing` column, plus the epoch id. */
  def streamingNearDup(
      stream: DataFrame,
      sigStoreDir: String,
      checkpointDir: String,
      idField: String,
      wordsField: String = "words",
      shingleSize: Int = 3,
      numHashes: Int = 16,
      bands: Int = 4,
      minJaccard: Double = 0.8,
      onBatch: (DataFrame, Long) => Unit
  ): org.apache.spark.sql.streaming.StreamingQuery = {
    require(stream.isStreaming, "streamingNearDup expects a stream")
    import graft.operators.{MinHashLSH, MinHashSignature}
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        val spark = batch.sparkSession
        val sigs = MinHashSignature(wordsField, shingleSize, numHashes)(batch)
          .persist()
        val fs = org.apache.hadoop.fs.FileSystem.getLocal(
          spark.sparkContext.hadoopConfiguration)
        val storePath = new org.apache.hadoop.fs.Path(sigStoreDir)
        val priorEpochs =
          if (!fs.exists(storePath)) Array.empty[org.apache.hadoop.fs.FileStatus]
          else fs.listStatus(storePath).filter { st =>
            // a replayed epoch must not dedup against its own failed write
            val n = st.getPath.getName
            n.startsWith("epoch=") &&
              n.stripPrefix("epoch=").toLong < epochId
          }
        val flagged =
          if (priorEpochs.isEmpty)
            sigs.withColumn("dup_of_existing", lit(false))
          else {
            val existing = spark.read
              .option("basePath", sigStoreDir)
              .parquet(priorEpochs.map(_.getPath.toString): _*)
            MinHashLSH.nearDupAgainst(
              existingSigs = existing, incomingSigs = sigs,
              idField = idField, wordsField = wordsField,
              bands = bands, sigLen = numHashes, minJaccard = minJaccard)
          }
        onBatch(flagged, epochId)
        sigs
          .select(col(idField), col("minhash_sig"), col(wordsField))
          .write.mode("overwrite")
          .parquet(s"$sigStoreDir/epoch=$epochId")
        sigs.unpersist()
        ()
      }
      .start()
  }

  /** Streaming "seen before?" filter over a durable Bloom store — the
    * rolling-decontamination / re-crawl check: each micro-batch is
    * probed against the OR-merge of every PRIOR epoch's
    * [[graft.operators.BloomSketch]] row, then contributes its own
    * filter as `epoch=N`. Same durable-store replay discipline as
    * [[streamingNearDup]] (a replayed epoch never probes its own failed
    * write), but the store is O(m) BITS per epoch regardless of batch
    * size — the whole history merges into one kilobyte row at the top
    * of each batch. Probes have no false negatives; positives are
    * `might_have_seen` (FPR ≈ (1−e^{−kn/m})^k — size m for the corpus,
    * or fall back to [[streamingDedup]]'s exact keyed state). */
  def streamingSeenFilter(
      stream: DataFrame,
      filterStoreDir: String,
      checkpointDir: String,
      valueField: String,
      mBits: Int = 1 << 20,
      k: Int = 3,
      onBatch: (DataFrame, Long) => Unit
  ): org.apache.spark.sql.streaming.StreamingQuery = {
    require(stream.isStreaming, "streamingSeenFilter expects a stream")
    import graft.operators.BloomSketch
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        onBatch(
          seenFilterProbe(batch, filterStoreDir, valueField, mBits, k, epochId),
          epochId)
        seenFilterAppend(batch, filterStoreDir, valueField, mBits, k, epochId)
      }
      .start()
  }

  /** One micro-batch's probe leg of [[streamingSeenFilter]] — exposed
    * for batch replays and direct testing. Every input row survives:
    * the prior-epoch merge rides a LEFT join with a null-guard, so a
    * store whose prior epochs carry zero rows (or no store at all)
    * flags `might_have_seen = false` instead of silently dropping the
    * batch. */
  private[graft] def seenFilterProbe(
      batch: DataFrame,
      filterStoreDir: String,
      valueField: String,
      mBits: Int,
      k: Int,
      epochId: Long
  ): DataFrame = {
    import graft.operators.BloomSketch
    val spark = batch.sparkSession
    val priorEpochs = listPriorEpochs(spark, filterStoreDir, epochId)
    if (priorEpochs.isEmpty)
      batch.withColumn("might_have_seen", lit(false))
    else {
      val merged = BloomSketch.merge(
        spark.read
          .option("basePath", filterStoreDir)
          .parquet(priorEpochs: _*)
          .withColumn("__bloom_g", lit(0)),
        Seq("__bloom_g"), mBits)
      batch.withColumn("__bloom_g", lit(0))
        .join(broadcast(merged.select(col("__bloom_g"), col("bloom"))),
          Seq("__bloom_g"), "left")
        .withColumn("might_have_seen",
          when(col("bloom").isNull, lit(false)).otherwise(
            BloomSketch.mightContain(col("bloom"), col(valueField), k, mBits)))
        .drop("__bloom_g", "bloom")
    }
  }

  /** One micro-batch's store-append leg of [[streamingSeenFilter]].
    * Zero-row micro-batches write NOTHING: an empty agg would leave a
    * rowless `epoch=` file in the store for every later merge to read
    * (and, pre-fix, for the probe's old inner join to be emptied by). */
  private[graft] def seenFilterAppend(
      batch: DataFrame,
      filterStoreDir: String,
      valueField: String,
      mBits: Int,
      k: Int,
      epochId: Long
  ): Unit = {
    import graft.operators.BloomSketch
    val built = BloomSketch.build(
        batch.withColumn("__bloom_g", lit(0)),
        Seq("__bloom_g"), valueField, mBits, k)
      .drop("__bloom_g")
    if (!built.isEmpty)
      built.write.mode("overwrite")
        .parquet(s"$filterStoreDir/epoch=$epochId")
  }

  private def listPriorEpochs(
      spark: SparkSession,
      storeDir: String,
      epochId: Long
  ): Seq[String] = {
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val storePath = new org.apache.hadoop.fs.Path(storeDir)
    if (!fs.exists(storePath)) Seq.empty
    else fs.listStatus(storePath).toSeq
      .filter { st =>
        val n = st.getPath.getName
        n.startsWith("epoch=") && n.stripPrefix("epoch=").toLong < epochId
      }
      .map(_.getPath.toString)
  }

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

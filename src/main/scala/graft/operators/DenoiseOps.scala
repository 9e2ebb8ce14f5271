package graft.operators

import graft.Mapper
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Span-corruption denoising prep (T5, Raffel et al. 2020 §3.1.4; the
  * UL2 R-denoiser): mask contiguous token spans with sentinel ids and
  * emit the (inputs, targets) pair the seq2seq objective trains on —
  * `inputs` = sequence with each span replaced by one sentinel,
  * `targets` = sentinel + original span per mask, closed by a final
  * sentinel.
  *
  * Span placement is HASH-SEEDED and blockwise rather than T5's
  * geometric sampling (documented divergence): the sequence is cut into
  * fixed blocks of `blockSize`; each FULL block masks one `spanLen` run
  * whose offset is md5(key:block) mod (blockSize-spanLen+1). That keeps
  * the corruption rate exact (spanLen/blockSize, default 3/20 = T5's
  * 15%), spans non-overlapping by construction, and the whole op a
  * deterministic pure function of (key, ids) — so it replays
  * bit-identically on any engine and any partitioning, the property the
  * seeded-RNG original lacks.
  *
  * Everything is native Catalyst HOFs over the ids array (no UDF): one
  * codegen'd projection, zero shuffle, linear in corpus size. */
final case class SpanCorruption(
    idsField: String,
    keyField: String,
    blockSize: Int = 20,
    spanLen: Int = 3,
    sentinelStart: Long = 32099L,
    maxSpans: Int = 99,
    inputsField: String = "inputs",
    targetsField: String = "targets"
) extends Mapper {
  require(spanLen > 0 && blockSize > spanLen,
    s"need 0 < spanLen ($spanLen) < blockSize ($blockSize)")
  require(maxSpans >= 1, s"maxSpans must be positive: $maxSpans")

  override def inputFields: Seq[String] = Seq(idsField, keyField)
  override def outputFields: Seq[String] = Seq(inputsField, targetsField)

  override protected def build(df: DataFrame): DataFrame = {
    val b = blockSize
    val l = spanLen
    val ids = col(idsField)
    // sentinel ids descend from sentinelStart; cap the corrupted blocks
    // at maxSpans (T5 ships 100 extra ids: closing sentinel uses index
    // nb, so 99 spans keeps every id inside 32000..32099) — blocks past
    // the cap pass through uncorrupted rather than colliding with the
    // real vocabulary
    val nb = least((size(ids) / b).cast(LongType), lit(maxSpans.toLong))
    // deterministic span offset inside block `bi`
    def start(bi: Column): Column =
      conv(substring(md5(concat(col(keyField).cast("string"), lit(":"),
        bi.cast("string"))), 1, 8), 16, 10).cast(LongType) % (b - l + 1)
    def sentinel(bi: Column): Column = (lit(sentinelStart) - bi).cast(LongType)
    val blocks = when(nb > 0, sequence(lit(0L), nb - 1))
      .otherwise(array().cast("array<bigint>"))
    val inputs = concat(
      flatten(transform(blocks, bi => {
        val s = start(bi)
        concat(
          slice(ids, (bi * b + 1).cast("int"), s.cast("int")),
          array(sentinel(bi)),
          slice(ids, (bi * b + s + l + 1).cast("int"), (lit(b) - s - l).cast("int")))
      })),
      slice(ids, (nb * b + 1).cast("int"), (size(ids) - nb * b).cast("int")))
    val targets = concat(
      flatten(transform(blocks, bi =>
        concat(array(sentinel(bi)),
          slice(ids, (bi * b + start(bi) + 1).cast("int"), lit(l))))),
      array(sentinel(nb)))
    df.withColumn(inputsField, inputs).withColumn(targetsField, targets)
  }
}

/** Fill-in-the-middle transformation (Bavarian et al. 2022, "Efficient
  * Training of Language Models to Fill in the Middle"): split the
  * sequence at two cut points and reorder with sentinels so a causal LM
  * learns infilling — PSM `[PRE] prefix [SUF] suffix [MID] middle` or
  * SPM `[PRE] [SUF] suffix [MID] prefix middle`, mixed at `spmRate`%.
  *
  * Cut points and the mode draw from md5(key:tag) — the same
  * pure-function-of-(key, ids) property as [[SpanCorruption]]: exact
  * replay on any engine, run, or partitioning. Native HOFs; one
  * codegen'd projection; zero shuffle. */
final case class FimTransform(
    idsField: String,
    keyField: String,
    preId: Long = 32001L,
    midId: Long = 32002L,
    sufId: Long = 32003L,
    spmRate: Int = 50,
    outputField: String = "fim_ids"
) extends Mapper {
  require(spmRate >= 0 && spmRate <= 100, s"spmRate out of range: $spmRate")

  override def inputFields: Seq[String] = Seq(idsField, keyField)
  override def outputFields: Seq[String] = Seq(outputField)

  override protected def build(df: DataFrame): DataFrame = {
    def h(tag: String): Column =
      conv(substring(md5(concat(col(keyField).cast("string"),
        lit(s":$tag"))), 1, 8), 16, 10).cast(LongType)
    val ids = col(idsField)
    val n = size(ids).cast(LongType)
    val a = h("fim_a") % (n + 1)
    val b = a + h("fim_b") % (n - a + 1)
    val prefix = slice(ids, lit(1), a.cast("int"))
    val middle = slice(ids, (a + 1).cast("int"), (b - a).cast("int"))
    val suffix = slice(ids, (b + 1).cast("int"), (n - b).cast("int"))
    val psm = concat(array(lit(preId)), prefix, array(lit(sufId)), suffix,
      array(lit(midId)), middle)
    val spm = concat(array(lit(preId), lit(sufId)), suffix,
      array(lit(midId)), prefix, middle)
    df.withColumn(outputField,
      when(h("fim_o") % 100 < spmRate, spm).otherwise(psm))
  }
}

/** SFT turn masking — the chat-tuning data-prep staple: a conversation
  * arrives as an array of (role, ids) turns; training flattens the
  * turns into one sequence but the loss must only see ASSISTANT tokens
  * (user/system text is context, not target). Emits the flat id
  * sequence plus an aligned 0/1 `loss_mask` (1 exactly on tokens of
  * turns whose role is in `lossRoles`).
  *
  * Pure native HOFs over the nested column — flatten + per-turn
  * broadcast of the role predicate; no UDF, no shuffle, and the
  * (ids, mask) alignment is structural, not positional bookkeeping. */
final case class TurnMasking(
    turnsField: String,
    lossRoles: Set[String] = Set("assistant"),
    idsSubfield: String = "ids",
    roleSubfield: String = "role",
    flatIdsField: String = "input_ids",
    maskField: String = "loss_mask"
) extends Mapper {
  require(lossRoles.nonEmpty, "lossRoles must not be empty")

  override def inputFields: Seq[String] = Seq(turnsField)
  override def outputFields: Seq[String] = Seq(flatIdsField, maskField)

  override protected def build(df: DataFrame): DataFrame = {
    // drop malformed turns whose ids subfield is null BEFORE flattening —
    // flatten propagates a single null element to a null result, which
    // would silently null input_ids/loss_mask for the whole conversation
    val turns = filter(col(turnsField), t => t.getField(idsSubfield).isNotNull)
    val roles = lossRoles.toSeq.sorted
    def isLoss(t: Column): Column =
      array_contains(array(roles.map(lit): _*), t.getField(roleSubfield))
    df.withColumn(flatIdsField,
        flatten(transform(turns, t => t.getField(idsSubfield))))
      .withColumn(maskField,
        flatten(transform(turns, t =>
          transform(t.getField(idsSubfield),
            _ => when(isLoss(t), lit(1L)).otherwise(lit(0L))))))
  }
}

/** MLM masking prep (BERT, Devlin et al. 2019 §3.1): select ~`maskPct`%
  * of positions; of those, 80% become `maskId`, 10% a pseudo-random
  * vocabulary token, 10% keep the original; `labels` carries the
  * original id at selected positions and -100 elsewhere (the ignore
  * index every MLM loss uses).
  *
  * All three decisions (select / branch / random token) derive from
  * md5(key:tag:position) — a pure function of (key, ids) like
  * [[SpanCorruption]], so the masking replays bit-identically across
  * engines, runs, and partitionings. Native HOFs only: one codegen'd
  * projection, zero shuffle. */
final case class MlmMasking(
    idsField: String,
    keyField: String,
    maskPct: Int = 15,
    maskId: Long = 103L,
    vocabSize: Long = 30000L,
    maskedField: String = "masked_ids",
    labelsField: String = "labels"
) extends Mapper {
  require(maskPct >= 0 && maskPct <= 100, s"maskPct out of range: $maskPct")

  override def inputFields: Seq[String] = Seq(idsField, keyField)
  override def outputFields: Seq[String] = Seq(maskedField, labelsField)

  override protected def build(df: DataFrame): DataFrame = {
    def h(tag: String, i: Column): Column =
      conv(substring(md5(concat(col(keyField).cast("string"),
        lit(s":$tag:"), i.cast("string"))), 1, 8), 16, 10).cast(LongType)
    val ids = col(idsField)
    val masked = transform(ids, (x, i) =>
      when(h("m", i) % 100 < maskPct,
        when(h("b", i) % 10 === 8, h("r", i) % vocabSize)
          .when(h("b", i) % 10 === 9, x)
          .otherwise(lit(maskId)))
        .otherwise(x))
    val labels = transform(ids, (x, i) =>
      when(h("m", i) % 100 < maskPct, x).otherwise(lit(-100L)))
    df.withColumn(maskedField, masked).withColumn(labelsField, labels)
  }
}

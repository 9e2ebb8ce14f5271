package graft.operators

import graft.Mapper
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-row sequence ops: special-token padding, masks, label broadcast,
  * greedy multi-sequence packing, padding & truncation.
  * Ref: /root/reference/src/smashed/mappers/multiseq.py,
  * /root/reference/src/smashed/mappers/tokenize.py:274-342,
  * /root/reference/src/smashed/mappers/prompting.py:151-335.
  */

/** BOS/SEP/EOS id lists, the driver-side constant the reference probes out
  * of a HF tokenizer (multiseq.py:50-89). */
final case class SpecialTokens(
    bos: Seq[Long],
    sep: Seq[Long],
    eos: Seq[Long]
)

private[operators] object SeqUtil {
  def litArray(xs: Seq[Long]): Column =
    if (xs.isEmpty) array().cast(ArrayType(LongType))
    else array(xs.map(x => lit(x)): _*)

  /** [0, n) as array<long>; empty when n <= 0 (a bare `sequence(0, n-1)`
    * would infer step -1 and yield [0,-1] for n=0). */
  def seq0(n: Column): Column =
    when(n > 0, sequence(lit(0L), n.cast(LongType) - 1))
      .otherwise(array().cast(ArrayType(LongType)))
}

/** Wrap a list-of-sequences with BOS/SEP/EOS id lists.
  * Ref: multiseq.py:27-103: seq i gets `bos` prefix iff i==0, and `eos`
  * suffix iff last else `sep`. */
final case class TokensSequencesPadding(
    inputField: String = "input_ids",
    specials: SpecialTokens
) extends Mapper {
  import SeqUtil.litArray
  override def inputFields: Seq[String] = Seq(inputField)
  override def outputFields: Seq[String] = Seq(inputField)
  override protected def build(df: DataFrame): DataFrame = {
    val n = size(col(inputField))
    df.withColumn(
      inputField,
      transform(
        col(inputField),
        (s, i) =>
          concat(
            when(i === 0, litArray(specials.bos))
              .otherwise(array().cast(ArrayType(LongType))),
            s.cast(ArrayType(LongType)),
            when(i === n - 1, litArray(specials.eos))
              .otherwise(litArray(specials.sep))
          )
      )
    )
  }
}

/** Same, but pads with 1s (attention mask). Ref: multiseq.py:106-125. */
final case class AttentionMaskSequencePadding(
    inputField: String = "attention_mask",
    specials: SpecialTokens
) extends Mapper {
  override def inputFields: Seq[String] = Seq(inputField)
  override def outputFields: Seq[String] = Seq(inputField)
  override protected def build(df: DataFrame): DataFrame =
    TokensSequencesPadding(
      inputField,
      SpecialTokens(
        specials.bos.map(_ => 1L),
        specials.sep.map(_ => 1L),
        specials.eos.map(_ => 1L)
      )
    )(df)
}

/** Same, but pads with each sequence's first symbol (token type ids).
  * Ref: multiseq.py:128-169 — note the suffix is only added to the LAST
  * sequence (length of eos), others get a prefix only. */
final case class TokenTypeIdsSequencePadding(
    inputField: String = "token_type_ids",
    specials: SpecialTokens
) extends Mapper {
  override def inputFields: Seq[String] = Seq(inputField)
  override def outputFields: Seq[String] = Seq(inputField)
  override protected def build(df: DataFrame): DataFrame = {
    val n = size(col(inputField))
    df.withColumn(
      inputField,
      transform(
        col(inputField),
        (s, i) => {
          val first = coalesce(get(s, lit(0)).cast(LongType), lit(0L))
          val prefixLen = when(i === 0, lit(specials.bos.size))
            .otherwise(lit(specials.sep.size))
          val suffixLen =
            when(i === n - 1, lit(specials.eos.size)).otherwise(lit(0))
          concat(
            array_repeat(first, prefixLen),
            s.cast(ArrayType(LongType)),
            array_repeat(first, suffixLen)
          )
        }
      )
    )
  }
}

/** attention_mask[i] = [1]*len(input_ids[i]). Ref: multiseq.py:172-194. */
final case class MakeAttentionMask(
    inputField: String = "input_ids",
    outputField: String = "attention_mask"
) extends Mapper {
  override def inputFields: Seq[String] = Seq(inputField)
  override def outputFields: Seq[String] = Seq(outputField)
  override protected def build(df: DataFrame): DataFrame =
    df.withColumn(
      outputField,
      transform(col(inputField), s => array_repeat(lit(1L), size(s)))
    )
}

/** Broadcast each scalar label to a sequence shaped like the corresponding
  * entry of `likeField`. Ref: multiseq.py:452-516. The labels field holds
  * one scalar per sequence (array<long>); `likeField` is a list of
  * sequences. */
final case class SingleValueToSequence(
    singleValueField: String,
    likeField: String = "input_ids",
    strategy: String = "first",
    paddingId: Long = -100
) extends Mapper {
  require(
    Set("first", "last", "all").contains(strategy),
    s"Strategy $strategy is not supported"
  )
  override def inputFields: Seq[String] = Seq(singleValueField, likeField)
  override def outputFields: Seq[String] = Seq(singleValueField, likeField)
  override protected def build(df: DataFrame): DataFrame =
    df.withColumn(
      singleValueField,
      transform(
        col(singleValueField),
        (v, i) => {
          val likeLen = size(element_at(col(likeField), (i + 1).cast(IntegerType)))
          strategy match {
            case "first" =>
              concat(
                array(v.cast(LongType)),
                array_repeat(lit(paddingId), likeLen - 1)
              )
            case "last" =>
              concat(
                array_repeat(lit(paddingId), likeLen - 1),
                array(v.cast(LongType))
              )
            case "all" => array_repeat(v.cast(LongType), likeLen)
          }
        }
      )
    )
}

/** Mask label positions. Strategies (multiseq.py:197-295):
  *   - "all": identity;
  *   - "one": emit one row per label position, with exactly that label
  *     unmasked (1→N, via posexplode + positional rebuild);
  *   - "sample": emit ⌈1/p⌉ rows covering shuffled label subsets — the
  *     reference uses unseeded random.shuffle (multiseq.py:280); we use a
  *     seeded shuffle for reproducibility (SURVEY.md §7.3).
  */
final case class LabelsMasker(
    labelsField: String = "labels",
    strategy: String = "all",
    sampleProb: Option[Double] = None,
    labelMaskId: Long = -100,
    seed: Long = 42L,
    // optional override for the position shuffle key (given the position
    // column, return an orderable Column). Production default = seeded
    // xxhash64 of (position, row content); override with an engine-
    // portable key (e.g. md5 of position+row id) when results must be
    // reproducible outside Spark — the driver oracle for q67 does this.
    sampleHash: Option[Column => Column] = None
) extends Mapper {
  require(Set("all", "one", "sample").contains(strategy),
    s"Unknown strategy $strategy")
  require(strategy != "sample" || sampleProb.isDefined,
    "no sampleProb provided for sample strategy")
  override def inputFields: Seq[String] = Seq(labelsField)
  override def outputFields: Seq[String] = Seq(labelsField)

  override protected def build(df: DataFrame): DataFrame = strategy match {
    case "all" => df
    case "one" =>
      val exploded = df.withColumn(
        "__graft_i",
        explode(SeqUtil.seq0(size(col(labelsField))))
      )
      exploded
        .withColumn(
          labelsField,
          transform(
            col(labelsField),
            (l, j) =>
              when(j === col("__graft_i"), l.cast(LongType))
                .otherwise(lit(labelMaskId))
          )
        )
        .drop("__graft_i")
    case "sample" =>
      val p = sampleProb.get
      val n = size(col(labelsField)).cast(LongType)
      val sliceSize = greatest((n.cast(DoubleType) * p).cast(LongType), lit(1L))
      // seeded deterministic shuffle of positions: sort 0..n-1 by a hash
      val positions = SeqUtil.seq0(n)
      val posKey: Column => Column = sampleHash.getOrElse(
        i => xxhash64(i, hash(col(labelsField)).cast(LongType), lit(seed)))
      val shuffled = transform(
        array_sort(
          transform(
            positions,
            i => struct(posKey(i).as("h"), i.as("p"))
          )
        ),
        s => s.getField("p")
      )
      val chunkStarts =
        when(n > 0, sequence(lit(0L), n - 1, sliceSize))
          .otherwise(array().cast(ArrayType(LongType)))
      val exploded = df.withColumn("__graft_sh", shuffled)
        .withColumn("__graft_cs", explode(chunkStarts))
      val active = slice(col("__graft_sh"), (col("__graft_cs") + 1).cast(IntegerType),
        sliceSize.cast(IntegerType))
      exploded
        .withColumn(
          labelsField,
          transform(
            col(labelsField),
            (l, i) =>
              when(array_contains(active, i.cast(LongType)), l.cast(LongType))
                .otherwise(lit(labelMaskId))
          )
        )
        .drop("__graft_sh", "__graft_cs")
  }
}

/** Pack a list-of-sequences into chunks bounded by `maxStrideCount`
  * sequences AND `maxLength` total tokens (+ extraLengthPerSeq reserved
  * for specials). Ref: multiseq.py:298-449 — a greedy sequential scan.
  *
  * Implementation: break positions come from the native
  * [[graft.functions.GreedyPackBreaks]] expression (row-local linear
  * scan — the greedy reset is inherently sequential but stays inside one
  * row, narrow and parallel across rows), then `explode` over the
  * resulting [start,end) chunks.
  */
final case class MultiSequenceStrider(
    maxStrideCount: Int,
    lengthReferenceField: String,
    fieldsToStride: Option[Seq[String]] = None,
    maxLength: Option[Int] = None,
    extraLengthPerSeq: Int = 0
) extends Mapper {
  override def inputFields: Seq[String] = Seq(lengthReferenceField)
  override def outputFields: Seq[String] = Seq(lengthReferenceField)

  override protected def build(df: DataFrame): DataFrame = {
    val maxLen = maxLength.map(_.toLong).getOrElse(Long.MaxValue / 4)
    val lens = transform(
      col(lengthReferenceField),
      s => size(s).cast(LongType) + lit(extraLengthPerSeq.toLong)
    )
    val total = size(col(lengthReferenceField)).cast(LongType)
    val starts = graft.functions.functions.greedy_pack_breaks(
      lens, lit(maxStrideCount.toLong), lit(maxLen))
    // chunk k = [starts[k], starts[k+1] or total)
    val chunks = transform(
      starts,
      (s, k) =>
        struct(
          s.as("s"),
          coalesce(get(starts, k + 1), total).as("e")
        )
    )
    val strideAll = fieldsToStride.isEmpty
    val strideSet = fieldsToStride.getOrElse(Nil).toSet + lengthReferenceField
    val exploded = df.withColumn("__graft_chunk", explode(chunks))
    val s = col("__graft_chunk").getField("s")
    val e = col("__graft_chunk").getField("e")
    val outCols = df.columns.toSeq.map { c =>
      if (strideAll || strideSet.contains(c))
        df.schema(c).dataType match {
          case _: ArrayType =>
            slice(col(c), (s + 1).cast(IntegerType), (e - s).cast(IntegerType)).as(c)
          case _ => col(c)
        }
      else col(c)
    }
    exploded.select(outCols: _*)
  }
}

/** Right-pad each listed field to exactly `padToLength`; errors if longer
  * (the reference raises, tokenize.py:306-331). */
final case class Padding(
    padToLength: Int,
    padValue: Any,
    fieldsToPad: Seq[String]
) extends Mapper {
  override def inputFields: Seq[String] = fieldsToPad
  override def outputFields: Seq[String] = fieldsToPad
  override protected def build(df: DataFrame): DataFrame =
    fieldsToPad.foldLeft(df) { (acc, f) =>
      acc.withColumn(
        f,
        when(
          size(col(f)) > padToLength,
          raise_error(concat(
            lit(s"PaddingMapper expects every input sequence to be <= " +
              s"padToLength=$padToLength, got "),
            size(col(f)).cast(StringType)
          ))
        ).otherwise(
          concat(
            col(f),
            array_repeat(lit(padValue), lit(padToLength) - size(col(f)))
          )
        )
      )
    }
}

object TruncateMultipleFields {
  /** Shared budget arithmetic (prompting.py:217-275), reused by the
    * nested variant. */
  def truncatedLens(
      lens: Seq[Column],
      maxLen: Column,
      strategy: String
  ): Seq[Column] = {
    val total = lens.reduce(_ + _)
    def uniform(ls: Seq[Column], budget: Column, tot: Column): Seq[Column] =
      ls.map(l =>
        when(budget >= tot, l)
          .otherwise(floor(l.cast(DoubleType) * budget.cast(DoubleType) / tot.cast(DoubleType)).cast(LongType))
      )
    strategy match {
      case "uniform" => uniform(lens, maxLen, total)
      case "longest" =>
        val n = lens.size.toLong
        val target = floor(maxLen.cast(DoubleType) / n).cast(LongType)
        val longer = lens.map(l => when(l > target, l - target).otherwise(lit(0L)))
        val savings = lens
          .map(l => when(l < target, target - l).otherwise(lit(0L)))
          .reduce(_ + _)
        val extra = maxLen - target * n + savings
        val longerTotal = longer.reduce(_ + _)
        val redistributed = uniform(longer, extra, longerTotal)
        lens.zip(redistributed).map { case (l, le) =>
          when(total <= maxLen, l)
            .otherwise(when(l > target, target + le).otherwise(l))
        }
    }
  }
}

/** Budgeted truncation over NESTED (list-of-list) fields: budget on the
  * FLATTENED length, then rebuild the nesting with each sublist clamped
  * to what remains of the cut (trailing sublists may become empty —
  * Python slice semantics of the reference's reconstruct_from_indices,
  * utils/shape_utils.py:93-118). Ref: prompting.py:313-335. */
final case class TruncateMultipleNestedFields(
    fieldsToTruncate: Seq[String],
    fieldsToPreserve: Seq[String] = Nil,
    maxLength: Int,
    lengthPenalty: Int = 0,
    strategy: String = "longest"
) extends Mapper {
  require(fieldsToTruncate.nonEmpty, "fieldsToTruncate must be non-empty")
  require(Set("longest", "uniform").contains(strategy),
    s"strategy must be 'longest' or 'uniform', not $strategy")
  private val truncSorted = fieldsToTruncate.distinct.sorted
  private val presSorted = fieldsToPreserve.distinct.sorted
  override def inputFields: Seq[String] = truncSorted ++ presSorted
  override def outputFields: Seq[String] = truncSorted ++ presSorted

  private def flatLen(df: DataFrame, f: String): Column =
    df.schema(f).dataType match {
      case ArrayType(ArrayType(_, _), _) =>
        aggregate(col(f), lit(0L), (acc, s) => acc + size(s))
      case _: ArrayType => size(col(f)).cast(LongType)
      case StringType   => length(col(f)).cast(LongType)
      case other =>
        throw new IllegalArgumentException(
          s"TruncateMultipleNestedFields: $f has unsupported type $other")
    }

  override protected def build(df: DataFrame): DataFrame = {
    val lens = truncSorted.map(f => flatLen(df, f))
    val totalPreserved =
      presSorted.map(f => flatLen(df, f)).reduceOption(_ + _).getOrElse(lit(0L))
    val maxLen = lit((maxLength - lengthPenalty).toLong) - totalPreserved
    val newLens = TruncateMultipleFields.truncatedLens(lens, maxLen, strategy)
    val newLen: Map[String, Column] = truncSorted.zip(newLens).toMap
    val outCols = df.columns.toSeq.map { c =>
      if (newLen.contains(c)) {
        val budget = greatest(newLen(c), lit(0L))
        df.schema(c).dataType match {
          case ArrayType(ArrayType(_, _), _) =>
            // sublist j keeps clamp(budget - start_j, 0, len_j) items,
            // where start_j = flattened offset of sublist j
            transform(
              col(c),
              (s, j) => {
                val startJ = aggregate(
                  slice(col(c), lit(1), j),
                  lit(0L),
                  (acc, x) => acc + size(x)
                )
                val keep =
                  greatest(lit(0L), least(budget - startJ, size(s).cast(LongType)))
                slice(s, lit(1), keep.cast(IntegerType))
              }
            ).as(c)
          case _: ArrayType =>
            slice(col(c), lit(1), budget.cast(IntegerType)).as(c)
          case _ => col(c).substr(lit(1), budget.cast(IntegerType)).as(c)
        }
      } else col(c)
    }
    df.select(outCols: _*)
  }
}

/** data[k][:v] per field→length map. Ref: tokenize.py:334-342. */
final case class TruncateSingleField(fieldsToTruncate: Map[String, Int])
    extends Mapper {
  override def inputFields: Seq[String] = fieldsToTruncate.keys.toSeq
  override def outputFields: Seq[String] = fieldsToTruncate.keys.toSeq
  override protected def build(df: DataFrame): DataFrame =
    fieldsToTruncate.foldLeft(df) { case (acc, (f, n)) =>
      acc.schema(f).dataType match {
        case _: ArrayType => acc.withColumn(f, slice(col(f), 1, n))
        case StringType   => acc.withColumn(f, substring(col(f), 1, n))
        case other =>
          throw new IllegalArgumentException(
            s"TruncateSingleField: $f has unsupported type $other"
          )
      }
    }
}

/** Budgeted multi-field truncation to a joint `maxLength` (minus preserved
  * fields' lengths, minus `lengthPenalty`).
  * Ref: prompting.py:151-310. Strategies:
  *   - "uniform": all sequences cut by the same proportion
  *     (floor(len * maxLen/total), prompting.py:217-232);
  *   - "longest": cut longest first, redistributing the budget
  *     (prompting.py:234-275).
  * Pure Column arithmetic — the field count is static, so the formulas
  * unroll at plan time; fields are processed in sorted order like the
  * reference (prompting.py:208-209).
  */
final case class TruncateMultipleFields(
    fieldsToTruncate: Seq[String],
    fieldsToPreserve: Seq[String] = Nil,
    maxLength: Int,
    lengthPenalty: Int = 0,
    strategy: String = "longest"
) extends Mapper {
  require(fieldsToTruncate.nonEmpty, "fieldsToTruncate must be non-empty")
  require(Set("longest", "uniform").contains(strategy),
    s"strategy must be 'longest' or 'uniform', not $strategy")
  private val truncSorted = fieldsToTruncate.distinct.sorted
  private val presSorted = fieldsToPreserve.distinct.sorted
  override def inputFields: Seq[String] = truncSorted ++ presSorted
  override def outputFields: Seq[String] = truncSorted ++ presSorted

  private def fieldLen(df: DataFrame, f: String): Column =
    df.schema(f).dataType match {
      case _: ArrayType => size(col(f)).cast(LongType)
      case StringType   => length(col(f)).cast(LongType)
      case other =>
        throw new IllegalArgumentException(
          s"TruncateMultipleFields: $f has unsupported type $other")
    }

  override protected def build(df: DataFrame): DataFrame = {
    val lens = truncSorted.map(f => fieldLen(df, f))
    val totalPreserved =
      presSorted.map(f => fieldLen(df, f)).reduceOption(_ + _).getOrElse(lit(0L))
    val maxLen = lit((maxLength - lengthPenalty).toLong) - totalPreserved
    val total = lens.reduce(_ + _)

    val truncatedLens: Seq[Column] =
      TruncateMultipleFields.truncatedLens(lens, maxLen, strategy)
    // single select: every truncated length references the ORIGINAL
    // columns (sequential withColumn would see already-truncated peers)
    val newLen: Map[String, Column] =
      truncSorted.zip(truncatedLens).toMap
    val outCols = df.columns.toSeq.map { c =>
      if (newLen.contains(c)) {
        val tl = greatest(newLen(c), lit(0L)).cast(IntegerType)
        df.schema(c).dataType match {
          case _: ArrayType => slice(col(c), lit(1), tl).as(c)
          case _            => col(c).substr(lit(1), tl).as(c)
        }
      } else col(c)
    }
    df.select(outCols: _*)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Conversation-format validation and statistics for chat training
  * data — the intake gate every SFT/RLHF pipeline runs before a
  * conversation trains anything. A conversation is an
  * `array<struct<role:string, content:string>>`; the validity contract
  * (the common chat-template requirement) is:
  *
  *   1. at most one system turn, and only at position 0;
  *   2. the rest strictly alternates user/assistant, starting user;
  *   3. the final turn is an assistant turn (implied by 2 + an even
  *      non-system turn count — both emitted separately so a release
  *      report can say WHICH rule failed);
  *   4. no empty/null content anywhere.
  *
  * Everything is row-local HOFs over the turn array: zero shuffle,
  * scan-stage, one projection for all flags and counts.
  */
object ChatOps {

  private def seq1to(c: Column): Column =
    filter(sequence(lit(1), greatest(c, lit(1))), x => x <= c)

  /** Appends per-conversation stats + validity flags. */
  def annotate(df: DataFrame, convField: String): DataFrame = {
    val conv = col(convField)
    val n = size(conv).cast(LongType)
    val hasSystem = n >= 1L &&
      element_at(conv, 1).getField("role") === "system"
    val off = when(hasSystem, lit(1L)).otherwise(lit(0L))
    val bodyN = n - off
    val roleCount = (r: String) =>
      size(filter(conv, t => t.getField("role") === r)).cast(LongType)
    val charSum = (r: String) =>
      aggregate(
        filter(conv, t => t.getField("role") === r),
        lit(0L),
        (acc, t) => acc + length(coalesce(t.getField("content"), lit("")))
          .cast(LongType))
    val alternates = forall(seq1to(bodyN), k =>
      element_at(conv, (k + off).cast("int")).getField("role") ===
        when(k % 2 === 1, "user").otherwise("assistant"))
    val noEmpty = forall(conv,
      t => length(coalesce(t.getField("content"), lit(""))) > 0)
    val noStraySystem = forall(seq1to(bodyN), k =>
      element_at(conv, (k + off).cast("int")).getField("role") =!= "system")
    df.withColumn("n_turns", n)
      .withColumn("has_system", hasSystem)
      .withColumn("n_user", roleCount("user"))
      .withColumn("n_assistant", roleCount("assistant"))
      .withColumn("chars_user", charSum("user"))
      .withColumn("chars_assistant", charSum("assistant"))
      .withColumn("alternates", alternates && noStraySystem)
      .withColumn("ends_assistant",
        bodyN >= 2L && bodyN % 2 === 0L &&
          element_at(conv, n.cast("int")).getField("role") === "assistant")
      .withColumn("no_empty", noEmpty)
      .withColumn("chat_valid",
        col("alternates") && col("ends_assistant") && col("no_empty"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

/** Privacy-governance release gates — the checks a dataset has to pass
  * before it ships to anyone outside the curation team.
  *
  * k-anonymity (Sweeney 2002): every combination of quasi-identifier
  * values must describe at least k rows, else those rows are
  * re-identifiable by linking the QI tuple to an external table.
  * l-diversity (Machanavelli et al. 2007) strengthens it: each QI
  * equivalence class must also contain at least l DISTINCT values of
  * the sensitive attribute, else membership in the class leaks the
  * sensitive value even when the class is large.
  *
  * Scale shape: ONE hash-partitioned groupBy over the QI columns with
  * map-side combine (count + distinct-sensitive per class); output is
  * O(#equivalence classes), never the data. `suppress` joins the
  * violating classes back as a broadcast (the violator list is small by
  * construction when k is small) and nulls the QI columns — the
  * standard suppression remedy, shuffle-free on the data side.
  */
object PrivacyAudit {

  /** Per-equivalence-class audit: QI columns + `class_n` (rows in the
    * class), `sensitive_l` (distinct sensitive values), `k_ok`,
    * `l_ok`. A release gate passes when every row has both flags. */
  def audit(
      df: DataFrame,
      quasiIdentifiers: Seq[String],
      sensitiveField: String,
      k: Int,
      l: Int
  ): DataFrame = {
    require(quasiIdentifiers.nonEmpty, "need at least one quasi-identifier")
    require(k >= 1 && l >= 1, s"k and l must be >= 1, got k=$k l=$l")
    df.groupBy(quasiIdentifiers.map(col): _*)
      .agg(
        count(lit(1)).as("class_n"),
        count_distinct(col(sensitiveField)).as("sensitive_l"))
      .withColumn("k_ok", col("class_n") >= k)
      .withColumn("l_ok", col("sensitive_l") >= l)
  }

  /** One-row gate summary: #classes, #violating classes, #rows in
    * violating classes — the number the release checklist records. */
  def gate(
      df: DataFrame,
      quasiIdentifiers: Seq[String],
      sensitiveField: String,
      k: Int,
      l: Int
  ): DataFrame =
    audit(df, quasiIdentifiers, sensitiveField, k, l)
      .agg(
        count(lit(1)).as("n_classes"),
        sum(when(!col("k_ok") || !col("l_ok"), 1L).otherwise(0L))
          .as("n_bad_classes"),
        sum(when(!col("k_ok") || !col("l_ok"), col("class_n"))
          .otherwise(0L)).cast(LongType).as("n_bad_rows"))

  /** Suppression remedy: null out the QI columns of every row whose
    * equivalence class violates k-anonymity or l-diversity. The
    * violator-class list is broadcast (small when the gate is close to
    * passing); the data itself never shuffles. */
  def suppress(
      df: DataFrame,
      quasiIdentifiers: Seq[String],
      sensitiveField: String,
      k: Int,
      l: Int
  ): DataFrame = {
    val bad = audit(df, quasiIdentifiers, sensitiveField, k, l)
      .filter(!col("k_ok") || !col("l_ok"))
      .select(quasiIdentifiers.map(c => col(c).as(s"__pa_$c")): _*)
      .withColumn("__pa_bad", lit(true))
    val joinCond = quasiIdentifiers
      .map(c => col(c) <=> col(s"__pa_$c"))
      .reduce(_ && _)
    val joined = df.join(broadcast(bad), joinCond, "left")
    val suppressed = quasiIdentifiers.foldLeft(joined) { (d, c) =>
      d.withColumn(c,
        when(coalesce(col("__pa_bad"), lit(false)), lit(null))
          .otherwise(col(c)))
    }
    suppressed.drop(bad.columns.filter(_.startsWith("__pa_")): _*)
  }
}

/** Mapper wrapper: suppress QI columns of k/l-violating rows. */
case class SuppressQuasiIdentifiers(
    quasiIdentifiers: Seq[String],
    sensitiveField: String,
    k: Int,
    l: Int = 1
) extends graft.Mapper {
  override def inputFields: Seq[String] = quasiIdentifiers :+ sensitiveField
  override protected def build(df: DataFrame): DataFrame =
    PrivacyAudit.suppress(df, quasiIdentifiers, sensitiveField, k, l)
}

/** Small-file compaction planning — the 100-TB table-maintenance chore:
  * a partitioned corpus accumulates thousands of undersized files per
  * partition (streaming micro-batches, per-executor writes), and read
  * throughput collapses under per-file open cost. The fix is periodic
  * compaction: group each partition's files into target-size bins and
  * rewrite one file per bin.
  *
  * This operator emits the PLAN (which files merge into which bin),
  * reusing the same native [[graft.functions.GreedyPackBreaks]] greedy
  * scan as sequence packing: files ordered by name, a new bin whenever
  * the running byte total would exceed `targetBytes` (or `maxFiles`
  * accumulate). Deterministic: same manifest → same plan, so a
  * re-run resumes instead of re-shuffling files between bins.
  *
  * Scale shape: ONE groupBy(partition) collecting (file, size) pairs —
  * the manifest is O(#files), tiny next to the data — then a row-local
  * greedy scan and a posexplode to O(#bins) rows. The data files
  * themselves are never read. */
object CompactionPlan {

  /** Per-bin plan rows: (groupField, bin, n_files, bin_bytes).
    * Bins are numbered 0.. within each group, in file-name order. */
  def plan(
      manifest: DataFrame,
      groupField: String,
      fileField: String,
      sizeField: String,
      targetBytes: Long,
      maxFiles: Int = 1 << 20
  ): DataFrame = {
    require(targetBytes > 0 && maxFiles > 0)
    val packed = manifest
      .groupBy(col(groupField))
      .agg(sort_array(collect_list(struct(
        col(fileField).as("f"), col(sizeField).cast(LongType).as("sz"))))
        .as("__cp_fs"))
      .withColumn("__cp_szs", transform(col("__cp_fs"), f => f("sz")))
      .withColumn("__cp_starts",
        graft.functions.functions.greedy_pack_breaks(
          col("__cp_szs"), lit(maxFiles.toLong), lit(targetBytes)))
    packed
      .select(col(groupField), col("__cp_szs"), col("__cp_fs"),
        col("__cp_starts"),
        posexplode(col("__cp_starts")).as(Seq("bin", "__cp_s")))
      .withColumn("__cp_e",
        coalesce(element_at(col("__cp_starts"), col("bin") + 2),
          size(col("__cp_szs")).cast(LongType)))
      .select(
        col(groupField),
        col("bin").cast(LongType).as("bin"),
        (col("__cp_e") - col("__cp_s")).as("n_files"),
        aggregate(
          slice(col("__cp_szs"), col("__cp_s").cast("int") + 1,
            (col("__cp_e") - col("__cp_s")).cast("int")),
          lit(0L), (acc, x) => acc + x).as("bin_bytes"),
        transform(
          slice(col("__cp_fs"), col("__cp_s").cast("int") + 1,
            (col("__cp_e") - col("__cp_s")).cast("int")),
          f => f("f")).as("files"))
  }
}

/** License detection over document text — the provenance gate a
  * training-data release needs: pages carrying an explicit license
  * marker route to the matching policy bucket (CC-family kept,
  * "all rights reserved" quarantined, code-license text routed to the
  * code pipeline), pages with NO marker fall to the corpus default.
  * Detection is marker-phrase scanning (the C4/ROOTS practice), NOT
  * legal inference: `license_tags` lists every family whose marker
  * appears (sorted, deduplicated), `license_primary` resolves multiple
  * hits by a fixed permissiveness priority (cc0 > cc-by > cc-by-sa >
  * cc-by-nc > mit > apache-2.0 > gpl > all-rights-reserved), and
  * `license_restricted` gates the quarantine set (nc / gpl /
  * all-rights-reserved).
  *
  * Shape: a handful of literal `contains` probes on the lowercased
  * text — one codegen'd row-local projection in the scan stage, zero
  * shuffle, free at any corpus size. */
object LicenseTag {

  /** (family, marker phrases) — matched on lowercased text. A marker
    * prefixed `re:` is a regex (`rlike`) instead of a substring probe:
    * the gpl version markers need a non-`l` left boundary so that
    * `lgpl-2.0`/`lgpl-3.0` identifiers don't substring-match into the
    * gpl family (weak-copyleft LGPL pages must NOT be routed to the
    * restricted quarantine). */
  val families: Seq[(String, Seq[String])] = Seq(
    "cc0" -> Seq("creativecommons.org/publicdomain/zero", "cc0 1.0",
      "no rights reserved"),
    "cc-by" -> Seq("creativecommons.org/licenses/by/", "cc by 4.0",
      "cc-by 4.0", "cc by 3.0"),
    "cc-by-sa" -> Seq("creativecommons.org/licenses/by-sa", "cc by-sa",
      "cc-by-sa"),
    "cc-by-nc" -> Seq("creativecommons.org/licenses/by-nc", "cc by-nc",
      "cc-by-nc"),
    "mit" -> Seq("mit license", "permission is hereby granted, free of charge"),
    "apache-2.0" -> Seq("apache license, version 2.0", "apache-2.0",
      "licensed under the apache license"),
    "lgpl" -> Seq("gnu lesser general public license", "lgpl"),
    "gpl" -> Seq("gnu general public license", "re:(^|[^l])gpl-[23]\\.0",
      "gnu gpl"),
    "all-rights-reserved" -> Seq("all rights reserved")
  )

  /** Priority order for `license_primary` (most permissive first). */
  val priority: Seq[String] = Seq("cc0", "cc-by", "cc-by-sa", "cc-by-nc",
    "mit", "apache-2.0", "lgpl", "gpl", "all-rights-reserved")

  private val restricted = Set("cc-by-nc", "gpl", "all-rights-reserved")

  def annotate(df: DataFrame, textField: String): DataFrame = {
    val t = lower(col(textField))
    val tagHit: Seq[(String, Column)] = families.map { case (tag, ms) =>
      tag -> ms.map(m =>
        if (m.startsWith("re:")) t.rlike(m.stripPrefix("re:"))
        else t.contains(m)).reduce(_ || _)
    }
    val tags = array_sort(filter(
      array(tagHit.map { case (tag, hit) =>
        when(hit, lit(tag)).otherwise(lit(null).cast(StringType))
      }: _*),
      x => x.isNotNull))
    val primary = priority.foldRight(lit(null).cast(StringType)) {
      case (tag, rest) => when(array_contains(tags, tag), lit(tag))
        .otherwise(rest)
    }
    df.withColumn("license_tags", tags)
      .withColumn("license_primary", coalesce(primary, lit("unmarked")))
      .withColumn("license_restricted",
        arrays_overlap(col("license_tags"),
          array(restricted.toSeq.sorted.map(lit): _*)))
  }
}

package graft.operators

import graft.Mapper
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source/loader mappers.
  * Ref: /root/reference/src/smashed/mappers/loaders.py.
  *
  * The reference's loaders are batched mappers whose input ROWS are
  * dataset specs (paths); the output rows are the loaded data. Spark's
  * natural shape is `spark.read.*` — these wrappers keep the
  * "rows carry paths" contract for parity, collecting the (tiny) spec
  * rows on the driver and issuing ONE distributed read over all paths
  * (Hadoop FS handles s3a://, gzip, globs natively — the reference's
  * MultiPath/boto3/zlib plumbing disappears, SURVEY §2.1).
  */

/** Rows carry path(s) in `pathsField`; emits the union of all CSVs.
  * Ref: loaders.py:139-168. */
final case class CsvLoader(
    pathsField: String,
    sep: String = ",",
    header: Boolean = true,
    encoding: String = "UTF-8"
) extends Mapper {
  override def inputFields: Seq[String] = Seq(pathsField)
  override protected def build(df: DataFrame): DataFrame = {
    val paths = collectPaths(df, pathsField)
    df.sparkSession.read
      .option("sep", sep)
      .option("header", header.toString)
      .option("encoding", encoding)
      .csv(paths: _*)
  }
}

/** Rows carry path(s); emits the union of all JSONL files.
  * Ref: loaders.py:171-192. */
final case class JsonlLoader(pathsField: String) extends Mapper {
  override def inputFields: Seq[String] = Seq(pathsField)
  override protected def build(df: DataFrame): DataFrame = {
    val paths = collectPaths(df, pathsField)
    df.sparkSession.read.json(paths: _*)
  }
}

/** Full analog of HuggingFaceDatasetLoaderMapper (loaders.py:37-136):
  * each input ROW is a dataset spec (format + path(s)); every spec is
  * loaded with the matching `spark.read` source and the results are
  * combined by `combineStrategy` ("concatenate" | "interleave").
  * Spec rows are tiny by contract; the reads they trigger are fully
  * distributed. */
final case class DatasetLoader(
    pathsField: String,
    formatField: Option[String] = None,
    defaultFormat: String = "parquet",
    combineStrategy: String = "concatenate",
    fieldsToKeep: Option[Seq[String]] = None
) extends Mapper {
  require(
    Set("concatenate", "interleave").contains(combineStrategy),
    s"combineStrategy must be concatenate|interleave, not $combineStrategy"
  )
  override def inputFields: Seq[String] = Seq(pathsField) ++ formatField
  override protected def build(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val specs: Seq[(String, String)] = df
      .select(
        org.apache.spark.sql.functions.col(pathsField).cast("string"),
        formatField
          .map(f => org.apache.spark.sql.functions.col(f).cast("string"))
          .getOrElse(org.apache.spark.sql.functions.lit(defaultFormat))
      )
      .collect() // spec rows only
      .map(r => (r.getString(0), r.getString(1)))
      .toSeq
    val loaded = specs.map {
      case (path, "csv")              => spark.read.option("header", "true").csv(path)
      case (path, "json" | "jsonl")   => spark.read.json(path)
      case (path, "parquet")          => spark.read.parquet(path)
      case (_, other) =>
        throw new IllegalArgumentException(s"Unsupported format: $other")
    }
    val kept = fieldsToKeep match {
      case Some(fs) => loaded.map(_.select(fs.map(org.apache.spark.sql.functions.col): _*))
      case None     => loaded
    }
    if (combineStrategy == "concatenate") CombineSources.concatenate(kept)
    else CombineSources.interleave(kept)
  }
}

/** Combine N already-loaded datasets like HuggingFaceDatasetLoaderMapper's
  * combine step (loaders.py:37-136):
  *   - "concatenate": all rows of ds1, then ds2, … (`unionByName`);
  *   - "interleave": round-robin by per-source row number — expressed as a
  *     sort on (rn, sourceIdx), which range-partitions and scales.
  */
object CombineSources {
  def concatenate(dfs: Seq[DataFrame]): DataFrame =
    dfs.reduce((a, b) => a.unionByName(b, allowMissingColumns = true))

  def interleave(dfs: Seq[DataFrame]): DataFrame = {
    val tagged = dfs.zipWithIndex.map { case (d, i) =>
      val schema = org.apache.spark.sql.types.StructType(
        d.schema.fields ++ Seq(
          org.apache.spark.sql.types.StructField("__graft_src",
            org.apache.spark.sql.types.IntegerType),
          org.apache.spark.sql.types.StructField("__graft_rn",
            org.apache.spark.sql.types.LongType)
        )
      )
      // per-source row numbers via zipWithIndex — distributed, no
      // single-partition window funnel
      d.sparkSession.createDataFrame(
        d.rdd.zipWithIndex().map { case (r, rn) =>
          // note: Seq(i, rn) would unify Int to Long and break encoding
          org.apache.spark.sql.Row.fromSeq((r.toSeq :+ i) :+ rn)
        },
        schema
      )
    }
    tagged
      .reduce((a, b) => a.unionByName(b, allowMissingColumns = true))
      .orderBy("__graft_rn", "__graft_src")
      .drop("__graft_src", "__graft_rn")
  }
}

private[operators] object collectPaths {
  def apply(df: DataFrame, pathsField: String): Seq[String] =
    df.select(pathsField)
      .collect() // spec rows: tiny by contract (paths, not data)
      .flatMap { r =>
        r.get(0) match {
          case s: String                  => Seq(s)
          case xs: scala.collection.Seq[_] => xs.map(String.valueOf)
          case other                      => Seq(String.valueOf(other))
        }
      }
      .toSeq
}

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
        d.rdd.zipWithIndex.map { case (r, rn) =>
          org.apache.spark.sql.Row.fromSeq(r.toSeq ++ Seq(i, rn))
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

package graft

import org.apache.spark.sql.DataFrame
import java.security.MessageDigest

/** Base transform abstraction.
  *
  * Mirrors the mapper contract of the reference library
  * (/root/reference/src/smashed/base/mappers.py:20-24): a transform with
  * declared `inputFields`/`outputFields`, a stable `fingerprint`, and
  * composition via `>>` / `<<`.
  *
  * Differences by design (see SURVEY.md §7.1):
  *   - a Mapper is a pure `DataFrame => DataFrame`; the composed pipeline
  *     lowers onto ONE Catalyst logical plan (no per-stage materialization
  *     like the reference's list interface,
  *     /root/reference/src/smashed/base/interfaces.py:214-228);
  *   - field presence is validated against `df.schema` at plan-build time,
  *     not per-row (reference checks the first sample's keys at runtime,
  *     /root/reference/src/smashed/base/interfaces.py:67-94);
  *   - pipelines are immutable `Vector[Mapper]`, avoiding the reference's
  *     in-place linked-list mutation sharp edge
  *     (/root/reference/src/smashed/base/mappers.py:58-86).
  */
trait Mapper extends Serializable {

  /** Top-level column names this mapper reads (dotted paths allowed;
    * only the head segment is checked against the schema). */
  def inputFields: Seq[String] = Nil

  /** Column names this mapper writes. */
  def outputFields: Seq[String] = Nil

  /** The actual transform; implementations may assume inputs exist. */
  protected def build(df: DataFrame): DataFrame

  /** Apply with a schema pre-flight (names checked at plan time). */
  final def apply(df: DataFrame): DataFrame = {
    val have = df.columns.toSet
    val missing = inputFields.map(_.takeWhile(_ != '.')).filterNot(have)
    require(
      missing.isEmpty,
      s"$name: input field(s) ${missing.mkString(", ")} not in schema " +
        s"[${df.columns.mkString(", ")}]"
    )
    build(df)
  }

  def name: String = {
    val n = getClass.getSimpleName
    if (n.endsWith("$")) n.dropRight(1) else n
  }

  /** SHA-256 of (class name, ctor params) — stable cache key, mirroring
    * the reference's ctor-args fingerprint
    * (/root/reference/src/smashed/base/mappers.py:179-238) but computed
    * from explicit Product params, not stack inspection. */
  final def fingerprint: String = {
    val repr = this match {
      case p: Product => p.productIterator.map(Fingerprint.repr).mkString("|")
      case _          => ""
    }
    Fingerprint.sha256(getClass.getName + ":" + repr)
  }

  /** `a >> b`: run `a` then `b` (reference
    * /root/reference/src/smashed/base/pipeline.py:8-15). */
  final def >>(next: Mapper): Pipeline = Pipeline(this.stages ++ next.stages)

  /** `a << b`: run `b` then `a`. */
  final def <<(prev: Mapper): Pipeline = Pipeline(prev.stages ++ this.stages)

  private[graft] def stages: Vector[Mapper] = Vector(this)
}

/** An immutable chain of mappers; itself a Mapper. */
final case class Pipeline(override val stages: Vector[Mapper]) extends Mapper {
  override def inputFields: Seq[String] =
    stages.headOption.map(_.inputFields).getOrElse(Nil)
  override def outputFields: Seq[String] =
    stages.lastOption.map(_.outputFields).getOrElse(Nil)
  override protected def build(df: DataFrame): DataFrame =
    stages.foldLeft(df)((acc, m) => m(acc))
  override def name: String =
    stages.map(_.name).mkString("Pipeline(", " >> ", ")")
}

object Pipeline {
  def apply(mappers: Mapper*)(implicit d: DummyImplicit): Pipeline =
    Pipeline(mappers.flatMap(_.stages).toVector)
  val empty: Pipeline = Pipeline(Vector.empty[Mapper])
}

object Fingerprint {
  def sha256(s: String): String =
    MessageDigest
      .getInstance("SHA-256")
      .digest(s.getBytes("UTF-8"))
      .map("%02x".format(_))
      .mkString

  def repr(x: Any): String = x match {
    case m: scala.collection.Map[_, _] =>
      m.toSeq
        .map { case (k, v) => s"${repr(k)}->${repr(v)}" }
        .sorted
        .mkString("{", ",", "}")
    case s: Iterable[_] => s.map(repr).mkString("[", ",", "]")
    case p: Product if p.productArity > 0 =>
      p.productIterator.map(repr).mkString(p.productPrefix + "(", ",", ")")
    case other => String.valueOf(other)
  }
}

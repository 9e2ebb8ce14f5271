package graft.operators

import graft.Mapper
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Row filter with the reference's 21-operator table and recursive-ALL
  * semantics over nested containers.
  * Ref: /root/reference/src/smashed/mappers/filters.py:12-86 — the
  * predicate is applied at the leaves of list/dict values and folded with
  * `all()`; arithmetic operators pass when the result is truthy (≠ 0).
  * Compiles to a native `df.filter` (pushdown-eligible for scalar fields);
  * arrays use `forall`, structs fold over their fields.
  */
final case class Filter(fieldName: String, operator: String, value: Any)
    extends Mapper {
  import Filter.ValidOps
  require(
    ValidOps.contains(operator),
    s"Invalid operator $operator. Valid: ${ValidOps.mkString(", ")}"
  )
  override def inputFields: Seq[String] = Seq(fieldName)
  override def outputFields: Seq[String] = Seq(fieldName)

  private def leaf(c: Column): Column = {
    val v = lit(value)
    operator match {
      case "=="     => c === v
      case "!="     => c =!= v
      case "<"      => c < v
      case "<="     => c <= v
      case ">"      => c > v
      case ">="     => c >= v
      case "is"     => c <=> v
      case "is not" => !(c <=> v)
      // reference: operator.contains(field_value, value) — i.e. the FIELD
      // is the container: for string leaves this is substring containment
      case "in"     => c.contains(v)
      case "not in" => !c.contains(v)
      // arithmetic / bitwise: any truthy (non-zero) result passes
      case "+"  => (c + v) =!= lit(0)
      case "-"  => (c - v) =!= lit(0)
      case "*"  => (c * v) =!= lit(0)
      case "/"  => (c / v) =!= lit(0)
      case "%"  => (c % v) =!= lit(0)
      case "**" => pow(c, v) =!= lit(0)
      case "^"  => c.bitwiseXOR(v) =!= lit(0)
      case "&"  => c.bitwiseAND(v) =!= lit(0)
      case "|"  => c.bitwiseOR(v) =!= lit(0)
      case "<<" => shiftleft(c, value.asInstanceOf[Number].intValue) =!= lit(0)
      case ">>" => shiftright(c, value.asInstanceOf[Number].intValue) =!= lit(0)
    }
  }

  /** Recursive-ALL fold (filters.py:71-78): arrays → forall (true on
    * empty, like Python's all([])), structs → conjunction of fields. */
  private def pred(c: Column, dt: DataType): Column = dt match {
    case ArrayType(e, _) => forall(c, x => pred(x, e))
    case StructType(fs) =>
      fs.map(f => pred(c.getField(f.name), f.dataType))
        .reduceOption(_ && _)
        .getOrElse(lit(true))
    case _ => leaf(c)
  }

  override protected def build(df: DataFrame): DataFrame =
    df.filter(pred(col(fieldName), df.schema(fieldName).dataType))
}

object Filter {
  val ValidOps: Set[String] = Set(
    "+", "-", "*", "/", "%", "^", "**", "<<", ">>", "&", "|",
    "==", "!=", "<", "<=", ">", ">=", "is", "is not", "in", "not in"
  )
}

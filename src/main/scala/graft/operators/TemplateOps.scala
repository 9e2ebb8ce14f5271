package graft.operators

import graft.Mapper
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Mini-Jinja template engine + Jinja mappers.
  * Ref: /root/reference/src/smashed/mappers/promptsource.py:45-354.
  *
  * The supported subset (SURVEY §7.3 / M4): `{{ var }}` substitution with
  * dotted paths, Python-style index/slice accessors (`xs[0]`, `xs[-1]`,
  * `s[1:5]`, `xs[:3]`) and filters (length, lower, upper, trim,
  * capitalize, first, last, join("sep"), replace(a, b), default(d[,
  * falsy]), truncate(n[, killwords[, end[, leeway]]]), int, string,
  * title, wordcount, abs, round([prec]), min, max, sum, sort — the
  * promptsource-community set), `~` string concatenation, `in`/`not in`
  * membership tests, `{% for x in xs %}…{% endfor %}`,
  * `{% if cond %}…{% elif %}…{% else %}…{% endif %}` with comparisons
  * (`== != < <= > >=`) and truthiness, and the reference's `|||`
  * source/target split (promptsource.py:185-196). Unsupported constructs
  * raise at parse time (on the driver) with a clear message.
  *
  * Templates parse ONCE on the driver into an AST; rows render inside
  * `mapPartitions` — the same boundary the tokenizer uses.
  */
object MiniJinja {

  sealed trait Node
  final case class Text(s: String) extends Node
  final case class Output(e: Expr) extends Node
  final case class For(v: String, seq: Expr, body: List[Node]) extends Node
  final case class If(branches: List[(Option[Expr], List[Node])]) extends Node
  /** `{% set name = expr %}` — binds for the remainder of the enclosing
    * block (Jinja2 block scoping: a set inside for/if doesn't leak out). */
  final case class SetVar(name: String, e: Expr) extends Node

  sealed trait Expr
  final case class Ref(path: List[String]) extends Expr
  final case class Lit(v: Any) extends Expr
  final case class Filtered(e: Expr, filter: String, args: List[Any]) extends Expr
  final case class Cmp(op: String, l: Expr, r: Expr) extends Expr
  /** `not expr` — Jinja2 boolean negation (binds tighter than and/or,
    * looser than comparisons: `not a == b` is `not (a == b)`). */
  final case class Not(e: Expr) extends Expr
  /** `xs[2]` / `xs[-1]` — Python-style index (negative wraps). */
  final case class Index(e: Expr, i: Expr) extends Expr
  /** `xs[1:3]` / `s[:5]` — Python-style slice with clamping. */
  final case class Slice(e: Expr, from: Option[Expr], to: Option[Expr]) extends Expr

  final case class Template(nodes: List[Node]) extends Serializable {
    /** Variable names referenced at the top level (the reference infers
      * input fields the same way, promptsource.py:125-153). */
    def variables: Set[String] = {
      def exprVars(e: Expr): Set[String] = e match {
        case Ref(p)            => Set(p.head)
        case Filtered(e, _, _) => exprVars(e)
        case Cmp(_, l, r)      => exprVars(l) ++ exprVars(r)
        case Not(e)            => exprVars(e)
        case Index(e, i)       => exprVars(e) ++ exprVars(i)
        case Slice(e, f, t) =>
          exprVars(e) ++ f.toSet.flatMap(exprVars) ++ t.toSet.flatMap(exprVars)
        case _ => Set.empty
      }
      def walk(ns: List[Node], bound0: Set[String]): Set[String] = {
        var bound = bound0
        val out = scala.collection.mutable.Set.empty[String]
        ns.foreach {
          case Text(_)   => ()
          case Output(e) => out ++= (exprVars(e) -- bound)
          case For(v, seq, body) =>
            out ++= (exprVars(seq) -- bound)
            out ++= walk(body, bound + v)
          case If(bs) =>
            bs.foreach { case (c, b) =>
              out ++= (c.map(exprVars).getOrElse(Set.empty) -- bound)
              out ++= walk(b, bound)
            }
          case SetVar(n, e) =>
            out ++= (exprVars(e) -- bound)
            bound = bound + n // bound for the REST of this block
        }
        out.toSet
      }
      walk(nodes, Set.empty)
    }

    def render(vars: Map[String, Any]): String = {
      val sb = new StringBuilder
      renderInto(nodes, vars, sb)
      sb.result()
    }

    private def renderInto(
        ns: List[Node],
        vars: Map[String, Any],
        sb: StringBuilder
    ): Unit = {
      var env = vars // SetVar rebinds for the rest of this block only
      ns.foreach {
        case Text(s)   => sb.append(s)
        case Output(e) => sb.append(show(eval(e, env)))
        case SetVar(n, e) => env = env + (n -> eval(e, env))
        case For(v, seqE, body) =>
          eval(seqE, env) match {
            case s: Seq[_] =>
              val n = s.size
              s.zipWithIndex.foreach { case (x, i) =>
                // Jinja2 `loop` variable: index (1-based), index0,
                // revindex, first, last, length
                val loopVar: Map[String, Any] = Map(
                  "index" -> (i + 1).toLong,
                  "index0" -> i.toLong,
                  "revindex" -> (n - i).toLong,
                  "revindex0" -> (n - i - 1).toLong,
                  "first" -> (i == 0),
                  "last" -> (i == n - 1),
                  "length" -> n.toLong
                )
                renderInto(body, env + (v -> x) + ("loop" -> loopVar), sb)
              }
            case null => ()
            case other =>
              throw new IllegalArgumentException(
                s"for-loop over non-sequence value: $other"
              )
          }
        case If(branches) =>
          branches
            .find { case (cond, _) => cond.forall(c => truthy(eval(c, env))) }
            .foreach { case (_, body) => renderInto(body, env, sb) }
      }
    }

    private def eval(e: Expr, vars: Map[String, Any]): Any = e match {
      case Lit(v) => v
      case Ref(path) =>
        var cur: Any = vars.getOrElse(path.head, null)
        path.tail.foreach { seg =>
          cur = cur match {
            case null => null
            case m: Map[_, _] =>
              m.asInstanceOf[Map[String, Any]].getOrElse(seg, null)
            case r: Row =>
              // normalize nested Spark arrays (mutable ArraySeq) to Seq so
              // downstream Index/Slice/filters match them
              try MiniJinja.toTemplateValue(r.getAs[Any](seg))
              catch { case _: Exception => null }
            case _ => null
          }
        }
        cur
      case Filtered(inner, f, args) =>
        val v = eval(inner, vars)
        (f, args) match {
          case ("length", _) =>
            v match {
              case s: Seq[_]  => s.size.toLong
              case s: String  => s.length.toLong
              case m: Map[_, _] => m.size.toLong
              case null       => 0L
              case other      => throw new IllegalArgumentException(s"length of $other")
            }
          case ("lower", _)      => String.valueOf(v).toLowerCase(java.util.Locale.ROOT)
          case ("upper", _)      => String.valueOf(v).toUpperCase(java.util.Locale.ROOT)
          case ("trim", _)       => String.valueOf(v).trim
          case ("capitalize", _) =>
            val s = String.valueOf(v)
            if (s.isEmpty) s else s"${s.head.toUpper}${s.tail.toLowerCase(java.util.Locale.ROOT)}"
          case ("first", _) => v match {
            case s: Seq[_] => s.headOption.orNull
            case s: String => if (s.isEmpty) "" else s.substring(0, 1)
            case other     => other
          }
          case ("last", _) => v match {
            case s: Seq[_] => s.lastOption.orNull
            case s: String => if (s.isEmpty) "" else s.substring(s.length - 1)
            case other     => other
          }
          case ("join", sep :: Nil) =>
            v match {
              case s: Seq[_] => s.map(show).mkString(String.valueOf(sep))
              case other     => show(other)
            }
          case ("replace", from :: to :: Nil) =>
            String.valueOf(v).replace(String.valueOf(from), String.valueOf(to))
          case ("default", d :: rest) =>
            // Jinja: default(d) replaces undefined/null; default(d, true)
            // also replaces falsy values (empty string, 0, empty list)
            val alsoFalsy = rest.headOption.contains(true)
            if (v == null || (alsoFalsy && !truthy(v))) d else v
          case ("truncate", (n: Long) :: rest) =>
            // truncate(length, killwords=false, end="...", leeway=5):
            // strings within `length + leeway` pass through; longer ones
            // cut to `length` minus the end marker, at a word boundary
            // unless killwords — Jinja2's exact contract
            val killwords = rest.headOption.contains(true)
            val end =
              rest.drop(1).headOption.map(String.valueOf(_)).getOrElse("...")
            val leeway = rest.drop(2).headOption
              .collect { case l: Long => l.toInt }.getOrElse(5)
            val s = String.valueOf(v)
            if (s.length <= n.toInt + leeway) s
            else {
              val budget = math.max(0, n.toInt - end.length)
              val cut = s.substring(0, budget)
              val trimmed =
                if (killwords) cut
                else {
                  val sp = cut.lastIndexOf(' ')
                  if (sp > 0) cut.substring(0, sp) else cut
                }
              trimmed + end
            }
          case ("int", _) =>
            // Jinja's int filter: unparseable input yields 0 (or the
            // provided default), never an error
            val dflt = args.headOption.collect { case n: Long => n }.getOrElse(0L)
            v match {
              case n: Number => n.longValue()
              case s: String =>
                val t = s.trim
                try t.toLong
                catch {
                  case _: NumberFormatException =>
                    try t.toDouble.toLong
                    catch { case _: NumberFormatException => dflt }
                }
              case b: Boolean => if (b) 1L else 0L
              case _          => dflt
            }
          case ("string", _) => show(v)
          case ("title", _) =>
            String.valueOf(v).split(" ", -1).map { w =>
              if (w.isEmpty) w
              else s"${w.head.toUpper}${w.tail.toLowerCase(java.util.Locale.ROOT)}"
            }.mkString(" ")
          case ("wordcount", _) =>
            "\\S+".r.findAllIn(String.valueOf(v)).size.toLong
          case ("abs", _) =>
            v match {
              case n: java.lang.Long    => math.abs(n.longValue())
              case n: java.lang.Integer => math.abs(n.longValue())
              case n: Number            => math.abs(n.doubleValue())
              case other => throw new IllegalArgumentException(s"abs of $other")
            }
          case ("round", rest) =>
            val prec = rest.headOption.collect { case n: Long => n.toInt }.getOrElse(0)
            val scale = math.pow(10, prec)
            math.rint(toNum(v) * scale) / scale
          case ("min" | "max" | "sum" | "sort", _) =>
            val xs = v match {
              case s: Seq[_] => s
              case other =>
                throw new IllegalArgumentException(s"$f over non-list: $other")
            }
            f match {
              case "sum" => xs.map(toNum).sum
              case "min" | "max" if xs.isEmpty => null
              case "min" | "max" =>
                val numeric = xs.forall(_.isInstanceOf[Number])
                if (numeric) {
                  val ns = xs.map(toNum)
                  if (f == "min") xs(ns.indexOf(ns.min)) else xs(ns.indexOf(ns.max))
                } else if (f == "min") xs.map(show).min
                else xs.map(show).max
              case "sort" =>
                if (xs.forall(_.isInstanceOf[Number]))
                  xs.sortBy(toNum)
                else xs.map(show).sorted
            }
          case ("split", rest) =>
            // Python str.split semantics: no arg = whitespace runs,
            // empties dropped; explicit separator = exact split, empties
            // kept
            val str = String.valueOf(v)
            rest.headOption match {
              case Some(sep) =>
                str.split(java.util.regex.Pattern.quote(String.valueOf(sep)), -1)
                  .toSeq
              case None =>
                str.trim.split("\\s+").toSeq.filter(_.nonEmpty)
            }
          case ("startswith", p :: Nil) =>
            String.valueOf(v).startsWith(String.valueOf(p))
          case ("endswith", p :: Nil) =>
            String.valueOf(v).endsWith(String.valueOf(p))
          case _ =>
            throw new IllegalArgumentException(s"Unsupported filter: $f($args)")
        }
      case Index(inner, ie) =>
        val v = eval(inner, vars)
        val key = eval(ie, vars)
        v match {
          case m: Map[_, _] => // Jinja getitem on a dict: m['key']
            m.asInstanceOf[Map[String, Any]].getOrElse(show(key), null)
          case s: Seq[_] =>
            val idx = toNum(key).toInt
            val n = s.size
            val k = if (idx < 0) idx + n else idx
            if (k >= 0 && k < n) s(k) else null
          case s: String =>
            val idx = toNum(key).toInt
            val n = s.length
            val k = if (idx < 0) idx + n else idx
            if (k >= 0 && k < n) s.substring(k, k + 1) else null
          case null  => null
          case other => throw new IllegalArgumentException(s"cannot index $other")
        }
      case Slice(inner, fromE, toE) =>
        val v = eval(inner, vars)
        def bounds(n: Int): (Int, Int) = {
          def resolve(eo: Option[Expr], dflt: Int): Int =
            eo.map { e =>
              val i = toNum(eval(e, vars)).toInt
              val k = if (i < 0) i + n else i
              math.max(0, math.min(n, k))
            }.getOrElse(dflt)
          (resolve(fromE, 0), resolve(toE, n))
        }
        v match {
          case s: Seq[_] =>
            val (a, b) = bounds(s.size)
            if (a < b) s.slice(a, b) else Seq.empty
          case s: String =>
            val (a, b) = bounds(s.length)
            if (a < b) s.substring(a, b) else ""
          case null  => null
          case other => throw new IllegalArgumentException(s"cannot slice $other")
        }
      case Not(inner) => !truthy(eval(inner, vars))
      case Cmp(op, le, re) =>
        val l = eval(le, vars)
        val r = eval(re, vars)
        def member: Boolean = r match {
          case s: Seq[_]    => s.exists(x => x == l || show(x) == show(l))
          case s: String    => s.contains(show(l))
          case m: Map[_, _] => m.asInstanceOf[Map[String, Any]].contains(show(l))
          case null         => false
          case other =>
            throw new IllegalArgumentException(s"'in' over non-container: $other")
        }
        op match {
          case "~"      => show(l) + show(r)
          case "and"    => truthy(l) && truthy(r)
          case "or"     => truthy(l) || truthy(r)
          case "in"     => member
          case "not in" => !member
          case "=="     => l == r || show(l) == show(r)
          case "!="     => !(l == r || show(l) == show(r))
          case _ =>
            val (ln, rn) = (toNum(l), toNum(r))
            op match {
              case "<"  => ln < rn
              case "<=" => ln <= rn
              case ">"  => ln > rn
              case ">=" => ln >= rn
            }
        }
    }

    private def toNum(v: Any): Double = v match {
      case n: Number => n.doubleValue()
      case s: String => s.toDouble
      case other     => throw new IllegalArgumentException(s"not a number: $other")
    }

    private def truthy(v: Any): Boolean = v match {
      case null       => false
      case b: Boolean => b
      case n: Number  => n.doubleValue() != 0
      case s: String  => s.nonEmpty
      case s: Seq[_]  => s.nonEmpty
      case _          => true
    }

    private def show(v: Any): String = v match {
      case null       => ""
      case b: Boolean => if (b) "True" else "False" // python/Jinja2 repr
      case d: Double => if (d == d.floor && !d.isInfinite) d.toLong.toString else d.toString
      case f: Float  => show(f.toDouble)
      case s: Seq[_] => s.map(show).mkString("[", ", ", "]")
      case other     => String.valueOf(other)
    }
  }

  /** Parse; throws IllegalArgumentException on unsupported constructs. */
  def parse(template: String): Template = {
    val tokenPat = "\\{\\{.*?\\}\\}|\\{%.*?%\\}".r
    var pos = 0
    // (kind, body, trimBefore, trimAfter) — Jinja2 whitespace control:
    // `{%- / {{-` strips trailing whitespace from the preceding text,
    // `-%} / -}}` strips leading whitespace from the following text
    val raw = scala.collection.mutable.ListBuffer.empty[(String, String, Boolean, Boolean)]
    tokenPat.findAllMatchIn(template).foreach { m =>
      if (m.start > pos)
        raw += (("text", template.substring(pos, m.start), false, false))
      val t = m.matched
      var inner = t.drop(2).dropRight(2)
      val trimBefore = inner.startsWith("-")
      if (trimBefore) inner = inner.drop(1)
      val trimAfter = inner.endsWith("-")
      if (trimAfter) inner = inner.dropRight(1)
      val kind = if (t.startsWith("{{")) "output" else "tag"
      raw += ((kind, inner.trim, trimBefore, trimAfter))
      pos = m.end
    }
    if (pos < template.length)
      raw += (("text", template.substring(pos), false, false))
    val arr = raw.toArray
    arr.indices.foreach { j =>
      val (k, _, tb, ta) = arr(j)
      if (k != "text") {
        if (tb && j > 0 && arr(j - 1)._1 == "text") {
          val p = arr(j - 1)
          arr(j - 1) = (p._1, p._2.replaceAll("\\s+$", ""), p._3, p._4)
        }
        if (ta && j + 1 < arr.length && arr(j + 1)._1 == "text") {
          val nx = arr(j + 1)
          arr(j + 1) = (nx._1, nx._2.replaceAll("^\\s+", ""), nx._3, nx._4)
        }
      }
    }
    val toks = arr.toList.map(t => (t._1, t._2))
    var i = 0
    def parseNodes(stopTags: Set[String]): (List[Node], Option[String]) = {
      val out = scala.collection.mutable.ListBuffer.empty[Node]
      while (i < toks.length) {
        val (kind, body) = toks(i)
        kind match {
          case "text"   => out += Text(body); i += 1
          case "output" => out += Output(parseExpr(body)); i += 1
          case "tag" =>
            val tag = body.split("\\s+").head
            if (stopTags.contains(tag)) return (out.toList, Some(body))
            tag match {
              case "for" =>
                val m = "^for\\s+(\\w+)\\s+in\\s+(.+)$".r
                  .findFirstMatchIn(body)
                  .getOrElse(throw new IllegalArgumentException(s"Bad for: $body"))
                i += 1
                val (inner, _) = parseNodes(Set("endfor"))
                i += 1 // consume endfor
                out += For(m.group(1), parseExpr(m.group(2)), inner)
              case "if" =>
                val branches =
                  scala.collection.mutable.ListBuffer.empty[(Option[Expr], List[Node])]
                var cond: Option[Expr] = Some(parseExpr(body.drop(2).trim))
                i += 1
                var done = false
                while (!done) {
                  val (inner, stop) = parseNodes(Set("elif", "else", "endif"))
                  branches += ((cond, inner))
                  stop match {
                    case Some(s) if s.startsWith("elif") =>
                      cond = Some(parseExpr(s.drop(4).trim)); i += 1
                    case Some("else") => cond = None; i += 1
                    case Some("endif") => i += 1; done = true
                    case other =>
                      throw new IllegalArgumentException(s"Unclosed if: $other")
                  }
                }
                out += If(branches.toList)
              case "set" =>
                val m = "^set\\s+(\\w+)\\s*=\\s*(.+)$".r
                  .findFirstMatchIn(body)
                  .getOrElse(throw new IllegalArgumentException(s"Bad set: $body"))
                out += SetVar(m.group(1), parseExpr(m.group(2)))
                i += 1
              case other =>
                throw new IllegalArgumentException(
                  s"Unsupported Jinja construct '{% $other %}'. Supported: " +
                    "{{ var }}, {% for %}, {% if/elif/else %}, {% set %}"
                )
            }
        }
      }
      (out.toList, None)
    }
    val (nodes, _) = parseNodes(Set.empty)
    Template(nodes)
  }

  private def parseExpr(s: String): Expr = parseOr(s.trim)

  // Jinja2 boolean precedence: or < and < not < comparison < ~ < |filter
  private def parseOr(s: String): Expr =
    findTopKeyword(s, " or ") match {
      case Some(i) =>
        Cmp("or", parseAnd(s.substring(0, i).trim),
          parseOr(s.substring(i + 4).trim))
      case None => parseAnd(s)
    }

  private def parseAnd(s: String): Expr =
    findTopKeyword(s, " and ") match {
      case Some(i) =>
        Cmp("and", parseNot(s.substring(0, i).trim),
          parseAnd(s.substring(i + 5).trim))
      case None => parseNot(s)
    }

  private def parseNot(s: String): Expr =
    if (s.startsWith("not ")) Not(parseNot(s.drop(4).trim))
    else parseCmp(s)

  private def parseCmp(s: String): Expr = {
    // comparison/membership binds LOOSEST (Jinja2 precedence: `a ~ b == c`
    // is `(a ~ b) == c`), so split it first; `~` folds inside each operand
    findTopKeyword(s, " not in ") match {
      case Some(i) =>
        return Cmp("not in",
          parseConcat(s.substring(0, i).trim),
          parseConcat(s.substring(i + 8).trim))
      case None => ()
    }
    findTopKeyword(s, " in ") match {
      case Some(i) =>
        return Cmp("in",
          parseConcat(s.substring(0, i).trim),
          parseConcat(s.substring(i + 4).trim))
      case None => ()
    }
    findTopCmpOp(s.trim) match {
      case Some((i, op)) =>
        Cmp(op,
          parseConcat(s.trim.substring(0, i).trim),
          parseConcat(s.trim.substring(i + op.length).trim))
      case None => parseConcat(s.trim)
    }
  }

  /** first comparison operator at quote/bracket depth zero (longest match
    * wins at each position), or None. */
  private def findTopCmpOp(s: String): Option[(Int, String)] = {
    val ops = Seq("==", "!=", "<=", ">=", "<", ">")
    var depth = 0
    var quote: Char = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '"' || c == '\'') quote = c
      else if (c == '(' || c == '[') depth += 1
      else if (c == ')' || c == ']') depth -= 1
      else if (depth == 0) {
        val hit = ops.find(op => s.regionMatches(i, op, 0, op.length))
        if (hit.isDefined) return Some((i, hit.get))
      }
      i += 1
    }
    None
  }

  private def parseConcat(s: String): Expr = {
    // `~` (Jinja string concat) folds left; tighter than comparisons,
    // looser than |filters
    val parts = splitTop(s.trim, '~').map(_.trim).filter(_.nonEmpty)
    if (parts.length > 1) parts.map(parseFiltered).reduceLeft(Cmp("~", _, _))
    else parseFiltered(s.trim)
  }

  /** index of `kw` at paren/quote depth zero, or None. */
  private def findTopKeyword(s: String, kw: String): Option[Int] = {
    var depth = 0
    var quote: Char = 0
    var i = 0
    while (i + kw.length <= s.length) {
      val c = s.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '"' || c == '\'') quote = c
      else if (c == '(' || c == '[') depth += 1
      else if (c == ')' || c == ']') depth -= 1
      else if (depth == 0 && s.regionMatches(i, kw, 0, kw.length)) return Some(i)
      i += 1
    }
    None
  }

  private def parseFiltered(s: String): Expr = {
    val parts = splitTop(s, '|').map(_.trim)
    val base = parseAtom(parts.head)
    parts.tail.foldLeft(base) { (acc, f) =>
      val m = "^(\\w+)(?:\\((.*)\\))?$".r
        .findFirstMatchIn(f)
        .getOrElse(throw new IllegalArgumentException(s"Bad filter: $f"))
      val args = Option(m.group(2)).filter(_.nonEmpty)
        .map(a => splitTop(a, ',').map(x => literal(x.trim)).toList)
        .getOrElse(Nil)
      Filtered(acc, m.group(1), args)
    }
  }

  private def parseAtom(s: String): Expr = {
    // split off trailing [idx] / [a:b] accessor groups (bracket binds
    // tighter than |filter, looser than the dotted path)
    val open = {
      var depth = 0
      var quote: Char = 0
      var found = -1
      var i = 0
      while (i < s.length && found < 0) {
        val c = s.charAt(i)
        if (quote != 0) { if (c == quote) quote = 0 }
        else if (c == '"' || c == '\'') quote = c
        else if (c == '[' && depth == 0) found = i
        else if (c == '(') depth += 1
        else if (c == ')') depth -= 1
        i += 1
      }
      found
    }
    if (open < 0) parseBase(s)
    else {
      var e = parseBase(s.substring(0, open).trim)
      var rest = s.substring(open)
      while (rest.startsWith("[")) {
        val close = matchingBracket(rest)
        require(close > 0, s"Unclosed '[' in: $s")
        val body = rest.substring(1, close).trim
        val parts = splitTop(body, ':').map(_.trim)
        e =
          if (parts.length == 1) Index(e, parseIndexExpr(parts.head))
          else if (parts.length == 2)
            Slice(
              e,
              Option(parts(0)).filter(_.nonEmpty).map(parseIndexExpr),
              Option(parts(1)).filter(_.nonEmpty).map(parseIndexExpr)
            )
          else throw new IllegalArgumentException(s"Bad slice: [$body]")
        rest = rest.substring(close + 1).trim
      }
      require(rest.isEmpty, s"Trailing content after accessor in: $s")
      e
    }
  }

  /** index of the `]` matching `s(0) == '['`, honoring quotes and nested
    * brackets/parens (so `xs[ys[0]]` and `m[']']` parse), or -1. */
  private def matchingBracket(s: String): Int = {
    var depth = 0
    var quote: Char = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '"' || c == '\'') quote = c
      else if (c == '[' || c == '(') depth += 1
      else if (c == ']' || c == ')') {
        depth -= 1
        if (depth == 0 && c == ']') return i
      }
      i += 1
    }
    -1
  }

  private def parseIndexExpr(s: String): Expr =
    if (s.matches("-?\\d+")) Lit(s.toLong) else parseExpr(s)

  /** Python string-method names promptsource templates call inline
    * (`{{ ctx_a.lower() }}`, `{{ text.split("|") }}`) → the equivalent
    * filter. Everything else after a '.(' rejects with a clear error. */
  private val methodFilters = Map(
    "lower" -> "lower", "upper" -> "upper", "title" -> "title",
    "capitalize" -> "capitalize", "strip" -> "trim",
    "replace" -> "replace", "split" -> "split",
    "startswith" -> "startswith", "endswith" -> "endswith")

  /** split a dotted path on '.' at depth zero (so `x.replace('.', ',')`
    * keeps its argument dots). */
  private def splitPath(s: String): Seq[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    var quote: Char = 0
    s.foreach { c =>
      if (quote != 0) { cur += c; if (c == quote) quote = 0 }
      else if (c == '"' || c == '\'') { quote = c; cur += c }
      else if (c == '(' || c == '[') { depth += 1; cur += c }
      else if (c == ')' || c == ']') { depth -= 1; cur += c }
      else if (c == '.' && depth == 0) { out += cur.result(); cur.clear() }
      else cur += c
    }
    out += cur.result()
    out.toSeq
  }

  private val methodCallRe = "^(\\w+)\\((.*)\\)$".r

  private def parseBase(s: String): Expr =
    if (s.startsWith("\"") || s.startsWith("'") || s.head.isDigit || s == "true" || s == "false")
      Lit(literal(s))
    else {
      val segs = splitPath(s)
      // leading run of plain attribute segments forms the Ref path;
      // trailing `name(args)` segments chain as method-call filters
      val firstCall = segs.indexWhere(seg => methodCallRe.findFirstIn(seg).isDefined)
      if (firstCall < 0) Ref(segs.toList)
      else {
        require(firstCall > 0, s"Bad expression: $s")
        val base: Expr = Ref(segs.take(firstCall).toList)
        segs.drop(firstCall).foldLeft(base) { (acc, seg) =>
          val m = methodCallRe.findFirstMatchIn(seg).getOrElse(
            throw new IllegalArgumentException(
              s"Attribute access after a method call is unsupported: $s"))
          val name = m.group(1)
          val filter = methodFilters.getOrElse(name,
            throw new IllegalArgumentException(
              s"Unsupported method call '.$name()'. Supported: " +
                methodFilters.keys.toSeq.sorted.mkString(", ")))
          val args = Option(m.group(2)).map(_.trim).filter(_.nonEmpty)
            .map(a => splitTop(a, ',').map(x => literal(x.trim)).toList)
            .getOrElse(Nil)
          Filtered(acc, filter, args)
        }
      }
    }

  private def literal(s: String): Any =
    if (s.startsWith("\"") && s.endsWith("\"")) s.drop(1).dropRight(1)
    else if (s.startsWith("'") && s.endsWith("'")) s.drop(1).dropRight(1)
    else if (s == "true") true
    else if (s == "false") false
    else if (s.contains('.')) s.toDouble
    else s.toLong

  /** split on `sep` outside quotes/parens. */
  private def splitTop(s: String, sep: Char): Seq[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    var quote: Char = 0
    s.foreach { c =>
      if (quote != 0) { cur += c; if (c == quote) quote = 0 }
      else if (c == '"' || c == '\'') { quote = c; cur += c }
      else if (c == '(' || c == '[') { depth += 1; cur += c }
      else if (c == ')' || c == ']') { depth -= 1; cur += c }
      else if (c == sep && depth == 0) { out += cur.result(); cur.clear() }
      else cur += c
    }
    out += cur.result()
    out.toSeq
  }

  /** Spark value → template value (Rows stay Rows; WrappedArray → Seq). */
  private[operators] def toTemplateValue(v: Any): Any = v match {
    case s: scala.collection.Seq[_] => s.map(toTemplateValue).toSeq
    case other                      => other
  }
}

/** Render a Jinja template per row; `|||` splits source vs target(s).
  * Ref: promptsource.py:313-354. */
final case class JinjaMapper(
    jinja: String,
    sourceFieldName: String = "source",
    targetFieldName: String = "target",
    returnMultipleTargets: Boolean = false,
    extraVariables: Map[String, Any] = Map.empty,
    answerChoicesJinja: Option[String] = None
) extends Mapper {
  // parse eagerly on the driver so bad templates fail at pipeline build
  MiniJinja.parse(jinja)
  answerChoicesJinja.foreach(MiniJinja.parse)

  override def inputFields: Seq[String] = Nil // inferred from template
  override def outputFields: Seq[String] =
    Seq(sourceFieldName, targetFieldName)

  override protected def build(df: DataFrame): DataFrame = {
    val template = jinja
    val extra = extraVariables
    val multi = returnMultipleTargets
    val choicesTpl = answerChoicesJinja
    val cols = df.columns
    // overwrite-in-output semantics (reference merges transform output
    // over the sample): input columns colliding with source/target are
    // replaced, not duplicated
    val keptIdx = cols.indices
      .filter(i => cols(i) != sourceFieldName && cols(i) != targetFieldName)
    val targetType =
      if (multi) ArrayType(StringType) else StringType
    val outSchema = StructType(
      keptIdx.map(i => df.schema.fields(i)) ++ Seq(
        StructField(sourceFieldName, StringType),
        StructField(targetFieldName, targetType)
      )
    )
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { it =>
      val tpl = MiniJinja.parse(template) // once per partition
      val ctpl = choicesTpl.map(MiniJinja.parse)
      it.map { row =>
        val base = cols.zipWithIndex.map { case (c, i) =>
          c -> MiniJinja.toTemplateValue(row.get(i))
        }.toMap ++ extra
        // promptsource answer_choices convention: a per-example Jinja
        // string split on '|||' becomes the `answer_choices` list the
        // template indexes with the label ({{ answer_choices[label] }})
        val vars = ctpl match {
          case Some(t) =>
            val choices = t.render(base).split("\\|\\|\\|").map(_.trim).toSeq
            base + ("answer_choices" -> choices)
          case None => base
        }
        val rendered = tpl.render(vars)
        val parts = rendered.split("\\|\\|\\|").map(_.trim)
        val source = parts.head
        val targets = parts.tail.toSeq
        val targetVal: Any =
          if (multi) targets
          else targets.headOption.getOrElse("")
        Row.fromSeq(keptIdx.map(row.get) ++ Seq(source, targetVal))
      }
    }(enc)
  }
}

/** Few-shot prompting: group `numShots`+1 consecutive rows; the first
  * `numShots` become `__shots__` context, the last is the query row.
  * Ref: promptsource.py:357-470. Batching follows FixedBatchSize's
  * scalable semantics (partition-local by default, `orderBy` for a
  * deterministic global order — SURVEY §7.3). */
final case class FewShotJinjaMapper(
    jinja: String,
    numShots: Int,
    sourceFieldName: String = "source",
    targetFieldName: String = "target",
    keepLast: Boolean = false,
    orderBy: Seq[String] = Nil
) extends Mapper {
  require(numShots >= 0, "numShots must be >= 0")
  MiniJinja.parse(jinja)

  override def outputFields: Seq[String] = Seq(sourceFieldName, targetFieldName)

  override protected def build(df: DataFrame): DataFrame = {
    val groupSize = numShots + 1
    val batched = FixedBatchSize(groupSize, keepLast = keepLast, orderBy = orderBy)(df)
    // batched: every column is now an array; shots = rows 0..n-2, query = last
    val template = jinja
    val cols = df.columns
    val keptIdx = cols.indices
      .filter(i => cols(i) != sourceFieldName && cols(i) != targetFieldName)
    val outSchema = StructType(
      keptIdx.map(i => df.schema.fields(i)) ++ Seq(
        StructField(sourceFieldName, StringType),
        StructField(targetFieldName, StringType)
      )
    )
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    batched.mapPartitions { it =>
      val tpl = MiniJinja.parse(template)
      it.map { row =>
        val colsVals: Map[String, Seq[Any]] = cols.zipWithIndex.map {
          case (c, i) =>
            c -> row.getSeq[Any](i).map(MiniJinja.toTemplateValue)
        }.toMap
        val n = colsVals.head._2.size
        val shots: Seq[Map[String, Any]] =
          (0 until n - 1).map(k => cols.map(c => c -> colsVals(c)(k)).toMap)
        val queryVars = cols.map(c => c -> colsVals(c)(n - 1)).toMap
        val vars = queryVars + ("__shots__" -> shots)
        val parts = tpl.render(vars).split("\\|\\|\\|").map(_.trim)
        Row.fromSeq(
          keptIdx.map(i => colsVals(cols(i))(n - 1)) ++
            Seq(parts.head, parts.drop(1).headOption.getOrElse(""))
        )
      }
    }(enc)
  }
}

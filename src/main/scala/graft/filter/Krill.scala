package graft.filter

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.GraftException

/**
 * Predicate AST with node-krill semantics (reference: dragnet filters are
 * node-krill JSON predicates — README.md:160-183; evaluation at
 * lib/krill-skinner-stream.js:40-60: records whose referenced fields are
 * missing fail the predicate and are dropped).
 *
 * JSON form: `{"eq": ["req.method", "GET"]}`,
 * `{"and": [{"ge": ["res.statusCode", 500]}, {"lt": ["latency", 100]}]}`.
 *
 * Supported ops: eq ne lt le gt ge and or. SQL three-valued logic gives us
 * the drop-on-missing behavior for free: a comparison against NULL is NULL,
 * and a WHERE clause keeps only TRUE rows.
 */
sealed trait Pred {

  /** Compile to a Spark Column, resolving field paths via `resolve`. */
  def toColumn(resolve: String => Column): Column = this match {
    case Cmp(op, field, value) =>
      val c = resolve(field)
      val v = lit(value)
      op match {
        case "eq" => c === v
        case "ne" => c =!= v
        case "lt" => c < v
        case "le" => c <= v
        case "gt" => c > v
        case "ge" => c >= v
      }
    case And(ps) => ps.map(_.toColumn(resolve)).reduce(_ && _)
    case Or(ps)  => ps.map(_.toColumn(resolve)).reduce(_ || _)
    case True    => lit(true)
  }

  /** Render as an ANSI SQL boolean expression (for DuckDB oracles). */
  def toSql(resolve: String => String): String = this match {
    case Cmp(op, field, value) =>
      val c = resolve(field)
      val v = value match {
        case s: String => "'" + s.replace("'", "''") + "'"
        case d: java.lang.Double =>
          if (d == d.longValue().toDouble) d.longValue().toString
          else d.toString
        case x => x.toString
      }
      val sqlOp = op match {
        case "eq" => "="
        case "ne" => "<>"
        case "lt" => "<"
        case "le" => "<="
        case "gt" => ">"
        case "ge" => ">="
      }
      s"($c $sqlOp $v)"
    case And(ps) => ps.map(_.toSql(resolve)).mkString("(", " AND ", ")")
    case Or(ps)  => ps.map(_.toSql(resolve)).mkString("(", " OR ", ")")
    case True    => "TRUE"
  }

  /** All field paths referenced by this predicate. */
  def fields: Set[String] = this match {
    case Cmp(_, f, _) => Set(f)
    case And(ps)      => ps.flatMap(_.fields).toSet
    case Or(ps)       => ps.flatMap(_.fields).toSet
    case True         => Set.empty
  }
}

final case class Cmp(op: String, field: String, value: Any) extends Pred {
  require(Krill.cmpOps.contains(op), s"unsupported op: $op")
}
final case class And(ps: Seq[Pred]) extends Pred { require(ps.nonEmpty) }
final case class Or(ps: Seq[Pred]) extends Pred { require(ps.nonEmpty) }
/** The trivial predicate `{}` — always true, drops nothing (node-krill's
  * empty filter, accepted by `dn datasource-update --filter={}`). */
case object True extends Pred

object Krill {
  val cmpOps: Set[String] = Set("eq", "ne", "lt", "le", "gt", "ge")
  private val mapper = new ObjectMapper()

  /** Parse a krill JSON predicate string. */
  def parse(json: String): Pred = {
    val root =
      try mapper.readTree(json)
      catch { case e: com.fasterxml.jackson.core.JacksonException =>
        throw new GraftException(s"invalid filter JSON: ${e.getMessage}") }
    fromNode(root)
  }

  private def fromNode(n: JsonNode): Pred = {
    if (n.isObject && n.size() == 0) return True // trivial predicate
    if (!n.isObject || n.size() != 1)
      throw new GraftException(s"expected single-key object: $n")
    val op = n.fieldNames().next()
    val arg = n.get(op)
    op match {
      case "and" | "or" =>
        if (!arg.isArray || arg.size() == 0)
          throw new GraftException(s"$op wants a non-empty array")
        val ps = (0 until arg.size()).map(i => fromNode(arg.get(i)))
        if (op == "and") And(ps) else Or(ps)
      case o if cmpOps.contains(o) =>
        if (!arg.isArray || arg.size() != 2)
          throw new GraftException(s"$o wants [field, value]")
        val field = arg.get(0).asText()
        val v = arg.get(1)
        val value: Any =
          if (v.isTextual) v.asText()
          else if (v.isIntegralNumber) v.asLong()
          else if (v.isNumber) v.asDouble()
          else if (v.isBoolean) v.asBoolean()
          else throw new GraftException(s"unsupported literal: $v")
        Cmp(o, field, value)
      case other => throw new GraftException(s"unsupported op: $other")
    }
  }
}

package graft

import scala.collection.mutable.ListBuffer

/**
 * Parser for dragnet's breakdown column syntax (reference:
 * lib/attr-parser.js — same grammar, reimplemented):
 *
 *   field1
 *   field1,field2
 *   latency[aggr=quantize],req.method
 *   timestamp[date,field=time,aggr=lquantize,step=86400]
 *
 * Fields are comma-separated; each may carry a bracketed comma-separated
 * attribute list where each attribute is `key` or `key=value`.
 */
object AttrParser {

  /** Parse into FieldSpecs. Throws GraftException on malformed input. */
  def parse(str: String): Seq[FieldSpec] =
    parseRaw(str).map { case (name, attrs) =>
      FieldSpec(
        name = name,
        field = attrs.getOrElse("field", name),
        isDate = attrs.contains("date"),
        aggr = attrs.get("aggr"),
        step = attrs.get("step").map { s =>
          val d = s.toDoubleOption.getOrElse(
            throw new GraftException(s"bad step: $s"))
          if (d <= 0) throw new GraftException(s"step must be positive: $s")
          d
        })
    }

  /** Raw parse: (name, attrMap) per field, preserving order. */
  def parseRaw(str: String): Seq[(String, Map[String, String])] = {
    val out = ListBuffer.empty[(String, Map[String, String])]
    var i = 0
    var j = 0
    var name: String = null
    var attrs = Map.empty[String, String]
    while (i < str.length) {
      val c = str.charAt(i)
      if (name == null) {
        if (c == ',') {
          if (i > j) out += ((str.substring(j, i), Map.empty))
          j = i + 1
        } else if (c == '[') {
          if (i == j) throw new GraftException("missing field name")
          name = str.substring(j, i)
          attrs = Map.empty
          j = i + 1
        }
      } else {
        if (c == ',' || c == ']') {
          if (i > j) {
            val prop = str.substring(j, i)
            val eq = prop.indexOf('=')
            if (eq == 0) throw new GraftException("missing attribute name")
            else if (eq < 0) attrs += (prop -> "")
            else attrs += (prop.substring(0, eq) -> prop.substring(eq + 1))
          }
          if (c == ']') {
            out += ((name, attrs))
            name = null
          }
          j = i + 1
        }
      }
      i += 1
    }
    if (name != null) throw new GraftException("unexpected end of string")
    if (j < str.length) out += ((str.substring(j), Map.empty))
    out.toList
  }
}

package graft

/**
 * Core data model for graft queries.
 *
 * Mirrors the semantics of dragnet's query configuration (reference:
 * lib/dragnet.js, lib/attr-parser.js) re-expressed for Spark: a query is a
 * filter + a list of breakdown column specs + optional time bounds, and the
 * one aggregate is a value-weighted count (sum of a `value` column that is 1
 * for raw records).
 */

/**
 * One breakdown column spec, e.g. parsed from
 * `timestamp[date,field=time,aggr=lquantize,step=86400]`.
 *
 * @param name   output column name
 * @param field  source field path (dotted); defaults to `name`
 * @param isDate parse the source field as a date -> unix seconds
 *               (reference: lib/stream-synthetic.js:37-82 — numbers pass
 *               through, strings are ISO-8601-parsed, floor(ms/1000))
 * @param aggr   optional bucketing: "quantize" (power-of-two) or
 *               "lquantize" (linear, requires step)
 * @param step   bucket width for lquantize
 */
final case class FieldSpec(
    name: String,
    field: String,
    isDate: Boolean = false,
    aggr: Option[String] = None,
    step: Option[Double] = None) {
  require(aggr.forall(a => a == "quantize" || a == "lquantize"),
    s"unsupported aggr: $aggr")
  require(aggr.forall(a => a != "lquantize" || step.isDefined),
    "lquantize requires step")
}

object FieldSpec {
  def plain(name: String): FieldSpec = FieldSpec(name, name)
}

/**
 * A full query: the Spark analog of dragnet's QueryConfig
 * (reference: lib/dragnet.js queryLoad).
 *
 * @param filter     krill-style predicate (reference: node-krill JSON)
 * @param breakdowns group-by column specs, order preserved
 * @param timeField  field holding the record timestamp; required when
 *                   before/after are set
 * @param after      inclusive lower time bound (reference:
 *                   lib/dragnet-impl.js queryTimeBoundsFilter: ge ceil(ms/1000))
 * @param before     exclusive upper bound (lt ceil(ms/1000))
 * @param valueField when reading pre-aggregated points (dragnet's
 *                   --data-format=json-skinner / --points), the column holding
 *                   each point's weight; raw records weigh 1
 */
final case class QueryConfig(
    filter: Option[graft.filter.Pred] = None,
    breakdowns: Seq[FieldSpec] = Nil,
    timeField: Option[String] = None,
    after: Option[java.time.Instant] = None,
    before: Option[java.time.Instant] = None,
    valueField: Option[String] = None)

class GraftException(msg: String, cause: Throwable = null)
  extends RuntimeException(msg, cause)

package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions._

/**
 * The scan operator: dragnet's whole pipeline — user filter → synthetic
 * date fields → time-bounds filter → count aggregation grouped by breakdown
 * columns (reference: lib/stream-scan.js:40-96) — expressed as ONE
 * declarative DataFrame plan.
 *
 * Dragnet pipes object streams through five Node transforms; here Catalyst
 * gets a single `where → project → groupBy → sum` plan, so predicate/projection
 * pushdown reaches the source scan, aggregation is partial (map-side) before
 * the shuffle, and the whole thing runs in whole-stage codegen. The
 * unique-tuple memory limit dragnet documents (README.md:668-690) does not
 * exist here: group state is distributed and spill-safe.
 */
object Scan {

  /** Weight column: 1 for raw records, `value` for skinner-style points. */
  private def weight(cfg: QueryConfig): Column =
    cfg.valueField.map(col).getOrElse(lit(1L))

  /**
   * The null-determining base expression of a breakdown: date parsing and
   * numeric coercion are the only steps that can turn a present value into
   * NULL; quantize/lquantize are null-preserving on top. The row-drop
   * filter tests THIS, not the full bucketized expression — otherwise
   * predicate pushdown inlines the whole CASE chain (and any expensive
   * source expression like from_json, several times over) into the
   * pushed filter.
   */
  def baseCol(fs: FieldSpec, resolve: String => Column): Column = {
    var c = resolve(fs.field)
    if (fs.isDate) c = epochSecs(c)
    else if (fs.aggr.isDefined) c = c.try_cast("double")
    c
  }

  /** Compile one breakdown spec to its Column (unaliased). */
  def breakdownCol(fs: FieldSpec, resolve: String => Column): Column = {
    val c = baseCol(fs, resolve)
    fs.aggr match {
      case Some("quantize")  => quantize(c)
      case Some("lquantize") => lquantize(c, fs.step.get)
      case _                 => c
    }
  }

  /**
   * Run a query over a DataFrame of records.
   *
   * Result schema: one column per breakdown (named `fs.name`, in order) plus
   * BIGINT `value` = weighted record count. No breakdowns → single row with
   * just `value`. Rows are ordered by the breakdown columns so output is
   * deterministic.
   *
   * Rows are dropped (never grouped under NULL) when: the filter references
   * a missing/null field, a breakdown value is null, a date fails to parse,
   * or an `aggr` field is non-numeric — matching dragnet
   * (README.md:700-712).
   */
  /** The row-level prefilters of a config (user filter + time bounds) —
    * the pre-aggregation half of [[scan]], reused by `dn index-scan`. */
  def prefilter(df: DataFrame, cfg: QueryConfig,
      resolve: String => Column = col): DataFrame = {
    var cur = df
    cfg.filter.foreach(p => cur = cur.where(p.toColumn(resolve)))
    timeBoundCols(cfg, resolve).foreach(c => cur = cur.where(c))
    cur
  }

  def scan(df: DataFrame, cfg: QueryConfig,
           resolve: String => Column = col): DataFrame = {
    var cur = prefilter(df, cfg, resolve)

    val cols = cfg.breakdowns.map(fs => breakdownCol(fs, resolve).as(fs.name))
    if (cols.isEmpty) {
      // coalesce: zero records must count 0, not NULL (reference:
      // tests/dn/local empty-data case prints 0)
      cur.agg(coalesce(sum(weight(cfg)), lit(0L)).cast("long").as("value"))
    } else {
      cfg.breakdowns.foreach { fs =>
        cur = cur.where(baseCol(fs, resolve).isNotNull)
      }
      // backtick-quote the OUTPUT aliases: a dotted breakdown name
      // (`req.method`) is a flat column here, and a bare col() would
      // re-parse it as a nested path
      val names = cfg.breakdowns.map(fs => s"`${fs.name}`")
      cur.groupBy(cols: _*)
        .agg(sum(weight(cfg)).cast("long").as("value"))
        .orderBy(names.map(col): _*)
    }
  }

  /** SQL text of [[baseCol]] for the DuckDB oracle. */
  def baseSql(fs: FieldSpec, resolve: String => String): String = {
    var e = resolve(fs.field)
    if (fs.isDate) e = epochSecsSql(e)
    else if (fs.aggr.isDefined) e = s"TRY_CAST($e AS DOUBLE)"
    e
  }

  /** SQL text of one breakdown spec for the DuckDB oracle. */
  def breakdownSql(fs: FieldSpec, resolve: String => String): String = {
    val e = baseSql(fs, resolve)
    fs.aggr match {
      case Some("quantize")  => quantizeSql(e)
      case Some("lquantize") => lquantizeSql(e, fs.step.get)
      case _                 => e
    }
  }

  /**
   * Generate the DuckDB oracle SQL for the same query — built from the same
   * QueryConfig so the Spark plan and the oracle can't drift apart.
   */
  def scanSql(table: String, cfg: QueryConfig,
              resolve: String => String = identity,
              valueExpr: String = "1"): String = {
    val where = scala.collection.mutable.ListBuffer.empty[String]
    cfg.filter.foreach(p => where += p.toSql(resolve))
    where ++= timeBoundSqls(cfg, resolve)
    val weightExpr = cfg.valueField.map(resolve).getOrElse(valueExpr)
    val value =
      if (cfg.breakdowns.isEmpty)
        s"CAST(COALESCE(SUM($weightExpr), 0) AS BIGINT) AS value"
      else s"CAST(SUM($weightExpr) AS BIGINT) AS value"

    if (cfg.breakdowns.isEmpty) {
      val w = if (where.isEmpty) "" else where.mkString(" WHERE ", " AND ", "")
      s"SELECT $value FROM $table$w"
    } else {
      val exprs = cfg.breakdowns.map(fs => breakdownSql(fs, resolve))
      cfg.breakdowns.foreach { fs =>
        where += s"${baseSql(fs, resolve)} IS NOT NULL"
      }
      val sel = exprs.zip(cfg.breakdowns).map { case (e, fs) =>
        s"$e AS ${fs.name}" }.mkString(", ")
      val pos = (1 to cfg.breakdowns.size).mkString(", ")
      s"SELECT $sel, $value FROM $table WHERE ${where.mkString(" AND ")} " +
        s"GROUP BY $pos ORDER BY $pos"
    }
  }

  /** ms instant → whole seconds, rounded up (dragnet's time-bound rounding). */
  private def ceilSecs(t: java.time.Instant): Long =
    math.ceil(t.toEpochMilli / 1000.0).toLong

  /**
   * The time-bound predicates of a config — inclusive start / exclusive
   * end, both rounded UP to whole seconds (reference: lib/dragnet-impl.js
   * queryTimeBoundsFilter). Single source of truth for scan, counters,
   * and both SQL twins.
   */
  private def timeBoundCols(cfg: QueryConfig,
      resolve: String => Column): Seq[Column] =
    (cfg.after, cfg.before) match {
      case (None, None) => Nil
      case (a, b) =>
        val tf = cfg.timeField.getOrElse(
          throw new GraftException("time bounds require a timeField"))
        val ts = epochSecs(resolve(tf))
        a.map(t => ts >= lit(ceilSecs(t))).toSeq ++
          b.map(t => ts < lit(ceilSecs(t))).toSeq
    }

  /** SQL twin of [[timeBoundCols]]. */
  private def timeBoundSqls(cfg: QueryConfig,
      resolve: String => String): Seq[String] =
    (cfg.after, cfg.before) match {
      case (None, None) => Nil
      case (a, b) =>
        val tf = cfg.timeField.getOrElse(
          throw new GraftException("time bounds require a timeField"))
        val ts = epochSecsSql(resolve(tf))
        a.map(t => s"$ts >= ${ceilSecs(t)}").toSeq ++
          b.map(t => s"$ts < ${ceilSecs(t)}").toSeq
    }

  /**
   * Per-stage drop accounting — dragnet's `--counters`/`--warnings`
   * (README: pipeline counters; records dropped by filter, by time
   * bounds, by invalid/missing fields). One conditional-aggregation pass
   * (codegen'd, map-side combined), not per-stage stream instrumentation:
   * `input = filter_dropped + time_dropped + invalid_dropped + aggregated`.
   * Rows are weighted by cfg.valueField (skinner points count their
   * value), so `aggregated` always equals the scan's total.
   */
  def counters(df: DataFrame, cfg: QueryConfig,
               resolve: String => Column = col): DataFrame = {
    val filterPass = cfg.filter
      .map(p => coalesce(p.toColumn(resolve), lit(false))).getOrElse(lit(true))
    val timePass: Column = timeBoundCols(cfg, resolve) match {
      case Nil   => lit(true)
      case conds => coalesce(conds.reduce(_ && _), lit(false))
    }
    val validPass = cfg.breakdowns
      .map(fs => baseCol(fs, resolve).isNotNull)
      .foldLeft(lit(true))(_ && _)
    val w = weight(cfg)
    def n(c: Column) = coalesce(sum(when(c, w).otherwise(0L)), lit(0L))
      .cast("long")
    df.agg(
      coalesce(sum(w), lit(0L)).cast("long").as("input"),
      n(!filterPass).as("filter_dropped"),
      n(filterPass && !timePass).as("time_dropped"),
      n(filterPass && timePass && !validPass).as("invalid_dropped"),
      n(filterPass && timePass && validPass).as("aggregated"))
  }

  private def undefMsg(f: String) = s"""field "$f" is undefined"""
  private def badDateMsg(f: String) = s"""field "$f" is not a valid date"""
  private def nonNumMsg(f: String) = s"""field "$f" has a non-numeric value"""

  /**
   * Per-record drop DIAGNOSTICS — the reference's `--warnings` stream
   * (bin/dn:899-907 walks the pipeline attaching "warn" listeners;
   * message shapes from stream-synthetic.js:50-77 — `field "F" is
   * undefined` / `is not a valid date` — and krill-skinner-stream.js:
   * 40-48, which warns on EVAL FAILURE only: a record the filter drops
   * with all referenced fields present is a counter bump, not a
   * warning). One output row per dropped record carrying its FIRST
   * failing stage's message (the reference's `nerrors === 0` gating),
   * classified by the same predicates as [[counters]] — a warned record
   * lands in exactly the counter its stage names. A distributed filter
   * at any scale; callers cap for display.
   */
  def warnings(df: DataFrame, cfg: QueryConfig,
      resolve: String => Column = col): DataFrame = {
    val filterPass = cfg.filter
      .map(p => coalesce(p.toColumn(resolve), lit(false))).getOrElse(lit(true))
    val timeConds = timeBoundCols(cfg, resolve)
    val timePass: Column = timeConds match {
      case Nil   => lit(true)
      case conds => coalesce(conds.reduce(_ && _), lit(false))
    }
    val noMsg = when(lit(false), lit("")) // CASE with no arms = NULL
    val filterMsg = cfg.filter.map(_.fields.toSeq.sorted).getOrElse(Nil)
      .foldLeft(noMsg)((acc, f) => acc.when(resolve(f).isNull, lit(undefMsg(f))))
    val timeMsg = cfg.timeField match {
      case Some(tf) if timeConds.nonEmpty =>
        when(resolve(tf).isNull, lit(undefMsg(tf)))
          .when(epochSecs(resolve(tf)).isNull, lit(badDateMsg(tf)))
      case _ => noMsg
    }
    val invalidMsg = cfg.breakdowns.foldLeft(noMsg) { (acc, fs) =>
      val msg = if (fs.isDate) badDateMsg(fs.field) else nonNumMsg(fs.field)
      acc.when(resolve(fs.field).isNull, lit(undefMsg(fs.field)))
        .when(baseCol(fs, resolve).isNull, lit(msg))
    }
    df.select(
        when(!filterPass, filterMsg)
          .when(!timePass, timeMsg)
          .otherwise(invalidMsg).as("warning"))
      .where(col("warning").isNotNull)
  }

  /** DuckDB oracle SQL for [[warnings]], built from the same QueryConfig
    * (same stage order, same messages). */
  def warningsSql(table: String, cfg: QueryConfig,
      resolve: String => String = identity): String = {
    def lit(s: String) = "'" + s.replace("'", "''") + "'"
    val filterPass = cfg.filter
      .map(p => s"COALESCE(${p.toSql(resolve)}, FALSE)").getOrElse("TRUE")
    val timeConds = timeBoundSqls(cfg, resolve)
    val timePass = timeConds match {
      case Nil   => "TRUE"
      case conds => s"COALESCE(${conds.mkString("(", " AND ", ")")}, FALSE)"
    }
    def arms(ws: Seq[(String, String)]): String =
      if (ws.isEmpty) "NULL"
      else ws.map { case (c, m) => s"WHEN $c THEN ${lit(m)}" }
        .mkString("CASE ", " ", " END")
    val filterMsg = arms(cfg.filter.map(_.fields.toSeq.sorted).getOrElse(Nil)
      .map(f => s"${resolve(f)} IS NULL" -> undefMsg(f)))
    val timeMsg = cfg.timeField match {
      case Some(tf) if timeConds.nonEmpty => arms(Seq(
        s"${resolve(tf)} IS NULL" -> undefMsg(tf),
        s"${epochSecsSql(resolve(tf))} IS NULL" -> badDateMsg(tf)))
      case _ => "NULL"
    }
    val invalidMsg = arms(cfg.breakdowns.flatMap { fs =>
      val msg = if (fs.isDate) badDateMsg(fs.field) else nonNumMsg(fs.field)
      Seq(s"${resolve(fs.field)} IS NULL" -> undefMsg(fs.field),
        s"${baseSql(fs, resolve)} IS NULL" -> msg)
    })
    s"""SELECT warning FROM (
       |  SELECT CASE WHEN NOT $filterPass THEN $filterMsg
       |    WHEN NOT $timePass THEN $timeMsg
       |    ELSE $invalidMsg END AS warning
       |  FROM $table)
       |WHERE warning IS NOT NULL""".stripMargin
  }

  /** DuckDB oracle SQL for [[counters]], built from the same QueryConfig. */
  def countersSql(table: String, cfg: QueryConfig,
                  resolve: String => String = identity,
                  valueExpr: String = "1"): String = {
    val filterPass = cfg.filter
      .map(p => s"COALESCE(${p.toSql(resolve)}, FALSE)").getOrElse("TRUE")
    val timePass = timeBoundSqls(cfg, resolve) match {
      case Nil   => "TRUE"
      case conds => s"COALESCE(${conds.mkString("(", " AND ", ")")}, FALSE)"
    }
    val validPass =
      if (cfg.breakdowns.isEmpty) "TRUE"
      else cfg.breakdowns
        .map(fs => s"${baseSql(fs, resolve)} IS NOT NULL")
        .mkString("(", " AND ", ")")
    val w = cfg.valueField.map(resolve).getOrElse(valueExpr)
    def n(c: String) =
      s"CAST(COALESCE(SUM(CASE WHEN $c THEN $w ELSE 0 END), 0) AS BIGINT)"
    s"""SELECT CAST(COALESCE(SUM($w), 0) AS BIGINT) AS input,
       |  ${n(s"NOT $filterPass")} AS filter_dropped,
       |  ${n(s"$filterPass AND NOT $timePass")} AS time_dropped,
       |  ${n(s"$filterPass AND $timePass AND NOT $validPass")} AS invalid_dropped,
       |  ${n(s"$filterPass AND $timePass AND $validPass")} AS aggregated
       |FROM $table""".stripMargin
  }
}

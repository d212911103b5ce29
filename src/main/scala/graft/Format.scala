package graft

import org.apache.spark.sql.DataFrame

/**
 * Display-only rendering of scan results, byte-mirroring the
 * reference's pretty outputter (bin/dn dnOutputPretty /
 * dnOutputPrettyQuantized / dnPrintDistribution; DnCliSpec replays the
 * README transcripts against the reference's own tests/data).
 * Driver-side by design — it formats the (small, already-aggregated)
 * result of a scan, never raw data.
 */
object Format {

  private def iso(epochSecs: Long): String =
    java.time.Instant.ofEpochSecond(epochSecs).toString match {
      // Instant.toString drops .000 millis; the reference's
      // Date.toISOString always prints them
      case s if s.length == 20 => s.dropRight(1) + ".000Z"
      case s => s
    }

  private def numOf(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case s: Short => s.toLong
    case other => other.toString.toLong
  }

  /**
   * Pretty table (reference: dnOutputPretty + node-tab): breakdown
   * columns as left-aligned strings (the reference's flattener
   * stringifies keys) EXCEPT bucketized ones, which stay numeric and
   * right-align; `[date]` columns render ISO-8601; the trailing VALUE
   * right-aligns. Column width = max(label, widest cell); single-space
   * separators; rows sorted by columns left-to-right (numeric compare
   * on the numeric columns); zero rows emit nothing.
   */
  def table(df: DataFrame, breakdowns: Seq[FieldSpec]): String = {
    val cols = df.columns
    val n = cols.length
    val rows0 = df.collect()
    if (rows0.isEmpty) return ""
    val spec: Int => Option[FieldSpec] =
      j => if (breakdowns.length == n - 1) breakdowns.lift(j) else None
    def numericCol(j: Int) =
      j == n - 1 || spec(j).exists(s => s.aggr.isDefined && !s.isDate)
    // expand values first (dates → ISO), THEN sort — the reference
    // sorts the expanded rows
    val cells: Seq[IndexedSeq[Any]] = rows0.toSeq.map { r =>
      (0 until n).map { j =>
        val v = r.get(j)
        if (spec(j).exists(_.isDate)) iso(numOf(v))
        else if (numericCol(j)) numOf(v)
        else String.valueOf(v)
      }
    }
    val sorted = cells.sortWith { (a, b) =>
      var j = 0
      var d = 0
      while (j < n && d == 0) {
        d = (a(j), b(j)) match {
          case (x: Long, y: Long) => java.lang.Long.compare(x, y)
          case (x, y) => x.toString.compareTo(y.toString)
        }
        j += 1
      }
      d < 0
    }
    val labels = (0 until n).map { j =>
      if (j == n - 1) "VALUE"
      else spec(j).map(_.name.toUpperCase)
        .getOrElse(cols(j).toUpperCase)
    }
    val widths = (0 until n).map { j =>
      math.max(labels(j).length, sorted.map(_(j).toString.length).max)
    }
    val sb = new StringBuilder
    def pad(s: String, w: Int, right: Boolean): String =
      if (right) " " * (w - s.length) + s else s + " " * (w - s.length)
    sb.append((0 until n).map(j =>
      pad(labels(j), widths(j), right = j == n - 1))
      .mkString(" ").replaceAll(" +$", "")).append('\n')
    sorted.foreach { row =>
      sb.append((0 until n).map(j =>
        pad(row(j).toString, widths(j), numericCol(j)))
        .mkString(" ").replaceAll(" +$", "")).append('\n')
    }
    sb.toString
  }

  /**
   * DTrace-style histograms for a trailing bucketized breakdown
   * (reference: dnOutputPrettyQuantized + dnPrintDistribution,
   * byte-compatible):
   *
   *   GET, getstorage
   *              value  ------------- Distribution ------------- count
   *                  1 |@@                                       12
   *
   * One histogram per distinct leading-breakdown tuple (label = values
   * joined ", ", groups label-sorted, blank line between); @-bars are
   * round(40·count/groupTotal); buckets zero-fill from bucket 0 (or
   * from the first data bucket when its index exceeds 100 — the
   * timestamp case) through one empty bucket past the last.
   */
  def histogram(df: DataFrame, spec: FieldSpec): String = {
    val cols = df.columns
    require(cols.length >= 2, "need at least (bucket, value) columns")
    val groupCols = cols.dropRight(2)
    val asDate = spec.isDate
    val step = spec.step.getOrElse(1.0).toLong
    // bucket min → bucket index, per the reference bucketizers
    def idxOf(min: Long): Long = spec.aggr match {
      case Some("quantize") =>
        if (min <= 0) 0L
        else 64L - java.lang.Long.numberOfLeadingZeros(min)
      case _ => min / math.max(1L, step)
    }
    def minOf(idx: Long): Long = spec.aggr match {
      case Some("quantize") => if (idx == 0) 0L else 1L << (idx - 1)
      case _ => idx * math.max(1L, step)
    }
    val rows = df.collect()
    val sb = new StringBuilder
    val grouped = rows.toSeq
      .groupBy(r =>
        groupCols.toSeq.map(c => String.valueOf(r.getAs[Any](c))))
    grouped.toSeq
      .sortBy(_._1.mkString(", "))
      .zipWithIndex.foreach { case ((key, rs), gi) =>
        if (gi != 0) sb.append('\n')
        sb.append(key.mkString(", ")).append('\n')
        val distr = rs
          .map(r => (idxOf(numOf(r.get(cols.length - 2))),
            numOf(r.get(cols.length - 1))))
          .sortBy(_._1)
        if (asDate) sb.append(" " * 10)
        sb.append(" " * 11)
          .append("value  ------------- Distribution ------------- count\n")
        if (distr.nonEmpty) {
          val tot = distr.map(_._2).sum.toDouble
          var bi = if (distr.head._1 > 100) distr.head._1 else 0L
          var di = 0
          while (di <= distr.length) {
            val count =
              if (di == distr.length) { di += 1; 0L }
              else if (distr(di)._1 == bi) { val c = distr(di)._2; di += 1; c }
              else 0L
            val dots = "@" * math.round(40.0 * count / tot).toInt
            val min = minOf(bi)
            val label = if (asDate) iso(min) else min.toString
            val w = if (asDate) 24 else 16
            sb.append(if (asDate) "  " else "")
              .append(" " * math.max(0, w - label.length)).append(label)
              .append(" |").append(dots.padTo(40, ' '))
              .append(' ').append(count).append('\n')
            bi += 1
          }
        }
      }
    sb.toString
  }

  /**
   * `--gnuplot` output (reference: bin/dn dnOutputGnuplot): a runnable
   * gnuplot script with the (single-breakdown, value) rows inlined.
   */
  def gnuplot(df: DataFrame, breakdowns: Seq[FieldSpec]): String = {
    if (breakdowns.length != 1)
      throw new GraftException(
        "--gnuplot can only be used with exactly one breakdown")
    val x = breakdowns.head.name
    val sb = new StringBuilder
    sb.append("#\n# Run this through gnuplot(1):\n")
    sb.append("#     gnuplot < this_file > graph.png\n#\n")
    sb.append("set terminal png\n")
    sb.append(s"""set xlabel "$x"\n""")
    sb.append("set ylabel \"count\"\n")
    sb.append("set nokey\n")
    sb.append("plot '-' using 1:2 with linespoints\n")
    // linespoints connects points in emission order — sort by the x
    // column or the plot zigzags with whatever partition order collect
    // happened to return
    // backtick-quoted: a dotted breakdown name is a flat output column
    df.orderBy(org.apache.spark.sql.functions.col(s"`$x`"))
      .collect().foreach { r =>
      sb.append(s"${r.getAs[Any](x)} ${r.getAs[Any]("value")}\n")
    }
    sb.append("e\n")
    sb.toString
  }
}

package graft

import org.apache.spark.sql.DataFrame

/**
 * Display-only rendering of scan results, mirroring the reference's
 * output modes (lib/format-json.js): a DTrace-style ASCII histogram for
 * a trailing bucketized column. Driver-side by design — it formats the
 * (small, already-aggregated) result of a scan, never raw data.
 */
object Format {

  /**
   * Render `(…groupCols, bucket, value)` rows as per-group histograms:
   *
   *            value  ------------- Distribution ------------- count
   *                1 |@@@@                                     7
   *
   * Buckets are shown in order with the @-bar scaled to the group's max.
   */
  def histogram(df: DataFrame, width: Int = 40): String = {
    val cols = df.columns
    require(cols.length >= 2, "need at least (bucket, value) columns")
    val groupCols = cols.dropRight(2)
    val rows = df.collect()
    val sb = new StringBuilder
    val grouped = rows.groupBy(r => groupCols.map(c => r.getAs[Any](c)).toSeq)
    grouped.toSeq.sortBy(_._1.mkString(",")).foreach { case (key, rs) =>
      if (groupCols.nonEmpty)
        sb.append(groupCols.zip(key).map { case (c, v) => s"$c=$v" }
          .mkString("", ", ", "\n"))
      val maxCount = rs.map(r => r.getLong(cols.length - 1)).max.toDouble
      val header = "Distribution"
      val dashes = "-" * ((width - header.length - 2) / 2)
      sb.append(f"${cols(cols.length - 2)}%16s  $dashes $header $dashes count\n")
      rs.sortBy(r => r.getLong(cols.length - 2)).foreach { r =>
        val count = r.getLong(cols.length - 1)
        val bar = "@" * math.round(count / maxCount * width).toInt
        val bucket = "%16d".format(r.getLong(cols.length - 2))
        sb.append(s"$bucket |${bar.padTo(width, ' ')} $count\n")
      }
      sb.append("\n")
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

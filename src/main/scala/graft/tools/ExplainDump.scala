package graft.tools

import org.apache.spark.sql.SparkSession

/**
 * Dump `.explain("formatted")` for registry queries to files — the
 * round-19 optimization evidence (`plans/r19/<query>_{before,after}.txt`).
 *
 * Usage: runMain graft.tools.ExplainDump <sfDir> <outDir> <suffix> [names]
 *   names = comma-separated registry names; omitted/"all" = every query.
 *
 * The dump is the PRE-execution plan (AdaptiveSparkPlan isFinalPlan=false
 * where AQE applies) — the shape evidence (Exchange count, join strategy,
 * PushedFilters/ReadSchema, codegen spans) the optimization round is
 * judged on. Queries whose construction itself executes jobs (store
 * builds, eager counts) pay that cost here; that is fine — the tool is
 * evidence capture, never timed.
 */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = if (args.length > 2) args(2) else "before"
    val names: Option[Set[String]] =
      if (args.length > 3 && args(3) != "all")
        Some(args(3).split(",").map(_.trim).toSet)
      else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "/tmp/graft-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    graft.Registry.all.filter(q => names.forall(_(q.name))).foreach { q =>
      try {
        val df = q.run(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, s"${q.name}_$suffix.txt"),
          txt.getBytes("UTF-8"))
        System.err.println(s"[explain] ${q.name} ok")
      } catch { case e: Throwable =>
        System.err.println(s"[explain] ${q.name} FAILED: $e")
      }
    }
    spark.stop()
  }
}

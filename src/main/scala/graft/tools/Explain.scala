package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/**
 * Plan-review tool: `runMain graft.tools.Explain <sfDir> <query>[,query…]`
 * prints each query's formatted physical plan and wall time — the
 * feedback loop for shuffle/pushdown/codegen review (SURVEY.md §7 step 7).
 */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val names: Seq[String] =
      if (args.length > 1) args(1).split(",").toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // external bucketed tables keep data under /tmp; the catalog
      // default location must not litter the repo cwd
      .config("spark.sql.warehouse.dir", "/tmp/graft-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      println(s"\n========== $name ==========")
      df.explain("formatted")
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2fs")
      // post-execution adaptive plan: shows what AQE actually ran
      // (ReusedExchange/ReusedQueryStage, join strategy changes)
      println("---- executed (AQE final) ----")
      println(df.queryExecution.executedPlan.toString.linesIterator
        .take(40).mkString("\n"))
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan audit aid: print the executed plan of one registered
  * query on a given sf dir (`runMain graft.tools.PlanDump <name> <dir>`). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(name, dir) = args
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(graft.SparkEntry.queries(name)(spark, dir)
      .queryExecution.executedPlan.toString)
    spark.stop()
  }
}

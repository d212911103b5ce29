package graft.tools

import org.apache.spark.sql.SparkSession

/** Verify a comma-separated subset of registry queries (local iteration
  * aid — the driver always runs the full graft.Verify). */
object VerifySubset {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, names) = args
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
    val failed = graft.Verify.run(spark, sfDir, outDir,
      Some(names.split(",").map(_.trim).toSet))
    if (failed.nonEmpty) {
      System.err.println(s"[verify-subset] FAILED: ${failed.mkString(",")}")
      sys.exit(1)
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-19 measurement aid: per-job wall times + stage/task counts for
  * one operator run. Evidence capture only, never scored. */
object ProfileJobs {
  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val op = if (args.length > 1) args(1) else "corpus_clean"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "1000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "/tmp/graft-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.Registry.queries(op)
    // warm twice
    (1 to 2).foreach { _ => try noop(fn(spark, dir)) catch { case _: Throwable => () } }

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    var stageTasks = 0L
    var stages = 0
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = js.stageInfos.lastOption.map(si =>
          si.name.take(60) + " @ " + si.details.linesIterator
            .find(l => l.contains("graft") && !l.contains("tools."))
            .getOrElse("").trim.take(80)).getOrElse("")
        starts.put(js.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val (t0, desc) = starts.getOrDefault(je.jobId, (0L, "?"))
        lines.add(f"[job] ${je.jobId}%4d ${(System.nanoTime() - t0) / 1e6}%8.1fms  $desc")
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages += 1; stageTasks += sc.stageInfo.numTasks
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    noop(fn(spark, dir))
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    spark.sparkContext.removeSparkListener(listener)
    lines.forEach(l => println(l))
    println(f"[prof] $op wall=$wall%.3fs jobs=${lines.size} stages=$stages tasks=$stageTasks")
    spark.stop()
  }
}

package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import java.util.concurrent.atomic.AtomicLong
object Profile1 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val taskTime = new AtomicLong(0); val gcTime = new AtomicLong(0); val stageTime = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        if (te.taskMetrics != null) { taskTime.addAndGet(te.taskMetrics.executorRunTime); gcTime.addAndGet(te.taskMetrics.jvmGCTime) }
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        stageTime.addAndGet(si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L))
      }
    })
    val sf = "/root/testdata/sf0.1"
    def run(name: String): Unit = SparkEntry.queries(name)(spark, sf).write.format("noop").mode("overwrite").save()
    val names = SparkEntry.queries.keys.toSeq.sorted
    try run(names.head) catch { case _: Throwable => () }
    names.foreach { name =>
      taskTime.set(0); gcTime.set(0); stageTime.set(0)
      val t0 = System.nanoTime()
      try run(name) catch { case e: Throwable => println(s"FAIL $name ${e.getMessage.take(80)}") }
      val wall = (System.nanoTime()-t0)/1e9
      println(f"Q $name%-26s wall=$wall%7.2f stage=${stageTime.get/1000.0}%7.2f task=${taskTime.get/1000.0}%8.2f gc=${gcTime.get/1000.0}%6.2f")
    }
    spark.stop()
  }
}

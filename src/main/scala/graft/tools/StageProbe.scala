package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Runs one registry query with a stage listener and prints per-stage wall
  * time, task count and task-time sum (diagnostic only).
  * Usage: runMain graft.tools.StageProbe <sfDir> <name> [reps] */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0); val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", math.max(cpus * 4, 16).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm
    for (_ <- 1 until reps) graft.Queries.all(name)(spark, dir).count()

    case class St(stageId: Int, nameStr: String, wallMs: Long, tasks: Int,
                  taskMs: Long, cpuMs: Long, gcMs: Long,
                  shufRead: Long, shufWrite: Long)
    val stages = scala.collection.mutable.ArrayBuffer.empty[St]
    var jobs = 0
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = synchronized { jobs += 1 }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = synchronized {
        val i = s.stageInfo
        val wall = (for (a <- i.completionTime; b <- i.submissionTime) yield a - b).getOrElse(-1L)
        stages += St(i.stageId, i.name.takeWhile(_ != '\n'), wall, i.numTasks,
          i.taskMetrics.executorRunTime,
          i.taskMetrics.executorCpuTime / 1000000L,
          i.taskMetrics.jvmGCTime,
          i.taskMetrics.shuffleReadMetrics.totalBytesRead,
          i.taskMetrics.shuffleWriteMetrics.bytesWritten)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    @volatile var finalPlan = ""
    val qeListener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             durationNs: Long): Unit =
        synchronized { finalPlan = qe.executedPlan.toString }
      override def onFailure(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(qeListener)
    val t0 = System.nanoTime()
    val rows = graft.Queries.all(name)(spark, dir).count()
    val total = (System.nanoTime() - t0) / 1e9
    spark.listenerManager.unregister(qeListener)
    Thread.sleep(1500) // let the listener bus drain
    spark.sparkContext.removeSparkListener(listener)
    println(f"[stageprobe] $name total $total%.2f s rows=$rows jobs=$jobs stages=${stages.size}")
    val sumWall = stages.map(_.wallMs).sum
    println(f"[stageprobe] sum(stage wall) = ${sumWall / 1000.0}%.2f s (gaps = driver/planning)")
    stages.sortBy(-_.wallMs).take(25).foreach { s =>
      println(f"[stageprobe]   stage ${s.stageId}%4d ${s.wallMs}%6d ms tasks=${s.tasks}%4d taskSum=${s.taskMs}%6d ms cpu=${s.cpuMs}%6d ms gc=${s.gcMs}%5d ms sr=${s.shufRead / 1024}%8d KB sw=${s.shufWrite / 1024}%8d KB  ${s.nameStr.take(60)}")
    }
    if (sys.env.contains("STAGEPROBE_PLAN")) {
      println("[stageprobe] ===== final executed plan =====")
      finalPlan.linesIterator.foreach(l => println(s"[stageprobe] $l"))
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerJobStart, SparkListenerJobEnd}
import org.apache.spark.sql.SparkSession

/** Dev diagnostic (round 7): run one graph loop query with a stage listener
  * and print per-stage task counts / runtimes, to attribute per-round cost
  * (scheduling vs shuffle vs compute).
  *
  * Usage: runMain graft.tools.GraphLoopProbe q_components_dist
  */
object GraphLoopProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", 64L * 1024 * 1024)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Int, Long, Long, String)]()
    val taskRows = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long, Long, Long)]()
    var jobs = 0
    var jobMs = 0L
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L))
        val tm = si.taskMetrics
        val rdds = si.rddInfos.map(r => s"${r.id}:${r.name}").mkString(",")
        stages.add((si.stageId, si.numTasks, ms, tm.executorRunTime,
          f"gc=${tm.jvmGCTime}ms deser=${tm.executorDeserializeTime}ms cpu=${tm.executorCpuTime / 1000000}ms " +
            f"shR=${tm.shuffleReadMetrics.totalBytesRead} shW=${tm.shuffleWriteMetrics.bytesWritten} rdds=[$rdds]"))
      }
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobStart.put(js.jobId, js.time); jobs += 1
      }
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) taskRows.add((te.stageId, te.taskInfo.duration,
          m.executorCpuTime / 1000000, m.executorDeserializeTime,
          m.executorRunTime))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val s = jobStart.getOrDefault(je.jobId, je.time)
        jobMs += (je.time - s)
      }
    })
    for (name <- args) {
      // warm pass first (cache build), probe the second
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      stages.clear(); jobs = 0; jobMs = 0
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let the listener bus drain
      val ss = stages.toArray(Array.empty[(Int, Int, Long, Long, String)])
      val totTasks = ss.map(_._2).sum
      val totStageMs = ss.map(_._3).sum
      val totRunMs = ss.map(_._4).sum
      println(f"$name: wall=$wall%.2fs jobs=$jobs jobMs=$jobMs stages=${ss.length} tasks=$totTasks stageWallMs=$totStageMs executorRunMs=$totRunMs")
      ss.sortBy(-_._4).take(10).foreach { case (id, nt, ms, rms, nm) =>
        println(s"  id=$id tasks=$nt wall=${ms}ms run=${rms}ms  $nm")
      }
      val tr = taskRows.toArray(Array.empty[(Int, Long, Long, Long, Long)])
      for ((sid, _, _, _, _) <- ss.sortBy(-_._4).take(3)) {
        val ts = tr.filter(_._1 == sid).sortBy(-_._3)
        println(s"  stage $sid task cpu(ms) top8: " +
          ts.take(8).map(t => s"dur=${t._2} cpu=${t._3} run=${t._5}").mkString(" | "))
      }
      taskRows.clear()
    }
    spark.stop()
  }
}

package graft.tools

import graft.{Sessions, SparkEntry}
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import scala.collection.mutable

/** Per-stage profile of named gated queries under the Bench protocol
  * (warm-up run, then a timed `noop` sink): for every stage of the timed
  * run prints task count, executor run/CPU time, shuffle read/write bytes,
  * spill, and GC — the guide-§1 "where is the time actually going" read
  * (Stages tab + task metrics) for a UI-less box. Diagnosis tool, not
  * gated surface.
  *
  * Usage: runMain graft.tools.QueryProfile <sfDir> q_a[,q_b,...] [--cold]
  */
object QueryProfile {

  final case class StageRow(id: Int, name: String, tasks: Int,
                            runMs: Long, cpuMs: Long, gcMs: Long,
                            shufReadMB: Double, shufWriteMB: Double,
                            inputMB: Double, spillMB: Double,
                            wallMs: Long)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.lift(1).map(_.split(',').toSeq)
      .getOrElse(sys.error("usage: QueryProfile <sfDir> q_a[,q_b,...]"))
    val cold = args.contains("--cold")
    val spark = Sessions.local("graft-profile")

    val rows = mutable.ArrayBuffer.empty[StageRow]
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val tm = si.taskMetrics
        val wall = (for {
          a <- si.completionTime; b <- si.submissionTime
        } yield a - b).getOrElse(-1L)
        rows += StageRow(si.stageId, si.name.takeWhile(_ != '\n').take(80),
          si.numTasks, tm.executorRunTime, tm.executorCpuTime / 1000000,
          tm.jvmGCTime,
          tm.shuffleReadMetrics.totalBytesRead / 1048576.0,
          tm.shuffleWriteMetrics.bytesWritten / 1048576.0,
          tm.inputMetrics.bytesRead / 1048576.0,
          tm.memoryBytesSpilled / 1048576.0,
          wall)
      }
    }

    // In-process stack sampler (--sample): every 25 ms, histogram the top
    // interesting frame of every executor worker thread during the timed
    // run — the jstack read (guide §7.3) for a box where the attach
    // mechanism is unavailable. "Interesting" = first frame not in the
    // JDK's thread/park plumbing, plus the thread state and lock owner.
    val sample = args.contains("--sample")
    val frameHist = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var sampling = false
    val sampler = new Thread(() => {
      val tmx = java.lang.management.ManagementFactory.getThreadMXBean
      while (true) {
        if (sampling) {
          val infos = tmx.getThreadInfo(tmx.getAllThreadIds, 12)
          infos.filter(i => i != null &&
              i.getThreadName.startsWith("Executor task launch")).foreach { i =>
            val st = i.getStackTrace
            val top = st.find(f =>
              !f.getClassName.startsWith("java.lang.Thread") &&
              !f.getClassName.startsWith("jdk.internal.misc.Unsafe") &&
              !f.getClassName.startsWith("java.util.concurrent.locks"))
              .map(f => s"${f.getClassName}.${f.getMethodName}")
              .getOrElse("<empty>")
            val lock = Option(i.getLockName).map(l =>
              " LOCK:" + l.takeWhile(_ != '@')).getOrElse("")
            // the first non-JDK/non-Spark frame names the call SITE
            val site = st.find(f => f.getClassName.startsWith("graft."))
              .map(f => s" <= ${f.getClassName.substring(6)}.${f.getMethodName}:${f.getLineNumber}")
              .getOrElse("")
            val key = s"${i.getThreadState}: $top$lock$site"
            frameHist.merge(key, 1, (a, b) => a + b)
          }
        }
        Thread.sleep(25)
      }
    })
    sampler.setDaemon(true)
    if (sample) sampler.start()

    names.foreach { n =>
      val fn = SparkEntry.queries.getOrElse(n,
        sys.error(s"unknown query: $n (see SparkEntry.queries)"))
      def run(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      if (!cold) run() // warm-up, unlistened
      rows.clear()
      frameHist.clear()
      spark.sparkContext.addSparkListener(listener)
      spark.sparkContext.setJobDescription(s"profile: $n")
      sampling = sample
      val sec = run()
      sampling = false
      spark.sparkContext.removeSparkListener(listener)
      // listener bus is async; drain before reading
      Thread.sleep(300)
      println(f"\n════ $n: ${sec}%.3f s (timed run, ${rows.size} stages) ════")
      println(f"${"stage"}%5s ${"tasks"}%5s ${"wall_s"}%8s ${"run_s"}%8s " +
        f"${"cpu_s"}%8s ${"gc_s"}%6s ${"shR_MB"}%8s ${"shW_MB"}%8s " +
        f"${"in_MB"}%8s ${"spill"}%6s  name")
      rows.sortBy(-_.runMs).foreach { r =>
        println(f"${r.id}%5d ${r.tasks}%5d ${r.wallMs / 1000.0}%8.2f " +
          f"${r.runMs / 1000.0}%8.2f ${r.cpuMs / 1000.0}%8.2f " +
          f"${r.gcMs / 1000.0}%6.2f ${r.shufReadMB}%8.2f " +
          f"${r.shufWriteMB}%8.2f ${r.inputMB}%8.2f ${r.spillMB}%6.1f  ${r.name}")
      }
      val totRun = rows.map(_.runMs).sum / 1000.0
      val totCpu = rows.map(_.cpuMs).sum / 1000.0
      println(f"TOTAL run ${totRun}%.2f s cpu ${totCpu}%.2f s across " +
        f"${rows.map(_.tasks).sum} tasks; wall ${sec}%.3f s")
      if (sample) {
        import scala.jdk.CollectionConverters._
        println("-- sampled worker frames (25 ms ticks) --")
        frameHist.asScala.toSeq.sortBy(-_._2.intValue).take(14).foreach {
          case (k, c) => println(f"$c%6d  $k")
        }
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}

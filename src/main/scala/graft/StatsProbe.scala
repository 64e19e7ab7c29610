package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Scratch measurement probe (dev tooling, not part of the driver
  * contract): per-query phase breakdown — DataFrame build time, physical
  * planning time, execution wall time — plus scheduler-level counts
  * (jobs, stages, tasks, summed executor task time) from a listener.
  *
  * Separates the two optimization regimes the bench mixes together:
  * driver-side constant (plan/codegen/job launch — dominates the ~0.7 s
  * sub-second tail at sf0.1) vs genuine executor compute (the heavy
  * iterative/quadratic tier). SPARK_GRAFT_QUERIES selects queries;
  * SPARK_GRAFT_CONF adds A/B session confs (PerfProbe convention).
  */
object StatsProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';').map(_.trim)
      .filter(_.contains('=')).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        builder.config(k, v)
      })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger; val stages = new AtomicInteger
    val tasks = new AtomicInteger; val taskMs = new AtomicLong
    val dumpStages = sys.env.get("SPARK_GRAFT_STAGES").contains("1")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        if (dumpStages) {
          val si = s.stageInfo
          val m = si.taskMetrics
          println(f"[stage] id=${si.stageId} tasks=${si.numTasks} " +
            f"run=${m.executorRunTime / 1e3}%.2fs gc=${m.jvmGCTime / 1e3}%.2fs " +
            f"cpu=${m.executorCpuTime / 1e9}%.2fs " +
            f"sr=${m.shuffleReadMetrics.totalBytesRead / 1e6}%.1fMB " +
            f"sw=${m.shuffleWriteMetrics.bytesWritten / 1e6}%.1fMB " +
            f"${si.name.takeWhile(_ != '\n').take(90)}")
        }
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskMetrics != null) taskMs.addAndGet(t.taskMetrics.executorRunTime)
      }
    })
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val namesEnv = sys.env.getOrElse("SPARK_GRAFT_QUERIES", "b3_stats")
    val names =
      if (namesEnv == "ALL") SparkEntry.queries.keys.toSeq.sorted
      else namesEnv.split(",").toSeq.map(_.trim).filter(_.nonEmpty)
    names.filterNot(SparkEntry.queries.contains) match {
      case Seq() =>
      case bad => sys.error(s"unknown queries: ${bad.mkString(", ")}")
    }
    val passes = if (namesEnv == "ALL") Seq(1) else Seq(1, 2)
    println("[stats] name pass build_s plan_s exec_s wall_s jobs stages tasks task_time_s")
    for (n <- names; pass <- passes) {
      jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0)
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(n)(spark, dir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan // force analysis + optimization + planning
      val t2 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t3 = System.nanoTime()
      org.apache.spark.sql.GraftShims.waitListenerBus(spark, 10000)
      println(f"[stats] $n $pass ${(t1 - t0) / 1e9}%.2f ${(t2 - t1) / 1e9}%.2f " +
        f"${(t3 - t2) / 1e9}%.2f ${(t3 - t0) / 1e9}%.2f " +
        f"${jobs.get} ${stages.get} ${tasks.get} ${taskMs.get / 1e3}%.2f")
    }
    spark.stop()
  }
}

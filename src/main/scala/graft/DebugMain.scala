package graft

import org.apache.spark.sql.SparkSession

/** Scratch main for timing/debugging individual catalog queries:
  * `runMain graft.DebugMain <sfDir> <queryName>...` */
object DebugMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = args.drop(1)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // GRAFT_CONF="k1=v1,k2=v2" → session confs (A/B toggles for
    // spark.graft.* knobs without recompiling)
    sys.env.get("GRAFT_CONF").foreach { s =>
      s.split(',').filter(_.contains('=')).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k.trim, v.trim)
      }
    }
    val explain = sys.env.contains("GRAFT_EXPLAIN")
    // GRAFT_JOBS: per-query Spark job/task counts — the per-gate "job
    // floor" (driver round-trips) is what dominates sub-second catalog
    // entries, so optimization work needs it visible
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        val jobMeta =
          new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val _ = jobs.incrementAndGet()
          if (sys.env.contains("GRAFT_JOBS")) {
            val p = Option(j.properties)
            def g(k: String) = p.flatMap(x => Option(x.getProperty(k)))
            jobMeta.put(
              j.jobId,
              (System.nanoTime(),
                s"${g("spark.job.description").getOrElse("-")}" +
                  s" scope=${g("spark.rdd.scope").getOrElse("-").take(60)}"))
          }
        }
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          Option(jobMeta.remove(j.jobId)).foreach { case (t0, desc) =>
            System.err.println(
              f"[job ${j.jobId}] ${(System.nanoTime() - t0) / 1e6}%.0fms $desc")
          }
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val _ = tasks.incrementAndGet()
        }
      })
    names.foreach { n =>
      val t0 = System.nanoTime()
      val (j0, k0) = (jobs.get(), tasks.get())
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        if (explain) {
          println(s"===== $n =====")
          df.explain("formatted")
        } else if (sys.env.contains("GRAFT_SHOW")) {
          println(s"===== $n =====")
          println(df.schema.simpleString)
          df.show(100, truncate = false)
        } else {
          val tPlan = (System.nanoTime() - t0) / 1e9
          val rows = df.count()
          val tAll = (System.nanoTime() - t0) / 1e9
          Thread.sleep(150) // let the listener bus drain before reading
          println(
            f"[debug] $n rows=$rows secs=$tAll%.2f (build=$tPlan%.2f exec=${tAll - tPlan}%.2f) " +
              f"jobs=${jobs.get - j0}%d tasks=${tasks.get - k0}%d")
        }
      } catch {
        case e: Throwable =>
          println(s"[debug] $n FAILED after ${(System.nanoTime() - t0) / 1e9}: $e")
          e.printStackTrace()
      }
    }
    spark.stop()
  }
}

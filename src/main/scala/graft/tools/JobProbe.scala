package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-JOB time attribution for one query: runs the named queries through
  * the noop sink with a listener printing every Spark job's duration and
  * call site — the "which action inside this 5 s query costs what"
  * instrument the optimization rounds need (a wall-clock total cannot
  * separate a fit artifact's build cost from the probe that uses it).
  * `runMain graft.tools.JobProbe <query> [query ...]`; SPARK_GRAFT_SF_DIR
  * picks the corpus (default sf0.1), SPARK_GRAFT_CLEAR_FITS=1 clears the
  * session memos before each run (the Bench suite's per-iteration
  * discipline).
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val site = Option(j.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        starts.put(j.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(starts.remove(j.jobId)).foreach { case (t0, site) =>
          println(f"[job] ${j.jobId}%4d ${(System.nanoTime() - t0) / 1e9}%7.3f s  $site")
        }
      }
    })
    graft.SparkEntry.entry(spark).count() // warm + nanos conf
    val clearFits = sys.env.get("SPARK_GRAFT_CLEAR_FITS").contains("1")
    args.foreach { name =>
      (1 to 2).foreach { i =>
        if (clearFits) graft.ops.SharedFits.clear(spark)
        System.gc()
        println(s"===== $name run$i =====")
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
        println(f"[total] $name run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}

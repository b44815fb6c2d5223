package graft.tools

import org.apache.spark.sql.functions._

/** Throwaway diagnostic main for the r16 optimization round: prints the
  * physical plan and per-stage wall time of one hier Lloyd iteration at
  * the maint_recluster 100x geometry. Not referenced by any query path. */
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.builder("local[32]", 32).getOrCreate()
    import spark.implicits._
    val dim = 16
    val v = spark.range(0L, 100000L).select(col("id").as("vec_id"))
      .withColumn("e", expr(
        s"transform(sequence(0, ${dim - 1}), j -> cast((pmod(hash(vec_id * $dim + j), 2001) - 1000) / 1000.0 as double))"))
      .withColumn("n", sqrt(expr("graft_dot(e, e)")))
      .localCheckpoint()
    val nv = v.count()
    // one retrain, timed per phase by the MaintStages env hook
    val t0 = System.nanoTime()
    val cb = graft.ml.VectorOps.kmeansCentroidsHier(v, 50, 2250, vCount = nv)
    println(s"[probe] retrain ${(System.nanoTime() - t0) / 1e9}")
    cb.explain("formatted")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val stages = new java.util.concurrent.atomic.AtomicInteger(0)
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); stages.addAndGet(j.stageIds.size)
          jobStart.put(j.jobId, j.time): Unit
        }
        override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val dt = j.time - jobStart.getOrDefault(j.jobId, j.time)
          println(f"[probe-job] id=${j.jobId} ms=$dt")
        }
        override def onStageSubmitted(s: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit =
          println(s"[probe-stage] ${s.stageInfo.stageId} tasks=${s.stageInfo.numTasks} name=${s.stageInfo.name.take(80)}")
      })
    val t1 = System.nanoTime()
    val cb2 = graft.ml.VectorOps.kmeansCentroidsHier(v, 50, 2250, vCount = nv)
    println(s"[probe] retrain2 ${(System.nanoTime() - t1) / 1e9} jobs=${jobs.get} stages=${stages.get}")
    // one iteration's inner plan, final AQE form: routing + hier assign +
    // the refine's explode/agg shape over the vec_id-prepartitioned train
    val train = v.repartition(col("vec_id")).localCheckpoint()
    val (m, ch) = graft.ml.VectorOps.ivfHierRouting(
      cb2.select(col("centroid_id"), col("ce"), col("cn")), 2250)
    val assigned = graft.ml.VectorOps.ivfAssignHierRoutedFull(m, ch,
      train.select(col("vec_id"), col("e"), col("n")))
    val refined = assigned
      .select(col("centroid_id"), posexplode(col("e")).as(Seq("pos", "x")))
      .groupBy(col("centroid_id"), col("pos"))
      .agg((sum(round(col("x") * lit(math.pow(2, 38))).cast("long"))
        .cast("double") / lit(math.pow(2, 38)) /
        count(lit(1)).cast("double")).as("m"))
      .groupBy(col("centroid_id"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, m))), s -> s.m)").as("ce"))
    val t2 = System.nanoTime()
    val n2 = refined.collect().length
    println(s"[probe] one_iter ${(System.nanoTime() - t2) / 1e9} rows=$n2")
    println(refined.queryExecution.executedPlan.toString.take(14000))
    spark.stop()
  }
}

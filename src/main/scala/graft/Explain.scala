package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan and wall time of one or
  * more catalog queries. Usage:
  *   runMain graft.Explain <sfDir> <queryName> [queryName ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.catalog.filter(q => names.isEmpty || names(q.name)).foreach { q =>
      val df = q.fn(spark, sfDir)
      println(s"==== ${q.name} ====")
      df.explain("formatted")
      // time a FRESH construction + write: eager work inside the query fn
      // (checkpoints, iterative convergence loops) is part of its cost and
      // is what Bench measures
      val t0 = System.nanoTime()
      q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"==== ${q.name} took ${(System.nanoTime() - t0) / 1e9}%.2f s ====")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}

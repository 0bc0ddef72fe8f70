package graft

import graft.ops.Materialize.ForkOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Dedup
import graft.queries.CurationDedupQueries

/** Per-stage profiler for the sf1 reuse twins (round-14 verdict item 2):
  * the r12/r13 driver channels measured the bloom twin INVERTED against
  * the plain twin (117.2 vs 71.3 s where every idle artifact has bloom
  * 1.3–1.5× FASTER), and the injected -Xmx100g pathology reproduces the
  * inversion (77.8 vs 38.5 s this round). The differential question:
  * WHICH stage of the bloom path is the heap-pathology-sensitive one —
  * the history build (shared by both twins), the driver-side
  * per-partition bitset build + merge, or the 6-batch screen loop whose
  * probe expression carries the serialized filter into every task?
  *
  * Usage: TwinProfile <sfDir> <bloom|plain>
  *
  * Prints one JSON line per stage: wall seconds plus THIS PROCESS's
  * user/sys CPU cores over the stage window (the same /proc/self/stat
  * counters the bench's sys arm reads) — run it once under -Xmx8g and
  * once under -Xmx100g and diff the sys columns. Fresh JVM per run so
  * the heap is untouched when the first stage starts (the pathology is
  * first-touch; a warmed heap hides it — measured: the 100g plain twin
  * ran nearly clean because the sf1 section's earlier queries had
  * already touched its pages).
  */
object TwinProfile {

  private def selfCpu(): (Long, Long) = {
    val src = scala.io.Source.fromFile("/proc/self/stat")
    val line = try src.getLines().next() finally src.close()
    Bench.parseSelfUtimeStime(line)
  }

  private def fmt(d: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))

  private def stage[A](name: String)(body: => A): A = {
    val (u0, s0) = selfCpu()
    val t0 = System.nanoTime()
    val res = body
    val wall = (System.nanoTime() - t0) / 1e9
    val (u1, s1) = selfCpu()
    println(s"""{"stage":"$name","wall_s":${fmt(wall)},""" +
      s""""user_cores":${fmt((u1 - u0) / 100.0 / wall)},""" +
      s""""sys_cores":${fmt((s1 - s0) / 100.0 / wall)},""" +
      s""""user_s":${fmt((u1 - u0) / 100.0)},"sys_s":${fmt((s1 - s0) / 100.0)}}""")
    res
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: TwinProfile <sfDir> <bloom|plain>")
    val sfDir = args(0)
    val mode = args(1)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(s"""{"mode":"$mode","sf_dir":"$sfDir",""" +
      s""""heap_max_mb":${Runtime.getRuntime.maxMemory / 1048576}}""")
    val d = stage("load")(
      { val t = Tables.documents(spark, sfDir); t.count(); t })
    val history = stage("history_build")(
      CurationDedupQueries.reuseHistory(d).lineageCut())
    val screened = mode match {
      case "bloom" =>
        val bloom = stage("bloom_build")(
          Dedup.buildDigestBloom(history, "text",
            expectedItems = 20L * d.count(), fpp = 1e-8))
        stage("screen_6_batches") {
          (0 until 6).map { b =>
            stage(s"batch_$b")(
              Dedup.exactDedupIncrementalBloom(
                CurationDedupQueries.reuseBatch(d, b), history,
                "text", "doc_id", bloom)
                .select(lit(b).as("batch"), col("doc_id"))
                .lineageCut())
          }.reduce(_ unionByName _)
        }
      case _ =>
        stage("screen_6_batches") {
          (0 until 6).map { b =>
            stage(s"batch_$b")(
              Dedup.exactDedupIncremental(
                CurationDedupQueries.reuseBatch(d, b), history,
                "text", "doc_id")
                .select(lit(b).as("batch"), col("doc_id"))
                .lineageCut())
          }.reduce(_ unionByName _)
        }
    }
    stage("final_union_count")(screened.count())
    spark.stop()
  }
}

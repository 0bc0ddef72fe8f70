package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{AggQueries, CoreQueries, CurationQueries, Q, ValidationQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps one entry per implemented operator family from
  * SURVEY.md §2 (+ the curation extensions); `oracleSql` carries the
  * DuckDB-equivalent SQL for each hash-compared entry.
  */
object SparkEntry {

  val catalog: Seq[Q] =
    CoreQueries.all ++ AggQueries.all ++ ValidationQueries.all ++ CurationQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The report's catch-composition analytics (A4+W1) — a 5-table join,
    * aggregate, per-group top-k.
    */
  def entry(spark: SparkSession): DataFrame =
    AggQueries.a4TopSpecies.fn(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map(q => q.name -> q.fn).toMap

  def oracleSql: Map[String, String] =
    catalog.flatMap(q => q.oracle.map(o => q.name -> o.stripMargin)).toMap
}

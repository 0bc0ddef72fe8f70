package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One correctness-gate entry: a Spark query over a testdata dir plus an
  * optional DuckDB-equivalent oracle SQL (omitted → the driver records a
  * weaker rows-only check; SURVEY.md §5).
  *
  * Contract (driver): output column NAMES must match the oracle exactly
  * (the compare sorts columns by name before hashing), and row order must
  * be deterministic — every query ends in an explicit ORDER BY on both
  * sides. Floating-point discipline: scalar +,-,*,/ are IEEE-deterministic
  * cross-engine and are emitted at full precision; order-sensitive double
  * reductions go through exact decimal casts or integer-valued data;
  * results of transcendental chains (log/exp) are rounded to 9 digits.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

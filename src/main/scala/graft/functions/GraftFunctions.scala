package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Literal}
import org.apache.spark.sql.types.DoubleType

import graft.ops.Bounds

/** SQL surface for the custom Catalyst expressions/aggregates — after
  * [[register]], `spark.sql` can call them directly:
  *
  * {{{
  * SELECT l_returnflag, locscaleb(l_quantity, 2.5, true) AS b
  * FROM lineitem GROUP BY l_returnflag
  * SELECT cosine_sim(a.embedding, b.embedding) FROM ...
  * SELECT minhash_sig(shingles, 128), simhash64(tokens), hyperplane_bucket(vec, 8)
  * }}}
  */
object GraftFunctions {

  private[functions] def intLit(e: Expression, name: String = "arg"): Int = intArg(e, name)
  private[functions] def doubleLit(e: Expression, name: String = "arg"): Double = doubleArg(e, name)
  private[functions] def boolLit(e: Expression, name: String = "arg"): Boolean = boolArg(e, name)

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$name expects an integer literal, got $other")
  }

  private def doubleArg(e: Expression, name: String): Double = e match {
    case Literal(v: Double, _) => v
    case Literal(v: Int, _) => v.toDouble
    case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
    case Literal(v: java.math.BigDecimal, _) => v.doubleValue
    case other => throw new IllegalArgumentException(
      s"$name expects a numeric literal, got $other")
  }

  private def boolArg(e: Expression, name: String): Boolean = e match {
    case Literal(v: Boolean, _) => v
    case other => throw new IllegalArgumentException(
      s"$name expects a boolean literal, got $other")
  }

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("cosine_sim",
      es => VectorExprs.CosineSim(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("hyperplane_bucket",
      es => VectorExprs.HyperplaneBucket(es(0), intArg(es(1), "hyperplane_bucket bits")), "scala_udf")
    reg.createOrReplaceTempFunction("minhash_sig",
      es => HashExprs.MinHashSig(es(0), intArg(es(1), "minhash_sig numHashes")), "scala_udf")
    reg.createOrReplaceTempFunction("simhash64",
      es => HashExprs.SimHash64(es(0)), "scala_udf")
    reg.createOrReplaceTempFunction("nfc_normalize",
      es => TextExprs.NfcNormalize(es(0)), "scala_udf")
    reg.createOrReplaceTempFunction("strip_accents",
      es => TextExprs.StripAccents(es(0)), "scala_udf")
    reg.createOrReplaceTempFunction("jaro_winkler",
      es => TextExprs.JaroWinkler(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("porter_stem",
      es => TextExprs.PorterStem(es(0)), "scala_udf")
    reg.createOrReplaceTempFunction("winnow",
      es => TextExprs.Winnow(es(0), intArg(es(1), "winnow k"),
        intArg(es(2), "winnow w")), "scala_udf")
    // aggregate functions register unwrapped — the analyzer adds the
    // AggregateExpression wrapper itself
    reg.createOrReplaceTempFunction("locscaleb",
      es => Bounds.LocScaleBAgg(Cast(es(0), DoubleType),
        doubleArg(es(1), "locscaleb k"), boolArg(es(2), "locscaleb logt")), "scala_udf")
  }
}

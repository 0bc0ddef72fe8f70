package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.DoubleType

import graft.ops.Bounds

/** SparkSessionExtensions entry point — the deployment path for shipping
  * the graft function surface cluster-wide without per-session code:
  *
  *   spark-submit --conf spark.sql.extensions=graft.functions.GraftExtensions …
  *
  * (Equivalent to [[GraftFunctions.register]], which covers the
  * per-session path.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => graft.plans.ScrubPushdown)
    e.injectFunction((FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two double arrays"),
      (es: Seq[Expression]) => VectorExprs.CosineSim(es(0), es(1))))
    e.injectFunction((FunctionIdentifier("hyperplane_bucket"),
      info("hyperplane_bucket", "hyperplane_bucket(v, bits) - deterministic LSH bucket"),
      (es: Seq[Expression]) => VectorExprs.HyperplaneBucket(es(0), GraftFunctions.intLit(es(1)))))
    e.injectFunction((FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(shingles, k) - MinHash signature"),
      (es: Seq[Expression]) => HashExprs.MinHashSig(es(0), GraftFunctions.intLit(es(1)))))
    e.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(tokens) - 64-bit SimHash"),
      (es: Seq[Expression]) => HashExprs.SimHash64(es(0))))
    e.injectFunction((FunctionIdentifier("winnow"),
      info("winnow", "winnow(s, k, w) - winnowing fingerprint selections " +
        "(array of (pos, h)) over a normalized string"),
      (es: Seq[Expression]) => TextExprs.Winnow(es(0),
        GraftFunctions.intLit(es(1)), GraftFunctions.intLit(es(2)))))
    e.injectFunction((FunctionIdentifier("locscaleb"),
      info("locscaleb", "locscaleb(x, k, logt) - LocScaleB robust outlier bounds"),
      (es: Seq[Expression]) => Bounds.LocScaleBAgg(Cast(es(0), DoubleType),
        GraftFunctions.doubleLit(es(1)), GraftFunctions.boolLit(es(2)))))
    e.injectFunction((FunctionIdentifier("nfc_normalize"),
      info("nfc_normalize", "nfc_normalize(s) - Unicode NFC canonicalization"),
      (es: Seq[Expression]) => TextExprs.NfcNormalize(es(0))))
    e.injectFunction((FunctionIdentifier("strip_accents"),
      info("strip_accents", "strip_accents(s) - diacritic fold (NFC∘drop-Mn∘NFD)"),
      (es: Seq[Expression]) => TextExprs.StripAccents(es(0))))
    e.injectFunction((FunctionIdentifier("jaro_winkler"),
      info("jaro_winkler", "jaro_winkler(a, b) - Jaro-Winkler similarity in [0,1]"),
      (es: Seq[Expression]) => TextExprs.JaroWinkler(es(0), es(1))))
    e.injectFunction((FunctionIdentifier("porter_stem"),
      info("porter_stem", "porter_stem(w) - Porter stem of a lowercase word"),
      (es: Seq[Expression]) => TextExprs.PorterStem(es(0))))
  }
}

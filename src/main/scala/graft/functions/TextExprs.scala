package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** String-normalization Catalyst expressions for text-pipeline hygiene.
  *
  * Unicode NFC normalization matters BEFORE any content hashing: "é" as
  * U+00E9 and as U+0065 U+0301 are byte-distinct UTF-8, so exact dedup,
  * hash splits and fingerprints silently treat visually-identical
  * documents as different until composed forms are canonicalized. Spark
  * has no builtin for it; a native expression (with `doGenCode`) keeps
  * the normalization inside whole-stage codegen rather than dropping the
  * surrounding projection out of it the way a Scala UDF would.
  */
object TextExprs {

  /** Runtime helper for both eval modes. Fast path: already-normalized
    * strings (the overwhelming majority in real corpora — `isNormalized`
    * is a scan without allocation) return the INPUT UTF8String, no
    * copies; only strings containing unnormalized sequences pay the
    * String round-trip.
    */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  /** Unicode NFC canonicalization of a string column; null-preserving. */
  case class NfcNormalize(child: Expression) extends UnaryExpression {

    override def dataType: DataType = StringType
    override def prettyName: String = "nfc_normalize"

    override def nullSafeEval(s: Any): Any =
      nfc(s.asInstanceOf[UTF8String])

    // calls the static forwarder graft.functions.TextExprs.nfc — one
    // method call per row, inside the generated projection
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.TextExprs.nfc($c)")

    override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
      copy(child = newChild)
  }

  def nfcNormalize(c: Column): Column =
    GraftShim.column(NfcNormalize(GraftShim.expression(c)))
}

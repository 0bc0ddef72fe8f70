package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
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

  /** Runtime helper for [[StripAccents]]: NFC(drop-Mn(NFD(s))) — the
    * diacritic fold crawl pipelines key on ("café" joins "cafe"; a
    * fuzzy-match candidate index shouldn't fragment on diacritics).
    * Codepoint-for-codepoint what DuckDB's `strip_accents` computes
    * (probed: é/ï/ü/ã/Å/ñ/ç/ē/ά/й strip; non-decomposable ø survives;
    * Hangul/CJK round-trip unchanged — the trailing NFC recompose is
    * load-bearing there: NFD splits syllables into Jamo, which carry no
    * marks and must come back composed). Fast path: a string normalized
    * under BOTH forms with no marks (ASCII, CJK — the overwhelming
    * majority) is a fixpoint of the whole chain and returns the input
    * UTF8String without allocating.
    */
  def stripAccentsEval(s: UTF8String): UTF8String = {
    val str = s.toString
    var i = 0
    var hasMark = false
    while (i < str.length && !hasMark) {
      if (Character.getType(str.charAt(i)) == Character.NON_SPACING_MARK)
        hasMark = true
      i += 1
    }
    if (!hasMark && Normalizer.isNormalized(str, Normalizer.Form.NFD) &&
        Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else {
      val d = Normalizer.normalize(str, Normalizer.Form.NFD)
      val b = new java.lang.StringBuilder(d.length)
      var j = 0
      while (j < d.length) {
        val ch = d.charAt(j)
        if (Character.getType(ch) != Character.NON_SPACING_MARK) b.append(ch)
        j += 1
      }
      UTF8String.fromString(Normalizer.normalize(b.toString, Normalizer.Form.NFC))
    }
  }

  /** Diacritic fold (NFD + drop combining marks); null-preserving. */
  case class StripAccents(child: Expression) extends UnaryExpression {

    override def dataType: DataType = StringType
    override def prettyName: String = "strip_accents"

    override def nullSafeEval(s: Any): Any =
      stripAccentsEval(s.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.TextExprs.stripAccentsEval($c)")

    override protected def withNewChildInternal(newChild: Expression): StripAccents =
      copy(child = newChild)
  }

  def stripAccents(c: Column): Column =
    GraftShim.column(StripAccents(GraftShim.expression(c)))

  /** Runtime kernel for [[JaroWinkler]] — the textbook algorithm
    * (Winkler '90 over Jaro '89), bit-compatible with DuckDB's
    * `jaro_winkler_similarity` at the 9-decimal gate rounding (probed:
    * MARTHA/MARHTA 0.96111, DIXON/DICKSONX 0.81333, the 0.7 boost
    * threshold — a sub-0.7 jaro gets NO prefix boost even with a common
    * prefix — and empty-string → 0.0, not 1.0): match window
    * ⌊max(len)/2⌋ − 1, greedy left-to-right matching, transpositions =
    * half the differing matched positions, prefix scale p = 0.1 capped
    * at ℓ = 4. Char-level (UTF-16 code units) — identical to byte-level
    * engines on the ASCII record-linkage keys this targets.
    */
  def jaroWinklerEval(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.toString
    val s2 = b.toString
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var mism = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) mism += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    val jaro = (md / l1 + md / l2 + (md - mism / 2.0) / md) / 3.0
    if (jaro <= 0.7) jaro
    else {
      var p = 0
      val maxP = math.min(4, math.min(l1, l2))
      while (p < maxP && s1.charAt(p) == s2.charAt(p)) p += 1
      jaro + p * 0.1 * (1.0 - jaro)
    }
  }

  /** Jaro-Winkler similarity of two strings in [0,1]; null-preserving. */
  case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

    override def dataType: DataType = DoubleType
    override def prettyName: String = "jaro_winkler"

    override def nullSafeEval(a: Any, b: Any): Any =
      jaroWinklerEval(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (l, r) => s"graft.functions.TextExprs.jaroWinklerEval($l, $r)")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): JaroWinkler =
      copy(left = newLeft, right = newRight)
  }

  def jaroWinkler(l: Column, r: Column): Column =
    GraftShim.column(JaroWinkler(GraftShim.expression(l), GraftShim.expression(r)))

  /** Aho–Corasick automaton over a fixed pattern set — built ONCE on the
    * driver, shipped to executors as a reference object inside the
    * expression (torrent-broadcast with the task binary, like the bloom
    * probe), matched in O(|text| + matches) per row. The blocklist/
    * lexicon screen at scale: a thousand-term bad-word list as a regex
    * alternation compiles into a backtracking monster and as a per-term
    * `contains` loop costs O(|text|·terms); the automaton walks each
    * character once whatever the dictionary size.
    *
    * Case-sensitive, overlapping matches counted once per pattern
    * (the probe answers "which patterns occur", not "where").
    */
  final class AhoCorasick(patterns: Seq[String]) extends Serializable {
    require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
      "AhoCorasick needs non-empty patterns")
    private val pats = patterns.distinct.sorted.toArray
    // goto/fail/output over a growable trie; child maps are per-node
    // hash maps — dictionary-sized state, built once per JVM
    private val children = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.Map.empty[Char, Int])
    private val out = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.Set.empty[Int])
    pats.zipWithIndex.foreach { case (p, pi) =>
      var node = 0
      p.foreach { ch =>
        node = children(node).getOrElseUpdate(ch, {
          children += scala.collection.mutable.Map.empty[Char, Int]
          out += scala.collection.mutable.Set.empty[Int]
          children.length - 1
        })
      }
      out(node) += pi
    }
    private val fail = new Array[Int](children.length)
    locally { // BFS failure links; merge output sets along them
      val q = scala.collection.mutable.Queue.empty[Int]
      children(0).values.foreach { c => fail(c) = 0; q += c }
      while (q.nonEmpty) {
        val u = q.dequeue()
        children(u).foreach { case (ch, v) =>
          var f = fail(u)
          while (f != 0 && !children(f).contains(ch)) f = fail(f)
          fail(v) = children(f).get(ch).filter(_ != v).getOrElse(0)
          out(v) ++= out(fail(v))
          q += v
        }
      }
    }
    /** Sorted distinct matched patterns in `text`. */
    def matchedIn(text: String): Array[String] = {
      val hits = scala.collection.mutable.SortedSet.empty[Int]
      var node = 0
      var i = 0
      while (i < text.length) {
        val ch = text.charAt(i)
        while (node != 0 && !children(node).contains(ch)) node = fail(node)
        node = children(node).getOrElse(ch, 0)
        if (out(node).nonEmpty) hits ++= out(node)
        i += 1
      }
      hits.toArray.map(pats)
    }
  }

  /** `multi_match(text)` for a FIXED pattern list: the sorted distinct
    * patterns occurring as substrings. CodegenFallback like the bloom
    * probe — the automaton walk is library code; one virtual call per
    * row against an O(text)-time matcher beats codegen'd O(text·terms).
    */
  case class MultiMatch(child: Expression, patterns: Seq[String])
    extends UnaryExpression with CodegenFallback {

    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "multi_match"

    @transient private lazy val ac = new AhoCorasick(patterns)

    override def nullSafeEval(s: Any): Any =
      new GenericArrayData(
        ac.matchedIn(s.asInstanceOf[UTF8String].toString)
          .map(UTF8String.fromString): Array[Any])

    override protected def withNewChildInternal(newChild: Expression): MultiMatch =
      copy(child = newChild)
  }

  def multiMatch(c: Column, patterns: Seq[String]): Column =
    GraftShim.column(MultiMatch(GraftShim.expression(c), patterns))

  /** Runtime kernel for [[PorterStem]] — the original Porter algorithm
    * (Porter, "An algorithm for suffix stripping", Program 14(3), 1980),
    * implemented from the paper's rule tables: measure-conditioned
    * suffix stripping in five steps (plurals/participles → y→i →
    * long-suffix map → -ful/-ness class → -al/-ment class → final -e /
    * double-l cleanup). ASCII lowercase in, stem out; words shorter
    * than 3 chars and non-lowercase-ASCII input return unchanged (the
    * tokenizer upstream already lowercases — anything else is not a
    * word this stemmer has semantics for). Verified against the
    * paper's own examples (caresses→caress, motoring→motor,
    * generalizations→gener, …) in SqlSurfaceSpec.
    */
  def porterStem(s: UTF8String): UTF8String = {
    val w0 = s.toString
    if (w0.length < 3) return s
    var i = 0
    while (i < w0.length) {
      val c = w0.charAt(i)
      if (c < 'a' || c > 'z') return s
      i += 1
    }
    var w = w0

    def isVowelAt(str: String, idx: Int): Boolean = str.charAt(idx) match {
      case 'a' | 'e' | 'i' | 'o' | 'u' => true
      case 'y' => idx > 0 && !isVowelAt(str, idx - 1)
      case _ => false
    }
    // measure m of the stem: number of VC transitions in [C](VC)^m[V]
    def measure(str: String): Int = {
      var m = 0
      var idx = 0
      var prevV = false
      while (idx < str.length) {
        val v = isVowelAt(str, idx)
        if (prevV && !v) m += 1
        prevV = v
        idx += 1
      }
      m
    }
    def containsVowel(str: String): Boolean =
      (0 until str.length).exists(isVowelAt(str, _))
    def endsDoubleC(str: String): Boolean =
      str.length >= 2 && str.charAt(str.length - 1) == str.charAt(str.length - 2) &&
        !isVowelAt(str, str.length - 1)
    // *o: stem ends cvc where the final c is not w, x or y
    def endsCvc(str: String): Boolean = {
      val n = str.length
      n >= 3 && !isVowelAt(str, n - 3) && isVowelAt(str, n - 2) &&
        !isVowelAt(str, n - 1) && {
          val c = str.charAt(n - 1); c != 'w' && c != 'x' && c != 'y'
        }
    }
    def stemOf(suffix: String): String = w.substring(0, w.length - suffix.length)

    // Step 1a
    if (w.endsWith("sses")) w = stemOf("es")
    else if (w.endsWith("ies")) w = stemOf("es")
    else if (w.endsWith("ss")) ()
    else if (w.endsWith("s")) w = stemOf("s")
    // Step 1b
    var fired1b = false
    if (w.endsWith("eed")) { if (measure(stemOf("eed")) > 0) w = stemOf("d") }
    else if (w.endsWith("ed") && containsVowel(stemOf("ed"))) {
      w = stemOf("ed"); fired1b = true
    } else if (w.endsWith("ing") && containsVowel(stemOf("ing"))) {
      w = stemOf("ing"); fired1b = true
    }
    if (fired1b) {
      if (w.endsWith("at") || w.endsWith("bl") || w.endsWith("iz")) w = w + "e"
      else if (endsDoubleC(w) && !"lsz".contains(w.charAt(w.length - 1)))
        w = w.substring(0, w.length - 1)
      else if (measure(w) == 1 && endsCvc(w)) w = w + "e"
    }
    // Step 1c
    if (w.endsWith("y") && containsVowel(w.substring(0, w.length - 1)))
      w = w.substring(0, w.length - 1) + "i"
    // Step 2 (m > 0), longest-match order per the paper's table
    val step2 = Seq(
      "ational" -> "ate", "tional" -> "tion", "enci" -> "ence", "anci" -> "ance",
      "izer" -> "ize", "abli" -> "able", "alli" -> "al", "entli" -> "ent",
      "eli" -> "e", "ousli" -> "ous", "ization" -> "ize", "ation" -> "ate",
      "ator" -> "ate", "alism" -> "al", "iveness" -> "ive", "fulness" -> "ful",
      "ousness" -> "ous", "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble")
    step2.sortBy(-_._1.length)
      .find { case (suf, _) => w.endsWith(suf) }
      .foreach { case (suf, rep) =>
        if (measure(stemOf(suf)) > 0) w = stemOf(suf) + rep
      }
    // Step 3 (m > 0)
    val step3 = Seq("icate" -> "ic", "ative" -> "", "alize" -> "al",
      "iciti" -> "ic", "ical" -> "ic", "ful" -> "", "ness" -> "")
    step3.sortBy(-_._1.length)
      .find { case (suf, _) => w.endsWith(suf) }
      .foreach { case (suf, rep) =>
        if (measure(stemOf(suf)) > 0) w = stemOf(suf) + rep
      }
    // Step 4 (m > 1; -ion additionally needs the stem to end s or t)
    val step4 = Seq("al", "ance", "ence", "er", "ic", "able", "ible", "ant",
      "ement", "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous",
      "ive", "ize")
    step4.sortBy(-_.length)
      .find(w.endsWith(_))
      .foreach { suf =>
        val st = stemOf(suf)
        val ok = measure(st) > 1 &&
          (suf != "ion" || (st.nonEmpty &&
            (st.charAt(st.length - 1) == 's' || st.charAt(st.length - 1) == 't')))
        if (ok) w = st
      }
    // Step 5a
    if (w.endsWith("e")) {
      val st = stemOf("e")
      val m = measure(st)
      if (m > 1 || (m == 1 && !endsCvc(st))) w = st
    }
    // Step 5b
    if (measure(w) > 1 && endsDoubleC(w) && w.endsWith("l"))
      w = w.substring(0, w.length - 1)

    if (w == w0) s else UTF8String.fromString(w)
  }

  /** Porter stem of a lowercase word; null-preserving. */
  case class PorterStem(child: Expression) extends UnaryExpression {

    override def dataType: DataType = StringType
    override def prettyName: String = "porter_stem"

    override def nullSafeEval(s: Any): Any =
      porterStem(s.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.TextExprs.porterStem($c)")

    override protected def withNewChildInternal(newChild: Expression): PorterStem =
      copy(child = newChild)
  }

  def porterStemCol(c: Column): Column =
    GraftShim.column(PorterStem(GraftShim.expression(c)))

  /** Runtime kernel for [[Winnow]]: winnowing fingerprint selection over
    * an already-normalized string, bit-identical to the HOF/oracle
    * definition (md5-prefix int64 gram hashes over code-point k-grams,
    * per-window min with rightmost tie, distinct (pos, h) selections in
    * window order) but O(grams) instead of O(grams · w): one reused
    * MessageDigest, and the window minimum via a monotonic deque — the
    * `>=` pop implements the rightmost-tie rule (an equal-hash later
    * gram evicts the earlier one). The HOF twin allocated a struct per
    * (window, gram) comparison inside interpreted lambdas — measured
    * 16.1 s → this kernel at ~1 s for the same sf0.1 gate.
    */
  def winnowEval(s: UTF8String, k: Int, w: Int): ArrayData = {
    val str = s.toString
    val nChars = str.length
    // code-point start offsets (surrogate-safe — zh text is BMP but the
    // contract is code points, matching Spark substr and DuckDB SUBSTR)
    var cpCount = 0
    var ci = 0
    while (ci < nChars) { ci += Character.charCount(str.codePointAt(ci)); cpCount += 1 }
    val cpOff = new Array[Int](cpCount + 1)
    ci = 0; var cj = 0
    while (ci < nChars) {
      cpOff(cj) = ci; ci += Character.charCount(str.codePointAt(ci)); cj += 1
    }
    cpOff(cpCount) = nChars
    val ng = math.max(cpCount - (k - 1), 1)
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = new Array[Long](ng)
    var i = 0
    while (i < ng) {
      val a = cpOff(i)
      val b = cpOff(math.min(i + k, cpCount))
      md.reset()
      val d = md.digest(str.substring(a, b)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var v = 0L
      var j = 0
      while (j < 8) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
      h(i) = v >>> 4 // first 15 hex digits = top 60 bits
      i += 1
    }
    val deque = new Array[Int](ng)
    var head = 0
    var tail = 0
    val outPos = new scala.collection.mutable.ArrayBuffer[Int]
    val outH = new scala.collection.mutable.ArrayBuffer[Long]
    var lastSel = -1
    var g = 0
    while (g < ng) {
      while (tail > head && h(deque(tail - 1)) >= h(g)) tail -= 1
      deque(tail) = g; tail += 1
      while (deque(head) < g - w + 1) head += 1
      // a window ends at every g >= w-1; shorter-than-w gram lists get
      // their single whole-list window at the last gram
      if (g >= w - 1 || g == ng - 1) {
        val p = deque(head)
        if (p != lastSel) { outPos += p + 1; outH += h(p); lastSel = p }
      }
      g += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array.tabulate[Any](outPos.length)(x =>
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](outPos(x), outH(x)))))
  }

  /** Winnowing fingerprint selection as one fused per-row kernel — see
    * [[winnowEval]] and `Text.winnowingFingerprints` for semantics.
    */
  case class Winnow(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

    require(k >= 1 && w >= 1, s"k=$k w=$w must be >= 1")

    override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("pos",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("h",
          org.apache.spark.sql.types.LongType, nullable = false))),
      containsNull = false)
    override def prettyName: String = "winnow"

    override def nullSafeEval(s: Any): Any =
      winnowEval(s.asInstanceOf[UTF8String], k, w)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.TextExprs.winnowEval($c, $k, $w)")

    override protected def withNewChildInternal(newChild: Expression): Winnow =
      copy(child = newChild)
  }

  def winnow(c: Column, k: Int, w: Int): Column =
    GraftShim.column(Winnow(GraftShim.expression(c), k, w))
}

package graft.ops

import graft.ops.Materialize.ForkOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** WordPiece subword tokenizer: distributed trainer + encoder — the
  * BERT-family member completing the tokenizer triple beside [[Bpe]]
  * (GPT family: merge by raw pair frequency) and [[Unigram]]
  * (SentencePiece family: prune by likelihood). Public formulation:
  * Schuster & Nakajima 2012 and the openly documented BERT/HuggingFace
  * WordPiece trainer.
  *
  * WordPiece differs from BPE on exactly two axes, both implemented
  * here faithfully:
  *
  *   - **Training argmax is the LIKELIHOOD score, not the raw count**:
  *     merge the pair maximizing `count(ab) / (count(a)·count(b))` —
  *     the pair whose fusion most increases corpus likelihood under a
  *     unigram-over-pieces model, which prefers strongly-associated
  *     rare pairs over merely-frequent ones. Symbols are
  *     continuation-marked from the start (`play` → `p ##l ##a ##y`),
  *     and a merge concatenates the right piece's PAYLOAD
  *     (`p + ##l → pl`, `##a + ##y → ##ay`), so initial and
  *     continuation pieces of equal surface never conflate.
  *   - **Encoding is greedy longest-match against the VOCABULARY**
  *     (alphabet + every merge result), not a merge-rank replay: at
  *     each position take the longest matching piece (continuations
  *     probe `##`-prefixed); any uncovered position makes the whole
  *     word the unknown token — BERT's all-or-nothing semantics.
  *
  * Distribution shape is [[Bpe]]'s exactly: rounds run over the
  * Heaps'-bounded word-TYPE table, never the corpus — each round is
  * one bounded pair-count shuffle, one symbol-count shuffle (the score
  * denominators — vocab-sized, joined to the pair table), one
  * TakeOrdered argmax moving ONE row to the driver, one narrow greedy
  * fold, one lineage cut. The corpus is read once; the driver holds
  * only the learned rules. Determinism is engine-exact end-to-end:
  * counts are integers, the score is one IEEE division of two exact
  * doubles (counts < 2⁵³; the denominator multiplies as doubles so no
  * integer overflow exists at any corpus size), ties break
  * (score desc, lhs asc, rhs asc), and the oracle gates replay every
  * round's counts, scores, argmax and merge decision-for-decision in
  * DuckDB.
  */
object Wordpiece {

  /** One learned merge: step is 1-based rank; `merged` is
    * lhs + payload(rhs); `score` = pairCount / (lhsCount·rhsCount).
    */
  final case class Rule(step: Int, lhs: String, rhs: String, merged: String,
                        pairCount: Long, score: Double)

  private def payload(piece: String): String =
    if (piece.startsWith("##")) piece.substring(2) else piece

  /** Initial WordPiece symbolization: first code unit bare, the rest
    * `##`-prefixed (split by code unit, like [[Bpe]]'s `split(word,"")`).
    */
  private def initSyms(word: Column): Column =
    transform(split(word, ""),
      (c, i) => when(i === 0, c).otherwise(concat(lit("##"), c)))

  /** Greedy left-to-right merge of one rule over a symbol array —
    * [[Bpe]]'s fold with an explicit merged string (WordPiece strips
    * the continuation marker off the right piece). The fold is
    * non-overlapping for the same reason: a merged tail can never
    * equal `l` again (the appended payload is non-empty).
    */
  private def mergeFold(syms: Column, l: String, r: String, m: String): Column =
    aggregate(
      syms,
      array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 && element_at(acc, -1) === lit(l) && x === lit(r),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(m))))
          .otherwise(concat(acc, array(x))))

  /** Train `nMerges` WordPiece rules. `minPairCount` is a CANDIDATE
    * FILTER, not a stop test on the winner: pairs below the raw count
    * floor are excluded from the score argmax (the HF/BERT trainer's
    * `min_frequency` posture), and training stops only when no pair
    * survives the floor. The distinction matters precisely because the
    * argmax is by likelihood score — a hapax pair of two globally-rare
    * symbols scores the maximum 1.0 and would otherwise win a round
    * and terminate training while frequent eligible pairs remain.
    * (BPE's stop-on-winner is sound because its argmax IS the count;
    * here the floor must come before the argmax.) The oracle models
    * the identical floor in each round's `b$$k` CTE.
    */
  def train(df: DataFrame, textCol: String, nMerges: Int,
            minPairCount: Long = 2L): Seq[Rule] = {
    require(nMerges >= 1 && nMerges <= 10000, s"nMerges=$nMerges")
    var state = df
      .select(explode(Text.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .withColumn("syms", initSyms(col("word")))
      .lineageCut()
    val rules = scala.collection.mutable.ArrayBuffer.empty[Rule]
    var step = 1
    var done = false
    while (step <= nMerges && !done) {
      val pairs = state
        .select(explode(when(size(col("syms")) >= 2, transform(
          sequence(lit(0), size(col("syms")) - 2),
          i => struct(element_at(col("syms"), i + 1).as("l"),
            element_at(col("syms"), i + 2).as("r"))))
          .otherwise(array().cast("array<struct<l:string,r:string>>"))).as("p"),
          col("cnt"))
        .groupBy(col("p.l"), col("p.r")).agg(sum(col("cnt")).as("c"))
        .filter(col("c") >= minPairCount)
      // per-symbol occurrence mass in the CURRENT state — the score
      // denominators; vocab-sized (alphabet + merges so far)
      val symCounts = state
        .select(explode(col("syms")).as("sym"), col("cnt"))
        .groupBy("sym").agg(sum(col("cnt")).as("sc"))
      val best = pairs
        .join(symCounts.select(col("sym").as("l"), col("sc").as("ca")), Seq("l"))
        .join(symCounts.select(col("sym").as("r"), col("sc").as("cb")), Seq("r"))
        .withColumn("score",
          col("c").cast(DoubleType) /
            (col("ca").cast(DoubleType) * col("cb").cast(DoubleType)))
        .orderBy(col("score").desc, col("l").asc, col("r").asc)
        .limit(1)
        .select("l", "r", "c", "score")
        .collect()
      if (best.isEmpty) done = true
      else {
        val (l, r) = (best(0).getString(0), best(0).getString(1))
        val m = l + payload(r)
        rules += Rule(step, l, r, m, best(0).getLong(2), best(0).getDouble(3))
        val old = state
        state = state
          .withColumn("syms", mergeFold(col("syms"), l, r, m))
          .lineageCut()
        old.unpersist()
        step += 1
      }
    }
    state.unpersist()
    rules.toSeq
  }

  /** The learned rules as a DataFrame — the trainer gate's surface. */
  def trainTable(df: DataFrame, textCol: String, nMerges: Int,
                 minPairCount: Long = 2L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    train(df, textCol, nMerges, minPairCount)
      .map(r => (r.step, r.lhs, r.rhs, r.merged, r.pairCount, r.score))
      .toDF("step", "lhs", "rhs", "merged", "pair_count", "score")
  }

  /** The encoding vocabulary a training run induces: every initial
    * symbol of the corpus (bare first code units + `##` continuations)
    * plus every merge result — the standard WordPiece posture (merge
    * results stay in the vocabulary even when later merged further).
    * Bounded model state: alphabet + nMerges rows.
    */
  def vocabulary(df: DataFrame, textCol: String, rules: Seq[Rule]): Seq[String] = {
    val alphabet = df
      .select(explode(Text.tokens(col(textCol))).as("word"))
      .select(explode(initSyms(col("word"))).as("sym"))
      .distinct()
      .collect().map(_.getString(0))
    (alphabet ++ rules.map(_.merged)).distinct.sorted
  }

  /** Encode text under a vocabulary: one row per word position with
    * the greedy longest-match segmentation (space-joined; continuation
    * pieces carry their `##`). The hot path is the native
    * [[graft.functions.WordpieceExprs]] expression — one codegen'd JVM
    * loop per word; the vocabulary rides the plan, never a shuffle.
    * A word with any uncovered position segments to `unk` whole.
    */
  def encode(df: DataFrame, textCol: String, idCol: String,
             vocab: Seq[String], unk: String = "[UNK]"): DataFrame = {
    val toks = df.select(col(idCol),
      posexplode(Text.tokens(col(textCol))).as(Seq("pos", "word")))
    val seg = graft.functions.WordpieceExprs.wordpieceSegment(
      col("word"), vocab, unk)
    toks.select(col(idCol), col("pos"), col("word"),
      seg.as("subwords"),
      size(split(seg, " ")).as("n_subwords"))
  }

  // ---------------------------------------------------- oracle builder

  /** DuckDB SQL replaying `nMerges` training rounds: per round a
    * pair-count CTE, a symbol-count CTE (the denominators), the scored
    * argmax with the identical one-division arithmetic and tiebreak —
    * over candidates surviving the same `minPairCount` floor the
    * engine applies — and the fixpoint-REPLACE merge ([[Bpe]]'s
    * machinery with the continuation-stripping merged string).
    */
  private def oracleRounds(nMerges: Int, minPairCount: Long): String = {
    val sb = new StringBuilder
    sb.append(
      """WITH RECURSIVE st0 AS MATERIALIZED (
        |  SELECT word, COUNT(*) AS cnt,
        |         ' ' || ARRAY_TO_STRING(LIST_TRANSFORM(
        |                  REGEXP_EXTRACT_ALL(word, '.'),
        |                  (c, i) -> CASE WHEN i = 1 THEN c ELSE '##' || c END),
        |                ' ') || ' ' AS seq
        |  FROM (
        |    SELECT UNNEST(LIST_FILTER(
        |      STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g')), ' '),
        |      x -> x <> '')) AS word
        |    FROM documents)
        |  GROUP BY word)""".stripMargin)
    for (k <- 1 to nMerges) {
      val prev = s"st${k - 1}"
      sb.append(s""",
        |p$k AS MATERIALIZED (
        |  SELECT t[i + 1] AS l, t[i + 2] AS r, SUM(cnt) AS c
        |  FROM (SELECT cnt, t, UNNEST(RANGE(0, LEN(t) - 1)) AS i
        |        FROM (SELECT cnt, STRING_SPLIT(TRIM(seq), ' ') AS t FROM $prev))
        |  GROUP BY t[i + 1], t[i + 2]),
        |sc$k AS MATERIALIZED (
        |  SELECT sym, SUM(cnt) AS sc
        |  FROM (SELECT cnt, UNNEST(STRING_SPLIT(TRIM(seq), ' ')) AS sym FROM $prev)
        |  GROUP BY sym),
        |b$k AS MATERIALIZED (
        |  SELECT p$k.l, p$k.r, p$k.c,
        |         CAST(p$k.c AS DOUBLE) /
        |           (CAST(sa.sc AS DOUBLE) * CAST(sb.sc AS DOUBLE)) AS score,
        |         p$k.l || (CASE WHEN p$k.r LIKE '##%' THEN SUBSTR(p$k.r, 3)
        |                        ELSE p$k.r END) AS m
        |  FROM p$k
        |  JOIN sc$k sa ON sa.sym = p$k.l
        |  JOIN sc$k sb ON sb.sym = p$k.r
        |  WHERE p$k.c >= $minPairCount
        |  ORDER BY score DESC, l, r LIMIT 1),
        |fix$k AS (
        |  SELECT word, cnt, seq FROM $prev
        |  UNION
        |  SELECT word, cnt,
        |         REPLACE(seq, (SELECT ' '||l||' '||r||' ' FROM b$k),
        |                      (SELECT ' '||m||' ' FROM b$k))
        |  FROM fix$k
        |  WHERE seq <> REPLACE(seq, (SELECT ' '||l||' '||r||' ' FROM b$k),
        |                            (SELECT ' '||m||' ' FROM b$k))),
        |st$k AS MATERIALIZED (
        |  SELECT word, cnt, seq FROM fix$k
        |  WHERE seq = REPLACE(seq, (SELECT ' '||l||' '||r||' ' FROM b$k),
        |                           (SELECT ' '||m||' ' FROM b$k)))""".stripMargin)
    }
    sb.toString
  }

  /** Oracle for the trainer gate: the N scored argmax rows, ranked. */
  def trainOracle(nMerges: Int, minPairCount: Long = 2L): String = {
    val rows = (1 to nMerges)
      .map(k => s"SELECT $k AS step, l AS lhs, r AS rhs, m AS merged, " +
        s"c AS pair_count, score FROM b$k")
      .mkString("\n", "\nUNION ALL\n", "\n")
    oracleRounds(nMerges, minPairCount) +
      s"""
        |SELECT CAST(step AS INTEGER) AS step, lhs, rhs, merged,
        |       CAST(pair_count AS BIGINT) AS pair_count,
        |       CAST(score AS DOUBLE) AS score
        |FROM ($rows) ORDER BY step""".stripMargin
  }

  /** Oracle for the encoder gate: re-derive the rules (same rounds),
    * build the induced vocabulary (corpus alphabet + merge results),
    * greedy-longest-match every DISTINCT word via a recursive CTE —
    * each recursion step consumes the longest matching piece at the
    * current position (MAX_BY over the vocab; a length tie at one
    * position is the same string, so the argmax is total) — then join
    * segmentations back to every (doc, pos) token. Coverage is total
    * on the training corpus (every code unit is in the alphabet), so
    * the unknown-token path stays spec territory
    * (WordpieceSpec) rather than oracle territory.
    */
  def encodeOracle(nMerges: Int, minPairCount: Long = 2L): String = {
    val mergedPieces = (1 to nMerges)
      .map(k => s"SELECT m AS piece FROM b$k").mkString(" UNION ")
    oracleRounds(nMerges, minPairCount) + s""",
      |vocab AS MATERIALIZED (
      |  SELECT DISTINCT sym AS piece
      |  FROM (SELECT UNNEST(STRING_SPLIT(TRIM(seq), ' ')) AS sym FROM st0)
      |  UNION
      |  $mergedPieces),
      |words AS MATERIALIZED (SELECT DISTINCT word FROM st0),
      |best AS MATERIALIZED (
      |  -- the greedy longest match at a position is PATH-INDEPENDENT,
      |  -- so the whole decision table enumerates non-recursively and
      |  -- the recursion below is a plain (word, at) walk — also dodges
      |  -- a DuckDB limitation where a correlated subquery inside a
      |  -- recursive term silently matches nothing when it references
      |  -- CTEs derived from earlier recursive links of the same chain
      |  SELECT wp.word, wp.at, MAX_BY(v.piece, LEN(v.piece)) AS bp
      |  FROM (SELECT word, UNNEST(RANGE(0, LEN(word))) AS at FROM words) wp
      |  JOIN vocab v
      |    ON (wp.at = 0 AND v.piece NOT LIKE '##%'
      |        AND SUBSTR(wp.word, 1, LEN(v.piece)) = v.piece)
      |    OR (wp.at > 0 AND v.piece LIKE '##%'
      |        AND SUBSTR(wp.word, wp.at + 1, LEN(v.piece) - 2)
      |            = SUBSTR(v.piece, 3))
      |  GROUP BY wp.word, wp.at),
      |enc(word, at, out) AS (
      |  SELECT word, 0, '' FROM words
      |  UNION ALL
      |  SELECT e.word,
      |         e.at + CASE WHEN e.at = 0 THEN LEN(b.bp) ELSE LEN(b.bp) - 2 END,
      |         e.out || ' ' || b.bp
      |  FROM enc e JOIN best b ON b.word = e.word AND b.at = e.at
      |  WHERE e.at < LEN(e.word)),
      |seg AS MATERIALIZED (
      |  SELECT word, TRIM(out) AS subwords FROM enc e
      |  WHERE at = LEN(word)),
      |toks AS (
      |  SELECT doc_id, pos, t[pos + 1] AS word
      |  FROM (SELECT doc_id, t, UNNEST(RANGE(0, LEN(t))) AS pos
      |        FROM (SELECT doc_id,
      |                     LIST_FILTER(
      |                       STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(text), '\\s+', ' ', 'g')), ' '),
      |                       x -> x <> '') AS t
      |              FROM documents)))
      |SELECT toks.doc_id, CAST(toks.pos AS INTEGER) AS pos, toks.word,
      |       seg.subwords,
      |       CAST(LEN(STRING_SPLIT(seg.subwords, ' ')) AS INTEGER) AS n_subwords
      |FROM toks JOIN seg USING (word)
      |ORDER BY doc_id, pos""".stripMargin
  }
}

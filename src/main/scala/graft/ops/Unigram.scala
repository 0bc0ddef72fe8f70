package graft.ops

import graft.ops.Materialize.ForkOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer (SentencePiece-family): distributed
  * trainer + encoder — the sibling of [[Bpe]]. LLM pipelines choose
  * between BPE and unigram vocabularies; this is the unigram half,
  * built on the same word-type machinery.
  *
  * Algorithm (Viterbi hard-EM, fully deterministic):
  *   1. SEED: every substring of length 1..maxPieceLen of every word
  *      type, weighted by word count × occurrence positions; vocabulary
  *      = ALL single characters (coverage — never pruned) plus the top
  *      `seedSize` multi-character substrings by (count desc, piece
  *      asc).
  *   2. EM ROUNDS (`emIters`): piece weights are INTEGER micro-nats
  *      ⌊ln(c/T)·10⁶ + 0.5⌋; each word type is Viterbi-segmented under
  *      the current weights (exact integer DP — see
  *      [[graft.functions.UnigramExprs]] for the tie-resolution proof);
  *      new counts are the segmentation's piece usage summed over word
  *      counts. Unused multi-character pieces drop; an unused single
  *      character floors at count 1 (coverage without ln(0)).
  *   3. PRUNE to `vocabSize`: characters always survive; multi-char
  *      pieces keep the top (vocabSize − |chars|) by (count desc,
  *      piece asc).
  *   4. `postIters` more EM rounds re-estimate counts on the pruned
  *      vocabulary.
  *
  * Hard-EM (Viterbi counts) rather than soft-EM forward–backward is a
  * deliberate determinism trade: expected counts are sums of float
  * products whose value depends on reduction order, which no cross-
  * engine oracle can replay bit-exactly, while Viterbi counts are
  * integers produced by an integer DP — the only floats anywhere are
  * the per-piece ln quantizations, computed once per round from integer
  * (c, T) in a pinned formula both engines evaluate identically (the
  * ln-quantization discipline every LM gate here uses).
  *
  * Scale shape (the [[Bpe]] posture): everything iterates over the
  * Heaps'-law-bounded WORD-TYPE table, never the corpus — the corpus
  * is read once into (word, cnt). Each EM round is one narrow
  * segmentation pass over that table (the piece table rides in the
  * plan as a reference object) plus one vocabulary-sized groupBy; the
  * only driver state is the vocabulary itself (≤ seedSize + |alphabet|
  * rows), collected once per round — bounded model state, same
  * contract as the BPE merge list and the IVF centroid tables.
  *
  * The reference pipeline has no tokenizer; this extends the
  * training-data surface the brief mandates. Oracles replay every
  * phase in DuckDB: the seed top-k, each round's quantized weights,
  * the Viterbi DP as unrolled per-position CTEs with the identical
  * (score desc, pieces asc, last-piece-len desc) tie rule, the
  * keep/floor rule, and the prune cut.
  */
object Unigram {

  /** ⌊ln(c/T)·10⁶ + 0.5⌋ — the pinned weight quantization. floor(x+0.5)
    * rather than round-half-away: the two differ on negative half-way
    * values and only floor(x+0.5) is spelled identically in both
    * engines (FLOOR(x*1e6 + 0.5) in the oracle SQL).
    */
  private def quantLn(c: Long, t: Long): Long =
    math.floor(math.log(c.toDouble / t) * 1e6 + 0.5).toLong

  /** Train a unigram vocabulary; returns (piece, count) in deterministic
    * (piece asc) order. See the object scaladoc for the algorithm.
    */
  def train(df: DataFrame, textCol: String, vocabSize: Int,
            maxPieceLen: Int = 4, seedSize: Int = 200,
            emIters: Int = 2, postIters: Int = 1): Seq[(String, Long)] = {
    require(vocabSize >= 1 && maxPieceLen >= 1 && seedSize >= 1)
    require(emIters >= 1 && postIters >= 0)
    val words = df
      .select(explode(Text.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .lineageCut()

    // seed: all substrings of every word type, weighted by cnt per
    // start position; chars all kept, multi-char top-seedSize
    val positions = words.select(col("word"), col("cnt"),
      explode(sequence(lit(0), length(col("word")) - 1)).as("s"))
    val subs = positions.select(col("cnt"), explode(
      transform(sequence(lit(1), least(lit(maxPieceLen), length(col("word")) - col("s"))),
        l => col("word").substr(col("s") + 1, l))).as("piece"))
    val counts0 = subs.groupBy("piece").agg(sum(col("cnt")).as("c"))
    val chars = counts0.filter(length(col("piece")) === 1)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val multi = counts0.filter(length(col("piece")) >= 2)
      .orderBy(col("c").desc, col("piece").asc).limit(seedSize)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    var vocab: Seq[(String, Long)] = (chars ++ multi).toSeq

    def emRound(v: Seq[(String, Long)]): Seq[(String, Long)] = {
      val t = v.map(_._2).sum
      val weights = v.map { case (p, c) => p -> quantLn(c, t) }
      val seg = graft.functions.UnigramExprs.unigramSegment(
        col("word"), weights, maxPieceLen)
      val usage = words
        .select(col("cnt"), explode(split(seg, " ")).as("piece"))
        .groupBy("piece").agg(sum(col("cnt")).as("u"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      v.flatMap { case (p, _) =>
        val u = usage.getOrElse(p, 0L)
        if (u > 0) Some(p -> u)
        else if (p.length == 1) Some(p -> 1L)
        else None
      }
    }

    (1 to emIters).foreach(_ => vocab = emRound(vocab))
    // prune: chars always survive, multi-char top (vocabSize - |chars|)
    val nChars = vocab.count(_._1.length == 1)
    val prunedMulti = vocab.filter(_._1.length >= 2)
      .sortBy { case (p, c) => (-c, p) }
      .take(math.max(0, vocabSize - nChars))
    vocab = vocab.filter(_._1.length == 1) ++ prunedMulti
    (1 to postIters).foreach(_ => vocab = emRound(vocab))
    words.unpersist()
    vocab.sortBy(_._1)
  }

  /** The trained vocabulary as a DataFrame — the trainer gate's
    * surface: (piece, piece_count, logprob) with logprob = ln(c/T)
    * rounded at 6 decimals (the LM-gate rounding discipline).
    */
  def trainTable(df: DataFrame, textCol: String, vocabSize: Int,
                 maxPieceLen: Int = 4, seedSize: Int = 200,
                 emIters: Int = 2, postIters: Int = 1): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val vocab = train(df, textCol, vocabSize, maxPieceLen, seedSize,
      emIters, postIters)
    val t = vocab.map(_._2).sum
    vocab.map { case (p, c) =>
      val lp = BigDecimal(math.log(c.toDouble / t))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (p, c, lp)
    }.toDF("piece", "piece_count", "logprob")
  }

  /** Viterbi-encode text under a trained vocabulary: one row per word
    * position with the best segmentation (space-joined) — the unigram
    * twin of [[Bpe.encode]], same output shape. The hot path is the
    * native codegen'd [[graft.functions.UnigramExprs.UnigramSegment]]
    * expression; the vocabulary rides in the plan, never a shuffle; the
    * only wide op is the source explode.
    */
  def encode(df: DataFrame, textCol: String, idCol: String,
             vocab: Seq[(String, Long)], maxPieceLen: Int = 4): DataFrame = {
    val t = vocab.map(_._2).sum
    val weights = vocab.map { case (p, c) => p -> quantLn(c, t) }
    val toks = df.select(col(idCol),
      posexplode(Text.tokens(col(textCol))).as(Seq("pos", "word")))
    val seg = graft.functions.UnigramExprs.unigramSegment(
      col("word"), weights, maxPieceLen)
    toks.select(col(idCol), col("pos"), col("word"),
      seg.as("pieces"),
      size(split(seg, " ")).as("n_pieces"))
  }

  // ---------------------------------------------------- oracle builder

  /** DuckDB replay of the full training run: seed top-k, then per EM
    * round the quantized weight table and the Viterbi DP unrolled over
    * word positions 1..maxWordLen (each cell keeps its per-word best
    * via ROW_NUMBER with the pinned tie rule), the keep/floor rule,
    * and the prune cut between the pre- and post-prune rounds.
    * Generated, not hand-written — same posture as [[Bpe.oracleRounds]].
    *
    * `maxWordLen` bounds the unroll; the gate corpora's longest token
    * is 8 chars (checked against all test SFs), the default 12 leaves
    * margin. A word longer than the unroll would silently vanish from
    * the oracle — so the final state also rides an assertion-free
    * contract: the Spark side has no such bound and the gate hash
    * catches any divergence.
    */
  private def oraclePhases(vocabSize: Int, maxPieceLen: Int, seedSize: Int,
                           emIters: Int, postIters: Int,
                           maxWordLen: Int): (String, String) = {
    val sb = new StringBuilder
    sb.append(
      """WITH w0 AS MATERIALIZED (
        |  SELECT word, COUNT(*) AS cnt FROM (
        |    SELECT UNNEST(LIST_FILTER(
        |      STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g')), ' '),
        |      x -> x <> '')) AS word
        |    FROM documents)
        |  GROUP BY word),
        |pos0 AS (SELECT word, cnt, UNNEST(RANGE(0, LEN(word))) AS s FROM w0),
        |sub0 AS (SELECT word, cnt, s,
        |         UNNEST(RANGE(1, 1 + LEAST(""".stripMargin)
    sb.append(maxPieceLen)
    sb.append(
      s""", LEN(word) - s))) AS l FROM pos0),
        |c0 AS MATERIALIZED (
        |  SELECT SUBSTR(word, s + 1, l) AS piece, SUM(cnt) AS c FROM sub0 GROUP BY 1),
        |s0 AS MATERIALIZED (
        |  SELECT piece, c FROM c0 WHERE LEN(piece) = 1
        |  UNION ALL
        |  SELECT piece, c FROM (
        |    SELECT piece, c, ROW_NUMBER() OVER (ORDER BY c DESC, piece) AS rn
        |    FROM c0 WHERE LEN(piece) >= 2) WHERE rn <= $seedSize)""".stripMargin)

    def round(tag: String, in: String, out: String): Unit = {
      sb.append(s""",
        |t$tag AS (SELECT SUM(c) AS t FROM $in),
        |lw$tag AS MATERIALIZED (
        |  SELECT piece,
        |         CAST(FLOOR(LN(CAST(c AS DOUBLE) / (SELECT t FROM t$tag)) * 1000000 + 0.5) AS BIGINT) AS w
        |  FROM $in),
        |d${tag}_0 AS (SELECT word, cnt, CAST(0 AS BIGINT) AS score, 0 AS np, '' AS seg FROM w0)""".stripMargin)
      for (j <- 1 to maxWordLen) {
        val branches = (1 to math.min(maxPieceLen, j)).map { l =>
          val start = j - l + 1
          s"""      SELECT p.word, p.cnt, p.score + lw.w AS score, p.np + 1 AS np,
             |             CASE WHEN p.seg = '' THEN SUBSTR(p.word, $start, $l)
             |                  ELSE p.seg || ' ' || SUBSTR(p.word, $start, $l) END AS seg,
             |             $l AS ll
             |      FROM d${tag}_${j - l} p JOIN lw$tag lw ON lw.piece = SUBSTR(p.word, $start, $l)
             |      WHERE LEN(p.word) >= $j""".stripMargin
        }.mkString("\n      UNION ALL\n")
        sb.append(s""",
          |d${tag}_$j AS MATERIALIZED (
          |  SELECT word, cnt, score, np, seg FROM (
          |    SELECT word, cnt, score, np, seg,
          |           ROW_NUMBER() OVER (PARTITION BY word ORDER BY score DESC, np ASC, ll DESC) AS rn
          |    FROM (
          |$branches
          |    )) WHERE rn = 1)""".stripMargin)
      }
      val finUnion = (1 to maxWordLen)
        .map(j => s"SELECT word, cnt, seg FROM d${tag}_$j WHERE LEN(word) = $j")
        .mkString("\n  UNION ALL\n  ")
      sb.append(s""",
        |fin$tag AS MATERIALIZED (
        |  $finUnion),
        |u$tag AS MATERIALIZED (
        |  SELECT piece, SUM(cnt) AS u FROM (
        |    SELECT cnt, UNNEST(STRING_SPLIT(seg, ' ')) AS piece FROM fin$tag)
        |  GROUP BY 1),
        |$out AS MATERIALIZED (
        |  SELECT v.piece, CASE WHEN COALESCE(u.u, 0) > 0 THEN u.u ELSE CAST(1 AS BIGINT) END AS c
        |  FROM $in v LEFT JOIN u$tag u ON u.piece = v.piece
        |  WHERE COALESCE(u.u, 0) > 0 OR LEN(v.piece) = 1)""".stripMargin)
    }

    var state = "s0"
    for (k <- 1 to emIters) { round(s"e$k", state, s"s$k"); state = s"s$k" }
    sb.append(s""",
      |sp AS MATERIALIZED (
      |  SELECT piece, c FROM $state WHERE LEN(piece) = 1
      |  UNION ALL
      |  SELECT piece, c FROM (
      |    SELECT piece, c, ROW_NUMBER() OVER (ORDER BY c DESC, piece) AS rn
      |    FROM $state WHERE LEN(piece) >= 2)
      |  WHERE rn <= $vocabSize - (SELECT COUNT(*) FROM $state WHERE LEN(piece) = 1))""".stripMargin)
    state = "sp"
    for (k <- 1 to postIters) { round(s"p$k", state, s"sp$k"); state = s"sp$k" }
    (sb.toString, state)
  }

  /** Oracle for the trainer gate: the final vocabulary with counts and
    * 6-decimal logprobs, ordered by piece.
    */
  def trainOracle(vocabSize: Int, maxPieceLen: Int = 4, seedSize: Int = 200,
                  emIters: Int = 2, postIters: Int = 1,
                  maxWordLen: Int = 12): String = {
    val (phases, fin) = oraclePhases(vocabSize, maxPieceLen, seedSize,
      emIters, postIters, maxWordLen)
    phases + s""",
      |tfin AS (SELECT SUM(c) AS t FROM $fin)
      |SELECT piece, CAST(c AS BIGINT) AS piece_count,
      |       ROUND(LN(CAST(c AS DOUBLE) / (SELECT t FROM tfin)), 6) AS logprob
      |FROM $fin ORDER BY piece""".stripMargin
  }

  /** Oracle for the encoder gate: re-derive the vocabulary (same
    * phases), run ONE more unrolled Viterbi pass over the word types
    * under the final weights, and join every document token to its word
    * type's segmentation.
    */
  def encodeOracle(vocabSize: Int, maxPieceLen: Int = 4, seedSize: Int = 200,
                   emIters: Int = 2, postIters: Int = 1,
                   maxWordLen: Int = 12): String = {
    val (phases, fin) = oraclePhases(vocabSize, maxPieceLen, seedSize,
      emIters, postIters, maxWordLen)
    val sb = new StringBuilder(phases)
    // one final DP under the finished vocabulary (tag "z"), no count
    // update — reuse the round builder's shape via a tiny inline copy:
    sb.append(s""",
      |tz AS (SELECT SUM(c) AS t FROM $fin),
      |lwz AS MATERIALIZED (
      |  SELECT piece,
      |         CAST(FLOOR(LN(CAST(c AS DOUBLE) / (SELECT t FROM tz)) * 1000000 + 0.5) AS BIGINT) AS w
      |  FROM $fin),
      |dz_0 AS (SELECT word, cnt, CAST(0 AS BIGINT) AS score, 0 AS np, '' AS seg FROM w0)""".stripMargin)
    for (j <- 1 to maxWordLen) {
      val branches = (1 to math.min(maxPieceLen, j)).map { l =>
        val start = j - l + 1
        s"""      SELECT p.word, p.cnt, p.score + lw.w AS score, p.np + 1 AS np,
           |             CASE WHEN p.seg = '' THEN SUBSTR(p.word, $start, $l)
           |                  ELSE p.seg || ' ' || SUBSTR(p.word, $start, $l) END AS seg,
           |             $l AS ll
           |      FROM dz_${j - l} p JOIN lwz lw ON lw.piece = SUBSTR(p.word, $start, $l)
           |      WHERE LEN(p.word) >= $j""".stripMargin
      }.mkString("\n      UNION ALL\n")
      sb.append(s""",
        |dz_$j AS MATERIALIZED (
        |  SELECT word, cnt, score, np, seg FROM (
        |    SELECT word, cnt, score, np, seg,
        |           ROW_NUMBER() OVER (PARTITION BY word ORDER BY score DESC, np ASC, ll DESC) AS rn
        |    FROM (
        |$branches
        |    )) WHERE rn = 1)""".stripMargin)
    }
    val finUnion = (1 to maxWordLen)
      .map(j => s"SELECT word, seg FROM dz_$j WHERE LEN(word) = $j")
      .mkString("\n  UNION ALL\n  ")
    sb.append(s""",
      |finz AS MATERIALIZED (
      |  $finUnion)""".stripMargin)
    sb.append(""",
      |doc0 AS MATERIALIZED (
      |  SELECT doc_id, pos, t[pos + 1] AS word FROM (
      |    SELECT doc_id, t, UNNEST(RANGE(0, LEN(t))) AS pos FROM (
      |      SELECT doc_id,
      |             LIST_FILTER(
      |               STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g')), ' '),
      |               x -> x <> '') AS t
      |      FROM documents)))
      |SELECT d.doc_id, CAST(d.pos AS INTEGER) AS pos, d.word,
      |       f.seg AS pieces,
      |       CAST(LEN(STRING_SPLIT(f.seg, ' ')) AS INTEGER) AS n_pieces
      |FROM doc0 d JOIN finz f ON f.word = d.word
      |ORDER BY doc_id, pos""".stripMargin)
    sb.toString
  }
}

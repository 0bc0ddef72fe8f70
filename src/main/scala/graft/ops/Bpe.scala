package graft.ops

import graft.ops.Materialize.ForkOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding subword tokenizer: distributed trainer + encoder.
  *
  * The trainer is the classic Sennrich/GPT-2 shape — merge rounds over
  * the WORD-TYPE frequency table, not the corpus: one corpus pass
  * builds (word, count) — the Heaps'-law-bounded set of distinct
  * words — and every subsequent round touches only that table. Each
  * round is (a) one bounded shuffle: explode adjacent symbol pairs,
  * groupBy(pair) weighted by word count; (b) one TakeOrderedAndProject
  * argmax (count desc, then lexicographic — fully deterministic);
  * (c) one narrow map applying the merge. At 100 TB the word-type
  * table is ~10⁷–10⁸ rows, so N merges cost N small shuffles — the
  * corpus itself is re-read exactly once, and the driver holds only
  * the ≤N learned rules.
  *
  * Greedy merge application is a left-fold (`functions.aggregate`):
  * append each symbol, and when the accumulator tail equals `l` and
  * the incoming symbol equals `r`, replace the tail with `l+r`. The
  * fold IS left-to-right non-overlapping greedy ("a a a" under a+a →
  * [aa, a], never a(aa)) because a merged tail `l+r` can never equal
  * `l` again (r is non-empty). Encoding new text applies the learned
  * rules sequentially in rank order — equivalent to the repeatedly-
  * merge-the-lowest-rank-pair formulation, and exactly replayable in
  * SQL (the gate oracles rebuild every round with a recursive-CTE
  * fixpoint REPLACE over space-joined symbol strings).
  *
  * Mirrors the reference's derive-then-apply vocabulary posture
  * (peskas.malawi.data.pipeline R/validation-functions.R:21-58 derives
  * bounds from the data, then joins them back); the BPE algorithm
  * itself is from the public subword-NMT literature.
  */
object Bpe {

  /** One learned merge: step is 1-based rank. */
  final case class Rule(step: Int, lhs: String, rhs: String, pairCount: Long)

  /** Greedy left-to-right merge of one rule over a symbol array. */
  private def mergeFold(syms: Column, l: String, r: String): Column =
    aggregate(
      syms,
      array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 && element_at(acc, -1) === lit(l) && x === lit(r),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
          .otherwise(concat(acc, array(x))))

  /** Train `nMerges` BPE rules on the corpus behind `textCol`.
    * Deterministic: ties break on (count desc, lhs asc, rhs asc).
    * Stops early when the best remaining pair occurs fewer than
    * `minPairCount` times. The per-round `collect` moves exactly ONE
    * row (the argmax) to the driver; `localCheckpoint` after each
    * applied merge keeps the iterative lineage flat (round 5's lesson:
    * unbounded iterative lineage degrades the session).
    */
  def train(df: DataFrame, textCol: String, nMerges: Int,
            minPairCount: Long = 2L): Seq[Rule] = {
    require(nMerges >= 1 && nMerges <= 10000, s"nMerges=$nMerges")
    var state = df
      .select(explode(Text.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .withColumn("syms", split(col("word"), ""))
      .lineageCut()
    val rules = scala.collection.mutable.ArrayBuffer.empty[Rule]
    var step = 1
    var done = false
    while (step <= nMerges && !done) {
      // the single-symbol guard matters under ANSI: sequence(0, -1) is
      // DESCENDING in Spark and element_at(_, 0) throws
      val best = state
        .select(explode(when(size(col("syms")) >= 2, transform(
          sequence(lit(0), size(col("syms")) - 2),
          i => struct(element_at(col("syms"), i + 1).as("l"),
            element_at(col("syms"), i + 2).as("r"))))
          .otherwise(array().cast("array<struct<l:string,r:string>>"))).as("p"),
          col("cnt"))
        .groupBy(col("p.l"), col("p.r")).agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("l").asc, col("r").asc)
        .limit(1)
        .collect()
      if (best.isEmpty || best(0).getLong(2) < minPairCount) done = true
      else {
        val (l, r, c) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        rules += Rule(step, l, r, c)
        val old = state
        state = state
          .withColumn("syms", mergeFold(col("syms"), l, r))
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
      .map(r => (r.step, r.lhs, r.rhs, r.lhs + r.rhs, r.pairCount))
      .toDF("step", "lhs", "rhs", "merged", "pair_count")
  }

  /** Encode text under learned rules: one row per word position with
    * the subword segmentation (space-joined — symbols never contain
    * spaces). Rules apply sequentially in rank order with the same
    * greedy semantics as training, so encoding the training corpus
    * reproduces the trainer's final symbol state exactly (BpeSpec pins
    * this). The hot path is the native [[graft.functions.BpeExprs]]
    * expression — one codegen'd JVM loop per word; the N-nested
    * interpreted fold it replaces measured ~19 s at sf0.1
    * ([[encodeFold]] stays as the reference twin, spec-pinned
    * bit-identical). The rule list rides in the plan, never a shuffle;
    * the only wide op is the source explode.
    */
  def encode(df: DataFrame, textCol: String, idCol: String,
             rules: Seq[Rule]): DataFrame = {
    val toks = df.select(col(idCol),
      posexplode(Text.tokens(col(textCol))).as(Seq("pos", "word")))
    val seg = graft.functions.BpeExprs.bpeSegment(col("word"),
      rules.sortBy(_.step).map(r => (r.lhs, r.rhs)))
    toks.select(col(idCol), col("pos"), col("word"),
      seg.as("subwords"),
      size(split(seg, " ")).as("n_subwords"))
  }

  /** Reference formulation of [[encode]] via N nested greedy folds —
    * kept as the builtin-HOF twin the spec compares against, same
    * contract as the hash/vector expressions vs their HOF twins.
    */
  def encodeFold(df: DataFrame, textCol: String, idCol: String,
                 rules: Seq[Rule]): DataFrame = {
    val toks = df.select(col(idCol),
      posexplode(Text.tokens(col(textCol))).as(Seq("pos", "word")))
    val merged = rules.sortBy(_.step).foldLeft(split(col("word"), ""): Column) {
      (c, rule) => mergeFold(c, rule.lhs, rule.rhs)
    }
    toks.select(col(idCol), col("pos"), col("word"),
      array_join(merged, " ").as("subwords"),
      size(merged).as("n_subwords"))
  }

  // ---------------------------------------------------- oracle builder

  /** DuckDB SQL that replays `nMerges` training rounds from the same
    * corpus: round k = pair-count CTE over the space-joined symbol
    * state, argmax CTE (same tiebreak), recursive-CTE fixpoint REPLACE
    * applying the merge (plain REPLACE iterated to fixpoint ≡ the
    * greedy fold — each pass is left-to-right non-overlapping and the
    * chain converges to the same segmentation). Generated, not
    * hand-written: the rounds are mechanical and the generator is the
    * single source of their shape.
    */
  private def oracleRounds(nMerges: Int): String = {
    val sb = new StringBuilder
    sb.append(
      """WITH RECURSIVE st0 AS MATERIALIZED (
        |  SELECT word, COUNT(*) AS cnt,
        |         ' ' || ARRAY_TO_STRING(REGEXP_EXTRACT_ALL(word, '.'), ' ') || ' ' AS seq
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
        |b$k AS MATERIALIZED (SELECT l, r, c FROM p$k ORDER BY c DESC, l, r LIMIT 1),
        |fix$k AS (
        |  SELECT word, cnt, seq FROM $prev
        |  UNION
        |  SELECT word, cnt,
        |         REPLACE(seq, (SELECT ' '||l||' '||r||' ' FROM b$k),
        |                      (SELECT ' '||l||r||' ' FROM b$k))
        |  FROM fix$k
        |  WHERE seq <> REPLACE(seq, (SELECT ' '||l||' '||r||' ' FROM b$k),
        |                            (SELECT ' '||l||r||' ' FROM b$k))),
        |st$k AS MATERIALIZED (
        |  SELECT word, cnt, seq FROM fix$k
        |  WHERE seq = REPLACE(seq, (SELECT ' '||l||' '||r||' ' FROM b$k),
        |                           (SELECT ' '||l||r||' ' FROM b$k)))""".stripMargin)
    }
    sb.toString
  }

  /** Oracle for the trainer gate: the N argmax rows, ranked. */
  def trainOracle(nMerges: Int): String = {
    val rows = (1 to nMerges)
      .map(k => s"SELECT $k AS step, l AS lhs, r AS rhs, l||r AS merged, c AS pair_count FROM b$k")
      .mkString("\n", "\nUNION ALL\n", "\n")
    oracleRounds(nMerges) +
      s"""
        |SELECT CAST(step AS INTEGER) AS step, lhs, rhs, merged,
        |       CAST(pair_count AS BIGINT) AS pair_count
        |FROM ($rows) ORDER BY step""".stripMargin
  }

  /** Oracle for the encoder gate: re-derive the rules (same rounds),
    * then push every document token through the same fixpoint-REPLACE
    * chain in rank order.
    */
  def encodeOracle(nMerges: Int): String = {
    val sb = new StringBuilder(oracleRounds(nMerges))
    sb.append(
      """,
        |d0 AS MATERIALIZED (
        |  SELECT doc_id, pos, word,
        |         ' ' || ARRAY_TO_STRING(REGEXP_EXTRACT_ALL(word, '.'), ' ') || ' ' AS seq
        |  FROM (
        |    SELECT doc_id, pos, t[pos + 1] AS word
        |    FROM (SELECT doc_id, t, UNNEST(RANGE(0, LEN(t))) AS pos
        |          FROM (SELECT doc_id,
        |                       LIST_FILTER(
        |                         STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g')), ' '),
        |                         x -> x <> '') AS t
        |                FROM documents))))""".stripMargin)
    for (k <- 1 to nMerges) {
      val prev = s"d${k - 1}"
      sb.append(s""",
        |dfix$k AS (
        |  SELECT doc_id, pos, word, seq FROM $prev
        |  UNION
        |  SELECT doc_id, pos, word,
        |         REPLACE(seq, (SELECT ' '||l||' '||r||' ' FROM b$k),
        |                      (SELECT ' '||l||r||' ' FROM b$k))
        |  FROM dfix$k
        |  WHERE seq <> REPLACE(seq, (SELECT ' '||l||' '||r||' ' FROM b$k),
        |                            (SELECT ' '||l||r||' ' FROM b$k))),
        |d$k AS MATERIALIZED (
        |  SELECT doc_id, pos, word, seq FROM dfix$k
        |  WHERE seq = REPLACE(seq, (SELECT ' '||l||' '||r||' ' FROM b$k),
        |                           (SELECT ' '||l||r||' ' FROM b$k)))""".stripMargin)
    }
    sb.append(s"""
      |SELECT doc_id, CAST(pos AS INTEGER) AS pos, word,
      |       TRIM(seq) AS subwords,
      |       CAST(LEN(STRING_SPLIT(TRIM(seq), ' ')) AS INTEGER) AS n_subwords
      |FROM d$nMerges ORDER BY doc_id, pos""".stripMargin)
    sb.toString
  }
}

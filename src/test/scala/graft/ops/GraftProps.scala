package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.SparkTestBase

/** Property-based invariants (SURVEY.md §5): bounds monotone in k,
  * explode row-count conservation, validators only ever null-out values.
  * Few-but-real Spark cases per property (each case runs a job).
  */
object GraftProps extends Properties("graft") {
  import graft.SparkTestBase.spark.implicits._
  private lazy val spark = SparkTestBase.spark

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private val values = Gen.nonEmptyListOf(Gen.chooseNum(0.0, 1000.0))

  property("locscaleb bounds widen monotonically in k") =
    forAll(values, Gen.chooseNum(0.5, 3.0), Gen.chooseNum(0.5, 3.0)) { (xs, k1, k2) =>
      val (lo, hi) = if (k1 < k2) (k1, k2) else (k2, k1)
      def width(k: Double): Option[Double] = {
        val r = xs.toDF("x").agg(Bounds.locscaleb(col("x"), k, logt = true).as("b"))
          .select("b.lower_low", "b.upper_up").collect().head
        if (r.isNullAt(0)) None else Some(r.getDouble(1) - r.getDouble(0))
      }
      (width(lo), width(hi)) match {
        case (Some(a), Some(b)) => a <= b + 1e-12
        case (a, b) => a.isDefined == b.isDefined // guards trip identically
      }
    }

  property("explodeWithIndex conserves rows: sum of sizes + empties") =
    forAll(Gen.listOf(Gen.listOf(Gen.alphaStr))) { nested =>
      val df = nested.zipWithIndex.map { case (xs, i) => (i, xs) }.toDF("id", "xs")
      val out = Restructure.explodeWithIndex(df, "xs", "n", "x")
      val expected = nested.map(xs => math.max(xs.size, 1)).sum // empty → placeholder row
      out.count() == expected
    }

  property("validatePriceKg only masks: outputs are original value or null") =
    forAll(Gen.nonEmptyListOf(Gen.zip(Gen.chooseNum(1.0, 500.0), Gen.oneOf("a", "b")))) { rows =>
      val df = rows.zipWithIndex.map { case ((p, t), i) => ("f", s"s$i", t, p, p * 2, 3.0) }
        .toDF("form_name", "survey_id", "catch_taxon", "price_kg", "catch_price", "catch_kg")
      val out = graft.pipeline.Validate.validatePriceKg(df, 2.5).collect()
      val orig = rows.zipWithIndex.map { case ((p, _), i) => s"s$i" -> p }.toMap
      out.forall { r =>
        val sid = r.getString(r.fieldIndex("survey_id"))
        val idx = r.fieldIndex("price_kg")
        r.isNullAt(idx) || r.getDouble(idx) == orig(sid)
      } && out.length == rows.length
    }

  // a few-word vocabulary + short docs force genuine span collisions
  private val spanDocs = Gen.nonEmptyListOf(
    Gen.listOfN(12, Gen.oneOf("a", "b", "c")).map(_.mkString(" ")))
      .map(_.take(12))

  property("duplicatedSpanStats: totals conserve and spans bound tokens") =
    forAll(spanDocs, Gen.chooseNum(2, 5)) { (texts, k) =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val out = Dedup.duplicatedSpanStats(df, "text", "doc_id", k).collect()
      // total function: one output row per input row, dup ≤ spans,
      // spans = max(tokens - k + 1, 0) for every doc
      out.length == texts.length && out.forall { r =>
        val toks = texts(r.getLong(0).toInt).split(" ").count(_.nonEmpty)
        val spans = math.max(toks - k + 1, 0)
        r.getLong(1) == spans && r.getLong(2) <= spans
      }
    }

  property("stripDuplicatedSpans: kept + removed = tokens; idempotent-safe totals") =
    forAll(spanDocs, Gen.chooseNum(2, 5)) { (texts, k) =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val out = Dedup.stripDuplicatedSpans(df, "text", "doc_id", k).collect()
      out.length == texts.length && out.forall { r =>
        val toks = texts(r.getLong(0).toInt).split(" ").count(_.nonEmpty)
        val kept = r.getLong(2)
        val removed = r.getLong(3)
        kept + removed == toks &&
          r.getString(1).split(" ").count(_.nonEmpty) == kept
      }
    }

  property("reweightMixture: per-row copies are floor(w) or ceil(w)") =
    forAll(Gen.nonEmptyListOf(Gen.alphaNumStr.suchThat(_.nonEmpty)),
      Gen.chooseNum(0.0, 3.0)) { (keys, w) =>
      val df = keys.distinct.zipWithIndex.map { case (s, i) => (i.toLong, s, "g") }
        .toDF("id", "key", "grp")
      val out = Corpus.reweightMixture(df, "grp", "key", Map("g" -> w))
        .groupBy("id").count().collect().map(_.getLong(1))
      val lo = math.floor(w).toLong
      out.forall(c => c == math.max(lo, 1L) || c == lo + 1) &&
        (w >= 1.0 || out.length <= keys.distinct.length) // weight<1 may drop rows
    }

  // random tails behind valid magic prefixes steer the fuzz into the
  // parsers' chunk/bit-unpacking paths instead of the magic-check reject
  private val headerFuzz: Gen[Array[Byte]] = for {
    prefix <- Gen.oneOf("", "RIFF", "fLaC", "ID3", "RIFFxxxxWEBP", "RIFFxxxxWAVE")
    tail <- Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
  } yield prefix.getBytes("US-ASCII") ++ tail

  property("multimodal header parsers never throw on arbitrary bytes") =
    forAll(headerFuzz) { p =>
      // a messy corpus feeds these parsers garbage constantly; the
      // contract is None (or a stub downstream), never an exception
      Multimodal.parseWavHeader(p)
      Multimodal.parseMp3Header(p)
      Multimodal.parseFlacHeader(p)
      Multimodal.parseWebpHeader(p)
      true
    }

  property("selectByQualityBudget: kept set grows monotonically with budget") =
    forAll(Gen.nonEmptyListOf(Gen.zip(Gen.chooseNum(0.0, 1.0), Gen.chooseNum(1L, 50L))),
      Gen.chooseNum(0L, 500L), Gen.chooseNum(0L, 500L)) { (rows, b1, b2) =>
      val (small, big) = if (b1 < b2) (b1, b2) else (b2, b1)
      val df = rows.zipWithIndex.map { case ((s, t), i) => (i.toLong, s, t) }
        .toDF("id", "score", "toks")
      def kept(b: Long) = Corpus.selectByQualityBudget(df, "score", "toks", b)
        .select("id").collect().map(_.getLong(0)).toSet
      kept(small).subsetOf(kept(big))
    }
}

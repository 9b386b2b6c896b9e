package graft

import org.apache.spark.sql.functions._
import graft.functions.{ShingleFunctions => SF, TextFunctions => TF}

/** Bit-identity pins for the fused shingle→hash32→minhash/simhash kernels
  * (r18): each fused expression must reproduce the Column/HOF chain it
  * replaces EXACTLY — the signature tables, containment postings, and LSH
  * bands all compare these values against the DuckDB oracle's mirror, so
  * a single differing bit breaks differential correctness. */
class ShingleExprSpec extends SparkSpec {
  import spark.implicits._

  // edge cases: empty text, single token, exactly n / n±1 tokens, repeated
  // tokens, multiple consecutive spaces (empty tokens), leading/trailing
  // spaces, unicode multi-byte tokens, long docs, null text
  private val texts: Seq[String] = Seq(
    "", " ", "  ", "a", "a b", "a b c", "a b c d", "a a a a a",
    "x  y", " lead", "trail ", "über große bäume",
    "日本語 テスト 文字 列", "a b c d e f g h i j k l m n o p",
    (1 to 400).map(i => s"tok$i").mkString(" "),
    ((1 to 50).map(_ => "rep").mkString(" ")),
    null)

  private def df = texts.zipWithIndex
    .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")

  test("ShingleHashesExpr == transform(shingles, hash32), n = 1..5") {
    for (n <- 1 to 5) {
      val rows = df.select(
          col("id"),
          transform(TF.shingles(col("text"), n), TF.hash32(_)).as("old"),
          SF.shingleHashes(col("text"), n).as("fused"))
        .collect()
      rows.foreach { r =>
        assert(r.getSeq[Long](1) == r.getSeq[Long](2),
          s"n=$n id=${r.getLong(0)}: ${r.getSeq[Long](1)} != ${r.getSeq[Long](2)}")
      }
    }
  }

  test("MinhashFromHashesExpr == minhashSignatureFromHashes, k = 1, 8, 16") {
    for (k <- Seq(1, 8, 16)) {
      val hs = array_distinct(SF.shingleHashes(col("text"), 3))
      val rows = df.select(
          col("id"),
          TF.minhashSignatureFromHashes(hs, k).as("old"),
          SF.minhashSigFromHashes(hs, k).as("fused"))
        .collect()
      rows.foreach { r =>
        assert(r.getSeq[Long](1) == r.getSeq[Long](2),
          s"k=$k id=${r.getLong(0)}")
      }
    }
  }

  test("minhash over the fused hash array == full legacy chain from strings") {
    // the q_minhash entry swaps minhashSignature(shingles(text)) for the
    // fused chain — pin the whole replacement end to end
    val rows = df.select(
        col("id"),
        TF.minhashSignature(TF.shingles(col("text"), 3), 8).as("old"),
        SF.minhashSigFromHashes(SF.shingleHashes(col("text"), 3), 8).as("fused"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"id=${r.getLong(0)}")
    }
  }

  test("SimhashExpr == simhash32") {
    val rows = df.select(
        col("id"),
        TF.simhash32(col("text")).as("old"),
        SF.simhash(col("text")).as("fused"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"id=${r.getLong(0)}")
    }
  }

  test("fused kernels reproduce the chains over real fixture text") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents").limit(200)
    val bad = docs.select(
        transform(TF.shingles(col("text"), 3), TF.hash32(_)).as("o1"),
        SF.shingleHashes(col("text"), 3).as("f1"),
        TF.simhash32(col("text")).as("o2"),
        SF.simhash(col("text")).as("f2"))
      .filter(not(col("o1") === col("f1")) || col("o2") =!= col("f2"))
      .count()
    assert(bad == 0)
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.{TextFunctions => TF, VectorFunctions => VF}

/**
 * Deduplication suite for training-data pipelines — exact, MinHash-LSH,
 * SimHash, n-gram Jaccard, and embedding-cosine near-dup.
 *
 * Scale notes (the part that matters at 100 TB):
 *  - exact dedup is one hash-shuffle on a 16-byte digest, never on the text;
 *  - MinHash-LSH shuffles (band, bandHash) pairs — candidate generation is
 *    linear; only within-bucket pairs are scored, never the cross product;
 *  - SimHash buckets by table-split prefixes for the same reason;
 *  - embedding near-dup goes through the same LSH-style bucketing via
 *    random hyperplanes rather than an O(n^2) cosine matrix.
 */
object Dedup {

  /** Exact dedup on a digest of `textCol`: keeps the row with the smallest
    * key per digest (deterministic winner), drops the rest. Shuffles only
    * (digest, key) — the canonical 100 TB-safe formulation. */
  def exact(df: DataFrame, textCol: String, keyCol: String): DataFrame = {
    val withH = df.withColumn("_digest", md5(col(textCol)))
    val winners = withH.groupBy(col("_digest")).agg(min(col(keyCol)).as(keyCol))
    withH.join(winners, Seq("_digest", keyCol), "left_semi").drop("_digest")
  }

  /**
   * MinHash + LSH banding (Broder/LSH standard): k-hash signature over
   * n-gram shingles, split into `bands`; docs sharing any band bucket are
   * candidates; candidates verified by exact Jaccard >= threshold.
   * Returns candidate duplicate PAIRS (keyA < keyB) with their Jaccard.
   */
  def minhashLsh(df: DataFrame, textCol: String, keyCol: String,
                 shingleN: Int = 3, numHashes: Int = 16, bands: Int = 4,
                 threshold: Double = 0.8): DataFrame = {
    val rowsPerBand = numHashes / bands
    val sig = df
      .select(col(keyCol), TF.shingles(col(textCol), shingleN).as("_sh"))
      .withColumn("_sig", TF.minhashSignature(col("_sh"), numHashes))
      .withColumn("_sh", array_distinct(col("_sh")))

    // band id -> hash of that band's signature slice
    val banded = sig.select(
      col(keyCol), col("_sh"),
      posexplode(array((0 until bands).map { b =>
        md5(concat_ws(",", slice(col("_sig"), b * rowsPerBand + 1, rowsPerBand)))
      }: _*)).as(Seq("_band", "_bh")))

    val a = banded.as("a")
    val b = banded.as("b")
    val pairs = a.join(b,
        col("a._band") === col("b._band") && col("a._bh") === col("b._bh") &&
          col(s"a.$keyCol") < col(s"b.$keyCol"))
      .select(col(s"a.$keyCol").as("key_a"), col(s"b.$keyCol").as("key_b"),
        col("a._sh").as("_sha"), col("b._sh").as("_shb"))
      .dropDuplicates("key_a", "key_b")

    pairs
      .withColumn("jaccard", TF.jaccard(col("_sha"), col("_shb")))
      .filter(col("jaccard") >= threshold)
      .select(col("key_a"), col("key_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** SimHash near-dup: 32-bit signature; candidates = equal on any of 4
    * 8-bit prefixes-rotations (table-split), verified by Hamming distance. */
  def simhashPairs(df: DataFrame, textCol: String, keyCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val sigs = df.select(col(keyCol), TF.simhash32(col(textCol)).as("_sig"))
    val tables = 4
    val banded = sigs.select(col(keyCol), col("_sig"),
      posexplode(array((0 until tables).map { t =>
        shiftright(col("_sig"), t * 8) % 256
      }: _*)).as(Seq("_t", "_band")))
    val a = banded.as("a"); val b = banded.as("b")
    val hamming = {
      val x = col("a._sig").bitwiseXOR(col("b._sig"))
      (0 until 32).map(i => ((shiftright(x, i) % 2)).cast(IntegerType)).reduce(_ + _)
    }
    a.join(b, col("a._t") === col("b._t") && col("a._band") === col("b._band") &&
        col(s"a.$keyCol") < col(s"b.$keyCol"))
      .select(col(s"a.$keyCol").as("key_a"), col(s"b.$keyCol").as("key_b"),
        hamming.as("hamming"))
      .dropDuplicates("key_a", "key_b")
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact n-gram Jaccard similarity for an explicit candidate pair set —
    * the verification kernel shared by the LSH paths. */
  def ngramJaccardJoin(df: DataFrame, textCol: String, keyCol: String,
                       shingleN: Int, minJaccard: Double): DataFrame = {
    val sh = df.select(col(keyCol), array_distinct(TF.shingles(col(textCol), shingleN)).as("_sh"))
    // block on a cheap feature (shingle-count band) to avoid the full cross;
    // floor() (not cast-truncate) so the banding is engine-portable
    val withLen = sh.withColumn("_nb", floor(size(col("_sh")) / 10).cast(IntegerType))
    val a = withLen.as("a"); val b = withLen.as("b")
    a.join(b, col("a._nb") === col("b._nb") && col(s"a.$keyCol") < col(s"b.$keyCol"))
      .select(col(s"a.$keyCol").as("key_a"), col(s"b.$keyCol").as("key_b"),
        round(TF.jaccard(col("a._sh"), col("b._sh")), 6).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /**
   * Embedding-cosine near-dup: random-hyperplane LSH buckets (sign bits of
   * `planes` fixed random projections), exact cosine verification within
   * buckets. Pre-normalized vectors => cosine = dot.
   */
  def embeddingNearDup(df: DataFrame, vecCol: String, keyCol: String,
                       minCosine: Double = 0.95, planes: Int = 8,
                       dim: Int = 64, seed: Long = 42L): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val hyps = Array.fill(planes)(Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat))
    val bucket = (0 until planes).map { p =>
      when(VF.cosine(col(vecCol), hyps(p)) >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

    val bucketed = df.select(col(keyCol), col(vecCol)).withColumn("_bkt", bucket)
    val a = bucketed.as("a"); val b = bucketed.as("b")
    a.join(b, col("a._bkt") === col("b._bkt") && col(s"a.$keyCol") < col(s"b.$keyCol"))
      .select(col(s"a.$keyCol").as("key_a"), col(s"b.$keyCol").as("key_b"),
        round(VF.dot(col(s"a.$vecCol"), col(s"b.$vecCol")), 6).as("cosine"))
      .filter(col("cosine") >= minCosine)
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.functions.{TextFunctions => TF, VectorFunctions => VF}

/**
 * Deduplication suite for training-data pipelines — exact, MinHash-LSH,
 * SimHash, n-gram Jaccard, and embedding-cosine near-dup.
 *
 * Scale notes (the part that matters at 100 TB):
 *  - exact dedup is one hash-shuffle on a 16-byte digest, never on the text;
 *  - ALL near-dup paths share one candidate-generation shape: a persisted
 *    signature table is exploded to (band, bandHash) rows and self-joined on
 *    the band key — candidate generation is linear in corpus size, only keys
 *    cross the band shuffle, and the expensive payloads (shingle arrays) are
 *    fetched by joining BACK to the persisted signature table only for the
 *    surviving candidate pairs;
 *  - at cluster scale the `persist()` becomes a materialized signature table
 *    (write once, reuse for every band and the verify join) — the plan shape
 *    is identical.
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
   * Shared MinHash-LSH candidate kernel (Broder '97 / standard banding):
   * k-hash signature over n-gram shingles, split into `bands`; docs sharing
   * any band bucket are candidate pairs; candidates are verified by exact
   * Jaccard over the distinct-shingle sets.
   *
   * Plan shape, deliberately: (1) the signature table (key, shingles, sig)
   * is computed ONCE and persisted — round-1's version recomputed the whole
   * shingle pipeline on both sides of the self-join; (2) the band self-join
   * carries only (key, band, bandHash) — no arrays cross that shuffle;
   * (3) shingle arrays are joined back only for deduplicated candidate
   * pairs, a result set orders of magnitude smaller than the corpus.
   *
   * Recall is governed by (numHashes, bands): P(candidate) =
   * 1-(1-s^r)^bands with r = numHashes/bands — NOT by document length, which
   * was the correctness flaw of the round-1 shingle-count banding.
   */
  def minhashLsh(df: DataFrame, textCol: String, keyCol: String,
                 shingleN: Int = 3, numHashes: Int = 16, bands: Int = 4,
                 threshold: Double = 0.8): DataFrame = {
    val rowsPerBand = numHashes / bands
    require(rowsPerBand * bands == numHashes, "bands must divide numHashes")

    val base = df
      .select(col(keyCol), array_distinct(TF.shingles(col(textCol), shingleN)).as("_sh"))
      .withColumn("_sig", TF.minhashSignature(col("_sh"), numHashes))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // band id -> hash of that band's signature slice; only (key, band, hash)
    // rows enter the self-join shuffle
    val banded = base.select(
      col(keyCol),
      posexplode(array((0 until bands).map { b =>
        md5(concat_ws(",", slice(col("_sig"), b * rowsPerBand + 1, rowsPerBand)))
      }: _*)).as(Seq("_band", "_bh")))

    val cand = banded.as("a").join(banded.as("b"),
        col("a._band") === col("b._band") && col("a._bh") === col("b._bh") &&
          col(s"a.$keyCol") < col(s"b.$keyCol"))
      .select(col(s"a.$keyCol").as("key_a"), col(s"b.$keyCol").as("key_b"))
      .dropDuplicates("key_a", "key_b")

    // fetch shingle sets only for surviving candidates, verify exact Jaccard
    cand
      .join(base.select(col(keyCol).as("key_a"), col("_sh").as("_sha")), Seq("key_a"))
      .join(base.select(col(keyCol).as("key_b"), col("_sh").as("_shb")), Seq("key_b"))
      .withColumn("jaccard", TF.jaccard(col("_sha"), col("_shb")))
      .filter(col("jaccard") >= threshold)
      .select(col("key_a"), col("key_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /**
   * Exact n-gram Jaccard near-dup pairs at scale: candidates from the
   * MinHash-LSH kernel (high-recall parameters: 32 hashes x 16 bands of 2 ⇒
   * P(candidate | jaccard 0.5) ≈ 1-(1-0.25)^16 ≈ 99%), verified by exact
   * Jaccard on the candidate pairs only. Replaces round-1's shingle-count
   * banding, which was both a scale-killer (skewed mega-bands ⇒ effectively
   * all-pairs with full arrays in the shuffle) and a recall hole (near-dups
   * straddling a count decile were never compared).
   */
  def ngramJaccardJoin(df: DataFrame, textCol: String, keyCol: String,
                       shingleN: Int, minJaccard: Double): DataFrame =
    minhashLsh(df, textCol, keyCol, shingleN,
      numHashes = 32, bands = 16, threshold = minJaccard)

  /** SimHash near-dup: 32-bit signature; candidates = equal on any of 4
    * 8-bit table-split bands, verified by Hamming distance (bit_count of
    * xor — single codegen'd instruction, not 32 shift-add terms). The
    * signature table is persisted so the per-document simhash (a 32-term
    * HOF reduction) is computed once, not once per join side. */
  def simhashPairs(df: DataFrame, textCol: String, keyCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val sigs = df.select(col(keyCol), TF.simhash32(col(textCol)).as("_sig"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val tables = 4
    val banded = sigs.select(col(keyCol), col("_sig"),
      posexplode(array((0 until tables).map { t =>
        shiftright(col("_sig"), t * 8) % 256
      }: _*)).as(Seq("_t", "_band")))
    val a = banded.as("a"); val b = banded.as("b")
    // hamming filter BEFORE the pair-dedup shuffle: only true near-dups
    // (hamming <= max) pay the dropDuplicates exchange
    a.join(b, col("a._t") === col("b._t") && col("a._band") === col("b._band") &&
        col(s"a.$keyCol") < col(s"b.$keyCol"))
      .select(col(s"a.$keyCol").as("key_a"), col(s"b.$keyCol").as("key_b"),
        bit_count(col("a._sig").bitwiseXOR(col("b._sig"))).cast("int").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("key_a", "key_b")
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
      .persist(StorageLevel.MEMORY_AND_DISK)
    val a = bucketed.as("a"); val b = bucketed.as("b")
    a.join(b, col("a._bkt") === col("b._bkt") && col(s"a.$keyCol") < col(s"b.$keyCol"))
      .select(col(s"a.$keyCol").as("key_a"), col(s"b.$keyCol").as("key_b"),
        round(VF.dot(col(s"a.$vecCol"), col(s"b.$vecCol")), 6).as("cosine"))
      .filter(col("cosine") >= minCosine)
  }
}

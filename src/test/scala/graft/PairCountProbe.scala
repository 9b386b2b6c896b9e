package graft

/** Scratch probe (test scope): output-row counts of the pair-producing
  * queries at two fixtures — the denominator for reading the wide scale
  * curve. The sf05 fixture replicates every document as k=5 NEAR-dup
  * copies (FixtureGen), so the true near-dup pair set grows ~C(k,2)/row
  * by construction; a time flag on those queries must be normalized by
  * output pairs before it can be called a plan defect. */
object PairCountProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PairCountProbe <smallDir> <bigDir> [out.json]")
    val spark = EngineSession.builder("local[32]", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = Seq("q_minhash_neardup", "q_minhash_prebuilt",
      "q_ngram_jaccard", "q_dup_matrix", "q_geo_pairs", "q_neardup_dedup",
      "q_simhash_neardup", "q_embedding_neardup", "q_range_join",
      "q_substring_dedup")
    // q_range_join aggregates its matches per user, so its ROW count
    // hides the join's true output: the replicated fixture grows both
    // points and overlapping intervals k×, making TRUE matches ~k² by
    // construction. The work denominator is the matched-pair total =
    // sum(n_in_window) over the final frame (exactly the rows the
    // binned join produced and the aggregate consumed).
    // q_substring_dedup likewise: rows stay ~docs, but the replicated
    // fixture turns almost every token into part of a repeated passage,
    // so the kernel's true work — tokens it must find and remove — is
    // sum(n_removed), not the row count.
    // coalesce(sum, 0): sum() over an empty frame is NULL and getLong
    // would NPE — a fixture change emptying these queries must record 0
    // (and trip the gate's sanity checks), not crash the probe and leave
    // the gate reading stale denominators
    def sumOf(colName: String)(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(org.apache.spark.sql.functions.coalesce(
        org.apache.spark.sql.functions.sum(colName),
        org.apache.spark.sql.functions.lit(0L))).head().getLong(0)
    val workMeasure: Map[String, org.apache.spark.sql.DataFrame => Long] =
      Map(
        "q_range_join" -> sumOf("n_in_window"),
        "q_substring_dedup" -> sumOf("n_removed"))
    // renames in SparkEntry must fail LOUDLY here, not as a bare
    // NoSuchElementException mid-run — and any name silently dropped from
    // the suite would otherwise leave the gate reading stale denominators
    val missing = names.filterNot(SparkEntry.queries.contains)
    require(missing.isEmpty,
      s"PairCountProbe names not in SparkEntry.queries (renamed/removed?): " +
        missing.mkString(", "))
    val counts = names.map { n =>
      val measure = workMeasure.getOrElse(n,
        (df: org.apache.spark.sql.DataFrame) => df.count())
      val cs = args.take(2).map(d => measure(SparkEntry.queries(n)(spark, d)))
      println(s"[paircount] $n small=${cs(0)} big=${cs(1)}")
      s"""${JsonUtil.str(n)}: [${cs(0)}, ${cs(1)}]"""
    }
    // provenance rides in the file ("_"-prefixed keys are invisible to the
    // gate's per-query lookups): which fixtures and when — scale_curve.py
    // echoes this into its report so a record reader can check the
    // denominators came from the run being judged
    val meta = s""""_meta": {"small_dir": ${JsonUtil.str(args(0))}, """ +
      s""""big_dir": ${JsonUtil.str(args(1))}, """ +
      s""""generated_utc": ${JsonUtil.str(java.time.Instant.now().toString)}}"""
    val json = (meta +: counts).mkString("{", ", ", "}")
    if (args.length > 2) {
      java.nio.file.Files.write(java.nio.file.Paths.get(args(2)),
        json.getBytes("UTF-8"))
      println(s"[paircount] wrote ${args(2)}")
    }
    spark.stop()
  }
}

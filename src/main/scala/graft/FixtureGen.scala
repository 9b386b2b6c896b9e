package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multi-split / wider-SF fixture generator — the empirical leg of the
 * 100 TB scale story. The driver fixtures (`TESTDATA.md`) are one parquet
 * FILE per table, so every bench scan is one split: per-query times carry
 * a serial-scan component that vanishes on any real cluster (and on any
 * real dataset, which arrives as thousands of splits). This main writes a
 * derived fixture whose layout matches the scale claims being tested:
 *
 *   runMain graft.FixtureGen <srcDir> <outDir> [copies=1] [splits=8]
 *
 * - `copies = 1` re-splits the source tables (same rows, `splits` parquet
 *   part files each — the "does the plan parallelize" fixture).
 * - `copies = k > 1` additionally scales row volume k× with
 *   referentially-consistent key offsets: copy i shifts every primary and
 *   foreign key by i·(max key + 1), so join fan-outs, group counts per
 *   key, and index structure match a genuinely larger corpus instead of a
 *   degenerate one. Dimension tables `region`/`nation` stay fixed (5/25
 *   rows — bounded in the real schema too); every fact/dim that grows
 *   with corpus size replicates.
 * - `documents.text` gets a short per-copy suffix (copy > 0) so exact
 *   dedup does not see k-way hash-identical groups — copies are NEAR
 *   duplicates (realistic crawl re-fetch shape), exercising the LSH band
 *   join with bounded (size-k) candidate groups.
 *
 * Deterministic (pure column arithmetic on seed-42 source data, no RNG,
 * no timestamps), so two generations of the same (src, copies, splits)
 * are row-identical and DuckDB can oracle the derived fixture directly —
 * `tools/bench_oracle.py` / `tools/check.py` glob directory-style tables.
 */
object FixtureGen {

  /** (table, primary-key column) for every table that scales with corpus
    * size; FK columns are offset with their owning table's base. */
  private val keyedTables = Seq(
    "customer" -> "c_custkey",
    "supplier" -> "s_suppkey",
    "part" -> "p_partkey",
    "orders" -> "o_orderkey",
    "lineitem" -> "", // composite (l_orderkey, l_linenumber): FK offsets only
    "events" -> "event_id",
    "documents" -> "doc_id",
    "embeddings" -> "vec_id")

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: FixtureGen <srcDir> <outDir> [copies=1] [splits=8]")
    val src = args(0)
    val out = args(1)
    val copies = if (args.length > 2) args(2).toInt else 1
    val splits = if (args.length > 3) args(3).toInt else 8
    require(copies >= 1 && splits >= 1, "copies and splits must be >= 1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = EngineSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def load(name: String): DataFrame =
      spark.read.parquet(s"$src/$name.parquet")

    // key bases: i-th copy shifts key k to k + i*base; base = max+1 keeps
    // copies disjoint. Collected once per keyed table (bounded: one long).
    // cast("long") tolerates int-typed keys; an EMPTY source table yields
    // base 1 (replicating nothing is a no-op) — but a NON-empty table
    // whose max casts to NULL (string keys, all-null keys) must fail
    // LOUDLY: a silent base of 1 would collide every copy's key space.
    def keyBase(tbl: String, pk: String): Long = {
      val r = load(tbl)
        .agg(max(col(pk).cast("long")).as("m"), count(lit(1)).as("n")).head()
      if (r.getLong(1) == 0L) 1L
      else {
        require(!r.isNullAt(0),
          s"$tbl.$pk has no numeric max on a non-empty table (non-numeric " +
            "or all-null keys) — cannot derive a collision-free copy offset")
        r.getLong(0) + 1L
      }
    }
    val base: Map[String, Long] =
      if (copies == 1) Map.empty
      else keyedTables.collect { case (tbl, pk) if pk.nonEmpty =>
        tbl -> keyBase(tbl, pk)
      }.toMap + ("events.user_id" -> keyBase("events", "user_id"))

    def offset(c: String, b: Long, i: Int) = (col(c) + lit(i * b)).as(c)

    /** Copy i of a table with its PK/FK columns shifted. */
    def copyOf(name: String, df: DataFrame, i: Int): DataFrame = name match {
      case _ if i == 0 => df
      case "customer" =>
        df.withColumn("c_custkey", offset("c_custkey", base("customer"), i))
      case "supplier" =>
        df.withColumn("s_suppkey", offset("s_suppkey", base("supplier"), i))
      case "part" =>
        df.withColumn("p_partkey", offset("p_partkey", base("part"), i))
      case "orders" =>
        df.withColumn("o_orderkey", offset("o_orderkey", base("orders"), i))
          .withColumn("o_custkey", offset("o_custkey", base("customer"), i))
      case "lineitem" =>
        df.withColumn("l_orderkey", offset("l_orderkey", base("orders"), i))
          .withColumn("l_partkey", offset("l_partkey", base("part"), i))
          .withColumn("l_suppkey", offset("l_suppkey", base("supplier"), i))
      case "events" =>
        // user population grows with the corpus: per-user event counts
        // (sessionize / window workloads) keep their real distribution
        df.withColumn("event_id", offset("event_id", base("events"), i))
          .withColumn("user_id", offset("user_id", base("events.user_id"), i))
      case "documents" =>
        df.withColumn("doc_id", offset("doc_id", base("documents"), i))
          .withColumn("text", concat(col("text"), lit(s" rev$i")))
      case "embeddings" =>
        df.withColumn("vec_id", offset("vec_id", base("embeddings"), i))
      case _ => df // region / nation: bounded dims, single copy
    }

    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { name =>
      val df = load(name)
      val scaled =
        if (copies == 1 || name == "region" || name == "nation") df
        else (0 until copies).map(copyOf(name, df, _)).reduce(_ unionByName _)
      val parts = // tiny dims stay single-file; everything else multi-split
        if (name == "region" || name == "nation") 1 else splits
      scaled.repartition(parts)
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[fixturegen] $name -> $out/$name.parquet " +
        s"(${if (name == "region" || name == "nation") 1 else copies}x, " +
        s"$parts splits)")
    }
    spark.stop()
  }
}

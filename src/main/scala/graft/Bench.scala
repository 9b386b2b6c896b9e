package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): run every query on
  * SPARK_GRAFT_SF_DIR, print ONE JSON line with per-query seconds.
  * Each query is timed as min of two runs after a global warmup, so the
  * numbers measure the plan, not JVM/codegen cold start. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = EngineSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: exercise scan + shuffle + codegen machinery once
    Tables(spark, sfDir, "lineitem").groupBy("l_returnflag").count().collect()

    // Time FULL evaluation of every output column: `df.count()` lets Catalyst
    // prune projections (a compute-heavy select would be timed as just the
    // scan), so we count the *internal-row* RDD of the final plan — every
    // expression in the query runs, nothing is collected to the driver.
    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }

    // optional args = run only the named queries (local iteration aid);
    // the driver invokes with no args and gets the full suite
    val wanted = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => args.isEmpty || args.contains(n) }
    val results = wanted.map { case (name, fn) =>
      val sec =
        try math.min(timeOnce(fn), timeOnce(fn))
        catch { case _: Throwable => -1.0 }
      // release engine-held caches between queries: leftover signature
      // tables from earlier dedup queries otherwise squeeze the block
      // manager and GC, showing up as 3-5x run-order spikes on UNRELATED
      // queries (observed on q_ngram_jaccard / q_ntile / q_distinct_set
      // across rounds — isolated reruns were always clean). The explicit
      // GC lets the ContextCleaner reclaim localCheckpoint blocks (the
      // iterative clustering rounds), which have no unpersist handle and
      // otherwise wait for an organic driver GC.
      CacheRegistry.releaseAll()
      System.gc()
      name -> sec
    }
    // Emission order is chosen for tail-truncation survival: the driver
    // retains only the LAST ~2 KB of stdout, so the per-query map is sorted
    // ASCENDING by time (cheap queries first — if anything is cut, it's
    // them) and the headline total comes after the map, at the very end of
    // the line. FAILED queries (sentinel -1.0) sort LAST, not first — a
    // truncated line must never hide which queries errored. Seconds are
    // rounded to 1 ms to keep the line short.
    val qs = results.sortBy { case (_, v) =>
      if (v < 0) Double.MaxValue else v
    }.map { case (k, v) =>
      "\"" + k + "\":" + BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP)
    }.mkString("{", ",", "}")
    val total = BigDecimal(results.map(_._2).filter(_ >= 0).sum)
      .setScale(3, BigDecimal.RoundingMode.HALF_UP)
    println(s"""{"queries":$qs,"metric":"total","value":$total,"unit":"sec","sf":"$sfDir"}""")

    // The driver keeps only the stdout TAIL (~2 KB), which truncates the
    // per-query map past ~80 entries — so the COMPLETE record is also
    // written to a file inside the repo, name-sorted for stable diffs, and
    // committed alongside. Round-over-round comparison reads this file.
    // (skipped for filtered local-iteration runs — a partial map must never
    // overwrite the committed full record)
    if (args.isEmpty) {
      val fullPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
        "/root/repo/bench_full.json")
      // meta entries share the list with the per-query entries so one
      // mkString handles separators (an empty suite still emits valid JSON)
      val entries = results.sortBy(_._1).map { case (k, v) =>
        "\"" + k + "\": " + BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP)
      } ++ Seq(
        s""""_total_sec": $total""",
        s""""_sf": "$sfDir"""",
        s""""_n_queries": ${results.size}""")
      java.nio.file.Files.writeString(java.nio.file.Paths.get(fullPath),
        entries.mkString("{\n  ", ",\n  ", "\n}\n"))

      // The full line above is ~3.5 KB and the driver's 2 KB stdout tail
      // cuts its head off => "parsed": null in every BENCH record. Emit a
      // LAST line guaranteed to survive the tail whole: same shape, but the
      // queries map carries only the slowest entries (and every failure) up
      // to a byte budget — the complete map lives in bench_full.json.
      val budget = 1600
      val slowFirst = results.sortBy { case (_, v) =>
        if (v < 0) Double.MinValue else -v // failures first, then slowest
      }
      val kept = scala.collection.mutable.ArrayBuffer.empty[String]
      var used = 0
      slowFirst.foreach { case (k, v) =>
        val s = "\"" + k + "\":" + BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP)
        if (used + s.length + 1 <= budget) { kept += s; used += s.length + 1 }
      }
      println(s"""{"queries":${kept.mkString("{", ",", "}")},""" +
        s""""queries_omitted":${results.size - kept.size},""" +
        s""""full_record":"bench_full.json",""" +
        s""""metric":"total","value":$total,"unit":"sec","sf":"$sfDir"}""")
    }

    spark.stop()
  }
}

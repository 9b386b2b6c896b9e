package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** r18 memo-hygiene + prebuilt-artifact-memo pins (VERDICT #2/#8):
  * session-object keys, application-end eviction, and fingerprint
  * invalidation — a post-append probe must see the appended rows. */
class SessionCacheSpec extends SparkSpec {
  import spark.implicits._

  test("SessionCache keys by session object and evicts on application end") {
    val cache = new SessionCache[String]
    var builds = 0
    def get() = cache.getOrElseUpdate(spark, "k") { builds += 1; s"v$builds" }
    assert(get() == "v1" && get() == "v1" && builds == 1)
    // a second session over the same context gets its OWN entry (no
    // identity-hash aliasing possible: the key IS the object)
    val s2 = spark.newSession()
    assert(cache.getOrElseUpdate(s2, "k") { builds += 1; s"v$builds" } == "v2")
    assert(cache.entriesForTesting(spark) == 1 &&
      cache.entriesForTesting(s2) == 1)
    // application end (driven directly — stopping the shared test context
    // would kill every other suite) evicts BOTH sessions' entries
    SessionCache.evictAll(spark.sparkContext)
    assert(cache.entriesForTesting(spark) == 0 &&
      cache.entriesForTesting(s2) == 0)
    assert(get() == "v3") // rebuilt after eviction, not served stale
  }

  test("Tables.artifact: a post-append probe sees the appended files") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_artmemo_").resolve("postings").toString
    val half1 = Seq((1L, "alpha beta gamma delta"), (2L, "beta gamma delta eps"))
      .toDF("doc_id", "text")
    val half2 = Seq((3L, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
    Dedup.buildShinglePostings(half1, "text", "doc_id", root)
    val dir = operators.IndexLifecycle.resolveDir(spark, root)
    val before = Tables.artifact(spark, dir).count()
    // memo hit: same relation object served for the unchanged dir
    assert(Tables.artifact(spark, dir) eq Tables.artifact(spark, dir))
    Dedup.appendShinglePostings(half2, "text", "doc_id", root)
    val after = Tables.artifact(spark, dir).count()
    assert(after > before,
      s"post-append probe must see appended rows ($before -> $after)")
    // and the prebuilt containment probe (a Tables.artifact consumer)
    // surfaces the appended near-duplicate pair
    val pairs = Dedup.containmentPairsPrebuilt(spark, root,
        minContainment = 0.5, maxDf = 20)
      .select("key_a", "key_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 3L)), s"expected (1,3) in $pairs")
  }
}

package graft

import graft.operators.{Migrate, Snapshots}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** V1→V2 migration tool: the reference's hydraidectl migrate contract
  * (dry-run / verify / lock / delete-old / per-swamp phase reporting)
  * exercised end-to-end on real GOB-bodied command logs. */
class MigrateSpec extends SparkSpec {

  private val bodySchema = StructType(Seq(
    StructField("source", StringType),
    StructField("score", LongType)))

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-migrate").toString

  /** A V1 swamp: append-only (key, seq, op, gob-body) log. */
  private def writeV1(root: String, name: String,
                      rows: Seq[(String, Long, String, Option[(String, Long)])]): Unit = {
    import spark.implicits._
    val df = rows.toDF("key", "seq", "op", "raw")
      .select(col("key"), col("seq"), col("op"),
        when(col("raw").isNotNull,
          graft.functions.Gob.pack(struct(
            col("raw._1").as("source"), col("raw._2").as("score"))))
          .as("body"))
    df.write.mode("overwrite").parquet(s"$root/$name")
  }

  private def readV2(dst: String, name: String): DataFrame =
    Snapshots.read(spark, s"$dst/$name")

  test("migrate: LWW dedup, tombstones, counters, verify round-trip") {
    val src = tmp(); val dst = tmp()
    writeV1(src, "alpha", Seq(
      ("a", 1L, "U", Some(("web", 10L))),
      ("a", 2L, "U", Some(("web", 20L))),   // duplicate key — last wins
      ("b", 1L, "U", Some(("book", 5L))),
      ("c", 1L, "U", Some(("web", 7L))),
      ("c", 2L, "D", None)))                // tombstoned key — dropped
    val r = Migrate.v1ToV2(spark, src, dst, bodySchema)

    assert(r.totalSwamps == 1 && r.successfulSwamps == 1 && r.failedSwamps == 0)
    assert(r.totalRawEntries == 5)
    assert(r.totalEntries == 2)             // a (latest), b; c tombstoned
    assert(r.duplicateKeys == 2)            // a and c each had one extra entry
    val s = r.perSwamp.head
    assert(s.phase == "done" && s.tombstonedKeys == 1)
    assert(s.oldBytes > 0 && s.newBytes > 0)

    val back = readV2(dst, "alpha").orderBy("key")
      .collect().map(x => (x.getString(0), x.getString(1), x.getLong(2)))
    assert(back.toSeq == Seq(("a", "web", 20L), ("b", "book", 5L)))
  }

  test("migrate: empty-after-compaction swamp is skipped, not written") {
    val src = tmp(); val dst = tmp()
    writeV1(src, "ghost", Seq(
      ("x", 1L, "U", Some(("web", 1L))),
      ("x", 2L, "D", None)))
    val r = Migrate.v1ToV2(spark, src, dst, bodySchema)
    assert(r.emptySwampsSkipped == 1 && r.successfulSwamps == 0 && r.failedSwamps == 0)
    assert(r.perSwamp.head.skippedEmpty)
    assert(!new java.io.File(s"$dst/ghost").exists())
  }

  test("migrate: dry run counts everything and writes nothing") {
    val src = tmp(); val dst = tmp()
    writeV1(src, "alpha", Seq(("a", 1L, "U", Some(("web", 1L)))))
    val r = Migrate.v1ToV2(spark, src, dst, bodySchema,
      Migrate.Config(dryRun = true))
    assert(r.dryRun && r.totalEntries == 1 && r.successfulSwamps == 1)
    assert(!new java.io.File(s"$dst/alpha").exists())
    // dry-run takes no lock either
    assert(!new java.io.File(s"$dst/.migration-lock").exists())
  }

  test("migrate: corrupt GOB body fails the swamp in phase convert; others proceed") {
    val src = tmp(); val dst = tmp()
    writeV1(src, "good", Seq(("a", 1L, "U", Some(("web", 1L)))))
    // corrupt body: valid parquet, hostile bytes in the body column
    import spark.implicits._
    Seq(("z", 1L, "U", Array[Byte](0x7f, 0x00, 0x01, 0x02)))
      .toDF("key", "seq", "op", "body")
      .write.mode("overwrite").parquet(s"$src/bad")

    val r = Migrate.v1ToV2(spark, src, dst, bodySchema)
    assert(r.failedSwamps == 1 && r.successfulSwamps == 1)
    val bad = r.perSwamp.find(_.swamp == "bad").get
    assert(!bad.ok && bad.phase == "convert" && bad.error.isDefined)
    // the good swamp still migrated
    assert(readV2(dst, "good").count() == 1)
    // the failed swamp wrote NOTHING — no torn V2 output
    assert(!new java.io.File(s"$dst/bad").exists())
  }

  test("migrate: stopOnError halts remaining swamps") {
    val src = tmp(); val dst = tmp()
    import spark.implicits._
    // swamp names sort bad < good; parallel=1 forces sequential order so
    // the failure deterministically precedes the good swamp
    Seq(("z", 1L, "U", Array[Byte](0x7f, 0x01)))
      .toDF("key", "seq", "op", "body")
      .write.mode("overwrite").parquet(s"$src/a_bad")
    writeV1(src, "b_good", Seq(("a", 1L, "U", Some(("web", 1L)))))
    val r = Migrate.v1ToV2(spark, src, dst, bodySchema,
      Migrate.Config(stopOnError = true, parallel = 1))
    assert(r.failedSwamps == 2) // the real failure + the skipped remainder
    val skipped = r.perSwamp.find(_.swamp == "b_good").get
    assert(skipped.error.exists(_.contains("stop-on-error")))
  }

  test("migrate: lock file blocks a concurrent run and is removed after") {
    val src = tmp(); val dst = tmp()
    writeV1(src, "alpha", Seq(("a", 1L, "U", Some(("web", 1L)))))
    // simulate an in-flight migration
    new java.io.File(dst).mkdirs()
    val lock = new java.io.File(s"$dst/.migration-lock")
    assert(lock.createNewFile())
    val e = intercept[IllegalStateException] {
      Migrate.v1ToV2(spark, src, dst, bodySchema)
    }
    assert(e.getMessage.contains("lock"))
    lock.delete()
    // clean run succeeds and leaves no lock behind
    val r = Migrate.v1ToV2(spark, src, dst, bodySchema)
    assert(r.successfulSwamps == 1)
    assert(!lock.exists())
  }

  test("migrate: deleteOld removes the V1 source after a verified success") {
    val src = tmp(); val dst = tmp()
    writeV1(src, "alpha", Seq(("a", 1L, "U", Some(("web", 1L)))))
    val r = Migrate.v1ToV2(spark, src, dst, bodySchema,
      Migrate.Config(deleteOld = true))
    assert(r.successfulSwamps == 1)
    assert(!new java.io.File(s"$src/alpha").exists())
    assert(readV2(dst, "alpha").count() == 1)
  }

  test("migrate: concurrent workers migrate many swamps correctly") {
    val src = tmp(); val dst = tmp()
    val n = 6
    (0 until n).foreach { i =>
      writeV1(src, f"sw$i%02d", Seq(
        (s"k$i", 1L, "U", Some((s"src$i", i.toLong))),
        (s"k$i", 2L, "U", Some((s"src$i", i.toLong * 10)))))
    }
    val r = Migrate.v1ToV2(spark, src, dst, bodySchema,
      Migrate.Config(parallel = 4))
    assert(r.totalSwamps == n && r.successfulSwamps == n && r.failedSwamps == 0)
    assert(r.totalRawEntries == 2L * n && r.totalEntries == n.toLong)
    (0 until n).foreach { i =>
      val row = readV2(dst, f"sw$i%02d").head()
      assert(row.getString(0) == s"k$i" && row.getLong(2) == i.toLong * 10)
    }
  }

  test("migrate: report surfaces as a queryable DataFrame") {
    val src = tmp(); val dst = tmp()
    writeV1(src, "alpha", Seq(("a", 1L, "U", Some(("web", 1L)))))
    val r = Migrate.v1ToV2(spark, src, dst, bodySchema)
    val df = Migrate.reportDf(spark, r)
    assert(df.columns.contains("phase"))
    assert(df.filter(col("ok")).count() == 1)
  }
}

package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.Percentiles

/**
 * Pins [[Percentiles.fromSorted]] BIT-EXACT (no rounding) against the
 * built-in exact `percentile` aggregate across random groups, cut
 * points, duplicates, nulls, singleton and empty groups — the contract
 * that lets query plans swap the slow OpenHashMap aggregate for the
 * sorted-collect buffer without moving any oracle hash.
 */
class PercentilesSpec extends SparkSpec {

  private val rnd = new scala.util.Random(0xBEEF)

  private def compareOn(values: Seq[(Int, Option[Double])], p: Double): Unit = {
    val rows = values.map { case (g, v) =>
      Row(g, v.map(java.lang.Double.valueOf).orNull)
    }
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(StructField("g", IntegerType), StructField("x", DoubleType))))
    val got = df.groupBy("g")
      .agg(Percentiles.fromSorted(Percentiles.sortedVals(col("x")), p).as("v"))
      .collect().map(r => r.getInt(0) -> Option(r.get(1))).toMap
    val want = df.groupBy("g")
      .agg(expr(s"percentile(x, $p)").as("v"))
      .collect().map(r => r.getInt(0) -> Option(r.get(1))).toMap
    assert(got == want, s"p=$p got=$got want=$want")
  }

  test("bit-exact vs built-in percentile: 30 random group/p draws") {
    (1 to 30).foreach { _ =>
      val p = rnd.nextInt(5) match {
        case 0 => 0.0
        case 1 => 1.0
        case 2 => 0.5
        case _ => rnd.nextDouble()
      }
      val values = (0 until 400).map { _ =>
        val g = rnd.nextInt(5)
        val v =
          if (rnd.nextInt(10) == 0) None // nulls are skipped on both sides
          else if (rnd.nextInt(4) == 0) Some(rnd.nextInt(8).toDouble) // dups
          else Some((rnd.nextDouble() - 0.5) * 1e6)
        (g, v)
      }
      compareOn(values, p)
    }
  }

  test("singleton and all-null groups match the built-in") {
    compareOn(Seq((1, Some(42.0)), (2, None), (2, None)), 0.75)
  }

  test("empty input: fromSorted maps empty array to null") {
    val out = spark.range(1).select(
      Percentiles.fromSorted(array().cast("array<double>"), 0.5).as("v"))
      .collect().head
    assert(out.isNullAt(0))
  }

  test("integer inputs match the built-in (cast-to-double path)") {
    val rows = (0 until 300).map(i => Row(i % 3, rnd.nextInt(1000).toLong))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 3),
      StructType(Seq(StructField("g", IntegerType), StructField("x", LongType))))
    val got = df.groupBy("g")
      .agg(Percentiles.fromSorted(Percentiles.sortedVals(col("x")), 0.9).as("v"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val want = df.groupBy("g")
      .agg(expr("percentile(x, 0.9)").as("v"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(got == want)
  }
}

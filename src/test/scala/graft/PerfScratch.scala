package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Patch

/**
 * Scratch variant A/B bench (test scope, never shipped): candidate plan
 * shapes, timed interleaved in one JVM like [[PerfLab]]. Edit freely
 * between runs — nothing references this from main code.
 */
object PerfScratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = EngineSession.builder("local[32]", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables(spark, sfDir, "documents").groupBy("lang").count().collect()

    def once(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    def bench(name: String, df: => DataFrame): Unit = {
      val xs = (1 to 3).map(_ => once(df))
      println(f"$name%-28s min=${xs.min}%.3f  ${xs.map(x => f"$x%.3f").mkString("/")}")
    }

    // 5x-wider orders fixture (shifted keys so they stay unique)
    val wide = "/tmp/graft_orders_5x.parquet"
    if (!new java.io.File(wide).exists()) {
      val o = Tables(spark, sfDir, "orders")
      (0 until 5).map(i => o.withColumn("o_orderkey",
          col("o_orderkey") + lit(i.toLong * 10000000L)))
        .reduce(_ unionByName _)
        .repartition(8).write.mode("overwrite").parquet(wide)
    }

    def patchIndexed(src: DataFrame): DataFrame = {
      val base = src.withColumn("body", struct(
        array(
          struct(col("o_totalprice").as("price"), lit(1).as("qty")),
          struct((col("o_totalprice") + 1000.0).as("price"), lit(2).as("qty")),
          struct((col("o_totalprice") + 2000.0).as("price"), lit(3).as("qty"))
        ).as("items")))
      Patch.applyPatch(base, "body",
        Seq(Patch.SetField("items[0].qty", lit(9)),
          Patch.IncField("items[1].price", lit(10.0)),
          Patch.DeleteField("items[2]")),
        condition = col("o_totalprice") > 200000.0)
        .select(col("o_orderkey"),
          col("body.items").getItem(0).getField("qty").as("i0_qty"),
          round(col("body.items").getItem(1).getField("price"), 2).as("i1_price"),
          size(col("body.items")).as("n_items"))
    }

    def ordersSf01 = Tables(spark, sfDir, "orders")
    def orders5x = spark.read.parquet(wide)

    bench("patch_indexed_sf01", patchIndexed(ordersSf01))
    bench("patch_indexed_5x", patchIndexed(orders5x))
    bench("patch_indexed_sf01", patchIndexed(ordersSf01))
    bench("patch_indexed_5x", patchIndexed(orders5x))
    spark.stop()
  }
}

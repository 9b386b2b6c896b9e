package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scratch (test scope): minimal reproduction harness. */
object PerfScratch {
  def main(args: Array[String]): Unit = {
    val spark = EngineSession.builder("local[4]", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.Gob

    def rt(dt: DataType, v: Any, label: String): Unit = {
      val schema = StructType(Seq(
        StructField("id", LongType), StructField("body", dt)))
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(Row(1L, v)), 1), schema)
      val r = df.select(Gob.unpack(Gob.pack(col("body")), dt).as("rt"),
        col("body")).head()
      def show(x: Any): String = x match {
        case b: Array[Byte] => b.mkString("[", ",", "]")
        case m: scala.collection.Map[_, _] =>
          m.map { case (k, x2) => s"$k -> ${show(x2)}" }.mkString("{", ", ", "}")
        case s: scala.collection.Seq[_] => s.map(show).mkString("Seq(", ", ", ")")
        case row: Row => (0 until row.length).map(i => show(row.get(i))).mkString("Row(", ", ", ")")
        case other => String.valueOf(other)
      }
      println(s"[$label] got=${show(r.get(0))} want=${show(r.get(1))}")
    }

    rt(MapType(StringType, BinaryType), Map("a" -> Array[Byte](1, 2, 3)),
      "map<string,binary>")
    rt(BinaryType, Array[Byte](1, 2, 3), "binary")
    rt(ArrayType(BinaryType), Seq(Array[Byte](1, 2), Array[Byte](3)),
      "array<binary>")
    rt(StructType(Seq(StructField("b", BinaryType))),
      Row(Array[Byte](9, 8)), "struct<binary>")
    rt(MapType(StringType, ArrayType(BinaryType)),
      Map("k" -> Seq(Array[Byte](5), Array[Byte](6, 7))),
      "map<string,array<binary>>")
    spark.stop()
  }
}

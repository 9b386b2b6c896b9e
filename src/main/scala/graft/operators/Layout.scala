package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Multi-dimensional file layout: write a table Z-ORDERED on several
 * columns so parquet min/max row-group stats prune scans filtered on ANY
 * of them — the technique behind Delta OPTIMIZE ZORDER / liquid
 * clustering, here with nothing but Spark primitives (rank bucketing +
 * bit interleaving + range partitioning).
 *
 * Why: a table sorted on one column prunes beautifully on it and not at
 * all on any other; the single-dimension layout ([[graft.Bucketing]],
 * partitionBy) can't serve two filter axes at once. Interleaving the
 * bits of per-column rank buckets gives a 1-D order in which rows close
 * in ANY dimension land close in the file order, so every dimension's
 * min/max per file is narrow — each filter axis skips most files.
 *
 * Scale shape: per column one global percent_rank (a range-partitioned
 * sort of (value) pairs — at cluster scale swap in approxQuantile bucket
 * edges, same layout, no global sort), then one range repartition on the
 * z-value and a plain parquet write. The write is one extra sort of the
 * data being written — amortized over every pruned read after it.
 */
object Layout {

  private val Bits = 10 // 1024 rank buckets per dimension

  /** The interleaved z-value of the given columns' rank buckets (each
    * `b` a column of ints in [0, 1024)): bit j of dimension i lands at
    * position j * dims + i. */
  private def interleave(buckets: Seq[Column]): Column = {
    val dims = buckets.size
    (0 until Bits).flatMap { j =>
      buckets.zipWithIndex.map { case (b, i) =>
        shiftleft(shiftright(b, j).bitwiseAND(lit(1)), j * dims + i)
      }
    }.reduce(_.bitwiseOR(_)).cast("long")
  }

  /** Write `df` to `path` as `numFiles` parquet files z-ordered on
    * `cols` (numeric or otherwise ordered columns). Returns the path. */
  def zorderWrite(df: DataFrame, cols: Seq[String], path: String,
                  numFiles: Int): String = {
    require(cols.size >= 2, "z-order needs at least two dimensions")
    // rank-bucket each dimension: percent_rank is value-distribution
    // agnostic (skew in a column can't collapse its buckets)
    val bucketed = cols.foldLeft(df) { (acc, c) =>
      val w = org.apache.spark.sql.expressions.Window.orderBy(col(c))
      acc.withColumn(s"_b_$c",
        (percent_rank().over(w) * ((1 << Bits) - 1)).cast("int"))
    }
    bucketed
      .withColumn("_z", interleave(cols.map(c => col(s"_b_$c"))))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop(cols.map(c => s"_b_$c") :+ "_z": _*)
      .write.mode("overwrite").parquet(path)
    path
  }

  /** Per-file (min, max) spans of `valCol` relative to its global span —
    * the pruning diagnostic: the mean relative span is the expected
    * fraction of files a point/range filter on that column must read. */
  def fileSpans(df: DataFrame, valCol: String): DataFrame = {
    val perFile = df.groupBy(input_file_name().as("file"))
      .agg(min(col(valCol)).as("lo"), max(col(valCol)).as("hi"))
    val global = df.agg(min(col(valCol)).as("glo"), max(col(valCol)).as("ghi"))
    perFile.crossJoin(broadcast(global))
      .select(col("file"),
        ((col("hi") - col("lo")).cast("double") /
          (col("ghi") - col("glo"))).as("rel_span"))
  }
}

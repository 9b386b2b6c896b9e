package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF}
import graft.operators.TermStats

/** Scratch same-JVM A/B for the bm25TopKBatch recovery (r18, VERDICT #1).
  * Forms: r16 (3 text scans + dl join), r17/r18 current, and candidates.
  * Never shipped; results recorded in OPTIMIZATION_r18.md. */
object Bm25Lab {
  private def bm25TermScore(k1: Double, b: Double) = {
    val avgdl = col("sdl").cast("double") / col("n").cast("double")
    val idf = log(lit(1.0) + (col("n") - col("df") + 0.5) / (col("df") + 0.5))
    idf * (col("tf") * (k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0) - b + lit(b) * col("dl") / avgdl))
  }

  def r16Form(docs: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val k1 = 1.2; val b = 0.75
    val qterms = queries.select(col("qid").as("_qid"),
      explode(array_distinct(col("terms"))).as("term"))
    val dict = qterms.select(col("term")).distinct()
    val toks = docs.select(col("doc_id"), explode(TF.tokens(col("text"))).as("term"))
    val dl = docs.select(col("doc_id"), TF.tokenCount(col("text")).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n"), sum(col("dl")).as("sdl"))
    val tf = toks.join(broadcast(dict), Seq("term"), "left_semi")
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val perDoc = qterms
      .join(tf, Seq("term"))
      .join(broadcast(dfreq), Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("_ts", round(bm25TermScore(k1, b) * 1e6).cast("long"))
      .groupBy(col("_qid"), col("doc_id"))
      .agg(round(sum(col("_ts")).cast("double") / 1e6, 6).as("bm25"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_qid")).orderBy(col("bm25").desc, col("doc_id").asc)
    perDoc.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .select(col("_qid").as("qid"), col("doc_id"), col("bm25"))
  }

  /** current + CacheRegistry.track(tf): dfreq reads the cached tf instead of
    * re-running the corpus explode as a broadcast subtree. */
  def cachedTfForm(docs: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val k1 = 1.2; val b = 0.75
    val qterms = queries.select(col("qid").as("_qid"),
      explode(array_distinct(col("terms"))).as("term"))
    val dict = qterms.select(col("term")).distinct()
    val toks = docs.select(col("doc_id"), TF.tokens(col("text")).as("_tk"))
      .select(col("doc_id"), size(col("_tk")).as("dl"), explode(col("_tk")).as("term"))
    val stats = docs.select(TF.tokenCount(col("text")).as("dl"))
      .agg(count(lit(1)).as("n"), sum(col("dl")).as("sdl"))
    val tf = CacheRegistry.track(toks.join(broadcast(dict), Seq("term"), "left_semi")
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"), min(col("dl")).as("dl")))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val perDoc = qterms
      .join(tf, Seq("term"))
      .join(broadcast(dfreq), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("_ts", round(bm25TermScore(k1, b) * 1e6).cast("long"))
      .groupBy(col("_qid"), col("doc_id"))
      .agg(round(sum(col("_ts")).cast("double") / 1e6, 6).as("bm25"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_qid")).orderBy(col("bm25").desc, col("doc_id").asc)
    perDoc.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .select(col("_qid").as("qid"), col("doc_id"), col("bm25"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = EngineSession.builder("local[32]", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    Tables(spark, sfDir, "documents").groupBy("lang").count().collect()

    def qs = Seq((1L, Seq("data", "spark")), (2L, Seq("vector", "index")),
      (3L, Seq("batch"))).toDF("qid", "terms")
    def docs = Tables(spark, sfDir, "documents")

    def once(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.queryExecution.toRdd.count()
      CacheRegistry.releaseAll()
      (System.nanoTime() - t0) / 1e9
    }
    val forms: Seq[(String, () => DataFrame)] = Seq(
      "r16" -> (() => r16Form(docs, qs, 5)),
      "current" -> (() => TermStats.bm25TopKBatch(docs, "text", "doc_id", qs, "qid", "terms", 5)),
      "cachedTf" -> (() => cachedTfForm(docs, qs, 5)))
    // warm every form once, then 3 interleaved rounds
    forms.foreach { case (_, f) => once(f()) }
    (1 to 3).foreach { r =>
      forms.foreach { case (n, f) =>
        println(f"[bm25lab] round$r $n%-9s ${once(f())}%.3f")
      }
    }
    // sanity: identical results
    val cur = TermStats.bm25TopKBatch(docs, "text", "doc_id", qs, "qid", "terms", 5).collect().map(_.toString).sorted
    val a = r16Form(docs, qs, 5).collect().map(_.toString).sorted
    val c = cachedTfForm(docs, qs, 5).collect().map(_.toString).sorted
    println(s"[bm25lab] r16==current: ${a.sameElements(cur)} cachedTf==current: ${c.sameElements(cur)}")
    spark.stop()
  }
}

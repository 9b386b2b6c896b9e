package graft

import org.apache.spark.sql.functions._
import graft.operators.{Classify, Dedup, Importance}

/** DSIR importance resampling, the hashed-NB classifier gate, and one-pass
  * multi-benchmark decontamination — semantic pins on hand fixtures the
  * DuckDB oracle can't express (rank sanity, OOV behavior, cross-operator
  * equivalence), plus the bounded-contract guards. */
class CurationMlSpec extends SparkSpec {
  import spark.implicits._

  private val B = 256

  // target: cooking-ish docs; pool: cooking + code + noise
  private lazy val pool = Seq(
    (1L, "mix the flour with butter and sugar then bake the cake"),
    (2L, "knead the dough then bake the bread in the hot oven"),
    (3L, "public static void main string args system out println"),
    (4L, "for i in range n print i plus one end for loop"),
    (5L, "mix the dough with sugar and bake in the oven"),
    (6L, "zzz qqq xxx vvv www yyy uuu ttt sss rrr")
  ).toDF("doc_id", "text")
  private lazy val target = pool.filter($"doc_id" <= 2)

  test("dsirScore ranks target-like documents above off-distribution ones") {
    val ratios = Importance.dsirLogRatios(target, pool, "text", B)
    val w = Importance.dsirScore(pool, "text", "doc_id", ratios, B)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // doc 5 shares the target's vocabulary; docs 3/4/6 share almost none
    assert(w(5L) > w(3L) && w(5L) > w(4L) && w(5L) > w(6L),
      s"cooking doc should outrank code/noise: $w")
    // the target docs themselves score highest of all
    assert(w(1L) > w(5L) || w(2L) > w(5L), s"targets should lead: $w")
  }

  test("dsirSelect keeps exactly n rows, highest-weight first, key tie-break") {
    val ratios = Importance.dsirLogRatios(target, pool, "text", B)
    val sel = Importance.dsirSelect(
      Importance.dsirScore(pool, "text", "doc_id", ratios, B),
      "doc_id", "weight", n = 3).collect()
    assert(sel.length == 3)
    val ws = sel.map(_.getDouble(1))
    assert(ws.zip(ws.tail).forall { case (a, b) => a >= b }, "not sorted desc")
    assert(!sel.map(_.getLong(0)).contains(6L), "noise doc selected")
  }

  test("dsirLogRatiosTagged == dsirLogRatios when target is a predicate over raw") {
    // the r17 fused-model contract: same rows, same lr/t_total/r_total,
    // for a target that is a filter of the raw pool (incl. 0-count buckets)
    val classic = Importance.dsirLogRatios(target, pool, "text", B)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val tagged = Importance.dsirLogRatiosTagged(pool, $"doc_id" <= 2, "text", B)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(tagged == classic, s"fused model drifted:\n classic=$classic\n tagged=$tagged")
  }

  test("dsirScore enforces the dense-LUT buckets contract") {
    val ratios = Importance.dsirLogRatios(target, pool, "text", B)
    intercept[IllegalArgumentException] {
      Importance.dsirScore(pool, "text", "doc_id", ratios,
        Importance.MaxLutBuckets + 1)
    }
  }

  test("dsirLogRatios totals: smoothed ratio is exact-int reproducible") {
    // one doc each side, tiny bucket space: hand-check one bucket's lr
    val tgt = Seq((1L, "a a b")).toDF("doc_id", "text")
    val raw = Seq((1L, "a a b"), (2L, "c c c c")).toDF("doc_id", "text")
    val lr = Importance.dsirLogRatios(tgt, raw, "text", 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // feature streams: tgt = [a,a,b,"a a","a b"] (T=5);
    // raw adds [c,c,c,c,"c c","c c","c c"] (R=12)
    val buckets = raw.select(explode(Importance.bucketArray(col("text"), 8)).as("b"))
      .distinct().as[Long].collect().toSet
    assert(lr.keySet == buckets, "one lr row per observed bucket")
    // c-only buckets have tc=0: lr = ln(1/ (5+8)) - ln((rc+1)/(12+8)) — negative
    val cBucket = Seq((1L, "c")).toDF("doc_id", "text")
      .select(explode(Importance.bucketArray(col("text"), 8)).as("b"))
      .as[Long].head()
    // c occurs 4 times in raw ("c" x4); plus bigram "c c" may share the bucket
    assert(lr(cBucket) < 0, s"target-absent bucket must score negative: $lr")
  }

  test("nbTrain/nbScore separate two vocabularies and handle OOV via floor") {
    val train = Seq(
      (1L, "good fresh clean bright happy", true),
      (2L, "good clean happy fresh calm", true),
      (3L, "bad stale dirty dark sad", false),
      (4L, "bad dirty sad stale angry", false)
    ).toDF("doc_id", "text", "y")
    val model = Classify.nbTrain(train, "text", "y", B)
    val (bias, floor) = Classify.nbConstants(train, "text", "y", B)
    // balanced classes and vocab: floor = ln((N+B)/(P+B)) ~ 0, bias = 0
    assert(bias == 0L, s"balanced prior must be zero, got $bias")
    val score = Classify.nbScore(
      Seq((10L, "fresh happy clean"), (11L, "stale dirty sad"),
          (12L, "totally unseen tokens")).toDF("doc_id", "text"),
      model, "text", "doc_id", B, bias, floor)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(score(10L)._2 && !score(11L)._2, s"classes not separated: $score")
    // all-OOV doc: score = (bias + 3*floor)/1e6 — defined, near zero here
    assert(math.abs(score(12L)._1) < 0.01, s"OOV doc not floored: $score")
  }

  test("nbScore OOV floor equals the llr of a zero-count slot") {
    val train = Seq((1L, "aa aa aa", true), (2L, "bb", false))
      .toDF("doc_id", "text", "y")
    val (_, floor) = Classify.nbConstants(train, "text", "y", 16)
    // P=3, N=1: floor = round((ln(1/(3+16)) - ln(1/(1+16))) * 1e6)
    val want = math.round((math.log(1.0 / 19) - math.log(1.0 / 17)) * 1e6)
    assert(floor == want, s"floor $floor != $want")
  }

  test("nbScore LUT fold == nbScoreJoin broadcast form (rows, scores, preds)") {
    val train = Seq(
      (1L, "good fresh clean bright happy", true),
      (2L, "good clean happy fresh calm", true),
      (3L, "bad stale dirty dark sad", false),
      (4L, "bad dirty sad stale angry", false)
    ).toDF("doc_id", "text", "y")
    val model = Classify.nbTrain(train, "text", "y", B)
    val (bias, floor) = Classify.nbConstants(train, "text", "y", B)
    val docs = Seq((10L, "fresh happy clean"), (11L, "stale dirty sad"),
      (12L, "totally unseen tokens"), (13L, "good bad good bad"))
      .toDF("doc_id", "text")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
        .sortBy(_._1).toSeq
    val lutForm = canon(Classify.nbScore(docs, model, "text", "doc_id",
      B, bias, floor))
    val joinForm = canon(Classify.nbScoreJoin(docs, model, "text", "doc_id",
      B, bias, floor))
    assert(lutForm == joinForm,
      s"scan-stage LUT scoring drifted from the join form:\n$lutForm\n$joinForm")
  }

  test("nbFit one-action fused fit == nbTrain + nbConstants (bias, floor, " +
       "every slot llr, and the scored frame)") {
    val train = Seq(
      (1L, "good fresh clean bright happy", true),
      (2L, "good clean happy fresh calm", true),
      (3L, "bad stale dirty dark sad", false),
      (4L, "bad dirty sad stale angry", false),
      (5L, "", true) // empty doc: counts toward the prior, adds no slots
    ).toDF("doc_id", "text", "y")
    val model = Classify.nbTrain(train, "text", "y", B)
    val (bias, floor) = Classify.nbConstants(train, "text", "y", B)
    val fit = Classify.nbFit(train, "text", "y", B)
    assert(fit.bias == bias, s"fused bias ${fit.bias} != $bias")
    assert(fit.floor == floor, s"fused floor ${fit.floor} != $floor")
    val slotLlr = model.collect().map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    (0 until B).foreach { b =>
      val want = slotLlr.getOrElse(b, floor)
      assert(fit.lut(b) == want, s"slot $b: fused llr ${fit.lut(b)} != $want")
    }
    val docs = Seq((10L, "fresh happy clean"), (11L, "stale dirty sad"),
      (12L, "totally unseen tokens"), (13L, "good bad good bad"))
      .toDF("doc_id", "text")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
        .sortBy(_._1).toSeq
    assert(canon(Classify.nbScore(docs, fit, "text", "doc_id")) ==
           canon(Classify.nbScore(docs, model, "text", "doc_id", B, bias, floor)),
      "fused-model scoring drifted from the DataFrame-model form")
  }

  test("unified OOV semantics: dsirScore floors absent buckets with the " +
       "smoothed t=r=0 ratio from the model's own totals (the nbScore rule)") {
    val B2 = 64
    val tgt = Seq((1L, "alpha beta alpha")).toDF("doc_id", "text")
    val raw = Seq((1L, "alpha beta alpha"), (2L, "beta gamma beta"))
      .toDF("doc_id", "text")
    val ratios = Importance.dsirLogRatios(tgt, raw, "text", B2)
    // the disjoint-vocabulary corpus: every feature is OOV up to hash
    // collisions — the expectation below replays the defined semantics
    // (coalesce to the smoothed floor) relationally, so collisions are
    // handled identically on both sides
    val foreign = Seq((9L, "zulu yankee xray whiskey"), (10L, "victor uniform"))
      .toDF("doc_id", "text")
    val tot = ratios.select($"t_total", $"r_total").head()
    val floor = math.round((math.log(1.0 / (tot.getLong(0) + B2.toDouble)) -
      math.log(1.0 / (tot.getLong(1) + B2.toDouble))) * 1e6)
    val want = foreign
      .select($"doc_id",
        explode(Importance.bucketArray($"text", B2)).as("bucket"))
      .join(ratios.select($"bucket", $"lr"), Seq("bucket"), "left_outer")
      .groupBy($"doc_id")
      .agg(round(sum(coalesce($"lr", lit(floor))).cast("double") / 1e6, 6)
        .as("weight"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val got = Importance.dsirScore(foreign, "text", "doc_id", ratios, B2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == want, s"dsirScore OOV drifted from the floor replay: $got vs $want")
    // T=5 < R=8 here, so the floor is ln((R+B)/(T+B)) > 0 — a fully-OOV
    // doc must NOT score the old neutral 0
    assert(floor > 0 && got.values.forall(_ > 0.0),
      s"OOV docs must take the smoothed floor, not 0: $got (floor=$floor)")
    // legacy (bucket, lr)-only model: absent buckets fall back to 0
    val legacy = Importance.dsirScore(foreign, "text", "doc_id",
        ratios.select($"bucket", $"lr"), B2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val wantLegacy = foreign
      .select($"doc_id",
        explode(Importance.bucketArray($"text", B2)).as("bucket"))
      .join(ratios.select($"bucket", $"lr"), Seq("bucket"), "left_outer")
      .groupBy($"doc_id")
      .agg(round(sum(coalesce($"lr", lit(0L))).cast("double") / 1e6, 6)
        .as("weight"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(legacy == wantLegacy, s"legacy-model fallback drifted: $legacy")
  }

  test("contaminationMulti matches per-set contaminationOverlap") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs today"),
      (3L, "entirely unrelated text with no shared shingles here")
    ).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "the quick brown fox jumps high", "setA"),
      (101L, "pack my box with five dozen", "setB")
    ).toDF("doc_id", "text", "bench_set")
    val multi = Dedup.contaminationMulti(docs, bench, "text", "doc_id", "bench_set")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    for (set <- Seq("setA", "setB")) {
      val single = Dedup.contaminationOverlap(docs,
          bench.filter($"bench_set" === set), "text", "doc_id")
        .collect().map(r => (r.getLong(0), set) -> r.getLong(1)).toMap
      single.foreach { case (k, v) =>
        assert(multi.get(k).contains(v), s"$k: multi=${multi.get(k)} single=$v")
      }
      // and no extra rows for this set beyond what single-set reports
      assert(multi.count(_._1._2 == set) == single.size, s"row count drift for $set")
    }
  }
}

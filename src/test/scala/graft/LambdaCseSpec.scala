package graft

import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF}
import graft.plans.LambdaCse

/**
 * LambdaCse optimizer rule: the naive duplicated-HOF projection (the exact
 * shape that cost 12 s/query before the manual let-binding rewrite) must be
 * hoisted automatically — same results, one evaluation of the shared
 * subtree — while non-duplicated and nondeterministic shapes pass through
 * untouched.
 */
class LambdaCseSpec extends SparkSpec {
  import spark.implicits._

  // The shared session is built by EngineSession, so LambdaCse is ALWAYS
  // injected; the only honest off-switch is the rule's own conf flag.
  // withRule/withoutRule toggle it so "baseline" really means rule-off
  // (extraOptimizations = Nil would be vacuous — the injected copy still runs).
  private def withRule[A](f: => A): A = {
    spark.conf.set(LambdaCse.EnabledKey, "true")
    f
  }
  private def withoutRule[A](f: => A): A = {
    spark.conf.set(LambdaCse.EnabledKey, "false")
    try f finally spark.conf.set(LambdaCse.EnabledKey, "true")
  }

  /** The round-1 minhash shape: k reductions over one shared hash array. */
  private def naiveSig(k: Int) = {
    val hashes = transform(TF.shingles(col("text"), 3), s => TF.hash32(s))
    array(TF.minhashParams(k).map { case (a, b) =>
      array_min(transform(hashes, h => (h * a + b) % TF.MinhashPrime))
    }: _*)
  }

  test("duplicated HOF subtree is hoisted; results identical") {
    // parquet-backed source: a local Seq would be constant-folded into a
    // LocalRelation before the plan can be inspected
    val df = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id").as("id"), col("text")).limit(50)
    val naive = withoutRule {
      val q = df.select(col("id"), array_join(naiveSig(8), ",").as("sig"))
      // baseline plan must really be unhoisted: rule-off is observable
      assert(!q.queryExecution.optimizedPlan.toString.contains("_graft_cse"))
      q.orderBy("id").collect().map(_.getString(1)).toSeq
    }

    val (optimized, planStr) = withRule {
      val q = df.select(col("id"), array_join(naiveSig(8), ",").as("sig"))
      (q.orderBy("id").collect().map(_.getString(1)).toSeq,
        q.queryExecution.optimizedPlan.toString)
    }
    assert(optimized == naive)
    // the shingle pipeline (split -> slice -> concat) must survive ONCE,
    // not once per permutation
    val splits = "split\\(".r.findAllIn(planStr).length
    assert(splits <= 2, s"expected the shared subtree hoisted, got $splits splits:\n$planStr")
    assert(planStr.contains("_graft_cse"), "let-binding variable absent from plan")
  }

  test("no rewrite without duplication or for nondeterministic subtrees") {
    val df = Seq((1L, Seq(1.0, 2.0))).toDF("id", "xs")
    withRule {
      val single = df.select(aggregate(col("xs"), lit(0.0), (a, x) => a + x).as("s"))
      assert(!single.queryExecution.optimizedPlan.toString.contains("_graft_cse"))
      val nondet = df.select(
        (transform(col("xs"), x => x + rand(7)).getItem(0) +
          transform(col("xs"), x => x + rand(7)).getItem(0)).as("r"))
      assert(!nondet.queryExecution.optimizedPlan.toString.contains("_graft_cse"))
      nondet.collect() // still executes fine
    }
  }

  test("rule optimizes the ENTIRE query surface without breaking a plan") {
    withRule {
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        try fn(spark, "/root/testdata/sf0.001").queryExecution.optimizedPlan
        catch { case e: Throwable =>
          fail(s"LambdaCse broke $name: ${e.getMessage}")
        }
      }
    }
  }

  test("sibling conjuncts stay pushable when a filter's HOF subtree is hoisted") {
    // a simple pushable conjunct next to two conjuncts sharing a HOF
    // subtree: the rewrite must bind ONLY the HOF group, or the whole
    // condition becomes one opaque GetArrayItem and the scan loses the
    // pushed filter (full scan instead of a pruned read)
    val df = Tables(spark, "/root/testdata/sf0.001", "documents")
    withRule {
      val shared = aggregate(transform(TF.tokens(col("text")), t => length(t)),
        lit(0), (a, x) => a + x)
      val q = df.filter(col("doc_id") > 100L && shared > 3 && shared < 100000)
        .select(col("doc_id"))
      val planStr = q.queryExecution.executedPlan.toString
      assert(planStr.contains("_graft_cse"),
        s"HOF group not hoisted:\n$planStr")
      assert(planStr.contains("GreaterThan(doc_id,100)"),
        s"simple conjunct no longer reaches PushedFilters:\n$planStr")
      // results must equal the rule-off baseline
      val got = q.collect().map(_.getLong(0)).sorted.toSeq
      val want = withoutRule {
        df.filter(col("doc_id") > 100L && shared > 3 && shared < 100000)
          .select(col("doc_id")).collect().map(_.getLong(0)).sorted.toSeq
      }
      assert(got == want && got.nonEmpty)
    }
  }

  test("subtrees duplicated ONLY inside conditional branches are NOT hoisted " +
       "(hoisting would evaluate them on rows the guard excludes)") {
    // the guarded element_at(transform(a,...), 1) throws under ANSI for
    // empty arrays — hoisting it out of the CASE branches evaluates it on
    // the empty-array rows the original never touched
    val df = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id").as("id"),
        when(col("doc_id") % 2 === 0, split(col("text"), " "))
          .otherwise(array().cast("array<string>")).as("a"))
      .limit(40)
    val guarded = when(size(col("a")) > 0,
        element_at(transform(col("a"), x => concat(x, lit("!"))), 1))
      .otherwise(lit("-"))
    val guarded2 = when(size(col("a")) > 0,
        element_at(transform(col("a"), x => concat(x, lit("!"))), 1))
      .otherwise(lit("?"))
    val out = withRule {
      df.select(col("id"), guarded.as("g1"), guarded2.as("g2"))
        .collect() // must not throw INVALID_ARRAY_INDEX on the empty rows
    }
    assert(out.nonEmpty)
    out.foreach { r =>
      val even = r.getLong(0) % 2 == 0
      if (!even) assert(r.getString(1) == "-" && r.getString(2) == "?")
      else assert(r.getString(1).endsWith("!"))
    }
    // and an UNCONDITIONAL occurrence still licenses the hoist: one bare
    // use + one branch use dedups fine (the bare use ran per row anyway)
    val mixed = withRule {
      df.select(col("id"),
          size(transform(col("a"), x => concat(x, lit("!")))).as("n"),
          when(size(col("a")) > 0,
            element_at(transform(col("a"), x => concat(x, lit("!"))), 1))
            .otherwise(lit("-")).as("g"))
        .collect()
    }
    assert(mixed.nonEmpty)
  }

  test("subtrees duplicated ONLY inside lambda bodies are NOT hoisted " +
       "(a lambda runs zero times on empty arrays — same rule as branches)") {
    // E = element_at(transform(a, ...), 1) throws under ANSI when `a` is
    // empty. Inside the outer transform's body E never evaluates for the
    // empty-array rows (the body runs per element); hoisting E to a
    // per-row binding on the evidence of body-only occurrences would
    // evaluate it on exactly those rows
    val df = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id").as("id"),
        when(col("doc_id") % 2 === 0, split(col("text"), " "))
          .otherwise(array().cast("array<string>")).as("a"))
      .limit(40)
    def e = element_at(transform(col("a"), x => concat(x, lit("!"))), 1)
    val out = withRule {
      df.select(col("id"),
          transform(col("a"), x => concat(e, x, e)).as("t"))
        .collect() // must not throw INVALID_ARRAY_INDEX on the empty rows
    }
    assert(out.nonEmpty)
    out.foreach { r =>
      if (r.getLong(0) % 2 != 0) assert(r.getSeq[String](1).isEmpty)
      else assert(r.getSeq[String](1).nonEmpty)
    }
  }

  test("oracle queries unaffected by the rule (spot check)") {
    val out = withRule {
      SparkEntry.queries("q_minhash_sig")(spark, "/root/testdata/sf0.001")
        .orderBy("doc_id").limit(5).collect().map(_.getString(1)).toSeq
    }
    val want = withoutRule {
      SparkEntry.queries("q_minhash_sig")(spark, "/root/testdata/sf0.001")
        .orderBy("doc_id").limit(5).collect().map(_.getString(1)).toSeq
    }
    assert(out == want)
  }
}

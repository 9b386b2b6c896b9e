package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._

/** BPE vocabulary induction: merge selection, greedy left-to-right
  * application, boundary safety, scope filter. Cross-engine parity is the
  * q_bpe_train oracle row. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def docs(texts: String*) = texts.toDF("text")

  test("bpe: most frequent pair wins; overlapping pairs merge greedily") {
    // corpus: aaa x2, abab x1; 'Z9' is out of scope
    val d = docs("aaa aaa abab Z9")
    val (ms, vocab) = Bpe.train(d, "text", 1)
    assert(ms == Seq(Bpe.Merge("a", "a", 4))) // 2 overlapping pairs x f=2
    val v = vocab.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 'aaa' -> [aa, a] (greedy left-to-right, no triple merge)
    assert(v == Map("aa" -> 2L, "a" -> 4L, "b" -> 2L))
  }

  test("bpe: ties break lexicographically on (t1, t2)") {
    val d = docs("aaa aaa abab Z9")
    val (ms, vocab) = Bpe.train(d, "text", 2)
    // after (a,a): candidates (aa,a)=2 and (a,b)=2 tie on count;
    // t1 'a' < 'aa' so (a,b) wins
    assert(ms(1) == Bpe.Merge("a", "b", 2))
    val v = vocab.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(v == Map("aa" -> 2L, "a" -> 2L, "ab" -> 2L))
  }

  test("bpe: merged tokens never match inside other tokens") {
    // token 'xab' contains 'ab' as a substring; merging (a,b) must not
    // touch it (it is a single token 'x','a','b' -> pairs (x,a),(a,b))
    val d = docs("ab ab ab xb xb")
    val (ms, vocab) = Bpe.train(d, "text", 1)
    assert(ms == Seq(Bpe.Merge("a", "b", 3)))
    val v = vocab.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(v == Map("ab" -> 3L, "x" -> 2L, "b" -> 2L))
  }

  test("bpe: runs out of pairs cleanly when words are fully merged") {
    val d = docs("ab ab")
    val (ms, vocab) = Bpe.train(d, "text", 10) // asks for more than exist
    assert(ms.head == Bpe.Merge("a", "b", 2))
    assert(ms.length < 10) // stopped when no pairs remained
    val v = vocab.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(v == Map("ab" -> 2L))
  }

  test("bpe: deterministic across runs on real data") {
    val d = Tables(spark, "/root/testdata/sf0.001", "documents")
    val a = Bpe.train(d, "text", 3)._1
    val b = Bpe.train(d, "text", 3)._1
    assert(a == b)
    assert(a.length == 3)
  }
}

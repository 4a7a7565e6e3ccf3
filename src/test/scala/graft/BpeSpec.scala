package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSuite {
  import spark.implicits._

  test("learnMerges: hand-counted corpus learns the expected merge sequence") {
    // corpus: "low" ×5, "lower" ×2, "newest" ×6, "widest" ×3 — the
    // classic Sennrich toy vocabulary. Pair counts at step 1:
    //   (e,s) 9, (s,t) 9, (l,o) 7, (o,w) 7, (w,e) 8(newest 6 + lower 2),
    //   (n,e) 6, (e,w) 6, (e,r) 2, (w,i) 3, (i,d) 3, (d,e) 3
    // argmax ties (e,s)=(s,t)=9 → (e,s) by left asc. Then (es,t) 9.
    val docs = Seq.fill(5)("low").++(Seq.fill(2)("lower"))
      .++(Seq.fill(6)("newest")).++(Seq.fill(3)("widest"))
      .map(Tuple1(_)).toDF("text")
    val m = Bpe.learnMerges(docs, "text", nMerges = 3, maxWords = 100)
      .as[(Long, String, String, Long)].collect().sortBy(_._1)
    assert(m(0) == ((1L, "e", "s", 9L)), s"got ${m(0)}")
    assert(m(1) == ((2L, "es", "t", 9L)), s"got ${m(1)}")
    // after (es,t), "newest" is [n,e,w,est] — its (w,e) is GONE, so
    // (w,e) drops to 2 (lower only) and the 7-count tie (l,o)/(o,w)
    // resolves to (l,o) by left asc
    assert(m(2) == ((3L, "l", "o", 7L)), s"got ${m(2)}")
  }

  test("segment: greedy left-to-right application, 'aaa' under (a,a) → [aa, a]") {
    val words = Seq("aaa", "aaaa", "banana", "Mixed!").toDF("word")
    val seg = Bpe.segment(words, "word", "syms", Seq(("a", "a")))
      .select($"word", $"syms").as[(String, Seq[String])].collect().toMap
    assert(seg("aaa") == Seq("aa", "a"), "leftmost-first merge")
    assert(seg("aaaa") == Seq("aa", "aa"))
    assert(seg("banana") == Seq("b", "a", "n", "a", "n", "a"))
    // non-[a-z]+ words pass through as a single symbol
    assert(seg("Mixed!") == Seq("mixed!"))
    // chained merges in rank order: (a,n) gives [b,an,an,a]; (an,a)
    // then matches only at the tail (leftmost "an" is followed by
    // "an", not "a") → [b, an, ana]
    val seg2 = Bpe.segment(words, "word", "syms",
        Seq(("a", "n"), ("an", "a")))
      .select($"word", $"syms").as[(String, Seq[String])].collect().toMap
    assert(seg2("banana") == Seq("b", "an", "ana"))
  }

  test("learnMerges: stops early when the vocab is fully merged; validation") {
    val tiny = Seq("ab", "ab", "ab").map(Tuple1(_)).toDF("text")
    // only one mergeable pair exists; asking for 5 merges yields 1
    val m = Bpe.learnMerges(tiny, "text", nMerges = 5, maxWords = 10)
      .as[(Long, String, String, Long)].collect()
    assert(m.toSeq == Seq((1L, "a", "b", 3L)),
      s"one merge, weighted by the word's corpus count: ${m.toSeq}")
    intercept[IllegalArgumentException] {
      Bpe.learnMerges(tiny, "text", nMerges = 0)
    }
  }
}

package graft

import graft.functions.{BpeCore, BpeFunctions, BpeVocab}
import org.apache.spark.sql.functions._

/** Pins the CANONICAL batch BPE semantics of the native expression —
  * lowest-rank pair first, ALL non-overlapping occurrences merged left to
  * right — including the cases the fixture vocabulary doesn't exercise,
  * so a rewrite can't silently drift to one-occurrence-at-a-time BPE
  * (which diverges whenever a merged token forms a lower-rank pair). */
class BpeSpec extends SparkSpec {

  private def enc(w: String): Seq[String] = BpeCore.encode(w).toSeq

  test("fixture-word encodings match the committed reference tokenizations") {
    // spot values from tools/bpe_ref.py over the committed merges
    assert(enc("batch") === Seq("batch")) // 4-step chain at→atc→atch→batch
    assert(enc("customer") === Seq("cu", "st", "o", "mer"))
    assert(enc("join") === Seq("join"))
    assert(enc("agg") === Seq("a", "g", "g")) // no applicable merge
    assert(enc("a") === Seq("a")) // single char
    assert(enc("window") === Seq("w", "in", "d", "ow"))
  }

  test("ALL occurrences of the best pair merge before a lower-priority pair") {
    // (a,t) is one merge step: both occurrences must fuse in that step
    assert(enc("atat") === Seq("at", "at"))
    assert(enc("owow") === Seq("ow", "ow"))
    assert(enc("owowow") === Seq("ow", "ow", "ow"))
  }

  test("rank order decides, not text order") {
    // (e,r) is rank 0, (o,w) rank 2: er must fuse first, then ow —
    // the final split proves the loop re-picks the best pair per step
    assert(enc("ower") === Seq("ow", "er"))
  }

  test("left-to-right non-overlapping on a self-overlapping run") {
    // occurrences of (e,r) in "err" overlap on the shared r: only the
    // leftmost fuses
    assert(enc("errr") === Seq("er", "r", "r"))
  }

  test("SELF-PAIR merges pair runs off left to right (canonical batch rule)") {
    // the committed vocab has no (x,x) merge, but training retrains per
    // corpus, so the apply path must handle one canonically: a run of k
    // x's fuses to floor(k/2) + (k mod 2) tokens, pairing from the left
    // (round-10 review finding — a consumed-separator string replace
    // reaches a different fixpoint here; the oracle was rebuilt on a
    // boundary-pinned encoding to match exactly this rule)
    val m = Seq(("a", "a"))
    val r = Map(("a", "a") -> 0)
    assert(BpeCore.encode("aaaaaa", m, r).toSeq === Seq("aa", "aa", "aa"))
    assert(BpeCore.encode("aaaaa", m, r).toSeq === Seq("aa", "aa", "a"))
    assert(BpeCore.encode("aaa", m, r).toSeq === Seq("aa", "a"))
    // second-order: the fused token can itself pair under a later rank
    val m2 = Seq(("a", "a"), ("aa", "aa"))
    val r2 = Map(("a", "a") -> 0, ("aa", "aa") -> 1)
    assert(BpeCore.encode("aaaa", m2, r2).toSeq === Seq("aaaa"))
  }

  test("bpe_token_count == size(bpe_tokens) over the corpus; empty and null safe") {
    import spark.implicits._
    val df = Seq("key agg row", "", "batch  batch", null.asInstanceOf[String])
      .toDF("text")
    val r = df.select(
      BpeFunctions.bpeTokenCount(col("text")).as("n"),
      size(BpeFunctions.bpeTokens(col("text"))).cast("long").as("m")).collect()
    // "key agg row" = 3+3+1, "" = 0, double-space = 1+1, null = null
    assert(r(0).getLong(0) === 7L && r(0).getLong(1) === 7L)
    assert(r(1).getLong(0) === 0L && r(1).getLong(1) === 0L)
    assert(r(2).getLong(0) === 2L && r(2).getLong(1) === 2L)
    assert(r(3).isNullAt(0))
  }

  test("non-string child fails at analysis, not at runtime") {
    import spark.implicits._
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1L).toDF("x").select(BpeFunctions.bpeTokenCount(col("x"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("string"))
  }

  test("distributed BPE training reproduces the offline reference at sf0.001") {
    // tools/bpe_ref.py run on the sf0.001 corpus (frequencies differ per
    // SF, so these merges deliberately differ from the sf0.01-trained
    // committed BpeVocab — that the trainer tracks the corpus is the
    // point); the Spark trainer must learn the identical ranked list
    val expected = Seq(
      ("e", "r"), ("o", "r"), ("i", "n"), ("o", "w"), ("s", "t"),
      ("l", "u"), ("a", "r"), ("p", "ar"), ("m", "er"), ("a", "t"),
      ("a", "n"), ("c", "an"), ("s", "can"), ("c", "o"), ("co", "lu"),
      ("colu", "m"), ("colum", "n"), ("d", "ow"), ("in", "dow"),
      ("w", "indow"), ("d", "er"), ("or", "der"), ("or", "t"), ("s", "ort"))
    val got = q("bpe_train").collect().toSeq
      .map(r => (r.getString(1), r.getString(2)))
    assert(got === expected)
  }

  test("incremental trainer == recount-from-scratch trainer on an adversarial corpus") {
    // the round-11 trainer maintains pair counts by delta; this pins it
    // against an independent naive restatement (the bpe_ref.py algorithm:
    // recount every pair every step) on a corpus dense in overlapping and
    // self-pair structure
    def naive(wordFreq: Seq[(String, Long)], maxMerges: Int): Vector[(String, String)] = {
      var vocab = wordFreq.map { case (w, f) => (w.map(_.toString).toArray, f) }
      val out = Vector.newBuilder[(String, String)]
      var k = 0
      var done = false
      while (k < maxMerges && !done) {
        val pairs = scala.collection.mutable.Map[(String, String), Long]()
        vocab.foreach { case (s, f) =>
          (0 until s.length - 1).foreach { i =>
            val p = (s(i), s(i + 1)); pairs(p) = pairs.getOrElse(p, 0L) + f
          }
        }
        if (pairs.isEmpty) done = true
        else {
          val best = pairs.toSeq.minBy { case ((x, y), c) => (-c, x, y) }._1
          out += best
          vocab = vocab.map { case (s, f) =>
            (BpeCore.applyMerge(s, best._1, best._2), f)
          }
          k += 1
        }
      }
      out.result()
    }
    val corpus = Seq(
      "aaaa" -> 7L, "aaab" -> 3L, "abab" -> 5L, "banana" -> 11L,
      "bandana" -> 2L, "aa" -> 9L, "b" -> 100L, "abba" -> 4L,
      "mississippi" -> 6L, "ssss" -> 1L)
    val got = graft.functions.BpeTrainer.train(corpus, 40)
    val want = naive(corpus, 40)
    assert(got === want)
    // and both stop gracefully at exhaustion, short of the 40 requested
    assert(got.size < 40)
  }

  test("trainer breaks gracefully when the corpus fully fuses (no throw)") {
    val got = graft.functions.BpeTrainer.train(Seq("ab" -> 2L, "abc" -> 1L), 100)
    assert(got === Vector(("a", "b"), ("ab", "c")))
  }

  test("trainer handles self-pair merges with the canonical batch rule") {
    // "aaaa"×3: (a,a) counts 9 (3 adjacencies × freq 3); merge-all pairs
    // the run off to [aa,aa], then (aa,aa) fuses — two steps, exhausted
    val got = graft.functions.BpeTrainer.train(Seq("aaaa" -> 3L), 100)
    assert(got === Vector(("a", "a"), ("aa", "aa")))
  }

  test("trainer argmax tiebreak is (x, y) lexicographic") {
    val got = graft.functions.BpeTrainer.train(Seq("cd" -> 1L, "ab" -> 1L), 1)
    assert(got === Vector(("a", "b")))
  }

  test("every merge symbol is reachable: ranks table is consistent") {
    // each merge's parts must be single chars or products of EARLIER
    // merges — a mis-ordered table would make some merges dead
    val producible = scala.collection.mutable.Set[String]()
    BpeVocab.merges.foreach { case (x, y) =>
      Seq(x, y).foreach { s =>
        assert(s.length == 1 || producible.contains(s),
          s"merge part '$s' is neither a char nor a product of an earlier merge")
      }
      producible += x + y
    }
  }

  test("tokenizer_fertility is the per-lang rollup of bpe_token_count") {
    val lang = Tables.documents(spark, sf).select("doc_id", "lang", "n_chars")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val per = q("bpe_token_count").collect()
      .map(r => (lang(r.getLong(0)), r.getLong(1), r.getLong(2)))
    val want = per.groupBy(_._1._1).map { case (lg, rs) =>
      val (bpe, ws) = (rs.map(_._2).sum, rs.map(_._3).sum)
      val bytes = rs.map(_._1._2).sum
      (lg, rs.length.toLong, bpe, ws, bytes,
        bpe.toDouble / ws.toDouble, bytes.toDouble / bpe.toDouble)
    }.toSeq.sortBy(_._1)
    val got = q("tokenizer_fertility").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5), r.getDouble(6))).toSeq
    assert(got === want)
    // BPE always refines whitespace words: fertility >= 1 per language
    assert(got.forall(_._6 >= 1.0))
  }
}

package graft

import java.nio.file.{Files, Paths}

import graft.functions.BpeTrainer
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale evidence for the round-11 incremental BPE trainer
  * (BPE_TRAIN_SCALE.json): the round-10 verdict's top item asked for a
  * ≥256-merge retrain whose per-step cost is DELTA-sized, with a
  * merges-count (not data-size) exponent.
  *
  * Three measurements:
  *
  *  1. `corpus_pass_sec` per SF — the one distributed, corpus-sized job
  *     (tokenize → word-freq groupBy → bounded collect). This is the
  *     only cost that scales with data.
  *  2. `train_sec` at a ladder of merge counts over the SAME collected
  *     vocabulary, plus the fitted merges-count exponent. Under the
  *     round-10 per-merge-Spark-job loop this axis was ~0.1 s/step of
  *     pure scheduling; here it must be linear with a sub-millisecond
  *     constant.
  *  3. `per_step` stats at the deepest ladder point: median/max words
  *     touched per merge and median/max step wall — the direct
  *     "delta-sized, not vocabulary-sized" evidence.
  *
  * Plus a production-merge-count SYNTHETIC stress (driver-only, no
  * Spark): a ~200k-word Zipf vocabulary trained for 32k merges — the
  * merge count the verdict named as the production bar. The vocabulary
  * generator is deterministic (hash-mixed, no RNG state), so the run is
  * reproducible.
  *
  * Usage: runMain graft.BpeTrainAudit [outJson] [sfDir ...]
  */
object BpeTrainAudit {

  private def fmt(v: Double): String = f"$v%.4f"

  def main(args: Array[String]): Unit = {
    val outJson = args.headOption.getOrElse("BPE_TRAIN_SCALE.json")
    val sfDirs = if (args.length > 1) args.drop(1).toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val ladder = Seq(32, 64, 128, 256)
    val (cpuStr, cpus) = GraftConf.cpuSpec(8)
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpuStr]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timeMin[T](reps: Int)(f: => T): (Double, T) = {
      var best = Double.MaxValue
      var out: Option[T] = None
      (1 to reps).foreach { _ =>
        val t0 = System.nanoTime()
        val v = f
        val t = (System.nanoTime() - t0) / 1e9
        if (t < best) { best = t; out = Some(v) }
      }
      (best, out.get)
    }

    def med(xs: Seq[Long]): Long =
      if (xs.isEmpty) 0L else xs.sorted.apply(xs.size / 2)

    // only the LAST dir's vocabulary is reused (exhaustion probe); a
    // per-dir tuple would pin every collected vocabulary in driver heap
    // through the synthetic and exhaustion phases
    var lastWf: Seq[(String, Long)] = Nil
    val perSf = sfDirs.map { sfDir =>
      // the one corpus-sized pass: THE corpus bpe_train_rich trains on
      // (TextOps.richWords — one definition, no drift between the
      // audited corpus and the production query's)
      val words = graft.ops.TextOps.richWords(spark, sfDir)
      val (passSec, wf) = timeMin(3) {
        words.filter(col("w") =!= "")
          .groupBy("w").agg(count(lit(1)).as("freq"))
          .collect()
          .map(r => (r.getString(0), r.getLong(1))).toSeq
      }
      val ladderTimes = ladder.map { k =>
        val (t, m) = timeMin(5)(BpeTrainer.train(wf, k))
        (k, t, m.length)
      }
      val (_, stats) = BpeTrainer.trainWithStats(wf, ladder.max)
      val exponent = {
        val (k0, t0, _) = ladderTimes.head
        val (k1, t1, _) = ladderTimes.last
        math.log(t1 / t0) / math.log(k1.toDouble / k0)
      }
      val ladderJson = ladderTimes.map { case (k, t, m) =>
        s"""{"merges":$k,"train_sec":${fmt(t)},"learned":$m}"""
      }.mkString("[", ",", "]")
      val stepJson =
        s"""{"n_steps":${stats.size},"vocab_words":${wf.size},""" +
          s""""median_touched_words":${med(stats.map(_.touchedWords.toLong))},""" +
          s""""max_touched_words":${stats.map(_.touchedWords).max},""" +
          s""""median_step_us":${med(stats.map(_.nanos / 1000))},""" +
          s""""max_step_us":${stats.map(_.nanos / 1000).max}}"""
      println(s"[bpe-audit] $sfDir pass=${fmt(passSec)}s vocab=${wf.size} " +
        s"exp=${fmt(exponent)} ladder=${ladderTimes.map(t => fmt(t._2)).mkString(",")}")
      lastWf = wf
      s""""$sfDir": {"corpus_pass_sec":${fmt(passSec)},""" +
        s""""ladder":$ladderJson,"merges_count_exponent":${fmt(exponent)},""" +
        s""""per_step":$stepJson}"""
    }

    // production-merge-count synthetic: ~200k-word Zipf vocabulary
    // (deterministic hash-mixed 3-9 letter words), 32k merges — the
    // driver-side phase at the scale the round-10 verdict named. No
    // Spark involvement by design: this axis is pure trainer cost.
    val synthVocab = {
      val letters = "abcdefghijklmnop"
      (0 until 200000).map { i =>
        var h = i * 0x9e3779b97f4a7c15L
        h ^= h >>> 32
        val len = 3 + (math.abs(h) % 7).toInt
        val sb = new StringBuilder
        var k = 0
        var g = h
        while (k < len) {
          g = g * 6364136223846793005L + 1442695040888963407L
          sb += letters(((g >>> 33) % letters.length).toInt)
          k += 1
        }
        (sb.toString, 1000000L / (i + 1) + 1L) // Zipf-ish exact-long freqs
      }.distinct
    }
    val synthMerges = 32768
    val t0 = System.nanoTime()
    val (synthLearned, synthStats) = BpeTrainer.trainWithStats(synthVocab, synthMerges)
    val synthSec = (System.nanoTime() - t0) / 1e9
    val synthJson =
      s"""{"vocab_words":${synthVocab.size},"merges_requested":$synthMerges,""" +
        s""""merges_learned":${synthLearned.size},"train_sec":${fmt(synthSec)},""" +
        s""""median_touched_words":${med(synthStats.map(_.touchedWords.toLong))},""" +
        s""""median_step_us":${med(synthStats.map(_.nanos / 1000))},""" +
        s""""max_step_us":${synthStats.map(_.nanos / 1000).max}}"""
    println(s"[bpe-audit] synthetic 32k merges over ${synthVocab.size} words: " +
      s"${fmt(synthSec)}s (learned ${synthLearned.size})")

    // REAL-corpus exhaustion probe (round-11 verdict #8): the synthetic
    // 32k point above proves trainer cost at production merge depth, but
    // on 200k GENERATED words. This runs the ladder's top rung on the
    // real rich corpus of the last sfDir with the merge budget raised
    // past any reachable vocabulary, recording where the corpus actually
    // fuses out (the trainer stops when no adjacency remains) — the
    // boundary past which `spark.graft.bpe.richMerges` buys nothing.
    val exhaustDir = sfDirs.last
    // reuse the word-frequency table perSf already collected for this
    // dir — no fourth corpus pass, and definitionally the same corpus
    val richWf = lastWf
    val exhaustBudget = 1 << 20 // far past any vocabulary this lake holds
    val tex0 = System.nanoTime()
    val (exhaustLearned, exhaustStats) =
      BpeTrainer.trainWithStats(richWf, exhaustBudget)
    val exhaustSec = (System.nanoTime() - tex0) / 1e9
    // ladder rungs between the oracled 256 and the fuse-out point
    val exhaustLadder = Seq(512, 1024, 2048, 4096, 8192, 16384)
      .filter(_ < exhaustLearned.size) :+ exhaustLearned.size
    val exhaustLadderJson = exhaustLadder.map { k =>
      val (t, m) = timeMin(3)(BpeTrainer.train(richWf, k))
      s"""{"merges":$k,"train_sec":${fmt(t)},"learned":${m.length}}"""
    }.mkString("[", ",", "]")
    val exhaustJson =
      s"""{"dir":"$exhaustDir","vocab_words":${richWf.size},""" +
        s""""merges_requested":$exhaustBudget,""" +
        s""""merges_learned":${exhaustLearned.size},""" +
        s""""train_sec":${fmt(exhaustSec)},""" +
        s""""ladder":$exhaustLadderJson,""" +
        s""""median_step_us":${med(exhaustStats.map(_.nanos / 1000))},""" +
        s""""max_step_us":${exhaustStats.map(_.nanos / 1000).max}}"""
    println(s"[bpe-audit] rich-corpus exhaustion at $exhaustDir: fused out " +
      s"at ${exhaustLearned.size} merges over ${richWf.size} words " +
      s"(${fmt(exhaustSec)}s)")

    val json = s"""{"round":"${GraftConf.round}","note":"incremental-trainer merge-count scale audit; round-10 loop was ~0.1s/merge of Spark scheduling, per BENCH_r10 bpe_train=2.45s/24 merges",""" +
      perSf.mkString("", ",", ",") +
      s""""rich_corpus_exhaustion":$exhaustJson,""" +
      s""""synthetic_production_scale":$synthJson}"""
    Files.writeString(Paths.get(outJson), json)
    println(json)
    spark.stop()
  }
}

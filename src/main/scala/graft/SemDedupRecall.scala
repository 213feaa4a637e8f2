package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SemDeDup blocking-recall audit: the within-cell candidate blocking of
  * [[ops.SimOps.dedupSemantic]] is a documented approximation — a
  * near-dup pair straddling a cell boundary is never considered. This
  * main makes that approximation a COMMITTED NUMBER
  * (`SEMDEDUP_RECALL.json`), the ANN_TRADEOFF doctrine applied to the
  * semantic dedup tier, at the fixture scale and a ×N replica corpus,
  * and at TWO operating points:
  *
  *  - the registry threshold (τ = [[ops.SimOps.ClusterCosThreshold]], the
  *    value the correctness oracle pins) over the natural fixture — the
  *    continuity point with earlier rounds' numbers. At this loose τ the
  *    fixture's pair graph is DENSE (the unblocked ideal collapses to
  *    very few keepers — the r14 artifact's honest degeneracy finding),
  *    so drop_recall, not pair_recall, is the operative number;
  *  - a TIGHT τ (0.9 — the regime SemDeDup actually operates in, Abbas
  *    et al. 2023 §3) over the fixture with PLANTED near-dup cliques.
  *    The natural fixture has ZERO pairs at cos ≥ 0.7 (random-ish
  *    vectors — measured, not assumed), so the tight-τ regime must be
  *    planted, the [[SpanSkewAudit]] doctrine: every 4th base vector
  *    gains 3 deterministic ±10%-mask replicas (cos(v, v·(1±0.1 mask))
  *    ≈ 0.995 ≫ τ within a clique; cross-clique similarities stay at the
  *    natural ≤ 0.7 floor), giving a SPARSE pair graph with a known
  *    clique structure and a non-degenerate keeper set — here
  *    pair_recall IS the headline.
  *
  * Per (threshold, corpus, scale) the audit reports:
  *  - pair recall: of all true near-dup pairs (cos ≥ τ, NO blocking —
  *    exact blocked all-pairs enumeration), the fraction whose two sides
  *    land in the same cell under THE SHIPPED ASSIGN
  *    ([[ops.SimOps.semAssignScored]] — indexed two-level by default, so
  *    the audit measures the operator as deployed, not the retired flat
  *    path);
  *  - drop recall / agreement: the vectors the blocked pass drops vs the
  *    drops of an UNBLOCKED ideal pass (same CC + same
  *    least-central-keeper policy over the true pair set) — the
  *    decision-level consequence of the missed pairs;
  *  - wall seconds for both passes — what the blocking buys.
  *
  * Usage: runMain graft.SemDedupRecall [smallDir] [factor] [outJson]
  */
object SemDedupRecall {

  def main(args: Array[String]): Unit = {
    val small = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val outJson = args.lift(2).getOrElse("SEMDEDUP_RECALL.json")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[${GraftConf.cpuSpec(32)._1}]")
      .appName("graft-semdedup-recall")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val big = ScaleStress.synthesize(spark, small, factor, Some(Set("embeddings")))
    val plantedSmall = plant(spark, small, s"semrecall_small")
    val plantedBig = plant(spark, big, s"semrecall_big_x$factor")

    val runs = Seq(
      // registry threshold, natural fixture — the continuity point
      ("registry_tau", ops.SimOps.ClusterCosThreshold, "fixture",
        Map.empty[String, String],
        Seq("x1" -> small, s"x$factor" -> big)),
      // tight production threshold, planted-clique corpus
      ("tight_tau_planted", 0.9, "fixture+planted near-dup cliques",
        Map.empty[String, String],
        Seq("x1" -> plantedSmall, s"x$factor" -> plantedBig)),
      // the recall knob's second operating point (r15 verdict #6): the
      // same tight-τ planted regime under sem.nprobe=2 — what probing a
      // second super-cell buys back of the 0.830 → 0.703 decade drop
      ("tight_tau_planted_nprobe2", 0.9,
        "fixture+planted near-dup cliques, sem.nprobe=2",
        Map("spark.graft.sem.nprobe" -> "2"),
        Seq("x1" -> plantedSmall, s"x$factor" -> plantedBig)))
    val parts = runs.map { case (tag, tau, corpus, conf, scales) =>
      spark.conf.set("spark.graft.sem.cosThreshold", tau.toString)
      conf.foreach { case (k, vv) => spark.conf.set(k, vv) }
      val inner = scales.map { case (stag, dir) =>
        spark.catalog.clearCache()
        s""""$stag": ${auditOne(spark, dir, tau)}"""
      }
      conf.keys.foreach(spark.conf.unset)
      s""""$tag": {"threshold": $tau, "corpus": "$corpus",
         |${inner.mkString(",\n")}}""".stripMargin
    }
    val json =
      s"""{
         |"round": "${GraftConf.round}",
         |"generated_at": "${java.time.Instant.now()}",
         |"assign": "indexed two-level (spark.graft.sem.indexedAssign default)",
         |${parts.mkString(",\n")}
         |}""".stripMargin
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outJson), json)
    println(json)
    spark.stop()
  }

  /** The planted-clique corpus: every 4th base vector gains 3 replicas,
    * each the base multiplied elementwise by a deterministic
    * (1 + 0.1·s_j) mask, s_j ∈ {−1, +1} from a hash of (vec_id, rep, j).
    * Within a clique every cosine is ≈ 1/(1+0.01) and the replicas keep
    * the base's magnitude to ±10% — far above τ = 0.9; cross-clique
    * pairs inherit the natural corpus's ≤ 0.7 ceiling. Replica ids
    * extend the id space above max(vec_id) so base centroids
    * (vec_id % 32 = 0) keep their role and cliques are id-contiguous. */
  private def plant(spark: SparkSession, dir: String, kind: String): String = {
    val out = ops.FileOps.materializeOnce(spark, kind, dir) { d =>
      val base = Tables.embeddings(spark, dir)
      val mx = base.agg(max("vec_id").as("mx"))
      val replicas = base.crossJoin(broadcast(mx))
        .filter(col("vec_id") % 4 === 0)
        .select(col("vec_id"), col("embedding"), col("mx"),
          explode(sequence(lit(0), lit(2))).as("rep"))
        .select(
          (col("mx") + 1 + col("vec_id") * 3 + col("rep")).as("vec_id"),
          transform(col("embedding"), (x, j) =>
            (x * (lit(1.0f) + lit(0.1f) *
              when(pmod(hash(col("vec_id"), col("rep"), j), lit(2)) === 0, -1.0f)
                .otherwise(1.0f))).cast("float")).as("embedding"))
      base.select(col("vec_id"), col("embedding"))
        .unionByName(replicas)
        .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    }
    out
  }

  private def auditOne(spark: SparkSession, dir: String, tau: Double): String = {
    import ops.{DedupOps, PairEnum, SimOps}
    val v = SimOps.withNorm(Tables.embeddings(spark, dir))
      .select("vec_id", "embedding", "nrm")
    val dot = graft.functions.VectorFunctions.vecDot _

    // ground truth: every near-dup pair, NO blocking (exact)
    val t0 = System.nanoTime()
    val truePairs = DedupOps.eagerCheckpoint(
      PairEnum.blockedAllPairs(v, "vec_id", Seq("embedding", "nrm"))
        .filter(dot(col("a_embedding"), col("b_embedding")) /
          sqrt(col("a_nrm") * col("b_nrm")) >= tau)
        .select(col("a_vec_id").as("vec_a"), col("b_vec_id").as("vec_b")))
    val nTrue = truePairs.count()

    // the UNBLOCKED ideal pass: CC over the true pair set, same keeper
    // policy (least-central in the SHIPPED assign's ccos sense, so ONLY
    // the candidate set differs between passes)
    val assigned = SimOps.semAssignScored(spark, v)
      .select("vec_id", "cell", "ccos").persist()
    val idealDropped = droppedOf(
      DedupOps.connectedComponents(v.select(col("vec_id")), truePairs), assigned)
    val nIdealDropped = idealDropped.count()
    val tIdeal = (System.nanoTime() - t0) / 1e9

    // pair recall: true pairs whose sides share a cell
    val cellOf = assigned.select(col("vec_id"), col("cell"))
    val nSameCell = truePairs
      .join(cellOf.withColumnRenamed("vec_id", "vec_a").withColumnRenamed("cell", "ca"), "vec_a")
      .join(cellOf.withColumnRenamed("vec_id", "vec_b").withColumnRenamed("cell", "cb"), "vec_b")
      .filter(col("ca") === col("cb")).count()

    // the blocked pass as shipped
    val t1 = System.nanoTime()
    val blockedDropped = SimOps.dedupSemantic(spark, dir)
      .filter(!col("is_keeper")).select(col("vec_id"))
    val nBlockedDropped = blockedDropped.count()
    val tBlocked = (System.nanoTime() - t1) / 1e9

    // blocked edges are the true edges restricted to same-cell pairs, so
    // blocked components REFINE ideal components and (under the shared
    // least-central keeper) every blocked drop is an ideal drop — the
    // subset relation is an invariant, asserted rather than reported:
    // drop_recall is then exactly n_blocked/n_ideal
    val nOutside = blockedDropped.join(idealDropped, Seq("vec_id"), "left_anti").count()
    require(nOutside == 0L,
      s"$nOutside blocked drops outside the ideal drop set — refinement invariant broken")
    // baseline-degeneracy context: a drop_recall computed against a
    // baseline that drops nearly everything is cheap to score well on —
    // report the ideal pass's keeper count so the reader can SEE how
    // selective the baseline actually was at this threshold/corpus
    val nVecs = v.count()
    assigned.unpersist()
    def r(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP)
    s"""{"n_vectors": $nVecs, "n_true_pairs": $nTrue, "n_same_cell_pairs": $nSameCell,
       | "pair_recall": ${r(nSameCell.toDouble / math.max(1L, nTrue))},
       | "n_dropped_ideal": $nIdealDropped, "n_keepers_ideal": ${nVecs - nIdealDropped},
       | "n_dropped_blocked": $nBlockedDropped,
       | "drop_recall": ${r(nBlockedDropped.toDouble / math.max(1L, nIdealDropped))},
       | "wall_sec_unblocked_ideal": ${r(tIdeal)},
       | "wall_sec_blocked": ${r(tBlocked)}}""".stripMargin.replace("\n", "")
  }

  /** Non-keepers of ≥2 groups under the least-central-keeper policy. */
  private def droppedOf(labels: DataFrame, assigned: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val l = labels.select(col("doc_id").as("vec_id"), col("label").as("group_id"))
    val w = Window.partitionBy("group_id")
      .orderBy(col("ccos").asc, col("vec_id").asc)
    l.join(assigned.select("vec_id", "ccos"), "vec_id")
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") > 1)
      .select("vec_id")
  }
}

package graft

import org.apache.spark.sql.functions._

/** Salting for skewed join keys: replicate the build side S ways and
  * scatter the skewed probe side across the replicas, so one hot key's
  * probe rows spread over S tasks instead of one. AQE's skew-join split
  * handles the same problem adaptively; explicit salting is the tool when
  * the skew is known and AQE can't split (e.g. the hot key also dominates
  * the build side, or a non-AQE engine). The spec proves the rewrite is
  * semantics-preserving on a 90%-one-key dataset.
  */
class SkewJoinSpec extends SparkSpec {

  test("salted join equals plain join on a 90%-hot-key dataset") {
    import spark.implicits._
    val S = 8
    // probe: 20k rows, 90% on key 0; build: 50 keys with payloads
    val probe = spark.range(20000)
      .select(col("id"),
        when(col("id") % 10 =!= 0, lit(0L)).otherwise(col("id") % 50).as("k"))
    val build = spark.range(50).select(col("id").as("k"), (col("id") * 100).as("payload"))

    val plain = probe.join(build, "k")
      .agg(count(lit(1)).as("n"), sum("payload").cast("long").as("s"))
      .collect()(0)

    // salt the probe with a deterministic per-row salt; replicate build ×S
    val saltedProbe = probe.withColumn("salt", pmod(xxhash64(col("id")), lit(S)))
    val replicatedBuild = build
      .withColumn("salt", explode(sequence(lit(0L), lit(S - 1L))))
    val salted = saltedProbe.join(replicatedBuild, Seq("k", "salt"))
      .agg(count(lit(1)).as("n"), sum("payload").cast("long").as("s"))
      .collect()(0)

    assert(salted.getAs[Long]("n") === plain.getAs[Long]("n"))
    assert(salted.getAs[Long]("s") === plain.getAs[Long]("s"))

    // the salt actually spreads the hot key: every salt value is hit
    val spread = saltedProbe.filter(col("k") === 0)
      .select("salt").distinct().count()
    assert(spread === S)
  }
}

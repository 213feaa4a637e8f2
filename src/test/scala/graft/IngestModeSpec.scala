package graft

import org.apache.spark.SparkException
import org.apache.spark.sql.functions._

/** The three malformed-record policies over the same deliberately-broken
  * JSON fixture (`json_malformed_ingest`'s corpus): PERMISSIVE
  * quarantines, DROPMALFORMED silently filters, FAILFAST refuses. A
  * 100-TB feed needs the first (bad rows are data about the feed);
  * the spec pins all three so the choice is a policy, not an accident. */
class IngestModeSpec extends SparkSpec {

  private lazy val dir = {
    // materialize via the registry query's own fixture writer, then
    // derive the path through the SAME helper the query uses — a
    // spark.graft.files.root override must move both or neither
    q("json_malformed_ingest").collect()
    graft.ops.FileOps.cacheDir(spark, "jsonbad", sf)
  }
  private val schema = "doc_id BIGINT, source STRING, n_chars BIGINT, _corrupt_record STRING"
  private lazy val nBad = Tables.documents(spark, sf)
    .filter(col("doc_id") % 37 === 0).count()
  private lazy val nAll = Tables.documents(spark, sf).count()

  test("PERMISSIVE quarantines the original broken line, parses the rest") {
    // SPARK-21610: a query whose referenced columns reduce to ONLY the
    // corrupt column is rejected against raw files — cache first (the
    // documented pattern; the registry query instead always projects
    // data columns alongside it)
    val df = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir)
      .cache()
    try {
      val bad = df.filter(col("_corrupt_record").isNotNull)
        .select("_corrupt_record", "source").collect()
      assert(bad.length === nBad)
      // the quarantine column carries the ORIGINAL bytes (dead-letter
      // ready) and the data columns of a broken row stay null
      bad.foreach { r =>
        assert(r.getString(0).startsWith("{\"doc_id\": "))
        assert(r.isNullAt(1))
      }
      assert(df.filter(col("_corrupt_record").isNull).count() === nAll - nBad)
    } finally df.unpersist()
  }

  test("DROPMALFORMED silently keeps only parseable rows") {
    val df = spark.read.schema("doc_id BIGINT, source STRING, n_chars BIGINT")
      .option("mode", "DROPMALFORMED").json(dir)
    assert(df.count() === nAll - nBad)
  }

  test("FAILFAST refuses the corpus outright") {
    val e = intercept[SparkException] {
      spark.read.schema("doc_id BIGINT, source STRING, n_chars BIGINT")
        .option("mode", "FAILFAST").json(dir).count()
    }
    assert(e.getMessage.toLowerCase.contains("malformed") ||
      Option(e.getCause).exists(_.getMessage.toLowerCase.contains("malformed")))
  }
}

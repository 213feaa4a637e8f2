package graft

import java.io.File
import java.nio.file.Files

/** The file-fixture root (`spark.graft.files.root`) must be honored end
  * to end — the cluster-deployment requirement: on a real cluster the
  * root points at storage all nodes share (HDFS / object store), so the
  * driver-side `_SUCCESS` probe, the executor-side per-doc writes, and
  * the binaryFile re-scan all hit the same filesystem. Verified here by
  * pointing the root at a fresh non-default directory and checking the
  * queries produce identical results from it. */
class FilesRootSpec extends SparkSpec {

  test("file/mm fixture queries honor an overridden spark.graft.files.root") {
    val defaultIngest = q("file_ingest").collect().map(_.toSeq).toSet
    val root = Files.createTempDirectory("graft_root_override").toFile
    spark.conf.set("spark.graft.files.root", "file:" + root.getAbsolutePath)
    try {
      val overridden = q("file_ingest").collect().map(_.toSeq).toSet
      assert(overridden === defaultIngest,
        "file_ingest differs when materialized under an overridden root")
      // the corpus actually landed under the override (not the default tmpdir)
      val docDirs = root.listFiles().filter(_.getName.startsWith("graft_docfiles_"))
      assert(docDirs.nonEmpty, s"no doc corpus under override root $root")
      assert(docDirs.head.listFiles().exists(_.getName.endsWith(".txt")),
        "override root contains no per-doc files")
      assert(docDirs.head.listFiles().exists(_.getName == "_SUCCESS"),
        "marker missing under override root")
      // the csv/json egress caches follow the root too
      assert(q("csv_roundtrip").count() > 0)
      assert(q("json_roundtrip").count() > 0)
      assert(root.listFiles().exists(_.getName.startsWith("graft_csv_")),
        "csv egress not under override root")
      assert(root.listFiles().exists(_.getName.startsWith("graft_json_")),
        "json egress not under override root")
    } finally spark.conf.unset("spark.graft.files.root")
  }
}

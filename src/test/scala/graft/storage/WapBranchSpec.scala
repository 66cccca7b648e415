package graft.storage

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Write-audit-publish invariants: staged invisibility, atomic publish
  * (incl. across a racing FULL rewrite), crash-idempotent re-publish,
  * discard, and vacuum's hands-off contract for deliberate stages.
  */
class WapBranchSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType)))

  private def rows(lo: Int, hi: Int) = {
    import spark.implicits._
    (lo until hi).map(i => (i.toLong, s"r$i")).toDF("k", "v")
  }

  private def fs(lake: Lakehouse) =
    new Path(lake.root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("staged rows are invisible until publish; publish is one marker") {
    val lake = new Lakehouse(spark, tmpDir("wap-vis"))
    lake.append("t", rows(0, 10))
    val v = lake.stageBranch("t", "b1", rows(10, 20))
    assert(lake.read("t", schema).count() == 10)
    assert(lake.branchVersions("t", "b1") == Seq(v))
    assert(lake.readBranch("t", "b1", schema).count() == 20)
    lake.publishBranch("t", "b1")
    assert(lake.read("t", schema).count() == 20)
    assert(lake.branchVersions("t", "b1").isEmpty)
  }

  test("a FULL rewrite during the audit window cannot shadow the publish") {
    val lake = new Lakehouse(spark, tmpDir("wap-race"))
    lake.append("t", rows(0, 10))
    lake.stageBranch("t", "b1", rows(10, 20))
    // maintenance lands while the branch is under audit: the staged dir
    // is below the new FULL, so publish must rebase it above
    lake.delete("t", schema, col("k") < 5L, cdf = false)
    lake.publishBranch("t", "b1")
    val got = lake.read("t", schema).select("k").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(got == (5L until 20L).toSeq, s"got $got")
  }

  test("publish is idempotent across a crash between marker and cleanup") {
    val lake = new Lakehouse(spark, tmpDir("wap-crash"))
    lake.append("t", rows(0, 5))
    val v = lake.stageBranch("t", "b1", rows(5, 8))
    // simulate the crash: commit marker created, branch marker still on
    val vdir = new Path(lake.tablePath("t"), s"_v$v")
    fs(lake).create(new Path(vdir, "_GRAFT_COMMIT_DELTA"), false).close()
    lake.publishBranch("t", "b1") // re-run finishes the job
    assert(lake.read("t", schema).count() == 8)
    assert(lake.branchVersions("t", "b1").isEmpty)
  }

  test("discard removes staged dirs and nothing else") {
    val lake = new Lakehouse(spark, tmpDir("wap-discard"))
    lake.append("t", rows(0, 5))
    lake.stageBranch("t", "b1", rows(5, 8))
    lake.stageBranch("t", "keep", rows(8, 11))
    lake.discardBranch("t", "b1")
    assert(lake.branchVersions("t", "b1").isEmpty)
    assert(lake.branchVersions("t", "keep").nonEmpty)
    lake.publishBranch("t", "keep")
    val got = lake.read("t", schema).select("k").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(got == ((0L until 5L) ++ (8L until 11L)).toSeq)
  }

  test("vacuum leaves staged dirs alone (they are not crash debris)") {
    val lake = new Lakehouse(spark, tmpDir("wap-vacuum")) // gcGraceMs = 0
    lake.append("t", rows(0, 5))
    val v = lake.stageBranch("t", "slow-audit", rows(5, 9))
    lake.delete("t", schema, col("k") < 2L, cdf = false) // FULL above stage
    lake.vacuum("t") // grace 0: everything unprotected would go NOW
    assert(lake.branchVersions("t", "slow-audit") == Seq(v),
      "vacuum must not reclaim a deliberate stage")
    lake.publishBranch("t", "slow-audit")
    val got = lake.read("t", schema).select("k").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(got == (2L until 9L).toSeq)
  }

  test("branch names are validated") {
    val lake = new Lakehouse(spark, tmpDir("wap-name"))
    intercept[IllegalArgumentException] {
      lake.stageBranch("t", "bad/name", rows(0, 1))
    }
  }
}

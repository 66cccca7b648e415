package graft.ops

import graft.SparkSpec
import graft.storage.Lakehouse
import org.apache.spark.sql.functions._

/** The persisted-index contract beyond what the e12/e13 oracles pin:
  * incremental `appendVectors` (codes from the FROZEN stored codebook,
  * delta commit, no rebuild), serve-visibility of appended vectors, and
  * the one-atomic-commit generation model (centroids + codes land
  * together — no torn-index window).
  */
class AnnIndexSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def corpus = spark.read.parquet(s"$sf/embeddings.parquet")
    .select(col("vec_id").as("id"), col("embedding").as("vec"), col("label"))

  private def codesOf(lake: Lakehouse) =
    lake.read(AnnIndex.IndexTable, AnnIndex.indexSchema)
      .filter(col("kind") === "code")

  test("appendVectors encodes against the frozen codebook as a delta commit") {
    val lake = new Lakehouse(spark, tmpDir("annidx-append"))
    AnnIndex.buildIvfPq(lake, corpus)
    val built = lake.versions(AnnIndex.IndexTable)
    // one generation = ONE full commit carrying BOTH structures
    assert(built.size == 1 && built.head._2,
      s"a build must be one atomic full commit: $built")
    val v1 = built.map(_._1).max

    // append COPIES of two existing vectors under fresh ids: same vector
    // + same (frozen) codebook must yield byte-identical PQ codes — an
    // assertion independent of the cell-assignment rule
    val maxId = corpus.agg(max(col("id"))).as[Long].head()
    val centBefore = lake.read(AnnIndex.IndexTable, AnnIndex.indexSchema)
      .filter(col("kind") === "cent").count()
    val originals = corpus.filter(col("id").isin(0L, 1L))
    AnnIndex.appendVectors(lake,
      originals.select((col("id") + maxId + 1L).as("id"), col("vec")))

    // delta, not rewrite: the index gained exactly one delta version
    val vs = lake.versions(AnnIndex.IndexTable)
    assert(vs.map(_._1).max == v1 + 1 && vs.count(_._2) == 1,
      s"append must be a single delta on top of the full build: $vs")

    val codes = codesOf(lake)
    val orig = codes.filter(col("neighbor_id").isin(0L, 1L))
      .select((col("neighbor_id") + maxId + 1L).as("neighbor_id"),
        col("s"), col("label"))
    val added = codes.filter(col("neighbor_id") > maxId)
      .select(col("neighbor_id"), col("s"), col("label"))
    assert(added.count() > 0, "appended vectors produced no code rows")
    assert(added.except(orig).isEmpty && orig.except(added).isEmpty,
      "appended copies must carry the originals' codes under the frozen codebook")
    // the delta carries no centroid rows — the codebook is frozen
    assert(lake.read(AnnIndex.IndexTable, AnnIndex.indexSchema)
      .filter(col("kind") === "cent").count() == centBefore)

    // and the appended vectors are servable: querying with an original
    // vector must surface its appended twin. The twin shares the query's
    // own per-subspace codes, so its ADC distance is the MINIMUM any
    // candidate can achieve (the query's own quantization error) — it
    // must appear in the result at that minimal distance (other
    // candidates may tie by sharing the codes, hence not asserting rk=1)
    val served = AnnIndex.serveIvfPq(lake,
      corpus.filter(col("id") === 0L).select(col("id"), col("vec")),
      k = 5, nProbe = 2)
      .select(col("neighbor_id"), col("dist")).as[(Long, Long)].collect()
    val twin = served.find(_._1 == maxId + 1L)
    assert(twin.isDefined,
      s"appended twin ${maxId + 1} not served: ${served.toSeq}")
    assert(twin.get._2 == served.map(_._2).min,
      s"twin must sit at the minimal ADC distance: ${served.toSeq}")
  }

  test("deleteVectors forgets ids atomically; appends survive via rebase") {
    val lake = new Lakehouse(spark, tmpDir("annidx-delete"))
    AnnIndex.buildIvfPq(lake, corpus)
    val preCent = lake.read(AnnIndex.IndexTable, AnnIndex.indexSchema)
      .filter(col("kind") === "cent").collect().toSet
    val victims = corpus.filter(pmod(col("id"), lit(5)) === 0).select(col("id"))
    AnnIndex.deleteVectors(lake, victims)
    // one atomic FULL commit; the deleted ids' code rows are gone, every
    // other code row intact, centroids byte-identical (frozen geometry)
    val vs = lake.versions(AnnIndex.IndexTable)
    assert(vs.last._2, s"delete must commit as a full rewrite: $vs")
    assert(codesOf(lake)
      .filter(pmod(col("neighbor_id"), lit(5)) === 0).count() == 0)
    assert(codesOf(lake).count() ==
      corpus.filter(pmod(col("id"), lit(5)) =!= 0).count() * 4)
    assert(lake.read(AnnIndex.IndexTable, AnnIndex.indexSchema)
      .filter(col("kind") === "cent").collect().toSet == preCent)
    // the serve path can no longer return a deleted neighbor
    val served = AnnIndex.serveIvfPq(lake,
      corpus.filter(col("id") < 3).select(col("id"), col("vec")),
      k = 5, nProbe = 2)
    assert(served.filter(pmod(col("neighbor_id"), lit(5)) === 0).count() == 0)
    assert(served.count() > 0)
  }

  test("a serve or append with build parameters DIFFERENT from the " +
    "stored index fails loudly instead of ranking by a subspace subset") {
    val lake = new Lakehouse(spark, tmpDir("annidx-params"))
    AnnIndex.buildIvfPq(lake, corpus, subspaces = 4, dims = 64)
    import spark.implicits._
    val q = corpus.limit(2).select(col("id"), col("vec"))
    val ex = intercept[IllegalArgumentException] {
      AnnIndex.serveIvfPq(lake, q, k = 3, nProbe = 2,
        subspaces = 8, dims = 64).collect()
    }
    assert(ex.getMessage.contains("was built with subspaces=4"))
    val ex2 = intercept[IllegalArgumentException] {
      AnnIndex.appendVectors(lake,
        corpus.limit(1).select((col("id") + 100000L).as("id"), col("vec")),
        subspaces = 8, dims = 64)
    }
    assert(ex2.getMessage.contains("was built with"))
    // matching parameters still serve
    assert(AnnIndex.serveIvfPq(lake, q, k = 3, nProbe = 2).count() > 0)
  }

  test("appendVectors without a built index fails loudly, never drops rows") {
    val lake = new Lakehouse(spark, tmpDir("annidx-nobuild"))
    val boom = intercept[IllegalArgumentException] {
      AnnIndex.appendVectors(lake,
        corpus.filter(col("id") < 2).select(col("id"), col("vec")))
    }
    assert(boom.getMessage.contains("buildIvfPq"))
    // nothing half-committed
    assert(lake.versions(AnnIndex.IndexTable).isEmpty)
  }

  test("vacuum composes with an appendVectors delta chain (round-4 item 7)") {
    // the index table under its real maintenance lifecycle: build (full)
    // + incremental deltas is ALL live chain — vacuum must reclaim
    // nothing; after a rebuild shadows it, grace defers reclamation
    // until a vacuum past the horizon, and serve survives throughout
    val lake = new Lakehouse(spark, tmpDir("annidx-vacuum"),
      gcGraceMs = 3600L * 1000)
    AnnIndex.buildIvfPq(lake, corpus)
    val maxId = corpus.agg(max(col("id"))).as[Long].head()
    AnnIndex.appendVectors(lake, corpus.filter(col("id") === 0L)
      .select((col("id") + maxId + 1L).as("id"), col("vec")))
    AnnIndex.appendVectors(lake, corpus.filter(col("id") === 1L)
      .select((col("id") + maxId + 2L).as("id"), col("vec")))
    val rows = lake.read(AnnIndex.IndexTable, AnnIndex.indexSchema).count()
    lake.vacuum(AnnIndex.IndexTable)
    assert(lake.versions(AnnIndex.IndexTable).sizeIs == 3 &&
      lake.read(AnnIndex.IndexTable, AnnIndex.indexSchema).count() == rows,
      "vacuum touched the live build+delta chain")
    // scheduled retrain shadows the old generation; within grace the old
    // dirs stay for in-flight readers, and vacuum past the horizon (a
    // zero-grace handle models expiry) reclaims exactly them
    AnnIndex.buildIvfPq(lake, corpus)
    assert(lake.versions(AnnIndex.IndexTable).count(_._2) == 2,
      "grace must defer the rebuild's GC")
    new Lakehouse(spark, lake.root, gcGraceMs = 0L)
      .vacuum(AnnIndex.IndexTable)
    val vs = lake.versions(AnnIndex.IndexTable)
    assert(vs.sizeIs == 1 && vs.head._2,
      s"vacuum must leave only the new generation: $vs")
    assert(AnnIndex.serveIvfPq(lake,
      corpus.filter(col("id") === 0L).select(col("id"), col("vec")),
      k = 3, nProbe = 2).count() > 0)
  }

  test("filtered serve restricts candidates but never rebuilds the index") {
    val lake = new Lakehouse(spark, tmpDir("annidx-filter"))
    AnnIndex.buildIvfPq(lake, corpus)
    val builtVersions = lake.versions(AnnIndex.IndexTable)
    val q = corpus.filter(col("id") < 3).select(col("id"), col("vec"))
    val all = AnnIndex.serveIvfPq(lake, q, k = 5, nProbe = 2)
    val odd = AnnIndex.serveIvfPqFiltered(lake, q, k = 5, nProbe = 2,
      candidateFilter = pmod(col("coarse"), lit(2)) === 1)
    // filtered results are a subset of cells: every neighbor's coarse
    // cell is odd
    val cells = codesOf(lake)
      .select(col("neighbor_id"), col("coarse")).distinct()
    val bad = odd.join(cells, "neighbor_id")
      .filter(pmod(col("coarse"), lit(2)) =!= 1).count()
    assert(bad == 0, "filtered serve returned a candidate outside the predicate")
    assert(all.count() > 0 && odd.count() > 0)
    // serving (filtered or not) wrote nothing: same index versions
    assert(lake.versions(AnnIndex.IndexTable) == builtVersions,
      "serve must be read-only on the index table")
  }
}

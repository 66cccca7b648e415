package graft.tools

import graft.storage.Lakehouse
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Commit-chain-length stress for METADATA CHECKPOINTING (VERDICT r8
  * task 1; r9 task 1 swapped the container to column-pruned parquet):
  * before it, cold resolve walked every commit (one listing + one
  * manifest read each) and even a WARM cache hit re-listed every
  * `_v*` dir to fingerprint the chain — O(#commits) RPCs per query,
  * forever. With checkpoints the walk reads ONE state file + the tail
  * above it, and the warm fingerprint validates covered dirs from the
  * single parent listing.
  *
  * One table grows through checkpoints: at each requested chain length
  * N (default 250 / 1000 / 2000 commits) the harness reports
  *   - `cold_ms`: resolve with the snapshot cache OFF but the
  *     checkpoint ON (state decode is cached; this is the steady-state
  *     cold cost) — must stay ~flat as N grows (only the root listing
  *     and the ≤interval tail scale);
  *   - `cold_first_ms`: same but with the checkpoint state cache
  *     dropped — adds the one-time container decode, paid once per
  *     checkpoint file per driver. With the parquet container this
  *     splits into the CORE pass (file lists, row counts, commit
  *     shapes — the `st` zone-map column chunks are never read) and
  *     the lazy HEAVY pass (forced only when a resolve rebuilds a
  *     TableMeta);
  *   - `core_decode_ms`: the column-pruned CORE decode alone (what a
  *     warm fingerprint's committedVs read pays after a driver
  *     restart) — the r8 gzipped-JSON container paid the FULL decode
  *     here, O(#file-records) eager (~50 µs/record ⇒ ~50 s at 1M
  *     files, the named r9 scale cliff);
  *   - `plain_ms`: the pre-checkpoint walk (`spark.graft.useCheckpoint
  *     =false`) — the O(#commits) baseline the checkpoint removes;
  *   - `warm_ms`: snapshot-cache hit (fingerprint validation only) —
  *     O(tail), the per-query cost of an unchanged table.
  * Asserts per N: the resolve was SERVED by the checkpoint, zero data-
  * file footer opens, exact row counts.
  *
  * Usage: `sbt "runMain graft.tools.StressCkpt [--files-per-commit=K]
  * [chainLengths...]"`. `--files-per-commit=100 1000` prices a
  * 100k-file-record checkpoint (the ≥100k done-criterion). One JSON
  * line per N.
  */
object StressCkpt {
  def main(args: Array[String]): Unit = {
    val fpc = args.collectFirst {
      case a if a.startsWith("--files-per-commit=") =>
        a.stripPrefix("--files-per-commit=").toInt
    }.getOrElse(1)
    val plainArgs = args.filterNot(_.startsWith("--"))
    val ns = if (plainArgs.nonEmpty) plainArgs.toSeq.map(_.toInt)
      else Seq(250, 1000, 2000)
    val spark = graft.GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Files.createTempDirectory("graft-ckptstress")
    val schema = StructType.fromDDL("k BIGINT, v BIGINT")
    val lake = new Lakehouse(spark, dir.toString)
    val LB = graft.sources.LakehouseBatch
    val path = lake.tablePath("t")
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    var committed = 0
    import StressUtil.{timed, timedValue}

    val out = for (n <- ns.sorted) yield {
      val rowsPer = 100L * fpc
      while (committed < n) {
        lake.append("t",
          spark.range(committed * rowsPer, (committed + 1) * rowsPer,
            1L, fpc)
            .select(col("id").as("k"), (col("id") * 3).as("v")),
          statsCols = Seq("k"))
        committed += 1
      }
      // the auto-checkpoint (interval 20) has been riding the appends;
      // fold once more so the tail is small and deterministic
      require(lake.checkpoint("t"), s"n=$n checkpoint write failed")
      // checkpoint BUILD cost (round-10 incremental construction):
      // FULL = no previous file to carry from (every live commit pays
      // encode IO — the pre-r10 cost of every build), INCREMENTAL =
      // carry-forward from the newest checkpoint (identity-unchanged
      // records rehydrate from its columns; only the tail encodes).
      val MC = graft.storage.MetaCheckpoint
      val ckptDir = new org.apache.hadoop.fs.Path(path, MC.Dir)
      fs.delete(ckptDir, true)
      MC.dropStateCache()
      val encB0 = MC.recsEncoded.get()
      val tBuildFull = timed {
        require(lake.checkpoint("t"), s"n=$n full build failed"); () }
      val encFull = MC.recsEncoded.get() - encB0
      MC.dropStateCache()
      val (encB1, carB1) = (MC.recsEncoded.get(), MC.recsCarried.get())
      val tBuildIncr = timed {
        require(lake.checkpoint("t"), s"n=$n incr build failed"); () }
      require(MC.recsEncoded.get() == encB1,
        s"n=$n incremental build re-encoded covered records")
      val carIncr = MC.recsCarried.get() - carB1
      require(carIncr == encFull,
        s"n=$n carried $carIncr != live chain $encFull")
      spark.conf.set("spark.graft.metaCacheEntries", "0")
      val opens0 = LB.footerOpens.get()
      val served0 = LB.ckptServes.get()
      val (meta, tColdFirstRaw) = timedValue(LB.resolve(path))
      require(LB.ckptServes.get() > served0,
        s"n=$n resolve was not served by the checkpoint")
      require(LB.footerOpens.get() == opens0,
        s"n=$n plan-time footer opens > 0")
      require(meta.dataFiles.map(_.rowCount).sum == n * rowsPer,
        s"n=$n wrong row count")
      // the column-pruned CORE decode alone (fingerprint-shaped read
      // after a driver restart: committedVs, no heavy columns)
      val tCore = {
        graft.storage.MetaCheckpoint.dropStateCache()
        timed {
          graft.storage.MetaCheckpoint
            .loadLatest(fs, new org.apache.hadoop.fs.Path(path))
            .map(_.committedVs.size).getOrElse(0)
          ()
        }
      }
      // drop the decoded-state cache to price the one-time FULL decode
      // (core + lazy heavy, both forced by the TableMeta rebuild)
      val tColdFirst = {
        graft.storage.MetaCheckpoint.dropStateCache()
        timed { LB.resolve(path); () }
      }
      val tCold = (1 to 3).map(_ => timed { LB.resolve(path); () }).min
      val tPlain = {
        spark.conf.set("spark.graft.useCheckpoint", "false")
        try timed { LB.resolve(path); () }
        finally spark.conf.set("spark.graft.useCheckpoint", "true")
      }
      spark.conf.set("spark.graft.metaCacheEntries", "64")
      LB.resolve(path) // populate the snapshot cache
      val tWarm = (1 to 3).map(_ => timed { LB.resolve(path); () }).min
      // auxiliary reader: `$history`/timestamp travel must be O(tail)
      // through the checkpoint, not a listing per commit dir
      val nHist = lake.history("t").size
      require(nHist >= n, s"n=$n history rows $nHist")
      val tHist = (1 to 3).map(_ => timed { lake.history("t"); () }).min
      val tHistPlain = {
        spark.conf.set("spark.graft.useCheckpoint", "false")
        try timed { lake.history("t"); () }
        finally spark.conf.set("spark.graft.useCheckpoint", "true")
      }
      // auxiliary readers (r9 verdict task 7): the incremental change
      // feed and the streaming source's admission head must classify
      // covered commits from the checkpoint — probes only for the tail
      // — instead of a commitKind RPC per commit dir per call/tick
      val latestV = lake.history("t").map(_._1).max
      val tFeed = (1 to 3).map(_ => timed {
        lake.changesBetween("t", schema, latestV - 5, latestV); () }).min
      val tFeedPlain = {
        spark.conf.set("spark.graft.useCheckpoint", "false")
        try timed {
          lake.changesBetween("t", schema, latestV - 5, latestV); () }
        finally spark.conf.set("spark.graft.useCheckpoint", "true")
      }
      val head = graft.sources.LakehouseStream.stableHeadOf(path)
      require(head == latestV, s"n=$n stream head $head != $latestV")
      val tHead = (1 to 3).map(_ => timed {
        graft.sources.LakehouseStream.stableHeadOf(path); () }).min
      val tHeadPlain = {
        spark.conf.set("spark.graft.useCheckpoint", "false")
        try timed {
          graft.sources.LakehouseStream.stableHeadOf(path); () }
        finally spark.conf.set("spark.graft.useCheckpoint", "true")
      }
      f"""{"n":$n,"files":${meta.dataFiles.length},"build_full_ms":${tBuildFull * 1000}%.0f,"build_incr_ms":${tBuildIncr * 1000}%.0f,"recs_live":$encFull,"core_decode_ms":${tCore * 1000}%.0f,"cold_first_ms":${tColdFirst * 1000}%.0f,"cold_ms":${tCold * 1000}%.0f,"plain_ms":${tPlain * 1000}%.0f,"warm_ms":${tWarm * 1000}%.0f,"hist_ms":${tHist * 1000}%.0f,"hist_plain_ms":${tHistPlain * 1000}%.0f,"feed_ms":${tFeed * 1000}%.0f,"feed_plain_ms":${tFeedPlain * 1000}%.0f,"head_ms":${tHead * 1000}%.0f,"head_plain_ms":${tHeadPlain * 1000}%.0f,"cold_first_raw_ms":${tColdFirstRaw * 1000}%.0f}"""
    }
    out.foreach(println)
    spark.stop()
  }
}

package graft.storage

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Per-file DELETION-VECTOR SIDECARS — the executor-side representation
  * of merge-on-read positional deletes (the Delta/Iceberg-v3 shape).
  *
  * A DV commit previously shipped every deleted (file, pos) pair through
  * the DRIVER: collected at plan time into scan descriptors (V2 path)
  * or broadcast as an anti-join side (Lakehouse.read path) — an
  * O(#deleted rows) driver-memory ceiling that a 100 TB table with 1%
  * MoR-deleted rows (billions of positions) would blow through. The
  * sidecar design removes the positions from the driver entirely:
  *
  *  - the DELETE writes, executor-side, one `_dv_<dataFile>.dvb` binary
  *    per affected data file into the commit's `_GRAFT_DV` dir, holding
  *    that file's deleted positions as SORTED RUNS (start, len) — the
  *    run-length analogue of a roaring bitmap, exact for any pattern
  *    and ~16 bytes per contiguous deleted range;
  *  - the driver only ever touches sidecar NAMES (a listing per DV
  *    commit — metadata-sized) plus one 20-byte header read per
  *    affected file for row-count statistics;
  *  - partition readers (and the [[graft.functions.DvSurvives]] filter
  *    expression on the DataFrame read path) open the sidecars of THEIR
  *    file executor-side and probe positions by binary search over the
  *    run starts.
  *
  * The leading underscore keeps sidecars invisible to
  * `spark.read.parquet` of the same dir (the (file, pos) parquet stays
  * alongside as the audit/change-feed source of record).
  *
  * Reference semantics ported: row-level delete is the takedown/opt-out
  * path (cf. the reference's UPDATE-from semantics, ETL.sql:86-104);
  * positional masking follows Iceberg's sequence-number rule.
  */
object DvSidecar {

  val Prefix = "_dv_"
  val Suffix = ".dvb"
  private val Magic = 0x47445631 // "GDV1"

  /** Sorted deleted-position runs of ONE data file. `starts` ascending,
    * run i covers [starts(i), starts(i)+lens(i)). Probe = binary search
    * for the enclosing run.
    */
  final class Runs(val starts: Array[Long], val lens: Array[Long]) {
    def contains(pos: Long): Boolean = {
      var lo = 0
      var hi = starts.length - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        if (pos < starts(mid)) hi = mid - 1
        else if (pos >= starts(mid) + lens(mid)) lo = mid + 1
        else return true
      }
      false
    }
    def cardinality: Long = { var s = 0L; lens.foreach(s += _); s }
    def isEmpty: Boolean = starts.isEmpty
  }

  val EmptyRuns = new Runs(Array.empty, Array.empty)

  /** Merge several files' worth of runs for the SAME data file (one per
    * DV commit that touched it) into one sorted, coalesced run set.
    */
  def merge(all: Seq[Runs]): Runs = {
    if (all.isEmpty) return EmptyRuns
    if (all.sizeIs == 1) return all.head
    val pairs = all.flatMap(r => r.starts.zip(r.lens)).sortBy(_._1)
    val starts = Array.newBuilder[Long]
    val lens = Array.newBuilder[Long]
    var (cs, cl) = pairs.head
    pairs.tail.foreach { case (s, l) =>
      if (s <= cs + cl) cl = math.max(cl, s + l - cs) // overlap/adjacent
      else { starts += cs; lens += cl; cs = s; cl = l }
    }
    starts += cs; lens += cl
    new Runs(starts.result(), lens.result())
  }

  /** Sidecar name for a data file ("part-…parquet" →
    * "_dv_part-…parquet.dvb").
    */
  def sidecarName(dataFileName: String): String =
    s"$Prefix$dataFileName$Suffix"

  /** Inverse of [[sidecarName]]; None for non-sidecar names. */
  def dataFileOf(sidecar: String): Option[String] =
    if (sidecar.startsWith(Prefix) && sidecar.endsWith(Suffix))
      Some(sidecar.drop(Prefix.length).dropRight(Suffix.length))
    else None

  /** List a DV dir: data-file name → sidecar path. Names only — the
    * driver-side cost of a DV commit is one LIST, never the positions.
    */
  /** Written by [[writeSidecars]] after the last sidecar: its absence
    * next to DV parquet identifies a pre-sidecar (legacy) commit, which
    * readers refuse rather than silently serving deleted rows. (Torn
    * writes don't need it — everything here lands before the version's
    * commit marker, so a crash leaves the whole dir invisible.)
    */
  private val DoneMarker = "_dv_sidecars_done"

  /** Per-file deleted-count index (`_dv_counts`: "name\tcount" lines),
    * written at COMMIT time before the done marker — the plan-time
    * replacement for one 16-byte header read per affected data file.
    * At 100k DV'd files that header pass is 100k driver RPCs per cold
    * resolve; the counts file is one read per DV commit. Absent on
    * legacy commits → callers fall back to header reads.
    */
  private val CountsFile = "_dv_counts"

  /** Deleted-row count per data file of one DV commit, from the counts
    * index when present (one small read), else from per-sidecar header
    * reads (legacy). `idx` is [[index]]'s output for the same dir.
    */
  def deletedCounts(fs: FileSystem, dvDir: Path,
      idx: Map[String, String]): Map[String, Long] = {
    val f = new Path(dvDir, CountsFile)
    val fromFile: Option[Map[String, Long]] =
      if (!fs.exists(f)) None
      else {
        val in = fs.open(f)
        try Some(scala.io.Source.fromInputStream(in, "UTF-8").getLines()
          .filter(_.nonEmpty).map { l =>
            val t = l.lastIndexOf('\t')
            l.substring(0, t) -> l.substring(t + 1).toLong
          }.toMap)
        finally in.close()
      }
    fromFile match {
      // names must cover the sidecar index (a torn/legacy counts file
      // must not silently under-report) — else fall back wholesale
      case Some(m) if idx.keySet.forall(m.contains) => m
      case _ => idx.map { case (name, path) =>
        name -> readHeader(fs, new Path(path))._2
      }
    }
  }

  private def writeCounts(fs: FileSystem, dvDir: Path,
      counts: Seq[(String, Long)]): Unit = {
    val out = fs.create(new Path(dvDir, CountsFile), true)
    try out.write(counts.map { case (n, c) => s"$n\t$c" }
      .mkString("\n").getBytes("UTF-8"))
    finally out.close()
  }

  def index(fs: FileSystem, dvDir: Path): Map[String, String] =
    if (!fs.exists(dvDir)) Map.empty
    else {
      val ls = fs.listStatus(dvDir)
      val names = ls.map(_.getPath.getName).toSet
      require(names.contains(DoneMarker) ||
        !names.exists(_.endsWith(".parquet")),
        s"$dvDir carries deletion-vector tombstones without per-file " +
          "sidecars (pre-sidecar commit?) — compact the table to " +
          "materialize them")
      ls.iterator.flatMap { st =>
        dataFileOf(st.getPath.getName).map(_ -> st.getPath.toString)
      }.toMap
    }

  /** Write sidecars for a (file STRING, pos BIGINT) frame into `dvDir`,
    * EXECUTOR-SIDE: one shuffle clusters each data file's positions
    * into one task slice sorted by position, and the task streams runs
    * straight to the sidecar — driver memory stays O(1) in deleted
    * rows. Peak task memory is O(runs of one file), and only because
    * the run count precedes the runs in the header.
    */
  def writeSidecars(dv: DataFrame, dvDir: String): Unit = {
    dv.select(col("file").cast("string"), col("pos").cast("long"))
      .repartition(col("file"))
      .sortWithinPartitions("file", "pos")
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        val conf = graft.storage.HadoopConfs.fresh()
        val dir = new Path(dvDir)
        val fs = dir.getFileSystem(conf)
        var curFile: String = null
        val starts = scala.collection.mutable.ArrayBuffer.empty[Long]
        val lens = scala.collection.mutable.ArrayBuffer.empty[Long]
        var runStart = -1L
        var runLen = 0L
        def closeRun(): Unit =
          if (runLen > 0) { starts += runStart; lens += runLen; runLen = 0 }
        def flushFile(): Unit = if (curFile != null) {
          closeRun()
          val out = fs.create(
            new Path(dir, sidecarName(curFile)), true)
          try {
            val d = new java.io.DataOutputStream(
              new java.io.BufferedOutputStream(out, 1 << 16))
            d.writeInt(Magic)
            d.writeInt(starts.length)
            var card = 0L
            lens.foreach(card += _)
            d.writeLong(card)
            var i = 0
            while (i < starts.length) {
              d.writeLong(starts(i)); d.writeLong(lens(i)); i += 1
            }
            d.flush()
          } finally out.close()
          starts.clear(); lens.clear()
        }
        rows.foreach { r =>
          val f = r.getString(0)
          val p = r.getLong(1)
          if (f != curFile) { flushFile(); curFile = f; runStart = -2L }
          if (runLen > 0 && p == runStart + runLen) runLen += 1
          else if (runLen > 0 && p < runStart + runLen) () // duplicate
          else { closeRun(); runStart = p; runLen = 1 }
        }
        flushFile()
      }
    // counts index + completion marker (driver-side, after every task
    // wrote). The header pass here is the commit paying O(#affected
    // files) ONCE so resolve never does per query; readers use the
    // marker to tell "sidecar-complete commit" from a legacy
    // parquet-only one — load-bearing for EMPTY deletes, whose parquet
    // exists but yields zero sidecars
    val dir = new Path(dvDir)
    val conf = org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration
    val fs = dir.getFileSystem(conf)
    val names = fs.listStatus(dir).map(_.getPath)
      .flatMap(p => dataFileOf(p.getName).map(_ -> p)).toSeq
    writeCounts(fs, dir, DriverIo.parMap(names) { case (n, p) =>
      n -> readHeader(fs, p)._2
    })
    fs.create(new Path(dir, DoneMarker), true).close()
  }

  /** Whole-file masks for a REWRITE commit ([[Lakehouse]]'s
    * `rewriteDeletes`): one sidecar per replaced data file, each a
    * single run [0, rowCount) — 36 bytes, written driver-side (the
    * entry count is O(#replaced files), never O(#rows); the run-length
    * format is what makes "delete the whole file" metadata-sized).
    * Ends with the completion marker like [[writeSidecars]].
    */
  /** Driver-side sidecar write for a SMALL deletion vector whose
    * (file, pos) pairs are already in driver memory (the common DML
    * case — a point delete or an SCD close touches thousands of rows,
    * not billions). Replaces [[writeSidecars]]'s two Spark jobs (the
    * repartition-write plus the counts header pass) with plain fs
    * writes: at the metered op bill a Spark write job costs ~15
    * committer fs ops before a byte of payload. Callers bound the size
    * ([[graft.storage.Lakehouse.commitMoRDelta]]'s
    * `spark.graft.dvDriverWriteMax`); the executor-side
    * [[writeSidecars]] remains the unbounded-scale path.
    */
  def writeSidecarsDriverSide(fs: FileSystem, dvDir: Path,
      pairs: Seq[(String, Long)]): Unit = {
    fs.mkdirs(dvDir)
    val counts = pairs.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (name, ps) =>
        val sorted = ps.map(_._2).distinct.sorted
        val starts = scala.collection.mutable.ArrayBuffer.empty[Long]
        val lens = scala.collection.mutable.ArrayBuffer.empty[Long]
        sorted.foreach { p =>
          if (lens.nonEmpty && p == starts.last + lens.last)
            lens(lens.length - 1) += 1
          else { starts += p; lens += 1L }
        }
        val out = fs.create(new Path(dvDir, sidecarName(name)), true)
        try {
          val d = new java.io.DataOutputStream(
            new java.io.BufferedOutputStream(out, 1 << 16))
          d.writeInt(Magic)
          d.writeInt(starts.length)
          d.writeLong(sorted.length.toLong)
          var i = 0
          while (i < starts.length) {
            d.writeLong(starts(i)); d.writeLong(lens(i)); i += 1
          }
          d.flush()
        } finally out.close()
        name -> sorted.length.toLong
    }
    writeCounts(fs, dvDir, counts)
    fs.create(new Path(dvDir, DoneMarker), true).close()
  }

  def writeWholeFileSidecars(fs: FileSystem, dvDir: Path,
      files: Seq[(String, Long)]): Unit = {
    fs.mkdirs(dvDir)
    files.foreach { case (name, rows) =>
      require(rows > 0, s"whole-file mask of empty file $name")
      val out = fs.create(new Path(dvDir, sidecarName(name)), true)
      try {
        val d = new java.io.DataOutputStream(out)
        d.writeInt(Magic)
        d.writeInt(1)
        d.writeLong(rows)
        d.writeLong(0L)
        d.writeLong(rows)
        d.flush()
      } finally out.close()
    }
    writeCounts(fs, dvDir, files) // counts are the masked row counts
    fs.create(new Path(dvDir, DoneMarker), true).close()
  }

  /** Header-only read: (runCount, deletedRowCount). Driver-side use is
    * limited to this 16-byte read (scan statistics).
    */
  def readHeader(fs: FileSystem, path: Path): (Int, Long) = {
    val in = new java.io.DataInputStream(fs.open(path))
    try {
      require(in.readInt() == Magic, s"not a DV sidecar: $path")
      (in.readInt(), in.readLong())
    } finally in.close()
  }

  /** Full sidecar read (executor-side: partition readers and the
    * DvSurvives filter expression).
    */
  def readRuns(conf: Configuration, path: String): Runs = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val in = new java.io.DataInputStream(
      new java.io.BufferedInputStream(fs.open(p), 1 << 16))
    try {
      require(in.readInt() == Magic, s"not a DV sidecar: $path")
      val n = in.readInt()
      in.readLong() // cardinality
      val starts = new Array[Long](n)
      val lens = new Array[Long](n)
      var i = 0
      while (i < n) { starts(i) = in.readLong(); lens(i) = in.readLong(); i += 1 }
      new Runs(starts, lens)
    } finally in.close()
  }

  /** Load-and-merge every applicable sidecar of one data file. */
  def loadFor(conf: Configuration, sidecarPaths: Seq[String]): Runs =
    merge(sidecarPaths.map(readRuns(conf, _)))
}

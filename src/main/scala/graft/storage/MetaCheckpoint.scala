package graft.storage

import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import scala.util.control.NonFatal

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** METADATA CHECKPOINT — plan time O(1) in commit-chain length.
  *
  * Without it, every cold resolve walks the whole chain: one listing +
  * one manifest read per commit, and the warm-path fingerprint lists
  * every `_v*` dir — O(#commits) RPCs per QUERY, forever (the one
  * remaining 100×-scale surface after round 8). The checkpoint is the
  * Delta `_last_checkpoint` / Iceberg metadata-snapshot shape: a
  * periodic FOLD of everything resolve derives per commit — commit
  * kinds, data-file lists with sizes and row counts, zone-map rows,
  * manifest locations, rewrite-replaced names, DV indexes + deleted
  * counts, equality-delete descriptors — into ONE gzipped JSON file
  * under `_GRAFT_CKPT/`. Resolve then reads checkpoint + the commit
  * TAIL above it; the warm fingerprint validates covered dirs by
  * (name, mtime) from ONE parent listing instead of listing each.
  *
  * DERIVED, NEVER LOAD-BEARING: the checkpoint carries no facts the
  * chain does not; every read validates the covered dirs' identities
  * against the live listing and falls back to the plain walk on ANY
  * doubt (a covered dir's mtime moved, a dir vanished without a full
  * above it, a decode failure, an unencodable stats type). Rebase
  * renames, rewrite races, vacuum and table re-creation therefore
  * compose exactly as without it — the fallback IS the old path.
  *
  * Validation soundness leans on the commit protocol's immutability
  * rule (a version dir never changes after its marker lands; GC
  * removes dirs WHOLE) plus POSIX dir-mtime semantics (any direct-
  * child create/delete/rename bumps the parent dir's mtime) — the
  * same facts the snapshot-cache fingerprint has leaned on since
  * round 7. Dirs recorded UNCOMMITTED at build time are re-probed the
  * moment their identity changes (a slow writer's marker landing), so
  * in-flight commits below the checkpoint version are never lost.
  *
  * Concurrency: checkpoint files are immutable and uniquely named
  * (`ckpt_<version>_<millis>.json.gz`, staged + renamed); readers pick
  * the newest parseable one, writers keep the newest three — two
  * racing checkpointers just produce two files, no pointer file to
  * fight over. On object stores the staging rename degrades to
  * copy+delete at worst; a torn file fails its gzip/JSON decode and
  * the reader falls through to the previous checkpoint or the plain
  * walk.
  */
private[graft] object MetaCheckpoint {

  val Dir = "_GRAFT_CKPT"
  /** Default auto-checkpoint cadence (commits above the last
    * checkpoint); `spark.graft.checkpointIntervalCommits` overrides,
    * 0 disables.
    */
  val DefaultInterval = 20

  // ——— model ———

  final case class FileRec(rel: String, size: Long, rows: Long,
      stat: Option[IndexedSeq[Option[String]]])
  final case class VersionRec(v: Long, full: Boolean, dirMtime: Long,
      payload: Boolean,
      statCols: Seq[(String, String)],
      files: Seq[FileRec],
      mStats: Seq[String], mBlooms: Seq[String],
      manifestParts: Seq[String], rewritten: Seq[String],
      dvIndex: Map[String, String], dvCounts: Map[String, Long],
      eqDel: Option[(String, Seq[String])],
      dvxCols: Seq[(String, String)] = Nil,
      dvx: Map[String, IndexedSeq[Option[String]]] = Map.empty,
      eqCounts: Option[Map[String, Long]] = None)
  final case class UncommittedRec(v: Long, mtime: Long)
  final case class State(version: Long, versions: Seq[VersionRec],
      uncommitted: Seq[UncommittedRec]) {
    lazy val committedVs: Set[Long] = versions.map(_.v).toSet
  }

  // ——— wire format (json4s extraction mirrors) ———

  private case class WFile(p: String, sz: Long, n: Long,
      st: Option[List[Option[String]]])
  private case class WEq(dir: String, cols: List[String])
  private case class WVer(v: Long, full: Boolean, mt: Long,
      payload: Boolean, statCols: List[List[String]],
      mStats: List[String], mBlooms: List[String], parts: List[String],
      rewritten: List[String], dv: Map[String, String],
      dvc: Map[String, Long], eq: Option[WEq], files: List[WFile],
      dvxCols: Option[List[List[String]]],
      dvx: Option[Map[String, List[Option[String]]]],
      eqc: Option[Map[String, Long]])
  private case class WUnc(v: Long, mt: Long)
  private case class WState(version: Long, uncommitted: List[WUnc],
      versions: List[WVer])

  private implicit val formats: org.json4s.Formats =
    org.json4s.DefaultFormats

  private def toWire(st: State): WState = WState(st.version,
    st.uncommitted.map(u => WUnc(u.v, u.mtime)).toList,
    st.versions.map(r => WVer(r.v, r.full, r.dirMtime, r.payload,
      r.statCols.map { case (n, t) => List(n, t) }.toList,
      r.mStats.toList, r.mBlooms.toList, r.manifestParts.toList,
      r.rewritten.toList, r.dvIndex, r.dvCounts,
      r.eqDel.map { case (d, cols) => WEq(d, cols.toList) },
      r.files.map(f => WFile(f.rel, f.size, f.rows,
        f.stat.map(_.toList))).toList,
      if (r.dvxCols.isEmpty) None
      else Some(r.dvxCols.map { case (n, t) => List(n, t) }.toList),
      if (r.dvx.isEmpty) None
      else Some(r.dvx.map { case (k, vs) => k -> vs.toList }),
      r.eqCounts)).toList)

  private def fromWire(w: WState): State = State(w.version,
    w.versions.map(r => VersionRec(r.v, r.full, r.mt, r.payload,
      r.statCols.map(l => (l.head, l(1))),
      r.files.map(f => FileRec(f.p, f.sz, f.n,
        f.st.map(_.toIndexedSeq))),
      r.mStats, r.mBlooms, r.parts, r.rewritten, r.dv, r.dvc,
      r.eq.map(e => (e.dir, e.cols)),
      r.dvxCols.getOrElse(Nil).map(l => (l.head, l(1))),
      r.dvx.getOrElse(Map.empty)
        .map { case (k, vs) => k -> vs.toIndexedSeq },
      r.eqc)),
    w.uncommitted.map(u => UncommittedRec(u.v, u.mt)))

  // ——— typed stat-value codec ———
  // Tags pin the manifest column's Spark type; values round-trip as
  // strings. Only types the manifest writers produce are supported —
  // an unencodable column aborts the whole checkpoint (the plain walk
  // keeps serving the table; nothing degrades silently).

  private[graft] def tagOf(dt: DataType): Option[String] = dt match {
    case LongType => Some("l")
    case IntegerType => Some("i")
    case ShortType => Some("sh")
    case ByteType => Some("by")
    case StringType => Some("s")
    case BooleanType => Some("b")
    case DoubleType => Some("d")
    case FloatType => Some("f")
    case TimestampType => Some("ts")
    case TimestampNTZType => Some("tsn")
    case DateType => Some("dt")
    case t: DecimalType => Some(s"dec:${t.precision}:${t.scale}")
    case _ => None
  }

  private[graft] def dataTypeOf(tag: String): DataType = tag match {
    case "l" => LongType
    case "i" => IntegerType
    case "sh" => ShortType
    case "by" => ByteType
    case "s" => StringType
    case "b" => BooleanType
    case "d" => DoubleType
    case "f" => FloatType
    case "ts" => TimestampType
    case "tsn" => TimestampNTZType
    case "dt" => DateType
    case t if t.startsWith("dec:") =>
      val Array(_, p, s) = t.split(":", 3)
      DecimalType(p.toInt, s.toInt)
    case other =>
      throw new IllegalArgumentException(s"unknown stat tag: $other")
  }

  private[graft] def encodeVal(tag: String, v: Any): Option[String] =
    (tag, v) match {
      case (_, null) => None // callers wrap null separately
      case ("s", s: String) => Some(s)
      case ("l" | "i" | "sh" | "by" | "b" | "d" | "f", x) =>
        Some(x.toString)
      case ("ts", t: java.sql.Timestamp) =>
        Some(s"${t.getTime}:${t.getNanos}")
      case ("ts", i: java.time.Instant) =>
        val t = java.sql.Timestamp.from(i)
        Some(s"${t.getTime}:${t.getNanos}")
      case ("tsn", l: java.time.LocalDateTime) => Some(l.toString)
      case ("dt", d: java.sql.Date) => Some(d.toString)
      case ("dt", l: java.time.LocalDate) => Some(l.toString)
      case (t, x: java.math.BigDecimal) if t.startsWith("dec:") =>
        Some(x.toPlainString)
      case (t, x: scala.math.BigDecimal) if t.startsWith("dec:") =>
        Some(x.underlying.toPlainString)
      case _ => None
    }

  private[graft] def decodeVal(tag: String, s: String): Any = tag match {
    case "l" => s.toLong
    case "i" => s.toInt
    case "sh" => s.toShort
    case "by" => s.toByte
    case "s" => s
    case "b" => s.toBoolean
    case "d" => s.toDouble
    case "f" => s.toFloat
    case "ts" =>
      val i = s.lastIndexOf(':')
      val t = new java.sql.Timestamp(s.substring(0, i).toLong)
      t.setNanos(s.substring(i + 1).toInt)
      t
    case "tsn" => java.time.LocalDateTime.parse(s)
    case "dt" => java.sql.Date.valueOf(s)
    case t if t.startsWith("dec:") => new java.math.BigDecimal(s)
    case other =>
      throw new IllegalArgumentException(s"unknown stat tag: $other")
  }

  // ——— read side ———

  /** Decoded checkpoint states keyed by (path, len, mtime) — files are
    * immutable once renamed into place, so identity pins content.
    * Bounded; eviction is arbitrary-ish (first keys), which is fine at
    * this size.
    */
  private val stateCache = new java.util.concurrent.ConcurrentHashMap[
    String, State]()

  /** Test/stress observability: price an uncached state decode. */
  private[graft] def dropStateCache(): Unit = stateCache.clear()

  private def parseName(n: String): Option[(Long, Long)] = {
    // ckpt_<version>_<millis>.json.gz
    if (!n.startsWith("ckpt_") || !n.endsWith(".json.gz")) None
    else n.stripPrefix("ckpt_").stripSuffix(".json.gz").split("_") match {
      case Array(v, ms) if v.forall(_.isDigit) && ms.forall(_.isDigit) &&
        v.length <= 18 && ms.length <= 18 => Some((v.toLong, ms.toLong))
      case _ => None
    }
  }

  /** Names of checkpoint files, for the snapshot fingerprint (which
    * checkpoint is newest decides which dirs get identity-only
    * treatment, so it must ride the digest).
    */
  def listCkptFiles(fs: FileSystem, dest: Path): Seq[FileStatus] =
    try fs.listStatus(new Path(dest, Dir)).toSeq
      .filter(st => parseName(st.getPath.getName).isDefined)
      .sortBy(st => parseName(st.getPath.getName).get)
    catch { case _: java.io.FileNotFoundException => Seq.empty }

  /** Newest parseable checkpoint, or None. A torn/corrupt file falls
    * through to the next-newest — the checkpoint never makes a table
    * unreadable.
    */
  def loadLatest(fs: FileSystem, dest: Path): Option[State] = {
    val cands = listCkptFiles(fs, dest).reverse
    cands.iterator.map(loadFile(fs, _)).collectFirst {
      case Some(st) => st
    }
  }

  private def loadFile(fs: FileSystem, st: FileStatus): Option[State] = {
    val key = s"${st.getPath}:${st.getLen}:${st.getModificationTime}"
    Option(stateCache.get(key)).orElse {
      try {
        val in = new GZIPInputStream(fs.open(st.getPath))
        val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        val state = fromWire(org.json4s.jackson.JsonMethods.parse(txt)
          .extract[WState])
        if (stateCache.size > 64) stateCache.clear()
        stateCache.put(key, state)
        Some(state)
      } catch { case NonFatal(_) => None }
    }
  }

  /** Reconstruct one covered root for the planner's fold: zone-map rows
    * rebuilt with the manifest's exact column schema (absent-vs-null
    * semantics survive the round trip), file sizes and row counts
    * pre-resolved so the fold performs ZERO per-file IO.
    */
  def toRootData(dest: Path, r: VersionRec)
      : graft.sources.LakehouseBatch.RootData = {
    def abs(rel: String): Path =
      if (rel.startsWith("/") || rel.contains("://")) new Path(rel)
      else new Path(dest, rel)
    val schema = StructType(r.statCols.map { case (n, t) =>
      StructField(n, dataTypeOf(t)) })
    val tags = r.statCols.map(_._2)
    val statRows: Map[String, org.apache.spark.sql.Row] =
      r.files.flatMap { f =>
        f.stat.map { vals =>
          val decoded: Array[Any] = vals.zip(tags).map {
            case (Some(s), t) => decodeVal(t, s)
            case (None, _) => null
          }.toArray
          abs(f.rel).getName ->
            (new org.apache.spark.sql.catalyst.expressions
              .GenericRowWithSchema(decoded, schema)
              : org.apache.spark.sql.Row)
        }
      }.toMap
    graft.sources.LakehouseBatch.RootData(
      r.v, new Path(dest, s"${Lakehouse.Protocol.VersionPrefix}${r.v}"),
      r.files.map(f => (abs(f.rel), f.size)),
      statRows, r.mStats.toSet, r.mBlooms.toSet, r.rewritten.toSet,
      r.manifestParts.map(abs(_).toString),
      r.files.map(f => abs(f.rel).getName -> f.rows).toMap)
  }

  // ——— write side ———

  private def relOf(fs: FileSystem, dest: Path, p: Path): String = {
    val d = fs.makeQualified(dest).toUri.getPath
    val q = fs.makeQualified(p).toUri.getPath
    if (q.startsWith(d + "/")) q.drop(d.length + 1) else q
  }

  /** Build + publish one checkpoint from the CURRENT chain. Best-effort
    * by contract: false (nothing written) when any shape is unprovable
    * — an unreadable footer, an unencodable stats type — and the plain
    * walk keeps serving the table. Versions strictly below the newest
    * FULL commit are recorded identity-only (resolve can never serve
    * them; their bytes would be dead weight).
    */
  def writeCheckpoint(spark: SparkSession, fs: FileSystem,
      conf: Configuration, dest: Path): Boolean = {
    val dirSt = Lakehouse.Protocol.versionDirStatuses(fs, dest)
      .sortBy(_._1)
    if (dirSt.isEmpty) return false
    val kinds: Seq[(Long, FileStatus, Option[Boolean])] =
      DriverIo.parMap(dirSt) { case (v, st) =>
        (v, st, Lakehouse.Protocol.commitKind(fs, st.getPath))
      }
    val committed = kinds.collect { case (v, st, Some(full)) =>
      (v, st, full) }
    if (committed.isEmpty) return false
    val ckptV = committed.map(_._1).max
    val lastFullV = committed.filter(_._3).map(_._1).maxOption
      .getOrElse(Long.MinValue)
    val uncommitted = kinds.collect { case (v, st, None) =>
      UncommittedRec(v, st.getModificationTime) }
    val recs: Seq[Option[VersionRec]] =
      DriverIo.parMap(committed) { case (v, st, full) =>
        if (v < lastFullV)
          Some(VersionRec(v, full, st.getModificationTime,
            payload = false, Nil, Nil, Nil, Nil, Nil, Nil,
            Map.empty, Map.empty, None))
        else encodeRec(spark, fs, conf, dest, v, st, full)
      }
    if (recs.exists(_.isEmpty)) return false
    val state = State(ckptV, recs.flatten, uncommitted)
    val dir = new Path(dest, Dir)
    fs.mkdirs(dir)
    val stamp = System.currentTimeMillis()
    val name = s"ckpt_${ckptV}_$stamp.json.gz"
    val tmp = new Path(dir, s"_tmp_$name")
    val out = fs.create(tmp, true)
    val gz = new GZIPOutputStream(out)
    try gz.write(org.json4s.jackson.Serialization.write(toWire(state))
      .getBytes(UTF_8))
    finally gz.close()
    if (!fs.rename(tmp, new Path(dir, name))) {
      fs.delete(tmp, false)
      return false
    }
    // keep the newest 3 (readers racing a prune fall through to the
    // next-newest parseable file, and 3 is plenty of depth for that)
    val all = listCkptFiles(fs, dest)
    all.dropRight(3).foreach(st => fs.delete(st.getPath, false))
    true
  }

  private def encodeRec(spark: SparkSession, fs: FileSystem,
      conf: Configuration, dest: Path, v: Long, st: FileStatus,
      full: Boolean): Option[VersionRec] = {
    val root = st.getPath
    val rd = graft.sources.LakehouseBatch.walkRoot(spark, conf, fs, v,
      root)
    // column schema of this version's manifest (uniform per commit)
    val firstRow = rd.statRows.values.headOption
    val statCols: Seq[(String, String)] = firstRow match {
      case None => Nil
      case Some(row) =>
        val tags = row.schema.fields.toSeq.map(f =>
          tagOf(f.dataType).map(t => (f.name, t)))
        if (tags.exists(_.isEmpty)) return None // unencodable type
        tags.flatten
    }
    // row counts: manifest `rows` column first, one footer open for
    // anything else (paid ONCE here, never again at plan time)
    def manifestRows(p: Path): Option[Long] = {
      val stat = rd.statRows.get(p.getName)
        .orElse(rd.statRows.get(p.toString))
        .orElse(rd.statRows.get(p.toUri.toString))
      stat.flatMap { r =>
        val i = r.schema.fieldNames.indexOf("rows")
        if (i < 0 || r.isNullAt(i)) None else Some(r.getLong(i))
      }
    }
    val needFooter = rd.files.map(_._1).filter(manifestRows(_).isEmpty)
    val footerRows: Map[String, Long] =
      if (needFooter.isEmpty) Map.empty
      else FooterStats.rowCounts(fs, conf, needFooter) match {
        case Some(m) => m
        case None => return None // unreadable footer: unprovable
      }
    val files = rd.files.map { case (p, size) =>
      val stat = rd.statRows.get(p.getName)
        .orElse(rd.statRows.get(p.toString))
        .orElse(rd.statRows.get(p.toUri.toString))
      val encoded: Option[IndexedSeq[Option[String]]] = stat.map { row =>
        statCols.toIndexedSeq.map { case (n, t) =>
          val i = row.schema.fieldNames.indexOf(n)
          if (i < 0 || row.isNullAt(i)) None
          else encodeVal(t, row.get(i)) match {
            case some @ Some(_) => some
            case None => return None // value class the tag can't carry
          }
        }
      }
      FileRec(relOf(fs, dest, p), size,
        manifestRows(p).orElse(footerRows.get(p.getName)).getOrElse(0L),
        encoded)
    }
    val dv = graft.sources.LakehouseBatch.dvOf(fs, conf, v, root)
    val eq = graft.sources.LakehouseBatch.eqDelOf(fs, conf, v, root)
    val eqCounts = eq.flatMap { case (_, d, _) =>
      graft.sources.LakehouseBatch.eqDelCountsOf(fs, new Path(d)) }
    // DV post-mask extremes ride the checkpoint with the same typed
    // codec as stat rows (one shared schema per commit); an
    // unencodable shape drops ONLY the extremes (MIN/MAX declines),
    // never the whole checkpoint
    val (dvxCols, dvx) = dv.map(_.extremes).filter(_.nonEmpty) match {
      case None => (Nil, Map.empty[String, IndexedSeq[Option[String]]])
      case Some(ex) =>
        val row = ex.values.head
        val tags = row.schema.fields.toSeq.map(f =>
          tagOf(f.dataType).map(t => (f.name, t)))
        if (tags.exists(_.isEmpty))
          (Nil, Map.empty[String, IndexedSeq[Option[String]]])
        else {
          val cols = tags.flatten
          var unencodable = false
          val enc = ex.toSeq.map { case (name, r) =>
            val vals = cols.toIndexedSeq.map { case (n, t) =>
              val i = r.schema.fieldNames.indexOf(n)
              if (i < 0 || r.isNullAt(i)) Option.empty[String]
              else encodeVal(t, r.get(i)) match {
                case some @ Some(_) => some
                case None => // a value the tag can't carry: drop the
                  unencodable = true // whole block, keep the checkpoint
                  None
              }
            }
            (name, vals)
          }
          if (unencodable)
            (Nil, Map.empty[String, IndexedSeq[Option[String]]])
          else (cols, enc.toMap)
        }
    }
    Some(VersionRec(v, full, st.getModificationTime, payload = true,
      statCols, files, rd.mStats.toSeq.sorted, rd.mBlooms.toSeq.sorted,
      rd.manifestParts.map(s => relOf(fs, dest, new Path(s))),
      rd.rewritten.toSeq.sorted,
      dv.map(_.idx.map { case (n, p) =>
        n -> relOf(fs, dest, new Path(p)) }).getOrElse(Map.empty),
      dv.map(_.counts).getOrElse(Map.empty),
      eq.map { case (_, d, cols) => (relOf(fs, dest, new Path(d)), cols) },
      dvxCols, dvx, eqCounts))
  }

  /** Decode one covered commit's DV post-mask extremes back to typed
    * rows (the planner substitutes them for a DV'd file's manifest row
    * in pruning and MIN/MAX folds).
    */
  def decodeDvExtremes(r: VersionRec)
      : Map[String, org.apache.spark.sql.Row] =
    if (r.dvxCols.isEmpty) Map.empty
    else {
      val schema = StructType(r.dvxCols.map { case (n, t) =>
        StructField(n, dataTypeOf(t)) })
      val tags = r.dvxCols.map(_._2)
      r.dvx.map { case (name, vals) =>
        val decoded: Array[Any] = vals.zip(tags).map {
          case (Some(s), t) => decodeVal(t, s)
          case (None, _) => null
        }.toArray
        name -> (new org.apache.spark.sql.catalyst.expressions
          .GenericRowWithSchema(decoded, schema)
          : org.apache.spark.sql.Row)
      }
    }

  /** Commit-side trigger: checkpoint when ≥ interval version dirs sit
    * above the newest checkpoint. Called best-effort after every
    * commit marker; failures never fail the commit.
    */
  def maybeCheckpoint(spark: SparkSession, fs: FileSystem,
      conf: Configuration, dest: Path): Unit = {
    val interval = spark.conf
      .getOption("spark.graft.checkpointIntervalCommits")
      .map(_.toInt).getOrElse(DefaultInterval)
    if (interval <= 0) return
    val lastV = listCkptFiles(fs, dest).lastOption
      .flatMap(st => parseName(st.getPath.getName)).map(_._1)
      .getOrElse(-1L)
    val above = Lakehouse.Protocol.versionDirs(fs, dest)
      .count(_._1 > lastV)
    if (above >= interval) writeCheckpoint(spark, fs, conf, dest)
  }
}

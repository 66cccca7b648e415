package graft.storage

import java.util.zip.GZIPInputStream

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
      eqCounts: Option[Map[String, Long]] = None,
      basis: Option[Set[Long]] = None,
      // commit-marker mtime (the commit instant [[Lakehouse.history]]
      // serves); 0 = not recorded — history walks that dir live
      commitMs: Long = 0L)
  final case class UncommittedRec(v: Long, mtime: Long)

  /** The HEAVY columns — per-(version, fileRel) encoded zone-map values
    * and per-(version, fileName) DV post-mask extremes. In the parquet
    * container these live in their own column chunk, skipped by the
    * core decode and loaded AT MOST ONCE per driver per checkpoint
    * file, on the first resolve that actually rebuilds a TableMeta
    * (the warm fingerprint's committedVs read never touches them).
    */
  final class Heavy(
      val fileStats: Map[(Long, String), IndexedSeq[Option[String]]],
      val dvx: Map[(Long, String), IndexedSeq[Option[String]]])

  final case class State(version: Long, versions: Seq[VersionRec],
      uncommitted: Seq[UncommittedRec],
      heavyLoader: () => Heavy) {
    lazy val committedVs: Set[Long] = versions.map(_.v).toSet
    /** Memoized — the column-pruned second pass runs at most once. */
    lazy val heavy: Heavy = heavyLoader()
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
      eqc: Option[Map[String, Long]],
      basis: Option[List[Long]])
  private case class WUnc(v: Long, mt: Long)
  private case class WState(version: Long, uncommitted: List[WUnc],
      versions: List[WVer])

  private implicit val formats: org.json4s.Formats =
    org.json4s.DefaultFormats

  /** Per-version SMALL header, JSON inside the parquet container's
    * `hdr` column (O(#versions), never O(#files)): manifest schema
    * tags, manifest locations, rewrite list, eq-del descriptor +
    * counts-presence flag, DV-extremes schema, recorded read basis.
    */
  private case class WHdr(statCols: List[List[String]],
      mStats: List[String], mBlooms: List[String], parts: List[String],
      rewritten: List[String], eq: Option[WEq],
      dvxCols: Option[List[List[String]]], basis: Option[List[Long]],
      eqcP: Option[Boolean], cms: Option[Long])

  private def fromWire(w: WState): State = {
    val versions = w.versions.map(r => VersionRec(r.v, r.full, r.mt,
      r.payload,
      r.statCols.map(l => (l.head, l(1))),
      r.files.map(f => FileRec(f.p, f.sz, f.n,
        f.st.map(_.toIndexedSeq))),
      r.mStats, r.mBlooms, r.parts, r.rewritten, r.dv, r.dvc,
      r.eq.map(e => (e.dir, e.cols)),
      r.dvxCols.getOrElse(Nil).map(l => (l.head, l(1))),
      r.dvx.getOrElse(Map.empty)
        .map { case (k, vs) => k -> vs.toIndexedSeq },
      r.eqc, r.basis.map(_.toSet)))
    // legacy JSON carries the heavy values inline — the loader just
    // re-keys what the parse already decoded
    val loader = () => new Heavy(
      versions.flatMap(r => r.files.flatMap(f =>
        f.stat.map(((r.v, f.rel)) -> _))).toMap,
      versions.flatMap(r => r.dvx.map { case (n, vs) =>
        ((r.v, n)) -> vs }).toMap)
    State(w.version, versions,
      w.uncommitted.map(u => UncommittedRec(u.v, u.mt)), loader)
  }

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
    // ckpt_<version>_<millis>.parquet (current) / .json.gz (legacy read)
    val stem =
      if (n.endsWith(".parquet")) Some(n.stripSuffix(".parquet"))
      else if (n.endsWith(".json.gz")) Some(n.stripSuffix(".json.gz"))
      else None
    stem.filter(_.startsWith("ckpt_"))
      .map(_.stripPrefix("ckpt_").split("_")).flatMap {
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
        val state =
          if (st.getPath.getName.endsWith(".parquet"))
            ParquetCodec.read(fs.getConf, st.getPath)
          else {
            val in = new GZIPInputStream(fs.open(st.getPath))
            val txt = try scala.io.Source
              .fromInputStream(in, "UTF-8").mkString
              finally in.close()
            fromWire(org.json4s.jackson.JsonMethods.parse(txt)
              .extract[WState])
          }
        if (stateCache.size > 64) stateCache.clear()
        stateCache.put(key, state)
        Some(state)
      } catch { case NonFatal(_) => None }
    }
  }

  /** Reconstruct one covered root for the planner's fold: zone-map rows
    * rebuilt with the manifest's exact column schema (absent-vs-null
    * semantics survive the round trip), file sizes and row counts
    * pre-resolved so the fold performs ZERO per-file IO. Forcing
    * `st.heavy` here is what makes the heavy columns lazy: fingerprint
    * reads (committedVs) never reach this.
    */
  def toRootData(dest: Path, st: State, r: VersionRec)
      : graft.sources.LakehouseBatch.RootData = {
    def abs(rel: String): Path =
      if (rel.startsWith("/") || rel.contains("://")) new Path(rel)
      else new Path(dest, rel)
    val schema = StructType(r.statCols.map { case (n, t) =>
      StructField(n, dataTypeOf(t)) })
    val tags = r.statCols.map(_._2)
    val statRows: Map[String, org.apache.spark.sql.Row] =
      r.files.flatMap { f =>
        st.heavy.fileStats.get((r.v, f.rel)).map { vals =>
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
      r.files.map(f => abs(f.rel).getName -> f.rows).toMap,
      basis = r.basis)
  }

  // ——— write side ———

  /** Test/stress observability: incremental-build accounting — records
    * carried forward from the previous checkpoint vs encoded fresh
    * from their dirs. A long-chain re-checkpoint must be
    * carried-dominated or the build is back to O(chain) RPCs.
    */
  private[graft] val recsCarried =
    new java.util.concurrent.atomic.AtomicLong
  private[graft] val recsEncoded =
    new java.util.concurrent.atomic.AtomicLong

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
    *
    * The build is INCREMENTAL (Delta's checkpoint-from-checkpoint
    * shape): records of the previous checkpoint whose dir identity is
    * unchanged carry forward — their kind probe is skipped (a
    * committed dir never retracts its marker, so an unchanged mtime
    * pins the kind) and their payload rehydrates from the previous
    * file's columns instead of re-reading the dir's manifests. Only
    * the tail above the previous checkpoint, plus any dir whose
    * identity moved (rebase, vacuum, a slow writer's marker landing),
    * pays encode IO — at 1M files the build stops being the one
    * remaining O(chain)-RPC maintenance step. Dirs the previous build
    * recorded UNCOMMITTED are always re-probed (their marker can land
    * within the same mtime tick — the identity rule cannot see it).
    */
  def writeCheckpoint(spark: SparkSession, fs: FileSystem,
      conf: Configuration, dest: Path): Boolean = {
    // SHALLOW CLONES never checkpoint: the checkpoint's file records
    // assume every version dir lives under `dest`, but a clone's
    // listing unions SOURCE dirs — resolving their rel paths against
    // the clone root would point at nothing. Clones resolve via the
    // live walk (correct, tail-priced once a local full lands).
    try {
      if (fs.exists(new Path(dest, Lakehouse.Protocol.CloneFile)))
        return false
    } catch { case NonFatal(_) => return false }
    val dirSt = Lakehouse.Protocol.versionDirStatuses(fs, dest)
      .sortBy(_._1)
    if (dirSt.isEmpty) return false
    val prev: Option[State] =
      try loadLatest(fs, dest)
      catch { case NonFatal(_) => None }
    val prevByV: Map[Long, VersionRec] =
      prev.map(_.versions.map(r => r.v -> r).toMap).getOrElse(Map.empty)
    val kinds: Seq[(Long, FileStatus, Option[Boolean],
        Option[VersionRec])] =
      DriverIo.parMap(dirSt) { case (v, st) =>
        prevByV.get(v) match {
          case Some(old) if old.dirMtime == st.getModificationTime =>
            // committed at the last build, identity unchanged: the
            // kind is pinned (markers are never retracted)
            (v, st, Some(old.full), Some(old))
          case _ =>
            (v, st, Lakehouse.Protocol.commitKind(fs, st.getPath), None)
        }
      }
    val committed = kinds.collect { case (v, st, Some(full), old) =>
      (v, st, full, old) }
    if (committed.isEmpty) return false
    val ckptV = committed.map(_._1).max
    val lastFullV = committed.filter(_._3).map(_._1).maxOption
      .getOrElse(Long.MinValue)
    val uncommitted = kinds.collect { case (v, st, None, _) =>
      UncommittedRec(v, st.getModificationTime) }
    // heavy values group once per build, only if something rehydrates
    // (forcing State.heavy is one columnar read of the previous file)
    lazy val prevDvxByV
        : Map[Long, Map[String, IndexedSeq[Option[String]]]] =
      prev.map(_.heavy.dvx.toSeq.groupBy(_._1._1).map { case (v, es) =>
        v -> es.map { case ((_, n), vals) => n -> vals }.toMap
      }).getOrElse(Map.empty)
    def rehydrate(p: State, old: VersionRec): VersionRec =
      old.copy(
        files = old.files.map(f =>
          f.copy(stat = p.heavy.fileStats.get((old.v, f.rel)))),
        dvx =
          if (old.dvxCols.isEmpty)
            Map.empty[String, IndexedSeq[Option[String]]]
          else prevDvxByV.getOrElse(old.v, Map.empty))
    val recs: Seq[Option[VersionRec]] =
      DriverIo.parMap(committed) { case (v, st, full, old) =>
        if (v < lastFullV)
          // identity-only (resolve never serves it) — but the commit
          // instant still rides along so [[Lakehouse.history]] answers
          // retained-history rows without listing the dir
          Some(VersionRec(v, full, st.getModificationTime,
            payload = false, Nil, Nil, Nil, Nil, Nil, Nil,
            Map.empty, Map.empty, None,
            commitMs = old.map(_.commitMs).filter(_ > 0L)
              .getOrElse(markerMs(fs, st.getPath))))
        else old match {
          case Some(o) if o.payload && o.commitMs > 0L =>
            recsCarried.incrementAndGet()
            Some(rehydrate(prev.get, o))
          case _ =>
            recsEncoded.incrementAndGet()
            encodeRec(spark, fs, conf, dest, v, st, full)
        }
      }
    if (recs.exists(_.isEmpty)) return false
    val dir = new Path(dest, Dir)
    fs.mkdirs(dir)
    val stamp = System.currentTimeMillis()
    val name = s"ckpt_${ckptV}_$stamp.parquet"
    val tmp = new Path(dir, s"_tmp_$name")
    try ParquetCodec.write(conf, tmp, recs.flatten, uncommitted)
    catch {
      case NonFatal(_) =>
        try fs.delete(tmp, false)
        catch { case NonFatal(_) => () }
        return false
    }
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
      dvxCols, dvx, eqCounts, rd.basis,
      commitMs = markerMs(fs, root)))
  }

  /** Commit instant of one version dir — the marker file's mtime (the
    * same rule as [[Lakehouse.history]]; renames preserve file mtimes,
    * so a rebased delta keeps its original commit time). 0 = no marker
    * found (cannot happen for a committed dir; history walks it live).
    */
  private def markerMs(fs: FileSystem, root: Path): Long =
    try fs.listStatus(root).collect {
      case s if s.getPath.getName == Lakehouse.Protocol.MarkerFull ||
        s.getPath.getName == Lakehouse.Protocol.MarkerLegacy ||
        s.getPath.getName.startsWith(Lakehouse.Protocol.MarkerDelta) =>
        s.getModificationTime
    }.minOption.getOrElse(0L)
    catch { case _: java.io.FileNotFoundException => 0L }

  /** Decode one covered commit's DV post-mask extremes back to typed
    * rows (the planner substitutes them for a DV'd file's manifest row
    * in pruning and MIN/MAX folds). Heavy-column access — lazy like
    * [[toRootData]].
    */
  def decodeDvExtremes(st: State, r: VersionRec)
      : Map[String, org.apache.spark.sql.Row] =
    if (r.dvxCols.isEmpty) Map.empty
    else {
      val schema = StructType(r.dvxCols.map { case (n, t) =>
        StructField(n, dataTypeOf(t)) })
      val tags = r.dvxCols.map(_._2)
      // direct lookups by the version's own affected-file names (the
      // extremes are recorded per sidecar-index entry) — a scan of the
      // whole heavy map here would be O(#versions × #extremes-entries)
      // across a resolve, quadratic exactly at the long-DV-chain scale
      // the checkpoint exists for
      r.dvIndex.keysIterator.flatMap { name =>
        st.heavy.dvx.get((r.v, name)).map { vals =>
          val decoded: Array[Any] = vals.zip(tags).map {
            case (Some(s), t) => decodeVal(t, s)
            case (None, _) => null
          }.toArray
          name -> (new org.apache.spark.sql.catalyst.expressions
            .GenericRowWithSchema(decoded, schema)
            : org.apache.spark.sql.Row)
        }
      }.toMap
    }

  /** Marker-presence facts of one covered commit — answers the
    * change-feed/stream classifiers' `fs.exists` probes (rewrite
    * marker, DV dir, equality-delete dir) from the checkpoint.
    * Recorded only for payload-bearing records: identity-only records
    * (below the last full) answer commit KIND but not detail.
    */
  final case class CommitDetail(rewrite: Boolean, dv: Boolean,
      eqDel: Boolean)

  /** One covered commit's facts, valid for a live dir only while its
    * mtime still equals [[dirMtime]] (the same identity rule resolve
    * and history use; committed dirs are immutable, so a moved mtime
    * means vacuum/GC touched it — fall back to the live probe).
    */
  final case class CommitFacts(full: Boolean, dirMtime: Long,
      detail: Option[CommitDetail])

  /** Per-version commit facts from the newest checkpoint, or empty on
    * any doubt (disabled, no checkpoint, decode failure) — callers
    * keep their live-probe path as the fallback for uncovered or
    * identity-mismatched dirs. Serving a version range this way turns
    * the feed readers' and the streaming source's per-dir
    * `commitKind`/marker probes — O(#commits) RPCs per call — into one
    * cached state read + probes for the TAIL only.
    */
  /** The `spark.graft.useCheckpoint` flag (default true) — the single
    * source of truth for every facts/resolve caller.
    */
  def enabled(spark: SparkSession): Boolean =
    spark.conf.getOption("spark.graft.useCheckpoint")
      .forall(_.toBoolean)

  def commitFacts(fs: FileSystem, dest: Path,
      enabled: Boolean): Map[Long, CommitFacts] =
    if (!enabled) Map.empty
    else try loadLatest(fs, dest).map(_.versions.map { r =>
      r.v -> CommitFacts(r.full, r.dirMtime,
        if (r.payload) Some(CommitDetail(r.rewritten.nonEmpty,
          r.dvIndex.nonEmpty, r.eqDel.isDefined))
        else None)
    }.toMap).getOrElse(Map.empty)
    catch { case NonFatal(_) => Map.empty }

  /** The PARQUET checkpoint container (Delta `_last_checkpoint` shape):
    * one row per record, discriminated by `kind` —
    *
    *  - `ver`: one per covered commit; tiny JSON header in `hdr`
    *    (schema tags, manifest locations, rewrite list, basis);
    *  - `file`: one per data file — `rel`/`sz`/`n` are the core
    *    columns, the encoded zone-map values live in the LIST column
    *    `st`;
    *  - `dv`: one per DV'd file name — sidecar path (`dvp`), deleted
    *    count (`n`), post-mask extremes (`st`);
    *  - `eqc`: one per (eq-del commit, file) matched count;
    *  - `unc`: one per dir uncommitted at build time.
    *
    * Why parquet over the round-8 gzipped JSON: the JSON decode was
    * O(#files) EAGER — every record parsed before the first byte of
    * use (~50 µs/record ⇒ ~50 s at 1M files, the one named scale
    * cliff). Here the CORE decode (resolve's file lists, row counts,
    * commit shapes) projects AWAY the `st` column — parquet's columnar
    * layout means those chunks are never read — and the heavy values
    * load through [[State.heavy]] at most once per driver, only when a
    * resolve actually rebuilds a TableMeta. A warm fingerprint read
    * (committedVs) pays only the core columns, and the writer's
    * dictionary encoding collapses the rel-path prefixes the JSON
    * spelled out per record.
    */
  private object ParquetCodec {
    import org.apache.parquet.example.data.Group
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.ParquetReader
    import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupReadSupport}
    import org.apache.parquet.hadoop.metadata.CompressionCodecName
    import org.apache.parquet.hadoop.util.HadoopOutputFile
    import org.apache.parquet.schema.MessageTypeParser

    private val SchemaStr =
      """message graft_ckpt {
        |  required binary kind (UTF8);
        |  required int64 v;
        |  optional boolean full;
        |  optional int64 mt;
        |  optional boolean payload;
        |  optional binary hdr (UTF8);
        |  optional binary rel (UTF8);
        |  optional int64 sz;
        |  optional int64 n;
        |  optional binary dvp (UTF8);
        |  optional group st (LIST) {
        |    repeated group list {
        |      optional binary element (UTF8);
        |    }
        |  }
        |}""".stripMargin
    private val Schema = MessageTypeParser.parseMessageType(SchemaStr)
    /** Everything EXCEPT `st` — what resolve's fold and the warm
      * fingerprint need; the heavy chunks are skipped on disk.
      */
    private val CoreProjection =
      """message graft_ckpt {
        |  required binary kind (UTF8);
        |  required int64 v;
        |  optional boolean full;
        |  optional int64 mt;
        |  optional boolean payload;
        |  optional binary hdr (UTF8);
        |  optional binary rel (UTF8);
        |  optional int64 sz;
        |  optional int64 n;
        |  optional binary dvp (UTF8);
        |}""".stripMargin
    /** The lazy second pass: just enough to key the heavy values. */
    private val HeavyProjection =
      """message graft_ckpt {
        |  required binary kind (UTF8);
        |  required int64 v;
        |  optional binary rel (UTF8);
        |  optional group st (LIST) {
        |    repeated group list {
        |      optional binary element (UTF8);
        |    }
        |  }
        |}""".stripMargin

    def write(conf: Configuration, path: Path, versions: Seq[VersionRec],
        uncommitted: Seq[UncommittedRec]): Unit = {
      val w = ExampleParquetWriter
        .builder(HadoopOutputFile.fromPath(path, conf))
        .withConf(conf).withType(Schema)
        .withCompressionCodec(CompressionCodecName.SNAPPY)
        .withDictionaryEncoding(true)
        .build()
      val gf = new SimpleGroupFactory(Schema)
      def addSt(g: Group, vals: IndexedSeq[Option[String]]): Unit = {
        val lst = g.addGroup("st")
        vals.foreach { o =>
          val e = lst.addGroup("list")
          o.foreach(s => e.append("element", s))
        }
      }
      try {
        versions.foreach { r =>
          val hdr = org.json4s.jackson.Serialization.write(WHdr(
            r.statCols.map { case (n, t) => List(n, t) }.toList,
            r.mStats.toList, r.mBlooms.toList, r.manifestParts.toList,
            r.rewritten.toList,
            r.eqDel.map { case (d, cols) => WEq(d, cols.toList) },
            if (r.dvxCols.isEmpty) None
            else Some(r.dvxCols.map { case (n, t) => List(n, t) }.toList),
            r.basis.map(_.toList.sorted),
            if (r.eqCounts.isDefined) Some(true) else None,
            if (r.commitMs > 0L) Some(r.commitMs) else None))
          w.write(gf.newGroup()
            .append("kind", "ver").append("v", r.v)
            .append("full", r.full).append("mt", r.dirMtime)
            .append("payload", r.payload).append("hdr", hdr))
          r.files.foreach { f =>
            val g = gf.newGroup().append("kind", "file").append("v", r.v)
              .append("rel", f.rel).append("sz", f.size)
              .append("n", f.rows)
            f.stat.foreach(addSt(g, _))
            w.write(g)
          }
          val dvNames =
            r.dvIndex.keySet ++ r.dvCounts.keySet ++ r.dvx.keySet
          dvNames.toSeq.sorted.foreach { n =>
            val g = gf.newGroup().append("kind", "dv").append("v", r.v)
              .append("rel", n)
            r.dvIndex.get(n).foreach(p => g.append("dvp", p))
            r.dvCounts.get(n).foreach(c => g.append("n", c))
            r.dvx.get(n).foreach(addSt(g, _))
            w.write(g)
          }
          r.eqCounts.foreach(_.toSeq.sorted.foreach { case (n, c) =>
            w.write(gf.newGroup().append("kind", "eqc").append("v", r.v)
              .append("rel", n).append("n", c))
          })
        }
        uncommitted.foreach(u =>
          w.write(gf.newGroup().append("kind", "unc").append("v", u.v)
            .append("mt", u.mtime)))
      } finally w.close()
    }

    private def scan(conf: Configuration, path: Path, projection: String)(
        f: Group => Unit): Unit = {
      val c = new Configuration(conf)
      c.set(org.apache.parquet.hadoop.api.ReadSupport.PARQUET_READ_SCHEMA,
        projection)
      val r = ParquetReader.builder(new GroupReadSupport(), path)
        .withConf(c).build()
      try {
        var g = r.read()
        while (g != null) { f(g); g = r.read() }
      } finally r.close()
    }

    private def has(g: Group, field: String): Boolean =
      g.getFieldRepetitionCount(field) > 0

    private def stOf(g: Group): Option[IndexedSeq[Option[String]]] =
      if (!has(g, "st")) None
      else {
        val lst = g.getGroup("st", 0)
        val n = lst.getFieldRepetitionCount("list")
        Some((0 until n).map { i =>
          val e = lst.getGroup("list", i)
          if (e.getFieldRepetitionCount("element") > 0)
            Some(e.getString("element", 0))
          else None
        })
      }

    def read(conf: Configuration, path: Path): State = {
      val ckptV = parseName(path.getName)
        .map(_._1)
        .getOrElse(throw new IllegalArgumentException(
          s"not a checkpoint file name: ${path.getName}"))
      final class VAcc {
        var full = false; var mt = 0L; var payload = false
        var hdr: WHdr = null
        val files = Seq.newBuilder[FileRec]
        val dvIdx = Map.newBuilder[String, String]
        val dvCnt = Map.newBuilder[String, Long]
        val eqc = Map.newBuilder[String, Long]
      }
      val accs = scala.collection.mutable.LinkedHashMap.empty[Long, VAcc]
      val unc = Seq.newBuilder[UncommittedRec]
      scan(conf, path, CoreProjection) { g =>
        val kind = g.getString("kind", 0)
        val v = g.getLong("v", 0)
        kind match {
          case "ver" =>
            val a = accs.getOrElseUpdate(v, new VAcc)
            a.full = g.getBoolean("full", 0)
            a.mt = g.getLong("mt", 0)
            a.payload = g.getBoolean("payload", 0)
            a.hdr = org.json4s.jackson.JsonMethods
              .parse(g.getString("hdr", 0)).extract[WHdr]
          case "file" =>
            accs.getOrElseUpdate(v, new VAcc).files += FileRec(
              g.getString("rel", 0), g.getLong("sz", 0),
              g.getLong("n", 0), None)
          case "dv" =>
            val a = accs.getOrElseUpdate(v, new VAcc)
            val n = g.getString("rel", 0)
            if (has(g, "dvp")) a.dvIdx += n -> g.getString("dvp", 0)
            if (has(g, "n")) a.dvCnt += n -> g.getLong("n", 0)
          case "eqc" =>
            accs.getOrElseUpdate(v, new VAcc)
              .eqc += g.getString("rel", 0) -> g.getLong("n", 0)
          case "unc" =>
            unc += UncommittedRec(v, g.getLong("mt", 0))
          case other =>
            throw new IllegalArgumentException(
              s"unknown checkpoint record kind: $other")
        }
      }
      val versions = accs.toSeq.map { case (v, a) =>
        require(a.hdr != null, s"checkpoint rows without a ver record: $v")
        val h = a.hdr
        val eqCounts =
          if (h.eqcP.contains(true)) Some(a.eqc.result()) else None
        VersionRec(v, a.full, a.mt, a.payload,
          h.statCols.map(l => (l.head, l(1))), a.files.result(),
          h.mStats, h.mBlooms, h.parts, h.rewritten,
          a.dvIdx.result(), a.dvCnt.result(),
          h.eq.map(e => (e.dir, e.cols)),
          h.dvxCols.getOrElse(Nil).map(l => (l.head, l(1))),
          Map.empty, eqCounts, h.basis.map(_.toSet),
          h.cms.getOrElse(0L))
      }
      // dvxCols tells which versions carry extremes; the values load
      // through the heavy pass
      val loader = () => {
        val fileStats =
          Map.newBuilder[(Long, String), IndexedSeq[Option[String]]]
        val dvx =
          Map.newBuilder[(Long, String), IndexedSeq[Option[String]]]
        scan(conf, path, HeavyProjection) { g =>
          g.getString("kind", 0) match {
            case "file" => stOf(g).foreach(vals =>
              fileStats += ((g.getLong("v", 0), g.getString("rel", 0)))
                -> vals)
            case "dv" => stOf(g).foreach(vals =>
              dvx += ((g.getLong("v", 0), g.getString("rel", 0))) -> vals)
            case _ => ()
          }
        }
        new Heavy(fileStats.result(), dvx.result())
      }
      State(ckptV, versions, unc.result(), loader)
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
    // LOCAL dirs only (one listing): a shallow clone never checkpoints
    // (see writeCheckpoint) and must not re-trigger on every commit
    // because the pinned source dirs all sit above lastV
    val listing = try fs.listStatus(dest).toSeq
      catch { case _: java.io.FileNotFoundException => return }
    if (Lakehouse.Protocol.cloneRefOf(fs, listing).isDefined) return
    val above = Lakehouse.Protocol.versionDirStatusesOf(listing)
      .count(_._1 > lastV)
    if (above >= interval) writeCheckpoint(spark, fs, conf, dest)
  }
}

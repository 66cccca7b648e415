package graft.storage

import org.apache.hadoop.fs.{FileSystem, Path}

/** THE COMMIT PROTOCOL'S STORAGE CONTRACT — every atomicity assumption
  * the lakehouse makes about its filesystem, extracted behind one seam
  * so a cloud/object-store implementation has an explicit bar to meet
  * instead of silently weakening rename-based invariants.
  *
  * The protocol leans on exactly FOUR primitives:
  *
  *  - [[casCreate]] — compare-and-swap file creation. Backs VERSION
  *    ALLOCATION (claim files) and streaming exactly-once markers:
  *    of any set of concurrent writers creating the same path, exactly
  *    ONE must succeed; the rest must observe failure. A weaker
  *    HEAD-then-PUT emulation re-issues version numbers to two writers
  *    — two commits sharing one dir, data loss.
  *  - [[commitMarker]] — the COMMIT POINT. Creating the marker file
  *    inside an exclusively-owned version dir is the single atomic
  *    instant a commit becomes visible; before it the dir is invisible
  *    debris, after it the dir is immutable. Must fail loudly if the
  *    marker already exists (an owned dir can see its marker created
  *    at most once). Durability of the create IS commit durability.
  *  - [[atomicRename]] — all-or-nothing directory move with the
  *    IDEMPOTENT-MOVER contract: false means "the source vanished —
  *    the other mover won the race", never a partial move. Backs the
  *    rebase of late deltas above a full commit, `ensureAboveFulls`'
  *    self-rebase, staged CTAS publication and the journaled
  *    two-rename RTAS swap (plus its crash heal). Readers must never
  *    observe the tree at src AND dst, or half of it at either.
  *  - [[replace]] — atomic whole-file replacement (write-temp +
  *    rename-over). Backs table-level metadata: schema, properties,
  *    ANALYZE column stats. Concurrent readers see the OLD bytes or
  *    the NEW bytes, never a torn mix; a crash leaves one of the two.
  *
  * What each implementation must provide:
  *
  *  - Local/POSIX + HDFS ([[FsCommitIo]], the shipping impl):
  *    `O_EXCL` create and atomic in-volume rename give all four
  *    directly.
  *  - S3-class object stores: casCreate/commitMarker map to
  *    conditional PUT (`If-None-Match: *`); replace maps to plain PUT
  *    (objects are replaced atomically); atomicRename has NO native
  *    equivalent — an implementation must either route renames through
  *    a manifest/pointer indirection (commit the new path in a
  *    conditional-PUT'd pointer object, the Delta/Iceberg shape) or
  *    refuse the operations that need it (rebase, RTAS) and surface
  *    single-writer mode. Copy-then-delete is NOT acceptable: readers
  *    would observe both trees.
  *
  * The seam is deliberately dumb — no retries, no caching — so the
  * contract stays auditable; CommitIoSpec pins each clause against the
  * shipping impl.
  */
private[graft] trait CommitIo {
  /** Exclusive create: true iff THIS caller created the (empty) file;
    * false iff it already existed / another racer won. Any other
    * failure propagates.
    */
  def casCreate(p: Path): Boolean

  /** The commit point: create the marker file, throwing if it already
    * exists — inside an exclusively-owned dir that can only mean a
    * protocol bug, and proceeding would double-commit.
    */
  def commitMarker(p: Path): Unit

  /** All-or-nothing move. False = the source is gone (the other mover
    * won — callers treat that as success-by-proxy). True = the whole
    * tree is at `dst`. Never leaves a partial tree at either path.
    */
  def atomicRename(src: Path, dst: Path): Boolean

  /** Replace the file's contents atomically: concurrent readers see
    * old or new bytes, never torn; a crash leaves one of the two.
    */
  def replace(p: Path, bytes: Array[Byte]): Unit
}

private[graft] object CommitIo {
  def apply(fs: FileSystem): CommitIo = new FsCommitIo(fs)
}

/** Local-FS / HDFS implementation — the semantics every spec runs
  * against. `file:` CAS goes through NIO `createFile` (Hadoop's
  * RawLocalFileSystem emulates exclusive create non-atomically:
  * check-then-create under no lock); HDFS `create(overwrite = false)`
  * is atomic at the NameNode.
  */
private[graft] final class FsCommitIo(fs: FileSystem) extends CommitIo {

  override def casCreate(p: Path): Boolean =
    if (fs.getScheme == "file")
      try {
        java.nio.file.Files.createFile(
          java.nio.file.Paths.get(p.toUri.getPath))
        true
      } catch { case _: java.nio.file.FileAlreadyExistsException => false }
    else
      try { fs.create(p, false).close(); true }
      catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
      }

  override def commitMarker(p: Path): Unit =
    fs.create(p, false).close()

  override def atomicRename(src: Path, dst: Path): Boolean =
    try fs.rename(src, dst)
    catch { case _: java.io.FileNotFoundException => false }

  override def replace(p: Path, bytes: Array[Byte]): Unit = {
    // `file:` goes through NIO: POSIX rename(2) replaces the
    // destination ATOMICALLY, while Hadoop's local
    // FileContext.rename(OVERWRITE) is delete-then-rename — a window
    // where the file is ABSENT (and ChecksumFs moves the `.crc`
    // sidecar in a separate step — a window where new bytes verify
    // against the old checksum). StressRace's ddl mode hit both.
    // The NIO path bypasses ChecksumFileSystem, so any existing crc
    // sidecar is dropped first — a stale one would permanently fail
    // reads; absent means "no verification", which plain FileSystem
    // readers accept.
    // tmp sibling is UNIQUE PER CALL (round-11 advice): with a fixed
    // name, two concurrent replace() calls on the same path interleave
    // — writer B's write truncates the tmp while writer A's move
    // publishes it, committing torn bytes. Uniqueness confines each
    // move to its own fully-written file; losers' moves still replace
    // atomically in some serial order.
    val tmpName = s".${p.getName}.${java.util.UUID.randomUUID()}.tmp"
    if (fs.getScheme == "file") {
      val pp = java.nio.file.Paths.get(p.toUri.getPath)
      if (pp.getParent != null)
        java.nio.file.Files.createDirectories(pp.getParent)
      val tmpP = pp.resolveSibling(tmpName)
      try {
        java.nio.file.Files.write(tmpP, bytes)
        java.nio.file.Files.deleteIfExists(
          pp.resolveSibling(s".${p.getName}.crc"))
        java.nio.file.Files.move(tmpP, pp,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      } catch { case e: Throwable =>
        try java.nio.file.Files.deleteIfExists(tmpP)
        catch { case scala.util.control.NonFatal(_) => () }
        throw e
      }
      return
    }
    val tmp = new Path(p.getParent, tmpName)
    val out = fs.create(tmp, true)
    try out.write(bytes) finally out.close()
    if (!fs.exists(p)) {
      if (fs.rename(tmp, p)) return
      // lost a create race — fall through to atomic replace
    }
    // FileContext.rename(OVERWRITE) is the atomic-replace primitive on
    // HDFS (FileSystem.rename refuses existing destinations)
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      p.toUri, fs.getConf)
    try fc.rename(fs.makeQualified(tmp), fs.makeQualified(p),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    catch { case e: java.io.IOException =>
      fs.delete(tmp, false)
      require(fs.exists(p), s"metadata persist failed and no " +
        s"previous version exists: $p (${e.getMessage})")
      throw e
    }
  }
}

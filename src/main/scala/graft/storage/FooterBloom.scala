package graft.storage

import org.apache.parquet.column.values.bloomfilter.BlockSplitBloomFilter
import org.apache.parquet.io.api.Binary

/** Manifest framing + probe for parquet's own Split-Block Bloom Filters
  * (SBBF), read out of the footers of a just-written commit instead of
  * being rebuilt by a second data pass — the bloom analogue of
  * [[FooterStats]]. The parquet WRITER builds these when the append
  * carries `parquet.bloom.filter.enabled#<col>` (Lakehouse.append sets
  * it for its `bloomCols`), so the manifest step only copies bitsets
  * out of metadata it already opens.
  *
  * Blob layout (one per (file, column) manifest cell): magic int
  * `PQB1`, filter count, then per row-group filter `length ++ bitset`.
  * The magic keeps the cell distinguishable from the scan path's
  * Spark-sketch blobs (whose stream starts with the sketch version
  * word), so a table can mix commits from both paths and the probe
  * picks the right decoder per cell.
  *
  * Probing hashes the PLAIN-ENCODED parquet value with parquet's own
  * xxhash64 (`BlockSplitBloomFilter.hash`) — NOT Spark's `xxhash64`
  * expression, which hashes the Catalyst representation with seed 42.
  * Only value shapes whose parquet physical encoding is certain are
  * hashed (ints/longs widened from their storage width, UTF-8 strings,
  * IEEE doubles/floats, epoch-day dates, epoch-micros timestamps —
  * the lakehouse writes TIMESTAMP_MICROS); anything else probes as
  * "might contain", because a mis-hashed probe would skip a matching
  * file — a silent wrong answer, never acceptable for a skipping
  * structure.
  */
object FooterBloom {

  private val Magic = 0x50514231 // "PQB1"

  def encode(bitsets: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(Magic)
    out.writeInt(bitsets.length)
    bitsets.foreach { b => out.writeInt(b.length); out.write(b) }
    out.flush()
    bos.toByteArray
  }

  /** None = not this framing (fall through to the Spark-sketch decoder). */
  def decode(blob: Array[Byte]): Option[Seq[BlockSplitBloomFilter]] = {
    if (blob.length < 8) return None
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(blob))
    if (in.readInt() != Magic) return None
    val n = in.readInt()
    Some((0 until n).map { _ =>
      val len = in.readInt()
      val bytes = new Array[Byte](len)
      in.readFully(bytes)
      new BlockSplitBloomFilter(bytes)
    })
  }

  /** Might ANY row group of the file contain `v`? True when the value
    * shape is not provably hashable (see class doc). An empty filter
    * list (0-row file) correctly proves "cannot contain".
    */
  def mightContain(filters: Seq[BlockSplitBloomFilter], v: Any): Boolean = {
    val hashOf: Option[BlockSplitBloomFilter => Long] = v match {
      case i: java.lang.Integer => Some(_.hash(i.intValue()))
      case l: java.lang.Long => Some(_.hash(l.longValue()))
      case s: java.lang.Short => Some(_.hash(s.intValue()))
      case b: java.lang.Byte => Some(_.hash(b.intValue()))
      case s: String => Some(_.hash(Binary.fromString(s)))
      case d: java.lang.Double => Some(_.hash(d.doubleValue()))
      case f: java.lang.Float => Some(_.hash(f.floatValue()))
      case d: java.sql.Date =>
        Some(_.hash(d.toLocalDate.toEpochDay.toInt))
      case d: java.time.LocalDate => Some(_.hash(d.toEpochDay.toInt))
      case t: java.sql.Timestamp =>
        val us = Math.floorDiv(t.getTime, 1000L) * 1000000L +
          t.getNanos / 1000L
        Some(_.hash(us))
      case t: java.time.Instant =>
        val us = Math.multiplyExact(t.getEpochSecond, 1000000L) +
          t.getNano / 1000L
        Some(_.hash(us))
      case _ => None
    }
    hashOf match {
      case None => true
      case Some(h) => filters.exists(bf => bf.findHash(h(bf)))
    }
  }
}

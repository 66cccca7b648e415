package graft.ingest

import java.io.ByteArrayInputStream
import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import java.time.LocalDateTime
import java.util.zip.ZipInputStream
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import graft.model.Schemas
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col

/** Engine-native OOXML (xlsx) ingestion for the reference's daily
  * transaction feed — the JVM replacement for the `pd.read_excel` entry
  * point (/root/reference/python_scripts/insert_from_excel.py:22), so a
  * user can point the engine at the raw `transactions_*.xlsx` files
  * without any out-of-band conversion step.
  *
  * An xlsx is a zip holding `xl/sharedStrings.xml` (the string pool) and
  * `xl/worksheets/sheet1.xml` (cells; `t="s"` cells index the pool,
  * everything else is a raw numeric/text value). Both are parsed with the
  * JDK's StAX pull parser — no external jars, no DOM materialization.
  *
  * Scale design: files land via Spark's `binaryFile` source and each
  * workbook is parsed on an EXECUTOR inside `mapPartitions` — a directory
  * of daily feeds parses in parallel, one task per file, and the driver
  * never holds file contents. (A single workbook parses sequentially —
  * the format is a zip stream — which is the right grain: feed files are
  * daily snapshots, small by construction; the fan-out axis is #files.)
  *
  * Type conversions mirror the reference loader (insert_from_excel.py:7-14,
  * 24-25): Excel serial day numbers (epoch 1899-12-30) become timestamps
  * (rounded to the second — the source is second-grained with ~µs serial
  * noise) / dates; `amount` becomes DECIMAL(18,2); everything else stays
  * text for [[Ingest.conform]]'s schema-driven casts.
  */
object Xlsx {

  private val NCols = 20
  private val TsCols = Set(1) // trans_date
  private val DateCols = Set(4, 9, 11) // account/birth/passport dates
  private val DecCols = Set(14) // amount
  private val EpochDay = LocalDateTime.of(1899, 12, 30, 0, 0).toLocalDate

  /** "C5" → 0-based column index (2). */
  private def colIndex(ref: String): Int = {
    var c = 0
    var i = 0
    while (i < ref.length && Character.isLetter(ref.charAt(i))) {
      c = c * 26 + (ref.charAt(i) - 'A' + 1)
      i += 1
    }
    c - 1
  }

  /** Pull one zip entry's bytes (entry order in OOXML is unspecified, so
    * scan the stream; feed files are small).
    */
  private def zipEntry(bytes: Array[Byte], name: String): Option[Array[Byte]] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      Iterator.continually(zin.getNextEntry).takeWhile(_ != null)
        .collectFirst { case e if e.getName == name => zin.readAllBytes() }
    } finally zin.close()
  }

  /** sharedStrings.xml → indexed string pool (concatenating `<t>` runs —
    * styled cells split one value across several).
    */
  private def sharedStrings(bytes: Array[Byte]): IndexedSeq[String] = {
    val r = XMLInputFactory.newInstance()
      .createXMLStreamReader(new ByteArrayInputStream(bytes))
    val pool = IndexedSeq.newBuilder[String]
    val cur = new StringBuilder
    var inT = false
    var inSi = false
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "si" => inSi = true; cur.clear()
            case "t" if inSi => inT = true
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS if inT =>
          cur.appendAll(r.getTextCharacters, r.getTextStart, r.getTextLength)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "t" => inT = false
            case "si" => inSi = false; pool += cur.toString
            case _ =>
          }
        case _ =>
      }
    }
    r.close()
    pool.result()
  }

  /** sheet1.xml → raw cell strings per row (shared strings resolved). */
  private def sheetRows(bytes: Array[Byte],
      pool: IndexedSeq[String]): Seq[Array[String]] = {
    val r = XMLInputFactory.newInstance()
      .createXMLStreamReader(new ByteArrayInputStream(bytes))
    val rows = Seq.newBuilder[Array[String]]
    var row: Array[String] = null
    var cellCol = -1
    var cellShared = false
    var inV = false
    val v = new StringBuilder
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" => row = Array.fill[String](NCols)(null); cellCol = -1
            case "c" =>
              // the r="A1" reference is OPTIONAL in ECMA-376 (streaming
              // writers omit it): an absent ref means "next column after
              // the previous cell", per the spec's sequential default
              val ref = r.getAttributeValue(null, "r")
              cellCol = if (ref != null) colIndex(ref) else cellCol + 1
              cellShared = r.getAttributeValue(null, "t") == "s"
            case "v" => inV = true; v.clear()
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS if inV =>
          v.appendAll(r.getTextCharacters, r.getTextStart, r.getTextLength)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "v" =>
              inV = false
              if (cellCol >= 0 && cellCol < NCols)
                row(cellCol) =
                  if (cellShared) pool(v.toString.trim.toInt) else v.toString
            case "row" => rows += row
            case _ =>
          }
        case _ =>
      }
    }
    r.close()
    rows.result()
  }

  /** Excel serial → timestamp, rounded to the whole second (+0.5 s then
    * truncate): the feed's serials carry ~µs float noise around exact
    * seconds, never values near a half-second boundary.
    */
  private def serialToTs(raw: String): java.sql.Timestamp = {
    val micros = Math.round(raw.toDouble * 86400e6) + 500000L
    java.sql.Timestamp.valueOf(
      EpochDay.atStartOfDay.plusSeconds(Math.floorDiv(micros, 1000000L)))
  }

  private def serialToDate(raw: String): java.sql.Date =
    java.sql.Date.valueOf(EpochDay.plusDays(Math.round(raw.toDouble)))

  /** One workbook's bytes → typed landing rows (header skipped, blank
    * trailing rows dropped).
    */
  private[ingest] def parseWorkbook(bytes: Array[Byte]): Seq[Row] = {
    val pool = zipEntry(bytes, "xl/sharedStrings.xml")
      .map(sharedStrings).getOrElse(IndexedSeq.empty)
    val sheet = zipEntry(bytes, "xl/worksheets/sheet1.xml")
      .getOrElse(throw new IllegalArgumentException("no sheet1.xml — not an xlsx?"))
    val raw = sheetRows(sheet, pool)
    require(raw.nonEmpty && raw.head(0) == "trans_id",
      s"unexpected header row: ${raw.headOption.map(_.mkString(","))}")
    raw.drop(1)
      .filter(r => r(0) != null && r(0).nonEmpty)
      .map { r =>
        Row.fromSeq((0 until NCols).map { i =>
          val cell = r(i)
          if (cell == null || cell.isEmpty) null
          else if (TsCols(i)) serialToTs(cell)
          else if (DateCols(i)) serialToDate(cell)
          else if (DecCols(i))
            new JBigDecimal(cell).setScale(2, RoundingMode.HALF_EVEN)
          else cell
        })
      }
  }

  /** Read one xlsx file or a directory of them into the landing schema.
    * Parallel by file: `binaryFile` rows (path, content) are parsed in
    * `mapPartitions` on executors.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val bin = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.xlsx").load(path)
      .select(col("content"))
    val rows = bin.rdd.mapPartitions { it =>
      it.flatMap(r => parseWorkbook(r.getAs[Array[Byte]](0)))
    }
    spark.createDataFrame(rows, Schemas.denormalized)
  }
}

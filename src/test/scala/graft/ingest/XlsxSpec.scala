package graft.ingest

import graft.SparkSpec
import graft.etl.Etl
import graft.mart.{Mart, MartStaging}
import graft.model.Strings
import graft.storage.Lakehouse
import org.apache.spark.sql.functions._

/** Engine-native xlsx path: the raw reference feed must parse into
  * exactly the rows the offline-converted parquet fixtures contain
  * (tools/xlsx_to_parquet.py is the independent implementation of the
  * same conversion), and the 3-day pipeline must replay end-to-end
  * straight from the xlsx files.
  */
class XlsxSpec extends SparkSpec {

  private def refXlsx(day: Int): String =
    f"/root/reference/data/transactions_${day}%02d052020.xlsx"
  private def fixture(day: Int): String =
    getClass.getResource(s"/fixtures/day$day.parquet").getPath

  test("xlsx read is row-identical to the offline-converted fixture") {
    (1 to 3).foreach { day =>
      // conform both: the fixture's pyarrow timestamps are NTZ, the landing
      // schema (= the comparison contract) casts them to TimestampType
      val fromXlsx = Ingest.conform(Xlsx.read(spark, refXlsx(day)))
      val fromParquet = Ingest.conform(spark.read.parquet(fixture(day)))
      assert(fromXlsx.schema === fromParquet.schema, s"day $day schema")
      assert(fromXlsx.count() === fromParquet.count(), s"day $day count")
      assert(fromXlsx.except(fromParquet).isEmpty &&
        fromParquet.except(fromXlsx).isEmpty,
        s"day $day rows differ between xlsx reader and fixture")
    }
  }

  test("cells without the optional r= reference parse sequentially") {
    // ECMA-376 makes <c r="A1"> optional — streaming writers omit it and
    // cells default to the next column; mix ref-less and ref'd cells
    val sheet =
      """<?xml version="1.0"?><worksheet><sheetData>
        |<row><c><v>trans_id</v></c></row>
        |<row><c><v>t1</v></c><c><v>43952.4166666666</v></c>
        |  <c r="O2"><v>12.34</v></c><c><v>ok</v></c></row>
        |</sheetData></worksheet>""".stripMargin
    val bos = new java.io.ByteArrayOutputStream()
    val zip = new java.util.zip.ZipOutputStream(bos)
    zip.putNextEntry(new java.util.zip.ZipEntry("xl/worksheets/sheet1.xml"))
    zip.write(sheet.getBytes("UTF-8"))
    zip.closeEntry(); zip.close()
    val rows = Xlsx.parseWorkbook(bos.toByteArray)
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getString(0) === "t1")
    assert(r.getTimestamp(1) === ts("2020-05-01 10:00:00")) // serial col 1
    assert(r.getDecimal(14) === dec("12.34")) // explicit r="O2"
    assert(r.getString(15) === "ok") // sequential after the ref'd cell
  }

  test("3-day pipeline replays end-to-end from raw xlsx") {
    val lake = new Lakehouse(spark, tmpDir("xlsx-pipeline"))
    val clock = ts("2020-05-09 12:00:00")
    (1 to 3).foreach { day =>
      Ingest.loadDayFromXlsx(lake, refXlsx(day))
      Etl.normalizeTransactions(lake)
      Mart.addReportData(lake, MartStaging.Scd2Dims, clock)
    }
    // same pins as PipelineSpec's parquet-fixture replay
    assert(lake.read("fact_transactions").count() === 2464)
    val types = lake.read("report").select(col("fraud_type"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(types === Set(Strings.FraudExpiredPassport,
      Strings.FraudExpiredContract, Strings.FraudCityHop,
      Strings.FraudAmountGuessing))
  }
}

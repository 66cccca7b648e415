/*
 * Bridge into Spark's private[parquet] ParquetWriteSupport — the
 * InternalRow → parquet encoder behind every Spark parquet write
 * (decimal/timestamp/date encodings exactly matching what Spark's own
 * writer produces and what the engine's readers expect). Same sanctioned
 * pattern as GraftColumnBridge: the executor-side V2 streaming writer
 * needs a per-task parquet encoder, and re-implementing the value
 * encodings would invite silent format drift.
 */
package org.apache.spark.sql.execution.datasources.parquet

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.api.WriteSupport
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

object GraftParquetWriterBridge {

  /** A ParquetWriter[InternalRow] for one file, encoding with Spark's
    * own write support under the engine's standard settings (standard
    * (non-legacy) layout, INT96 timestamps — the same defaults the
    * batch write path uses, so files are indistinguishable to readers).
    */
  def create(file: String, schema: StructType): ParquetWriter[InternalRow] = {
    val conf = graft.storage.HadoopConfs.fresh()
    ParquetWriteSupport.setSchema(schema, conf)
    // every key ParquetWriteSupport/SparkToParquetSchemaConverter read
    // from the hadoop conf (normally injected from the session's
    // SQLConf by ParquetFileFormat) — a missing one NPEs at task start
    conf.set("spark.sql.parquet.writeLegacyFormat", "false")
    conf.set("spark.sql.parquet.outputTimestampType", "INT96")
    conf.set("spark.sql.parquet.fieldId.write.enabled", "false")
    conf.set("spark.sql.parquet.variant.annotateLogicalType.enabled",
      "false")
    conf.set("spark.sql.parquet.datetimeRebaseModeInWrite", "CORRECTED")
    conf.set("spark.sql.parquet.int96RebaseModeInWrite", "CORRECTED")
    conf.set("spark.sql.caseSensitive", "false")
    class B(p: Path) extends ParquetWriter.Builder[InternalRow, B](p) {
      override def self(): B = this
      override def getWriteSupport(c: Configuration)
          : WriteSupport[InternalRow] = new ParquetWriteSupport()
    }
    new B(new Path(file)).withConf(conf).build()
  }
}

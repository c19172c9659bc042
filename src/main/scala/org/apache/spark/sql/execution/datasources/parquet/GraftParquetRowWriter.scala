package org.apache.spark.sql.execution.datasources.parquet

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.api.WriteSupport
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.StructType

/** Executor-side `InternalRow` → parquet file writer, built on Spark's own
  * [[ParquetWriteSupport]] (hence this shim lives in its package — the
  * class is `private[parquet]` at the Scala level but is the engine Spark
  * itself instantiates reflectively for every parquet write). Used by the
  * DSv2 delta writers ([[graft.spark.GraftCatalog]]) to SPILL each task's
  * MERGE/UPDATE/DELETE delta as a parquet segment on the executor instead
  * of buffering rows in memory and shipping them through
  * `WriterCommitMessage`s to a driver-side per-row apply — the r12 scale
  * boundary (driver memory O(changed rows)). The segments are read back
  * as ONE DataFrame by the commit fold, so the whole delta path is
  * distributed end to end.
  *
  * Write options are pinned (modern non-legacy layout, micros timestamps,
  * proleptic-Gregorian dates) so the driver-side read needs no rebase
  * negotiation — both ends are this engine. */
object GraftParquetRowWriter {

  def open(schema: StructType, path: String,
      base: Configuration): ParquetWriter[InternalRow] = {
    // copy of the CALLER's effective Hadoop conf (r14, advisor: a bare
    // `new Configuration()` dropped spark.hadoop.* FS settings, so a
    // hdfs://-s3a:// staging dir only worked if POSIX-mounted), with the
    // parquet write options pinned on top
    val conf = new Configuration(base)
    ParquetWriteSupport.setSchema(schema, conf)
    conf.set(SQLConf.PARQUET_WRITE_LEGACY_FORMAT.key, "false")
    conf.set(SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE.key, "TIMESTAMP_MICROS")
    conf.set(SQLConf.PARQUET_REBASE_MODE_IN_WRITE.key, "CORRECTED")
    conf.set(SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE.key, "CORRECTED")
    conf.set(SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED.key, "false")
    conf.set(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE.key,
      SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE.defaultValueString)
    new Builder(new Path(path))
      .withConf(conf)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()
  }

  private class Builder(path: Path)
      extends ParquetWriter.Builder[InternalRow, Builder](path) {
    override def self(): Builder = this
    override def getWriteSupport(conf: Configuration)
        : WriteSupport[InternalRow] = new ParquetWriteSupport
  }
}

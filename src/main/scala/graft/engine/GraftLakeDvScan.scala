package graft.engine

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference,
  UnsafeProjection}
import org.apache.spark.sql.connector.read.{InputPartition,
  PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.{DataType, LongType, StructField,
  StructType}
import org.apache.spark.sql.vectorized.ColumnarBatch

/** Scan-side application of deletion vectors (see [[VersionedLake]]'s
  * DV section for the commit protocol). The mechanics ride Spark's own
  * parquet ROW-INDEX machinery: a reader whose schema carries the
  * reserved `_tmp_metadata_row_index` column
  * ([[ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME]]) receives
  * each row's TRUE position in its file — exact under row-group
  * skipping, page filtering and file splits, the same machinery behind
  * `_metadata.row_index`. The wrapper then:
  *
  *  - isolates each DV-carrying file into its own [[FilePartition]]
  *    (positions are per-file; a multi-file partition would make the
  *    file→vector binding ambiguous mid-stream);
  *  - reads DV partitions ROW-WISE through an inner factory built with
  *    the row-index column appended, drops rows whose position the
  *    vector covers (binary search in a sorted long array), and strips
  *    the extra column with a codegen'd projection;
  *  - reads every CLEAN partition through the UNMODIFIED factory —
  *    vectorized, zero overhead: the tax is paid only by files that
  *    actually carry deletes, which OPTIMIZE materializes away.
  *
  * Used by both the snapshot scan ([[GraftLakeParquetScan]]) and the
  * COW rewrite scan ([[GraftLakeCowScan]]) — the rewrite MUST apply
  * vectors or a MERGE would write deleted rows back as survivors. */
private[engine] object GraftLakeDvScan {

  /** Split `ps` so every DV-carrying file sits alone in its partition;
    * clean files keep their grouping. Survivor partitions REINDEXED
    * (the RDD contract: index == array position). */
  def isolate(ps: Seq[FilePartition],
      dv: Map[String, Array[Long]]): Seq[FilePartition] =
    if (dv.isEmpty) ps
    else ps.flatMap { fp =>
      val (hit, clean) =
        fp.files.partition(f => dv.contains(f.toPath.getName))
      (if (clean.isEmpty) Seq.empty else Seq(clean)) ++ hit.map(Array(_))
    }.zipWithIndex.map { case (files, i) => FilePartition(i, files) }

  /** DV-applying reader factory over `base`'s own machinery. `base`
    * must be the scan whose partitions were [[isolate]]d. */
  def readerFactory(
      base: org.apache.spark.sql.execution.datasources.v2.parquet
        .ParquetScan,
      dv: Map[String, Array[Long]]): PartitionReaderFactory = {
    // Spark's reserved TEMPORARY name (what findRowIndexColumnIndexIn-
    // Schema matches); NULLABLE — the column is absent from every
    // file, and a required-but-missing column fails the reader's
    // existence check before the row-index generator ever runs
    val rowIdx = StructField(
      ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME, LongType,
      nullable = true)
    // aggregate pushdown answers from footer stats, which over-count
    // DV-deleted rows — the builder already refuses it on DV lakes;
    // the copy drops it defensively. Each factory gets its OWN hadoop
    // conf: createReaderFactory writes its requested schema into the
    // conf, and in local mode broadcasts hand back the same mutable
    // object — a shared conf lets the second build silently clobber
    // the first's schema.
    val withIdx = base.copy(
      hadoopConf = new org.apache.hadoop.conf.Configuration(
        base.hadoopConf),
      readDataSchema = StructType(base.readDataSchema.fields :+ rowIdx),
      pushedAggregate = None).createReaderFactory()
    val plain = base.copy(
      hadoopConf = new org.apache.hadoop.conf.Configuration(
        base.hadoopConf),
      pushedAggregate = None).createReaderFactory()
    new GraftLakeDvReaderFactory(plain, withIdx, dv,
      base.readDataSchema.length,
      ((base.readDataSchema.fields :+ rowIdx) ++
        base.readPartitionSchema.fields).map(_.dataType))
  }
}

/** See [[GraftLakeDvScan]]. `idxAt` is the row-index column's position
  * in the WITH-INDEX row layout (data columns, then the index, then
  * partition values); `fullTypes` is that layout's types. */
private[engine] final class GraftLakeDvReaderFactory(
    plain: PartitionReaderFactory, withIdx: PartitionReaderFactory,
    dv: Map[String, Array[Long]], idxAt: Int,
    fullTypes: Array[DataType]) extends PartitionReaderFactory {

  private def dvOf(p: InputPartition): Option[Array[Long]] = p match {
    case fp: FilePartition =>
      val hits = fp.files.flatMap(f => dv.get(f.toPath.getName))
      if (hits.isEmpty) None
      else {
        require(fp.files.length == 1,
          "a DV-carrying file must be alone in its partition " +
            "(GraftLakeDvScan.isolate was not applied)")
        Some(hits.head)
      }
    case _ => None
  }

  // UNIFORMLY row-based: Spark's scan exec refuses mixed row/columnar
  // partition sets, and DV partitions must read row-wise — so a
  // snapshot with ANY live vector reads its clean files row-wise too.
  // The tax lasts until OPTIMIZE/COW materializes the vectors away.
  override def supportColumnarReads(p: InputPartition): Boolean = false

  override def createColumnarReader(p: InputPartition)
      : PartitionReader[ColumnarBatch] =
    throw new UnsupportedOperationException(
      "DV scans read row-wise (supportColumnarReads is false)")

  override def createReader(p: InputPartition)
      : PartitionReader[InternalRow] = dvOf(p) match {
    case None => plain.createReader(p)
    case Some(positions) =>
      val inner = withIdx.createReader(p)
      val keep = fullTypes.indices.filterNot(_ == idxAt)
      val strip = UnsafeProjection.create(keep.map(i =>
        BoundReference(i, fullTypes(i), nullable = true)).toArray
        : Array[org.apache.spark.sql.catalyst.expressions.Expression])
      new PartitionReader[InternalRow] {
        private var cur: InternalRow = _
        override def next(): Boolean = {
          while (inner.next()) {
            val row = inner.get()
            if (java.util.Arrays.binarySearch(positions,
                row.getLong(idxAt)) < 0) {
              cur = strip(row)
              return true
            }
          }
          false
        }
        override def get(): InternalRow = cur
        override def close(): Unit = inner.close()
      }
  }
}

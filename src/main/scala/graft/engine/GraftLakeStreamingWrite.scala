package graft.engine

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.{Job, JobID, TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{DataWriter, PhysicalWriteInfo,
  WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{
  StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.execution.datasources.{OutputWriter,
  OutputWriterFactory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

/** `writeStream.format("graftlake")` — each micro-batch one versioned
  * commit, exactly-once under epoch replay (Delta's streaming-sink
  * shape: the sink's transaction id is (queryId, epochId)):
  *
  *  - tasks stage one parquet file each into `<lake>/_stage/<queryId>/`
  *    through Spark's own parquet [[OutputWriterFactory]] (native
  *    row→parquet encoder, codec honored) under attempt-unique names —
  *    speculative or failed attempts can never collide, and nothing
  *    under `_stage` is visible to any reader;
  *  - the driver's `commit(epochId)` renames EXACTLY the files the
  *    committed tasks reported into a fresh `d-sw…-e<epoch>` data dir
  *    (metadata moves, no byte copy), lifts min/max stats from the
  *    parquet footers like every DML commit, and swings the same
  *    manifest CAS as [[VersionedLake.commit]] — readers see the epoch
  *    atomically or not at all;
  *  - the data-dir name derives from (queryId, epochId) — the streaming
  *    engine's checkpointed identity for the batch — so a REPLAYED
  *    epoch (crash after publish, restart from checkpoint) finds its
  *    tag already published ([[VersionedLake.commitTagged]]'s marker
  *    protocol) and no-ops, deleting its re-staged files: at-least-once
  *    delivery from the engine, exactly-once versions in the lake.
  *    `queryId` is the streaming query's checkpoint-stable id (not the
  *    per-run id), asserted by the restart spec;
  *  - a crash BETWEEN rename and publish leaves `d-…` unreferenced
  *    (invisible; the replay rebuilds it from its own staged files
  *    after deleting the partial dir), and crashed-attempt stragglers
  *    in `_stage` are swept by [[VersionedLake.vacuum]]'s grace-
  *    windowed stage sweep;
  *  - output modes: Append appends a version per non-empty batch;
  *    Complete (Spark calls `truncate()` on the builder) publishes each
  *    batch as a manifest-level overwrite — full history stays time-
  *    travelable either way. A batch with zero rows publishes nothing
  *    (its zero-row staged files are deleted), so the version chain
  *    only ever carries data.
  *
  * At 100 TB the per-epoch driver work is O(files in the batch): one
  * rename + one footer read per file, one manifest CAS — nothing
  * size-of-data. The write path itself is Spark's parquet encoder on
  * executors, exactly like the batch DSv2 write. */
final class GraftLakeStreamingWrite(lakeDir: String, schema: StructType,
    queryId: String, mode: String, options: Map[String, String])
  extends StreamingWrite {

  // checkpoint-stable identity: safe chars only (queryId is a UUID, but
  // the tag grammar is enforced, not assumed)
  private val qid = queryId.filter(c => c.isLetterOrDigit || c == '-')
  private val stageDir = s"$lakeDir/_stage/$qid"

  private def spark = SparkSession.active
  private def fsOf = new Path(lakeDir).getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : StreamingDataWriterFactory = {
    // driver-side: let Spark's parquet format wire codec/schema/encoder
    // settings into a job conf once; executors reconstruct writers from
    // the (serialized) conf + factory
    val job = Job.getInstance(spark.sessionState.newHadoopConf())
    val owf = new ParquetFileFormat()
      .prepareWrite(spark, job, options, schema)
    new GraftLakeStreamingWriterFactory(owf,
      new SerializableHadoopConf(job.getConfiguration), stageDir, qid,
      schema)
  }

  private def tagOf(epochId: Long) = s"sw-$qid-e$epochId"

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val f = fsOf
    val files = messages.toSeq.collect {
      case m: GraftLakeFileMessage => m
    }
    val (kept, empty) = files.partition(_.rows > 0)
    // zero-row task files are valid parquet but dead weight — drop them
    empty.foreach(m => f.delete(new Path(m.path), false))
    if (kept.isEmpty) return
    val tag = tagOf(epochId)
    val dataDir = s"d-$tag"
    val marker = new Path(s"$lakeDir/_tags/$tag")
    val tip = VersionedLake.tip(spark, lakeDir)
    val published = f.exists(marker) || tip.exists(v =>
      VersionedLake.liveDataDirs(spark, lakeDir, v)
        .exists(p => new Path(p).getName == dataDir))
    if (published) {
      // replayed epoch: the lake already carries this batch — the
      // re-staged bytes are surplus, not data
      kept.foreach(m => f.delete(new Path(m.path), false))
      return
    }
    // crash between a previous attempt's renames and its publish left a
    // partial (never-referenced) dir: rebuild from THIS attempt's files
    val dest = new Path(s"$lakeDir/$dataDir")
    f.delete(dest, true)
    f.mkdirs(dest)
    kept.foreach { m =>
      val src = new Path(m.path)
      if (!f.rename(src, new Path(dest, src.getName)))
        throw new java.io.IOException(
          s"failed to move staged ${m.path} into $dataDir")
    }
    VersionedLake.indexStagedDir(spark, lakeDir, dataDir, schema)
    VersionedLake.publish(spark, lakeDir, dataDir, mode)
    val out = f.create(marker, true)
    out.close()
  }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val f = fsOf
    messages.toSeq.collect { case m: GraftLakeFileMessage => m }
      .foreach(m => f.delete(new Path(m.path), false))
  }
}

/** One staged parquet file per (task attempt): attempt-unique name, no
  * committer — visibility is decided by the driver's rename+publish,
  * not by file placement. */
private[engine] final class GraftLakeStreamingWriterFactory(
    owf: OutputWriterFactory, conf: SerializableHadoopConf,
    stageDir: String, qid: String, schema: StructType)
  extends StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] = {
    val hconf = new Configuration(conf.value)
    val attempt = new TaskAttemptID(
      new TaskID(new JobID(qid, (epochId % Int.MaxValue).toInt),
        TaskType.MAP, partitionId),
      (taskId % Int.MaxValue).toInt)
    val ctx = new TaskAttemptContextImpl(hconf, attempt)
    val unique = java.util.UUID.randomUUID.toString.take(8)
    val path = new Path(s"$stageDir/e$epochId-p$partitionId-$unique" +
      owf.getFileExtension(ctx))
    val fs = path.getFileSystem(hconf)
    fs.mkdirs(path.getParent)
    new GraftLakeStageFileWriter(
      owf.newInstance(path.toString, schema, ctx), fs, path)
  }
}

private[engine] final class GraftLakeStageFileWriter(out: OutputWriter,
    fs: org.apache.hadoop.fs.FileSystem, p: Path)
  extends DataWriter[InternalRow] {
  private var rows = 0L
  private var closed = false
  private def closeOnce(): Unit = if (!closed) { closed = true; out.close() }
  override def write(r: InternalRow): Unit = { out.write(r); rows += 1 }
  override def commit(): WriterCommitMessage = {
    closeOnce(); GraftLakeFileMessage(p.toString, rows)
  }
  override def abort(): Unit = { closeOnce(); fs.delete(p, false); () }
  override def close(): Unit = closeOnce()
}

/** Task → driver: the one staged file this attempt produced. */
private[graft] final case class GraftLakeFileMessage(path: String,
    rows: Long) extends WriterCommitMessage

/** Hadoop `Configuration` over Java serialization (the conf carries the
  * parquet write settings `prepareWrite` installed; Spark's own wrapper
  * for this is `private[spark]`). */
private[engine] final class SerializableHadoopConf(
    @transient var value: Configuration) extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

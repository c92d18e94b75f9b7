package graft

import org.apache.spark.sql.SparkSession

/** Shared session construction for the Verify/Bench mains and tests.
  *
  * All engine-required confs live here (not mutated inside query or
  * table-loader functions) so query functions stay pure:
  *  - shuffle partitions pinned to the local core count — at cluster
  *    scale this is the knob sized to executors × cores;
  *  - UTC timezone so Spark and the DuckDB oracle agree on date parts;
  *  - `nanosAsLong` because the driver's `events.ts` is TIMESTAMP(NANOS),
  *    which Spark's µs TimestampType cannot ingest directly
  *    (see [[graft.engine.Tables.table]]).
  */
object Sessions {
  def local(appName: String = "graft"): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .appName(appName)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // bucketed tables (Lake.writeBucketed) land under the warehouse
      // dir; keep catalog artifacts out of the repo working tree, and
      // key the dir by PID — table names are fixed (bt_*, gate_bt_*),
      // so two concurrent JVMs on a shared dir would clobber each
      // other's warehouse files mid-query
      .config("spark.sql.warehouse.dir",
        s"/tmp/graft_warehouse_${ProcessHandle.current().pid()}")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}

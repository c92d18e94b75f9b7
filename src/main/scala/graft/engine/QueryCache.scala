package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Named query-result caching — the Spark-native form of the reference's
  * planned "cache frequent queries" layer (reference README.md:24,48
  * proposed Redis in front of Athena; here the session's block-manager
  * cache plays that role, SURVEY §4).
  *
  * Semantics: `put` registers a result under a name and pins it
  * MEMORY_AND_DISK via the catalog; subsequent `get(name)` plans read the
  * InMemoryRelation instead of recomputing (Catalyst swaps the scan — see
  * QueryCacheSpec's plan assertion). Serving layers key these names by
  * normalized query text.
  *
  * Lifecycle is EXPLICIT by design: every entry has an owner and a
  * release point (`invalidate`/`clear`), because an anonymous
  * `df.persist` with no unpersist path is exactly the leak class that
  * contaminated the round-3 benchmarks. At cluster scale the same API
  * fronts a real shared cache; on one session it is the catalog's cached
  * temp views, enumerable via `entries`.
  */
object QueryCache {

  private val Prefix = "graft_qc_"

  private def view(name: String): String = {
    require(name.nonEmpty && name.forall(c => c.isLetterOrDigit || c == '_'),
      s"cache names are [A-Za-z0-9_]: $name")
    Prefix + name
  }

  /** Register `df` as the cached result for `name` (replaces any previous
    * entry) and materialize it eagerly so the first consumer doesn't pay
    * the compute. Returns the cache-backed frame. */
  def put(df: DataFrame, name: String): DataFrame = {
    val spark = df.sparkSession
    val v = view(name)
    if (spark.catalog.tableExists(v)) invalidate(spark, name)
    df.createOrReplaceTempView(v)
    spark.catalog.cacheTable(v)
    val out = spark.table(v)
    out.count() // eager materialization into the block manager
    out
  }

  /** The cached result, if present. Plans against the InMemoryRelation. */
  def get(spark: SparkSession, name: String): Option[DataFrame] =
    if (spark.catalog.tableExists(view(name))) Some(spark.table(view(name)))
    else None

  /** Compute-through: serve `name` from cache or run `query` and cache it. */
  def getOrPut(spark: SparkSession, name: String)(query: => DataFrame): DataFrame =
    get(spark, name).getOrElse(put(query, name))

  def isCached(spark: SparkSession, name: String): Boolean =
    spark.catalog.tableExists(view(name)) && spark.catalog.isCached(view(name))

  /** Release one entry: unpin the blocks AND drop the view (both halves —
    * dropping only the view would leak the pinned RDD). */
  def invalidate(spark: SparkSession, name: String): Unit = {
    val v = view(name)
    if (spark.catalog.tableExists(v)) {
      if (spark.catalog.isCached(v)) spark.catalog.uncacheTable(v)
      spark.catalog.dropTempView(v)
    }
  }

  /** All live cache entries (names without the internal prefix). */
  def entries(spark: SparkSession): Seq[String] =
    spark.catalog.listTables().collect().toSeq
      .map(_.name).filter(_.startsWith(Prefix)).map(_.stripPrefix(Prefix))

  /** Release everything this cache owns (other temp views untouched). */
  def clear(spark: SparkSession): Unit =
    entries(spark).foreach(invalidate(spark, _))
}

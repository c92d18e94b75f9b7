package graft

/** Build an amplified copy of a test-data dir for scale-curve
  * measurements (the driver ships sf ≤ 0.1; the 100 TB arguments want
  * at least one ~10× measured point). `documents` is amplified
  * `copies`× with shifted ids and PER-COPY TOKEN SALT — salting every
  * token keeps copies shingle-disjoint, so the near-dup/substring
  * operators see the same duplicate RATIO as the source corpus, not an
  * artificial corpus-wide 10-way duplicate cluster (which would
  * measure a pathology, not scaling). Other tables copy through
  * unchanged. Usage:
  *   runMain graft.ScaleUp [srcDir] [outDir] [copies]
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/graft_sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = Sessions.local("graft-scaleup")
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$src/documents.parquet")
    (0 until copies).map { k =>
      if (k == 0) docs
      else docs
        .withColumn("doc_id", col("doc_id") + lit(k * 10000000L))
        .withColumn("text",
          regexp_replace(col("text"), "([A-Za-z0-9]+)", s"$$1x$k"))
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "embeddings").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    spark.stop()
  }
}

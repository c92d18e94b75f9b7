package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.{Similarity, Tables}

/** The session-registered Catalyst rules ([[org.apache.spark.sql.graft
  * .GraftExtensions]], installed via spark.sql.extensions in
  * graft.Sessions): each rewrite must demonstrably FIRE in the
  * optimized plan AND change nothing about results; the physical scan
  * guard must fail an offending query before execution and pass a
  * pruned one.
  */
class ExtensionsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("dot(x, x) strength-reduces to graft_self_dot and stays " +
      "bit-exact vs the HOF reference") {
    val e = Similarity.prep(Tables.table(spark, sf, "embeddings"))
    val df = e.select(Similarity.dot(col("v"), col("v")).as("n2"))
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("graft_self_dot"),
      s"self-dot rewrite did not fire:\n$opt")
    assert(!opt.contains("graft_dot("),
      s"two-cursor dot survived the rewrite:\n$opt")
    // identical IEEE op order → bit-exact against the HOF fold the
    // oracles were established on
    val both = e.select(Similarity.dot(col("v"), col("v")).as("a"),
      Similarity.dotHof(col("v"), col("v")).as("b"))
    assert(both.filter(col("a") =!= col("b")).count() == 0)
    // distinct children must NOT be rewritten
    val pair = e.limit(5).select(col("v").as("x"))
      .crossJoin(e.limit(5).select(col("v").as("y")))
      .select(Similarity.dot(col("x"), col("y")).as("d"))
    assert(pair.queryExecution.optimizedPlan.toString.contains("graft_dot("))
  }

  test("normalize_utf8(normalize_utf8(x)) collapses to one application") {
    import org.apache.spark.sql.graft.TextNormFunctions
    // non-foldable source (a literal Seq would be constant-folded
    // away before the rewrite is observable)
    val df = Tables.table(spark, sf, "documents")
      .select(col("text").as("t"))
    val twice = df.select(TextNormFunctions.normalizeText(
      TextNormFunctions.normalizeText(col("t"))).as("n"))
    val opt = twice.queryExecution.optimizedPlan.toString
    assert("graft_normalize_text".r.findAllIn(opt).length == 1,
      s"double normalization survived:\n$opt")
    val once = df.select(TextNormFunctions.normalizeText(col("t")).as("n"))
    assert(twice.collect().toSeq == once.collect().toSeq)
  }

  test("guarded-scan rule fails an unpruned partitioned scan before " +
      "execution and passes pruned / unguarded ones") {
    val dir = TestSpark.tempDir("scanguard-ext")
    Seq((1, "a"), (2, "b"), (3, "c"))
      .toDF("p", "v").write.partitionBy("p").parquet(s"$dir/lake")
    spark.conf.set("spark.graft.scanGuard.paths", s"$dir/lake")
    try {
      val ex = intercept[Throwable] {
        spark.read.parquet(s"$dir/lake").count()
      }
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(e =>
          Option(e.getMessage).toSeq ++ messages(e.getCause))
      assert(messages(ex).exists(_.contains("guarded partitioned data")),
        s"unexpected failure: $ex")
      // a partition predicate satisfies the guard
      assert(spark.read.parquet(s"$dir/lake")
        .filter(col("p") === 1).count() == 1)
      // paths outside the guard are untouched
      assert(Tables.table(spark, sf, "region").count() > 0)
    } finally spark.conf.unset("spark.graft.scanGuard.paths")
  }
}

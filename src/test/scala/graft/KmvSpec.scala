package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine._

class KmvSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val K = 128

  test("two-stage salted k-min is bit-identical to the global k-min") {
    val pts = (0 until 20000).map(i => ("g" + (i % 3), s"val-$i"))
      .toDF("g", "v")
      .select(col("g"), Kmv.point(col("v")).as("h"))
    val staged = Kmv.sketch(pts, K).orderBy("g", "h").collect().toSeq
    val w = Window.partitionBy(col("g")).orderBy(col("h"))
    val global = pts.distinct()
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= K)
      .drop("rn").orderBy("g", "h").collect().toSeq
    assert(staged == global)
  }

  test("estimator lands within ~3/sqrt(k) of a known cardinality and is " +
    "exact below k") {
    val n = 50000
    val pts = (0 until n).map(i => ("g", s"item-$i")).toDF("g", "v")
      .select(col("g"), Kmv.point(col("v")).as("h"))
    val sk = Kmv.sketch(pts, K)
    val est = sk.groupBy("g")
      .agg(count(lit(1)).as("n"), max(col("h")).as("kth"))
      .select(Kmv.estimate(col("n"), col("kth"), K))
      .as[Long].head()
    val err = math.abs(est - n).toDouble / n
    assert(err < 3.0 / math.sqrt(K), s"estimate $est for $n: rel err $err")

    val small = (0 until 57).map(i => ("g", s"s-$i")).toDF("g", "v")
      .select(col("g"), Kmv.point(col("v")).as("h"))
    val smallEst = Kmv.sketch(small, K).groupBy("g")
      .agg(count(lit(1)).as("n"), max(col("h")).as("kth"))
      .select(Kmv.estimate(col("n"), col("kth"), K))
      .as[Long].head()
    assert(smallEst == 57L, "below k the sketch IS the domain: exact")
  }

  test("union/intersection estimates track planted overlap") {
    // A = 0..29999, B = 20000..49999 → |A∪B| = 50k, |A∩B| = 10k
    val a = (0 until 30000).map(i => ("a", s"o-$i"))
    val b = (20000 until 50000).map(i => ("b", s"o-$i"))
    val pts = (a ++ b).toDF("g", "v")
      .select(col("g"), Kmv.point(col("v")).as("h"))
    val sk = Kmv.sketch(pts, K)
    val usk = sk.select("h").distinct().orderBy("h").limit(K)
    val estU = usk.agg(count(lit(1)).as("n"), max(col("h")).as("kth"))
      .select(Kmv.estimate(col("n"), col("kth"), K)).as[Long].head()
    val rho = usk
      .join(sk.filter(col("g") === "a").select("h"), Seq("h"), "left_semi")
      .join(sk.filter(col("g") === "b").select("h"), Seq("h"), "left_semi")
      .count()
    val estI = math.round(rho.toDouble * estU.toDouble / K)
    assert(math.abs(estU - 50000).toDouble / 50000 < 3.0 / math.sqrt(K))
    // intersection variance is higher (ρ is a k-sample binomial): 5σ slack
    assert(math.abs(estI - 10000).toDouble / 10000 < 1.0,
      s"intersection estimate $estI vs 10000")
    assert(estI > 0, "planted overlap must be visible")
  }
}

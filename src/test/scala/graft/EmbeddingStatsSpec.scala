package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.{EmbeddingStats, Similarity, Tables}

/** Properties of the exact-integer embedding-analytics family that the
  * q159–q163 oracles can't see: partition invariance (the exactness
  * claim), eigen quality (the oracle only proves both engines ran the
  * same iteration, not that the iteration finds a principal direction),
  * and AUC ground truths on closed-form inputs.
  */
class EmbeddingStatsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def qdf = EmbeddingStats.quantizedWithLabel(
    Tables.table(spark, sf, "embeddings"))

  test("intScatter is EXACT: bit-identical across repartitionings AND " +
      "to the declarative explode reference") {
    // The whole point of the int8 path — BIGINT sums are associative,
    // so the scatter matrix cannot depend on partitioning or summation
    // order (a float covariance would differ in the low bits here).
    // The native IntScatterAgg buffer fold must match the explode →
    // groupBy reference row-for-row: same triangle, same indices, same
    // sums — a wrong k→(i,j) unwinding, dropped row, or buffer-merge
    // bug breaks here before the oracle ever sees it.
    val base = EmbeddingStats.intScatter(qdf)
      .orderBy("i", "j").collect().toSeq
    Seq(1, 7).foreach { n =>
      val re = EmbeddingStats.intScatter(qdf.repartition(n))
        .orderBy("i", "j").collect().toSeq
      assert(re == base, s"scatter changed under repartition($n)")
    }
    val declarative = EmbeddingStats.intScatterExplode(qdf)
      .orderBy("i", "j").collect().toSeq
    assert(base == declarative, "native aggregate != explode reference")
    assert(base.length == 64 * 65 / 2)
    // diagonal entries are sums of squares — strictly positive here
    assert(base.filter(r => r.getInt(0) == r.getInt(1))
      .forall(_.getLong(2) > 0))
  }

  test("powerIteration finds the dominant eigendirection of a known " +
      "matrix and is stable to vScale") {
    // 3 planted directions in a 4-d scatter: diag(1000, 400, 50, 1).
    // The dominant eigenvector is e1; after a rotation by the integer
    // shear [[1,1],[0,1]] applied to (1,2) the dominant direction mixes
    // but stays closed-form checkable via the Rayleigh quotient.
    val d = 4
    val tri = for (i <- 1 to d; j <- i to d) yield {
      val s = (i, j) match {
        case (1, 1) => 1000L; case (2, 2) => 400L
        case (3, 3) => 50L; case (4, 4) => 1L
        case (1, 2) => 300L // couples the top two directions
        case _ => 0L
      }
      (i, j, s)
    }
    val v = EmbeddingStats.powerIteration(tri.toArray, n = 1L, d = d,
      iters = 30)
    // Rayleigh quotient of v must dominate every coordinate axis's
    // (v is a better variance direction than any single axis)
    val c = Array.tabulate(d, d) { (a, b) =>
      tri.find(t => (t._1 == a + 1 && t._2 == b + 1) ||
        (t._2 == a + 1 && t._1 == b + 1)).map(_._3).getOrElse(0L).toDouble
    }
    def rayleigh(x: Array[Double]): Double = {
      val num = (for (a <- 0 until d; b <- 0 until d)
        yield x(a) * c(a)(b) * x(b)).sum
      num / x.map(y => y * y).sum
    }
    val rq = rayleigh(v.map(_.toDouble))
    val axisBest = (0 until d).map { a =>
      rayleigh(Array.tabulate(d)(i => if (i == a) 1.0 else 0.0))
    }.max
    assert(rq >= axisBest,
      s"power iteration's direction ($rq) beat by an axis ($axisBest)")
    // largest component on the dominant (first) coordinate
    assert(v.map(math.abs).zipWithIndex.maxBy(_._1)._2 == 0)
  }

  test("pca projection variance dominates every single int8 coordinate") {
    // End-to-end eigen quality on real data: Var(q·v)/|v|² must be ≥
    // Var(q_i) for every raw coordinate i — otherwise the iteration
    // found nothing principal. (The oracle proves cross-engine
    // equality; this proves the direction is WORTH projecting on.)
    val q = qdf
    val n = q.count().toDouble
    val tri = EmbeddingStats.intScatter(q).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val v = EmbeddingStats.powerIteration(tri, n.toLong, 64, iters = 12)
    val proj = q.select(EmbeddingStats.projectInt(col("q"), v).as("p"))
      .agg((sum(col("p") * col("p")) / n
        - pow(sum(col("p")) / n, 2)).as("var"))
      .head().getDouble(0) / v.map(x => x.toDouble * x).sum
    val coordVars = q.select(posexplode(col("q")).as(Seq("i", "x")))
      .groupBy("i")
      .agg((sum(col("x") * col("x")) / n
        - pow(sum(col("x")) / n, 2)).as("v"))
      .agg(max(col("v"))).head().getDouble(0)
    assert(proj >= coordVars,
      s"pc1 variance $proj below best coordinate variance $coordVars")
  }

  test("aucByScoreBuckets matches closed-form ground truths") {
    def auc(rows: Seq[(Long, Boolean)]): (Long, Long, Long, Double) = {
      val df = rows.toDF("s", "is_pos")
      val r = EmbeddingStats.aucByScoreBuckets(df, "s", "is_pos").head()
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    }
    // perfect separation → 1.0
    assert(auc(Seq((10L, true), (9L, true), (1L, false), (2L, false)))._4
      == 1.0)
    // perfectly wrong → 0.0
    assert(auc(Seq((1L, true), (2L, true), (9L, false), (10L, false)))._4
      == 0.0)
    // all tied → 0.5 exactly (the tie-correction term)
    assert(auc(Seq((5L, true), (5L, false), (5L, true), (5L, false)))._4
      == 0.5)
    // hand case: pos {3,1}, neg {2,0}: pairs (3>2),(3>0),(1>0) win,
    // (1<2) loses → AUC = 3/4
    assert(auc(Seq((3L, true), (1L, true), (2L, false), (0L, false)))._4
      == 0.75)
    // partition invariance of the bucket form
    val big = (1 to 500).map(i => ((i % 37).toLong, i % 3 == 0))
    val a1 = auc(big)
    val a2 = {
      val df = big.toDF("s", "is_pos").repartition(13)
      val r = EmbeddingStats.aucByScoreBuckets(df, "s", "is_pos").head()
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    }
    assert(a1 == a2)
  }

  test("projectInt through the double dot is exact: equals a driver " +
      "BigInt computation on every row") {
    val v = Array.tabulate(64)(i => ((i * 2654435761L) % 8193) - 4096)
    val rows = qdf.select(col("vec_id"), col("q"),
      EmbeddingStats.projectInt(col("q"), v).as("p")).collect()
    rows.foreach { r =>
      val q = r.getSeq[Int](1)
      val want = q.zip(v).map { case (a, b) => a.toLong * b }.sum
      assert(r.getLong(2) == want, s"vec ${r.getLong(0)}")
    }
  }

  test("quantizedWithLabel codes agree with quantizeInt8 (q100's " +
      "oracle-pinned op sequence)") {
    val a = qdf.select("vec_id", "q").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val b = Similarity.quantizeInt8(Tables.table(spark, sf, "embeddings"))
      .select("vec_id", "q").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(a == b)
  }
}

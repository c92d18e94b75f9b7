package graft
import org.scalatest.funsuite.AnyFunSuite
import graft.engine._
class DebugQ206Spec extends AnyFunSuite {
  import TestSpark.spark
  test("q206 body twice") {
    (1 to 2).foreach { i =>
      println(s"=== RUN $i")
      try {
        val df = IngestQueries.specs.find(_.name == "q206_cdf_rowlevel").get
          .fn(spark, "/root/testdata/sf0.1")
        println(s"RUN $i rows=" + df.count())
      } catch { case e: Throwable => println(s"RUN $i FAILED: ${e.getMessage.take(200)}") }
    }
  }
}

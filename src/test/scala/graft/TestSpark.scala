package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test JVM (Test/fork := true —
  * suites run in a single forked JVM, so getOrCreate dedupes). */
object TestSpark {
  lazy val spark: SparkSession = Sessions.local("graft-test")

  def tempDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}

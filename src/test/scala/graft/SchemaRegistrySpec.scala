package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine._

class SchemaRegistrySpec extends AnyFunSuite {
  import TestSpark.{spark, tempDir}

  test("catalogType implements gen_schema.py:5-14 verbatim") {
    assert(SchemaRegistry.catalogType("Comment", 3, 10) == "string")
    assert(SchemaRegistry.catalogType("Time", 9, 10) == "string")   // trailing time
    assert(SchemaRegistry.catalogType("Time", 1, 10) == "double")   // non-trailing
    assert(SchemaRegistry.catalogType("ClockDateTime", 0, 10) == "timestamp")
    assert(SchemaRegistry.catalogType("I1_1", 2, 10) == "double")
  }

  test("categoryMap forward-fills like crawler.py:21-35") {
    val cat = Seq("", "", "Group 1", "", "Group 2", "")
    val hdr = Seq("ClockDateTime", "Time", "I1_1", "I1_2", "I2_1", "I2_2")
    val m = SchemaRegistry.categoryMap(cat, hdr)
    assert(m == Seq(
      "ClockDateTime" -> Seq("ClockDateTime"),
      "Time" -> Seq("Time"),
      "Group 1" -> Seq("I1_1", "I1_2"),
      "Group 2" -> Seq("I2_1", "I2_2")))
    // a data column before any category is a format error
    assertThrows[IllegalArgumentException] {
      SchemaRegistry.categoryMap(Seq("", "", "", "G"), Seq("a", "b", "c", "d"))
    }
  }

  test("schema snapshot round-trips through JSON (K2, sparkle-v9.py:31-61)") {
    val dir = tempDir("reg-snap")
    val path = EegFixture.write(dir, EegFixture.specA)
    val df = Ingest.ingestFile(spark, path)
    val snap = SchemaRegistry.writeSnapshot(spark, df.schema, s"$dir/registry", "t")
    assert(snap.endsWith("schema_t.json"))
    val back = SchemaRegistry.readSnapshot(spark, snap).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(back("ClockDateTime") == "double")
    assert(back("Timestamp") == "timestamp")
    assert(back("PatientBirthDate") == "date")
    assert(back("Year") == "int")
    assert(back.size == df.schema.size)
  }

  test("category map JSON round-trips and drives narrow projection") {
    val dir = tempDir("reg-cat")
    val path = EegFixture.write(dir, EegFixture.specA)
    val raw = spark.read.option("header", "false").csv(path)
    def strRow(i: Long) = Ingest.rowAt(raw, i).toSeq
      .map(v => Option(v).map(_.toString).getOrElse(""))
    val m = SchemaRegistry.categoryMap(strRow(6), strRow(7))
    val p = s"$dir/mapping.json"
    SchemaRegistry.writeCategoryMap(spark, m, p)
    val loaded = SchemaRegistry.loadCategoryMap(spark, p)
    assert(loaded("Group 1") == Seq("I1_1", "I1_2", "I1_3"))

    val df = Ingest.ingestFile(spark, path)
    val proj = SchemaRegistry.projectCategory(df, loaded, "Group 1", Seq("Time"))
    assert(proj.columns.toSeq == Seq("Time", "I1_1", "I1_2", "I1_3"))
    assertThrows[IllegalArgumentException] {
      SchemaRegistry.projectCategory(df, loaded, "No Such Group")
    }
  }
}

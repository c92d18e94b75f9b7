package graft.engine

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Schema registry + column-group catalog (K2/K6 and the reference's
  * query-UX layer):
  *
  *  - JSON schema snapshots per ingest batch — the `write_schema_to_s3`
  *    sink (sparkle-v9.py:31-61): `[{"Name": ..., "Type": ...}]`. Types
  *    are Spark SQL catalog names (`double`, `timestamp`, ...) like the
  *    reference's column_type_mapping.json, rather than v9's Python
  *    `str(DataType())` spelling. Snapshot tags are caller-supplied
  *    (deterministic) where the reference used wall-clock time.
  *  - gen_schema.py:5-14 type rules (comment→string, trailing time→string,
  *    clockdatetime→timestamp, else double) for catalog entries.
  *  - the super-category → column-list mapping built from rows 7/8 of the
  *    preamble format by forward-fill (crawler.py:21-35, mapping.json) —
  *    the platform's "column group" projection UX: a category name expands
  *    to its column list. With 6,039-column tables this is also the scale
  *    lever: category projection keeps scans narrow (Parquet column
  *    pruning does the rest).
  */
object SchemaRegistry {

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Schema snapshot JSON body (reference format, sparkle-v9.py:34-37). */
  def snapshotJson(schema: StructType): String =
    schema.fields.map { f =>
      s"""  {"Name": ${jsonStr(f.name)}, "Type": ${jsonStr(f.dataType.simpleString)}}"""
    }.mkString("[\n", ",\n", "\n]")

  /** K2: write `schema_<tag>.json` into the registry dir; returns the
    * snapshot path. */
  def writeSnapshot(spark: SparkSession, schema: StructType, registryDir: String,
      tag: String): String = {
    val dir = new Path(registryDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(dir)
    val p = new Path(dir, s"schema_$tag.json")
    val out = fs.create(p, true)
    try out.write(snapshotJson(schema).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    p.toString
  }

  /** Read a snapshot back as (Name, Type) rows. */
  def readSnapshot(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", "true").json(path).select("Name", "Type")

  /** gen_schema.py:5-14 catalog type rules, verbatim. */
  def catalogType(columnName: String, index: Int, totalColumns: Int): String =
    columnName.toLowerCase match {
      case "comment" => "string"
      case "time" if index == totalColumns - 1 => "string"
      case "clockdatetime" => "timestamp"
      case _ => "double"
    }

  /** Catalog entries for a header row (column_type_mapping.json shape). */
  def catalogMapping(headers: Seq[String]): Seq[(String, String)] =
    headers.zipWithIndex.map { case (h, i) =>
      h -> catalogType(h, i, headers.length)
    }

  /** crawler.py:21-35 semantics: first two columns map to themselves;
    * from column 3 on, a non-blank category cell starts a new group and
    * blanks forward-fill into the previous one. Order-preserving. */
  def categoryMap(categoryRow: Seq[String], headerRow: Seq[String]): Seq[(String, Seq[String])] = {
    val builder = collection.mutable.LinkedHashMap.empty[String, Vector[String]]
    headerRow.take(2).foreach { h =>
      val k = h.trim
      builder(k) = builder.getOrElse(k, Vector.empty) :+ k
    }
    var current: String = null
    (2 until headerRow.length).foreach { i =>
      val cat = if (i < categoryRow.length) categoryRow(i).trim else ""
      if (cat.nonEmpty) current = cat
      require(current != null, s"column $i has no super-category to inherit")
      builder(current) = builder.getOrElse(current, Vector.empty) :+ headerRow(i).trim
    }
    builder.toSeq
  }

  /** mapping.json shape: [{"SuperCategory": ..., "ColumnNames": [...]}]. */
  def categoryMapJson(m: Seq[(String, Seq[String])]): String =
    m.map { case (cat, cols) =>
      s"""  {"SuperCategory": ${jsonStr(cat)}, "ColumnNames": [${cols.map(jsonStr).mkString(", ")}]}"""
    }.mkString("[\n", ",\n", "\n]")

  def writeCategoryMap(spark: SparkSession, m: Seq[(String, Seq[String])],
      path: String): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(categoryMapJson(m).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  def loadCategoryMap(spark: SparkSession, path: String): Map[String, Seq[String]] =
    spark.read.option("multiLine", "true").json(path)
      .select("SuperCategory", "ColumnNames").collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap

  /** The category-projection query UX: expand a super-category to its
    * column list (plus caller-kept key columns). Narrow projection →
    * Parquet reads only these columns. */
  def projectCategory(df: DataFrame, m: Map[String, Seq[String]],
      category: String, keep: Seq[String] = Seq.empty): DataFrame = {
    val cols = m.getOrElse(category,
      throw new IllegalArgumentException(s"unknown super-category: $category"))
    df.select((keep ++ cols).map(df.col): _*)
  }
}

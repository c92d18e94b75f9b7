package graft.engine

import java.math.BigDecimal
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Deterministic generator for the reference's EEG preamble-CSV format
  * (FIXTURES.md §B; format defined operationally by reference
  * `random_generator.py:33-50`).
  *
  * Layout (all rows padded with trailing commas to uniform width — the
  * v9 header probe reads the file without a schema, so Spark derives the
  * column count from the first line; reference `sparkle-v9.py:92`):
  *   rows 1-6 : key,value metadata (File, PatientName, PatientID,
  *              PatientBirthDate, TestDate, TestTime)
  *   row  7   : sparse super-category row (name at each group start,
  *              forward-filled by the reader; reference `crawler.py:24-32`)
  *   row  8   : column headers — ClockDateTime, Time, I<g>_<k>...
  *   rows 9+  : data; ClockDateTime = epoch-seconds / 1e5 as a double
  *              (reference `random_generator.py:48`), Time = row counter,
  *              then deterministic measurement doubles.
  *
  * Everything is a pure function of the spec — no clocks, no RNG — so the
  * DuckDB oracle can inline expected constants.
  */
final case class EegFileSpec(
    fileName: String,
    patientName: String,
    patientId: String,
    patientBirthDate: String, // reference date format: "1980/2/3"
    testDate: String,
    testTime: String,
    startEpochSec: Long,
    nRows: Int,
    stepSec: Long,
    nDataCols: Int,
    groupSize: Int = 3)

object EegFixture {

  /** Headers: ClockDateTime, Time, then I<group>_<member>. */
  def headers(spec: EegFileSpec): Seq[String] =
    "ClockDateTime" +: "Time" +: (0 until spec.nDataCols).map { j =>
      s"I${j / spec.groupSize + 1}_${j % spec.groupSize + 1}"
    }

  /** Sparse super-category row: first two cells empty, then "Group <g>"
    * at each group start (crawler.py forward-fills the blanks). */
  def categoryRow(spec: EegFileSpec): Seq[String] =
    "" +: "" +: (0 until spec.nDataCols).map { j =>
      if (j % spec.groupSize == 0) s"Group ${j / spec.groupSize + 1}" else ""
    }

  /** Measurement cell text: deterministic 3-decimal value in [0, 0.997). */
  def cell(i: Int, j: Int): String =
    "0.%03d".format(((i + 1) * 31 + (j + 1) * 17) % 997)

  /** ClockDateTime cell: exact 5-decimal text of (start + i*step) / 1e5. */
  def clockCell(spec: EegFileSpec, i: Int): String =
    BigDecimal.valueOf(spec.startEpochSec + i * spec.stepSec)
      .movePointLeft(5).toPlainString

  def contents(spec: EegFileSpec): String = {
    val width = 2 + spec.nDataCols
    def padded(cells: Seq[String]): String =
      (cells ++ Seq.fill(width - cells.length)("")).mkString(",")
    val meta = Seq(
      Seq("File", spec.fileName),
      Seq("PatientName", spec.patientName),
      Seq("PatientID", spec.patientId),
      Seq("PatientBirthDate", spec.patientBirthDate),
      Seq("TestDate", spec.testDate),
      Seq("TestTime", spec.testTime)).map(padded)
    val cat = padded(categoryRow(spec))
    val hdr = headers(spec).mkString(",")
    val data = (0 until spec.nRows).map { i =>
      (clockCell(spec, i) +: i.toString +:
        (0 until spec.nDataCols).map(j => cell(i, j))).mkString(",")
    }
    (meta ++ Seq(cat, hdr) ++ data).mkString("", "\n", "\n")
  }

  /** Write the fixture CSV under `dir`; returns the path. Published
    * ATOMICALLY (per-PID temp + rename) because several queries stage
    * into SHARED oracle-visible dirs: a plain truncate-then-write would
    * let a concurrent run's scan read a half-written file. Content is a
    * pure function of the spec, so a replace swaps identical bytes and
    * the race winner is irrelevant. */
  def write(dir: String, spec: EegFileSpec): String = {
    Files.createDirectories(Paths.get(dir))
    val p = Paths.get(dir, spec.fileName)
    val tmp = Paths.get(dir,
      s".${spec.fileName}.${ProcessHandle.current().pid()}.tmp")
    Files.write(tmp, contents(spec).getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, p, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    p.toString
  }

  /** Standard fixtures shared by the CORRECTNESS queries and the unit
    * tests. Start epochs are midnight UTC; steps > 1 day/4 so each file
    * spans multiple Year/Month/Day partitions. */
  val specA: EegFileSpec = EegFileSpec(
    fileName = "PUH-2019-042_01.csv",
    patientName = "Alice Smith", patientId = "P-00042",
    patientBirthDate = "1980/2/3", testDate = "2019/7/15",
    testTime = "13:5:42",
    startEpochSec = 1563148800L, // 2019-07-15 00:00:00 UTC
    nRows = 48, stepSec = 7 * 3600L, nDataCols = 6)

  val specB: EegFileSpec = EegFileSpec(
    fileName = "PUH-2020-007_02.csv",
    patientName = "Bob Jones", patientId = "P-00007",
    patientBirthDate = "1975/11/30", testDate = "2020/3/1",
    testTime = "8:0:5",
    startEpochSec = 1583020800L, // 2020-03-01 00:00:00 UTC
    nRows = 36, stepSec = 11 * 3600L, nDataCols = 6)
}

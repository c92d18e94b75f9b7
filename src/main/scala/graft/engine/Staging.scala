package graft.engine

/** The stage-once completion-marker discipline shared by every query
  * family that builds fixtures under the per-PID scratch root
  * (IngestQueries' mutable lakes, SimilarityQueries' ANN fixtures).
  * One definition so the protocol can't drift between families.
  *
  *  - [[ensureStaged]]: run `build` only when the `_STAGED` marker next
  *    to `path` is absent, and write the marker only after `build`
  *    completes — a build that dies half-way leaves no marker, so the
  *    next attempt restages (builders delete their target first).
  *    The marker sits NEXT to the fixture dir, not inside it: in-place
  *    rewrites (compact) replace the dir's contents.
  *  - [[mutateOrRestage]]: run an in-place mutation of a staged
  *    fixture; on failure drop the marker so the next same-JVM attempt
  *    rebuilds from source instead of mutating a half-mutated fixture.
  */
object Staging {

  private def marker(path: String): java.nio.file.Path =
    java.nio.file.Path.of(path + "_STAGED")

  def ensureStaged(path: String)(build: => Unit): Unit =
    if (!java.nio.file.Files.exists(marker(path))) {
      build
      java.nio.file.Files.createFile(marker(path))
      ()
    }

  def mutateOrRestage[T](path: String)(body: => T): T =
    try body
    catch {
      case e: Throwable =>
        java.nio.file.Files.deleteIfExists(marker(path))
        throw e
    }
}

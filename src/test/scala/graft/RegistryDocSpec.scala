package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** REGISTRY.md is GENERATED (runMain graft.RegistryDoc) — this spec
  * re-renders it from the registry maps + sources and diffs against the
  * committed file, so the consumer index can never drift: register a
  * query (or change an oracle/referee/spec reference) without
  * regenerating and the suite fails with the first differing line.
  */
class RegistryDocSpec extends AnyFunSuite {

  test("committed REGISTRY.md matches a fresh render") {
    val path = Paths.get("REGISTRY.md")
    assert(Files.exists(path), "REGISTRY.md missing — run: sbt \"runMain graft.RegistryDoc\"")
    val committed = Files.readString(path)
    val fresh = RegistryDoc.render()
    if (committed != fresh) {
      val c = committed.linesIterator.toVector
      val f = fresh.linesIterator.toVector
      val i = c.zip(f).indexWhere { case (a, b) => a != b }
      val at = if (i >= 0) i else math.min(c.size, f.size)
      fail(s"REGISTRY.md is stale (regenerate with sbt \"runMain graft.RegistryDoc\"); " +
        s"first diff at line ${at + 1}:\n  committed: ${c.lift(at).getOrElse("<EOF>")}\n" +
        s"  fresh    : ${f.lift(at).getOrElse("<EOF>")}")
    }
  }

  test("every registered query appears in the rendered doc") {
    val doc = RegistryDoc.render()
    val missing = SparkEntry.queries.keySet.filterNot(n => doc.contains(s"| `$n` |"))
    assert(missing.isEmpty, s"queries missing from REGISTRY.md: $missing")
  }
}

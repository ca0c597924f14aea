package graft

import org.scalatest.funsuite.AnyFunSuite

class IndexSeedSpec extends AnyFunSuite {

  test("seed builds once per key, copies are independent, re-entry never re-builds") {
    var builds = 0
    val key = s"indexseed-spec-${System.nanoTime()}"
    def build(dir: String): Unit = {
      builds += 1
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir, "nodes"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, "nodes", "part-0"), "pristine".getBytes)
    }
    val d1 = java.nio.file.Files.createTempDirectory("graft-seedspec-1-")
    val d2 = java.nio.file.Files.createTempDirectory("graft-seedspec-2-")
    try {
      IndexSeed.seed(key, d1.toString)(build)
      IndexSeed.seed(key, d2.toString)(build)
      assert(builds == 1, "the pristine build must run once per JVM per key")
      val f1 = d1.resolve("nodes/part-0")
      val f2 = d2.resolve("nodes/part-0")
      assert(new String(java.nio.file.Files.readAllBytes(f1)) == "pristine")
      // a gate MUTATES its copy; the other copy and the cache are untouched
      java.nio.file.Files.write(f1, "mutated".getBytes)
      assert(new String(java.nio.file.Files.readAllBytes(f2)) == "pristine",
        "copies must be independent")
      val d3 = java.nio.file.Files.createTempDirectory("graft-seedspec-3-")
      try {
        IndexSeed.seed(key, d3.toString)(build)
        assert(builds == 1, "later seeds must copy, not rebuild")
        assert(new String(java.nio.file.Files.readAllBytes(
          d3.resolve("nodes/part-0"))) == "pristine",
          "later copies come from the pristine cache, not a mutated gate dir")
      } finally Fs.deleteRecursively(d3)
    } finally { Fs.deleteRecursively(d1); Fs.deleteRecursively(d2) }
  }

  test("copyRecursively reproduces a nested tree") {
    val src = java.nio.file.Files.createTempDirectory("graft-copyspec-src-")
    val dst = java.nio.file.Files.createTempDirectory("graft-copyspec-dst-")
    try {
      java.nio.file.Files.createDirectories(src.resolve("a/b"))
      java.nio.file.Files.write(src.resolve("a/b/x.txt"), "deep".getBytes)
      java.nio.file.Files.write(src.resolve("top.txt"), "shallow".getBytes)
      Fs.copyRecursively(src, dst)
      assert(new String(java.nio.file.Files.readAllBytes(
        dst.resolve("a/b/x.txt"))) == "deep")
      assert(new String(java.nio.file.Files.readAllBytes(
        dst.resolve("top.txt"))) == "shallow")
    } finally { Fs.deleteRecursively(src); Fs.deleteRecursively(dst) }
  }
}

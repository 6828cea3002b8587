package graft

import java.nio.file.{Files, Paths}

import graft.sources.FileSources

/** Raw-corpus and binary-asset ingest paths (FileSources.readTextLines /
  * readWholeTextFiles / readBinaryAssets): schema shape, glob and size
  * guards, byte-exact payload round-trip.
  */
class FileIngestSpec extends SparkSpec {

  private def tmpDir(name: String): String = {
    val d = Files.createTempDirectory(name)
    d.toFile.deleteOnExit()
    d.toString
  }

  test("text-lines source: one row per line, single value column") {
    val dir = tmpDir("graft-text")
    Files.writeString(Paths.get(dir, "a.txt"), "alpha\nbeta\n")
    Files.writeString(Paths.get(dir, "b.txt"), "gamma\n")
    val df = FileSources.readTextLines(spark, dir)
    assert(df.columns.toSeq == Seq("value"))
    assert(df.count() == 3)
    assert(df.collect().map(_.getString(0)).sorted.toSeq ==
      Seq("alpha", "beta", "gamma"))
  }

  test("wholetext source: one row per FILE (document-per-file corpora)") {
    val dir = tmpDir("graft-whole")
    Files.writeString(Paths.get(dir, "a.txt"), "alpha\nbeta\n")
    Files.writeString(Paths.get(dir, "b.txt"), "gamma\n")
    val rows = FileSources.readWholeTextFiles(spark, dir).collect()
    assert(rows.length == 2)
    assert(rows.map(_.getString(0)).sorted.toSeq ==
      Seq("alpha\nbeta\n", "gamma\n").sorted.toSeq)
  }

  test("binary-asset source: glob selects, size guard excludes, bytes round-trip") {
    val dir = tmpDir("graft-bin")
    val payload = Array[Byte](1, 2, 3, 4, 5)
    Files.write(Paths.get(dir, "img1.bin"), payload)
    Files.write(Paths.get(dir, "img2.bin"), Array.fill[Byte](64)(7))
    Files.writeString(Paths.get(dir, "notes.txt"), "not an asset")
    // glob: only .bin files are listed (the .txt never opened)
    val all = FileSources.readBinaryAssets(spark, dir, globFilter = Some("*.bin"))
    assert(all.count() == 2)
    assert(all.columns.contains("content") && all.columns.contains("length"))
    // size guard: the 64-byte file is excluded by the length filter
    val small = FileSources.readBinaryAssets(spark, dir,
      globFilter = Some("*.bin"), maxBytes = Some(16L))
    val rows = small.collect()
    assert(rows.length == 1)
    val content = rows.head.getAs[Array[Byte]]("content")
    assert(content.toSeq == payload.toSeq, "payload must round-trip byte-exact")
  }
}

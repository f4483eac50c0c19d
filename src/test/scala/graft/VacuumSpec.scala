package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Staging

/** Staging-debris retention: stale `__tmp`/`__old`/`.__compact`
  * siblings are swept; live data and crash-recovery backups never are.
  */
class VacuumSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def mkTable(path: String): Unit =
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.parquet(path)

  test("stale staging siblings are removed; live data untouched") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-vac1")
    val path = tmp.resolve("t").toString
    mkTable(path)
    Staging.suffixes.foreach { suf =>
      new java.io.File(path + suf).mkdirs()
    }
    val deleted = Staging.vacuum(spark, path, horizonMs = 0)
    assert(deleted.size == Staging.suffixes.size, deleted.toString)
    Staging.suffixes.foreach { suf =>
      assert(!new java.io.File(path + suf).exists(), suf)
    }
    assert(spark.read.parquet(path).count() == 2)
  }

  test("fresh staging dirs inside the horizon are kept") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-vac2")
    val path = tmp.resolve("t").toString
    mkTable(path)
    new java.io.File(path + "__tmp").mkdirs()
    val deleted = Staging.vacuum(spark, path, horizonMs = 3600L * 1000)
    assert(deleted.isEmpty)
    assert(new java.io.File(path + "__tmp").exists())
  }

  test("__old is NEVER vacuumed while the live dir is missing — it is " +
    "crash-recovery data, not debris") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-vac3")
    val path = tmp.resolve("t").toString
    mkTable(path + "__old") // backup exists, live does not
    val deleted = Staging.vacuum(spark, path, horizonMs = 0)
    assert(deleted.isEmpty)
    assert(new java.io.File(path + "__old").exists())
    // and restoreIfCrashed turns exactly that state back into a table
    val fs = Staging.fsOf(spark, path)
    assert(Staging.restoreIfCrashed(fs, path))
    assert(spark.read.parquet(path).count() == 2)
    assert(!new java.io.File(path + "__old").exists())
  }
}

package graft.sources

import java.io.ByteArrayInputStream
import java.nio.file.{Files, Path, Paths}
import java.util.zip.ZipInputStream

import scala.annotation.tailrec

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Driver-side connector plumbing (SURVEY §2.1 S5/S6/S7): the pieces of
  * the reference that talk to the LMS from the driver — catalog fetches,
  * async job polling, report download/extract — kept OUTSIDE the Spark
  * plan (they are per-run scalars and small dimensions, not data-parallel
  * work). Results enter the engine as broadcast-sized DataFrames or
  * staged files for the distributed scan.
  */
object Connectors {

  /** S5 — REST catalog scan: a paginated catalog fetch landing as a tiny
    * dimension DataFrame (reference: the enrollment-terms list,
    * src/canvas.py:23-27). The fetch callback abstracts the HTTP client;
    * pages are pulled until exhausted, driver-side, then become one
    * broadcast-worthy dimension.
    */
  def catalogScan(spark: SparkSession, schema: StructType)
                 (fetchPage: Int => Seq[Row]): DataFrame = {
    @tailrec def pages(i: Int, acc: Seq[Row]): Seq[Row] = {
      val page = fetchPage(i)
      if (page.isEmpty) acc else pages(i + 1, acc ++ page)
    }
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(pages(0, Vector.empty).asJava, schema)
  }

  /** S6 — async job handle: poll `status` until `isDone` or the attempt
    * budget runs out (reference polls the provisioning report every 3 s
    * and the SIS import every 2 s, src/canvas.py:38-40,128-129). Returns
    * the terminal status; the sleep is injectable so tests run instantly.
    */
  def awaitJob[S](status: () => S, isDone: S => Boolean,
                  intervalMs: Long = 3000, maxAttempts: Int = 1000,
                  sleep: Long => Unit = Thread.sleep): S = {
    @tailrec def loop(attempt: Int): S = {
      val s = status()
      if (isDone(s)) s
      else if (attempt >= maxAttempts)
        throw new IllegalStateException(s"job not done after $maxAttempts polls: $s")
      else { sleep(intervalMs); loop(attempt + 1) }
    }
    loop(1)
  }

  /** S7 — zip ingest: extract a downloaded report archive into a staging
    * directory (reference: src/canvas.py:46-52 downloads the report zip
    * and extracts the per-entity CSVs). Returns the extracted paths; the
    * staged files feed the distributed CSV scan (S4). Entry names are
    * sanitized against path traversal.
    */
  def extractZip(bytes: Array[Byte], stagingDir: String): Seq[Path] = {
    val dir = Paths.get(stagingDir)
    Files.createDirectories(dir)
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    val out = Vector.newBuilder[Path]
    var entry = zin.getNextEntry
    while (entry != null) {
      if (!entry.isDirectory) {
        val target = dir.resolve(entry.getName).normalize()
        require(target.startsWith(dir), s"zip entry escapes staging dir: ${entry.getName}")
        Files.createDirectories(target.getParent)
        Files.copy(zin, target,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        out += target
      }
      entry = zin.getNextEntry
    }
    zin.close()
    out.result()
  }
}

package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.sources.FileFormats
import graft.streaming.DedupStream

/** File-format IO: JSONL round-trip fidelity, corrupt-record
  * quarantine (JSONL + CSV), and the size-targeted parquet writer's
  * file-count / in-file-order guarantees. */
class FileFormatsSpec extends SparkSpec {

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("JSONL round-trip preserves the documents table exactly") {
    val s = spark
    import s.implicits._
    val docs = Tables.load(s, sf, "documents")
    val out = tmpDir("jsonl_rt")
    FileFormats.writeJsonl(docs, out)
    val back = FileFormats.readJsonl(s, out, docs.schema)
    val (good, bad) = FileFormats.splitCorrupt(back)
    assert(bad.isEmpty, "no corrupt rows in a clean round-trip")
    // order-free multiset equality on the full row
    assert(good.exceptAll(docs).isEmpty && docs.exceptAll(good).isEmpty)
  }

  test("malformed JSONL lines land in the quarantine, not the job log") {
    val s = spark
    val dir = tmpDir("jsonl_bad")
    Files.write(Paths.get(dir, "part-0.json"), java.util.Arrays.asList(
      """{"doc_id": 1, "text": "ok", "lang": "en", "source": "a", "n_chars": 2}""",
      """{"doc_id": NOT JSON""",
      """{"doc_id": 2, "text": "also ok", "lang": "en", "source": "b", "n_chars": 7}"""))
    val (good, bad) =
      FileFormats.splitCorrupt(FileFormats.readJsonl(s, dir, DedupStream.documentsSchema))
    assert(good.count() == 2)
    val quarantined = bad.collect().map(_.getString(0))
    assert(quarantined.length == 1 && quarantined.head.contains("NOT JSON"))
  }

  test("CSV with enforced schema parses good rows and quarantines bad ones") {
    val s = spark
    import s.implicits._
    val dir = tmpDir("csv_bad")
    Files.write(Paths.get(dir, "part-0.csv"), java.util.Arrays.asList(
      "doc_id,text,lang,source,n_chars",
      "1,hello,en,web,5",
      "oops,not,a,long,xxx",
      "2,world,fr,book,5"))
    val (good, bad) =
      FileFormats.splitCorrupt(FileFormats.readCsv(s, dir, DedupStream.documentsSchema))
    assert(good.count() == 2)
    assert(good.filter($"doc_id" === 1 && $"text" === "hello" && $"n_chars" === 5).count() == 1)
    assert(bad.count() == 1)
  }

  test("ORC round-trip preserves the documents table and pushes down scans") {
    val s = spark
    import s.implicits._
    val docs = Tables.load(s, sf, "documents")
    val dir = Files.createTempDirectory("graft-orc").toString
    FileFormats.writeOrc(docs, dir, bloomFilterCols = Seq("doc_id"))
    val back = FileFormats.readOrc(s, dir)
    assert(back.schema == docs.schema, "ORC must preserve the schema")
    assert(back.count() == docs.count())
    assert(back.except(docs).isEmpty && docs.except(back).isEmpty,
      "round-trip must be lossless")
    // pushdown reaches the ORC scan like the parquet path
    val q = back.filter($"doc_id" === 42L).select($"doc_id", $"source")
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["), plan.take(1500))
    assert(plan.contains("EqualTo(doc_id,42)"),
      s"point predicate must reach the ORC reader: ${plan.take(1500)}")
  }

  test("writeSizedParquet bounds rows per file and sorts within files") {
    val s = spark
    import s.implicits._
    val docs = Tables.load(s, sf, "documents")
      .repartition(2) // fixed input layout for the assertion
    val out = tmpDir("sized")
    FileFormats.writeSizedParquet(docs, out, maxRecordsPerFile = 100L,
      sortCols = Seq("source", "doc_id"))
    val files = Files.list(Paths.get(out)).toArray.map(_.toString)
      .filter(f => f.endsWith(".parquet"))
    val total = docs.count()
    assert(files.length >= (total / 100L).toInt,
      s"expected ≥ ${total / 100} files for $total rows at 100/file, got ${files.length}")
    for (f <- files) {
      val one = s.read.parquet(f)
      assert(one.count() <= 100, s"file $f exceeds maxRecordsPerFile")
      // in-file clustering: rows appear in (source, doc_id) order
      val rows = one.select($"source", $"doc_id").collect()
        .map(r => (r.getString(0), r.getLong(1)))
      assert(rows.sameElements(rows.sortBy(identity)), s"file $f not clustered")
    }
    // and the write is lossless
    val back = s.read.parquet(out)
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }
  test("cowUpsertByPartition rewrites only the touched partition; " +
      "every other partition's files stay byte-identical") {
    val s = spark
    import s.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-cowspec")
    out.toFile.deleteOnExit()
    val om = org.apache.spark.sql.functions.date_format($"o_orderdate", "yyyy-MM")
    val orders = Tables.load(spark, sf, "orders")
    orders.withColumn("om", om)
      .write.mode("overwrite").partitionBy("om").parquet(out.toString)

    def fileHashes(): Map[String, String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles).toSeq.flatten.flatMap(walk)
        else Seq(f)
      walk(out.toFile).filter(_.getName.endsWith(".parquet")).map { f =>
        val md = java.security.MessageDigest.getInstance("MD5")
        f.getPath -> md.digest(java.nio.file.Files.readAllBytes(f.toPath))
          .map("%02x".format(_)).mkString
      }.toMap
    }
    val before = fileHashes()

    val month = "1995-03"
    val delta = orders.filter(om === month)
      .withColumn("o_totalprice", $"o_totalprice" + 1.0)
      .withColumn("om", om)
    val affected = graft.sources.FileFormats.cowUpsertByPartition(
      spark, out.toString, delta, "om", "o_orderkey")
    assert(affected == Seq(month), s"expected one touched partition: $affected")

    val after = fileHashes()
    val touched = s"om=$month"
    // untouched partitions: identical paths AND identical bytes
    val beforeUntouched = before.filterNot(_._1.contains(touched))
    val afterUntouched = after.filterNot(_._1.contains(touched))
    assert(beforeUntouched == afterUntouched,
      "untouched partition files must remain byte-identical")
    // the touched partition was rewritten (different file set/bytes)
    assert(before.keys.exists(_.contains(touched)))
    assert(after.keys.exists(_.contains(touched)))
    assert(before.filter(_._1.contains(touched)) !=
      after.filter(_._1.contains(touched)))

    // content equals the full-table merge semantics
    val back = spark.read.parquet(out.toString)
      .select($"o_orderkey", $"o_totalprice")
    val expected = orders.select($"o_orderkey",
      org.apache.spark.sql.functions.when(om === month, $"o_totalprice" + 1.0)
        .otherwise($"o_totalprice").as("o_totalprice"))
    assert(back.exceptAll(expected).isEmpty && expected.exceptAll(back).isEmpty)
  }
}

package graft

import graft.pipeline.{IocTransform, Model}
import org.apache.spark.sql.functions._

class IocSourceSpec extends SparkSpec {

  private lazy val fixtureDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-ioc")
    def write(name: String, body: String): Unit =
      java.nio.file.Files.writeString(d.resolve(name), body)
    write("qh1.json",
      """{"count": 3, "advanced_query_hash": "qh1", "results": [
        | ["ip", "203.0.113.7", null, [95, 40], ["c2"]],
        | ["fqdn", "evil.example", null, [70, 90], []],
        | ["sha256", "deadbeef", null, [77], []]
        |]}""".stripMargin)
    write("qh2.json",
      """{"count": 2, "advanced_query_hash": "qh2", "results": [
        | ["file", "report.pdf", "d41d8cd98f00b204e9800998ecf8427e", [99]],
        | ["file", "nohash.bin", null, [88]]
        |]}""".stripMargin)
    d.toFile.deleteOnExit()
    d.toString
  }

  private def read() = spark.read.format("graft-ioc")
    .option("path", fixtureDir)
    .option("queries", "qh1,qh2")
    .load()

  test("DSv2 source: one partition per query, decoded rows") {
    val df = read()
    assert(df.rdd.getNumPartitions == 2, "expected one InputPartition per query")
    val rows = df.collect()
    assert(rows.length == 5)
    val ip = rows.find(_.getAs[String]("atom_value") == "203.0.113.7").get
    assert(ip.getAs[String]("query_hash") == "qh1")
    assert(ip.getAs[scala.collection.Seq[Int]]("threat_scores") == scala.collection.Seq(95, 40))
    assert(ip.getAs[scala.collection.Seq[String]]("threat_tags") == scala.collection.Seq("c2"))
    // optional 5th column absent (add_dtl_tags off) → null
    val f = rows.find(_.getAs[String]("atom_value") == "report.pdf").get
    assert(f.getAs[scala.collection.Seq[String]]("threat_tags") == null)
    assert(f.getAs[String]("hashes_md5") == "d41d8cd98f00b204e9800998ecf8427e")
  }

  test("DSv2 source: column pruning reaches the reader") {
    val df = read().select("atom_type", "atom_value")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<atom_type:string,atom_value:string>")
      || df.schema.fieldNames.toSeq == Seq("atom_type", "atom_value"))
    assert(df.collect().length == 5)
  }

  test("DSv2 source feeds the IOC pipeline end-to-end") {
    val s = spark
    import s.implicits._
    val queries = Seq(
      Model.QueryDescriptor("qh1", "ds_one", "very-high", Map("srcip" -> "c2_ip")),
      Model.QueryDescriptor("qh2", "ds_two", "medium")).toDF()
    val objs = IocTransform.run(read(), queries, Model.PipelineConfig())
      .collect().map(_.getString(0))
    // sha256 dropped (F2), nohash.bin dropped (F3) → 3 objects
    assert(objs.length == 3)
    assert(objs.exists(o => o.contains(""""srcip":"203.0.113.7"""") &&
      o.contains(""""itype":"c2_ip"""")))
  }
}

package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.core.TextSink

class FormatsSpec extends SparkSpec {

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.map(String.valueOf): Seq[Any]).toSeq
      .sortBy(_.mkString("|"))

  private val Ddl =
    "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, " +
      "o_totalprice DOUBLE"

  private lazy val orders = Tables(spark, sf, "orders")
    .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")

  test("csv round-trip preserves schema and values") {
    val dir = Files.createTempDirectory("graft_csv").toString
    Formats.writeCsv(orders, dir)
    val back = Formats.readCsv(spark, dir, Ddl)
    assert(back.schema === orders.schema)
    assert(canon(back) === canon(orders))
  }

  test("json round-trip preserves schema and values") {
    val dir = Files.createTempDirectory("graft_json").toString
    Formats.writeJson(orders, dir)
    val back = Formats.readJson(spark, dir, Ddl)
    assert(back.schema === orders.schema)
    assert(canon(back) === canon(orders))
  }

  test("parquet round-trip is exact") {
    val dir = Files.createTempDirectory("graft_pq").toString
    Formats.writeParquet(orders, dir)
    assert(canon(Formats.readParquet(spark, dir)) === canon(orders))
  }

  test("orc round-trip is exact and pushes filters to the scan") {
    val dir = Files.createTempDirectory("graft_orc").toString
    Formats.writeOrc(orders, dir)
    val back = Formats.readOrc(spark, dir)
    assert(back.schema === orders.schema)
    assert(canon(back) === canon(orders))
    // Same pushdown contract as parquet: the predicate must reach the
    // ORC scan (stripe-stats pruning at scale), not sit in a Filter
    // above a full read.
    val p = back.filter(col("o_totalprice") > 1000.0)
      .queryExecution.executedPlan.toString()
    assert(p.contains("PushedFilters:") && p.contains("o_totalprice"))
  }

  test("TextSink sharded mode keeps global order across part files") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_sharded").toString
    val sorted = Tables(spark, sf, "documents")
      .select(col("doc_id")).as[Long].orderBy(col("doc_id"))
    TextSink.write[Long](sorted, _.toString, dir, single = false)
    // Part files, read in filename order, concatenate to the total
    // order (range partitioning: part i's keys precede part i+1's).
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
    val lines = parts.flatMap(f =>
      scala.io.Source.fromFile(f).getLines().toSeq).map(_.toLong)
    assert(lines.toSeq === lines.sorted.toSeq)
    assert(lines.length === 500)
  }
}

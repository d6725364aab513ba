package graft

import graft.text.TextOps
import org.apache.spark.sql.functions._

/** The native codegen `rolling_hash` Expression (injected by
  * GraftExtensions) must agree byte-for-byte with the HOF formulation
  * (which is also the DuckDB oracle's arithmetic) on the real corpus. */
class FingerprintSpec extends SparkTestBase {

  test("codegen rolling_hash == HOF fingerprint on the documents corpus") {
    val docs = Tables.documents(spark, sf)
    val both = docs.select(col("doc_id"),
      expr("rolling_hash(text)").as("fast"),
      TextOps.fingerprint(col("text")).as("hof"))
    assert(both.filter(col("fast") =!= col("hof")).count() === 0)
  }

  test("eval matches a plain Scala reference model") {
    import spark.implicits._
    val inputs = Seq("", "a", "hash join", "the quick brown fox")
    val viaExpr = inputs.toDF("t")
      .select(expr("rolling_hash(t)").as("h")).collect().map(_.getLong(0))
    val model = inputs.map(
      _.getBytes("UTF-8").foldLeft(0L)((acc, b) => (acc * 31 + (b & 0xff)) % 1000000007L))
    assert(viaExpr.toSeq === model)
  }

  test("null text yields null fingerprint; non-string input is rejected") {
    import spark.implicits._
    val out = Seq(Some("x"), None).toDF("t")
      .select(expr("rolling_hash(t)").as("h")).collect()
    assert(!out(0).isNullAt(0))
    assert(out(1).isNullAt(0))
    intercept[Exception] {
      Seq(1L).toDF("n").select(expr("rolling_hash(n)")).collect()
    }
  }
}

package graft.cdc

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class CdcSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = Tables.documents(spark, sfDir)

  test("op filter drops exactly snapshot-reads and deletes") {
    val env = Cdc.syntheticEnvelopes(docs)
    val decoded = Cdc.decode(env)
    val kept = Cdc.opFilter(decoded).count()
    val dropped = decoded.filter(col("env.op").isin("r", "d")).count()
    assert(kept + dropped === docs.count())
  }

  test("flatten applies event-processor defaults") {
    val out = Cdc.pipeline(Cdc.syntheticEnvelopes(docs))
    assert(out.filter(col("status") =!= "created").count() === 0)
    assert(out.filter(col("version") =!= 1).count() === 0)
    assert(out.filter(col("s3_key").isNull).count() === 0)
  }

  test("malformed JSON surfaces as null envelope (ST6 drop channel)") {
    val bad = Seq(("k1", "{not json"), ("k2", """{"op":"c","after":null,"before":null,"ts_ms":1}"""))
      .toDF("key", "value")
    val decoded = Cdc.decode(bad)
    // PERMISSIVE from_json yields a null-fielded struct for garbage
    assert(decoded.filter(col("env.op").isNull).count() === 1)
    // and the payload guard then drops the null-after record too
    assert(Cdc.pipeline(bad).count() === 0)
  }

  test("update envelopes carry full before image (REPLICA IDENTITY FULL)") {
    val updates = Cdc.decode(Cdc.syntheticEnvelopes(docs))
      .filter(col("env.op") === "u")
    assert(updates.count() > 0)
    assert(updates.filter(col("env.before.doc_id").isNull).count() === 0)
  }
}

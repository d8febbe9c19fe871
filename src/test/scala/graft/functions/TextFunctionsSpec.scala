package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("email validation accepts valid, rejects malformed (F12)") {
    val df = Seq("a@b.co", "no-at-sign", "x@y", "first.last+tag@sub.domain.org", "sp ace@x.com")
      .toDF("e")
    val ok = df.select($"e", TextFunctions.isValidEmail($"e").as("v"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(ok("a@b.co") && ok("first.last+tag@sub.domain.org"))
    assert(!ok("no-at-sign") && !ok("x@y") && !ok("sp ace@x.com"))
  }

  test("uuid7 ids are uuid-shaped, time-ordered, deterministic (F9/F10)") {
    val df = Seq((1000L, "a"), (2000L, "b"), (1000L, "a")).toDF("ts", "k")
    val ids = df.select(TextFunctions.uuid7($"ts", $"k").as("u")).collect().map(_.getString(0))
    assert(ids.forall(_.matches(TextFunctions.UuidPattern.drop(1).dropRight(1))))
    assert(ids(0) === ids(2)) // deterministic
    assert(ids(0) < ids(1))   // time-ordered (string sort = time sort)
    val valid = df.select(TextFunctions.isValidUuid(TextFunctions.uuid7($"ts", $"k"))).collect()
    assert(valid.forall(_.getBoolean(0)))
  }

  test("status enum + title + size constraints (P8/F13)") {
    val df = Seq(("created", "t", "x"), ("bogus", "", "y")).toDF("st", "title", "c")
    val r = df.select(
      TextFunctions.isValidStatus($"st"),
      TextFunctions.isValidTitle($"title"),
      TextFunctions.withinSizeLimit($"c")).collect()
    assert(r(0).getBoolean(0) && r(0).getBoolean(1) && r(0).getBoolean(2))
    assert(!r(1).getBoolean(0) && !r(1).getBoolean(1))
  }

  test("ISO format + epoch round-trip (F6/F7)") {
    val df = Seq(1700000000123L).toDF("ms")
    val r = df.select(
      TextFunctions.isoFormat(TextFunctions.fromEpochMillis($"ms")).as("iso"),
      TextFunctions.toEpochMillis(TextFunctions.fromEpochMillis($"ms")).as("back")).head
    assert(r.getString(0) === "2023-11-14T22:13:20.123000")
    assert(r.getLong(1) === 1700000000123L)
  }

  test("client-ip fallback chain (F16)") {
    val df = Seq((Some("1.2.3.4"), Some("h")), (None, Some("h")), (None: Option[String], None: Option[String]))
      .toDF("ip", "host")
    val r = df.select(TextFunctions.clientIp($"ip", $"host")).collect().map(_.getString(0))
    assert(r.toSeq === Seq("1.2.3.4", "h", "unknown"))
  }

  test("normalizeText collapses case, punctuation, and whitespace variants") {
    val df = Seq(
      "Hello,  World!",
      "hello world",
      "  HELLO --- world  ",
      "h3llo? w0rld"
    ).toDF("t")
    val r = df.select(TextFunctions.normalizeText($"t")).collect()
      .map(_.getString(0))
    assert(r(0) === "hello world")
    assert(r(1) === "hello world") // variants of the same prose agree
    assert(r(2) === "hello world")
    assert(r(3) === "h3llo w0rld") // digits survive
    // idempotent: normalizing a normalized string is a no-op
    val again = df.select(
      TextFunctions.normalizeText(TextFunctions.normalizeText($"t")))
      .collect().map(_.getString(0))
    assert(again.toSeq === r.toSeq)
  }

  test("content truncation caps scorer input (F2)") {
    val long = "x" * 5000
    val df = Seq(long).toDF("c")
    val r = df.select(length(TextFunctions.truncateContent($"c"))).head.getInt(0)
    assert(r === 1024)
  }
}

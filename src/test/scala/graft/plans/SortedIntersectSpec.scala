package graft.plans

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}
import graft.dedup.Dedup

class SortedIntersectSpec extends SparkSpec {
  import spark.implicits._

  test("native sorted-intersect size ≡ size(array_intersect) on corpus shingle sets") {
    val docs = Tables.documents(spark, sfDir).limit(60)
    val grams = docs.select($"doc_id",
      array_sort(Dedup.shingles($"text", 3)).as("g"))
    val pairs = grams.as("a").join(grams.as("b"),
        $"a.doc_id" < $"b.doc_id" && $"a.doc_id" % 5 === $"b.doc_id" % 5)
      .select(
        size(array_intersect($"a.g", $"b.g")).as("composed"),
        call_function(TextHashFunctions.SortedIntersectSizeName,
          $"a.g", $"b.g").as("native"))
      .collect()
    assert(pairs.nonEmpty)
    pairs.foreach(r => assert(r.getInt(0) === r.getInt(1)))
  }

  test("edge shapes: empty, disjoint, identical, subset, null element tail") {
    val rows = Seq(
      (Seq.empty[String], Seq("a", "b"), 0),
      (Seq("a", "b"), Seq.empty[String], 0),
      (Seq("a", "c"), Seq("b", "d"), 0),
      (Seq("a", "b", "c"), Seq("a", "b", "c"), 3),
      (Seq("b", "c"), Seq("a", "b", "c", "d"), 2),
      // unicode + prefix-vs-longer ordering
      (Seq("a", "aa", "é"), Seq("aa", "ab", "é"), 2))
      .toDF("x", "y", "expect")
    rows.select(call_function(TextHashFunctions.SortedIntersectSizeName,
        $"x", $"y").as("n"), $"expect")
      .collect()
      .foreach(r => assert(r.getInt(0) === r.getInt(1)))
    // null ARRAY input → null out (binary expression null contract)
    val nullIn = Seq((Some(Seq("a")), Option.empty[Seq[String]]))
      .toDF("x", "y")
      .select(call_function(TextHashFunctions.SortedIntersectSizeName,
        $"x", $"y"))
      .head
    assert(nullIn.isNullAt(0))
  }

  test("containment verify uses the native merge when registered") {
    val docs = Tables.documents(spark, sfDir).limit(40)
    val plan = Dedup.containmentNearDuplicates(docs, "doc_id", "text",
      hashMode = "md5").queryExecution.analyzed.toString
    // the analyzed plan prints the expression's prettyName
    assert(plan.contains("sortedintersectsize"))
    assert(!plan.contains("array_intersect"))
  }
}

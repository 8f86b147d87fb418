package graft.functions

import graft.SparkSpec
import graft.functions.WinnowFingerprints.winnowFingerprints
import org.apache.spark.sql.functions._

class WinnowSpec extends SparkSpec {
  import spark.implicits._

  test("identical texts share all fingerprints; disjoint share none") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "zzzz yyyy xxxx wwww vvvv uuuu tttt ssss rrrr")).toDF("id", "text")
    val fp = df.select($"id", winnowFingerprints($"text").as("fp"))
    val m = fp.as[(Long, Seq[Long])].collect().toMap
    assert(m(1L) == m(2L))
    assert(m(1L).intersect(m(3L)).isEmpty)
  }

  test("long shared substring guarantees a common fingerprint (winnowing property)") {
    val shared = "communal text segment that is long enough to span windows"
    val a = "prefix one two three " + shared
    val b = shared + " completely different suffix follows here"
    val df = Seq((1L, a), (2L, b)).toDF("id", "text")
    val m = df.select($"id", winnowFingerprints($"text", 5, 4).as("fp"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(m(1L).intersect(m(2L)).nonEmpty)
  }

  test("short strings still fingerprint") {
    val m = Seq((1L, "ab")).toDF("id", "text")
      .select($"id", winnowFingerprints($"text").as("fp"))
      .as[(Long, Seq[Long])].head()
    assert(m._2.length == 1)
  }

  test("containment dedup over real documents: self-containment is total") {
    val docs = graft.Tables(spark, sf("")).documents.limit(20)
    val fp = docs.select($"doc_id", winnowFingerprints(lower($"text")).as("fp"))
    val joined = fp.as("a").join(fp.as("b"), $"a.doc_id" === $"b.doc_id")
      .select(size(array_intersect($"a.fp", $"b.fp")).as("common"), size($"a.fp").as("n"))
    assert(joined.filter($"common" =!= $"n").count() == 0)
  }
}

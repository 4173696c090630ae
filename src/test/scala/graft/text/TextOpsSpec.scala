package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Pins the one-pass langScore (`count(t ∈ stopwords)`) to the per-word-sum
  * form the oracle SQL renders — they must agree token-for-token, including
  * adjacent/repeated stopwords and empty-string tokens from double spaces. */
class TextOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def sumForm(text: org.apache.spark.sql.Column, lang: String) =
    TextOps.stopwords.toMap.apply(lang)
      .map(w => TextOps.wordHits(text, w)).reduce(_ + _)

  test("langScore one-pass == per-word sum on adversarial token shapes") {
    val docs = Seq(
      "the the the a and of to",       // repeated stopwords
      "the  a",                        // double space → empty token
      "",                              // empty doc
      "theater a-nd of, to",           // near-miss tokens must not count
      "el la de que y der die das le", // cross-language mixtures
      "a the a the a the",
      "und ist der die das le les des et une"
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    TextOps.stopwords.map(_._1).foreach { lang =>
      val rows = docs.select(
        TextOps.langScore(col("text"), lang).as("one_pass"),
        sumForm(col("text"), lang).as("summed")).collect()
      rows.foreach(r => assert(r.getLong(0) == r.getLong(1),
        s"lang=$lang: one-pass ${r.getLong(0)} != summed ${r.getLong(1)}"))
    }
  }

  test("langId picks argmax with list-order ties and und on all-zero") {
    val docs = Seq(
      (1L, "the a and of to"),     // en
      (2L, "el la de que y"),      // es
      (3L, "xyzzy plugh"),         // und
      (4L, "the el")               // tie en/es → en (list order)
    ).toDF("doc_id", "text")
    val got = docs.select(col("doc_id"), TextOps.langId(col("text")).as("l"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "en", 2L -> "es", 3L -> "und", 4L -> "en"))
  }
}

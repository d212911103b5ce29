package graft

import org.apache.spark.sql.functions.col

import graft.text.Text

class TextSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("t").select(c.as("r")).collect().head.getAs[T]("r")

  test("token counts") {
    assert(one[Int](Text.tokenCount(col("t")), "The quick  brown fox") == 4)
    // hello | , | world | 4 | 2
    assert(one[Int](Text.bpeCount(col("t")), "hello, world 42") == 5)
  }

  test("fingerprint is whitespace/case invariant; rolling hash is order-sensitive") {
    val a = one[String](Text.fingerprint(col("t")), "Hello   World")
    val b = one[String](Text.fingerprint(col("t")), "hello world ")
    assert(a == b)
    val h1 = one[Long](Text.rollingHash(col("t")), "alpha beta")
    val h2 = one[Long](Text.rollingHash(col("t")), "beta alpha")
    assert(h1 != h2)
    assert(h1 >= 0 && h1 < 1000000007L)
  }

  test("scrubPii replaces emails then long digit runs, counts match") {
    val rows = Seq(
      (1L, "mail bob.smith+x@example.org or call 5551234567 now"),
      (2L, "no pii here, just 123 and 42"),
      (3L, "two mails a@b.co c@d.io and 99999999")
    ).toDF("doc_id", "text")
      .select(col("doc_id"), graft.text.Text.scrubPii(col("text")).as("s"),
        graft.text.Text.emailCount(col("text")).as("ne"),
        graft.text.Text.longNumberCount(col("text")).as("nn"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3)))).toMap
    assert(rows(1L) == (("mail <EMAIL> or call <NUM> now", 1, 1)))
    assert(rows(2L) == (("no pii here, just 123 and 42", 0, 0)))
    assert(rows(3L) == (("two mails <EMAIL> <EMAIL> and <NUM>", 2, 1)))
  }

  test("quality score stays in [0,1] and ranks clean text above noise") {
    val clean = one[Double](Text.qualityScore(col("t")),
      "The house was on the hill and it was a good day for a walk in the park.")
    val noise = one[Double](Text.qualityScore(col("t")), "!!!;;;...???")
    assert(clean >= 0 && clean <= 1 && noise >= 0 && noise <= 1)
    assert(clean > noise)
  }

  test("langId picks the profile with most stopword hits") {
    assert(one[String](Text.langId(col("t")),
      "le chat est dans la maison et il est pour les amis") == "fr")
    assert(one[String](Text.langId(col("t")),
      "der hund ist ein freund und das ist gut") == "de")
    assert(one[String](Text.langId(col("t")), "zzz qqq") == "und")
  }

  test("repetition signals: loops score high, varied text scores low") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spam spam spam spam spam spam"),
      (2L, "buy now buy now buy now buy now"),
      (3L, "a genuinely varied sentence with distinct interesting words"),
      (4L, "single")
    ).toDF("doc_id", "text")
    val r = Text.repetitionTable(docs).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(2), x.getDouble(3)))
      .toMap
    // 6 "spam" tokens: dup 5/6, every bigram identical
    assert(r(1L)._1 == 6L)
    assert(math.abs(r(1L)._2 - 5.0 / 6.0) < 1e-12)
    assert(r(1L)._3 == 1.0)
    // "buy now" ×4: dup 6/8; top bigram "buy now" fills 4 of 7 slots
    assert(math.abs(r(2L)._2 - 6.0 / 8.0) < 1e-12)
    assert(math.abs(r(2L)._3 - 4.0 / 7.0) < 1e-12)
    // all-distinct text: zero dup fraction, every bigram unique
    assert(r(3L)._2 == 0.0)
    assert(math.abs(r(3L)._3 - 1.0 / 7.0) < 1e-12)
    // single-token doc: no bigram slots → 0 by convention
    assert(r(4L) == ((1L, 0.0, 0.0)))
  }
}

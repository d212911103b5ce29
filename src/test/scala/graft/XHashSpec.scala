package graft

import org.apache.spark.sql.functions._

import graft.functions.XHash

class XHashSpec extends SparkSpec {
  import spark.implicits._

  private lazy val samples = Seq("", "a", "abc", "hello world",
    "the quick brown fox", "héllo ünïcode ✓", "1234567890",
    "a slightly longer string with several words in it").toDF("s")

  test("native Md5Pair h60/h56 match the conv(md5-hex) reference bit-for-bit") {
    val rows = samples.select(
      XHash.h60(col("s")).as("h60"), XHash.h60Ref(col("s")).as("r60"),
      XHash.h56(col("s")).as("h56"), XHash.h56Ref(col("s")).as("r56"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(0) == r.getLong(1), s"h60 mismatch: $r")
      assert(r.getLong(2) == r.getLong(3), s"h56 mismatch: $r")
    }
  }

  test("h60/h56 ranges: non-negative, within 60/56 bits") {
    val rows = samples.select(XHash.h60(col("s")), XHash.h56(col("s"))).collect()
    rows.foreach { r =>
      assert(r.getLong(0) >= 0 && r.getLong(0) < (1L << 60))
      assert(r.getLong(1) >= 0 && r.getLong(1) < (1L << 56))
    }
  }

  test("member family: member(0) == h1, members differ, stay in 60-bit range") {
    val rows = samples.select(XHash.h60(col("s")).as("h1"),
      XHash.h56(col("s")).as("h2")).collect()
    rows.foreach { r =>
      val (h1, h2) = (r.getLong(0), r.getLong(1))
      val members = (0 until 32).map(i => (h1 + h2 * i) & XHash.Mask60)
      assert(members.head == h1)
      assert(members.forall(m => m >= 0 && m <= XHash.Mask60))
      if (h2 != 0) assert(members.distinct.size == members.size)
    }
  }

  test("binary input hashes the same bytes as string input") {
    val rows = Seq("payload bytes").toDF("s")
      .select(XHash.h60(col("s")).as("a"),
        XHash.h60(encode(col("s"), "UTF-8")).as("b")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }
}

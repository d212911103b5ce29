package graft

import org.apache.spark.sql.functions._

import graft.plans.ScaleJoins

/** Skew salting + bucketed co-located joins (SURVEY.md §4). */
class ScaleJoinsSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join on skewed data") {
    // 90% of fact rows share one hot key
    val big = spark.range(0, 10000)
      .select((when(col("id") % 10 =!= 0, lit(1L)).otherwise(col("id") % 100))
        .as("k"), col("id").as("v"))
    val small = Seq((1L, "hot"), (0L, "zero"), (20L, "x"), (30L, "y"))
      .toDF("k", "name")
    val plain = big.join(small, Seq("k")).select("k", "v", "name")
      .collect().map(_.toSeq).toSet
    val salted = ScaleJoins.saltedJoin(big, small, "k", salts = 8)
      .select("k", "v", "name").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(plain.size == 9000 + big.where(col("k") === 0 || col("k") === 20 ||
      col("k") === 30).count().toInt)
  }

  test("asofJoin: latest right row at-or-before each left row, per key") {
    // key 1: rights at t=10,20,20,30 — tie at 20 resolved by tieBreak v
    val left = Seq((1L, 5L, "a"), (1L, 20L, "b"), (1L, 25L, "c"),
      (1L, 40L, "d"), (2L, 10L, "e")).toDF("k", "t", "tag")
    val right = Seq((1L, 10L, "r10"), (1L, 20L, "r20a"), (1L, 20L, "r20b"),
      (1L, 30L, "r30"), (3L, 1L, "zzz")).toDF("k", "t", "v")
    val out = ScaleJoins.asofJoin(left, right, "k", "t",
        rightCols = Seq("t", "v"), tieBreak = Seq("v"))
      .select("tag", "asof_t", "asof_v")
      .collect().map(r => r.getString(0) ->
        (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(out("a") == (None, None))          // nothing precedes t=5
    assert(out("b") == (Some(20L), Some("r20b"))) // same-t visible; max tieBreak
    assert(out("c") == (Some(20L), Some("r20b")))
    assert(out("d") == (Some(30L), Some("r30")))
    assert(out("e") == (None, None))          // key 2 has no right rows
    // no cartesian anywhere in the plan (the naive theta-join shape)
    val plan = ScaleJoins.asofJoin(left, right, "k", "t", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian") && !plan.contains("NestedLoop"))
  }

  test("asofJoin: a genuine NULL in the matched right row survives (no torn rows)") {
    // right at t=20 has v NULL but w set; a per-column carry would
    // resurrect v="r10" from the OLDER t=10 row while w comes from t=20 —
    // mixing two right rows. The struct carry must keep the t=20 row
    // whole: v null, w "w20".
    val left = Seq((1L, 25L, "x")).toDF("k", "t", "tag")
    val right = Seq((1L, 10L, Some("r10"), "w10"),
      (1L, 20L, None: Option[String], "w20")).toDF("k", "t", "v", "w")
    val row = ScaleJoins.asofJoin(left, right, "k", "t", Seq("t", "v", "w"))
      .select("asof_t", "asof_v", "asof_w").collect().head
    assert(row.getLong(0) == 20L)
    assert(row.isNullAt(1), "genuine NULL must survive, not resurrect r10")
    assert(row.getString(2) == "w20")
  }

  test("bucketed tables join without a shuffle") {
    // a previous JVM's managed-table locations are invisible to this
    // session's fresh in-memory catalog — clear them
    val wh = new java.net.URI(
      spark.conf.get("spark.sql.warehouse.dir")).getPath
    for (t <- Seq("t_orders_b", "t_cust_b")) {
      val dir = new java.io.File(s"$wh/$t")
      if (dir.exists()) {
        dir.listFiles().foreach(_.delete()); dir.delete()
      }
    }
    val o = Sources("orders"); val c = Sources("customer")
    ScaleJoins.writeBucketed(o.select("o_orderkey", "o_custkey", "o_totalprice"),
      "t_orders_b", "o_custkey", 8)
    ScaleJoins.writeBucketed(c.select(col("c_custkey").as("o_custkey"), col("c_name")),
      "t_cust_b", "o_custkey", 8)
    // MERGE hint: at test scale the planner would broadcast (also
    // shuffle-free, but trivially); the 100 TB case is two big tables,
    // where bucket co-location must eliminate the shuffle of a
    // sort-merge join.
    val joined = ScaleJoins.readBucketed(spark, "t_orders_b")
      .join(ScaleJoins.readBucketed(spark, "t_cust_b").hint("MERGE"),
        Seq("o_custkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketing should have removed the shuffle:\n$plan")
    assert(joined.count() > 0)
  }

  test("binned range join == naive inequality join, boundaries exact") {
    import spark.implicits._
    val w = 100L
    // probe times hit bin boundaries exactly (200, 300) and mid-bin;
    // build times include t-w (in), t (out), t-w-1 (out), same-bin and
    // previous-bin interior points
    val probe = Seq((1L, 200L), (2L, 250L), (3L, 300L), (4L, 57L))
      .toDF("pid", "pt")
    val build = Seq(100L, 150L, 199L, 200L, 249L, 250L, 299L, 300L, 301L, 0L)
      .map(Tuple1(_)).toDF("bt")
    val got = ScaleJoins.binnedRangeJoin(probe, "pt", build, "bt", w)
      .select("pid", "bt").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted.toSeq
    val want = (for {
      (pid, pt) <- Seq((1L, 200L), (2L, 250L), (3L, 300L), (4L, 57L))
      bt <- Seq(100L, 150L, 199L, 200L, 249L, 250L, 299L, 300L, 301L, 0L)
      if bt >= pt - w && bt < pt
    } yield (pid, bt)).sorted
    assert(got == want)
    // and the plan is an equi hash/merge join, not a nested loop
    val plan = ScaleJoins.binnedRangeJoin(probe, "pt", build, "bt", w)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"range join must stay equi-shaped:\n$plan")
  }

  test("binned range join: negative times bin with floor semantics") {
    import spark.implicits._
    // `div` truncates toward zero, which would put -50 and 50 in the
    // same bin 0 and silently drop cross-zero matches; floor binning
    // keeps the two-consecutive-bins covering argument for all longs.
    val w = 100L
    val probes = Seq((1L, -200L), (2L, -150L), (3L, 0L), (4L, 50L))
    val builds = Seq(-300L, -251L, -250L, -201L, -200L, -101L, -100L,
      -51L, -50L, -1L, 0L, 49L)
    val got = ScaleJoins.binnedRangeJoin(
        probes.toDF("pid", "pt"), "pt",
        builds.map(Tuple1(_)).toDF("bt"), "bt", w)
      .select("pid", "bt").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted.toSeq
    val want = (for {
      (pid, pt) <- probes; bt <- builds
      if bt >= pt - w && bt < pt
    } yield (pid, bt)).sorted
    assert(got == want)
  }

  private def Sources(name: String) =
    graft.sources.Sources.table(spark, sf001, name)
}

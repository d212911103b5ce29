package graft

import graft.filter.{And, Cmp, Krill, Or}

/** Krill predicate parsing + the drop-on-missing-field semantics
  * (reference: lib/krill-skinner-stream.js:40-60). */
class KrillSpec extends SparkSpec {
  import spark.implicits._

  test("parse comparison and boolean ops") {
    assert(Krill.parse("""{"eq": ["m", "GET"]}""") == Cmp("eq", "m", "GET"))
    assert(Krill.parse("""{"and": [{"ge": ["c", 500]}, {"lt": ["l", 100]}]}""") ==
      And(Seq(Cmp("ge", "c", 500L), Cmp("lt", "l", 100L))))
    assert(Krill.parse("""{"or": [{"ne": ["m", "GET"]}, {"le": ["l", 1.5]}]}""") ==
      Or(Seq(Cmp("ne", "m", "GET"), Cmp("le", "l", 1.5))))
  }

  test("trivial predicate {} is always true; bad JSON throws GraftException") {
    // node-krill's empty filter (reference: tst.config.sh updates a
    // datasource with --filter={})
    assert(Krill.parse("{}") == graft.filter.True)
    assert(Krill.parse("{}").toSql(identity) == "TRUE")
    assert(Krill.parse("{}").fields.isEmpty)
    val df = spark.range(3).toDF("x")
    assert(df.where(Krill.parse("{}").toColumn(
      org.apache.spark.sql.functions.col)).count() == 3)
    assertThrows[GraftException](Krill.parse("{"))
    assertThrows[GraftException](Krill.parse("not json at all"))
  }

  test("malformed predicates throw") {
    assertThrows[GraftException](Krill.parse("""{"between": ["a", 1]}"""))
    assertThrows[GraftException](Krill.parse("""{"eq": ["a"]}"""))
    assertThrows[GraftException](Krill.parse("""{"and": []}"""))
    assertThrows[GraftException](Krill.parse("""{"eq": ["a", 1], "ne": ["b", 2]}"""))
  }

  test("rows with NULL in a referenced field are dropped, not matched") {
    val df = Seq(
      (Some(200), "GET"), (Some(500), "PUT"), (None, "GET")
    ).toDF("code", "method")
    // ne 500 must NOT keep the NULL row (dragnet drops missing fields)
    val kept = df.where(Krill.parse("""{"ne": ["code", 500]}""").toColumn(df.col))
      .collect().map(_.getString(1))
    assert(kept.toSeq == Seq("GET") || kept.length == 1)
  }

  test("toSql matches Spark evaluation on a sample") {
    val p = Krill.parse(
      """{"or": [{"and": [{"ge": ["c", 2]}, {"lt": ["c", 4]}]}, {"eq": ["m", "x'y"]}]}""")
    assert(p.toSql(identity) ==
      "(((c >= 2) AND (c < 4)) OR (m = 'x''y'))")
    assert(p.fields == Set("c", "m"))
  }
}

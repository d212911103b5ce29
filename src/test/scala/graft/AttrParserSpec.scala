package graft

import org.scalatest.funsuite.AnyFunSuite

/** Grammar parity with the reference's attr-parser (lib/attr-parser.js,
  * tests/attr/tst.parser.js shapes). */
class AttrParserSpec extends AnyFunSuite {

  test("plain fields") {
    assert(AttrParser.parse("host") == Seq(FieldSpec("host", "host")))
    assert(AttrParser.parse("a,b") ==
      Seq(FieldSpec("a", "a"), FieldSpec("b", "b")))
  }

  test("bracketed attributes") {
    assert(AttrParser.parse("latency[aggr=quantize]") ==
      Seq(FieldSpec("latency", "latency", aggr = Some("quantize"))))
    assert(AttrParser.parse("ts[date,field=time,aggr=lquantize,step=86400]") ==
      Seq(FieldSpec("ts", "time", isDate = true,
        aggr = Some("lquantize"), step = Some(86400.0))))
  }

  test("mixed list preserves order") {
    val fs = AttrParser.parse("req.method,latency[aggr=quantize],host")
    assert(fs.map(_.name) == Seq("req.method", "latency", "host"))
    assert(fs(1).aggr.contains("quantize"))
  }

  test("valueless attribute means flag") {
    assert(AttrParser.parse("t[date]").head.isDate)
  }

  test("malformed input throws") {
    assertThrows[GraftException](AttrParser.parse("x[unclosed"))
    assertThrows[GraftException](AttrParser.parse("[aggr=quantize]"))
    assertThrows[GraftException](AttrParser.parse("x[step=abc,aggr=lquantize]"))
    assertThrows[GraftException](AttrParser.parse("x[step=-5,aggr=lquantize]"))
  }

  test("lquantize without step rejected by FieldSpec") {
    assertThrows[IllegalArgumentException](
      FieldSpec("x", "x", aggr = Some("lquantize")))
    assertThrows[IllegalArgumentException](
      FieldSpec("x", "x", aggr = Some("avg")))
  }
}

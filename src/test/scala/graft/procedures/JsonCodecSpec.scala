package graft.procedures

import org.scalatest.funsuite.AnyFunSuite

/** Pins the JSON number-typing contract of the gnn/tgn import codec:
  * integral literals round-trip as Long (so integer node properties
  * survive a pyg/tf export-import), fractional/exponent literals as
  * Double, and mixed numeric columns promote to DoubleType with
  * row-level widening. */
class JsonCodecSpec extends AnyFunSuite {

  test("integral literals parse as Long, fractional as Double") {
    assert(JsonCodec.parse("7") == 7L)
    assert(JsonCodec.parse("-42") == -42L)
    assert(JsonCodec.parse("7.0") == 7.0)
    assert(JsonCodec.parse("1e3") == 1000.0)
    assert(JsonCodec.parse("2.5E-1") == 0.25)
    // beyond Long range falls back to Double rather than failing
    assert(JsonCodec.parse("99999999999999999999") == 1e20)
  }

  test("nested structures preserve number types") {
    val v = JsonCodec.parse("""{"y":[7,8,9],"x":[[1.5,2],[3,4.5]]}""")
      .asInstanceOf[Map[String, Any]]
    assert(v("y") == Vector(7L, 8L, 9L))
    assert(v("x") == Vector(Vector(1.5, 2L), Vector(3L, 4.5)))
  }

  test("write/parse round-trip keeps Long vs Double distinct") {
    val in = Map("a" -> 7L, "b" -> 7.5, "c" -> List(1L, 2L))
    val out = JsonCodec.parse(JsonCodec.write(in))
      .asInstanceOf[Map[String, Any]]
    assert(out("a") == 7L)
    assert(out("b") == 7.5)
    assert(out("c") == Vector(1L, 2L))
  }

  test("sparkTypeOf promotes mixed numeric columns to DoubleType") {
    import org.apache.spark.sql.types._
    assert(JsonCodec.sparkTypeOf(Seq(1L, 2L)) == LongType)
    assert(JsonCodec.sparkTypeOf(Seq(1L, 2.5)) == DoubleType)
    assert(JsonCodec.sparkTypeOf(Seq(2.5, 1L)) == DoubleType)
    assert(JsonCodec.sparkTypeOf(Seq(Vector(1L), Vector(2.5))) ==
      ArrayType(DoubleType))
  }

  test("coerceTo widens Longs when the column resolved to DoubleType") {
    import org.apache.spark.sql.types._
    assert(JsonCodec.coerceTo(1L, DoubleType) == 1.0)
    assert(JsonCodec.coerceTo(1.5, DoubleType) == 1.5)
    assert(JsonCodec.coerceTo(3L, LongType) == 3L)
    assert(JsonCodec.coerceTo(Vector(1L, 2.5), ArrayType(DoubleType)) ==
      Vector(1.0, 2.5))
    assert(JsonCodec.coerceTo(null, DoubleType) == null)
  }
}

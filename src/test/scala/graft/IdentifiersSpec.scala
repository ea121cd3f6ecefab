package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.util.Identifiers

class IdentifiersSpec extends AnyFunSuite {

  private def check(p: Prop): Unit =
    assert(SCTest.check(SCTest.Parameters.default, p).passed)

  test("examples from the reference convention") {
    assert(Identifiers.clean("Customer Sold-To Name") == "customer_sold_to_name")
    assert(Identifiers.clean("Group") == "group_col")      // reserved word
    assert(Identifiers.clean("Weight (Tonnes)") == "weight_tonnes")
    assert(Identifiers.clean("Región Key!") == "region_key") // accent strip
    assert(Identifiers.clean("123abc") == "c_123abc")      // digit prefix
    assert(Identifiers.clean("") == "col")                 // total on empty
    assert(Identifiers.clean("!!!") == "col")
  }

  test("collision dedup is order-stable") {
    assert(Identifiers.cleanAll(Seq("A B", "a_b", "a.b")) ==
      Seq("a_b", "a_b_2", "a_b_3"))
  }

  test("idempotent: clean(clean(x)) == clean(x)") {
    check(Prop.forAll(Gen.asciiPrintableStr) { s =>
      val once = Identifiers.clean(s)
      Identifiers.clean(once) == once
    })
  }

  test("output is always a valid lowercase identifier") {
    check(Prop.forAll { (s: String) =>
      val c = Identifiers.clean(s)
      c.nonEmpty && c.matches("[a-z][a-z0-9_]*")
    })
  }
}

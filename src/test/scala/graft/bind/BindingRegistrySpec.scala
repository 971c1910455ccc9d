package graft.bind

import graft.queries.TranscodeE2E
import org.scalatest.funsuite.AnyFunSuite

/** Registry semantics vs the reference
  * (message_binding_registry.go:14-70): explicit lists, option-driven
  * autobind with in-order catalog search, hard errors for missing
  * types/tables, and overwrite on re-bind.
  */
class BindingRegistrySpec extends AnyFunSuite {
  import BindingRegistry._

  private val msg = TranscodeE2E.message // bristle_table = default.example_table
  private val table = TranscodeE2E.table
  private val messages = Map(msg.fullName -> msg)

  test("autobind finds the table in catalog order and binds") {
    val cats = Seq(
      Catalog("empty", Map("other_table" -> table)),
      Catalog("main", Map("default.example_table" -> table)))
    val reg = autobind(cats, messages)
    assert(reg.keySet == Set(msg.fullName))
    assert(reg(msg.fullName).columns == table)
  }

  test("autobind skips option-less messages") {
    val bare = msg.copy(bristleTable = None)
    val reg = autobind(
      Seq(Catalog("main", Map("default.example_table" -> table))),
      Map(bare.fullName -> bare))
    assert(reg.isEmpty)
  }

  test("autobind hard-fails when no catalog has the table") {
    val e = intercept[BindError] {
      autobind(Seq(Catalog("main", Map("other" -> table))), messages)
    }
    assert(e.getMessage.contains("failed to find table default.example_table"))
  }

  test("autobind propagates a bind failure once the table is located") {
    // a sink column the message has no field for → bind-time error,
    // not a fall-through to the next catalog (which DOES have a
    // bindable copy — the reference only retries on ErrNoSuchTable)
    val broken = table :+ ChColumn("missing_col", 8, "Int32")
    val cats = Seq(
      Catalog("first", Map("default.example_table" -> broken)),
      Catalog("second", Map("default.example_table" -> table)))
    intercept[BindError] { autobind(cats, messages) }
  }

  test("explicit bind rejects unregistered message names") {
    val e = intercept[BindError] {
      bindExplicit(Seq(Catalog("main", Map("t" -> table))), messages,
        Map(("main", "t") -> Seq("NoSuchMessage")))
    }
    assert(e.getMessage.contains("'NoSuchMessage' is not registered"))
  }

  test("explicit bind rejects unknown catalog and table references") {
    val cats = Seq(Catalog("main", Map("t" -> table)))
    val e1 = intercept[BindError] {
      bindExplicit(cats, messages, Map(("main", "nope") -> Seq(msg.fullName)))
    }
    assert(e1.getMessage.contains("unknown table 'nope'"))
    val e2 = intercept[BindError] {
      bindExplicit(cats, messages, Map(("ghost", "t") -> Seq(msg.fullName)))
    }
    assert(e2.getMessage.contains("unknown catalog 'ghost'"))
  }

  test("bindAll: explicit first, autobind overwrites same-name binds") {
    // same bindable schema under another table name, distinguishable
    // by column metadata (the binder requires every field↔column pair
    // both ways, so a narrower table cannot stand in)
    val alt = table.map(c => c.copy(default = "ALT"))
    val cats = Seq(Catalog("main", Map(
      "default.example_table" -> table, "alt_table" -> alt)))
    val reg = bindAll(cats, messages,
      Map(("main", "alt_table") -> Seq(msg.fullName)))
    // autobind ran after the explicit bind and overwrote it
    assert(reg(msg.fullName).columns == table)
    // explicit alone binds the alt table
    val explicitOnly = bindExplicit(cats, messages,
      Map(("main", "alt_table") -> Seq(msg.fullName)))
    assert(explicitOnly(msg.fullName).columns == alt)
  }
}

package graft.proto

import graft.queries.TranscodeE2E
import org.scalatest.funsuite.AnyFunSuite

/** DescriptorSet loader vs a FileDescriptorSet fixture equivalent to
  * `protoc --descriptor_set_out` over the reference's example.proto +
  * google/protobuf/timestamp.proto (reference examples/example.proto:1-21).
  * The fixture is encoded right here with the Wire writer, per the
  * public descriptor.proto schema — field numbers in comments.
  */
class DescriptorSetSpec extends AnyFunSuite {

  // -- tiny descriptor-encoding DSL -----------------------------------
  private def msg(build: Wire.Writer => Unit): Array[Byte] = {
    val w = new Wire.Writer; build(w); w.toBytes
  }
  private def sub(w: Wire.Writer, num: Int, body: Array[Byte]): Unit = {
    w.writeTag(num, 2); w.writeBytes(body)
  }
  private def str(w: Wire.Writer, num: Int, s: String): Unit = {
    w.writeTag(num, 2); w.writeBytes(s.getBytes("UTF-8"))
  }
  private def vint(w: Wire.Writer, num: Int, v: Long): Unit = {
    w.writeTag(num, 0); w.writeVarint(v)
  }

  /** FieldDescriptorProto: name=1, number=3, label=4, type=5,
    * type_name=6, options=8.
    */
  private def field(name: String, number: Int, ftype: Int,
      label: Int = 1, typeName: String = "",
      column: Option[String] = None): Array[Byte] = msg { w =>
    str(w, 1, name); vint(w, 3, number); vint(w, 4, label); vint(w, 5, ftype)
    if (typeName.nonEmpty) str(w, 6, typeName)
    column.foreach(c => sub(w, 8, msg(o => str(o, 50001, c))))
  }

  private def enumDesc(name: String, values: (String, Int)*): Array[Byte] =
    msg { w =>
      str(w, 1, name)
      values.foreach { case (n, num) =>
        sub(w, 2, msg(v => { str(v, 1, n); vint(v, 2, num) }))
      }
    }

  /** The timestamp.proto file descriptor. */
  private val timestampFile = msg { w =>
    str(w, 1, "google/protobuf/timestamp.proto")
    str(w, 2, "google.protobuf")
    sub(w, 4, msg { m => // DescriptorProto Timestamp
      str(m, 1, "Timestamp")
      sub(m, 2, field("seconds", 1, 3)) // int64
      sub(m, 2, field("nanos", 2, 5)) // int32
    })
  }

  /** The example.proto file descriptor (no package). */
  private val exampleFile = msg { w =>
    str(w, 1, "example.proto")
    sub(w, 5, enumDesc("MessageType", "EMPTY" -> 0, "SMALL" -> 1, "BIG" -> 2))
    sub(w, 4, msg { m =>
      str(m, 1, "ExampleMessage")
      sub(m, 2, field("name", 1, 9))
      sub(m, 2, field("type", 2, 14, typeName = ".MessageType"))
      sub(m, 2, field("timestamp", 3, 11,
        typeName = ".google.protobuf.Timestamp"))
      sub(m, 2, field("value", 4, 3))
      sub(m, 2, field("tags", 5, 11, label = 3,
        typeName = ".ExampleMessage.TagsEntry"))
      sub(m, 2, field("labels", 6, 9, label = 3))
      sub(m, 3, msg { n => // nested TagsEntry, map_entry=true
        str(n, 1, "TagsEntry")
        sub(n, 2, field("key", 1, 9))
        sub(n, 2, field("value", 2, 9))
        sub(n, 7, msg(o => vint(o, 7, 1))) // MessageOptions.map_entry
      })
      sub(m, 7, msg(o => str(o, 50001, "default.example_table")))
    })
  }

  private val fileSet = msg { w =>
    sub(w, 1, timestampFile)
    sub(w, 1, exampleFile)
  }

  test("checked-in example.pb matches this spec's encoding") {
    val res = getClass.getResourceAsStream("/descriptors/example.pb")
    assert(res != null, "src/main/resources/descriptors/example.pb missing")
    val bytes = res.readAllBytes()
    assert(java.util.Arrays.equals(bytes, fileSet),
      "regenerate the fixture if the spec's descriptor encoding changed")
  }

  /** Independently hand-built expectation (TranscodeE2E.message itself
    * now comes from the loader, so this must not reference it).
    */
  private val expected: PMessage = PMessage(
    "ExampleMessage",
    Seq(
      PField("name", 1, PType.PString),
      PField("type", 2, PType.PEnum("MessageType",
        Seq("EMPTY" -> 0, "SMALL" -> 1, "BIG" -> 2))),
      PField("timestamp", 3, PType.PMessageT(PMessage(
        "google.protobuf.Timestamp",
        Seq(PField("seconds", 1, PType.PInt64),
          PField("nanos", 2, PType.PInt32))))),
      PField("value", 4, PType.PInt64),
      PField("tags", 5, PType.PString,
        mapOf = Some((PType.PString, PType.PString))),
      PField("labels", 6, PType.PString, repeated = true)),
    bristleTable = Some("default.example_table"))

  test("example.proto descriptor resolves to the hand-built PMessage") {
    val loaded = DescriptorSet.load(fileSet)
    assert(loaded.contains("ExampleMessage"))
    assert(loaded.contains("google.protobuf.Timestamp"))
    assert(!loaded.keys.exists(_.contains("TagsEntry")), "map entries are not types")
    assert(loaded("ExampleMessage") == expected)
    assert(TranscodeE2E.message == expected) // the query surface uses the loader
  }

  test("descriptor-loaded schema decodes real wire bytes identically") {
    val m = DescriptorSet.load(fileSet)("ExampleMessage")
    TranscodeE2E.fixtures.take(8).foreach { f =>
      val bytes = ProtoRows.encodeValues(TranscodeE2E.message, f.protoValues)
      assert(ProtoRows.decodeValues(m, bytes).toSeq == f.protoValues)
    }
  }

  test("bristle_column field option is honored") {
    val set = msg { w =>
      sub(w, 1, msg { fw =>
        str(fw, 1, "t.proto")
        sub(fw, 4, msg { m =>
          str(m, 1, "T")
          sub(m, 2, field("f", 1, 9, column = Some("renamed_col")))
        })
      })
    }
    val t = DescriptorSet.load(set)("T")
    assert(t.fields.head.bristleColumn.contains("renamed_col"))
  }

  test("unresolved type name fails loudly") {
    val set = msg { w =>
      sub(w, 1, msg { fw =>
        str(fw, 1, "t.proto")
        sub(fw, 4, msg { m =>
          str(m, 1, "T")
          sub(m, 2, field("f", 1, 11, typeName = ".Missing"))
        })
      })
    }
    assertThrows[Wire.MalformedProto](DescriptorSet.load(set))
  }

  test("recursive message types are rejected, not looped") {
    val set = msg { w =>
      sub(w, 1, msg { fw =>
        str(fw, 1, "r.proto")
        sub(fw, 4, msg { m =>
          str(m, 1, "Node")
          sub(m, 2, field("next", 1, 11, typeName = ".Node"))
        })
      })
    }
    assertThrows[Wire.MalformedProto](DescriptorSet.load(set))
  }
}

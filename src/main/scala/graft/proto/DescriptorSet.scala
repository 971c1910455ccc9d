package graft.proto

import scala.collection.mutable

/** Runtime loader for serialized `FileDescriptorSet` files — our
  * analog of the reference's descriptor registry
  * (proto_registry.go:45-103), which walks `*.pb` artifacts produced
  * by `protoc --descriptor_set_out` and registers every message type.
  *
  * The descriptor wire format is itself protobuf
  * (google/protobuf/descriptor.proto, a public spec); it is parsed
  * here with the same [[Wire]] reader the data path uses, so the
  * loader adds no protobuf-runtime dependency. Only the descriptor
  * surface the binder needs is modeled: messages, fields, enums,
  * map entries, and the bristle options
  * (`bristle_table` MessageOptions ext 50001, `bristle_column`
  * FieldOptions ext 50001 — reference bristle.proto:8-12).
  */
object DescriptorSet {

  // ------------------------------------------------------ raw model

  private final case class RawEnum(name: String, values: Seq[(String, Int)])
  private final case class RawField(name: String, number: Int, label: Int,
      ftype: Int, typeName: String, bristleColumn: Option[String])
  private final case class RawMessage(name: String, fields: Seq[RawField],
      nested: Seq[RawMessage], enums: Seq[RawEnum], mapEntry: Boolean,
      bristleTable: Option[String])
  private final case class RawFile(name: String, pkg: String,
      messages: Seq[RawMessage], enums: Seq[RawEnum])

  // FieldDescriptorProto.Type numbers (descriptor.proto)
  private val ScalarTypes: Map[Int, PType] = Map(
    1 -> PType.PDouble, 2 -> PType.PFloat, 3 -> PType.PInt64,
    4 -> PType.PUInt64, 5 -> PType.PInt32, 6 -> PType.PFixed64,
    7 -> PType.PFixed32, 8 -> PType.PBool, 9 -> PType.PString,
    12 -> PType.PBytes, 13 -> PType.PUInt32, 15 -> PType.PSFixed32,
    16 -> PType.PSFixed64, 17 -> PType.PSInt32, 18 -> PType.PSInt64)
  private val TypeMessage = 11
  private val TypeEnum = 14
  private val LabelRepeated = 3

  // --------------------------------------------------------- parse

  private def fields(bytes: Array[Byte]): Iterator[(Int, Int, Wire.Reader)] =
    new Iterator[(Int, Int, Wire.Reader)] {
      private val r = new Wire.Reader(bytes)
      def hasNext: Boolean = r.hasNext
      def next(): (Int, Int, Wire.Reader) = {
        val tag = r.readVarint()
        (((tag >>> 3).toInt, (tag & 7).toInt, r))
      }
    }

  private def str(b: Array[Byte]): String = new String(b, "UTF-8")

  private def parseFile(b: Array[Byte]): RawFile = {
    var name = ""; var pkg = ""
    val msgs = mutable.ArrayBuffer.empty[RawMessage]
    val enums = mutable.ArrayBuffer.empty[RawEnum]
    fields(b).foreach {
      case (1, 2, r) => name = str(r.readBytes())
      case (2, 2, r) => pkg = str(r.readBytes())
      case (4, 2, r) => msgs += parseMessage(r.readBytes())
      case (5, 2, r) => enums += parseEnum(r.readBytes())
      case (_, wt, r) => r.skip(wt)
    }
    RawFile(name, pkg, msgs.toSeq, enums.toSeq)
  }

  private def parseMessage(b: Array[Byte]): RawMessage = {
    var name = ""
    val fs = mutable.ArrayBuffer.empty[RawField]
    val nested = mutable.ArrayBuffer.empty[RawMessage]
    val enums = mutable.ArrayBuffer.empty[RawEnum]
    var mapEntry = false
    var table: Option[String] = None
    fields(b).foreach {
      case (1, 2, r) => name = str(r.readBytes())
      case (2, 2, r) => fs += parseField(r.readBytes())
      case (3, 2, r) => nested += parseMessage(r.readBytes())
      case (4, 2, r) => enums += parseEnum(r.readBytes())
      case (7, 2, r) => // MessageOptions
        fields(r.readBytes()).foreach {
          case (7, 0, o) => mapEntry = o.readVarint() != 0 // map_entry
          case (50001, 2, o) => table = Some(str(o.readBytes())) // bristle_table
          case (_, wt, o) => o.skip(wt)
        }
      case (_, wt, r) => r.skip(wt)
    }
    RawMessage(name, fs.toSeq, nested.toSeq, enums.toSeq, mapEntry, table)
  }

  private def parseField(b: Array[Byte]): RawField = {
    var name = ""; var number = 0; var label = 1; var ftype = 0
    var typeName = ""; var column: Option[String] = None
    fields(b).foreach {
      case (1, 2, r) => name = str(r.readBytes())
      case (3, 0, r) => number = r.readVarint().toInt
      case (4, 0, r) => label = r.readVarint().toInt
      case (5, 0, r) => ftype = r.readVarint().toInt
      case (6, 2, r) => typeName = str(r.readBytes())
      case (8, 2, r) => // FieldOptions
        fields(r.readBytes()).foreach {
          case (50001, 2, o) => column = Some(str(o.readBytes())) // bristle_column
          case (_, wt, o) => o.skip(wt)
        }
      case (_, wt, r) => r.skip(wt)
    }
    RawField(name, number, label, ftype, typeName, column)
  }

  private def parseEnum(b: Array[Byte]): RawEnum = {
    var name = ""
    val values = mutable.ArrayBuffer.empty[(String, Int)]
    fields(b).foreach {
      case (1, 2, r) => name = str(r.readBytes())
      case (2, 2, r) =>
        var vn = ""; var num = 0
        fields(r.readBytes()).foreach {
          case (1, 2, v) => vn = str(v.readBytes())
          case (2, 0, v) => num = v.readVarint().toInt
          case (_, wt, v) => v.skip(wt)
        }
        values += (vn -> num)
      case (_, wt, r) => r.skip(wt)
    }
    RawEnum(name, values.toSeq)
  }

  // ------------------------------------------------------- resolve

  /** Parse a serialized FileDescriptorSet and resolve every top-level
    * message into a [[PMessage]], keyed by fully-qualified name
    * (without the leading dot).
    */
  def load(bytes: Array[Byte]): Map[String, PMessage] = {
    val files = mutable.ArrayBuffer.empty[RawFile]
    fields(bytes).foreach {
      case (1, 2, r) => files += parseFile(r.readBytes())
      case (_, wt, r) => r.skip(wt)
    }

    // registries of fully-qualified (dot-prefixed) names
    val msgByFqn = mutable.Map.empty[String, RawMessage]
    val enumByFqn = mutable.Map.empty[String, RawEnum]
    def register(prefix: String, m: RawMessage): Unit = {
      val fqn = s"$prefix.${m.name}"
      msgByFqn(fqn) = m
      m.enums.foreach(e => enumByFqn(s"$fqn.${e.name}") = e)
      m.nested.foreach(register(fqn, _))
    }
    files.foreach { f =>
      val prefix = if (f.pkg.isEmpty) "" else s".${f.pkg}"
      f.messages.foreach(register(prefix, _))
      f.enums.foreach(e => enumByFqn(s"$prefix.${e.name}") = e)
    }

    val resolving = mutable.Set.empty[String]
    def resolveMessage(fqn: String): PMessage = {
      val raw = msgByFqn.getOrElse(fqn,
        throw Wire.MalformedProto(s"unresolved message type '$fqn'"))
      if (!resolving.add(fqn))
        throw Wire.MalformedProto(s"recursive message type '$fqn' unsupported")
      try PMessage(fqn.stripPrefix("."), raw.fields.map(resolveField),
        bristleTable = raw.bristleTable)
      finally resolving.remove(fqn)
    }
    def resolveField(f: RawField): PField = {
      val repeated = f.label == LabelRepeated
      f.ftype match {
        case TypeMessage =>
          val target = msgByFqn.getOrElse(f.typeName,
            throw Wire.MalformedProto(s"unresolved message type '${f.typeName}'"))
          if (target.mapEntry) {
            // map<K,V>: synthesized entry message, fields 1=key 2=value
            def entryType(num: Int): PType = {
              val ef = target.fields.find(_.number == num).getOrElse(
                throw Wire.MalformedProto(
                  s"map entry '${f.typeName}' missing field $num"))
              ef.ftype match {
                case TypeMessage | TypeEnum => resolveType(ef)
                case t => ScalarTypes(t)
              }
            }
            PField(f.name, f.number, entryType(2),
              mapOf = Some((entryType(1), entryType(2))),
              bristleColumn = f.bristleColumn)
          } else
            PField(f.name, f.number, PType.PMessageT(resolveMessage(f.typeName)),
              repeated = repeated, bristleColumn = f.bristleColumn)
        case TypeEnum =>
          PField(f.name, f.number, resolveType(f), repeated = repeated,
            bristleColumn = f.bristleColumn)
        case t =>
          PField(f.name, f.number, ScalarTypes.getOrElse(t,
              throw Wire.MalformedProto(s"unsupported field type $t for '${f.name}'")),
            repeated = repeated, bristleColumn = f.bristleColumn)
      }
    }
    def resolveType(f: RawField): PType = f.ftype match {
      case TypeEnum =>
        val e = enumByFqn.getOrElse(f.typeName,
          throw Wire.MalformedProto(s"unresolved enum type '${f.typeName}'"))
        PType.PEnum(e.name, e.values)
      case TypeMessage => PType.PMessageT(resolveMessage(f.typeName))
      case t => ScalarTypes(t)
    }

    msgByFqn.keys
      .filterNot(fqn => msgByFqn(fqn).mapEntry)
      .map(fqn => fqn.stripPrefix(".") -> resolveMessage(fqn))
      .toMap
  }

  def loadFile(path: java.nio.file.Path): Map[String, PMessage] =
    load(java.nio.file.Files.readAllBytes(path))
}

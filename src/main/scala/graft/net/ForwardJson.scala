package graft.net

import graft.proto.{DescriptorSet, ProtoJson}

import java.nio.file.Paths
import scala.util.control.NonFatal

/** `graft.net.ForwardJson [--grpc] <host:port> <messageType>
  * <descriptor.pb> [batchSize]` — the `cmd/bristle-forward-json`
  * analog (reference `cmd/bristle-forward-json/main.go:25-46`): read
  * protojson lines from stdin, decode each against the message
  * descriptor ([[graft.proto.ProtoJson]]), and forward encoded bodies
  * to the ingest server over one streaming session, batched
  * `batchSize` at a time (default 256). `--grpc` forwards over the
  * real gRPC/HTTP2 endpoint (the transport the reference CLI itself
  * uses — it dials grpc-go); default is the varint-framed socket.
  * A line that fails to parse is logged and skipped, like the
  * reference; a rejected batch (FULL after retries, TOO_BIG) is
  * logged with its result code. Flushes the tail batch and exits at
  * EOF.
  */
object ForwardJson {

  def main(args0: Array[String]): Unit = {
    val useGrpc = args0.contains("--grpc")
    val args = args0.filterNot(_ == "--grpc")
    if (args.length < 3) {
      System.err.println(
        "usage: graft.net.ForwardJson [--grpc] <host:port> <messageType> <descriptor.pb> [batchSize]")
      sys.exit(2)
    }
    val hostPort = args(0).split(":", 2)
    if (hostPort.length != 2) {
      System.err.println(s"[forward-json] bad address '${args(0)}' — want host:port")
      sys.exit(2)
    }
    val (host, port) = (hostPort(0), hostPort(1))
    val msgType = args(1)
    val messages = DescriptorSet.loadFile(Paths.get(args(2)))
    val message = messages.getOrElse(msgType, {
      System.err.println(s"[forward-json] message type '$msgType' not in " +
        s"descriptor set (${messages.keys.toSeq.sorted.mkString(", ")})")
      sys.exit(2)
    })
    val batchSize = args.lift(3).map(_.toInt).getOrElse(256)

    // both clients are shells over the same ClientCore — the only
    // difference is the wire
    val (register, write, closeClient) =
      if (useGrpc) {
        val c = new GrpcIngestClient(host, port.toInt)
        (() => c.registerType(msgType),
          (bodies: Seq[Array[Byte]]) => c.writeBatch(msgType, bodies),
          () => c.close())
      } else {
        val c = new IngestClient(host, port.toInt)
        (() => c.registerType(msgType),
          (bodies: Seq[Array[Byte]]) => c.writeBatch(msgType, bodies),
          () => c.close())
      }
    var sent = 0L
    var skipped = 0L
    try {
      register()
      val buf = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      def flush(): Unit = if (buf.nonEmpty) {
        write(buf.toSeq) match {
          case ControlProto.BatchResult.Ok => sent += buf.size
          case other =>
            skipped += buf.size
            System.err.println(s"[forward-json] batch rejected: " +
              ControlProto.BatchResult.name(other))
        }
        buf.clear()
      }
      val reader = new java.io.BufferedReader(
        new java.io.InputStreamReader(System.in, "UTF-8"))
      var line = reader.readLine()
      while (line != null) {
        if (line.trim.nonEmpty) {
          try {
            buf += ProtoJson.toWire(message, line)
            if (buf.size >= batchSize) flush()
          } catch {
            case NonFatal(e) =>
              skipped += 1
              System.err.println(
                s"[forward-json] failed to parse JSON: ${e.getMessage}")
          }
        }
        line = reader.readLine()
      }
      flush()
    } finally closeClient()
    System.err.println(s"[forward-json] done: $sent forwarded, $skipped skipped")
  }
}

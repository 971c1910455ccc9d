package graft.net

import graft.net.ControlProto._

import io.netty.bootstrap.ServerBootstrap
import io.netty.buffer.Unpooled
import io.netty.channel._
import io.netty.channel.nio.NioIoHandler
import io.netty.channel.socket.SocketChannel
import io.netty.channel.socket.nio.{NioServerSocketChannel, NioSocketChannel}
import io.netty.handler.codec.http.{HttpServerCodec, HttpServerUpgradeHandler}
import io.netty.handler.codec.http2._
import io.netty.util.AsciiString

import java.net.InetSocketAddress
import java.util.concurrent.TimeUnit
import scala.util.control.NonFatal

/** The reference's ACTUAL transport: gRPC over HTTP/2 cleartext
  * (`ingest_service.go:37-74` serves `bristle.BristleIngestService`
  * via grpc-go). This server speaks the same protocol for real — a
  * stock bristle client using insecure credentials (prior-knowledge
  * h2c, grpc-go's cleartext mode) connects and runs both RPCs — built
  * from the two halves a JVM deployment already has on the Spark
  * classpath:
  *
  *  - HTTP/2 transport: netty's `codec-http2` (shipped in Spark's own
  *    `jars/`), accepting BOTH connection styles — prior-knowledge
  *    (the `PRI * HTTP/2.0` preface grpc-go sends) and the HTTP/1.1
  *    `Upgrade: h2c` dance (what the JDK's `HttpClient` performs for
  *    cleartext HTTP/2, used as the independent interop check in
  *    GrpcSpec).
  *  - gRPC protocol: hand-rolled in [[GrpcWire]] — length-prefixed
  *    message framing, `application/grpc` content type, trailers
  *    carrying `grpc-status`/`grpc-message` — per the published
  *    PROTOCOL-HTTP2 spec.
  *
  * RPC semantics come from the SAME [[IngestEngine]] the socket
  * transport drives, so admission behavior is identical by
  * construction:
  *  - `WriteBatch` (unary): OK → `WriteBatchResponse{acknowledged: 0,
  *    dropped: 0}` — the reference's literal zeros
  *    (`ingest_service.go:115-119`) — with `grpc-status: 0` trailers;
  *    any non-OK payload → the grpc-go mapping of a plain error
  *    return: a trailers-only response with `grpc-status: 2`
  *    (UNKNOWN) and `grpc-message: "WriteBatch error code <RESULT>"`
  *    (`:113`).
  *  - `Streaming` (bidi): response headers up front, then
  *    `StreamingServerMessage` frames (acks, identify, backoff) as
  *    the session emits them; register-with-descriptor and
  *    update-default end the stream with UNKNOWN, grpc-go's mapping
  *    of `ErrUnsupported` (`:181,228`); client half-close drains
  *    in-flight writes then closes with `grpc-status: 0`.
  *
  * Flow control: inbound DATA is consumed immediately into the
  * per-stream [[GrpcWire.Framer]] (bounded upstream by the admission
  * queues the engine writes into), and every consumed byte is
  * returned to the peer via a stream WINDOW_UPDATE, so a pipelining
  * client never stalls on a closed window. TLS mirrors the reference's
  * config surface (`config.go:33-36,112-125`): a PEM certificate/key
  * pair served with no client-cert requirement, ALPN negotiating h2 —
  * pass [[GrpcIngestServer.Tls]] (config `ingest.tls`); without it the
  * endpoint is h2c, the insecure-credentials parity mode.
  */
final class GrpcIngestServer(engine: IngestEngine, port: Int = 0,
    metrics: Metrics = Metrics.default,
    tls: Option[GrpcIngestServer.Tls] = None,
    maxRecvMessageBytes: Int = GrpcIngestServer.DefaultMaxRecvBytes) {

  import GrpcIngestServer._

  private val group = GrpcIngestServer.ioGroup()
  @volatile private var serverChannel: Channel = _

  // Built once, shared across connections (reference parity:
  // `config.go:112-125` loads the PEM pair into NewTLS with
  // NoClientCert). ALPN advertises h2 — what a TLS gRPC client
  // negotiates; h1.1 is listed so a non-h2 peer fails the
  // negotiation cleanly instead of by connection reset.
  private val sslCtx = tls.map { t =>
    io.netty.handler.ssl.SslContextBuilder
      .forServer(t.certificate.toFile, t.key.toFile)
      .sslProvider(io.netty.handler.ssl.SslProvider.JDK)
      .applicationProtocolConfig(alpnH2)
      .build()
  }

  metrics.help("graft_grpc_streams_total", "gRPC streams opened, by rpc")

  def boundPort: Int =
    serverChannel.localAddress().asInstanceOf[InetSocketAddress].getPort

  def start(): this.type = {
    val b = new ServerBootstrap()
    b.group(group)
      .channel(GrpcIngestServer.serverChannelClass)
      .childOption[java.lang.Boolean](ChannelOption.TCP_NODELAY, true)
      .childHandler(new ChannelInitializer[SocketChannel] {
        override def initChannel(ch: SocketChannel): Unit = {
          val streamInit = new ChannelInitializer[Channel] {
            override def initChannel(stream: Channel): Unit = {
              stream.pipeline().addLast(
                new StreamHandler(engine, metrics, maxRecvMessageBytes))
              ()
            }
          }
          def h2Handlers(): Seq[io.netty.channel.ChannelHandler] = Seq(
            GrpcIngestServer.serverCodec(),
            new Http2MultiplexHandler(streamInit))
          sslCtx match {
            case Some(ssl) =>
              // TLS endpoint: handshake, then ALPN installs HTTP/2
              ch.pipeline().addLast(ssl.newHandler(ch.alloc()))
              ch.pipeline().addLast(
                new io.netty.handler.ssl.ApplicationProtocolNegotiationHandler(
                    io.netty.handler.ssl.ApplicationProtocolNames.HTTP_2) {
                  override def configurePipeline(ctx: ChannelHandlerContext,
                      protocol: String): Unit = {
                    if (protocol !=
                        io.netty.handler.ssl.ApplicationProtocolNames.HTTP_2)
                      throw new IllegalStateException(
                        s"peer negotiated $protocol, need h2")
                    h2Handlers().foreach(ctx.pipeline().addLast(_))
                  }
                })
              ()
            case None =>
              // Cleartext: prior-knowledge preface OR HTTP/1.1
              // Upgrade (the JDK client's h2c handshake — the
              // upgraded request replays as HTTP/2 stream 1)
              val priorKnowledge = new ChannelInitializer[Channel] {
                override def initChannel(c: Channel): Unit = {
                  h2Handlers().foreach(c.pipeline().addLast(_))
                  ()
                }
              }
              val sourceCodec = new HttpServerCodec()
              val upgradeFactory =
                new HttpServerUpgradeHandler.UpgradeCodecFactory {
                  override def newUpgradeCodec(protocol: CharSequence) =
                    if (AsciiString.contentEquals(
                        Http2CodecUtil.HTTP_UPGRADE_PROTOCOL_NAME, protocol))
                      new Http2ServerUpgradeCodec(
                        GrpcIngestServer.serverCodec(),
                        new Http2MultiplexHandler(streamInit))
                    else null
                }
              val upgrade =
                new HttpServerUpgradeHandler(sourceCodec, upgradeFactory)
              ch.pipeline().addLast(new CleartextHttp2ServerUpgradeHandler(
                sourceCodec, upgrade, priorKnowledge))
              ()
          }
        }
      })
    serverChannel = b.bind(port).syncUninterruptibly().channel()
    this
  }

  def stop(): Unit = {
    try {
      if (serverChannel != null) serverChannel.close().syncUninterruptibly()
    } catch { case NonFatal(_) => }
    group.shutdownGracefully(0, 2, TimeUnit.SECONDS).syncUninterruptibly()
    ()
  }
}

object GrpcIngestServer {

  /** TLS material, reference-shaped (`config.go:33-36`): PEM
    * certificate chain + PKCS#8 PEM private key file paths.
    */
  final case class Tls(certificate: java.nio.file.Path,
      key: java.nio.file.Path)

  /** HTTP/2 settings advertised to the peer. Netty's defaults (64 KiB
    * windows, 16 KiB frames) make flow control the per-batch hot path:
    * a ~35 KiB batch splits into 3 DATA frames and triggers a
    * stream + connection WINDOW_UPDATE nearly every message (netty
    * refills at 50% consumption). Real gRPC grows the receive window
    * dynamically (grpc-go's BDP estimator); the static equivalent —
    * 1 MiB windows, 128 KiB frames — cuts the update traffic to ~1 in
    * 15 batches and sends a whole batch as one frame. Flow-control
    * window ≠ message-size limit: `max_receive_message_size`
    * enforcement (and the gzip bomb cap) is unchanged downstream.
    */
  private[net] def h2Settings: Http2Settings = Http2Settings.defaultSettings()
    .initialWindowSize(1 << 20)
    .maxFrameSize(1 << 17)

  private[net] def serverCodec(): Http2FrameCodec =
    Http2FrameCodecBuilder.forServer().initialSettings(h2Settings).build()

  /** Native epoll when the platform library is present, NIO otherwise.
    * The gRPC round trip pays two event-loop wake-ups the blocking
    * socket path doesn't (client send and server ack both cross onto
    * an IO thread); epoll's eventfd wake-up is cheaper than NIO's
    * selector wake-up, and it is what grpc-go rides on Linux — the
    * honest transport comparison.
    */
  private[net] def epoll: Boolean = io.netty.channel.epoll.Epoll.isAvailable

  private[net] def ioGroup(): MultiThreadIoEventLoopGroup =
    if (epoll) new MultiThreadIoEventLoopGroup(
      io.netty.channel.epoll.EpollIoHandler.newFactory())
    else new MultiThreadIoEventLoopGroup(NioIoHandler.newFactory())

  private[net] def serverChannelClass: Class[_ <: io.netty.channel.ServerChannel] =
    if (epoll) classOf[io.netty.channel.epoll.EpollServerSocketChannel]
    else classOf[NioServerSocketChannel]

  private[net] def clientChannelClass: Class[_ <: Channel] =
    if (epoll) classOf[io.netty.channel.epoll.EpollSocketChannel]
    else classOf[NioSocketChannel]

  private[net] val alpnH2 = new io.netty.handler.ssl.ApplicationProtocolConfig(
    io.netty.handler.ssl.ApplicationProtocolConfig.Protocol.ALPN,
    io.netty.handler.ssl.ApplicationProtocolConfig
      .SelectorFailureBehavior.NO_ADVERTISE,
    io.netty.handler.ssl.ApplicationProtocolConfig
      .SelectedListenerFailureBehavior.ACCEPT,
    io.netty.handler.ssl.ApplicationProtocolNames.HTTP_2,
    io.netty.handler.ssl.ApplicationProtocolNames.HTTP_1_1)

  /** grpc-go's default MaxRecvMsgSize (4 MiB). The reference exposes
    * it as `ingest.max_receive_message_size` (`config.go:41`,
    * `ingest_service.go:48-50`); so does [[ServerConfig]].
    */
  val DefaultMaxRecvBytes: Int = 4 * 1024 * 1024

  /** RESOURCE_EXHAUSTED — what grpc-go returns for an over-limit
    * message.
    */
  val StatusResourceExhausted = 8

  private[net] val ServicePrefix = "/bristle.BristleIngestService/"
  private[net] val ContentType = AsciiString.cached("application/grpc")
  private[net] val GrpcStatus = AsciiString.cached("grpc-status")
  private[net] val GrpcMessage = AsciiString.cached("grpc-message")

  private def responseHeaders(): Http2Headers =
    new DefaultHttp2Headers()
      .status("200")
      .set(AsciiString.cached("content-type"), ContentType)

  private def trailers(status: Int, message: String = null): Http2Headers = {
    val h = new DefaultHttp2Headers()
      .setInt(GrpcStatus, status)
    if (message != null)
      h.set(GrpcMessage, GrpcWire.encodeMessage(message))
    h
  }

  /** One handler per HTTP/2 stream (netty child channel = stream).
    * The stream channel's event loop serializes all inbound frames;
    * session acks write from pool threads via the channel, which
    * netty marshals onto the loop — no extra locking needed.
    */
  private final class StreamHandler(engine: IngestEngine,
      metrics: Metrics, maxRecvBytes: Int)
      extends ChannelInboundHandlerAdapter {

    private val framer = new GrpcWire.Framer
    private var unary = false
    private var session: IngestEngine#Session = null // Streaming rpc only
    private var done = false
    private val unaryBody = Seq.newBuilder[Array[Byte]]
    private var unaryBytes = 0L

    private def sendTrailersOnly(ctx: ChannelHandlerContext, status: Int,
        message: String): Unit = {
      // grpc's Trailers-Only response: the error rides the initial
      // (and only) HEADERS frame, alongside :status/content-type
      val h = trailers(status, message)
        .status("200")
        .set(AsciiString.cached("content-type"), ContentType)
      ctx.writeAndFlush(new DefaultHttp2HeadersFrame(h, true))
      done = true
    }

    private def sendMessageFrames(ch: Channel, payload: Array[Byte]): Unit = {
      // header + payload composite — no full-payload copy (GrpcWire
      // .header scaladoc); voidPromise — nothing awaits the ack write
      ch.writeAndFlush(new DefaultHttp2DataFrame(
        GrpcWire.composeFrame(payload)), ch.voidPromise())
      ()
    }

    override def channelRead(ctx: ChannelHandlerContext, msg: AnyRef): Unit =
      msg match {
        case h: Http2HeadersFrame => onHeaders(ctx, h)
        case d: Http2DataFrame =>
          try onData(ctx, d) finally d.release()
        case _: Http2ResetFrame => done = true
        case other => ctx.fireChannelRead(other); ()
      }

    override def channelReadComplete(ctx: ChannelHandlerContext): Unit = {
      ctx.flush() // drain window updates batched in onData
      ctx.fireChannelReadComplete()
      ()
    }

    private def onHeaders(ctx: ChannelHandlerContext,
        h: Http2HeadersFrame): Unit = {
      val path = if (h.headers().path() == null) "" else h.headers().path().toString
      val method = if (h.headers().method() == null) "" else h.headers().method().toString
      // message compression: gzip is the one registered codec (bounded
      // inflate — the limit applies to the DECOMPRESSED size, as in
      // grpc-go); any other grpc-encoding leaves the framer codec-less,
      // so a compressed-flag message gets UNIMPLEMENTED, the posture of
      // a server with no registered compressor
      val enc = h.headers().get(AsciiString.cached("grpc-encoding"))
      if (enc != null && enc.toString == "gzip")
        framer.codec = GrpcWire.gunzip(_, maxRecvBytes)
      if (method != "POST") {
        // the JDK client bootstraps its h2c connection with a GET —
        // answer politely so the connection upgrade completes
        ctx.writeAndFlush(new DefaultHttp2HeadersFrame(
          new DefaultHttp2Headers().status("200"), true))
        done = true
        return
      }
      path match {
        case p if p == ServicePrefix + "WriteBatch" =>
          unary = true
          metrics.inc("graft_grpc_streams_total", "rpc" -> "unary")
          if (h.isEndStream) finishUnary(ctx) // empty request body
        case p if p == ServicePrefix + "Streaming" =>
          metrics.inc("graft_grpc_streams_total", "rpc" -> "streaming")
          val ch = ctx.channel()
          ctx.writeAndFlush(new DefaultHttp2HeadersFrame(responseHeaders()))
          session = new engine.Session(m => sendMessageFrames(ch, encode(m)))
          if (h.isEndStream) finishStreaming(ctx, session)
        case other =>
          sendTrailersOnly(ctx, GrpcWire.StatusUnimplemented,
            s"unknown method $other")
      }
    }

    private def onData(ctx: ChannelHandlerContext, d: Http2DataFrame): Unit = {
      // return consumed flow-control bytes so the sender's window
      // never closes (inbound is bounded by the admission queues, not
      // by HTTP/2 backpressure). write, not writeAndFlush: one flush
      // per read burst (channelReadComplete) instead of one syscall
      // per DATA frame
      val consumed = d.initialFlowControlledBytes()
      if (consumed > 0) {
        ctx.write(new DefaultHttp2WindowUpdateFrame(consumed)); ()
      }
      if (done) return
      val bytes = new Array[Byte](d.content().readableBytes())
      d.content().readBytes(bytes)
      val messages =
        try framer.feed(bytes)
        catch {
          case e: GrpcWire.Unsupported =>
            sendTrailersOnly(ctx, GrpcWire.StatusUnimplemented, e.getMessage)
            return
          case e: GrpcWire.TooLarge =>
            sendTrailersOnly(ctx, StatusResourceExhausted, e.getMessage)
            return
          case e: java.io.IOException => // ZipException, truncated gzip EOF
            // grpc-go: a failed decompress is INTERNAL
            sendTrailersOnly(ctx, GrpcWire.StatusInternal,
              s"grpc: failed to decompress the received message: ${e.getMessage}")
            return
        }
      // MaxRecvMsgSize (grpc-go parity, ingest_service.go:48-50): an
      // over-limit message — complete or still-accumulating — is
      // RESOURCE_EXHAUSTED, and the bytes are never buffered past the
      // limit
      if (messages.exists(_.length > maxRecvBytes) ||
          framer.pendingBytes > maxRecvBytes) {
        sendTrailersOnly(ctx, StatusResourceExhausted,
          s"message larger than max receive size $maxRecvBytes")
        return
      }
      if (unary) {
        unaryBody ++= messages
        unaryBytes += messages.map(_.length.toLong).sum
        if (unaryBytes > maxRecvBytes) {
          sendTrailersOnly(ctx, StatusResourceExhausted,
            s"message larger than max receive size $maxRecvBytes")
          return
        }
        if (d.isEndStream) finishUnary(ctx)
      } else if (session != null) {
        val unsupported = messages.exists { m =>
          !session.handle(decodeClientMessage(m))
        }
        if (unsupported) {
          // grpc-go maps the handler's ErrUnsupported return to
          // UNKNOWN, ending the stream (reference :181,228)
          ctx.writeAndFlush(new DefaultHttp2HeadersFrame(
            trailers(GrpcWire.StatusUnknown, "unsupported operation"), true))
          done = true
        } else if (d.isEndStream) finishStreaming(ctx, session)
      } // else: trailers already sent
    }

    private def finishUnary(ctx: ChannelHandlerContext): Unit = {
      if (done) return
      val messages = unaryBody.result()
      if (messages.size != 1 || framer.pendingBytes > 0) {
        sendTrailersOnly(ctx, GrpcWire.StatusInternal,
          s"expected exactly one WriteBatchRequest message, got ${messages.size}")
        return
      }
      val req = decodeWriteBatchRequest(messages.head)
      val status = engine.unaryWriteBatch(req, rpc = "grpc_unary")
      if (status != BatchResult.Ok) {
        // the reference returns a plain error; grpc-go surfaces it as
        // UNKNOWN with the formatted message (ingest_service.go:113)
        sendTrailersOnly(ctx, GrpcWire.StatusUnknown,
          GrpcWire.writeBatchErrorMessage(status))
      } else {
        ctx.write(new DefaultHttp2HeadersFrame(responseHeaders()))
        val resp = encode(WriteBatchResponse(0L, 0L))
        ctx.write(new DefaultHttp2DataFrame(GrpcWire.composeFrame(resp)))
        ctx.writeAndFlush(new DefaultHttp2HeadersFrame(
          trailers(GrpcWire.StatusOk), true))
        done = true
      }
    }

    private def finishStreaming(ctx: ChannelHandlerContext,
        session: IngestEngine#Session): Unit = {
      if (done) return
      done = true
      val ch = ctx.channel()
      // half-close: let in-flight writes finish off the event loop,
      // then close with OK — never block a netty thread on the drain
      engine.poolExecute { () =>
        session.drain()
        ch.writeAndFlush(new DefaultHttp2HeadersFrame(
          trailers(GrpcWire.StatusOk), true))
        ()
      }
    }

    override def channelInactive(ctx: ChannelHandlerContext): Unit = {
      // abrupt disconnect: let in-flight writes finish OFF the event
      // loop — the drain can wait up to its timeout and must never
      // stall the multiplexer's other streams
      if (session != null && !done) {
        val s = session
        engine.poolExecute(() => s.drain())
      }
      ctx.fireChannelInactive()
      ()
    }

    override def exceptionCaught(ctx: ChannelHandlerContext,
        cause: Throwable): Unit = {
      if (!done)
        try sendTrailersOnly(ctx, GrpcWire.StatusInternal,
          String.valueOf(cause.getMessage))
        catch { case NonFatal(_) => }
      ctx.close()
      ()
    }
  }
}

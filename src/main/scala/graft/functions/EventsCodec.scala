package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable.ArrayBuffer

/** Byte-compatible reimplementation (scodec-free, plain ByteBuffer) of the
  * reference's versioned binary events frame
  * (journal/src/main/scala/com/evolution/kafka/journal/Events.scala:14-31,
  * Event.scala:18-38; golden fixtures journal/src/test/resources/.../
  * v0-events-*.bin, v1-events-*.bin):
  *
  * {{{
  *   frame   := version:u8 events [metadata-bytes]      // metadata iff v1
  *   events  := count:i32 { size:i32 event }*count      // big-endian
  *   event   := seqNr:i64 tagsBlock payload
  *   tagsBlock := size:i32 { len:i32 utf8 }*            // utf8_32 list
  *   payload := disc:u8 size:i32 bytes                  // 0=None 1=Binary
  *                                                      // 2=Json 3=Text
  *   metadata := UTF-8 JSON of PayloadMetadata, to end of frame
  * }}}
  *
  * Decode also accepts the legacy "default" frame (any first byte, no
  * metadata) the reference's codec `choice` falls back to.
  */
object EventsCodec {

  final case class CodecEvent(
      seqNr: Long,
      tags: Seq[String],
      payloadType: Int, // 0=None 1=Binary 2=Json 3=Text
      payload: Array[Byte]
  )

  final case class Frame(
      version: Int,
      events: Seq[CodecEvent],
      metadataJson: Option[String]
  )

  val DiscNone = 0
  val DiscBinary = 1
  val DiscJson = 2
  val DiscText = 3

  def encode(frame: Frame): Array[Byte] = {
    val eventBlobs = frame.events.map(encodeEvent)
    val metaBytes =
      if (frame.version >= 1)
        frame.metadataJson.getOrElse("{}").getBytes(UTF_8)
      else Array.emptyByteArray
    val size = 1 + 4 + eventBlobs.map(4 + _.length).sum + metaBytes.length
    val buf = ByteBuffer.allocate(size) // big-endian by default
    buf.put(frame.version.toByte)
    buf.putInt(frame.events.size)
    eventBlobs.foreach { b =>
      buf.putInt(b.length)
      buf.put(b)
    }
    buf.put(metaBytes)
    buf.array()
  }

  private def encodeEvent(e: CodecEvent): Array[Byte] = {
    val tagBytes = e.tags.map(_.getBytes(UTF_8))
    val tagsSize = tagBytes.map(4 + _.length).sum
    val payloadBytes = if (e.payloadType == DiscNone) Array.emptyByteArray else e.payload
    val buf = ByteBuffer.allocate(8 + 4 + tagsSize + 1 + 4 + payloadBytes.length)
    buf.putLong(e.seqNr)
    buf.putInt(tagsSize)
    tagBytes.foreach { t =>
      buf.putInt(t.length)
      buf.put(t)
    }
    buf.put(e.payloadType.toByte)
    buf.putInt(payloadBytes.length)
    buf.put(payloadBytes)
    buf.array()
  }

  def decode(bytes: Array[Byte]): Frame = {
    val buf = ByteBuffer.wrap(bytes)
    val version = buf.get() & 0xff
    val count = buf.getInt()
    val events = (0 until count).map { _ =>
      val size = buf.getInt()
      val slice = new Array[Byte](size)
      buf.get(slice)
      decodeEvent(slice)
    }
    val metadata =
      if (version == 1 && buf.hasRemaining) {
        val rest = new Array[Byte](buf.remaining())
        buf.get(rest)
        Some(new String(rest, UTF_8))
      } else None
    Frame(version, events, metadata)
  }

  private def decodeEvent(bytes: Array[Byte]): CodecEvent = {
    val buf = ByteBuffer.wrap(bytes)
    val seqNr = buf.getLong()
    val tagsSize = buf.getInt()
    val tagsEnd = buf.position() + tagsSize
    val tags = ArrayBuffer.empty[String]
    while (buf.position() < tagsEnd) {
      val len = buf.getInt()
      val s = new Array[Byte](len)
      buf.get(s)
      tags += new String(s, UTF_8)
    }
    val disc = buf.get() & 0xff
    val size = buf.getInt()
    val payload = new Array[Byte](size)
    buf.get(payload)
    CodecEvent(seqNr, tags.toSeq, disc, payload)
  }
}

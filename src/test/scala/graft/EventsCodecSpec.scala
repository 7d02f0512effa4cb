package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.EventsCodec
import graft.functions.EventsCodec.{CodecEvent, Frame}

/** Byte-compatibility contract for the binary events frame: decode the
  * reference's golden fixtures (journal/src/test/resources/com/evolution/
  * kafka/journal/v{0,1}-events-*.bin) and roundtrip our own encoding.
  */
class EventsCodecSpec extends AnyFunSuite {

  private val goldenDir =
    "/root/reference/journal/src/test/resources/com/evolution/kafka/journal"

  private def golden(name: String): Array[Byte] =
    Files.readAllBytes(Paths.get(goldenDir, name))

  test("decodes v1 golden frame: empty/binary/text/json payloads + metadata") {
    val f = EventsCodec.decode(golden("v1-events-empty-binary-text-json.bin"))
    assert(f.version == 1)
    assert(f.events.map(_.seqNr) == Seq(1L, 2L, 3L, 4L))
    assert(f.events.map(_.payloadType) == Seq(0, 1, 3, 2))
    assert(f.events(0).tags.toSet == Set("0", "1"))
    assert(new String(f.events(1).payload, "UTF-8") == "binary")
    assert(new String(f.events(2).payload, "UTF-8") == "text")
    assert(new String(f.events(3).payload, "UTF-8") == "\"json\"")
    assert(f.metadataJson.contains(
      """{"expireAfter":"1 day","data":{"key":"value"}}"""))
  }

  test("decodes v0 golden frames") {
    val empty = EventsCodec.decode(golden("v0-events-empty.bin"))
    assert(empty.version == 0)
    assert(empty.events.map(_.payloadType).forall(_ == 0))
    assert(empty.metadataJson.isEmpty)

    val many = EventsCodec.decode(golden("v0-events-binary-many.bin"))
    assert(many.version == 0)
    assert(many.events.nonEmpty)
    assert(many.events.forall(_.payloadType == 1))
    // seqNrs are strictly increasing in every reference fixture
    assert(
      many.events.map(_.seqNr) == many.events.map(_.seqNr).sorted
    )
  }

  test("re-encoding a decoded v1 golden frame reproduces the exact bytes") {
    val bytes = golden("v1-events-empty-binary-text-json.bin")
    val f = EventsCodec.decode(bytes)
    assert(EventsCodec.encode(f).sameElements(bytes))
  }

  test("re-encoding a decoded v0 golden frame reproduces the exact bytes") {
    for (
      name <- Seq(
        "v0-events-empty.bin",
        "v0-events-binary.bin",
        "v0-events-binary-many.bin",
        "v0-events-json.bin",
        "v0-events-empty-binary-text-json.bin"
      )
    ) {
      val bytes = golden(name)
      val f = EventsCodec.decode(bytes)
      assert(EventsCodec.encode(f).sameElements(bytes), name)
    }
  }

  test("roundtrip of arbitrary frames") {
    val frame = Frame(
      version = 1,
      events = Seq(
        CodecEvent(1L, Seq("a", "bb"), EventsCodec.DiscText,
          "payload".getBytes("UTF-8")),
        CodecEvent(7L, Nil, EventsCodec.DiscNone, Array.emptyByteArray),
        CodecEvent(9L, Seq("äöü"), EventsCodec.DiscBinary,
          Array[Byte](0, 1, 2, -1)),
        CodecEvent(12L, Seq("x"), EventsCodec.DiscJson,
          """{"a":[1,2]}""".getBytes("UTF-8"))
      ),
      metadataJson = Some("""{"expireAfter":"2 days"}""")
    )
    val back = EventsCodec.decode(EventsCodec.encode(frame))
    assert(back.version == 1)
    assert(back.metadataJson == frame.metadataJson)
    assert(back.events.map(_.seqNr) == frame.events.map(_.seqNr))
    assert(back.events.map(_.tags) == frame.events.map(_.tags))
    assert(back.events.map(_.payloadType) == frame.events.map(_.payloadType))
    assert(
      back.events.zip(frame.events).forall { case (a, b) =>
        a.payload.sameElements(b.payload)
      }
    )
  }
}

package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.model.{GtidRange, GtidSet}

/** The dump-request wire bytes, pinned: golden vectors for the packet
  * frame, the binary GTID-set form (including its EXCLUSIVE stop —
  * the resume off-by-one that silently re-delivers or skips one
  * transaction if either side gets it wrong), and the full
  * `COM_BINLOG_DUMP_GTID` payload the reference's `StartSyncGTID`
  * issues from the persisted watermark.
  */
class BinlogWireSpec extends AnyFunSuite {
  private val U = "3e11fa47-71ca-11e1-9e33-c80aa9429562"

  test("packet framing: 3-byte LE length + sequence id, exact bytes") {
    val framed = BinlogWire.framePacket(3, Array[Byte](0x1e, 0x04, 0x00))
    assert(framed.toSeq == Seq[Byte](0x03, 0x00, 0x00, 0x03, 0x1e, 0x04, 0x00))
    val (seq, payload) = BinlogWire.unframePacket(framed)
    assert(seq == 3 && payload.toSeq == Seq[Byte](0x1e, 0x04, 0x00))
    // trailing garbage after the framed length is not consumed
    val (seq2, p2) = BinlogWire.unframePacket(framed ++ Array[Byte](0x7f))
    assert(seq2 == 3 && p2.length == 3)
  }

  test("binary GTID set: wire stop is exclusive — 1-5 encodes as [1, 6)") {
    val set = GtidSet.empty.addRange(U, GtidRange(1, 5))
    val bytes = BinlogWire.encodeGtidSet(set)
    // n_sids=1, sid(16), n_intervals=1, start=1, stop=6
    assert(bytes.length == 8 + 16 + 8 + 16)
    assert(bytes(0) == 1 && bytes(8 + 16) == 1)
    assert(bytes(8 + 16 + 8) == 1, "interval start")
    assert(bytes(8 + 16 + 8 + 8) == 6, "exclusive stop = end + 1")
    assert(BinlogWire.decodeGtidSet(bytes) == set)
    // a single-point range 7 rides as [7, 8)
    val pt = GtidSet.empty.add(U, 7)
    val b2 = BinlogWire.encodeGtidSet(pt)
    assert(b2(8 + 16 + 8) == 7 && b2(8 + 16 + 8 + 8) == 8)
    assert(BinlogWire.decodeGtidSet(b2) == pt)
  }

  test("GTID set encode/decode roundtrips random multi-sid sets (seeded property)") {
    val u2 = "aaaaaaaa-bbbb-cccc-dddd-eeeeeeeeeeee"
    val rnd = new scala.util.Random(31)
    (1 to 100).foreach { _ =>
      val set = (1 to rnd.nextInt(30)).foldLeft(GtidSet.empty) { (acc, _) =>
        val u = if (rnd.nextBoolean()) U else u2
        val s = rnd.nextInt(500).toLong + 1
        acc.addRange(u, GtidRange(s, s + rnd.nextInt(9)))
      }
      assert(BinlogWire.decodeGtidSet(BinlogWire.encodeGtidSet(set)) == set)
    }
  }

  test("an empty wire interval is corruption, not an empty range") {
    val set = GtidSet.empty.addRange(U, GtidRange(5, 9))
    val bytes = BinlogWire.encodeGtidSet(set)
    bytes(8 + 16 + 8 + 8) = 5 // stop == start -> [5, 5) is empty
    intercept[CorruptStreamException](BinlogWire.decodeGtidSet(bytes))
  }

  test("corrupt count fields are classified errors, never a silently smaller set") {
    val two = GtidSet.empty.addRange(U, GtidRange(1, 5))
      .addRange("aaaaaaaa-bbbb-cccc-dddd-eeeeeeeeeeee", GtidRange(9, 9))
    val bytes = BinlogWire.encodeGtidSet(two)
    // n_sids corrupted LOW (2 -> 1): trailing bytes must surface, not
    // decode to a set missing a sid (the silent resume-loss bug)
    val low = bytes.clone(); low(0) = 1
    val e = intercept[CorruptStreamException](BinlogWire.decodeGtidSet(low))
    assert(e.getMessage.contains("trailing"))
    // sign bit set -> negative count: classified, not an empty set
    val neg = bytes.clone(); neg(7) = 0x80.toByte
    intercept[CorruptStreamException](BinlogWire.decodeGtidSet(neg))
    // a huge length field in the dump request: classified underrun,
    // never an unclassified IllegalArgument/IndexOutOfBounds crash
    val payload = BinlogWire.comBinlogDumpGtid(1L, two)
    val badLen = payload.clone()
    (7 until 11).foreach(i => badLen(i) = 0xff.toByte) // filename-len = 0xFFFFFFFF
    intercept[CorruptStreamException](BinlogWire.parseComBinlogDumpGtid(badLen))
  }

  test("COM_BINLOG_DUMP_GTID: the StartSyncGTID request roundtrips from a watermark") {
    // the persisted watermark (canonical text) becomes the wire request
    val watermark = GtidSet.parse(s"$U:1-77:80")
    val payload = BinlogWire.comBinlogDumpGtid(serverId = 1001L, set = watermark)
    assert((payload(0) & 0xff) == BinlogWire.ComBinlogDumpGtid)
    val req = BinlogWire.parseComBinlogDumpGtid(payload)
    assert(req.flags == BinlogWire.BinlogThroughGtid)
    assert(req.serverId == 1001L)
    assert(req.filename == "" && req.pos == 4L, "GTID resume form: no file anchor")
    assert(req.set == watermark)
    assert(req.set.serialize == s"$U:1-77:80", "canonical text survives the wire")
    // framed as the first command packet of the dump conversation
    val (seq, body) = BinlogWire.unframePacket(BinlogWire.framePacket(0, payload))
    assert(seq == 0 && body.toSeq == payload.toSeq)
    // a non-dump command byte is refused
    val wrong = payload.clone(); wrong(0) = 0x03
    intercept[CorruptStreamException](BinlogWire.parseComBinlogDumpGtid(wrong))
  }
}

package graft.sources

import graft.model.{GtidRange, GtidSet}

/** The client half of the binlog WIRE protocol, as far as bytes go:
  * MySQL packet framing, the binary GTID-set encoding, and the
  * `COM_BINLOG_DUMP_GTID` request the reference's syncer issues on
  * (re)connect (`StartSyncGTID`,
  * `/root/reference/internal/cannal/incremental.go:149` — the
  * go-mysql client builds exactly this packet from the watermark
  * set). With [[BinlogDecoder]] covering the event stream coming
  * back, the only piece of the reference with no executable
  * counterpart left in this repo is the TCP connection + auth
  * exchange itself.
  *
  * Layout facts are the public MySQL client/server protocol:
  *
  *   - packets frame as `[payload-length u3][sequence-id u1][payload]`,
  *     little-endian;
  *   - `COM_BINLOG_DUMP_GTID` payload: command byte 0x1e, flags u2
  *     (0x04 = BINLOG_THROUGH_GTID), server-id u4, filename-length
  *     u4 + filename, binlog-pos u8, gtid-data-size u4, then the
  *     GTID set in binary form;
  *   - binary GTID set: n_sids u8; per sid 16 uuid bytes,
  *     n_intervals u8, then per interval start u8 (inclusive) and
  *     STOP u8 (EXCLUSIVE — the wire carries [start, stop), while
  *     [[GtidSet]] ranges are inclusive; the +1/−1 at this boundary
  *     is a classic resume-off-by-one source, pinned by spec).
  */
object BinlogWire {

  val ComBinlogDumpGtid = 0x1e
  val BinlogThroughGtid = 0x04

  private def w2(b: java.io.ByteArrayOutputStream, v: Int): Unit = {
    b.write(v & 0xff); b.write((v >> 8) & 0xff)
  }
  private def w4(b: java.io.ByteArrayOutputStream, v: Long): Unit = {
    w2(b, (v & 0xffff).toInt); w2(b, ((v >> 16) & 0xffff).toInt)
  }
  private def w8(b: java.io.ByteArrayOutputStream, v: Long): Unit = {
    w4(b, v & 0xffffffffL); w4(b, (v >> 32) & 0xffffffffL)
  }

  /** Frame one payload as a MySQL packet. Payloads ≥ 2^24−1 require
    * continuation packets; a dump REQUEST never approaches that, so
    * oversized payloads are refused rather than silently truncated.
    */
  def framePacket(seq: Int, payload: Array[Byte]): Array[Byte] = {
    require(payload.length < 0xffffff, s"payload ${payload.length} needs continuation packets")
    val b = new java.io.ByteArrayOutputStream(4 + payload.length)
    b.write(payload.length & 0xff)
    b.write((payload.length >> 8) & 0xff)
    b.write((payload.length >> 16) & 0xff)
    b.write(seq & 0xff)
    b.write(payload, 0, payload.length)
    b.toByteArray
  }

  /** (sequence-id, payload) of the packet starting at `off`. */
  def unframePacket(bytes: Array[Byte], off: Int = 0): (Int, Array[Byte]) = {
    val r = new Cursor(bytes, off, bytes.length)
    val len = r.u3()
    val seq = r.u1()
    (seq, r.bytes(len))
  }

  /** The binary GTID-set form carried inside the dump request.
    * Deterministic: sids sort lexicographically, intervals are
    * already canonical (sorted, disjoint) in [[GtidSet]].
    */
  def encodeGtidSet(set: GtidSet): Array[Byte] = {
    val b = new java.io.ByteArrayOutputStream()
    val sids = set.intervals.toSeq.sortBy(_._1)
    w8(b, sids.length.toLong)
    sids.foreach { case (uuid, ranges) =>
      val sid = BinlogCodec.uuidToBytes(uuid)
      b.write(sid, 0, sid.length)
      w8(b, ranges.length.toLong)
      ranges.foreach { r =>
        w8(b, r.start)
        w8(b, r.end + 1) // wire stop is EXCLUSIVE
      }
    }
    b.toByteArray
  }

  def decodeGtidSet(bytes: Array[Byte]): GtidSet = {
    val r = new Cursor(bytes)
    val set = decodeGtidSetAt(r)
    // a count field corrupted LOW would leave unread bytes and decode
    // to a silently-smaller set — the resume bug this encoding exists
    // to prevent; all input must be consumed
    if (r.remaining != 0)
      throw new CorruptStreamException(
        s"${r.remaining} trailing bytes after GTID set — count field corrupt")
    set
  }

  private def decodeGtidSetAt(r: Cursor): GtidSet = {
    val nSids = r.i8()
    // negative = sign bit set = corrupt; a huge count fails on the
    // first underrun read rather than allocating
    if (nSids < 0)
      throw new CorruptStreamException(s"corrupt sid count $nSids")
    (0L until nSids).foldLeft(GtidSet.empty) { (acc, _) =>
      val uuid = BinlogCodec.bytesToUuid(r.bytes(16))
      val nIv = r.i8()
      if (nIv < 0)
        throw new CorruptStreamException(s"corrupt interval count $nIv")
      (0L until nIv).foldLeft(acc) { (a, _) =>
        val start = r.i8()
        val stop = r.i8()
        if (stop <= start)
          throw new CorruptStreamException(s"empty wire interval [$start, $stop)")
        a.addRange(uuid, GtidRange(start, stop - 1))
      }
    }
  }

  /** The `COM_BINLOG_DUMP_GTID` payload for resuming the tail at
    * `set` — what the reference's `StartSyncGTID(watermark)` puts on
    * the wire. Empty filename + pos 4 = "everything above the GTID
    * set", the resume form the watermark protocol uses.
    */
  def comBinlogDumpGtid(
      serverId: Long,
      set: GtidSet,
      flags: Int = BinlogThroughGtid,
      filename: String = "",
      pos: Long = 4L
  ): Array[Byte] = {
    val b = new java.io.ByteArrayOutputStream()
    b.write(ComBinlogDumpGtid)
    w2(b, flags)
    w4(b, serverId)
    val fn = filename.getBytes("UTF-8")
    w4(b, fn.length.toLong)
    b.write(fn, 0, fn.length)
    w8(b, pos)
    val data = encodeGtidSet(set)
    w4(b, data.length.toLong)
    b.write(data, 0, data.length)
    b.toByteArray
  }

  /** Parsed dump request — the roundtrip check for the encoder. */
  final case class DumpRequest(
      flags: Int, serverId: Long, filename: String, pos: Long, set: GtidSet)

  def parseComBinlogDumpGtid(payload: Array[Byte]): DumpRequest = {
    val r = new Cursor(payload)
    val cmd = r.u1()
    if (cmd != ComBinlogDumpGtid)
      throw new CorruptStreamException(f"not a COM_BINLOG_DUMP_GTID payload: 0x$cmd%02x")
    val flags = r.u2()
    val serverId = r.u4()
    // u4().toInt may go negative on a corrupt length — Cursor.need
    // rejects negative reads as CorruptStreamException, classified
    val fn = r.string(r.u4().toInt)
    val pos = r.i8()
    val data = r.bytes(r.u4().toInt)
    DumpRequest(flags, serverId, fn, pos, decodeGtidSet(data))
  }
}

package graft.sources

import scala.collection.mutable.ArrayBuffer

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.FeedRow

/** The reference's reconnect/backoff policy
  * (`internal/cannal/incremental.go:100-114`) as executable spec:
  * exponential backoff with a 30 s cap, surrender after 10
  * consecutive failures, reset on success — plus the stream-level
  * guarantee that a flaky-but-recovering transport loses nothing.
  */
class BinlogTransportSpec extends AnyFunSuite {

  private def row(pos: Long) =
    FeedRow(pos, new java.sql.Timestamp(pos * 1000), pos % 7, "insert", pos.toDouble)

  /** Fails the first `failures` fetches, then serves `rows` forever. */
  private final class FlakyTransport(failures: Int, rows: Vector[FeedRow])
      extends BinlogTransport {
    var calls = 0
    override def fetch(): Vector[FeedRow] = {
      calls += 1
      if (calls <= failures) throw new TransportException(s"drop #$calls")
      rows
    }
  }

  test("backoff doubles per failure and caps at 30 s") {
    val sleeps = ArrayBuffer.empty[Long]
    val t = new ReconnectingTransport(
      new FlakyTransport(7, Vector(row(1))), sleep = sleeps += _)
    assert(t.fetch() == Vector(row(1)))
    assert(sleeps.toSeq == Seq(1000L, 2000L, 4000L, 8000L, 16000L, 30000L, 30000L))
  }

  test("gives up after 10 consecutive failures") {
    val sleeps = ArrayBuffer.empty[Long]
    val t = new ReconnectingTransport(
      new FlakyTransport(Int.MaxValue, Vector.empty), sleep = sleeps += _)
    val e = intercept[TransportException](t.fetch())
    assert(e.getMessage.contains("giving up"))
    assert(sleeps.length == 10) // 10 retries slept, 11th failure surrenders
  }

  test("success resets the backoff (next outage starts at 1 s again)") {
    val sleeps = ArrayBuffer.empty[Long]
    var mode = "fail3"
    val inner = new BinlogTransport {
      var calls = 0
      override def fetch(): Vector[FeedRow] = {
        calls += 1
        mode match {
          case "fail3" => if (calls <= 3) throw new TransportException("x") else Vector(row(1))
          case "fail1" => if (calls == 5) throw new TransportException("y") else Vector(row(2))
        }
      }
    }
    val t = new ReconnectingTransport(inner, sleep = sleeps += _)
    t.fetch() // 3 failures: 1s, 2s, 4s
    mode = "fail1"
    t.fetch() // 1 failure: backoff must be back at 1s, NOT 8s
    assert(sleeps.toSeq == Seq(1000L, 2000L, 4000L, 1000L))
  }

  test("a flaky-but-recovering transport loses no events end-to-end") {
    val rows = (1L to 200L).map(row).toVector
    val flaky = new FlakyTransport(2, rows)
    val noSleep: Long => Unit = _ => ()
    val stream = new GtidReplayStream(
      Seq(("srv-1", "unused")), numPartitions = 2, maxRowsPerBatch = Some(50),
      transportFactory = _ => new ReconnectingTransport(flaky, sleep = noSleep))
    // drive the offset protocol the way the engine does
    var off = stream.initialOffset()
    var delivered = 0L
    var batches = 0
    while ({
      val next = stream.latestOffset(off, stream.getDefaultReadLimit)
      val n = stream.planInputPartitions(off, next)
        .map(_.asInstanceOf[GtidReplayPartition].rows.length.toLong).sum
      delivered += n
      off = next
      batches += 1
      n > 0 && batches < 20
    }) ()
    assert(delivered == 200L)
    assert(flaky.calls > 2) // the outage really happened and was ridden out
  }
}

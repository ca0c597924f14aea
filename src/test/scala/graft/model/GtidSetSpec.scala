package graft.model

import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

class GtidSetSpec extends AnyFunSuite {

  private val u1 = "3E11FA47-71CA-11E1-9E33-C80AA9429562"
  private val u2 = "aaaaaaaa-bbbb-cccc-dddd-eeeeeeeeeeee"

  test("parse/serialize round-trips canonical text") {
    val s = GtidSet.parse(s"$u1:1-5:7:9-12,$u2:1-3")
    assert(s.intervals(u1) == Vector(GtidRange(1, 5), GtidRange(7, 7), GtidRange(9, 12)))
    assert(s.intervals(u2) == Vector(GtidRange(1, 3)))
    assert(GtidSet.parse(s.serialize) == s)
  }

  test("single-point ranges parse (reference panics on these, gtid.go:17-18)") {
    val s = GtidSet.parse(s"$u1:5")
    assert(s.contains(u1, 5) && !s.contains(u1, 4))
    assert(s.serialize == s"$u1:5")
  }

  test("empty / null input -> empty set") {
    assert(GtidSet.parse("").isEmpty)
    assert(GtidSet.parse(null).isEmpty)
    assert(GtidSet.parse("  ").isEmpty)
  }

  test("normalize merges overlapping and adjacent ranges") {
    val n = GtidSet.normalize(
      Vector(GtidRange(5, 9), GtidRange(1, 3), GtidRange(4, 4), GtidRange(15, 20))
    )
    assert(n == Vector(GtidRange(1, 9), GtidRange(15, 20)))
  }

  test("add extends, bridges and appends like the reference SetGTID (gtid.go:58-72)") {
    val base = GtidSet.empty.add(u1, 1).add(u1, 2).add(u1, 3)
    assert(base.intervals(u1) == Vector(GtidRange(1, 3)))
    val gap = base.add(u1, 5)
    assert(gap.intervals(u1) == Vector(GtidRange(1, 3), GtidRange(5, 5)))
    // order-insensitive: filling the hole merges back to one range
    assert(gap.add(u1, 4).intervals(u1) == Vector(GtidRange(1, 5)))
  }

  test("serialize/parse is the identity on random sets (seeded property)") {
    val rnd = new Random(23)
    (1 to 200).foreach { _ =>
      val s = (1 to rnd.nextInt(40)).foldLeft(GtidSet.empty) { (acc, _) =>
        val u = if (rnd.nextBoolean()) u1 else u2
        val start = rnd.nextInt(1000).toLong + 1
        acc.addRange(u, GtidRange(start, start + rnd.nextInt(20)))
      }
      assert(GtidSet.parse(s.serialize) == s)
    }
  }

  test("insert agrees with full normalize on random range soups (seeded property)") {
    val rnd = new Random(7)
    (1 to 200).foreach { _ =>
      val ranges = Vector.fill(rnd.nextInt(30) + 1) {
        val s = rnd.nextInt(100).toLong
        GtidRange(s, s + rnd.nextInt(10))
      }
      val viaInsert = ranges.foldLeft(Vector.empty[GtidRange])(GtidSet.insert)
      assert(viaInsert == GtidSet.normalize(ranges))
    }
  }

  test("scattered adds stay fast: 100k stride inserts, not quadratic re-sorts") {
    // a shuffled batch hands the GTID aggregate positions in stride
    // order (worst case for a re-sorting insert); budget is generous —
    // the quadratic version takes minutes
    val t0 = System.nanoTime()
    var s = GtidSet.empty
    var i = 0L
    while (i < 100000) { s = s.add(u1, (i * 37) % 100000); i += 1 }
    (1L until 37L).foreach(r => s = s.add(u1, r)) // won't all merge; fill
    assert(s.contains(u1, 0) && s.contains(u1, 99999 - 2))
    assert((System.nanoTime() - t0) / 1e9 < 20.0)
  }

  test("merge is commutative and idempotent (seeded property)") {
    val rnd = new Random(42)
    (1 to 100).foreach { _ =>
      def randSet(): GtidSet =
        (1 to rnd.nextInt(20)).foldLeft(GtidSet.empty) { (s, _) =>
          val u = if (rnd.nextBoolean()) u1 else u2
          s.add(u, rnd.nextInt(50).toLong + 1)
        }
      val (a, b) = (randSet(), randSet())
      assert(a.merge(b) == b.merge(a))
      assert(a.merge(a) == a)
      assert(a.merge(b).merge(b) == a.merge(b))
    }
  }

  test("unionSorted agrees with normalize on random sorted soups (seeded property)") {
    val rnd = new Random(91)
    (1 to 200).foreach { _ =>
      def soup(n: Int): Vector[GtidRange] = Vector.fill(n) {
        val s = rnd.nextInt(100).toLong
        GtidRange(s, s + rnd.nextInt(10))
      }.sortBy(_.start)
      val a = GtidSet.normalize(soup(rnd.nextInt(20) + 1)) // canonical side
      val b = soup(rnd.nextInt(20) + 1) // sorted but possibly overlapping
      assert(GtidSet.unionSorted(a, b) == GtidSet.normalize(a ++ b))
    }
  }

  test("batched accumulator equals per-row adds on ANY row order (seeded property)") {
    import graft.functions.GtidAccum
    val rnd = new Random(23)
    (1 to 20).foreach { _ =>
      val gnos = Vector.fill(3000)(rnd.nextInt(2000).toLong + 1)
      val perRow = gnos.foldLeft(GtidSet.empty)((s, g) => s.add(u1, g))
      val batched = gnos.foldLeft(GtidAccum.empty)((b, g) => b.add(u1, g)).result
      assert(batched == perRow)
      // and a mid-stream merge of two half-accumulators converges too
      val (h1, h2) = gnos.splitAt(gnos.length / 2)
      val a1 = h1.foldLeft(GtidAccum.empty)((b, g) => b.add(u1, g))
      val a2 = h2.foldLeft(GtidAccum.empty)((b, g) => b.add(u1, g))
      assert(a1.result.merge(a2.result) == perRow)
    }
  }

  test("scattered aggregation stays linear-ish: 500k stride positions under a second-scale budget") {
    // the sf1 sweep's finding: stride order (what a shuffle hands the
    // aggregate) made per-row insertion O(rows × intervals) — 12.9 s
    // for 500k positions. The batched accumulator must hold this to
    // seconds even at the worst stride.
    import graft.functions.GtidAccum
    val t0 = System.nanoTime()
    var b = GtidAccum.empty
    var i = 0L
    while (i < 500000) { b = b.add(u1, (i * 199) % 1000000); i += 1 }
    val set = b.result
    assert(set.contains(u1, 199) && !set.contains(u1, 1))
    assert((System.nanoTime() - t0) / 1e9 < 10.0,
      "batched GTID aggregation must not degrade on scattered input")
  }

  test("subsetOf: interval containment without enumeration") {
    val small = GtidSet.parse(s"$u1:5-10:20-25")
    val big = GtidSet.parse(s"$u1:1-30")
    assert(small.subsetOf(big))
    assert(!big.subsetOf(small))
    // range crossing a gap in the cover is NOT a subset
    val gappy = GtidSet.parse(s"$u1:1-9:11-30")
    assert(!small.subsetOf(gappy))
    // different uuid is never covered
    assert(!GtidSet.parse(s"$u2:1-2").subsetOf(big))
    assert(GtidSet.empty.subsetOf(big))
  }

  test("subsetOf on realistic billion-wide ranges returns instantly") {
    val wide = GtidSet.parse(s"$u1:1-9999999999")
    val inner = GtidSet.parse(s"$u1:5-9999999998")
    val t0 = System.nanoTime()
    assert(inner.subsetOf(wide))
    assert(!wide.subsetOf(inner))
    assert((System.nanoTime() - t0) < 1e9, "subsetOf must be interval arithmetic, not enumeration")
  }

  test("subsetOf agrees with brute-force enumeration on small random sets") {
    val rnd = new Random(7)
    (1 to 200).foreach { _ =>
      def randSet(): GtidSet =
        (1 to rnd.nextInt(12)).foldLeft(GtidSet.empty) { (s, _) =>
          s.add(u1, rnd.nextInt(30).toLong + 1)
        }
      val (a, b) = (randSet(), randSet())
      val brute = a.intervals.getOrElse(u1, Vector.empty).forall { r =>
        (r.start to r.end).forall(g => b.contains(u1, g))
      }
      assert(a.subsetOf(b) == brute, s"a=${a.serialize} b=${b.serialize}")
    }
  }
}

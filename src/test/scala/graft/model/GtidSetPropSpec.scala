package graft.model

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck algebra of [[GtidSet]] (SURVEY §5.3(b)): the offset
  * type of the streaming source must behave as a join-semilattice —
  * merge commutative, associative, idempotent — or checkpoint
  * replay/merge order would change the resume point. Plus codec
  * roundtrip and the subsetOf/merge galois connection the watermark
  * gate relies on.
  */
object GtidSetPropSpec extends Properties("GtidSet") {

  private val genUuid: Gen[String] = Gen.oneOf("srv-a", "srv-b", "srv-c")

  private val genRange: Gen[(String, GtidRange)] = for {
    u <- genUuid
    start <- Gen.chooseNum(0L, 500L)
    len <- Gen.chooseNum(0L, 50L)
  } yield (u, GtidRange(start, start + len))

  private val genSet: Gen[GtidSet] =
    Gen.listOfN(8, genRange).map(_.foldLeft(GtidSet.empty) {
      case (acc, (u, r)) => acc.addRange(u, r)
    })

  property("serialize ∘ parse = identity") = Prop.forAll(genSet) { s =>
    GtidSet.parse(s.serialize) == s
  }

  property("merge is commutative") = Prop.forAll(genSet, genSet) { (a, b) =>
    a.merge(b) == b.merge(a)
  }

  property("merge is associative") = Prop.forAll(genSet, genSet, genSet) { (a, b, c) =>
    a.merge(b).merge(c) == a.merge(b.merge(c))
  }

  property("merge is idempotent") = Prop.forAll(genSet) { s =>
    s.merge(s) == s
  }

  property("subsetOf(a, a.merge(b)) — merge only grows") =
    Prop.forAll(genSet, genSet) { (a, b) => a.subsetOf(a.merge(b)) }

  property("a.subsetOf(b) iff a.merge(b) == b — the watermark gate's contract") =
    Prop.forAll(genSet, genSet) { (a, b) => a.subsetOf(b) == (a.merge(b) == b) }

  property("contains agrees with per-gno membership after merge") =
    Prop.forAll(genSet, genUuid, Gen.chooseNum(0L, 600L)) { (s, u, gno) =>
      s.add(u, gno).contains(u, gno)
    }

  property("add is order-insensitive (running union ≡ batch union)") =
    Prop.forAll(Gen.listOfN(30, genRange)) { rs =>
      val forward = rs.foldLeft(GtidSet.empty) { case (a, (u, r)) => a.addRange(u, r) }
      val reverse = rs.reverse.foldLeft(GtidSet.empty) { case (a, (u, r)) => a.addRange(u, r) }
      forward == reverse
    }
}

package graft.cdc

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.mutable
import scala.util.Random

class ChangeFeedSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  test("latestState equals a HashMap replay of the same events (seeded property)") {
    val rnd = new Random(1234)
    (1 to 20).foreach { _ =>
      val n = 200 + rnd.nextInt(300)
      val events = (1L to n.toLong).map { pos =>
        val pk = rnd.nextInt(30).toLong
        val op = rnd.nextInt(5) match {
          case 0 => "insert"
          case 4 => "delete"
          case _ => "update"
        }
        (pos, pk, op, rnd.nextDouble())
      }
      // reference model: apply in pos order into a mutable map
      val model = mutable.LinkedHashMap.empty[Long, (Long, String, Double)]
      events.sortBy(_._1).foreach { case (pos, pk, op, v) =>
        if (op == "delete") model.remove(pk) else model.update(pk, (pos, op, v))
      }
      // engine: latest-wins window over an arbitrarily-shuffled frame
      val feed = spark
        .createDataset(Random.shuffle(events))
        .toDF("pos", "pk", "op", "value")
        .repartition(7)
      val got = ChangeFeed
        .latestState(feed)
        .select("pk", "pos", "op", "value")
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2), r.getDouble(3)))
        .toMap
      // deletes that were later overwritten by an update/insert reappear in
      // latestState (window keeps latest row; the map replay re-adds too) —
      // but a FINAL delete drops the key in both.
      assert(got == model.toMap)
    }
  }

  test("withBeforeImage pairs each row with its predecessor per key") {
    val feed = Seq(
      (1L, 10L, "insert", 1.0),
      (2L, 10L, "update", 2.0),
      (3L, 10L, "update", 3.0),
      (4L, 20L, "insert", 9.0)
    ).toDF("pos", "pk", "op", "value")
    val rows = ChangeFeed
      .withBeforeImage(feed, Seq("value"))
      .orderBy("pos")
      .select("pos", "before_value")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
    assert(rows.toSeq == Seq(
      (1L, None), (2L, Some(1.0)), (3L, Some(2.0)), (4L, None)
    ))
  }

  test("ddlKind gates statements by uppercase prefix (incremental.go:212-217)") {
    val cases = Seq(
      "CREATE TABLE t (x int)" -> Some("create"),
      "  create index i on t(x)" -> Some("create"), // TrimSpace + ToUpper
      "alter table t add y int" -> Some("alter"),
      "DROP TABLE t" -> Some("drop"),
      "RENAME TABLE a TO b" -> Some("rename"),
      "truncate t" -> Some("truncate"),
      "INSERT INTO t VALUES (1)" -> None, // row change, not DDL
      "BEGIN" -> None,
      "SET names utf8" -> None,
      "GRANT ALL ON *.* TO x" -> None,
      "-- CREATE nothing" -> None // comment prefix is not a verb
    )
    val got = cases.map(_._1).toDF("stmt")
      .select(col("stmt"), ChangeFeed.ddlKind(col("stmt")).as("kind"))
      .collect()
      .map(r => r.getString(0) -> Option(r.getString(1)))
      .toMap
    cases.foreach { case (stmt, want) => assert(got(stmt) == want, stmt) }
  }

  test("opCol classification matches the reference switch semantics") {
    val df = Seq("signup", "error", "click", "purchase").toDF("event_type")
    val got = df.select(col("event_type"), ChangeFeed.opCol(col("event_type")).as("op"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("signup" -> "insert", "error" -> "delete",
      "click" -> "update", "purchase" -> "update"))
  }
}

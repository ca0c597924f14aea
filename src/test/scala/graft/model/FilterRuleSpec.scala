package graft.model

import org.scalatest.funsuite.AnyFunSuite

/** Truth table mirrored from the reference (`pkg/config/db.go:101-165`). */
class FilterRuleSpec extends AnyFunSuite {

  test("no configuration allows everything (db.go:122-123)") {
    val r = FilterRule()
    assert(r.allow("any", "thing"))
    assert(r.allowSchemas(Seq("a", "b")) == Seq("a", "b"))
  }

  test("global include_schemas is exact match only — no wildcard for schemas (db.go:146-152)") {
    val r = FilterRule(global = Some(TableFilter(includeSchemas = Seq("app", "shop_"))))
    assert(r.allow("app", "t"))
    assert(!r.allow("application", "t"), "schemas must not get prefix semantics")
    assert(r.allow("shop_", "t"), "trailing-underscore schema pattern is a literal name")
    assert(!r.allow("shop_x", "t"))
  }

  test("table patterns support trailing-underscore prefix wildcard (db.go:155-165)") {
    val r = FilterRule(global = Some(TableFilter(includeTables = Seq("orders", "li_"))))
    assert(r.allow("s", "orders"))
    assert(r.allow("s", "li_2024"))
    assert(r.allow("s", "lineitem"), "li_ matches any 'li' prefix, underscore stripped")
    assert(!r.allow("s", "customer"))
  }

  test("exclude beats include (db.go:134-141)") {
    val r = FilterRule(global =
      Some(TableFilter(includeTables = Seq("t_"), excludeTables = Seq("t_tmp")))
    )
    assert(r.allow("s", "t_a"))
    assert(!r.allow("s", "t_tmp"))
  }

  test("exclude with prefix wildcard") {
    val r = FilterRule(global = Some(TableFilter(excludeTables = Seq("tmp_"))))
    assert(!r.allow("s", "tmp_x"))
    assert(r.allow("s", "real"))
  }

  test("per-schema rule bypasses the global gate entirely (db.go:113-115)") {
    val r = FilterRule(
      global = Some(TableFilter(includeSchemas = Seq("only_this"))),
      perSchema = Map("other" -> TableFilter(includeTables = Seq("users")))
    )
    // 'other' fails the global schema gate, but its override short-circuits
    assert(r.allow("other", "users"))
    assert(!r.allow("other", "orders"))
    // schemas without an override still go through the global rule
    assert(r.allow("only_this", "anything"))
    assert(!r.allow("unlisted", "anything"))
  }

  test("allowSchemas: override schemas always pass (Allow(schema, \"\") via db.go:101-109)") {
    val r = FilterRule(
      global = Some(TableFilter(includeSchemas = Seq("a"))),
      perSchema = Map("b" -> TableFilter(includeTables = Seq("t")))
    )
    assert(r.allowSchemas(Seq("a", "b", "c")) == Seq("a", "b"))
  }

  test("compiled Column predicate agrees with driver-side allow() on a full grid") {
    val spark = graft.TestSpark.spark
    import org.apache.spark.sql.functions.col
    val r = FilterRule(
      global = Some(
        TableFilter(
          includeSchemas = Seq("app", "shop"),
          includeTables = Seq("orders", "li_"),
          excludeTables = Seq("li_tmp")
        )
      ),
      perSchema = Map("etl" -> TableFilter(includeTables = Seq("jobs_"), excludeTables = Seq("jobs_old")))
    )
    val schemas = Seq("app", "shop", "etl", "zzz")
    val tables = Seq("orders", "li_2024", "li_tmp", "jobs_a", "jobs_old", "other")
    val grid = for { s <- schemas; t <- tables } yield (s, t)
    val df = spark.createDataFrame(grid).toDF("schema", "table")
    val got = df
      .filter(r.toColumn(col("schema"), col("table")))
      .collect()
      .map(row => (row.getString(0), row.getString(1)))
      .toSet
    val want = grid.filter { case (s, t) => r.allow(s, t) }.toSet
    assert(got == want)
  }
}

package graft.model

import org.scalatest.funsuite.AnyFunSuite

/** The FIXTURES §A.4 config shape through [[FilterConfig.parse]],
  * asserted against the reference's `Allow` truth table
  * (`pkg/config/db.go:111-144`).
  */
class FilterConfigSpec extends AnyFunSuite {

  private val toml =
    """# reference-shaped config (FIXTURES A.4)
      |[[DATASOURCE]]
      |id = "ds1"
      |type = "mysql"
      |host = "h"
      |  [DATASOURCE.global_filter]
      |  include_schemas = "app,shop"
      |  include_tables  = "orders,li_"
      |  exclude_tables  = "orders_tmp"
      |  [DATASOURCE.schema_filters.app]
      |  include_tables = "users"
      |[CDC_DATASOURCE]
      |id = "meta"
      |""".stripMargin

  test("parses the reference config shape into the rule model") {
    val rule = FilterConfig.parse(toml)
    assert(rule.global.contains(TableFilter(
      includeSchemas = Seq("app", "shop"),
      includeTables = Seq("orders", "li_"),
      excludeTables = Seq("orders_tmp"))))
    assert(rule.perSchema == Map("app" -> TableFilter(includeTables = Seq("users"))))
  }

  test("parsed rule satisfies the reference truth table") {
    val rule = FilterConfig.parse(toml)
    // per-schema override replaces the global rule entirely (db.go:113-115)
    assert(rule.allow("app", "users"))
    assert(!rule.allow("app", "orders"))
    // global: include list gates tables, trailing '_' is a prefix
    assert(rule.allow("shop", "orders"))
    assert(rule.allow("shop", "li_items"))
    assert(!rule.allow("shop", "customers"))
    // exclude beats include (db.go:134-137)
    assert(!rule.allow("shop", "orders_tmp"))
    // schema gate: not in include_schemas and no override
    assert(!rule.allow("other", "orders"))
    // schema-level pruning keeps override schemas (db.go:101-109)
    assert(rule.allowSchemas(Seq("app", "shop", "other")) == Seq("app", "shop"))
  }

  test("empty config allows everything (db.go:122-123)") {
    val rule = FilterConfig.parse("")
    assert(rule.allow("any", "thing"))
  }
}

package graft.rules

import org.scalatest.funsuite.AnyFunSuite
import graft.domain.IngestionConfigRule

/** Rule-matching semantics pinned by the reference's own tests
  * (config_matching_tests.rs:40-72). */
class RuleMatcherSpec extends AnyFunSuite {

  private val rules = Seq(
    IngestionConfigRule(".*\\.csv$", "csv_data"),
    IngestionConfigRule(".*test_no_headers\\.csv$", "csv_no_headers_data"),
    IngestionConfigRule("logs/.*\\.txt$", "text_logs"),
    IngestionConfigRule("reports/.*\\.xlsx?$", "excel_reports"),
    IngestionConfigRule(".*\\.xlsx?$", "excel_data"))
  private val m = new RuleMatcher(rules)

  test("longest pattern wins on multi-match (config_matching_tests.rs:40-47)") {
    assert(m.findBestMatch("data/test_no_headers.csv").get.targetTable == "csv_no_headers_data")
  }

  test("general rule matches when specific doesn't") {
    assert(m.findBestMatch("data/other.csv").get.targetTable == "csv_data")
  }

  test("no match -> None (config_matching_tests.rs:58-64)") {
    assert(m.findBestMatch("data/file.parquet").isEmpty)
  }

  test("path-anchored pattern requires the prefix (config_matching_tests.rs:66-72)") {
    assert(m.findBestMatch("logs/app.txt").get.targetTable == "text_logs")
    assert(m.findBestMatch("data/app.txt").isEmpty)
  }

  test("prefix-scoped beats general for reports xlsx") {
    assert(m.findBestMatch("reports/q1.xlsx").get.targetTable == "excel_reports")
    assert(m.findBestMatch("archive/q1.xlsx").get.targetTable == "excel_data")
  }
}

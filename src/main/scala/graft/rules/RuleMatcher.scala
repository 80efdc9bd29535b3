package graft.rules

import scala.util.matching.Regex
import graft.domain.IngestionConfigRule
import graft.ports.ConfigRepository

/** Regex routing rules with longest-pattern-wins resolution.
  *
  * reference: src/infrastructure/mongodb/config_repo.rs:26-66 (P1: test
  * every rule's pattern against the key) and :73-77 (P2: among matches the
  * longest pattern string wins — the behavior pinned by
  * tests/config_matching_tests.rs:40-47). The reference's CouchDB and
  * DocumentDB repos returned the *first* match instead
  * (couchdb/config_repo.rs:43-57) — this engine standardizes on
  * longest-wins everywhere.
  *
  * Unlike the reference — which re-fetched the whole rule table and
  * recompiled every regex per file (config_repo.rs:30,54) — rules are
  * loaded once and the regexes precompiled; at scale this set is tiny and
  * belongs broadcast to executors if matching ever moves into the data
  * plane (`regexp_like(key, pattern)`).
  */
final class RuleMatcher(rules: Seq[IngestionConfigRule]) extends ConfigRepository {

  private val compiled: Seq[(Regex, IngestionConfigRule)] =
    rules.map(r => (r.pattern.r, r))

  override def allRules: Seq[IngestionConfigRule] = rules

  /** All rules whose pattern matches anywhere in the key (the reference
    * used Regex::is_match, i.e. unanchored find). */
  def matching(key: String): Seq[IngestionConfigRule] =
    compiled.collect { case (re, rule) if re.findFirstIn(key).isDefined => rule }

  override def findBestMatch(key: String): Option[IngestionConfigRule] = {
    val m = matching(key)
    if (m.isEmpty) None else Some(m.maxBy(_.pattern.length))
  }
}

object RuleMatcher {
  /** The reference's seed rule set (migration.js:5-51), as Scala fixtures. */
  def seedRules: Seq[IngestionConfigRule] = {
    import graft.domain.ParserConfig
    Seq(
      IngestionConfigRule(".*\\.csv$", "csv_data"),
      IngestionConfigRule(".*\\.json$", "json_data"),
      IngestionConfigRule("reports/.*\\.xlsx?$", "excel_reports"),
      IngestionConfigRule("logs/.*\\.txt$", "text_logs"),
      IngestionConfigRule(".*\\.xml$", "xml_data"),
      IngestionConfigRule(".*\\.xlsx?$", "excel_data"),
      IngestionConfigRule(
        ".*test_no_headers\\.csv$",
        "csv_no_headers_data",
        Some(ParserConfig(headers = Some(Seq("name", "age", "email", "city"))))),
    )
  }
}

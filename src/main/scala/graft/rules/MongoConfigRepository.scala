package graft.rules

import com.fasterxml.jackson.databind.JsonNode
import graft.domain.{IngestionConfigRule, ParserConfig}
import graft.ports.ConfigRepository
import graft.sinks.MongoWire

/** Routing rules loaded from the `ingestion_config` collection over the
  * MongoDB wire — the reference's config repository path (reference:
  * src/infrastructure/mongodb/config_repo.rs:16-21 binds the collection,
  * :29-33 `find` with an empty filter; field names are the serde
  * defaults of models.rs:4-9, i.e. snake_case `target_table` /
  * `parser_config`, seeded by migration.js:5-51).
  *
  * Documented improvement, same as RuleMatcher's scaladoc: the reference
  * re-ran the find AND recompiled every regex on EVERY key lookup
  * (config_repo.rs:30,54) — here rules are fetched once at construction
  * and matching delegates to the precompiled RuleMatcher. The rule table
  * is control-plane-sized; a long-lived service wanting rule updates
  * re-constructs the repository (one find), it never per-key round-trips.
  */
final class MongoConfigRepository(host: String, port: Int, database: String,
    credential: Option[graft.sinks.MongoCredential] = None)
    extends ConfigRepository {

  private val matcher =
    new RuleMatcher(MongoConfigRepository.loadRules(host, port, database, credential))

  override def allRules: Seq[IngestionConfigRule] = matcher.allRules
  override def findBestMatch(key: String): Option[IngestionConfigRule] =
    matcher.findBestMatch(key)
}

object MongoConfigRepository {

  /** One wire round-trip: find on `{database}.ingestion_config`. */
  def loadRules(host: String, port: Int, database: String,
      credential: Option[graft.sinks.MongoCredential] = None): Seq[IngestionConfigRule] =
    MongoWire.withConnection(host, port) { (out, in) =>
      credential.foreach(c => MongoWire.authenticate(out, in, c.authDb, c.user, c.password))
      MongoWire.find(out, in, database, "ingestion_config").map(ruleFromBson)
    }

  /** BSON document -> rule, with the reference's snake_case fields. */
  private[rules] def ruleFromBson(doc: JsonNode): IngestionConfigRule = {
    def req(field: String): String = {
      val n = doc.get(field)
      require(n != null && n.isTextual, s"config rule missing '$field': $doc")
      n.asText()
    }
    val pc = Option(doc.get("parser_config")).filter(_.isObject).map { p =>
      ParserConfig(
        headers = Option(p.get("headers")).filter(_.isArray).map { arr =>
          val b = Seq.newBuilder[String]
          arr.forEach(h => b += h.asText())
          b.result()
        },
        delimiter = Option(p.get("delimiter")).filter(_.isTextual).map(_.asText()),
        hasHeaders = Option(p.get("has_headers")).filter(_.isBoolean).map(_.asBoolean()),
        sheetIndex = Option(p.get("sheet_index")).filter(_.isNumber).map(_.asInt()))
    }
    IngestionConfigRule(req("pattern"), req("target_table"), pc)
  }
}

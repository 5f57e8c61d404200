package graft.sparql

import graft.model.TermValue

/** IRI and literal → term resolution.
  *
  * Mirrors the reference's `str_to_datavalue`
  * (`/root/reference/src/calc_engine.rs:3031-3069`) and
  * `literal_to_datavalue` (`:3304-3349`), with two documented
  * tolerances (CONFORMANCE):
  *   - `…/prop/direct/Qn` resolves to the Q entity (the reference's own
  *     test corpus writes `wdt:Q31` for Belgium,
  *     `test_requests.txt:5,16-37`, which its anchored regexes would
  *     miss — we resolve it so the published row counts hold);
  *   - statement IRIs accept the real claim-id alphabet
  *     (`Q31$uuid → Q31-uuid`), not just digits.
  */
object Iris {

  private val wd = "http://www.wikidata.org/entity/"
  private val wdt = "http://www.wikidata.org/prop/direct/"
  private val pstmt = "http://www.wikidata.org/prop/"
  private val wds = "http://www.wikidata.org/entity/statement/"

  private val entQ = ("^" + java.util.regex.Pattern.quote(wd) + """Q(\d+)""").r.unanchored
  // lexeme sub-entities (forms/senses, `wd:L4589-F1`): identifier
  // terms, matching the opt-in lexeme ingest's form/sense nodes (the
  // reference collapses such ids to L0 via its u64-parse fallback,
  // `src/parser.rs:287-297` — a documented tolerance, like dirQ below)
  private val entSub = ("^" + java.util.regex.Pattern.quote(wd) + """(L\d+-[FS]\d+)$""").r
  private val entL = ("^" + java.util.regex.Pattern.quote(wd) + """L(\d+)""").r.unanchored
  private val dirP = ("^" + java.util.regex.Pattern.quote(wdt) + """P(\d+)""").r.unanchored
  private val dirQ = ("^" + java.util.regex.Pattern.quote(wdt) + """Q(\d+)""").r.unanchored
  private val dirL = ("^" + java.util.regex.Pattern.quote(wdt) + """L(\d+)""").r.unanchored
  private val stmtP = (java.util.regex.Pattern.quote(pstmt) + """P(\d+)""").r.unanchored
  private val stmtIri = (java.util.regex.Pattern.quote(wds) + """(\S+)""").r.unanchored

  /** Resolve a full IRI to a term. Unknown IRIs become plain string
    * terms (reference fallback, `calc_engine.rs:3067-3068`).
    */
  def resolve(iri: String): TermValue = iri match {
    case entQ(n) => TermValue.entityQ(n.toLong)
    case entSub(id) => TermValue.ident(id)
    case entL(n) => TermValue.entityL(n.toLong)
    case dirP(n) => TermValue.propDirect(n.toLong)
    case dirQ(n) => TermValue.entityQ(n.toLong) // tolerant: wdt:Q31
    case dirL(n) => TermValue.entityL(n.toLong)
    case stmtIri(s) => TermValue.namedEdge(s.replace("$", "-"))
    case stmtP(n) => TermValue.propStmt(n.toLong)
    case _ => TermValue.str(iri)
  }

  /** The prefix set every query sees (reference prepends these,
    * `src/interpreter.rs:58-94`).
    */
  val defaultPrefixes: Map[String, String] = Map(
    "bd" -> "http://www.bigdata.com/rdf#",
    "cc" -> "http://creativecommons.org/ns#",
    "dct" -> "http://purl.org/dc/terms/",
    "geo" -> "http://www.opengis.net/ont/geosparql#",
    "ontolex" -> "http://www.w3.org/ns/lemon/ontolex#",
    "owl" -> "http://www.w3.org/2002/07/owl#",
    "schema" -> "http://schema.org/",
    "prov" -> "http://www.w3.org/ns/prov#",
    "rdf" -> "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs" -> "http://www.w3.org/2000/01/rdf-schema#",
    "skos" -> "http://www.w3.org/2004/02/skos/core#",
    "p" -> "http://www.wikidata.org/prop/",
    "pq" -> "http://www.wikidata.org/prop/qualifier/",
    "pqn" -> "http://www.wikidata.org/prop/qualifier/value-normalized/",
    "pqv" -> "http://www.wikidata.org/prop/qualifier/value/",
    "pr" -> "http://www.wikidata.org/prop/reference/",
    "prn" -> "http://www.wikidata.org/prop/reference/value-normalized/",
    "prv" -> "http://www.wikidata.org/prop/reference/value/",
    "ps" -> "http://www.wikidata.org/prop/statement/",
    "psn" -> "http://www.wikidata.org/prop/statement/value-normalized/",
    "psv" -> "http://www.wikidata.org/prop/statement/value/",
    "wd" -> "http://www.wikidata.org/entity/",
    "wdata" -> "http://www.wikidata.org/wiki/Special:EntityData/",
    "wdno" -> "http://www.wikidata.org/prop/novalue/",
    "wdref" -> "http://www.wikidata.org/reference/",
    "wds" -> "http://www.wikidata.org/entity/statement/",
    "wdt" -> "http://www.wikidata.org/prop/direct/",
    "wdtn" -> "http://www.wikidata.org/prop/direct-normalized/",
    "wdv" -> "http://www.wikidata.org/value/",
    "wikibase" -> "http://wikiba.se/ontology#",
    "xsd" -> "http://www.w3.org/2001/XMLSchema#")

  /** Typed literal → term (`literal_to_datavalue`,
    * `calc_engine.rs:3304-3349`): integer→i32, decimal→f32, boolean,
    * plain string. Extensions (CONFORMANCE): double/float behave like
    * decimal; `"x"@lang` becomes monolingual text (reference: Null).
    */
  def literal(lex: String, datatypeIri: Option[String], lang: Option[String]): TermValue =
    (lang, datatypeIri) match {
      case (Some(l), _) => TermValue.mono(lex, l)
      case (None, None) => TermValue.str(lex)
      case (None, Some(dt)) =>
        if (dt.contains("integer"))
          lex.toIntOption.map(TermValue.int).getOrElse(TermValue.nullValue)
        else if (dt.contains("decimal") || dt.contains("double") || dt.contains("float"))
          lex.toFloatOption.map(TermValue.float).getOrElse(TermValue.nullValue)
        else if (dt.contains("boolean"))
          lex.toBooleanOption.map(TermValue.bool).getOrElse(TermValue.nullValue)
        else if (dt.contains("dateTime")) parseDateTime(lex)
        else if (dt.contains("string")) TermValue.str(lex)
        else TermValue.nullValue
    }

  /** xsd:dateTime literal → time term (engine extension; the reference
    * has no dateTime literal path, times only enter via ingest).
    *
    * Key convention matches spec-mode STRDT exactly
    * (`Expressions.scala` Func.StrDt): SECOND precision (14) — the
    * precision the dump parser stores for a second-resolution time —
    * with the timezone offset (minutes, `Z`/absent → 0) carried in the
    * key's tz field and the iso fields taken as written. A query
    * literal and a STRDT-minted term of the same lexical form
    * therefore sameTerm/join/DISTINCT-collapse, and both key-equal a
    * store-parsed second-precision time of the same instant+offset.
    */
  def parseDateTime(lex: String): TermValue = {
    val re = """^([+-]?\d+)-(\d{2})-(\d{2})T(\d{2}):(\d{2}):(\d{2})(Z|[+-]\d{2}:\d{2})?$""".r
    lex match {
      case re(ys, mo, d, h, mi, s, tzTok) =>
        val y = ys.toLong
        val iso = f"$y%04d-${mo.toInt}%02d-${d.toInt}%02dT${h.toInt}%02d:${mi.toInt}%02d:${s.toInt}%02dZ"
        val sortKey = y * 1e10 + mo.toInt * 1e8 + d.toInt * 1e6 + h.toInt * 1e4 + mi.toInt * 1e2 + s.toInt
        val tzMin = tzTok match {
          case null | "Z" => 0
          case t =>
            val sign = if (t.startsWith("-")) -1 else 1
            sign * (t.substring(1, 3).toInt * 60 + t.substring(4, 6).toInt)
        }
        TermValue("time", Some(sortKey), Some(iso), None, s"t:$iso|14|0|0|$tzMin|G")
      case _ => TermValue.nullValue
    }
  }
}

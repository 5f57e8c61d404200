package graft.ingest

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import graft.model.Render

/** One quad term as a flat encodable case class; mirrors the term struct
  * schema in [[graft.model.Term]].
  */
final case class T(
    kind: String,
    num: Option[Double],
    str: Option[String],
    lang: Option[String],
    key: String)

/** One statement row: subject, predicate, object, statement id, the
  * named graph (`graph` = the dump entity document the quad was parsed
  * from — provenance, the store's named-graph model; qualifiers carry
  * their parent document's graph even though their subject is the claim
  * edge), plus the ingest ordinal (`ord`) used to reproduce the
  * reference's stable insertion order for order-sensitive aggregates
  * (SAMPLE / GROUP_CONCAT — the reference's sort-based grouping is a
  * stable merge sort over insertion order,
  * `src/relation/materialized_relation.rs:463`).
  */
final case class Quad(s: T, p: T, o: T, id: T, graph: T, ord: Long)

/** Line-wise Wikidata JSON dump parser.
  *
  * Re-implements the quad production of the reference parser
  * (`/root/reference/src/parser.rs:423-494`):
  *   - labels / descriptions / aliases become ordinary edges whose
  *     predicate is a language-tagged Label/Description/Alias term
  *     (`parser.rs:441-474`)
  *   - claims become *named* edges (the `$` in the dump claim id is
  *     rewritten to `-`, `parser.rs:480-483`)
  *   - qualifiers are edges whose subject is the parent claim edge
  *     (`parser.rs:484-492`) — statements are first-class nodes
  *
  * Strictness mirrors serde: a line that fails to deserialize (missing
  * required field, unknown snak datatype, malformed time) is skipped
  * whole (`parser.rs:432-438`).
  *
  * Pure Scala + Jackson so it runs inside `Dataset.flatMap` on executors;
  * Spark parallelizes by input split (the reference needed rayon,
  * `parser.rs:419-421`).
  */
object WikidataParser extends Serializable {

  import graft.model.Term.Kind

  @transient private lazy val mapper = new ObjectMapper()

  private val knownDatatypes = Set(
    "external-id", "string", "geo-shape", "commonsMedia", "url", "math",
    "musical-notation", "tabular-data", "globe-coordinate", "wikibase-item",
    "wikibase-property", "wikibase-lexeme", "wikibase-sense", "wikibase-form",
    "quantity", "time", "monolingualtext")

  private val timeRe = """^([+-]\d+)-(\d{2})-(\d{2})T(\d{2}):(\d{2}):(\d{2})Z$""".r
  private val globeRe = """Q(\d+)$""".r.unanchored

  /** `str_to_wikidataid` (`parser.rs:287-297`): first char picks the
    * entity kind, the rest parses as u64 with fallback 0 (so lexeme
    * sub-ids like "L123-S4" collapse to L0 — reference quirk kept).
    */
  private def entityTerm(id: String): T = {
    if (id.isEmpty) return nullT
    val num = id.drop(1).toLongOption.getOrElse(0L).toDouble
    id.charAt(0) match {
      case 'Q' => T(Kind.Q, Some(num), None, None, s"Q:${num.toLong}")
      case 'P' => T(Kind.P, Some(num), None, None, s"P:${num.toLong}")
      case 'L' => T(Kind.L, Some(num), None, None, s"L:${num.toLong}")
      case _   => nullT
    }
  }

  private val nullT = T(Kind.Null, None, None, None, "0:")

  private def strT(kind: String, prefix: String, v: String): T =
    T(kind, None, Some(v), None, s"$prefix:$v")

  /** Sortable numeric key for a time value: lexicographic on
    * (year, month, day, hour, minute, second); supports the reference's
    * same-calendar partial order (`src/data_types.rs:410-439`).
    */
  private def timeSortKey(y: Long, mo: Int, d: Int, h: Int, mi: Int, s: Int): Double =
    y * 1e10 + mo * 1e8 + d * 1e6 + h * 1e4 + mi * 1e2 + s

  private case class ParseError(msg: String) extends RuntimeException(msg)

  /** Snak datavalue → term (reference `get_datavalue`, `parser.rs:349-375`).
    * Throws ParseError to skip the whole line on malformed input, like
    * serde.
    */
  private def snakValue(datatype: String, dv: JsonNode): T = {
    if (!knownDatatypes.contains(datatype)) throw ParseError(s"unknown datatype $datatype")
    if (dv == null || dv.isNull) return nullT
    val v = dv.get("value")
    if (v == null) throw ParseError("datavalue without value")
    datatype match {
      case "string"           => strT(Kind.Str, "s", v.asText())
      case "external-id"      => strT(Kind.Ident, "id", v.asText())
      case "url"              => strT(Kind.Url, "u", v.asText())
      case "geo-shape"        => strT(Kind.Geo, "geo", v.asText())
      case "commonsMedia"     => strT(Kind.Media, "md", v.asText())
      case "math"             => strT(Kind.Math, "mth", v.asText())
      case "musical-notation" => strT(Kind.Music, "mus", v.asText())
      case "tabular-data"     => strT(Kind.Tab, "tab", v.asText())
      case "wikibase-item" | "wikibase-property" | "wikibase-lexeme" |
          "wikibase-sense" | "wikibase-form" =>
        val id = v.get("id")
        if (id == null) throw ParseError("entity value without id")
        entityTerm(id.asText())
      case "monolingualtext" =>
        val text = req(v, "text").asText(); val lang = req(v, "language").asText()
        T(Kind.Mono, None, Some(text), Some(lang), s"mo:$lang:$text")
      case "quantity" =>
        val amount = req(v, "amount").asText()
        val unit = if (v.has("unit")) v.get("unit").asText() else "1"
        val ub = if (v.has("upperBound") && !v.get("upperBound").isNull) v.get("upperBound").asText() else ""
        val lb = if (v.has("lowerBound") && !v.get("lowerBound").isNull) v.get("lowerBound").asText() else ""
        T(Kind.Quantity, amount.toDoubleOption, Some(amount), None, s"q:$amount|$unit|$ub|$lb")
      case "time" =>
        val raw = req(v, "time").asText()
        raw match {
          case timeRe(ys, mo, d, h, mi, s) =>
            val y = ys.toLong
            val iso = f"$y%04d-${mo.toInt}%02d-${d.toInt}%02dT${h.toInt}%02d:${mi.toInt}%02d:${s.toInt}%02dZ"
            val prec = if (v.has("precision")) v.get("precision").asInt() else 11
            val before = if (v.has("before")) v.get("before").asInt() else 0
            val after = if (v.has("after")) v.get("after").asInt() else 0
            val tz = if (v.has("timezone")) v.get("timezone").asInt() else 0
            val cal = if (v.has("calendarmodel")) v.get("calendarmodel").asText() else ""
            val calId = cal match {
              case c if c.endsWith("Q1985727") => "G"
              case c if c.endsWith("Q1985786") => "J"
              case _ => throw ParseError(s"unknown calendar $cal")
            }
            T(Kind.Time, Some(timeSortKey(y, mo.toInt, d.toInt, h.toInt, mi.toInt, s.toInt)),
              Some(iso), None, s"t:$iso|$prec|$before|$after|$tz|$calId")
          case _ => throw ParseError(s"bad time $raw")
        }
      case "globe-coordinate" =>
        val lat = req(v, "latitude").asDouble().toFloat
        val lon = req(v, "longitude").asDouble().toFloat
        val globeIri = req(v, "globe").asText()
        val globe = globeIri match {
          case globeRe(n) => n
          case _ => throw ParseError(s"bad globe $globeIri")
        }
        val prec =
          if (v.has("precision") && !v.get("precision").isNull) v.get("precision").asDouble().toFloat.toString
          else ""
        val rendered = s"Point(${Render.formatFloat(lon)} ${Render.formatFloat(lat)})"
        T(Kind.Coord, None, Some(rendered), None, s"c:$lat|$lon|$globe|$prec")
    }
  }

  private def req(n: JsonNode, field: String): JsonNode = {
    val f = n.get(field)
    if (f == null) throw ParseError(s"missing $field")
    f
  }

  /** Parse one dump line into quads. Returns empty on skipped/malformed
    * lines, mirroring `parse_line` (`parser.rs:423-438`). With
    * `lexemes=true`, L-entity lines (which the reference's serde schema
    * declares but can never deserialize — its required `labels` field
    * is absent from lexeme lines, `parser.rs:73,88-140`, so every one
    * is skipped) parse into quads too; default off keeps exact
    * reference parity.
    */
  def parseLine(line: String, parseQualifiers: Boolean = true,
                languageFilter: Option[Set[String]] = None,
                lexemes: Boolean = false): Seq[Quad] = {
    if (line.length <= 1) return Nil // skip "[", "]" framing lines
    val body = if (line.endsWith(",")) line.dropRight(1) else line
    val root =
      try mapper.readTree(body)
      catch { case _: Exception => return Nil }
    if (root == null || !root.isObject) return Nil
    try {
      if (lexemes && root.has("type") && root.get("type").asText() == "lexeme")
        parseLexeme(root, parseQualifiers, languageFilter)
      else parseItem(root, parseQualifiers, languageFilter)
    } catch { case ParseError(_) => Nil }
  }

  /** Per-line quad accumulator: insertion-ordered quads, anonymous edge
    * ids minted per entity document, provenance graph = the document's
    * entity (qualifiers and form/sense edges carry their parent
    * document's graph even though their subject is another node).
    */
  private final class Builder(entityId: String, graph: T) {
    val quads = ArrayBuffer.empty[Quad]
    private var seq = 0L
    private var anonSeq = 0L
    def anonEdge(): T = {
      anonSeq += 1
      val id = s"$entityId-a$anonSeq"
      T(graft.model.Term.Kind.Edge, None, Some(id), None, s"E:$id")
    }
    def add(s: T, p: T, o: T, id: T): Unit = {
      quads += Quad(s, p, o, id, graph, seq); seq += 1
    }
  }

  /** `{lang: {value: …}}` language map → one `kind(lang)` edge per
    * entry; labels/descriptions (`parser.rs:441-461`), lexeme lemmas,
    * form representations and sense glosses all share this dump shape.
    */
  private def addLangMap(b: Builder, subject: T, node: JsonNode,
                         kind: String, prefix: String,
                         langOk: String => Boolean): Unit =
    if (node != null && node.isObject)
      node.properties().asScala.foreach { e =>
        val lang = e.getKey
        if (langOk(lang)) {
          val value = req(e.getValue, "value").asText()
          b.add(subject, T(kind, None, Some(lang), None, s"$prefix:$lang"),
            strT(Kind.Str, "s", value), b.anonEdge())
        }
      }

  /** Claims object (`{prop: [claim…]}`) → named edges + qualifier
    * edges-on-edges (`parser.rs:476-493`); shared by entity, lexeme,
    * form and sense subjects.
    */
  private def addClaims(b: Builder, subject: T, claims: JsonNode,
                        parseQualifiers: Boolean): Unit = {
    if (claims == null || !claims.isObject) return
    claims.properties().asScala.foreach { e =>
      if (e.getValue.isArray) {
        e.getValue.elements().asScala.foreach { claim =>
          val mainsnak = req(claim, "mainsnak")
          for (f <- Seq("snaktype", "property", "datatype")) req(mainsnak, f)
          for (f <- Seq("type", "id", "rank")) req(claim, f)
          val p = entityTerm(mainsnak.get("property").asText())
          val o =
            if (mainsnak.get("datavalue") == null || mainsnak.get("datavalue").isNull) {
              // somevalue / novalue snak → Null object (parser.rs:373)
              if (!knownDatatypes.contains(mainsnak.get("datatype").asText()))
                throw ParseError("unknown datatype")
              nullT
            } else snakValue(mainsnak.get("datatype").asText(), mainsnak.get("datavalue"))
          // "$" in the dump claim id → "-" (parser.rs:480-483)
          val claimId = claim.get("id").asText().replace("$", "-")
          val edge = T(Kind.NamedEdge, None, Some(claimId), None, s"NE:$claimId")
          b.add(subject, p, o, edge)
          if (parseQualifiers && claim.has("qualifiers") && claim.get("qualifiers").isObject) {
            claim.get("qualifiers").properties().asScala.foreach { q =>
              val qp = entityTerm(q.getKey)
              if (q.getValue.isArray) {
                q.getValue.elements().asScala.foreach { snak =>
                  for (f <- Seq("snaktype", "property", "datatype")) req(snak, f)
                  val qo =
                    if (snak.get("datavalue") == null || snak.get("datavalue").isNull) nullT
                    else snakValue(snak.get("datatype").asText(), snak.get("datavalue"))
                  b.add(edge, qp, qo, b.anonEdge())
                }
              }
            }
          }
        }
      }
    }
  }

  private def parseItem(root: JsonNode, parseQualifiers: Boolean,
                        languageFilter: Option[Set[String]]): Seq[Quad] = {
    // serde requires these fields (parser.rs:62-96); missing -> skip line
    for (f <- Seq("id", "type", "labels", "descriptions", "aliases", "claims"))
      if (!root.has(f)) throw ParseError(s"missing $f")

    val entityId = root.get("id").asText()
    val subject = entityTerm(entityId)
    val b = new Builder(entityId, subject)

    def langOk(lang: String): Boolean = languageFilter.forall(_.contains(lang))

    // labels / descriptions: one edge per language (parser.rs:441-461)
    addLangMap(b, subject, root.get("labels"), Kind.Label, "lab", langOk)
    addLangMap(b, subject, root.get("descriptions"), Kind.Desc, "des", langOk)

    // aliases: multiple values per language, flattened (parser.rs:463-474)
    val aliases = root.get("aliases")
    if (aliases.isObject) {
      aliases.properties().asScala.foreach { e =>
        val lang = e.getKey
        if (langOk(lang) && e.getValue.isArray) {
          e.getValue.elements().asScala.foreach { a =>
            b.add(subject, T(Kind.Alias, None, Some(lang), None, s"ali:$lang"),
              strT(Kind.Str, "s", req(a, "value").asText()), b.anonEdge())
          }
        }
      }
    }

    // claims: named edges, qualifiers as edges-on-edges (parser.rs:476-493)
    addClaims(b, subject, root.get("claims"), parseQualifiers)
    b.quads.toSeq
  }

  // Lexeme vocabulary: the predicates real Wikidata RDF uses for the
  // lexicographic model; unregistered IRIs are plain string terms, so
  // SPARQL reaches these via the ontolex:/wikibase:/dct: prefixes the
  // default prefix set already carries (sparql/Iris.scala) with no
  // translator changes.
  val LexicalCategoryIri = "http://wikiba.se/ontology#lexicalCategory"
  val LexemeLanguageIri = "http://purl.org/dc/terms/language"
  val LexicalFormIri = "http://www.w3.org/ns/lemon/ontolex#lexicalForm"
  val SenseIri = "http://www.w3.org/ns/lemon/ontolex#sense"
  val GrammaticalFeatureIri = "http://wikiba.se/ontology#grammaticalFeature"

  /** Opt-in lexeme-line quads, the extension the reference's schema
    * visibly intends (`parser.rs:88-96,119-140` declares lemmas/forms/
    * senses structs that never deserialize):
    *   - lemmas → Label(lang) edges on the L-entity (the label service
    *     then resolves lexeme labels like any entity's),
    *   - lexicalCategory / language → `wikibase:lexicalCategory` /
    *     `dct:language` edges to Q-entities,
    *   - each form → `ontolex:lexicalForm` edge to an identifier node
    *     (`L4589-F1`), whose representations are Label(lang) edges,
    *     grammaticalFeatures are `wikibase:grammaticalFeature` edges,
    *     and claims use the standard named-edge machinery,
    *   - each sense → `ontolex:sense` edge; glosses are
    *     Description(lang) edges; claims likewise.
    */
  private def parseLexeme(root: JsonNode, parseQualifiers: Boolean,
                          languageFilter: Option[Set[String]]): Seq[Quad] = {
    for (f <- Seq("id", "type", "lemmas", "lexicalCategory", "language", "claims"))
      if (!root.has(f)) throw ParseError(s"missing $f")

    val entityId = root.get("id").asText()
    val subject = entityTerm(entityId)
    val b = new Builder(entityId, subject)
    def langOk(lang: String): Boolean = languageFilter.forall(_.contains(lang))
    def pred(iri: String): T = strT(Kind.Str, "s", iri)

    addLangMap(b, subject, root.get("lemmas"), Kind.Label, "lab", langOk)
    b.add(subject, pred(LexicalCategoryIri),
      entityTerm(root.get("lexicalCategory").asText()), b.anonEdge())
    b.add(subject, pred(LexemeLanguageIri),
      entityTerm(root.get("language").asText()), b.anonEdge())
    addClaims(b, subject, root.get("claims"), parseQualifiers)

    val forms = root.get("forms")
    if (forms != null && forms.isArray) forms.elements().asScala.foreach { f =>
      val fT = strT(Kind.Ident, "id", req(f, "id").asText())
      b.add(subject, pred(LexicalFormIri), fT, b.anonEdge())
      addLangMap(b, fT, f.get("representations"), Kind.Label, "lab", langOk)
      val gf = f.get("grammaticalFeatures")
      if (gf != null && gf.isArray) gf.elements().asScala.foreach(g =>
        b.add(fT, pred(GrammaticalFeatureIri), entityTerm(g.asText()), b.anonEdge()))
      addClaims(b, fT, f.get("claims"), parseQualifiers)
    }

    val senses = root.get("senses")
    if (senses != null && senses.isArray) senses.elements().asScala.foreach { sN =>
      val sT = strT(Kind.Ident, "id", req(sN, "id").asText())
      b.add(subject, pred(SenseIri), sT, b.anonEdge())
      addLangMap(b, sT, sN.get("glosses"), Kind.Desc, "des", langOk)
      addClaims(b, sT, sN.get("claims"), parseQualifiers)
    }
    b.quads.toSeq
  }
}

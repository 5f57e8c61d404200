package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The RDF term value model of the engine.
  *
  * The reference stores every cell as a 64-bit tagged `Node` (type tag in
  * the top byte, payload in the low 56 bits — reference
  * `src/storage_engine/mod.rs:48-83`) backed by a string interner. A
  * Spark-native rebuild does not replicate bit-packing: a term is a
  * `StructType` column with mostly-null fields (Parquet stores nulls for
  * free, Tungsten keeps the struct unboxed, and nested-column pruning /
  * predicate pushdown keep scans cheap at 100 TB).
  *
  * Fields:
  *   - `kind`  tag, one of [[Term.Kinds]] (dictionary-encoded by Parquet)
  *   - `num`   numeric payload: entity id, int/float value, time sort key
  *   - `str`   string payload (string-ish kinds, rendered payloads for
  *             coord/time/quantity, language code for label predicates)
  *   - `lang`  language tag (monolingual text only)
  *   - `key`   canonical identity key — equality/join key. Two terms are
  *             the same RDF node iff their keys are equal, mirroring the
  *             reference's Node-id equality.
  *
  * Value-kind inventory mirrors `NodeType` (reference
  * `src/storage_engine/mod.rs:54-83`, 26 variants) and `DataValue`
  * (reference `src/data_types.rs:11-43`).
  */
object Term {

  object Kind {
    val Null = "null"
    val Q = "Q" // wikidata item entity
    val P = "P" // property, direct (wdt:) view
    val L = "L" // lexeme entity
    val Pstmt = "ps" // property, statement (p:) view
    val Str = "str"
    val Ident = "ident" // external identifier
    val Url = "url"
    val Mono = "mono" // monolingual text
    val Media = "media" // commons media
    val Geo = "geo" // geo shape
    val Tab = "tab" // tabular data
    val Math = "math"
    val Music = "music"
    val Quantity = "quant"
    val Time = "time"
    val Coord = "coord"
    val Label = "label" // label predicate, language in str
    val Desc = "desc" // description predicate
    val Alias = "alias" // alias predicate
    val Edge = "edge" // anonymous statement id
    val NamedEdge = "nedge" // named statement id (wds:)
    val Int = "int"
    val Float = "float"
    val Bool = "bool"
  }

  /** Spark schema of one term struct column. */
  val schema: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = true),
    StructField("num", DoubleType, nullable = true),
    StructField("str", StringType, nullable = true),
    StructField("lang", StringType, nullable = true),
    StructField("key", StringType, nullable = true)
  ))

  /** Build a term struct Column from field columns. */
  def struct_(kind: Column, num: Column, str: Column, lang: Column, key: Column): Column =
    struct(kind.as("kind"), num.as("num"), str.as("str"), lang.as("lang"), key.as("key"))

  /** A fully-null term struct (unbound variable / padding). */
  def nullTerm: Column = lit(null).cast(schema)
}

/** A concrete term value, used for constants in query patterns and
  * expression literals. `key` is the canonical identity; see [[Term]].
  */
final case class TermValue(
    kind: String,
    num: Option[Double],
    str: Option[String],
    lang: Option[String],
    key: String) {

  import org.apache.spark.sql.functions.{lit, typedLit}

  /** This constant as a term struct Column. */
  def toColumn: Column = Term.struct_(
    lit(kind),
    num.map(lit(_)).getOrElse(lit(null).cast(DoubleType)),
    str.map(lit(_)).getOrElse(lit(null).cast(StringType)),
    lang.map(lit(_)).getOrElse(lit(null).cast(StringType)),
    lit(key))
}

object TermValue {
  import Term.Kind

  def entityQ(id: Long): TermValue = TermValue(Kind.Q, Some(id.toDouble), None, None, s"Q:$id")
  def propDirect(id: Long): TermValue = TermValue(Kind.P, Some(id.toDouble), None, None, s"P:$id")
  def propStmt(id: Long): TermValue = TermValue(Kind.Pstmt, Some(id.toDouble), None, None, s"PS:$id")
  def entityL(id: Long): TermValue = TermValue(Kind.L, Some(id.toDouble), None, None, s"L:$id")
  def namedEdge(id: String): TermValue = TermValue(Kind.NamedEdge, None, Some(id), None, s"NE:$id")
  def str(s: String): TermValue = TermValue(Kind.Str, None, Some(s), None, s"s:$s")
  def ident(s: String): TermValue = TermValue(Kind.Ident, None, Some(s), None, s"id:$s")
  def url(s: String): TermValue = TermValue(Kind.Url, None, Some(s), None, s"u:$s")
  def media(s: String): TermValue = TermValue(Kind.Media, None, Some(s), None, s"md:$s")
  def geo(s: String): TermValue = TermValue(Kind.Geo, None, Some(s), None, s"geo:$s")
  def tab(s: String): TermValue = TermValue(Kind.Tab, None, Some(s), None, s"tab:$s")
  def math(s: String): TermValue = TermValue(Kind.Math, None, Some(s), None, s"mth:$s")
  def music(s: String): TermValue = TermValue(Kind.Music, None, Some(s), None, s"mus:$s")
  def mono(text: String, language: String): TermValue =
    TermValue(Kind.Mono, None, Some(text), Some(language), s"mo:$language:$text")
  def int(v: Int): TermValue = TermValue(Kind.Int, Some(v.toDouble), None, None, s"i:$v")
  def float(v: Float): TermValue =
    TermValue(Kind.Float, Some(v.toDouble), Some(Render.formatFloat(v)), None, s"f:${java.lang.Float.floatToIntBits(v)}")
  def bool(v: Boolean): TermValue =
    TermValue(Kind.Bool, Some(if (v) 1d else 0d), Some(v.toString), None, s"b:$v")
  def nullValue: TermValue = TermValue(Kind.Null, None, None, None, "0:")

  def labelPred(lang: String): TermValue = TermValue(Kind.Label, None, Some(lang), None, s"lab:$lang")
  def descPred(lang: String): TermValue = TermValue(Kind.Desc, None, Some(lang), None, s"des:$lang")
  def aliasPred(lang: String): TermValue = TermValue(Kind.Alias, None, Some(lang), None, s"ali:$lang")
}

/** Lexical-form rendering, mirroring the reference's `get_rdf_value`
  * (reference `src/data_types.rs:80-199`). Documented deviations
  * (CONFORMANCE.md): the reference renders `Pstmt` and `Null` as
  * "Not Implemented!"; we render Pstmt like a statement-property IRI and
  * Null as SQL NULL.
  */
object Render {
  import Term.Kind

  /** Rust `{}`-style float formatting: `2f32` prints "2", not "2.0". */
  def formatFloat(v: Float): String = {
    if (v.isNaN) "NaN"
    else if (v.isInfinite) { if (v > 0) "inf" else "-inf" }
    else if (v == v.floor && math.abs(v) < 1e16f) {
      val l = v.toLong
      l.toString
    } else v.toString
  }

  private val wd = "http://www.wikidata.org/entity/"
  private val prop = "http://www.wikidata.org/prop/"
  private val stmt = "http://www.wikidata.org/entity/statement/"

  /** Lexical form of a term struct as a string Column. */
  def lex(t: Column): Column = {
    val kind = t.getField("kind")
    val num = t.getField("num")
    val str = t.getField("str")
    val asId = num.cast(LongType).cast(StringType)
    when(t.isNull, lit(null).cast(StringType))
      .when(kind === Kind.Q, concat(lit(wd + "Q"), asId))
      // the reference renders a direct property as prop/Pn, not
      // prop/direct/Pn (src/data_types.rs:88-92)
      .when(kind === Kind.P, concat(lit(prop + "P"), asId))
      .when(kind === Kind.Pstmt, concat(lit(prop + "P"), asId)) // deviation: ref says "Not Implemented!"
      .when(kind === Kind.L, concat(lit(wd + "L"), asId))
      .when(kind === Kind.Label, concat(lit("Label: "), str))
      .when(kind === Kind.Desc, concat(lit("Description: "), str))
      .when(kind === Kind.Alias, concat(lit("Alias: "), str))
      .when(kind === Kind.Media, concat(lit("http://commons.wikimedia.org/wiki/Special:FilePath/"), str))
      .when(kind === Kind.Geo || kind === Kind.Tab, concat(lit("http://commons.wikimedia.org/data/main/"), str))
      .when(kind === Kind.Edge || kind === Kind.NamedEdge, concat(lit(stmt), str))
      .when(kind === Kind.Int, num.cast(IntegerType).cast(StringType))
      // quantity str holds the raw dump amount; rendering strips a
      // leading '+' (reference ignore_leading_plus_sign,
      // src/data_types.rs:258-268)
      .when(kind === Kind.Quantity, regexp_replace(str, "^\\+", ""))
      // float/bool/time/coord carry their rendered form in str
      .otherwise(str)
  }

  /** RDF term type for the SPARQL-Results-JSON sink:
    * "uri" for entities/statement ids, "literal" otherwise
    * (reference `src/data_types.rs:69-78`).
    */
  def rdfType(t: Column): Column =
    when(
      t.getField("kind").isin(Kind.Q, Kind.P, Kind.Pstmt, Kind.L, Kind.Edge, Kind.NamedEdge),
      lit("uri")).otherwise(lit("literal"))

  /** Datatype IRI (reference `src/data_types.rs:208-242`); null where the
    * reference returns None.
    */
  def datatype(t: Column): Column = {
    val kind = t.getField("kind")
    when(kind === Kind.Coord, lit("http://www.opengis.net/ont/geosparql#wktLiteral"))
      .when(kind === Kind.Quantity, lit("http://www.w3.org/2001/XMLSchema#decimal"))
      .when(kind === Kind.Time, lit("http://www.w3.org/2001/XMLSchema#dateTime"))
      .when(kind === Kind.Math, lit("http://www.w3.org/1998/Math/MathML"))
      .when(kind === Kind.Int, lit("http://www.w3.org/2001/XMLSchema#integer"))
      .when(kind === Kind.Float, lit("http://www.w3.org/2001/XMLSchema#decimal"))
      .when(kind === Kind.Bool, lit("http://www.w3.org/2001/XMLSchema#boolean"))
      .otherwise(lit(null).cast(StringType))
  }

  /** Language tag (monolingual text only, `src/data_types.rs:201-206`). */
  def langTag(t: Column): Column =
    when(t.getField("kind") === Kind.Mono, t.getField("lang")).otherwise(lit(null).cast(StringType))

  /** GROUP_CONCAT element rendering (reference
    * `src/calc_engine.rs:654-760`): entity/statement ids concat as bare
    * numbers; label/description/alias predicates as the raw language
    * code; media/geo/tabular as the raw payload (no URL prefix);
    * quantity as the raw `+`-prefixed amount; Null contributes nothing.
    */
  def groupConcatForm(t: Column): Column = {
    val kind = t.getField("kind")
    when(kind.isin(Kind.Q, Kind.P, Kind.L, Kind.Pstmt), t.getField("num").cast(LongType).cast(StringType))
      .when(kind === Kind.Int, t.getField("num").cast(IntegerType).cast(StringType))
      .when(kind === Kind.Null, lit(null).cast(StringType))
      .otherwise(t.getField("str"))
  }
}

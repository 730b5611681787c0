package graft.model

import graft.geo.MultiPolygon

/** Typed request model mirroring the reference's Pydantic validation layer.
  *
  * RawDataCurrentParams (src/validation/models.py:204-241): geometry,
  * geometryType, centroid, useStWithin, filters{tags: join_or/join_and,
  * attributes}, outputType. DynamicCategoriesModel (models.py:383-456):
  * per-category types/select/where. The reference normalizes Feature/
  * FeatureCollection→Polygon (models.py:124-146) — our GeoJson.parseGeometry
  * does the same before the request is built.
  */
sealed trait GeomType
object GeomType {
  case object Point extends GeomType
  case object Line extends GeomType
  case object Polygon extends GeomType
  val all: Seq[GeomType] = Seq(Point, Line, Polygon)
}

/** Tag filter AST (builder.py:166-226):
  *  - join_or: OR-fold of per-key predicates,
  *  - join_and: AND-fold,
  *  - a key with an empty value list = existence test (`tags ? 'k'`,
  *    builder.py:179),
  *  - a key with values = equality/IN (`tags->>'k' IN (...)`, builder.py:177).
  */
sealed trait TagFilter
object TagFilter {
  final case class JoinOr(terms: Map[String, Seq[String]]) extends TagFilter
  final case class JoinAnd(terms: Map[String, Seq[String]]) extends TagFilter
  final case class And(l: TagFilter, r: TagFilter) extends TagFilter
}

/** Per-geometry-type filters: the reference keys tag+attribute filters by
  * geometry type, with `all_geometry` overriding per-type filters
  * (builder.py:615-629). */
final case class TypeFilters(
    tags: Option[TagFilter] = None,
    attributes: Option[Seq[String]] = None)

final case class SnapshotRequest(
    geometry: MultiPolygon,
    geometryTypes: Seq[GeomType] = GeomType.all,
    centroid: Boolean = false,
    useStWithin: Boolean = true,
    allGeometry: Option[TypeFilters] = None,
    perType: Map[GeomType, TypeFilters] = Map.empty,
    /** freeform where-DSL (custom exports, models.py:408-412) */
    where: Option[String] = None)

/** Custom-export category (models.py:383-456). */
final case class Category(
    name: String,
    types: Seq[GeomType],
    select: Seq[String],
    where: Option[String])

// ---- where-DSL --------------------------------------------------------------

/** Safe freeform-where AST: the subset the reference accepts and rewrites
  * (`tags['k'] IS NOT NULL`, `tags['k'] = 'v'`, IN, AND/OR/NOT —
  * app.py:1298-1315, builder.py:865-872). NOT raw expr() on untrusted text. */
sealed trait WhereExpr
object WhereExpr {
  final case class TagRef(key: String) extends WhereExpr
  final case class Lit(value: String) extends WhereExpr
  final case class Eq(l: WhereExpr, r: WhereExpr) extends WhereExpr
  final case class Ne(l: WhereExpr, r: WhereExpr) extends WhereExpr
  final case class In(l: WhereExpr, vs: Seq[String]) extends WhereExpr
  final case class IsNull(e: WhereExpr) extends WhereExpr
  final case class IsNotNull(e: WhereExpr) extends WhereExpr
  final case class And(l: WhereExpr, r: WhereExpr) extends WhereExpr
  final case class Or(l: WhereExpr, r: WhereExpr) extends WhereExpr
  final case class Not(e: WhereExpr) extends WhereExpr
}

/** Recursive-descent parser for the where-DSL. Grammar:
  *   expr     := orExpr
  *   orExpr   := andExpr (OR andExpr)*
  *   andExpr  := unary (AND unary)*
  *   unary    := NOT unary | '(' expr ')' | predicate
  *   predicate:= term (('=' | '!=') term | IN '(' str (',' str)* ')'
  *               | IS [NOT] NULL)
  *   term     := tags'['str']' | str
  */
object WhereParser {
  import WhereExpr._

  final case class ParseError(msg: String) extends RuntimeException(msg)

  def parse(input: String): WhereExpr = {
    val p = new P(tokenize(input))
    val e = p.orExpr()
    if (!p.eof) throw ParseError(s"trailing tokens at ${p.pos}: ${p.peek}")
    e
  }

  private def tokenize(s: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < s.length) {
      val c = s(i)
      if (c.isWhitespace) i += 1
      else if ("()[],=".contains(c)) { out += c.toString; i += 1 }
      else if (c == '!' && i + 1 < s.length && s(i + 1) == '=') { out += "!="; i += 2 }
      else if (c == '\'') {
        val end = s.indexOf('\'', i + 1)
        if (end < 0) throw ParseError("unterminated string literal")
        out += ("'" + s.substring(i + 1, end)); i = end + 1
      } else {
        var j = i
        while (j < s.length && (s(j).isLetterOrDigit || s(j) == '_')) j += 1
        if (j == i) throw ParseError(s"unexpected char '$c'")
        out += s.substring(i, j); i = j
      }
    }
    out.result()
  }

  private final class P(toks: Vector[String]) {
    var pos = 0
    def eof: Boolean = pos >= toks.length
    def peek: String = if (eof) "<eof>" else toks(pos)
    private def next(): String = {
      if (eof) throw ParseError("unexpected end of input")
      val t = peek; pos += 1; t
    }
    private def expect(t: String): Unit = {
      val g = next()
      if (!g.equalsIgnoreCase(t)) throw ParseError(s"expected '$t', got '$g'")
    }
    private def isKw(t: String, kw: String) = t.equalsIgnoreCase(kw)

    def orExpr(): WhereExpr = {
      var l = andExpr()
      while (!eof && isKw(peek, "OR")) { next(); l = Or(l, andExpr()) }
      l
    }
    def andExpr(): WhereExpr = {
      var l = unary()
      while (!eof && isKw(peek, "AND")) { next(); l = And(l, unary()) }
      l
    }
    def unary(): WhereExpr = {
      if (isKw(peek, "NOT")) { next(); Not(unary()) }
      else if (peek == "(") { next(); val e = orExpr(); expect(")"); e }
      else predicate()
    }
    def predicate(): WhereExpr = {
      val l = term()
      if (eof) return existenceDefault(l)
      peek match {
        case "=" => next(); Eq(l, term())
        case "!=" => next(); Ne(l, term())
        case t if isKw(t, "IN") =>
          next(); expect("(")
          val vs = Seq.newBuilder[String]
          vs += strLit()
          while (peek == ",") { next(); vs += strLit() }
          expect(")")
          In(l, vs.result())
        case t if isKw(t, "IS") =>
          next()
          if (isKw(peek, "NOT")) { next(); expect("NULL"); IsNotNull(l) }
          else { expect("NULL"); IsNull(l) }
        case _ => existenceDefault(l)
      }
    }
    /** bare `tags['k']` used as a boolean = existence */
    private def existenceDefault(e: WhereExpr): WhereExpr = e match {
      case t: TagRef => IsNotNull(t)
      case other => throw ParseError(s"dangling term $other")
    }
    def term(): WhereExpr = {
      val t = next()
      if (t.equalsIgnoreCase("tags")) {
        expect("["); val k = strLit(); expect("]"); TagRef(k)
      } else if (t.startsWith("'")) Lit(t.substring(1))
      else Lit(t) // bare literal (numbers etc.)
    }
    private def strLit(): String = {
      val t = next()
      if (!t.startsWith("'")) throw ParseError(s"expected string literal, got '$t'")
      t.substring(1)
    }
  }
}

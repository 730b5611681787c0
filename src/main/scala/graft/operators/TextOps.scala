package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for the training-data pipeline over the
  * `documents` table: tokenization, quality scoring, language-ID heuristic,
  * content fingerprinting, exact dedup.
  *
  * All implemented as pure built-in column expressions (codegen'd; no UDFs),
  * each with a structurally identical DuckDB oracle. The tags-jsonb analogue:
  * a document's token set plays the role of the reference's `tags` map for
  * join_or/join_and/existence filter semantics (builder.py:166-226).
  */
object TextOps {

  // tokens of a document: whitespace split of lowercased text
  def tokensCol(text: Column): Column = split(lower(text), " ")
  val tokensSql = "string_split(lower(text), ' ')"

  /** 32-bit token id from md5 — identical in Spark and DuckDB. */
  def tokenIdCol(tok: Column): Column =
    conv(substring(md5(tok), 1, 8), 16, 10).cast("long")
  def tokenIdSql(tokE: String): String =
    s"(('0x' || substr(md5($tokE), 1, 8))::BIGINT)"

  // ---- token counting -------------------------------------------------------

  def tokenCount(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(tokensCol(col("text"))).as("n_tokens"),
      size(array_distinct(tokensCol(col("text")))).as("n_unique"))

  val tokenCountSql: String =
    s"""SELECT doc_id,
       |  len($tokensSql) AS n_tokens,
       |  len(list_distinct($tokensSql)) AS n_unique
       |FROM documents""".stripMargin

  /** BPE-ish subword pre-tokenization: greedy ≤4-char letter pieces, single
    * digits (GPT-style digit splitting), single punctuation marks — a
    * deterministic regex approximation of a byte-pair pre-tokenizer, the
    * second token-budget estimator next to whitespace counting. Plain
    * character classes + alternation behave identically in Java regex and
    * DuckDB's RE2 — for BMP text: Java regex walks UTF-16 code units, RE2
    * walks runes, so `[^a-z0-9 ]` counts an astral character (emoji etc.) as
    * 2 in Spark and 1 in DuckDB. The fixtures are ASCII; production use on
    * astral-heavy corpora should NFC-strip or count code points first. */
  val BpePattern = "[a-z]{1,4}|[0-9]|[^a-z0-9 ]"

  def tokenCountBpe(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(regexp_extract_all(lower(col("text")), lit(BpePattern), lit(0)))
        .as("n_subtok"))

  val tokenCountBpeSql: String =
    s"""SELECT doc_id,
       |  len(regexp_extract_all(lower(text), '$BpePattern')) AS n_subtok
       |FROM documents""".stripMargin

  // ---- quality scoring ------------------------------------------------------

  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "it")

  /** Length / mean-word-length / stopword-ratio / uniqueness quality signals
    * (the usual pre-training heuristics; each a plain column expression). */
  def quality(docs: DataFrame): DataFrame = {
    val toks = tokensCol(col("text"))
    val nTok = size(toks).cast("double")
    val stopHits = size(filter(toks, t => t.isin(stopwords: _*))).cast("double")
    docs.select(
      col("doc_id"),
      length(col("text")).as("n_chars"),
      size(toks).as("n_tokens"),
      round(length(col("text")).cast("double") / nTok, 4).as("avg_tok_len"),
      round(stopHits / nTok, 4).as("stop_ratio"),
      round(size(array_distinct(toks)).cast("double") / nTok, 4).as("uniq_ratio"))
  }

  val qualitySql: String = {
    val sw = stopwords.map(s => s"'$s'").mkString(", ")
    s"""SELECT doc_id,
       |  length(text) AS n_chars,
       |  len($tokensSql) AS n_tokens,
       |  round(length(text)::DOUBLE / len($tokensSql), 4) AS avg_tok_len,
       |  round(len(list_filter($tokensSql, t -> t IN ($sw)))::DOUBLE
       |        / len($tokensSql), 4) AS stop_ratio,
       |  round(len(list_distinct($tokensSql))::DOUBLE / len($tokensSql), 4) AS uniq_ratio
       |FROM documents""".stripMargin
  }

  // ---- language-ID heuristic ------------------------------------------------

  /** Marker-token voting: most-hit language wins, ties broken by language code
    * ascending; no hits → "und". (An n-gram heuristic stand-in for fasttext-
    * style LID; deliberately tiny so the oracle is exact.) */
  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "nicht"),
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "fr" -> Seq("le", "la", "et", "les", "des"))

  def langId(docs: DataFrame): DataFrame = {
    val toks = tokensCol(col("text"))
    val scored = langMarkers.map { case (lang, ms) =>
      (lang, size(filter(toks, t => t.isin(ms: _*))))
    }
    // argmax with asc-code tiebreak: fold keeping (bestLang, bestScore)
    val best = scored.tail.foldLeft(
      (lit(scored.head._1), scored.head._2)) { case ((bl, bs), (l, s)) =>
      (when(s > bs, lit(l)).otherwise(bl), when(s > bs, s).otherwise(bs))
    }
    docs.select(col("doc_id"), col("lang").as("labeled_lang"),
      when(best._2 > 0, best._1).otherwise(lit("und")).as("pred_lang"))
  }

  val langIdSql: String = {
    def score(ms: Seq[String]) =
      s"len(list_filter($tokensSql, t -> t IN (${ms.map(m => s"'$m'").mkString(", ")})))"
    val scores = langMarkers.map { case (l, ms) => (l, score(ms)) }
    // same left fold as the Column version
    val (bl, bs) = scores.tail.foldLeft((s"'${scores.head._1}'", scores.head._2)) {
      case ((bl, bs), (l, s)) =>
        (s"(CASE WHEN $s > $bs THEN '$l' ELSE $bl END)",
          s"(CASE WHEN $s > $bs THEN $s ELSE $bs END)")
    }
    s"""SELECT doc_id, lang AS labeled_lang,
       |  CASE WHEN $bs > 0 THEN $bl ELSE 'und' END AS pred_lang
       |FROM documents""".stripMargin
  }

  // ---- fingerprinting & exact dedup -----------------------------------------

  /** Content fingerprint (md5 of normalized text) — the hash-groupBy exact
    * dedup key. */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), md5(lower(trim(col("text")))).as("fp"))

  val fingerprintSql: String =
    "SELECT doc_id, md5(lower(trim(text))) AS fp FROM documents"

  /** Rolling polynomial fingerprint (Rabin-Karp over token ids, mod 1e9+7):
    * order-sensitive content hash — two docs with the same words in a
    * different order fingerprint differently, unlike the md5-of-text only
    * when whitespace differs. Left fold in both engines (Spark `aggregate`
    * with a zero accumulator ≡ DuckDB `list_reduce` over 0-prepended list). */
  def rollingFingerprint(docs: DataFrame): DataFrame = {
    val ids = transform(tokensCol(col("text")), t => tokenIdCol(t))
    docs.select(col("doc_id"),
      aggregate(ids, lit(0L), (acc, x) =>
        (acc * lit(31L) + x) % lit(1000000007L)).as("rfp"))
  }

  val rollingFingerprintSql: String =
    s"""SELECT doc_id,
       |  list_reduce(list_prepend(0::BIGINT,
       |    list_transform($tokensSql, t -> ${tokenIdSql("t")})),
       |    (acc, x) -> (acc * 31 + x) % 1000000007) AS rfp
       |FROM documents""".stripMargin

  /** Exact dedup: per fingerprint keep the smallest doc_id, count the rest.
    * Map-side combine collapses duplicates before the shuffle; at 100 TB the
    * shuffle volume is |distinct fingerprints|, not |rows|. */
  def dedupExact(docs: DataFrame): DataFrame =
    fingerprint(docs).groupBy(col("fp"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))

  val dedupExactSql: String =
    s"""SELECT fp, min(doc_id) AS keep_id, count(*) AS n_copies
       |FROM ($fingerprintSql) GROUP BY fp""".stripMargin
}

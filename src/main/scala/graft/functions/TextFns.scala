package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column expressions (SURVEY §2.9, [EXT] north-star surface;
  * literature anchors PAPERS.md). Everything is built from codegen'd
  * built-ins — no UDFs — and every construct has a DuckDB-equivalent
  * formulation so queries stay oracle-checkable:
  *  - tokens        <-> regexp_extract_all(lower(text), '\S+')
  *  - shingles      <-> list_transform(range(...), i -> t[i] || ' ' || ...)
  *  - md5           <-> md5 (bit-identical hex in both engines)
  *  - hexVal        <-> ascii-arithmetic on hex chars
  */
object TextFns {

  /** Whitespace tokenizer on lowercased text. regexp_extract_all('\S+')
    * instead of split-by-'\s+' so leading/trailing whitespace can't inject
    * empty tokens (DuckDB's split behaves differently there).
    */
  def tokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("\\S+"), lit(0))

  /** Whitespace-normalized lowercase text (fingerprint input). */
  def normText(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Deterministic document fingerprint: md5 of normalized text.
    * Portable: DuckDB md5() emits the identical hex string.
    */
  def fingerprint(text: Column): Column = md5(normText(text))

  /** Word n-gram shingles from a token array; empty array when the doc is
    * shorter than n tokens (DuckDB's range() is empty there, Spark's
    * sequence() would descend — hence the guard).
    */
  def shingles(toks: Column, n: Int): Column = {
    val grams = transform(
      sequence(lit(1), size(toks) - (n - 1)),
      i => concat_ws(" ", (0 until n).map(j => element_at(toks, (i + j).cast("int"))): _*))
    when(size(toks) >= n, grams).otherwise(array().cast("array<string>"))
  }

  /** Distinct shingle set (order-insensitive usage only: array_distinct and
    * DuckDB list_distinct order elements differently).
    */
  def shingleSet(text: Column, n: Int): Column =
    array_distinct(shingles(tokens(text), n))

  /** Count of tokens that belong to a fixed stopword set. aggregate() HOF
    * keeps it whole-stage-codegen'd; no shuffle, no UDF.
    */
  def stopHits(toks: Column, stopwords: Seq[String]): Column =
    aggregate(toks, lit(0L),
      (acc, t) => acc + when(t.isin(stopwords: _*), 1L).otherwise(0L))

  /** Numeric value of one lowercase hex digit column (0-15) via ascii
    * arithmetic — the portable alternative to strpos tricks.
    */
  def hexVal(c: Column): Column =
    when(ascii(c) >= 97, ascii(c) - 87).otherwise(ascii(c) - 48)

  /** Lowest bit of the b-th (1-based) hex digit of md5(s) — the portable
    * per-shingle "random bit" used by SimHash.
    */
  def md5Bit(s: Column, b: Int): Column = hexVal(substring(md5(s), b, 1)) % 2
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Term-key algebra.
  *
  * The reference packs the academic term as a 4-char composite key —
  * 2-char year ++ 2-char semester code ("21"+"1S") — and increments it
  * with driver-side Python (reference: src/integrator.py:27-36,
  * src/jenzabar.py:26, src/canvas.py:98-99). Here the same logic exists as
  * Column expressions so it runs distributed over term columns, not just
  * on a driver scalar.
  */
object Terms {

  /** Decompose a packed term id: yr_cde = chars 1-2, trm_cde = chars 3-4
    * (reference src/integrator.py:28-29 — F1).
    */
  def yrCde(term: Column): Column  = substring(term, 1, 2)
  def trmCde(term: Column): Column = substring(term, 3, 2)

  /** Pack (yr, trm) back into the composite key
    * (reference src/jenzabar.py:26 — F2/F3: trim + concat).
    */
  def packTerm(yr: Column, trm: Column): Column = concat(trim(yr), trim(trm))

  /** Term increment (SURVEY §2.2 F4, reference src/integrator.py:27-36):
    * spring ("2S") of year Y rolls to fall ("1S") of year Y+1; fall ("1S")
    * rolls to spring ("2S") of the same year. Pure when/otherwise + int
    * arithmetic — codegen-friendly, no UDF.
    */
  def nextTerm(yr: Column, trm: Column): Column = {
    val t = trim(trm)
    val y = trim(yr)
    when(t === "2S",
      concat(lpad((y.cast("int") + 1).cast("string"), 2, "0"), lit("1S")))
      .otherwise(concat(y, lit("2S")))
  }

  /** nextTerm over a packed 4-char key. */
  def nextTermPacked(term: Column): Column = nextTerm(yrCde(term), trmCde(term))
}

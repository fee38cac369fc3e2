package graft.ext

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Entity resolution (record linkage) — matching dirty/duplicated
  * records back to canonical entities, the structured-data sibling of
  * the document near-dup family in [[Dedup]]: BLOCK on cheap stable
  * attributes to bound candidates, then VERIFY each candidate pair with
  * an edit-distance threshold (Fellegi–Sunter-style deterministic
  * linkage; the same candidate/verify split as MinHash-LSH, with
  * blocking keys in place of band buckets).
  *
  * The testdata has no dirty records, so a dirty slice is PLANTED
  * deterministically — every 4th customer re-enters with one character
  * of its name corrupted (position 12 → 'X', an OCR-style substitution)
  * and a new surrogate key; both engines replay the same corruption.
  *
  * Blocking key = (nationkey, last-3 name chars): attributes the
  * corruption does not touch — recall is 1.0 by construction for the
  * planted pairs (the test pins this), which mirrors real blocking
  * design (block on fields with independent error processes). Same-
  * block non-twins can also pass the ≤1 threshold (distinct customers
  * one digit apart) — that is honest ER behavior, and the oracle
  * hash-checks that both engines emit the identical pair set.
  *
  * Shape at 100 TB: the candidate join is an EQUI-join on the blocking
  * key — candidates are Σ (block size)², never |dirty|×|clean|; skewed
  * blocks get the same df-cap / salting levers as hot shingles in the
  * Jaccard join. Levenshtein runs per candidate pair only. Nothing
  * all-pairs, no window, no driver state.
  */
object EntityResolution {

  def erMatchOf(cust: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
      val blk = (c: org.apache.spark.sql.Column) =>
        substring(c, -3, 3)
      val clean = cust.select(
        col("c_custkey").as("clean_id"), col("c_name").as("clean_name"),
        col("c_nationkey").as("nk"), blk(col("c_name")).as("blk"))
      val dirty = cust.filter(col("c_custkey") % 4 === 0).select(
        (col("c_custkey") + 10000000L).as("dirty_id"),
        concat(substring(col("c_name"), 1, 11), lit("X"),
          expr("substring(c_name, 13)")).as("dirty_name"),
        col("c_nationkey").as("nk"))
        .withColumn("blk", blk(col("dirty_name")))
      dirty.join(clean, Seq("nk", "blk"))
        .select(col("dirty_id"), col("clean_id"),
          levenshtein(col("dirty_name"), col("clean_name")).as("dist"))
        .filter(col("dist") <= 1)
  }

  val erMatch = QueryDef(
    "er_blocked_match",
    (s, dir) => erMatchOf(Tables(s, dir, "customer")),
    Some("""
      WITH clean AS (
        SELECT c_custkey AS clean_id, c_name AS cn, c_nationkey AS nk,
               substr(c_name, length(c_name) - 2, 3) AS blk
        FROM customer),
      dirty AS (
        SELECT c_custkey + 10000000 AS dirty_id,
               substr(c_name, 1, 11) || 'X' || substr(c_name, 13) AS dn,
               c_nationkey AS nk,
               substr(substr(c_name, 1, 11) || 'X' || substr(c_name, 13),
                      length(c_name) - 2, 3) AS blk
        FROM customer WHERE c_custkey % 4 = 0)
      SELECT dirty_id, clean_id, CAST(levenshtein(dn, cn) AS INT) AS dist
      FROM dirty JOIN clean USING (nk, blk)
      WHERE levenshtein(dn, cn) <= 1"""))

  val all: Seq[QueryDef] = Seq(erMatch)
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy matching on a string column — the entity-resolution
  * primitive (near-identical names, typo'd titles, OCR'd labels)
  * that must NEVER be spelled as an all-pairs `levenshtein` join.
  *
  * Blocking scheme: each normalized string contributes its first and
  * last token as block keys; only pairs sharing a key are candidates
  * (a typo confined to one token still shares the other). A length
  * band `|len(a) − len(b)| ≤ maxDistance` — a necessary condition of
  * edit distance — prunes candidates before the (comparatively
  * expensive) verify.
  *
  * Scale shape: one explode (≤ 2 keys per row), one hash join on the
  * block key, `distinct` to collapse pairs found under both keys
  * BEFORE the levenshtein verify runs (each surviving pair is
  * verified once), and no all-pairs product anywhere. Block sizes
  * follow token frequency: `maxBlock` (0 = uncapped) drops blocks
  * larger than the cap — the stop-token guard for web-scale name
  * tables, same move as minhash's `maxBucket`; dropped blocks cost
  * recall, never correctness of emitted pairs.
  *
  * Recall contract: a pair whose edits touch BOTH its first and last
  * token is missed — the standard blocking trade. Matching runs on
  * [[Text.normalize]]d strings (case/punctuation drift is free).
  */
object FuzzyJoin {

  /** First + last token of the normalized string (deduplicated —
    * single-token strings contribute one key). */
  def blockKeys(strCol: Column): Column = {
    val toks = split(Text.normalize(strCol), " ")
    array_distinct(array(element_at(toks, 1), element_at(toks, -1)))
  }

  /** Cross-table fuzzy match — `left` rows paired with their
    * near-identical `right` rows (`(left_id, right_id, s_l, s_r,
    * distance)`): the entity-resolution join of a NEW batch against
    * a MASTER list. Same blocking/verify construction as
    * [[selfFuzzyPairs]] with the two sides kept distinct (no
    * ordering canonicalization — every qualifying (l, r) pair
    * emits once). `maxBlock` caps by the RIGHT (master) side's
    * block size. */
  def fuzzyMatch(left: DataFrame, right: DataFrame,
                 leftId: String, leftStr: String,
                 rightId: String, rightStr: String,
                 maxDistance: Int, maxBlock: Int = 0): DataFrame = {
    require(maxDistance >= 0, s"maxDistance must be >= 0, got $maxDistance")
    require(maxBlock >= 0, s"maxBlock must be >= 0, got $maxBlock")
    def keyed(df: DataFrame, idCol: String, strCol: String,
              ido: String, so: String) = df
      .select(col(idCol).as(ido), Text.normalize(col(strCol)).as(so))
      .filter(col(so).isNotNull && length(col(so)) > 0)
      .withColumn("_bk", explode(blockKeys(col(so))))
    val l = keyed(left, leftId, leftStr, "left_id", "s_l")
    val r0 = keyed(right, rightId, rightStr, "right_id", "s_r")
    val r =
      if (maxBlock == 0) r0
      else r0.join(
        r0.groupBy("_bk").agg(count(lit(1)).as("_n"))
          .filter(col("_n") <= maxBlock).select("_bk"), Seq("_bk"))
    l.join(r, Seq("_bk"))
      .filter(abs(length(col("s_l")) - length(col("s_r"))) <= maxDistance)
      .select("left_id", "right_id", "s_l", "s_r")
      .distinct()
      .withColumn("distance",
        levenshtein(col("s_l"), col("s_r")).cast("long"))
      .filter(col("distance") <= maxDistance)
  }

  /** All within-table fuzzy pairs:
    * `(id_a, id_b, s_a, s_b, distance)` with `id_a < id_b`
    * (each unordered pair once), `s_*` the normalized strings and
    * `distance = levenshtein(s_a, s_b) ≤ maxDistance`. Rows with
    * NULL or empty-after-normalization strings never pair. */
  def selfFuzzyPairs(df: DataFrame, idCol: String, strCol: String,
                     maxDistance: Int, maxBlock: Int = 0): DataFrame = {
    require(maxDistance >= 0, s"maxDistance must be >= 0, got $maxDistance")
    require(maxBlock >= 0, s"maxBlock must be >= 0, got $maxBlock")
    val rows = df
      .select(col(idCol).as("_id"), Text.normalize(col(strCol)).as("_s"))
      .filter(col("_s").isNotNull && length(col("_s")) > 0)
      .withColumn("_bk", explode(blockKeys(col("_s"))))
    val keyed =
      if (maxBlock == 0) rows
      else {
        // cap = one aggregation on the SAME key the join shuffles on
        val sizes = rows.groupBy("_bk").agg(count(lit(1)).as("_n"))
        rows.join(sizes.filter(col("_n") <= maxBlock).select("_bk"),
          Seq("_bk"))
      }
    val a = keyed.select(col("_bk"), col("_id").as("id_a"),
      col("_s").as("s_a"))
    val b = keyed.select(col("_bk"), col("_id").as("id_b"),
      col("_s").as("s_b"))
    // MERGE pin (round-13 AuditBroadcast wave 2): b is ALWAYS
    // corpus-derived (self-join) and its subtree is scan→normalize→
    // explode with no exchange below — a lying size estimate turns
    // it into a static driver broadcast AQE never gets to correct.
    // MERGE rather than SHUFFLE_HASH because the rows carry the
    // normalized STRING payload (document-length by contract): hash
    // builds cannot spill, sort-merge can.
    a.join(b.hint("MERGE"), Seq("_bk"))
      .filter(col("id_a") < col("id_b"))
      .filter(abs(length(col("s_a")) - length(col("s_b"))) <= maxDistance)
      .select("id_a", "id_b", "s_a", "s_b")
      .distinct() // pairs sharing both keys verify once, not twice
      .withColumn("distance",
        levenshtein(col("s_a"), col("s_b")).cast("long"))
      .filter(col("distance") <= maxDistance)
  }
}

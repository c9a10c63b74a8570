package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyword retrieval over the corpus — the lexical half of hybrid
  * retrieval (BM25 + ANN): rank documents against a term query with
  * Okapi BM25 (Robertson et al., TREC-3). In a curation pipeline this is
  * reference-corpus mining ("find docs like this benchmark/task
  * description") complementing embedding search.
  *
  * Scale shape: the query term set is tiny by nature, so document-
  * frequency stats and corpus length stats collapse to a broadcast-sized
  * side; the corpus-scale work is one scan (tokenize + filter to query
  * terms, so the explode emits only matching tokens) and two
  * combiner-backed aggregations — (doc, term) term frequencies, then
  * per-doc score sums. Never a full posting-list materialization.
  */
object Search {

  /** BM25 top-k: score every document holding ≥1 query term, return the
    * deterministic top `k` (score desc, id asc). Scores round to 6 dp
    * (portable across engines). */
  def bm25TopK(
      docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must not be empty")
    val terms = queryTerms.map(_.toLowerCase).distinct

    val base = docs.select(col(idCol), TextOps.tokens(lower(col(textCol))).as("__toks"))
      .withColumn("__dl", size(col("__toks")))

    // corpus stats: one tiny aggregate (N, avgdl), cross-joined (1 row)
    val stats = base.agg(
      count(lit(1)).as("__n_docs"),
      avg(col("__dl").cast("double")).as("__avgdl"))

    // only query-term tokens survive the explode — the shuffle carries
    // (id, term) for matching tokens, not the corpus token stream
    val tf = base
      .select(col(idCol), col("__dl"),
        explode(filter(col("__toks"), t => t.isInCollection(terms))).as("__term"))
      .groupBy(col(idCol), col("__dl"), col("__term"))
      .agg(count(lit(1)).cast("double").as("__tf"))

    // per-term document frequency: |terms| rows, broadcast back
    val df = tf.groupBy(col("__term"))
      .agg(count(lit(1)).cast("double").as("__df"))

    val weighted = tf.join(broadcast(df), "__term")
      .crossJoin(broadcast(stats))
      .withColumn("__idf",
        log(lit(1.0) + (col("__n_docs") - col("__df") + 0.5) / (col("__df") + 0.5)))
      .withColumn("__w",
        col("__idf") * col("__tf") * (lit(k1) + 1.0) /
          (col("__tf") + lit(k1) *
            (lit(1.0) - lit(b) + lit(b) * col("__dl").cast("double") / col("__avgdl"))))

    // deterministic score: one conditional aggregate per query term (each
    // holds at most one row's weight), added in FIXED term order — the
    // sum never depends on partitioning, so results are reproducible and
    // oracle-portable bit-for-bit at 6 dp
    val perTerm = terms.zipWithIndex.map { case (t, i) =>
      sum(when(col("__term") === t, col("__w"))).as(s"__w$i")
    }
    val score = terms.indices
      .map(i => coalesce(col(s"__w$i"), lit(0.0)))
      .reduceLeft(_ + _)
    weighted.groupBy(col(idCol))
      .agg(perTerm.head, perTerm.tail: _*)
      .select(col(idCol), round(score, 6).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }
}

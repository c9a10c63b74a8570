package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-size overlapping document chunking — the retrieval/embedding
  * pre-pass of a training or RAG pipeline: each document becomes
  * ⌈(len − size)/step⌉ + 1 chunks of `size` chars whose starts are
  * `step = size − overlap` apart, so consecutive chunks share `overlap`
  * chars and every char of the document is covered.
  *
  * Deliberately char-windowed (not sentence-split) so the expansion is a
  * pure scalar expression: one `posexplode(transform(sequence(...)))` per
  * row, zero shuffles, whole-stage codegen, and the DuckDB oracle can
  * restate it verbatim with `generate_series` + `substr`. Chunk counts,
  * boundaries and text are deterministic for any partitioning.
  *
  * Scale: output rows ≈ input chars / step — the expansion is bounded and
  * streaming-friendly (no state, no sort). Short docs (len ≤ size) yield
  * exactly one chunk; empty docs one empty chunk (kept: the row-per-doc
  * invariant is what downstream embed joins expect).
  */
object Chunker {

  def chunkDocs(
      df: DataFrame, idCol: String, textCol: String,
      size: Int, overlap: Int): DataFrame = {
    require(size > 0, s"chunk size must be positive: $size")
    require(overlap >= 0 && overlap < size,
      s"overlap must be in [0, size): $overlap")
    val step = size - overlap
    val len = length(col(textCol))
    // index of the last chunk start: 0 for len ≤ size, else ⌈(len−size)/step⌉
    val lastIdx = when(len <= size, lit(0))
      .otherwise(ceil((len - size).cast("double") / step).cast("int"))
    df.select(
        col(idCol),
        posexplode(transform(sequence(lit(0), lastIdx),
          i => col(textCol).substr(i * step + 1, lit(size))))
          .as(Seq("chunk_idx", "chunk")))
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        col("chunk"), length(col("chunk")).cast("long").as("chunk_chars"))
  }
}

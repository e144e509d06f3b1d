package graft.operators

import graft.QueryDef

/** Embedding similarity search (brute-force cosine top-k, IVF buckets). */
object SimilarityQueries {
  val defs: Seq[QueryDef] = Seq()
}

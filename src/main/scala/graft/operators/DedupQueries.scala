package graft.operators

import graft.QueryDef

/** Deduplication operators (exact, MinHash+LSH, SimHash, n-gram Jaccard). */
object DedupQueries {
  val defs: Seq[QueryDef] = Seq()
}

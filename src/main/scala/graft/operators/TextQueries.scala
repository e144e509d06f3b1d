package graft.operators

import graft.QueryDef

/** Text-analysis operators (language ID, quality scoring, token counting,
  * fingerprinting) — filled in incrementally; see functions.TextFunctions. */
object TextQueries {
  val defs: Seq[QueryDef] = Seq()
}

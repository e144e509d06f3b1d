package graft.operators

import graft.QueryDef

/** Multimodal (binary column) plumbing with stubbed decode. */
object MultimodalQueries {
  val defs: Seq[QueryDef] = Seq()
}

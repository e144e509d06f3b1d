package graft.sources

import graft.QueryDef

/** DOCSIS reference-parity queries over fixture HNAP payloads. */
object DocsisQueries {
  val defs: Seq[QueryDef] = Seq()
}

package graft

/** Dev tool: print the README query-inventory table straight from
  * `QueryDef.registry`, so the docs can never drift from the code.
  * Usage: runMain graft.InventoryDump
  */
object InventoryDump {
  def main(args: Array[String]): Unit = {
    val defs = QueryDef.registry.sortBy(_.name)
    val oracled = defs.count(_.oracle.isDefined)
    println(s"registered=${defs.size} oracle-checked=$oracled")
    defs.foreach(q => println(s"| `${q.name}` | ${q.doc} |"))
  }
}

package graft

import graft.storage.FactTable
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property: any interleaving of appends (including replayed txn ids)
  * and compactions preserves exactly the multiset of rows from the
  * distinct transactions, and read() always reflects the log snapshot.
  */
object FactTableProps extends Properties("FactTable") {
  import TestSpark.spark
  import spark.implicits._

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(6)

  sealed trait Op
  final case class Append(txn: Long, n: Int, day: Int) extends Op
  case object Compact extends Op

  private val opGen: Gen[Op] = Gen.frequency(
    4 -> (for {
      txn <- Gen.choose(0L, 5L) // small domain → replays happen
      n <- Gen.choose(1, 8)
      day <- Gen.choose(1, 3)
    } yield Append(txn, n, day)),
    1 -> Gen.const(Compact))

  property("append/compact interleavings preserve the committed multiset") =
    forAll(Gen.listOfN(8, opGen)) { ops =>
      val t = new FactTable(
        java.nio.file.Files.createTempDirectory("fact_props").toString, spark)
      var expected = Map.empty[Long, (Int, Int)] // txn -> (n, day)
      ops.foreach {
        case Append(txn, n, day) =>
          val df = (1 to n).map(i => ("m" + txn,
            java.sql.Timestamp.valueOf(f"2024-03-0$day 00:00:${i % 60}%02d"),
            i.toLong)).toDF("modem_name", "timestamp", "uptime")
            .withColumn("date", org.apache.spark.sql.functions.to_date($"timestamp"))
          val applied = t.append(df, txn)
          // first append with this txn id wins; replays are no-ops
          if (applied) expected += txn -> (n, day)
          else assert(expected.contains(txn))
        case Compact => t.compact()
      }
      val want = expected.map { case (txn, (n, _)) => ("m" + txn, n.toLong) }
      if (want.isEmpty) true
      else {
        val got = t.read().groupBy($"modem_name")
          .count().as[(String, Long)].collect().toMap
        got == want
      }
    }
}

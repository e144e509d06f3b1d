package graft

import graft.plans.PosNGrams
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The pos_ngrams Generator: direct eval semantics plus the SQL route
  * through the extensions-injected function registry.
  */
class NGramGeneratorSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("eval semantics: positions, joining, short inputs, null tokens") {
    assert(PosNGrams.grams(Seq("a", "b", "c"), 2) ==
      Seq((0, "a b"), (1, "b c")))
    assert(PosNGrams.grams(Seq("a", "b", "c"), 3) == Seq((0, "a b c")))
    assert(PosNGrams.grams(Seq("a"), 2) == Nil) // shorter than n
    assert(PosNGrams.grams(Seq("a", null, "c"), 2) ==
      Seq((0, null), (1, null))) // null token poisons its grams
    assert(PosNGrams.grams(Nil, 1) == Nil)
  }

  test("SQL route emits one row per gram and matches the HOF formulation") {
    val df = Seq((1L, "x y z w"), (2L, "solo")).toDF("id", "text")
      .withColumn("toks", split($"text", " "))
    val gen = df.select($"id", expr("pos_ngrams(toks, 2)").as(Seq("pos", "gram")))
      .orderBy($"id", $"pos").as[(Long, Int, String)].collect().toSeq
    // note the guard the HOF form needs (sequence(0, -1) descends and
    // toks[i+1] overruns) — the generator handles short inputs natively
    val hof = df.select($"id", posexplode(expr(
      """CASE WHEN size(toks) >= 2
           THEN transform(sequence(0, size(toks) - 2),
                          i -> concat(toks[i], ' ', toks[i+1]))
           ELSE array() END"""))
      .as(Seq("pos", "gram")))
      .orderBy($"id", $"pos").as[(Long, Int, String)].collect().toSeq
    assert(gen == Seq((1L, 0, "x y"), (1L, 1, "y z"), (1L, 2, "z w")))
    assert(gen == hof)
  }
}

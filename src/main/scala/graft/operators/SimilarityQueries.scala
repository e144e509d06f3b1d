package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.VectorFunctions.{cosineExact, dotExact, l2SqExact}
import graft.plans.VectorExpressions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Embedding similarity search (SURVEY.md §2.D): brute-force cosine top-k
  * as the baseline, IVF (inverted-file) bucketing as the scale path.
  *
  * Scale notes (100 TB): the query vector and the centroid table are tiny
  * → broadcast; the fact side streams through codegen'd projections with
  * no shuffle except the final top-k (TakeOrderedAndProject) / bucket agg.
  * s03 demonstrates the codegen'd native expression (`vec_dot`).
  */
object SimilarityQueries {

  private val dims = 64 // embedding width in the test tables

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------------
    // s01: brute-force cosine top-20 vs the vec_id=0 query vector,
    // decimal-exact math → bit-identical to the oracle.
    QueryDef(
      "s01_cosine_topk",
      (s, dir) => {
        import s.implicits._
        val emb = Tables.load(s, dir, "embeddings")
        val q = emb.filter($"vec_id" === 0).select($"embedding".as("qv"))
        emb.filter($"vec_id" =!= 0)
          .crossJoin(broadcast(q))
          .select($"vec_id",
            round(cosineExact("embedding", "qv"), 9).as("cosine"))
          .orderBy($"cosine".desc, $"vec_id".asc)
          .limit(20)
      },
      Some(s"""
        WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        pairs AS (SELECT e.vec_id, unnest(e.embedding) AS x, unnest(q.qv) AS y
                  FROM embeddings e, q WHERE e.vec_id <> 0),
        dots AS (SELECT vec_id,
                        CAST(SUM(CAST(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) AS DECIMAL(38,18))) AS DOUBLE) AS dot,
                        CAST(SUM(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(38,18))) AS DOUBLE) AS na,
                        CAST(SUM(CAST(CAST(y AS DOUBLE) * CAST(y AS DOUBLE) AS DECIMAL(38,18))) AS DOUBLE) AS nq
                 FROM pairs GROUP BY vec_id)
        SELECT vec_id, round(dot / (sqrt(na) * sqrt(nq)), 9) AS cosine
        FROM dots ORDER BY cosine DESC, vec_id ASC LIMIT 20"""),
      doc = "brute-force cosine top-k (exact decimal math)"),

    // ------------------------------------------------------------------
    // s02: IVF assignment — nearest of 8 centroids (vec_id 0..7) per
    // vector; bucket histogram. Centroids broadcast; argmin via window.
    QueryDef(
      "s02_ivf_assign",
      (s, dir) => {
        import s.implicits._
        val emb = Tables.load(s, dir, "embeddings")
        val cents = emb.filter($"vec_id" < 8)
          .select($"vec_id".as("cid"), $"embedding".as("cv"))
        val w = Window.partitionBy($"vec_id").orderBy($"dist2".asc, $"cid".asc)
        emb.crossJoin(broadcast(cents))
          .select($"vec_id", $"cid", round(l2SqExact("embedding", "cv"), 9).as("dist2"))
          .withColumn("rk", row_number().over(w))
          .filter($"rk" === 1)
          .groupBy($"cid")
          .agg(count(lit(1)).as("n_vectors"))
          .orderBy($"cid")
      },
      Some("""
        WITH cents AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 8),
        pairs AS (SELECT e.vec_id, c.cid, unnest(e.embedding) AS x, unnest(c.cv) AS y
                  FROM embeddings e CROSS JOIN cents c),
        dists AS (SELECT vec_id, cid,
                         CAST(SUM(CAST((CAST(x AS DOUBLE) - CAST(y AS DOUBLE))
                                       * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))
                                  AS DECIMAL(38,18))) AS DOUBLE) AS dist2_raw
                  FROM pairs GROUP BY vec_id, cid),
        distsr AS (SELECT vec_id, cid, round(dist2_raw, 9) AS dist2 FROM dists),
        assigned AS (SELECT vec_id, cid,
                            ROW_NUMBER() OVER (PARTITION BY vec_id
                                               ORDER BY dist2 ASC, cid ASC) AS rk
                     FROM distsr)
        SELECT cid, COUNT(*) AS n_vectors FROM assigned
        WHERE rk = 1 GROUP BY cid ORDER BY cid"""),
      doc = "IVF centroid assignment (broadcast centroids + window argmin)"),

    // ------------------------------------------------------------------
    // s03: cosine top-20 via the codegen'd native vec_dot expression.
    // Sequential double accumulation differs from decimal sums at ~1e-16,
    // so both sides round to 6 digits before comparing/ordering.
    QueryDef(
      "s03_cosine_topk_native",
      (s, dir) => {
        import s.implicits._
        VectorExpressions.register(s)
        val emb = Tables.load(s, dir, "embeddings")
        val q = emb.filter($"vec_id" === 0).select($"embedding".as("qv"))
        emb.filter($"vec_id" =!= 0)
          .crossJoin(broadcast(q))
          .select($"vec_id",
            round(expr("vec_dot(embedding, qv)") /
              (sqrt(expr("vec_dot(embedding, embedding)")) * sqrt(expr("vec_dot(qv, qv)"))), 6)
              .as("cosine"))
          .orderBy($"cosine".desc, $"vec_id".asc)
          .limit(20)
      },
      Some("""
        WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        pairs AS (SELECT e.vec_id, unnest(e.embedding) AS x, unnest(q.qv) AS y
                  FROM embeddings e, q WHERE e.vec_id <> 0),
        dots AS (SELECT vec_id,
                        SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
                        SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
                        SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nq
                 FROM pairs GROUP BY vec_id)
        SELECT vec_id, round(dot / (sqrt(na) * sqrt(nq)), 6) AS cosine
        FROM dots ORDER BY cosine DESC, vec_id ASC LIMIT 20"""),
      doc = "cosine top-k via custom codegen'd Catalyst expression"),

    // ------------------------------------------------------------------
    // s04: IVF probe — search only the query's bucket, top-5 by cosine.
    QueryDef(
      "s04_ivf_search",
      (s, dir) => {
        import s.implicits._
        val emb = Tables.load(s, dir, "embeddings")
        val cents = emb.filter($"vec_id" < 8)
          .select($"vec_id".as("cid"), $"embedding".as("cv"))
        val w = Window.partitionBy($"vec_id").orderBy($"dist2".asc, $"cid".asc)
        val assigned = emb.crossJoin(broadcast(cents))
          .select($"vec_id", $"embedding", $"cid", round(l2SqExact("embedding", "cv"), 9).as("dist2"))
          .withColumn("rk", row_number().over(w))
          .filter($"rk" === 1)
          .select($"vec_id", $"embedding", $"cid")
        // the query vector (vec_id 0) is its own centroid → bucket 0
        val q = assigned.filter($"vec_id" === 0)
          .select($"cid".as("qcid"), $"embedding".as("qv"))
        assigned.join(broadcast(q), $"cid" === $"qcid")
          .filter($"vec_id" =!= 0)
          .select($"vec_id",
            round(cosineExact("embedding", "qv"), 9).as("cosine"))
          .orderBy($"cosine".desc, $"vec_id".asc)
          .limit(5)
      },
      Some("""
        WITH cents AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 8),
        cpairs AS (SELECT e.vec_id, c.cid, unnest(e.embedding) AS x, unnest(c.cv) AS y
                   FROM embeddings e CROSS JOIN cents c),
        dists AS (SELECT vec_id, cid,
                         CAST(SUM(CAST((CAST(x AS DOUBLE) - CAST(y AS DOUBLE))
                                       * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))
                                  AS DECIMAL(38,18))) AS DOUBLE) AS dist2_raw
                  FROM cpairs GROUP BY vec_id, cid),
        distsr AS (SELECT vec_id, cid, round(dist2_raw, 9) AS dist2 FROM dists),
        assigned AS (SELECT vec_id, cid FROM (
                       SELECT vec_id, cid,
                              ROW_NUMBER() OVER (PARTITION BY vec_id
                                                 ORDER BY dist2 ASC, cid ASC) AS rk
                       FROM distsr) t WHERE rk = 1),
        bucket AS (SELECT a.vec_id FROM assigned a
                   WHERE a.cid = (SELECT cid FROM assigned WHERE vec_id = 0)
                     AND a.vec_id <> 0),
        q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        pairs AS (SELECT e.vec_id, unnest(e.embedding) AS x, unnest(q.qv) AS y
                  FROM embeddings e JOIN bucket b ON e.vec_id = b.vec_id, q),
        dots AS (SELECT vec_id,
                        CAST(SUM(CAST(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) AS DECIMAL(38,18))) AS DOUBLE) AS dot,
                        CAST(SUM(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(38,18))) AS DOUBLE) AS na,
                        CAST(SUM(CAST(CAST(y AS DOUBLE) * CAST(y AS DOUBLE) AS DECIMAL(38,18))) AS DOUBLE) AS nq
                 FROM pairs GROUP BY vec_id)
        SELECT vec_id, round(dot / (sqrt(na) * sqrt(nq)), 9) AS cosine
        FROM dots ORDER BY cosine DESC, vec_id ASC LIMIT 5"""),
      doc = "IVF bucket-probed similarity search"),

    // ------------------------------------------------------------------
    // s05: IVF with one Lloyd (k-means) refinement step — assign to the
    // seed centroids (vec_id 0..7), recompute each centroid as the
    // per-dimension decimal-exact mean of its members, re-assign, and
    // report bucket sizes before/after. All float summation goes through
    // DECIMAL(38,18) (order-independent) and distances are rounded to 9
    // digits before the argmin, so both engines pick identical buckets.
    // At scale: centroids stay broadcast-sized; each pass is one scan +
    // one (cid, dim) partial aggregate — the standard distributed-k-means
    // shape, iterated a fixed number of times.
    QueryDef(
      "s05_ivf_kmeans_refined",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.types.DecimalType
        val emb = Tables.load(s, dir, "embeddings")
        val cents0 = emb.filter($"vec_id" < 8)
          .select($"vec_id".as("cid"), $"embedding".as("cv"))
        val w = Window.partitionBy($"vec_id").orderBy($"dist2".asc, $"cid".asc)
        val assign0 = emb.crossJoin(broadcast(cents0))
          .select($"vec_id", $"embedding", $"cid",
            round(l2SqExact("embedding", "cv"), 9).as("dist2"))
          .withColumn("rk", row_number().over(w)).filter($"rk" === 1)
          .select($"vec_id", $"embedding", $"cid")
        // Lloyd step: per-dimension decimal-exact member mean
        val cent1 = assign0
          .select($"cid", posexplode($"embedding").as(Seq("d", "x")))
          .groupBy($"cid", $"d")
          .agg((sum($"x".cast("double").cast(DecimalType(38, 18)))
            .cast("double") / count(lit(1))).as("c"))
          .groupBy($"cid")
          .agg(expr("transform(sort_array(collect_list(struct(d, c))), p -> p.c)")
            .as("cv"))
        val assign1 = emb.crossJoin(broadcast(cent1))
          .select($"vec_id", $"cid",
            round(l2SqExact("embedding", "cv"), 9).as("dist2"))
          .withColumn("rk", row_number().over(w)).filter($"rk" === 1)
        val n0 = assign0.groupBy($"cid").agg(count(lit(1)).as("n0"))
        val n1 = assign1.groupBy($"cid").agg(count(lit(1)).as("n1"))
        n0.join(n1, Seq("cid"), "left")
          .select($"cid", $"n0", coalesce($"n1", lit(0L)).as("n1"))
          .orderBy($"cid")
      },
      Some("""
        WITH cents AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 8),
        cpairs AS (SELECT e.vec_id, c.cid, unnest(e.embedding) AS x, unnest(c.cv) AS y
                   FROM embeddings e CROSS JOIN cents c),
        dists0 AS (SELECT vec_id, cid,
                          CAST(SUM(CAST((CAST(x AS DOUBLE) - CAST(y AS DOUBLE))
                                        * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))
                                   AS DECIMAL(38,18))) AS DOUBLE) AS dist2_raw
                   FROM cpairs GROUP BY vec_id, cid),
        assign0 AS (SELECT vec_id, cid FROM (
                      SELECT vec_id, cid,
                             ROW_NUMBER() OVER (PARTITION BY vec_id
                                                ORDER BY round(dist2_raw, 9) ASC, cid ASC) AS rk
                      FROM dists0) t WHERE rk = 1),
        members AS (SELECT a.cid, unnest(e.embedding) AS x,
                           unnest(range(0, len(e.embedding))) AS d
                    FROM assign0 a JOIN embeddings e ON e.vec_id = a.vec_id),
        cent1 AS (SELECT cid, d,
                         CAST(SUM(CAST(CAST(x AS DOUBLE) AS DECIMAL(38,18))) AS DOUBLE)
                           / COUNT(*) AS c
                  FROM members GROUP BY cid, d),
        eflat AS (SELECT vec_id, unnest(embedding) AS x,
                         unnest(range(0, len(embedding))) AS d
                  FROM embeddings),
        dists1 AS (SELECT f.vec_id, c.cid,
                          CAST(SUM(CAST((CAST(f.x AS DOUBLE) - c.c)
                                        * (CAST(f.x AS DOUBLE) - c.c)
                                   AS DECIMAL(38,18))) AS DOUBLE) AS dist2_raw
                   FROM eflat f JOIN cent1 c ON f.d = c.d
                   GROUP BY f.vec_id, c.cid),
        assign1 AS (SELECT vec_id, cid FROM (
                      SELECT vec_id, cid,
                             ROW_NUMBER() OVER (PARTITION BY vec_id
                                                ORDER BY round(dist2_raw, 9) ASC, cid ASC) AS rk
                      FROM dists1) t WHERE rk = 1),
        n0 AS (SELECT cid, COUNT(*) AS n0 FROM assign0 GROUP BY cid),
        n1 AS (SELECT cid, COUNT(*) AS n1 FROM assign1 GROUP BY cid)
        SELECT n0.cid, n0.n0, COALESCE(n1.n1, CAST(0 AS BIGINT)) AS n1
        FROM n0 LEFT JOIN n1 ON n0.cid = n1.cid
        ORDER BY n0.cid"""),
      doc = "IVF with one Lloyd refinement (decimal-exact means, identical argmin)"),

    // ------------------------------------------------------------------
    // s06: multiprobe IVF — search the 2 buckets nearest the QUERY
    // VECTOR (not just its own), the recall/cost knob of real IVF
    // deployments: rows scanned grow linearly with the probe count while
    // recall approaches brute force. Same exact-decimal distances and
    // 9-digit rounding as s02/s04, so bucket membership and ranking are
    // engine-identical.
    QueryDef(
      "s06_ivf_multiprobe",
      (s, dir) => {
        import s.implicits._
        val emb = Tables.load(s, dir, "embeddings")
        val cents = emb.filter($"vec_id" < 8)
          .select($"vec_id".as("cid"), $"embedding".as("cv"))
        val w = Window.partitionBy($"vec_id").orderBy($"dist2".asc, $"cid".asc)
        val dists = emb.crossJoin(broadcast(cents))
          .select($"vec_id", $"embedding", $"cid",
            round(l2SqExact("embedding", "cv"), 9).as("dist2"))
          .withColumn("rk", row_number().over(w))
        val assigned = dists.filter($"rk" === 1)
          .select($"vec_id", $"embedding", $"cid")
        // the 2 centroids nearest the query vector
        val probes = dists.filter($"vec_id" === 0 && $"rk" <= 2)
          .select($"cid".as("pcid"))
        val q = emb.filter($"vec_id" === 0).select($"embedding".as("qv"))
        assigned.join(broadcast(probes), $"cid" === $"pcid")
          .filter($"vec_id" =!= 0)
          .crossJoin(broadcast(q))
          .select($"vec_id", $"cid",
            round(cosineExact("embedding", "qv"), 9).as("cosine"))
          .orderBy($"cosine".desc, $"vec_id".asc)
          .limit(10)
      },
      Some("""
        WITH cents AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 8),
        cpairs AS (SELECT e.vec_id, c.cid, unnest(e.embedding) AS x, unnest(c.cv) AS y
                   FROM embeddings e CROSS JOIN cents c),
        dists AS (SELECT vec_id, cid,
                         CAST(SUM(CAST((CAST(x AS DOUBLE) - CAST(y AS DOUBLE))
                                       * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))
                                  AS DECIMAL(38,18))) AS DOUBLE) AS dist2_raw
                  FROM cpairs GROUP BY vec_id, cid),
        ranked AS (SELECT vec_id, cid,
                          ROW_NUMBER() OVER (PARTITION BY vec_id
                                             ORDER BY round(dist2_raw, 9) ASC, cid ASC) AS rk
                   FROM dists),
        assigned AS (SELECT vec_id, cid FROM ranked WHERE rk = 1),
        probes AS (SELECT cid FROM ranked WHERE vec_id = 0 AND rk <= 2),
        bucket AS (SELECT a.vec_id, a.cid FROM assigned a
                   JOIN probes p ON a.cid = p.cid WHERE a.vec_id <> 0),
        q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        pairs AS (SELECT b.vec_id, b.cid, unnest(e.embedding) AS x, unnest(q.qv) AS y
                  FROM bucket b JOIN embeddings e ON e.vec_id = b.vec_id, q),
        dots AS (SELECT vec_id, cid,
                        CAST(SUM(CAST(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) AS DECIMAL(38,18))) AS DOUBLE) AS dot,
                        CAST(SUM(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(38,18))) AS DOUBLE) AS na,
                        CAST(SUM(CAST(CAST(y AS DOUBLE) * CAST(y AS DOUBLE) AS DECIMAL(38,18))) AS DOUBLE) AS nq
                 FROM pairs GROUP BY vec_id, cid)
        SELECT vec_id, cid, round(dot / (sqrt(na) * sqrt(nq)), 9) AS cosine
        FROM dots ORDER BY cosine DESC, vec_id ASC LIMIT 10"""),
      doc = "multiprobe IVF: 2 nearest buckets, the recall/cost knob")
  )
}

package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over the near-dup pair graph — the structural view of a
  * corpus the dedup family only looks at locally: [[Dedup.duplicateClusters]]
  * answers "which component", PageRank answers "which documents sit at the
  * CENTER of a duplication neighborhood" (the natural cluster
  * representatives, and the first signal for template/boilerplate mining).
  *
  * All arithmetic is scaled-integer (BIGINT), never floating point: rank
  * mass is `scale`-scaled, per-edge contributions use integer division, so
  * every sum is exact and associative — partitioning cannot change a single
  * output bit, and the DuckDB oracle reproduces the iteration bit-for-bit.
  * The deliberate cost is the truncation remainder (≤ deg per node per
  * round, ~1e-10 of the mass at the default scale), which is part of the
  * operator's pinned semantics, identical on both engines.
  */
object Graph {

  /** Damped PageRank with a FIXED iteration count over an undirected pair
    * graph (each pair contributes both directed edges).
    *
    * Per iteration: every node sends `r DIV deg` along each out-edge, and
    * ranks rebuild as `base + (dampPct · Σ incoming) DIV 100` where
    * `base = ((100 − dampPct) · scale DIV 100) DIV n`. Isolated nodes hold
    * `base` from round 1 on; dangling mass is dropped (no edges out of a
    * node with deg 0 — the standard simplification, pinned in the oracle).
    *
    * Scale shape: the edge and degree relations are computed once and
    * persisted; each of the `iters` rounds is one equi-join of edges to the
    * current rank vector (shuffle keyed on the node id) plus one map-side-
    * combined sum — the canonical distributed PageRank step, nothing
    * quadratic, no driver state beyond the node count. Rank mass totals
    * ≤ `scale`, so per-node sums never approach Long range at any corpus
    * size. */
  def pageRank(nodes: DataFrame, pairs: DataFrame, idCol: String = "doc_id",
      iters: Int = 3, dampPct: Long = 85L,
      scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 1 && dampPct >= 0 && dampPct <= 100 && scale > 0)
    val ids = graft.etl.CacheRegistry.persist(nodes.select(col(idCol).as("id")))
    val edges = graft.etl.CacheRegistry.persist(
      pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .unionByName(pairs.select(col("doc_b").as("src"),
          col("doc_a").as("dst"))))
    val deg = graft.etl.CacheRegistry.persist(
      edges.groupBy("src").agg(count(lit(1)).as("d")))
    val n = ids.count()
    require(n > 0, "pageRank needs at least one node")
    val base = ((100L - dampPct) * scale / 100L) / n
    var r = ids.withColumn("r", lit(scale / n))
    for (_ <- 1 to iters) {
      val in = edges.join(r, edges("src") === r("id"))
        .join(deg, "src")
        .select(col("dst").as("id"), expr("r DIV d").as("c"))
        .groupBy("id").agg(sum("c").as("m"))
      r = ids.join(in, Seq("id"), "left")
        .select(col("id"),
          (lit(base) + expr(s"($dampPct * coalesce(m, 0L)) DIV 100")).as("r"))
    }
    r.select(col("id").as(idCol), col("r").as("pr_scaled"),
      (col("r").cast("double") / lit(scale.toDouble)).as("pr"))
  }

  /** Oracle for [[pageRank]] over the LSH candidate-pair graph: the same
    * integer iteration unrolled as one CTE per round on DuckDB's side of
    * the same `prs` chain. */
  def pageRankLshSqlDuck(iters: Int = 3, dampPct: Long = 85L,
      scale: Long = 1000000000000L): String = {
    val rounds = (1 to iters).map { i =>
      val prev = s"r${i - 1}"
      s""" s$i AS (SELECT e.dst AS id, CAST(sum($prev.r // dg.d) AS BIGINT) AS m
         |   FROM edges e JOIN $prev ON e.src = $prev.id
         |   JOIN dg ON dg.id = e.src GROUP BY e.dst),
         | r$i AS (SELECT $prev.id,
         |     (SELECT base FROM consts) + ($dampPct * coalesce(s$i.m, 0)) // 100 AS r
         |   FROM $prev LEFT JOIN s$i ON $prev.id = s$i.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${Dedup.lshPairsCteDuck},
       | edges AS (SELECT a AS src, b AS dst FROM prs
       |   UNION ALL SELECT b AS src, a AS dst FROM prs),
       | dg AS (SELECT src AS id, CAST(count(*) AS BIGINT) AS d
       |   FROM edges GROUP BY src),
       | nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
       | consts AS (SELECT ((${100L - dampPct} * $scale) // 100) // n AS base FROM nn),
       | r0 AS (SELECT doc_id AS id, $scale // (SELECT n FROM nn) AS r
       |   FROM documents),
       |$rounds
       |SELECT id AS doc_id, r AS pr_scaled, CAST(r AS DOUBLE) / $scale AS pr
       |FROM r$iters ORDER BY doc_id""".stripMargin
  }
}

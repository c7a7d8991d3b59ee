package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (north-star M5).
  *
  * Numeric determinism for the DuckDB oracle: dot products and norms are
  * emitted as explicit left-associated 64-term expressions (float elements
  * cast to double, then mul/add in fixed order). Neither Catalyst nor DuckDB
  * reassociates floating-point arithmetic, so both engines produce
  * bit-identical doubles and the derived orderings/thresholds agree exactly.
  *
  * Scale design (100 TB):
  *  - brute-force top-k is the correctness baseline: |Q| × |C| partial top-k
  *    per partition (window rank after a broadcast of the small query set —
  *    the candidate side streams, nothing materializes the cross product).
  *  - the scale path is LSH bucketing (signed random projections): candidates
  *    shuffle once on the bucket key; each bucket is scanned independently.
  *
  * Literature: random-hyperplane LSH — Charikar (STOC 2002); multi-probe
  * LSH — Lv et al., "Multi-probe LSH: efficient indexing for high-dimensional
  * similarity search" (VLDB 2007).
  */
object Similarity {

  val Dim = 64

  /** Dot product of two array<float> columns, computed in double via a
    * custom codegen'd loop expression (graft.functions.FloatVectorDot) —
    * bit-identical to the explicit left-associated expression chain the
    * DuckDB oracle uses, but codegen-compact (the 64-term chain overflows
    * Janino's method limit and falls back to interpreted eval). */
  def dotCol(a: String, b: String): Column =
    graft.functions.VectorExprs.dotF(col(a), col(b))

  def normCol(a: String): Column = sqrt(dotCol(a, a))

  /** DuckDB: same expression, 1-based list indexing. */
  def dotSqlDuck(a: String, b: String): String =
    (1 to Dim).map(i => s"CAST($a[$i] AS DOUBLE)*CAST($b[$i] AS DOUBLE)").mkString(" + ")

  /** Embeddings with a precomputed L2 norm. */
  def withNorm(emb: DataFrame): DataFrame =
    emb.withColumn("nrm", normCol("embedding"))

  /** Brute-force cosine top-k: queries = vec_id < nQueries (broadcast side),
    * candidates = the full table (streamed side). Self-matches excluded. */
  def bruteForceTopK(emb: DataFrame, nQueries: Int = 8, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = withNorm(emb)
    val q = v.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"), col("nrm").as("qn"))
    val c = v.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"), col("nrm").as("cn"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", dotCol("qv", "cv") / (col("qn") * col("cn")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("cos"), 6).as("cos_sim"))
  }

  def bruteForceTopKSqlDuck(nQueries: Int = 8, k: Int = 10): String =
    s"""WITH v AS (SELECT vec_id, embedding, sqrt(${dotSqlDuck("embedding", "embedding")}) AS nrm
       |  FROM embeddings),
       | scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    (${dotSqlDuck("q.embedding", "c.embedding")}) / (q.nrm * c.nrm) AS cos
       |  FROM v q JOIN v c ON q.vec_id < $nQueries AND c.vec_id <> q.vec_id)
       |SELECT query_id, rank, neighbor_id, round(cos, 6) AS cos_sim FROM (
       |  SELECT query_id, neighbor_id, cos,
       |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank
       |  FROM scored)
       |WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin

  // ---- IVF (inverted-file) ANN — the coarse-quantizer scale path ---------

  /** Assign each vector to its nearest centroid (argmax of v·c - |c|²/2,
    * equivalent to argmin L2). Centroids ride into codegen as literals. */
  def ivfAssign(emb: DataFrame, cents: Array[Array[Double]]): DataFrame = {
    val scores = cents.map { c =>
      val half = c.map(x => x * x).sum / 2
      graft.functions.VectorExprs.dotConst(col("embedding"), c) - lit(half)
    }
    emb.withColumn("_scores", array(scores.toSeq: _*))
      .withColumn("cluster",
        (expr("array_position(_scores, array_max(_scores))") - 1).cast("int"))
      .drop("_scores")
  }

  /** k-means-lite coarse quantizer: deterministic init from the first k
    * vectors, `iters` Lloyd iterations. Per iteration: one distributed
    * assignment pass + one groupByKey mean (shuffle keyed by cluster —
    * k rows out). Centroid count is driver-resident (k × Dim doubles). */
  def ivfCentroids(emb: DataFrame, k: Int = 16, iters: Int = 2): Array[Array[Double]] = {
    import emb.sparkSession.implicits._
    var cents = emb.filter(col("vec_id") < k).orderBy("vec_id")
      .select("embedding").as[Array[Float]].collect().map(_.map(_.toDouble))
    for (_ <- 1 to iters) {
      val means = ivfAssign(emb, cents)
        .select(col("cluster"), col("embedding")).as[(Int, Array[Float])]
        .groupByKey(_._1)
        .mapGroups { (c, it) =>
          val acc = new Array[Double](Dim)
          var n = 0L
          it.foreach { case (_, v) =>
            var i = 0; while (i < Dim) { acc(i) += v(i); i += 1 }; n += 1
          }
          (c, acc.map(_ / n))
        }.collect().toMap
      cents = cents.indices.map(i => means.getOrElse(i, cents(i))).toArray
    }
    cents
  }

  /** IVF top-k: candidates come only from the query's `nProbe` closest
    * clusters. Join is an equi-join on the cluster id; candidate volume is
    * bounded by nProbe/kClusters of the corpus per query. */
  def ivfTopK(emb: DataFrame, nQueries: Int = 8, k: Int = 10,
      kClusters: Int = 16, nProbe: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = ivfCentroids(emb, kClusters)
    val v = ivfAssign(withNorm(emb), cents)
    val centScores = cents.map { c =>
      val half = c.map(x => x * x).sum / 2
      graft.functions.VectorExprs.dotConst(col("embedding"), c) - lit(half)
    }
    val wProbe = Window.partitionBy("query_id").orderBy(col("score").desc, col("cluster"))
    val qProbes = withNorm(emb).filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"), col("nrm").as("qn"),
        posexplode(array(centScores.toSeq: _*)).as(Seq("cluster", "score")))
      .withColumn("_r", row_number().over(wProbe))
      .filter(col("_r") <= nProbe)
      .select("query_id", "qv", "qn", "cluster")
    val c = v.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"),
      col("nrm").as("cn"), col("cluster"))
    val scored = c.join(broadcast(qProbes),
        Seq("cluster")).filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", dotCol("qv", "cv") / (col("qn") * col("cn")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("cos"), 6).as("cos_sim"))
  }

  /** Embedding-cosine near-duplicate pairs above `threshold`. All-pairs on
    * the oracle path; for scale use [[srpBuckets]] first. */
  def cosinePairs(emb: DataFrame, threshold: Double = 0.4): DataFrame = {
    val v = withNorm(emb)
    val a = v.select(col("vec_id").as("id_a"), col("embedding").as("va"), col("nrm").as("na"))
    val b = v.select(col("vec_id").as("id_b"), col("embedding").as("vb"), col("nrm").as("nb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", dotCol("va", "vb") / (col("na") * col("nb")))
      .filter(col("cos") > threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos_sim"))
  }

  def cosinePairsSqlDuck(threshold: Double = 0.4): String =
    s"""WITH v AS (SELECT vec_id, embedding, sqrt(${dotSqlDuck("embedding", "embedding")}) AS nrm
       |  FROM embeddings)
       |SELECT id_a, id_b, round(cos, 6) AS cos_sim FROM (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |    (${dotSqlDuck("a.embedding", "b.embedding")}) / (a.nrm * b.nrm) AS cos
       |  FROM v a JOIN v b ON a.vec_id < b.vec_id)
       |WHERE cos > $threshold
       |ORDER BY id_a, id_b""".stripMargin

  // ---- bucketed cosine near-dup pairs (the scale path for cosinePairs) ---

  /** Seeded Rademacher (±1) hyperplane signs, shared between the Spark plan
    * and the oracle SQL builder so both engines compute identical buckets.
    * Rademacher vectors are a valid sign-random-projection family (Charikar
    * STOC 2002 uses Gaussians; ±1 entries preserve the sign-agreement
    * property and embed compactly as SQL `+/-` terms). */
  def srpSigns(nTables: Int, bitsPerTable: Int, seed: Long): Array[Array[Array[Double]]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nTables, bitsPerTable, Dim)(if (rnd.nextBoolean()) 1.0 else -1.0)
  }

  val PairTables = 8
  val PairBitsPerTable = 4
  val PairSeed = 7L

  /** Embedding-cosine near-dup pairs via multi-table SRP bucketing — the
    * 100 TB replacement for [[cosinePairs]]'s all-pairs theta join. Shape:
    * slim (vec_id, table, bucket) relation self-joined on the bucket key
    * (plain equi-join — one shuffle keyed by (t, b), never a nested-loop),
    * pair candidates deduped on ids alone, then embeddings joined back by id
    * so the 64-float payload moves once per vector, not once per bucket row.
    * Approximate by design: a pair is emitted iff it collides in ≥1 table
    * (recall at cos≥0.9 ≈ 1; at the demo threshold 0.4 ≈ 0.75 with 8×4-bit
    * tables — bitsPerTable grows with corpus size at scale). The oracle
    * replicates the exact bucket arithmetic, so the check is exact. */
  /** Config-tuned entry point ([[graft.etl.EngineConfig]] srp* tunables). */
  def cosinePairsBucketed(emb: DataFrame, cfg: graft.etl.EngineConfig,
      threshold: Double): DataFrame =
    cosinePairsBucketed(emb, threshold, cfg.srpPairTables, cfg.srpPairBitsPerTable)

  def cosinePairsBucketed(emb: DataFrame, threshold: Double = 0.4,
      nTables: Int = PairTables, bitsPerTable: Int = PairBitsPerTable,
      seed: Long = PairSeed): DataFrame = {
    val signs = srpSigns(nTables, bitsPerTable, seed)
    val tables = (0 until nTables).map { t =>
      val bits = (0 until bitsPerTable).map { j =>
        when(graft.functions.VectorExprs.dotConst(col("embedding"), signs(t)(j)) >= 0,
          lit(1L << j)).otherwise(lit(0L))
      }
      struct(lit(t).as("t"), bits.reduce(_ + _).as("b"))
    }
    val bk = emb.select(col("vec_id"), explode(array(tables: _*)).as("tb"))
      .select(col("vec_id"), col("tb.t").as("t"), col("tb.b").as("b"))
    val cand = bk.as("x").join(bk.as("y"),
        col("x.t") === col("y.t") && col("x.b") === col("y.b") &&
        col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("id_a"), col("y.vec_id").as("id_b"))
      .distinct()
    val v = withNorm(emb)
    val a = v.select(col("vec_id").as("id_a"), col("embedding").as("va"), col("nrm").as("na"))
    val b = v.select(col("vec_id").as("id_b"), col("embedding").as("vb"), col("nrm").as("nb"))
    cand.join(a, "id_a").join(b, "id_b")
      .withColumn("cos", dotCol("va", "vb") / (col("na") * col("nb")))
      .filter(col("cos") > threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos_sim"))
  }

  /** `0.0 + e[1] - e[2] ...` signed projection chain — bit-identical to
    * FloatVectorDotConst's left-to-right double accumulation from 0.0. */
  private def signedProjSqlDuck(signs: Array[Double]): String =
    "0.0" + signs.zipWithIndex.map { case (s, i) =>
      val op = if (s > 0) "+" else "-"
      s" $op CAST(embedding[${i + 1}] AS DOUBLE)"
    }.mkString

  def cosinePairsBucketedSqlDuck(threshold: Double = 0.4,
      nTables: Int = PairTables, bitsPerTable: Int = PairBitsPerTable,
      seed: Long = PairSeed): String = {
    val signs = srpSigns(nTables, bitsPerTable, seed)
    val bkUnion = (0 until nTables).map { t =>
      val bits = (0 until bitsPerTable).map { j =>
        s"(CASE WHEN ${signedProjSqlDuck(signs(t)(j))} >= 0 THEN ${1L << j} ELSE 0 END)"
      }.mkString(" + ")
      s"SELECT vec_id, $t AS t, $bits AS b FROM embeddings"
    }.mkString(" UNION ALL ")
    s"""WITH v AS (SELECT vec_id, embedding, sqrt(${dotSqlDuck("embedding", "embedding")}) AS nrm
       |  FROM embeddings),
       | bk AS ($bkUnion),
       | cand AS (SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
       |   FROM bk x JOIN bk y ON x.t = y.t AND x.b = y.b AND x.vec_id < y.vec_id)
       |SELECT id_a, id_b, round(cos, 6) AS cos_sim FROM (
       |  SELECT c.id_a, c.id_b,
       |    (${dotSqlDuck("a.embedding", "b.embedding")}) / (a.nrm * b.nrm) AS cos
       |  FROM cand c JOIN v a ON a.vec_id = c.id_a JOIN v b ON b.vec_id = c.id_b)
       |WHERE cos > $threshold
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** Signed-random-projection LSH bucket key for one table. Hyperplanes are
    * drawn from a seeded PRNG on the driver — deterministic across runs. */
  def srpBuckets(emb: DataFrame, nPlanes: Int = 12, seed: Long = 42L): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val planes = Array.fill(nPlanes, Dim)(rnd.nextGaussian())
    val bits = planes.zipWithIndex.map { case (p, j) =>
      val proj = graft.functions.VectorExprs.dotConst(col("embedding"), p)
      when(proj >= 0, lit(1L << j)).otherwise(lit(0L))
    }
    emb.withColumn("bucket", bits.reduce(_ + _))
  }

  val AnnTables = 8
  val AnnBitsPerTable = 8

  /** Multi-table SRP bucket assignment: `buckets` = array of (table, bucket)
    * structs. Standard LSH tradeoff: each table is a coarse 2^bits partition;
    * a true near-duplicate (cos ≥ ~0.9) collides in at least one of the L
    * tables with high probability (≈ 1-(1-p^bits)^L, p = 1-θ/π). */
  def srpTables(emb: DataFrame, nTables: Int = AnnTables,
      bitsPerTable: Int = AnnBitsPerTable, seed: Long = 42L): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val tables = (0 until nTables).map { t =>
      val planes = Array.fill(bitsPerTable, Dim)(rnd.nextGaussian())
      val bits = planes.zipWithIndex.map { case (p, j) =>
        val proj = graft.functions.VectorExprs.dotConst(col("embedding"), p)
        when(proj >= 0, lit(1L << j)).otherwise(lit(0L))
      }
      struct(lit(t).as("t"), bits.reduce(_ + _).as("b"))
    }
    emb.withColumn("buckets", array(tables: _*))
  }

  /** ANN top-k via multi-table SRP LSH with multi-probe — the scale path
    * pairing the exact brute-force baseline. Candidates = union over tables
    * of vectors in the query's bucket OR any bucket at Hamming distance 1
    * (probing only expands the broadcast query side: each query row becomes
    * bitsPerTable+1 probe rows; the join stays a plain equi-join on
    * (table, bucket)). Same payload discipline as [[cosinePairsBucketed]]:
    * the bucket join and candidate dedup run on SLIM id rows; the 64-float
    * embeddings join back by id afterwards, so they move once per vector —
    * never through the dedup shuffle, and never replicated per bucket row.
    * One shuffle keyed by (table, bucket); never all-pairs. */
  def annTopK(emb: DataFrame, nQueries: Int = 8, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = srpTables(emb)
    val probes = (0 until AnnBitsPerTable).map(j =>
      struct(col("qb0.t").as("t"),
        col("qb0.b").bitwiseXOR(lit(1L << j)).as("b"))) :+ col("qb0")
    val qSlim = v.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), explode(col("buckets")).as("qb0"))
      .select(col("query_id"), explode(array(probes: _*)).as("qb"))
      .select(col("query_id"), col("qb.t").as("t"), col("qb.b").as("b"))
    val cSlim = v.select(col("vec_id").as("neighbor_id"), explode(col("buckets")).as("cb"))
      .select(col("neighbor_id"), col("cb.t").as("t"), col("cb.b").as("b"))
    val candIds = cSlim.join(broadcast(qSlim), Seq("t", "b"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id")
      .dropDuplicates("query_id", "neighbor_id")
    val vn = withNorm(emb)
    val qArr = vn.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"), col("nrm").as("qn"))
    val cArr = vn.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("cv"), col("nrm").as("cn"))
    val scored = candIds.join(broadcast(qArr), "query_id").join(cArr, "neighbor_id")
      .withColumn("cos", dotCol("qv", "cv") / (col("qn") * col("cn")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("cos"), 6).as("cos_sim"))
  }
}

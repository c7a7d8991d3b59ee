package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession.spark
import org.apache.spark.sql.functions._

class SketchSpec extends AnyFunSuite {
  import spark.implicits._

  test("MinKDistinct keeps the k smallest distinct values through reduce and merge") {
    val agg = new Sketch.MinKDistinct(3)
    val buf = Seq("d", "b", "f", "b", "a", "z", "a")
      .foldLeft(agg.zero)(agg.reduce)
    assert(buf == Seq("a", "b", "d"))
    assert(agg.merge(Seq("a", "c", "e"), Seq("b", "c", "d")) == Seq("a", "b", "c"))
    assert(agg.reduce(buf, null) == buf)
  }

  test("property: MinKDistinct reduce-in-any-order equals sorted-distinct-take-k") {
    val rnd = new scala.util.Random(19)
    val agg = new Sketch.MinKDistinct(8)
    for (round <- 1 to 6) {
      val xs = Seq.fill(rnd.nextInt(60) + 1)(s"v${rnd.nextInt(30)}")
      val expect = xs.distinct.sorted.take(8)
      // arbitrary reduce order
      assert(rnd.shuffle(xs).foldLeft(agg.zero)(agg.reduce) == expect, s"round=$round")
      // arbitrary partition split + merge
      val parts = xs.grouped(rnd.nextInt(10) + 1)
        .map(_.foldLeft(agg.zero)(agg.reduce)).toSeq
      assert(parts.reduce(agg.merge) == expect, s"round=$round merge")
    }
  }

  test("kmv estimate is within 3 relative standard errors of the truth") {
    // n distinct keys, heavy duplication; RSE of KMV ≈ 1/sqrt(k-2)
    val n = 2000
    val k = 64
    val df = spark.range(n * 5).select((col("id") % n).as("key"))
    val row = Sketch.kmvDistinct(df.toDF(), col("key"), k).collect().head
    val est = row.getAs[Double]("est_distinct")
    val exact = row.getAs[Long]("exact_distinct")
    assert(exact == n)
    val rse = 1.0 / math.sqrt(k - 2)
    assert(math.abs(est - n) / n < 3 * rse, s"est=$est exact=$exact")
  }

  test("estimate is exact-input deterministic: partitioning does not change it") {
    val df = spark.range(5000).select((col("id") % 777).as("key")).toDF()
    val a = Sketch.kmvDistinct(df.repartition(1), col("key"), 32).collect().head
    val b = Sketch.kmvDistinct(df.repartition(13), col("key"), 32).collect().head
    assert(a == b)
  }

  test("grouped kmv estimates each group within 3 RSE; small groups go null") {
    val k = 128
    val df = spark.range(20000).select(
      when(col("id") < 10000, "a").otherwise("b").as("g"),
      // group a: 2000 distinct; group b: 10 distinct (< k -> null estimate)
      when(col("id") < 10000, col("id") % 2000).otherwise(col("id") % 10).as("key"))
    val rows = Sketch.kmvDistinctBy(df, "g", col("key"), k)
      .collect().map(r => r.getString(0) -> r).toMap
    val a = rows("a")
    val rse = 1.0 / math.sqrt(k - 2)
    assert(a.getAs[Long]("exact_distinct") == 2000)
    assert(math.abs(a.getAs[Double]("est_distinct") - 2000) / 2000 < 3 * rse)
    val b = rows("b")
    assert(b.isNullAt(b.fieldIndex("kth_hash")) && b.isNullAt(b.fieldIndex("est_distinct")))
    assert(b.getAs[Long]("exact_distinct") == 10)
  }

  test("kth_hash is null when there are fewer than k distinct keys") {
    val df = spark.range(10).toDF()
    val row = Sketch.kmvDistinct(df, col("id"), 64).collect().head
    assert(row.isNullAt(row.fieldIndex("kth_hash")))
    assert(row.getAs[Long]("exact_distinct") == 10L)
  }

  test("exactQuantileDisc: type-1 quantiles exact on knowns, duplicates, empties") {
    import spark.implicits._
    // 1..100: target(0.5) = ceil(50) = 50 -> value 50; target(0.9) -> 90
    val df = spark.range(1, 101).select(col("id").cast("double").as("v")).toDF()
    val q = Sketch.exactQuantileDisc(df, "v", Seq(0.5, 0.9)).collect()
      .map(r => r.getDouble(0) -> r.getDouble(2)).toMap
    assert(q == Map(0.5 -> 50.0, 0.9 -> 90.0))
    // heavy duplicates: median of [1,1,1,1,9] is 1
    val dup = Seq(1.0, 1.0, 1.0, 1.0, 9.0).toDF("v")
    assert(Sketch.exactQuantileDisc(dup, "v", Seq(0.5)).collect().head.getDouble(2) == 1.0)
    // adjacent doubles: bracket must terminate, not loop
    val adj = Seq(1.0, math.nextUp(1.0)).toDF("v")
    assert(Sketch.exactQuantileDisc(adj, "v", Seq(0.5)).collect().head.getDouble(2) == 1.0)
    assert(Sketch.exactQuantileDisc(adj, "v", Seq(1.0)).collect().head.getDouble(2)
      == math.nextUp(1.0))
    // empty input: n = 0, null value
    val e = Sketch.exactQuantileDisc(Seq.empty[Double].toDF("v"), "v", Seq(0.5))
      .collect().head
    assert(e.getLong(1) == 0L && e.isNullAt(2))
    // agrees with a full sort on random data (the thing it must never do)
    val rnd = new scala.util.Random(47)
    val xs = Seq.fill(501)(rnd.nextDouble() * 200 - 100)
    val got = Sketch.exactQuantileDisc(xs.toDF("v"), "v", Seq(0.25, 0.75)).collect()
      .map(r => r.getDouble(0) -> r.getDouble(2)).toMap
    val sorted = xs.sorted
    def t1(p: Double) = sorted(math.ceil(p * xs.size).toInt - 1)
    assert(got == Map(0.25 -> t1(0.25), 0.75 -> t1(0.75)))
  }

  test("exactQuantileDiscByGroup agrees with a per-group full sort") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (for (g <- Seq("a", "b", "c"); _ <- 1 to 201)
      yield (g, rnd.nextDouble() * 100 - 50)) ++ Seq(("d", 7.0)) // 1-row group
    val got = Sketch.exactQuantileDiscByGroup(rows.toDF("g", "v"), "g", "v",
      Seq(0.5, 0.9)).collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val byG = rows.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    def t1(g: String, p: Double) = byG(g)(math.ceil(p * byG(g).size).toInt - 1)
    for (g <- Seq("a", "b", "c", "d"); p <- Seq(0.5, 0.9)) {
      assert(got((g, p)) == ((byG(g).size.toLong, t1(g, p))), s"group $g p $p")
    }
  }

  test("exactQuantileDiscByGroup rounds track the widest group, not groups x probs") {
    import spark.implicits._
    // a narrow-range group next to a wide-range one must not multiply jobs:
    // verified behaviorally — the call completes and matches sort on both
    val rows = Seq.tabulate(100)(i => ("narrow", 5.0 + (i % 3))) ++
      Seq.tabulate(100)(i => ("wide", i * 1e6))
    val got = Sketch.exactQuantileDiscByGroup(rows.toDF("g", "v"), "g", "v", Seq(0.5))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    val med = (s: Seq[Double]) => s.sorted.apply(math.ceil(0.5 * s.size).toInt - 1)
    assert(got("narrow") == med(rows.filter(_._1 == "narrow").map(_._2)))
    assert(got("wide") == med(rows.filter(_._1 == "wide").map(_._2)))
  }

  test("kmvJaccard: exact at the extremes; ±3 RSE between; partitioning-invariant") {
    def ids(lo: Long, hi: Long) = spark.range(lo, hi).toDF("k")
    def j(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame, k: Int) =
      Sketch.kmvJaccard(a, col("k"), b, col("k"), k).collect().head
    // identical sets: every merged hash is in both -> exactly 1.0
    val same = j(ids(0, 500), ids(0, 500), 64)
    assert(same.getAs[Double]("jaccard_est") == 1.0 &&
      same.getAs[Double]("jaccard_exact") == 1.0)
    // disjoint sets: no merged hash is in both -> exactly 0.0
    val disj = j(ids(0, 500), ids(500, 1000), 64)
    assert(disj.getAs[Double]("jaccard_est") == 0.0 &&
      disj.getAs[Double]("jaccard_exact") == 0.0)
    // true J = 500/1500 = 1/3; RSE ≈ sqrt(J(1-J)/k)
    val k = 256
    val mid = j(ids(0, 1000), ids(500, 1500), k)
    assert(mid.getAs[Double]("jaccard_exact") == 1.0 / 3.0)
    val rse = math.sqrt((1.0 / 3) * (2.0 / 3) / k)
    assert(math.abs(mid.getAs[Double]("jaccard_est") - 1.0 / 3) < 3 * rse)
    // partitioning cannot change the winners
    val a = j(ids(0, 1000).repartition(1), ids(500, 1500).repartition(1), k)
    val b = j(ids(0, 1000).repartition(13), ids(500, 1500).repartition(7), k)
    assert(a == b)
  }

  test("sampleQuantiles: partitioning-invariant; ±3 RSE of truth; n<k degenerates to exact") {
    // values 0..9999 uniformly: true median 4999.5, p90 8999.x
    val df = spark.range(10000).select(col("id").as("key"), col("id").cast("double").as("v")).toDF()
    val a = Sketch.sampleQuantiles(df.repartition(1), "v", col("key"), 256).collect().head
    val b = Sketch.sampleQuantiles(df.repartition(13), "v", col("key"), 256).collect().head
    assert(a == b) // same winners on any partitioning
    assert(a.getAs[Long]("sample_n") == 256L)
    val rse = 1.0 / math.sqrt(256)
    assert(math.abs(a.getAs[Double]("q50") - 5000.0) / 10000.0 < 3 * rse)
    assert(math.abs(a.getAs[Double]("q90") - 9000.0) / 10000.0 < 3 * rse)
    // fewer rows than k: the "sample" is the whole population -> exact
    val small = spark.range(101).select(col("id").as("key"), col("id").cast("double").as("v")).toDF()
    val s = Sketch.sampleQuantiles(small, "v", col("key"), 256).collect().head
    assert(s.getAs[Long]("sample_n") == 101L)
    assert(s.getAs[Double]("q50") == 50.0)
  }

  test("sampleQuantiles: duplicate keys (hash ties) still sample deterministically") {
    // key repeats -> identical _h values; the value-secondary order must
    // pick tie members identically on any partitioning
    val df = spark.range(2000).select((col("id") % 100).as("key"),
      (col("id") % 7).cast("double").as("v")).toDF()
    val a = Sketch.sampleQuantiles(df.repartition(1), "v", col("key"), 64).collect().head
    val b = Sketch.sampleQuantiles(df.repartition(17), "v", col("key"), 64).collect().head
    assert(a == b)
  }

  test("sampleQuantilesByGroup: every group sampled; per-group exact when group < k") {
    val df = spark.range(3000).select(
      when(col("id") % 3 === 0, "a").when(col("id") % 3 === 1, "b").otherwise("c").as("g"),
      col("id").as("key"), col("id").cast("double").as("v")).toDF()
    val rows = Sketch.sampleQuantilesByGroup(df, "g", "v", col("key"), 64)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("a", "b", "c"))
    assert(rows.values.forall(_.getAs[Long]("sample_n") == 64L))
    // tiny groups: sample == group -> exact interpolated median
    val tiny = spark.range(30).select(
      when(col("id") < 10, "x").otherwise("y").as("g"),
      col("id").as("key"), col("id").cast("double").as("v")).toDF()
    val tx = Sketch.sampleQuantilesByGroup(tiny, "g", "v", col("key"), 64)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(tx("x").getAs[Long]("sample_n") == 10L)
    assert(tx("x").getAs[Double]("q50") == 4.5)
  }

  test("hllDistinctByGroup: ±3 RSE of the exact count; partitioning-invariant") {
    // HLL's RSE for m=256 registers is 1.04/sqrt(256) = 6.5%; with the
    // raw (uncorrected) estimator the low-cardinality bias widens the
    // band, so assert a conservative 4x RSE envelope at n=2000 and 500.
    val df = spark.range(4000).select(
      when(col("id") % 2 === 0, "even").otherwise("odd").as("g"),
      when(col("id") % 2 === 0, col("id") / 2).otherwise(col("id") % 1000)
        .cast("long").as("k")).toDF()
    val got = Sketch.hllDistinctByGroup(df, "g", "k")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got.keySet == Set("even", "odd"))
    got.values.foreach { r =>
      val exact = r.getAs[Long]("n_exact").toDouble
      val est = r.getAs[Double]("hll_estimate")
      assert(math.abs(est - exact) / exact < 4 * 0.065,
        s"estimate $est too far from exact $exact")
      assert(r.getAs[Long]("registers_hit") + r.getAs[Long]("zero_registers") == 256L)
    }
    // registers merge by max -> the estimate is a pure function of the key
    // SET, whatever the partitioning
    val again = Sketch.hllDistinctByGroup(df.repartition(13), "g", "k")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("hll_estimate")).toMap
    assert(again == got.map { case (g, r) => g -> r.getAs[Double]("hll_estimate") })
  }

  test("kmvDifference: exact sides, sketch-covers-union exactness, zero " +
    "difference on identical sets") {
    def set(xs: Range) = xs.map(_.toLong).toDF("x")
    val a = set(1 to 20)
    val b = set(15 to 30)
    // k = 64 > |union| = 30: the merged sketch holds the WHOLE union →
    // estimates are exact by construction
    val full = Sketch.kmvDifference(a, col("x"), b, col("x"), 64)
      .collect().head
    assert(full.getAs[Long]("k_merged") == 30L)
    assert(full.getAs[Long]("exact_a_not_b") == 14L) // 1..14
    assert(full.getAs[Long]("exact_b_not_a") == 10L) // 21..30
    assert(full.getAs[Double]("est_a_not_b") == 14.0)
    assert(full.getAs[Double]("est_b_not_a") == 10.0)
    // identical sets → both differences zero (sketch and exact)
    val same = Sketch.kmvDifference(a, col("x"), a, col("x"), 8)
      .collect().head
    assert(same.getAs[Long]("a_only_hits") == 0L &&
      same.getAs[Double]("est_a_not_b") == 0.0 &&
      same.getAs[Long]("exact_a_not_b") == 0L)
    // k < union: estimate within a loose band of truth, partition-invariant
    val sk = Sketch.kmvDifference(a, col("x"), b, col("x"), 8).collect().head
    assert(sk.getAs[Long]("k_merged") == 8L)
    assert(sk.getAs[Double]("est_a_not_b") >= 0.0)
    val again = Sketch.kmvDifference(a.repartition(5), col("x"),
      b.repartition(3), col("x"), 8).collect().head
    assert(sk.toString == again.toString)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{GraphOps, TextAnalysis}

/** Graph analytics (G1–G4) + bigram-LM scoring: hand-computed fixed-point
  * values on a tiny graph, an independent reformulation of 2-hop over the
  * raw tables, and ordering/self-consistency properties for PMI and the LM
  * score. (DuckDB hash equality is the driver's gate; these pin the
  * semantics independently of the oracle SQL.)
  */
class GraphLmSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("fixed-point pagerank matches hand computation on a 3-node cycle") {
    // A→B, A→C, B→C, C→A; pr0 = 1e6 each; d = 17/20, all integer division.
    val e = Seq(("A", "B"), ("A", "C"), ("B", "C"), ("C", "A")).toDF("src", "dst")
    val r1 = GraphOps.pagerankOf(e, iters = 1).as[(String, Long)].collect().toMap
    assert(r1 == Map("A" -> 1000000L, "B" -> 575000L, "C" -> 1425000L))
    val r2 = GraphOps.pagerankOf(e, iters = 2).as[(String, Long)].collect().toMap
    // A: 150000 + 17*1425000/20 = 1361250; B: A/2 again = 575000;
    // C: 150000 + 17*(500000 + 575000)/20 = 1063750
    assert(r2 == Map("A" -> 1361250L, "B" -> 575000L, "C" -> 1063750L))
  }

  test("pagerank is invariant under shuffle-partition count (exact integers)") {
    val a = GraphOps.pagerank(spark, sf).as[(String, Long)].collect().toMap
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val b = GraphOps.pagerank(spark, sf).as[(String, Long)].collect().toMap
      assert(a == b)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("degree sums: total out = total in = edge count; dangling shapes hold") {
    val deg = GraphOps.degree(spark, sf)
    val (o, i) = deg.agg(sum("out_deg"), sum("in_deg")).as[(Long, Long)].head()
    val nEdges = GraphOps.edges(spark, sf).count()
    assert(o == nEdges && i == nEdges)
    // orders are pure sources (in=0), regions pure sinks (out=0)
    assert(deg.filter(col("node").startsWith("order:") && col("in_deg") =!= 0).isEmpty)
    assert(deg.filter(col("node").startsWith("region:") && col("out_deg") =!= 0).isEmpty)
  }

  test("two-hop from regions == distinct customers+suppliers of the region's nations") {
    val expected = {
      val nation = Tables.nation(spark, sf)
        .select(col("n_nationkey"), col("n_regionkey"))
      val cust = Tables.customer(spark, sf).select(col("c_nationkey").as("nk"))
      val supp = Tables.supplier(spark, sf).select(col("s_nationkey").as("nk"))
      cust.unionAll(supp).join(nation, col("nk") === col("n_nationkey"))
        .groupBy(col("n_regionkey")).agg(count(lit(1)).as("n"))
        .select(concat(lit("region:"), col("n_regionkey").cast("string")), col("n"))
        .as[(String, Long)].collect().toMap
    }
    val got = GraphOps.twoHop(spark, sf).as[(String, Long)].collect().toMap
    assert(got == expected)
  }

  test("components == one per region, derived independently from the raw tables") {
    val nation = Tables.nation(spark, sf).select(col("n_nationkey"), col("n_regionkey"))
    // every node's region via explicit chain joins (no graph machinery)
    val nodeRegion =
      Tables.region(spark, sf)
        .select(concat(lit("region:"), col("r_regionkey").cast("string")).as("node"),
                col("r_regionkey").as("rk"))
      .unionAll(nation
        .select(concat(lit("nation:"), col("n_nationkey").cast("string")).as("node"),
                col("n_regionkey").as("rk")))
      .unionAll(Tables.customer(spark, sf).join(nation, col("c_nationkey") === col("n_nationkey"))
        .select(concat(lit("cust:"), col("c_custkey").cast("string")).as("node"),
                col("n_regionkey").as("rk")))
      .unionAll(Tables.supplier(spark, sf).join(nation, col("s_nationkey") === col("n_nationkey"))
        .select(concat(lit("supp:"), col("s_suppkey").cast("string")).as("node"),
                col("n_regionkey").as("rk")))
      .unionAll(Tables.orders(spark, sf)
        .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
        .join(nation, col("c_nationkey") === col("n_nationkey"))
        .select(concat(lit("order:"), col("o_orderkey").cast("string")).as("node"),
                col("n_regionkey").as("rk")))
    val expected = nodeRegion
      .select(col("node"), col("rk").cast("long").as("rk")).as[(String, Long)].collect()
      .groupBy(_._2).iterator.flatMap { case (_, ns) =>
        val label = ns.map(_._1).min
        ns.iterator.map(n => n._1 -> label)
      }.toMap
    val got = GraphOps.components(spark, sf).as[(String, String)].collect().toMap
    assert(got == expected)
  }

  test("triangles: hand-derived from the raw tables (one per order via the shortcut)") {
    // the only triangles in edges+shortcut are {order, its customer, the
    // customer's nation}: orders get 1; a customer gets its order count; a
    // nation gets the order count over its customers; others get none
    val tri = GraphOps.triangles(spark, sf).as[(String, Long)].collect().toMap
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select($"o_orderkey".cast("long"), $"o_custkey".cast("long")).as[(Long, Long)].collect()
    val custNation = spark.read.parquet(s"$sf/customer.parquet")
      .select($"c_custkey".cast("long"), $"c_nationkey".cast("long")).as[(Long, Long)].collect().toMap
    assert(orders.nonEmpty)
    orders.take(50).foreach { case (o, _) => assert(tri(s"order:$o") == 1L) }
    val byCust = orders.groupBy(_._2).view.mapValues(_.length.toLong)
    byCust.take(20).foreach { case (c, n) => assert(tri(s"cust:$c") == n) }
    val byNation = orders.groupBy(o => custNation(o._2)).view.mapValues(_.length.toLong)
    byNation.foreach { case (nat, n) => assert(tri(s"nation:$nat") == n) }
    assert(!tri.keys.exists(_.startsWith("supp:")) && !tri.keys.exists(_.startsWith("region:")))
    // every triangle contributes exactly 3 node increments
    assert(tri.values.sum == 3L * orders.length)
  }

  test("triangles: degree-oriented counts match brute force on seeded random graphs") {
    import spark.implicits._
    // skewed random multigraphs (node ids drawn quadratically → hubs), with
    // self-loops and duplicate/reversed edges the normalization must absorb
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 30 + trial * 20
      val edges = Seq.fill(n * 6) {
        val a = (math.pow(rnd.nextDouble(), 2) * n).toInt
        val b = rnd.nextInt(n)
        (s"n$a", s"n$b")
      }
      val df = edges.toDF("src", "dst")
      val got = GraphOps.triangleCounts(df).as[(String, Long)].collect().toMap
      // brute force over the normalized simple graph
      val und = edges.collect { case (a, b) if a != b =>
        if (a < b) (a, b) else (b, a) }.toSet
      val nodes = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
      val expect = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
      for {
        i <- nodes.indices; j <- (i + 1) until nodes.size; k <- (j + 1) until nodes.size
        (a, b, c) = (nodes(i), nodes(j), nodes(k))
        if und((a, b)) && und((b, c)) && und((a, c))
      } { expect(a) += 1; expect(b) += 1; expect(c) += 1 }
      assert(got == expect.toMap, s"trial $trial: mismatch (n=$n)")
      assert(expect.nonEmpty, s"trial $trial produced no triangles — weak test")
    }
  }

  test("shortest paths: hop distances match the raw-table chains") {
    val sp = GraphOps.shortestPaths(spark, sf).as[(String, String, Int)].collect()
      .map { case (s, n, d) => (s, n) -> d }.toMap
    val nations = spark.read.parquet(s"$sf/nation.parquet")
      .select($"n_nationkey".cast("long"), $"n_regionkey".cast("long")).as[(Long, Long)].collect()
    val custNation = spark.read.parquet(s"$sf/customer.parquet")
      .select($"c_custkey".cast("long"), $"c_nationkey".cast("long")).as[(Long, Long)].collect().toMap
    val nationRegion = nations.toMap
    nations.foreach { case (n, r) => assert(sp((s"region:$r", s"nation:$n")) == 1) }
    custNation.take(30).foreach { case (c, n) =>
      assert(sp((s"region:${nationRegion(n)}", s"cust:$c")) == 2) }
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select($"o_orderkey".cast("long"), $"o_custkey".cast("long")).as[(Long, Long)].collect()
    orders.take(30).foreach { case (o, c) =>
      assert(sp((s"region:${nationRegion(custNation(c))}", s"order:$o")) == 3) }
    // each node reaches exactly ONE region (the graph is a forest upward)
    val perNode = sp.keys.groupBy(_._2).view.mapValues(_.size)
    assert(perNode.values.forall(_ == 1))
    assert(sp.values.forall(d => d >= 0 && d <= 3))
  }

  test("pmi self-consistency: ordered pairs, co <= min(df), pmi recomputed from counts") {
    val rows = GraphOps.pmi(spark, sf)
      .select(col("t1"), col("t2"), col("co"), col("df1"), col("df2"), col("pmi"))
      .as[(String, String, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    val nDocs = Tables.documents(spark, sf).count()
    rows.foreach { case (t1, t2, co, df1, df2, pmi) =>
      assert(t1 < t2)
      assert(co <= math.min(df1, df2))
      val expected = math.log(co.toDouble * nDocs / (df1.toDouble * df2)) / math.log(2)
      assert(math.abs(pmi - expected) < 1e-5, s"($t1,$t2)")
    }
  }

  test("lm score: templated text scores more predictable than unique text") {
    // 20 documents sharing one template (the model learns their bigrams,
    // counts ~20) vs one document of unique never-repeated token sequences.
    val template = (1 to 30).map(i => s"alpha_${i % 3} beta_${i % 3}").mkString(" ")
    val unique = (1 to 60).map(i => s"only_once_$i").mkString(" ")
    val docs = ((1 to 20).map(i => (i.toLong, template)) :+ (99L, unique))
      .toDF("doc_id", "text")
    val scores = TextAnalysis.lmScoreFor(docs)
      .select(col("doc_id"), col("n_bigrams"), col("avg_nll"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(scores(1L)._3 < scores(99L)._3,
      s"templated ${scores(1L)._3} should beat unique ${scores(99L)._3}")
    // n_bigrams = tokens - 1
    assert(scores(1L)._2 == 59L && scores(99L)._2 == 59L)
    // single-token / empty docs drop out instead of emitting null scores
    val tiny = Seq((1L, "solo"), (2L, "")).toDF("doc_id", "text")
    assert(TextAnalysis.lmScoreFor(tiny).count() == 0)
  }

  test("approx length quantiles are bounded by the exact operator's neighbors") {
    // percentile_approx guarantees rank error <= n/accuracy; at accuracy
    // 10000 that is under one rank here, so each approx quantile must fall
    // inside the exact operator's [q-0.02, q+0.02] interpolated band. The
    // sketch has no cross-engine oracle by contract — this property IS its
    // correctness gate.
    val exact = Tables.documents(spark, sf)
      .select(col("lang"),
        size(regexp_extract_all(col("text"), lit("\\S+"), lit(0)))
          .cast("long").as("toks"))
      .groupBy(col("lang"))
      .agg(percentile(col("toks"), lit(0.23)).as("lo25"), percentile(col("toks"), lit(0.27)).as("hi25"),
           percentile(col("toks"), lit(0.48)).as("lo50"), percentile(col("toks"), lit(0.52)).as("hi50"),
           percentile(col("toks"), lit(0.73)).as("lo75"), percentile(col("toks"), lit(0.77)).as("hi75"),
           percentile(col("toks"), lit(0.93)).as("lo95"), percentile(col("toks"), lit(0.97)).as("hi95"))
    val approx = TextAnalysis.lengthQuantilesApprox(spark, sf)
    val joined = approx.join(exact, "lang").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      for (q <- Seq("25", "50", "75", "95")) {
        val v = r.getAs[Long](s"p$q").toDouble
        val (lo, hi) = (r.getAs[Double](s"lo$q"), r.getAs[Double](s"hi$q"))
        assert(lo <= v && v <= hi,
          s"lang=${r.getAs[String]("lang")} p$q=$v outside exact band [$lo,$hi]")
      }
    }
    // columns and group count line up with the exact operator (drop-in shape)
    assert(approx.columns.toSeq == TextAnalysis.lengthQuantiles(spark, sf).columns.toSeq)
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Graph analytics over materialized (subj, pred, obj) triples — the
  * consumption side of a KG-construction engine (SURVEY.md §2.11 G1–G4).
  * Once the pipeline has emitted a graph, the same engine must answer the
  * sanity/quality queries a KG user runs first: degree profiles, centrality
  * (PageRank), k-hop reachability, and co-occurrence association strength
  * (PMI). All four are expressed over an edge table with the exact triple
  * shape the pipeline materializes (`Canonicalize.triples`).
  *
  * The driver-verifiable instance derives a deterministic heterogeneous KG
  * from the TPC-H-ish testdata tables (order → customer → nation → region,
  * supplier → nation), so both engines read the same stored inputs.
  *
  * Scale notes (100 TB):
  *  - every query below shuffles only on node/edge keys with partial
  *    aggregation; none collects to the driver;
  *  - PageRank is the classic bulk-iteration shape — per round one shuffle
  *    join (ranks ⋈ edges on src) + one groupBy(dst). The unrolled rounds
  *    compose into ONE plan, so the edge side's exchange is planned once and
  *    reused (ReusedExchange) instead of re-scanning/re-shuffling per round;
  *  - ranks are exact FIXED-POINT integers (micro-units), not doubles: a
  *    float PageRank's sum order differs between engines/partitionings and
  *    can flip a rounding boundary; integer division cannot. The iteration
  *    is pr' = (1-d)·1e6 + d·Σ floor(pr/outdeg) with d = 17/20, all BIGINT.
  */
object GraphOps {

  /** The deterministic KG edge table (src, pred, dst) from the testdata:
    * order-[placed_by]->customer, customer/supplier-[located_in]->nation,
    * nation-[part_of]->region. Node ids are namespaced strings exactly like
    * the pipeline's `code:`/`kb:` ids. */
  def edges(spark: SparkSession, dir: String): DataFrame = {
    def ns(prefix: String, c: Column): Column = concat(lit(prefix + ":"), c.cast("string"))
    val nation   = Tables.nation(spark, dir)
      .select(ns("nation", col("n_nationkey")).as("src"), lit("part_of").as("pred"),
              ns("region", col("n_regionkey")).as("dst"))
    val customer = Tables.customer(spark, dir)
      .select(ns("cust", col("c_custkey")).as("src"), lit("located_in").as("pred"),
              ns("nation", col("c_nationkey")).as("dst"))
    val supplier = Tables.supplier(spark, dir)
      .select(ns("supp", col("s_suppkey")).as("src"), lit("located_in").as("pred"),
              ns("nation", col("s_nationkey")).as("dst"))
    val orders   = Tables.orders(spark, dir)
      .select(ns("order", col("o_orderkey")).as("src"), lit("placed_by").as("pred"),
              ns("cust", col("o_custkey")).as("dst"))
    nation.unionAll(customer).unionAll(supplier).unionAll(orders)
  }

  /** G1: per-node in/out degree. One exchange: both directions are emitted
    * as (node, out, in) increments in-row and summed in a single two-phase
    * aggregation — no join of two separate degree tables. */
  def degree(spark: SparkSession, dir: String): DataFrame = {
    val e = edges(spark, dir)
    e.select(col("src").as("node"), lit(1L).as("o"), lit(0L).as("i"))
      .unionAll(e.select(col("dst").as("node"), lit(0L).as("o"), lit(1L).as("i")))
      .groupBy(col("node"))
      .agg(sum(col("o")).as("out_deg"), sum(col("i")).as("in_deg"))
  }

  /** Damping factor as an exact rational: d = Num/Den = 17/20 = 0.85. */
  private val Num = 17L
  private val Den = 20L
  /** Fixed-point scale: rank 1.0 ≡ 1,000,000 micro-units. */
  private val One = 1000000L

  /** G2: PageRank, `iters` exact fixed-point rounds (see object scaladoc).
    * Dangling mass is dropped (the classic non-normalized formulation
    * pr'(v) = (1-d) + d·Σ_{u→v} pr(u)/outdeg(u)) — deterministic and
    * engine-reproducible; nodes with no in-edges sit at (1-d). */
  def pagerank(spark: SparkSession, dir: String, iters: Int = 3): DataFrame =
    pagerankOf(edges(spark, dir), iters)

  def pagerankOf(edgeDf: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val e = edgeDf.select(col("src"), col("dst"))
    // outdeg rides WITH the edge rows (one aggregation + one self-join at
    // plan time, shared across all rounds via exchange reuse) so each round
    // joins ranks against a single prepared edge table.
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val eod = e.join(outdeg, "src")
    val nodes = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node"))).distinct()
    var ranks = nodes.withColumn("pr", lit(One))
    for (_ <- 1 to iters) {
      // `div` is exact BIGINT division (truncation toward zero ≡ floor for
      // the non-negative ranks here) — never a double round-trip, so the
      // values are bit-identical to DuckDB's integer `//`.
      val contrib = eod.join(ranks, col("src") === col("node"))
        .select(col("dst"), expr("pr div outdeg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      ranks = nodes
        .join(contrib, col("node") === col("dst"), "left")
        .select(col("node"),
          (lit((Den - Num) * One / Den) +
            expr(s"($Num * coalesce(s, 0L)) div $Den")).as("pr"))
    }
    ranks
  }

  /** G3: 2-hop in-reachability from the region seed nodes — "which entities
    * sit exactly two reversed edges from each region" (suppliers and
    * customers via their nation). Two equi-joins narrowing from the seed set
    * outward; the seed side is broadcastable by construction. */
  def twoHop(spark: SparkSession, dir: String): DataFrame = {
    val e = edges(spark, dir).select(col("src"), col("dst"))
    val seeds = Tables.region(spark, dir)
      .select(concat(lit("region:"), col("r_regionkey").cast("string")).as("seed"))
    val hop1 = e.join(broadcast(seeds), col("dst") === col("seed"))
      .select(col("seed"), col("src").as("mid"))
    val hop2 = e.join(hop1, col("dst") === col("mid"))
      .select(col("seed"), col("src").as("node")).distinct()
    hop2.groupBy(col("seed")).agg(count(lit(1)).as("n_two_hop"))
  }

  /** G5: connected components of the KG viewed undirected — the SAME
    * DataFrame CC machinery the dedup funnel uses
    * (min-label propagation + pointer jumping, [[Dedup.connectedComponents]])
    * applied to the entity graph: component = the component's minimum node
    * id. The fixture graph resolves to one component per region (every
    * order chains up through customer → nation → region); asserted against
    * an independent raw-table derivation in GraphLmSpec. */
  def components(spark: SparkSession, dir: String): DataFrame =
    Dedup.connectedComponents(
      edges(spark, dir).select(col("src").as("d1"), col("dst").as("d2")))
      .select(col("doc_id").as("node"), col("cluster").as("component"))

  /** The G6/G7 graph: [[edges]] plus the composed shortcut
    * order-[in_nation]->nation (placed_by ∘ located_in) — the
    * entity-resolution shortcut a KG builder materializes so that
    * order–customer–nation closes into a triangle. Derived, deterministic,
    * same stored inputs both engines read. */
  def edgesWithShortcuts(spark: SparkSession, dir: String): DataFrame = {
    val e = edges(spark, dir).select(col("src"), col("dst"))
    val shortcut = e.as("oc").join(e.as("cn"), col("oc.dst") === col("cn.src"))
      .filter(col("oc.src").startsWith("order:") && col("cn.dst").startsWith("nation:"))
      .select(col("oc.src").as("src"), col("cn.dst").as("dst"))
    e.unionAll(shortcut)
  }

  /** G6: per-node triangle count over the undirected simple graph — the
    * standard KG cohesion/clustering signal. Scale shape: edges are
    * canonicalized to (lo, hi) with lo < hi and deduplicated, then
    * DEGREE-ORIENTED — each edge points from its lower-(degree, id) endpoint
    * to the higher — before the two-join wedge closure. Orientation is the
    * load-bearing step: every wedge is enumerated at the LOWEST-degree node
    * of its triangle, so per-node fan-out is bounded by out-degree ≤
    * O(√|E|) (arboricity) instead of raw degree. On this graph the
    * `order→nation` shortcut makes every nation a ~10⁴-degree hub; the
    * id-ordered form pivots 90M wedges through those hubs (measured 16.2 s
    * at sf0.1) while the degree-oriented form pivots wedges at the
    * degree-2 order nodes (~|orders| wedges total, measured 2.6 s — see
    * BENCH.md). Each triangle x<y<z in (degree, id) order is found exactly
    * once: wedge (x→y, x→z) closed by the oriented edge y→z. The degree
    * table is |V| rows (join it however AQE likes); both wedge joins
    * shuffle on node keys — no all-pairs step anywhere. */
  def triangles(spark: SparkSession, dir: String): DataFrame =
    triangleCounts(edgesWithShortcuts(spark, dir))

  /** Degree-oriented triangle counting over arbitrary `(src, dst)` edges
    * (direction, duplicates and self-loops are normalized away). */
  def triangleCounts(raw: DataFrame): DataFrame = {
    // und feeds both the degree aggregation and the orientation join, and the
    // oriented table is referenced three times (both wedge sides + the
    // closing-edge join) — materialize each once so one plan does not
    // recompute the dedup/orientation tower per reference (|E| rows, compact).
    val und = raw.select(least(col("src"), col("dst")).as("lo"),
                         greatest(col("src"), col("dst")).as("hi"))
      .filter(col("lo") =!= col("hi")).distinct()
      .localCheckpoint()
    val deg = und.select(explode(array(col("lo"), col("hi"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    // (deg, id) is a total order (ids are distinct), so orientation is
    // deterministic and acyclic: u = tail (lower), v = head (higher).
    val withD = und
      .join(deg.select(col("node").as("lo"), col("deg").as("dlo")), Seq("lo"))
      .join(deg.select(col("node").as("hi"), col("deg").as("dhi")), Seq("hi"))
    val kLo = struct(col("dlo").as("d"), col("lo").as("id"))
    val kHi = struct(col("dhi").as("d"), col("hi").as("id"))
    val or = withD.select(
      when(kLo < kHi, col("lo")).otherwise(col("hi")).as("u"),
      when(kLo < kHi, col("hi")).otherwise(col("lo")).as("v"),
      when(kLo < kHi, kHi).otherwise(kLo).as("vk"))
      .localCheckpoint()
    // the checkpointed edge table carries no size statistics, so the planner
    // would fall back to sort-merge; the wedge pivot and the closure are
    // bounded-build hash joins by design (guide §3.1) — state it explicitly
    val wedge = or.as("e1")
      .join(or.hint("shuffle_hash").as("e2"),
            col("e1.u") === col("e2.u") && col("e1.vk") < col("e2.vk"))
      .select(col("e1.u").as("a"), col("e1.v").as("b"), col("e2.v").as("c"))
    // closing edge y→z is oriented exactly this way because vk(b) < vk(c)
    val tri = wedge.join(or.select(col("u").as("b"), col("v").as("c")).hint("shuffle_hash"),
                         Seq("b", "c"))
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
  }

  /** G7: single-source-set shortest paths, bounded hops — "how far is every
    * entity from its region", the reachability/quality probe run after
    * materialization. Frontier-expansion BFS over REVERSED edges from the
    * region seeds, `maxHops` rounds unrolled into one plan: each round joins
    * the previous frontier against the same prepared edge table (exchange
    * reused across rounds, the PageRank discipline) and a final min-groupBy
    * resolves multiple discovery paths. Monotone frontier: a node found at
    * hop h is never re-expanded later (anti-join against the settled set
    * would be the 10^12-scale refinement; at bounded maxHops the min-agg is
    * exact either way and keeps the plan join-only). */
  def shortestPaths(spark: SparkSession, dir: String, maxHops: Int = 3): DataFrame = {
    val rev = edges(spark, dir).select(col("dst").as("from"), col("src").as("to"))
    val seeds = Tables.region(spark, dir)
      .select(concat(lit("region:"), col("r_regionkey").cast("string")).as("seed"))
    var frontier = seeds.select(col("seed"), col("seed").as("node"), lit(0).as("dist"))
    var all = frontier
    for (h <- 1 to maxHops) {
      frontier = frontier.join(rev, col("node") === col("from"))
        .select(col("seed"), col("to").as("node"), lit(h).as("dist"))
      all = all.unionAll(frontier)
    }
    all.groupBy(col("seed"), col("node")).agg(min(col("dist")).as("dist"))
  }

  /** G4: pointwise mutual information between top-vocabulary terms
    * co-occurring in a document — the association-strength signal a KG
    * builder uses to propose relation candidates between entities. The
    * vocabulary is capped (RelOps.s2Kb's top-20), so the per-doc pair
    * fan-out is bounded (≤ C(20,2)) and the pair aggregation is
    * vocabulary²-sized — broadcast-friendly at any corpus scale. */
  def pmi(spark: SparkSession, dir: String): DataFrame = {
    val docTerms = RelOps.mentions(spark, dir)
      .join(broadcast(RelOps.s2Kb(spark, dir).select(col("label"))),
            col("surface") === col("label"))
      .select(col("doc_id"), col("label").as("term")).distinct()
    val nDocs = Tables.documents(spark, dir).agg(count(lit(1)).as("n"))
    val pairs = docTerms.as("a").join(docTerms.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("a.term") < col("b.term"))
      .groupBy(col("a.term").as("t1"), col("b.term").as("t2"))
      .agg(count(lit(1)).as("co"))
    val marg = docTerms.groupBy(col("term")).agg(count(lit(1)).as("df"))
    pairs
      .join(broadcast(marg.select(col("term").as("t1"), col("df").as("df1"))), "t1")
      .join(broadcast(marg.select(col("term").as("t2"), col("df").as("df2"))), "t2")
      .crossJoin(broadcast(nDocs))
      .select(col("t1"), col("t2"), col("co"), col("df1"), col("df2"),
        round(log2(col("co").cast("double") * col("n") /
                   (col("df1").cast("double") * col("df2"))), 6).as("pmi"))
  }
}

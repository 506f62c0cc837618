package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Similarity search over the `embeddings` table (Array[Float] column).
  *
  * The dot products run as `zip_with` + `aggregate` higher-order functions on
  * the array column — single-pass, codegen-friendly, no explode of 64 rows per
  * vector on the Spark side (the oracle SQL uses the relational unnest form;
  * both round to 4 decimals so the float sum order cannot matter).
  *
  * Scale paths:
  *  - brute-force top-k: query set broadcast against the full table — the
  *    baseline, linear scan, embarrassingly parallel;
  *  - LSH-bucketed ANN: 8 deterministic hyperplanes (signs derived from
  *    md5(plane_dim)) → 256 buckets → candidate join restricted to equal
  *    buckets; multi-probe (Hamming-1 bucket flips) repairs boundary recall.
  *    At 10^12 rows this is the path: bucket id is the shuffle key and each
  *    bucket's candidate set is small and independent;
  *  - IVF ANN: centroid cells instead of hyperplane signatures — identical
  *    plumbing with `nprobe` best-cell probing (ivfTopK);
  *  - banded LSH near-dup pairs (4×8 hyperplanes) for the dedup operator —
  *    similarity-preserving candidates, never all-pairs.
  */
object Similarity {

  /** Embeddings with double-cast arrays. */
  private def vecsFor(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("e"))

  private def vecs(spark: SparkSession, dir: String): DataFrame =
    vecsFor(Tables.embeddings(spark, dir))

  private def dot(a: Column, bCol: Column): Column =
    aggregate(zip_with(a, bCol, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  private def l2(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))

  /** Banded random-hyperplane signatures: `nBands` independent LSH tables of
    * `planesPerBand` sign bits each. A pair is a near-dup CANDIDATE iff it
    * collides in at least one band — banding is what makes the recall usable
    * (a single 8-bit table misses ~40% of even 0.95-cosine pairs; 4 bands of
    * 8 bits catch >97% of 0.99-cosine pairs while admitting ~1.5% of random
    * pairs). The (band, sig) key is the shuffle key — high cardinality, no
    * mega-buckets, never all-pairs. */
  def bandBucketsFor(emb: DataFrame, nBands: Int = 4, planesPerBand: Int = 8): DataFrame = {
    val spark = emb.sparkSession
    val ex = emb
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "xf")))
      .select(col("vec_id"), col("dim"), col("xf").cast("double").as("x"))
    val s = ex.join(broadcast(planes(spark, nBands * planesPerBand, 64)), "dim")
      .groupBy(col("vec_id"), col("plane")).agg(sum(col("x") * col("coef")).as("s"))
    s.select(col("vec_id"),
             (col("plane") / planesPerBand).cast("int").as("band"),
             pmod(col("plane"), lit(planesPerBand)).as("bit"),
             col("s"))
      .groupBy(col("vec_id"), col("band"))
      .agg(sum(when(col("s") >= 0, pow(lit(2), col("bit")).cast("long")).otherwise(0L)).as("sig"))
  }

  /** Near-dup candidate pairs: collide in ≥1 LSH band (similarity-preserving;
    * replaces the old vec_id%50 bucketing whose recall was ~1/50 by
    * construction). */
  def candidatePairsFor(emb: DataFrame, nBands: Int = 4, planesPerBand: Int = 8): DataFrame = {
    val b = bandBucketsFor(emb, nBands, planesPerBand)
    b.as("a").join(b.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("v1"), col("b.vec_id").as("v2"))
      .distinct()
  }

  /** Embedding-cosine near-dup pairs over LSH-band candidates (dedup operator). */
  def embeddingCosinePairs(spark: SparkSession, dir: String): DataFrame =
    embeddingCosinePairsFor(Tables.embeddings(spark, dir))

  def embeddingCosinePairsFor(emb: DataFrame): DataFrame = {
    val v = vecsFor(emb)
    candidatePairsFor(emb)
      .join(v.select(col("vec_id").as("v1"), col("e").as("e1")), "v1")
      .join(v.select(col("vec_id").as("v2"), col("e").as("e2")), "v2")
      .select(col("v1"), col("v2"),
        // + 0.0 folds IEEE -0.0 (a tiny negative cosine rounded to 4dp) to
        // 0.0 — engines disagree on the sign bit's string form otherwise
        (round(dot(col("e1"), col("e2")) / (l2(col("e1")) * l2(col("e2"))), 4) + lit(0.0)).as("cos"))
  }

  /** Brute-force cosine top-k: queries (vec_id < 5) broadcast vs all vectors. */
  def bruteForceTopK(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val v = vecs(spark, dir)
    val q = v.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("e").as("qe"))
    val scored = v.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(dot(col("qe"), col("e")) / (l2(col("qe")) * l2(col("e"))), 6).as("cos6"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos6").desc, col("vec_id").asc)
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select(col("q_id"), col("vec_id"), col("rnk"), round(col("cos6"), 4).as("cos"))
  }

  /** Deterministic ±1 hyperplane coefficients: coef(plane, dim) from md5. */
  private def planes(spark: SparkSession, nPlanes: Int, dims: Int): DataFrame =
    spark.range(nPlanes).toDF("plane").crossJoin(spark.range(dims).toDF("dim"))
      .select(col("plane").cast("int").as("plane"), col("dim").cast("int").as("dim"),
        when(md5(concat(col("plane").cast("string"), lit("_"), col("dim").cast("string")))
               .substr(1, 1) >= "8", lit(1.0)).otherwise(lit(-1.0)).as("coef"))

  /** LSH bucket signature per vector: 8 hyperplane sign bits → bucket id. */
  def lshBuckets(spark: SparkSession, dir: String): DataFrame =
    lshBucketsFor(Tables.embeddings(spark, dir))

  def lshBucketsFor(emb: DataFrame): DataFrame = {
    val spark = emb.sparkSession
    val ex = emb
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "xf")))
      .select(col("vec_id"), col("dim"), col("xf").cast("double").as("x"))
    val s = ex.join(broadcast(planes(spark, 8, 64)), "dim")
      .groupBy(col("vec_id"), col("plane")).agg(sum(col("x") * col("coef")).as("s"))
    s.groupBy(col("vec_id"))
      .agg(sum(when(col("s") >= 0, pow(lit(2), col("plane")).cast("long")).otherwise(0L)).as("bucket"))
  }

  /** ANN: top-k within the query's LSH bucket(s) (the scale path).
    *
    * `multiProbe = true` additionally probes every bucket at Hamming
    * distance 1 from the query's signature (flip each of the 8 sign bits) —
    * the standard multi-probe LSH recall repair: a near-neighbour lost to a
    * single boundary sign-flip is recovered at ≤9× candidate cost, with no
    * extra tables and no change to the shuffle key. Each data vector lives
    * in exactly one bucket, so the probe union yields no duplicate
    * candidates. */
  def lshTopK(spark: SparkSession, dir: String, k: Int = 5): DataFrame =
    lshTopKFor(Tables.embeddings(spark, dir), k, multiProbe = false)

  def lshMultiProbeTopK(spark: SparkSession, dir: String, k: Int = 5): DataFrame =
    lshTopKFor(Tables.embeddings(spark, dir), k, multiProbe = true)

  /** IVF (inverted-file) ANN — the centroid-bucket alternative to LSH with
    * identical plumbing: the cell id replaces the hyperplane signature as
    * the shuffle key. Centroids are TRAINED with deterministic seeded
    * k-means ([[kmeansCentroidsFor]]); every vector is assigned to its
    * max-cosine centroid; a query probes its `nprobe` best cells, then exact
    * cosine top-k within the probed cells.
    */
  /** Assign every vector to its max-cosine centroid (rounded affinity,
    * cell-asc tie-break — deterministic across engines/partitionings).
    * Implemented as max over a struct with the tie-break key (max aff,
    * ties toward the smaller cell ≡ row_number over (aff desc, cell asc))
    * — a two-phase aggregation with map-side combine over the nCells
    * rows/vector, instead of a Window that shuffles and sorts the whole
    * (vector × centroid) affinity stream (the Scoring.top1 discipline). */
  private def assignCells(v: DataFrame, cents: DataFrame): DataFrame =
    v.join(broadcast(cents), lit(true))
      .select(col("vec_id"), col("cell"),
        round(dot(col("e"), col("ce")) / (l2(col("e")) * l2(col("ce"))), 9).as("aff"))
      .groupBy(col("vec_id"))
      .agg(max(struct(col("aff"), (-col("cell")).as("nc"), col("cell").as("c"))).as("m"))
      .select(col("vec_id"), col("m.c").as("cell"))

  /** Deterministic seeded k-means, fixed Lloyd rounds, DataFrame-only: seeds
    * are the first `nCells` vectors; each round reassigns (max cosine) and
    * recomputes centroids as the element-wise member mean, ROUNDED to 6
    * decimals so the trained centroids are bit-reproducible across engines
    * and partition orders (float sums are order-dependent). Empty cells drop
    * out. `iters = 0` returns the raw seeds (the untrained baseline). At
    * scale each round is one broadcast-assign + one (cell, dim) aggregation —
    * no driver-side state; a 10^12-row deployment would train on a sample. */
  def kmeansCentroidsFor(emb: DataFrame, nCells: Int = 16, iters: Int = 2): DataFrame = {
    val v = vecsFor(emb)
    var cents = v.filter(col("vec_id") < nCells)
      .select(col("vec_id").as("cell"), col("e").as("ce"))
    for (_ <- 0 until iters) {
      val members = v.join(assignCells(v, cents), "vec_id")
        .select(col("cell"), posexplode(col("e")).as(Seq("dim", "x")))
      cents = members.groupBy(col("cell"), col("dim")).agg(avg(col("x")).as("m"))
        .groupBy(col("cell"))
        .agg(transform(array_sort(collect_list(struct(col("dim"), col("m")))),
                       s => round(s.getField("m"), 6)).as("ce"))
        // the trained table is nCells rows: materialize it so (a) round k's
        // assignment does not replay rounds 1..k-1 (each round's centroids
        // appeared nested inside the next round's plan) and (b) every
        // downstream consumer (assignment, probes, residuals, LUTs — the
        // centroids are referenced up to 6× in one IVF-PQ plan) reuses the
        // 16 computed rows instead of re-running the training tower.
        // Values are unchanged: the means are rounded to 6 dp precisely so
        // they are partition-order-independent.
        .localCheckpoint()
    }
    cents
  }

  def ivfCellsFor(emb: DataFrame, nCells: Int = 16, iters: Int = 2): DataFrame =
    assignCells(vecsFor(emb), kmeansCentroidsFor(emb, nCells, iters))

  def ivfTopK(spark: SparkSession, dir: String, k: Int = 5, nprobe: Int = 2): DataFrame =
    ivfTopKFor(Tables.embeddings(spark, dir), k, nprobe)

  def ivfTopKFor(emb: DataFrame, k: Int = 5, nprobe: Int = 2, nCells: Int = 16,
                 iters: Int = 2): DataFrame = {
    val cents = kmeansCentroidsFor(emb, nCells, iters)
    val v = vecsFor(emb).join(assignCells(vecsFor(emb), cents), "vec_id")
    val wProbe = Window.partitionBy(col("q_id")).orderBy(col("aff").desc, col("cell").asc)
    val probes = vecsFor(emb).filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("e").as("qe"))
      .join(broadcast(cents), lit(true))
      .select(col("q_id"), col("qe"), col("cell"),
        round(dot(col("qe"), col("ce")) / (l2(col("qe")) * l2(col("ce"))), 9).as("aff"))
      .withColumn("rn", row_number().over(wProbe)).filter(col("rn") <= nprobe)
      .select(col("q_id"), col("qe"), col("cell"))
    val cand = v.join(probes, Seq("cell")).filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(dot(col("qe"), col("e")) / (l2(col("qe")) * l2(col("e"))), 6).as("cos6"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos6").desc, col("vec_id").asc)
    cand.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select(col("q_id"), col("vec_id"), col("rnk"), round(col("cos6"), 4).as("cos"))
  }

  // --- Product quantization (PQ) ---------------------------------------
  //
  // The storage/search scale path for embeddings: a 64-dim float vector
  // (256 B) compresses to m=4 one-byte codes by quantizing each 16-dim
  // subvector against a per-block codebook — 64× smaller, so a 100 TB
  // embedding corpus's codes fit in a fraction of cluster RAM. Queries stay
  // full-precision; the asymmetric distance (ADC) is a per-query lookup
  // table (q × block × centroid, tiny, broadcast) summed over each vector's
  // codes — the scan never touches original vectors. Classic design
  // (Jégou, Douze, Schmid: "Product Quantization for Nearest Neighbor
  // Search", TPAMI 2011 — public knowledge).
  //
  // Codebooks train with the same deterministic seeded k-means discipline as
  // [[kmeansCentroidsFor]] (fixed Lloyd rounds, rounded means/distances,
  // cell-asc tie-breaks) so codes and ADC ranks are bit-reproducible across
  // engines and partitionings.

  /** Subvector explode: (vec_id, block, dim, x), block = dim / dsub. */
  private def subEx(emb: DataFrame, dsub: Int): DataFrame =
    emb.select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "xf")))
      .select(col("vec_id"), (col("dim") / dsub).cast("int").as("block"),
              col("dim").cast("int").as("dim"), col("xf").cast("double").as("x"))

  /** Squared L2 between every (vector, block) subvector and every centroid of
    * that block; rounded so the argmin is engine/partitioning-stable. */
  private def blockDists(ex: DataFrame, cents: DataFrame): DataFrame =
    ex.join(broadcast(cents), Seq("block", "dim"))
      .groupBy(col("vec_id"), col("block"), col("cell"))
      .agg(round(sum((col("x") - col("cx")) * (col("x") - col("cx"))), 9).as("d2"))

  /** Nearest centroid per (vector, block), smaller cell on ties.
    * min over struct(d2, cell) ≡ row_number over (d2 asc, cell asc) — same
    * aggregation-instead-of-Window rationale as [[assignCells]]. */
  private def argminCell(d2: DataFrame): DataFrame =
    d2.groupBy(col("vec_id"), col("block"))
      .agg(min(struct(col("d2"), col("cell"))).as("m"))
      .select(col("vec_id"), col("block"), col("m.cell").as("cell"))

  /** Per-block codebooks: seeds are the first `ksub` vectors' subvectors;
    * each Lloyd round reassigns (min rounded L2, cell-asc ties) and
    * recomputes centroids as rounded member means. Blocks train
    * independently but inside ONE DataFrame keyed by block — one job, not m.
    * At 10^12 rows training runs on a sample; encoding scans everything. */
  def pqCodebookFor(emb: DataFrame, dsub: Int = 16, ksub: Int = 8,
                    iters: Int = 1): DataFrame = {
    val ex = subEx(emb, dsub)
    var cents = ex.filter(col("vec_id") < ksub)
      .select(col("block"), col("vec_id").cast("int").as("cell"),
              col("dim"), col("x").as("cx"))
    for (_ <- 0 until iters) {
      val assign = argminCell(blockDists(ex, cents))
      cents = ex.join(assign, Seq("vec_id", "block"))
        .groupBy(col("block"), col("cell"), col("dim"))
        .agg(round(avg(col("x")), 6).as("cx"))
        // same materialization rationale as kmeansCentroidsFor: the codebook
        // is (m blocks × ksub × dsub) rows; checkpointing it stops the next
        // round / the encoder / the LUT from replaying the training tower.
        .localCheckpoint()
    }
    cents
  }

  /** Encode: m codes per vector (the compressed representation). */
  def pqCodesFor(emb: DataFrame, cents: DataFrame, dsub: Int = 16): DataFrame =
    argminCell(blockDists(subEx(emb, dsub), cents))
      .withColumnRenamed("cell", "code")

  def pqTopK(spark: SparkSession, dir: String, k: Int = 5): DataFrame =
    pqTopKFor(Tables.embeddings(spark, dir), k)

  /** ADC top-k: per-query LUT of (block, centroid) partial distances is
    * broadcast and summed over each vector's codes — the big side touches
    * only the 4-codes table, never original vectors. Smaller distance =
    * closer; ties break toward smaller vec_id. */
  def pqTopKFor(emb: DataFrame, k: Int = 5, dsub: Int = 16, ksub: Int = 8,
                iters: Int = 1): DataFrame = {
    val cents = pqCodebookFor(emb, dsub, ksub, iters)
    val codes = pqCodesFor(emb, cents, dsub)
    val lut = subEx(emb.filter(col("vec_id") < 5), dsub)
      .select(col("vec_id").as("q_id"), col("block"), col("dim"), col("x").as("qx"))
      .join(broadcast(cents), Seq("block", "dim"))
      .groupBy(col("q_id"), col("block"), col("cell"))
      .agg(round(sum((col("qx") - col("cx")) * (col("qx") - col("cx"))), 9).as("pd"))
      .withColumnRenamed("cell", "code")
    val adc = codes.join(broadcast(lut), Seq("block", "code"))
      .filter(col("vec_id") =!= col("q_id"))
      .groupBy(col("q_id"), col("vec_id"))
      .agg(round(sum(col("pd")), 6).as("adist"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("adist").asc, col("vec_id").asc)
    adc.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select(col("q_id"), col("vec_id"), col("rnk"), col("adist"))
  }

  // --- IVF-PQ composition (IVFADC) --------------------------------------
  //
  // The production billion-scale layout: trained coarse cells (IVF) with
  // product-quantized RESIDUALS (vector − its cell centroid) — residuals
  // cluster much tighter than raw vectors, so the same tiny codebooks
  // quantize them far more accurately, and the stored index is (cell, 4
  // one-byte codes) per vector: the search scan touches codes ONLY, never
  // raw embeddings (plan-asserted over a stored codes table in PlanSpec).
  // Same classic design as PQ (Jégou, Douze, Schmid, TPAMI 2011 — IVFADC);
  // one shared residual codebook across cells, per the paper. Deterministic
  // seeded k-means discipline throughout (fixed Lloyd rounds, rounded
  // means/distances, cell-asc tie-breaks) — bit-reproducible across engines.

  /** ADC search over a (stored) IVF-PQ codes table (vec_id, cell, block,
    * code) and a per-(query, probed-cell) LUT (q_id, cell, block, code, pd):
    * candidates are restricted to the probed cells by the `cell` equi-join,
    * the distance is the LUT sum over each candidate's codes, and the big
    * (codes) side is never anything but codes. */
  def ivfpqAdc(codes: DataFrame, lut: DataFrame, k: Int): DataFrame = {
    val adc = codes.join(broadcast(lut), Seq("cell", "block", "code"))
      .filter(col("vec_id") =!= col("q_id"))
      .groupBy(col("q_id"), col("vec_id"))
      .agg(round(sum(col("pd")), 6).as("adist"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("adist").asc, col("vec_id").asc)
    adc.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select(col("q_id"), col("vec_id"), col("rnk"), col("adist"))
  }

  /** Residual vectors (vec − its assigned cell centroid), shaped like an
    * embeddings table (so the PQ trainer/encoder consume it unchanged) with
    * the coarse cell carried alongside. */
  private def residualsFor(emb: DataFrame, cents: DataFrame,
                           cells: DataFrame): DataFrame =
    vecsFor(emb).join(cells, "vec_id").join(broadcast(cents), "cell")
      .select(col("vec_id"), col("cell"),
              zip_with(col("e"), col("ce"), (a, b) => a - b).as("embedding"))

  def ivfpqTopK(spark: SparkSession, dir: String, k: Int = 5): DataFrame =
    ivfpqTopKFor(Tables.embeddings(spark, dir), k)

  def ivfpqTopKFor(emb: DataFrame, k: Int = 5, nprobe: Int = 2, nCells: Int = 16,
                   iters: Int = 2, dsub: Int = 16, ksub: Int = 8,
                   pqIters: Int = 1): DataFrame = {
    val (codes, lut) = ivfpqIndexAndLut(emb, nprobe, nCells, iters, dsub, ksub, pqIters)
    ivfpqAdc(codes, lut, k)
  }

  /** Build the IVF-PQ index (codes per vector) and the queries' ADC LUT.
    * Exposed for the stored-codes plan test: `codes` round-trips through
    * parquet there, `lut` is rebuilt from the (tiny) query set. */
  def ivfpqIndexAndLut(emb: DataFrame, nprobe: Int = 2, nCells: Int = 16,
                       iters: Int = 2, dsub: Int = 16, ksub: Int = 8,
                       pqIters: Int = 1): (DataFrame, DataFrame) = {
    val cents = kmeansCentroidsFor(emb, nCells, iters)
    // cells (one row per vector) and the residual table are each consumed by
    // several subtrees (encoder training, encoding, the codes join) — without
    // materialization the coarse assignment's window shuffle re-runs once per
    // consumer inside one plan (measured: the IVF-PQ query replanned the
    // whole training tower ~4×).
    val cells = assignCells(vecsFor(emb), cents).localCheckpoint()
    val resid = residualsFor(emb, cents, cells).localCheckpoint()
    val cb = pqCodebookFor(resid, dsub, ksub, pqIters)
    val codes = pqCodesFor(resid, cb, dsub).join(cells, "vec_id")

    // probes: the query's nprobe best cells, same affinity ranking as IVF
    val wProbe = Window.partitionBy(col("q_id")).orderBy(col("aff").desc, col("cell").asc)
    val probes = vecsFor(emb).filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("e").as("qe"))
      .join(broadcast(cents), lit(true))
      .select(col("q_id"), col("qe"), col("cell"),
        round(dot(col("qe"), col("ce")) / (l2(col("qe")) * l2(col("ce"))), 9).as("aff"))
      .withColumn("rn", row_number().over(wProbe)).filter(col("rn") <= nprobe)
      .select(col("q_id"), col("qe"), col("cell"))
    // per-(query, probed cell) LUT over the query's RESIDUAL in that cell
    val qres = probes.join(broadcast(cents), "cell")
      .select(col("q_id"), col("cell"),
        posexplode(zip_with(col("qe"), col("ce"), (a, b) => a - b)).as(Seq("dim", "x")))
      .select(col("q_id"), col("cell"), (col("dim") / dsub).cast("int").as("block"),
              col("dim").cast("int").as("dim"), col("x"))
    val cbR = cb.select(col("block"), col("dim"), col("cell").as("code"), col("cx"))
    val lut = qres.join(broadcast(cbR), Seq("block", "dim"))
      .groupBy(col("q_id"), col("cell"), col("block"), col("code"))
      .agg(round(sum((col("x") - col("cx")) * (col("x") - col("cx"))), 9).as("pd"))
    (codes, lut)
  }

  def lshTopKFor(emb: DataFrame, k: Int = 5, multiProbe: Boolean = false): DataFrame = {
    val v = vecsFor(emb).join(lshBucketsFor(emb), "vec_id")
    val q0 = v.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("e").as("qe"), col("bucket"))
    val q =
      if (!multiProbe) q0
      else q0.select(col("q_id"), col("qe"),
        explode(concat(
          array(col("bucket")),
          transform(sequence(lit(0), lit(7)),
                    b => col("bucket").bitwiseXOR(pow(lit(2), b).cast("long"))))).as("bucket"))
    val cand = v.join(q, Seq("bucket")).filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(dot(col("qe"), col("e")) / (l2(col("qe")) * l2(col("e"))), 6).as("cos6"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos6").desc, col("vec_id").asc)
    cand.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select(col("q_id"), col("vec_id"), col("rnk"), round(col("cos6"), 4).as("cos"))
  }
}

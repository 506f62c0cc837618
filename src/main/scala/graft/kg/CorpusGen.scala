package graft.kg

import org.apache.spark.sql.{Dataset, SparkSession}
import java.security.MessageDigest

/** Deterministic synthetic corpus + KB generator (FIXTURES.md §A; seed fixed).
  *
  * No external data: everything derives from a fixed word pool and per-row
  * seeded PRNGs, so the same (nFiles) always yields byte-identical tables
  * regardless of partitioning. Files are generated distributed
  * (spark.range → typed map) so the generator itself scales to bench sizes;
  * each row is a pure function of its id.
  *
  * Corpus design (what makes the P/R gate meaningful):
  *  - each file plants mentions of 3–8 KB entities in three kinds: an import
  *    line, a doc-comment reference, identifier uses (camel/snake surface);
  *  - ~10% of KB labels are shared by 2–3 entities (forces disambiguation);
  *    the file also plants context terms of the *intended* entity on adjacent
  *    lines, so TF-IDF/cosine over the ±k-line window can resolve them;
  *  - within a repo the same label always refers to the same entity, so
  *    majority-vote canonicalization per (repo, kind, norm) cluster helps;
  *  - hot tokens (get/main/test) appear at ~100× frequency to exercise the
  *    salted skew join; noise words are disjoint from KB labels (they become
  *    NIL mentions and must be dropped).
  */
object CorpusGen {
  val Seed = 42L

  val Words: Array[String] = Array(
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "theta", "iota",
    "kappa", "lambda", "sigma", "tau", "omega", "vector", "matrix", "tensor",
    "stream", "batch", "shard", "bucket", "cursor", "ledger", "branch",
    "kernel", "module", "socket", "buffer", "router", "parser", "lexer",
    "planner", "runner", "worker", "broker", "beacon", "anchor", "signal",
    "cache", "index", "column", "record", "schema", "codec", "digest",
    "quorum", "replica", "segment", "offset", "window", "trigger")

  val NoiseWords: Array[String] = Array(
    "foo", "bar", "baz", "qux", "tmp", "aux", "misc", "stuff", "thing",
    "blob", "junk", "pad", "filler", "scratch", "dummy")

  val HotTokens: Array[String] = Array("get", "main", "test")
  val Langs: Array[String] = Array("scala", "java", "python", "js")

  val NumEntities = 500
  /** Fraction of label slots shared by 2–3 entities. */
  private val SharedEvery = 10

  // --- KB ---------------------------------------------------------------
  private def rng(parts: Long*): java.util.Random =
    new java.util.Random(parts.foldLeft(Seed)((a, b) => a * 1099511628211L + b))

  /** Label words for entity slot s (several entities may share a slot).
    * Injective over slots 0..449: pairs (i, (i+k+1) mod 50) for k = slot/50,
    * so two different slots never collide on the same label. */
  private def slotWords(slot: Int): (String, String) = {
    val i = slot % Words.length
    val k = slot / Words.length
    (Words(i), Words((i + k + 1) % Words.length))
  }

  /** Entity id → label slot. Every SharedEvery-th slot carries 2–3 entities. */
  def entitySlot(id: Long): Int = {
    // ids 1..NumEntities; map groups of consecutive ids onto shared slots
    val grp = ((id - 1) / SharedEvery).toInt
    val off = ((id - 1) % SharedEvery).toInt
    if (off >= SharedEvery - 2) grp * (SharedEvery - 1) + (SharedEvery - 2) // last 2 ids share a slot
    else grp * (SharedEvery - 1) + off
  }

  def camel(w1: String, w2: String): String = w1.capitalize + w2.capitalize
  def snake(w1: String, w2: String): String = s"${w1}_$w2"

  def kbEntry(id: Long): KbEntry = {
    val (w1, w2) = slotWords(entitySlot(id))
    val r = rng(2L, id)
    val aliases = Seq(snake(w1, w2)) ++
      (if (r.nextInt(3) > 0) Seq(w1 + w2) else Seq.empty)
    KbEntry(id, camel(w1, w2), aliases.toArray, 1.0 / (1 + (id % 53).toDouble))
  }

  /** Context terms: a deterministic slice of the word pool, distinct per
    * entity — entities sharing a label get near-disjoint slices. */
  def contextTerms(id: Long): Seq[String] = {
    val r = rng(3L, id)
    val n = 5 + r.nextInt(12)
    val start = r.nextInt(Words.length)
    val step = 1 + r.nextInt(7)
    (0 until n).map(k => Words((start + k * step) % Words.length)).distinct
  }

  def kbContext(id: Long): Seq[KbContext] = {
    val terms = contextTerms(id)
    val w = 1.0 / math.sqrt(terms.size.toDouble) // pre-normalized
    terms.map(t => KbContext(id, t, w))
  }

  // --- files ------------------------------------------------------------
  def sha256Hex(s: String): String = {
    val d = MessageDigest.getInstance("SHA-256").digest(s.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
  }

  /** Stable entity choice for (repo, slot): all files of a repo agree. */
  private def repoEntityForSlot(repoIdx: Int, slot: Int, candidates: Seq[Long]): Long = {
    val r = rng(4L, repoIdx.toLong, slot.toLong)
    candidates(r.nextInt(candidates.size))
  }

  /** All entity ids mapping to a slot (1..3 of them). */
  def slotEntities(slot: Int): Seq[Long] =
    (1L to NumEntities).filter(id => entitySlot(id) == slot)

  private lazy val slotIndex: Map[Int, Seq[Long]] =
    (1L to NumEntities).groupBy(id => entitySlot(id)).map { case (s, ids) => (s, ids.sorted.toSeq) }

  def genFile(fileId: Long): (SourceFile, Seq[Gold]) = {
    val r = rng(5L, fileId)
    val repoIdx = {
      // zipf-ish repo popularity over 20 repos
      val z = r.nextDouble()
      math.min((z * z * 20).toInt, 19)
    }
    val repo = s"org${repoIdx % 5}/repo$repoIdx"
    val lang = Langs(r.nextInt(Langs.length))
    val ext = lang match {
      case "scala" => "scala"; case "java" => "java"
      case "python" => "py";   case "js" => "js"
    }
    val path = s"src/d${fileId % 97}/F$fileId.$ext"
    val commit = sha256Hex(s"$repo/$path").substring(0, 40)

    val nEntities = 3 + r.nextInt(6)
    val slots = slotIndex.keys.toSeq.sorted
    val chosen: Seq[(Long, String, String)] = (0 until nEntities).map { _ =>
      // zipf-ish slot popularity: a few labels become join hot keys (J2 salting)
      val z = math.pow(r.nextDouble(), 2.5)
      val slot = slots(math.min((z * slots.size).toInt, slots.size - 1))
      val eid = repoEntityForSlot(repoIdx, slot, slotIndex(slot))
      val (w1, w2) = slotWords(slot)
      (eid, w1, w2)
    }.distinct

    val lines = scala.collection.mutable.ArrayBuffer[String]()
    val gold = scala.collection.mutable.ArrayBuffer[Gold]()

    def commentLine(body: String): String = lang match {
      case "python" => s"# $body"
      case "js"     => s"// $body"
      case _        => s"// $body"
    }
    def importLine(target: String): String = lang match {
      case "scala"  => s"import kb.$target"
      case "java"   => s"import kb.$target;"
      case "python" => s"from kb import $target"
      case "js"     => s"const $target = require('kb/$target')"
    }

    // 1. doc comment mentioning the first 1-2 entities
    chosen.take(1 + r.nextInt(2)).foreach { case (eid, w1, w2) =>
      val label = camel(w1, w2)
      val ctx = contextTerms(eid)
      val ctxSample = (0 until 3).map(k => ctx(rng(6L, fileId, eid, k.toLong).nextInt(ctx.size)))
      gold += Gold(repo, path, commit, lines.size, "doccomment", label, eid)
      lines += commentLine(s"provides $label support with ${ctxSample.mkString(" ")}")
    }
    // 2. import lines
    chosen.take(2 + r.nextInt(3)).foreach { case (eid, w1, w2) =>
      val label = camel(w1, w2)
      gold += Gold(repo, path, commit, lines.size, "import", label, eid)
      lines += importLine(label)
    }
    // 3. code body: ident mentions surrounded by the entity's context terms
    chosen.foreach { case (eid, w1, w2) =>
      val rr = rng(7L, fileId, eid)
      val ctx = contextTerms(eid)
      val nUses = 1 + rr.nextInt(3)
      (0 until nUses).foreach { u =>
        val surface = if (rr.nextBoolean()) camel(w1, w2) else snake(w1, w2)
        val ctxA = ctx(rr.nextInt(ctx.size)); val ctxB = ctx(rr.nextInt(ctx.size))
        val noise = NoiseWords(rr.nextInt(NoiseWords.length))
        val hot = if (rr.nextInt(10) < 8) s" ${HotTokens(rr.nextInt(3))}" else ""
        lines += s"val $ctxA = $ctxB $noise$hot"
        gold += Gold(repo, path, commit, lines.size, "ident", surface, eid)
        lines += s"def use$u($surface) = $ctxA$hot"
      }
    }
    // 4. trailing noise lines
    (0 until r.nextInt(4)).foreach { _ =>
      lines += s"var ${NoiseWords(r.nextInt(NoiseWords.length))} = ${r.nextInt(100)}"
    }

    (SourceFile(repo, path, commit, lang, lines.mkString("\n")), gold.toSeq)
  }

  // --- Spark-facing generators -------------------------------------------
  def srcFiles(spark: SparkSession, nFiles: Int): Dataset[SourceFile] = {
    import spark.implicits._
    spark.range(nFiles).map(id => genFile(id)._1)
  }

  def gold(spark: SparkSession, nFiles: Int): Dataset[Gold] = {
    import spark.implicits._
    spark.range(nFiles).flatMap(id => genFile(id)._2)
  }

  def fileShas(spark: SparkSession, nFiles: Int): Dataset[FileSha] = {
    import spark.implicits._
    spark.range(nFiles).map { id =>
      val f = genFile(id)._1
      FileSha(f.repo, f.path, f.commit, sha256Hex(f.content))
    }
  }

  // --- V2 corpus: deterministic mutation of srcFiles(n) for delta-ingest
  // tests/runs — the three change kinds a production incremental batch sees:
  // every 101st file DELETED, every (id%17==3) file MODIFIED (one appended
  // mention-free comment line: content/sha change, ±k contexts shift, gold
  // unchanged), and 5% NEW files appended after the original id range.
  private def v2Keep(id: Long, nFiles: Int): Boolean =
    !(id < nFiles && id % 101 == 0)

  private def v2Mutate(f: SourceFile, id: Long): SourceFile =
    if (id % 17 == 3) f.copy(content = f.content + "\n// housekeeping sweep")
    else f

  def srcFilesV2(spark: SparkSession, nFiles: Int): Dataset[SourceFile] = {
    import spark.implicits._
    spark.range(nFiles + nFiles / 20)
      .filter(id => v2Keep(id, nFiles))
      .map(id => v2Mutate(genFile(id)._1, id))
  }

  def goldV2(spark: SparkSession, nFiles: Int): Dataset[Gold] = {
    import spark.implicits._
    spark.range(nFiles + nFiles / 20)
      .filter(id => v2Keep(id, nFiles))
      .flatMap(id => genFile(id)._2)
  }

  def fileShasV2(spark: SparkSession, nFiles: Int): Dataset[FileSha] = {
    import spark.implicits._
    spark.range(nFiles + nFiles / 20)
      .filter(id => v2Keep(id, nFiles))
      .map { id =>
        val f = v2Mutate(genFile(id)._1, id)
        FileSha(f.repo, f.path, f.commit, sha256Hex(f.content))
      }
  }

  def kbEntries(spark: SparkSession): Dataset[KbEntry] = {
    import spark.implicits._
    spark.range(1, NumEntities + 1).map(id => kbEntry(id))
  }

  def kbContexts(spark: SparkSession): Dataset[KbContext] = {
    import spark.implicits._
    spark.range(1, NumEntities + 1).flatMap(id => kbContext(id))
  }
}

package graft.operators

import graft.operators.TextAnalysis.{fingerprint, FingerprintMod}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data curation — beyond-reference
  * capability (the reference dedups nothing; its only uniqueness notion is
  * the id-collision check, /root/reference/minivectordb/vector_database.py:59-60).
  *
  * Four tiers, by cost and fuzziness, each designed around its shuffle:
  *
  *  - EXACT: hash-groupBy on a 128-bit content key. One shuffle on the key;
  *    map-side partial aggregation; no text comparison ever crosses the wire.
  *  - N-GRAM JACCARD (exact near-dup): explode shingles → equi-join on the
  *    shingle → count co-occurrences. The join key is the shingle, so only
  *    docs SHARING a shingle ever meet — no O(n²) cross product. Skewed hot
  *    shingles can be dropped with `maxDf` (standard df-cap approximation).
  *  - MINHASH + LSH (approximate near-dup at scale): 32 minhashes → 8 bands
  *    × 4 rows → equi-join on (band, band-signature) → exact-Jaccard verify
  *    of the surviving candidates only. Candidate volume is governed by the
  *    banding curve 1-(1-J^4)^8, so the verify join touches ~0 non-dup pairs;
  *    this is the shape that survives 100 TB (the exact variant's shingle
  *    join grows with shared-shingle frequency, the LSH join doesn't).
  *  - SIMHASH (near-dup by Hamming distance): 60-bit signed-projection
  *    fingerprint per doc; pairs blocked on 4 × 15-bit bands (pigeonhole:
  *    any pair within Hamming ≤ 3 shares at least one exact band).
  *
  * All signature math is integer Column algebra on deterministic polynomial
  * fingerprints — codegen'd, oracle-reproducible, no UDFs.
  */
object Dedup {

  // ---------------------------------------------------------------- shingles

  /** Distinct word n-gram shingles of a text column (n ≥ 1). */
  def shingles(text: Column, n: Int): Column = {
    val toks = split(text, "\\s+")
    if (n == 1) array_distinct(toks)
    else
      // guard: sequence(0, negative) would generate a DESCENDING range
      when(size(toks) >= n,
        array_distinct(
          transform(
            sequence(lit(0), size(toks) - n),
            i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
        .otherwise(typedLit(Seq.empty[String]))
  }

  // ------------------------------------------------------------- exact dedup

  /** Exact dedup: group identical content, keep the lowest-id row per group.
    * Returns (id, content_key, group_size, keep) for every row — callers
    * `filter($"keep")` to retain one representative per distinct content.
    */
  def exactDedup(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val w = Window.partitionBy(col("content_key")).orderBy(col("id"))
    val wAll = Window.partitionBy(col("content_key"))
    docs
      .select(id.as("id"), md5(text).as("content_key"))
      .withColumn("group_size", count(lit(1)).over(wAll))
      .withColumn("keep", row_number().over(w) === 1)
  }

  // --------------------------------------------------- exact n-gram Jaccard

  /** All pairs (idA < idB) whose n-gram-shingle Jaccard ≥ tau, computed with
    * the explode→equi-join→count pattern. `maxDf` (optional) drops shingles
    * appearing in more than that many docs before the join — the standard
    * hot-key (stop-shingle) cap for skewed corpora; None = exact.
    */
  def jaccardPairs(
      docs: DataFrame,
      id: Column,
      text: Column,
      n: Int = 2,
      tau: Double = 0.5,
      maxDf: Option[Int] = None): DataFrame = {
    val sh = docs.select(id.as("id"), shingles(text, n).as("sh"))
      .withColumn("sz", size(col("sh")))
    val exploded = sh.select(col("id"), col("sz"), explode(col("sh")).as("s"))
    val pruned = maxDf match {
      case Some(cap) =>
        val dfCounts = exploded.groupBy("s").agg(count(lit(1)).as("df")).filter(col("df") <= cap)
        exploded.join(dfCounts.select("s"), Seq("s"), "left_semi")
      case None => exploded
    }
    val a = pruned.select(col("id").as("id_a"), col("sz").as("sz_a"), col("s"))
    val b = pruned.select(col("id").as("id_b"), col("sz").as("sz_b"), col("s"))
    a.join(b, Seq("s"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b", "sz_a", "sz_b")
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard", col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jaccard") >= tau)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  // ---------------------------------------------------------- MinHash + LSH

  val HashP: Long = FingerprintMod // 1e9+7; coefficients and values < P, products fit a Long

  /** Deterministic (a, b) coefficient pairs for the universal hash family
    * h_i(x) = (a_i·x + b_i) mod P, derived from a splitmix-style generator.
    */
  def hashCoeffs(num: Int, seed: Long = 0x5eed5eedL): Seq[(Long, Long)] = {
    var x = seed
    def next(): Long = {
      x += 0x9e3779b97f4a7c15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    Seq.fill(num)((math.floorMod(next(), HashP - 1) + 1, math.floorMod(next(), HashP)))
  }

  /** Shingle array → integer fingerprint array (compute once per doc; the
    * signature then runs pure modular arithmetic over these ints).
    */
  def shingleFps(shinglesCol: Column): Column = transform(shinglesCol, s => fingerprint(s))

  /** MinHash signature (array of `num` minima) over a PRE-FINGERPRINTED
    * shingle array column (see [[shingleFps]] — materialize it first so the
    * per-hash expressions reference the computed attribute, not `num`
    * copies of the string-fold).
    */
  def minhashSig(fpsCol: Column, num: Int = 32): Column =
    array(hashCoeffs(num).map { case (a, b) =>
      array_min(transform(fpsCol, x => (lit(a) * x + lit(b)) % lit(HashP)))
    }: _*)

  /** Approximate near-dup pairs via banded MinHash-LSH with exact-Jaccard
    * verification: candidates are pairs agreeing on at least one band of
    * `rows` consecutive signature slots; each candidate is then verified
    * with the true shingle-set Jaccard ≥ tau (so the OUTPUT is exact up to
    * LSH recall; the banding only bounds which pairs get verified).
    */
  def minhashLshPairs(
      docs: DataFrame,
      id: Column,
      text: Column,
      n: Int = 2,
      tau: Double = 0.5,
      numHashes: Int = 32,
      bands: Int = 8): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rows = numHashes / bands
    val sh = docs.select(id.as("id"), shingles(text, n).as("sh"))
      .withColumn("fps", shingleFps(col("sh")))
      .withColumn("sig", minhashSig(col("fps"), numHashes))
      .drop("fps")
    // band signature = the `rows`-slot slice; joined as (band index, slice)
    val banded = sh.select(
      col("id"),
      posexplode(array((0 until bands).map(b =>
        slice(col("sig"), b * rows + 1, rows)): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bsig")
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bsig") === col("y.bsig") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
    // exact verification of candidates only
    val sets = sh.select(col("id"), col("sh"), size(col("sh")).as("sz"))
    cand
      .join(sets.select(col("id").as("id_a"), col("sh").as("sh_a"), col("sz").as("sz_a")), Seq("id_a"))
      .join(sets.select(col("id").as("id_b"), col("sh").as("sh_b"), col("sz").as("sz_b")), Seq("id_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard", col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jaccard") >= tau)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  // ---------------------------------------------------------------- SimHash

  val SimHashBits = 60
  private val SecondaryMod = 998244353L // second 30-bit polynomial modulus
  private val secondaryBase = 37L

  /** 60-bit token hash: two independent 30-bit polynomial fingerprints
    * packed as hi·2^30 + lo — integer Column algebra, oracle-reproducible.
    */
  def tokenHash60(tok: Column): Column = {
    val lo = fingerprint(tok)
    val hi = aggregate(
      filter(split(tok, ""), ch => ch =!= ""),
      lit(0L),
      (acc, ch) => (acc * lit(secondaryBase) + ascii(ch)) % lit(SecondaryMod))
    hi * lit(1L << 30) + lo
  }

  /** SimHash of a text column: sum the ±1 projection of every token's hash
    * bits, take signs. Tokens carry term-frequency weight (multiplicity).
    *
    * Shape: tokens → hash60 per token (one string fold each) → per-token
    * ±1 bit array (60 constant shifts of the already-computed hash value) →
    * element-wise counter sum → sign/power collapse. Every intermediate is
    * referenced exactly once, so nothing re-folds.
    */
  def simhash(text: Column): Column = {
    val toks = filter(split(text, "\\s+"), t => t =!= "")
    val tokHashes = transform(toks, t => tokenHash60(t))
    val tokBits = transform(tokHashes, h =>
      array((0 until SimHashBits).map(j =>
        shiftright(h, j).bitwiseAND(lit(1L)) * 2 - 1): _*))
    val counters = aggregate(
      tokBits,
      array_repeat(lit(0L), SimHashBits),
      (acc, bits) => zip_with(acc, bits, (c, b) => c + b))
    val powers = typedLit((0 until SimHashBits).map(1L << _))
    aggregate(zip_with(counters, powers, (c, p) => when(c > 0, p).otherwise(lit(0L))), lit(0L),
      (acc, x) => acc + x)
  }

  /** Hamming distance between two simhash columns. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Near-dup pairs with Hamming(simhash) ≤ maxHamming, blocked on 4
    * 15-bit bands (pigeonhole-complete for maxHamming ≤ 3; above that the
    * blocking is a recall/cost trade, as in production simhash dedup).
    */
  def simhashPairs(docs: DataFrame, id: Column, text: Column, maxHamming: Int = 3): DataFrame = {
    val sh = docs.select(id.as("id"), simhash(text).as("sim"))
    val banded = sh.select(col("id"), col("sim"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("sim"), b * 15).bitwiseAND(lit(0x7fffL))): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bval")
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bval") === col("y.bval") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        col("x.sim").as("sim_a"), col("y.sim").as("sim_b"))
      .distinct()
      .withColumn("hamming", hamming(col("sim_a"), col("sim_b")))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  // ------------------------------------------------- embedding-cosine pairs

  /** Near-dup pairs by embedding cosine ≥ tau. At this shape the plan is a
    * broadcast nested-loop self-join (no equi key) — correct and fine for
    * corpus sizes where one side broadcasts; the 100 TB path is to block
    * first (sign-LSH buckets, see AnnSearch) and run this verify inside
    * buckets only.
    */
  def cosinePairs(embs: DataFrame, id: Column, vec: Column, tau: Double): DataFrame = {
    import graft.functions.{VectorFunctions => VF}
    val t = embs.select(id.as("id"), vec.as("v"))
    t.as("a").join(t.as("b"), col("a.id") < col("b.id"))
      .withColumn("cosine", VF.cosine(col("a.v"), col("b.v")))
      .filter(col("cosine") >= tau)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("cosine"))
  }
}

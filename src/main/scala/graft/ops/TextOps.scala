package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data text pipeline over the `documents` table: dedup family
  * (exact-normalized, n-gram Jaccard, MinHash-LSH, SimHash), language-ID
  * heuristic, quality scoring, token stats, fingerprinting.
  *
  * Every operator carries a DuckDB oracle (integer/rounded outputs only —
  * no raw double comparisons). The hash-based sketches (MinHash, SimHash,
  * fingerprints) run on [[graft.functions.PortableHash]] — a 31-bit modular
  * hash family both engines compute exactly — instead of xxhash64, which
  * DuckDB lacks and which demoted them to rows-only checks in round 1.
  */
object TextOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  private val toks: Column = split(col("text"), " ")

  /** Exact dedup on a normalized key (first-5-token prefix): keeper = min id.
    * The hash-groupBy exact-dedup shape — one shuffle on the key.
    */
  def q20DedupExact(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), array_join(slice(split(col("text"), " "), 1, 5), " ").as("p"))
      .groupBy(col("p"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .select(col("keeper"), col("n"))
      .orderBy(col("keeper"))

  /** Max document frequency of a shingle before it is treated as a
    * stop-phrase and excluded (numerator AND denominator, both engines).
    * A shingle shared by ~everything makes the self-join quadratic — the
    * classic hot-key blowup; a stop-phrase also carries no dedup signal.
    * 64 is > every df in the test corpora (semantics unchanged at test SF);
    * the guard is for the 10^9-doc corpus where "click here to" has df 10^7.
    */
  private val HotShingleDf = 64

  /** n-gram Jaccard near-dup pairs over distinct shingle HASHES: equi-join on
    * an 8-byte key (no shingle strings in the shuffle), hot-shingle df-cap
    * before the join (no quadratic hot keys), exact J = |∩|/|∪| as x1000.
    * The oracle computes the identical hash, so parity is by construction.
    */
  def q21NgramJaccard(s: SparkSession, dir: String): DataFrame = {
    val arr = shingleArr(docs(s, dir)).cache()
    // hot set is tiny by construction (few stop-phrases; the same bound the
    // old broadcast anti-join relied on) — fold it to ONE array row so the
    // df-cap becomes a per-row array_except map over the cached arrays
    // instead of an anti-join over every exploded (doc, shh) row
    val hot = arr.select(explode(col("sharr")).as("shh"))
      .groupBy(col("shh")).agg(count(lit(1)).as("df"))
      .filter(col("df") > HotShingleDf)
    val hotArr = hot.agg(collect_set(col("shh")).as("hotset"))
    // kept rows CARRY the per-doc kept-set size, so no separate size
    // aggregate and no two size joins after the pair count: the sizes ride
    // the (already necessary) shingle equi-join and fold into its groupBy
    // keys (functionally dependent on doc ids — zero extra groups)
    val kept = arr.crossJoin(broadcast(hotArr))
      .select(col("doc_id"), array_except(col("sharr"), col("hotset")).as("ka"))
      .filter(size(col("ka")) > 0)
      .select(col("doc_id"), size(col("ka")).cast("long").as("sz"),
        explode(col("ka")).as("shh"))
    kept.as("a").join(kept.as("b"),
        col("a.shh") === col("b.shh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.sz").as("sza"), col("b.sz").as("szb"))
      .agg(count(lit(1)).as("common"))
      .withColumn("jac_x1000",
        round(lit(1000.0) * col("common") / (col("sza") + col("szb") - col("common"))).cast("long"))
      .filter(col("jac_x1000") >= 200)
      .select(col("doc_a"), col("doc_b"), col("jac_x1000"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  import graft.functions.PortableHash.{M => HM}
  import graft.functions.{PortableHash => PH}

  /** Per-doc distinct shingle-hash ARRAYS — one native codegen'd pass per
    * document ([[graft.functions.TextHash.shingles]]): tokenize, char-hash
    * each token once, roll 3-gram hashes ([[PH.shingle3]] semantics), dedup
    * locally. No shingle strings are ever materialized, and — unlike the
    * old explode + global `.distinct()` — no shuffle of sketch rows: the
    * sketch rides the ingest scan. `wide = true` widens a narrow scan
    * first ([[Scans.spread]]; single-row-group test files plan 1 task) —
    * set it where the downstream sketch is the 128-permutation MinHash
    * kernel, whose per-row cost justifies the exchange (A/B-measured:
    * q22 0.86 vs 1.09 s warm); the plain shingle pass is cheaper than the
    * exchange, so array-only consumers (q27/q37/q55) stay narrow. At
    * production row-group counts the guard no-ops either way.
    */
  private def shingleArr(d: DataFrame, wide: Boolean = false): DataFrame = {
    val in = d.select(col("doc_id"), col("text"))
    (if (wide) Scans.spread(in, col("doc_id")) else in)
      .select(col("doc_id"),
        graft.functions.TextHashExprs.text_shingles(col("text")).as("sharr"))
      .filter(size(col("sharr")) > 0)
  }

  /** Distinct 31-bit shingle hashes per doc as (doc_id, shh) rows — the
    * exploded view of [[shingleArr]] for the set-intersection joins.
    */
  private def shingleHashes(d: DataFrame): DataFrame =
    shingleArr(d).select(col("doc_id"), explode(col("sharr")).as("shh"))

  /** DuckDB twin of [[shingleHashes]] as a CTE body (named `shh`). */
  private def shingleHashesSql: String =
    s"""th AS (
          SELECT doc_id,
            list_transform([t for t in string_split(text,' ') if t <> ''],
                           t -> ${PH.polySql("t")}) AS th
          FROM documents),
        shh AS (
          SELECT DISTINCT doc_id,
            ${PH.shingle3Sql("th[i]", "th[i+1]", "th[i+2]")} AS shh
          FROM th CROSS JOIN generate_series(1, 8192) AS g(i)
          WHERE len(th) >= 3 AND i + 2 <= len(th))"""

  private val MinhashPerms = 128
  private val MinhashRowsPerBand = 4
  private val MinhashBands = MinhashPerms / MinhashRowsPerBand // 32

  /** MinHash + LSH banding — the text-dedup scale path. 128 permutations
    * (affine mixes of the portable shingle hash, [[PH.mix]]), 32 bands × 4
    * rows ⇒ candidate threshold (1/32)^(1/4) ≈ 0.42 Jaccard. Candidate
    * generation is an equi-join on the band signature — shuffle-joinable at
    * any scale, no all-pairs scan. Output: candidate pairs + colliding-band
    * count. Fully DuckDB-oracled (round 1 was rows-only via xxhash64).
    */
  def q22MinhashLsh(s: SparkSession, dir: String): DataFrame =
    minhashCandidates(shingleArr(docs(s, dir), wide = true))
      .orderBy(col("doc_a"), col("doc_b"))

  /** LSH candidate pairs (≥1 colliding band) over a (doc_id, sharr) frame.
    * The 128-min signature is ONE native pass per doc
    * ([[graft.functions.TextHash.minhash]]) — the old plan exploded every
    * (doc, shingle) row and shuffled them through a 128-aggregate-column
    * groupBy just to fold per-doc mins; now only the 128-long sketch per
    * doc reaches the banding join (the single remaining shuffle).
    */
  /** Banded MinHash signature rows `(doc_id, band, sig)` of a
    * (doc_id, sharr) frame — the 128-min signature is ONE native pass per
    * doc, banded 32×4. THIS relation is the persisted dedup artifact of an
    * incremental pipeline (see [[q62IncrementalDedup]]): epoch N+1 probes
    * the stored epoch-≤N rows instead of recomputing them.
    */
  private def minhashBands(sharr: DataFrame): DataFrame = {
    val sigs = sharr.select(col("doc_id"),
      graft.functions.TextHashExprs.minhash_sigs(col("sharr"), MinhashPerms).as("mh"))
    sigs.select(col("doc_id"), posexplode(array(
      (0 until MinhashBands).map(b => concat_ws(":",
        (0 until MinhashRowsPerBand).map(r =>
          element_at(col("mh"), MinhashRowsPerBand * b + r + 1)): _*)): _*))
      .as(Seq("band", "sig")))
  }

  private def minhashCandidates(sharr: DataFrame): DataFrame = {
    val bands = minhashBands(sharr)
    bands.as("a").join(bands.as("b"),
        col("a.sig") === col("b.sig") && col("a.band") === col("b.band") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_bands"))
  }

  /** The full sketch-then-verify dedup pipeline: MinHash-LSH candidate
    * generation ([[q22MinhashLsh]]) followed by EXACT Jaccard verification
    * of each candidate pair — the step production dedup always runs, since
    * banding admits false positives. The verify join touches only candidate
    * pairs' shingle sets (equi-join on (doc_id, shh)), so its cost is
    * O(candidates × shingles/doc), never all-pairs. Emits pairs with exact
    * J ≥ 0.4 (the 32×4 banding's ~0.42 candidate threshold).
    */
  def q28MinhashVerify(s: SparkSession, dir: String): DataFrame =
    minhashVerifiedPairs(s, dir).orderBy(col("doc_a"), col("doc_b"))

  /** Unordered (doc_a, doc_b, jac_x1000) pairs with exact J ≥ 0.4 — the
    * shared sketch-then-verify core of [[q28MinhashVerify]] and the cluster
    * assignment [[q29DedupClusters]].
    */
  private def minhashVerifiedPairs(s: SparkSession, dir: String): DataFrame =
    minhashVerifiedPairsFrom(docs(s, dir))

  private def minhashVerifiedPairsFrom(d: DataFrame): DataFrame = {
    val arr = shingleArr(d, wide = true).cache()
    val cand = minhashCandidates(arr).select(col("doc_a"), col("doc_b"))
    // Exact-Jaccard verify WITHOUT exploding any shingle set: join the
    // candidate pairs to the per-doc shingle ARRAYS by id (un-exploded
    // 8-byte keys — "join first on the un-exploded key and explode after",
    // except no explode is needed at all), then |∩| is one codegen'd
    // array_intersect per candidate pair and |set| is the array length.
    // The old plan exploded EVERY doc's shingles twice and shuffled the
    // (doc_b, shh) rows of the full corpus through a groupBy-count plus two
    // size joins — 4 exchanges of corpus-shingle volume where this shape
    // pays 2 id-keyed joins of candidate volume. Arrays are distinct by
    // construction (text_shingles dedups locally), so intersect size is the
    // exact common-shingle count; jac arithmetic is unchanged.
    val ea = arr.select(col("doc_id").as("doc_a"), col("sharr").as("sha"))
    val eb = arr.select(col("doc_id").as("doc_b"), col("sharr").as("shb"))
    cand.join(ea, Seq("doc_a")).join(eb, Seq("doc_b"))
      .withColumn("common", size(array_intersect(col("sha"), col("shb"))).cast("long"))
      .withColumn("jac_x1000",
        round(lit(1000.0) * col("common") /
          (size(col("sha")).cast("long") + size(col("shb")).cast("long") - col("common"))).cast("long"))
      .filter(col("jac_x1000") >= 400)
      .select(col("doc_a"), col("doc_b"), col("jac_x1000"))
  }

  /** Duplicate-CLUSTER assignment — the decision stage after pair
    * detection: connected components over the verified near-dup pairs
    * ([[minhashVerifiedPairs]]), cluster id = the component's minimum
    * doc_id, `keep` = 1 for exactly that canonical doc. This is what a
    * training pipeline actually executes ("drop all but one per duplicate
    * group"); pairs alone cannot express it when dups are transitive
    * (A≈B, B≈C, A̸≈C still means keep ONE of {A,B,C}). Components via
    * [[GraphOps.connectedComponents]] — O(log² n) star-contraction rounds,
    * no driver-side union-find. Only docs with at least one near-dup appear
    * (singletons are trivially their own keeper).
    */
  def q29DedupClusters(s: SparkSession, dir: String): DataFrame =
    q29ClustersFrom(docs(s, dir))

  private def q29ClustersFrom(d: DataFrame): DataFrame = {
    val pairs = minhashVerifiedPairsFrom(d)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    GraphOps.connectedComponents(pairs)
      .select(col("node").as("doc_id"), col("cluster"),
        when(col("node") === col("cluster"), 1L).otherwise(0L).as("keep"))
      .orderBy(col("doc_id"))
  }

  /** q62: two-epoch INCREMENTAL dedup — the operator a continuously-
    * crawling corpus actually runs: dedup a NEW document batch (epoch 2 =
    * odd doc_id) against an EXISTING corpus (epoch 1 = even doc_id) whose
    * banded MinHash signature table ([[minhashBands]]) is the PERSISTED
    * artifact — the same stored-state-vs-new-observation identity as the
    * reference's item upsert (/root/reference/src/db/item.js:86-99: new
    * rows merge against what's already in the store; the store is never
    * recomputed). Dataflow: only epoch-2 docs pay sketching; their band
    * rows probe the stored epoch-1 band table by equi-join — new×old
    * candidates ONLY, never old×old (the existing corpus was already
    * deduped when it landed) and never new×new (intra-batch dedup is q22's
    * job) — then exact Jaccard verifies just the candidates' shingle sets,
    * fetched as whole arrays by an id-equi-join that the candidate set
    * prunes (in production those sets are stored beside the signatures and
    * this join is the store lookup; no old-side shingle row is ever
    * exploded or shuffled). Emits every epoch-2
    * doc with keep/drop, its best surviving match (highest J, ties to the
    * lowest old id) or −1, and the match's J×1000. At 10^10 docs per epoch
    * the cost is sketch(new) + one banded equi-join against a table that
    * only ever APPENDS — no quadratic term and no old-side recompute.
    */
  def q62IncrementalDedup(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    // epoch-1 signature table: persisted in production, derived here
    val oldArr = shingleArr(d.filter(col("doc_id") % 2 === 0), wide = true).cache()
    val newArr = shingleArr(d.filter(col("doc_id") % 2 === 1), wide = true).cache()
    val cand = minhashBands(newArr).as("n")
      .join(minhashBands(oldArr).as("o"),
        col("n.band") === col("o.band") && col("n.sig") === col("o.sig"))
      .select(col("n.doc_id").as("doc_new"), col("o.doc_id").as("doc_old"))
      .distinct()
    // Verify on the candidates' stored shingle ARRAYS, fetched by id — the
    // old-side relation is touched only through (a) the banded signature
    // probe above and (b) this id-keyed equi-join, which the candidate set
    // prunes by construction (candidate doc_olds are bounded by banding
    // collisions). The round-5 plan exploded the FULL epoch-1 corpus into
    // (doc_old, shh) rows and shuffled every old shingle through the verify
    // join — the exact full-corpus recompute the operator exists to avoid.
    // |∩| is one codegen'd array_intersect per candidate pair (arrays are
    // locally-distinct by construction); set sizes are array lengths.
    val verified = cand
      .join(newArr.select(col("doc_id").as("doc_new"), col("sharr").as("shn")), Seq("doc_new"))
      .join(oldArr.select(col("doc_id").as("doc_old"), col("sharr").as("sho")), Seq("doc_old"))
      .withColumn("common", size(array_intersect(col("shn"), col("sho"))).cast("long"))
      .withColumn("jac_x1000", round(lit(1000.0) * col("common") /
        (size(col("shn")).cast("long") + size(col("sho")).cast("long") - col("common"))).cast("long"))
      .filter(col("jac_x1000") >= 400)
    // best match per new doc: argmax (jac, then lowest old id) — a map-side
    // combinable max(struct) aggregate, not a window sort (integer compare,
    // ties identical to the ROW_NUMBER ordering it replaces)
    val best = verified
      .groupBy(col("doc_new").as("doc_id"))
      .agg(max(struct(col("jac_x1000"), (-col("doc_old")).as("nid"))).as("b"))
      .select(col("doc_id"), (-col("b.nid")).as("doc_old"),
        col("b.jac_x1000").as("jac_x1000"))
    d.filter(col("doc_id") % 2 === 1).select(col("doc_id"))
      .join(best, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("doc_old").isNull, 1L).otherwise(0L).as("keep"),
        coalesce(col("doc_old"), lit(-1L)).as("dup_of"),
        coalesce(col("jac_x1000"), lit(0L)).as("jac_x1000"))
      .orderBy(col("doc_id"))
  }

  /** The held-out set for [[q37Decontaminate]]: in production this is the
    * eval benchmark corpus; in the driver testdata, one source stands in.
    */
  private val BenchmarkSource = "src0"

  /** Flag a training doc when it shares ≥ this many distinct (df-capped)
    * shingle hashes with the benchmark set.
    */
  private val ContamMinShingles = 8L

  /** Decontamination — the eval-leak check every LLM training pipeline runs
    * before a data release: flag training documents whose n-gram shingles
    * overlap a held-out benchmark set. Shape at scale: the benchmark
    * shingle set is tiny next to the corpus (eval suites are MBs, corpora
    * are TBs) so it BROADCASTS; the corpus side is one map-side probe +
    * one groupBy(doc) — no shuffle of corpus shingles against each other,
    * unlike the dedup self-joins. Stop-phrase shingles are df-capped out
    * first ([[HotShingleDf]], as q21): a shingle every doc contains carries
    * no contamination signal and would flag the whole corpus.
    */
  def q37Decontaminate(s: SparkSession, dir: String): DataFrame =
    q37From(docs(s, dir))

  private def q37From(d: DataFrame): DataFrame = {
    // sketch once, CACHED: the old shape re-derived the exploded shingle
    // relation three times (hot aggregate, benchmark-set build, corpus
    // probe) — three full sketch passes where one pays. The df-cap is a
    // per-row array_except against the one-row folded hot set (same tiny
    // bound the old broadcast anti-join relied on), so only the benchmark
    // docs' and the probe side's KEPT shingles are ever exploded.
    val arr = shingleArr(d).cache()
    val hot = arr.select(explode(col("sharr")).as("shh"))
      .groupBy(col("shh")).agg(count(lit(1)).as("df"))
      .filter(col("df") > HotShingleDf)
    val hotArr = hot.agg(collect_set(col("shh")).as("hotset"))
    val keptA = arr.crossJoin(broadcast(hotArr))
      .select(col("doc_id"), array_except(col("sharr"), col("hotset")).as("ka"))
    val benchIds = d.filter(col("source") === BenchmarkSource).select(col("doc_id"))
    val benchSh = keptA.join(benchIds, "doc_id")
      .select(explode(col("ka")).as("shh")).distinct()
    keptA.join(benchIds, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), explode(col("ka")).as("shh"))
      .join(broadcast(benchSh), "shh")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_overlap"))
      .filter(col("n_overlap") >= ContamMinShingles)
      .select(col("doc_id"), col("n_overlap"))
      .orderBy(col("doc_id"))
  }

  /** Deterministic train/val/test assignment — reproducible hash-bucket
    * splits (90/5/5) that survive reshuffles, repartitions, and reruns:
    * bucket = affine-mix of doc_id over the portable 31-bit family, so ANY
    * engine (and any future rerun) derives the identical split. A pure
    * map — no shuffle, no RNG state. The id is folded into the hash
    * family's 31-bit domain first (`doc_id mod 2³¹`) so a 10^10-doc id
    * space cannot overflow the affine mix (int64 wrap in Spark would
    * silently mis-bucket while DuckDB raises — the fold keeps the two
    * engines identical at any id scale; below 2³¹ it is the identity).
    */
  def q38TrainSplit(s: SparkSession, dir: String): DataFrame =
    q38From(docs(s, dir))

  private def q38From(d: DataFrame): DataFrame = {
    val bucket = PH.mix(col("doc_id") % PH.M, 0) % 100
    d.select(col("doc_id"), bucket.as("bucket"),
        when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
          .as("split"))
      .orderBy(col("doc_id"))
  }

  /** SimHash: 64-bit signature from token-hash bit votes; near-dup pairs via
    * 8×8-bit band join + exact `bit_count(xor) ≤ 3` (the classic 64-bit
    * simhash near-dup threshold; 8 bands make candidate generation COMPLETE
    * for any hamming ≤ 7 by pigeonhole — a looser threshold would silently
    * miss pairs that differ in every band). Bit b of a token's vote vector is
    * bit 15 of the b-th affine mix of the portable token hash — 64 derived
    * bits from one char-level pass, DuckDB-oracled (round 1: rows-only).
    */
  def q23Simhash(s: SparkSession, dir: String): DataFrame = {
    // the whole signature is ONE native pass per doc (token poly-hashes →
    // 64 mix-bit votes → sign bits, graft.functions.TextHash.simhash) —
    // the old plan exploded every token occurrence and shuffled them
    // through a 64-aggregate-column groupBy; now the sketch is a pure map
    // and the band join is the only shuffle. Null = token-less doc (those
    // never appeared in the exploded plan either).
    val sig = Scans.spread(docs(s, dir).select(col("doc_id"), col("text")),
        col("doc_id"))
      .select(col("doc_id"),
        graft.functions.TextHashExprs.simhash64(col("text")).as("simhash"))
      .filter(col("simhash").isNotNull)
    val banded = sig.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until 8).map(b =>
        shiftright(col("simhash"), b * 8).bitwiseAND(lit(255L))): _*)).as(Seq("band", "bv")))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast("long").as("hamming"))
      .filter(col("hamming") <= 3) // before distinct: shrink the dedup input
      .distinct()
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Repetition-based quality filter — the Gopher-style signals a training
    * pipeline runs alongside [[q25Quality]]: per-document distinct-token
    * ratio, most-frequent-bigram mass, and duplicate-bigram mass, plus the
    * resulting `repetitive` flag. Everything is PER-DOCUMENT, so the whole
    * op is one map pass (typed mapPartitions, local hash counting) — no
    * shuffle, no explode: the bigram counts of one doc never need to meet
    * another doc's. At 100 TB this is the ideal plan: embarrassingly
    * parallel over input splits, output rows tiny. Integer x1000 fixed-point
    * (floor division) keeps the DuckDB oracle exact.
    */
  def q45Repetition(s: SparkSession, dir: String): DataFrame =
    q45From(docs(s, dir))

  private def q45From(d: DataFrame): DataFrame = {
    val sp = d.sparkSession
    import sp.implicits._
    // no scan-width guard: per-doc bigram counting is a single cheap pass
    // (~0.2 s single-core over the whole bench corpus) — the widen exchange
    // cost more than it bought (measured +0.29 s at sf0.1)
    d.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          val tk = text.split(' ').filter(_.nonEmpty)
          val n = tk.length.toLong
          val nDistinct = tk.toSet.size.toLong
          val bgCounts = new scala.collection.mutable.HashMap[(String, String), Long]()
          var i = 0
          while (i < tk.length - 1) {
            val k = (tk(i), tk(i + 1))
            bgCounts.update(k, bgCounts.getOrElse(k, 0L) + 1L)
            i += 1
          }
          val total = math.max(0L, n - 1)
          val maxc = if (bgCounts.isEmpty) 0L else bgCounts.valuesIterator.max
          // empty/whitespace-only doc: no tokens → ratio 0 (and the flag
          // rule then marks it repetitive, i.e. filtered) — mirrored by the
          // oracle's CASE so neither engine divides by zero
          val distinctRatio = if (n > 0) 1000L * nDistinct / n else 0L
          val topBigram = if (total > 0) 1000L * maxc / total else 0L
          val dupBigram = if (total > 0) 1000L * (total - bgCounts.size) / total else 0L
          val repetitive = if (topBigram >= 180 || distinctRatio <= 300) 1L else 0L
          (id, n, distinctRatio, topBigram, dupBigram, repetitive)
        }
      }
      .toDF("doc_id", "n_toks", "distinct_ratio_x1000", "top_bigram_x1000",
        "dup_bigram_x1000", "repetitive")
      .orderBy(col("doc_id"))
  }

  /** Per-language sampling rates (percent) for [[q48StratifiedSample]] —
    * the "data mixing" weights a pretraining pipeline applies per source
    * stratum (upsample high-value languages, downsample the crawl-heavy
    * ones). Shared with the oracle SQL so the two can't drift.
    */
  private[graft] val MixRates: Seq[(String, Int)] =
    Seq("en" -> 60, "de" -> 80, "es" -> 40, "fr" -> 100, "zh" -> 50)
  private[graft] val MixDefaultRate = 30

  /** q48: deterministic stratified sampling — keep a doc iff its portable
    * hash bucket falls under its stratum's rate. Pure map (hash + compare,
    * no shuffle, no RNG): the sample is REPRODUCIBLE across engines, reruns
    * and cluster sizes — the property `df.sample()` (partition-RNG-seeded)
    * cannot give a 100 TB pipeline that must re-derive the same corpus on
    * retry. Salt 7 decorrelates from q38's split buckets (salt 0), so
    * sampling composes with the train/val/test split instead of biasing it.
    */
  def q48StratifiedSample(s: SparkSession, dir: String): DataFrame =
    q48From(docs(s, dir))

  private def q48From(d: DataFrame): DataFrame = {
    val rate = MixRates.foldLeft(lit(MixDefaultRate)) { case (acc, (l, r)) =>
      when(col("lang") === l, r).otherwise(acc)
    }.cast("long")
    d
      .select(col("doc_id"), col("lang"), rate.as("rate"),
        (PH.mix(col("doc_id") % PH.M, 7) % 100).as("bucket"))
      .filter(col("bucket") < col("rate"))
      .orderBy(col("doc_id"))
  }

  /** Per-level group width for [[q49SequencePack]]'s three-level prefix
    * scan. 16384 keeps every partitioned window ≤ 16384 rows and the single
    * unpartitioned top window at n/W² rows — 37 rows at 10^10 docs, still
    * under 10^6 rows out to 2.7×10^14 docs. The level-1 prefix table is
    * n/W rows (~600k × 16 B ≈ 10 MB at 10^10 docs), which AQE can still
    * broadcast; beyond that the equi-join on g1 reuses the level-1
    * window's own hash partitioning (no hint forces a driver-side build).
    */
  private val PackGroup = 16384L

  /** q49: sequence packing — concat-and-chop, the layout step that turns a
    * document corpus into fixed-budget training sequences (B = 256 tokens
    * here; 2k–8k in production). Each doc's global token offset is a PREFIX
    * SUM in doc_id order; `seq_id = start/B`, `offset = start%B`, `end_seq`
    * marks boundary-crossing docs. A single global window would serialize
    * the scan through one task, so the prefix is computed as a THREE-level
    * distributed scan: a running sum within `g1 = doc_id/W` groups
    * (parallel, ≤ W rows per window partition), g1 totals prefixed within
    * `g2 = doc_id/W²` groups (parallel, ≤ W rows each), and only the g2
    * totals — n/W² rows, bounded ≤ ~10⁶ out past 10^14 docs — through the
    * one unpartitioned window. PlanSpec pins that the sole unpartitioned
    * window sits above the g2 aggregate, never the full doc relation.
    */
  def q49SequencePack(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val B = 256L
    val W = PackGroup
    val nToks = size(filter(toks, t => t =!= "")).cast("long")
    val d = docs(s, dir)
      .select(col("doc_id"), nToks.as("n_tokens"),
        (col("doc_id") / W).cast("long").as("g1"),
        (col("doc_id") / (W * W)).cast("long").as("g2"))
    val within1 = Window.partitionBy(col("g1")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val l1 = d.withColumn("wc", sum(col("n_tokens")).over(within1))
    val g1Tot = d.groupBy(col("g1"), col("g2")).agg(sum(col("n_tokens")).as("t1"))
    val within2 = Window.partitionBy(col("g2")).orderBy(col("g1"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val topW = Window.orderBy(col("g2"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val g2Prefix = g1Tot.groupBy(col("g2")).agg(sum(col("t1")).as("t2"))
      .withColumn("p2", sum(col("t2")).over(topW) - col("t2"))
      .select(col("g2"), col("p2"))
    val prefixes = g1Tot
      .withColumn("p1", sum(col("t1")).over(within2) - col("t1"))
      .join(broadcast(g2Prefix), Seq("g2"))
      .select(col("g1"), (col("p1") + col("p2")).as("gprefix"))
    l1.join(prefixes, Seq("g1"))
      .withColumn("c", col("wc") + col("gprefix"))
      .select(col("doc_id"), col("n_tokens"),
        ((col("c") - col("n_tokens")) / B).cast("long").as("seq_id"),
        ((col("c") - col("n_tokens")) % B).as("offset"),
        ((col("c") - 1) / B).cast("long").as("end_seq"))
      .orderBy(col("doc_id"))
  }

  /** q57: the composed release-build pipeline — the end-to-end dataflow a
    * training-data release actually executes, chained from the SAME stage
    * operators the pack proves piecewise: shingle → MinHash-LSH → exact
    * Jaccard verify → connected-component keeper filter
    * ([[q29DedupClusters]]), intra-doc repetition filter
    * ([[q45Repetition]]), quality filter ([[q25Quality]]), benchmark
    * decontamination ([[q37Decontaminate]] + dropping the benchmark source
    * itself), stratified sampling ([[q48StratifiedSample]]) and
    * train/val/test assignment ([[q38TrainSplit]]) — one DataFrame,
    * DuckDB-oracled end to end. Shape at scale: the drop-sides are all
    * SHRINKING relations (dup losers ≪ n, flagged docs ≪ n), each removed
    * by one equi-anti-join on doc_id; the per-doc filter stages are pure
    * maps whose outputs join back co-partitioned on the same key, and the
    * sample/split stages are hash arithmetic with no shuffle at all.
    */
  def q57ReleasePipeline(s: SparkSession, dir: String): DataFrame = {
    // materialize the shared base relation ONCE: all six stage subtrees
    // plus the final join spine read it, and without this each re-derived
    // the full corpus from parquet (~7 full scans at 100 TB where one
    // pays). PlanSpec pins the executed plan at ≤2 documents.parquet scans.
    // Widen a narrow scan BEFORE checkpointing so the materialized base is
    // already parallel and every kernel subtree's own spread guard no-ops
    // (one shuffle paid once instead of per stage).
    val d = Scans.spread(docs(s, dir), col("doc_id")).localCheckpoint(true)
    val dupLosers = q29ClustersFrom(d)
      .filter(col("keep") === 0L).select(col("doc_id"))
    val repBad = q45From(d)
      .filter(col("repetitive") === 1L).select(col("doc_id"))
    val qualBad = q25From(d)
      .filter(col("bucket") =!= "ok").select(col("doc_id"))
    val contam = q37From(d).select(col("doc_id"))
    val sampled = q48From(d).select(col("doc_id"))
    val splits = q38From(d).select(col("doc_id"), col("split"))
    d
      .filter(col("source") =!= BenchmarkSource)
      .join(dupLosers, Seq("doc_id"), "left_anti")
      .join(repBad, Seq("doc_id"), "left_anti")
      .join(qualBad, Seq("doc_id"), "left_anti")
      .join(contam, Seq("doc_id"), "left_anti")
      .join(sampled, Seq("doc_id"))
      .join(splits, Seq("doc_id"))
      .select(col("doc_id"), col("lang"), col("source"), col("split"))
      .orderBy(col("doc_id"))
  }

  /** PII redaction patterns — email, NANP-style phone, IPv4. Both regex
    * dialects in play (Java in Spark, RE2 in DuckDB) parse these
    * identically: character classes, bounded repetition, `\b` ASCII word
    * boundaries only.
    */
  private val PiiPatterns: Seq[(String, String)] = Seq(
    """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}""" -> "<EMAIL>",
    """\+1-[0-9]{3}-[0-9]{4}""" -> "<PHONE>",
    """\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b""" -> "<IP>")

  /** Redact every PII pattern in a string column — the reusable scrubbing
    * op a training pipeline runs before anything leaves the raw zone. Pure
    * per-row map (codegen'd regexp_replace chain): no shuffle, so at 100 TB
    * it rides the ingest scan for free.
    */
  def redactPii(c: Column): Column =
    PiiPatterns.foldLeft(c) { case (acc, (p, tag)) => regexp_replace(acc, p, tag) }

  /** q46: PII detection + redaction over `documents`. The synthetic corpus
    * carries no natural PII, so the query first injects deterministic
    * doc_id-derived emails/phones/IPs (the same expression in the oracle —
    * an in-query test fixture, NOT part of the operator), then counts and
    * redacts them with [[redactPii]]. Counts + the redacted text are exact
    * string outputs — fully hash-comparable across engines.
    */
  def q46PiiRedact(s: SparkSession, dir: String): DataFrame = {
    val t = concat(col("text"),
      when(col("doc_id") % 3 =!= 0,
        concat(lit(" contact user"), col("doc_id").cast("string"),
          lit("@mail.example.com"))).otherwise(""),
      when(col("doc_id") % 2 === 0,
        concat(lit(" call +1-555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"))).otherwise(""),
      when(col("doc_id") % 5 === 0,
        concat(lit(" from 10."), (col("doc_id") % 256).cast("string"),
          lit(".0."), (col("doc_id") % 100).cast("string"))).otherwise(""))
    // six regexp passes per row (3 counts + 3 replaces) — widen a narrow
    // scan so the regex work parallelizes (no-op on multi-row-group inputs)
    Scans.spread(docs(s, dir).select(col("doc_id"), col("text")), col("doc_id"))
      .select(col("doc_id"), t.as("t"))
      .select(col("doc_id"),
        regexp_count(col("t"), lit(PiiPatterns(0)._1)).cast("long").as("n_emails"),
        regexp_count(col("t"), lit(PiiPatterns(1)._1)).cast("long").as("n_phones"),
        regexp_count(col("t"), lit(PiiPatterns(2)._1)).cast("long").as("n_ips"),
        redactPii(col("t")).as("redacted"))
      .orderBy(col("doc_id"))
  }

  /** Language-ID by token-signature scoring — a deterministic, portable
    * n-gram-style heuristic (the synthetic corpus shares one vocabulary
    * across langs, so the gate checks engine agreement, not linguistics).
    */
  def q24LangId(s: SparkSession, dir: String): DataFrame = {
    def cnt(w: String): Column =
      size(filter(toks, t => t === lit(w))).cast("long")
    docs(s, dir)
      .select(col("doc_id"), col("lang"),
        (cnt("the") + cnt("a") + cnt("value")).as("s_en"),
        (cnt("hash") + cnt("agg")).as("s_de"),
        (cnt("table") + cnt("row")).as("s_es"))
      .withColumn("predicted",
        when(col("s_en") >= col("s_de") && col("s_en") >= col("s_es"), "en")
          .when(col("s_de") >= col("s_es"), "de")
          .otherwise("es"))
      .groupBy(col("lang"), col("predicted"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("predicted"))
  }

  /** Quality scoring: integer-safe length/token/stopword features + bucket. */
  def q25Quality(s: SparkSession, dir: String): DataFrame =
    q25From(docs(s, dir))

  private def q25From(d: DataFrame): DataFrame = {
    val nTok = size(filter(toks, t => t =!= "")).cast("long")
    val nStop = size(filter(toks, t => t.isin("the", "a", "of"))).cast("long")
    d
      .select(col("doc_id"), col("n_chars"), nTok.as("n_tokens"), nStop.as("n_stop"))
      .withColumn("avg_tok_len_x100",
        round(lit(100.0) * col("n_chars") / col("n_tokens")).cast("long"))
      .withColumn("bucket",
        when(col("n_tokens") < 30, "short")
          .when(col("n_stop") * 5 > col("n_tokens"), "stopword_heavy")
          .otherwise("ok"))
      .orderBy(col("doc_id"))
  }

  /** Token counting: whitespace tokens + BPE-ish subword count (regex split
    * on vowel boundaries — a deterministic proxy; both engines use the same
    * pattern semantics on this ASCII corpus).
    */
  def q26TokenStats(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"),
        size(filter(toks, t => t =!= "")).cast("long").as("n_tokens"),
        size(filter(split(col("text"), "[aeiou ]+"), t => t =!= ""))
          .cast("long").as("n_subwords"),
        length(col("text")).cast("long").as("len"))
      .orderBy(col("doc_id"))

  /** Document fingerprint: bottom-4 sketch of (mixed) shingle hashes
    * (winnowing-style content signature). Pure per-doc array math over
    * [[shingleArr]] — the old plan shuffled exploded shingle rows through a
    * collect_list groupBy to fold values that never leave their doc.
    */
  def q27Fingerprint(s: SparkSession, dir: String): DataFrame =
    shingleArr(docs(s, dir))
      .select(col("doc_id"), concat_ws(",",
        slice(array_sort(transform(col("sharr"), h => PH.mix(h, 7))), 1, 4)
          .cast("array<string>")).as("fp"))
      .orderBy(col("doc_id"))

  /** q52: vocabulary head — the word-count stage every tokenizer build
    * (BPE/WordPiece) starts from: global token frequencies, top 100 by
    * count (ties broken by token asc so the cut is deterministic). Shape at
    * scale: explode is a map; the count groupBy is ONE shuffle with
    * map-side combine (hot tokens pre-aggregate per partition — "the"
    * arrives as ~#partitions partial counts, not 10^11 rows); the top-k is
    * Spark's TakeOrderedAndProject — per-partition heads, never a full
    * sort.
    */
  def q52Vocab(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(explode(filter(toks, t => t =!= "")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token").asc)
      .limit(100)

  /** q53: exact per-source length quantiles (p50/p90/p99 of n_chars) — the
    * corpus-stats report run after every ingest. EXACT order statistics at
    * scale without sorting rows: build the per-source VALUE HISTOGRAM first
    * (one map-side-combinable groupBy), then window over distinct values
    * only — the cumulative scan handles |value domain| rows per source, not
    * |docs|. k-th = smallest value with cumulative count ≥ ceil(q·n), all
    * in integer arithmetic (percentile_disc semantics, engine-portable —
    * no interpolated doubles).
    */
  def q53LengthQuantiles(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = docs(s, dir).groupBy(col("source"), col("n_chars"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("source")).orderBy(col("n_chars"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("cum", sum(col("c")).over(w))
    val totals = hist.groupBy(col("source")).agg(sum(col("c")).as("n_docs"))
    def kth(q: Int) =
      min(when(col("cum") >= expr(s"(n_docs * $q + 99) div 100"), col("n_chars")))
        .as(s"p$q")
    cum.join(totals, "source")
      .groupBy(col("source"))
      .agg(max(col("n_docs")).as("n_docs"), kth(50), kth(90), kth(99))
      .orderBy(col("source"))
  }

  /** Shared CTE chain of the sketch-then-verify pipeline, ending in CTE
    * `verified(doc_a, doc_b, jac_x1000)` — the oracle twin of
    * [[minhashVerifiedPairs]], used by both q28 and q29.
    */
  private def minhashVerifySqlCtes: String =
    s"""$shingleHashesSql,
         mh AS (
           SELECT doc_id, p, MIN(${graft.functions.PortableHash.mixSql("shh", "p")}) AS mh
           FROM shh CROSS JOIN generate_series(0, ${MinhashPerms - 1}) AS pp(p)
           GROUP BY 1, 2),
         bands AS (
           SELECT doc_id, p // $MinhashRowsPerBand AS band,
                  string_agg(mh::VARCHAR, ':' ORDER BY p) AS sig
           FROM mh GROUP BY 1, 2),
         cand AS (
           SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           FROM bands a JOIN bands b
             ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
         sizes AS (SELECT doc_id, COUNT(*) AS sz FROM shh GROUP BY 1),
         common AS (
           SELECT c.doc_a, c.doc_b, COUNT(*) AS common
           FROM cand c JOIN shh sa ON sa.doc_id = c.doc_a
                       JOIN shh sb ON sb.doc_id = c.doc_b AND sb.shh = sa.shh
           GROUP BY 1, 2),
         verified AS (
           SELECT c.doc_a, c.doc_b,
             CAST(ROUND(1000.0 * common / (sa.sz + sb.sz - common)) AS BIGINT) AS jac_x1000
           FROM common c JOIN sizes sa ON sa.doc_id = c.doc_a
                         JOIN sizes sb ON sb.doc_id = c.doc_b
           WHERE CAST(ROUND(1000.0 * common / (sa.sz + sb.sz - common)) AS BIGINT) >= 400)"""

  /** Per-source inter-document n-gram duplication report — the corpus-level
    * duplication metric (what fraction of a source's distinct-per-doc
    * 3-gram occurrences also appear in ANOTHER doc of the same source)
    * computed before deciding how aggressively to dedup each source.
    * Complements q45 (intra-document repetition): this one measures
    * cross-document redundancy.
    *
    * Shape: the codegen'd per-doc shingle set ([[shingleHashes]], 8-byte
    * hashes — no strings shuffled) → ONE map-side-combinable count shuffle
    * on (source, shingle) → ONE k-row rollup per source. Both aggregations
    * partial-combine, so at 100 TB the full pass is two shuffles of
    * shrinking size and the output is |sources| rows.
    */
  def q55DupNgrams(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    shingleHashes(d)
      .join(d.select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy(col("source"), col("shh"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("source"))
      .agg(sum(col("cnt")).as("n_occ"),
        count(lit(1)).as("n_distinct"),
        sum(when(col("cnt") > 1, col("cnt")).otherwise(lit(0L))).as("dup_occ"))
      .select(col("source"), col("n_occ"), col("n_distinct"),
        round(lit(1000.0) * col("dup_occ") / col("n_occ"))
          .cast("long").as("dup_rate_x1000"))
      .orderBy(col("source"))
  }

  val oracle: Map[String, String] = Map(
    "q55_dup_ngrams" ->
      s"""WITH $shingleHashesSql,
         ss AS (SELECT d.source, s.shh
                FROM shh s JOIN documents d USING (doc_id)),
         cs AS (SELECT source, shh, COUNT(*) AS cnt FROM ss GROUP BY 1, 2)
         SELECT source, CAST(SUM(cnt) AS BIGINT) AS n_occ,
           COUNT(*) AS n_distinct,
           CAST(ROUND(1000.0 * SUM(CASE WHEN cnt > 1 THEN cnt ELSE 0 END)
                      / SUM(cnt)) AS BIGINT) AS dup_rate_x1000
         FROM cs GROUP BY 1 ORDER BY 1""",
    "q20_dedup_exact" ->
      """SELECT keeper, n FROM (
           SELECT array_to_string(string_split(text,' ')[1:5], ' ') AS p,
                  MIN(doc_id) AS keeper, COUNT(*) AS n
           FROM documents GROUP BY 1)
         WHERE n > 1 ORDER BY keeper""",
    "q21_ngram_jaccard" ->
      s"""WITH $shingleHashesSql,
         dfreq AS (SELECT shh, COUNT(*) AS df FROM shh GROUP BY 1),
         kept AS (SELECT s.doc_id, s.shh FROM shh s JOIN dfreq USING (shh)
                  WHERE df <= $HotShingleDf),
         sizes AS (SELECT doc_id, COUNT(*) AS sz FROM kept GROUP BY 1),
         pairs AS (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
           FROM kept a JOIN kept b ON a.shh = b.shh AND a.doc_id < b.doc_id
           GROUP BY 1,2)
         SELECT doc_a, doc_b,
           CAST(ROUND(1000.0 * common / (sa.sz + sb.sz - common)) AS BIGINT) AS jac_x1000
         FROM pairs JOIN sizes sa ON sa.doc_id = doc_a
                    JOIN sizes sb ON sb.doc_id = doc_b
         WHERE CAST(ROUND(1000.0 * common / (sa.sz + sb.sz - common)) AS BIGINT) >= 200
         ORDER BY doc_a, doc_b""",
    "q22_minhash_lsh" ->
      s"""WITH $shingleHashesSql,
         mh AS (
           SELECT doc_id, p, MIN(${graft.functions.PortableHash.mixSql("shh", "p")}) AS mh
           FROM shh CROSS JOIN generate_series(0, ${MinhashPerms - 1}) AS pp(p)
           GROUP BY 1, 2),
         bands AS (
           SELECT doc_id, p // $MinhashRowsPerBand AS band,
                  string_agg(mh::VARCHAR, ':' ORDER BY p) AS sig
           FROM mh GROUP BY 1, 2)
         SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_bands
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "q28_minhash_verify" ->
      s"""WITH $minhashVerifySqlCtes
         SELECT doc_a, doc_b, jac_x1000 FROM verified ORDER BY doc_a, doc_b""",
    "q62_incremental_dedup" ->
      s"""WITH $shingleHashesSql,
         mh AS (
           SELECT doc_id, p, MIN(${graft.functions.PortableHash.mixSql("shh", "p")}) AS mh
           FROM shh CROSS JOIN generate_series(0, ${MinhashPerms - 1}) AS pp(p)
           GROUP BY 1, 2),
         bands AS (
           SELECT doc_id, p // $MinhashRowsPerBand AS band,
                  string_agg(mh::VARCHAR, ':' ORDER BY p) AS sig
           FROM mh GROUP BY 1, 2),
         cand AS (
           SELECT DISTINCT n.doc_id AS doc_new, o.doc_id AS doc_old
           FROM bands n JOIN bands o ON n.band = o.band AND n.sig = o.sig
           WHERE n.doc_id % 2 = 1 AND o.doc_id % 2 = 0),
         sizes AS (SELECT doc_id, COUNT(*) AS sz FROM shh GROUP BY 1),
         common AS (
           SELECT c.doc_new, c.doc_old, COUNT(*) AS common
           FROM cand c JOIN shh sn ON sn.doc_id = c.doc_new
                       JOIN shh so ON so.doc_id = c.doc_old AND so.shh = sn.shh
           GROUP BY 1, 2),
         verified AS (
           SELECT c.doc_new, c.doc_old,
             CAST(ROUND(1000.0 * common / (sn.sz + so.sz - common)) AS BIGINT) AS jac_x1000
           FROM common c JOIN sizes sn ON sn.doc_id = c.doc_new
                         JOIN sizes so ON so.doc_id = c.doc_old
           WHERE CAST(ROUND(1000.0 * common / (sn.sz + so.sz - common)) AS BIGINT) >= 400),
         best AS (
           SELECT doc_new, doc_old, jac_x1000 FROM (
             SELECT doc_new, doc_old, jac_x1000,
               ROW_NUMBER() OVER (PARTITION BY doc_new
                 ORDER BY jac_x1000 DESC, doc_old) AS rn
             FROM verified) WHERE rn = 1)
         SELECT d.doc_id,
           CAST(CASE WHEN b.doc_new IS NULL THEN 1 ELSE 0 END AS BIGINT) AS keep,
           CAST(COALESCE(b.doc_old, -1) AS BIGINT) AS dup_of,
           CAST(COALESCE(b.jac_x1000, 0) AS BIGINT) AS jac_x1000
         FROM documents d LEFT JOIN best b ON b.doc_new = d.doc_id
         WHERE d.doc_id % 2 = 1
         ORDER BY d.doc_id""",
    "q37_decontaminate" ->
      s"""WITH $shingleHashesSql,
         dfreq AS (SELECT shh, COUNT(*) AS df FROM shh GROUP BY 1),
         kept AS (SELECT s.doc_id, s.shh FROM shh s JOIN dfreq USING (shh)
                  WHERE df <= $HotShingleDf),
         bench AS (
           SELECT DISTINCT k.shh FROM kept k
           JOIN documents d ON d.doc_id = k.doc_id
           WHERE d.source = '$BenchmarkSource')
         SELECT k.doc_id, COUNT(*) AS n_overlap
         FROM kept k
         JOIN documents dd ON dd.doc_id = k.doc_id AND dd.source <> '$BenchmarkSource'
         JOIN bench b ON b.shh = k.shh
         GROUP BY 1 HAVING COUNT(*) >= $ContamMinShingles
         ORDER BY k.doc_id""",
    "q38_train_split" ->
      s"""SELECT doc_id, ${graft.functions.PortableHash.mixSql("(doc_id % 2147483648)", "0")} % 100 AS bucket,
           CASE WHEN ${graft.functions.PortableHash.mixSql("(doc_id % 2147483648)", "0")} % 100 < 90 THEN 'train'
                WHEN ${graft.functions.PortableHash.mixSql("(doc_id % 2147483648)", "0")} % 100 < 95 THEN 'val'
                ELSE 'test' END AS split
         FROM documents ORDER BY doc_id""",
    "q52_vocab" ->
      """SELECT token, COUNT(*) AS cnt
         FROM (SELECT unnest([t for t in string_split(text, ' ') if t <> '']) AS token
               FROM documents)
         GROUP BY token ORDER BY cnt DESC, token ASC LIMIT 100""",
    "q53_length_quantiles" ->
      """WITH hist AS (
           SELECT source, n_chars, COUNT(*) AS c FROM documents GROUP BY 1, 2),
         cum AS (
           SELECT source, n_chars, c,
             SUM(c) OVER (PARTITION BY source ORDER BY n_chars
                          ROWS UNBOUNDED PRECEDING) AS cum
           FROM hist),
         totals AS (SELECT source, SUM(c) AS n_docs FROM hist GROUP BY 1)
         SELECT cum.source,
           CAST(MAX(t.n_docs) AS BIGINT) AS n_docs,
           MIN(CASE WHEN cum >= (t.n_docs * 50 + 99) // 100 THEN n_chars END) AS p50,
           MIN(CASE WHEN cum >= (t.n_docs * 90 + 99) // 100 THEN n_chars END) AS p90,
           MIN(CASE WHEN cum >= (t.n_docs * 99 + 99) // 100 THEN n_chars END) AS p99
         FROM cum JOIN totals t USING (source)
         GROUP BY cum.source ORDER BY cum.source""",
    "q48_stratified_sample" ->
      s"""WITH rated AS (
           SELECT doc_id, lang,
             CASE lang ${MixRates.map { case (l, r) => s"WHEN '$l' THEN $r" }.mkString(" ")}
                  ELSE $MixDefaultRate END AS rate,
             ${graft.functions.PortableHash.mixSql("(doc_id % 2147483648)", "7")} % 100 AS bucket
           FROM documents)
         SELECT doc_id, lang, CAST(rate AS BIGINT) AS rate, CAST(bucket AS BIGINT) AS bucket
         FROM rated WHERE bucket < rate ORDER BY doc_id""",
    "q49_sequence_pack" ->
      """WITH toks AS (
           SELECT doc_id, CAST(len(list_filter(string_split(text,' '), x -> x <> '')) AS BIGINT) AS n_tokens
           FROM documents),
         cum AS (
           SELECT doc_id, n_tokens,
             SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS c
           FROM toks)
         SELECT doc_id, n_tokens,
           CAST((c - n_tokens) // 256 AS BIGINT) AS seq_id,
           CAST((c - n_tokens) % 256 AS BIGINT) AS offset,
           CAST((c - 1) // 256 AS BIGINT) AS end_seq
         FROM cum ORDER BY doc_id""",
    "q57_release_pipeline" ->
      s"""WITH RECURSIVE $minhashVerifySqlCtes,
         edges AS (SELECT doc_a AS u, doc_b AS v FROM verified
                   UNION SELECT doc_b, doc_a FROM verified),
         reach(node, r) AS (
           SELECT u, u FROM edges
           UNION
           SELECT e.v, reach.r FROM reach JOIN edges e ON e.u = reach.node),
         losers AS (
           SELECT node AS doc_id FROM reach GROUP BY node HAVING node <> MIN(r)),
         rtoks AS (
           SELECT doc_id, [t for t in string_split(text,' ') if t <> ''] AS tk
           FROM documents),
         rbase AS (
           SELECT doc_id, len(tk) AS n_toks, len(list_distinct(tk)) AS n_distinct, tk
           FROM rtoks),
         rbg AS (
           SELECT doc_id, tk[i] || ' ' || tk[i+1] AS b
           FROM rbase,
                LATERAL (SELECT unnest(generate_series(1, CAST(len(tk) AS BIGINT) - 1)) AS i) g
           WHERE len(tk) >= 2),
         rbgc AS (SELECT doc_id, b, count(*) AS c FROM rbg GROUP BY doc_id, b),
         rbga AS (
           SELECT doc_id, max(c) AS maxc, sum(c) AS total FROM rbgc GROUP BY doc_id),
         repbad AS (
           SELECT b.doc_id FROM rbase b LEFT JOIN rbga a USING (doc_id)
           WHERE coalesce(1000 * a.maxc // a.total, 0) >= 180
              OR (CASE WHEN b.n_toks = 0 THEN 0
                  ELSE 1000 * b.n_distinct // b.n_toks END) <= 300),
         qualbad AS (
           SELECT doc_id FROM documents
           WHERE len(list_filter(string_split(text,' '), x -> x <> '')) < 30
              OR len(list_filter(string_split(text,' '), x -> x IN ('the','a','of'))) * 5
                 > len(list_filter(string_split(text,' '), x -> x <> ''))),
         dfreq AS (SELECT shh, COUNT(*) AS df FROM shh GROUP BY 1),
         keptsh AS (SELECT s.doc_id, s.shh FROM shh s JOIN dfreq USING (shh)
                    WHERE df <= $HotShingleDf),
         bench AS (
           SELECT DISTINCT k.shh FROM keptsh k
           JOIN documents d2 ON d2.doc_id = k.doc_id
           WHERE d2.source = '$BenchmarkSource'),
         contam AS (
           SELECT k.doc_id
           FROM keptsh k
           JOIN documents dd ON dd.doc_id = k.doc_id AND dd.source <> '$BenchmarkSource'
           JOIN bench b ON b.shh = k.shh
           GROUP BY 1 HAVING COUNT(*) >= $ContamMinShingles)
         SELECT d.doc_id, d.lang, d.source,
           CASE WHEN ${graft.functions.PortableHash.mixSql("(d.doc_id % 2147483648)", "0")} % 100 < 90 THEN 'train'
                WHEN ${graft.functions.PortableHash.mixSql("(d.doc_id % 2147483648)", "0")} % 100 < 95 THEN 'val'
                ELSE 'test' END AS split
         FROM documents d
         WHERE d.source <> '$BenchmarkSource'
           AND d.doc_id NOT IN (SELECT doc_id FROM losers)
           AND d.doc_id NOT IN (SELECT doc_id FROM repbad)
           AND d.doc_id NOT IN (SELECT doc_id FROM qualbad)
           AND d.doc_id NOT IN (SELECT doc_id FROM contam)
           AND ${graft.functions.PortableHash.mixSql("(d.doc_id % 2147483648)", "7")} % 100 <
               CASE d.lang ${MixRates.map { case (l, r) => s"WHEN '$l' THEN $r" }.mkString(" ")}
                    ELSE $MixDefaultRate END
         ORDER BY d.doc_id""",
    "q29_dedup_clusters" ->
      s"""WITH RECURSIVE $minhashVerifySqlCtes,
         edges AS (SELECT doc_a AS u, doc_b AS v FROM verified
                   UNION SELECT doc_b, doc_a FROM verified),
         reach(node, r) AS (
           SELECT u, u FROM edges
           UNION
           SELECT e.v, reach.r FROM reach JOIN edges e ON e.u = reach.node)
         SELECT node AS doc_id, MIN(r) AS cluster,
           CAST(CASE WHEN node = MIN(r) THEN 1 ELSE 0 END AS BIGINT) AS keep
         FROM reach GROUP BY node ORDER BY doc_id""",
    "q23_simhash" ->
      s"""WITH tok AS (
           SELECT doc_id, unnest([t for t in string_split(text, ' ') if t <> '']) AS tok
           FROM documents),
         th AS (SELECT doc_id, ${graft.functions.PortableHash.polySql("tok")} AS h FROM tok),
         votes AS (
           SELECT doc_id, b,
             SUM(CASE WHEN ((${graft.functions.PortableHash.mixSql("h", "b")}) >> 15) & 1 = 1
                 THEN 1 ELSE -1 END) AS v
           FROM th CROSS JOIN generate_series(0, 63) AS bb(b) GROUP BY 1, 2),
         sig AS (
           SELECT doc_id, bit_or(CASE WHEN v > 0 THEN
               (CASE WHEN b = 63 THEN -9223372036854775808 ELSE (1::BIGINT << b) END)
             ELSE 0 END) AS simhash
           FROM votes GROUP BY 1),
         banded AS (
           SELECT doc_id, simhash, band, (simhash >> (band * 8)) & 255 AS bv
           FROM sig CROSS JOIN generate_series(0, 7) AS g(band))
         SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
         FROM banded a JOIN banded b
           ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
         WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
         ORDER BY doc_a, doc_b""",
    "q27_fingerprint" ->
      s"""WITH $shingleHashesSql,
         mixed AS (SELECT doc_id, ${graft.functions.PortableHash.mixSql("shh", "7")} AS h FROM shh)
         SELECT doc_id,
           array_to_string(list_sort(list(h))[1:4], ',') AS fp
         FROM mixed GROUP BY doc_id ORDER BY doc_id""",
    "q24_lang_id" ->
      """WITH f AS (
           SELECT doc_id, lang,
             len(list_filter(string_split(text,' '), x -> x IN ('the','a','value'))) AS s_en,
             len(list_filter(string_split(text,' '), x -> x IN ('hash','agg'))) AS s_de,
             len(list_filter(string_split(text,' '), x -> x IN ('table','row'))) AS s_es
           FROM documents)
         SELECT lang,
           CASE WHEN s_en >= s_de AND s_en >= s_es THEN 'en'
                WHEN s_de >= s_es THEN 'de' ELSE 'es' END AS predicted,
           COUNT(*) AS n
         FROM f GROUP BY 1,2 ORDER BY 1,2""",
    "q25_quality" ->
      """SELECT doc_id, n_chars,
           CAST(len(list_filter(string_split(text,' '), x -> x <> '')) AS BIGINT) AS n_tokens,
           CAST(len(list_filter(string_split(text,' '), x -> x IN ('the','a','of'))) AS BIGINT) AS n_stop,
           CAST(ROUND(100.0 * n_chars / len(list_filter(string_split(text,' '), x -> x <> ''))) AS BIGINT) AS avg_tok_len_x100,
           CASE WHEN len(list_filter(string_split(text,' '), x -> x <> '')) < 30 THEN 'short'
                WHEN len(list_filter(string_split(text,' '), x -> x IN ('the','a','of'))) * 5
                     > len(list_filter(string_split(text,' '), x -> x <> '')) THEN 'stopword_heavy'
                ELSE 'ok' END AS bucket
         FROM documents ORDER BY doc_id""",
    "q45_repetition" ->
      """WITH toks AS (
           SELECT doc_id, [t for t in string_split(text,' ') if t <> ''] AS tk FROM documents
         ), base AS (
           SELECT doc_id, len(tk) AS n_toks, len(list_distinct(tk)) AS n_distinct, tk FROM toks
         ), bg AS (
           SELECT doc_id, tk[i] || ' ' || tk[i+1] AS b
           FROM base, LATERAL (SELECT unnest(generate_series(1, CAST(len(tk) AS BIGINT) - 1)) AS i) g
           WHERE len(tk) >= 2
         ), bgc AS (
           SELECT doc_id, b, count(*) AS c FROM bg GROUP BY doc_id, b
         ), bga AS (
           SELECT doc_id, max(c) AS maxc, sum(c) AS total, count(*) AS ndist FROM bgc GROUP BY doc_id
         )
         SELECT b.doc_id,
           CAST(b.n_toks AS BIGINT) AS n_toks,
           CAST(CASE WHEN b.n_toks = 0 THEN 0
                     ELSE 1000 * b.n_distinct // b.n_toks END AS BIGINT) AS distinct_ratio_x1000,
           CAST(coalesce(1000 * a.maxc // a.total, 0) AS BIGINT) AS top_bigram_x1000,
           CAST(coalesce(1000 * (a.total - a.ndist) // a.total, 0) AS BIGINT) AS dup_bigram_x1000,
           CAST(CASE WHEN coalesce(1000 * a.maxc // a.total, 0) >= 180
                     OR (CASE WHEN b.n_toks = 0 THEN 0
                         ELSE 1000 * b.n_distinct // b.n_toks END) <= 300
                THEN 1 ELSE 0 END AS BIGINT) AS repetitive
         FROM base b LEFT JOIN bga a USING (doc_id) ORDER BY b.doc_id""",
    "q26_token_stats" ->
      """SELECT doc_id,
           CAST(len(list_filter(string_split(text,' '), x -> x <> '')) AS BIGINT) AS n_tokens,
           CAST(len(list_filter(regexp_split_to_array(text, '[aeiou ]+'), x -> x <> '')) AS BIGINT) AS n_subwords,
           CAST(length(text) AS BIGINT) AS len
         FROM documents ORDER BY doc_id""",
    "q46_pii_redact" ->
      """WITH raw AS (
           SELECT doc_id,
             text || CASE WHEN doc_id % 3 <> 0
               THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@mail.example.com' ELSE '' END
             || CASE WHEN doc_id % 2 = 0
               THEN ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
             || CASE WHEN doc_id % 5 = 0
               THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.' || CAST(doc_id % 100 AS VARCHAR) ELSE '' END
             AS t FROM documents)
         SELECT doc_id,
           CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(t, '\+1-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones,
           CAST(len(regexp_extract_all(t, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS BIGINT) AS n_ips,
           regexp_replace(regexp_replace(regexp_replace(t,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\+1-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g'),
             '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g') AS redacted
         FROM raw ORDER BY doc_id""")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q20_dedup_exact" -> q20DedupExact _,
    "q21_ngram_jaccard" -> q21NgramJaccard _,
    "q22_minhash_lsh" -> q22MinhashLsh _,
    "q28_minhash_verify" -> q28MinhashVerify _,
    "q29_dedup_clusters" -> q29DedupClusters _,
    "q37_decontaminate" -> q37Decontaminate _,
    "q38_train_split" -> q38TrainSplit _,
    "q23_simhash" -> q23Simhash _,
    "q24_lang_id" -> q24LangId _,
    "q25_quality" -> q25Quality _,
    "q26_token_stats" -> q26TokenStats _,
    "q45_repetition" -> q45Repetition _,
    "q46_pii_redact" -> q46PiiRedact _,
    "q48_stratified_sample" -> q48StratifiedSample _,
    "q49_sequence_pack" -> q49SequencePack _,
    "q52_vocab" -> q52Vocab _,
    "q53_length_quantiles" -> q53LengthQuantiles _,
    "q55_dup_ngrams" -> q55DupNgrams _,
    "q57_release_pipeline" -> q57ReleasePipeline _,
    "q62_incremental_dedup" -> q62IncrementalDedup _,
    "q27_fingerprint" -> q27Fingerprint _)
}

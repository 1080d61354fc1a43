package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (embedding: array<float>).
  *
  * Cosine math runs on the native codegen'd [[graft.functions.VecDotExpr]]
  * dot product (a primitive float loop inlined into whole-stage codegen; the
  * `zip_with`+`aggregate` higher-order form it replaced is CodegenFallback —
  * an interpreted lambda per element — and dominated the vector pack's
  * runtime). Its left-to-right double accumulation is fold-order-identical
  * to the higher-order form. Oracles compute the same double-precision
  * arithmetic explicitly in DuckDB (generate_series element join) and
  * compare ROUNDED integers only.
  */
object VectorOps {

  private def emb(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  private def dot(a: Column, b: Column): Column =
    graft.functions.VecExprs.vec_dot(a, b)

  private def norm(a: Column): Column = sqrt(dot(a, a))

  private def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))


  /** Embedding-cosine near-duplicate pairs (brute-force; the LSH-bucketed
    * variant below is the scale path). Output: pair ids + cosine ×10⁴.
    */
  /** Rows per broadcast block in [[q30CosineNearDup]]: bounds driver+executor
    * memory per pass regardless of table size (64-dim floats ⇒ ~70 MB/block).
    */
  private val CosineBlockRows = 250000L

  def q30CosineNearDup(s: SparkSession, dir: String): DataFrame = {
    // Block-nested all-pairs: the broadcast side is CHUNKED — an outer loop
    // over K driver-bounded blocks (block k = rows with vec_id % K == k),
    // each collected, normalized, broadcast, and streamed against the full
    // table with tight primitive-float loops. Driver and executors hold one
    // block at a time, so the kernel works at any table size (K grows with
    // the data; each pass is a full scan — the unavoidable cost of EXACT
    // all-pairs; the LSH variant q32 is the sub-linear path). Round 1
    // collected the WHOLE table to the driver — correct at sf0.1, dead at
    // scale. A naive self-join carried the arrays through UnsafeRow→boxed-Seq
    // conversion per pair: ~12 s for 125k pairs vs ~0.1 s for this kernel.
    import s.implicits._
    val rows = emb(s, dir).select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
    val total = rows.count()
    val nBlocks = math.max(1L, (total + CosineBlockRows - 1) / CosineBlockRows).toInt
    val blocks = (0 until nBlocks).map { k =>
      val side = rows.filter(col("vec_id") % nBlocks === k)
        .collect().sortBy(_._1)
        .map { case (id, a) =>
          var n = 0.0; var i = 0
          while (i < a.length) { n += a(i).toDouble * a(i); i += 1 }
          (id, a, math.sqrt(n))
        }
      val bc = s.sparkContext.broadcast(side)
      // each pass materializes its (tiny, filtered) pair output eagerly so
      // the block's broadcast can be destroyed before the next pass begins —
      // the executors hold ONE block at a time; only the surviving pairs
      // (not the vectors) accumulate across passes
      val part = rows.mapPartitions { it =>
        val blk = bc.value
        it.flatMap { case (ida, a) =>
          var na = 0.0; var i = 0
          while (i < a.length) { na += a(i).toDouble * a(i); i += 1 }
          val nA = math.sqrt(na)
          blk.iterator.filter(_._1 > ida).flatMap { case (idb, b, nB) =>
            var d = 0.0; var j = 0
            val n = math.min(a.length, b.length)
            while (j < n) { d += a(j).toDouble * b(j); j += 1 }
            val cos = d / (nA * nB)
            if (cos >= 0.35) Some((ida, idb, math.round(cos * 10000))) else None
          }
        }
      }.toDF("vec_a", "vec_b", "cos_x10000").localCheckpoint(true)
      bc.destroy()
      part
    }
    blocks.reduce(_ unionByName _).orderBy(col("vec_a"), col("vec_b"))
  }

  /** Brute-force cosine top-k for one query vector (vec_id = 0) — the exact
    * ANN baseline. Broadcast the single-row query side.
    */
  def q31AnnTopk(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val q = broadcast(e.filter(col("vec_id") === 0)
      .select(col("embedding").as("qe")))
    e.filter(col("vec_id") =!= 0)
      .crossJoin(q)
      .withColumn("cos", cosine(col("embedding"), col("qe")))
      .select(col("vec_id"), round(col("cos") * 10000).cast("long").as("cos_x10000"))
      .orderBy(col("cos_x10000").desc, col("vec_id").asc)
      .limit(10)
  }

  /** Random-hyperplane LSH bucketing — the ANN scale path. 8 hyperplanes with
    * portable integer weights w(i,j) = ((i*31 + j*17) mod 7) - 3 give a
    * deterministic 8-bit bucket per vector. MULTI-PROBE: the query probes its
    * own bucket plus the 8 buckets at Hamming distance 1 (one sign bit
    * flipped) — the standard recall fix for vectors that land near a
    * hyperplane boundary, recovering most single-probe misses while still
    * scanning only 9/256 of the table. Candidate generation stays a
    * hash-partitioned equi-join: the broadcast query side is exploded into
    * its 9 probe buckets, so at 10^9 vectors no full scan ever happens.
    */
  def q32AnnLsh(s: SparkSession, dir: String): DataFrame = {
    // one 8-plane band of the quantized-integer signature family — the
    // projections are exact integer sums, so the bucket is portable to the
    // oracle regardless of summation order (the double-precision fold this
    // replaced could flip a near-zero projection's sign between engines)
    val bucketed = emb(s, dir)
      .withColumn("bucket", element_at(
        graft.functions.VecExprs.vec_lsh_bits(col("embedding"), 1, 8), 1))
    val q = broadcast(bucketed.filter(col("vec_id") === 0)
      .select(col("embedding").as("qe"), col("bucket").as("qbucket"))
      .withColumn("probe", explode(array(
        (lit(0L) +: (0 until 8).map(j => lit(1L << j)))
          .map(m => col("qbucket").bitwiseXOR(m)): _*)))
      .select(col("qe"), col("probe")))
    bucketed
      .join(q, col("bucket") === col("probe"))
      .filter(col("vec_id") =!= 0)
      .withColumn("cos", cosine(col("embedding"), col("qe")))
      .select(col("vec_id"), col("bucket"),
        round(col("cos") * 10000).cast("long").as("cos_x10000"))
      .orderBy(col("cos_x10000").desc, col("vec_id").asc)
      .limit(10)
  }

  /** Fixed-point scale for the LSH projections: embedding floats are
    * quantized to round(x·2²⁰) BIGINTs, so each projection is an INTEGER
    * sum — exact, associative, and therefore identical regardless of
    * aggregation order. That makes the sign bits portable across Spark and
    * DuckDB's hash aggregate (a double-precision sum is order-dependent, and
    * a near-zero projection could flip a bucket bit between engines).
    * float→double is exact, ·2²⁰ is exact (power of two), and
    * |Σ qx·w| ≤ 64·3·2²⁰·max|x| keeps far inside BIGINT range.
    */
  private val ProjScale = graft.functions.VecMath.ProjScale

  /** Banded random-hyperplane signature rows `(vec_id, band, bits)` —
    * `bands` × `planesPerBand` hyperplanes total, plane j's portable integer
    * weights w(i,j) = ((i·31 + j·17) mod 7) − 3 (the same deterministic
    * family as [[q32AnnLsh]], applied to [[ProjScale]]-quantized inputs).
    * Band t packs the sign bits of planes [t·r, t·r+r) into an r-bit value;
    * the output is byte-free (no embeddings carried into the candidate join).
    * The whole signature is ONE native codegen'd expression per row
    * ([[graft.functions.VecLshBitsExpr]]) — a pure map, no shuffle, and a
    * 3-node plan. The two shapes this replaced both lost at bench scale: the
    * per-plane `aggregate(zip_with(...))` fold paid b·r interpreted lambdas
    * per row, and a b·r-column hash aggregate paid ~10 s of one-time janino
    * compile for its generated update method.
    */
  private def bandedSignature(e: DataFrame, bands: Int, planesPerBand: Int): DataFrame =
    e.select(col("vec_id"),
      posexplode(graft.functions.VecExprs.vec_lsh_bits(
        col("embedding"), bands, planesPerBand)).as(Seq("band", "bits")))

  /** Embedding near-dup at scale: banded-LSH candidates → EXACT cosine
    * verify — the vector twin of the MinHash sketch-then-verify pipeline
    * (q28), with the same b-bands × r-planes knob set as q22's 32×4 MinHash
    * banding. A pair is a candidate when any band's r sign bits collide, so
    * for random vectors the expected candidate volume is b·n²/2^r (2^r
    * buckets per band) and pair recall at plane-agreement probability
    * p = 1 − θ/π follows the standard S-curve 1 − (1 − p^r)^b: r is the
    * VOLUME knob, b the RECALL knob. The driver query runs 16 bands × 8
    * planes: at the true near-dup threshold cos ≥ 0.9 (p ≈ 0.856) that is
    * 1 − (1 − p⁸)¹⁶ ≈ 0.996 recall, while candidates stay ≈ b·n²/2⁸ per
    * band-bucket space instead of round 2's b·n²/2⁴ (r = 4 admitted HALF of
    * all pairs at bench scale — the verify stage, not the banding, was doing
    * the work). At 10^9 vectors the same code runs r = 24–32 (16M–4G buckets
    * per band ⇒ per-band candidates n²/2^r ≈ linear-ish) with b sized to the
    * dedup threshold's recall target. Only candidate pairs — joined back to
    * the embeddings by id — pay the exact dot product; the candidate join
    * itself carries 20-byte rows. The brute-force q30 is the small-scale
    * exact baseline; THIS is the plan that survives 10^9 vectors.
    */
  def cosineLshVerify(e: DataFrame, bands: Int, planesPerBand: Int,
      minCos: Double, hotBucketCap: Int = 1024): DataFrame =
    cosineLshVerifyPairs(e, bands, planesPerBand, minCos, hotBucketCap)
      .orderBy(col("vec_a"), col("vec_b"))

  /** [[cosineLshVerify]] without the final presentation sort — the shape
    * consumers that re-shuffle anyway (q36's CC, q64's per-key window)
    * build on, so no global sort is paid just to be thrown away.
    */
  private def cosineLshVerifyPairs(e: DataFrame, bands: Int, planesPerBand: Int,
      minCos: Double, hotBucketCap: Int = 1024): DataFrame = {
    // cached: the signature feeds the hot-bucket aggregate AND both sides of
    // the candidate self-join — without it the projection aggregate runs 3×
    val sig = bandedSignature(e, bands, planesPerBand).cache()
    // hot-bucket guard (the same posture as the MinHash df-cap and the
    // phash-suppression guard): a band bucket holding > cap vectors would
    // contribute cap²+ candidate pairs on its own — the classic LSH
    // hot-bucket quadratic failure under clustered/adversarial data. Such
    // buckets are dropped from candidate generation; the hot set is bounded
    // by n/cap rows (and by the b·2^r bucket space), so its anti-join side
    // broadcasts. Sized to bind only on skew at the oracle scales: the cap
    // is a skew guard, not a sampling knob — r is the volume knob.
    val hot = sig.groupBy(col("band"), col("bits"))
      .agg(count(lit(1)).as("c")).filter(col("c") > hotBucketCap)
      .select(col("band"), col("bits"))
    val kept = sig.join(broadcast(hot), Seq("band", "bits"), "left_anti")
    val cand = kept.as("a").join(kept.as("b"),
        col("a.band") === col("b.band") && col("a.bits") === col("b.bits") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .distinct()
    val ea = e.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a"))
    val eb = e.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b"))
    cand.join(ea, Seq("vec_a")).join(eb, Seq("vec_b"))
      .withColumn("cos", cosine(col("emb_a"), col("emb_b")))
      .filter(col("cos") >= minCos)
      .select(col("vec_a"), col("vec_b"),
        round(col("cos") * 10000).cast("long").as("cos_x10000"))
  }

  /** q35's banding knobs — shared by the Spark plan and the oracle SQL so
    * the two can never drift. 16×8 = 128 hyperplanes (matching q22's 128
    * MinHash permutations in spirit: same sketch budget, same band count
    * order of magnitude).
    */
  private[graft] val Q35Bands = 16
  private[graft] val Q35PlanesPerBand = 8

  def q35CosineLshVerify(s: SparkSession, dir: String): DataFrame =
    cosineLshVerify(emb(s, dir), bands = Q35Bands, planesPerBand = Q35PlanesPerBand,
      minCos = 0.35)

  /** Vector duplicate-CLUSTER assignment — the q29 twin on embeddings:
    * connected components over q35's verified near-dup pairs, cluster id =
    * component-min vec_id, one keeper per cluster. Same star-contraction
    * operator ([[GraphOps.connectedComponents]]), same transitive-dup
    * rationale: "drop all but one per group" is a component decision, not a
    * pair decision.
    */
  def q36VectorClusters(s: SparkSession, dir: String): DataFrame = {
    val pairs = cosineLshVerifyPairs(emb(s, dir), bands = Q35Bands,
      planesPerBand = Q35PlanesPerBand, minCos = 0.35)
      .select(col("vec_a").as("a"), col("vec_b").as("b"))
    GraphOps.connectedComponents(pairs)
      .select(col("node").as("vec_id"), col("cluster"),
        when(col("node") === col("cluster"), 1L).otherwise(0L).as("keep"))
      .orderBy(col("vec_id"))
  }

  /** q64: distributed k-NN JOIN — every vector gets its top-k nearest
    * neighbors in one pass, the shape semantic dedup / retrieval-eval /
    * cluster-seeding pipelines actually run (the single-query probes
    * q31/q32/q34/q56 answer "find matches for THIS vector"; a corpus
    * release needs "for EVERY vector"). Built on the same banded-LSH
    * sketch-then-verify machinery as q35: candidates come from band-bucket
    * equi-joins (never all pairs), only candidates pay the exact cosine,
    * and the per-vector top-k is a window partitioned BY vec_id — millions
    * of independent partitions, each a handful of candidate rows, never a
    * global sort. Mirroring the a<b pairs into both directions is a pure
    * map. Ranking compares the ×10⁴-rounded integer cosine (ties to the
    * lower neighbor id) so both engines rank identical values. At 10^9
    * vectors the knobs move exactly as q35's scaladoc lays out (r grows
    * with log n, b with the recall target); the plan shape is unchanged.
    */
  def q64KnnJoin(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val verified = cosineLshVerifyPairs(emb(s, dir), bands = Q35Bands,
      planesPerBand = Q35PlanesPerBand, minCos = 0.35)
    val sym = verified.select(
        col("vec_a").as("vec_id"), col("vec_b").as("neighbor"), col("cos_x10000"))
      .unionByName(verified.select(
        col("vec_b").as("vec_id"), col("vec_a").as("neighbor"), col("cos_x10000")))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos_x10000").desc, col("neighbor").asc)
    sym.withColumn("nb_rank", row_number().over(w).cast("long"))
      .filter(col("nb_rank") <= 3)
      .select(col("vec_id"), col("nb_rank"), col("neighbor"), col("cos_x10000"))
      .orderBy(col("vec_id"), col("nb_rank"))
  }

  /** IVF (inverted-file) search — assignment + probe, the step beyond the
    * [[q33Centroids]] build. The per-label mean centroids act as the coarse
    * quantizer (k lists): every vector is assigned to its nearest centroid
    * by squared L2 — a pure MAP-side argmin over broadcast-sized centroid
    * literals, no shuffle — and the query scans only its `nprobe`=2 nearest
    * lists, exact-cosine re-ranked. At 10^9 vectors this is the real IVF
    * shape: centroids are always driver/broadcast-sized, assignment is
    * embarrassingly parallel, and the probed lists are ~nprobe/k of the
    * table.
    */
  def q34IvfSearch(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    // build: per-label mean centroids (map-side-combinable agg, k×64 rows)
    val cent: Array[(Int, Array[Double])] = e
      .select(col("label"), posexplode(col("embedding")).as(Seq("i", "x")))
      .groupBy(col("label"), col("i"))
      .agg(avg(col("x").cast("double")).as("c"))
      .collect()
      .groupBy(_.getInt(0))
      .map { case (lbl, rows) =>
        val v = new Array[Double](rows.map(_.getInt(1)).max + 1)
        rows.foreach(r => v(r.getInt(1)) = r.getDouble(2))
        lbl -> v
      }
      .toArray.sortBy(_._1)
    // assignment: native argmin kernel over the k×d double centroid matrix
    // (ONE constant operand — flat in k, like q54/q56's integer twin); ties
    // break to the lower label, matching the oracle's ORDER BY. d2 is
    // ROUNDED to a fixed integer scale (×10⁶) in BOTH engines before the
    // argmin: the kernel folds the 64 dims sequentially (bit-identical to
    // the aggregate(zip_with(...)) chain it replaced) while DuckDB's hash
    // agg sums in arbitrary order, and non-associative FP addition could
    // otherwise flip the cluster pick for near-equidistant vectors.
    val best = graft.functions.VecExprs.vec_argmin_d2d(col("embedding"), cent)
    val assigned = e.withColumn("cluster", best.getField("cluster"))
    // probe selection for the query vector (vec_id = 0), driver-side —
    // same ×10⁶ rounding as the distributed assignment
    val qEmb: Array[Float] = e.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    val probes: Seq[Int] = cent.map { case (lbl, c) =>
      (math.round(c.indices.map(i =>
        (qEmb(i).toDouble - c(i)) * (qEmb(i).toDouble - c(i))).sum * 1e6), lbl)
    }.sorted.take(2).map(_._2).toSeq
    val q = broadcast(e.filter(col("vec_id") === 0)
      .select(col("embedding").as("qe")))
    assigned
      .filter(col("cluster").isin(probes: _*) && col("vec_id") =!= 0)
      .crossJoin(q)
      .withColumn("cos", cosine(col("embedding"), col("qe")))
      .select(col("vec_id"), col("cluster"),
        round(col("cos") * 10000).cast("long").as("cos_x10000"))
      .orderBy(col("cos_x10000").desc, col("vec_id").asc)
      .limit(10)
  }

  /** q47: symmetric int8 quantization of the embedding column — the 4×
    * storage compression a 100 TB embedding store runs before indexing
    * (scale = max|x|/127 per vector, qᵢ = round(xᵢ/scale) ∈ [−127, 127]).
    * Pure per-row map over the array (higher-order transform/aggregate —
    * no shuffle, no explode: one output row per input row, so at 10⁹
    * vectors this rides the scan). Portability: float→double is exact,
    * max|x| is comparison-based (order-free), scale and xᵢ/scale are single
    * IEEE divisions, and the published aggregates (Σq, Σq², min, max) are
    * INTEGER sums — associative, so DuckDB's arbitrary-order aggregation
    * matches Spark's sequential fold bit-for-bit.
    */
  def q47QuantizeInt8(s: SparkSession, dir: String): DataFrame =
    // the whole per-vector summary is ONE codegen'd kernel call
    // (graft.functions.VecMath.quantizeInt8) — the higher-order
    // transform/aggregate chain it replaced was CodegenFallback and paid an
    // interpreted lambda per element; values are bit-identical (exact
    // casts, comparison max, roundHalfAway == both engines' round, integer
    // sums), so the oracle is unchanged
    emb(s, dir)
      .select(col("vec_id"),
        graft.functions.VecExprs.vec_quantize_int8(col("embedding")).as("qz"))
      .select(col("vec_id"), col("qz.scale_x1e9").as("scale_x1e9"),
        col("qz.q_sum").as("q_sum"), col("qz.q_sq_sum").as("q_sq_sum"),
        col("qz.q_min").as("q_min"), col("qz.q_max").as("q_max"))
      .orderBy(col("vec_id"))

  /** Per-label centroid stats — the IVF coarse-quantizer building block:
    * one map-side-combinable aggregation producing k centroids. Output is
    * rounded centroid L2 norms (portable integers).
    */
  def q33Centroids(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    // sum element-wise via posexplode: (label, i) partial sums — exactly the
    // shape a 1000-executor IVF build uses (combine per partition, one shuffle).
    e.select(col("label"), posexplode(col("embedding")).as(Seq("i", "x")))
      .groupBy(col("label"), col("i"))
      .agg(sum(col("x").cast("double")).as("sx"), count(lit(1)).as("cnt"))
      .withColumn("c", col("sx") / col("cnt"))
      .groupBy(col("label"))
      .agg(round(sqrt(sum(col("c") * col("c"))) * 1000).cast("long").as("centroid_norm_x1000"),
        max(col("cnt")).as("n_vectors"))
      .orderBy(col("label"))
  }

  /** Full k-means Lloyd training — the IVF-training fixed-point that
    * q33 (one centroid step) and q34 (search over trained lists) bracket.
    * Each of the `iters` rounds is the canonical 1000-executor k-means
    * shape: ship the k×64 centroid matrix as ONE constant operand of the
    * native argmin kernel (k·d longs on the driver regardless of table
    * size; plan and codegen flat in k), map-side integer-d² argmin
    * assignment, then ONE map-side-combinable (cluster, dim) partial-sum
    * shuffle to recompute means. Per round: 1 shuffle + a k·d-bounded
    * collect — no per-row driver traffic, no iteration-count blowup.
    *
    * Arithmetic is all-integer so every round is bit-portable across
    * engines: coordinates quantize ONCE to ×10⁶ longs, centroid means use
    * truncating integer division (`div` == DuckDB `//`), d² is a sum of
    * long squares (order-independent, unlike FP whose summation order can
    * flip an argmin between near-equidistant centroids and then compound
    * across rounds). Init = per-label integer means (deterministic seed
    * partition, as in q33). Ties break to the lower cluster id.
    */
  def kmeansLloyd(e: DataFrame, iters: Int): DataFrame = {
    val (xq, cent) = lloydTrain(e, iters)
    lloydAssign(xq, cent).groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_vectors"), sum(col("d2")).as("inertia"))
      .orderBy(col("cluster"))
  }

  /** The Lloyd trainer behind [[kmeansLloyd]] and [[q56IvfTrainedSearch]]:
    * the once-quantized (×10⁶ long) table plus the trained centroids after
    * `iters` assign+recompute rounds (init = per-label integer means).
    * Centroid arrays are k·d-bounded driver values by construction — they
    * re-enter every plan as ONE constant matrix operand of the native
    * argmin kernel, never as a joined table or as k plan literals.
    */
  private[graft] def lloydTrain(
      e: DataFrame, iters: Int): (DataFrame, Array[(Int, Array[Long])]) =
    lloydTrainInit(e, iters, col("label").cast("int"))

  /** k-parameterized trainer — k past any label count: deterministic init
    * cluster = vec_id mod k. Exercised at k=64 in VecExprsSpec to pin that
    * the assignment plan is flat in k (the k-as-plan-literals shape this
    * replaced broke down as k approached production IVF list counts).
    */
  private[graft] def lloydTrainK(
      e: DataFrame, iters: Int, k: Int): (DataFrame, Array[(Int, Array[Long])]) =
    lloydTrainInit(e, iters, pmod(col("vec_id"), lit(k.toLong)).cast("int"))

  private def lloydTrainInit(e: DataFrame, iters: Int,
      initCluster: Column): (DataFrame, Array[(Int, Array[Long])]) = {
    val xq = e.select(col("vec_id"), col("label"),
        graft.functions.VecExprs.vec_quantize_fixed(col("embedding"), 1e6).as("xq"))
      .localCheckpoint(true) // quantize once; every round re-reads this
    var cent = lloydCentroids(xq.select(col("vec_id"), col("xq"),
      initCluster.as("cluster")))
    for (_ <- 1 to iters) cent = lloydCentroids(lloydAssign(xq, cent))
    (xq, cent)
  }

  /** (cluster, dim) truncating integer means; k×64 rows — bounded by k·d,
    * never by table size.
    */
  private def lloydCentroids(assigned: DataFrame): Array[(Int, Array[Long])] =
    assigned.select(col("cluster"), posexplode(col("xq")).as(Seq("i", "x")))
      .groupBy(col("cluster"), col("i"))
      .agg(expr("sum(x) div count(1)").as("cq"))
      .collect()
      .groupBy(_.getInt(0))
      .map { case (cl, rows) =>
        val v = new Array[Long](rows.map(_.getInt(1)).max + 1)
        rows.foreach(r => v(r.getInt(1)) = r.getLong(2))
        cl -> v
      }
      .toArray.sortBy(_._1)

  /** Map-side integer-d² argmin assignment of `xq` rows against the k×d
    * centroid matrix — ONE native kernel call per row
    * ([[graft.functions.VecArgminD2Expr]]): the matrix is a single constant
    * operand, the compiled loop runs k·d integer ops, and plan/codegen size
    * is flat in k (the `array_min(array(struct...))` shape it replaces
    * embedded k struct literals evaluated via interpreted
    * `zip_with`/`aggregate` lambdas — wrong at production IVF k). Ties
    * break to the lower cluster id, matching the oracle's
    * ORDER BY d2, cluster.
    */
  private[graft] def lloydAssign(
      xq: DataFrame, cent: Array[(Int, Array[Long])]): DataFrame = {
    val best = graft.functions.VecExprs.vec_argmin_d2(col("xq"), cent)
    xq.select(col("vec_id"), col("xq"),
      best.getField("cluster").as("cluster"), best.getField("d2").as("d2"))
  }

  /** 2 Lloyd rounds + final assignment; per-cluster sizes and integer
    * inertia. Oracle = the identical integer recurrence unrolled as a CTE
    * chain (c0 → a1 → c1 → a2 → c2 → a3).
    */
  def q54KmeansLloyd(s: SparkSession, dir: String): DataFrame =
    kmeansLloyd(emb(s, dir), iters = 2)

  /** q56: the closed train-then-index IVF loop — search over the centroids
    * q54 TRAINS (2 Lloyd rounds), not the per-label stand-in quantizer q34
    * probes. Production shape end-to-end: train once (per round: broadcast
    * k×d literals → map argmin → one combinable shuffle), then one pure-map
    * assignment pass over the table that CARRIES the raw embedding (no join
    * back to fetch payloads), probe the query's nprobe=2 nearest trained
    * lists, exact-cosine re-rank only those ~nprobe/k of the rows. All
    * list-selection arithmetic is the same ×10⁶ integer fixed-point as the
    * trainer, so both engines pick identical probes; only the final cosine
    * is FP, rounded ×10⁴ like q31/q34. Oracle = q54's CTE chain extended by
    * assignment-under-c2, probe and re-rank stages.
    */
  def q56IvfTrainedSearch(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val (xq, cent) = lloydTrain(e, iters = 2)
    // query = vec_id 0; probe pick is k-bounded driver math on the SAME
    // quantized coordinates the trainer used
    val q0: Array[Long] = xq.filter(col("vec_id") === 0)
      .select(col("xq")).head().getSeq[Long](0).toArray
    val probes: Seq[Int] = cent.map { case (cl, c) =>
      (c.indices.map { i => val d = q0(i) - c(i); d * d }.sum, cl)
    }.sorted.take(2).map(_._2).toSeq
    // assignment carrying the payload: one map over the scan (native
    // quantize + argmin kernels — the centroid matrix is one constant
    // operand, flat in k), then filter to the probed lists before any
    // expensive work
    val best = graft.functions.VecExprs.vec_argmin_d2(
      graft.functions.VecExprs.vec_quantize_fixed(col("embedding"), 1e6), cent)
    val q = broadcast(e.filter(col("vec_id") === 0)
      .select(col("embedding").as("qe")))
    e.withColumn("cluster", best.getField("cluster"))
      .filter(col("cluster").isin(probes: _*) && col("vec_id") =!= 0)
      .crossJoin(q)
      .withColumn("cos", cosine(col("embedding"), col("qe")))
      .select(col("vec_id"), col("cluster"),
        round(col("cos") * 10000).cast("long").as("cos_x10000"))
      .orderBy(col("cos_x10000").desc, col("vec_id").asc)
      .limit(10)
  }

  /** q59: measured recall@10 of every approximate ANN index in the pack —
    * the number a production indexing pipeline actually tunes nprobe/bands
    * against, asserted by a gate instead of claimed. Joins each approximate
    * top-10 (q32 LSH multi-probe, q34 per-label IVF, q56 trained IVF)
    * against the exact brute-force top-10 (q31) and emits integer hits +
    * recall×1000 per index. The left join from the literal index-name
    * relation keeps a 0-hit index visible as an explicit 0 row (both
    * engines), not a silently missing group. Cost shape: three index probes
    * + one 10-row broadcast join — the exact side is the only full scan,
    * and it is the measurement's definition, not pipeline overhead.
    */
  def q59AnnRecall(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val exact = q31AnnTopk(s, dir).select(col("vec_id"))
    def ids(name: String, df: DataFrame): DataFrame =
      df.select(lit(name).as("index_name"), col("vec_id"))
    // The three index BUILDS are independent, and two of them run eager
    // driver-coordinated work before their plan exists (q34 collects its
    // k×d centroid matrix; q56 runs the Lloyd trainer's per-round
    // collect/checkpoint loop). Submitting them from separate threads lets
    // those jobs overlap on the (FAIR-scheduled) executors instead of
    // serializing through the driver — the guide's "overlap independent
    // jobs" pattern; result assembly below is unchanged and deterministic.
    val f34 = Future(ids("ivf_label", q34IvfSearch(s, dir)))
    val f56 = Future(ids("ivf_trained", q56IvfTrainedSearch(s, dir)))
    val f32 = Future(ids("lsh_multiprobe", q32AnnLsh(s, dir)))
    val approx = Await.result(f34, Duration.Inf)
      .unionByName(Await.result(f56, Duration.Inf))
      .unionByName(Await.result(f32, Duration.Inf))
    val hits = approx.join(broadcast(exact), Seq("vec_id"))
      .groupBy(col("index_name")).agg(count(lit(1)).as("hits"))
    val names = Seq("ivf_label", "ivf_trained", "lsh_multiprobe").toDF("index_name")
    names.join(hits, Seq("index_name"), "left")
      .select(col("index_name"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        (coalesce(col("hits"), lit(0L)) * 100).as("recall_x1000"))
      .orderBy(col("index_name"))
  }

  /** One Lloyd assign+recompute CTE pair: assignment `aN` under centroids
    * `cPrev`, then recomputed centroids `cN`.
    */
  private def lloydRoundSql(aN: String, cPrev: String, cN: String): String =
    s"""$aN AS (SELECT vec_id, cluster FROM (
           SELECT x.vec_id, c.cluster,
             ROW_NUMBER() OVER (PARTITION BY x.vec_id
               ORDER BY SUM((x.x - c.cq) * (x.x - c.cq)), c.cluster) AS rn
           FROM xq x JOIN $cPrev c USING (i) GROUP BY 1, 2)
         WHERE rn = 1),
       $cN AS (SELECT a.cluster, x.i, CAST(SUM(x.x) // COUNT(*) AS BIGINT) AS cq
               FROM xq x JOIN $aN a USING (vec_id) GROUP BY 1, 2)"""

  private val baseOracle: Map[String, String] = Map(
    "q54_kmeans_lloyd" ->
      s"""WITH xq AS (
           SELECT vec_id, label, i,
             CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS x
           FROM embeddings, generate_series(1, 64) AS g(i)),
         c0 AS (SELECT label AS cluster, i, CAST(SUM(x) // COUNT(*) AS BIGINT) AS cq
                FROM xq GROUP BY 1, 2),
         ${lloydRoundSql("a1", "c0", "c1")},
         ${lloydRoundSql("a2", "c1", "c2")},
         a3 AS (SELECT vec_id, cluster, d2 FROM (
             SELECT x.vec_id, c.cluster,
               SUM((x.x - c.cq) * (x.x - c.cq)) AS d2,
               ROW_NUMBER() OVER (PARTITION BY x.vec_id
                 ORDER BY SUM((x.x - c.cq) * (x.x - c.cq)), c.cluster) AS rn
             FROM xq x JOIN c2 c USING (i) GROUP BY 1, 2)
           WHERE rn = 1)
         SELECT cluster, COUNT(*) AS n_vectors, CAST(SUM(d2) AS BIGINT) AS inertia
         FROM a3 GROUP BY 1 ORDER BY 1""",
    "q56_ivf_trained_search" ->
      s"""WITH xq AS (
           SELECT vec_id, label, i,
             CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS x
           FROM embeddings, generate_series(1, 64) AS g(i)),
         c0 AS (SELECT label AS cluster, i, CAST(SUM(x) // COUNT(*) AS BIGINT) AS cq
                FROM xq GROUP BY 1, 2),
         ${lloydRoundSql("a1", "c0", "c1")},
         ${lloydRoundSql("a2", "c1", "c2")},
         ${lloydRoundSql("a3", "c2", "c3")},
         probe AS (
           SELECT cluster FROM (
             SELECT c.cluster, SUM((x.x - c.cq) * (x.x - c.cq)) AS d2
             FROM xq x JOIN c2 c USING (i) WHERE x.vec_id = 0 GROUP BY 1)
           ORDER BY d2, cluster LIMIT 2),
         ex AS (
           SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
           FROM embeddings, generate_series(1, 64) AS g(i)),
         nrm AS (SELECT vec_id, sqrt(sum(x*x)) AS nn FROM ex GROUP BY 1),
         dots AS (
           SELECT e.vec_id, SUM(e.x * q.x) AS d
           FROM ex e JOIN ex q ON e.i = q.i AND q.vec_id = 0
           WHERE e.vec_id <> 0 GROUP BY 1)
         SELECT a.vec_id, a.cluster,
           CAST(ROUND(10000.0 * d.d /
                (n.nn * (SELECT nn FROM nrm WHERE vec_id = 0))) AS BIGINT) AS cos_x10000
         FROM a3 a
         JOIN dots d ON d.vec_id = a.vec_id
         JOIN nrm n ON n.vec_id = a.vec_id
         WHERE a.cluster IN (SELECT cluster FROM probe) AND a.vec_id <> 0
         ORDER BY cos_x10000 DESC, a.vec_id ASC LIMIT 10""",
    "q30_cosine_near_dup" ->
      """WITH ex AS (
           SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
           FROM embeddings, generate_series(1, 64) AS g(i)),
         nrm AS (SELECT vec_id, sqrt(sum(x*x)) AS nn FROM ex GROUP BY 1),
         dots AS (
           SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, sum(a.x*b.x) AS d
           FROM ex a JOIN ex b ON a.i = b.i AND a.vec_id < b.vec_id
           GROUP BY 1,2)
         SELECT vec_a, vec_b,
           CAST(ROUND(10000.0 * d / (na.nn * nb.nn)) AS BIGINT) AS cos_x10000
         FROM dots JOIN nrm na ON na.vec_id = vec_a JOIN nrm nb ON nb.vec_id = vec_b
         WHERE d / (na.nn * nb.nn) >= 0.35
         ORDER BY vec_a, vec_b""",
    "q31_ann_topk" ->
      """WITH ex AS (
           SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
           FROM embeddings, generate_series(1, 64) AS g(i)),
         nrm AS (SELECT vec_id, sqrt(sum(x*x)) AS nn FROM ex GROUP BY 1),
         q AS (SELECT i, x FROM ex WHERE vec_id = 0),
         dots AS (
           SELECT e.vec_id, sum(e.x * q.x) AS d
           FROM ex e JOIN q ON e.i = q.i WHERE e.vec_id <> 0 GROUP BY 1)
         SELECT d.vec_id,
           CAST(ROUND(10000.0 * d / (nn * (SELECT nn FROM nrm WHERE vec_id = 0))) AS BIGINT) AS cos_x10000
         FROM dots d JOIN nrm ON nrm.vec_id = d.vec_id
         ORDER BY cos_x10000 DESC, d.vec_id ASC LIMIT 10""",
    "q32_ann_lsh" ->
      """WITH ex AS (
           SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
           FROM embeddings, generate_series(1, 64) AS g(i)),
         proj AS (
           SELECT vec_id, j,
             SUM(CAST(ROUND(x * 1048576) AS BIGINT) * (((((i-1)*31 + j*17) % 7) - 3))) AS p
           FROM ex CROSS JOIN generate_series(0, 7) AS jj(j) GROUP BY 1, 2),
         bucket AS (
           SELECT vec_id, CAST(SUM(CASE WHEN p >= 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS bucket
           FROM proj GROUP BY 1),
         nrm AS (SELECT vec_id, sqrt(sum(x*x)) AS nn FROM ex GROUP BY 1),
         cand AS (
           SELECT b.vec_id, b.bucket FROM bucket b
           WHERE xor(b.bucket, (SELECT bucket FROM bucket WHERE vec_id = 0))
                 IN (0, 1, 2, 4, 8, 16, 32, 64, 128)
             AND b.vec_id <> 0),
         dots AS (
           SELECT e.vec_id, SUM(e.x * qe.x) AS d
           FROM ex e JOIN ex qe ON e.i = qe.i AND qe.vec_id = 0
           WHERE e.vec_id IN (SELECT vec_id FROM cand) GROUP BY 1)
         SELECT c.vec_id, c.bucket,
           CAST(ROUND(10000.0 * d / (nrm.nn * (SELECT nn FROM nrm WHERE vec_id = 0))) AS BIGINT) AS cos_x10000
         FROM cand c JOIN dots ON dots.vec_id = c.vec_id JOIN nrm ON nrm.vec_id = c.vec_id
         ORDER BY cos_x10000 DESC, c.vec_id ASC LIMIT 10""",
    "q33_centroids" ->
      """WITH ex AS (
           SELECT label, vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
           FROM embeddings, generate_series(1, 64) AS g(i)),
         c AS (
           SELECT label, i, SUM(x) / COUNT(*) AS c, COUNT(*) AS cnt
           FROM ex GROUP BY 1, 2)
         SELECT label, CAST(ROUND(sqrt(SUM(c*c)) * 1000) AS BIGINT) AS centroid_norm_x1000,
                MAX(cnt) AS n_vectors
         FROM c GROUP BY 1 ORDER BY 1""",
    "q34_ivf_search" ->
      """WITH ex AS (
           SELECT label, vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
           FROM embeddings, generate_series(1, 64) AS g(i)),
         c AS (SELECT label, i, AVG(x) AS c FROM ex GROUP BY 1, 2),
         d AS (
           SELECT e.vec_id, c.label, SUM((e.x - c.c) * (e.x - c.c)) AS d2
           FROM ex e JOIN c ON e.i = c.i GROUP BY 1, 2),
         assign AS (SELECT vec_id, label AS cluster FROM (
             SELECT vec_id, label,
                    ROW_NUMBER() OVER (PARTITION BY vec_id
                      ORDER BY CAST(ROUND(d2 * 1000000) AS BIGINT), label) AS rn
             FROM d) WHERE rn = 1),
         probe AS (SELECT label FROM d WHERE vec_id = 0
                   ORDER BY CAST(ROUND(d2 * 1000000) AS BIGINT), label LIMIT 2),
         nrm AS (SELECT vec_id, sqrt(SUM(x*x)) AS nn FROM ex GROUP BY 1),
         cand AS (
           SELECT vec_id, cluster FROM assign
           WHERE cluster IN (SELECT label FROM probe) AND vec_id <> 0),
         dots AS (
           SELECT e.vec_id, SUM(e.x * q.x) AS d
           FROM ex e JOIN ex q ON e.i = q.i AND q.vec_id = 0
           WHERE e.vec_id IN (SELECT vec_id FROM cand) GROUP BY 1)
         SELECT c.vec_id, c.cluster,
           CAST(ROUND(10000.0 * d / (nrm.nn * (SELECT nn FROM nrm WHERE vec_id = 0))) AS BIGINT) AS cos_x10000
         FROM cand c JOIN dots ON dots.vec_id = c.vec_id JOIN nrm ON nrm.vec_id = c.vec_id
         ORDER BY cos_x10000 DESC, c.vec_id ASC LIMIT 10""",
    "q35_cosine_lsh_verify" ->
      s"""WITH $lshVerifySqlCtes
         SELECT vec_a, vec_b, cos_x10000 FROM verified ORDER BY vec_a, vec_b""",
    "q64_knn_join" ->
      s"""WITH $lshVerifySqlCtes,
         sym AS (
           SELECT vec_a AS vec_id, vec_b AS neighbor, cos_x10000 FROM verified
           UNION ALL
           SELECT vec_b AS vec_id, vec_a AS neighbor, cos_x10000 FROM verified),
         ranked AS (
           SELECT vec_id, neighbor, cos_x10000,
             ROW_NUMBER() OVER (PARTITION BY vec_id
               ORDER BY cos_x10000 DESC, neighbor ASC) AS nb_rank
           FROM sym)
         SELECT vec_id, CAST(nb_rank AS BIGINT) AS nb_rank, neighbor, cos_x10000
         FROM ranked WHERE nb_rank <= 3 ORDER BY vec_id, nb_rank""",
    "q47_quantize_int8" ->
      """WITH ex AS (
           SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
           FROM embeddings, generate_series(1, 64) AS g(i)),
         m AS (SELECT vec_id, max(abs(x)) AS maxabs FROM ex GROUP BY 1),
         q AS (
           SELECT e.vec_id, m.maxabs,
             CASE WHEN m.maxabs = 0 THEN 0
                  ELSE CAST(round(e.x / (m.maxabs / 127.0)) AS BIGINT) END AS qi
           FROM ex e JOIN m USING (vec_id))
         SELECT vec_id,
           CAST(round((max(maxabs) / 127.0) * 1e9) AS BIGINT) AS scale_x1e9,
           CAST(SUM(qi) AS BIGINT) AS q_sum,
           CAST(SUM(qi*qi) AS BIGINT) AS q_sq_sum,
           CAST(MIN(qi) AS BIGINT) AS q_min,
           CAST(MAX(qi) AS BIGINT) AS q_max
         FROM q GROUP BY vec_id ORDER BY vec_id""",
    "q36_vector_clusters" ->
      s"""WITH RECURSIVE $lshVerifySqlCtes,
         edges AS (SELECT vec_a AS u, vec_b AS v FROM verified
                   UNION SELECT vec_b, vec_a FROM verified),
         reach(node, r) AS (
           SELECT u, u FROM edges
           UNION
           SELECT e2.v, reach.r FROM reach JOIN edges e2 ON e2.u = reach.node)
         SELECT node AS vec_id, MIN(r) AS cluster,
           CAST(CASE WHEN node = MIN(r) THEN 1 ELSE 0 END AS BIGINT) AS keep
         FROM reach GROUP BY node ORDER BY vec_id""")

  /** The q59 oracle composes the four index oracles verbatim — the recall
    * measurement can never drift from the indexes it measures.
    */
  val oracle: Map[String, String] = baseOracle + ("q59_ann_recall" ->
    s"""WITH exact AS (SELECT vec_id FROM (${baseOracle("q31_ann_topk")})),
       approx AS (
         SELECT 'ivf_label' AS index_name, vec_id FROM (${baseOracle("q34_ivf_search")})
         UNION ALL
         SELECT 'ivf_trained' AS index_name, vec_id FROM (${baseOracle("q56_ivf_trained_search")})
         UNION ALL
         SELECT 'lsh_multiprobe' AS index_name, vec_id FROM (${baseOracle("q32_ann_lsh")})),
       h AS (SELECT index_name, COUNT(*) AS hits
             FROM approx JOIN exact USING (vec_id) GROUP BY 1)
       SELECT n.index_name,
         CAST(COALESCE(h.hits, 0) AS BIGINT) AS hits,
         CAST(COALESCE(h.hits, 0) * 100 AS BIGINT) AS recall_x1000
       FROM (VALUES ('ivf_label'), ('ivf_trained'), ('lsh_multiprobe')) n(index_name)
       LEFT JOIN h USING (index_name)
       ORDER BY index_name""")

  /** Shared CTE chain of the banded-LSH sketch-then-verify pipeline, ending
    * in CTE `verified(vec_a, vec_b, cos_x10000)` — the oracle twin of
    * [[cosineLshVerify]] at the q35 knobs, used by both q35 and q36.
    */
  private def lshVerifySqlCtes: String =
    s"""ex AS (
           SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
           FROM embeddings, generate_series(1, 64) AS g(i)),
         proj AS (
           SELECT vec_id, j,
             SUM(CAST(ROUND(x * ${ProjScale}) AS BIGINT) * (((((i-1)*31 + j*17) % 7) - 3))) AS p
           FROM ex CROSS JOIN generate_series(0, ${Q35Bands * Q35PlanesPerBand - 1}) AS jj(j)
           GROUP BY 1, 2),
         bandbits AS (
           SELECT vec_id, j // ${Q35PlanesPerBand} AS band,
             CAST(SUM(CASE WHEN p >= 0 THEN (1::BIGINT << (j % ${Q35PlanesPerBand})) ELSE 0 END) AS BIGINT) AS bits
           FROM proj GROUP BY 1, 2),
         hot AS (
           SELECT band, bits FROM bandbits GROUP BY band, bits HAVING COUNT(*) > 1024),
         kept AS (
           SELECT b.* FROM bandbits b
           WHERE NOT EXISTS (SELECT 1 FROM hot h WHERE h.band = b.band AND h.bits = b.bits)),
         cand AS (
           SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
           FROM kept a JOIN kept b
             ON a.band = b.band AND a.bits = b.bits AND a.vec_id < b.vec_id),
         nrm AS (SELECT vec_id, sqrt(SUM(x*x)) AS nn FROM ex GROUP BY 1),
         dots AS (
           SELECT c.vec_a, c.vec_b, SUM(ea.x * eb.x) AS d
           FROM cand c JOIN ex ea ON ea.vec_id = c.vec_a
                       JOIN ex eb ON eb.vec_id = c.vec_b AND eb.i = ea.i
           GROUP BY 1, 2),
         verified AS (
           SELECT d.vec_a, d.vec_b,
             CAST(ROUND(10000.0 * d.d / (na.nn * nb.nn)) AS BIGINT) AS cos_x10000
           FROM dots d JOIN nrm na ON na.vec_id = d.vec_a
                       JOIN nrm nb ON nb.vec_id = d.vec_b
           WHERE d.d / (na.nn * nb.nn) >= 0.35)"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q30_cosine_near_dup" -> q30CosineNearDup _,
    "q31_ann_topk" -> q31AnnTopk _,
    "q32_ann_lsh" -> q32AnnLsh _,
    "q33_centroids" -> q33Centroids _,
    "q34_ivf_search" -> q34IvfSearch _,
    "q35_cosine_lsh_verify" -> q35CosineLshVerify _,
    "q36_vector_clusters" -> q36VectorClusters _,
    "q47_quantize_int8" -> q47QuantizeInt8 _,
    "q54_kmeans_lloyd" -> q54KmeansLloyd _,
    "q56_ivf_trained_search" -> q56IvfTrainedSearch _,
    "q59_ann_recall" -> q59AnnRecall _,
    "q64_knn_join" -> q64KnnJoin _)
}

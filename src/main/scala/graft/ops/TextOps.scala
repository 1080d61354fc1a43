package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data text pipeline over the `documents` table: dedup family
  * (exact-normalized, n-gram Jaccard, MinHash-LSH, SimHash), language-ID
  * heuristic, quality scoring, token stats, fingerprinting.
  *
  * Everything DuckDB-expressible carries an oracle (integer/rounded outputs
  * only — no raw double comparisons); hash-based ops (MinHash/SimHash/
  * fingerprints use Spark's xxhash64, which DuckDB lacks) are rows-only.
  */
object TextOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  private val toks: Column = split(col("text"), " ")

  /** word 3-gram shingles — high-cardinality dedup unit for the tiny synthetic
    * vocabulary (whole-token Jaccard would degenerate: every doc shares 'the').
    */
  private def shingled(d: DataFrame): DataFrame =
    d.select(col("doc_id"), toks.as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(t)-3), i -> concat_ws(' ', t[i], t[i+1], t[i+2]))"))
        .as("sh"))
      .distinct()

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

  /** n-gram Jaccard near-dup pairs: shingle self-join (equi-join on shingle —
    * shuffle-joinable; no O(n²) scan), exact J = |∩| / |∪| as x1000 integer.
    */
  def q21NgramJaccard(s: SparkSession, dir: String): DataFrame = {
    val sh = shingled(docs(s, dir)).cache()
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val pairs = sh.as("a").join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("common"))
    pairs
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sza"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "szb"), "doc_b")
      .withColumn("jac_x1000",
        round(lit(1000.0) * col("common") / (col("sza") + col("szb") - col("common"))).cast("long"))
      .filter(col("jac_x1000") >= 200)
      .select(col("doc_a"), col("doc_b"), col("jac_x1000"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** MinHash + LSH banding: 8 minhash permutations via xxhash64(shingle, seed),
    * 4 bands × 2 rows; band-equality join yields candidates, verified by the
    * banding collision count. Rows-only (DuckDB lacks xxhash64). The scale
    * path for dedup — candidate generation is an equi-join on band signature.
    */
  def q22MinhashLsh(s: SparkSession, dir: String): DataFrame = {
    val sh = shingled(docs(s, dir))
    val seeds = (0 until 8).map(i =>
      min(xxhash64(concat(col("sh"), lit(s"#$i")))).as(s"mh$i"))
    val sigs = sh.groupBy(col("doc_id")).agg(seeds.head, seeds.tail: _*)
    val bands = sigs.select(col("doc_id"), posexplode(array(
      (0 until 4).map(b => concat_ws(":", lit(b.toString),
        col(s"mh${2 * b}"), col(s"mh${2 * b + 1}"))): _*)).as(Seq("band", "sig")))
    bands.as("a").join(bands.as("b"),
        col("a.sig") === col("b.sig") && col("a.band") === col("b.band") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_bands"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** SimHash: 64-bit signature from token-hash bit votes; near-dup pairs via
    * 8×8-bit band join + exact `bit_count(xor) ≤ 3` (the classic 64-bit
    * simhash near-dup threshold; 8 bands make candidate generation COMPLETE
    * for any hamming ≤ 7 by pigeonhole — a looser threshold would silently
    * miss pairs that differ in every band). Rows-only (xxhash64).
    */
  def q23Simhash(s: SparkSession, dir: String): DataFrame = {
    val tokenHash = docs(s, dir)
      .select(col("doc_id"), explode(toks).as("tok"))
      .filter(col("tok") =!= "")
      .withColumn("h", xxhash64(col("tok")))
    // per-bit votes (+1 set / -1 clear per token occurrence) as 64 aggregate
    // columns in ONE map-side-combinable groupBy — no 64× row explosion, no
    // second shuffle (was: posexplode to (doc, bit, vote) rows + two aggs)
    val voteCols = (0 until 64).map(b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L))
        .as(s"v$b"))
    val votes = tokenHash.groupBy(col("doc_id")).agg(voteCols.head, voteCols.tail: _*)
    val sig = votes.select(col("doc_id"),
      (0 until 64).map(b =>
        when(col(s"v$b") > 0, lit(1L << b)).otherwise(0L)).reduce(_ + _).as("simhash"))
    val banded = sig.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until 8).map(b =>
        shiftright(col("simhash"), b * 8).bitwiseAND(lit(255L))): _*)).as(Seq("band", "bv")))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .filter(col("hamming") <= 3) // before distinct: shrink the dedup input
      .distinct()
      .orderBy(col("doc_a"), col("doc_b"))
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
  def q25Quality(s: SparkSession, dir: String): DataFrame = {
    val nTok = size(filter(toks, t => t =!= "")).cast("long")
    val nStop = size(filter(toks, t => t.isin("the", "a", "of"))).cast("long")
    docs(s, dir)
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

  /** Document fingerprint: bottom-4 sketch of shingle hashes (winnowing-style
    * content signature). Rows-only (xxhash64).
    */
  def q27Fingerprint(s: SparkSession, dir: String): DataFrame =
    shingled(docs(s, dir))
      .withColumn("h", xxhash64(col("sh")))
      .groupBy(col("doc_id"))
      .agg(slice(sort_array(collect_list(col("h"))), 1, 4).as("bottom4"))
      .select(col("doc_id"), concat_ws(",", col("bottom4").cast("array<string>")).as("fp"))
      .orderBy(col("doc_id"))

  val oracle: Map[String, String] = Map(
    "q20_dedup_exact" ->
      """SELECT keeper, n FROM (
           SELECT array_to_string(string_split(text,' ')[1:5], ' ') AS p,
                  MIN(doc_id) AS keeper, COUNT(*) AS n
           FROM documents GROUP BY 1)
         WHERE n > 1 ORDER BY keeper""",
    "q21_ngram_jaccard" ->
      """WITH sh AS (
           SELECT DISTINCT doc_id,
             t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
           FROM (SELECT doc_id, string_split(text,' ') AS t FROM documents)
           CROSS JOIN generate_series(1, 4096) AS g(i)
           WHERE len(t) >= 3 AND i + 2 <= len(t)),
         sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
         pairs AS (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
           FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
           GROUP BY 1,2)
         SELECT doc_a, doc_b,
           CAST(ROUND(1000.0 * common / (sa.sz + sb.sz - common)) AS BIGINT) AS jac_x1000
         FROM pairs JOIN sizes sa ON sa.doc_id = doc_a
                    JOIN sizes sb ON sb.doc_id = doc_b
         WHERE CAST(ROUND(1000.0 * common / (sa.sz + sb.sz - common)) AS BIGINT) >= 200
         ORDER BY doc_a, doc_b""",
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
    "q26_token_stats" ->
      """SELECT doc_id,
           CAST(len(list_filter(string_split(text,' '), x -> x <> '')) AS BIGINT) AS n_tokens,
           CAST(len(list_filter(regexp_split_to_array(text, '[aeiou ]+'), x -> x <> '')) AS BIGINT) AS n_subwords,
           CAST(length(text) AS BIGINT) AS len
         FROM documents ORDER BY doc_id""")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q20_dedup_exact" -> q20DedupExact _,
    "q21_ngram_jaccard" -> q21NgramJaccard _,
    "q22_minhash_lsh" -> q22MinhashLsh _,
    "q23_simhash" -> q23Simhash _,
    "q24_lang_id" -> q24LangId _,
    "q25_quality" -> q25Quality _,
    "q26_token_stats" -> q26TokenStats _,
    "q27_fingerprint" -> q27Fingerprint _)
}

package graft

import org.apache.spark.sql.functions._
import graft.functions.{PortableHash => PH, TextHashExprs}

/** The native text-sketch expressions ([[graft.functions.TextShinglesExpr]]
  * / [[graft.functions.MinhashSigsExpr]] / [[graft.functions.Simhash64Expr]])
  * must be bit-identical to the higher-order pipelines they replaced — the
  * same pipelines the DuckDB oracles mirror, so this parity is what keeps
  * q21/q22/q23/q27/q28/q29/q37 hash-green.
  */
class TextHashExprsSpec extends SparkSpec {

  import spark.implicits._

  // edge cases on purpose: repeated/leading/trailing separators, <3 tokens
  // (no shingles), repeated shingles (dedup), single token, empty string,
  // a non-ASCII BMP doc to pin the UTF-16 fallback path, and a
  // supplementary-character doc (U+1F600, a surrogate PAIR in UTF-16) to
  // pin the code-point fold against the higher-order split/ascii pipeline
  private val docsSeq: Seq[(Long, String)] = Seq(
    1L -> "the quick brown fox jumps over the lazy dog",
    2L -> "  double  spaces   and trailing  ",
    3L -> "two tokens",
    4L -> "a b c a b c a b c a b c",
    5L -> "single",
    6L -> "",
    7L -> "café naïve résumé tokens here now",
    8L -> (1 to 200).map(i => s"tok${i % 37}").mkString(" "),
    9L -> s"grin ${new String(Character.toChars(0x1F600))} mid${new String(Character.toChars(0x1F680))}word tokens here now")

  private def df = docsSeq.toDF("doc_id", "text")

  /** The pre-native shingle pipeline (split → poly per token → rolling
    * shingle3 → distinct), verbatim from round 2's TextOps.
    */
  private def hofShingles =
    df.select(col("doc_id"),
        transform(filter(split(col("text"), " "), t => t =!= ""),
          t => PH.poly(t)).as("th"))
      .filter(size(col("th")) >= 3)
      .select(col("doc_id"), explode(transform(
        sequence(lit(0), size(col("th")) - 3),
        i => PH.shingle3(
          element_at(col("th"), i + 1),
          element_at(col("th"), i + 2),
          element_at(col("th"), i + 3)))).as("shh"))
      .distinct()

  private def nativeShingles =
    df.select(col("doc_id"), TextHashExprs.text_shingles(col("text")).as("sharr"))
      .filter(size(col("sharr")) > 0)

  test("text_shingles equals the split/poly/shingle3/distinct pipeline") {
    val ref = hofShingles.as[(Long, Long)].collect().toSet
    val nat = nativeShingles
      .select(col("doc_id"), explode(col("sharr")).as("shh"))
      .as[(Long, Long)].collect()
    assert(nat.length === nat.toSet.size) // per-doc dedup actually happened
    assert(nat.toSet === ref)
  }

  test("minhash_sigs equals 128 min(mix(shh, i)) aggregates over exploded rows") {
    val perms = 128
    val mins = (0 until perms).map(i => min(PH.mix(col("shh"), i)).as(s"m$i"))
    val ref = hofShingles.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
      .collect().map(r => r.getLong(0) -> (1 to perms).map(r.getLong).toSeq).toMap
    val nat = nativeShingles
      .select(col("doc_id"), TextHashExprs.minhash_sigs(col("sharr"), perms).as("mh"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(nat.keySet === ref.keySet)
    nat.foreach { case (id, sig) => assert(sig === ref(id), s"doc $id") }
  }

  test("simhash64 equals the 64-vote-column groupBy over exploded tokens") {
    val toks = split(col("text"), " ")
    val tokenHash = df.select(col("doc_id"), explode(toks).as("tok"))
      .filter(col("tok") =!= "")
      .withColumn("h", PH.poly(col("tok")))
    val voteCols = (0 until 64).map(b =>
      sum(when(shiftright(PH.mix(col("h"), b), 15).bitwiseAND(lit(1L)) === 1L, 1L)
        .otherwise(-1L)).as(s"v$b"))
    val votes = tokenHash.groupBy(col("doc_id")).agg(voteCols.head, voteCols.tail: _*)
    val ref = votes.select(col("doc_id"),
        (0 until 64).map(b =>
          when(col(s"v$b") > 0, lit(1L << b)).otherwise(0L)).reduce(_ bitwiseOR _)
          .as("simhash"))
      .as[(Long, Long)].collect().toMap
    val nat = df.select(col("doc_id"), TextHashExprs.simhash64(col("text")).as("s"))
      .filter(col("s").isNotNull).as[(Long, Long)].collect().toMap
    assert(nat.keySet === ref.keySet) // token-less docs are null, not 0
    nat.foreach { case (id, s) => assert(s === ref(id), s"doc $id") }
  }

  test("docs with fewer than 3 tokens produce no shingles; empty text no simhash") {
    val byId = df.select(col("doc_id"),
        size(TextHashExprs.text_shingles(col("text"))).as("n"),
        TextHashExprs.simhash64(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.isNullAt(2)))).toMap
    assert(byId(3L)._1 === 0) // 2 tokens
    assert(byId(5L)._1 === 0) // 1 token
    assert(byId(6L) === ((0, true))) // empty: no shingles, null simhash
    assert(byId(4L)._1 === 3) // "a b c" repeated: 3 distinct shingles
    assert(!byId(3L)._2 && !byId(5L)._2) // 1-2 tokens still have a simhash
  }
}

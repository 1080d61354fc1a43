package graft.canon

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.Platform

/** Spark bindings for [[UrlCanon]].
  *
  * `url_key` is computed with the built-in `xxhash64` (codegen'd, seed 42)
  * over the canonical string; [[urlKeyScala]] reproduces the identical value
  * driver-side (same XXH64 implementation Spark uses) so sketches built in
  * plain Scala agree with keys computed in the plan.
  */
object CanonUdfs {

  val canonUdf = udf((u: String) => UrlCanon.canonicalize(u))
  val hostUdf  = udf((u: String) => UrlCanon.host(u))
  val resolveUdf = udf((b: String, l: String) => UrlCanon.resolve(b, l))

  def canon_url(c: Column): Column = canonUdf(c)
  def url_host(c: Column): Column  = hostUdf(c)

  /** xxhash64(canonical url), matching Spark's builtin on the same string. */
  def url_key(c: Column): Column = xxhash64(canonUdf(c))

  /** Driver/oracle-side equivalent of `xxhash64(lit(s))` (seed 42). */
  def urlKeyScala(canonical: String): Long = {
    val bytes = canonical.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    org.apache.spark.sql.catalyst.expressions.XXH64
      .hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET, bytes.length, 42L)
  }

  /** Register SQL-callable forms: canon_url(s), url_host(s). */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("canon_url", (u: String) => UrlCanon.canonicalize(u))
    spark.udf.register("url_host", (u: String) => UrlCanon.host(u))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.canon.UrlCanon

class UrlCanonSpec extends AnyFunSuite with PropHelper {

  test("lowercases scheme and host, keeps path case") {
    assert(UrlCanon.canonicalize("HTTP://ExAmple.COM/Path/Img") ==
      "http://example.com/Path/Img")
  }

  test("strips default ports") {
    assert(UrlCanon.canonicalize("http://a.com:80/x") == "http://a.com/x")
    assert(UrlCanon.canonicalize("https://a.com:443/x") == "https://a.com/x")
    assert(UrlCanon.canonicalize("http://a.com:8080/x") == "http://a.com:8080/x")
  }

  test("removes fragment") {
    assert(UrlCanon.canonicalize("http://a.com/x#frag") == "http://a.com/x")
  }

  test("empty path becomes /") {
    assert(UrlCanon.canonicalize("http://a.com") == "http://a.com/")
    assert(UrlCanon.canonicalize("http://a.com?b=1") == "http://a.com/?b=1")
  }

  test("resolves dot segments") {
    assert(UrlCanon.canonicalize("http://a.com/a/b/../c/./d") == "http://a.com/a/c/d")
    assert(UrlCanon.canonicalize("http://a.com/../x") == "http://a.com/x")
    assert(UrlCanon.canonicalize("http://a.com/a/b/..") == "http://a.com/a/")
  }

  test("percent-decodes unreserved, uppercases the rest") {
    assert(UrlCanon.canonicalize("http://a.com/%7Euser/%41%2fx") ==
      "http://a.com/~user/A%2Fx")
  }

  test("sorts query parameters stably") {
    assert(UrlCanon.canonicalize("http://a.com/x?b=2&a=1&b=1") ==
      "http://a.com/x?a=1&b=1&b=2")
  }

  test("host extraction") {
    assert(UrlCanon.host("https://User@WWW.Example.com:8443/p?q=1") == "www.example.com")
    assert(UrlCanon.host("not a url") == "")
  }

  test("relative resolution") {
    assert(UrlCanon.resolve("http://a.com/dir/page", "img/1") == "http://a.com/dir/img/1")
    assert(UrlCanon.resolve("http://a.com/dir/page", "/img/1") == "http://a.com/img/1")
    assert(UrlCanon.resolve("http://a.com/dir/page", "//b.com/z") == "http://b.com/z")
    assert(UrlCanon.resolve("http://a.com/dir/page", "http://c.com/") == "http://c.com/")
    assert(UrlCanon.resolve("http://a.com/list", "?p=2") == "http://a.com/list?p=2")
  }

  test("non-URL input passes through trimmed (total function)") {
    assert(UrlCanon.canonicalize("  plain-key  ") == "plain-key")
  }

  private val urlGen: Gen[String] = for {
    scheme <- Gen.oneOf("http", "HTTP", "https")
    host <- Gen.oneOf("a.com", "B.Example.COM", "x-y.net")
    port <- Gen.oneOf("", ":80", ":443", ":8080")
    segs <- Gen.listOfN(3, Gen.oneOf("a", "B", ".", "..", "%7e", "img%2F1"))
    q <- Gen.oneOf("", "?b=2&a=1", "?z&y=%41")
    frag <- Gen.oneOf("", "#f")
  } yield s"$scheme://$host$port/${segs.mkString("/")}$q$frag"

  test("canonicalization is idempotent (property)") {
    forAllN(urlGen) { u =>
      val c = UrlCanon.canonicalize(u)
      assert(UrlCanon.canonicalize(c) == c)
    }
  }

  test("host of canonical equals host of raw (property)") {
    forAllN(urlGen) { u =>
      assert(UrlCanon.host(UrlCanon.canonicalize(u)) == UrlCanon.host(u))
    }
  }

  test("native canon_url/url_host expressions match the Scala functions and codegen") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val urls = Seq("HTTP://ExAmple.COM:80/a/../b?z=1&a=2#f", "not a url", null,
      "https://U@h.COM:443/%7euser/./img%2F1?b&a=%41")
    val df = urls.toDF("u").select(
      col("u"),
      graft.canon.CanonUdfs.canon_url(col("u")).as("c"),
      graft.canon.CanonUdfs.url_host(col("u")).as("h"))
    val rows = df.collect()
    urls.zip(rows).foreach { case (u, r) =>
      assert(r.getString(1) == UrlCanon.canonicalize(u))
      if (u == null) assert(r.isNullAt(2))
      else assert(r.getString(2) == UrlCanon.host(u))
    }
    // the expression must NOT be a ScalaUDF (it inlines into codegen)
    val plan = df.queryExecution.executedPlan.toString()
    assert(!plan.contains("UDF"), plan)
    // SQL registration via extensions-style injection
    graft.canon.CanonUdfs.register(spark)
    val viaSql = spark.sql(
      "SELECT canon_url('HTTP://A.com:80/x/../y') AS c, url_host('http://U@B.com:8080/p') AS h")
      .head()
    assert(viaSql.getString(0) == "http://a.com/y" && viaSql.getString(1) == "b.com")
  }
}

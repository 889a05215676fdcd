package graft

import org.apache.spark.sql.functions._

import graft.operators.Urls
import graft.operators.TextAnalysis

/** Round-12 curation operators: URL canonicalization, l-diversity,
  * PMI collocations. */
class UrlTextOpsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(url: String): String =
    Seq(url).toDF("u").select(Urls.canonicalize(col("u")).as("c"))
      .head().getString(0)

  test("canonicalize: case, www, default port, fragment, tracking params, sort") {
    assert(canon("HTTPS://WWW.Example.COM:443/Path/?b=2&utm_source=x&a=1#frag")
      === "https://example.com/Path?a=1&b=2")
    // non-default port survives; http default port drops
    assert(canon("http://example.com:8080/x") === "http://example.com:8080/x")
    assert(canon("HTTP://example.com:80/x") === "http://example.com/x")
    // path case preserved; bare "/" path canonicalizes away
    assert(canon("https://A.B.com/") === "https://a.b.com")
    // fbclid/gclid dropped by name, not prefix; empty query drops '?'
    assert(canon("https://e.com/p?fbclid=123&gclid=9") === "https://e.com/p")
    // params sort byte-wise; utm_ match is case-insensitive
    assert(canon("https://e.com/p?z=1&UTM_campaign=c&a=2") === "https://e.com/p?a=2&z=1")
  }

  test("single-pass CanonicalUrl == Column composition (differential)") {
    val urls = Seq(
      "HTTPS://WWW.Example.COM:443/Path/?b=2&utm_source=x&a=1#frag",
      "http://example.com:8080/x?z=9&y=8&UTM_x=1",
      "HTTP://example.com:80/x",
      "https://A.B.com/",
      "https://e.com/p?fbclid=123&gclid=9",
      "https://e.com/p?z=1&UTM_campaign=c&a=2",
      "https://site.org",
      "https://w.www.org/a/b/c?one=1&one=1&two=",
      "no-scheme-at-all", "https://h.com/#only-frag",
      "https://h.com/??double=q")
    val df = urls.toDF("u").select(
      graft.operators.Urls.canonicalize(col("u")).as("fast"),
      graft.operators.Urls.canonicalizeComposed(col("u")).as("composed"))
    df.collect().zip(urls).foreach { case (r, u) =>
      assert(r.getString(0) === r.getString(1), s"diverges on $u")
    }
  }

  test("registrableDomain: last two labels, port stripped") {
    val d = Seq("https://a.b.example.com:8080/p?x=1", "https://site.org")
      .toDF("u")
      .select(Urls.registrableDomain(Urls.canonicalize(col("u"))).as("d"))
      .collect().map(_.getString(0))
    assert(d.toSeq === Seq("example.com", "site.org"))
  }

  test("lDiversity flags classes whose sensitive values collapse") {
    val df = Seq(
      ("a", 1L), ("a", 1L), ("a", 1L), // class a: 3 docs, 1 value -> at risk (l=2)
      ("b", 1L), ("b", 2L) //            class b: 2 docs, 2 values -> ok
    ).toDF("qi", "sens")
    val out = TextAnalysis.lDiversity(df, Seq("qi"), "sens", 2L)
      .orderBy("qi").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq === Seq(("a", 3L, 1L, 1L), ("b", 2L, 2L, 0L)))
  }

  test("collocations rank fixed-pair bigrams above independent ones") {
    // "x y" always adjacent (lift >> 1); filler words independent
    val docs = (0 until 30).map(i => s"x y f$i${" f" * 5} x y").toDF("text")
    val out = TextAnalysis.collocations(docs, "text", minCount = 5L, topK = 5)
      .collect()
    assert(out.nonEmpty)
    val top = out.head
    assert((top.getString(0), top.getString(1)) === ("x", "y"))
    assert(top.getDouble(5) > 1.0) // lift of a true collocation
  }
}

package graft

import graft.pipeline.UrlAnalysis
import org.apache.spark.sql.functions._

class UrlAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def signalsOf(url: String): (String, String, String, Int, Int, Boolean) = {
    val df = Seq((1, url)).toDF("id", "url")
    val r = UrlAnalysis.urlSignals(df, "url").head()
    (r.getAs[String]("url_scheme"), r.getAs[String]("url_host"),
      r.getAs[String]("url_registered_domain"),
      r.getAs[Int]("url_path_depth"), r.getAs[Int]("url_n_query_params"),
      r.getAs[Boolean]("url_is_ip_host"))
  }

  test("urlSignals parses scheme, host, registered domain, path depth, query params") {
    assert(signalsOf("https://www.example.com/a/b/c?x=1&y=2") ==
      (("https", "www.example.com", "example.com", 3, 2, false)))
    assert(signalsOf("http://sub.shop.example.co.uk/p") ==
      (("http", "sub.shop.example.co.uk", "example.co.uk", 1, 0, false)))
    assert(signalsOf("http://user:pw@example.org:8080/x") ==
      (("http", "example.org", "example.org", 1, 0, false)))
    assert(signalsOf("ftp://files.example.net") ==
      (("ftp", "files.example.net", "example.net", 0, 0, false)))
    assert(signalsOf("http://10.0.0.7:9000/a?b=1") ==
      (("http", "10.0.0.7", "10.0.0.7", 1, 1, true)))
    // trailing + doubled slashes collapse; fragment excluded from query
    assert(signalsOf("https://e.com//a//b/?q=1#frag") ==
      (("https", "e.com", "e.com", 2, 1, false)))
  }

  test("urlSignals yields nulls/zeros for non-URL strings and null input") {
    val df = Seq((1, "not a url"), (2, null.asInstanceOf[String])).toDF("id", "url")
    val rows = UrlAnalysis.urlSignals(df, "url").orderBy("id").collect()
    rows.foreach { r =>
      assert(r.getAs[String]("url_scheme") == null)
      assert(r.getAs[String]("url_host") == null)
      assert(r.getAs[String]("url_registered_domain") == null)
      assert(r.getAs[Int]("url_path_depth") == 0)
      assert(r.getAs[Int]("url_n_query_params") == 0)
      assert(!r.getAs[Boolean]("url_is_ip_host"))
    }
  }

  test("single-label and IP hosts register as themselves") {
    assert(signalsOf("http://localhost/admin")._3 == "localhost")
    assert(signalsOf("http://192.168.1.9/x")._3 == "192.168.1.9")
  }

  test("domainFrequency counts per registered domain") {
    val df = Seq(
      "https://a.example.com/1", "https://b.example.com/2",
      "http://other.org/x", "bogus", "http://shop.site.co.uk/y"
    ).toDF("url")
    val freq = UrlAnalysis.domainFrequency(df, "url")
      .as[(String, Long)].collect().toMap
    assert(freq == Map("example.com" -> 2L, "other.org" -> 1L, "site.co.uk" -> 1L))
  }

  test("filterByDomains blocklist drops matches, allowlist keeps them, non-URLs survive blocklists") {
    val df = Seq(
      (1, "https://spam.example.com/x"), (2, "https://ok.org/y"), (3, "junk")
    ).toDF("id", "url")
    val blocked = UrlAnalysis.filterByDomains(df, "url", Seq("example.com"))
    assert(blocked.select("id").as[Int].collect().sorted.toSeq == Seq(2, 3))
    val allowed = UrlAnalysis.filterByDomains(df, "url", Seq("example.com"), allow = true)
    assert(allowed.select("id").as[Int].collect().toSeq == Seq(1))
  }

  test("filterByDomainTable uses a broadcast join and matches the literal-list path") {
    val df = Seq(
      (1, "https://spam.example.com/x"), (2, "https://ok.org/y"), (3, "junk")
    ).toDF("id", "url")
    val domains = Seq("example.com").toDF("domain")
    val blocked = UrlAnalysis.filterByDomainTable(df, "url", domains)
    assert(blocked.select("id").as[Int].collect().sorted.toSeq == Seq(2, 3))
    val allowed = UrlAnalysis.filterByDomainTable(df, "url", domains, allow = true)
    assert(allowed.select("id").as[Int].collect().toSeq == Seq(1))
    val plan = blocked.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"expected a broadcast join in:\n$plan")
    // helper column must not leak
    assert(blocked.columns.toSeq == Seq("id", "url"))
  }

  test("capPerDomain keeps at most N docs per registered domain, deterministically") {
    val df = (1 to 20).map(i => (i, s"https://h$i.example.com/x")).toDF("id", "url")
      .union(Seq((21, "https://only.org/y"), (22, "junk-no-domain")).toDF("id", "url"))
    val capped = UrlAnalysis.capPerDomain(df, "url", col("id"), maxDocs = 5)
    val ids = capped.select("id").as[Int].collect().sorted.toSeq
    assert(ids.count(_ <= 20) == 5) // example.com capped to 5
    assert(ids.contains(21) && ids.contains(22)) // other domain + non-URL survive
    val again = UrlAnalysis.capPerDomain(df, "url", col("id"), maxDocs = 5)
      .select("id").as[Int].collect().sorted.toSeq
    assert(again == ids) // deterministic draw
    assert(capped.columns.toSeq == Seq("id", "url"))
  }

  test("canonicalUrl: each normalization rule, closed-form") {
    def canon(u: String): String =
      Seq(u).toDF("url").select(UrlAnalysis.canonicalUrl(col("url"))).head().getString(0)
    // www + default port + trailing slash + fragment + tracking params + sort
    assert(canon("http://www.Example.com:80/path/?utm_source=x&b=2&a=1#frag")
      == "http://example.com/path?a=1&b=2")
    assert(canon("https://Example.com:443/path") == "https://example.com/path")
    // non-default port and inner www label kept
    assert(canon("https://a.www.example.com:8443/b/") == "https://a.www.example.com:8443/b")
    // empty path -> '/', all params tracking -> no '?'
    assert(canon("http://example.com?utm_a=1&utm_b=2") == "http://example.com/")
    // a valueless param survives (the tracking pattern requires '=')
    assert(canon("http://example.com/x?flag&z=1") == "http://example.com/x?flag&z=1")
    // non-URL strings pass through unchanged (never merged into one group)
    assert(canon("plain text") == "plain text")
    // http default port only dropped for http (":80" on https is non-default)
    assert(canon("https://example.com:80/x") == "https://example.com:80/x")
  }

  test("dedupByCanonicalUrl keeps first by order column, one row per page") {
    val df = Seq(
      (1L, "http://www.a.com/p/"),
      (2L, "http://a.com:80/p"),
      (3L, "https://b.org/q?utm_c=1"),
      (4L, "https://b.org/q"),
      (5L, "junk")).toDF("id", "url")
    val kept = UrlAnalysis.dedupByCanonicalUrl(df, "url", col("id"))
      .select("id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 3L, 5L))
    // helper column must not leak
    assert(UrlAnalysis.dedupByCanonicalUrl(df, "url", col("id")).columns.toSeq
      == Seq("id", "url"))
  }

  test("url signal projection stays inside whole-stage codegen") {
    // a range source (not a local relation, which ConvertToLocalRelation
    // would fold eagerly) so the projection's codegen span is observable
    val df = spark.range(100).select(col("id"),
      concat(lit("https://www.example"), col("id"), lit(".com/a?x=1")).as("url"))
    val exec = UrlAnalysis.urlSignals(df, "url").queryExecution.executedPlan
    val spans = exec.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(spans.nonEmpty, s"expected a WholeStageCodegen span in:\n$exec")
    // the signal projection itself must be inside the span, not above it
    assert(exec.toString.contains("*(1) Project"), s"projection not codegen'd:\n$exec")
  }
}

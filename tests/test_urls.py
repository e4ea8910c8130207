"""URL canonicalization (operators/urls.py) — RFC-subset collapsing
rules, tracking-param policy, and the domain_stats aggregation."""

from __future__ import annotations

from pyspark.sql import functions as F

from semantik_spark.operators.urls import canonical_urls, domain_stats


def _canon(spark, *urls):
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    return [r["canonical_url"] for r in canonical_urls(df).collect()]


def test_case_port_fragment_collapse(spark):
    variants = [
        "HTTP://WWW.Example.COM:80/a/b#frag",
        "http://example.com/a/b",
        "http://user:pw@example.com./a//b/",
    ]
    assert set(_canon(spark, *variants)) == {"http://example.com/a/b"}


def test_https_default_port_and_tracking_params(spark):
    variants = [
        "https://Site.org:443/p?utm_source=x&b=2&a=1&gclid=z",
        "https://site.org/p/?a=1&b=2&fbclid=abc",
        "https://site.org/p?b=2&a=1",
    ]
    assert set(_canon(spark, *variants)) == {"https://site.org/p?a=1&b=2"}


def test_non_default_port_kept(spark):
    assert _canon(spark, "http://h.example.com:8080/x") == [
        "http://h.example.com:8080/x"
    ]
    # https on port 80 is NOT default — kept
    assert _canon(spark, "https://h.example.com:80/x") == [
        "https://h.example.com:80/x"
    ]


def test_root_path_and_empty_query(spark):
    assert _canon(spark, "http://a.net") == ["http://a.net/"]
    assert _canon(spark, "http://a.net/?utm_source=x") == ["http://a.net/"]


def test_parsed_fields_and_domain(spark):
    df = spark.createDataFrame(
        [("https://www.deep.sub.example.co:444/d/e?z=1&y=2#f",)], ["url"]
    )
    r = canonical_urls(df).collect()[0]
    assert r["scheme"] == "https"
    assert r["host"] == "deep.sub.example.co"
    assert r["port"] == 444
    assert r["path_norm"] == "/d/e"
    assert r["params"] == "y=2&z=1"
    assert r["domain"] == "example.co"


def test_domain_stats(spark):
    df = spark.createDataFrame(
        [
            ("http://a.example.com/x",),
            ("HTTP://A.Example.com/x#top",),   # same canonical as above
            ("https://b.example.com/y",),
            ("https://other.net/z",),
        ],
        ["url"],
    )
    out = {r["domain"]: r for r in domain_stats(canonical_urls(df)).collect()}
    ex = out["example.com"]
    assert ex["n_urls"] == 3 and ex["n_canonical"] == 2 and ex["n_hosts"] == 2
    assert ex["https_frac"] == round(1 / 3, 6)
    assert out["other.net"]["n_urls"] == 1 and out["other.net"]["https_frac"] == 1.0


def test_no_shuffle_before_aggregation(spark):
    # canonicalization is map-only: the single Exchange in domain_stats'
    # plan is the final groupBy
    df = spark.createDataFrame([("http://a.com/x",)], ["url"])
    plan = domain_stats(canonical_urls(df))._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2  # partial/final agg pair at most


def test_garbage_urls_flagged_not_fatal(spark):
    df = spark.createDataFrame(
        [("not a url",), ("",), ("http://ok.example.com/x",)], ["url"]
    )
    rows = {r["url"]: r for r in canonical_urls(df).collect()}
    assert rows["http://ok.example.com/x"]["is_valid"] is True
    assert rows["not a url"]["is_valid"] is False
    assert rows[""]["is_valid"] is False


def test_psl_registrable_domain_rule_classes(spark):
    """Every PSL rule class (normal 2/3-label, wildcard, exception,
    default TLD) resolves per the publicsuffix.org algorithm, and the
    generated DuckDB expression agrees byte-for-byte."""
    import duckdb

    from semantik_spark.functions.psl import psl_domain_sql, registrable_domain

    cases = {
        "site.example.co.uk": "example.co.uk",      # 2-label normal rule
        "a.b.school.k12.ca.us": "school.k12.ca.us",  # 3-label normal rule
        "news.feed.ck": "news.feed.ck",              # wildcard *.ck
        "deep.www.ck": "www.ck",                     # exception !www.ck
        "sub.example.com": "example.com",            # default rule
        "example.com": "example.com",
        "com": "com",                                # bare TLD: pass-through
        "localhost": "localhost",
    }
    df = spark.createDataFrame([(h,) for h in cases], ["host"])
    got = {r["host"]: r["d"] for r in
           df.select("host", registrable_domain(F.col("host")).alias("d")).collect()}
    assert got == cases
    con = duckdb.connect()
    sql = psl_domain_sql("host")
    for h, want in cases.items():
        assert con.sql(f"select {sql} from (select '{h}' as host)").fetchone()[0] == want, h


def test_canonical_urls_domain_uses_psl(spark):
    """co.uk-class hosts must group by registrable domain, not by the
    naive last-two-labels (which would file every UK site under co.uk)."""
    from semantik_spark.operators.urls import canonical_urls

    df = spark.createDataFrame(
        [("https://www.shop.example.co.uk/x",), ("https://other.example.co.uk/y",)],
        ["url"],
    )
    doms = [r["domain"] for r in canonical_urls(df).collect()]
    assert doms == ["example.co.uk", "example.co.uk"]

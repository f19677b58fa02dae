"""URL canonicalization + host-cap hygiene (operators/urls.py, r10).

Golden pins for every canonicalization rule in the module-doc
contract, the mini-PSL branch, NULL propagation, and the composed
url_dedup_cap / host_profile semantics.  The cross-engine hash parity
of the full pipeline is covered by test_oracle_parity.py via the
url_canonical_dedup / url_host_stats registry entries.
"""

import pytest
from pyspark.sql import functions as F

from telemetry_streaming_spark.operators.urls import (
    host_profile,
    url_dedup_cap,
    with_url_columns,
)


def _canon(spark, url):
    df = spark.createDataFrame([(1, url)], ["doc_id", "url"])
    row = with_url_columns(df, "url").collect()[0]
    return row["host"], row["domain"], row["canon_url"]


@pytest.mark.parametrize(
    "url,host,domain,canon",
    [
        # scheme case + www + default https port + tracking param +
        # trailing slash + fragment, all at once
        (
            "HTTPS://WWW.Example.com:443/a/b/?utm_source=x&id=3#frag",
            "example.com",
            "example.com",
            "example.com/a/b?id=3",
        ),
        # http default port; param ORDER must not distinguish pages
        (
            "http://example.com:80/a/b?id=3&z=1",
            "example.com",
            "example.com",
            "example.com/a/b?id=3&z=1",
        ),
        (
            "http://example.com/a/b?z=1&id=3",
            "example.com",
            "example.com",
            "example.com/a/b?id=3&z=1",
        ),
        # non-default port survives in host/canon (distinct origin)
        # but never in the registrable-domain grouping key
        (
            "https://example.com:8443/a",
            "example.com:8443",
            "example.com",
            "example.com:8443/a",
        ),
        # schemeless input
        ("example.com/a/b?id=3", "example.com", "example.com",
         "example.com/a/b?id=3"),
        # all params tracking -> no '?' at all
        ("https://example.com/?ref=rss&utm_medium=email", "example.com",
         "example.com", "example.com"),
        # bare host, no path
        ("https://example.com", "example.com", "example.com", "example.com"),
        # mini-PSL compound suffix keeps three labels; www NOT stripped
        # mid-host, only one leading www.
        (
            "https://blog.example.co.uk/a?fbclid=z",
            "blog.example.co.uk",
            "example.co.uk",
            "blog.example.co.uk/a",
        ),
        # non-www subdomain survives in host AND canon (m.example is a
        # DIFFERENT page namespace), but folds into the same domain
        ("http://m.example.com/a", "m.example.com", "example.com",
         "m.example.com/a"),
        # surrounding whitespace
        ("  https://example.com/x  ", "example.com", "example.com",
         "example.com/x"),
        # single-label host: mini-PSL takes what exists
        ("https://localhost:443/x", "localhost", "localhost",
         "localhost/x"),
    ],
)
def test_canonicalization_goldens(spark, url, host, domain, canon):
    assert _canon(spark, url) == (host, domain, canon)


def test_null_url_propagates_null(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "https://example.com/a")], ["doc_id", "url"]
    )
    rows = {r["doc_id"]: r for r in with_url_columns(df, "url").collect()}
    assert rows[1]["canon_url"] is None
    assert rows[2]["canon_url"] == "example.com/a"


def test_url_dedup_cap_survivor_is_min_id_with_dup_count(spark):
    df = spark.createDataFrame(
        [
            (7, "https://WWW.Example.com/a/?utm_source=x"),
            (3, "http://example.com/a"),
            (9, "https://example.com/a/"),
            (5, "https://example.com/b"),
        ],
        ["doc_id", "url"],
    )
    out = {
        r["canon_url"]: r
        for r in url_dedup_cap(df, "url", "doc_id", cap=10).collect()
    }
    assert out["example.com/a"]["doc_id"] == 3
    assert out["example.com/a"]["n_dups"] == 3
    assert out["example.com/b"]["doc_id"] == 5
    assert out["example.com/b"]["n_dups"] == 1


def test_url_dedup_cap_caps_per_domain_deterministically(spark):
    # 30 pages on one domain, 2 on another; cap=5 keeps exactly 5 of
    # the hot domain chosen by md5(canon) — stable across runs
    rows = [(i, f"https://hot.com/p/{i}") for i in range(30)]
    rows += [(100, "https://cold.com/x"), (101, "https://cold.com/y")]
    df = spark.createDataFrame(rows, ["doc_id", "url"])
    out = url_dedup_cap(df, "url", "doc_id", cap=5)
    by_dom = {
        d["domain"]: d["n"]
        for d in out.groupBy("domain").agg(F.count("*").alias("n")).collect()
    }
    assert by_dom == {"hot.com": 5, "cold.com": 2}
    first = sorted(r["canon_url"] for r in out.where(F.col("domain") == "hot.com").collect())
    again = sorted(
        r["canon_url"]
        for r in url_dedup_cap(df, "url", "doc_id", cap=5)
        .where(F.col("domain") == "hot.com")
        .collect()
    )
    assert first == again
    # rank is 1..cap within the capped domain
    rks = sorted(
        r["rk"] for r in out.where(F.col("domain") == "hot.com").collect()
    )
    assert rks == [1, 2, 3, 4, 5]


def test_host_profile_counts_and_dup_rate(spark):
    df = spark.createDataFrame(
        [
            (1, "https://www.example.com/a/?utm_source=x"),
            (2, "http://example.com/a"),
            (3, "https://m.example.com/a"),
            (4, "https://other.org/z"),
        ],
        ["doc_id", "url"],
    )
    out = {r["domain"]: r for r in host_profile(df, "url").collect()}
    ex = out["example.com"]
    # ids 1+2 collapse (www-strip makes the same host); id 3 is a
    # different host AND a different canonical page
    assert (ex["n_raw"], ex["n_canon"], ex["n_hosts"]) == (3, 2, 2)
    assert ex["dup_rate_e6"] == (1_000_000 * 1) // 3
    assert out["other.org"]["dup_rate_e6"] == 0


def test_group_split_is_group_atomic_and_stable(spark):
    from telemetry_streaming_spark.operators.sampling import group_split

    rows = [(i, f"g{i % 9}") for i in range(90)]
    df = spark.createDataFrame(rows, ["id", "grp"])
    splits = [("train", 9000), ("val", 500), ("test", 500)]
    out = group_split(df, "grp", splits)
    # atomic: one split per group
    multi = (
        out.groupBy("grp")
        .agg(F.countDistinct("split").alias("n"))
        .where(F.col("n") > 1)
        .count()
    )
    assert multi == 0
    # stable under corpus growth: adding groups never moves old ones
    base = {r["grp"]: r["split"] for r in out.select("grp", "split").distinct().collect()}
    grown = spark.createDataFrame(
        rows + [(1000 + i, f"h{i}") for i in range(50)], ["id", "grp"]
    )
    regrown = {
        r["grp"]: r["split"]
        for r in group_split(grown, "grp", splits)
        .select("grp", "split").distinct().collect()
    }
    assert all(regrown[g] == s for g, s in base.items())


def test_group_split_null_group_lands_in_last_split(spark):
    from telemetry_streaming_spark.operators.sampling import group_split

    df = spark.createDataFrame([(1, None), (2, "g")], ["id", "grp"])
    out = {r["id"]: r["split"] for r in group_split(
        df, "grp", [("a", 5000), ("b", 3000), ("c", 2000)]
    ).collect()}
    assert out[1] == "c"


def test_group_split_rejects_bad_weights(spark):
    from telemetry_streaming_spark.operators.sampling import group_split

    df = spark.createDataFrame([(1, "g")], ["id", "grp"])
    import pytest as _pytest

    with _pytest.raises(ValueError):
        group_split(df, "grp", [("a", 5000), ("b", 4000)])
    with _pytest.raises(ValueError):
        group_split(df, "grp", [("a", 10001), ("b", -1)])


def test_group_split_sql_case_matches_column_expression(spark, duck):
    """The generated SQL CASE and the Column expression must assign
    identically — the contract the registry oracles lean on."""
    from telemetry_streaming_spark.operators.sampling import (
        group_split,
        group_split_sql_case,
    )

    splits = [("train", 9000), ("val", 500), ("test", 500)]
    rows = [(i, f"dom{i}.com") for i in range(200)]
    df = spark.createDataFrame(rows, ["id", "grp"])
    got = {
        r["grp"]: r["split"] for r in group_split(df, "grp", splits).collect()
    }
    case = group_split_sql_case("grp", splits)
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=["id", "grp"])
    duck.register("grp_rows", pdf)
    want = {
        r[0]: r[1]
        for r in duck.execute(
            f"SELECT grp, {case} AS split FROM grp_rows"
        ).fetchall()
    }
    duck.unregister("grp_rows")
    assert got == want
    assert set(want.values()) == {"train", "val", "test"}


def test_psl_domain_longest_match_and_fallbacks(spark):
    """with_psl_domain: longest matching public suffix + one label;
    no-match and suffix-is-whole-host rows fall back to last-2."""
    from telemetry_streaming_spark.operators.urls import with_psl_domain

    psl = spark.createDataFrame(
        [("com",), ("uk",), ("co.uk",), ("org",)], ["suffix"]
    )
    rows = [
        (1, "a.b.co.uk"),        # co.uk beats uk -> b.co.uk
        (2, "www.example.com"),  # com -> example.com
        (3, "deep.sub.site.org"),  # org -> site.org
        (4, "host.internal"),    # no match -> last-2 fallback
        (5, "co.uk"),            # IS a suffix, nothing registrable -> fallback
        (6, "example.com:8443"), # port stripped before matching
        (7, "localhost"),        # single label, no match -> itself
    ]
    df = spark.createDataFrame(rows, ["id", "host"])
    out = {r["id"]: r["psl_domain"] for r in with_psl_domain(df, "host", psl).collect()}
    assert out == {
        1: "b.co.uk",
        2: "example.com",
        3: "site.org",
        4: "host.internal",
        5: "co.uk",
        6: "example.com",
        7: "localhost",
    }


def test_psl_domain_agrees_with_mini_psl_on_the_synth_hosts(spark):
    """On the registry's synthetic hosts the broadcast-PSL variant and
    the mini-PSL regex must agree exactly — the documented claim that
    swapping in the real list changes no downstream plan shape."""
    from telemetry_streaming_spark.operators.urls import (
        with_psl_domain,
        with_url_columns,
    )
    from telemetry_streaming_spark.plans.queries import QUERIES, _url_synth_col
    from telemetry_streaming_spark.sources.registry import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "source", _url_synth_col().alias("url")
    )
    canon = with_url_columns(docs, "url")
    psl = spark.createDataFrame([("com",), ("co.uk",), ("uk",)], ["suffix"])
    both = with_psl_domain(canon, "host", psl)
    assert both.where(F.col("domain") != F.col("psl_domain")).count() == 0


def test_group_split_sql_case_rejects_bad_weights():
    from telemetry_streaming_spark.operators.sampling import (
        group_split_sql_case,
    )
    import pytest as _pytest

    with _pytest.raises(ValueError):
        group_split_sql_case("g", [("a", 5000), ("b", 4000)])


def test_robots_filter_longest_match_tie_and_default(spark):
    """RFC 9309 semantics: longest prefix wins, exact-length tie goes
    to allow, no-match and no-rules hosts default to allowed, and one
    host's rules never leak onto another."""
    from telemetry_streaming_spark.operators.urls import robots_filter

    rules = spark.createDataFrame(
        [
            ("a.com", "/private", 0),
            ("a.com", "/private/ok", 1),   # longer allow overrides
            ("a.com", "/t", 0),
            ("a.com", "/u", 1),
            ("tie.com", "/x", 0),
            ("tie.com", "/y", 1),          # same host, same length, diff paths
            ("tie2.com", "/z", 0),
            ("tie2.com", "/z", 1),         # EXACT tie -> allow wins
        ],
        ["rule_host", "prefix", "allow"],
    )
    rows = [
        (1, "a.com", "/private/secret"),   # denied by /private
        (2, "a.com", "/private/ok/doc"),   # re-allowed by longer prefix
        (3, "a.com", "/public"),           # no match -> default allow
        (4, "b.com", "/private/secret"),   # no rules for host -> allow
        (5, "tie2.com", "/z/page"),        # exact-length tie -> allow
        (6, "a.com", "/t/x"),              # denied
    ]
    df = spark.createDataFrame(rows, ["doc_id", "host", "path"])
    got = {r["doc_id"]: r["allowed"] for r in robots_filter(
        df, rules, "doc_id"
    ).collect()}
    assert got == {1: 0, 2: 1, 3: 1, 4: 1, 5: 1, 6: 0}


def test_robots_filter_broadcasts_rules(spark):
    """The rules side must arrive broadcast — the frontier never
    shuffles for the politeness check."""
    import contextlib
    import io

    from telemetry_streaming_spark.operators.urls import robots_filter

    rules = spark.createDataFrame(
        [("a.com", "/p", 0)], ["rule_host", "prefix", "allow"]
    )
    df = spark.createDataFrame(
        [(1, "a.com", "/p/x")], ["doc_id", "host", "path"]
    )
    out = robots_filter(df, rules, "doc_id")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain(mode="formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan

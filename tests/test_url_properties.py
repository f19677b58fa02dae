"""Property checks for the URL canonicalization contract
(operators/urls.py) over a seeded randomized URL corpus, plus a plain-
Python reference implementation of the module-doc contract.

The DuckDB oracles share the CTE pipeline with the queries; this layer
catches a shared misunderstanding between the Spark and SQL
formulations by checking three things no oracle states directly:

1. REFERENCE: canon/host/domain equal an independent Python
   reimplementation of the six documented rules.
2. IDEMPOTENCE: canonicalizing an already-canonical URL is the
   identity — the property that makes re-running the hygiene pass on
   an already-cleaned frontier a no-op instead of a slow drift.
3. INVARIANTS: no canonical URL carries a fragment, a scheme, a
   leading www., a default port, an unsorted param list, or a
   tracking param.
"""

import random
import re

import pyspark.sql.functions as F

from telemetry_streaming_spark.operators.urls import with_url_columns

TRACKING = re.compile(r"^(utm_[a-z0-9_]*|gclid|fbclid|msclkid|ref)(=.*)?$")
MULTI_TLD = re.compile(r"\.(co|com|org|net|gov|ac|edu)\.[a-z][a-z]$")


def _ref_canon(url: str):
    """Plain-Python reference of the module-doc contract."""
    u = url.strip()
    u = re.sub(r"#.*", "", u, count=1)
    rest = re.sub(r"^[a-zA-Z][a-zA-Z0-9+.\-]*://", "", u, count=1)
    m = re.match(r"^[^/?]*", rest)
    hostport = m.group(0)
    pq = rest[len(hostport):]
    host = hostport.lower()
    host = re.sub(r":(80|443)$", "", host, count=1)
    host = re.sub(r"^www\.", "", host, count=1)
    path = re.match(r"^[^?]*", pq).group(0)
    path = re.sub(r"/+$", "", path, count=1)
    qs = pq[pq.index("?") + 1 :] if "?" in pq else ""
    params = sorted(
        p for p in qs.split("&") if p != "" and not TRACKING.match(p)
    )
    canon = host + path + ("?" + "&".join(params) if params else "")
    hostname = re.sub(r":[0-9]+$", "", host, count=1)
    labels = hostname.split(".")
    k = 3 if MULTI_TLD.search(hostname) else 2
    k = min(k, len(labels))
    domain = ".".join(labels[-k:])
    return host, domain, canon


def _gen_urls(n=250, seed=20260816):
    rng = random.Random(seed)
    urls = []
    for _ in range(n):
        scheme = rng.choice(["https://", "http://", "HTTPS://", "HTTP://", ""])
        www = rng.choice(["www.", "WWW.", ""])
        labels = rng.choice(
            [["ex"], ["site", "com"], ["a", "b", "co", "uk"],
             ["blog", "example", "org"], ["x", "y", "z", "com"]]
        )
        host = ".".join(labels)
        if rng.random() < 0.3:
            host = host.upper() if rng.random() < 0.5 else host.title()
        port = rng.choice(["", ":80", ":443", ":8080"])
        depth = rng.randint(0, 3)
        path = "".join(f"/p{rng.randint(0, 4)}" for _ in range(depth))
        path += rng.choice(["", "/", "//"])
        params = []
        for _ in range(rng.randint(0, 4)):
            params.append(
                rng.choice(
                    ["id=%d" % rng.randint(0, 9), "z=1", "a=2",
                     "utm_source=x", "gclid=abc", "ref=rss", ""]
                )
            )
        qs = "?" + "&".join(params) if params else ""
        frag = rng.choice(["", "#frag", "#a/b?c=1"])
        pad = rng.choice(["", " ", "  "])
        urls.append(pad + scheme + www + host + port + path + qs + frag + pad)
    return urls


def test_canonicalization_matches_python_reference(spark):
    urls = _gen_urls()
    df = spark.createDataFrame(list(enumerate(urls)), ["i", "url"])
    got = {
        r["i"]: (r["host"], r["domain"], r["canon_url"])
        for r in with_url_columns(df, "url").collect()
    }
    for i, url in enumerate(urls):
        assert got[i] == _ref_canon(url), (i, url, got[i], _ref_canon(url))


def test_canonicalization_is_idempotent(spark):
    urls = _gen_urls(seed=20260817)
    df = spark.createDataFrame(list(enumerate(urls)), ["i", "url"])
    once = with_url_columns(df, "url").select(
        "i", F.col("canon_url").alias("url")
    )
    twice = with_url_columns(once, "url").select("i", "canon_url")
    joined = (
        once.withColumnRenamed("url", "c1")
        .join(twice.withColumnRenamed("canon_url", "c2"), "i")
    )
    diverged = joined.where(F.col("c1") != F.col("c2")).collect()
    assert not diverged, diverged[:5]


def test_canonicalization_invariants(spark):
    urls = _gen_urls(seed=20260818)
    df = spark.createDataFrame(list(enumerate(urls)), ["i", "url"])
    out = with_url_columns(df, "url").collect()
    for r in out:
        c = r["canon_url"]
        assert "#" not in c, c
        assert "://" not in c, c
        assert not c.startswith("www."), c
        assert ":80/" not in c and not c.endswith(":80"), c
        assert ":443/" not in c and not c.endswith(":443"), c
        if "?" in c:
            params = c[c.index("?") + 1 :].split("&")
            assert params == sorted(params), c
            assert all(p and not TRACKING.match(p) for p in params), c
        path = c.split("?")[0]
        assert not path.endswith("/"), c

"""Bloom-filter pre-filtered semi-join: membership as a map-side
column expression, exactness restored by a confirm join over the
survivors only.

The classic 100TB semi-join problem: ``big LEFTSEMI keys`` shuffles
the ENTIRE big side on the join key even when only a sliver survives.
This module replaces that full-fact shuffle with:

1. **build** (:func:`build_bloom`): one aggregate over the keys side —
   k hash positions per key (``xxhash64`` with k literal salts),
   OR-folded into ``m_bits/64`` words via a grouped ``bit_or``.  The
   word table collects to the driver — BOUNDED BY CONTRACT at
   ``m_bits/64`` longs (2^16 bits -> 8 KiB; the guard caps m at 2^24
   -> 2 MiB), independent of key count.
2. **probe** (:func:`with_bloom_probe`): membership is a pure column
   expression over the word table bound as ONE array literal —
   ``element_at`` + bitwise AND per hash; no join, no exchange, no
   UDF.  The big side's plan stays scan -> filter (plan-gated in
   tests/test_bloom.py): at scale this runs inside the parquet scan
   stage and drops non-members before ANY shuffle.
3. **confirm** (:func:`bloom_semi_join`): an exact ``leftsemi`` join of
   the few survivors against the keys — removes Bloom false
   positives, so the operator's result is EXACTLY the semi-join (the
   registry oracle is the plain ``IN`` subquery).  The confirm
   shuffle moves only ``selectivity + fp_rate`` of the big side.

Bloom filters have no false negatives (every true key passes the
probe — property-tested), so confirm-after-probe loses nothing.  All
hashes are ``xxhash64`` with fixed integer salts: the filter is
deterministic across runs, engines, and partitionings.

``xxhash64`` is TYPE-sensitive (hash(5 AS INT) != hash(5 AS BIGINT)),
so build and probe canonicalize the key to STRING before hashing —
otherwise a build/probe type mismatch (e.g. an INT fact key probing a
BIGINT dimension build) makes every true member miss and silently
breaks the no-false-negative guarantee the confirm join relies on.

Sizing: fp_rate ~= (1 - e^{-k*n/m})^k; the default (m=2^16, k=3)
holds ~1.3% at n=6500 keys.  Callers with larger key sets raise
``m_bits`` (capped) or accept a weaker pre-filter — correctness never
depends on the rate, only the shuffle saving does.

Spark's own runtime Bloom pushdown (spark.sql.optimizer.runtime.
bloomFilter.*) covers equi-joins the optimizer can see through; this
operator exists for what it cannot: a keys side produced by arbitrary
upstream logic, REUSE of one built table across many probe frames,
and an explicitly bounded driver artifact that can be persisted
beside an index (the cli.py minhash/ann index pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_BLOOM_BITS = 1 << 24


def _canonical_key(key_col: str):
    """Canonical hash input: xxhash64 hashes the VALUE+TYPE, so an INT
    build probed by a BIGINT key would miss every true member.  Casting
    to string unifies all integral/char widths of the same value."""
    return F.col(key_col).cast("string")


def build_bloom(
    keys: DataFrame,
    key_col: str,
    *,
    m_bits: int = 1 << 16,
    n_hashes: int = 3,
) -> list[int]:
    """Aggregate the keys side into a dense ``m_bits/64``-word Bloom
    table (python list of int64 words, index = bit_position div 64)."""
    if m_bits % 64 != 0 or m_bits <= 0 or m_bits > MAX_BLOOM_BITS:
        raise ValueError(
            f"m_bits must be a positive multiple of 64 <= {MAX_BLOOM_BITS}"
        )
    if n_hashes < 1:
        raise ValueError("n_hashes must be >= 1")
    pos = keys.select(
        F.explode(
            F.array(
                *[
                    F.pmod(
                        F.xxhash64(_canonical_key(key_col), F.lit(i)),
                        F.lit(m_bits),
                    )
                    for i in range(n_hashes)
                ]
            )
        ).alias("pos")
    )
    words = (
        pos.select(
            F.expr("pos div 64").alias("word"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pmod(pos, 64) AS INT))"
            ).alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
        .collect()  # bounded by contract: m_bits/64 rows max
    )
    table = [0] * (m_bits // 64)
    for row in words:
        table[row["word"]] = row["bits"]
    return table


def shrink_bloom(
    table: list[int],
    *,
    max_density: float = 0.125,
    min_words: int = 16,
) -> list[int]:
    """EXACTLY fold a power-of-two Bloom table down to the smallest
    size whose set-bit density stays under ``max_density``.

    Because ``m`` is a power of two, ``h % (m/2) == (h % m) % (m/2)``,
    so OR-ing the upper half of the word table onto the lower half
    yields precisely the filter that a direct build at ``m/2`` would
    have produced — no false negatives can be introduced, only the
    false-positive rate rises (bounded by ``max_density**n_hashes``).

    Why: the probe ships the table as ONE array literal; a 2^16-bit
    build is 1024 elements, and measured client-side plan construction
    plus first analysis of that literal costs ~2s — dominating small
    key sets that only need a few words.  Build big (cheap server-side
    bit_or), then shrink the LITERAL to what the key count actually
    needs."""
    def density(words: list[int]) -> float:
        bits = sum((w & 0xFFFFFFFFFFFFFFFF).bit_count() for w in words)
        return bits / (len(words) * 64)

    while len(table) > max(1, min_words) and len(table) % 2 == 0:
        half = len(table) // 2
        folded = [table[i] | table[i + half] for i in range(half)]
        if density(folded) > max_density:
            break
        table = folded
    return table


def with_bloom_probe(
    df: DataFrame,
    key_col: str,
    table: list[int],
    *,
    m_bits: int,
    n_hashes: int,
    flag_col: str = "__bloom_hit",
) -> DataFrame:
    """Attach boolean ``flag_col``: True iff ``key_col`` might be in the
    filter (guaranteed True for every key the table was built from).

    Pure narrow projection — no exchange, no UDF; the word table rides
    the plan as one array literal; each probe is an ``element_at`` +
    bitwise AND.
    """
    if len(table) * 64 != m_bits:
        raise ValueError("table length does not match m_bits")
    tmp = df.withColumn("__bloom_words", F.lit(table))
    pos_cols = []
    for i in range(n_hashes):
        c = f"__bloom_pos_{i}"
        tmp = tmp.withColumn(
            c,
            F.pmod(F.xxhash64(_canonical_key(key_col), F.lit(i)), F.lit(m_bits)),
        )
        pos_cols.append(c)
    cond = None
    for c in pos_cols:
        term = F.expr(
            f"(element_at(__bloom_words, CAST({c} div 64 AS INT) + 1)"
            f" & shiftleft(CAST(1 AS BIGINT), CAST(pmod({c}, 64) AS INT))) != 0"
        )
        cond = term if cond is None else cond & term
    return tmp.withColumn(flag_col, cond).drop("__bloom_words", *pos_cols)


def bloom_semi_join(
    big: DataFrame,
    big_key: str,
    keys: DataFrame,
    key_col: str,
    *,
    m_bits: int = 1 << 16,
    n_hashes: int = 3,
) -> DataFrame:
    """EXACT semi-join of ``big`` against ``keys``: Bloom probe
    (map-side, zero shuffle on the big side) then a confirming
    ``leftsemi`` join over the survivors only.  The built table is
    shrink-folded to the key count's actual size before riding the
    plan (see :func:`shrink_bloom`) — exactness is unaffected (the
    confirm join removes false positives; folding adds no false
    negatives)."""
    table = shrink_bloom(
        build_bloom(keys, key_col, m_bits=m_bits, n_hashes=n_hashes)
    )
    eff_bits = len(table) * 64
    pruned = with_bloom_probe(big, big_key, table, m_bits=eff_bits, n_hashes=n_hashes)
    survivors = pruned.where(F.col("__bloom_hit")).drop("__bloom_hit")
    return survivors.join(
        keys.select(F.col(key_col).alias(big_key)).distinct(),
        on=big_key,
        how="leftsemi",
    )

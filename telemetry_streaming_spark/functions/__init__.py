"""Shared column-expression helpers used across operator families."""

from pyspark.sql import Column, functions as F

__all__ = ["epoch_seconds"]


def epoch_seconds(ts_col: str) -> Column:
    """Exact ``floor(epoch seconds)`` of a timestamp column as BIGINT.

    ``unix_micros(ts) div 1000000`` truncates toward zero, which rounds
    UP for pre-1970 timestamps with fractional seconds, while the
    oracles floor via ``FLOOR(epoch(...))`` — so window ordering and
    hashes could diverge on pre-epoch data (r7 ADVICE).  NB: DuckDB's
    ``//`` is NOT a floor — it also truncates toward zero (verified on
    1.0.0: -7 // 2 = -3); only ``FLOOR(epoch(...))`` floors.  Subtracting ``pmod`` (always non-negative) first
    makes the numerator an exact multiple of 1e6, so the integer ``div``
    IS the floor for every input — all-BIGINT, no double round-trip.
    """
    us = f"unix_micros(`{ts_col}`)"
    return F.expr(f"({us} - pmod({us}, 1000000)) div 1000000")

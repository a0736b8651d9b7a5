"""Named query definitions: Spark DataFrame plan + DuckDB oracle SQL.

Each entry is the same logical query expressed twice — idiomatic PySpark
(lazy, Catalyst-optimized) and ANSI SQL for DuckDB. The driver hash-compares
values, so float determinism is engineered per query:

- per-row arithmetic (add/mul/div) is IEEE-754-identical across engines —
  no rounding needed;
- sums of exact binary fractions (sizes are multiples of 0.25) are exact in
  any order — no rounding needed;
- money-style aggregates use DECIMAL accumulation (exact, order-free),
  ROUNDED TO 2 dp before the cast back to DOUBLE: a wide decimal whose
  value x 10^scale exceeds 2^53 does not convert to double correctly
  rounded in every engine (DuckDB's int128 / 10^scale path lands ulps
  off around 1e9 at 8 dp — measured at sf0.1), while money x 100 stays
  far inside 2^53 so the final division rounds identically everywhere;
- genuinely associativity-sensitive reductions (rolling variance of
  returns, correlations, cosine) are rounded at a granularity several
  orders of magnitude above the worst-case reordering error.
"""

from __future__ import annotations

# Compatibility surface: the registry and shared helpers live in
# plans/base.py; gate definitions self-register on import of the domain
# modules below. Importing THIS module (the historical entry point)
# loads the full registry exactly as before the split.
from market_microstructure_toolkit_spark.plans.base import (  # noqa: F401
    IDS,
    KEYS,
    REGISTRY,
    QueryDef,
    register,
    _docs,
    _emb,
    _memo_tape,
    _scratch,
    _split2,
    _split3,
    _stamp_batch_order,
    _tape2,
)
from market_microstructure_toolkit_spark.plans import market_queries  # noqa: F401,E402
from market_microstructure_toolkit_spark.plans import tpch_queries  # noqa: F401,E402
from market_microstructure_toolkit_spark.plans import events_queries  # noqa: F401,E402
from market_microstructure_toolkit_spark.plans import corpus_queries  # noqa: F401,E402
from market_microstructure_toolkit_spark.plans import similarity_queries  # noqa: F401,E402
from market_microstructure_toolkit_spark.plans import streaming_queries  # noqa: F401,E402
from market_microstructure_toolkit_spark.plans.similarity_queries import (  # noqa: F401,E402
    _pq_adc_from,
)


def _rotate_registry() -> None:
    """Deterministically rotate the registry's insertion order by round
    (round-9 verdict #2): the driver's independent correctness gate
    samples the FIRST 50 entries, and with a fixed order it had audited
    the identical 50 gates since round 4 while the other ~129 rested on
    the builder's own harness. Rotating the dict start by
    ``50 * (round % 4)`` exposes a fresh stratum to the driver each
    round — a pure reordering: zero semantic change, every gate keeps
    its name, callable, and oracle. ``SPARK_GRAFT_ROUND`` overrides for
    reproducing an earlier round's sample (0 restores the historical
    order).

    The round number defaults to the latest ``round`` in the driver's
    ``PROGRESS.jsonl`` heartbeat, so the rotation advances every round
    WITHOUT a manual bump of a hardcoded default (the failure mode: a
    stale constant freezes the driver's sample on one stratum again —
    exactly what the rotation exists to prevent). Falls back to 10 (the
    round that introduced rotation) when the file is absent."""
    import json
    import os

    rnd = 0
    try:
        with open(os.path.join(os.path.dirname(__file__), "..", "..",
                               "PROGRESS.jsonl")) as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                try:
                    rnd = int(json.loads(line).get("round", 0)) or rnd
                except Exception:
                    # a malformed heartbeat line ("round": null, a non-
                    # object JSON value, trailing garbage) must degrade
                    # to the previous good round, never crash package
                    # import (round-10 ADVICE #1)
                    continue
    except OSError:
        pass
    rnd = int(os.environ.get("SPARK_GRAFT_ROUND", str(rnd or 10)))
    # Offset schedule (round-10 verdict #1): ``50*(rnd%4)`` deferred the
    # never-driver-sampled strata — entries 50-99 (trade/TPC-H/events)
    # would not have surfaced until round 13, and 150-179 (streaming)
    # until round 12+. Rounds >= 11 walk a PRIORITY list that fronts the
    # unverified strata first: round 11 -> offset 50, round 12 -> 150,
    # then the cycle continues so every stratum keeps recurring. Rounds
    # <= 10 keep the historical formula so SPARK_GRAFT_ROUND can
    # reproduce any earlier round's driver sample bit-for-bit.
    if rnd >= 11:
        off = [50, 150, 0, 100][(rnd - 11) % 4]
    else:
        off = 50 * (rnd % 4)
    off %= max(1, len(REGISTRY))
    if off == 0:
        return
    items = list(REGISTRY.items())
    REGISTRY.clear()
    REGISTRY.update(items[off:] + items[:off])


_rotate_registry()
from market_microstructure_toolkit_spark.plans.book import (  # noqa: F401,E402
    BOOK_DEPTH,
    ORDER_COLS,
    book_sql,
    synthetic_book,
    synthetic_trades,
    trades_sql,
)

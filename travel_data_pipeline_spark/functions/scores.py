"""Business scoring functions — SURVEY.md §2.9.

The reference's scoring blocks (exchange score
exchage_rate_crawler.py:604-649; trend score
google_trends_processor.py:162-223; flight score
_archive/flight_avg_merge.py:45-48) re-expressed as pure
Column-expression builders. Golden tests in tests/test_functions.py pin
the exact edge semantics (epsilon growth path, clamps, NaN asymmetry,
degenerate ranges) — SURVEY.md §7 hard part (a).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from travel_data_pipeline_spark.functions import scalars as X


# ---------------------------------------------------------------------------
# W3 — period-over-period growth with epsilon fallback
# google_trends_crawler.py:82-92 (epsilon :91-92), anchor variant :103-111.
# ---------------------------------------------------------------------------

def growth_rate(recent_mean: Column, prev_mean: Column) -> Column:
    """(recent - prev)/prev; prev==0 and recent>0 -> recent/1e-6; else 0."""
    return (F.when(prev_mean > 0, (recent_mean - prev_mean) / prev_mean)
             .when(recent_mean > 0, recent_mean / F.lit(1e-6))
             .otherwise(F.lit(0.0)))


def anchor_growth_rate(recent_mean: Column, prev_mean: Column) -> Column:
    """Anchor variant: prev==0 but recent>0 snaps to 1.0 instead of the
    epsilon blow-up (google_trends_crawler.py:108-111)."""
    return (F.when(prev_mean > 0, (recent_mean - prev_mean) / prev_mean)
             .when(recent_mean > 0, F.lit(1.0))
             .otherwise(F.lit(0.0)))


# ---------------------------------------------------------------------------
# Trend score — google_trends_processor.py:162-223 (X9 + X11 + X12)
# ---------------------------------------------------------------------------

def trend_score(raw_growth: Column, interest: Column) -> Column:
    """log-compress growth -> scale to 100 -> 0.7/0.3 blend, clamp [0,100].

    Coercion asymmetry (X17): callers pass raw_growth already defaulted
    to 0.0 (crawler path) while keeping a separate nullable raw column
    (processor path).
    """
    compressed = X.log_compress(raw_growth)
    norm_growth = X.scale_to_100(compressed)
    return X.weighted_score(norm_growth, interest, 0.7, 0.3)


# ---------------------------------------------------------------------------
# Exchange score — exchage_rate_crawler.py:604-649 (F6 + X10 + X13)
# ---------------------------------------------------------------------------

def exchange_change_pct(realtime: Column, yearly_avg: Column) -> Column:
    """(realtime - yearly)/yearly*100, gated: NULL inputs or yearly<=0 ->
    NULL change (the reference keeps exchange_rate_change_percent=None,
    exchage_rate_crawler.py:606-646), rounded to 2 dp."""
    ok = realtime.isNotNull() & yearly_avg.isNotNull() & (yearly_avg > 0)
    return F.when(ok, F.round(X.pct_change(realtime, yearly_avg), 2))


def exchange_score(realtime: Column, yearly_avg: Column,
                   min_change: float = -10.0, max_change: float = 10.0) -> Column:
    """Linear rescale of change% over the +-10% band to [0,100]; cheaper
    currency (negative change) scores high; gated inputs score 0.0;
    rounded to 2 dp (exchage_rate_crawler.py:604-649)."""
    ok = realtime.isNotNull() & yearly_avg.isNotNull() & (yearly_avg > 0)
    change = X.pct_change(realtime, yearly_avg)
    rng = max_change - min_change
    scaled = (F.lit(max_change) - change) / F.lit(rng) * F.lit(100.0)
    return F.round(
        F.when(ok, X.clamp(scaled, 0.0, 100.0)).otherwise(F.lit(0.0)), 2)


# ---------------------------------------------------------------------------
# Flight score — _archive/flight_avg_merge.py:45-48 (X13 + X14 + X15)
# ---------------------------------------------------------------------------

def flight_price_pct_diff(price: Column, avg_price: Column) -> Column:
    return F.round(X.pct_change(price, avg_price), 2)


def flight_direction(pct_diff: Column) -> Column:
    return X.sign_category(pct_diff)


def flight_score(pct_diff: Column) -> Column:
    """Above-average price scores -1, below-average +1, equal 0."""
    return X.sign_score(pct_diff)


# ---------------------------------------------------------------------------
# J9 — final destination-attractiveness score (README.md:80-87 [prose-only]):
# documented weighted combination of the three per-domain scores.
# ---------------------------------------------------------------------------

def attractiveness_score(exchange: Column, trend: Column, flight: Column,
                         w_exchange: float = 0.4, w_trend: float = 0.4,
                         w_flight: float = 0.2) -> Column:
    """Country-grain blend; missing domains contribute 0 but are
    null-audited upstream per the J8 LEFT-JOIN coverage policy."""
    e = F.coalesce(exchange, F.lit(0.0))
    t = F.coalesce(trend, F.lit(0.0))
    fl = F.coalesce(flight, F.lit(0.0))
    return X.clamp(e * F.lit(w_exchange) + t * F.lit(w_trend)
                   + (fl + F.lit(1.0)) * F.lit(50.0) * F.lit(w_flight), 0.0, 100.0)

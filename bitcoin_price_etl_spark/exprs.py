"""Shared expression helpers enforcing the oracle-parity discipline.

Double summation is order-sensitive; Spark's partial aggregation order differs
from DuckDB's, so raw SUM(double) can differ in the last ulps and break the
driver's exact value hash. Casting each element to DECIMAL first makes the
sum exact and associative — both engines then produce bit-identical doubles
after the final cast. (SURVEY.md §7 hard-part 4.)

Scale choice: engines convert double→decimal differently (Spark rounds the
shortest decimal repr; C engines round the exact binary value), and the two
disagree when the double sits within ~1 ulp of a half-quantum boundary. At
scale 10 the quantum IS the ulp for money-magnitude values, so disagreement
is common (observed at sf0.01). The fixture data is money-like — at most 2
fractional digits, products at most 4 — so scale 4 keeps every conversion
far from any boundary (distance ~1e-5 vs ulp ~1e-11) and both engines
convert identically. DECIMAL(38,4) holds sums to 1e34: no overflow at any
scale factor.

Domain contract: a single VALUE with |v| ≥ 1e34 (feed garbage — a parse
glitch emitting 1e300) fails the element cast LOUDLY in both engines
(ANSI CAST_OVERFLOW; DuckDB likewise), never silently wraps. That is
deliberate: out-of-domain measurements are an INGEST-VALIDATION concern
(plans/validate.py quarantines them, the reference's Pydantic stance),
not something every aggregate should branch on. try_cast here would
convert loud corruption into silent row loss.

Quantize-then-double (round 2): when a checked value is inherently
order-sensitive or libm-dependent — partial-agg double sums/averages
(llm_embed_centroids), ln/exp derivatives (llm_tfidf), ratios of saturated
high-precision moments (agg_corr) — neither raw doubles (certain last-ulp
drift) nor high-scale decimals (conversion-boundary drift) survive the
hash gate. The discipline: quantize the FINAL value through a COARSE
decimal whose quantum sits ≥6 orders above the noise floor, on BOTH
sides, then cast back to DOUBLE at the edge (never emit DECIMAL itself:
the driver's canonicalizer hashes Spark and DuckDB decimal objects
differently — the round-1 agg_corr failure). If the quantized value feeds
an ORDER BY (tfidf ranking), sort on the decimal BEFORE the double cast so
both engines rank identical exact values. Also never emit arrays in
checked outputs (pandas canonicalizer cannot hash list cells — the
round-1 agg_listagg crash); join them to delimited strings.

Round-4 refinements — when quantize-then-double is NOT enough:

1. QUOTIENT doubles defeat the coarse-decimal rule. A value of the form
   exact-decimal / small-integer (an hourly davg, a detrended delta)
   has a shortest repr that can TERMINATE exactly on the quantum
   boundary digit (…4445 at scale+1), where Spark's repr-HALF_UP and
   DuckDB's binary rounding split — observed at ~0.3% of detrended
   values in ts_seasonal_decompose, far from measure-zero. For derived
   means over such values use PINNED-ORDER SEQUENTIAL FOLDS instead:
   Spark `aggregate()` over a frame/array collected in a pinned order
   (window frame order, or array_sort(collect_list(struct(key, v))))
   ≡ DuckDB `list_reduce(list(v ORDER BY key), …)` — both engines add
   bit-identical operands in the identical sequence, then divide once.
   Bounded frames only (a window frame, a per-calendar-cell list, a
   32-dim vector) — never corpus-sized lists.

2. SCALED-INTEGER space makes even ITERATIVE algorithms hash-exact.
   floor(x·10^s + 0.5) maps a float to int64 through multiply/add/floor
   — IEEE ops with NO rounding-mode ambiguity on identical operands
   (divergence needs x·10^s within one ulp of a half-integer, ~1e-11
   per element — genuinely measure-zero, unlike the decimal-cast
   boundary class). Exact integer sums + one double divide per mean +
   floor(mean + 0.5) re-quantization keep every iteration's state
   bit-identical across engines (llm_embed_drift, llm_kmeans_train —
   the latter proves 3 Lloyd rounds end-to-end under the hash gate).

Round-7 refinement — the sf0.1 audit's classification of every
quantize-of-a-COMPUTED-double site (the memory rule-11 class; four keys
diverged at sf0.1 and were restated exactly: ts_rsi, win_rolling_beta,
ts_lead_lag_xcorr, ts_cusum_changepoint):

- A quantize is NECESSARY (rule-2 class, keep it) when the quantized
  value is libm-derived (pow/ln/exp differ by ulps between engines) or
  its operands differ by construction (partial-agg double sums) — the
  coarse decimal is the only thing making the two engines agree, and
  its residual midpoint risk (~P[value within 1 double-ulp of a
  half-quantum] × n_values) is ACCEPTED and only material at corpus
  scales beyond any fixture (the remaining 18,6/14,6/12,6 sites in
  ewma/tfidf/t-stat/gini-class operators are all this category, green
  at sf0.001/0.01/0.1).
- A quantize is a LATENT BUG (remove it) when every operand is already
  bit-identical and every op correctly rounded — the quantize ADDS the
  midpoint class where none existed. Restatement recipes, in preference
  order: exact-decimal numerator/denominator + ONE double division
  (ts_rsi, win_rolling_beta — decimal product-differences also kill the
  FMA shape; keep scaled ints < 2^53 via lossless downscales so
  DuckDB's decimal→double stays single-rounded); scale-through-by-N so
  a window SUM runs on exact decimals (ts_cusum_changepoint); pinned-
  order sequential folds (ts_lead_lag_xcorr — but DuckDB 1.0
  list_reduce is nondeterministic on multi-row ~700-element struct
  folds and mis-evaluates correlated lambda captures: oracle folds must
  be capture-free and small/single-row; see BASELINE.md r7 audit).

Round-10 additions — two non-float divergence classes:

- DECIMAL PRECISION-CAP DEMOTION: a Spark decimal product whose nominal
  result precision exceeds 38 (p1+p2+1 > 38) is SILENTLY demoted — scale
  shrinks and the value HALF_UP re-rounds one digit early — while DuckDB
  keeps the exact wider product. Keep every product's operand precisions
  at p1+p2+1 <= 38 on BOTH sides (validate_benford: DECIMAL(19,0) x
  (18,8) -> (38,8) exact; the original (20,0) demoted to (38,7) and
  diverged for any n_total not a multiple of 10 — r9 ADVICE, proven at
  n_total=1437).
- BYTES vs CODE POINTS: any oracle that reconstructs what the engine
  consumes as UTF-8 BYTES must extract bytes — hex(encode(s)) hex-pair
  arithmetic — never ord()/ascii() of characters, which read CODE POINTS
  and coincide with bytes only on ASCII (llm_multimodal_phash: 920
  missing pairs on the sf0.1 hostile-text corpus, invisible at fixture
  scale). Same trap in reverse: Spark substring/rpad count characters,
  so take the char-space prefix FIRST, identically on both sides, then
  go to bytes.
- EXACT INTEGER ROUND-HALF-UP beats quantize for single ratios of
  integers: round_half_up(a/b, s dp) = (2*a*10^s + b) DIV (2*b) in pure
  integer arithmetic (both engines, no rounding discretion at any
  scale); cast the small quotient to double and divide by 10^s exactly.
  Used by graph_triangle_count's clustering ratio — the preferred form
  whenever numerator and denominator are exact integers/decimals (keep
  Spark's product precision under the 38 cap per the demotion rule).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "DECIMAL(38,4)"
TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"


def dec(scale: int) -> str:
    """Decimal type wide enough for any SF, at the given fractional scale.

    Scale rule: use the smallest scale that exactly represents the data
    (2-decimal money → 4 is already generous; products of two money columns
    → 4; products of three → 6). See module docstring for why over-scaling
    breaks cross-engine conversion.
    """
    return f"DECIMAL(38,{scale})"


def dsum(col: str, alias: str, scale: int = 4) -> Column:
    """Exact, order-insensitive sum of a double column, emitted as double.
    `col` may be any SQL expression whose exact value fits the scale."""
    return F.expr(f"CAST(SUM(CAST({col} AS {dec(scale)})) AS DOUBLE)").alias(alias)


def davg(col: str, alias: str) -> Column:
    """Exact-sum average: decimal sum divided by count, as double.

    Division happens once on identical operands in both engines, so the
    result is bit-identical (unlike AVG(double) or AVG(decimal), whose
    internal rounding differs between engines).
    """
    return F.expr(
        f"CAST(SUM(CAST({col} AS {DEC})) AS DOUBLE) / COUNT({col})"
    ).alias(alias)


def dsum_sql(col: str, alias: str, scale: int = 4) -> str:
    return f"CAST(SUM(CAST({col} AS {dec(scale)})) AS DOUBLE) AS {alias}"


def davg_sql(col: str, alias: str) -> str:
    return f"CAST(SUM(CAST({col} AS {DEC})) AS DOUBLE) / COUNT({col}) AS {alias}"


def ts_str(col: str, alias: str) -> Column:
    """Format a timestamp to 'yyyy-MM-dd HH:mm:ss' (UTC session tz)."""
    return F.date_format(F.col(col), TS_FMT_SPARK).alias(alias)


def ts_str_sql(col: str, alias: str) -> str:
    return f"strftime({col}, '{TS_FMT_DUCK}') AS {alias}"


def literal_rows_df(spark, rows, schema: str):
    """One-partition, JVM-only literal frame for control-plane results.

    spark.createDataFrame(list_of_tuples) ships the rows through a
    Python RDD parallelized to spark.default.parallelism — for a 1-row
    audit frame on local[32] that is 32 tasks, each paying a Python
    worker round trip. Measured in the round-9 canonical bench session:
    the noop write of validate_observe_metrics' ONE literal row cost
    2-12 s mid-session (32 Python worker spin-ups under worker-pool
    churn; 12.2 s warm MEDIAN over 5 reps) vs ~0.03 s for the same row
    built JVM-side. At cluster scale the same shape is one scheduler
    wave of empty Python tasks per audit row — pure waste.

    This builds the frame as F.inline over an array of literal structs
    on a single-partition range: zero Python workers, zero shuffle,
    OneRowRelation-class cost at any session age. Types come from the
    DDL schema string via casts, so the result schema is identical to
    the createDataFrame(...) it replaces (NULLs included).
    """
    if not rows:
        # F.inline over a zero-element array is array<null> — Analysis
        # Exception. An empty createDataFrame is pure driver-side schema
        # construction (no Python-RDD rows to ship), so it is the
        # drop-in-safe empty form (r9 ADVICE).
        return spark.createDataFrame([], schema)
    st = spark.createDataFrame([], schema).schema
    structs = [
        F.struct(
            *[
                F.lit(v).cast(f.dataType).alias(f.name)
                for v, f in zip(row, st.fields)
            ]
        )
        for row in rows
    ]
    return spark.range(0, 1, 1, 1).select(F.inline(F.array(*structs)))

"""E8: probing-task evaluation over cached representations.

Reference: scripts/probing_task_evaluation.py — a SentEval-style harness
that (a) caches the model's ``input_rep`` keyed by instance id
(lines 127-160: only ids not already in the cache are sent through the
predictor), then (b) trains a probing classifier per task (Length,
EntityDistance, ArgumentOrder, ... — lines 20-51) on those
representations and reports per-task scores.

Spark-first re-expression:

* ``cached_representations`` — the id-keyed cache as a DataFrame contract:
  an anti-join splits candidates into cache hits and misses, ONLY the
  misses run the scoring kernel (M19 representation tap), and the union is
  the probe input. Same dedupe-by-id semantics, but distributed and lazy
  instead of a driver-side dict.
* ``probing_task_labels`` — the probe targets, derived from the candidate
  features in pure JVM SQL (no Python): Length = token count,
  EntityDistance = tokens strictly between the argument spans,
  ArgumentOrder = head-before-tail indicator.
* ``probe_scores`` — the probe itself as a DETERMINISTIC closed form
  instead of SGD: per (task, direction) a 1-D ridge regression of the task
  label on the representation's projection onto a seeded ±1/0 direction,
  solved exactly from integer sufficient statistics (the projection is
  quantized to milli-units first, so every sum is an exact BIGINT and the
  slope is an exact rational). The reference's probe is a trained logistic
  head whose SGD trajectory is not portable across engines; the
  closed-form ridge keeps the part that matters for an engine — "fit a
  linear probe on input_rep and report how predictable each task is" —
  byte-reproducible. R² is computed in double FROM the exact integer sums
  (one deterministic expression, pinned by the golden + the independent
  numpy replay in tests/test_probing.py).

Scale shape: one narrow mapInPandas for the cache misses (dedup-by-id
before inference, as everywhere else), then a single groupBy over
(task, direction) — 9 groups — with map-side combine; the closed form is
arithmetic on the 6-number aggregate, no second pass, no collect.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: probing tasks implemented (reference task list, scripts/
#: probing_task_evaluation.py:20-51 — the subset whose labels derive from
#: the candidate features the engine carries; POS/tree tasks need the
#: fixture's tag/dep columns and are listed as unported in SURVEY §2)
PROBE_TASKS = ("length", "entity_distance", "argument_order")

#: ridge penalty in the (milli-unit projection)^2 space — small enough to
#: leave well-conditioned fits unchanged, nonzero so a constant projection
#: (all-zero direction draw) cannot divide by zero
RIDGE_LAMBDA = 1000


def probe_direction(task: str, direction: int, dim: int) -> list[int]:
    """Seeded deterministic probe direction: component j is
    md5("probe:<task>:<direction>:<j>") mapped to {-1, 0, +1}. Replayable
    from the spec by any engine — no RNG state."""
    out = []
    for j in range(dim):
        h = hashlib.md5(f"probe:{task}:{direction}:{j}".encode()).digest()[0]
        out.append(h % 3 - 1)
    return out


def cached_representations(
    candidates: DataFrame,
    weights_bc,
    encoder: str = "cnn",
    cache: DataFrame | None = None,
) -> DataFrame:
    """Id-keyed representation cache (probing_task_evaluation.py:127-160):
    rows whose id is already in ``cache`` are NOT re-scored; only the
    misses cross the Arrow boundary into the kernel. Returns
    (id, embedding) for every distinct candidate id.

    ``cache`` is any DataFrame with (id, embedding) — typically a previous
    run's output persisted to parquet (the distributed analogue of the
    reference's in-process dict)."""
    from relex_spark.scoring.scorer import score_candidates

    uniq = candidates.dropDuplicates(["id"])
    if cache is None:
        misses = uniq
    else:
        # the distributed analogue of dict-key uniqueness: a cache written
        # twice (append-mode parquet, unioned run outputs) must not yield
        # duplicate probe-input rows
        cache = cache.select("id", "embedding").dropDuplicates(["id"])
        misses = uniq.join(cache.select("id"), "id", "left_anti")
    computed = score_candidates(
        misses,
        weights_bc,
        keep_columns=["id"],
        encoder=encoder,
        with_representation=True,
    ).select("id", "embedding")
    if cache is None:
        return computed
    # hits come straight from the cache; misses from the kernel
    hits = cache.join(uniq.select("id"), "id")
    return hits.unionByName(computed)


def probing_task_labels(candidates: DataFrame) -> DataFrame:
    """Per-id integer probe targets from the candidate features (pure JVM
    SQL): Length (token count), EntityDistance (tokens strictly between
    the spans, 0 when adjacent/overlapping), ArgumentOrder (1 when the
    head starts at or before the tail)."""
    between = F.greatest(
        F.greatest("head_start", "tail_start")
        - F.least("head_end", "tail_end")
        - F.lit(1),
        F.lit(0),
    )
    return candidates.select(
        "id",
        F.size("tokens").cast("bigint").alias("length"),
        between.cast("bigint").alias("entity_distance"),
        (F.col("head_start") <= F.col("tail_start"))
        .cast("bigint")
        .alias("argument_order"),
    )


def probe_scores(
    reps: DataFrame,
    labels: DataFrame,
    dim: int,
    n_directions: int = 3,
    ridge_lambda: int = RIDGE_LAMBDA,
) -> DataFrame:
    """Closed-form linear probe per (task, direction).

    For each task t and seeded direction d: X = floor(1000 * <embedding,
    dir(t,d)> + 0.5) (exact BIGINT), Y = the task label. Ridge fit
    Y ~= a + b*X with penalty λ on b:

        b = (n·ΣXY − ΣX·ΣY) / (n·ΣXX − (ΣX)² + n·λ)      (exact rational)
        a = (ΣY − b·ΣX) / n

    Output per (task, direction): n, slope_num/slope_den (the EXACT
    rational), intercept_u6 = floor(1e6·a + 0.5), and r2_u6 = floor(1e6·R²
    + 0.5) with R² = 1 − SSres/SStot evaluated in double from the exact
    integer sums (SStot = n·ΣYY − (ΣY)²; SSres over the same sums).

    One shuffle: groupBy(task, direction) over n_tasks × n_directions
    groups with map-side combine."""
    per_dir = []
    for task in PROBE_TASKS:
        for d in range(n_directions):
            vec = probe_direction(task, d, dim)
            dot = F.aggregate(
                F.zip_with(
                    F.col("embedding").cast("array<double>"),
                    F.array(*[F.lit(float(v)) for v in vec]),
                    lambda a, b: a * b,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            per_dir.append(
                F.struct(
                    F.lit(task).alias("task"),
                    F.lit(d).alias("direction"),
                    F.floor(dot * F.lit(1000.0) + F.lit(0.5))
                    .cast("bigint")
                    .alias("x"),
                    F.col(task).alias("y"),
                )
            )
    joined = reps.join(labels, "id")
    melted = joined.select(
        F.explode(F.array(*per_dir)).alias("p")
    ).select("p.task", "p.direction", "p.x", "p.y")
    agg = melted.groupBy("task", "direction").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy, syy = F.col("sxx"), F.col("sxy"), F.col("syy")
    num = n * sxy - sx * sy
    den = n * sxx - sx * sx + n * F.lit(int(ridge_lambda))
    # doubles from exact integers: one deterministic expression each
    b = num.cast("double") / den.cast("double")
    a = (sy.cast("double") - b * sx.cast("double")) / n.cast("double")
    # SSres = ΣYY − 2aΣY − 2bΣXY + na² + 2abΣX + b²ΣXX ; SStot = ΣYY − (ΣY)²/n
    ss_res = (
        syy.cast("double")
        - 2.0 * a * sy.cast("double")
        - 2.0 * b * sxy.cast("double")
        + n.cast("double") * a * a
        + 2.0 * a * b * sx.cast("double")
        + b * b * sxx.cast("double")
    )
    ss_tot = syy.cast("double") - sy.cast("double") * sy.cast("double") / n.cast("double")
    r2 = F.when(ss_tot > 0.0, 1.0 - ss_res / ss_tot).otherwise(F.lit(0.0))
    return agg.select(
        "task",
        "direction",
        "n",
        num.cast("bigint").alias("slope_num"),
        den.cast("bigint").alias("slope_den"),
        F.floor(a * F.lit(1e6) + F.lit(0.5)).cast("bigint").alias("intercept_u6"),
        F.floor(r2 * F.lit(1e6) + F.lit(0.5)).cast("bigint").alias("r2_u6"),
    )


def run_probing_evaluation(
    spark,
    candidates: DataFrame,
    weights_bc,
    encoder: str = "cnn",
    cache: DataFrame | None = None,
    n_directions: int = 3,
) -> DataFrame:
    """E8 end-to-end: cache-aware representation extraction → task labels →
    closed-form probe. Returns one row per (task, direction).

    Candidates are deduped by id up front (reference semantics: the probe
    sees each instance once — probing_task_evaluation.py caches per id);
    without this, duplicated candidate ids would silently inflate every
    sufficient statistic while the rep side stayed unique."""
    uniq = candidates.dropDuplicates(["id"])
    reps = cached_representations(uniq, weights_bc, encoder=encoder, cache=cache)
    labels = probing_task_labels(uniq)
    # the classifier input dim IS the representation dim (M19 taps the
    # encoder output that feeds ff_w)
    dim = int(weights_bc.value.ff_w.shape[0])
    return probe_scores(reps, labels, dim, n_directions=n_directions)

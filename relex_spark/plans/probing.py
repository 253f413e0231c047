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


#: the reference's FULL TACRED probing-task list
#: (scripts/probing_task_evaluation.py:20-35), snake_cased. Categorical
#: tasks (arg types, POS neighbours, grammatical roles) become binary
#: class-membership probes against TACRED_PROBE_CLASSES — the reference
#: trains a multiclass logistic head; the deterministic closed form here
#: probes linear separability of one named class (parameterizable).
TACRED_PROBE_TASKS = (
    "arg_type_head",
    "arg_type_tail",
    "length",
    "entity_distance",
    "argument_order",
    "entity_exists_between_head_tail",
    "pos_tag_head_left",
    "pos_tag_head_right",
    "pos_tag_tail_left",
    "pos_tag_tail_right",
    "tree_depth",
    "sdp_tree_depth",
    "argument_head_grammatical_role",
    "argument_tail_grammatical_role",
)

#: class of interest per categorical task (chosen so the fixture labels
#: vary where the data allows; any class is valid — it only parameterizes
#: the binary membership target)
TACRED_PROBE_CLASSES = {
    "arg_type_head": "PERSON",
    "arg_type_tail": "PERSON",
    "pos_tag_head_left": "NNP",
    "pos_tag_head_right": "VBD",
    "pos_tag_tail_left": "VB",
    "pos_tag_tail_right": ",",
    "argument_head_grammatical_role": "nsubj",
    "argument_tail_grammatical_role": "nsubj",
}


def _span_tree_features(
    dep_heads: list[int],
    dep: list[str],
    head: tuple[int, int],
    tail: tuple[int, int],
    prune: int,
) -> tuple[int, int, str, str]:
    """(tree_depth, sdp_tree_depth, head_role, tail_role) for one row.

    * tree_depth — max over tokens of the distance to the parse root
      (cycle-guarded, matching graph.adjacency._ancestor_chain).
    * sdp_tree_depth — depth of the SDP-pruned subtree (G2 semantics,
      sdp_kept_nodes): max steps from a kept node up to the LCA while the
      walk stays inside the kept set.
    * head/tail role — the dependency relation of the span's syntactic
      head (the first in-span token whose parent lies outside the span,
      or the span start when the span is internally closed).
    """
    from relex_spark.graph.adjacency import _ancestor_chain, sdp_kept_nodes

    n = len(dep_heads)
    tree_depth = max(
        (len(_ancestor_chain(dep_heads, i)) - 1 for i in range(n)), default=0
    )
    kept, lca = sdp_kept_nodes(dep_heads, n, head, tail, prune)
    sdp_depth = 0
    for node in kept:
        d, cur, seen = 0, node, set()
        while cur != lca and cur not in seen:
            seen.add(cur)
            parent = dep_heads[cur] - 1
            if parent < 0 or (parent not in kept and parent != lca):
                break
            cur = parent
            d += 1
        sdp_depth = max(sdp_depth, d)

    def span_role(lo: int, hi: int) -> str:
        for i in range(lo, hi + 1):
            p = dep_heads[i] - 1
            if p < lo or p > hi:
                return dep[i]
        return dep[lo]

    return tree_depth, sdp_depth, span_role(*head), span_role(*tail)


def tacred_probe_labels(
    candidates: DataFrame,
    types: DataFrame,
    prune: int = 1,
    classes: dict[str, str] | None = None,
) -> DataFrame:
    """Per-id integer targets for ALL 14 reference TACRED probing tasks.

    ``candidates`` must carry the TACRED reader columns (tokens, spans,
    ner, pos, dep, dep_heads — sources/readers.tacred_to_candidates);
    ``types`` is (id, subj_type, obj_type) from the raw scan. Everything
    except the two tree tasks and the grammatical roles is pure JVM SQL;
    those four run in ONE Arrow-batched mapInPandas over (dep_heads, dep,
    spans) — sentence-local, no shuffle (the graph-walk cost model of
    G1/G2)."""
    import pandas as pd

    classes = {**TACRED_PROBE_CLASSES, **(classes or {})}

    def ind(col, task):
        return (
            F.coalesce(col == F.lit(classes[task]), F.lit(False))
            .cast("bigint")
            .alias(task)
        )

    between_lo = F.least("head_end", "tail_end") + F.lit(2)  # 1-based
    between_n = F.greatest(
        F.greatest("head_start", "tail_start")
        - F.least("head_end", "tail_end")
        - F.lit(1),
        F.lit(0),
    )
    pos_at = lambda i: F.when(  # noqa: E731 - guarded 1-based element_at
        (i >= 1) & (i <= F.size("pos")), F.element_at("pos", i)
    )
    sql_labels = candidates.join(types, "id").select(
        "id",
        ind(F.col("subj_type"), "arg_type_head"),
        ind(F.col("obj_type"), "arg_type_tail"),
        F.size("tokens").cast("bigint").alias("length"),
        between_n.cast("bigint").alias("entity_distance"),
        (F.col("head_start") <= F.col("tail_start"))
        .cast("bigint")
        .alias("argument_order"),
        F.exists(
            F.slice(F.col("ner"), between_lo, between_n), lambda t: t != "O"
        )
        .cast("bigint")
        .alias("entity_exists_between_head_tail"),
        ind(pos_at(F.col("head_start")), "pos_tag_head_left"),
        ind(pos_at(F.col("head_end") + F.lit(2)), "pos_tag_head_right"),
        ind(pos_at(F.col("tail_start")), "pos_tag_tail_left"),
        ind(pos_at(F.col("tail_end") + F.lit(2)), "pos_tag_tail_right"),
    )

    tree_in = candidates.select(
        "id", "dep_heads", "dep", "head_start", "head_end",
        "tail_start", "tail_end",
    )

    def tree_batches(batches):
        for pdf in batches:
            rows = {
                "id": [], "tree_depth": [], "sdp_tree_depth": [],
                "head_role": [], "tail_role": [],
            }
            for r in pdf.itertuples(index=False):
                td, sd, hr, tr = _span_tree_features(
                    [int(x) for x in r.dep_heads],
                    list(r.dep),
                    (int(r.head_start), int(r.head_end)),
                    (int(r.tail_start), int(r.tail_end)),
                    prune,
                )
                rows["id"].append(r.id)
                rows["tree_depth"].append(td)
                rows["sdp_tree_depth"].append(sd)
                rows["head_role"].append(hr)
                rows["tail_role"].append(tr)
            yield pd.DataFrame(rows)

    tree = tree_in.mapInPandas(
        tree_batches,
        schema="id string, tree_depth bigint, sdp_tree_depth bigint, "
        "head_role string, tail_role string",
    )
    return sql_labels.join(tree, "id").select(
        "id",
        *[c for c in sql_labels.columns if c != "id"],
        "tree_depth",
        "sdp_tree_depth",
        ind(F.col("head_role"), "argument_head_grammatical_role"),
        ind(F.col("tail_role"), "argument_tail_grammatical_role"),
    )


def probe_scores(
    reps: DataFrame,
    labels: DataFrame,
    dim: int,
    n_directions: int = 3,
    ridge_lambda: int = RIDGE_LAMBDA,
    tasks: tuple[str, ...] = PROBE_TASKS,
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
    for task in tasks:
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
    dim = _rep_dim(reps, weights_bc, encoder)
    return probe_scores(reps, labels, dim, n_directions=n_directions)


def run_tacred_probing_evaluation(
    spark,
    raw: DataFrame,
    weights_bc,
    masking_mode: str = "NER",
    encoder: str = "gcn",
    prune: int = 1,
    n_directions: int = 3,
    cache: DataFrame | None = None,
) -> DataFrame:
    """E8 over the TACRED schema with the reference's FULL task list
    (probing_task_evaluation.py:20-35): raw scan → reader semantics (P4
    masking barrier) → G1–G4 adjacency → GCN representations (id-keyed
    cache) → all 14 task labels → closed-form probe."""
    from relex_spark.graph.adjacency import with_adjacency
    from relex_spark.sources.readers import tacred_to_candidates

    cands = with_adjacency(
        tacred_to_candidates(raw, max_len=100, masking_mode=masking_mode),
        prune=prune,
        max_len=100,
    ).dropDuplicates(["id"])
    types = raw.select("id", "subj_type", "obj_type").dropDuplicates(["id"])
    reps = cached_representations(cands, weights_bc, encoder=encoder, cache=cache)
    labels = tacred_probe_labels(cands, types, prune=prune)
    dim = _rep_dim(reps, weights_bc, encoder)
    return probe_scores(
        reps, labels, dim, n_directions=n_directions, tasks=TACRED_PROBE_TASKS
    )


def _rep_dim(reps: DataFrame, weights_bc, encoder: str) -> int:
    """Representation width for the probe directions. Per-encoder: the tap
    returns the input of that encoder's classifier head, so the head's
    input dim IS the rep dim (deriving it from the weights avoids running
    a one-row kernel job; a wrong width would null-pad the zip_with
    projection and poison every statistic silently)."""
    w = weights_bc.value
    head_key = {
        "gcn": "gcn_ff_w",
        "gat": "gat_ff_w",
        "boe": "boe_ff_w",
        "bilstm": "lstm_ff_w",
        "attention": "attn_ff_w",
    }.get(encoder)
    if head_key is not None and head_key in (w.extra or {}):
        return int(w.extra[head_key].shape[0])
    if encoder == "cnn":
        return int(w.ff_w.shape[0])
    # seq encoders (bilstm/attention/...) and anything else: one-row probe
    # of the actual data — exact by construction
    return len(reps.select("embedding").first()["embedding"])

"""Dependency-graph operators (reference §2.3 G1–G5), from scratch.

Semantics match relex/dataset_readers/dataset_reader_utils.py:82-234 (the
gcn-over-pruned-trees SDP pruning scheme) — golden-pinned by the reference's
own tests (77 unpruned / 37 k=1-pruned edges, tacred_test.py:323-371) — but
the implementation here is a flat array walk, no tree objects.

Distribution model: each dependency graph is ONE sentence (≤ max_len
nodes), so this is not a distributed-graph problem — the per-row algorithm
runs inside an Arrow batch via ``mapInPandas`` (vectorized transport,
per-row compute), per SURVEY §2.3. There is no shuffle.

Conventions (inherited from the reference):
* ``dep_heads`` are 1-based head indices; 0 marks the root.
* spans are 0-based inclusive (start, end).
* ``prune < 0``: whole tree. ``prune >= 0``: keep tokens within ``prune``
  of the shortest dependency path between head and tail entity.
* output edges: parent→child pairs + inverses + self-loops (directed=False,
  add_self_loop=True — the reader's fixed call shape, dataset_reader_utils.py:5-13).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _ancestor_chain(dep_heads: list[int], start: int) -> list[int]:
    """Node itself plus every ancestor up to the root (0-based ids)."""
    chain = [start]
    h = dep_heads[start]
    seen = {start}
    while h > 0:
        nxt = h - 1
        if nxt in seen:  # cycle guard (malformed input)
            break
        chain.append(nxt)
        seen.add(nxt)
        h = dep_heads[nxt]
    return chain


def sdp_kept_nodes(
    dep_heads: list[int],
    length: int,
    head: tuple[int, int],
    tail: tuple[int, int],
    prune: int,
) -> tuple[set[int], int]:
    """G2: nodes within ``prune`` of the shortest dependency path, plus the
    subtree root (LCA). Returns (kept node set, lca)."""
    subj = list(range(head[0], head[1] + 1))
    obj = list(range(tail[0], tail[1] + 1))

    chains = [_ancestor_chain(dep_heads, s) for s in subj]
    obj_chains = [_ancestor_chain(dep_heads, o) for o in obj]

    subj_anc = set().union(*chains)
    obj_anc = set().union(*obj_chains)
    common = set(chains[0])
    for c in chains[1:] + obj_chains:
        common &= set(c)

    # LCA = the common ancestor whose subtree contains no other common
    # ancestor (deepest); equivalently the first common node on any chain.
    # A multi-root forest or cycle-truncated parse can leave NO common
    # ancestor (each span reaches a different root) — keep both full
    # ancestor paths and anchor on the subject chain's root instead of
    # crashing the Arrow task mid-job.
    if not common:
        lca = chains[0][-1]
        path = subj_anc | obj_anc
    else:
        if len(common) == 1:
            lca = next(iter(common))
        else:
            lca = next(n for n in chains[0] if n in common)
        path = (subj_anc | obj_anc) - common
    path.add(lca)

    # distance of every node to the path: walk upward until a path node
    # (distance = steps taken) or past the root (unreachable → INF)
    inf = 10**4
    dist = [0 if i in path else -1 for i in range(length)]
    for i in range(length):
        if dist[i] != -1:
            continue
        walk = [i]
        while walk[-1] >= 0 and walk[-1] not in path and len(walk) <= length:
            walk.append(dep_heads[walk[-1]] - 1)
        if walk[-1] in path:
            for d, node in enumerate(reversed(walk)):
                dist[node] = d
        else:
            for node in walk:
                if node >= 0 and dist[node] < 0:
                    dist[node] = inf

    kept = {i for i in range(length) if dist[i] <= prune}
    kept.add(lca)
    return kept, lca


def dep_tree_edges(
    dep_heads: list[int],
    length: int,
    head: tuple[int, int],
    tail: tuple[int, int],
    prune: int = -1,
) -> list[tuple[int, int]]:
    """G1+G2+G3: adjacency pairs (parent→child + inverses + self-loops),
    sorted. Set-equal to the reference's BFS edge collection."""
    n = min(length, len(dep_heads))
    if prune < 0:
        kept = set(range(n))
        lca = None
    else:
        kept, lca = sdp_kept_nodes(dep_heads, n, head, tail, prune)

    edges: set[tuple[int, int]] = set()
    for i in kept:
        edges.add((i, i))  # self-loop
        h = dep_heads[i]
        if h > 0 and i != lca:
            parent = h - 1
            if parent in kept:
                edges.add((parent, i))
                edges.add((i, parent))
    return sorted(edges)


def clip_edges(
    edges: list[tuple[int, int]], max_len: int
) -> list[tuple[int, int]]:
    """G4: drop edges touching positions beyond max_len (tacred.py:163-165)."""
    return [(s, d) for s, d in edges if s < max_len and d < max_len]


def densify(edges: list[tuple[int, int]], seq_len: int):
    """G5: edge list → (seq_len, seq_len) 0/1 adjacency matrix (numpy)."""
    import numpy as np

    a = np.zeros((seq_len, seq_len), dtype=np.float32)
    for s, d in edges:
        if s < seq_len and d < seq_len:
            a[s, d] = 1.0
    return a


ADJ_FIELD = T.StructField(
    "adjacency",
    T.ArrayType(
        T.StructType(
            [T.StructField("src", T.IntegerType()), T.StructField("dst", T.IntegerType())]
        )
    ),
)


def with_adjacency(
    candidates: DataFrame, prune: int = 1, max_len: int = 100
) -> DataFrame:
    """Append an ``adjacency`` column from ``dep_heads`` + spans.

    Arrow-batched (mapInPandas); per-sentence graphs, zero shuffle.
    Required columns: dep_heads ARRAY<INT>, head_start/head_end,
    tail_start/tail_end."""
    out_schema = T.StructType(list(candidates.schema.fields) + [ADJ_FIELD])

    def add_adj(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            adj = []
            for heads, hs, he, ts, te in zip(
                pdf["dep_heads"],
                pdf["head_start"],
                pdf["head_end"],
                pdf["tail_start"],
                pdf["tail_end"],
            ):
                if heads is None or len(heads) == 0:
                    adj.append([])
                    continue
                edges = dep_tree_edges(
                    list(heads), len(heads), (hs, he), (ts, te), prune
                )
                edges = clip_edges(edges, max_len)
                adj.append([{"src": s, "dst": d} for s, d in edges])
            pdf = pdf.copy()
            pdf["adjacency"] = adj
            yield pdf

    return candidates.mapInPandas(add_adj, schema=out_schema)

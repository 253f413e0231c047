"""Slow, obviously-correct per-row reference model in pure Python.

This is the sandbox stand-in for "reference RelEx outputs": the same
forward math as /root/reference's inference path
(basic_relation_classifier.py:153-229 at inference + decode :231-245),
written as independent per-row loops with no shared code with the
vectorized kernels in relex_spark.scoring. The pytest P/R≥0.95 gate
(BASELINE.json) compares the Spark pipeline's triples against labels this
model emits for the same candidates.
"""

from __future__ import annotations

import math

from relex_spark.scoring.weights import ModelWeights, OOV_ID


def _offset_index(p: int, start: int, end: int, n_position: int) -> int:
    # relative_offset_embedder.py:40-48
    if p < start:
        return 1 + n_position + (p - start)
    if p > end:
        return 1 + n_position + (p - end)
    return 1 + n_position


def oracle_predict(
    w: ModelWeights,
    tokens: list[str],
    head: tuple[int, int],
    tail: tuple[int, int],
) -> tuple[str, list[float]]:
    """Forward one example: returns (label, class_probabilities)."""
    ids = [
        w.token_to_id.get(t.lower() if w.lowercase else t, OOV_ID) for t in tokens
    ]
    length = len(ids)

    # M1 + M4 + M7: per-position concatenated feature vector
    rows: list[list[float]] = []
    for p in range(length):
        vec = list(map(float, w.emb[ids[p]]))
        hi = _offset_index(p, head[0], head[1], w.n_position)
        ti = _offset_index(p, tail[0], tail[1], w.n_position)
        vec += list(map(float, w.head_offset_emb[hi]))
        vec += list(map(float, w.tail_offset_emb[ti]))
        rows.append(vec)

    # M8: CNN (ReLU + max over valid windows; short rows -> relu(bias))
    enc: list[float] = []
    for k in sorted(w.cnn_filters):
        wk, bk = w.cnn_filters[k]
        nf = wk.shape[1]
        if length >= k:
            best = [-math.inf] * nf
            for s in range(length - k + 1):
                window: list[float] = []
                for j in range(k):
                    window += rows[s + j]
                for f in range(nf):
                    acc = float(bk[f])
                    for d, xv in enumerate(window):
                        acc += xv * float(wk[d, f])
                    acc = max(acc, 0.0)
                    if acc > best[f]:
                        best[f] = acc
            enc += best
        else:
            enc += [max(float(b), 0.0) for b in bk]

    # M16 + M18: linear head, softmax, argmax
    logits = []
    for c in range(w.ff_w.shape[1]):
        acc = float(w.ff_b[c])
        for d, ev in enumerate(enc):
            acc += ev * float(w.ff_w[d, c])
        logits.append(acc)
    m = max(logits)
    exps = [math.exp(z - m) for z in logits]
    total = sum(exps)
    probs = [e / total for e in exps]
    best_c = max(range(len(probs)), key=probs.__getitem__)
    return w.labels[best_c], probs

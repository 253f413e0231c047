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


def _feature_rows(
    w: ModelWeights,
    tokens: list[str],
    head: tuple[int, int],
    tail: tuple[int, int],
    ns_tags: dict[str, list[str]] | None = None,
) -> list[list[float]]:
    """M1 + M4 + M7: per-position concatenated feature vectors (namespace
    embeddings in sorted-name order first, then tokens, then offsets —
    AllenNLP sorted-key concat)."""
    ids = [
        w.token_to_id.get(t.lower() if w.lowercase else t, OOV_ID) for t in tokens
    ]
    rows: list[list[float]] = []
    for p in range(len(ids)):
        vec: list[float] = []
        if ns_tags:
            for name in sorted(ns_tags):
                vocab = w.extra["ns_vocab"][name]
                m = w.extra["ns_emb"][name]
                vec += list(map(float, m[vocab.get(ns_tags[name][p], OOV_ID)]))
        vec += list(map(float, w.emb[ids[p]]))
        hi = _offset_index(p, head[0], head[1], w.n_position)
        ti = _offset_index(p, tail[0], tail[1], w.n_position)
        vec += list(map(float, w.head_offset_emb[hi]))
        vec += list(map(float, w.tail_offset_emb[ti]))
        rows.append(vec)
    return rows


def _softmax_label(w: ModelWeights, enc: list[float], ff_w, ff_b):
    logits = []
    for c in range(ff_w.shape[1]):
        acc = float(ff_b[c])
        for d, ev in enumerate(enc):
            acc += ev * float(ff_w[d, c])
        logits.append(acc)
    m = max(logits)
    exps = [math.exp(z - m) for z in logits]
    total = sum(exps)
    probs = [e / total for e in exps]
    best_c = max(range(len(probs)), key=probs.__getitem__)
    return w.labels[best_c], probs


def oracle_predict(
    w: ModelWeights,
    tokens: list[str],
    head: tuple[int, int],
    tail: tuple[int, int],
    ns_tags: dict[str, list[str]] | None = None,
) -> tuple[str, list[float]]:
    """Forward one example: returns (label, class_probabilities)."""
    rows = _feature_rows(w, tokens, head, tail, ns_tags)
    length = len(rows)

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
    return _softmax_label(w, enc, w.ff_w, w.ff_b)


def oracle_predict_gcn(
    w: ModelWeights,
    tokens: list[str],
    head: tuple[int, int],
    tail: tuple[int, int],
    edges: list[tuple[int, int]],
) -> tuple[str, list[float]]:
    """M12 path: GCN layers (relu((A·XW + b)/(deg+1)), gcn.py:48-55,114-119)
    + 3-scope max pooling + linear head — per-row loops, no numpy batching."""
    rows = _feature_rows(w, tokens, head, tail)
    length = len(rows)
    adj = [[0.0] * length for _ in range(length)]
    for s, d in edges:
        if s < length and d < length:
            adj[s][d] = 1.0
    deg = [sum(adj[i]) + 1.0 for i in range(length)]

    h = rows
    for wl, bl in zip(w.extra["gcn_weights"], w.extra["gcn_biases"]):
        din, dout = wl.shape
        support = [
            [sum(h[i][k] * float(wl[k, o]) for k in range(din)) for o in range(dout)]
            for i in range(length)
        ]
        nxt = []
        for i in range(length):
            row = []
            for o in range(dout):
                acc = float(bl[o])
                for j in range(length):
                    if adj[i][j]:
                        acc += support[j][o]
                row.append(max(acc / deg[i], 0.0))
            nxt.append(row)
        h = nxt

    def pool_max(lo: int, hi: int) -> list[float]:
        return [
            max(h[i][o] for i in range(lo, hi + 1))
            for o in range(len(h[0]))
        ]

    enc = (
        pool_max(0, length - 1)
        + pool_max(head[0], min(head[1], length - 1))
        + pool_max(tail[0], min(tail[1], length - 1))
    )
    return _softmax_label(w, enc, w.extra["gcn_ff_w"], w.extra["gcn_ff_b"])


def _ln_row(vec: list[float], gamma, beta) -> list[float]:
    """AllenNLP LayerNorm on one position: g*(z-mean)/(std+1e-6)+b."""
    n = len(vec)
    mu = sum(vec) / n
    var = sum((v - mu) ** 2 for v in vec) / n
    sd = math.sqrt(var)
    return [
        float(gamma[o]) * (vec[o] - mu) / (sd + 1e-6) + float(beta[o])
        for o in range(n)
    ]


def oracle_predict_attention(
    w: ModelWeights,
    tokens: list[str],
    head: tuple[int, int],
    tail: tuple[int, int],
) -> tuple[str, list[float]]:
    """M10 path: AllenNLP-0.9 StackedSelfAttentionEncoder block at
    inference (feedforward sublayer + residual + layer norm, multi-head
    attention + residual + layer norm) + max pool + linear head — per-row
    loops, no numpy batching, independent of relex_spark.scoring.kernels."""
    rows = _feature_rows(w, tokens, head, tail)
    length = len(rows)
    d = len(rows[0])
    heads = w.extra["attn_heads"]
    dh = d // heads

    h = rows
    for layer in w.extra["attn_layers"]:
        ffw1, ffb1 = layer["ffw1"], layer["ffb1"]
        ffw2, ffb2 = layer["ffw2"], layer["ffb2"]
        ffh = ffw1.shape[1]
        ff = []
        for i in range(length):
            mid = [
                max(sum(h[i][k] * float(ffw1[k, m]) for k in range(d)) + float(ffb1[m]), 0.0)
                for m in range(ffh)
            ]
            out = [
                sum(mid[m] * float(ffw2[m, o]) for m in range(ffh)) + float(ffb2[o])
                for o in range(d)
            ]
            ff.append(_ln_row([out[o] + h[i][o] for o in range(d)],
                              layer["ln_ff_g"], layer["ln_ff_b"]))

        def proj(mat):
            return [
                [sum(ff[i][k] * float(mat[k, o]) for k in range(d)) for o in range(d)]
                for i in range(length)
            ]

        q, k_, v = proj(layer["wq"]), proj(layer["wk"]), proj(layer["wv"])
        concat = [[0.0] * d for _ in range(length)]
        for hd in range(heads):
            lo = hd * dh
            for i in range(length):
                scores = [
                    sum(q[i][lo + t] * k_[j][lo + t] for t in range(dh)) / math.sqrt(dh)
                    for j in range(length)
                ]
                m = max(scores)
                exps = [math.exp(s - m) for s in scores]
                tot = sum(exps)
                att = [e / tot for e in exps]
                for t in range(dh):
                    concat[i][lo + t] = sum(att[j] * v[j][lo + t] for j in range(length))
        wo = layer["wo"]
        nxt = []
        for i in range(length):
            out = [
                sum(concat[i][k] * float(wo[k, o]) for k in range(d)) + ff[i][o]
                for o in range(d)
            ]
            nxt.append(_ln_row(out, layer["ln_out_g"], layer["ln_out_b"]))
        h = nxt

    enc = [max(h[i][o] for i in range(length)) for o in range(d)]
    return _softmax_label(w, enc, w.extra["attn_ff_w"], w.extra["attn_ff_b"])


def oracle_predict_gat(
    w: ModelWeights,
    tokens: list[str],
    head: tuple[int, int],
    tail: tuple[int, int],
    edges: list[tuple[int, int]],
) -> tuple[str, list[float]]:
    """M13 path: GAT layers (per head: additive scores w1·xi + w2·xj masked
    to adjacency, softmax, weighted sum; concat heads; leaky_relu(0.2)) +
    3-scope max pooling + linear head — per-row loops, no numpy batching.
    A node with no adjacency edges outputs 0 (gat.py's masked softmax over
    an empty neighborhood)."""
    rows = _feature_rows(w, tokens, head, tail)
    length = len(rows)
    adj = [[False] * length for _ in range(length)]
    for s, d in edges:
        if s < length and d < length:
            adj[s][d] = True

    num_heads = w.extra["gat_heads"]
    h = rows
    for layer in w.extra["gat_layers"]:
        wl = layer["w"]
        din, hidden = wl.shape
        dh = hidden // num_heads
        proj = [
            [sum(h[i][k] * float(wl[k, o]) for k in range(din)) for o in range(hidden)]
            for i in range(length)
        ]
        out = [[0.0] * hidden for _ in range(length)]
        for hd in range(num_heads):
            lo = hd * dh
            a1, a2 = layer["a1"][hd], layer["a2"][hd]
            s1 = [
                sum(proj[i][lo + t] * float(a1[t]) for t in range(dh))
                for i in range(length)
            ]
            s2 = [
                sum(proj[j][lo + t] * float(a2[t]) for t in range(dh))
                for j in range(length)
            ]
            for i in range(length):
                nbrs = [j for j in range(length) if adj[i][j]]
                if not nbrs:
                    continue  # isolated node: this head's slice stays 0
                scores = [s1[i] + s2[j] for j in nbrs]
                m = max(scores)
                exps = [math.exp(s - m) for s in scores]
                tot = sum(exps)
                att = [e / tot for e in exps]
                for t in range(dh):
                    out[i][lo + t] = sum(
                        att[k] * proj[j][lo + t] for k, j in enumerate(nbrs)
                    )
        h = [
            [v if v > 0 else 0.2 * v for v in out[i]]
            for i in range(length)
        ]

    def pool_max(lo: int, hi: int) -> list[float]:
        return [max(h[i][o] for i in range(lo, hi + 1)) for o in range(len(h[0]))]

    enc = (
        pool_max(0, length - 1)
        + pool_max(head[0], min(head[1], length - 1))
        + pool_max(tail[0], min(tail[1], length - 1))
    )
    return _softmax_label(w, enc, w.extra["gat_ff_w"], w.extra["gat_ff_b"])

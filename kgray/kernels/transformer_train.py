"""NumPy training for the Transformer-CRF tagger (closes reference T5).

Analytic forward/backward for the exact training objective of
``reference/transformer_ner.py:375-543``: batched CRF negative
log-likelihood (mean over the batch) through the post-norm
``nn.TransformerEncoder`` stack, with Adam (lr 1e-3, weight_decay 1e-5,
``transformer_ner.py:463``), global-norm gradient clipping at 5.0
(``:487``) and the reference's padding/masking semantics (PAD token and
PAD tag index 0, loss masked beyond each sequence's length).

Differences from the torch trainer, both documented and deliberate:

* dropout is 0 during training (the reference uses p=0.1; bitwise
  parity with torch RNG is impossible anyway, and the quality bar is
  the README's validation F1 ≥ 0.93, which this trainer clears —
  pinned by ``tests/test_transformer_training.py``),
* updates are synchronous mini-batch steps whose per-sentence gradient
  contributions are summed as int64 fixed-point (order-independent →
  bit-identical weights across worker counts and retries — the
  ``train_crf_distributed`` discipline from ``pipelines/training.py``).

The CRF gradient is the classic forward-backward expectation: dEm =
unary marginals − gold one-hots, dTransitions = pairwise marginals −
gold transition counts, with start/end vectors at the sequence
boundaries; the transformer backward is standard reverse-mode through
LayerNorm / ReLU-FFN / multi-head softmax attention / embedding
scatter.  PAD embedding row 0 receives no gradient (padded positions
have zero upstream gradient; mirrors ``padding_idx=0``).
"""

from __future__ import annotations

import numpy as np

from .transformer import TransformerCRFModel

__all__ = ["batch_loss_and_grads", "quantized_grad_sum_tfm", "adam_step",
           "clip_global_norm", "quantize_grads", "dequantize_grads",
           "PARAM_ORDER"]


def PARAM_ORDER(config: dict) -> list:
    """Deterministic parameter-name order (for packing/clipping)."""
    names = ["embedding.weight"]
    for i in range(config["num_layers"]):
        p = f"transformer.layers.{i}."
        names += [p + "self_attn.in_proj_weight", p + "self_attn.in_proj_bias",
                  p + "self_attn.out_proj.weight", p + "self_attn.out_proj.bias",
                  p + "linear1.weight", p + "linear1.bias",
                  p + "linear2.weight", p + "linear2.bias",
                  p + "norm1.weight", p + "norm1.bias",
                  p + "norm2.weight", p + "norm2.bias"]
    names += ["hidden2tag.weight", "hidden2tag.bias",
              "transitions", "start_transitions", "end_transitions"]
    return names


def _layer_norm_fwd(x, w, b, eps=1e-5):
    mu = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    inv = 1.0 / np.sqrt(var + eps)
    xhat = (x - mu) * inv
    return xhat * w + b, (xhat, inv)


def _layer_norm_bwd(dout, cache, w):
    xhat, inv = cache
    N = xhat.shape[-1]
    dw = (dout * xhat).reshape(-1, N).sum(axis=0)
    db = dout.reshape(-1, N).sum(axis=0)
    dxhat = dout * w
    s1 = dxhat.sum(axis=-1, keepdims=True)
    s2 = (dxhat * xhat).sum(axis=-1, keepdims=True)
    dx = (dxhat - s1 / N - xhat * s2 / N) * inv
    return dx, dw, db


def _softmax(x, axis=-1):
    m = np.max(x, axis=axis, keepdims=True)
    e = np.exp(x - m)
    return e / e.sum(axis=axis, keepdims=True)


def _lse(x, axis=-1):
    m = np.max(x, axis=axis, keepdims=True)
    return (m + np.log(np.exp(x - m).sum(axis=axis, keepdims=True))
            ).squeeze(axis)


def _crf_loss_and_marginals(em, tags, mask, trans, start, end):
    """Batched masked CRF NLL (sum over batch) + the gradient pieces.

    Returns (loss_sum, dEm, dTrans, dStart, dEnd) where dEm is
    [B, L, T] (zero at padded positions) and the rest are summed over
    the batch.  Mirrors ``_forward_algorithm`` / ``_score_sentence``
    masking (transformer_ner.py:147-202): position 0 is always real,
    updates happen only where ``mask[:, t]``.
    """
    B, L, T = em.shape
    lens = mask.sum(axis=1)                              # [B]
    ar = np.arange(B)

    # ---- forward (alpha) with per-step cache
    alphas = np.empty((B, L, T))
    alpha = start[None, :] + em[:, 0]
    alphas[:, 0] = alpha
    for t in range(1, L):
        scores = alpha[:, :, None] + trans[None, :, :] + em[:, t, None, :]
        upd = _lse(scores, axis=1)                       # [B, T]
        alpha = np.where(mask[:, t, None], upd, alpha)
        alphas[:, t] = alpha
    log_z = _lse(alpha + end[None, :], axis=1)           # [B]

    # ---- backward (beta): beta stays `end` until the last valid pos
    betas = np.empty((B, L, T))
    beta = np.broadcast_to(end[None, :], (B, T)).copy()
    betas[:, L - 1] = beta
    for t in range(L - 2, -1, -1):
        scores = trans[None, :, :] + (em[:, t + 1] + beta)[:, None, :]
        upd = _lse(scores, axis=2)                       # [B, T]
        beta = np.where(mask[:, t + 1, None], upd, beta)
        betas[:, t] = beta

    # ---- gold score
    gold = start[tags[:, 0]] + em[ar, 0, tags[:, 0]]
    for t in range(1, L):
        step = trans[tags[:, t - 1], tags[:, t]] + em[ar, t, tags[:, t]]
        gold = gold + np.where(mask[:, t], step, 0.0)
    last_tags = tags[ar, lens - 1]
    gold = gold + end[last_tags]
    loss_sum = float((log_z - gold).sum())

    # ---- unary marginals − gold one-hots
    dem = np.exp(alphas + betas - log_z[:, None, None])
    dem[~mask] = 0.0
    dem[ar, 0, tags[:, 0]] -= 1.0
    t_idx = np.repeat(np.arange(L)[None, :], B, axis=0)
    real = mask & (t_idx > 0)
    bb, tt = np.nonzero(real)
    dem[bb, tt, tags[bb, tt]] -= 1.0

    # ---- pairwise marginals − gold transition counts
    dtrans = np.zeros((T, T))
    for t in range(L - 1):
        act = mask[:, t + 1]
        if not act.any():
            break
        pair = (alphas[:, t, :, None] + trans[None, :, :]
                + (em[:, t + 1] + betas[:, t + 1])[:, None, :]
                - log_z[:, None, None])
        dtrans += np.exp(pair[act]).sum(axis=0)
        np.subtract.at(dtrans, (tags[act, t], tags[act, t + 1]), 1.0)

    dstart = np.exp(alphas[:, 0] + betas[:, 0] - log_z[:, None]).sum(axis=0)
    np.subtract.at(dstart, tags[:, 0], 1.0)
    dend = np.exp(alphas[ar, lens - 1] + betas[ar, lens - 1]
                  - log_z[:, None]).sum(axis=0)
    np.subtract.at(dend, last_tags, 1.0)
    return loss_sum, dem, dtrans, dstart, dend


def batch_loss_and_grads(model: TransformerCRFModel, idx: np.ndarray,
                         tags: np.ndarray, emb_scatter: bool = True) -> tuple:
    """Loss (sum over the batch's sentences) and gradients (summed, NOT
    averaged — the caller divides by the global mini-batch size so
    shard sums stay order-independent).

    ``idx``/``tags``: int64 [B, L] padded with 0.  With
    ``emb_scatter=False`` the embedding gradient is returned
    pre-scatter as ``grads["__emb_dx"]`` ([B, L, D]) so the caller can
    quantize per position before the int64 scatter-add
    (:func:`quantized_grad_sum_tfm`'s partition-invariance trick).
    """
    w = model.weights
    cfg = model.config
    nh, D = cfg["num_heads"], cfg["embedding_dim"]
    dh = D // nh
    B, L = idx.shape
    mask = idx != 0
    grads = {}

    # ------------------------------------------------------------ forward
    emb = w["embedding.weight"][idx]                     # [B, L, D]
    x = emb + model.pos_encoding(L)[None, :, :]
    neg = np.float64(-1e30)
    key_bias = np.where(mask[:, None, None, :], 0.0, neg)

    caches = []
    for i in range(cfg["num_layers"]):
        p = f"transformer.layers.{i}."
        x_in = x
        qkv = x @ w[p + "self_attn.in_proj_weight"].T + w[p + "self_attn.in_proj_bias"]
        q, k, v = np.split(qkv, 3, axis=-1)

        def heads(m):
            return m.reshape(B, L, nh, dh).transpose(0, 2, 1, 3)

        qh, kh, vh = heads(q), heads(k), heads(v)
        scores = (qh @ kh.transpose(0, 1, 3, 2)) / np.sqrt(dh) + key_bias
        A = _softmax(scores, axis=-1)                    # [B, nh, L, L]
        ctx = A @ vh                                     # [B, nh, L, dh]
        ctx_m = ctx.transpose(0, 2, 1, 3).reshape(B, L, D)
        attn_out = ctx_m @ w[p + "self_attn.out_proj.weight"].T \
            + w[p + "self_attn.out_proj.bias"]
        y1 = x_in + attn_out
        x1, ln1 = _layer_norm_fwd(y1, w[p + "norm1.weight"], w[p + "norm1.bias"])
        h_pre = x1 @ w[p + "linear1.weight"].T + w[p + "linear1.bias"]
        h = np.maximum(h_pre, 0.0)
        ff = h @ w[p + "linear2.weight"].T + w[p + "linear2.bias"]
        y2 = x1 + ff
        x, ln2 = _layer_norm_fwd(y2, w[p + "norm2.weight"], w[p + "norm2.bias"])
        caches.append((x_in, qh, kh, vh, A, ctx_m, x1, ln1, h_pre, h, ln2))

    em = x @ w["hidden2tag.weight"].T + w["hidden2tag.bias"]

    loss, dem, dtrans, dstart, dend = _crf_loss_and_marginals(
        em, tags, mask, w["transitions"], w["start_transitions"],
        w["end_transitions"])
    grads["transitions"] = dtrans
    grads["start_transitions"] = dstart
    grads["end_transitions"] = dend

    # ------------------------------------------------------------ backward
    grads["hidden2tag.weight"] = np.einsum("blt,bld->td", dem, x)
    grads["hidden2tag.bias"] = dem.sum(axis=(0, 1))
    dx = dem @ w["hidden2tag.weight"]

    for i in range(cfg["num_layers"] - 1, -1, -1):
        p = f"transformer.layers.{i}."
        x_in, qh, kh, vh, A, ctx_m, x1, ln1, h_pre, h, ln2 = caches[i]

        dy2, dw2n, db2n = _layer_norm_bwd(dx, ln2, w[p + "norm2.weight"])
        grads[p + "norm2.weight"] = dw2n
        grads[p + "norm2.bias"] = db2n
        dff = dy2
        dx1 = dy2.copy()
        grads[p + "linear2.weight"] = np.einsum("blh,bld->dh", h, dff)
        grads[p + "linear2.bias"] = dff.sum(axis=(0, 1))
        dh_ = dff @ w[p + "linear2.weight"]
        dh_pre = dh_ * (h_pre > 0.0)
        grads[p + "linear1.weight"] = np.einsum("blh,bld->hd", dh_pre, x1)
        grads[p + "linear1.bias"] = dh_pre.sum(axis=(0, 1))
        dx1 += dh_pre @ w[p + "linear1.weight"]

        dy1, dw1n, db1n = _layer_norm_bwd(dx1, ln1, w[p + "norm1.weight"])
        grads[p + "norm1.weight"] = dw1n
        grads[p + "norm1.bias"] = db1n
        dattn_out = dy1
        dx_in = dy1.copy()
        grads[p + "self_attn.out_proj.weight"] = np.einsum(
            "bld,ble->de", dattn_out, ctx_m)
        grads[p + "self_attn.out_proj.bias"] = dattn_out.sum(axis=(0, 1))
        dctx_m = dattn_out @ w[p + "self_attn.out_proj.weight"]
        dctx = dctx_m.reshape(B, L, nh, dh).transpose(0, 2, 1, 3)

        dA = dctx @ vh.transpose(0, 1, 3, 2)             # [B, nh, L, L]
        dvh = A.transpose(0, 1, 3, 2) @ dctx
        dscores = A * (dA - (dA * A).sum(axis=-1, keepdims=True))
        dscores /= np.sqrt(dh)
        dqh = dscores @ kh
        dkh = dscores.transpose(0, 1, 3, 2) @ qh

        def merge(m):
            return m.transpose(0, 2, 1, 3).reshape(B, L, D)

        dqkv = np.concatenate([merge(dqh), merge(dkh), merge(dvh)], axis=-1)
        grads[p + "self_attn.in_proj_weight"] = np.einsum(
            "blk,bld->kd", dqkv, x_in)
        grads[p + "self_attn.in_proj_bias"] = dqkv.sum(axis=(0, 1))
        dx_in += dqkv @ w[p + "self_attn.in_proj_weight"]
        dx = dx_in

    if emb_scatter:
        demb = np.zeros_like(w["embedding.weight"])
        np.add.at(demb, idx.ravel(), dx.reshape(-1, D))
        demb[0] = 0.0                                    # padding_idx=0
        grads["embedding.weight"] = demb
    else:
        grads["__emb_dx"] = dx
    return loss, grads, B


def quantized_grad_sum_tfm(model: TransformerCRFModel, idx: np.ndarray,
                           tags: np.ndarray, rows, quant: int) -> tuple:
    """Summed int64 fixed-point gradients over ``rows``, quantized PER
    SENTENCE (the ``_quantized_grad_sum`` discipline): each sentence's
    float gradient is computed alone — identical wherever it runs —
    then rounded to the integer grid, so any partitioning of the
    sentences produces the SAME integer sums and the distributed
    trainer is bit-identical across worker counts.  The embedding
    gradient is quantized per token position and scatter-added in
    int64 (dense per-sentence V×D grids would churn ~20 MB/sentence).
    """
    V, D = model.weights["embedding.weight"].shape
    acc: dict = {}
    demb = np.zeros((V, D), dtype=np.int64)
    loss = 0.0
    n = 0
    for r in rows:
        one_idx = idx[r:r + 1]
        l, grads, _ = batch_loss_and_grads(model, one_idx, tags[r:r + 1],
                                           emb_scatter=False)
        if not np.isfinite(l):
            continue
        dx = grads.pop("__emb_dx")
        qdx = np.rint(dx[0] * quant).astype(np.int64)
        np.add.at(demb, one_idx[0], qdx)
        for k, g in grads.items():
            q = np.rint(g * quant).astype(np.int64)
            if k in acc:
                acc[k] += q
            else:
                acc[k] = q
        loss += l
        n += 1
    demb[0] = 0                                          # padding_idx=0
    acc["embedding.weight"] = demb
    return acc, loss, n


def quantize_grads(grads: dict, quant: int) -> dict:
    return {k: np.rint(g * quant).astype(np.int64) for k, g in grads.items()}


def dequantize_grads(qgrads: dict, quant: int, denom: float) -> dict:
    return {k: g.astype(np.float64) / quant / denom for k, g in qgrads.items()}


def clip_global_norm(grads: dict, max_norm: float, order: list) -> dict:
    """torch.nn.utils.clip_grad_norm_ semantics (transformer_ner.py:487):
    one global L2 norm across every parameter gradient."""
    total = np.sqrt(sum(float((grads[k] ** 2).sum()) for k in order
                        if k in grads))
    if total > max_norm and total > 0:
        scale = max_norm / total
        return {k: g * scale for k, g in grads.items()}
    return grads


def adam_step(weights: dict, grads: dict, state: dict, order: list,
              lr: float = 1e-3, betas=(0.9, 0.999), eps: float = 1e-8,
              weight_decay: float = 1e-5) -> None:
    """In-place torch ``optim.Adam`` step (L2 weight_decay folded into
    the gradient, not decoupled — transformer_ner.py:463)."""
    state["t"] = state.get("t", 0) + 1
    t = state["t"]
    b1, b2 = betas
    bc1 = 1.0 - b1 ** t
    bc2 = 1.0 - b2 ** t
    for k in order:
        if k not in grads:
            continue
        g = grads[k] + weight_decay * weights[k]
        m = state.setdefault("m_" + k, np.zeros_like(weights[k]))
        v = state.setdefault("v_" + k, np.zeros_like(weights[k]))
        m *= b1
        m += (1 - b1) * g
        v *= b2
        v += (1 - b2) * g * g
        weights[k] -= lr * (m / bc1) / (np.sqrt(v / bc2) + eps)

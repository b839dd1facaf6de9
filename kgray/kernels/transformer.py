"""NumPy inference for the Transformer-CRF tagger (reference T5).

Re-implements, in NumPy and for INFERENCE only, the exact eval-time
math of ``reference/transformer_ner.py``:

* embedding with PAD index 0 (``transformer_ner.py:77``),
* sinusoidal positional encoding added batch-first
  (``transformer_ner.py:276-293``; dropout is identity at eval),
* a post-norm ``nn.TransformerEncoder`` stack —
  per layer: multi-head self-attention with key-padding mask →
  residual → LayerNorm → ReLU feed-forward → residual → LayerNorm
  (torch defaults for ``nn.TransformerEncoderLayer(activation='relu',
  batch_first=True)``, ``transformer_ner.py:83-91``),
* linear projection to tag space (``transformer_ner.py:94``),
* CRF Viterbi with learned ``transitions`` / ``start_transitions`` /
  ``end_transitions``, decoded over the first ``mask.sum()`` positions
  per sequence (``transformer_ner.py:214-274``),
* predict-time truncate/pad to ``max_seq_len``
  (``transformer_ner.py:580-588``) and the PAD-tag → ``O`` output
  rewrite with beyond-max-length positions forced to ``O``
  (``transformer_ner.py:617-626``).

Weight names/shapes mirror the torch ``state_dict`` so a
reference-trained pickle could be converted 1:1 where torch exists;
in this environment (no torch) artifacts are produced by
:func:`init_random` — deterministic Xavier/normal initialisation with
the same distributional choices as ``transformer_ner.py:97-104`` —
which exercises the full inference surface.  Training (Adam, epochs,
``transformer_ner.py:466-521``) stays out of scope per BASELINE.json
(HMM/CRF are the designated serving kernels).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import numpy as np

__all__ = ["TransformerCRFModel", "init_random", "emissions",
           "viterbi_tcrf", "predict_sentences", "build_vocab",
           "max_len_pow2", "PAD_TOKEN", "UNK_TOKEN", "PAD_TAG"]

PAD_TOKEN = "<PAD>"          # transformer_ner.py:18-20
UNK_TOKEN = "<UNK>"
PAD_TAG = "<PAD>"


@dataclass
class TransformerCRFModel:
    config: dict                       # transformer_ner.py:529-538 model_config
    weights: dict                      # torch state_dict names -> np.ndarray
    word_to_idx: dict
    tag_to_idx: dict
    idx_to_tag: dict = field(default_factory=dict)

    def __post_init__(self):
        if not self.idx_to_tag:
            self.idx_to_tag = {i: t for t, i in self.tag_to_idx.items()}
        self._pe = None

    # ---------------------------------------------------------------- io
    def save(self, path: str) -> None:
        base = path[:-4] if path.endswith(".npz") else path
        np.savez(base + ".npz", **self.weights)
        with open(base + ".json", "w", encoding="utf-8") as f:
            json.dump({"config": self.config,
                       "word_to_idx": self.word_to_idx,
                       "tag_to_idx": self.tag_to_idx}, f)

    @classmethod
    def load(cls, path: str) -> "TransformerCRFModel":
        base = path[:-4] if path.endswith(".npz") else path
        with np.load(base + ".npz") as z:
            weights = {k: z[k] for k in z.files}
        with open(base + ".json", encoding="utf-8") as f:
            meta = json.load(f)
        return cls(config=meta["config"], weights=weights,
                   word_to_idx=meta["word_to_idx"],
                   tag_to_idx={k: int(v) for k, v in meta["tag_to_idx"].items()})

    # ---------------------------------------------------------------- pe
    def pos_encoding(self, L: int) -> np.ndarray:
        """pe[:L] — transformer_ner.py:281-289 formula."""
        if self._pe is None or self._pe.shape[0] < L:
            d = self.config["embedding_dim"]
            max_len = max(L, self.config.get("max_seq_len", 512))
            pos = np.arange(max_len, dtype=np.float64)[:, None]
            div = np.exp(np.arange(0, d, 2, dtype=np.float64)
                         * (-np.log(10000.0) / d))
            pe = np.zeros((max_len, d), dtype=np.float64)
            pe[:, 0::2] = np.sin(pos * div)
            pe[:, 1::2] = np.cos(pos * div)
            self._pe = pe
        return self._pe[:L]


def build_vocab(sentences: list, tags: list) -> tuple:
    """Reference vocab semantics (transformer_ner.py:331-359): words in
    first-occurrence order after PAD=0/UNK=1; tags PAD=0 then sorted."""
    word_counts: dict = {}
    for s in sentences:
        for token in s:
            word_counts[token] = word_counts.get(token, 0) + 1
    tag_set = {t for ts in tags for t in ts if t is not None}
    w2i = {PAD_TOKEN: 0, UNK_TOKEN: 1}
    for word in word_counts:
        w2i[word] = len(w2i)
    t2i = {PAD_TAG: 0}
    for t in sorted(tag_set):
        if t != PAD_TAG:
            t2i[t] = len(t2i)
    return w2i, t2i


def max_len_pow2(sentences: list) -> int:
    """max sentence length rounded up to a power of 2
    (transformer_ner.py:361-368)."""
    m = max(len(s) for s in sentences)
    p = 1
    while p < m:
        p *= 2
    return p


def _xavier(rng, shape):
    bound = np.sqrt(6.0 / (shape[0] + shape[1]))
    return rng.uniform(-bound, bound, size=shape)


def init_random(word_to_idx: dict, tag_to_idx: dict, embedding_dim: int = 128,
                hidden_dim: int = 256, num_layers: int = 2, num_heads: int = 4,
                max_seq_len: int = 64, seed: int = 1234) -> TransformerCRFModel:
    """Deterministic weight init mirroring the torch model's shapes and
    init families (xavier_uniform for matrices per
    ``transformer_ner.py:102``, normal for CRF vectors per ``:103-104``,
    zero row for the PAD embedding per ``nn.Embedding(padding_idx=0)``)."""
    rng = np.random.default_rng(seed)
    V, T, D, H = len(word_to_idx), len(tag_to_idx), embedding_dim, hidden_dim
    w = {}
    w["embedding.weight"] = rng.normal(0, 1.0, (V, D))
    w["embedding.weight"][0] = 0.0
    for i in range(num_layers):
        p = f"transformer.layers.{i}."
        w[p + "self_attn.in_proj_weight"] = _xavier(rng, (3 * D, D))
        w[p + "self_attn.in_proj_bias"] = np.zeros(3 * D)
        w[p + "self_attn.out_proj.weight"] = _xavier(rng, (D, D))
        w[p + "self_attn.out_proj.bias"] = np.zeros(D)
        w[p + "linear1.weight"] = _xavier(rng, (H, D))
        w[p + "linear1.bias"] = np.zeros(H)
        w[p + "linear2.weight"] = _xavier(rng, (D, H))
        w[p + "linear2.bias"] = np.zeros(D)
        w[p + "norm1.weight"] = np.ones(D)
        w[p + "norm1.bias"] = np.zeros(D)
        w[p + "norm2.weight"] = np.ones(D)
        w[p + "norm2.bias"] = np.zeros(D)
    w["hidden2tag.weight"] = _xavier(rng, (T, D))
    w["hidden2tag.bias"] = np.zeros(T)
    w["transitions"] = _xavier(rng, (T, T))            # xavier_uniform_, :102
    w["start_transitions"] = rng.normal(0, 1.0, T)     # normal_, :103
    w["end_transitions"] = rng.normal(0, 1.0, T)       # normal_, :104
    config = {"vocab_size": V, "tag_size": T, "embedding_dim": D,
              "hidden_dim": H, "num_layers": num_layers,
              "num_heads": num_heads, "dropout": 0.1,
              "max_seq_len": max_seq_len}
    return TransformerCRFModel(config=config, weights=w,
                               word_to_idx=dict(word_to_idx),
                               tag_to_idx=dict(tag_to_idx))


# ------------------------------------------------------------------ forward


def _layer_norm(x, w, b, eps=1e-5):
    mu = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)           # biased, as torch LayerNorm
    return (x - mu) / np.sqrt(var + eps) * w + b


def _softmax(x, axis=-1):
    m = np.max(x, axis=axis, keepdims=True)
    e = np.exp(x - m)
    return e / e.sum(axis=axis, keepdims=True)


def emissions(model: TransformerCRFModel, idx: np.ndarray,
              mask: np.ndarray) -> np.ndarray:
    """[B, L, T] emission scores — eval-time forward of
    ``_get_emission_scores`` (transformer_ner.py:105-122).

    ``idx``: int token-index matrix [B, L] (0 = PAD);
    ``mask``: bool [B, L], True at real tokens.  Padded KEY positions
    are excluded from attention (src_key_padding_mask semantics);
    outputs at padded query positions are computed but never decoded.
    """
    w = model.weights
    nh = model.config["num_heads"]
    D = model.config["embedding_dim"]
    dh = D // nh
    B, L = idx.shape

    x = w["embedding.weight"][idx]                       # [B, L, D]
    x = x + model.pos_encoding(L)[None, :, :]

    neg = np.float64(-1e30)                              # -inf-safe masking
    key_bias = np.where(mask[:, None, None, :], 0.0, neg)   # [B,1,1,L]

    for i in range(model.config["num_layers"]):
        p = f"transformer.layers.{i}."
        qkv = x @ w[p + "self_attn.in_proj_weight"].T + w[p + "self_attn.in_proj_bias"]
        q, k, v = np.split(qkv, 3, axis=-1)              # [B, L, D] each

        def heads(m):
            return m.reshape(B, L, nh, dh).transpose(0, 2, 1, 3)  # [B,nh,L,dh]

        qh, kh, vh = heads(q), heads(k), heads(v)
        scores = (qh @ kh.transpose(0, 1, 3, 2)) / np.sqrt(dh)    # [B,nh,L,L]
        scores = scores + key_bias
        attn = _softmax(scores, axis=-1) @ vh            # [B,nh,L,dh]
        attn = attn.transpose(0, 2, 1, 3).reshape(B, L, D)
        attn = attn @ w[p + "self_attn.out_proj.weight"].T + w[p + "self_attn.out_proj.bias"]
        x = _layer_norm(x + attn, w[p + "norm1.weight"], w[p + "norm1.bias"])
        ff = np.maximum(x @ w[p + "linear1.weight"].T + w[p + "linear1.bias"], 0.0)
        ff = ff @ w[p + "linear2.weight"].T + w[p + "linear2.bias"]
        x = _layer_norm(x + ff, w[p + "norm2.weight"], w[p + "norm2.bias"])

    return x @ w["hidden2tag.weight"].T + w["hidden2tag.bias"]


# ------------------------------------------------------------------ viterbi


def viterbi_tcrf(em: np.ndarray, seq_len_actual: int, transitions: np.ndarray,
                 start: np.ndarray, end: np.ndarray) -> list:
    """Best tag-index path over positions [0, seq_len_actual) —
    semantics of ``viterbi_decode`` (transformer_ner.py:214-274);
    returns [] for empty sequences (caller pads with tag 0, matching
    ``path_scores.append([0] * seq_len)`` at :231)."""
    if seq_len_actual == 0:
        return []
    alpha = start + em[0]
    back = []
    for t in range(1, seq_len_actual):
        scores = alpha[:, None] + transitions + em[t][None, :]
        back.append(np.argmax(scores, axis=0))
        alpha = np.max(scores, axis=0)
    last = int(np.argmax(alpha + end))
    path = [last]
    for bp in reversed(back):
        last = int(bp[last])
        path.append(last)
    path.reverse()
    return path


# ------------------------------------------------------------------ predict


def predict_sentences(model: TransformerCRFModel, sentences: list,
                      batch_size: int = 32) -> list:
    """words → tags for a list of token lists, with the reference's
    truncate/pad (transformer_ner.py:580-588), batched emissions, and
    PAD→O / beyond-max→O output rewrite (:617-626)."""
    msl = model.config["max_seq_len"]
    w2i = model.word_to_idx
    unk = w2i[UNK_TOKEN]
    i2t = model.idx_to_tag
    out = []
    for s0 in range(0, len(sentences), batch_size):
        chunk = sentences[s0:s0 + batch_size]
        idx = np.zeros((len(chunk), msl), dtype=np.int64)
        for r, sent in enumerate(chunk):
            for j, word in enumerate(sent[:msl]):
                idx[r, j] = w2i.get(word, unk)
        mask = idx != 0
        em = emissions(model, idx, mask)
        tr, st, en = (model.weights["transitions"],
                      model.weights["start_transitions"],
                      model.weights["end_transitions"])
        for r, sent in enumerate(chunk):
            n = int(mask[r].sum())
            path = viterbi_tcrf(em[r], n, tr, st, en)
            tags = []
            for j in range(len(sent)):
                if j < len(path) and j < msl:
                    t = i2t[path[j]]
                    tags.append("O" if t == PAD_TAG else t)
                else:
                    tags.append("O")                  # beyond max len, :624-626
            out.append(tags)
    return out

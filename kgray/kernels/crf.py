"""Template-feature linear-chain CRF, NumPy re-implementation.

Replicates the computational semantics of the reference CRF
(``/root/reference/crf_ner.py``) without torch:

* CRF++-style template rules, hardcoded list semantics identical to
  ``crf_ner.py:16-40`` (10 unigram U00-U09, 10 observation bigram
  B00-B09, one pure transition ``B``); rule parser semantics as
  ``crf_ner.py:43-97``; ``BOS``/``EOS`` virtual tokens out of range
  (``crf_ner.py:120-128``).
* Feature keys ``"U06:obs_TAG"``, ``"B06:obs_PREV_CUR"``, ``"B:PREV_CUR"``
  (``crf_ner.py:133-147``), interned to dense indices on the gold path
  during training (``crf_ner.py:150-155,563-576``) plus full pure-B
  enumeration excluding ``*→START`` and ``STOP→*`` (``crf_ner.py:578-587``).
* Viterbi with explicit START/STOP boundary potentials
  (``crf_ner.py:371-512``), forward algorithm log Z
  (``crf_ner.py:238-368``), gold-path score (``crf_ner.py:173-236``),
  per-sentence SGD on NLL = log Z − gold (``crf_ner.py:615-619``) with
  analytically computed forward-backward gradients instead of autograd.

Inference uses *compiled* grouped weight tables — one dict probe per
(rule, observation) instead of one per (rule, observation, tag, tag) —
which is algebraically identical to the reference's per-key probing
(absent keys contribute 0 either way) but vectorizes the tag dimension.

Tag strings must not contain ``_`` (true for BIO/BMES sets and the
``<START>``/``<STOP>`` sentinels); the compiler relies on it to split
feature keys unambiguously.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

import numpy as np

from ..constants import START_TAG, STOP_TAG

__all__ = ["TEMPLATE_RULES", "TemplateRule", "parse_template_rule",
           "parse_template_file", "CRFModel", "build_features",
           "viterbi_decode", "log_forward", "sentence_score",
           "train_crf_sgd", "viterbi_batch"]

# Same rule semantics as the reference's authoritative hardcoded list
# (crf_ner.py:16-40; the on-disk template_for_crf.utf8 lacks the pure-B
# rule — the hardcoded list wins per README.md:33).
TEMPLATE_RULES = [
    "U00:%x[-2,0]", "U01:%x[-1,0]", "U02:%x[0,0]", "U03:%x[1,0]", "U04:%x[2,0]",
    "U05:%x[-2,0]/%x[-1,0]", "U06:%x[-1,0]/%x[0,0]", "U07:%x[-1,0]/%x[1,0]",
    "U08:%x[0,0]/%x[1,0]", "U09:%x[1,0]/%x[2,0]",
    "B00:%x[-2,0]", "B01:%x[-1,0]", "B02:%x[0,0]", "B03:%x[1,0]", "B04:%x[2,0]",
    "B05:%x[-2,0]/%x[-1,0]", "B06:%x[-1,0]/%x[0,0]", "B07:%x[-1,0]/%x[1,0]",
    "B08:%x[0,0]/%x[1,0]", "B09:%x[1,0]/%x[2,0]",
    "B",
]


@dataclass(frozen=True)
class TemplateRule:
    prefix: str
    kind: str                 # "U" | "B_obs" | "B_pure"
    offsets: tuple = ()


def parse_template_rule(rule_str: str) -> TemplateRule | None:
    """Parse one CRF++-style rule (semantics of crf_ner.py:43-88)."""
    rule_str = rule_str.strip()
    if rule_str == "B":
        return TemplateRule("B", "B_pure")
    if ":" not in rule_str:
        return None
    prefix, spec = rule_str.split(":", 1)
    if prefix.startswith("U"):
        kind = "U"
    elif prefix.startswith("B"):
        kind = "B_obs"
    else:
        return None
    offsets = []
    if spec:
        for part in spec.split("/"):
            if not (part.startswith("%x[") and part.endswith("]")):
                return None
            try:
                offsets.append(int(part.split("[")[1].split(",")[0]))
            except (IndexError, ValueError):
                return None
    return TemplateRule(prefix, kind, tuple(offsets))


def parse_template_file(text: str) -> list:
    """Parse a CRF++ template file (one rule per line, '#' comments)."""
    rules = []
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        parsed = parse_template_rule(line)
        if parsed:
            rules.append(parsed)
    return rules


def _rules(rules=None) -> list:
    if rules is None:
        rules = TEMPLATE_RULES
    out = []
    for r in rules:
        if isinstance(r, TemplateRule):
            out.append(r)
        else:
            parsed = parse_template_rule(r)
            if parsed:
                out.append(parsed)
    return out


def _word_at(words, pos, offset, length):
    """BOS/EOS virtual tokens out of range (crf_ner.py:120-128)."""
    i = pos + offset
    if 0 <= i < length:
        return words[i]
    return "BOS" if i < 0 else "EOS"


def _obs(words, pos, rule, length):
    return "/".join(_word_at(words, pos, off, length) for off in rule.offsets)


# --------------------------------------------------------------------------- model


@dataclass
class CRFModel:
    weights: np.ndarray           # [F] float64
    feature_to_idx: dict
    tag_to_idx: dict              # includes START/STOP
    idx_to_tag: dict              # int -> tag
    rules: list = field(default_factory=lambda: _rules())

    def __post_init__(self):
        self.rules = _rules(self.rules)
        # actual (emittable) tags in idx order, excluding sentinels
        # (crf_ner.py:243,375).
        self.actual_tags = [t for _, t in sorted(self.idx_to_tag.items())
                            if t not in (START_TAG, STOP_TAG)]
        for t in self.tag_to_idx:
            assert "_" not in t, f"tag {t!r} contains '_'; key compilation would be ambiguous"
        self._compiled = None

    # ---------------------------------------------------------------- compile
    def compiled(self):
        """Grouped weight tables over the extended tag axis
        [actual..., START, STOP]; built once (actor __init__)."""
        if self._compiled is not None:
            return self._compiled
        Ta = len(self.actual_tags)
        ext = {t: i for i, t in enumerate(self.actual_tags)}
        ext[START_TAG] = Ta
        ext[STOP_TAG] = Ta + 1
        E = Ta + 2
        u_table: dict = {}
        b_table: dict = {}
        pure = np.zeros((E, E), dtype=np.float64)
        for key, idx in self.feature_to_idx.items():
            w = float(self.weights[idx])
            prefix, rest = key.split(":", 1)
            if prefix == "B":
                prev, cur = rest.rsplit("_", 1)
                pure[ext[prev], ext[cur]] += w
            elif prefix.startswith("U"):
                obs, cur = rest.rsplit("_", 1)
                vec = u_table.get((prefix, obs))
                if vec is None:
                    vec = u_table[(prefix, obs)] = np.zeros(E, dtype=np.float64)
                vec[ext[cur]] += w
            else:  # B_obs
                obs, prev, cur = rest.rsplit("_", 2)
                mat = b_table.get((prefix, obs))
                if mat is None:
                    mat = b_table[(prefix, obs)] = np.zeros((E, E), dtype=np.float64)
                mat[ext[prev], ext[cur]] += w
        self._compiled = {"u": u_table, "b": b_table, "pure": pure,
                          "Ta": Ta, "START": Ta, "STOP": Ta + 1,
                          "u_rules": [r for r in self.rules if r.kind == "U"],
                          "b_rules": [r for r in self.rules if r.kind == "B_obs"],
                          "has_pure": any(r.kind == "B_pure" for r in self.rules),
                          # memo window must cover every rule offset —
                          # user templates may exceed the default -2..2
                          "win": max((abs(o) for r in self.rules
                                      for o in r.offsets), default=2)}
        return self._compiled

    # ---------------------------------------------------------------- io
    def save(self, path: str) -> None:
        base = path[:-4] if path.endswith(".npz") else path
        np.savez(base + ".npz", weights=self.weights)
        with open(base + ".json", "w", encoding="utf-8") as f:
            json.dump({"feature_to_idx": self.feature_to_idx,
                       "tag_to_idx": self.tag_to_idx,
                       "rules": [r.prefix if r.kind == "B_pure"
                                 else f"{r.prefix}:" + "/".join(f"%x[{o},0]" for o in r.offsets)
                                 for r in self.rules]}, f)

    @classmethod
    def load(cls, path: str) -> "CRFModel":
        base = path[:-4] if path.endswith(".npz") else path
        z = np.load(base + ".npz")
        with open(base + ".json", "r", encoding="utf-8") as f:
            meta = json.load(f)
        tag_to_idx = {t: int(i) for t, i in meta["tag_to_idx"].items()}
        return cls(weights=z["weights"], feature_to_idx=meta["feature_to_idx"],
                   tag_to_idx=tag_to_idx,
                   idx_to_tag={i: t for t, i in tag_to_idx.items()},
                   rules=meta["rules"])


def build_tag_index(observed_tags) -> tuple:
    """Deterministic tag index: sorted observed tags, then START, STOP.

    (The reference enumerates ``list(set)`` — crf_ner.py:560 — whose
    order is arbitrary; sorting makes distributed builds reproducible.)
    """
    tags = sorted(set(observed_tags) - {START_TAG, STOP_TAG})
    tags += [START_TAG, STOP_TAG]
    tag_to_idx = {t: i for i, t in enumerate(tags)}
    return tag_to_idx, {i: t for t, i in tag_to_idx.items()}


def _gold_path_keys(words, tags, rules):
    """Yield every feature key active on the gold path, including the
    STOP transition (crf_ner.py:563-576 + sentence_score :173-236)."""
    L = len(words)
    positions = list(range(L)) + [L]           # L = STOP position
    for i in positions:
        cur = STOP_TAG if i == L else tags[i]
        prev = START_TAG if i == 0 else tags[i - 1]
        for r in rules:
            if r.kind == "B_pure":
                yield f"B:{prev}_{cur}"
            else:
                obs = _obs(words, i, r, L)
                if r.kind == "U":
                    yield f"{r.prefix}:{obs}_{cur}"
                else:
                    yield f"{r.prefix}:{obs}_{prev}_{cur}"


def build_features(sents_words, sents_tags, rules=None) -> tuple:
    """Gold-path feature interning + pure-B enumeration
    (crf_ner.py:563-590).  Returns (feature_to_idx, tag_to_idx, idx_to_tag)."""
    rules = _rules(rules)
    tag_set = {START_TAG, STOP_TAG}
    for tags in sents_tags:
        tag_set.update(tags)
    tag_to_idx, idx_to_tag = build_tag_index(tag_set)

    feature_to_idx: dict = {}
    for words, tags in zip(sents_words, sents_tags):
        if not words:
            # empty sentence contributes START->STOP features (crf_ner.py:575-576)
            for key in _gold_path_keys([], [], rules):
                feature_to_idx.setdefault(key, len(feature_to_idx))
            continue
        for key in _gold_path_keys(words, tags, rules):
            feature_to_idx.setdefault(key, len(feature_to_idx))

    if any(r.kind == "B_pure" for r in rules):
        all_tags = sorted(tag_set - {START_TAG, STOP_TAG}) + [START_TAG, STOP_TAG]
        for prev in all_tags:
            for cur in all_tags:
                if prev == STOP_TAG or cur == START_TAG:
                    continue
                feature_to_idx.setdefault(f"B:{prev}_{cur}", len(feature_to_idx))
    return feature_to_idx, tag_to_idx, idx_to_tag


# --------------------------------------------------------------------------- potentials (compiled, inference path)


def _window_scores(words, i, c, cache):
    """(u_vec[Ta+2], b_mat[Ta+2,Ta+2]) for position i — fully determined
    by the token context window spanning every rule offset (±c['win'],
    derived from the model's templates), so batch decoding memoizes on
    it (``cache``: window tuple → arrays; fresh per batch)."""
    L = len(words)
    if cache is not None:
        w = c["win"]
        key = tuple(_word_at(words, i, off, L) for off in range(-w, w + 1))
        hit = cache.get(key)
        if hit is not None:
            return hit
    v = np.zeros(c["Ta"] + 2, dtype=np.float64)
    for r in c["u_rules"]:
        u = c["u"].get((r.prefix, _obs(words, i, r, L)))
        if u is not None:
            v += u
    m = np.zeros((c["Ta"] + 2, c["Ta"] + 2), dtype=np.float64)
    for r in c["b_rules"]:
        b = c["b"].get((r.prefix, _obs(words, i, r, L)))
        if b is not None:
            m += b
    if cache is not None:
        cache[key] = (v, m)
    return v, m


def _potentials(words, model: CRFModel, cache=None):
    """Assemble per-position potentials from compiled tables.

    Returns (e0[Ta], steps, stop[Ta]) where steps[i-1] = pot[k, j] for
    position i >= 1 (pot includes the position's unigram scores), matching
    ``current_word_potentials`` at crf_ner.py:457-458.
    """
    c = model.compiled()
    Ta, S, P = c["Ta"], c["START"], c["STOP"]
    L = len(words)
    pure = c["pure"] if c["has_pure"] else np.zeros((Ta + 2, Ta + 2))

    u0, b0 = _window_scores(words, 0, c, cache)
    e0 = u0[:Ta] + b0[S, :Ta] + pure[S, :Ta]                # crf_ner.py:396-424
    steps = []
    for i in range(1, L):
        ui, bi = _window_scores(words, i, c, cache)
        pot = bi[:Ta, :Ta] + pure[:Ta, :Ta] + ui[None, :Ta]
        steps.append(pot)
    uL, bL = _window_scores(words, L, c, cache)
    stop = bL[:Ta, P] + pure[:Ta, P] + uL[P]                # crf_ner.py:469-497
    return e0, steps, stop


def empty_sentence_score(model: CRFModel) -> float:
    """START→STOP score of the empty sentence (crf_ner.py:383-388)."""
    c = model.compiled()
    S, P = c["START"], c["STOP"]
    score = 0.0
    for r in c["u_rules"]:
        hit = c["u"].get((r.prefix, _obs([], 0, r, 0)))
        if hit is not None:
            score += hit[P]
    for r in c["b_rules"]:
        hit = c["b"].get((r.prefix, _obs([], 0, r, 0)))
        if hit is not None:
            score += hit[S, P]
    if c["has_pure"]:
        score += c["pure"][S, P]
    return float(score)


def viterbi_decode(words, model: CRFModel, cache=None):
    """Best tag sequence + score (semantics of crf_ner.py:371-512).

    ``cache``: optional per-batch window-score memo (see _window_scores).
    """
    Ta = len(model.actual_tags)
    if Ta == 0:
        return [], float("-inf")
    if len(words) == 0:
        return [], empty_sentence_score(model)
    e0, steps, stop = _potentials(words, model, cache)
    L = len(words)
    bp = np.zeros((L, Ta), dtype=np.int64)
    alpha = e0
    for i, pot in enumerate(steps, start=1):
        scores = alpha[:, None] + pot
        bp[i] = np.argmax(scores, axis=0)
        alpha = scores[bp[i], np.arange(Ta)]
    final = alpha + stop
    best = int(np.argmax(final))
    path = [0] * L
    path[L - 1] = best
    for i in range(L - 1, 0, -1):
        path[i - 1] = int(bp[i, path[i]])
    return [model.actual_tags[j] for j in path], float(final[best])


def viterbi_batch(sentences, model: CRFModel):
    cache: dict = {}
    return [viterbi_decode(s, model, cache)[0] for s in sentences]


def _logsumexp(a, axis=None):
    m = np.max(a, axis=axis, keepdims=True)
    m = np.where(np.isfinite(m), m, 0.0)
    out = np.log(np.sum(np.exp(a - m), axis=axis)) + np.squeeze(m, axis=axis)
    return out


def log_forward(words, model: CRFModel) -> float:
    """log Z(x) via the forward algorithm (crf_ner.py:238-368)."""
    if len(words) == 0:
        return empty_sentence_score(model)
    e0, steps, stop = _potentials(words, model)
    alpha = e0
    for pot in steps:
        alpha = _logsumexp(alpha[:, None] + pot, axis=0)
    return float(_logsumexp(alpha + stop, axis=0))


def sentence_score(words, tags, model: CRFModel) -> float:
    """Gold-path score: sum of weights of active features incl. the STOP
    transition (crf_ner.py:173-236)."""
    f2i = model.feature_to_idx
    w = model.weights
    return float(sum(w[f2i[k]] for k in _gold_path_keys(list(words), list(tags), model.rules)
                     if k in f2i))


# --------------------------------------------------------------------------- training


def _marginals(words, model: CRFModel):
    """Forward-backward unary/pairwise marginals for the gradient.

    Returns (logZ, m0[Ta], pair list of M_i[k,j] for i>=1, stop_m[Ta]).
    """
    e0, steps, stop = _potentials(words, model)
    L = len(words)
    Ta = e0.shape[0]
    alphas = np.empty((L, Ta))
    alphas[0] = e0
    for i, pot in enumerate(steps, start=1):
        alphas[i] = _logsumexp(alphas[i - 1][:, None] + pot, axis=0)
    logZ = float(_logsumexp(alphas[L - 1] + stop, axis=0))
    betas = np.empty((L, Ta))
    betas[L - 1] = stop
    for i in range(L - 1, 0, -1):
        betas[i - 1] = _logsumexp(steps[i - 1] + betas[i][None, :], axis=1)
    unary = np.exp(alphas + betas - logZ)                     # [L, Ta]
    pair = [np.exp(alphas[i - 1][:, None] + steps[i - 1] + betas[i][None, :] - logZ)
            for i in range(1, L)]
    stop_m = np.exp(alphas[L - 1] + stop - logZ)
    return logZ, unary, pair, stop_m


def _accumulate_expected(words, model: CRFModel, grad, unary, pair, stop_m):
    """expected feature counts under the model → grad += E[f]."""
    f2i = model.feature_to_idx
    rules = model.rules
    actual = model.actual_tags
    L = len(words)
    for i in range(L + 1):
        if i == 0:
            prev_dist = None                      # prev fixed to START
            cur_dist = unary[0]
            prevs, curs = [START_TAG], actual
            pmat = cur_dist[None, :]
        elif i == L:
            prevs, curs = actual, [STOP_TAG]
            pmat = stop_m[:, None]
        else:
            prevs, curs = actual, actual
            pmat = pair[i - 1]
        for r in rules:
            if r.kind == "B_pure":
                for ki, prev in enumerate(prevs):
                    for ji, cur in enumerate(curs):
                        idx = f2i.get(f"B:{prev}_{cur}")
                        if idx is not None:
                            grad[idx] += pmat[ki, ji]
            elif r.kind == "U":
                obs = _obs(words, i, r, L)
                if i == L:
                    idx = f2i.get(f"{r.prefix}:{obs}_{STOP_TAG}")
                    if idx is not None:
                        grad[idx] += 1.0          # added to every path
                else:
                    marg = unary[i]
                    for ji, cur in enumerate(actual):
                        idx = f2i.get(f"{r.prefix}:{obs}_{cur}")
                        if idx is not None:
                            grad[idx] += marg[ji]
            else:  # B_obs
                obs = _obs(words, i, r, L)
                for ki, prev in enumerate(prevs):
                    for ji, cur in enumerate(curs):
                        idx = f2i.get(f"{r.prefix}:{obs}_{prev}_{cur}")
                        if idx is not None:
                            grad[idx] += pmat[ki, ji]


def nll_and_grad(words, tags, model: CRFModel):
    """loss = log Z − gold score; grad = E_model[f] − f_observed
    (the analytic gradient of crf_ner.py:615-619's autograd loss)."""
    grad = np.zeros_like(model.weights)
    logZ, unary, pair, stop_m = _marginals(words, model)
    _accumulate_expected(words, model, grad, unary, pair, stop_m)
    gold = 0.0
    f2i = model.feature_to_idx
    for key in _gold_path_keys(list(words), list(tags), model.rules):
        idx = f2i.get(key)
        if idx is not None:
            gold += model.weights[idx]
            grad[idx] -= 1.0
    return logZ - gold, grad


def train_crf_sgd(sents_words, sents_tags, rules=None, epochs=10, lr=0.01,
                  verbose=False) -> CRFModel:
    """Per-sentence SGD on NLL, reference schedule (crf_ner.py:602-637):
    zero-init weights, lr default 0.01, 10 epochs, skip inf/nan losses."""
    rules = _rules(rules)
    feature_to_idx, tag_to_idx, idx_to_tag = build_features(sents_words, sents_tags, rules)
    model = CRFModel(weights=np.zeros(len(feature_to_idx), dtype=np.float64),
                     feature_to_idx=feature_to_idx, tag_to_idx=tag_to_idx,
                     idx_to_tag=idx_to_tag, rules=rules)
    for epoch in range(epochs):
        total = 0.0
        for words, tags in zip(sents_words, sents_tags):
            if not words:
                continue
            loss, grad = nll_and_grad(words, tags, model)
            if np.isfinite(loss):
                model.weights -= lr * grad
                model._compiled = None            # weights changed
                total += loss
        if verbose:
            n = max(1, len(sents_words))
            print(f"epoch {epoch + 1}: avg loss {total / n:.4f}")
    model._compiled = None
    return model

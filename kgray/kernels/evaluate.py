"""Per-label precision/recall/F1 report (sklearn-free).

Re-implements what ``/root/reference/check.py:38-40`` gets from
``sklearn.metrics.classification_report(labels=sort_labels[1:], digits=4)``:
per-label P/R/F1/support over two flattened token-tag streams, plus
micro/macro/weighted averages.  Label order follows the reference's
hardcoded lists (``check.py:5-17``) with ``O`` excluded.
"""

from __future__ import annotations

from collections import Counter

__all__ = ["classification_report", "align_conll_files", "triple_prf"]


def classification_report(y_true: list, y_pred: list, labels: list) -> dict:
    """Return {label: {precision, recall, f1, support}} + averages."""
    tp = Counter()
    pred_n = Counter()
    true_n = Counter()
    for t, p in zip(y_true, y_pred):
        pred_n[p] += 1
        true_n[t] += 1
        if t == p:
            tp[t] += 1

    report = {}
    sum_tp = sum_pred = sum_true = 0
    macro_p = macro_r = macro_f = 0.0
    wp = wr = wf = 0.0
    total_support = 0
    for lab in labels:
        p = tp[lab] / pred_n[lab] if pred_n[lab] else 0.0
        r = tp[lab] / true_n[lab] if true_n[lab] else 0.0
        f = 2 * p * r / (p + r) if (p + r) else 0.0
        s = true_n[lab]
        report[lab] = {"precision": p, "recall": r, "f1": f, "support": s}
        sum_tp += tp[lab]
        sum_pred += pred_n[lab]
        sum_true += true_n[lab]
        macro_p += p
        macro_r += r
        macro_f += f
        wp += p * s
        wr += r * s
        wf += f * s
        total_support += s

    n = len(labels) or 1
    micro_p = sum_tp / sum_pred if sum_pred else 0.0
    micro_r = sum_tp / sum_true if sum_true else 0.0
    micro_f = 2 * micro_p * micro_r / (micro_p + micro_r) if (micro_p + micro_r) else 0.0
    report["micro avg"] = {"precision": micro_p, "recall": micro_r, "f1": micro_f, "support": total_support}
    report["macro avg"] = {"precision": macro_p / n, "recall": macro_r / n, "f1": macro_f / n, "support": total_support}
    if total_support:
        report["weighted avg"] = {"precision": wp / total_support, "recall": wr / total_support,
                                  "f1": wf / total_support, "support": total_support}
    return report


def align_conll_files(gold_path: str, pred_path: str):
    """Line-positional alignment of gold vs prediction files, skipping
    blank gold lines — the reference's join semantics (check.py:26-37)."""
    y_true, y_pred = [], []
    with open(gold_path, "r", encoding="utf-8") as gf, open(pred_path, "r", encoding="utf-8") as mf:
        g_lines = gf.readlines()
        m_lines = mf.readlines()
        for i in range(len(g_lines)):
            if g_lines[i] == "\n":
                continue
            g_tag = g_lines[i].strip().split(" ")[-1]
            m_tag = m_lines[i].strip().split(" ")[-1]
            y_true.append(g_tag)
            y_pred.append(m_tag)
    return y_true, y_pred


def triple_prf(predicted: set, gold: set) -> dict:
    """Set precision/recall/F1 of (subj, pred, obj) triples — the north
    rule's e2e quality gate (P/R >= 0.95 vs the reference extractor)."""
    inter = len(predicted & gold)
    p = inter / len(predicted) if predicted else 0.0
    r = inter / len(gold) if gold else 0.0
    f = 2 * p * r / (p + r) if (p + r) else 0.0
    return {"precision": p, "recall": r, "f1": f,
            "n_predicted": len(predicted), "n_gold": len(gold), "n_common": inter}

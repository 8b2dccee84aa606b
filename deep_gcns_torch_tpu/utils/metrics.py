"""Host-side metrics matching the reference's evaluation protocols.

* roc_auc — rank-based (Mann-Whitney), column-averaged over labeled entries:
  OGB Evaluator semantics for ogbn-proteins / ogbg-molhiv.
* accuracy — ogbn-arxiv/products/ppa.
* micro_f1 — PPI (`examples/ppi/main.py:80-82`).
* miou / part-seg protocol — S3DIS per-class I/U accumulation
  (`examples/sem_seg_dense/train.py:104-138`).
* overall/balanced accuracy — ModelNet40 (`examples/modelnet_cls/main.py:106-107`).
* hits_at_k — ogbl-collab (`examples/ogb/ogbl_collab/main.py:57-75`).
* AverageMeter — `utils/metrics.py:8-24`.

Pure numpy — no sklearn dependency.
"""

from __future__ import annotations

import numpy as np


class AverageMeter:
    """Running average (`utils/metrics.py:8-24`)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


def _binary_auc(score: np.ndarray, label: np.ndarray) -> float:
    """Mann-Whitney AUC; ties handled by average ranks."""
    order = np.argsort(score, kind="mergesort")
    ranks = np.empty_like(order, float)
    s = score[order]
    # average ranks for ties
    i = 0
    n = len(s)
    while i < n:
        j = i
        while j + 1 < n and s[j + 1] == s[i]:
            j += 1
        ranks[order[i:j + 1]] = 0.5 * (i + j) + 1.0
        i = j + 1
    pos = label > 0.5
    n_pos = int(pos.sum())
    n_neg = n - n_pos
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    return (ranks[pos].sum() - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)


def roc_auc(scores: np.ndarray, labels: np.ndarray) -> float:
    """Column-averaged ROC-AUC over labeled (non-NaN) entries, skipping columns
    without both classes (OGB Evaluator behavior)."""
    scores = np.asarray(scores, float)
    labels = np.asarray(labels, float)
    if scores.ndim == 1:
        scores, labels = scores[:, None], labels[:, None]
    aucs = []
    for c in range(scores.shape[1]):
        ok = ~np.isnan(labels[:, c])
        if ok.sum() == 0:
            continue
        a = _binary_auc(scores[ok, c], labels[ok, c])
        if not np.isnan(a):
            aucs.append(a)
    return float(np.mean(aucs)) if aucs else float("nan")


def average_precision(scores: np.ndarray, labels: np.ndarray) -> float:
    """Column-averaged AP (ogbg-molpcba metric), NaN labels skipped."""
    scores = np.asarray(scores, float)
    labels = np.asarray(labels, float)
    if scores.ndim == 1:
        scores, labels = scores[:, None], labels[:, None]
    aps = []
    for c in range(scores.shape[1]):
        ok = ~np.isnan(labels[:, c])
        y = labels[ok, c]
        s = scores[ok, c]
        if ok.sum() == 0 or y.sum() == 0 or y.sum() == len(y):
            continue
        order = np.argsort(-s, kind="mergesort")
        y = y[order]
        tp = np.cumsum(y)
        precision = tp / np.arange(1, len(y) + 1)
        aps.append(float((precision * y).sum() / y.sum()))
    return float(np.mean(aps)) if aps else float("nan")


def accuracy(pred: np.ndarray, labels: np.ndarray) -> float:
    return float((np.asarray(pred) == np.asarray(labels)).mean())


def balanced_accuracy(pred: np.ndarray, labels: np.ndarray) -> float:
    """Mean per-class recall (ModelNet40 'avg acc')."""
    pred, labels = np.asarray(pred), np.asarray(labels)
    accs = []
    for c in np.unique(labels):
        m = labels == c
        accs.append(float((pred[m] == c).mean()))
    return float(np.mean(accs))


def micro_f1(pred: np.ndarray, labels: np.ndarray) -> float:
    """Micro-averaged F1 over binary multi-label predictions (PPI)."""
    pred = np.asarray(pred) > 0
    labels = np.asarray(labels) > 0.5
    tp = float(np.logical_and(pred, labels).sum())
    fp = float(np.logical_and(pred, ~labels).sum())
    fn = float(np.logical_and(~pred, labels).sum())
    denom = 2 * tp + fp + fn
    return 2 * tp / denom if denom > 0 else 0.0


class IoUAccumulator:
    """Per-class intersection/union accumulation → mIoU
    (`examples/sem_seg_dense/train.py:104-138`)."""

    def __init__(self, num_classes: int):
        self.i = np.zeros(num_classes, np.int64)
        self.u = np.zeros(num_classes, np.int64)

    def update(self, pred: np.ndarray, label: np.ndarray):
        for c in range(len(self.i)):
            p = pred == c
            l = label == c
            self.i[c] += int(np.logical_and(p, l).sum())
            self.u[c] += int(np.logical_or(p, l).sum())

    def miou(self) -> float:
        valid = self.u > 0
        return float((self.i[valid] / self.u[valid]).mean()) if valid.any() else 0.0


def hits_at_k(pos_scores: np.ndarray, neg_scores: np.ndarray, k: int) -> float:
    """Fraction of positive edges ranked above the k-th best negative
    (OGB link-prediction Hits@K)."""
    neg_sorted = np.sort(np.asarray(neg_scores))[::-1]
    if len(neg_sorted) < k:
        return 1.0
    thresh = neg_sorted[k - 1]
    return float((np.asarray(pos_scores) > thresh).mean())


def part_seg_miou(preds: np.ndarray, labels: np.ndarray, n_classes: int):
    """PartNet protocol (`examples/part_sem_seg/main.py:102-148`): returns
    (mean_part_iou, shape_mIoU).  Per shape, IoU is averaged over classes with
    non-empty union; part IoU accumulates I/U per class over all shapes and
    averages over classes EXCLUDING class 0 (the reference's `part_iou =
    np.divide(part_intersect[1:], part_union[1:])` — class 0 is 'other')."""
    preds = np.asarray(preds)
    labels = np.asarray(labels)
    part_i = np.zeros(n_classes, np.float64)
    part_u = np.zeros(n_classes, np.float64)
    shape_tot, shape_cnt = 0.0, 0
    for p, l in zip(preds, labels):
        cur_tot, cur_cnt = 0.0, 0
        for c in range(n_classes):
            pi = p == c
            li = l == c
            inter = float(np.logical_and(pi, li).sum())
            union = float(np.logical_or(pi, li).sum())
            if union > 0:
                part_i[c] += inter
                part_u[c] += union
                cur_tot += inter / union
                cur_cnt += 1
        if cur_cnt > 0:
            shape_tot += cur_tot / cur_cnt
            shape_cnt += 1
    shape_miou = shape_tot / shape_cnt if shape_cnt else 0.0
    with np.errstate(divide="ignore", invalid="ignore"):
        part_iou = part_i[1:] / part_u[1:]
    mean_part_iou = float(np.nanmean(part_iou)) if len(part_iou) else 0.0
    return mean_part_iou, float(shape_miou)

"""Evaluators for the object-level tasks (classification / part-seg).

The reference ships the cls/part-seg models without drivers
(SURVEY.md §2.1); these evaluators follow the standard upstream protocol
those models were trained with: instance + mean-class accuracy for
ModelNet, and category-restricted instance-average mIoU for ShapeNetPart
(per shape, predictions are argmaxed over the shape's own category part
ids only; empty-part unions count IoU 1).

Both run fixed-shape batches (tail wrap-padded, padding masked out of
the metrics) so a single jitted forward serves the whole split.
"""

from __future__ import annotations

import numpy as np

from pointsecguard_tpu.data.shapenet_part import SEG_CLASSES


def _padded_batches(n: int, batch_size: int):
    """Yield (index array of len batch_size, n_valid) covering 0..n-1."""
    for s in range(0, n, batch_size):
        idx = np.arange(s, min(s + batch_size, n))
        n_valid = len(idx)
        if n_valid < batch_size:
            idx = np.concatenate([idx, np.zeros(batch_size - n_valid, int)])
        yield idx, n_valid


def evaluate_cls(
    predict_logp,
    dataset,
    *,
    batch_size: int = 16,
    num_votes: int = 1,
    rng: np.random.Generator | None = None,
) -> tuple[float, float, np.ndarray]:
    """→ (instance accuracy, mean per-class accuracy, [n] predictions).

    ``predict_logp(points [B,N,C]) -> log-probs [B,K]``. Vote pooling is
    softmax-space summation (the upstream ``test_classification`` pool);
    upstream's extra votes rerun the bit-identical forward, which is a
    no-op — here each extra vote draws a fresh random point subset via
    ``dataset.load(i, rng)``, so voting actually pools evidence
    (documented superset).
    """
    rng = rng or np.random.default_rng(0)
    n = len(dataset)
    preds = np.zeros(n, np.int64)
    labels = np.asarray(dataset.labels, np.int64)
    for idx, n_valid in _padded_batches(n, batch_size):
        votes = 0.0
        for v in range(max(num_votes, 1)):
            # vote 0 = the deterministic protocol subset; later votes
            # resample
            pts = np.stack([
                dataset.load(i, rng if v else None)[0] for i in idx
            ])
            votes = votes + np.exp(np.asarray(predict_logp(pts)))
        take = idx[:n_valid]
        preds[take] = votes[:n_valid].argmax(axis=-1)
    inst_acc = float((preds == labels).mean()) if n else 0.0
    class_accs = []
    for c in range(dataset.num_classes):
        m = labels == c
        if m.any():
            class_accs.append(float((preds[m] == c).mean()))
    return inst_acc, float(np.mean(class_accs)) if class_accs else 0.0, preds


def shape_part_ious(
    logp: np.ndarray, seg: np.ndarray, category: str
) -> list[float]:
    """Per-part IoUs of ONE shape with category-restricted argmax
    (upstream protocol): logits outside the category's part ids are
    ignored; a part absent from both gt and pred scores IoU 1."""
    parts = SEG_CLASSES[category]
    local = np.asarray(logp)[:, parts].argmax(axis=-1)
    pred = np.array(parts)[local]
    ious = []
    for p in parts:
        inter = ((seg == p) & (pred == p)).sum()
        union = ((seg == p) | (pred == p)).sum()
        ious.append(1.0 if union == 0 else float(inter) / float(union))
    return ious


def evaluate_partseg(
    predict_logp,
    dataset,
    *,
    batch_size: int = 8,
    num_object_classes: int = 16,
) -> dict:
    """→ {"instance_miou", "class_avg_miou", "accuracy",
    "category_miou": {cat: miou}}.

    ``predict_logp(points [B,N,C], cls_onehot [B,16]) -> [B,N,50]``
    log-probs. Deterministic point subsets (wrap-repeat), the eval
    analog of the upstream fixed-seed test pass.
    """
    n = len(dataset)
    shape_miou: dict[str, list[float]] = {}
    correct = total = 0
    for idx, n_valid in _padded_batches(n, batch_size):
        loaded = [dataset.load(i) for i in idx]
        pts = np.stack([l[0] for l in loaded])
        cls = np.array([l[1] for l in loaded])
        onehot = np.eye(num_object_classes, dtype=np.float32)[cls]
        logp = np.asarray(predict_logp(pts, onehot))
        for j in range(n_valid):
            cat = dataset.categories[idx[j]]
            seg = loaded[j][2]
            ious = shape_part_ious(logp[j], seg, cat)
            shape_miou.setdefault(cat, []).append(float(np.mean(ious)))
            parts = SEG_CLASSES[cat]
            local = logp[j][:, parts].argmax(axis=-1)
            pred = np.array(parts)[local]
            correct += int((pred == seg).sum())
            total += seg.size
    cat_miou = {c: float(np.mean(v)) for c, v in sorted(shape_miou.items())}
    all_shapes = [m for v in shape_miou.values() for m in v]
    return {
        "instance_miou": float(np.mean(all_shapes)) if all_shapes else 0.0,
        "class_avg_miou": float(np.mean(list(cat_miou.values())))
        if cat_miou else 0.0,
        "accuracy": correct / total if total else 0.0,
        "category_miou": cat_miou,
    }

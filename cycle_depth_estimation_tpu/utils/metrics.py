"""Evaluation metrics: KITTI depth suite + segmentation accuracy/mIoU.

Port of the reference's depth-metric harness
(reference new_multi/my_eval.py:7-108; same formulas in new_model/my_eval.py):
pred renormalized per-image to [1, 50], gt masked to (1, 50), then
AbsRel / SqRel / RMSE / RMSElog / δ<1.25^{1,2,3}. The seg proxies are the
reference's valid-pixel accuracy (models/seg_model.py:73-77,93-98) plus a
proper confusion-matrix mIoU (absent from the reference, standard for the
task).
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np


def compute_errors(ground_truth: np.ndarray, prediction: np.ndarray
                   ) -> Tuple[float, float, float, float, float, float, float]:
    """Depth error suite over masked 1-D arrays (my_eval.py:7-31).

    ``prediction`` is min-max renormalized to [1, 50] exactly as the
    reference does before comparison.
    """
    span = prediction.max() - prediction.min()
    if span <= 0:
        span = 1e-6
    prediction = (prediction - prediction.min()) / span * 49 + 1
    threshold = np.maximum(ground_truth / prediction, prediction / ground_truth)
    a1 = float((threshold < 1.25).mean())
    a2 = float((threshold < 1.25 ** 2).mean())
    a3 = float((threshold < 1.25 ** 3).mean())
    rmse = float(np.sqrt(((ground_truth - prediction) ** 2).mean()))
    rmse_log = float(np.sqrt(((np.log(ground_truth) - np.log(prediction)) ** 2).mean()))
    abs_rel = float(np.mean(np.abs(ground_truth - prediction) / ground_truth))
    sq_rel = float(np.mean(((ground_truth - prediction) ** 2) / ground_truth))
    return abs_rel, sq_rel, rmse, rmse_log, a1, a2, a3


DEPTH_METRIC_NAMES = ("abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3")


def eval_depth_pair(gt: np.ndarray, pred: np.ndarray) -> Optional[Dict[str, float]]:
    """One gt/pred image pair under the KITTI val_selection protocol
    (my_eval.py:49-103): pred scaled /255·80, clipped to [1, 50]; gt mask
    1 < gt < 50. Returns None when the mask is empty."""
    pred = pred.astype(np.float64) / 255.0 * 80.0
    pred = np.clip(pred, 1.0, 50.0)
    gt = gt.astype(np.float64)
    mask = np.logical_and(gt > 1, gt < 50)
    if not mask.any():
        return None
    vals = compute_errors(gt[mask], pred[mask])
    return dict(zip(DEPTH_METRIC_NAMES, vals))


def imread_gray8(path: str) -> np.ndarray:
    """``cv2.imread(path, 0)`` semantics (the reference's GT/pred reader,
    my_eval.py:52-54): 16-bit PNGs convert to 8-bit by ``>> 8``.

    PIL's ``.convert("L")`` on 16-bit files SATURATES at 255 instead
    (verified empirically) — on KITTI ``val_selection_cropped`` ground truth
    (uint16, meters×256) that would clamp everything beyond 1 m. cv2 is used
    when present; the fallback reproduces the shift explicitly.
    """
    try:
        import cv2

        return cv2.imread(path, 0)
    except ImportError:
        from PIL import Image

        arr = np.array(Image.open(path))
        if arr.ndim == 3:  # RGB → cv2's BGR-weighted luma
            arr = (0.114 * arr[..., 2] + 0.587 * arr[..., 1]
                   + 0.299 * arr[..., 0]).round()
        if arr.dtype == np.uint16 or arr.dtype == np.int32:
            arr = arr >> 8
        return arr.astype(np.uint8)


def _resize_linear(img: np.ndarray, size_wh) -> np.ndarray:
    """``cv2.resize`` default INTER_LINEAR (reference my_eval.py:54).

    The cv2-free fallback replicates INTER_LINEAR exactly with a vectorized
    2×2 gather (half-pixel centers, edge clamp) instead of PIL — whose
    BILINEAR antialiases on downscale and made depth metrics
    environment-dependent (review fix)."""
    try:
        import cv2

        return cv2.resize(img, size_wh)
    except ImportError:
        ow, oh = size_wh
        h, w = img.shape[:2]

        def coords(out_len, in_len):
            pos = (np.arange(out_len, dtype=np.float64) + 0.5) * (
                in_len / out_len) - 0.5
            i0 = np.clip(np.floor(pos).astype(np.int64), 0, in_len - 1)
            i1 = np.clip(i0 + 1, 0, in_len - 1)
            f = np.clip(pos - np.floor(pos), 0.0, 1.0)
            f[pos < 0] = 0.0
            return i0, i1, f

        y0, y1, fy = coords(oh, h)
        x0, x1, fx = coords(ow, w)
        a = img.astype(np.float64)
        if a.ndim == 3:
            fx, fy = fx[:, None], fy[:, None, None]
        else:
            fy = fy[:, None]
        top = a[y0][:, x0] * (1 - fx) + a[y0][:, x1] * fx
        bot = a[y1][:, x0] * (1 - fx) + a[y1][:, x1] * fx
        out = top * (1 - fy) + bot * fy
        if np.issubdtype(img.dtype, np.integer):
            out = np.round(out)
        return out.astype(img.dtype)


def eval_depth_dirs(gt_dir: str, pred_dir: str) -> Dict[str, float]:
    """Directory-level harness (reference eval_metric, my_eval.py:35-108):
    grayscale reads, pred resized to gt size, averaged over common files."""
    files = sorted(os.listdir(gt_dir))
    pred_files = set(os.listdir(pred_dir))
    acc = {k: 0.0 for k in DEPTH_METRIC_NAMES}
    n = 0
    for f in files:
        if f not in pred_files:
            continue
        gt = imread_gray8(os.path.join(gt_dir, f))
        pred = _resize_linear(imread_gray8(os.path.join(pred_dir, f)),
                              (gt.shape[1], gt.shape[0]))
        m = eval_depth_pair(gt, pred)
        if m is None:
            continue
        for k in acc:
            acc[k] += m[k]
        n += 1
    if n == 0:
        raise ValueError(f"no overlapping gt/pred files in {gt_dir} vs {pred_dir}")
    return {k: v / n for k, v in acc.items()}


# ---------------------------------------------------------------------------
# segmentation
# ---------------------------------------------------------------------------


def pixel_accuracy(pred: np.ndarray, label: np.ndarray,
                   ignore_index: int = 255) -> float:
    """Valid-pixel accuracy (reference models/seg_model.py:73-77)."""
    mask = label != ignore_index
    if not mask.any():
        return 0.0
    return float((pred[mask] == label[mask]).mean())


def confusion_matrix(pred: np.ndarray, label: np.ndarray, num_classes: int,
                     ignore_index: int = 255) -> np.ndarray:
    mask = ((label != ignore_index) & (label >= 0) & (label < num_classes)
            # out-of-range predictions (e.g. ignore-filled maps) would blow
            # the bincount past num_classes² (review fix)
            & (pred >= 0) & (pred < num_classes))
    idx = label[mask].astype(np.int64) * num_classes + pred[mask].astype(np.int64)
    cm = np.bincount(idx, minlength=num_classes * num_classes)
    return cm.reshape(num_classes, num_classes)


def miou_from_confusion(cm: np.ndarray) -> float:
    inter = np.diag(cm).astype(np.float64)
    union = cm.sum(0) + cm.sum(1) - np.diag(cm)
    valid = union > 0
    if not valid.any():
        return 0.0
    return float((inter[valid] / union[valid]).mean())


def miou(pred: np.ndarray, label: np.ndarray, num_classes: int,
         ignore_index: int = 255) -> float:
    return miou_from_confusion(
        confusion_matrix(pred, label, num_classes, ignore_index))

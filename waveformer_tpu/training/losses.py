"""Segmentation losses (TPU-native jax.numpy).

Equivalents of the reference's loss surface:
  * MONAI `DiceCELoss(to_onehot_y=True, softmax=True)` — the actual training
    loss (`3_train.py:72`, `monai/losses/dice.py:30,639`).
  * nnUNet `SoftDiceLoss` family with optional cross-replica batch dice
    (`light_training/loss/dice.py:9-56`, `compound_losses.py:8-103`): the
    DDP `AllGatherGrad` is replaced by `jax.lax.psum` of the tp/fp/fn
    statistics over the mesh's data axis — gradients flow through psum
    automatically, which is exactly what `loss/ddp_allgather.py:25-48`
    hand-implements for torch.
  * Deep-supervision weighting (`light_training/loss/deepsupervision.py:5-53`).
  * TopK / robust CE (`light_training/loss/robust_ce_loss.py`).

All functions take logits `(B, *spatial, C)` channels-last and integer or
one-hot labels; reductions accumulate in fp32.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp


def _one_hot(labels: jax.Array, num_classes: int) -> jax.Array:
    if labels.shape[-1] == 1:
        labels = labels[..., 0]
    return jax.nn.one_hot(labels.astype(jnp.int32), num_classes, dtype=jnp.float32)


def softmax_cross_entropy(
    logits: jax.Array, labels: jax.Array, weight: Optional[jax.Array] = None
) -> jax.Array:
    """Mean CE over all voxels (torch `nn.CrossEntropyLoss` semantics)."""
    num_classes = logits.shape[-1]
    onehot = _one_hot(labels, num_classes)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ce = -(onehot * logp)
    if weight is not None:
        ce = ce * weight.astype(jnp.float32)
    return jnp.mean(jnp.sum(ce, axis=-1))


def soft_dice_loss(
    logits: jax.Array,
    labels: jax.Array,
    include_background: bool = True,
    squared_pred: bool = False,
    smooth_nr: float = 1e-5,
    smooth_dr: float = 1e-5,
    batch_dice: bool = False,
    axis_name: Optional[str] = None,
    apply_softmax: bool = True,
) -> jax.Array:
    """MONAI `DiceLoss(softmax=True, to_onehot_y=True)` semantics
    (`monai/losses/dice.py:30-200`): per-(sample, class) dice over spatial
    dims, mean-reduced.

    With `batch_dice=True` the tp/|p|/|g| statistics are summed over the
    batch *and* (if `axis_name` is given) psum-ed across the mesh data axis —
    the global batch dice of nnUNet's DDP `SoftDiceLoss`
    (`light_training/loss/dice.py:36-48`).
    """
    num_classes = logits.shape[-1]
    probs = (
        jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        if apply_softmax
        else logits.astype(jnp.float32)
    )
    onehot = _one_hot(labels, num_classes)
    spatial_axes = tuple(range(1, logits.ndim - 1))

    intersection = jnp.sum(probs * onehot, axis=spatial_axes)  # (B, C)
    if squared_pred:
        pred_sum = jnp.sum(probs**2, axis=spatial_axes)
        gt_sum = jnp.sum(onehot**2, axis=spatial_axes)
    else:
        pred_sum = jnp.sum(probs, axis=spatial_axes)
        gt_sum = jnp.sum(onehot, axis=spatial_axes)

    if batch_dice:
        intersection = jnp.sum(intersection, axis=0, keepdims=True)
        pred_sum = jnp.sum(pred_sum, axis=0, keepdims=True)
        gt_sum = jnp.sum(gt_sum, axis=0, keepdims=True)
        if axis_name is not None:
            intersection = jax.lax.psum(intersection, axis_name)
            pred_sum = jax.lax.psum(pred_sum, axis_name)
            gt_sum = jax.lax.psum(gt_sum, axis_name)

    if not include_background:
        intersection = intersection[:, 1:]
        pred_sum = pred_sum[:, 1:]
        gt_sum = gt_sum[:, 1:]

    dice = (2.0 * intersection + smooth_nr) / (pred_sum + gt_sum + smooth_dr)
    return jnp.mean(1.0 - dice)


def dice_ce_loss(
    logits: jax.Array,
    labels: jax.Array,
    lambda_dice: float = 1.0,
    lambda_ce: float = 1.0,
    include_background: bool = True,
    batch_dice: bool = False,
    axis_name: Optional[str] = None,
) -> jax.Array:
    """MONAI `DiceCELoss(to_onehot_y=True, softmax=True)` (`dice.py:639`)."""
    d = soft_dice_loss(
        logits,
        labels,
        include_background=include_background,
        batch_dice=batch_dice,
        axis_name=axis_name,
    )
    c = softmax_cross_entropy(logits, labels)
    return lambda_dice * d + lambda_ce * c


class DiceCELoss:
    """Callable config wrapper mirroring the reference's loss object."""

    def __init__(self, lambda_dice=1.0, lambda_ce=1.0, include_background=True,
                 batch_dice=False, axis_name=None):
        self.kwargs = dict(
            lambda_dice=lambda_dice,
            lambda_ce=lambda_ce,
            include_background=include_background,
            batch_dice=batch_dice,
            axis_name=axis_name,
        )

    def __call__(self, logits, labels):
        return dice_ce_loss(logits, labels, **self.kwargs)


def dice_bce_loss(
    logits: jax.Array,
    region_targets: jax.Array,
    weight_ce: float = 1.0,
    weight_dice: float = 1.0,
    use_ignore_label: bool = False,
    batch_dice: bool = True,
    smooth: float = 1e-5,
    axis_name: Optional[str] = None,
) -> jax.Array:
    """Region-based sigmoid DC+BCE (reference `DC_and_BCE_loss`,
    `light_training/loss/compound_losses.py:60-100` with
    `MemoryEfficientSoftDiceLoss`, `loss/dice.py:58-115`).

    `region_targets` is one-hot over overlapping regions, channels-LAST
    (B, *spatial, C) — the nnUNet region-training formulation (e.g. BraTS
    TC/WT/ET). With `use_ignore_label` the LAST channel marks voxels to
    exclude. The dice term follows the reference exactly: `-mean(dice)`
    (so this loss can be negative), batch_dice sums the statistics over
    batch and — with `axis_name` — psums them across the mesh data axis
    (the reference's `AllGatherGrad` DDP path).
    """
    x = logits.astype(jnp.float32)
    t = region_targets.astype(jnp.float32)
    if use_ignore_label:
        mask = 1.0 - t[..., -1:]
        t = t[..., :-1]
    else:
        mask = None

    # BCE with logits (torch BCEWithLogitsLoss semantics)
    bce = jnp.maximum(x, 0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
    if mask is not None:
        ce = jnp.sum(bce * mask) / jnp.clip(jnp.sum(mask), 1e-8)
    else:
        ce = jnp.mean(bce)

    probs = jax.nn.sigmoid(x)
    spatial = tuple(range(1, x.ndim - 1))
    if mask is not None:
        intersect = jnp.sum(probs * t * mask, axis=spatial)
        sum_pred = jnp.sum(probs * mask, axis=spatial)
        sum_gt = jnp.sum(t * mask, axis=spatial)
    else:
        intersect = jnp.sum(probs * t, axis=spatial)
        sum_pred = jnp.sum(probs, axis=spatial)
        sum_gt = jnp.sum(t, axis=spatial)
    if batch_dice:
        intersect = jnp.sum(intersect, axis=0)
        sum_pred = jnp.sum(sum_pred, axis=0)
        sum_gt = jnp.sum(sum_gt, axis=0)
        if axis_name is not None:
            intersect = jax.lax.psum(intersect, axis_name)
            sum_pred = jax.lax.psum(sum_pred, axis_name)
            sum_gt = jax.lax.psum(sum_gt, axis_name)
    dc = (2.0 * intersect + smooth) / jnp.clip(
        sum_gt + sum_pred + smooth, 1e-8
    )
    return weight_ce * ce - weight_dice * jnp.mean(dc)


def topk_cross_entropy(
    logits: jax.Array, labels: jax.Array, k_percent: float = 10.0
) -> jax.Array:
    """nnUNet `TopKLoss` (`loss/robust_ce_loss.py`): mean over the top-k%
    highest-CE voxels."""
    num_classes = logits.shape[-1]
    onehot = _one_hot(labels, num_classes)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ce = -jnp.sum(onehot * logp, axis=-1).reshape(logits.shape[0], -1)
    k = max(1, int(ce.shape[1] * k_percent / 100.0))
    top, _ = jax.lax.top_k(ce, k)
    return jnp.mean(top)


def dice_topk_loss(logits, labels, k_percent=10.0, **dice_kwargs):
    """nnUNet `DC_and_topk_loss` (`loss/compound_losses.py:103`)."""
    return soft_dice_loss(logits, labels, **dice_kwargs) + topk_cross_entropy(
        logits, labels, k_percent
    )


def deep_supervision_weights(n_outputs: int) -> jnp.ndarray:
    """nnUNet AutoDeepSupervision weights (`loss/deepsupervision.py:40-53`):
    halving per scale, the lowest scale zeroed, normalized to sum 1."""
    w = jnp.asarray([1.0 / (2**i) for i in range(n_outputs)])
    if n_outputs > 1:
        w = w.at[-1].set(0.0)
    return w / jnp.sum(w)


def deep_supervision_loss(
    loss_fn: Callable[[jax.Array, jax.Array], jax.Array],
    outputs: Sequence[jax.Array],
    labels: Sequence[jax.Array],
    weights: Optional[jax.Array] = None,
) -> jax.Array:
    """`DeepSupervisionWrapper` (`loss/deepsupervision.py:5-36`)."""
    if weights is None:
        weights = deep_supervision_weights(len(outputs))
    total = 0.0
    for w, o, l in zip(weights, outputs, labels):
        total = total + w * loss_fn(o, l)
    return total

"""Full-volume predictor: sliding window + TTA + geometry restoration.

Equivalent of the reference `Predictor` (`light_training/prediction.py:29-227`):
  * mirror-TTA sliding-window logits (on device, via `SlidingWindowInferer`);
  * trilinear resample of logits back to the pre-resampling crop shape
    (`predict_raw_probability`, `prediction.py:35-63`);
  * zero-embedding into the original volume via the preprocessing bbox
    (`predict_noncrop_probability`, `prediction.py:66-108`);
  * NIfTI export with spacing + optional largest-connected-component
    postprocess (`save_to_nii` `prediction.py:209-227`,
    `large_connected_domain` `:17-27`).

Geometry metadata rides in the nnUNet-style `properties` dict produced by
`waveformer_tpu.data.preprocessing` (same keys as the reference:
`shape_before_cropping`, `bbox_used_for_cropping`,
`shape_after_cropping_and_before_resampling`, `spacing`).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from waveformer_tpu.inference.sliding_window import SlidingWindowInferer
from waveformer_tpu.ops.resize import resize_trilinear


def largest_connected_component(seg: np.ndarray) -> np.ndarray:
    """Keep only the largest foreground connected component
    (`prediction.py:17-27` capability, scipy-based)."""
    from scipy import ndimage

    labeled, n = ndimage.label(seg > 0)
    if n == 0:
        return seg
    sizes = ndimage.sum(np.ones_like(labeled), labeled, range(1, n + 1))
    keep = 1 + int(np.argmax(sizes))
    return np.where(labeled == keep, seg, 0).astype(seg.dtype)


class Predictor:
    """End-to-end full-volume inference driver."""

    def __init__(
        self,
        inferer: SlidingWindowInferer,
        postprocess_largest_cc: bool = False,
    ):
        self.inferer = inferer
        self.postprocess_largest_cc = postprocess_largest_cc

    # ------------------------------------------------------------------ #
    def predict_logits(
        self,
        volume: np.ndarray,
        predictor_fn: Callable,
        out_channels: int,
    ) -> jax.Array:
        """(D, H, W, C) preprocessed volume → blended TTA logits."""
        return self.inferer(volume, predictor_fn, out_channels)

    # ------------------------------------------------------------------ #
    def resample_logits_to_crop(
        self, logits: jax.Array, properties: Dict
    ) -> np.ndarray:
        """`predict_raw_probability` equivalent: trilinear resize of logits
        to `shape_after_cropping_and_before_resampling`."""
        key = (
            "shape_after_cropping_before_resample"
            if "shape_after_cropping_before_resample" in properties
            else "shape_after_cropping_and_before_resampling"
        )
        target = tuple(int(v) for v in properties[key])
        if tuple(logits.shape[:3]) != target:
            logits = resize_trilinear(
                logits[None], target, align_corners=False
            )[0]
        return np.asarray(logits)

    # ------------------------------------------------------------------ #
    def embed_to_original(
        self, seg_crop: np.ndarray, properties: Dict, fill: int = 0
    ) -> np.ndarray:
        """`predict_noncrop_probability` equivalent: place the cropped
        segmentation back into the original volume via the stored bbox."""
        original = tuple(int(v) for v in properties["shape_before_cropping"])
        bbox = properties["bbox_used_for_cropping"]
        out = np.full(original, fill, dtype=seg_crop.dtype)
        sl = tuple(slice(int(b[0]), int(b[1])) for b in bbox)
        out[sl] = seg_crop
        return out

    # ------------------------------------------------------------------ #
    @staticmethod
    def upload(volume: np.ndarray) -> jax.Array:
        """Host-cast to bf16 and start the H2D transfer (async).

        The model's first layer casts inputs to bf16 anyway, so uploading
        bf16 is numerically identical to uploading fp32 — at half the bytes
        over the (slow) host link. Returns immediately; the transfer overlaps
        any in-flight device work.
        """
        import ml_dtypes

        host = np.asarray(volume)
        if host.dtype == np.float32:
            host = host.astype(ml_dtypes.bfloat16)
        return jax.device_put(host)

    # ------------------------------------------------------------------ #
    def predict_case(
        self,
        volume: np.ndarray,
        predictor_fn: Callable,
        out_channels: int,
        properties: Optional[Dict] = None,
    ) -> np.ndarray:
        """Volume → label map at original geometry (argmax over channels).

        The logit resample AND the argmax run on device so only the uint8
        label map crosses the (slow) host link — ~16× less D2H traffic than
        shipping fp32 logits.
        """
        seg_dev, props = self._start_case(
            volume, predictor_fn, out_channels, properties
        )
        return self._finish_case(seg_dev, props)

    # ------------------------------------------------------------------ #
    def _start_case(self, volume, predictor_fn, out_channels, properties):
        """Enqueue the full device pipeline for one case (no host sync):
        sliding-window TTA logits → resample-to-crop → argmax, all on
        device. Returns the (not yet materialized) uint8 device array."""
        cf = getattr(self.inferer, "layout", "channels_last") == "channels_first"
        if not isinstance(volume, jax.Array):
            volume = self.upload(volume)
        logits = self.predict_logits(volume, predictor_fn, out_channels)
        if cf:  # (out, D, H, W) → resample expects batch-of-volumes
            logits = logits.transpose(1, 2, 3, 0)
        if properties is not None:
            key = (
                "shape_after_cropping_before_resample"
                if "shape_after_cropping_before_resample" in properties
                else "shape_after_cropping_and_before_resampling"
            )
            target = tuple(int(v) for v in properties[key])
            if tuple(logits.shape[:3]) != target:
                logits = resize_trilinear(
                    logits[None], target, align_corners=False
                )[0]
        seg_dev = jnp.argmax(logits, axis=-1).astype(jnp.uint8)
        return seg_dev, properties

    def _finish_case(self, seg_dev, properties) -> np.ndarray:
        """Block on the device result and apply host-side geometry."""
        seg = np.asarray(seg_dev)
        if properties is not None:
            seg = self.embed_to_original(seg, properties)
        if self.postprocess_largest_cc:
            seg = largest_connected_component(seg)
        return seg

    # ------------------------------------------------------------------ #
    def predict_cases(
        self,
        volumes,
        predictor_fn: Callable,
        out_channels: int,
        properties_list=None,
    ):
        """Pipelined multi-case prediction: yields label maps in order.

        While case *i* computes on device, case *i+1*'s H2D upload and
        program dispatch are already in flight — hiding the host-link
        latency behind compute (the reference's per-case loop
        `4_predict.py:199-211` pays it serially).
        """
        pending = None  # (seg_dev, properties)
        it = iter(volumes)
        props_it = iter(properties_list) if properties_list is not None else None
        for vol in it:
            props = next(props_it) if props_it is not None else None
            started = self._start_case(vol, predictor_fn, out_channels, props)
            if pending is not None:
                yield self._finish_case(*pending)
            pending = started
        if pending is not None:
            yield self._finish_case(*pending)

    # ------------------------------------------------------------------ #
    def save_to_nii(
        self,
        seg: np.ndarray,
        path: str,
        spacing: Sequence[float] = (1.0, 1.0, 1.0),
        affine: Optional[np.ndarray] = None,
    ) -> None:
        """NIfTI export with spacing (`prediction.py:209-227` equivalent).

        `seg` is in the pipeline's (D, H, W) = (Z, Y, X) frame; NIfTI stores
        (X, Y, Z), so the array is transposed and the spacing reversed.
        """
        from waveformer_tpu.utils import nifti

        if affine is None:
            affine = np.diag(list(spacing)[::-1] + [1.0]).astype(np.float32)
        nifti.save(
            nifti.NiftiImage(data=seg.astype(np.uint8).T, affine=affine), path
        )

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

import functools
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
        upload_dtype=None,
    ):
        """`upload_dtype`: host-side cast applied before H2D upload. Pass the
        model's compute dtype (e.g. ``jnp.bfloat16``) to halve upload bytes —
        numerically free only when the model casts inputs to that dtype
        anyway. ``None`` (default) uploads volumes at their stored dtype, so
        fp32 pipelines keep fp32 inputs."""
        self.inferer = inferer
        self.postprocess_largest_cc = postprocess_largest_cc
        self.upload_dtype = upload_dtype

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
    def upload(volume: np.ndarray, dtype=None) -> jax.Array:
        """Start the H2D transfer (async), optionally host-casting first.

        When ``dtype`` is bf16 (the model's compute dtype), uploading bf16 is
        numerically identical to uploading fp32 — the model would cast anyway
        — at half the bytes over the (slow) host link. With ``dtype=None`` no
        cast happens, so fp32 inference keeps fp32 input precision. Returns
        immediately; the transfer overlaps any in-flight device work.
        """
        host = np.asarray(volume)
        if dtype is not None and host.dtype != np.dtype(dtype):
            host = host.astype(dtype)
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
            volume = self.upload(volume, self.upload_dtype)
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
    def predict_cases_sharded(
        self,
        volumes,
        predictor_fn: Callable,
        out_channels: int,
        properties_list=None,
        mesh=None,
    ):
        """Case-parallel full-volume inference over the mesh `data` axis.

        The <60 s north-star delivery mechanism (BASELINE.md): each device
        runs the complete TTA sliding-window program on ITS OWN case, so a
        v5e-8 processes 8 cases per dispatch. Equivalent of the reference's
        eval sharding + gather (`light_training/sampler.py:5-48` consumed by
        `trainer.py:302-311`) — redesigned as a `shard_map` over a
        `jax.sharding.Mesh` instead of rank-sliced dataloaders.

        Cases are grouped by padded bucket shape (one compiled executable per
        bucket), stacked to (n_dev, C, *bucket), sharded over `data`, and
        argmax-ed on device — only uint8 label maps cross the host link.
        Cases whose geometry requires a logit resample
        (`shape_after_cropping... != sliding-window shape`) fall back to the
        serial per-case path, which resamples logits before argmax (the
        reference's semantics, `prediction.py:35-63`).

        Yields (index, label_map) in ascending case order.
        """
        import jax.sharding as jsh
        from jax import shard_map

        if mesh is None:
            from waveformer_tpu.parallel.mesh import make_mesh

            mesh = make_mesh()
        n_dev = int(np.prod(list(mesh.shape.values())))
        axis_names = tuple(mesh.axis_names)
        spec = jsh.PartitionSpec(axis_names)  # all axes over dim 0

        vols = list(volumes)
        props = (
            list(properties_list)
            if properties_list is not None
            else [None] * len(vols)
        )
        cf = getattr(self.inferer, "layout", "channels_last") == "channels_first"

        def _needs_resample(vol, p):
            if p is None:
                return False
            key = (
                "shape_after_cropping_before_resample"
                if "shape_after_cropping_before_resample" in p
                else "shape_after_cropping_and_before_resampling"
            )
            if key not in p:
                return False
            spatial = vol.shape[1:] if cf else vol.shape[:3]
            return tuple(int(v) for v in p[key]) != tuple(spatial)

        # partition: device-parallel cases vs serial fallback (resampled)
        groups: Dict[tuple, list] = {}
        serial_idx = []
        for i, (v, p) in enumerate(zip(vols, props)):
            if _needs_resample(v, p):
                serial_idx.append(i)
                continue
            spatial = v.shape[1:] if cf else v.shape[:3]
            bucket = self.inferer.padded_shape(spatial)
            groups.setdefault(bucket, []).append(i)

        results: Dict[int, np.ndarray] = {}

        @functools.lru_cache(maxsize=None)
        def compiled_for(bucket):
            def per_device(stacked):
                # local shard (1, C, *bucket) / (1, *bucket, C)
                from waveformer_tpu.inference.sliding_window import (
                    sliding_window_inference,
                )

                logits = sliding_window_inference(
                    stacked[0],
                    predictor_fn,
                    roi_size=self.inferer.roi_size,
                    out_channels=out_channels,
                    overlap=self.inferer.overlap,
                    sw_batch_size=self.inferer.sw_batch_size,
                    mode=self.inferer.mode,
                    mirror_axes=self.inferer.mirror_axes,
                    tta_mode=self.inferer.tta_mode,
                    layout=self.inferer.layout,
                )
                ch_axis = 0 if cf else -1
                return jnp.argmax(logits, axis=ch_axis).astype(jnp.uint8)[None]

            return jax.jit(
                shard_map(
                    per_device,
                    mesh=mesh,
                    in_specs=(spec,),
                    out_specs=spec,
                    # the stitch accumulator starts as an unvarying zeros
                    # array; per-device results are inherently varying
                    check_vma=False,
                )
            )

        for bucket, idxs in groups.items():
            fn = compiled_for(bucket)
            for r0 in range(0, len(idxs), n_dev):
                round_idx = idxs[r0 : r0 + n_dev]
                batch = []
                for i in round_idx:
                    v = np.asarray(vols[i])
                    if self.upload_dtype is not None:
                        v = v.astype(self.upload_dtype)
                    spatial = v.shape[1:] if cf else v.shape[:3]
                    sp_pads = [(0, b - s) for b, s in zip(bucket, spatial)]
                    pads = (
                        [(0, 0)] + sp_pads if cf else sp_pads + [(0, 0)]
                    )
                    batch.append(np.pad(v, pads))
                while len(batch) < n_dev:  # pad round with a repeat
                    batch.append(batch[-1])
                stacked = np.stack(batch)
                sharding = jsh.NamedSharding(mesh, spec)
                segs = np.asarray(fn(jax.device_put(stacked, sharding)))
                for k, i in enumerate(round_idx):
                    v = vols[i]
                    spatial = v.shape[1:] if cf else v.shape[:3]
                    seg = segs[k][
                        : spatial[0], : spatial[1], : spatial[2]
                    ]
                    if props[i] is not None:
                        seg = self.embed_to_original(seg, props[i])
                    if self.postprocess_largest_cc:
                        seg = largest_connected_component(seg)
                    results[i] = seg

        for i in serial_idx:
            results[i] = self.predict_case(
                np.asarray(vols[i]), predictor_fn, out_channels, props[i]
            )

        for i in sorted(results):
            yield i, results[i]

    # ------------------------------------------------------------------ #
    def save_to_nii(
        self,
        seg: np.ndarray,
        path: str,
        spacing: Sequence[float] = (1.0, 1.0, 1.0),
        affine: Optional[np.ndarray] = None,
        properties: Optional[Dict] = None,
    ) -> None:
        """NIfTI export in the SOURCE geometry (`prediction.py:209-227`).

        `seg` is in the pipeline's (D, H, W) = (Z, Y, X) canonical frame;
        NIfTI stores (X, Y, Z), so the array is transposed. When
        `properties` carries the preprocessing-time orientation record
        (`orientation` + `source_affine`, written by
        `data.preprocessing.load_canonical_nifti`), the segmentation is
        mapped back to the source file's voxel order and written with the
        source affine — voxel-exact overlay on the raw input, matching the
        reference's SimpleITK CopyInformation behavior. Otherwise a diagonal
        affine is fabricated from `spacing` (legacy path for synthetic
        data without geometry)."""
        from waveformer_tpu.utils import nifti

        arr = seg.astype(np.uint8).T  # (D,H,W) → canonical (X,Y,Z)
        if properties is not None and "orientation" in properties:
            arr = nifti.undo_canonical(
                arr, np.asarray(properties["orientation"])
            )
            affine = np.asarray(
                properties["source_affine"], np.float32
            )
        elif affine is None:
            affine = np.diag(list(spacing)[::-1] + [1.0]).astype(np.float32)
        nifti.save(nifti.NiftiImage(data=arr, affine=affine), path)

"""On-device sliding-window inference with Gaussian blending + mirror TTA.

Reimplements the reference's inference core — MONAI
`sliding_window_inference` (`monai/inferers/utils.py:43-405`, stitch loop
`:216-301`), `compute_importance_map` (`monai/data/utils.py:1088-1139`),
`dense_patch_slices` (`monai/data/utils.py:171-213`) and the 8-way mirror
TTA of `Predictor.maybe_mirror_and_predict`
(`light_training/prediction.py:110-160`) — as ONE compiled XLA program:

  * patch grid, Gaussian importance map and the weight count-map are
    precomputed on host (input-independent);
  * the patch loop is a `lax.scan` over chunks of `sw_batch` windows:
    `dynamic_slice` gather → batched model forward → weighted
    `dynamic_update_slice` accumulate;
  * mirror TTA is a static 8-way loop of full-volume flips around the scan
    (bitwise-identical semantics to the reference's volume-level flips);
  * volumes are padded to shape *buckets* (multiples of the scan interval)
    so one executable serves many case shapes — XLA requires static shapes
    and a per-case recompile would dwarf the inference itself.

The divide-by-count happens once at the end in fp32.
"""

from __future__ import annotations

import functools
import itertools
import math
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def compute_importance_map(
    patch_size: Tuple[int, ...],
    mode: str = "gaussian",
    sigma_scale: float = 0.125,
) -> np.ndarray:
    """MONAI-parity importance map (`monai/data/utils.py:1088-1139`)."""
    if mode == "constant":
        return np.ones(patch_size, dtype=np.float32)
    if mode != "gaussian":
        raise ValueError(f"unsupported blend mode {mode!r}")
    maps = []
    for n in patch_size:
        sigma = sigma_scale * n
        x = np.arange(-(n - 1) / 2.0, (n - 1) / 2.0 + 1, dtype=np.float64)
        maps.append(np.exp(-(x**2) / (2 * sigma**2)))
    m = functools.reduce(np.multiply.outer, maps)
    min_non_zero = max(m.min(), 1e-3)
    return np.clip(m, min_non_zero, None).astype(np.float32)


def scan_interval(
    roi_size: Sequence[int], overlap: float
) -> Tuple[int, ...]:
    """MONAI `_get_scan_interval`: int(roi * (1 - overlap)) per dim."""
    return tuple(
        max(int(r * (1.0 - overlap)), 1) if r > 1 else 1 for r in roi_size
    )


def dense_patch_starts(
    image_size: Sequence[int], roi_size: Sequence[int], overlap: float
) -> np.ndarray:
    """(N, 3) int32 patch start corners (MONAI `dense_patch_slices`
    semantics, `monai/data/utils.py:171-213`): stride = interval, last patch
    shifted flush with the volume end."""
    interval = scan_interval(roi_size, overlap)
    per_dim = []
    for L, r, s in zip(image_size, roi_size, interval):
        if L <= r:
            per_dim.append([0])
            continue
        n = next(
            d for d in range(int(math.ceil(L / s)) + 1) if d * s + r >= L
        ) + 1
        starts = []
        for i in range(n):
            st = i * s
            st -= max(st + r - L, 0)
            starts.append(st)
        per_dim.append(starts)
    grid = np.meshgrid(*per_dim, indexing="ij")
    return np.stack([g.reshape(-1) for g in grid], axis=-1).astype(np.int32)


def bucket_shape(
    image_size: Sequence[int], roi_size: Sequence[int], overlap: float
) -> Tuple[int, ...]:
    """Round spatial dims up so one compiled program covers many cases:
    at least `roi`, then to a multiple of the scan interval."""
    interval = scan_interval(roi_size, overlap)
    out = []
    for L, r, s in zip(image_size, roi_size, interval):
        L = max(L, r)
        out.append(r + int(math.ceil((L - r) / s)) * s)
    return tuple(out)


def count_map(
    image_size: Sequence[int], roi_size: Sequence[int], overlap: float,
    mode: str = "gaussian",
) -> np.ndarray:
    """Host-precomputed Σ importance weights per voxel (input-independent)."""
    imp = compute_importance_map(tuple(roi_size), mode)
    starts = dense_patch_starts(image_size, roi_size, overlap)
    cm = np.zeros(tuple(image_size), dtype=np.float32)
    for s in starts:
        sl = tuple(slice(int(a), int(a) + r) for a, r in zip(s, roi_size))
        cm[sl] += imp
    return cm


def _flip_axes_combinations(mirror_axes: Sequence[int]):
    """All subsets of mirror axes incl. empty — the reference's 8 TTA passes
    (`light_training/prediction.py:127-158`)."""
    combos = [()]
    for r in range(1, len(mirror_axes) + 1):
        combos.extend(itertools.combinations(mirror_axes, r))
    return combos


def sliding_window_inference(
    volume: jax.Array,
    predictor: Callable[[jax.Array], jax.Array],
    roi_size: Tuple[int, int, int],
    out_channels: int,
    overlap: float = 0.5,
    sw_batch_size: int = 2,
    mode: str = "gaussian",
    mirror_axes: Optional[Sequence[int]] = None,
    tta_mode: str = "volume",
    layout: str = "channels_last",
) -> jax.Array:
    """Blend `predictor` outputs over dense patches of one volume.

    volume: (D, H, W, C) channels-last, spatial dims already bucket-padded.
    predictor: (B, *roi, C) → (B, *roi, out_channels) logits.
    Returns (D, H, W, out_channels) fp32 logits (TTA-averaged if mirrored).

    With `layout="channels_first"` all of the above are channels-FIRST:
    volume (C, D, H, W), predictor (B, C, *roi) → (B, out, *roi), result
    (out_channels, D, H, W). This is the TPU-preferred mode: preprocessed
    data is stored (C, D, H, W) anyway, and the channels-first Waveformer
    (`io_layout="channels_first"`) measures ~8% faster — no host transpose,
    no small-C-minor tensors at either model boundary.
    """
    if layout == "channels_first":
        return _sliding_window_cf(
            volume, predictor, roi_size, out_channels, overlap,
            sw_batch_size, mode, mirror_axes, tta_mode,
        )
    spatial = volume.shape[:3]
    starts_np = dense_patch_starts(spatial, roi_size, overlap)
    n_patches = len(starts_np)
    pad_to = int(math.ceil(n_patches / sw_batch_size)) * sw_batch_size
    # repeat the final patch to fill the last chunk: its duplicate
    # contribution is cancelled by using precomputed count of actual patches
    # — but to keep weights exact we instead mask duplicates to zero weight.
    dup_mask = np.ones((pad_to,), np.float32)
    if pad_to > n_patches:
        starts_np = np.concatenate(
            [starts_np, np.repeat(starts_np[-1:], pad_to - n_patches, 0)], 0
        )
        dup_mask[n_patches:] = 0.0
    starts = jnp.asarray(starts_np)
    mask = jnp.asarray(dup_mask)

    imp = jnp.asarray(compute_importance_map(tuple(roi_size), mode))
    cm = jnp.asarray(count_map(spatial, roi_size, overlap, mode))

    n_chunks = pad_to // sw_batch_size

    def run_one_orientation(vol: jax.Array, pred_fn=None) -> jax.Array:
        pred_fn = pred_fn or predictor
        acc = jnp.zeros((*spatial, out_channels), jnp.float32)

        # Patch starts are host-known constants. When the whole grid fits in
        # one chunk (the bucketed common case), unroll with STATIC start
        # indices: XLA turns the gathers into slices fused into the model's
        # first op and the scatter updates into in-place region writes —
        # measured 158 → ~15 ms of stitch overhead per orientation at 192³.
        if n_chunks == 1:
            patches = jnp.stack(
                [
                    jax.lax.slice(
                        vol,
                        (*starts_np[i], 0),
                        (
                            starts_np[i][0] + roi_size[0],
                            starts_np[i][1] + roi_size[1],
                            starts_np[i][2] + roi_size[2],
                            vol.shape[-1],
                        ),
                    )
                    for i in range(n_patches)
                ],
                axis=0,
            )
            logits = pred_fn(patches).astype(jnp.float32)
            logits = logits * imp[None, ..., None]
            for i in range(n_patches):  # duplicates skipped outright
                s = tuple(int(v) for v in starts_np[i])
                cur = jax.lax.dynamic_slice(
                    acc, (*s, 0), (*roi_size, out_channels)
                )
                acc = jax.lax.dynamic_update_slice(
                    acc, cur + logits[i], (*s, 0)
                )
            return acc

        def chunk_body(acc, chunk_idx):
            idx0 = chunk_idx * sw_batch_size

            def gather(i):
                s = starts[idx0 + i]
                return jax.lax.dynamic_slice(
                    vol,
                    (s[0], s[1], s[2], 0),
                    (*roi_size, vol.shape[-1]),
                )

            patches = jnp.stack(
                [gather(i) for i in range(sw_batch_size)], axis=0
            )
            logits = pred_fn(patches).astype(jnp.float32)
            logits = logits * imp[None, ..., None]

            def scatter(acc, i):
                s = starts[idx0 + i]
                cur = jax.lax.dynamic_slice(
                    acc, (s[0], s[1], s[2], 0), (*roi_size, out_channels)
                )
                upd = cur + logits[i] * mask[idx0 + i]
                return jax.lax.dynamic_update_slice(
                    acc, upd, (s[0], s[1], s[2], 0)
                )

            for i in range(sw_batch_size):
                acc = scatter(acc, i)
            return acc, None

        acc, _ = jax.lax.scan(
            chunk_body, acc, jnp.arange(n_chunks)
        )
        return acc

    if not mirror_axes:
        return run_one_orientation(volume) / cm[..., None]

    # Patch-level TTA (opt-in, tta_mode="patch"). When the grid is mirror-symmetric
    # (true for every bucketed shape: starts are uniformly spaced and the
    # Gaussian map is even), volume-level TTA is algebraically identical to
    # averaging the 8 flipped predictions PER PATCH:
    #   (1/8) Σ_o flip_o(SW(flip_o(v))) == SW with predictor
    #   p ↦ mean_o flip_o(model(flip_o(p))).
    # This trades the 8× full-volume gather/unflip traffic of the
    # orientation loop for per-chunk 8× patch stacking. Measured on v5e the
    # volume path is currently faster (15.6 vs 18.6 s/case at 192³), so
    # "volume" is the default; "patch" is kept for configurations with many
    # patches per volume where the volume traffic dominates.
    def _grid_symmetric() -> bool:
        for dim, (L, r) in enumerate(zip(spatial, roi_size)):
            ax_starts = np.unique(starts_np[:n_patches, dim])
            mirrored = np.sort(L - r - ax_starts)
            if not np.array_equal(np.sort(ax_starts), mirrored):
                return False
        return True

    combos_all = _flip_axes_combinations(tuple(mirror_axes))
    if tta_mode == "patch" and _grid_symmetric():
        # flips act on patch spatial axes 1..3 (batch axis 0). Orientations
        # run as a lax.scan so the model body compiles once and activation
        # memory stays at sw_batch scale (a single 8× batch OOMs HBM).
        def tta_predictor(patches: jax.Array) -> jax.Array:
            stacked = jnp.stack(
                [
                    jnp.flip(patches, axis=tuple(a + 1 for a in axes))
                    if axes
                    else patches
                    for axes in combos_all
                ],
                axis=0,
            )  # (n_orient, sw, *roi, C)

            def body(_, p):
                return None, predictor(p).astype(jnp.float32)

            _, preds = jax.lax.scan(body, None, stacked)
            total = jnp.zeros_like(preds[0])
            for oi, axes in enumerate(combos_all):
                part = preds[oi]
                if axes:
                    part = jnp.flip(part, axis=tuple(a + 1 for a in axes))
                total = total + part
            return total / len(combos_all)

        return run_one_orientation(volume, tta_predictor) / cm[..., None]

    # Mirror TTA. Each orientation is a full sliding-window pass on the
    # flipped volume, blended (divided by its count map) in the flipped
    # frame, un-flipped, then averaged — exactly the reference's
    # `maybe_mirror_and_predict` around a complete inferer call
    # (`light_training/prediction.py:110-160`).
    #
    # Compile-time design: a Python loop over the 8 orientations would inline
    # 8 copies of the patch loop (observed ~10 min XLA compile). Instead the
    # orientations are a `lax.scan` axis, so the model body is compiled ONCE.
    # Flips inside the scan are per-axis `lax.cond`s whose branches are
    # static `lax.rev`s — a runtime-selected branch of two memory-speed ops.
    # (The previous formulation — gathers with per-orientation index
    # vectors — defeated XLA's reversed-iota recognition because the index
    # vector was only known at runtime, costing 3-4 s/case in real gathers.)
    combos = _flip_axes_combinations(tuple(mirror_axes))
    flip_bits = np.zeros((len(combos), 3), np.bool_)
    for i, axes in enumerate(combos):
        for a in axes:
            flip_bits[i, a] = True
    flip_bits = jnp.asarray(flip_bits)

    def maybe_flip(v: jax.Array, bits: jax.Array) -> jax.Array:
        for ax in range(3):
            v = jax.lax.cond(
                bits[ax],
                functools.partial(jnp.flip, axis=ax),
                lambda t: t,
                v,
            )
        return v

    def orientation_body(carry, o):
        bits = flip_bits[o]
        v = maybe_flip(volume, bits)
        pred = run_one_orientation(v) / cm[..., None]
        pred = maybe_flip(pred, bits)  # un-flip (involution)
        return carry + pred, None

    total, _ = jax.lax.scan(
        orientation_body,
        jnp.zeros((*spatial, out_channels), jnp.float32),
        jnp.arange(len(combos)),
    )
    return total / len(combos)


def _sliding_window_cf(
    volume: jax.Array,
    predictor: Callable,
    roi_size: Tuple[int, int, int],
    out_channels: int,
    overlap: float,
    sw_batch_size: int,
    mode: str,
    mirror_axes: Optional[Sequence[int]],
    tta_mode: str = "volume",
) -> jax.Array:
    """Channels-first stitch: volume (C, D, H, W) → (out, D, H, W)."""
    c = volume.shape[0]
    spatial = volume.shape[1:]
    starts_all = dense_patch_starts(spatial, roi_size, overlap)
    n_patches = len(starts_all)
    imp = jnp.asarray(compute_importance_map(tuple(roi_size), mode))
    cm = jnp.asarray(count_map(spatial, roi_size, overlap, mode))

    # Mirror the channels-last structure: static unroll ONLY when the whole
    # grid fits one chunk (the bucketed flagship case — XLA fuses the static
    # slices into the model); otherwise a lax.scan over fixed-size chunks
    # (duplicate-padded, zero-masked) so the model body compiles once instead
    # of once per chunk (inlining copies was measured at ~10 min compile).
    pad_to = int(math.ceil(n_patches / sw_batch_size)) * sw_batch_size
    dup_mask = np.ones((pad_to,), np.float32)
    starts_np = starts_all
    if pad_to > n_patches:
        starts_np = np.concatenate(
            [starts_all, np.repeat(starts_all[-1:], pad_to - n_patches, 0)], 0
        )
        dup_mask[n_patches:] = 0.0
    starts = jnp.asarray(starts_np)
    mask = jnp.asarray(dup_mask)
    n_chunks = pad_to // sw_batch_size

    def run_one_orientation(vol: jax.Array, pred_fn=None) -> jax.Array:
        pred_fn = pred_fn or predictor
        acc = jnp.zeros((out_channels, *spatial), jnp.float32)
        if n_chunks == 1:
            sts = [tuple(int(v) for v in s) for s in starts_all]
            patches = jnp.stack(
                [
                    jax.lax.slice(
                        vol,
                        (0, *s),
                        (c, s[0] + roi_size[0], s[1] + roi_size[1],
                         s[2] + roi_size[2]),
                    )
                    for s in sts
                ],
                axis=0,
            )  # (b, C, *roi)
            logits = pred_fn(patches).astype(jnp.float32)
            logits = logits * imp[None, None]
            for i, s in enumerate(sts):
                pos = (0, *s)
                cur = jax.lax.dynamic_slice(
                    acc, pos, (out_channels, *roi_size)
                )
                acc = jax.lax.dynamic_update_slice(acc, cur + logits[i], pos)
            return acc

        def chunk_body(acc, chunk_idx):
            idx0 = chunk_idx * sw_batch_size

            def gather(i):
                s = starts[idx0 + i]
                return jax.lax.dynamic_slice(
                    vol, (0, s[0], s[1], s[2]), (c, *roi_size)
                )

            patches = jnp.stack(
                [gather(i) for i in range(sw_batch_size)], axis=0
            )
            logits = pred_fn(patches).astype(jnp.float32)
            logits = logits * imp[None, None]
            for i in range(sw_batch_size):
                s = starts[idx0 + i]
                pos = (0, s[0], s[1], s[2])
                cur = jax.lax.dynamic_slice(
                    acc, pos, (out_channels, *roi_size)
                )
                acc = jax.lax.dynamic_update_slice(
                    acc, cur + logits[i] * mask[idx0 + i], pos
                )
            return acc, None

        acc, _ = jax.lax.scan(chunk_body, acc, jnp.arange(n_chunks))
        return acc

    if not mirror_axes:
        return run_one_orientation(volume) / cm[None]

    # Patch-level TTA (tta_mode="patch"): when the patch grid is mirror-
    # symmetric, volume-level TTA equals averaging the 8 flipped predictions
    # per patch (see the channels-last branch for the algebra). The volume
    # is sliced and stitched ONCE instead of once per orientation — flips
    # act on 128³ patches inside the predictor, and the fp32 accumulator /
    # count-map divide run a single time.
    def _grid_symmetric() -> bool:
        for dim, (L, r) in enumerate(zip(spatial, roi_size)):
            ax_starts = np.unique(starts_all[:, dim])
            mirrored = np.sort(L - r - ax_starts)
            if not np.array_equal(np.sort(ax_starts), mirrored):
                return False
        return True

    combos_all = _flip_axes_combinations(tuple(mirror_axes))
    if tta_mode == "patch" and _grid_symmetric():
        def tta_predictor(patches: jax.Array) -> jax.Array:
            # patches (B, C, *roi): flips act on spatial axes 2..4
            stacked = jnp.stack(
                [
                    jnp.flip(patches, axis=tuple(a + 2 for a in axes))
                    if axes
                    else patches
                    for axes in combos_all
                ],
                axis=0,
            )  # (n_orient, sw, C, *roi)

            def body(_, p):
                return None, predictor(p).astype(jnp.float32)

            _, preds = jax.lax.scan(body, None, stacked)
            total = jnp.zeros_like(preds[0])
            for oi, axes in enumerate(combos_all):
                part = preds[oi]
                if axes:
                    part = jnp.flip(part, axis=tuple(a + 2 for a in axes))
                total = total + part
            return total / len(combos_all)

        return run_one_orientation(volume, tta_predictor) / cm[None]

    combos = _flip_axes_combinations(tuple(mirror_axes))
    flip_bits = np.zeros((len(combos), 3), np.bool_)
    for i, axes in enumerate(combos):
        for a in axes:
            flip_bits[i, a] = True
    flip_bits = jnp.asarray(flip_bits)

    def maybe_flip(v: jax.Array, bits: jax.Array) -> jax.Array:
        for ax in range(3):
            v = jax.lax.cond(
                bits[ax],
                functools.partial(jnp.flip, axis=ax + 1),
                lambda t: t,
                v,
            )
        return v

    def orientation_body(carry, o):
        bits = flip_bits[o]
        v = maybe_flip(volume, bits)
        pred = run_one_orientation(v) / cm[None]
        pred = maybe_flip(pred, bits)
        return carry + pred, None

    total, _ = jax.lax.scan(
        orientation_body,
        jnp.zeros((out_channels, *spatial), jnp.float32),
        jnp.arange(len(combos)),
    )
    return total / len(combos)


class SlidingWindowInferer:
    """Configured wrapper (MONAI `SlidingWindowInferer`,
    `monai/inferers/inferer.py:382-537`) with jit caching per padded shape.

    Usage:
        inferer = SlidingWindowInferer(roi_size=(128,)*3, sw_batch_size=2,
                                       overlap=0.5, mirror_axes=(0, 1, 2))
        logits = inferer(volume_dhwc, predictor, out_channels=4)
    """

    def __init__(
        self,
        roi_size: Tuple[int, int, int],
        sw_batch_size: int = 2,
        overlap: float = 0.5,
        mode: str = "gaussian",
        mirror_axes: Optional[Sequence[int]] = None,
        tta_mode: str = "volume",
        layout: str = "channels_last",
    ):
        self.roi_size = tuple(roi_size)
        self.sw_batch_size = sw_batch_size
        self.overlap = overlap
        self.mode = mode
        self.mirror_axes = tuple(mirror_axes) if mirror_axes else None
        self.tta_mode = tta_mode
        self.layout = layout
        self._compiled = {}

    def padded_shape(self, spatial: Sequence[int]) -> Tuple[int, ...]:
        return bucket_shape(spatial, self.roi_size, self.overlap)

    def __call__(
        self,
        volume: jax.Array | np.ndarray,
        predictor: Callable,
        out_channels: int,
        predictor_args: tuple = (),
    ) -> jax.Array:
        """volume: (D, H, W, C) — or (C, D, H, W) for layout="channels_first".
        Returns logits at the ORIGINAL shape (same layout convention).

        `predictor` must be a STABLE callable (define it once and reuse):
        the compiled executable is cached per (padded shape, out_channels,
        predictor identity) — a fresh lambda per call forces a recompile
        AND grows the cache (entries hold a strong reference to their
        predictor, so a recycled `id()` can never alias a dead callable to
        a stale executable).

        `predictor_args`: extra pytree arguments threaded through the jit
        boundary and passed as `predictor(patches, *predictor_args)`.
        Anything that CHANGES between calls (e.g. training-time parameters)
        must ride here — a closure would bake its value into the compiled
        program as a constant at trace time.
        """
        cf = self.layout == "channels_first"
        spatial = tuple(volume.shape[1:] if cf else volume.shape[:3])
        padded = self.padded_shape(spatial)
        sp_pads = [(0, p - s) for p, s in zip(padded, spatial)]
        pads = [(0, 0)] + sp_pads if cf else sp_pads + [(0, 0)]
        vol = jnp.asarray(volume)
        if any(p != (0, 0) for p in pads):
            vol = jnp.pad(vol, pads)

        key = (padded, out_channels, id(predictor))
        if key not in self._compiled:

            def run(v, args):
                return sliding_window_inference(
                    v,
                    predictor=lambda p: predictor(p, *args),
                    roi_size=self.roi_size,
                    out_channels=out_channels,
                    overlap=self.overlap,
                    sw_batch_size=self.sw_batch_size,
                    mode=self.mode,
                    mirror_axes=self.mirror_axes,
                    tta_mode=self.tta_mode,
                    layout=self.layout,
                )

            # strong ref to `predictor` keeps its id unique for the cache's
            # lifetime (a GC'd-and-reallocated callable cannot collide)
            self._compiled[key] = (predictor, jax.jit(run))
        logits = self._compiled[key][1](vol, predictor_args)
        if cf:
            return logits[:, : spatial[0], : spatial[1], : spatial[2]]
        return logits[: spatial[0], : spatial[1], : spatial[2], :]

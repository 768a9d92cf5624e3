"""Generate medpy-convention golden values for dice/HD95/ASD (VERDICT r4 #8).

medpy is not installable in this environment, so this generator carries a
line-faithful standalone transcription of medpy's surface-distance protocol
(`medpy/metric/binary.py`), independent of `waveformer_tpu.metrics`:

    __surface_distances(result, reference, voxelspacing, connectivity):
        footprint = generate_binary_structure(result.ndim, connectivity)
        result_border   = result  ^ binary_erosion(result,  footprint, iterations=1)
        reference_border= reference^ binary_erosion(reference,footprint, iterations=1)
        dt  = distance_transform_edt(~reference_border, sampling=voxelspacing)
        sds = dt[result_border]
    dc   = 2|A∩B| / (|A|+|B|)
    hd95 = max(P95(d(A→B)), P95(d(B→A)))
    asd  = mean(d(A→B))
    assd = mean((asd(A,B), asd(B,A)))

The output fixture (`tests/fixtures/metric_goldens.json`) is the audit
anchor for `waveformer_tpu/metrics/segmentation.py`: the library must
reproduce these values bit-for-bit (to fp round-off). The case set covers
translated cubes, spheres with anisotropic spacing, touching/overlapping
blobs, and thin plates — shapes where erosion/EDT conventions actually
differ between implementations.

Protocol anchor: reference `5_compute_metrics.py:15-21` (medpy dc/hd95).
"""

from __future__ import annotations

import json
import os

import numpy as np
from scipy.ndimage import (
    binary_erosion,
    distance_transform_edt,
    generate_binary_structure,
)


# ---- medpy transcription (kept free of waveformer_tpu imports) ---------- #

def _surface_distances(result, reference, voxelspacing=None, connectivity=1):
    result = np.atleast_1d(result.astype(bool))
    reference = np.atleast_1d(reference.astype(bool))
    footprint = generate_binary_structure(result.ndim, connectivity)
    if 0 == np.count_nonzero(result):
        raise RuntimeError("result is empty")
    if 0 == np.count_nonzero(reference):
        raise RuntimeError("reference is empty")
    result_border = result ^ binary_erosion(
        result, structure=footprint, iterations=1
    )
    reference_border = reference ^ binary_erosion(
        reference, structure=footprint, iterations=1
    )
    dt = distance_transform_edt(~reference_border, sampling=voxelspacing)
    return dt[result_border]


def medpy_dc(result, reference):
    result = np.atleast_1d(result.astype(bool))
    reference = np.atleast_1d(reference.astype(bool))
    intersection = np.count_nonzero(result & reference)
    size_i1 = np.count_nonzero(result)
    size_i2 = np.count_nonzero(reference)
    try:
        return 2.0 * intersection / float(size_i1 + size_i2)
    except ZeroDivisionError:
        return 0.0


def medpy_hd95(result, reference, voxelspacing=None, connectivity=1):
    hd1 = _surface_distances(result, reference, voxelspacing, connectivity)
    hd2 = _surface_distances(reference, result, voxelspacing, connectivity)
    return float(np.percentile(np.hstack((hd1, hd2)), 95))


def medpy_hd(result, reference, voxelspacing=None, connectivity=1):
    hd1 = _surface_distances(result, reference, voxelspacing, connectivity).max()
    hd2 = _surface_distances(reference, result, voxelspacing, connectivity).max()
    return float(max(hd1, hd2))


def medpy_asd(result, reference, voxelspacing=None, connectivity=1):
    return float(
        _surface_distances(result, reference, voxelspacing, connectivity).mean()
    )


def medpy_assd(result, reference, voxelspacing=None, connectivity=1):
    return float(
        np.mean(
            (
                medpy_asd(result, reference, voxelspacing, connectivity),
                medpy_asd(reference, result, voxelspacing, connectivity),
            )
        )
    )


# ---- case set ----------------------------------------------------------- #

def _cube(shape, lo, hi):
    m = np.zeros(shape, bool)
    m[lo[0]:hi[0], lo[1]:hi[1], lo[2]:hi[2]] = True
    return m


def _sphere(shape, center, radius):
    zz, yy, xx = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
    return (
        (zz - center[0]) ** 2 + (yy - center[1]) ** 2 + (xx - center[2]) ** 2
    ) <= radius**2


def cases():
    s = (24, 24, 24)
    yield "translated_cubes", _cube(s, (4, 4, 4), (14, 14, 14)), \
        _cube(s, (7, 5, 4), (17, 15, 14)), None
    yield "nested_cubes", _cube(s, (4, 4, 4), (18, 18, 18)), \
        _cube(s, (7, 7, 7), (15, 15, 15)), None
    yield "spheres_anisotropic", _sphere(s, (11, 12, 12), 7), \
        _sphere(s, (13, 12, 11), 6), (1.0, 0.5, 2.0)
    yield "thin_plates", _cube(s, (10, 2, 2), (12, 22, 22)), \
        _cube(s, (14, 2, 2), (15, 22, 22)), (2.5, 1.0, 1.0)
    yield "touching_blobs", _sphere(s, (8, 8, 8), 5) | _cube(
        s, (14, 14, 14), (20, 20, 20)
    ), _sphere(s, (9, 8, 8), 5), None
    rng = np.random.default_rng(42)
    noisy = rng.random(s) > 0.65
    yield "random_noise_vs_sphere", noisy, _sphere(s, (12, 12, 12), 8), \
        (1.2, 1.2, 1.2)


def main():
    out = {}
    for name, pred, gt, spacing in cases():
        out[name] = {
            "spacing": spacing,
            "dice": medpy_dc(pred, gt),
            "hd": medpy_hd(pred, gt, spacing),
            "hd95": medpy_hd95(pred, gt, spacing),
            "asd": medpy_asd(pred, gt, spacing),
            "assd": medpy_assd(pred, gt, spacing),
        }
    path = os.path.join(
        os.path.dirname(__file__), "..", "tests", "fixtures",
        "metric_goldens.json",
    )
    with open(os.path.abspath(path), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()

"""Generate golden wavelet fixtures for tests/fixtures/wavelet_*.npz.

Authoritative path: if `pywt` is installed (it is NOT in the dev image),
coefficients come from `pywt.wavedec3(..., mode="zero")` — the exact
function the reference calls through ptwt (`network_models/
wave_helper.py:343-353`). Fallback: an independent torch-conv oracle
implementing the same pywt 'zero'-mode Haar convention (analysis filters
[1,1]/√2 and [1,-1]/√2 applied to (x[2i], x[2i+1]), odd extents padded
with one trailing zero per level) — the convention pinned against the
reference in round 1 (`tests/test_wavelet.py::TestTorchParity`).

Run:  python tools/gen_wavelet_fixtures.py [outdir]
"""

from __future__ import annotations

import os
import sys

import numpy as np

SHAPES = [
    ((6, 6, 6), 1, 1),     # even, single level
    ((7, 9, 5), 2, 1),     # odd extents: zero-pad semantics
    ((8, 12, 10), 2, 2),   # multi-level
]
KEYS = ("aad", "ada", "add", "daa", "dad", "dda", "ddd")


def _wavedec3_pywt(x, level):
    import pywt

    return pywt.wavedec3(x, "db1", mode="zero", level=level)


def _wavedec3_torch(x, level):
    """Torch-conv oracle (Haar, pywt 'zero' mode)."""
    import torch
    import torch.nn.functional as F

    lo = np.array([1, 1], np.float32) / np.sqrt(2)
    hi = np.array([1, -1], np.float32) / np.sqrt(2)
    filters = {}
    for key in ("aaa",) + KEYS:
        fd = lo if key[0] == "a" else hi
        fh = lo if key[1] == "a" else hi
        fw = lo if key[2] == "a" else hi
        filters[key] = torch.from_numpy(
            np.einsum("i,j,k->ijk", fd, fh, fw).astype(np.float32)
        ).reshape(1, 1, 2, 2, 2)

    cur = torch.from_numpy(x).unsqueeze(0).unsqueeze(0)
    details = []
    for _ in range(level):
        pads = []
        for dim in (4, 3, 2):  # F.pad order: last dim first
            pads += [0, cur.shape[dim] % 2]
        cur = F.pad(cur, pads)
        level_details = {
            k: F.conv3d(cur, filters[k], stride=2)[0, 0].numpy()
            for k in KEYS
        }
        details.append(level_details)
        cur = F.conv3d(cur, filters["aaa"], stride=2)
    out = [cur[0, 0].numpy()] + list(reversed(details))
    return out


def main(outdir: str) -> None:
    try:
        import pywt  # noqa: F401

        decompose, source = _wavedec3_pywt, "pywt"
    except ImportError:
        decompose, source = _wavedec3_torch, "torch-conv oracle"
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(42)
    for shape, level, channels in SHAPES:
        name = f"wavelet_db1_{'x'.join(map(str, shape))}_l{level}.npz"
        arrays = {"level": np.int32(level), "source": np.bytes_(source)}
        x = rng.standard_normal((channels, *shape)).astype(np.float32)
        arrays["x"] = x
        for c in range(channels):
            coeffs = decompose(x[c], level)
            arrays[f"c{c}_lf"] = coeffs[0]
            for li, det in enumerate(coeffs[1:]):
                for k in KEYS:
                    arrays[f"c{c}_l{li}_{k}"] = det[k]
        np.savez_compressed(os.path.join(outdir, name), **arrays)
        print("wrote", name, "from", source)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "tests/fixtures")

"""3D discrete wavelet transform ops (TPU-native).

Functional equivalents of the reference's `ptwt.wavedec3` / `ptwt.waverec3`
usage (`network_models/wave_helper.py:343-353`,
`network_models/idwt_upsample.py:159-160`): Haar (`db1`) filters with
`mode='zero'` boundary handling and the pywt `dwtn` subband-key convention
(key character *i* selects approximation `a` / detail `d` along spatial axis
*i*, ordered (D, H, W)).

Design notes (TPU-first):
  * Layout is channels-last `(B, D, H, W, C)` — the native XLA conv/elementwise
    layout on TPU — rather than the reference's NCDHW.
  * The Haar path is expressed as strided slices + adds, which XLA fuses into
    a single VPU pass; no gather/scatter and no HBM round-trips between the
    three axis transforms.
  * All shapes are static; odd extents are zero-padded exactly as pywt's
    `mode='zero'` does (output length `(N+1)//2` per level for Haar).

Only orthonormal Haar (`db1`) is built in — the only wavelet the reference
model family uses. Additional FIR wavelets can be registered via
`register_wavelet(name, dec_lo, dec_hi, rec_lo, rec_hi)` and run through the
generic separable convolution path.
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# pywt dwtn key order for 3D transforms; char i ↔ spatial axis i of (D, H, W).
DETAIL_KEYS: Tuple[str, ...] = ("aad", "ada", "add", "daa", "dad", "dda", "ddd")

_INV_SQRT2 = 1.0 / math.sqrt(2.0)

_WAVELETS: Dict[str, Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]] = {}


def register_wavelet(name: str, dec_lo, dec_hi, rec_lo, rec_hi) -> None:
    """Register an FIR wavelet filter bank (pywt coefficient convention)."""
    _WAVELETS[name] = tuple(
        np.asarray(f, dtype=np.float64) for f in (dec_lo, dec_hi, rec_lo, rec_hi)
    )


register_wavelet(
    "db1",
    dec_lo=[_INV_SQRT2, _INV_SQRT2],
    dec_hi=[-_INV_SQRT2, _INV_SQRT2],
    rec_lo=[_INV_SQRT2, _INV_SQRT2],
    rec_hi=[_INV_SQRT2, -_INV_SQRT2],
)
_WAVELETS["haar"] = _WAVELETS["db1"]


def _haar_split(x: jax.Array, axis: int) -> Tuple[jax.Array, jax.Array]:
    """One-level 1D Haar analysis along `axis` with zero-padding semantics.

    a[k] = (x[2k] + x[2k+1]) / sqrt(2);  d[k] = (x[2k] - x[2k+1]) / sqrt(2)
    (matches pywt db1 `mode='zero'`; for odd N, x[N] is an implicit zero).
    """
    n = x.shape[axis]
    if n % 2 == 1:
        pad = [(0, 0)] * x.ndim
        pad[axis] = (0, 1)
        x = jnp.pad(x, pad)
    idx_even = [slice(None)] * x.ndim
    idx_odd = [slice(None)] * x.ndim
    idx_even[axis] = slice(0, None, 2)
    idx_odd[axis] = slice(1, None, 2)
    x0 = x[tuple(idx_even)]
    x1 = x[tuple(idx_odd)]
    scale = jnp.asarray(_INV_SQRT2, dtype=x.dtype)
    return (x0 + x1) * scale, (x0 - x1) * scale


def _haar_merge(a: jax.Array, d: jax.Array, axis: int) -> jax.Array:
    """One-level 1D Haar synthesis along `axis` (inverse of `_haar_split`)."""
    scale = jnp.asarray(_INV_SQRT2, dtype=a.dtype)
    x0 = (a + d) * scale
    x1 = (a - d) * scale
    stacked = jnp.stack([x0, x1], axis=axis + 1)
    new_shape = list(a.shape)
    new_shape[axis] = a.shape[axis] * 2
    return stacked.reshape(new_shape)


def _dwt3_haar_phases(
    x: jax.Array,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Haar analysis of `(B, D, H, W, C)` via ONE phase transpose + butterfly.

    The cascade of stride-2 slices (`_haar_split` per axis) costs eight
    sublane-strided relayouts on TPU (measured 1.14 ms/patch @64³×48 bf16).
    Extracting all eight 2×2×2 phases with a single reshape-transpose and
    combining them with 12 add/sub butterflies is the same arithmetic in one
    relayout pass: 0.66 ms/patch. Values match the cascade to fp rounding
    (associativity order differs per axis)."""
    b, d, h, w, c = x.shape
    pads = [(0, 0), (0, d % 2), (0, h % 2), (0, w % 2), (0, 0)]
    if any(p != (0, 0) for p in pads):
        x = jnp.pad(x, pads)
        b, d, h, w, c = x.shape
    s = jnp.asarray(_INV_SQRT2, x.dtype)
    xr = x.reshape(b, d // 2, 2, h // 2, 2, w // 2, 2, c)
    xr = xr.transpose(0, 1, 3, 5, 2, 4, 6, 7)  # (b, d2, h2, w2, pd, ph, pw, c)
    aw = (xr[..., 0, :] + xr[..., 1, :]) * s  # (b, d2, h2, w2, pd, ph, c)
    dw = (xr[..., 0, :] - xr[..., 1, :]) * s
    out: Dict[str, jax.Array] = {}
    for nw, tw in (("a", aw), ("d", dw)):
        ah = (tw[..., 0, :] + tw[..., 1, :]) * s  # (b, d2, h2, w2, pd, c)
        dh = (tw[..., 0, :] - tw[..., 1, :]) * s
        for nh, th in (("a", ah), ("d", dh)):
            out["a" + nh + nw] = (th[..., 0, :] + th[..., 1, :]) * s
            out["d" + nh + nw] = (th[..., 0, :] - th[..., 1, :]) * s
    return out["aaa"], {k: out[k] for k in DETAIL_KEYS}


def dwt3(
    x: jax.Array, wavelet: str = "db1", axes: Sequence[int] = (1, 2, 3)
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Single-level 3D DWT of a channels-last volume `(B, D, H, W, C)`.

    Returns `(lowpass, details)` where `details` maps each of the 7
    `DETAIL_KEYS` to its subband (all subbands have halved spatial extents).
    """
    if wavelet not in ("db1", "haar"):
        return _dwt3_generic(x, wavelet, axes)
    if x.ndim == 5 and tuple(axes) == (1, 2, 3):
        return _dwt3_haar_phases(x)
    ax_d, ax_h, ax_w = axes
    a, d = _haar_split(x, ax_d)
    aa, ad = _haar_split(a, ax_h)
    da, dd = _haar_split(d, ax_h)
    aaa, aad = _haar_split(aa, ax_w)
    ada, add = _haar_split(ad, ax_w)
    daa, dad = _haar_split(da, ax_w)
    dda, ddd = _haar_split(dd, ax_w)
    details = {
        "aad": aad,
        "ada": ada,
        "add": add,
        "daa": daa,
        "dad": dad,
        "dda": dda,
        "ddd": ddd,
    }
    return aaa, details


def _idwt3_haar_phases(
    lowpass: jax.Array, details: Dict[str, jax.Array]
) -> jax.Array:
    """Haar synthesis via inverse butterflies + ONE phase transpose (see
    `_dwt3_haar_phases` — same single-relayout win, measured
    0.94 → 0.69 ms/patch @32³→64³×48 bf16)."""
    s = jnp.asarray(_INV_SQRT2, lowpass.dtype)
    subs = {"aaa": lowpass, **details}

    def mer(a, d_):
        return (a + d_) * s, (a - d_) * s

    rec: Dict[Tuple, jax.Array] = {}
    for nh in "ad":
        for nw in "ad":
            x0, x1 = mer(subs["a" + nh + nw], subs["d" + nh + nw])
            rec[(0, nh, nw)] = x0
            rec[(1, nh, nw)] = x1
    rec2: Dict[Tuple, jax.Array] = {}
    for pd in (0, 1):
        for nw in "ad":
            x0, x1 = mer(rec[(pd, "a", nw)], rec[(pd, "d", nw)])
            rec2[(pd, 0, nw)] = x0
            rec2[(pd, 1, nw)] = x1
    phases = []
    for pd in (0, 1):
        for ph in (0, 1):
            x0, x1 = mer(rec2[(pd, ph, "a")], rec2[(pd, ph, "d")])
            phases.extend([x0, x1])
    y = jnp.stack(phases, axis=4)  # (b, d2, h2, w2, 8, c)
    b, d2, h2, w2, _, c = y.shape
    y = y.reshape(b, d2, h2, w2, 2, 2, 2, c)
    y = y.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return y.reshape(b, d2 * 2, h2 * 2, w2 * 2, c)


def idwt3(
    lowpass: jax.Array,
    details: Dict[str, jax.Array],
    wavelet: str = "db1",
    axes: Sequence[int] = (1, 2, 3),
) -> jax.Array:
    """Single-level 3D inverse DWT (inverse of `dwt3`)."""
    if wavelet not in ("db1", "haar"):
        return _idwt3_generic(lowpass, details, wavelet, axes)
    if lowpass.ndim == 5 and tuple(axes) == (1, 2, 3):
        return _idwt3_haar_phases(lowpass, details)
    ax_d, ax_h, ax_w = axes
    aa = _haar_merge(lowpass, details["aad"], ax_w)
    ad = _haar_merge(details["ada"], details["add"], ax_w)
    da = _haar_merge(details["daa"], details["dad"], ax_w)
    dd = _haar_merge(details["dda"], details["ddd"], ax_w)
    a = _haar_merge(aa, ad, ax_h)
    d = _haar_merge(da, dd, ax_h)
    return _haar_merge(a, d, ax_d)


def wavedec3(
    x: jax.Array,
    wavelet: str = "db1",
    level: int = 1,
    axes: Sequence[int] = (1, 2, 3),
) -> List:
    """Multi-level 3D DWT, ptwt-compatible coefficient layout.

    Returns `[lowpass_L, details_L, details_{L-1}, ..., details_1]` — the
    coarsest detail dict first after the final lowpass, exactly the structure
    `ptwt.wavedec3` produces (reference `wave_helper.py:349-353`).
    """
    coeffs: List = []
    ll = x
    for _ in range(level):
        ll, det = dwt3(ll, wavelet=wavelet, axes=axes)
        coeffs.append(det)
    coeffs.reverse()
    return [ll] + coeffs


def waverec3(
    coeffs: Sequence, wavelet: str = "db1", axes: Sequence[int] = (1, 2, 3)
) -> jax.Array:
    """Multi-level 3D inverse DWT (ptwt.waverec3-compatible).

    `coeffs` is `[lowpass, details_coarsest, ..., details_finest]` as produced
    by `wavedec3` (reference `idwt_upsample.py:159-160` usage).
    """
    x = coeffs[0]
    for det in coeffs[1:]:
        # pywt trims the lowpass if a deeper level was padded to odd+1.
        ref = next(iter(det.values()))
        if x.shape != ref.shape:
            sl = [slice(None)] * x.ndim
            for ax in axes:
                sl[ax] = slice(0, ref.shape[ax])
            x = x[tuple(sl)]
        x = idwt3(x, det, wavelet=wavelet, axes=axes)
    return x


# ---------------------------------------------------------------------------
# Generic separable FIR path (registered non-Haar wavelets)
# ---------------------------------------------------------------------------


def _dwt1d_generic(x, dec_lo, dec_hi, axis):
    """1D analysis with pywt 'zero' padding via depthwise conv along `axis`."""
    flen = dec_lo.shape[0]
    pad = [(0, 0)] * x.ndim
    pad[axis] = (flen - 1, flen - 1)
    xp = jnp.pad(x, pad)
    # move axis last, flatten the rest into batch
    xp = jnp.moveaxis(xp, axis, -1)
    lead = xp.shape[:-1]
    n = xp.shape[-1]
    flat = xp.reshape(-1, 1, n)
    # pywt convolves with the *reversed* filter, then downsamples by 2
    # starting at index filt_len - 1.
    kern_lo = jnp.asarray(dec_lo[::-1].copy(), dtype=x.dtype).reshape(1, 1, flen)
    kern_hi = jnp.asarray(dec_hi[::-1].copy(), dtype=x.dtype).reshape(1, 1, flen)
    dn = jax.lax.conv_dimension_numbers(flat.shape, kern_lo.shape, ("NCH", "OIH", "NCH"))
    # slice so downsampling starts at filt_len - 1 (the pywt phase)
    flat_s = flat[:, :, flen - 1 :]
    conv_s = lambda k: jax.lax.conv_general_dilated(
        flat_s, k, window_strides=(2,), padding=[(0, 0)], dimension_numbers=dn
    )
    lo = conv_s(kern_lo)[:, 0, :]
    hi = conv_s(kern_hi)[:, 0, :]
    out_len = (x.shape[axis] + flen - 1) // 2
    lo = lo[:, :out_len].reshape(*lead, out_len)
    hi = hi[:, :out_len].reshape(*lead, out_len)
    return jnp.moveaxis(lo, -1, axis), jnp.moveaxis(hi, -1, axis)


def _idwt1d_generic(a, d, rec_lo, rec_hi, axis, out_len):
    """1D synthesis: upsample-by-2 then FIR, pywt convention."""
    flen = rec_lo.shape[0]
    a = jnp.moveaxis(a, axis, -1)
    d = jnp.moveaxis(d, axis, -1)
    lead = a.shape[:-1]
    n = a.shape[-1]
    up = jnp.zeros((*lead, 2 * n), dtype=a.dtype)
    up_a = up.at[..., ::2].set(a)
    up_d = up.at[..., ::2].set(d)
    flat_a = up_a.reshape(-1, 1, 2 * n)
    flat_d = up_d.reshape(-1, 1, 2 * n)
    kern_lo = jnp.asarray(rec_lo[::-1].copy(), dtype=a.dtype).reshape(1, 1, flen)
    kern_hi = jnp.asarray(rec_hi[::-1].copy(), dtype=a.dtype).reshape(1, 1, flen)
    dn = jax.lax.conv_dimension_numbers(
        flat_a.shape, kern_lo.shape, ("NCH", "OIH", "NCH")
    )
    conv = lambda f, k: jax.lax.conv_general_dilated(
        f, k, window_strides=(1,), padding=[(flen - 1, flen - 1)], dimension_numbers=dn
    )
    y = conv(flat_a, kern_lo)[:, 0, :] + conv(flat_d, kern_hi)[:, 0, :]
    # pywt trims filt_len - 2 from each side, then to out_len
    trim = flen - 2
    y = y[:, trim : trim + out_len] if trim > 0 else y[:, :out_len]
    y = y.reshape(*lead, out_len)
    return jnp.moveaxis(y, -1, axis)


def _dwt3_generic(x, wavelet, axes):
    if wavelet not in _WAVELETS:
        raise ValueError(f"unknown wavelet {wavelet!r}; register it first")
    dec_lo, dec_hi, _, _ = _WAVELETS[wavelet]
    ax_d, ax_h, ax_w = axes
    a, d = _dwt1d_generic(x, dec_lo, dec_hi, ax_d)
    aa, ad = _dwt1d_generic(a, dec_lo, dec_hi, ax_h)
    da, dd = _dwt1d_generic(d, dec_lo, dec_hi, ax_h)
    aaa, aad = _dwt1d_generic(aa, dec_lo, dec_hi, ax_w)
    ada, add = _dwt1d_generic(ad, dec_lo, dec_hi, ax_w)
    daa, dad = _dwt1d_generic(da, dec_lo, dec_hi, ax_w)
    dda, ddd = _dwt1d_generic(dd, dec_lo, dec_hi, ax_w)
    return aaa, {
        "aad": aad,
        "ada": ada,
        "add": add,
        "daa": daa,
        "dad": dad,
        "dda": dda,
        "ddd": ddd,
    }


def _idwt3_generic(lowpass, details, wavelet, axes):
    if wavelet not in _WAVELETS:
        raise ValueError(f"unknown wavelet {wavelet!r}; register it first")
    _, _, rec_lo, rec_hi = _WAVELETS[wavelet]
    ax_d, ax_h, ax_w = axes
    out = lambda ref, ax: 2 * ref.shape[ax]
    aad = details["aad"]
    aa = _idwt1d_generic(lowpass, aad, rec_lo, rec_hi, ax_w, out(aad, ax_w))
    ad = _idwt1d_generic(
        details["ada"], details["add"], rec_lo, rec_hi, ax_w, out(aad, ax_w)
    )
    da = _idwt1d_generic(
        details["daa"], details["dad"], rec_lo, rec_hi, ax_w, out(aad, ax_w)
    )
    dd = _idwt1d_generic(
        details["dda"], details["ddd"], rec_lo, rec_hi, ax_w, out(aad, ax_w)
    )
    a = _idwt1d_generic(aa, ad, rec_lo, rec_hi, ax_h, out(aad, ax_h))
    d = _idwt1d_generic(da, dd, rec_lo, rec_hi, ax_h, out(aad, ax_h))
    return _idwt1d_generic(a, d, rec_lo, rec_hi, ax_d, out(aad, ax_d))

"""A/B probe: does the v5e MXU run int8 matmuls faster than bf16?

Answers the "int8 serving mode" lead from BENCH_NOTES.md round-4 guidance.
Measured 2026-08-19 (see BENCH_NOTES): XLA `lax.conv`/`dot_general` with
int8 operands runs AT bf16 speed (no int8 path engaged); this Pallas
kernel pair measures a stable **1.21×** (int8 75-77 vs bf16 62-63 TOP/s)
— far below the nominal 2× and below the ~1.6× an end-to-end win needs,
so int8 quantization was resolved NOT worth the Dice-parity risk.

Mosaic constraints encoded here: i8 VPU ops (elementwise add, casts to
vector<i8>) are unsupported — only the MXU consumes int8 — so the
anti-CSE perturbation goes on the i32 output for the int8 variant, and
scalar extracts must be 32-bit.

Run: PYTHONPATH=. python tools/exp_int8_mxu.py   (real TPU)
"""
import numpy as np, os
cache = os.path.expanduser("~/.cache/wftpu_xla")
import jax
jax.config.update("jax_compilation_cache_dir", cache)
import jax.numpy as jnp
from jax.experimental import pallas as pl
from waveformer_tpu.utils.profiling import device_time

def make(M, K, N, BM, out_dtype, perturb_out):
    def mm_kernel(s_ref, x_ref, w_ref, o_ref):
        if perturb_out:
            # i8 VPU ops are unsupported; perturb the i32 output instead
            # (s varies per scan iteration -> the call cannot be hoisted)
            o_ref[:] = (
                jnp.dot(x_ref[:], w_ref[:], preferred_element_type=out_dtype)
                + s_ref[0].astype(out_dtype))
        else:
            xs = x_ref[:] + s_ref[0].astype(x_ref.dtype)
            o_ref[:] = jnp.dot(xs, w_ref[:], preferred_element_type=out_dtype)
    def mm(s, x, w):
        return pl.pallas_call(
            mm_kernel,
            grid=(M // BM,),
            in_specs=[pl.BlockSpec((8,), lambda i: (0,)),
                      pl.BlockSpec((BM, K), lambda i: (i, 0)),
                      pl.BlockSpec((K, N), lambda i: (0, 0))],
            out_specs=pl.BlockSpec((BM, N), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        )(s, x, w)
    return mm

rng = np.random.default_rng(0)
for (M, K, N, BM) in [(32768, 1024, 512, 1024), (32768, 1024, 512, 512),
                      (16384, 2048, 512, 512)]:
    flops = 2 * M * K * N
    for mk in ["bf16", "int8"]:
        if mk == "bf16":
            x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
            w = jnp.asarray(rng.standard_normal((K, N)), jnp.bfloat16)
            mm = make(M, K, N, BM, jnp.float32, False)
        else:
            x = jnp.asarray(rng.integers(-127, 127, (M, K)), jnp.int8)
            w = jnp.asarray(rng.integers(-127, 127, (K, N)), jnp.int8)
            mm = make(M, K, N, BM, jnp.int32, True)
        f = lambda s, x=x, w=w, mm=mm: mm(s, x, w)
        s0 = jnp.zeros((8,), jnp.float32)
        t = device_time(f, s0, iters=64)
        print(f"M{M} K{K} N{N} BM{BM} {mk}: {t*1e6:7.1f} us "
              f"({flops/t/1e12:6.1f} TOP/s)", flush=True)

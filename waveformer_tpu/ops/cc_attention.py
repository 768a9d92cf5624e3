"""Criss-cross attention (reference implementation, jax.numpy).

Capability note for `lib/extensions/cc_attention/src/*` (SURVEY.md §2.8):
the reference vendors a CUDA criss-cross attention kernel that nothing on
the WaveFormer path uses. This jnp implementation documents the op for
completeness — each position attends to every position sharing its row or
column (2D) — and runs fine under jit on TPU; no custom kernel is warranted
for an off-path op.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def criss_cross_attention(
    q: jax.Array, k: jax.Array, v: jax.Array
) -> jax.Array:
    """2D criss-cross attention.

    q, k: (B, H, W, Cqk); v: (B, H, W, Cv) → (B, H, W, Cv).
    Affinities are computed along each position's row and column; the
    self-position appears in both sets, and (as in the original op) its
    column logit is masked to -inf to avoid double counting.
    """
    b, h, w, _ = q.shape
    scale = q.shape[-1] ** -0.5
    q = q * scale

    # row attention: for each (i, j), keys (i, j') over the row
    row_logits = jnp.einsum("bijc,bikc->bijk", q, k)  # (B, H, W, W)
    # column attention: keys (i', j) over the column
    col_logits = jnp.einsum("bijc,bkjc->bijk", q, k)  # (B, H, W, H)
    # mask the self position in the column set (it already appears in rows)
    eye = jnp.eye(h, dtype=bool)[None, :, None, :]  # (1, H, 1, H)
    col_logits = jnp.where(eye, -jnp.inf, col_logits)

    logits = jnp.concatenate([row_logits, col_logits], axis=-1)
    attn = jax.nn.softmax(logits, axis=-1)
    attn_row, attn_col = attn[..., :w], attn[..., w:]
    out = jnp.einsum("bijk,bikc->bijc", attn_row, v)
    out = out + jnp.einsum("bijk,bkjc->bijc", attn_col, v)
    return out

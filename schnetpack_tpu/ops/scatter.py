"""
Segment aggregation primitives.

The reference's single aggregation primitive is ``scatter_add``
(``src/schnetpack/nn/scatter.py:26-34``, a ``zeros().index_add`` wrapper).
On TPU the idiomatic equivalent is ``jax.ops.segment_sum`` over **sorted**
fixed-shape padded index arrays: the collate function sorts pairs by center
atom and pads to a static length, so every call compiles to one XLA scatter
with ``indices_are_sorted=True``.

Padding convention: padded entries carry ``idx == num_segments`` (one past
the last real segment) OR are zeroed by a mask before aggregation; both are
safe because callers allocate ``num_segments`` real segments and the wrapper
drops out-of-range indices (XLA scatter drops OOB updates in this mode).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def segment_sum(
    x: jax.Array,
    idx: jax.Array,
    num_segments: int,
    indices_are_sorted: bool = True,
) -> jax.Array:
    """Sum rows of ``x`` into ``num_segments`` buckets given by ``idx``.

    ``x``: [N, ...]; ``idx``: [N] int32. Out-of-range indices (used for
    padding) are dropped by XLA's scatter semantics.

    For few segments (per-molecule reductions: the Atomwise energy sum,
    dipole/polarizability aggregation) the XLA scatter lowering is
    serialized row traffic — measured 0.21 ms/step of the 10k-atom MD
    step (r5 trace).  A one-hot matmul does the same reduction on the
    MXU; HIGHEST precision keeps the f32 accumulation exact (an energy
    sum over 10^4 atoms must not run at bf16).  Semantics note: scatter
    isolates rows to their own segment, but a one-hot dot multiplies
    EVERY row into every segment (weight 0), and 0*nan = nan — one
    non-finite padding row (1/d^k infs, fill-mode gathers) would poison
    all segments.  Non-finite rows are therefore zeroed first: this
    path does not propagate NaNs from one segment into another, and a
    segment whose own rows are all non-finite sums to 0 rather than
    NaN (padding-friendly; the >128-segment scatter path keeps exact
    XLA semantics).
    """
    if (num_segments <= 128 and x.ndim <= 2
            and jnp.issubdtype(x.dtype, jnp.floating)):
        oh = (idx[:, None] == jnp.arange(num_segments, dtype=idx.dtype)
              ).astype(x.dtype)                            # [N, M]
        x2 = x[:, None] if x.ndim == 1 else x
        x2 = jnp.where(jnp.isfinite(x2), x2, 0)
        out = jax.lax.dot_general(
            oh, x2, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=x2.dtype,
        )                                                  # [M, D]
        return out[:, 0] if x.ndim == 1 else out
    return jax.ops.segment_sum(
        x, idx, num_segments=num_segments, indices_are_sorted=indices_are_sorted
    )


def segment_mean(
    x: jax.Array,
    idx: jax.Array,
    num_segments: int,
    indices_are_sorted: bool = True,
    min_count: float = 1.0,
) -> jax.Array:
    """Mean per segment; empty segments yield zero."""
    total = segment_sum(x, idx, num_segments, indices_are_sorted)
    ones = jnp.ones(x.shape[:1], dtype=x.dtype)
    count = segment_sum(ones, idx, num_segments, indices_are_sorted)
    count = jnp.maximum(count, min_count)
    count = count.reshape(count.shape + (1,) * (total.ndim - 1))
    return total / count


def segment_softmax(
    logits: jax.Array,
    idx: jax.Array,
    num_segments: int,
    mask: Optional[jax.Array] = None,
    indices_are_sorted: bool = True,
) -> jax.Array:
    """Numerically-stable softmax within segments (attention over neighbors)."""
    if mask is not None:
        logits = jnp.where(mask > 0, logits, -jnp.inf)
    seg_max = jax.ops.segment_max(
        logits, idx, num_segments=num_segments, indices_are_sorted=indices_are_sorted
    )
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    shifted = logits - seg_max[idx]
    exp = jnp.where(jnp.isfinite(shifted), jnp.exp(shifted), 0.0)
    denom = segment_sum(exp, idx, num_segments, indices_are_sorted)
    denom = jnp.maximum(denom, 1e-16)
    return exp / denom[idx]


def gather(x: jax.Array, idx: jax.Array) -> jax.Array:
    """Row gather ``x[idx]`` (neighbor feature lookup)."""
    return jnp.take(x, idx, axis=0, unique_indices=False, indices_are_sorted=False)

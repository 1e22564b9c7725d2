"""Resident farthest-point-sampling kernel.

The jnp FPS (ops/sampling._fps_loop) is a `lax.fori_loop` of ~6 small XLA
ops per step; at npoint=1024 the per-op launch overhead dominates (~140 ms
per (9, 4096) -> 1024 call at nao scale for microseconds of VPU math). This
kernel runs the WHOLE sequential loop inside ONE Pallas instance with the
batch as a vectorized dimension: the clouds and running distances stay in
VMEM, the dynamic row read (xyz[b, farthest_b]) is a one-hot masked sum,
and the dynamic index store (out[:, i]) is an iota-match select — no
gathers/scatters, and the per-step loop overhead is amortized over B.

Selection order is bit-identical to the jnp path: same (x - c)^2 update,
same lowest-index tie rule (masked min-index — Mosaic argmax does NOT
honor the first-max rule), same start convention (first masked index;
index 0 unmasked — the CUDA kernel's determinism contract, reference
networks/pointnet_lib/src/sampling_gpu.cu:113-115).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INT_MAX = jnp.iinfo(jnp.int32).max


def _fps_kernel(npoint, x_ref, m_ref, out_ref):
    # x_ref is channel-major (3, B, N): a (B, N, 3) VMEM block pads the
    # 3-channel dim to 128 lanes (42x memory blow-up, measured 36 MB OOM)
    maskf = m_ref[...]    # (B, N) 1.0/0.0
    b, n = maskf.shape
    ids = jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)
    oid = jax.lax.broadcasted_iota(jnp.int32, (b, npoint), 1)
    neg_inf = jnp.float32(-jnp.inf)

    def first_where(cond):
        # lowest index per row via masked min (deterministic tie rule)
        return jnp.min(jnp.where(cond, ids, INT_MAX), axis=1)  # (B,)

    start = first_where(maskf > 0.0)

    def body(i, carry):
        dist, far = carry
        out_ref[...] = jnp.where(oid == i, far[:, None], out_ref[...])
        sel = ids == far[:, None]                               # (B, N)
        # channel-wise 2-D ops: Mosaic cannot reshape a (B, N) mask to 3-D
        d = jnp.zeros_like(dist)
        for c in range(3):
            xc = x_ref[c]                                       # (B, N)
            cen_c = jnp.sum(jnp.where(sel, xc, 0.0), axis=1)    # (B,)
            diff = xc - cen_c[:, None]
            d = d + diff * diff
        dist = jnp.minimum(dist, d)
        score = jnp.where(maskf > 0.0, dist, neg_inf)
        return dist, first_where(score == jnp.max(score, axis=1)[:, None])

    out_ref[...] = jnp.zeros((b, npoint), jnp.int32)
    dist0 = jnp.full((b, n), jnp.inf, jnp.float32)
    jax.lax.fori_loop(0, npoint, body, (dist0, start))


@functools.partial(jax.jit, static_argnames=("npoint",))
def fps_pallas(xyz: jnp.ndarray, mask: jnp.ndarray, npoint: int):
    """xyz (B, N, 3), mask (B, N) bool -> indices (B, npoint) int32."""
    b, n, _ = xyz.shape
    return pl.pallas_call(
        functools.partial(_fps_kernel, npoint),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, npoint), jnp.int32),
    )(jnp.transpose(xyz.astype(jnp.float32), (2, 0, 1)),
      mask.astype(jnp.float32))


def fps_kernel_available(n: int, npoint: int, batch: int = 1) -> bool:
    """Kernel pays off when the step count makes XLA op overhead dominate,
    and the working set fits VMEM: the kernel keeps ~7 (B, N)-sized f32/i32
    buffers live (3 xyz channel planes, mask, running dist, step dist,
    score/iota), so bound batch*n such that 7 buffers stay well under the
    16 MB scoped budget."""
    from reart_tpu.ops.pallas_nn import use_pallas

    if n < 512 or npoint < 64 or batch * n > 393216:
        return False
    return use_pallas((1, n, 3), (1, n, 3))

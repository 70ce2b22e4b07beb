"""Pallas TPU kernel for the xlat channelizer bank — the framework's
hottest op.

The reference's per-channel ``freq_xlating_fir_filter_ccc`` C++ work
loops (rc_frontend/channel.py:29-38) become, in ``ops.channelizer``, one
polyphase-framed complex matmul ``w[N, K] @ grev[K, C]``. That
formulation materializes the window matrix ``w`` — N·K complex64 ≈ 57 MB
per 100 ms source block — so XLA streams ~40x more HBM than the
underlying data. This kernel instead keeps each polyphase-framed input
tile resident in VMEM and accumulates the P shifted sub-matmuls

    y[N, C] = Σ_q  zf[q : q+N, :] @ grev_T[q·D : (q+1)·D, :]

directly on the MXU — every input element is read from HBM once (plus a
P-1-row halo per tile). The grid runs over N-tiles; the halo rows come
from a second BlockSpec view of the same array shifted one tile ahead,
since TPU block specs cannot overlap. ``jax.vmap`` (the per-source batch
in the capture pipelines) maps onto a leading grid dimension.

The per-slot mixer phase ramp (uint32 fixed point, bit-exact across
block splits) stays outside the kernel, shared with the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

VMEM_BUDGET = 12 * 1024 * 1024    # scoped-vmem limit is ~16 MiB
MAX_BLOCK_N = 256   # keeps double-buffered blocks inside the 16 MiB scoped-vmem limit


def _bank_kernel(p: int, d: int, bn: int,
                 za_re, za_im, zb_re, zb_im, g1, g2, ore, oim):
    """One N-tile: acc = Σ_q zbuf[q:q+BN] @ g[q·D:(q+1)·D] (complex).

    zbuf is this tile's BN rows plus the next tile's first P-1 rows.
    The complex product is evaluated as TWO dots per q with the real and
    imaginary tap planes stacked side by side (g1 = [gre | gim],
    g2 = [-gim | gre], each [P·D, 2C]), so every dot drives 2C output
    lanes: acc[:, :C] + 1j·acc[:, C:] = w @ (gre + 1j·gim). At C=64 that
    fills the 128-lane MXU instead of running four half-width dots.
    """
    zre = jnp.concatenate([za_re[:], zb_re[: p - 1, :]], axis=0)
    zim = jnp.concatenate([za_im[:], zb_im[: p - 1, :]], axis=0)
    c = ore.shape[-1]
    acc = jnp.zeros(ore.shape[:-1] + (2 * c,), jnp.float32)
    for q in range(p):
        wre = zre[q:q + bn, :]
        wim = zim[q:q + bn, :]
        t1 = g1[q * d:(q + 1) * d, :]
        t2 = g2[q * d:(q + 1) * d, :]
        acc += (jnp.dot(wre, t1, preferred_element_type=jnp.float32)
                + jnp.dot(wim, t2, preferred_element_type=jnp.float32))
    ore[:] = acc[:, :c]
    oim[:] = acc[:, c:]


def block_n_for(n: int) -> int | None:
    """N-tile size: TPU block rows must be a multiple of 8; the output
    is computed over ceil(n/BN) tiles and sliced back to n rows."""
    if n < 8:
        return None
    return min(MAX_BLOCK_N, ((n + 7) // 8) * 8)


@functools.partial(jax.jit, static_argnames=("p", "d", "interpret"))
def bank_matmul_pallas(zf_re: jax.Array, zf_im: jax.Array,
                       g_re: jax.Array, g_im: jax.Array,
                       p: int, d: int, interpret: bool = False
                       ) -> tuple[jax.Array, jax.Array]:
    """zf_*: [N+P-1, D] framed input planes; g_*: [P·D, C] tap planes
    (already correlation-reversed). Returns (y_re, y_im) [N, C]."""
    n = zf_re.shape[0] - (p - 1)
    c = g_re.shape[1]
    bn = block_n_for(n)
    if bn is None:
        raise ValueError(f"no usable N-tile for n={n}")
    ntiles = -(-n // bn)
    n_pad = ntiles * bn
    # Stacked tap planes (see _bank_kernel): one [P·D, 2C] pair.
    g1 = jnp.concatenate([g_re, g_im], axis=1)
    g2 = jnp.concatenate([-g_im, g_re], axis=1)
    kern = functools.partial(_bank_kernel, p, d, bn)
    # Tile t needs zf rows [t·BN, t·BN + BN + P - 1): its own (BN, D)
    # block plus the first P-1 rows of block t+1. Pad the framed input
    # to (ntiles+1)·BN rows so block t+1 exists for the last tile and
    # carries the real trailing P-1 rows (then zeros).
    pad = (ntiles + 1) * bn - zf_re.shape[0]
    zp_re = jnp.pad(zf_re, ((0, pad), (0, 0)))
    zp_im = jnp.pad(zf_im, ((0, pad), (0, 0)))
    z_a = pl.BlockSpec((bn, d), lambda t: (t, 0),
                       memory_space=pltpu.VMEM)
    z_b = pl.BlockSpec((bn, d), lambda t: (t + 1, 0),
                       memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((p * d, 2 * c), lambda t: (0, 0),
                          memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((bn, c), lambda t: (t, 0),
                          memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((n_pad, c), jnp.float32)] * 2
    y_re, y_im = pl.pallas_call(
        kern,
        grid=(ntiles,),
        out_shape=out_shape,
        in_specs=[z_a, z_a, z_b, z_b, g_spec, g_spec],
        out_specs=[o_spec, o_spec],
        interpret=interpret,
    )(zp_re, zp_im, zp_re, zp_im, g1, g2)
    return y_re[:n], y_im[:n]


def vmem_bytes(n: int, p: int, d: int, c: int) -> int:
    # 4 input blocks [BN, D], 2 stacked tap planes [P·D, 2C], the [BN, 2C]
    # accumulator and 2 output blocks [BN, C] — all f32.
    bn = block_n_for(n) or n
    return 4 * (4 * bn * d + 4 * p * d * c + 4 * bn * c)


def pallas_supported(n: int, p: int, d: int, c: int) -> bool:
    try:
        backend = jax.default_backend()
    except Exception:
        return False
    bn = block_n_for(n)
    return (backend == "tpu" and bn is not None and bn >= p - 1
            and vmem_bytes(n, p, d, c) < VMEM_BUDGET)

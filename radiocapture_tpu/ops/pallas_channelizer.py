"""Pallas TPU kernel for the xlat channelizer bank — the framework's
hottest op.

The reference's per-channel ``freq_xlating_fir_filter_ccc`` C++ work
loops (rc_frontend/channel.py:29-38) become, in ``ops.channelizer``, one
polyphase-framed complex matmul ``w[N, K] @ grev[K, C]``. That
formulation materializes the window matrix ``w`` — N·K complex64 ≈ 57 MB
per 100 ms source block — so XLA streams ~40x more HBM than the
underlying data. This kernel reads every input element from HBM once
(plus a P-1-row halo per tile), rebuilds the window matrix for one
N-tile in VMEM *scratch* with cheap vector copies, and contracts it in
ONE wide MXU dot:

    [w_re | w_im][BN, 2K]  @  [[g_re, g_im], [-g_im, g_re]][2K, 2C]
        = [y_re | y_im][BN, 2C]

One fat dot per tile (K = P·D ≈ 2880) instead of P shifted sub-matmuls —
the accumulate-P-small-dots formulation is MXU *latency* bound (60
[BN, 96]×[96, 2C] dots per tile each pay pipeline fill), measured ~3x
slower at production shapes. The grid runs over N-tiles; halo rows come
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
MAX_BLOCK_N = 256


def _bank_kernel(p: int, d: int, bn: int,
                 za_re, za_im, zb_re, zb_im, g, ore, oim, w):
    """One N-tile: build w = [w_re | w_im] in scratch, one MXU dot.

    The z blocks hold this tile's BN rows plus the next tile's first
    P-1 rows (the polyphase halo); branch q of the window matrix is the
    rows q..q+BN — a contiguous [BN, D] vector copy into scratch.
    """
    zre = jnp.concatenate([za_re[:], zb_re[: p - 1, :]], axis=0)
    zim = jnp.concatenate([za_im[:], zb_im[: p - 1, :]], axis=0)
    k = p * d
    for q in range(p):
        w[:, q * d:(q + 1) * d] = zre[q:q + bn, :]
        w[:, k + q * d:k + (q + 1) * d] = zim[q:q + bn, :]
    acc = jnp.dot(w[:], g[:], preferred_element_type=jnp.float32)
    c = ore.shape[-1]
    ore[:] = acc[:, :c]
    oim[:] = acc[:, c:]


def block_n_for(n: int) -> int | None:
    """N-tile size: TPU block rows must be a multiple of 8; the output
    is computed over ceil(n/BN) tiles and sliced back to n rows."""
    if n < 8:
        return None
    return min(MAX_BLOCK_N, ((n + 7) // 8) * 8)


@functools.partial(jax.jit,
                   static_argnames=("p", "d", "interpret", "bf16"))
def bank_matmul_pallas(zf_re: jax.Array, zf_im: jax.Array,
                       g_re: jax.Array, g_im: jax.Array,
                       p: int, d: int, interpret: bool = False,
                       bf16: bool = True) -> tuple[jax.Array, jax.Array]:
    """zf_*: [N+P-1, D] framed input planes; g_*: [P·D, C] tap planes
    (already correlation-reversed). Returns (y_re, y_im) [N, C].

    ``bf16`` feeds the MXU bfloat16 inputs with float32 accumulation —
    the default single-pass rate (f32 inputs lower to a multi-pass
    emulation several times slower). SDR IQ carries 8-12 significant
    bits and the slicer margins downstream are half a level, so the
    ~4e-3 relative rounding is far below the decode noise floor; it also
    matches XLA's own DEFAULT-precision dot lowering on TPU, so the
    fallback path has the same numerics."""
    n = zf_re.shape[0] - (p - 1)
    c = g_re.shape[1]
    k = p * d
    bn = block_n_for(n)
    if bn is None:
        raise ValueError(f"no usable N-tile for n={n}")
    ntiles = -(-n // bn)
    n_pad = ntiles * bn
    # Block-diagonal-of-planes tap matrix (see module docstring): one
    # [2K, 2C] operand so the complex product is a single real dot.
    g = jnp.concatenate([
        jnp.concatenate([g_re, g_im], axis=1),
        jnp.concatenate([-g_im, g_re], axis=1)], axis=0)
    dtype = jnp.bfloat16 if bf16 else jnp.float32
    zf_re = zf_re.astype(dtype)
    zf_im = zf_im.astype(dtype)
    g = g.astype(dtype)
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
    g_spec = pl.BlockSpec((2 * k, 2 * c), lambda t: (0, 0),
                          memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((bn, c), lambda t: (t, 0),
                          memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((n_pad, c), jnp.float32)] * 2
    y_re, y_im = pl.pallas_call(
        kern,
        grid=(ntiles,),
        out_shape=out_shape,
        in_specs=[z_a, z_a, z_b, z_b, g_spec],
        out_specs=[o_spec, o_spec],
        scratch_shapes=[pltpu.VMEM((bn, 2 * k), dtype)],
        interpret=interpret,
    )(zp_re, zp_im, zp_re, zp_im, g)
    return y_re[:n], y_im[:n]


def vmem_bytes(n: int, p: int, d: int, c: int,
               itemsize: int = 2) -> int:
    """Working-set estimate (bf16 default): w scratch [BN, 2K], taps
    [2K, 2C], double-buffered z blocks, f32 acc + outputs."""
    bn = block_n_for(n) or n
    k = p * d
    return (bn * 2 * k * itemsize            # w scratch
            + 2 * k * 2 * c * itemsize       # g
            + 4 * bn * d * itemsize * 2      # z blocks, double-buffered
            + bn * 2 * c * 4                 # acc
            + 2 * bn * c * 4 * 2)            # outputs, double-buffered


def pallas_supported(n: int, p: int, d: int, c: int) -> bool:
    try:
        backend = jax.default_backend()
    except Exception:
        return False
    bn = block_n_for(n)
    return (backend == "tpu" and bn is not None and bn >= p - 1
            and vmem_bytes(n, p, d, c) < VMEM_BUDGET)

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
import numpy as np
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
    bn = block_n_for(n)
    if bn is None:
        raise ValueError(f"no usable N-tile for n={n}")
    ntiles = -(-n // bn)
    n_pad = ntiles * bn
    # Pad each polyphase branch to the 128-lane register width: the
    # scratch window build then moves only lane-aligned [BN, DP] rows.
    # With the natural D (e.g. 96 at 2.4 MS/s -> 25 kS/s) every one of
    # the P copies straddles lane boundaries and Mosaic lowers them as
    # rotate+mask storms — measured 2.4x end-to-end kernel time for 25%
    # fewer MXU flops. Zero tap rows in the pad keep the dot exact.
    dp = -(-d // 128) * 128
    if dp != d:
        zf_re = jnp.pad(zf_re, ((0, 0), (0, dp - d)))
        zf_im = jnp.pad(zf_im, ((0, 0), (0, dp - d)))
        g_re = jnp.pad(g_re.reshape(p, d, c),
                       ((0, 0), (0, dp - d), (0, 0))).reshape(p * dp, c)
        g_im = jnp.pad(g_im.reshape(p, d, c),
                       ((0, 0), (0, dp - d), (0, 0))).reshape(p * dp, c)
    k = p * dp
    # Block-diagonal-of-planes tap matrix (see module docstring): one
    # [2K, 2C] operand so the complex product is a single real dot.
    g = jnp.concatenate([
        jnp.concatenate([g_re, g_im], axis=1),
        jnp.concatenate([-g_im, g_re], axis=1)], axis=0)
    dtype = jnp.bfloat16 if bf16 else jnp.float32
    zf_re = zf_re.astype(dtype)
    zf_im = zf_im.astype(dtype)
    g = g.astype(dtype)
    kern = functools.partial(_bank_kernel, p, dp, bn)
    # Tile t needs zf rows [t·BN, t·BN + BN + P - 1): its own (BN, D)
    # block plus the first P-1 rows of block t+1. Pad the framed input
    # to (ntiles+1)·BN rows so block t+1 exists for the last tile and
    # carries the real trailing P-1 rows (then zeros).
    pad = (ntiles + 1) * bn - zf_re.shape[0]
    zp_re = jnp.pad(zf_re, ((0, pad), (0, 0)))
    zp_im = jnp.pad(zf_im, ((0, pad), (0, 0)))
    z_a = pl.BlockSpec((bn, dp), lambda t: (t, 0),
                       memory_space=pltpu.VMEM)
    z_b = pl.BlockSpec((bn, dp), lambda t: (t + 1, 0),
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


def _fused_kernel(p: int, dp2: int, bn: int, c: int, chunk: int,
                  out_dtype, za, zh, g, rot0, rowph, ore, oim, w):
    """One N-tile of the fused bank: window build (interleaved re/im
    rows — the tap matrix absorbs the complex arithmetic), one MXU dot,
    in-kernel mixer rotation, transposed plane outputs.

    The polyphase halo (the next tile's first P-1 rows) arrives as its
    own small pre-sliced array instead of a second full-tile view of z:
    fetching [BN, DP2] twice per tile doubled the kernel's HBM traffic,
    which — together with f32 rows — dominated the whole bank at
    production shapes (z is also fed bfloat16; see bank_fused_pallas).

    The rotation phasor factors as e^{j·(phase0 + step·(t·BN + i))} =
    rot0[t] · rowph[i]: the tile-independent row table comes from the
    host (built from exact uint32 angles) and the kernel applies one
    complex multiply — ~4·BN·C cheap VPU multiplies instead of BN·C
    sin/cos pairs (transcendentals measured several times the cost of
    the whole discriminator stage at these shapes)."""
    z = jnp.concatenate([za[:], zh[0, : p - 1, :]], axis=0)
    if chunk >= p:
        for q in range(p):
            w[:, q * dp2:(q + 1) * dp2] = z[q:q + bn, :].astype(w.dtype)
        acc = jnp.dot(w[:], g[:], preferred_element_type=jnp.float32)
    else:
        # K-chunked accumulation: build `chunk` polyphase branches in
        # scratch, dot them against the matching tap-row band, repeat.
        # The copy for chunk i+1 has no data dependence on chunk i's
        # dot, so Mosaic can overlap VPU window-builds with MXU dots —
        # the single-dot form serializes the full build before the dot.
        acc = None
        for q0 in range(0, p, chunk):
            qn = min(chunk, p - q0)
            for j in range(qn):
                w[:, (q0 + j) * dp2:(q0 + j + 1) * dp2] = (
                    z[q0 + j:q0 + j + bn, :].astype(w.dtype))
            part = jnp.dot(w[:, q0 * dp2:(q0 + qn) * dp2],
                           g[q0 * dp2:(q0 + qn) * dp2, :],
                           preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
    b_re, b_im = rot0[0, 0:1, :c], rot0[0, 0:1, c:]          # [1, C]
    rp_re, rp_im = rowph[:, :c], rowph[:, c:]                # [BN, C]
    r_re = rp_re * b_re - rp_im * b_im
    r_im = rp_re * b_im + rp_im * b_re
    # outputs stay [BN, C]; the [C, N] layout flip happens outside as
    # one XLA transpose pass (in-kernel .T lowers to per-tile
    # lane<->sublane shuffle storms).
    ore[:] = (acc[:, :c] * r_re - acc[:, c:] * r_im).astype(out_dtype)
    oim[:] = (acc[:, :c] * r_im + acc[:, c:] * r_re).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("p", "d", "interpret",
                                             "transpose_out", "chunk",
                                             "out_bf16",
                                             "dim_semantics"))
def bank_fused_pallas(z2: jax.Array, g2: jax.Array, rot0: jax.Array,
                      rowph: jax.Array, p: int, d: int,
                      interpret: bool = False,
                      transpose_out: bool = True,
                      chunk: int = 0,
                      out_bf16: bool = False,
                      dim_semantics: str | None = None
                      ) -> tuple[jax.Array, jax.Array]:
    """Fully fused xlat bank tile pass.

    z2:   [N+P-1, 2D] float32 — framed wideband rows in the raw wire
          interleave (sample j of row r at lanes (2j, 2j+1) = re, im).
          No complex materialization, no deinterleave pass.
    g2:   [P·DP2, 2C] bfloat16 — interleaved-row tap matrix: for branch
          q, tap j: row q·DP2+2j = [g_re | g_im], row q·DP2+2j+1 =
          [-g_im | g_re] (DP2 = 2D lane-padded to 128).
    rot0: [ntiles, 8, 2C] float32 — per-tile base phasor cos|sin of the
          exact uint32 mixer phase at the tile's first output row (row
          replicated to the 8-sublane tile floor; only row 0 is read).
    rowph: [BN, 2C] float32 — tile-independent row phasors
          cos|sin(step·i) for i in [0, BN).
    Returns (y_re, y_im) as [C, N_pad] float32 planes (transposed in
    VMEM; slice to N outside).
    """
    rows = z2.shape[0]
    n = rows - (p - 1)
    c = g2.shape[1] // 2
    d2 = 2 * d
    dp2 = -(-d2 // 128) * 128
    bn = block_n_for(n)
    if bn is None:
        raise ValueError(f"no usable N-tile for n={n}")
    ntiles = -(-n // bn)
    if dp2 != d2:
        z2 = jnp.pad(z2, ((0, 0), (0, dp2 - d2)))
    pad = (ntiles + 1) * bn - rows
    # bf16 input rows: halves the dominant HBM stream; SDR IQ carries
    # 8-12 significant bits and the MXU accumulates f32, so the ~2^-9
    # rounding sits far below the decode noise floor (same argument as
    # the bf16 taps).
    z2 = jnp.pad(z2, ((0, pad), (0, 0))).astype(jnp.bfloat16)
    # pre-sliced polyphase halos: tile t's extra P-1 rows, sublane-padded
    ph8 = max(8, -(-(p - 1) // 8) * 8)
    halo = jnp.stack([z2[(t + 1) * bn:(t + 1) * bn + ph8]
                      for t in range(ntiles)])      # [ntiles, ph8, dp2]
    z_a = pl.BlockSpec((bn, dp2), lambda t: (t, 0),
                       memory_space=pltpu.VMEM)
    z_h = pl.BlockSpec((1, ph8, dp2), lambda t: (t, 0, 0),
                       memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((p * dp2, 2 * c), lambda t: (0, 0),
                          memory_space=pltpu.VMEM)
    r_spec = pl.BlockSpec((1, 8, 2 * c), lambda t: (t, 0, 0),
                          memory_space=pltpu.VMEM)
    pw_spec = pl.BlockSpec((rowph.shape[0], 2 * c), lambda t: (0, 0),
                           memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((bn, c), lambda t: (t, 0),
                          memory_space=pltpu.VMEM)
    out_dtype = jnp.bfloat16 if out_bf16 else jnp.float32
    out_shape = [jax.ShapeDtypeStruct((ntiles * bn, c), out_dtype)] * 2
    kern = functools.partial(_fused_kernel, p, dp2, bn, c,
                             chunk if chunk > 0 else p, out_dtype)
    # dim_semantics: optional Mosaic grid annotation for the tile
    # dimension ("arbitrary" | "parallel"); measured neutral on v5e
    # (tools/kernel_lab.py), kept as a tuning hook.
    extra = {}
    if dim_semantics and not interpret:
        extra["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=(dim_semantics,))
    y_re, y_im = pl.pallas_call(
        kern,
        grid=(ntiles,),
        out_shape=out_shape,
        in_specs=[z_a, z_h, g_spec, r_spec, pw_spec],
        out_specs=[o_spec, o_spec],
        scratch_shapes=[pltpu.VMEM((bn, p * dp2), jnp.bfloat16)],
        interpret=interpret,
        **extra,
    )(z2, halo, g2, rot0, rowph)
    if not transpose_out:
        return y_re, y_im           # [N_pad, C] time-major planes
    return y_re.T, y_im.T


def fused_rotation_tables(phase0: jax.Array, step: jax.Array,
                          n: int) -> tuple[jax.Array, jax.Array]:
    """Host/XLA-side helpers for :func:`bank_fused_pallas`: per-tile
    base phasors and doubling phasors from the exact uint32 phase
    accumulator (wraps stay exact in integer arithmetic; only the final
    sin/cos and <= log2(BN) products are float)."""
    from radiocapture_tpu.ops.fir import _u32_to_angle
    bn = block_n_for(n)
    ntiles = -(-n // bn)
    t = jnp.arange(ntiles, dtype=jnp.uint32) * jnp.uint32(bn)
    base = phase0[None, :] + step[None, :] * t[:, None]    # [T, C] u32
    a0 = _u32_to_angle(base)
    rot0 = jnp.concatenate([jnp.cos(a0), jnp.sin(a0)], axis=1)
    # 8-sublane floor for the per-tile BlockSpec (row 0 is the payload)
    rot0 = jnp.broadcast_to(rot0[:, None, :],
                            (rot0.shape[0], 8, rot0.shape[1]))
    i = jnp.arange(bn, dtype=jnp.uint32)
    ai = _u32_to_angle(step[None, :] * i[:, None])          # [BN, C]
    rowph = jnp.concatenate([jnp.cos(ai), jnp.sin(ai)], axis=1)
    return rot0, rowph


def fused_tap_matrix(g_re: jax.Array, g_im: jax.Array, p: int, d: int
                     ) -> jax.Array:
    """[P·D, C] tap planes (correlation-reversed) -> the interleaved-row
    [P·DP2, 2C] bfloat16 operand of :func:`bank_fused_pallas`."""
    k, c = g_re.shape
    d2 = 2 * d
    dp2 = -(-d2 // 128) * 128
    row_re = jnp.concatenate([g_re, g_im], axis=1)          # [K, 2C]
    row_im = jnp.concatenate([-g_im, g_re], axis=1)
    inter = jnp.stack([row_re, row_im], axis=1)             # [K, 2, 2C]
    inter = inter.reshape(p, d2, 2 * c)
    if dp2 != d2:
        inter = jnp.pad(inter, ((0, 0), (0, dp2 - d2), (0, 0)))
    return inter.reshape(p * dp2, 2 * c).astype(jnp.bfloat16)


def vmem_bytes(n: int, p: int, d: int, c: int,
               itemsize: int = 2) -> int:
    """Working-set estimate (bf16 default): w scratch [BN, 2K], taps
    [2K, 2C], double-buffered z blocks, f32 acc + outputs. K counts the
    lane-padded branch width (see bank_matmul_pallas)."""
    bn = block_n_for(n) or n
    dp = -(-d // 128) * 128
    k = p * dp
    return (bn * 2 * k * itemsize            # w scratch
            + 2 * k * 2 * c * itemsize       # g
            + 4 * bn * dp * itemsize * 2     # z blocks, double-buffered
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

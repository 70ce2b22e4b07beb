"""Measured verdict on PERF.md lever #1 (two-level decimation tree).

The shape analysis (see PERF.md §6) says the only MXU-viable first
stage at 2.4 MS/s is an M=64 polyphase-DFT stage (D = 64 complex = 128
lanes exactly, zero pad waste); smaller trees (split2/split4/M=8) die
on the 128-lane pad floor or land on the VPU. This lab measures
*best-case proxies* for that candidate's three new stages against the
production fused bank kernel, interleaved (the tunneled device drifts
minute-to-minute, so never compare across runs):

  stage1  : windowing matmul [5000, 1280]x[1280, 128] bf16 per source
            (hop-48 / 4/3-oversampled M=64 PFB) + DFT-64 as a matmul.
            Proxy = pure XLA dots — NO window-build or halo cost, so
            the real kernel can only be slower.
  mixer   : per-slot residual carrier rotation at the 50 kS/s bin rate
            (u32 angles -> sincos -> complex multiply), [C, 5000]/src.
  fine    : shared-tap 32-tap decim-2 FIR over all slot streams
            ([128*64, 5000] batched conv).

If stage1+mixer+fine proxies >= the measured fused-bank time, the
lever cannot win at the bench shape regardless of implementation
quality.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from radiocapture_tpu.ops import pallas_channelizer as _pk
    from radiocapture_tpu.ops.channelizer import XlatBank
    from radiocapture_tpu.ops.fir import _phase_step_u32, _u32_to_angle

    n_sources, samp_rate, c = 128, 2.4e6, 64
    bank = XlatBank.for_rates(c, samp_rate, 12.5e3)
    p, d = bank.p, bank.decim
    n_out = 2500
    block = d * n_out
    rng = np.random.default_rng(0)
    offs = ((np.arange(c) - 32) * 25e3 / samp_rate).astype(np.float32)

    # baseline operands (as in kernel_lab)
    rows = n_out + p - 1
    z2 = jnp.asarray(rng.standard_normal(
        (n_sources, rows, 2 * d)).astype(np.float32))
    kk = np.arange(bank.ntaps, dtype=np.float64)
    g = (bank.taps * np.exp(2j * np.pi
                            * offs[:, None].astype(np.float64) * kk))
    grev = np.ascontiguousarray(g[:, ::-1].T)
    cpu = dict(backend="cpu")
    g2 = np.asarray(jax.device_get(jax.jit(
        _pk.fused_tap_matrix, static_argnames=("p", "d"), **cpu)(
        grev.real.astype(np.float32), grev.imag.astype(np.float32),
        p=p, d=d)))
    step_u = np.asarray(jax.device_get(jax.jit(
        _phase_step_u32, static_argnums=(1,), **cpu)(offs, d)))
    rot0, rowph = [np.asarray(jax.device_get(a)) for a in jax.jit(
        _pk.fused_rotation_tables, static_argnums=(2,), **cpu)(
        np.zeros((c,), np.uint32), step_u, n_out)]

    @jax.jit
    def baseline(z2, g2, rot0, rowph):
        f = lambda z: _pk.bank_fused_pallas(z, g2, rot0, rowph, p, d)
        return jax.vmap(f)(z2)

    # ---- two-level proxies ----
    # stage 1: hop-48 M=64 PFB windowing (P1=10 branch taps) + DFT-64.
    n1 = block // 48                       # 5000 output rows / source
    k1 = 10 * 128                          # P1 * (64 complex = 128 lanes)
    w1 = jnp.asarray(rng.standard_normal(
        (n_sources * n1, k1)).astype(np.float32)).astype(jnp.bfloat16)
    t1 = jnp.asarray(rng.standard_normal(
        (k1, 128)).astype(np.float32)).astype(jnp.bfloat16)
    dft = jnp.asarray(rng.standard_normal(
        (128, 128)).astype(np.float32)).astype(jnp.bfloat16)

    @jax.jit
    def stage1(w1, t1, dft):
        v = jnp.dot(w1, t1, preferred_element_type=jnp.float32)
        return jnp.dot(v.astype(jnp.bfloat16), dft,
                       preferred_element_type=jnp.float32)

    # mixer/fine proxies run at quarter batch (HBM headroom with w1
    # resident) and are scaled x4 in the verdict: both are bandwidth-
    # bound elementwise/conv passes, linear in batch.
    n_mix = n_sources // 4
    sel = jnp.asarray(rng.standard_normal(
        (n_mix * c, n1, 2)).astype(np.float32))
    stepm = jnp.asarray(np.tile(step_u, n_mix))

    @jax.jit
    def mixer(sel, stepm):
        ramp = (stepm[:, None]
                * jnp.arange(n1, dtype=jnp.uint32)[None, :])
        a = _u32_to_angle(ramp)
        cr, sr = jnp.cos(a), jnp.sin(a)
        re = sel[..., 0] * cr - sel[..., 1] * sr
        im = sel[..., 0] * sr + sel[..., 1] * cr
        return jnp.stack([re, im], -1)

    # fine: 32-tap decim-2 shared-tap FIR over every slot stream
    ftaps = jnp.asarray(rng.standard_normal(32).astype(np.float32))

    @jax.jit
    def fine(sel, ftaps):
        z = sel[..., 0]                        # one plane; x2 below
        y = jax.lax.conv_general_dilated(
            z[:, None, :], ftaps[None, None, :], window_strides=(2,),
            padding="VALID", dimension_numbers=("NCH", "OIH", "NCH"))
        return y

    def timeit(fn, *args, n=5):
        out = fn(*args)
        leaves = jax.tree.leaves(out)
        float(jnp.sum(leaves[-1].ravel()[-1]).astype(jnp.float32))
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        leaves = jax.tree.leaves(out)
        float(jnp.sum(leaves[-1].ravel()[-1]).astype(jnp.float32))
        return (time.perf_counter() - t0) / n * 1e3

    runs = {k: [] for k in ("baseline", "stage1", "mixer", "fine")}
    for rnd in range(5):
        runs["baseline"].append(timeit(baseline, z2, g2, rot0, rowph))
        runs["stage1"].append(timeit(stage1, w1, t1, dft))
        runs["mixer"].append(timeit(mixer, sel, stepm))
        runs["fine"].append(timeit(fine, sel, ftaps))
        print(f"  round {rnd}: " + "  ".join(
            f"{k}={v[-1]:.2f}" for k, v in runs.items()), flush=True)
    agg = n_sources * block / 1e6
    print()
    for k, v in runs.items():
        med = sorted(v)[len(v) // 2]
        print(f"{k:9s}: median {med:7.2f} ms")
    two = (sorted(runs['stage1'])[2] + 4 * sorted(runs['mixer'])[2]
           + 8 * sorted(runs['fine'])[2])
    print(f"\ntwo-level floor (stage1 + 4x mixer + 4x 2-plane fine): "
          f"{two:.2f} ms  vs baseline "
          f"{sorted(runs['baseline'])[2]:.2f} ms "
          f"(agg {agg:.0f} MS per step)")


if __name__ == "__main__":
    main()

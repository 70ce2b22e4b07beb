"""Layout A/B at the full bench shape (see kernel_lab.py)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(variant, n_sources=128):
    import jax
    import jax.numpy as jnp
    from radiocapture_tpu.ops import pallas_channelizer as _pk
    from radiocapture_tpu.ops.channelizer import XlatBank, XlatBankState
    from radiocapture_tpu.ops.fir import _phase_step_u32
    from radiocapture_tpu.ops import fm as _fm
    from radiocapture_tpu.frontend.pipeline import _batched_fir
    from radiocapture_tpu.demod.fsk4 import boxcar_taps

    samp_rate, c = 2.4e6, 64
    bank = XlatBank.for_rates(c, samp_rate, 12.5e3)
    p, d = bank.p, bank.decim
    n_out = 2500
    offs = ((np.arange(c) - 32) * 25e3 / samp_rate).astype(np.float32)
    rng = np.random.default_rng(0)
    xw = jnp.asarray(rng.standard_normal(
        (n_sources, n_out * d, 2)).astype(np.float32))
    sym_taps = boxcar_taps(samp_rate / d, 4800.0)
    nt = len(sym_taps)
    disc_gain = float(samp_rate / d / (2 * np.pi * 600.0))

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
    phase0 = np.zeros((c,), np.uint32)
    rot0p, rowphp = [np.asarray(jax.device_get(a)) for a in jax.jit(
        _pk.fused_rotation_tables, static_argnums=(2,), **cpu)(
        phase0, step_u, n_out)]

    def one_a(x2):
        st = XlatBankState(
            history=jnp.zeros((bank.ntaps - 1,), jnp.complex64),
            phase=jnp.zeros((c,), jnp.uint32))
        _, y = bank.call_wire(st, x2, jnp.asarray(offs))  # [C, N] c64
        _, disc = _fm.quadrature_demod(
            _fm.quad_demod_init(batch_shape=(c,)), y, disc_gain)
        _, filt = _batched_fir(
            jnp.zeros((c, nt - 1), jnp.float32), disc,
            jnp.asarray(sym_taps), stride=2)
        return filt                                       # [C, N/2]

    def one_b(x2):
        rows_l = n_out + p - 1
        hist2 = jnp.zeros((bank.ntaps - 1, 2), jnp.float32)
        z2f = jnp.concatenate([hist2, x2], axis=0)
        zf = z2f[: rows_l * d].reshape(rows_l, 2 * d)
        y_re, y_im = _pk.bank_fused_pallas(zf, jnp.asarray(g2),
                                           jnp.asarray(rot0p),
                                           jnp.asarray(rowphp), p, d,
                                           transpose_out=False)
        y_re, y_im = y_re[:n_out], y_im[:n_out]           # [N, C] planes
        pr = jnp.concatenate([y_re[:1] * 0, y_re[:-1]], axis=0)
        pi = jnp.concatenate([y_im[:1] * 0, y_im[:-1]], axis=0)
        dre = y_re * pr + y_im * pi
        dim = y_im * pr - y_re * pi
        disc = disc_gain * jnp.arctan2(dim, dre)          # [N, C]
        m = (n_out - nt + 1) // 2
        filt = sum(float(sym_taps[k]) * jax.lax.slice_in_dim(
            disc, k, k + 2 * m, stride=2, axis=0)
            for k in range(nt))                           # [N/2, C]
        return filt

    fn = jax.jit(jax.vmap(one_a if variant == "a" else one_b))
    out = fn(xw)
    float(jnp.sum(out[..., -1, :] if variant == "b"
                  else out[..., -1]).astype(jnp.float32))
    t0 = time.perf_counter()
    n = 10
    for _ in range(n):
        out = fn(xw)
    float(jnp.sum(out[..., -1, :] if variant == "b"
                  else out[..., -1]).astype(jnp.float32))
    ms = (time.perf_counter() - t0) / n * 1e3
    agg = n_sources * n_out * d / 1e6
    print(f"variant {variant}: {ms:7.2f} ms  "
          f"({agg / ms * 1e3:7.1f} MS/s thru-fir)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "a",
         int(sys.argv[2]) if len(sys.argv) > 2 else 128)

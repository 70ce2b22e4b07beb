"""Bank-kernel variant lab: time bank_fused_pallas alone at the bench
shape under different tile sizes / body formulations.

Not part of the product path — the measurement harness behind PERF.md.
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
    from radiocapture_tpu.ops.fir import _phase_step_u32

    n_sources = 128
    samp_rate = 2.4e6
    num_slots = 64
    bank = XlatBank.for_rates(num_slots, samp_rate, 12.5e3)
    p, d, c = bank.p, bank.decim, num_slots
    n_out = 2500
    block = d * n_out
    print(f"p={p} d={d} c={c} ntaps={bank.ntaps} n_out={n_out}")

    rng = np.random.default_rng(0)
    offs = ((np.arange(num_slots) - num_slots // 2)
            * 25e3 / samp_rate).astype(np.float32)
    offs_j = jnp.asarray(offs)

    rows = n_out + p - 1
    z2 = jnp.asarray(rng.standard_normal(
        (n_sources, rows, 2 * d)).astype(np.float32))

    # tap matrix + rotation tables (shared across variants)
    kk = np.arange(bank.ntaps, dtype=np.float64)
    g = (bank.taps * np.exp(2j * np.pi * offs[:, None] * kk[None, :]))
    grev = np.ascontiguousarray(g[:, ::-1].T)      # [K, C]
    # host numpy so closures embed without a device->host fetch (the
    # tunneled backend can't copy device arrays back at trace time)
    g2 = np.asarray(jax.device_get(jax.jit(
        _pk.fused_tap_matrix, static_argnames=("p", "d"), backend="cpu")(
        grev.real.astype(np.float32), grev.imag.astype(np.float32),
        p=p, d=d)))
    step_u = np.asarray(jax.device_get(jax.jit(
        _phase_step_u32, static_argnums=(1,), backend="cpu")(offs, d)))
    phase0 = np.zeros((c,), np.uint32)

    def timeit(fn, *args, n=10):
        out = fn(*args)
        jax.block_until_ready(out)
        leaves = jax.tree.leaves(out)
        float(jnp.sum(leaves[-1][..., -1]).astype(jnp.float32))
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        leaves = jax.tree.leaves(out)
        float(jnp.sum(leaves[-1][..., -1]).astype(jnp.float32))
        return (time.perf_counter() - t0) / n * 1e3

    # Interleaved round-robin: the tunneled device's throughput drifts
    # minute-to-minute, so variants are timed in alternating rounds and
    # compared by median — never by separate runs.
    variants = [("default", dict(out_bf16=True)),
                ("dims-arbitrary", dict(out_bf16=True,
                                        dim_semantics="arbitrary")),
                ("dims-parallel", dict(out_bf16=True,
                                       dim_semantics="parallel"))]
    rot0, rowph = _pk.fused_rotation_tables(phase0, step_u, n_out)

    fns = []
    for name, kw in variants:
        def mk(kw):
            @jax.jit
            def run(z2, g2, rot0, rowph):
                f = lambda z: _pk.bank_fused_pallas(
                    z, g2, rot0, rowph, p, d, **kw)
                return jax.vmap(f)(z2)
            return run
        fns.append((name, mk(kw)))

    results = {name: [] for name, _ in fns}
    for rnd in range(5):
        for name, fn in fns:
            ms = timeit(fn, z2, g2, rot0, rowph, n=5)
            results[name].append(ms)
            print(f"  r{rnd} {name}: {ms:.2f}", flush=True)
    agg = n_sources * block / 1e6
    for name, _ in fns:
        r = sorted(results[name])
        med = r[len(r) // 2]
        print(f"{name:12s}: median {med:7.2f} ms  ({agg / med * 1e3:7.1f}"
              f" MS/s)   runs {['%.1f' % v for v in results[name]]}")


if __name__ == "__main__":
    main()

"""Full-step A/B of one channelizer knob at the bench shape.

Usage: python tools/bench_ab.py [--rounds N] [--knob ingest|chunk|out_bf16]

Exactly one knob differs between the A and B pipelines:
  ingest    A = float32 input blocks, B = bfloat16 input blocks (default)
  chunk     A = single fat dot (pallas_chunk=0), B = pallas_chunk=5
  out_bf16  A = float32 plane outputs, B = bfloat16 plane outputs

The two programs are timed in interleaved rounds; report median and min
(the tunneled device's throughput drifts minute-to-minute and the
minimum is the least contended estimate — PERF.md §0).
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(rounds=6, knob="ingest"):
    import jax
    import jax.numpy as jnp
    from radiocapture_tpu.frontend.pipeline import ControlPipeline

    dev = jax.devices()[0]
    n_sources, samp_rate, num_slots = 128, 2.4e6, 64

    def build(chunk=0, out_bf16=True):
        pipe = ControlPipeline.p25_c4fm(num_slots=num_slots,
                                        samp_rate=samp_rate)
        pipe.bank.pallas_chunk = chunk
        pipe.bank.pallas_out_bf16 = out_bf16
        return pipe

    # (name, pipeline, input-dtype) per arm; names carry the varied knob
    if knob == "ingest":
        pipes = [("f32-in", build(), "f32"), ("bf16-in", build(), "bf16")]
    elif knob == "chunk":
        pipes = [("chunk0", build(chunk=0), "bf16"),
                 ("chunk5", build(chunk=5), "bf16")]
    elif knob == "out_bf16":
        pipes = [("out-f32", build(out_bf16=False), "bf16"),
                 ("out-bf16", build(out_bf16=True), "bf16")]
    else:
        raise SystemExit(f"unknown knob {knob!r}")

    block = pipes[0][1].decim * 2500
    rng = np.random.default_rng(0)
    x = jax.device_put(rng.standard_normal(
        (n_sources, block, 2)).astype(np.float32), dev)
    offs = jax.device_put(jnp.asarray(np.tile(
        ((np.arange(num_slots) - num_slots // 2)
         * 25e3 / samp_rate).astype(np.float32), (n_sources, 1))), dev)

    xb = jax.device_put(
        jnp.asarray(np.asarray(x)).astype(jnp.bfloat16), dev)
    progs = []
    for name, pipe, in_dtype in pipes:
        state = jax.device_put(jax.tree.map(
            lambda l: jnp.broadcast_to(l, (n_sources,) + l.shape),
            pipe.init()), dev)
        step = jax.jit(jax.vmap(pipe._step_impl), donate_argnums=(0,))
        progs.append([name, step, state, xb if in_dtype == "bf16" else x])

    def measure(prog, n=5):
        name, step, state, xin = prog
        state, out = step(state, xin, offs)
        float(jnp.sum(out[0][..., -1]).astype(jnp.float32))
        t0 = time.perf_counter()
        for _ in range(n):
            state, out = step(state, xin, offs)
        float(jnp.sum(out[0][..., -1]).astype(jnp.float32))
        prog[2] = state
        return (time.perf_counter() - t0) / n * 1e3

    runs = {p[0]: [] for p in progs}
    for rnd in range(rounds):
        for prog in progs:
            ms = measure(prog)
            runs[prog[0]].append(ms)
            print(f"  r{rnd} {prog[0]}: {ms:.2f}", flush=True)
    agg = n_sources * block / 1e6
    print()
    for name, v in runs.items():
        s = sorted(v)
        print(f"{name:10s}: median {s[len(s) // 2]:6.2f} ms "
              f"({agg / s[len(s) // 2] * 1e3:7.1f} MS/s)   "
              f"min {s[0]:6.2f} ms ({agg / s[0] * 1e3:7.1f} MS/s)")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--knob", default="ingest",
                    choices=("ingest", "chunk", "out_bf16"))
    # legacy positional rounds arg
    ap.add_argument("pos_rounds", nargs="?", type=int, default=None)
    a = ap.parse_args()
    main(a.pos_rounds if a.pos_rounds is not None else a.rounds, a.knob)

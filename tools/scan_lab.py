"""fsk4 tracking-scan variant lab at the bench shape ([128*64, 1250]).

Interleaved round-robin medians (tunneled device drifts); variants must
first pass the CPU equivalence check in tests/test_ops_fm_resample.py /
test_c4fm_chain.py before being timed here.
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
    from radiocapture_tpu.demod import fsk4 as _fsk4

    B, n = 128 * 64, 1250
    fs, sym = 12500.0, 4800.0
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, n)).astype(np.float32) * 2)

    def make(fn, **kw):
        @jax.jit
        def run(x):
            st = _fsk4.fsk4_init(batch_shape=(B,))
            st2, (ys, valid) = fn(st, x, fs, sym, **kw)
            return ys, valid.astype(jnp.int32)
        return run

    variants = [("exact", make(_fsk4.fsk4_demod)),
                ("bf16", make(_fsk4.fsk4_demod,
                              track_dtype=jnp.bfloat16)),
                ("blk25", make(_fsk4.fsk4_demod_block, block=25))]

    def timeit(fn, *args, n_it=5):
        out = fn(*args)
        float(jnp.sum(jax.tree.leaves(out)[0].ravel()[-1])
              .astype(jnp.float32))
        t0 = time.perf_counter()
        for _ in range(n_it):
            out = fn(*args)
        float(jnp.sum(jax.tree.leaves(out)[0].ravel()[-1])
              .astype(jnp.float32))
        return (time.perf_counter() - t0) / n_it * 1e3

    runs = {k: [] for k, _ in variants}
    for rnd in range(5):
        for k, fn in variants:
            runs[k].append(timeit(fn, x))
            print(f"  r{rnd} {k}: {runs[k][-1]:.2f}", flush=True)
    for k, v in runs.items():
        print(f"{k:8s}: median {sorted(v)[len(v) // 2]:.2f} ms")


if __name__ == "__main__":
    main()

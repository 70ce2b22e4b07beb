"""Measure the bench calibration op's reference time (bench.CAL_REF_MS).

Runs the fixed-FLOPs calibration chain in many windows and prints the
per-window samples + min/median. CAL_REF_MS should be set to the
**minimum median observed across several sessions at different hours**
— the least-contended estimate of the op's true cost on this hardware.
Re-run whenever the op shape or the hardware generation changes.

Usage: python tools/cal_ref.py [windows]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(windows=12, cal_iter=5):
    import jax
    import jax.numpy as jnp

    import bench

    dev = jax.devices()[0]
    cal_fn, cal_y, cal_w = bench.build_calibration(jax, jnp, dev)
    float(jnp.sum(cal_fn(cal_y, cal_w).astype(jnp.float32)))  # compile

    samples = []
    for i in range(windows):
        t0 = time.perf_counter()
        for _ in range(cal_iter):
            y = cal_fn(cal_y, cal_w)
        float(jnp.sum(y.astype(jnp.float32)))
        ms = (time.perf_counter() - t0) / cal_iter * 1e3
        samples.append(ms)
        print(f"  w{i}: {ms:.3f} ms", flush=True)
    s = sorted(samples)
    flop = bench.CAL_CHAIN * 2 * bench.CAL_N ** 3
    print(f"min {s[0]:.3f} ms  median {s[len(s) // 2]:.3f} ms  "
          f"(ideal {flop / 197e12 * 1e3:.2f} ms at 197 bf16 TFLOP/s)")
    print(f"current bench.CAL_REF_MS = {bench.CAL_REF_MS}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 12)

"""Device-mesh sharding of the capture pipelines.

The reference scales by processes: one per dongle, one per system demod,
one per call recorder, across hosts glued by ZMQ/Redis (SURVEY.md §2.2).
The TPU-native scaling axes are a 2-D ``jax.sharding.Mesh``:

- ``source`` axis — data parallel over wideband sources (the reference's
  "one process per dongle", rc_frontend/receiver.py:67-70). Each source's
  wideband block and its slot pool live on one mesh row.
- ``slot`` axis — model/tensor parallel over channel slots within a
  source: the xlat bank's per-slot modulated taps are sharded on the conv
  output-feature dimension, so each device computes its slot subset
  (the reference's per-channel flowgraph fan-out, channel.py:29-38).

Time/sequence parallelism (the reference's unbounded IQ stream, SURVEY.md
§5.7) is ``time_sharded_fir``: the block's time axis is sharded across
devices and each shard pulls its ``K-1``-sample filter halo from its left
neighbor with ``lax.ppermute`` inside ``shard_map`` — overlap-save with
ICI boundary exchange instead of GNU Radio scheduler history.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from radiocapture_tpu.frontend.pipeline import (
    ControlPipeline, ControlPipelineState)


def make_mesh(n_devices: int | None = None,
              axis_names: tuple[str, str] = ("source", "slot")) -> Mesh:
    """A 2-D mesh over the first ``n_devices`` devices; the source axis
    gets the largest factor ≤ √n so both axes are populated when possible."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    a = 1
    for d in range(int(np.sqrt(n)), 0, -1):
        if n % d == 0:
            a = d
            break
    return Mesh(np.asarray(devs).reshape(a, n // a), axis_names)


def state_specs(src: str | None = "source", slot: str | None = "slot"
                ) -> ControlPipelineState:
    """PartitionSpec pytree for a multi-source ``ControlPipelineState``
    with a leading [n_sources] axis on every leaf.

    States are wire-encoded (utils.wire): complex leaves carry a trailing
    [..., 2] re/im axis, which PartitionSpec leaves implicitly replicated
    (specs shorter than rank extend with None)."""
    from radiocapture_tpu.demod.fsk4 import Fsk4State
    from radiocapture_tpu.ops.channelizer import XlatBankState
    from radiocapture_tpu.ops.fm import QuadDemodState
    return ControlPipelineState(
        bank=XlatBankState(history=P(src, None), phase=P(src, slot)),
        quad=QuadDemodState(prev=P(src, slot)),
        sym_hist=P(src, slot, None),
        fsk4=Fsk4State(clock=P(src, slot), fine_freq=P(src, slot),
                       hist=P(src, slot, None)),
    )


class ShardedControlStep:
    """Multi-source, mesh-sharded control pipeline step.

    Wraps ``ControlPipeline.step`` with a leading ``n_sources`` batch axis
    (``vmap``) and jits it with NamedShardings so GSPMD partitions the
    xlat-bank conv over slot features and the whole batch over sources —
    the full dp×tp capture step the driver dry-runs multi-chip.
    """

    def __init__(self, pipeline: ControlPipeline, mesh: Mesh,
                 n_sources: int):
        self.pipeline = pipeline
        self.mesh = mesh
        self.n_sources = n_sources
        src, slot = mesh.axis_names

        def sh(spec):
            return NamedSharding(mesh, spec)

        st_specs = state_specs(src, slot)
        self.state_shardings = jax.tree.map(sh, st_specs,
                                            is_leaf=lambda x: isinstance(
                                                x, P))
        self.x_sharding = sh(P(src, None))
        self.off_sharding = sh(P(src, slot))
        out_sh = (self.state_shardings,
                  (sh(P(src, slot, None)), sh(P(src, slot, None)),
                   sh(P(src, slot, None))))
        self._step = jax.jit(
            jax.vmap(pipeline._step_impl),
            in_shardings=(self.state_shardings, self.x_sharding,
                          self.off_sharding),
            out_shardings=out_sh,
            donate_argnums=(0,))

    def init(self) -> ControlPipelineState:
        st = jax.tree.map(
            lambda l: jnp.broadcast_to(l, (self.n_sources,) + l.shape),
            self.pipeline.init())
        return jax.device_put(st, self.state_shardings)

    def step(self, state, x, offsets_norm):
        """x: [n_sources, T]; offsets_norm: [n_sources, num_slots]."""
        return self._step(state, x, offsets_norm)


def time_sharded_fir(mesh: Mesh, axis: str, taps: jax.Array,
                     decim: int = 1):
    """Overlap-save FIR with the time axis sharded over ``axis``.

    Returns a function ``f(x)`` for ``x: [T]`` sharded as ``P(axis)``;
    each shard fetches its K-1-sample left halo from the previous shard
    via ``ppermute`` (zeros flow into shard 0 — causal start), computes a
    valid conv, and the result is ``[T//decim]`` sharded the same way.
    """
    k = taps.shape[0]
    n_shards = mesh.shape[axis]
    hrev = taps[::-1]

    def local(x_local):
        # Send my *last* K-1 samples right; receive my left neighbor's.
        halo = jax.lax.ppermute(
            x_local[-(k - 1):], axis,
            perm=[(i, i + 1) for i in range(n_shards - 1)])
        z = jnp.concatenate([halo, x_local])
        if jnp.iscomplexobj(x_local):
            zr = jnp.stack([z.real, z.imag])[None]
            eye = jnp.eye(2, dtype=jnp.float32)
            kern = eye[:, :, None] * hrev[None, None, :].astype(jnp.float32)
            out = jax.lax.conv_general_dilated(
                zr.astype(jnp.float32), kern, window_strides=(decim,),
                padding="VALID", dimension_numbers=("NCH", "OIH", "NCH"))[0]
            return (out[0] + 1j * out[1]).astype(jnp.complex64)
        out = jax.lax.conv_general_dilated(
            z[None, None].astype(jnp.float32),
            hrev[None, None].astype(jnp.float32),
            window_strides=(decim,), padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"))
        return out[0, 0]

    in_spec = P(axis)
    f = jax.shard_map(local, mesh=mesh, in_specs=(in_spec,),
                      out_specs=in_spec, check_vma=False)
    return jax.jit(f)

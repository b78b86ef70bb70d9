"""Pallas frame extraction: windows at arbitrary sample offsets, DMA-fast.

``wav[starts[m] : starts[m] + size]`` for 15k frames is a 32M-element
gather in XLA (~7.5 ns/element ≈ 240 ms for a 3-minute track at 2048/512).
As DMAs it is pure bandwidth (~2 ms): one double-buffered copy per frame
from the padded waveform's (rows, 128) view, realigned in-register with
two dynamic lane rolls + a carry select (the same fetch stage as
kernels/pallas_columns.py, without the DFT).  Used by the phase-vocoder's
analysis stage, where frame positions are irregular (variable analysis
hop); the uniform-hop STFT has its own fused kernel (pallas_stft.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


MAX_FRAMES = 200_000  # the starts scalar-prefetch array must fit SMEM (1 MB)


def supported(size: int, n_frames: int | None = None) -> bool:
    ok = size % 128 == 0 and size // 128 >= 8
    if n_frames is not None:
        ok = ok and n_frames <= MAX_FRAMES
    return ok


def _kernel(starts_ref, wav_hbm, o_ref, slab, sems, *, n2):
    m = pl.program_id(0)
    n_frames = pl.num_programs(0)
    n_rows = n2 + 8

    def _copy(frame, slot):
        row0 = jax.lax.div(starts_ref[frame], 128)
        return pltpu.make_async_copy(
            wav_hbm.at[pl.ds(row0, n_rows)], slab.at[slot], sems.at[slot]
        )

    @pl.when(m == 0)
    def _():
        _copy(0, 0).start()

    @pl.when(m + 1 < n_frames)
    def _():
        _copy(m + 1, (m + 1) % 2).start()

    _copy(m, m % 2).wait()

    rem = jax.lax.rem(starts_ref[m], 128)
    cur = slab[m % 2]
    lane = jax.lax.broadcasted_iota(jnp.int32, (n_rows, 128), 1)
    sh = jax.lax.rem(128 - rem, 128)
    a_same = pltpu.roll(cur, sh, 1)
    a_next = pltpu.roll(pltpu.roll(cur, n_rows - 1, 0), sh, 1)
    o_ref[0] = jnp.where(lane + rem < 128, a_same, a_next)[:n2]


@partial(jax.jit, static_argnames=("size", "interpret"))
def extract_frames_pallas(
    wav: jnp.ndarray,
    starts: jnp.ndarray,
    size: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """(F, size) frames ``wav[starts[m] : starts[m]+size]``, zero beyond n.

    ``starts`` must be int32 in [0, n) — callers clip (the PV analysis
    already clamps its positions).
    """
    assert supported(size), size
    n2 = size // 128
    n = wav.shape[0]
    f = starts.shape[0]
    n_rows = n2 + 8
    total = 128 * -(-(n + size + n_rows * 128) // 128)
    wavp = jnp.zeros((total,), jnp.float32)
    wavp = jax.lax.dynamic_update_slice(wavp, wav.astype(jnp.float32), (0,))
    wav2d = wavp.reshape(total // 128, 128)
    starts_c = jnp.clip(starts.astype(jnp.int32), 0, max(n - 1, 0))

    out = pl.pallas_call(
        partial(_kernel, n2=n2),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(f,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (1, n2, 128), lambda m, s: (m, 0, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((2, n_rows, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((f, n2, 128), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=0,
            bytes_accessed=f * 4 * (n_rows * 128 + size),
            transcendentals=0,
        ),
        interpret=interpret,
    )(starts_c, wav2d)
    return out.reshape(f, size)

"""Pallas granular-render kernel — the speed-of-light export path.

The XLA formulation (engine/render.render_device) is bound by its two
per-sample waveform gathers (~7.5 ns/element: ~115 ms for a 3-minute song).
This kernel removes them: each render step reads its grain ONCE as a
double-buffered DMA (grains are contiguous by construction), realigns it
in-register, and resamples with *lane gathers* — `take_along_axis` along a
128-lane row is a native VPU op, so the per-sample interpolation costs
vector ALU instead of HBM transactions.

Per step s (one grid program):

* DMA ``wav[grain_start[s] : +GMAX+256]`` into a VMEM slab; realign the
  sub-128 remainder with two dynamic lane rolls + carry select
  (pallas_frames.py's fetch stage) → flat grain ``G`` as (rows, 128).
* ``H`` = G shifted by one sample (one more roll pair) so the lerp's upper
  tap — including the next-grain seam, which IS ``wav[src+1]`` for tiling
  grains (see render_device) — needs no second fetch.
* ``idx = floor(i * rate)`` splits into (row, lane); a static loop over the
  33 grain rows selects each element's row via compare-masks and lane-
  gathers within it.  33 x (64, 128) VPU passes ≈ microseconds.
* The step writes its own (SZMAX,) output block (step-major), zero beyond
  ``sz``.

Step outputs then *compact* into the flat track with an XLA fori_loop of
dynamic-update-slices at the plan offsets: ascending order makes each
step's zero tail self-healing (the next step overwrites it), so the
variable-length concatenation costs two sequential HBM passes, no scatter.

Constraints (host-checked; engine/render falls back to render_device):
``grain_len < GMAX`` and ``sz <= SZMAX`` — i.e. grains under ~4094 samples
and pitch bends above -29 semitones, far outside musical use.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .lane_gather import lerp_rows, realign, shift_one

GMAX_CAP = 4096  # largest supported grain length + seam tap
SZMAX_CAP = 8192  # largest supported per-step output span


def _buckets(plan):
    """Static (gmax, szmax) powers of two sized to the plan (less VMEM, less
    intermediate HBM; one compile per bucket pair)."""
    gmax = 1024
    while gmax <= int(plan.grain_len.max()) + 1:
        gmax *= 2
    szmax = 1024
    while szmax < int(plan.sz.max()):
        szmax *= 2
    return gmax, szmax


def _kernel(gs_ref, rate_ref, sz_ref, wav_hbm, o_ref, slab, sems, *, gmax, szmax):
    g_rows = gmax // 128 + 2
    sz_rows = szmax // 128
    s = pl.program_id(0)
    n_steps = pl.num_programs(0)

    def _copy(step, slot):
        row0 = jax.lax.div(gs_ref[step], 128)
        return pltpu.make_async_copy(
            wav_hbm.at[pl.ds(row0, g_rows)], slab.at[slot], sems.at[slot]
        )

    @pl.when(s == 0)
    def _():
        _copy(0, 0).start()

    @pl.when(s + 1 < n_steps)
    def _():
        _copy(s + 1, (s + 1) % 2).start()

    _copy(s, s % 2).wait()

    # Realign the slab so flat element k is wav[grain_start + k].
    g = realign(slab[s % 2], jax.lax.rem(gs_ref[s], 128), g_rows)
    hsh = shift_one(g, g_rows)

    rate = rate_ref[s]
    sz = sz_ref[s]
    i2 = (
        jax.lax.broadcasted_iota(jnp.int32, (sz_rows, 128), 0) * 128
        + jax.lax.broadcasted_iota(jnp.int32, (sz_rows, 128), 1)
    )
    x = i2.astype(jnp.float32) * rate  # f32(i) * rate — reference arithmetic
    idx_f = jnp.floor(x)
    frac = x - idx_f
    idx = jnp.clip(idx_f.astype(jnp.int32), 0, gmax)
    # rows 0..gmax/128 cover idx in [0, gmax]
    val = lerp_rows(g, hsh, idx, frac, sz_rows, gmax // 128 + 1)
    o_ref[0] = jnp.where(i2 < sz, val, 0.0)


@partial(jax.jit, static_argnames=("gmax", "szmax", "interpret"))
def _render_steps(wav2d, gs, rate, sz, gmax, szmax, interpret=False):
    n_steps = gs.shape[0]
    g_rows = gmax // 128 + 2
    sz_rows = szmax // 128
    return pl.pallas_call(
        partial(_kernel, gmax=gmax, szmax=szmax),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(n_steps,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (1, sz_rows, 128), lambda s, a, b, c: (s, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2, g_rows, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n_steps, sz_rows, 128), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=n_steps * szmax * 8,
            bytes_accessed=n_steps * 4 * (g_rows * 128 + szmax),
            transcendentals=0,
        ),
        interpret=interpret,
    )(gs, rate, sz, wav2d)


@partial(jax.jit, static_argnames=("out_len", "szmax"))
def _compact(vals, offsets, out_len: int, szmax: int):
    """Step-major (S, SZMAX) blocks → flat track at the plan offsets.

    Ascending dynamic-update-slices: each step's zero tail is overwritten
    by its successor, so only the final step's tail (real trailing zeros)
    survives.  Two HBM passes, no scatter.
    """
    out0 = jnp.zeros(out_len + szmax, jnp.float32)

    def body(s, out):
        v = jax.lax.dynamic_slice(vals, (s, 0), (1, szmax))[0]
        return jax.lax.dynamic_update_slice(out, v, (offsets[s],))

    out = jax.lax.fori_loop(0, vals.shape[0], body, out0)
    return out[:out_len]


MAX_STEPS = 24576  # 3 scalar-prefetch arrays must fit SMEM (1 MB)


def args_for(plan, wav_np, out_len: int):
    """Public dispatch helper: device operands + buckets for this kernel.

    Shared by engine/render.render and bench.py so the argument marshalling
    and bucketing live in one place.
    """
    import numpy as np

    from ..engine.render import render_device_args

    _, gs, _, _, _, fix_idx, fix_val = render_device_args(plan, wav_np, out_len)
    gmax, szmax = _buckets(plan)
    args = (
        jnp.asarray(gs),
        jnp.asarray(plan.rate.astype(np.float32)),
        jnp.asarray(plan.sz, jnp.int32),
        jnp.asarray(plan.out_offset[:-1], jnp.int32),
        out_len,
        jnp.asarray(fix_idx),
        jnp.asarray(fix_val),
    )
    return args, gmax, szmax


def plan_supported(plan) -> bool:
    """Kernel limits (host-checked): grain + seam tap within the caps.
    Plans beyond MAX_STEPS render in chunks (see plan_chunks)."""
    if plan.n_steps == 0:
        return False
    return int(plan.grain_len.max()) < GMAX_CAP and int(plan.sz.max()) <= SZMAX_CAP


def plan_chunks(plan, max_steps: int = MAX_STEPS):
    """Step-slices [(lo, hi, out_start, out_end)] each fitting SMEM.

    The scalar-prefetch arrays cap one kernel launch at ~25 minutes of
    audio; longer plans render as independent chunks — steps write disjoint
    output spans, so each chunk compacts its own [out_start, out_end) and
    the host assembles the slices.
    """
    spans = []
    lo = 0
    while lo < plan.n_steps:
        hi = min(lo + max_steps, plan.n_steps)
        spans.append(
            (lo, hi, int(plan.out_offset[lo]), int(plan.out_offset[hi]))
        )
        lo = hi
    return spans


@partial(jax.jit, static_argnames=("out_len", "gmax", "szmax", "interpret"))
def granular_render_pallas(
    wav: jnp.ndarray,
    gstart: jnp.ndarray,  # int32 (S,)
    rate: jnp.ndarray,  # float32 (S,)
    sz: jnp.ndarray,  # int32 (S,)
    offsets: jnp.ndarray,  # int32 (S,) output start per step
    out_len: int,
    fix_idx: jnp.ndarray,
    fix_val: jnp.ndarray,
    gmax: int = GMAX_CAP,
    szmax: int = SZMAX_CAP,
    interpret: bool = False,
) -> jnp.ndarray:
    n = wav.shape[0]
    g_rows = gmax // 128 + 2
    total = 128 * -(-(n + gmax + g_rows * 128) // 128)
    wavp = jnp.zeros((total,), jnp.float32)
    wavp = jax.lax.dynamic_update_slice(wavp, wav.astype(jnp.float32), (0,))
    wav2d = wavp.reshape(total // 128, 128)
    vals = _render_steps(wav2d, gstart, rate, sz, gmax, szmax, interpret=interpret)
    out = _compact(vals.reshape(vals.shape[0], szmax), offsets, out_len, szmax)
    return out.at[fix_idx].set(fix_val, mode="drop")

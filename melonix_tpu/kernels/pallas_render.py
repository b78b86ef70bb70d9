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

Step outputs then *compact* into the flat track with the block-compact
kernel (compact_pallas below): output blocks select and place the few
step rows overlapping them, reproducing — bit-exactly — the semantics of
an ascending fori_loop of dynamic-update-slices at the plan offsets
(each step's zero tail self-heals under its successor).  The fori form
(_compact) is kept as the reference twin: at ~2.9 us of serial HBM
round-trip per grain it was 15 of the 19 ms render.

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

from .lane_gather import lerp_rows, place_at, realign, shift_one

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
    and bucketing live in one place.  Offsets stay on the HOST —
    render_pallas_full builds the per-block step map from them and the
    compact kernel scalar-prefetches its own copy.
    """
    import numpy as np

    from ..engine.render import render_device_args

    _, gs, _, _, _, fix_idx, fix_val = render_device_args(plan, wav_np, out_len)
    gmax, szmax = _buckets(plan)
    args = (
        jnp.asarray(gs),
        jnp.asarray(plan.rate.astype(np.float32)),
        jnp.asarray(plan.sz, jnp.int32),
        plan.out_offset[:-1],
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


def render_pallas_full(
    wav: jnp.ndarray,
    gstart: jnp.ndarray,
    rate: jnp.ndarray,
    sz: jnp.ndarray,
    offsets_np,  # HOST int32 (S,) — block map computed here
    out_len: int,
    fix_idx: jnp.ndarray,
    fix_val: jnp.ndarray,
    gmax: int = GMAX_CAP,
    szmax: int = SZMAX_CAP,
    interpret: bool = False,
) -> jnp.ndarray:
    """granular_render_pallas with the block-compact kernel (the fori-loop
    compact costs ~2.9 us/step; this is the production path).  Needs the
    offsets on the host to build the per-block step map."""
    import numpy as np

    offsets_np = np.asarray(offsets_np, np.int64)
    nb = -(-out_len // CBLK)
    # Steps parked at/after out_len (hour-scale chunk padding) never
    # contribute; excluding them keeps the last block's kmax honest.
    n_map = int(np.searchsorted(offsets_np, out_len, side="left"))
    a0, cnt, kmax = compact_blocks(offsets_np[:max(n_map, 1)], nb)
    kmax = max(1, 1 << (kmax - 1).bit_length())
    return _render_full(
        wav, gstart, rate, sz, jnp.asarray(offsets_np, jnp.int32),
        jnp.asarray(a0), jnp.asarray(cnt), out_len, fix_idx, fix_val,
        gmax, szmax, kmax, interpret,
    )


@partial(jax.jit, static_argnames=("out_len", "gmax", "szmax", "kmax", "interpret"))
def _render_full(
    wav, gstart, rate, sz, offsets, a0, cnt, out_len, fix_idx, fix_val,
    gmax, szmax, kmax, interpret=False,
):
    n = wav.shape[0]
    g_rows = gmax // 128 + 2
    total = 128 * -(-(n + gmax + g_rows * 128) // 128)
    wavp = jnp.zeros((total,), jnp.float32)
    wavp = jax.lax.dynamic_update_slice(wavp, wav.astype(jnp.float32), (0,))
    wav2d = wavp.reshape(total // 128, 128)
    vals = _render_steps(wav2d, gstart, rate, sz, gmax, szmax, interpret=interpret)
    out = compact_pallas(
        vals.reshape(vals.shape[0], szmax), offsets, a0, cnt, out_len, szmax,
        kmax, interpret=interpret,
    )
    return out.at[fix_idx].set(fix_val, mode="drop")


# ----------------------------------------------------------------------
# Block compaction: step-major (S, szmax) values -> flat track.
#
# The ascending fori_loop of dynamic-update-slices costs ~2.9 us per
# step on v5e (15 ms for a 3-minute track's 5.2k grains — 4x the render
# kernel itself): each iteration is a serial device round through HBM.
# This kernel inverts the loop into output blocks: block b selects, for
# each of the (few) steps overlapping it, the step's value row DMA'd
# from HBM, placed at its in-block offset (lane_gather.place_at), with
# ascending-k overwrite reproducing the fori loop's last-step-wins
# semantics (including the self-healing zero tails) bit-exactly.
# ----------------------------------------------------------------------

CBLK = 2048  # output samples per compact block
CBLK_ROWS = CBLK // 128


def compact_blocks(offsets: "np.ndarray", nb: int):
    """Host: per-block (first step, live count) for arbitrary ascending
    offsets.  Unlike pallas_resample.pv_anchor_blocks (which relies on
    every block start being an anchor), the upper bound is an explicit
    searchsorted — a step landing in a block's tail is still counted.
    """
    import numpy as np

    offsets = np.asarray(offsets, np.int64)
    starts = np.arange(nb, dtype=np.int64) * CBLK
    a0 = np.clip(
        np.searchsorted(offsets, starts, side="right") - 1, 0, None
    ).astype(np.int32)
    hi = np.searchsorted(offsets, starts + CBLK, side="left").astype(np.int32)
    cnt = np.maximum(hi - a0, 0).astype(np.int32)
    kmax = int(cnt.max()) if nb else 1
    return a0, cnt, kmax


def _compact_kernel(
    a0_ref, cnt_ref, off_ref, vals_hbm, o_ref, slab, sems, *, kmax, szmax,
    n_steps,
):
    b = pl.program_id(0)
    j_base = b * CBLK
    # +8 rows: +1 for the realign lane spill, rounded to the sublane tile
    # (Mosaic's DYNAMIC row rotate — place_at's offset shift — requires an
    # 8-aligned row count; static-shift rolls do not).
    n_rows = CBLK_ROWS + 8
    sz_rows = szmax // 128

    def _src(k):
        s = jnp.minimum(a0_ref[b] + k, n_steps - 1)
        start_local = off_ref[s] - j_base
        p0 = s * szmax + jnp.maximum(0, -start_local)
        return s, start_local, p0

    for k in range(kmax):  # all issued up front; DMA waits overlap
        _, _, p0 = _src(k)
        row0 = jnp.clip(jax.lax.div(p0, 128), 0, n_steps * sz_rows - 1)
        pltpu.make_async_copy(
            vals_hbm.at[pl.ds(row0, n_rows)], slab.at[k], sems.at[k]
        ).start()

    lane2 = (
        jax.lax.broadcasted_iota(jnp.int32, (n_rows, 128), 0) * 128
        + jax.lax.broadcasted_iota(jnp.int32, (n_rows, 128), 1)
    )
    pos = jnp.zeros((n_rows, 128), jnp.float32)
    for k in range(kmax):
        s, start_local, p0 = _src(k)
        pltpu.make_async_copy(
            vals_hbm.at[pl.ds(jnp.clip(jax.lax.div(p0, 128), 0,
                                       n_steps * sz_rows - 1), n_rows)],
            slab.at[k], sems.at[k],
        ).wait()
        g = realign(slab[k], jax.lax.rem(p0, 128), n_rows)
        j0 = jnp.maximum(0, start_local)
        placed = place_at(g, j0, n_rows)
        # A step owns exactly its szmax-long value row: past it the slab
        # holds the NEXT step's rows (the fori reference leaves zeros
        # there, healed by later steps where they exist).
        live = jnp.logical_and(
            k < cnt_ref[b],
            jnp.logical_and(lane2 >= j0, lane2 < start_local + szmax),
        )
        pos = jnp.where(live, placed, pos)
    o_ref[0] = pos[:CBLK_ROWS]


@partial(jax.jit, static_argnames=("out_len", "szmax", "kmax", "interpret"))
def compact_pallas(
    vals: jnp.ndarray,  # (S, szmax) step-major render values
    offsets: jnp.ndarray,  # int32 (S,) ascending output start per step
    a0: jnp.ndarray,  # int32 (NB,) first step per block (pv_anchor_blocks)
    cnt: jnp.ndarray,  # int32 (NB,) live steps per block
    out_len: int,
    szmax: int,
    kmax: int,
    interpret: bool = False,
) -> jnp.ndarray:
    n_steps = vals.shape[0]
    nb = -(-out_len // CBLK)
    # Guard rows: the last step's block-sized DMA reads up to CBLK_ROWS+8
    # rows past its own span.
    vals2d = jnp.pad(
        vals.reshape(n_steps * (szmax // 128), 128),
        ((0, CBLK_ROWS + 8), (0, 0)),
    )
    out = pl.pallas_call(
        partial(_compact_kernel, kmax=kmax, szmax=szmax, n_steps=n_steps),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(nb,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (1, CBLK_ROWS, 128), lambda b, *_: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((kmax, CBLK_ROWS + 8, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((kmax,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((nb, CBLK_ROWS, 128), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=nb * CBLK * kmax * 4,
            bytes_accessed=4 * nb * (kmax * (CBLK_ROWS + 8) * 128 + CBLK),
            transcendentals=0,
        ),
        interpret=interpret,
    )(a0, cnt, offsets, vals2d)
    return out.reshape(nb * CBLK)[:out_len]

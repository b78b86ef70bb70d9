"""Shared lane-gather machinery for Pallas resampling kernels.

The trickiest in-kernel code in the repo (CLAUDE.md): slab realignment via
dynamic rolls + carry select, the one-sample-shifted upper-tap view, and
the row-select / 128-lane take_along_axis interpolation loop.  Used by
kernels/pallas_render.py (granular) and kernels/pallas_resample.py (PV
tail) — keep ONE copy so a fix lands in both.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu


def realign(cur: jnp.ndarray, rem, rows: int) -> jnp.ndarray:
    """Shift a (rows, 128) slab left by ``rem`` flat elements.

    After this, flat element k of the result is flat element k + rem of the
    input — i.e. a slab DMA'd from a 128-aligned row becomes exactly the
    window starting at the requested (unaligned) sample.
    """
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
    sh = jax.lax.rem(128 - rem, 128)
    a_same = pltpu.roll(cur, sh, 1)
    a_next = pltpu.roll(pltpu.roll(cur, rows - 1, 0), sh, 1)
    return jnp.where(lane + rem < 128, a_same, a_next)


def shift_one(g: jnp.ndarray, rows: int) -> jnp.ndarray:
    """H[h, l] = G_flat[128h + l + 1] — the lerp's upper tap view."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
    h_lane = pltpu.roll(g, 127, 1)
    h_carry = pltpu.roll(h_lane, rows - 1, 0)
    return jnp.where(lane < 127, h_lane, h_carry)


def lerp_rows(
    g: jnp.ndarray,
    hsh: jnp.ndarray,
    rel: jnp.ndarray,
    frac: jnp.ndarray,
    out_rows: int,
    n_src_rows: int,
):
    """(1-frac)*G_flat[rel] + frac*G_flat[rel+1] for rel in (out_rows, 128).

    Row-select compare masks + width-128 take_along_axis per source row —
    the only vector-gather form Mosaic supports; each pass is a native VPU
    op, so the whole loop costs ALU, not HBM.
    """
    row = rel >> 7
    lanei = rel & 127
    lo = jnp.zeros((out_rows, 128), jnp.float32)
    hi = jnp.zeros((out_rows, 128), jnp.float32)
    for h in range(n_src_rows):
        sel = row == h
        g_row = jnp.broadcast_to(g[h][None, :], (out_rows, 128))
        h_row = jnp.broadcast_to(hsh[h][None, :], (out_rows, 128))
        lo = jnp.where(sel, jnp.take_along_axis(g_row, lanei, axis=1), lo)
        hi = jnp.where(sel, jnp.take_along_axis(h_row, lanei, axis=1), hi)
    return (1.0 - frac) * lo + frac * hi


def place_at(g: jnp.ndarray, j0, rows: int) -> jnp.ndarray:
    """F_flat[j] = G_flat[j - j0] for j >= j0 (garbage below — mask it).

    The inverse of :func:`realign`: shifts a flat-aligned slab RIGHT by
    ``j0`` elements (dynamic), so a span can be placed at an arbitrary
    offset inside an output block.  Three rolls + one select.
    """
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
    r = jax.lax.rem(j0, 128)
    d = jax.lax.div(j0, 128)
    b_same = pltpu.roll(g, r, 1)
    a_cur = pltpu.roll(b_same, d, 0)
    a_prev = pltpu.roll(b_same, d + 1, 0)
    return jnp.where(lane >= r, a_cur, a_prev)

"""Fused phase-vocoder analysis/synthesis kernels (four-step MXU DFTs).

The PV stretch loop spends most of its device time in two XLA FFT passes
plus a per-frame gather fetch (measured on v5e for a 3-minute track at
2048/512: fetch 3.5 ms + window+rfft 6.5 ms + packed irfft 6.3 ms of a
17.9 ms chunk).  These kernels replace them:

* ``analysis``: per-frame DMA fetch at arbitrary starts (the lane-gather
  realign of kernels/pallas_frames.py, G frames per grid step) + window +
  forward DFT, all in VMEM — the (F, 2048) frame matrix never touches HBM.
* ``synth_ola``: mag/psi -> sincos -> inverse DFT -> window -> streaming
  hop-aligned overlap-add (a 128-lane accumulator with a (size - hop)-row
  carry across the sequential grid) — the whole iSTFT tail in one kernel;
  neither the synthesis frame matrix nor the pre-OLA signal touch HBM.

**Both work in scrambled bin order.**  The four-step (Bailey) DFT with
N = N1 * N2, N1 = 128 on the LANE axis (Mosaic rejects lane-splitting
reshapes; the natural (16, 128) view of a 2048-sample frame is free)
produces bins as Z[k2, k1] = bin ``k2 + 16*k1`` — i.e. the flat output
column ``j`` holds bin ``(j // 128) + 16 * (j % 128)``.  Unscrambling
in-kernel would force 16-lane transposed tiles (measured slower than XLA
in an earlier attempt); instead the *entire per-bin phase pipeline*
(magnitude, atan2, princarg, the frame-axis cumsum, sincos) is
elementwise over bins, so it simply runs in scrambled order with
scrambled omega/bin-index vectors (:func:`scrambled_bins`), and the
inverse kernel consumes the scrambled spectrum directly — its output
IS natural time order (x[n1 + 128*n2] == the (16, 128) row-major view).
No transpose exists anywhere in the pipeline.

The full 2048-bin spectrum is carried (not the 1025-bin half): Hermitian
pairs stay exact mirrors through the phase math (atan2/mod/cumsum are
sign-symmetric), and the inverse takes the real part at the final stage,
which also drops non-Hermitian DC/Nyquist imaginaries exactly like a c2r
inverse.  Negative-frequency bins (k > N/2) use signed omega.

Matmul precision: the four-step's contractions are short (16 and 128),
so split-operand 3-pass bf16 dots (kernels/bf16x3.py) hold ~-96 dB vs
float64 (measured; a DENSE 2048-contraction DFT at bf16x3 is only
-59 dB — factorization is what keeps the error down) at 2x the MXU
throughput of Precision.HIGHEST.

Reference scope: replaces the spectral analysis/synthesis *mechanics* of
the added-capability PV engine only; numeric semantics (phase
propagation, OLA weights) are unchanged from engine/phase_vocoder.py.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import bf16x3

N1 = 128  # lane-axis factor
N2 = 16  # sublane-axis factor
G = 64  # frames per grid step
MAX_FRAMES = 200_000  # starts scalar-prefetch must fit SMEM



def _vma_of(*xs) -> frozenset:
    """Union of the operands' varying-manual-axes (vma).

    Inside ``jax.shard_map(check_vma=True)`` a ``pallas_call``'s
    ``out_shape`` must declare which mesh axes the output varies over —
    the union of its operands' — or the composition is rejected with
    "vma must not be None".  Outside shard_map every input's vma is the
    empty frozenset and the annotation is a no-op (verified on Mosaic and
    interpret).  This is what lets the fused kernels run INSIDE the real
    sharded programs (parallel/sharded.py) without check_vma=False.
    """
    vma: frozenset = frozenset()
    for x in xs:
        try:
            vma |= jax.typeof(x).vma
        except Exception:
            pass
    return vma


def supported(size: int, n_frames: int | None = None) -> bool:
    ok = size == N1 * N2
    if n_frames is not None:
        ok = ok and n_frames % G == 0 and n_frames <= MAX_FRAMES
    return ok


def scrambled_bins(size: int) -> np.ndarray:
    """int32 (size,): natural bin index held by each scrambled column."""
    j = np.arange(size, dtype=np.int64)
    return ((j // N1) + N2 * (j % N1)).astype(np.int32)


def scrambled_omega(size: int) -> np.ndarray:
    """float32 (size,): signed angular frequency per scrambled column.

    Bins above Nyquist are negative frequencies; their expected phase
    advance per sample is negative (the natural-order path only ever sees
    k <= N/2, where signed == unsigned)."""
    k = scrambled_bins(size).astype(np.int64)
    ks = np.where(k <= size // 2, k, k - size)
    return (2.0 * np.pi / size * ks).astype(np.float32)


@lru_cache(maxsize=8)
def fourstep_consts(size: int, n2: int, sign: float, scale2: float = 1.0):
    """Four-step DFT constants for N = (size//n2) * n2, bf16x3-pre-split.

    Returns (c2, s2, ct, st, c1, s1): the (n2, n2) small-stage pair, the
    (n2, n1) twiddle, and the (n1, n1) big-stage pair — valid for BOTH
    directions because cos/sin of ``k*m`` products are index-symmetric;
    ``sign`` picks forward (-1) or inverse (+1), and ``scale2`` folds a
    normalization (e.g. 1/N for the inverse) into the small-stage pair.

        X[k2 + n2*k1] = sum_{n1} W_N^{s k2 n1} W_{N1}^{s k1 n1}
                        sum_{m2} x[n1 + n1_sz*m2] W_{N2}^{s k2 m2}

    Shared by the PV analysis/synthesis kernels (n2=16) and the pitch
    autocorrelation kernel (n2=32) — one copy of the twiddle math.
    """
    n1 = size // n2
    sp = bf16x3.split_np
    k2, m2 = np.meshgrid(np.arange(n2), np.arange(n2), indexing="ij")
    a2 = sign * 2.0 * np.pi * (k2 * m2 % n2) / n2
    tk2, tn1 = np.meshgrid(np.arange(n2), np.arange(n1), indexing="ij")
    at = sign * 2.0 * np.pi * (tk2 * tn1 % size) / size
    m1, k1 = np.meshgrid(np.arange(n1), np.arange(n1), indexing="ij")
    a1 = sign * 2.0 * np.pi * (m1 * k1 % n1) / n1
    return (
        sp((np.cos(a2) * scale2).astype(np.float32)),
        sp((np.sin(a2) * scale2).astype(np.float32)),
        np.cos(at).astype(np.float32), np.sin(at).astype(np.float32),
        sp(np.cos(a1).astype(np.float32)), sp(np.sin(a1).astype(np.float32)),
    )


def _fwd_consts(size: int):
    """Forward constants in kernel order (c2, s2, ct, st, c1, s1)."""
    return fourstep_consts(size, N2, -1.0)


def _inv_consts(size: int):
    """Inverse constants in kernel order (c1, s1, ct, st, c2/N, s2/N)."""
    c2, s2, ct, st, c1, s1 = fourstep_consts(size, N2, 1.0, 1.0 / size)
    return (c1, s1, ct, st, c2, s2)


# ----------------------------------------------------------------------
# Analysis: DMA fetch + window + forward DFT
# ----------------------------------------------------------------------


_d3 = bf16x3.dot


def _fwd_dft(x, c2, s2, ct, st, c1, s1, exact):
    """Four-step forward DFT of a (G, 16, 128) frame block -> scrambled
    (G, 16, 128) re/im.

    Matmuls carry the frame axis in their ROW dimension — batched
    (16,16)@(16,128) einsums leave the 128x128 MXU at 1/8 utilization
    (measured 4.3 ms vs 1.05 ms for this merged form on v5e):
    stage 1 is one (16, 16) @ (16, G*128) dot, stage 2 one
    (16G, 128) @ (128, 128) dot per re/im term.
    """
    d3 = partial(_d3, exact=exact)
    xt = x.swapaxes(0, 1).reshape(N2, G * N1)  # [n2, g*n1]
    xs = bf16x3.split(xt)
    yr = d3(c2, xs).reshape(N2, G, N1)  # [k2, g, n1]
    yi = d3(s2, xs).reshape(N2, G, N1)
    ct3, st3 = ct[:, None], st[:, None]  # twiddle broadcasts over g
    tr = yr * ct3 - yi * st3
    ti = yr * st3 + yi * ct3
    trs = bf16x3.split(tr.reshape(N2 * G, N1))
    tis = bf16x3.split(ti.reshape(N2 * G, N1))
    re = (d3(trs, c1) - d3(tis, s1)).reshape(N2, G, N1)
    im = (d3(trs, s1) + d3(tis, c1)).reshape(N2, G, N1)
    return re.swapaxes(0, 1), im.swapaxes(0, 1)  # [g, k2, k1]


def _ana_kernel(
    starts_ref, wav_hbm, win_ref,
    c2h, c2l, s2h, s2l, cth, sth, c1h, c1l, s1h, s1l,
    re_ref, im_ref, slabs, frames, sems, *, n_rows, exact,
):
    b = pl.program_id(0)
    nb = pl.num_programs(0)

    def _copy(blk, slot, g):
        row0 = jax.lax.div(starts_ref[blk * G + g], 128)
        return pltpu.make_async_copy(
            wav_hbm.at[pl.ds(row0, n_rows)], slabs.at[slot, g], sems.at[slot, g]
        )

    # Block-level double buffering: step b waits on the copies issued at
    # step b-1 (slot b%2) and prefetches block b+1 into the other slot, so
    # the HBM reads overlap the previous block's DFT matmuls.
    @pl.when(b == 0)
    def _():
        for g in range(G):
            _copy(0, 0, g).start()

    @pl.when(b + 1 < nb)
    def _():
        for g in range(G):
            _copy(b + 1, (b + 1) % 2, g).start()

    # Realign on the minimal 17-row window (16 rows of frame + 1 row of
    # lane spill), deriving the row-shifted operand from the already
    # lane-rolled one (the rolls commute) — one lane roll + one row roll
    # per frame instead of two+one on the full slab (~2x less VPU work;
    # realign is the kernel's second-largest cost after the DFT).
    nr = N2 + 1
    lane = jax.lax.broadcasted_iota(jnp.int32, (nr, 128), 1)
    slot = b % 2
    for g in range(G):
        _copy(b, slot, g).wait()
        rem = jax.lax.rem(starts_ref[b * G + g], 128)
        cur = slabs[slot, g][:nr]
        sh = jax.lax.rem(128 - rem, 128)
        a_same = pltpu.roll(cur, sh, 1)
        a_next = pltpu.roll(a_same, nr - 1, 0)
        frames[g] = jnp.where(lane + rem < 128, a_same, a_next)[:N2]

    x = frames[...] * win_ref[...][None]  # (G, n2=16, n1=128) windowed
    re, im = _fwd_dft(
        x, (c2h[...], c2l[...]), (s2h[...], s2l[...]), cth[...], sth[...],
        (c1h[...], c1l[...]), (s1h[...], s1l[...]), exact,
    )
    re_ref[...] = re
    im_ref[...] = im


@partial(jax.jit, static_argnames=("size", "interpret"))
def analysis(
    wav: jnp.ndarray,
    starts: jnp.ndarray,
    window: jnp.ndarray,
    size: int,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(re, im) float32 (F, size) — scrambled-order DFT of windowed frames.

    Frame m covers ``wav[starts[m] : starts[m]+size)`` (zeros past the
    end; starts are clipped into range like pallas_frames).  Column j of
    the output holds natural bin ``scrambled_bins(size)[j]``.
    """
    assert supported(size, starts.shape[0]), (size, starts.shape)
    f = starts.shape[0]
    n = wav.shape[0]
    n_rows = N2 + 1  # 16 frame rows + 1 row of lane spill (rem > 0)
    total = 128 * -(-(n + size + n_rows * 128) // 128)
    wavp = jnp.zeros((total,), jnp.float32)
    wavp = jax.lax.dynamic_update_slice(wavp, wav.astype(jnp.float32), (0,))
    wav2d = wavp.reshape(total // 128, 128)
    starts_c = jnp.clip(starts.astype(jnp.int32), 0, max(n - 1, 0))
    (c2, s2, ct, st, c1, s1) = _fwd_consts(size)
    mats = (*c2, *s2, ct, st, *c1, *s1)
    win2d = jnp.asarray(window, jnp.float32).reshape(N2, N1)

    const_spec = lambda shape: pl.BlockSpec(
        shape, lambda *_: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    mat_specs = [
        const_spec((N2, N2)), const_spec((N2, N2)),
        const_spec((N2, N2)), const_spec((N2, N2)),
        const_spec((N2, N1)), const_spec((N2, N1)),
        const_spec((N1, N1)), const_spec((N1, N1)),
        const_spec((N1, N1)), const_spec((N1, N1)),
    ]
    out = pl.pallas_call(
        partial(_ana_kernel, n_rows=n_rows, exact=interpret),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(f // G,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                const_spec((N2, N1)),
                *mat_specs,
            ],
            out_specs=[
                pl.BlockSpec((G, N2, N1), lambda b, s: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((G, N2, N1), lambda b, s: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, G, n_rows, 128), jnp.float32),
                pltpu.VMEM((G, N2, N1), jnp.float32),
                pltpu.SemaphoreType.DMA((2, G)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((f, N2, N1), jnp.float32,
                                 vma=_vma_of(wav2d, starts_c)),
            jax.ShapeDtypeStruct((f, N2, N1), jnp.float32,
                                 vma=_vma_of(wav2d, starts_c)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=f * (2 * N2 * N2 * N1 + 4 * N2 * N1 * N1) * 2 * 3,
            bytes_accessed=f * 4 * (n_rows * 128 + 2 * size),
            transcendentals=0,
        ),
        interpret=interpret,
    )(starts_c, wav2d, win2d, *[jnp.asarray(m) for m in mats])
    return out[0].reshape(f, size), out[1].reshape(f, size)


# ----------------------------------------------------------------------
# Synthesis: sincos + inverse DFT + window
# ----------------------------------------------------------------------


def _syn_body(mag, psi, win, mats, exact):
    """sincos + inverse four-step DFT + window: (G,16,128) time frames."""
    c1h, c1l, s1h, s1l, cth, sth, c2h, c2l, s2h, s2l = mats
    d3 = partial(_d3, exact=exact)
    re = mag * jnp.cos(psi)
    im = mag * jnp.sin(psi)
    # Stage A: contract k1 (lanes) — frame axis merged into matmul rows
    # (see _fwd_dft for why: batched 16-row matmuls waste 7/8 of the MXU).
    res = bf16x3.split(re.reshape(G * N2, N1))
    ims = bf16x3.split(im.reshape(G * N2, N1))
    c1s, s1s = (c1h, c1l), (s1h, s1l)
    wr = (d3(res, c1s) - d3(ims, s1s)).reshape(G, N2, N1).swapaxes(0, 1)
    wi = (d3(res, s1s) + d3(ims, c1s)).reshape(G, N2, N1).swapaxes(0, 1)
    # Twiddle in [k2, g, n1] layout.
    ct3, st3 = cth[:, None], sth[:, None]
    tr = wr * ct3 - wi * st3
    ti = wr * st3 + wi * ct3
    # Stage B: contract k2; REAL part only (this is what drops
    # non-Hermitian DC/Nyquist imaginaries, matching a c2r inverse).
    trs = bf16x3.split(tr.reshape(N2, G * N1))
    tis = bf16x3.split(ti.reshape(N2, G * N1))
    c2s, s2s = (c2h, c2l), (s2h, s2l)
    x = (d3(c2s, trs) - d3(s2s, tis)).reshape(N2, G, N1).swapaxes(0, 1)
    return x * win[None]


# ----------------------------------------------------------------------
# Uniform-hop |STFT| via the same four-step DFT (natural-order output)
# ----------------------------------------------------------------------


def _stft_kernel(
    rows_hbm, win_ref,
    c2h, c2l, s2h, s2l, cth, sth, c1h, c1l, s1h, s1l,
    out_ref, slab, frames, sem, *, hop_rows, scale, exact,
):
    i = pl.program_id(0)
    n_slab = G * hop_rows + N2
    copy = pltpu.make_async_copy(
        rows_hbm.at[pl.ds(i * G * hop_rows, n_slab)], slab, sem
    )
    copy.start()
    copy.wait()
    # Uniform 128-aligned hop: frame g IS slab rows [g*hop_rows, +16) —
    # static slices, no lane realign at all.
    for g in range(G):
        frames[g] = slab[g * hop_rows : g * hop_rows + N2]
    x = frames[...] * win_ref[...][None]
    re, im = _fwd_dft(
        x, (c2h[...], c2l[...]), (s2h[...], s2l[...]), cth[...], sth[...],
        (c1h[...], c1l[...]), (s1h[...], s1l[...]), exact,
    )
    mag = jnp.sqrt(re * re + im * im) * scale
    # Natural bins 0..N/2-1 live in scrambled lanes k1 < 64 (b = k2+16*k1).
    out_ref[...] = mag[:, :, : N1 // 2]


def stft_supported(size: int, hop: int) -> bool:
    return size == N1 * N2 and hop % 128 == 0 and hop <= size


@partial(jax.jit, static_argnames=("size", "hop", "n_frames", "scale", "interpret"))
def stft_mag_fourstep(
    wav: jnp.ndarray,
    window: jnp.ndarray,
    size: int,
    hop: int,
    n_frames: int,
    scale: float = 1.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """|STFT| * scale, natural bin order, (n_frames, size // 2) float32.

    Same contract as pallas_stft.stft_mag_pallas, but the DFT is the
    four-step factorization at bf16x3 (-96 dB vs float64; the dense
    matmul form needs 6-pass HIGHEST for the same bar and runs ~3x
    longer).  The kernel emits the scrambled half (F, 16, 64); natural
    order is one XLA transpose of that view (b = k2 + 16*k1 -> raster
    (k1, k2)), a pure bandwidth pass.
    """
    assert stft_supported(size, hop), (size, hop)
    hop_rows = hop // 128
    nf_pad = G * -(-n_frames // G)
    n_rows = nf_pad * hop_rows + N2
    rows = jnp.zeros((n_rows * 128,), jnp.float32)
    n_keep = min(wav.shape[0], n_rows * 128)
    rows = jax.lax.dynamic_update_slice(
        rows, wav[:n_keep].astype(jnp.float32), (0,)
    ).reshape(n_rows, 128)
    (c2, s2, ct, st, c1, s1) = _fwd_consts(size)
    mats = (*c2, *s2, ct, st, *c1, *s1)
    win2d = jnp.asarray(window, jnp.float32).reshape(N2, N1)
    const_spec = lambda shape: pl.BlockSpec(
        shape, lambda *_: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    mat_specs = [
        const_spec((N2, N2)), const_spec((N2, N2)),
        const_spec((N2, N2)), const_spec((N2, N2)),
        const_spec((N2, N1)), const_spec((N2, N1)),
        const_spec((N1, N1)), const_spec((N1, N1)),
        const_spec((N1, N1)), const_spec((N1, N1)),
    ]
    out = pl.pallas_call(
        partial(_stft_kernel, hop_rows=hop_rows, scale=float(scale),
                exact=interpret),
        grid=(nf_pad // G,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            const_spec((N2, N1)),
            *mat_specs,
        ],
        out_specs=pl.BlockSpec((G, N2, N1 // 2), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nf_pad, N2, N1 // 2), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((G * hop_rows + N2, 128), jnp.float32),
            pltpu.VMEM((G, N2, N1), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=nf_pad * size * (N2 + N1) * 2 * 2 * 3,
            bytes_accessed=4 * (n_rows * 128 + nf_pad * size // 2),
            transcendentals=nf_pad * size,
        ),
        interpret=interpret,
    )(rows, win2d, *[jnp.asarray(m) for m in mats])
    # (F, k2=16, k1=64) -> natural (F, 1024): bin b = k2 + 16*k1.
    return jnp.swapaxes(out, 1, 2).reshape(nf_pad, size // 2)[:n_frames]


# ----------------------------------------------------------------------
# Synthesis + in-kernel overlap-add (the full iSTFT tail in one kernel)
# ----------------------------------------------------------------------


def _syn_ola_kernel(
    mag_ref, psi_ref, win_ref,
    c1h, c1l, s1h, s1l, cth, sth, c2h, c2l, s2h, s2l,
    out_ref, acc, *, hop_rows, carry_rows, exact,
):
    i = pl.program_id(0)
    nb = pl.num_programs(0)
    out_rows = G * hop_rows

    @pl.when(i == 0)
    def _():
        acc[...] = jnp.zeros((out_rows + carry_rows, 128), jnp.float32)

    @pl.when(i != 0)
    def _():
        # Frames spilling past the previous step's span become this
        # step's head (the standard streaming-OLA carry).
        acc[0:carry_rows] = acc[pl.ds(out_rows, carry_rows)]
        acc[pl.ds(carry_rows, out_rows)] = jnp.zeros(
            (out_rows, 128), jnp.float32
        )

    @pl.when(i + 1 < nb)  # the last step only flushes the carry
    def _():
        mats = tuple(
            r[...] for r in (c1h, c1l, s1h, s1l, cth, sth, c2h, c2l, s2h, s2l)
        )
        x = _syn_body(mag_ref[...], psi_ref[...], win_ref[...], mats, exact)
        # Frame g covers rows [g*hop_rows, +16): static in-place adds —
        # the (F, 2048) frame matrix never exists in HBM.
        for g in range(G):
            r0 = g * hop_rows
            acc[r0 : r0 + N2] = acc[r0 : r0 + N2] + x[g]

    out_ref[...] = acc[0:out_rows][None]


@partial(jax.jit, static_argnames=("size", "hop", "interpret"))
def synth_ola(
    mag: jnp.ndarray,
    psi: jnp.ndarray,
    window: jnp.ndarray,
    size: int,
    hop: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Windowed-OLA synthesis from a scrambled mag/psi spectrum.

    Returns the unnormalized overlap-add signal, length
    ``(F // G + 1) * G * hop`` — sample j is exact for
    j < (F - 1) * hop + size (then zeros).  Fuses :func:`synth` with the
    hop-aligned streaming OLA (a 128-lane accumulator with a
    (size - hop)-row carry across the sequential grid), replacing the
    XLA ola_device pass and the (F, size) frame-matrix round-trip.
    """
    f = mag.shape[0]
    assert supported(size, f), (size, f)
    # hop == size (carry_rows == 0) would emit zero-length Mosaic slice
    # ops in the carry shift; _pv_fused_ok routes that config elsewhere.
    assert hop % 128 == 0 and size % hop == 0 and hop < size, (size, hop)
    hop_rows = hop // 128
    carry_rows = (size - hop) // 128
    (c1, s1, ct, st, c2, s2) = _inv_consts(size)
    mats = (*c1, *s1, ct, st, *c2, *s2)
    win2d = jnp.asarray(window, jnp.float32).reshape(N2, N1)
    const_spec = lambda shape: pl.BlockSpec(
        shape, lambda *_: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    mat_specs = [
        const_spec((N1, N1)), const_spec((N1, N1)),
        const_spec((N1, N1)), const_spec((N1, N1)),
        const_spec((N2, N1)), const_spec((N2, N1)),
        const_spec((N2, N2)), const_spec((N2, N2)),
        const_spec((N2, N2)), const_spec((N2, N2)),
    ]
    nb = f // G + 1  # one flush-only step drains the final carry
    clamp = lambda b: jnp.minimum(b, nb - 2)  # flush step re-reads block
    out = pl.pallas_call(
        partial(_syn_ola_kernel, hop_rows=hop_rows, carry_rows=carry_rows,
                exact=interpret),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((G, N2, N1), lambda b: (clamp(b), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, N2, N1), lambda b: (clamp(b), 0, 0),
                         memory_space=pltpu.VMEM),
            const_spec((N2, N1)),
            *mat_specs,
        ],
        out_specs=pl.BlockSpec((1, G * hop_rows, 128), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, G * hop_rows, 128), jnp.float32,
                                       vma=_vma_of(mag, psi)),
        scratch_shapes=[
            pltpu.VMEM((G * hop_rows + carry_rows, 128), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=f * (4 * N2 * N1 * N1 + 2 * N2 * N2 * N1) * 2 * 3,
            bytes_accessed=f * 4 * (2 * size + hop),
            transcendentals=f * 2 * size,
        ),
        interpret=interpret,
    )(
        mag.reshape(f, N2, N1), psi.reshape(f, N2, N1), win2d,
        *[jnp.asarray(m) for m in mats],
    )
    return out.reshape(nb * G * hop)


# ----------------------------------------------------------------------
# Phase propagation fused into synthesis: mag/phi -> OLA signal directly
# ----------------------------------------------------------------------


def _atan2(y, x):
    """Elementwise atan2 for Mosaic (KernelType.TC atan2 is unimplemented
    as of this jax) — Cephes atanf's octant reduction + degree-9 odd
    minimax, ~1-2 f32 ulp.  atan2(0, 0) returns 0 (silent bins)."""
    ax, ay = jnp.abs(x), jnp.abs(y)
    # t = tan(theta) folded into [0, 1] by swapping the legs.
    swap = ay > ax
    num = jnp.where(swap, ax, ay)
    den = jnp.where(swap, ay, ax)
    # Floor must be a NORMAL f32: subnormals flush to zero (0/0 = NaN
    # at silent bins); ratios of <1e-30 magnitudes carry no phase.
    t = num / jnp.maximum(den, 1e-30)
    # Cephes: fold [tan(pi/8), 1] down via t -> (t-1)/(t+1) + pi/4.
    fold = t > jnp.float32(0.4142135623730950)
    t2 = jnp.where(fold, (t - 1.0) / (t + 1.0), t)
    z = t2 * t2
    p = jnp.float32(8.05374449538e-2)
    p = p * z - jnp.float32(1.38776856032e-1)
    p = p * z + jnp.float32(1.99777106478e-1)
    p = p * z - jnp.float32(3.33329491539e-1)
    r = p * z * t2 + t2
    r = jnp.where(fold, r + jnp.float32(np.pi / 4), r)
    r = jnp.where(swap, jnp.float32(np.pi / 2) - r, r)
    r = jnp.where(x < 0.0, jnp.float32(np.pi) - r, r)
    return jnp.where(y < 0.0, -r, r)


def _lock_psis(mag3, phi3, psi3, kx):
    """Laroche–Dolson identity phase locking in SCRAMBLED bin order.

    Engine counterpart: :func:`engine.phase_vocoder.identity_lock` (same
    peak rule, same nearest-peak region split, same tie toward the lower
    peak) — on the full 2048-bin spectrum instead of the natural half
    (peak sets and regions are Hermitian-mirror symmetric, so pairs stay
    mirrors; ties and the handful of bins whose nearest peak sits across
    Nyquist resolve against the mirror image, which the final Re()
    projection of the inverse absorbs).

    Natural bin k = r + 16*c of the (G, N2, N1) block view [g, r, c]
    (flat column j holds bin (j // N1) + N2 * (j % N1)), so natural-
    consecutive bins run DOWN the 16-row sublane axis with a carry into
    the next lane.  Every natural-order neighbor/scan op is therefore a
    flat (G*N2, N1) sublane roll whose segment-head rows are patched
    from a lane-rolled twin — no transpose, no gather, no einsum (an
    (F, K) gather at 7.5 ns/element would cost more than the stretch).
    The nearest-peak fill is a standard 11-step log fill (Hillis-Steele)
    over the 2048-bin natural sequence, executed entirely in the
    scrambled layout: steps 1/2/4/8 as patched sublane rolls, steps
    16..1024 as pure lane rolls.  Peak positions ride as exact small
    floats (|k| < 2^11, NONE = -2^30 — both exact in f32), so the whole
    transform is rolls + selects: bit-deterministic, MXU-free.
    """
    f32 = jnp.float32
    size = N1 * N2
    gf = G * N2
    r3 = jax.lax.broadcasted_iota(jnp.int32, (G, N2, N1), 1)
    kxf = kx.astype(f32)[None]  # (1, N2, N1) natural bin index
    none = f32(-(1 << 30))
    big = f32(1 << 30)

    def shift_dn(x3, d, fill):
        # value of natural bin k-d at bin k (1 <= d <= 15)
        xf = x3.reshape(gf, N1)
        a = pltpu.roll(xf, d, 0).reshape(G, N2, N1)
        b = pltpu.roll(pltpu.roll(xf, 1, 1), d - N2 + gf, 0)
        out = jnp.where(r3 >= d, a, b.reshape(G, N2, N1))
        return jnp.where(kxf >= d, out, fill)

    def shift_up(x3, d, fill):
        # value of natural bin k+d at bin k (1 <= d <= 15)
        xf = x3.reshape(gf, N1)
        a = pltpu.roll(xf, gf - d, 0).reshape(G, N2, N1)
        b = pltpu.roll(pltpu.roll(xf, N1 - 1, 1), N2 - d, 0)
        out = jnp.where(r3 < N2 - d, a, b.reshape(G, N2, N1))
        return jnp.where(kxf <= size - 1 - d, out, fill)

    def lane_dn(x3, m, fill):
        # value of natural bin k-16m at bin k (pure lane roll)
        out = pltpu.roll(x3.reshape(gf, N1), m, 1).reshape(G, N2, N1)
        return jnp.where(kxf >= N2 * m, out, fill)

    def lane_up(x3, m, fill):
        out = pltpu.roll(x3.reshape(gf, N1), N1 - m, 1).reshape(G, N2, N1)
        return jnp.where(kxf <= size - 1 - N2 * m, out, fill)

    # Peak rule of identity_lock: strict below, ties-to-lower above.
    neg = f32(-1.0)
    peak = (
        (mag3 > 0.0)
        & (mag3 > shift_dn(mag3, 1, neg))
        & (mag3 >= shift_up(mag3, 1, neg))
        & (mag3 > shift_dn(mag3, 2, neg))
        & (mag3 >= shift_up(mag3, 2, neg))
    )
    theta = psi3 - phi3
    kx3 = jnp.broadcast_to(kxf, mag3.shape)

    def fill_scan(dn, lane):
        v = jnp.where(peak, theta, 0.0)
        p = jnp.where(peak, kx3, none)
        for d in (1, 2, 4, 8):
            cv, cp = dn(v, d, 0.0), dn(p, d, none)
            keep = p > none
            v, p = jnp.where(keep, v, cv), jnp.where(keep, p, cp)
        for m in (1, 2, 4, 8, 16, 32, 64):
            cv, cp = lane(v, m, 0.0), lane(p, m, none)
            keep = p > none
            v, p = jnp.where(keep, v, cv), jnp.where(keep, p, cp)
        return v, p

    v_f, p_f = fill_scan(shift_dn, lane_dn)
    v_b, p_b = fill_scan(shift_up, lane_up)
    d_f = jnp.where(p_f > none, kx3 - p_f, big)
    d_b = jnp.where(p_b > none, p_b - kx3, big)
    th = jnp.where(d_f <= d_b, v_f, v_b)
    has = jnp.minimum(d_f, d_b) < big
    return phi3 + jnp.where(has, th, theta)


def _syn_ola_phase_kernel(
    scal, a_ref, b_ref, da_ref, win_ref, om_ref, kx_ref,
    phi0_ref, res_ref, pprev_ref, tri_ref,
    c1h, c1l, s1h, s1l, cth, sth, c2h, c2l, s2h, s2l,
    out_ref, rout_ref, plast_ref, p0out_ref,
    acc, cphi, ccum, p0eff, *, hop_rows, carry_rows, size, hop, cart,
    exact, lock,
):
    i = pl.program_id(0)
    nb = pl.num_programs(0)
    out_rows = G * hop_rows
    m0 = scal[0]
    f_real = scal[1]
    last = scal[2]

    @pl.when(i == 0)
    def _():
        acc[...] = jnp.zeros((out_rows + carry_rows, 128), jnp.float32)
        cphi[...] = pprev_ref[...]
        ccum[...] = jnp.zeros((N2, N1), jnp.float32)
        rout_ref[...] = jnp.zeros((N2, N1), jnp.float32)
        plast_ref[...] = jnp.zeros((N2, N1), jnp.float32)

    @pl.when(i != 0)
    def _():
        acc[0:carry_rows] = acc[pl.ds(out_rows, carry_rows)]
        acc[pl.ds(carry_rows, out_rows)] = jnp.zeros(
            (out_rows, 128), jnp.float32
        )

    @pl.when(i + 1 < nb)  # the last step only flushes the OLA carry
    def _():
        if cart:
            # Straight from the analysis DFT: magnitude and phase never
            # exist in HBM either (the separate XLA sqrt/atan2 pass over
            # re/im was 0.75 ms for a 3-minute track); the VPU atan chain
            # hides under this kernel's MXU matmuls.
            re_blk = a_ref[...]
            im_blk = b_ref[...]
            mag_blk = jnp.sqrt(re_blk * re_blk + im_blk * im_blk)
            phi_blk = _atan2(im_blk, re_blk)
        else:  # formant path: XLA warps mag before the kernel
            mag_blk = a_ref[...]
            phi_blk = b_ref[...]
        g3 = jax.lax.broadcasted_iota(jnp.int32, (G, N2, N1), 0)

        # Previous-frame phase: shift the (G*N2, N1) view down one frame
        # (N2 sublanes, tile-aligned) and patch frame 0 with the carried
        # last frame of the previous block (phi_prev before block 0).
        prev3 = pltpu.roll(phi_blk.reshape(G * N2, N1), N2, 0).reshape(
            G, N2, N1
        )
        m0th = (g3 == 0).astype(jnp.float32)
        prev3 = prev3 * (1.0 - m0th) + cphi[...][None] * m0th

        # dphi = princarg(phi - prev - omega*da); incr = hop*dphi/da with
        # the global frame 0 forced to zero (it has no predecessor).
        da_b = da_ref[...][:, None, :] * jnp.ones_like(phi_blk)
        x = phi_blk - prev3 - om_ref[...][None] * da_b
        pi_f = jnp.float32(np.pi)
        dphi = jnp.mod(x + pi_f, jnp.float32(2.0 * np.pi)) - pi_f
        glob = g3 + i * G
        incr = jnp.float32(hop) * dphi / da_b
        incr = jnp.where(jnp.logical_and(m0 == 0, glob == 0), 0.0, incr)

        # Frame-axis prefix sum: lower-triangular matmul per block + a
        # (N2, N1) running carry across the sequential grid.  The ones
        # triangle is exact in bf16, so only the operand is bf16x3-split
        # (two MXU passes ~= Precision.HIGH, ~16 mantissa bits — ~1e-5
        # relative on the phase residual, far below the PV path's
        # intrinsic f32 chaos; a plain jnp.cumsum lowers to a log-depth
        # reduce-window costing ~2.9 ms of pure HBM traffic at this
        # size).
        xs = incr.swapaxes(0, 1)  # (N2, G, N1)
        tri = tri_ref[...]
        if exact:
            xh = xs.astype(jnp.float32)
            cum_s = jnp.einsum(
                "ij,bjl->bil", tri, xh,
                preferred_element_type=jnp.float32,
            )
        else:
            xh, xl = bf16x3.split(xs)
            trib = tri.astype(jnp.bfloat16)
            cum_s = jnp.einsum(
                "ij,bjl->bil", trib, xh,
                preferred_element_type=jnp.float32,
            ) + jnp.einsum(
                "ij,bjl->bil", trib, xl,
                preferred_element_type=jnp.float32,
            )
        cum = cum_s.swapaxes(0, 1)  # (G, N2, N1)
        resid3 = res_ref[...][None] + ccum[...][None] + cum
        ccum[...] = ccum[...] + cum[G - 1]
        cphi[...] = phi_blk[G - 1]

        @pl.when(i == 0)
        def _():
            p0eff[...] = jnp.where(m0 == 0, phi_blk[0], phi0_ref[...])
            p0out_ref[...] = p0eff[...]

        # psi_m = phi0 + (m*hop*omega mod 2pi) + resid, the ramp in exact
        # int32 arithmetic (f32 running phases hit ~1-ulp = 2 rad at
        # hour scale; size is a power of two so mod == mask).
        hm = jnp.bitwise_and((m0 + glob) * hop, size - 1)
        prod = jnp.bitwise_and(hm * kx_ref[...][None], size - 1)
        ramp = jnp.float32(2.0 * np.pi / size) * prod.astype(jnp.float32)
        psis = p0eff[...][None] + ramp + resid3

        if lock:
            # Identity phase locking (engine/phase_vocoder.identity_lock's
            # in-kernel twin): a pure per-frame transform of
            # (mag, phi, psi) — carried state (resid, phi_last) is
            # untouched, so chunking stays consistent with one-shot.
            psis = _lock_psis(mag_blk, phi_blk, psis, kx_ref[...])

        # Padded frames contribute silence (their OLA tails would reach
        # back into the real span).
        mag_live = jnp.where(glob < f_real, mag_blk, 0.0)

        # Carry out the resid and analysis-phase rows of the chunk's
        # last real frame.
        lmask = (glob == last).astype(jnp.float32)
        @pl.when(jnp.logical_and(last >= i * G, last < (i + 1) * G))
        def _():
            rout_ref[...] = jnp.sum(lmask * resid3, axis=0)
            plast_ref[...] = jnp.sum(lmask * phi_blk, axis=0)

        mats = tuple(
            r[...] for r in (c1h, c1l, s1h, s1l, cth, sth, c2h, c2l, s2h, s2l)
        )
        x_t = _syn_body(mag_live, psis, win_ref[...], mats, exact)
        for g in range(G):
            r0 = g * hop_rows
            acc[r0 : r0 + N2] = acc[r0 : r0 + N2] + x_t[g]

    out_ref[...] = acc[0:out_rows][None]


@partial(jax.jit, static_argnames=("size", "hop", "cart", "lock",
                                   "interpret"))
def synth_ola_phase(
    a: jnp.ndarray,
    b: jnp.ndarray,
    da: jnp.ndarray,
    window: jnp.ndarray,
    m0: jnp.ndarray,
    f_real: jnp.ndarray,
    phi0: jnp.ndarray,
    resid_in: jnp.ndarray,
    phi_prev: jnp.ndarray,
    size: int,
    hop: int,
    cart: bool = False,
    lock: bool = False,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """OLA synthesis straight from the scrambled analysis spectrum.

    ``(a, b)`` are ``(mag, phi)`` — or, with ``cart=True``, the raw
    ``(re, im)`` DFT output, in which case magnitude and phase are
    derived in-kernel (polynomial atan2; the separate XLA sqrt/atan2
    pass over the (F, size) spectrum was 0.75 ms for a 3-minute track
    and its output never needs to exist in HBM).

    Fuses the whole per-bin phase pipeline of
    ``engine.phase_vocoder._stretch_chunk_core`` — princarg residual,
    frame-axis prefix sum (blocked-triangle MXU matmul + sequential-grid
    carry), int32 mod-2pi ramp, live-frame masking — into
    :func:`synth_ola`'s streaming kernel, so neither ``psis`` nor
    ``mag_live`` (127 MB each for a 3-minute track) ever exists in HBM.
    Measured v5e: the replaced XLA glue (concat copies, fusions, the
    separate cumsum) was ~3.4 ms of a 13.7 ms render iteration.

    Returns ``(y_flat, resid_last, phi_last, phi0_eff)``: the
    unnormalized OLA signal (as :func:`synth_ola`), the carried
    phase-residual and analysis-phase rows of the chunk's last real
    frame, and the effective anchor phase.  Semantics are unchanged from
    the XLA pipeline (same formulas, same Precision class for the
    cumsum).
    """
    f = a.shape[0]
    assert supported(size, f), (size, f)
    assert size & (size - 1) == 0, size  # int32 ramp uses mod-as-mask
    assert hop % 128 == 0 and size % hop == 0 and hop < size, (size, hop)
    hop_rows = hop // 128
    carry_rows = (size - hop) // 128
    (c1, s1, ct, st, c2, s2) = _inv_consts(size)
    mats = (*c1, *s1, ct, st, *c2, *s2)
    win2d = jnp.asarray(window, jnp.float32).reshape(N2, N1)
    om2d = jnp.asarray(scrambled_omega(size)).reshape(N2, N1)
    kx2d = jnp.asarray(scrambled_bins(size)).reshape(N2, N1)
    tri = jnp.asarray(np.tril(np.ones((G, G), np.float32)))
    da128 = jnp.broadcast_to(
        jnp.maximum(da.astype(jnp.float32), 1e-3)[:, None], (f, 128)
    )
    f_real = jnp.asarray(f_real, jnp.int32)
    scal = jnp.stack(
        [jnp.asarray(m0, jnp.int32), f_real,
         jnp.clip(f_real - 1, 0, f - 1)]
    )
    const_spec = lambda shape: pl.BlockSpec(
        shape, lambda *_: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    mat_specs = [
        const_spec((N1, N1)), const_spec((N1, N1)),
        const_spec((N1, N1)), const_spec((N1, N1)),
        const_spec((N2, N1)), const_spec((N2, N1)),
        const_spec((N2, N2)), const_spec((N2, N2)),
        const_spec((N2, N2)), const_spec((N2, N2)),
    ]
    nb = f // G + 1  # one flush-only step drains the final carry
    clamp = lambda b: jnp.minimum(b, nb - 2)  # flush step re-reads block
    out, resid_last, phi_last, phi0_eff = pl.pallas_call(
        partial(_syn_ola_phase_kernel, hop_rows=hop_rows,
                carry_rows=carry_rows, size=size, hop=hop, cart=cart,
                exact=interpret, lock=lock),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((G, N2, N1), lambda b, s: (clamp(b), 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((G, N2, N1), lambda b, s: (clamp(b), 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((G, 128), lambda b, s: (clamp(b), 0),
                             memory_space=pltpu.VMEM),
                const_spec((N2, N1)),  # window
                const_spec((N2, N1)),  # omega
                const_spec((N2, N1)),  # bin index
                const_spec((N2, N1)),  # phi0
                const_spec((N2, N1)),  # resid_in
                const_spec((N2, N1)),  # phi_prev
                const_spec((G, G)),    # ones triangle
                *mat_specs,
            ],
            out_specs=[
                pl.BlockSpec((1, G * hop_rows, 128), lambda b, s: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                const_spec((N2, N1)),
                const_spec((N2, N1)),
                const_spec((N2, N1)),
            ],
            scratch_shapes=[
                pltpu.VMEM((G * hop_rows + carry_rows, 128), jnp.float32),
                pltpu.VMEM((N2, N1), jnp.float32),  # phi carry
                pltpu.VMEM((N2, N1), jnp.float32),  # cumsum carry
                pltpu.VMEM((N2, N1), jnp.float32),  # phi0_eff
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((nb, G * hop_rows, 128), jnp.float32,
                                 vma=_vma_of(a, b, da, phi0)),
            jax.ShapeDtypeStruct((N2, N1), jnp.float32,
                                 vma=_vma_of(a, b, da, phi0)),
            jax.ShapeDtypeStruct((N2, N1), jnp.float32,
                                 vma=_vma_of(a, b, da, phi0)),
            jax.ShapeDtypeStruct((N2, N1), jnp.float32,
                                 vma=_vma_of(a, b, da, phi0)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=f * (4 * N2 * N1 * N1 + 2 * N2 * N2 * N1) * 2 * 3
            + f * G * size * 2 * 2,
            bytes_accessed=f * 4 * (2 * size + 128 + hop),
            transcendentals=f * 2 * size,
        ),
        interpret=interpret,
    )(
        scal,
        a.reshape(f, N2, N1), b.reshape(f, N2, N1), da128, win2d,
        om2d, kx2d,
        jnp.asarray(phi0, jnp.float32).reshape(N2, N1),
        jnp.asarray(resid_in, jnp.float32).reshape(N2, N1),
        jnp.asarray(phi_prev, jnp.float32).reshape(N2, N1),
        tri, *[jnp.asarray(m) for m in mats],
    )
    return (
        out.reshape(nb * G * hop),
        resid_last.reshape(size),
        phi_last.reshape(size),
        phi0_eff.reshape(size),
    )

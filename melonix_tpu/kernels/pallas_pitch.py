"""Fused autocorrelation kernel for the pitch engine.

The NSDF pitch curve (engine/pitch.py) computes per-frame linear
autocorrelation via Wiener-Khinchin: rfft(frames, 2N) -> |.|^2 -> irfft.
The two 4096-point XLA FFTs are ~28 of the engine's 30.7 ms on v5e.  This
kernel runs the whole round trip in VMEM with four-step MXU matmul DFTs
(kernels/pallas_pv.py's layout, N = 4096 = 32 sublanes x 128 lanes):

    slab DMA -> frames -> mean-subtract -> zero-pad to 2N ->
    forward DFT (scrambled bins) -> power (elementwise, ORDER-FREE) ->
    inverse DFT (scrambled in, NATURAL time out) -> ac[:, :N]

The scrambled-bin trick is load-bearing: power is elementwise over bins,
so the four-step's bin permutation never needs undoing — the kernel's API
is natural-order in and out.  The inverse of a real (power) spectrum needs
only two dots per stage (no imaginary input plane), and the final stage
takes the real part, matching irfft exactly.  bf16x3 dots hold ~-96 dB —
far below what NSDF peak-picking can notice.

Also emits the mean-subtracted frames ``w`` (the NSDF normalization and
energy terms need them and they otherwise never exist in HBM).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import bf16x3
from .bf16x3 import dot as _d3

N1 = 128  # lane factor
FRAME = 2048  # analysis frame (config.pitch_frame)
NFFT = 2 * FRAME  # zero-padded linear-correlation length
N2 = NFFT // N1  # 32 sublanes
FR_ROWS = FRAME // N1  # 16 rows of real frame data
G = 64  # frames per grid step


def supported(frame: int, hop: int, n_frames: int) -> bool:
    return frame == FRAME and hop % 128 == 0 and hop <= frame and n_frames >= 1


def _consts():
    """Forward + inverse four-step constants at N=4096 (n2=32), from the
    shared builder in pallas_pv (one copy of the twiddle math)."""
    from .pallas_pv import fourstep_consts

    fwd = fourstep_consts(NFFT, N2, -1.0)
    ic2, is2, ict, ist, ic1, is1 = fourstep_consts(NFFT, N2, 1.0, 1.0 / NFFT)
    return fwd, (ic1, is1, ict, ist, ic2, is2)


def _kernel(
    rows_hbm,
    c2h, c2l, s2h, s2l, cth, sth, c1h, c1l, s1h, s1l,
    ic1h, ic1l, is1h, is1l, icth, isth, ic2h, ic2l, is2h, is2l,
    ac_ref, w_ref, slab, frames, sem, *, hop_rows, exact,
):
    i = pl.program_id(0)
    n_slab = G * hop_rows + FR_ROWS
    copy = pltpu.make_async_copy(
        rows_hbm.at[pl.ds(i * G * hop_rows, n_slab)], slab, sem
    )
    copy.start()
    copy.wait()

    @pl.when(i == 0)
    def _():  # zero-pad rows [FR_ROWS, N2) once; they never change
        frames[:, FR_ROWS:N2] = jnp.zeros((G, N2 - FR_ROWS, 128), jnp.float32)

    # Mean-subtract while building the frame block (a (G,1,1) keepdims
    # reduction crashes Mosaic's reshape layout inference).
    for g in range(G):
        fg = slab[g * hop_rows : g * hop_rows + FR_ROWS]
        mean_g = jnp.sum(fg) * np.float32(1.0 / FRAME)
        frames[g, 0:FR_ROWS] = fg - mean_g
    w = frames[...]
    w_ref[...] = w[:, 0:FR_ROWS]

    d3 = partial(_d3, exact=exact)
    # Forward four-step (N = 4096), scrambled bins k2 + 32*k1.  The padded
    # rows are zero, so the zero-padded 2N-point DFT falls out for free.
    xt = w.swapaxes(0, 1).reshape(N2, G * N1)
    xs = bf16x3.split(xt)
    yr = d3((c2h[...], c2l[...]), xs).reshape(N2, G, N1)
    yi = d3((s2h[...], s2l[...]), xs).reshape(N2, G, N1)
    ct3, st3 = cth[...][:, None], sth[...][:, None]
    tr = yr * ct3 - yi * st3
    ti = yr * st3 + yi * ct3
    trs = bf16x3.split(tr.reshape(N2 * G, N1))
    tis = bf16x3.split(ti.reshape(N2 * G, N1))
    c1s, s1s = (c1h[...], c1l[...]), (s1h[...], s1l[...])
    re = d3(trs, c1s) - d3(tis, s1s)
    im = d3(trs, s1s) + d3(tis, c1s)

    # Power spectrum — elementwise, so the scrambled order costs nothing.
    p = re * re + im * im  # (N2*G, N1) in [k2, g, k1] raster

    # Inverse four-step of a REAL spectrum: two dots per stage, real part
    # at the end (== irfft of the Hermitian power spectrum).
    ps = bf16x3.split(p)
    ic1s, is1s = (ic1h[...], ic1l[...]), (is1h[...], is1l[...])
    wr = d3(ps, ic1s).reshape(N2, G, N1)
    wi = d3(ps, is1s).reshape(N2, G, N1)
    ict3, ist3 = icth[...][:, None], isth[...][:, None]
    tr2 = wr * ict3 - wi * ist3
    ti2 = wr * ist3 + wi * ict3
    trs2 = bf16x3.split(tr2.reshape(N2, G * N1))
    tis2 = bf16x3.split(ti2.reshape(N2, G * N1))
    ic2s, is2s = (ic2h[...], ic2l[...]), (is2h[...], is2l[...])
    ac = d3(ic2s, trs2) - d3(is2s, tis2)  # Re only: (N2, G*N1) [n2, g, n1]
    ac3 = ac.reshape(N2, G, N1).swapaxes(0, 1)  # (G, N2, N1) natural time
    ac_ref[...] = ac3[:, 0:FR_ROWS]  # lags 0..FRAME-1


@partial(jax.jit, static_argnames=("frame", "hop", "n_frames", "interpret"))
def pitch_ac_pallas(
    wav: jnp.ndarray,
    frame: int,
    hop: int,
    n_frames: int,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(ac, w): per-frame linear autocorrelation (F, frame) and the
    mean-subtracted frames (F, frame).

    ``ac`` equals ``irfft(|rfft(w, 2*frame)|^2, 2*frame)[:, :frame]`` to
    bf16x3 matmul-DFT accuracy; frame f covers ``wav[f*hop : f*hop+frame)``
    (zeros past the end) like engine/spectral.extract_hop_frames.
    """
    assert supported(frame, hop, n_frames), (frame, hop)
    hop_rows = hop // 128
    nf_pad = G * -(-n_frames // G)
    n_rows = nf_pad * hop_rows + FR_ROWS
    rows = jnp.zeros((n_rows * 128,), jnp.float32)
    n_keep = min(wav.shape[0], n_rows * 128)
    rows = jax.lax.dynamic_update_slice(
        rows, wav[:n_keep].astype(jnp.float32), (0,)
    ).reshape(n_rows, 128)
    fwd, inv = _consts()
    mats = (*fwd[0], *fwd[1], fwd[2], fwd[3], *fwd[4], *fwd[5],
            *inv[0], *inv[1], inv[2], inv[3], *inv[4], *inv[5])
    cs = lambda shape: pl.BlockSpec(
        shape, lambda *_: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    mat_specs = (
        [cs((N2, N2))] * 4 + [cs((N2, N1))] * 2 + [cs((N1, N1))] * 4
        + [cs((N1, N1))] * 4 + [cs((N2, N1))] * 2 + [cs((N2, N2))] * 4
    )
    out = pl.pallas_call(
        partial(_kernel, hop_rows=hop_rows, exact=interpret),
        grid=(nf_pad // G,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY), *mat_specs],
        out_specs=[
            pl.BlockSpec((G, FR_ROWS, N1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, FR_ROWS, N1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nf_pad, FR_ROWS, N1), jnp.float32),
            jax.ShapeDtypeStruct((nf_pad, FR_ROWS, N1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((G * hop_rows + FR_ROWS, 128), jnp.float32),
            pltpu.VMEM((G, N2, N1), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=nf_pad * NFFT * (N2 + N1) * 2 * 3 * 2,
            bytes_accessed=4 * (n_rows * 128 + 2 * nf_pad * frame),
            transcendentals=0,
        ),
        interpret=interpret,
    )(rows, *[jnp.asarray(m) for m in mats])
    return (
        out[0].reshape(nf_pad, frame)[:n_frames],
        out[1].reshape(nf_pad, frame)[:n_frames],
    )

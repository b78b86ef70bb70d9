"""Two-process DCN worker (SURVEY §5 multi-host story; VERDICT r3 next #8).

Launched by ``test_distributed.py`` as 2 OS processes that form one JAX
distributed job over gloo CPU collectives (the CPU stand-in for a DCN
slice-of-slices: every cross-process ``ppermute``/``all_gather``/``psum``
in the seq-sharded PV rides the inter-process fabric instead of ICI).

Each process owns 4 virtual devices; the global mesh has 8.  Two programs
run:

* ``seq_parallel_pv`` on a ``(data=1, seq=8)`` mesh — the seq axis SPANS
  the process boundary, so the distributed phase prefix sum and the OLA
  seam spill genuinely cross processes;
* ``data_parallel_pv`` (the batch serving step, engine/batch.py) on a
  ``(data=2, seq=4)`` mesh — batch rows land on different processes.

Both are asserted equal to the single-device render under the PV
comparison convention (rms-relative; phase propagation is chaotic at the
ulp level — CLAUDE.md).  Prints ``DIST_OK`` on success; the parent test
requires it from both ranks.
"""

import os
import sys


def main() -> None:
    pid = int(sys.argv[1])
    port = sys.argv[2]
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    ).strip()
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import jax

    # The container pre-registers the TPU platform via sitecustomize; env
    # vars are too late (conftest.py does the same dance).
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    import jax.numpy as jnp
    import numpy as np

    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
    )
    assert len(jax.devices()) == 8, len(jax.devices())
    assert len(jax.local_devices()) == 4, len(jax.local_devices())

    from melonix_tpu.engine import spectral as S
    from melonix_tpu.engine.maps import MapKnots
    from melonix_tpu.engine.phase_vocoder import build_pv_plan, render_track_pv
    from melonix_tpu.markers import Marker
    from melonix_tpu.parallel import (
        data_parallel_pv,
        make_audio_mesh,
        pv_batch_args,
        seq_parallel_pv,
        seq_pv_args,
    )

    # Deterministic fixture — identical on both ranks (a DCN job's inputs
    # come from shared storage; here both ranks synthesize the same bytes).
    sr = 8000
    t = np.arange(int(sr * 1.5)) / sr
    freq = 180.0 + 120.0 * t
    x1 = (0.6 * np.sin(2 * np.pi * freq * t)).astype(np.float32)
    x2 = x1[::-1].copy()
    ms1 = [Marker(len(x1) // 2, 57.0, 0.05, 2.0)]
    ms2 = [Marker(len(x2) // 3, 57.0, 0.0, -3.0)]
    k1 = MapKnots.from_markers(ms1, sr, len(x1))
    k2 = MapKnots.from_markers(ms2, sr, len(x2))
    p1 = build_pv_plan(k1, len(x1))
    p2 = build_pv_plan(k2, len(x2))

    # Single-process references run on this rank's local device 0.
    want1 = render_track_pv(x1, k1)
    want2 = render_track_pv(x2, k2)

    def shard_rms_check(out, ref_rows, n_outs, tag):
        """Each rank verifies ONLY its addressable shards (the other
        rank's rows are not downloadable across processes)."""
        checked = 0
        for sh in out.addressable_shards:
            seg = np.asarray(sh.data)
            idx = sh.index if isinstance(sh.index, tuple) else (sh.index,)
            if seg.ndim == 1:
                seg = seg[None, :]
                idx = (slice(0, 1),) + tuple(idx)
            r0 = idx[0].start or 0
            c0 = idx[1].start or 0 if len(idx) > 1 else 0
            for r in range(seg.shape[0]):
                row = r0 + r
                ref = ref_rows[row % len(ref_rows)]
                n_out = n_outs[row % len(n_outs)]
                lo, hi = c0, min(c0 + seg.shape[1], n_out)
                if hi <= lo:
                    continue
                err = np.sqrt(np.mean((seg[r, : hi - lo] - ref[lo:hi]) ** 2))
                rel = err / (np.sqrt(np.mean(ref[:n_out] ** 2)) + 1e-12)
                assert rel < 2e-3, (tag, row, lo, rel)
                checked += 1
        assert checked > 0, (tag, "rank verified nothing")
        print(pid, tag, "checked", checked, "shard spans", flush=True)

    # --- 1. seq-sharded PV: the seq axis crosses the process boundary ---
    mesh_seq = make_audio_mesh(8, data=1)
    kw, ops = seq_pv_args(p1, mesh_seq.shape["seq"])
    fn = seq_parallel_pv(mesh_seq, **kw)
    win = jnp.asarray(S.hann_window(kw["size"]))
    out = fn(
        jnp.asarray(x1), jnp.asarray(ops[0]), jnp.asarray(ops[1]),
        jnp.asarray(ops[2]), jnp.asarray(ops[3]), win,
        *[jnp.asarray(o) for o in ops[4:]],
    )
    shard_rms_check(out, [want1], [p1.n_out], "seq_pv")

    # --- 2. batch step: rows of the track batch land on different ranks ---
    mesh_b = make_audio_mesh(8, data=2)
    kwb, opsb = pv_batch_args([p1, p2])
    pv = data_parallel_pv(mesh_b, **kwb)
    winb = jnp.asarray(S.hann_window(kwb["size"]))
    wav_b = jnp.asarray(np.stack([x1, x2]))
    out_b = pv(wav_b, *[jnp.asarray(o) for o in opsb[:4]], winb,
               *[jnp.asarray(o) for o in opsb[4:]])
    shard_rms_check(out_b, [want1, want2], [p1.n_out, p2.n_out], "batch_pv")

    print(pid, "DIST_OK", flush=True)


if __name__ == "__main__":
    main()

"""Project persistence — the ``.mlx`` checkpoint format.

The reference's ``.melonix`` file IS its checkpoint: a version-stamped binary
blob of {wavData, sampleRate, brightness, markers, tempo} (app.hpp:35, 71-76,
serialized with mika314/ser; save app.cpp:1166-1190, load app.cpp:1124-1154).
Everything else — grains, pyramids, spectra, caches — is derived state
rebuilt by ``preproc()`` on load (app.cpp:1153).

``.mlx`` keeps the same shape and contract: serialize only source samples +
edit state with a version int; refuse to load a mismatched version
(app.cpp:1145-1149); recompute device-side state on open.
"""

from __future__ import annotations

import dataclasses
import struct

import numpy as np

from ..markers import Marker, sort_markers

MAGIC = b"MLXP"
VERSION = 1


@dataclasses.dataclass
class Project:
    wav: np.ndarray  # float32 mono source samples
    sample_rate: int
    markers: list[Marker] = dataclasses.field(default_factory=list)
    brightness: float = 50.0
    tempo: float = 130.0


class ProjectError(RuntimeError):
    pass


def save_project(path: str, project: Project) -> str:
    """Write a .mlx file; appends the extension if missing (app.cpp:1168-1170)."""
    if not path.endswith(".mlx"):
        path += ".mlx"
    wav = np.ascontiguousarray(np.asarray(project.wav, np.float32))
    ms = sort_markers(project.markers)
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<I", VERSION))
        f.write(struct.pack("<IQff", project.sample_rate, len(wav), project.brightness, project.tempo))
        f.write(struct.pack("<I", len(ms)))
        for m in ms:
            f.write(struct.pack("<iddd", m.sample, m.note, m.d_time, m.pitch_bend))
        f.write(wav.astype("<f4").tobytes())
    return path


def load_project(path: str) -> Project:
    try:
        return _load_project(path)
    except struct.error as e:
        raise ProjectError(f"{path}: truncated or corrupt project: {e}") from e


def _load_project(path: str) -> Project:
    with open(path, "rb") as f:
        if f.read(4) != MAGIC:
            raise ProjectError(f"{path}: not a .mlx project")
        (version,) = struct.unpack("<I", f.read(4))
        if version != VERSION:
            # Version mismatch = refuse load (app.cpp:1145-1149).
            raise ProjectError(f"{path}: version mismatch {version} != {VERSION}")
        rate, n, brightness, tempo = struct.unpack("<IQff", f.read(20))
        (n_markers,) = struct.unpack("<I", f.read(4))
        markers = []
        for _ in range(n_markers):
            s, note, dt, pb = struct.unpack("<iddd", f.read(28))
            markers.append(Marker(s, note, dt, pb))
        wav = np.frombuffer(f.read(4 * n), "<f4", count=n).copy()
    return Project(wav=wav, sample_rate=rate, markers=markers, brightness=brightness, tempo=tempo)

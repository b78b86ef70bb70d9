from .sharded import (
    make_audio_mesh,
    sharded_stft_mags,
    sharded_pitch,
    sharded_spectrogram_columns,
    data_parallel_render,
    session_step,
)

__all__ = [
    "make_audio_mesh",
    "sharded_stft_mags",
    "sharded_pitch",
    "sharded_spectrogram_columns",
    "data_parallel_render",
    "session_step",
]

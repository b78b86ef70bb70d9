from .sharded import (
    make_audio_mesh,
    sharded_stft_mags,
    sharded_pitch,
    sharded_spectrogram_columns,
    data_parallel_render,
    data_parallel_pv,
    pv_batch_args,
    seq_parallel_pv,
    seq_pv_args,
    session_step,
    session_step_full,
)

__all__ = [
    "make_audio_mesh",
    "sharded_stft_mags",
    "sharded_pitch",
    "sharded_spectrogram_columns",
    "data_parallel_render",
    "data_parallel_pv",
    "pv_batch_args",
    "seq_parallel_pv",
    "seq_pv_args",
    "session_step",
    "session_step_full",
]

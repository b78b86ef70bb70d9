from .audio import load_audio, write_audio
from .wav import read_wav, write_wav
from .flac import write_flac
from .project import Project, load_project, save_project

__all__ = [
    "load_audio",
    "write_audio",
    "read_wav",
    "write_wav",
    "write_flac",
    "Project",
    "load_project",
    "save_project",
]

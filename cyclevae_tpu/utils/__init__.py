from .hdf5 import (
    check_hdf5,
    find_files,
    read_hdf5,
    read_txt,
    shape_hdf5,
    write_hdf5,
)
from .wavio import read_wav, write_wav, low_cut_filter, low_pass_filter

__all__ = [
    "check_hdf5",
    "find_files",
    "read_hdf5",
    "read_txt",
    "shape_hdf5",
    "write_hdf5",
    "read_wav",
    "write_wav",
    "low_cut_filter",
    "low_pass_filter",
]

"""HDF5 feature store + file/list utilities.

Data contract: one HDF5 file per utterance with named datasets
(``/feat_org_lf0``, ``/mcep_range``, ``/spcidx_range``, ``/f0``, ``/f0_range``,
``/npow``, ``/npow_range``, ``/mcepspc_range``, ``/cvuvlogf0fil_ap``, per-speaker
stats files) — format-compatible with the reference so features can be exchanged
during bring-up (reference semantics: src/utils/utils.py:18-159).
"""

from __future__ import annotations

import fnmatch
import logging
import os
import sys

import h5py
import numpy as np


def check_hdf5(hdf5_name: str, hdf5_path: str) -> bool:
    """Return True iff dataset ``hdf5_path`` exists inside file ``hdf5_name``."""
    if not os.path.exists(hdf5_name):
        return False
    with h5py.File(hdf5_name, "r") as f:
        return hdf5_path in f


def read_hdf5(hdf5_name: str, hdf5_path: str) -> np.ndarray:
    """Read one dataset from an HDF5 file (errors out loudly if missing)."""
    if not os.path.exists(hdf5_name):
        logging.error("There is no such a hdf5 file (%s).", hdf5_name)
        sys.exit(1)
    with h5py.File(hdf5_name, "r") as f:
        if hdf5_path not in f:
            logging.error("There is no such a data in hdf5 file. (%s)", hdf5_path)
            sys.exit(1)
        return f[hdf5_path][()]


def shape_hdf5(hdf5_name: str, hdf5_path: str):
    """Return the shape of a dataset without loading it."""
    if not os.path.exists(hdf5_name):
        logging.error("There is no such a hdf5 file (%s).", hdf5_name)
        sys.exit(1)
    with h5py.File(hdf5_name, "r") as f:
        if hdf5_path not in f:
            logging.error("There is no such a data in hdf5 file. (%s)", hdf5_path)
            sys.exit(1)
        return f[hdf5_path].shape


def write_hdf5(hdf5_name: str, hdf5_path: str, write_data, is_overwrite: bool = True):
    """Write one dataset, creating parent dirs; overwrite semantics match reference."""
    write_data = np.asarray(write_data)
    folder = os.path.dirname(hdf5_name)
    if folder and not os.path.exists(folder):
        os.makedirs(folder, exist_ok=True)
    with h5py.File(hdf5_name, "a") as f:
        if hdf5_path in f:
            if is_overwrite:
                del f[hdf5_path]
            else:
                logging.error("Dataset in hdf5 file already exists. (%s)", hdf5_path)
                sys.exit(1)
        f.create_dataset(hdf5_path, data=write_data)


def find_files(directory: str, pattern: str = "*.wav", use_dir_name: bool = True):
    """Recursive glob, sorted walk order; optionally strip the root dir prefix."""
    files = []
    for root, _, filenames in os.walk(directory, followlinks=True):
        for filename in fnmatch.filter(filenames, pattern):
            files.append(os.path.join(root, filename))
    if not use_dir_name:
        files = [f.replace(directory + "/", "") for f in files]
    return files


def read_txt(file_list: str):
    """Read a list file: one path per line."""
    with open(file_list) as f:
        return [line.rstrip() for line in f if line.strip()]

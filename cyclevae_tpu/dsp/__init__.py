"""Host-side DSP: C++ WORLD/SPTK/DTW capability classes + device-side JAX ops.

Layer L0 replacement (SURVEY.md §2.1): the reference depends on four compiled
pip packages (pyworld, pysptk, dtw_c, mlpg_c). Here the same capability surface
is provided by one in-repo C++ library (``native/libcvdsp.so``) with ctypes
bindings, plus JAX versions of the frame-parallel transforms in
:mod:`cyclevae_tpu.dsp.jax_ops` for on-device use.

``mlpg_c`` note: the reference lists it in tools/requirements.txt:10 but never
imports it (dormant); trajectory smoothing is intentionally not implemented.
"""

from . import dtw, sptk, world  # noqa: F401

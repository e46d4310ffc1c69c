from .gru_scan import gru_ar_scan, precompute_input_gates

__all__ = ["gru_ar_scan", "precompute_input_gates"]

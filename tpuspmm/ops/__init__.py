"""Compute operations: oracles, XLA-level SpMM, vendor baseline, public API."""

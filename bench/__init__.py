"""Benchmark harness — the counterpart of the reference's test/*.sh sweeps
(SURVEY.md §2.3) plus new roofline/weak-scaling reporting."""

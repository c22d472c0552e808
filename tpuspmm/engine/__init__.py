"""Engine: kernel registries, run orchestration, timing/report, selection."""

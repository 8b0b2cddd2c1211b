"""Compute kernels: geometry, minimal solvers, robust estimation, matching."""

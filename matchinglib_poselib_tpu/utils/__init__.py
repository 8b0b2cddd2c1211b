"""Host-side utilities: IO, calibration parsing, timing."""

"""End-to-end pipelines: correspondence extraction, pose estimation, stereo refinement."""

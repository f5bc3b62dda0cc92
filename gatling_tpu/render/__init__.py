"""Rendering: camera, BSDFs, lights, wavefront integrator, AOVs."""

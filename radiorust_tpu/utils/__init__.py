"""Auxiliary subsystems: profiling/tracing, checkpoint/resume."""

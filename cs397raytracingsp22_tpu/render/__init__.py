"""Render drivers: wavefront path-trace integrator, Phong debug shader,
image assembly, progress/metrics, checkpointed accumulation."""

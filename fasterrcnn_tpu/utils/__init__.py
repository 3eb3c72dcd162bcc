"""Checkpointing, evaluation statistics, visualization, logging, profiling."""

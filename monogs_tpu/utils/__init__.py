"""Config, logging, evaluation, PLY I/O, checkpointing, profiling."""

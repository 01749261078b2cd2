"""Fast-simulation serving engine: compiled sample→route→decode→expm1."""

from zdcsim.inference.engine import FastSim  # noqa: F401

"""Utilities: checkpointing, torch-checkpoint import, logging, misc."""

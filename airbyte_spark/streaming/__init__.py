"""Micro-batch sync runner with ordered, resumable checkpoints."""

"""Synthetic data generators and profiling helpers."""

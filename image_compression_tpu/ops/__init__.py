"""Batched TPU compute ops: edge grids, classical extractors, multicut,
segment stats, PNG size estimation, rewards."""

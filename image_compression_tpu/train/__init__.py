"""Training: supervised pretraining, REINFORCE, data pipeline, checkpoints."""

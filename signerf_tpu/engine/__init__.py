"""Training engine: optimizers, train step, checkpointing, trainer loop."""

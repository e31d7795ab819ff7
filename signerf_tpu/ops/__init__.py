"""TPU compute kernels (Pallas where hot, jnp elsewhere) for signerf_tpu."""

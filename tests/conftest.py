"""Test harness config: run on CPU with 8 virtual devices.

This is the TPU-world "fake backend" (SURVEY.md §4): shard_map halo-exchange
and multi-chip equivalence tests run on a virtual CPU mesh, and Pallas
kernels run in interpreter mode, so the whole suite is CI-runnable without
TPU hardware. (The sandbox pins JAX_PLATFORMS=axon via the environment, so
the override must go through jax.config, not os.environ.)
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

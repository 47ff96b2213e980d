"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the framework's stand-in for a fake distributed backend
(SURVEY.md §4): sharding tests get 8 visible devices without TPU hardware.

Note: a sitecustomize in this environment registers a TPU PJRT plugin at
interpreter start, so plain JAX_PLATFORMS env vars are not enough — we
override through jax.config, which takes effect before first backend use.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)

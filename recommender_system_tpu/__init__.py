"""recommender_system_tpu — a TPU-native CTR / recommender framework.

Brand-new JAX/XLA/Pallas re-design with the capabilities of the reference
TF2/Keras model zoo (Hcyand/recommender_system, mounted at /root/reference):
typed feature schema, fused stacked-table embedding engine, Pallas interaction
kernels, lax.scan sequence models, sharded multi-chip embedding + data
parallelism, and a unified jit training harness.
"""

from . import layers, models, ops, parallel, training, utils

__version__ = "0.1.0"

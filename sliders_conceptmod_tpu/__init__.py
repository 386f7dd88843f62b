"""sliders_conceptmod_tpu — TPU-native concept-slider framework.

From-scratch JAX/Flax/Pallas rebuild of the capabilities of
ntc-ai/sliders-conceptmod (see README.md for the architecture and the
component map back to the reference).
"""

__version__ = "0.1.0"

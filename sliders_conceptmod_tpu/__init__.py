"""sliders_conceptmod_tpu — TPU-native concept-slider framework.

From-scratch JAX/Flax/Pallas rebuild of the capabilities of
ntc-ai/sliders-conceptmod (see README.md for the architecture and the
component map back to the reference).
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: TPU compiles for the big models take
# minutes — cache them across processes unless the user configured otherwise.
import os as _os

_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _os.path.expanduser("~/.cache/sliders_tpu_xla"))
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

"""Short import alias: ``import dml_tpu`` == ``import disentangled_multimodal_learning_tpu``."""
import sys as _sys

import disentangled_multimodal_learning_tpu as _pkg

_sys.modules[__name__] = _pkg

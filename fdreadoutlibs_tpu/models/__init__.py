"""Algorithm model families.

The reference dispatches kernels by config string to function pointers
(WIBEthFrameProcessor.cpp:182-197).  Here each family is a declarative
descriptor binding the TPG configuration, the trigger-primitive algorithm
tag, the frame families it serves, and the backend entry points — one
parameterized core (ops/) serves every family.
"""

from .algorithms import (MODEL_FAMILIES, ModelFamily,  # noqa: F401
                         get_model, run_model)

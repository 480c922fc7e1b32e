"""L1 — frame formats and type adapters.

The reference's type adapters (include/fdreadoutlibs/*TypeAdapter.hpp) are
fixed-size POD structs wrapping ``fddetdataformats`` frame layouts.  Here each
format is a *descriptor* (sizes, tick differences, header bitfields) plus
vectorized numpy/jnp codecs — no classes wrapping raw pointers.
"""

from .bitpack import pack_14bit, unpack_14bit, unpack_14bit_jnp  # noqa: F401
from . import wibeth  # noqa: F401
from . import wib2  # noqa: F401
from . import protowib  # noqa: F401
from . import daphne  # noqa: F401
from . import tde  # noqa: F401
from . import ssp  # noqa: F401
from . import trigprim  # noqa: F401
from .adapters import ADAPTERS, TypeAdapter, get_adapter  # noqa: F401

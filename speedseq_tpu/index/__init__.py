"""BWA-compatible FM-index construction + device-resident index arrays.

Builder reproduces the on-disk BWA index byte-for-byte (validated against
the real bwa outputs shipped at reference example/data/*.fasta.{bwt,pac,
sa,ann,amb}); ``fm.py`` converts to TPU-friendly arrays.
"""

from .pack import pack_pac, unpack_pac, write_pac, read_pac  # noqa: F401
from .suffix import suffix_array  # noqa: F401
from .bwt import BWAIndex, build_index, load_index  # noqa: F401
from .fm import FMIndex  # noqa: F401
